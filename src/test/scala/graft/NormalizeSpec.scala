package graft

import graft.functions.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("stripAccents: NFKD removes combining marks") {
    val out = Seq("Amazônia", "São Paulo", "Pará", "açúcar")
      .toDF("s").select(Normalize.stripAccents($"s")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("Amazonia", "Sao Paulo", "Para", "acucar"))
  }

  test("stripEmoji: symbols dropped, text kept") {
    assert(Normalize.stripEmojiJvm("fogo 🔥 no Brasil ✨!") == "fogo  no Brasil !")
  }

  test("slugify") {
    val out = Seq("Produção de Petróleo (Mensal)", "  EIA -- Weekly! ")
      .toDF("s").select(Normalize.slugify($"s")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("producao-de-petroleo-mensal", "eia-weekly"))
  }

  test("urlKey: scheme/host lowered, query stripped, scheme-less keeps path") {
    val out = Seq(
      "HTTPS://News.Example.com/Arts/a1/?utm=1", // case + query + trailing /
      "http://x.org",                            // bare host -> "/"
      "example.com/path/",                       // scheme-less: urlparse keeps path
      "example.com/other")                       // distinct scheme-less keys stay distinct
      .toDF("u").select(Normalize.urlKey($"u")).collect().map(_.getString(0))
    assert(out(0) == "https://news.example.com/Arts/a1")
    assert(out(1) == "http://x.org/")
    assert(out(2) == "https://example.com/path")
    assert(out(3) == "https://example.com/other")
    assert(out(2) != out(3)) // the old anchored regexes collapsed both to "https:///"
  }

  test("pt-BR compact magnitudes") {
    val out = Seq((2_300_000_000.0, 4_500_000.0, 1234.0)).toDF("b", "m", "i")
      .select(Normalize.ptbrCompact($"b"), Normalize.ptbrCompact($"m"),
        Normalize.ptbrCompact($"i")).collect().head
    assert(out.getString(0) == "2,3 bi")
    assert(out.getString(1) == "4,5 mi")
    assert(out.getString(2) == "1.234")
  }

  test("pt-BR formatting") {
    val out = Seq((1234567L, 12.345)).toDF("n", "p")
      .select(Normalize.ptbrInt($"n"), Normalize.ptbrPct($"p"))
      .collect().head
    assert(out.getString(0) == "1.234.567")
    assert(out.getString(1) == "12,35%" || out.getString(1) == "12,34%") // HALF_EVEN vs HALF_UP
  }

  test("period extraction") {
    val out = Seq("focos_mensal_br_202403.csv", "inf_diario_fi_2019.zip", "nope")
      .toDF("s")
      .select(Normalize.extractPeriod($"s"), Normalize.extractYear($"s"))
      .collect()
    assert(out(0).getString(0) == "2024-03" && out(0).getInt(1) == 2024)
    assert(out(1).getString(0) == "2019")
    assert(out(2).isNullAt(0))
  }

  test("COIDS keys and UF from path") {
    val out = Seq(
      ("focos_10min_20240115_0230.csv", "/coids/RJ/focos_20240115.csv"))
      .toDF("f", "p")
      .select(Normalize.extractTenMinKey($"f").cast("string"),
        Normalize.extractDayKey($"p").cast("string"),
        Normalize.ufFromPath($"p"))
      .collect().head
    assert(out.getString(0) == "2024-01-15 02:30:00")
    assert(out.getString(1) == "2024-01-15")
    assert(out.getString(2) == "RJ")
    assert(Seq(("nothing.csv", "x")).toDF("p", "x")
      .select(Normalize.ufFromPath($"p")).collect().head.isNullAt(0))
  }

  test("pt month abbreviation") {
    val out = Seq("JAN", "dez", " Mar ").toDF("s")
      .select(Normalize.ptMonthToNum($"s")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 12, 3))
  }
}
