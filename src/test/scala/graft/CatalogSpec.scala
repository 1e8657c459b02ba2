package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.profile._

class CatalogSpec extends AnyFunSuite {
  test("catalog cards enrich from manifests; missing manifest keeps nulls") {
    val env = ManifestEnvelope("2.0", "focos", "Focos", "https://src",
      "2026-08-12T00:00:00Z", "success", Nil, "pfx",
      Seq(ManifestItem("u1", Nil), ManifestItem("u2", Nil)), JObj(Nil))
    val cards = Catalog.build(
      Seq(
        Catalog.CardConfig("focos",
          JObj(Seq("pt" -> JStr("Focos de incêndio"), "en" -> JStr("Fire spots"))),
          JStr("Dados   de focos   por bioma e estado"), "m/focos.json", Seq("inpe")),
        Catalog.CardConfig("orfao", JStr("Sem manifesto"), JStr("x"),
          "m/missing.json", Nil)),
      Map("m/focos.json" -> env), locale = "en")
    assert(cards.head.title == "Fire spots")
    assert(cards.head.description == "Dados de focos por bioma e estado")
    assert(cards.head.generatedAt.contains("2026-08-12T00:00:00Z"))
    assert(cards.head.itemCount.contains(2))
    assert(cards(1).generatedAt.isEmpty && cards(1).generationStatus.isEmpty)
    val json = Catalog.toJson(cards, "2026-08-12T01:00:00Z")
    assert(json.contains("\"item_count\":2") && json.contains("\"generated_at\":null"))
  }
}

class RestoreAccentsSpec extends SparkSpec {
  import spark.implicits._
  test("accent restoration: wordlist hits exact, unknown falls back to initcap") {
    import graft.functions.Normalize
    val out = Seq("SAO PAULO", "PARA", "amazonia", "MINAS GERAIS")
      .toDF("s").select(Normalize.restoreAccentsPt($"s")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("São Paulo", "Pará", "Amazônia", "Minas Gerais"))
  }
}
