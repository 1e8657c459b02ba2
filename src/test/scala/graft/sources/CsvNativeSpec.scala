package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.charset.Charset
import graft.SparkSpec

/** The splittable bare-CSV scan (S2/S3): native `spark.read.csv` behind
  * the driver sniff pre-pass must match the streamed `binaryFiles` form
  * row-for-row, and must actually split one large file into multiple
  * input partitions (the whole point — a 50 GB daily drop must not
  * serialize onto one core). */
class CsvNativeSpec extends SparkSpec {

  private val roles: Seq[(String, Seq[String])] = Seq(
    "dt" -> Seq("data_pas", "datahora"),
    "state" -> Seq("estado", "uf"),
    "biome" -> Seq("bioma"))

  private def write(dir: File, name: String, bytes: Array[Byte]): Unit = {
    val out = new FileOutputStream(new File(dir, name))
    out.write(bytes); out.close()
  }

  test("native csv scan matches the streamed form on mixed dialects") {
    val dir = java.nio.file.Files.createTempDirectory("csvs").toFile
    // ';'-separated utf-8 with a short row and a long row (both skipped)
    write(dir, "a.csv",
      ("data_pas;estado;bioma\n" +
        "2024-01-05 10:00:00;Amazonas;Amazônia\n" +
        "short;row\n" +
        "too;many;fields;here\n" +
        "2024-01-06 11:00:00;Pará;Cerrado\n").getBytes("UTF-8"))
    // ','-separated cp1252, different header (uf; no bioma), quoted field
    write(dir, "b.csv",
      ("datahora,uf\n" +
        "2023-03-01 00:00:00,\"São, Paulo\"\n" +
        "2023-03-02 00:00:00,Paraná\n").getBytes(Charset.forName("windows-1252")))
    val glob = dir.getAbsolutePath + "/*.csv"

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("source_file", "dt", "state", "biome")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val native = rowsOf(ZipCsv.readCsvs(spark, glob, roles))
    val streamed = rowsOf(ZipCsv.readCsvsStreamed(spark, glob, roles))
    assert(native == streamed)
    assert(native.length == 4) // the two malformed rows dropped
    assert(native.exists(_.contains("São, Paulo"))) // quote + cp1252 survive
  }

  test("missing REQUIRED role fails fast, naming the file") {
    val dir = java.nio.file.Files.createTempDirectory("csvbad").toFile
    write(dir, "nodt.csv", "estado;bioma\nAM;Amazônia\n".getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      ZipCsv.readCsvs(spark, dir.getAbsolutePath + "/*.csv", roles, Set("dt"))
    }
    assert(err.getMessage.contains("unresolvable required columns dt"))
    assert(err.getMessage.contains("nodt.csv"))
  }

  test("malformed rows are dropped even under column pruning") {
    // Spark's csv column pruning can skip token-count validation for
    // unread fields; the streamed form always drops field-count
    // mismatches. Parity must hold under projection too.
    val dir = java.nio.file.Files.createTempDirectory("csvmalprune").toFile
    write(dir, "m.csv",
      ("data_pas;estado;bioma\n" +
        "2024-01-05 10:00:00;Amazonas;Amazônia\n" +
        "short;row\n" +
        "too;many;fields;here\n").getBytes("UTF-8"))
    val glob = dir.getAbsolutePath + "/*.csv"
    val nativeStates = ZipCsv.readCsvs(spark, glob, roles)
      .select("state").collect().map(_.getString(0)).toSeq.sorted
    val streamedStates = ZipCsv.readCsvsStreamed(spark, glob, roles)
      .select("state").collect().map(_.getString(0)).toSeq.sorted
    assert(nativeStates == streamedStates)
    assert(nativeStates == Seq("Amazonas"))
  }

  test("role projection prunes the plan above the csv scan") {
    // csv COLUMN pruning is deliberately disabled (it would skip
    // token-count validation — see the malformed-under-pruning test);
    // the plan-level projection above the scan must still narrow to the
    // selected role, so downstream operators never see unused roles.
    val dir = java.nio.file.Files.createTempDirectory("csvprune").toFile
    write(dir, "p.csv",
      ("data_pas;estado;bioma;extra1;extra2\n" +
        "2024-01-05 10:00:00;AM;Amazônia;x;y\n").getBytes("UTF-8"))
    val df = ZipCsv.readCsvs(spark, dir.getAbsolutePath + "/*.csv", roles)
      .select("state") // downstream needs ONE role
    assert(df.queryExecution.optimizedPlan.output.map(_.name) == Seq("state"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("AM"))
  }

  test("header longer than the sniff prefix routes to the streamed fallback") {
    // An 8 KB+ header line has no newline inside the sniff window:
    // resolving against the truncated field list would drop every data
    // row via DROPMALFORMED. The sniff must instead route the file to
    // the streamed form, which parses complete lines.
    val dir = java.nio.file.Files.createTempDirectory("csvlonghdr").toFile
    val pad = (0 until 2000).map(i => s"junkcol$i").mkString(";")
    write(dir, "wide.csv",
      (s"data_pas;estado;bioma;$pad\n" +
        "2024-01-05 10:00:00;Amazonas;Amazônia;" +
        (0 until 2000).map(_ => "x").mkString(";") + "\n").getBytes("UTF-8"))
    assert(pad.length > ZipCsv.SniffBytes, "fixture header must exceed the sniff window")
    val rows = ZipCsv.readCsvs(spark, dir.getAbsolutePath + "/*.csv", roles)
      .select("dt", "state", "biome").collect().map(_.toSeq).toSeq
    assert(rows == Seq(Seq("2024-01-05 10:00:00", "Amazonas", "Amazônia")))
  }

  test("one large bare CSV splits into multiple scan partitions") {
    val dir = java.nio.file.Files.createTempDirectory("csvbig").toFile
    val sb = new StringBuilder("data_pas;estado;bioma\n")
    (0 until 20000).foreach(i =>
      sb.append(s"2024-01-05 10:00:$i;state$i;biome$i\n"))
    write(dir, "big.csv", sb.toString.getBytes("UTF-8"))
    val glob = dir.getAbsolutePath + "/*.csv"

    val before = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", 64 * 1024)
    try {
      val native = ZipCsv.readCsvs(spark, glob, roles)
      assert(native.rdd.getNumPartitions > 1,
        "native csv scan must split a single large file")
      assert(native.count() == 20000)
      // the streamed form is structurally one task per file
      assert(ZipCsv.readCsvsStreamed(spark, glob, roles).rdd.getNumPartitions == 1)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }
}
