package graft

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.Charset
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ColumnResolver, Sniff, ZipCsv}
import graft.operators.Focos

class SniffSpec extends AnyFunSuite {
  test("delimiter: consistent candidate wins") {
    assert(Sniff.delimiter("a;b;c\n1;2;3\n4;5;6") == ';')
    assert(Sniff.delimiter("a,b,c\n1,2,3") == ',')
    assert(Sniff.delimiter("a|b|c\n1|2|3") == '|')
    assert(Sniff.delimiter("a\tb\n1\t2") == '\t')
  }

  test("delimiter: quoted separators don't count") {
    assert(Sniff.delimiter("a;b\n\"x;y\";z\n1;2") == ';')
  }

  test("delimiter: inconsistent counts fall back to ; vs , majority") {
    assert(Sniff.delimiter("a;b;c,d\nx;y") == ';')
  }

  test("decode: utf-8 accents survive, BOM stripped") {
    val (t, e) = Sniff.decode("﻿são paulo é".getBytes("UTF-8"))
    assert(t == "são paulo é" && e == "utf-8")
  }

  test("decode: cp1252 bytes fall through") {
    val bytes = "Amazônia “fogo”".getBytes(Charset.forName("windows-1252"))
    val (t, e) = Sniff.decode(bytes)
    assert(t == "Amazônia “fogo”" && e == "cp1252")
  }

  test("splitLine: quotes and escaped quotes") {
    assert(Sniff.splitLine("a;\"b;c\";\"d\"\"e\"", ';').toSeq == Seq("a", "b;c", "d\"e"))
  }

  test("resolver: first candidate in role order wins when both present") {
    // data_pas is force-preferred over datahora (reference :795-801)
    val r = ColumnResolver.resolve(
      Seq("datahora", "data_pas", "estado", "bioma"), Focos.Roles.toMap)
    assert(r("raw_datetime") == 1) // data_pas, not datahora
  }

  test("resolver: normalized ordered candidates") {
    val r = ColumnResolver.resolve(
      Seq("ID", "Data/Pas", "ESTADO ", "Bioma"),
      Focos.Roles.toMap)
    assert(r("raw_datetime") == 1 && r("raw_state") == 2 && r("raw_biome") == 3)
    assert(!r.contains("raw_satellite"))
  }
}

class ZipCsvSpec extends SparkSpec {

  private def zipOf(dir: File, zipName: String, member: String, bytes: Array[Byte]): File = {
    val f = new File(dir, zipName)
    val z = new ZipOutputStream(new FileOutputStream(f))
    z.putNextEntry(new ZipEntry(member))
    z.write(bytes)
    z.closeEntry(); z.close()
    f
  }

  test("readZips: mixed delimiters/encodings, bad lines skipped, focos pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("zips").toFile
    // zip 1: ';'-separated utf-8, no satellite column, one malformed row,
    // one blank state, one bad datetime
    val csv1 =
      """id;data_pas;estado;bioma
        |1;2024-01-05 10:00:00;Amazonas;Amazônia
        |2;2024-01-06 11:00:00; ;Cerrado
        |3;not-a-date;Pará;Amazônia
        |4;2024-02-01 09:30:00;Pará;Amazônia
        |broken;row
        |""".stripMargin
    zipOf(dir, "focos_2024.zip", "focos_br_2024.csv", csv1.getBytes("UTF-8"))
    // zip 2: ','-separated cp1252 with satellite column; AQUA_M-T kept,
    // TERRA dropped
    val csv2 =
      "id,data_pas,estado,bioma,satelite\n" +
      "9,2023-03-01 00:00:00,São Paulo,Mata Atlântica,AQUA_M-T\n" +
      "10,2023-03-02 00:00:00,São Paulo,Mata Atlântica,TERRA\n"
    zipOf(dir, "focos_2023.zip", "focos_br_2023.csv",
      csv2.getBytes(Charset.forName("windows-1252")))

    val subset = Focos.fromZips(spark, dir.getAbsolutePath + "/*.zip")
    val rows = subset.collect()
    // kept: rows 1, 2 (state→null), 4 from 2024; row 9 from 2023
    assert(rows.length == 4)
    val by = rows.map(r => r.getAs[String]("period_month") ->
      (r.getAs[String]("state"), r.getAs[String]("biome"))).toMap
    assert(by("2023-03") == (("SÃO PAULO", "MATA ATLÂNTICA")))
    assert(rows.count(_.getAs[String]("state") == null) == 1)

    // a file missing a REQUIRED column errors with the file named
    val badDir = java.nio.file.Files.createTempDirectory("badcols").toFile
    val bz = new java.util.zip.ZipOutputStream(
      new FileOutputStream(new File(badDir, "nofocos.zip")))
    bz.putNextEntry(new java.util.zip.ZipEntry("m.csv"))
    bz.write("id;quando;valor\n1;x;y\n".getBytes); bz.closeEntry(); bz.close()
    val err = intercept[org.apache.spark.SparkException] {
      Focos.fromZips(spark, badDir.getAbsolutePath + "/*.zip").count()
    }
    assert(err.getMessage.contains("unresolvable required columns") ||
      Option(err.getCause).exists(_.getMessage.contains("unresolvable required columns")))

    // corrupt archive in the same glob is skipped, not fatal
    val junk = new FileOutputStream(new File(dir, "broken.zip"))
    junk.write("this is not a zip".getBytes); junk.close()
    assert(Focos.fromZips(spark, dir.getAbsolutePath + "/*.zip").count() == 4)

    // A1 over the subset: per-set null dropping
    val agg = Focos.groupingSetCounts(subset).collect()
    val yearSet = agg.filter(r => r.getAs[Int]("g_period") == 1 &&
      r.getAs[Int]("g_state") == 1 && r.getAs[Int]("g_biome") == 1)
    assert(yearSet.map(r => r.getAs[Int]("year") -> r.getAs[Long]("value")).toMap ==
      Map(2024 -> 3L, 2023 -> 1L))
    // (year, state) set drops the null-state row
    val yearState = agg.filter(r => r.getAs[Int]("g_period") == 1 &&
      r.getAs[Int]("g_state") == 0 && r.getAs[Int]("g_biome") == 1)
    assert(yearState.map(_.getAs[Long]("value")).sum == 3L)
  }
}

class CoerceSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Coerce

  test("timestamp coerce: ISO, dayfirst, garbage") {
    val df = Seq("2024-01-05 10:00:00", "05/01/2024 10:00", "garbage", "2024-01-05")
      .toDF("s")
    val iso = df.select(Coerce.toTimestampCoerce($"s")).collect().map(r =>
      Option(r.getTimestamp(0)).map(_.toString))
    assert(iso(0).contains("2024-01-05 10:00:00.0"))
    assert(iso(1).contains("2024-01-05 10:00:00.0"))
    assert(iso(2).isEmpty)
    assert(iso(3).contains("2024-01-05 00:00:00.0"))
  }

  test("ptbr decimal: negatives and dotted-thousands-without-comma") {
    val out = Seq("-1.234,56", "-12,5", "2.000.000")
      .toDF("s").select(Coerce.ptbrDecimal($"s")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // no comma → dots kept → "2.000.000" is not numeric → null,
    // exactly pandas to_numeric(errors="coerce") on the same heuristic
    assert(out.toSeq == Seq(Some(-1234.56), Some(-12.5), None))
  }

  test("ptbr decimal: comma-presence heuristic") {
    val df = Seq("1.234,56", "1.234", "12,5", "x", "1234.5").toDF("s")
    val out = df.select(Coerce.ptbrDecimal($"s")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(1234.56), Some(1.234), Some(12.5), None, Some(1234.5)))
  }

  test("label date parses: São Paulo labels, RFC-1123, EIA") {
    val df = Seq((
      "atualizado em 15/03/2024 14h30",
      "Wed, 21 Oct 2015 07:28:00 GMT",
      "Dec. 31, 2025")).toDF("gov", "http", "eia")
    val r = df.select(
      Coerce.isoZ(Coerce.saoPauloLabelToUtc($"gov")),
      Coerce.isoZ(Coerce.rfc1123($"http")),
      Coerce.isoZ(Coerce.eiaLabelDate($"eia"))).collect().head
    // 14:30 São Paulo (UTC-3) → 17:30 UTC
    assert(r.getString(0) == "2024-03-15T17:30:00Z")
    assert(r.getString(1) == "2015-10-21T07:28:00Z")
    assert(r.getString(2) == "2025-12-31T00:00:00Z")
  }

  test("long coerce") {
    val df = Seq("42", " 7 ", "4.2", "abc").toDF("s")
    val out = df.select(Coerce.toLongCoerce($"s")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(Some(42L), Some(7L), None, None))
  }
}
