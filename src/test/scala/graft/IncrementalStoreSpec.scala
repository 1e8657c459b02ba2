package graft

import org.apache.spark.sql.functions._
import graft.cache.{Fingerprints, IncrementalStore}

class IncrementalStoreSpec extends SparkSpec {
  import spark.implicits._

  test("build reuses unchanged partitions, rebuilds changed, merges exactly") {
    val dir = java.nio.file.Files.createTempDirectory("incr").toFile.getAbsolutePath
    val store = new IncrementalStore(spark, dir, buildSignature = "v1")

    var computed = Vector.empty[String]
    def compute(data: Map[String, Seq[(String, Int)]])(key: String) = {
      computed :+= key
      data(key).toDF("state", "n")
        .groupBy("state").agg(sum("n").as("value"))
    }

    val v1 = Map(
      "2023" -> Seq(("A", 1), ("B", 2)),
      "2024" -> Seq(("A", 10)))

    // first build: everything computes
    val (out1, s1) = store.build(
      Seq("2023" -> "fp23a", "2024" -> "fp24a"), compute(v1))
    assert(s1.rebuilt.toSet == Set("2023", "2024") && s1.reused.isEmpty)
    val merged1 = out1.groupBy("state").agg(sum("value").as("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged1 == Map("A" -> 11L, "B" -> 2L))

    // second build, same fingerprints: zero compute
    computed = Vector.empty
    val (_, s2) = store.build(
      Seq("2023" -> "fp23a", "2024" -> "fp24a"), compute(v1))
    assert(s2.rebuilt.isEmpty && s2.reused.toSet == Set("2023", "2024"))
    assert(computed.isEmpty)

    // 2024 input changes: only 2024 recomputes, totals reflect new data
    val v2 = v1.updated("2024", Seq(("A", 20), ("B", 5)))
    computed = Vector.empty
    val (out3, s3) = store.build(
      Seq("2023" -> "fp23a", "2024" -> "fp24b"), compute(v2))
    assert(s3.rebuilt == Seq("2024") && s3.reused == Seq("2023"))
    assert(computed == Vector("2024"))
    val merged3 = out3.groupBy("state").agg(sum("value").as("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged3 == Map("A" -> 21L, "B" -> 7L))
  }

  test("build signature change invalidates everything") {
    val dir = java.nio.file.Files.createTempDirectory("incr2").toFile.getAbsolutePath
    def compute(key: String) = Seq((key, 1)).toDF("k", "n")
    val (_, s1) = new IncrementalStore(spark, dir, "v1")
      .build(Seq("a" -> "fp"), compute)
    assert(s1.rebuilt == Seq("a"))
    val (_, s2) = new IncrementalStore(spark, dir, "v2")
      .build(Seq("a" -> "fp"), compute)
    assert(s2.rebuilt == Seq("a")) // signature bumped → recompute
  }

  test("zip fingerprint changes with content") {
    import java.io.{File, FileOutputStream}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("fps").toFile
    def mkzip(name: String, content: String): String = {
      val f = new File(dir, name)
      val z = new ZipOutputStream(new FileOutputStream(f))
      z.putNextEntry(new ZipEntry("m.csv")); z.write(content.getBytes); z.closeEntry(); z.close()
      f.getAbsolutePath
    }
    val a = Fingerprints.zipFingerprint(mkzip("a.zip", "x,y\n1,2\n"))
    val b = Fingerprints.zipFingerprint(mkzip("b.zip", "x,y\n1,2\n"))
    val c = Fingerprints.zipFingerprint(mkzip("c.zip", "x,y\n9,9\n"))
    assert(a == b)   // same members+sizes+crcs
    assert(a != c)   // different content → different crc
  }
}
