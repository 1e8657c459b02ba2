package graft.cache

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental materialized partial aggregates (SURVEY.md §4: the one
  * optimization Catalyst does not subsume; reference: fingerprinted
  * per-year payload cache at
  * reports/builders/bdqueimadas_incremental.py:32-183, fingerprint
  * :345-357, build-signature :320-342, reuse/rebuild loop :62-120).
  *
  * Application-level cache ABOVE the query: each partition key (e.g. a
  * year) maps to a durable Parquet partial aggregate plus a fingerprint
  * of its inputs and of the aggregation logic. A build reuses every
  * partition whose fingerprint is unchanged and recomputes only the
  * rest; consolidation is the partial→final merge-sum the reference runs
  * in pandas (:1051-1064) and Spark runs as a native re-aggregation.
  *
  * Scale notes: partials are Parquet (splittable, schema-carrying); the
  * manifest is a single small JSON; reuse means NOT scanning unchanged
  * input partitions at all — at 100 TB that is the difference between a
  * daily full scan and touching one mutable year.
  */
class IncrementalStore(spark: SparkSession, cacheDir: String,
                       buildSignature: String) {

  private val manifestPath = Paths.get(cacheDir, "_cache_manifest.json")

  case class Stats(reused: Seq[String], rebuilt: Seq[String])

  private def loadManifest(): Map[String, String] =
    if (!Files.exists(manifestPath)) Map.empty
    else {
      // one flat {"key":"fingerprint",...} object, written by this class
      val s = new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)
      "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap
    }

  private def saveManifest(m: Map[String, String]): Unit = {
    val body = m.toSeq.sorted.map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{\n  ", ",\n  ", "\n}")
    Files.createDirectories(manifestPath.getParent)
    Files.write(manifestPath, body.getBytes(StandardCharsets.UTF_8))
  }

  private def partitionPath(key: String) = s"$cacheDir/part_$key"

  /** Build-or-reuse: for each (key, inputFingerprint), reuse the cached
    * partial when `fingerprint + buildSignature` matches the manifest,
    * else run `compute(key)` and persist it. Returns the union of all
    * partials plus reuse stats. */
  def build(partitions: Seq[(String, String)],
            compute: String => DataFrame): (DataFrame, Stats) = {
    require(partitions.nonEmpty, "incremental build needs at least one partition")
    val manifest = loadManifest()
    val (reused, rebuilt) = partitions.partition { case (key, fp) =>
      manifest.get(key).contains(fp + "|" + buildSignature) &&
        new File(partitionPath(key)).exists()
    }
    rebuilt.foreach { case (key, _) =>
      compute(key).write.mode("overwrite").parquet(partitionPath(key))
    }
    saveManifest(manifest ++ partitions.map { case (k, fp) =>
      k -> (fp + "|" + buildSignature)
    })
    val frames = partitions.map { case (key, _) =>
      spark.read.parquet(partitionPath(key))
    }
    val union = frames.reduce(_ unionByName _)
    (union, Stats(reused.map(_._1), rebuilt.map(_._1)))
  }
}

/** Input fingerprints (reference: zip name, member names, sizes, CRCs —
  * bdqueimadas_incremental.py:345-357). */
object Fingerprints {
  /** ZIP fingerprint from the central directory: member (name, size,
    * crc) triples + archive length — no data read. */
  def zipFingerprint(path: String): String = {
    val f = new File(path)
    val z = new ZipFile(f)
    try {
      val entries = z.entries().asScala
        .map(e => s"${e.getName}:${e.getSize}:${e.getCrc}").toSeq.sorted
      sha256Hex((f.length().toString +: entries).mkString("|"))
    } finally z.close()
  }

  /** Generic file fingerprint: (length, mtime). */
  def fileFingerprint(path: String): String = {
    val f = new File(path)
    sha256Hex(s"${f.getName}:${f.length()}:${f.lastModified()}")
  }

  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
