package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Offline maintenance for the at-least-once parquet stores the
  * streaming ingest loops grow (kept docs, IVF lists, signature
  * stores): a replayed micro-batch appends rows that are BIT-IDENTICAL
  * to the originals (deterministic gates, frozen quantizers), so
  * compaction is "keep one row per key" — any survivor is THE row.
  *
  * The rewrite is staged: write the deduped store to `<path>.compact`,
  * verify its row count, then delete-and-rename. A reader never sees a
  * half-written store; a crash between delete and rename leaves the
  * complete `<path>.compact` on disk for recovery (the same documented
  * crash window as the CMS store's generation prune — on an object
  * store, swap via its own atomic rename/copy primitive). Run it
  * offline, not concurrently with ingest: an append landing mid-swap
  * would be dropped with the old generation.
  */
object Stores {

  /** Rewrite `path` keeping one row per `keyCols` combination.
    * `partitionCols` reproduces the store's directory layout (e.g. the
    * IVF lists' `list_id`). Returns the row count after compaction. */
  def rewriteDeduped(spark: SparkSession, path: String,
                     keyCols: Seq[String],
                     partitionCols: Seq[String] = Nil): Long = {
    val p = new Path(path)
    val tmp = new Path(path + ".compact")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(path).dropDuplicates(keyCols)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    fs.delete(p, true)
    fs.rename(tmp, p)
    n
  }
}
