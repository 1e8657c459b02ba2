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
                     partitionCols: Seq[String] = Nil): Long =
    rewriteWith(spark, path, _.dropDuplicates(keyCols), partitionCols)

  /** Rewrite `path` keeping, per `keyCols` combination, only the row
    * with the greatest `verCol` — the space reclaim for append-only
    * VERSIONED stores whose readers take the latest row anyway
    * (IngestLinkage's golden records). Ties keep one arbitrary row,
    * which is safe exactly when equal-version rows are bit-identical
    * (the replay contract). Keyed window, corpus-parallel. */
  def rewriteLatest(spark: SparkSession, path: String,
                    keyCols: Seq[String], verCol: String,
                    partitionCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    rewriteWith(spark, path, df =>
      df.withColumn("__rn", row_number().over(
          Window.partitionBy(keyCols.map(col): _*)
            .orderBy(col(verCol).desc)))
        .where(col("__rn") === 1).drop("__rn"),
      partitionCols)
  }

  /** Read ONLY the named partition directories of a `colName=`-
    * partitioned store (`basePath` keeps the partition column in the
    * schema). A bare `read.parquet(dir)` lists ALL nBuckets partition
    * dirs before pruning — driver-side listing + footer work that
    * dominates a small probe once maintenance scales the geometry with
    * the corpus (measured 3× the whole search at 7,500 buckets,
    * SCALE.md round 12). Falls back to the full-listing read when the
    * probe covers every bucket (equivalent, never worse) or when no
    * named dir exists yet (nothing hashed there — the caller's bucket
    * filter then returns the same rows either way). Callers keep their
    * `isin` bucket filter: it is the partition filter the plan pins
    * audit, and it guards the fallback paths. */
  def bucketRead(spark: SparkSession, dir: String, colName: String,
                 buckets: Seq[Int],
                 nBuckets: Int): org.apache.spark.sql.DataFrame = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = buckets.distinct
    val dirs = want.map(b => s"$dir/$colName=$b")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty || want.size >= nBuckets)
      spark.read.parquet(dir)
    else
      spark.read.option("basePath", dir).parquet(dirs: _*)
  }

  // staged swap with every filesystem boolean CHECKED and the old
  // store renamed ASIDE before the promote (the lexRebalance
  // hardening): no crash window — or silent rename failure — leaves
  // the path without a complete readable copy somewhere (<path>,
  // <path>.old, or <path>.compact)
  private def rewriteWith(spark: SparkSession, path: String,
                          f: org.apache.spark.sql.DataFrame =>
                            org.apache.spark.sql.DataFrame,
                          partitionCols: Seq[String]): Long = {
    val p = new Path(path)
    val tmp = new Path(path + ".compact")
    val old = new Path(path + ".old")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old)) {
      // A leftover .old is only stale if the promote completed (path
      // exists). After a crash between rename(p->old) and rename(tmp->p)
      // the .old IS the store — heal by renaming it back instead of
      // destroying the sole complete copy.
      if (!fs.exists(p))
        require(fs.rename(old, p), s"self-heal rename $old -> $p failed")
      else
        require(fs.delete(old, true), s"could not clear stale $old")
    }
    val df0 = f(spark.read.parquet(path))
    // one balanced shuffle → one file per partition key, never
    // tasks × cardinality slivers (the round-8 partitionBy rule;
    // matters once stores carry bucket-partition columns)
    val df =
      if (partitionCols.nonEmpty)
        df0.repartition(partitionCols.map(
          org.apache.spark.sql.functions.col): _*)
      else df0
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    require(fs.rename(p, old), s"rename $p -> $old failed")
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed " +
      s"(old store preserved at $old — rename back to recover)")
    require(fs.delete(old, true), s"could not delete $old")
    n
  }
}
