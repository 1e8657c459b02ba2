package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints the formatted physical plan of selected
  * queries (all when no names given). Used to audit scan pruning
  * (PushedFilters / ReadSchema), broadcast decisions, and
  * whole-stage-codegen spans — the at-scale health checks. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // mirror Bench's session knobs so audited plans are the BENCH
    // regime's plans (salt dials, widths): same cpu env var, same
    // derived shuffle partitions
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // csv column pruning skips token-count validation for unread
      // fields — readCsvs requires it OFF session-wide for malformed-row
      // parity (see readCsvs contract); set it here like nanosAsLong so
      // the invariant holds regardless of call order.
      .config("spark.sql.csv.parser.columnPruning.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
