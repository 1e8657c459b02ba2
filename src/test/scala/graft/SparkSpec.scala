package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (same configs as Verify). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // csv column pruning skips token-count validation for unread
      // fields — readCsvs requires it OFF session-wide for malformed-row
      // parity (see readCsvs contract); set it here like nanosAsLong so
      // the invariant holds regardless of call order.
      .config("spark.sql.csv.parser.columnPruning.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session alive across suites (getOrCreate shares it)
  }
}
