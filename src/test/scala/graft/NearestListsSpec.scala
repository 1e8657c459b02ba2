package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.NearestLists

/** Probe-selection expression edge cases. The bit-equality of the
  * happy path vs the old window form is pinned where it matters
  * (SimilaritySpec scanFrac/recall pins run through this expression);
  * here: the hostile-input contract — a NaN query component must
  * degrade deterministically, never throw (the old
  * crossJoin+row_number form ranked NaN rows too; a single bad vector
  * must not kill a corpus-wide knnJoin/ivfSearch job). */
class NearestListsSpec extends SparkSpec {
  import spark.implicits._

  // 3 lists, dim 2, row-major centroids
  private val cents = Array(1.0, 0.0, 0.0, 1.0, -1.0, 0.0)
  private val ids = Array(0, 1, 2)

  test("NaN query degrades to the lowest untaken lists, codegen and interpreted") {
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(Double.NaN, 1.0)))
      .toDF("id", "e")
    val out = df.select($"id", NearestLists($"e", cents, ids, 2, 2).as("ls"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(out(1L) == Seq(0, 1), s"good row: ${out(1L)}")
    // every dot is NaN -> strict-> scan picks nothing -> fallback takes
    // ascending list ids (deterministic, no exception)
    assert(out(2L) == Seq(0, 1), s"NaN row: ${out(2L)}")

    // interpreted eval path (no generated code)
    val got = NearestLists(
      Literal.create(Array(Double.NaN, 1.0), ArrayType(DoubleType)),
      cents, ids, 2, 2).eval(InternalRow.empty)
    assert(got.asInstanceOf[ArrayData].toIntArray().toSeq == Seq(0, 1))
  }

  test("nProbe covering all lists still terminates on a NaN query") {
    val got = NearestLists(
      Literal.create(Array(Double.NaN, Double.NaN), ArrayType(DoubleType)),
      cents, ids, 2, 3).eval(InternalRow.empty)
    assert(got.asInstanceOf[ArrayData].toIntArray().toSeq == Seq(0, 1, 2))
  }
}
