package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense matrix–vector product `y = A·x` as one native codegen
  * expression — the rotation pass of OPQ (Ge et al., CVPR 2013): the
  * learned orthonormal transform is applied to every corpus vector
  * before PQ encoding. `flatA` is row-major `dim×dim`, riding into
  * generated code via `addReferenceObj` like `PqEncode`'s codebooks —
  * a 64×64 rotation costs zero generated-code size growth and stays
  * inside whole-stage codegen (an `aggregate`/`transform` HOF
  * formulation would be CodegenFallback, the measured-banned path).
  *
  * 100 TB shape: one extra O(dim²) multiply-add per row fused into the
  * same encode scan — no extra pass, no shuffle, no driver motion.
  */
case class MatVec(child: Expression, flatA: Array[Double], dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(flatA.length == dim * dim, s"flatA ${flatA.length} != $dim^2")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val y = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0
      var j = 0
      val off = i * dim
      while (j < dim) { s += flatA(off + j) * x.getDouble(j); j += 1 }
      y(i) = s
      i += 1
    }
    new GenericArrayData(y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val aRef = ctx.addReferenceObj("flatA", flatA, "double[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val y = ctx.freshName("y")
      s"""
        final double[] $y = new double[${dim}];
        for (int $i = 0; $i < ${dim}; $i++) {
          double $s = 0.0;
          final int ${i}Off = $i * ${dim};
          for (int $j = 0; $j < ${dim}; $j++) {
            $s += $aRef[${i}Off + $j] * $x.getDouble($j);
          }
          $y[$i] = $s;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($y);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
  override def prettyName: String = "mat_vec"
}

object MatVecF {
  def apply(x: Column, flatA: Array[Double], dim: Int): Column =
    GraftColumnBridge.column(
      MatVec(GraftColumnBridge.expression(x), flatA, dim))
}
