package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Scalar int8 quantization codec (the FAISS `SQ8` storage format) as a
  * pair of native codegen expressions. An encoded vector is ONE binary
  * value: an 8-byte IEEE-754 scale header followed by d signed int8
  * codes — 64-dim embeddings compress 256 B of float32 (or 512 B of
  * the promoted float64) to 72 B, self-contained, no side columns.
  *
  * Quantization is symmetric max-abs: scale = maxAbs/127,
  * code[i] = round(e[i]/scale) ∈ [−127, 127]. The approximate dot
  * product of two codes is scaleA·scaleB·Σ codeA[i]·codeB[i] — the
  * inner Σ is INTEGER arithmetic (exact, engine-portable); only the
  * two-scale product touches floats. Both expressions generate tight
  * primitive loops (the DotProduct discipline — interpreted HOFs are
  * banned from similarity hot paths, see CLAUDE.md).
  */
case class Sq8Encode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(e.getDouble(i)); if (a > maxAbs) maxAbs = a; i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val out = new Array[Byte](8 + n)
    val bits = java.lang.Double.doubleToLongBits(scale)
    i = 0
    while (i < 8) { out(i) = ((bits >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < n) {
      out(8 + i) = java.lang.Math.round(e.getDouble(i) / scale).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("maxAbs")
      val sc = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      s"""
        final int $n = $e.numElements();
        double $mx = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double a = java.lang.Math.abs($e.getDouble($i));
          if (a > $mx) $mx = a;
        }
        final double $sc = ($mx == 0.0) ? 1.0 : $mx / 127.0;
        final byte[] $out = new byte[8 + $n];
        final long $bits = java.lang.Double.doubleToLongBits($sc);
        for (int $i = 0; $i < 8; $i++) {
          $out[$i] = (byte) (($bits >>> (56 - 8 * $i)) & 0xffL);
        }
        for (int $i = 0; $i < $n; $i++) {
          $out[8 + $i] = (byte) java.lang.Math.round($e.getDouble($i) / $sc);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
  override def prettyName: String = "sq8_encode"
}

/** Approximate dot product of two `Sq8Encode` codes:
  * scaleA·scaleB·Σ codeA[i]·codeB[i]. The int32 accumulator is exact
  * (127² · 2¹⁵ dims fits easily); lengths are defensively min-clamped
  * like `DotProduct`. */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)

  private def scaleOf(b: Array[Byte]): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (b(i) & 0xffL); i += 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length) - 8
    var s = 0L
    var i = 0
    while (i < n) { s += x(8 + i) * y(8 + i); i += 1 }
    scaleOf(x) * scaleOf(y) * s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      val ba = ctx.freshName("bitsA")
      val bb = ctx.freshName("bitsB")
      s"""
        final int $n = java.lang.Math.min($a.length, $b.length) - 8;
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a[8 + $i] * $b[8 + $i];
        }
        long $ba = 0L; long $bb = 0L;
        for (int $i = 0; $i < 8; $i++) {
          $ba = ($ba << 8) | ($a[$i] & 0xffL);
          $bb = ($bb << 8) | ($b[$i] & 0xffL);
        }
        ${ev.value} = java.lang.Double.longBitsToDouble($ba)
          * java.lang.Double.longBitsToDouble($bb) * $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Sq8Dot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sq8_dot"
}

object Sq8 {
  def encode(e: Column): Column =
    GraftColumnBridge.column(Sq8Encode(GraftColumnBridge.expression(e)))
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(Sq8Dot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
