package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for NFKD accent stripping — the one UDF on
  * the engine's hot path (state-name normalization runs per input row in
  * the daily pipeline, reference daily/pipeline.py:448-453), promoted to
  * a codegen expression per SURVEY.md §7 ("revisit only if profiling
  * shows UDF hotspots"): no Scala-closure serialization, no
  * Row↔JVM-object conversion, null handling inherited from
  * UnaryExpression, and generated code that calls one static helper —
  * the expression stays inside the whole-stage-codegen span instead of
  * breaking it the way a UDF does.
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    StripAccents.strip(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}

object StripAccents {
  /** Static helper shared by interpreted eval and generated code. */
  def strip(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    // fast path: pure ASCII needs no normalization
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFKD).replaceAll("\\p{M}+", ""))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(StripAccents(GraftColumnBridge.expression(c)))
}

/** Session extensions: registers `strip_accents` and `dot_product` for
  * SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or call `GraftExtensions.register(spark)` on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[functions] val descriptors = Seq(
    (FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => StripAccents(children.head)),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach(d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3))
}
