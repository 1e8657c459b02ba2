package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Coerce-to-null casting layer reproducing pandas `errors="coerce"`
  * semantics (SURVEY.md §1.2; reference: mixed-format datetime parse with
  * per-column dayfirst at reports/builders/bdqueimadas_incremental.py:716-732,
  * pt-BR locale decimals at social/anp_producao/pipeline.py:241-245).
  *
  * Every helper is a pure builtin-expression composition: malformed
  * values become null, never errors — whole-stage codegen keeps these in
  * the scan-side projection at any scale.
  */
object Coerce {

  private val IsoFormats = Seq(
    "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd", "yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd")

  private val DayFirstFormats = Seq(
    "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd/MM/yyyy",
    "dd-MM-yyyy HH:mm:ss", "dd-MM-yyyy")

  /** Ordered-format timestamp parse: first format that parses wins, null
    * otherwise. `dayfirst` switches the candidate order the way the
    * reference switches on column name (data_pas/data_hora_gmt are ISO,
    * others dayfirst — bdqueimadas_incremental.py:716-719). */
  def toTimestampCoerce(c: Column, dayfirst: Boolean = false): Column = {
    val formats = if (dayfirst) DayFirstFormats ++ IsoFormats
                  else IsoFormats ++ DayFirstFormats
    coalesce(formats.map(f => try_to_timestamp(trim(c), lit(f))): _*)
      .cast(TimestampType)
  }

  /** Plain numeric coerce: non-numeric → null. */
  def toDoubleCoerce(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)([eE][+-]?[0-9]+)?$"),
      t.cast(DoubleType)).otherwise(lit(null).cast(DoubleType))
  }

  /** pt-BR locale decimal (`1.234,56`): strip thousands dots and swap the
    * decimal comma ONLY when a comma is present (the reference's
    * comma-presence heuristic, anp_producao/pipeline.py:241-245). */
  def ptbrDecimal(c: Column): Column = {
    val t = trim(c)
    val converted = when(t.contains(","),
        regexp_replace(regexp_replace(t, "\\.", ""), ",", "."))
      .otherwise(t)
    toDoubleCoerce(converted)
  }

  /** Nullable integer coerce (pandas Int64 analog,
    * anp_producao/pipeline.py:251-252). */
  def toLongCoerce(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("^[+-]?[0-9]+$"), t.cast("long")).otherwise(lit(null).cast("long"))
  }
}
