package graft.sources

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.ByteBuffer

/** Schema-resolution pre-pass: delimiter sniffing and encoding fallback
  * (SURVEY.md §1.3; reference: csv.Sniffer usage at
  * reports/builders/bdqueimadas_incremental.py:776-786,914-923 and the
  * utf-8 → latin-1 → cp1252 chain at :891-911, profiling.py:247-254).
  *
  * Driver-or-executor side application logic — never a Catalyst concern.
  * Runs over a small sample (4–8 KB) per file.
  */
object Sniff {
  val Candidates: Seq[Char] = Seq(';', ',', '|', '\t')

  /** Pick the delimiter whose per-line count is consistent (>0, same on
    * every sampled non-empty line); fall back to the `;` vs `,` majority
    * count (the reference's fallback, bdqueimadas_incremental.py:784-786). */
  def delimiter(sample: String): Char = {
    val lines = sample.split("\r?\n").filter(_.nonEmpty).take(16)
    if (lines.isEmpty) return ','
    val consistent = Candidates.filter { d =>
      val counts = lines.map(countOutsideQuotes(_, d))
      counts.head > 0 && counts.distinct.length == 1
    }
    consistent.headOption.getOrElse {
      if (sample.count(_ == ';') >= sample.count(_ == ',')) ';' else ','
    }
  }

  private def countOutsideQuotes(line: String, d: Char): Int = {
    var in = false; var n = 0
    line.foreach {
      case '"' => in = !in
      case c if c == d && !in => n += 1
      case _ =>
    }
    n
  }

  /** Strict-decode fallback chain: utf-8 (BOM-stripped) → cp1252 →
    * latin-1. The reference lists utf-8 → latin-1 → cp1252
    * (bdqueimadas_incremental.py:891-911), but latin-1 accepts every
    * byte, so its cp1252 leg is unreachable; trying strict cp1252 before
    * the latin-1 catch-all preserves the intent (Windows-encoded pt-BR
    * files decode correctly) while keeping the chain total. */
  def decode(bytes: Array[Byte]): (String, String) = {
    val body =
      if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
          bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
        java.util.Arrays.copyOfRange(bytes, 3, bytes.length)
      else bytes
    def strict(cs: String): Option[String] =
      try {
        val dec = Charset.forName(cs).newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        Some(dec.decode(ByteBuffer.wrap(body)).toString)
      } catch { case _: Exception => None }
    strict("UTF-8").map((_, "utf-8"))
      .orElse(strict("windows-1252").map((_, "cp1252")))
      .getOrElse((new String(body, Charset.forName("ISO-8859-1")), "latin-1"))
  }

  /** Minimal quote-aware CSV field splitter ("" escapes a quote). */
  def splitLine(line: String, d: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var in = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') {
        if (in && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else in = !in
      } else if (c == d && !in) {
        out += cur.result(); cur.clear()
      } else cur.append(c)
      i += 1
    }
    out += cur.result()
    out.toArray
  }
}

/** Header → canonical-role resolution by ordered candidate lists with
  * normalized matching (reference: bdqueimadas_incremental.py:795-824,
  * normalizer :864-869; defaults bdqueimadas_overview.py:36-62). */
object ColumnResolver {
  /** casefold + strip non-alphanumerics. */
  def normKey(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]", "")

  /** For each role, the first candidate (in order) present in the
    * normalized header wins; returns role → column index. Roles absent
    * from the header are simply missing from the map — callers decide
    * whether that is a hard error (the reference errors for datetime/
    * state/biome, bdqueimadas_incremental.py:805-824). */
  def resolve(header: Seq[String],
              candidates: Map[String, Seq[String]]): Map[String, Int] = {
    val byKey = header.zipWithIndex.map { case (h, i) => normKey(h) -> i }.toMap
    candidates.flatMap { case (role, cands) =>
      cands.iterator.map(normKey).collectFirst {
        case k if byKey.contains(k) => role -> byKey(k)
      }
    }
  }

  /** `resolve`, lifted to a DataFrame of headers from MANY files at
    * once — the shape a 100 TB ingest wants (one distributed pass
    * resolving every file's drifted header, not a driver loop calling
    * `resolve` per file). `headers` = (file, pos, hdr) rows; the
    * candidate table is a handful of literals and broadcasts.
    *
    * Semantics match `resolve` exactly (`ColumnResolverFrameSpec` pins
    * row-for-row equality, including the tie rules): lowest candidate
    * rank wins per (file, role); among header columns sharing that
    * candidate's key, the LAST position wins (resolve's `toMap`
    * keeps the last duplicate); roles with no matching header emit no
    * row. Output: (file, role, col_idx, matched), ordered. */
  def resolveFrame(headers: org.apache.spark.sql.DataFrame,
                   candidates: Seq[(String, Seq[String])]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = headers.sparkSession
    import spark.implicits._
    val cand = candidates.flatMap { case (role, cs) =>
      cs.zipWithIndex.map { case (c, r) => (role, r, normKey(c)) }
    }.toDF("role", "cand_rank", "key")
    headers
      .withColumn("key", regexp_replace(lower(col("hdr")), "[^a-z0-9]", ""))
      .join(broadcast(cand), Seq("key"))
      .withColumn("rn", row_number().over(Window.partitionBy("file", "role")
        .orderBy(col("cand_rank").asc, col("pos").desc)))
      .where(col("rn") === 1)
      .select(col("file"), col("role"), col("pos").cast("int").as("col_idx"),
        col("hdr").as("matched"))
      .orderBy("file", "role")
  }
}
