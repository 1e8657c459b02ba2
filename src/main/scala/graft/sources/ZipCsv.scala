package graft.sources

import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distributed CSV-and-ZIP scan with per-file schema resolution
  * (SURVEY.md §2.1 S1–S3; reference: ZIP member pick
  * reports/builders/bdqueimadas_incremental.py:764-773, sniffed read
  * :651-713,884-911, bare CSV :504-548,914-949).
  *
  * Scale design: `binaryFiles` distributes one archive per task —
  * extraction, sniffing, decoding, and row parsing all run executor-side,
  * so a 100 TB corpus of ZIPs parallelizes across the cluster with no
  * driver involvement beyond file listing. Each file resolves its own
  * header (schemas drift between files — SURVEY §7 "What's hard"), and
  * the output is the union of per-file projections onto the requested
  * roles, already normalized to canonical column names.
  */
object ZipCsv {

  private def isTabular(name: String): Boolean = {
    val l = name.toLowerCase
    l.endsWith(".csv") || l.endsWith(".txt")
  }

  /** First `.csv`/`.txt` member by sorted name, extracted in two
    * streaming passes (names only, then the one target member) — memory
    * stays bounded by the MEMBER size, never the archive size, so a
    * task handles multi-GB archives without buffering them. */
  private def firstTabularMember(open: () => java.io.InputStream): Option[(String, Array[Byte])] = {
    val names = {
      val zin = new ZipInputStream(open())
      try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filterNot(_.isDirectory).map(_.getName).filter(isTabular).toVector
      finally zin.close()
    }
    names.sorted.headOption.map { target =>
      val zin = new ZipInputStream(open())
      try {
        val it = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        val out = new java.io.ByteArrayOutputStream()
        it.find(_.getName == target).foreach { _ =>
          val buf = new Array[Byte](65536)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
        }
        target -> out.toByteArray
      } finally zin.close()
    }
  }

  /** Parse one decoded tabular payload: sniff delimiter, resolve the
    * header against `roles`, project each data row onto the role order;
    * rows whose field count differs from the header are skipped
    * (`on_bad_lines="skip"`). Missing optional roles yield null columns;
    * missing REQUIRED roles are a hard error naming the file — the
    * reference's unresolvable-column semantics
    * (bdqueimadas_incremental.py:805-824). */
  private def parsePayload(text: String, roles: Seq[(String, Seq[String])],
                           sourceName: String,
                           required: Set[String]): Iterator[Row] = {
    val lines = text.split("\r?\n").iterator.filter(_.nonEmpty)
    if (!lines.hasNext) return Iterator.empty
    val sample = text.substring(0, math.min(text.length, 8192))
    val d = Sniff.delimiter(sample)
    val header = Sniff.splitLine(lines.next(), d)
    val resolved = ColumnResolver.resolve(header.toSeq, roles.toMap)
    val missing = required.filterNot(resolved.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"unresolvable required columns ${missing.mkString(", ")} in $sourceName " +
          s"(header: ${header.mkString(", ")})")
    val idx = roles.map { case (role, _) => resolved.get(role) }
    lines.flatMap { line =>
      val fields = Sniff.splitLine(line, d)
      if (fields.length != header.length) None // bad line → skip
      else Some(Row.fromSeq(sourceName +: idx.map {
        case Some(i) if i < fields.length => fields(i)
        case _ => null
      }))
    }
  }

  private def schemaFor(roles: Seq[(String, Seq[String])]): StructType =
    StructType(StructField("source_file", StringType, nullable = false) +:
      roles.map { case (r, _) => StructField(r, StringType, nullable = true) })

  /** Read a glob of ZIP archives: each archive's first tabular member is
    * sniffed, decoded, resolved, and projected to `roles` (ordered
    * candidate lists). All-string output — the coerce-cast layer types it.
    * Roles in `required` hard-error when a file's header cannot resolve
    * them. */
  def readZips(spark: SparkSession, glob: String,
               roles: Seq[(String, Seq[String])],
               required: Set[String] = Set.empty): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (path, pds) =>
      // corrupt archives are skipped, not fatal (on_bad_lines spirit at
      // the archive level); the profiler reports them separately
      try firstTabularMember(() => pds.open()) match {
        case Some((_, memberBytes)) =>
          val (text, _) = Sniff.decode(memberBytes)
          parsePayload(text, roles, path, required)
        case None => Iterator.empty
      } catch { case _: java.io.IOException | _: java.util.zip.ZipException =>
        Iterator.empty
      }
    }
    spark.createDataFrame(rows, schemaFor(roles))
  }

  /** Read bare CSV/TXT files with the same sniff/resolve semantics. */
  def readCsvs(spark: SparkSession, glob: String,
               roles: Seq[(String, Seq[String])],
               required: Set[String] = Set.empty): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (path, pds) =>
      val (text, _) = Sniff.decode(pds.toArray())
      parsePayload(text, roles, path, required)
    }
    spark.createDataFrame(rows, schemaFor(roles))
  }
}
