package graft.profile

import java.io.{BufferedInputStream, File, FileInputStream}
import java.security.MessageDigest
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import graft.sources.Sniff

/** Resource profiling (SURVEY.md §2.1 S4–S8, §2.4 A19/A21/A22;
  * reference: profiling.py:269-297 tabular counts, :300-335 excel/json,
  * :375-424 archive profile, :481-521 streaming hash, bounds :53-56).
  *
  * Ingest-layer logic: runs per resource on the node that downloaded it
  * (driver or `mapPartitions` task — see §3.1's Spark shape: discovery →
  * work-list DataFrame → executor-side profiling). Bounded: ≤8 archive
  * members, single pass per file, hash computed while streaming.
  */
case class ProfileWarning(code: String, message: String)

case class ArchiveProfile(
    memberCount: Int, members: Seq[String],
    uncompressedSizeBytes: Long, tabularMembers: Seq[String])

case class ResourceProfile(
    path: String, sizeBytes: Long, sha256: String, format: String,
    rowCount: Option[Long], columnCount: Option[Int], columns: Seq[String],
    profileStatus: String, // ok | partial | failed | skipped
    profileWarnings: Seq[ProfileWarning],
    archiveProfile: Option[ArchiveProfile])

object Profiler {
  val MaxArchiveMembers = 8

  private val TabularSuffixes = Set("csv", "txt", "tsv")

  private def suffix(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i < 0) "" else name.substring(i + 1).toLowerCase
  }

  /** Streaming sha256 + byte count (one pass, S8). */
  def hashAndSize(path: String): (String, Long) = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new BufferedInputStream(new FileInputStream(path))
    try {
      val buf = new Array[Byte](65536)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); total += n; n = in.read(buf) }
      (md.digest().map("%02x".format(_)).mkString, total)
    } finally in.close()
  }

  /** Header + row count of decoded tabular text (A19: header columns,
    * `sum(1 for _)` rows). */
  def tabularCounts(text: String): (Long, Seq[String]) = {
    val lines = text.split("\r?\n").iterator.filter(_.nonEmpty)
    if (!lines.hasNext) return (0L, Nil)
    val head = lines.next()
    val d = Sniff.delimiter(text.substring(0, math.min(text.length, 8192)))
    (lines.size.toLong, Sniff.splitLine(head, d).toSeq.map(_.trim))
  }

  def profilePath(path: String): ResourceProfile = {
    val f = new File(path)
    if (!f.exists())
      return ResourceProfile(path, 0L, "", suffix(path), None, None, Nil,
        "failed", Seq(ProfileWarning("missing", s"no such file: $path")), None)
    val (sha, size) = hashAndSize(path)
    suffix(path) match {
      case s if TabularSuffixes.contains(s) => profileTabular(path, sha, size, s)
      case "zip" => profileZip(path, sha, size)
      case "json" => profileJson(path, sha, size)
      case "xml" => profileXml(path, sha, size)
      case other =>
        ResourceProfile(path, size, sha, other, None, None, Nil, "skipped",
          Seq(ProfileWarning("unsupported_format", other)), None)
    }
  }

  private def profileTabular(path: String, sha: String, size: Long,
                             fmt: String): ResourceProfile = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (text, _) = Sniff.decode(bytes)
    val (rows, cols) = tabularCounts(text)
    ResourceProfile(path, size, sha, fmt, Some(rows), Some(cols.length), cols,
      "ok", Nil, None)
  }

  /** Archive profile (S7/A21): enumerate members, profile the first ≤8
    * tabular members, sum their row counts. Partial when the bound trims
    * tabular members. */
  private def profileZip(path: String, sha: String, size: Long): ResourceProfile = {
    val z = new ZipFile(path)
    try {
      val entries = z.entries().asScala.filterNot(_.isDirectory).toVector
      val members = entries.map(_.getName).sorted
      val tabular = members.filter(m => TabularSuffixes.contains(suffix(m)))
      val profiled = tabular.take(MaxArchiveMembers)
      var rowSum = 0L
      var cols: Seq[String] = Nil
      profiled.foreach { m =>
        val in = z.getInputStream(z.getEntry(m))
        val bytes = in.readAllBytes(); in.close()
        val (text, _) = Sniff.decode(bytes)
        val (r, c) = tabularCounts(text)
        rowSum += r
        if (cols.isEmpty) cols = c
      }
      val truncated = tabular.length > MaxArchiveMembers
      ResourceProfile(path, size, sha, "zip",
        if (profiled.nonEmpty) Some(rowSum) else None,
        if (cols.nonEmpty) Some(cols.length) else None, cols,
        if (truncated) "partial" else "ok",
        if (truncated)
          Seq(ProfileWarning("archive_members_truncated",
            s"profiled $MaxArchiveMembers of ${tabular.length} tabular members"))
        else Nil,
        Some(ArchiveProfile(entries.length, members,
          entries.map(_.getSize).filter(_ > 0).sum, tabular)))
    } finally z.close()
  }

  /** XML probe (S6, profiling.py:338-350): root tag only. */
  private def profileXml(path: String, sha: String, size: Long): ResourceProfile = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val root = "<([A-Za-z_][\\w.:-]*)".r.findFirstMatchIn(
      text.replaceAll("<\\?.*?\\?>", "").replaceAll("<!--.*?-->", ""))
      .map(_.group(1))
    root match {
      case Some(tag) =>
        ResourceProfile(path, size, sha, "xml", None, None, Seq(tag), "ok", Nil, None)
      case None =>
        ResourceProfile(path, size, sha, "xml", None, None, Nil, "failed",
          Seq(ProfileWarning("xml_parse", "no root element")), None)
    }
  }

  /** JSON probe (S5): top-level array → row_count; object → column list. */
  private def profileJson(path: String, sha: String, size: Long): ResourceProfile = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim
    if (text.startsWith("[")) {
      // count top-level elements without a full parser: depth-0 commas + 1
      var depth = 0; var inStr = false; var esc = false; var n = 0L
      var seen = false
      text.foreach { c =>
        if (esc) esc = false
        else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
        else c match {
          case '"' => if (depth == 1) seen = true; inStr = true
          case '[' | '{' => if (depth == 1) seen = true; depth += 1
          case ']' | '}' => depth -= 1
          case ',' if depth == 1 => n += 1
          case c2 if depth == 1 && !c2.isWhitespace => seen = true
          case _ =>
        }
      }
      ResourceProfile(path, size, sha, "json",
        Some(if (seen) n + 1 else 0L), None, Nil, "ok", Nil, None)
    } else if (text.startsWith("{")) {
      val keys = "\"([^\"]+)\"\\s*:".r.findAllMatchIn(text).map(_.group(1)).toSeq.distinct
      ResourceProfile(path, size, sha, "json", None, Some(keys.length), keys,
        "ok", Nil, None)
    } else
      ResourceProfile(path, size, sha, "json", None, None, Nil, "failed",
        Seq(ProfileWarning("json_parse", "neither array nor object")), None)
  }
}
