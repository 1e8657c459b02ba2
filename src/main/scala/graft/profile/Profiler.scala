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

  /** Streaming form: charset + delimiter sniffed from an 8 KB prefix,
    * lines counted through the stream — memory is O(line), not
    * O(member), matching the ZipCsv scan's memory contract. */
  def tabularCounts(in: java.io.InputStream): (Long, Seq[String]) = {
    val (d, lines) = graft.sources.ZipCsv.sniffedLines(in)
    val ne = lines.filter(_.nonEmpty)
    if (!ne.hasNext) return (0L, Nil)
    val cols = Sniff.splitLine(ne.next(), d).toSeq.map(_.trim)
    var n = 0L
    ne.foreach(_ => n += 1)
    (n, cols)
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
      case "xlsx" => profileXlsx(path, sha, size)
      case "xls" =>
        // legacy binary workbook: the reference's pandas reader fails on
        // these without xlrd and reports partial (profiling.py:306-312)
        ResourceProfile(path, size, sha, "xls", None, None, Nil, "partial",
          Seq(ProfileWarning("unsupported_format",
            "Excel profile failed: legacy binary format")), None)
      case other =>
        ResourceProfile(path, size, sha, other, None, None, Nil, "skipped",
          Seq(ProfileWarning("unsupported_format", other)), None)
    }
  }

  /** Excel scan (S4, profiling.py:300-318): first sheet's header row →
    * columns; data rows (header excluded) → row_count. XLSX is ZIP +
    * sheet XML, so this needs no spreadsheet library: a StAX stream over
    * `xl/worksheets/sheet1.xml` counts `<row>` elements and resolves the
    * first row's cells against `xl/sharedStrings.xml` — memory stays
    * O(shared strings), never O(sheet). Failures → partial, mirroring
    * the reference's catch-all. */
  private def profileXlsx(path: String, sha: String, size: Long): ResourceProfile =
    try {
      val z = new ZipFile(path)
      try {
        val names = z.entries().asScala.map(_.getName).toVector
        val sheets = names.filter(n => n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
        // sheet1.xml is the conventional first sheet; fall back to the
        // lexicographically first worksheet member
        val sheet = sheets.sortBy(n => (if (n == "xl/worksheets/sheet1.xml") 0 else 1, n))
          .headOption
        sheet match {
          case None =>
            ResourceProfile(path, size, sha, "xlsx", None, None, Nil, "partial",
              Seq(ProfileWarning("unsupported_format",
                "Excel profile failed: no worksheet member")), None)
          case Some(sn) =>
            val shared = names.find(_ == "xl/sharedStrings.xml")
              .map(ss => readSharedStrings(z.getInputStream(z.getEntry(ss))))
              .getOrElse(Vector.empty)
            val (totalRows, headers) = scanSheet(z.getInputStream(z.getEntry(sn)), shared)
            val dataRows = math.max(0L, totalRows - 1)
            ResourceProfile(path, size, sha, "xlsx", Some(dataRows),
              Some(headers.length), headers, "ok", Nil, None)
        }
      } finally z.close()
    } catch {
      case e: Exception =>
        ResourceProfile(path, size, sha, "xlsx", None, None, Nil, "partial",
          Seq(ProfileWarning("unsupported_format",
            s"Excel profile failed: ${e.getClass.getSimpleName}")), None)
    }

  private def xmlReader(in: java.io.InputStream): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** sharedStrings.xml → indexed strings (rich-text `<t>` runs inside
    * one `<si>` concatenate). */
  private def readSharedStrings(in: java.io.InputStream): Vector[String] = {
    import javax.xml.stream.XMLStreamConstants._
    val r = xmlReader(in)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) r.next() match {
        case START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur.clear()
            case "t" => inT = true
            case _ =>
          }
        case CHARACTERS | CDATA if inT => cur.append(r.getText)
        case END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += cur.toString
            case _ =>
          }
        case _ =>
      }
      out.result()
    } finally r.close()
  }

  /** One streaming pass over a worksheet: total `<row>` count + the
    * first row's cell values (shared-string refs resolved, inline
    * strings and raw `<v>` taken as-is). */
  private def scanSheet(in: java.io.InputStream,
                        shared: Vector[String]): (Long, Seq[String]) = {
    import javax.xml.stream.XMLStreamConstants._
    val r = xmlReader(in)
    var rows = 0L
    var inFirstRow = false
    var cellType: Option[String] = None
    var capture = false
    val sb = new StringBuilder
    val headers = Seq.newBuilder[String]
    try {
      while (r.hasNext) r.next() match {
        case START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              rows += 1
              if (rows == 1) inFirstRow = true
            case "c" if inFirstRow =>
              cellType = Option(r.getAttributeValue(null, "t"))
              sb.clear()
            case "v" | "t" if inFirstRow => capture = true
            case _ =>
          }
        case CHARACTERS | CDATA if capture => sb.append(r.getText)
        case END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => capture = false
            case "c" if inFirstRow =>
              val raw = sb.toString
              headers += (cellType match {
                case Some("s") =>
                  raw.trim.toIntOption.flatMap(shared.lift).getOrElse(raw)
                case _ => raw
              })
            case "row" if inFirstRow => inFirstRow = false
            case _ =>
          }
        case _ =>
      }
      (rows, headers.result())
    } finally r.close()
  }

  private def profileTabular(path: String, sha: String, size: Long,
                             fmt: String): ResourceProfile = {
    val in = new BufferedInputStream(new FileInputStream(path))
    val (rows, cols) = try tabularCounts(in) finally in.close()
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
        val (r, c) = try tabularCounts(in) finally in.close()
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
