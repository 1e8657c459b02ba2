package graft.profile

/** Manifest envelope (SURVEY.md §1.1; reference:
  * manifests/build_manifest.py:103-129, strict meta keys :11-17, item
  * normalization :77-91, status derivation :94-100).
  *
  * Values are a minimal JSON tree (JVal) because meta/custom_tags are
  * schemaless; the envelope itself is typed.
  */
sealed trait JVal
case class JStr(v: String) extends JVal
case class JNum(v: Double) extends JVal
case class JBool(v: Boolean) extends JVal
case object JNull extends JVal
case class JArr(v: Seq[JVal]) extends JVal
case class JObj(v: Seq[(String, JVal)]) extends JVal

object JVal {

  /** Recursive-descent JSON parser → JVal (parse-or-error; the
    * reference's parse-or-null callers wrap with toOption). Completes
    * the round-trip with `render` so published manifests/catalogs can
    * be re-read (profile cache, incremental merge, CKAN packages). */
  def parse(s: String): Either[String, JVal] = {
    var i = 0
    def err(msg: String) = Left(s"$msg at offset $i")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Boolean = { ws(); if (i < s.length && s.charAt(i) == c) { i += 1; true } else false }
    def str(): Either[String, String] = {
      if (!expect('"')) return err("expected string")
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) return err("bad escape")
          s.charAt(i) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) return err("bad unicode escape")
              val hex = s.substring(i + 1, i + 5)
              try { sb.append(Integer.parseInt(hex, 16).toChar); i += 4 }
              catch { case _: NumberFormatException => return err("bad unicode escape") }
            case other => return err(s"bad escape \\$other")
          }
        } else sb.append(c)
        i += 1
      }
      if (i >= s.length) err("unterminated string") else { i += 1; Right(sb.result()) }
    }
    def value(): Either[String, JVal] = {
      ws()
      if (i >= s.length) return err("unexpected end")
      s.charAt(i) match {
        case '{' =>
          i += 1
          val fields = Seq.newBuilder[(String, JVal)]
          ws()
          if (expect('}')) return Right(JObj(fields.result()))
          while (true) {
            str() match {
              case Left(e) => return Left(e)
              case Right(k) =>
                if (!expect(':')) return err("expected ':'")
                value() match {
                  case Left(e) => return Left(e)
                  case Right(v) => fields += (k -> v)
                }
            }
            ws()
            if (expect('}')) return Right(JObj(fields.result()))
            if (!expect(',')) return err("expected ',' or '}'")
          }
          err("unreachable")
        case '[' =>
          i += 1
          val items = Seq.newBuilder[JVal]
          ws()
          if (expect(']')) return Right(JArr(items.result()))
          while (true) {
            value() match {
              case Left(e) => return Left(e)
              case Right(v) => items += v
            }
            ws()
            if (expect(']')) return Right(JArr(items.result()))
            if (!expect(',')) return err("expected ',' or ']'")
          }
          err("unreachable")
        case '"' => str().map(JStr)
        case 't' if s.startsWith("true", i) => i += 4; Right(JBool(true))
        case 'f' if s.startsWith("false", i) => i += 5; Right(JBool(false))
        case 'n' if s.startsWith("null", i) => i += 4; Right(JNull)
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
          if (i == start) err(s"unexpected '${s.charAt(i)}'")
          else s.substring(start, i).toDoubleOption
            .map(d => Right(JNum(d))).getOrElse(err("bad number"))
      }
    }
    val out = value()
    out.flatMap { v => ws(); if (i == s.length) Right(v) else err("trailing content") }
  }

  def render(j: JVal): String = j match {
    case JStr(s) => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case JNum(n) => if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString
    case JBool(b) => b.toString
    case JNull => "null"
    case JArr(xs) => xs.map(render).mkString("[", ",", "]")
    case JObj(fs) => fs.map { case (k, v) => render(JStr(k)) + ":" + render(v) }
      .mkString("{", ",", "}")
  }
}

case class ManifestItem(sourceUrl: String, fields: Seq[(String, JVal)])

case class ManifestEnvelope(
    schemaVersion: String, datasetId: String, title: String,
    sourceDatasetUrl: String, generatedAt: String, generationStatus: String,
    warnings: Seq[String], bucketPrefix: String,
    items: Seq[ManifestItem], meta: JObj)

object Manifest {
  val SchemaVersion = "2.0"
  val StrictMetaKeys = Seq("source_agency", "notes", "metadata_file", "release", "custom_tags")

  /** Strict-meta normalization: known keys stay top-level, everything
    * else collapses into custom_tags (build_manifest.py:35-74). */
  def normalizeMeta(meta: Seq[(String, JVal)]): JObj = {
    val (known, custom) = meta.partition { case (k, _) => StrictMetaKeys.contains(k) }
    val existingTags = known.collectFirst { case ("custom_tags", JObj(t)) => t }
      .getOrElse(Nil)
    JObj(known.filterNot(_._1 == "custom_tags") :+
      ("custom_tags" -> JObj(existingTags ++ custom)))
  }

  /** Item normalization: public_url/url promote to source_url; missing
    * source_url is an error; storage-internal keys dropped
    * (build_manifest.py:77-91). */
  def normalizeItem(fields: Seq[(String, JVal)]): ManifestItem = {
    val m = fields.toMap
    val sourceUrl = m.get("source_url").orElse(m.get("public_url")).orElse(m.get("url"))
    sourceUrl match {
      case Some(JStr(u)) if u.nonEmpty =>
        ManifestItem(u, fields.filterNot { case (k, _) =>
          k == "public_url" || k == "storage_path" || k == "source_url" || k == "url"
        })
      case _ => throw new IllegalArgumentException("manifest item missing required source_url")
    }
  }

  /** Status derivation: any partial/failed/skipped item downgrades a
    * success build to success_partial_fallback (build_manifest.py:94-100). */
  def statusFromItems(itemStatuses: Seq[String], fallback: String): String =
    if (fallback != "success") fallback
    else if (itemStatuses.exists(Set("partial", "failed", "skipped"))) "success_partial_fallback"
    else "success"

  def build(datasetId: String, title: String, sourceDatasetUrl: String,
            bucketPrefix: String, items: Seq[ManifestItem],
            itemStatuses: Seq[String], meta: Seq[(String, JVal)],
            generatedAt: String, generationStatus: String = "success",
            warnings: Seq[String] = Nil): ManifestEnvelope =
    ManifestEnvelope(SchemaVersion, datasetId, title, sourceDatasetUrl,
      generatedAt, statusFromItems(itemStatuses, generationStatus),
      warnings, bucketPrefix, items, normalizeMeta(meta))

  def itemFromProfile(p: ResourceProfile, sourceUrl: String): ManifestItem = {
    val base = Seq(
      "size_bytes" -> JNum(p.sizeBytes.toDouble),
      "sha256" -> JStr(p.sha256),
      "format" -> JStr(p.format),
      "profile_status" -> JStr(p.profileStatus),
      "profile_warnings" -> JArr(p.profileWarnings.map(w =>
        JObj(Seq("code" -> JStr(w.code), "message" -> JStr(w.message))))),
      "columns" -> JArr(p.columns.map(JStr)))
    val opt = Seq(
      p.rowCount.map(r => "row_count" -> JNum(r.toDouble)),
      p.columnCount.map(c => "column_count" -> JNum(c.toDouble)),
      p.archiveProfile.map(a => "archive_profile" -> JObj(Seq(
        "member_count" -> JNum(a.memberCount.toDouble),
        "members" -> JArr(a.members.map(JStr)),
        "uncompressed_size_bytes" -> JNum(a.uncompressedSizeBytes.toDouble),
        "tabular_members" -> JArr(a.tabularMembers.map(JStr)))))).flatten
    ManifestItem(sourceUrl, base ++ opt)
  }

  def toJson(e: ManifestEnvelope): String = JVal.render(JObj(Seq(
    "schema_version" -> JStr(e.schemaVersion),
    "dataset_id" -> JStr(e.datasetId),
    "title" -> JStr(e.title),
    "source_dataset_url" -> JStr(e.sourceDatasetUrl),
    "generated_at" -> JStr(e.generatedAt),
    "generation_status" -> JStr(e.generationStatus),
    "warnings" -> JArr(e.warnings.map(JStr)),
    "bucket_prefix" -> JStr(e.bucketPrefix),
    "items" -> JArr(e.items.map(i =>
      JObj(("source_url" -> JStr(i.sourceUrl)) +: i.fields))),
    "meta" -> e.meta)))

  /** Incremental merge (J7, cli.py:324-362): retain existing items whose
    * source_url is absent from the current run, then append current. */
  def incrementalMerge(existing: Seq[ManifestItem],
                       current: Seq[ManifestItem]): Seq[ManifestItem] = {
    val currentUrls = current.map(_.sourceUrl).toSet
    existing.filterNot(i => currentUrls.contains(i.sourceUrl)) ++ current
  }
}
