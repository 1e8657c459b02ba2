package graft.profile

/** Profile cache rebuilt from a published manifest (SURVEY.md §4 "Profile
  * cache from published manifest"; reference: profiling.py:84-130 —
  * sentinel rejection `_is_url_only_sentinel` :84-99, cache build
  * :102-130). Skips re-profiling URLs whose manifest item carries a real
  * profile; URL-only sentinel entries (external/zero-size/skipped
  * placeholders) are treated as cache misses so they never freeze the
  * cache to placeholder data. */
object ProfileCache {

  val CacheFields: Set[String] = Set(
    "size_bytes", "sha256", "row_count", "column_count", "columns",
    "content_type", "format", "last_modified", "profiled_at",
    "profile_status", "profile_warnings", "archive_profile")

  /** Legacy URL-only contract sentinels are not real profiles. */
  def isUrlOnlySentinel(fields: Map[String, JVal]): Boolean = {
    val sha = fields.get("sha256").collect { case JStr(s) => s.trim.toLowerCase }
    if (sha.contains("external")) return true
    val sizeZero = fields.get("size_bytes").collect { case JNum(n) => n == 0 }.getOrElse(false)
    if (sizeZero && !fields.get("sha256").exists(_.isInstanceOf[JStr])) return true
    val skipped = fields.get("profile_status").collect { case JStr(s) => s == "skipped" }.getOrElse(false)
    if (skipped && !fields.contains("profiled_at")) return true
    false
  }

  /** source_url → cached profile fields, sentinels rejected. */
  def fromManifest(items: Seq[ManifestItem]): Map[String, Map[String, JVal]] =
    items.flatMap { item =>
      if (item.sourceUrl.trim.isEmpty) None
      else {
        val profile = item.fields.filter { case (k, v) =>
          CacheFields.contains(k) && v != JNull
        }.toMap
        if (profile.isEmpty || isUrlOnlySentinel(profile)) None
        else Some(item.sourceUrl -> profile)
      }
    }.toMap
}
