package graft.reports

import graft.profile._

/** Report-document assembly helpers (SURVEY.md §2.8 JSON family;
  * reference: deep-merge editorial overrides
  * bdqueimadas_overview.py:1226-1239, localized-text coercion
  * :1314-1331 / reports/definitions/base.py:17-52, word-boundary
  * truncation catalog/build.py:152-157). Driver-side case-class logic
  * over the JVal tree — no Spark involvement by design. */
object Editorial {

  /** Deep merge: override wins on scalars/arrays, objects merge
    * recursively, JNull override deletes the key. */
  def deepMerge(base: JVal, over: JVal): JVal = (base, over) match {
    case (JObj(b), JObj(o)) =>
      val bm = b.toMap
      val overKeys = o.map(_._1).toSet
      val merged = b.filterNot { case (k, _) => overKeys.contains(k) } ++
        o.flatMap {
          case (_, JNull) => None
          case (k, v) => Some(k -> (bm.get(k) match {
            case Some(bv) => deepMerge(bv, v)
            case None => v
          }))
        }
      JObj(merged)
    case (_, o) => o
  }

  /** Localized text: accept a plain string (both locales) or a
    * {pt, en} object; missing locale falls back to the other. */
  def localized(v: JVal, locale: String): Option[String] = v match {
    case JStr(s) => Some(s)
    case JObj(fields) =>
      val m = fields.toMap
      def str(k: String) = m.get(k).collect { case JStr(s) if s.nonEmpty => s }
      val other = if (locale == "pt") "en" else "pt"
      str(locale).orElse(str(other))
    case _ => None
  }

  /** Truncate at a word boundary with ellipsis
    * (catalog/build.py:152-157). */
  def truncateAtWord(s: String, maxLen: Int): String =
    if (s.length <= maxLen) s
    else {
      val cut = s.take(maxLen + 1)
      val at = cut.lastIndexOf(' ')
      (if (at > 0) cut.take(at) else s.take(maxLen)).stripSuffix(" ") + "…"
    }

  /** Whitespace collapse (catalog/build.py:145-149). */
  def collapseWhitespace(s: String): String =
    s.trim.replaceAll("\\s+", " ")
}
