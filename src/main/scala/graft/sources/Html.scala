package graft.sources

/** Minimal HTML extraction for the discovery scrapers' work-list
  * production (SURVEY.md §2.1 S9 — the reference scrapes listing pages
  * for (url, period) rows: datasets/inpe/bdqueimadas_focos.py:38-53,
  * datasets/noticias_agricolas/list_parser.py). Deliberately NOT a
  * general HTML parser: link/heading/meta extraction with entity
  * decoding is all the work-list algebra needs, and the output feeds
  * straight into `Discovery` (policy filters, latest-N selection).
  * Driver-side by design — runs once per listing page, never per row.
  */
object Html {

  private val Entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "#39" -> "'", "nbsp" -> " ")

  def decodeEntities(s: String): String =
    "&(#?\\w+);".r.replaceAllIn(s, m => {
      val k = m.group(1)
      scala.util.matching.Regex.quoteReplacement(
        Entities.getOrElse(k,
          if (k.startsWith("#")) k.drop(1).toIntOption
            .filter(c => c >= 32 && c <= 0x10FFFF).map(Character.toChars(_).mkString)
            .getOrElse(m.matched)
          else m.matched))
    })

  /** Tags → space, entities decoded, whitespace collapsed — the
    * get_text(" ", strip=True) analog. */
  def stripTags(s: String): String =
    decodeEntities(s.replaceAll("(?s)<script.*?</script>", " ")
        .replaceAll("(?s)<style.*?</style>", " ")
        .replaceAll("(?s)<[^>]*>", " "))
      .replaceAll("\\s+", " ").trim

  /** All (href, inner text) anchor pairs, document order. */
  def anchors(html: String): Seq[(String, String)] =
    "(?is)<a\\s[^>]*?href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a>".r
      .findAllMatchIn(html)
      .map(m => (decodeEntities(m.group(1)).trim, stripTags(m.group(2))))
      .toSeq

  /** All (value, label) of `<option>` elements — the EIA dropdown-combo
    * discovery shape (datasets/eia/heating_oil_propane.py:53-85). */
  def options(html: String): Seq[(String, String)] =
    "(?is)<option\\s[^>]*?value\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</option>".r
      .findAllMatchIn(html)
      .map(m => (decodeEntities(m.group(1)).trim, stripTags(m.group(2))))
      .toSeq

  /** content= of a meta tag matching attr="value" (og:image etc.). */
  def metaContent(html: String, attr: String, value: String): Option[String] = {
    val re = ("(?is)<meta\\s[^>]*" + java.util.regex.Pattern.quote(attr) +
      "\\s*=\\s*[\"']" + java.util.regex.Pattern.quote(value) +
      "[\"'][^>]*>").r
    re.findFirstIn(html).flatMap { tag =>
      "(?i)content\\s*=\\s*[\"']([^\"']*)[\"']".r.findFirstMatchIn(tag)
        .map(m => decodeEntities(m.group(1)).trim)
    }
  }

  /** Resolve a possibly-relative href against the page URL. */
  def resolve(baseUrl: String, href: String): String =
    try new java.net.URI(baseUrl).resolve(href).toString
    catch { case _: Exception => href }
}

/** The news category-listing scrape (reference
  * datasets/noticias_agricolas/list_parser.py; fixture
  * tests/fixtures/noticias_agricolas/category_list.html): date-group
  * headings (`<h3>dd/mm/yyyy</h3>`) scope the article anchors that
  * follow; each anchor carries an `hh:mm` time span and a title. */
object NewsListing {

  case class Item(url: String, date: String, time: String, title: String)

  private val DateRe = "(\\d{2}/\\d{2}/\\d{4})".r
  private val TimeRe = "\\b(\\d{1,2}:\\d{2})\\b".r

  def parse(html: String, baseUrl: String): Seq[Item] = {
    // walk h3 headings and anchors in document order; the current h3
    // date scopes every anchor until the next heading
    val tokens = "(?is)<h3[^>]*>(.*?)</h3>|<a\\s[^>]*?href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a>".r
      .findAllMatchIn(html).toSeq
    var date = ""
    val out = Seq.newBuilder[Item]
    tokens.foreach { m =>
      if (m.group(1) != null)
        DateRe.findFirstIn(Html.stripTags(m.group(1))).foreach(date = _)
      else {
        val text = Html.stripTags(m.group(3))
        val time = TimeRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
        val title = TimeRe.replaceFirstIn(text, "").replaceAll("\\s+", " ").trim
        if (date.nonEmpty && title.nonEmpty)
          out += Item(Html.resolve(baseUrl, Html.decodeEntities(m.group(2)).trim),
            date, time, title)
      }
    }
    out.result()
  }
}
