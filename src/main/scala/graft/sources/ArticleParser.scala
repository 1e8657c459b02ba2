package graft.sources

import java.time.{LocalDateTime, ZoneId}
import java.time.format.DateTimeFormatter

/** News article extraction (reference
  * datasets/noticias_agricolas/article_parser.py:20-110, text cleanup
  * text_cleanup.py:16-43, published-line parse dates.py:11-27):
  * class-scoped blocks (page-title / datas / lead / materia / tags),
  * CTA-line body filtering, og:image fallback chain, and the São Paulo
  * "Publicado em dd/mm/yyyy HH:MM" label normalized to UTC Z. Validated
  * against the reference repo's own article fixtures. Driver-side by
  * design — one parse per fetched article. */
object ArticleParser {

  case class ArticleDetail(
      title: String, lead: Option[String], contentText: String,
      tags: Seq[String], imageUrl: Option[String], publishedAtIso: String)

  private val SaoPaulo = ZoneId.of("America/Sao_Paulo")

  /** Numeric article id from the URL path (`/(\d{4,})-`). */
  def extractSourceArticleId(url: String): Option[String] =
    "/(\\d{4,})-".r.findFirstMatchIn(url).map(_.group(1))

  /** Inner HTML of the first `<div>` whose class attribute contains
    * `className`, via depth tracking over nested divs. */
  private[sources] def classDiv(html: String, className: String): Option[String] = {
    val open = ("(?is)<div\\s[^>]*class\\s*=\\s*[\"'][^\"']*\\b" +
      java.util.regex.Pattern.quote(className) + "\\b[^\"']*[\"'][^>]*>").r
    open.findFirstMatchIn(html).map { m =>
      val rest = html.substring(m.end)
      val tag = "(?is)<(/?)div\\b[^>]*>".r
      var depth = 1
      var end = rest.length
      val it = tag.findAllMatchIn(rest)
      while (depth > 0 && it.hasNext) {
        val t = it.next()
        if (t.group(1).isEmpty) depth += 1 else depth -= 1
        if (depth == 0) end = t.start
      }
      rest.substring(0, end)
    }
  }

  /** Remove nested divs whose class matches the excluded families
    * (comentarios/newsletter — article_parser.py:63-66). */
  private def dropExcludedDivs(html: String): String = {
    var out = html
    var changed = true
    while (changed) {
      changed = false
      val open = "(?is)<div\\s[^>]*class\\s*=\\s*[\"'][^\"']*(comentarios|newsletter)[^\"']*[\"'][^>]*>".r
      open.findFirstMatchIn(out).foreach { m =>
        val rest = out.substring(m.end)
        val tag = "(?is)<(/?)div\\b[^>]*>".r
        var depth = 1
        var end = rest.length
        val it = tag.findAllMatchIn(rest)
        while (depth > 0 && it.hasNext) {
          val t = it.next()
          if (t.group(1).isEmpty) depth += 1 else depth -= 1
          if (depth == 0) end = t.end
        }
        out = out.substring(0, m.start) + rest.substring(end)
        changed = true
      }
    }
    out
  }

  private val CtaLine =
    "(?i)^(receba|cadastre|whatsapp|newsletter|clique aqui para receber|siga nosso canal|termo de privacidade)\\b".r

  private def normalizeParagraph(s: String): String =
    s.replace('\u00a0', ' ').trim.replaceAll("[ \\t\\r\\f\\x0B]+", " ")

  /** Body paragraphs: `<p>/<h2>/<h3>` texts in order, CTA lines dropped,
    * joined with blank lines (text_cleanup.py:22-34). */
  private[sources] def bodyText(materiaHtml: String): String = {
    val blocks = "(?is)<(p|h2|h3)\\b[^>]*>(.*?)</\\1>".r
      .findAllMatchIn(dropExcludedDivs(materiaHtml))
      .map(m => normalizeParagraph(Html.stripTags(m.group(2))))
      .filter(t => t.nonEmpty && CtaLine.findFirstIn(t).isEmpty)
    blocks.mkString("\n\n").trim
  }

  /** "Publicado em dd/mm/yyyy HH:MM" (São Paulo) → UTC Z ISO
    * (dates.py:11-27, :51-56). */
  def parsePublishedLine(label: String): Option[String] =
    "(\\d{2}/\\d{2}/\\d{4})\\s+(\\d{1,2}:\\d{2})".r.findFirstMatchIn(label).flatMap { m =>
      try {
        val dt = LocalDateTime.parse(s"${m.group(1)} ${m.group(2)}",
          DateTimeFormatter.ofPattern("dd/MM/yyyy H:mm"))
        Some(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
          .withZone(ZoneId.of("UTC")).format(dt.atZone(SaoPaulo).toInstant))
      } catch { case _: Exception => None }
    }

  /** First body block that looks like real prose
    * (text_cleanup.py:37-43). */
  def firstUsefulParagraph(contentText: String): Option[String] =
    contentText.split("\n\n").iterator.map(normalizeParagraph).collectFirst {
      case t if t.length >= 40 => t
      case t if t.length >= 15 && CtaLine.findFirstIn(t).isEmpty => t
    }

  def parse(html: String, url: String, baseUrl: String,
            listingDate: String, listingTime: String): ArticleDetail = {
    val title = "(?is)<h1\\s[^>]*class\\s*=\\s*[\"'][^\"']*page-title[^\"']*[\"'][^>]*>(.*?)</h1>".r
      .findFirstMatchIn(html).map(m => Html.stripTags(m.group(1))).getOrElse("")
    val datas = classDiv(html, "datas").map(Html.stripTags).getOrElse("")
    val lead = classDiv(html, "lead").map(Html.stripTags).filter(_.nonEmpty)
    val materia = classDiv(html, "materia")
    val content = materia.map(bodyText).getOrElse("")
    val tags = classDiv(html, "tags").toSeq.flatMap { t =>
      "(?is)<ul\\b[^>]*>(.*?)</ul>".r.findFirstMatchIn(t).toSeq
        .flatMap(m => Html.anchors(m.group(1)).map(_._2).filter(_.nonEmpty))
    }
    val image = Html.metaContent(html, "property", "og:image").filter(_.startsWith("http"))
      .orElse(Html.metaContent(html, "name", "twitter:image").filter(_.startsWith("http")))
      .orElse(materia.flatMap { mhtml =>
        "(?is)<img\\s[^>]*?src\\s*=\\s*[\"']([^\"']+)[\"']".r.findAllMatchIn(mhtml)
          .map(_.group(1).trim)
          .find(s => s.nonEmpty && !s.contains("doubleclick") && !s.contains("googlesyndication"))
          .map(Html.resolve(baseUrl, _))
      })
    val published = parsePublishedLine(datas)
      .orElse(parsePublishedLine(s"$listingDate $listingTime"))
      .getOrElse("")
    ArticleDetail(title, lead, content, tags, image, published)
  }
}
