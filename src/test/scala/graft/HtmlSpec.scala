package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Html, NewsListing}

class HtmlSpec extends AnyFunSuite {

  test("anchors + entity decoding + tag stripping") {
    val html = """<p>Pre <a href="/x?a=1&amp;b=2">Hello <b>World</b></a>
      <a href='http://h/y'>Two&nbsp;words &#233;</a></p>"""
    val as = Html.anchors(html)
    assert(as == Seq(("/x?a=1&b=2", "Hello World"), ("http://h/y", "Two words é")))
    assert(Html.stripTags("<div>a<script>junk()</script> b</div>") == "a b")
  }

  test("options extracts dropdown combos") {
    val html = """<select name="s"><option value="W_EPD2F">Heating Oil</option>
      <option value="W_EPLLPA" selected>Propane &amp; Propylene</option></select>"""
    assert(Html.options(html) ==
      Seq(("W_EPD2F", "Heating Oil"), ("W_EPLLPA", "Propane & Propylene")))
  }

  test("metaContent extracts og-style properties") {
    val html = """<head><meta property="og:image" content="https://h/i.png"/>
      <meta name="twitter:image" content="https://h/t.png"></head>"""
    assert(Html.metaContent(html, "property", "og:image").contains("https://h/i.png"))
    assert(Html.metaContent(html, "name", "twitter:image").contains("https://h/t.png"))
    assert(Html.metaContent(html, "property", "og:title").isEmpty)
  }

  test("news listing parse against the reference's own fixture") {
    // read in place from the read-only reference tree (data, not code)
    val fixture = Paths.get(
      "/root/reference/tests/fixtures/noticias_agricolas/category_list.html")
    assume(Files.exists(fixture), "reference fixture not present")
    val html = Files.readString(fixture)
    val items = NewsListing.parse(html, "https://www.noticiasagricolas.com.br/")
    assert(items.nonEmpty)
    val first = items.head
    assert(first.url ==
      "https://www.noticiasagricolas.com.br/noticias/clima/417968-calor-ganha-forca.html")
    assert(first.date == "27/03/2026" && first.time == "07:38")
    assert(first.title == "Calor ganha força no centro-sul")
    // date-group scoping: later items carry the later heading's date
    assert(items.exists(i => i.date == "26/03/2026" && i.time == "17:12"))
    // every parsed item has an absolute url and a non-empty title
    assert(items.forall(i => i.url.startsWith("https://") && i.title.nonEmpty))
  }

  test("article parse against the reference's full fixture") {
    val fixture = Paths.get(
      "/root/reference/tests/fixtures/noticias_agricolas/article_full.html")
    assume(Files.exists(fixture), "reference fixture not present")
    val art = graft.sources.ArticleParser.parse(Files.readString(fixture),
      url = "https://www.noticiasagricolas.com.br/noticias/clima/x.html",
      baseUrl = "https://www.noticiasagricolas.com.br",
      listingDate = "27/03/2026", listingTime = "07:38")
    assert(art.title == "Título da matéria")
    assert(art.lead.exists(_.contains("Lead do texto")))
    assert(art.contentText.contains("Primeiro parágrafo"))
    assert(art.contentText.contains("Subtítulo"))
    assert(art.tags == Seq("Clima", "Agro"))
    assert(art.imageUrl.contains("https://cdn.example.com/img/main.jpg"))
    // São Paulo 07:38 is UTC 10:38 on that date (the reference's own
    // expected value, tests/test_noticias_agricolas_parsers.py)
    assert(art.publishedAtIso == "2026-03-27T10:38:00Z")
  }

  test("article parse against the minimal fixture: no image/tags/lead") {
    val fixture = Paths.get(
      "/root/reference/tests/fixtures/noticias_agricolas/article_minimal.html")
    assume(Files.exists(fixture), "reference fixture not present")
    val art = graft.sources.ArticleParser.parse(Files.readString(fixture),
      url = "https://www.noticiasagricolas.com.br/x/12345-slug.html",
      baseUrl = "https://www.noticiasagricolas.com.br",
      listingDate = "15/01/2025", listingTime = "09:00")
    assert(art.imageUrl.isEmpty && art.tags.isEmpty && art.lead.isEmpty)
    assert(graft.sources.ArticleParser.firstUsefulParagraph(art.contentText)
      .exists(_.contains("Único parágrafo")))
    assert(graft.sources.ArticleParser.extractSourceArticleId(
      "https://www.noticiasagricolas.com.br/x/12345-slug.html").contains("12345"))
    assert(art.publishedAtIso == "2025-01-15T12:00:00Z") // SP 09:00 → UTC 12:00
  }

  test("body filtering drops CTA lines and excluded div families") {
    val html = """<div class="materia"><p>Um parágrafo útil do corpo.</p>
      <div class="box-comentarios"><p>comentário de leitor</p></div>
      <p>Receba as notícias no WhatsApp</p><p>Fim do corpo.</p></div>"""
    val body = graft.sources.ArticleParser.parse(html, "u", "https://b", "01/01/2026", "10:00")
      .contentText
    assert(body == "Um parágrafo útil do corpo.\n\nFim do corpo.")
  }

  test("listing rows feed the discovery work-list algebra") {
    val items = Seq(
      NewsListing.Item("https://h/a-20260110.html", "10/01/2026", "08:00", "A"),
      NewsListing.Item("https://h/b-20260112.html", "12/01/2026", "09:00", "B"),
      NewsListing.Item("https://h/c-20260111.html", "11/01/2026", "10:00", "C"))
    // latest-first by (date-as-sortable, time) — the O5/O6 selection shape
    val latest = items.sortBy(i =>
      (i.date.split("/").reverse.mkString, i.time)).reverse.head
    assert(latest.title == "B")
  }
}
