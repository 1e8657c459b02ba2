package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.profile._
import graft.reports.Editorial

class EditorialSpec extends AnyFunSuite {
  test("deepMerge: recursive objects, override scalars, null deletes") {
    val base = JObj(Seq(
      "title" -> JStr("orig"),
      "meta" -> JObj(Seq("a" -> JNum(1), "b" -> JNum(2))),
      "gone" -> JStr("x")))
    val over = JObj(Seq(
      "title" -> JStr("edited"),
      "meta" -> JObj(Seq("b" -> JNum(9), "c" -> JNum(3))),
      "gone" -> JNull))
    val out = Editorial.deepMerge(base, over).asInstanceOf[JObj].v.toMap
    assert(out("title") == JStr("edited"))
    assert(!out.contains("gone"))
    val meta = out("meta").asInstanceOf[JObj].v.toMap
    assert(meta == Map("a" -> JNum(1), "b" -> JNum(9), "c" -> JNum(3)))
  }

  test("localized: plain string, locale pick, fallback") {
    assert(Editorial.localized(JStr("x"), "pt").contains("x"))
    val bi = JObj(Seq("pt" -> JStr("fogo"), "en" -> JStr("fire")))
    assert(Editorial.localized(bi, "en").contains("fire"))
    assert(Editorial.localized(JObj(Seq("pt" -> JStr("só pt"))), "en").contains("só pt"))
    assert(Editorial.localized(JNum(1), "pt").isEmpty)
  }

  test("truncateAtWord and collapseWhitespace") {
    assert(Editorial.truncateAtWord("alpha beta gamma", 10) == "alpha beta…")
    assert(Editorial.truncateAtWord("short", 10) == "short")
    assert(Editorial.collapseWhitespace("  a \n b\t c ") == "a b c")
  }
}
