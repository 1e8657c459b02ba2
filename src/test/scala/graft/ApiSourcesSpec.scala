package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.profile._

class ApiSourcesSpec extends AnyFunSuite {

  private def parseObj(s: String): JObj =
    JVal.parse(s).toOption.collect { case o: JObj => o }.get

  test("JVal.parse round-trips render, handles escapes/nesting/errors") {
    val j = JObj(Seq(
      "a" -> JStr("x \"quoted\" \n tab\t"),
      "n" -> JNum(12.5), "i" -> JNum(3), "b" -> JBool(true), "z" -> JNull,
      "arr" -> JArr(Seq(JNum(1), JObj(Seq("k" -> JStr("v")))))))
    assert(JVal.parse(JVal.render(j)) == Right(j))
    assert(JVal.parse("""{"u":"é"}""") == Right(JObj(Seq("u" -> JStr("é")))))
    assert(JVal.parse("""{"a":1,}""").isLeft)
    assert(JVal.parse("""[1,2""").isLeft)
    assert(JVal.parse("""{"a":1} junk""").isLeft)
  }

  private val pkg = parseObj("""{
    "private": false, "state": "active", "isopen": true, "license_id": "odc-odbl",
    "metadata_modified": "2026-02-03T10:00:00",
    "resources": [
      {"url": "https://dados.cvm.gov.br/data/inf_diario_202601.zip",
       "name": "Janeiro 2026", "format": "ZIP", "state": "active"},
      {"url": "https://dados.cvm.gov.br/data/inf_diario_202512.zip",
       "name": "Dezembro 2025", "format": "ZIP"},
      {"url": "https://evil.example.com/x.zip", "name": "mirror", "format": "ZIP"},
      {"url": "https://dados.cvm.gov.br/data/meta_inf_diario.txt",
       "name": "Meta", "description": "dicionario de dados", "format": "TXT"},
      {"url": "https://dados.cvm.gov.br/del.zip", "state": "deleted", "name": "old"},
      "not a dict"
    ]}""")

  test("package validation: public+active+open, license allow-list") {
    assert(Ckan.validatePackage(pkg).isRight)
    assert(Ckan.validatePackage(pkg, Seq("odc-odbl")).isRight)
    assert(Ckan.validatePackage(pkg, Seq("cc-by")).isLeft)
    val closed = parseObj("""{"private": true, "isopen": true}""")
    assert(Ckan.validatePackage(closed).isLeft)
  }

  test("resource selection: host policy, state, period-desc, latest-N") {
    val hosts = Seq("dados.cvm.gov.br")
    val sel = Ckan.selectResources(pkg, hosts, limit = 2)
    assert(sel.map(Ckan.filenameOf) ==
      Seq("meta_inf_diario.txt", "inf_diario_202601.zip"))
    // periods: meta has none -> "current" sorts above years desc; the
    // dated resources order 2026-01 > 2025-12; deleted/evil dropped
    assert(Ckan.periodOf(sel(1)) == "2026-01")
    val exclude = Ckan.selectResources(pkg, hosts, 5, exclude = Seq("dicionario"))
    assert(!exclude.map(Ckan.filenameOf).contains("meta_inf_diario.txt"))
    val include = Ckan.selectResources(pkg, hosts, 5, include = Seq("inf_diario_\\d{6}"))
    assert(include.map(Ckan.filenameOf).toSet ==
      Set("inf_diario_202601.zip", "inf_diario_202512.zip"))
  }

  test("filename fallback: safe name + format suffix") {
    val r = parseObj("""{"url": "https://h/download/view", "name": "Série Temporal!", "format": "csv"}""")
    assert(Ckan.filenameOf(r) == "S_rie_Temporal.csv")
  }

  test("faostat: FileLocation by DatasetCode, namespace-agnostic") {
    val xml = """<?xml version="1.0"?>
      <Datasets xmlns="http://www.fao.org/faostat">
        <Dataset><DatasetCode>QCL</DatasetCode>
          <FileLocation>https://fenix.fao.org/QCL.zip</FileLocation></Dataset>
        <Dataset><DatasetCode>RL</DatasetCode>
          <FileLocation>https://fenix.fao.org/RL.zip</FileLocation></Dataset>
      </Datasets>"""
    assert(Faostat.fileLocation(xml, "rl").contains("https://fenix.fao.org/RL.zip"))
    assert(Faostat.fileLocation(xml, "NOPE").isEmpty)
    assert(Faostat.fileLocation("<not-xml", "QCL").isEmpty)
  }
}
