package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.profile._

class ProfileSpec extends AnyFunSuite {
  private val dir = Files.createTempDirectory("prof").toFile

  private def write(name: String, content: Array[Byte]): String = {
    val f = new File(dir, name)
    val o = new FileOutputStream(f); o.write(content); o.close()
    f.getAbsolutePath
  }

  test("tabular profile: rows, columns, sha256") {
    val p = Profiler.profilePath(write("t.csv", "a;b;c\n1;2;3\n4;5;6\n".getBytes))
    assert(p.rowCount.contains(2L))
    assert(p.columns == Seq("a", "b", "c"))
    assert(p.sha256.length == 64 && p.profileStatus == "ok")
  }

  test("zip profile: member enumeration + summed rows + bound") {
    val f = new File(dir, "a.zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    for (i <- 1 to 10) {
      z.putNextEntry(new ZipEntry(f"m$i%02d.csv"))
      z.write(s"x,y\n1,2\n3,4\n".getBytes); z.closeEntry()
    }
    z.putNextEntry(new ZipEntry("readme.md")); z.write("hi".getBytes); z.closeEntry()
    z.close()
    val p = Profiler.profilePath(f.getAbsolutePath)
    assert(p.archiveProfile.get.memberCount == 11)
    assert(p.archiveProfile.get.tabularMembers.length == 10)
    assert(p.rowCount.contains(16L))       // 8 members × 2 rows (bound)
    assert(p.profileStatus == "partial")   // truncated at 8
    assert(p.profileWarnings.head.code == "archive_members_truncated")
  }

  test("json probe: array count and object keys") {
    val arr = Profiler.profilePath(write("a.json", """[{"a":1},{"a":2},{"a":3}]""".getBytes))
    assert(arr.rowCount.contains(3L))
    val obj = Profiler.profilePath(write("o.json", """{"x":1,"y":{"z":2}}""".getBytes))
    assert(obj.columns.toSet == Set("x", "y", "z"))
    assert(Profiler.profilePath(write("m.xyz", "?".getBytes)).profileStatus == "skipped")
  }

  test("xml probe: root tag") {
    val p = Profiler.profilePath(write("d.xml",
      "<?xml version=\"1.0\"?>\n<!-- c --><Dataset><Row/></Dataset>".getBytes))
    assert(p.columns == Seq("Dataset") && p.profileStatus == "ok")
  }

  test("xlsx probe: sheet-1 header columns + data row count (S4)") {
    // minimal-but-real xlsx: ZIP with content types, workbook, shared
    // strings (incl. a rich-text run), and a sheet with 3 data rows
    val f = new File(dir, "wb.xlsx")
    val z = new ZipOutputStream(new FileOutputStream(f))
    def member(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    member("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    member("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Plan1" sheetId="1"/></sheets></workbook>""")
    member("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst count="3" uniqueCount="3">""" +
        """<si><t>ano</t></si><si><r><t>es</t></r><r><t>tado</t></r></si><si><t>valor</t></si></sst>""")
    member("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>obs</t></is></c></row>""" +
        """<row r="2"><c r="A2"><v>2024</v></c><c r="B2" t="s"><v>2</v></c><c r="C2"><v>1.5</v></c></row>""" +
        """<row r="3"><c r="A3"><v>2025</v></c><c r="B3" t="s"><v>2</v></c><c r="C3"><v>2.5</v></c></row>""" +
        """<row r="4"><c r="A4"><v>2026</v></c><c r="B4" t="s"><v>2</v></c><c r="C4"><v>3.5</v></c></row>""" +
        """</sheetData></worksheet>""")
    z.close()
    val p = Profiler.profilePath(f.getAbsolutePath)
    assert(p.profileStatus == "ok", p.profileWarnings.toString)
    assert(p.rowCount.contains(3L))
    assert(p.columns == Seq("ano", "estado", "obs"))
    assert(p.columnCount.contains(3))

    // legacy .xls and corrupt .xlsx report partial, mirroring the
    // reference's Excel catch-all
    assert(Profiler.profilePath(write("old.xls", "junk".getBytes)).profileStatus == "partial")
    val broken = Profiler.profilePath(write("bad.xlsx", "not a zip".getBytes))
    assert(broken.profileStatus == "partial")
    assert(broken.profileWarnings.head.message.startsWith("Excel profile failed"))
  }

  test("manifest: strict meta, item normalization, status derivation") {
    val meta = Manifest.normalizeMeta(Seq(
      "source_agency" -> JStr("INPE"), "spice" -> JStr("extra"),
      "custom_tags" -> JObj(Seq("k" -> JStr("v")))))
    assert(meta.v.toMap.keySet == Set("source_agency", "custom_tags"))
    assert(meta.v.toMap.apply("custom_tags").asInstanceOf[JObj].v.toMap.keySet == Set("k", "spice"))

    val item = Manifest.normalizeItem(Seq(
      "public_url" -> JStr("https://x/y.csv"), "storage_path" -> JStr("internal")))
    assert(item.sourceUrl == "https://x/y.csv")
    assert(!item.fields.exists(_._1 == "storage_path"))
    intercept[IllegalArgumentException] { Manifest.normalizeItem(Seq("a" -> JStr("b"))) }

    assert(Manifest.statusFromItems(Seq("ok", "partial"), "success") == "success_partial_fallback")
    assert(Manifest.statusFromItems(Seq("ok"), "success") == "success")
    assert(Manifest.statusFromItems(Seq("ok"), "failed") == "failed")
  }

  test("manifest json round shape + incremental merge") {
    val p = Profiler.profilePath(write("t2.csv", "a,b\n1,2\n".getBytes))
    val item = Manifest.itemFromProfile(p, "https://host/t2.csv")
    val env = Manifest.build("ds1", "T", "https://host", "prefix",
      Seq(item), Seq(p.profileStatus), Seq("agency" -> JStr("X")),
      generatedAt = "2026-08-12T00:00:00Z")
    val json = Manifest.toJson(env)
    assert(json.contains("\"schema_version\":\"2.0\""))
    assert(json.contains("\"row_count\":1"))
    assert(json.contains("\"custom_tags\":{\"agency\":\"X\"}"))

    val merged = Manifest.incrementalMerge(
      Seq(ManifestItem("u1", Nil), ManifestItem("u2", Nil)),
      Seq(ManifestItem("u2", Seq("new" -> JBool(true))), ManifestItem("u3", Nil)))
    assert(merged.map(_.sourceUrl) == Seq("u1", "u2", "u3"))
    assert(merged.find(_.sourceUrl == "u2").get.fields.nonEmpty)
  }
}
