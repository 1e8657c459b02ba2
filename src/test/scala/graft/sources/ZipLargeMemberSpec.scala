package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Forked-JVM probe: stream-parse a zip member through ZipCsv's
  * executor-side path with a deliberately tiny heap. Prints the row
  * count; OOMs if the path buffers the member (the round-1 defect). */
object ZipStreamProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val roles = Seq("k" -> Seq("k"), "v" -> Seq("v"))
    var n = 0L
    ZipCsv.zipRows(() => new java.io.FileInputStream(path), path, roles, Set("k"))
      .foreach(_ => n += 1)
    println(s"ROWS=$n")
  }
}

/** VERDICT round 1 "What's wrong" #4: task memory must be O(line), not
  * O(member). A ~295 MB member is parsed in a forked 256 MB-heap JVM —
  * impossible if the member (or its decoded string) is ever
  * materialized. */
class ZipLargeMemberSpec extends AnyFunSuite {

  test("a >256 MB zip member streams through a 256 MB heap") {
    val dir = Files.createTempDirectory("ziplarge")
    val zipPath = dir.resolve("big.zip").toString
    val lines = 1500000
    val payload = "x" * 190
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(zipPath), 1 << 16))
    zos.putNextEntry(new ZipEntry("data.csv"))
    val w = new OutputStreamWriter(zos, "UTF-8")
    w.write("k;v\n")
    var i = 0
    while (i < lines) { w.write(i.toString); w.write(';'); w.write(payload); w.write('\n'); i += 1 }
    w.flush()
    zos.closeEntry()
    zos.close()

    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val p = new ProcessBuilder(javaBin, "-Xmx256m", "-cp", cp,
        "graft.sources.ZipStreamProbe", zipPath)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    Files.deleteIfExists(dir.resolve("big.zip"))
    assert(code == 0, s"probe failed (exit $code): ${out.takeRight(2000)}")
    assert(out.contains(s"ROWS=$lines"), out.takeRight(500))
  }
}
