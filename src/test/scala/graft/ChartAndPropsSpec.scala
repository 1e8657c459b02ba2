package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.operators.Aggregates
import graft.reports.ChartSpec
import graft.sources.Sniff
import graft.functions.Normalize

class ChartSpecSpec extends SparkSpec {
  import spark.implicits._

  test("chart spec: closed-month gate, previous year, 5-yr zero-excluded avg") {
    val rows = for (y <- 2019 to 2024; mm <- 1 to 12)
      yield (f"$y-$mm%02d", (if (y == 2021 && mm == 3) 0 else 100 + mm).toLong)
    val monthly = rows.toDF("m", "cnt")
    val spec = ChartSpec.fromMonthly(monthly, refYear = 2024, lastClosedMonth = 5)
    assert(spec.current.take(5).forall(_.isDefined) && spec.current.drop(5).forall(_.isEmpty))
    assert(spec.previous.forall(_.isDefined))
    // month 3: 2021 value 0 excluded → avg of 4 years of 103
    assert(spec.avg5y(2).contains(103.0))
    val json = ChartSpec.toJson(spec)
    assert(json.contains("\"month_labels\"") && json.contains("\"avg_5y\""))
    assert(json.contains("null")) // gated months render as null
  }

  test("salted count equals plain count") {
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("k", "v")
    val salted = Aggregates.saltedCount(df, "k", 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted("hot") == 900L && salted.size == 101)
  }
}

/** Property-style exhaustive checks (the scalatest↔scalacheck bridge
  * artifact is not in the offline cache; gen spaces are enumerated). */
class PropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  test("sniffer recovers the delimiter for any regular table") {
    for (d <- Seq(';', ',', '|', '\t'); nCols <- 2 to 6; nRows <- 2 to 8) {
      val rows = Seq.fill(nRows)(Seq.fill(nCols)("ab3").mkString(d.toString))
      assert(Sniff.delimiter(rows.mkString("\n")) == d, s"d=$d cols=$nCols rows=$nRows")
    }
  }

  test("splitLine is inverse of join for delimiter-free cells") {
    val gen = Gen.listOfN(4, Gen.alphaNumStr.map(_.take(6)))
    for (d <- Seq(';', ',', '|'); _ <- 1 to 50) {
      val cells = gen.sample.getOrElse(List("a", "b", "c", "d"))
      assert(Sniff.splitLine(cells.mkString(d.toString), d).toSeq == cells)
    }
  }

  test("splitLine inverts CSV quoting for cells containing delimiters and quotes") {
    def quote(c: String, d: Char): String =
      if (c.contains(d) || c.contains('"')) "\"" + c.replace("\"", "\"\"") + "\"" else c
    val pieces = Vector("a", "\"", "x\"y", "", "plain", "q\"\"z")
    for (d <- Seq(';', ',', '|'); _ <- 1 to 60) {
      val cells = List.fill(4)(
        pieces(rng.nextInt(pieces.length)) +
          (if (rng.nextBoolean()) d.toString else "") +
          pieces(rng.nextInt(pieces.length)))
      val line = cells.map(quote(_, d)).mkString(d.toString)
      assert(Sniff.splitLine(line, d).toSeq == cells, s"d=$d line=$line")
    }
  }

  test("stripAccents is idempotent and length-preserving for precomposed latin") {
    val alphabet = "áéíóúâêôãõçà"
    for (_ <- 1 to 100) {
      val s = Seq.fill(8)(alphabet(rng.nextInt(alphabet.length))).mkString
      val once = Normalize.stripAccentsJvm(s)
      assert(Normalize.stripAccentsJvm(once) == once)
      assert(once.length == s.length)
      assert(once.forall(c => c < 128))
    }
  }

  test("the q126 quota-bin closed form IS ntile: exhaustive over (n, bins)") {
    // re-derivation of scoreCalibrationScoped's bin arithmetic: ntile(b)
    // gives the first rr = n % b buckets qq+1 = n/b + 1 rows and the
    // rest qq — the closed form must reproduce that bucket layout for
    // every (n, b), including the degenerate n < b case
    def bin(i: Long, n: Long, b: Long): Long = {
      val qq = n / b; val rr = n % b
      if (i <= rr * (qq + 1)) (i - 1) / (qq + 1) + 1
      else rr + (i - rr * (qq + 1) - 1) / math.max(qq, 1L) + 1
    }
    for (b <- 1L to 12L; n <- 1L to 60L) {
      val assigned = (1L to n).map(bin(_, n, b))
      val qq = n / b; val rr = n % b
      val sizes = assigned.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = (1L to math.min(b, n)).map(k =>
        k -> (if (k <= rr) qq + 1 else qq)).filter(_._2 > 0).toMap
      assert(sizes == expected, s"n=$n b=$b sizes=$sizes")
      assert(assigned == assigned.sorted, s"n=$n b=$b not monotone")
    }
  }

  test("aviDemux inverts aviBytes across the container grid (incl. row-padding widths)") {
    import graft.operators.Multimodal
    // w = 3, 5, 6 exercise non-trivial DIB row padding (stride = ceil(3w/4)*4)
    for (w <- Seq(2, 3, 5, 6, 16); h <- Seq(2, 5, 12); n <- Seq(1, 3, 8)) {
      val got = Multimodal.aviDemux(Multimodal.aviBytes(seed = 7L, n, w, h))
      assert(got.isDefined, s"w=$w h=$h n=$n")
      val (gw, gh, frames) = got.get
      val stride = ((w * 3 + 3) / 4) * 4
      assert((gw, gh, frames.length) == ((w, h, n)), s"w=$w h=$h n=$n")
      assert(frames.forall(_.length == stride * h), s"w=$w h=$h n=$n stride")
    }
  }

  test("decodeAudio inverts wavBytes across the PCM grid with closed-form sums") {
    import graft.operators.Multimodal
    for (seed <- Seq(0L, 7L, 49L); nFrames <- Seq(1, 9, 100, 1600)) {
      val period = (seed % 50 + 2).toInt
      val exp = (0 until nFrames).map(i =>
        math.abs((i % period) * 1000L - period * 500L)).sum
      val got = Multimodal.decodeAudio(Multimodal.wavBytes(seed, nFrames))
      assert(got.contains((nFrames.toLong, 1, 16000, exp)), s"seed=$seed n=$nFrames: $got")
    }
  }
}
