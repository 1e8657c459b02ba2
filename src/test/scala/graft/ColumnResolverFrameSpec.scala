package graft

import graft.sources.ColumnResolver

/** Pins the distributed header resolution (`resolveFrame`, q96) to the
  * driver-side `resolve` it lifts: same normalized matching, same
  * candidate-order priority, same last-duplicate-position tie rule,
  * same missing-role behavior — row-for-row, per file. */
class ColumnResolverFrameSpec extends SparkSpec {
  import spark.implicits._

  private val candidates = Seq(
    "datetime" -> Seq("DataHoraGMT", "data_hora", "data"),
    "state" -> Seq("Estado", "UF"),
    "value" -> Seq("FRP", "frp_mw", "Valor"))

  private val files = Map(
    // plain drift: case/separator variants of the first candidates
    "a.csv" -> Seq("Satelite", "Data Hora GMT", "uf", "frp_mw"),
    // lower-priority candidates only
    "b.csv" -> Seq("data", "ESTADO", "Valor", "municipio"),
    // duplicate normalized key: resolve's toMap keeps the LAST position
    "c.csv" -> Seq("FRP", "frp", "DataHoraGMT", "Estado"),
    // value role unresolvable → no row for it
    "d.csv" -> Seq("DATAHORA", "UF", "potencia"),
    // candidate priority: DataHoraGMT (rank 0) beats data_hora (rank 1)
    // regardless of position
    "e.csv" -> Seq("data_hora", "DataHoraGMT", "Estado", "FRP"))

  test("resolveFrame equals per-file resolve on drifted headers") {
    val rows = files.toSeq.flatMap { case (f, hdrs) =>
      hdrs.zipWithIndex.map { case (h, i) => (f, i, h) }
    }
    val got = ColumnResolver.resolveFrame(rows.toDF("file", "pos", "hdr"), candidates)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val want = files.flatMap { case (f, hdrs) =>
      ColumnResolver.resolve(hdrs, candidates.toMap).map { case (role, idx) =>
        (f, role) -> idx
      }
    }
    assert(got == want)
    // the unresolvable role really is exercised
    assert(!got.contains(("d.csv", "value")))
    // and the duplicate-key tie really picks the later column
    assert(got(("c.csv", "value")) == 1)
  }
}
