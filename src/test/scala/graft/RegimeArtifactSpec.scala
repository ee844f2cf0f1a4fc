package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift checks between the shipped regime CONSTANTS and the committed
  * measurement ARTIFACTS (r19 verdict item 7): `LayoutCellDirMax` and
  * `LiteralCodebookMax` are measured numbers (DevLayoutRegime /
  * DevCrossover, run with `--json`), and their evidence lives in the
  * repo as REGIME_LAYOUT.json / REGIME_CODEBOOK.json so it
  * regenerates and diffs mechanically instead of living in NOTES
  * prose. These tests fail when a constant is edited without
  * re-measuring (the artifact's recorded constant disagrees) or when
  * a re-measurement no longer supports the constant's placement (the
  * crossover moved) — either way the constant and its evidence must
  * be reconciled together.
  *
  * The assertions are DIRECTIONAL with wide margins (build-cost
  * ratios of ~10×, probe parity within 2×): they pin which regime
  * wins on which side of the bound, not third-digit timings, so an
  * honestly-regenerated artifact on a throttled host still passes.
  */
class RegimeArtifactSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p),
      s"$name missing — regenerate with the Dev tool's --json mode")
    java.nio.file.Files.readString(p)
  }

  private def num(obj: String, field: String): Double =
    s""""$field":(-?[0-9.]+)""".r.findFirstMatchIn(obj)
      .map(_.group(1).toDouble)
      .getOrElse(fail(s"field $field missing in: $obj"))

  private def rows(txt: String): Seq[String] =
    """\{[^{}]*\}""".r.findAllIn(
      txt.substring(txt.indexOf("\"rows\":["))).toSeq

  test("REGIME_LAYOUT.json: LayoutCellDirMax matches, and the measured crossover supports its placement") {
    val txt = read("REGIME_LAYOUT.json")
    assert(num(txt, "layout_cell_dir_max") ==
      graft.operators.Similarity.LayoutCellDirMax.toDouble,
      "artifact was generated against a different LayoutCellDirMax — " +
        "re-run DevLayoutRegime --json after changing the constant")
    val rs = rows(txt)
    assert(rs.nonEmpty, "no measurement rows in REGIME_LAYOUT.json")
    // above the bound: one-dir-per-cell is the measured pathology
    // (dir count grows with nlist; build cost a multiple of the
    // bucketed build's) while the bucketed layout stays bounded with
    // probe parity — the warning's remedy is real
    val above = rs.filter(r =>
      num(r, "nlist") > graft.operators.Similarity.LayoutCellDirMax)
    assert(above.nonEmpty,
      "artifact has no row above LayoutCellDirMax — the bound is unmeasured")
    for (r <- above) {
      assert(num(r, "cell_dirs") == num(r, "nlist"),
        s"per-cell layout no longer writes one dir per cell: $r")
      assert(num(r, "bkt_dirs") <= 64, s"bucketed dirs unbounded: $r")
      assert(num(r, "bkt_build_s") * 2 < num(r, "cell_build_s"),
        s"per-cell build no longer clearly pathological above the bound " +
          s"— re-examine LayoutCellDirMax: $r")
      assert(num(r, "bkt_probe_s") <= 2 * num(r, "cell_probe_s"),
        s"bucketed probe lost parity with the per-cell probe: $r")
    }
    // at or below the bound the per-cell regime stays within it
    for (r <- rs if num(r, "nlist") <=
        graft.operators.Similarity.LayoutCellDirMax)
      assert(num(r, "cell_dirs") <=
        graft.operators.Similarity.LayoutCellDirMax, s"dirs exceed bound: $r")
  }

  test("REGIME_CODEBOOK.json: LiteralCodebookMax matches, and the measured crossover supports its placement") {
    val txt = read("REGIME_CODEBOOK.json")
    assert(num(txt, "literal_codebook_max") ==
      graft.operators.Similarity.LiteralCodebookMax.toDouble,
      "artifact was generated against a different LiteralCodebookMax — " +
        "re-run DevCrossover --json after changing the constant")
    val rs = rows(txt)
    assert(rs.nonEmpty, "no measurement rows in REGIME_CODEBOOK.json")
    val bound = graft.operators.Similarity.LiteralCodebookMax
    // at/below the bound the literal form is not clearly losing
    // (ratio = literal/frame; parity noise allowed)
    for (r <- rs if num(r, "k") <= bound)
      assert(num(r, "ratio") <= 1.5,
        s"literal form clearly loses at k <= $bound — lower the bound: $r")
    // well above the bound the frame form must clearly win
    val far = rs.filter(r => num(r, "k") >= 8 * bound)
    assert(far.nonEmpty,
      s"artifact has no row well above LiteralCodebookMax ($bound)")
    for (r <- far)
      assert(num(r, "ratio") > 1.5,
        s"frame form no longer clearly wins at large k — re-examine " +
          s"LiteralCodebookMax: $r")
  }
}
