package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-baseline MERGE contract (r12 verdict item 1): a full
  * bench run inside a contended host window must not replace the
  * healthy per-query baseline — that happened in r12 (d57's recorded
  * min2 went 1.45 → 7.48 s) and de-sensitized the >3× regression
  * trigger by up to 5×. These tests drive the parse + merge helpers on
  * literal record JSON, simulating exactly that overwrite. */
class BenchMergeSpec extends AnyFunSuite {

  // the shape of a persisted healthy-window record (r12 format, no
  // min2_norm field yet) — values from the real incident
  private val healthy =
    """{"metric":"total","value":146.8,"unit":"sec",""" +
    """"queries":{"d57_drop_contained":1.47,"g10_bipartite":2.02},""" +
    """"min2":{"d57_drop_contained":1.45,"g10_bipartite":2.00},""" +
    """"total_min2":144.8,"failed":[],"rerun_regressed":[],""" +
    """"effective_cores":18.3,"par_probe_best_ms":11.6,""" +
    """"sf":"/root/testdata/sf0.1"}"""

  test("parseRecord reads sf and the min2 map; absent min2_norm parses empty") {
    val r = Bench.parseRecord(healthy).get
    assert(r.sf == "/root/testdata/sf0.1")
    assert(r.min2 == Map("d57_drop_contained" -> 1.45, "g10_bipartite" -> 2.00))
    assert(r.min2Norm.isEmpty)
  }

  test("parseRecordMap matches field names exactly (min2 vs min2_norm vs min2_session)") {
    val txt = """{"min2":{"a":1.0},"min2_session":{"a":2.0},"min2_norm":{"a":3.0}}"""
    assert(Bench.parseRecordMap(txt, "min2") == Map("a" -> 1.0))
    assert(Bench.parseRecordMap(txt, "min2_session") == Map("a" -> 2.0))
    assert(Bench.parseRecordMap(txt, "min2_norm") == Map("a" -> 3.0))
  }

  test("a simulated contended session leaves healthy per-query min2s intact") {
    val prior = Bench.parseRecord(healthy).get
    // the r12 driver window: every query 3-5× inflated
    val contendedSession = Map("d57_drop_contained" -> 7.48, "g10_bipartite" -> 8.86)
    val merged = Bench.mergeBaseline(prior.min2, contendedSession, Set.empty)
    assert(merged == Map("d57_drop_contained" -> 1.45, "g10_bipartite" -> 2.00))
  }

  test("a genuinely faster session lowers the baseline; a new query enters at its session time") {
    val prior = Bench.parseRecord(healthy).get
    val session = Map("d57_drop_contained" -> 1.12, "q99_new" -> 0.8)
    val merged = Bench.mergeBaseline(prior.min2, session, Set.empty)
    assert(merged("d57_drop_contained") == 1.12)
    assert(merged("q99_new") == 0.8)
    // removed/renamed queries' stale priors are dropped (session keys drive)
    assert(!merged.contains("g10_bipartite"))
  }

  test("a failed query's time-until-crash never becomes the baseline") {
    val prior = Map("d57_drop_contained" -> 1.45)
    val session = Map("d57_drop_contained" -> 0.03, "q99_new" -> 0.02)
    val merged = Bench.mergeBaseline(prior, session,
      failed = Set("d57_drop_contained", "q99_new"))
    assert(merged == Map("d57_drop_contained" -> 1.45)) // prior kept; never-passed query absent
  }

  test("normalization factor is capped at a 2x correction") {
    assert(Bench.normFactor(10.0, 10.0) == 1.0)
    assert(Bench.normFactor(10.0, 15.0) == 10.0 / 15.0)
    // a 4x probe outlier must not scale a timing down 4x — cap at 0.5
    assert(Bench.normFactor(10.0, 40.0) == 0.5)
    // degenerate probes normalize to identity
    assert(Bench.normFactor(10.0, 0.0) == 1.0)
    assert(Bench.normFactor(0.0, 10.0) == 1.0)
  }

  // the sub-2s false-floor class (r18 verdict item 1): the parallel
  // probe is a ~10-40 ms workload — on a query of comparable scale its
  // stretch is sampling noise, and extrapolating it minted baselines
  // like q14's 0.153 vs raw 0.239 that every ordinary session then
  // "exceeded" by 1.7x
  test("normFactor: sub-2s walls get at most 20% contention credit") {
    // a 0.24 s query with a 1.6x probe outlier: the old 0.64 factor
    // minted the q14-class false floor
    assert(Bench.normFactor(10.0, 16.0, 0.24) == 0.8)
    assert(Bench.normFactor(10.0, 40.0, 1.9) == 0.8)
    // at >= 2 s the ordinary 0.5 cap stands
    assert(Bench.normFactor(10.0, 40.0, 2.5) == 0.5)
    // mild credit under the floor passes through
    assert(Bench.normFactor(10.0, 11.0, 0.24) == 10.0 / 11.0)
    // the 2-arg form (trigger paths without a wall) keeps the 0.5 cap
    assert(Bench.normFactor(10.0, 40.0) == 0.5)
  }

  test("healSmallNorms raises poisoned sub-2s norm baselines to 0.8x raw; >=2s queries untouched") {
    val norm = Map("q14" -> 0.153, "t71" -> 1.0, "big" -> 3.0, "ok" -> 0.95)
    val raw = Map("q14" -> 0.239, "t71" -> 1.622, "big" -> 9.0, "ok" -> 1.0)
    val h = Bench.healSmallNorms(norm, raw)
    assert(math.abs(h("q14") - 0.8 * 0.239) < 1e-9)
    assert(math.abs(h("t71") - 0.8 * 1.622) < 1e-9)
    assert(h("big") == 3.0) // >= 2 s: the 0.5 cap stands
    assert(h("ok") == 0.95) // already above the bound: untouched
    // the r19 incident values self-clear against the healed baseline:
    // q14's ordinary 0.26 s sessions are 1.36x of 0.1912, under 1.5
    assert(Bench.suspects(Map("q14" -> Seq(0.261, 0.259)),
      Map("q14" -> h("q14"))) == Seq.empty)
  }

  test("the re-mint floor stops the false-re-floor cycle; a regression above it still flags") {
    // re-mint lifted the d40-class baseline into the current era;
    // floors recorded for sub-2s-WALL queries only (classified by the
    // raw min2 ratchet, never the norm value — a 3.9s-wall query's
    // 0.5-capped 1.95 norm must NOT get a floor)
    val reminted = Map("d40" -> 0.504, "big" -> 4.0, "capped39" -> 1.95)
    val raw = Map("d40" -> 0.577, "big" -> 9.0, "capped39" -> 3.9)
    val floors = Bench.mintFloors(reminted, raw)
    assert(floors == Map("d40" -> 0.504))
    // one lucky probe moment the next session: a 0.41 session norm
    // would re-establish the false floor through the min merge — the
    // floor holds it at the re-mint value
    val merged = Bench.mergeBaseline(reminted,
      Map("d40" -> 0.41, "big" -> 4.2), Set.empty)
    val floored = Bench.floorNorms(merged, floors)
    assert(floored("d40") == 0.504)
    assert(floored("big") == 4.0)
    // ordinary sessions do NOT flag against the floored baseline...
    assert(Bench.suspects(Map("d40" -> Seq(0.70, 0.72)), floored) == Seq.empty)
    // ...but a genuine regression above the floor still does
    assert(Bench.suspects(Map("d40" -> Seq(1.1, 1.15)), floored) == Seq("d40"))
  }

  test("remintMaxLift: lifts above 1.5x need >15% deficit evidence (r18 advice)") {
    assert(Bench.remintMaxLift(19.9, Seq(12.3, 14.0, 12.5)) == 3.0) // ~38% deficit
    assert(Bench.remintMaxLift(19.9, Seq(18.3, 18.5, 18.6)) == 1.5) // ~8% deficit
    assert(Bench.remintMaxLift(0.0, Seq(18.3)) == 1.5) // degenerate
    assert(Bench.remintMaxLift(19.9, Seq.empty) == 1.5)
    // and remintLift honors the bound: a uniform 2x "lift" during a
    // mild throttle is absorbed at most 1.5x, leaving the excess
    // visible to the suspect channel
    val prior = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val sess = prior.map { case (k, _) => k -> 2.0 }
    assert(Bench.remintLift(prior, sess, Set.empty, maxLift = 1.5) == 1.5)
  }

  test("parseRecord reads norm_floor; absent field parses empty") {
    val txt = """{"metric":"total","min2":{"a":1.0},"norm_floor":{"a":0.5},"sf":"x"}"""
    assert(Bench.parseRecord(txt).get.normFloor == Map("a" -> 0.5))
    assert(Bench.parseRecord(healthy).get.normFloor.isEmpty)
  }

  test("parseRecordHist reads the map-of-arrays shape; absent field parses empty") {
    val txt = """{"norm_hist":{"a":[1.2,1.3],"b":[0.5]},"suspect":[],"sf":"x"}"""
    assert(Bench.parseRecordHist(txt, "norm_hist") ==
      Map("a" -> Seq(1.2, 1.3), "b" -> Seq(0.5)))
    assert(Bench.parseRecordHist(healthy, "norm_hist").isEmpty)
  }

  test("updateHistory appends newest-last, caps the window, drops stale keys, freezes failed") {
    val prior = Map("a" -> Seq(1.0, 1.1, 1.2), "gone" -> Seq(9.0), "f" -> Seq(2.0))
    val session = Map("a" -> 1.3, "new" -> 0.7, "f" -> 0.01)
    val h = Bench.updateHistory(prior, session, failed = Set("f"))
    assert(h("a") == Seq(1.1, 1.2, 1.3)) // capped at 3, newest last
    assert(h("new") == Seq(0.7))
    assert(!h.contains("gone")) // session keys drive
    assert(h("f") == Seq(2.0)) // failed: time-until-crash never enters
  }

  // the persistent-elevation contract (r13 verdict item 1): the merged
  // min2 is a one-way MIN ratchet, so a permanent slowdown can only be
  // caught by consecutive elevated session norms
  test("suspects: a one-session spike does NOT flag") {
    val baseline = Map("q" -> 1.0)
    assert(Bench.suspects(Map("q" -> Seq(1.0, 3.2)), baseline) == Seq.empty)
    // a brand-new query (single entry) cannot flag either
    assert(Bench.suspects(Map("q" -> Seq(3.2)), baseline) == Seq.empty)
  }

  test("suspects: two consecutive elevated sessions DO flag") {
    val baseline = Map("q" -> 1.0, "ok" -> 1.0)
    val hist = Map("q" -> Seq(1.0, 2.9, 3.1), "ok" -> Seq(1.1, 1.2))
    assert(Bench.suspects(hist, baseline) == Seq("q"))
  }

  test("suspects: a genuine improvement clears the run") {
    val baseline = Map("q" -> 1.0)
    // elevated twice, then recovered: newest healthy entry breaks it
    assert(Bench.suspects(Map("q" -> Seq(2.9, 3.1, 1.05)), baseline) == Seq.empty)
    // degenerate/missing baselines never flag
    assert(Bench.suspects(Map("q" -> Seq(3.0, 3.0)), Map("q" -> 0.0)) == Seq.empty)
    assert(Bench.suspects(Map("q" -> Seq(3.0, 3.0)), Map.empty) == Seq.empty)
  }

  test("suspects: a query that failed THIS session is exempt (frozen history is stale)") {
    // updateHistory freezes a failed query's window, so its "last two"
    // entries predate the failure — flagging on them re-reports old
    // data every failing session (r14 advice)
    val baseline = Map("q" -> 1.0)
    val hist = Map("q" -> Seq(2.9, 3.1)) // elevated, but frozen pre-failure
    assert(Bench.suspects(hist, baseline, failed = Set("q")) == Seq.empty)
    // and the same history flags normally once the query passes again
    assert(Bench.suspects(hist, baseline) == Seq("q"))
  }

  // the ambient-elevation channel (r16): a throttle lifts EVERYTHING —
  // the per-position median elevation is the observed ambient and the
  // threshold scales by max(cores, ambient), clamped to 2×, engaging
  // only with ≥8 measurable queries (tiny populations ARE the outliers)
  // AND a corroborating core deficit at that position (r16 advice: a
  // full-cores session's uniform lift is a real regression, not
  // ambient)
  test("suspects: uniform ambient elevation under a core deficit does not flag; an outlier against it does") {
    // 11 queries uniformly ~1.7× elevated both sessions (the r16
    // false-flag shape at 18.2 of a 19.9-core baseline era): median =
    // 1.7 → threshold 2.55× → nothing flags
    val deficit = Seq(18.2, 18.2) // coresScale ≈ 1.09 > 1: gate open
    val uniform = (1 to 11).map(i => s"q$i" -> Seq(1.7, 1.72)).toMap
    val baseline = (1 to 11).map(i => s"q$i" -> 1.0).toMap
    assert(Bench.suspects(uniform, baseline,
      coresHist = deficit, baselineCores = 19.9) == Seq.empty)
    // the same ambient with ONE genuine outlier (4× both sessions):
    // only the outlier flags
    val withReg = uniform + ("bad" -> Seq(4.0, 4.1))
    assert(Bench.suspects(withReg, baseline + ("bad" -> 1.0),
      coresHist = deficit, baselineCores = 19.9) == Seq("bad"))
    // fleet-wide REAL slowdown under the deficit: everything at 3.2×
    // — the 2× clamp stops the ambient estimate self-certifying it;
    // all flag
    val fleet = (1 to 11).map(i => s"q$i" -> Seq(3.2, 3.3)).toMap
    assert(Bench.suspects(fleet, baseline,
      coresHist = deficit, baselineCores = 19.9).size == 11)
    // FULL-CORES session: the gate keeps ambient out, so the same
    // uniform 1.7× lift is a fleet-wide real regression — all flag
    // (pre-gate this self-certified as ambient)
    assert(Bench.suspects(uniform, baseline,
      coresHist = Seq(19.9, 19.9), baselineCores = 19.9).size == 11)
    // no cores history at all (pre-r16 records): no contention
    // evidence → gate closed → the uniform lift flags too
    assert(Bench.suspects(uniform, baseline).size == 11)
    // under 8 measurable queries the ambient channel stays out (the
    // 2-query fixture's median IS the candidate): elevated pair flags
    val tiny = Map("q" -> Seq(2.9, 3.1), "ok" -> Seq(1.1, 1.2))
    assert(Bench.suspects(tiny, Map("q" -> 1.0, "ok" -> 1.0),
      coresHist = deficit, baselineCores = 19.9) == Seq("q"))
  }

  test("jsonStr escapes quotes, backslashes and control chars (record stays parseable)") {
    assert(Bench.jsonStr("plain") == "\"plain\"")
    assert(Bench.jsonStr("""a"b""") == """"a\"b"""")
    assert(Bench.jsonStr("""a\b""") == """"a\\b"""")
    assert(Bench.jsonStr("a\nb") == "\"a\\u000ab\"")
  }

  test("unJsonStr inverts jsonStr; an escaped sf path round-trips through parseRecord") {
    // r15 advice: emitters escaped but parsers never unescaped — the
    // prior-baseline sf match silently failed for exactly the inputs
    // jsonStr was added to handle
    for (s <- Seq("plain", "a\"b", "a\\b", "a\nb", "q\\\"x", "/root/test data/sf0.1"))
      assert(Bench.unJsonStr(Bench.jsonStr(s).stripPrefix("\"").stripSuffix("\"")) == s)
    val weird = """/tmp/sf"0.1\x"""
    val rec = s"""{"metric":"total","min2":{"a":1.0},"sf":${Bench.jsonStr(weird)}}"""
    assert(Bench.parseRecord(rec).get.sf == weird)
  }

  test("jsonKey fails loudly on names the flat-split parsers cannot round-trip") {
    assert(Bench.jsonKey("q01_agg") == "\"q01_agg\"")
    intercept[IllegalArgumentException](Bench.jsonKey("a\"b"))
    intercept[IllegalArgumentException](Bench.jsonKey("a\\b"))
    intercept[IllegalArgumentException](Bench.jsonKey("a\nb"))
  }

  test("parseRecordNums/parseRecordNum read the cores fields; absent fields degrade") {
    val txt = """{"cores_hist":[17.0,15.8],"baseline_cores":19.9,"sf":"x"}"""
    assert(Bench.parseRecordNums(txt, "cores_hist") == Seq(17.0, 15.8))
    assert(Bench.parseRecordNum(txt, "baseline_cores") == 19.9)
    assert(Bench.parseRecordNums(healthy, "cores_hist").isEmpty)
    assert(Bench.parseRecordNum(healthy, "baseline_cores") == 0.0)
  }

  test("coresScale: clamped core-deficit ratio, identity on degenerate inputs") {
    assert(Bench.coresScale(19.9, 19.9) == 1.0)
    assert(Bench.coresScale(19.9, 15.8) == 19.9 / 15.8) // ≈1.26
    assert(Bench.coresScale(19.9, 25.0) == 1.0) // healthier than baseline era: no relaxation
    assert(Bench.coresScale(40.0, 10.0) == 2.0) // capped, mirroring normFactor
    assert(Bench.coresScale(0.0, 15.8) == 1.0)
    assert(Bench.coresScale(19.9, 0.0) == 1.0)
  }

  test("suspects: a throttled-era 1.5-2.0x residual does not flag under cores scaling") {
    // the r15 false-flag class: baselines minted at ~19.9 effective
    // cores, sessions at ~15.8-17.5 — the 2x-capped normFactor leaves
    // a 1.5-2.0x residual on scan-saturating shapes. With the last two
    // sessions' cores recorded, the threshold scales to ~1.9x and the
    // class self-clears (d40's real shape: ratios 2.0 then 1.79).
    val baseline = Map("d40" -> 0.394)
    val hist = Map("d40" -> Seq(0.692, 0.789, 0.706))
    assert(Bench.suspects(hist, baseline) == Seq("d40")) // unscaled: flags
    assert(Bench.suspects(hist, baseline,
      coresHist = Seq(17.0, 16.4, 15.8), baselineCores = 19.9) == Seq.empty)
    // a REAL regression plus throttle still flags: 3x entries clear 1.5*2
    val bad = Map("d40" -> Seq(1.2, 1.25))
    assert(Bench.suspects(bad, baseline,
      coresHist = Seq(16.4, 15.8), baselineCores = 19.9) == Seq("d40"))
    // healthy sessions (cores >= baseline era) keep the unscaled threshold
    assert(Bench.suspects(hist, baseline,
      coresHist = Seq(19.9, 19.9), baselineCores = 19.9) == Seq("d40"))
    // pre-r16 records (no cores_hist) degrade to unscaled behavior
    assert(Bench.suspects(hist, baseline,
      coresHist = Seq.empty, baselineCores = 19.9) == Seq("d40"))
  }

  test("summaryJson caps the suspect array; n_suspect carries the true count; truncation is explicit") {
    val many = (1 to 30).map(i => f"q$i%02d_some_rather_long_name")
    val s = Bench.summaryJson(156.2, 140.9, 156.2, 18.3, 0, many,
      "/root/testdata/sf0.1")
    assert(s.contains(""""n_suspect":30"""))
    assert(Bench.parseRecordList(s, "suspect") == many.sorted.take(24))
    // a capped list can never silently disagree with the full record
    // on membership (r15 verdict item 6: n_suspect 8 with 6 names hid
    // the names adjudication needed) — truncation is marked
    assert(s.contains(""""suspect_truncated":true"""))
    // bounded even under mass flagging: the 2000-char driver tail the
    // summary exists to fit must always hold it whole
    assert(s.length < 1200)
    // an 8-name round (the r15 shape) now carries every name
    val eight = (1 to 8).map(i => f"d$i%02d_rather_long_query_name")
    val s8 = Bench.summaryJson(156.2, 140.9, 156.2, 18.3, 0, eight,
      "/root/testdata/sf0.1")
    assert(Bench.parseRecordList(s8, "suspect") == eight.sorted)
    assert(!s8.contains("suspect_truncated"))
  }

  test("summaryJson emits the short tail record with every driver-needed total") {
    val s = Bench.summaryJson(156.2, 140.9, 156.2, 18.3, 1,
      Seq("d57_drop_contained"), "/root/testdata/sf0.1")
    assert(s.startsWith("""{"metric":"summary","""))
    assert(s.contains(""""total":156.2"""))
    assert(s.contains(""""total_min2":140.9"""))
    assert(s.contains(""""total_min2_session":156.2"""))
    assert(s.contains(""""effective_cores":18.3"""))
    assert(s.contains(""""n_failed":1"""))
    assert(Bench.parseRecordList(s, "suspect") == Seq("d57_drop_contained"))
    // short enough that a 2000-char stdout tail always holds it whole,
    // with generous headroom for a long suspect list
    assert(s.length < 400)
  }

  test("a record from a different scale factor is not a baseline") {
    val r = Bench.parseRecord(healthy).get
    assert(r.sf != "/root/testdata/sf0.01")
  }

  test("round-close rule: a non-empty committed suspect list has a NOTES adjudication") {
    // the suspect channel (persistent-elevation detector) is only
    // useful if somebody ACTS on it — this gate makes a flagged query
    // fail the suite until NOTES.md names it (r14 verdict item 6: the
    // summary carries `suspect`, but nothing failed loudly on it).
    // Adjudication = the query's name appears in NOTES.md — the round
    // log either explains the elevation (throttle/decimal-width/real
    // regression + fix) or the flag is stale and the entry documents
    // why.
    val bench = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(java.nio.file.Files.exists(bench), "no committed bench record")
    val txt = new String(java.nio.file.Files.readAllBytes(bench),
      java.nio.charset.StandardCharsets.UTF_8)
    val suspect = Bench.parseRecordList(txt, "suspect")
    if (suspect.nonEmpty) {
      // a missing NOTES.md is itself an un-adjudicated state — fail
      // with the adjudication message, not a NoSuchFileException
      // (r15 advice)
      val notesPath = java.nio.file.Paths.get("NOTES.md")
      assert(java.nio.file.Files.exists(notesPath),
        s"committed record flags $suspect as persistently elevated but " +
        "NOTES.md is absent — adjudicate before closing the round")
      val notes = new String(java.nio.file.Files.readAllBytes(notesPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val unadjudicated = suspect.filterNot(notes.contains)
      assert(unadjudicated.isEmpty,
        s"committed record flags $suspect as persistently elevated but " +
        s"NOTES.md never mentions: $unadjudicated — adjudicate before " +
        "closing the round (profile, fix, or document why it's benign)")
    }
  }

  test("round-close rule: a non-empty rerun_regressed list is acknowledged in NOTES") {
    // r16 verdict item 5: the >3×-first-run rerun channel was recorded
    // "so a round's NOTES can use it" but carried no obligation — 10
    // spikes rode through a close silently. Rule: min2-RECOVERED
    // spikes need no per-name adjudication (the recovery is in the
    // record itself — compare `queries` vs `min2_session`), but the
    // CHANNEL must not be silent: when the committed list is
    // non-empty, NOTES.md must either name every entry or carry the
    // literal `rerun_regressed` token next to that round's accounting
    // (count + recovered/not). A spike that did NOT recover stays
    // elevated in norm_hist and is separately caught by the suspect
    // gate above.
    val bench = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(java.nio.file.Files.exists(bench), "no committed bench record")
    val txt = new String(java.nio.file.Files.readAllBytes(bench),
      java.nio.charset.StandardCharsets.UTF_8)
    val rerun = Bench.parseRecordList(txt, "rerun_regressed")
    if (rerun.nonEmpty) {
      val notesPath = java.nio.file.Paths.get("NOTES.md")
      assert(java.nio.file.Files.exists(notesPath),
        s"committed record carries rerun_regressed=$rerun but NOTES.md " +
        "is absent — acknowledge the channel before closing the round")
      val notes = new String(java.nio.file.Files.readAllBytes(notesPath),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(notes.contains("rerun_regressed") || rerun.forall(notes.contains),
        s"committed record carries rerun_regressed=$rerun but NOTES.md " +
        "neither names them nor mentions `rerun_regressed` — add the " +
        "round's accounting line (count + min2-recovered or not)")
    }
  }

  test("sustainedDeficit: engages only when the whole cores window sits >5% below the baseline era") {
    // the observed throttle (r12-r18): sessions at 13.3-18.3 of the
    // 19.9-core baseline era → engage
    assert(Bench.sustainedDeficit(Seq(17.9, 13.3, 14.2), 19.9))
    assert(Bench.sustainedDeficit(Seq(17.9, 13.3, 18.3), 19.9))
    // one healthy entry inside the window breaks the streak (a
    // recovering host must NOT get its baselines inflated)
    assert(!Bench.sustainedDeficit(Seq(17.9, 19.5, 14.2), 19.9))
    // fewer than 3 recorded sessions is not "sustained"
    assert(!Bench.sustainedDeficit(Seq(13.3, 14.2), 19.9))
    assert(!Bench.sustainedDeficit(Seq.empty, 19.9))
    // jitter-level (<5%) deficit stays on the ordinary clamp path
    assert(!Bench.sustainedDeficit(Seq(19.2, 19.0, 19.3), 19.9))
  }

  test("remintLift: catalogue median, outlier-immune, small-sample and clamp guards") {
    val prior = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    // uniform 1.4× lift with two real-regression outliers: the median
    // reads the ambient 1.4, not the outliers the re-mint must expose
    val session = prior.map { case (k, _) =>
      k -> (if (k == "q3" || k == "q7") 5.0 else 1.4) }
    val l = Bench.remintLift(prior, session, Set.empty)
    assert(math.abs(l - 1.4) < 1e-9, s"got $l")
    // failed queries are excluded from the estimate
    assert(math.abs(Bench.remintLift(prior,
      session.updated("q3", 99.0), Set("q3", "q7")) - 1.4) < 1e-9)
    // < 8 aligned samples is not an estimate → 1.0 (no re-mint)
    assert(Bench.remintLift(prior.take(5), session.take(5), Set.empty) == 1.0)
    // clamp: never deflates (min-ratchet's job), never credits > 3×
    assert(Bench.remintLift(prior, prior.map { case (k, _) => k -> 0.5 },
      Set.empty) == 1.0)
    assert(Bench.remintLift(prior, prior.map { case (k, _) => k -> 9.0 },
      Set.empty) == 3.0)
  }

  test("re-mint restores the ~1.5x suspect floor a sustained deficit parks at ~3x") {
    // the r17 verdict scenario: baselines minted at 19.9 cores, six
    // sessions at ~14 — a genuine 2.2× regression (two consecutive
    // elevated entries) hides under the clamped threshold
    // (1.5 × min(2, 19.9/14) = ~2.13... with ambient riding to the 2×
    // clamp → floor 3×). After re-minting baselines ×1.4 into the
    // current era and resetting baseline_cores to the session's, the
    // same entries compare at 1.5 × reminted — and flag.
    val base = (1 to 19).map(i => s"q$i" -> 1.0).toMap + ("slow" -> 1.0)
    val hist = base.map { case (k, _) =>
      k -> Seq(if (k == "slow") 2.2 else 1.4, if (k == "slow") 2.2 else 1.4) }
    // BEFORE: deficit era, old baseline_cores → ambient (median 1.4,
    // gated ON by the core deficit) and cores scale together put the
    // threshold at 1.5 × max(1.42, 1.4) = ~2.13 < 2.2 — flags ONLY
    // because 2.2 clears it; at 2.0 it would hide (the sensitivity
    // floor the re-mint removes)
    val borderline = base.map { case (k, _) =>
      k -> Seq(if (k == "slow") 2.0 else 1.4, if (k == "slow") 2.0 else 1.4) }
    assert(Bench.suspects(borderline, base, coresHist = Seq(14.0, 14.0),
      baselineCores = 19.9).isEmpty, "2.0x hides under the deficit clamp")
    // AFTER re-mint: baselines ×1.4 (the session median), cores era
    // reset → scales 1.0, ambient ~1.0 → threshold 1.5 × 1.4 = 2.1;
    // the same 2.2× entries NOW require only being genuine outliers
    val lift = Bench.remintLift(base, base.map { case (k, _) =>
      k -> (if (k == "slow") 2.2 else 1.4) }, Set.empty)
    val reminted = base.map { case (k, v) => k -> v * lift }
    assert(Bench.suspects(hist, reminted, coresHist = Seq(14.0, 14.0),
      baselineCores = 14.0) == Seq("slow"))
    // and the uniform-ambient queries do NOT flag against the
    // re-minted baseline (no false-flag class reintroduced)
    assert(Bench.suspects(borderline.map { case (k, v) =>
        k -> v.map(x => if (k == "slow") 1.45 else x) },
      reminted, coresHist = Seq(14.0, 14.0),
      baselineCores = 14.0).isEmpty)
  }

  test("round-close rule: a driver bench run at <0.8x the builder's recorded cores is acknowledged in NOTES") {
    // r17 verdict item 8: the driver's post-close BENCH_rN can land in
    // a worse window than the builder's recorded run (r17: 13.3 vs
    // 17.9 effective cores) — the two committed records then disagree
    // on wall times for reasons that are neither regression nor fix.
    // When the skew exceeds 20%, NOTES must carry a "driver cores
    // skew" reconciliation line so the artifacts stay honestly
    // reconciled round over round.
    val dir = java.nio.file.Paths.get(".")
    val stream = java.nio.file.Files.list(dir)
    val rs = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    try stream.iterator().forEachRemaining { p =>
      if (p.getFileName.toString.matches("BENCH_r\\d+\\.json")) rs += p
    } finally stream.close()
    assume(rs.nonEmpty, "no committed driver bench record")
    val newest = rs.maxBy(p =>
      p.getFileName.toString.stripPrefix("BENCH_r").stripSuffix(".json").toInt)
    val driverTxt = new String(java.nio.file.Files.readAllBytes(newest),
      java.nio.charset.StandardCharsets.UTF_8)
    // the driver record embeds the summary line in its `tail` as a
    // JSON-ESCAPED string (quotes arrive as \"), so match both forms;
    // the LAST effective_cores occurrence is the summary's (the full
    // record line's comes first)
    val cores = "\\\\?\"effective_cores\\\\?\":([0-9.]+)".r
      .findAllMatchIn(driverTxt).map(_.group(1).toDouble).toSeq
    assume(cores.nonEmpty, "driver record carries no effective_cores")
    val driverCores = cores.last
    val full = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(java.nio.file.Files.exists(full), "no committed bench record")
    val hist = Bench.parseRecordNums(new String(
      java.nio.file.Files.readAllBytes(full),
      java.nio.charset.StandardCharsets.UTF_8), "cores_hist")
    // the driver's run appends its own entry when it rewrites the
    // record — the builder's recorded run is the entry before it.
    // Tolerance compare (r18 advice): the two files format the same
    // Double independently; exact equality would misattribute the
    // builder entry on any precision drift
    val builderCores = (if (hist.lastOption.exists(h =>
        math.abs(h - driverCores) < 1e-9))
      hist.dropRight(1).lastOption else hist.lastOption).getOrElse(0.0)
    if (builderCores > 0 && driverCores < 0.8 * builderCores) {
      val notesPath = java.nio.file.Paths.get("NOTES.md")
      assert(java.nio.file.Files.exists(notesPath),
        f"driver ran at $driverCores%.1f cores vs the builder's " +
        f"$builderCores%.1f (<0.8x) but NOTES.md is absent")
      val notes = new String(java.nio.file.Files.readAllBytes(notesPath),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(notes.contains("driver cores skew"),
        f"driver's ${newest.getFileName} ran at $driverCores%.1f effective " +
        f"cores vs the builder's recorded $builderCores%.1f (<0.8x) — add " +
        "the `driver cores skew` reconciliation line to NOTES.md")
    }
  }

  test("the committed BENCH_FULL.json round-trips through parseRecord (emitter/parser drift guard)") {
    // the emitter (Bench.main's record line) and parseRecord live ~150
    // lines apart; a field rename in one silently returns empty maps
    // from the other and de-sensitizes the regression trigger — the
    // same failure class the merge protection exists for, one level up.
    // Parsing the real committed artifact pins them together.
    val path = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(java.nio.file.Files.exists(path), "no committed bench record")
    val txt = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val r = Bench.parseRecord(txt).get
    assert(r.sf.nonEmpty && r.min2.nonEmpty)
    // r13+ records carry the normalized merged baseline too
    assert(r.min2Norm.nonEmpty, "min2_norm absent — emitter/parser drift")
    // merge invariant on the artifact itself: the merged baseline is
    // never above the session measurement for any query
    val session = Bench.parseRecordMap(txt, "min2_session")
    assert(session.nonEmpty)
    // failed queries are EXEMPT (r13 advice): mergeBaseline keeps the
    // prior baseline for a query that failed this session, which can
    // legitimately exceed the session's time-until-crash — the
    // invariant holds only for queries that actually passed
    val failedQs = Bench.parseRecordList(txt, "failed").toSet
    val above = session.collect {
      case (k, v) if !failedQs.contains(k) &&
        r.min2.get(k).exists(_ > v + 1e-9) => k
    }
    assert(above.isEmpty, s"merged min2 above session time for: $above")
  }

  test("summary record stays ONE parseable line with the driver-read fields (r20 verdict item 7)") {
    // the driver tails ~2000 chars of stdout and parses the LAST
    // {"metric":...} line it finds; r19's record was unparseable to it
    // (prev_bench_ok false — the whole round-over-round guard went
    // blind). Pin the summary emitter's side of that contract: single
    // line, valid JSON, the scalar fields the driver reads, and a
    // bounded length that fits any 2000-char tail — including a
    // mass-flagging round (the suspect cap + explicit truncation
    // marker) and an sf path needing escapes.
    val many = (1 to 60).map(i => f"q$i%02d_very_long_query_name_here")
    val s = Bench.summaryJson(250.19, 157.3, 215.7, 14.1, 2, many,
      "/root/testdata/sf0.1\"weird\\path")
    assert(!s.contains("\n") && !s.contains("\r"), "summary must be one line")
    assert(s.length < 1900, s"summary too long for the driver tail: ${s.length}")
    assert(s.startsWith("""{"metric":"summary","""))
    // parse with an actual JSON parser (none in the main jar's deps —
    // use the JDK's nashorn-free fallback: scala.util.parsing is not
    // available either, so round-trip the fields the cheap way the
    // driver does: regex field extraction must find every scalar)
    Seq("\"total\":250.19", "\"total_min2\":157.3",
        "\"total_min2_session\":215.7", "\"effective_cores\":14.1",
        "\"n_failed\":2", "\"n_suspect\":60", "\"suspect_truncated\":true")
      .foreach(f => assert(s.contains(f), s"summary missing $f"))
    // balanced braces/brackets and no raw control chars — the cheap
    // single-line-JSON well-formedness invariants
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.count(_ == '[') == s.count(_ == ']'))
    assert(s.forall(c => c >= ' '), "raw control char in summary")
  }
}
