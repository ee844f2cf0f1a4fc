package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** CPU-health calibration emitted with every bench line: single-
    * thread vs n-way parallel spin. Hypervisor throttle windows
    * (r5/r6 NOTES: 5.7-11.6 effective cores on a 16-cpu container,
    * identical code, up to 25x warm-query slowdowns) otherwise read
    * as engine regressions — the ratio makes a throttled measurement
    * self-documenting and normalizable. */
  // spin results accumulate into a volatile sink: an ignored result
  // would let HotSpot dead-code-eliminate the pure counted loop after
  // JIT, silently zeroing the calibration the health field rests on
  @volatile private var spinSink: Long = 0L

  private def effectiveCores(n: Int): Double = {
    def spin(): Long = {
      var x = 0L; var i = 0
      while (i < 30000000) { x += i.toLong * i; i += 1 }
      x
    }
    spinSink ^= spin() // JIT warm-up
    val t1 = System.nanoTime(); spinSink ^= spin()
    val single = System.nanoTime() - t1
    val threads = (1 to n).map(_ => new Thread(new Runnable {
      def run(): Unit = { spinSink ^= spin(); () }
    }))
    val t2 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val par = System.nanoTime() - t2
    math.rint(10.0 * n * single / par) / 10.0
  }

  /** PER-QUERY health sample: a fixed ~10M-iteration single-thread
    * spin timed immediately before each measured query. On a healthy
    * host every probe takes the same wall time; inside a hypervisor
    * throttle window the probe stretches proportionally — so a query
    * timing can be normalized from the RECORD alone
    * (t_normalized ≈ t × probe_best/probe) instead of inferred from
    * the whole-run effective-cores average, which is blind to
    * per-query throttle windows (the r8 q74 / r9 g05 class). Cost
    * ~5-20 ms per query — noise next to any measured query. */
  private[graft] def probeMs(): Double = {
    def spin(): Long = {
      var x = 0L; var i = 0
      while (i < 10000000) { x += i.toLong * i; i += 1 }
      x
    }
    val t0 = System.nanoTime()
    spinSink ^= spin()
    math.rint((System.nanoTime() - t0) / 1e3) / 1e3 // ms, 3 dp
  }

  /** PER-QUERY PARALLEL health sample — the multi-core companion to
    * probeMs. The r11 driver window slowed queries 2-8× while every
    * single-thread probe read a healthy ~5.4 ms: the throttle mode
    * that matters is multi-core/IO contention, which a 1-thread spin
    * is BLIND to. This times n threads each running the ~10M spin —
    * on a healthy host with ≥ n free cores the group's wall time ≈
    * one spin; under parallel throttle it stretches proportionally,
    * so each query timing can be normalized in the dimension that
    * actually throttles (t_norm ≈ t × par_best/par_ms[name]). Cost
    * ~10-40 ms per sample — noise next to any measured query. */
  private[graft] def parProbeMs(n: Int): Double = {
    def spin(): Long = {
      var x = 0L; var i = 0
      while (i < 10000000) { x += i.toLong * i; i += 1 }
      x
    }
    val threads = (1 to n).map(_ => new Thread(new Runnable {
      def run(): Unit = { spinSink ^= spin(); () }
    }))
    val t0 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    math.rint((System.nanoTime() - t0) / 1e3) / 1e3 // ms, 3 dp
  }

  /** The fields of a persisted BENCH_FULL.json record that baseline
    * merging and regression triggering read back. `min2Norm` is empty
    * on pre-r13 records (the field didn't exist yet); `normHist` (the
    * last ≤3 session-normalized min2s per query, newest last) is empty
    * on pre-r14 records. */
  private[graft] final case class PriorRecord(sf: String,
      min2: Map[String, Double], min2Norm: Map[String, Double],
      normHist: Map[String, Seq[Double]], coresHist: Seq[Double],
      baselineCores: Double, normFloor: Map[String, Double])

  /** Extract a `"field":{"k":v,...}` flat map from a record line.
    * Field names are matched exactly (`"min2":{` does not match
    * `"min2_norm":{` or `"min2_session":{`). */
  private[graft] def parseRecordMap(txt: String, field: String): Map[String, Double] =
    ("\"" + field + "\":\\{([^}]*)\\}").r.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse("").split(",").toSeq.filter(_.contains(":"))
      .flatMap { kv =>
        val Array(k, v) = kv.split(":", 2)
        try Some(unJsonStr(k.trim.stripPrefix("\"").stripSuffix("\"")) -> v.toDouble)
        catch { case _: Throwable => None }
      }.toMap

  /** Extract a `"field":["a","b",...]` string array from a record
    * line. Same exact-name discipline as [[parseRecordMap]]. */
  private[graft] def parseRecordList(txt: String, field: String): Seq[String] =
    ("\"" + field + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse("").split(",").toSeq
      .map(e => unJsonStr(e.trim.stripPrefix("\"").stripSuffix("\"")))
      .filter(_.nonEmpty)

  /** Extract a `"field":{"k":[v,v],...}` map-of-number-arrays (the
    * norm_hist shape). Entries are matched individually — the flat
    * comma split of [[parseRecordMap]] would break inside arrays. */
  private[graft] def parseRecordHist(txt: String, field: String): Map[String, Seq[Double]] =
    ("\"" + field + "\":\\{([^}]*)\\}").r.findFirstMatchIn(txt).map(_.group(1))
      .map { body =>
        "\"([^\"]+)\":\\[([^\\]]*)\\]".r.findAllMatchIn(body).map { m =>
          unJsonStr(m.group(1)) -> m.group(2).split(",").toSeq.filter(_.nonEmpty)
            .flatMap(v => try Some(v.toDouble) catch { case _: Throwable => None })
        }.toMap
      }.getOrElse(Map.empty)

  /** Extract a `"field":[1.2,3.4,...]` bare number array (the
    * cores_hist shape). Absent field parses empty. */
  private[graft] def parseRecordNums(txt: String, field: String): Seq[Double] =
    ("\"" + field + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse("").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(v => try Some(v.toDouble) catch { case _: Throwable => None })

  /** Extract a `"field":1.23` bare number scalar; 0.0 when absent. */
  private[graft] def parseRecordNum(txt: String, field: String): Double =
    ("\"" + field + "\":(-?[0-9.Ee+]+)").r.findFirstMatchIn(txt).map(_.group(1))
      .flatMap(v => try Some(v.toDouble) catch { case _: Throwable => None })
      .getOrElse(0.0)

  private[graft] def parseRecord(txt: String): Option[PriorRecord] =
    // sf may contain jsonStr-escaped quotes/backslashes — span them
    // and unescape, so an escaped path round-trips (prior-baseline sf
    // matching silently failed on exactly those inputs before)
    """"sf":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(txt)
      .map(m => unJsonStr(m.group(1))).map { sf =>
      PriorRecord(sf, parseRecordMap(txt, "min2"), parseRecordMap(txt, "min2_norm"),
        parseRecordHist(txt, "norm_hist"), parseRecordNums(txt, "cores_hist"),
        parseRecordNum(txt, "baseline_cores"), parseRecordMap(txt, "norm_floor"))
    }

  /** Queries under this wall time get the tighter contention-credit
    * cap (and the re-mint floor): the parallel probe is a ~10-40 ms
    * workload, so on a query of comparable scale its stretch is
    * sampling noise, not a contention measurement — extrapolating it
    * minted the r18/r19 false-floor class (q14 0.153 vs raw 0.239,
    * t72 0.727 vs raw 1.283: ~the 0.5 cap claimed in one lucky
    * moment, then frozen by the min ratchet and flagged against
    * every ordinary session after). */
  private[graft] val SmallQuerySec = 2.0
  private[graft] val SmallQueryCreditFloor = 0.8
  /** The documented healthy re-mint window (startup check + floor
    * release): at ≥25 of 32 effective cores a session's minima are
    * trustworthy baselines again. */
  private[graft] val HealthyCores = 25.0

  /** Parallel-probe normalization factor, CAPPED at a 2× correction:
    * t_norm = t × max(floor, best/probe). Uncapped, a ~4× probe
    * outlier (committed records show them) scales a genuinely-
    * regressed query under the 3× rerun threshold, letting its
    * inflated first run enter the record unchecked — the cap bounds
    * how much contention credit any single measurement can claim.
    * The floor is 0.5 for real queries and [[SmallQueryCreditFloor]]
    * (0.8, i.e. ≤20% credit) for sub-[[SmallQuerySec]] walls, whose
    * probe-scale noise otherwise mints false norm floors (r18
    * verdict item 1's "probe-overhead-aware normalization"). */
  private[graft] def normFactor(best: Double, probe: Double,
      wallSec: Double = Double.MaxValue): Double = {
    val floor = if (wallSec < SmallQuerySec) SmallQueryCreditFloor else 0.5
    if (probe <= 0 || best <= 0) 1.0 else math.max(floor, best / probe)
  }

  /** Heal already-poisoned stored norm baselines to the invariant the
    * wall-aware [[normFactor]] now maintains: a sub-2s query's
    * normalized time is never below 0.8 × its wall time, so
    * min-of-norms ≥ 0.8 × min-of-walls — any stored norm below
    * 0.8 × the merged raw min2 was minted by the uncapped credit and
    * is raised to that bound. Queries ≥ 2 s are untouched (their 0.5
    * cap stands). */
  private[graft] def healSmallNorms(norm: Map[String, Double],
      rawMin2: Map[String, Double]): Map[String, Double] =
    norm.map { case (k, v) =>
      k -> rawMin2.get(k).filter(_ < SmallQuerySec)
        .fold(v)(r => math.max(v, SmallQueryCreditFloor * r))
    }

  /** MERGE-don't-overwrite baseline update — the r12 defect: a full
    * bench run inside a contended window unconditionally rewrote
    * BENCH_FULL.json, replacing the healthy per-query baseline with
    * inflated times (d57's recorded min2 went 1.45 → 7.48 s), which
    * de-sensitized the >3× regression-rerun trigger by up to 5× for
    * exactly the queries most likely to regress. Since host contention
    * only ever INFLATES a timing, per-query min(prior, session) keeps
    * the healthy baseline through a garbage window while still letting
    * a genuinely faster session lower it. Session keys drive the
    * output (a renamed/removed query's stale prior is dropped);
    * queries that FAILED this session contribute their prior only (a
    * time-until-crash "timing" must never become the baseline). */
  private[graft] def mergeBaseline(prior: Map[String, Double],
      session: Map[String, Double], failed: Set[String]): Map[String, Double] =
    session.flatMap { case (k, v) =>
      if (failed.contains(k)) prior.get(k).map(k -> _)
      else Some(k -> prior.get(k).fold(v)(p => math.min(p, v)))
    }

  /** Per-query session-norm history window (r13 verdict item 1): the
    * merged min2/min2_norm baselines are a one-way MIN ratchet, so a
    * permanent 1.5-3× slowdown never surfaces there — it hides in the
    * `_session` fields round after round, indistinguishable from
    * contention, and nothing accumulates the evidence. The record
    * therefore carries `norm_hist`: the last ≤`keep` session-normalized
    * min2s per query (newest LAST), appended each session a query
    * actually PASSED (a failed query's time-until-crash is not a
    * measurement and would poison the window). Session keys drive the
    * output — a removed/renamed query's stale history is dropped. */
  private[graft] def updateHistory(prior: Map[String, Seq[Double]],
      session: Map[String, Double], failed: Set[String],
      keep: Int = 3): Map[String, Seq[Double]] =
    session.flatMap { case (k, v) =>
      if (failed.contains(k)) prior.get(k).map(k -> _)
      else Some(k -> (prior.getOrElse(k, Seq.empty) :+ v).takeRight(keep))
    }

  /** The persistent-elevation flag: a query is `suspect` when its last
    * TWO recorded session norms (this session and the previous one)
    * BOTH exceed `factor`× the merged normalized baseline. One
    * contended session cannot flag (a single elevated entry is
    * contention until corroborated); a genuine improvement clears (the
    * newest healthy entry breaks the run). This is the channel that
    * catches real regressions the min ratchet can never show.
    *
    * Queries that FAILED this session are excluded: updateHistory
    * freezes a failed query's window, so its "last two" entries are
    * stale pre-failure sessions — flagging on them would keep
    * re-reporting old data every session the query fails, and the
    * failure itself is already loudly recorded in `failed`. */
  /** Effective-cores scaling for the suspect threshold (r15 verdict
    * item 3): three consecutive sessions at 15.8-17.5 of 32 effective
    * cores manufactured a rotating false-flag class — the 2×-capped
    * normFactor leaves a 1.5-2.0× residual on scan-saturating shapes
    * when a throttled session is measured against baselines minted in
    * ≥20-core windows, and every such flag cost an adjudication cycle.
    * Each history entry's threshold is therefore scaled by that
    * session's core deficit vs the healthiest baseline-minting era:
    * scale = clamp(baselineCores / sessionCores, 1, 2) — capped at 2×
    * to mirror normFactor (a real regression plus throttle shows >3×
    * and still flags; a genuine 1.5× slowdown inside a throttle era
    * surfaces the next healthy session, when its entry stays elevated
    * at scale 1). */
  private[graft] def coresScale(baselineCores: Double, sessionCores: Double): Double =
    if (baselineCores <= 0 || sessionCores <= 0) 1.0
    else math.min(2.0, math.max(1.0, baselineCores / sessionCores))

  /** Contention-normalized baseline RE-MINT (r17 verdict item 2, the
    * host-never-recovers path): six consecutive sessions ran at
    * 13.3-18.3 of 32 effective cores against norm baselines minted in
    * the 19.9-core era, which parks the suspect detector's floor at
    * ~3× (factor 1.5 × the 2×-clamped cores/ambient scale) — real
    * 1.5-2.5× regressions are invisible for as long as the throttle
    * lasts. When the deficit is SUSTAINED (the whole recorded
    * cores_hist window, i.e. ≥3 sessions, each >5% below the
    * baseline-minting era — the observed throttle runs 19.9 → 13.3-
    * 18.3, i.e. 8-33%), the norm baselines are re-minted INTO the
    * current era: each is scaled by the session's observed ambient
    * lift (the median of session_norm/baseline over all non-failed
    * queries — the same estimator the suspect channel trusts; the
    * contention penalty is SUPER-linear in the core deficit, so the
    * deficit is the qualifying EVIDENCE while the lift is the
    * MEASUREMENT — a 10% core deficit has carried a 1.4× lift), and
    * `baseline_cores` is reset to this session's measurement so the
    * cores/ambient channels read ~1.0 from here on. The suspect
    * threshold is back to ~1.5× at the NEXT session.
    *
    * Why this is safe: (a) a median over the whole catalogue cannot
    * be dragged by the regressions it exists to expose; (b) the raw
    * `min2` ratchet — the judge's round-over-round yardstick — is
    * NOT touched; (c) the re-mint is idempotent (after one, the
    * median lift is ~1.0, below the engage threshold); (d) a later
    * HEALTHY session pulls every re-minted value back down through
    * the ordinary min-merge and raises baseline_cores via max(), so
    * nothing persists past the era that justified it. */
  private[graft] def sustainedDeficit(coresHist: Seq[Double],
      baselineCores: Double): Boolean =
    coresHist.size >= 3 &&
      coresHist.takeRight(3).forall(c => coresScale(baselineCores, c) > 1.05)

  /** The observed ambient lift of this session vs the stored norm
    * baselines: median over non-failed queries of session/baseline.
    * Fewer than 8 aligned samples is not an estimate (the suspects()
    * rule); clamped to [1, 3] — a re-mint never LOWERS a baseline
    * (that is the min-ratchet's job) and never credits more than the
    * worst plausible contention. */
  private[graft] def remintLift(prior: Map[String, Double],
      session: Map[String, Double], failed: Set[String],
      maxLift: Double = 3.0): Double = {
    val ratios = session.collect { case (k, v)
      if !failed.contains(k) && prior.get(k).exists(_ > 0) =>
      v / prior(k) }.toSeq.sorted
    if (ratios.size < 8) 1.0
    else math.min(maxLift, math.max(1.0, ratios((ratios.size - 1) / 2)))
  }

  /** Evidence bound on the re-mint lift (r18 advice, medium): a >5%
    * sustained deficit alone must not license inflating every norm
    * baseline up to the 3× clamp — a genuine catalogue-wide
    * regression landing during a MILD throttle would be absorbed as
    * ambient and persist until a healthy session. Lifts above 1.5×
    * require the deficit itself to exceed 15% (the contention penalty
    * is super-linear: the observed 10% deficit carried a 1.4× lift,
    * inside the 1.5 allowance; the r18 engage was ×1.315 at a ~38%
    * deficit, far inside the 3× tier). */
  private[graft] def remintMaxLift(baselineCores: Double,
      coresHist: Seq[Double]): Double = {
    val med = coresHist.sorted.drop((coresHist.size - 1) / 2).headOption
    val deficit = med.map(c =>
      if (c > 0 && baselineCores > 0) baselineCores / c else 1.0).getOrElse(1.0)
    if (deficit > 1.15) 3.0 else 1.5
  }

  /** The persisted sub-2s re-mint FLOOR (r18 verdict item 1): after a
    * re-mint lifts the norm baselines into the current era, the
    * ordinary min-merge could re-establish an over-normalized false
    * minimum one lucky probe moment later — the exact cycle that made
    * q14/q39/t71/t72/d40 need per-round adjudications. The re-mint
    * therefore records each sub-[[SmallQuerySec]] query's re-minted
    * value as its floor; [[floorNorms]] keeps the merged norm baseline
    * at or above it. A HEALTHY (≥[[HealthyCores]]) session clears the
    * floors: at era parity with healthy minting, low minima are
    * trustworthy again and the ordinary ratchet resumes. */
  private[graft] def mintFloors(reminted: Map[String, Double],
      rawMin2: Map[String, Double]): Map[String, Double] =
    // sub-2s classification is by WALL time (the raw min2 ratchet),
    // consistent with normFactor/healSmallNorms — classifying by the
    // norm value would floor a 3.9s-wall query whose 0.5-capped norm
    // sits at 1.95, disabling the min ratchet for a class the floor
    // was never meant to touch
    reminted.filter { case (k, v) =>
      v > 0 && rawMin2.get(k).exists(_ < SmallQuerySec) }

  private[graft] def floorNorms(norm: Map[String, Double],
      floor: Map[String, Double]): Map[String, Double] =
    norm.map { case (k, v) => k -> math.max(v, floor.getOrElse(k, 0.0)) }

  /** `coresHist` pairs positionally with each query's last history
    * entries (both newest-last, appended once per session); a query
    * whose window froze on a failed session can pair an entry with a
    * neighbouring session's cores — bounded by the 2× scale cap, and
    * such queries are exempt while failing anyway. Empty coresHist
    * (pre-r16 records) degrades to the unscaled threshold. */
  private[graft] def suspects(hist: Map[String, Seq[Double]],
      baseline: Map[String, Double], failed: Set[String] = Set.empty,
      factor: Double = 1.5, coresHist: Seq[Double] = Seq.empty,
      baselineCores: Double = 0.0): Seq[String] = {
    val scales2 = {
      val last2 = coresHist.takeRight(2)
      val padded = Seq.fill(2 - last2.size)(0.0) ++ last2
      padded.map(coresScale(baselineCores, _))
    }
    // ambient-elevation channel (r16: the cores ratio alone
    // under-corrects — the contention penalty is SUPER-linear in the
    // core deficit, so a 19.9→18.2-core session still showed a
    // uniform ~1.3× median lift that manufactured 11 false flags):
    // per aligned position, the MEDIAN of session_norm/baseline over
    // all non-failed queries is the observed ambient lift — a
    // throttle raises everything, a regression raises an OUTLIER.
    // Clamped to [1, 2] like coresScale/normFactor, and GATED on
    // corroborating contention evidence (r16 advice): the channel
    // only engages when that position's coresScale shows a core
    // deficit (> 1). In a full-cores healthy session a uniform
    // 1.6-2.9× lift is therefore a FLEET-WIDE REAL regression and
    // flags (previously it self-certified as ambient); the remaining
    // blind spot is honest and bounded — during a genuine core
    // deficit a uniform real slowdown can ride the ambient estimate
    // up to its 2× clamp, so there it flags only above factor·2 = 3×.
    // The threshold uses max(cores, ambient) per gated position —
    // whichever estimator explains more of the lift. A median over
    // fewer than 8 queries is not an ambient estimate (1-2 samples
    // ARE the candidate outliers), so small populations fall back to
    // the cores channel alone.
    val ambient2 = (0 until 2).map { i =>
      val els = hist.collect { case (k, h)
        if !failed.contains(k) && h.size >= 2 &&
          baseline.get(k).exists(_ > 0) =>
        h.takeRight(2)(i) / baseline(k) }.toSeq.sorted
      if (els.size < 8) 1.0
      else math.min(2.0, math.max(1.0, els((els.size - 1) / 2)))
    }
    val eff2 = scales2.zip(ambient2).map { case (c, a) =>
      if (c > 1.0) math.max(c, a) else c }
    hist.collect { case (k, h) if !failed.contains(k) && h.size >= 2 &&
      baseline.get(k).exists(b => b > 0 &&
        h.takeRight(2).zip(eff2).forall { case (t, s) => t > factor * s * b }) =>
      k }.toSeq.sorted
  }

  /** JSON string literal with `\` and `"` (and control chars) escaped —
    * shared by both record emitters. Interpolating a raw sf path or
    * query name would yield an unparseable record line the moment one
    * carried a quote or backslash. */
  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Inverse of [[jsonStr]]'s escaping (r15 advice: the emitters
    * escaped but the parsers never unescaped — an sf path carrying a
    * quote or backslash wrote a valid record whose read-back sf was
    * still escaped, silently failing the prior-baseline sf match for
    * exactly the inputs jsonStr was added to handle). */
  private[graft] def unJsonStr(s: String): String = {
    val b = new StringBuilder(s.length); var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case '"'  => b += '"'; i += 2
        case '\\' => b += '\\'; i += 2
        case 'u' if i + 6 <= s.length =>
          b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
        case _ => b += c; i += 1
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** JSON key emitter for query names: the flat-split parsers
    * (parseRecordMap/List/Hist) are exact only for names free of
    * quote/backslash/control chars, so emit FAILS LOUDLY on one
    * instead of writing a record those parsers would silently
    * truncate. Query names are code-defined identifiers — a special
    * char in one is a bug, not data. Free-form strings (sf paths) use
    * [[jsonStr]] + [[unJsonStr]], which round-trip fully. */
  private[graft] def jsonKey(s: String): String = {
    require(s.forall(c => c != '"' && c != '\\' && c >= ' '),
      s"query name contains a char the record parsers cannot round-trip: $s")
    jsonStr(s)
  }

  /** The SHORT trailing summary record (r13 verdict item 2/4): the
    * driver keeps only a ~2000-char tail of stdout, and the full
    * record line is ~100 KB — every BENCH_rN.json carried an
    * unparseable fragment. Printed AFTER the full line so any tail
    * window captures parseable totals. `total_min2` is the best-known-
    * across-sessions merged baseline (the min ratchet); round-over-
    * round slowdown comparisons must use `total_min2_session`.
    *
    * The suspect array is CAPPED at `maxSuspect` names (the full list
    * lives in the full record line) with the true count in
    * `n_suspect` — a mass-flagging round must not grow the summary
    * past the 2000-char tail the record exists to fit. The cap is 24
    * (r15 verdict item 6: at 6, `n_suspect: 8` with 6 names hid the
    * two names adjudication needed — 24 names × ~30 chars still fits
    * the tail with headroom, and a >24 flagging round additionally
    * emits an explicit `"suspect_truncated":true` so the summary can
    * never silently disagree with the full record on membership). */
  private[graft] def summaryJson(total: Double, totalMin2: Double,
      totalMin2Session: Double, effectiveCores: Double, nFailed: Int,
      suspect: Seq[String], sf: String, maxSuspect: Int = 24): String = {
    val sorted = suspect.sorted
    val s = sorted.take(maxSuspect).map(jsonKey).mkString("[", ",", "]")
    val trunc = if (sorted.size > maxSuspect) """"suspect_truncated":true,""" else ""
    s"""{"metric":"summary","total":$total,"total_min2":$totalMin2,"total_min2_session":$totalMin2Session,"effective_cores":$effectiveCores,"n_failed":$nFailed,"n_suspect":${sorted.size},$trunc"suspect":$s,"sf":${jsonStr(sf)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // harness opt-in for the nanos-generation events parquet (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // execution-time DPP even when exchange reuse misses under AQE
      // (the r18 q76 finding — see TestSpark / Scale.q76DppPrune)
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      // r20 I/O configs (guide §6; measured on the s71-s76 layout
      // lifecycle, OPTIMIZATION_r20.md): (a) list up to 1024 partition
      // dirs on the driver instead of launching a distributed listing
      // JOB per layout read (Spark's threshold of 32 is tuned for
      // object stores; the lifecycle re-lists its 100-256 cell dirs
      // 3-8× per query — 0.5-1.5 s of listing jobs each); production
      // object-store deployments should keep the default or use a
      // manifest table format. (b) committer v2: task commits rename
      // straight into the destination — halves the commit renames on
      // every partitioned write (the standard HDFS-era setting; local
      // fs rename is atomic, and every graft write lands in a
      // run-nonce-scoped dir, so concurrent-writer caveats don't
      // apply).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // r21 engine config (guide §1.2 step 3, declared in
      // OPTIMIZATION_r21.md): the default 100-entry whole-stage-
      // codegen class cache thrashes on a 208-query catalogue — a
      // single wide query (q86: ~155 generated classes) exceeds it
      // alone, so the top-8 rerun leg recompiled essentially every
      // class (measured: q86 rerun 107 recompiles / 4.7 s of Janino
      // at 100 entries vs 24 / 0.7 s at 5000) and cross-query shared
      // scan stages never hit. Capacity-bounded JVM infrastructure
      // (compiled classes keyed on normalized source), NOT result
      // caching: every run still computes from parquet. A production
      // session serving hundreds of distinct plans wants the same.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up actions so the first measured queries don't
    // absorb JVM/codegen/scan-index startup (~5s) — measurement
    // hygiene only, identical output contract. Warm-ups run at
    // sf0.001 (never the bench scale factor) and touch the four scan
    // families: relational joins (entry), text kernels, embeddings,
    // events.
    try {
      SparkEntry.entry(spark).count()
      SparkEntry.queries("t63_fingerprint")(spark, "/root/testdata/sf0.001").count()
      SparkEntry.queries("d48_minhash_agg")(spark, "/root/testdata/sf0.001").count()
      SparkEntry.queries("s51_knn_ivf")(spark, "/root/testdata/sf0.001").count()
      // events family: nanos-timestamp read path + JSON-path and
      // timestamp-parse JIT (the enforce/window queries' hot kernels)
      SparkEntry.queries("q30_enforce_ok")(spark, "/root/testdata/sf0.001").count()
    } catch { case _: Throwable => () }
    // failures must be VISIBLE: a silently-swallowed exception records
    // time-until-crash as an ordinary timing, and a whole-catalogue
    // regression would read as a performance win
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // per-query health probes (see probeMs / parProbeMs); run-1 and
    // rerun samples are recorded separately so each timing has ITS
    // OWN health tag — in both the single-thread and the parallel
    // (multi-core contention) dimension
    val nCpus = cpus.toInt
    val probes1 = scala.collection.mutable.LinkedHashMap[String, Double]()
    val probes2 = scala.collection.mutable.LinkedHashMap[String, Double]()
    val parProbes1 = scala.collection.mutable.LinkedHashMap[String, Double]()
    val parProbes2 = scala.collection.mutable.LinkedHashMap[String, Double]()
    spinSink ^= probeMs().toLong; spinSink ^= probeMs().toLong // JIT warm-up
    spinSink ^= parProbeMs(nCpus).toLong // JIT + thread-pool warm-up
    // r16 verdict item 2: automate the healthy-window check AT STARTUP
    // — a ≥25-effective-core session is the baseline re-mint window
    // four consecutive throttled sessions (15.8-18.2 of 32) never
    // offered. Flag it loudly so the session's recorded run is known
    // to refresh the baselines (the min2 ratchet, norm_hist and cores
    // history re-mint automatically on any recorded run; what was
    // missing was noticing the window while still inside it).
    val startupCores = effectiveCores(nCpus)
    System.err.println(
      if (startupCores >= 25)
        f"[bench] startup effective cores $startupCores%.1f of $nCpus — HEALTHY re-mint window: this recorded run refreshes min2/norm baselines and cores history"
      else
        f"[bench] startup effective cores $startupCores%.1f of $nCpus — throttled window (re-mint threshold 25)")
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        probeSink: scala.collection.mutable.LinkedHashMap[String, Double],
        parSink: scala.collection.mutable.LinkedHashMap[String, Double]): Double = {
      // isolation: several operators pin intra-query frames (their
      // scaladoc cache contract); across 100+ queries in ONE session
      // the accumulated MEMORY_AND_DISK copies crowd the 8g heap and
      // the later heavy queries pay eviction + GC instead of compute.
      // Clearing BETWEEN queries keeps each measurement self-contained.
      // releaseAll drops the library's pins INCLUDING loop-operator
      // checkpoint blocks (which clearCache cannot reach); clearCache
      // additionally resets the engine-layer caches (SchemaRegistry,
      // Normalize file lists) — bench owns this session, so the
      // session-wide hammer is fine HERE, unlike inside operators.
      Caches.releaseAll()
      spark.catalog.clearCache()
      probeSink(name) = probeMs()
      parSink(name) = parProbeMs(nCpus)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        if (!failed.contains(name)) failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Dev-only subset filter (SPARK_GRAFT_ONLY=d57,t76); driver never
    // sets it — full-catalogue numbers are the only recorded ones.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val catalogue = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = catalogue.map { case (name, fn) =>
      name -> timeOne(name, fn, probes1, parProbes1) }
    // host-throttle robustness: a SECOND run (min2 = min of the two)
    // for (a) the 8 slowest first runs and (b) any query whose first
    // run regressed >3x against the PREVIOUS session's recorded min2 —
    // (b) exists because a throttle window landing on a mid-pack query
    // (r8: q74 0.6 s -> 4.5 s, outside the top set) otherwise enters
    // the record unchecked; (a) widened 5 → 8 after g05 escaped at
    // 6th-slowest in r9. The 0.5 s floor keeps noise-level jitter
    // (0.05 -> 0.16 s is "3x" but meaningless) from triggering reruns.
    // the baseline is only comparable at the SAME scale factor — a
    // record from another sf would mass-trigger spurious reruns
    // (every query ">3x" its smaller-scale min2)
    val prior: Option[PriorRecord] = (try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BENCH_FULL.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      parseRecord(txt)
    } catch { case _: Throwable => None }).filter(_.sf == sfDir)
    // the trigger's prior is the NORMALIZED merged baseline when the
    // record carries one (r13+); older records' min2 is raw but the
    // only surviving pre-r13 record is the restored healthy-window one,
    // where raw ≈ normalized
    val priorMin2: Map[String, Double] = prior.map { p =>
      if (p.min2Norm.nonEmpty) p.min2Norm else p.min2
    }.getOrElse(Map.empty)
    // regression detection runs on PARALLEL-health-NORMALIZED times:
    // t_norm = t1 × par_best/par_ms[name]. The r11 round proved the
    // single-thread probe certifies garbage windows as healthy (d70
    // recorded 9.86 s, real 1.45 s, probe ~5.4 ms throughout) — the
    // dominant throttle mode is multi-core contention, which only the
    // parallel spin sees. Normalizing stops an ambient-throttle window
    // from mass-triggering reruns (48 in r11) that are equally garbage
    // when re-measured inside the same window. par_best is the
    // session's fastest parallel probe — the best within-session
    // healthy-host yardstick (cross-session normalization stays the
    // judge's job, from the recorded par fields).
    val parBest1 =
      if (parProbes1.isEmpty) 0.0 else parProbes1.values.min
    // normalization factor capped at 2× (see normFactor) — an
    // uncapped ~4× probe outlier could scale a real regression under
    // the 3× threshold
    def normalized(name: String, t: Double): Double =
      parProbes1.get(name)
        .map(p => t * normFactor(parBest1, p, t)).getOrElse(t)
    val top8 = results.sortBy { case (n, t) => -normalized(n, t) }
      .take(8).map(_._1).toSet
    val regressed = results.collect {
      case (name, t1) if t1 > 0.5 &&
        priorMin2.get(name).exists(p => normalized(name, t1) > 3 * p) => name
    }.toSet
    val rerun = top8 ++ regressed
    // raw second-run times are kept: the session's normalized best
    // (min2_norm below) needs each run paired with ITS OWN probe
    val t2s = scala.collection.mutable.Map[String, Double]()
    val min2 = results.map { case (name, t1) =>
      if (rerun.contains(name)) {
        val t2 = timeOne(name, SparkEntry.queries(name), probes2, parProbes2)
        t2s(name) = t2
        name -> math.min(t1, t2)
      } else name -> t1
    }
    val parProbeBest =
      if (parProbes1.isEmpty && parProbes2.isEmpty) 0.0
      else (parProbes1.values ++ parProbes2.values).min
    // the session's normalized best per query: each run corrected by
    // ITS OWN parallel probe (capped), then min across runs — the
    // within-session healthy-window estimate of the query's true time
    val sessionNorm: Map[String, Double] = results.map { case (name, t1) =>
      val c1 = t1 * normFactor(parProbeBest, parProbes1.getOrElse(name, 0.0), t1)
      val c2 = t2s.get(name).map(t2 =>
        t2 * normFactor(parProbeBest, parProbes2.getOrElse(name, 0.0), t2))
      name -> c2.fold(c1)(math.min(c1, _))
    }.toMap
    // merged baselines (see mergeBaseline): `min2` and `min2_norm` in
    // the PERSISTED record are best-known-across-sessions per query —
    // the regression trigger's prior and the round-over-round yardstick
    // — while `min2_session`/`total_min2_session` keep this session's
    // honest measurement alongside
    val sessionMin2 = min2.toMap
    val mergedMin2 = mergeBaseline(
      prior.map(_.min2).getOrElse(Map.empty), sessionMin2, failed.toSet)
    // contention-normalized RE-MINT (see sustainedDeficit/remintLift):
    // under a sustained multi-session core deficit the stored norm
    // baselines move INTO the current era before the merge, so the
    // suspect detector's threshold returns to ~1.5× instead of the
    // 2×-clamp floor. Ordering matters: the deficit test reads the
    // PRE-re-mint baseline_cores (the era the baselines came from).
    val healthyEraCores = 19.9
    val coresHistPrior = prior.map(_.coresHist).getOrElse(Seq.empty)
    val health = effectiveCores(cpus.toInt)
    val coresHist = (coresHistPrior :+ health).takeRight(3)
    val priorBaselineCores = math.max(health,
      prior.map(_.baselineCores).filter(_ > 0).getOrElse(healthyEraCores))
    val lift =
      if (sustainedDeficit(coresHist, priorBaselineCores))
        remintLift(priorMin2, sessionNorm, failed.toSet,
          remintMaxLift(priorBaselineCores, coresHist))
      else 1.0
    val reminted = lift > 1.05 // noise-level medians don't move baselines
    val normPrior =
      if (reminted) priorMin2.map { case (k, v) => k -> v * lift }
      else priorMin2
    if (reminted) System.err.println(
      f"[bench] sustained core deficit (cores_hist ${coresHist.map(c => f"$c%.1f").mkString("/")} vs baseline era $priorBaselineCores%.1f) — re-minting norm baselines x$lift%.3f into the current era; baseline_cores := $health%.1f, suspect threshold returns to ~1.5x")
    // sub-2s floor lifecycle (see mintFloors/floorNorms): a healthy
    // session clears the floors, a re-mint mints fresh ones from the
    // re-minted values, otherwise the prior floors carry (session
    // keys drive, like every other persisted map)
    val normFloor: Map[String, Double] =
      if (health >= HealthyCores) Map.empty
      else if (reminted) mintFloors(normPrior, mergedMin2)
      else prior.map(_.normFloor).getOrElse(Map.empty)
        .filter { case (k, _) => sessionNorm.contains(k) }
    // priorMin2 IS the normalized prior (min2_norm preferred, min2
    // fallback) — one selection rule, used by both the trigger above
    // and this merge. The merge is floored at the last re-mint's
    // sub-2s values and healed to the wall-aware credit bound
    // (norm ≥ 0.8 × raw for sub-2s queries).
    val mergedNorm = healSmallNorms(
      floorNorms(mergeBaseline(normPrior, sessionNorm, failed.toSet), normFloor),
      mergedMin2)
    // persistent-elevation detection (see updateHistory/suspects): the
    // session-norm window accumulates across rounds in the record
    // itself; two consecutive elevated sessions flag, one does not
    val normHist = updateHistory(
      prior.map(_.normHist).getOrElse(Map.empty), sessionNorm, failed.toSet)
    // name-sorted key order: stable, diffable across rounds
    def mapJson(m: Iterable[(String, Double)]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => jsonKey(k) + ":" + v }
        .mkString("{", ",", "}")
    val qs = mapJson(results)
    val m2 = mapJson(mergedMin2)
    val m2Session = mapJson(min2)
    val m2Norm = mapJson(mergedNorm)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalMin2 = if (mergedMin2.nonEmpty) mergedMin2.values.sum else 0.0
    val totalMin2Session = if (min2.nonEmpty) min2.map(_._2).sum else 0.0
    val failedJson = failed.sorted.map(jsonKey).mkString("[", ",", "]")
    // regression-triggered reruns are recorded so a round's NOTES can
    // say whether a spike was throttle (second run recovered) or real
    val rerunJson = regressed.toSeq.sorted.map(jsonKey)
      .mkString("[", ",", "]")
    // session effective-cores history (global, last ≤3, newest last —
    // pairs positionally with each query's norm_hist window) and the
    // running max across recorded sessions: the suspect threshold for
    // each history entry scales by that session's core deficit vs the
    // baseline-minting era (see coresScale). Records predating the
    // field seed baseline_cores from the documented healthy-era
    // figure (NOTES r9 close: the 19.9-effective-core session that
    // minted the bulk of the min ratchet). A RE-MINT resets the era
    // to this session's cores — the re-minted baselines ARE
    // current-era values now, so measuring future deficits against
    // the retired 19.9-core era would double-correct.
    val baselineCores = if (reminted) health else priorBaselineCores
    val suspect = suspects(normHist, mergedNorm, failed.toSet,
      coresHist = coresHist, baselineCores = baselineCores)
    // per-query health record: probe wall-ms per measured run, plus
    // the session's best (fastest) probe — the healthy-host yardstick.
    // t_normalized = t * probe_best / probe_ms[name].
    def probeJson(m: scala.collection.mutable.LinkedHashMap[String, Double]) =
      m.map { case (k, v) => jsonKey(k) + ":" + v }.mkString("{", ",", "}")
    val probeBest =
      if (probes1.isEmpty && probes2.isEmpty) 0.0
      else (probes1.values ++ probes2.values).min
    val histJson = normHist.toSeq.sortBy(_._1).map { case (k, vs) =>
      jsonKey(k) + ":" + vs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val suspectJson = suspect.map(jsonKey).mkString("[", ",", "]")
    val coresHistJson = coresHist.mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min2":$m2,"min2_session":$m2Session,"min2_norm":$m2Norm,"norm_floor":${mapJson(normFloor)},"norm_hist":$histJson,"suspect":$suspectJson,"cores_hist":$coresHistJson,"baseline_cores":$baselineCores,"total_min2":$totalMin2,"total_min2_session":$totalMin2Session,"failed":$failedJson,"rerun_regressed":$rerunJson,"effective_cores":$health,"probe_best_ms":$probeBest,"probe_ms":${probeJson(probes1)},"probe_ms_rerun":${probeJson(probes2)},"par_probe_best_ms":$parProbeBest,"par_probe_ms":${probeJson(parProbes1)},"par_probe_ms_rerun":${probeJson(parProbes2)},"sf":${jsonStr(sfDir)}}"""
    println(line)
    // the short summary tail — printed LAST so the driver's 2000-char
    // stdout tail always captures a parseable record (see summaryJson)
    val summary = summaryJson(total, totalMin2, totalMin2Session, health,
      failed.size, suspect, sfDir)
    println(summary)
    // stdout tails get truncated in driver logs (r4 lost 41 of 104
    // per-query timings) — persist the full line for round-over-round
    // diffing. Subset (SPARK_GRAFT_ONLY) dev probes must NOT overwrite
    // it: the file is the prior-min2 baseline the regression-rerun
    // logic reads, and a 2-query probe would erase the full record.
    // the summary line is persisted too (full record first — parsers
    // take the FIRST match of each field, so the scalar-only summary
    // can never shadow the maps)
    if (only.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n" + summary + "\n")
      catch { case _: Throwable => () }
    spark.stop()
  }
}
