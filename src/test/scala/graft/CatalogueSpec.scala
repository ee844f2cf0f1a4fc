package graft

import graft.engine.Paths
import org.apache.spark.sql.functions._

/** Driver-contract integrity + smoke over sf0.001. */
class CatalogueSpec extends SparkSpec {
  import spark.implicits._

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("catalogue names are unique and oracle keys are a subset") {
    val names = SparkEntry.catalogue.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
      // contract boundary: done with this query's results. Also keeps
      // later suites honest — the session is JVM-shared, and a pin
      // left materialized here would rewrite plans other suites audit.
      graft.Caches.releaseAll()
    }
  }

  test("extractPk matches the reference semantics incl. unknown fallback") {
    val df = Seq(
      "api/season_2023/league_39/teams/run_1.json",
      "api/season_2022/league_153/standings/run_2.json",
      "api/malformed/run.json").toDF("path")
    val pks = df.select(Paths.extractPk(col("path"))).as[String].collect().toSeq
    assert(pks == Seq("2023-39", "2022-153", "unknown"))
  }

  test("d45 fast-kernel LSH banding recovers the verified near-dup pairs") {
    // d45 is oracle-hash-gated since round 10 (portable base-131
    // family) — this test is the SECOND, semantic check: candidates
    // generated from the fast-kernel signatures must recover the
    // truth set produced by the default-kernel nearDuplicates (LSH +
    // exact-Jaccard verify). Banding recall at J≥0.8 with 4 bands ×
    // 2 rows is
    // ≥ 1−(1−0.8²)⁴ ≈ 0.983 per pair; the corpus and both hash
    // kernels are deterministic, so the measured recall is stable —
    // 1.0 today, asserted with headroom for corpus regeneration.
    import graft.operators.Dedup
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val truth = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), threshold = 0.8)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "truth set empty — corpus has no near-dups")
    val sig = Dedup.minhashSignaturesFast(docs, col("doc_id"), col("text"))
    val cand = Dedup.candidatePairs(Dedup.bucketsFromSignatures(sig, k = 8, bands = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(cand).toDouble / truth.size
    assert(recall >= 0.9,
      s"fast-kernel banding recall $recall over ${truth.size} verified pairs")
    graft.Caches.releaseAll()
  }

  test("q36 approx sketches land within error bounds of the exact values") {
    // q36 is now fully oracle-hash-matched (portable HLL + exact
    // rational-rank median) — this test checks the SEMANTIC quality of
    // the sketch, not portability: the raw 64-register HLL estimate
    // must land within 3σ of the exact distinct count (rsd = 1.04/√64
    // = 13%, 3σ = 39%), and the percentile_disc median must sit
    // between the exact 40th and 60th percentiles.
    val rows = SparkEntry.queries("q36_approx_sketches")(spark, sfDir).collect()
    val approx = rows.map(r => r.getString(0) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val exact = graft.engine.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, array(0.4, 0.6))").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (estParts, exactParts, median)) =>
      val (eParts, p) = exact(flag)
      assert(exactParts == eParts,
        s"$flag: q36's own exact_parts $exactParts vs recomputed $eParts")
      assert(math.abs(estParts - eParts) / eParts <= 0.39,
        s"$flag: HLL estimate $estParts vs exact $eParts")
      assert(median >= p.head && median <= p.last,
        s"$flag: median $median outside [${p.head}, ${p.last}]")
    }
  }

  test("t98 rolling HLL merge: estimates track the exact trailing distinct within 3 sigma") {
    // the merged-register estimate per window must land within 3σ of
    // the exact trailing distinct (rsd = 1.04/√64 = 13%, 3σ = 39%) —
    // the semantic gate on the MERGE step (a register-alignment bug
    // blows the error far past this), complementing the oracle's
    // bit-level portability gate. The fixture's windows must be dense
    // (≥ 2.5·m = 160 distinct): below that the UNCORRECTED estimator
    // floors at ~α·m (the small-range regime whose linear-counting
    // correction needs ln() and is deliberately absent — t90's
    // no-libm rule), so this runs on a synthetic dense frame, not the
    // sparse test-scale events table (which the oracle gate covers).
    import spark.implicits._
    val n = 4000
    // buckets 0..4, bucket b holds users [b*1000, b*1000 + n): heavy
    // overlap, so trailing-3 windows differ from single buckets
    val rows = (0 until 5).flatMap { b =>
      (0 until n).map(u => (b.toLong * 3600L * 1000000L, b * 1000L + u))
    }
    val df = rows.toDF("us", "user_id")
      .select(org.apache.spark.sql.functions.expr("timestamp_micros(us)").as("ts"),
        col("user_id"))
    val out = graft.operators.Sketches
      .rollingHllDistinct(df, col("ts"), col("user_id"), bucketSec = 3600L)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out.keySet == (0L to 4L).toSet)
    // exact trailing distinct: window b covers buckets max(0,b-2)..b,
    // whose union is [max(0,b-2)*1000, b*1000 + n)
    (0L to 4L).foreach { b =>
      val lo = math.max(0L, b - 2) * 1000L
      val expected = b * 1000L + n - lo
      val (est, exact) = out(b)
      assert(exact == expected, s"window $b exact $exact vs $expected")
      assert(math.abs(est - exact) / exact <= 0.39,
        s"window $b: merged estimate $est vs exact $exact")
    }
    graft.Caches.releaseAll()
  }

  test("t99 rolling median sample: estimate's true rank sits in the middle half of each window") {
    // the oracle gate proves bit-determinism; this gates SEMANTIC
    // quality — a 64-row uniform sample's lower median lands between
    // the window's true 25th and 75th percentiles with overwhelming
    // probability (P[outside] < 1e-4 per window by Chernoff), so a
    // membership bug (non-uniform hash, wrong merge) shows up as a
    // rank excursion. Dense synthetic frame: 5 hourly buckets x 3000
    // rows with bucket-shifted value ranges, so window medians move.
    import spark.implicits._
    val n = 3000
    val rows = (0 until 5).flatMap { b =>
      (0 until n).map { i =>
        (b.toLong * 3600L * 1000000L + i, // unique row key
          b.toLong * 3600L * 1000000L,
          (b * 500 + i % 2000) * 0.01) // cents in [b*500, b*500+2000)
      }
    }
    val df = rows.toDF("event_id", "us", "value")
      .select(col("event_id"),
        org.apache.spark.sql.functions.expr("timestamp_micros(us)").as("ts"),
        col("value"))
    val out = graft.operators.Sketches.rollingMedianSample(
        df, col("ts"), col("event_id"), col("value"), bucketSec = 3600L)
      .collect()
    assert(out.length == 5)
    val byBucket = rows.groupBy(_._2 / 3600000000L)
      .map { case (b, rs) => b -> rs.map(r => math.round(r._3 * 100)).sorted }
    out.foreach { r =>
      val b = r.getLong(0)
      val winVals = (math.max(0L, b - 2) to b)
        .flatMap(m => byBucket.getOrElse(m, Nil)).sorted
      assert(r.getLong(1) == winVals.length, s"window $b n_rows")
      assert(r.getLong(2) == 64L, s"window $b sample_k")
      val est = r.getLong(3)
      val rank = winVals.count(_ < est).toDouble / winVals.length
      assert(rank >= 0.25 && rank <= 0.75,
        s"window $b: estimate $est at rank $rank")
      // exact leg agrees with the locally recomputed lower median
      assert(r.getLong(4) == winVals((winVals.length + 1) / 2 - 1),
        s"window $b exact median")
    }
    graft.Caches.releaseAll()
  }

  test("rollingMedianSample ignores null key/ts/value rows (the countDistinct null rule)") {
    // a null key hashes to null h, which Spark orders FIRST and DuckDB
    // orders LAST — unfiltered it would crowd the sample on one engine
    // only; the operator drops nulls like SQL median does
    import spark.implicits._
    val clean = (0 until 200).map { i =>
      (Some(i.toLong), Some(0L), Some(i * 0.01))
    }
    val dirty = clean ++ Seq(
      (None, Some(0L), Some(9.99)),              // null key
      (Some(900L), None, Some(9.99)),            // null ts
      (Some(901L), Some(0L), Option.empty[Double])) // null value
    def run(rows: Seq[(Option[Long], Option[Long], Option[Double])]) =
      graft.operators.Sketches.rollingMedianSample(
          rows.toDF("event_id", "us", "value")
            .select(col("event_id"),
              org.apache.spark.sql.functions.expr("timestamp_micros(us)").as("ts"),
              col("value")),
          col("ts"), col("event_id"), col("value"), bucketSec = 3600L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(run(dirty) == run(clean))
    graft.Caches.releaseAll()
  }
}
