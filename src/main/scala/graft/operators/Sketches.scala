package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch algebra over time buckets — the 100 TB idiom where
  * per-partition/per-period sketches are STORED and windows are
  * answered by merging sketches, never by rescanning raw data.
  */
object Sketches {

  /** P = 1e9+7 — the portable hash modulus (TextHash.P). */
  private val P: Long = TextHash.P

  /** t90's generated first-one-bit CASE over the 24-bit window
    * w = h div 64: rho = 1-based position of the first 1-bit, 25 when
    * w = 0. One SQL text shared verbatim by the Spark leg and the
    * DuckDB oracle so the register construction cannot drift. */
  val RhoCaseSql: String = (0 until 24)
    .map(k => s"WHEN w >= ${1L << (23 - k)} THEN ${k + 1}")
    .mkString("CASE ", " ", " ELSE 25 END")

  /** q36's double-squaring integer mix over P for BIGINT keys, as SQL
    * over a non-negative `k` < P: h1 = (k² + 12345) mod P,
    * h = (h1² + k) mod P. Nonlinearity is load-bearing (an affine hash
    * maps sequential keys to degenerate leading-zero statistics); all
    * operands < 2³⁰ so products fit int64 on every engine. q36 itself
    * predates this constant and states the SAME formula as staged h0/
    * h1 CTEs (value-identical, text-staged) — any change here must
    * change q36's staging too, and vice versa. */
  def bigintMixSql(k: String): String =
    s"(((($k * $k + 12345) % $P) * (($k * $k + 12345) % $P) + $k) % $P)"

  /** ROLLING DISTINCT-COUNT via HLL register merge: per time bucket,
    * the distinct-`key` estimate over the trailing `windowBuckets`
    * buckets — computed by MERGING the per-bucket 64-register sketches
    * (register-wise max), not by rescanning raw rows per window. This
    * is the mergeability property that makes sketches the scalable
    * windowed-distinct answer: the raw corpus is scanned ONCE into
    * bucket sketches (64 rows per bucket — the stored partial), and
    * every window is a max-merge over W·64 tiny rows. The naive
    * windowed `count(distinct)` re-shuffles the raw (bucket, key)
    * universe per window; at 100 TB the sketch path's window cost is
    * independent of cardinality.
    *
    * The window is materialized by REPLICATION, not a range join: each
    * bucket's sketch rows fan out to the ≤ W window anchors they serve
    * (`explode` of [b, b+1, …]), then an equi-aggregation per anchor —
    * a range/between join would plan a nested-loop over
    * buckets × sketch rows. Anchors are restricted to OBSERVED buckets
    * (the spine), so trailing-edge phantom windows don't appear.
    *
    * Estimator and portability: exactly t90's — portable polynomial /
    * double-squaring hash, 64 registers, generated first-one-bit CASE,
    * 2^-rho as 1/(1<<rho) (every term a power of two ⇒ the register
    * sum is EXACT in binary FP in any order), raw alpha·m²/s with no
    * ln()-based corrections. The exact trailing distinct count rides
    * along for calibration (same replication shape over the distinct
    * (bucket, key) frame — production drops it; it costs the
    * cardinality-proportional shuffle the sketch path avoids).
    *
    * Output: (bucket, n_regs, est_raw, n_exact) per observed bucket,
    * windows anchored at bucket covering [bucket−W+1, bucket]. */
  def rollingHllDistinct(df: DataFrame, ts: Column, key: Column,
      bucketSec: Long, windowBuckets: Int = 3): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    require(windowBuckets >= 1,
      s"windowBuckets must be >= 1, got $windowBuckets")
    val bucketUs = bucketSec * 1000000L
    // floor division (exact for all signs — the q85/resample rule).
    // Null keys/timestamps are dropped UP FRONT: a null key would
    // survive pmod/mix as a null register group (n_regs up to 65, so
    // the (64 − n_regs) estimator term goes negative), and a null ts
    // has no bucket; both legs must ignore nulls exactly like
    // countDistinct does.
    val base = df.select(ts.as("graft_ts"), key.as("graft_key"))
      .filter(col("graft_ts").isNotNull && col("graft_key").isNotNull)
      .select(
        expr(s"(unix_micros(graft_ts) - pmod(unix_micros(graft_ts), ${bucketUs}L))" +
          s" div ${bucketUs}L").as("bucket"),
        col("graft_key"))
      .transform(d => graft.Caches.pin(d))
    val hashed = base
      .select(col("bucket"), pmod(col("graft_key").cast("long"), lit(P)).as("k"))
      .select(col("bucket"), expr(bigintMixSql("k")).as("h"))
      .select(col("bucket"), pmod(col("h"), lit(64L)).as("reg"),
        expr("h div 64").as("w"))
      .select(col("bucket"), col("reg"), expr(RhoCaseSql).as("rho"))
    // the stored partial: 64 rows per bucket
    val regsB = hashed.groupBy(col("bucket"), col("reg"))
      .agg(max(col("rho")).as("max_rho"))
      .transform(d => graft.Caches.pin(d))
    val spine = regsB.select(col("bucket").as("win")).distinct()
      .transform(d => graft.Caches.pin(d))
    val anchors = sequence(col("bucket"),
      col("bucket") + lit(windowBuckets.toLong - 1))
    // sketch-merge leg: replicate each bucket sketch to its anchors,
    // register-wise max per anchor, then the t90 estimator
    val merged = regsB
      .select(explode(anchors).as("win"), col("reg"), col("max_rho"))
      .join(spine, Seq("win"), "left_semi")
      .groupBy(col("win"), col("reg"))
      .agg(max(col("max_rho")).as("max_rho"))
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), max_rho)"))
          .as("s_present"))
      .select(col("win").as("bucket"), col("n_regs"),
        (lit(0.709) * lit(4096.0) /
          (col("s_present") + (lit(64) - col("n_regs")))).as("est_raw"))
    // exact calibration leg: same replication over distinct (bucket, key)
    val du = base.distinct()
    val exact = du
      .select(explode(anchors).as("win"), col("graft_key"))
      .join(spine, Seq("win"), "left_semi")
      .groupBy(col("win"))
      .agg(countDistinct(col("graft_key")).as("n_exact"))
      .select(col("win").as("bucket"), col("n_exact"))
    merged.join(exact, "bucket")
  }

  /** ROLLING MEDIAN via mergeable BOTTOM-K row samples: per time
    * bucket, keep the k rows with the SMALLEST hash of their unique
    * row key — then any window's merged sample (union of member
    * sketches, re-take bottom k) is EXACTLY the bottom-k of the
    * window's own rows, because every one of the window's k smallest
    * hashes is necessarily within its bucket's k smallest. That is
    * the bottom-k/KMV mergeability property applied to ROW SAMPLING:
    * the merged sketch is a true uniform k-sample of the window
    * (hash order is independent of the value), so any quantile reads
    * off it — and the merge never rescans raw rows, the t98 cost
    * model with values attached.
    *
    * Everything is deterministic and cross-engine exact: the sample
    * membership is pure integer hashing (bigintMixSql of the row
    * key), the estimate is the LOWER MEDIAN of the sample's values
    * ((n+1) div 2 over (value, hash) order — q84's rule), and the
    * exact window median rides along for calibration (it pays the
    * cardinality-proportional window sort the sketch path avoids —
    * production drops it). Window materialization is t98's bounded
    * replication, never a range join.
    *
    * Output per observed bucket (window = trailing `windowBuckets`):
    * (bucket, n_rows, sample_k, est_median_cents, exact_median_cents)
    * — values as exact integer cents (the t80/q72 rule). */
  def rollingMedianSample(df: DataFrame, ts: Column, key: Column,
      value: Column, bucketSec: Long, k: Int = 64,
      windowBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    require(k >= 1 && windowBuckets >= 1,
      s"k and windowBuckets must be positive, got $k/$windowBuckets")
    val bucketUs = bucketSec * 1000000L
    // nulls are ignored exactly like SQL median ignores null values
    // (and like rollingHllDistinct's countDistinct rule): a null key
    // hashes to a null h that Spark orders FIRST and DuckDB orders
    // LAST, so an unfiltered null would crowd the sample on one engine
    // only — a silent cross-engine divergence, not just noise
    val base = df.select(ts.as("graft_ts"), key.as("graft_key"), value.as("graft_v"))
      .filter(col("graft_ts").isNotNull && col("graft_key").isNotNull &&
        col("graft_v").isNotNull)
      .select(
        expr(s"(unix_micros(graft_ts) - pmod(unix_micros(graft_ts), ${bucketUs}L))" +
          s" div ${bucketUs}L").as("bucket"),
        pmod(col("graft_key").cast("long"), lit(P)).as("k0"),
        round(col("graft_v").cast("double") * lit(100)).cast("long").as("cents"))
      .select(col("bucket"), expr(bigintMixSql("k0")).as("h"), col("k0"), col("cents"))
      .transform(d => graft.Caches.pin(d))
    val anchors = sequence(col("bucket"),
      col("bucket") + lit(windowBuckets.toLong - 1))
    val spine = base.select(col("bucket").as("win")).distinct()
      .transform(d => graft.Caches.pin(d))
    // the stored partial: bottom-k rows per bucket by (h, k0)
    val perBucket = Window.partitionBy(col("bucket")).orderBy(col("h"), col("k0"))
    val sampB = base.withColumn("rk", row_number().over(perBucket))
      .filter(col("rk") <= k)
      .select(col("bucket"), col("h"), col("k0"), col("cents"))
    // merge: replicate to anchors, re-take bottom k per window — the
    // result IS the window's true bottom-k (mergeability, see above)
    val perWin = Window.partitionBy(col("win")).orderBy(col("h"), col("k0"))
    val sampW = sampB.select(explode(anchors).as("win"), col("h"), col("k0"), col("cents"))
      .join(spine, Seq("win"), "left_semi")
      .withColumn("rk", row_number().over(perWin))
      .filter(col("rk") <= k)
      .transform(d => graft.Caches.pin(d))
    val byValue = Window.partitionBy(col("win")).orderBy(col("cents"), col("h"), col("k0"))
    val est = sampW
      .withColumn("vr", row_number().over(byValue))
      .withColumn("sn", count(lit(1)).over(Window.partitionBy(col("win"))))
      .filter(col("vr") === expr("(sn + 1) div 2"))
      .select(col("win").as("bucket"), col("sn").as("sample_k"),
        col("cents").as("est_median_cents"))
    // exact calibration leg: full replication + one window sort —
    // the cardinality-proportional cost the sketch path avoids
    val allW = base.select(explode(anchors).as("win"), col("h"), col("k0"), col("cents"))
      .join(spine, Seq("win"), "left_semi")
    val byValueAll = Window.partitionBy(col("win")).orderBy(col("cents"), col("h"), col("k0"))
    val exact = allW
      .withColumn("vr", row_number().over(byValueAll))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("win"))))
      .filter(col("vr") === expr("(n + 1) div 2"))
      .select(col("win").as("bucket"), col("n").as("n_rows"),
        col("cents").as("exact_median_cents"))
    exact.join(est, "bucket")
      .select(col("bucket"), col("n_rows"), col("sample_k"),
        col("est_median_cents"), col("exact_median_cents"))
  }
}
