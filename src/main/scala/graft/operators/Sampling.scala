package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextHash.polyHashFast

/** Deterministic sampling operators. `df.sample()` is seeded per
  * partition-split and NOT reproducible across partitionings — useless
  * for an oracle-checked engine and dangerous at 100 TB where a
  * re-run must select the same rows. Both operators here are pure
  * functions of row VALUES.
  */
object Sampling {

  /** Hash-Bernoulli sample: keep rows whose portable hash of `key`
    * lands below `pct` of the hash space. Deterministic, stable under
    * repartitioning/re-runs, and independently computable by any
    * engine with the same hash (the DuckDB oracle uses the emitted
    * twin formula). Sampling unit = the key, so all rows of one key
    * stay in or out together (choose the row id as key for row-level
    * sampling). NULL keys are dropped at every pct (hash of null is
    * null, which passes no comparison — the same on both engines, so
    * the oracle twin agrees); callers for whom null-keyed rows matter
    * route them explicitly, as in `split`. */
  def hashBernoulli(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0, 100], got $pct")
    df.filter(pmod(polyHashFast(key.cast("string")), lit(100)) < pct)
  }

  /** Systematic (every k-th) sample per stratum under a total order —
    * the classic stratified design: deterministic, and each stratum is
    * represented proportionally. One shuffle on the stratum key.
    *
    * Scale note: the per-stratum row_number needs a per-stratum sort,
    * so parallelism is bounded by the stratum count (a 3-stratum
    * corpus sorts on 3 tasks no matter the cluster). At 100 TB prefer
    * `hashBernoulli` (embarrassingly parallel, no order) unless the
    * design truly requires systematic spacing — then range-partition
    * within strata and offset ranks per range. */
  def systematic(df: DataFrame, strata: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(!df.columns.contains("graft_rn"),
      "input already has a column named graft_rn")
    val w = Window.partitionBy(strata: _*).orderBy(order: _*)
    df.withColumn("graft_rn", row_number().over(w))
      .filter((col("graft_rn") - 1) % k === 0)
      .drop("graft_rn")
  }

  /** Deterministic train/val/test split: each KEY maps to exactly one
    * split by its hash bucket in [0, 100) against the cumulative
    * weight cut points. Assignment is a pure function of the key —
    * stable under repartitioning, re-runs, and engines — and every row
    * of one key lands in the same split, so multi-row entities
    * (a user's events, a document's chunks) can never leak across the
    * train/test boundary. Proportions hold in expectation over the
    * hash space; exact-count splits need a rank, which is a sort —
    * the hash form is the 100 TB default. Adds column `out` with the
    * split name.
    *
    * NULL keys: the hash of null is null, which would fall through
    * every bucket branch into a null split — a row in NO split,
    * violating the exactly-one contract. They are instead routed
    * deterministically to the FIRST split: all null-key rows form one
    * "entity" and stay on one side of the boundary together. Callers
    * who consider a null key a data error should assert upstream
    * (e.g. Enforce's row split). */
  def split(df: DataFrame, key: Column, weights: Seq[(String, Int)],
      out: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      s"split weights must total 100, got ${weights.map(_._2).sum}")
    require(weights.forall(_._2 > 0),
      s"split weights must be positive, got: $weights")
    require(!df.columns.contains(out), s"input already has a column named $out")
    require(!df.columns.contains("graft_bucket"),
      "input already has a column named graft_bucket")
    val cuts = weights.map(_._2).scanLeft(0)(_ + _).tail // cumulative upper bounds
    // the bucket hash is STAGED as its own projection: the CASE chain
    // references it once per cut, and an inlined expression would hash
    // the key |weights| times per row (non-cheap multi-referenced
    // aliases survive CollapseProject)
    val bucket = col("graft_bucket")
    val assign = weights.map(_._1).zip(cuts)
    val labeled = assign.tail.foldLeft(
      when(bucket < assign.head._2, lit(assign.head._1))) {
      case (acc, (name, cut)) => acc.when(bucket < cut, lit(name))
    }
    df.withColumn("graft_bucket", pmod(polyHashFast(key.cast("string")), lit(100)))
      .withColumn(out,
        when(key.isNull, lit(weights.head._1)).otherwise(labeled))
      .drop("graft_bucket")
  }

  /** Stratified hash-Bernoulli sample: per-stratum keep-percentages
    * (the deterministic analog of `DataFrameStatFunctions.sampleBy`,
    * which is seeded and partitioning-dependent). The rate table rides
    * as a broadcast join — no shuffle of the fact side, embarrassingly
    * parallel, reproducible across re-runs and engines. Strata absent
    * from `rates` are dropped (rate 0), matching sampleBy — and that
    * includes rows whose stratum is NULL: the inner rate join can
    * never match them (null never equals a rate key), so a null
    * stratum is an explicit rate-0 case, not a silent anomaly. Rates
    * outside [0, 100] would silently mean drop-all/keep-all — rejected
    * up front. */
  def stratifiedHash(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 100),
      s"rates must be percentages in [0, 100], got: " +
        rates.filterNot { case (_, p) => p >= 0 && p <= 100 }.mkString(", "))
    // a caller column with a helper's name would be silently replaced
    // then dropped (graft_stratum) or make the rate reference
    // ambiguous (graft_pct)
    Seq("graft_stratum", "graft_pct").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("graft_stratum", "graft_pct")
    df.withColumn("graft_stratum", stratum)
      .join(broadcast(rateDf), Seq("graft_stratum"))
      .filter(pmod(polyHashFast(key.cast("string")), lit(100)) < col("graft_pct"))
      .drop("graft_stratum", "graft_pct")
  }

  /** Temperature-weighted per-source token budgeting — the
    * multilingual/multi-source sampling rule (α = 0.5: allocation ∝
    * √tokens, the mT5/XLM-R compromise that upsamples small sources
    * without flattening the mixture): each source gets
    * `budget · √c_s / Σ√c_t` tokens and admits docs in DETERMINISTIC
    * hash order until its allocation is exhausted (strict prefix —
    * the doc that would cross the line is excluded, t67's rule).
    *
    * Exactness: weights are floor(√c) on BIGINT counts — IEEE sqrt is
    * correctly rounded (unlike log/pow, which never appear in
    * compared values), so both engines compute identical integer
    * weights; allocation is integer division; admission is an
    * integer running total per source. Scale shape: one tiny
    * per-source aggregate broadcasts back; the admission window is
    * source-partitioned (never global).
    *
    * Input: (doc_id, source, n_tokens). Output: (source, doc_id,
    * n_tokens, cum_tokens, alloc). */
  def temperatureBudget(df: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import graft.operators.TextHash.{A, B, P}
    val weights = df.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("c"))
      .withColumn("w", floor(sqrt(col("c").cast("double"))).cast("long"))
    val wsum = weights.agg(sum(col("w")).as("ws"))
    // ws = 0 (every source all-zero-token — valid, degenerate input)
    // must not reach the division: under ANSI mode (this engine's
    // default) integral div-by-zero THROWS where DuckDB's // yields
    // NULL — the r13 division-by-zero sweep's one live finding. With
    // alloc 0 both engines admit exactly the zero-token docs (they
    // consume nothing), same as the ws > 0 path already did.
    // budget·w runs in DECIMAL(38,0): both factors are BIGINTs of
    // unbounded product (w ≤ √corpusTokens ~ 3×10⁹; a trillion-token
    // budget puts budget·w past 2⁶³, and ANSI long multiplication
    // THROWS on overflow — the r14 integer-overflow sweep's one live
    // intermediate-overflow finding). The QUOTIENT is ≤ budget by
    // construction (w ≤ ws), so the final BIGINT cast can never
    // overflow — classic in-range-result/out-of-range-intermediate.
    val alloc = weights.crossJoin(broadcast(wsum))
      .select(col("source"),
        expr(s"CAST(CASE WHEN ws > 0 THEN (CAST($budget AS DECIMAL(38,0)) * w) div ws ELSE 0 END AS BIGINT)")
          .as("alloc"))
    val rankKey = (col("doc_id") * lit(A(2)) + lit(B(2))) % lit(P)
    val w = Window.partitionBy(col("source"))
      .orderBy(rankKey, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(alloc), Seq("source"))
      .filter(col("cum_tokens") <= col("alloc"))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"), col("alloc"))
  }
}
