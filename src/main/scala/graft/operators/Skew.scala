package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting.
  *
  * A hot join key (one customer with 10⁸ orders) lands its entire
  * volume on one reduce task. Salting splits the hot side's rows into
  * `saltFactor` sub-keys (deterministic hash of a row-unique column,
  * NOT rand() — reproducibility matters in an oracle-checked engine)
  * and replicates the other side once per salt value, so the hot key's
  * work spreads over `saltFactor` tasks.
  *
  * This is the manual fallback; AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) does the same split at runtime when
  * statistics reveal the skew, and should be preferred when post-
  * shuffle partition stats are trustworthy. The operator exists for
  * plans AQE can't rebalance (e.g. skew inside aggregations feeding
  * the join, or deterministic test environments).
  */
object Skew {

  /** Inner equi-join of `big ⋈ small` on `key`, with `big`'s rows
    * salted by hashing `rowTag` (any column unique-ish per row) and
    * `small` replicated across all salt values. Result is exactly the
    * unsalted join's rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowTag: Column, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("graft_salt", pmod(hash(rowTag), lit(saltFactor)))
    val replicated = small
      .withColumn("graft_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "graft_salt"), "inner")
      .drop("graft_salt")
  }

  /** ONE-PASS key-distribution profile across candidate shuffle keys —
    * the diagnostic that decides `saltedJoin`/`saltedAgg`/AQE-skew
    * settings before a 100 TB job runs. For each key column: row
    * count, distinct-key count, the hottest key's row count, the skew
    * factor (hottest ÷ average — 1.0 is perfectly uniform; the number
    * of salt buckets a salted plan needs is roughly this), and the
    * hottest key itself (smallest such key on ties, so the output is
    * deterministic).
    *
    * All columns are profiled in ONE scan + ONE shuffle via GROUPING
    * SETS ((k1),(k2),…): the map side expands each row once per key
    * with partial aggregation bounding the exchange to distinct
    * (column, value) pairs; the second aggregate runs over that
    * already-tiny distribution frame. Profiling n columns by n
    * separate groupBys would scan the corpus n times. */
  def profile(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "profile needs at least one key column")
    Seq("graft_cnt", "graft_gid", "graft_k", "column_name").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val n = keys.length
    // Column API with literal-name resolution (Profile's convention):
    // backtick-quote so a key name containing dots/backticks is data,
    // never a nested-field path or parsed expression text
    def ref(c: String) = col("`" + c.replace("`", "``") + "`")
    val counts = df
      .select(keys.map(k => ref(k).cast("string").as(k)): _*)
      .groupingSets(keys.map(k => Seq(ref(k))), keys.map(ref): _*)
      .agg(count(lit(1)).as("graft_cnt"), grouping_id().as("graft_gid"))
    // grouping_id bit convention: leftmost grouping column = highest
    // bit, bit SET = column NOT in the set → the set grouping only
    // keys(i) has every bit set except bit (n-1-i)
    def gidOf(i: Int): Long = ((1L << n) - 1) & ~(1L << (n - 1 - i))
    val nameCol = coalesce(keys.zipWithIndex.map { case (k, i) =>
      when(col("graft_gid") === gidOf(i), lit(k)) }: _*)
    // a null key VALUE stays null here (its when-branch yields null),
    // which is correct: the null group still counts toward n_keys and
    // can even be the hot key (reported as null)
    val valCol = coalesce(keys.zipWithIndex.map { case (k, i) =>
      when(col("graft_gid") === gidOf(i), ref(k)) }: _*)
    counts
      .select(nameCol.as("column_name"), valCol.as("graft_k"), col("graft_cnt"))
      .groupBy(col("column_name"))
      .agg(
        sum(col("graft_cnt")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_keys"),
        max(col("graft_cnt")).cast("long").as("max_key_rows"),
        min(struct((-col("graft_cnt")).as("nc"), col("graft_k").as("k")))
          .as("graft_hot"))
      .select(col("column_name"), col("n_rows"), col("n_keys"),
        col("max_key_rows"),
        (col("max_key_rows").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_factor"),
        col("graft_hot.k").as("hot_key"))
  }

  /** Two-stage skew-safe aggregation: count/sum grouped by a LOW-
    * cardinality (hence skewed) key first pre-aggregates by
    * (key, salt) — spreading each hot key over `saltFactor` reduce
    * tasks — then combines the bounded partials by key. Correct for
    * any commutative-associative aggregate pair; exact here because
    * counts are BIGINTs and sums ride DECIMAL (float re-association
    * would NOT be hash-stable). Map-side partial aggregation already
    * bounds the first shuffle; the salt bounds the REDUCE side, which
    * partials alone cannot (a single hot key still lands one task).
    * The aggregate twin of `saltedJoin`.
    *
    * `value` sums in ITS OWN type: under ANSI mode a BIGINT sum whose
    * per-key total can pass 2⁶³ throws engine-side — callers summing
    * unbounded magnitudes should pass `value.cast("decimal(38,0)")`
    * (the r14 integer-overflow sweep rule; counts and token/byte
    * totals are corpus-bounded ≲10¹⁴ and safe as BIGINT). */
  def saltedAgg(df: DataFrame, key: Column, value: Column, rowTag: Column,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be positive, got $saltFactor")
    df.withColumn("graft_salt", pmod(hash(rowTag), lit(saltFactor)))
      .groupBy(key.as("graft_key"), col("graft_salt"))
      .agg(count(lit(1)).as("graft_n"), sum(value).as("graft_s"))
      .groupBy(col("graft_key"))
      .agg(sum(col("graft_n")).as("n"), sum(col("graft_s")).as("total"))
  }

  /** Per-key CAP — keep at most `k` rows per key, first by `ord` —
    * that a hot key cannot funnel into one window task. The naive cap
    * (row_number over PARTITION BY key) sends a mega-key's ENTIRE
    * volume to one task; here stage 1 ranks within (key, salt) and
    * keeps each sub-key's first k — bounding the corpus-scale window's
    * partitions to ~hotRows/saltFactor — and stage 2 re-ranks only the
    * ≤ k·saltFactor survivors per key. A key's global first-k is
    * contained in the union of its per-salt first-ks, so the output
    * rows are EXACTLY the naive cap's (OperatorsSpec proves set
    * equality under a 50 %-one-host fixture).
    *
    * `ord` must be row-unique for a deterministic cap (the t96 rule:
    * hash-then-id, e.g. `Seq(pmod(hash(id), P), id)`); `rowTag` seeds
    * the salt (any row-unique column — NOT rand(), reproducibility).
    * With `key = Urls.hostKey(url)` this is the per-site cap a crawl
    * curation pass runs — the Urls scaladoc's 100 TB recipe,
    * executable. The cap twin of `saltedJoin`/`saltedAgg`.
    *
    * Plan note (t100's audit): Spark 4 plans row_number caps as
    * WindowGroupLimit with a map-side Partial pass, so even the naive
    * cap only SHUFFLES ≤ k rows per (key, input partition). What the
    * partial pass cannot bound is the REDUCE side: a mega-key still
    * lands ~k·numInputPartitions rows in ONE task for the final
    * limit+window — the salt spreads exactly that over `saltFactor`
    * tasks. Both stages here get the Partial treatment too (the
    * whole operator is four WindowGroupLimits, two per stage). */
  def saltedCap(df: DataFrame, key: Column, ord: Seq[Column], k: Int,
      rowTag: Column, saltFactor: Int): DataFrame = {
    require(k >= 1, s"cap k must be positive, got $k")
    require(saltFactor >= 1, s"saltFactor must be positive, got $saltFactor")
    require(ord.nonEmpty, "saltedCap needs at least one ordering column")
    Seq("graft_salt", "graft_capkey", "graft_rn").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val w1 = Window.partitionBy(col("graft_capkey"), col("graft_salt"))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col("graft_capkey")).orderBy(ord: _*)
    df.withColumn("graft_capkey", key)
      .withColumn("graft_salt", pmod(hash(rowTag), lit(saltFactor)))
      .withColumn("graft_rn", row_number().over(w1))
      .filter(col("graft_rn") <= k)
      .drop("graft_salt")
      .withColumn("graft_rn", row_number().over(w2))
      .filter(col("graft_rn") <= k)
      .drop("graft_rn", "graft_capkey")
  }
}
