package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Two-stage skew-safe aggregation: count/sum grouped by a LOW-
    * cardinality (hence skewed) key first pre-aggregates by
    * (key, salt) — spreading each hot key over `saltFactor` reduce
    * tasks — then combines the bounded partials by key. Correct for
    * any commutative-associative aggregate pair; exact here because
    * counts are BIGINTs and sums ride DECIMAL (float re-association
    * would NOT be hash-stable). Map-side partial aggregation already
    * bounds the first shuffle; the salt bounds the REDUCE side, which
    * partials alone cannot (a single hot key still lands one task).
    * The aggregate twin of `saltedJoin`. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, rowTag: Column,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be positive, got $saltFactor")
    df.withColumn("graft_salt", pmod(hash(rowTag), lit(saltFactor)))
      .groupBy(key.as("graft_key"), col("graft_salt"))
      .agg(count(lit(1)).as("graft_n"), sum(value).as("graft_s"))
      .groupBy(col("graft_key"))
      .agg(sum(col("graft_n")).as("n"), sum(col("graft_s")).as("total"))
  }
}
