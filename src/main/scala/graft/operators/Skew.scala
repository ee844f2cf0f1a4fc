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
}
