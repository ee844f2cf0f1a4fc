package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.BloomMightContain

/** Bloom-filter join pruning: the probe (fact) side is pre-filtered by
  * a bloom sketch of the build (dim) side's join keys, so rows that
  * cannot match never reach the join's shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~selectivity fraction that can join: the
  * sketch is a few MB regardless of fact size, rides to executors like
  * a broadcast build side, and false positives (tunable via `fpp`)
  * only cost wasted probe work — the subsequent exact join keeps the
  * result identical to the unpruned plan (which is what the oracle
  * checks). Spark's AQE injects the same shape automatically
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) when statistics
  * reveal a selective build side; this operator is the deterministic,
  * plannable form.
  */
object BloomPrune {

  /** Exact inner equi-join with bloom pre-pruning of `fact` (long
    * keys). `expectedDimKeys` sizes the sketch; keep `fpp` small
    * enough that surviving false positives don't re-inflate the
    * shuffle. */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    // an EMPTY build side legitimately reaches here at corpus scale
    // (a filtered dim can drop every row — the r15 empty-corpus sweep
    // class): Spark's bloom aggregate yields a null-bit-buffer sketch
    // over zero rows and mightContainLong NPEs on it. Inner-join
    // semantics make the degenerate answer exact and free — no build
    // rows, no joined rows. The isEmpty probe is a limit-1 job on the
    // SMALL side, next to the full dim aggregation one line below.
    if (dim.isEmpty)
      return fact.limit(0).join(dim, factKey === dimKey, "inner")
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    fact.filter(BloomMightContain.mightContain(bloom, factKey))
      .join(dim, factKey === dimKey, "inner")
  }
}
