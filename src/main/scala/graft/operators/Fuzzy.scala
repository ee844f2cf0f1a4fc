package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching at scale.
  *
  * A within-block pairwise `levenshtein(a, b) ≤ 1` is quadratic in
  * the block, and the threshold DP form barely helps on corpora whose
  * names share a long constant prefix (the DP stays inside the
  * threshold band through the shared prefix — measured: 13 s naive,
  * 7.8 s threshold DP on 4.5M pairs). The scalable form generates
  * candidates by SYMMETRIC DELETION (FastSS / SymSpell): each name
  * emits its identity plus every single-character-deletion variant
  * (L+1 keys for a length-L name, hashed to 64 bits). Two names are
  * within Levenshtein distance 1 IFF their variant sets intersect:
  *  - equal names share the identity variant;
  *  - a substitution at position i makes both i-deletions equal;
  *  - an insertion/deletion pair makes the longer side's i-deletion
  *    equal to the shorter side's identity.
  * Conversely a shared variant only bounds the distance by 2, so every
  * candidate pair still pays the threshold-1 DP — but candidates are
  * EXACT-recall (no pigeonhole band can silently drop a pair; the
  * previous prefix/suffix banding missed ins/del pairs whose edit fell
  * in the tail, because a per-string-length prefix cut can never match
  * across different lengths).
  *
  * Scale shape: the only shuffle is the (block, variant-hash)
  * equi-join; the explode is a map-side L+1 row multiplier with
  * near-unique keys (a deletion variant collides only for genuine
  * near-dups or 64-bit hash accidents, both filtered by the verify
  * DP). Candidate dedup is a DISTINCT over the candidate pairs —
  * bounded by the (sparse) near-dup pair count, not the corpus.
  */
object Fuzzy {

  /** Identity + all single-deletion variants of `gname`, as 64-bit
    * hashes. Slot i < length deletes the 0-based i-th char; the last
    * slot is the identity. array_distinct: deleting any char of a
    * same-char run yields the same variant (id-style names have long
    * zero runs) — deduping at the source keeps the join free of
    * run² duplicate candidate rows. */
  private val variantHashes =
    expr("""array_distinct(transform(sequence(0, length(gname)),
           |  i -> xxhash64(if(i = length(gname), gname,
           |                   concat(left(gname, i), substring(gname, i + 2))))))""".stripMargin)

  /** (a, b, dist): id pairs (a < b) within `blockCols` blocks at
    * Levenshtein distance ≤ 1. */
  def nearNamePairs(df: DataFrame, id: Column, name: Column,
      blockCols: Seq[String]): DataFrame = {
    val base = df.select(blockCols.map(col) :+ id.as("gid") :+ name.as("gname"): _*)
      .withColumn("graft_vh", explode(variantHashes))
    // fully renamed sides: self-join disambiguation by construction
    def side(tag: String) = base.select(
      blockCols.map(c => col(c).as(s"${tag}_$c")) ++ Seq(
        col("gid").as(s"${tag}k"), col("gname").as(s"${tag}n"),
        col("graft_vh").as(s"${tag}v")): _*)
    val a = side("a")
    val b = side("b")
    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, blockEq && col("av") === col("bv") && col("ak") < col("bk"))
      .select(blockCols.map(c => col(s"a_$c")) ++ Seq(
        col("ak"), col("an"), col("bk"), col("bn")): _*)
      .distinct()
      .withColumn("dist", levenshtein(col("an"), col("bn"), 1))
      .filter(col("dist") >= 0)
      .select(blockCols.map(c => col(s"a_$c").as(c)) ++ Seq(
        col("ak").as("a"), col("bk").as("b"),
        col("dist").cast("long").as("dist")): _*)
  }
}
