package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching at scale.
  *
  * A within-block pairwise `levenshtein(a, b) ≤ 1` is quadratic in
  * the block, and the threshold DP form barely helps on corpora whose
  * names share a long constant prefix (the DP stays inside the
  * threshold band through the shared prefix — measured: 13 s naive,
  * 7.8 s threshold DP on 4.5M pairs). The scalable form bands
  * candidates by PIGEONHOLE, the same recall argument as the SimHash
  * bit-slice join, adapted to edits: one edit (substitution,
  * insertion or deletion) touches one position, so for a pair within
  * distance 1 EITHER the prefixes up to `len−tailLen` are equal, OR
  * the last `tailLen` characters COUNTED FROM THE END are equal (an
  * edit earlier in the string shifts positions, but the final
  * characters, aligned from the end, are untouched). Candidates are
  * therefore two equi-joins — (block, prefix) and (block, suffix) —
  * and only candidates pay the threshold DP. The suffix join excludes
  * prefix-equal pairs (first-matching-band dedup, no DISTINCT).
  *
  * Choose `tailLen` so BOTH bands discriminate: on id-styled names
  * ("Customer#000000042") the entropy sits in the final digits, so a
  * small tail splits it across both bands. Degenerate bands only cost
  * work, never correctness.
  */
object Fuzzy {

  /** (a, b, dist): id pairs (a < b) within `blockCols` blocks at
    * Levenshtein distance ≤ 1. */
  def nearNamePairs(df: DataFrame, id: Column, name: Column,
      blockCols: Seq[String], tailLen: Int = 3): DataFrame = {
    require(tailLen >= 1, s"tailLen must be positive, got $tailLen")
    val base = df.select(blockCols.map(col) :+ id.as("gid") :+ name.as("gname"): _*)
      .withColumn("graft_pre",
        expr(s"left(gname, greatest(length(gname) - $tailLen, 0))"))
      .withColumn("graft_suf", expr(s"right(gname, $tailLen)"))
    // fully renamed sides: self-join disambiguation by construction
    def side(tag: String) = base.select(
      blockCols.map(c => col(c).as(s"${tag}_$c")) ++ Seq(
        col("gid").as(s"${tag}k"), col("gname").as(s"${tag}n"),
        col("graft_pre").as(s"${tag}p"), col("graft_suf").as(s"${tag}s")): _*)
    val a = side("a")
    val b = side("b")
    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val c1 = a.join(b, blockEq && col("ap") === col("bp") && col("ak") < col("bk"))
    val c2 = a.join(b, blockEq && col("as") === col("bs") && col("ap") =!= col("bp") &&
      col("ak") < col("bk"))
    c1.unionByName(c2)
      .withColumn("dist", levenshtein(col("an"), col("bn"), 1))
      .filter(col("dist") >= 0)
      .select(blockCols.map(c => col(s"a_$c").as(c)) ++ Seq(
        col("ak").as("a"), col("bk").as("b"),
        col("dist").cast("long").as("dist")): _*)
  }
}
