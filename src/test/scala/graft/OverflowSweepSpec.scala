package graft

import org.apache.spark.sql.functions._

/** The r14 ANSI integer-overflow sweep's regression gates (the
  * division-by-zero sweep's 100×-scale sibling, NOTES r14). The engine
  * runs ANSI mode: BIGINT multiplication and sum THROW on overflow
  * where DuckDB widens to HUGEINT — invisible at sf0.1 by
  * construction, so each fixed site gets a SYNTHETIC near-2⁶³ fixture
  * here. Every test first proves the fixture BITES (the naive long
  * arithmetic throws), then that the fixed path returns the exact
  * BigInt-verified value.
  */
class OverflowSweepSpec extends SparkSpec {
  import spark.implicits._

  private val nearMax = 4000000000000000000L // 4×10¹⁸, ~0.43·2⁶³

  private def overflowish(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage).exists(_.toLowerCase.contains("overflow")))

  test("temperatureBudget survives a near-2^63 budget (budget·w overflows BIGINT; alloc ≤ budget fits)") {
    // three sources, token counts chosen so w = floor(sqrt(c)) ≥ 17:
    // budget·w ≈ 6.8×10¹⁹ passes 2⁶³ while every alloc ≤ budget
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L),
      ("b", 4L, 200L), ("b", 5L, 200L),
      ("c", 6L, 50L))
      .toDF("source", "doc_id", "n_tokens")

    // the fixture bites: the PRE-fix long arithmetic throws under ANSI
    val weights = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("c"))
      .withColumn("w", floor(sqrt(col("c").cast("double"))).cast("long"))
    val ws = weights.agg(sum(col("w"))).as[Long].head()
    val ex = intercept[Exception] {
      weights.select(expr(s"(CAST($nearMax AS BIGINT) * w) div $ws")).collect()
    }
    assert(overflowish(ex), s"expected ANSI overflow from the naive shape, got: $ex")

    // the fixed path: exact BigInt-replayed allocations, no throw
    val out = graft.operators.Sampling.temperatureBudget(docs, budget = nearMax)
      .select(col("source"), col("alloc")).distinct()
      .as[(String, Long)].collect().toMap
    val w = weights.select(col("source"), col("w")).as[(String, Long)].collect().toMap
    val expected = w.map { case (s, wi) =>
      s -> (BigInt(nearMax) * wi / ws).toLong
    }
    // every doc admits under these giant allocations, so all three
    // sources appear in the output
    assert(out == expected, s"alloc mismatch: got $out expected $expected")
    assert(out.values.forall(_ <= nearMax))
  }

  test("lmAggCols sums n·c2 past 2^63 exactly (decimal internals, digit-string render)") {
    // two rows of one doc whose products each pass 2⁶³/3 — their sum
    // is 2.4×10¹⁹ > 2⁶³; a third doc stays tiny (mixed-scale groups)
    val joined = Seq(
      (1L, 3L, nearMax, 7L),
      (1L, 3L, nearMax, 11L),
      (2L, 2L, 5L, 13L))
      .toDF("doc_id", "n", "c2", "c1")

    // the fixture bites: the PRE-fix long product/sum throws under ANSI
    val ex = intercept[Exception] {
      joined.groupBy(col("doc_id"))
        .agg(sum(col("n") * col("c2")).cast("long")).collect()
    }
    assert(overflowish(ex), s"expected ANSI overflow from the naive shape, got: $ex")

    val cols = graft.operators.TextAnalysis.lmAggCols(nullSafe = false)
    val out = joined.groupBy(col("doc_id"))
      .agg(cols.head, cols.tail: _*)
      .select(col("doc_id"), col("sum_pair").cast("string"),
        col("sum_left").cast("string"))
      .as[(Long, String, String)].collect().toMap2
    val big = BigInt(nearMax)
    assert(out(1L) == ((big * 3 * 2).toString, (BigInt(3) * (7 + 11)).toString))
    assert(out(2L) == ("10", "26"))

    // null-safe twin (the t80 LEFT-join leg): nulls count as zero
    val withNulls = Seq(
      (1L, 3L, Some(nearMax), None: Option[Long]),
      (1L, 2L, None: Option[Long], Some(9L)))
      .toDF("doc_id", "n", "c2", "c1")
    val nsCols = graft.operators.TextAnalysis.lmAggCols(nullSafe = true)
    val ns = withNulls.groupBy(col("doc_id"))
      .agg(nsCols.head, nsCols.tail: _*)
      .select(col("sum_pair").cast("string"), col("sum_left").cast("string"))
      .as[(String, String)].head()
    assert(ns == ((big * 3).toString, "18"))
  }

  test("bigramLm emits sum_pair/sum_left as digit STRINGS (round-8 rule: no DECIMAL or overflowable BIGINT in a compared schema)") {
    val docs = Seq((1L, "alpha beta alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bigramLm(docs, col("doc_id"), col("text"))
    assert(out.schema("sum_pair").dataType.typeName == "string")
    assert(out.schema("sum_left").dataType.typeName == "string")
    // tiny-corpus values replay exactly: corpus bigrams {alpha beta:2,
    // beta alpha:1, beta gamma:1} → c2 = those counts; c1(alpha) = 2,
    // c1(beta) = 1+1 = 2
    val m = out.select(col("doc_id"), col("sum_pair"), col("sum_left"))
      .as[(Long, String, String)].collect().toMap2
    assert(m(1L) == ("5", "6")) // 2·2+1·1 = 5; 2·c1(alpha)+1·c1(beta) = 4+2 = 6
    assert(m(2L) == ("1", "2")) // 1·c2(beta gamma) = 1; 1·c1(beta) = 2
  }

  private implicit class TripleOps[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
