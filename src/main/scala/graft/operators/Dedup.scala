package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextHash._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard verification.
  *
  * Scale design (the whole point of these):
  *  - exact dedup = hash-groupBy, one shuffle on the content key; never
  *    a driver-side set;
  *  - MinHash+LSH: per-doc signatures are a narrow projection; the ONLY
  *    shuffle is the band-bucket self-join, whose fan-in is bounded by
  *    bucket size (hash-distributed, skew-safe because buckets with a
  *    single doc produce no pairs and giant buckets signal true dup
  *    clusters that ARE the answer);
  *  - candidate verification (exact Jaccard) touches only LSH
  *    candidates — O(candidates), not O(n²);
  *  - SimHash reduces a doc to one 64/32-bit value; near-dup = small
  *    hamming distance, joinable by band rotation (bucket on bit
  *    slices).
  */
object Dedup {

  /** Exact dedup: canonical (min-id) row per distinct value of `key`.
    * Equivalent to dropDuplicates but deterministic about WHICH row
    * survives (dropDuplicates keeps an arbitrary first-seen row —
    * unacceptable for an oracle-checked pipeline). */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature: k portable affine hashes over the
    * distinct n-gram shingle set. Returns array<bigint> of length k. */
  def minhashSignature(text: Column, n: Int = 3, k: Int = 8): Column = {
    val sh = shingles(tokens(text), n)
    val hs = transform(sh, s => polyHash(s))
    array((0 until k).map { i =>
      array_min(transform(hs, h => (lit(A(i)) * h + lit(B(i))) % P))
    }: _*)
  }

  /** LSH band buckets: signature split into `bands` bands of
    * k/bands rows each; each band folds to one bucket id. Output:
    * one row per (id, band, bucket). Docs sharing any (band, bucket)
    * are near-dup candidates. */
  def lshBuckets(df: DataFrame, id: Column, text: Column,
      n: Int = 3, k: Int = 8, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sig = minhashSignature(text, n, k)
    val withSig = df.select(id.as("doc_id"), sig.as("sig"))
    val bandCols = (0 until bands).map { b =>
      val combined = (0 until rows).foldLeft(lit(0L)) { (acc, r) =>
        (acc * BandMix + element_at(col("sig"), b * rows + r + 1)) % P
      }
      struct(lit(b.toLong).as("band"), combined.as("bucket"))
    }
    withSig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs from LSH buckets: distinct (a < b) ids sharing a
    * (band, bucket). The self-join shuffles on (band, bucket) only. */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val l = buckets.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val r = buckets.select(col("band"), col("bucket"), col("doc_id").as("b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs: join the
    * shingle sets back and compute |∩|/|∪| precisely. Only candidates
    * pay the set-intersection cost. */
  def verifyJaccard(docs: DataFrame, id: Column, text: Column,
      candidates: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(id.as("doc_id"), shingles(tokens(text), n).as("s"))
    val sa = sh.select(col("doc_id").as("a"), col("s").as("sa"))
    val sb = sh.select(col("doc_id").as("b"), col("s").as("sb"))
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** End-to-end MinHash near-dup detection: LSH candidates → exact
    * Jaccard filter. */
  def nearDuplicates(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, k: Int = 8, bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val cands = candidatePairs(lshBuckets(docs, id, text, n, k, bands))
    verifyJaccard(docs, id, text, cands, n, threshold)
  }

  /** 32-bit SimHash: bit b of the fingerprint is the sign of
    * Σ_tokens (±1 by token-hash bit b). Near-dup docs differ in few
    * bits. Two-stage: token hashes are staged as an array column via
    * the Column DSL, then the bit-fold runs as a SQL-text HOF (dynamic
    * bit shifts aren't expressible in the DSL — still a Catalyst
    * expression plan, not a UDF), mirrored verbatim by the DuckDB
    * oracle. Output: (doc_id, simhash). */
  def simhash32(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
        transform(tokens(text), t => polyHash(t)).as("hs"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 31), 0L, (acc, b) -> acc +
          |  CASE WHEN aggregate(hs, 0L,
          |    (a2, h) -> a2 + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) > 0
          |  THEN CAST(shiftleft(1, b) AS BIGINT) ELSE 0L END)""".stripMargin)
        .as("simhash"))

  /** Production-kernel MinHash variant: same operator shape with
    * Spark's codegen'd xxhash64 in place of the portable polynomial
    * family. Not oracle-checkable (DuckDB has no xxhash64) — exists as
    * the fast path you'd run at 100 TB. */
  def minhashSignatureFast(text: Column, n: Int = 3, k: Int = 8): Column = {
    val sh = shingles(tokens(text), n)
    array((0 until k).map { i =>
      array_min(transform(sh, s => pmod(xxhash64(lit(A(i)), s), lit(P))))
    }: _*)
  }
}
