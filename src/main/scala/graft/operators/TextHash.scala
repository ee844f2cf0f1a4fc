package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text-hashing primitives shared by the dedup / similarity /
  * fingerprinting operators.
  *
  * The hash family is a polynomial rolling hash mod p=1e9+7 with
  * affine per-function mixing — chosen because the EXACT same formula
  * is expressible in Spark (higher-order functions) and in the DuckDB
  * oracle (list_transform/list_reduce), so every hash-based operator
  * is hash-compare checkable. Each builder has two emitters — a Spark
  * `Column` and a DuckDB SQL fragment — generated from the same
  * constants, so the formulas cannot drift apart. The SQL emitters
  * reference a column by name (callers stage token/hash arrays in
  * CTEs).
  *
  * Scale: these are Catalyst higher-order-function expressions (no
  * UDFs, no serialization boundary); per-char folding costs O(len)
  * per row and parallelizes embarrassingly. On a production 100 TB
  * run you'd swap `polyHash` for the built-in `xxhash64` (see
  * Dedup.minhashFast) — same operator shape, faster kernel; the
  * portable family exists so correctness is provable against an
  * independent engine.
  */
object TextHash {
  val P = 1000000007L
  /** Affine mixers h_i(x) = (a_i * x + b_i) mod P. */
  val A: Seq[Long] = Seq(769L, 1543L, 3079L, 6151L, 12289L, 24593L, 49157L, 98317L)
  val B: Seq[Long] = Seq(12L, 399L, 5024L, 70937L, 821342L, 910334L, 31L, 77L)
  /** Band-bucket combiner constant. */
  val BandMix = 1315423911L

  // ---- tokenization ----------------------------------------------------
  private val UpperAz = ('A' to 'Z').mkString
  private val LowerAz = ('a' to 'z').mkString

  /** Portable ASCII case folding: `translate` A–Z → a–z, identical in
    * every engine. Full `lower()` is NOT cross-engine stable — Spark
    * applies Java's full Unicode mappings while DuckDB applies
    * utf8proc's simple per-codepoint mappings (e.g. 'İ' U+0130 folds
    * to "i"+U+0307 vs "i"), which would silently diverge every
    * hash-based operator on a non-ASCII corpus. Non-ASCII characters
    * pass through untouched on both sides. */
  def asciiLower(c: Column): Column = translate(c, UpperAz, LowerAz)
  def asciiLowerSql(c: String): String = s"translate($c, '$UpperAz', '$LowerAz')"

  /** Case-folded whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(asciiLower(c), " "), t => t =!= "")
  def tokensSql(c: String): String =
    s"list_filter(string_split(${asciiLowerSql(c)}, ' '), x -> x <> '')"

  /** Distinct word n-gram shingles over a token-array column.
    * The short-input guard must be a `when`, NOT
    * `sequence(1, greatest(len-n+1, 0))`: Spark's sequence(1, 0) is
    * the DESCENDING [1, 0], so the greatest() form fabricates two
    * bogus windows for inputs shorter than the shingle width (DuckDB's
    * range(1, 1) is empty — a latent oracle mismatch caught by
    * property testing). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  /** Same over a token-array column named `t` (stage it in a CTE). */
  def shinglesSql(n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1), i -> $parts))"
  }

  // ---- hashing ---------------------------------------------------------
  /** Polynomial rolling hash of a string: fold (acc*31 + ascii(ch)) mod P.
    * Reference implementation as a pure HOF expression — kept for
    * cross-checking; hot paths use `polyHashFast` (identical values,
    * property-tested in PolyHashSpec). */
  def polyHash(c: Column): Column =
    aggregate(
      sequence(lit(1), length(c)),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(c.substr(i, lit(1)))) % P)

  /** Same hash as a codegen'd native Catalyst expression
    * (graft.functions.PolyHash) — one string walk, participates in
    * whole-stage codegen. */
  def polyHashFast(c: Column, base: Long = 31L): Column =
    graft.functions.PolyHash.polyHashNative(c, base)
  /** Same, over an arbitrary string-typed SQL expression. `base`
    * selects the family member (131 backs the d45 pluggable-hash
    * minhash path — an independent second family, same template). */
  def polyHashSql(c: String, base: Long = 31L): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($c)+1), i -> CAST(ascii(substring($c, i, 1)) AS BIGINT))), " +
      s"(acc, x) -> (acc*$base + x) % $P)"
}
