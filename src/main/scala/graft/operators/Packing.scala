package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that turns a corpus of
  * variable-length documents into fixed-width context windows: the
  * documents are concatenated in a deterministic global order and the
  * resulting token stream is cut every `window` tokens (GPT-style
  * concatenate-and-chunk; a document may span a window boundary).
  *
  * The global stream position is the distributed two-pass prefix sum
  * (Prefix.runningTotal — range partition + local windows + broadcast
  * offsets), so there is NO single-task global window anywhere: the
  * same plan runs on a 1000-executor corpus. Everything downstream of
  * the prefix sum is per-row arithmetic.
  *
  * Output = input + `n_tokens`, `start_pos` (0-based position of the
  * document's first token in the packed stream), `seq_first` /
  * `seq_last` (indices of the context windows the document touches).
  * A zero-token document occupies no tokens: it reports the window
  * its position falls in (`seq_last = seq_first`).
  *
  * `order` must be a TOTAL order (unique tiebreaker), same contract as
  * Prefix.runningTotal — it IS the epoch order of the packed stream;
  * pass a salted-hash position (Sampling/t69 style) for a shuffled
  * epoch, or a curriculum key for quality-ordered packing.
  */
object Packing {

  def packSequences(df: DataFrame, order: Seq[Column], nTokens: Column,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    Seq("n_tokens", "start_pos", "seq_first", "seq_last").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val withCum = Prefix.runningTotal(
      df.withColumn("n_tokens", nTokens.cast("long")), order, col("n_tokens"))
    withCum
      .withColumn("start_pos", col("cum") - col("n_tokens"))
      // integer `div`, not `/`: Column `/` is double division, and a
      // 2^53+ stream position would silently lose token precision.
      // Operands are clamped non-negative so truncating division
      // (Spark div) and floor division (DuckDB //) agree.
      .withColumn("seq_first", expr(s"start_pos div $window"))
      .withColumn("seq_last",
        greatest(col("seq_first"), expr(s"greatest(cum - 1, 0L) div $window")))
      .drop("cum")
  }

  /** Overlapping token-window chunker — the RAG/context-window
    * chunking step: windows of `window` tokens starting every `stride`
    * tokens (stride < window ⇒ adjacent chunks share window−stride
    * tokens of context). Chunk i covers tokens [i·stride+1,
    * i·stride+window]; the last chunk may be short; a doc emits
    * ⌊(n−1)/stride⌋+1 chunks (0 for an empty doc — dropped, as in the
    * SQL twin). Pure per-row arithmetic after one tokenize —
    * embarrassingly parallel, no shuffle at any scale. Output:
    * (doc_id, chunk_idx, n_chunk_tokens, chunk_hash) with the portable
    * content hash, so chunk-level dedup/lineage composes with the
    * Dedup stack. */
  def chunkTokenWindows(df: DataFrame, id: Column, text: Column,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    import graft.operators.TextHash.{tokens, polyHashFast}
    df.select(id.as("doc_id"), tokens(text).as("t"))
      .select(col("doc_id"), explode_outer(
        when(size(col("t")) >= 1,
          transform(
            sequence(lit(0), floor((size(col("t")) - 1)
              .cast("double") / stride).cast("int")),
            i => struct(i.cast("long").as("chunk_idx"),
              concat_ws(" ", slice(col("t"), i * stride + 1, lit(window)))
                .as("chunk_text"))))
          .otherwise(array().cast("array<struct<chunk_idx:bigint,chunk_text:string>>")))
        .as("c"))
      .filter(col("c").isNotNull)
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        size(split(col("c.chunk_text"), " ")).cast("long").as("n_chunk_tokens"),
        polyHashFast(col("c.chunk_text")).as("chunk_hash"))
  }

  /** Length-bucketed micro-batch planning — the padding-efficiency
    * step of training-batch assembly: sequences batch with NEIGHBORS
    * OF SIMILAR LENGTH so each batch pads to its own max, not the
    * corpus max. Bucket = nTokens div bucketWidth (fixed width —
    * per-batch padding waste is bounded by bucketWidth·batchSize
    * tokens); within a bucket rows order deterministically by
    * (nTokens, id) and batch_idx = (rank−1) div batchSize. The
    * assignment is a pure function of the corpus (stable under
    * repartitioning and engines).
    *
    * Scale note: the in-bucket rank is a per-bucket sort window, so
    * parallelism is bounded by the bucket count — for token-length
    * distributions that is hundreds of buckets of corpus/|buckets|
    * rows, the healthy shape. A corpus concentrated in ONE bucket
    * degrades to a single-task sort; pick bucketWidth below the
    * length spread (or range-partition inside buckets, the
    * `systematic` caveat). Output: (id, n_tokens, bucket, batch_idx).
    */
  def lengthBucketBatches(df: DataFrame, id: Column, nTokens: Column,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n_tokens"), col("id"))
    df.select(id.cast("long").as("id"),
        greatest(nTokens.cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $bucketWidth"))
      .withColumn("graft_rn", row_number().over(w))
      .select(col("id"), col("n_tokens"), col("bucket"),
        expr(s"CAST((graft_rn - 1) div $batchSize AS BIGINT)").as("batch_idx"))
  }
}
