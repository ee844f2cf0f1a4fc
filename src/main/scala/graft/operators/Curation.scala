package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: the composition proof that the
  * engine's curation operators chain into the canonical
  * pretraining-data flow without leaving the DataFrame plane —
  * dedup → language gate → quality gate → token-budget selection,
  * each stage the EXISTING operator, not a re-implementation.
  *
  * Scale shape of the composed plan:
  *  - exact dedup is one content-keyed shuffle ([[Dedup.exact]]) plus
  *    a semi-join on the canonical ids — the semi side is (id)-narrow;
  *  - the quality and language gates are ROW-LOCAL feature columns
  *    ([[TextAnalysis.withLanguageQuality]]) appended in one
  *    projection chain over the deduped rows — one tokenization, no
  *    feature join, nothing cached: the gated frame flows straight
  *    into selection as a single-consumer plan;
  *  - the final selection is [[Prefix.takeBudget]]'s distributed
  *    two-pass prefix sum — no single-task global window (it
  *    checkpoints its ranged frame internally, which is also why the
  *    gated plan needs no pin: takeBudget consumes it exactly once).
  */
object Curation {

  /** Curate a (doc_id, text, …)-shaped corpus: drop exact duplicates
    * (min-id canonical row survives), drop docs whose language the
    * lexicon heuristic cannot place, drop low-quality docs (stopword
    * ratio below `minQuality` or fewer than `minTokens` tokens), then
    * keep the highest-quality docs up to `tokenBudget` total tokens.
    *
    * Output: the input's surviving rows plus `n_tokens`, `quality`,
    * `predicted_lang`, and `cum` (running token total in selection
    * order). */
  def curate(docs: DataFrame, minTokens: Long = 5L,
      minQuality: Double = 0.02, tokenBudget: Long = 15000L): DataFrame =
    curateImpl(docs, featuresReady = false, minTokens, minQuality, tokenBudget)

  /** The shared curation cascade. `featuresReady`: the fused span-cut
    * path computed `n_tokens`/`quality`/`predicted_lang` upstream (in
    * the same projection that cut the spans), so the gates are pure
    * filters over existing columns; the public path derives them here
    * from `text`. Output schema is identical either way. */
  private def curateImpl(docs: DataFrame, featuresReady: Boolean,
      minTokens: Long, minQuality: Double, tokenBudget: Long): DataFrame = {
    Seq("doc_id", "text").foreach { c =>
      require(docs.columns.contains(c), s"curate input needs a '$c' column")
    }
    require(!docs.columns.contains("cum"),
      "input already has a column named cum")
    val featureCols = Seq("n_tokens", "quality", "predicted_lang")
    if (featuresReady) featureCols.foreach { c =>
      require(docs.columns.contains(c), s"featuresReady input needs '$c'")
    } else featureCols.foreach { c =>
      require(!docs.columns.contains(c), s"input already has a column named $c")
    }
    // stage 1: exact dedup — the canonical (min-id) row per content.
    // `docs` is consumed twice (the content shuffle and the semi-join
    // left side); it is either a source scan (filters/pruning push
    // down twice — cheaper than caching) or the caller's pinned frame
    // (the span-cut path), never an unpinned expensive chain.
    val keep = Dedup.exact(docs, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, Seq("doc_id"), "leftsemi")
    // stages 2+3: both gates from row-local feature columns — one
    // tokenization appended in-line (no narrow frame, no join back)
    val withF =
      if (featuresReady) deduped
      else TextAnalysis.withLanguageQuality(deduped,
        graft.operators.TextHash.tokens(col("text")))
    val gated = withF
      .filter(col("predicted_lang") =!= "unknown" &&
        col("quality") >= minQuality && col("n_tokens") >= minTokens)
    // stage 4: global token budget, best quality first (ties on id)
    Prefix.takeBudget(gated,
      Seq(col("quality").desc, col("doc_id")), col("n_tokens"), tokenBudget)
  }

  /** Span-cut curation: repeated-span (substring) dedup applied
    * BEFORE the standard pipeline — duplicated runs are CUT from
    * documents ([[Dedup.dropSpans]]; a verbatim re-ingest collapses
    * to the empty string, a pasted boilerplate block disappears from
    * every doc but its first), and the survivors' token-normalized
    * text flows through `curate` unchanged. The stages are
    * complementary, not redundant: span-cut only sees docs with ≥
    * `spanTokens` tokens, so short verbatim copies survive it and
    * the exact-dedup stage mops them up — the ordering a production
    * flow wants (cut content first, then dedup what remains).
    *
    * Text downstream of this operator is token-normalized
    * (case-folded, single-space-joined) — the form every operator in
    * this stack compares. */
  def curateSpanCut(docs: DataFrame, spanTokens: Int = 4,
      minTokens: Long = 5L, minQuality: Double = 0.02,
      tokenBudget: Long = 15000L): DataFrame = {
    Seq("doc_id", "text").foreach { c =>
      require(docs.columns.contains(c), s"curateSpanCut input needs a '$c' column")
    }
    // FUSED composition — one tokenize/span scan feeds everything:
    //  - dropSpansTokens exposes the survivors' kept TOKEN ARRAY
    //    (tokens(array_join(kept,' ')) == kept — its contract), so
    //    the gate features and the joined text are computed from it
    //    in the SAME projection chain that cut the spans: the curate
    //    stage never re-tokenizes the corpus;
    //  - non-text input columns ride the apply pass as carried
    //    projections — no corpus-scale doc_id re-join to recover them;
    //  - the result is PINNED (curate's first stage consumes its
    //    input twice: the exact-dedup content shuffle AND the
    //    semi-join left side — unpinned, each consumer would
    //    re-execute the whole span chain, the dominant cost here).
    //    The pin stores text + three feature scalars per row, no
    //    token array; the registry releases it with every other
    //    corpus-scale pin at the caller's Caches.releaseAll()
    //    boundary (the documented contract).
    val carry = docs.columns.filterNot(c => c == "doc_id" || c == "text").toSeq
    val cut = Dedup.dropSpansTokens(docs, col("doc_id"), col("text"), spanTokens, carry)
      .select(col("doc_id") +: (carry.map(col) ++ Seq(
        array_join(col("kept"), " ").as("text"), col("kept"))): _*)
    // Pin-vs-recompute was A/B-measured (r12): unpinned, the span
    // chain + feature build runs once per stage-1 consumer and
    // measured 3.8-4.8 s vs 3.6-4.4 s pinned at sf0.1 — the pin wins
    // (and at scale avoids running the two-pass span chain twice).
    val spanCut = graft.Caches.pin(
      TextAnalysis.withLanguageQuality(cut, col("kept")).drop("kept"))
    curateImpl(spanCut, featuresReady = true, minTokens, minQuality, tokenBudget)
  }
}
