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
  *  - the quality and language gates share ONE tokenization pass
  *    ([[TextAnalysis.languageQuality]] — the fused form of
  *    qualityFeatures + langId) joined back once on `doc_id`
  *    (tokenization dominates these stages at scale, so fusing the
  *    gates halves the dominant cost versus composing them naively);
  *  - the final selection is [[Prefix.takeBudget]]'s distributed
  *    two-pass prefix sum — no single-task global window.
  *
  * The deduped frame is pinned through [[graft.Caches]] (it feeds
  * three consumers); callers call `Caches.releaseAll()` when done
  * with the results, as the dedup operators document.
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
      minQuality: Double = 0.02, tokenBudget: Long = 15000L): DataFrame = {
    Seq("doc_id", "text").foreach { c =>
      require(docs.columns.contains(c), s"curate input needs a '$c' column")
    }
    Seq("n_tokens", "quality", "predicted_lang", "cum").foreach { c =>
      require(!docs.columns.contains(c), s"input already has a column named $c")
    }
    // stage 1: exact dedup — the canonical (min-id) row per content
    val keep = Dedup.exact(docs, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, Seq("doc_id"), "leftsemi")
      .transform(d => graft.Caches.pin(d))
    // stages 2+3: both gates' features from ONE tokenization pass
    // (TextAnalysis.languageQuality — the fused form of
    // qualityFeatures + langId), joined back once on doc_id
    val features = TextAnalysis
      .languageQuality(deduped, col("doc_id"), col("text"))
    val gated = deduped
      .join(features, Seq("doc_id"))
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
    // the span-cut frame is PINNED before entering curate: curate's
    // first stage consumes its input twice (the exact-dedup content
    // shuffle AND the canonical-id semi-join left side), and without
    // the pin each consumer re-executes the whole repeated-span chain
    // (tokenize → span kernel → interval fold → token cut) — the
    // dominant cost of this composition. With it the chain runs once
    // into the registry and both consumers scan cached blocks; the
    // registry releases it with every other corpus-scale pin at the
    // caller's Caches.releaseAll() boundary (the documented contract).
    val cleaned = Dedup.dropSpans(docs, col("doc_id"), col("text"), spanTokens)
      .select(col("doc_id"), col("cleaned_text").as("text"))
    val spanCut = graft.Caches.pin(docs.drop("text").join(cleaned, Seq("doc_id")))
    curate(spanCut, minTokens, minQuality, tokenBudget)
  }
}
