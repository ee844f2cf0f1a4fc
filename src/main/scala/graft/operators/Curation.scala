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
  *  - the feature stages ([[TextAnalysis.qualityFeatures]],
  *    [[TextAnalysis.langId]]) are scan-stage expressions joined back
  *    on `doc_id`, so the three frames co-partition on one key and
  *    AQE coalesces the exchanges;
  *  - the final selection is [[Prefix.takeBudget]]'s distributed
  *    two-pass prefix sum — no single-task global window.
  *
  * The deduped frame is persisted (it feeds three consumers); callers
  * follow the engine's cache contract (`spark.catalog.clearCache()`
  * when done, as the dedup operators document).
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stages 2+3: per-doc features from the standing operators,
    // joined back on doc_id (co-partitioned chain)
    val quality = TextAnalysis
      .qualityFeatures(deduped, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens"),
        col("stopword_ratio").as("quality"))
    val lang = TextAnalysis.langId(deduped, col("doc_id"), col("text"))
      .select(col("doc_id"), col("predicted_lang"))
    val gated = deduped
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .filter(col("predicted_lang") =!= "unknown" &&
        col("quality") >= minQuality && col("n_tokens") >= minTokens)
    // stage 4: global token budget, best quality first (ties on id)
    Prefix.takeBudget(gated,
      Seq(col("quality").desc, col("doc_id")), col("n_tokens"), tokenBudget)
  }
}
