package graft

/** Catalogue-wide mechanized scale lint (graft.PlanLint): every
  * query's executed plan is swept for the structural hazards the
  * per-query PlanAuditSpec tests check piecemeal. The whitelist is
  * the complete, documented exception list — a new entry needs the
  * same justification these carry.
  */
class PlanLintSpec extends SparkSpec {

  test("catalogue-wide lint: no cartesians, single-partition funnels, or global windows beyond the documented exceptions") {
    val whitelist: Map[String, Set[String]] = Map(
      // intentionally exhaustive brute-force kNN baseline: broadcast
      // queries × corpus IS the semantics being oracle-checked
      "s50_knn_brute" -> Set("cartesian-product"),
      // bpePairStats ranks the TOP-K pair table AFTER an orderBy·limit
      // — the unpartitioned row_number window sees ≤ topK rows by
      // construction (documented at TextAnalysis.bpePairStats)
      "t81_bpe_pairs" -> Set("unpartitioned-window"),
      // single-query IVF rankers partition their rank window by the
      // constant query_id, which Catalyst folds away — the window
      // orders ONE probed cell (s57/s60) or the ≤ shortlist re-rank
      // set (s58), the bounded funnel the operators' scaladoc
      // documents; multi-query forms (s50/s51) keep a real key
      "s57_ivfpq_topk" -> Set("unpartitioned-window"),
      "s58_pq_rerank" -> Set("unpartitioned-window"),
      "s60_multiprobe" -> Set("unpartitioned-window"),
      // t91's two rank legs are post-limit row_numbers over ≤ 20 rows
      // each (the t81 class): global-ordered input to rrfFuse
      "t91_rrf_fusion" -> Set("unpartitioned-window"))
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        graft.Caches.releaseAll()
        PlanLint.lint(fn(spark, sfDir))
          .filterNot(_.rule == "object-hash-aggregate") // advisory tier
          .filterNot(f => whitelist.getOrElse(name, Set.empty).contains(f.rule))
          .map(f => s"$name: ${f.rule} at ${f.node}")
    }
    assert(offenders.isEmpty,
      s"scale hazards in the catalogue:\n${offenders.mkString("\n")}")
  }
}
