package graft

/** Advisory-tier lint regression guard: the object-hash-aggregate
  * path (TypedImperativeAggregate / collect_* object buffers) is how
  * t76 burned 25× before its pre-aggregation fix — it is sometimes the
  * right tool (bounded typed aggregators, vocabulary-sized
  * collect_lists), but every use should be a conscious decision. This
  * test pins the EXACT set of catalogue queries that plan one; a new
  * query joining the set fails until it is reviewed and added here
  * with the same justification discipline as the main lint whitelist.
  */
class PlanLintAdvisorySpec extends SparkSpec {

  test("object-hash-aggregate users are exactly the reviewed set") {
    val users = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        graft.Caches.releaseAll()
        val fs = PlanLint.lint(fn(spark, sfDir))
          .filter(_.rule == "object-hash-aggregate")
        if (fs.nonEmpty) Some(name) else None
    }.toSet
    val reviewed = Set(
      "q25_percentile",      // exact percentile: value-buffer agg IS the semantics
      "q26_array_agg",       // collect over per-group arrays, group-bounded
      "q48_topk_agg",        // bounded-heap TopKAgg: k-item buffer by design
      "t75_source_cap",      // same TopKAgg, per-source cap
      "t76_heavy_hitters",   // weighted MG over PRE-AGGREGATED vocab (the fix)
      "q73_equidepth",       // collect_list of <= q-1 cuts per group
      "d60_drop_spans",      // collect_list of few merged intervals per doc
      "d63_cdc_apply",       // array_sort(collect_list) doc rebuild, chunk-bounded
      "d68_varint_postings"  // posting-list materialization: per-term doc list is
                             // the ARTIFACT; a 100 TB hot term needs DF capping
                             // (d65's maxDf discipline) before this step
    )
    assert(users == reviewed,
      s"object-agg set drifted.\n+ ${(users -- reviewed).toSeq.sorted.mkString(", ")}\n- ${(reviewed -- users).toSeq.sorted.mkString(", ")}")
  }
}
