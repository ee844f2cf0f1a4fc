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

  test("inlined-expensive-filter fires on the unbarriered staged-alias gate shape") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("lint_hof").toString
    import spark.implicits._
    Seq((1L, "the cat is here"), (2L, "a dog runs there"))
      .toDF("id", "text").write.mode("overwrite").parquet(tmp)
    val docs = spark.read.parquet(tmp)
    // the r12 curation bug shape: an expensive HOF staged as an alias,
    // then a filter over DERIVED columns — PushPredicateThroughNonJoin
    // substitutes the alias into the predicate (several copies)
    val toks = col("t")
    val unbarriered = docs
      .select(col("id"), filter(split(col("text"), " "), x => x =!= "").as("t"))
      .select(col("id"),
        size(filter(toks, x => x === "the")).as("a"),
        size(filter(toks, x => x === "a")).as("b"))
      .filter(col("a") > 0 && col("b") >= 0 && col("a") >= col("b"))
    val rules = PlanLint.lint(unbarriered).map(_.rule).toSet
    assert(rules.contains("inlined-expensive-filter"),
      s"expected the substitution smell to be flagged, got $rules:\n" +
        unbarriered.queryExecution.executedPlan)
    // the barriered twin is clean
    val once = graft.functions.ComputeOnce.once _
    val barriered = docs
      .select(col("id"), filter(split(col("text"), " "), x => x =!= "").as("t"))
      .select(col("id"),
        once(size(filter(toks, x => x === "the"))).as("a"),
        once(size(filter(toks, x => x === "a"))).as("b"))
      .filter(col("a") > 0 && col("b") >= 0 && col("a") >= col("b"))
    assert(!PlanLint.lint(barriered).map(_.rule).contains("inlined-expensive-filter"))
  }
}
