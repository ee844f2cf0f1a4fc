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
    // KNOWN-BY-DESIGN findings, asserted EXACTLY (rule, count): unlike
    // the tolerate-style whitelist above, these entries fail the sweep
    // BOTH if the finding disappears (someone "fixed" the literal SQL a
    // query exists to gate) and if new findings of the same rule creep
    // in next to it.
    val expectedExactly: Map[String, (String, Int)] = Map(
      // q54 gates the REGISTERED SQL surface with the user-written
      // duplicate `poly_hash(fold)` in one SELECT — the duplicate IS
      // the literal SQL under test (NOTES r12), not a staged-alias
      // substitution to fix
      "q54_sql_surface" -> (("inlined-expensive-filter", 1)))
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        graft.Caches.releaseAll()
        val findings = PlanLint.lint(fn(spark, sfDir))
          .filterNot(_.rule == "object-hash-aggregate") // advisory tier
          .filterNot(f => whitelist.getOrElse(name, Set.empty).contains(f.rule))
        expectedExactly.get(name) match {
          case Some((rule, n)) =>
            val (expected, rest) = findings.partition(_.rule == rule)
            val miscount = if (expected.size == n) Nil
              else Seq(s"$name: expected exactly $n '$rule' findings, got ${expected.size}")
            miscount ++ rest.map(f => s"$name: ${f.rule} at ${f.node}")
          case None =>
            findings.map(f => s"$name: ${f.rule} at ${f.node}")
        }
    }
    assert(offenders.isEmpty,
      s"scale hazards in the catalogue:\n${offenders.mkString("\n")}")
  }

  test("wide-scan fires on a deliberately unpruned scan and stays quiet on pruned and pinned plans") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.{FileSourceScanExec, ProjectExec}
    val tmp = java.nio.file.Files.createTempDirectory("lint_scan").toString
    import spark.implicits._
    Seq((1L, "a", 1.0, "x", 10L), (2L, "b", 2.0, "y", 20L))
      .toDF("id", "s", "d", "t", "n").write.mode("overwrite").parquet(tmp)
    // pruned: Catalyst pushes the 1-column projection into the scan
    val pruned = spark.read.parquet(tmp).select(col("id"))
    assert(!PlanLint.lint(pruned).map(_.rule).contains("wide-scan"),
      pruned.queryExecution.executedPlan.toString)
    // filter-only consumption counts as used: `s` is read for the
    // residual filter even though only `id` survives upward
    val filtered = spark.read.parquet(tmp).filter(col("s") === "a").select(col("id"))
    assert(!PlanLint.lint(filtered).map(_.rule).contains("wide-scan"),
      filtered.queryExecution.executedPlan.toString)
    // DELIBERATELY defeated pruning (what a barrier/manual plan/optimizer
    // change would produce): a full-width scan under a 1-column Project
    val full = spark.read.parquet(tmp)
    val scan = full.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in\n" +
      full.queryExecution.executedPlan))
    assert(scan.output.size == 5)
    val mutated = ProjectExec(Seq(scan.output.head), scan)
    val findings = PlanLint.lintPlan(mutated)
    assert(findings.exists(f => f.rule == "wide-scan" &&
      f.node.contains("reads-unconsumed=")),
      s"expected the unpruned scan flagged, got $findings")
    // partition columns are exempt: FileSourceStrategy appends every
    // partition column to every scan's output whether consumed or not
    // (q81's mergeSchema read is the catalogue case) — they are
    // path-derived, zero IO, not a pruning failure
    val ptmp = java.nio.file.Files.createTempDirectory("lint_part").toString
    Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "s", "g")
      .write.partitionBy("g").mode("overwrite").parquet(ptmp)
    val partitioned = spark.read.parquet(ptmp)
      .groupBy(col("s")).agg(count(col("id")).as("n"))
    assert(!PlanLint.lint(partitioned).map(_.rule).contains("wide-scan"),
      partitioned.queryExecution.executedPlan.toString)
    // pinned subtrees are exempt: a cached full frame consumed narrowly
    // is the pin's contract, not a pruning failure
    val pinned = spark.read.parquet(tmp).persist()
    try {
      val narrow = pinned.select(col("id"))
      assert(!PlanLint.lint(narrow).map(_.rule).contains("wide-scan"),
        narrow.queryExecution.executedPlan.toString)
    } finally { pinned.unpersist(); () }
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

  test("expensive-sort-key fires on a kernel ORDER BY and stays quiet on the staged-attribute form") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("lint_sort").toString
    import spark.implicits._
    Seq((1L, "alpha beta"), (2L, "gamma")).toDF("id", "text")
      .write.mode("overwrite").parquet(tmp)
    val docs = spark.read.parquet(tmp)
    val kernel = graft.operators.TextHash.polyHash(col("text"))
    // kernel directly in ORDER BY: the sort comparator re-evaluates a
    // non-attribute key per COMPARISON — O(n log n) kernel evals
    val hazard = docs.orderBy(kernel)
    val rules = PlanLint.lint(hazard).map(_.rule).toSet
    assert(rules.contains("expensive-sort-key"),
      s"expected the per-comparison re-eval hazard flagged, got $rules:\n" +
        hazard.queryExecution.executedPlan)
    // staged form: compute once as a column, sort by the attribute
    val staged = docs.withColumn("h", kernel).orderBy(col("h"))
    assert(!PlanLint.lint(staged).map(_.rule).contains("expensive-sort-key"),
      staged.queryExecution.executedPlan.toString)
  }

  test("inlined-expensive-filter fires on duplicated kernel aggregate args and project twins; ComputeOnce-staged forms stay quiet") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("lint_agg").toString
    import spark.implicits._
    Seq((1L, "alpha beta"), (2L, "gamma")).toDF("id", "text")
      .write.mode("overwrite").parquet(tmp)
    val docs = spark.read.parquet(tmp)
    val kernel = graft.operators.TextHash.polyHash(col("text"))
    // aggregate-args twin: the same kernel inside two aggregate
    // functions of ONE Aggregate node (no analyzer extraction covers
    // aggregate ARGUMENTS, unlike grouping keys and window specs)
    val aggTwin = docs.agg(sum(kernel).as("s"), max(kernel).as("m"))
    val aggRules = PlanLint.lint(aggTwin).map(_.rule).toSet
    assert(aggRules.contains("inlined-expensive-filter"),
      s"expected the aggregate-arg twin flagged, got $aggRules:\n" +
        aggTwin.queryExecution.executedPlan)
    // staged: one kernel column, aggregates over the attribute
    val aggStaged = docs
      .select(graft.functions.ComputeOnce.once(kernel).as("h"))
      .agg(sum(col("h")).as("s"), max(col("h")).as("m"))
    assert(!PlanLint.lint(aggStaged).map(_.rule).contains("inlined-expensive-filter"),
      aggStaged.queryExecution.executedPlan.toString)
    // project twin (the q54 shape): the same kernel twice in one SELECT
    val projTwin = docs.select(col("id"), kernel.as("h"), (kernel % 64).as("shard"))
    val projRules = PlanLint.lint(projTwin).map(_.rule).toSet
    assert(projRules.contains("inlined-expensive-filter"),
      s"expected the project twin flagged, got $projRules:\n" +
        projTwin.queryExecution.executedPlan)
    val projStaged = docs
      .select(col("id"), graft.functions.ComputeOnce.once(kernel).as("h"))
      .select(col("id"), col("h"), (col("h") % 64).as("shard"))
    assert(!PlanLint.lint(projStaged).map(_.rule).contains("inlined-expensive-filter"),
      projStaged.queryExecution.executedPlan.toString)
  }

  test("window expressions are swept: duplicated kernels in one Window node flag, attribute forms stay quiet") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val tmp = java.nio.file.Files.createTempDirectory("lint_win").toString
    import spark.implicits._
    Seq((1L, "g1", "alpha"), (2L, "g1", "beta"), (3L, "g2", "gamma"))
      .toDF("id", "grp", "text").write.mode("overwrite").parquet(tmp)
    val docs = spark.read.parquet(tmp)
    val kernel = graft.operators.TextHash.polyHash(col("text"))
    // the analyzer's ExtractWindowExpressions stages complex window
    // inputs as _w# project columns, so API-built windows arrive
    // deduplicated — this case documents that the attribute form is
    // quiet; the rule itself guards the shape should any rewrite (a
    // custom Rule, a future optimizer change) re-inline kernels into a
    // WindowExec's expressions
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val windowed = docs.select(col("id"),
      sum(kernel).over(w).as("s"), max(kernel).over(w).as("m"))
    val rules = PlanLint.lint(windowed).map(_.rule).toSet
    // whichever node the kernels land on post-analysis, there must be
    // no duplicate-kernel finding (extraction dedupes) and no sort-key
    // finding (the window sort orders by attributes)
    assert(!rules.contains("expensive-sort-key"),
      windowed.queryExecution.executedPlan.toString)
    assert(!rules.contains("inlined-expensive-filter"),
      windowed.queryExecution.executedPlan.toString)
    // now SIMULATE the re-inline the rule guards against: substitute
    // the staged _w# attribute back with the kernel inside the
    // WindowExec's expressions (what a pushdown-style alias
    // substitution would produce) and assert the rule fires
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
    import org.apache.spark.sql.execution.ProjectExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // AdaptiveSparkPlanExec is a leaf to collect/transform — unwrap it
    val plan = windowed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the staged expensive expression (TextHash.polyHash expands to a
    // HigherOrderFunction; a CostlyKernel would match equally)
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val kexpr = plan.collect { case p: ProjectExec =>
      p.projectList.collect {
        case a: Alias if a.child.exists(e =>
            e.isInstanceOf[HigherOrderFunction] ||
            e.isInstanceOf[graft.functions.CostlyKernel]) =>
          a.child
      }
    }.flatten.headOption.getOrElse(fail("no staged kernel projection found in\n" + plan))
    val mutated = plan.transform {
      case w: WindowExec => w.copy(windowExpression =
        w.windowExpression.map(_.transform {
          case a: AttributeReference if a.name.startsWith("_w") => kexpr
        }.asInstanceOf[NamedExpression]))
    }
    assert(PlanLint.lintPlan(mutated).exists(_.rule == "inlined-expensive-filter"),
      s"expected the simulated window re-inline flagged:\n$mutated")
  }
}
