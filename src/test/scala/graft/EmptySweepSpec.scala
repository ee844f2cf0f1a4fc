package graft

/** The EMPTY-CORPUS contract, frozen in-suite (r17 verdict item 3,
  * after three rounds documented-but-open): at 100 TB an upstream
  * filter legitimately empties any FACT table, and every catalogue
  * query must either produce its empty answer or fail loudly through
  * a documented require. `tools/make_empty.py` + the manual DuckDB
  * differential swept this class in r15-r17, but nothing PINNED it —
  * a new divergence class member could slip in silently. This spec
  * derives the fixture in-process (fact tables 0 rows, dimension
  * enums region/nation kept — fixed vocabularies, not data) and
  * asserts every query's Spark-side outcome against the frozen
  * classes:
  *
  *  - REQUIRE-GUARDED (throws "centroid set is empty" — or the 1-row
  *    query contract where the emptied fact table is the QUERY side —
  *    BY DESIGN): the single-query/assignment ANN contracts —
  *    assigning to zero centroids, training on nothing, or building
  *    an IVF layout with no cells is a CALLER error (r9 ANN review;
  *    the batch entry points return empty frames instead, per the
  *    r16 decision).
  *
  *  - GROUPING-ON-EMPTY (0 rows, the DECIDED divergence): Spark
  *    emits 0 rows for GROUP BY / ROLLUP / CUBE / GROUPING SETS over
  *    empty input where ANSI SQL's global-aggregate and grand-total
  *    shapes emit a 1-row (or one-per-set) zero summary. Both
  *    semantics are defensible; the ENGINE follows Spark's — what
  *    every Spark user gets from groupBy — and this test freezes
  *    that choice BY NAME: a query joining the class (a changed
  *    aggregate shape that diverges from its oracle only at zero
  *    rows) fails here until it is reviewed in.
  *
  *  - everything else: evaluates without throwing. Queries that
  *    still emit rows on the empty corpus (global aggregates' 1-row
  *    null/zero summaries, dimension-driven fixtures, calibration
  *    tables) are frozen as a set too — an unexplained new non-empty
  *    result on EMPTY input is how a synthesized-instead-of-read
  *    input bug would first show.
  */
class EmptySweepSpec extends SparkSpec {

  /** Queries whose construction or evaluation must THROW the loud
    * centroid contract on the empty corpus. */
  private val requireGuarded = Set(
    "s52_centroid_assign", "s56_pq_adc", "s57_ivfpq_topk", "s58_pq_rerank",
    "s60_multiprobe", "s61_kmeans_step", "s64_pq_train",
    "s69_centroid_assign_big",
    // s71-s74 build (or grow/compact/bucket) the cell LAYOUT before
    // probing it — an IVF layout with zero cells is the same caller
    // error as s52's assignment (the batch PROBE against an existing
    // layout keeps the empty⇒empty contract, OperatorsSpec pins it)
    "s71_ivf_partitioned", "s72_ivf_append", "s73_ivf_compact",
    "s74_ivf_bucketed", "s75_ivf_bucketed_inc", "s76_ivfpq_on_layout")

  /** The grouping-on-empty divergence class — Spark-side shape is
    * 0 rows; the SQL oracle's shape is a grand-total summary. Members
    * are reviewed by name (NOTES r15/r16: q11/q21/q23 rollup /
    * grouping-sets / cube, q70's GROUPING SETS profile, q87's oracle
    * grand-total leg). */
  private val groupingOnEmpty = Set(
    "q11_rollup", "q21_grouping_sets", "q23_cube", "q70_key_skew",
    "q87_incremental_ingest")

  test("empty-corpus catalogue sweep: every query's Spark-side outcome matches the frozen contract") {
    val src = sfDir
    val dst = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val keep = Set("region", "nation")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      (if (keep(t)) df else df.limit(0))
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val outcomes: Seq[(String, Either[String, Long])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        Caches.releaseAll()
        spark.catalog.clearCache()
        name -> (try Right(fn(spark, dst).count())
        catch { case e: Throwable =>
          def contract(m: String): Boolean =
            m.contains("centroid set is empty") ||
              m.contains("query must be a single row")
          def root(t: Throwable): String = {
            var c: Throwable = t
            while (c.getCause != null && (c.getMessage == null ||
              !contract(c.getMessage))) c = c.getCause
            Option(c.getMessage).getOrElse(t.getClass.getName)
          }
          Left(root(e))
        })
      }
    val threw = outcomes.collect { case (n, Left(m)) => n -> m }.toMap
    // 1. throwers are EXACTLY the require-guarded set, all with the
    //    designed message — any other engine throw on empty input is
    //    a crash bug (the r15 fix class: NPEs, PATH_NOT_FOUND, ANSI
    //    divides)
    assert(threw.keySet == requireGuarded,
      s"empty-corpus throw set drifted.\n+ ${(threw.keySet -- requireGuarded).toSeq.sorted.map(n => s"$n: ${threw(n)}").mkString("\n  ")}\n- ${(requireGuarded -- threw.keySet).toSeq.sorted.mkString(", ")}")
    // two documented loud messages: the zero-centroid contract, and —
    // for single-query paths whose QUERY table is a fact table the
    // fixture also empties — the 1-row query contract, hit first
    threw.foreach { case (n, m) =>
      assert(m.contains("centroid set is empty") ||
        m.contains("query must be a single row"),
        s"$n threw off-contract: $m")
    }
    val rows = outcomes.collect { case (n, Right(c)) => n -> c }.toMap
    // 2. the grouping-on-empty members keep Spark's 0-row shape — the
    //    decided engine semantics (the oracle-side grand-total twin is
    //    the documented divergence, re-checked by the make_empty sweep)
    groupingOnEmpty.foreach { n =>
      assert(rows.get(n).contains(0L),
        s"$n left the grouping-on-empty contract: ${rows.get(n).orElse(threw.get(n))}")
    }
    // 3. queries still emitting rows on EMPTY fact tables, frozen: the
    //    1-row global summaries, dimension(region/nation)-driven
    //    results, and data-independent calibration tables. A new
    //    member means a query invents output without input — review it.
    val nonEmptyOnEmpty = rows.filter(_._2 > 0).keySet
    val reviewed = Set(
      // dimension-ENUM-driven outputs — region/nation stay populated
      // by the fixture contract, so queries whose row space is the
      // dimension itself legitimately emit on an empty fact side
      "q47_recursive_cte",   // 25 rows: the nation transitive closure
      "q86_parity_pipeline", // 14 rows: nation-keyed parity fixture legs
      // shape-driven outputs — row count is a property of the REQUEST,
      // not the data
      "q67_profile",    // 3 rows: one profile row per profiled column
      "s54_ann_recall") // 1 row: the global recall summary (null metric)
    assert(nonEmptyOnEmpty == reviewed,
      s"non-empty-on-empty set drifted.\n+ ${(nonEmptyOnEmpty -- reviewed).toSeq.sorted.map(n => s"$n: ${rows(n)} rows").mkString("\n  ")}\n- ${(reviewed -- nonEmptyOnEmpty).toSeq.sorted.mkString(", ")}")
  }
}
