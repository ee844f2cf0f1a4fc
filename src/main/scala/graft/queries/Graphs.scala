package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Q, Tables}
import graft.operators.Graph

/** Iterative graph-analytics catalogue entries. The oracle strategy is
  * the d58 one: the engine's checkpoint-bounded loop is unrolled into
  * MATERIALIZED DuckDB CTEs (one per round) replaying the identical
  * exact-integer update, so the fixpoint trajectory — not just some
  * final invariant — is hash-verified. MATERIALIZED is load-bearing
  * (the d58 lesson): plain CTEs inline per reference and an unrolled
  * recursion expands exponentially.
  */
object Graphs {

  /** g01 — PageRank (3 rounds, damping 0.85, exact picounit fixed
    * point) over the symmetric customer⇄supplier trade graph
    * (customer c traded with supplier s iff some order of c has a
    * lineitem of s; ids disambiguated as 2c / 2s+1). Symmetric edges
    * mean no dangling nodes, so the engine's dangling-redistribution
    * term contributes exactly 0 and the oracle omits it. Sums are
    * CAST to BIGINT (DuckDB SUM(BIGINT) is HUGEINT) so both engines
    * carry the same 64-bit values.
    */
  val g01PageRank: Q = Q(
    "g01_pagerank",
    """WITH eraw AS MATERIALIZED (
      |  SELECT DISTINCT o.o_custkey*2 AS src, l.l_suppkey*2+1 AS dst
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS MATERIALIZED (
      |  SELECT src, dst FROM eraw
      |  UNION SELECT dst AS src, src AS dst FROM eraw),
      |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
      |deg AS MATERIALIZED (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
      |p AS MATERIALIZED (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(1000000000000 AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS base
      |  FROM nodes),
      |r0 AS MATERIALIZED (SELECT id, (SELECT base FROM p) AS rank_fp FROM nodes),
      |r1 AS MATERIALIZED (
      |  SELECT nd.id, CAST((15 * (SELECT base FROM p)) // 100
      |    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_fp
      |  FROM nodes nd LEFT JOIN (
      |    SELECT e.dst AS id, CAST(SUM(r.rank_fp // d.outdeg) AS BIGINT) AS s
      |    FROM e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
      |    GROUP BY e.dst) c ON c.id = nd.id),
      |r2 AS MATERIALIZED (
      |  SELECT nd.id, CAST((15 * (SELECT base FROM p)) // 100
      |    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_fp
      |  FROM nodes nd LEFT JOIN (
      |    SELECT e.dst AS id, CAST(SUM(r.rank_fp // d.outdeg) AS BIGINT) AS s
      |    FROM e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
      |    GROUP BY e.dst) c ON c.id = nd.id),
      |r3 AS MATERIALIZED (
      |  SELECT nd.id, CAST((15 * (SELECT base FROM p)) // 100
      |    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_fp
      |  FROM nodes nd LEFT JOIN (
      |    SELECT e.dst AS id, CAST(SUM(r.rank_fp // d.outdeg) AS BIGINT) AS s
      |    FROM e JOIN r2 r ON r.id = e.src JOIN deg d ON d.src = e.src
      |    GROUP BY e.dst) c ON c.id = nd.id)
      |SELECT id, rank_fp FROM r3 ORDER BY id""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val fwd = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(edges, iters = 3).orderBy(col("id"))
  }

  /** g02 — first-order Markov transition matrix over the event stream:
    * per user, consecutive (prev_type → next_type) transitions counted
    * corpus-wide; probabilities ride as exact rational (cnt, out_total)
    * pairs — no float division enters the output. The per-user lag
    * window is the sessionization shuffle shape (state bounded by a
    * user's events); the matrix itself is |types|² rows, so the
    * out-total window on the AGGREGATED frame is constant-sized at any
    * corpus scale. */
  val g02MarkovTransitions: Q = Q(
    "g02_markov_transitions",
    """WITH t AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS cnt
      |  FROM t WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type)
      |SELECT prev_type, next_type, cnt,
      |       CAST(sum(cnt) OVER (PARTITION BY prev_type) AS BIGINT) AS out_total
      |FROM c ORDER BY prev_type, next_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed("event_type", "next_type")
      .withColumn("out_total",
        sum(col("cnt")).over(Window.partitionBy(col("prev_type"))))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** g03 — per-node triangle counts over the supplier co-occurrence
    * graph (two suppliers are adjacent iff some order contains
    * lineitems of both). The engine runs the degree-ordered
    * orientation (wedge volume O(m^{3/2}), each triangle found once
    * from its lowest-(degree, id) corner); the oracle is the
    * INDEPENDENT naive formulation — the a<b<c canonical triple join —
    * so the optimization is verified against untransformed semantics,
    * not against itself. */
  val g03Triangles: Q = Q(
    "g03_triangles",
    """WITH raw AS MATERIALIZED (
      |  SELECT DISTINCT l1.l_suppkey AS x, l2.l_suppkey AS y
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
      |tri AS MATERIALIZED (
      |  SELECT e1.x AS a, e1.y AS b, e2.y AS c
      |  FROM raw e1 JOIN raw e2 ON e2.x = e1.y
      |  JOIN raw e3 ON e3.x = e1.x AND e3.y = e2.y),
      |nodes AS (SELECT x AS id FROM raw UNION SELECT y FROM raw),
      |cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri
      |        FROM (SELECT unnest([a, b, c]) AS id FROM tri) GROUP BY id)
      |SELECT n.id, COALESCE(c.n_tri, 0) AS n_tri
      |FROM nodes n LEFT JOIN cnt c USING (id) ORDER BY id""".stripMargin) { (s, dir) =>
    // co-occurrence edges via the collect_set build (one container-
    // keyed shuffle + narrow pair explosion — Graph.coOccurrenceEdges'
    // scale rationale; the oracle keeps the independent self-join form)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val edges = Graph.coOccurrenceEdges(li, col("l_orderkey"),
        col("l_suppkey"), ordered = true)
      .select(col("src").as("a"), col("dst").as("b"))
    Graph.triangleCounts(edges).orderBy(col("id"))
  }

  /** g04 — multi-source BFS over the symmetrized supplier
    * co-occurrence graph: hop distance from the three lowest-keyed
    * suppliers (a seed predicate non-empty at EVERY scale factor —
    * nation membership is not), capped at 3 hops. The oracle is DuckDB's semi-naive
    * WITH RECURSIVE UNION walk (set semantics dedupe (id, d) pairs,
    * so the cyclic graph cannot blow up the recursion) reduced by
    * min(d) — an independent fixpoint formulation of the same
    * distances, the d49 oracle pattern. */
  val g04Bfs: Q = Q(
    "g04_bfs",
    """WITH RECURSIVE raw AS MATERIALIZED (
      |  SELECT DISTINCT l1.l_suppkey AS x, l2.l_suppkey AS y
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey),
      |walk(id, d) AS (
      |  SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey < 3
      |  UNION
      |  SELECT r.y, w.d + 1 FROM walk w JOIN raw r ON r.x = w.id WHERE w.d < 3)
      |SELECT id, CAST(min(d) AS BIGINT) AS dist
      |FROM walk GROUP BY id ORDER BY id""".stripMargin) { (s, dir) =>
    // collect_set co-occurrence build — see g03
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val edges = Graph.coOccurrenceEdges(li, col("l_orderkey"), col("l_suppkey"))
    val seeds = Tables.supplier(s, dir).filter(col("s_suppkey") < 3)
      .select(col("s_suppkey").as("id"))
    Graph.bfsDistances(edges, seeds, maxHops = 3).orderBy(col("id"))
  }

  /** g05 — WEIGHTED PageRank over the customer⇄supplier trade graph,
    * edge weight = lineitem count between the pair (trade volume):
    * u's rank splits proportionally to out-weights,
    * (r·w) div W(u) per edge. The three unrolled oracle rounds are
    * GENERATED from one template (the shared-generator rule), weighted
    * contribution sub-CTE included. Symmetric weights → no dangling
    * nodes, as in g01. */
  val g05PageRankWeighted: Q = {
    def round(i: Int) =
      s"""r$i AS MATERIALIZED (
         |  SELECT nd.id, CAST((15 * (SELECT base FROM p)) // 100
         |    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_fp
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM((r.rank_fp * e.w) // d.outdeg) AS BIGINT) AS s
         |    FROM e JOIN r${i - 1} r ON r.id = e.src JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.id = nd.id)""".stripMargin
    Q(
      "g05_pagerank_weighted",
      s"""WITH eraw AS MATERIALIZED (
         |  SELECT o.o_custkey*2 AS src, l.l_suppkey*2+1 AS dst,
         |         CAST(count(*) AS BIGINT) AS w
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  GROUP BY src, dst),
         |e AS MATERIALIZED (
         |  SELECT src, dst, w FROM eraw
         |  UNION ALL SELECT dst AS src, src AS dst, w FROM eraw),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
         |deg AS MATERIALIZED (
         |  SELECT src, CAST(sum(w) AS BIGINT) AS outdeg FROM e GROUP BY src),
         |p AS MATERIALIZED (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(1000000000000 AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS base
         |  FROM nodes),
         |r0 AS MATERIALIZED (SELECT id, (SELECT base FROM p) AS rank_fp FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT id, rank_fp FROM r3 ORDER BY id""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      // raw w=1 trade pairs: pageRankWeighted's contract folds parallel
      // edges itself (repartition + groupBy sum), so pre-aggregating
      // here would pay a second (src, dst) exchange for nothing
      val fwd = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"), lit(1L).as("w"))
      val edges = fwd.unionAll(
        fwd.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      Graph.pageRankWeighted(edges, iters = 3).orderBy(col("id"))
    }
  }

  /** g07 — nearest-seed label assignment (Graph.nearestSeedLabels):
    * g04's BFS frontier carrying a LABEL, ties at equal distance to
    * the smallest label — the deterministic min-lattice semantics
    * whose streaming twin (StreamOps.incrementalBfsStream) converges
    * to the identical table under any edge arrival order. The oracle
    * extends g04's recursive UNION walk with the label column and
    * reduces by (min dist, then min label at that dist) — an
    * independent fixpoint formulation. Seed labels are s_suppkey % 2
    * so distance ties genuinely exercise the label tiebreak. */
  val g07NearestSeed: Q = Q(
    "g07_nearest_seed",
    """WITH RECURSIVE raw AS MATERIALIZED (
      |  SELECT DISTINCT l1.l_suppkey AS x, l2.l_suppkey AS y
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey),
      |walk(id, d, lab) AS (
      |  SELECT s_suppkey, 0, s_suppkey % 2 FROM supplier WHERE s_suppkey < 3
      |  UNION
      |  SELECT r.y, w.d + 1, w.lab FROM walk w JOIN raw r ON r.x = w.id WHERE w.d < 3),
      |m AS (SELECT id, min(d) AS md FROM walk GROUP BY id)
      |SELECT w.id, CAST(m.md AS BIGINT) AS dist, CAST(min(w.lab) AS BIGINT) AS label
      |FROM walk w JOIN m ON w.id = m.id AND w.d = m.md
      |GROUP BY w.id, m.md ORDER BY w.id""".stripMargin) { (s, dir) =>
    // collect_set co-occurrence build — see g03
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val edges = Graph.coOccurrenceEdges(li, col("l_orderkey"), col("l_suppkey"))
    val seeds = Tables.supplier(s, dir).filter(col("s_suppkey") < 3)
      .select(col("s_suppkey").as("id"), (col("s_suppkey") % 2).as("label"))
    Graph.nearestSeedLabels(edges, seeds, maxHops = 3).orderBy(col("id"))
  }

  /** g08 — GraphSAGE-style neighbor sampling (Graph.sampleNeighbors):
    * 2-hop fanout (3, 2) from every 5th supplier over the co-order
    * supplier graph, neighbor choice ranked by the deterministic
    * TextHash affine key so the minibatch is engine- and
    * partitioning-reproducible. The oracle replays the identical
    * ranked windows. */
  val g08NeighborSample: Q = Q(
    "g08_neighbor_sample",
    s"""WITH raw AS MATERIALIZED (
       |  SELECT DISTINCT l1.l_suppkey AS src, l2.l_suppkey AS dst
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey),
       |rk AS MATERIALIZED (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src
       |    ORDER BY (769 * CAST(src AS BIGINT) + 1543 * CAST(dst AS BIGINT) + 12) % 1000000007, dst) AS rk
       |  FROM raw),
       |a1 AS (SELECT src, dst FROM rk WHERE rk <= 3),
       |a2 AS (SELECT src, dst FROM rk WHERE rk <= 2),
       |s AS (SELECT s_suppkey AS seed FROM supplier WHERE s_suppkey % 5 = 0),
       |h1 AS (SELECT s.seed, CAST(1 AS BIGINT) AS hop, a1.src, a1.dst
       |       FROM s JOIN a1 ON a1.src = s.seed),
       |f1 AS (SELECT DISTINCT seed, dst AS node FROM h1),
       |h2 AS (SELECT f1.seed, CAST(2 AS BIGINT) AS hop, a2.src, a2.dst
       |       FROM f1 JOIN a2 ON a2.src = f1.node)
       |SELECT CAST(seed AS BIGINT) AS seed, hop,
       |  CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
       |FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
       |ORDER BY seed, hop, src, dst""".stripMargin) { (s, dir) =>
    // collect_set co-occurrence build — see g03
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val edges = Graph.coOccurrenceEdges(li, col("l_orderkey"), col("l_suppkey"))
    val seeds = Tables.supplier(s, dir).filter(col("s_suppkey") % 5 === 0)
      .select(col("s_suppkey").as("id"))
    Graph.sampleNeighbors(edges, seeds, fanouts = Seq(3, 2))
      .orderBy(col("seed"), col("hop"), col("src"), col("dst"))
  }

  /** g09 — k-core decomposition by bounded parallel peeling
    * (Graph.kCorePeel): the 2-core of the embedding similarity graph
    * (same-cell dot ≥ 0.25, symmetric), 6 peel rounds. The oracle
    * unrolls the identical 6 rounds as MATERIALIZED CTEs (the g01
    * pattern); the engine's convergence early-exit is output-
    * identical to the full unroll, so mid-cascade and converged
    * fixtures both hash-match. On this corpus the cascade genuinely
    * runs: pendant chains peel over multiple rounds at every sf. */
  val g09KCore: Q = {
    val dotSql =
      "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list_transform(range(1, len(a.embedding)+1), " +
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), " +
        "(acc, x) -> acc + x)"
    def round(i: Int): String = {
      val p = s"e${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT src, count(*) AS c FROM $p GROUP BY src),
         |k$i AS MATERIALIZED (SELECT src AS id FROM d$i WHERE c >= 2),
         |e$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM $p e
         |  JOIN k$i a ON e.src = a.id JOIN k$i b ON e.dst = b.id)""".stripMargin
    }
    Q("g09_kcore",
      s"""WITH p AS MATERIALIZED (
         |  SELECT a.vec_id AS src, b.vec_id AS dst
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE $dotSql >= 0.25),
         |e0 AS MATERIALIZED (SELECT src, dst FROM p UNION SELECT dst AS src, src AS dst FROM p),
         |${(1 to 6).map(round).mkString(",\n")}
         |SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
         |FROM e6 GROUP BY src ORDER BY id""".stripMargin) { (s, dir) =>
      import graft.operators.Similarity
      val pairs = Similarity.nearDupPairs(Tables.embeddings(s, dir), 0.25)
        .select(col("a").as("src"), col("b").as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      Graph.kCorePeel(edges, k = 2, rounds = 6).orderBy(col("id"))
    }
  }

  /** g10 — weighted bipartite projection + top-k co-members
    * (Graph.bipartiteProjectTopK): suppliers projected through the
    * part-supplier membership (weight = shared parts), top-3
    * strongest co-suppliers per supplier, ties (weight desc, dst). */
  val g10BipartiteProject: Q = Q(
    "g10_bipartite_project",
    """WITH m AS (SELECT DISTINCT l_partkey AS l, l_suppkey AS r FROM lineitem),
      |p AS (SELECT a.r AS r, b.r AS r2, CAST(count(*) AS BIGINT) AS weight
      |      FROM m a JOIN m b ON a.l = b.l AND a.r < b.r
      |      GROUP BY a.r, b.r),
      |sym AS (SELECT r AS src, r2 AS dst, weight FROM p
      |        UNION ALL SELECT r2 AS src, r AS dst, weight FROM p),
      |rk AS (SELECT src, dst, weight,
      |         CAST(row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst) AS BIGINT) AS rank
      |       FROM sym)
      |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst, weight, rank
      |FROM rk WHERE rank <= 3
      |ORDER BY src, rank""".stripMargin) { (s, dir) =>
    val m = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("left"), col("l_suppkey").as("right"))
    Graph.bipartiteProjectTopK(m, k = 3)
      .orderBy(col("src"), col("rank"))
  }

  val all: Seq[Q] = Seq(g01PageRank, g02MarkovTransitions, g03Triangles, g04Bfs,
    g05PageRankWeighted, g07NearestSeed, g08NeighborSample, g09KCore,
    g10BipartiteProject)
}
