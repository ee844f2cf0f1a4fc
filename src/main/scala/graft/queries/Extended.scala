package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.{Q, Tables}
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.operators.TextHash._

/** North-star operators as oracle-checked queries: dedup (exact /
  * MinHash+LSH / SimHash / n-gram Jaccard / embedding near-dup),
  * similarity search (brute-force + IVF), text analysis, multimodal
  * metadata. The DuckDB oracle SQL for the hash-based ops is GENERATED
  * from the same constants as the Spark plans (TextHash), so the
  * formulas cannot drift.
  */
object Extended {

  // ---- shared oracle CTE fragments (documents → tokens → shingles →
  // shingle hashes → minhash signature → LSH band buckets) ------------
  private val sigEntries = A.zip(B).map { case (a, b) =>
    s"list_min(list_transform(h, x -> ($a*x + $b) % $P))"
  }.mkString("[", ", ", "]")

  private val sigCtes =
    s"""toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM toks),
       |hs AS (SELECT doc_id, list_transform(s, sg -> ${polyHashSql("sg")}) AS h FROM sh),
       |sig AS (SELECT doc_id, $sigEntries AS sig FROM hs)""".stripMargin

  private val minhashCtes =
    s"""$sigCtes,
       |bb AS (SELECT doc_id, CAST(b AS BIGINT) AS band,
       |         (sig[2*b+1]*$BandMix + sig[2*b+2]) % $P AS bucket
       |       FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b))""".stripMargin

  /** d40 — exact dedup by content (hash-groupBy; min-id canonical row).
    * Duplicates are injected deterministically (every 7th doc re-added
    * under a shifted id) since the corpus itself has no exact dups. */
  val d40DedupExact: Q = Q(
    "d40_dedup_exact",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0)
      |SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
      |FROM corpus GROUP BY text
      |ORDER BY keep_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val corpus = docs.unionAll(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.exact(corpus, col("text"), col("doc_id"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }

  /** d41 — MinHash signatures → LSH band buckets (the shuffle key of
    * scalable near-dup detection). */
  val d41MinhashLsh: Q = Q(
    "d41_minhash_lsh",
    s"""WITH $minhashCtes
       |SELECT doc_id, band, bucket FROM bb
       |ORDER BY doc_id, band""".stripMargin) { (s, dir) =>
    Dedup.lshBuckets(Tables.documents(s, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"), col("band"))
  }

  /** d42 — near-duplicate pairs: LSH candidates verified by exact
    * 3-gram Jaccard ≥ 0.8 over HASHED shingle sets (both engines
    * intersect the same distinct-hash sets, so collision behavior is
    * identical by construction). Cost is O(candidates), never O(n²). */
  val d42NearDupPairs: Q = Q(
    "d42_neardup_pairs",
    s"""WITH $minhashCtes,
       |hd AS (SELECT doc_id, list_distinct(h) AS s FROM hs),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
       |SELECT a, b,
       |  CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
       |FROM cand JOIN hd sa ON cand.a = sa.doc_id JOIN hd sb ON cand.b = sb.doc_id
       |WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.8
       |ORDER BY a, b""".stripMargin) { (s, dir) =>
    Dedup.nearDuplicates(Tables.documents(s, dir), col("doc_id"), col("text"), threshold = 0.8)
      .orderBy(col("a"), col("b"))
  }

  /** d43 — SimHash fingerprints (bit-majority of token hashes). */
  val d43Simhash: Q = Q(
    "d43_simhash",
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |h2 AS (SELECT doc_id, list_transform(t, tok -> ${polyHashSql("tok")}) AS hs FROM toks)
       |SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), b ->
       |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(hs, h -> CASE WHEN ((h >> b) & 1) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
       |           (a2, x) -> a2 + x) > 0
       |    THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
       |    (acc, x) -> acc + x) AS simhash
       |FROM h2 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.simhash32(Tables.documents(s, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  /** d44 — embedding-cosine near-dup pairs within coarse cells (IVF
    * layout: label = cell id; pair cost is partition-local). */
  val d44EmbeddingNearDup: Q = Q(
    "d44_embedding_neardup",
    s"""SELECT a.vec_id AS a, b.vec_id AS b,
       |  ${dotSql("a.embedding", "b.embedding")} AS score
       |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${dotSql("a.embedding", "b.embedding")} >= 0.3
       |ORDER BY a, b""".stripMargin) { (s, dir) =>
    Similarity.nearDupPairs(Tables.embeddings(s, dir), 0.3)
      .orderBy(col("a"), col("b"))
  }

  /** s50 — exact brute-force top-3 cosine neighbors for the query set
    * (every 50th vector); the correctness baseline for ANN. */
  val s50KnnBrute: Q = Q(
    "s50_knn_brute",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         ${dotSql("q.qe", "c.embedding")} AS score
       |       FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id),
       |rk AS (SELECT query_id, neighbor_id, score,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
       |       FROM sc)
       |SELECT query_id, rank, neighbor_id, score FROM rk WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 50 === 0), 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** s51 — IVF-style top-3: candidates restricted to the query's cell
    * (the 100 TB path: probe one partition, not the corpus). */
  val s51KnnIvf: Q = Q(
    "s51_knn_ivf",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS cell FROM embeddings WHERE vec_id % 50 = 0),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         ${dotSql("q.qe", "c.embedding")} AS score
       |       FROM embeddings c JOIN q ON c.label = q.cell WHERE c.vec_id <> q.query_id),
       |rk AS (SELECT query_id, neighbor_id, score,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
       |       FROM sc)
       |SELECT query_id, rank, neighbor_id, score FROM rk WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 50 === 0), 3)
      .orderBy(col("query_id"), col("rank"))
  }

  private def lexSql(lang: String): String =
    TextAnalysis.Lexicons(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  private def ratioSql(lang: String): String =
    s"CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> list_contains(${lexSql(lang)}, x))) AS DOUBLE) / len(t) ELSE 0.0 END"

  /** t60 — text quality features (length / stopword stats). */
  val t60TextQuality: Q = Q(
    "t60_text_quality",
    s"""WITH toks AS (SELECT doc_id, length(text) AS n_chars_actual, ${tokensSql("text")} AS t FROM documents)
       |SELECT doc_id,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(n_chars_actual AS BIGINT) AS n_chars_actual,
       |  CASE WHEN len(t) > 0 THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(t, x -> CAST(length(x) AS BIGINT))), (acc, x) -> acc + x) AS DOUBLE) / len(t) ELSE 0.0 END AS avg_token_len,
       |  ${ratioSql("en")} AS stopword_ratio
       |FROM toks ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.qualityFeatures(Tables.documents(s, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** t61 — language-ID heuristic (stopword-lexicon scores + argmax). */
  val t61LangId: Q = Q(
    "t61_langid",
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |sc AS (SELECT doc_id,
       |  ${ratioSql("en")} AS en_score,
       |  ${ratioSql("de")} AS de_score,
       |  ${ratioSql("es")} AS es_score
       |FROM toks)
       |SELECT doc_id, en_score, de_score, es_score,
       |  CASE WHEN greatest(en_score, de_score, es_score) < 0.02 THEN 'unknown'
       |       WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
       |       WHEN de_score >= es_score THEN 'de'
       |       ELSE 'es' END AS predicted_lang
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.langId(Tables.documents(s, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** t62 — token counting: whitespace, BPE-ish regex, chars/4. */
  val t62TokenStats: Q = Q(
    "t62_token_stats",
    s"""SELECT doc_id,
       |  CAST(len(${tokensSql("text")}) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(${graft.operators.TextHash.asciiLowerSql("text")}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens,
       |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS subword_est
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenStats(Tables.documents(s, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** t63 — document fingerprint (rolling hash of normalized text). */
  val t63Fingerprint: Q = Q(
    "t63_fingerprint",
    s"""SELECT doc_id, ${polyHashSql(graft.operators.TextHash.asciiLowerSql("text"))} AS fingerprint
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.fingerprint(Tables.documents(s, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** m70 — multimodal metadata path: payload treated as opaque bytes;
    * metadata-only projection (byte size + stable content id) reads no
    * payload at scan time thanks to column pruning. */
  val m70MultimodalMeta: Q = Q(
    "m70_multimodal_meta",
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  ${polyHashSql("text")} % 997 AS content_bucket
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        (polyHashFast(col("text")) % 997).as("content_bucket"))
      .orderBy(col("doc_id"))
  }

  /** d45 — production-kernel MinHash (xxhash64): not DuckDB-checkable,
    * rows-only gate; exists to show the fast path at 100 TB. */
  val d45MinhashFast: Q = Q.noOracle("d45_minhash_fast") { (s, dir) =>
    // posexplode_outer: a plain Generate gets an inferred size()>0
    // filter pushed below the staged projections (recomputing the
    // signature chain); sig is always length k so outer is identical
    Dedup.minhashSignaturesFast(Tables.documents(s, dir), col("doc_id"), col("text"))
      .select(col("doc_id"), posexplode_outer(col("sig")))
      .select(col("doc_id"), col("pos").cast("long").as("hash_idx"), col("col").as("minhash"))
      .orderBy(col("doc_id"), col("hash_idx"))
  }

  /** d46 — SRP-LSH sketches: 16 sign-of-projection bits per embedding
    * against fixed pseudo-random hyperplanes — the bucketing key for
    * pairwise-free embedding near-dup candidate generation (the
    * embedding analog of MinHash banding). */
  val d46SrpSketch: Q = {
    val bitTerms = (0 until 16).map { j =>
      val h = graft.operators.Similarity.hyperplane(j, 64)
        .map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * ($h)[i])),
         |  (acc, x) -> acc + x) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END""".stripMargin
    }.mkString(" + ")
    Q(
      "d46_srp_sketch",
      s"""SELECT vec_id, $bitTerms AS sketch
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // slice to the hyperplane dim like the oracle's range(1, 65)
      // truncates: a longer embedding would otherwise null the native
      // dot (length mismatch) and zero the sketch on one side only
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          graft.operators.Similarity.srpSketch(
            slice(col("embedding"), 1, 64)).as("sketch"))
        .orderBy(col("vec_id"))
    }
  }

  /** d47 — character-4-gram Jaccard near-dups with (lang, source)
    * blocking (pair cost bounded by bucket sizes, never O(n²)). */
  val d47CharNgramDedup: Q = Q(
    "d47_char_ngram_dedup",
    s"""WITH sh AS (SELECT lang, source, doc_id,
       |  list_distinct(list_transform(
       |    list_transform(range(1, greatest(length(text)-3,0)+1), i -> substring(text, i, 4)),
       |    sg -> ${polyHashSql("sg")})) AS s
       |  FROM documents)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)/(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
       |FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)/(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
       |ORDER BY a, b""".stripMargin) { (s, dir) =>
    Dedup.charNgramNearDups(Tables.documents(s, dir), col("doc_id"), col("text"),
        bucketCols = Seq("lang", "source"), n = 4, threshold = 0.8)
      .orderBy(col("a"), col("b"))
  }

  /** d48 — MinHash via the custom DeclarativeAggregate: shingle hashes
    * arrive as exploded ROWS and the codegen'd aggregate keeps the k
    * running minima (map-side partials; the shuffle carries k longs
    * per doc). The oracle computes signatures through the array-fold
    * formulation — two independent implementations, same values. */
  val d48MinhashAgg: Q = Q(
    "d48_minhash_agg",
    s"""WITH $sigCtes
       |SELECT doc_id, CAST(j AS BIGINT) AS hash_idx, sig[j+1] AS minhash
       |FROM sig CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7]) AS j)
       |ORDER BY doc_id, hash_idx""".stripMargin) { (s, dir) =>
    // explode_outer keeps docs shorter than the shingle width as one
    // null-hash row, so their aggregate evaluates to null minima
    // (matching the oracle's list_min([]) = NULL)
    val hashes = Dedup.shingleHashFrame(Tables.documents(s, dir), col("doc_id"), col("text"))
      .select(col("doc_id"), explode_outer(col("h")).as("h"))
    hashes.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.minhashAgg(col("h")).as("sig"))
      .select(col("doc_id"), posexplode_outer(col("sig")))
      .select(col("doc_id"), col("pos").cast("long").as("hash_idx"), col("col").as("minhash"))
      .orderBy(col("doc_id"), col("hash_idx"))
  }

  val all: Seq[Q] = Seq(
    d40DedupExact, d41MinhashLsh, d42NearDupPairs, d43Simhash, d44EmbeddingNearDup,
    d46SrpSketch, d47CharNgramDedup, d48MinhashAgg,
    s50KnnBrute, s51KnnIvf,
    t60TextQuality, t61LangId, t62TokenStats, t63Fingerprint,
    m70MultimodalMeta, d45MinhashFast)
}
