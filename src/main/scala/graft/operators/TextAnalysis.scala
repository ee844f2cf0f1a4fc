package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.TextHash._

/** Text-analysis operators for training-data curation: quality
  * scoring, language-ID heuristics, token counting, document
  * fingerprinting. All narrow codegen-able expressions — at 100 TB
  * these run in the scan stage with zero shuffle.
  */
object TextAnalysis {

  /** Tiny per-language stopword lexicons for the n-gram/stopword
    * language-ID heuristic (public-knowledge word lists). */
  val Lexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "un"))

  private def ratioIn(toks: Column, words: Seq[String]): Column = {
    val inSet = filter(toks, t => words.map(w => t === w).reduce(_ || _))
    when(size(toks) > 0, size(inSet).cast("double") / size(toks)).otherwise(lit(0.0d))
  }

  /** Quality features + a composite score: token count, mean token
    * length, stopword ratio, alpha ratio. Formula is fixed and
    * documented so downstream filters are reproducible. */
  def qualityFeatures(df: DataFrame, id: Column, text: Column): DataFrame = {
    // token array staged as an attribute: HOFs are interpreted (no
    // codegen CSE), so inlining `tokens(text)` into its four consumers
    // would tokenize four times per row
    val toks = col("t")
    df.select(id.as("doc_id"), length(text).cast("long").as("n_chars_actual"),
        tokens(text).as("t"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        col("n_chars_actual"),
        when(size(toks) > 0,
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
          .otherwise(lit(0.0d)).as("avg_token_len"),
        ratioIn(toks, Lexicons("en")).as("stopword_ratio"))
  }

  /** Language-ID heuristic: stopword-lexicon hit ratios per language;
    * prediction = best-scoring lexicon above a floor, else "unknown".
    * (A production system uses char n-gram profiles — same operator
    * shape: per-row scoring against broadcast profiles.) */
  def langId(df: DataFrame, id: Column, text: Column): DataFrame =
    langIdCore(df, id, text, Nil)

  private def langIdCore(df: DataFrame, id: Column, text: Column,
      extras: Seq[(String, Column)]): DataFrame = {
    val toks = col("t")
    val scored = df.select(Seq(id.as("doc_id")) ++
        extras.map { case (n, c) => c.as(n) } :+ tokens(text).as("t"): _*)
      .select(Seq(col("doc_id")) ++ extras.map { case (n, _) => col(n) } ++ Seq(
        ratioIn(toks, Lexicons("en")).as("en_score"),
        ratioIn(toks, Lexicons("de")).as("de_score"),
        ratioIn(toks, Lexicons("es")).as("es_score")): _*)
    scored.withColumn("predicted_lang", predictLang)
  }

  /** Language-ID EVALUATION against gold labels: the confusion matrix
    * (gold, predicted, n) — the classifier-audit companion to s62's
    * retrieval eval. Gold rides the scoring pass as a carried column
    * (no re-join against the corpus), and the output is one tiny
    * aggregation: at 100 TB this costs exactly one scan.
    * Per-class precision/recall divide out of the counts downstream
    * — the matrix stays all-integer (the t80/t85 rule). */
  def langIdEval(df: DataFrame, id: Column, text: Column,
      gold: Column): DataFrame =
    langIdCore(df, id, text, Seq("gold" -> gold))
      .groupBy(col("gold"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))

  /** The argmax-with-floor prediction over the three lexicon scores —
    * shared by `langId` and `languageQuality` so the rule cannot
    * drift. */
  private def predictLang: Column =
    when(greatest(col("en_score"), col("de_score"), col("es_score")) < 0.02, lit("unknown"))
      .when(col("en_score") >= col("de_score") && col("en_score") >= col("es_score"), lit("en"))
      .when(col("de_score") >= col("es_score"), lit("de"))
      .otherwise(lit("es"))

  /** ONE-PASS fusion of the quality gate's and language gate's
    * features for pipeline use: a single tokenization yields
    * `n_tokens`, `quality` (the en-stopword ratio — the same number
    * `qualityFeatures` emits as stopword_ratio) and `predicted_lang`
    * (the same rule `langId` applies). At 100 TB tokenization
    * dominates these stages, so computing both gates' inputs from one
    * token array and joining ONCE is the shape a curation pipeline
    * wants; the standalone operators remain for single-gate use. */
  def languageQuality(df: DataFrame, id: Column, text: Column): DataFrame =
    languageQualityTokens(df, id, tokens(text))

  /** [[languageQuality]] over a PRECOMPUTED token array — the fused
    * curation path feeds the span-cut survivors' kept tokens here
    * directly (tokens(array_join(kept, ' ')) == kept for this stack's
    * case-folded space-free tokens), skipping a whole-corpus
    * re-tokenize. `toksIn` must be `TextHash.tokens`-shaped (folded,
    * non-empty elements) or the scores diverge from the text form. */
  private[graft] def languageQualityTokens(df: DataFrame, id: Column,
      toksIn: Column): DataFrame = {
    val toks = col("t")
    df.select(id.as("doc_id"), toksIn.as("t"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        ratioIn(toks, Lexicons("en")).as("en_score"),
        ratioIn(toks, Lexicons("de")).as("de_score"),
        ratioIn(toks, Lexicons("es")).as("es_score"))
      .select(col("doc_id"), col("n_tokens"),
        col("en_score").as("quality"), predictLang.as("predicted_lang"))
  }

  /** [[languageQuality]]'s feature columns APPENDED to the input frame
    * — no narrow-frame-and-join-back: the features are row-local pure
    * functions of the tokens, so a pipeline that holds the full rows
    * (the curation cascade) adds them in one projection chain and
    * skips a whole corpus-scale doc_id join. `toksIn` is any
    * `TextHash.tokens`-shaped expression — tokens(text), or an
    * existing token-array attribute (then the staging alias collapses
    * to a reference and no work is duplicated). Appends `n_tokens`,
    * `quality`, `predicted_lang` after the input's columns; the token
    * array and per-language scores are staged as attributes through
    * separate projections (HOFs are interpreted — no codegen CSE).
    *
    * The count/score stage is a [[graft.functions.ComputeOnce]]
    * BARRIER: a caller's gate filter over the appended columns would
    * otherwise be pushdown-SUBSTITUTED through these projections —
    * measured before the barrier, the substituted Filter carried ~16
    * tokenize copies per row (32 split() nodes in the optimized plan;
    * the q31/t97 inlining class). The usual caveat applies: no caller
    * predicate pushes below this operator — apply source-pruning
    * filters upstream. */
  private[graft] def withLanguageQuality(df: DataFrame, toksIn: Column): DataFrame = {
    val pre = df.columns.toSeq
    Seq("graft_lq_t", "n_tokens", "en_score", "de_score", "es_score",
        "quality", "predicted_lang").foreach { c =>
      require(!pre.contains(c), s"input already has a column named $c")
    }
    val once = graft.functions.ComputeOnce.once _
    val toks = col("graft_lq_t")
    df.select(pre.map(col) :+ toksIn.as("graft_lq_t"): _*)
      .select(pre.map(col) ++ Seq(
        once(size(toks).cast("long")).as("n_tokens"),
        once(ratioIn(toks, Lexicons("en"))).as("en_score"),
        once(ratioIn(toks, Lexicons("de"))).as("de_score"),
        once(ratioIn(toks, Lexicons("es"))).as("es_score")): _*)
      .select(pre.map(col) ++ Seq(col("n_tokens"),
        col("en_score").as("quality"), predictLang.as("predicted_lang")): _*)
  }

  /** Token counting: whitespace tokens, BPE-ish regex token count
    * (letter runs / digit runs / single other chars), and the
    * chars/4 subword estimate used for quick budget math. */
  def tokenStats(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      size(tokens(text)).cast("long").as("ws_tokens"),
      regexp_count(graft.operators.TextHash.asciiLower(text),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("bpe_ish_tokens"),
      ceil(length(text).cast("double") / 4).cast("long").as("subword_est"))

  /** Document fingerprint: polynomial rolling hash of the
    * ASCII-case-folded text — the exact-dedup / shard-routing key
    * (asciiLower, not lower(): cross-engine-stable folding). */
  def fingerprint(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
      polyHashFast(graft.operators.TextHash.asciiLower(text)).as("fingerprint"))

  /** Winnowed fingerprint index (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): k-gram rolling hashes (PolyHashShingles, one
    * O(len) pass), then every w-hash sliding window selects its
    * rightmost-minimum position (WinnowPositions, O(len) monotonic
    * deque). Output rows (doc_id, pos, fp) — pos the 1-based k-gram
    * start, fp its hash: the fingerprint INDEX that powers plagiarism/
    * local-overlap detection, at a guaranteed sampling density of
    * ~2/(w+1) with every shared run of ≥ w+k−1 chars represented.
    *
    * Scale shape: both kernels are per-row codegen'd expressions in
    * the scan stage — the only post-scan op is the explode; nothing
    * shuffles. The (pos, fp) pairs are zipped into a selection-sized
    * struct array BEFORE the explode: exploding the positions and
    * recovering the hash afterwards would carry the full O(len) hash
    * array through every generated row (O(len²/w) bytes per doc — the
    * d62 lesson applied pre-emptively). The two hash consumers
    * (winnow arg + the zip lookup) reference the staged `hs` alias,
    * which CollapseProject keeps materialized (non-cheap expression
    * referenced twice), so the rolling-hash pass runs once per row.
    *
    * `ordered = true` returns the index globally sorted by
    * (doc_id, pos) — but the sort runs on the COMPACT pre-explode
    * frame (one struct-array row per doc, ordered by doc_id alone):
    * WinnowPositions emits positions strictly ascending, and
    * Generate/Project preserve per-partition row order, so exploding
    * a doc-sorted frame yields (doc_id, pos) order with a sort whose
    * comparison count is |docs| log |docs| instead of |fingerprints|
    * log |fingerprints| — at a sampling density of 2/(w+1) the index
    * has ~2·len/(w+1) rows per doc, so the row-scale sort this
    * replaces is the dominant cost of an ordered dump (measured: it
    * dominated d64 end-to-end). The compact frame is pinned through
    * the Caches registry before the sort: a global sort's range-
    * boundary sampling pass executes its child once and the shuffle
    * executes it again — unpinned, both kernel passes would run
    * twice over the full text.
    *
    * PRECONDITION (`ordered = true` only): `id` is unique per input
    * row. The compact sort orders by doc_id ALONE and relies on each
    * doc's positions being ascending within its single struct-array
    * row; duplicate-id inputs produce multiple rows per id whose
    * positions interleave non-monotonically after the doc_id-only
    * sort, breaking (doc_id, pos) order vs an ORDER BY doc_id, pos
    * oracle (the fingerprintOverlapPairs precondition class). Dedup
    * or re-key upstream; `ordered = false` has no such requirement. */
  def winnowIndex(df: DataFrame, id: Column, text: Column,
      k: Int = 4, w: Int = 8, ordered: Boolean = false): DataFrame = {
    val sel = df.select(id.as("doc_id"),
        graft.functions.PolyHashShingles.polyHashShingles(text, k).as("hs"))
      .select(col("doc_id"),
        transform(
          graft.functions.WinnowPositions.winnowPositions(col("hs"), w),
          p => struct(p.as("pos"),
            element_at(col("hs"), p.cast("int")).as("fp"))).as("sel"))
    (if (ordered) graft.Caches.pin(sel).orderBy(col("doc_id")) else sel)
      .select(col("doc_id"), explode(col("sel")).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 —
    * repeated content is the strongest single low-quality indicator):
    * distinct-token ratio, most-frequent-token fraction, duplicate
    * 2-gram fraction. The per-token frequency table is computed
    * DISTRIBUTED (explode → (doc, token) groupBy, shuffle-partitioned
    * on both keys — no per-row O(len²) array scan, no skew: a doc's
    * tokens spread over the cluster); the 2-gram signal needs only
    * distinct-vs-total counts, which stay per-row set arithmetic. */
  def repetition(df: DataFrame, id: Column, text: Column): DataFrame = {
    // ONE tokenization, one (doc, token) shuffle: the per-doc 2-gram
    // stats are computed in the same projection and RIDE THROUGH the
    // explode and both aggregations (they are per-doc constants, so
    // first()/max() carries them) — a separate grams branch would
    // re-tokenize the whole corpus, and a doc-id spine join would scan
    // the source a third time. explode_outer keeps zero-token docs: a
    // (doc, null) row contributes 0 to every count and survives to the
    // output with all-zero signals.
    df.select(id.as("doc_id"), tokens(text).as("t"))
      .select(col("doc_id"),
        greatest(size(col("t")) - 1, lit(0)).cast("long").as("total2"),
        size(shingles(col("t"), 2)).cast("long").as("distinct2"),
        explode_outer(col("t")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(col("tok")).as("n"),
        first(col("total2")).as("total2"),
        first(col("distinct2")).as("distinct2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        count(col("tok")).as("n_distinct"),
        max(col("n")).as("top_n"),
        first(col("total2")).as("total2"),
        first(col("distinct2")).as("distinct2"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        when(col("n_tokens") > 0,
          col("n_distinct").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0d)).as("distinct_token_ratio"),
        when(col("n_tokens") > 0,
          col("top_n").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0d)).as("top_token_fraction"),
        when(col("total2") > 0,
          lit(1.0d) - col("distinct2").cast("double") / col("total2"))
          .otherwise(lit(0.0d)).as("dup_2gram_fraction"))
  }

  /** Default PII patterns: email + phone-shaped digit runs. Kept to
    * RE2-safe constructs (character classes, bounded repetition — no
    * lookaround/backreferences/inline flags) so the same pattern means
    * the same thing in Java regex, RE2-based engines, and the DuckDB
    * oracle; case-insensitivity is spelled as explicit classes for the
    * same reason. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // local part includes +tags and dashes; domains include dashes —
    // "bob.smith+tag@my-site.com" must redact WHOLE, not leave
    // "+tag"/"-site.com" fragments leaking the identity
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[a-zA-Z]" -> "<EMAIL>",
    // NNN-NNNN with word boundaries: an unanchored [0-9]{3}-[0-9]{2,}
    // would corrupt every ISO date ("2023-08-12" → "2<PHONE>-12") and
    // match inside longer digit runs
    "\\b[0-9]{3}-[0-9]{4}\\b" -> "<PHONE>")

  /** PII redaction: sequentially applied regexp_replace passes (order
    * matters and is fixed: earlier patterns must not be re-matched by
    * later ones), plus a total match count per doc. Each pattern is
    * counted against the text AS THAT PASS SEES IT (i.e. after the
    * earlier replacements), so `n_redactions` equals the number of
    * replacements actually performed — counting every pattern on the
    * original text would overcount overlaps (an email whose tail also
    * looks phone-shaped) and disagree with the output. Pure narrow
    * per-row expressions — scan-stage work at 100 TB. */
  def redact(df: DataFrame, id: Column, text: Column,
      patterns: Seq[(String, String)] = PiiPatterns): DataFrame = {
    val (redacted, counts) = patterns.foldLeft((text, Seq.empty[Column])) {
      case ((c, cnts), (p, r)) =>
        (regexp_replace(c, p, r), cnts :+ regexp_count(c, lit(p)))
    }
    df.select(id.as("doc_id"), redacted.as("redacted"),
      counts.reduce(_ + _).cast("long").as("n_redactions"))
  }

  /** TF-IDF-style top terms per document — the per-doc keyword
    * extraction step of an IR / topic-labeling pipeline. Weight =
    * tf · (N / df), a RATIONAL idf: the classic log(N/df) damping is
    * deliberately omitted because ln() is a libm call whose last-ulp
    * behavior is engine/platform-dependent, and a 1-ulp flip near a
    * weight tie would reorder the top-k — tf·N/df is one IEEE multiply
    * and divide of exact integers, bit-identical everywhere, and
    * preserves the tf·idf ranking structure.
    *
    * Shuffle shape at scale: tf = (doc, term) aggregation; df = term
    * aggregation; the tf⋈df join shuffles on term (the df table is
    * vocabulary-sized — NOT broadcastable in general); the corpus size
    * rides in as a broadcast 1-row cross join; final top-k is a per-doc
    * window. */
  def tfidfTopTerms(df: DataFrame, id: Column, text: Column,
      k: Int = 3): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
    val tf = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // df derives from tf (one row per distinct (doc, term) already) —
    // a separate tok.distinct() would tokenize and shuffle the corpus
    // a second time for identical values
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("weight").desc, col("tok"))
    tf.join(dft, "tok")
      .crossJoin(broadcast(n))
      .withColumn("weight", col("tf").cast("double") * col("n") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok").as("term"), col("weight"))
  }

  /** Corpus-derived document frequency + per-doc coverage of the
    * corpus-top terms — the two-pass shape of every corpus-level
    * statistic (IDF tables, corpus-adaptive stopword lists): pass 1
    * aggregates the distinct (doc, term) pairs into a DF table and
    * takes the top `k` terms (deterministic tie-break: df DESC, term
    * ASC); pass 2 broadcasts that tiny set back against the exploded
    * corpus. The broadcast is what makes pass 2 shuffle-free at
    * 100 TB — the only wide ops are the two bounded aggregations. */
  def corpusTopDfRatio(df: DataFrame, id: Column, text: Column,
      k: Int = 20): DataFrame = {
    // ONE tokenization + one (doc, token) shuffle: the tf aggregate is
    // persisted and BOTH passes derive from it — the DF table is a
    // term-level regroup of tf (each distinct (doc, token) pair counts
    // once), and the per-doc coverage re-aggregates tf's counts. The
    // earlier formulation re-tokenized the corpus for each pass and
    // scanned the source a third time for the doc spine (explode_outer
    // keeps zero-token docs instead). Cache contract as elsewhere
    // (nearDuplicates): pinned via graft.Caches, released at the
    // caller's Caches.releaseAll() boundary.
    val tf = df.select(id.as("doc_id"), explode_outer(tokens(text)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(col("tok")).as("n"))
      .transform(d => graft.Caches.pin(d))
    val top = tf.filter(col("tok").isNotNull)
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc)
      .limit(k)
      .select(col("tok"), lit(1).as("in_top"))
    tf.join(broadcast(top), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("in_top") === 1, col("n")).otherwise(lit(0L))).as("n_top"))
      .select(col("doc_id"),
        col("n_tokens"),
        when(col("n_tokens") > 0,
          col("n_top").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0d)).as("top_df_ratio"))
  }

  /** Count-min sketch over corpus token frequencies — the
    * bounded-memory frequency summary (Cormode & Muthukrishnan 2005)
    * whose table is a MERGEABLE, partial-aggregable artifact: row i,
    * bucket ((a_i·H + b_i) mod P) mod `w` over the portable hash
    * family (TextHash.A/B — the same affine mixers MinHash uses), so
    * the whole construction is exact integer arithmetic an
    * independent engine can replay. Counts are fed PRE-AGGREGATED
    * (the t76 lesson: occurrences collapse to vocabulary-sized
    * (token, cnt) rows in a codegen'd hash aggregate first), and the
    * sketch aggregation is an ordinary groupBy — map-side combinable,
    * which IS the mergeable-summaries property: per-shard sketches
    * sum cell-wise into the corpus sketch without rescanning.
    * Output: (row_idx, bucket, cnt), d·w rows total. */
  def cmSketch(df: DataFrame, text: Column, d: Int = 4, w: Int = 64): DataFrame =
    cmSketchFromCounts(
      df.select(explode(tokens(text)).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt")),
      d, w)

  /** Same sketch from an already-aggregated (tok, cnt) frame — the
    * entry point when the caller owns the token counts (one
    * tokenization serving the sketch, the probe set, and the exact
    * re-check). */
  def cmSketchFromCounts(cnts: DataFrame, d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && d <= TextHash.A.size, s"d must be in [1, ${TextHash.A.size}]")
    require(w >= 1, s"w must be positive, got $w")
    // ONE scan with the d rows exploded from an inline array, not a
    // d-branch unionAll (r20, guide §2.4): the union spelled d map
    // subtrees over the counts frame, each re-evaluating the token
    // hash — same rows, d× the scan pipelines and hash evals. The
    // ComputeOnce barrier keeps CollapseProject from inlining the
    // costly hash into each of the d struct legs.
    val hashed = cnts.select(
      graft.functions.ComputeOnce.once(polyHashFast(col("tok"))).as("hh"),
      col("cnt"))
    val rows = hashed.select(explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("row_idx"),
          ((col("hh") * TextHash.A(i) + TextHash.B(i)) % TextHash.P % w)
            .as("bucket"))
      }: _*)).as("rb"), col("cnt"))
      .select(col("rb.row_idx").as("row_idx"), col("rb.bucket").as("bucket"),
        col("cnt"))
    rows.groupBy(col("row_idx"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates from a count-min sketch: est(tok) = min over
    * rows of the token's bucket cell — never an underestimate, over
    * by at most the collision mass (≤ n/w per row in expectation).
    * `probes` is (tok) — the small side; the d·w-cell sketch
    * broadcasts, so probing is shuffle-free regardless of probe
    * count. Output: (tok, cm_est). */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, d: Int = 4,
      w: Int = 64): DataFrame = {
    // same union→explode fusion as cmSketchFromCounts (r20)
    val pr = probes.select(col("tok"),
      graft.functions.ComputeOnce.once(polyHashFast(col("tok"))).as("hh"))
    val keyed = pr.select(col("tok"), explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("row_idx"),
          ((col("hh") * TextHash.A(i) + TextHash.B(i)) % TextHash.P % w)
            .as("bucket"))
      }: _*)).as("rb"))
      .select(col("tok"), col("rb.row_idx").as("row_idx"),
        col("rb.bucket").as("bucket"))
    // LEFT join + coalesce-0: an EMPTY cell means count 0 in CM
    // semantics — an inner join would silently drop (or overestimate)
    // a probe the corpus never saw, instead of answering 0
    keyed.join(broadcast(sketch), Seq("row_idx", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Corpus-bigram language-model fit signals — the shape of an
    * n-gram-LM quality filter (KenLM-style scoring, reduced to the
    * engine-checkable core): a bigram count table is trained on the
    * corpus itself, and every document is scored against it. Per doc:
    * `n_bigrams`, `sum_pair` = Σ corpus-count(w1 w2), `sum_left` =
    * Σ corpus-count(w1 ·) over its bigram occurrences. The (lazy)
    * conditional fit sum_pair/sum_left is left to the caller — the
    * outputs are EXACT BIGINTs so cross-engine checks never meet
    * float summation order.
    *
    * Scale shape: one tokenize + one (doc, bigram) aggregation; the
    * pair table derives from it and the left-word table derives from
    * the PAIR table (vocabulary-sized, not corpus-sized). The probe
    * joins are shuffle hash joins on the bigram/left-word keys — the
    * count tables grow with vocabulary², so neither is broadcast;
    * stop-word-headed keys skew and AQE's skew-join split handles
    * them (or pre-salt with Skew.saltedJoin). Docs with < 2 tokens
    * have no bigrams and drop out, as in the SQL twin.
    *
    * Cache contract as elsewhere: the (doc, bigram) aggregate is
    * pinned via graft.Caches (three consumers), released at the
    * caller's Caches.releaseAll() boundary. */
  /** Per-(doc, bigram) occurrence counts — the shared front of the
    * bigram-LM family. Bigram strings come from the native one-pass
    * WordShingles kernel — element w IS
    * concat_ws(' ', tokens[w], tokens[w+1]) by the kernel's contract
    * (property-tested string equality in PolyHashSpec), so the
    * relational oracles are unchanged; the former interpreted
    * concat-per-window HOF was the t97/d59 anti-pattern. explode_outer,
    * not explode: a plain Generate lets the optimizer infer a
    * size(...) > 0 filter that would re-run the kernel per row (the
    * round-1 lesson); short docs' empty arrays yield null rows that
    * drop after the aggregate instead. */
  private def bigramCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
        graft.functions.WordShingles.wordShingles(text, 2).as("bgs"))
      .select(col("doc_id"), explode_outer(col("bgs")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .filter(col("bg").isNotNull)

  /** The per-doc LM fit aggregates over a joined (doc_id, n, c2, c1)
    * frame — factored so the r14 overflow spec can drive them with
    * synthetic near-2⁶³ counts no small fixture can produce. n·c2 and
    * its per-doc sum run in DECIMAL(38,0): c2 is corpus-bigram-bounded
    * (~2×10¹³ at 100 TB) and n doc-length-bounded (~10⁶), so a hot
    * bigram recurring through a large doc passes 2⁶³ AT the design
    * point — ANSI long arithmetic would throw engine-side (the r14
    * integer-overflow sweep). sum_pair/sum_left therefore leave the
    * operator as decimal, and the catalogue queries EMIT them as
    * digit strings (the t84 round-8 rule: wider-than-BIGINT integers
    * cross a compared schema as VARCHAR, never DECIMAL or BIGINT). */
  private[graft] def lmAggCols(nullSafe: Boolean): Seq[Column] = {
    def d(name: String) = {
      val dec = col(name).cast(DecimalType(38, 0))
      if (nullSafe) coalesce(dec, lit(0).cast(DecimalType(38, 0))) else dec
    }
    Seq(
      sum(col("n")).cast("long").as("n_bigrams"),
      sum(col("n") * d("c2")).cast(DecimalType(38, 0)).as("sum_pair"),
      sum(col("n") * d("c1")).cast(DecimalType(38, 0)).as("sum_left"))
  }

  def bigramLm(df: DataFrame, id: Column, text: Column): DataFrame = {
    val bgc = bigramCounts(df, id, text)
      .transform(d => graft.Caches.pin(d))
    val pair = bgc.groupBy(col("bg")).agg(sum(col("n")).as("c2"))
    // left-word counts from the PAIR table: tokens carry no spaces, so
    // the left word is recoverable by split — no second corpus pass
    val lft = pair
      .select(element_at(split(col("bg"), " "), 1).as("w1"), col("c2"))
      .groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    bgc
      .join(pair, Seq("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(lft, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(lmAggCols(nullSafe = false).head,
        lmAggCols(nullSafe = false).tail: _*)
      .select(col("doc_id"), col("n_bigrams"),
        col("sum_pair").cast("string").as("sum_pair"),
        col("sum_left").cast("string").as("sum_left"))
  }

  // ---- BPE tokenizer training ----------------------------------------

  /** (word, freq) over the case-folded token stream — the vocabulary
    * pre-aggregation every BPE pass runs on (corpus-sized occurrences
    * collapse to vocab-sized rows BEFORE any per-character work — the
    * t76 heavy-hitters lesson applied to tokenizer training). */
  private def wordFreq(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  private def charsOf(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent-symbol pair counts weighted by word frequency — the
    * statistic a BPE training step maximizes (Sennrich et al. 2016).
    * Word boundaries block pairs (classic BPE: merges never cross
    * words), so counting is per-DISTINCT-word work times a weight.
    * Output: (a, b, cnt), the `topK` most frequent pairs ranked
    * (cnt DESC, a, b) — the tie rule that makes training runs
    * reproducible across engines and cluster layouts. */
  def bpePairStats(df: DataFrame, text: Column, topK: Int = 10): DataFrame = {
    val pc = bpePairCounts(wordFreq(df, text))
    val w = Window.orderBy(col("cnt").desc, col("a"), col("b"))
    // rank AFTER the top-k limit: the single-partition window sees
    // topK rows, never the pair table
    pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("a"), col("b"), col("cnt"))
  }

  /** Adjacent-pair counts over a (freq, syms) symbolized vocabulary —
    * the per-round statistic of BPE training. */
  private def symPairCounts(withSyms: DataFrame): DataFrame =
    withSyms.select(col("freq"), col("syms").as("cs"))
      .filter(size(col("cs")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("cs")) - 1),
          i => struct(element_at(col("cs"), i).as("a"),
            element_at(col("cs"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  private def bpePairCounts(wf: DataFrame): DataFrame =
    symPairCounts(wf.select(col("freq"), charsOf(col("word")).as("syms")))

  /** One greedy left-to-right merge pass of `pair` over a symbol
    * array: scan with a one-symbol carry — merge when (carry, next)
    * is the pair, else emit the carry. The overlapping-run case
    * (a == b) falls out of the carry reset: "aaa" merges once. */
  private[graft] def mergeFold(cs: Column, a: Column, b: Column): Column = {
    val zero = struct(
      array().cast("array<string>").as("r"),
      lit(null).cast("string").as("c"))
    aggregate(cs, zero,
      (acc, x) => {
        val r = acc.getField("r")
        val c = acc.getField("c")
        when(c.isNull, struct(r.as("r"), x.as("c")))
          .when(c === a && x === b,
            struct(concat(r, array(concat(a, b))).as("r"),
              lit(null).cast("string").as("c")))
          .otherwise(struct(concat(r, array(c)).as("r"), x.as("c")))
      },
      acc => when(acc.getField("c").isNull, acc.getField("r"))
        .otherwise(concat(acc.getField("r"), array(acc.getField("c")))))
  }

  /** One full BPE training step: find the most frequent adjacent
    * symbol pair (ties → lexicographically smallest, via the
    * min(struct(-cnt, a, b)) aggregation — never a global window) and
    * apply its merge greedily left-to-right to every vocabulary word.
    * Returns the AFFECTED words (symbol count shrank):
    * (word, freq, merged_s) with the merged symbols '|'-joined.
    *
    * The engine applies the merge as a per-word carry fold
    * (interpreted HOF — vocab-sized × word-length, not corpus-sized);
    * the oracle applies it through an independent runs-parity
    * relational formulation (match positions → overlap runs → odd
    * ranks merge). Two formulations of greedy agreeing IS the check,
    * the d49 closure-twin pattern. Iterating this step k times (with
    * the learned symbol inventory threaded back through) is BPE
    * training; the single distributed step is the engine primitive.
    *
    * Scale shape: one corpus tokenize + vocab aggregation; the pair
    * table aggregates map-side; the 1-row top pair broadcasts into
    * the per-word fold. Nothing but the tokenize touches corpus
    * scale. The vocab frame pins (pair counting + merge apply — two
    * consumers) per the Caches contract. */
  def bpeMergeStep(df: DataFrame, text: Column): DataFrame = {
    val wf = wordFreq(df, text).transform(d => graft.Caches.pin(d))
    val top = bpePairCounts(wf)
      .agg(min(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("t"))
      .select(col("t.a").as("ta"), col("t.b").as("tb"))
    wf.crossJoin(broadcast(top))
      .select(col("word"), col("freq"),
        mergeFold(charsOf(col("word")), col("ta"), col("tb")).as("m"))
      .filter(size(col("m")) < length(col("word")))
      .select(col("word"), col("freq"), array_join(col("m"), "|").as("merged_s"))
  }

  /** Full BPE tokenizer training (Sennrich et al. 2016): `merges`
    * iterations of pair-count → deterministic top pair → greedy merge
    * over the symbolized vocabulary. Returns the learned merge table
    * (step, a, b, cnt) — the artifact a tokenizer ships.
    *
    * The loop never collects: each round's winner is a 1-row frame
    * picked by the min(struct(-cnt, a, b)) aggregation and broadcast
    * into the next symbolization; rounds are eager `Caches.checkpoint`s
    * (a lazily-chained loop doubles the plan per iteration — the
    * round-3 lesson), with round k−1's blocks released as soon as
    * round k materializes, so loop storage stays bounded at two
    * vocab-sized frames. Per-round cost after the one corpus tokenize
    * is vocabulary-sized — the corpus is never rescanned.
    *
    * Result frames are checkpoint-backed: invalid after the caller's
    * `Caches.releaseAll()` boundary (the library-wide contract). */
  def bpeTrain(df: DataFrame, text: Column, merges: Int): DataFrame =
    bpeTrainLoop(df, text, merges)._1

  /** The training loop, also returning the FINAL symbolized vocabulary
    * (word, freq, syms) — what `bpeEncode` tokenizes the corpus with.
    * Both frames are checkpoint-backed (invalid past releaseAll). */
  private def bpeTrainLoop(df: DataFrame, text: Column,
      merges: Int): (DataFrame, DataFrame) = {
    require(merges >= 1 && merges <= 64, s"merges $merges out of [1, 64]")
    var (vocab, releaseVocab) = graft.Caches.checkpoint(
      wordFreq(df, text)
        .select(col("word"), col("freq"), charsOf(col("word")).as("syms")))
    var out: DataFrame = null
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val top = symPairCounts(vocab)
        .agg(min(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("t"))
        .select(lit(step.toLong).as("step"), col("t.a").as("a"),
          col("t.b").as("b"), (-col("t.nc")).as("cnt"))
        // a PAIRLESS vocabulary (empty corpus, or every word already a
        // single symbol) gives this GLOBAL aggregate one all-null row,
        // not a winner — unfiltered it emitted null merge rows, and
        // the cross-join below with an empty winner would wrongly
        // EMPTY the vocabulary (the r15 empty-corpus sweep)
        .filter(col("a").isNotNull)
      // materialize the winner NOW (1 row): later rounds and the final
      // union must not re-derive it from a released vocab
      val (topC, _) = graft.Caches.checkpoint(top)
      if (topC.isEmpty) {
        // no pair anywhere — no later round can find one either; stop,
        // returning the merges learned so far (possibly none)
        out = if (out == null) topC else out
        exhausted = true
      } else {
        out = if (out == null) topC else out.union(topC)
        val (nextVocab, releaseNext) = graft.Caches.checkpoint(
          vocab.crossJoin(broadcast(
              topC.select(col("a").as("ta"), col("b").as("tb"))))
            .select(col("word"), col("freq"),
              mergeFold(col("syms"), col("ta"), col("tb")).as("syms")))
        releaseVocab()
        vocab = nextVocab
        releaseVocab = releaseNext
      }
      step += 1
    }
    (out, vocab)
  }

  /** BPE encode: tokenize the corpus with a freshly trained merge
    * table — the apply side of `bpeTrain`, reporting per-doc token
    * statistics (whitespace words, post-merge BPE symbols, raw
    * characters). The corpus's token occurrences join the symbolized
    * vocabulary on the word key (vocabulary is unbounded at corpus
    * scale, so this is a shuffle join, not a broadcast — same
    * argument as t71's probe joins), then per-doc sums. Nothing but
    * the tokenize and the (doc, word) aggregation touches corpus
    * scale. Output: (doc_id, n_words, n_syms, n_chars). */
  def bpeEncode(df: DataFrame, id: Column, text: Column,
      merges: Int): DataFrame = {
    val vocab = bpeTrainLoop(df, text, merges)._2
    val docTok = df.select(id.as("doc_id"), explode(tokens(text)).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
    docTok
      .join(vocab.select(col("word"), size(col("syms")).as("nsym"),
        length(col("word")).as("nchr")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_words"),
        sum(col("n") * col("nsym")).cast("long").as("n_syms"),
        sum(col("n") * col("nchr")).cast("long").as("n_chars"))
  }

  /** KenLM/CCNet-style LM quality gate: a bigram count table is fit on
    * a trusted REFERENCE corpus `ref`, every doc of `df` is scored
    * against it, and docs whose fit ratio sum_pair/sum_left reaches
    * (num/den)× the corpus-aggregate fit Σsp/Σsl survive.
    *
    * Training on the reference — not on `df` itself — is what makes
    * this a quality signal: scored against a self-trained LM, a doc of
    * unique-token soup is a PERFECT fit (each singleton bigram is
    * deterministic given its unique left word — p(w2|w1)=1), so
    * self-fit rewards exactly the docs a filter must drop (found by
    * this operator's own unit fixture). Against a reference LM its
    * bigrams are simply unseen: both probe joins are LEFT joins with
    * count 0 for misses, gibberish scores 0, and a doc with NO
    * reference-attested left context (sum_left = 0) fails the gate
    * outright — no evidence is not good evidence.
    *
    * The threshold is corpus-RELATIVE because the absolute ratio
    * shrinks as corpus and vocabulary grow — a fixed cut that splits
    * a 1 GB corpus keeps nothing at 100 TB; the relative form is
    * scale-free (measured: ~47% kept at sf0.01, ~50% at sf0.1, same
    * gate). The decision sp·Σsl·den ≥ sl·Σsp·num is exact rational
    * cross-multiplication in decimal(38,0) — no float division, so
    * every engine decides every doc identically, and products of two
    * count sums (past 2⁶³ at corpus scale) can't overflow. num = 0
    * disables the gate (every scored doc survives).
    *
    * Plan shape: two bigram-count aggregations (probe + reference;
    * the reference tables are vocabulary²-sized, so the probe joins
    * shuffle rather than broadcast — the t71 skew note applies), one
    * broadcast 1-row total, a per-row filter. The reference pair table
    * and the lm frame pin via graft.Caches (two consumers each). */
  def lmQualityGate(df: DataFrame, id: Column, text: Column,
      ref: DataFrame, refId: Column, refText: Column,
      num: Long = 1, den: Long = 1): DataFrame = {
    require(num >= 0 && den > 0, s"threshold $num/$den must be >= 0 with den > 0")
    val bgc = bigramCounts(df, id, text)
    val pair = bigramCounts(ref, refId, refText)
      .groupBy(col("bg")).agg(sum(col("n")).as("c2"))
      .transform(d => graft.Caches.pin(d))
    val lft = pair
      .select(element_at(split(col("bg"), " "), 1).as("w1"), col("c2"))
      .groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // per-doc sums in DECIMAL(38,0) (lmAggCols: n·c2 passes 2⁶³ at
    // the 100 TB design point under ANSI long arithmetic); the gate's
    // cross-multiplication stays inside decimal(38,0) for natural
    // Zipf corpora at 100 TB (sum_pair·tsl ~ 10³⁷) — an adversarial
    // hot-word corpus can exceed it, at which point BOTH engines
    // throw the same decimal overflow (bound documented, NOTES r14)
    val lm = bgc
      .join(pair, Seq("bg"), "left")
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(lft, Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(lmAggCols(nullSafe = true).head, lmAggCols(nullSafe = true).tail: _*)
      .transform(d => graft.Caches.pin(d))
    val tot = lm.agg(
      sum(col("sum_pair")).as("tsp"),
      sum(col("sum_left")).as("tsl"))
    val pass =
      if (num == 0) lit(true)
      else col("sum_left") > 0 &&
        col("sum_pair") * col("tsl") * lit(den) >=
        col("sum_left") * col("tsp") * lit(num)
    lm.crossJoin(broadcast(tot))
      .filter(pass)
      .select(col("doc_id"), col("n_bigrams"),
        col("sum_pair").cast("string").as("sum_pair"),
        col("sum_left").cast("string").as("sum_left"))
  }

  /** Linear model scoring over hashed bag-of-words features — the
    * fasttext-style quality-classifier apply step. Tokens hash into
    * `buckets` feature slots (polynomial rolling hash, the corpus-wide
    * portable family); `weights` IS the model — a (bucket, wgt)
    * integer-weight table, broadcast (a hashed vocabulary is 2⁶–2²⁰
    * rows, always dimension-bounded, never corpus-bounded). Score =
    * Σ_occurrences wgt(bucket(tok)) in exact BIGINT; train elsewhere,
    * quantize to integer weights, score anywhere — bit-identical.
    *
    * Plan shape at 100 TB: explode → hash → broadcast-hash join →
    * partial-combinable sum keyed on doc_id. The only shuffle is the
    * final per-doc aggregation; the model never shuffles.
    */
  def hashedLinearScore(df: DataFrame, id: Column, text: Column,
      buckets: Int, weights: DataFrame): DataFrame =
    df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .withColumn("bucket", pmod(polyHashFast(col("tok")), lit(buckets.toLong)))
      .join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("wgt")).cast("long").as("score"))

  /** Exact phrase search over a positional posting list — the
    * retrieval-side complement of `bm25TopDocs` (BM25 ranks bags of
    * words; phrases need POSITIONS). Each phrase term's postings are
    * normalized to the would-be phrase START (pos − term offset) and
    * the legs intersect on (doc, start): a surviving row is a genuine
    * consecutive occurrence. Only postings of the phrase's terms leave
    * the scan stage (term filter on the explode), joins are keyed
    * (doc, start) — per-term-frequency bounded, never corpus-bounded.
    * Output: (doc_id, n_hits > 0). */
  def phraseSearch(df: DataFrame, id: Column, text: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    val pos = df.select(id.as("doc_id"),
      posexplode(tokens(text)).as(Seq("pos", "tok")))
    val legs = phrase.zipWithIndex.map { case (w, i) =>
      pos.filter(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** BM25-family relevance ranking of the corpus against a small
    * query-term set, in EXACT fixed-point arithmetic — the retrieval
    * step of retrieval-augmented curation (rank the corpus against a
    * topic probe, keep/inspect the head). Okapi BM25 with k1 = 6/5,
    * b = 3/4 and the RATIONAL odds idf (2N − 2df + 1)/(2df + 1): the
    * standard formulation wraps that odds in ln(·), a transcendental
    * whose last-ulp value is implementation-defined — per-term doc
    * ranking is unchanged by the (monotone) ln, and dropping it keeps
    * every comparison bit-reproducible across engines and platforms
    * (the t80 design rule: no float enters any decision). With
    * avgdl = T/N (T = corpus tokens, N = corpus docs) the per-term
    * contribution folds to one exact integer fraction:
    *
    *   idf_r · tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl))
    *     = 22·T·tf·(2N − 2df + 1) / ((2df + 1)·(10·tf·T + 3·T + 9·dl·N))
    *
    * scored as floor(10⁶·num/den) in decimal(38,0) (the products pass
    * 2⁶³ at corpus scale; the quotient is micro-units ≤ ~10¹²·so a
    * long), and per-doc scores are exact BIGINT sums of those units.
    *
    * Plan shape at 100 TB: dl is a NARROW size(tokens) projection (no
    * explode); only postings matching the query terms are shuffled
    * (the isin filter runs in the scan stage, so the (doc, term)
    * aggregate sees query-matched occurrences, not the corpus); the
    * df table is ≤ |terms| rows and broadcast; corpus totals ride in
    * as a broadcast 1-row cross join; the final top-k is an
    * orderBy·limit (TakeOrderedAndProject — per-partition heaps, no
    * global sort). Docs matching no query term score 0 and are
    * absent, the sparse-retrieval convention. */
  /** Per-source distribution DRIFT against the corpus: the total-
    * variation distance TV(s, corpus) = ½ Σ_tok |p_s(tok) − p(tok)|
    * between each source's token distribution and the corpus-wide one
    * — the data-ops monitor for "did this source/snapshot shift"
    * (KL/JS need logarithms, which are not portably exact; TV is a
    * pure rational and stays bit-checkable, the t80 rule). Emitted as
    * the exact integer fraction (tv_num, tv_den):
    * TV = tv_num / tv_den with tv_num = Σ |c_s·T − c·T_s| and
    * tv_den = 2·T_s·T, computed in DECIMAL(38,0) (c·T passes 2⁶³ at
    * corpus scale) and EMITTED as VARCHAR digit strings — the
    * compared schema never carries DECIMAL (round-8 portability
    * rule).
    *
    * Tokens ABSENT from a source still contribute |0 − c·T_s| — but no
    * source×vocab cross join is ever built: over absent tokens the sum
    * telescopes to T_s·(T − Σ_{tok∈Vs} c(tok)), so each source only
    * touches ITS OWN vocabulary rows plus one corpus total. Plan
    * shape: one (source, tok) count (map-side combined), the corpus
    * counts derived FROM it (second tiny aggregate — the raw stream is
    * never re-shuffled), a vocab-sized join keyed on tok, and
    * broadcast totals. Output: (source, n_tokens, tv_num, tv_den). */
  def tokenDistributionDrift(df: DataFrame, source: Column,
      text: Column): DataFrame = {
    val cs = df.select(source.as("source"), explode(tokens(text)).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("graft_cs"))
      .transform(d => graft.Caches.pin(d))
    val corpus = cs.groupBy(col("tok")).agg(sum(col("graft_cs")).as("graft_c"))
    val perSource = cs.groupBy(col("source")).agg(sum(col("graft_cs")).as("graft_ts"))
    val total = corpus.agg(sum(col("graft_c")).as("graft_t"))
    cs.join(corpus, "tok")
      .join(broadcast(perSource), "source")
      .crossJoin(broadcast(total))
      .groupBy(col("source"))
      .agg(
        max(col("graft_ts")).as("n_tokens"),
        sum(expr(
          """abs(CAST(graft_cs AS DECIMAL(38,0)) * graft_t
            |    - CAST(graft_c AS DECIMAL(38,0)) * graft_ts)""".stripMargin))
          .as("graft_present"),
        sum(col("graft_c")).as("graft_shared"),
        max(col("graft_t")).as("graft_t"))
      .select(col("source"), col("n_tokens"),
        // the 38-digit integers exceed BIGINT, so the COMPARED output
        // carries them as VARCHAR digit strings (scale-0 decimal →
        // string is the plain digit render on every engine) — DECIMAL
        // itself never appears in an output schema (round-8 rule:
        // DECIMAL representation is hash-visible across oracle builds
        // even when every cell compares equal).
        (col("graft_present").cast(DecimalType(38, 0)) +
          col("n_tokens").cast(DecimalType(38, 0)) *
            (col("graft_t") - col("graft_shared")).cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).cast("string").as("tv_num"),
        (lit(2).cast(DecimalType(38, 0)) *
          col("n_tokens").cast(DecimalType(38, 0)) *
          col("graft_t").cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).cast("string").as("tv_den"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of several retrieval
    * rankings — the hybrid-retrieval combiner (sparse BM25 ⊕ dense
    * ANN is the standard pairing) — in exact fixed point:
    * score(d) = Σ_lists unit div (k + rank_d), summed over the lists
    * that ranked d. Ranks are small integers and the reciprocal is a
    * truncating integer division, so the fused score is BIGINT-exact
    * and cross-engine (the t80 rule); k = 60 is the canonical
    * dampening constant. Inputs: (id, rank) frames with rank ≥ 1 and
    * unique ids per list (the product of any top-k ranker); each list
    * is its cut's size (k·|lists| rows total), so the fusion is a
    * union + one tiny keyed aggregation — never corpus-scale work.
    * Output: (id, rrf_fp, n_lists). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60,
      unit: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"k must be non-negative, got $k")
    rankings
      .map(_.select(col("id").cast("long").as("id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionAll _)
      .select(col("id"),
        expr(s"CAST($unit AS BIGINT) div (CAST($k AS BIGINT) + rank)")
          .as("graft_contrib"))
      .groupBy(col("id"))
      .agg(sum(col("graft_contrib")).as("rrf_fp"),
        count(lit(1)).as("n_lists"))
  }

  def bm25TopDocs(df: DataFrame, id: Column, text: Column,
      terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25TopDocs needs at least one query term")
    val base = df.select(id.as("doc_id"), size(tokens(text)).as("dl"))
    val totals = base.agg(sum(col("dl")).cast("long").as("tt"),
      count(lit(1)).as("nn"))
    val tf = df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "tok")
      .join(base, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("contrib", expr(
        """(CAST(22000000 AS DECIMAL(38,0)) * tt * tf * (2*nn - 2*df + 1)) div
          |(CAST(2*df + 1 AS DECIMAL(38,0)) * (10*tf*tt + 3*tt + 9*dl*nn))""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** KMV (k-minimum-values / bottom-k, the theta-sketch family) set
    * sketches per source, with pairwise union/intersection estimator
    * statistics AND the exact truth — the distinct-counting analog of
    * d71's MinHash calibration. A KMV sketch is the k smallest
    * distinct token hashes of a source; sketches union by merging and
    * re-taking the bottom k, and the classic estimators read off the
    * output integers (distinct-union ≈ (k−1)·P/theta with theta the
    * union sketch's k-th value; intersection ≈ union-est ·
    * kmv_inter/k). No float leaves the operator — the sufficient
    * statistics are BIGINTs (the t80/t85 rule).
    *
    * Scale shape: one token scan → per-source distinct hashes → one
    * bottom-k window per source (bounded output k·|sources|); the
    * pairwise stage runs entirely on sketches (k rows per source),
    * never on the corpus. The EXACT columns exist for the audit and
    * cost a real distinct-pair aggregation — production drops them
    * and keeps the sketch-only path, which is the point of KMV.
    *
    * Output per source pair (s1 < s2): (s1, s2, kmv_theta — the
    * LARGEST value retained in the merged-bottom-k union sketch,
    * kmv_inter — union-sketch members present in BOTH full sketches,
    * kmv_union_k — the union sketch's actual size, exact_inter,
    * exact_union).
    *
    * Saturation caveat: kmv_theta is the k-th smallest of the union
    * only when the union sketch is FULL (kmv_union_k = k). When the
    * pair's distinct union has fewer than k hashes the sketch is
    * unsaturated, kmv_theta is just the union's max, and the
    * saturated estimator (k−1)·P/theta systematically OVERESTIMATES.
    * Downstream must branch on kmv_union_k: unsaturated → the union
    * is exactly kmv_union_k distinct values (use it directly, or the
    * unbiased small-set form (kmv_union_k−1)·P/theta); saturated →
    * the classic (k−1)·P/theta. That is why the sketch size is a
    * first-class output column and not recoverable from theta. */
  def kmvSourceOverlap(df: DataFrame, source: Column, text: Column,
      k: Int = 32): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    val tk = df.select(source.as("source"), explode(tokens(text)).as("tok"))
      .select(col("source"), polyHashFast(col("tok")).as("h"))
      .distinct()
      .transform(d => graft.Caches.pin(d))
    val kmv = tk.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("h"))
      .transform(d => graft.Caches.pin(d))
    val pairs = kmv.select(col("source").as("s1")).distinct()
      .join(kmv.select(col("source").as("s2")).distinct(), col("s1") < col("s2"))
    // merged union sketch: bottom k of the two sketches' union
    val uw = Window.partitionBy(col("s1"), col("s2")).orderBy(col("uh"))
    val unionSketch = pairs
      .join(kmv.select(col("source").as("s1"), col("h").as("uh")), Seq("s1"))
      .unionByName(pairs
        .join(kmv.select(col("source").as("s2"), col("h").as("uh")), Seq("s2"))
        .select(col("s1"), col("s2"), col("uh")))
      .select(col("s1"), col("s2"), col("uh")).distinct()
      .withColumn("urk", row_number().over(uw))
      .filter(col("urk") <= k)
    val in1 = kmv.select(col("source").as("s1"), col("h").as("uh"), lit(1).as("graft_in1"))
    val in2 = kmv.select(col("source").as("s2"), col("h").as("uh"), lit(1).as("graft_in2"))
    val sketchStats = unionSketch
      .join(in1, Seq("s1", "uh"), "left")
      .join(in2, Seq("s2", "uh"), "left")
      .groupBy(col("s1"), col("s2"))
      .agg(max(col("uh")).as("kmv_theta"),
        sum(when(col("graft_in1").isNotNull && col("graft_in2").isNotNull, 1L)
          .otherwise(0L)).as("kmv_inter"),
        count(lit(1)).as("kmv_union_k"))
    // exact audit: distinct-hash union/intersection per pair
    val t1 = tk.select(col("source").as("s1"), col("h"))
    val t2 = tk.select(col("source").as("s2"), col("h"))
    val exactInter = t1.join(t2, Seq("h"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("exact_inter"))
    val sizes = tk.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val exact = sketchStats
      .join(exactInter, Seq("s1", "s2"), "left")
      .join(sizes.select(col("source").as("s1"), col("n").as("n1")), Seq("s1"))
      .join(sizes.select(col("source").as("s2"), col("n").as("n2")), Seq("s2"))
      .select(col("s1"), col("s2"), col("kmv_theta"), col("kmv_inter"),
        col("kmv_union_k"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        (col("n1") + col("n2") - coalesce(col("exact_inter"), lit(0L)))
          .as("exact_union"))
    exact
  }

  /** Within-corpus n-gram NOVELTY: per document, how many of its
    * distinct word n-grams appear in at least one OTHER document —
    * the memorization/boilerplate scan (a doc whose n-grams are
    * mostly corpus-shared is template or near-duplicate material;
    * d51 is the same statistic against an EVAL split, this is the
    * corpus-internal form). Novelty ratio = 1 − n_shared/n_grams,
    * divided downstream — output stays all-integer.
    *
    * Scale shape: distinct (doc, hash) postings → one document-
    * frequency aggregation → one postings join back. The join is on
    * the hash (the d65 shape); a hot template n-gram fans out by its
    * df only in the aggregation, not quadratically.
    *
    * Output: (doc_id, n_grams, n_shared) — docs with fewer than n
    * tokens have no n-grams and are absent, both engines alike. */
  def ngramNovelty(df: DataFrame, id: Column, text: Column,
      n: Int = 5): DataFrame = {
    // native one-pass window-hash kernel (TokenShingleHashes), not the
    // staged HOF shingle strings — the interpreted concat-per-window
    // path was 30× slower at sf0.1 (52.9 s → ~1.7 s); values are
    // property-tested identical, so the oracle is unchanged. The
    // repartition spreads the per-char kernel off the compact scan
    // partitions (the nearDuplicates rule).
    val g = Dedup.shingleHashFrame(df.repartition(id), id, text, n)
      .select(col("doc_id"), explode(array_distinct(col("h"))).as("h"))
      .transform(d => graft.Caches.pin(d))
    val dfreq = g.groupBy(col("h")).agg(count(lit(1)).as("graft_df"))
    g.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("graft_df") >= 2, 1L).otherwise(0L)).as("n_shared"))
  }

  /** Feature hashing ("the hashing trick", Weinberger et al. 2009 —
    * the fastText / Vowpal-Wabbit vectorizer): each token lands in
    * bucket `polyHash(tok) mod dim` with sign picked by the next hash
    * bit (`(h >> log2(dim)) & 1`), so the vectorizer needs NO
    * vocabulary pass — the property that makes it the right
    * bag-of-words featurizer at 100 TB (one scan, one skinny
    * (doc, bucket) aggregation, no dictionary broadcast or join).
    * Signed hashing keeps collision noise zero-mean.
    *
    * All-integer outputs (counts of signed occurrences), so the
    * result is exact on every engine. Buckets whose signed count
    * cancels to zero are dropped (they ARE the zero coordinate);
    * docs with no surviving bucket drop with them — same rule on
    * both legs.
    *
    * Output: (doc_id, nnz, l1, vec_s) where `vec_s` is the sparse
    * vector serialized "bucket:count" in bucket order (array columns
    * are not comparator-hashable — the q26/s53 lesson). */
  def featureHash(df: DataFrame, id: Column, text: Column,
      dim: Int = 64): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    val tok = df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .select(col("doc_id"), polyHashFast(col("tok")).as("h"))
      .select(col("doc_id"),
        (col("h") % dim).as("bucket"),
        when((expr(s"h div $dim") % 2) === 0, lit(1L)).otherwise(lit(-1L)).as("sign"))
    tok.groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("v"))
      .filter(col("v") =!= 0)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("nnz"),
        sum(abs(col("v"))).as("l1"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("bucket"), col("v")))),
            s => concat_ws(":", s.getField("bucket"), s.getField("v"))),
          ",").as("vec_s"))
  }
}
