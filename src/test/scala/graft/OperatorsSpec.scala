package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis, TextHash}

/** Operator-level semantics tests for the extended (north-star) ops. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps the min-id row per distinct content") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("keep_id") == 1L && out(0).getAs[Long]("n_copies") == 2L)
  }

  test("minhash: identical docs get identical signatures; near-dups collide in some band") {
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs.values.head.length == 8)
    val cands = Dedup.candidatePairs(
      Dedup.lshBuckets(docs, col("doc_id"), col("text")))
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 4L)))
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 4L))) // near-dups share a band w.h.p.
  }

  test("near-dup pipeline: exact dup scores 1.0, unrelated docs are absent") {
    val pairs = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 4L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash agg: short docs (no shingles) evaluate to null minima, matching the array-fold form") {
    // a 2-token doc has no 3-shingles: explode_outer yields one null
    // hash row; the aggregate must produce [null×8] exactly like
    // array_min over an empty array (and DuckDB's list_min([]))
    val shortDocs = Seq((1L, "too short"), (2L, "long enough text to have shingles here"))
      .toDF("doc_id", "text")
    val hashes = Dedup.shingleFrame(shortDocs, col("doc_id"), col("text"))
      .select(col("doc_id"), explode_outer(col("s")).as("sg"))
      .select(col("doc_id"), TextHash.polyHashFast(col("sg")).as("h"))
    val agg = hashes.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.minhashAgg(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(agg(1L).forall(_ == null), s"short doc signature: ${agg(1L)}")
    assert(agg(2L).forall(_ != null))
    // array-fold form agrees element-for-element (incl. the nulls)
    val fold = Dedup.minhashSignatures(shortDocs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(agg == fold)
  }

  test("simhash: exact dups equal; near-dups within small hamming distance") {
    val sh = Dedup.simhash32(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    assert(hamming <= 10, s"near-dup hamming distance $hamming")
  }

  test("dot product is the pinned-order fold and self-similarity ≈ 1 on normalized vectors") {
    val emb = Tables()
    val self = emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .filter(col("vec_id") === 0).as[(Long, Double)].head()
    assert(math.abs(self._2 - 1.0) < 1e-4)
  }

  private def Tables() = graft.engine.Tables.embeddings(spark, sfDir)

  test("brute-force knn: every query gets k ranked neighbors, no self-matches") {
    val emb = Tables()
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 50 === 0), 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3))
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("ivf knn scores are a subset-restriction of brute force (recall trade-off)") {
    val emb = Tables()
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 1)
      .select("score").as[Double].head()
    val ivf = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 0), 1)
      .select("score").as[Double].head()
    assert(ivf <= brute + 1e-12) // cell restriction can only lose neighbors
  }

  test("language-id picks the dominant lexicon") {
    val d = Seq((1L, "der hund und die katze ist ein tier"),
      (2L, "the cat and the dog is a pet"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(d, col("doc_id"), col("text"))
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "de" && out(2L) == "en" && out(3L) == "unknown")
  }

  test("token stats: ws and regex token counts agree on plain text") {
    val d = Seq((1L, "hello world 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(d, col("doc_id"), col("text")).head()
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("bpe_ish_tokens") == 4L) // hello, world, 42, !
    assert(r.getAs[Long]("subword_est") == 4L)    // ceil(15/4)
  }

  test("fingerprint equals the portable polyhash (stable across runs)") {
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d, col("doc_id"), col("text"))
      .select("fingerprint").as[Long].head()
    // ((0*31+97)*31+98)*31+99 = 97*961 + 98*31 + 99
    assert(fp == 97L * 961 + 98 * 31 + 99)
  }

  test("multimodal: asset wrap + partition-batched decode stub round-trips") {
    val src = Seq((1L, "abc"), (2L, "")).toDF("id", "payload")
    val assets = Multimodal.toAssets(src, "id", "payload", "text/plain")
    assert(assets.schema.fieldNames.toSeq == Seq("id", "payload", "meta"))
    val decoded = Multimodal.decodeFeatures(spark, assets)
      .collect().map(d => d.id -> d).toMap
    assert(decoded(1L).nBytes == 3L)
    assert(decoded(1L).checksum == 97L * 961 + 98 * 31 + 99) // same rolling hash over bytes
    assert(decoded(1L).feature.length == 4)
    assert(decoded(2L).nBytes == 0L && decoded(2L).checksum == 0L)
  }

  test("multimodal: resize and frame-sampling plumbing (stub codecs)") {
    val src = Seq((1L, "abcdefghij")).toDF("id", "payload")
    val assets = Multimodal.toAssets(src, "id", "payload", "video/fake")
    val resized = Multimodal.resize(spark, assets, 4, 3).collect()
    assert(resized.head.payload.length == 12 && resized.head.width == 4)
    val frames = Multimodal.sampleFrames(spark, assets, everyK = 3).collect()
    assert(frames.length == 3) // 10 bytes / 3 per frame
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 1, 2))
    assert(new String(frames(0).payload) == "abc")
  }

  test("multimodal: REAL ppm/bmp byte codec through the decode path") {
    import graft.operators.ImageCodec
    // genuine P6 fixture: comment in header, 2x2 RGB pixels
    val ppm = "P6\n# fixture\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    // genuine 24-bit BMP fixture: 3x2, bottom-up rows, 4-byte stride
    // padding, BGR pixel order — every header field the parser checks
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val stride = 12 // 3 px * 3 B = 9, padded to 12
    val bmp = Array[Byte]('B', 'M') ++ le32(54 + stride * 2) ++ le16(0) ++ le16(0) ++
      le32(54) ++ le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(stride * 2) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      // stored first = BOTTOM logical row: 3x gray, then 3 pad bytes
      Array[Byte](128.toByte, 128.toByte, 128.toByte, 128.toByte, 128.toByte,
        128.toByte, 128.toByte, 128.toByte, 128.toByte, 0, 0, 0) ++
      // top logical row in BGR: red, green, blue pixels + pad
      Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 255.toByte, 0, 0, 0, 0, 0)

    // codec alone: header fields, row order, BGR→RGB
    val bimg = ImageCodec.decodeBmp24(bmp)
    assert(bimg.width == 3 && bimg.height == 2)
    assert(bimg.rgb.take(9).map(_ & 0xff).toSeq ==
      Seq(255, 0, 0, 0, 255, 0, 0, 0, 255)) // top row red,green,blue
    assert(bimg.rgb.drop(9).forall(b => (b & 0xff) == 128))
    assertThrows[IllegalArgumentException](ImageCodec.decodePpm(bmp))
    assertThrows[IllegalArgumentException](
      ImageCodec.decodeBmp24(bmp.take(40))) // truncated header

    // the Spark decode path runs the real parser per partition
    val src = Seq((1L, ppm)).toDF("id", "payload")
    val assets = Multimodal.toAssets(src, "id", "payload", ImageCodec.PpmMime)
    val d = Multimodal.decodeImages(spark, assets).collect().head
    assert(d.width == 2 && d.height == 2)
    assert(d.meanRgb.toSeq == Seq(127.5f, 127.5f, 127.5f))

    // real resize: decode → nearest-neighbor resample → P6 re-encode;
    // the output payload is itself decodable and pixel (0,0) carries
    // the source's top-left red through the resample
    val r = Multimodal.resizeImages(spark, assets, 4, 4).collect().head
    val rimg = ImageCodec.decodePpm(r.payload)
    assert(rimg.width == 4 && rimg.height == 4)
    assert(rimg.rgb.take(3).map(_ & 0xff).toSeq == Seq(255, 0, 0))
    // perceptual hash is stable across the re-encode at same scale
    val back = ImageCodec.decodePpm(
      Multimodal.resizeImages(spark, assets, 2, 2).collect().head.payload)
    assert(ImageCodec.ahash64(back) == ImageCodec.ahash64(ImageCodec.decodePpm(ppm)))
  }

  test("misra-gries candidates always include every item above n/(k+1), any partitioning") {
    import org.scalacheck.{Gen, rng}
    val g = for {
      n <- Gen.choose(50, 400)
      zipf <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        3 -> Gen.oneOf("a", "b", "c"), 5 -> Gen.choose(0, 500).map("t" + _)))
      parts <- Gen.choose(1, 13)
      k <- Gen.choose(2, 12)
    } yield (zipf, parts, k)
    val cases = Gen.listOfN(5, g).apply(Gen.Parameters.default, rng.Seed(47L)).get
    cases.foreach { case (items, parts, k) =>
      val cand = items.toDF("tok").repartition(parts)
        .agg(graft.functions.FreqSketchAgg.misraGries(k)(col("tok")))
        .head().getSeq[String](0).toSet
      assert(cand.size <= k, s"summary exceeded capacity: ${cand.size} > $k")
      val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = counts.filter(_._2 > items.size.toLong / (k + 1)).keySet
      assert(mustKeep.subsetOf(cand),
        s"k=$k parts=$parts lost guaranteed items: ${mustKeep -- cand}")
    }
  }

  test("weighted misra-gries keeps the same guarantee over pre-aggregated counts, any partitioning") {
    // the t76 shape: occurrences collapse to (item, cnt) first, the
    // sketch consumes weighted rows — the undercount bound (total
    // cuts ≤ n/(k+1)) must hold exactly as in the per-occurrence form
    import org.scalacheck.{Gen, rng}
    val g = for {
      n <- Gen.choose(50, 400)
      zipf <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        3 -> Gen.oneOf("a", "b", "c"), 5 -> Gen.choose(0, 500).map("t" + _)))
      parts <- Gen.choose(1, 13)
      k <- Gen.choose(2, 12)
    } yield (zipf, parts, k)
    val cases = Gen.listOfN(5, g).apply(Gen.Parameters.default, rng.Seed(53L)).get
    cases.foreach { case (items, parts, k) =>
      val cand = items.toDF("tok").repartition(parts)
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .agg(graft.functions.FreqSketchAgg.misraGriesWeighted(k)(col("tok"), col("cnt")))
        .head().getSeq[String](0).toSet
      assert(cand.size <= k, s"summary exceeded capacity: ${cand.size} > $k")
      val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = counts.filter(_._2 > items.size.toLong / (k + 1)).keySet
      assert(mustKeep.subsetOf(cand),
        s"k=$k parts=$parts lost guaranteed items: ${mustKeep -- cand}")
    }
  }

  test("grouped discrete percentile matches the naive sorted-scan definition") {
    import org.scalacheck.{Gen, rng}
    val cases = Gen.listOfN(4, for {
      n <- Gen.choose(1, 120)
      pct <- Gen.choose(1, 100)
      vs <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 20L)))
    } yield (pct, vs)).apply(Gen.Parameters.default, rng.Seed(23L)).get
    cases.foreach { case (pct, vs) =>
      val df = vs.toDF("g", "v")
      val got = graft.operators.Quantiles.discretePercentile(
          df, Seq("g"), col("v"), pct)
        .as[(String, Long)].collect().toMap
      // naive reference: smallest value whose cumulative count reaches
      // pct% of the group, over the explicitly sorted value list
      val want = vs.groupBy(_._1).map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        g -> sorted(math.max(0, math.ceil(sorted.size * pct / 100.0).toInt - 1))
      }
      assert(got == want, s"pct=$pct")
    }
    // filter application keeps exactly the at-or-above rows
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)).toDF("g", "v")
    val kept = graft.operators.Quantiles.keepAboveGroupPercentile(
        df, Seq("g"), col("v"), 50)
      .as[(String, Long)].collect().map(_._2).sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L))
    // reserved-name collisions fail fast instead of yielding ambiguous
    // columns or a silently wrong filter
    Seq("graft_v0", "threshold").foreach { c =>
      val clash = df.withColumn(c, lit(0))
      val e = intercept[IllegalArgumentException](
        graft.operators.Quantiles.keepAboveGroupPercentile(
          clash, Seq("g"), col("v"), 50))
      assert(e.getMessage.contains(c))
    }
  }

  test("containment pairs: finds doc-inside-doc that symmetric-Jaccard LSH misses") {
    // B = long doc; A = its opening quoted whole. J(A,B) ~ |A|/|B| is
    // far below any near-dup threshold, so nearDuplicates must NOT
    // pair them — but containment(A in B) = 1.0 and the prefix filter
    // must find it. C is unrelated.
    val words = (1 to 60).map(i => s"w$i")
    val corpus = Seq(
      (1L, words.take(15).mkString(" ")),            // A: prefix quote
      (2L, words.mkString(" ")),                     // B: full doc
      (3L, (1 to 40).map(i => s"z$i").mkString(" ")) // C: unrelated
    ).toDF("doc_id", "text")
    val near = Dedup.nearDuplicates(corpus, col("doc_id"), col("text"),
      threshold = 0.8).collect()
    assert(near.isEmpty, s"LSH should not pair a 15-token quote with a 60-token doc: ${near.mkString}")
    val cont = Dedup.containmentPairs(corpus, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(cont == Set((1L, 2L, 1.0)))
    // partial containment below threshold is excluded: half of A's
    // shingles replaced
    val partial = Seq(
      (1L, (words.take(8) ++ (1 to 7).map(i => s"q$i")).mkString(" ")),
      (2L, words.mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(partial, col("doc_id"), col("text"))
      .collect().isEmpty)
    // docs shorter than the shingle width are absent, not erroneous
    val tiny = Seq((1L, "one two"), (2L, words.mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(tiny, col("doc_id"), col("text"))
      .collect().isEmpty)
  }

  test("dropContained removes quotes, keeps containers; mutual containment keeps min id") {
    val words = (1 to 60).map(i => s"w$i")
    val corpus = Seq(
      (1L, words.take(15).mkString(" ")),            // quote of 2 → dropped
      (2L, words.mkString(" ")),                     // container → kept
      (3L, (1 to 40).map(i => s"z$i").mkString(" ")),// unrelated → kept
      (4L, words.mkString(" ")))                     // mutual with 2 → 2 kept, 4 dropped
      .toDF("doc_id", "text")
    val kept = Dedup.dropContained(corpus, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("dropContainedMinimal: drops only docs whose container survives (chain-aware)") {
    // engineered chain at t=0.9: P ⊂ H ⊂ X but P ⊄ X (the junk token
    // pushes P's containment in X to 5/6) — greedy drops {H, P},
    // survivor-aware must drop {H} only (P's sole container dies)
    val ts = (1 to 20).map(i => f"w$i%02d")
    val x = ts.mkString(" ")
    val h = (ts.take(14) :+ "zz").mkString(" ")
    val p = (ts.slice(7, 14) :+ "zz").mkString(" ")
    val corpus = Seq((1L, x), (2L, h), (3L, p)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(corpus, col("doc_id"), col("text"), threshold = 0.9)
      .select("contained", "container").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 1L), (3L, 2L)), s"fixture pairs: $pairs")
    val greedy = Dedup.dropContained(corpus, col("doc_id"), col("text"), threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(greedy == Set(1L)) // greedy: both H and P dropped
    val minimal = Dedup.dropContainedMinimal(corpus, col("doc_id"), col("text"), threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(minimal == Set(1L, 3L)) // P survives: its container did not
    // mutual pair folds to keep-min-id, same as the greedy rule
    val twins = corpus.unionAll(Seq((10L, x)).toDF("doc_id", "text"))
    val m = Dedup.dropContainedMinimal(twins, col("doc_id"), col("text"), threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(m == Set(1L, 3L), s"twins: $m") // 10 mutual-loses to 1; H dropped; P kept
  }

  test("dropContainedMinimal accepts non-long document ids (the drop rows' null p follows the caller's id type)") {
    val words = (1 to 30).map(i => s"w$i")
    val corpus = Seq(
      ("doc-a", words.take(12).mkString(" ")), // quote of doc-b → dropped
      ("doc-b", words.mkString(" ")))          // container → kept
      .toDF("doc_id", "text")
    val kept = Dedup.dropContainedMinimal(corpus, col("doc_id"), col("text"))
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("doc-b"), s"got $kept")
  }

  test("containment screen: catches a sub-threshold-Jaccard containment near-dup misses; twins estimate 1.0") {
    val big = (1 to 20).map(i => s"w$i").mkString(" ")   // 18 shingles
    val part = (1 to 14).map(i => s"w$i").mkString(" ")  // 12 shingles, all shared → J = 2/3
    val docs = Seq((1L, big), (2L, part), (3L, big)).toDF("doc_id", "text")
    // symmetric near-dup at 0.8 misses the J=2/3 containment pair
    val nd = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(!nd.contains((1L, 2L)) && !nd.contains((2L, 1L)))
    val screen = Dedup.containmentScreen(docs, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact twins: J = 1 → Ĉ = 1 exactly, contained keeps the a < b order
    assert(screen((1L, 3L)) == 1.0)
    // the contained prefix is screened with Ĉ ≥ threshold; true C = 1
    assert(screen.contains((2L, 1L)) || screen.contains((2L, 3L)),
      s"containment pair not screened: $screen")
  }

  test("containment property: prefix filter equals brute-force all-pairs on random corpora") {
    import org.scalacheck.{Gen, rng}
    // random docs over a small vocab so containment pairs actually occur
    val vocab = (1 to 12).map(i => s"v$i")
    val cases = Gen.listOfN(3, for {
      nDocs <- Gen.choose(4, 12)
      docs <- Gen.listOfN(nDocs, Gen.choose(3, 18).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield docs).apply(Gen.Parameters.default, rng.Seed(41L)).get
    cases.foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.containmentPairs(df, col("doc_id"), col("text"), threshold = 0.8)
        .select("contained", "container").as[(Long, Long)].collect().toSet
      // brute force over the same hashed shingle sets
      val sets = Dedup.shingleHashFrame(df, col("doc_id"), col("text"))
        .select(col("doc_id"), array_distinct(col("h")))
        .as[(Long, Seq[Long])].collect().toMap
        .filter(_._2.nonEmpty).view.mapValues(_.toSet).toMap
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        if (sa & sb).size.toDouble >= 0.8 * sa.size
      } yield (a, b)).toSet
      assert(got == want, s"corpus=${texts.mkString("|")}")
    }
  }

  test("count-min sketch: never underestimates; row mass conserved; shard sketches merge cell-wise") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a a a b b c"), (2L, "a b c d d d d")).toDF("doc_id", "text")
    val exact = Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 4L) // total 13
    val probes = exact.keys.toSeq.toDF("tok")
    for (w <- Seq(2, 64)) {
      val sk = TextAnalysis.cmSketch(docs, col("text"), d = 4, w = w)
      val mass = sk.groupBy(col("row_idx")).agg(sum(col("cnt")).as("m"))
        .select("m").as[Long].collect()
      assert(mass.length == 4 && mass.forall(_ == 13L), s"w=$w mass=${mass.toSeq}")
      val est = TextAnalysis.cmEstimate(sk, probes, d = 4, w = w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, c) => assert(est(t) >= c, s"w=$w tok=$t underestimated") }
      // w=64, 4 tokens: the fixed hash family separates them in at
      // least one row, so the min recovers every exact count
      if (w == 64) assert(est == exact, s"est=$est")
    }
    // unseen probe: at w=64 at least one of its cells is empty → 0,
    // not a dropped row and not a min over only-occupied cells
    val unseen = TextAnalysis.cmEstimate(
        TextAnalysis.cmSketch(docs, col("text"), d = 4, w = 64),
        Seq("zzz").toDF("tok"), d = 4, w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unseen == Map("zzz" -> 0L), s"unseen probe: $unseen")

    val s1 = TextAnalysis.cmSketch(docs.filter(col("doc_id") === 1), col("text"), 4, 8)
    val s2 = TextAnalysis.cmSketch(docs.filter(col("doc_id") === 2), col("text"), 4, 8)
    val merged = s1.unionAll(s2).groupBy(col("row_idx"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = TextAnalysis.cmSketch(docs, col("text"), 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
  }

  test("repeated-spans property: engine equals brute-force first-occurrence + interval merge") {
    import org.scalacheck.{Gen, rng}
    val k = 3
    // tiny vocab → windows repeat, within and across docs
    val vocab = Seq("aa", "bb", "cc", "dd")
    val cases = Gen.listOfN(4, for {
      nDocs <- Gen.choose(3, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(4, 20).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield docs).apply(Gen.Parameters.default, rng.Seed(43L)).get
    cases.foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.repeatedSpans(df, col("doc_id"), col("text"), spanTokens = k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      // brute force over the window STRINGS (the engine groups by the
      // Broder fingerprint — equal here absent 30-bit collisions on
      // a few hundred windows)
      val wins = for {
        (t, d) <- texts.map(_.split(" ").filter(_.nonEmpty).toSeq).zipWithIndex
        i <- 0 to t.length - k
      } yield (d.toLong, i + 1, t.slice(i, i + k).mkString(" "))
      val byWin = wins.groupBy(_._3)
      val dups = wins.filter(w => byWin(w._3).size > 1 &&
        byWin(w._3).minBy(x => (x._1, x._2)) != w)
      val want = dups.groupBy(_._1).map { case (d, ws) =>
        var spans = List.empty[(Int, Int, Int)] // s0, e0, nw (reversed order)
        ws.map(_._2).sorted.foreach { s =>
          spans match {
            case (s0, e0, nw) :: rest if s <= e0 + 1 =>
              spans = (s0, math.max(e0, s + k - 1), nw + 1) :: rest
            case _ => spans = (s, s + k - 1, 1) :: spans
          }
        }
        d -> ((spans.size.toLong, spans.map(_._3.toLong).sum,
          spans.map(sp => (sp._2 - sp._1 + 1).toLong).sum,
          spans.map(sp => (sp._2 - sp._1 + 1).toLong).max))
      }
      assert(got == want, s"corpus=${texts.mkString("|")}")
    }
  }

  test("incremental dedup equals the batch path's crossing pairs") {
    // dedupAgainstIndex(corpus-index, delta) must produce exactly the
    // corpus↔delta pairs that rerunning nearDuplicates over the full
    // corpus ∪ delta would find (same signatures, same banding, same
    // verify kernel — so exact equivalence, not approximate)
    val corpus = docs // (doc_id, text) fixture with planted near-dups
    val delta = corpus.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val idx = Dedup.buildDedupIndex(corpus, col("doc_id"), col("text"))
    val got = Dedup.dedupAgainstIndex(idx, delta, col("doc_id"), col("text"))
      .select(col("corpus_id"), col("delta_id"))
      .as[(Long, Long)].collect().toSet
    val batch = Dedup.nearDuplicates(
        corpus.unionAll(delta), col("doc_id"), col("text"))
      .filter(col("a") < 5000 && col("b") >= 5000)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    assert(got == batch && got.nonEmpty)
    // every re-ingested doc is caught as an exact (J=1) dup of its source
    val exact = Dedup.dedupAgainstIndex(idx, delta, col("doc_id"), col("text"))
      .filter(col("corpus_id") === col("delta_id") - 5000)
      .select(col("jaccard")).as[Double].collect()
    assert(exact.length == delta.count() && exact.forall(_ == 1.0))
  }

  test("cdc chunks: kernel equals brute-force boundaries; chunks tile; prefix edits keep tail identities") {
    import org.scalacheck.{Gen, rng}
    val P = 1000000007L
    def ph(x: String): Long = x.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    def brute(s: String): Seq[(Long, Long, Long)] = {
      val n = s.length
      if (n == 0) return Seq.empty
      val bounds = (1 to n).filter(p => p >= 8 && (ph(s.substring(p - 8, p)) & 63) == 0)
      val ends = (bounds :+ n).distinct
      ends.zip(1L +: ends.map(_ + 1L).dropRight(1)).map { case (e, st) =>
        (st, e - st + 1, ph(s.substring(st.toInt - 1, e)))
      }
    }
    val strs = Gen.listOfN(12, Gen.choose(0, 400).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(('a' to 'f') :+ ' ')).map(_.mkString)))
      .apply(Gen.Parameters.default, rng.Seed(51L)).get
    strs.filter(_.nonEmpty).foreach { s =>
      val got = Seq(Tuple1(s)).toDF("txt")
        .select(explode(graft.functions.CdcChunks.cdcChunks(col("txt"), 8, 64L)).as("c"))
        .select(col("c.start"), col("c.len"), col("c.chash"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == brute(s), s"s=$s")
      assert(got.map(_._2).sum == s.length.toLong) // chunks tile exactly
    }
    // insertion stability: a prefix edit disturbs only the chunks that
    // overlap it — the tail re-synchronizes on the same boundaries
    val doc = strs.filter(_.length > 300).headOption.getOrElse(strs.maxBy(_.length))
    val edited = "zzzzz" + doc
    val a = brute(doc).map(_._3)
    val b = brute(edited).map(_._3).toSet
    val shared = a.count(b.contains)
    assert(shared >= a.length - 2,
      s"prefix edit disturbed ${a.length - shared} of ${a.length} chunks")
  }

  test("cdc apply: a verbatim copy loses every chunk; unique content keeps all") {
    // non-repeating content: internal repetition would make doc 1
    // deduplicate against ITSELF (the technique working as intended)
    val t = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t), (3L, "completely different and unrepeated"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.dropDupChunks(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L)._3 == t && out(1L)._1 == out(1L)._2) // original intact
    assert(out(2L)._2 == 0L && out(2L)._3 == "")        // copy fully cut
    assert(out(3L)._3 == "completely different and unrepeated")
  }

  test("image codec: encode/decode round-trips random rasters bit-exactly") {
    import graft.operators.ImageCodec
    import org.scalacheck.{Gen, rng}
    val g = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield ImageCodec.Image(w, h, px.map(_.toByte).toArray)
    val imgs = Gen.listOfN(8, g).apply(Gen.Parameters.default, rng.Seed(59L)).get
    imgs.foreach { img =>
      val back = ImageCodec.decodePpm(ImageCodec.encodePpm(img))
      assert(back.width == img.width && back.height == img.height)
      assert(java.util.Arrays.equals(back.rgb, img.rgb))
      // identity resize is exact; perceptual hash survives the round trip
      val same = ImageCodec.resizeNearest(img, img.width, img.height)
      assert(java.util.Arrays.equals(same.rgb, img.rgb))
      assert(ImageCodec.ahash64(back) == ImageCodec.ahash64(img))
    }
  }

  test("multimodal: REAL frame sampling over a multi-frame P6 container") {
    import graft.operators.ImageCodec
    // 5 solid-color 2x2 frames concatenated into one payload
    def frame(r: Int, g: Int, b: Int): Array[Byte] =
      ImageCodec.encodePpm(ImageCodec.Image(2, 2,
        Array.fill(4)(Array(r.toByte, g.toByte, b.toByte)).flatten))
    val container = (0 until 5).flatMap(i => frame(50 * i, 0, 255 - 50 * i)).toArray
    assert(ImageCodec.decodeFrameContainer(container).size == 5)
    val src = Seq((9L, container)).toDF("id", "payload")
    val assets = Multimodal.toAssets(src, "id", "payload", ImageCodec.PpmMime)
    val frames = Multimodal.sampleFramesReal(spark, assets, everyK = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4)) // every 2nd of 5
    assert(frames.forall(f => f.width == 2 && f.height == 2))
    // each emitted payload is itself a decodable P6 with the original pixels
    val f2 = ImageCodec.decodePpm(frames(1).payload)
    assert(f2.rgb.take(3).map(_ & 0xff).toSeq == Seq(100, 0, 155))
    assert(frames(1).ahash == ImageCodec.ahash64(f2))
    // a corrupt container fails loudly, mid-stream
    assertThrows[IllegalArgumentException](
      ImageCodec.decodeFrameContainer(container.take(container.length - 5)))
  }

  test("portable and fast minhash share the operator shape") {
    val s1 = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
      .head().getSeq[Long](1)
    val s2 = Dedup.minhashSignaturesFast(docs, col("doc_id"), col("text"))
      .head().getSeq[Long](1)
    assert(s1.length == s2.length)
    assert(s2.forall(h => h >= 0 && h < TextHash.P))
  }

  test("simhash banding pairs equal brute-force hamming pairs (first-band dedup, maxHamming bounds)") {
    val docs = Seq.tabulate(30) { i =>
      // clusters of near-identical docs (same words, one varying token)
      // so fingerprints agree on several NON-contiguous bands — the
      // case the first-matching-band dedup must emit exactly once
      (i.toLong, s"alpha beta gamma delta token${i % 5} epsilon zeta eta theta")
    }.toDF("doc_id", "text")
    val sims = Dedup.simhash32(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    Seq(0, 1, 3).foreach { mh =>
      val expected = (for {
        a <- sims.keys; b <- sims.keys if a < b
        hd = java.lang.Long.bitCount(sims(a) ^ sims(b))
        if hd <= mh
      } yield (a, b, hd.toLong)).toSet
      val got = Dedup.simhashNearDups(docs, col("doc_id"), col("text"), maxHamming = mh)
        .as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size, s"mh=$mh: duplicate pairs emitted")
      assert(got.toSet == expected, s"mh=$mh")
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, col("doc_id"), col("text"), maxHamming = 4)
    }
  }

  test("contamination flags train docs sharing an n-gram with the bench set") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // shares the 5-gram prefix with bench 1
      (11L, "totally unrelated content with nothing shared here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon omega")).toDF("doc_id", "text")
    val out = Dedup.contamination(train, bench, col("doc_id"), col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(10L -> ((1L, 1L)))) // one shared 5-gram, one bench doc; doc 11 absent
  }

  test("connected components: chains close, singletons self-cluster, labels are component minima") {
    // 1-2-3 chained (1-2, 2-3: transitive, never a direct 1-3 edge),
    // 5-6 paired, 4 isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val out = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: a long path converges (diameter rounds) and maxIter violation fails loudly") {
    val n = 12
    val nodes = (1L to n).toDF("id")
    val path = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.connectedComponents(nodes, path).as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L))
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, path, maxIter = 2)
    }
  }

  test("connected components match a driver-side union-find on generated random graphs") {
    import org.scalacheck.{Gen, rng}
    // independent reference: classic path-compressed union-find
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      // canonical label = min member id = root under min-union
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val seed = rng.Seed(7L)
    val cases = Gen.listOfN(3, for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(0, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 2)
        b <- Gen.choose(a + 1, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es)).apply(Gen.Parameters.default, seed).get
    cases.foreach { case (n, es) =>
      val nodes = (0L until n.toLong).toDF("id")
      val edges = if (es.isEmpty) Seq((0L, 0L)).toDF("a", "b").limit(0)
        else es.toDF("a", "b")
      val got = Dedup.connectedComponents(nodes, edges, maxIter = 50)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(n, es), s"n=$n edges=$es")
    }
  }

  test("star components: deep chain closes in O(log n) rounds where propagation needs diameter") {
    // 301-node path: diameter 300 — label propagation's default
    // maxIter=25 cannot close it; the star rewiring must.
    val n = 301L
    val nodes = (1L to n).toDF("id")
    val path = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val star = Dedup.starComponents(nodes, path).as[(Long, Long)].collect()
    assert(star.length == n && star.forall(_._2 == 1L))
    // equivalence with the label-propagation twin (maxIter raised to diameter)
    val prop = Dedup.connectedComponents(nodes, path, maxIter = 301)
      .as[(Long, Long)].collect().toMap
    assert(star.toMap == prop)
  }

  test("star components: singletons, chains and pairs match the propagation twin") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val out = Dedup.starComponents(nodes, edges).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    // empty edge set: everything self-clusters without a single round
    val alone = Dedup.starComponents(nodes,
      Seq((0L, 0L)).toDF("a", "b").limit(0)).as[(Long, Long)].collect().toMap
    assert(alone == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 6L))
  }

  test("star components match a driver-side union-find on generated random graphs") {
    import org.scalacheck.{Gen, rng}
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val seed = rng.Seed(11L)
    val cases = Gen.listOfN(3, for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(0, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 2)
        b <- Gen.choose(a + 1, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es)).apply(Gen.Parameters.default, seed).get
    cases.foreach { case (n, es) =>
      val nodes = (0L until n.toLong).toDF("id")
      val edges = if (es.isEmpty) Seq((0L, 0L)).toDF("a", "b").limit(0)
        else es.toDF("a", "b")
      val got = Dedup.starComponents(nodes, edges).as[(Long, Long)].collect().toMap
      assert(got == unionFind(n, es), s"n=$n edges=$es")
    }
  }

  test("repetition: uniform doc scores clean, degenerate doc scores repetitive") {
    val d = Seq(
      (1L, "a b c d"),            // all distinct
      (2L, "spam spam spam spam") // one token repeated
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("distinct_token_ratio") == 1.0)
    assert(r(1L).getAs[Double]("top_token_fraction") == 0.25)
    assert(r(1L).getAs[Double]("dup_2gram_fraction") == 0.0)
    assert(r(2L).getAs[Double]("distinct_token_ratio") == 0.25)
    assert(r(2L).getAs[Double]("top_token_fraction") == 1.0)
    assert(r(2L).getAs[Double]("dup_2gram_fraction") == 1.0 - 1.0 / 3)
  }

  test("tf-idf top terms: rare repeated terms outrank common ones; ranks deterministic") {
    val d = Seq(
      (1L, "rare rare common"),
      (2L, "common other"),
      (3L, "common third")).toDF("doc_id", "text")
    // N=3; df: rare=1, common=3, other=1, third=1
    val out = TextAnalysis.tfidfTopTerms(d, col("doc_id"), col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getDouble(3))).toMap
    assert(out((1L, 1L)) == (("rare", 2.0 * 3 / 1)))   // tf=2, N/df=3
    assert(out((1L, 2L)) == (("common", 1.0 * 3 / 3))) // tf=1, N/df=1
    assert(out((2L, 1L)) == (("other", 3.0)))
  }

  test("corpus-df ratio: stopword-heavy doc covers more of the top set") {
    val d = Seq(
      (1L, "the the the of of rare1"),
      (2L, "the of and unique2 unique3 unique4"),
      (3L, "zzz yyy xxx www vvv uuu")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.corpusTopDfRatio(d, col("doc_id"), col("text"), k = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    // df: the=2, of=2, and=1, rest=1 → top-3 = {the, of, and} (term-asc tie-break)
    assert(r(1L).getAs[Double]("top_df_ratio") == 5.0 / 6)
    assert(r(2L).getAs[Double]("top_df_ratio") == 3.0 / 6)
    assert(r(3L).getAs[Double]("top_df_ratio") == 0.0)
  }

  test("chunk pages: byte-exact slicing, ordered indexes, md5 digests") {
    val assets = Multimodal.toAssets(
      Seq((1L, "a" * 100), (2L, "xy")).toDF("id", "payload"), "id", "payload", "app/bin")
    val out = Multimodal.chunkPages(assets, 64)
      .orderBy("id", "chunk_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 64L), (1L, 1L, 36L), (2L, 0L, 2L)))
    val md5xy = java.security.MessageDigest.getInstance("MD5")
      .digest("xy".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.last.getString(3) == md5xy)
  }

  test("centroid assignment: self-assignment wins for centroids; ties break by centroid id") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (7L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
    val out = Similarity.centroidAssign(vecs, cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L) == ((0L, 1.0)) && out(1L) == ((1L, 1.0)))
    assert(out(7L)._1 == 1L) // 0.8 vs 0.6
    val tied = Seq((9L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val t = Similarity.centroidAssign(tied, cents).head()
    assert(t.getLong(1) == 0L) // equal scores → lowest centroid id
  }

  test("int8 quantization: max-abs scale, round-half-up codes, zero-vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.int8Quantize(vecs)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    assert(out(1L)._1 == 1.0)
    assert(out(1L)._2 == Seq(64, -127, 32)) // floor(.5*127+.5)=64, floor(.25*127+.5)=32
    assert(out(2L)._1 == 0.0 && out(2L)._2 == Seq(0, 0, 0))
  }

  test("pq: sub-centroid codes argmin per subspace, ties to smaller id; adc sums table lookups") {
    // dim 4, m=2 → 16-bit-free toy: integer-valued floats make every
    // fold exact, so expectations are hand-computable
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val vecs = Seq(
      (10L, Array(2.0f, 0.0f, 3.0f, 0.0f)), // sub0 → c0 (1.5 vs -0.5), sub1 → c1 (2.5 vs -0.5)
      (11L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // both subspaces tie at -0.5 → smaller cid
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(vecs, cents, m = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(10L) == Seq(0L, 1L))
    assert(codes(11L) == Seq(0L, 0L))
    // query [2,1,4,8]: table j0 = (c0→2, c1→1), j1 = (c0→8, c1→4)
    val q = Seq((99L, Array(2.0f, 1.0f, 4.0f, 8.0f))).toDF("vec_id", "embedding")
    val adc = Similarity.pqAdcScore(vecs, cents, q, m = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(adc(10L) == (("0-1", 6.0))) // 2 + 4
    assert(adc(11L) == (("0-0", 10.0))) // 2 + 8

    // IVFADC: query probes cell 1 only; out-of-cell 12 is invisible
    // even though its ADC would win, and the query excludes itself
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f, 3.0f, 0.0f), 1),
      (11L, Array(0.0f, 0.0f, 0.0f, 0.0f), 1),
      (12L, Array(9.0f, 9.0f, 9.0f, 9.0f), 2),
      (99L, Array(2.0f, 1.0f, 4.0f, 8.0f), 1)).toDF("vec_id", "embedding", "label")
    val top = Similarity.ivfPqTopK(corpus,
        cents, corpus.filter(col("vec_id") === 99), k = 10, m = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(top.toSeq == Seq((1L, 11L, 10.0), (2L, 10L, 6.0)))
  }

  test("pq property: engine codes equal a driver-side argmax over random float vectors") {
    import org.scalacheck.{Gen, rng}
    val dim = 8
    val m = 2
    val sub = dim / m
    val floatGen = Gen.choose(-1000, 1000).map(_ / 256.0f)
    val (centRows, vecRows) = (for {
      cents <- Gen.listOfN(4, Gen.listOfN(dim, floatGen))
      vecs <- Gen.listOfN(30, Gen.listOfN(dim, floatGen))
    } yield (cents, vecs)).apply(Gen.Parameters.default, rng.Seed(47L)).get
    val cDf = centRows.zipWithIndex.map { case (e, i) => (i.toLong, e.toArray) }
      .toDF("vec_id", "embedding")
    val vDf = vecRows.zipWithIndex.map { case (e, i) => ((i + 100).toLong, e.toArray) }
      .toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(vDf, cDf, m = m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // driver-side twin: same fold order (left-to-right, double), same
    // argmax score − ‖c‖²/2 with ties to the smaller cid
    def score(x: Seq[Float], c: Seq[Float], j: Int): Double = {
      var dot = 0.0d; var nrm = 0.0d; var i = 0
      while (i < sub) {
        dot += x(j * sub + i).toDouble * c(j * sub + i).toDouble
        nrm += c(j * sub + i).toDouble * c(j * sub + i).toDouble
        i += 1
      }
      dot - nrm / 2
    }
    vecRows.zipWithIndex.foreach { case (x, vi) =>
      val want = (0 until m).map { j =>
        centRows.zipWithIndex
          .map { case (c, cid) => (score(x, c, j), cid.toLong) }
          .reduceLeft((a, b) => if (b._1 > a._1 || (b._1 == a._1 && b._2 < a._2)) b else a)
          ._2
      }
      assert(got((vi + 100).toLong) == want, s"vec $vi")
    }
  }

  test("redaction scrubs emails and phones and counts matches") {
    val d = Seq((1L, "write to bob.x@host.org or 555-0199 now"),
      (2L, "nothing here on 2023-08-12"),             // ISO date must NOT be mangled
      (3L, "Contact Bob.Smith+tag@My-Example.COM today"), // +tag, dashes, case
      (4L, "overlap 123-4567@host.org end")          // email swallows the phone-shaped tail
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == "write to <EMAIL> or <PHONE> now")
    assert(out(1L)._2 == 2L)
    assert(out(2L) == (("nothing here on 2023-08-12", 0L)))
    assert(out(3L)._1 == "Contact <EMAIL> today" && out(3L)._2 == 1L)
    // count must equal replacements PERFORMED: the email pass consumes
    // "4567@host.org"; the leftover "123-" is not a phone match, so 1
    assert(out(4L)._2 == out(4L)._1.sliding(7).count(w => w == "<EMAIL>" || w == "<PHONE>"),
      s"count disagrees with performed redactions: ${out(4L)}")
  }

  test("morton code interleaves bits; zorder layout is a row-preserving reshuffle") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65536L, 0L))
      .toDF("a", "b")
    val codes = df.select(col("a"), col("b"),
        graft.operators.Layout.morton(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(codes((0L, 0L)) == 0L)
    assert(codes((1L, 0L)) == 1L)   // bit 0 of a → position 0
    assert(codes((0L, 1L)) == 2L)   // bit 0 of b → position 1
    // a=3 (11), b=5 (101): positions a→{0,2}, b→{1,5} = 1+4+2+32
    assert(codes((3L, 5L)) == 39L)
    assert(codes((65536L, 0L)) == 0L) // modulo 2^16 wraps
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val laid = graft.operators.Layout.zorderBy(li, col("l_partkey"), col("l_suppkey"))
    assert(laid.count() == li.count())
    assert(laid.columns.toSeq == li.columns.toSeq)
  }

  test("distributed prefix sum equals the single-task global window") {
    val df = (1L to 500L).map(i => (i, (i * 37) % 101))
      .toDF("id", "v")
    val got = graft.operators.Prefix.runningTotal(
        df, Seq(col("v").desc, col("id")), col("v"), partitions = 7)
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == want)
    val budget = graft.operators.Prefix.takeBudget(
        df, Seq(col("v").desc, col("id")), col("v"), budget = 1000L)
      .as[(Long, Long, Long)].collect()
    assert(budget.map(_._3).max <= 1000L && budget.nonEmpty)
  }

  test("prefix sum executes the range shuffle ONCE (checkpoint pins one boundary set)") {
    // the totals pass and the main pass both consume the ranged frame;
    // if each planned its OWN range exchange, each would re-sample
    // range boundaries independently and the per-partition offsets
    // could describe a different partitioning than the rows they're
    // joined to (ReusedExchange does NOT reliably fire here: the
    // offsets join is a self-join, and attribute re-iding during
    // self-join dedup breaks canonical equality over cached/joined
    // inputs — the t77 sf0.1 differential caught exactly that). The
    // localCheckpoint makes single execution structural: the final
    // plan scans the materialized RDD and plans NO range exchange of
    // its own.
    val df = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "v")
    val out = graft.operators.Prefix.runningTotal(
      df, Seq(col("v").desc, col("id")), col("v"))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      s"range exchange re-planned outside the checkpoint:\n$p")
    assert(p.linesIterator.count(_.contains("ExistingRDD")) >= 2,
      s"expected both passes to scan the checkpointed frame:\n$p")
  }

  test("prefix sum property: random values incl. nulls, any partition count, equals the sequential scan") {
    import org.scalacheck.{Gen, rng}
    val cases = Gen.listOfN(3, for {
      n <- Gen.choose(1, 300)
      parts <- Gen.choose(1, 11)
      vs <- Gen.listOfN(n, Gen.option(Gen.choose(0L, 1000L)))
    } yield (parts, vs)).apply(Gen.Parameters.default, rng.Seed(11L)).get
    cases.foreach { case (parts, vs) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = graft.operators.Prefix.runningTotal(
          df, Seq(col("id")), col("v"), partitions = parts)
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
      // sequential reference: nulls contribute 0 (sum-over skips nulls)
      val want = vs.zipWithIndex.scanLeft((0L, 0L)) { case ((_, acc), (v, i)) =>
        (i.toLong, acc + v.getOrElse(0L))
      }.drop(1).map { case (i, c) => i -> c }.toMap
      assert(got == want, s"parts=$parts n=${vs.size}")
    }
  }

  test("prefix sum is correct even with exchange reuse disabled (checkpoint, not reuse)") {
    // the boundary-consistency mechanism is the checkpoint, so the
    // optimizer's reuse setting must be irrelevant to correctness
    val df = (1L to 500L).map(i => (i, i % 13)).toDF("id", "v")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = graft.operators.Prefix.runningTotal(
          df, Seq(col("v").desc, col("id")), col("v"), partitions = 7)
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
      val want = (1L to 500L).map(i => (i, i % 13))
        .sortBy { case (id, v) => (-v, id) }
        .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
        .drop(1).toMap
      assert(got == want)
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("upsert dedupes duplicate-key updates deterministically (greatest non-key struct wins)") {
    val target = Seq((1L, "old", 1L)).toDF("k", "v", "ver")
    val updates = Seq((1L, "a", 2L), (1L, "b", 9L), (2L, "x", 1L), (2L, "x", 1L))
      .toDF("k", "v", "ver")
    val got = graft.operators.Merge.upsert(target, updates, Seq("k"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // one row per key; for k=1 the greatest ("b", 9) beats ("a", 2)
    assert(got == Seq((1L, "b", 9L), (2L, "x", 1L)))
  }

  test("blockedComponents names the block and endpoint on a contract violation") {
    val nodes = Seq((10L, 1L), (10L, 2L)).toDF("block", "id")
    val edges = Seq((10L, 1L, 99L)).toDF("block", "a", "b")
    val e = intercept[org.apache.spark.SparkException](
      graft.operators.Dedup.blockedComponents(nodes, edges).collect())
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("99") && msg.contains("10"), s"unhelpful failure: $msg")
  }

  test("profile treats hostile column names as data, not expression text") {
    val df = Seq((1L, "x")).toDF("ok", "a`b'c")
    val out = graft.operators.Profile.profile(df, Seq("ok", "a`b'c"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("ok" -> 1L, "a`b'c" -> 1L))
  }

  test("stratified hash sample: deterministic under repartitioning; unlisted strata drop") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "A" else "B"))
      .toDF("k", "seg")
    val rates = Map("A" -> 30)
    val s1 = graft.operators.Sampling.stratifiedHash(df, col("seg"), col("k"), rates)
      .as[(Long, String)].collect().toSet
    val s2 = graft.operators.Sampling.stratifiedHash(
        df.repartition(7), col("seg"), col("k"), rates)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2)
    assert(s1.nonEmpty && s1.forall(_._2 == "A"))
    assert(s1.size < 200) // strictly a sample, not the whole stratum
  }

  test("upsert: updates win, unmatched target survives, inserts land; idempotent") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val once = graft.operators.Merge.upsert(target, updates, Seq("k"))
    assert(once.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    val twice = graft.operators.Merge.upsert(once, updates, Seq("k"))
    assert(twice.as[(Long, String)].collect().toSet ==
      once.as[(Long, String)].collect().toSet)
  }

  test("scd2: runs collapse to versions; null attr is a real version; ranges chain") {
    val events = Seq(
      (1L, 10L, null.asInstanceOf[String]), // null opens u1's history
      (1L, 20L, "x"), (1L, 30L, "x"),       // run of x collapses
      (1L, 40L, "y"),
      (2L, 10L, "z"))                       // single-version user
      .toDF("user", "ts", "state")
    val got = graft.operators.Merge.scd2(events,
        key = Seq(col("user")), attr = col("state"),
        validFrom = col("ts"), order = Seq(col("ts")))
      .select(col("user"), col("attr_value"), col("valid_from"),
        col("valid_to"), col("is_current"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, None, 10L, Some(20L), false),
      (1L, Some("x"), 20L, Some(40L), false),
      (1L, Some("y"), 40L, None, true),
      (2L, Some("z"), 10L, None, true)))
  }

  test("packing property: windows exactly cover the token stream in order") {
    import org.scalacheck.{Gen, rng}
    val lens = Gen.listOfN(120, Gen.oneOf(Gen.choose(0L, 40L), Gen.const(0L)))
      .apply(Gen.Parameters.default, rng.Seed(23L)).get
    val df = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "nt")
    val got = graft.operators.Packing.packSequences(
        df, Seq(col("id")), col("nt"), window = 16)
      .select(col("id"), col("n_tokens"), col("start_pos"),
        col("seq_first"), col("seq_last"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // sequential reference: start = running total of predecessors
    var acc = 0L
    got.zip(lens).foreach { case ((id, n, start, sf, sl), want) =>
      assert(n == want && start == acc, s"doc $id start $start (want $acc)")
      assert(sf == start / 16)
      assert(sl == math.max(sf, math.max(start + n - 1, 0L) / 16))
      acc += n
    }
    assert(acc == lens.sum) // exact cover, no gaps or overlaps
  }

  test("scd2 property: point-in-time reconstruction equals the last event at or before t") {
    import org.scalacheck.{Gen, rng}
    val events = Gen.listOfN(200, for {
      u <- Gen.choose(1L, 6L)
      st <- Gen.oneOf(Some("a"), Some("b"), Some("c"), None)
    } yield (u, st)).apply(Gen.Parameters.default, rng.Seed(31L)).get
      .zipWithIndex.map { case ((u, st), i) => (u, i.toLong, st.orNull) }
    val df = events.toDF("user", "ts", "state")
    val versions = graft.operators.Merge.scd2(df,
        key = Seq(col("user")), attr = col("state"),
        validFrom = col("ts"), order = Seq(col("ts")))
      .select(col("user"), col("attr_value"), col("valid_from"), col("valid_to"))
      .as[(Long, Option[String], Long, Option[Long])].collect()
    events.foreach { case (u, t, _) =>
      val want = events.filter(e => e._1 == u && e._2 <= t).maxBy(_._2)._3
      val hit = versions.filter(v =>
        v._1 == u && v._3 <= t && v._4.forall(_ > t))
      assert(hit.length == 1, s"user $u t $t: ${hit.length} covering versions")
      assert(hit.head._2 == Option(want), s"user $u t $t")
    }
  }

  test("blocked components: per-block union-find equals the global loop on a blocked graph") {
    // chain 1-2-3-4 in block 10; pair 7-9 in block 20; singletons 5 (block 10), 8 (block 20)
    val nodes = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L),
      (20L, 7L), (20L, 8L), (20L, 9L)).toDF("block", "id")
    val edges = Seq((10L, 1L, 2L), (10L, 2L, 3L), (10L, 3L, 4L), (20L, 7L, 9L))
      .toDF("block", "a", "b")
    val got = graft.operators.Dedup.blockedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      7L -> 7L, 8L -> 8L, 9L -> 7L))
    // must agree with the iterative global operator on the same graph
    val loop = graft.operators.Dedup.connectedComponents(
        nodes.select(col("id")), edges.select(col("a"), col("b")))
      .as[(Long, Long)].collect().toMap
    assert(got == loop)
  }

  test("split: exhaustive, exclusive, key-stable under repartitioning; bad weights rejected") {
    val df = spark.range(0, 1000).toDF("id")
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val got = graft.operators.Sampling.split(df, col("id"), w)
    val byId = got.select("id", "split").as[(Long, String)].collect().toMap
    assert(byId.size == 1000) // every key assigned exactly one split
    val counts = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // proportions hold loosely over the hash space
    assert(counts("train") > 700 && counts("train") < 900, counts.toString)
    // pure function of the key: a different partitioning changes nothing
    val re = graft.operators.Sampling.split(df.repartition(7), col("id"), w)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(re == byId)
    assert(intercept[IllegalArgumentException](
      graft.operators.Sampling.split(df, col("id"), Seq("a" -> 50, "b" -> 49)))
      .getMessage.contains("total 100"))
    assert(intercept[IllegalArgumentException](
      graft.operators.Sampling.split(df.withColumn("split", lit("x")), col("id"), w))
      .getMessage.contains("split"))
    // null keys: hash(null) is null and would fall through every
    // branch into a null split (a row in NO split); the contract
    // routes them deterministically to the FIRST split instead
    val withNull = spark.range(0, 5).toDF("n")
      .select(when(col("n") === 0, lit(null).cast("long"))
        .otherwise(col("n")).as("id"))
    val ns = graft.operators.Sampling.split(withNull, col("id"), w)
      .select("id", "split").as[(Option[Long], String)].collect().toMap
    assert(ns.values.forall(_ != null))
    assert(ns(None) == "train")
  }

  test("wav codec: u8 round-trip, s16 negatives, chunk skipping, corrupt rejection") {
    import graft.operators.AudioCodec
    // u8 mono round-trip: raw bytes are the samples
    val data = Array[Byte](0, 64, 127, -128, -1) // unsigned: 0,64,127,128,255
    val clip = AudioCodec.decode(AudioCodec.WavMime,
      AudioCodec.encodeWav8(8000, data))
    assert(clip.sampleRate == 8000 && clip.channels == 1 && clip.bitsPerSample == 8)
    assert(clip.samples.toSeq == Seq(0, 64, 127, 128, 255))
    assert(AudioCodec.durationMs(clip) == 5 * 1000L / 8000)
    // 16-bit signed little-endian, stereo: negative samples survive
    val s16 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1000, -1000, 32767, -32768).foreach(v => s16.putShort(v.toShort))
    val wav16 = AudioCodec.wavHeader(44100, 2, 16, 8) ++ s16.array()
    val c16 = AudioCodec.decode(AudioCodec.WavMime, wav16)
    assert(c16.channels == 2 && c16.bitsPerSample == 16)
    assert(c16.samples.toSeq == Seq(1000, -1000, 32767, -32768))
    assert(AudioCodec.nFrames(c16) == 2)
    // an unknown chunk between header and data is skipped by size
    val hdr = AudioCodec.encodeWav8(8000, Array[Byte](7, 8))
    val withList = hdr.take(36) ++ // RIFF+fmt
      ("LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)) ++
      hdr.drop(36) // data chunk
    assert(AudioCodec.decode(AudioCodec.WavMime, withList).samples.toSeq == Seq(7, 8))
    // corrupt payloads are rejected with the codec's message
    val bad = intercept[IllegalArgumentException](
      AudioCodec.decode(AudioCodec.WavMime, "JUNKJUNKJUNK".getBytes))
    assert(bad.getMessage.contains("bad magic"))
    val noPcm = AudioCodec.wavHeader(8000, 1, 8, 0)
    noPcm(20) = 3 // audioFormat = 3 (IEEE float)
    assert(intercept[IllegalArgumentException](
      AudioCodec.decode(AudioCodec.WavMime, noPcm)).getMessage.contains("not PCM"))
  }

  test("audio decode: distributed parse recovers header fields and sample stats") {
    import graft.operators.{AudioCodec, Multimodal}
    val payloads = Seq(
      (1L, AudioCodec.encodeWav8(8000, Array[Byte](10, 20, 30, 40))),
      (2L, AudioCodec.encodeWav8(16000, Array[Byte](100, 0, 100, 0, 100, 0))))
      .toDF("doc_id", "payload")
    val assets = Multimodal.toAssets(payloads, "doc_id", "payload", AudioCodec.WavMime)
    val got = Multimodal.decodeAudio(spark, assets)
      .collect().map(d => d.id -> d).toMap
    assert(got(1L).sampleRate == 8000 && got(1L).nSamples == 4)
    assert(got(1L).meanAmp == 25.0 && got(1L).peakAmp == 40L)
    assert(got(1L).meanCrossings == 1L) // 10,20 below mean; 30,40 above: one flip
    assert(got(2L).sampleRate == 16000 && got(2L).durationMs == 6 * 1000L / 16000)
    assert(got(2L).meanCrossings == 5L) // alternating above/below mean 50: all 5 pairs flip
  }

  test("sized write coalesces a many-tiny-partitions frame into few files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").resolve("t").toString
    // 64 partitions of ~8 rows each: the small-files shape
    val tiny = spark.range(0, 512, 1, 64).toDF("id")
    graft.operators.Layout.writeSized(tiny, dir, advisoryBytes = 4L << 20)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 4, s"expected REBALANCE to coalesce 64 tiny partitions, got $files files")
    // content survives the rebalance intact
    assert(spark.read.parquet(dir).count() == 512)
    // the advisory conf is restored afterwards
    assert(spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes").isEmpty ||
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") != (4L << 20).toString)
  }

  test("skew profile property: matches per-column ground truth on random frames") {
    import org.scalacheck.{Gen, rng}
    val cases = Gen.listOfN(4, for {
      n <- Gen.choose(1, 200)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 5L)))
    } yield rows).apply(Gen.Parameters.default, rng.Seed(29L)).get
    cases.foreach { rows =>
      val df = rows.toDF("k1", "k2")
      val got = graft.operators.Skew.profile(df, Seq("k1", "k2"))
        .as[(String, Long, Long, Long, Double, String)].collect()
        .map(r => r._1 -> r).toMap
      Seq("k1" -> rows.map(_._1.toString), "k2" -> rows.map(_._2.toString))
        .foreach { case (name, vals) =>
          val counts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val mx = counts.values.max
          val hot = counts.filter(_._2 == mx).keys.min
          val (_, nRows, nKeys, maxRows, skew, hotKey) = got(name)
          assert(nRows == vals.size && nKeys == counts.size && maxRows == mx)
          assert(math.abs(skew - mx.toDouble * counts.size / vals.size) < 1e-12)
          assert(hotKey == hot, s"$name: $hotKey != $hot")
        }
    }
  }

  test("multimodal decode dead-letters corrupt payloads instead of failing the task") {
    import graft.operators.{ImageCodec, Multimodal}
    val good = ("P6\n2 2\n255\n" + "x" * 12).getBytes
    val payloads = Seq(
      (1L, good),
      (2L, "NOTANIMAGE".getBytes),                   // bad magic
      (3L, "P6\n2 2\n255\n".getBytes),               // truncated pixels
      (4L, good))
      .toDF("doc_id", "payload")
    val assets = Multimodal.toAssets(payloads, "doc_id", "payload", ImageCodec.PpmMime)
    val attempted = Multimodal.decodeImagesWithError(spark, assets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (ok, dead) = Multimodal.splitDecoded(attempted)
    assert(ok.select("id").as[Long].collect().toSet == Set(1L, 4L))
    assert(ok.filter(col("width") === 2 && col("height") === 2).count() == 2)
    val deadRows = dead.select("id", "error").as[(Long, String)].collect().toMap
    assert(deadRows.keySet == Set(2L, 3L))
    assert(deadRows.values.forall(_.nonEmpty)) // codec message preserved
    attempted.unpersist()
  }

  test("bmp with an int-overflowing declared width dead-letters cleanly (Long size arithmetic)") {
    import graft.operators.{ImageCodec, Multimodal}
    // craft a 54-byte BMP header claiming width 0x40000000 (w*3
    // overflows Int to a negative stride): before the Long-arithmetic
    // fix this passed the truncation require and died with
    // NegativeArraySizeException in the task body
    def header(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](54 + 16)
      b(0) = 'B'; b(1) = 'M'
      def put32(o: Int, v: Int): Unit = { b(o) = (v & 0xff).toByte
        b(o + 1) = ((v >> 8) & 0xff).toByte; b(o + 2) = ((v >> 16) & 0xff).toByte
        b(o + 3) = ((v >> 24) & 0xff).toByte }
      put32(10, 54); put32(18, w); put32(22, h)
      b(28) = 24 // bpp (u16 low byte)
      put32(30, 0) // BI_RGB
      b
    }
    // direct codec call: clean require, not an arithmetic crash
    val e = intercept[IllegalArgumentException](
      ImageCodec.decodeBmp24(header(0x40000000, 2)))
    assert(e.getMessage.contains("truncated"))
    // and through the dead-letter path both the overflowing-header
    // payload and a plain-garbage one land on the dead side
    val payloads = Seq((1L, header(0x40000000, 2)), (2L, header(2, 0x40000000)))
      .toDF("doc_id", "payload")
    val assets = Multimodal.toAssets(payloads, "doc_id", "payload", ImageCodec.BmpMime)
    val (_, dead) = Multimodal.splitDecoded(
      Multimodal.decodeImagesWithError(spark, assets))
    assert(dead.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("skew profile: one-pass grouping-sets stats match per-column ground truth") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("b", 3L), ("b", 3L), ("c", 3L))
      .toDF("k1", "k2")
    val got = graft.operators.Skew.profile(df, Seq("k1", "k2"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Double, String)].collect().toSeq
    // k1: 6 rows, 3 keys, hottest 'a' ×3 → skew 3*3/6 = 1.5
    // k2: 6 rows, 3 keys, hottest '3' ×4 → skew 4*3/6 = 2.0
    assert(got == Seq(
      ("k1", 6L, 3L, 3L, 1.5, "a"),
      ("k2", 6L, 3L, 4L, 2.0, "3")))
    // hot-key tie breaks on the SMALLER key string
    val tied = Seq(("x", 0), ("x", 0), ("y", 0), ("y", 0)).toDF("k", "z")
    val hot = graft.operators.Skew.profile(tied, Seq("k"))
      .select("hot_key").as[String].head()
    assert(hot == "x")
    // null key values form a real group and can be the hot key
    val withNull = Seq(Some("a"), None, None).toDF("k")
    val p = graft.operators.Skew.profile(withNull, Seq("k"))
      .as[(String, Long, Long, Long, Double, Option[String])].head()
    assert(p._2 == 3L && p._3 == 2L && p._4 == 2L && p._6.isEmpty)
    // hostile column names are data, not expression text (q67 convention)
    val hostile = Seq((1L, "x"), (2L, "x")).toDF("ok", "a`b.c")
    val hp = graft.operators.Skew.profile(hostile, Seq("a`b.c"))
      .as[(String, Long, Long, Long, Double, String)].head()
    assert(hp._1 == "a`b.c" && hp._2 == 2L && hp._4 == 2L && hp._6 == "x")
  }

  test("languageQuality fusion equals qualityFeatures + langId composed") {
    val lq = TextAnalysis.languageQuality(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double, String)].collect().toSet
    val composed = TextAnalysis
      .qualityFeatures(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"))
      .join(TextAnalysis.langId(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), col("predicted_lang")), Seq("doc_id"))
      .as[(Long, Long, Double, String)].collect().toSet
    assert(lq == composed)
  }

  test("curation pipeline: stages gate in order; budget keeps best-quality docs") {
    val docs = Seq(
      // high-quality english (stopword-rich), duplicated content: 11 is dropped by dedup
      (1L, "the cat is in the house and the dog is in the garden", "web"),
      (11L, "the cat is in the house and the dog is in the garden", "web"),
      // english but below the quality floor would need ratio < 0.02 — this passes
      (2L, "a fox runs in the field and the birds fly to the trees", "web"),
      // no lexicon hits at all → 'unknown' → dropped
      (3L, "zzz qqq vvv kkk www rrr ttt yyy uuu", "spam"),
      // too short (< 5 tokens) → dropped
      (4L, "the cat", "web"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Curation.curate(docs, tokenBudget = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
    // a tight budget keeps only the highest-quality doc
    val q1 = Seq("the cat is in the house and the dog is in the garden")
      .head.split(" ").length // 13 tokens
    val tight = graft.operators.Curation.curate(docs, tokenBudget = q1.toLong)
      .select("doc_id").as[Long].collect().toSet
    assert(tight.size == 1)
    // reserved output names are guarded
    val clash = docs.withColumn("quality", lit(1.0))
    val e = intercept[IllegalArgumentException](
      graft.operators.Curation.curate(clash))
    assert(e.getMessage.contains("quality"))
  }

  test("span-cut curation: long copies collapse to empty and vanish; short copies fall to exact dedup") {
    val long1 = "the cat is in the house and the dog is in the garden today"
    val docs = Seq(
      (1L, long1, "web"),
      (11L, long1, "web"),        // verbatim re-ingest, ≥4 tokens → cut to ""
      (2L, "the cat", "web"),     // too short to window...
      (12L, "the cat", "web"),    // ...so its copy survives the cut; exact dedup drops it
      (3L, "a fox runs in the field and the birds fly to the trees", "web"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Curation.curateSpanCut(docs, tokenBudget = 1000L)
      .select("doc_id").as[Long].collect().toSet
    // 11 cut to empty (fails gates); 2/12 fail minTokens anyway but
    // only ONE of them could ever survive (exact dedup keeps min id);
    // 1 and 3 survive with their full text
    assert(out == Set(1L, 3L))
    // the surviving docs kept their (token-normalized) text intact:
    // within-doc "the ... the" repeats are only 1 token, not a 4-window
    val kept = graft.operators.Curation.curateSpanCut(docs, tokenBudget = 1000L)
      .filter(col("doc_id") === 1).select("n_tokens").as[Long].head()
    assert(kept == long1.split(" ").length.toLong)
  }

  test("segment dedup: shared blocks count as duplicates of the first occurrence only") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),          // segs: [a..j], [k l]
      (2L, "a b c d e f g h i j z z z z z z z z z z"), // first seg duplicates doc 1's
      (3L, "k l"))                               // 2-token doc; NOT a dup ("k l" first occurred as doc1's seg 2? same content)
      .toDF("id", "txt")
    val rows = graft.operators.Dedup.segmentDedup(docs, col("id"), col("txt"), segTokens = 10)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((2L, 0L)))
    assert(rows(2L) == ((2L, 1L))) // its first 10-token block repeats doc 1's
    assert(rows(3L) == ((1L, 1L))) // "k l" already occurred as doc 1's tail segment
  }

  test("repeated spans: overlapping/adjacent duplicated windows merge into maximal spans") {
    // spanTokens = 4. doc 1 owns every global first; doc 2 repeats
    // three of doc 1's windows in two separated regions; doc 3 is a
    // 3x self-repeat whose duplicated intervals chain (overlap +
    // exact adjacency at start 5 = prev_end 4 + 1) into ONE
    // doc-covering span. doc 4 is too short to window at all.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x x c d e f q a b c d e"),
      (3L, "a b c d a b c d a b c d"),
      (4L, "a b"))
      .toDF("id", "txt")
    val rows = graft.operators.Dedup.repeatedSpans(docs, col("id"), col("txt"), spanTokens = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // doc 2: dup starts {3, 8, 9} → spans [3,6] and [8,12]
    assert(rows(2L) == ((2L, 3L, 9L, 5L)))
    // doc 3: dup starts {1, 5, 6, 7, 8, 9} → one span [1,12]
    assert(rows(3L) == ((1L, 6L, 12L, 12L)))
    // docs 1 (all firsts) and 4 (no windows) are absent
    assert(rows.keySet == Set(2L, 3L))

    // the apply step: covered tokens cut, first occurrences survive,
    // span-free docs pass through token-normalized
    val cleaned = graft.operators.Dedup.dropSpans(docs, col("id"), col("txt"), spanTokens = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(cleaned(1L) == ((8L, 8L, "a b c d e f g h")))
    assert(cleaned(2L) == ((12L, 3L, "x x q")))   // kept positions 1, 2, 7
    assert(cleaned(3L) == ((12L, 0L, "")))        // the whole doc was one span
    assert(cleaned(4L) == ((2L, 2L, "a b")))      // too short to window
  }

  test("winnow overlap: a copied >= w+k-1 char run always pairs; common fingerprints capped") {
    // k=8, w=4: guarantee threshold w+k-1 = 11 chars. Docs 1/2 share a
    // 24-char verbatim run inside otherwise-different text; doc 3 is
    // unrelated. The winnowing guarantee says SOME fingerprint of the
    // run is selected in both docs → (1,2) pairs even at minShared=1.
    val run = "xqzvkwjpmrtyulsbnghcdefa" // 24 chars, no common English 4-grams
    val corpus = Seq(
      (1L, s"alpha beta gamma $run delta epsilon words here"),
      (2L, s"totally other prefix text $run and a different tail entirely"),
      (3L, "unrelated content with no copied material anywhere at all in it")
    ).toDF("doc_id", "text")
    val pairs = Dedup.fingerprintOverlapPairs(corpus, col("doc_id"), col("text"),
        k = 8, w = 4, minShared = 1, maxDf = 8)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseAll()
    assert(pairs.contains((1L, 2L)), s"copied-run pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc paired: $pairs")
    // DF cap: the same run copied into 9 docs exceeds maxDf=8 — its
    // fingerprints are "too common" and produce NO pairs
    val many = (1L to 9L).map(i => (i, s"doc number $i carries $run padding"))
      .toDF("doc_id", "text")
    val capped = Dedup.fingerprintOverlapPairs(many, col("doc_id"), col("text"),
      k = 8, w = 4, minShared = 1, maxDf = 8)
    val cappedRows = capped.count()
    Caches.releaseAll()
    // pairs may only arise from the per-doc distinct parts ("doc number i"
    // differs per doc; "padding"/"carries" appear in all 9 > maxDf)
    assert(cappedRows == 0L, s"expected DF cap to suppress all pairs, got $cappedRows")
  }

  test("lm gate: reference-fit scoring keeps fluent docs, zeroes out token soup") {
    // The LM fits on the reference (docs 1-2); doc 3 shares their
    // bigrams (kept), doc 4 is unique-token soup whose bigrams the
    // reference never saw — scored against a SELF-trained LM it would
    // be a perfect fit (each singleton bigram is deterministic given
    // its unique left word: the trap this operator's design note
    // documents), but against the reference it scores sum_left = 0
    // and fails outright.
    val corpus = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "the cat sat on the mat and the dog sat too"),
      (3L, "the cat sat on the mat near the dog"),
      (4L, "zq wv xk jp mr ty ul sb ng hc")
    ).toDF("doc_id", "text")
    val ref = corpus.filter(col("doc_id") <= 2)
    // strict gate (the corpus-aggregate fit itself): the aggregate is
    // boosted by the in-reference docs, so only the best-fit doc stays
    val strict = TextAnalysis.lmQualityGate(corpus, col("doc_id"), col("text"),
        ref, col("doc_id"), col("text"))
      .select(col("doc_id")).as[Long].collect().toSet
    Caches.releaseAll()
    assert(strict.contains(1L) && !strict.contains(4L), s"strict kept=$strict")
    // half the aggregate fit: the mid-fit out-of-reference doc 3 now
    // clears the bar; the soup still fails outright (sum_left = 0)
    val scored = TextAnalysis.lmQualityGate(corpus, col("doc_id"), col("text"),
        ref, col("doc_id"), col("text"), num = 1, den = 2)
      .select(col("doc_id")).as[Long].collect().toSet
    Caches.releaseAll()
    assert(scored.contains(3L) && !scored.contains(4L), s"kept=$scored")
    // num=0 disables the gate: every doc with >= 2 tokens survives,
    // including the soup (its score rows exist, all-zero sums)
    val all = TextAnalysis.lmQualityGate(corpus, col("doc_id"), col("text"),
      ref, col("doc_id"), col("text"), num = 0, den = 1)
    val soup = all.filter(col("doc_id") === 4L)
      .select(col("sum_pair"), col("sum_left")).collect()
    val n = all.count()
    Caches.releaseAll()
    assert(n == 4L)
    // digit-string emission (r14 overflow sweep): zero sums render "0"
    assert(soup.head.getString(0) == "0" && soup.head.getString(1) == "0")
  }

  test("pq rerank: full-cell shortlist reproduces the exact in-cell top-k") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
    val query = emb.filter(col("vec_id") === 0)
    val cellSize = emb.as("e").join(query.as("q"), col("e.label") === col("q.label"))
      .count().toInt // includes the query row itself; fine as a bound
    val rerank = Similarity.ivfPqRerank(emb, centroids, query,
        k = 5, shortlist = cellSize, m = 4)
      .select(col("rank"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = Similarity.ivfTopK(emb, query, k = 5)
      .select(col("rank"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rerank.sortBy(_._1).toSeq == exact.sortBy(_._1).toSeq,
      s"rerank=${rerank.mkString(",")} exact=${exact.mkString(",")}")
    // and the proposing adc differs from the exact score (it IS the
    // compressed approximation — equality would mean the exact pass
    // never ran)
    val both = Similarity.ivfPqRerank(emb, centroids, query,
        k = 5, shortlist = cellSize, m = 4)
      .filter(col("adc") =!= col("score")).count()
    assert(both > 0L)
  }

  test("bpe merge fold property: equals the brute-force greedy scan, incl. a==b runs") {
    import org.scalacheck.{Gen, rng}
    // the engine's carry fold and the oracle's runs-parity SQL are two
    // formulations of the same greedy pass; pin the fold against a
    // third, driver-side scan on run-heavy strings ("aaaa" is where
    // greedy semantics bite: 2 merges, not 3)
    def brute(s: String, a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i).toString == a && s(i + 1).toString == b) {
          out += (a + b); i += 2
        } else { out += s(i).toString; i += 1 }
      }
      out.toSeq
    }
    val gen = Gen.listOfN(300, for {
      s <- Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString.take(16))
      a <- Gen.oneOf("a", "b", "c")
      b <- Gen.oneOf("a", "b", "c")
    } yield (s, a, b))
    val cases = gen.apply(Gen.Parameters.default, rng.Seed(31L)).get
    val df = cases.zipWithIndex.map { case ((s, a, b), i) => (i.toLong, s, a, b) }
      .toDF("id", "word", "ta", "tb")
    // the OPERATOR'S fold (package-private), not a rebuilt copy — the
    // test must fail if mergeFold's semantics drift
    val merged = df.select(col("id"),
        TextAnalysis.mergeFold(
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))),
          col("ta"), col("tb")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    cases.zipWithIndex.foreach { case ((s, a, b), i) =>
      val exp = brute(s, a, b)
      assert(merged(i.toLong) == exp,
        s"word=$s pair=($a,$b) got=${merged(i.toLong)} expected=$exp")
    }
    // and end-to-end: a corpus where the top pair is an a==b run
    val corpus = Seq((1L, "aaaa aaaa baca")).toDF("doc_id", "text")
    val step = TextAnalysis.bpeMergeStep(corpus, col("text"))
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    Caches.releaseAll()
    assert(step("aaaa") == "aa|aa", s"got $step")
  }

  test("bpe training: merges chain (later rounds pair previously merged symbols)") {
    // "the"×3, "cat"×1: round 1 merges (h,e) — tied 3-3 with (t,h),
    // lexicographic rule picks it; round 2 pairs t with the MERGED
    // "he" (impossible without the loop's re-symbolization); rounds
    // 3-4 finish "cat" the same way
    val corpus = Seq((1L, "the the the cat")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(corpus, col("text"), merges = 4)
      .orderBy(col("step"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    Caches.releaseAll()
    assert(learned == Seq(
      (1L, "h", "e", 3L),
      (2L, "t", "he", 3L),
      (3L, "a", "t", 1L),
      (4L, "c", "at", 1L)), s"learned=$learned")
  }

  test("multi-probe IVF: probing every cell equals the brute-force top-k; fewer probes are a subset of cells") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
    val query = emb.filter(col("vec_id") === 0)
    val all = Similarity.ivfMultiProbeTopK(emb, centroids, query, k = 5, nProbe = 8)
      .select(col("rank"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.bruteForceTopK(emb, query, k = 5)
      .select(col("rank"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(all.sortBy(_._1) == brute.sortBy(_._1),
      s"all-cells multiprobe=$all brute=$brute")
    // nProbe=1 candidates come from exactly one assigned cell
    val one = Similarity.ivfMultiProbeTopK(emb, centroids, query, k = 50, nProbe = 1)
      .select(col("cell")).distinct().count()
    assert(one == 1L)
  }

  test("batch multi-probe: a 1-row batch reproduces the single-query path bit-for-bit; all-cells batch equals per-query brute force") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
    val one = emb.filter(col("vec_id") === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cell"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(Similarity.ivfMultiProbeTopKBatch(emb, centroids, one, k = 7, nProbe = 2))
        == rows(Similarity.ivfMultiProbeTopK(emb, centroids, one, k = 7, nProbe = 2)))
    // probing every cell = exact: each query's batch top-k equals brute force
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val batch = Similarity.ivfMultiProbeTopKBatch(emb, centroids, qs, k = 4, nProbe = 8)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val brute = Similarity.bruteForceTopK(emb, qs, k = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch == brute, s"batch=$batch brute=$brute")
    // an empty batch is a legitimate request → empty frame, no throw
    assert(Similarity.ivfMultiProbeTopKBatch(emb, centroids,
      emb.filter(col("vec_id") < 0), k = 4, nProbe = 2).count() == 0L)
  }

  test("batch IVF+PQ and rerank: a 1-row batch reproduces the single-query paths bit-for-bit") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
    val one = emb.filter(col("vec_id") === 0)
    val batchPq = Similarity.ivfPqTopKBatch(emb, centroids, one, k = 10, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val singlePq = Similarity.ivfPqTopK(emb, centroids, one, k = 10, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batchPq == singlePq && batchPq.nonEmpty)
    val batchRr = Similarity.ivfPqRerankBatch(emb, centroids, one,
        k = 5, shortlist = 20, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val singleRr = Similarity.ivfPqRerank(emb, centroids, one,
        k = 5, shortlist = 20, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batchRr == singleRr && batchRr.nonEmpty)
    // empty batch is a legitimate request → empty frame, no throw
    assert(Similarity.ivfPqTopKBatch(emb, centroids,
      emb.filter(col("vec_id") < 0), k = 4, m = 4).count() == 0L)
  }

  test("batch ADC: a 1-row batch reproduces pqAdcScore bit-for-bit") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
    val one = emb.filter(col("vec_id") === 3)
    val batch = Similarity.pqAdcScoreBatch(emb, centroids, one, m = 4)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).sortBy(_._1).toSeq
    val single = Similarity.pqAdcScore(emb, centroids, one, m = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(batch == single)
  }

  test("codebook strategies: literal and broadcast-frame paths are bit-identical on every centroid consumer") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 12)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val litCb = Similarity.literalCodebookOf(centroids)
    val frmCb = Similarity.frameCodebookOf(centroids)
    // assignment argmax (incl. the (score, -cid) tie rule)
    def asg(cb: Similarity.Codebook) =
      Similarity.centroidAssignWith(cb, emb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(asg(litCb) == asg(frmCb))
    // PQ encode (per-subspace argmax with the -||c||²/2 correction)
    def codes(cb: Similarity.Codebook) =
      Similarity.pqEncodeWith(cb, emb, m = 4)
        .select(col("vec_id"),
          array_join(transform(col("code"), c => c.cast("string")), "-"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(codes(litCb) == codes(frmCb))
    // multi-probe batch (probe ranking + cell join + top-k)
    def mp(cb: Similarity.Codebook) =
      Similarity.multiProbeBatchImpl(emb, cb, qs, k = 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(mp(litCb) == mp(frmCb) && mp(litCb).nonEmpty)
    // batch ADC (map-literal vs map_from_entries lookup tables)
    def adc(cb: Similarity.Codebook) =
      Similarity.pqAdcBatchImpl(emb, cb, qs, m = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(adc(litCb) == adc(frmCb) && adc(litCb).nonEmpty)
    // batch IVF+PQ (corpus-side code column + per-query tables)
    def ivfpq(cb: Similarity.Codebook) =
      Similarity.ivfPqBatchImpl(emb, cb, qs, k = 5, m = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(ivfpq(litCb) == ivfpq(frmCb) && ivfpq(litCb).nonEmpty)
  }

  test("codebook auto-selection: above LiteralCodebookMax the frame path engages and matches a forced-literal run") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val big = emb.filter(col("vec_id") < 100) // > LiteralCodebookMax=64
    assert(Similarity.LiteralCodebookMax == 64)
    // exact boundary: k = 64 stays literal (no broadcast), k = 65 flips
    def hasBroadcast(k: Int): Boolean =
      Similarity.centroidAssign(emb, emb.filter(col("vec_id") < k))
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    assert(!hasBroadcast(64) && hasBroadcast(65))
    val auto = Similarity.centroidAssign(emb, big)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val forced = Similarity.centroidAssignWith(Similarity.literalCodebookOf(big), emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(auto == forced && auto.nonEmpty)
    // the auto plan really is the frame path: a broadcast join appears
    // (the literal form is join-free)
    val plan = Similarity.centroidAssign(emb, big)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"expected the 1-row codebook broadcast in:\n$plan")
    // single-query multi-probe above the threshold delegates to the
    // (bit-identical) batch plan instead of collecting the codebook
    val one = emb.filter(col("vec_id") === 0)
    val mpBig = Similarity.ivfMultiProbeTopK(emb, big, one, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._2).toSeq
    val mpBatch = Similarity.ivfMultiProbeTopKBatch(emb, big, one, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._2).toSeq
    assert(mpBig == mpBatch && mpBig.nonEmpty)
  }

  test("batch ANN: an empty centroid set is a legitimate zero-result request; single-query/assignment contracts stay loud") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val none = emb.filter(col("vec_id") < 0)
    val qs = emb.filter(col("vec_id") === 0)
    assert(Similarity.ivfMultiProbeTopKBatch(emb, none, qs, k = 4, nProbe = 2).count() == 0L)
    assert(Similarity.pqAdcScoreBatch(emb, none, qs, m = 4).count() == 0L)
    assert(Similarity.ivfPqTopKBatch(emb, none, qs, k = 4, m = 4).count() == 0L)
    assert(Similarity.ivfPqRerankBatch(emb, none, qs, k = 4, shortlist = 8, m = 4).count() == 0L)
    val e = intercept[IllegalArgumentException] {
      Similarity.centroidAssign(emb, none)
    }
    assert(e.getMessage.contains("centroid set is empty"))
  }

  test("batch ANN: a query whose dim differs from the centroids fails loud, not NULL-ranked") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
    val narrow = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"),
        col("label"))
    def msg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && (c.getMessage == null || !c.getMessage.contains("query dim"))) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    val e1 = intercept[Throwable] {
      Similarity.ivfMultiProbeTopKBatch(emb, centroids, narrow, k = 4, nProbe = 2).collect()
    }
    assert(msg(e1).contains("query dim"), s"got: ${msg(e1)}")
    val e2 = intercept[Throwable] {
      Similarity.pqAdcScoreBatch(emb, centroids, narrow, m = 4).collect()
    }
    assert(msg(e2).contains("query dim"), s"got: ${msg(e2)}")
    val e3 = intercept[Throwable] {
      Similarity.ivfPqTopKBatch(emb, centroids, narrow, k = 4, m = 4).collect()
    }
    assert(msg(e3).contains("query dim"), s"got: ${msg(e3)}")
  }

  test("frame codebook: duplicate centroid ids and ragged dims fail loud IN-PLAN, matching the literal path's contract") {
    // r17 advice: the frame path (k > LiteralCodebookMax) used to skip
    // the duplicate-id check the literal collect enforces, silently
    // tie-breaking assignment over a corrupt codebook, and derived
    // `dim` from an arbitrary probe row so a ragged set NULL-ranked
    // instead of erroring. Both contracts now hold on BOTH sides of
    // the auto-selection boundary — enforced in the frame's single
    // aggregated row (no driver collect).
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 8)
    def msg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null &&
        (c.getMessage == null || !c.getMessage.contains("centroid"))) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    val dup = cents.union(cents.limit(2))
    val e1 = intercept[Throwable] {
      Similarity.centroidAssignWith(Similarity.frameCodebookOf(dup), emb).collect()
    }
    assert(msg(e1).contains("centroid ids are not distinct"), s"got: ${msg(e1)}")
    val ragged = cents.union(emb.filter(col("vec_id") === 20)
      .select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"),
        col("label")))
    val e2 = intercept[Throwable] {
      Similarity.centroidAssignWith(Similarity.frameCodebookOf(ragged), emb).collect()
    }
    assert(msg(e2).contains("centroid dims are not uniform"), s"got: ${msg(e2)}")
    // the checks ride every frame consumer (one centsFrame seam), and
    // a well-formed codebook still builds — the gate costs one 1-row
    // expression, not a plan change
    assert(Similarity.centroidAssignWith(
      Similarity.frameCodebookOf(cents), emb).count() > 0L)
  }

  /** Canonical probe-result rows (query_id, rank, neighbor_id, cell,
    * score) — one comparator for every layout-vs-recompute pin. */
  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq

  test("IVF layout: multi-probe against the partition-by-cell layout is hash-identical to the unpartitioned path") {
    // the scaladoc claim the r17 verdict named as the last unproven
    // piece of the ANN-at-100TB story: the layout must change the
    // WORK (partition pruning — PlanAuditSpec pins the dynamicpruning
    // filter on s71's executed scan), never the ANSWER.
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100) // > LiteralCodebookMax: frame path
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_layout").toString
    val layout = graft.operators.Similarity.buildIvfLayout(emb, cents, tmp)
    val onLayout = canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
      layout, cents, qs, k = 5, nProbe = 3))
    val plain = canon(Similarity.ivfMultiProbeTopKBatch(
      emb, cents, qs, k = 5, nProbe = 3))
    assert(onLayout == plain && onLayout.nonEmpty)
    // a literal-path codebook probes the same stored layout identically
    val centsSmall = emb.filter(col("vec_id") < 8)
    val layoutSmall = graft.operators.Similarity.buildIvfLayout(emb, centsSmall,
      java.nio.file.Files.createTempDirectory("graft_ivf_layout_s").toString)
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
        layoutSmall, centsSmall, qs, k = 5, nProbe = 2)) ==
      canon(Similarity.ivfMultiProbeTopKBatch(
        emb, centsSmall, qs, k = 5, nProbe = 2)))
    // batch contract: empty centroid set ⇒ empty frame, no throw
    assert(Similarity.ivfMultiProbeTopKBatchOnLayout(
      layout, emb.filter(col("vec_id") < 0), qs, k = 5, nProbe = 3).count() == 0L)
  }

  test("IVF layout append: an incrementally-grown index is indistinguishable from a bulk build, and untouched cells' files stay untouched") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    // bulk build over the whole corpus
    val bulkDir = java.nio.file.Files.createTempDirectory("graft_ivf_bulk").toString
    val bulk = Similarity.buildIvfLayout(emb, cents, bulkDir)
    // incremental: even half built, odd half appended later
    val incDir = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    Similarity.buildIvfLayout(emb.filter(col("vec_id") % 2 === 0), cents, incDir)
    // the maintenance contract: appending a batch must not rewrite
    // existing cells — snapshot one populated cell dir's file listing
    val cellDir = {
      val ds = new java.io.File(incDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(ds.nonEmpty, s"no cell dirs written under $incDir")
      ds.minBy(_.getName)
    }
    def files(d: java.io.File): Set[(String, Long)] =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val before = files(cellDir)
    val inc = Similarity.appendToIvfLayout(
      emb.filter(col("vec_id") % 2 === 1), cents, incDir)
    val after = files(cellDir)
    assert(before.subsetOf(after) && before.nonEmpty,
      s"append rewrote or removed pre-existing files in ${cellDir.getName}: " +
        s"before=$before after=$after")
    // ...and the probe over the grown index equals the bulk build's
    val a = canon(Similarity.ivfMultiProbeTopKBatchOnLayout(inc, cents, qs, k = 5, nProbe = 3))
    val b = canon(Similarity.ivfMultiProbeTopKBatchOnLayout(bulk, cents, qs, k = 5, nProbe = 3))
    assert(a == b && a.nonEmpty)
  }

  test("IVF layout append: a different centroid set than the build's is rejected loudly") {
    // the r18 advice defect: appending through the wrong codebook
    // writes rows into cells inconsistent with the stored partitioning
    // — unreachable or wrong-cell rows — while every same-codebook
    // test stays green. The build records a codebook fingerprint
    // sidecar; append must match it.
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_fp").toString
    Similarity.buildIvfLayout(emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") < 16), dir)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfLayout(emb.filter(col("vec_id") % 2 === 1),
        emb.filter(col("vec_id") < 24), dir) // DIFFERENT centroid set
    }
    assert(e.getMessage.contains("fingerprint"), e.getMessage)
    // the SAME centroid content through a different (equal) frame is fine
    Similarity.appendToIvfLayout(emb.filter(col("vec_id") % 2 === 1),
      emb.filter(col("vec_id") <= 15), dir)
    // appending into a dir that was never built (no sidecar) is loud too
    val bare = java.nio.file.Files.createTempDirectory("graft_ivf_bare").toString
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfLayout(emb.limit(4), emb.filter(col("vec_id") < 8), bare)
    }
    assert(e2.getMessage.contains("sidecar"), e2.getMessage)
  }

  test("IVF layout compaction: fragmented cells collapse, untouched cells byte-untouched, probe hash-identical") {
    // the third lifecycle leg: after N appends a hot cell is N small
    // files — compaction rewrites ONLY over-fragmented cells (cost ∝
    // fragmentation) and must change the files, never the answer
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cpt").toString
    Similarity.buildIvfLayout(emb.filter(col("vec_id") % 3 === 0), cents, dir)
    Similarity.appendToIvfLayout(emb.filter(col("vec_id") % 3 === 1), cents, dir)
    val grown = Similarity.appendToIvfLayout(
      emb.filter(col("vec_id") % 3 === 2), cents, dir)
    val before = canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
      grown, cents, qs, k = 5, nProbe = 3))
    def cellFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    val filesBefore = cellFiles()
    val frag = filesBefore.filter(_._2.size > 1).keySet
    val untouched = filesBefore.keySet -- frag
    assert(frag.nonEmpty, s"fixture built no fragmented cells: $filesBefore")
    assert(untouched.nonEmpty, s"fixture left no single-file cells: $filesBefore")
    val compacted = Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    val filesAfter = cellFiles()
    // fragmented cells now hold exactly one data file each
    for (c <- frag)
      assert(filesAfter(c).size == 1, s"$c not compacted: ${filesAfter(c)}")
    // untouched cells' listings are byte-identical (name + mtime)
    for (c <- untouched)
      assert(filesAfter(c) == filesBefore(c),
        s"compaction touched $c: before=${filesBefore(c)} after=${filesAfter(c)}")
    // and the probe is indistinguishable from the pre-compaction index
    val after = canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
      compacted, cents, qs, k = 5, nProbe = 3))
    assert(after == before && after.nonEmpty)
    // idempotent: a second compaction finds nothing fragmented and
    // leaves every listing alone
    Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    assert(cellFiles() == filesAfter)
  }

  test("bucketed IVF layout: probe is hash-identical to the unpartitioned path on both codebook strategies") {
    // the large-nlist storage regime (LayoutCellDirMax's other side):
    // grouping cells into bucket directories must change the file
    // layout, never the answer
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    // frame-path codebook (100 > LiteralCodebookMax), 8 buckets
    val cents = emb.filter(col("vec_id") < 100)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_bkt").toString
    val layout = Similarity.buildIvfLayoutBucketed(emb, cents, dir, buckets = 8)
    // directory count is the BUCKET count, not the cell count
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_bucket=")).toSeq
    assert(dirs.size <= 8 && dirs.nonEmpty, s"got ${dirs.map(_.getName)}")
    val bucketed = canon(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
      layout, cents, qs, k = 5, nProbe = 3, buckets = 8))
    val plain = canon(Similarity.ivfMultiProbeTopKBatch(
      emb, cents, qs, k = 5, nProbe = 3))
    assert(bucketed == plain && bucketed.nonEmpty)
    // literal-path codebook over the same stored shape
    val centsSmall = emb.filter(col("vec_id") < 8)
    val dirS = java.nio.file.Files.createTempDirectory("graft_ivf_bkt_s").toString
    val layoutS = Similarity.buildIvfLayoutBucketed(emb, centsSmall, dirS, buckets = 4)
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
        layoutS, centsSmall, qs, k = 5, nProbe = 2, buckets = 4)) ==
      canon(Similarity.ivfMultiProbeTopKBatch(
        emb, centsSmall, qs, k = 5, nProbe = 2)))
    // batch contract: empty centroid set ⇒ empty frame, no throw
    assert(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
      layout, emb.filter(col("vec_id") < 0), qs, k = 5, nProbe = 3,
      buckets = 8).count() == 0L)
  }

  test("bucketed IVF layout lifecycle: scheme-guarded append + compaction, grown == bulk, untouched buckets untouched") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_bktlc").toString
    Similarity.buildIvfLayoutBucketed(
      emb.filter(col("vec_id") % 2 === 0), cents, dir, buckets = 8)
    // the scheme is load-bearing, not just the fingerprint: a per-cell
    // append into a bucketed layout would write cell= dirs no bucketed
    // probe ever prunes to — rejected loudly even with the RIGHT
    // codebook
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfLayout(emb.filter(col("vec_id") % 2 === 1), cents, dir)
    }
    assert(e.getMessage.contains("partitioned as"), e.getMessage)
    // ...as is a bucketed append with a different modulus
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfLayoutBucketed(
        emb.filter(col("vec_id") % 2 === 1), cents, dir, buckets = 4)
    }
    assert(e2.getMessage.contains("partitioned as"), e2.getMessage)
    // untouched buckets' files survive a matching append byte-identical:
    // append ONE vector — exactly one bucket is touched
    def bucketFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell_bucket="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = bucketFiles()
    val one = emb.filter(col("vec_id") === 1)
    Similarity.appendToIvfLayoutBucketed(one, cents, dir, buckets = 8)
    val afterOne = bucketFiles()
    val touched = afterOne.filter { case (k, v) => before.get(k) != Some(v) }.keySet
    assert(touched.size == 1, s"one-vector append touched $touched")
    for ((k, v) <- before if !touched(k))
      assert(afterOne(k) == v, s"append rewrote untouched bucket $k")
    // grow the rest; the grown index probes identically to a bulk build
    val grown = Similarity.appendToIvfLayoutBucketed(
      emb.filter(col("vec_id") % 2 === 1 && col("vec_id") =!= 1), cents, dir,
      buckets = 8)
    val bulkDir = java.nio.file.Files.createTempDirectory("graft_ivf_bktblk").toString
    val bulk = Similarity.buildIvfLayoutBucketed(emb, cents, bulkDir, buckets = 8)
    val a = canon(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
      grown, cents, qs, k = 5, nProbe = 3, buckets = 8))
    assert(a == canon(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
      bulk, cents, qs, k = 5, nProbe = 3, buckets = 8)) && a.nonEmpty)
    // compaction is scheme-aware: the fragmented buckets (3 appends)
    // collapse to one file each, probe unchanged
    val fragBefore = bucketFiles()
    assert(fragBefore.values.exists(_.size > 1), s"fixture not fragmented: $fragBefore")
    val compacted = Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    val fragAfter = bucketFiles()
    assert(fragAfter.values.forall(_.size == 1), s"not compacted: $fragAfter")
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
      compacted, cents, qs, k = 5, nProbe = 3, buckets = 8)) == a)
    // compacting an unbuilt dir is loud
    val bare = java.nio.file.Files.createTempDirectory("graft_ivf_nosc").toString
    val e3 = intercept[IllegalArgumentException] {
      Similarity.compactIvfLayout(spark, bare)
    }
    assert(e3.getMessage.contains("sidecar"), e3.getMessage)
    // a probe with the WRONG modulus is a silent wrong answer
    // (probed cell 13 lives in cell_bucket=13 at B=16; floorMod(13,8)
    // keeps only bucket 5) — rejected against the sidecar
    val e4 = intercept[IllegalArgumentException] {
      Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
        compacted, cents, qs, k = 5, nProbe = 3, buckets = 4)
    }
    assert(e4.getMessage.contains("buckets=8"), e4.getMessage)
  }

  test("buildIvfLayoutAuto picks the regime from the measured bound: bucketed above, per-cell below, scheme readable") {
    // the caller no longer chooses per-cell vs bucketed by reading a
    // warning log: one distinct-assigned-cells aggregate picks the
    // regime against the LayoutCellDirMax bound (parameterized here —
    // a 500-vector corpus can never exceed the real 1000)
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val plain = canon(Similarity.ivfMultiProbeTopKBatch(
      emb, cents, qs, k = 5, nProbe = 3))
    // ~100 populated cells > 50 ⇒ bucketed
    val dirB = java.nio.file.Files.createTempDirectory("graft_auto_b").toString
    val lb = Similarity.buildIvfLayoutAuto(emb, cents, dirB, buckets = 8,
      dirMax = 50)
    assert(Similarity.ivfLayoutScheme(spark, dirB).contains("buckets=8"))
    assert(new java.io.File(dirB).listFiles()
      .exists(_.getName.startsWith("cell_bucket=")))
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnBucketedLayout(
      lb, cents, qs, k = 5, nProbe = 3, buckets = 8)) == plain)
    // ~100 populated cells ≤ 500 ⇒ per-cell
    val dirC = java.nio.file.Files.createTempDirectory("graft_auto_c").toString
    val lc = Similarity.buildIvfLayoutAuto(emb, cents, dirC, buckets = 8,
      dirMax = 500)
    assert(Similarity.ivfLayoutScheme(spark, dirC).contains("cells"))
    assert(new java.io.File(dirC).listFiles()
      .exists(_.getName.startsWith("cell=")))
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
      lc, cents, qs, k = 5, nProbe = 3)) == plain && plain.nonEmpty)
    // no sidecar ⇒ no scheme
    assert(Similarity.ivfLayoutScheme(spark,
      java.nio.file.Files.createTempDirectory("graft_auto_n").toString).isEmpty)
  }

  test("IVFPQ bucketed layout: stored-code probe is hash-identical to the unpartitioned twin on both codebook strategies") {
    // the s76 composition (r19 verdict item 1): codes STORED at build
    // + bucket-pruned ADC scan + exact rerank must equal the
    // unpartitioned recompute (ivfPqMultiProbeRerankBatch) bit for
    // bit — the layout and its stored codes change the WORK, never
    // the answer
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    def canon5(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    // frame-path codebook (100 > LiteralCodebookMax)
    val cents = emb.filter(col("vec_id") < 100)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val layout = Similarity.buildIvfPqLayoutBucketed(emb, cents, dir,
      buckets = 8, m = 4)
    val onLayout = canon5(Similarity.ivfPqRerankBatchOnBucketedLayout(
      layout, cents, qs, k = 5, shortlist = 12, nProbe = 3, buckets = 8, m = 4))
    val plain = canon5(Similarity.ivfPqMultiProbeRerankBatch(
      emb, cents, qs, k = 5, shortlist = 12, nProbe = 3, m = 4))
    assert(onLayout == plain && onLayout.nonEmpty)
    // literal-path codebook over the same stored shape
    val centsSmall = emb.filter(col("vec_id") < 8)
    val dirS = java.nio.file.Files.createTempDirectory("graft_ivfpq_s").toString
    val layoutS = Similarity.buildIvfPqLayoutBucketed(emb, centsSmall, dirS,
      buckets = 4, m = 4)
    assert(canon5(Similarity.ivfPqRerankBatchOnBucketedLayout(
        layoutS, centsSmall, qs, k = 5, shortlist = 12, nProbe = 2,
        buckets = 4, m = 4)) ==
      canon5(Similarity.ivfPqMultiProbeRerankBatch(
        emb, centsSmall, qs, k = 5, shortlist = 12, nProbe = 2, m = 4)))
    // empty centroid set ⇒ empty frame (the batch-entry contract)
    assert(Similarity.ivfPqRerankBatchOnBucketedLayout(
      layout, emb.filter(col("vec_id") < 0), qs, k = 5, shortlist = 12,
      nProbe = 3, buckets = 8, m = 4).count() == 0L)
  }

  test("IVFPQ bucketed layout lifecycle: append + compact preserve the probe; sidecar rejects every cross-regime misuse") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    def canon5(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_lc").toString
    Similarity.buildIvfPqLayoutBucketed(
      emb.filter(col("vec_id") % 2 === 0), cents, dir, buckets = 8, m = 4)
    // wrong m on append: tables built for different slices — loud
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqLayoutBucketed(
        emb.filter(col("vec_id") % 2 === 1), cents, dir, buckets = 8, m = 2)
    }
    assert(e1.getMessage.contains("pq=2"), e1.getMessage)
    // wrong modulus on append — loud
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqLayoutBucketed(
        emb.filter(col("vec_id") % 2 === 1), cents, dir, buckets = 4, m = 4)
    }
    assert(e2.getMessage.contains("partitioned as"), e2.getMessage)
    // a CODE-LESS bucketed append into a PQ layout — loud (the codes
    // column would silently go null for the appended rows)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfLayoutBucketed(
        emb.filter(col("vec_id") % 2 === 1), cents, dir, buckets = 8)
    }
    assert(e3.getMessage.contains("fingerprint"), e3.getMessage)
    // grow + compact; the result probes as a bulk build
    val grown = Similarity.appendToIvfPqLayoutBucketed(
      emb.filter(col("vec_id") % 2 === 1), cents, dir, buckets = 8, m = 4)
    val a = canon5(Similarity.ivfPqRerankBatchOnBucketedLayout(
      grown, cents, qs, k = 5, shortlist = 12, nProbe = 3, buckets = 8, m = 4))
    val compacted = Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    assert(canon5(Similarity.ivfPqRerankBatchOnBucketedLayout(
      compacted, cents, qs, k = 5, shortlist = 12, nProbe = 3,
      buckets = 8, m = 4)) == a)
    val bulkDir = java.nio.file.Files.createTempDirectory("graft_ivfpq_blk").toString
    val bulk = Similarity.buildIvfPqLayoutBucketed(emb, cents, bulkDir,
      buckets = 8, m = 4)
    assert(canon5(Similarity.ivfPqRerankBatchOnBucketedLayout(
      bulk, cents, qs, k = 5, shortlist = 12, nProbe = 3,
      buckets = 8, m = 4)) == a && a.nonEmpty)
    // probing a code-less layout through the PQ probe — loud
    val plainDir = java.nio.file.Files.createTempDirectory("graft_ivfpq_pl").toString
    val plain = Similarity.buildIvfLayoutBucketed(emb, cents, plainDir, buckets = 8)
    val e4 = intercept[IllegalArgumentException] {
      Similarity.ivfPqRerankBatchOnBucketedLayout(
        plain, cents, qs, k = 5, shortlist = 12, nProbe = 3, buckets = 8, m = 4)
    }
    assert(e4.getMessage.contains("no PQ codes"), e4.getMessage)
    // probing a PQ layout with the wrong m — loud
    val e5 = intercept[IllegalArgumentException] {
      Similarity.ivfPqRerankBatchOnBucketedLayout(
        bulk, cents, qs, k = 5, shortlist = 12, nProbe = 3, buckets = 8, m = 2)
    }
    assert(e5.getMessage.contains("m=2"), e5.getMessage)
  }

  test("IVF compaction crash recovery: a staged cell whose swap was interrupted is restored, not destroyed") {
    // the crash window: a previous compaction died AFTER delete(dst)
    // and BEFORE rename(src, dst) — the cell's only copy lives in the
    // committed staging dir. A naive rerun clears tmp first and the
    // cell vanishes with nothing flagging (the fragment listing just
    // stops seeing it). The recovery contract: a committed staging
    // dir's partitions with missing dsts are renamed IN before the
    // staging area is cleared.
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash").toString
    val built = Similarity.buildIvfLayout(emb, cents, dir)
    val expect = canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
      built, cents, qs, k = 5, nProbe = 3))
    // simulate the mid-swap crash state: move one populated cell dir
    // into a committed staging area (tmp with _SUCCESS), dst missing
    val root = new java.io.File(dir)
    val cell = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).minBy(_.getName)
    val tmp = new java.io.File(root.getParent, root.getName + "_compact_tmp")
    assert(tmp.mkdirs())
    assert(new java.io.File(tmp, "_SUCCESS").createNewFile())
    val staged = new java.io.File(tmp, cell.getName)
    assert(cell.renameTo(staged), s"fixture move failed for ${cell.getName}")
    // the rerun must recover the cell before doing anything else
    val recovered = Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    assert(new java.io.File(root, cell.getName).exists(), "cell not restored")
    assert(!tmp.exists(), "staging area not cleared after recovery")
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
      recovered, cents, qs, k = 5, nProbe = 3)) == expect)
    // an UNcommitted staging dir (no _SUCCESS: the crash was mid-write,
    // no dst was ever deleted) is discarded, never renamed in
    val tmp2 = new java.io.File(root.getParent, root.getName + "_compact_tmp")
    assert(tmp2.mkdirs())
    val junk = new java.io.File(tmp2, "cell=999999")
    assert(junk.mkdirs())
    Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    assert(!tmp2.exists() && !new java.io.File(root, "cell=999999").exists(),
      "uncommitted staging must be discarded, not swapped in")
  }

  /** The biggest assignment cell and one member of it — the fixture
    * both enforcement tests hold out so a deterministic append can
    * target a cell known to exist (and, rebuilt without the holdout,
    * known to be fragmented). */
  private def bigCellHoldout(emb: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val asg = Similarity.centroidAssign(emb, cents)
      .select(col("vec_id"), col("centroid_id"))
    val big = asg.groupBy(col("centroid_id")).count()
      .orderBy(desc("count"), col("centroid_id")).head().getLong(0)
    val holdout = asg.filter(col("centroid_id") === big)
      .agg(min(col("vec_id"))).head().getLong(0)
    (big, holdout)
  }

  test("IVF compaction ENFORCES the append contract: an interleaved append survives, that partition's swap is aborted") {
    // the r19-verdict loss window: an append landing a file into a
    // fragmented cell between compaction's staging snapshot and that
    // cell's swap was silently destroyed (the staged rewrite predates
    // the appended file). The enforced contract: the swap re-lists the
    // cell after moving it aside — a listing that differs from the
    // staging snapshot aborts THAT cell's swap (old dir renamed
    // straight back, appended file intact), every other fragmented
    // cell still compacts, and nothing anywhere loses a byte.
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val (bigCell, holdout) = bigCellHoldout(emb, cents)
    val rest = emb.filter(col("vec_id") =!= holdout)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ilv").toString
    Similarity.buildIvfLayout(rest.filter(col("vec_id") % 3 === 0), cents, dir)
    Similarity.appendToIvfLayout(rest.filter(col("vec_id") % 3 === 1), cents, dir)
    Similarity.appendToIvfLayout(rest.filter(col("vec_id") % 3 === 2), cents, dir)
    def cellFileNames(c: Long): Set[String] = {
      val d = new java.io.File(dir, s"cell=$c")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    assert(cellFileNames(bigCell).size > 1,
      s"fixture: cell=$bigCell not fragmented (${cellFileNames(bigCell)})")
    // interleave: the hook fires immediately before each swap — when
    // the fragmented big cell's turn comes, land a real append into it
    var fired = false
    val compacted = Similarity.compactIvfLayout(spark, dir, 1, { c =>
      if (c == bigCell) {
        Similarity.appendToIvfLayout(
          emb.filter(col("vec_id") === holdout), cents, dir)
        fired = true
      }
    })
    assert(fired, "hook never fired for the fragmented big cell")
    // the appended row SURVIVED (the r19 window destroyed it) ...
    assert(compacted.filter(col("vec_id") === holdout).count() == 1L,
      "interleaved append was destroyed by the swap")
    // ... nothing else was lost ...
    assert(compacted.count() == emb.count(), "compaction lost rows")
    // ... the contested cell's swap was aborted (still fragmented) ...
    assert(cellFileNames(bigCell).size > 1,
      s"contested cell was swapped despite the interleaved append")
    // ... other fragmented cells compacted, and the probe answers as
    // a bulk build over the WHOLE corpus (holdout included)
    val others = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=") &&
        f.getName != s"cell=$bigCell")
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(others.forall(_ == 1), s"uncontested cells not compacted: ${others.toSeq}")
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
        compacted, cents, qs, k = 5, nProbe = 3)) ==
      canon(Similarity.ivfMultiProbeTopKBatch(emb, cents, qs, k = 5, nProbe = 3)))
    // once the writer quiesces, a re-run compacts the skipped cell too
    val again = Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 1)
    assert(cellFileNames(bigCell).size == 1, "quiesced re-run did not compact")
    assert(again.count() == emb.count())
  }

  test("IVF compaction crash recovery, two-rename protocol: interrupted swaps restore the OLD copy, completed swaps discard it") {
    // the three crash states the old-sibling dir distinguishes:
    //  A  old present + staged present + dst missing  — crashed between
    //     the two renames: the OLD copy is authoritative (it may carry
    //     post-staging appends the staged rewrite never saw) → restored,
    //     staged discarded
    //  B  like A but an append re-created dst before recovery ran —
    //     old files MERGE into dst alongside the appended file
    //  C  old present + staged gone — the swap completed; old is
    //     redundant → discarded, dst untouched
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 100)
    val qs = emb.filter(col("vec_id") % 100 === 1)
    val (bigCell, holdout) = bigCellHoldout(emb, cents)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash2").toString
    Similarity.buildIvfLayout(emb.filter(col("vec_id") =!= holdout), cents, dir)
    val root = new java.io.File(dir)
    def files(d: java.io.File): Set[String] =
      Option(d.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val cellY = s"cell=$bigCell" // state B: holdout's append re-creates it
    val otherCells = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=") &&
        f.getName != cellY)
      .map(_.getName).sorted
    val (cellX, cellZ) = (otherCells(0), otherCells(1))
    val (xBefore, yBefore, zBefore) = (files(new java.io.File(root, cellX)),
      files(new java.io.File(root, cellY)), files(new java.io.File(root, cellZ)))
    val tmp = new java.io.File(root.getParent, root.getName + "_compact_tmp")
    val tmpOld = new java.io.File(root.getParent, root.getName + "_compact_old")
    assert(tmp.mkdirs() && tmpOld.mkdirs())
    assert(new java.io.File(tmp, "_SUCCESS").createNewFile())
    def junkStaged(cell: String): Unit = {
      val d = new java.io.File(tmp, cell)
      assert(d.mkdirs())
      java.nio.file.Files.write(new java.io.File(d, "part-junk.parquet").toPath,
        Array[Byte](1, 2, 3))
    }
    // state A: X moved aside, staged copy present, dst missing
    assert(new java.io.File(root, cellX).renameTo(new java.io.File(tmpOld, cellX)))
    junkStaged(cellX)
    // state B: Y moved aside, staged present — then an append lands
    // the holdout INTO Y, re-creating dst with one new file
    assert(new java.io.File(root, cellY).renameTo(new java.io.File(tmpOld, cellY)))
    junkStaged(cellY)
    Similarity.appendToIvfLayout(
      emb.filter(col("vec_id") === holdout), cents, dir)
    val yAppended = files(new java.io.File(root, cellY))
    assert(yAppended.nonEmpty && (yAppended & yBefore).isEmpty,
      s"fixture: append did not re-create $cellY fresh")
    // state C: Z's old copy lingers but its staged copy is gone
    // (swap completed) — COPY so dst keeps the "rewrite"
    val zOld = new java.io.File(tmpOld, cellZ)
    assert(zOld.mkdirs())
    for (f <- new java.io.File(root, cellZ).listFiles())
      java.nio.file.Files.copy(f.toPath, new java.io.File(zOld, f.getName).toPath)
    val recovered = Similarity.compactIvfLayout(spark, dir, maxFilesPerCell = 100)
    assert(!tmp.exists() && !tmpOld.exists(), "sibling dirs not cleared")
    // A: restored byte-for-byte, junk staged copy discarded
    assert(files(new java.io.File(root, cellX)) == xBefore, "state A not restored")
    // B: old files merged in ALONGSIDE the appended file
    assert(files(new java.io.File(root, cellY)) == (yBefore ++ yAppended),
      s"state B lost files: ${files(new java.io.File(root, cellY))}")
    // C: dst untouched, redundant old copy gone
    assert(files(new java.io.File(root, cellZ)) == zBefore, "state C dst touched")
    // nothing lost anywhere: the recovered layout IS the full corpus
    assert(recovered.count() == emb.count(), "recovery lost rows")
    assert(canon(Similarity.ivfMultiProbeTopKBatchOnLayout(
        recovered, cents, qs, k = 5, nProbe = 3)) ==
      canon(Similarity.ivfMultiProbeTopKBatch(emb, cents, qs, k = 5, nProbe = 3)))
  }

  test("bpe encode: counts match the hand-trained merge table exactly") {
    // same fixture as the training test: after 4 merges "the" and
    // "cat" are single symbols — 4 words, 4 symbols, 12 chars
    val corpus = Seq((1L, "the the the cat")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(corpus, col("doc_id"), col("text"), merges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    Caches.releaseAll()
    assert(enc.toSeq == Seq((1L, 4L, 4L, 12L)), s"got ${enc.toSeq}")
  }

  test("pageRank: exact fixed-point update matches hand computation; dangling mass redistributes") {
    // 1→2, 1→3, 2→3; node 3 is dangling. n=3, base = 10^12 div 3 =
    // 333333333333. Round 1 by hand (all ops truncating division):
    //   contribs: 1 sends base div 2 = 166666666666 to {2,3};
    //             2 sends base = 333333333333 to 3
    //   dang = r(3) = 333333333333; share = dang div 3 = 111111111111
    //   (15·base) div 100 = 49999999999
    //   r(1) = 49999999999 + (85·111111111111) div 100        = 144444444443
    //   r(2) = 49999999999 + (85·277777777777) div 100        = 286111111109
    //   r(3) = 49999999999 + (85·611111111110) div 100        = 569444444442
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r1 = graft.operators.Graph.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 144444444443L, 2L -> 286111111109L, 3L -> 569444444442L))
    Caches.releaseAll()
    val r3 = graft.operators.Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dangling redistribution conserves mass up to truncation drift
    // (≤ a few units per division per round); the sink outranks all
    assert(r3.values.sum <= 1000000000000L && r3.values.sum > 999999900000L)
    assert(r3(3L) > r3(2L) && r3(2L) > r3(1L))
    Caches.releaseAll()
  }

  test("pageRankWeighted: rank splits proportionally to out-weights (hand-computed round)") {
    // 1→2 w=1, 1→3 w=3 (W(1)=4); nodes 2,3 dangling. n=3,
    // base = 333333333333, base15 = 49999999999.
    //   contrib(2) = (base·1) div 4 = 83333333333
    //   contrib(3) = (base·3) div 4 = 249999999999
    //   dang = 2·base; share = dang div 3 = 222222222222
    //   r(1) = 49999999999 + (85·222222222222) div 100  = 238888888887
    //   r(2) = 49999999999 + (85·305555555555) div 100  = 309722222220
    //   r(3) = 49999999999 + (85·472222222221) div 100  = 451388888886
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 3L)).toDF("src", "dst", "w")
    val r1 = graft.operators.Graph.pageRankWeighted(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 238888888887L, 2L -> 309722222220L, 3L -> 451388888886L))
    Caches.releaseAll()
  }

  test("triangleCounts: K4 plus a pendant — 3 per clique node, 0 for the pendant; duplicate/reversed edges collapse") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 3L), (2L, 1L), // reversed duplicates must not double-count
      (4L, 5L), (5L, 5L)  // pendant + self-loop (dropped)
    ).toDF("a", "b")
    val out = graft.operators.Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    Caches.releaseAll()
  }

  test("phraseSearch: overlapping repeated-term occurrences each count; non-adjacent words do not match") {
    val d = Seq((1L, "a a a b"), (2L, "a c b"), (3L, "b a")).toDF("doc_id", "text")
    def run(phrase: String*) =
      TextAnalysis.phraseSearch(d, col("doc_id"), col("text"), phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("a", "a") == Map(1L -> 2L))        // starts 0 and 1 overlap
    assert(run("a", "b") == Map(1L -> 1L)) // doc 3 is "b a" — reversed, no match
    assert(run("a", "c", "b") == Map(2L -> 1L))
  }

  test("clusterRepresentatives: best quality wins; ties break to the smallest id; singletons keep themselves") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "cluster_id")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (9L, 2L)).toDF("id", "q")
    val out = Dedup.clusterRepresentatives(labels, quality)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cluster 1: docs 2 and 3 tie at q=9 → smaller id 2 wins, 3 members
    assert(out == Map(1L -> ((2L, 9L, 3L)), 9L -> ((9L, 2L, 1L))))
  }

  test("labelPropagate: majority wins, ties break to the smaller label, clamped seeds never re-vote, reach grows per round") {
    import graft.operators.Graph
    // 1—2, 2—3, 4—2; seeds 1→10, 4→20. Round 1: node 2 ties 10 vs 20
    // → 10. Round 2: node 3 reaches the newly labeled 2 → 10.
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 2L)).toDF("a", "b")
    val seeds = Seq((1L, 10L), (4L, 20L)).toDF("id", "label")
    val one = Graph.labelPropagate(edges, seeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 10L, 4L -> 20L, 2L -> 10L)) // 3 not yet reached
    Caches.releaseAll()
    val two = Graph.labelPropagate(edges, seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 10L, 4L -> 20L, 2L -> 10L, 3L -> 10L))
    Caches.releaseAll()
  }

  test("bfsDistances: first discovery is the min hop; cap stops the frontier; two seeds meet in the middle") {
    import graft.operators.Graph
    // path 1—2—3—4—5, symmetrized
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val fromOne = Graph.bfsDistances(edges, Seq(1L).toDF("id"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromOne == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 is beyond the cap
    Caches.releaseAll()
    val fromEnds = Graph.bfsDistances(edges, Seq(1L, 5L).toDF("id"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromEnds == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    Caches.releaseAll()
  }

  test("cache contract: zero persistent RDDs after each pinning operator's action + releaseAll") {
    // The library-wide cache-lifetime contract (graft.Caches): every
    // operator-internal persist/localCheckpoint is registered, and
    // Caches.releaseAll() at the caller's done-with-results boundary
    // must leave NO storage behind — without leaning on the session-
    // wide spark.catalog.clearCache() hammer, which would also evict
    // co-tenant caches. Exercises one representative of each pin
    // shape: multi-consumer persist (nearDuplicates, segmentDedup,
    // bigramLm, corpusTopDfRatio), pin-under-union-anti-join
    // (dropContained), loop checkpoints (connectedComponents,
    // starComponents), and the lazy boundary checkpoint
    // (Prefix.runningTotal via curate).
    import graft.operators.{Curation, Prefix}
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (3L, "completely different content about spark engines at scale"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "shingle material for the corpus statistics operators here now")
    ).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 4L)).toDF("a", "b")
    val nodes = corpus.select(col("doc_id").as("id"))
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "nearDuplicates" -> (() =>
        Dedup.nearDuplicates(corpus, col("doc_id"), col("text"), threshold = 0.5)),
      "dropContained" -> (() =>
        Dedup.dropContained(corpus.unionAll(corpus.select(col("doc_id") + 100, col("text"))),
          col("doc_id"), col("text"), threshold = 0.9)),
      "segmentDedup" -> (() =>
        Dedup.segmentDedup(corpus, col("doc_id"), col("text"), segTokens = 4)),
      "repeatedSpans" -> (() =>
        Dedup.repeatedSpans(corpus, col("doc_id"), col("text"), spanTokens = 4)),
      "dropSpans" -> (() =>
        Dedup.dropSpans(corpus, col("doc_id"), col("text"), spanTokens = 4)),
      "bigramLm" -> (() =>
        TextAnalysis.bigramLm(corpus, col("doc_id"), col("text"))),
      "lmQualityGate" -> (() =>
        TextAnalysis.lmQualityGate(corpus, col("doc_id"), col("text"),
          corpus.filter(col("doc_id") <= 3), col("doc_id"), col("text"))),
      "fingerprintOverlapPairs" -> (() =>
        Dedup.fingerprintOverlapPairs(corpus, col("doc_id"), col("text"),
          k = 8, w = 4, minShared = 1, maxDf = 8)),
      "bpeMergeStep" -> (() =>
        TextAnalysis.bpeMergeStep(corpus, col("text"))),
      "bpeTrain" -> (() =>
        TextAnalysis.bpeTrain(corpus, col("text"), merges = 3)),
      "embedDedupApply" -> (() =>
        Similarity.embedDedupApply(
          graft.engine.Tables.embeddings(spark, sfDir), 0.3)),
      "corpusTopDfRatio" -> (() =>
        TextAnalysis.corpusTopDfRatio(corpus, col("doc_id"), col("text"), k = 3)),
      "connectedComponents" -> (() =>
        Dedup.connectedComponents(nodes, edges)),
      "pageRank" -> (() =>
        graft.operators.Graph.pageRank(
          Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst"))),
      "triangleCounts" -> (() =>
        graft.operators.Graph.triangleCounts(
          Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b"))),
      "bfsDistances" -> (() =>
        graft.operators.Graph.bfsDistances(
          Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
          Seq(1L).toDF("id"), maxHops = 4)),
      "labelPropagate" -> (() =>
        graft.operators.Graph.labelPropagate(
          Seq((1L, 2L), (2L, 3L)).toDF("a", "b"),
          Seq((1L, 7L)).toDF("id", "label"), rounds = 2)),
      "starComponents" -> (() =>
        Dedup.starComponents(nodes, edges)),
      "runningTotal" -> (() =>
        Prefix.runningTotal(corpus.withColumn("n", length(col("text")).cast("long")),
          Seq(col("doc_id")), col("n"))),
      "curate" -> (() => Curation.curate(corpus))
    )
    // clear residue from earlier tests in this shared session, then
    // verify the precondition actually holds
    Caches.releaseAll()
    spark.catalog.clearCache()
    ops.foreach { case (name, build) =>
      assert(build().count() >= 0L) // the caller's terminal action
      Caches.releaseAll()           // the contract boundary
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} persistent RDD(s) past releaseAll: " +
          leaked.values.map(r => s"id=${r.id} level=${r.getStorageLevel}").mkString(", "))
    }
  }

  test("Diff.diff: null key components match across sides; null column values compare null-safely") {
    import spark.implicits._
    val before = Seq(
      (Option(1L), "x", Option(10L)), // unchanged -> absent from output
      (Option.empty[Long], "x", Option(5L)), // null key part, value changes
      (Option(2L), "x", Option.empty[Long]), // null value both sides -> unchanged
      (Option(4L), "x", Option(9L))) // removed
      .toDF("k1", "k2", "v")
    val after = Seq(
      (Option(1L), "x", Option(10L)),
      (Option.empty[Long], "x", Option(7L)), // must classify CHANGED, not added+removed
      (Option(2L), "x", Option.empty[Long]),
      (Option(3L), "x", Option(1L))) // added
      .toDF("k1", "k2", "v")
    val got = graft.operators.Diff.diff(before, after, Seq("k1", "k2"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(2))
      .toMap
    assert(got == Map(
      None -> "changed",
      Some(4L) -> "removed",
      Some(3L) -> "added"))
  }

  test("continuousPercentileDisc equals discretePercentile on every pct, ties and degenerate groups included") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // group a: 500 near-continuous doubles with injected ties;
    // group b: 7 values; group c: all-equal (min == max degenerate)
    val rows =
      (1 to 500).map(i => ("a", if (i % 10 == 0) 123.456 else rnd.nextDouble() * 1000)) ++
      (1 to 7).map(i => ("b", i * 1.5)) ++
      (1 to 5).map(_ => ("c", 9.0))
    val df = rows.toDF("g", "v")
    for (pct <- Seq(1, 25, 50, 75, 100)) {
      val cont = graft.operators.Quantiles
        .continuousPercentileDisc(df, Seq("g"), col("v"), pct, buckets = 16)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val disc = graft.operators.Quantiles
        .discretePercentile(df, Seq("g"), col("v"), pct)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(cont == disc, s"pct=$pct")
    }
    graft.Caches.releaseAll()
  }

  test("rrfFuse: exact reciprocal-rank sums, hand-computed") {
    import spark.implicits._
    // list A ranks docs 1,2,3; list B ranks 2,3,4 — doc 2 fuses
    // 1e12/(60+2) + 1e12/(60+1) (truncating div, order-free)
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("id", "rank")
    val got = TextAnalysis.rrfFuse(Seq(a, b))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def rr(rank: Long) = 1000000000000L / (60L + rank)
    assert(got == Map(
      1L -> (rr(1), 1L), 2L -> (rr(2) + rr(1), 2L),
      3L -> (rr(3) + rr(2), 2L), 4L -> (rr(3), 1L)))
    // a doc hit by both lists at middling ranks out-scores a single
    // top hit only when the math says so: rr(2)+rr(1) > rr(1) trivially
    assert(got(2L)._1 > got(1L)._1)
  }

  test("lengthBucketBatches: similar lengths batch together, deterministic ranks") {
    import spark.implicits._
    // lengths: bucket 0 (<16): 5,7,9,11 → one batch of 4 at size 2 →
    // batches 0,0,1,1 by (len,id) order; bucket 1: 17,20 → batch 0
    val df = Seq((10L, 9L), (11L, 5L), (12L, 17L), (13L, 7L), (14L, 11L),
      (15L, 20L)).toDF("doc", "n")
    val got = graft.operators.Packing.lengthBucketBatches(df, col("doc"), col("n"),
        bucketWidth = 16, batchSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      11L -> (0L, 0L), 13L -> (0L, 0L), // lens 5,7 → first batch
      10L -> (0L, 1L), 14L -> (0L, 1L), // lens 9,11 → second batch
      12L -> (1L, 0L), 15L -> (1L, 0L)))
  }

  test("Incremental.maintain equals a from-scratch recompute; zeroed groups drop; null keys merge once") {
    import spark.implicits._
    import graft.operators.Incremental
    // base: k=a {3 rows}, k=b {1 row}, k=null {1 row}
    val base = Seq(
      (Some("a"), 100L), (Some("a"), 200L), (Some("a"), 300L),
      (Some("b"), 50L), (None, 25L)).toDF("k", "cents")
    // delta: insert to a and null, delete b entirely, delete one a row
    val delta = Seq(
      (Some("a"), 400L, 1L), (None, 75L, 1L),
      (Some("b"), 50L, -1L), (Some("a"), 100L, -1L)).toDF("k", "cents", "op")
    val state = Incremental.aggregateState(base, Seq("k"), col("cents"))
    val got = Incremental.maintain(state, delta, Seq("k"), col("op"), col("cents"))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute: a = {200,300,400} n=3 c=900; b dropped; null = {25,75} n=2 c=100
    assert(got == Map(Some("a") -> (3L, 900L), None -> (2L, 100L)))
  }

  test("maintainMin: algebraic merge vs targeted recompute split covers all group classes") {
    import spark.implicits._
    import graft.operators.Incremental
    val base = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L), (5L, "b", 50L),
      (6L, "c", 7L)).toDF("event_id", "k", "cents")
    val inserts = Seq((10L, "a", 1L), (11L, "d", 99L)).toDF("event_id", "k", "cents")
    // delete a's min (recompute), all of c (group vanishes), b's NON-min (algebraic)
    val deleteIds = Seq(1L, 6L, 5L).toDF("event_id")
    val got = Incremental.maintainMin(base, inserts, deleteIds,
        Seq("k"), "event_id", col("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "a" -> (3L, 1L),   // {20,30} + insert 1 — recompute path
      "b" -> (1L, 5L),   // min survived the delete — algebraic path
      "d" -> (1L, 99L))) // insert-only new group
  }

  test("maintainMin: a REPLAYED delete id (at-least-once feed) counts once, both paths") {
    import spark.implicits._
    import graft.operators.Incremental
    val base = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L), (5L, "b", 50L)).toDF("event_id", "k", "cents")
    val inserts = spark.emptyDataset[(Long, String, Long)]
      .toDF("event_id", "k", "cents")
    // id 5 (b's non-min, algebraic path) and id 1 (a's min, recompute
    // path) each arrive TWICE — before the r15 distinct, the algebraic
    // leg's dn double-counted the replay while the live anti-join
    // ignored it, so b's n_events came back 0 and the group vanished
    val deleteIds = Seq(5L, 5L, 1L, 1L).toDF("event_id")
    val got = Incremental.maintainMin(base, inserts, deleteIds,
        Seq("k"), "event_id", col("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (2L, 20L), "b" -> (1L, 5L)))
  }

  test("maintainMin: a null-keyed group taking the recompute path keeps its surviving rows") {
    import spark.implicits._
    import graft.operators.Incremental
    // null-key group {10, 20}: deleting the min (10) forces the
    // recompute path — the semi-join back to live rows must match the
    // null key null-safely or the group vanishes despite row 2 surviving
    val base = Seq(
      (1L, None, 10L), (2L, None, 20L),
      (3L, Some("a"), 5L)).toDF("event_id", "k", "cents")
    val inserts = spark.emptyDataset[(Long, Option[String], Long)]
      .toDF("event_id", "k", "cents")
    val deleteIds = Seq(1L).toDF("event_id")
    val got = Incremental.maintainMin(base, inserts, deleteIds,
        Seq("k"), "event_id", col("cents"))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      None -> (1L, 20L),       // recompute path, null key
      Some("a") -> (1L, 5L)))  // untouched group
  }

  test("featureHash: signed bucket counts are the exact signed histogram, l1 bounded by token count") {
    import graft.operators.{TextAnalysis, TextHash}
    val out = TextAnalysis.featureHash(docs, col("doc_id"), col("text"), dim = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // exact dup docs 1 and 4 vectorize identically
    assert(out(1L) == out(4L))
    // recompute doc 3's histogram by hand from the same hash family
    val toks = "completely different content about spark engines".split(" ")
    def poly(s: String): Long = s.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % TextHash.P)
    val hist = toks.map(poly).groupBy(h => h % 64)
      .map { case (b, hs) => b -> hs.map(h => if ((h / 64) % 2 == 0) 1L else -1L).sum }
      .filter(_._2 != 0)
    val (nnz, l1, vec) = out(3L)
    assert(nnz == hist.size && l1 == hist.values.map(math.abs).sum)
    assert(vec == hist.toSeq.sortBy(_._1).map { case (b, v) => s"$b:$v" }.mkString(","))
    assert(l1 <= toks.length)
  }

  test("sampleNeighbors: fanout caps hold per node per hop; expansion follows sampled hop-1 frontier") {
    import spark.implicits._
    // star around 1 (neighbors 2..6) plus chain 2->7, 2->8, 2->9
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)) ++
      Seq((2L, 7L), (2L, 8L), (2L, 9L))).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = graft.operators.Graph.sampleNeighbors(edges, seeds, Seq(3, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val hop1 = out.filter(_._2 == 1L)
    val hop2 = out.filter(_._2 == 2L)
    assert(hop1.length == 3 && hop1.forall(_._3 == 1L)) // fanout 3 of 5
    // hop-2 edges only out of sampled hop-1 dsts, ≤2 per node
    val h1dsts = hop1.map(_._4).toSet
    assert(hop2.forall(e => h1dsts.contains(e._3)))
    assert(hop2.groupBy(_._3).values.forall(_.length <= 2))
    // deterministic: rerun is identical
    val again = graft.operators.Graph.sampleNeighbors(edges, seeds, Seq(3, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
    graft.Caches.releaseAll()
  }

  test("coOccurrenceEdges: null containers are dropped; pairs are per-container distinct") {
    import spark.implicits._
    // container null holds {1,2}: the replaced equi-self-join dropped
    // null keys, so no (1,2)/(2,1) pair may surface from it
    val items = Seq(
      (Option("a"), 1L), (Option("a"), 2L), (Option("a"), 2L), (Option("a"), 3L),
      (Option.empty[String], 1L), (Option.empty[String], 2L),
      (Option("b"), 4L))
      .toDF("c", "m")
    val pairs = graft.operators.Graph.coOccurrenceEdges(items, col("c"), col("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = (for {
      x <- Seq(1L, 2L, 3L); y <- Seq(1L, 2L, 3L) if x != y
    } yield (x, y))
    assert(pairs.sorted == expected.sorted) // b is a singleton; null container gone
    val ordered = graft.operators.Graph.coOccurrenceEdges(items, col("c"), col("m"),
        ordered = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ordered.sorted == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("kmvSourceOverlap: the union estimator lands within 2x of exact truth corpus-wide") {
    import graft.operators.{TextAnalysis, TextHash}
    val out = TextAnalysis.kmvSourceOverlap(
        graft.engine.Tables.documents(spark, sfDir), col("source"), col("text"), k = 32)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val theta = r.getAs[Long]("kmv_theta")
      val unionK = r.getAs[Long]("kmv_union_k")
      val exactU = r.getAs[Long]("exact_union")
      // saturation-aware estimator: full sketch → classic (k−1)·P/θ
      // (k=32 ⇒ σ ≈ 18%, the 2x gate is ~5σ headroom); unsaturated
      // sketch → the union is EXACTLY its size (the kmv_union_k column
      // exists precisely so downstream can branch here)
      val est =
        if (unionK >= 32) 31.0 * TextHash.P / theta else unionK.toDouble
      assert(est > exactU / 2.0 && est < exactU * 2.0,
        s"union estimate $est vs exact $exactU for (${r.getString(0)}, ${r.getString(1)})")
      if (unionK < 32)
        assert(est == exactU.toDouble,
          s"unsaturated sketch must carry the exact union: $est vs $exactU")
    }
    graft.Caches.releaseAll()
  }

  test("exactCanonical: formatting variants collapse, n_variants counts raw forms") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO WORLD."),
      (4L, "different doc")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.exactCanonical(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (3L, 3L), 4L -> (1L, 1L)))
  }

  test("weightedMedian: lower-median rule over weights, ties collapse before the cumulative pass") {
    import spark.implicits._
    // g: values 10(w3), 20(w1), 30(w2) → W=6, half=3 → cumw(10)=3 ≥ 3 → 10
    // h: value 5 twice (w1+w1), 9(w1) → ties collapse: cumw(5)=2, 2*2 ≥ 3 → 5
    val d = Seq(("g", 10L, 3L), ("g", 20L, 1L), ("g", 30L, 2L),
      ("h", 5L, 1L), ("h", 5L, 1L), ("h", 9L, 1L)).toDF("k", "v", "w")
    val got = graft.operators.Quantiles.weightedMedian(d, Seq("k"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("g" -> (10L, 6L), "h" -> (5L, 3L)))
  }

  test("quantiles IGNORE null values (SQL percentile semantics), r15 fix") {
    import spark.implicits._
    import graft.operators.Quantiles
    // two null values would sort first and shift the cumulative rank:
    // unfixed, the median of {10,20,30} plus 2 nulls came back 10
    val d = Seq(("g", Some(10L)), ("g", Some(20L)), ("g", Some(30L)),
      ("g", None), ("g", None)).toDF("grp", "v")
    val thr = Quantiles.discretePercentile(d, Seq("grp"), col("v"), 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thr == Map("g" -> 20L))
    val cuts = Quantiles.discreteQuantileCuts(d, Seq("grp"), col("v"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cuts == Map("g" -> 20L))
    // null WEIGHT carries nothing; null value rows are ignored
    val wd = Seq(("g", Some(10L), Some(1L)), ("g", Some(20L), Some(1L)),
      ("g", Some(30L), Some(1L)), ("g", Some(1L), None), ("g", None, Some(9L)))
      .toDF("grp", "v", "w")
    val wm = Quantiles.weightedMedian(wd, Seq("grp"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wm == Map("g" -> (20L, 3L)))
  }

  test("ngramNovelty: shared 5-grams counted, unique docs score zero shared") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f"),        // grams: abcde, bcdef
      (2L, "a b c d e x"),        // grams: abcde, bcdex — shares abcde with doc 1
      (3L, "p q r s t")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.ngramNovelty(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (1L, 0L)))
    graft.Caches.releaseAll()
  }

  test("retrievalEval: exact 2520-scaled MRR and hits@k on a rigged corpus") {
    import spark.implicits._
    // query 100 (label 1); corpus ranked by dot: 1 > 2 > 3 (ids tiebreak)
    val rows = Seq(
      (100L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.0f), 2),   // rank 1, irrelevant
      (2L, Array(0.8f, 0.0f), 1),   // rank 2, relevant
      (3L, Array(0.7f, 0.0f), 1))   // rank 3, relevant
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.retrievalEval(
        rows, rows.filter(col("vec_id") === 100L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((100L, 2L, 1260L, 2L))) // first rel at rank 2 → 2520/2
  }

  test("temperatureBudget: all-zero-token corpus neither divides by zero (ANSI) nor drops the free docs") {
    import spark.implicits._
    // ws = floor(sqrt(0)) summed = 0 — under ANSI (this engine's
    // default) an unguarded `div ws` THROWS where DuckDB's // yields
    // NULL; the guarded alloc is 0 and zero-token docs (cum 0 <= 0)
    // stay admitted, same as the ws > 0 path always treated them
    val q = Seq((1L, "s1", 0L), (2L, "s2", 0L)).toDF("doc_id", "source", "n_tokens")
    val out = graft.operators.Sampling.temperatureBudget(q, budget = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(out.toSet == Set(("s1", 1L, 0L), ("s2", 2L, 0L)), s"got ${out.toSeq}")
  }

  test("Urls.canonicalUrl: every documented rule on literal URLs") {
    import spark.implicits._
    val cases = Seq(
      // case fold + default port + tracking strip + param sort + fragment
      ("HTTPS://WWW.Example.COM:443/A/B?utm_source=x&b=2&a=1#frag",
        "https://www.example.com/A/B?a=1&b=2", "example.com"),
      // non-default port kept; all-tracking query drops entirely
      ("http://Host.com:8080/p?gclid=1&fbclid=2&ref=x",
        "http://host.com:8080/p", "host.com"),
      // empty path → "/"; http default port stripped
      ("HTTP://h.com:80", "http://h.com/", "h.com"),
      // no port, no query, path case PRESERVED
      ("https://A.B.c/Path/Case", "https://a.b.c/Path/Case", "a.b.c"),
      // utm key variants; leading tracking param; kept params re-sorted
      ("https://x.io/?utm_campaign=9&z=1&utm_a1=2&y=0",
        "https://x.io/?y=0&z=1", "x.io"),
      // EMPTY param segments ('&&' runs, trailing '&') must not split
      // the canonical key — '?a=1&' and '?a=1' are the same params
      ("https://h.com/p?a=1&&b=2", "https://h.com/p?a=1&b=2", "h.com"),
      ("https://h.com/p?a=1&", "https://h.com/p?a=1", "h.com"),
      ("https://h.com/p?&utm_source=x&", "https://h.com/p", "h.com"),
      // tracking KEY match is case-insensitive (r13 advice): UTM_Source=
      // and Ref= variants must collapse into the same canonical key as
      // their lowercase twins; non-tracking param VALUES stay untouched
      ("https://h.com/p?UTM_Source=x&a=1&Ref=Y", "https://h.com/p?a=1", "h.com"),
      ("http://h.com/p?GCLID=9&FbClid=z&a=B", "http://h.com/p?a=B", "h.com"))
      .toDF("url", "want_canon", "want_host")
    val got = cases.select(
        graft.operators.Urls.canonicalUrl(col("url")).as("canon"),
        graft.operators.Urls.hostKey(col("url")).as("host"),
        col("want_canon"), col("want_host"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(2), s"canon: got ${r.getString(0)}")
      assert(r.getString(1) == r.getString(3), s"host: got ${r.getString(1)}")
    }
  }

  test("Urls.canonicalUrl is idempotent over the whole t89 corpus; hostKey is canonicalization-invariant") {
    import graft.operators.Urls
    // canonical form is a FIXED POINT: re-canonicalizing must be the
    // identity (lowercases already folded, params already sorted,
    // tracking already gone, default ports already stripped) — the
    // property that makes the canonical key safe to store and re-derive
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val u = graft.queries.Extended.urlGen(col("doc_id"), col("source"))
    val c1 = Urls.canonicalUrl(u)
    val bad = docs.select(
        c1.as("c1"), Urls.canonicalUrl(c1).as("c2"),
        Urls.hostKey(u).as("h1"), Urls.hostKey(c1).as("h2"))
      .filter(col("c1") =!= col("c2") || col("h1") =!= col("h2"))
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("host-key cap composes with the t75 source-cap path: www/case/port variants share one cap bucket") {
    import spark.implicits._
    // four raw-distinct URLs of ONE logical site + one other site; cap
    // at 2 docs per host key — the t75 TopKAgg path keyed on hostKey
    // must treat the four variants as one bucket
    val docs = Seq(
      (1L, "HTTPS://WWW.Site.COM/a", 10L),
      (2L, "https://site.com:443/b", 8L),
      (3L, "http://Site.com/c?utm_source=x", 6L),
      (4L, "https://www.site.com/d", 4L),
      (5L, "https://other.org/e", 2L))
      .toDF("doc_id", "url", "n")
    val capped = docs
      .select(graft.operators.Urls.hostKey(col("url")).as("host_key"),
        col("doc_id"), col("n"))
      .groupBy(col("host_key"))
      .agg(graft.functions.TopKAgg.topK(2)(
        col("n").cast("double"), col("doc_id")).as("top"))
      .select(col("host_key"), explode(col("top")).as("t"))
      .select(col("host_key"), col("t._2").as("doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byHost = capped.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byHost == Map(
      "site.com" -> Set(1L, 2L), // top-2 by n across ALL four variants
      "other.org" -> Set(5L)), s"got $byHost")
  }

  test("mega-host composition: hostKey feeds saltedAgg/saltedCap exactly (the Urls 100 TB recipe, executable)") {
    import graft.operators.{Skew, Urls}
    // one host carries 50% of the corpus (r13 verdict item 7's
    // fixture): 2000 mega-host URLs under case/port/tracking/www
    // VARIANTS (hostKey must still collapse them into ONE key — the
    // composition is only real if canonicalization feeds the salt),
    // 2000 more spread over 200 cold hosts
    val mega = (0 until 2000).map { i =>
      val variant = i % 4 match {
        case 0 => s"https://WWW.Mega.Example.COM/p$i"
        case 1 => s"https://mega.example.com:443/p$i?utm_source=x"
        case 2 => s"http://Mega.example.com/p$i"
        case _ => s"https://www.mega.example.com/p$i?b=2&a=1"
      }
      (i.toLong, variant)
    }
    val cold = (0 until 2000).map(i =>
      (2000L + i, s"https://h${i % 200}.example.org/p$i"))
    val docs = (mega ++ cold).toDF("doc_id", "url")
      .withColumn("host_key", Urls.hostKey(col("url")))

    // the fixture IS skewed the way the recipe claims: profile sees
    // the mega host at half the corpus
    val prof = Skew.profile(docs, Seq("host_key"))
      .select(col("hot_key"), col("max_key_rows")).collect().head
    assert(prof.getString(0) == "mega.example.com" && prof.getLong(1) == 2000L)

    // saltedAgg per host == plain groupBy (the scaladoc's agg leg)
    val salted = Skew.saltedAgg(docs, col("host_key"), lit(1L),
        col("doc_id"), saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = docs.groupBy(col("host_key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && salted("mega.example.com") == 2000L)

    // saltedCap per host == the naive single-window cap, row for row
    // (deterministic order: hash then id — the t96 rule); the naive
    // window would funnel the mega host's 2000 rows into ONE task,
    // the salted one bounds every stage-1 partition to ~2000/8
    val ord = Seq(pmod(hash(col("doc_id")), lit(1000000007L)), col("doc_id"))
    val cappedIds = Skew.saltedCap(docs, col("host_key"), ord, k = 5,
        rowTag = col("doc_id"), saltFactor = 8)
      .select(col("doc_id")).as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host_key")).orderBy(ord: _*)
    val naiveIds = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select(col("doc_id")).as[Long].collect().toSet
    assert(cappedIds == naiveIds, s"salted cap diverged from naive cap")
    // every cold host keeps all ≤ 10 of its docs or its first 5; the
    // mega host keeps exactly 5 of 2000
    val perHost = docs.filter(col("doc_id").isin(cappedIds.toSeq.map(Long.box): _*))
      .groupBy(col("host_key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost("mega.example.com") == 5L)
    assert(perHost.values.forall(_ <= 5L))
  }

  // ---- the r15 empty-corpus sweep class: an upstream filter can
  // legitimately empty any input at 100 TB — operators must produce
  // the empty answer (or fail through a documented require), never
  // NPE / PATH_NOT_FOUND / ANSI-divide on the degenerate frame

  test("bloom-pruned join with an EMPTY build side is the empty join, not an NPE") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "w").filter(col("k") < 0)
    // Spark's bloom aggregate over zero rows yields a null-bit-buffer
    // sketch; mightContainLong NPE'd on it before the guard
    val out = graft.operators.BloomPrune.prunedJoin(
      fact, dim, fact("k"), dim("k"), expectedDimKeys = 8)
    assert(out.count() == 0L)
    // and the guard changes nothing on a live build side
    val dim2 = Seq((1L, "x")).toDF("k", "w")
    val out2 = graft.operators.BloomPrune.prunedJoin(
      fact, dim2, fact("k"), dim2("k"), expectedDimKeys = 8)
    assert(out2.select("v").as[String].collect().toSeq == Seq("a"))
  }

  test("pageRank / pageRankWeighted on an EMPTY graph return empty ranks, not a crash") {
    val e = Seq((1L, 2L)).toDF("src", "dst").filter(col("src") < 0)
    assert(graft.operators.Graph.pageRank(e, iters = 2).count() == 0L)
    val ew = Seq((1L, 2L, 3L)).toDF("src", "dst", "w").filter(col("src") < 0)
    assert(graft.operators.Graph.pageRankWeighted(ew, iters = 2).count() == 0L)
    // self-loop-only input reduces to the empty graph too
    val loops = Seq((7L, 7L)).toDF("src", "dst")
    assert(graft.operators.Graph.pageRank(loops, iters = 1).count() == 0L)
  }

  test("bpeTrain on a PAIRLESS vocabulary learns zero merges and keeps the vocabulary intact") {
    // every word a single character: no symbol pair exists anywhere.
    // The unfixed loop emitted `merges` all-null winner rows AND
    // cross-joined the vocabulary against an empty winner — emptying
    // it, so bpeEncode dropped every doc.
    val corpus = Seq((1L, "a b c"), (2L, "b c a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(corpus, col("text"), merges = 4).count() == 0L)
    val enc = TextAnalysis.bpeEncode(corpus, col("doc_id"), col("text"), merges = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // vocabulary intact: 3 words per doc, 1 symbol per 1-char word
    assert(enc == Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L))))
    // and the empty corpus trains zero merges without a row of nulls
    val none = corpus.filter(col("doc_id") < 0)
    assert(TextAnalysis.bpeTrain(none, col("text"), merges = 4).count() == 0L)
  }

  test("FileLedger.listing of a glob matching NO files is the empty frame, not PATH_NOT_FOUND") {
    val base = java.nio.file.Files.createTempDirectory("graft_ledger_empty")
    val out = graft.sources.FileLedger.listing(spark, s"$base/files/*.txt")
    assert(out.columns.toSeq == Seq("path", "n_bytes") && out.count() == 0L)
    // newFiles over the same empty world: nothing to ingest, no throw
    assert(graft.sources.FileLedger.newFiles(
      spark, s"$base/files/*.txt", s"$base/ledger", 1L).count() == 0L)
  }
}
