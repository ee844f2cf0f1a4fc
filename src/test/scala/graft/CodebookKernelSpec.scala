package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.CodebookKernels
import graft.operators.Similarity

/** Bit-identity pins for the fused frame-codebook kernels
  * (CodebookArgmax / CodebookPqCodes) against the exact HOF spellings
  * they replaced in Similarity.FrameCodebook — the r20 optimization's
  * correctness gate. The reference columns below ARE the old
  * implementation, verbatim (array_max over transform-struct with the
  * native dot, and the m-subspace slice chain), so any semantic drift
  * in the kernels (ordering, null/NaN rules, slice clamping, tie
  * rule) fails here without needing the full differential. */
class CodebookKernelSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Column, b: Column) = Similarity.dot(a, b)

  /** The pre-r20 FrameCodebook.bestStruct spelling. */
  private def hofArgmax(emb: Column, cents: Column): Column =
    array_max(transform(cents, c =>
      struct(dot(emb, c.getField("ce")).as("score"),
        (-c.getField("cid")).as("neg_cid"), c.getField("cid").as("cid"))))

  /** The pre-r20 FrameCodebook.pqCode spelling. */
  private def hofPqCode(emb: Column, cents: Column, m: Int, sub: Int): Column = {
    val codes = (0 until m).map { j =>
      array_max(transform(cents, c => {
        val cj = slice(c.getField("ce"), j * sub + 1, sub)
        struct((dot(slice(emb, j * sub + 1, sub), cj) - dot(cj, cj) / 2)
            .as("score"),
          (-c.getField("cid")).as("neg_cid"), c.getField("cid").as("cid"))
      })).getField("cid")
    }
    array(codes: _*)
  }

  /** (emb, cents) rows covering the regimes: real vectors, exact-tie
    * centroids, dim-mismatched emb (slice-clamp path), null element,
    * null emb, empty codebook, single centroid. */
  private lazy val fixture = {
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 256)
      .select(col("vec_id").cast("long").as("cid"), col("embedding").as("ce"))
      .agg(sort_array(collect_list(struct(col("cid"), col("ce"))))
        .as("cents"))
    val base = emb.crossJoin(cents)
      .select(col("vec_id"), col("embedding").as("emb"), col("cents"))
    // tie codebook: two ids sharing one vector (smaller id must win),
    // plus a shorter emb, a null element, a null emb, an empty codebook
    val tieCents = array(
      struct(lit(7L).as("cid"), col("emb").as("ce")),
      struct(lit(3L).as("cid"), col("emb").as("ce")),
      struct(lit(11L).as("cid"),
        transform(col("emb"), x => x * lit(0.5f)).as("ce")))
    val edges = base.limit(20).select(col("vec_id"),
        col("emb"), tieCents.as("cents"))
      .unionAll(base.limit(5).select(col("vec_id"),
        slice(col("emb"), 1, 17).as("emb"), tieCents.as("cents")))
      .unionAll(base.limit(5).select(col("vec_id"),
        concat(slice(col("emb"), 1, 10),
          array(lit(null).cast("float"))).as("emb"), tieCents.as("cents")))
      .unionAll(base.limit(5).select(col("vec_id"),
        lit(null).cast("array<float>").as("emb"), tieCents.as("cents")))
      .unionAll(base.limit(5).select(col("vec_id"), col("emb"),
        lit(null).cast("array<struct<cid:bigint,ce:array<float>>>")
          .as("cents")))
      .unionAll(base.limit(5).select(col("vec_id"), col("emb"),
        slice(col("cents"), 1, 1).as("cents")))
    base.unionAll(edges)
  }

  test("codebook_argmax == array_max(transform(...)) on all regimes") {
    val cmp = fixture.select(
      col("vec_id"),
      hofArgmax(col("emb"), col("cents")).as("ref"),
      CodebookKernels.codebookArgmax(col("emb"), col("cents")).as("ker"))
    val bad = cmp.filter(!(col("ref") <=> col("ker")))
    assert(bad.count() == 0L, s"first mismatch: ${bad.take(1).mkString}")
    // sanity: the tie rows resolved to the SMALLER cid, through both
    val tie = cmp.filter(col("ker").getField("cid") === 3L)
    assert(tie.count() >= 20L)
  }

  test("empty codebook argmaxes to null through both spellings") {
    val row = Seq(1L).toDF("vec_id").select(col("vec_id"),
      array(lit(1.0f), lit(2.0f)).as("emb"),
      slice(array(struct(lit(1L).as("cid"),
        array(lit(1.0f), lit(2.0f)).as("ce"))), 1, 0).as("cents"))
    val r = row.select(
      hofArgmax(col("emb"), col("cents")).as("ref"),
      CodebookKernels.codebookArgmax(col("emb"), col("cents")).as("ker"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codebook_pq_codes == the m-subspace slice chain on all regimes") {
    for (m <- Seq(1, 2, 4, 8)) {
      val sub = 64 / m
      val cmp = fixture.select(
        col("vec_id"),
        hofPqCode(col("emb"), col("cents"), m, sub).as("ref"),
        CodebookKernels.codebookPqCodes(col("emb"), col("cents"), m, sub)
          .as("ker"))
      val bad = cmp.filter(!(col("ref") <=> col("ker")))
      assert(bad.count() == 0L,
        s"m=$m first mismatch: ${bad.take(1).mkString}")
    }
  }

  test("kernels survive interpreted eval (no-codegen) identically") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val cmp = fixture.select(
        hofArgmax(col("emb"), col("cents")).as("ref"),
        CodebookKernels.codebookArgmax(col("emb"), col("cents")).as("ker"),
        hofPqCode(col("emb"), col("cents"), 4, 16).as("refc"),
        CodebookKernels.codebookPqCodes(col("emb"), col("cents"), 4, 16)
          .as("kerc"))
      val bad = cmp.filter(!(col("ref") <=> col("ker")) ||
        !(col("refc") <=> col("kerc")))
      assert(bad.count() == 0L, s"first mismatch: ${bad.take(1).mkString}")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
