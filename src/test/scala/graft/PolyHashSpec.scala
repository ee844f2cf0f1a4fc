package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.PolyHash
import graft.operators.TextHash

/** Property: the codegen'd PolyHash expression computes exactly the
  * value of the reference HOF expression (and therefore of the DuckDB
  * oracle emitted from the same formula) for arbitrary strings. */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native kernel == HOF reference on generated strings (bulk)") {
    val gen = Gen.listOfN(500, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.asciiPrintableStr.map(_.take(40)),
      Gen.const(""),
      Gen.nonEmptyListOf(Gen.oneOf('a', ' ', 'é', 'ß', '中')).map(_.mkString)))
    val strings = gen.apply(Gen.Parameters.default, Seed(42L)).get
    val df = strings.toDF("s")
    val mismatches = df.select(
        col("s"),
        TextHash.polyHash(col("s")).as("hof"),
        TextHash.polyHashFast(col("s")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(mismatches.count() == 0L,
      s"first mismatch: ${mismatches.take(1).mkString}")
  }

  test("JVM kernel matches the closed form and handles nulls/empties") {
    assert(PolyHash.hash("") == 0L)
    assert(PolyHash.hash("abc") == 97L * 961 + 98 * 31 + 99)
    val r = Seq((1, Option.empty[String]), (2, Some("x")))
      .toDF("id", "s")
      .select(TextHash.polyHashFast(col("s")).as("h"))
      .collect()
    assert(r(0).isNullAt(0) && r(1).getLong(0) == 'x'.toLong)
  }

  test("rolling shingle hashes == per-window poly_hash on generated strings") {
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(30)),
      Gen.asciiPrintableStr.map(_.take(30)),
      Gen.const(""), Gen.const("ab"),
      Gen.nonEmptyListOf(Gen.oneOf('x', ' ', 'é', '中')).map(_.mkString.take(20))))
    val strings = gen.apply(Gen.Parameters.default, Seed(11L)).get
    val df = strings.toDF("s")
    val reference = when(length(col("s")) >= 4, transform(
        sequence(lit(1), length(col("s")) - 3),
        i => TextHash.polyHashFast(col("s").substr(i, lit(4)))))
      .otherwise(array().cast("array<bigint>"))
    val mismatches = df.select(
        reference.as("ref"),
        graft.functions.PolyHashShingles.polyHashShingles(col("s"), 4).as("rolled"))
      .filter(col("ref") =!= col("rolled"))
    assert(mismatches.count() == 0L, mismatches.take(1).mkString)
  }

  test("native dot product == HOF fold bit-for-bit on real embeddings + null/length edges") {
    val emb = graft.engine.Tables.embeddings(spark, sfDir).limit(200)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("eb")))
      .filter(col("a_id") % 7 === 0 && col("b_id") % 11 === 0)
    val mism = pairs.select(
        graft.operators.Similarity.dot(col("ea"), col("eb")).as("native"),
        graft.operators.Similarity.dotHof(col("ea"), col("eb")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(mism.count() == 0L, mism.take(1).mkString)
    // null semantics: null array, null element, unequal lengths → null
    val edges = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),   // 11.0
      (None, Some(Seq(1.0f))),                          // null array
      (Some(Seq(1.0f)), Some(Seq(1.0f, 2.0f))),         // length mismatch
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))  // empty → 0.0
    ).toDF("a", "b")
    val out = edges.select(
      graft.operators.Similarity.dot(col("a"), col("b")).as("native"),
      graft.operators.Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    assert(out(0).getDouble(0) == 11.0 && out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    assert(out(3).getDouble(0) == 0.0 && out(3).getDouble(1) == 0.0)
  }

  test("poly_hash is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT poly_hash('abc') AS h").as[Long].head()
    assert(r == 97L * 961 + 98 * 31 + 99)
  }

  test("whole-stage codegen path produces the same values as interpreted eval") {
    val df = graft.engine.Tables.documents(spark, sfDir)
    val viaExpr = df.select(sum(TextHash.polyHashFast(col("text")))).as[Long].head()
    val viaJvm = df.select(col("text")).as[String].collect()
      .map(PolyHash.hash).sum
    assert(viaExpr == viaJvm)
  }
}
