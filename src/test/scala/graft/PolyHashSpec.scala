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
