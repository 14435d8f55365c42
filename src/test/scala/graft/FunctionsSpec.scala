package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.vec

/** The native Catalyst expressions (graft.functions) must be bit-identical
  * to the higher-order-function formulations they replace, and their SQL
  * surface must resolve when the session is built with GraftExtensions. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables(spark, TestSpark.sf001, "embeddings")
    .select("vec_id", "embedding")

  private val hofDot = expr(
    "aggregate(zip_with(embedding, embedding, " +
      "(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), " +
      "(acc, v) -> acc + v)")

  test("vector_dot is bit-identical to the aggregate(zip_with(...)) fold") {
    val bad = emb.select(
      vec.vector_dot(col("embedding"), col("embedding")).as("native"),
      hofDot.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
  }

  test("vector_dot SQL surface resolves via GraftExtensions") {
    emb.createOrReplaceTempView("emb_fn_test")
    val bad = spark.sql(
      "SELECT vector_dot(embedding, embedding) AS native, " +
        "aggregate(zip_with(embedding, embedding, " +
        "(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), " +
        "(acc, v) -> acc + v) AS hof FROM emb_fn_test")
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
  }

  test("lsh_signature shape and range") {
    val sig = emb.select(vec.lsh_signature(col("embedding"), 8, 16).as("sig"))
    assert(sig.filter(size(col("sig")) =!= 8).count() == 0)
    val outOfRange = sig.select(explode(col("sig")).as("b"))
      .filter(col("b") < 0 || col("b") >= (1L << 16))
    assert(outOfRange.count() == 0)
  }

  test("lsh_signature is deterministic and identical for identical vectors") {
    val a = emb.select(col("vec_id"), vec.lsh_signature(col("embedding"), 8, 16).as("s"))
    val b = emb.repartition(7)
      .select(col("vec_id").as("vid"), vec.lsh_signature(col("embedding"), 8, 16).as("s2"))
    val bad = a.join(b, col("vec_id") === col("vid"))
      .filter(col("s") =!= col("s2"))
    assert(bad.count() == 0)
  }

  test("lsh_signature SQL surface with literal knobs") {
    emb.createOrReplaceTempView("emb_fn_test2")
    val n = spark.sql(
      "SELECT lsh_signature(embedding, 4, 8) AS s FROM emb_fn_test2")
      .filter(size(col("s")) === 4).count()
    assert(n == emb.count())
  }
}
