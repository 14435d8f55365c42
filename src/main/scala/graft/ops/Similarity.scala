package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.10 similarity search over `embeddings` (array<float>, dim 64).
  *
  * All vector math is higher-order Catalyst expressions (zip_with + aggregate)
  * — codegen'd, no UDF, no collect. Floats are cast to double element-wise so
  * the arithmetic matches the DuckDB oracle bit-for-bit (modulo the final
  * rounding, applied identically on both sides).
  *
  * Scale path: brute force is O(n²) and exists as the correctness baseline /
  * exact oracle; `lshNeighbors` buckets by random-hyperplane signatures so the
  * join is keyed on the bucket (shuffle ∝ collisions, not n²).
  */
object Similarity {

  /** cosine(a, b) in double precision, as a Catalyst expression. */
  def cosine(a: String, b: String): Column = {
    def dot(x: String, y: String) = s"aggregate(zip_with($x, $y, " +
      "(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    expr(s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))")
  }

  private def anchors(emb: DataFrame, pred: Column): DataFrame =
    emb.filter(pred).select(col("vec_id").as("a_id"), col("embedding").as("va"))

  /** [Q-sim-topk] brute-force exact top-10 cosine neighbors of anchor vectors
    * (vec_id < 5). Broadcast the tiny anchor set against the full table; the
    * per-anchor top-k is a window on the anchor partition. */
  def q_sim_topk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables(s, d, "embeddings")
    val scored = emb.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
      .join(broadcast(anchors(emb, col("vec_id") < 5)), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), cosine("va", "vb").as("cos"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))))
      .filter(col("rn") <= 10)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_r"), col("rn"))
  }

  /** [Q-dedup-embed] embedding-cosine near-duplicate pairs: every pair with
    * rounded cosine ≥ threshold. Exact (brute-force) — this is the oracle
    * baseline the LSH path approximates. Threshold compares the ROUNDED value
    * so both engines make the identical cut. */
  def q_dedup_embed(s: SparkSession, d: String): DataFrame = {
    val emb = Tables(s, d, "embeddings")
    emb.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("vb")),
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), round(cosine("va", "vb"), 6).as("cos_r"))
      .filter(col("cos_r") >= 0.4)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Random-hyperplane signature: `bits` sign bits, hyperplane coefficients
    * derived deterministically from xxhash64(bit, dim) scaled to [-1, 1].
    * Pure expression — no UDF, no materialized plane matrix. */
  def lshSignature(embCol: String, bits: Int = 16): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (sig, p) ->
       |  sig + CASE WHEN aggregate(sequence(1, size($embCol)), CAST(0 AS DOUBLE),
       |    (acc, i) -> acc + (CAST(xxhash64(p, i) AS DOUBLE) / 9.223372036854776E18)
       |                      * CAST(element_at($embCol, i) AS DOUBLE)) >= 0
       |  THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)""".stripMargin)

  /** [Q-sim-lsh] ANN via LSH buckets: candidates share a 16-bit signature
    * band (4 bands × 4 bits → OR-amplified recall), then exact cosine within
    * the bucket. Rows-only check; recall vs brute force is asserted in tests. */
  def lshNeighbors(emb: DataFrame, anchorPred: Column, k: Int = 10): DataFrame = {
    val sig = emb.select(col("vec_id"), col("embedding"), lshSignature("embedding").as("sig"))
      .select(col("vec_id"), col("embedding"),
        explode(expr("transform(sequence(0, 3), b -> " +
          "named_struct('band', b, 'bucket', shiftright(sig, b * 4) & 15))")).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = sig.filter(anchorPred)
      .select(col("vec_id").as("a_id"), col("embedding").as("va"), col("band"), col("bucket"))
    val cand = sig.select(col("vec_id").as("b_id"), col("embedding").as("vb"),
        col("band"), col("bucket"))
      .join(a, Seq("band", "bucket")).filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("va"), col("vb")).distinct()
    cand.select(col("a_id"), col("b_id"), cosine("va", "vb").as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))))
      .filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_r"), col("rn"))
  }

  def q_sim_lsh(s: SparkSession, d: String): DataFrame =
    lshNeighbors(Tables(s, d, "embeddings"), col("vec_id") < 5)
}
