package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.10 multimodal-column plumbing.
  *
  * Media payloads are opaque `binary` columns + a typed metadata struct —
  * the pattern a 100 TB training-data pipeline uses (the bytes travel with
  * the row; feature extraction is per-partition and never collects).
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * marked DETERMINISTIC FAKE decode: it derives a fixed-shape feature vector
  * from the payload bytes via xxhash64. The Spark-side plumbing — binary
  * schema, batch shape, partition-parallel extraction, metadata struct — is
  * real and tested; swapping in a real codec replaces only the inner
  * expression (or a mapInPandas/mapInArrow stage on a cluster with codecs).
  */
object Multimodal {

  /** documents.text re-materialized as an opaque binary payload + metadata —
    * stands in for (image|audio|video) bytes. */
  def asBinaryTable(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("source"), col("lang"), col("n_chars")).as("meta"))

  /** DETERMINISTIC FAKE decode: payload → fixed-dim "feature" vector.
    * Real pipelines put the codec here (Catalyst expr / mapInArrow). */
  def decodeStub(payloadCol: String, dim: Int = 8): org.apache.spark.sql.Column =
    expr(s"transform(sequence(0, ${dim - 1}), i -> " +
      s"CAST(xxhash64($payloadCol, i) AS DOUBLE) / 9.223372036854776E18)")

  /** Per-payload feature extraction over binary columns (fake decode). */
  def features(s: SparkSession, d: String, dim: Int = 8): DataFrame =
    asBinaryTable(s, d).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      decodeStub("payload", dim).as("features"),
      col("meta.source").as("source"))

  /** [Q-mm-meta] binary-column metadata path — oracle-matched (byte length
    * is engine-independent; the fake-decode features are not, so they stay
    * out of the declared query). */
  def q_mm_meta(s: SparkSession, d: String): DataFrame =
    asBinaryTable(s, d).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      col("meta.source").as("source"),
      col("meta.lang").as("lang"))

  /** [Q-mm-features] fake-decode feature vectors (rows-only check). */
  def q_mm_features(s: SparkSession, d: String): DataFrame =
    features(s, d).select(col("doc_id"), col("n_bytes"),
      round(expr("aggregate(features, CAST(0 AS DOUBLE), (a, x) -> a + x * x)"), 6)
        .as("feat_sqnorm"))
}
