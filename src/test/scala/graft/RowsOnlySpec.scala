package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Relational, TextOps}

/** Engine-specific (non-oracle) queries need their correctness story from
  * properties, not DuckDB: HLL within sketch tolerance of exact, hashes
  * deterministic and content-keyed, feature extraction shape-stable. */
class RowsOnlySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_agg_hll: approx distinct counts within 5% of exact") {
    val r = Relational.q_agg_hll(spark, TestSpark.sf001).collect().head
    val exact = Tables(spark, TestSpark.sf001, "lineitem")
      .agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")))
      .collect().head
    val (ao, ap) = (r.getLong(r.fieldIndex("approx_orders")),
      r.getLong(r.fieldIndex("approx_parts")))
    val (eo, ep) = (exact.getLong(0), exact.getLong(1))
    assert(math.abs(ao - eo).toDouble / eo < 0.05, s"orders HLL $ao vs $eo")
    assert(math.abs(ap - ep).toDouble / ep < 0.05, s"parts HLL $ap vs $ep")
  }

  test("q_agg_approx_quantile: every sketch output is within GK rank error of exact") {
    // GK guarantee at accuracy A: the returned value's true rank is within
    // n/A of ceil(q*n). Verify per group by computing each approx value's
    // actual rank in the group.
    val approx = Relational.q_agg_approx_quantile(spark, TestSpark.sf001).collect()
    val orders = Tables(spark, TestSpark.sf001, "orders")
    approx.foreach { r =>
      val pri = r.getString(r.fieldIndex("o_orderpriority"))
      val n = r.getLong(r.fieldIndex("n"))
      val vals = orders.filter(col("o_orderpriority") === pri)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val eps = math.max(n / 1000.0, 1.0) + 1 // rank slack: n/accuracy, >= 1
      for ((fld, q) <- Seq(("p50_a", 0.5), ("p90_a", 0.9), ("p99_a", 0.99))) {
        val v = r.getDouble(r.fieldIndex(fld))
        assert(vals.contains(v), s"$pri/$fld: $v is not an actual data value")
        val rank = vals.count(_ <= v)
        assert(math.abs(rank - q * n) <= eps,
          s"$pri/$fld: rank $rank of $v outside ${q * n} ± $eps")
      }
    }
  }

  test("q_text_fingerprint: content-keyed and deterministic") {
    val fp = TextOps.q_text_fingerprint(spark, TestSpark.sf001)
    val docs = Tables(spark, TestSpark.sf001, "documents")
    // identical text ⇒ identical fingerprint (join on text equality)
    val byText = docs.select(col("doc_id"), col("text"))
      .join(fp, "doc_id")
      .groupBy("text").agg(countDistinct(col("fp")).as("nfp"))
    assert(byText.filter(col("nfp") > 1).count() == 0)
    // rerun is bit-identical
    val again = TextOps.q_text_fingerprint(spark, TestSpark.sf001)
    assert(fp.exceptAll(again).count() == 0)
  }

  test("typed mapPartitions decode path is bit-equal to the expression path") {
    val expr = Multimodal.features(spark, TestSpark.sf001)
      .select(col("doc_id"), col("n_bytes"), col("features"), col("source"))
    val typed = Multimodal.featuresPartitioned(spark, TestSpark.sf001).toDF()
      .select(col("doc_id"), col("n_bytes"), col("features"), col("source"))
    assert(typed.exceptAll(expr).count() == 0)
    assert(expr.exceptAll(typed).count() == 0)
  }

  test("frame sampling covers the payload; resize truncates and zero-pads") {
    val fr = Multimodal.asBinaryTable(spark, TestSpark.sf001)
      .select(col("doc_id"), length(col("payload")).as("len"),
        Multimodal.frames("payload", 64).as("fr"))
    // total frame bytes reassemble the payload length
    val bad = fr.filter(
      expr("aggregate(transform(fr, f -> length(f)), 0, (a, x) -> a + x)") =!= col("len"))
    assert(bad.count() == 0)
    val resized = Multimodal.features(spark, TestSpark.sf001)
      .select(Multimodal.resizeFeatures("features", 12).as("up"),
        Multimodal.resizeFeatures("features", 3).as("down"), col("features"))
    assert(resized.filter(size(col("up")) =!= 12 || size(col("down")) =!= 3).count() == 0)
    // pad is zeros, truncation preserves the prefix
    assert(resized.filter(element_at(col("up"), 12) =!= 0.0).count() == 0)
    assert(resized.filter(element_at(col("down"), 1) =!= element_at(col("features"), 1))
      .count() == 0)
    // empty payload → zero frames (sequence(0, -1) would fabricate two)
    val empty = spark.sql("SELECT CAST('' AS BINARY) AS payload, CAST('ab' AS BINARY) AS p2")
      .select(Multimodal.frames("payload", 64).as("none"),
        Multimodal.frames("p2", 64).as("one"))
      .head()
    assert(empty.getSeq[Array[Byte]](0).isEmpty, "empty payload must yield no frames")
    assert(empty.getSeq[Array[Byte]](1).size == 1)
  }

  test("q_mm_features: stable shape, nonzero norms, deterministic") {
    val f = Multimodal.features(spark, TestSpark.sf001)
    assert(f.filter(size(col("features")) =!= 8).count() == 0)
    val q = Multimodal.q_mm_features(spark, TestSpark.sf001)
    assert(q.filter(col("feat_sqnorm") <= 0).count() == 0)
    assert(q.exceptAll(Multimodal.q_mm_features(spark, TestSpark.sf001)).count() == 0)
    // payload bytes survive the binary cast: n_bytes equals text length
    val docs = Tables(spark, TestSpark.sf001, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
    val bad = q.join(docs, "doc_id").filter(col("n_bytes") =!= col("len"))
    assert(bad.count() == 0)
  }
}
