package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic-sampling properties: reproducibility is the entire point
  * of hash-splitting (rand() would resample under retries/repartitioning). */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables(spark, TestSpark.sf001, "documents")
    .select("doc_id", "lang")

  test("sampleByHash is deterministic, partition-invariant, near the fraction") {
    val a = Sampling.sampleByHash(docs, col("doc_id"), 0.2)
    val b = Sampling.sampleByHash(docs.repartition(7), col("doc_id"), 0.2)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "same rows regardless of partitioning")
    val n = a.count().toDouble / docs.count()
    assert(n > 0.1 && n < 0.3, s"sampled fraction $n far from 0.2")
    // different salts give (near-)independent samples, same-size-ish
    val c = Sampling.sampleByHash(docs, col("doc_id"), 0.2, salt = 1)
    assert(c.intersect(a).count() < a.count(), "salted sample must differ")
  }

  test("nested samples: a smaller fraction is a subset of a larger one") {
    // hash-threshold splitting makes fractions NESTED (the 10% sample is
    // contained in the 20%): growing a corpus sample keeps what you had
    val small = Sampling.sampleByHash(docs, col("doc_id"), 0.1)
    val big = Sampling.sampleByHash(docs, col("doc_id"), 0.2)
    assert(small.exceptAll(big).count() == 0)
  }

  test("stratified sampling applies per-stratum rates") {
    val s = Sampling.stratifiedSampleByHash(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "de" -> 0.1), default = 0.0)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet.subsetOf(Set("en", "de")), "default 0 drops other strata")
    val enRate = byLang("en").toDouble / totals("en")
    val deRate = byLang("de").toDouble / totals("de")
    assert(enRate > 0.35 && enRate < 0.65, s"en rate $enRate")
    assert(deRate < 0.25, s"de rate $deRate")
  }
}
