package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Recall checks for the approximate ANN paths against the exact brute-force
  * baseline (the promised coverage for the rows-only queries, SURVEY §5.2). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables(spark, TestSpark.sf001, "embeddings")
    .select("vec_id", "embedding")

  /** Exact top-k pairs for anchors vec_id < 5 (same shape as q_sim_topk). */
  private def exactPairs: Set[(Long, Long)] =
    Similarity.q_sim_topk(spark, TestSpark.sf001)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("scalar quantization: codes span 0..255 and reconstruction error is bounded") {
    val q = Similarity.q_embed_quantize(spark, TestSpark.sf001)
    val emb = Tables(spark, TestSpark.sf001, "embeddings")
    assert(q.count() == emb.count())
    // 64 codes/vector, each in [0,255]; extremes map to the endpoints, so
    // the sum sits strictly inside (0, 64*255)
    assert(q.filter(col("sum_codes") < 0 || col("sum_codes") > 64 * 255).count() == 0)
    // max reconstruction error of 256-level min-max quantization is half a
    // step: (hi-lo)/255/2
    val bad = q.filter(col("max_err_r") > (col("hi_r") - col("lo_r")) / 255 / 2 + 1e-6)
    assert(bad.count() == 0, "reconstruction error exceeds half a quant step")
  }

  test("the quadratic baseline refuses oversized input") {
    val e = intercept[IllegalArgumentException] {
      Similarity.embedDupPairs(emb, 0.4, maxRows = 10).count()
    }
    assert(e.getMessage.contains("O(n²)"))
    // under the fence it still runs
    assert(Similarity.embedDupPairs(emb.limit(8), 0.9, maxRows = 10).count() >= 0)
  }

  test("LSH at production knobs (16-bit bands) recovers every planted exact dup") {
    val planted = emb.unionByName(
      emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    // identical vector → identical signature → collides in every band; its
    // copy must be the top-1 neighbor at cosine 1.0
    val top1 = Similarity.lshNeighbors(planted, col("vec_id") >= 10000, k = 1)
    val hits = top1.filter(col("b_id") === col("a_id") - 10000 &&
      col("cos_r") === 1.0).count()
    assert(hits == emb.count())
  }

  test("IVF recall vs exact top-k is high on the fixture") {
    val ivf = Similarity.q_sim_ivf(spark, TestSpark.sf001)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = exactPairs
    val recall = (t & ivf).size.toDouble / t.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
  }

  test("Lloyd-refined centroids keep (or improve) IVF recall") {
    def recallOf(iters: Int): Double = {
      val got = Similarity.ivfNeighbors(emb, col("vec_id") < 5, refineIters = iters)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val t = exactPairs
      (t & got).size.toDouble / t.size
    }
    val seed = recallOf(0)
    val refined = recallOf(1)
    assert(refined >= seed - 0.1,
      s"refinement degraded recall: seed=$seed refined=$refined")
    assert(refined >= 0.8, s"refined IVF recall $refined < 0.8")
  }

  test("ivfCells encodes the measured guidance: √n floored at 16, capped at 256") {
    // SCALE.md §7.1 A/B: C=√n=141 at 20k vectors is cheap (6.2 s index
    // pass); C=√n=447 at 200k costs 73 s for recall LSH already had — so
    // C grows as √n only up to the measured cap (r15 verdict #7)
    assert(Similarity.ivfCellCapDefault === 256)
    assert(Similarity.ivfCells(100) === 16)            // floor
    assert(Similarity.ivfCells(20_000) === 141)        // √n regime (measured)
    assert(Similarity.ivfCells(200_000) === 256)       // capped (√n would be 447)
    assert(Similarity.ivfCells(2_000_000) === 256)     // stays capped a decade up
    assert(Similarity.ivfCells(2_000_000, cap = Int.MaxValue) === 1414) // recall-first
    // numCells <= 0 routes ivfNeighbors through the derivation
    val derived = Similarity.ivfNeighbors(emb, col("vec_id") < 3, k = 5,
      numCells = 0, probes = 4, refineIters = 0)
    assert(derived.count() > 0)
  }

  test("refined IVF derives the embedding dim from the data (non-64-dim corpus)") {
    // round-3 bug: kmeansCentroids hardcoded dim=64, so any other corpus got
    // truncated/padded centroids and VectorDot's length-mismatch→null
    // contract nulled every downstream cosine
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim8 = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfNeighbors(dim8, col("vec_id") < 3, k = 5,
      numCells = 4, probes = 2, refineIters = 1).cache()
    assert(got.count() > 0, "refined IVF returned nothing on 8-dim input")
    assert(got.filter(col("cos_r").isNull).count() == 0,
      "null cosines — centroid dim mismatched the corpus dim")
    got.unpersist()
  }

  test("tuned LSH has measurable recall on the fixture's moderate-sim regime") {
    val lsh = Similarity.q_sim_lsh(spark, TestSpark.sf001)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = exactPairs
    val recall = (t & lsh).size.toDouble / t.size
    assert(recall >= 0.25, s"LSH recall $recall < 0.25")
  }

  test("every approximate result pair reports the exact cosine") {
    // approximate paths may MISS pairs but must never mis-score one: join
    // IVF results back to brute-force scores and compare the rounded cosine
    val brute = Similarity.q_sim_topk(spark, TestSpark.sf001)
      .select(col("a_id"), col("b_id"), col("cos_r").as("cos_exact"))
    val bad = Similarity.q_sim_ivf(spark, TestSpark.sf001)
      .join(brute, Seq("a_id", "b_id"))
      .filter(col("cos_r") =!= col("cos_exact"))
    assert(bad.count() == 0)
  }
}
