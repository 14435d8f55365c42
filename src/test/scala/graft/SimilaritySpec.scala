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

  test("incremental LSH: every query copying a history vector returns it as top-1 at cos 1.0") {
    val queries = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val top1 = Similarity.lshIncremental(queries,
      Similarity.lshIndex(emb), emb, k = 1)
    val hits = top1.filter(col("hist_id") === col("q_id") - 10000 &&
      col("cos_r") === 1.0).count()
    assert(hits == emb.count())
  }

  test("incremental LSH equals anchor-mode lshNeighbors restricted to the history side") {
    // same split as the declared query: odd ids arrive, even are history.
    // lshNeighbors over the WHOLE corpus with odd anchors, restricted to
    // even-id neighbors and re-ranked, must equal the incremental result —
    // the index path changes the execution shape, never the answer.
    val hist = emb.filter(col("vec_id") % 2 === 0)
    val queries = emb.filter(col("vec_id") % 2 === 1)
    val inc = Similarity.lshIncremental(queries,
        Similarity.lshIndex(hist, bands = 32, bitsPerBand = 8),
        hist, k = 5, bands = 32, bitsPerBand = 8)
      .select(col("q_id"), col("hist_id"), col("cos_r"), col("rn"))
    val viaNeighbors = Similarity.lshNeighbors(emb, col("vec_id") % 2 === 1,
        k = Int.MaxValue, bands = 32, bitsPerBand = 8)
      .filter(col("b_id") % 2 === 0)
      .withColumn("rn2", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("a_id")
          .orderBy(col("cos_r").desc, col("b_id"))))
      .filter(col("rn2") <= 5)
      .select(col("a_id").as("q_id"), col("b_id").as("hist_id"),
        col("cos_r"), col("rn2").as("rn"))
    assert(inc.exceptAll(viaNeighbors).count() == 0 &&
      viaNeighbors.exceptAll(inc).count() == 0)
  }

  /** The sf0.01 fixture is 500 UNCLUSTERED random 64-dim vectors — the
    * hardest regime for IVF (cosine concentration: top-10 neighbors spread
    * near-uniformly across cells), so recall on it tracks the PROBED-CELL
    * FRACTION: measured 0.46 @ 4/16 probes, 0.68 @ 8/16, 0.92 @ 12/16.
    * (An earlier revision read ≥0.8 at 4/16 — only because the id-rank
    * seed made the anchors their own centroids, a biased evaluation the
    * hash seeding removed.) The regime ANN is FOR — clustered/near-dup
    * corpora — is pinned at default knobs by the planted-cluster test
    * below and measured at 0.994–1.000 across four decades in SCALE.md
    * §7.1. */
  test("IVF recall on the unclustered fixture tracks the probed fraction") {
    def recallAt(probes: Int): Double = {
      val got = Similarity.ivfNeighbors(emb, col("vec_id") < 5,
          numCells = 16, probes = probes, refineIters = 0)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val t = exactPairs
      (t & got).size.toDouble / t.size
    }
    val lo = recallAt(4)
    val hi = recallAt(12)
    assert(lo >= 0.4, s"IVF recall @4/16 probes $lo < 0.4")
    assert(hi >= 0.8, s"IVF recall @12/16 probes $hi < 0.8")
    assert(hi > lo, "more probed cells must not lose recall on this fixture")
  }

  test("IVF at default knobs resolves planted near-duplicates exactly") {
    // The production regime: every vector gets a near-copy (1.001-scaled,
    // cosine 1.0 up to float rounding). The copy's argmax cell IS its own
    // nearest centroid, so the default 4/16 probes must surface the
    // original as top-1 for ALL 500 anchors — cell assignment and probing
    // agree wherever the corpus actually has neighbor structure.
    val planted = emb.unionByName(
      emb.select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, x -> x * CAST(1.001 AS FLOAT))").as("embedding")))
    val top1 = Similarity.ivfNeighbors(planted, col("vec_id") >= 10000, k = 1)
    val hits = top1.filter(col("b_id") === col("a_id") - 10000).count()
    assert(hits == emb.count(),
      s"IVF missed ${emb.count() - hits} of ${emb.count()} planted near-dups")
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
    // default 4/16 probes on the unclustered fixture — fraction regime
    // (see the scaladoc above); the absolute bar lives where the corpus
    // has structure (planted-cluster test, SCALE.md decades)
    assert(refined >= 0.45, s"refined IVF recall $refined < 0.45")
  }

  test("IVF seed is corpus-order-agnostic: recall holds on an adversarially sorted replica") {
    import org.apache.spark.sql.expressions.Window
    // Re-ID the fixture by rank of the first embedding coordinate: ids
    // 0..C-1 become ONE corner of the embedding space. The r16 seed
    // (`vec_id < numCells`) drew every centroid from that corner on a
    // corpus shaped like this (crawl/sort-ordered ids); the hash-rank seed
    // is id-order-blind, so recall must hold at the unsorted fixture's bar.
    val w = Window.orderBy(
      expr("CAST(element_at(embedding, 1) AS DOUBLE)"), col("vec_id"))
    val sorted = emb.select(
      (row_number().over(w) - 1).cast("long").as("vec_id"), col("embedding"))
    val a = sorted.filter(col("vec_id") < 5)
      .select(col("vec_id").as("a_id"), col("embedding").as("va"))
    val exact = sorted.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
      .join(broadcast(a), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), Similarity.cosine("va", "vb").as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))))
      .filter(col("rn") <= 10)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same operating point as the unsorted fixture's high-fraction probe
    // (12/16 cells — see the fraction-law scaladoc): id order must not
    // matter to the seed, so the sorted replica meets the same bar
    val ivf = Similarity.ivfNeighbors(sorted, col("vec_id") < 5,
        numCells = 16, probes = 12, refineIters = 0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall on the sorted replica $recall < 0.8")
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
