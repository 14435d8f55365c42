package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions.txt

/** Dedup decade rungs (r17 verdict #5): candidate-count law, planted-dup
  * recall, and wall for the MinHash-LSH and n-gram-Jaccard paths on
  * replica corpora far past the gate scale — the dedup analogue of
  * AnnBench's four measured ANN decades.
  *
  * Corpus: K key-offset replicas of the sf0.1 documents table
  * (tools/fixture_scale.py, documents-only). Replication makes every base
  * document a K-clique of EXACT duplicates — ground truth is analytic
  * (same-text = same xxhash64(text)), and the corpus is the documented
  * worst case for candidate cost: a correct pair-emitter's OUTPUT is
  * itself Θ(n·K), so the decade rungs measure what can be measured at
  * each scale without faking feasibility:
  *
  *  - `minhash_index` — the production map-only pass: native
  *    ShingleHashes→MinHashSig signatures, banded (band,bucket) explode,
  *    then the occupancy histogram. Candidate-join input rows are
  *    DERIVED EXACTLY from occupancy (sum over buckets of c·(c−1)/2 per
  *    band) — the n·occupancy law — without materializing the join.
  *    Expected for a K-replica corpus: bands · n_base_texts · K(K−1)/2
  *    (plus chance collisions); the reported ratio pins the law.
  *  - `minhash_recall` — planted-dup recall over `anchors` sampled docs:
  *    the banded index restricted to anchor buckets (broadcast of
  *    anchors·bands rows), candidates Jaccard-verified exactly like
  *    minhashDupPairs, found pairs checked against the same-text truth
  *    set. Expect 1.000 — identical text gives identical signatures in
  *    every band.
  *  - `minhash_pairs_full` — the FULL minhashDupPairs count (verify join
  *    included). The verified OUTPUT of a K-replica corpus is
  *    n_texts·K(K−1)/2 pairs — quadratic in K by corpus construction,
  *    not by operator shape — so this leg runs at the rungs where the
  *    analytic count says it fits (path filter), and `minhash_index`'s
  *    derived count carries the law the rest of the way up.
  *  - `ngram_cand_law` — the capped shingle join's EXACT candidate row
  *    count from one document-frequency aggregate (sum df·(df−1)/2 over
  *    surviving shingles), at the replica-equivalent cap 100·K (every
  *    base df is multiplied by K, so the gate's cap=100 semantics map to
  *    100·K) and uncapped. Counts are exact at any scale; the full join
  *    wall is measured only where the count says it fits
  *    (`ngram_pairs_full`).
  *
  * SPARK_GRAFT_DEDUP_CLUSTER=workers,cores,memMB reruns everything on
  * local-cluster — ShingleHashes/MinHashSig then serialize across real
  * executor JVMs at corpus scale (AnnBench's seam, applied to dedup).
  * Needs `sbt package` first.
  *
  * Usage: runMain graft.tools.DedupBench <corpusDir> [anchors=32]
  *   [paths-csv]  (paths substring-match like AnnBench: e.g.
  *   `minhash_index,minhash_recall,ngram_cand_law` for the 10M rung)
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupBench <corpusDir> [anchors] [paths-csv]")
    val dir = args(0)
    val nAnchors = args.lift(1).map(_.toInt).getOrElse(32)
    val only = args.lift(2).map(_.split(",").toSeq)
    def want(name: String) = only.forall(_.exists(name.contains))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = sys.env.get("SPARK_GRAFT_DEDUP_CLUSTER") match {
      case Some(spec) =>
        val fields = spec.split(",").map(_.trim)
        require(fields.length == 3 && fields.forall(_.toIntOption.exists(_ > 0)),
          s"SPARK_GRAFT_DEDUP_CLUSTER must be 'workers,coresPerWorker,memMB' " +
            s"(three positive ints), got '$spec'")
        val Array(w, c, m) = fields
        val codeSrc = new java.io.File(
          getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
        val jarDir = sys.env.get("SPARK_GRAFT_JAR_DIR")
          .map(new java.io.File(_))
          .getOrElse(if (codeSrc.isFile) codeSrc.getParentFile
                     else new java.io.File(codeSrc, ".."))
        val jars = Option(jarDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("tpctoolsspark") &&
            f.getName.endsWith(".jar"))
        require(jars.nonEmpty, s"no tpctoolsspark*.jar under " +
          s"${jarDir.getCanonicalPath} — run `sbt package` first")
        SparkSession.builder()
          .master(s"local-cluster[$w,$c,$m]")
          .config("spark.jars", jars.maxBy(_.lastModified).getAbsolutePath)
          .config("spark.executor.memory", s"${m}m")
          .config("spark.sql.shuffle.partitions", (w.toInt * c.toInt).toString)
      case None =>
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
    }
    val spark = b
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val n = docs.count()
    println(s"""{"harness":"DedupBench","master":"${spark.sparkContext.master}","n":$n,"anchors":$nAnchors}""")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- minhash_index: map-only signatures + occupancy-derived law ----
    // K (replica multiplicity) and the base text count come from the
    // same-text histogram — one hash aggregate, no corpus assumptions.
    val textGroups = docs.select(xxhash64(col("text")).as("th"))
      .groupBy("th").count()
      .agg(count(lit(1)).as("n_texts"),
        sum((col("count") * (col("count") - 1) / 2).cast("long"))
          .as("true_pairs"),
        max("count").as("max_clique"))
      .head()
    val nTexts = textGroups.getLong(0)
    val truePairsTotal = textGroups.getLong(1)
    val maxClique = textGroups.getLong(2)
    println(s"""{"path":"truth","distinct_texts":$nTexts,"true_dup_pairs":$truePairsTotal,"max_clique":$maxClique}""")

    if (want("minhash_index")) {
      val bands = 16
      val ((occMax, occMean, nonEmpty, candRows), wall) = timed {
        val occ = Dedup.minhashSignatures(docs, perms = 64, bands = bands)
          .groupBy("band", "bucket").count()
          .agg(max("count").as("mx"), avg("count").as("mean"),
            count(lit(1)).as("nb"),
            sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand"))
          .head()
        (occ.getLong(0), occ.getDouble(1), occ.getLong(2), occ.getLong(3))
      }
      // identical texts collide in EVERY band: expected = bands·true_pairs
      val expect = bands.toLong * truePairsTotal
      val ratio = candRows.toDouble / math.max(1L, expect)
      println(f"""{"path":"minhash_index","wall_s":$wall%.1f,"bands":$bands,"cand_join_rows":$candRows,"expected_n_occupancy":$expect,"ratio":$ratio%.4f,"max_bucket":$occMax,"mean_bucket":$occMean%.2f,"nonempty_buckets":$nonEmpty}""")
    }

    // ---- minhash_recall: planted-dup recall on the anchor sample ----
    if (want("minhash_recall")) {
      val anchorPred = col("doc_id") < nAnchors
      val th = docs.select(col("doc_id"), xxhash64(col("text")).as("th"))
      val truth = th.join(
          broadcast(th.filter(anchorPred)
            .select(col("doc_id").as("a_id"), col("th").as("ath"))),
          col("th") === col("ath") && col("doc_id") =!= col("a_id"))
        .select(col("a_id"), col("doc_id").as("b_id"))
      val truthSet = truth.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ((found, wall)) = timed {
        val sig = Dedup.minhashSignatures(docs)
        val aSig = sig.filter(col("doc_id") < nAnchors)
          .select(col("doc_id").as("a_id"), col("band").as("ab"),
            col("bucket").as("abk"))
        val cand = sig.join(broadcast(aSig),
            col("band") === col("ab") && col("bucket") === col("abk") &&
              col("doc_id") =!= col("a_id"))
          .select(col("a_id"), col("doc_id").as("b_id")).distinct()
        val sh = docs.select(col("doc_id"),
          txt.shingle_hashes(col("text"), 3).as("sh"))
        // cand is anchor-bounded (≤ anchors·clique + collisions) — broadcast
        // it so the corpus-sized shingle projection streams map-side
        sh.select(col("doc_id").as("b_id"), col("sh").as("shb"))
          .join(broadcast(cand), "b_id")
          .join(broadcast(sh.filter(anchorPred)
            .select(col("doc_id").as("a_id"), col("sh").as("sha"))), "a_id")
          .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
          .filter(col("inter").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("inter")) >= 0.5)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      // an empty truth set (no exact dups among the anchors — the raw
      // base fixture) is vacuous recall, not zero recall
      val recall = if (truthSet.isEmpty) 1.0
        else (truthSet & found).size.toDouble / truthSet.size
      println(f"""{"path":"minhash_recall","wall_s":$wall%.1f,"anchor_true_pairs":${truthSet.size},"found":${found.size},"recall":$recall%.3f}""")
    }

    // ---- minhash_pairs_full: the whole verified pair set, counted ----
    if (want("minhash_pairs_full")) {
      val (cnt, wall) = timed(Dedup.minhashDupPairs(docs).count())
      println(f"""{"path":"minhash_pairs_full","wall_s":$wall%.1f,"verified_pairs":$cnt,"true_dup_pairs":$truePairsTotal}""")
    }

    // ---- ngram_cand_law: exact capped/uncapped candidate counts ----
    if (want("ngram_cand_law")) {
      // the replica-equivalent of the gate's cap=100: every base document
      // frequency is multiplied by the clique size
      val cap = 100L * maxClique
      val ((uncapped, capped, survivors), wall) = timed {
        val dfreq = docs
          .select(col("doc_id"), explode(txt.shingle_hashes(col("text"), 3)).as("g"))
          .groupBy("g").agg(count(lit(1)).as("df"))
        val agg = dfreq.agg(
          sum((col("df") * (col("df") - 1) / 2).cast("long")).as("unc"),
          sum(when(col("df") <= cap,
            (col("df") * (col("df") - 1) / 2).cast("long"))
            .otherwise(0L)).as("cap"),
          sum(when(col("df") <= cap, 1L).otherwise(0L)).as("nsurv")).head()
        (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      }
      println(f"""{"path":"ngram_cand_law","wall_s":$wall%.1f,"cap":$cap,"cand_rows_uncapped":$uncapped,"cand_rows_capped":$capped,"surviving_shingles":$survivors}""")
    }

    // ---- ngram_pairs_full: the full capped join, where the count fits ----
    if (want("ngram_pairs_full")) {
      val cap = 100L * maxClique
      val (cnt, wall) = timed(
        Dedup.ngramPairs(docs, threshold = 0.2, maxDocFreq = Some(cap)).count())
      println(f"""{"path":"ngram_pairs_full","wall_s":$wall%.1f,"cap":$cap,"pairs":$cnt}""")
    }

    spark.stop()
  }
}
