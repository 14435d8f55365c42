package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ANN recall + wall-clock at 100× the fixture scale (r14 verdict #5).
  *
  * SimilaritySpec asserts LSH/IVF recall at sf0.01 (500 vectors); the
  * dedup ladder has at-scale SPILL evidence but the ANN paths had none.
  * This harness runs the sf1 replica embeddings (10 key-offset copies of
  * sf0.1 → ~100k vectors, built by tools/fixture_scale.py — every vector
  * carries 9 EXACT duplicates, so the corpus has a real near-dup regime
  * plus the moderate-sim background) through:
  *
  *   - exact ground truth: per-anchor brute-force top-k (broadcast
  *     anchors × corpus — LINEAR in n, not the fenced all-pairs);
  *   - lshNeighbors at production knobs (8 bands × 16 bits) and at the
  *     occupancy-tuned fixture knobs (32 × 8);
  *   - ivfNeighbors with C ≈ √n cells (the documented guidance) at
  *     seed centroids and after one Lloyd round.
  *
  * Reports per path: wall seconds, recall@k vs exact, and near-dup
  * recall (the subset of exact pairs with cosine ≥ 0.99 — the regime
  * LSH banding is built for). One JSON line per path.
  *
  * Usage: runMain graft.tools.AnnBench <fixtureDir> [anchors=32] [k=10]
  *   [paths-csv]  — the optional comma list restricts which approximate
  *   paths run (substring match), e.g. `lsh_production` for the 2M-vector
  *   third-decade rung where the IVF index-scoring pass is the known
  *   (measured, capped) cost and LSH is the dedup-regime recommendation.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnBench <fixtureDir> [anchors] [k] [paths-csv]")
    val dir = args(0)
    val nAnchors = args.lift(1).map(_.toInt).getOrElse(32)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val only = args.lift(3).map(_.split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_ANN_CLUSTER=workers,cores,memMB runs the whole harness
    // on local-cluster (separate executor JVMs, ClusterBench's seam): the
    // custom vector expressions (VectorDot/LshSignature/MinHashSig) and
    // broadcast anchor/centroid sets then serialize for REAL at ANN scale.
    // Needs `sbt package` first — executors load graft classes from the jar.
    val b = sys.env.get("SPARK_GRAFT_ANN_CLUSTER") match {
      case Some(spec) =>
        val fields = spec.split(",").map(_.trim)
        require(fields.length == 3 && fields.forall(_.toIntOption.exists(_ > 0)),
          s"SPARK_GRAFT_ANN_CLUSTER must be 'workers,coresPerWorker,memMB' " +
            s"(three positive ints), got '$spec'")
        val Array(w, c, m) = fields
        // resolve the packaged jar relative to where THIS class was loaded
        // from (works from any cwd); SPARK_GRAFT_JAR_DIR overrides both.
        val codeSrc = new java.io.File(
          getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
        val jarDir = sys.env.get("SPARK_GRAFT_JAR_DIR")
          .map(new java.io.File(_))
          .getOrElse(if (codeSrc.isFile) codeSrc.getParentFile
                     else new java.io.File(codeSrc, "..")) // classes/ -> scala-2.13/
        val jars = Option(jarDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("tpctoolsspark") &&
            f.getName.endsWith(".jar"))
        require(jars.nonEmpty, s"no tpctoolsspark*.jar under " +
          s"${jarDir.getCanonicalPath} — run `sbt package` first (executors " +
          s"need the jar), or point SPARK_GRAFT_JAR_DIR at it")
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
    println(s"""{"harness":"AnnBench","master":"${spark.sparkContext.master}"}""")

    val emb = graft.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val n = emb.count()
    val anchorPred = col("vec_id") < nAnchors
    println(s"""{"harness":"AnnBench","n":$n,"anchors":$nAnchors,"k":$k}""")

    // exact ground truth: anchors broadcast against the corpus, top-k by
    // (cos desc, b_id) — same tie-break as every ANN path
    def exactTopK(): DataFrame = {
      val a = emb.filter(anchorPred)
        .select(col("vec_id").as("a_id"), col("embedding").as("va"))
      emb.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
        .join(broadcast(a), col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          Similarity.cosine("va", "vb").as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))))
        .filter(col("rn") <= k)
        .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_r"))
    }

    def pairs(df: DataFrame): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val rows = df.select("a_id", "b_id", "cos_r").collect()
      val all = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val near = rows.filter(_.getDouble(2) >= 0.99)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (all, near)
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, t_exact) = timed(pairs(exactTopK()))
    val (truthAll, truthNear) = truth
    println(f"""{"path":"exact","wall_s":$t_exact%.1f,"pairs":${truthAll.size},"near_dup_pairs":${truthNear.size}}""")

    // C via the encoded guidance: √n capped at 256 (SCALE.md §7.1 A/B)
    val c = Similarity.ivfCells(n)
    val probes = math.max(4, c / 10)
    val paths: Seq[(String, () => DataFrame)] = Seq(
      "lsh_production_8x16" -> (() =>
        Similarity.lshNeighbors(emb, anchorPred, k = k)),
      "lsh_tuned_32x8" -> (() =>
        Similarity.lshNeighbors(emb, anchorPred, k = k, bands = 32, bitsPerBand = 8)),
      s"ivf_seed_c${c}_p$probes" -> (() =>
        Similarity.ivfNeighbors(emb, anchorPred, k = k, numCells = c,
          probes = probes, refineIters = 0)),
      s"ivf_lloyd1_c${c}_p$probes" -> (() =>
        Similarity.ivfNeighbors(emb, anchorPred, k = k, numCells = c,
          probes = probes, refineIters = 1)))

    paths.filter(p => only.forall(_.exists(p._1.contains))).foreach {
      case (name, build) =>
        val ((got, gotNear), wall) = timed(pairs(build()))
        val recall = (truthAll & got).size.toDouble / math.max(1, truthAll.size)
        val nearRecall =
          (truthNear & gotNear).size.toDouble / math.max(1, truthNear.size)
        println(f"""{"path":"$name","wall_s":$wall%.1f,"recall_at_$k":$recall%.3f,"near_dup_recall":$nearRecall%.3f,"returned":${got.size}}""")
    }

    // LSH bucket occupancy — the quantity the candidate-join cost actually
    // scales with (n·occupancy): per-band bucket fill. Emitted PER MATCHED
    // LSH configuration with that configuration's own bands/bits (r16
    // ADVICE: a run filtered to only the tuned path used to emit occupancy
    // for the production knobs it never ran, mislabeled). Skipped entirely
    // when the path filter excludes every LSH path — an IVF-only run
    // shouldn't pay a corpus-wide signature explode it didn't ask for.
    Seq(("lsh_production_8x16", 8, 16), ("lsh_tuned_32x8", 32, 8))
      .filter { case (name, _, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, bands, bits) =>
        val occ = emb.select(posexplode(
            Similarity.lshBuckets("embedding", bands, bits)).as(Seq("band", "bucket")))
          .groupBy("band", "bucket").count()
          .agg(max("count").as("max_occ"), avg("count").as("mean_occ"),
            count(lit(1)).as("nonempty_buckets"))
          .head()
        println(f"""{"path":"${name}_occupancy","max_bucket":${occ.getLong(0)},"mean_bucket":${occ.getDouble(1)}%.2f,"nonempty_buckets":${occ.getLong(2)},"bucket_space_per_band":${1 << bits}}""")
      }
    spark.stop()
  }
}
