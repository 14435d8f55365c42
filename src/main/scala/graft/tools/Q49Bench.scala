package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.ops.Tpcds

/** A/B harness for Q49's rank tail (VERDICT r12 next-round #2): the shipped
  * bounded single-partition window pair vs a [[graft.ops.Scale.topKRank]]-
  * shaped tail — per-metric kth-value thresholds from partial limits,
  * OR-union survivors, then EXACT global ranks for the ≤(2k+ties) survivors
  * by broadcast strictly-smaller count joins against the full (persisted)
  * channel aggregate. rank(v) = 1 + |{v' : v' < v}| and v ≤ v_(k) ⟺
  * rank(v) ≤ k, so both tails are value-identical by construction — the
  * harness asserts that first, then times warm repeats of each.
  *
  * Both tails run over the IDENTICAL upstream plan
  * ([[Tpcds.q49Channels]]); each timed rep re-persists and unpersists the
  * channel aggregates so no rep inherits the previous rep's cache.
  *
  * Usage: runMain graft.tools.Q49Bench [sfDir] [reps]
  */
object Q49Bench {
  /** The topKRank-shaped tail over one channel's per-item aggregate.
    * `perItem` must be persisted by the caller (it is scanned 5×:
    * 2 thresholds, survivors, 2 rank-count joins). */
  def topkTail(name: String, perItem: DataFrame, k: Int = 10): DataFrame = {
    def kth(c: String, alias: String) = perItem.select(col(c).as("_v"))
      .orderBy(col("_v").asc).limit(k).agg(max(col("_v")).as(alias))
    // both 1-row thresholds merge on the non-foldable pmod(hash,1) key and
    // attach by broadcast HASH join (never a nested loop over the frame)
    val thrs = kth("return_ratio", "_thr_r")
      .withColumn("_bk", pmod(xxhash64(col("_thr_r")), lit(1L)))
      .join(kth("currency_ratio", "_thr_c")
        .withColumn("_bk", pmod(xxhash64(col("_thr_c")), lit(1L))), "_bk")
    val surv = perItem
      .withColumn("_bk", pmod(xxhash64(col("return_ratio")), lit(1L)))
      .join(broadcast(thrs), "_bk")
      .filter(col("return_ratio") <= col("_thr_r") ||
        col("currency_ratio") <= col("_thr_c"))
      .drop("_bk", "_thr_r", "_thr_c")
    // exact global rank for each survivor: count strictly-smaller values in
    // the FULL frame (a row surviving only via the OTHER metric can carry a
    // rank ≫ k on this one — ranking survivors alone would be wrong).
    // Broadcast the ≤(2k+ties) survivors; the frame streams map-side.
    def ranks(c: String, out: String) = perItem.select(col(c).as("_fv"))
      .join(broadcast(surv.select(col("item").as(s"_si_$out"), col(c).as("_sv"))),
        col("_fv") < col("_sv"))
      .groupBy(s"_si_$out").agg((count(lit(1)) + 1).cast(IntegerType).as(out))
    surv
      .join(broadcast(ranks("return_ratio", "return_rank")),
        col("item") === col("_si_return_rank"), "left")
      .join(broadcast(ranks("currency_ratio", "currency_rank")),
        col("item") === col("_si_currency_rank"), "left")
      // a survivor with NO strictly-smaller rows is rank 1 (left-join miss)
      .withColumn("return_rank", coalesce(col("return_rank"), lit(1)).cast(IntegerType))
      .withColumn("currency_rank", coalesce(col("currency_rank"), lit(1)).cast(IntegerType))
      .select(lit(name).as("channel"), col("item"), col("return_ratio"),
        col("return_rank"), col("currency_rank"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def windowForm(): DataFrame = Tpcds.q_tpcds_q49(spark, sfDir)
    def topkForm(): (DataFrame, Seq[DataFrame]) = {
      val chans = Tpcds.q49Channels(spark, sfDir).map { case (n, pi) =>
        (n, pi.persist())
      }
      (chans.map { case (n, pi) => topkTail(n, pi) }.reduce(_ union _),
        chans.map(_._2))
    }

    // equality first: value-identical or the timing is meaningless
    val (tk, cached) = topkForm()
    val w = windowForm()
    val diff = tk.exceptAll(w).count() + w.exceptAll(tk).count()
    require(diff == 0, s"tails disagree on $diff rows")
    println(s"[q49bench] identical output, ${w.count()} rows")
    cached.foreach(_.unpersist(blocking = true))

    def time(name: String, run: () => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q49bench] $name%-8s median=${times(times.size / 2)}%.2f  " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    time("window", () =>
      windowForm().write.format("noop").mode("overwrite").save())
    time("topk", () => {
      val (df, cached) = topkForm()
      df.write.format("noop").mode("overwrite").save()
      cached.foreach(_.unpersist(blocking = true))
    })
    spark.stop()
  }
}
