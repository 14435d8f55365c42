package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Sustained streaming-replay throughput for the §2.9 window queries
  * (r13 verdict #8: the streaming surface had correctness and delivery
  * contracts but no committed throughput figure).
  *
  * Builds a replay corpus from the fixture events table (`replicas`
  * key-offset copies, identical ts distribution, split into `files`
  * parquet files), then drives each query through the real
  * `readStream` → transform → `writeStream(noop)` path with
  * `maxFilesPerTrigger` files per micro-batch under Trigger.AvailableNow
  * — a multi-batch sustained drain with live watermark advancement and
  * state-store continuity, not one monolithic batch. Reports one JSON
  * line per query: input rows/s over the drain wall-clock, batch count,
  * median/max batch seconds, and the final event-time watermark lag
  * behind max(ts).
  *
  * Usage: `runMain graft.tools.StreamBench <sfDir> [replicas] [files]
  *   [filesPerTrigger]` (defaults 10, 64, 4 — the sf1-equivalent corpus
  *   when sfDir is the sf0.1 fixture). */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 10
    val files = if (args.length > 2) args(2).toInt else 64
    val perTrigger = if (args.length > 3) args(3).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER=local-cluster[4,8,4096] measures the same drain
    // under real executor JVMs (state store + exchanges serialized);
    // needs `sbt package` first. Default stays single-JVM local.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-streambench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_STATESTORE=rocksdb drains the same corpus with state
    // off-heap in RocksDB (the 100 TB posture: keyed session state larger
    // than executor heap); output equality is StreamingSpec's contract,
    // this records the throughput cost of the provider swap.
    if (sys.env.get("SPARK_GRAFT_STATESTORE").exists(_.equalsIgnoreCase("rocksdb")))
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (master.startsWith("local-cluster")) {
      val dir = new java.io.File("target/scala-2.13")
      val jars = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("tpctoolsspark") &&
          f.getName.endsWith(".jar"))
      require(jars.nonEmpty, "run `sbt package` first — executors need the jar")
      b.config("spark.jars", jars.maxBy(_.lastModified).getAbsolutePath)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // replay corpus: key-offset replicas (same ts distribution → same
    // window/session density per user; user/event ids offset so state
    // cardinality scales with the corpus like a real larger tenant)
    val base = graft.Tables(spark, sfDir, "events")
    val total = base.count() * replicas
    val replay = java.nio.file.Files.createTempDirectory("graft_streambench").toString
    val src = s"$replay/events"
    val offsets = spark.range(replicas).select(col("id").as("_rep"))
    base.crossJoin(broadcast(offsets))
      .withColumn("event_id", col("event_id") + col("_rep") * 1000000000L)
      .withColumn("user_id", col("user_id") + col("_rep") * 10000000L)
      .drop("_rep")
      .repartition(files)
      .write.mode("overwrite").parquet(src)
    val maxTs = spark.read.parquet(src)
      .agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)

    val queries: Seq[(String, DataFrame => DataFrame, OutputMode)] = Seq(
      ("stream_tumble", graft.streaming.EventStreams.tumble _, OutputMode.Append),
      ("stream_sessionize", graft.streaming.EventStreams.session _, OutputMode.Append),
      ("stream_sessionize_custom",
        (df: DataFrame) => graft.streaming.EventStreams.sessionizeCustom(df).toDF,
        OutputMode.Update))

    val out = new StringBuilder
    for ((name, xform, mode) <- queries) {
      val cp = s"$replay/cp_$name"
      val events = graft.streaming.EventStreams
        .readReplay(spark, src, "1 hour", maxFilesPerTrigger = perTrigger)
      val t0 = System.nanoTime()
      val q = xform(events).writeStream.format("noop")
        .option("checkpointLocation", cp)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val batchSecs = prog.map(_.durationMs.get("triggerExecution").toDouble / 1e3).sorted
      val medBatch = if (batchSecs.isEmpty) 0.0 else batchSecs(batchSecs.length / 2)
      val inRows = prog.map(_.numInputRows).sum
      // final watermark lag behind the corpus's max event time
      val wmStr = prog.lastOption.flatMap(p =>
        Option(p.eventTime.get("watermark"))).getOrElse("1970-01-01T00:00:00.000Z")
      val wmMicros = java.time.Instant.parse(wmStr).toEpochMilli * 1000L
      val lagS = (maxTs - wmMicros) / 1e6
      def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      // the configured watermark delay is 1 h: a final lag of exactly
      // 3600 s means the watermark fully caught up to max(ts) − delay
      val line = s"""{"query":"$name","input_rows":$inRows,"wall_s":${f(wall)},"rows_per_s":${f(inRows / wall)},"batches":${prog.length},"median_batch_s":${f(medBatch)},"max_batch_s":${f(batchSecs.lastOption.getOrElse(0.0))},"watermark_lag_s":${f(lagS)},"watermark_delay_s":3600,"lag_beyond_delay_s":${f(lagS - 3600.0)},"files_per_trigger":$perTrigger,"corpus_rows":$total,"files":$files}"""
      println(line)
      out.append(line).append('\n')
      require(inRows == total, s"$name drained $inRows of $total rows")
    }
    sys.env.get("SPARK_GRAFT_STREAMBENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        out.toString.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
