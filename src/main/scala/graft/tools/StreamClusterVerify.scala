package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming across the multi-JVM seam (r14 verdict #6).
  *
  * StreamBench's throughput figures and StreamingSpec's equality proofs
  * all run `local[n]` — one JVM, where the state store, the custom
  * flatMapGroupsWithState lambda, and every shuffle never serialize.
  * This harness runs the two stateful window queries (tumble,
  * flatMapGroupsWithState sessionize) over the SAME replay corpus on
  * `local[32]` and on `local-cluster[4,8,4096]` (4 real executor JVMs:
  * state-store providers on executors, lambdas/encoders shipped over the
  * wire, every exchange serialized) and asserts the results are
  * IDENTICAL across the seam — and that the cluster tumble equals the
  * batch computation of the same transform.
  *
  * Needs `sbt package` first (executors load graft classes from the jar).
  *
  * Usage: SPARK_DRIVER_MEM=8g runMain graft.tools.StreamClusterVerify
  *   [sfDir] [replicas=2] [files=16] [filesPerTrigger=4]
  */
object StreamClusterVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(2)
    val files = args.lift(2).map(_.toInt).getOrElse(16)
    val perTrigger = args.lift(3).map(_.toInt).getOrElse(4)
    val jar = {
      val dir = new java.io.File("target/scala-2.13")
      val jars = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("tpctoolsspark") &&
          f.getName.endsWith(".jar"))
      require(jars.nonEmpty, "run `sbt package` first — executors need the jar")
      jars.maxBy(_.lastModified).getAbsolutePath
    }

    // one-time corpus build in a bootstrap local session
    val replay = java.nio.file.Files.createTempDirectory("graft_scv").toString
    val src = s"$replay/events"
    locally {
      val s = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      val base = graft.Tables(s, sfDir, "events")
      val offsets = s.range(replicas).select(col("id").as("_rep"))
      base.crossJoin(broadcast(offsets))
        .withColumn("event_id", col("event_id") + col("_rep") * 1000000000L)
        .withColumn("user_id", col("user_id") + col("_rep") * 10000000L)
        .drop("_rep")
        .repartition(files)
        .write.mode("overwrite").parquet(src)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    /** Run both stateful queries on `master`; return (tumble rows,
      * last-update-per-session map, batch-tumble rows). Sorted canonical
      * renderings so cross-session comparison is a plain equality. */
    def runOn(master: String, tag: String):
        (Seq[String], Map[(Long, String), (Long, Double)], Seq[String]) = {
      val b = SparkSession.builder().master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      if (master.startsWith("local-cluster")) {
        b.config("spark.jars", jar)
        b.config("spark.executor.memory", "4096m")
      }
      // SPARK_GRAFT_STATESTORE=rocksdb: same queries with state off-heap
      // in RocksDB on each executor — the 100 TB posture for keyed state
      // bigger than heap; equality across the seam must still hold.
      if (sys.env.get("SPARK_GRAFT_STATESTORE").exists(_.equalsIgnoreCase("rocksdb")))
        b.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def read() = graft.streaming.EventStreams.readReplay(
        spark, src, "3650 days", maxFilesPerTrigger = perTrigger)

      // tumble, Complete mode → memory sink (multi-batch: state continuity)
      val st = graft.streaming.EventStreams.runToTable(
        graft.streaming.EventStreams.tumble(read()), s"scv_tumble_$tag",
        OutputMode.Complete)
      val tumbleRows = st.collect().map(_.toString).sorted.toSeq

      // batch computation of the same transform over the same corpus
      val batchRows = graft.streaming.EventStreams.tumble(
          graft.Tables.normalizeEventTs(spark.read.parquet(src)))
        .collect().map(_.toString).sorted.toSeq

      // flatMapGroupsWithState sessionize, Update mode: keep the LAST
      // emit per (user, session start) — the final state of each session
      val acc = scala.collection.concurrent.TrieMap
        .empty[(Long, String), (Long, Double)]
      val cp = s"$replay/cp_${tag}_sess"
      val q = graft.streaming.EventStreams.sessionizeCustom(read())
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch {
          (ds: Dataset[graft.streaming.EventStreams.SessionOut], _: Long) =>
            ds.collect().foreach(r =>
              acc((r.user_id, r.s_start.toString)) = (r.n, r.sum_value.toDouble))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (tumbleRows, acc.toMap, batchRows)
    }

    val (tumbleLocal, sessLocal, batchLocal) = runOn("local[32]", "local")
    val (tumbleClus, sessClus, batchClus) = runOn("local-cluster[4,8,4096]", "clus")

    def check(name: String, ok: Boolean, detail: => String): Unit = {
      println(s"""{"check":"$name","ok":$ok${if (ok) "" else s""","detail":"$detail""""}}""")
      require(ok, s"$name: $detail")
    }
    check("tumble_local_eq_batch", tumbleLocal == batchLocal,
      s"${tumbleLocal.size} streamed vs ${batchLocal.size} batch rows")
    check("tumble_cluster_eq_batch", tumbleClus == batchClus,
      s"${tumbleClus.size} streamed vs ${batchClus.size} batch rows")
    check("tumble_cluster_eq_local", tumbleClus == tumbleLocal,
      s"${tumbleClus.size} vs ${tumbleLocal.size} rows")
    val onlyL = sessLocal.keySet -- sessClus.keySet
    val onlyC = sessClus.keySet -- sessLocal.keySet
    val diff = sessLocal.keySet.intersect(sessClus.keySet)
      .filter(k => sessLocal(k) != sessClus(k))
    check("sessionize_cluster_eq_local",
      onlyL.isEmpty && onlyC.isEmpty && diff.isEmpty,
      s"onlyLocal=${onlyL.size} onlyCluster=${onlyC.size} valueDiff=${diff.size}")
    println(s"""{"result":"SEAM-EXACT","tumble_rows":${tumbleLocal.size},"sessions":${sessLocal.size},"corpus":"$src","replicas":$replicas}""")
  }
}
