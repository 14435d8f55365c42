package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.Streams
import graft.streaming.EventStreams

/** SURVEY §2.9 batch-equivalence: the Structured Streaming execution of each
  * window query must equal the batch execution row-for-row (same transform
  * function, two engines' execution modes). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def assertSame(streamed: DataFrame, batch: DataFrame, tag: String): Unit = {
    val extra = streamed.exceptAll(batch).count()
    val missing = batch.exceptAll(streamed).count()
    assert(extra == 0 && missing == 0,
      s"$tag: streaming vs batch mismatch ($extra extra, $missing missing)")
  }

  test("tumbling window: streaming == batch") {
    val st = EventStreams.runToTable(
      EventStreams.tumble(EventStreams.readEvents(spark, dir)),
      "t_tumble", OutputMode.Complete)
    assertSame(st, Streams.q_stream_tumble(spark, dir), "tumble")
  }

  test("sliding window: streaming == batch") {
    val st = EventStreams.runToTable(
      EventStreams.slide(EventStreams.readEvents(spark, dir)),
      "t_slide", OutputMode.Complete)
    assertSame(st, Streams.q_stream_slide(spark, dir), "slide")
  }

  test("session window: streaming == batch") {
    val st = EventStreams.runToTable(
      EventStreams.session(EventStreams.readEvents(spark, dir)),
      "t_session", OutputMode.Complete)
    assertSame(st, Streams.q_stream_session(spark, dir), "session")
  }

  test("streaming JSONL ingest == batch (multi-file tumbling replay)") {
    val jdir = "/tmp/graft-jsonl-stream"
    rmAll(jdir)
    val ev = Tables(spark, TestSpark.sf0001, "events")
    // several part files so the throttled source takes multiple triggers —
    // state continuity across micro-batches, not one AvailableNow gulp
    graft.convert.Jsonl.write(ev.repartition(6), jdir)
    val st = EventStreams.runToTable(
      EventStreams.tumble(EventStreams.readJsonl(
        spark, jdir, ev.schema, "ts", watermark = "1000 days", maxFilesPerTrigger = 2)),
      "t_jsonl_tumble", OutputMode.Complete)
    assertSame(st, Streams.q_stream_tumble(spark, TestSpark.sf0001), "jsonl tumble")
  }

  test("stream-static broadcast enrichment == batch join") {
    import org.apache.spark.sql.functions.broadcast
    // static dim derived in batch: per-user tier by id parity
    val dim = Tables(spark, dir, "events").select("user_id").distinct()
      .withColumn("tier", when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val enriched = EventStreams.runToTable(
      EventStreams.readEvents(spark, dir)
        .join(broadcast(dim), "user_id")
        .groupBy("tier").agg(count(lit(1)).as("n")),
      "t_enrich", OutputMode.Complete)
    val batch = Tables(spark, dir, "events")
      .join(broadcast(dim), "user_id")
      .groupBy("tier").agg(count(lit(1)).as("n"))
    assertSame(enriched, batch, "stream-static enrichment")
  }

  test("streaming ingestion dedup == batch incremental dedup (static index, multi-batch)") {
    import graft.ops.Dedup
    import graft.streaming.DocStreams
    // the declared query's split at sf0.01: odd doc_ids arrive (here as 4
    // parquet files -> 4 micro-batches), even are the static history index
    val docs = Tables(spark, TestSpark.sf001, "documents").select("doc_id", "text")
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val arriveDir = java.nio.file.Files.createTempDirectory("graft_docstream")
    docs.filter(col("doc_id") % 2 === 1).repartition(4)
      .write.mode("overwrite").parquet(arriveDir.toString)
    val histIndex = Dedup.minhashSignatures(hist)
    val histShingles = hist.select(col("doc_id"),
      graft.functions.txt.shingle_hashes(col("text"), 3).as("sh"))
    val acc = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    var batches = 0
    val q = DocStreams.incrementalDedup(
        DocStreams.readDocs(spark, arriveDir.toString, filesPerTrigger = 1),
        histIndex, histShingles) { (pairs, _) =>
      val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      acc.synchronized { acc ++= rows; batches += 1 }
    }
    try { q.processAllAvailable() } finally q.stop()
    assert(batches >= 2, s"expected a multi-batch replay, saw $batches")
    val want = Dedup.q_dedup_incremental(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(acc.toSet == want,
      s"streaming union (${acc.size}) != batch incremental (${want.size})")
  }

  test("stream-stream interval self-join == batch theta join") {
    val joined = EventStreams.runToTable(
      EventStreams.intervalJoin(EventStreams.readEvents(spark, dir)),
      "t_ssjoin", OutputMode.Append)
    val agg = joined.groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
    assertSame(agg, graft.ops.Relational.q_join_theta(spark, dir), "interval join")
  }

  test("stream-stream interval LEFT OUTER join == batch outer join on closed windows") {
    val st = EventStreams.runToTable(
      EventStreams.intervalJoinOuter(EventStreams.readEvents(spark, dir)),
      "t_ssojoin", OutputMode.Append)
    val ev = Tables(spark, dir, "events")
    val a = ev.select(col("user_id").as("a_user"), col("ts").as("a_ts"),
      col("event_id").as("a_event"))
    val b = ev.select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    val batch = a.join(b, col("a_user") === col("b_user") &&
      col("b_ts") > col("a_ts") &&
      col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
    // matched rows emit as soon as both sides are seen — equal everywhere
    assertSame(st.filter(col("b_ts").isNotNull),
      batch.filter(col("b_ts").isNotNull), "outer join matched rows")
    // an unmatched row emits only once the final watermark (max ts − 1h
    // delay) passes its join-window end (a_ts + 1h): the closed windows
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val wm = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)
    assertSame(st.filter(col("b_ts").isNull),
      batch.filter(col("b_ts").isNull &&
        col("a_ts") + expr("INTERVAL 1 HOUR") < lit(wm)),
      "outer join null-padded closed windows")
  }

  test("dropDuplicatesWithinWatermark removes in-watermark duplicates") {
    val st = EventStreams.runToTable(
      EventStreams.dedup(EventStreams.readEvents(spark, dir)),
      "t_dedup", OutputMode.Append)
    val batch = Tables(spark, dir, "events")
    // the fixture has unique event_ids, so dedup must be a no-op pass-through
    assert(st.count() == batch.count())
    assert(st.select("event_id").distinct().count() == batch.count())
  }

  /** Raw events (ts still nanos-as-long) scattered into many small files —
    * replayed with maxFilesPerTrigger=1 this forces state to survive many
    * micro-batches, which the single-file AvailableNow tests never exercise. */
  private def writeReplay(dir: String, dup: Boolean): Long = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    val data = if (dup) raw.unionAll(raw) else raw
    data.repartition(8).write.mode("overwrite").parquet(dir)
    raw.count()
  }

  test("windowed aggregation accumulates state across many micro-batches") {
    val dir = "/tmp/graft-replay-events"
    writeReplay(dir, dup = false)
    // replay order is arbitrary → effectively-infinite watermark so no row
    // counts as late; the assertion is cross-batch state accumulation
    val st = EventStreams.runToTable(
      EventStreams.tumble(EventStreams.readReplay(spark, dir, "3650 days")),
      "t_replay_tumble", OutputMode.Complete)
    assertSame(st, Streams.q_stream_tumble(spark, TestSpark.sf0001), "replay tumble")
  }

  test("dropDuplicatesWithinWatermark drops duplicates arriving in different batches") {
    val dir = "/tmp/graft-replay-events-dup"
    val n = writeReplay(dir, dup = true)
    val st = EventStreams.runToTable(
      EventStreams.dedup(EventStreams.readReplay(spark, dir, "3650 days")),
      "t_replay_dedup", OutputMode.Append)
    assert(st.count() == n, "every event must survive exactly once")
  }

  test("file sink resumes from checkpoint exactly-once across restarts") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = "/tmp/graft-ckpt-src"
    val out = "/tmp/graft-ckpt-out"
    val cp = "/tmp/graft-ckpt-state"
    val stage = "/tmp/graft-ckpt-stage"
    Seq(src, out, cp, stage).foreach { p =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(p))
    }
    val total = writeReplay(stage, dup = false)
    val parts = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    Files.createDirectories(Paths.get(src))
    def copyIn(fs: Array[java.io.File]): Unit = fs.foreach(f =>
      Files.copy(f.toPath, Paths.get(src, f.getName), StandardCopyOption.REPLACE_EXISTING))
    def drain(): Unit = {
      val q = EventStreams.readReplay(spark, src, "3650 days", maxFilesPerTrigger = 2)
        .select("event_id", "user_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: half the files; run 2: the rest, SAME checkpoint — the sink
    // must contain every event exactly once (no loss, no replay)
    copyIn(parts.take(parts.length / 2)); drain()
    copyIn(parts.drop(parts.length / 2)); drain()
    val result = spark.read.parquet(out)
    assert(result.count() == total, "loss or duplication across restart")
    assert(result.select("event_id").distinct().count() == total)
  }

  test("mid-stream KILL + checkpoint restart delivers exactly-once output") {
    // the r12 verdict's delivery-contract gap: the restart test above stops
    // BETWEEN two clean AvailableNow drains; a real pipeline dies MID-query.
    // Here the first run is an unbounded trigger over 24 one-file
    // micro-batches, stopped abruptly as soon as two batches have
    // committed — in-flight work is abandoned, the checkpoint holds a
    // partial offset log, and un-ingested files remain. The restart must
    // deliver every event exactly once: the file-sink _spark_metadata log
    // excludes any uncommitted batch output, and the source resumes from
    // the committed offsets.
    import org.apache.spark.sql.streaming.Trigger
    val stage = "/tmp/graft-kill-stage"
    val src = "/tmp/graft-kill-src"
    val out = "/tmp/graft-kill-out"
    val cp = "/tmp/graft-kill-cp"
    rmAll(stage, src, out, cp)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    // 24 single-file micro-batches staged aside; only HALF are visible to
    // the first run. The kill therefore provably lands before the last
    // batch on ANY host speed (the second half doesn't exist yet), instead
    // of racing recentProgress against a fast drain (ADVICE r13, low) —
    // while the first run still dies abruptly mid-ingestion of its half.
    raw.repartition(24).write.mode("overwrite").parquet(stage)
    val total = raw.count()
    val parts = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    new java.io.File(src).mkdirs()
    def moveIn(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(src, f.getName))
    }
    moveIn(parts.take(12))
    def resumable() = EventStreams
      .readReplay(spark, src, "3650 days", maxFilesPerTrigger = 1)
      .select("event_id", "user_id", "event_type", "value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
    val q1 = resumable().trigger(Trigger.ProcessingTime("10 milliseconds")).start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
           System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
      "stream made no progress before the kill")
    // NOTE: stop() interrupts the stream thread but still runs Spark's
    // ORDERLY query shutdown (sinks/state unload cleanly) — this proves
    // checkpoint restore, not hard-crash consistency; the true JVM-halt
    // variant is the StreamCrashProbe rung at the end of this suite.
    q1.stop()
    // the rest of the corpus arrives only after the stream is dead
    moveIn(parts.drop(12))
    // reading THROUGH the sink's _spark_metadata log (spark.read on a file-
    // sink dir respects it): only committed batches are visible
    val afterKill = spark.read.parquet(out).count()
    assert(afterKill > 0, "no committed output before the kill")
    assert(afterKill < total,
      s"kill landed after completion ($afterKill of $total) — margin broken")
    val q2 = resumable().trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val result = spark.read.parquet(out)
    assert(result.count() == total,
      s"loss or replay across the kill: ${result.count()} vs $total")
    assert(result.select("event_id").distinct().count() == total,
      "duplicate event_ids — the restart replayed a committed batch")
  }

  test("RocksDB kill-restart: stateful dedup state survives through the checkpoint") {
    // r16 verdict follow-up: the mid-stream kill test above is stateless
    // (file-sink exactly-once only) and the RocksDB test below never
    // crashes. This leg composes them: dropDuplicatesWithinWatermark keeps
    // its seen-set in ROCKSDB state, the query dies abruptly mid-ingestion,
    // and after the restart the ENTIRE corpus re-arrives as duplicate
    // files — only a correctly RESTORED RocksDB checkpoint knows which
    // event_ids were already emitted. State loss would re-emit them
    // (count > total, duplicate ids); offset loss would drop or replay
    // committed batches. Exactly-one-row-per-event pins both.
    import org.apache.spark.sql.streaming.Trigger
    val stage = "/tmp/graft-rkill-stage"
    val src = "/tmp/graft-rkill-src"
    val out = "/tmp/graft-rkill-out"
    val cp = "/tmp/graft-rkill-cp"
    rmAll(stage, src, out, cp)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    raw.repartition(12).write.mode("overwrite").parquet(stage)
    val total = raw.count()
    val parts = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    new java.io.File(src).mkdirs()
    // only HALF the corpus is visible to the first run — the kill provably
    // lands before completion on any host speed (same margin construction
    // as the stateless kill test above)
    parts.take(6).foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(src, s"a-${f.getName}"))
    }
    def resumable() = EventStreams
      .readReplay(spark, src, "3650 days", maxFilesPerTrigger = 1)
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q1 = resumable().trigger(Trigger.ProcessingTime("10 milliseconds")).start()
      val deadline = System.currentTimeMillis() + 120000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
        "stream made no progress before the kill")
      // stop() abandons the in-flight batch but is still an ORDERLY
      // shutdown (RocksDB unloads on-thread) — restore-correctness only;
      // the mid-batch JVM-halt crash is the StreamCrashProbe rung below
      q1.stop()
      val afterKill = spark.read.parquet(out).count()
      assert(afterKill > 0, "no committed output before the kill")
      assert(afterKill < total,
        s"kill landed after completion ($afterKill of $total) — margin broken")
      // post-kill: the second half arrives, AND the first half RE-ARRIVES
      // as duplicate files — every already-emitted id must be suppressed
      // by the RESTORED state (a fresh state would re-emit them all)
      parts.drop(6).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(src, s"a-${f.getName}"))
      }
      parts.take(6).foreach { f =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(src, s"a-${f.getName}"),
          java.nio.file.Paths.get(src, s"b-${f.getName}"))
      }
      val q2 = resumable().trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      val result = spark.read.parquet(out)
      assert(result.count() == total,
        s"state or offset loss across the RocksDB restart: ${result.count()} vs $total")
      assert(result.select("event_id").distinct().count() == total,
        "duplicate event_ids — RocksDB dedup state did not survive the kill")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def rmAll(paths: String*): Unit = paths.foreach { p =>
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(p))
  }

  /** One raw-schema replay file (ts = ns-since-epoch long, like the fixture)
    * at `dir/name`. Rows: (event_id, minutes-offset, user, type, value). */
  private def writeRawFile(dir: String, name: String,
                           rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-03-01T10:00:00Z").getEpochSecond
    rows.map { case (id, mins, user, typ, v) =>
      (id, (base + mins * 60) * 1000000000L, user, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(s"$dir/$name")
    // flatten: the file source should see single files per step
    val sub = new java.io.File(s"$dir/$name")
    val part = sub.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    rmAll(sub.getPath)
  }

  test("late rows beyond the watermark are dropped from closed windows") {
    val src = "/tmp/graft-late-src"
    val out = "/tmp/graft-late-out"
    val cp = "/tmp/graft-late-cp"
    rmAll(src, out, cp)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def drain(): Unit = {
      val q = EventStreams.tumble(
          EventStreams.readReplay(spark, src, watermark = "10 minutes"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: two events in W1=[10:00,10:10) plus one at 12:00 — the batch
    // ends with watermark 11:50, far past W1's end, so W1 closes and emits
    writeRawFile(src, "a",
      Seq((1L, 1L, 7L, "click", 1.0), (2L, 2L, 7L, "click", 1.0),
        (3L, 120L, 7L, "click", 1.0)))
    drain()
    // run 2 (same checkpoint): a LATE event at 10:03 — 107 minutes behind
    // the restored watermark — plus 13:00 to advance the watermark and
    // flush the 12:00 window
    writeRawFile(src, "b", Seq((4L, 3L, 7L, "click", 1.0), (5L, 180L, 7L, "click", 1.0)))
    drain()
    val res = spark.read.parquet(out)
    val w1 = res.filter(col("w_start") === lit("2024-03-01 10:00:00").cast("timestamp"))
      .collect()
    assert(w1.length == 1, s"closed window must emit exactly once, got ${w1.length}")
    assert(w1.head.getAs[Long]("n") == 2,
      "the late row must NOT be counted into the closed window")
    // the in-time 12:00 event flushed normally in run 2
    val w12 = res.filter(col("w_start") === lit("2024-03-01 12:00:00").cast("timestamp"))
    assert(w12.count() == 1)
  }

  test("custom sessionization handles cross-trigger out-of-order events") {
    import org.apache.spark.sql.Dataset
    val src = "/tmp/graft-ooo-src"
    val cp = "/tmp/graft-ooo-cp"
    rmAll(src, cp)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // per user: the LAST foreachBatch emission is that user's full, current
    // session list (Update semantics) — accumulate latest-wins by user
    val acc = scala.collection.mutable.Map.empty[Long, Seq[EventStreams.SessionOut]]
    def drain(): Unit = {
      val q = EventStreams.sessionizeCustom(
          EventStreams.readReplay(spark, src, watermark = "3650 days"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (ds: Dataset[EventStreams.SessionOut], _: Long) =>
          ds.collect().groupBy(_.user_id)
            .foreach { case (u, rows) => acc(u) = rows.toSeq }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // trigger 1 (in order): sessions S1={10:00,10:05}, S2={10:40}, S3={11:30}
    writeRawFile(src, "a", Seq((1L, 0L, 7L, "click", 1.0), (2L, 5L, 7L, "click", 1.0),
      (3L, 40L, 7L, "click", 1.0), (4L, 90L, 7L, "click", 1.0)))
    drain()
    // trigger 2 (out of order): 09:00 opens an EARLIER session; 10:20
    // bridges S1↔S2 into one; 11:00 extends the merged session (and the
    // 11:00→11:30 gap is exactly 30 min — strict rule keeps S3 separate)
    writeRawFile(src, "b", Seq((5L, -60L, 7L, "click", 1.0),
      (6L, 20L, 7L, "click", 1.0), (7L, 60L, 7L, "click", 1.0)))
    drain()
    val base = java.time.Instant.parse("2024-03-01T10:00:00Z").getEpochSecond
    def ts(mins: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(base + mins * 60))
    val got = acc(7L).map(s => (s.s_start, s.n, s.sum_value)).sortBy(_._1.getTime)
    val want = Seq((ts(-60), 1L, 1.0), (ts(0), 5L, 5.0), (ts(90), 1L, 1.0))
    assert(got == want, s"expected $want, got $got")
  }

  test("sessionization evicts watermark-closed sessions and drops resurrection attempts") {
    import org.apache.spark.sql.Dataset
    val src = "/tmp/graft-evict-src"
    val cp = "/tmp/graft-evict-cp"
    rmAll(src, cp)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // latest emit per (user, session start): evicted sessions keep their
    // final version; a resurrected session would overwrite it with a
    // bigger n
    val acc = scala.collection.mutable.Map.empty[(Long, java.sql.Timestamp), (Long, Double)]
    def drain(): Unit = {
      val q = EventStreams.sessionizeCustom(
          EventStreams.readReplay(spark, src, watermark = "10 minutes"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (ds: Dataset[EventStreams.SessionOut], _: Long) =>
          ds.collect().foreach(r => acc((r.user_id, r.s_start)) = (r.n, r.sum_value))
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // drain 1: S1 = {10:00, 10:05}; 13:00 pushes the watermark to 12:50 —
    // far past S1's end + gap (10:35), so S1 is emitted finally and evicted
    writeRawFile(src, "a", Seq((1L, 0L, 7L, "click", 1.0), (2L, 5L, 7L, "click", 1.0),
      (3L, 180L, 7L, "click", 1.0)))
    drain()
    // drain 2: a sub-watermark event at 10:07 must NOT resurrect S1;
    // 13:05 extends the open 13:00 session normally
    writeRawFile(src, "b", Seq((4L, 7L, 7L, "click", 1.0), (5L, 185L, 7L, "click", 1.0)))
    drain()
    val base = java.time.Instant.parse("2024-03-01T10:00:00Z").getEpochSecond
    def ts(mins: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(base + mins * 60))
    assert(acc((7L, ts(0))) == ((2L, 2.0)),
      s"evicted session must keep its final (n=2) version, got ${acc((7L, ts(0)))}")
    assert(acc((7L, ts(180))) == ((2L, 2.0)),
      s"open session must keep growing, got ${acc((7L, ts(180)))}")
  }

  test("flatMapGroupsWithState sessionization == session_window aggregation") {
    val st = EventStreams.runToTable(
      EventStreams.sessionizeCustom(EventStreams.readEvents(spark, dir)).toDF(),
      "t_custom_session", OutputMode.Update)
    // Update mode re-emits a session each time it grows: keep the final emit
    // per (user, s_start) — the one with the max event count
    val last = st.groupBy("user_id", "s_start")
      .agg(max(struct(col("n"), col("sum_value"))).as("m"))
      .select(col("user_id"), col("s_start"), col("m.n").as("n"),
        col("m.sum_value").as("sum_value"))
    assertSame(last, Streams.q_stream_session(spark, dir), "custom session")
  }

  test("RocksDB state store: stateful queries == batch (off-heap state rung)") {
    // r15 verdict #6: the default state store holds sessionization state
    // on the executor heap — a 100 TB pipeline's keyed state doesn't fit.
    // Same transforms, state provider swapped to RocksDB (ships in Spark's
    // jars); output must be provider-independent.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // windowed aggregation state (tumble) under RocksDB
      val st = EventStreams.runToTable(
        EventStreams.tumble(EventStreams.readEvents(spark, dir)),
        "t_tumble_rocks", OutputMode.Complete)
      assertSame(st, Streams.q_stream_tumble(spark, dir), "rocksdb tumble")
      // custom flatMapGroupsWithState session state under RocksDB
      val cs = EventStreams.runToTable(
        EventStreams.sessionizeCustom(EventStreams.readEvents(spark, dir)).toDF(),
        "t_custom_session_rocks", OutputMode.Update)
      val last = cs.groupBy("user_id", "s_start")
        .agg(max(struct(col("n"), col("sum_value"))).as("m"))
        .select(col("user_id"), col("s_start"), col("m.n").as("n"),
          col("m.sum_value").as("sum_value"))
      assertSame(last, Streams.q_stream_session(spark, dir), "rocksdb session")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("JVM-halt crash: exactly-once through a RocksDB checkpoint severed mid-batch (separate JVMs)") {
    // r17 verdict #2: the stop()-based legs above prove checkpoint RESTORE
    // but run Spark's orderly shutdown — a regression that only corrupts
    // RocksDB state on a true hard crash (no shutdown hooks, commit torn
    // mid-write) would slip past them. StreamCrashProbe is the
    // RetryProbe/ExecutorLossProbe halt pattern applied to streaming: a
    // child JVM Runtime.halt(137)s from INSIDE a task mid-batch-3 of a
    // RocksDB-backed dedup (checkpoint left with offsets == commits + 1 —
    // a provably torn in-flight batch), then a fresh JVM restarts against
    // the severed checkpoint with the whole first half re-arriving as
    // duplicates, and requires corpus-exact, duplicate-free output.
    // Own JVMs for the same reason as RetryProbe.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val outFile = Files.createTempFile("graft_stream_crash_probe", ".out").toFile
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList.sliding(2).collect {
        case List(flag, v) if flag == "--add-opens" || flag == "--add-exports" =>
          List(flag, v)
      }.flatten.toList
    val p = new ProcessBuilder(
      (List(javaBin) ++ jvmArgs ++ List("-Xmx3g",
        "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.StreamCrashProbe")).asJava)
      .redirectErrorStream(true)
      .redirectOutput(outFile)
      .start()
    assert(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS), "probe timed out")
    val out = new String(Files.readAllBytes(outFile.toPath))
    assert(p.exitValue() == 0, s"stream-crash probe failed:\n${out.takeRight(3000)}")
    assert(out.contains("STREAMCRASH OK"), s"no verdict:\n${out.takeRight(1500)}")
    // the checkpoint must have been genuinely severed, not cleanly stopped
    val sev = "severed_offsets=(\\d+) severed_commits=(\\d+)".r
      .findFirstMatchIn(out).map(m => (m.group(1).toInt, m.group(2).toInt))
    assert(sev.exists { case (o, c) => o == c + 1 && c >= 2 },
      s"no torn in-flight batch attested: $sev\n${out.takeRight(1000)}")
  }
}
