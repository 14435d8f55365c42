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
}
