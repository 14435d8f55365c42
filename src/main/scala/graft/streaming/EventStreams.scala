package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.ops.Streams

/** Structured Streaming execution of the §2.9 window queries (SURVEY §2.9).
  *
  * The events fixture replays through Spark's file streaming source
  * (`readStream.parquet`) with an event-time watermark; the window transforms
  * are THE SAME functions the batch queries use (Streams.tumbleAgg & co), so
  * batch-equivalence is a property of the engine, not of parallel
  * implementations. StreamingSpec asserts streaming output == batch output
  * row-for-row.
  *
  * Scale: stateful aggregation state is keyed by (window, group) — state
  * store partitioning follows the shuffle partitioning; the watermark bounds
  * state (windows older than watermark - gap are evicted). At 100 TB/day the
  * knobs are shuffle partitions and watermark delay; nothing here holds
  * per-key state proportional to history.
  */
object EventStreams {

  /** The file streaming source needs a DECLARED schema, and `events.ts`
    * storage has shipped in two fixture generations (TIMESTAMP(NANOS) read
    * as ns-longs via the legacy escape hatch, and native TIMESTAMP(MICROS)
    * read as TIMESTAMP_NTZ — see graft.Tables). Sniff the stored type from
    * a one-off batch footer read, declare it, then normalize with the SAME
    * helper the batch loader uses, so streaming == batch by construction. */
  private def rawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Stored type of `ts` in the parquet under `path` (footer-only read). */
  private def tsStorage(spark: SparkSession, path: String,
                        glob: Option[String]): DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = glob.foldLeft(spark.read)((r, g) => r.option("pathGlobFilter", g))
    reader.parquet(path).schema("ts").dataType
  }

  /** Streaming source over the fixture dir, watermarked on event time. */
  def readEvents(spark: SparkSession, dir: String,
                 watermark: String = "1 hour"): DataFrame = {
    // events.parquet is a single file; the file streaming source monitors a
    // DIRECTORY, so stream the fixture dir filtered down to that one file
    val raw = spark.readStream
      .schema(rawSchema(tsStorage(spark, dir, Some("events.parquet"))))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeEventTs(raw).withWatermark("ts", watermark)
  }

  /** Streaming source over a REPLAY directory of many small parquet files,
    * throttled to `maxFilesPerTrigger` files per micro-batch — the
    * multi-trigger path that actually exercises state continuity across
    * batches (one AvailableNow batch over a single file never does). Replay
    * order is arbitrary, so callers pick a watermark wide enough for their
    * assertion (batch-equivalence tests use an effectively-infinite one). */
  def readReplay(spark: SparkSession, replayDir: String,
                 watermark: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val raw = spark.readStream
      .schema(rawSchema(tsStorage(spark, replayDir, None)))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(replayDir)
    graft.Tables.normalizeEventTs(raw).withWatermark("ts", watermark)
  }

  /** Streaming JSONL ingest — the corpus-drop path: new `.jsonl` files
    * landing in a directory stream in with an APPLIED schema (inference
    * would re-scan history per trigger) and watermark on event time. Pairs
    * with convert.Jsonl for the batch edges; streaming == batch asserted
    * in StreamingSpec. */
  def readJsonl(spark: SparkSession, dir: String,
                schema: StructType, tsCol: String,
                watermark: String = "1 hour",
                maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .withWatermark(tsCol, watermark)

  def tumble(events: DataFrame): DataFrame = Streams.tumbleAgg(events)
  def slide(events: DataFrame): DataFrame = Streams.slideAgg(events)
  def session(events: DataFrame): DataFrame = Streams.sessionAgg(events)

  /** Stateful stream dedup: drops events whose `event_id` was already seen
    * within the watermark window (state is bounded by the watermark — exact
    * dedup within it, at-most-once eviction after it). */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-stream interval SELF-join: per user, every (event a, event b)
    * pair with b in (a.ts, a.ts + 1h] — the same semantics as the batch
    * theta join (Relational.q_join_theta), which StreamingSpec asserts
    * equality against. Both sides carry the source watermark and the join
    * condition bounds event-time both ways, so each side's buffered state
    * is evicted once the watermark passes ts + 1h — bounded state, keyed
    * shuffle on user_id, the canonical Structured Streaming join shape. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val a = events.select(col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = events.select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b, col("a_user") === col("b_user") &&
      col("b_ts") > col("a_ts") &&
      col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Stream-stream interval LEFT OUTER self-join: like [[intervalJoin]]
    * but an event with NO successor inside its hour emits null-padded —
    * the "did anything follow?" enrichment shape. An unmatched row can
    * only be emitted once the WATERMARK passes its join-window end
    * (a_ts + 1h): before that the stream cannot know no match is coming.
    * Rows whose window is still open when the input is exhausted stay
    * withheld — that is the streaming delivery contract, and the
    * StreamingSpec equality asserts exactly it: matched rows equal the
    * batch join everywhere; unmatched rows equal the batch join's
    * null-padded rows restricted to watermark-closed windows. */
  def intervalJoinOuter(events: DataFrame): DataFrame = {
    val a = events.select(col("user_id").as("a_user"), col("ts").as("a_ts"),
      col("event_id").as("a_event"))
    val b = events.select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b, col("a_user") === col("b_user") &&
      col("b_ts") > col("a_ts") &&
      col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
  }

  // ---- custom per-user session state via flatMapGroupsWithState ----

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionOut(user_id: Long, s_start: java.sql.Timestamp, n: Long,
                        sum_value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: BigDecimal)

  /** 30-minute-gap sessionization with custom state — the
    * flatMapGroupsWithState surface SURVEY §2.9 commits to. State is the
    * user's session list ordered by start time; every incoming event is
    * INSERTED at its event-time position and any sessions the gap rule now
    * connects are merged — so out-of-order arrivals (within the watermark,
    * including across triggers: an event that lands inside an earlier span,
    * extends a session backwards, or bridges two existing sessions) converge
    * to the same result as `session_window`, which assigns by event time
    * regardless of arrival order. Each trigger re-emits the group's full
    * session list (Update semantics: downstream keeps the last version; a
    * merge supersedes its source sessions' earlier emits). Value sums use
    * 2-decimal BigDecimal — the same rounding as the batch query's
    * cast(value AS DECIMAL(10,2)) — so results are order-independent.
    *
    * State is WATERMARK-BOUNDED (EventTimeTimeout): sessions whose
    * end + gap falls behind the watermark get their final emit and leave
    * the state; a group with no open sessions evicts entirely when its
    * timeout fires; sub-watermark arrivals are dropped so an evicted
    * session can't resurrect. Per-key memory is O(open sessions within
    * the watermark horizon), not O(history). */
  def sessionizeCustom(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    val gapUs = gapMs * 1000
    // timestamps are carried as MICROsecond epoch longs — Timestamp.getTime
    // is millis and would truncate the fixture's µs precision
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    // insert one event into the start-ordered session list, then sweep once
    // merging neighbors the gap rule connects (strict <, matching both
    // session_window and the batch oracle's `ts - lag(ts) >= gap` cut).
    // O(k log k) for k sessions in state — k is small (bounded by actual
    // session count per user, and by the watermark horizon at scale).
    def insert(sessions: List[SessionState], t: Long, v: BigDecimal): List[SessionState] =
      (SessionState(t, t, 1, v) :: sessions).sortBy(_.start)
        .foldLeft(List.empty[SessionState]) { (acc, s) =>
          acc match {
            case prev :: rest if s.start - prev.lastTs < gapUs =>
              SessionState(prev.start, math.max(prev.lastTs, s.lastTs),
                prev.n + s.n, prev.sum + s.sum) :: rest
            case _ => s :: acc
          }
        }.reverse
    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // the watermark passed every session's end + gap: all final and
            // already emitted on the trigger that closed them — just free
            // the state (THIS is what bounds per-key memory at scale)
            state.remove()
            Iterator.empty
          } else {
            val wmUs = state.getCurrentWatermarkMs() * 1000
            val init = state.getOption.getOrElse(Nil)
            // drop sub-watermark arrivals explicitly (watermark semantics:
            // a closed-and-evicted session must not resurrect)
            val sessions = it.filter(e => micros(e.ts) >= wmUs).foldLeft(init) {
              (acc, e) => insert(acc, micros(e.ts),
                BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP))
            }
            // sessions the watermark already closed get their final emit
            // this trigger and leave the state
            val open = sessions.filterNot(ss => ss.lastTs + gapUs <= wmUs)
            if (open.nonEmpty) {
              state.update(open)
              // +1 ms: the µs→ms floor could otherwise land exactly ON the
              // watermark, which setTimeoutTimestamp rejects
              state.setTimeoutTimestamp(open.map(_.lastTs).max / 1000 + gapMs + 1)
            } else state.remove()
            sessions.iterator.map(ss => SessionOut(user,
              toTs(ss.start), ss.n, ss.sum.toDouble))
          }
      }
  }

  /** Drain a streaming DataFrame through an in-memory sink (AvailableNow:
    * process the whole fixture, then stop) and return the materialized
    * result. `Complete` for windowed aggs; `Update` for stateful ops —
    * callers then keep the LAST emit per key. */
  def runToTable(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
