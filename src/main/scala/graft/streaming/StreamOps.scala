package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.8: the reference is
  * batch-only by declaration — `streaming=False` — but a complete
  * engine exposes streaming twins of the same transforms).
  *
  * Design: every transform here is the SAME logical operation as its
  * batch counterpart (Scalars.q22TimeWindow etc.) applied to an
  * unbounded DataFrame — Spark plans it incrementally. Watermarks
  * bound state; output modes choose replay semantics.
  *
  * Scale: windowed aggregation state is per (window × key), pruned by
  * the watermark; `transformWithState`-style per-key state (here
  * mapGroupsWithState) shuffles once on the key and holds O(active
  * keys) state in the state store — at production scale backed by
  * RocksDB + changelog checkpointing to object storage.
  */
object StreamOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** File stream source over an events-shaped directory (parquet).
    * `maxFilesPerTrigger` paces re-processing of large backlogs. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "16")
      .parquet(dir)

  /** Tumbling-window event counts with a watermark — the streaming
    * twin of the batch hour×type aggregate (Scalars.q22TimeWindow).
    * Late rows beyond the watermark are dropped; in append mode a
    * window emits exactly once, when the watermark passes its end. */
  def windowedCounts(events: DataFrame,
      watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window variant (overlapping windows). */
  def slidingCounts(events: DataFrame,
      watermark: String = "10 minutes",
      window: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Custom per-key state: running per-user totals via
    * mapGroupsWithState (update mode). State lives in the state store,
    * one entry per active user. */
  def runningUserTotals(spark: SparkSession, events: Dataset[Event]): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(userId, n, v)
          state.update(next)
          next
      }
  }

  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Event-time sessionization with a custom state machine —
    * flatMapGroupsWithState + EventTimeTimeout, the fully-controlled
    * sibling of the built-in `session_window` aggregate (q40's batch
    * twin; same boundary rule: an event at `last + gap` starts a NEW
    * session, `session_end = last + gap`).
    *
    * A session is emitted when the watermark passes its close (the
    * state times out) — exactly-once per session in append mode, which
    * is what a downstream training-data pipeline wants (no partial
    * session ever lands twice). State per key = ONE open session
    * (start, last, n, Σvalue); the shuffle is one exchange on user_id
    * and the state store holds O(active users), RocksDB-backed in
    * production.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int = 30, watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    def emit(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.last + gapMs), s.n, s.total)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            // events within one micro-batch arrive unordered
            val sorted = batch.toArray.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer[SessionState]()
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t < s.last + gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += s
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout fires when the watermark passes session close;
              // clamp above the current watermark (required by Spark)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map(emit(userId, _))
          }
      }
  }

  /** Streaming exact dedup: drop rows whose key was already seen,
    * with state bounded by the watermark (a key older than the
    * watermark can be forgotten — the streaming twin of
    * `Dedup.exact`). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Run a streaming frame to completion against a bounded source and
    * return the in-memory result table (local smoke harness: batch
    * parquet driving the incremental plan). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
