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

  /** The same running totals on the transformWithState API — Spark 4's
    * successor to mapGroupsWithState: state is a set of NAMED, typed
    * state variables (here one ValueState) managed by a
    * StatefulProcessor, which composes multiple states, TTL, and
    * timers per key. Requires the RocksDB state store provider (the
    * API is implemented only there). Kept alongside the
    * mapGroupsWithState form: same semantics, tested equal. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserRunning] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      val (n0, v0) = if (totals.exists()) totals.get() else (0L, 0.0d)
      val (n, v) = rows.foldLeft((n0, v0)) {
        case ((cn, cv), e) => (cn + 1, cv + e.value)
      }
      totals.update((n, v))
      Iterator.single(UserRunning(key, n, v))
    }
  }

  def runningUserTotalsTws(spark: SparkSession,
      events: Dataset[Event]): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** One session, times in event-time MICROS (java.sql.Timestamp's
    * getTime is ms-truncated; micros preserve Spark timestamp
    * precision so the batch session_window twin agrees exactly). */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionList(open: Seq[SessionState])
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Event-time sessionization with a custom state machine —
    * flatMapGroupsWithState + EventTimeTimeout, the fully-controlled
    * sibling of the built-in `session_window` aggregate (q40's batch
    * twin; same boundary rule: an event at `last + gap` starts a NEW
    * session, `session_end = last + gap`).
    *
    * State per key is the LIST of not-yet-expired sessions, not just
    * the latest: an out-of-order event that is above the watermark but
    * older than the newest session must be able to extend an earlier
    * session backwards, merge two sessions it bridges, or open its own
    * — exactly what batch session_window computes. A session is
    * emitted when the watermark passes its close (event-time timeout)
    * — exactly-once per session in append mode, which is what a
    * downstream training-data pipeline wants. State is O(sessions
    * inside the watermark horizon) per active key; the shuffle is one
    * exchange on user_id, RocksDB-backed in production.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int = 30, watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    // local helpers: the state closure must not capture the StreamOps
    // module (not Serializable); Timestamp getTime is ms-truncated so
    // times are tracked in event-time micros
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def emit(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, fromMicros(s.start), fromMicros(s.last + gapUs), s.n, s.total)
    // insert an event and re-merge: sessions are kept sorted by start;
    // adjacent sessions closer than the gap collapse into one
    def insert(open: Seq[SessionState], t: Long, v: Double): Seq[SessionState] = {
      val sorted = (open :+ SessionState(t, t, 1L, v)).sortBy(s => (s.start, s.last))
      sorted.tail.foldLeft(List(sorted.head)) { (acc, s) =>
        val h = acc.head
        if (s.start < h.last + gapUs)
          SessionState(h.start, math.max(h.last, s.last),
            h.n + s.n, h.total + s.total) :: acc.tail
        else s :: acc
      }.reverse
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionList]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val open = state.getOption.map(_.open).getOrElse(Nil)
          val merged = batch.foldLeft(open)((acc, e) => insert(acc, micros(e.ts), e.value))
          // a session whose close the watermark has passed can never be
          // extended again (admitted events have ts >= watermark)
          val (expired, live) = merged.partition(_.last + gapUs <= wmUs)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessionList(live))
            // fire when the earliest live session expires; clamp above
            // the current watermark (required by Spark)
            state.setTimeoutTimestamp(math.max(
              live.map(_.last + gapUs).min / 1000L, state.getCurrentWatermarkMs() + 1))
          }
          expired.sortBy(_.start).iterator.map(emit(userId, _))
      }
  }

  /** One (key, idx) observation for [[fillForwardStream]]; `cents` is
    * the exact-integer value channel (the q72 rule — no float enters
    * carried state), None = a gap to fill. */
  final case class FillIn(user_id: Long, idx: Long, cents: Option[Long])
  /** [[fillForwardStream]] output: the row's forward-filled value
    * (None until the key's first non-null). */
  final case class FillOut(user_id: Long, idx: Long, fill_cents: Option[Long])
  /** [[fillForwardStream]] state: one carried cell per key. */
  final case class FillState(last: Option[Long])

  /** Streaming forward fill — the stateful twin of q53's IGNORE-NULLS
    * running window and of `TimeSeries.resample`'s `filled` column:
    * each row emits the last non-null value at or before it, carrying
    * ONE (last value) cell per key in the state store regardless of
    * stream length. Values are exact integer cents (q72's no-float
    * rule), so batch and stream agree bit-for-bit. Contract: per-key
    * arrival is in `idx` order ACROSS batches (the transitionsStream
    * contract — a replay/out-of-order-tolerant fill needs the
    * watermarked buffer of `sessionize`, not a one-cell carry); within
    * a batch rows sort by idx before folding, so intra-batch order is
    * free. */
  def fillForwardStream(spark: SparkSession,
      rows: Dataset[FillIn]): Dataset[FillOut] = {
    import spark.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[FillState, FillOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[FillIn], state: GroupState[FillState]) =>
          var last = state.getOption.getOrElse(FillState(None)).last
          val out = batch.toSeq.sortBy(_.idx).map { r =>
            if (r.cents.isDefined) last = r.cents
            FillOut(key, r.idx, last)
          }
          state.update(FillState(last))
          out.iterator
      }
  }

  /** Streaming exact dedup: drop rows whose key was already seen,
    * with state bounded by the watermark (a key older than the
    * watermark can be forgotten — the streaming twin of
    * `Dedup.exact`). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Streaming twin of the SIGNATURE operator — the dead-letter
    * enforcement split (Enforce.split, the reference's E1/E2) applied
    * per micro-batch: ok rows land under `okDir/batch=<id>`, failed
    * rows as dead-letter JSON lines under `deadDir/batch=<id>`. The
    * split itself is stateless (one error column, two filters), so the
    * batch operator runs UNCHANGED; per-batch `overwrite` into
    * batch=<id> dirs makes replays idempotent (the
    * incrementalDedupStream pattern) — foreachBatch's at-least-once
    * becomes exactly-once end-to-end. */
  def enforceStream(spark: SparkSession, stream: DataFrame,
      schema: Seq[graft.engine.Enforce.FieldSpec], pkCol: String,
      okDir: String, deadDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the two sinks are separate actions over the same validated
        // frame — pin it so the source scan + error tagging run once,
        // and release only THIS batch's pins (scoped: a concurrent
        // graft stream's in-flight frames stay untouched)
        graft.Caches.scoped {
          val b = graft.Caches.pin(batch.toDF())
          val (ok, dead) = graft.engine.Enforce.split(b, schema)
          ok.write.mode("overwrite").parquet(s"$okDir/batch=$batchId")
          graft.engine.Enforce.deadLetterJson(dead, pkCol)
            .write.mode("overwrite").text(s"$deadDir/batch=$batchId")
        }
        ()
      }
      .start()
  }

  final case class HeavyState(sketch: Map[String, Long], total: Long)
  final case class CandidateWeight(token: String, weight: Long)
  final case class HeavyHitters(lang: String, n_tokens: Long,
      candidates: Seq[CandidateWeight])

  /** Streaming heavy-hitter tokens — the streaming twin of the batch
    * two-pass sketch query (t76), with the SAME Misra-Gries transition
    * function ([[graft.functions.MisraGries]].reduce) driving per-key
    * state: each group's state is the bounded (≤ capacity entries)
    * summary plus the running token total, so the state store holds
    * O(groups × capacity) regardless of stream length — never the
    * token stream itself.
    *
    * Each micro-batch emits the group's current candidate list with
    * summary weights (update mode). MG's guarantee carries over
    * unchanged because the reduce is order-insensitive w.r.t. the
    * bound: true_count − n/(capacity+1) ≤ weight ≤ true_count, so any
    * token with frequency above n/(capacity+1) IS present; weights of
    * surviving candidates are exact when distinct tokens ≤ capacity.
    * Exact-verification downstream is the batch twin's re-count over
    * the candidate set (t76's pass 2). */
  def heavyHittersStream(spark: SparkSession, tokens: DataFrame,
      capacity: Int = 64): DataFrame = {
    import spark.implicits._
    val mg = new graft.functions.MisraGries(capacity)
    tokens.select(col("lang"), col("token")).as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[HeavyState, HeavyHitters](GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[(String, String)],
            state: GroupState[HeavyState]) =>
          val buf = scala.collection.mutable.Map.empty[String, Long]
          state.getOption.foreach(s => buf ++= s.sketch)
          var n = state.getOption.map(_.total).getOrElse(0L)
          rows.foreach { case (_, tok) => mg.reduce(buf, tok); n += 1 }
          state.update(HeavyState(buf.toMap, n))
          HeavyHitters(lang, n,
            buf.toSeq.sortBy { case (t, w) => (-w, t) }
              .map { case (t, w) => CandidateWeight(t, w) })
      }.toDF()
  }

  /** Per-user carry-over state: only the last event TYPE — cross-batch
    * event-time order is an input contract (see transitionsStream's
    * exactness note), not something the state validates, so storing
    * timestamps/ids here would be dead state-store bytes per key. */
  final case class LastEvent(eventType: String)
  final case class Transition(user_id: Long, prev_type: String,
      next_type: String)

  /** Streaming per-user transition extraction — the stateful half of
    * the Markov transition matrix (g02's batch lag window re-expressed
    * as O(1)-per-user state): state is ONLY the user's last event
    * TYPE ([[LastEvent]] — slimmed from the original timestamp+id+type
    * record; note this was a state-ENCODER schema change, so a stream
    * checkpointed against the old three-field state cannot restore —
    * running streams must restart from a fresh checkpoint), each
    * micro-batch sorts its own rows by the batch twin's
    * (ts, event_id) order, chains them behind the remembered last
    * event, and emits one (prev → next) row per consecutive pair. Append mode; downstream counting is an ordinary
    * aggregation (Spark restricts stateful-after-stateful, so the
    * count lives in the consumer — the test aggregates the memory
    * sink).
    *
    * Exactness contract: equals the batch lag window when each user's
    * events arrive in event-time order ACROSS micro-batches (in-batch
    * disorder is repaired by the sort). A cross-batch straggler would
    * need the full event history to splice into place — that is the
    * batch twin's job; this operator is the forward-only streaming
    * approximation every event-sequence pipeline runs. */
  def transitionsStream(spark: SparkSession,
      events: Dataset[Event]): Dataset[Transition] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = rows.toArray.sortBy(e =>
            (e.ts.getTime, e.ts.getNanos, e.event_id))
          val types = state.getOption.map(_.eventType).toList :::
            sorted.map(_.event_type).toList
          if (sorted.nonEmpty) {
            val l = sorted.last
            state.update(LastEvent(l.event_type))
          }
          types.zip(types.drop(1)).iterator
            .map { case (a, b) => Transition(uid, a, b) }
      }
  }

  /** Streaming count-min sketch — the twin of
    * `TextAnalysis.cmSketch`, and the op where the mergeable-summary
    * property pays twice: the d×w cell table is an ordinary groupBy
    * count, so Spark maintains it INCREMENTALLY per micro-batch (the
    * state store holds d·w counters, nothing grows with the stream),
    * and the batch and streaming constructions are the same
    * aggregation — complete-mode output equals the batch sketch over
    * the same tokens (pinned in StreamingSpec). `tokens` needs a
    * `token` string column. */
  def cmSketchStream(tokens: DataFrame, d: Int = 4, w: Int = 64): DataFrame = {
    import graft.operators.TextHash
    require(d >= 1 && d <= TextHash.A.size, s"d must be in [1, ${TextHash.A.size}]")
    require(w >= 1, s"w must be positive, got $w")
    // one micro-batch pass with the d rows exploded from an inline
    // array, not a d-branch unionAll — the same fusion as the batch
    // twin (TextAnalysis.cmSketchFromCounts, r20): the union scanned
    // the batch d times and re-hashed per branch. ComputeOnce keeps
    // the costly hash from being inlined into each struct leg.
    val hashed = tokens.select(
      graft.functions.ComputeOnce.once(
        TextHash.polyHashFast(col("token"))).as("hh"))
    hashed.select(explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("row_idx"),
          ((col("hh") * TextHash.A(i) + TextHash.B(i)) % TextHash.P % w)
            .as("bucket"))
      }: _*)).as("rb"))
      .select(col("rb.row_idx").as("row_idx"), col("rb.bucket").as("bucket"))
      .groupBy(col("row_idx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming portable HyperLogLog — the twin of t90's batch sketch,
    * and the same mergeable-summary payoff as `cmSketchStream`: the
    * register table IS an incremental (lang, reg) → max(rho)
    * aggregation, so Spark maintains it per micro-batch with bounded
    * state (64 registers per group, nothing grows with the stream),
    * and complete-mode output equals the batch construction over the
    * same tokens (pinned in StreamingSpec). The estimate is a
    * downstream stateless projection — consumers fold the register
    * table exactly as the batch query does. `tokens` needs (lang,
    * token) string columns. */
  def hllStream(tokens: DataFrame): DataFrame = {
    import graft.operators.TextHash
    // the shared register construction (Sketches.RhoCaseSql) — one
    // text for batch t90, rolling t98 and this streaming twin
    val rhoCase = graft.operators.Sketches.RhoCaseSql
    tokens
      .select(col("lang"), TextHash.polyHashFast(col("token")).as("h"))
      .select(col("lang"), pmod(col("h"), lit(64L)).as("reg"),
        expr("h div 64").as("w"))
      .select(col("lang"), col("reg"), expr(rhoCase).as("rho"))
      .groupBy(col("lang"), col("reg"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Watermarked stream-stream interval join — the streaming twin of
    * `Interval.joinLookback` (q41): right-side rows of the same key
    * within `lookbackSec` BEFORE a left row. Both sides carry
    * watermarks and the join condition bounds the event-time distance,
    * which is exactly what lets Spark expire state: a buffered right
    * row older than watermark + lookback can never match again and is
    * dropped from the state store. Inner join: a pair emits as soon as
    * both rows have arrived (no watermark wait), append mode.
    * Output matches the batch operator: (user_id, left id, right id,
    * lag_us). */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      leftIdOut: String, rightIdOut: String,
      watermark: String = "30 minutes", lookbackSec: Long = 1800L): DataFrame = {
    require(lookbackSec > 0, s"lookback must be positive seconds, got $lookbackSec")
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as(leftIdOut), col("user_id"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as(rightIdOut),
        col("user_id").as("r_user"), col("ts").as("r_ts"))
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookbackSec SECONDS") &&
          col("r_ts") <= col("l_ts"))
      .select(col("user_id"), col(leftIdOut), col(rightIdOut),
        (unix_micros(col("l_ts")) - unix_micros(col("r_ts"))).as("lag_us"))
  }

  /** Continuous-ingest NEAR-dup curation: each micro-batch dedups
    * against the standing corpus index (`Dedup.dedupAgainstIndex` —
    * the batch operator, unchanged), writes every batch doc annotated
    * with its duplicate verdict, and extends the index with the
    * batch's novel docs. The cross-batch state is the index itself,
    * far too large for the state store, so this is `foreachBatch`
    * over parquet index storage rather than `mapGroupsWithState`:
    * the streaming twin of d55.
    *
    * In-batch duplicates resolve first (`nearDuplicates` within the
    * batch; a doc matching a smaller-id batch doc is a dup), then
    * survivors check the index; only docs matching neither join the
    * index. Every write is `overwrite` into a `batch=<id>` directory,
    * so a replayed micro-batch (restart after failure) rewrites the
    * same paths — idempotent, which is what makes foreachBatch's
    * at-least-once delivery exactly-once end-to-end. Production swaps
    * the directory scheme for a transactional table format and
    * bucket-partitions the index by (band, bucket); the per-batch
    * logic is identical.
    *
    * Output rows at `outDir`: (doc_id, matched_id nullable, is_dup).
    * Index at `indexDir/{buckets,sets}/batch=<id>/`. */
  def incrementalDedupStream(spark: SparkSession, docs: DataFrame,
      indexDir: String, outDir: String, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        dedupBatch(spark, batch.toDF(), batchId, indexDir, outDir, threshold)
      }
      .start()
  }

  /** One micro-batch of [[incrementalDedupStream]], exposed so replay
    * idempotence is directly testable: calling it twice with the same
    * `batchId` must produce identical verdicts and index content.
    *
    * Replay safety hinges on the index load below EXCLUDING the
    * current batch's own `batch=<id>` partitions: a batch that died
    * after writing its index dirs but before the checkpoint committed
    * is re-run by foreachBatch, and without the exclusion the replay
    * would read its own docs back from the index — every previously-
    * novel doc self-matches (jaccard 1.0), verdicts flip to is_dup,
    * and the now-empty novel set overwrites the index partition with
    * nothing. Partition pruning means the excluded dirs are never even
    * opened. */
  private[graft] def dedupBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, indexDir: String, outDir: String,
      threshold: Double): Unit = graft.Caches.scoped {
    val b = batch.select(col("doc_id"), col("text"))
      .transform(d => graft.Caches.pin(d))
    val inBatch = graft.operators.Dedup
      .nearDuplicates(b, col("doc_id"), col("text"), threshold = threshold)
      .select(col("b").as("doc_id"), col("a").as("matched_id"))
    // explicit existence check (not a swallowed read failure): a
    // missing path is the legitimate first-batch state; anything
    // else — corrupt files, bad schema — must fail the batch
    val bucketsPath = new org.apache.hadoop.fs.Path(s"$indexDir/buckets")
    val fs = bucketsPath.getFileSystem(spark.sessionState.newHadoopConf())
    val crossBatch =
      if (!fs.exists(bucketsPath)) inBatch.limit(0)
      else {
        // parquet-loaded state uses the default build parameters —
        // the same ones the novel-doc buildDedupIndex below signs
        // with. `batch` is the partition-discovery column from the
        // batch=<id> dir scheme; dropping the current id is the
        // replay-idempotence guard documented above.
        val idx = graft.operators.Dedup.DedupIndex(
          spark.read.parquet(s"$indexDir/buckets")
            .filter(col("batch") =!= batchId)
            .select("doc_id", "band", "bucket"),
          spark.read.parquet(s"$indexDir/sets")
            .filter(col("batch") =!= batchId)
            .select("doc_id", "s"),
          n = graft.operators.Dedup.DefaultShingleN,
          k = graft.operators.Dedup.DefaultMinhashK,
          bands = graft.operators.Dedup.DefaultBands)
        graft.operators.Dedup
          .dedupAgainstIndex(idx, b, col("doc_id"), col("text"),
            threshold = threshold)
          .select(col("delta_id").as("doc_id"),
            col("corpus_id").as("matched_id"))
      }
    // deterministic verdict: the smallest matching id wins
    val dups = inBatch.unionByName(crossBatch)
      .groupBy(col("doc_id")).agg(min(col("matched_id")).as("matched_id"))
    b.join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("matched_id"),
        col("matched_id").isNotNull.as("is_dup"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    val novel = b.join(dups, Seq("doc_id"), "left_anti")
    val novelIdx = graft.operators.Dedup
      .buildDedupIndex(novel, col("doc_id"), col("text"))
    novelIdx.buckets.write.mode("overwrite")
      .parquet(s"$indexDir/buckets/batch=$batchId")
    novelIdx.sets.write.mode("overwrite")
      .parquet(s"$indexDir/sets/batch=$batchId")
    // scoped release (the enclosing Caches.scoped): the dedup
    // operators' pinned shingle frames and this batch's pin drop at
    // batch end — and ONLY this batch's: a global releaseAll here
    // would unpersist a concurrent graft stream's lineage-truncated
    // checkpoints mid-flight (killing its next action), and a
    // session-wide clearCache() would evict co-tenant caches.
    ()
  }

  /** Incremental multi-source frontier expansion over STREAMING edges —
    * the streaming twin of `Graph.nearestSeedLabels` (and of
    * `bfsDistances` when labels are ignored): edges arrive in
    * micro-batches, and after every batch the state table equals the
    * batch operator run over ALL edges seen so far. That equality is
    * exact in ANY arrival order because the per-node value
    * (dist, label) is a pure MIN-LATTICE: merge is idempotent,
    * commutative, associative, so incremental relaxation and the batch
    * fixpoint meet at the same table (the reason the deterministic
    * nearest-seed semantics — not `labelPropagate`'s round-dependent
    * majority vote — is the streamable one).
    *
    * The cross-batch state (distance table + accumulated edge set) is
    * graph-sized — far too large for the state store — so this is
    * `foreachBatch` over parquet state partitions, the
    * [[incrementalDedupStream]] architecture: every write is
    * `overwrite` into a `batch=<id>` directory and every read excludes
    * the current batch's own partitions, so a replayed micro-batch
    * rewrites identical paths — idempotent, making at-least-once
    * delivery exactly-once end-to-end. State reads min-merge across
    * partitions (an improvement row in a later partition supersedes by
    * lattice order, it never has to rewrite the older partition).
    * Production compacts old partitions periodically and
    * bucket-partitions both tables by id; the per-batch logic is
    * identical.
    *
    * Per-batch cost: improvements cascade only through the AFFECTED
    * region (each relaxation round joins the improvement frontier —
    * not the full table — against the edge set), which is the
    * incremental-BFS cost model; the full-table min-merge scan per
    * batch is the read-side price of append-only state. */
  def incrementalBfsStream(spark: SparkSession, edges: DataFrame,
      seeds: DataFrame, maxHops: Int, stateDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    edges.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        bfsBatch(spark, batch.toDF(), batchId, seeds, maxHops, stateDir)
      }
      .start()
  }

  /** The stream's current (id, dist, label) table: min-merge over
    * every `batch=<id>` state partition. Empty before the first
    * batch. */
  def bfsState(spark: SparkSession, stateDir: String): DataFrame = {
    val distPath = new org.apache.hadoop.fs.Path(s"$stateDir/dist")
    val fs = distPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(distPath))
      spark.range(0).select(col("id"), col("id").as("dist"), col("id").as("label"))
    else
      spark.read.parquet(s"$stateDir/dist")
        .groupBy(col("id"))
        .agg(min(struct(col("dist"), col("label"))).as("m"))
        .select(col("id"), col("m.dist").as("dist"), col("m.label").as("label"))
  }

  /** Maintenance compaction for [[incrementalBfsStream]]'s append-only
    * state: min-merge every `dist/batch=<id>` partition (real batches
    * and previous folds alike) into a FRESH negative-generation
    * partition `batch=-(g)` (g = 1 + |smallest existing fold id| — the
    * first fold lands at `batch=-1`, each subsequent fold at a new
    * negative id, never overwriting in place) and drop the inputs,
    * bounding the read-side merge fan-in (the price of
    * append-only state grows with batch count otherwise). Correctness
    * under the lattice: the base carries the per-id minimum, so state
    * reads and replayed batches see exactly what they saw before —
    * a replayed batch finds its own improvements already in the base,
    * improves nothing, and rewrites an empty partition (harmless).
    * `-1` is never a real micro-batch id, so the replay guard
    * (`batch <> batchId`) can never exclude the base.
    *
    * Sequencing is a crash-safe stage-then-promote-then-delete
    * protocol, sound because both state tables are idempotent
    * lattices (per-id min for dist, set union for edges): the merged
    * snapshot is staged to a `.fold-<name>-<gen>` temp dir OUTSIDE
    * the read dir, PROMOTED via a single fs.rename into the fresh
    * negative-generation partition `batch=-(g)`, and only then are
    * the input partitions (old real batches and previous folds
    * alike) deleted. Every crash point leaves either intact inputs
    * (pre-promote — the temp is a discardable duplicate a re-run
    * overwrites) or a visible fold plus leftover inputs
    * (post-promote — a SUPERSET the lattice merge absorbs). The
    * promote happens BEFORE any delete, so there is never a window
    * where the only copy of the state is hidden in a temp dir. A
    * negative id can never equal a real micro-batch id, so the
    * replay guard (`batch <> batchId`) can never exclude a fold. */
  def compactBfsState(spark: SparkSession, stateDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def compact(name: String, merge: DataFrame => DataFrame): Unit = {
      val dir = new org.apache.hadoop.fs.Path(s"$stateDir/$name")
      if (!fs.exists(dir)) return
      val inputIds = fs.listStatus(dir)
        .filter(_.getPath.getName.startsWith("batch="))
        .map(_.getPath.getName.stripPrefix("batch=").toLong)
      if (inputIds.isEmpty) return
      val gen = 1L - math.min(0L, inputIds.min) // 1 + |smallest fold id|
      val merged = merge(spark.read.parquet(dir.toString)
        .drop("batch"))
      // stage OUTSIDE the read dir (writing into a directory while a
      // lazy scan of it is in flight is undefined), then PROMOTE the
      // finished snapshot into place BEFORE any delete: every crash
      // point leaves either intact inputs (pre-promote — the temp is
      // a discardable duplicate) or a visible fold + leftover inputs
      // (post-promote — a superset the lattice merge absorbs)
      val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/.fold-$name-$gen")
      merged.write.mode("overwrite").parquet(tmp.toString)
      val dest = new org.apache.hadoop.fs.Path(s"$stateDir/$name/batch=-$gen")
      if (fs.exists(dest)) fs.delete(dest, true) // partial prior promote; inputs intact
      require(fs.rename(tmp, dest), s"compactBfsState: promote failed for $tmp")
      inputIds.foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/$name/batch=$id"), true)
      }
    }
    compact("dist", _.groupBy(col("id"))
      .agg(min(struct(col("dist"), col("label"))).as("m"))
      .select(col("id"), col("m.dist").as("dist"), col("m.label").as("label")))
    compact("edges", _.distinct())
  }

  /** One micro-batch of [[incrementalBfsStream]], exposed so replay
    * idempotence is directly testable (same `batchId` twice ⇒
    * identical state content — the loads below exclude the batch's own
    * partitions, the dedupBatch guard). */
  private[graft] def bfsBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, seeds: DataFrame, maxHops: Int,
      stateDir: String): Unit = graft.Caches.scoped {
    val newEdges = batch
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
      .transform(d => graft.Caches.pin(d))
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def loadExclSelf(name: String, cols: Seq[String], empty: DataFrame) = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/$name")
      if (!fs.exists(p)) empty
      else spark.read.parquet(p.toString)
        .filter(col("batch") =!= batchId)
        .select(cols.map(col): _*)
    }
    val emptyState =
      spark.range(0).select(col("id"), col("id").as("dist"), col("id").as("label"))
    val standing = loadExclSelf("dist", Seq("id", "dist", "label"), emptyState)
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("label"))).as("m"))
      .select(col("id"), col("m.dist").as("dist"), col("m.label").as("label"))
      .transform(d => graft.Caches.pin(d))
    val allEdges = loadExclSelf("edges", Seq("src", "dst"),
        spark.range(0).select(col("id").as("src"), col("id").as("dst")))
      .unionByName(newEdges).distinct()
      .transform(d => graft.Caches.pin(d))
    // frontier ⋈ edges → (dst, dist+1, label), capped at maxHops
    def expand(f: DataFrame, e: DataFrame) =
      f.join(e, f("id") === e("src"))
        .filter(f("dist") + 1 <= maxHops)
        .select(e("dst").as("id"), (f("dist") + 1).as("dist"),
          f("label").as("label"))
    // candidate rows STRICTLY better (lattice order) than the current
    // per-id best in `state` — the min-merge improvement step
    def improve(state: DataFrame, cand: DataFrame) = {
      val best = state.groupBy(col("id"))
        .agg(min(struct(col("dist"), col("label"))).as("graft_old"))
      cand.groupBy(col("id"))
        .agg(min(struct(col("dist"), col("label"))).as("m"))
        .select(col("id"), col("m.dist").as("dist"), col("m.label").as("label"))
        .join(best, Seq("id"), "left")
        .filter(col("graft_old").isNull ||
          struct(col("dist"), col("label")) < col("graft_old"))
        .drop("graft_old")
    }
    val seedRows = seeds
      .select(col("id").cast("long").as("id"), col("label").cast("long").as("label"))
      .groupBy(col("id")).agg(min(col("label")).as("label"))
      .select(col("id"), lit(0L).as("dist"), col("label"))
    // round 0: seed injection (first batch / replay no-op after) plus
    // standing nodes reaching out over the NEW edges only
    var (frontier, _) = graft.Caches.checkpoint(
      improve(standing, seedRows.unionByName(expand(standing, newEdges))))
    var layers = List(frontier)
    var n = frontier.count()
    while (n > 0) {
      // later rounds relax over ALL seen edges — an improvement can
      // cascade through old structure
      val stateNow = standing.unionByName(layers.reduce(_ unionByName _))
      val next = graft.Caches.checkpoint(
        improve(stateNow, expand(frontier, allEdges)))._1
      n = next.count()
      frontier = next
      if (n > 0) layers = layers :+ next
    }
    layers.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$stateDir/dist/batch=$batchId")
    newEdges.write.mode("overwrite").parquet(s"$stateDir/edges/batch=$batchId")
    // pins + per-round checkpoints release with the enclosing scope
    ()
  }

  /** Streaming incremental materialized-view maintenance — the
    * streaming twin of q77's [[graft.operators.Incremental]]: a CDC
    * delta stream of (keys…, op ∈ {+1,−1}, cents) rows maintains the
    * per-key (count, exact-cents-sum) rollup continuously.
    *
    * Architecture is dedupBatch's: each micro-batch OVERWRITES its own
    * `batch=<id>` parquet partition with the batch's signed per-key
    * partial aggregate, so a replayed batch (restart after failure)
    * rewrites the same path — idempotent under foreachBatch's
    * at-least-once delivery. The view itself is merge-on-read
    * ([[mvState]]): signed sums are commutative and associative, so
    * the merge is arrival-order independent and equals the batch
    * from-scratch aggregate after any batch split.
    *
    * Unlike the BFS min-lattice state, SUM is NOT idempotent — state
    * partitions must never be compacted while their batch ids are
    * still inside the replay horizon (a replay would re-write a
    * partition the compactor deleted and double-count). That is why
    * this operator has no compaction helper: production retires
    * partitions only past the sink checkpoint's committed id. */
  def mvMaintainStream(spark: SparkSession, delta: DataFrame,
      keyNames: Seq[String], stateDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    delta.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        mvBatch(spark, batch.toDF(), batchId, keyNames, stateDir)
      }
      .start()
  }

  /** One micro-batch of [[mvMaintainStream]], exposed so replay
    * idempotence is directly testable. */
  private[graft] def mvBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, keyNames: Seq[String], stateDir: String): Unit = {
    batch
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col("op").cast("long")).as("d_n"),
        sum(col("op").cast("long") * coalesce(col("cents").cast("long"), lit(0L)))
          .as("d_c"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    ()
  }

  /** The maintained view: merge-on-read over the per-batch signed
    * partials — groups whose count nets to zero are dropped, exactly
    * like the batch Incremental.maintain. */
  def mvState(spark: SparkSession, stateDir: String,
      keyNames: Seq[String]): DataFrame = {
    // before the first committed micro-batch the state dir does not
    // exist — that is the empty view, not a read error (bfsState's
    // guard, applied here). Key columns type as STRING in the empty
    // frame (no schema to read yet) — pre-first-batch callers can only
    // meaningfully test emptiness.
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      return spark.range(0).select(
        keyNames.map(n => col("id").cast("string").as(n)) ++
          Seq(col("id").as("n_events"), col("id").as("c")): _*)
    spark.read.parquet(stateDir)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col("d_n")).as("n_events"), sum(col("d_c")).as("c"))
      .filter(col("n_events") > 0)
  }

  /** Late-data SIDE OUTPUT — the Beam-style allowed-lateness router
    * Structured Streaming lacks natively (a watermarked stateful op
    * silently DROPS late rows; reference-class pipelines dead-letter
    * them instead, like every other rejected record). Each micro-batch
    * routes rows against the watermark implied by PRIOR batches
    * (max event time seen, minus `lagUs`): on-time rows to
    * `outDir/batch=<id>`, late rows to `lateDir/batch=<id>`, then the
    * batch's own max event time joins the watermark state. All three
    * writes overwrite their own `batch=<id>` partition and the state
    * read EXCLUDES the current id — dedupBatch's replay-idempotence
    * architecture, so a re-run batch routes identically.
    *
    * Within one batch the watermark is the PRE-batch one (rows of a
    * batch don't race each other — Beam's pane semantics), which also
    * makes routing deterministic under replay. */
  def lateSideOutput(spark: SparkSession, events: DataFrame,
      stateDir: String, outDir: String, lateDir: String, lagUs: Long)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        lateBatch(spark, batch.toDF(), batchId, stateDir, outDir, lateDir, lagUs)
      }
      .start()
  }

  /** Fold RETIRED watermark-state partitions of [[lateSideOutput]]
    * into one compact max row, keeping the per-batch state read
    * bounded over the stream's lifetime (without this, every
    * micro-batch reads O(total batches) tiny partitions to derive a
    * single scalar). Max-event-time is a monotone idempotent lattice —
    * like the BFS frontier state, and unlike the MV SUM partials — so
    * folding is safe under replay: a re-run batch re-contributing its
    * max through its own partition cannot move the folded maximum.
    *
    * Real partitions with `batch ≤ maxBatch − keepLast`, plus every
    * previous fold partition, fold into a FRESH negative-id partition
    * `batch=-(g)` (g = 1 + |smallest existing fold id|) — write the
    * new fold, THEN delete its inputs, never overwriting anything in
    * place. Any crash point therefore leaves a superset of the state
    * (duplicates only), which the max absorbs — the lattice makes the
    * write-ahead/delete-later protocol fully crash-safe, with no
    * rename step and no window where the only copy of folded history
    * is hidden or mid-rewrite. A negative id can never equal a real
    * micro-batch id, so the read-excluding-self rule is unaffected;
    * the most recent `keepLast` real partitions stay intact so
    * replayed batches keep exact pre-batch semantics. Replaying a
    * batch OLDER than the retention horizon would see its own max
    * inside the fold — pick `keepLast` at least the engine's replay
    * depth (Structured Streaming re-runs only the last uncommitted
    * batch, so the default of 8 is generous). */
  private[graft] def lateCompactState(spark: SparkSession, stateDir: String,
      keepLast: Int = 8): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(stateDir))) return
    // retire candidates come from the FILESYSTEM listing (the
    // compactBfsState discipline), not from parquet partition values:
    // a batch whose rows all had null ts writes a ZERO-ROW state
    // partition, which row-derived ids can never see — those empty
    // batch=<id> dirs would otherwise accumulate unbounded
    val ids = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .filter(_.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
    val realIds = ids.filter(_ >= 0)
    if (realIds.isEmpty) return
    val horizon = realIds.max - keepLast
    // inputs: retired REAL partitions + every existing fold partition
    val foldIds = ids.filter(id => id < 0 || id <= horizon)
    // nothing real to retire -> nothing to do (re-folding just the
    // previous fold would rewrite identical content for no read-side
    // gain)
    if (!foldIds.exists(_ >= 0)) return
    val retired = spark.read.parquet(
      foldIds.map(id => s"$stateDir/batch=$id").toSeq: _*)
    val r = retired.agg(max(col("max_us")).as("m")).head()
    val gen = 1L - math.min(0L, ids.min) // 1 + |smallest fold id|
    // write-ahead to a FRESH partition, delete inputs after — every
    // crash point leaves duplicates the max-merge absorbs. All-empty
    // inputs (every retired partition zero-row, no fold yet) skip the
    // fold write: deleting rowless dirs loses nothing.
    if (!r.isNullAt(0)) {
      spark.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(r.getLong(0))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("max_us",
              org.apache.spark.sql.types.LongType))))
        .write.mode("overwrite").parquet(s"$stateDir/batch=-$gen")
    }
    foldIds.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/batch=$id"), true)
    }
    ()
  }

  /** One micro-batch of [[lateSideOutput]], exposed for replay tests.
    * Rows WITHOUT an event time (null ts) route to the LATE side in
    * every batch, first included: a row that cannot be assessed
    * against a watermark is a rejected record (the dead-letter class
    * this operator exists for) — and a three-valued `ts < bound`
    * predicate would otherwise drop it from BOTH outputs silently. */
  private[graft] def lateBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, stateDir: String, outDir: String, lateDir: String,
      lagUs: Long): Unit = graft.Caches.scoped {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val priorMax: Option[Long] =
      if (!fs.exists(statePath)) None
      else {
        val r = spark.read.parquet(stateDir)
          .filter(col("batch") =!= batchId)
          .agg(max(col("max_us")).as("m")).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
    val b = batch.withColumn("graft_us", unix_micros(col("ts")))
      .transform(d => graft.Caches.pin(d))
    val isLate = priorMax match {
      case Some(m) =>
        col("graft_us").isNull || col("graft_us") < lit(m - lagUs)
      case None => col("graft_us").isNull
    }
    b.filter(!isLate).drop("graft_us")
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    b.filter(isLate).drop("graft_us")
      .write.mode("overwrite").parquet(s"$lateDir/batch=$batchId")
    b.agg(max(col("graft_us")).as("max_us"))
      .filter(col("max_us").isNotNull)
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    // periodic self-maintenance: fold retired watermark partitions so
    // the state read stays bounded (max is an idempotent lattice — the
    // fold can never move the watermark, so routing is unaffected and
    // replay stays deterministic)
    if (batchId > 0 && batchId % 16 == 0)
      lateCompactState(spark, stateDir)
    ()
  }

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

  /** Run with `Trigger.AvailableNow` — the PRODUCTION backfill/catch-up
    * trigger (and the one a scheduled 100-TB reprocess uses): the
    * query snapshots the input available at start, paces through it in
    * rate-limited micro-batches honoring the source's read limits
    * (`maxFilesPerTrigger` here), commits each batch to the
    * checkpoint, then TERMINATES ON ITS OWN — unlike
    * [[runToMemory]]'s `processAllAvailable`, a test-harness wait on
    * an otherwise-unbounded query. Returns the result table once the
    * query has stopped itself. The wait is BOUNDED: a source that
    * stalls mid-backfill (a file deleted between snapshot and read
    * being retried forever) would otherwise block the caller
    * indefinitely — on expiry the query is stopped and the failure
    * carries its last reported status. */
  def runAvailableNow(df: DataFrame, name: String, mode: OutputMode,
      timeoutMs: Long = 600000L): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(timeoutMs)) {
      val status = q.status
      try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      throw new IllegalStateException(
        s"AvailableNow query '$name' did not self-terminate within ${timeoutMs} ms; last status: $status")
    }
    df.sparkSession.table(name)
  }
}
