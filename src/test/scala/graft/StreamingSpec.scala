package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, UserRunning}

/** Streaming semantics: windowed aggregation matches the batch twin,
  * watermark drops late data, stateful per-key totals accumulate. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("file-stream windowed counts match the batch aggregate (complete mode)") {
    // FileStreamSource wants a directory; stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    graft.engine.Tables.events(spark, sfDir).write
      .mode("overwrite").parquet(dir.resolve("events").toString)
    val stream = StreamOps.readEventStream(spark, dir.resolve("events").toString)
    val out = StreamOps.runToMemory(
      StreamOps.windowedCounts(stream), "win_counts", OutputMode.Complete())
    val batch = graft.engine.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val s = out.select("window_start", "event_type", "n_events")
      .orderBy("window_start", "event_type").collect().toSeq
    val b = batch.select("window_start", "event_type", "n_events")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(s == b)
  }

  // ---- batch↔streaming equivalence gates (r14 verdict item 6): every
  // transform pins to its BATCH twin on the SAME corpus fixture, so
  // the streaming surface cannot drift semantically from the batch
  // operators the catalogue hash-gates (tumbling ↔ q22's window
  // family, running state ↔ q80's cumulative family).

  test("sliding-window counts equal the batch sliding window on the corpus (overlapping twin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_slide")
    graft.engine.Tables.events(spark, sfDir).write
      .mode("overwrite").parquet(dir.resolve("events").toString)
    val stream = StreamOps.readEventStream(spark, dir.resolve("events").toString)
    val out = StreamOps.runToMemory(
      StreamOps.slidingCounts(stream), "slide_counts", OutputMode.Complete())
    val batch = graft.engine.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
    val s = out.select("window_start", "n_events")
      .orderBy("window_start").collect().toSeq
    val b = batch.orderBy("window_start").collect().toSeq
    assert(s.nonEmpty && s == b)
  }

  test("Trigger.AvailableNow backfill: the query paces the corpus files in multiple micro-batches, terminates on its own, and matches the batch sliding window") {
    // r16 verdict item 8: the twins above pin ALGEBRA (batch vs
    // incremental state); this pins the harness-level WIRING of the
    // production backfill trigger — AvailableNow snapshots the files
    // present at start, honors maxFilesPerTrigger (16) across >16
    // staged files so several micro-batches genuinely commit, and
    // stops itself (no processAllAvailable babysitting).
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow")
    graft.engine.Tables.events(spark, sfDir).repartition(33).write
      .mode("overwrite").parquet(dir.resolve("events").toString)
    val stream = StreamOps.readEventStream(spark, dir.resolve("events").toString)
    val q = StreamOps.slidingCounts(stream).writeStream
      .format("memory").queryName("avnow_slide")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "AvailableNow query did not self-terminate")
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(nBatches >= 2,
      s"expected the 33 staged files to pace >= 2 micro-batches at maxFilesPerTrigger=16, got $nBatches")
    val s = spark.table("avnow_slide").select("window_start", "n_events")
      .orderBy("window_start").collect().toSeq
    val b = graft.engine.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .orderBy("window_start").collect().toSeq
    assert(s.nonEmpty && s == b)
    // the library surface wraps the same trigger: same result table
    val viaHelper = StreamOps.runAvailableNow(
        StreamOps.slidingCounts(
          StreamOps.readEventStream(spark, dir.resolve("events").toString)),
        "avnow_slide2", OutputMode.Complete())
      .select("window_start", "n_events").orderBy("window_start").collect().toSeq
    assert(viaHelper == b)
  }

  test("running per-user totals equal the batch per-user aggregate after all micro-batches (q80-class twin)") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect()
    val mem = MemoryStream[Event]
    val q = StreamOps.runningUserTotals(spark, mem.toDS())
      .writeStream.format("memory").queryName("user_totals_corpus")
      .outputMode(OutputMode.Update()).start()
    // three arrival waves — state must carry across micro-batches
    fixture.grouped((fixture.length + 2) / 3).foreach { chunk =>
      mem.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("user_totals_corpus").as[UserRunning].collect()
      .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
    val batch = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (u, (n, total)) =>
      val got = streamed(u)
      assert(got.n_events == n, s"user $u: n ${got.n_events} != $n")
      // the stream folds per arrival order, the batch sum per scan
      // order — double addition is non-associative, so totals agree
      // to rounding, not bit-for-bit (counts ARE exact above)
      assert(math.abs(got.total_value - total) <= 1e-9 * math.max(1.0, math.abs(total)),
        s"user $u: total ${got.total_value} != $total")
    }
  }

  test("streaming dedup over a replayed corpus equals the batch dropDuplicates (d40-class twin)") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect()
    val mem = MemoryStream[Event]
    val deduped = StreamOps.dedupStream(mem.toDF(), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_corpus")
      .outputMode(OutputMode.Append()).start()
    // the corpus arrives TWICE (a full replay — the at-least-once
    // delivery the operator exists for); second pass all-duplicate
    mem.addData(fixture.toSeq)
    q.processAllAvailable()
    mem.addData(fixture.toSeq)
    q.processAllAvailable()
    q.stop()
    val streamedIds = spark.table("dedup_corpus").select("event_id")
      .as[Long].collect().sorted.toSeq
    val batchIds = graft.engine.Tables.events(spark, sfDir)
      .unionAll(graft.engine.Tables.events(spark, sfDir))
      .dropDuplicates("event_id")
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(streamedIds.nonEmpty && streamedIds == batchIds)
  }

  test("streaming transitions equal the batch lag window on the corpus with SHUFFLED in-batch arrival") {
    // r14 verdict item 7: the hand-fixture pin covers a 2-row repair;
    // this runs the whole corpus through 4 micro-batches whose INTERNAL
    // arrival order is scrambled (hash-of-id order — out of event time
    // for nearly every adjacent pair). Cross-batch per-user order still
    // holds (chunks cut along global (ts, id) order) — that is the
    // operator's documented input contract; IN-batch disorder is what
    // the per-batch sort must repair, and what this pins.
    implicit val sqlCtx = spark.sqlContext
    val fixture = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = StreamOps.transitionsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("trans_corpus")
      .outputMode(OutputMode.Append()).start()
    fixture.grouped((fixture.length + 3) / 4).foreach { chunk =>
      // deterministic scramble (no unseeded Random in tests)
      mem.addData(chunk.sortBy(e => e.event_id * 2654435761L % 4096).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("trans_corpus")
      .groupBy("user_id", "prev_type", "next_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batch = graft.engine.Tables.events(spark, sfDir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("user_id"), col("prev_type"),
        col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming forward fill equals the batch IGNORE-NULLS window on the corpus with SHUFFLED in-batch arrival") {
    // the fillForwardStream sibling of the shuffled-transitions pin:
    // corpus-derived (user, idx, cents-with-gaps) rows, 4 micro-batches
    // cut along idx order (the cross-batch contract), each batch's
    // arrival order scrambled — the one-cell carry must survive both
    // the batch boundary and the in-batch repair sort.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.{FillIn, FillOut}
    val fixture = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .sortBy { case (id, t, _, _) => (t.getTime, id) }
      .zipWithIndex.map { case ((id, _, u, v), i) =>
        // every 3rd row is a gap; values are exact cents (no-float rule)
        FillIn(u, i.toLong, if (id % 3 == 0) None else Some(math.round(v * 100)))
      }
    val mem = MemoryStream[FillIn]
    val q = StreamOps.fillForwardStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("ffill_corpus")
      .outputMode("update").start()
    fixture.grouped((fixture.length + 3) / 4).foreach { chunk =>
      mem.addData(chunk.sortBy(r => r.idx * 2654435761L % 4096).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("ffill_corpus").as[FillOut].collect()
      .map(r => (r.user_id, r.idx) -> r.fill_cents).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("idx").rowsBetween(Long.MinValue, 0)
    val twin = fixture.toSeq.toDF()
      .withColumn("f", last(col("cents"), ignoreNulls = true).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got.nonEmpty && got == twin)
  }

  test("restart from checkpoint is exactly-once: pre-restart rows counted once, none lost") {
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val src = base.resolve("src").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.engine.Tables.events(spark, sfDir)
    def run(): Unit = {
      val q = StreamOps.windowedCounts(
          StreamOps.readEventStream(spark, src))
        .writeStream.format("memory").queryName("ckpt_counts")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // phase 1: half the corpus, one run, then SHUT DOWN
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    run()
    // phase 2: the other half lands while the query is down; restart
    // from the SAME checkpoint — offsets + window state must recover
    ev.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(src)
    run()
    val streamed = spark.table("ckpt_counts")
      .select("window_start", "event_type", "n_events")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select("window_start", "event_type", "n_events")
      .orderBy("window_start", "event_type").collect().toSeq
    // doubled counts = phase-1 files replayed (offset loss); low
    // counts = state loss — equality pins exactly-once
    assert(streamed == batch)
  }

  test("version-routed enforcement runs unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.SchemaRegistry
    val v1 = SchemaRegistry.parse(
      """{"version": 1, "fields": [
        |  {"name": "pk", "type": "STRING", "mode": "REQUIRED"},
        |  {"name": "points", "type": "INTEGER"},
        |  {"name": "schema_version", "type": "STRING"}]}""".stripMargin)
    val v2 = SchemaRegistry.parse(
      """{"version": 2, "fields": [
        |  {"name": "pk", "type": "STRING", "mode": "REQUIRED"},
        |  {"name": "points", "type": "INTEGER"},
        |  {"name": "capacity", "type": "INTEGER"},
        |  {"name": "schema_version", "type": "STRING"}]}""".stripMargin)
    val mem = MemoryStream[(String, String, String, String)]
    val df = mem.toDF().toDF("pk", "points", "capacity", "schema_version")
    val (ok, dead) = SchemaRegistry.enforceByVersion(df, Map(1 -> v1, 2 -> v2), v2)
    val q1 = ok.writeStream.format("memory").queryName("evolve_ok")
      .outputMode(OutputMode.Append()).start()
    val q2 = dead.select(col("pk"), col("error")).writeStream
      .format("memory").queryName("evolve_dead").outputMode(OutputMode.Append()).start()
    mem.addData(("a-1", "10", "999", "1"), ("b-2", "20", "54000", "2"),
      ("c-2", "30", "bad", "2"), ("d-9", "40", null, "9"))
    q1.processAllAvailable(); q1.stop()
    q2.processAllAvailable(); q2.stop()
    val okRows = spark.table("evolve_ok")
      .select("pk", "points", "capacity")
      .collect().map(r => r.getString(0) -> (r.getAs[Any](1), r.getAs[Any](2))).toMap
    assert(okRows == Map("a-1" -> ((10L, null)), "b-2" -> ((20L, 54000L))))
    val deadRows = spark.table("evolve_dead")
      .as[(String, String)].collect().toMap
    assert(deadRows("c-2") == "cast_failure:capacity")
    assert(deadRows("d-9") == "unknown_schema_version")
  }

  test("stream-stream interval join matches the batch interval join (q41 twin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj")
    graft.engine.Tables.events(spark, sfDir).write
      .mode("overwrite").parquet(dir.resolve("events").toString)
    val errors = StreamOps.readEventStream(spark, dir.resolve("events").toString)
      .filter(col("event_type") === "error")
    val purchases = StreamOps.readEventStream(spark, dir.resolve("events").toString)
      .filter(col("event_type") === "purchase")
    val streamed = StreamOps.runToMemory(
      StreamOps.intervalJoinStream(errors, purchases, "error_id", "purchase_id"),
      "ssj", OutputMode.Append())
      .orderBy("error_id", "purchase_id")
      .collect().toSeq
    val ev = graft.engine.Tables.events(spark, sfDir)
    val batch = graft.operators.Interval.joinLookback(
        ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user"), col("ts").as("p_ts")),
        col("user_id"), col("p_user"), col("ts"), col("p_ts"),
        leftCols = Seq("error_id"), rightCols = Seq("purchase_id"), w = 1800L)
      .select(col("iv_key").as("user_id"), col("error_id"),
        col("purchase_id"), col("lag_us"))
      .orderBy("error_id", "purchase_id")
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("watermark drops late rows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = StreamOps.windowedCounts(mem.toDF(), watermark = "10 minutes", window = "1 hour")
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    // batch 1: establish watermark at 12:30 - 10min = 12:20
    mem.addData(
      Event(1, ts("2024-01-01 10:15:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 12:30:00"), 1, "a", 1.0))
    q.processAllAvailable()
    // batch 2: a row at 09:59 is far behind the watermark -> dropped;
    // advance watermark beyond 11:00 so the 10:00 window finalizes
    mem.addData(Event(3, ts("2024-01-01 09:59:00"), 1, "a", 1.0),
      Event(4, ts("2024-01-01 14:00:00"), 1, "a", 1.0))
    q.processAllAvailable()
    // batch 3: push watermark past 13:00 to flush the 12:00 window
    mem.addData(Event(5, ts("2024-01-01 15:30:00"), 1, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_test")
      .select("window_start", "n_events").as[(Timestamp, Long)].collect().toMap
    assert(rows(ts("2024-01-01 10:00:00")) == 1L) // late 09:59 row NOT counted
    assert(rows(ts("2024-01-01 12:00:00")) == 1L)
  }

  test("watermark grace is consumed by the no-data batch on a LIVE stream: lateness drops at the first real opportunity (non-restart control)") {
    // The engine semantics the windowed checkpoint-restart pin rests
    // on, frozen on a NON-restart run so the two can never be
    // confused. Spark filters late rows at the watermark of the
    // previous PLANNED batch (evicting at the current one), which
    // leaves a one-batch grace after every advance — but on a LIVE
    // stream the no-data batch that fires right after an advance
    // (noDataMicroBatches, on by default) is itself a planned batch,
    // so by the time the next DATA batch arrives the grace is gone
    // and lateness drops immediately. Across a KILL that no-data
    // batch never ran, so the first post-restart batch still carries
    // the grace — which is exactly why the restart pin's late row
    // sits TWO batches behind the clock (verified there: the 10:15
    // row merged in restart batch 1, dropped in restart batch 3). If
    // a Spark upgrade moved either half, the restart fixture's
    // geometry would silently stop exercising the drop — this control
    // fails loudly instead.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = StreamOps.windowedCounts(mem.toDF(), watermark = "10 minutes", window = "1 hour")
    val q = agg.writeStream.format("memory").queryName("grace_test")
      .outputMode(OutputMode.Append()).start()
    // the clock: watermark advances to 12:20; processAllAvailable
    // also runs the post-advance no-data batch, consuming the grace
    mem.addData(Event(1, ts("2024-01-01 12:30:00"), 1, "a", 1.0))
    q.processAllAvailable()
    // the FIRST data batch after the advance: on a live stream this
    // lateness is already dropped (post-restart, the same geometry
    // merges — the restart pin exercises that leg)
    mem.addData(Event(2, ts("2024-01-01 10:15:00"), 1, "a", 1.0))
    q.processAllAvailable()
    // flush every real window
    mem.addData(Event(3, ts("2024-01-01 23:00:00"), 1, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val dropped = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == 1, s"expected the 10:15 row dropped on arrival, got $dropped")
    val rows = spark.table("grace_test")
      .select("window_start", "n_events").as[(Timestamp, Long)].collect().toMap
    // no 10:00 window exists — the late row never entered state
    assert(!rows.contains(ts("2024-01-01 10:00:00")), s"got $rows")
    assert(rows(ts("2024-01-01 12:00:00")) == 1L)
  }

  test("enforcement dead-letter split works unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.Enforce
    import graft.engine.Enforce.FieldSpec
    val mem = MemoryStream[(String, String)]
    val schema = Seq(FieldSpec("pk", "STRING", required = true),
      FieldSpec("points", "INTEGER"))
    val annotated = Enforce.withError(
      mem.toDF().toDF("pk", "points"), schema)
    val q = annotated.writeStream.format("memory").queryName("enforced_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(("a", "10"), ("b", "bad"), (null, "3"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enforced_stream")
      .select("pk", "error").collect()
      .map(r => Option(r.getString(0)) -> Option(r.getString(1))).toMap
    assert(out(Some("a")) == None)
    assert(out(Some("b")) == Some("cast_failure:points"))
    assert(out(None) == Some("missing_required:pk"))
  }

  test("streaming transition extraction equals the batch lag window under in-order batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.transitionsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode(OutputMode.Append()).start()
    // in-batch disorder (event 2 added before event 1) must be repaired
    // by the per-batch sort; the cross-batch chain rides the state
    mem.addData(
      Event(2, ts("2024-01-01 10:01:00"), 1, "view", 1.0),
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(10, ts("2024-01-01 10:00:30"), 2, "view", 1.0))
    q.processAllAvailable()
    mem.addData(
      Event(3, ts("2024-01-01 10:02:00"), 1, "purchase", 1.0),
      Event(11, ts("2024-01-01 10:03:00"), 2, "click", 1.0),
      Event(12, ts("2024-01-01 10:04:00"), 2, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("trans_stream")
      .select("user_id", "prev_type", "next_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    // the batch lag window over the union of both batches, by hand
    val expected = Seq(
      (1L, "click", "view"), (1L, "view", "purchase"),
      (2L, "view", "click"), (2L, "click", "click")).sorted
    assert(streamed == expected)
  }

  test("streaming HLL registers equal the batch construction after all batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.hllStream(mem.toDF().toDF("lang", "token"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete()).start()
    val b1 = Seq(("en", "alpha"), ("en", "beta"), ("de", "alpha"))
    val b2 = Seq(("en", "gamma"), ("de", "delta"), ("de", "alpha"))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_stream")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batch = StreamOps.hllStream((b1 ++ b2).toDF("lang", "token"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming count-min sketch equals the batch sketch after all batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamOps.cmSketchStream(mem.toDF().toDF("token"), d = 4, w = 8)
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode(OutputMode.Complete()).start()
    val b1 = Seq("a", "a", "b", "c")
    val b2 = Seq("a", "b", "d", "d", "d")
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cm_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.TextAnalysis.cmSketchFromCounts(
        (b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .toDF("tok", "cnt"), d = 4, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming HLL equals the batch construction under globally SHUFFLED arrival") {
    // r15 verdict item 8: the in-order pin above says the registers
    // merge across batches; this pins the stronger claim the register
    // max is built on — FULL order-insensitivity. Corpus-derived
    // (lang, token) pairs are scrambled ACROSS batch boundaries (no
    // cross-batch order contract at all, unlike transitions) and cut
    // into 4 micro-batches; the final registers must equal the batch
    // construction bit-for-bit.
    implicit val sqlCtx = spark.sqlContext
    val pairs = graft.engine.Tables.documents(spark, sfDir)
      .select((col("doc_id") % 3).cast("string").as("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .as[(String, String)].collect()
      .sortBy { case (l, t) => (l + "" + t).hashCode * 2654435761L % 65536 }
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.hllStream(mem.toDF().toDF("lang", "token"))
      .writeStream.format("memory").queryName("hll_shuffled")
      .outputMode(OutputMode.Complete()).start()
    pairs.grouped((pairs.length + 3) / 4).foreach { chunk =>
      mem.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("hll_shuffled")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batch = StreamOps.hllStream(pairs.toSeq.toDF("lang", "token"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming count-min sketch equals the batch sketch under globally SHUFFLED arrival") {
    // counter adds commute, so ANY arrival order — across batches too —
    // must land on the identical d×w grid; corpus tokens, 4 batches
    implicit val sqlCtx = spark.sqlContext
    val toks = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .as[String].collect()
      .sortBy(t => t.hashCode * 2654435761L % 65536)
    val mem = MemoryStream[String]
    val q = StreamOps.cmSketchStream(mem.toDF().toDF("token"), d = 4, w = 8)
      .writeStream.format("memory").queryName("cm_shuffled")
      .outputMode(OutputMode.Complete()).start()
    toks.grouped((toks.length + 3) / 4).foreach { chunk =>
      mem.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("cm_shuffled")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.TextAnalysis.cmSketchFromCounts(
        toks.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .toDF("tok", "cnt"), d = 4, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming heavy hitters: exact regime is order-insensitive; guarantee survives decrement-heavy arrival") {
    implicit val sqlCtx = spark.sqlContext
    // exact regime (vocab ≤ capacity → pure counting, no decrements):
    // the final state must be arrival-order-INSENSITIVE. Corpus-shaped
    // small vocab: event types per user-parity "lang", scrambled
    // across batch boundaries.
    val pairs = graft.engine.Tables.events(spark, sfDir)
      .select((col("user_id") % 2).cast("string").as("lang"),
        col("event_type").as("token"))
      .as[(String, String)].collect()
      .sortBy { case (l, t) => (l + "" + t).hashCode * 2654435761L % 65536 }
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.heavyHittersStream(
        spark, mem.toDS().toDF("lang", "token"), capacity = 64)
      .writeStream.format("memory").queryName("hh_shuffled")
      .outputMode(OutputMode.Update()).start()
    pairs.grouped((pairs.length + 3) / 4).foreach { chunk =>
      mem.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("hh_shuffled")
      .select(col("lang"), col("n_tokens"),
        expr("transform(candidates, c -> struct(c.token, c.weight))"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(c => c.getString(0) -> c.getLong(1)).toMap))
    val exact = pairs.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    }.toMap
    exact.foreach { case (lang, (n, counts)) =>
      val fin = rows.filter(_._1 == lang).maxBy(_._2)
      assert(fin._2 == n && fin._3 == counts,
        s"lang $lang: got $fin, want ($n, $counts)")
    }
    // decrement-heavy arrival: capacity 2, the hot token's entries
    // interleave with 6 DISTINCT noise tokens so full-sketch
    // decrements fire against the hot counter in EVERY batch — the
    // MG guarantee (count > n/(k+1) ⇒ candidate) must hold anyway
    val mem2 = MemoryStream[(String, String)]
    val q2 = StreamOps.heavyHittersStream(
        spark, mem2.toDS().toDF("lang", "token"), capacity = 2)
      .writeStream.format("memory").queryName("hh_decr")
      .outputMode(OutputMode.Update()).start()
    Seq(
      Seq.fill(4)(("en", "hot")) ++ Seq(("en", "n1"), ("en", "n2")),
      Seq(("en", "n3")) ++ Seq.fill(4)(("en", "hot")) ++ Seq(("en", "n4")),
      Seq(("en", "n5"), ("en", "n6")) ++ Seq.fill(4)(("en", "hot"))
    ).foreach { b => mem2.addData(b: _*); q2.processAllAvailable() }
    q2.stop()
    val cands = spark.table("hh_decr").orderBy(col("n_tokens").desc)
      .select(expr("transform(candidates, c -> c.token)")).head()
      .getSeq[String](0).toSet
    assert(cands.contains("hot"), s"heavy hitter lost from $cands") // 12/18 > 18/3
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val deduped = StreamOps.dedupStream(mem.toDF(), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(1, ts("2024-01-01 10:00:01"), 1, "a", 1.0), // dup in same batch
      Event(2, ts("2024-01-01 10:00:02"), 1, "a", 1.0))
    q.processAllAvailable()
    mem.addData(Event(2, ts("2024-01-01 10:05:00"), 1, "a", 9.9)) // dup across batches
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("event-time sessionization matches the batch session_window on flushed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = StreamOps.sessionize(spark, mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    val evs = Seq(
      // user 1: two sessions (gap 09:00->11:00), user 2: one session
      Event(1, ts("2024-01-01 09:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 09:10:00"), 1, "a", 2.0),
      Event(3, ts("2024-01-01 11:00:00"), 1, "a", 3.0),
      Event(4, ts("2024-01-01 09:05:00"), 2, "b", 4.0))
    mem.addData(evs: _*)
    q.processAllAvailable()
    // push the watermark far past every session close so all flush
    mem.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "x", 0.0))
    q.processAllAvailable()
    mem.addData(Event(100, ts("2024-01-03 00:00:00"), 99, "x", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .filter(col("user_id") =!= 99)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    // batch twin over the same events
    val batch = evs.toDS()
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("session_window.start"), col("session_window.end"),
        col("n_events"), col("total_value"))
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("out-of-order events above the watermark extend sessions backwards and bridge them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = StreamOps.sessionize(spark, mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("ooo_sessions")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two sessions for user 6 (09:30 and 10:05, 35 min apart)
    val b1 = Seq(
      Event(1, ts("2024-01-01 09:30:00"), 6, "a", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 6, "a", 2.0))
    mem.addData(b1: _*)
    q.processAllAvailable() // watermark -> 09:55
    // batch 2: 09:56 is BEHIND the newest session but above the
    // watermark — it bridges the two open sessions into one
    val b2 = Seq(Event(3, ts("2024-01-01 09:56:00"), 6, "a", 4.0))
    mem.addData(b2: _*)
    q.processAllAvailable()
    // flush everything
    mem.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "x", 0.0))
    q.processAllAvailable()
    mem.addData(Event(100, ts("2024-01-03 00:00:00"), 99, "x", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ooo_sessions").filter(col("user_id") === 6)
      .select("session_start", "session_end", "n_events", "total_value")
      .as[(Timestamp, Timestamp, Long, Double)].collect().toSet
    val batch = (b1 ++ b2).toDS()
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("session_window.start"), col("session_window.end"),
        col("n_events"), col("total_value"))
      .as[(Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.size == 1 && got.head._3 == 3L) // bridged into ONE session
  }

  test("sessionization runs unchanged on the RocksDB state store (production path)") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = StreamOps.sessionize(spark, mem.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("rocks_sessions")
        .outputMode(OutputMode.Append()).start()
      mem.addData(
        Event(1, ts("2024-01-01 09:00:00"), 1, "a", 1.0),
        Event(2, ts("2024-01-01 09:10:00"), 1, "a", 2.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "x", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts("2024-01-03 00:00:00"), 99, "x", 0.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("rocks_sessions").filter(col("user_id") === 1)
        .select("n_events", "total_value").as[(Long, Double)].collect().toSeq
      assert(got == Seq((2L, 3.0)), s"rocksdb sessions: $got")
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("end-to-end normalize runs per micro-batch of staged roots (foreachBatch)") {
    // the reference's trigger model: each ingestion run hands the
    // pipeline a fresh batch of staged files (pipeline.py:14,37); the
    // streaming twin consumes staged ROOTS as an unbounded source and
    // runs the identical batch normalize+enforce per micro-batch
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_norm")
    def write(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, content)
    }
    write("api/season_2023/league_8/teams/run_1.json",
      """[{"team_key": "1", "team_name": "A", "team_country": "X",
        |  "venue": {"venue_name": "V", "venue_city": "C"}}]""".stripMargin)
    write("api/season_2023/league_8/standings/run_1.json",
      """[{"team_id": "1", "team_name": "A", "league_id": "8",
        |  "league_name": "L", "overall_league_position": "1",
        |  "overall_league_PTS": "10", "overall_league_payed": "4",
        |  "overall_league_W": "3", "overall_league_D": "1", "overall_league_L": "0",
        |  "overall_league_GF": "9", "overall_league_GA": "2",
        |  "overall_league_form": "WWWD"}]""".stripMargin)
    val okRows = new java.util.concurrent.atomic.AtomicLong(-1)
    val mem = MemoryStream[String]
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        batch.collect().foreach { stagedRoot =>
          val (ok, dead) = graft.engine.Normalize.pipeline(spark, stagedRoot, "apifootball")
          okRows.set(ok.count())
          assert(dead.count() == 0)
        }
      }
      .start()
    mem.addData(s"$root/api")
    q.processAllAvailable()
    q.stop()
    assert(okRows.get() == 1L)
  }

  test("streaming upsert via foreachBatch: target converges to the last write per key") {
    // the lakehouse maintenance loop: each micro-batch MERGEs into a
    // keyed parquet target (Merge.upsert + overwrite), so the table is
    // always the latest value per key — what WRITE_TRUNCATE cannot do
    // across runs. Batches arrive out of order per key; last batch wins.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").resolve("t").toString
    Seq((1L, "init1"), (2L, "init2"), (3L, "init3")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val target = spark.read.parquet(dir)
        val merged = graft.operators.Merge.upsert(target, batch, Seq("k"))
        // write-read cycle must not race its own scan: materialize first
        val rows = merged.collect()
        spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
      }
      .start()
    mem.addData((2L, "b1"), (4L, "new4"))
    q.processAllAvailable()
    mem.addData((2L, "b2"), (1L, "b2a"))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b2a", 2L -> "b2", 3L -> "init3", 4L -> "new4"))
  }

  test("streaming incremental near-dup dedup: index grows across batches, dups annotated") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_incdedup")
    val (indexDir, outDir) = (base.resolve("index").toString, base.resolve("out").toString)
    val A = "the quick brown fox jumps over the lazy dog tonight"
    val B = "completely different content describing spark execution engines"
    val C = "a third unrelated document about distributed quantile sketches"
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalDedupStream(
      spark, mem.toDS().toDF("doc_id", "text"), indexDir, outDir)
    // batch 0: 2 is an in-batch near-dup of 1 (identical text); 3 novel
    mem.addData((1L, A), (2L, A), (3L, B))
    q.processAllAvailable()
    // batch 1: 11 duplicates corpus doc 1 (cross-BATCH via the index,
    // which must NOT contain 2); 12 is novel
    mem.addData((11L, A), (12L, C))
    q.processAllAvailable()
    // batch 2: 21 duplicates 12 — a doc that was novel in a PRIOR batch
    mem.addData((21L, C))
    q.processAllAvailable()
    q.stop()
    val verdicts = spark.read.parquet(outDir)
      .select(col("doc_id"), col("matched_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(verdicts == Map(
      1L -> None, 2L -> Some(1L), 3L -> None,
      11L -> Some(1L), 12L -> None, 21L -> Some(12L)))
    // index holds exactly the novel docs
    val indexed = spark.read.parquet(s"$indexDir/sets")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == Set(1L, 3L, 12L))
  }

  test("streaming forward fill equals the batch IGNORE-NULLS window under in-order batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.{FillIn, FillOut}
    val mem = MemoryStream[FillIn]
    val out = StreamOps.fillForwardStream(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("ffill")
      .outputMode("update").start()
    // user 1: value, gap, gap | user 2: gap-before-any-value, value
    mem.addData(FillIn(1L, 0L, Some(100L)), FillIn(1L, 1L, None),
      FillIn(2L, 0L, None), FillIn(2L, 1L, Some(7L)))
    q.processAllAvailable()
    // batch 2: the carry crosses the micro-batch boundary; a fresh
    // non-null resets it; intra-batch rows arrive UNSORTED (idx 4
    // before 3) — the per-batch sort restores fold order
    mem.addData(FillIn(1L, 4L, Some(250L)), FillIn(1L, 3L, None),
      FillIn(2L, 2L, None))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ffill").as[FillOut].collect()
      .map(r => (r.user_id, r.idx) -> r.fill_cents).toMap
    assert(got == Map(
      (1L, 0L) -> Some(100L), (1L, 1L) -> Some(100L),
      (1L, 3L) -> Some(100L), (1L, 4L) -> Some(250L),
      (2L, 0L) -> None, (2L, 1L) -> Some(7L), (2L, 2L) -> Some(7L)))
    // batch twin: q53's IGNORE-NULLS running window over the union of
    // both batches gives the identical table
    val batch = Seq((1L, 0L, Some(100L)), (1L, 1L, None), (1L, 3L, None),
      (1L, 4L, Some(250L)), (2L, 0L, None), (2L, 1L, Some(7L)),
      (2L, 2L, None)).toDF("user_id", "idx", "cents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("idx")
      .rowsBetween(Long.MinValue, 0)
    val twin = batch.withColumn("f", last(col("cents"), ignoreNulls = true).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == twin)
  }

  test("streaming incremental BFS frontier equals the batch nearest-seed labels after every batch") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft_incbfs").toString
    val seeds = Seq((1L, 10L), (2L, 5L)).toDF("id", "label")
    val mem = MemoryStream[(Long, Long)]
    val q = StreamOps.incrementalBfsStream(
      spark, mem.toDS().toDF("src", "dst"), seeds, maxHops = 3, stateDir)
    def state() = StreamOps.bfsState(spark, stateDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def batchTwin(edges: Seq[(Long, Long)]) = graft.operators.Graph
      .nearestSeedLabels(edges.toDF("src", "dst"), seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch 0: a chain off seed 1, plus 5→7 which is OUT of the hop
    // cap (7 would be dist 4)
    val b0 = Seq((1L, 3L), (3L, 4L), (4L, 5L), (1L, 6L), (5L, 7L))
    mem.addData(b0: _*)
    q.processAllAvailable()
    assert(state() == batchTwin(b0))
    assert(state() == Map(1L -> (0L, 10L), 2L -> (0L, 5L), 3L -> (1L, 10L),
      4L -> (2L, 10L), 5L -> (3L, 10L), 6L -> (1L, 10L)))
    // batch 1: shortcuts from seed 2 — 4 and 5 IMPROVE (closer seed,
    // smaller label), 6 keeps dist 1 but improves its tie label, and 7
    // newly enters the cap (now dist 3 via the shortcut): the
    // improvement cascade has to relax through OLD edges
    val b1 = Seq((2L, 4L), (2L, 6L))
    mem.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    assert(state() == batchTwin(b0 ++ b1))
    assert(state() == Map(1L -> (0L, 10L), 2L -> (0L, 5L), 3L -> (1L, 10L),
      4L -> (1L, 5L), 5L -> (2L, 5L), 6L -> (1L, 5L), 7L -> (3L, 5L)))
    graft.Caches.releaseAll()
  }

  test("incremental BFS is arrival-order independent and its batch replay idempotent") {
    import graft.streaming.StreamOps.bfsBatch
    val seeds = Seq((1L, 10L), (2L, 5L)).toDF("id", "label")
    val b0 = Seq((1L, 3L), (3L, 4L), (4L, 5L), (1L, 6L), (5L, 7L))
    val b1 = Seq((2L, 4L), (2L, 6L))
    def run(splits: Seq[Seq[(Long, Long)]]): (String, Map[Long, (Long, Long)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_bfs_ord").toString
      splits.zipWithIndex.foreach { case (s, i) =>
        bfsBatch(spark, s.toDF("src", "dst"), i.toLong, seeds, 3, dir)
      }
      dir -> StreamOps.bfsState(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    // min-lattice claim: any micro-batch split converges to the same
    // table — all-at-once, in-order, REVERSED (shortcuts first)
    val (dir, all) = run(Seq(b0 ++ b1))
    val (_, inOrder) = run(Seq(b0, b1))
    val (_, reversed) = run(Seq(b1, b0))
    assert(all == inOrder && all == reversed)
    // replay: re-running batch 0 against committed state (its own
    // partitions excluded on load) rewrites identical content
    val before = StreamOps.bfsState(spark, dir).collect().toSet
    bfsBatch(spark, (b0 ++ b1).toDF("src", "dst"), 0L, seeds, 3, dir)
    assert(StreamOps.bfsState(spark, dir).collect().toSet == before)
    // compaction folds every partition into a fold generation without
    // changing the observable state; replay AFTER compaction finds its
    // improvements already in the base and is a no-op; and the stream
    // keeps absorbing batches on top of a compacted base
    StreamOps.compactBfsState(spark, dir)
    assert(StreamOps.bfsState(spark, dir).collect().toSet == before)
    bfsBatch(spark, (b0 ++ b1).toDF("src", "dst"), 0L, seeds, 3, dir)
    assert(StreamOps.bfsState(spark, dir).collect().toSet == before)
    // a genuinely new edge post-compaction: 7→8 puts 8 at dist 4 — out
    // of cap; 2→3 improves 3's label via the closer seed? no — dist 1
    // ties (1→3 vs 2→3), label 5 < 10 wins the tiebreak
    bfsBatch(spark, Seq((2L, 3L)).toDF("src", "dst"), 2L, seeds, 3, dir)
    val after = StreamOps.bfsState(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after(3L) == (1L, 5L))
    assert(after - 3L == (all - 3L))
    graft.Caches.releaseAll()
  }

  test("incremental dedup batch replay is idempotent (no self-match, index preserved)") {
    // the failure mode: a micro-batch dies AFTER its index batch=<id>
    // dirs are written but BEFORE the checkpoint commits; foreachBatch
    // re-runs the same (batchId, data). The replay must not read its
    // own docs back from the index (every novel doc would self-match
    // and the emptied novel set would wipe the index partition).
    val base = java.nio.file.Files.createTempDirectory("graft_replay")
    val (indexDir, outDir) = (base.resolve("index").toString, base.resolve("out").toString)
    val A = "the quick brown fox jumps over the lazy dog tonight"
    val C = "a third unrelated document about distributed quantile sketches"
    val b0 = Seq((1L, A), (3L, C)).toDF("doc_id", "text")
    StreamOps.dedupBatch(spark, b0, 0L, indexDir, outDir, 0.8)
    val verdictsOnce = spark.read.parquet(outDir)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    val indexOnce = spark.read.parquet(s"$indexDir/sets")
      .select("doc_id").distinct().as[Long].collect().toSet
    // replay the SAME batch id with the SAME data (checkpoint rollback)
    StreamOps.dedupBatch(spark, b0, 0L, indexDir, outDir, 0.8)
    val verdictsTwice = spark.read.parquet(outDir)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    val indexTwice = spark.read.parquet(s"$indexDir/sets")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(verdictsOnce == Map(1L -> false, 3L -> false))
    assert(verdictsTwice == verdictsOnce) // no self-matches on replay
    assert(indexOnce == Set(1L, 3L) && indexTwice == indexOnce) // no index loss
    // and a genuine later batch still dedups against the replayed index
    StreamOps.dedupBatch(spark, Seq((11L, A)).toDF("doc_id", "text"),
      1L, indexDir, outDir, 0.8)
    val v11 = spark.read.parquet(s"$outDir/batch=1")
      .select("doc_id", "matched_id").as[(Long, Option[Long])].collect().toMap
    assert(v11 == Map(11L -> Some(1L)))
  }

  test("checkpoint recovery: a stream killed mid-corpus restarts from the same checkpoint exactly-once (no dup, no gap) vs the batch twin") {
    // r17 verdict item 4: the AvailableNow test above pins the
    // TRIGGER path; this pins RESTART — the production recovery
    // surface. The corpus is staged TWICE (64-file copy + 65-file
    // copy: every event appears exactly twice), streamed through
    // dropDuplicates(event_id) into an exactly-once FILE sink. Run 1
    // is KILLED right after its first committed micro-batch — mid-
    // backlog at maxFilesPerTrigger=16 over 129 files, possibly mid-
    // flight in batch 2. Run 2 resumes from the same checkpoint and
    // self-terminates. Exactly-once across the kill then means three
    // recoveries at once: ids emitted before the kill must NOT
    // re-emit when their second copy arrives after the restart
    // (dedup STATE restored), no id may be lost (OFFSETS restored),
    // and any batch interrupted in flight must not double its rows
    // (sink files commit through the _spark_metadata log, which a
    // batch read honors — uncommitted files are invisible).
    //
    // r18 advice: the kill is made DETERMINISTIC by running run 1 on
    // a one-hour ProcessingTime trigger — batch 0 fires immediately,
    // batch 1 is an hour away, so run 1 commits exactly one
    // micro-batch (16 of 129 files) on every host speed; the old
    // ProcessingTime(0) run could drain the whole backlog between
    // the first progress report and stop() on a fast host, failing
    // the restart-read-something assertion flakily. (Mid-flight
    // batch interruption atomicity is pinned separately by the
    // foreachBatch replay test above.)
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_restart")
    val src = base.resolve("events").toString
    val ev = graft.engine.Tables.events(spark, sfDir)
    ev.repartition(64).write.mode("append").parquet(src)
    ev.repartition(65).write.mode("append").parquet(src)
    // the dedup-to-one contract below needs unique ids in the twin
    assert(ev.count() == ev.select("event_id").distinct.count())
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      StreamOps.readEventStream(spark, src)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(trigger)
        .start()
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(3600000L))
    val deadline = System.currentTimeMillis + 300000
    while (q1.recentProgress.map(_.numInputRows).sum == 0 &&
      System.currentTimeMillis < deadline) Thread.sleep(20)
    q1.stop()
    val run1 = q1.recentProgress.map(_.numInputRows).sum
    assert(run1 > 0, "run 1 committed nothing before the kill")
    // the kill landed mid-backlog by construction: one 16-file batch
    // of 129 staged files
    assert(run1 < ev.count() * 2,
      s"run 1 unexpectedly drained the whole backlog ($run1 rows)")
    val q2 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q2.awaitTermination(300000), "restarted query did not self-terminate")
    assert(q2.recentProgress.map(_.numInputRows).sum > 0,
      "restart read nothing — the kill landed after the whole 129-file backlog")
    // exactly-once: the sink equals the batch twin — no dup, no gap
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("ts").cast("long"), col("user_id"),
          col("event_type"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4))).sortBy(_._1).toSeq
    val got = canon(spark.read.parquet(out))
    val want = canon(ev)
    assert(got.size == want.size,
      s"exactly-once violated: sink has ${got.size} rows, twin ${want.size}")
    assert(got == want)
  }

  test("checkpoint recovery: a windowed aggregation killed mid-backlog restores partial window state AND the watermark (late data dropped across the kill)") {
    // r18 verdict item 5: the dropDuplicates restart pin above proves
    // dedup state + offsets + sink atomicity; a windowed aggregation
    // carries a DIFFERENT state-store shape — partial per-window
    // aggregates and the PERSISTED WATERMARK. A partial sum lost or
    // double-applied is invisible to a dedup test, and a lost
    // watermark silently ACCEPTS late data the pre-kill run already
    // sealed away. Construction:
    //   batch 0 (the only batch run 1 commits — one-hour trigger, the
    //   deterministic-kill device): 40 events in the 10:00 window +
    //   one "clock" event at 12:30, staged as 16 files = exactly one
    //   16-file micro-batch; after its commit the PERSISTED watermark
    //   is 12:20. Run 1 EMITS nothing (batch 0 executed at watermark
    //   0 — no window sealed): every sink row is post-restart work.
    //   Run 2 (restart, AvailableNow): a 13:30 batch lands — planned
    //   at the RESTORED 12:20 watermark, it seals and emits the
    //   10:00 windows from restored partial state and advances the
    //   watermark to 13:20.
    //   Run 3 (second restart): one LATE event at 10:15 + a 23:00
    //   flush sentinel. The late row is behind the restored 13:20
    //   watermark and must be DROPPED (the progress metric pins it:
    //   numRowsDroppedByWatermark ≥ 1); the sentinel pushes the
    //   watermark past every real window so append mode flushes the
    //   rest. The late row sits two batches behind the clock event
    //   deliberately: Spark's late filter runs at the watermark of
    //   the previous PLANNED batch (eviction at the current one), and
    //   the kill prevented the no-data batch that normally consumes
    //   that one-batch grace — so a late row in the FIRST
    //   post-restart batch is legitimately merged (engine semantics,
    //   not state loss; the non-restart control below freezes the
    //   live-stream half), and this pin targets state loss.
    // The sink must then equal the hand twin WITHOUT the late event
    // and WITHOUT the sentinel's own (never-sealed) window: a LOST
    // watermark admits the late row (a spurious 10:00 click of
    // 1/5.0 after its window already sealed), a lost offset log
    // re-reads or skips the 10:00 partials, lost aggregation state
    // drops them entirely.
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_window")
    val src = base.resolve("events").toString
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    def stage(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)],
        files: Int): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .repartition(files).write.mode("append").parquet(src)
    val w10 = (1L to 40L).map(i => (i, ts("2026-01-01 10:00:30"), i,
      if (i % 2 == 0) "click" else "view", 1.0))
    stage(w10 :+ ((100L, ts("2026-01-01 12:30:00"), 1L, "click", 2.0)),
      files = 16)
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      StreamOps.windowedCounts(StreamOps.readEventStream(spark, src))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(trigger).start()
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(3600000L))
    val deadline = System.currentTimeMillis + 300000
    while (q1.recentProgress.map(_.numInputRows).sum == 0 &&
      System.currentTimeMillis < deadline) Thread.sleep(20)
    q1.stop()
    assert(q1.recentProgress.map(_.numInputRows).sum == 41,
      "run 1 must commit exactly the one 16-file batch (41 rows)")
    stage((300L to 309L).map(i =>
      (i, ts("2026-01-01 13:30:00"), i, "view", 1.0)), 2)
    val q2 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q2.awaitTermination(300000), "restart 1 did not self-terminate")
    stage(Seq((200L, ts("2026-01-01 10:15:00"), 9L, "click", 5.0)), 1) // late
    stage(Seq((400L, ts("2026-01-01 23:00:00"), 1L, "flush", 0.0)), 1) // sentinel
    val q3 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q3.awaitTermination(300000), "restart 2 did not self-terminate")
    // the late row was dropped BY THE RESTORED WATERMARK, visibly
    assert(q3.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum >= 1,
      "expected the 10:15 row to be dropped by the restored watermark")
    val got = spark.read.parquet(out)
      .select(col("window_start").cast("string"), col("event_type"),
        col("n_events"), col("total_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val want = Seq(
      ("2026-01-01 10:00:00", "click", 20L, 20.0),
      ("2026-01-01 10:00:00", "view", 20L, 20.0),
      ("2026-01-01 12:00:00", "click", 1L, 2.0),
      ("2026-01-01 13:00:00", "view", 10L, 10.0))
    assert(got == want, s"windowed restart diverged from the twin: $got")
  }

  test("checkpoint recovery: a stream-stream interval join killed mid-backlog restores BOTH join buffers and drops both-sides-late rows") {
    // r19 verdict item 4, the third state-store shape: a stream-stream
    // join buffers BOTH inputs with side-specific eviction bounds
    // (left evicts at the watermark, right at watermark − lookback) —
    // a lost buffered row is invisible to the dedup and windowed-agg
    // restart pins (no dup appears, no sum changes; a JOIN ROW just
    // silently never exists). Construction (lookback 1800 s,
    // watermark 30 min, deterministic one-hour-trigger kill):
    //   batch 0 (run 1's only batch): left {L1 10:00 u1, L2 10:10 u2,
    //   clock 10:20}, right {P1 09:50 u1, P3 10:15 u3, clock 10:20}.
    //   (L1,P1) joins and emits pre-kill; L2 and P3 are BUFFERED,
    //   unmatched; both watermarks land at 09:50.
    //   Run 2 (restart, AvailableNow): left L3 10:30 u3 must join the
    //   RESTORED right buffer's P3 (10:15 ∈ [10:00, 10:30]); right
    //   P2 10:05 u2 must join the restored LEFT buffer's L2
    //   (10:05 ∈ [09:40, 10:10]). A lost left buffer loses (L2,P2), a
    //   lost right buffer loses (L3,P3). Watermarks advance to 10:00.
    //   Run 3 (second restart): L9 09:00 u7 and P9 08:45 u7 — each
    //   below its side's restored state watermark (left 10:00; right
    //   10:00 − 1800 s = 09:30) — must BOTH be dropped, visibly
    //   (numRowsDroppedByWatermark ≥ 2); had either been admitted
    //   they would join each other (08:45 ∈ [08:30, 09:00]) and the
    //   twin equality below would fail.
    // The sink must equal the BATCH interval join (the q41 twin
    // operator) over the staged events minus the two late rows.
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_ssj")
    val srcL = base.resolve("left").toString
    val srcR = base.resolve("right").toString
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    def stage(dir: String,
        rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .repartition(1).write.mode("append").parquet(dir)
    stage(srcL, Seq((1L, ts("2026-01-01 10:00:00"), 1L, "error", 1.0),
      (2L, ts("2026-01-01 10:10:00"), 2L, "error", 1.0),
      (50L, ts("2026-01-01 10:20:00"), 50L, "clock", 0.0)))
    stage(srcR, Seq((101L, ts("2026-01-01 09:50:00"), 1L, "purchase", 1.0),
      (103L, ts("2026-01-01 10:15:00"), 3L, "purchase", 1.0),
      (151L, ts("2026-01-01 10:20:00"), 51L, "clock", 0.0)))
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      StreamOps.intervalJoinStream(
          StreamOps.readEventStream(spark, srcL),
          StreamOps.readEventStream(spark, srcR),
          "error_id", "purchase_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(trigger).start()
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(3600000L))
    val deadline = System.currentTimeMillis + 300000
    while (q1.recentProgress.map(_.numInputRows).sum == 0 &&
      System.currentTimeMillis < deadline) Thread.sleep(20)
    q1.stop()
    assert(q1.recentProgress.map(_.numInputRows).sum == 6,
      "run 1 must commit exactly the one batch-0 micro-batch (6 rows)")
    // run 2: each side's new row must match the OTHER side's restored
    // buffer; the right clock keeps both watermarks advancing together
    stage(srcL, Seq((3L, ts("2026-01-01 10:30:00"), 3L, "error", 1.0)))
    stage(srcR, Seq((102L, ts("2026-01-01 10:05:00"), 2L, "purchase", 1.0),
      (152L, ts("2026-01-01 10:30:00"), 51L, "clock", 0.0)))
    val q2 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q2.awaitTermination(300000), "restart 1 did not self-terminate")
    // run 3: both-sides-late pair — dropped by the RESTORED watermark
    stage(srcL, Seq((9L, ts("2026-01-01 09:00:00"), 7L, "error", 1.0)))
    stage(srcR, Seq((109L, ts("2026-01-01 08:45:00"), 7L, "purchase", 1.0)))
    val q3 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q3.awaitTermination(300000), "restart 2 did not self-terminate")
    assert(q3.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum >= 2,
      "expected BOTH late rows dropped by the restored join watermarks")
    def canonJ(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("error_id"), col("purchase_id"),
          col("lag_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._2, t._3)).toSeq
    val got = canonJ(spark.read.parquet(out))
    // the batch twin over everything staged except the two late rows
    val lb = spark.read.parquet(srcL).filter(col("event_id") =!= 9L)
    val rb = spark.read.parquet(srcR).filter(col("event_id") =!= 109L)
    val want = canonJ(graft.operators.Interval.joinLookback(
        lb.select(col("event_id").as("error_id"), col("user_id"), col("ts")),
        rb.select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts")),
        col("user_id"), col("p_user"), col("ts"), col("p_ts"),
        leftCols = Seq("error_id"), rightCols = Seq("purchase_id"), w = 1800L)
      .select(col("iv_key").as("user_id"), col("error_id"),
        col("purchase_id"), col("lag_us")))
    assert(got.size == 3 && got == want,
      s"stream-stream join restart diverged: got=$got want=$want")
  }

  test("a co-tenant's cached DataFrame survives a dedup micro-batch with its storage level intact") {
    // dedupBatch must clean up ONLY the dedup operators' own pins
    // (graft.Caches.releaseAll) — the earlier session-wide
    // spark.catalog.clearCache() silently evicted every cache in the
    // session, so in a long-running app sharing the SparkSession each
    // micro-batch destroyed co-tenant caches.
    val base = java.nio.file.Files.createTempDirectory("graft_cotenant")
    val (indexDir, outDir) = (base.resolve("index").toString, base.resolve("out").toString)
    // clear residue other tests left in the shared session so the
    // only-the-co-tenant-remains assertion below is deterministic
    graft.Caches.releaseAll()
    spark.catalog.clearCache()
    val userFrame = Seq((1L, "co-tenant state"), (2L, "more state"))
      .toDF("k", "v").persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    assert(userFrame.count() == 2L) // materialize the cache
    StreamOps.dedupBatch(spark,
      Seq((21L, "the quick brown fox jumps over the lazy dog tonight"),
        (22L, "a second unrelated document about watermarks and state"))
        .toDF("doc_id", "text"),
      0L, indexDir, outDir, 0.8)
    assert(userFrame.storageLevel == org.apache.spark.storage.StorageLevel.MEMORY_ONLY,
      s"micro-batch evicted the co-tenant cache (level now ${userFrame.storageLevel})")
    // and the batch's own pins are gone: the only persistent RDD left
    // in the session is the co-tenant's
    val persisted = spark.sparkContext.getPersistentRDDs
    assert(persisted.size == 1,
      s"expected only the co-tenant cache to remain, got ${persisted.size}: " +
        persisted.values.map(r => s"id=${r.id} level=${r.getStorageLevel}").mkString(", "))
    userFrame.unpersist(blocking = true)
  }

  test("streaming enforce split: per-batch ok/dead routing equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.Enforce.FieldSpec
    val schema = Seq(
      FieldSpec("event_id", "INTEGER", required = true),
      FieldSpec("k", "INTEGER"))
    val base = java.nio.file.Files.createTempDirectory("graft_enf_stream")
    val (okDir, deadDir) = (base.resolve("ok").toString, base.resolve("dead").toString)
    val mem = MemoryStream[(java.lang.Long, String)]
    val q = StreamOps.enforceStream(spark,
      mem.toDS().toDF("event_id", "k"), schema, "event_id", okDir, deadDir)
    mem.addData((1L, "10"), (2L, "not_a_number"))
    q.processAllAvailable()
    mem.addData((3L, "30"), (null, "5"))
    q.processAllAvailable()
    q.stop()
    // ok side: typed rows, clean only
    val ok = spark.read.parquet(okDir).select("event_id", "k")
      .as[(Long, Long)].collect().toSet
    assert(ok == Set((1L, 10L), (3L, 30L)))
    // dead side: JSON lines carrying pk + error, one per failed row
    val dead = spark.read.text(deadDir).select("value").as[String].collect().toSet
    assert(dead.size == 2)
    assert(dead.exists(s => s.contains("\"PK\":2") && s.contains("cast_failure:k")))
    assert(dead.exists(_.contains("missing_required:event_id")))
    // equals the batch operator over the same rows
    val all = Seq[(java.lang.Long, String)]((1L, "10"), (2L, "not_a_number"),
      (3L, "30"), (null, "5")).toDF("event_id", "k")
    val (bOk, bDead) = graft.engine.Enforce.split(all, schema)
    assert(bOk.as[(Long, Long)].collect().toSet == ok)
    assert(graft.engine.Enforce.deadLetterJson(bDead, "event_id")
      .as[String].collect().toSet == dead)
  }

  test("streaming heavy hitters: MG state accumulates across batches; exact when vocab fits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = StreamOps.heavyHittersStream(
      spark, mem.toDS().toDF("lang", "token"), capacity = 64)
    val q = out.writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update()).start()
    mem.addData(("en", "the"), ("en", "the"), ("en", "cat"), ("de", "der"))
    q.processAllAvailable()
    mem.addData(("en", "the"), ("en", "dog"), ("de", "der"), ("de", "die"))
    q.processAllAvailable()
    q.stop()
    // last emitted row per lang = the accumulated cross-batch state
    val rows = spark.table("hh")
      .select(col("lang"), col("n_tokens"),
        expr("transform(candidates, c -> struct(c.token, c.weight))"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(c => c.getString(0) -> c.getLong(1)).toMap))
    val finalEn = rows.filter(_._1 == "en").maxBy(_._2)
    val finalDe = rows.filter(_._1 == "de").maxBy(_._2)
    // vocab ≤ capacity → the sketch never decrements: weights are EXACT
    assert(finalEn._2 == 5L &&
      finalEn._3 == Map("the" -> 3L, "cat" -> 1L, "dog" -> 1L))
    assert(finalDe._2 == 3L && finalDe._3 == Map("der" -> 2L, "die" -> 1L))
    // tight capacity: the guarantee survives — a token above n/(k+1)
    // is ALWAYS a candidate even after decrements
    val mem2 = MemoryStream[(String, String)]
    val out2 = StreamOps.heavyHittersStream(
      spark, mem2.toDS().toDF("lang", "token"), capacity = 2)
    val q2 = out2.writeStream.format("memory").queryName("hh2")
      .outputMode(OutputMode.Update()).start()
    mem2.addData(Seq.fill(8)(("en", "hot")) ++ Seq(("en", "x"), ("en", "y")): _*)
    q2.processAllAvailable()
    mem2.addData(Seq.fill(4)(("en", "hot")) ++ Seq(("en", "z")): _*)
    q2.processAllAvailable()
    q2.stop()
    val cands = spark.table("hh2").orderBy(col("n_tokens").desc)
      .select(expr("transform(candidates, c -> c.token)")).head()
      .getSeq[String](0).toSet
    assert(cands.contains("hot"), s"heavy hitter lost from $cands") // 12/15 > 15/3
  }

  test("stateful per-user running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = StreamOps.runningUserTotals(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("user_totals")
      .outputMode(OutputMode.Update()).start()
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "a", 2.0))
    q.processAllAvailable()
    mem.addData(Event(2, ts("2024-01-01 10:01:00"), 7, "a", 3.0),
      Event(3, ts("2024-01-01 10:02:00"), 8, "b", 5.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("user_totals").as[UserRunning].collect()
      .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
    assert(last(7L) == UserRunning(7L, 2L, 5.0))
    assert(last(8L) == UserRunning(8L, 1L, 5.0))
  }

  test("transformWithState running totals match the mapGroupsWithState form (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = StreamOps.runningUserTotalsTws(spark, mem.toDS())
        .writeStream.format("memory").queryName("user_totals_tws")
        .outputMode(OutputMode.Update()).start()
      mem.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "a", 2.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts("2024-01-01 10:01:00"), 7, "a", 3.0),
        Event(3, ts("2024-01-01 10:02:00"), 8, "b", 5.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("user_totals_tws").as[UserRunning].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(last(7L) == UserRunning(7L, 2L, 5.0))
      assert(last(8L) == UserRunning(8L, 1L, 5.0))
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("streaming MV maintenance equals batch Incremental.maintain; batch replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    val keys = Seq("k")
    // delta stream: (k, op, cents) — inserts and a retraction
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamOps.mvMaintainStream(
      spark, mem.toDS().toDF("k", "op", "cents"), keys, stateDir)
    def state() = StreamOps.mvState(spark, stateDir, keys)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    mem.addData(("a", 1L, 100L), ("a", 1L, 200L), ("b", 1L, 50L))
    q.processAllAvailable()
    assert(state() == Map("a" -> (2L, 300L), "b" -> (1L, 50L)))
    // batch 1: delete b entirely, add to a — b's group must vanish
    mem.addData(("b", -1L, 50L), ("a", 1L, 300L))
    q.processAllAvailable()
    q.stop()
    assert(state() == Map("a" -> (3L, 600L)))
    // equals the batch operator over the same base/delta split
    val base = Seq(("a", 100L), ("a", 200L), ("b", 50L)).toDF("k", "cents")
    val delta = Seq(("b", -1L, 50L), ("a", 1L, 300L)).toDF("k", "op", "cents")
    val st = graft.operators.Incremental.aggregateState(base, keys, col("cents"))
    val twin = graft.operators.Incremental.maintain(st, delta, keys, col("op"), col("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(state() == twin)
    // replaying batch 1 (same id) overwrites its own partition: state unchanged
    StreamOps.mvBatch(spark,
      Seq(("b", -1L, 50L), ("a", 1L, 300L)).toDF("k", "op", "cents"),
      1L, keys, stateDir)
    assert(state() == twin)
  }

  test("streaming MV maintenance is arrival-order independent (signed sums commute)") {
    val keys = Seq("k")
    val deltas = Seq(
      ("a", 1L, 100L), ("a", 1L, 200L), ("b", 1L, 50L),
      ("b", -1L, 50L), ("a", 1L, 300L), ("a", -1L, 100L))
    def runSplit(batches: Seq[Seq[(String, Long, Long)]]): Map[String, (Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_mv_ord").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamOps.mvBatch(spark, b.toDF("k", "op", "cents"), i.toLong, keys, dir)
      }
      StreamOps.mvState(spark, dir, keys)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val inOrder = runSplit(Seq(deltas.take(3), deltas.drop(3)))
    val reversed = runSplit(Seq(deltas.drop(3), deltas.take(3)))
    val allAtOnce = runSplit(Seq(deltas))
    val perRow = runSplit(deltas.map(Seq(_)))
    assert(inOrder == Map("a" -> (2L, 500L)))
    assert(reversed == inOrder && allAtOnce == inOrder && perRow == inOrder)
  }

  test("late-data side output routes against the prior-batch watermark; replay idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_late").toString
    val (st, out, late) = (s"$root/state", s"$root/out", s"$root/late")
    def rows(ts: String*) = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, StreamingSpec.this.ts(s"2024-01-01 $t")) }
      .toDF("event_id", "ts")
    def ids(dir: String) =
      spark.read.parquet(dir).select("event_id").collect().map(_.getLong(0)).toSet
    val lag = 10L * 60 * 1000000 // 10 min in micros
    // batch 0: no prior watermark — everything on-time
    StreamOps.lateBatch(spark, rows("10:00:00", "10:30:00"), 0L, st, out, late, lag)
    assert(ids(out) == Set(0L, 1L) && ids(late).isEmpty)
    // batch 1: watermark = 10:30 − 10min = 10:20 → 10:05 is late,
    // 10:25 and 10:40 are on-time
    val b1 = rows("10:25:00", "10:05:00", "10:40:00")
    StreamOps.lateBatch(spark, b1, 1L, st, out, late, lag)
    assert(ids(out) == Set(0L, 1L, 2L) && ids(late) == Set(1L))
    // replay of batch 1: own state partition excluded → identical routing
    StreamOps.lateBatch(spark, b1, 1L, st, out, late, lag)
    assert(ids(late) == Set(1L))
    // batch 2 sees 10:40-based watermark (10:30): 10:29 now late
    StreamOps.lateBatch(spark, rows("10:29:00"), 2L, st, out, late, lag)
    assert(ids(late) == Set(1L, 0L))
    // rows WITHOUT an event time dead-letter in every batch — a
    // three-valued ts < bound predicate must not drop them from BOTH
    // outputs (and batch 0's no-watermark path must route them the
    // same way)
    val withNull = Seq((50L, ts("2024-01-01 10:45:00")), (51L, null))
      .toDF("event_id", "ts")
    StreamOps.lateBatch(spark, withNull, 3L, st, out, late, lag)
    assert(ids(out).contains(50L) && !ids(out).contains(51L))
    assert(ids(late).contains(51L))
    val root0 = java.nio.file.Files.createTempDirectory("graft_late0").toString
    StreamOps.lateBatch(spark, withNull, 0L,
      s"$root0/state", s"$root0/out", s"$root0/late", lag)
    assert(ids(s"$root0/out") == Set(50L) && ids(s"$root0/late") == Set(51L))
  }

  test("late-data watermark state compacts to a bounded read without moving the watermark") {
    val root = java.nio.file.Files.createTempDirectory("graft_latec").toString
    val (st, out, late) = (s"$root/state", s"$root/out", s"$root/late")
    def row(id: Long, t: String) =
      Seq((id, ts(s"2024-01-01 $t"))).toDF("event_id", "ts")
    val lag = 10L * 60 * 1000000
    // 12 batches, each advancing event time by a minute
    (0 until 12).foreach { i =>
      StreamOps.lateBatch(spark, row(i.toLong, f"10:${i}%02d:00"), i.toLong,
        st, out, late, lag)
    }
    def partitions() = new java.io.File(st).list().filter(_.startsWith("batch=")).toSet
    def watermark() = spark.read.parquet(st)
      .agg(org.apache.spark.sql.functions.max("max_us")).head().getLong(0)
    val before = watermark()
    assert(partitions().size == 12)
    // fold everything older than the last 4 batches into the first
    // fold generation (batch=-1)
    StreamOps.lateCompactState(spark, st, keepLast = 4)
    assert(partitions() == Set("batch=-1", "batch=8", "batch=9", "batch=10", "batch=11"),
      s"unexpected partitions after compaction: ${partitions()}")
    assert(watermark() == before, "compaction moved the watermark")
    // compaction composes: a second fold after more batches re-folds
    // the compact row itself
    (12 until 16).foreach { i =>
      StreamOps.lateBatch(spark, row(i.toLong, f"10:${i}%02d:00"), i.toLong,
        st, out, late, lag)
    }
    StreamOps.lateCompactState(spark, st, keepLast = 2)
    // the second fold consumed the first (batch=-1) and wrote a FRESH
    // generation (batch=-2) — write-ahead, never overwrite-in-place
    assert(partitions() == Set("batch=-2", "batch=14", "batch=15"))
    // routing after compaction is unchanged: watermark = 10:15−10min =
    // 10:05 → a 10:04 row is late, a 10:06 row on-time
    StreamOps.lateBatch(spark, row(100L, "10:04:00"), 16L, st, out, late, lag)
    StreamOps.lateBatch(spark, row(101L, "10:06:00"), 17L, st, out, late, lag)
    val lateIds = spark.read.parquet(late)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(lateIds.contains(100L) && !lateIds.contains(101L))
  }

  test("compaction retires ZERO-ROW state partitions (all-null-ts batches)") {
    // a batch whose rows all lack an event time writes a rowless
    // state partition; retire candidates must come from the
    // filesystem listing (the round-10 ADVICE fix) — row-derived
    // partition values can never see these dirs, which would
    // otherwise accumulate unbounded
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_latez").toString
    val (st, out, late) = (s"$root/state", s"$root/out", s"$root/late")
    def row(id: Long, t: String) =
      Seq((id, ts(s"2024-01-01 $t"))).toDF("event_id", "ts")
    val nullRow = Seq((900L, Option.empty[java.sql.Timestamp]))
      .toDF("event_id", "ts")
    val lag = 10L * 60 * 1000000
    StreamOps.lateBatch(spark, row(0L, "10:00:00"), 0L, st, out, late, lag)
    StreamOps.lateBatch(spark, nullRow, 1L, st, out, late, lag) // zero-row
    StreamOps.lateBatch(spark, nullRow, 2L, st, out, late, lag) // zero-row
    (3L to 6L).foreach { i =>
      StreamOps.lateBatch(spark, row(i, f"10:${i}%02d:00"), i, st, out, late, lag)
    }
    def partitions() = new java.io.File(st).list().filter(_.startsWith("batch=")).toSet
    assert(partitions().size == 7, s"setup: ${partitions()}")
    def watermark() = spark.read.parquet(st)
      .agg(org.apache.spark.sql.functions.max("max_us")).head().getLong(0)
    val before = watermark()
    StreamOps.lateCompactState(spark, st, keepLast = 2)
    // batches 0..4 fold — INCLUDING the rowless batch=1/batch=2 dirs
    assert(partitions() == Set("batch=-1", "batch=5", "batch=6"),
      s"zero-row partitions survived compaction: ${partitions()}")
    assert(watermark() == before, "compaction moved the watermark")
  }
}
