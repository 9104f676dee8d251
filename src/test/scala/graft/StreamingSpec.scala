package graft

import graft.Tables
import graft.streaming.Events
import org.apache.spark.sql.functions._

/** Streaming parity: the Structured Streaming forms replayed through
  * MemoryStream must agree with their deterministic batch equivalents
  * (SURVEY §5.2 "Streaming tests"). */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch hourly agg on in-order replay") {
    val batch = Events.hourlyAgg(spark, sfDir).collect().map(_.toSeq).toSet
    val stream = Events.hourlyAggStreaming(spark, sfDir).collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("gapFillHourly: dense spine, sparse rows preserved, gaps are explicit zeros") {
    val filled = Events.gapFillHourly(spark, sfDir).collect()
    val sparse = Events.hourlyAgg(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("hour_us"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    // every sparse row survives unchanged; every other (hour, type) cell
    // is an explicit zero marked gap_filled
    filled.foreach { r =>
      val k = (r.getAs[Long]("hour_us"), r.getAs[String]("event_type"))
      sparse.get(k) match {
        case Some((n, s)) =>
          assert(r.getAs[Long]("n") == n && r.getAs[Double]("sum_value") == s)
          assert(!r.getAs[Boolean]("gap_filled"))
        case None =>
          assert(r.getAs[Long]("n") == 0L && r.getAs[Boolean]("gap_filled"))
      }
    }
    // dense: hours × types, contiguous hourly steps
    val hours = filled.map(_.getAs[Long]("hour_us")).distinct.sorted
    val types = filled.map(_.getAs[String]("event_type")).distinct
    assert(filled.length == hours.length * types.length)
    hours.sliding(2).foreach {
      case Array(a, b) => assert(b - a == 3600000000L, "spine not contiguous")
      case _ =>
    }
  }

  test("rollingTimeWindow: frames match a per-row brute-force replay") {
    val out = Events.rollingTimeWindow(spark, sfDir).collect()
    val evs = Tables.events(spark, sfDir)
      .filter(col("user_id") % 25 === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    out.foreach { r =>
      val (uid, ts) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"))
      val frame = evs(uid).filter(e => e._2 >= ts - 3600000000L && e._2 <= ts)
      assert(r.getAs[Long]("n_1h") == frame.length,
        s"user $uid @ $ts: frame size ${r.getAs[Long]("n_1h")} vs ${frame.length}")
      assert(math.abs(r.getAs[Double]("avg_1h") -
        frame.map(_._3).sum / frame.length) < 1e-3)
    }
  }

  test("transformWithState: running totals persist across microbatches, final = batch") {
    val out = Events.transformWithStateTotals(spark, sfDir).collect()
    val batch = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.length == batch.size, "one final row per user")
    out.foreach { r =>
      val (n, s) = batch(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[Double]("sum_value") - s) < 1e-6)
    }
    // the raw sink holds one emission per (user, batch-with-input): more
    // rows than users proves the ValueState actually carried running
    // totals across microbatches (4 staged files / 2 per trigger)
    val raw = spark.read
      .schema(org.apache.spark.sql.Encoders.product[graft.streaming.TwsTotals].schema)
      .parquet(graft.Fs.scratch("graft_stream_tws_sink"))
    assert(raw.count() > out.length,
      "expected multiple emissions per user across microbatches")
  }

  test("checkpoint recovery: a killed-and-resumed run equals the uninterrupted run") {
    // q3l delivers the 4 replay files as 2 then 2, with a full query
    // shutdown and a fresh query object resuming from the same
    // checkpoint in between; exactly-once restart means the sink must be
    // indistinguishable from q38's single uninterrupted run
    val recovered = Events.hourlyAggCheckpointRecovery(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val uninterrupted = Events.hourlyAggAppendSink(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(recovered.nonEmpty, "recovery run finalized no windows")
    assert(recovered == uninterrupted,
      s"recovered sink diverged: only-recovered=${recovered -- uninterrupted} " +
        s"only-uninterrupted=${uninterrupted -- recovered}")
  }

  test("append-mode file sink emits exactly the watermark-finalized hourly windows") {
    val appended = Events.hourlyAggAppendSink(spark, sfDir).collect().map(_.toSeq).toSet
    // append + 1h watermark finalizes a window once max event time − 1h
    // passes its end; the rest stay in state — so the sink holds exactly
    // the batch aggregate restricted to finalized windows
    val maxUs = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val expected = Events.hourlyAgg(spark, sfDir)
      .filter(col("hour_us") + 3600000000L <= maxUs - 3600000000L)
      .collect().map(_.toSeq).toSet
    assert(appended == expected,
      s"sink had ${appended.size} windows, expected ${expected.size} finalized")
  }

  test("streaming sessionization closes sessions at the 30-min gap") {
    val sessions = Events.sessionizeStreaming(spark, sfDir).collect()
    // emitted (closed) sessions must respect the gap invariant:
    // end - start sums n-1 gaps each ≤ 30 min
    sessions.foreach { r =>
      val n = r.getAs[Int]("n_events")
      val span = r.getAs[Long]("end_us") - r.getAs[Long]("start_us")
      assert(span <= (n - 1).max(0).toLong * 30L * 60 * 1000000,
        s"session spans $span us over $n events — gap rule violated")
    }
    // closed sessions are a subset of the batch sessionization's sessions
    val batch = Events.sessionize(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sessions.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Int]("n_events").toLong)
      assert(batch.contains(key), s"streamed session $key not found in batch result")
    }
  }

  test("dynamic-gap session_window conserves events and merges at least as much as the 15-min static gap") {
    val dyn = Events.sessionWindowDynamicGap(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(dyn.map(_.getAs[Long]("n_events")).sum == nEvents,
      "every event lands in exactly one session")
    dyn.foreach { r =>
      assert(r.getAs[Long]("end_us") > r.getAs[Long]("start_us"))
      assert(r.getAs[Long]("n_purchases") <= r.getAs[Long]("n_events"))
    }
    // the dynamic gap only ever EXTENDS the 15-min interval (60 for
    // purchases), so it can merge sessions but never split them:
    // per-user session counts are <= the all-15-min sessionization's
    val static15 = Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "15 minutes"), col("user_id"))
      .count().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dynCounts = dyn.groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.length.toLong }
    dynCounts.foreach { case (u, n) =>
      assert(n <= static15(u), s"user $u: dynamic gap split a static session")
    }
  }

  test("session_window agrees with the window-function sessionization") {
    val a = Events.sessionWindowAgg(spark, sfDir)
      .select("user_id", "start_us", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val b = Events.sessionize(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val deduped = stream.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val q = deduped.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_dedup_stream").start()
    def t(min: Int) = new java.sql.Timestamp(86400000L + min * 60000L)
    try {
      stream.addData((1L, t(0), 1.0), (2L, t(1), 1.0)); q.processAllAvailable()
      // exact replay of event 1 (at-least-once delivery) within watermark
      stream.addData((1L, t(0), 1.0), (3L, t(2), 1.0)); q.processAllAvailable()
    } finally q.stop()
    val n = spark.table("graft_dedup_stream").select("n").collect().map(_.getLong(0)).sum
    assert(n == 3, s"expected 3 distinct events after dedup, got $n")
  }

  test("transformWithState: ListState and MapState handles work across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[graft.streaming.TwsEvent]
    val out = stream.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new BufferStatsProcessor,
        TimeMode.None(), OutputMode.Append())
    val qname = "graft_tws_buffer_stream"
    graft.SessionConf.withConfs(spark,
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val q = out.toDF().writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(qname).start()
      try {
        stream.addData(
          graft.streaming.TwsEvent(1L, 1.2), graft.streaming.TwsEvent(1L, 1.7),
          graft.streaming.TwsEvent(2L, 5.5))
        q.processAllAvailable()
        stream.addData(
          graft.streaming.TwsEvent(1L, 3.1), graft.streaming.TwsEvent(2L, 5.9))
        q.processAllAvailable()
      } finally q.stop()
    }
    // last emission per user: user 1 buffered 3 values in bins {1,3};
    // user 2 buffered 2 values, both in bin 5 — ListState grew across
    // batches, MapState counted per-bin across batches
    val last = spark.table(qname).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (k, rs) => k -> rs.maxBy(_.getAs[Long]("n_buffered")) }
    assert(last(1L).getAs[Long]("n_buffered") == 3)
    assert(last(1L).getAs[Long]("n_bins") == 2)
    assert(last(2L).getAs[Long]("n_buffered") == 2)
    assert(last(2L).getAs[Long]("n_bins") == 1)
  }

  test("transformWithState: event-time timers fire when the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[TwsTimedEvent]
    val out = stream.toDS()
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new TimerCountProcessor,
        TimeMode.EventTime(), OutputMode.Append())
    val qname = "graft_tws_timer_stream"
    def t(min: Int) = new java.sql.Timestamp(86400000L + min * 60000L)
    graft.SessionConf.withConfs(spark,
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val q = out.toDF().writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(qname).start()
      try {
        // batch 1: watermark is still at its initial floor, so both
        // keys register timers just past it
        stream.addData(TwsTimedEvent(t(0), 1L, 1.0), TwsTimedEvent(t(0), 2L, 2.0))
        q.processAllAvailable()
        // batch 2: event time advances the watermark far past the
        // registered timers -> both keys' timers fire
        stream.addData(TwsTimedEvent(t(60), 1L, 3.0))
        q.processAllAvailable()
      } finally q.stop()
    }
    val rows = spark.table(qname).collect()
    val closed = rows.filter(_.getAs[Boolean]("closed"))
    // both keys' timers fired. Observed engine order: expired timers
    // run BEFORE the batch's input rows, so key 1's batch-2 event lands
    // AFTER its first close, opens a fresh account + timer, and the
    // trailing watermark-flush batch closes that one too — key 1 closes
    // twice, each covering one event
    assert(closed.map(_.getAs[Long]("user_id")).toSet == Set(1L, 2L),
      s"every key must be timer-closed, got: ${closed.mkString(", ")}")
    val u2 = closed.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2.head.getAs[Long]("n") == 1L,
      "key 2: exactly one close covering its single event")
    // closure conservation: every input event is covered by exactly one
    // timer close (state cleared at each close)
    assert(closed.map(_.getAs[Long]("n")).sum == 3L)
  }

  test("stream-stream interval join emits exactly the batch join's pairs") {
    val streamed = Events.streamStreamJoin(spark, sfDir).collect().map(_.toSeq).toSet
    val c = Tables.events(spark, sfDir).filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val batch = c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(unix_micros(date_trunc("hour", col("p_ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("purchase_id").as("n_purchases"),
        countDistinct("c_user").as("n_users"),
        round(sum("p_value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture produced no click->purchase pairs")
    assert(streamed == batch)
  }

  test("ohlcBars: open/close are the chronological extremes, high≥low") {
    val bars = Events.ohlcBars(spark, sfDir).collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      assert(b.getAs[Double]("high") >= b.getAs[Double]("low"))
      assert(b.getAs[Double]("open") <= b.getAs[Double]("high") + 0.01)
      assert(b.getAs[Double]("close") >= b.getAs[Double]("low") - 0.01)
    }
    // replay one bar chronologically from the raw table
    val first = bars.head
    val hourUs = first.getAs[Long]("hour_us")
    val et = first.getAs[String]("event_type")
    val raw = Tables.events(spark, sfDir)
      .where(unix_micros(date_trunc("hour", col("ts"))) === hourUs &&
        col("event_type") === et)
      .select("ts", "event_id", "value").collect()
      .sortBy { r => // micros precision: getTime truncates to ms
        val i = r.getTimestamp(0).toInstant
        (i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getLong(1))
      }
    assert(first.getAs[Double]("open") == raw.head.getDouble(2))
    assert(first.getAs[Double]("close") == raw.last.getDouble(2))
    assert(first.getAs[Long]("n") == raw.length)
  }

  test("partitioned streaming sink equals the flat sink restricted to the filter") {
    val part = Events.hourlyAggPartitionedSink(spark, sfDir).collect()
    assert(part.nonEmpty)
    assert(part.forall(_.getAs[Boolean]("partition_pruned")),
      "partition filter must prune directories, not scan them all")
    assert(part.map(_.getAs[String]("event_type")).toSet
      .subsetOf(Set("click", "purchase")))
    val flat = Events.hourlyAggAppendSink(spark, sfDir).collect()
      .filter(r => Set("click", "purchase")(r.getAs[String]("event_type")))
      .map(r => (r.getAs[Long]("hour_us"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    val partSet = part.map(r => (r.getAs[Long]("hour_us"),
      r.getAs[String]("event_type"), r.getAs[Long]("n"),
      r.getAs[Double]("sum_value"))).toSet
    assert(partSet == flat,
      "partitioning the sink must not change the finalized-window content")
  }

  test("cohortRetention: offset-0 covers the cohort, retention bounded") {
    val rows = Events.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, cs) =>
      val byOff = cs.map(r => r.getAs[Long]("offset_weeks") -> r).toMap
      // a user's signup week is an active week, so offset 0 = full cohort
      assert(byOff.contains(0L))
      assert(byOff(0L).getAs[Double]("retention") == 1.0)
      cs.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
        val ret = r.getAs[Double]("retention")
        assert(ret > 0.0 && ret <= 1.0)
      }
    }
    // cohort sizes must sum to the number of signed-up users
    val signup = Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    val sizes = rows.groupBy(_.getAs[Long]("cohort_week"))
      .map(_._2.head.getAs[Long]("cohort_size")).sum
    assert(sizes == signup)
  }

  test("funnelConversion: monotone stage counts, conversions in (0,1]") {
    val rows = Events.funnelConversion(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("stage")) sameElements Array(1L, 2L, 3L))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), "funnel must be monotone non-increasing")
    assert(ns(0) > 0, "fixture has views")
    assert(rows(0).isNullAt(rows(0).fieldIndex("conv_prev")))
    rows.drop(1).foreach { r =>
      val c = r.getAs[Double]("conv_prev")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("stream-stream LEFT OUTER join equals the batch left join (sentinel flush)") {
    val streamed = Events.streamStreamLeftOuterJoin(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val c = Tables.events(spark, sfDir).filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val batch = c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .groupBy(unix_micros(date_trunc("hour", col("c_ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        countDistinct("click_id").as("n_clicks"),
        round(sum(coalesce(col("p_value"), lit(0.0))), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(batch.exists(_(2).asInstanceOf[Long] > 0L),
      "fixture must contain unmatched clicks or the outer path is untested")
    assert(streamed == batch)
  }

  test("stream-static join emits the finalized windows of the batch join") {
    val streamed = Events.streamStaticJoin(spark, sfDir).collect().map(_.toSeq).toSet
    val dim = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment"))
    val maxUs = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val batch = Tables.events(spark, sfDir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .filter(col("hour_us") + 3600000000L <= maxUs - 3600000000L)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("qay temporal join: streamed point-in-time enrichment equals the " +
      "batch replay; SCD2 invariant audit holds; historical versions hit") {
    val out = Events.streamTemporalJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("one_version_per_event")),
      "an event matched more than one SCD2 version")
    val streamed = out.map(r => (r.getAs[Long]("hour_us"),
      r.getAs[String]("priority"), r.getAs[Long]("n"),
      r.getAs[Double]("sum_value"))).toSet
    // batch replay of the identical join + q38 finalization rule
    val dim = graft.sources.Warehouse.scd2Customers(spark, sfDir)
      .select(col("o_custkey").as("d_custkey"), col("priority"),
        col("effective_from_us"), col("effective_to_us"))
    val b = dim.agg(min("effective_from_us"), max("effective_from_us")).head()
    val lo = b.getLong(0); val span = b.getLong(1) - lo + 1L
    val maxUs = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val joined = Tables.events(spark, sfDir)
      .withColumn("mapped_us", lit(lo) + pmod(unix_micros(col("ts")), lit(span)))
      .join(dim, col("user_id") === col("d_custkey") &&
        col("mapped_us") >= col("effective_from_us") &&
        col("mapped_us") < col("effective_to_us"))
    val batch = joined
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("priority"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .filter(col("hour_us") + 3600000000L <= maxUs - 3600000000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // the era fold must exercise HISTORICAL versions, not just current
    val nonCurrent = joined
      .filter(col("effective_to_us") < graft.sources.Warehouse.Scd2OpenEndUs)
      .count()
    assert(nonCurrent > 0L,
      "temporal predicate never selected a closed version — dead weight")
  }

  test("foreachBatch partial aggregates merge to the batch aggregate") {
    val streamed = Events.foreachBatchPartials(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("late rows beyond the watermark are dropped (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = stream.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(sum("value").as("s"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("graft_wm_test").start()
    def t(min: Int) = new java.sql.Timestamp(3600L * 1000 * 24 + min * 60000L)
    try {
      stream.addData((t(0), 1.0), (t(5), 1.0)); q.processAllAvailable()
      stream.addData((t(40), 1.0)); q.processAllAvailable() // advances watermark past win0
      stream.addData((t(1), 100.0)); q.processAllAvailable() // late: dropped
      stream.addData((t(60), 1.0)); q.processAllAvailable()
    } finally q.stop()
    val w0 = spark.table("graft_wm_test")
      .filter(unix_timestamp(col("window.start")) % 86400 === 0)
      .select("s").collect()
    assert(w0.length == 1 && w0.head.getDouble(0) == 2.0,
      s"late row leaked into closed window: ${w0.mkString}")
  }

  test("q3y late-data plant: first hour arrives last, is dropped, and the metric matches the planted groups") {
    val out = Events.lateDataDrop(spark, sfDir).collect()
    assert(out.nonEmpty, "no finalized windows emitted")
    val ev = Tables.events(spark, sfDir)
    val h0End = ev.agg(
      (min(unix_micros(date_trunc("hour", col("ts")))) + 3600000000L))
      .head().getLong(0)
    val expectLate = ev.where(unix_micros(col("ts")) < h0End)
    val expectEvents = expectLate.count()
    val expectGroups = expectLate
      .select(date_trunc("hour", col("ts")), col("event_type")).distinct().count()
    assert(expectEvents > 0, "fixture plants no late rows — test is vacuous")
    out.foreach { r =>
      assert(r.getAs[Long]("n_late_events") == expectEvents)
      assert(r.getAs[Long]("n_late_state_rows_dropped") == expectGroups,
        "watermark drop metric diverged from the planted late groups")
      // the dropped hour must never surface as a finalized window
      assert(r.getAs[Long]("hour_us") >= h0End,
        s"late first-hour window leaked into the sink: ${r.mkString(",")}")
    }
  }

  test("streaming daily approx-distinct: every window in the ±5% band, exact side replayed (q3t)") {
    val rows = graft.streaming.Events
      .dailyApproxDistinctStreaming(spark, sfDir).collect()
    val exactByDay = graft.Tables.events(spark, sfDir)
      .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == exactByDay.size, "a daily window went missing")
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") == exactByDay(r.getAs[Long]("day_us")))
      assert(r.getAs[Boolean]("approx_ok"), s"sketch out of band: $r")
    }
  }

  test("q9m stream contract: merged verdicts equal the one-batch suite; " +
      "the calibrated cap constraint fails; multiple batches ran") {
    import org.apache.spark.sql.functions.col
    val rows = graft.streaming.Events.streamContract(spark, sfDir).collect()
    assert(rows.length == 4)
    val events = Tables.events(spark, sfDir)
    val n = events.count()
    val capViolations = events.where(col("value") > 80.0).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("checked") == n,
        "every constraint must have checked the full stream exactly once")
      assert(r.getAs[Boolean]("multi_batch"),
        "the replay must exercise more than one micro-batch")
      assert(r.getAs[Boolean]("pass") == (r.getAs[Long]("violations") == 0L))
    }
    val byName = rows.map(r => r.getAs[String]("constraint_name") -> r).toMap
    assert(byName("value_cap_80").getAs[Long]("violations") == capViolations)
    assert(capViolations > 0L, "the cap constraint must bind on the fixture")
    for (ok <- Seq("user_id_complete", "type_domain", "value_nonneg"))
      assert(byName(ok).getAs[Long]("violations") == 0L, s"$ok must pass")
  }

  test("qbz state metrics: retained rows equal the closed-form watermark arithmetic") {
    import org.apache.spark.sql.functions._
    val row = graft.streaming.Events.stateMetrics(spark, sfDir).collect()(0)
    assert(row.getAs[Boolean]("four_arrivals"))
    val ev = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wmUs = (ev.map(_._1).max / 1000L - 3600000L) * 1000L
    assert(row.getAs[Long]("watermark_us") == wmUs)
    val retained = ev.map { case (us, t) => (us / 3600000000L, t) }.distinct
      .count { case (h, _) => h * 3600000000L + 3600000000L > wmUs }
    assert(row.getAs[Long]("n_state_rows") == retained.toLong)
    // the bounded-state property itself: watermarked hourly state can
    // hold at most 2 open hours x |event types|
    assert(row.getAs[Long]("n_state_rows") <= 2L * 5L)
  }

  test("qbg state-store read: buffers equal the batch aggregate across the restart; earlier batch state is a strict prefix") {
    import org.apache.spark.sql.functions._
    val rows = graft.streaming.Events.stateStoreRead(spark, sfDir).collect()
    val truth = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.length == truth.size)
    rows.foreach { r =>
      val t = truth(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == t.getAs[Long]("n"))
      assert(r.getAs[Long]("sum_cents") == t.getAs[Long]("sum_cents"))
      assert(r.getAs[Boolean]("sharded"))
    }
    // time travel: state at an EARLIER committed batch is a strict
    // prefix of the final totals (the reader's batchId option), proving
    // the files hold per-batch history, not just the final snapshot
    val ckpt = graft.Fs.scratch("graft_statestore_ckpt")
    val early = spark.read.format("statestore")
      .option("batchId", 0).load(ckpt)
      .agg(sum(col("value.count"))).collect()(0).getLong(0)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(early > 0L && early < total,
      s"batch-0 state ($early) must be a non-empty strict prefix of $total")
  }
}

/** Spec-side transformWithState processor exercising the OTHER typed
  * state handles (ListState buffer + MapState histogram) — top-level
  * for the Janino encoder constraint. Emits running
  * (buffer size, distinct bins) per key per batch. */
class BufferStatsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, graft.streaming.TwsEvent, TwsBufferStats] {
  import org.apache.spark.sql.streaming.{ListState, MapState, TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.{Encoders => E}

  @transient private var buf: ListState[java.lang.Double] = _
  @transient private var bins: MapState[java.lang.Long, java.lang.Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[java.lang.Double]("buf",
      E.DOUBLE.asInstanceOf[org.apache.spark.sql.Encoder[java.lang.Double]], TTLConfig.NONE)
    bins = getHandle.getMapState[java.lang.Long, java.lang.Long]("bins",
      E.LONG.asInstanceOf[org.apache.spark.sql.Encoder[java.lang.Long]],
      E.LONG.asInstanceOf[org.apache.spark.sql.Encoder[java.lang.Long]], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[graft.streaming.TwsEvent],
      timerValues: TimerValues): Iterator[TwsBufferStats] = {
    rows.foreach { e =>
      buf.appendValue(e.value)
      val bin = java.lang.Long.valueOf(math.floor(e.value).toLong)
      val prev = if (bins.containsKey(bin)) bins.getValue(bin).longValue else 0L
      bins.updateValue(bin, prev + 1L)
    }
    Iterator.single(TwsBufferStats(key,
      buf.get().size.toLong, bins.keys().size.toLong))
  }
}

case class TwsBufferStats(user_id: Long, n_buffered: Long, n_bins: Long)

/** Spec-side transformWithState processor exercising EVENT-TIME TIMERS:
  * counts per key, registers a timer just past the current watermark on
  * first sight, and when the watermark overtakes it, emits a CLOSED row
  * and clears state — the session/account-closure shape. */
class TimerCountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, TwsTimedEvent, TwsClosed] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var cnt: ValueState[java.lang.Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[java.lang.Long]("cnt",
      org.apache.spark.sql.Encoders.LONG
        .asInstanceOf[org.apache.spark.sql.Encoder[java.lang.Long]], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsTimedEvent],
      timerValues: TimerValues): Iterator[TwsClosed] = {
    val prev = if (cnt.exists()) cnt.get().longValue
    else {
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      0L
    }
    val n = prev + rows.size
    cnt.update(java.lang.Long.valueOf(n))
    Iterator.single(TwsClosed(key, n, closed = false))
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsClosed] = {
    val n = if (cnt.exists()) cnt.get().longValue else 0L
    cnt.clear()
    Iterator.single(TwsClosed(key, n, closed = true))
  }
}

case class TwsTimedEvent(ts: java.sql.Timestamp, user_id: Long, value: Double)
case class TwsClosed(user_id: Long, n: Long, closed: Boolean)
