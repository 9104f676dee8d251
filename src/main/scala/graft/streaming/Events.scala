package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Time-series / streaming operators over the `events` table
  * (SURVEY.md §2.3 "Streaming"). Batch forms first (oracle-checkable),
  * then the same logic as a Structured Streaming query replayed through
  * `MemoryStream` with an event-time watermark — which is how the
  * engine would run against a live source (Kafka etc.) on a cluster:
  * state is keyed and partitioned by group, watermark bounds state size.
  */
object Events {

  /** Tumbling 1-hour windows per event type (batch). Window start is
    * emitted as epoch micros so the oracle compare is representation-
    * independent. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_us", "event_type")

  /** Sliding windows (30 min size / 15 min slide) via the built-in
    * `window` generator — each event lands in 2 windows. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start_us", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap) in pure window
    * functions — lag to flag session starts, running sum to number the
    * sessions, then per-session rollup. Deterministic & oracle-checkable
    * (ties broken by event_id). One shuffle on user_id. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min("ts")).as("start_us"),
        unix_micros(max("ts")).as("end_us"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Built-in gap sessionization (`session_window`, 30-min gap) —
    * the declarative form of `sessionize` above. Start times and
    * per-session aggregates must agree with the window-function form
    * (asserted in StreamingSpec); the window END differs by design
    * (session_window extends end by the gap). */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")

  case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** The hourly aggregation as a genuine Structured Streaming query:
    * the batch `events` table is replayed through a MemoryStream in
    * chunks, with a 1-hour event-time watermark and append output —
    * late rows beyond the watermark are dropped by the engine. Returns
    * the final result table (must equal `hourlyAgg` on in-order replay;
    * asserted in StreamingSpec). */
  def hourlyAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect() // fixture-sized replay driver; a real source streams
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(
        window(col("ts"), "1 hour").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val qname = "graft_hourly_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // stateful-operator partition count is fixed from shuffle.partitions
    // at query start; 8 is plenty for the replay and saves 4× on
    // per-microbatch state-store overhead vs a 32-core batch default
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(qname).start()
    try {
      batch.grouped(math.max(1, batch.length / 8)).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(qname)
      .select(
        unix_micros(col("win.start")).as("hour_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_us", "event_type")
  }

  case class SessionOut(
      user_id: Long, n_events: Int, sum_value: Double, start_us: Long, end_us: Long)

  case class Sess(start: Long, end: Long, n: Int, sum: Double)

  /** Custom stateful sessionization with `flatMapGroupsWithState` —
    * the hand-managed-state surface (SURVEY §7.4 #6): per-user state is
    * the open session; an event past the 30-min gap closes and emits it.
    * Replayed through MemoryStream; final open sessions are flushed via
    * state timeout semantics (here: end-of-replay sentinel assertion in
    * StreamingSpec). */
  def sessionizeStreaming(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 30L * 60 * 1000000
    val batch = Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime) // fixture-sized replay driver
    val stream = MemoryStream[Ev]

    val out = stream.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Sess, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Sess]) =>
          // full microsecond precision: getTime is millis-truncated, the
          // sub-ms part lives in getNanos (batch uses unix_micros, which
          // keeps it — mixing the two loses sessions on sub-ms events)
          def micros(t: Timestamp): Long =
            t.getTime * 1000 + (t.getNanos % 1000000) / 1000
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.value))
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val tUs = micros(e.ts)
            cur match {
              case Some(s) if tUs - s.end <= gapUs =>
                cur = Some(Sess(s.start, tUs, s.n + 1, s.sum + e.value))
              case Some(s) =>
                closed += SessionOut(uid, s.n, math.round(s.sum * 100) / 100.0, s.start, s.end)
                cur = Some(Sess(tUs, tUs, 1, e.value))
              case None =>
                cur = Some(Sess(tUs, tUs, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
    val qname = "graft_sess_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = out.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(qname).start()
    try {
      batch.grouped(math.max(1, batch.length / 4)).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(qname).orderBy("user_id", "start_us")
  }
}
