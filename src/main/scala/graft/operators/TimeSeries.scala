package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the event stream: exponential smoothing
  * and Markov transition structure — the monitoring/sequence-modeling
  * companions to the windowed aggregates in [[graft.streaming.Events]].
  */
object TimeSeries {

  /** q3m: EWMA of hourly event volume per type, half-life decay over a
    * bounded 12-hour window.
    *
    * Determinism is designed in, not hoped for (the q1e lesson):
    *  - smoothed SERIES input is the hourly COUNT — an exact integer,
    *    where an avg/sum of doubles would already be engine-ulp noise;
    *  - decay is dyadic (w = 2^-Δ): every weight 2^(11-Δ) is an exact
    *    IEEE integer both engines compute identically from `pow`;
    *  - numerator/denominator are therefore exact INTEGER sums —
    *    order-independent under any shuffle — and the only float op is
    *    one final division, floored at milli grain.
    *
    * Plan shape: one scan → hourly hash aggregate (tiny), then the
    * 12-lag weighting as an EXPLODE(0..11) + equi join of the aggregate
    * against itself on (type, hour) — the q37 trick: a window-frame-
    * with-position-weights has no window-aggregate form, and the equi
    * join keeps it shuffle-bounded instead of re-scanning facts. The
    * incomplete warm-up prefix normalizes by the weights actually
    * present (pandas ewm adjust=true semantics). */
  def ewmaHourly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
    val cur = hourly
      .withColumn("delta", explode(sequence(lit(0), lit(11))))
      .withColumn("ph", col("h") - col("delta"))
    val prev = hourly.select(
      col("event_type").as("p_type"), col("h").as("p_h"), col("n").as("pn"))
    cur.join(prev, cur("event_type") === prev("p_type") && cur("ph") === prev("p_h"))
      .withColumn("w", pow(lit(2.0), lit(11) - col("delta")).cast("long"))
      .groupBy("event_type", "h", "n")
      .agg(sum(col("pn") * col("w")).as("num"), sum(col("w")).as("den"))
      .withColumn("ewma_milli",
        floor(col("num").cast("double") / col("den") * 1000.0 + 0.5))
      .orderBy("event_type", "h")
  }

  def ewmaHourlyOracle: String = """
    WITH hourly AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
             count(1) AS n
      FROM events GROUP BY 1, 2),
    d AS (SELECT unnest(range(0, 12)) AS delta),
    j AS (
      SELECT c.event_type, c.h, c.n, p.n AS pn,
             CAST(pow(2.0, 11 - d.delta) AS BIGINT) AS w
      FROM hourly c CROSS JOIN d
      JOIN hourly p ON p.event_type = c.event_type AND p.h = c.h - d.delta)
    SELECT event_type, h, CAST(n AS BIGINT) AS n,
           CAST(sum(pn * w) AS BIGINT) AS num,
           CAST(sum(w) AS BIGINT) AS den,
           CAST(floor(CAST(sum(pn * w) AS DOUBLE) / sum(w) * 1000.0 + 0.5)
             AS BIGINT) AS ewma_milli
    FROM j GROUP BY event_type, h, n
    ORDER BY event_type, h"""

  /** q3n: MARKOV TRANSITION MATRIX of user event sequences — for each
    * (from_type → to_type) pair, the count and row-normalized
    * probability (ppm integer) of a user's next event, order pinned by
    * (ts, event_id) so exact-timestamp ties are deterministic. The
    * sequence structure a funnel (q3i) summarizes is read here as the
    * full first-order chain — what a behavioral model trains on.
    * One window pass (per-user shuffle+sort, the q32 shape) and a
    * 25-cell aggregate; p_ppm from integer counts, no float drift. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val nxt = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = nxt
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_type")
    counts.withColumn("p_ppm",
        floor(col("n").cast("double") / sum(col("n")).over(byFrom) * 1e6 + 0.5))
      .orderBy("from_type", "to_type")
  }

  def eventTransitionsOracle: String = """
    WITH nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events),
    counts AS (
      SELECT from_type, to_type, count(1) AS n
      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
             * 1e6 + 0.5) AS BIGINT) AS p_ppm
    FROM counts ORDER BY from_type, to_type"""

  /** q3o: HOURLY VOLUME ANOMALIES — the alerting read over q3m's
    * series: hours whose event count sits more than 3 population
    * standard deviations from that type's mean.
    *
    * Mean and variance come from the exact integer moments (Σn, Σn²)
    * of the hourly counts: `var = Σn²/k − (Σn/k)²` evaluates the same
    * doubles in every engine because the inputs are integers and
    * division/sqrt are correctly-rounded IEEE ops — so the z-scores
    * and the ±3σ cut are deterministic, no q1e-style boundary risk.
    * The anomaly filter runs on the INTEGER milli-z (|z| ≥ 3000),
    * and each row carries its type's anomaly count (window) so the
    * output is self-contained. One scan → hourly aggregate → per-type
    * window over ≤|types|·|hours| rows. */
  def volumeAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy("event_type")
    val k = count(lit(1)).over(byType).cast("double")
    val mean = sum(col("n")).over(byType) / k
    val varPop = sum(col("n") * col("n")).over(byType) / k - mean * mean
    val z = hourly
      .withColumn("z_milli",
        floor((col("n") - mean) / sqrt(varPop) * 1000 + 0.5))
      .filter(abs(col("z_milli")) >= 3000)
    z.withColumn("n_anomalies", count(lit(1)).over(byType))
      .select("event_type", "h", "n", "z_milli", "n_anomalies")
      .orderBy("event_type", "h")
  }

  def volumeAnomaliesOracle: String = """
    WITH hourly AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
             count(1) AS n
      FROM events GROUP BY 1, 2),
    z AS (
      SELECT event_type, h, CAST(n AS BIGINT) AS n,
             CAST(floor((n - sum(n) OVER w / CAST(count(1) OVER w AS DOUBLE))
               / sqrt(sum(n * n) OVER w / CAST(count(1) OVER w AS DOUBLE)
                 - (sum(n) OVER w / CAST(count(1) OVER w AS DOUBLE))
                   * (sum(n) OVER w / CAST(count(1) OVER w AS DOUBLE)))
               * 1000 + 0.5) AS BIGINT) AS z_milli
      FROM hourly
      WINDOW w AS (PARTITION BY event_type)),
    f AS (SELECT * FROM z WHERE abs(z_milli) >= 3000)
    SELECT event_type, h, n, z_milli,
           count(1) OVER (PARTITION BY event_type) AS n_anomalies
    FROM f ORDER BY event_type, h"""
}
