package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** qac: KAPLAN–MEIER SURVIVAL — time-to-milestone with RIGHT
    * CENSORING, the estimator a naive "average days to 5th event"
    * silently biases by dropping every user who hasn't got there yet:
    * users reaching their `eventAt`-th event contribute an observed
    * duration, everyone else is censored at the study end, and
    * S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) weighs both correctly.
    *
    * Scale shape: per-user durations ride ONE (user; ts, event_id)
    * window pass; the KM table itself is a ≤|days| histogram — the
    * at-risk count n_i is N minus the prior-day cumulative departures
    * (a window over the histogram, never a days×subjects range join).
    * The survival product forms as exp(Σ ln(1 − d/n)) over exact
    * integer ratios — the one libm chain, identical expression tree in
    * both engines (the q1n precedent); a day that exhausts the risk
    * set pins the curve at an exact 0 via a cumulative EXTINCTION flag
    * (ln(0) is engine-divergent: Spark nulls it, DuckDB raises).
    * Median survival is the first day the curve crosses 0.5, folded
    * as a window min. */
  def kaplanMeier(spark: SparkSession, dir: String,
      eventAt: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
    val perUser = ev.withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(min("us").as("t0"),
        max(when(col("rn") === eventAt, col("us"))).as("tk"))
    val end = ev.agg(max("us").as("end_us"))
    val subj = perUser.crossJoin(broadcast(end))
      .select(
        when(col("tk").isNotNull, 1L).otherwise(0L).as("observed"),
        (lit(1L) + expr("(coalesce(tk, end_us) - t0) div 86400000000"))
          .as("day"))
    val histo = subj.groupBy("day").agg(
      sum("observed").as("d"),
      sum(lit(1L) - col("observed")).as("c"))
    val byDay = Window.orderBy("day")
    val all = Window.partitionBy() // <=|days| rows — bounded histogram
    histo
      .withColumn("n_total", sum(col("d") + col("c")).over(all))
      .withColumn("left_before", coalesce(sum(col("d") + col("c")).over(
        byDay.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("n_total") - col("left_before"))
      // a day that exhausts the risk set pins the curve at an exact 0
      // from then on — ln(0) is engine-divergent (Spark nulls, DuckDB
      // raises), so the extinction is a cumulative flag, not a -inf
      .withColumn("ln_term", when(col("d") > 0L && col("d") < col("n_risk"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk")))
        .otherwise(lit(0.0)))
      .withColumn("extinct", max((col("d") === col("n_risk")).cast("int"))
        .over(byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("surv_e6", when(col("extinct") === 1, 0L)
        .otherwise(floor(exp(sum("ln_term").over(
          byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          * 1e6 + 0.5).cast("long")))
      .withColumn("median_day",
        min(when(col("surv_e6") < 500000L, col("day"))).over(all))
      .select(col("day"), col("n_risk"), col("d"), col("c"),
        col("surv_e6"), col("n_total"), col("median_day"))
      .orderBy("day")
  }

  def kaplanMeierOracle: String = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events),
    pu AS (
      SELECT user_id, min(us) AS t0,
             max(CASE WHEN rn = 5 THEN us END) AS tk
      FROM ev GROUP BY user_id),
    fin AS (SELECT max(us) AS end_us FROM ev),
    subj AS (
      SELECT CASE WHEN tk IS NOT NULL THEN 1 ELSE 0 END AS observed,
             1 + (coalesce(tk, fin.end_us) - t0) // 86400000000 AS day
      FROM pu CROSS JOIN fin),
    h AS (
      SELECT day, CAST(sum(observed) AS BIGINT) AS d,
             CAST(sum(1 - observed) AS BIGINT) AS c
      FROM subj GROUP BY day),
    km AS (
      SELECT *,
             CAST(sum(d + c) OVER () AS BIGINT) AS n_total,
             CAST(coalesce(sum(d + c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS left_before
      FROM h),
    km2 AS (
      SELECT day, d, c, n_total,
             n_total - left_before AS n_risk,
             CASE WHEN d > 0 AND d < n_total - left_before
               THEN ln(1.0 - CAST(d AS DOUBLE) / (n_total - left_before))
               ELSE 0.0 END AS ln_term,
             CASE WHEN d = n_total - left_before THEN 1 ELSE 0 END
               AS ext0
      FROM km),
    km3 AS (
      SELECT day, CAST(n_risk AS BIGINT) AS n_risk, d, c, n_total,
             CAST(CASE WHEN max(ext0) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
               THEN 0
               ELSE floor(exp(sum(ln_term) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 * 1e6 + 0.5) END AS BIGINT) AS surv_e6
      FROM km2)
    SELECT day, n_risk, d, c, surv_e6, n_total,
           CAST(min(CASE WHEN surv_e6 < 500000 THEN day END) OVER ()
             AS BIGINT) AS median_day
    FROM km3 ORDER BY day"""

  /** qa2: CONTEXT-2 TRAINING PAIRS — next-event-prediction dataset
    * construction, the supervised-example step a behavioral model's
    * data pipeline runs on raw event logs: (two-event context →
    * next event) examples with conditional probability and LIFT over
    * the label's base rate — the second-order extension of q3n's
    * first-order chain, surfacing sequence structure the 1-step
    * matrix marginalizes away.
    *
    * ONE per-user window pass (two lags ride the same shuffle+sort —
    * the q32 shape), then everything runs on the ≤|types|³-cell
    * aggregate: context support, label marginal, and the corpus total
    * are all windows over that bounded cell table (no second corpus
    * pass, no joins). p_ppm and lift_ppm form the q3n way — floor of
    * an IEEE division of exact integer operands, identical expression
    * tree both engines (operands cast to double BEFORE multiplying so
    * the arithmetic is engine-identical at any scale). Top-20 by
    * support with a full deterministic tie order plans as
    * TakeOrderedAndProject. */
  def contextTrainingPairs(spark: SparkSession, dir: String,
      topK: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("c1", lag("event_type", 1).over(w))
      .withColumn("c2", lag("event_type", 2).over(w))
      .where(col("c1").isNotNull && col("c2").isNotNull)
      .groupBy(col("c2").as("ctx_a"), col("c1").as("ctx_b"),
        col("event_type").as("label"))
      .agg(count(lit(1)).as("n"))
    val byCtx = Window.partitionBy("ctx_a", "ctx_b")
    val byLabel = Window.partitionBy("label")
    val all = Window.partitionBy() // <=|types|^3 cells — bounded
    cells
      .withColumn("ctx_n", sum("n").over(byCtx))
      .withColumn("label_n", sum("n").over(byLabel))
      .withColumn("total", sum("n").over(all))
      .withColumn("p_ppm", floor(
        col("n").cast("double") / col("ctx_n") * 1e6 + 0.5).cast("long"))
      .withColumn("lift_ppm", floor(
        (col("n").cast("double") * col("total").cast("double"))
          / (col("ctx_n").cast("double") * col("label_n").cast("double"))
          * 1e6 + 0.5).cast("long"))
      .orderBy(col("n").desc, col("ctx_a"), col("ctx_b"), col("label"))
      .limit(topK)
      .withColumn("rank", row_number().over(Window.partitionBy()
        .orderBy(col("n").desc, col("ctx_a"), col("ctx_b"), col("label"))))
      .select(col("rank"), col("ctx_a"), col("ctx_b"), col("label"),
        col("n"), col("ctx_n"), col("label_n"), col("total"),
        col("p_ppm"), col("lift_ppm"))
      .orderBy("rank")
  }

  def contextTrainingPairsOracle: String = """
    WITH lagged AS (
      SELECT event_type AS label,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS c1,
             lag(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS c2
      FROM events),
    cells AS (
      SELECT c2 AS ctx_a, c1 AS ctx_b, label,
             CAST(count(1) AS BIGINT) AS n
      FROM lagged WHERE c1 IS NOT NULL AND c2 IS NOT NULL
      GROUP BY 1, 2, 3),
    m AS (
      SELECT *,
             CAST(sum(n) OVER (PARTITION BY ctx_a, ctx_b) AS BIGINT)
               AS ctx_n,
             CAST(sum(n) OVER (PARTITION BY label) AS BIGINT) AS label_n,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM cells),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY n DESC, ctx_a, ctx_b, label)
               AS rank
      FROM m)
    SELECT CAST(rank AS INTEGER) AS rank, ctx_a, ctx_b, label, n, ctx_n,
           label_n, total,
           CAST(floor(CAST(n AS DOUBLE) / ctx_n * 1e6 + 0.5) AS BIGINT)
             AS p_ppm,
           CAST(floor((CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
             / (CAST(ctx_n AS DOUBLE) * CAST(label_n AS DOUBLE))
             * 1e6 + 0.5) AS BIGINT) AS lift_ppm
    FROM r WHERE rank <= 20 ORDER BY rank"""

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

  /** q3s: AUTOCORRELATION FUNCTION of the hourly volume series — the
    * first diagnostic a forecaster runs (is there memory? is there a
    * daily cycle? → is lag-24 the dominant coefficient?). The textbook
    * estimator needs deviations from the mean — a rational number — so
    * the engine computes with deviations SCALED BY k (d_t = k·n_t − S,
    * exact integers): r_L = Σ d_t·d_{t−L} / Σ d_t², with the k² factor
    * cancelling exactly. Lag alignment is a self-JOIN on h−L, not a
    * window lag — the spine may have empty hours, and a row-offset lag
    * would silently pair non-adjacent hours across gaps; the join pairs
    * exactly the (t, t−L) that both exist. All sums are exact integers;
    * the single division per lag is correctly rounded. The series is
    * pre-aggregated (720 rows at any corpus scale), so every stage past
    * the first aggregate is spine-sized. */
  def volumeAcf(spark: SparkSession, dir: String,
      lags: Seq[Int] = Seq(1, 2, 3, 24)): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
    val tot = hourly.agg(sum("n").as("s"), count(lit(1)).as("k"))
    val d = hourly.crossJoin(broadcast(tot))
      .select(col("h"), (col("n") * col("k") - col("s")).as("d"))
      .cache() // feeds the denominator and every lag join
    val den = d.agg(sum(col("d") * col("d")).as("den"))
    val lagDim = lags.toDF("lag")
    d.crossJoin(broadcast(lagDim))
      .withColumn("h_prev", col("h") - col("lag"))
      .join(d.select(col("h").as("h_prev"), col("d").as("d_prev")), "h_prev")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("d") * col("d_prev")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        col("num"), col("den"),
        floor(col("num").cast("double") / col("den") * 1e6 + 0.5).as("acf_e6"))
      .orderBy("lag")
  }

  def volumeAcfOracle: String = """
    WITH hourly AS (
      SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
             count(1) AS n
      FROM events GROUP BY 1),
    tot AS (SELECT sum(n) AS s, count(1) AS k FROM hourly),
    d AS (SELECT h, n * k - s AS d FROM hourly CROSS JOIN tot),
    den AS (SELECT sum(d * d) AS den FROM d),
    lags AS (SELECT unnest([1, 2, 3, 24]) AS lag),
    p AS (
      SELECT l.lag, count(1) AS n_pairs, sum(a.d * b.d) AS num
      FROM d a CROSS JOIN lags l JOIN d b ON b.h = a.h - l.lag
      GROUP BY l.lag)
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(num AS BIGINT) AS num,
           CAST(den.den AS BIGINT) AS den,
           CAST(floor(CAST(num AS DOUBLE) / den.den * 1e6 + 0.5) AS BIGINT)
             AS acf_e6
    FROM p CROSS JOIN den ORDER BY lag"""

  /** q3r: SEASONAL PROFILE — the hour-of-day seasonality index per
    * event type (the deseasonalization denominator every forecasting /
    * anomaly pipeline needs before q3o's z-scores mean anything):
    * index = observed share of an hour-of-day slot vs the uniform 1/24
    * expectation, in ppm. Exact-integer encoding: `floor(n_hod · 24e6 /
    * total + 0.5)` is one correctly-rounded division of exact integers
    * (no float sums anywhere); the per-type peak slot is flagged via a
    * (count DESC, hod ASC) rank over the ≤|types|·24 profile rows. One
    * fact-table aggregate; everything downstream is on the tiny
    * profile. */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    val hod = Tables.events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy("event_type")
    hod
      .withColumn("total", sum("n").over(byType))
      .withColumn("index_ppm",
        floor((col("n") * 24L * 1000000L).cast("double") / col("total") + 0.5))
      .withColumn("is_peak",
        row_number().over(byType.orderBy(col("n").desc, col("hod").asc)) === 1)
      .select("event_type", "hod", "n", "total", "index_ppm", "is_peak")
      .orderBy("event_type", "hod")
  }

  def seasonalProfileOracle: String = """
    WITH hod AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, count(1) AS n
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, hod, n,
             sum(n) OVER (PARTITION BY event_type) AS total,
             row_number() OVER (PARTITION BY event_type
               ORDER BY n DESC, hod ASC) AS rn
      FROM hod)
    SELECT event_type, hod, CAST(n AS BIGINT) AS n,
           CAST(total AS BIGINT) AS total,
           CAST(floor(CAST(n * 24 * 1000000 AS DOUBLE) / total + 0.5)
             AS BIGINT) AS index_ppm,
           rn = 1 AS is_peak
    FROM t ORDER BY event_type, hod"""

  /** q3p: MAX CONCURRENCY — the interval sweep line (how many sessions
    * are simultaneously open?), the classic "overlapping intervals"
    * aggregate that has no single-window form. Sessions are q32's gap
    * sessions (SHARED pipeline — [[graft.streaming.Events.sessionize]] —
    * so the two graded queries can never drift); each contributes a +1
    * edge at start_us and a −1 at end_us, closed-interval rule (+1
    * sorts before −1 at the same instant, via `delta DESC`).
    *
    * The naive form — one global ORDER BY over every edge — is the
    * single-partition-window trap at 100 TB. This is the two-level
    * decomposition instead: a per-HOUR prefix sum (window partitioned
    * by hour — bounded partitions, parallel across the cluster) gives
    * each hour's local running max and net change; then one prefix sum
    * over the HOURLY aggregate (≤ a few thousand rows for years of
    * data — the gap-fill-spine exception where a global window is a
    * bounded dimension, not the fact table) converts local maxima to
    * global concurrency. Within a tie group (same us, same delta) the
    * prefix maximum is order-invariant — k tied +1 edges yield prefix
    * values o+1..o+k in every permutation — so the result is exact
    * integers, deterministic under any shuffle. */
  def maxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val sessions = graft.streaming.Events.sessionize(spark, dir)
      .select(col("start_us"), col("end_us"))
    val deltas = sessions.select(col("start_us").as("us"), lit(1L).as("delta"))
      .unionByName(sessions.select(col("end_us").as("us"), lit(-1L).as("delta")))
      .withColumn("h", expr("us div 3600000000"))
    val byHour = Window.partitionBy("h").orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = deltas
      .withColumn("run", sum("delta").over(byHour))
      .groupBy("h")
      .agg(max("run").as("local_max"), sum("delta").as("net"),
        count(lit(1)).as("n_edges"))
    val prevHours = Window.orderBy("h")
      .rowsBetween(Window.unboundedPreceding, -1)
    hourly
      .withColumn("offset", coalesce(sum("net").over(prevHours), lit(0L)))
      .select(col("h"),
        (col("offset") + col("local_max")).as("max_concurrent"),
        (col("offset") + col("net")).as("end_concurrent"),
        col("n_edges"))
      .orderBy("h")
  }

  /** DuckDB replays the sweep naively (one global ordering) — the
    * two-level Spark plan is algebraically identical: max(global run)
    * within an hour = hour offset + max(local run). */
  def maxConcurrencyOracle: String = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessed AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    sess AS (
      SELECT epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
      FROM sessed GROUP BY user_id, session_id),
    deltas AS (
      SELECT start_us AS us, 1 AS delta FROM sess
      UNION ALL
      SELECT end_us AS us, -1 AS delta FROM sess),
    sweep AS (
      SELECT us // 3600000000 AS h, delta,
             sum(delta) OVER (ORDER BY us, delta DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM deltas),
    hourly AS (
      SELECT h, max(run) AS max_concurrent, sum(delta) AS net,
             count(1) AS n_edges
      FROM sweep GROUP BY h)
    SELECT CAST(h AS BIGINT) AS h,
           CAST(max_concurrent AS BIGINT) AS max_concurrent,
           CAST(sum(net) OVER (ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS end_concurrent,
           CAST(n_edges AS BIGINT) AS n_edges
    FROM hourly ORDER BY h"""

  /** q3q: CUSUM CHANGEPOINT — for each event type, the hour where the
    * cumulative deviation from the series mean peaks (the classic
    * offline CUSUM level-shift detector: argmax_t |Σ_{i≤t}(n_i − n̄)|).
    *
    * Determinism by integer scaling (the q1e lesson, applied forward):
    * n̄ = total/H is a rational the two engines would round differently
    * ulp-by-ulp, so the statistic is scaled by H — `H·S_t = H·prefix_t −
    * t·total` — and every term stays an exact 64-bit integer (|S·H| ≤
    * H·total ≈ 10⁹ at sf0.1; overflow headroom to 2⁶³ is ~10⁹×). Peak
    * hour ties break to the earliest hour via the (abs DESC, h ASC)
    * rank — same rule in both engines.
    *
    * Plan: one scan → tiny (type, hour) hash aggregate → two windows
    * partitioned BY TYPE over ≤|types|·|hours| rows — the fact table is
    * never windowed. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy("h")
    val cum = hourly
      .withColumn("t", row_number().over(ordered))
      .withColumn("prefix", sum("n").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_hours", count(lit(1)).over(byType))
      .withColumn("total_n", sum("n").over(byType))
      .withColumn("cusum_scaled",
        col("n_hours") * col("prefix") - col("t") * col("total_n"))
    cum
      .withColumn("rn", row_number().over(
        byType.orderBy(abs(col("cusum_scaled")).desc, col("h").asc)))
      .where(col("rn") === 1)
      .select(col("event_type"), col("h").as("h_peak"), col("cusum_scaled"),
        abs(col("cusum_scaled")).as("abs_scaled"), col("n_hours"),
        col("total_n"))
      .orderBy("event_type")
  }

  def cusumChangepointOracle: String = """
    WITH hourly AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
             count(1) AS n
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS t,
             sum(n) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
             count(1) OVER (PARTITION BY event_type) AS n_hours,
             sum(n) OVER (PARTITION BY event_type) AS total_n
      FROM hourly),
    scored AS (
      SELECT event_type, h,
             n_hours * prefix - t * total_n AS cusum_scaled,
             abs(n_hours * prefix - t * total_n) AS abs_scaled,
             n_hours, total_n,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(n_hours * prefix - t * total_n) DESC, h ASC) AS rn
      FROM cum)
    SELECT event_type, h AS h_peak,
           CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
           CAST(abs_scaled AS BIGINT) AS abs_scaled,
           CAST(n_hours AS BIGINT) AS n_hours,
           CAST(total_n AS BIGINT) AS total_n
    FROM scored WHERE rn = 1 ORDER BY event_type"""

  /** q3x: FORECAST BACKTEST — the evaluation harness every
    * volume-forecasting job needs before anyone trusts it: two
    * zero-parameter baselines (persistence = last hour's count,
    * seasonal-naive = the count 24 h earlier) replayed over the
    * hourly event-volume series, scored with exact integer absolute
    * errors. The verdict column says whether DAILY SEASONALITY is
    * real in this stream (seasonal-naive beats persistence) — the
    * go/no-go for bothering with a seasonal model at all. Lag
    * alignment is the q3s self-join on h−L (spine gaps pair
    * correctly — a LAG window would silently compare across gaps);
    * only hours where BOTH baselines have a prediction enter, so the
    * comparison is paired. One scan to the hourly spine; everything
    * after is spine-sized. MAE is emitted ×1e6 over the paired-hour
    * count via integer div. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
      .cache() // 3 self-join sides
    val j = hourly.as("now")
      .join(hourly.as("p1"),
        col("now.event_type") === col("p1.event_type")
          && col("now.h") - 1 === col("p1.h"))
      .join(hourly.as("p24"),
        col("now.event_type") === col("p24.event_type")
          && col("now.h") - 24 === col("p24.h"))
      .select(col("now.event_type").as("event_type"),
        col("now.n").as("actual"),
        col("p1.n").as("pred_persist"),
        col("p24.n").as("pred_seasonal"))
    j.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"),
      sum(abs(col("actual") - col("pred_persist"))).as("ae_persist"),
      sum(abs(col("actual") - col("pred_seasonal"))).as("ae_seasonal"))
      .select(col("event_type"), col("n_hours"),
        col("ae_persist"), col("ae_seasonal"),
        expr("(ae_persist * 1000000) div n_hours").as("mae_persist_e6"),
        expr("(ae_seasonal * 1000000) div n_hours").as("mae_seasonal_e6"),
        (col("ae_seasonal") < col("ae_persist")).as("seasonality_wins"))
      .orderBy("event_type")
  }

  def forecastBacktestOracle: String = """
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(1) AS n
      FROM events GROUP BY 1, 2),
    j AS (
      SELECT now.event_type, now.n AS actual,
             p1.n AS pred_persist, p24.n AS pred_seasonal
      FROM hourly now
      JOIN hourly p1 ON now.event_type = p1.event_type
        AND now.h - 1 = p1.h
      JOIN hourly p24 ON now.event_type = p24.event_type
        AND now.h - 24 = p24.h)
    SELECT event_type, CAST(count(1) AS BIGINT) AS n_hours,
           CAST(sum(abs(actual - pred_persist)) AS BIGINT) AS ae_persist,
           CAST(sum(abs(actual - pred_seasonal)) AS BIGINT) AS ae_seasonal,
           CAST((sum(abs(actual - pred_persist)) * 1000000) // count(1)
             AS BIGINT) AS mae_persist_e6,
           CAST((sum(abs(actual - pred_seasonal)) * 1000000) // count(1)
             AS BIGINT) AS mae_seasonal_e6,
           sum(abs(actual - pred_seasonal)) < sum(abs(actual - pred_persist))
             AS seasonality_wins
    FROM j GROUP BY event_type ORDER BY event_type"""

  /** q3u: MULTI-TOUCH LINEAR ATTRIBUTION — the marketing-analytics
    * counterpart to q36's last-touch as-of join: every `purchase`
    * splits its value EQUALLY across the user's click/view touches in
    * the trailing 24 h, and the report rolls credit up by touch type
    * (plus the unattributed remainder row — purchases no touch
    * preceded, whose value a last-touch report silently hides).
    *
    * The time-window join is DAY-BINNED (the q37 doctrine): each
    * purchase explodes to its 2 candidate day bins (a 24 h window
    * spans at most 2 calendar days), the join runs as a plain equi
    * join on (user, day) — shuffle bounded by keys, never a full
    * time-range cross product — and the exact integer-microsecond
    * window test filters after. Money is exact integer cents
    * (floor(value·100 + 0.5)); the per-touch credit is
    * (cents·10⁴) div n_touches — micro-dollar integers whose
    * truncation is deterministic, so every credit column sums exactly
    * and replays bit-for-bit (no FP division of doubles anywhere).
    * Per-purchase touch counts come from a window over the joined
    * frame partitioned by purchase id — post-join cardinality. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("us").as("p_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        explode(expr(s"array(us div $dayUs, us div $dayUs - 1)")).as("day"))
    val touches = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("us").as("t_us"), expr(s"us div $dayUs").as("day"))
    val joined = purchases.join(touches, Seq("user_id", "day"))
      .where(col("t_us") < col("p_us") && col("t_us") >= col("p_us") - dayUs)
    val credited = joined
      .withColumn("n_touches", count(lit(1)).over(Window.partitionBy("pid")))
      .withColumn("credit_micro", expr("(cents * 10000) div n_touches"))
    val byType = credited.groupBy("touch_type").agg(
      count(lit(1)).as("n_touches"),
      countDistinct(col("pid")).as("n_purchases"),
      sum(col("credit_micro")).as("credit_micro"))
    // purchases with NO touch in the window: the unattributed remainder
    val unattributed = purchases
      .select(col("user_id"), col("pid"), col("p_us"), col("cents")).distinct()
      .join(credited.select(col("pid")).distinct(), Seq("pid"), "left_anti")
      .agg(lit("(none)").as("touch_type"),
        lit(0L).as("n_touches"),
        count(lit(1)).as("n_purchases"),
        (sum(col("cents")) * 10000L).as("credit_micro"))
    byType.unionByName(unattributed).orderBy("touch_type")
  }

  def attributionOracle: String = """
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value
      FROM events),
    p AS (
      SELECT user_id, event_id AS pid, us AS p_us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM ev WHERE event_type = 'purchase'),
    t AS (
      SELECT user_id, event_type AS touch_type, us AS t_us
      FROM ev WHERE event_type IN ('click', 'view')),
    j AS (
      SELECT p.pid, p.cents, t.touch_type
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.t_us < p.p_us AND t.t_us >= p.p_us - 86400000000),
    c AS (
      SELECT pid, touch_type,
             (cents * 10000) // (count(1) OVER (PARTITION BY pid))
               AS credit_micro
      FROM j),
    byt AS (
      SELECT touch_type, CAST(count(1) AS BIGINT) AS n_touches,
             CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
             CAST(sum(credit_micro) AS BIGINT) AS credit_micro
      FROM c GROUP BY touch_type),
    none_row AS (
      SELECT '(none)' AS touch_type, CAST(0 AS BIGINT) AS n_touches,
             CAST(count(1) AS BIGINT) AS n_purchases,
             CAST(sum(cents) * 10000 AS BIGINT) AS credit_micro
      FROM p WHERE pid NOT IN (SELECT DISTINCT pid FROM j))
    SELECT * FROM byt UNION ALL SELECT * FROM none_row
    ORDER BY touch_type"""

  /** q9p: RECENCY-WEIGHTED SAMPLING PROFILE — the time-decay weighting
    * a continually-trained model applies to its event/interaction data
    * (recent behavior matters more; the standard exp(−ln2·age/halflife)
    * half-life schedule, here 7 days against the stream's newest
    * event). The graded table is what a sampling design review reads
    * per event type: raw count, decayed mass, the EFFECTIVE SAMPLE SIZE
    * (Σw)²/Σw² — the number that tells you whether decay left enough
    * statistical power — mean age, and each type's share of the decayed
    * mass vs its raw share.
    *
    * Exactness doctrine: ages are exact integer microsecond diffs
    * against a broadcast 1-row max; each event's weight forms through
    * one libm exp from those integers, e6-quantized BEFORE the sums
    * (order-free integer sums; w² likewise quantized per event), so ESS
    * and the shares are IEEE chains over integer operands — hash-
    * replayable. Scale shape: one scan + a ≤n_types-row rollup; the
    * windows run over that bounded frame (the q1e rule). */
  def recencyWeights(spark: SparkSession, dir: String,
      halflifeDays: Double = 7.0): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val tmax = ev.agg(max("us").as("max_us"))
    val weighted = ev.join(broadcast(tmax))
      .withColumn("age_us", col("max_us") - col("us"))
      .withColumn("w_e6", floor(
        exp(lit(-math.log(2.0) / halflifeDays)
          * (col("age_us").cast("double") / lit(86400e6))) * 1e6 + 0.5)
        .cast("long"))
    val tot = Window.partitionBy() // ≤ n_types rows — the q1e rule
    // age and w² sums ride DECIMAL(38): int64 wraps at ~2e11 events
    // (the round-6 fisherSeparation advisory class); the decimal sums
    // are exact in both engines (DuckDB promotes to HUGEINT) and only
    // the final IEEE ratios ever see a double
    weighted.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("w_e6").as("sum_w_e6"),
        sum((col("w_e6") * col("w_e6")).cast("decimal(38,0)")).as("sum_w2"),
        sum(col("age_us").cast("decimal(38,0)")).as("sum_age_us"))
      .withColumn("mean_age_e3", floor(
        col("sum_age_us").cast("double") / col("n") / lit(86400e6) * 1e3 + 0.5)
        .cast("long"))
      .withColumn("ess_e3", floor(
        col("sum_w_e6").cast("double") * col("sum_w_e6")
          / col("sum_w2").cast("double") * 1e3 + 0.5).cast("long"))
      .withColumn("raw_share_ppm", floor(
        col("n").cast("double") * 1e6 / sum("n").over(tot) + 0.5).cast("long"))
      .withColumn("w_share_ppm", floor(
        col("sum_w_e6").cast("double") * 1e6 / sum("sum_w_e6").over(tot) + 0.5)
        .cast("long"))
      .select("event_type", "n", "sum_w_e6", "mean_age_e3", "ess_e3",
        "raw_share_ppm", "w_share_ppm")
      .orderBy("event_type")
  }

  def recencyWeightsOracle: String = """
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us FROM events),
    t AS (SELECT max(us) AS max_us FROM ev),
    w AS (
      SELECT event_type, max_us - us AS age_us,
             CAST(floor(exp(-0.09902102579427789 *
               (CAST(max_us - us AS DOUBLE) / 86400e6)) * 1e6 + 0.5)
               AS BIGINT) AS w_e6
      FROM ev CROSS JOIN t),
    g AS (
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(sum(w_e6) AS BIGINT) AS sum_w_e6,
             sum(w_e6 * w_e6) AS sum_w2,
             sum(age_us) AS sum_age_us
      FROM w GROUP BY event_type),
    s AS (
      SELECT *, CAST(sum(n) OVER () AS BIGINT) AS n_tot,
             CAST(sum(sum_w_e6) OVER () AS BIGINT) AS w_tot
      FROM g)
    SELECT event_type, n, sum_w_e6,
           CAST(floor(CAST(sum_age_us AS DOUBLE) / n / 86400e6 * 1e3 + 0.5)
             AS BIGINT) AS mean_age_e3,
           CAST(floor(CAST(sum_w_e6 AS DOUBLE) * sum_w_e6
             / CAST(sum_w2 AS DOUBLE) * 1e3 + 0.5) AS BIGINT) AS ess_e3,
           CAST(floor(CAST(n AS DOUBLE) * 1e6 / n_tot + 0.5) AS BIGINT)
             AS raw_share_ppm,
           CAST(floor(CAST(sum_w_e6 AS DOUBLE) * 1e6 / w_tot + 0.5) AS BIGINT)
             AS w_share_ppm
    FROM s ORDER BY event_type"""

  /** qb7: MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2014) — the
    * model-based sibling of q3u's rule-based credit split: user
    * journeys become paths through a first-order Markov chain over
    * channel states (start → touches → conv/null, journeys truncated
    * at the FIRST purchase), and a channel's credit is its REMOVAL
    * EFFECT — how much the start→conv absorption probability drops
    * when every transition into that channel is redirected to null.
    * Unlike last-touch/linear rules this prices a channel by its
    * position in the whole traffic graph: a channel nothing converts
    * through directly can still carry attribution by feeding the ones
    * that do.
    *
    * Scale split: journey assembly and transition counting are the
    * 100 TB part and stay fully distributed (one window over
    * user-partitioned events, one hash aggregate); what reaches the
    * driver is the ≤|channels+3|² PROBABILITY MATRIX — enum-bounded
    * like the R-05 vocabulary, `require`-capped. The absorption
    * probabilities come from `iters` fixed-point sweeps over that
    * matrix in EXACT INTEGER arithmetic (probabilities in e6, state
    * values in e12, floor division each step) so the oracle's
    * recursive-CTE replay is bit-identical — no float summation-order
    * hazard. e6·e12 products bound the state count at 9 for 64-bit
    * safety (`require`d; real channel vocabularies are enum-sized). */
  def markovAttribution(spark: SparkSession, dir: String,
      iters: Int = 24): DataFrame = {
    val E12 = 1000000000000L
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val firstP = ev.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(struct(col("us"), col("event_id"))).as("fp"))
    val kept = ev.join(firstP, Seq("user_id"), "left")
      .where(col("fp").isNull ||
        col("us") < col("fp.us") ||
        (col("us") === col("fp.us") && col("event_id") <= col("fp.event_id")))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val seq0 = kept
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead("event_type", 1).over(w))
    def toDst(c: Column): Column =
      when(c === "purchase", lit("conv")).otherwise(c)
    val fromStart = seq0.where(col("rn") === 1)
      .select(lit("start").as("src"), toDst(col("event_type")).as("dst"))
    val mid = seq0.where(col("event_type") =!= "purchase")
      .select(col("event_type").as("src"),
        coalesce(toDst(col("nxt")), lit("null")).as("dst"))
    val probs = fromStart.unionByName(mid)
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .withColumn("pe6", expr(
        "cnt * 1000000 div sum(cnt) OVER (PARTITION BY src)"))
    // enum-bounded driver matrix (R-05 doctrine): channels are event
    // types, so the collect is |states|^2 rows. The cap is enforced
    // BEFORE materialization — collect through limit(cap+1) and fail
    // on truncation — so a corrupted/unbounded event_type domain trips
    // the guard at ≤122 driver rows instead of materializing the whole
    // transition table first (the later require(m <= 9) only guards
    // the fixed-point arithmetic, not the collect itself).
    val cellCap = 122 // > 11^2: any legitimate ≤9-state matrix fits
    val cellRows = probs.select("src", "dst", "pe6").limit(cellCap).collect()
    require(cellRows.length < cellCap,
      s"transition table truncated at $cellCap rows — event_type domain " +
        "is not enum-bounded; refusing to collect it to the driver")
    val cells = cellRows
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = cells.flatMap(c => Seq(c._1, c._2))
      .filter(s => s != "start" && s != "conv" && s != "null")
      .distinct.sorted.toSeq
    val states = ("start" +: channels) ++ Seq("conv", "null")
    val m = states.length
    require(m <= 9, s"e6*e12 fixed point is 64-bit-safe to 9 states, got $m")
    val idx = states.zipWithIndex.toMap
    val (startI, convI, nullI) = (idx("start"), idx("conv"), idx("null"))
    def solve(removed: Option[String]): Long = {
      val mat = Array.ofDim[Long](m, m)
      cells.foreach { case (s, d, p) =>
        val dd = if (removed.contains(d)) nullI else idx(d)
        mat(idx(s))(dd) += p
      }
      var p = Array.tabulate(m)(i => if (i == convI) E12 else 0L)
      (1 to iters).foreach { _ =>
        p = Array.tabulate(m) { s =>
          if (s == convI) E12
          else if (s == nullI) 0L
          else {
            var acc = 0L
            var d = 0
            while (d < m) { acc += mat(s)(d) * p(d); d += 1 }
            acc / 1000000L
          }
        }
      }
      p(startI)
    }
    val base = solve(None)
    val perChan = channels.map { c =>
      val prem = solve(Some(c))
      val re = math.max(0L, base - prem) * 1000000L / math.max(base, 1L)
      (c, base / 1000000L, prem / 1000000L, re)
    }
    val reSum = math.max(perChan.map(_._4).sum, 1L)
    import spark.implicits._
    perChan.map { case (c, b, pr, re) =>
      (c, b, pr, re, re * 1000000L / reSum)
    }.toDF("channel", "p_base_e6", "p_removed_e6",
      "removal_effect_ppm", "attribution_ppm")
      .orderBy("channel")
  }

  /** DuckDB replay of [[markovAttribution]]: same journeys, same
    * transition probabilities (e6 floor), same redirect-to-null
    * removal, same 24 integer fixed-point sweeps via a recursive CTE
    * carrying the state vector as a list. */
  def markovAttributionOracle: String = """
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    fp AS (
      SELECT user_id, us AS fus, event_id AS fid FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY us, event_id) AS prn
        FROM ev WHERE event_type = 'purchase') WHERE prn = 1),
    kept AS (
      SELECT e.user_id, e.event_id, e.event_type, e.us
      FROM ev e LEFT JOIN fp USING (user_id)
      WHERE fus IS NULL OR e.us < fus
         OR (e.us = fus AND e.event_id <= fid)),
    sq AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
          AS nxt
      FROM kept),
    tr AS (
      SELECT 'start' AS src,
             CASE WHEN event_type = 'purchase' THEN 'conv'
               ELSE event_type END AS dst
      FROM sq WHERE rn = 1
      UNION ALL
      SELECT event_type,
             coalesce(CASE WHEN nxt = 'purchase' THEN 'conv' ELSE nxt END,
               'null')
      FROM sq WHERE event_type <> 'purchase'),
    probs AS (
      SELECT src, dst,
             CAST(count(1) * 1000000 //
               sum(count(1)) OVER (PARTITION BY src) AS BIGINT) AS pe6
      FROM tr GROUP BY 1, 2),
    chan AS (
      SELECT DISTINCT st FROM (
        SELECT src AS st FROM probs UNION SELECT dst FROM probs)
      WHERE st NOT IN ('start', 'conv', 'null')),
    states AS (
      SELECT st, CAST(row_number() OVER (ORDER BY k, st) - 1 AS BIGINT)
        AS sidx
      FROM (SELECT 'start' AS st, 0 AS k
            UNION ALL SELECT st, 1 FROM chan
            UNION ALL SELECT 'conv', 2
            UNION ALL SELECT 'null', 3)),
    dims AS (
      SELECT CAST(count(1) AS BIGINT) AS m,
             (SELECT sidx FROM states WHERE st = 'start') AS si,
             (SELECT sidx FROM states WHERE st = 'conv') AS ci,
             (SELECT sidx FROM states WHERE st = 'null') AS ni
      FROM states),
    scen AS (
      SELECT 'none' AS scen, CAST(NULL AS VARCHAR) AS removed
      UNION ALL SELECT st, st FROM chan),
    cells AS (
      SELECT scen.scen, si.sidx AS s, di.sidx AS d,
             CAST(sum(pe6) AS BIGINT) AS pe6
      FROM probs CROSS JOIN scen
      JOIN states si ON probs.src = si.st
      JOIN states di ON (CASE WHEN probs.dst = scen.removed THEN 'null'
                         ELSE probs.dst END) = di.st
      GROUP BY 1, 2, 3),
    dense AS (
      SELECT sc.scen, s.sidx AS s, d.sidx AS d,
             CAST(coalesce(c.pe6, 0) AS BIGINT) AS pe6
      FROM scen sc CROSS JOIN states s CROSS JOIN states d
      LEFT JOIN cells c
        ON c.scen = sc.scen AND c.s = s.sidx AND c.d = d.sidx),
    rowsl AS (
      SELECT scen, s, list(pe6 ORDER BY d) AS rw FROM dense GROUP BY 1, 2),
    mats AS (
      SELECT scen, list(rw ORDER BY s) AS mat FROM rowsl GROUP BY 1),
    it AS (
      SELECT scen, 0 AS i,
             list_transform(range(dims.m), x ->
               CAST(CASE WHEN x = dims.ci THEN 1000000000000
                 ELSE 0 END AS BIGINT)) AS p
      FROM mats, dims
      UNION ALL
      SELECT it.scen, i + 1,
             list_transform(range(dims.m), s ->
               CAST(CASE
                 WHEN s = dims.ci THEN 1000000000000
                 WHEN s = dims.ni THEN 0
                 ELSE list_sum(list_transform(range(dims.m), d ->
                   mat[s + 1][d + 1] * p[d + 1])) // 1000000
               END AS BIGINT)) AS p
      FROM it JOIN mats USING (scen), dims WHERE i < 24),
    fin AS (
      SELECT scen, p[dims.si + 1] AS pstart FROM it, dims WHERE i = 24),
    base AS (SELECT pstart AS b FROM fin WHERE scen = 'none'),
    res AS (
      SELECT f.scen AS channel,
             CAST(b // 1000000 AS BIGINT) AS p_base_e6,
             CAST(pstart // 1000000 AS BIGINT) AS p_removed_e6,
             CAST(greatest(b - pstart, 0) * 1000000 // greatest(b, 1)
               AS BIGINT) AS removal_effect_ppm
      FROM fin f CROSS JOIN base WHERE f.scen <> 'none')
    SELECT channel, p_base_e6, p_removed_e6, removal_effect_ppm,
           CAST(removal_effect_ppm * 1000000 //
             greatest(sum(removal_effect_ppm) OVER (), 1) AS BIGINT)
             AS attribution_ppm
    FROM res ORDER BY channel"""

  /** qb9: EVENT-PATTERN MATCH — the CEP / MATCH_RECOGNIZE shape Spark
    * has no native operator for (Flink CEP and Trino's
    * MATCH_RECOGNIZE do): per pattern instance, "CLICK followed by
    * PURCHASE within `tolUs`, with NO ERROR in between", evaluated for
    * EVERY click (not first-touch per user — that's q3i's funnel).
    * Semantics pinned for determinism: the purchase is the FIRST one
    * strictly after the click inside the tolerance; the match is
    * clean iff the first in-tolerance error (if any) lands after that
    * purchase. Graded per day: clicks, matched, clean, and the summed
    * click→purchase gap over clean matches (integer µs).
    *
    * Scale shape: the q3u bucket trick turns both "first X after t
    * within tol" probes into EQUI joins — each click explodes to its
    * two covering hour buckets (tol ≤ 1 h, `require`d) and joins
    * purchases/errors on (user, bucket), so candidate fan-out is
    * bounded by per-user-per-hour activity, never a full time-range
    * cross join; per-click firsts are one hash aggregate each. At
    * 100 TB this is two shuffles on (user, hour) plus the day rollup. */
  def patternMatch(spark: SparkSession, dir: String,
      tolUs: Long = 1800000000L): DataFrame =
    patternMatchOf(Tables.events(spark, dir).select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_type"), col("event_id")),
      tolUs)

  /** Core of qb9 over any (user_id, us, event_type, event_id) frame,
    * so specs can plant exact sequences around the negative
    * condition. */
  def patternMatchOf(ev: DataFrame, tolUs: Long): DataFrame = {
    val hourUs = 3600000000L
    val dayUs = 86400000000L
    require(tolUs <= hourUs, "two-bucket cover needs tol <= 1 hour")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"),
        col("event_id").as("cid"))
    val clicksB = clicks.select(col("user_id"), col("c_us"), col("cid"),
      explode(expr(s"array(c_us div $hourUs, c_us div $hourUs + 1)"))
        .as("hb"))
    def firstAfter(events: DataFrame, outCol: String): DataFrame =
      clicksB.join(events, Seq("user_id", "hb"))
        .where(col("t_us") > col("c_us") && col("t_us") <= col("c_us") + tolUs)
        .groupBy("cid").agg(min("t_us").as(outCol))
    def bucketed(et: String): DataFrame =
      ev.where(col("event_type") === et)
        .select(col("user_id"), col("us").as("t_us"),
          expr(s"us div $hourUs").as("hb"))
    val fp = firstAfter(bucketed("purchase"), "fp")
    val fe = firstAfter(bucketed("error"), "fe")
    clicks
      .join(fp, Seq("cid"), "left")
      .join(fe, Seq("cid"), "left")
      .withColumn("clean",
        col("fp").isNotNull && (col("fe").isNull || col("fe") > col("fp")))
      .groupBy(expr(s"c_us div $dayUs").as("day"))
      .agg(
        count(lit(1)).as("n_clicks"),
        sum(when(col("fp").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("clean"), 1L).otherwise(0L)).as("n_clean"),
        coalesce(sum(when(col("clean"), col("fp") - col("c_us"))), lit(0L))
          .as("sum_gap_us"))
      .orderBy("day")
  }

  /** DuckDB replay of [[patternMatch]] — same firsts, same negative
    * condition, no bucketing needed at oracle scale (bucketing only
    * prunes candidates; the two-bucket cover is exact for tol ≤ 1 h,
    * so the results agree by construction). */
  def patternMatchOracle: String = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us, event_type, event_id FROM events),
    c AS (
      SELECT user_id, us AS c_us, event_id AS cid
      FROM ev WHERE event_type = 'click'),
    fp AS (
      SELECT cid, min(us) AS fp
      FROM c JOIN ev USING (user_id)
      WHERE event_type = 'purchase'
        AND us > c_us AND us <= c_us + 1800000000
      GROUP BY 1),
    fe AS (
      SELECT cid, min(us) AS fe
      FROM c JOIN ev USING (user_id)
      WHERE event_type = 'error'
        AND us > c_us AND us <= c_us + 1800000000
      GROUP BY 1),
    j AS (
      SELECT c.cid, c.c_us, fp.fp, fe.fe,
             fp.fp IS NOT NULL AND (fe.fe IS NULL OR fe.fe > fp.fp) AS clean
      FROM c LEFT JOIN fp USING (cid) LEFT JOIN fe USING (cid))
    SELECT c_us // 86400000000 AS day,
           CAST(count(1) AS BIGINT) AS n_clicks,
           CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           CAST(sum(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(coalesce(sum(CASE WHEN clean THEN fp - c_us END), 0)
             AS BIGINT) AS sum_gap_us
    FROM j GROUP BY 1 ORDER BY 1"""

  /** qba: THEIL–SEN ROBUST TREND — the median-of-pairwise-slopes
    * estimator (Sen 1968) for per-type daily volume trends, next to
    * the OLS slope the same frame yields: OLS moves with a single
    * corrupted day (29.3% breakdown-free only at zero), Theil–Sen
    * tolerates up to 29% gross outliers, which is why monitoring
    * pipelines fit trends with it. Graded per event type: the
    * Theil–Sen slope, the OLS slope for contrast, pair count, and
    * day count (slopes in e6 events/day).
    *
    * Determinism by construction: every pairwise slope is ONE IEEE
    * division of exact integers — identical in both engines — and
    * the median is a SELECTION (sort by (slope, day pair), pick the
    * middle elements, average two for even counts), not a float
    * summation, so there is no ordering hazard anywhere. The OLS
    * side runs on exact integer moments (counts × days) with one
    * final division.
    *
    * Scale shape: the pair join is over the PER-TYPE DAILY AGGREGATE
    * (≤|days| rows per type — the histogram, not the events), so the
    * quadratic term is days², a monitoring-window constant; the event
    * scan is one hash aggregate. The non-equi d1 < d2 join stays
    * inside each type's bounded frame. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    theilSenOf(Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  /** Core of qba over any (event_type, day, n) daily frame, so specs
    * can plant a corrupted day and watch OLS move while Theil–Sen
    * holds. */
  def theilSenOf(daily: DataFrame): DataFrame = {
    val a = daily.select(col("event_type"), col("day").as("d1"),
      col("n").as("n1"))
    val b = daily.select(col("event_type").as("et2"), col("day").as("d2"),
      col("n").as("n2"))
    val pairs = a.join(b,
        col("event_type") === col("et2") && col("d1") < col("d2"))
      .withColumn("slope",
        (col("n2") - col("n1")).cast("double") / (col("d2") - col("d1")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("slope", "d1", "d2")
    val med = pairs
      .withColumn("rk", row_number().over(w))
      .withColumn("np", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .where(col("rk") === expr("(np + 1) div 2") ||
        col("rk") === expr("np div 2 + 1"))
      .groupBy("event_type")
      .agg(floor(avg("slope") * 1e6).cast("long").as("theil_sen_e6"),
        first("np").as("n_pairs"))
    // OLS on exact integer moments; one final division
    val ols = daily.groupBy("event_type").agg(
        count(lit(1)).as("nd"), sum("day").as("sx"), sum("n").as("sy"),
        sum(col("day") * col("day")).as("sxx"),
        sum(col("day") * col("n")).as("sxy"))
      .withColumn("ols_e6",
        floor((col("nd") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("nd") * col("sxx") - col("sx") * col("sx")) * 1e6)
          .cast("long"))
      .select(col("event_type"), col("nd").as("n_days"), col("ols_e6"))
    med.join(ols, Seq("event_type"))
      .select("event_type", "n_days", "n_pairs", "theil_sen_e6", "ols_e6")
      .orderBy("event_type")
  }

  /** DuckDB replay of [[theilSen]]: same daily histogram, same pair
    * slopes, same middle-element selection, same integer-moment OLS. */
  def theilSenOracle: String = """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    pairs AS (
      SELECT a.event_type, a.day AS d1, b.day AS d2,
             CAST(b.n - a.n AS DOUBLE) / (b.day - a.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type
          ORDER BY slope, d1, d2) AS rk,
        count(1) OVER (PARTITION BY event_type) AS np
      FROM pairs),
    med AS (
      SELECT event_type,
             CAST(floor(avg(slope) * 1e6) AS BIGINT) AS theil_sen_e6,
             CAST(max(np) AS BIGINT) AS n_pairs
      FROM ranked
      WHERE rk = (np + 1) // 2 OR rk = np // 2 + 1
      GROUP BY 1),
    ols AS (
      SELECT event_type, CAST(count(1) AS BIGINT) AS n_days,
             CAST(floor(CAST(count(1) * sum(day * n) - sum(day) * sum(n)
               AS DOUBLE)
               / (count(1) * sum(day * day) - sum(day) * sum(day)) * 1e6)
               AS BIGINT) AS ols_e6
      FROM daily GROUP BY 1)
    SELECT event_type, n_days, n_pairs, theil_sen_e6, ols_e6
    FROM med JOIN ols USING (event_type)
    ORDER BY event_type"""

  /** qc5: RUNNING DISTINCT (CUMULATIVE REACH) — `count(DISTINCT) OVER`
    * does not exist in any SQL engine (distinct state is not
    * frame-mergeable), and the naive per-day recount is quadratic in
    * days. The production rewrite: distinct-ness is a property of the
    * FIRST SIGHTING — reduce each user to their first-seen day (one
    * grouped scan), then cumulative reach is an ordinary running sum
    * over days. Graded per day: daily actives, new users, cumulative
    * reach, plus the returning-user split (active − new) — the DAU /
    * reach panel every growth dashboard runs, in one scan + one
    * |days|-row window. */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy("day")
      .agg(countDistinct("user_id").as("n_active"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstSeen, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cumulative_reach", sum("n_new").over(w))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        col("cumulative_reach"))
      .orderBy("day")
  }

  /** DuckDB replay of [[runningDistinct]] — same first-seen reduction. */
  val runningDistinctOracle: String = """
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    daily AS (
      SELECT day, count(DISTINCT user_id) AS n_active FROM ev GROUP BY day),
    fs AS (
      SELECT day, count(1) AS n_new FROM (
        SELECT user_id, min(day) AS day FROM ev GROUP BY user_id)
      GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n_active AS BIGINT) AS n_active,
           CAST(coalesce(fs.n_new, 0) AS BIGINT) AS n_new,
           CAST(d.n_active - coalesce(fs.n_new, 0) AS BIGINT)
             AS n_returning,
           CAST(sum(coalesce(fs.n_new, 0)) OVER (ORDER BY d.day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_reach
    FROM daily d LEFT JOIN fs USING (day) ORDER BY day"""

  /** qc6: CLAMPED RUNNING BALANCE — the fold that looks impossible in
    * SQL: b_i = max(0, b_{i−1} + δ_i) (a stock that cannot go
    * negative) is NON-ASSOCIATIVE, so no window aggregate computes it
    * directly — the classic justification for dropping to a sequential
    * mapPartitions. It has a closed form anyway:
    *   b_i = S_i − min(0, min_{j≤i} S_j)
    * where S is the ordinary prefix sum — two window passes, fully
    * distributed, exact integers (proof: subtracting the most negative
    * prefix ever reached is exactly the total clamping applied so
    * far — TimeSeriesSpec replays the literal fold against it on every
    * supplier). Movements: lineitem per supplier ordered by
    * (shipdate, orderkey, linenumber), odd line numbers receive +qty,
    * even ship −qty. Graded per supplier (mod-37 sample for row
    * bounds): final balance, peak, clamp count (= distinct new running
    * minima below zero), movement count. */
  def clampedBalance(spark: SparkSession, dir: String): DataFrame = {
    val mv = Tables.lineitem(spark, dir)
      .where(col("l_suppkey") % 37 === 0)
      .select(col("l_suppkey").as("supp"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        when(col("l_linenumber") % 2 === 1, col("l_quantity"))
          .otherwise(-col("l_quantity")).cast("long").as("delta"))
    val w = Window.partitionBy("supp")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLast = Window.partitionBy("supp").orderBy(
      col("l_shipdate").desc, col("l_orderkey").desc,
      col("l_linenumber").desc)
    val run = mv
      .withColumn("s", sum("delta").over(w))
      .withColumn("low", least(min("s").over(w), lit(0L)))
      .withColumn("bal", col("s") - col("low"))
      .withColumn("rn_last", row_number().over(wLast))
    run.groupBy("supp")
      .agg(count(lit(1)).as("n_moves"),
        max(when(col("rn_last") === 1, col("bal"))).as("final_balance"),
        max("bal").as("peak_balance"),
        countDistinct(when(col("s") < 0L && col("s") === col("low"),
          col("s"))).as("n_clamp_levels"))
      .orderBy("supp")
  }

  /** DuckDB replay of [[clampedBalance]] — same prefix-min identity. */
  val clampedBalanceOracle: String = """
    WITH mv AS (
      SELECT l_suppkey AS supp, l_shipdate, l_orderkey, l_linenumber,
             CAST(CASE WHEN l_linenumber % 2 = 1 THEN l_quantity
                       ELSE -l_quantity END AS BIGINT) AS delta
      FROM lineitem WHERE l_suppkey % 37 = 0),
    run0 AS (
      SELECT supp, l_shipdate, l_orderkey, l_linenumber,
             sum(delta) OVER w AS s
      FROM mv
      WINDOW w AS (PARTITION BY supp
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)),
    run AS (
      SELECT *, least(min(s) OVER w2, 0) AS low,
             row_number() OVER (PARTITION BY supp
               ORDER BY l_shipdate DESC, l_orderkey DESC,
                        l_linenumber DESC) AS rn_last
      FROM run0
      WINDOW w2 AS (PARTITION BY supp
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)),
    bal AS (SELECT *, s - low AS b FROM run)
    SELECT supp, CAST(count(1) AS BIGINT) AS n_moves,
           CAST(max(CASE WHEN rn_last = 1 THEN b END)
             AS BIGINT) AS final_balance,
           CAST(max(b) AS BIGINT) AS peak_balance,
           CAST(count(DISTINCT CASE WHEN s < 0 AND s = low THEN s END)
             AS BIGINT) AS n_clamp_levels
    FROM bal GROUP BY supp ORDER BY supp"""

  /** qc1: OFFLINE BANDIT REPLAY — the replay estimator (Li et al.
    * WSDM'11) for evaluating a decision POLICY against logged
    * interaction data without running it live: walk the log in round
    * order, keep per-arm running reward stats, let the candidate
    * policy (greedy-by-empirical-mean, optimistic 1/1 init for
    * unpulled arms, alphabetical tie-break) pick an arm each round,
    * and score it ONLY on rounds where its pick matches the logged
    * arm — an unbiased estimate of the policy's online reward when the
    * logging policy is uniform. Everything is exact: running means are
    * compared as cross-multiplied integer fractions (never divided),
    * so the argmax — and therefore the whole replay — is bit-identical
    * in any engine. The SQL for both sides is emitted by ONE generator
    * (only the integer-division token differs), which is itself the
    * point: the replay is pure relational algebra — conditional
    * running sums + a deterministic argmax — not a driver loop.
    *
    * Scale note: the walk is sequential in round order WITHIN an
    * experiment (one global window here — the fixture logs one
    * experiment); production shards the window by experiment exactly
    * like qbh's arms. */
  private val banditArms = Seq("click", "error", "purchase", "signup", "view")

  /** Shared SQL body; `intDiv` is "div" (Spark) or "//" (DuckDB). */
  private def banditReplaySql(table: String, intDiv: String): String = {
    def num(a: String) = s"(CASE WHEN cnt_$a = 0 THEN 1 ELSE rew_$a END)"
    def den(a: String) = s"(CASE WHEN cnt_$a = 0 THEN 1 ELSE cnt_$a END)"
    def ge(x: String, y: String) =
      s"${num(x)} * ${den(y)} >= ${num(y)} * ${den(x)}"
    val policy = {
      val cases = banditArms.init.map { a =>
        val conds = banditArms.filter(_ != a).map(o => ge(a, o))
          .mkString("\n             AND ")
        s"WHEN $conds THEN '$a'"
      }.mkString("\n        ")
      s"CASE $cases\n        ELSE '${banditArms.last}' END"
    }
    val runCols = banditArms.map { a =>
      s"""coalesce(sum(CASE WHEN logged = '$a' THEN 1 END)
         |  OVER wprev, 0) AS cnt_$a,
         |coalesce(sum(CASE WHEN logged = '$a' THEN reward END)
         |  OVER wprev, 0) AS rew_$a""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT event_id, event_type AS logged,
       |         CASE WHEN value > 10.0 THEN 1 ELSE 0 END AS reward
       |  FROM $table),
       |st AS (
       |  SELECT *,
       |$runCols
       |  FROM base
       |  WINDOW wprev AS (ORDER BY event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |pol AS (SELECT *, $policy AS policy FROM st),
       |agg AS (
       |  SELECT logged AS arm, count(1) AS n_logged,
       |         sum(CASE WHEN policy = logged THEN 1 ELSE 0 END)
       |           AS n_matched,
       |         sum(CASE WHEN policy = logged THEN reward ELSE 0 END)
       |           AS rew_matched
       |  FROM pol GROUP BY logged),
       |ov AS (
       |  SELECT CAST(sum(rew_matched) * 1000000 $intDiv sum(n_matched)
       |    AS BIGINT) AS replay_estimate_e6 FROM agg)
       |SELECT arm, CAST(n_logged AS BIGINT) AS n_logged,
       |       CAST(n_matched AS BIGINT) AS n_matched,
       |       CAST(rew_matched AS BIGINT) AS rew_matched,
       |       CAST(n_matched * 1000000 $intDiv n_logged AS BIGINT)
       |         AS match_ppm,
       |       ov.replay_estimate_e6
       |FROM agg CROSS JOIN ov ORDER BY arm""".stripMargin
  }

  def banditReplay(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_bandit")
    spark.sql(banditReplaySql("events_bandit", "div"))
  }

  def banditReplayOracle: String = banditReplaySql("events", "//")

  /** qbx: POSITION-BASED ATTRIBUTION MODELS — the heuristic family
    * every marketing stack ships alongside the principled ones (qb7
    * Markov, qbj Shapley): first-touch, last-touch, linear, and
    * U-shaped (40/20/40) credit over the same journeys (touches before
    * first purchase, qb7's convention). All credit shares are INTEGER
    * e6 per conversion — linear gives each touch floor(1e6/n), U-shaped
    * gives the bookends 400000 and splits 200000 across the middle —
    * so totals are exact and the models comparable row-to-row (the
    * point of running four models: rank stability ACROSS models is the
    * signal that a channel's credit is real and not an artifact of one
    * attribution heuristic). One window pass tags each touch with
    * (position, reverse-position, journey length); the four models are
    * four arithmetic columns over that tagging, unpivoted — one scan,
    * one shuffle on user, one on (channel, model). */
  def attributionModels(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val firstP = ev.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(struct(col("us"), col("event_id"))).as("fp"))
    val touches = ev.join(firstP, Seq("user_id"))
      .where(col("event_type") =!= "purchase" &&
        (col("us") < col("fp.us") ||
          (col("us") === col("fp.us") && col("event_id") < col("fp.event_id"))))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wAll = Window.partitionBy("user_id")
    val tagged = touches
      .withColumn("rn", row_number().over(w))
      .withColumn("nt", count(lit(1)).over(wAll))
      .withColumn("first_e6", when(col("rn") === 1, 1000000L).otherwise(0L))
      .withColumn("last_e6", when(col("rn") === col("nt"), 1000000L)
        .otherwise(0L))
      .withColumn("linear_e6", expr("1000000 div nt"))
      .withColumn("ushape_e6",
        when(col("nt") === 1, 1000000L)
          .when(col("nt") === 2, 500000L)
          .when(col("rn") === 1 || col("rn") === col("nt"), 400000L)
          .otherwise(expr("200000 div (nt - 2)")))
    tagged.select(col("event_type").as("channel"),
        explode(array(
          struct(lit("first_touch").as("model"), col("first_e6").as("credit")),
          struct(lit("last_touch").as("model"), col("last_e6").as("credit")),
          struct(lit("linear").as("model"), col("linear_e6").as("credit")),
          struct(lit("u_shaped").as("model"), col("ushape_e6").as("credit"))))
          .as("m"))
      .groupBy(col("channel"), col("m.model").as("model"))
      .agg(sum(col("m.credit")).as("credit_e6"),
        sum(when(col("m.credit") > 0, 1L).otherwise(0L)).as("n_touches_credited"))
      .orderBy("channel", "model")
  }

  /** DuckDB replay of [[attributionModels]] — same journey convention,
    * same integer shares. */
  val attributionModelsOracle: String = """
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    fp AS (
      SELECT user_id, us AS fus, event_id AS fid FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY us, event_id) AS prn
        FROM ev WHERE event_type = 'purchase') WHERE prn = 1),
    tch AS (
      SELECT e.user_id, e.event_type, e.us, e.event_id
      FROM ev e JOIN fp USING (user_id)
      WHERE event_type <> 'purchase'
        AND (us < fus OR (us = fus AND event_id < fid))),
    tagged AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS rn,
             count(1) OVER (PARTITION BY user_id) AS nt
      FROM tch),
    m AS (
      SELECT event_type AS channel, 'first_touch' AS model,
             CASE WHEN rn = 1 THEN 1000000 ELSE 0 END AS credit FROM tagged
      UNION ALL
      SELECT event_type, 'last_touch',
             CASE WHEN rn = nt THEN 1000000 ELSE 0 END FROM tagged
      UNION ALL
      SELECT event_type, 'linear', 1000000 // nt FROM tagged
      UNION ALL
      SELECT event_type, 'u_shaped',
             CASE WHEN nt = 1 THEN 1000000
                  WHEN nt = 2 THEN 500000
                  WHEN rn = 1 OR rn = nt THEN 400000
                  ELSE 200000 // (nt - 2) END FROM tagged)
    SELECT channel, model,
           CAST(sum(credit) AS BIGINT) AS credit_e6,
           CAST(sum(CASE WHEN credit > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_touches_credited
    FROM m GROUP BY channel, model ORDER BY channel, model"""

  /** qbj: EXACT SHAPLEY ATTRIBUTION — the cooperative-game companion to
    * qb7's Markov removal effect. Each converting user's journey is a
    * COALITION of touched channels (the 4 non-purchase event types,
    * truncated at first purchase — qb7's journey convention); the
    * characteristic function v(S) counts conversions whose whole
    * coalition fits inside S; a channel's Shapley value is its
    * marginal contribution averaged over all orderings. With n = 4
    * channels that average is EXACT — 8 subsets per channel, no
    * sampling — and kept in integers by scaling by 4! = 24
    * (`phi24` = 24·φ, the permutation-weighted marginal sum itself).
    *
    * Scale shape: ONE grouped scan reduces any event volume to ≤16
    * (mask, n_conv) rows; everything after — v(S) over the 16 subsets,
    * the 32 (channel, subset) marginals — is broadcast arithmetic on
    * enum-bounded frames. This is the Shapley trick at 100 TB: the
    * game is over CHANNELS, so exponential cost lands on 2^n_channels,
    * never on rows. The efficiency axiom Σφ = v(N) − v(∅) rides along
    * as a graded column (`efficiency_ok`). */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val firstP = ev.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(struct(col("us"), col("event_id"))).as("fp"))
    // converting users only (v counts conversions): touches strictly
    // before the first purchase, qb7's tie rule
    val touches = ev.join(firstP, Seq("user_id"))
      .where(col("event_type") =!= "purchase" &&
        (col("us") < col("fp.us") ||
          (col("us") === col("fp.us") && col("event_id") < col("fp.event_id"))))
    val masks = firstP.select("user_id").join(touches
        .groupBy("user_id").agg(
          (max(when(col("event_type") === "view", 1L).otherwise(0L)) +
           max(when(col("event_type") === "click", 2L).otherwise(0L)) +
           max(when(col("event_type") === "signup", 4L).otherwise(0L)) +
           max(when(col("event_type") === "error", 8L).otherwise(0L)))
            .as("mask")),
        Seq("user_id"), "left")
      .select(coalesce(col("mask"), lit(0L)).as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("n_conv"))
    // v(S) for all 16 subsets: mask ⊆ S ⇔ mask & (15−S) = 0
    val subsets = spark.range(16).select(col("id").as("s"))
    val v = subsets.join(broadcast(masks),
        col("mask").bitwiseAND(lit(15L) - col("s")) === 0L, "left")
      .groupBy("s").agg(coalesce(sum("n_conv"), lit(0L)).as("v"))
      .cache()
    def pop(c: Column): Column =
      (c.bitwiseAND(1L) + shiftright(c, 1).bitwiseAND(1L) +
        shiftright(c, 2).bitwiseAND(1L) + shiftright(c, 3).bitwiseAND(1L))
    val channels = spark.range(4).select(col("id").as("c"),
      expr("shiftleft(1L, cast(id as int))").as("bit"))
    val pairs = channels
      .join(broadcast(v.as("lo")),
        col("lo.s").bitwiseAND(col("bit")) === 0L) // S without channel c
      .join(broadcast(v.as("hi")),
        col("hi.s") === col("lo.s") + col("bit"))
      .select(col("c"), col("lo.s").as("s"),
        (col("hi.v") - col("lo.v")).as("marginal"),
        // |S|!·(4−|S|−1)! for |S| = 0..3 → 6, 2, 2, 6
        when(pop(col("lo.s")) === 0L, 6L).when(pop(col("lo.s")) === 1L, 2L)
          .when(pop(col("lo.s")) === 2L, 2L).otherwise(6L).as("w"))
    val phi = pairs.groupBy("c")
      .agg(sum(col("w") * col("marginal")).as("phi24"))
    val eff = v.where(col("s") === 15L).select(col("v").as("v_full"))
      .crossJoin(v.where(col("s") === 0L).select(col("v").as("v_empty")))
      .crossJoin(phi.agg(sum("phi24").as("phi24_total")))
    phi.crossJoin(broadcast(eff))
      .select(
        when(col("c") === 0L, "view").when(col("c") === 1L, "click")
          .when(col("c") === 2L, "signup").otherwise("error").as("channel"),
        col("phi24"),
        (col("phi24") * 1000000L / 24L).cast("long").as("phi_e6"),
        col("v_full"), col("v_empty"),
        (col("phi24_total") === (col("v_full") - col("v_empty")) * 24L)
          .as("efficiency_ok"))
      .orderBy("channel")
  }

  /** DuckDB replay of [[shapleyAttribution]]: same masks, same subset
    * algebra, same 24-scaled exact weights. */
  def shapleyAttributionOracle: String = """
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    fp AS (
      SELECT user_id, us AS fus, event_id AS fid FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY us, event_id) AS prn
        FROM ev WHERE event_type = 'purchase') WHERE prn = 1),
    tch AS (
      SELECT e.user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) +
             max(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END) +
             max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) +
             max(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END) AS mask
      FROM ev e JOIN fp USING (user_id)
      WHERE event_type <> 'purchase'
        AND (us < fus OR (us = fus AND event_id < fid))
      GROUP BY e.user_id),
    mk AS (
      SELECT coalesce(tch.mask, 0) AS mask, count(1) AS n_conv
      FROM fp LEFT JOIN tch USING (user_id) GROUP BY 1),
    vs AS (
      SELECT s.range AS s, coalesce(sum(mk.n_conv), 0) AS v
      FROM range(0, 16) s LEFT JOIN mk ON (mk.mask & (15 - s.range)) = 0
      GROUP BY 1),
    pr AS (
      SELECT c.range AS c, lo.s AS s, hi.v - lo.v AS marginal,
             CASE ((lo.s & 1) + ((lo.s >> 1) & 1) + ((lo.s >> 2) & 1)
                   + ((lo.s >> 3) & 1))
               WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS w
      FROM range(0, 4) c
      JOIN vs lo ON ((lo.s >> c.range) & 1) = 0
      JOIN vs hi ON hi.s = lo.s + (1 << c.range)),
    phi AS (
      SELECT c, CAST(sum(w * marginal) AS BIGINT) AS phi24
      FROM pr GROUP BY c),
    eff AS (
      SELECT (SELECT v FROM vs WHERE s = 15) AS v_full,
             (SELECT v FROM vs WHERE s = 0) AS v_empty,
             (SELECT sum(phi24) FROM phi) AS phi24_total)
    SELECT CASE c WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                  WHEN 2 THEN 'signup' ELSE 'error' END AS channel,
           phi24,
           CAST(phi24 * 1000000 // 24 AS BIGINT) AS phi_e6,
           CAST(v_full AS BIGINT) AS v_full,
           CAST(v_empty AS BIGINT) AS v_empty,
           phi24_total = (v_full - v_empty) * 24 AS efficiency_ok
    FROM phi CROSS JOIN eff ORDER BY channel"""

  /** qca: BUSINESS-DAY SLA via a CALENDAR DIMENSION — the ops question
    * every fulfillment dashboard answers ("how many working days from
    * order to first ship?") and the operator pattern that answers it
    * at scale: NOT a per-row range join against the calendar (that is
    * O(rows × days)) but a cumulative-business-day INDEX — one tiny
    * window pass over the generated calendar (`sequence` + `explode`,
    * one row per day, ~2.4k rows on this fixture's span) gives
    * cum_bd(d), and then bd(o→s) = cum_bd(s) − cum_bd(o) is TWO
    * broadcast equi-joins per fact row. The single-partition window is
    * over the CALENDAR (bounded by the span in days — 36.5k rows even
    * for a century), never over facts. The closed form is signed, and
    * this fixture's shipdates are synthetic-random around the order
    * date (observed span −2383..+2447 days), so negative "latencies"
    * flow through and are graded (`n_backward`) — the operator
    * measures the feed instead of assuming its invariant. Orders with
    * no lineitems (257 at sf0.01) drop by inner-join contract. */
  def businessDays(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
    val firstShip = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("sdate"))
    val j = orders.join(firstShip, Seq("o_orderkey")).select("odate", "sdate")
    val cal = j
      .agg(least(min("odate"), min("sdate")).as("d0"),
        greatest(max("odate"), max("sdate")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .withColumn("is_bd",
        when(dayofweek(col("d")).isin(1, 7), 0L).otherwise(1L))
      .withColumn("cum_bd", sum("is_bd").over(Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("d", "cum_bd")
    val bd = j
      .join(broadcast(cal.withColumnRenamed("cum_bd", "bd_o")),
        col("odate") === col("d")).drop("d")
      .join(broadcast(cal.withColumnRenamed("cum_bd", "bd_s")),
        col("sdate") === col("d")).drop("d")
      .select(col("odate"), (col("bd_s") - col("bd_o")).as("bd"))
    bd.groupBy(date_format(col("odate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum("bd").as("bd_sum"),
        max("bd").as("bd_max"),
        sum(when(col("bd") === 0, 1L).otherwise(0L)).as("n_zero_bd"),
        sum(when(col("bd") < 0, 1L).otherwise(0L)).as("n_backward"))
      .orderBy("month")
  }

  /** DuckDB replay of [[businessDays]] — the calendar from a bounded
    * integer range + date arithmetic (DuckDB rejects lateral column
    * parameters to generate_series — the Similarity.scala:911
    * gotcha), same cumulative index (isodow < 6 ≡ dayofweek ∉
    * {1,7}). range(0, 40000) covers a >100-year span. */
  val businessDaysOracle: String = """
    WITH o AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate FROM orders),
    fs AS (
      SELECT l_orderkey AS o_orderkey, min(CAST(l_shipdate AS DATE)) AS sdate
      FROM lineitem GROUP BY 1),
    j AS (SELECT odate, sdate FROM o JOIN fs USING (o_orderkey)),
    b AS (SELECT least(min(odate), min(sdate)) AS d0,
                 greatest(max(odate), max(sdate)) AS d1 FROM j),
    cal AS (
      SELECT d0 + CAST(r.range AS INT) AS d,
             CASE WHEN isodow(d0 + CAST(r.range AS INT)) < 6
               THEN 1 ELSE 0 END AS is_bd
      FROM b CROSS JOIN range(0, 40000) r
      WHERE d0 + CAST(r.range AS INT) <= d1),
    cc AS (SELECT d, sum(is_bd) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
             AS cum_bd FROM cal),
    bd AS (
      SELECT j.odate, c2.cum_bd - c1.cum_bd AS bd
      FROM j JOIN cc c1 ON c1.d = j.odate JOIN cc c2 ON c2.d = j.sdate)
    SELECT strftime(odate, '%Y-%m') AS month,
           CAST(count(1) AS BIGINT) AS n_orders,
           CAST(sum(bd) AS BIGINT) AS bd_sum,
           CAST(max(bd) AS BIGINT) AS bd_max,
           CAST(sum(CASE WHEN bd = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_bd,
           CAST(sum(CASE WHEN bd < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backward
    FROM bd GROUP BY month ORDER BY month"""

  /** qck: TIME-WEIGHTED AVERAGE — the step-function integral the
    * point-in-time aggregates miss: a sensor/price/gauge `value` HOLDS
    * from its event until the next one, so the honest mean weights
    * each reading by how long it was in force, ∫v dt / (tN − t1) —
    * TWAP in finance, time-weighted gauges in observability. A plain
    * avg(value) over-counts chatty bursts (many short-lived readings)
    * exactly when they matter least.
    *
    * Exactness doctrine (the q3m lesson): value is cents
    * (round(v·100) — the fixture carries 2 decimals), time is epoch
    * MICROS, so the integral Σ v_e2·(t_next − t) is one exact BIGINT
    * per user and the only division is a final integer `div` at cent
    * grain. Nothing floats; the row hashes. Magnitude check: cents
    * ≤ 6e4 × span ≤ months-of-µs ≈ 1e13 → Σ ≤ ~1e18, inside BIGINT
    * for the fixture's per-user spans; at petabyte spans widen the
    * product to DECIMAL(38,0) — same plan, wider buffer.
    *
    * Plan: one scan → lead() in a per-user window (single shuffle by
    * user_id) → hash re-aggregate on the SAME key, which AQE executes
    * without a second exchange. Single-event users have no span and
    * are excluded by contract (HAVING span > 0). */
  def timeWeightedValue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        round(col("value") * 100).cast("long").as("v_e2"))
      .withColumn("next_us", lead(col("t_us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (max("t_us") - min("t_us")).as("span_us"),
        sum(when(col("next_us").isNotNull,
          col("v_e2") * (col("next_us") - col("t_us")))
          .otherwise(0L)).as("wsum"))
      .where(col("span_us") > 0)
      .select(col("user_id"), col("n_events"), col("span_us"),
        expr("wsum div span_us").as("twav_e2"))
      .orderBy("user_id")
  }

  /** Step-integral replay of [[timeWeightedValue]]. */
  val timeWeightedValueOracle: String = """
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS v_e2
      FROM events),
    s AS (
      SELECT user_id, t_us, v_e2,
             lead(t_us) OVER (PARTITION BY user_id
               ORDER BY t_us, event_id) AS next_us
      FROM ev),
    a AS (
      SELECT user_id, CAST(count(1) AS BIGINT) AS n_events,
             CAST(max(t_us) - min(t_us) AS BIGINT) AS span_us,
             CAST(sum(CASE WHEN next_us IS NULL THEN 0
               ELSE v_e2 * (next_us - t_us) END) AS BIGINT) AS wsum
      FROM s GROUP BY user_id)
    SELECT user_id, n_events, span_us,
           wsum // span_us AS twav_e2
    FROM a WHERE span_us > 0 ORDER BY user_id"""
}
