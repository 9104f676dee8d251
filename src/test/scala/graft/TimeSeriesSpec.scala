package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** EWMA / transition-matrix semantics, checked against a driver-side
  * hand replay of the same integer arithmetic on the fixture. */
class TimeSeriesSpec extends SparkSpec {

  test("attribution: matches a driver-side replay of the 24h window and integer credit split") {
    val rows = TimeSeries.attribution(spark, sfDir).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("credit_micro"))).toMap
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val dayUs = 86400000000L
    val purchases = ev.filter(_._3 == "purchase")
    val touches = ev.filter(e => e._3 == "click" || e._3 == "view")
    var agg = Map.empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    var seenPids = Map.empty[String, Set[Long]].withDefaultValue(Set.empty)
    var unattributed = (0L, 0L)
    purchases.foreach { case (u, pid, _, pus, v) =>
      val cents = math.floor(v * 100 + 0.5).toLong
      val ts = touches.filter(t => t._1 == u && t._4 < pus && t._4 >= pus - dayUs)
      if (ts.isEmpty) unattributed = (unattributed._1 + 1, unattributed._2 + cents * 10000)
      else {
        val credit = cents * 10000 / ts.length
        ts.foreach { t =>
          val (nt, np, c) = agg(t._3)
          agg += t._3 -> (nt + 1, np, c + credit)
          seenPids += t._3 -> (seenPids(t._3) + pid)
        }
      }
    }
    Seq("click", "view").foreach { ty =>
      val (nt, _, c) = agg(ty)
      assert(rows(ty) == ((nt, seenPids(ty).size.toLong, c)), s"mismatch for $ty")
    }
    assert(rows("(none)") == ((0L, unattributed._1, unattributed._2)))
  }

  test("forecastBacktest: matches a driver-side replay of both baselines") {
    val rows = TimeSeries.forecastBacktest(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val hourly = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (ty, r) =>
      val paired = hourly.keys.filter(_._1 == ty).map(_._2).filter { h =>
        hourly.contains((ty, h - 1)) && hourly.contains((ty, h - 24)) }.toSeq
      assert(r.getAs[Long]("n_hours") == paired.length.toLong)
      val aeP = paired.map(h => math.abs(hourly((ty, h)) - hourly((ty, h - 1)))).sum
      val aeS = paired.map(h => math.abs(hourly((ty, h)) - hourly((ty, h - 24)))).sum
      assert(r.getAs[Long]("ae_persist") == aeP)
      assert(r.getAs[Long]("ae_seasonal") == aeS)
      assert(r.getAs[Boolean]("seasonality_wins") == (aeS < aeP))
    }
  }

  test("ewmaHourly: exact hand-replay of the dyadic weighting for one event type") {
    val rows = TimeSeries.ewmaHourly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tpe = rows.head.getAs[String]("event_type")
    val hourly = rows.filter(_.getAs[String]("event_type") == tpe)
      .map(r => r.getAs[Long]("h") -> r.getAs[Long]("n")).toMap
    rows.filter(_.getAs[String]("event_type") == tpe).foreach { r =>
      val h = r.getAs[Long]("h")
      val terms = (0 to 11).flatMap { d =>
        hourly.get(h - d).map(pn => (pn * (1L << (11 - d)), 1L << (11 - d)))
      }
      val (num, den) = (terms.map(_._1).sum, terms.map(_._2).sum)
      assert(r.getAs[Long]("num") == num && r.getAs[Long]("den") == den,
        s"h=$h: got (${r.getAs[Long]("num")}, ${r.getAs[Long]("den")}), expected ($num, $den)")
      assert(r.getAs[Long]("ewma_milli") ==
        math.floor(num.toDouble / den * 1000.0 + 0.5).toLong)
    }
  }

  test("ewmaHourly: weight budget bounds (den in [2048, 4095]) and ewma within the count range") {
    val rows = TimeSeries.ewmaHourly(spark, sfDir).collect()
    rows.foreach { r =>
      val den = r.getAs[Long]("den")
      // delta=0 always matches itself (2^11); a full 12-hour window is 2^12-1
      assert(den >= 2048 && den <= 4095, s"den=$den out of range")
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("n"))
      val (lo, hi) = (ns.min * 1000, ns.max * 1000)
      rs.foreach { r =>
        val e = r.getAs[Long]("ewma_milli")
        assert(e >= lo - 500 && e <= hi + 500, s"ewma $e outside [$lo, $hi]")
      }
    }
  }

  test("volumeAnomalies: hand-replay of z from exact integer moments; all rows pass the 3-sigma cut") {
    val rows = TimeSeries.volumeAnomalies(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture should surface at least one >=3-sigma hour")
    // rebuild the hourly series and per-type moments driver-side
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("h"), r.getAs[Long]("n")))
    val byType = hourly.groupBy(_._1)
    rows.foreach { r =>
      val (tpe, h, n) = (r.getAs[String]("event_type"), r.getAs[Long]("h"), r.getAs[Long]("n"))
      val series = byType(tpe)
      val k = series.length.toDouble
      val mean = series.map(_._3).sum / k
      val varPop = series.map(x => x._3 * x._3).sum / k - mean * mean
      val zMilli = math.floor((n - mean) / math.sqrt(varPop) * 1000 + 0.5).toLong
      assert(r.getAs[Long]("z_milli") == zMilli, s"($tpe, $h)")
      assert(math.abs(zMilli) >= 3000)
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.forall(_.getAs[Long]("n_anomalies") == rs.length))
    }
  }

  test("maxConcurrency: equals a driver-side naive global sweep over the same sessions") {
    val rows = TimeSeries.maxConcurrency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sess = graft.streaming.Events.sessionize(spark, sfDir)
      .select("start_us", "end_us").collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
    // naive single-threaded sweep: +1 before -1 at the same instant
    val edges = sess.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy { case (us, d) => (us, -d) }
    var run = 0L
    val perHour = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    edges.foreach { case (us, d) =>
      run += d
      val h = us / 3600000000L
      val (mx, _, cnt) = perHour.getOrElse(h, (Long.MinValue, 0L, 0L))
      perHour(h) = (math.max(mx, run), run, cnt + 1)
    }
    assert(rows.length == perHour.size)
    rows.foreach { r =>
      val h = r.getAs[Long]("h")
      val (mx, last, cnt) = perHour(h)
      assert(r.getAs[Long]("max_concurrent") == mx, s"h=$h max")
      assert(r.getAs[Long]("end_concurrent") == last, s"h=$h end")
      assert(r.getAs[Long]("n_edges") == cnt, s"h=$h edges")
    }
    // global sanity: concurrency returns to zero after the last edge
    assert(rows.maxBy(_.getAs[Long]("h")).getAs[Long]("end_concurrent") == 0L)
  }

  test("cusumChangepoint: peak matches a driver-side exact-integer replay; ties break earliest") {
    val rows = TimeSeries.cusumChangepoint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("h"), r.getAs[Long]("n")))
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val series = hourly.filter(_._1 == tpe).sortBy(_._2)
      val total = series.map(_._3).sum
      val hCount = series.length.toLong
      var prefix = 0L
      val scored = series.zipWithIndex.map { case ((_, h, n), i) =>
        prefix += n
        (h, hCount * prefix - (i + 1).toLong * total)
      }
      val best = scored.minBy { case (h, s) => (-math.abs(s), h) }
      assert(r.getAs[Long]("h_peak") == best._1, s"$tpe peak hour")
      assert(r.getAs[Long]("cusum_scaled") == best._2, s"$tpe peak value")
      assert(r.getAs[Long]("abs_scaled") == math.abs(best._2))
      assert(r.getAs[Long]("n_hours") == hCount && r.getAs[Long]("total_n") == total)
    }
  }

  test("seasonalProfile: exact replay per slot; one peak per type; indices average to ~1e6") {
    val rows = TimeSeries.seasonalProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (tpe, rs) =>
      val total = rs.map(_.getAs[Long]("n")).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("total") == total, s"$tpe total")
        val expect = math.floor((r.getAs[Long]("n") * 24L * 1000000L).toDouble
          / total + 0.5).toLong
        assert(r.getAs[Long]("index_ppm") == expect, s"$tpe slot ${r.getAs[Long]("hod")}")
      }
      assert(rs.count(_.getAs[Boolean]("is_peak")) == 1, s"$tpe peaks")
      val peak = rs.filter(_.getAs[Boolean]("is_peak")).head
      assert(peak.getAs[Long]("n") == rs.map(_.getAs[Long]("n")).max)
      // 24 slots present and mean index ~1e6 (each slot rounds within 0.5 ppm)
      assert(rs.length == 24)
      assert(math.abs(rs.map(_.getAs[Long]("index_ppm")).sum - 24000000L) <= 13)
    }
  }

  test("eventTransitions: rows normalize to ~1e6 ppm and transitions count = events - users") {
    val rows = TimeSeries.eventTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25, "at most 5x5 transition cells")
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val s = rs.map(_.getAs[Long]("p_ppm")).sum
      assert(math.abs(s - 1000000L) <= rs.length / 2 + 1, s"$ft ppm sum $s")
    }
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected,
      "every event except each user's last contributes one transition")
  }

  test("volumeAcf: matches a driver-side scaled-deviation replay") {
    val rows = TimeSeries.volumeAcf(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 2L, 3L, 24L))
    val hourly = Tables.events(spark, sfDir)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = hourly.size.toLong
    val s = hourly.values.sum
    val d = hourly.view.mapValues(n => n * k - s).toMap
    val den = d.values.map(x => x * x).sum
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag")
      val pairs = d.keys.filter(h => d.contains(h - lag)).toSeq
      val num = pairs.map(h => d(h) * d(h - lag)).sum
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong, r.toString)
      assert(r.getAs[Long]("num") == num)
      assert(r.getAs[Long]("den") == den)
      assert(r.getAs[Long]("acf_e6") ==
        math.floor(num.toDouble / den * 1e6 + 0.5).toLong)
      // an ACF coefficient is bounded by 1 in magnitude
      assert(math.abs(r.getAs[Long]("acf_e6")) <= 1000000L)
    }
  }

  test("zipfSlope: matches a driver-side OLS replay over the ranked head") {
    val r = graft.operators.Text.zipfSlope(spark, sfDir).head()
    val freq = Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
      .take(1000)
    val xy = freq.zipWithIndex.map { case ((_, n), i) =>
      (math.floor(math.log((i + 1).toDouble) * 1e4 + 0.5).toLong,
        math.floor(math.log(n.toDouble) * 1e4 + 0.5).toLong)
    }
    val k = xy.length.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._1 * p._2).sum)
    assert(r.getAs[Long]("n_terms") == k)
    assert(r.getAs[Long]("sx") == sx && r.getAs[Long]("sy") == sy)
    assert(r.getAs[Long]("sxx") == sxx && r.getAs[Long]("sxy") == sxy)
    val slope = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx)
    assert(r.getAs[Long]("slope_e6") == math.floor(slope * 1e6 + 0.5).toLong)
    // token frequencies fall with rank, so the fitted slope must too
    assert(r.getAs[Boolean]("is_decreasing"))
  }

  test("q9p recency weights: full driver-side replay of the decay " +
      "quantization; ESS bounded by n") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = TimeSeries.recencyWeights(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val maxUs = ev.map(_._2).max
    val replay = ev.groupBy(_._1).map { case (t, xs) =>
      val ws = xs.map { case (_, us) =>
        val age = (maxUs - us).toDouble / 86400e6
        math.floor(math.exp(-math.log(2.0) / 7.0 * age) * 1e6 + 0.5).toLong
      }
      val ages = xs.map { case (_, us) => maxUs - us }
      t -> (xs.length.toLong, ws.sum,
        math.floor(ages.map(BigInt(_)).sum.toDouble / xs.length / 86400e6 * 1e3
          + 0.5).toLong,
        math.floor(ws.sum.toDouble * ws.sum
          / ws.map(w => BigInt(w) * w).sum.toDouble * 1e3 + 0.5).toLong)
    }
    assert(rows.map(_.getAs[Long]("n")).sum == ev.length)
    rows.foreach { r =>
      val (n, sw, meanAge, ess) = replay(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("sum_w_e6") == sw, "decayed mass replay diverged")
      assert(r.getAs[Long]("mean_age_e3") == meanAge)
      assert(r.getAs[Long]("ess_e3") == ess, "ESS replay diverged")
      assert(r.getAs[Long]("ess_e3") <= n * 1000L, "ESS cannot exceed n")
      assert(r.getAs[Long]("ess_e3") > 0L)
    }
  }

  test("qac kaplan-meier: curve replays from a driver-side subject walk; " +
      "monotone non-increasing; risk sets conserve") {
    val rows = TimeSeries.kaplanMeier(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val endUs = ev.map(_._2).max
    val subjects = ev.groupBy(_._1).values.map { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val t0 = sorted.head._2
      val tk = if (sorted.length >= 5) Some(sorted(4)._2) else None
      (1L + (tk.getOrElse(endUs) - t0) / 86400000000L, tk.isDefined)
    }.toSeq
    assert(rows.head.getAs[Long]("n_total") == subjects.length.toLong)
    // replay with the operator's exact formula (exp of the ln sum, not
    // a running product — the two can differ in the last ulp)
    var lnSum = 0.0
    var extinct = false
    val byDay = subjects.groupBy(_._1)
    rows.sortBy(_.getAs[Long]("day")).foreach { r =>
      val day = r.getAs[Long]("day")
      val in = byDay(day)
      val d = in.count(_._2).toLong
      val c = in.count(!_._2).toLong
      val nRisk = subjects.count(_._1 >= day).toLong
      assert(r.getAs[Long]("d") == d && r.getAs[Long]("c") == c,
        s"day $day events/censored")
      assert(r.getAs[Long]("n_risk") == nRisk, s"day $day risk set")
      if (d == nRisk) extinct = true
      else if (d > 0) lnSum += math.log(1.0 - d.toDouble / nRisk)
      val expected = if (extinct) 0L
        else math.floor(math.exp(lnSum) * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("surv_e6") == expected, s"day $day survival")
    }
    val curve = rows.sortBy(_.getAs[Long]("day")).map(_.getAs[Long]("surv_e6"))
    assert(curve.toSeq == curve.sorted.reverse.toSeq,
      "survival must be monotone non-increasing")
    val medianOpt =
      Option(rows.head.getAs[java.lang.Long]("median_day")).map(_.longValue)
    val firstBelow = rows.sortBy(_.getAs[Long]("day"))
      .find(_.getAs[Long]("surv_e6") < 500000L).map(_.getAs[Long]("day"))
    assert(medianOpt == firstBelow, "median is the first sub-0.5 day")
  }

  test("qa2 context training pairs: top-20 replays from a driver-side " +
      "trigram walk; probabilities and lift are internally consistent") {
    val rows = TimeSeries.contextTrainingPairs(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    // driver-side replay: per-user (ts, event_id)-ordered trigrams
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000
        + r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    val tris = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2))).toSeq
    }.toSeq
    val byCell = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = tris.length.toLong
    val ctxN = tris.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
    val labelN = tris.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expected = byCell.toSeq
      .sortBy { case ((a, b, l), n) => (-n, a, b, l) }.take(20)
    rows.zip(expected).foreach { case (r, ((a, b, l), n)) =>
      assert(r.getAs[String]("ctx_a") == a && r.getAs[String]("ctx_b") == b
        && r.getAs[String]("label") == l, s"rank ${r.getAs[Int]("rank")} cell")
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("ctx_n") == ctxN((a, b)))
      assert(r.getAs[Long]("label_n") == labelN(l))
      assert(r.getAs[Long]("total") == total)
      assert(r.getAs[Long]("p_ppm") ==
        math.floor(n.toDouble / ctxN((a, b)) * 1e6 + 0.5).toLong)
      assert(r.getAs[Long]("lift_ppm") ==
        math.floor((n.toDouble * total.toDouble)
          / (ctxN((a, b)).toDouble * labelN(l).toDouble) * 1e6 + 0.5).toLong)
    }
  }

  test("markovAttribution: removal can only hurt, shares form a partition") {
    val rows = TimeSeries.markovAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val base = rows.head.getAs[Long]("p_base_e6")
    assert(base > 0L && base <= 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("p_base_e6") == base,
        "base conversion probability must be identical on every row")
      // redirecting a channel's inbound edges to null removes paths;
      // it can never create conversion probability
      assert(r.getAs[Long]("p_removed_e6") <= base,
        s"${r.getAs[String]("channel")}: removal increased conversion")
      assert(r.getAs[Long]("removal_effect_ppm") >= 0L)
      assert(r.getAs[Long]("removal_effect_ppm") <= 1000000L)
    }
    // attribution shares partition 1e6 up to one floor loss per channel
    val attSum = rows.map(_.getAs[Long]("attribution_ppm")).sum
    assert(attSum <= 1000000L && attSum > 1000000L - rows.length,
      s"attribution shares must sum to ~1e6, got $attSum")
    // deterministic: the fixed point is integer arithmetic, no RNG
    val again = TimeSeries.markovAttribution(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("patternMatch: invariants hold; planted sequences pin the semantics") {
    val rows = TimeSeries.patternMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nm, ncl) = (r.getAs[Long]("n_clicks"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("n_clean"))
      assert(ncl <= nm && nm <= nc)
      assert(r.getAs[Long]("sum_gap_us") <= ncl * 1800000000L,
        "every clean gap is inside the tolerance")
    }
    // planted single-user sequences, tol = 1000 us:
    //  u1: click, purchase(+500)                    -> clean match
    //  u2: click, error(+200), purchase(+500)       -> matched, dirty
    //  u3: click, purchase(+500), error(+700)       -> clean (error after)
    //  u4: click, purchase(+2000)                   -> no match (late)
    import spark.implicits._
    val planted = Seq(
      (1L, 100L, "click", 1L), (1L, 600L, "purchase", 2L),
      (2L, 100L, "click", 3L), (2L, 300L, "error", 4L),
      (2L, 600L, "purchase", 5L),
      (3L, 100L, "click", 6L), (3L, 600L, "purchase", 7L),
      (3L, 800L, "error", 8L),
      (4L, 100L, "click", 9L), (4L, 2100L, "purchase", 10L)
    ).toDF("user_id", "us", "event_type", "event_id")
    val out = TimeSeries.patternMatchOf(planted, tolUs = 1000L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_clicks") == 4L)
    assert(out.head.getAs[Long]("n_matched") == 3L)
    assert(out.head.getAs[Long]("n_clean") == 2L,
      "the in-between error must invalidate exactly u2")
    assert(out.head.getAs[Long]("sum_gap_us") == 1000L, "u1 + u3 gaps")
  }

  test("theilSen: robust to a planted corrupted day where OLS is not") {
    val rows = TimeSeries.theilSen(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_pairs") == nd * (nd - 1) / 2,
        "pair count must be the full days-choose-2")
    }
    // planted: flat series n=100 over 11 days, the LAST day spiked to
    // 2000 (an endpoint spike has maximal OLS leverage; a centered one
    // would tilt nothing). 10 of 11 days are on the flat line -> the
    // median pairwise slope is 0; OLS is dragged hard.
    import spark.implicits._
    val planted = ((0 to 10).map(d =>
      ("flat_spike", d.toLong, if (d == 10) 2000L else 100L)) ++
      (0 to 10).map(d => ("clean_trend", d.toLong, 100L + 7L * d)))
      .toDF("event_type", "day", "n")
    val out = TimeSeries.theilSenOf(planted).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("flat_spike").getAs[Long]("theil_sen_e6") == 0L,
      "the median slope must ignore the single corrupted day")
    assert(math.abs(out("flat_spike").getAs[Long]("ols_e6")) > 1000000L,
      "OLS must be visibly dragged by the spike")
    assert(out("clean_trend").getAs[Long]("theil_sen_e6") == 7000000L)
    assert(out("clean_trend").getAs[Long]("ols_e6") == 7000000L)
  }

  test("qc5 running distinct: first-seen reduction conserves users") {
    import org.apache.spark.sql.functions._
    val rows = operators.TimeSeries.runningDistinct(spark, sfDir).collect()
    val totalUsers = Tables.events(spark, sfDir)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(rows.last.getAs[Long]("cumulative_reach") == totalUsers)
    assert(rows.map(_.getAs[Long]("n_new")).sum == totalUsers)
    assert(rows.head.getAs[Long]("n_active") == rows.head.getAs[Long]("n_new"),
      "on day one every active user is new")
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("n_new")
      assert(r.getAs[Long]("cumulative_reach") == cum)
      assert(r.getAs[Long]("n_returning") >= 0L)
      assert(r.getAs[Long]("n_returning") ==
        r.getAs[Long]("n_active") - r.getAs[Long]("n_new"))
    }
  }

  test("qc6 clamped balance: prefix-min identity equals the literal sequential fold") {
    import org.apache.spark.sql.functions._
    val rows = operators.TimeSeries.clampedBalance(spark, sfDir).collect()
      .map(r => r.getAs[Long]("supp") -> r).toMap
    assert(rows.nonEmpty)
    val mv = Tables.lineitem(spark, sfDir)
      .where(col("l_suppkey") % 37 === 0)
      .select(col("l_suppkey"), col("l_shipdate").cast("string"),
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_linenumber") % 2 === 1, col("l_quantity"))
          .otherwise(-col("l_quantity")).cast("long"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getAs[Number](3).longValue), r.getLong(4)))
      .groupBy(_._1)
    mv.foreach { case (supp, ms) =>
      var bal = 0L; var peak = 0L
      val clampLevels = scala.collection.mutable.Set.empty[Long]
      var s = 0L; var low = 0L
      ms.sortBy(_._2).foreach { case (_, _, d) =>
        bal = math.max(0L, bal + d) // the literal non-associative fold
        peak = math.max(peak, bal)
        s += d; if (s < 0L && s < low) { clampLevels += s }
        low = math.min(low, s)
      }
      val r = rows(supp)
      assert(r.getAs[Long]("final_balance") == bal, s"supp $supp final")
      assert(r.getAs[Long]("peak_balance") == peak, s"supp $supp peak")
      assert(r.getAs[Long]("n_moves") == ms.size.toLong)
      assert(r.getAs[Long]("n_clamp_levels") == clampLevels.size.toLong,
        s"supp $supp clamps")
    }
  }

  test("qc1 bandit replay: windowed-SQL replay equals the literal sequential walk") {
    import org.apache.spark.sql.functions._
    val rows = operators.TimeSeries.banditReplay(spark, sfDir).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    val arms = Seq("click", "error", "purchase", "signup", "view")
    val log = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), (col("value") > 10.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    val cnt = scala.collection.mutable.Map(arms.map(_ -> 0L): _*)
    val rew = scala.collection.mutable.Map(arms.map(_ -> 0L): _*)
    val nMatched = scala.collection.mutable.Map(arms.map(_ -> 0L): _*)
    val rMatched = scala.collection.mutable.Map(arms.map(_ -> 0L): _*)
    log.foreach { case (_, logged, r) =>
      // greedy argmax over running means, optimistic 1/1 init,
      // alphabetical tie-break — cross-multiplied, like the SQL
      val pick = arms.find { a =>
        arms.filter(_ != a).forall { o =>
          val (na, da) = if (cnt(a) == 0) (1L, 1L) else (rew(a), cnt(a))
          val (no, dn) = if (cnt(o) == 0) (1L, 1L) else (rew(o), cnt(o))
          na * dn >= no * da
        }
      }.get
      if (pick == logged) {
        nMatched(logged) += 1; if (r) rMatched(logged) += 1
      }
      cnt(logged) += 1; if (r) rew(logged) += 1
    }
    arms.foreach { a =>
      assert(rows(a).getAs[Long]("n_logged") == cnt(a), s"$a logged")
      assert(rows(a).getAs[Long]("n_matched") == nMatched(a), s"$a matched")
      assert(rows(a).getAs[Long]("rew_matched") == rMatched(a), s"$a reward")
    }
    val est = rMatched.values.sum * 1000000L / nMatched.values.sum
    rows.values.foreach(r =>
      assert(r.getAs[Long]("replay_estimate_e6") == est))
  }

  test("qbx attribution models: per-model credit conservation across channels") {
    import org.apache.spark.sql.functions._
    val rows = operators.TimeSeries.attributionModels(spark, sfDir).collect()
    val byModel = rows.groupBy(_.getAs[String]("model"))
    assert(byModel.keySet ==
      Set("first_touch", "last_touch", "linear", "u_shaped"))
    // journeys = converted users with >=1 pre-purchase touch, plus each
    // journey's length (for exact floor-loss accounting)
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime)).groupBy(_._1)
    val lens = ev.values.flatMap { evs =>
      val ps = evs.filter(_._3 == "purchase")
      if (ps.isEmpty) None
      else {
        val fp = ps.minBy(e => (e._4, e._2))
        val n = evs.count(e => e._3 != "purchase" &&
          (e._4 < fp._4 || (e._4 == fp._4 && e._2 < fp._2)))
        if (n > 0) Some(n.toLong) else None
      }
    }.toSeq
    val j = lens.size.toLong
    def total(m: String) = byModel(m).map(_.getAs[Long]("credit_e6")).sum
    // bookend models: exactly one full credit per journey
    assert(total("first_touch") == j * 1000000L)
    assert(total("last_touch") == j * 1000000L)
    // linear: per journey n·floor(1e6/n) — the exact floor loss
    assert(total("linear") == lens.map(n => n * (1000000L / n)).sum)
    // u-shaped: closed form per journey length
    def uTotal(n: Long): Long =
      if (n == 1) 1000000L else if (n == 2) 1000000L
      else 800000L + (n - 2) * (200000L / (n - 2))
    assert(total("u_shaped") == lens.map(uTotal).sum)
    // credited-touch counts: first/last credit exactly one touch each
    assert(byModel("first_touch").map(_.getAs[Long]("n_touches_credited")).sum == j)
    assert(byModel("last_touch").map(_.getAs[Long]("n_touches_credited")).sum == j)
  }

  test("qbj Shapley: subset-weighted form equals the literal 24-permutation average; efficiency holds") {
    import org.apache.spark.sql.functions._
    val rows = operators.TimeSeries.shapleyAttribution(spark, sfDir)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(rows.size == 4)
    // independent truth: per-user masks in plain Scala, then Shapley by
    // its DEFINITION — marginal contribution averaged over all 4! = 24
    // channel orderings (the operator uses the subset-weight form)
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime))
      .groupBy(_._1)
    val chanBit = Map("view" -> 1, "click" -> 2, "signup" -> 4, "error" -> 8)
    val masks = ev.values.flatMap { evs =>
      val ps = evs.filter(_._3 == "purchase")
      if (ps.isEmpty) None
      else {
        val fp = ps.minBy(e => (e._4, e._2))
        val mask = evs.filter(e => e._3 != "purchase" &&
            (e._4 < fp._4 || (e._4 == fp._4 && e._2 < fp._2)))
          .map(e => chanBit(e._3)).fold(0)(_ | _)
        Some(mask)
      }
    }.toSeq
    def v(s: Int): Long = masks.count(m => (m & ~s & 15) == 0).toLong
    val phi24 = Array.fill(4)(0L)
    (0 until 4).permutations.foreach { perm =>
      var s = 0
      perm.foreach { c => phi24(c) += v(s | (1 << c)) - v(s); s |= (1 << c) }
    }
    val names = Array("view", "click", "signup", "error")
    (0 until 4).foreach { c =>
      assert(rows(names(c)).getAs[Long]("phi24") == phi24(c), names(c))
      assert(rows(names(c)).getAs[Boolean]("efficiency_ok"))
    }
    assert(phi24.sum == (v(15) - v(0)) * 24L, "efficiency (independent)")
  }

  test("qca business days: cumulative-index closed form equals the literal weekday walk") {
    import org.apache.spark.sql.functions._
    val rows = operators.TimeSeries.businessDays(spark, sfDir).collect()
      .map(r => r.getAs[String]("month") -> r).toMap
    // independent truth: literal signed weekday count per order, in
    // plain Scala off the raw dates (no calendar index)
    val j = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      .join(Tables.lineitem(spark, sfDir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(min(to_date(col("l_shipdate"))).as("sd")), Seq("o_orderkey"))
      .select("od", "sd").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
    def walkBd(o: java.time.LocalDate, s: java.time.LocalDate): Long = {
      val sign = if (s.isBefore(o)) -1L else 1L
      val (a, b) = if (s.isBefore(o)) (s, o) else (o, s)
      sign * Iterator.iterate(a.plusDays(1))(_.plusDays(1))
        .takeWhile(!_.isAfter(b))
        .count(d => d.getDayOfWeek.getValue <= 5)
    }
    val truth = j.groupBy { case (o, _) =>
      f"${o.getYear}%04d-${o.getMonthValue}%02d"
    }.map { case (m, ps) =>
      val bds = ps.map { case (o, s) => walkBd(o, s) }
      m -> (ps.size.toLong, bds.sum, bds.max,
        bds.count(_ == 0L).toLong, bds.count(_ < 0L).toLong)
    }
    assert(rows.keySet == truth.keySet && rows.nonEmpty)
    truth.foreach { case (m, (n, sum0, mx, nz, nb)) =>
      val r = rows(m)
      assert(r.getAs[Long]("n_orders") == n, s"$m n")
      assert(r.getAs[Long]("bd_sum") == sum0, s"$m sum")
      assert(r.getAs[Long]("bd_max") == mx, s"$m max")
      assert(r.getAs[Long]("n_zero_bd") == nz, s"$m zero")
      assert(r.getAs[Long]("n_backward") == nb, s"$m backward")
    }
    // the fixture's random shipdates must exercise the signed arm
    assert(truth.values.map(_._5).sum > 0L, "backward latencies present")
  }

  test("qck time-weighted average: equals a driver-side step-integral replay; chatty bursts weigh by duration, not count") {
    val rows = TimeSeries.timeWeightedValue(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("span_us"),
          r.getAs[Long]("twav_e2"))).toMap
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    ev.foreach { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val span = sorted.last._3 - sorted.head._3
      if (span > 0) {
        val wsum: Long = sorted.iterator.zip(sorted.iterator.drop(1))
          .map { case (a, b) => math.round(a._4 * 100) * (b._3 - a._3) }
          .foldLeft(0L)(_ + _)
        val (n, s, t) = rows(uid)
        assert(n == sorted.length.toLong, s"u$uid n")
        assert(s == span, s"u$uid span")
        assert(t == wsum / span, s"u$uid twav")
      } else assert(!rows.contains(uid), s"u$uid should be excluded")
    }
    // planted burst: avg(value) is fooled, the time integral is not —
    // 9 instant readings of 100.00 then one held at 0.00 for the rest
    import spark.implicits._
    val t0 = 1700000000000000L
    val burst = ((0 until 9).map(i =>
      (1L, i.toLong, t0 + i, 100.0)) :+ (1L, 9L, t0 + 9L, 0.0)) :+
      (1L, 10L, t0 + 1000009L, 0.0)
    val df = burst.toDF("user_id", "event_id", "t_us", "v")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(t_us)").as("ts"), col("v").as("value"))
    df.createOrReplaceTempView("burst_ev")
    // replay the operator body over the planted frame via the same
    // window + agg shape (frame-level twin of timeWeightedValue)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t_us", "event_id")
    val out = df.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        round(col("value") * 100).cast("long").as("v_e2"))
      .withColumn("next_us", lead(col("t_us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (max("t_us") - min("t_us")).as("span_us"),
        sum(when(col("next_us").isNotNull,
          col("v_e2") * (col("next_us") - col("t_us")))
          .otherwise(0L)).as("wsum"))
      .selectExpr("user_id", "wsum div span_us AS twav_e2").collect()
    // integral: 9 µs at 100.00 + 1,000,000 µs at 0 -> ~0.00, while the
    // naive avg of readings would be ~81.82
    assert(out.length == 1 && out(0).getAs[Long]("twav_e2") == 0L)
  }
}
