package graft

import graft.operators.TimeJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** As-of / range join semantics on a hand-built corpus where every
  * answer is known: no-prior-row → null, exact-tie → matched (>=
  * semantics), multiple candidates → latest wins, keys never cross. */
class TimeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin picks the latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts(100), "c1"), // before any right row → null
      (1L, ts(200), "c2"), // exact tie with r@200 → matched
      (1L, ts(350), "c3"), // r@200 and r@300 prior → r@300 wins
      (2L, ts(250), "c4")  // key 2 has r@240 only — no cross-key leak
    ).toDF("key", "ts", "name")
    val right = Seq(
      (1L, ts(200), 20.0),
      (1L, ts(300), 30.0),
      (2L, ts(240), 99.0),
      (2L, ts(260), 11.0) // after c4 → must not match
    ).toDF("key", "ts", "rv")

    val out = TimeJoin.asofJoin(left, right, "key", "ts", Seq("rv"))
      .select(col("name"), col("__asof_rv"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("c1").isEmpty)
    assert(out("c2").contains(20.0))
    assert(out("c3").contains(30.0))
    assert(out("c4").contains(99.0))
  }

  test("asofJoin tie-break: multiple right rows at one (key, ts) resolve deterministically") {
    // without a payload column in the window order, which of the three
    // rows last() carries is engine-internal row order; the contract is
    // the greatest payload tuple wins
    val left = Seq((1L, ts(200), "c")).toDF("key", "ts", "name")
    val right = Seq((1L, ts(200), 5.0), (1L, ts(200), 9.0), (1L, ts(200), 1.0))
      .toDF("key", "ts", "rv")
    (1 to 2).foreach { _ =>
      val got = TimeJoin.asofJoin(left, right.repartition(3), "key", "ts", Seq("rv"))
        .select(col("__asof_rv")).head().getDouble(0)
      assert(got == 9.0, s"tie-break picked $got, expected greatest payload 9.0")
    }
  }

  test("fixture asof join: purchase never later than click, nulls only before first purchase") {
    val rows = TimeJoin.asofClickPurchase(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("purchase_us"))) {
        assert(r.getAs[Long]("purchase_us") <= r.getAs[Long]("click_us"))
      }
    }
  }

  test("asofJoinNative: planted semantics (null before first, >= tie, latest wins, no cross-key leak)") {
    val left = Seq(
      (1L, ts(100), "c1"), // before any right row → null
      (1L, ts(200), "c2"), // exact tie with r@200 → matched
      (1L, ts(350), "c3"), // r@200 and r@300 prior → r@300 wins
      (2L, ts(250), "c4"), // key 2 has r@240 only — no cross-key leak
      (3L, ts(999), "c5")  // key 3 has no right rows at all → null
    ).toDF("key", "ts", "name")
    val right = Seq(
      (1L, ts(200), 20.0),
      (1L, ts(300), 30.0),
      (2L, ts(240), 99.0),
      (2L, ts(260), 11.0) // after c4 → must not match
    ).toDF("key", "ts", "rv")
    val out = TimeJoin.asofJoinNative(left, right, "key", "ts", Seq("rv"))
      .select(col("name"), col("rv"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("c1").isEmpty)
    assert(out("c2").contains(20.0))
    assert(out("c3").contains(30.0))
    assert(out("c4").contains(99.0))
    assert(out("c5").isEmpty)
  }

  test("asofJoinNative: exact-(key,ts) ties resolve to the greatest payload tuple, like the composed form") {
    val left = Seq((1L, ts(200), "c")).toDF("key", "ts", "name")
    val right = Seq((1L, ts(200), 5.0), (1L, ts(200), 9.0), (1L, ts(200), 1.0))
      .toDF("key", "ts", "rv")
    (1 to 2).foreach { _ =>
      val got = TimeJoin.asofJoinNative(left, right.repartition(3), "key", "ts", Seq("rv"))
        .select(col("rv")).head().getDouble(0)
      assert(got == 9.0, s"tie-break picked $got, expected greatest payload 9.0")
    }
  }

  test("asofJoinNative forward: planted semantics (null after last, >= tie, earliest wins, no cross-key leak)") {
    val left = Seq(
      (1L, ts(100), "c1"), // before r@200 → forward matches r@200
      (1L, ts(200), "c2"), // exact tie with r@200 → matched
      (1L, ts(250), "c3"), // between r@200 and r@300 → r@300
      (1L, ts(350), "c4"), // after the last right row → null
      (2L, ts(250), "c5"), // key 2: only r@260 is at-or-after
      (3L, ts(1), "c6")    // key 3 has no right rows at all → null
    ).toDF("key", "ts", "name")
    val right = Seq(
      (1L, ts(200), 20.0),
      (1L, ts(300), 30.0),
      (2L, ts(240), 99.0), // before c5 → must not match forward
      (2L, ts(260), 11.0)
    ).toDF("key", "ts", "rv")
    val out = TimeJoin.asofJoinNative(left, right, "key", "ts", Seq("rv"),
        forward = true)
      .select(col("name"), col("rv"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("c1").contains(20.0))
    assert(out("c2").contains(20.0))
    assert(out("c3").contains(30.0))
    assert(out("c4").isEmpty)
    assert(out("c5").contains(11.0))
    assert(out("c6").isEmpty)
  }

  test("asofJoinNative forward: exact-(key,ts) ties resolve to the SMALLEST payload tuple") {
    val left = Seq((1L, ts(200), "c")).toDF("key", "ts", "name")
    val right = Seq((1L, ts(200), 5.0), (1L, ts(200), 9.0), (1L, ts(200), 1.0))
      .toDF("key", "ts", "rv")
    (1 to 2).foreach { _ =>
      val got = TimeJoin.asofJoinNative(left, right.repartition(3), "key", "ts",
          Seq("rv"), forward = true)
        .select(col("rv")).head().getDouble(0)
      assert(got == 1.0, s"forward tie-break picked $got, expected smallest payload 1.0")
    }
  }

  test("asofJoinNative ≡ composed union+window form on the events fixture, and plans AsofJoinExec") {
    val native = TimeJoin.asofClickPurchaseNative(spark, sfDir)
    assert(native.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "custom strategy did not plan AsofJoinExec")
    val composed = TimeJoin.asofClickPurchase(spark, sfDir).collect().toSeq
    val rows = native.collect().toSeq
    assert(rows.nonEmpty && rows == composed,
      s"native (${rows.size} rows) != composed (${composed.size} rows)")
  }

  test("asofJoinNative preserves partitioning: downstream groupBy(key) adds no exchange") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("p_value"))
    val agg = TimeJoin.asofJoinNative(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .groupBy("user_id").agg(sum("p_value").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one exchange per join side, none for the groupBy — the operator's
    // declared outputPartitioning carries through
    assert(exchanges == 2, s"expected 2 exchanges (join inputs only), got $exchanges in:\n$plan")
  }

  test("asofJoinNative: a hot key (90% of rows) merges correctly — per-partition state is O(1), not per-key") {
    // one key owns 900 left rows and 50 right rows; two cold keys check isolation
    val left = ((1 to 900).map(i => (1L, ts(i * 10), i.toLong)) ++
      Seq((2L, ts(5000), 9001L), (3L, ts(1), 9002L))).toDF("key", "ts", "row_id")
    val right = ((1 to 50).map(i => (1L, ts(i * 100), i * 1.0)) ++
      Seq((2L, ts(4000), 777.0))).toDF("key", "ts", "rv")
    val out = TimeJoin.asofJoinNative(left, right, "key", "ts", Seq("rv"))
      .collect().map(r => r.getAs[Long]("row_id") ->
        (if (r.isNullAt(r.fieldIndex("rv"))) None else Some(r.getDouble(r.fieldIndex("rv"))))).toMap
    (1 to 900).foreach { i =>
      val expected = { val k = (i * 10) / 100; if (k >= 1) Some(math.min(k, 50) * 1.0) else None }
      assert(out(i.toLong) == expected, s"left row at ts=${i * 10}")
    }
    assert(out(9001L).contains(777.0) && out(9002L).isEmpty)
  }

  test("range join counts exactly the purchases in (click-1h, click]") {
    val rows = TimeJoin.rangeJoinBinned(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent recomputation with a plain (non-scalable) non-equi join
    val ev = Tables.events(spark, sfDir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), unix_micros(col("ts")).as("p_us"))
    val naive = c.join(p,
        c("user_id") === col("pu") &&
        col("p_us") <= col("click_us") && col("p_us") > col("click_us") - 3600000000L,
        "left")
      .groupBy("click_id").agg(count(col("p_us")).as("n"))
      .collect().map(r => r.getAs[Long]("click_id") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchases_1h") == naive(r.getAs[Long]("click_id")),
        s"click ${r.getAs[Long]("click_id")}")
    }
  }

  test("tolerance as-of: agrees with q36 where fresh, drops exactly the stale matches") {
    val tol = 3600000000L
    val base = TimeJoin.asofClickPurchase(spark, sfDir).collect()
      .map(r => r.getAs[Long]("click_id") -> r).toMap
    val rows = TimeJoin.asofClickPurchaseTolerance(spark, sfDir).collect()
    assert(rows.length == base.size)
    var stale = 0
    rows.foreach { r =>
      val b = base(r.getAs[Long]("click_id"))
      val baseMatch = !b.isNullAt(b.fieldIndex("purchase_us"))
      if (baseMatch &&
          b.getAs[Long]("click_us") - b.getAs[Long]("purchase_us") <= tol) {
        // fresh: identical annotation to the unbounded as-of
        assert(r.getAs[Long]("purchase_us") == b.getAs[Long]("purchase_us"))
        assert(r.getAs[Double]("purchase_value") == b.getAs[Double]("purchase_value"))
        assert(!r.getAs[Boolean]("stale_dropped"))
      } else {
        assert(r.isNullAt(r.fieldIndex("purchase_us")), r.toString)
        assert(r.isNullAt(r.fieldIndex("purchase_value")))
        assert(r.getAs[Boolean]("stale_dropped") == baseMatch, r.toString)
        if (baseMatch) stale += 1
      }
    }
    // the fixture must actually exercise both null meanings
    assert(stale > 0, "no stale matches dropped — tolerance untested")
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("purchase_us"))))
  }

  test("nearest as-of: picks the closer of the backward/forward matches, ties backward") {
    def us(r: org.apache.spark.sql.Row, c: String): Option[Long] =
      if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
    val back = TimeJoin.asofClickPurchase(spark, sfDir).collect()
      .map(r => r.getAs[Long]("click_id") -> us(r, "purchase_us")).toMap
    val fwd = TimeJoin.asofClickNextPurchaseNative(spark, sfDir).collect()
      .map(r => r.getAs[Long]("click_id") -> us(r, "purchase_us")).toMap
    val rows = TimeJoin.asofClickPurchaseNearest(spark, sfDir).collect()
    assert(rows.length == back.size)
    var backN = 0; var fwdN = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("click_id"); val c = r.getAs[Long]("click_us")
      val (b, f) = (back(id), fwd(id))
      val expected = (b, f) match {
        case (None, None) => ("none", None)
        case (Some(bu), None) => ("backward", Some(bu))
        case (None, Some(fu)) => ("forward", Some(fu))
        case (Some(bu), Some(fu)) =>
          if (c - bu <= fu - c) ("backward", Some(bu)) else ("forward", Some(fu))
      }
      assert(r.getAs[String]("direction") == expected._1, r.toString)
      assert(us(r, "purchase_us") == expected._2, r.toString)
      expected._1 match {
        case "backward" =>
          backN += 1; assert(r.getAs[Long]("dist_us") == c - expected._2.get)
        case "forward" =>
          fwdN += 1; assert(r.getAs[Long]("dist_us") == expected._2.get - c)
        case _ => assert(r.isNullAt(r.fieldIndex("dist_us")))
      }
    }
    // both directions must win somewhere or the pick logic is untested
    assert(backN > 0 && fwdN > 0, s"one-sided fixture: back=$backN fwd=$fwdN")
  }

  test("same-day as-of: agrees with q36 intraday, structurally drops cross-day matches") {
    val df = TimeJoin.asofClickPurchaseSameDay(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "composite-key form did not plan through the native operator")
    def dayUs(us: Long) = us / 86400000000L
    val base = TimeJoin.asofClickPurchase(spark, sfDir).collect()
      .map(r => r.getAs[Long]("click_id") -> r).toMap
    val rows = df.collect()
    assert(rows.length == base.size)
    var crossDayDropped = 0
    rows.foreach { r =>
      val b = base(r.getAs[Long]("click_id"))
      val sameDay = !b.isNullAt(b.fieldIndex("purchase_us")) &&
        dayUs(b.getAs[Long]("purchase_us")) == dayUs(b.getAs[Long]("click_us"))
      if (sameDay) {
        // intraday: identical annotation to the single-key join
        assert(r.getAs[Long]("purchase_us") == b.getAs[Long]("purchase_us"))
        assert(r.getAs[Double]("purchase_value") == b.getAs[Double]("purchase_value"))
      } else {
        // yesterday's state must not leak through the day fence
        assert(r.isNullAt(r.fieldIndex("purchase_us")), r.toString)
        if (!b.isNullAt(b.fieldIndex("purchase_us"))) crossDayDropped += 1
      }
    }
    assert(crossDayDropped > 0, "no cross-day matches in fixture — fence untested")
  }
}
