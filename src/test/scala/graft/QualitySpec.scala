package graft

import graft.operators.{Curation, Dedup, Entity, Graph, Quality, Relational, Similarity}
import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** Round-5 batch-2 operators: profiling, drift, z-order, frequent
  * pairs, stratified sampling, entity resolution, triangles. Each test
  * checks the operator against an independent small-scale replay (scala
  * brute force or hand arithmetic), not against itself. */
class QualitySpec extends SparkSpec {

  test("dataProfile: metrics agree with direct per-column recomputation") {
    val rows = Quality.dataProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    assert(rows.keySet == Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_linestatus"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L) // fixture has no nulls
      assert(r.getAs[Double]("completeness") == 1.0)
    }
    val distinctFlags = li.select("l_returnflag").distinct().count()
    assert(rows("l_returnflag").getAs[Long]("n_distinct") == distinctFlags)
    val qtyMin = li.agg(min("l_quantity")).head().getDouble(0)
    assert(rows("l_quantity").getAs[Double]("min_num") == qtyMin)
    // string columns carry string min/max, numeric slots null
    assert(rows("l_returnflag").isNullAt(rows("l_returnflag").fieldIndex("min_num")))
    assert(rows("l_returnflag").getAs[String]("min_str") != null)
  }

  test("dataProfileApprox: sketch within ±5% everywhere; approx-only plan has no EXPAND") {
    val rows = Quality.dataProfileApprox(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")),
      "HLL++ estimate left the ±5% band")
    // the exact q1d must agree on the deterministic columns
    val exact = Quality.dataProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") == exact(r.getAs[String]("column_name")))
    }
    // the 100 TB claim: an approx-ONLY profile is a single pass with no
    // EXPAND replication
    val li = Tables.lineitem(spark, sfDir)
    val approxOnly = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02),
      approx_count_distinct(col("l_quantity"), 0.02),
      approx_count_distinct(col("l_returnflag"), 0.02))
    assert(!approxOnly.queryExecution.executedPlan.toString.contains("Expand"),
      "approx-only profile must not replicate the scan")
    // r14: q1d's per-column union shape must ALSO be Expand-free — a
    // single-distinct aggregate per column plans the plain two-phase
    // distinct. The EXPAND cost the union shape avoids is pinned by the
    // negative control: the same distincts FUSED into one aggregate.
    assert(!Quality.dataProfile(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "per-column exact profile must not EXPAND — that is the r14 shape")
    val fused = li.agg(
      countDistinct(col("l_orderkey")),
      countDistinct(col("l_quantity")),
      countDistinct(col("l_returnflag")))
    assert(fused.queryExecution.executedPlan.toString.contains("Expand"),
      "fused multi-distinct is expected to EXPAND — the cost q1d now avoids")
  }

  test("distributionDrift: shares sum to 1 and PSI total is the exact term sum") {
    val rows = Quality.distributionDrift(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val sumBase = rows.map(_.getAs[Long]("share_base_ppm")).sum
    val sumCurr = rows.map(_.getAs[Long]("share_curr_ppm")).sum
    // smoothed ppm shares over observed bins sum to ≤1e6 (missing bins
    // hold the remainder, rounding adds ≤0.5 ppm per bin); with all 10
    // bins present they sum to ~1e6
    assert(sumBase <= 1000005L && sumBase > 800000L)
    assert(sumCurr <= 1000005L && sumCurr > 800000L)
    // integer encoding: total is the EXACT sum of the integer terms
    val termSum = rows.map(_.getAs[Long]("psi_term_e9")).sum
    val total = rows.head.getAs[Long]("psi_total_e9")
    assert(termSum == total)
    assert(rows.forall(_.getAs[Long]("psi_total_e9") == total))
    assert(total >= 0L) // PSI is a sum of (p-q)ln(p/q) ≥ 0 terms
    // replay the psi arithmetic from the emitted integer shares
    rows.foreach { r =>
      val pb = math.max(r.getAs[Long]("share_base_ppm"), 1L).toDouble / 1e6
      val pc = math.max(r.getAs[Long]("share_curr_ppm"), 1L).toDouble / 1e6
      val expect = math.floor((pc - pb) * math.log(pc / pb) * 1e9 + 0.5).toLong
      assert(r.getAs[Long]("psi_term_e9") == expect)
    }
  }

  test("winsorizedStats: clipping narrows the mean toward the body, bounds ordered") {
    val rows = Quality.winsorizedStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p05 = r.getAs[Double]("p05"); val p95 = r.getAs[Double]("p95")
      assert(p05 < p95)
      val mw = r.getAs[Double]("mean_winsorized")
      assert(mw >= p05 && mw <= p95, "winsorized mean must lie inside the clip bounds")
      val n = r.getAs[Long]("n")
      val nLo = r.getAs[Long]("n_clipped_lo"); val nHi = r.getAs[Long]("n_clipped_hi")
      // ~5% clipped each side for a continuous column (interpolated
      // percentile ⇒ at most ceil(5%) strictly outside each bound)
      assert(nLo <= n * 6 / 100 + 1 && nHi <= n * 6 / 100 + 1)
      assert(nLo > 0 && nHi > 0, "fixture is continuous; both tails should clip")
    }
  }

  test("starJoinRevenue: same-nation constraint holds and region filter prunes") {
    val rows = Relational.starJoinRevenue(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every output nation must belong to ASIA
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("n_name")).toSet.subsetOf(asiaNations))
    // revenue strictly ordered descending (tie-broken by name)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("starJoinRevenue plan: date range pushed to the orders scan, region filter pushed") {
    val plan = Relational.starJoinRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      "date lower bound must reach the parquet scan")
    assert(plan.contains("LessThan(o_orderdate"),
      "date upper bound must reach the parquet scan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      "region filter must reach the region scan, not run post-join")
  }

  test("joinNullSafe: the NULL key group survives; plain equality would drop it") {
    val rows = Relational.joinNullSafe(spark, sfDir).collect()
      .map(r => r.getAs[Int]("nk_group") -> r).toMap
    val nullCust = Tables.customer(spark, sfDir)
      .where(col("c_nationkey") === 13).count()
    val nullSupp = Tables.supplier(spark, sfDir)
      .where(col("s_nationkey") === 13).count()
    assert(nullCust > 0 && nullSupp > 0, "fixture must have nation-13 rows on both sides")
    assert(rows.contains(-1), "null-safe join must keep the NULL group")
    assert(rows(-1).getAs[Long]("n_customers") == nullCust)
    assert(rows(-1).getAs[Long]("n_suppliers") == nullSupp)
    assert(rows(-1).getAs[Long]("n_pairs") == nullCust * nullSupp)
    // non-null groups behave exactly like a plain equi join
    rows.filterKeys(_ != -1).values.foreach { r =>
      assert(r.getAs[Long]("n_pairs") ==
        r.getAs[Long]("n_customers") * r.getAs[Long]("n_suppliers"))
    }
  }

  test("spearmanCorr: rho in [-1,1]; rho=1 on a planted monotone frame") {
    val rows = Relational.spearmanCorr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 && rho <= 1.0)
    }
    // planted: y = exp(x) is monotone → Spearman 1 even though Pearson < 1
    import spark.implicits._
    val planted = Seq.tabulate(50)(i => ("g", i.toDouble, math.exp(i / 5.0), i.toLong, i))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_orderkey", "l_linenumber")
    val wq = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val rho = planted
      .withColumn("rq", row_number().over(wq).cast("double"))
      .withColumn("rp", row_number().over(wp).cast("double"))
      .agg(corr(col("rq"), col("rp"))).head().getDouble(0)
    assert(math.abs(rho - 1.0) < 1e-12)
  }

  test("windowDistribution: quartiles partition each segment, ranks bounded") {
    val rows = Relational.windowDistribution(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    val segSizes = Tables.customer(spark, sfDir).groupBy("c_mktsegment")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySeg.foreach { case (seg, qs) =>
      assert(qs.map(_.getAs[Int]("quartile")).sorted.toSeq ==
        (1 to qs.length).toSeq)
      assert(qs.map(_.getAs[Long]("n")).sum == segSizes(seg))
      // ntile balance: sizes differ by at most 1
      val sizes = qs.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1)
      // quartile value ranges must be non-overlapping and ordered
      val ordered = qs.sortBy(_.getAs[Int]("quartile"))
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a.getAs[Double]("hi_bal") <= b.getAs[Double]("lo_bal") + 0.01)
      }
      assert(ordered.last.getAs[Double]("max_percent_rank") == 1.0)
      assert(ordered.last.getAs[Double]("max_cume_dist") == 1.0)
    }
  }

  test("arrayHofStats matches a scala fold over the sorted event stream") {
    val rows = Relational.arrayHofStats(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val events = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "value").collect()
      .map { r =>
        val i = r.getTimestamp(1).toInstant // micros precision, not getTime's ms
        (r.getLong(0), i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getLong(2), r.getDouble(3))
      }
    events.groupBy(_._1).foreach { case (uid, evs) =>
      val vals = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val r = rows(uid)
      assert(r.getAs[Int]("n_events") == vals.length)
      assert(r.getAs[Int]("n_big") == vals.count(_ > 100.0))
      val mx = vals.max
      val norm = vals.foldLeft(0.0)((acc, v) => acc + v / mx)
      assert(math.abs(r.getAs[Double]("norm_sum") - norm) < 1e-3)
      assert(r.getAs[Double]("first_value") ==
        math.round(vals.head * 100.0) / 100.0)
    }
  }

  test("bigramScore matches a scala add-one bigram LM on the fixture") {
    val out = graft.operators.Text.bigramScore(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
      .filter(_._2.length >= 2)
    val uni = scala.collection.mutable.Map[String, Long]()
    val big = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (_, toks) =>
      toks.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      toks.sliding(2).foreach { w =>
        big((w(0), w(1))) = big.getOrElse((w(0), w(1)), 0L) + 1 }
    }
    val v = uni.size.toDouble
    docs.foreach { case (id, toks) =>
      val lps = toks.sliding(2).map { w =>
        math.log((big((w(0), w(1))) + 1.0) / (uni(w(0)) + v))
      }.toArray
      val r = out(id)
      assert(r.getAs[Long]("n_bigrams") == lps.length)
      assert(math.abs(r.getAs[Double]("avg_logprob") - lps.sum / lps.length) < 1e-3)
    }
    assert(out.keySet == docs.map(_._1).toSet)
  }

  test("hammingTopK matches a scala sign-pack + popcount brute force") {
    val out = Similarity.hammingTopK(spark, sfDir).collect()
    assert(out.nonEmpty)
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def pack(v: Array[Float]): (Long, Long) = {
      var w0 = 0L; var w1 = 0L
      for (i <- 0 until 32) if (v(i) > 0) w0 |= (1L << i)
      for (i <- 0 until 32) if (v(i + 32) > 0) w1 |= (1L << i)
      (w0, w1)
    }
    val q = out.head.getAs[Long]("q_id")
    val (qw0, qw1) = pack(emb(q))
    val brute = emb.filter(_._1 >= 4).map { case (id, v) =>
      val (w0, w1) = pack(v)
      (id, java.lang.Long.bitCount(w0 ^ qw0) + java.lang.Long.bitCount(w1 ^ qw1))
    }.toSeq.sortBy { case (id, h) => (h, id) }.take(10)
    val engine = out.filter(_.getAs[Long]("q_id") == q)
      .sortBy(_.getAs[Int]("rk"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("hamming"))).toSeq
    assert(engine == brute, s"query $q: engine $engine vs brute $brute")
  }

  test("knnJoin: per-query top-k equals brute force for a sampled query") {
    val out = Similarity.knnJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    val qIds = out.map(_.getAs[Long]("q_id")).distinct
    assert(qIds.forall(_ < 8))
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = qIds.head
    val brute = emb.filter(_._1 >= 8)
      .map { case (id, vec) =>
        (id, BigDecimal(cos(emb(q), vec)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val engine = out.filter(_.getAs[Long]("q_id") == q)
      .sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("vec_id")).toSeq
    assert(engine == brute, s"query $q: engine $engine vs brute $brute")
  }

  test("regressionAgg matches closed-form OLS computed in scala") {
    val rows = Relational.regressionAgg(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    li.groupBy(_._1).foreach { case (flag, xs) =>
      val x = xs.map(_._2); val y = xs.map(_._3); val n = x.length
      val mx = x.sum / n; val my = y.sum / n
      val sxy = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sxx = x.map(a => (a - mx) * (a - mx)).sum
      val slope = sxy / sxx
      val r = rows(flag)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-3)
      assert(math.abs(r.getAs[Double]("intercept") - (my - slope * mx)) < 1e-1)
      assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0)
    }
  }

  test("containmentPairs: brute-force parity for the top pair; bounds hold") {
    val pairs = Dedup.containmentPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty, "fixture's planted duplicates must produce pairs")
    pairs.foreach { p =>
      assert(p.getAs[Long]("n_shared") <=
        math.min(p.getAs[Long]("n_grams_a"), p.getAs[Long]("n_grams_b")))
      val c = p.getAs[Double]("containment")
      assert(c >= 0.2 && c <= 1.0)
    }
    // brute-force the highest-containment pair
    val top = pairs.maxBy(_.getAs[Double]("containment"))
    val ids = Seq(top.getAs[Long]("a"), top.getAs[Long]("b"))
    val texts = Tables.documents(spark, sfDir)
      .where(col("doc_id").isin(ids: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val ga = grams(texts(ids.head)); val gb = grams(texts(ids(1)))
    val expect = ga.intersect(gb).size.toDouble / math.min(ga.size, gb.size)
    assert(math.abs(top.getAs[Double]("containment") - expect) < 1e-6)
    assert(top.getAs[Long]("n_shared") == ga.intersect(gb).size)
  }

  test("containmentPairsOf: df cap bounds a planted ubiquitous gram's fan-out") {
    import spark.implicits._
    // 20 filler docs all sharing the ubiquitous trigram "the same header"
    // (df=20) and nothing else; plus one genuine near-superset pair whose
    // shared grams have df=2
    val filler = (1 to 20).map(i => (i.toLong, s"the same header a$i"))
    val planted = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val docs = (filler ++ planted).toDF("doc_id", "text")
    // without the cap the ubiquitous gram alone makes 20·19/2 = 190 pairs
    val uncapped = Dedup.containmentPairsOf(docs, dfCap = Long.MaxValue).collect()
    assert(uncapped.length == 191)
    // with the cap the fan-out bomb is gone; only the genuine pair survives
    val capped = Dedup.containmentPairsOf(docs, dfCap = 3L).collect()
    assert(capped.length == 1)
    val p = capped.head
    assert((p.getAs[Long]("a"), p.getAs[Long]("b")) == (100L, 101L))
    assert(p.getAs[Double]("containment") == 1.0) // 4 shared of min(4, 8)
    assert(p.getAs[Long]("n_shared") == 4L && p.getAs[Long]("n_grams_a") == 4L)
    assert(p.getAs[Long]("n_capped_grams") == 1L, "exactly the planted ubiquitous gram")
    // fixture surface: the default cap (64) is live but drops nothing
    assert(uncapped.head.getAs[Long]("n_capped_grams") == 0L)
  }

  test("chiSquareIndependence matches a scala contingency replay") {
    val rows = Quality.chiSquareIndependence(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = li.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val n = li.length.toDouble
    val rowT = li.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val colT = li.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val chi2 = cells.map { case ((f, s), obs) =>
      val exp = rowT(f) * colT(s) / n
      (obs - exp) * (obs - exp) / exp
    }.sum
    assert(rows.length == cells.size)
    assert(math.abs(rows.head.getAs[Double]("chi2_total") - chi2) < 1e-3)
    rows.foreach { r =>
      val key = (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
      assert(r.getAs[Long]("observed") == cells(key).toLong)
      assert(r.getAs[Double]("chi2_term") >= 0.0)
    }
  }

  test("scd2PointInTime: every order matches exactly one dimension version") {
    val rows = graft.sources.Warehouse.scd2PointInTime(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("complete")),
      "SCD2 invariant: n_matched == n_facts must hold")
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total,
      "per-priority partition must cover every order exactly once")
    // the dimension records priority CHANGES, so each joined order's
    // version priority equals the order's own priority
    val joinedPriorities = rows.map(_.getAs[String]("priority")).toSet
    val orderPriorities = Tables.orders(spark, sfDir)
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).toSet
    assert(joinedPriorities == orderPriorities)
  }

  test("snapshotCdc: op classes conserve rows and the planted rates") {
    val rows = graft.sources.Warehouse.snapshotCdc(spark, sfDir).collect()
      .map(r => r.getAs[String]("op") -> r).toMap
    assert(rows.keySet == Set("insert", "update", "delete", "unchanged"))
    val nOrders = Tables.orders(spark, sfDir).count()
    val ins = rows("insert").getAs[Long]("n"); val del = rows("delete").getAs[Long]("n")
    val upd = rows("update").getAs[Long]("n"); val unch = rows("unchanged").getAs[Long]("n")
    assert(del + upd + unch == nOrders, "old rows partition into delete/update/unchanged")
    // planted rates: ~10% each for update/delete/insert
    assert(math.abs(upd - nOrders / 10.0) < nOrders * 0.05)
    assert(math.abs(del - nOrders / 10.0) < nOrders * 0.05)
    assert(math.abs(ins - nOrders / 10.0) < nOrders * 0.05)
    // every update adds exactly +500.00
    assert(rows("update").getAs[Double]("price_delta") == upd * 500.0)
    assert(rows("unchanged").getAs[Double]("price_delta") == 0.0)
  }

  test("zorder2 interleaves bits exactly") {
    val df = spark.range(1).select(
      Warehouse.zorder2(lit(0L), lit(0L)).as("z00"),
      Warehouse.zorder2(lit(1L), lit(0L)).as("z10"),
      Warehouse.zorder2(lit(0L), lit(1L)).as("z01"),
      Warehouse.zorder2(lit(3L), lit(5L)).as("z35"),
      Warehouse.zorder2(lit(65535L), lit(65535L)).as("zmax"))
    val r = df.head()
    assert(r.getAs[Long]("z00") == 0L)
    assert(r.getAs[Long]("z10") == 2L) // left bit 0 → position 1
    assert(r.getAs[Long]("z01") == 1L) // right bit 0 → position 0
    // 3=0b011, 5=0b101 → interleave(left=011, right=101) =
    // pos5..0: l2 r2 l1 r1 l0 r0 = 0 1 1 0 1 1 = 0b011011 = 27
    assert(r.getAs[Long]("z35") == 27L)
    assert(r.getAs[Long]("zmax") == (1L << 32) - 1)
  }

  test("zorderRoundTrip: output is the true z-order prefix") {
    val out = Warehouse.zorderRoundTrip(spark, sfDir).collect()
    assert(out.length == 200)
    val zs = out.map(_.getAs[Long]("zval"))
    assert(zs.sameElements(zs.sorted), "not sorted by zval")
    // spot-check the interleave against a scala replay on the output rows
    out.take(20).foreach { r =>
      val pk = r.getAs[Long]("l_partkey"); val sk = r.getAs[Long]("l_suppkey")
      val expect = (0 until 16).map { i =>
        (((pk >> i) & 1L) << (2 * i + 1)) + (((sk >> i) & 1L) << (2 * i))
      }.sum
      assert(r.getAs[Long]("zval") == expect)
    }
  }

  test("frequentPairs agrees with a scala brute-force on the fixture") {
    val out = Curation.frequentPairs(spark, sfDir, minSupport = 5L).collect()
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) ->
        r.getAs[Long]("support")).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
    val brute = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.split("[^a-z]+")
        .filter(_.length >= 3).distinct.sorted
      for (i <- toks.indices; j <- i + 1 until toks.length)
        brute((toks(i), toks(j))) = brute.getOrElse((toks(i), toks(j)), 0L) + 1L
    }
    val expected = brute.filter(_._2 >= 5L).toMap
    assert(out == expected,
      s"engine ${out.size} pairs vs brute ${expected.size}")
  }

  test("stratifiedSample: every stratum hits its hash gate exactly") {
    val rows = Curation.stratifiedSample(spark, sfDir).collect()
    val target = rows.head.getAs[Long]("target")
    assert(rows.map(_.getAs[Long]("n_total")).min == target)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def u(id: Long): Double = {
      val s1 = (id % 2147483647L) * 48271L % 2147483647L
      (s1 * 48271L % 2147483647L).toDouble / 2147483647L
    }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val frac = target.toDouble / r.getAs[Long]("n_total")
      val replay = docs.count { case (id, l) => l == lang && u(id) < frac }
      assert(r.getAs[Long]("n_sampled") == replay)
      assert(r.getAs[Long]("target") == target)
      // the hash gate has no granularity floor: a nonzero target always
      // admits a nonzero sampling fraction
      assert(frac > 0.0 && r.getAs[Double]("target_frac") > 0.0)
    }
  }

  test("blockedFuzzyPairs finds planted near-duplicate names only within blocks") {
    import spark.implicits._
    val recs = Seq(
      (1L, "B1", "red widget"), (2L, "B1", "red widget"), // dist 0
      (3L, "B1", "red widgit"), // dist 1 to 1,2
      (4L, "B2", "red widget"), // same name, different block → no pair
      (5L, "B1", "blue cable"), // far from everything
      (6L, "B2", "blu cable") // cross-block near-dup of 5 → no pair
    ).toDF("id", "brand", "name")
    val pairs = Entity.blockedFuzzyPairs(recs, "id", "brand", "name", maxDist = 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("triangleCount matches brute force on a planted graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant edge 4-5 (no new triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val tris = Graph.triangleCount(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tris == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangleCount: degree orientation handles a planted high-degree hub") {
    import spark.implicits._
    // star: hub 0 → leaves 1..20 (hub degree 20, leaves degree ≤2), plus
    // closing edge (1,2) ⇒ exactly one triangle. Under id orientation the
    // hub would generate 190 wedges; degree orientation points every
    // leaf-hub edge INTO the hub, so the hub generates none and the
    // count is still exact.
    val star = (1 to 20).map(i => (0L, i.toLong)) :+ ((1L, 2L))
    val tris = Graph.triangleCount(star.toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tris.toSeq == Seq((0L, 1L, 2L)))
  }

  test("linkPrediction: C4 square predicts exactly the two diagonals at Jaccard 1.0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rows = Graph.linkPredictionOn(edges, degreeCap = 64L, topK = 20).collect()
    val got = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("common_nbrs"), r.getAs[Long]("jaccard_ppm"),
      r.getAs[Long]("pa_score"), r.getAs[Long]("capped_centers"))).toSet
    // diagonals (1,3) and (2,4): 2 shared neighbors, J = 2/(2+2-2) = 1
    assert(got == Set((1L, 3L, 2L, 1000000L, 4L, 0L),
                      (2L, 4L, 2L, 1000000L, 4L, 0L)))
  }

  test("linkPrediction: degree cap excludes a planted hub center and reports it") {
    import spark.implicits._
    // star hub 0 → 20 leaves plus closing edge (1,2). With cap 10 the
    // hub (degree 20) generates NO wedges; the only leaf-centered
    // wedge pairs (0,1)/(0,2) are existing edges, so output is empty
    // but the drop is visible via capped_centers = 1.
    val star = ((1 to 20).map(i => (0L, i.toLong)) :+ ((1L, 2L)))
      .toDF("src", "dst")
    val rows = Graph.linkPredictionOn(star, degreeCap = 10L, topK = 20).collect()
    assert(rows.isEmpty)
    val unc = Graph.linkPredictionOn(star, degreeCap = 64L, topK = 300).collect()
    // uncapped: hub wedges produce all 190 leaf pairs minus the (1,2) edge
    assert(unc.length == 189)
    assert(unc.forall(_.getAs[Long]("capped_centers") == 0L))
  }

  test("pageRankConverged: mass conserved to 1 with a planted sink node") {
    import spark.implicits._
    // cycle-ish core 1→{2,3}, 2→{3,4}, 3→1 with 4 a SINK (no
    // out-edges): without dangling redistribution its rank mass leaks
    // every round. 3 receives two streams while the sink receives one,
    // so the sink ranks strictly last (a single shared split would tie)
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pageRankConverged(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9,
      s"rank mass leaked: total=${pr.values.sum}")
    assert(pr.values.forall(_ > 0.0))
    // the cycle members receive recirculated mass; the sink only
    // receives from node 1's split — it must rank below every cycle node
    assert(pr(4L) < pr(1L) && pr(4L) < pr(2L) && pr(4L) < pr(3L))
  }

  test("bfsHops matches hand-computed hops on a planted path + branch") {
    import spark.implicits._
    // 1→2→3→4 chain plus branch 2→5; source 1, 2 rounds
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L)).toDF("src", "dst")
    val hops = Graph.bfsHops(nodes, edges, sourceId = 1L, rounds = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(hops == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L, 5L -> 2L))
  }

  test("shortestPath: matches a driver-side Bellman-Ford replay; refines monotonically") {
    val rows = Graph.shortestPath(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sfDir).count()
    val edges = (0L until n).flatMap { s =>
      Seq((s * 31 + 7) % n, (s * 17 + 3) % n, (s * 13 + 11) % n)
        .map(d => (s, d, 1L + (s * 7 + d * 5) % 10))
    }
    def relaxRounds(r: Int): Map[Long, Long] = {
      var dist = Map(0L -> 0L)
      for (_ <- 1 to r) {
        val relaxed = edges.flatMap { case (s, d, w) =>
          dist.get(s).map(x => d -> (x + w))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .view.mapValues(_.map(_._2).min).toMap
      }
      dist
    }
    assert(rows == relaxRounds(4))
    // hop budget L dominates L-1: no distance grows, coverage only expands
    val prev = relaxRounds(3)
    prev.foreach { case (id, d) => assert(rows(id) <= d) }
    assert(prev.keySet.subsetOf(rows.keySet))
    assert(rows(0L) == 0L)
  }

  test("linkKCore: matches a driver-side peel replay; converged means true k-core") {
    val r = Graph.linkKCore(spark, sfDir).head()
    val n = Tables.documents(spark, sfDir).count()
    val und = (0L until n).flatMap { s =>
      Seq((s * 31 + 7) % n, (s * 17 + 3) % n, (s * 13 + 11) % n)
        .flatMap(d => Seq((s, d), (d, s)))
    }.distinct
    var core = (0L until n).toSet
    var prev = core
    for (_ <- 1 to 6) {
      prev = core
      val deg = und.filter { case (s, d) => core(s) && core(d) }
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      core = core.filter(id => deg.getOrElse(id, 0L) >= 6L)
    }
    val finDeg = und.filter { case (s, d) => core(s) && core(d) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(r.getAs[Long]("n_core_nodes") == core.size.toLong)
    assert(r.getAs[Boolean]("converged") == (core == prev))
    if (core.nonEmpty) {
      assert(r.getAs[Long]("core_edges_directed") == finDeg.values.sum)
      assert(r.getAs[Long]("min_core_degree") == finDeg.values.min)
      // if the peel converged, the survivor set is by definition a k-core
      if (r.getAs[Boolean]("converged"))
        assert(r.getAs[Long]("min_core_degree") >= 6L)
    }
  }

  test("linkBfsHops: histogram covers all docs, frontier grows then truncates") {
    val rows = Graph.linkBfsHops(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hop") -> r.getAs[Long]("n_nodes")).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.values.sum == nDocs, "histogram must cover every node")
    assert(rows(0L) == 1L, "exactly the source at hop 0")
    assert(rows.getOrElse(1L, 0L) >= 3L, "source has >= 3 distinct neighbors")
  }

  test("linkTriangles: total is consistent and per-vertex counts sum to 3×total") {
    val rows = Graph.linkTriangles(spark, sfDir).collect()
    val total = rows.head.getAs[Long]("total_triangles")
    assert(total > 0, "near-neighbor lattice must close triangles")
    assert(rows.map(_.getAs[Long]("n_triangles")).sum == 3 * total)
  }

  test("linkClusteringCoefficient: exact identities against linkTriangles and bounds") {
    val rows = Graph.linkClusteringCoefficient(spark, sfDir).collect()
    val tri = Graph.linkTriangles(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "every vertex of the connected lattice reports")
    val totalTri = rows.head.getAs[Long]("total_triangles")
    val wedges = rows.head.getAs[Long]("wedges")
    // transitivity = 3T/wedges must sit in [0, 1e6] and match the rational
    assert(rows.head.getAs[Long]("transitivity_ppm") ==
      (6000000L * totalTri + wedges) / (2L * wedges))
    rows.foreach { r =>
      val d = r.getAs[Long]("deg"); val t = r.getAs[Long]("n_triangles")
      assert(t == tri.getOrElse(r.getAs[Long]("doc_id"), 0L), "per-vertex parity with q5d")
      assert(t * 2 <= d * (d - 1), "triangles can't exceed neighbor pairs")
      val cc = r.getAs[Long]("cc_ppm")
      assert(cc >= 0 && cc <= 1000000L)
      if (d >= 2) assert(cc == (4000000L * t + d * (d - 1)) / (2 * d * (d - 1)))
    }
    // wedge identity: sum of C(deg, 2) over all vertices
    assert(wedges == rows.map { r =>
      val d = r.getAs[Long]("deg"); d * (d - 1) / 2 }.sum)
  }

  test("linkAssortativity: coefficient bounded, moments match a driver-side replay") {
    val r = Graph.linkAssortativity(spark, sfDir).head()
    val a = r.getAs[Long]("assortativity_e6")
    assert(a >= -1000000L && a <= 1000000L)
    // independent replay of the moment sums in driver-side integers
    val n = Tables.documents(spark, sfDir).count()
    val und = (0L until n).flatMap { i =>
      Seq((i + 1) % n, (i + 2) % n, (i + 3) % n, (i * 17 + 3) % n)
        .filter(_ != i).map(j => (math.min(i, j), math.max(i, j)))
    }.distinct
    val deg = und.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val xs = und.flatMap { case (u, v) => Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    assert(r.getAs[Long]("n_pairs") == xs.size.toLong)
    assert(r.getAs[Long]("sx") == xs.map(_._1).sum)
    assert(r.getAs[Long]("sxx") == xs.map(p => p._1 * p._1).sum)
    assert(r.getAs[Long]("sxy") == xs.map(p => p._1 * p._2).sum)
  }

  test("linkHits: integer fixed-point matches a driver-side replay") {
    val rows = Graph.linkHits(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    val edges = (0L until n).flatMap { i =>
      Seq((i + 1) % n, (i + 2) % n, (i * 17 + 3) % n)
        .filter(_ != i).map(j => (i, j))
    }.distinct
    var hub = Map.empty[Long, Long].withDefaultValue(1L)
    var auth = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 3) {
      auth = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub(e._1)).sum }.withDefaultValue(0L)
      hub = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum }.withDefaultValue(0L)
    }
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("hub_score") == hub(id), s"hub mismatch at $id")
      assert(r.getAs[Long]("auth_score") == auth(id), s"auth mismatch at $id")
    }
  }

  test("abZTest: z matches a driver-side replay and chi-square identity z^2 = chi2") {
    val r = Quality.abZTest(spark, sfDir).head()
    val (n1, x1) = (r.getAs[Long]("n1"), r.getAs[Long]("x1"))
    val (n2, x2) = (r.getAs[Long]("n2"), r.getAs[Long]("x2"))
    assert(n1 > 0 && n2 > 0)
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    val p = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(r.getAs[Long]("z_e6") == math.floor(z * 1e6 + 0.5).toLong)
    // 2x2 identity: z^2 equals the Pearson chi-square of the table
    val chi2 = {
      val obs = Seq((x1, n1 - x1, n1), (x2, n2 - x2, n2))
      val tot = (n1 + n2).toDouble
      val colTot = Seq((x1 + x2).toDouble, (n1 - x1 + n2 - x2).toDouble)
      obs.flatMap { case (s, f, n) =>
        Seq((s.toDouble, n * colTot(0) / tot), (f.toDouble, n * colTot(1) / tot))
      }.map { case (o, e) => (o - e) * (o - e) / e }.sum
    }
    assert(math.abs(z * z - chi2) < 1e-9 * chi2)
  }

  test("fdrSegments: z replay, descending criticals, step-up consistency") {
    val rows = Quality.fdrSegments(spark, sfDir).collect().sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 5)
    // criticals are the fixed BH ladder, strictest first
    assert(rows.map(_.getAs[Long]("crit_e6")).toSeq ==
      Seq(2575829L, 2326348L, 2170090L, 2053749L, 1959964L))
    // |z| non-increasing with rank; z matches the q1w arithmetic per row
    val zs = rows.map(r => math.abs(r.getAs[Long]("z_e6")))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (n1, x1) = (r.getAs[Long]("n1"), r.getAs[Long]("x1"))
      val (n2, x2) = (r.getAs[Long]("n2"), r.getAs[Long]("x2"))
      val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
      val p = (x1 + x2).toDouble / (n1 + n2)
      val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
      assert(r.getAs[Long]("z_e6") == math.floor(z * 1e6 + 0.5).toLong)
      assert(r.getAs[Boolean]("pass_raw") ==
        (math.abs(r.getAs[Long]("z_e6")) >= r.getAs[Long]("crit_e6")))
    }
    // step-up: rejected exactly for ranks <= max passing rank
    val maxPass = rows.filter(_.getAs[Boolean]("pass_raw"))
      .map(_.getAs[Int]("rank")).sorted.lastOption
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rejected") ==
        maxPass.exists(r.getAs[Int]("rank") <= _))
    }
  }

  test("bootstrapCI: replicate means bracket the true mean, CI = ranks 2/31, n_eff ~ n") {
    val rows = Quality.bootstrapCI(spark, sfDir).collect().sortBy(_.getAs[Int]("rep"))
    assert(rows.length == 32)
    val means = rows.map(_.getAs[Long]("mean_e4")).sorted
    val lo = rows.head.getAs[Long]("ci_lo_e4")
    val hi = rows.head.getAs[Long]("ci_hi_e4")
    assert(lo == means(1) && hi == means(30), "CI must be the rank-2/rank-31 order stats")
    assert(lo <= hi)
    // the true mean (same e4 quantization) must sit inside the 90% CI —
    // the fixture is large enough that a miss means broken arithmetic
    val li = Tables.lineitem(spark, sfDir)
      .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("s"),
        count(lit(1)).as("n")).head()
    val trueMean = li.getLong(0) * 10000L / (li.getLong(1) * 100L)
    assert(trueMean >= lo && trueMean <= hi, s"$trueMean outside [$lo, $hi]")
    // Poisson(1) weights: effective n within 5% of n on every replicate
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_eff")
      assert(math.abs(ne - li.getLong(1)).toDouble / li.getLong(1) < 0.05)
    }
  }

  test("cupedVarianceReduction: theta/rho match built-ins, reduction = rho^2") {
    val r = Quality.cupedVarianceReduction(spark, sfDir).head()
    val cut = lit("1996-01-01").cast("date")
    val per = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(
        sum(when(col("o_orderdate") < cut,
          floor(col("o_totalprice") * 100 + 0.5).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("o_orderdate") >= cut,
          floor(col("o_totalprice") * 100 + 0.5).cast("long")).otherwise(0L)).as("y"),
        sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("np"),
        sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("nq"))
      .where(col("np") > 0 && col("nq") > 0)
    val b = per.agg(
      corr(col("x").cast("double"), col("y").cast("double")).as("rho"),
      (covar_pop(col("x").cast("double"), col("y").cast("double"))
        / var_pop(col("x").cast("double"))).as("theta"),
      count(lit(1)).as("n")).head()
    assert(r.getAs[Long]("n_customers") == b.getAs[Long]("n"))
    assert(math.abs(r.getAs[Long]("theta_e6") / 1e6 - b.getAs[Double]("theta")) < 1e-3)
    val rho = b.getAs[Double]("rho")
    assert(math.abs(r.getAs[Long]("corr_e6") / 1e6 - rho) < 1e-3)
    assert(math.abs(r.getAs[Long]("var_reduction_ppm") / 1e6 - rho * rho) < 1e-3)
  }

  test("corrMatrix: |corr| bounded and every pair matches built-in corr within quantization grain") {
    val rows = Quality.corrMatrix(spark, sfDir).collect()
    assert(rows.length == 6)
    val byPair = rows.map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) ->
      r.getAs[Long]("corr_e6")).toMap
    byPair.values.foreach(c => assert(math.abs(c) <= 1000000L))
    // parity with the float corr at centi-quantization grain, all 6 pairs
    // (the synthetic fixture's measures are near-independent, so the
    // check exercises values near 0 — the regime where an arithmetic
    // slip would show as a sign flip or scale error)
    val li = Tables.lineitem(spark, sfDir)
    val src = Map("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    byPair.foreach { case ((a, b), got) =>
      val builtin = li.select(corr(col(src(a)), col(src(b)))).head().getDouble(0)
      assert(math.abs(got / 1e6 - builtin) < 2e-3,
        s"($a,$b): $got vs $builtin")
    }
  }

  test("benfordAudit: digits 1-9 covered, shares sum to ~1e6, expectations match closed form") {
    val rows = Quality.benfordAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet == (1L to 9L).toSet)
    val s = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(s - 1000000L) <= 5)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toDouble
      val expected = math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("benford_ppm") == expected)
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(r.getAs[Long]("share_ppm") - expected))
    }
    val maxDev = rows.map(_.getAs[Long]("dev_ppm")).max
    assert(rows.forall(_.getAs[Long]("max_dev_ppm") == maxDev))
  }

  test("keySkewProfile: exact hand-replay of the Gini over per-key counts") {
    val r = Quality.keySkewProfile(spark, sfDir).head()
    val counts = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("count"))
      .sortBy { case (uid, n) => (n, uid) }.map(_._2)
    val k = counts.length.toLong
    val tot = counts.sum
    val wrs = counts.zipWithIndex.map { case (n, i) => (i + 1) * n }.sum
    assert(r.getAs[Long]("n_keys") == k && r.getAs[Long]("total") == tot)
    assert(r.getAs[Long]("weighted_rank_sum") == wrs)
    val gini = math.floor((wrs * 2.0 / (k.toDouble * tot) - (k + 1.0) / k) * 1e6 + 0.5).toLong
    assert(r.getAs[Long]("gini_e6") == gini)
    assert(gini >= 0 && gini < 1000000L, "Gini must sit in [0, 1)")
    val top10 = counts.takeRight(10).sum
    assert(r.getAs[Long]("top10_share_ppm") ==
      math.floor(top10.toDouble / tot * 1e6 + 0.5).toLong)
  }

  test("cmsHeavyHitters: sketch honors the (eps, delta) bound on every probed heavy hitter") {
    val rows = Quality.cmsHeavyHitters(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Boolean]("cms_within_bound"), r.toString))
    // probes are the true top-10: exact counts dominate the rest of the table
    val counts = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(_.getAs[Long]("count")).sorted(Ordering[Long].reverse)
    val floor10 = counts.take(10).min
    assert(rows.forall(_.getAs[Long]("exact_n") >= floor10))
  }

  test("labelPropagation: planted components collapse to their min label; isolated vertex keeps its own") {
    import spark.implicits._
    val nodes = (1L to 7L).toDF("id")
    // two triangles {1,2,3} and {4,5,6}; 7 isolated; a 2-hop path 4-5-6
    // checks multi-round flooding (give the second component NO direct
    // edge 4-6 so label 4 needs 2 rounds to reach 6)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val after1 = Graph.labelPropagation(nodes, edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1(6L) == 5L, "label 4 cannot reach 6 in one round")
    val after2 = Graph.labelPropagation(nodes, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(after2(_) == 1L))
    assert(Seq(4L, 5L, 6L).forall(after2(_) == 4L))
    assert(after2(7L) == 7L, "isolated vertex keeps its own label")
  }

  test("linkDegreeHistogram: covers all docs, handshake bound holds, shares normalize") {
    val rows = Graph.linkDegreeHistogram(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nDocs,
      "every node has >= 1 undirected edge on the affine graph")
    // each node emits <= 3 out + receives arbitrary in, but total degree
    // mass = 2 * |und| and per-node out-degree <= 3 bounds nothing above
    // max_degree, which must be consistent
    val maxDeg = rows.map(_.getAs[Long]("degree")).max
    assert(rows.forall(_.getAs[Long]("max_degree") == maxDeg))
    val s = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(s - 1000000L) <= rows.length / 2 + 1)
    assert(rows.forall(_.getAs[Long]("degree") >= 1))
  }

  test("linkLabelPropagation: members sum to all docs, labels are community minima") {
    val rows = Graph.linkLabelPropagation(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nDocs)
    val nComm = rows.length.toLong
    assert(rows.forall(_.getAs[Long]("n_communities") == nComm))
    assert(nComm < nDocs, "3 rounds must merge something on the affine graph")
  }

  test("ksDrift: ECDFs are monotone, terminate at exactly 1e6 ppm, and ks is the max gap") {
    val rows = Quality.ksDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val last = rows.last
    assert(last.getAs[Long]("ecdf_base_ppm") == 1000000L)
    assert(last.getAs[Long]("ecdf_curr_ppm") == 1000000L)
    def monotone(c: String) = rows.map(_.getAs[Long](c)).toSeq
      .sliding(2).forall(p => p.head <= p.last)
    assert(monotone("ecdf_base_ppm") && monotone("ecdf_curr_ppm"))
    val ks = last.getAs[Long]("ks_ppm")
    assert(rows.map(_.getAs[Long]("gap_ppm")).max == ks)
    assert(rows.forall(_.getAs[Long]("ks_ppm") == ks), "ks replicated on every row")
  }

  test("entropyDrift: shares sum to ~1e6, KL >= 0 within rounding, entropy bounded by ln(k)") {
    val rows = Quality.entropyDrift(spark, sfDir).collect()
    val k = rows.length
    assert(k >= 2)
    def shareSum(c: String) = rows.map(_.getAs[Long](c)).sum
    // each share rounds within 0.5 ppm of truth → total within k/2 + 1
    assert(math.abs(shareSum("p_base_ppm") - 1000000L) <= k / 2 + 1)
    assert(math.abs(shareSum("p_curr_ppm") - 1000000L) <= k / 2 + 1)
    // Gibbs: true KL >= 0; integer rounding can dent each term by <= 1e-9
    assert(rows.head.getAs[Long]("kl_e9") >= -k)
    val maxEnt = (math.log(k) * 1e9).toLong + k // ln(k) is the entropy cap
    assert(rows.head.getAs[Long]("h_base_e9") <= maxEnt)
    assert(rows.head.getAs[Long]("h_curr_e9") <= maxEnt)
    assert(rows.head.getAs[Long]("h_base_e9") > 0)
  }

  test("referentialIntegrity: child counts match the tables; fixture FKs are clean") {
    val rows = Quality.referentialIntegrity(spark, sfDir).collect()
    assert(rows.length == 4)
    val byRel = rows.map(r => r.getAs[String]("relationship") -> r).toMap
    assert(byRel("customer.c_nationkey->nation").getAs[Long]("n_child")
      == Tables.customer(spark, sfDir).count())
    assert(byRel("lineitem.l_orderkey->orders").getAs[Long]("n_child")
      == Tables.lineitem(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L, r.toString)
      assert(r.getAs[Long]("orphan_ppm") == 0L && r.getAs[Boolean]("fk_ok"))
    }
  }

  test("fdAudit: verdicts match a driver-side replay of each candidate") {
    val rows = Quality.fdAudit(spark, sfDir).collect()
    assert(rows.length == 5)
    def replay(df: org.apache.spark.sql.DataFrame, x: String, y: String) = {
      val pairs = df.select(col(x).cast("string"), col(y).cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      val grouped = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      (grouped.size.toLong, grouped.count(_._2 > 1).toLong)
    }
    val expect = Map(
      "customer.c_custkey->c_nationkey" ->
        replay(Tables.customer(spark, sfDir), "c_custkey", "c_nationkey"),
      "nation.n_nationkey->n_regionkey" ->
        replay(Tables.nation(spark, sfDir), "n_nationkey", "n_regionkey"),
      "lineitem.l_orderkey->l_returnflag" ->
        replay(Tables.lineitem(spark, sfDir), "l_orderkey", "l_returnflag"),
      "lineitem.l_partkey->l_suppkey" ->
        replay(Tables.lineitem(spark, sfDir), "l_partkey", "l_suppkey"),
      "orders.o_custkey->o_orderpriority" ->
        replay(Tables.orders(spark, sfDir), "o_custkey", "o_orderpriority"))
    rows.foreach { r =>
      val (g, v) = expect(r.getAs[String]("candidate"))
      assert(r.getAs[Long]("n_groups") == g, r.toString)
      assert(r.getAs[Long]("n_violating") == v, r.toString)
      assert(r.getAs[Boolean]("fd_holds") == (v == 0L))
    }
    // the candidate set must demonstrate both verdicts
    assert(rows.exists(_.getAs[Boolean]("fd_holds")))
    assert(rows.exists(!_.getAs[Boolean]("fd_holds")))
  }

  test("robustCenter: matches a driver-side sort-based median/mode/MAD replay") {
    val rows = Quality.robustCenter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val qs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def medianOf(v: Seq[Long]): Double = {
      val s = v.sorted
      (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
    }
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val vals = qs.filter(_._1 == flag).map(_._2).toSeq
      assert(r.getAs[Long]("n") == vals.length)
      val med = medianOf(vals)
      assert(r.getAs[Double]("median_qty") == med, s"$flag median")
      // mode: max count, ties to smallest value
      val (modeQ, modeN) = vals.groupBy(identity).view.mapValues(_.length)
        .toSeq.minBy { case (q, c) => (-c, q) }
      assert(r.getAs[Long]("mode_qty") == modeQ, s"$flag mode")
      assert(r.getAs[Long]("mode_n") == modeN.toLong, s"$flag mode count")
      // MAD via the same integer scaling: d2 = |2q - 2*median|
      val d2 = vals.map(q => math.abs(2 * q - math.round(2 * med)))
      val s = d2.sorted
      val madQ4 = s((s.length - 1) / 2) + s(s.length / 2)
      assert(r.getAs[Long]("mad_q4") == madQ4, s"$flag mad")
    }
  }

  test("mannWhitney: matches a driver-side average-rank replay") {
    val r = Quality.mannWhitney(spark, sfDir).head()
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long"), col("l_linestatus"))
      .collect().map(x => (x.getLong(0), x.getString(1) == "O"))
    // classic form: sort all values, assign average ranks, sum group-1 ranks
    val sorted = rows.map(_._1).sorted
    val firstRank = sorted.zipWithIndex.groupBy(_._1)
      .view.mapValues(_.map(_._2).min + 1).toMap
    val cntByV = sorted.groupBy(identity).view.mapValues(_.length).toMap
    def avgRankX2(v: Long): Long = 2L * firstRank(v) + cntByV(v) - 1L
    val n1 = rows.count(_._2).toLong
    val n2 = rows.length - n1
    val rankSum1X2 = rows.filter(_._2).map(x => avgRankX2(x._1)).sum
    val tieTerm = cntByV.values.map(c => c.toLong * c * c - c).sum
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("rank_sum1_x2") == rankSum1X2)
    assert(r.getAs[Long]("tie_term") == tieTerm)
    val u1x2 = rankSum1X2 - n1 * (n1 + 1)
    assert(r.getAs[Long]("u1_x2") == u1x2)
    // U1 + U2 = n1*n2 (the rank-sum identity)
    assert(r.getAs[Long]("u1_x2") + r.getAs[Long]("u2_x2") == 2L * n1 * n2)
    assert(r.getAs[Boolean]("u1_gt_mean") == (u1x2 > n1 * n2))
  }

  test("kendallTau: matches a driver-side all-pairs replay") {
    val r = Quality.kendallTau(spark, sfDir).head()
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long"),
        floor(col("l_discount") * 100 + 0.5).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      if (x1 == x2) tx += 1
      else if (y1 == y2) () // y-tie only (x differs): counted below
      else if ((x1 < x2) == (y1 < y2)) c += 1
      else d += 1
      if (y1 == y2) ty += 1
    }
    // tx above counts ALL same-x pairs (incl. same-y); ties_y likewise
    val n = pts.length.toLong
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("c_pairs") == c, s"c: ${r.getAs[Long]("c_pairs")} vs $c")
    assert(r.getAs[Long]("d_pairs") == d)
    assert(r.getAs[Long]("ties_x_pairs") == tx)
    assert(r.getAs[Long]("ties_y_pairs") == ty)
    val n0 = n * (n - 1) / 2
    val tau = (c - d).toDouble / (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
    assert(r.getAs[Long]("tau_b_e6") == math.floor(tau * 1e6 + 0.5).toLong)
    assert(math.abs(r.getAs[Long]("tau_b_e6")) <= 1000000L)
  }

  test("personalized PageRank: mass conserved, seeds floored, rank localizes to the 3-hop seed reach (q5l)") {
    val rows = operators.Graph.linkPersonalizedPageRank(spark, sfDir).collect()
    val n = rows.length.toLong
    val seeds = rows.filter(_.getAs[Boolean]("is_seed")).map(_.getAs[Long]("doc_id"))
    assert(seeds.nonEmpty)
    // every node has out-edges, so teleport + damped flow conserve total mass
    val total = rows.map(_.getAs[Double]("ppr")).sum
    assert(math.abs(total - 1.0) < 1e-5, s"mass leaked: $total")
    // a seed's teleport term alone guarantees (1-d)/|S|
    val floor = (1.0 - 0.85) / seeds.length - 1e-9
    rows.filter(_.getAs[Boolean]("is_seed"))
      .foreach(r => assert(r.getAs[Double]("ppr") >= floor, r.toString))
    // exact 3-hop reach of the seed set under the arithmetic edge rule:
    // rank MUST be 0 outside it, > 0 on seeds (integer graph, no FP)
    def out(v: Long) = Seq((v * 31 + 7) % n, (v * 17 + 3) % n, (v * 13 + 11) % n)
    var reach = seeds.toSet
    for (_ <- 1 to 3) reach = reach ++ reach.flatMap(out)
    rows.foreach { r =>
      val (id, ppr) = (r.getAs[Long]("doc_id"), r.getAs[Double]("ppr"))
      if (!reach.contains(id)) assert(ppr == 0.0, s"rank off the seed reach: $r")
    }
    assert(rows.exists(r => r.getAs[Double]("ppr") == 0.0) ==
      (reach.size < n), "locality shape disagrees with the reach set")
  }

  test("modularity: full integer replay — LPA labels, per-community terms, Q (q5m)") {
    val rows = operators.Graph.linkModularity(spark, sfDir).collect()
    val n = graft.Tables.documents(spark, sfDir).count()
    val ids = (0L until n)
    val rawEdges = ids.flatMap(v =>
      Seq((v, (v * 31 + 7) % n), (v, (v * 17 + 3) % n), (v, (v * 13 + 11) % n)))
    val und = (rawEdges ++ rawEdges.map(_.swap)).distinct
    // 3 synchronous min-label rounds over the symmetrized graph (self-loops kept)
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = ids.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      val next = ids.map { v =>
        val nb = nbrs.getOrElse(v, Seq.empty).map(lab)
        v -> (if (nb.isEmpty) lab(v) else math.min(lab(v), nb.min))
      }.toMap
      lab = next
    }
    // modularity over the self-loop-free edge set
    val und2 = und.filter { case (a, b) => a != b }
    val degree = und2.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val comms = ids.groupBy(lab)
    val m2 = degree.values.sum
    val per = comms.map { case (c, vs) =>
      val dSum = vs.map(v => degree.getOrElse(v, 0L)).sum
      val intra = und2.count { case (a, b) => lab(a) == c && lab(b) == c }.toLong
      c -> (vs.length.toLong, intra, dSum)
    }
    val si = per.values.map(_._2).sum
    val sd2 = per.values.map(t => t._3 * t._3).sum
    val qE6 = math.floor((m2 * si - sd2).toDouble * 1e6 / (m2.toDouble * m2) + 0.5).toLong
    assert(rows.length == per.size)
    rows.foreach { r =>
      val (nm, intra, dSum) = per(r.getAs[Long]("community"))
      assert(r.getAs[Long]("n_members") == nm)
      assert(r.getAs[Long]("intra_pairs") == intra, r.toString)
      assert(r.getAs[Long]("degree_sum") == dSum)
      assert(r.getAs[Long]("m2") == m2)
      assert(r.getAs[Long]("q_e6") == qE6)
    }
    // communities found on this graph must actually explain structure
    assert(qE6 > 0L, "modularity not positive — LPA partition carries no signal")
  }

  test("corpusDatasheet: totals match direct recounts, dup share identity, " +
      "span non-negative") {
    val r = Quality.corpusDatasheet(spark, sfDir).head()
    val docs = Tables.documents(spark, sfDir)
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("n_unique_texts") <= r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_unique_texts")
      == docs.select("text").distinct().count())
    assert(r.getAs[Long]("exact_dup_ppm") ==
      (r.getAs[Long]("n_docs") - r.getAs[Long]("n_unique_texts")) * 1000000L /
        r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("total_chars") ==
      docs.agg(sum("n_chars")).head().getLong(0))
    assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars"))
    assert(r.getAs[Long]("chars_per_token_e3") ==
      r.getAs[Long]("total_chars") * 1000L / r.getAs[Long]("total_tokens"))
    assert(r.getAs[Long]("embedding_dim") == 64L)
    assert(r.getAs[Long]("event_span_days") >= 0L)
    assert(r.getAs[Long]("n_events") == Tables.events(spark, sfDir).count())
  }

  test("wassersteinDrift: ECDFs monotone to 1e6, W1 is the exact |flow| sum, " +
      "and dominates both the net shift and the KS-style max gap") {
    val rows = Quality.wassersteinDrift(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("qty"))
    assert(rows.length == 50)
    val eb = rows.map(_.getAs[Long]("ecdf_base_ppm"))
    val ec = rows.map(_.getAs[Long]("ecdf_curr_ppm"))
    assert(eb.zip(eb.tail).forall { case (a, b) => a <= b } && eb.last == 1000000L)
    assert(ec.zip(ec.tail).forall { case (a, b) => a <= b } && ec.last == 1000000L)
    val flows = rows.map(_.getAs[Long]("flow_ppm"))
    val w1 = rows.head.getAs[Long]("w1_ppm_qty")
    assert(w1 == flows.map(math.abs).sum, "W1 must equal the exact |flow| sum")
    val net = rows.head.getAs[Long]("net_shift_ppm_qty")
    assert(net == flows.sum)
    assert(math.abs(net) <= w1 && flows.map(math.abs).max <= w1)
    assert(rows.forall(r => r.getAs[Long]("w1_ppm_qty") == w1),
      "totals must replicate identically onto every row")
  }

  test("kAnonymityAudit: lattice monotonicity, conservation, k-anonymity " +
      "matches a direct per-level recount") {
    val rows = Quality.kAnonymityAudit(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("level"))
    assert(rows.map(_.getAs[Int]("level")).toSeq == Seq(0, 1, 2))
    val nCust = Tables.customer(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_at_risk") <= nCust)
      assert(r.getAs[Long]("risk_ppm") >= 0 && r.getAs[Long]("risk_ppm") <= 1000000)
      assert(r.getAs[Long]("l_diversity") >= 1)
    }
    // generalizing (coarser QI) can only merge classes: k non-decreasing,
    // class count non-increasing, risk non-increasing up the lattice
    val ks = rows.map(_.getAs[Long]("k_anonymity"))
    assert(ks(0) <= ks(1) && ks(1) <= ks(2), s"k not monotone: ${ks.toSeq}")
    val ncl = rows.map(_.getAs[Long]("n_classes"))
    assert(ncl(0) >= ncl(1) && ncl(1) >= ncl(2))
    val risk = rows.map(_.getAs[Long]("rows_at_risk"))
    assert(risk(0) >= risk(1) && risk(1) >= risk(2))
    // level-1 k-anonymity recomputed directly from the base relation
    val direct = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(countDistinct("c_custkey").as("n"))
      .agg(min("n")).head().getLong(0)
    assert(rows(1).getAs[Long]("k_anonymity") == direct,
      "level-1 k must equal the direct two-column recount")
  }

  test("q9e class balance: exact replay of entropy/eff-classes from counts; " +
      "near-uniform fixture grades balanced") {
    val rows = Quality.classBalance(spark, sfDir).collect()
    val counts = Tables.embeddings(spark, sfDir)
      .groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    assert(rows.map(_.getAs[Long]("n")).sum == counts.values.sum)
    assert(rows.length == counts.size)
    val k = counts.size
    val n = counts.values.sum
    // replay the fixed-point entropy chain exactly as the operator
    // quantizes it: per-class e9 floor, integer sum, one exp
    val hE9 = counts.values.map { c =>
      val p = c.toDouble / n
      math.floor(-p * math.log(p) * 1e9 + 0.5).toLong
    }.sum
    val eff = math.floor(math.exp(hE9.toDouble / 1e9) * 1e3 + 0.5).toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("eff_classes_e3") == eff, "entropy replay diverged")
      assert(r.getAs[Long]("n_classes") == k)
      assert(r.getAs[Long]("n") == counts(r.getAs[Int]("label")))
    }
    // the fixture labels are near-uniform: the audit must say so
    assert(rows.forall(_.getAs[Boolean]("balanced_ok")))
    assert(rows.head.getAs[Long]("imbalance_e3") < 2000L)
    assert(eff > k * 1000L * 95 / 100)
  }

  test("q9i labeler agreement: ALL row is the cell-wise sum of strata; " +
      "kappa replays from the confusion cells") {
    val rows = Quality.labelerAgreement(spark, sfDir).collect()
    val all = rows.find(_.getAs[String]("lang") == "ALL").get
    val strata = rows.filter(_.getAs[String]("lang") != "ALL")
    for (cname <- Seq("n", "n11", "n10", "n01", "n00")) {
      assert(all.getAs[Long](cname) == strata.map(_.getAs[Long](cname)).sum,
        s"ALL.$cname must be the stratum sum")
    }
    assert(all.getAs[Long]("n") == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val Seq(n, n11, n10, n01, n00) = Seq("n", "n11", "n10", "n01", "n00")
        .map(r.getAs[Long](_))
      assert(n == n11 + n10 + n01 + n00, "cells must partition the stratum")
      val po = (n11 + n00).toDouble / n
      val pe = ((n11 + n10).toDouble * (n11 + n01)
        + (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
      assert(r.getAs[Long]("po_ppm") == math.floor(po * 1e6 + 0.5).toLong)
      assert(r.getAs[Long]("kappa_e6") ==
        math.floor((po - pe) / (1.0 - pe) * 1e6 + 0.5).toLong,
        s"kappa replay diverged for ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("kappa_e6") >= -1000000L
        && r.getAs[Long]("kappa_e6") <= 1000000L)
    }
  }

  test("q9k constraint suite: verdicts are pure functions of observed vs " +
      "bounds; the planted failing constraint fails and only it") {
    val rows = Quality.constraintSuite(spark, sfDir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass") ==
        (r.getAs[Long]("observed") >= r.getAs[Long]("bound_lo")
          && r.getAs[Long]("observed") <= r.getAs[Long]("bound_hi")))
    }
    val failed = rows.filter(!_.getAs[Boolean]("pass"))
      .map(_.getAs[String]("constraint_name")).toSeq
    assert(failed == Seq("min_chars_100"),
      s"exactly the calibrated constraint must fail, got $failed")
    // two constraints recomputed directly
    val docs = Tables.documents(spark, sfDir)
    val byName = rows.map(r => r.getAs[String]("constraint_name") -> r).toMap
    assert(byName("min_chars_100").getAs[Long]("observed") ==
      docs.agg(min(col("n_chars"))).head().getLong(0))
    val n = docs.count()
    val distinct = docs.select(countDistinct(col("doc_id"))).head().getLong(0)
    assert(byName("uniqueness_doc_id").getAs[Long]("observed") ==
      distinct * 1000000L / n)
  }

  test("q9o modal alignment: fixture tables align perfectly and the " +
      "verdicts say so") {
    val r = Quality.modalAlignment(spark, sfDir).head()
    val nDocs = Tables.documents(spark, sfDir).count()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(r.getAs[Long]("n_docs") == nDocs)
    assert(r.getAs[Long]("n_vecs") == nVecs)
    assert(r.getAs[Long]("n_matched")
      == r.getAs[Long]("n_docs") - r.getAs[Long]("n_text_only"))
    assert(r.getAs[Long]("n_matched")
      == r.getAs[Long]("n_vecs") - r.getAs[Long]("n_vec_only"))
    assert(r.getAs[Boolean]("aligned_ok") ==
      (r.getAs[Long]("n_text_only") == 0L && r.getAs[Long]("n_vec_only") == 0L))
    assert(r.getAs[Boolean]("dim_consistent"))
    assert(r.getAs[Int]("dim_min") == r.getAs[Int]("dim_max"))
  }

  private def replayScores(): Array[(Long, String, Long)] =
    Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text", "n_chars").collect().map { r =>
        val toks = r.getString(2).split(" ", -1)
        val n = toks.length.toDouble
        val diversity = toks.distinct.length.toDouble / n
        val stop = toks.count(Set("the", "a", "of", "and", "to", "in")).toDouble / n
        val lengthOk = if (r.getLong(3) >= 100) 1.0 else r.getLong(3) / 100.0
        val score = math.floor((lengthOk * 0.4 + diversity * 0.4
          + math.min(stop * 5.0, 1.0) * 0.2) * 1e4 + 0.5).toLong
        (r.getLong(0), r.getString(1), score)
      }

  test("q9u quantile normalization: per-source aggregates replay from a " +
      "driver-side global-rank mapping; normalization preserves order") {
    val rows = Quality.quantileNormalize(spark, sfDir).collect()
    val docs = replayScores()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    // global distribution sorted ascending; rank g (1-based) -> score
    val globalSorted = docs.map(_._3).sorted
    val n = globalSorted.length.toLong
    val bySource = docs.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val in = bySource(src).sortBy(d => (d._3, d._1))
      val ns = in.length.toLong
      val normed = in.zipWithIndex.map { case (_, i) =>
        val g = 1L + i.toLong * (n - 1) / math.max(ns - 1, 1L)
        globalSorted((g - 1).toInt)
      }
      assert(r.getAs[Long]("n_docs") == ns, s"$src count")
      assert(r.getAs[Long]("mean_raw_e4") == in.map(_._3).sum / ns)
      assert(r.getAs[Long]("mean_norm_e4") == normed.sum / ns, s"$src mean")
      assert(r.getAs[Long]("min_norm_e4") == normed.min)
      assert(r.getAs[Long]("max_norm_e4") == normed.max)
      assert(r.getAs[Boolean]("monotone_ok"),
        s"$src normalization must never reorder a source's docs")
      assert(r.getAs[Long]("shift_e4") ==
        normed.sum / ns - in.map(_._3).sum / ns)
    }
  }

  private def replayScoreLabel(): Array[(Long, String, String, Long, Long, Long)] =
    Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text", "n_chars").collect().map { r =>
        val toks = r.getString(3).split(" ", -1)
        val n = toks.length.toDouble
        val diversity = toks.distinct.length.toDouble / n
        val stop = toks.count(Set("the", "a", "of", "and", "to", "in")).toDouble / n
        val lengthOk = if (r.getLong(4) >= 100) 1.0 else r.getLong(4) / 100.0
        val score = math.floor((lengthOk * 0.4 + diversity * 0.4
          + math.min(stop * 5.0, 1.0) * 0.2) * 1e4 + 0.5).toLong
        val mx = toks.groupBy(identity).values.map(_.length).max.toLong
        val y = if (mx * 10 < toks.length.toLong) 1L else 0L
        (r.getLong(0), r.getString(1), r.getString(2), score, y, r.getLong(4))
      }

  test("qa3 sliced eval: per-language confusion cells replay driver-side; " +
      "worst-group flag and gap are consistent") {
    val rows = Quality.slicedEval(spark, sfDir).collect()
    val docs = replayScoreLabel()
    assert(rows.map(_.getAs[Long]("n")).sum == docs.length.toLong)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val in = docs.filter(_._2 == lang)
      val tp = in.count(d => d._4 >= 5000 && d._5 == 1L).toLong
      val fp = in.count(d => d._4 >= 5000 && d._5 == 0L).toLong
      val fn = in.count(d => d._4 < 5000 && d._5 == 1L).toLong
      val tn = in.count(d => d._4 < 5000 && d._5 == 0L).toLong
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp
        && r.getAs[Long]("fn") == fn && r.getAs[Long]("tn") == tn,
        s"$lang cells")
      assert(r.getAs[Long]("acc_ppm") == (tp + tn) * 1000000L / in.length)
    }
    val accs = rows.map(_.getAs[Long]("acc_ppm"))
    assert(rows.head.getAs[Long]("worst_acc_ppm") == accs.min)
    assert(rows.head.getAs[Long]("gap_ppm") == accs.max - accs.min)
    assert(rows.count(_.getAs[Boolean]("is_worst")) == 1)
    val worst = rows.filter(_.getAs[Boolean]("is_worst")).head
    assert(worst.getAs[Long]("acc_ppm") == accs.min)
  }

  test("qa4 partial correlation: three Pearson r's and the partial replay " +
      "driver-side from exact moments") {
    val row = Quality.partialCorrelation(spark, sfDir).collect().head
    val docs = replayScoreLabel()
    val n = docs.length.toLong
    assert(row.getAs[Long]("n") == n)
    val xs = docs.map(_._4); val ys = docs.map(_._5); val zs = docs.map(_._6)
    def corr(a: Array[Long], b: Array[Long]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (u, v) => u * v }.sum
      val saa = a.map(u => u * u).sum; val sbb = b.map(u => u * u).sum
      (n * sab - sa * sb).toDouble /
        (math.sqrt((n * saa - sa * sa).toDouble)
          * math.sqrt((n * sbb - sb * sb).toDouble))
    }
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    def e6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    assert(row.getAs[Long]("r_xy_e6") == e6(rxy))
    assert(row.getAs[Long]("r_xz_e6") == e6(rxz))
    assert(row.getAs[Long]("r_yz_e6") == e6(ryz))
    val partial = (rxy - rxz * ryz) /
      (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
    assert(row.getAs[Long]("partial_e6") == e6(partial), "partial diverged")
    assert(row.getAs[Boolean]("attenuated") ==
      (math.abs(row.getAs[Long]("partial_e6"))
        < math.abs(row.getAs[Long]("r_xy_e6"))))
  }

  test("qa5 diff-in-diff: four cells and the estimate replay driver-side " +
      "from the Lehmer arm gate and the calendar cut") {
    val rows = Quality.diffInDiff(spark, sfDir).collect()
    assert(rows.length == 4)
    val m = 2147483647L
    val cutMicros = java.time.Instant.parse("2024-01-16T00:00:00Z")
      .toEpochMilli * 1000L
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "value").collect()
      .map { r =>
        val treat =
          (((r.getLong(0) % m) * 48271L % m) * 48271L % m).toDouble / m < 0.5
        val post = r.getLong(1) >= cutMicros
        (treat, post, math.floor(r.getDouble(2) * 100 + 0.5).toLong)
      }
    val cells = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(v => (v.length.toLong, v.map(_._3).sum)).toMap
    rows.foreach { r =>
      val key = (r.getAs[Boolean]("treated"), r.getAs[Boolean]("post"))
      val (cn, cs) = cells(key)
      assert(r.getAs[Long]("n") == cn, s"$key n")
      assert(r.getAs[Long]("sum_cents") == cs, s"$key sum")
      assert(r.getAs[Long]("mean_cents_e4") ==
        math.floor(cs.toDouble / cn * 1e4 + 0.5).toLong)
    }
    def mean(t: Boolean, p: Boolean) = {
      val (cn, cs) = cells((t, p)); cs.toDouble / cn
    }
    val did = (mean(true, true) - mean(true, false)) -
      (mean(false, true) - mean(false, false))
    assert(rows.head.getAs[Long]("did_cents_e4") ==
      math.floor(did * 1e4 + 0.5).toLong, "DiD replay diverged")
  }

  test("qag grouped ols: every group's slope/intercept/R2 replays from " +
      "driver-side exact moments; R2 is a valid ratio") {
    val rows = Quality.groupedOls(spark, sfDir).collect()
    val epoch = java.time.LocalDate.parse("1995-01-01")
    val o = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "CAST(o_orderdate AS DATE) AS d",
        "o_totalprice").collect()
      .map(r => (r.getString(0),
        java.time.temporal.ChronoUnit.DAYS.between(
          epoch, r.getDate(1).toLocalDate),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    assert(rows.length == o.map(_._1).distinct.length)
    rows.foreach { r =>
      val in = o.filter(_._1 == r.getAs[String]("grp"))
      val n = in.length.toLong
      val (sx, sy) = (in.map(_._2).sum, in.map(_._3).sum)
      val sxx = in.map(d => BigInt(d._2) * d._2).sum
      val sxy = in.map(d => BigInt(d._2) * d._3).sum
      val syy = in.map(d => BigInt(d._3) * d._3).sum
      val num = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
      val denx = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
      val deny = (BigInt(n) * syy - BigInt(sy) * sy).toDouble
      val b = num / denx
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("slope_e6") ==
        math.floor(b * 1e6 + 0.5).toLong, s"${r.getString(0)} slope")
      assert(r.getAs[Long]("intercept_cents_e2") ==
        math.floor((sy.toDouble - b * sx) / n * 100 + 0.5).toLong)
      val r2 = r.getAs[Long]("r2_ppm")
      assert(r2 == math.floor(num * num / (denx * deny) * 1e6 + 0.5).toLong)
      assert(r2 >= 0L && r2 <= 1000000L)
    }
  }

  test("qad permutation test: observed statistic and all 32 replicates " +
      "replay driver-side; add-one p-value identity holds") {
    val row = Quality.permutationTest(spark, sfDir).collect().head
    val m = 2147483647L
    def gate(id: Long): Boolean =
      ((((id % m) * 48271L % m) * 48271L % m)).toDouble / m < 0.5
    val o = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def tStat(arm: Long => Boolean): Double = {
      val (a1, a0) = o.partition(x => arm(x._1))
      a1.map(_._2).sum.toDouble / a1.length -
        a0.map(_._2).sum.toDouble / a0.length
    }
    val tObs = tStat(gate)
    assert(row.getAs[Long]("n") == o.length.toLong)
    assert(row.getAs[Long]("n1") == o.count(x => gate(x._1)).toLong)
    assert(row.getAs[Long]("t_obs_cents_e4") ==
      math.floor(tObs * 1e4 + 0.5).toLong)
    val nExtreme = (1 to 32).count { rep =>
      math.abs(tStat(ck => gate(ck * 37L + rep * 1000003L))) >= math.abs(tObs)
    }.toLong
    assert(row.getAs[Long]("n_extreme") == nExtreme,
      "replicate comparisons diverged")
    assert(row.getAs[Long]("p_ppm") == (nExtreme + 1) * 1000000L / 33L)
  }

  test("qaa hill tail index: estimator replays from the driver-side " +
      "order statistics; tie terms drop out exactly") {
    val row = Quality.hillTailIndex(spark, sfDir).collect().head
    val lens = Tables.documents(spark, sfDir)
      .select("n_chars").collect().map(_.getLong(0)).sorted.reverse
    val top = lens.take(101)
    val xk1 = top.min
    assert(row.getAs[Long]("x_k1") == xk1)
    val lnsum = top.filter(_ > xk1)
      .map(x => math.log(x.toDouble / xk1.toDouble)).sum
    assert(row.getAs[Long]("hill_e6") ==
      math.floor(lnsum / 100 * 1e6 + 0.5).toLong, "hill replay diverged")
    if (lnsum != 0.0)
      assert(row.getAs[Long]("alpha_e6") ==
        math.floor(100.0 / lnsum * 1e6 + 0.5).toLong)
    assert(row.getAs[Long]("hill_e6") >= 0L)
  }

  test("qab conformal interval: q-hat is the exact calibration order " +
      "statistic; realized test coverage replays driver-side") {
    val row = Quality.conformalInterval(spark, sfDir).collect().head
    val m = 2147483647L
    def u(id: Long) = ((((id % m) * 48271L % m) * 48271L % m)).toDouble / m
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    val train = docs.filter(d => u(d._1) < 0.5)
    val (sc, st) = (train.map(_._2).sum, train.map(_._3).sum)
    def resid(d: (Long, Long, Long)): Long =
      math.abs(d._2 - math.floor(d._3.toDouble * sc.toDouble / st.toDouble).toLong)
    val cal = docs.filter(d => u(d._1) >= 0.5 && u(d._1) < 0.75).map(resid).sorted
    val pos = math.ceil((cal.length + 1) * 0.9).toLong
    val qhat = cal((pos - 1).toInt)
    assert(row.getAs[Long]("n_cal") == cal.length.toLong)
    assert(row.getAs[Long]("q_hat") == qhat, "order statistic diverged")
    val test = docs.filter(d => u(d._1) >= 0.75).map(resid)
    assert(row.getAs[Long]("n_test") == test.length.toLong)
    val covered = test.count(_ <= qhat).toLong
    assert(row.getAs[Long]("n_covered") == covered)
    assert(row.getAs[Long]("coverage_ppm") == covered * 1000000L / test.length)
    // the conformal construction should land near the nominal level
    assert(row.getAs[Long]("coverage_ppm") > 800000L,
      "coverage collapsed far below the nominal 90%")
  }

  test("q9w source concentration: Gini/HHI/top-3 replay driver-side; " +
      "Lorenz curve is monotone and shares conserve") {
    val rows = Quality.sourceConcentration(spark, sfDir).collect()
    val masses = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.length == masses.size)
    val total = masses.values.sum
    val asc = masses.toSeq.sortBy { case (s, m) => (m, s) }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_tokens") == masses(src))
      assert(r.getAs[Long]("rank_asc") ==
        asc.indexWhere(_._1 == src).toLong + 1)
      assert(r.getAs[Long]("share_ppm") == masses(src) * 1000000L / total)
    }
    val cum = rows.sortBy(_.getAs[Long]("rank_asc"))
      .map(_.getAs[Long]("cum_share_ppm"))
    assert(cum.toSeq == cum.sorted.toSeq, "Lorenz curve must be monotone")
    val nS = masses.size.toLong
    val a = asc.zipWithIndex.map { case ((_, m), i) => (i + 1) * m }.sum
    val gini = math.floor(
      (2L * a - (nS + 1) * total).toDouble * 1e6 / (nS * total).toDouble).toLong
    assert(rows.head.getAs[Long]("gini_ppm") == gini, "Gini replay diverged")
    val shares = asc.map { case (_, m) => m * 1000000L / total }
    val hhi = math.floor(shares.map(s => s * s).sum / 1e6).toLong
    assert(rows.head.getAs[Long]("hhi_e6") == hhi, "HHI replay diverged")
    assert(rows.head.getAs[Long]("top3_ppm") == shares.takeRight(3).sum)
    assert(rows.head.getAs[Long]("gini_ppm") >= 0L
      && rows.head.getAs[Long]("gini_ppm") < 1000000L)
  }

  test("qau DP release: Laplace mechanism replays driver-side; all-cell " +
      "error is monotone in eps off the shared per-cell uniform") {
    // tau = 1 at sf0.001 (cells are size ~1, the registered tau = 10
    // would suppress everything and leave nothing to check)
    val rows = Quality.dpRelease(spark, sfDir, tau = 1).collect()
      .map(r => r.getAs[Long]("eps_e6") -> r).toMap
    assert(rows.keySet == Set(500000L, 1000000L, 2000000L))
    // driver replay: same cells, same Lehmer uniform, same inverse CDF
    val segIdx = Map("AUTOMOBILE" -> 0, "BUILDING" -> 1, "FURNITURE" -> 2,
      "HOUSEHOLD" -> 3, "MACHINERY" -> 4)
    val cells = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment", "c_nationkey").count().collect()
      .map { r =>
        val gid = r.getAs[Int]("c_nationkey").toLong * 8 +
          segIdx.getOrElse(r.getAs[String]("c_mktsegment"), 5) + 1
        val m = 2147483647L
        val u = (gid % m * 48271 % m * 48271 % m).toDouble / m
        (r.getAs[Long]("count"), u)
      }
    def replay(eps: Double): Array[(Long, Long)] = cells.map { case (n, u) =>
      val lap = -(1.0 / eps) * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      (n, math.floor(n + lap + 0.5).toLong)
    }
    for ((epsE6, eps) <- Seq(500000L -> 0.5, 1000000L -> 1.0,
        2000000L -> 2.0)) {
      val rel = replay(eps)
      val kept = rel.filter(_._2 >= 1)
      val r = rows(epsE6)
      assert(r.getAs[Long]("n_cells") == cells.length.toLong)
      assert(r.getAs[Long]("n_released") == kept.length.toLong)
      assert(r.getAs[Long]("n_suppressed") ==
        (cells.length - kept.length).toLong)
      assert(r.getAs[Long]("l1_err") ==
        kept.map { case (n, v) => math.abs(v - n) }.sum)
      if (kept.nonEmpty)
        assert(r.getAs[Long]("max_err") ==
          kept.map { case (n, v) => math.abs(v - n) }.max)
    }
    // coupled noise ⇒ per-cell |rounded noise| is non-increasing in eps,
    // so the ALL-cell error (kept-set churn excluded) must be monotone —
    // and strictly so somewhere, else the mechanism never perturbed
    val allErr = Seq(0.5, 1.0, 2.0).map(e =>
      replay(e).map { case (n, v) => math.abs(v - n) }.sum)
    assert(allErr(0) >= allErr(1) && allErr(1) >= allErr(2),
      s"utility must improve with eps: $allErr")
    assert(allErr(0) > allErr(2), "noise collapsed to a constant")
    assert(allErr(2) > 0L, "noise collapsed to zero everywhere")
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def editJoinBrute(names: Seq[(String, Long)], d: Int)
      : Map[Int, (Long, Long)] =
    (for {
      (a, ca) <- names; (b, cb) <- names if a < b
      if math.abs(a.length - b.length) <= d
      ed = lev(a, b) if ed <= d
    } yield (ed, ca * cb))
      .groupBy(_._1).view
      .mapValues(ps => (ps.length.toLong, ps.map(_._2).sum)).toMap

  test("qav prefix edit join: complete vs brute force on a planted set " +
      "spanning the tiny branch, and on the sf0.001 part names") {
    import spark.implicits._
    // planted: short names (tiny branch), mixed-length pairs, dups
    val planted = Seq(("cat", 1L), ("cot", 2L), ("ca", 1L), ("c", 3L),
      ("house", 1L), ("hose", 2L), ("mouse", 1L), ("horse", 1L),
      ("warehouse", 1L), ("warehouze", 1L), ("wareh0use", 2L),
      ("ab", 1L), ("ba", 1L), ("abcdef", 1L), ("abcdeg", 1L))
    val out = Entity.prefixEditJoin(
        planted.toDF("name", "cnt"), q = 2, d = 2)
      .collect()
      .map(r => r.getAs[Int]("ed") ->
        (r.getAs[Long]("n_name_pairs"), r.getAs[Long]("n_row_pairs"))).toMap
    val expect = editJoinBrute(planted, 2)
    assert(out == expect,
      s"planted mismatch: got $out expected $expect")
    assert(expect.values.map(_._1).sum >= 8L,
      "planted set must generate a meaningful pair count")
    // real fixture: the registered query's input replayed brute-force
    val names = Tables.part(spark, sfDir).groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getAs[Long]("count")).toSeq
    val real = Entity.partEditJoin(spark, sfDir).collect()
      .map(r => r.getAs[Int]("ed") ->
        (r.getAs[Long]("n_name_pairs"), r.getAs[Long]("n_row_pairs"))).toMap
    assert(real == editJoinBrute(names, 2), "sf0.001 part replay diverged")
  }

  test("qaw pseudonymize: token map is injective, referential integrity " +
      "survives the rewrite, and the Lehmer map permutes a planted range") {
    val rows = Quality.pseudonymizeAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tok") == r.getAs[Long]("n_cust"),
        s"token collision in segment ${r.getAs[String]("seg")}")
      assert(r.getAs[Long]("n_orders_tok") == r.getAs[Long]("n_orders_raw"),
        "order count changed through the token join")
      assert(r.getAs[Long]("okey_sum_tok") == r.getAs[Long]("okey_sum_raw"),
        "orderkey checksum changed through the token join")
      assert(r.getAs[Long]("tok_min") >= 0L &&
        r.getAs[Long]("tok_max") < 2147483647L, "token left the field")
    }
    // permutation property on a planted dense range: 50k consecutive ids
    // must map to 50k distinct tokens (injectivity of id*48271^2 mod p)
    val m = 2147483647L
    val distinctToks = spark.range(1, 50001)
      .selectExpr(s"pmod(id, $m) * 48271 % $m * 48271 % $m AS tok")
      .distinct().count()
    assert(distinctToks == 50000L, "Lehmer map is not injective on range")
  }

  test("rtbfCascade: closure counts replay exactly and no orphans survive") {
    val rows = Quality.rtbfCascade(spark, sfDir).collect()
      .map(r => r.getAs[String]("entity") -> r).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_before") ==
        r.getAs[Long]("n_removed") + r.getAs[Long]("n_after"),
        s"row conservation broken for ${r.getAs[String]("entity")}")
      assert(r.getAs[Long]("orphans_after") == 0L,
        s"cascade left orphans in ${r.getAs[String]("entity")}")
    }
    // independent closure replay: tombstones -> their orders -> items
    val tombs = graft.Tables.customer(spark, sfDir)
      .where(col("c_custkey") % 97 === 0).select("c_custkey")
    val tombOrders = graft.Tables.orders(spark, sfDir)
      .join(tombs, col("o_custkey") === col("c_custkey"), "left_semi")
    val tombItems = graft.Tables.lineitem(spark, sfDir)
      .join(tombOrders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(rows("customer").getAs[Long]("n_removed") == tombs.count())
    assert(rows("orders").getAs[Long]("n_removed") == tombOrders.count())
    assert(rows("lineitem").getAs[Long]("n_removed") == tombItems.count())
  }

  test("qbh SPRT monitor: window-cumsum walk equals an exact sequential replay, per arm") {
    import org.apache.spark.sql.functions._
    val bound = 2944439L
    val rows = operators.Quality.sprtMonitor(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.size == 5)
    // independent truth: the literal sequential procedure, one trial at
    // a time, in plain Scala (the distributed op must reduce to this)
    val trials = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), (col("value") > 10.0).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    trials.foreach { case (arm, xs) =>
      var llr = 0L; var dec = "continue"; var trial = 0L; var llrDec = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        llr += (if (x) 48790L else -223144L)
        if (dec == "continue" && math.abs(llr) >= bound) {
          dec = if (llr > 0) "accept_h1" else "accept_h0"
          trial = i + 1L; llrDec = llr
        }
      }
      val r = rows(arm)
      assert(r.getAs[Long]("n_trials") == xs.length.toLong)
      assert(r.getAs[Long]("n_success") == xs.count(identity).toLong)
      assert(r.getAs[String]("decision") == dec, arm)
      assert(r.getAs[Long]("decision_trial") == trial, arm)
      assert(r.getAs[Long]("llr_decision_e6") == llrDec, arm)
      assert(r.getAs[Long]("llr_final_e6") == llr, arm)
    }
    // continues must end inside the bounds (definition of "no crossing")
    rows.values.filter(_.getAs[String]("decision") == "continue").foreach {
      r => assert(math.abs(r.getAs[Long]("llr_final_e6")) < bound)
    }
  }

  test("qc2 QTE: engine quantiles equal sorted-array selection; monotone in q") {
    import org.apache.spark.sql.functions._
    val rows = operators.Quality.quantileTreatmentEffects(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("q"))
    assert(rows.map(_.getAs[Long]("q")).toSeq == Seq(10L, 25L, 50L, 75L, 90L))
    val byVar = Tables.events(spark, sfDir)
      .select((col("user_id") % 2).as("v"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("q")
      def sel(v: Long): Long = {
        val xs = byVar(v); xs(((q * xs.length + 99) / 100 - 1).toInt)
      }
      assert(r.getAs[Long]("control_cents") == sel(0L), s"q$q control")
      assert(r.getAs[Long]("treated_cents") == sel(1L), s"q$q treated")
      assert(r.getAs[Long]("qte_cents") ==
        r.getAs[Long]("treated_cents") - r.getAs[Long]("control_cents"))
    }
    // quantiles are monotone in q within each variant
    Seq("control_cents", "treated_cents").foreach { c =>
      rows.map(_.getAs[Long](c)).sliding(2).foreach {
        case Array(a, b) => assert(a <= b); case _ =>
      }
    }
  }

  test("qc0 EB shrinkage: every cell lands between raw and global; small cells shrink harder") {
    val rows = operators.Quality.ebShrinkage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val g = rows.head.getAs[Long]("global_e6")
    rows.foreach { r =>
      assert(r.getAs[Long]("global_e6") == g)
      assert(r.getAs[Boolean]("between_ok"))
      // exact replay of the cross-multiplied closed form
      val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("conv"))
      val (nt, ct) = {
        val nt = rows.map(_.getAs[Long]("n")).sum
        (nt, rows.map(_.getAs[Long]("conv")).sum)
      }
      assert(r.getAs[Long]("shrunk_e6") ==
        (BigInt(c) * nt + BigInt(100) * ct) * 1000000 /
          (BigInt(n + 100) * nt))
    }
    // pooling strength: the most-shrunk cells (relative movement toward
    // the prior) are smaller than the least-shrunk ones on average
    val moved = rows.map { r =>
      val raw = r.getAs[Long]("raw_e6"); val sh = r.getAs[Long]("shrunk_e6")
      (r.getAs[Long]("n"), math.abs(raw - sh).toDouble /
        math.max(1.0, math.abs(raw - g).toDouble))
    }.filter(m => m._2.isFinite)
    val bySize = moved.sortBy(_._1)
    val smallAvg = bySize.take(moved.length / 3).map(_._2).sum /
      math.max(1, moved.length / 3)
    val bigAvg = bySize.takeRight(moved.length / 3).map(_._2).sum /
      math.max(1, moved.length / 3)
    assert(smallAvg > bigAvg, s"small cells must shrink harder ($smallAvg vs $bigAvg)")
  }

  test("qbn Fellegi-Sunter: decision classes recover the planted corruption arithmetic") {
    import org.apache.spark.sql.functions._
    val rows = operators.Entity.fellegiSunter(spark, sfDir).collect()
      .map(r => r.getAs[String]("decision") -> r).toMap
    val cust = Tables.customer(spark, sfDir)
    val n = cust.count()
    // true pairs lost to blocking: segment (%7) or nation (%11) corrupted
    val blocked = cust.where(
      col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 0).count()
    val trueCands = rows.values.map(_.getAs[Long]("n_true")).sum
    assert(trueCands == n - blocked,
      s"blocking must lose exactly the planted %7/%11 rows ($trueCands vs ${n - blocked})")
    // match ⇔ name agrees (16e6 dominates either bal outcome ≥ 14e6):
    // name uncorrupted (!%3), among blocking survivors
    val matchTrue = cust.where(
      col("c_custkey") % 3 =!= 0 &&
        col("c_custkey") % 7 =!= 0 && col("c_custkey") % 11 =!= 0).count()
    assert(rows("match").getAs[Long]("n_true") == matchTrue)
    // review ⇔ name corrupted but bal intact (−1.585e6 + 6e6 ≥ 4e6)
    val reviewTrue = cust.where(
      col("c_custkey") % 3 === 0 && col("c_custkey") % 5 =!= 0 &&
        col("c_custkey") % 7 =!= 0 && col("c_custkey") % 11 =!= 0).count()
    assert(rows("review").getAs[Long]("n_true") == reviewTrue)
    // non-match true leakage = BOTH name and bal corrupted (%15)
    val bothCorr = cust.where(
      col("c_custkey") % 15 === 0 &&
        col("c_custkey") % 7 =!= 0 && col("c_custkey") % 11 =!= 0).count()
    assert(rows("non_match").getAs[Long]("n_true") == bothCorr)
    // names are unique, so a false pair can never name-agree: match pure
    assert(rows("match").getAs[Long]("purity_ppm") == 1000000L)
    // the false-pair mass lands in non_match (blocks pair unrelated
    // customers; none of them can reach the match threshold)
    assert(rows("non_match").getAs[Long]("n_pairs") >
      rows("match").getAs[Long]("n_pairs"))
  }

  test("qbk isotonic: minimax triangle equals the sequential PAV merge; fit is monotone") {
    val rows = operators.Quality.isotonicCalibration(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.length >= 10)
    // independent truth: the LITERAL pool-adjacent-violators loop over
    // the same (w, sy) bins, exact rationals via BigInt cross-products
    case class Blk(var w: Long, var sy: Long)
    val blocks = scala.collection.mutable.ArrayBuffer
      .empty[(Blk, Int)] // block, #bins pooled into it
    rows.foreach { r =>
      blocks += ((Blk(r.getAs[Long]("w"), r.getAs[Long]("sy")), 1))
      // merge while the last block's mean < the previous block's mean
      while (blocks.length >= 2 && {
        val a = blocks(blocks.length - 2)._1; val b = blocks.last._1
        BigInt(b.sy) * a.w < BigInt(a.sy) * b.w
      }) {
        val (b, nb) = blocks.remove(blocks.length - 1)
        val (a, na) = blocks.remove(blocks.length - 1)
        blocks += ((Blk(a.w + b.w, a.sy + b.sy), na + nb))
      }
    }
    val pavFit = blocks.flatMap { case (b, n) =>
      Seq.fill(n)(BigInt(b.sy) * 1000000 / b.w) } // floor, non-negative
    rows.zip(pavFit).foreach { case (r, f) =>
      assert(BigInt(r.getAs[Long]("fitted_e6")) == f, s"bin ${r.getAs[Long]("bin")}")
      assert(r.getAs[Boolean]("pooled") ==
        (r.getAs[Long]("fitted_e6") != r.getAs[Long]("raw_e6")))
    }
    // isotonic by construction
    rows.map(_.getAs[Long]("fitted_e6")).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ =>
    }
  }
}
