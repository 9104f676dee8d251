package graft

import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Warehouse layout evidence: partitioned writes prune at the scan
  * (PartitionFilters), JSONL round-trips documents losslessly with an
  * explicit schema, CSV reads with explicit schema. */
class SourcesSpec extends SparkSpec {

  test("dynamicPartitionOverwrite replaces only the written partition; static mode truncates") {
    import org.apache.spark.sql.functions._
    val rows = sources.Warehouse.dynamicPartitionOverwrite(spark, sfDir,
      tmpDir("dyn_ovr")).collect()
    assert(rows.length == 5, "all five priority partitions must survive")
    assert(rows.count(_.getAs[Boolean]("restated")) == 1)
    // negative control: the DEFAULT static mode truncates the whole table
    val path = tmpDir("static_ovr")
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)
    o.where(col("o_orderpriority") === "1-URGENT")
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)
    val left = spark.read.parquet(path)
      .select("o_orderpriority").distinct().collect().map(_.getString(0))
    assert(left.toSeq == Seq("1-URGENT"),
      s"static overwrite must have truncated the other partitions, got ${left.mkString(",")}")
  }

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("partitioned parquet: filter on the partition key prunes directories") {
    val path = tmpDir("graft_part") + "/events_by_type"
    Warehouse.writePartitioned(
      Tables.events(spark, sfDir), path, Seq("event_type"))
    val filtered = Warehouse.readPartitioned(spark, path)
      .filter(col("event_type") === "click")
      .select(count(lit(1)).as("n"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type#") && plan.contains("= click"),
      s"partition filter not pushed to the scan:\n$plan")
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").count()
    assert(filtered.head().getLong(0) == expected)
  }

  test("orders round trip: partitioned write → pruned read → aggregate equals source") {
    val out = Warehouse.ordersRoundTrip(spark, sfDir,
      path = tmpDir("graft_rt") + "/orders").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("partition_pruned")),
      "o_year filter did not reach the scan as a PartitionFilter")
    val expected = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1995)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getAs[String]("o_orderpriority")).toSet == expected.keySet)
    out.foreach { r =>
      assert(r.getAs[Long]("n_orders") == expected(r.getAs[String]("o_orderpriority")))
    }
  }

  test("compaction rewrites 64 shards to ceil(n/target) files, losing nothing") {
    val out = Warehouse.compactionRoundTrip(spark, sfDir,
      base = tmpDir("graft_compact")).head()
    val n = Tables.orders(spark, sfDir).count()
    assert(out.getAs[Long]("n_rows") == n)
    assert(out.getAs[Long]("files_before") == 64L)
    assert(out.getAs[Long]("files_after") == (n + 14999) / 15000)
    assert(out.getAs[Boolean]("layout_ok"))
  }

  test("JSONL round-trips documents losslessly with explicit schema") {
    val path = tmpDir("graft_jsonl") + "/documents"
    val docs = Tables.documents(spark, sfDir)
    Warehouse.writeJsonl(docs, path)
    val back = Warehouse.readJsonl(spark, path, docs.schema)
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) => x == y }, "JSONL round-trip diverged")
  }

  test("ORC round trip preserves rows, types and values exactly") {
    val path = tmpDir("graft_orc") + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .limit(1000)
    li.write.mode("overwrite").orc(path)
    val back = spark.read.schema(li.schema).orc(path)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    val a = li.orderBy("l_orderkey", "l_quantity").collect().map(_.toSeq)
    val b = back.orderBy("l_orderkey", "l_quantity").collect().map(_.toSeq)
    assert(a.zip(b).forall { case (x, y) => x == y }, "ORC round-trip diverged")
  }

  test("mergeUpsert: update wins wholesale (NULLs included), inserts land, others survive") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "price")
    // update for k=2 carries a NULL tag — the update row must win
    // WHOLESALE (null tag kept), not per-column-coalesce back to "b"
    val updates = Seq((2L, null.asInstanceOf[String], 99.0), (4L, "new", 40.0))
      .toDF("k", "tag", "price")
    val merged = Warehouse.mergeUpsert(base, updates, "k")
      .orderBy("k").collect()
    assert(merged.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byK = merged.map(r => r.getLong(0) -> r).toMap
    assert(byK(1L).getString(1) == "a" && byK(1L).getDouble(2) == 10.0)
    assert(byK(2L).isNullAt(1) && byK(2L).getDouble(2) == 99.0,
      "matched update must win wholesale, including its NULL columns")
    assert(byK(4L).getString(1) == "new" && byK(4L).getDouble(2) == 40.0)
  }

  test("schema evolution: merged read widens, legacy rows surface as NULL channel") {
    val rows = Warehouse.schemaEvolutionRoundTrip(spark, sfDir).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    assert(rows.keySet == Set("legacy", "store", "web"))
    val orders = Tables.orders(spark, sfDir).select("o_orderkey").collect()
      .map(_.getLong(0))
    assert(rows.values.map(_.getAs[Long]("n_orders")).sum == orders.length,
      "widening must lose no rows")
    assert(rows("legacy").getAs[Long]("n_orders") == orders.count(_ % 2 == 0))
    assert(rows("web").getAs[Long]("n_orders") ==
      orders.count(k => k % 2 != 0 && k % 3 == 0))
  }

  test("scd2: versions chain per key, one current, change rows only") {
    val versions = Warehouse.scd2Customers(spark, sfDir).collect()
    versions.groupBy(_.getAs[Long]("o_custkey")).foreach { case (k, vs) =>
      val sorted = vs.sortBy(r =>
        (r.getAs[Long]("effective_from_us"), r.getAs[Long]("effective_to_us")))
      // ranges chain: each version's end is the next version's start
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("effective_to_us") ==
            b.getAs[Long]("effective_from_us"), s"cust $k: broken chain")
        case _ =>
      }
      // exactly one open version, and it is the last
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      assert(sorted.last.getAs[Long]("effective_to_us") ==
        Warehouse.Scd2OpenEndUs)
      // change detection: runs collapse, so consecutive versions differ
      // in priority. Only checkable when this customer's starts are all
      // distinct — same-timestamp versions (equal order dates) have an
      // ambiguous order under this sort key, so the lead-order adjacency
      // can't be reconstructed from the output alone
      val froms = sorted.map(_.getAs[Long]("effective_from_us"))
      if (froms.distinct.length == froms.length) {
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[String]("priority") != b.getAs[String]("priority"),
              s"cust $k: adjacent versions share a priority — not a change")
          case _ =>
        }
      }
    }
  }

  test("CSV source reads with explicit schema and delimiter") {
    val dir = tmpDir("graft_csv")
    val f = java.nio.file.Paths.get(dir, "r.csv")
    Files.writeString(f, "1;alpha;3.5\n2;beta;4.0\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, name STRING, score DOUBLE")
    val rows = Warehouse.readCsv(spark, f.toString, schema, delimiter = ";")
      .orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "alpha")
    assert(rows(1).getDouble(2) == 4.0)
  }

  test("dynamicPartitionPruning: DPP plans into the fact scan and the join result is exact") {
    import org.apache.spark.sql.functions._
    val rows = Warehouse.dynamicPartitionPruning(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("dpp_pruned")),
      "dynamicpruning expression missing from the partitioned scan")
    // exactness vs the direct unpartitioned join
    val direct = Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .filter(col("o_year") % 3 === 0)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      val (n, cents) = direct(r.getAs[Int]("o_year"))
      assert(r.getAs[Long]("n_orders") == n &&
        r.getAs[Long]("total_cents") == cents, r.toString)
    }
  }

  test("incrementalAggMaintenance: base+delta merge equals the from-scratch aggregate exactly") {
    import org.apache.spark.sql.functions._
    val merged = Warehouse.incrementalAggMaintenance(spark, sfDir).collect()
    val full = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged.nonEmpty)
    merged.foreach { r =>
      val (n, cents) = full(r.getAs[String]("o_orderpriority"))
      assert(r.getAs[Long]("n_orders") == n && r.getAs[Long]("total_cents") == cents, r.toString)
      val d = r.getAs[Long]("n_from_delta")
      assert(d >= 0 && d <= n)
    }
  }

  test("sketchRollup: exact arm matches a replay; both sketch contracts hold") {
    val rows = graft.sources.Warehouse.sketchRollup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0), r.getDate(1)))
    val byWeek = ev.groupBy { case (_, d) => d.toLocalDate.toEpochDay / 7 }
    assert(rows.length == byWeek.size)
    rows.foreach { r =>
      val wk = byWeek(r.getAs[Long]("week"))
      assert(r.getAs[Long]("n_days") == wk.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("exact_users") == wk.map(_._1).distinct.length.toLong)
      assert(r.getAs[Boolean]("merge_within_5pct"), r.toString)
      assert(r.getAs[Boolean]("merge_equals_direct"), r.toString)
    }
  }

  test("csv roundtrip: quoted note column and doubles survive the text hop row-for-row (q2o)") {
    import org.apache.spark.sql.functions._
    val path = graft.Fs.scratch("graft_test_cust_csv")
    val src = graft.Tables.customer(spark, sfDir).select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"),
      concat(col("c_name"), lit(", \"seg="), col("c_mktsegment"), lit("\""))
        .as("c_note"))
    src.write.mode("overwrite").option("header", "true").csv(path)
    val back = graft.sources.Warehouse.readCsv(spark, path, src.schema, header = true)
    // every column byte-identical after the quote/escape/parse cycle
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // the note really contains the delimiter and quote characters
    val note = back.select("c_note").head().getString(0)
    assert(note.contains(",") && note.contains("\""))
  }

  test("cdcApply: apply(old, diff(old,new)) == new; op counts replay from the mod rules (q2p)") {
    import org.apache.spark.sql.functions._
    val r = graft.sources.Warehouse.cdcApply(spark, sfDir).head()
    assert(r.getAs[Boolean]("apply_is_identity"),
      "applying the change feed did not reproduce the new snapshot")
    val keys = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(r.getAs[Long]("n_updates") == keys.count(_ % 10 == 3).toLong)
    assert(r.getAs[Long]("n_deletes") == keys.count(_ % 10 == 7).toLong)
    assert(r.getAs[Long]("n_inserted") == keys.count(_ % 10 == 1).toLong)
    assert(r.getAs[Long]("n_rows") ==
      (keys.length - keys.count(_ % 10 == 7) + keys.count(_ % 10 == 1)).toLong)
  }

  test("qa6 DSv2 connector: deterministic generation, range-filter " +
      "pushdown with exact narrowing, safe residual filters, pruning") {
    def synth(rows: Long, parts: Int) = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()
    // full scan: exact row count, declared partitioning, Lehmer values
    val full = synth(1000, 4)
    assert(full.count() == 1000L)
    assert(full.rdd.getNumPartitions == 4)
    val sample = full.where(col("id") === 123L).collect().head
    assert(sample.getAs[Long]("value_e6") ==
      graft.sources.SynthSource.lehmer(123L))
    assert(sample.getAs[String]("bucket") == "b3")
    // range pushdown: the scan narrows to exactly the requested span
    val narrowed = synth(1000, 4).where(col("id") >= 100L && col("id") < 200L)
    assert(narrowed.count() == 100L)
    assert(narrowed.queryExecution.executedPlan.toString
      .contains("lo=100, hi=200"), "range filter must reach the source")
    // a filter the source declines stays residual — still correct
    val residual = synth(1000, 4)
      .where(col("id") >= 100L && col("id") < 200L
        && col("value_e6") % 2 === 0L)
    val expected = (100L until 200L)
      .count(i => graft.sources.SynthSource.lehmer(i) % 2 == 0)
    assert(residual.count() == expected.toLong,
      "declined filters must apply post-scan")
    // column pruning reaches the reader
    val pruned = synth(1000, 2).select("id")
    assert(pruned.queryExecution.executedPlan.toString.contains("cols=id"),
      "projection must prune the generated columns")
    assert(pruned.agg(sum("id")).head().getLong(0) == (0L until 1000L).sum)
    // contradiction collapses to an empty span, not a negative one
    assert(synth(1000, 4).where(col("id") >= 900L && col("id") < 100L)
      .count() == 0L)
  }

  test("qak DSv2 aggregate/limit pushdown: closed-form count/min/max " +
      "never reach a Spark aggregate; limit caps the span; sums decline") {
    def synth(rows: Long) = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("parts", "4").load()
    // complete pushdown: the plan carries the SynthAggScan and NO Spark
    // aggregate node — the values come from span arithmetic
    val agg = synth(100000)
      .where(col("id") >= 1000L && col("id") < 5000L)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("agg=count,min,max"),
      "count/min/max must reach the source")
    assert(!aggPlan.contains("HashAggregate") &&
      !aggPlan.contains("SortAggregate"),
      "complete pushdown must leave no Spark aggregate in the plan")
    assert(agg.head() == org.apache.spark.sql.Row(4000L, 1000L, 4999L))
    // a grouped aggregate is declined (group-by can't collapse to the
    // span closed form) and must still be correct from scanned rows
    val grouped = synth(100)
      .groupBy((col("id") % 2).as("p")).agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.executedPlan.toString
      .contains("HashAggregate"), "group-by must stay in Spark")
    assert(grouped.collect().map(_.getLong(1)).toSeq == Seq(50L, 50L))
    // sum over the Lehmer column is declined; value correct post-scan
    val s = synth(100).agg(sum("value_e6")).head().getLong(0)
    assert(s == (0L until 100L).map(graft.sources.SynthSource.lehmer).sum)
    // limit pushdown: the scan caps the span itself — exactly the first
    // l ids come back, and the plan records the pushed limit
    val lim = synth(100000).select("id").limit(7)
    assert(lim.queryExecution.executedPlan.toString.contains("limit=7"),
      "limit must reach the source")
    assert(lim.collect().map(_.getLong(0)).sorted.toSeq == (0L until 7L))
    // limit composes with the pushed range filter
    val limF = synth(100000).where(col("id") >= 500L).limit(3)
    assert(limF.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(500L, 501L, 502L))
    // empty-span aggregate: count 0, null min/max (SQL semantics)
    val empty = synth(1000).where(col("id") >= 900L && col("id") < 100L)
      .agg(count(lit(1)), min("id"), max("id")).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("qa7 DSv2 sink: per-task commit messages aggregate on the driver; " +
      "task arity follows the write partitioning; stats are exact") {
    import graft.sources.SynthSink
    def writeVia(parts: Int, runId: String): Unit =
      spark.range(0, 1000).toDF("id")
        .withColumn("value_e6", col("id") * 7L)
        .repartition(parts)
        .write.format("graft.sources.SynthSink")
        .option("runId", runId).mode("append").save()
    writeVia(3, "spec-a")
    val a = SynthSink.committed.remove("spec-a").get
    assert(a.nTasks == 3L, "one commit message per write task")
    assert(a.nRows == 1000L)
    assert(a.sumId == (0L until 1000L).sum)
    assert(a.sumValue == (0L until 1000L).map(_ * 7L).sum)
    // same data, different parallelism: identical stats, different arity
    writeVia(5, "spec-b")
    val b = SynthSink.committed.remove("spec-b").get
    assert(b.nTasks == 5L)
    assert((b.nRows, b.sumId, b.sumValue) == (a.nRows, a.sumId, a.sumValue),
      "committed statistics must be partitioning-independent")
    assert(SynthSink.committed.get("spec-a").isEmpty,
      "consumed commits must not leak in the registry")
  }

  test("qae layout advisor: expected-files replays driver-side; z-order " +
      "skips on both probe keys where linear layouts skip on one") {
    val rows = Warehouse.layoutAdvisor(spark, sfDir).collect()
    assert(rows.length == 6)
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def z(p: Long, s: Long): Long = (0 until 16).map { i =>
      ((p >> i) % 2) * (1L << (2 * i + 1)) + ((s >> i) % 2) * (1L << (2 * i))
    }.sum
    val layouts = Map[String, ((Long, Long)) => Long](
      "partkey" -> (_._1), "suppkey" -> (_._2),
      "zorder" -> (t => z(t._1, t._2)))
    val probes = Map[String, ((Long, Long)) => Long](
      "partkey" -> (_._1), "suppkey" -> (_._2))
    def get(l: String, p: String) = rows.find(r =>
      r.getAs[String]("layout") == l && r.getAs[String]("probe") == p).get
    layouts.foreach { case (lname, lf) =>
      val maxL = li.map(lf).max
      val spans = li.groupBy(t => lf(t) * 16 / (maxL + 1)).view
        .mapValues(v => (v.map(_._1).min, v.map(_._1).max,
          v.map(_._2).min, v.map(_._2).max)).toMap
      probes.foreach { case (pname, pf) =>
        val top = li.groupBy(pf).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (v, w) => (-w, v) }.take(20)
        val sumW = top.map(_._2).sum
        val sumWt = top.map { case (v, w) =>
          w * spans.values.count { sp =>
            if (pname == "partkey") sp._1 <= v && v <= sp._2
            else sp._3 <= v && v <= sp._4
          }.toLong
        }.sum
        val r = get(lname, pname)
        assert(r.getAs[Long]("expected_files_e3") == sumWt * 1000 / sumW,
          s"$lname/$pname expectation")
        assert(r.getAs[Long]("skip_ppm") ==
          (16 * sumW - sumWt) * 1000000L / (16 * sumW))
      }
    }
    // the advisor's claim, measured: each linear layout skips nothing
    // on the other key; z-order skips meaningfully on BOTH
    assert(get("partkey", "suppkey").getAs[Long]("skip_ppm") <
      get("zorder", "suppkey").getAs[Long]("skip_ppm"))
    assert(get("suppkey", "partkey").getAs[Long]("skip_ppm") <
      get("zorder", "partkey").getAs[Long]("skip_ppm"))
    Seq("partkey", "suppkey").foreach { p =>
      assert(get("zorder", p).getAs[Long]("skip_ppm") > 0L,
        s"z-order must skip on $p")
    }
  }

  test("qa8 DSv2 streaming source: AvailableNow drains in capped batches " +
      "and self-terminates; replay is deterministic") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    def drain(rows: Long, batch: Long): (Map[String, Long], Long, Boolean) = {
      val qname = "qa8spec_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val agg = spark.readStream.format("graft.sources.SynthStream")
        .option("rows", rows.toString).option("batch", batch.toString).load()
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName(qname).start()
      try {
        q.awaitTermination()
        val progress = q.recentProgress.filter(_.numInputRows > 0)
        val res = spark.table(qname).collect()
          .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n")).toMap
        (res, progress.length.toLong, progress.forall(_.numInputRows <= batch))
      } finally q.stop()
    }
    val (res, nBatches, capped) = drain(1000, 128)
    assert(res.values.sum == 1000L)
    assert(res == (0 until 10).map(b => s"b$b" -> 100L).toMap)
    assert(nBatches == 8L, "1000 rows at cap 128 is 8 admission steps")
    assert(capped, "admission control must bound every micro-batch")
    // same space at a different cap: identical final answer
    val (res2, nBatches2, _) = drain(1000, 300)
    assert(res2 == res, "batching must not change the answer")
    assert(nBatches2 == 4L)
  }

  test("qat storage-partitioned join: reported clustering removes every " +
      "exchange; disabling v2 bucketing restores the shuffle, same values") {
    def src(rows: Long) = spark.read
      .format("graft.sources.SynthClustered")
      .option("rows", rows.toString).option("groups", "8").load()
    def shape(): (String, Seq[org.apache.spark.sql.Row]) = {
      val j = src(4000).groupBy("grp").agg(count(lit(1)).as("n"))
        .join(src(2000).groupBy("grp").agg(sum("value_e6").as("s")), "grp")
      (j.queryExecution.executedPlan.toString, j.orderBy("grp").collect().toSeq)
    }
    val (spjPlan, spjRows) = graft.SessionConf.withConfs(spark,
      "spark.sql.sources.v2.bucketing.enabled" -> "true")(shape())
    assert(!spjPlan.contains("Exchange"),
      s"SPJ must plan with zero exchanges; got:\n${spjPlan.take(600)}")
    val (offPlan, offRows) = graft.SessionConf.withConfs(spark,
      "spark.sql.sources.v2.bucketing.enabled" -> "false")(shape())
    assert(offPlan.contains("Exchange"),
      "negative control: without v2 bucketing the join must shuffle")
    assert(spjRows == offRows,
      "storage-partitioned and shuffled plans must agree row-for-row")
    // the reported clustering is TRUE: every row in partition g carries grp = g
    val parts = src(1000).select("grp")
      .rdd.mapPartitionsWithIndex { (idx, it) =>
        Iterator.single(idx -> it.map(_.getLong(0)).toSet)
      }.collect()
    parts.foreach { case (_, grps) =>
      assert(grps.size == 1, "a clustered partition must hold one group")
    }
    assert(parts.flatMap(_._2).sorted.toSeq == (0L until 8L))
  }

  test("qaq sorted export: one sorted file per shard, globally ordered, " +
      "lossless against the source") {
    val rows = graft.sources.Warehouse.sortedExport(spark, sfDir).collect()
    assert(rows.length == 16)
    assert(rows.forall(_.getAs[Boolean]("one_file_per_shard")))
    assert(rows.forall(_.getAs[Boolean]("disjoint_after_prev")))
    val docs = graft.Tables.documents(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == docs.count())
    // within-file order — the fact the read-back aggregate can't grade:
    // each shard is ONE parquet file; read it alone and check doc_id
    // ascends in file order
    val outDir = graft.Fs.scratch("graft_sorted_export")
    val shardDirs = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 16)
    shardDirs.take(4).foreach { d =>
      val ids = spark.read.parquet(d.getPath).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted),
        s"${d.getName}: rows must be stored in doc_id order")
    }
  }

  test("qaz skipping manifest: pruning is sound (every matching row lives " +
      "in a scanned file) and the sort column actually skips") {
    val rows = graft.sources.Warehouse.skippingManifest(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("probe_id"))
    assert(rows.length == 6)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      val matched =
        if (r.getAs[String]("col_name") == "doc_id")
          docs.count { case (id, _) => id >= lo && id <= hi }
        else docs.count { case (_, ch) => ch >= lo && ch <= hi }
      // SOUNDNESS: rows_matched replays exactly — a pruned file holding
      // a match would make the operator undercount
      assert(r.getAs[Long]("rows_matched") == matched.toLong,
        s"probe ${r.getAs[Int]("probe_id")}: matched rows diverged")
      assert(r.getAs[Long]("files_scanned") >=
        r.getAs[Long]("files_with_hits"))
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
    }
    // the layout payoff: sort-column probes skip most files, the
    // unsorted column skips none
    val (sorted, unsorted) =
      rows.partition(_.getAs[String]("col_name") == "doc_id")
    sorted.foreach(r => assert(r.getAs[Long]("skip_ppm") >= 750000L,
      "a point/short-range probe on the sort column must prune"))
    // dominance, not zero: tiny sf0.001 shards can skip occasionally on
    // the unsorted column by luck, but never approach the sorted column
    val worstSorted = sorted.map(_.getAs[Long]("skip_ppm")).min
    unsorted.foreach(r => assert(r.getAs[Long]("skip_ppm") < worstSorted,
      "unsorted-column pruning should not rival the sort column"))
  }

  test("qb1 join cardinality: actuals and table-level estimates replay " +
      "driver-side; the histogram dominates on the skewed key") {
    val rows = graft.sources.Warehouse.joinCardinalityEstimate(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("join_name"), r.getAs[String]("estimator"))
        -> r).toMap
    assert(rows.size == 6)
    // exact actuals replayed
    val li = Tables.lineitem(spark, sfDir)
    val nO = Tables.orders(spark, sfDir).count()
    assert(rows(("orders_customer", "table_level"))
      .getAs[Long]("actual_rows") == nO) // FK: one customer per order
    val cnts = li.groupBy("l_partkey").count().collect()
      .map(_.getAs[Long]("count"))
    assert(rows(("lineitem_partkey_self", "hist64"))
      .getAs[Long]("actual_rows") == cnts.map(c => c * c).sum)
    // table-level estimator formula replayed on the partkey self-join
    val n = cnts.sum
    val ndv = cnts.length.toLong
    assert(rows(("lineitem_partkey_self", "table_level"))
      .getAs[Long]("est_rows") == n * n / ndv)
    // FK join: both estimators exact
    Seq("table_level", "hist64").foreach(e =>
      assert(rows(("orders_customer", e)).getAs[Long]("err_ppm") == 0L,
        s"FK join estimate ($e) must be exact"))
    // the point of histograms: on the monotone-skew key the histogram
    // must beat table-level stats by a wide margin
    val skT = rows(("lineitem_sqrtkey_self", "table_level"))
      .getAs[Long]("err_ppm")
    val skH = rows(("lineitem_sqrtkey_self", "hist64"))
      .getAs[Long]("err_ppm")
    assert(skT > 100000L,
      s"skew key should break the uniformity assumption, err=$skT")
    assert(skH * 10 < skT,
      s"histogram must close most of the gap: hist=$skH table=$skT")
  }

  test("qal stream restart: a new query over the same checkpoint resumes " +
      "at the committed offset — ids exactly [0, rows), no replay, no gap") {
    val rows = graft.sources.SynthStream
      .streamingRestartReplay(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("resumed_without_replay"),
        "per-run numInputRows must split exactly at the cut")
      assert(r.getAs[Long]("n") == r.getAs[Long]("n_distinct"),
        "duplicate ids in the sink = offsets were replayed")
    }
    assert(rows.map(_.getAs[Long]("run1_rows")).head == 12288L)
    assert(rows.map(_.getAs[Long]("run2_rows")).head == 7712L)
    // the sink holds the COMPLETE id space, each id exactly once
    val sink = spark.read
      .parquet(graft.Fs.scratch("graft_synthstream_restart_sink"))
    assert(sink.count() == 20000L)
    assert(sink.select("id").distinct().count() == 20000L)
    assert(sink.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(0L, 19999L))
  }

  test("encodingAdvisor: size models replay and the advice is the argmin") {
    val rows = graft.sources.Warehouse.encodingAdvisor(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (n, ndv, runs) = (r.getAs[Long]("n"), r.getAs[Long]("ndv"),
        r.getAs[Long]("n_runs"))
      // note runs can dip below ndv-1: an orderkey gap skips that
      // boundary comparison by design (identically in both engines)
      assert(ndv <= n && runs <= n && runs >= 1L,
        s"${r.getAs[String]("column_name")}: stat ordering violated")
      val w = if (r.getAs[String]("column_name") == "l_returnflag") 1L else 8L
      assert(r.getAs[Long]("plain_b") == n * w)
      val bits = java.lang.Long.toBinaryString(ndv - 1).length.toLong
      assert(r.getAs[Long]("dict_b") == ndv * w + n * bits / 8L)
      assert(r.getAs[Long]("rle_b") == runs * (w + 4L))
      val best = Seq("plain" -> r.getAs[Long]("plain_b"),
        "dict" -> r.getAs[Long]("dict_b"), "rle" -> r.getAs[Long]("rle_b"))
      assert(best.find(_._1 == r.getAs[String]("advised")).get._2 ==
        best.map(_._2).min, "advice must be the cheapest encoding")
    }
    // the fixture exercises the whole decision surface
    val advice = rows.map(r =>
      r.getAs[String]("column_name") -> r.getAs[String]("advised")).toMap
    assert(advice("l_extendedprice") == "plain", "high-NDV measure")
    assert(advice("l_orderkey") == "rle", "clustered key")
    assert(advice("l_returnflag") == "dict", "low-NDV enum")
  }

  test("datasetDiff: classification replays the planted change classes") {
    import org.apache.spark.sql.functions._
    val byStatus = graft.sources.Warehouse.datasetDiff(spark, sfDir)
      .collect().map(r => r.getAs[String]("status") -> r).toMap
    val docs = graft.Tables.documents(spark, sfDir)
    val nRemoved = docs.where(col("doc_id") % 37 === 0).count()
    val nAdded = docs.where(col("doc_id") % 53 === 0).count()
    val nChanged = docs.where(col("doc_id") % 41 === 0 &&
      col("doc_id") % 37 =!= 0).count()
    assert(byStatus("removed").getAs[Long]("n_rows") == nRemoved)
    assert(byStatus("added").getAs[Long]("n_rows") == nAdded)
    assert(byStatus("changed").getAs[Long]("n_rows") == nChanged)
    assert(byStatus("unchanged").getAs[Long]("n_rows") ==
      docs.count() - nRemoved - nChanged)
    // the %41 edit touches exactly lang and n_chars, on every changed row
    val ch = byStatus("changed")
    assert(ch.getAs[Long]("n_lang_changed") == nChanged)
    assert(ch.getAs[Long]("n_chars_changed") == nChanged)
    assert(ch.getAs[Long]("n_text_changed") == 0L)
    assert(ch.getAs[Long]("n_source_changed") == 0L)
    // added/removed rows never count toward column drills
    Seq("added", "removed", "unchanged").foreach { s =>
      assert(byStatus(s).getAs[Long]("n_lang_changed") == 0L)
    }
  }

  test("bitemporal: each belief state sees exactly its corrections") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Warehouse.bitemporal(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("tx_asof"), r.getAs[Int]("probe_days")) -> r)
      .toMap
    assert(rows.size == 6)
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    val n19 = o.where(col("o_orderkey") % 19 === 0).count()
    val n23 = o.where(col("o_orderkey") % 23 === 0).count()
    val n437 = o.where(col("o_orderkey") % 437 === 0).count()
    rows.values.foreach(r => assert(r.getAs[Long]("n_orders") == n))
    // tx 0 sees nothing; probes agree (no amendment is valid yet)
    assert(rows((0L, 15)).getAs[Long]("n_from_correction") == 0L)
    assert(rows((0L, 15)).getAs[Long]("sum_cents") ==
      rows((0L, 45)).getAs[Long]("sum_cents"))
    // retroactive correction: visible from tx 1 at BOTH probes, worth
    // exactly +1000 cents per %19 key
    val base = rows((0L, 15)).getAs[Long]("sum_cents")
    Seq(15, 45).foreach { p =>
      assert(rows((1L, p)).getAs[Long]("n_from_correction") == n19)
      assert(rows((1L, p)).getAs[Long]("sum_cents") == base + 1000L * n19)
    }
    // prospective amendment: tx 2 at probe 15 is IDENTICAL to tx 1
    // (not yet valid); at probe 45 it supersedes, including on the
    // %437 keys that had the correction
    assert(rows((2L, 15)).getAs[Long]("sum_cents") ==
      rows((1L, 15)).getAs[Long]("sum_cents"))
    assert(rows((2L, 45)).getAs[Long]("n_from_amendment") == n23)
    assert(rows((2L, 45)).getAs[Long]("n_from_correction") == n19 - n437)
    assert(rows((2L, 45)).getAs[Long]("sum_cents") ==
      base + 1000L * n19 + 5000L * n23 - 1000L * n437)
  }

  test("metadataColumns: hidden _metadata struct carries per-file provenance") {
    import org.apache.spark.sql.functions._
    val path = tmpDir("meta_shards")
    val rows = graft.sources.Warehouse.metadataColumns(spark, sfDir, path)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    assert(rows.size == 4)
    val docs = Tables.documents(spark, sfDir)
    (0L until 4L).foreach { s =>
      assert(rows(s).getAs[Long]("n_rows") ==
        docs.where(col("doc_id") % 4 === s).count())
      assert(rows(s).getAs[Boolean]("one_file_per_shard"))
      assert(rows(s).getAs[Boolean]("sizes_positive"))
      assert(rows(s).getAs[Boolean]("row_index_complete"))
    }
    // the path column really localizes rows: every row's file_path
    // contains its own shard directory
    val mismatches = spark.read.parquet(path)
      .select(col("shard").cast("long").as("shard"),
        col("_metadata.file_path").as("fp"))
      .where(!col("fp").contains(concat(lit("shard="), col("shard"))))
      .count()
    assert(mismatches == 0L)
  }

  test("voptimalHistogram: engine argmin equals the exhaustive Scala search; optimum beats equi-width") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Warehouse.voptimalHistogram(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(rows.length == 4)
    // independent truth: literal exhaustive search over every cut plan
    val freqs = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long")).collect().map(_.getLong(0))
      .groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) => (v, g.length.toLong) }
    val nv = freqs.length
    val s = freqs.scanLeft(0L)(_ + _._2).toArray // s(i) = freq sum of first i
    val q = freqs.scanLeft(0L)((acc, f) => acc + f._2 * f._2).toArray
    def segCost(a: Int, b: Int): Long = // values a+1..b (index space)
      (q(b) - q(a)) * 1000000L -
        (s(b) - s(a)) * (s(b) - s(a)) * 1000000L / (b - a)
    var best = Long.MaxValue; var bestCut = (0, 0, 0)
    for (c1 <- 1 until nv; c2 <- c1 + 1 until nv; c3 <- c2 + 1 until nv) {
      val cost = segCost(0, c1) + segCost(c1, c2) + segCost(c2, c3) +
        segCost(c3, nv)
      if (cost < best) { best = cost; bestCut = (c1, c2, c3) }
    }
    assert(rows.map(_.getAs[Long]("total_cost_e6")).distinct.toSeq == Seq(best))
    val his = rows.map(_.getAs[Long]("hi_value"))
    assert(his(0) == freqs(bestCut._1 - 1)._1)
    assert(his(1) == freqs(bestCut._2 - 1)._1)
    assert(his(2) == freqs(bestCut._3 - 1)._1)
    assert(his(3) == freqs.last._1)
    // partition + conservation + the headline property
    assert(rows.map(_.getAs[Long]("n_values")).sum == nv.toLong)
    assert(rows.map(_.getAs[Long]("freq_sum")).sum == s(nv))
    assert(rows.map(_.getAs[Long]("bucket_cost_e6")).sum == best)
    rows.foreach(r => assert(r.getAs[Boolean]("beats_equiwidth")))
  }

  test("corruptRecords: PERMISSIVE channels, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val path = tmpDir("corrupt_jsonl")
    val rows = graft.sources.Warehouse.corruptRecords(spark, sfDir, path)
      .collect().map(r => r.getAs[String]("cls") -> r).toMap
    val ev = Tables.events(spark, sfDir)
    val nBad = ev.where(col("event_id") % 13 === 0).count()
    assert(rows("_corrupt").getAs[Long]("n") == nBad)
    assert(rows("_corrupt").getAs[Long]("n_quarantined_replayable") == nBad,
      "every quarantined line must keep its replayable raw prefix")
    assert(rows.values.map(_.getAs[Long]("n")).sum == ev.count())
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("cents", LongType)))
    // DROPMALFORMED: silently loses exactly the planted rows — which is
    // why PERMISSIVE+quarantine is the production default
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(path).count()
    assert(dropped == ev.count() - nBad)
    // FAILFAST: the job dies on the first bad line
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        .write.format("noop").mode("overwrite").save()
    }
  }

  test("documentsXmlRoundTrip: escape/unescape cycle is lossless; nulls survive") {
    import org.apache.spark.sql.functions._
    val rt = graft.sources.Warehouse.documentsXmlRoundTrip(spark, sfDir,
      tmpDir("docs_xml"))
    val docs = graft.Tables.documents(spark, sfDir)
    val truth = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text")).cast("long")).as("sum_text_len"),
      sum(when(col("doc_id") % 19 === 0, 1L).otherwise(0L)).as("n_lang_null"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val got = rt.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = truth(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == t.getAs[Long]("n_docs"))
      // text byte-for-byte through entity escaping: lengths sum equal
      assert(r.getAs[Long]("sum_text_len") == t.getAs[Long]("sum_text_len"))
      // omitted elements decode back to null, and ONLY the planted ones
      assert(r.getAs[Long]("n_lang_null") == t.getAs[Long]("n_lang_null"))
    }
  }

  test("qcb surrogate keys: dense, closed-form-exact, stable under repartitioning, no global fact window") {
    import org.apache.spark.sql.functions._
    val df = graft.sources.Warehouse.surrogateKeys(spark, sfDir)
    // scale shape: every window in the plan is partitioned — the
    // unpartitioned passes run only on the bounded bucket frame,
    // which in this plan appear AFTER an aggregation, never over the
    // fact rows. Assert directly: no WindowExec whose child is the
    // raw supplier scan without a partition spec.
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("windowspecdefinition(s_suppkey"),
      "fact rows must never pass through an unpartitioned window " +
        "(partitioned windows render as windowspecdefinition(b, s_suppkey ...))")
    val rows = df.collect()
    val keys = rows.map(_.getAs[Long]("s_suppkey"))
    val sks = rows.map(_.getAs[Long]("sk"))
    // dense 1..N, unique
    assert(sks.sorted.sameElements(1L to rows.length.toLong))
    // closed form: sk(existing k) = rank among existing; sk(new k) =
    // max_existing + rank among new — replayed in plain Scala
    val (ex, nw) = keys.partition(_ % 4 != 0)
    val exRank = ex.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    val nwRank = nw.sorted.zipWithIndex
      .map { case (k, i) => k -> (ex.length + i + 1L) }.toMap
    rows.foreach { r =>
      val k = r.getAs[Long]("s_suppkey")
      val expect = if (k % 4 != 0) exRank(k) else nwRank(k)
      assert(r.getAs[Long]("sk") == expect, s"key $k")
      assert(r.getAs[String]("src") ==
        (if (k % 4 != 0) "existing" else "new"))
    }
    // determinism under adversarial partitioning: the rank path gives
    // the identical assignment when the input arrives pre-shuffled
    val sup = Tables.supplier(spark, sfDir).select(col("s_suppkey"))
    val base = graft.sources.Warehouse.denseRankByKey(sup, "s_suppkey")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rk")).toMap
    val again = graft.sources.Warehouse
      .denseRankByKey(sup.repartition(7), "s_suppkey")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rk")).toMap
    assert(again == base, "assignment must not depend on partitioning")
  }
}
