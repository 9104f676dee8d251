package graft

import graft.etl.MovieLens
import graft.operators.{Dedup, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.2): algebraic laws that must hold for any
  * input, checked over generated data on small local frames. The
  * scalatest↔scalacheck bridge isn't on the offline classpath, so
  * generators are sampled directly with fixed seeds (reproducible). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val token: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the", "of", "x1", "y2")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  test("trigram count is max(n-2, 1) for any document") {
    forSamples(doc) { text =>
      val n = text.split(" ").length
      val grams = Seq(text).toDF("text")
        .select(Text.trigrams(col("text")).as("g")).head().getSeq[String](0)
      assert(grams.length == math.max(n - 2, 1))
    }
  }

  test("ngrams(n) equals the naive sliding window for any document and n") {
    forSamples(Gen.zip(doc, Gen.chooseNum(2, 5))) { case (text, n) =>
      val toks = text.split(" ").toSeq
      val expected = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      val got = Seq(text).toDF("text")
        .select(Text.ngrams(split(col("text"), " "), n).as("g"))
        .head().getSeq[String](0)
      assert(got == expected, s"n=$n text='$text'")
    }
  }

  test("runLengthScan equals groupBy max-count/distinct for any gram bag") {
    forSamples(Gen.chooseNum(1, 25).flatMap(k => Gen.listOfN(k, token))) { bag =>
      val expectedMax = bag.groupBy(identity).values.map(_.size).max.toLong
      val expectedDistinct = bag.distinct.size.toLong
      val r = Seq(bag).toDF("bag")
        .select(Text.runLengthScan(array_sort(col("bag"))).as("s"))
        .head().getStruct(0)
      assert(r.getAs[Long]("max_run") == expectedMax)
      assert(r.getAs[Long]("n_distinct") == expectedDistinct)
    }
  }

  test("pivot ∘ explode reconstructs the genre multiset for any movie set") {
    val genres = Gen.nonEmptyListOf(Gen.oneOf("A", "B", "C", "D", "E")).map(_.distinct)
    forSamples(Gen.nonEmptyListOf(genres), 10) { rows =>
      val movies = rows.zipWithIndex
        .map { case (gs, i) => (i, s"t$i", gs.mkString("|")) }
        .toDF("movieId", "title", "genres")
      val vocab = MovieLens.genreVocabulary(movies)
      val oh = MovieLens.oneHotGenres(movies, vocab)
      val back = oh.collect().map { r =>
        r.getAs[Int]("movieId") -> vocab.filter(g => r.getAs[Int](g) == 1).toSet
      }.toMap
      rows.zipWithIndex.foreach { case (gs, i) => assert(back(i) == gs.toSet) }
    }
  }

  test("RMSE is non-negative and zero iff predictions equal labels") {
    val pair = for {
      a <- Gen.chooseNum(0.5, 5.0)
      d <- Gen.chooseNum(-1.0, 1.0)
    } yield (a, a + d)
    forSamples(Gen.nonEmptyListOf(pair), 10) { ps =>
      val df = ps.toDF("rating", "prediction")
      val rmse = graft.eval.Metrics.rmse(df)
      assert(rmse >= 0.0)
      val perfect = ps.map { case (a, _) => (a, a) }.toDF("rating", "prediction")
      assert(graft.eval.Metrics.rmse(perfect) == 0.0)
    }
  }

  test("minhash similarity estimate is monotone in true overlap") {
    // doc pairs with increasing token overlap must not DECREASE in
    // matching-minhash fraction (checked on fixed constructed cases)
    val base = (1 to 30).map(i => s"tok$i")
    def overlapDoc(k: Int) =
      (base.take(k) ++ (1 to (30 - k)).map(i => s"other${i}_$k")).mkString(" ")
    val df = Seq(0, 10, 20, 30).map(k => (k.toLong, overlapDoc(k)))
      .toDF("doc_id", "text")
    val ref = base.mkString(" ")
    val sigs = df.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val refSig = Seq((99L, ref)).toDF("doc_id", "text")
      .select(Dedup.minhashSignature(col("text"), 32)).head().getSeq[Long](0)
    val match30 = sigs(30L).zip(refSig).count { case (a, b) => a == b }
    val match0 = sigs(0L).zip(refSig).count { case (a, b) => a == b }
    assert(match30 == 32) // identical docs → identical signatures
    assert(match0 <= match30)
  }

  test("simhash is bag-invariant: reordering tokens preserves it, editing a token changes it") {
    // simhash sums per-token votes, so it must ignore token ORDER (bag
    // semantics) — and a single token edit on a small doc should flip
    // at least one of the 64 bits
    val tokGen = Gen.zip(
      Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "tok1", "tok2")),
      Gen.choose(0L, Long.MaxValue))
    forSamples(tokGen, n = 10) { case (toks, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      val df = Seq(
        (1L, toks.mkString(" ")),
        (2L, shuffled.mkString(" "))).toDF("doc_id", "text")
      val sh = df.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sh(1L) == sh(2L), "reorder changed simhash")
    }
    // sensitivity is NOT universal (an edit flips a bit only if some
    // vote sits at the sign boundary), so check it on one fixed case
    val fixed = Seq(
      (1L, "alpha beta gamma delta tok1 tok2"),
      (2L, "alpha beta gamma delta tok1 EDITED")).toDF("doc_id", "text")
    val fs = fixed.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fs(1L) != fs(2L), "fixed token edit did not change simhash")
  }

  test("native as-of join ≡ composed union+window form for any generated table pair") {
    import graft.operators.TimeJoin
    import java.sql.Timestamp
    // small key/time domains force collisions: exact-ts ties, empty
    // keys, keys on one side only — every edge the merge must handle
    val row = Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 20L),
      Gen.chooseNum(0, 99))
    val table = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, row))
    forSamples(Gen.zip(table, table), n = 15) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t, v), i) => (k, new Timestamp(t * 1000), i.toLong) }
        .toDF("key", "ts", "row_id")
      val right = rRows
        .map { case (k, t, v) => (k, new Timestamp(t * 1000), v.toDouble) }
        .toDF("key", "ts", "rv")
      def canon(df: org.apache.spark.sql.DataFrame, rvCol: String) =
        df.select(col("row_id"), col(rvCol)).collect()
          .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val native = canon(
        TimeJoin.asofJoinNative(left, right, "key", "ts", Seq("rv")), "rv")
      val composed = canon(
        TimeJoin.asofJoin(left, right, "key", "ts", Seq("rv")), "__asof_rv")
      assert(native == composed,
        s"native=$native\ncomposed=$composed\nleft=$lRows\nright=$rRows")
      val nativeFwd = canon(
        TimeJoin.asofJoinNative(left, right, "key", "ts", Seq("rv"),
          forward = true), "rv")
      val composedFwd = canon(
        TimeJoin.asofJoinForward(left, right, "key", "ts", Seq("rv")), "__asof_rv")
      assert(nativeFwd == composedFwd,
        s"fwd native=$nativeFwd\nfwd composed=$composedFwd\nleft=$lRows\nright=$rRows")
    }
  }

  test("CART training is invariant under repartitioning, and children partition the root exactly") {
    // the property sampled-quantile tree learners do NOT have: the
    // exact histogram method must produce the identical tree whatever
    // the physical partitioning of the input
    val rowGen = for {
      q <- Gen.chooseNum(1L, 12L); d <- Gen.chooseNum(0L, 6L)
      t <- Gen.chooseNum(0L, 4L); k <- Gen.chooseNum(0L, 200L)
    } yield (q, d, t, k)
    val frameGen = Gen.chooseNum(40, 120)
      .flatMap(n => Gen.listOfN(n, rowGen))
    forSamples(frameGen, n = 8) { rows =>
      val df = rows.toDF("q", "d", "t", "k").select(
        col("q").cast("double").as("l_quantity"),
        (col("d").cast("double") / 100.0).as("l_discount"),
        (col("t").cast("double") / 100.0).as("l_tax"),
        col("k").as("l_orderkey"))
      def treeOf(in: org.apache.spark.sql.DataFrame) =
        graft.ml.Cart.cartQualityOn(in).collect().map(r =>
          (r.getAs[String]("node"), r.getAs[String]("feature"),
            r.getAs[Long]("thr"), r.getAs[Long]("score_e6"),
            r.getAs[Long]("nl"), r.getAs[Long]("posl"),
            r.getAs[Long]("nr"), r.getAs[Long]("posr"),
            r.getAs[Long]("train_acc_e6"))).sortBy(_._1)
      val t1 = treeOf(df)
      val t7 = treeOf(df.repartition(7))
      assert(t1.toSeq == t7.toSeq,
        s"tree must not depend on partitioning:\n$t1\nvs\n$t7")
      val byNode = t1.map(x => x._1 -> x).toMap
      assert(byNode("L")._5 + byNode("L")._7 == byNode("root")._5)
      assert(byNode("R")._5 + byNode("R")._7 == byNode("root")._7)
      assert(byNode("L")._6 + byNode("L")._8 == byNode("root")._6)
      assert(byNode("R")._6 + byNode("R")._8 == byNode("root")._8)
    }
  }

  // ---- spatial family: the grid cover must equal the naive all-pairs
  // answer for ANY geometry, not just the fixture's lattice — random
  // coordinates in a tight range force cell-boundary and negative-
  // coordinate cases far denser than the fixture ever does.

  private val spatialPt: Gen[(Long, Long)] =
    Gen.zip(Gen.chooseNum(-300L, 300L), Gen.chooseNum(-300L, 300L))
  private def ptsGen(n: Int): Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, n).flatMap(k => Gen.listOfN(k, spatialPt))
  private val radiusGen: Gen[Long] = Gen.oneOf(50L, 100L, 128L, 250L)

  test("grid radius join equals naive all-pairs for any geometry and radius") {
    forSamples(Gen.zip(ptsGen(40), ptsGen(6), radiusGen), 10) {
      case (ps, qs, r) =>
        val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        val probes = qs.zipWithIndex.map { case ((x, y), i) => (100L + i, x, y) }
        val out = graft.operators.Spatial.gridJoin(
            pts.toDF("pt_id", "px", "py"),
            probes.toDF("probe_id", "qx", "qy"), r)
          .collect().map(w => w.getAs[Long]("probe_id") ->
            (w.getAs[Long]("n_within"), w.getAs[Long]("id_checksum"),
              w.getAs[Long]("min_sqdist"))).toMap
        probes.foreach { case (pid, qx, qy) =>
          val within = pts.filter { case (_, px, py) =>
            (px - qx) * (px - qx) + (py - qy) * (py - qy) <= r * r }
          val expMin = if (within.isEmpty) -1L
            else within.map { case (_, px, py) =>
              (px - qx) * (px - qx) + (py - qy) * (py - qy) }.min
          assert(out(pid) == ((within.length.toLong,
            within.map(_._1).sum, expMin)), s"r=$r probe=($qx,$qy)")
        }
    }
  }

  test("containment join equals naive BETWEEN for any rectangles with extent <= pitch") {
    val rectGen = Gen.zip(spatialPt,
      Gen.chooseNum(1L, 100L), Gen.chooseNum(1L, 100L))
    forSamples(Gen.zip(ptsGen(40), Gen.chooseNum(1, 5).flatMap(k =>
      Gen.listOfN(k, rectGen))), 10) { case (ps, rs) =>
      val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val rects = rs.zipWithIndex.map { case (((sx, sy), wx, wy), i) =>
        (100L + i, sx, sy, wx, wy) }
      val out = graft.operators.Spatial.containJoin(
          pts.toDF("pt_id", "px", "py"),
          rects.toDF("rect_id", "sx", "sy", "wx", "wy"), 100L)
        .collect().map(w => w.getAs[Long]("rect_id") ->
          (w.getAs[Long]("n_inside"), w.getAs[Long]("id_checksum"))).toMap
      rects.foreach { case (rid, sx, sy, wx, wy) =>
        val in = pts.filter { case (_, px, py) =>
          px >= sx - wx && px <= sx + wx && py >= sy - wy && py <= sy + wy }
        assert(out(rid) == ((in.length.toLong, in.map(_._1).sum)), s"rect $rid")
      }
    }
  }

  test("knn-within-radius equals the naive ranked answer for any geometry, k, radius") {
    forSamples(Gen.zip(ptsGen(30), ptsGen(4), radiusGen,
      Gen.chooseNum(1, 6)), 8) { case (ps, qs, r, k) =>
      val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val probes = qs.zipWithIndex.map { case ((x, y), i) => (100L + i, x, y) }
      val got = graft.operators.Spatial.knnJoinFrames(
          pts.toDF("pt_id", "px", "py"),
          probes.toDF("probe_id", "qx", "qy"), r, k)
        .collect().map(w => (w.getAs[Long]("probe_id"), w.getAs[Long]("rank"),
          w.getAs[Long]("pt_id"), w.getAs[Long]("sqdist"))).toSeq
      val want = probes.flatMap { case (pid, qx, qy) =>
        pts.map { case (id, px, py) =>
          (id, (px - qx) * (px - qx) + (py - qy) * (py - qy)) }
          .filter(_._2 <= r * r)
          .sortBy { case (id, d) => (d, id) }.take(k).zipWithIndex
          .map { case ((id, d), i) => (pid, i + 1L, id, d) }
      }.sortBy(t => (t._1, t._2))
      assert(got == want, s"r=$r k=$k")
    }
  }

  test("grid dbscan equals a union-find replay for any geometry, eps, minPts") {
    forSamples(Gen.zip(ptsGen(30), Gen.oneOf(60L, 100L, 150L),
      Gen.chooseNum(2, 5)), 6) { case (ps, eps, minPts) =>
      val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val got = graft.operators.Spatial.dbscanFrames(
          pts.toDF("pt_id", "px", "py"), eps, minPts)
        .collect().map(w => w.getAs[Long]("cluster_id") ->
          (w.getAs[Long]("n_points"), w.getAs[Long]("n_core"),
            w.getAs[Long]("id_checksum"))).toMap
      // naive replay: neighborhoods, cores, union-find to min id
      def close(a: (Long, Long, Long), b: (Long, Long, Long)) =
        (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps * eps
      val neigh = pts.map(p => p._1 -> pts.filter(q => close(p, q)).map(_._1)).toMap
      val coreSet = neigh.collect { case (id, ns) if ns.length >= minPts => id }.toSet
      val parent = scala.collection.mutable.Map(coreSet.toSeq.map(i => i -> i): _*)
      def find(x: Long): Long = { var c = x; while (parent(c) != c) c = parent(c); c }
      for (c <- coreSet; n <- neigh(c) if coreSet(n)) {
        val (ra, rb) = (find(c), find(n))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val rep = coreSet.map(c => c -> find(c)).toMap
      val assign = scala.collection.mutable.Map[Long, (Long, Boolean)]()
      coreSet.foreach(c => assign(c) = (rep(c), true))
      pts.map(_._1).filterNot(coreSet).foreach { id =>
        val cn = neigh(id).filter(coreSet)
        if (cn.nonEmpty) assign(id) = (cn.map(rep).min, false)
      }
      val want = pts.map(_._1)
        .map(id => assign.get(id).map { case (rr, c) => (rr, id, c) }
          .getOrElse((-1L, id, false)))
        .groupBy(_._1)
        .map { case (cid, g) =>
          cid -> (g.length.toLong, g.count(_._3).toLong, g.map(_._2).sum) }
      assert(got == want, s"eps=$eps minPts=$minPts pts=$pts")
    }
  }

  test("trajectory hausdorff top-k equals the naive ranked answer for any trajectory set and radius") {
    val trajGen = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 4).flatMap(m =>
        Gen.listOfN(m, spatialPt))))
    forSamples(Gen.zip(trajGen, Gen.oneOf(60L, 100L, 150L)), 6) {
      case (trajs, r) =>
        val tp = trajs.zipWithIndex.flatMap { case (ws, k) =>
          ws.zipWithIndex.map { case ((x, y), i) =>
            (k.toLong, i.toLong + 1, x, y) } }
        val probes = Seq(Tuple1(0L))
        val got = graft.operators.Spatial.trajHausdorffFrames(
            tp.toDF("k", "ln", "x", "y"), probes.toDF("k"), r, 3)
          .collect().map(w => (w.getAs[Long]("rank"),
            w.getAs[Long]("match_ord"), w.getAs[Long]("hausdorff_sq"))).toSeq
        def h(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long =
          a.map(p => b.map(q => (p._1 - q._1) * (p._1 - q._1) +
            (p._2 - q._2) * (p._2 - q._2)).min).max
        val p0 = trajs.head.map(t => (t._1, t._2))
        val want = trajs.zipWithIndex.drop(1)
          .map { case (ws, k) =>
            val c = ws.map(t => (t._1, t._2))
            (k.toLong, math.max(h(p0, c), h(c, p0))) }
          .filter(_._2 <= r * r)
          .sortBy { case (k, hh) => (hh, k) }.take(3).zipWithIndex
          .map { case ((k, hh), i) => (i + 1L, k, hh) }
        assert(got == want, s"r=$r trajs=$trajs")
    }
  }

  test("frechet HOF DP equals the naive DP and is lower-bounded by hausdorff for any trajectories") {
    val trajGen = Gen.chooseNum(2, 5).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 4).flatMap(m =>
        Gen.listOfN(m, spatialPt))))
    def frechet(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
      val dp = Array.ofDim[Long](a.length, b.length)
      for (i <- a.indices; j <- b.indices) {
        val d = (a(i)._1 - b(j)._1) * (a(i)._1 - b(j)._1) +
          (a(i)._2 - b(j)._2) * (a(i)._2 - b(j)._2)
        val m =
          if (i == 0 && j == 0) 0L
          else if (i == 0) dp(0)(j - 1)
          else if (j == 0) dp(i - 1)(0)
          else math.min(dp(i - 1)(j), math.min(dp(i - 1)(j - 1), dp(i)(j - 1)))
        dp(i)(j) = math.max(d, m)
      }
      dp(a.length - 1)(b.length - 1)
    }
    forSamples(Gen.zip(trajGen, Gen.oneOf(300L, 600L)), 6) { case (trajs, r) =>
      // de-dup waypoints per trajectory the way the operator does (set
      // of ln-ordered positions); synthetic ln = index, all distinct
      val tp = trajs.zipWithIndex.flatMap { case (ws, k) =>
        ws.zipWithIndex.map { case ((x, y), i) =>
          (k.toLong, i.toLong + 1, x, y) } }
      val got = graft.operators.Spatial.frechetRerankFrames(
          tp.toDF("k", "ln", "x", "y"), Seq(Tuple1(0L)).toDF("k"), r, 3)
        .collect().map(w => (w.getAs[Long]("match_ord"),
          w.getAs[Long]("hausdorff_sq"), w.getAs[Long]("frechet_sq")))
      got.foreach { case (ck, h, f) =>
        assert(h <= f, s"law violated for cand $ck")
        assert(f == frechet(trajs.head.map(t => (t._1, t._2)),
          trajs(ck.toInt).map(t => (t._1, t._2))), s"DP mismatch cand $ck")
      }
    }
  }

  test("grid hotspots equal the direct neighborhood definition for any point set and pitch") {
    forSamples(Gen.zip(ptsGen(40), Gen.oneOf(50L, 100L, 200L)), 8) {
      case (ps, g) =>
        val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        val got = graft.operators.Spatial.hotspotFrames(
            pts.toDF("pt_id", "px", "py"), g)
          .collect().map(w => (w.getAs[Long]("cx"), w.getAs[Long]("cy")) ->
            (w.getAs[Long]("n"), w.getAs[Long]("nbr_max"))).toMap
        def cell(v: Long) = math.floor(v / g.toDouble).toLong
        val cells = pts.map { case (_, x, y) => (cell(x), cell(y)) }
          .groupBy(identity).map { case (c, grp) => c -> grp.length.toLong }
        val want = cells.flatMap { case ((cx, cy), n) =>
          val nbrMax = cells.collect { case ((bx, by), m)
            if math.abs(bx - cx) <= 1 && math.abs(by - cy) <= 1 &&
              (bx, by) != ((cx, cy)) => m }.foldLeft(0L)(math.max)
          if (n > nbrMax) Some((cx, cy) -> (n, nbrMax)) else None
        }
        assert(got == want, s"g=$g")
    }
  }

  test("cell-partitioned layout radius read equals the naive panel for any geometry with r <= pitch") {
    forSamples(Gen.zip(ptsGen(30), ptsGen(4),
      Gen.oneOf((100L, 100L), (200L, 150L), (150L, 80L))), 3) {
      case (ps, qs, (g, r)) =>
        val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        val probes = qs.zipWithIndex.map { case ((x, y), i) => (100L + i, x, y) }
        val path = graft.Fs.scratch(s"graft_prop_layout_${g}_$r")
        val got = graft.operators.Spatial.spatialLayoutFrames(
            pts.toDF("pt_id", "px", "py"),
            probes.toDF("probe_id", "qx", "qy"), g, r, path)
          .collect().map(w => w.getAs[Long]("probe_id") ->
            (w.getAs[Long]("n_within"), w.getAs[Long]("id_checksum"),
              w.getAs[Long]("n_cells_read"))).toMap
        def cell(v: Long) = math.floor(v / g.toDouble).toLong
        probes.foreach { case (pid, qx, qy) =>
          val cover = (for (dx <- -1L to 1L; dy <- -1L to 1L)
            yield (cell(qx) + dx, cell(qy) + dy)).toSet
          val cand = pts.filter { case (_, px, py) =>
            cover((cell(px), cell(py))) }
          val within = cand.filter { case (_, px, py) =>
            (px - qx) * (px - qx) + (py - qy) * (py - qy) <= r * r }
          assert(got(pid) == ((within.length.toLong, within.map(_._1).sum,
            cand.map { case (_, px, py) => (cell(px), cell(py)) }
              .distinct.length.toLong)), s"g=$g r=$r probe=($qx,$qy)")
        }
    }
  }

  test("rect overlap join with reference-point dedup equals naive all-pairs for any rectangles with extent <= pitch") {
    val rectGen = Gen.zip(spatialPt,
      Gen.chooseNum(1L, 100L), Gen.chooseNum(1L, 100L))
    forSamples(Gen.zip(
      Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, rectGen)),
      Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, rectGen))), 8) {
      case (ra, rb) =>
        val as = ra.zipWithIndex.map { case (((x, y), wx, wy), i) =>
          (i.toLong, x, y, wx, wy) }
        val bs = rb.zipWithIndex.map { case (((x, y), wx, wy), i) =>
          (100L + i, x, y, wx, wy) }
        val got = graft.operators.Spatial.rectOverlapJoin(
            as.toDF("a_id", "ax", "ay", "awx", "awy"),
            bs.toDF("b_id", "bx", "by", "bwx", "bwy"), 100L)
          .collect().map(w => w.getAs[Long]("a_id") ->
            (w.getAs[Long]("n_overlaps"), w.getAs[Long]("id_checksum"))).toMap
        as.foreach { case (aid, ax, ay, awx, awy) =>
          val hit = bs.filter { case (_, bx, by, bwx, bwy) =>
            math.abs(ax - bx) <= awx + bwx && math.abs(ay - by) <= awy + bwy }
          assert(got(aid) == ((hit.length.toLong, hit.map(_._1).sum)),
            s"a=$aid: multi-cell overlaps must be counted exactly once")
        }
    }
  }
}
