package graft

import graft.operators.{Multimodal, Text}
import org.apache.spark.sql.functions._

/** Text-analysis + multimodal plumbing specs. */
class TextSpec extends SparkSpec {

  test("sourceQuality: rollup consistent with per-doc q41 scores") {
    val roll = Text.sourceQuality(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = Text.qualityScore(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      .select(col("source"), floor(col("quality") * 1e4 + 0.5).cast("long").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val scores = xs.map(_._2).sorted
      val r = roll(src)
      assert(r.getAs[Long]("n_docs") == scores.length.toLong)
      assert(r.getAs[Long]("mean_e4") == scores.sum / scores.length)
      val lo = scores((scores.length - 1) / 2); val hi = scores(scores.length / 2)
      assert(r.getAs[Long]("med2_e4") == lo + hi, s"median mismatch for $src")
      assert(r.getAs[Long]("n_low") == scores.count(_ < 5000L).toLong)
    }
  }
  import spark.implicits._

  test("tokensRegex splits letters/digits/punctuation BPE-ishly") {
    val out = Seq("ab12 cd, ef!").toDF("t")
      .select(Text.tokensRegex(col("t")).as("toks"))
      .head().getSeq[String](0)
    assert(out == Seq("ab", "12", "cd", ",", "ef", "!"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("tokenStats counts match a hand computation") {
    val r = Seq((1L, "en", "the cat and the hat"))
      .toDF("doc_id", "lang", "text")
    val row = r.sparkSession.emptyDataFrame
    val out = Text.tokenStats(spark, sfDir).limit(0) // schema probe
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "n_tokens", "n_distinct", "avg_token_len", "n_stopwords"))
    val stats = r.select(
      size(Text.tokens(col("text"))).as("n"),
      size(array_distinct(Text.tokens(col("text")))).as("d"),
      size(filter(Text.tokens(col("text")),
        t => t.isin(Text.StopWords.map(lit(_)): _*))).as("s")).head()
    assert(stats.getInt(0) == 5)
    assert(stats.getInt(1) == 4) // 'the' twice
    assert(stats.getInt(2) == 3) // the, and, the
  }

  test("languageId picks the language with most marker hits") {
    import spark.implicits._
    // schema-compatible with documents: needs doc_id, lang, text
    val out = Text.languageId(spark, sfDir).limit(5).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("en", "es", "fr", "de")
      .contains(r.getAs[String]("detected_lang"))))
  }

  test("tfidf ranks a doc's distinctive term above corpus-wide terms") {
    val rows = Text.tfIdfTopTerms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-doc: at most 3 rows, rank 1 has the highest tfidf
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
    }
    // a term appearing in every document cannot out-rank a rarer term
    // with the same tf: idf is monotone decreasing in df
    val byDf = rows.groupBy(_.getAs[Long]("df"))
    assert(byDf.keys.nonEmpty)
  }

  test("ngrams produces the len-n+1 sliding windows, empty when too short") {
    val df = Seq("a b c d e", "a b").toDF("t").select(Text.ngrams(split(col("t"), " "), 3).as("g"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1) == Seq.empty)
  }

  test("repetition stats: planted repetitive doc flagged, varied doc not") {
    val df = Seq(
      (1L, "spam ham " * 20 + "end", "en", "x", 83L),      // one bigram dominates
      (2L, (1 to 40).map("w" + _).mkString(" "), "en", "x", 120L) // all distinct
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Text.repetitionStats(spark, sfDir).collect()
    assert(out.nonEmpty)
    // corpus rows: fractions well-formed and the flag consistent with them
    out.foreach { r =>
      val (tb, dt) = (r.getAs[Double]("top_bigram_frac"),
        r.getAs[Double]("dup_trigram_frac"))
      assert(tb >= 0.0 && tb <= 1.0 && dt >= 0.0 && dt <= 1.0, r.toString)
      assert(r.getAs[Boolean]("repetitive") == (tb > 0.18 || dt > 0.05), r.toString)
    }
    // hand-check the scan on the planted frame via the same expressions
    val stats = df.withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        Text.runLengthScan(array_sort(Text.ngrams(col("toks"), 2))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    // "spam ham" repeated 20x: bigram "ham spam" appears 19x, "spam ham" 20x
    assert(stats(1L).getAs[Long]("max_run") == 20L)
    assert(stats(2L).getAs[Long]("max_run") == 1L)
    assert(stats(2L).getAs[Long]("n_distinct") == 39L)
  }

  test("runLengthScan: empty array scans to zeros, leading empty string counts") {
    val r = Seq((Seq.empty[String], Seq("", "a")))
      .toDF("empty", "leadingEmpty")
      .select(
        Text.runLengthScan(col("empty")).as("e"),
        Text.runLengthScan(array_sort(col("leadingEmpty"))).as("l"))
      .head()
    assert(r.getStruct(0).getAs[Long]("max_run") == 0L)
    assert(r.getStruct(0).getAs[Long]("n_distinct") == 0L)
    // "" is a genuine element, not the scan's initial state
    assert(r.getStruct(1).getAs[Long]("n_distinct") == 2L)
  }

  test("decontamination finds planted eval overlap and only that") {
    import graft.operators.Dedup
    val out = Dedup.decontaminate(spark, sfDir).collect()
    // every reported doc is a train doc sharing >= 1 five-gram with an eval doc
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 0)
      assert(r.getAs[Long]("n_shared_grams") >= 1L)
      assert(r.getAs[Long]("n_eval_docs") >= 1L)
    }
  }

  test("unigram log-prob: scores negative, rare-token doc scores lower") {
    val rows = Text.unigramLogProb(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logprob") < 0.0)
      assert(r.getAs[Boolean]("kept") ==
        (r.getAs[Double]("avg_logprob") > -3.41))
    }
  }

  test("Misra-Gries: guaranteed-heavy token survives any partitioning; bound holds") {
    // 1000 tokens: "hot" appears 200× (> 1000/(k+1) for k=9 → guaranteed),
    // filler tokens are all distinct (never guaranteed)
    val stream = (1 to 200).map(_ => "hot") ++ (1 to 800).map(i => s"w$i")
    for (seed <- Seq(1, 7, 42)) {
      // adversarial orderings: survivors may differ, the guarantee may not
      val shuffled = new scala.util.Random(seed).shuffle(stream)
      val survivors = Text.misraGries(shuffled.iterator, 9).toSet
      assert(survivors.contains("hot"),
        s"guaranteed heavy hitter evicted (seed=$seed)")
      assert(survivors.size <= 9, "counter bound violated")
    }
    // per-partition union keeps a globally-guaranteed token (pigeonhole)
    val parts = stream.grouped(250).toSeq
    val union = parts.flatMap(p => Text.misraGries(p.iterator, 9)).toSet
    assert(union.contains("hot"))
  }

  test("heavyHitters: exact top tokens, guarantee implication always true") {
    val out = Text.heavyHitters(spark, sfDir, k = 100, topN = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Boolean]("hh_ok")),
      "a guaranteed heavy hitter was not in the MG candidate union")
    assert(out.exists(_.getAs[Boolean]("guaranteed")),
      "top-10 contains no guaranteed token — the invariant is vacuous; lower k")
    // counts strictly ordered by the emitted sort
    val cnts = out.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("PII redaction removes every email/IP/phone and is idempotent") {
    val rows = Text.piiRedaction(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.contains("@"), s"email survived: $red")
      assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
      assert(r.getAs[Long]("n_emails") >= 1L && r.getAs[Long]("n_ips") >= 1L)
    }
    // idempotence: redacting already-redacted text changes nothing
    val once = Seq(("a email bob@x.com ip 10.0.0.1 tel 555-1234"))
      .toDF("t").select(Text.redactPii(col("t")).as("r1"))
      .select(col("r1"), Text.redactPii(col("r1")).as("r2")).head()
    assert(once.getString(0) == once.getString(1))
    assert(once.getString(0) == "a email <EMAIL> ip <IP> tel <PHONE>")
  }

  test("ImageIO decode recovers the exact dimensions and pixel sum encoded") {
    // exact roundtrip, no Spark: encode a known image, decode via the
    // same ImageIO path the operator uses, compare pixel-for-pixel sum
    val w = 19; val h = 13 // odd width exercises BMP row padding
    val pix = (x: Int, y: Int) => (x * 31 + y * 7) % 251
    val blob = Multimodal.encodeBmp(w, h, pix)
    assert(blob.length == 54 + ((w * 3 + 3) / 4 * 4) * h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "JDK ImageIO failed to decode the generated BMP")
    assert(img.getWidth == w && img.getHeight == h)
    var expected = 0L; var got = 0L
    for (y <- 0 until h; x <- 0 until w) {
      expected += pix(x, y)
      got += img.getRaster.getSample(x, y, 0)
    }
    assert(got == expected, "decoded raster content differs from encoded pixels")
  }

  test("media decode reports real raster dimensions and is deterministic") {
    val feats = Multimodal.decodeFeatures(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(feats.length == nDocs)
    feats.foreach { f =>
      assert(f.n_bytes > 54) // BMP header + payload
      assert(f.width == Multimodal.widthOf(f.doc_id))
      assert(f.height == Multimodal.heightOf(f.doc_id))
      assert(f.byte_sum > 0L)
    }
    val again = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(feats.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("resize halves decoded dimensions and reads true raster samples") {
    val full = Multimodal.decodeFeatures(spark, sfDir).collect()
      .map(f => f.doc_id -> f).toMap
    Multimodal.resizeStats(spark, sfDir).collect().foreach { r =>
      val f = full(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("out_w") == f.width / 2)
      assert(r.getAs[Int]("out_h") == f.height / 2)
      // resampled sum reads a strict subset of the full raster's samples
      assert(r.getAs[Long]("resampled_sum") <= f.byte_sum)
      assert(r.getAs[Long]("resampled_sum") > 0L)
    }
  }

  test("frame sampling emits ceil(blobLen/64) frames per doc") {
    val frames = Multimodal.sampleFrames(spark, sfDir)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
      sum("frame_len").as("total")).collect()
    perDoc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = Multimodal.widthOf(id); val hh = Multimodal.heightOf(id)
      val len = 54 + ((w * 3 + 3) / 4 * 4) * hh
      val n = r.getAs[Long]("n")
      assert(n == (len + 63) / 64, s"doc $id: $n frames for $len blob bytes")
      assert(r.getAs[Long]("total") == len)
    }
  }

  test("langConfusion: cells cover all docs, row shares normalize, accuracy equals the diagonal mass") {
    val rows = Text.langConfusion(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    rows.groupBy(_.getAs[String]("labelled_lang")).foreach { case (l, rs) =>
      val s = rs.map(_.getAs[Long]("row_share_ppm")).sum
      assert(math.abs(s - 1000000L) <= rs.length / 2 + 1, s"$l shares sum $s")
    }
    val diag = rows.filter(r =>
        r.getAs[String]("labelled_lang") == r.getAs[String]("detected_lang"))
      .map(_.getAs[Long]("n")).sum
    val acc = math.floor(diag.toDouble / nDocs * 1e6 + 0.5).toLong
    assert(rows.forall(_.getAs[Long]("accuracy_ppm") == acc))
    assert(diag > 0, "the marker detector must get something right")
  }

  test("vocabCoverage: hand-replay of the top-100 vocab and per-lang OOV rates") {
    val rows = Text.vocabCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // rebuild the vocab and rates driver-side from the raw corpus
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ", -1).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(100).map(_._1).toSet
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val toks = ds.flatMap(_._2)
      val oov = toks.count(!vocab(_))
      lang -> ((toks.size.toLong, oov.toLong,
        math.floor(oov.toDouble / toks.size * 1e6 + 0.5).toLong))
    }
    rows.foreach { r =>
      val (tt, ov, ppm) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("total_tokens") == tt, r.toString)
      assert(r.getAs[Long]("oov_tokens") == ov, r.toString)
      assert(r.getAs[Long]("oov_ppm") == ppm, r.toString)
    }
  }

  test("bm25TopDocs: matches a driver-side Lucene-BM25 replay, same quantization") {
    val qts = Seq("spark", "join", "window")
    val rows = Text.bm25TopDocs(spark, sfDir, queryTerms = qts).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.size.toLong).sum.toDouble / n
    val dfm = qts.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, toks) =>
      val dl = toks.size.toLong
      val hits = qts.filter(t => toks.contains(t))
      val score = hits.map { t =>
        val tf = toks.count(_ == t).toLong
        val idf = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
        math.floor(idf * (tf * (1.2 + 1.0))
          / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) * 1e6 + 0.5).toLong
      }.sum
      (id, hits.size.toLong, dl, score)
    }.filter(_._2 > 0)
    val expect = scored.sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_hit"),
      r.getAs[Long]("dl"), r.getAs[Long]("score_bm25_e6")))
    assert(got.toSeq == expect.toSeq)
  }

  test("ngramNovelty: matches a driver-side 8-gram histogram replay") {
    val rows = Text.ngramNovelty(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ", -1).toSeq)
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val grams = bySource(src).flatMap(_._2.sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")))
      val hist = grams.groupBy(identity).view.mapValues(_.size).toMap
      assert(r.getAs[Long]("total_grams") == grams.size.toLong, s"$src total")
      assert(r.getAs[Long]("distinct_grams") == hist.size.toLong, s"$src distinct")
      assert(r.getAs[Long]("max_gram_occ") == hist.values.max.toLong, s"$src max")
      assert(r.getAs[Long]("novelty_ppm") ==
        math.floor(hist.size.toLong * 1000000L / grams.size.toDouble + 0.5).toLong)
    }
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet
      .filter(s => bySource(s).exists(_._2.length >= 8)))
  }

  test("nucleusVocab: matches a driver-side minimal-prefix replay per language") {
    val rows = Text.nucleusVocab(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2.split(" ", -1))).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet == byLang.keySet)
    rows.foreach { r =>
      val toks = byLang(r.getAs[String]("lang"))
      val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (t, n) => (-n, t) }
      val total = toks.length.toLong
      // minimal prefix: token selected iff mass strictly before it < 90%
      var cum = 0L; var size = 0L; var covered = 0L
      freq.foreach { case (_, n) =>
        if (cum * 100 < total * 90) { size += 1; covered = cum + n }
        cum += n
      }
      assert(r.getAs[Long]("total_tokens") == total, r.toString)
      assert(r.getAs[Long]("distinct_tokens") == freq.length.toLong)
      assert(r.getAs[Long]("vocab_p90") == size, r.toString)
      assert(r.getAs[Long]("covered_tokens") == covered, r.toString)
      // the cut actually covers >= 90% and the prefix is minimal
      assert(covered * 100 >= total * 90)
      assert((covered - freq(size.toInt - 1)._2) * 100 < total * 90)
    }
  }

  test("tokenizerFertility: per-language totals and ppm ratios replay driver-side (q4z)") {
    val rows = operators.Text.tokenizerFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val docs = graft.Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val chars = ds.map(_._2.length.toLong).sum
      val ws = ds.map(_._2.split(" ", -1).length.toLong).sum
      val reN = ds.map(d => re.findAllIn(d._2).length.toLong).sum
      val r = rows.find(_.getAs[String]("lang") == lang).get
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("n_chars") == chars)
      assert(r.getAs[Long]("ws_tokens") == ws)
      assert(r.getAs[Long]("re_tokens") == reN)
      assert(r.getAs[Long]("ws_fertility_ppm") ==
        math.floor(chars.toDouble / ws * 1e6 + 0.5).toLong)
      assert(r.getAs[Long]("re_fertility_ppm") ==
        math.floor(chars.toDouble / reN * 1e6 + 0.5).toLong)
    }
  }

  test("q8j source divergence: identical sources at 0, disjoint sources at " +
      "ln 2, uniform-overlap pair in between") {
    import spark.implicits._
    val ln2e9 = math.floor(math.log(2.0) * 1e9 + 0.5).toLong // 693147181
    val docs = Seq(
      (1L, "a b c d", "x"), (2L, "a b c d", "y"),      // identical dists
      (3L, "e f g h", "z"),                              // disjoint from all
      (4L, "a b e f", "w")                               // half-overlapping
    ).toDF("doc_id", "text", "source")
    val rows = Text.sourceDivergenceOf(docs, topK = 10).collect()
    val byPair = rows.map(r => (r.getAs[String]("src_a"),
      r.getAs[String]("src_b")) -> r).toMap
    assert(byPair.size == 6, "4 sources must yield C(4,2)=6 pairs")
    assert(byPair(("x", "y")).getAs[Long]("jsd_e9") == 0L)
    // zero-shared-token pairs MUST be present, at the ln 2 maximum
    val xz = byPair(("x", "z"))
    assert(xz.getAs[Long]("n_shared") == 0L)
    assert(xz.getAs[Long]("jsd_e9") == ln2e9)
    val wx = byPair(("w", "x"))
    assert(wx.getAs[Long]("n_shared") == 2L)
    assert(wx.getAs[Long]("jsd_e9") > 0L && wx.getAs[Long]("jsd_e9") < ln2e9)
    // matrix totals ride every row
    assert(rows.head.getAs[Long]("n_pairs") == 6L)
    assert(rows.head.getAs[Long]("max_jsd_e9") == ln2e9)
    assert(rows.head.getAs[Long]("min_jsd_e9") == 0L)
  }

  test("q8n distinguishing terms: rank-1 z replayed driver-side from exact " +
      "counts; |z| non-increasing; Dirichlet counts consistent") {
    val rows = Text.distinguishingTerms(spark, sfDir).collect()
    assert(rows.length == 12)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 12))
    val zs = rows.map(r => math.abs(r.getAs[Long]("z_e6"))).toSeq
    assert(zs == zs.sorted.reverse, "|z| must be non-increasing")
    val top = rows.head
    val (src, tok) = (top.getAs[String]("source"), top.getAs[String]("token"))
    // exact integer counts recomputed independently
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
    val cI = toks.filter(col("source") === src && col("t") === tok).count()
    val nI = toks.filter(col("source") === src).count()
    val cTot = toks.filter(col("t") === tok).count()
    val n = toks.count()
    val v = toks.select("t").distinct().count()
    assert(top.getAs[Long]("c_i") == cI && top.getAs[Long]("n_i") == nI)
    assert(top.getAs[Long]("c_r") == cTot - cI)
    assert(top.getAs[Long]("v") == v && top.getAs[Long]("n") == n)
    val cR = cTot - cI
    val z = (math.log((cI + 1).toDouble / (nI + v - cI - 1))
      - math.log((cR + 1).toDouble / (n - nI + v - cR - 1))) /
      math.sqrt(1.0 / (cI + 1) + 1.0 / (cR + 1))
    assert(top.getAs[Long]("z_e6") == math.floor(z * 1e6 + 0.5).toLong,
      "rank-1 z must replay exactly from integer counts")
  }

  test("q9b lm perplexity: trained language sits at the low-perplexity " +
      "head; totals conserve; model is total over its domain") {
    val df = Text.lmPerplexity(spark, sfDir)
    val rows = df.collect()
    val docs = Tables.documents(spark, sfDir)
    // every fixture doc has >= 2 tokens, so scoring is total
    rows.foreach { r =>
      assert(r.getAs[Long]("n_scored") == r.getAs[Long]("n_docs"),
        s"${r.getAs[String]("lang")}: docs dropped from scoring")
      assert(r.getAs[Long]("min_ce_e6") <= r.getAs[Long]("mean_ce_e6"))
      assert(r.getAs[Long]("mean_ce_e6") <= r.getAs[Long]("max_ce_e6"))
      assert(r.getAs[Long]("n_head") <= r.getAs[Long]("n_scored"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // bigram mass conserves: sum over langs == sum over docs of (n_tok - 1)
    val expectBigrams = docs
      .select(org.apache.spark.sql.functions.expr(
        "sum(greatest(size(split(text, ' ')) - 1, 0))")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_bigrams")).sum == expectBigrams)
    // the CCNet contract: the language the model was trained on must
    // have strictly the lowest mean cross-entropy AND strictly the
    // highest head retention — otherwise the gate selects the wrong mass
    val en = rows.find(_.getAs[String]("lang") == "en").get
    rows.filter(_.getAs[String]("lang") != "en").foreach { r =>
      assert(en.getAs[Long]("mean_ce_e6") < r.getAs[Long]("mean_ce_e6"),
        s"en not lowest-perplexity vs ${r.getAs[String]("lang")}")
      assert(en.getAs[Long]("head_ppm") > r.getAs[Long]("head_ppm"),
        s"en not highest head retention vs ${r.getAs[String]("lang")}")
    }
    // cutoff binds somewhere: head retention strictly inside (0, 1)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("head_ppm")
      assert(ppm > 0L && ppm < 1000000L, "cutoff does not discriminate")
    }
  }

  test("q8j on the fixture: bounds, spine completeness, ranked ordering") {
    val rows = Text.sourceDivergence(spark, sfDir).collect()
    val nSrc = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows.head.getAs[Long]("n_pairs") == nSrc * (nSrc - 1) / 2,
      "every source pair must appear exactly once")
    val jsds = rows.map(_.getAs[Long]("jsd_e9")).toSeq
    assert(jsds == jsds.sorted.reverse)
    rows.foreach { r =>
      assert(r.getAs[Long]("jsd_e9") >= 0L)
      assert(r.getAs[Long]("jsd_e9") <= 693147181L)
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
    }
  }

  test("q9f bpe pairs: top-1 merge candidate replays against a driver-side " +
      "vocabulary walk; ranks and totals are consistent") {
    val rows = Text.bpeMergeCandidates(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val occs = rows.map(_.getAs[Long]("n_occ")).toSeq
    assert(occs == occs.sorted.reverse, "candidates must be frequency-ranked")
    // driver-side replay: vocabulary with counts, then weighted char pairs
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("count"))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    vocab.foreach { case (tok, cnt) =>
      tok.sliding(2).filter(_.length == 2).foreach { pr =>
        val key = (pr.substring(0, 1), pr.substring(1, 2))
        pairCounts(key) = pairCounts.getOrElse(key, 0L) + cnt
      }
    }
    val (bestPair, bestCnt) = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head
    val top = rows.head
    assert((top.getAs[String]("a"), top.getAs[String]("b")) == bestPair,
      "top merge candidate diverged from the driver replay")
    assert(top.getAs[Long]("n_occ") == bestCnt)
    assert(top.getAs[Long]("n_distinct_pairs") == pairCounts.size)
    assert(top.getAs[Long]("total_pair_occ") == pairCounts.values.sum)
  }

  test("q9l media integrity: planted corruption is quarantined exactly, " +
      "clean blobs all decode, checksum proves the good path") {
    val rows = Multimodal.mediaIntegrity(spark, sfDir).collect()
      .map(r => r.getAs[String]("status") -> r).toMap
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val expTrunc = ids.count(_ % 97 == 0)
    val expMagic = ids.count(id => id % 97 != 0 && id % 89 == 0)
    assert(rows("truncated").getAs[Long]("n_blobs") == expTrunc)
    assert(rows("bad_magic").getAs[Long]("n_blobs") == expMagic)
    assert(!rows.contains("undecodable"),
      "well-formed fixture blobs must never reach the undecodable arm")
    assert(rows("ok").getAs[Long]("n_blobs") == ids.length - expTrunc - expMagic)
    // quarantined blobs contribute nothing to the checksum; clean ones
    // reproduce the full decode checksum of the UNCORRUPTED table
    assert(rows("truncated").getAs[Long]("pixel_checksum") == 0L)
    assert(rows("bad_magic").getAs[Long]("pixel_checksum") == 0L)
    val cleanSum = Multimodal.decodeFeatures(spark, sfDir).toDF()
      .join(Tables.documents(spark, sfDir).select("doc_id"), "doc_id")
      .where(col("doc_id") % 97 =!= 0 && col("doc_id") % 89 =!= 0)
      .agg(sum("byte_sum")).head().getLong(0)
    assert(rows("ok").getAs[Long]("pixel_checksum") == cleanSum,
      "clean-path checksum must equal the unguarded decoder on the same ids")
  }

  test("q9y bpe trainer loop: 4 merge rounds replay driver-side (picks, " +
      "weighted mass, symbol arity); every round reaches merge fixpoint") {
    val rows = Text.bpeTrainerLoop(spark, sfDir).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("round")).toSeq == (1L to 4L))
    // independent replay: Java String.replace has the same
    // left-to-right non-overlapping semantics as SQL replace
    var vocab: Map[String, Long] = Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (tok, occ) =>
        (" " + tok.toCharArray.mkString(" ") + " ", occ.length.toLong)
      }
    rows.foreach { r =>
      val pairCounts = vocab.toSeq.flatMap { case (sym, cnt) =>
        val syms = sym.trim.split(" ", -1)
        syms.zip(syms.drop(1)).map(p => (p, cnt))
      }
      val byPair = pairCounts.groupBy(_._1).view
        .mapValues(v => (v.map(_._2).sum, v.size.toLong)).toMap
      val ((a, b), (nOcc, nTypes)) = byPair.toSeq
        .sortBy { case ((x, y), (n, _)) => (-n, x, y) }.head
      assert(r.getAs[String]("a") == a && r.getAs[String]("b") == b,
        s"round ${r.getAs[Long]("round")} pick diverged")
      assert(r.getAs[Long]("n_occ") == nOcc)
      assert(r.getAs[Long]("n_types") == nTypes)
      assert(r.getAs[String]("merged") == a + b)
      val pat = s" $a $b "; val rep = s" $a$b "
      vocab = vocab.toSeq.map { case (sym, cnt) =>
        (sym.replace(pat, rep).replace(pat, rep).replace(pat, rep), cnt)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(r.getAs[Boolean]("merge_complete"),
        s"round ${r.getAs[Long]("round")} did not reach fixpoint in 3 passes")
      assert(vocab.keys.forall(!_.contains(pat)),
        "replay disagrees with the operator's fixpoint claim")
      val mass = vocab.toSeq
        .map { case (s, c) => s.trim.split(" ", -1).length.toLong * c }.sum
      assert(r.getAs[Long]("total_weighted_symbols") == mass)
      val arity = vocab.keys.flatMap(_.trim.split(" ", -1)).toSet.size.toLong
      assert(r.getAs[Long]("distinct_symbols") == arity)
    }
  }

  test("qa1 bpe encode: per-language compression replays from the " +
      "driver-side trained vocabulary; encoding conserves token counts") {
    val rows = Text.bpeEncode(spark, sfDir).collect()
    // replay the 4-round trainer exactly as the q9y spec does
    var vocab: Map[String, Long] = Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (tok, occ) =>
        (" " + tok.toCharArray.mkString(" ") + " ", occ.length.toLong)
      }
    (1 to 4).foreach { _ =>
      val byPair = vocab.toSeq.flatMap { case (sym, cnt) =>
        val syms = sym.trim.split(" ", -1)
        syms.zip(syms.drop(1)).map(p => (p, cnt))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val (a, b) = byPair.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head._1
      val pat = s" $a $b "; val rep = s" $a$b "
      vocab = vocab.map { case (sym, cnt) =>
        (sym.replace(pat, rep).replace(pat, rep).replace(pat, rep), cnt)
      }
    }
    val symsOf = vocab.keys
      .map(sym => sym.trim.replace(" ", "") -> sym.trim.split(" ", -1).length.toLong)
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), t)))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == docs.length.toLong,
      "every corpus token must be encodable (vocab closure)")
    docs.groupBy(_._1).foreach { case (lang, toks) =>
      val r = rows.find(_.getAs[String]("lang") == lang).get
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      val chars = toks.map(_._2.length.toLong).sum
      val bpe = toks.map(t => symsOf(t._2)).sum
      assert(r.getAs[Long]("n_chars") == chars, s"$lang chars")
      assert(r.getAs[Long]("bpe_symbols") == bpe, s"$lang symbols")
      assert(r.getAs[Long]("compression_ppm") == bpe * 1000000L / chars)
      // merges only ever shrink: symbols never exceed characters
      assert(bpe <= chars)
    }
  }

  test("q9t score calibration: bins, rates and ECE replay driver-side from " +
      "raw text; both label classes are populated") {
    val rows = Text.scoreCalibration(spark, sfDir).collect()
    assert(rows.length == 10, "fixed 10-bin reliability frame")
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    case class D(score: Long, y: Long)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").collect().map { r =>
        val text = r.getString(1); val nChars = r.getLong(2)
        val toks = text.split(" ", -1)
        val n = toks.length.toDouble
        val diversity = toks.distinct.length.toDouble / n
        val stop = toks.count(Set("the", "a", "of", "and", "to", "in")).toDouble / n
        val lengthOk = if (nChars >= 100) 1.0 else nChars / 100.0
        val score = math.floor((lengthOk * 0.4 + diversity * 0.4
          + math.min(stop * 5.0, 1.0) * 0.2) * 1e4 + 0.5).toLong
        val mx = toks.groupBy(identity).values.map(_.length).max.toLong
        D(score, if (mx * 10 < toks.length.toLong) 1L else 0L)
      }
    val ys = docs.map(_.y).toSet
    assert(ys == Set(0L, 1L), "label must be mixed on the fixture")
    val byBin = docs.groupBy(d => math.min(d.score / 1000, 9L))
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val in = byBin.getOrElse(bin, Array.empty[D])
      assert(r.getAs[Long]("n") == in.length.toLong, s"bin $bin count")
      assert(r.getAs[Long]("n_pos") == in.map(_.y).sum, s"bin $bin positives")
      if (in.nonEmpty) {
        assert(r.getAs[Long]("conf_ppm") == in.map(_.score).sum * 100 / in.length)
        assert(r.getAs[Long]("pos_ppm") == in.map(_.y).sum * 1000000L / in.length)
      } else {
        assert(r.getAs[Long]("conf_ppm") == 0L && r.getAs[Long]("pos_ppm") == 0L)
      }
    }
    val nTotal = docs.length.toLong
    val ece = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("gap_ppm")).sum / nTotal
    assert(rows.head.getAs[Long]("n_total") == nTotal)
    assert(rows.head.getAs[Long]("ece_ppm") == ece, "ECE replay diverged")
  }

  test("invertedIndexQuery: rarest-first trace shrinks monotonically and matches a direct AND scan") {
    val terms = Seq("dup", "vector", "batch")
    val rows = Text.invertedIndexQuery(spark, sfDir, terms).collect()
    assert(rows.length == terms.length)
    // ranks are rarest-first and the candidate trace can only shrink
    val dfs = rows.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a <= b },
      "steps must be ordered by ascending df")
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b },
      "adding a conjunct can only shrink the candidate set")
    // step 1 IS the rarest posting list; the answer rides every row
    assert(cands.head == dfs.head)
    assert(rows.map(_.getAs[Long]("n_results")).distinct.toSeq ==
      Seq(cands.last))
    // ground truth: a direct contains-all-terms corpus scan
    val truth = graft.Tables.documents(spark, sfDir)
      .where(terms.map(t =>
        org.apache.spark.sql.functions.array_contains(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " "), t))
        .reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0))
    assert(rows.head.getAs[Long]("n_results") == truth.length.toLong)
    assert(rows.head.getAs[Long]("result_checksum") == truth.sum)
  }

  test("keyframes: detection recovers exactly the planted scene cuts") {
    val rows = Multimodal.keyframes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, ns, nk) = (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_scenes"), r.getAs[Long]("n_keyframes"))
      assert(nf == 8L + r.getAs[Long]("doc_id") % 9L)
      assert(ns == (nf + 3L) / 4L, "scenes are ceil(frames/4) by construction")
      assert(r.getAs[Boolean]("cuts_recovered"),
        s"video ${r.getAs[Long]("doc_id")}: detected $nk keyframes, planted $ns scenes")
      // every detected cut cleared the threshold; frame 0 contributes 0
      assert(r.getAs[Long]("sum_cut_hamming") > (nk - 1L) * 16L)
    }
  }

  test("qbs retrieval recall: verbatim queries come back; flags consistent; candidates bounded") {
    val rows = operators.Text.retrievalRecall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gold_rank")
      assert(r.getAs[Boolean]("hit_at_1") == (g == 1L))
      assert(r.getAs[Boolean]("hit_at_5") == (g >= 1L && g <= 5L))
      assert(r.getAs[Long]("n_cands") <= 200L,
        "df-cap must bound the candidate set")
    }
    // a verbatim 8-token span must retrieve its source inside the top 5
    // for every query (rank >1 only via exact-duplicate docs, which tie)
    val at5 = rows.count(_.getAs[Boolean]("hit_at_5"))
    assert(at5 == rows.length, s"recall@5 must be total ($at5/${rows.length})")
    val at1 = rows.count(_.getAs[Boolean]("hit_at_1"))
    assert(at1 * 10 >= rows.length * 7, s"recall@1 must dominate ($at1/${rows.length})")
  }

  test("qbr Kneser-Ney: quarter-integer probabilities sum to one; counts audit holds") {
    import org.apache.spark.sql.functions._
    val rows = operators.Text.knSmoothing(spark, sfDir).collect()
    assert(rows.length == 15, "5 contexts x top-3 continuations")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("mass_ok"),
        s"count identity must hold for ${r.getAs[String]("context")}")
      // discounting: the KN estimate never exceeds the raw MLE, and the
      // top continuation has positive probability
      val pE6 = r.getAs[Long]("p_e6")
      assert(pE6 > 0L)
      val mleE6 = r.getAs[Long]("c_ab") * 1000000L / r.getAs[Long]("c_a")
      assert(pE6 <= mleE6 + r.getAs[Long]("backoff_e6"),
        "KN = discounted MLE + backoff share")
    }
    // ranks are 1..3 per context, ordered by p
    rows.groupBy(_.getAs[String]("context")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.map(-_.getAs[Long]("p_e6")).toSeq ==
        sorted.map(-_.getAs[Long]("p_e6")).sorted.toSeq)
    }
  }

  test("qbp FIM transform: lossless segmentation, parity modes, sentinel accounting") {
    import org.apache.spark.sql.functions._
    val rows = operators.Text.fimTransform(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val n = docs(r.getAs[Long]("doc_id")).length.toLong
      val (p, m, s) = (r.getAs[Long]("plen"), r.getAs[Long]("mlen"),
        r.getAs[Long]("slen"))
      assert(p + m + s == n, "segments must partition the document")
      assert(r.getAs[Boolean]("reconstructed_ok"))
      assert(r.getAs[Long]("emitted_len") == n + 15L,
        "emitted = original + three 5-char sentinels")
      assert(m > 0L, "middle span must be non-empty (b_pct > a_pct + 10)")
      assert(r.getAs[String]("mode") ==
        (if (r.getAs[Long]("doc_id") % 2 == 0) "psm" else "spm"))
      val head = r.getAs[String]("middle_head")
      // middle_head really is the middle span's start at offset plen
      assert(docs(r.getAs[Long]("doc_id"))
        .substring(p.toInt, math.min(n, p + math.min(12L, m)).toInt)
        .startsWith(head.take(3)))
    }
  }

  test("qcg HOF DP: in-array Kadane equals the literal fold; no explode, no window, no shuffle before the final agg") {
    import org.apache.spark.sql.functions._
    val df = operators.Text.hofMaxSpan(spark, sfDir)
    // plan shape: per-document DP is a projection — the only Exchange
    // is the final per-source aggregation; no Generate, no Window
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.isEmpty, "DP must not explode the token array")
    assert(opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "DP must not need a window")
    val rows = df.collect().map(r => r.getAs[String]("source") -> r).toMap
    // literal Kadane in plain Scala off the raw text
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def kadane(text: String): Long = {
      val s = text.split(" ", -1).map(t => t.length.toLong * 2 - 7)
      var best = Long.MinValue; var cur = 0L
      s.foreach { x => cur = math.max(x, cur + x); best = math.max(best, cur) }
      best
    }
    val truth = docs.groupBy(_._1).map { case (src, ds) =>
      val bs = ds.map(d => kadane(d._2))
      src -> (ds.length.toLong, bs.max, bs.sum, bs.count(_ > 0L).toLong)
    }
    assert(rows.keySet == truth.keySet && rows.nonEmpty)
    truth.foreach { case (src, (n, mx, sm, np)) =>
      val r = rows(src)
      assert(r.getAs[Long]("n_docs") == n, src)
      assert(r.getAs[Long]("best_max") == mx, src)
      assert(r.getAs[Long]("best_sum") == sm, src)
      assert(r.getAs[Long]("n_positive") == np, src)
    }
    // the fixture must exercise both signs at the token level (resets
    // actually fire inside the fold; every doc netting positive is fine)
    val toks = docs.flatMap(_._2.split(" ", -1).map(_.length.toLong * 2 - 7))
    assert(toks.exists(_ < 0L) && toks.exists(_ > 0L),
      "need negative and positive token scores for the reset arm")
  }
}
