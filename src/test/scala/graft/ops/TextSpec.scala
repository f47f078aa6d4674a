package graft.ops

import graft.SparkSpec

class TextSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("fingerprints: exact is whitespace/case-insensitive; canon is word-order-insensitive") {
    val d = docs(
      (1, "Hello   World"),
      (2, "hello world"),
      (3, "world hello"),
      (4, "entirely different"))
    val fp = Text.fingerprints(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1)._1 == fp(2)._1, "exact fp ignores case/whitespace")
    assert(fp(2)._1 != fp(3)._1, "exact fp respects word order")
    assert(fp(2)._2 == fp(3)._2, "canon fp ignores word order")
    assert(fp(2)._2 != fp(4)._2)
  }

  test("tfidf: corpus-rare terms outrank ubiquitous ones") {
    val d = docs(
      (1, "alpha beta beta"),
      (2, "alpha gamma"),
      (3, "alpha delta"))
    val top = Text.tfidf(d, topK = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "alpha" appears in every doc (df=3, idf minimal); each doc's rare term
    // wins its top slot
    assert(top == Map(1L -> "beta", 2L -> "gamma", 3L -> "delta"))
  }

  test("tfidf partial top-k == rank-window spelling, with fewer shuffled rows") {
    val d = graft.Tables.documents(spark, sf())
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    // row-identical output (same ranking comparator)
    assert(rows(Text.tfidf(d)) == rows(Text.tfidfWindowed(d)))
    // and the aggregator path shuffles fewer records: the map-side combine
    // trims each (doc, partition) to <= k rows where the window shuffles
    // every (doc, term) pair
    def shuffled(df: org.apache.spark.sql.DataFrame): Long = {
      var records = 0L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            records += t.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        df.count()
        // listener bus is async; poll until the metric stabilizes
        var last = -1L
        var spins = 0
        while (records != last && spins < 50) { last = records; Thread.sleep(100); spins += 1 }
        records
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val agg = shuffled(Text.tfidf(d))
    val win = shuffled(Text.tfidfWindowed(d))
    assert(agg < win, s"partial top-k should shuffle fewer records ($agg vs $win)")
  }

  test("repetition: duplicate-2gram mass and immediate repeats") {
    val d = docs(
      (1, "a b a b a b"),   // 2-grams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
      (2, "x x x y"),       // xx,xx,xy -> 1 dup; immediate repeats at i=1,2
      (3, "all words differ here"),
      (4, "solo"))          // < 2 tokens -> dropped
    val r = Text.repetition(d).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4))).toMap
    assert(r(1) == ((5L, 3L, 0.6, 0L)))
    assert(r(2) == ((3L, 1L, 0.333333, 2L)))
    assert(r(3) == ((3L, 0L, 0.0, 0L)))
    assert(!r.contains(4L))
  }

  test("stats: token counts and ratios") {
    val d = docs((1, "the cat the dog"))
    val r = Text.stats(d).collect().head
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Double]("stop_ratio") == 0.5) // two "the" of four
    assert(r.getAs[Double]("uniq_ratio") == 0.75) // the,cat,dog
  }

  test("token counts: BPE-ish regex splits letters/digits/symbols") {
    val d = docs((1, "abc123 x!y"))
    val r = Text.tokenCounts(d).collect().head
    assert(r.getAs[Long]("n_ws_tokens") == 2)
    // abc | 123 | x | ! | y
    assert(r.getAs[Long]("n_bpe_tokens") == 5)
  }

  test("langid: picks the language with most stopword hits, deterministic ties") {
    val d = docs((1, "el la de y es"), (2, "der die und das ist"))
    val out = Text.langId(d).collect().map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(out(1) == "es")
    assert(out(2) == "de")
  }

  test("quality: long stopword-bearing diverse docs keep, short ones drop") {
    val keepText = (1 to 90).map(i => if (i % 5 == 0) "the" else s"w$i").mkString(" ")
    val d = docs((1, keepText), (2, "x x"))
    val out = Text.quality(d).collect().map(r => r.getLong(0) -> r.getAs[String]("verdict")).toMap
    assert(out(1) == "keep")
    assert(out(2) == "drop")
  }

  test("gopher rules: each rule trips on its own fixture, clean prose passes") {
    val good = (("the quick brown fox jumps over that lazy dog with " * 6) +
      "words have been plentiful here today friends").trim // 64 words, sane lengths
    val d = docs(
      (1, good),
      (2, "the of and"), // too short: r_word_count
      (3, ("aa " * 60 + "the of that have").trim), // mean word length < 3: r_word_length
      (4, (("the fox # of # dog # " * 10) + "that have").trim), // #-heavy: r_symbol_ratio
      (5, (1 to 10).map(i => s"- the item $i of that list have").mkString("\n")), // all bullets
      (6, (1 to 10).map(i => s"the story $i of that have trails off...").mkString("\n")), // all ellipses
      (7, (("1 2 3 4 5 6 7 8 9 10 " * 6) + "the of that have").trim), // digits: r_alpha_words
      (8, ("lorem ipsum dolor sit amet " * 12).trim)) // no required stopwords: r_stop_words
    val out = Text.gopherRules(d).collect().map { r =>
      r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))
    }.toMap
    assert(out(1) == (true, true, true, true, true, true, true, true), s"clean prose: ${out(1)}")
    assert(!out(2)._1, "word-count rule trips on a 3-word doc")
    assert(!out(3)._2, "word-length rule trips on 2-char tokens")
    assert(!out(4)._3, "symbol-ratio rule trips on #-heavy text")
    assert(!out(5)._4, "bullet-lines rule trips when 100% of lines are bulleted")
    assert(!out(6)._5, "ellipsis-lines rule trips when 100% of lines trail off")
    assert(!out(7)._6, "alpha-words rule trips on digit-dominated text")
    assert(!out(8)._7, "stop-words rule trips without the required stopwords")
    out.filterNot(_._1 == 1L).foreach { case (id, flags) =>
      assert(!flags._8, s"doc $id must fail overall")
    }
  }

  test("lm score: negative conditional log-likelihoods; repeated text outscores one-off") {
    val d = docs(
      (1L, "alpha beta gamma alpha beta gamma alpha beta gamma"),
      (2L, "alpha beta gamma alpha beta gamma alpha beta gamma"),
      (3L, "unique words that appear once only here today"),
      (4L, "x")) // single token: no bigrams, excluded
    val out = Text.lmScore(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(4L), "a 1-token doc has no bigrams")
    out.values.foreach { case (n, ll) => assert(n > 0 && ll < 0.0) }
    // identical docs score identically; well-predicted transitions beat one-offs
    assert(out(1L) == out(2L))
    assert(out(1L)._2 > out(3L)._2,
      s"repeated bigrams must be more likely: ${out(1L)._2} vs ${out(3L)._2}")
  }

  test("PII scrub redacts emails, IPv4s and long digit runs, counting matches") {
    val d = docs(
      (1L, "contact alice.smith+news@example.co.uk or bob@host.org today"),
      (2L, "server at 10.0.255.7 responded; port note 8.8.8.8 ok"),
      (3L, "card 4111111111111111 and ssn 123456789 but year 2024 stays"),
      (4L, "nothing sensitive here at all"),
      // overlapping rules: the digit run sits INSIDE the email match — one
      // placeholder inserted, so n_redactions must be 1, not 2
      (5L, "reach 123456789ab@example.com asap"))
    val out = Text.scrub(d, "text").collect()
      .map(r => (r.getLong(0), r.getAs[String]("scrubbed"), r.getAs[Long]("n_redactions")))
      .sortBy(_._1)
    assert(out(0)._2 == "contact <EMAIL> or <EMAIL> today" && out(0)._3 == 2L)
    assert(out(1)._2 == "server at <IP> responded; port note <IP> ok" && out(1)._3 == 2L)
    assert(out(2)._2 == "card <NUM> and ssn <NUM> but year 2024 stays" && out(2)._3 == 2L)
    assert(out(3)._2 == "nothing sensitive here at all" && out(3)._3 == 0L)
    assert(out(4)._2 == "reach <EMAIL> asap" && out(4)._3 == 1L,
      s"overlapping rules must not double-count one redacted span: ${out(4)}")
  }
  test("normalizeText: NFC composes, space-ish runs collapse, combining marks survive") {
    import spark.implicits._
    val in = Seq(
      (1L, "e\u0301clair"),                       // decomposed -> composed U+00E9
      (2L, "a\tb\u00A0c\u200Bd"),                 // TAB/NBSP collapse; ZWSP removed between non-spaces -> space
      (3L, "  \u200B leading and trailing \r\n"), // trimmed
      (4L, "x\u200B\u030Ay"),                      // Cf removed; combining ring (Mn) kept
      (5L, "already clean")
    ).toDF("id", "text")
    val out = Text.normalizeDocs(in).select("id", "norm_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "\u00E9clair")
    assert(out(2L) == "a b c d")
    assert(out(3L) == "leading and trailing")
    assert(out(4L) == "x \u030Ay")
    assert(out(5L) == "already clean")
    // interpreted path (eval) agrees with codegen
    val e = graft.functions.NormalizeText.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString("e\u0301\t x "))
    assert(e.toString == "\u00E9 x")
  }
  test("lmScoreFromModel on the model's own corpus == lmScore; unseen bigrams smoothed") {
    val c = docs(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a bird flew over the log"))
    val self = Text.lmScoreFromModel(c, Text.lmModel(c)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val direct = Text.lmScore(c).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(self == direct)
    // an increment with bigrams the model never saw still scores (Laplace
    // mass (0+1)/(0+V)), and scores BELOW an in-model document
    val inc = docs((9L, "entirely novel words here"))
    val scored = Text.lmScoreFromModel(inc, Text.lmModel(c)).collect()
    assert(scored.length == 1)
    val novel = scored(0).getDouble(2)
    assert(novel < direct.head._3, s"novel=$novel vs in-model=${direct.head._3}")
  }
  test("contentType: code, math and prose fixtures each land in their class") {
    val c = docs(
      (1L, "def f(x) {\n  return g(x);\n  }\n  var y = [1, 2];"),  // braces/semis + indent
      (2L, "1+2=3 4*5=20 6/2=3 7-1=6 2^4=16 9+9=18 3*3=9 8/4=2"),     // operator-dense
      (3L, "the quick brown fox jumps over the lazy dog in the usual way"))
    val out = Text.contentType(c).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(out(1L) == "code", out.toString)
    assert(out(2L) == "math", out.toString)
    assert(out(3L) == "prose", out.toString)
  }

  test("bm25: hand-computed score on a 3-doc fixture, rarity outranks raw tf") {
    // q = {spark}: doc 1 has tf=1/len=2, doc 2 tf=2/len=4, doc 3 tf=0
    val d = docs(
      (1, "spark rocks"),
      (2, "spark spark other words"),
      (3, "plain text here"))
    val out = Text.bm25(d, queryTerms = Seq("spark"), topK = 10).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L), "doc 3 has no query term")
    val n = 3.0; val df = 2.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val avgdl = (2 + 4 + 3) / 3.0
    def s(tf: Double, dl: Double) = BigDecimal(
      idf * (tf * (Text.Bm25K1 + 1)) /
        (tf + Text.Bm25K1 * (1.0 - Text.Bm25B + Text.Bm25B * dl / avgdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == s(1, 2), s"doc1 ${out(1L)._1} vs ${s(1, 2)}")
    assert(out(2L)._1 == s(2, 4), s"doc2 ${out(2L)._1} vs ${s(2, 4)}")
    // doc 2's double tf beats doc 1 despite longer length at b=0.75
    assert(out(2L)._2 == 1L && out(1L)._2 == 2L)
  }

  test("bm25: ranks are dense 1..k ordered by (score desc, doc_id) and k caps output") {
    val d = docs((1L to 30L).map(i => i -> s"spark doc number $i"): _*)
    val out = Text.bm25(d, queryTerms = Seq("spark"), topK = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to 5L))
    // identical texts → identical scores → doc_id breaks the tie
    assert(out.map(_.getLong(0)).sorted.toSeq == (1L to 5L))
  }

  test("bm25: plan broadcasts the tiny sides, no cartesian product") {
    val plan = Text.bm25(docs((1, "spark a"), (2, "b c")), Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "totals/df must broadcast")
  }

  test("collocations: hand-computed integer lift, min-count gate, ordering") {
    // tokens: big×2 apple×3 pie×1 → tot=6
    // bigrams: (big,apple)×2 (apple,big)×1 (apple,pie)×1; minCount=2 keeps one
    val out = Text.collocations(
      docs((1L, "big apple big apple"), (2L, "apple pie")), minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // lift = ((2*1e6) div c_big) * tot div c_apple = 1e6 * 6 div 3 = 2e6
    assert(out.toSeq == Seq(("big", "apple", 2L, 2000000L)))
  }

  test("collocations: a high-lift pair out-ranks a frequent-but-independent pair") {
    // "san francisco" always together (pure collocation); "the cat" where
    // both words also occur alone in many contexts (low association)
    val filler = (10L to 19L).map(i => i -> "the dog the bird cat alone")
    val d = docs(Seq(
      1L -> "san francisco san francisco san francisco",
      2L -> "san francisco san francisco",
      3L -> "the cat the cat the cat the cat the cat").++(filler): _*)
    val rows = Text.collocations(d, minCount = 5, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.indexOf(("san", "francisco")) == 0 ||
      rows.indexOf(("francisco", "san")) == 0)
    assert(rows.contains(("the", "cat")))
  }
}
