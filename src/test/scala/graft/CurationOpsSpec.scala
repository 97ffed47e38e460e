package graft

import graft.ext.TextOps
import graft.functions.{GraftFunctions, ShingleExplode, WordGrams}
import org.apache.spark.sql.functions._

/** Corpus-curation operators (repetition scoring, quality filter, PII
  * redaction) and the native Generator (UDTF) surface. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionScores: repeated text scores high top-gram share, low distinct ratio") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "all six tokens here are different"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionScores(df, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    // doc 1: five identical 2-grams "spam spam" → share 1.0; 1 distinct of 6 tokens
    out(0) shouldBe ((1L, 5L, 1.0, 0.1667))
    // doc 2: every 2-gram unique → share 1/5; all tokens distinct
    out(1) shouldBe ((2L, 5L, 0.2, 1.0))
  }

  test("bpeTrainMerges/subwordCountBpe: deterministic greedy-prefix merges, bounded monotone counts, budget rank divergence") {
    val docs = graft.sources.Stores.table(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
    val m6 = TextOps.bpeTrainMerges(docs, "text", 6)
    m6.length shouldBe 6
    m6 shouldBe TextOps.bpeTrainMerges(docs, "text", 6)
    // greedy training is sequential, so a shorter table is a prefix
    m6.take(3) shouldBe TextOps.bpeTrainMerges(docs, "text", 3)
    // per doc: word count ≤ subword count ≤ non-space char count
    docs.select(
      TextOps.tokenCount(col("text")).cast("long").as("nw"),
      TextOps.subwordCountBpe(col("text"), m6).as("ns"),
      org.apache.spark.sql.functions.length(translate(col("text"), " ", ""))
        .cast("long").as("nc"))
      .filter(col("ns") < col("nw") || col("ns") > col("nc"))
      .count() shouldBe 0L
    // more merge rules never increase a doc's count
    docs.select((TextOps.subwordCountBpe(col("text"), m6) <=
        TextOps.subwordCountBpe(col("text"), m6.take(3))).as("ok"))
      .filter(!col("ok")).count() shouldBe 0L
    // the point of subword accounting: a many-short-words doc is
    // word-expensive but subword-cheap, a few-long-words doc the reverse —
    // under a fixed budget the two RANK in opposite order per scheme
    val tiny = Seq((1L, "aa aa aa aa aa aa"), (2L, "abcdefghij abcdefghij"))
      .toDF("doc_id", "text")
    val tm = TextOps.bpeTrainMerges(tiny, "text", 6)
    val counts = tiny.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("nw"),
        TextOps.subwordCountBpe(col("text"), tm).as("ns"))
      .orderBy("doc_id").collect()
    counts(0).getLong(1) should be > counts(1).getLong(1)
    counts(0).getLong(2) should be < counts(1).getLong(2)
  }

  test("bpeTrainMerges batched+sampled: disjoint rounds, greedy top-1 kept, sample reproduces full-trained counts within 5%") {
    val docs = graft.sources.Stores.table(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
    val full = TextOps.bpeTrainMerges(docs, "text", 6)
    val batched = TextOps.bpeTrainMerges(docs, "text", 6, batch = 3)
    batched.length shouldBe 6
    batched shouldBe TextOps.bpeTrainMerges(docs, "text", 6, batch = 3)
    // the round winner is always greedy's winner
    batched.head shouldBe full.head
    // within each batched round the selected pairs are token-disjoint
    // (the commutation precondition for one-pass application)
    for (round <- batched.grouped(3)) {
      val toks = round.flatMap { p =>
        val parts = p.split("\\.", -1); Seq(parts(1), parts(2))
      }
      toks.distinct.length shouldBe toks.length
    }
    // training on the deterministic half-corpus hash sample reproduces
    // full-corpus-trained token accounting within 5% — the lever that
    // makes 32k-merge training affordable (pair statistics concentrate)
    val sampled = TextOps.bpeTrainMerges(
      graft.ext.SamplingOps.hashSample(docs, "doc_id", k = 2, r = 0),
      "text", 6, batch = 3)
    sampled.length shouldBe 6
    val totals = docs.select(
        sum(TextOps.subwordCountBpe(col("text"), full)).as("tf"),
        sum(TextOps.subwordCountBpe(col("text"), sampled)).as("ts"))
      .head()
    val (tf, ts) = (totals.getLong(0).toDouble, totals.getLong(1).toDouble)
    math.abs(tf - ts) / tf should be <= 0.05
  }

  test("qualityFilter keeps only in-bounds, non-degenerate docs") {
    val df = Seq(
      (1L, "one two three four five six seven eight nine ten"),  // ok (10 toks)
      (2L, "short text"),                                        // too short
      (3L, "rep rep rep rep rep rep rep rep rep rep"),           // degenerate
      (4L, null.asInstanceOf[String]))                           // null
      .toDF("doc_id", "text")
    TextOps.qualityFilter(df, "text", minTokens = 5, maxTokens = 20,
        minDistinctRatio = 0.5)
      .select("doc_id").as[Long].collect() shouldBe Array(1L)
  }

  test("redactPii replaces every email and phone occurrence with typed tags") {
    val out = Seq("write a@b.com and c.d@mail.org or dial 555-1234 then 555-9")
      .toDF("t").select(TextOps.redactPii(col("t"))).head().getString(0)
    out shouldBe "write [EMAIL] and [EMAIL] or dial [PHONE] then [PHONE]"
  }

  test("ShingleExplode generator streams (pos, sh) identical to array explode") {
    val df = Seq((1L, "a b c d e"), (2L, "x y"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val gen = df.select(col("doc_id"), ShingleExplode(col("text"), 3))
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Long)].collect()
    val viaArray = df.select(col("doc_id"),
        posexplode(graft.ext.DedupOps.shingleHashes(col("text"), 3)))
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Long)].collect()
    gen shouldBe viaArray
    gen.map(_._1).distinct shouldBe Array(1L, 2L)   // null doc emits nothing
  }

  test("normalizeText: NFC + case + whitespace canonicalization unifies dup variants") {
    // e-acute as precomposed U+00E9 vs decomposed e + U+0301: NFC unifies;
    // case and whitespace runs collapse — all four variants hash identically
    val variants = Seq(
      "Café  du   Monde", "café du monde",
      "  CAFÉ DU MONDE ", "café\tdu\nmonde")
      .toDF("t").select(TextOps.normalizeText(col("t")).as("n"))
      .as[String].collect().toSet
    variants shouldBe Set("café du monde")
  }

  test("approxTopKWords: MG candidates + CMS counts reproduce the exact top-k") {
    val docs = graft.sources.Stores.table(spark, sf0001, "documents")
    val approx = TextOps.approxTopKWords(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = TextOps.wordFrequency(docs, "text")
      .orderBy(col("n").desc, col("word").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // at sketch width 2/eps ≫ vocabulary the estimates are exact and the
    // MG summaries hold the whole vocabulary — approx ≡ exact, proving
    // both the candidate coverage and the sketch/agg byte-consistency
    approx shouldBe exact
  }

  test("misraGries: every word above the frequency threshold survives a summary of size m") {
    // 60 tokens: "hot" ×30, "warm" ×10, twenty distinct singletons; with
    // m = 4 any word with count > 60/4 = 15 is guaranteed to survive
    val tokens = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      (0 until 20).map(i => s"w$i")
    val survivors = TextOps.misraGries(tokens.iterator, m = 4).toSet
    survivors should contain("hot")
    survivors.size should be <= 4
  }

  test("bm25TopK matches a locally computed Okapi BM25 ranking") {
    val docs = graft.sources.Stores.table(spark, sf0001, "documents")
    val terms = Seq("dup", "join", "hash")
    val got = TextOps.bm25TopK(docs, "doc_id", "text", terms, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // brute-force reference on the driver
    val corpus = docs.filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = corpus.length.toDouble
    val avgdl = corpus.map(_._2.length.toDouble).sum / n
    val dfT = terms.map(t => t -> corpus.count(_._2.contains(t)).toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    val expected = corpus.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val score = terms.foldLeft(0.0) { (acc, t) =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) acc
        else {
          val idf = math.log(1.0 + (n - dfT(t) + 0.5) / (dfT(t) + 0.5))
          acc + idf * tf * (k1 + 1.0) / (tf + (1.0 - b + (dl / avgdl) * b) * k1)
        }
      }
      (id, BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(15)
    got shouldBe expected

    // a doc containing the rare term outranks one with only common terms
    // at equal tf (idf monotonicity sanity)
    val rare = TextOps.bm25TopK(docs, "doc_id", "text", Seq("dup"), k = 5)
      .collect()
    rare.length should be > 0
  }

  test("kernel functions are SQL-registered (LATERAL VIEW generator included)") {
    GraftFunctions.register(spark)
    Seq((1L, "a b c d")).toDF("id", "text").createOrReplaceTempView("cur_docs")
    val viaSql = spark.sql(
      """SELECT id, pos, sh FROM cur_docs
         LATERAL VIEW graft_shingle_explode(text, 2) AS pos, sh
         ORDER BY pos""").as[(Long, Int, Long)].collect()
    viaSql.length shouldBe 3
    spark.sql("SELECT graft_word_grams('a b c', 2) AS g").head()
      .getSeq[String](0) shouldBe Seq("a b", "b c")
  }

  test("chunkDocuments: overlapping windows, short-tail last chunk, 1 chunk for short docs") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  // 10 toks, chunk 4 stride 2
      (2L, "a b c"),                           // shorter than one chunk
      (3L, null.asInstanceOf[String]))         // null text → no chunks
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(df, "doc_id", "text",
        chunkTokens = 4, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Int)].collect()
    // doc 1: starts 0,2,4,6 → last chunk [t6..t9] reaches the end exactly
    out.filter(_._1 == 1L).map(c => (c._2, c._3, c._4)) shouldBe Array(
      (0L, "t0 t1 t2 t3", 4), (1L, "t2 t3 t4 t5", 4),
      (2L, "t4 t5 t6 t7", 4), (3L, "t6 t7 t8 t9", 4))
    out.filter(_._1 == 2L) shouldBe Array((2L, 0L, "a b c", 3))
    out.count(_._1 == 3L) shouldBe 0
  }

  test("chunkDocuments: stride not dividing the tail yields one short final chunk") {
    val out = TextOps.chunkDocuments(
        Seq((1L, "t0 t1 t2 t3 t4")).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("chunk_id").as[(Long, Long, String, Int)].collect()
    // n=5: ceil((5-4)/3)+1 = 2 chunks; second starts at 3 → 2 tokens only
    out.map(c => (c._2, c._3, c._4)) shouldBe Array(
      (0L, "t0 t1 t2 t3", 4), (1L, "t3 t4", 2))
  }

  test("unigramLogProbs scores docs by corpus-frequency of their tokens") {
    // corpus: 8 tokens total; "common" ×4 (p=1/2), others ×1 (p=1/8)
    val df = Seq(
      (1L, "common common common common"),
      (2L, "rare1 rare2 rare3 rare4"))
      .toDF("doc_id", "text")
    val out = TextOps.unigramLogProbs(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    out(0) shouldBe ((1L, 4L,
      BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    out(1) shouldBe ((2L, 4L,
      BigDecimal(math.log(0.125)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // the common-token doc is more "typical of the corpus"
    out(0)._3 should be > out(1)._3
  }

  test("intraDocDedup keeps the first occurrence of each segment, in order") {
    val df = Seq(
      // segments of 2: [a b][c d][a b][e f] → drop the repeat, keep order
      (1L, "a b c d a b e f"),
      // no repeats → unchanged
      (2L, "x y z w"),
      // tail segment shorter than segWords still participates
      (3L, "p q p q p"))
      .toDF("doc_id", "text")
    val out = TextOps.intraDocDedup(df, "doc_id", "text", segWords = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    out(0) shouldBe ((1L, "a b c d e f", 3L, 1L))
    out(1) shouldBe ((2L, "x y z w", 2L, 0L))
    // doc 3: [p q][p q][p] → "p q p": the short tail "p" differs from "p q"
    out(2) shouldBe ((3L, "p q p", 2L, 1L))
  }

  test("importanceWeights: target-typical docs score positive, off-target negative") {
    val corpus = Seq(
      (1L, "alpha alpha beta"),    // mixed
      (2L, "alpha alpha alpha"),   // pure target-ish
      (3L, "gamma gamma gamma"))   // never in target
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha alpha alpha alpha"))
      .toDF("doc_id", "text")
    val out = TextOps.importanceWeights(corpus, target, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // alpha: common in target AND corpus → positive llr; gamma: corpus-only
    // (smoothed floor in the target LM) → negative
    out.map(_._1) shouldBe Array(1L, 2L, 3L)
    out(1)._3 should be > 0.0
    out(2)._3 should be < 0.0
    out(1)._3 should be > out(0)._3 // purer target-likeness ranks higher
    // hand-check doc 2: llr(alpha) = ln((4+1)/(4+3)) - ln((5+1)/(9+3))
    val expected = math.log(5.0 / 7.0) - math.log(6.0 / 12.0)
    out(1)._3 shouldBe BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bigramLogProbs scores docs by corpus conditional bigram probabilities") {
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // c1: a=3 b=2 c=1; c2: "a b"=2 "b a"=1 "a c"=1
    val out = TextOps.bigramLogProbs(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(0) shouldBe ((1L, 3L,
      r6((math.log(2.0 / 3) + math.log(1.0 / 2) + math.log(2.0 / 3)) / 3)))
    out(1) shouldBe ((2L, 1L, r6(math.log(1.0 / 3))))
    // the templated repeat scores higher than the one-off continuation
    out(0)._3 should be > out(1)._3
  }

  test("blocklistFilter: reports which phrases hit; clean docs keep") {
    val docs = Seq(
      (1L, "a fast spark based engine"),
      (2L, "the slow scan path with spark inside"),
      (3L, "perfectly clean content here")).toDF("doc_id", "text")
    val out = TextOps.blocklistFilter(docs, "doc_id", "text",
        phrases = Seq("slow scan", "spark", "vector"))
      .orderBy("doc_id").as[(Long, Long, String, Boolean)].collect()
    out shouldBe Array(
      (1L, 1L, "spark", false),
      (2L, 2L, "slow scan,spark", false),
      (3L, 0L, "", true))
  }

  test("langMixBySegment: code-switched docs surface as multi-label; ties break label-ascending") {
    val en10 = "the " + (1 to 9).map(_ => "word").mkString(" ")
    val de10 = "der " + (1 to 9).map(_ => "wort").mkString(" ")
    val docs = Seq(
      (1L, s"$en10 $de10"),      // one en segment + one de segment
      (2L, s"$en10 $en10 $de10"), // en dominates 2/3
      (3L, en10))                 // monolingual
      .toDF("doc_id", "text")
    val out = TextOps.langMixBySegment(docs, "doc_id", "text", segWords = 10)
      .orderBy("doc_id").as[(Long, Long, Long, String, Double)].collect()
    out(0) shouldBe ((1L, 2L, 2L, "de", 0.5)) // 1-1 tie → label asc
    out(1) shouldBe ((2L, 3L, 2L, "en", 0.666667))
    out(2) shouldBe ((3L, 1L, 1L, "en", 1.0))
  }

  test("SegmentLangIds kernel labels are identical to the expression-tree form") {
    // real corpus slice + crafted edge cases: CJK overriding stopwords,
    // multi/trailing spaces (split(' ', -1) keeps empty tokens), empty
    // string (one '' token → one unknown segment), all five languages,
    // segment boundaries that split a stopword family across segments
    val corpus = graft.sources.Stores.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val crafted = Seq(
      (1001L, "the cat sat 世界 on the mat"),   // zh beats en in segment 1
      (1002L, "der hund  und   die katze"),      // doubled spaces
      (1003L, "le chat est la "),                // trailing space, fr beats es? (la is es!)
      (1004L, ""),                               // one empty segment
      (1005L, "y"),                              // single es stopword
      (1006L, "nothing matches here at all"),
      (1007L, "the " + "x ".repeat(30) + "und")) // family split across segments
      .toDF("doc_id", "text")
    for (df <- Seq(corpus, crafted); segWords <- Seq(3, 10)) {
      val hof = TextOps.segmentLangIdsHof(df, "doc_id", "text", segWords)
        .orderBy("doc_id").as[(Long, Seq[String])].collect()
      val kern = df.filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.SegmentLangIds(col("text"), segWords).as("labels"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect()
      withClue(s"segWords=$segWords: ") { kern shouldBe hof }
    }
  }

  test("charEntropy: spam at 0, uniform alphabet at ln(k); empty/null docs drop") {
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aaab"), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextOps.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    out.map(_._1) shouldBe Array(1L, 2L, 3L)
    out(0) shouldBe ((1L, 4L, 1L, 0.0))
    // uniform over 4 chars: 4 × round(-(0.25·ln 0.25), 6) = 1.386296 ≈ ln 4
    out(1) shouldBe ((2L, 4L, 4L, 1.386296))
    // skewed 3:1 mix: 0.215762 + 0.346574
    out(2) shouldBe ((3L, 4L, 2L, 0.562336))
  }

  test("lmDirichletTopK matches a locally computed Zhai–Lafferty ranking") {
    val docsDf = graft.sources.Stores.table(spark, sf0001, "documents")
    val qtDf = docsDf.filter(col("text").isNotNull && col("doc_id") < 20)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(slice(TextOps.tokens(col("text")), 1, 5)))
          .as("term"))
    val mu = 50.0
    val got = TextOps.lmDirichletTopK(docsDf, "doc_id", "text", qtDf,
        k = 3, mu = mu)
      .orderBy("qid", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    // brute-force reference on the driver, replaying the exact rounding
    // discipline (per-term 6dp → decimal sum → one pinned penalty chain)
    val corpus = docsDf.filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val total = corpus.map(_._2.length.toDouble).sum
    val cf = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    corpus.foreach { case (_, toks) => toks.foreach(t => cf(t) += 1.0) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = corpus.filter(_._1 < 20).sortBy(_._1)
      .flatMap { case (qid, qtoks) =>
        val qterms = qtoks.take(5).distinct.filter(t => cf(t) > 0)
        val nq = qterms.length.toDouble
        val scored = corpus.flatMap { case (id, toks) =>
          val dl = toks.length.toDouble
          if (!qterms.exists(t => toks.contains(t))) None
          else {
            val ms = qterms.foldLeft(BigDecimal(0)) { (acc, t) =>
              val tf = toks.count(_ == t).toDouble
              if (tf == 0) acc
              else acc + r6(math.log(1.0 + tf * total / (mu * cf(t))))
            }
            Some((id,
              r6(ms.toDouble + nq * math.log(mu / (dl + mu))).toDouble))
          }
        }
        scored.sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
          .map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
      }
    got shouldBe expected
    got.length should be > 0
  }

  test("bm25BatchTopK: agrees with the single-query ranker; distinctive queries self-retrieve at rank 1") {
    val docs = Seq(
      (1L, "apple pie recipe with apple and sugar"),
      (2L, "apple tree orchard"),
      (3L, "stone wall construction stone"),
      (4L, "filler words about nothing relevant")).toDF("doc_id", "text")
    val qt = Seq((1L, "apple"), (1L, "pie"), (3L, "stone"), (3L, "wall"))
      .toDF("qid", "term")
    val batch = TextOps.bm25BatchTopK(docs, "doc_id", "text", qt, k = 3)
      .orderBy("qid", "rnk")
      .as[(Long, Long, Double, Long)].collect()
    // each distinctive query finds its own doc first
    batch.filter(_._4 == 1L).map(r => (r._1, r._2)) shouldBe
      Array((1L, 1L), (3L, 3L))
    // the batch ranking matches the single-query operator (same docs in
    // the same order; scores equal up to per-term rounding placement)
    val single = TextOps.bm25TopK(docs, "doc_id", "text",
        terms = Seq("apple", "pie"), k = 3)
      .as[(Long, Double)].collect()
    val q1 = batch.filter(_._1 == 1L)
    q1.map(_._2) shouldBe single.map(_._1)
    q1.map(_._3).zip(single.map(_._2)).foreach { case (a, b) =>
      a shouldBe b +- 1e-5
    }
  }

  test("featureHashVector: additive in concatenation, repeat tokens double, zeros dropped") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "beta"),
      (4L, "alpha alpha")).toDF("doc_id", "text")
    val out = TextOps.featureHashVector(docs, "doc_id", "text", dim = 16)
      .as[(Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(r => r._2 -> r._3).toMap }
      .withDefaultValue(Map.empty[Long, Long])
    // vec("alpha beta") = vec("alpha") + vec("beta"), binwise — including
    // the collision-cancellation case where the merged vector is empty
    val merged = (byDoc(2L).keySet ++ byDoc(3L).keySet).map { b =>
      b -> (byDoc(2L).getOrElse(b, 0L) + byDoc(3L).getOrElse(b, 0L))
    }.filter(_._2 != 0L).toMap
    byDoc(1L) shouldBe merged
    // a repeated token doubles its signed contribution
    byDoc(4L) shouldBe byDoc(2L).map { case (b, v) => b -> (2 * v) }
    // every |value| is bounded by the token count landing in the bin
    all(out.map(r => math.abs(r._3))) should be <= 2L
  }

  test("knLogProbs: absolute discount caps novel-context bigrams below MLE certainty") {
    // bigrams: "a b"×2, "a c"×1, "d b"×1 → ctx a:(cv=3,n1f=2) d:(cv=1,n1f=1);
    // cont b:n1b=2, c:n1b=1; B=3 types
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b"),
      (5L, "solo"), (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.ext.TextOps.knLogProbs(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // P(b|a) = (2-.75 + .75·2·(2/3))/3 = 0.75; P(c|a) = (.25 + .5)/3 = 0.25
    out(0) shouldBe ((1L, 1L, r6(math.log(0.75))))
    out(2) shouldBe ((3L, 1L, r6(math.log(0.25))))
    // the "Francisco" case: "d b" is MLE-certain (P=1) but KN discounts the
    // once-seen context to (1-.75 + .75·1·(2/3))/1 = 0.75
    out(3) shouldBe ((4L, 1L, r6(math.log(0.75))))
    // <2-token and null docs are unscorable and drop
    out.map(_._1) shouldBe Array(1L, 2L, 3L, 4L)
  }

  test("nbClassify: separable seed routes held-out docs; OOV-only doc falls back to priors") {
    val train = Seq(
      (2L, "apple apple fruit", "food"), (4L, "apple pear", "food"),
      (6L, "rock stone", "geo"))
      .toDF("doc_id", "text", "source")
    val score = Seq(
      (1L, "apple apple", "food"),   // food tokens → food
      (3L, "stone rock rock", "geo"), // geo tokens → geo
      (5L, "zzz qqq", "geo"))         // all-OOV → prior argmax (food: 2 docs)
      .toDF("doc_id", "text", "source")
    val out = graft.ext.ClassifyOps.nbClassify(train, score,
        "doc_id", "text", "source")
      .orderBy("doc_id")
      .as[(Long, String, String, Double, Double)].collect()
    out.map(r => (r._1, r._3)) shouldBe
      Array((1L, "food"), (3L, "geo"), (5L, "food"))
    // confident calls carry positive margins; OOV margin is the prior gap
    all(out.map(_._5)) should be > 0.0
    out(2)._5 shouldBe BigDecimal(math.log(2.0 / 3) - math.log(1.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 2e-6
    val conf = graft.ext.ClassifyOps.nbConfusion(train, score,
        "doc_id", "text", "source")
      .orderBy("actual", "predicted").as[(String, String, Long)].collect()
    conf shouldBe Array(("food", "food", 1L), ("geo", "food", 1L),
      ("geo", "geo", 1L))
  }

  test("nbThresholdSweep: coverage shrinks with the margin bar; empty slice has no accuracy") {
    val train = Seq(
      (2L, "apple apple fruit", "food"), (4L, "apple pear", "food"),
      (6L, "rock stone", "geo")).toDF("doc_id", "text", "source")
    val score = Seq(
      (1L, "apple apple", "food"), (3L, "stone rock rock", "geo"),
      (5L, "zzz qqq", "geo")).toDF("doc_id", "text", "source")
    val out = graft.ext.ClassifyOps.nbThresholdSweep(train, score,
        "doc_id", "text", "source", thresholds = Seq(0.0, 10.0))
      .orderBy("threshold")
      .as[(Double, Long, Long, Double, Option[Double])].collect()
    // margin >= 0 routes everything: docs 1/3 predicted right, the OOV
    // doc 5 falls to the food prior and is wrong -> 2/3 accuracy
    out(0) shouldBe ((0.0, 3L, 2L, 1.0, Some(0.666667)))
    // nothing clears a 10-nat margin: empty slice, NULL accuracy
    out(1) shouldBe ((10.0, 0L, 0L, 0.0, None))
  }

  test("bpe fertility: longer-word language bills more subwords per word") {
    val docs = Seq(
      (1L, "aa bb aa bb", "short"),
      (2L, "incomprehensibilities floccinaucinihilipilification", "long"))
      .toDF("doc_id", "text", "lang")
    val m = graft.ext.TextOps.bpeTrainMerges(docs, "text", 2)
    val fert = docs.groupBy("lang")
      .agg((sum(graft.ext.TextOps.subwordCountBpe(col("text"), m))
          .cast("double") /
        sum(graft.ext.TextOps.tokenCount(col("text")))).as("fertility"))
      .orderBy("lang").as[(String, Double)].collect()
    fert.map(_._1) shouldBe Array("long", "short")
    fert(0)._2 should be > fert(1)._2
  }

  test("tfidfTopTerms ranks rare-but-frequent-in-doc terms first") {
    val df = Seq(
      (1L, "apple apple apple common"),
      (2L, "banana banana common common"),
      (3L, "common common common common"))
      .toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Double, Long)].collect()
    // doc 1: apple tf=3 df=1 → 3·ln3 ≈ 3.296; common tf=1 df=3 → 0
    out(0)._2 shouldBe "apple"
    out(0)._4 shouldBe BigDecimal(3 * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(1)._2 shouldBe "common" // score 0, still rank 2 of the doc's 2 terms
    // doc 3 has only one distinct term → one row despite k=2
    out.count(_._1 == 3L) shouldBe 1
  }

  test("blockedFuzzyJoin pairs only within blocks and within distance") {
    val df = Seq(
      (1L, "small ring"), (2L, "small ring"), (3L, "small king"),
      (4L, "large ring"),                    // other block: never paired
      (5L, "small cog"))                     // same block, dist > 2
      .toDF("id", "name")
    val out = graft.ext.DedupOps.blockedFuzzyJoin(df, "id", "name",
        split(col("name"), " ").getItem(0), maxDist = 2)
      .orderBy("id1", "id2").as[(Long, Long, String, String, Long)].collect()
    out.map(r => (r._1, r._2, r._5)) shouldBe Array(
      (1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L))
  }

  test("blockedFuzzyJoin maxBlockSize df-caps a hot block") {
    val hot = (1L to 10L).map(i => (i, "hot name"))
    val df = (hot :+ ((20L, "cold name")) :+ ((21L, "cold namey")))
      .toDF("id", "name")
    val out = graft.ext.DedupOps.blockedFuzzyJoin(df, "id", "name",
        split(col("name"), " ").getItem(0), maxDist = 2, maxBlockSize = 5)
      .as[(Long, Long, String, String, Long)].collect()
    // the 10-row "hot" block is dropped; the 2-row "cold" block survives
    out.map(r => (r._1, r._2)) shouldBe Array((20L, 21L))
  }

  test("percentileKeepApprox: in-tolerance keep fraction, kept rows are a clean top slice") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", (i * 7 % 101).toDouble))
      .toDF("id", "stratum", "score")
    val kept = graft.ext.SamplingOps.percentileKeepApprox(
      df, "stratum", "score", q = 0.3, accuracy = 10000)
    val perStratum = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    perStratum.values.foreach { n => n.toDouble shouldBe 30.0 +- 4.0 }
    // threshold filters can never interleave: min kept ≥ max dropped
    val dropped = df.join(kept.select("id"), Seq("id"), "left_anti")
    val minKept = kept.groupBy("stratum").agg(min("score").as("mk"))
    val maxDrop = dropped.groupBy("stratum").agg(max("score").as("md"))
    minKept.join(maxDrop, "stratum")
      .filter(col("mk") < col("md")).count() shouldBe 0L
  }

  test("percentileKeep keeps the top-q fraction per stratum, best row always kept") {
    val df = (1L to 10L).map(i => (i, "en", i.toDouble)) :+ ((11L, "zh", 1.0))
    val out = graft.ext.SamplingOps.percentileKeep(
        df.toDF("id", "lang", "score"), "lang", "score", "id", q = 0.3)
      .orderBy("id").as[(Long, String, Double, Double)].collect()
    // en: scores 10,9,8 have pct_rank 0, 1/9, 2/9 ≤ 0.3; zh: single row → 0
    out.map(_._1) shouldBe Array(8L, 9L, 10L, 11L)
    out.last._4 shouldBe 0.0
  }

  test("temperatureMixWeights: alpha=0.5 flattens the language head; keep rates realize the target") {
    // en 16 docs, de 4: p_data .8/.2 -> p_sample sqrt-smoothed 2/3 / 1/3;
    // the low-resource stratum keeps everything, the head halves
    val docs = ((1 to 16).map(i => (i.toLong, "en")) ++
      (17 to 20).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val out = graft.ext.SamplingOps.temperatureMixWeights(docs, "lang", 0.5)
      .orderBy("lang").as[(String, Long, Double, Double, Double)].collect()
    out shouldBe Array(
      ("de", 4L, 0.2, 0.333333, 1.0),
      ("en", 16L, 0.8, 0.666667, 0.5))
    // invariant: p_data x keep_rate renormalizes to exactly p_sample
    val realized = out.map(r => r._3 * r._5)
    val z = realized.sum
    realized.zip(out.map(_._4)).foreach { case (r, ps) =>
      math.abs(r / z - ps) should be < 1e-5
    }
  }

  test("gopherFilter: each rule fires on its own violation; clean doc keeps") {
    val clean = (1 to 30).map(_ => "word").mkString(" ") + " the a of"
    val docs = Seq(
      (1L, clean),                                     // all rules pass
      (2L, "the a of word"),                           // too short
      (3L, (1 to 30).map(_ => "superlongword" * 2).mkString(" ") + " the a"), // avg len > 10
      (4L, (1 to 28).map(_ => "word").mkString(" ") + " the a # # # #"),      // symbols
      (5L, (1 to 28).map(_ => "1234").mkString(" ") + " the a"),              // non-alpha
      (6L, (1 to 30).map(_ => "word").mkString(" ")))  // no stopword evidence
      .toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs, "doc_id", "text",
        minTokens = 10, maxTokens = 80, minStopHits = 2)
      .orderBy("doc_id")
      .select("doc_id", "rule_len", "rule_avg_len", "rule_symbols",
        "rule_alpha", "rule_stop", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    out.map(r => r._1 -> r._7).toMap shouldBe
      Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false,
        6L -> false)
    val failedRule = out.map(r =>
      r._1 -> Seq(r._2, r._3, r._4, r._5, r._6).indexOf(false)).toMap
    failedRule(2L) shouldBe 0 // rule_len
    failedRule(3L) shouldBe 1 // rule_avg_len
    failedRule(4L) shouldBe 2 // rule_symbols
    failedRule(5L) shouldBe 3 // rule_alpha
    failedRule(6L) shouldBe 4 // rule_stop
  }

  test("perplexityBuckets: per-language terciles by bigram-LM fit; 1-token docs drop") {
    // 7 scoreable en docs split 3/1/3 head/middle/tail by percent_rank
    // (docs 6/7 average two certain continuations against one mild
    // surprise -> best fit; the "a b a b" docs carry the rarer "b a"
    // back-transition; doc 5 carries the rare "b c"); zh has its own
    // independent terciles; doc 99 has one token -> no bigram
    val docs = (
      (1L to 4L).map(i => (i, "en", "a b a b")) ++
      Seq((5L, "en", "a b c d"), (6L, "en", "c d e f"), (7L, "en", "e f g h"),
        (20L, "zh", "x y x y"), (21L, "zh", "x z"),
        (99L, "en", "solo"))).toDF("doc_id", "lang", "text")
    val out = TextOps.perplexityBuckets(docs, "doc_id", "text", "lang")
      .orderBy("doc_id")
      .select("doc_id", "lang", "ppl_bucket")
      .as[(Long, String, String)].collect()
    out.map(_._1) should not contain 99L
    val byId = out.map(o => o._1 -> o._3).toMap
    // the doc_id tie-break makes the rank a TOTAL order, so the 4 tied
    // "a b a b" docs still spread: en order 6,7,1,2,3,4,5 -> pct_ranks
    // 0, 1/6, 2/6, 3/6, 4/6, 5/6, 1. Note 4/6 ROUNDS (6dp) above 2/3,
    // so the split lands 3/1/3 — the 6dp rank is the bucketing contract
    // (identical in the SQL oracle), not raw sixths
    Seq(6L, 7L, 1L).foreach(id => byId(id) shouldBe "head")
    byId(2L) shouldBe "middle"
    Seq(3L, 4L, 5L).foreach(id => byId(id) shouldBe "tail")
    // zh buckets are independent of en's scores
    byId(20L) shouldBe "head"
    byId(21L) shouldBe "tail"
  }

  test("ngramDiversity: templated slice scores far below the varied slice") {
    import spark.implicits._
    val df = Seq(
      ("tpl", "a b a b a b"), ("tpl", "a b a b a b"),
      ("var", "q w e r t y"), ("var", "u i o p s d"))
      .toDF("lang", "text")
    val out = graft.ext.TextOps.ngramDiversity(df, "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    out("tpl") shouldBe ((12L, 2L, 0.166667, 10L, 2L, 0.2))
    out("var") shouldBe ((12L, 12L, 1.0, 10L, 10L, 1.0))
  }
}
