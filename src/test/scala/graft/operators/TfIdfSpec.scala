package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TfIdfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 3 docs: "spark" in all (df=3), "fast" in two (df=2), the rest unique
  private lazy val docs = Seq(
    (1L, "spark is fast fast fast"),
    (2L, "spark is nice"),
    (3L, "spark fast engine")).toDF("doc_id", "text")

  test("topTerms ranks by tf desc then df asc then term") {
    val got = TfIdf.topTerms(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
    // doc 1: fast tf=3 wins; then tf=1 ties broken by df asc → "is" (df 2)
    assert(got.filter(_._1 == 1L).toSeq ==
      Seq((1L, 1L, "fast", 3L, 2L), (1L, 2L, "is", 1L, 2L)))
    // doc 3: all tf=1 → df asc then term asc: engine (df 1), fast (df 2)
    assert(got.filter(_._1 == 3L).toSeq ==
      Seq((3L, 1L, "engine", 1L, 1L), (3L, 2L, "fast", 1L, 2L)))
  }

  test("score is tf * N / df and N is broadcast, not shuffled") {
    val q = TfIdf.topTerms(docs, col("doc_id"), col("text"), 3)
    val fast = q.filter(col("doc_id") === 1L && col("term") === "fast")
      .collect().head
    assert(fast.getAs[Double]("score") == 3.0 * 3 / 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      "the single-row corpus count must arrive via broadcast")
  }

  test("buildVocab: min_count cut, freq-desc dense ids, size cap") {
    val corpus = Seq(
      (1L, "aa bb aa cc"),
      (2L, "aa bb dd"),
      (3L, "aa zz")).toDF("doc_id", "text")
    // freqs: aa=4 bb=2 cc=1 dd=1 zz=1 → minCount=2 keeps aa, bb
    val v = TfIdf.buildVocab(corpus, col("text"), minCount = 2L, maxSize = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("aa", 1L, 4L), ("bb", 2L, 2L)))
    // cap: maxSize=1 keeps only the most frequent
    val capped = TfIdf.buildVocab(corpus, col("text"), minCount = 1L, maxSize = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(capped == Seq(("aa", 1L, 4L)))
  }

  test("encode maps tokens to vocab ids in document order, OOV → 0") {
    val corpus = Seq(
      (1L, "aa bb aa cc"),
      (2L, "cc aa zz bb")).toDF("doc_id", "text")
    // vocab (minCount=2): aa→1 (freq 3), bb→2, cc→2... freqs: aa=3 bb=2 cc=2
    // ids by (freq desc, token): aa=1, bb=2, cc=3; zz freq 1 → OOV
    val vocab = TfIdf.buildVocab(corpus, col("text"), minCount = 2L, maxSize = 10)
    val got = TfIdf.encode(corpus, col("doc_id"), col("text"), vocab)
      .select("doc_id", "n_tokens", "ids")
      .as[(Long, Long, Array[Long])].collect()
      .map(t => t._1 -> (t._2, t._3.toSeq)).toMap
    assert(got(1L) == (4L, Seq(1L, 2L, 1L, 3L)))
    assert(got(2L) == (4L, Seq(3L, 1L, 0L, 2L))) // zz → OOV id 0, order kept
  }

  test("unigramLogProb matches a hand-computed mean -ln p") {
    val corpus = Seq(
      (1L, "x x y"),
      (2L, "y z")).toDF("doc_id", "text")
    // freqs: x=2 y=2 z=1, total=5
    def q6(p: Double) = // the engine's DECIMAL(18,6) per-token quantization
      BigDecimal(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want1 = ((q6(0.4) * 2 + q6(0.4)) / 3).toDouble
    val want2 = ((q6(0.4) + q6(0.2)) / 2).toDouble
    val got = TfIdf.unigramLogProb(corpus, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - want1) < 1e-9)
    assert(math.abs(got(2L)._2 - want2) < 1e-9)
  }

  test("bigramLogProb matches a hand-computed smoothed mean -ln p") {
    val corpus = Seq(
      (1L, "a b a b"),   // bigrams: (a,b) (b,a) (a,b)
      (2L, "a b"),       // bigram:  (a,b)
      (3L, "solo")).toDF("doc_id", "text") // 1 token → no bigrams, absent
    // model: c(a,b)=3 c(b,a)=1; c1(a)=3 c1(b)=1; V = |{a, b}| = 2; k=0.5
    def q6(c12: Double, c1: Double) =
      BigDecimal(-math.log((c12 + 0.5) / (c1 + 0.5 * 2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pAB = q6(3, 3); val pBA = q6(1, 1)
    val got = TfIdf.bigramLogProb(corpus, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got.keySet == Set(1L, 2L)) // doc 3 has no bigrams
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - ((pAB * 2 + pBA) / 3).toDouble) < 1e-9)
    assert(got(2L) == (1L, pAB.toDouble))
  }

  test("bigramLogProb separates fluent from scrambled word order") {
    // the scrambled doc has the SAME unigram histogram as the fluent
    // ones — a unigram LM scores it identically to doc 1; the bigram LM
    // must not, because its transitions are rare under the corpus model
    val fluent = (1L to 10L).map(i => (i, "the cat sat on the mat"))
    val scrambled = (11L, "mat the on sat cat the")
    val corpus = (fluent :+ scrambled).toDF("doc_id", "text")
    val got = TfIdf.bigramLogProb(corpus, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(got(1L) < got(11L),
      s"fluent doc must score lower nll: ${got(1L)} vs ${got(11L)}")
  }

  test("allPairsCosine: near-identical docs ≈ 1, disjoint absent, no cross join") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),  // identical to 1 → cosine 1.0
      (3L, "epsilon zeta eta theta"),  // shares nothing with 1/2
      (4L, "alpha beta iota kappa")).toDF("doc_id", "text")
    val q = TfIdf.allPairsCosine(corpus, col("doc_id"), col("text"),
      dfCap = 50L, threshold = 0.05)
    val plan = q.queryExecution.executedPlan.toString
    // the single-row broadcast(total) legitimately compiles to a
    // BroadcastNestedLoopJoin; only an all-pairs cartesian is forbidden
    assert(!plan.contains("CartesianProduct"))
    val got = q.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-6)
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
    // docs 1/4 share only the LOW-idf half of their terms → weakly similar
    assert(got((1L, 4L)) > 0.05 && got((1L, 4L)) < 0.5)
  }

  test("allPairsCosine dfCap prunes ubiquitous terms from pair generation") {
    // "common" is in every doc; with dfCap=2 it must not generate pairs —
    // docs sharing ONLY "common" are absent even at threshold 0
    val corpus = Seq(
      (1L, "common uniqa"),
      (2L, "common uniqb"),
      (3L, "common shared x"),
      (4L, "common shared y")).toDF("doc_id", "text")
    val got = TfIdf.allPairsCosine(corpus, col("doc_id"), col("text"),
      dfCap = 2L, threshold = 0.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(got.toSet == Set((3L, 4L))) // only the "shared" pair survives
  }

  test("zipfSlope: a planted power law fits slope ~ -1; degenerate corpus NULL") {
    // token i repeated floor(720/i) times, i = 1..12: freq ∝ 1/rank, so
    // the ln-ln OLS slope must sit near −1 (floor() bends it slightly)
    // letter-only tokens — the [^a-z]+ tokenizer would split digits off
    val text = (1 to 12).flatMap(i =>
      Seq.fill(720 / i)(s"tok${('a' + i).toChar}")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TfIdf.zipfSlope(docs, col("text"), topN = 12).collect().head
    assert(got.getAs[Long]("n_ranks") == 12L)
    val slope = got.getAs[Double]("slope")
    assert(math.abs(slope + 1.0) < 0.02, s"expected ~-1, got $slope")
    // intercept ~ ln(720) = 6.579...
    assert(math.abs(got.getAs[Double]("intercept") - math.log(720.0)) < 0.05)
    // determinism
    val again = TfIdf.zipfSlope(docs, col("text"), topN = 12).collect().head
    assert(again.getAs[Double]("slope") == slope)
    // a single-token corpus has no line: NULL slope, not a divide error
    val one = TfIdf.zipfSlope(
      Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text"), col("text"))
      .collect().head
    assert(one.getAs[Long]("n_ranks") == 1L)
    assert(one.isNullAt(one.fieldIndex("slope")))
  }

  test("crossEntropyDrift: identical halves ~ 0 drift; vocabulary shift raises it") {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = Seq((1L, "aa bb aa"), (2L, "bb cc")).toDF("doc_id", "text")
    // model: aa:2, bb:2, cc:1 → N=5, V=3, denom=9
    val same = TfIdf.crossEntropyDrift(ref, ref, col("text")).collect().head
    assert(same.getAs[Long]("n_ref_tokens") == 5L)
    assert(same.getAs[Long]("v_ref") == 3L)
    assert(same.getAs[Double]("drift") == 0.0, "same text, same model → 0")
    // hand value: ce = (2·(−ln(3/9)) + 2·(−ln(3/9)) + 1·(−ln(2/9))) / 5
    val want = BigDecimal(
      (4 * r9(-math.log(3.0 / 9)) + r9(-math.log(2.0 / 9))) / 5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(same.getAs[Double]("ce_ref") == want,
      s"got ${same.getAs[Double]("ce_ref")}, want $want")
    // a current half full of NOVEL tokens scores the OOV class (p=1/9
    // each) — cross-entropy must exceed the reference's own
    val cur = Seq((3L, "zz yy xx ww")).toDF("doc_id", "text")
    val drifted = TfIdf.crossEntropyDrift(ref, cur, col("text")).collect().head
    assert(drifted.getAs[Double]("drift") > 0.5,
      s"novel vocabulary must raise CE: ${drifted.getAs[Double]("drift")}")
    assert(drifted.getAs[Double]("ce_cur") ==
      BigDecimal(r9(-math.log(1.0 / 9)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ── saturationCurve ────────────────────────────────────────────────

  test("saturationCurve: first-occurrence attribution, flat tail, zero slices") {
    val docs = Seq(
      (0L, "p q r s"), (1L, "p q r"),        // bucket 0: grams pqr, qrs
      (2L, "p q r t"), (3L, "z z z"),        // bucket 1: new qrt, zzz
      (4L, "p q r"), (5L, "p q r"),          // buckets 2-4: nothing new
      (6L, "p q r"), (7L, "p q r"),
      (8L, "p q r"), (9L, "p q r")).toDF("id", "txt")
    val got = TfIdf.saturationCurve(docs, col("id"), col("txt"),
      n = 3, buckets = 5)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 2L, Some(1.0)),
      (1L, 2L, 2L, 4L, Some(1.0)),
      (2L, 2L, 0L, 4L, Some(0.0)),
      (3L, 2L, 0L, 4L, Some(0.0)),
      (4L, 2L, 0L, 4L, Some(0.0))))
  }

  test("saturationCurve: sparse ids skew slice sizes, never attribution") {
    val docs = Seq((0L, "a b c"), (9L, "x y z")).toDF("id", "txt")
    val got = TfIdf.saturationCurve(docs, col("id"), col("txt"),
      n = 3, buckets = 5)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(
      (0L, 1L, 1L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 1L, 1L))) // empty interior slices KEPT with zeros
    assert(got(2)._5.isEmpty) // no docs → NULL rate, not 0/0
  }

  // ── logOddsWords ───────────────────────────────────────────────────

  test("logOddsWords: hand-computed Dirichlet-prior delta and z") {
    val docs = Seq(
      (1L, "A", "alpha alpha alpha common common"),
      (2L, "B", "beta beta beta common common")).toDF("id", "src", "txt")
    val got = TfIdf.logOddsWords(docs, col("txt"), col("src"),
      sourceA = "A", sourceB = "B", priorScale = 10.0, minCount = 1L)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def chain(ya: Long, yb: Long): (Double, Double) = {
      val (na, nb, ntot) = (5.0, 5.0, 10.0)
      val a = 10.0 * ((ya + yb) / ntot)
      val d = math.log((ya + a) / (na + 10.0 - ya - a)) -
        math.log((yb + a) / (nb + 10.0 - yb - a))
      (r6(d), r6(d / math.sqrt(1.0 / (ya + a) + 1.0 / (yb + a))))
    }
    val (dA, zA) = chain(3, 0)
    assert(got("alpha") == ("alpha", 3L, 0L, dA, zA))
    val (dB, zB) = chain(0, 3)
    assert(got("beta") == ("beta", 0L, 3L, dB, zB))
    val (dC, zC) = chain(2, 2)
    assert(dC == 0.0 && zC == 0.0 && got("common")._4 == 0.0)
    assert(zA > 0 && zB < 0 && zA == -zB) // symmetric corpus, symmetric z
  }

  test("logOddsWords: minCount bounds output; prior still uses full vocab") {
    val docs = Seq(
      (1L, "A", "x x x x x rare"),
      (2L, "B", "y y y y y")).toDF("id", "src", "txt")
    val got = TfIdf.logOddsWords(docs, col("txt"), col("src"),
      "A", "B", priorScale = 10.0, minCount = 5L)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("x", "y")) // 'rare' (1 < 5) excluded
    // ntot includes 'rare': alpha(x) = 10·5/11, not 10·5/10 — pin via
    // the replayed chain
    val a = 10.0 * (5.0 / 11.0)
    val d = math.log((5.0 + a) / (6.0 + 10.0 - 5.0 - a)) -
      math.log((0.0 + a) / (5.0 + 10.0 - 0.0 - a))
    val exp = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got.find(_._1 == "x").get._4 == exp)
  }

  // ── tokenBurstiness ────────────────────────────────────────────────

  test("tokenBurstiness: bursty topical term vs Poisson-flat glue word") {
    // 'topic' appears 10× in each of 5 docs (of 20); 'glue' once
    // everywhere
    val docs = (1L to 20L).map { i =>
      val topic = if (i <= 5) Seq.fill(10)("topic") else Nil
      (i, (topic :+ "glue").mkString(" "))
    }.toDF("id", "txt")
    val got = TfIdf.tokenBurstiness(docs, col("id"), col("txt"), minDf = 5L)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ratio(cf: Long, df: Long, n: Long) =
      r6(df.toDouble / (n.toDouble * (1.0 - math.exp(-(cf.toDouble / n)))))
    assert(got("topic") == ("topic", 50L, 5L, 10.0, ratio(50, 5, 20)))
    assert(got("glue") == ("glue", 20L, 20L, 1.0, ratio(20, 20, 20)))
    // the screen's whole point: bursty ratio far under 1, glue above
    assert(got("topic")._5 < 0.5 && got("glue")._5 > 1.0)
  }

  test("tokenBurstiness: minDf bounds output, not the corpus counts") {
    val docs = Seq((1L, "rare rare"), (2L, "common"), (3L, "common"),
      (4L, "common"), (5L, "common"), (6L, "common")).toDF("id", "txt")
    val got = TfIdf.tokenBurstiness(docs, col("id"), col("txt"), minDf = 5L)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("common")) // df(rare)=1 < 5: out
    assert(got.head._2 == 5L && got.head._3 == 5L)
  }

  // ── kneserNeyBigrams ───────────────────────────────────────────────

  test("kneserNeyBigrams: hand-computed discount + continuation backoff") {
    // corpus bigrams: (a,b)×2, (b,a)×1, (a,c)×1
    // c(a·)=3, c(b·)=1; N1+(a·)=2, N1+(b·)=1
    // N1+(·b)=1, N1+(·a)=1, N1+(·c)=1, N1+(··)=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("id", "txt")
    val got = TfIdf.kneserNeyBigrams(
      docs, col("id"), col("txt"), discount = 0.75, minCount = 1L)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pkn(c: Long, ca: Long, n1a: Long, n1b: Long): Double =
      r6((c.toDouble - 0.75) / ca + 0.75 * n1a.toDouble / ca *
        (n1b.toDouble / 3.0))
    assert(got == Seq(
      ("a", "b", 2L, 3L, 2L, r6(1.0 / 3), pkn(2, 3, 2, 1)),
      ("a", "c", 1L, 3L, 2L, r6(1.0 / 3), pkn(1, 3, 2, 1)),
      ("b", "a", 1L, 1L, 1L, r6(1.0 / 3), pkn(1, 1, 1, 1))))
  }

  test("kneserNeyBigrams: continuation beats raw frequency for burst tokens") {
    // 'z' is frequent but ONLY ever follows 'q' (one continuation
    // context); 'y' is rarer but completes many contexts — after an
    // unseen-ish context 'a', KN must NOT prefer z the way raw
    // unigram counts would. We check the continuation probabilities
    // that drive that: p_cont(y) > p_cont(z) despite count(z) > count(y).
    val docs = Seq(
      (1L, "q z q z q z q z q z q z"),
      (2L, "b y c y d y e y")).toDF("id", "txt")
    val got = TfIdf.kneserNeyBigrams(
      docs, col("id"), col("txt"), minCount = 1L)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect()
    val pContZ = got.filter(_._2 == "z").head._6
    val pContY = got.filter(_._2 == "y").head._6
    assert(pContY > pContZ, s"p_cont(y)=$pContY must beat p_cont(z)=$pContZ")
    // minCount bounds OUTPUT only: the q→z row keeps model counts
    // computed over everything
    val filtered = TfIdf.kneserNeyBigrams(
      docs, col("id"), col("txt"), minCount = 6L)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(filtered.map(r => (r._1, r._2)) == Seq(("q", "z")))
    assert(filtered.head._7 ==
      got.filter(r => r._1 == "q" && r._2 == "z").head._7)
  }

  test("rakeKeyphrases: hand-scored phrases, stopword boundaries, " +
      "multi-occurrence rollup") {
    // doc 1 "deep learning of deep networks": 'of' is a boundary ->
    // runs [deep learning], [deep networks]; doc 2 "deep learning".
    // deg/freq: deep 6/3=2, learning 4/2=2, networks 2/1=2.
    // "deep learning": 2 occurrences in 2 docs, score 4.0;
    // "deep networks": 1 occurrence, score 4.0.
    val docs = Seq(
      (1L, "deep learning of deep networks"),
      (2L, "deep learning"))
      .toDF("doc_id", "text")
    val got = TfIdf.rakeKeyphrases(docs, col("doc_id"), col("text"),
        k = 10, minCount = 1L)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("deep learning", 2L, 2L, 2L, 4.0),
      ("deep networks", 1L, 1L, 2L, 4.0)))
    // minCount screens the singleton
    val kept = TfIdf.rakeKeyphrases(docs, col("doc_id"), col("text"),
        k = 10, minCount = 2L)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(kept == Seq(("deep learning", 2L, 2L, 2L, 4.0)))
  }

  test("rakeKeyphrases: punctuation splits runs; longer runs outrank loners") {
    // "the cat! sat on a mat" -> runs [cat sat], [mat]:
    // cat 2/1, sat 2/1, mat 1/1 -> "cat sat" 4.0 > "mat" 1.0
    val docs = Seq((1L, "The cat! sat on a mat")).toDF("doc_id", "text")
    val got = TfIdf.rakeKeyphrases(docs, col("doc_id"), col("text"),
        k = 10, minCount = 1L)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("cat sat", 1L, 1L, 2L, 4.0),
      ("mat", 1L, 1L, 1L, 1.0)))
  }

  test("heapsLaw: all-unique tokens fit beta=1, k=1, r2=1 exactly") {
    // every token globally unique -> cum_v == cum_n at every point ->
    // the quantized (x, y) pairs are IDENTICAL, so OLS is exact.
    // Tokens are pure a-z two-letter words (digits are SEPARATORS
    // under the buildVocab tokenization contract).
    val docs = (0L until 10L)
      .map(i => (i, (0 to i.toInt).map(j =>
        s"${('a' + i.toInt).toChar}${('a' + j).toChar}").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TfIdf.heapsLaw(docs, col("doc_id"), col("text"), buckets = 10)
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got._1 == 10L && got._2 == 55L && got._3 == 55L)
    assert(got._4.contains(1.0) && got._5.contains(1.0) &&
      got._6.contains(1.0))
  }

  test("heapsLaw: saturated vocabulary reads beta=0; flat curve guards NULL") {
    // docs 1..9 reuse doc 0's three words -> V constant at 3, N grows:
    // slope 0, k = exp(q6(ln 3)) = 2.999999, r2 NULL — the y_varies
    // decimal screen fires exactly (the double-rounded deny would
    // land a hair off zero and lie).
    val sat = (0L until 10L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val g1 = TfIdf.heapsLaw(sat, col("doc_id"), col("text"), buckets = 10)
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g1._4.contains(0.0))
    assert(g1._5.contains(2.999999)) // exp(q6(ln 3)) rounded 6dp
    assert(g1._6.isEmpty)
    // one doc -> every cumulative point identical -> zero x-variance ->
    // the whole fit is NULL, never a divide-by-zero
    val one = Seq((5L, "solo words here")).toDF("doc_id", "text")
    val g2 = TfIdf.heapsLaw(one, col("doc_id"), col("text"), buckets = 10)
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g2._4.isEmpty && g2._5.isEmpty && g2._6.isEmpty)
  }

  test("goodTuring: hand-computed counts-of-counts, empty classes kept, " +
      "undefined r* is NULL") {
    // tokens: a×3, b×2, c×1 → N=6, N1=N2=N3=1
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TfIdf.goodTuring(docs, col("text"), maxR = 10).collect()
    assert(got.length == 10)
    val r1 = got(0)
    assert(r1.getAs[Long]("n_types") == 1L)
    assert(r1.getAs[Double]("mass_share") == 0.166667)
    assert(r1.getAs[Double]("gt_rstar") == 2.0)
    val r2 = got(1)
    assert(r2.getAs[Double]("mass_share") == 0.333333)
    assert(r2.getAs[Double]("gt_rstar") == 3.0)
    val r3 = got(2)
    assert(r3.getAs[Double]("mass_share") == 0.5)
    assert(r3.isNullAt(r3.fieldIndex("gt_rstar"))) // N4 = 0: undefined
    val r4 = got(3)
    assert(r4.getAs[Long]("n_types") == 0L)
    assert(r4.getAs[Double]("mass_share") == 0.0)
    assert(r4.isNullAt(r4.fieldIndex("gt_rstar")))
  }
}
