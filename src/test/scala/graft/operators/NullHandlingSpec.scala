package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Degenerate-input behavior of the round-5 operators: NULL text/vec
  * rows and empty inputs must degrade predictably (drop out or carry
  * nulls), never throw — a 100 TB crawl always contains garbage rows. */
class NullHandlingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dirtyDocs = Seq(
    (1L, "alpha beta gamma"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "alpha beta gamma")).toDF("doc_id", "text")

  test("unigramLogProb: null/empty docs drop out, clean docs score") {
    val got = TfIdf.unigramLogProb(dirtyDocs, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L)) // null → explode skips; "" → zero tokens
  }

  test("buildVocab ignores null/empty docs") {
    val v = TfIdf.buildVocab(dirtyDocs, col("text"), minCount = 2L, maxSize = 10)
      .as[(String, Long, Long)].collect()
    assert(v.map(_._1).toSet == Set("alpha", "beta", "gamma"))
  }

  test("booleanSearch: null docs can't match") {
    val got = TextPipeline.booleanSearch(
      dirtyDocs, col("doc_id"), col("text"), Seq("alpha", "beta"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("tokenScrub carries nulls through without throwing") {
    val got = TextPipeline.tokenScrub(
      dirtyDocs, col("doc_id"), col("text"), Seq("beta"), minLen = 3)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(1L) == false && got(2L) == true && got(3L) == false)
  }

  test("incremental: null-text batch rows collapse to one sentinel group, idempotently") {
    val corpus = Seq((1L, "seen")).toDF("doc_id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]),
      (11L, null.asInstanceOf[String]), (12L, "fresh")).toDF("doc_id", "text")
    val got = Dedup.incremental(batch, corpus, col("text"), col("doc_id"), col("text"))
      .select("keep_id", "n_batch_copies").as[(Long, Long)].collect().toSet
    // null digests coalesce to the sentinel: one group (min id 10)
    assert(got == Set((10L, 2L), (12L, 1L)))
    // idempotency INCLUDING the null group: admit the output, re-run the
    // same batch — nothing is re-admitted (a raw null digest would never
    // equi-match in the anti-join and rows 10/11 would bounce forever)
    val corpus2 = corpus.unionByName(
      Seq((10L, null.asInstanceOf[String]), (12L, "fresh")).toDF("doc_id", "text"))
    val again = Dedup.incremental(batch, corpus2, col("text"), col("doc_id"), col("text"))
    assert(again.count() == 0L)
  }

  test("kmeans skips null vectors; semDedup ignores them in pairs") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(1.0f, 0.01f))).toDF("vec_id", "embedding")
    val m = Clustering.kmeans(vecs, col("vec_id"), col("embedding"), k = 2, maxIters = 5)
    assert(m.centroids.length == 2)
    val pairs = Clustering.semDedupPairs(
      vecs, col("vec_id"), col("embedding"), k = 2, maxIters = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 4L))) // the null row never appears
  }

  test("scalarQuantize: null vectors yield null codes, ranges unaffected") {
    val vecs = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(5.0f, 20.0f))).toDF("vec_id", "embedding")
    val (q, ranges) = Similarity.scalarQuantize(vecs, col("embedding"))
    assert(ranges.toSeq == Seq((0.0, 5.0), (10.0, 20.0)))
    val rows = q.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) == false && rows(2L) == true && rows(3L) == false)
  }

  test("resampleFill on an empty event set returns empty, not an error") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(Events.resampleFill(empty, 3600L).count() == 0)
  }

  test("cmSketch skips null items; estimates for them are 0, never an error") {
    val toks = Seq(Some("a"), None, Some("a"), Some("b")).toDF("tok")
    val sketch = Sketches.cmSketch(toks, col("tok"), 3, 16)
    // md5(null) is null → null cells → the posexplode drops the row
    assert(sketch.agg(sum("n")).as[Long].collect().head == 9L) // 3 occurrences × depth
    val est = Sketches.cmsEstimate(sketch, Seq("a", "zz").toDF("tok"), col("tok"), 3, 16)
      .as[(String, Long)].collect().toMap
    assert(est("a") == 2L && est("zz") == 0L)
  }

  test("kmvDistinct counts NULL as one distinct value, consistently") {
    // null value → null hash → one (group, null) row through the
    // pre-distinct — the same thing the DuckDB oracle's DISTINCT does
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(1L)), ("g", None))
      .toDF("grp", "v")
    val got = Sketches.kmvDistinct(df, col("grp"), col("v"), k = 8)
      .as[(String, Long, Double)].collect().head
    assert(got._2 == 2L, "1 real value + the null bucket")
  }

  test("kmvDistinct: a null value cannot displace a real minimum at saturation") {
    // r9 ADVICE: pre-fix, the null hash decoded as 0L — the smallest
    // possible hash — entered the k-min set of a SATURATED group and
    // inflated kmv_n. The sentinel orders nulls LAST (DuckDB's NULLS
    // LAST), so a saturated group's estimate must be identical with or
    // without null rows.
    val k = 8
    val clean = (1L to 40L).map(i => ("g", Option(i))).toDF("grp", "v")
    val dirty = clean.unionByName(
      Seq(("g", None: Option[Long]), ("g", None: Option[Long])).toDF("grp", "v"))
    val est = Sketches.kmvDistinct(clean, col("grp"), col("v"), k)
      .as[(String, Long, Double)].collect().head
    val estD = Sketches.kmvDistinct(dirty, col("grp"), col("v"), k)
      .as[(String, Long, Double)].collect().head
    assert(est._3 == estD._3, "null must not perturb a saturated estimate")
    assert(estD._2 == est._2 + 1, "n_exact still counts the null bucket once")
  }

  test("kmvDistinct: null at exactly rank k yields a NULL estimate (oracle parity)") {
    // exactly k-1 real distinct values + a null: the k-th minimum IS
    // the null sentinel, which DuckDB's `CASE WHEN rn = k THEN h END`
    // sees as NULL → NULL estimate on both engines.
    val k = 4
    val df = (1L to 3L).map(i => ("g", Option(i))).toDF("grp", "v")
      .unionByName(Seq(("g", None: Option[Long])).toDF("grp", "v"))
    val got = Sketches.kmvDistinct(df, col("grp"), col("v"), k)
      .select("kmv_n").as[Option[Double]].collect().head
    assert(got.isEmpty, "sentinel at rank k → NULL estimate")
  }

  test("minKSample: null ids are excluded, duplicate ids collapse to one slot") {
    // pre-fix, a null id hashed to a 0L winner slot that matched
    // nothing (silently k-1 rows), and a duplicated id could burn two
    // of the k slots; null dims must stay their own cell.
    val df = Seq(
      ("a", Option(1L)), ("a", Option(1L)), ("a", Option(2L)),
      ("a", Option(3L)), ("a", None),
      (null.asInstanceOf[String], Option(7L)), (null.asInstanceOf[String], Option(8L)))
      .toDF("cell", "id")
    val got = Sketches.minKSample(df, Seq("cell"), col("id"), k = 3)
      .as[(String, Long)].collect().toSet
    assert(got.count(_._1 == "a") == 3, "dup id must not eat a slot; null id excluded")
    assert(got.filter(_._1 == "a").map(_._2) == Set(1L, 2L, 3L))
    assert(got.count(_._1 == null) == 2, "null dims are their own cell")
  }

  test("ngramNovelty: null and too-short docs stay in the spine with null novelty") {
    val got = TextPipeline.ngramNovelty(dirtyDocs, col("doc_id"), col("text"), n = 2)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L), "every doc survives")
    assert(got(1) == ((2L, 0L, 0L, None)) && got(2) == ((3L, 0L, 0L, None)))
    assert(got(0)._4.contains(1.0) && got(3)._4.contains(0.0)) // 4 copies 1's grams
  }

  test("chunkDedup drops null-text docs (no chunks), keeps empty-text docs") {
    val docs = Seq((1L, "abcd"), (2L, null.asInstanceOf[String]), (3L, "abcd"))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), size = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 0L, 0.0), (3L, 1L, 1L, 1.0)))
  }

  test("scd2 treats a null attribute as a real version boundary") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val log = Seq(
      (1L, t(0), 1L, Some("a")),
      (1L, t(1), 2L, None),      // a → null IS a change
      (1L, t(2), 3L, None),      // null run collapses
      (1L, t(3), 4L, Some("a"))) // null → a again
      .toDF("user_id", "ts", "event_id", "attr")
    val got = Scd.scd2(log, col("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), col("attr"))
      .as[(Long, Int, Option[String], java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)]
      .collect().sortBy(_._2).toSeq
    assert(got.map(_._3) == Seq(Some("a"), None, Some("a")))
    assert(got.map(_._2) == Seq(1, 2, 3))
  }

  test("pageRank tolerates an empty edge list: empty result, no division blowup") {
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(Graph.pageRank(empty, col("src"), col("dst"), col("w")).count() == 0L)
    assert(Graph.labelPropagation(empty, col("src"), col("dst"), col("w")).count() == 0L)
  }

  test("pqTopK on an empty corpus degrades to the (empty) brute force") {
    val corpus = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val probes = Seq((1L, Array(1.0f, 0.0f))).toDF("query_id", "query_vec")
    assert(Similarity.pqTopK(probes, corpus, k = 3, dim = 2, m = 1, ksub = 4).count() == 0L)
  }
}
