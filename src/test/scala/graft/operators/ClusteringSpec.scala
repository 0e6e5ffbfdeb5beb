package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ClusteringSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // three well-separated direction clusters in 4-d, plus a planted
  // near-duplicate pair inside the first cluster
  private lazy val vecs = {
    val a = (0 until 20).map(i => (100L + i, Array(1.0f, 0.01f * i, 0.0f, 0.0f)))
    val b = (0 until 20).map(i => (200L + i, Array(0.0f, 1.0f, 0.01f * i, 0.0f)))
    val c = (0 until 20).map(i => (300L + i, Array(0.0f, 0.0f, 1.0f, 0.01f * i)))
    val dup = Seq((199L, Array(1.0f, 0.05f, 0.0f, 0.0f))) // ≈ id 105
    (a ++ b ++ c ++ dup).toDF("vec_id", "embedding")
  }

  test("assign: every row goes to its true argmax-cosine centroid") {
    val centroids = Array(
      (0, Array(1.0, 0.0, 0.0, 0.0)),
      (1, Array(0.0, 1.0, 0.0, 0.0)),
      (2, Array(0.0, 0.0, 1.0, 0.0)))
    val got = Clustering.assign(vecs, col("embedding"), centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    vecs.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      val want = centroids.map { case (cid, cv) =>
        val dot = v.zip(cv).map { case (x, y) => x * y }.sum
        val n = math.sqrt(v.map(x => x * x).sum) * math.sqrt(cv.map(x => x * x).sum)
        (-dot / n, cid)
      }.min._2
      assert(got(id) == want, s"vec $id")
    }
  }

  test("kmeans: recovers the three planted clusters and is deterministic") {
    val m1 = Clustering.kmeans(vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 10)
    val m2 = Clustering.kmeans(vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 10)
    assert(m1.converged)
    // bit-deterministic run-to-run (decimal-accumulated updates)
    m1.centroids.zip(m2.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b))
    }
    val assigned = Clustering.assign(vecs, col("embedding"), m1.centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect()
    // each planted group lands in exactly one cluster
    def clusterOf(prefix: Long) =
      assigned.filter(t => t._1 >= prefix && t._1 < prefix + 20).map(_._2).distinct
    assert(clusterOf(100L).length == 1)
    assert(clusterOf(200L).length == 1)
    assert(clusterOf(300L).length == 1)
    assert(Set(clusterOf(100L).head, clusterOf(200L).head, clusterOf(300L).head).size == 3)
  }

  test("kmeans: final centroids are the member means (self-consistency)") {
    val m = Clustering.kmeans(vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 10)
    assert(m.converged)
    val members = Clustering.assign(vecs, col("embedding"), m.centroids)
      .select("cluster", "embedding").as[(Int, Array[Float])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    m.centroids.foreach { case (cid, cv) =>
      val vs = members(cid)
      cv.indices.foreach { d =>
        val mean = vs.map(_(d).toDouble).sum / vs.length
        assert(math.abs(cv(d) - mean) < 1e-9, s"cluster $cid dim $d")
      }
    }
  }

  test("semDedupPairs: finds the planted near-dup, pairs match brute force") {
    val pairs = Clustering.semDedupPairs(
      vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 5, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    assert(pairs.exists { case (a, b) => (a, b) == (105L, 199L) })
    // every emitted pair really is >= threshold (exact cosine on driver)
    val byId = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    pairs.foreach { case (a, b) =>
      val (x, y) = (byId(a), byId(b))
      val cos = x.zip(y).map(t => t._1 * t._2).sum /
        (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      assert(cos >= 0.999 - 1e-9, s"pair ($a,$b) cos=$cos")
    }
  }

  test("semDedupPairs: within-cluster joins only — no cartesian product") {
    val q = Clustering.semDedupPairs(
      vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 2, topK = Some(10))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("semDedupKeep keeps the min-id representative of each dup chain") {
    // at threshold 0.999 adjacent ramp vectors (Δangle ≈ 0.57°) pair up,
    // so each planted group collapses to its lowest id
    val keep = Clustering.semDedupKeep(
      vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 5, threshold = 0.999)
      .as[Long].collect().toSet
    assert(keep == Set(100L, 200L, 300L))
  }

  test("kmeansTwoLevel separates the planted groups and is deterministic") {
    val m1 = Clustering.kmeansTwoLevel(
      vecs, col("vec_id"), col("embedding"), k = 6, maxIters = 5)
    val m2 = Clustering.kmeansTwoLevel(
      vecs, col("vec_id"), col("embedding"), k = 6, maxIters = 5)
    m1.centroids.zip(m2.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b))
    }
    assert(m1.centroids.length >= 6 && m1.centroids.length <= 9) // ceil grid
    // assignment under the two-level model still separates planted groups
    val assigned = Clustering.assign(vecs, col("embedding"), m1.centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect()
    def clustersOf(prefix: Long) =
      assigned.filter(t => t._1 >= prefix && t._1 < prefix + 20).map(_._2).toSet
    // no fine cluster mixes two planted direction groups
    assert((clustersOf(100L) & clustersOf(200L)).isEmpty)
    assert((clustersOf(200L) & clustersOf(300L)).isEmpty)
    assert((clustersOf(100L) & clustersOf(300L)).isEmpty)
  }

  test("sizedK holds cluster width constant as the corpus grows") {
    assert(Clustering.sizedK(100, 1000) == 2) // floor
    assert(Clustering.sizedK(5000, 650) == 8)
    assert(Clustering.sizedK(50000, 650) == 77)
    assert(Clustering.sizedK(130000, 650) == 200)
  }

  test("kmeans surfaces non-convergence instead of silently capping") {
    val m = Clustering.kmeans(vecs, col("vec_id"), col("embedding"), k = 3, maxIters = 1)
    assert(m.iterations == 1)
    assert(!m.converged) // 1 Lloyd step from hash-sampled seeds cannot settle
  }

  test("silhouette: separated clusters score high, equidistant scores 0, exact-match scores 1") {
    val centroids = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    // tight points around each axis + one exactly equidistant
    val pts = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(1.0f, 0.1f)),
      (3L, Array(0.05f, 1.0f)), (4L, Array(0.1f, 1.0f)),
      (5L, Array(1.0f, 1.0f))) // cos = 1/sqrt(2) to both -> s1 == s2 -> 0
      .toDF("vec_id", "embedding")
    val got = Clustering.silhouette(pts, col("embedding"), centroids)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0)._2 == 3 && got(1)._2 == 2,
      "tie on the equidistant point breaks to the lower cluster id")
    assert(got(1)._3 > 0.5, s"tight cluster 1 must score high, got ${got(1)._3}")
    // vector == centroid with an orthogonal runner-up: a = 0, b = 1 -> s = 1
    val exact = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = Clustering.silhouette(exact, col("embedding"), centroids)
      .as[(Int, Long, Double)].collect().head
    assert(e._1 == 0 && e._3 == 1.0)
    // empty clusters are ABSENT, not zero rows; k < 2 refuses
    val one = Clustering.silhouette(
      Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      col("embedding"), centroids)
    assert(one.count() == 1)
    assertThrows[IllegalArgumentException] {
      Clustering.silhouette(pts, col("embedding"),
        Array(0 -> Array(1.0, 0.0)))
    }
    // determinism
    val a1 = Clustering.silhouette(pts, col("embedding"), centroids).collect().toSeq
    val a2 = Clustering.silhouette(pts, col("embedding"), centroids).collect().toSeq
    assert(a1 == a2)
  }

  test("fit dispatches to the two-level algorithm at large k and still separates") {
    // below the threshold: plain Lloyd, exactly k centroids
    val small = Clustering.fit(vecs, col("vec_id"), col("embedding"), k = 3)
    assert(small.centroids.length == 3)
    // at/above the (lowered) threshold: the two-level path — recognizable
    // by its ceil-grid centroid count overshoot on non-square k
    val big = Clustering.fit(
      vecs, col("vec_id"), col("embedding"), k = 6, twoLevelThreshold = 6)
    assert(big.centroids.length >= 6 && big.centroids.length <= 9)
    // and the dispatched large-k model still separates the planted groups
    val assigned = Clustering.assign(vecs, col("embedding"), big.centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect()
    def clustersOf(prefix: Long) =
      assigned.filter(t => t._1 >= prefix && t._1 < prefix + 20).map(_._2).toSet
    assert((clustersOf(100L) & clustersOf(200L)).isEmpty)
    assert((clustersOf(200L) & clustersOf(300L)).isEmpty)
    assert((clustersOf(100L) & clustersOf(300L)).isEmpty)
  }

  test("clusterPurity: hand-computed majorities; singletons split out; null class") {
    import org.apache.spark.sql.functions.col
    // cluster 10: labels (a, a, b) → maj 2/3; cluster 20: (b, b) → pure;
    // cluster 30: singleton (trivially pure); doc 6 has a NULL label
    // that forms its own class inside cluster 20? — no, give it its own
    // singleton cluster 40 to pin the null-class path
    val assign = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L),
      (7L, 30L), (6L, 40L))
      .toDF("id", "cid")
    val labels = Seq(
      (1L, "a"), (2L, "a"), (3L, "b"),
      (4L, "b"), (5L, "b"),
      (7L, "c"), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "src")
    val got = Clustering.clusterPurity(assign, labels,
      col("id"), col("cid"), col("doc_id"), col("src")).collect().head
    assert(got.getAs[Long]("n_docs") == 7L)
    assert(got.getAs[Long]("n_clusters") == 4L)
    assert(got.getAs[Long]("n_multi_clusters") == 2L)
    assert(got.getAs[Long]("n_multi_docs") == 5L)
    // multi: (2 + 2) / (3 + 2) = 0.8; all: (2 + 2 + 1 + 1) / 7
    assert(got.getAs[Double]("purity_multi") == 0.8)
    assert(got.getAs[Double]("purity_all") ==
      BigDecimal(6.0 / 7.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // all-singleton clustering: purity_multi undefined (NULL), never 0/0
    val single = Clustering.clusterPurity(
      Seq((1L, 1L), (2L, 2L)).toDF("id", "cid"),
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "src"),
      col("id"), col("cid"), col("doc_id"), col("src")).collect().head
    assert(single.isNullAt(single.fieldIndex("purity_multi")))
    assert(single.getAs[Double]("purity_all") == 1.0)
    // assigned doc with NO label row at all: left-join keeps it in the
    // __null__ class — counted, never dropped (ADVICE r13)
    val missing = Clustering.clusterPurity(
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cid"),
      Seq((1L, "a"), (2L, "a")).toDF("doc_id", "src"), // doc 3 absent
      col("id"), col("cid"), col("doc_id"), col("src")).collect().head
    assert(missing.getAs[Long]("n_docs") == 3L)
    assert(missing.getAs[Long]("n_multi_docs") == 3L)
    // majority label 'a' (2) over cluster size 3
    assert(missing.getAs[Double]("purity_multi") ==
      BigDecimal(2.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }
}
