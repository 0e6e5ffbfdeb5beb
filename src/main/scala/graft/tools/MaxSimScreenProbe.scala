package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe (r11 verdict ask #3): does maxSimTopKAuto's token-level
  * LSH candidate screen actually SHRINK the exact scorer's input as the
  * corpus grows, and does it keep the exact top-k?
  *
  * Reports, per replica dir:
  *  - n_docs (multi-vector corpus size, 8 token vectors per doc)
  *  - candidate pairs surviving the screen vs the brute-force pair
  *    count |queries| × (n_docs − 1) — the screen ratio the receipt
  *    quotes (sublinear candidate volume = ratio falls as n grows)
  *  - top-k recall of the screened scorer vs the exact one (planted
  *    recall line: exact top-5 per query recovered or not)
  *
  * Two modes:
  *  - fixture mode (args = sf dirs): the embeddings table's multi-vector
  *    docs. The fixture is ISOTROPIC (near-random vectors), where a
  *    token screen cannot be both selective and full-recall — this mode
  *    documents that honestly at the recall-oriented banding.
  *  - planted mode (PROBE_PLANTED="n1,n2,.."): deterministic CLUSTERED
  *    corpora (16 orthogonal cluster centers, all 8 tokens of a doc
  *    near its cluster's center + hash jitter — the real embedding-
  *    corpus shape) at growing n, screened with the CORPUS-SIZED
  *    banding (maxSimTopKAutoSized). The receipt claim: candidate
  *    RATIO falls as n grows (sized bits kill background collisions)
  *    while the exact top-k (same-cluster docs) is fully recovered.
  *
  * Usage: runMain graft.tools.MaxSimScreenProbe <sfDir> [more dirs...]
  *        PROBE_PLANTED=4000,16000,64000 runMain ... (no dir args)
  */
object MaxSimScreenProbe {

  /** Deterministic clustered multi-vector corpus: doc i's 8 tokens all
    * sit near cluster (i % 16)'s orthogonal 4-dim center, jittered by
    * an integer hash — fully distributed (spark.range + expressions),
    * no RNG, reproducible bit-for-bit. */
  private def planted(spark: SparkSession, n: Long) = {
    val cluster = pmod(col("doc_id"), lit(16L))
    val base = (d: org.apache.spark.sql.Column) =>
      when(d >= cluster * 4 && d < cluster * 4 + 4, lit(2.0)).otherwise(lit(0.0))
    val jitter = (d: org.apache.spark.sql.Column) =>
      (pmod(col("doc_id") * 1000003L + col("d_token") * 7919L + d * 104729L,
        lit(1000L)).cast("double") - 500.0) / 2500.0 // ±0.2
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), explode(sequence(lit(0L), lit(7L))).as("d_token"))
      .withColumn("embedding",
        transform(sequence(lit(0L), lit(63L)),
          d => (base(d) + jitter(d)).cast("float")))
  }

  private def screenReport(
      tag: String, probes: org.apache.spark.sql.DataFrame,
      vecs: org.apache.spark.sql.DataFrame, nDocs: Long,
      nPlanes: Int, bands: Int): Unit = {
    val planes = Similarity.hyperplanes(64, nPlanes, 42L)
    val pb = probes.select(col("query_id"),
        explode(Similarity.signatureBuckets(col("query_vec"), planes, bands))
          .as("bucket"))
      .dropDuplicates("query_id", "bucket")
    val cand = vecs.select(col("doc_id"),
        explode(Similarity.signatureBuckets(col("embedding"), planes, bands))
          .as("bucket"))
      .join(broadcast(pb), Seq("bucket"))
      .filter(col("query_id") =!= col("doc_id"))
      .select("query_id", "doc_id")
      .dropDuplicates("query_id", "doc_id")
      .count()
    val brute = 3L * (nDocs - 1)
    val exact = Similarity.maxSimTopK(probes, vecs, 5)
      .select("query_id", "doc_id")
    val auto = Similarity.maxSimTopKAuto(probes, vecs, 5,
        nPlanes = nPlanes, bands = bands)
      .select("query_id", "doc_id")
    val nExact = exact.count()
    val recovered = exact.join(auto, Seq("query_id", "doc_id"), "left_semi")
      .count()
    println(f"[probe] $tag: n_docs=$nDocs planes=$nPlanes bands=$bands " +
      f"candidates=$cand brute=$brute " +
      f"screen_ratio=${cand.toDouble / brute}%.4f recall=$recovered/$nExact")
  }

  def main(args: Array[String]): Unit = {
    val nPlanes = sys.env.getOrElse("PROBE_PLANES", "16").toInt
    val bands = sys.env.getOrElse("PROBE_BANDS", "8").toInt
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("PROBE_PLANTED") match {
      case Some(ns) =>
        ns.split(",").map(_.trim.toLong).foreach { n =>
          val vecs = planted(spark, n)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val probes = vecs.filter(col("doc_id") < 3)
            .select(col("doc_id").as("query_id"),
              col("d_token").as("q_token"), col("embedding").as("query_vec"))
          // the sized dial maxSimTopKAutoSized would pick (8·n tokens)
          val bits = graft.operators.Dedup.sizedBandBits(8L * n)
          screenReport(s"planted(n=$n)", probes, vecs, n, 4 * bits, 4)
          vecs.unpersist(blocking = false)
        }
      case None =>
        dirs.foreach { dir =>
          val e = graft.Tables(spark, dir, "embeddings")
          val vecs = e.select(
            (col("vec_id") / 8).cast("long").as("doc_id"),
            pmod(col("vec_id"), lit(8L)).as("d_token"),
            col("embedding"))
          val probes = vecs.filter(col("doc_id") < 3)
            .select(col("doc_id").as("query_id"),
              col("d_token").as("q_token"), col("embedding").as("query_vec"))
          val nDocs = vecs.select("doc_id").distinct().count()
          screenReport(dir, probes, vecs, nDocs, nPlanes, bands)
        }
    }
    spark.stop()
  }
}
