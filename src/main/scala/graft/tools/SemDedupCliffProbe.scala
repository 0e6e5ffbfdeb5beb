package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev one-off (r10): reproduce the ext_semdedup same-JVM cliff (54 s
  * after a {chunk,embedding,mad,minhash}x3 prefix at the 26x replica vs
  * ~6 s isolated) and localize WHICH stage explodes — KMeans fit,
  * assign+capBuckets, or the in-cluster pair join. Not contract surface. */
object SemDedupCliffProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf26_replica")
    val prefixReps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[cliff] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    val prefix = Seq("ext_chunk_dedup", "ext_embedding_neardup", "ext_mad",
      "ext_minhash_neardup")
    (1 to prefixReps).foreach { r =>
      prefix.foreach { q =>
        timed(s"prefix $q rep$r") {
          graft.SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        cleanup()
      }
    }
    // now semdedup, stage by stage (mirrors the ext_semdedup lambda)
    val e = graft.Tables(spark, dir, "embeddings")
    val planted = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000L).as("vec_id"),
        concat(array(lit(0.0f)), slice(col("embedding"), 2, 63)).as("embedding"))
    val u = e.select("vec_id", "embedding").unionByName(planted)
    val n = timed("corpus count")(u.count())
    val k = graft.operators.Clustering.sizedK(n, targetClusterSize = 650)
    println(s"[cliff] n=$n k=$k")
    val base = u.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val model = timed("kmeans fit")(
      graft.operators.Clustering.fit(base, col("id"), col("vec"), k, 3))
    val assigned = timed("assign + capBuckets (count)") {
      val a = graft.operators.Dedup.capBuckets(
        graft.operators.Clustering.assign(base, col("vec"), model.centroids)
          .select("cluster", "id", "vec"),
        Seq("cluster"), 10000, "semdedup_probe")
      a.write.format("noop").mode("overwrite").save(); a
    }
    timed("pair join + sim filter (noop)") {
      val l = assigned.select(col("cluster"), col("id").as("id_a"), col("vec").as("vec_a"))
      val r = assigned.select(col("cluster"), col("id").as("id_b"), col("vec").as("vec_b"))
      l.join(r, Seq("cluster"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", round(graft.operators.Similarity.cosine(col("vec_a"), col("vec_b")), 6))
        .filter(col("sim") >= 0.9)
        .write.format("noop").mode("overwrite").save()
    }
    timed("FULL ext_semdedup rep (noop)") {
      graft.SparkEntry.queries("ext_semdedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
