package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Stage-cost probe for ext_embedding_neardup (r7): where do the 2.7 s
  * at sf0.1 go — bucketing, the banded self-join, dedup, or the exact
  * cosine verify? Not part of the contract surface.
  */
object EmbNearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    val e = Tables(spark, dir, "embeddings")
    val planted = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000L).as("vec_id"),
        concat(slice(col("embedding"), 1, 63), array(lit(0.0f))).as("embedding"))
    val u = e.select("vec_id", "embedding").unionByName(planted)
    println(s"[probe] corpus rows=${u.count()}")
    val planes = Similarity.hyperplanes(64, 16, 42L)
    val named = u.select(col("vec_id").as("id"), col("embedding").as("v"))
    val bucketed = named
      .withColumn("bucket", explode(Similarity.signatureBuckets(col("v"), planes, 8)))
      .select(col("bucket"), col("id"))
    timed("bucketing pass (count)")(println(s"[probe]   bucket rows=${bucketed.count()}"))
    val hot = bucketed.groupBy("bucket").agg(count(lit(1)).as("n"))
    timed("bucket histogram") {
      hot.orderBy(col("n").desc).limit(5).collect()
        .foreach(r => println(s"[probe]   bucket ${r.get(0)} n=${r.get(1)}"))
    }
    val pairs = bucketed.select(col("bucket"), col("id").as("id_a"))
      .join(bucketed.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
    timed("banded self-join (count, no cap, no dedup)")(
      println(s"[probe]   raw pairs=${pairs.count()}"))
    val dd = pairs.dropDuplicates("id_a", "id_b")
    timed("dedup (count)")(println(s"[probe]   deduped=${dd.count()}"))
    for ((np, b) <- Seq((16, 8), (64, 8), (128, 16))) {
      val out = timed(s"operator nPlanes=$np bands=$b (collect)") {
        Dedup.embeddingNearDupPairs(u, col("vec_id"), col("embedding"),
          threshold = 0.9, nPlanes = np, bands = b).collect()
      }
      val plantedRec = out.count(r => r.getLong(1) == r.getLong(0) + 100000L)
      println(s"[probe]   pairs=${out.length} planted=$plantedRec/50")
    }
    spark.stop()
  }
}
