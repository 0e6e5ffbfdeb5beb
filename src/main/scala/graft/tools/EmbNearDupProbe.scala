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
    // (bits × bands) sweep along the recall bound (1-p^bits)^bands <= 1e-4
    // at threshold 0.9, plus the r8 fixed default and the auto-sized
    // pick — interleaved twice so JVM warm-up noise can't favor a config
    val sized = Dedup.sizedEmbeddingBands(
      u.select(col("embedding").as("v")), col("v"), 0.9)
    println(s"[probe] sizedEmbeddingBands bits=${sized._1} bands=${sized._2} n=${sized._3}")
    for (round <- 1 to 2; (np, b) <- Seq((128, 16), (390, 39), (0, 0))) {
      val auto = np == 0
      val label = if (auto) "autoSize" else s"nPlanes=$np bands=$b"
      val out = timed(s"operator $label r$round (collect)") {
        Dedup.embeddingNearDupPairs(u, col("vec_id"), col("embedding"),
          threshold = 0.9, nPlanes = if (auto) 128 else np,
          bands = if (auto) 16 else b, autoSize = auto).collect()
      }
      val plantedRec = out.count(r => r.getLong(1) == r.getLong(0) + 100000L)
      println(s"[probe]   pairs=${out.length} planted=$plantedRec/50")
    }
    spark.stop()
  }
}
