package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev probe: ext_embedding_neardup wall + sizing across replica scales
  * (the r9 cost-model receipt). Not part of the contract surface. */
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq match {
        case Seq() => Seq("/root/testdata/sf0.1", "/tmp/graft_10x", "/tmp/graft_26x")
        case ds => ds
      }) {
      val e = Tables(spark, dir, "embeddings")
      val planted = e.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"),
          concat(slice(col("embedding"), 1, 63), array(lit(0.0f))).as("embedding"))
      val u = e.select("vec_id", "embedding").unionByName(planted)
      val named = u.select(col("vec_id").as("id"), col("embedding").as("v"))
      val (bits, nb, n) = Dedup.sizedEmbeddingBands(named, col("v"), 0.9)
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val cnt = Dedup.embeddingNearDupPairs(u, col("vec_id"), col("embedding"),
          threshold = 0.9, autoSize = true, estimatePlanes = 64).count()
        ((System.nanoTime() - t0) / 1e9, cnt)
      }
      println(f"[size] $dir n=$n bits=$bits bands=$nb " +
        f"wall_min=${walls.map(_._1).min}%.2f s pairs=${walls.head._2}")
    }
    spark.stop()
  }
}
