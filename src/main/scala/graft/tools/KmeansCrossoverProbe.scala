package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Dev receipt: single-level vs two-level KMeans wall time as k grows —
  * the measurement behind Clustering.fit's dispatch threshold. Single
  * level pays O(n·k·dim) per pass (every vector scores every centroid,
  * and the k·dim centroid literal is replanned per iteration);
  * two-level pays O(n·2√k·dim). The curves cross in the low hundreds
  * of k on this corpus.
  *
  * Usage: runMain graft.tools.KmeansCrossoverProbe <sfDir>
  */
object KmeansCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    println(s"corpus: ${e.count()} vectors")
    for (k <- Seq(16, 64, 128, 256, 512)) {
      def timed(label: String)(f: => Clustering.KMeansModel): Unit = {
        val t0 = System.nanoTime()
        val m = f
        println(f"  k=$k%4d $label: ${(System.nanoTime() - t0) / 1e9}%6.1f s " +
          f"(${m.centroids.length} centroids, converged=${m.converged})")
      }
      timed("single") {
        Clustering.kmeans(e, col("vec_id"), col("embedding"), k, maxIters = 5)
      }
      timed("two-lvl") {
        Clustering.kmeansTwoLevel(e, col("vec_id"), col("embedding"), k, maxIters = 5)
      }
    }
    spark.stop()
  }
}
