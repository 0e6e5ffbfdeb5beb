package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Dev receipt (VERDICT r13 ask #5): pcaPower GRAM path vs the
  * covariance-free multi-pass path, A/B at the contract query's shape
  * (3 iterations over the embeddings corpus). One VARIANT per JVM —
  * r13 lesson (d): probe walls in one JVM are position-dominated, so
  * absolute A/B needs a fresh JVM per variant, min-of-3 within it.
  *
  * Usage: runMain graft.tools.PcaGramProbe <sfDir> <gram|passes>
  */
object PcaGramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    require(variant == "gram" || variant == "passes", s"variant? $variant")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val limit = if (variant == "gram") 128 else 0 // 0 forces the pass path
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val n = Similarity.pcaPower(e, col("embedding"), iters = 3,
        gramDimLimit = limit).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pca-gram] $variant run$i: $sec%.3f s ($n rows)")
      sec
    }
    println(f"[pca-gram] $variant min-of-3: ${times.min}%.3f s")
    spark.stop()
  }
}
