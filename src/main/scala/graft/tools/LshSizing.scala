package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Dev receipt: LSH band sizing vs corpus size (SCALE.md). Times
  * MinHash near-dup candidate generation at two band widths on the same
  * corpus and prints candidate counts + wall time — demonstrating that
  * rowsPerBand (= numHashes/bands) is the dial that keeps candidate
  * volume linear as the corpus grows, per the standard S-curve
  * P(candidate) = 1 - (1 - s^r)^b.
  *
  * Usage: runMain graft.tools.LshSizing <docsDir> [bandsA bandsB]
  */
object LshSizing {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bandsA = if (args.length > 1) args(1).toInt else 8 // r=4
    val bandsB = if (args.length > 2) args(2).toInt else 4 // r=8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"corpus: ${docs.count()} docs")
    Seq(bandsA, bandsB).foreach { bands =>
      val t0 = System.nanoTime()
      val n = Dedup.minhashNearDupPairs(
        docs, col("doc_id"), col("text"),
        shingleN = 5, numHashes = 32, bands = bands, threshold = 0.0,
        topK = Some(50)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"bands=$bands (r=${32 / bands}): $n%d pairs surfaced, $dt%.1f s")
    }
    spark.stop()
  }
}
