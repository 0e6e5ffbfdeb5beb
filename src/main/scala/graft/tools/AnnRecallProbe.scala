package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Dev receipt: ANN recall@k vs the exact brute-force baseline across
  * parameter settings — the calibration behind the `ext_ann_lsh_recall`
  * / `ext_ann_ivf_recall` contract queries, which certify (by DuckDB
  * hash) that the ANN machinery recovers the full exact top-k at
  * recall-oriented settings. This probe prints the recall surface so
  * the certified settings are chosen from measurement, not hope.
  *
  * Usage: runMain graft.tools.AnnRecallProbe <sfDir>
  */
object AnnRecallProbe {
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
    val corpus = e.select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val k = 10
    val exact = Similarity.bruteForceTopK(probes, corpus, k)
      .select("query_id", "vec_id").cache()
    val nExact = exact.count()
    println(s"corpus=${corpus.count()} exact-topk rows=$nExact")

    for (bands <- Seq(4, 8, 16)) {
      val ann = Similarity.lshTopK(probes, corpus, k, nPlanes = 16, bands = bands)
        .select("query_id", "vec_id")
      val hit = exact.join(ann, Seq("query_id", "vec_id"), "left_semi").count()
      println(f"lsh nPlanes=16 bands=$bands%2d: recall@$k = ${hit.toDouble / nExact}%.3f ($hit/$nExact)")
    }
    for (nCells <- Seq(8, 16, 32); nprobe <- Seq(nCells / 2, nCells * 5 / 8,
        nCells * 3 / 4, nCells * 7 / 8, nCells - 1, nCells).distinct) {
      val ann = Similarity.ivfTopK(probes, corpus, k, nCells = nCells, nprobe = nprobe)
        .select("query_id", "vec_id")
      val hit = exact.join(ann, Seq("query_id", "vec_id"), "left_semi").count()
      println(f"ivf nCells=$nCells%2d nprobe=$nprobe%2d: recall@$k = ${hit.toDouble / nExact}%.3f ($hit/$nExact)")
    }
    for (refine <- Seq(40, 80, 160, 320, 640)) {
      val ann = Similarity.pqTopK(probes, corpus, k, refine = refine)
        .select("query_id", "vec_id")
      val hit = exact.join(ann, Seq("query_id", "vec_id"), "left_semi").count()
      println(f"pq m=8 ksub=16 refine=$refine%3d: recall@$k = ${hit.toDouble / nExact}%.3f ($hit/$nExact)")
    }
    spark.stop()
  }
}
