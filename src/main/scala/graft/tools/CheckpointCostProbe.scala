package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Checkpointing, Graph}
import graft.operators.TextPipeline

/** Dev probe (r10 verdict ask #7): put a MEASURED point on the
  * `Checkpointing.Reliable` cost claim. GraphSpec pins bit-parity and
  * that durable files are written; this probe runs the contract
  * PageRank (token co-occurrence graph, 5 rounds) at a replica scale
  * under `Local` (localCheckpoint) and `Reliable(dir)` (durable
  * `Dataset.checkpoint`) and reports wall clocks, result parity, and
  * the bytes the durable mode persisted — the quantified trade: the
  * DFS write cost per round you pay so a 1000-executor chain survives
  * churn without a restart.
  *
  * Usage: runMain graft.tools.CheckpointCostProbe <sfDir> [reps]
  */
object CheckpointCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/rep10x")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")
    val edges = TextPipeline.skipgramPairCounts(docs, col("text"), window = 1)

    def run(mode: Checkpointing.Mode): (Double, Array[String]) = {
      val t0 = System.nanoTime()
      val rows = Graph.pageRank(edges, col("tok_a"), col("tok_b"), col("n_ab"),
          checkpoint = mode)
        .orderBy(col("pr").desc, col("node"))
        .collect().map(_.toString)
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt-cost")
    val localWalls = (1 to reps).map(_ => run(Checkpointing.Local))
    val durableWalls = (1 to reps).map(_ => run(Checkpointing.Reliable(ckptDir.toString)))
    val parity = localWalls.head._2.sameElements(durableWalls.head._2)
    val bytes = java.nio.file.Files.walk(ckptDir).iterator()
    var persisted = 0L
    bytes.forEachRemaining { p =>
      if (java.nio.file.Files.isRegularFile(p))
        persisted += java.nio.file.Files.size(p)
    }
    def fmt(xs: Seq[(Double, Array[String])]): String =
      xs.map(x => f"${x._1}%.2f").mkString("/")
    println(f"[ckpt-probe] $dir nodes=${localWalls.head._2.length}: " +
      f"Local walls ${fmt(localWalls)} s (min ${localWalls.map(_._1).min}%.2f), " +
      f"Reliable walls ${fmt(durableWalls)} s (min ${durableWalls.map(_._1).min}%.2f), " +
      f"parity=$parity, durable bytes=${persisted / 1024} KiB " +
      f"(${reps} runs x 6 cuts: shares + 5 rounds)")
    assert(parity, "Local and Reliable must be bit-identical")
    spark.stop()
  }
}
