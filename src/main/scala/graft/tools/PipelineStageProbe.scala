package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing}

/** Dev probe: per-stage wall-clock split of the curateDedupPack
  * pipeline (ext_pipeline_e2e) — screen / LSH-pairs / clusters /
  * packing — so optimization effort lands where the time is.
  * Matches the bench session settings. Usage: <sfDir> [cpus]
  */
object PipelineStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables(spark, sfDir, "documents")

    // warmup: session + parquet footer + codegen init
    noop(docs.limit(1))

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val screened = docs
        .filter(TextFunctions.langId(col("text")) === "en" &&
          TextFunctions.qualityScore(col("text")) >= 0.5)
        .select(col("doc_id"), col("text"))
      time("screen (scan+langId+quality)") { noop(screened) }
      time("screen ids only") { noop(screened.select("doc_id")) }
      time("minhash sig only") {
        noop(screened.select(col("doc_id"),
          graft.functions.expressions.GraftFunctions
            .minhash_sig(col("text"), 5, 64, 42L).as("sig")))
      }
      val pairs = Dedup.minhashNearDupPairs(
        screened, col("doc_id"), col("text"),
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      time("pairs (LSH+verify)") { noop(pairs) }
      if (rep == 2) {
        // candidate volume: how many pairs reach the exact-jaccard verify
        val banded = screened.select(
          col("doc_id").as("id"),
          explode(TextFunctions.bound(
            graft.functions.expressions.GraftFunctions
              .minhash_sig(col("text"), 5, 64, 42L)) { sig =>
            array((0 until 8).map { b =>
              struct(lit(b).as("band"),
                xxhash64(slice(sig, b * 8 + 1, 8)).as("bhash"))
            }: _*)
          }).as("bb"))
          .select(col("id"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
        val cand = banded.select(col("band"), col("bhash"), col("id").as("id_a"))
          .join(banded.select(col("band"), col("bhash"), col("id").as("id_b")),
            Seq("band", "bhash"))
          .filter(col("id_a") < col("id_b"))
          .dropDuplicates("id_a", "id_b")
        println(s"[stage] candidates=${cand.count()} verified=${pairs.count()}")
      }
      val keepers = time("clusters (iterative)") {
        Dedup.clusters(
          screened, pairs, col("doc_id"), col("id_a"), col("id_b"))
          .filter(col("id") === col("cluster_id"))
          .select(col("id").as("doc_id"))
          .join(screened, Seq("doc_id"))
      }
      time("keepers+pack (end stage)") {
        noop(Packing.concatChunk(keepers, col("doc_id"),
          TextFunctions.tokenCount(col("text")),
          capacity = 512, nShards = 8).orderBy("doc_id"))
      }
      time("FULL curateDedupPack") {
        noop(graft.operators.Pipelines.curateDedupPack(
          docs, col("doc_id"), col("text")).orderBy("doc_id"))
      }
    }
    spark.stop()
  }
}
