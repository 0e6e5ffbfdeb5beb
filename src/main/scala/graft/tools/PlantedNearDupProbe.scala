package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup}

/** Dev receipt behind the round-6 near-dup ORACLE upgrade: measures, on
  * the real testdata, (a) whether recall-oriented MinHash banding
  * surfaces every true >= 0.5-Jaccard pair (the corpus turns out to
  * contain ~25 genuine near-dup pairs at sf0.01 — so the oracle can be
  * the full-quadratic DuckDB ground truth, no planting needed), and
  * (b) whether the planted-pair constructions used by the SimHash /
  * embedding / SemDeDup certificates are recovered in full (hamming
  * bound, LSH bucket recovery, co-clustering).
  *
  * Usage: runMain graft.tools.PlantedNearDupProbe <sfDir>
  */
object PlantedNearDupProbe {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // (1) MinHash threshold mode at both recall bandings
    for (bands <- Seq(16, 8)) {
      val mh = timed(s"minhash n=64 b=$bands thr=0.5") {
        Dedup.minhashNearDupPairs(
          docs, col("doc_id"), col("text"),
          shingleN = 5, numHashes = 64, bands = bands, threshold = 0.5).collect()
      }
      println(s"  pairs: ${mh.length}")
    }

    // (2) incremental near-dup, same bandings
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 40)
        .withColumn("doc_id", col("doc_id") + 1000L)
        .withColumn("text",
          concat(col("text"), lit(" minor trailing edit appended here"))))
    for (bands <- Seq(16, 8)) {
      val inc = timed(s"incremental n=64 b=$bands thr=0.5") {
        Dedup.incrementalNearDup(
          batch, corpus, col("doc_id"), col("text"), col("doc_id"), col("text"),
          numHashes = 64, bands = bands, threshold = 0.5).collect()
      }
      println(s"  pairs: ${inc.length}")
    }

    // (3) SimHash planted: cosmetic edit (upper + doubled spaces) — the
    // certificate mutation; normalization-invariant, so hamming must be
    // exactly 0 on every pair. (Drop-one-token edits measured hamming
    // up to 8 on this corpus — too strong for the <=3 pigeonhole.)
    def mutateCosmetic(df: DataFrame): DataFrame = df
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", regexp_replace(upper(col("text")), lit(" "), lit("  ")))
    val planted = docs.filter(col("doc_id") < 50)
    val simCorpus = docs.select("doc_id", "text")
      .unionByName(mutateCosmetic(planted).select("doc_id", "text"))
    val hams = timed("simhash planted hamming") {
      val sh = simCorpus.select(col("doc_id"),
        graft.functions.expressions.GraftFunctions.simhash64(col("text")).as("sh"))
      sh.filter(col("doc_id") < 50).alias("a")
        .join(sh.filter(col("doc_id") >= 100000).alias("b"),
          col("b.doc_id") === col("a.doc_id") + 100000L)
        .select(Dedup.hamming(col("a.sh"), col("b.sh")).cast("long").as("h"))
        .collect().map(_.getLong(0))
    }
    println(s"  hamming min=${hams.min} max=${hams.max} over ${hams.length} pairs; <=3: ${hams.count(_ <= 3)}")
    val simPairs = timed("simhash planted recovery") {
      Dedup.simhashNearDupPairs(simCorpus, col("doc_id"), col("text"), maxHamming = 3)
        .filter(col("id_b") === col("id_a") + 100000L).count()
    }
    println(s"  recovered planted: $simPairs/50")

    // (4) embedding planted: zero last coordinate, bands=8
    val plantedVec = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000L).as("vec_id"),
        concat(slice(col("embedding"), 1, 63),
          array(lit(0.0f))).as("embedding"))
    val embCorpus = emb.select("vec_id", "embedding").unionByName(plantedVec)
    val sized = Dedup.sizedEmbeddingBands(
      embCorpus.select(col("embedding").as("v")), col("v"), 0.9)
    println(s"  sizedEmbeddingBands: bits=${sized._1} bands=${sized._2} n=${sized._3}")
    val embRec = timed("embedding planted autoSized thr=0.9") {
      Dedup.embeddingNearDupPairs(
        embCorpus, col("vec_id"), col("embedding"),
        threshold = 0.9, autoSize = true).cache()
    }
    println(s"  pairs: ${embRec.count()}; planted self: " +
      s"${embRec.filter(col("id_b") === col("id_a") + 100000L).count()}/50")

    // (5) semdedup planted: zero-FIRST-coordinate copies (pure slice —
    // no float arithmetic, so the oracle reproduces vectors bit-exactly),
    // co-clustering recovery at threshold 0.9
    val scaled = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000L).as("vec_id"),
        concat(array(lit(0.0f)), slice(col("embedding"), 2, 63)).as("embedding"))
    val semCorpus = emb.select("vec_id", "embedding").unionByName(scaled)
    val sem = timed("semdedup planted thr=0.9") {
      Clustering.semDedupPairs(
        semCorpus, col("vec_id"), col("embedding"),
        k = Clustering.sizedK(semCorpus.count(), targetClusterSize = 650),
        maxIters = 3, threshold = 0.9).cache()
    }
    println(s"  pairs: ${sem.count()}; planted self: " +
      s"${sem.filter(col("id_b") === col("id_a") + 100000L).count()}/50")

    spark.stop()
  }
}
