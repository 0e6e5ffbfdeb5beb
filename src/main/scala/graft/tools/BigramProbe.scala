package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Dev probe: bigramLogProb formulation shoot-out at the 10x replica. */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    val dir = args.headOption.getOrElse("/tmp/graft_10x")
    val docs = Tables(spark, dir, "documents")
    val arr = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
    def bigramsRaw = docs
      .select(col("doc_id"), arr.as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    // variant A: checkpoint raw bigrams; model from checkpoint; broadcast join
    val bgA = timed("A: tokenize+checkpoint")(bigramsRaw.localCheckpoint(true))
    val modelA = timed("A: model agg+window")(
      bgA.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
        .localCheckpoint(true))
    val vocabA = vocabOf(modelA)
    timed("A: score join (broadcast model) + agg")(
      bgA.join(broadcast(modelA), Seq("w1", "w2")).crossJoin(broadcast(vocabA))
        .withColumn("neglogp", (-log((col("c12").cast("double") + lit(0.5)) /
          (col("c1").cast("double") + lit(0.5) * col("v").cast("double"))))
          .cast("decimal(18,6)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("neglogp")).cast("double") / count(lit(1))).as("bigram_nll"))
        .write.format("noop").mode("overwrite").save())

    // variant B: no checkpoint at all, but broadcast the model subtree
    val modelB = bigramsRaw.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
    timed("B: no checkpoint, broadcast model, 3 scans")(
      bigramsRaw.join(broadcast(modelB), Seq("w1", "w2")).crossJoin(broadcast(vocabOf(modelB)))
        .withColumn("neglogp", (-log((col("c12").cast("double") + lit(0.5)) /
          (col("c1").cast("double") + lit(0.5) * col("v").cast("double"))))
          .cast("decimal(18,6)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("neglogp")).cast("double") / count(lit(1))).as("bigram_nll"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
  private def vocabOf(model: org.apache.spark.sql.DataFrame) =
    model.select(explode(array(col("w1"), col("w2"))).as("t"))
      .agg(count_distinct(col("t")).as("v"))
}
