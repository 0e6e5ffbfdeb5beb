package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Measurement probe behind the r7 fuzzy-join work: where do the
  * candidate pairs (and the wall time) come from at sf0.1 vs the 10×
  * replica? Prints per-stage row counts and timings for the exact
  * ext_fuzzy_join inputs. Not part of the contract surface.
  */
object FuzzyJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = 3; val maxDist = 1; val sigLen = maxDist * q + 1
    val parts = Tables(spark, dir, "part").filter(pmod(col("p_partkey"), lit(4L)) === 0)
    val lk = parts.select(col("p_name").as("key_l")).distinct().cache()
    val rk = parts.select(expr("substring(p_name, 2)").as("key_r")).distinct().cache()
    def grams(c: org.apache.spark.sql.Column) =
      when(length(c) >= q,
        array_distinct(transform(sequence(lit(1), length(c) - q + 1), i => c.substr(i, lit(q)))))
        .otherwise(array().cast("array<string>"))
    val gl = lk.select(col("key_l").as("sid"), explode(grams(col("key_l"))).as("gram"))
    val gr = rk.select(col("key_r").as("sid"), explode(grams(col("key_r"))).as("gram"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); a
    }
    println(s"[probe] distinct keys: left=${lk.count()} right=${rk.count()}")
    val gramDf = timed("gram frequency table") {
      gl.select("gram").unionAll(gr.select("gram")).groupBy("gram").agg(count(lit(1)).as("gdf")).cache()
    }
    println(s"[probe] vocab=${gramDf.count()}")
    def signature(g: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("sid").orderBy(col("gdf"), col("gram"))
      g.join(gramDf, Seq("gram")).withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= sigLen).select("sid", "gram")
    }
    val sl = timed("left signatures")(signature(gl).cache())
    val sr = timed("right signatures")(signature(gr).cache())
    println(s"[probe] sig rows: left=${sl.count()} right=${sr.count()}")
    val raw = timed("candidate join (count, no dedup)") {
      sl.withColumnRenamed("sid", "key_l")
        .join(sr.withColumnRenamed("sid", "key_r"), Seq("gram"))
        .count()
    }
    println(s"[probe] raw candidates=$raw")
    val lenPruned = timed("candidate join + length prune (count)") {
      sl.withColumnRenamed("sid", "key_l")
        .join(sr.withColumnRenamed("sid", "key_r"), Seq("gram"))
        .filter(abs(length(col("key_l")) - length(col("key_r"))) <= maxDist)
        .count()
    }
    println(s"[probe] length-pruned candidates=$lenPruned")
    val deduped = timed("dedup (count)") {
      sl.withColumnRenamed("sid", "key_l")
        .join(sr.withColumnRenamed("sid", "key_r"), Seq("gram"))
        .filter(abs(length(col("key_l")) - length(col("key_r"))) <= maxDist)
        .dropDuplicates("key_l", "key_r").count()
    }
    println(s"[probe] deduped candidates=$deduped")
    val verified = timed("verify levenshtein (count)") {
      sl.withColumnRenamed("sid", "key_l")
        .join(sr.withColumnRenamed("sid", "key_r"), Seq("gram"))
        .filter(abs(length(col("key_l")) - length(col("key_r"))) <= maxDist)
        .dropDuplicates("key_l", "key_r")
        .filter(levenshtein(col("key_l"), col("key_r")) <= maxDist).count()
    }
    println(s"[probe] true pairs (distinct keys)=$verified")

    // now the REAL operator, end-to-end and in slices
    val leftT = parts.select(col("p_partkey").as("id"), col("p_name").as("key"))
    val rightT = parts.select((col("p_partkey") + 5000000L).as("id"),
      expr("substring(p_name, 2)").as("key"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed("full contract query (join+select+orderBy)") {
      noop(graft.operators.FuzzyJoin.editDistanceJoin(leftT, rightT, maxDist = 1)
        .select("id_l", "id_r", "edit_dist").orderBy("id_l", "id_r"))
    }
    timed("editDistanceJoin, no orderBy") {
      noop(graft.operators.FuzzyJoin.editDistanceJoin(leftT, rightT, maxDist = 1)
        .select("id_l", "id_r", "edit_dist"))
    }
    val full = graft.operators.FuzzyJoin.editDistanceJoin(leftT, rightT, maxDist = 1)
    println(s"[probe] output rows=${timed("output count")(full.count())}")
    timed("contract query, repartition before orderBy") {
      noop(graft.operators.FuzzyJoin.editDistanceJoin(leftT, rightT, maxDist = 1)
        .select("id_l", "id_r", "edit_dist").repartition(32).orderBy("id_l", "id_r"))
    }
    val built = timed("CALL editDistanceJoin (eager probes only)") {
      graft.operators.FuzzyJoin.editDistanceJoin(leftT, rightT, maxDist = 1)
        .select("id_l", "id_r", "edit_dist")
    }
    timed("execute noop, no orderBy (pre-built)")(noop(built))
    timed("execute noop, repartition+orderBy (pre-built)") {
      noop(built.repartition(32).orderBy("id_l", "id_r"))
    }
    println(s"[probe] part scan partitions=${parts.rdd.getNumPartitions}, rows=${parts.count()}")
    println(s"[probe] built output partitions=${built.rdd.getNumPartitions}")
    spark.stop()
  }
}
