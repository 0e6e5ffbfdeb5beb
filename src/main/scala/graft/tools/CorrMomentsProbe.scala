package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r14): where does ext_corr_matrix's time go, and which
  * exact-arithmetic formulation of the 15-moment aggregation is
  * fastest? The plan shape is already right (one scan, map-side
  * collapse, 1-row exchange), so the 13× gap vs the DuckDB replay is
  * per-row expression cost. Candidates, all cross-engine exact:
  *
  *  A  current: round(x·y, 4) → CAST(DECIMAL(38,4)) sums
  *     (one BigDecimal-backed Round + one wide-decimal conversion per
  *     product per row)
  *  B  compact decimals: same rounds but DECIMAL(18,4)/(18,6) operand
  *     casts (long-backed Decimal; sum buffers still widen)
  *  C  long ticks: values → 6dp tick LONGS once (4 rounds/row), then
  *     products are exact long multiplies, summed via
  *     CAST(DECIMAL(38,0)); value sums are plain long sums
  *     (exactness: xt·yt IS x₆·y₆ at 12dp, no product rounding at all;
  *     bound |x| ≤ ~3e3 after pre-scale keeps xt·yt < 2^63)
  *
  * Usage: runMain graft.tools.CorrMomentsProbe <sfDir> [reps]
  */
object CorrMomentsProbe {

  private def cols(df: DataFrame): DataFrame = df.select(
    round(col("l_discount").cast("double") * 100, 6).as("a"),
    round(col("l_extendedprice").cast("double") / 1000, 6).as("b"),
    round(col("l_quantity").cast("double"), 6).as("c"),
    round(col("l_tax").cast("double") * 100, 6).as("d"))

  private val names = Seq("a", "b", "c", "d")
  private val pairs = for {
    i <- names.indices; j <- (i + 1) until names.size
  } yield (names(i), names(j))

  private def variantA(df: DataFrame): DataFrame = cols(df).agg(
    count(lit(1)).as("n"),
    (names.map(n => sum(col(n).cast("decimal(38,6)")).as(s"s_$n")) ++
      names.map(n => sum(round(col(n) * col(n), 4).cast("decimal(38,4)")).as(s"q_$n")) ++
      pairs.map { case (x, y) =>
        sum(round(col(x) * col(y), 4).cast("decimal(38,4)")).as(s"p_${x}_$y") }): _*)

  private def variantB(df: DataFrame): DataFrame = cols(df).agg(
    count(lit(1)).as("n"),
    (names.map(n => sum(col(n).cast("decimal(18,6)")).as(s"s_$n")) ++
      names.map(n => sum(round(col(n) * col(n), 4).cast("decimal(18,4)")).as(s"q_$n")) ++
      pairs.map { case (x, y) =>
        sum(round(col(x) * col(y), 4).cast("decimal(18,4)")).as(s"p_${x}_$y") }): _*)

  private def variantC(df: DataFrame): DataFrame = {
    val t = cols(df).select(names.map(n =>
      round(col(n) * 1e6, 0).cast("long").as(n)): _*)
    t.agg(
      count(lit(1)).as("n"),
      (names.map(n => sum(col(n)).as(s"s_$n")) ++
        names.map(n => sum((col(n) * col(n)).cast("decimal(38,0)")).as(s"q_$n")) ++
        pairs.map { case (x, y) =>
          sum((col(x) * col(y)).cast("decimal(38,0)")).as(s"p_${x}_$y") }): _*)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables(spark, sfDir, "lineitem")
    def time(label: String, mk: DataFrame => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk(li).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-10s median ${ts(reps / 2)}%.3f s  min ${ts.head}%.3f  max ${ts.last}%.3f")
    }
    time("A d38", variantA)
    time("B d18", variantB)
    time("C ticks", variantC)
    // cross-check: all three must yield identical r for pair (a, b)
    def r(df: DataFrame, scaleS: Int, scaleQ: Int): Double = {
      val row = df.collect().head
      val n = row.getAs[Long]("n").toDouble
      def d(c: String, s: Int): Double =
        row.getAs[java.math.BigDecimal](c).doubleValue()
      val (sa, sb) = (d("s_a", scaleS), d("s_b", scaleS))
      val (qa, qb) = (d("q_a", scaleQ), d("q_b", scaleQ))
      val sp = d("p_a_b", scaleQ)
      (n * sp - sa * sb) / math.sqrt((n * qa - sa * sa) * (n * qb - sb * sb))
    }
    def rC(df: DataFrame): Double = {
      val row = df.collect().head
      val n = row.getAs[Long]("n").toDouble
      def l(c: String): Double = row.getAs[Long](c).toDouble / 1e6
      def d(c: String): Double =
        row.getAs[java.math.BigDecimal](c).doubleValue() / 1e12
      val (sa, sb) = (l("s_a"), l("s_b"))
      (n * d("p_a_b") - sa * sb) /
        math.sqrt((n * d("q_a") - sa * sa) * (n * d("q_b") - sb * sb))
    }
    println(f"rA ${r(variantA(li), 6, 4)}%.9f rB ${r(variantB(li), 6, 4)}%.9f rC ${rC(variantC(li))}%.9f")
    spark.stop()
  }
}
