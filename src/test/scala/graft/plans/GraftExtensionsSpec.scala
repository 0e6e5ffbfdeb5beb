package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  simhash64('the quick brown fox') AS sh,
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        |  ngram_jaccard('abcdefgh', 'abcdefgh', 3) AS jac,
        |  size(minhash_sig('some document text', 5, 16, 42L)) AS k
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("sh") != 0L)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-9)
    assert(r.getAs[Double]("jac") == 1.0)
    assert(r.getAs[Int]("k") == 16)
  }

  test("FoldSelfSimilarity rewrites cosine_sim(x,x) to a literal 1.0") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f))).toDF("v")
      .select(graft.functions.expressions.GraftFunctions
        .cosine_sim(col("v"), col("v")).as("self"))
    val folded = FoldSelfSimilarity(df.queryExecution.analyzed)
    assert(!folded.toString.contains("cosine_sim"),
      s"self-similarity not folded:\n$folded")
    assert(df.collect().head.getDouble(0) == 1.0 ||
      math.abs(df.collect().head.getDouble(0) - 1.0) < 1e-12)
  }

  test("SQL simhash64 equals the Column-API simhash64") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq("identical text body").toDF("t")
    val viaSql = spark.sql("SELECT simhash64('identical text body') AS s").collect().head.getLong(0)
    val viaCol = df.select(
      graft.functions.expressions.GraftFunctions.simhash64($"t").as("s"))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
  }
}
