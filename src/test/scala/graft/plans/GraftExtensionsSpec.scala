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
        |  size(minhash_sig('some document text', 5, 16, 42L)) AS k,
        |  word_ngrams('a b c', 2) AS wg,
        |  size(winnowed_fingerprints('abcdefghij', 4, 1)) AS nfp
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("sh") != 0L)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-9)
    assert(r.getAs[Double]("jac") == 1.0)
    assert(r.getAs[Int]("k") == 16)
    assert(r.getSeq[String](r.fieldIndex("wg")) == Seq("a b", "b c"))
    assert(r.getAs[Int]("nfp") == 7) // 10 - 4 + 1 windows, modP=1 keeps all
  }

  test("rolling_hash: reference fold, SQL parity, null/empty/unicode") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    GraftExtensions.register(spark)
    // independent reference fold over code points
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val df = Seq(
      Some("the quick brown fox"),
      Some(""),
      Some("héllo wörld 你好"), // multi-byte code points
      None).toDF("t")
    val got = df.select(graft.functions.expressions.GraftFunctions
      .rolling_hash(col("t")).as("h")).collect()
    assert(got(0).getLong(0) == ref("the quick brown fox"))
    assert(got(1).getLong(0) == 0L)
    assert(got(2).getLong(0) == ref("héllo wörld 你好"))
    assert(got(3).isNullAt(0), "NULL text must hash to NULL")
    val viaSql = spark.sql("SELECT rolling_hash('the quick brown fox') AS h")
      .collect().head.getLong(0)
    assert(viaSql == got(0).getLong(0))
  }

  test("FoldSelfSimilarity rewrites ngram_jaccard(x,x,n), preserving NULLs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(Some("some document"), None).toDF("t")
      .select(graft.functions.expressions.GraftFunctions
        .ngram_jaccard(col("t"), col("t"), 3).as("self"))
    val folded = FoldSelfSimilarity(df.queryExecution.analyzed)
    assert(!folded.toString.toLowerCase.contains("ngramjaccard"),
      s"self-similarity not folded:\n$folded")
    // nullable input folds to IF(ISNULL(t), NULL, 1.0) — NULL rows stay NULL
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).isNullAt(0), "NULL input must stay NULL after the fold")
  }

  test("FoldSelfSimilarity leaves cosine_sim(x,x) alone (zero-norm → NaN)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(Array(0.0f, 0.0f)).toDF("v")
      .select(graft.functions.expressions.GraftFunctions
        .cosine_sim(col("v"), col("v")).as("self"))
    val folded = FoldSelfSimilarity(df.queryExecution.analyzed)
    assert(folded.toString.toLowerCase.contains("cosinesim"),
      s"cosine_sim self-fold must NOT fire (would mask zero-vector NaN):\n$folded")
    assert(df.collect().head.getDouble(0).isNaN)
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

  test("SQL cdc_chunks equals the Column-API cdc_chunks") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val viaSql = spark
      .sql(s"SELECT cdc_chunks('$text', 16, 4) AS c")
      .selectExpr("explode(c) AS e").select("e.*")
      .collect().map(_.toString).toSeq
    val viaCol = Seq(text).toDF("t")
      .select(graft.functions.expressions.GraftFunctions
        .cdc_chunks($"t", 16, 4).as("c"))
      .selectExpr("explode(c) AS e").select("e.*")
      .collect().map(_.toString).toSeq
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }
}
