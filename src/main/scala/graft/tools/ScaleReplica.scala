package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build an N× volume replica of a testdata scale-factor dir
  * (for scaling-receipt bench runs beyond the largest shipped SF; see
  * SCALE.md). NOT part of the engine — a measurement harness.
  *
  * Each copy i gets its keys shifted by i × 1e9 so referential joins
  * still resolve (orders↔lineitem↔customer etc. stay consistent within
  * a copy and never collide across copies). Content columns are made
  * DISTINCT per copy — documents get a per-copy substitution cipher and
  * embeddings a per-copy array rotation — so near-dup/LSH workloads
  * scale like a bigger corpus (linearly more clusters), not like one
  * corpus duplicated N times (quadratically more candidate pairs, which
  * would measure the DATA construction, not the engine).
  *
  * Usage: runMain graft.tools.ScaleReplica <srcDir> <destDir> <factor>
  */
object ScaleReplica {

  private val Stride = 1000000000L

  private def shifted(df: DataFrame, copy: Int, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(copy * Stride)))

  private def replicate(
      spark: SparkSession, src: String, dest: String, name: String,
      factor: Int)(perCopy: (DataFrame, Int) => DataFrame): Unit = {
    val base = spark.read.parquet(s"$src/$name.parquet") // raw: no ts rebuild
    val out = (0 until factor).map(i => perCopy(base, i)).reduce(_ unionByName _)
    out.write.mode("overwrite").parquet(s"$dest/$name.parquet")
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dest, factorStr) = args.take(3)
    val factor = factorStr.toInt
    // Content distinctness holds only while each copy gets a UNIQUE cipher
    // rotation (25 non-identity rotations + identity) — past that, copies
    // would repeat texts and reintroduce the quadratic-pair artifact this
    // tool exists to avoid. Embedding rotations cycle at dim-1 (=63 for
    // the 64-d testdata), so 26 is the binding bound.
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] to keep per-copy content distinct (got $factor)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dimension tables: copy once, unshifted
    Seq("region", "nation").foreach(n =>
      replicate(spark, src, dest, n, 1)((df, _) => df))

    replicate(spark, src, dest, "customer", factor)((df, i) =>
      shifted(df, i, Seq("c_custkey")))
    replicate(spark, src, dest, "orders", factor)((df, i) =>
      shifted(df, i, Seq("o_orderkey", "o_custkey")))
    replicate(spark, src, dest, "lineitem", factor)((df, i) =>
      shifted(df, i, Seq("l_orderkey", "l_partkey", "l_suppkey")))
    // part names get the same per-copy cipher as documents (below):
    // fuzzy-join workloads must see factor× more DISTINCT dirty keys,
    // not the same 64 names at factor× multiplicity — which would
    // measure the replica's construction (quadratic match expansion),
    // not the engine
    val azPart = "abcdefghijklmnopqrstuvwxyz"
    replicate(spark, src, dest, "part", factor)((df, i) =>
      shifted(df, i, Seq("p_partkey"))
        .withColumn("p_name",
          translate(col("p_name"), azPart, azPart.drop(i) + azPart.take(i))))
    replicate(spark, src, dest, "supplier", factor)((df, i) =>
      shifted(df, i, Seq("s_suppkey")))
    // events.ts stays nanos-long (raw read) so graft.Tables rebuilds it
    // identically on the replica
    replicate(spark, src, dest, "events", factor)((df, i) =>
      shifted(df, i, Seq("event_id", "user_id")))

    // documents: per-copy lowercase substitution cipher — shingle/token
    // structure is preserved (lengths, whitespace, punctuation) but
    // cross-copy texts are unrelated, so LSH sees factor× more clusters
    val az = "abcdefghijklmnopqrstuvwxyz"
    replicate(spark, src, dest, "documents", factor) { (df, i) =>
      // copy 0 = identity; copies 1..25 each get a distinct nonzero
      // rotation — the [1, 26] factor bound above keeps i itself in range
      val k = i
      val rot = az.drop(k) + az.take(k)
      shifted(df, i, Seq("doc_id"))
        .withColumn("text", translate(col("text"), az, rot))
    }

    // embeddings: per-copy array rotation — norms and within-copy
    // pairwise cosines are exactly preserved
    replicate(spark, src, dest, "embeddings", factor) { (df, i) =>
      val d = shifted(df, i, Seq("vec_id"))
      if (i == 0) d
      else {
        // offset i stays in [1, dim-1] because factor <= 26 (required
        // above) and the embedding fixtures are 64-d — no cycling needed
        val dim = size(col("embedding"))
        val off = lit(i)
        d.withColumn("embedding",
          concat(
            slice(col("embedding"), off + 1, dim),
            slice(col("embedding"), lit(1), off)))
      }
    }

    println(s"replica written: $dest (${factor}x $src)")
    spark.stop()
  }
}
