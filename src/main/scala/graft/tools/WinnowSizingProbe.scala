package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe (r10 verdict ask #3): does the corpus-sized winnowing
  * density keep the fingerprint index AN INDEX at replica scale, or
  * does it just get fast by dropping the signal? (SCALE.md r7 lesson:
  * wall-clock receipts without a cross-scale OUTPUT check proved
  * nothing when the emb-LSH guard silently emptied the result.)
  *
  * Checks, at the given replica dir:
  *  1. NESTING — sizedWinnowModP only emits multiples of the base
  *     modulus, so h ≡ 0 (mod sized) ⟹ h ≡ 0 (mod 8): the sized
  *     fingerprint set is a SUBSET of the fixed-density set, hence
  *     sized candidate pairs ⊆ fixed candidate pairs. Violations = a
  *     bug, asserted to zero.
  *  2. STRONG-PAIR RECALL — of the fixed-density pairs with n_shared ≥
  *     T (long shared substrings — the matches that still matter at
  *     corpus scale), how many survive the sized density? Reported for
  *     a ladder of T; the receipt line in SCALE.md quotes these.
  *  3. The same two checks for containmentPairs at its 0.5 threshold
  *     (strong = fixed containment ≥ 0.8).
  *
  * Usage: runMain graft.tools.WinnowSizingProbe <sfDir>
  */
object WinnowSizingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/rep26x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")
    val n = docs.count()
    val modP = Dedup.sizedWinnowModP(n)
    println(s"[probe] $dir: n=$n docs, sized modP=$modP (fixed=8)")

    val fixed = Dedup.substringFingerprintPairs(
        docs, col("doc_id"), col("text"), bucketCap = Int.MaxValue)
      .select(col("id_a"), col("id_b"), col("n_shared"))
    val sized = Dedup.substringFingerprintPairsAuto(
        docs, col("doc_id"), col("text"), bucketCap = Int.MaxValue)
      .select(col("id_a"), col("id_b"))
    val joined = fixed.join(sized.withColumn("in_sized", lit(1)),
      Seq("id_a", "id_b"), "full").cache()
    val orphans = joined.filter(col("n_shared").isNull).count()
    assert(orphans == 0, s"NESTING VIOLATED: $orphans sized-only pairs")
    val fixedPairs = joined.filter(col("n_shared").isNotNull).count()
    println(s"[probe] substring: fixed pairs=$fixedPairs, nesting holds (0 sized-only)")
    Seq(1L, 4L, 8L, 16L, 32L).foreach { t =>
      val strong = joined.filter(col("n_shared") >= t)
      val tot = strong.count()
      val kept = strong.filter(col("in_sized") === 1).count()
      println(f"[probe] substring recall at n_shared>=$t%-3d: $kept/$tot")
    }
    joined.unpersist()

    val fixedC = Dedup.containmentPairs(
        docs, col("doc_id"), col("text"),
        threshold = 0.5, bucketCap = Int.MaxValue)
      .select(col("id_a"), col("id_b"),
        greatest(col("containment_a"), col("containment_b")).as("cmax"))
    val sizedC = Dedup.containmentPairsAuto(
        docs, col("doc_id"), col("text"), bucketCap = Int.MaxValue)
      .select(col("id_a"), col("id_b"))
    val joinedC = fixedC.join(sizedC.withColumn("in_sized", lit(1)),
      Seq("id_a", "id_b"), "left").cache()
    val totC = joinedC.count()
    val strongC = joinedC.filter(col("cmax") >= 0.8)
    val strongTot = strongC.count()
    val strongKept = strongC.filter(col("in_sized") === 1).count()
    val anyKept = joinedC.filter(col("in_sized") === 1).count()
    println(s"[probe] containment: fixed pairs=$totC (sized kept $anyKept); " +
      s"strong (>=0.8) recall $strongKept/$strongTot")
    joinedC.unpersist()
    spark.stop()
  }
}
