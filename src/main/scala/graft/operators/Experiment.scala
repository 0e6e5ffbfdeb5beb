package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Experiment readout: the two-sample proportion z-test every
  * data-driven pipeline change ships behind (does the new dedup
  * threshold / quality cutoff move the conversion metric?). Input is
  * one row per experimental UNIT (user, document, session) with its
  * variant label and a boolean outcome; output is one row comparing
  * two named variants.
  *
  *   z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled
  *
  * Cross-engine determinism, the strongest class in the repo: every
  * operation in the chain (+, −, ×, ÷, sqrt) is IEEE-754
  * exactly-rounded, so the z statistic is bit-identical on any engine
  * with NO quantization discipline at all — sqrt is in the same exact
  * class as division (contrast ln/exp, which need the round-then-cast
  * treatment).
  *
  * 100 TB shape: ONE aggregation keyed on the variant label with
  * map-side partial counts (each partition collapses to ≤ |variants|
  * rows), then a broadcast single-row cross join — the B12 pattern;
  * a billion units cost one scan.
  */
object Experiment {

  /** Compare `variantA` against `variantB`. Rows with other variant
    * labels are ignored (multi-arm tables welcome); null outcomes are
    * non-conversions. `critical` is the |z| significance bar (1.96 ≈
    * two-sided 5%). Output: ALWAYS exactly one row — n/conv/rate per
    * arm (rates 6dp), z (6dp), and the significance verdict.
    *
    * Missing-arm visibility (ADVICE r10): an arm with zero units (a
    * mislabeled-variant typo upstream, a broken assignment) surfaces as
    * n=0/conv=0 with NULL rate, z, and verdict — loudly distinguishable
    * from "no significant difference", where the old two-filter +
    * 1×1-cross-join shape silently returned an EMPTY frame. The single
    * conditional aggregation also scans the units table once instead of
    * twice (the un-cached perArm subtree was evaluated per cross-join
    * side). */
  def abTest(
      units: DataFrame,
      variant: Column,
      converted: Column,
      variantA: String,
      variantB: String,
      critical: Double = 1.96): DataFrame = {
    require(variantA != variantB, "the two arms must differ")
    require(critical > 0, s"critical must be positive, got $critical")
    def armAgg(label: String, expr: Column): Column =
      coalesce(sum(when(col("arm") === label, expr)), lit(0L))
    val counts = units
      .select(variant.as("arm"),
        when(coalesce(converted, lit(false)), 1L).otherwise(0L).as("c"))
      .filter(col("arm").isin(variantA, variantB))
      .agg(
        armAgg(variantA, lit(1L)).as("n_a"),
        armAgg(variantA, col("c")).as("conv_a"),
        armAgg(variantB, lit(1L)).as("n_b"),
        armAgg(variantB, col("c")).as("conv_b"))
    val nullD = lit(null).cast("double")
    val pA = when(col("n_a") > 0,
      col("conv_a").cast("double") / col("n_a").cast("double"))
    val pB = when(col("n_b") > 0,
      col("conv_b").cast("double") / col("n_b").cast("double"))
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    // degenerate pool (nobody or everybody converted): both rates are
    // equal by construction — zero evidence, z = 0, not a 0/0 error
    // (ANSI mode throws DIVIDE_BY_ZERO even for doubles); an EMPTY arm
    // is a different animal — no comparison exists, z is NULL
    val z = when(col("n_a") === 0 || col("n_b") === 0, nullD)
      .otherwise(when(se === 0.0, lit(0.0)).otherwise((pA - pB) / se))
    counts.select(
      col("n_a"), col("conv_a"), round(pA, 6).as("rate_a"),
      col("n_b"), col("conv_b"), round(pB, 6).as("rate_b"),
      round(z, 6).as("z"),
      (abs(z) >= critical).as("significant"))
  }
}
