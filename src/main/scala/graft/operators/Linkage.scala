package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Probabilistic record linkage (Fellegi–Sunter 1969) — the
  * entity-resolution scoring layer between blocking (any candidate
  * join: [[FuzzyJoin]], exact keys, LSH) and a link/review/reject
  * decision. Classic use in a data pipeline: reconciling a re-crawled
  * or vendor-delivered record file against the master corpus, where
  * exact keys are unreliable and field-level evidence must be weighed.
  *
  * Each compared field i carries two driver-side constants from its
  * m/u probabilities (m = P(agree | same entity), u = P(agree |
  * different entities)): the agreement weight log₂(mᵢ/uᵢ) and the
  * disagreement weight log₂((1−mᵢ)/(1−uᵢ)). The pair score is the sum
  * of per-field terms; two thresholds split decisions into
  * link / possible (clerical review) / non-link.
  *
  * Cross-engine determinism — stronger than the quantization family:
  * the weights are computed ONCE on the driver and embedded as double
  * LITERALS (Double.toString is the shortest representation that
  * round-trips, the lshPlanesSql precedent), and the per-row score is
  * a FIXED left-to-right fold of those literals — no aggregation
  * across rows, no transcendental in the engine, bit-exact replay.
  *
  * 100 TB shape: scoring is pure map-side codegen over the candidate
  * table — zero shuffle beyond what the caller's blocking join already
  * paid; n fields = n CASE expressions fused into one projection.
  */
object Linkage {

  /** One compared field: `name` for reporting, `agree` a BOOLEAN column
    * over the candidate-pair table, and the field's m/u probabilities
    * (0 < u < m < 1 — agreement must be evidence FOR a link). */
  final case class Field(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"field $name needs 0 < u < m < 1, got m=$m u=$u")
    private[Linkage] def agreeWeight: Double =
      math.log(m / u) / math.log(2.0)
    private[Linkage] def disagreeWeight: Double =
      math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Score every candidate pair and decide. A null agreement (one side
    * missing the field) contributes ZERO weight — missing data is no
    * evidence either way, the standard FS convention.
    *
    * Output: the pair id columns + n_agree + score (6dp) + decision
    * ('link' >= upper, 'possible' >= lower, else 'non_link'). */
  def linkScore(
      candidates: DataFrame,
      idL: Column,
      idR: Column,
      fields: Seq[Field],
      upper: Double,
      lower: Double): DataFrame = {
    require(fields.nonEmpty, "linkScore needs at least one field")
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    val terms = fields.map { f =>
      when(f.agree.isNull, lit(0.0))
        .when(f.agree, lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    }
    val agreeCount = fields.map(f =>
      when(f.agree.isNotNull && f.agree, 1L).otherwise(0L))
      .reduceLeft(_ + _)
    val score = terms.reduceLeft(_ + _) // fixed left-to-right fold
    candidates.select(
      idL.as("id_l"),
      idR.as("id_r"),
      agreeCount.as("n_agree"),
      round(score, 6).as("score"),
      when(score >= upper, "link")
        .when(score >= lower, "possible")
        .otherwise("non_link").as("decision"))
  }
}
