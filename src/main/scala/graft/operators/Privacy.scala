package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Privacy screens for data release — the gate a pipeline runs
  * before handing aggregates or slices to a downstream consumer who
  * must not be able to re-identify rows: k-anonymity (does any
  * quasi-identifier combination isolate fewer than k individuals?) and
  * ε-differentially-private counts (release group volumes with
  * calibrated Laplace noise instead of exact values).
  *
  * Both are single-aggregation operators: one map-side-collapsing
  * groupBy each, output bounded by the number of combinations/groups —
  * the 100 TB shape is the B12 class (a billion rows cost one scan).
  */
object Privacy {

  /** k-anonymity audit over a quasi-identifier tuple (Sweeney 2002):
    * every combination of the quasi columns with its occupancy and an
    * `at_risk` flag (n < k — those rows isolate small groups and must
    * be generalized or suppressed before release). NULL values form
    * their own combination (both engines group NULLs together) — a
    * NULL ZIP code is still a quasi-identifier value.
    *
    * The full combination table is returned, not only the risky rows
    * (the B14 kept-empty-buckets discipline: the audit shows what was
    * checked); risky-row-only is one `.filter(col("at_risk"))` away.
    *
    * Determinism: pure integer counts and one integer comparison —
    * no float anywhere.
    *
    * Output: (quasi columns ..., n, at_risk), one row per observed
    * combination. */
  def kAnonymity(df: DataFrame, quasi: Seq[(String, Column)], k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=1 flags nothing), got $k")
    val names = quasi.map(_._1)
    require(names.distinct.size == names.size, s"duplicate names: $names")
    df.select(quasi.map { case (n, c) => c.as(n) }: _*)
      .groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** ε-DP group counts via the Laplace mechanism (Dwork et al. 2006):
    * each group's count is released as n + Lap(1/ε) — sensitivity 1
    * for a count, so the noise scale is 1/ε. The mechanism is REAL
    * (correctly calibrated Laplace), but the randomness is a SEEDED
    * DETERMINISTIC hash of the group key — the repo's replayability
    * contract (a second engine, or a re-run, produces the identical
    * release; also the textbook "memoize your noise" defense against
    * averaging attacks — re-running the release must NOT refresh the
    * noise).
    *
    * Uniform construction, engine-portable: u = (h₁₃ + ½) / 2⁵²,
    * where h₁₃ is the first 13 hex digits of md5(key ":" seed) read
    * as an integer by an UNROLLED positional sum (13 exact
    * multiply-adds — no hex cast, which SQL dialects disagree on).
    * 2⁵² = 16¹³, so the divide is an exact power-of-two scaling and u
    * is an exactly-representable double in (0,1), never 0 or 1 (the
    * +½ keeps |u−½| < ½ strictly, so ln(1−2|u−½|) is finite).
    * Inverse-CDF Laplace: noise = −sign(u−½) · ln(1−2|u−½|) / ε,
    * with the ln quantized round(·,9) (the freshness-decay
    * transcendental discipline) and the noise round(·,6).
    *
    * NULL group keys are coalesced to '__null__' and released too
    * (counted, never dropped).
    *
    * Output: (group_key, noisy_n 6dp, epsilon) — the TRUE count is
    * deliberately absent; this operator's output is the release. */
  def dpLaplaceCounts(
      df: DataFrame,
      group: Column,
      epsilon: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val counts = df
      .select(coalesce(group.cast("string"), lit("__null__")).as("group_key"))
      .groupBy("group_key").agg(count(lit(1)).as("n"))
      .withColumn("h", md5(concat(col("group_key"), lit(":"), lit(seed.toString))))
    // h13 = Σ digit_i · 16^(13−i): 13 exact long multiply-adds
    val h13 = (1 to 13).map { i =>
      (expr(s"instr('0123456789abcdef', substring(h, $i, 1))") - 1) *
        lit(1L << (4 * (13 - i)))
    }.reduce(_ + _)
    val u = (h13.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val v = u - lit(0.5)
    val lnq = round(log(lit(1.0) - lit(2.0) * abs(v)), 9)
    val noise = round(
      when(v >= 0, lit(-1.0)).otherwise(lit(1.0)) * lnq / lit(epsilon), 6)
    counts.select(
      col("group_key"),
      round(col("n").cast("double") + noise, 6).as("noisy_n"),
      lit(epsilon).as("epsilon"))
  }

  /** ℓ-diversity audit (Machanavajjhala et al. '07) — the attribute-
    * disclosure gate [[kAnonymity]] cannot provide: a group can hold
    * k=50 people and STILL leak ("all 50 share one diagnosis"), so
    * each quasi-identifier combination is scored by the diversity of
    * its SENSITIVE values — distinct-ℓ (how many values appear at
    * all) and entropy-ℓ = exp(H) (the effective number of equally-
    * likely values; a 99:1 group has distinct-ℓ 2 but entropy-ℓ
    * ≈ 1.06, and entropy catches it).
    *
    * NULL sensitive values form the class '__null__' — counted, never
    * dropped (a missing diagnosis field is itself information, and a
    * group that is 100% NULL is perfectly homogeneous).
    *
    * Determinism: class counts exact; each entropy term
    * (c/n)·ln(c/n) is quantized to DECIMAL(18,6) before the per-group
    * sum (the unigram-nll xsum discipline — exact, order-free), one
    * exp at the end, 4dp.
    *
    * 100 TB shape: one (quasi..., class)-keyed aggregate with
    * map-side partials, then a group-keyed fold of its ≤
    * |combinations|·|classes| rows. Nothing scales past the first
    * aggregate.
    *
    * Output: (quasi columns ..., n, l_distinct, entropy_l 4dp,
    * at_risk = l_distinct < l). */
  def lDiversity(
      df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2 (l=1 flags nothing), got $l")
    val names = quasi.map(_._1)
    require(names.distinct.size == names.size, s"duplicate names: $names")
    val classes = df
      .select(quasi.map { case (n, c) => c.as(n) } :+
        coalesce(sensitive.cast("string"), lit("__null__")).as("s"): _*)
      .groupBy((names :+ "s").map(col): _*)
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val p = col("c").cast("double") / col("n").cast("double")
    classes
      .withColumn("n", sum("c").over(w))
      .withColumn("term", (p * log(p)).cast("decimal(18,6)"))
      .groupBy(names.map(col): _*)
      .agg(
        max(col("n")).as("n"),
        count(lit(1)).as("l_distinct"),
        sum(col("term")).as("h_sum"))
      .select(names.map(col) ++ Seq(
        col("n"),
        col("l_distinct"),
        round(exp(-col("h_sum").cast("double")), 4).as("entropy_l"),
        (col("l_distinct") < l).as("at_risk")): _*)
  }

  /** t-closeness audit over a quasi-identifier tuple (Li, Li &
    * Venkatasubramanian, ICDE '07) — the third rung of the release
    * ladder: [[kAnonymity]] bounds group SIZE, [[lDiversity]] bounds
    * sensitive-value VARIETY, and t-closeness bounds the sensitive
    * DISTRIBUTION itself — a group whose salary mix is "diverse" but
    * skewed far from the population still tells an attacker plenty.
    * A group is t-close when the Earth Mover's Distance between its
    * sensitive distribution and the GLOBAL one is ≤ t; for an ordered
    * attribute over k categories the EMD has the closed form
    *
    *   EMD = (1/(k−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|
    *
    * (cumulative share differences — the paper's ordered-distance
    * instantiation).
    *
    * `sensitive` must be an ORDERED integer band (the caller
    * discretizes, e.g. `floor(salary/1000)`) — EMD's ground distance
    * needs the order, so NULL bands are screened out (a null cannot
    * sit on an ordered axis; audit null-rate separately via
    * [[graft.operators.Relational.profile]]-class screens).
    *
    * Determinism: shares are single IEEE divides; the cumulative sum
    * runs in the window's band order (engine-identical); each
    * |cum diff| quantizes to DECIMAL(18,6) before the order-free
    * per-group sum; one final divide, 6dp.
    *
    * 100 TB shape: one (quasi × band) aggregate with map-side
    * partials, the ≤|bands|-row global table broadcast onto the
    * group spine, one calendar-free window over ≤|bands| rows per
    * group. Nothing scales past the first aggregate.
    *
    * NULL quasi values are screened out along with NULL bands (the
    * per-band spine join keys on the quasi tuple, which must compare
    * equal to itself — audit null rates upstream; [[kAnonymity]]
    * keeps NULL combinations because it never re-joins them).
    *
    * Output: (quasi columns ..., n, emd 6dp, at_risk = emd > t), one
    * row per combination. */
  def tCloseness(
      df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, t: Double): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0.0 && t < 1.0, s"t must be in (0,1), got $t")
    val names = quasi.map(_._1)
    require(names.distinct.size == names.size, s"duplicate names: $names")
    val base = df
      .select(quasi.map { case (n, c) => c.as(n) } :+
        sensitive.cast("long").as("s"): _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _) &&
        col("s").isNotNull)
    val glob = base.groupBy("s").agg(count(lit(1)).as("gc"))
    val gt = glob.agg(
      sum("gc").as("gn"), count(lit(1)).as("k"))
    val cells = base
      .groupBy((names :+ "s").map(col): _*)
      .agg(count(lit(1)).as("c"))
    val groups = cells.groupBy(names.map(col): _*).agg(sum("c").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*).orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    groups
      .crossJoin(broadcast(glob))
      .join(cells, names :+ "s", "left")
      .crossJoin(broadcast(gt))
      .withColumn("diff",
        coalesce(col("c"), lit(0L)).cast("double") / col("n").cast("double")
          - col("gc").cast("double") / col("gn").cast("double"))
      .withColumn("term", abs(sum("diff").over(w)).cast("decimal(18,6)"))
      .groupBy(names.map(col): _*)
      .agg(max("n").as("n"), max("k").as("k"), sum("term").as("emd_sum"))
      .select(names.map(col) ++ Seq(
        col("n"),
        round(when(col("k") > 1,
          col("emd_sum").cast("double") / (col("k") - 1).cast("double"))
          .otherwise(lit(0.0)), 6).as("emd")): _*)
      .withColumn("at_risk", col("emd") > t)
  }
}
