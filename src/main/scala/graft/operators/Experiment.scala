package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data", WSDM'13) — the standard upgrade to
    * a mean-difference readout when a pre-experiment covariate exists:
    *
    *   θ = cov(X, Y) / var(X),   Ŷ = Y − θ·(X − x̄)
    *
    * removes the covariate-explained variance from the metric, so the
    * same experiment detects smaller lifts (or needs fewer units). By
    * linearity the ADJUSTED ARM MEANS need no second pass:
    * mean(Ŷ | arm) = ȳ_arm − θ·(x̄_arm − x̄) — everything reads off ONE
    * conditional aggregation of the unit table (the [[abTest]] missing-
    * arm discipline: a zero-unit arm surfaces as n=0 with NULL means,
    * never an empty frame).
    *
    * θ is estimated POOLED across both arms (the paper's choice —
    * under randomization X ⊥ arm, so pooling is unbiased and halves
    * the estimator's own noise).
    *
    * 100 TB shape: one scan, eight map-side-collapsed aggregates, one
    * output row. No window, no join, no driver state.
    *
    * Determinism: x and y quantized round(·,6); their products
    * round(·,6) into DECIMAL(28,6) sums (|Σ| < ~9·10⁹ tick bound —
    * holds for metric-scale units; anchor epoch-scale covariates
    * first); means and θ are IEEE divides of exact decimals; var(X)
    * ≤ 0 (constant covariate) degrades to θ = 0 — the readout becomes
    * the plain mean difference instead of an ANSI divide error.
    *
    * Output: ONE row — (n_a, n_b, mean_y_a, mean_y_b, lift, theta,
    * adj_mean_y_a, adj_mean_y_b, adj_lift), 6dp. */
  def cupedAdjusted(
      units: DataFrame,
      variant: Column,
      metric: Column,
      covariate: Column,
      variantA: String,
      variantB: String): DataFrame = {
    require(variantA != variantB, "the two arms must differ")
    def dec(c: Column): Column = c.cast("decimal(28,6)")
    val slim = units
      .select(variant.as("arm"),
        round(metric.cast("double"), 6).as("y"),
        round(covariate.cast("double"), 6).as("x"))
      .filter(col("arm").isin(variantA, variantB) &&
        col("x").isNotNull && col("y").isNotNull)
    def armAgg(label: String, expr: Column): Column =
      coalesce(sum(when(col("arm") === label, expr)), lit(0).cast("decimal(28,6)"))
    val agg = slim.agg(
      coalesce(sum(when(col("arm") === variantA, 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("arm") === variantB, 1L)), lit(0L)).as("n_b"),
      armAgg(variantA, dec(col("x"))).as("sx_a"),
      armAgg(variantB, dec(col("x"))).as("sx_b"),
      armAgg(variantA, dec(col("y"))).as("sy_a"),
      armAgg(variantB, dec(col("y"))).as("sy_b"),
      coalesce(sum(dec(round(col("x") * col("y"), 6))),
        lit(0).cast("decimal(28,6)")).as("sxy"),
      coalesce(sum(dec(round(col("x") * col("x"), 6))),
        lit(0).cast("decimal(28,6)")).as("sxx"))
    val n = (col("n_a") + col("n_b")).cast("double")
    val nullD = lit(null).cast("double")
    val meanYA = when(col("n_a") > 0,
      col("sy_a").cast("double") / col("n_a").cast("double"))
    val meanYB = when(col("n_b") > 0,
      col("sy_b").cast("double") / col("n_b").cast("double"))
    val meanXA = when(col("n_a") > 0,
      col("sx_a").cast("double") / col("n_a").cast("double"))
    val meanXB = when(col("n_b") > 0,
      col("sx_b").cast("double") / col("n_b").cast("double"))
    val meanX = when(n > 0,
      (col("sx_a") + col("sx_b")).cast("double") / n)
    val meanY = when(n > 0,
      (col("sy_a") + col("sy_b")).cast("double") / n)
    val varX = when(n > 0, col("sxx").cast("double") / n - meanX * meanX)
    val covXY = when(n > 0, col("sxy").cast("double") / n - meanX * meanY)
    val theta = when(varX > 0.0, covXY / varX).otherwise(lit(0.0))
    val adjA = meanYA - theta * (meanXA - meanX)
    val adjB = meanYB - theta * (meanXB - meanX)
    agg.select(
      col("n_a"), col("n_b"),
      round(meanYA, 6).as("mean_y_a"),
      round(meanYB, 6).as("mean_y_b"),
      round(when(col("n_a") > 0 && col("n_b") > 0, meanYB - meanYA)
        .otherwise(nullD), 6).as("lift"),
      round(when(n > 0, theta).otherwise(nullD), 6).as("theta"),
      round(adjA, 6).as("adj_mean_y_a"),
      round(adjB, 6).as("adj_mean_y_b"),
      round(when(col("n_a") > 0 && col("n_b") > 0, adjB - adjA)
        .otherwise(nullD), 6).as("adj_lift"))
  }

  /** Cumulative Poisson(λ=1) probabilities for weights 0..6, frozen as
    * 32-bit hex thresholds (⌊P(X ≤ k)·16⁸⌋, lowercase, zero-padded so
    * lexicographic compare == numeric compare). A unit's replicate-r
    * weight is the count of thresholds ≤ its 8-hex-char md5 prefix —
    * weight w with probability e⁻¹/w!, capped at 7 (tail mass ~8·10⁻⁵).
    * CONSTANTS, not computed: the oracle SQL must carry the identical
    * literals, so both engines compare against the same frozen bytes. */
  private val PoissonCumHex: Seq[String] = Seq(
    "5e2d58d8", // P(0) = 0.36787944117144233
    "bc5ab1b1", // P(≤1) = 0.7357588823428847
    "eb715e1d", // P(≤2) = 0.9196986029286058
    "fb239797", // P(≤3) = 0.9810118431238462
    "ff1025f5", // P(≤4) = 0.9963401531726563
    "ffd90f3b", // P(≤5) = 0.9994058151824183
    "fffa8b71") // P(≤6) = 0.9999167588507119

  /** Per-group mean with a percentile bootstrap confidence interval —
    * the error bar every pipeline-metric readout (mean quality score
    * per source, mean tokens per shard) should carry, computed the only
    * way that works at 100 TB: the POISSON BOOTSTRAP (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012).
    * Classical resampling draws n rows with replacement per replicate —
    * impossible distributedly; instead each row independently
    * contributes Poisson(1) copies to each replicate (the n→∞ limit of
    * Binomial(n, 1/n) multiplicities), which is a pure MAP decision.
    *
    * Weights are seed-free and portable: replicate r's weight for unit
    * id is the [[PoissonCumHex]] threshold count under the md5("id:r")
    * 8-hex prefix — deterministic across engines, cluster layouts, and
    * retries (the repo's md5-grid discipline, `weightedSystematicSample`
    * class).
    *
    * 100 TB shape: ONE scan — rows explode ×(R+1) map-side (replicate
    * −1 is the unweighted point estimate riding the same pass) and
    * collapse immediately into the (group, r) partial aggregate, so
    * shuffle volume is |groups|·(R+1) rows regardless of input size;
    * the CI is a window over the ≤R rows of each group (post-aggregate
    * discipline, B6 class). No per-unit state, no driver loop.
    *
    * Determinism: x quantized round(·,6) into DECIMAL(28,6) sums
    * (|Σ w·x| must stay < ~9·10⁹ for the decimal→double cast to be
    * exactly rounded on both engines — holds for metric-scale values;
    * anchor first for epoch-scale inputs), one IEEE divide per
    * replicate mean, round 6. Rank selection orders (mean, r) — total
    * order, tie-proof.
    *
    * Edges: null values are dropped (a group that is all-null
    * disappears — no mean exists); a small group can draw an all-zero
    * replicate (P = e⁻ⁿ) whose mean is NULL — such replicates sort
    * LAST (explicitly, matching DuckDB's default) and a CI touching
    * them reads NULL, loudly wider-than-data rather than silently
    * clamped.
    *
    * Output: one row per group — (group_key, n, mean, ci_lo, ci_hi). */
  def bootstrapCI(
      units: DataFrame,
      group: Column,
      id: Column,
      value: Column,
      replicates: Int = 40,
      confidence: Double = 0.95): DataFrame = {
    require(replicates >= 4 && replicates % 4 == 0,
      s"replicates must be a positive multiple of 4 (one md5 digest" +
        s" feeds four 8-hex windows), got $replicates")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0,1), got $confidence")
    val loRank = math.max(1,
      math.floor((1 - confidence) / 2 * replicates).toInt)
    val hiRank = math.min(replicates,
      math.ceil((1 + confidence) / 2 * replicates).toInt)
    // ONE digest feeds FOUR replicates: md5's 32 hex chars slice into
    // four disjoint 8-hex (32-bit) windows with pairwise-independent
    // bits — the cmsCells discipline ("one digest per occurrence beats
    // depth salted digests on the hot path") — so the dominant cost
    // drops from R md5s per unit to R/4. The digest is computed on the
    // d-level row BEFORE the window explode, so it is hashed once and
    // carried. Replicate number r = 4·d + win; the sentinel d = −1 row
    // is the unweighted point estimate.
    //
    // The 8-branch threshold CASE references the window substring 7
    // times, deliberately NOT bound(): conditional subexpression
    // elimination (SPARK-33337) already evaluates it once per row in
    // codegen, while bound()'s transform() is a higher-order function
    // that falls OUT of codegen — forked A/B receipts measured the
    // bound() form 20-40% slower (bench_r12_boundab_*).
    val u = expr("substring(h, win * 8 + 1, 8)")
    val poissonW = PoissonCumHex.zipWithIndex
      .foldLeft(when(col("r") === -1, 1)) { case (acc, (hex, w)) =>
        acc.when(u < hex, w)
      }
      .otherwise(PoissonCumHex.length)
    val means = units
      .filter(value.isNotNull)
      .select(group.as("group_key"), id.cast("string").as("sid"),
        round(value.cast("double"), 6).cast("decimal(28,6)").as("x"))
      .withColumn("d", explode(sequence(lit(-1), lit(replicates / 4 - 1))))
      .withColumn("h",
        when(col("d") >= 0,
          md5(concat(col("sid"), lit(":"), col("d").cast("string")))))
      .withColumn("win", explode(
        when(col("d") === -1, array(lit(-1)))
          .otherwise(array(lit(0), lit(1), lit(2), lit(3)))))
      .withColumn("r",
        when(col("d") === -1, -1).otherwise(col("d") * 4 + col("win")))
      .withColumn("w", poissonW)
      .groupBy("group_key", "r")
      .agg(sum(col("w").cast("long")).as("sw"),
        sum(col("w").cast("decimal(12,0)") * col("x")).as("swx"))
      .select(col("group_key"), col("r"), col("sw"),
        when(col("sw") > 0,
          round(col("swx").cast("double") / col("sw").cast("double"), 6))
          .as("mean_r"))
    val point = means.filter(col("r") === -1)
      .select(col("group_key"), col("sw").as("n"), col("mean_r").as("mean"))
    val ci = means.filter(col("r") >= 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("group_key")
          .orderBy(col("mean_r").asc_nulls_last, col("r"))))
      .groupBy("group_key")
      .agg(
        min(when(col("rn") === loRank, col("mean_r"))).as("ci_lo"),
        min(when(col("rn") === hiRank, col("mean_r"))).as("ci_hi"))
    point.join(ci, Seq("group_key")).orderBy("group_key")
  }

  /** Welch's unequal-variance t-test between two arms on a CONTINUOUS
    * metric — the [[abTest]] companion for value metrics (revenue per
    * user, latency, tokens emitted) where the proportion z-test does
    * not apply and pooling variances (Student's t) is wrong whenever
    * the treatment changes the SPREAD as well as the mean — which is
    * exactly what pipeline changes do.
    *
    *   t = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
    *   df = (v_a/n_a + v_b/n_b)² /
    *        ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))   (Welch '47)
    *
    * 100 TB shape: ONE conditional aggregation with map-side partials
    * (6 sums), one output row — the [[abTest]] missing-arm discipline:
    * a zero-unit arm surfaces as n=0 with NULL moments, never an empty
    * frame.
    *
    * Determinism: x quantized round(·,6) into exact DECIMAL(38,6)
    * sums; squares round(·,4) into DECIMAL(38,4) (tick bound: Σx²
    * must stay under the 2^53 double-cast ceiling — holds for
    * metric-scale values; pre-scale huge units). Sample variance via
    * the moment identity v = (Σx² − (Σx)²/n)/(n−1) in IEEE doubles on
    * the exact decimal sums (deterministic; the quantization, not the
    * cancellation, bounds the error — documented contract). v < 0
    * from quantization noise clamps to 0. Arms with n < 2 or a zero
    * standard error yield NULL t/df, not a divide error.
    *
    * Output: ONE row — (n_a, n_b, mean_a, mean_b, var_a, var_b, t,
    * df), means/vars/t/df 6dp. */
  def welchT(
      units: DataFrame,
      variant: Column,
      value: Column,
      variantA: String,
      variantB: String): DataFrame = {
    require(variantA != variantB, "the two arms must differ")
    def arm(label: String, e: Column): Column =
      sum(when(col("arm") === label, e))
    val g = units
      .select(variant.as("arm"), round(value.cast("double"), 6).as("x"))
      .filter(col("arm").isin(variantA, variantB) && col("x").isNotNull)
      .agg(
        coalesce(arm(variantA, lit(1L)), lit(0L)).as("n_a"),
        coalesce(arm(variantB, lit(1L)), lit(0L)).as("n_b"),
        arm(variantA, col("x").cast("decimal(38,6)")).as("sa"),
        arm(variantB, col("x").cast("decimal(38,6)")).as("sb"),
        arm(variantA, round(col("x") * col("x"), 4).cast("decimal(38,4)")).as("qa"),
        arm(variantB, round(col("x") * col("x"), 4).cast("decimal(38,4)")).as("qb"))
    def mean(s: String, n: String): Column =
      when(col(n) > 0, col(s).cast("double") / col(n).cast("double"))
    def variance(q: String, s: String, n: String): Column =
      when(col(n) >= 2, greatest(
        (col(q).cast("double") -
          col(s).cast("double") * col(s).cast("double") /
            col(n).cast("double")) /
          (col(n).cast("double") - 1.0),
        lit(0.0)))
    val se2 = variance("qa", "sa", "n_a") / col("n_a").cast("double") +
      variance("qb", "sb", "n_b") / col("n_b").cast("double")
    val t = when(sqrt(se2) > 0.0,
      (mean("sa", "n_a") - mean("sb", "n_b")) / sqrt(se2))
    val dfW = {
      val ra = variance("qa", "sa", "n_a") / col("n_a").cast("double")
      val rb = variance("qb", "sb", "n_b") / col("n_b").cast("double")
      when(se2 > 0.0, (se2 * se2) /
        (ra * ra / (col("n_a").cast("double") - 1.0) +
          rb * rb / (col("n_b").cast("double") - 1.0)))
    }
    g.select(col("n_a"), col("n_b"),
      round(mean("sa", "n_a"), 6).as("mean_a"),
      round(mean("sb", "n_b"), 6).as("mean_b"),
      round(variance("qa", "sa", "n_a"), 6).as("var_a"),
      round(variance("qb", "sb", "n_b"), 6).as("var_b"),
      round(t, 6).as("t"),
      round(dfW, 6).as("df"))
  }

  /** Sample-ratio-mismatch (SRM) check — the FIRST gate on any A/B
    * readout: if the assignment split itself deviates from its design
    * (a crashing variant drops users, a bot filter eats one arm), every
    * downstream metric comparison is garbage, and the failure is
    * invisible to [[abTest]]/[[welchT]]. χ² goodness-of-fit of the
    * observed arm counts against the DESIGNED shares:
    *
    *   χ² = Σ_arms (o − e)² / e,   e = share · n_total
    *
    * flagged against a caller-set critical value (default 3.841 =
    * χ²₍₁₎ at 5%, the two-arm case; pass the right quantile for more
    * arms — no chi-square inverse lives in either engine).
    *
    * Arms in the design but absent from the data appear with n_obs = 0
    * (the loudest SRM there is); arms in the data but NOT in the
    * design are a configuration error and fail loudly rather than
    * silently diluting the test. Shares must sum to 1 within 1e-9.
    *
    * 100 TB shape: one map-side-collapsing count per arm, then
    * broadcast-joined against the tiny design table; the verdict is a
    * full-frame window over ≤ |arms| rows.
    *
    * Determinism: counts exact; e and each term are IEEE ops on exact
    * inputs (shares are caller literals both engines parse), terms 9dp,
    * the flag compares the 9dp decimal SUM — bit-stable.
    *
    * Output: (arm, n_obs, share, expected_n 6dp, chi2_term 9dp,
    * chi2_total 9dp, srm) — one row per designed arm; `srm` true when
    * χ² exceeds `critical`. */
  def sampleRatioCheck(
      units: DataFrame,
      variant: Column,
      design: Seq[(String, Double)],
      critical: Double = 3.841): DataFrame = {
    require(design.size >= 2, s"need >= 2 designed arms, got ${design.size}")
    require(design.map(_._1).distinct.size == design.size, "duplicate arms")
    require(design.forall(_._2 > 0), s"shares must be positive: $design")
    require(math.abs(design.map(_._2).sum - 1.0) < 1e-9,
      s"shares must sum to 1, got ${design.map(_._2).sum}")
    require(critical > 0, s"critical must be positive, got $critical")
    val designed = design.map(_._1)
    val obs = units
      .select(variant.cast("string").as("arm"))
      .filter(col("arm").isNotNull)
      .withColumn("known",
        when(col("arm").isin(designed: _*), col("arm"))
          .otherwise(raise_error(concat(
            lit("sampleRatioCheck: observed arm '"), col("arm"),
            lit(s"' is not in the design ${designed.mkString("{", ",", "}")}" +
              " — fix the assignment config, don't dilute the test.")))))
      .groupBy(col("known").as("arm")).agg(count(lit(1)).as("n_obs"))
    val spine = obs // 1-row agg → designed-arm spine (zero-count arms kept)
      .agg(coalesce(sum(col("n_obs")), lit(0L)).as("n_total"))
      .select(col("n_total"), explode(array(design.map { case (a, sh) =>
        struct(lit(a).as("arm"), lit(sh).as("share"))
      }: _*)).as("d"))
      .select(col("n_total"), col("d.arm").as("arm"), col("d.share").as("share"))
    val e = col("n_total").cast("double") * col("share")
    val o = coalesce(col("n_obs"), lit(0L)).cast("double")
    val wAll = Window.orderBy("arm")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spine.join(obs, Seq("arm"), "left")
      .select(col("arm"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("share"),
        round(e, 6).as("expected_n"),
        when(col("n_total") > 0, round((o - e) * (o - e) / e, 9))
          .otherwise(lit(0.0)).as("chi2_term"))
      .withColumn("chi2_total",
        sum(col("chi2_term").cast("decimal(28,9)")).over(wAll)
          .cast("double"))
      .withColumn("srm", col("chi2_total") > critical)
      .orderBy("arm")
  }

  /** Mann–Whitney U rank-sum test between two arms — the distribution-
    * free companion to [[welchT]]: when the metric is heavy-tailed,
    * censored, or ordinal (latencies, scores with clamps), the rank
    * test answers "does one arm stochastically dominate" without a
    * normality assumption on the values. Average ranks for ties with
    * the tie-corrected normal approximation (Mann & Whitney '47;
    * standard large-sample form):
    *
    *   U_a = R_a − n_a(n_a+1)/2,  μ = n_a·n_b/2
    *   σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))),  z = (U_a − μ)/σ
    *
    * Rank mechanics are the [[Eval.spearman]] grouped-value form: ONE
    * aggregation to (value, cnt, cnt_a) rows — the only thing that
    * scales with data — then a cardinality-guarded cumulative window
    * over DISTINCT values computes 2·avgrank = 2·(cum−cnt)+cnt+1
    * exactly; R_a rides Σ cnt_a·r2 in DECIMAL(38,0) half-units
    * (integer-exact, no float ranks anywhere). The tie term Σ(t³−t)
    * is decimal-exact. The only IEEE ops are the final U/z readouts.
    *
    * 100 TB shape: one map-side-collapsing value aggregation, the
    * spearman one-task guarded window over distinct VALUES (quantize
    * via round(·,6) input discipline; the guard names the fix), one
    * output row.
    *
    * Degenerate cases: an empty arm → NULL u_a/z; all values tied
    * (σ = 0) → z NULL (no ordering evidence), u_a still reported.
    *
    * Output: ONE row — (n_a, n_b, u_a [may end in .5 under ties —
    * exact], z 6dp). */
  def mannWhitneyU(
      units: DataFrame,
      variant: Column,
      value: Column,
      variantA: String,
      variantB: String,
      maxDistinct: Long = 10000000L): DataFrame = {
    require(variantA != variantB, "the two arms must differ")
    val rows = units
      .select(variant.as("arm"), round(value.cast("double"), 6).as("v"))
      .filter(col("arm").isin(variantA, variantB) && col("v").isNotNull)
    val counts = rows.groupBy("v").agg(
      count(lit(1)).as("cnt"),
      sum(when(col("arm") === variantA, 1L).otherwise(0L)).as("cnt_a"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = Eval.inlineCardinalityGuard(
        counts, col("v"), maxDistinct, "mannWhitneyU")
      .select(col("cnt"), col("cnt_a"),
        (lit(2) * (sum("cnt").over(w) - col("cnt")) + col("cnt") + 1)
          .as("r2")) // 2·avgrank — integer-exact under ties
    // DECIMAL(19,0) operands keep every product inside the 38-digit
    // multiply ceiling BOTH engines enforce; cnt² rides a long first
    // (safe to cnt ~ 3e9 — one tied value holding 3e9 rows)
    val g = ranked.agg(
      coalesce(sum(col("cnt_a")), lit(0L)).as("n_a"),
      coalesce(sum(col("cnt") - col("cnt_a")), lit(0L)).as("n_b"),
      coalesce(sum(col("cnt_a").cast("decimal(19,0)") *
        col("r2").cast("decimal(19,0)")),
        lit(0).cast("decimal(38,0)")).as("r2a"),
      coalesce(sum((col("cnt") * col("cnt")).cast("decimal(19,0)") *
        col("cnt").cast("decimal(19,0)") - col("cnt")),
        lit(0).cast("decimal(38,0)")).as("t3"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    val uA = (col("r2a").cast("double") - nA * (nA + 1.0)) / 2.0
    val sigma2 = nA * nB / 12.0 *
      ((n + 1.0) - col("t3").cast("double") / (n * (n - 1.0)))
    val z = when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0.0,
      (uA - nA * nB / 2.0) / sqrt(sigma2))
    g.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, uA).as("u_a"),
      round(z, 6).as("z"))
  }

  /** Difference-in-differences (Card & Krueger '94 design) — the
    * quasi-experimental readout for rollouts WITHOUT randomized
    * assignment: when a change ships to one cohort at a known date,
    * `(treat_post − treat_pre) − (ctrl_post − ctrl_pre)` nets out both
    * the permanent cohort gap and the common time trend, which a naive
    * post-only comparison ([[welchT]] on the post window) conflates
    * with the effect. Parallel pre-trends are the caller's design
    * assumption, as everywhere.
    *
    * SE via the four-cell independent-means formula
    * sqrt(Σ v_i/n_i) — the [[welchT]] moment identity per cell
    * (v = (Σx² − (Σx)²/n)/(n−1)) on the same decimal-quantized sums
    * (x 6dp → DECIMAL(38,6), x² 4dp → DECIMAL(38,4); same tick-bound
    * caveat).
    *
    * 100 TB shape: ONE conditional aggregation — 4 cells × 3 sums with
    * map-side partials, one output row. A cell with n = 0 (e.g. the
    * treatment cohort has no pre-period data) yields NULL means/did —
    * visible, never a silent zero.
    *
    * Output: ONE row — (n_c_pre, n_c_post, n_t_pre, n_t_post, 4 cell
    * means 6dp, did 6dp, se 6dp, t 6dp). */
  def diffInDiff(
      df: DataFrame, treated: Column, post: Column,
      value: Column): DataFrame = {
    val base = df.select(
      treated.as("tr"), post.as("po"),
      round(value.cast("double"), 6).as("x"))
      .filter(col("tr").isNotNull && col("po").isNotNull && col("x").isNotNull)
    def cell(tr: Boolean, po: Boolean, e: Column): Column =
      sum(when(col("tr") === tr && col("po") === po, e))
    def cellAggs(tag: String, tr: Boolean, po: Boolean): Seq[Column] = Seq(
      coalesce(cell(tr, po, lit(1L)), lit(0L)).as(s"n_$tag"),
      cell(tr, po, col("x").cast("decimal(38,6)")).as(s"s_$tag"),
      cell(tr, po, round(col("x") * col("x"), 4).cast("decimal(38,4)"))
        .as(s"q_$tag"))
    val aggs = cellAggs("c_pre", tr = false, po = false) ++
      cellAggs("c_post", tr = false, po = true) ++
      cellAggs("t_pre", tr = true, po = false) ++
      cellAggs("t_post", tr = true, po = true)
    val g = base.agg(aggs.head, aggs.tail: _*)
    def mean(tag: String): Column =
      when(col(s"n_$tag") > 0,
        col(s"s_$tag").cast("double") / col(s"n_$tag").cast("double"))
    def vOverN(tag: String): Column =
      when(col(s"n_$tag") >= 2, greatest(
        (col(s"q_$tag").cast("double") -
          col(s"s_$tag").cast("double") * col(s"s_$tag").cast("double") /
            col(s"n_$tag").cast("double")) /
          (col(s"n_$tag").cast("double") - 1.0),
        lit(0.0))) / col(s"n_$tag").cast("double")
    val did = (mean("t_post") - mean("t_pre")) -
      (mean("c_post") - mean("c_pre"))
    val se = sqrt(vOverN("c_pre") + vOverN("c_post") +
      vOverN("t_pre") + vOverN("t_post"))
    g.select(
      col("n_c_pre"), col("n_c_post"), col("n_t_pre"), col("n_t_post"),
      round(mean("c_pre"), 6).as("mean_c_pre"),
      round(mean("c_post"), 6).as("mean_c_post"),
      round(mean("t_pre"), 6).as("mean_t_pre"),
      round(mean("t_post"), 6).as("mean_t_post"),
      round(did, 6).as("did"),
      round(se, 6).as("se"),
      round(when(se > 0.0, did / se), 6).as("t"))
  }

  /** Nearest-neighbor score matching WITH replacement (the standard
    * propensity-score matching estimator, Rosenbaum & Rubin '83;
    * with-replacement keeps matching embarrassingly parallel — the
    * without-replacement variant is a sequential assignment problem
    * with no distributed form) — every treated unit matches the
    * control whose score is closest, if within `caliper`; unmatched
    * treated units stay VISIBLE with a NULL control, never dropped
    * (dropping them silently redefines the estimand).
    *
    * Mechanics: one global sort by (score, is-control-first, id); each
    * treated row reads the nearest control BELOW via
    * `last(ignore nulls)` over the preceding frame and the nearest
    * ABOVE via the same read over the REVERSED total order (growing
    * frames both ways — a shrinking following-frame is re-scanned per
    * row by the engine, measured O(n²)) — two window reads over two
    * sorts of the bounded units table, no join. Tie (equal
    * distance) breaks BELOW; equal-score controls resolve to the
    * highest id below / lowest above (the sort order — deterministic;
    * the DuckDB oracle replays the same neighbor SEMANTICS via
    * first_value over the following frame — engines differ in
    * frame-scan cost, never in the picked row).
    *
    * 100 TB shape: matching runs over UNITS (users), which the caller
    * has already collapsed from corpus-scale events — a units table is
    * orders of magnitude smaller than its event log. The full-order
    * window is the deliberate trade (the `ext_lift_table` class) and
    * is guarded: more than `maxUnits` rows fails loudly instead of
    * silently single-tasking; band-by-score-quantile with boundary
    * replication is the documented escape hatch past that.
    *
    * Output: one row per treated unit — (t_id, c_id nullable,
    * score_t, score_c, gap = |score_t − score_c| both 6dp-exact from
    * the caller's quantized scores, y_t, y_c), ordered by t_id. */
  def nearestScoreMatch(
      units: DataFrame, id: Column, treated: Column,
      score: Column, outcome: Column,
      caliper: Double, maxUnits: Long = 10000000L): DataFrame = {
    require(caliper > 0, s"caliper must be positive, got $caliper")
    val base = units.select(
      id.cast("long").as("uid"), treated.as("tr"),
      round(score.cast("double"), 6).as("s"),
      round(outcome.cast("double"), 6).as("y"))
      .filter(col("uid").isNotNull && col("tr").isNotNull && col("s").isNotNull)
    val guarded = graft.operators.Eval.inlineCardinalityGuard(
      base, struct(col("s"), col("tr"), col("uid")),
      maxUnits, "nearestScoreMatch", "maxUnits")
    // BOTH neighbor reads use GROWING frames (UnboundedPreceding → −1):
    // "nearest above" runs last(...ignoreNulls) over the exact REVERSE
    // total order instead of first(...) over a (1 → UnboundedFollowing)
    // frame — Spark evaluates growing frames incrementally but
    // re-scans a shrinking frame per row, which measured O(n²)
    // (6.6 s at 15k units, minutes at 156k) on the original form
    val fwd = Window.orderBy(col("s"), col("tr").cast("int"), col("uid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rev = Window.orderBy(col("s").desc, col("tr").cast("int").desc,
      col("uid").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ctrl = struct(col("s"), col("uid"), col("y"))
    val withNbrs = guarded
      .withColumn("lo",
        last(when(!col("tr"), ctrl), ignoreNulls = true).over(fwd))
      .withColumn("hi",
        last(when(!col("tr"), ctrl), ignoreNulls = true).over(rev))
      .filter(col("tr"))
    val dLo = col("s") - col("lo.s")
    val dHi = col("hi.s") - col("s")
    val pick = when(col("lo").isNotNull &&
      (col("hi").isNull || dLo <= dHi), col("lo"))
      .otherwise(col("hi")) // hi, or NULL when both sides are empty
    withNbrs
      .withColumn("m", when(abs(pick("s") - col("s")) <= caliper, pick))
      .select(
        col("uid").as("t_id"), col("m.uid").as("c_id"),
        col("s").as("score_t"), col("m.s").as("score_c"),
        round(abs(col("m.s") - col("s")), 6).as("gap"),
        col("y").as("y_t"), col("m.y").as("y_c"))
      .orderBy("t_id")
  }
}
