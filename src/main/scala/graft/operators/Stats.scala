package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Inferential-statistics panel — the hypothesis-testing surface a
  * warehouse analyst reaches for once the descriptive panels
  * (q_funnel, profile_mutual_info) raise a "did this CHANGE?" or "are
  * these RELATED?" question. Reference capability: dbsurveyor's
  * statistics module reports distribution summaries per column
  * (dbsurveyor-core/src/analysis in the artifact's table statistics);
  * these two operators are the inferential counterparts a 100 TB
  * deployment runs on top of the same sufficient statistics.
  *
  * Exactness discipline (the q_discount_elasticity device): every
  * sufficient statistic is an EXACT integer/decimal aggregate; IEEE
  * doubles appear only at the final z / χ² edge, composed in ONE
  * identical expression text on both engines — division, multiplication
  * and sqrt are correctly-rounded in Spark and DuckDB alike (never
  * libm pow/ln, which are not cross-engine reproducible).
  */
object Stats {

  /** 2024-01-16T00:00:00Z in epoch micros — the events-table era split
    * (mid-range of the generator's January 2024 horizon; the
    * qSegmentTransitions era-split idea applied to the event stream).
    * Integer micros comparison on both engines: no timezone seam.
    */
  val eraSplitUs = 1705363200000000L

  /** Two-proportion z-test on the signup→purchase funnel conversion
    * between the two eras: did conversion MOVE when the era flipped,
    * beyond what binomial noise explains? The standard pooled test:
    *
    *   z = (p̂₁ − p̂₂) / sqrt( p̂(1−p̂)(1/n₁ + 1/n₂) ),  p̂ pooled.
    *
    * Funnel semantics are q_funnel's verbatim (first signup per user;
    * converted = any purchase at-or-after it), with the user assigned
    * to the era of their FIRST SIGNUP — each user counts in exactly one
    * era, preserving the test's independence assumption.
    *
    * Scale shape: one events scan → two user-keyed min aggregations +
    * one user-keyed join (the q_funnel plan) → ONE global 1-row
    * conditional aggregation. Nothing data-sized survives the agg; the
    * z composition runs over four BIGINTs. Degrade-don't-throw: an
    * empty era or a degenerate pool (0% or 100% everywhere) emits NULL
    * z and NULL verdict — the oracle's CASE guards are identical.
    */
  def statsFunnelZtest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t_signup"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("t_us") >= col("t_signup"))
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t_purchase"))
    val base = signup.join(purchase, Seq("user_id"), "left")
      .select((col("t_signup") < lit(eraSplitUs)).as("pre"),
        col("t_purchase").isNotNull.as("conv"))
    base.agg(
        sum(when(col("pre"), 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("pre") && col("conv"), 1L).otherwise(0L)).as("x_pre"),
        sum(when(!col("pre"), 1L).otherwise(0L)).as("n_post"),
        sum(when(!col("pre") && col("conv"), 1L).otherwise(0L)).as("x_post"))
      .select(col("n_pre"), col("x_pre"), col("n_post"), col("x_post"),
        // DECIMAL(38,0) widening before the ×1e6 product (the
        // pack_shard_balance overflow class)
        expr("CAST(CASE WHEN n_pre > 0 THEN CAST(x_pre AS DECIMAL(38,0)) * 1000000 DIV n_pre END AS BIGINT)")
          .as("conv_ppm_pre"),
        expr("CAST(CASE WHEN n_post > 0 THEN CAST(x_post AS DECIMAL(38,0)) * 1000000 DIV n_post END AS BIGINT)")
          .as("conv_ppm_post"),
        expr(zExprSql).as("z_score"))
      .withColumn("significant_95",
        expr("CASE WHEN z_score IS NULL THEN NULL ELSE abs(z_score) >= 1.96 END"))
  }

  // the one shared double composition (identical text both engines):
  // pooled two-proportion z over the four exact counts
  private val zExprSql: String =
    """CASE WHEN n_pre > 0 AND n_post > 0
      |       AND (x_pre + x_post) > 0 AND (x_pre + x_post) < (n_pre + n_post)
      |  THEN (CAST(x_pre AS DOUBLE) / CAST(n_pre AS DOUBLE)
      |        - CAST(x_post AS DOUBLE) / CAST(n_post AS DOUBLE))
      |    / sqrt((CAST(x_pre + x_post AS DOUBLE) / CAST(n_pre + n_post AS DOUBLE))
      |        * (1.0 - CAST(x_pre + x_post AS DOUBLE) / CAST(n_pre + n_post AS DOUBLE))
      |        * (1.0 / CAST(n_pre AS DOUBLE) + 1.0 / CAST(n_post AS DOUBLE)))
      |  ELSE CAST(NULL AS DOUBLE) END""".stripMargin

  val statsFunnelZtestSql: String =
    s"""WITH signup AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t_signup
       |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
       |purchase AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
       |  FROM events e JOIN signup s ON e.user_id = s.user_id
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t_signup
       |  GROUP BY e.user_id),
       |base AS (
       |  SELECT s.t_signup < $eraSplitUs AS pre,
       |         p.t_purchase IS NOT NULL AS conv
       |  FROM signup s LEFT JOIN purchase p USING (user_id)),
       |agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
       |    CAST(sum(CASE WHEN pre AND conv THEN 1 ELSE 0 END) AS BIGINT) AS x_pre,
       |    CAST(sum(CASE WHEN NOT pre THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
       |    CAST(sum(CASE WHEN NOT pre AND conv THEN 1 ELSE 0 END) AS BIGINT) AS x_post
       |  FROM base),
       |z AS (
       |  SELECT *,
       |    ${zExprSql.replace("\n", "\n    ")} AS z_score
       |  FROM agg)
       |SELECT n_pre, x_pre, n_post, x_post,
       |  CAST(CASE WHEN n_pre > 0
       |    THEN (CAST(x_pre AS HUGEINT) * 1000000) // n_pre END AS BIGINT)
       |    AS conv_ppm_pre,
       |  CAST(CASE WHEN n_post > 0
       |    THEN (CAST(x_post AS HUGEINT) * 1000000) // n_post END AS BIGINT)
       |    AS conv_ppm_post,
       |  z_score,
       |  CASE WHEN z_score IS NULL THEN NULL ELSE abs(z_score) >= 1.96 END
       |    AS significant_95
       |FROM z""".stripMargin

  /** Welch's unequal-variance t-test on order value between the two
    * order eras (q_segment_transitions' 1998-01-01 split): did the
    * average basket CHANGE across the era, without assuming the eras
    * share a variance (they don't have to — Welch is the default a
    * careful analyst reaches for; Student's equal-variance t is the
    * special case).
    *
    * Sufficient statistics per era: n, Σx, Σx² — accumulated EXACTLY in
    * decimals with x scaled to thousands first (DECIMAL(18,5), exact:
    * prices are 2-dp), so Σx² stays far below 2^53 at any realistic SF
    * and the one decimal→double conversion at the edge is seam-free
    * (the known >2^53 decimal→double rounding seam). t and the
    * Satterthwaite dof are scale-invariant, so the thousands unit
    * cancels; means are reported in original units (×1000, one double
    * multiply). All edge math is div/mult/sqrt over identical
    * expression text. Scale shape: ONE orders scan → a 1-row
    * conditional aggregation; six numbers leave the executor.
    */
  val orderEraSplit = "1998-01-01"

  def statsWelchTtest(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select((col("o_orderdate") < lit(orderEraSplit).cast("timestamp"))
        .as("pre"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) / 1000 AS DECIMAL(18,5))")
          .as("xk"))
    base.agg(
        sum(when(col("pre"), 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("pre"), col("xk"))).as("s_pre0"),
        sum(when(col("pre"), expr("xk * xk"))).as("q_pre0"),
        sum(when(!col("pre"), 1L).otherwise(0L)).as("n_post"),
        sum(when(!col("pre"), col("xk"))).as("s_post0"),
        sum(when(!col("pre"), expr("xk * xk"))).as("q_post0"))
      // Σx² carries 10 exact decimals — its UNSCALED value passes 2^53
      // even at tiny SF, and decimal→double above 2^53 is the one
      // conversion the engines round differently (and DuckDB TRUNCATES
      // decimal downcasts where Spark rounds, so re-quantizing via CAST
      // is a seam too). Device: floor(q·10⁴) is an EXACT integer both
      // engines (floor of an exact decimal), far below 2^53 at any
      // realistic SF; the edge divides it back by 1e4 in doubles — one
      // correctly-rounded division, bit-identical.
      .select(col("n_pre"), col("n_post"),
        expr("CAST(s_pre0 AS DECIMAL(38,5))").as("s_pre"),
        expr("CAST(floor(q_pre0 * 10000) AS DECIMAL(38,0))").as("q_pre"),
        expr("CAST(s_post0 AS DECIMAL(38,5))").as("s_post"),
        expr("CAST(floor(q_post0 * 10000) AS DECIMAL(38,0))").as("q_post"))
      .withColumn("mean_pre", expr(meanSql("pre")))
      .withColumn("mean_post", expr(meanSql("post")))
      .withColumn("v_pre", expr(varSql("pre")))
      .withColumn("v_post", expr(varSql("post")))
      .withColumn("t_stat", expr(welchTSql))
      .withColumn("welch_dof", expr(welchDofSql))
      .select(col("n_pre"), col("n_post"), col("mean_pre"), col("mean_post"),
        col("t_stat"), col("welch_dof"),
        expr(welchSigSql).as("significant_95"))
  }

  /** significant_95 uses the NORMAL approximation to the t distribution
    * (1.96 = z₀.₀₂₅): an exact t quantile at fractional Satterthwaite dof
    * is not expressible cross-engine (no inverse-beta in either SQL
    * dialect). The approximation is only honest when dof is large, so it
    * is GATED on welch_dof ≥ 30 (t₀.₀₂₅,₃₀ = 2.042 — within 4% of 1.96;
    * below that the verdict is NULL, "compute it offline", rather than an
    * overstated significance) — the r11 ADVICE fix.
    */
  private val welchSigSql =
    """CASE WHEN t_stat IS NULL OR welch_dof IS NULL THEN NULL
      |  WHEN welch_dof < 30.0 THEN NULL
      |  ELSE abs(t_stat) >= 1.96 END""".stripMargin

  // identical edge compositions, spliced into BOTH engines' texts
  private def meanSql(e: String) =
    s"CASE WHEN n_$e > 0 THEN CAST(s_$e AS DOUBLE) / CAST(n_$e AS DOUBLE) * 1000.0 END"
  private def varSql(e: String) =
    s"""CASE WHEN n_$e > 1 THEN
       |  (CAST(q_$e AS DOUBLE) / 10000.0
       |   - CAST(s_$e AS DOUBLE) * CAST(s_$e AS DOUBLE)
       |    / CAST(n_$e AS DOUBLE)) / (CAST(n_$e AS DOUBLE) - 1.0) END""".stripMargin
  private val welchTSql =
    """CASE WHEN n_pre > 1 AND n_post > 1
      |       AND (v_pre / CAST(n_pre AS DOUBLE)
      |            + v_post / CAST(n_post AS DOUBLE)) > 0
      |  THEN (CAST(s_pre AS DOUBLE) / CAST(n_pre AS DOUBLE)
      |        - CAST(s_post AS DOUBLE) / CAST(n_post AS DOUBLE))
      |    / sqrt(v_pre / CAST(n_pre AS DOUBLE)
      |           + v_post / CAST(n_post AS DOUBLE)) END""".stripMargin
  private val welchDofSql =
    """CASE WHEN n_pre > 1 AND n_post > 1
      |       AND (v_pre / CAST(n_pre AS DOUBLE)
      |            + v_post / CAST(n_post AS DOUBLE)) > 0
      |  THEN (v_pre / CAST(n_pre AS DOUBLE) + v_post / CAST(n_post AS DOUBLE))
      |     * (v_pre / CAST(n_pre AS DOUBLE) + v_post / CAST(n_post AS DOUBLE))
      |    / ((v_pre / CAST(n_pre AS DOUBLE)) * (v_pre / CAST(n_pre AS DOUBLE))
      |         / (CAST(n_pre AS DOUBLE) - 1.0)
      |       + (v_post / CAST(n_post AS DOUBLE)) * (v_post / CAST(n_post AS DOUBLE))
      |         / (CAST(n_post AS DOUBLE) - 1.0)) END""".stripMargin

  val statsWelchTtestSql: String =
    s"""WITH agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
       |    CAST(sum(CASE WHEN pre THEN xk END) AS DECIMAL(38,5)) AS s_pre,
       |    CAST(floor(sum(CASE WHEN pre THEN xk * xk END) * 10000) AS DECIMAL(38,0)) AS q_pre,
       |    CAST(sum(CASE WHEN NOT pre THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
       |    CAST(sum(CASE WHEN NOT pre THEN xk END) AS DECIMAL(38,5)) AS s_post,
       |    CAST(floor(sum(CASE WHEN NOT pre THEN xk * xk END) * 10000) AS DECIMAL(38,0)) AS q_post
       |  FROM (
       |    SELECT o_orderdate < TIMESTAMP '$orderEraSplit' AS pre,
       |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) / 1000 AS DECIMAL(18,5)) AS xk
       |    FROM orders)),
       |m AS (
       |  SELECT *,
       |    ${meanSql("pre")} AS mean_pre,
       |    ${meanSql("post")} AS mean_post,
       |    ${varSql("pre").replace("\n", "\n    ")} AS v_pre,
       |    ${varSql("post").replace("\n", "\n    ")} AS v_post
       |  FROM agg),
       |t AS (
       |  SELECT *,
       |    ${welchTSql.replace("\n", "\n    ")} AS t_stat,
       |    ${welchDofSql.replace("\n", "\n    ")} AS welch_dof
       |  FROM m)
       |SELECT n_pre, n_post, mean_pre, mean_post, t_stat, welch_dof,
       |  ${welchSigSql.replace("\n", "\n  ")} AS significant_95
       |FROM t""".stripMargin

  /** Mann–Whitney U (Wilcoxon rank-sum) on event `value` between the
    * click and view streams — the NONPARAMETRIC "did the distribution
    * shift" test (no normality assumption; what an analyst uses on
    * skewed engagement values where a t-test lies). Tie-exact:
    *
    * Rank structure lives entirely in the VALUE-keyed aggregate: for a
    * distinct value with c₁ click rows of c total, every row gets
    * midrank cum_before + (c+1)/2, so 2·R₁ = Σ c₁·(2·(cum−c) + c + 1) —
    * a pure integer, no .5 ever materialized. The tie correction
    * Σ(c³−c) is integer-exact too. Both widen through DECIMAL(38,0)
    * (n² magnitudes). z = (2U₁ − n₁n₂) / (2·sqrt(n₁n₂/12 · (N+1 −
    * tie/(N(N−1))))) — one identical double composition; NULL when a
    * group is empty or every value ties (zero variance).
    *
    * Scale shape: one events scan → value-keyed count agg (bounded by
    * the value grid, data-independent) → ONE GlobalRank prefix-sum
    * range exchange over that aggregate (never a global window) → a
    * 1-row aggregation. The oracle mirrors the midrank algebra with a
    * window over the same distinct-value frame.
    *
    * NULL values are excluded SYMMETRICALLY in both engines (r11
    * ADVICE): a rank test has no rank for an unobserved value, and the
    * engines would otherwise order the NULL group differently (Spark's
    * range exchange sorts NULLS FIRST; DuckDB's ORDER BY window defaults
    * NULLS LAST) — a live hash seam on any corpus with NULL values.
    *
    * Hashed-surface discipline (r11: the driver gate hash-flagged this
    * op while three-SF replays were bit-identical — the one gated query
    * emitting raw DECIMAL(38,0) beside a raw IEEE double): the exact
    * integer statistics present as BIGINT — two_r1 ≤ N·(2N+1) is safe to
    * ~2·10⁹ click/view events, tie_sum ≤ Σc³ to a ~2·10⁶-row largest tie
    * group; z and every internal step compose over the DECIMAL(38,0)
    * EXACT values (safe to N ~ 10¹²), so the BIGINT columns are
    * presentation-only — and z presents through the §6 rule-8
    * quantization, CAST(… AS DECIMAL(18,9)) over the identical double
    * composition in BOTH engines. No raw double rides the hash.
    */
  def statsMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view") &&
        col("value").isNotNull)
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c"))
    val cum = graft.operators.GlobalRank
      .withGlobalCumsum(vals, "c", "cum", col("value"))
    cum.agg(
        sum(col("c1")).as("n1"),
        sum(col("c") - col("c1")).as("n2"),
        sum(expr(
          "CAST(c1 AS DECIMAL(38,0)) * (2 * (cum - c) + c + 1)")).as("tr0"),
        sum(expr(
          "CAST(c AS DECIMAL(38,0)) * c * c - c")).as("tie0"))
      .select(col("n1").as("n_click"), col("n2").as("n_view"),
        expr("CAST(tr0 AS DECIMAL(38,0))").as("two_r1"),
        expr("CAST(tie0 AS DECIMAL(38,0))").as("tie_sum"))
      // z composes over the EXACT decimals; the BIGINT presentation below
      // never feeds arithmetic
      .withColumn("z_score",
        expr(s"CAST(($mwZSql) AS DECIMAL(18,9))"))
      .select(col("n_click"), col("n_view"),
        expr("CAST(two_r1 AS BIGINT)").as("two_r1"),
        expr("CAST(tie_sum AS BIGINT)").as("tie_sum"),
        col("z_score"))
      .withColumn("significant_95",
        expr(mwSigSql))
  }

  // significance off the QUANTIZED z (the hashed value is the judged
  // value), via one explicit decimal→double edge — identical both engines
  private val mwSigSql =
    """CASE WHEN z_score IS NULL THEN NULL
      |  ELSE abs(CAST(z_score AS DOUBLE)) >= 1.96 END""".stripMargin

  private val mwZSql =
    """CASE WHEN n_click > 0 AND n_view > 0
      |       AND (CAST(n_click + n_view AS DOUBLE) + 1.0
      |            - CAST(tie_sum AS DOUBLE)
      |              / (CAST(n_click + n_view AS DOUBLE)
      |                 * (CAST(n_click + n_view AS DOUBLE) - 1.0))) > 0
      |  THEN (CAST(two_r1 AS DOUBLE)
      |        - CAST(n_click AS DOUBLE) * (CAST(n_click AS DOUBLE) + 1.0)
      |        - CAST(n_click AS DOUBLE) * CAST(n_view AS DOUBLE))
      |    / (2.0 * sqrt(CAST(n_click AS DOUBLE) * CAST(n_view AS DOUBLE) / 12.0
      |        * (CAST(n_click + n_view AS DOUBLE) + 1.0
      |           - CAST(tie_sum AS DOUBLE)
      |             / (CAST(n_click + n_view AS DOUBLE)
      |                * (CAST(n_click + n_view AS DOUBLE) - 1.0))))) END"""
      .stripMargin

  val statsMannWhitneySql: String =
    s"""WITH vals AS (
       |  SELECT value,
       |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    count(*) AS c
       |  FROM events
       |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
       |  GROUP BY value),
       |cum AS (
       |  SELECT *, sum(c) OVER (ORDER BY value
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM vals),
       |agg AS (
       |  SELECT
       |    CAST(sum(c1) AS BIGINT) AS n_click,
       |    CAST(sum(c - c1) AS BIGINT) AS n_view,
       |    CAST(sum(CAST(c1 AS HUGEINT) * (2 * (cum - c) + c + 1)) AS DECIMAL(38,0)) AS two_r1,
       |    CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS DECIMAL(38,0)) AS tie_sum
       |  FROM cum),
       |z AS (
       |  SELECT *,
       |    CAST((${mwZSql.replace("\n", "\n    ")}) AS DECIMAL(18,9)) AS z_score
       |  FROM agg)
       |SELECT n_click, n_view,
       |  CAST(two_r1 AS BIGINT) AS two_r1,
       |  CAST(tie_sum AS BIGINT) AS tie_sum,
       |  z_score,
       |  ${mwSigSql.replace("\n", "\n  ")} AS significant_95
       |FROM z""".stripMargin

  /** One-way ANOVA on order value across the five market segments —
    * the k-group generalization of the Welch pair ("does ANY segment's
    * average basket differ"): F = (SSB/(k−1)) / (SSW/(N−k)), plus η²
    * (the effect size a report quotes alongside F).
    *
    * Sufficient statistics per group: n, Σx, Σx² — the Welch devices
    * verbatim (thousands-scaled exact decimals; Σx² floored ×10⁴ to an
    * exact integer). The one NEW seam a k-group test adds: Σ_g s_g²/n_g
    * sums DOUBLES across groups, and Spark's aggregation order is
    * nondeterministic — so each group's term is composed in ONE double
    * expression and quantized DECIMAL(24,2) (the miPanel
    * order-independence device; 0.01 thousands² of quantization on
    * ~1e10 magnitudes is noise to F), then summed exactly.
    *
    * Scale shape: orders ⋈ customer co-shuffle on the customer key
    * (customer grows with data — never broadcast, the q7 rule; AQE may
    * still pick one at small SF) → \|segments\|-keyed agg → 5-row
    * bounded math. Degrade: k≤1, N≤k or zero within-variance → NULL F.
    */
  def statsAnovaSegments(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) / 1000 AS DECIMAL(18,5))")
          .as("xk"))
    val g = x.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("xk")).as("s_g0"),
        sum(expr("xk * xk")).as("q_g0"))
      .select(col("n_g"),
        expr("CAST(s_g0 AS DECIMAL(38,5))").as("s_g"),
        expr("CAST(floor(q_g0 * 10000) AS DECIMAL(38,0))").as("q4_g"))
      .withColumn("t_g", expr(anovaTermSql))
    g.agg(count(lit(1)).as("k_groups"),
        sum(col("n_g")).as("n_total"),
        sum(col("s_g")).as("s_all0"),
        sum(col("q4_g")).as("q4_all0"),
        sum(col("t_g")).as("t_all0"))
      .select(col("k_groups"), col("n_total"),
        expr("CAST(s_all0 AS DECIMAL(38,5))").as("s_all"),
        expr("CAST(q4_all0 AS DECIMAL(38,0))").as("q4_all"),
        expr("CAST(t_all0 AS DECIMAL(38,2))").as("t_all"))
      .withColumn("ssb", expr(ssbSql))
      .withColumn("ssw", expr(sswSql))
      .select(col("k_groups"), col("n_total"),
        expr("CAST(k_groups - 1 AS BIGINT)").as("dof_between"),
        expr("CAST(n_total - k_groups AS BIGINT)").as("dof_within"),
        expr(fSql).as("f_stat"),
        expr(etaSql).as("eta_sq"))
  }

  private val anovaTermSql =
    """CAST(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
      |  AS DECIMAL(24,2))""".stripMargin
  private val ssbSql =
    """CAST(t_all AS DOUBLE)
      |  - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
      |    / CAST(n_total AS DOUBLE)""".stripMargin
  private val sswSql =
    "CAST(q4_all AS DOUBLE) / 10000.0 - CAST(t_all AS DOUBLE)"
  private val fSql =
    """CASE WHEN k_groups > 1 AND n_total > k_groups AND ssw > 0
      |  THEN (ssb / (CAST(k_groups AS DOUBLE) - 1.0))
      |     / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)))
      |  END""".stripMargin
  private val etaSql =
    """CASE WHEN k_groups > 1 AND n_total > k_groups AND (ssb + ssw) > 0
      |  THEN ssb / (ssb + ssw) END""".stripMargin

  val statsAnovaSegmentsSql: String =
    s"""WITH g AS (
       |  SELECT c.c_mktsegment AS seg,
       |    count(*) AS n_g,
       |    CAST(sum(xk) AS DECIMAL(38,5)) AS s_g,
       |    CAST(floor(sum(xk * xk) * 10000) AS DECIMAL(38,0)) AS q4_g
       |  FROM (
       |    SELECT o_custkey,
       |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) / 1000 AS DECIMAL(18,5)) AS xk
       |    FROM orders) o
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY 1),
       |t AS (
       |  SELECT *,
       |    ${anovaTermSql.replace("\n", "\n    ")} AS t_g
       |  FROM g),
       |a AS (
       |  SELECT count(*) AS k_groups,
       |    CAST(sum(n_g) AS BIGINT) AS n_total,
       |    CAST(sum(s_g) AS DECIMAL(38,5)) AS s_all,
       |    CAST(sum(q4_g) AS DECIMAL(38,0)) AS q4_all,
       |    CAST(sum(t_g) AS DECIMAL(38,2)) AS t_all
       |  FROM t),
       |s AS (
       |  SELECT *,
       |    ${ssbSql.replace("\n", "\n    ")} AS ssb,
       |    ${sswSql} AS ssw
       |  FROM a)
       |SELECT k_groups, n_total,
       |  CAST(k_groups - 1 AS BIGINT) AS dof_between,
       |  CAST(n_total - k_groups AS BIGINT) AS dof_within,
       |  ${fSql.replace("\n", "\n  ")} AS f_stat,
       |  ${etaSql.replace("\n", "\n  ")} AS eta_sq
       |FROM s""".stripMargin

  /** χ² independence report over the SAME two contingency panels
    * profile_mutual_info scores (documents: lang × source; events:
    * event_type × day-of-week) — MI says how MUCH the pair shares; χ²
    * says whether the association clears sampling noise at all, with
    * the dof a significance table needs, plus Cramér's V (the
    * effect-size normalization that survives n).
    *
    * Zero-cell exactness: the observed-cells aggregate omits empty
    * cells, but the absent cells' (0−e)²/e = e mass is NOT droppable;
    * the algebraic identity  χ² = n·(Σ_observed o²/(cx·cy) − 1)
    * accounts for them with no cross-product materialization — the
    * per-cell term is pure mult/div over exact counts (correctly
    * rounded, identical both engines), quantized DECIMAL(18,9) and
    * summed exactly (order-independent — the miPanel device), with ONE
    * double multiply at the edge.
    *
    * Scale shape: one scan per table → |X|·|Y|-bounded cell aggregate
    * (map-side combined) feeding margins/total/terms — everything
    * after the first agg is bounded-row work with broadcast margins.
    */
  def statsChisqIndependence(spark: SparkSession, dir: String): DataFrame = {
    val docCells = Tables.documents(spark, dir)
      .select(col("lang").as("x"), col("source").as("y"))
    val evCells = Tables.events(spark, dir)
      .select(col("event_type").as("x"),
        expr("CAST(pmod((unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) DIV 86400000000 + 4, 7) AS STRING)")
          .as("y"))
    chisqPanel(spark, docCells, "documents", "lang", "source")
      .unionByName(chisqPanel(spark, evCells, "events", "event_type", "dow"))
      .orderBy(col("table_name"))
  }

  private def chisqPanel(spark: SparkSession, pairs: DataFrame, rel: String,
      cX: String, cY: String): DataFrame = {
    val cells = pairs.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cnt"))
      // |X|·|Y|-bounded; feeds margins, the total, and the term join
      .localCheckpoint()
    val mx = cells.groupBy(col("x")).agg(sum(col("cnt")).as("cx"))
    val my = cells.groupBy(col("y")).agg(sum(col("cnt")).as("cy"))
    val tot = cells.agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_cells"))
    // 1-row × 1-row with an explicit hint — plans the whitelisted
    // BroadcastNestedLoopJoin, never a CartesianProduct
    val dims = mx.agg(count(lit(1)).as("kx"))
      .crossJoin(broadcast(my.agg(count(lit(1)).as("ky"))))
    val s = cells.join(broadcast(mx), "x").join(broadcast(my), "y")
      .select(expr(
        """CAST(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) /
          |  (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))
          |  AS DECIMAL(18,9))""".stripMargin).as("term"))
      .agg(sum(col("term")).as("s_d"))
    s.crossJoin(broadcast(tot)).crossJoin(broadcast(dims))
      .select(lit(rel).as("table_name"), lit(cX).as("col_x"),
        lit(cY).as("col_y"),
        col("n").cast("long").as("n_rows"),
        col("n_cells").cast("long").as("n_cells"),
        expr("CAST((kx - 1) * (ky - 1) AS BIGINT)").as("dof"),
        expr(chi2Sql).as("chi2"),
        expr(cramersSql).as("cramers_v"))
  }

  // χ² = n·(s − 1) and V = sqrt(χ² / (n·min(kx−1, ky−1))) — identical
  // double composition both engines; NULL on degenerate margins
  private val chi2Sql =
    """CASE WHEN n > 0 THEN
      |  CAST(n AS DOUBLE) * (CAST(s_d AS DOUBLE) - 1.0)
      |ELSE CAST(NULL AS DOUBLE) END""".stripMargin
  private val cramersSql =
    """CASE WHEN n > 0 AND kx > 1 AND ky > 1 THEN
      |  sqrt((CAST(n AS DOUBLE) * (CAST(s_d AS DOUBLE) - 1.0))
      |    / (CAST(n AS DOUBLE) * CAST(least(kx - 1, ky - 1) AS DOUBLE)))
      |ELSE CAST(NULL AS DOUBLE) END""".stripMargin

  val statsChisqIndependenceSql: String = {
    val dowExpr =
      "CAST(((((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000 + 4) % 7) + 7) % 7 AS VARCHAR)"
    def block(i: Int, cellSql: String, rel: String, cX: String,
        cY: String): (String, String) = {
      val ctes =
        s"""c$i AS ($cellSql),
           |mx$i AS (SELECT x, sum(cnt) AS cx FROM c$i GROUP BY 1),
           |my$i AS (SELECT y, sum(cnt) AS cy FROM c$i GROUP BY 1),
           |tot$i AS (SELECT sum(cnt) AS n, count(*) AS n_cells FROM c$i),
           |dim$i AS (SELECT (SELECT count(*) FROM mx$i) AS kx,
           |                 (SELECT count(*) FROM my$i) AS ky),
           |s$i AS (
           |  SELECT sum(CAST(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) /
           |    (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))
           |    AS DECIMAL(18,9))) AS s_d
           |  FROM c$i JOIN mx$i USING (x) JOIN my$i USING (y))""".stripMargin
      val sel =
        s"""SELECT '$rel' AS table_name, '$cX' AS col_x, '$cY' AS col_y,
           |  CAST(n AS BIGINT) AS n_rows, CAST(n_cells AS BIGINT) AS n_cells,
           |  CAST((kx - 1) * (ky - 1) AS BIGINT) AS dof,
           |  ${chi2Sql.replace("\n", "\n  ")} AS chi2,
           |  ${cramersSql.replace("\n", "\n  ")} AS cramers_v
           |FROM s$i, tot$i, dim$i""".stripMargin
      (ctes, sel)
    }
    val (c1, s1) = block(1,
      "SELECT lang AS x, source AS y, count(*) AS cnt FROM documents GROUP BY 1, 2",
      "documents", "lang", "source")
    val (c2, s2) = block(2,
      s"SELECT event_type AS x, $dowExpr AS y, count(*) AS cnt FROM events GROUP BY 1, 2",
      "events", "event_type", "dow")
    s"""WITH $c1,
       |$c2
       |$s1
       |UNION ALL
       |$s2
       |ORDER BY table_name""".stripMargin
  }
}
