package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exploratory statistics over wide fact tables: a one-pass pairwise
  * correlation matrix and a two-proportion A/B significance test.
  *
  * Both are single-aggregate shapes: k columns need k(k+3)/2 + 1 moment
  * sums, computed in ONE partial-aggregated pass over the data — the
  * k²-pass naive encoding (one `corr` call per pair re-scanning the
  * input) is the thing to avoid at 100 TB, not the arithmetic. */
object Stats {

  /** Pairwise Pearson correlations of `cols` in one scan. Emits one row
    * per unordered pair (col_x < col_y lexicographically) with `n` and
    * `pearson` = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)).
    *
    * The moment sums are plain `sum` aggregates — map-side combined, a
    * single 1-row result — and the matrix assembly is a driver-free
    * `explode` over literal-indexed structs, so the plan is scan →
    * partial agg → final agg regardless of k. Pairs with zero variance
    * on either side come out NULL (0/0), matching SQL `corr`. NULL cells
    * are excluded per-pair the way two-argument aggregates do it:
    * rows where EITHER side is NULL drop from that pair's sums. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    // Per-pair moment sums over rows where both sides are non-NULL —
    // 5 sums + 1 count per pair, all in one Aggregate node.
    def pm(a: String, b: String, e: Column) =
      sum(when(col(a).isNotNull && col(b).isNotNull, e))
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(
        count(when(col(a).isNotNull && col(b).isNotNull, lit(1)))
          .cast("double").as(s"__n_${a}_$b"),
        pm(a, b, col(a)).as(s"__sx_${a}_$b"),
        pm(a, b, col(b)).as(s"__sy_${a}_$b"),
        pm(a, b, col(a) * col(a)).as(s"__sxx_${a}_$b"),
        pm(a, b, col(b) * col(b)).as(s"__syy_${a}_$b"),
        pm(a, b, col(a) * col(b)).as(s"__sxy_${a}_$b"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val (n, sx, sy, sxx, syy, sxy) = (col(s"__n_${a}_$b"),
        col(s"__sx_${a}_$b"), col(s"__sy_${a}_$b"), col(s"__sxx_${a}_$b"),
        col(s"__syy_${a}_$b"), col(s"__sxy_${a}_$b"))
      val r = (n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        n.cast("long").as("n"), r.as("pearson"))
    }
    m.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** F20: POISSON-BOOTSTRAP confidence interval for a mean (the
    * distributed bootstrap — Chamandy et al. / Kleiner et al., public
    * knowledge: resampling n-out-of-n needs global coordination, but
    * multinomial(n, 1/n) counts converge to independent Poisson(1)
    * weights, which are a pure per-(unit, replica) function). Replica
    * weights come from the inverse Poisson CDF applied to the SAME
    * seeded md5 uniform every sampler here uses — deterministic,
    * engine-reproducible, mirrored literal-for-literal by the oracle.
    *
    * Shape: units × `replicas` contribution explosion (fixed ×B rows)
    * → one (replica) aggregate of weighted sums → a B-row sort for the
    * percentile cut (B is a constant ~100; the sort is replica-sized,
    * never data-sized). Output: one row — (n_units, replicas,
    * point_est, ci_lo, ci_hi) at the type-1 percentile ranks
    * ⌈α/2·B⌉ and ⌈(1−α/2)·B⌉.
    *
    * Contract: needs enough units that no replica draws all-zero
    * weights (P(all n weights zero) = e^{−n} per replica —
    * astronomically small past a few dozen units). The contract is
    * ENFORCED: the replica means are counted and the call fails loud
    * if the percentile ranks would fall off the end, instead of
    * silently emitting a 0-row frame. */
  def bootstrapMeanCi(units: DataFrame, valueCol: Column,
      unitId: Column, replicas: Int = 100, alphaPct: Int = 5,
      seed: String = "boot"): DataFrame = {
    require(replicas >= 2, s"replicas must be >= 2, got $replicas")
    require(alphaPct >= 1 && alphaPct < 100,
      s"alphaPct must be in [1, 100), got $alphaPct")
    // inverse Poisson(1) CDF thresholds, truncated at 5 (P > 5 ≈ 1e-4)
    val t = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563)
    val contrib = units
      .select(valueCol.cast("double").as("__x"),
        unitId.cast("string").as("__u"))
      .select(col("__x"), col("__u"),
        explode(sequence(lit(0), lit(replicas - 1))).as("__b"))
      .withColumn("__h", graft.curate.Curation.uniformHash(
        concat_ws("#", col("__u"), col("__b")), seed))
      .withColumn("__w",
        when(col("__h") < t(0), 0L).when(col("__h") < t(1), 1L)
          .when(col("__h") < t(2), 2L).when(col("__h") < t(3), 3L)
          .when(col("__h") < t(4), 4L).otherwise(5L))
    val means = graft.util.Caches.persistTracked(
      contrib.groupBy(col("__b"))
        .agg(sum(col("__w") * col("__x")).as("__sx"),
          sum(col("__w")).as("__sw"))
        .select(col("__b"),
          when(col("__sw") > 0, col("__sx") / col("__sw")).as("__m"))
        .filter(col("__m").isNotNull))
    val ranked = means.withColumn("__r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__m"), col("__b"))).cast("long"))
    // type-1 percentile ranks, computed in exact integer arithmetic
    val loRank = (alphaPct.toLong * replicas + 199L) / 200L
    val hiRank = ((200L - alphaPct) * replicas + 199L) / 200L
    // fail loud, never a vanished row: a degenerate population (too
    // few units -> all-zero-weight replicas) must not silently drop
    // the rank rows the percentile cut addresses
    val nMeans = means.count()
    require(nMeans >= hiRank,
      s"bootstrapMeanCi: only $nMeans of $replicas replica means " +
        s"exist (need rank $hiRank) — population too small for a " +
        "bootstrap CI")
    val point = units.agg(avg(valueCol.cast("double")).as("point_est"),
      count(lit(1)).as("n_units"))
    point.crossJoin(broadcast(
        ranked.filter(col("__r") === loRank)
          .select(col("__m").as("ci_lo"))))
      .crossJoin(broadcast(
        ranked.filter(col("__r") === hiRank)
          .select(col("__m").as("ci_hi"))))
      .select(col("n_units"), lit(replicas).as("replicas"),
        col("point_est"), col("ci_lo"), col("ci_hi"))
  }

  /** X111: exact per-group TYPE-1 quantiles — value at rank
    * ⌈p·n⌉ under (value, id) order, the X81 integer-rank discipline
    * (p is a RATIONAL num/den; `⌈num·n/den⌉ = (num·n + den − 1) div
    * den` never touches a float, so a 0.9·n that lands at
    * 135.00000000000003 in doubles cannot shift the rank). One
    * group-keyed sort window; output rows = groups × quantiles. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: Column,
      idCol: Column, quantiles: Seq[(Int, Int, String)] =
        Seq((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"), (9, 10, "p90")))
      : DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (num, den, label) =>
      require(num >= 1 && num <= den,
        s"quantile '$label': need 1 <= num <= den, got $num/$den")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("value"), col("__id"))
    // same NULL-order discipline as winsorize: exclude before ranking
    val ranked = df
      .select(col(groupCol), valueCol.as("value"), idCol.as("__id"))
      .filter(col("value").isNotNull)
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol)))
        .cast("long"))
    val picks = quantiles.map { case (num, den, label) =>
      ranked.filter(col("__r") ===
          expr(s"($num * __n + ${den - 1}) div $den"))
        .select(col(groupCol), lit(label).as("quantile"),
          col("__n").as("n"), col("__r").as("rank"), col("value"))
    }
    picks.reduce(_ unionByName _)
  }

  /** X124: per-group WINSORIZATION — clamp a feature to its group's
    * [lo, hi] type-1 quantile cut values (the standard heavy-tail
    * treatment before scaling/regression: trimming DELETES tail rows,
    * winsorizing keeps them at the boundary, so group sizes and join
    * keys survive). Cuts are the X111 integer-rank picks under the
    * (value, id) total order — data values, never interpolated
    * floats — and the clamp is two exact comparisons, so output is
    * bit-identical cross-engine with no rounding.
    *
    * Scale: one group-keyed rank window + two group-keyed joins of
    * the groups-sized cut tables. Output: one row per input row —
    * (group, id, value, lo_cut, hi_cut, winsorized). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: Column,
      idCol: Column, lo: (Int, Int) = (1, 10), hi: (Int, Int) = (9, 10))
      : DataFrame = {
    Seq(("lo", lo), ("hi", hi)).foreach { case (name, (num, den)) =>
      require(num >= 1 && num <= den,
        s"$name quantile: need 1 <= num <= den, got $num/$den")
    }
    require(lo._1.toLong * hi._2 <= hi._1.toLong * lo._2,
      s"winsorize: lo $lo above hi $hi")
    import org.apache.spark.sql.expressions.Window
    val wv = Window.partitionBy(col(groupCol))
      .orderBy(col("value"), col("__id"))
    val wn = Window.partitionBy(col(groupCol))
    // NULL values are excluded BEFORE ranking (and from the output):
    // Spark sorts NULLS FIRST but DuckDB NULLS LAST, so a null entering
    // the rank silently shifts every integer-rank cut cross-engine.
    val ranked = graft.util.Caches.persistTracked(df
      .select(col(groupCol), valueCol.cast("double").as("value"),
        idCol.as("__id"))
      .filter(col("value").isNotNull)
      .withColumn("__r", row_number().over(wv).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn).cast("long")))
    def cut(name: String, num: Int, den: Int) = ranked
      .filter(col("__r") ===
        expr(s"($num * __n + ${den - 1}) div $den"))
      .select(col(groupCol).as(s"__g_$name"), col("value").as(name))
    ranked
      .join(cut("lo_cut", lo._1, lo._2),
        col(groupCol) === col("__g_lo_cut")).drop("__g_lo_cut")
      .join(cut("hi_cut", hi._1, hi._2),
        col(groupCol) === col("__g_hi_cut")).drop("__g_hi_cut")
      .select(col(groupCol), col("__id").as("id"), col("value"),
        col("lo_cut"), col("hi_cut"),
        least(greatest(col("value"), col("lo_cut")), col("hi_cut"))
          .as("winsorized"))
  }

  /** Two-proportion A/B z-test: one row with per-variant exposure and
    * conversion counts, rates, absolute lift, the pooled-variance
    * z-statistic z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁)), and a
    * `significant` flag at the given |z| threshold (1.96 ≙ two-sided
    * α = 0.05).
    *
    * `unit` rows must be pre-deduplicated to one row per experimental
    * unit with a 0/1 `converted` column and a 0/1 `variant` column (the
    * assignment should derive from a hash of the unit id, never from
    * `rand()` — re-runs must assign identically). Counts are exact
    * integers; everything after is a fixed IEEE expression tree, so two
    * engines computing this agree bit-for-bit. One aggregate, 1-row
    * result. */
  def abTest(units: DataFrame, variant: Column, converted: Column,
      zThreshold: Double = 1.96): DataFrame = {
    val agg = units.agg(
      sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(variant === 0, converted.cast("long")).otherwise(0L)).as("c0"),
      sum(when(variant === 1, converted.cast("long")).otherwise(0L)).as("c1"))
    // Degenerate experiments (an empty arm, or 0% / 100% pooled
    // conversion) have no sampling variance to test against: rate and z
    // come out NULL, not an ANSI division-by-zero error mid-pipeline.
    val p0 = when(col("n0") > 0, col("c0") / col("n0"))
    val p1 = when(col("n1") > 0, col("c1") / col("n1"))
    val pooled = (col("c0") + col("c1")) / (col("n0") + col("n1"))
    val se = when(col("n0") > 0 && col("n1") > 0,
      sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1"))))
    val z = when(se > 0, (p1 - p0) / se)
    agg.select(col("n0"), col("n1"), col("c0"), col("c1"),
      p0.as("p0"), p1.as("p1"), (p1 - p0).as("lift"), z.as("z"),
      (abs(z) > zThreshold).cast("int").as("significant"))
  }

  /** F46: CUPED VARIANCE REDUCTION (Deng, Xu, Kohavi & Walker 2013,
    * WSDM) — the industry-standard experiment accelerator: adjust the
    * post-period metric by the pre-period covariate, `y* = y −
    * θ(x − x̄)` with `θ = cov(x, y)/var(x)` fit on the POOLED arms
    * (fitting per-arm would bias the contrast), cutting metric
    * variance by the squared pre-post correlation without touching
    * the treatment effect's expectation.
    *
    * Everything derives from ONE aggregate of DECIMAL-exact moments
    * (Σx, Σy, Σxy, Σx², Σy² pooled + per-arm counts/sums): θ, raw and
    * CUPED lifts, before/after variances and the reduction share are
    * closed forms over those sums — no second pass over the data, no
    * per-row adjusted column ever materializes. Fixed IEEE trees cast
    * to double once, quantized-6; zero pre-period variance NULLs the
    * adjustment (nothing to regress on) and leaves the raw lift
    * reported. Input: ONE ROW PER UNIT (pre-aggregate first — row-level
    * CUPED on repeated-measure units double-counts). Output: 1 row. */
  def cuped(units: DataFrame, variant: Column, preCol: Column,
      postCol: Column): DataFrame = {
    val x = preCol.cast("decimal(18,6)")
    val y = postCol.cast("decimal(18,6)")
    val agg = units.agg(
      count(lit(1)).as("n"),
      sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"),
      sum(when(variant === 0, x)).as("__sx0"),
      sum(when(variant === 1, x)).as("__sx1"),
      sum(when(variant === 0, y)).as("__sy0"),
      sum(when(variant === 1, y)).as("__sy1"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val covN = sxy - sx * sy / n   // (n-1)·cov — the n-1 cancels in θ
    val varXN = sxx - sx * sx / n
    val varYN = syy - sy * sy / n
    val theta = covN / varXN
    val n0 = col("n0").cast("double"); val n1 = col("n1").cast("double")
    val liftRaw = col("__sy1").cast("double") / n1 -
      col("__sy0").cast("double") / n0
    val liftCuped = liftRaw - theta *
      (col("__sx1").cast("double") / n1 - col("__sx0").cast("double") / n0)
    val varY = varYN / (n - lit(1.0))
    val varYAdj = (varYN - lit(2.0) * theta * covN +
      theta * theta * varXN) / (n - lit(1.0))
    val ok = col("n0") > 0 && col("n1") > 0 && col("n") > 1
    val okX = ok && varXN > 0
    import graft.functions.q6
    agg.select(col("n"), col("n0"), col("n1"),
      q6(when(okX, theta)).as("theta"),
      q6(when(ok, liftRaw)).as("lift_raw"),
      q6(when(okX, liftCuped)).as("lift_cuped"),
      q6(when(ok, varY)).as("var_y"),
      q6(when(okX, varYAdj)).as("var_y_cuped"),
      q6(when(okX && varYN > 0, lit(1.0) - varYAdj / varY))
        .as("variance_reduction"))
  }

  /** F43: UCB1 ALLOCATION SNAPSHOT (Auer et al. 2002) — the
    * deterministic bandit dashboard: per arm, exact pull/reward
    * counts, the mean reward, the UCB1 index `mean + √(2·ln N / n)`,
    * and which arm a UCB policy would pull next. Thompson sampling
    * needs randomness; UCB1 is the deterministic-index policy, which
    * is what makes it reproducible as a QUERY — re-running the
    * snapshot on the same log yields the same decision.
    *
    * Determinism: counts exact BIGINT; mean is one division; the index
    * is a fixed ln/sqrt tree quantized-6; the chosen arm is the max of
    * (ucb_q6, arm) struct — deterministic under index ties. (Arms the
    * log has never pulled don't appear — UCB1's play-each-arm-once
    * bootstrap happens before a log exists to query.) One groupBy +
    * two broadcast 1-row aggregates. Output: one row per arm. */
  def ucbSnapshot(pulls: DataFrame, armCol: Column, rewardCol: Column)
      : DataFrame =
    ucbFromCounts(pulls.groupBy(armCol.as("arm"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(rewardCol.cast("decimal(18,6)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"))
          .as("__r")))

  /** The [[ucbSnapshot]] derivation over an already-counted per-arm
    * (n, __r) table. Pull counts and DECIMAL reward sums merge
    * exactly — the streaming monitor sums per-batch arm tables and
    * publishes the identical allocation decision. */
  def ucbFromCounts(arms: DataFrame): DataFrame = {
    val tot = arms.agg(sum(col("n")).as("__N"))
    val withIdx = arms.crossJoin(broadcast(tot))
      .withColumn("mean_reward",
        graft.functions.q6(col("__r").cast("double") /
          col("n").cast("double")))
      .withColumn("ucb", graft.functions.q6(
        col("__r").cast("double") / col("n").cast("double") +
          sqrt(lit(2.0) * log(col("__N").cast("double")) /
            col("n").cast("double"))))
    val best = withIdx.agg(max(struct(col("ucb"), col("arm")))
      .as("__best"))
    withIdx.crossJoin(broadcast(best))
      .select(col("arm"), col("n"), col("mean_reward"), col("ucb"),
        (col("ucb") === col("__best.ucb") &&
          col("arm") === col("__best.arm")).cast("int").as("is_chosen"))
  }

  /** F44: DIFFERENCE-IN-DIFFERENCES estimator (Card & Krueger 1994
    * canon; public knowledge) — the quasi-experimental workhorse when
    * assignment isn't randomized: `DiD = (ȳ_T,post − ȳ_T,pre) −
    * (ȳ_C,post − ȳ_C,pre)`, with a large-sample SE from the four cell
    * variances `√(Σ v_g,p / n_g,p)` and z = DiD/SE. Identifies the
    * effect under parallel trends — which this REPORTS, it cannot
    * test; pair with the E-tier trend operators for that.
    *
    * One aggregate pass: per-cell n, DECIMAL-exact Σy and Σy² (the
    * same order-immune moment discipline as [[welchT]]); means,
    * variances, DiD, SE, z are fixed trees cast to double once,
    * quantized-6. Any cell with < 2 rows ⇒ NULL SE/z (the DiD point
    * estimate still reports when all four cells have ≥ 1 row). */
  def diffInDiff(df: DataFrame, treatedCol: Column, postCol: Column,
      valueCol: Column): DataFrame = {
    val g = treatedCol.cast("int")
    val p = postCol.cast("int")
    val x = valueCol.cast("decimal(18,6)")
    def cell(gi: Int, pi: Int, suffix: String) = Seq(
      coalesce(sum(when(g === gi && p === pi, 1L)), lit(0L))
        .as(s"n_$suffix"),
      sum(when(g === gi && p === pi, x)).as(s"__s_$suffix"),
      sum(when(g === gi && p === pi, x * x)).as(s"__q_$suffix"))
    val aggs = cell(1, 0, "t_pre") ++ cell(1, 1, "t_post") ++
      cell(0, 0, "c_pre") ++ cell(0, 1, "c_post")
    val agg = df.agg(aggs.head, aggs.tail: _*)
    def m(s: String) = when(col(s"n_$s") > 0,
      col(s"__s_$s").cast("double") / col(s"n_$s").cast("double"))
    def v(s: String) = when(col(s"n_$s") > 1,
      (col(s"__q_$s").cast("double") -
        col(s"__s_$s").cast("double") * col(s"__s_$s").cast("double") /
          col(s"n_$s").cast("double")) /
        (col(s"n_$s").cast("double") - lit(1.0)))
    val did = (m("t_post") - m("t_pre")) - (m("c_post") - m("c_pre"))
    val se2 = v("t_post") / col("n_t_post").cast("double") +
      v("t_pre") / col("n_t_pre").cast("double") +
      v("c_post") / col("n_c_post").cast("double") +
      v("c_pre") / col("n_c_pre").cast("double")
    import graft.functions.q6
    agg.select(
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      q6(m("t_pre")).as("mean_t_pre"), q6(m("t_post")).as("mean_t_post"),
      q6(m("c_pre")).as("mean_c_pre"), q6(m("c_post")).as("mean_c_post"),
      q6(did).as("did"),
      q6(when(se2 > 0, sqrt(se2))).as("se"),
      q6(when(se2 > 0, did / sqrt(se2))).as("z"))
  }

  /** F42: WELCH'S UNEQUAL-VARIANCE t-TEST (Welch 1947) for a CONTINUOUS
    * metric between two variants — the revenue/latency companion of the
    * proportion [[abTest]] (Student's pooled t silently assumes equal
    * variances; treatment usually changes the variance too). One
    * aggregate pass: per-arm n, DECIMAL(18,6)-exact Σx and Σx²
    * (order-immune — a double running sum would drift with partition
    * order), then means, sample variances via the moment identity
    * `(Σx² − (Σx)²/n)/(n−1)`, `t = (m₁−m₀)/√(v₁/n₁+v₀/n₀)` and the
    * Welch–Satterthwaite dof — each a fixed IEEE tree over exact
    * operands, cast to double once. Degenerate arms (< 2 rows, or both
    * variances 0) emit NULL t/dof. Output: 1 row. */
  def welchT(units: DataFrame, variant: Column, value: Column)
      : DataFrame = {
    val x = value.cast("decimal(18,6)")
    welchFromMoments(units.agg(
      sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(variant === 0, x)).as("__s0"),
      sum(when(variant === 1, x)).as("__s1"),
      sum(when(variant === 0, x * x)).as("__q0"),
      sum(when(variant === 1, x * x)).as("__q1")))
  }

  /** The [[welchT]] derivation over an already-aggregated 1-row moment
    * table (n0, n1, __s0, __s1, __q0, __q1). The DECIMAL moments are
    * exact and ASSOCIATIVE — the streaming monitor sums per-batch
    * moment rows and publishes the identical test. */
  def welchFromMoments(agg: DataFrame): DataFrame = {
    def stats(i: Int) = {
      val n = col(s"n$i").cast("double")
      val s = col(s"__s$i").cast("double")
      val q = col(s"__q$i").cast("double")
      val mean = when(col(s"n$i") > 0, s / n)
      val variance = when(col(s"n$i") > 1,
        (q - s * s / n) / (n - lit(1.0)))
      (mean, variance)
    }
    val (m0, v0) = stats(0)
    val (m1, v1) = stats(1)
    val se2 = v1 / col("n1").cast("double") + v0 / col("n0").cast("double")
    val t = when(col("n0") > 1 && col("n1") > 1 && se2 > 0,
      (m1 - m0) / sqrt(se2))
    val dof = when(col("n0") > 1 && col("n1") > 1 && se2 > 0,
      se2 * se2 /
        ((v1 / col("n1").cast("double")) * (v1 / col("n1").cast("double")) /
          (col("n1").cast("double") - lit(1.0)) +
          (v0 / col("n0").cast("double")) * (v0 / col("n0").cast("double")) /
            (col("n0").cast("double") - lit(1.0))))
    import graft.functions.{q6, quantize}
    // Variances publish at 2 decimals, NOT q6: var ~ metric², so at a
    // 1e5-scale metric var0 ≈ 2e10 and var·10⁶ ≈ 2e16 > 2^53 — outside
    // quantize's own contract (functions/package.scala), where the 6th
    // decimal is below double ulp and cannot be engine-stable. var·10²
    // ≈ 2e12 stays exact. Same discipline as oneWayAnova's raw SSB/SSW.
    agg.select(col("n0"), col("n1"),
      q6(m0).as("mean0"), q6(m1).as("mean1"),
      quantize(v0, 2).as("var0"), quantize(v1, 2).as("var1"),
      q6(t).as("t"), q6(dof).as("dof"))
  }

  /** F75: COHEN'S d + HEDGES' g STANDARDIZED EFFECT SIZE (Cohen 1988;
    * Hedges 1981 — public knowledge) — the "HOW BIG is the difference"
    * companion of [[welchT]]'s "is there a difference": at 10M units a
    * t-test flags a 0.001-SD shift as significant, so the ship/no-ship
    * decision reads the magnitude, not the p-value.
    * `d = (m₁−m₀)/s_p` with the pooled SD
    * `s_p = √(((n₀−1)v₀+(n₁−1)v₁)/(n₀+n₁−2))`, and Hedges'
    * small-sample correction `g = d·(1 − 3/(4(n₀+n₁)−9))`.
    *
    * Same moment kernel as [[welchT]]: ONE aggregate pass with
    * DECIMAL(18,6)-exact Σx/Σx² (order-immune), every derived value a
    * fixed IEEE tree over exact operands cast once. Only the published
    * means/d/g are quantized; d and g are O(1) SD-ratios by
    * construction, far inside the quantize 2^53 contract that bit f42.
    * Degenerate boards (either arm < 2 rows, or zero pooled variance)
    * emit NULL d/g. Output: 1 row — (n0, n1, mean0, mean1, d, g). */
  def effectSize(units: DataFrame, variant: Column, value: Column)
      : DataFrame = {
    val x = value.cast("decimal(18,6)")
    val agg = units.agg(
      sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(variant === 0, x)).as("__s0"),
      sum(when(variant === 1, x)).as("__s1"),
      sum(when(variant === 0, x * x)).as("__q0"),
      sum(when(variant === 1, x * x)).as("__q1"))
    def stats(i: Int) = {
      val n = col(s"n$i").cast("double")
      val s = col(s"__s$i").cast("double")
      val q = col(s"__q$i").cast("double")
      (when(col(s"n$i") > 0, s / n),
        when(col(s"n$i") > 1, (q - s * s / n) / (n - lit(1.0))))
    }
    val (m0, v0) = stats(0)
    val (m1, v1) = stats(1)
    val n0d = col("n0").cast("double")
    val n1d = col("n1").cast("double")
    val pooled = ((n0d - lit(1.0)) * v0 + (n1d - lit(1.0)) * v1) /
      (n0d + n1d - lit(2.0))
    val d = when(col("n0") > 1 && col("n1") > 1 && pooled > 0,
      (m1 - m0) / sqrt(pooled))
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * (n0d + n1d) - lit(9.0))
    import graft.functions.q6
    agg.select(col("n0"), col("n1"),
      q6(m0).as("mean0"), q6(m1).as("mean1"),
      q6(d).as("d"), q6(d * j).as("g"))
  }

  /** F81: SEEDED RANDOMIZATION TEST for a difference in means (Fisher
    * 1935's randomization inference, in the re-randomization form —
    * public knowledge): no normality, no variance model — just "how
    * extreme is the OBSERVED arm difference among `reps` random
    * re-assignments of the same values". The exact-inference fallback
    * when [[welchT]]'s assumptions are the question: heavy-tailed
    * revenue, tiny arms, bounded metrics.
    *
    * Re-assignments are Bernoulli(½) label draws from the md5 low bit
    * of (seed, rep, id) — a RANDOMIZATION test (arm sizes vary
    * binomially per rep), not a fixed-margin permutation; documented,
    * standard, and embarrassingly parallel — and a pure function of
    * (seed, rep, CALLER id), so the test is rerun- and
    * partitioning-reproducible. p = (1 + #{|Δ_j| ≥
    * |Δ_obs|}) / (reps + 1) — the add-one form that can never claim
    * p = 0.
    *
    * Engine parity + scale: values floor-scale to 1e6 LONGs ONCE (the
    * test is DEFINED on the quantized values); every per-rep sum/count
    * is an exact integer from ONE `reps`-way explode + hash aggregate
    * (map-side combined — the corpus is scanned once, the shuffle is
    * reps-sized); Δ_j and Δ_obs are identical pinned two-division
    * trees, so the ≥ comparisons cannot flip cross-engine. Cost is
    * reps × corpus map work by construction — callers size `reps`
    * accordingly. Degenerate reps (an empty arm) compare as NULL and
    * drop from the count (never spuriously "extreme"); p publishes as
    * the exact rational's single division. Output: 1 row —
    * (n, reps, diff_obs q6, n_extreme, p). */
  def randomizationTest(df: DataFrame, idCol: Column, variant: Column,
      value: Column, reps: Int = 200, seed: String = "rt"): DataFrame = {
    require(reps >= 1 && reps <= 100000,
      s"reps must be in [1, 1e5], got $reps")
    val D = "decimal(38,0)"
    // fail loud on NULL ids: the per-rep draw hashes (seed, rep, id)
    // via concat_ws, which SKIPS NULL — every NULL-id row would share
    // one draw per rep while a SQL mirror's `||` yields NULL-hash
    // rows. Unit ids are the caller's contract; enforce it.
    val base = graft.util.Caches.persistTracked(
      df.select(
        when(idCol.isNull,
          raise_error(lit("randomizationTest: NULL id — the " +
            "re-randomization draw is keyed on the unit id")))
          .otherwise(idCol.cast("string")).as("__id"),
        variant.cast("int").as("__t"),
        floor(value.cast("double") * lit(1e6) + lit(0.5)).cast("long")
          .as("__x"))
        .filter(col("__t").isNotNull && col("__x").isNotNull))
    def meanDiff(s1: Column, n1: Column, s0: Column, n0: Column) =
      when(n1 > 0 && n0 > 0,
        s1.cast("double") / lit(1e6) / n1.cast("double") -
          s0.cast("double") / lit(1e6) / n0.cast("double"))
    val obs = base.agg(
      sum(when(col("__t") === 1, col("__x")).otherwise(0L)).cast(D)
        .as("__s1"),
      sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__n1"),
      sum(when(col("__t") =!= 1, col("__x")).otherwise(0L)).cast(D)
        .as("__s0"),
      sum(when(col("__t") =!= 1, 1L).otherwise(0L)).as("__n0"))
      .select((col("__n1") + col("__n0")).as("n"),
        meanDiff(col("__s1"), col("__n1"), col("__s0"), col("__n0"))
          .as("__dobs"))
    // ONE corpus scan: explode reps, re-draw the arm from the md5 low
    // bit, aggregate per rep (reps-sized shuffle, map-side combined)
    val perRep = base
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0), lit(reps - 1))).as("__j"))
      .withColumn("__rt", pmod(conv(substring(md5(concat_ws(":",
        lit(s"rt|$seed"), col("__j").cast("string"), col("__id"))),
        1, 1), 16, 10).cast("long"), lit(2L)))
      .groupBy(col("__j"))
      .agg(sum(when(col("__rt") === 1, col("__x")).otherwise(0L))
          .cast(D).as("__s1"),
        sum(when(col("__rt") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__rt") =!= 1, col("__x")).otherwise(0L)).cast(D)
          .as("__s0"),
        sum(when(col("__rt") =!= 1, 1L).otherwise(0L)).as("__n0"))
      .select(meanDiff(col("__s1"), col("__n1"), col("__s0"),
        col("__n0")).as("__dj"))
    import graft.functions.q6
    perRep.crossJoin(broadcast(obs))
      .agg(first(col("n")).as("n"), first(col("__dobs")).as("__dobs"),
        sum(when(abs(col("__dj")) >= abs(col("__dobs")), 1L)
          .otherwise(0L)).as("n_extreme"))
      .select(col("n"), lit(reps).as("reps"),
        q6(col("__dobs")).as("diff_obs"), col("n_extreme"),
        ((col("n_extreme") + lit(1L)).cast("double") /
          lit((reps + 1).toDouble)).as("p"))
  }

  /** F53: ONE-WAY ANOVA across k groups (Fisher 1925, public
    * knowledge) — `F = (SSB/(k−1)) / (SSW/(N−k))` with the η² effect
    * size `SSB/(SSB+SSW)` (a bare F hides whether a "significant"
    * difference is big). The parametric sibling of
    * [[graft.ml.RankTests.kruskalWallis]] and the k-group extension of
    * [[welchT]]'s moment discipline: per-group n, DECIMAL-exact Σx and
    * Σx²; SSW_g = q_g − s_g²/n_g and SSB_g = n_g(m_g − m̄)² are fixed
    * IEEE trees per group, summed by the ORDERED cumulative window
    * over the k-row group table (pinned cross-group addition order —
    * the bounded-window discipline; grand N and Σx stay exact
    * DECIMAL). Groups with n_g = 0 cannot occur (groupBy). Degenerate
    * boards (k < 2 or N ≤ k or SSW = 0) emit NULL f. Output 1 row:
    * (n, k, ssb, ssw, f_stat, eta2). */
  def oneWayAnova(df: DataFrame, group: Column, value: Column)
      : DataFrame = {
    // guard the grid cast: a caller can hand a wider value (e.g.
    // brownForsythe's DECIMAL(19,6) |x − median|); a silent NULL here
    // would inflate n_g against the moment sums while DuckDB errors —
    // fail loud instead (the friedman discipline)
    val xd = value.cast("decimal(18,6)")
    val x = when(xd.isNull,
      raise_error(lit("oneWayAnova: value outside the DECIMAL(18,6) " +
        "grid — rescale first"))).otherwise(xd)
    val perGroup = df.filter(value.isNotNull)
      .groupBy(group.as("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(x).as("__s"),
        sum(x * x).as("__q"))
    val grand = perGroup.agg(
      sum(col("n_g")).as("__n"),
      sum(col("__s").cast("decimal(38,6)")).as("__ss"))
    val withM = perGroup.crossJoin(broadcast(grand))
    val nG = col("n_g").cast("double")
    val sG = col("__s").cast("double")
    val qG = col("__q").cast("double")
    val mAll = col("__ss").cast("double") / col("__n").cast("double")
    val mG = sG / nG
    val sswG = qG - sG * sG / nG
    val ssbG = nG * (mG - mAll) * (mG - mAll)
    val wG = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = withM
      .withColumn("__cw", sum(sswG).over(wG))
      .withColumn("__cb", sum(ssbG).over(wG))
      .groupBy()
      .agg(first(col("__n")).as("n"), count(lit(1)).as("k"),
        max_by(col("__cw"), col("g")).as("__ssw"),
        max_by(col("__cb"), col("g")).as("__ssb"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val f = (col("__ssb") / (kD - lit(1.0))) /
      (col("__ssw") / (nD - kD))
    // ssb/ssw stay RAW doubles: they are identical fixed IEEE trees in
    // both engines (no round builtins involved), and their magnitude
    // (~N·var) overflows any fixed quantizer scale at data size
    import graft.functions.q6
    agg.select(col("n"), col("k"),
      col("__ssb").as("ssb"), col("__ssw").as("ssw"),
      q6(when(col("k") > 1 && col("n") > col("k") && col("__ssw") > 0,
        f)).as("f_stat"),
      q6(when(col("__ssb") + col("__ssw") > 0,
        col("__ssb") / (col("__ssb") + col("__ssw")))).as("eta2"))
  }

  /** D28: BROWN–FORSYTHE / LEVENE VARIANCE-HOMOGENEITY TEST (Levene
    * 1960; Brown & Forsythe 1974 median-centering — public knowledge):
    * are the group SPREADS equal? The pre-flight every pooled-variance
    * test above ([[oneWayAnova]] F53, the classic t) silently assumes,
    * and a drift dial in its own right — a segment whose variance
    * exploded PSI/KS on the mean can miss. This is the median-centered
    * (robust) form: one-way ANOVA on `z = |x − median_g|`; the
    * spread-equality W statistic IS [[oneWayAnova]]'s F over z, so the
    * kernel is REUSED verbatim (one new shuffle pair: the per-group
    * distinct-value grid for the median, the join-back for z).
    *
    * Exactness: medians resolve on the DECIMAL(18,6) grid — the LOWER
    * median (smallest v with 2·cum ≥ n; a midpoint average would leave
    * the decimal grid), documented and mirrored by the oracle; z stays
    * exact DECIMAL, so the ANOVA moments inherit F53's exact-moment
    * discipline unchanged. Windows are value-cardinality-bounded per
    * group. Output 1 row: (n, k, ssb, ssw, w_stat) — w_stat NULL when
    * every |deviation| ties (ssw = 0). */
  def brownForsythe(df: DataFrame, group: Column, value: Column)
      : DataFrame = {
    val vals = df.filter(value.isNotNull)
      .select(group.as("__g"), value.cast("decimal(18,6)").as("__v"))
    // TWO-PHASE exact lower median. The direct form — one cumulative
    // window `partitionBy(__g).orderBy(__v)` over the whole distinct-
    // value grid — puts each group's entire grid on ONE task (k ≈ 3
    // return-flag groups ⇒ three giant single-task sorts; at any scale
    // it is one task per group — the single-giant-key skew shape).
    // Instead: (1) equi-width-bucket the grid on the value axis and
    // accumulate the tiny (≤ nBuckets rows/group) per-bucket counts to
    // locate the bucket holding the lower median; (2) resolve the exact
    // value inside that one bucket only (~1/nBuckets of the grid).
    // Bucketing is monotone non-decreasing in __v (order-preserving
    // decimal→double, subtract/scale by per-group constants, floor,
    // clamp), so the global cumulative count decomposes EXACTLY as
    // bucket-offset + within-bucket cumulative: the selected value —
    // smallest v with 2·cum(v) ≥ n — is unchanged bit-for-bit, and the
    // oracle keeps mirroring the one-window formulation.
    // One big exchange total: rows repartition by (__g, __b) ONCE, and
    // that single clustering carries the (__g,__b,__v) count aggregate,
    // the within-bucket cumulative window AND the per-bucket-total
    // aggregate (HashPartitioning(g,b) satisfies all three); only the
    // bucket-level table (≤ k·nBuckets rows) is shuffled again for the
    // cross-bucket offsets. Earlier drafts that located the median
    // bucket via a separate grid + per-bucket aggregates measured
    // SLOWER at sf0.1 (31 AQE stage-jobs vs the old 8): the fix must
    // not fan one window into a fleet of exchanges.
    val nBuckets = 4096
    val stats = vals.groupBy(col("__g"))
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val spanD = (col("__mx") - col("__mn")).cast("double")
    val cells = vals.join(broadcast(stats), Seq("__g"))
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(
            floor((col("__v") - col("__mn")).cast("double") / spanD *
              lit(nBuckets.toDouble)).cast("int"),
            lit(nBuckets - 1))))
      .select(col("__g"), col("__b"), col("__v"))
      .repartition(col("__g"), col("__b"))
      .groupBy(col("__g"), col("__b"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cumIn", sum(col("__c")).over(
        Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // bucket totals → cross-bucket offsets and per-group n: one window
    // pair over the ≤ nBuckets-row-per-group bucket table (bounded)
    val wOffB = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = cells.groupBy(col("__g"), col("__b"))
      .agg(max(col("__cumIn")).as("__bt"))
      .withColumn("__cumB", sum(col("__bt")).over(wOffB))
      .withColumn("__n", sum(col("__bt")).over(
        Window.partitionBy(col("__g"))))
      .select(col("__g"), col("__b"),
        (col("__cumB") - col("__bt")).as("__off"), col("__n"))
    // global cum(v) = smaller-bucket offset + within-bucket cumulative
    // (bucketing is monotone, so every smaller bucket holds only
    // smaller values); the partial-aggregated min per group resolves
    // "smallest v crossing n/2" without moving the filtered rows
    val med = cells.join(broadcast(offs), Seq("__g", "__b"))
      .filter((col("__off") + col("__cumIn")) * lit(2) >= col("__n"))
      .groupBy(col("__g")).agg(min(col("__v")).as("__med"))
    val z = vals.join(med, Seq("__g"))
      .select(col("__g").as("g"), abs(col("__v") - col("__med")).as("__z"))
    oneWayAnova(z, col("g"), col("__z"))
      .withColumnRenamed("f_stat", "w_stat")
      .drop("eta2")
  }

  /** F54: COCHRAN–MANTEL–HAENSZEL stratified 2×2 test (Cochran 1954,
    * Mantel & Haenszel 1959, public knowledge) — the answer to
    * Simpson's paradox in A/B readouts: pool evidence ACROSS strata
    * (segment, country, device) without pooling the COUNTS. Per
    * stratum i with arm sizes n0/n1 and conversions c0/c1:
    * `E_i = n1·m1/N`, `V_i = n1·n0·m1·(N−m1)/(N²(N−1))` with
    * `m1 = c0+c1`, `N = n0+n1`; `χ² = (Σc1 − ΣE)²/ΣV` (no continuity
    * correction), z its signed root, two-sided p via the A&S 26.2.17
    * polynomial; plus the Mantel–Haenszel pooled odds ratio
    * `Σ(a·d/N)/Σ(b·c/N)`.
    *
    * One groupBy to per-stratum counts; the four cross-stratum Σ of
    * per-stratum doubles run as ORDERED cumulative windows over the
    * strata table (pinned addition order; bounded — one row per
    * stratum). Strata with an empty arm or N < 2 contribute nothing
    * (standard). Output 1 row: (n_strata, o1, e1, v, chi2, z, p,
    * or_mh). */
  def cmhTest(units: DataFrame, strataCols: Seq[String],
      variant: Column, converted: Column): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    cmhFromCounts(units.groupBy(strataCols.map(col): _*)
      .agg(
        sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(variant === 0, converted.cast("long")).otherwise(0L))
          .as("c0"),
        sum(when(variant === 1, converted.cast("long")).otherwise(0L))
          .as("c1")), strataCols)
  }

  /** The [[cmhTest]] statistic over an already-counted per-stratum
    * (n0, n1, c0, c1) table — exact mergeable counters, so the
    * streaming monitor sums per-batch stratum tables and publishes the
    * identical pooled test. The degeneracy filter runs HERE: a stratum
    * that becomes testable only after batches merge is admitted
    * exactly when the batch operator would admit it. */
  def cmhFromCounts(counts0: DataFrame, strataCols: Seq[String])
      : DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val counts = counts0
      .filter(col("n0") > 0 && col("n1") > 0 &&
        col("n0") + col("n1") > 1)
    val n0 = col("n0").cast("double")
    val n1 = col("n1").cast("double")
    val nn = (col("n0") + col("n1")).cast("double")
    val m1 = (col("c0") + col("c1")).cast("double")
    val e = n1 * m1 / nn
    val v = n1 * n0 * m1 * (nn - m1) / (nn * nn * (nn - lit(1.0)))
    val ad = col("c1").cast("double") *
      (col("n0") - col("c0")).cast("double") / nn
    val bc = (col("n1") - col("c1")).cast("double") *
      col("c0").cast("double") / nn
    val wS = Window.orderBy(strataCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = counts
      .withColumn("__ce", sum(e).over(wS))
      .withColumn("__cv", sum(v).over(wS))
      .withColumn("__cad", sum(ad).over(wS))
      .withColumn("__cbc", sum(bc).over(wS))
      .withColumn("__rn", row_number().over(
        Window.orderBy(strataCols.map(col): _*)))
      .groupBy()
      .agg(count(lit(1)).as("n_strata"),
        coalesce(sum(col("c1")), lit(0L)).as("o1"),
        max_by(col("__ce"), col("__rn")).as("__e"),
        max_by(col("__cv"), col("__rn")).as("__v"),
        max_by(col("__cad"), col("__rn")).as("__ad"),
        max_by(col("__cbc"), col("__rn")).as("__bc"))
    val z = (col("o1").cast("double") - col("__e")) / sqrt(col("__v"))
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val ok = col("__v") > 0
    import graft.functions.q6
    agg.select(col("n_strata"), col("o1"),
      q6(col("__e")).as("e1"), q6(col("__v")).as("v"),
      q6(when(ok, z * z)).as("chi2"),
      q6(when(ok, z)).as("z"),
      q6(when(ok, least(pTwo, lit(1.0)))).as("p"),
      q6(when(col("__bc") > 0, col("__ad") / col("__bc"))).as("or_mh"))
  }

  /** F86: COCHRAN–ARMITAGE TREND TEST (Cochran 1954, Armitage 1955 —
    * public knowledge) — is a BINARY rate monotone in an ORDERED
    * exposure level? The dose-response readout between [[cmhTest]]'s
    * paired arms and [[graft.ml.RankTests.jonckheereTerpstra]]'s
    * ordered-group values: k exposure levels (discount tier, ramp
    * percentage, bucketed tenure), one conversion flag; χ²(k−1) sees
    * ANY difference — CA spends its single dof on the TREND, the
    * hypothesis a ramp actually ships.
    *
    * With scores w_i = the declared levels, counts (n_i, c_i):
    * `Z = A / √(C·(N−C)·B/N)` with `A = N·Σw_i·c_i − C·Σw_i·n_i` and
    * `B = N·Σw_i²·n_i − (Σw_i·n_i)²` — A and B EXACT integers in
    * DECIMAL(38,0) (order-free sums over the k-row count table), the
    * denominator one fixed IEEE tree over exactly-cast integers, p
    * two-sided via the A&S 26.2.17 polynomial. Levels are DECLARED
    * (the jonckheereTerpstra discipline): an undeclared or non-integer
    * dose fails loud; a declared level with no rows contributes zero
    * terms (standard). Degenerate boards (C = 0, C = N, or B = 0 —
    * all mass on one level) emit NULL z/p.
    *
    * Scale: ONE groupBy to k rows, then k-row arithmetic. Output
    * 1 row: (n, converted, k, z, p) — z > 0 ⇔ rate rises with the
    * level. */
  def cochranArmitage(units: DataFrame, dose: Column,
      converted: Column, doses: Seq[Long]): DataFrame =
    cochranArmitageFromCounts(
      cochranArmitageGuardedCounts(units, dose, converted, doses))

  /** The [[cochranArmitage]] guard front: declared-integer dose levels
    * and an EXACTLY-0/1 outcome (a fractional outcome must not
    * truncate into the gate — `0.9.cast(long)` is 0), both fail loud;
    * one groupBy to the per-level (__g, n, c) counts. Shared verbatim
    * with the streaming sink (the friedmanGuardedCells discipline). */
  private[graft] def cochranArmitageGuardedCounts(units: DataFrame,
      dose: Column, converted: Column, doses: Seq[Long]): DataFrame = {
    require(doses.size >= 2 && doses == doses.sorted &&
      doses.distinct == doses,
      s"cochranArmitage: need >= 2 sorted distinct dose levels, " +
        s"got $doses")
    val dLong = dose.cast("long")
    val y = converted.cast("long")
    units
      .select(
        when(dose.isNull || converted.isNull,
          raise_error(lit("cochranArmitage: NULL dose/converted")))
          .when(dLong.isNull ||
            dLong.cast("double") =!= dose.cast("double") ||
            !dLong.isin(doses: _*),
            raise_error(lit("cochranArmitage: dose level is not one " +
              s"of the declared integer levels $doses")))
          .otherwise(dLong).as("__g"),
        when(y.isNull ||
          y.cast("double") =!= converted.cast("double") ||
          (y =!= 0L && y =!= 1L),
          raise_error(lit("cochranArmitage: converted must be " +
            "exactly 0/1")))
          .otherwise(y).as("__y"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("c"))
  }

  /** The [[cochranArmitage]] statistic over an already-counted
    * per-level (__g, n, c) table — exact mergeable counters (the
    * cmhFromCounts pattern), so a streaming level-count store
    * publishes the identical trend test. */
  private[graft] def cochranArmitageFromCounts(counts: DataFrame)
      : DataFrame = {
    val D = "decimal(38,0)"
    val w = col("__g").cast(D)
    val agg = counts.agg(
      count(lit(1)).as("k"),
      coalesce(sum(col("n")), lit(0L)).as("n"),
      coalesce(sum(col("c")), lit(0L)).as("converted"),
      coalesce(sum(w * col("c").cast(D)), lit(0).cast(D)).as("__swc"),
      coalesce(sum(w * col("n").cast(D)), lit(0).cast(D)).as("__swn"),
      coalesce(sum(w * w * col("n").cast(D)), lit(0).cast(D))
        .as("__sw2n"))
    val nD = col("n").cast(D)
    val cD = col("converted").cast(D)
    val a = nD * col("__swc") - cD * col("__swn")
    val b = nD * col("__sw2n") - col("__swn") * col("__swn")
    // C·(N−C)·B can pass 38 digits at data scale — the denominator is
    // one fixed IEEE tree over the exactly-cast integers instead
    val z = a.cast("double") /
      sqrt(cD.cast("double") * (nD - cD).cast("double") *
        b.cast("double") / col("n").cast("double"))
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val ok = col("converted") > 0 && col("converted") < col("n") &&
      b > 0
    import graft.functions.q6
    agg.select(col("n"), col("converted"), col("k"),
      q6(when(ok, z)).as("z"),
      q6(when(ok, least(pTwo, lit(1.0)))).as("p"))
  }

  /** F62: PAIRED t-TEST (Student 1908, public knowledge) — same units
    * measured before/after: test the mean of the per-unit DIFFERENCES,
    * which cancels the between-unit variance that drowns an unpaired
    * [[welchT]] on the same data. One pass over exact DECIMAL moments
    * of d = after − before; `t = d̄/(s_d/√n)`, dof = n−1, two-sided p
    * via the A&S 26.2.17 polynomial (normal approximation — exact-t
    * quantiles need the incomplete beta; at the row counts this engine
    * targets the two are indistinguishable). Rows with either side
    * NULL are excluded (they are not pairs). Output 1 row:
    * (n, mean_diff, sd_diff, t, dof, p). */
  def pairedT(units: DataFrame, before: Column, after: Column)
      : DataFrame = {
    // the difference re-narrows to (18,6) before squaring so the
    // square stays at f42's exact (37,12) instead of precision-39
    // scale truncation
    val d = (after.cast("decimal(18,6)") - before.cast("decimal(18,6)"))
      .cast("decimal(18,6)")
    val agg = units.filter(before.isNotNull && after.isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(d), lit(java.math.BigDecimal.ZERO)
          .cast("decimal(18,6)")).as("__s"),
        coalesce(sum(d * d),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,12)"))
          .as("__q"))
    val n = col("n").cast("double")
    val sm = col("__s").cast("double")
    val q = col("__q").cast("double")
    val mean = sm / n
    val variance = (q - sm * sm / n) / (n - lit(1.0))
    val t = mean / sqrt(variance / n)
    val az = abs(t)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val ok = col("n") > 1 && variance > 0
    import graft.functions.q6
    agg.select(col("n"),
      q6(when(col("n") > 0, mean)).as("mean_diff"),
      q6(when(ok, sqrt(variance))).as("sd_diff"),
      q6(when(ok, t)).as("t"),
      (col("n") - lit(1L)).as("dof"),
      q6(when(ok, least(pTwo, lit(1.0)))).as("p"))
  }

  /** F61: WILSON SCORE INTERVAL per segment (Wilson 1927, public
    * knowledge) — the binomial CI that behaves at small n and extreme
    * rates, where the Wald interval collapses to zero width at
    * p̂ ∈ {0, 1} and escapes [0, 1]:
    * `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)`.
    * The z constant is a folded Φ⁻¹ literal (no in-engine inverse
    * CDF). One exact count pass; fixed IEEE trees; empty segments
    * emit NULL bounds. Output per segment: (…, n, c, rate, ci_lo,
    * ci_hi). */
  def wilsonCi(units: DataFrame, groupCols: Seq[String],
      converted: Column, z: Double = 1.9599639845400545): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val counts = units.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(converted.cast("long")), lit(0L)).as("c"))
    val n = col("n").cast("double")
    val p = col("c").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n))
    val ok = col("n") > 0
    import graft.functions.q6
    counts.select(groupCols.map(col) ++ Seq(
      col("n"), col("c"),
      q6(when(ok, p)).as("rate"),
      q6(when(ok, (center - margin) / denom)).as("ci_lo"),
      q6(when(ok, (center + margin) / denom)).as("ci_hi")): _*)
  }

  /** F59: TOST EQUIVALENCE TEST (two one-sided tests — Schuirmann
    * 1987, public knowledge): "is the new variant EQUIVALENT to
    * control within ±δ?" A non-significant difference test is NOT
    * evidence of equivalence (absence of evidence); TOST inverts the
    * burden: reject non-equivalence only if the effect is
    * significantly above −δ AND significantly below +δ.
    * `z_lo = (Δ+δ)/se`, `z_hi = (δ−Δ)/se`, each tested one-sided;
    * `p_equiv = max(p_lo, p_hi)`; equivalent ⟺ p_equiv < α.
    *
    * Built on [[welchT]]'s exact DECIMAL moment pass; the one-sided
    * normal p uses the A&S 26.2.17 upper-tail polynomial, reflected
    * for negative z (the polynomial itself is valid for z ≥ 0 only).
    * Output 1 row: (n0, n1, mean0, mean1, diff, se, z_lower, z_upper,
    * p_lower, p_upper, p_equiv, equivalent). */
  def tostEquivalence(units: DataFrame, variant: Column, value: Column,
      delta: Double, alphaPct: Int = 5): DataFrame = {
    require(delta > 0, s"delta must be > 0, got $delta")
    require(alphaPct >= 1 && alphaPct < 50,
      s"alphaPct must be in [1, 50), got $alphaPct")
    val x = value.cast("decimal(18,6)")
    val agg = units.agg(
      sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(variant === 0, x)).as("__s0"),
      sum(when(variant === 1, x)).as("__s1"),
      sum(when(variant === 0, x * x)).as("__q0"),
      sum(when(variant === 1, x * x)).as("__q1"))
    def stats(i: Int) = {
      val n = col(s"n$i").cast("double")
      val sm = col(s"__s$i").cast("double")
      val q = col(s"__q$i").cast("double")
      (when(col(s"n$i") > 0, sm / n),
        when(col(s"n$i") > 1, (q - sm * sm / n) / (n - lit(1.0))))
    }
    val (m0, v0) = stats(0)
    val (m1, v1) = stats(1)
    val se2 = v1 / col("n1").cast("double") + v0 / col("n0").cast("double")
    val se = sqrt(se2)
    val diff = m1 - m0
    val zLo = (diff + lit(delta)) / se
    val zHi = (lit(delta) - diff) / se
    // A&S 26.2.17 upper tail Q(z) for z >= 0; Q(z) = 1 - Q(-z) below
    def qTail(z: Column): Column = {
      val az = abs(z)
      val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
      val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
        lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
        lit(0.319381530)) * tt
      val q = (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) *
        poly
      when(z >= 0, q).otherwise(lit(1.0) - q)
    }
    // one-sided p of each boundary test: large positive z -> small p
    val pLo = qTail(zLo)
    val pHi = qTail(zHi)
    val pEq = greatest(pLo, pHi)
    val ok = col("n0") > 1 && col("n1") > 1 && se2 > 0
    import graft.functions.q6
    agg.select(col("n0"), col("n1"),
      q6(m0).as("mean0"), q6(m1).as("mean1"),
      q6(diff).as("diff"), q6(when(ok, se)).as("se"),
      q6(when(ok, zLo)).as("z_lower"), q6(when(ok, zHi)).as("z_upper"),
      q6(when(ok, pLo)).as("p_lower"), q6(when(ok, pHi)).as("p_upper"),
      q6(when(ok, pEq)).as("p_equiv"),
      when(ok, (pEq < lit(alphaPct / 100.0)).cast("int")).as("equivalent"))
  }

  /** F60: MINIMUM DETECTABLE EFFECT table per segment — the
    * experiment-design pre-flight ("this segment can only detect an
    * 8-point lift; don't promise 2"): with pooled rate p̄ and arm sizes
    * n₀/n₁, `MDE = (z_{α/2} + z_β)·√(p̄(1−p̄)(1/n₀+1/n₁))` — the
    * standard two-proportion power closed form (public knowledge), at
    * the conventional α = 0.05 two-sided / 80% power constants
    * (z = 1.9599639845400545, 0.8416212335729143 — Φ⁻¹ literals, so no
    * inverse-CDF evaluation happens in-engine). One exact count pass;
    * fixed IEEE trees. Degenerate segments (empty arm, 0%/100% pooled)
    * emit NULL. Output per segment: counts, pooled_rate, mde_abs,
    * mde_rel. */
  def mdeTable(units: DataFrame, groupCols: Seq[String],
      variant: Column, converted: Column,
      zAlpha: Double = 1.9599639845400545,
      zBeta: Double = 0.8416212335729143): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val counts = units.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
        coalesce(sum(converted.cast("long")), lit(0L)).as("c"))
    val n0 = col("n0").cast("double")
    val n1 = col("n1").cast("double")
    val p = col("c").cast("double") / (col("n0") + col("n1")).cast("double")
    val mde = lit(zAlpha + zBeta) *
      sqrt(p * (lit(1.0) - p) * (lit(1.0) / n0 + lit(1.0) / n1))
    val ok = col("n0") > 0 && col("n1") > 0 && col("c") > 0 &&
      col("c") < col("n0") + col("n1")
    import graft.functions.q6
    counts.select(groupCols.map(col) ++ Seq(
      col("n0"), col("n1"), col("c"),
      q6(when(ok, p)).as("pooled_rate"),
      q6(when(ok, mde)).as("mde_abs"),
      q6(when(ok, mde / p)).as("mde_rel")): _*)
  }

  /** F56: COCHRAN–ARMITAGE TREND TEST (Cochran 1954, Armitage 1955,
    * public knowledge) — is a binary rate MONOTONE in an ordered dose
    * (plan tier, exposure bucket, priority)? A χ² over k groups answers
    * "any difference"; this 1-dof trend test answers the question a
    * dose-response readout actually asks, with more power. With
    * integer scores w_g: `T = Σ w(c_g − n_g·p̄)`,
    * `Var = p̄(1−p̄)·(Σw²n − (Σwn)²/N)`, `z = T/√Var`, A&S two-sided p.
    *
    * EVERYTHING before the final tree is exact integer arithmetic:
    * scores are required integers, so Σwn, Σw²n, Σwc are DECIMAL(38,0)
    * sums and T·N = N·Σwc − Σwn·Σc needs no division until the end —
    * no per-group rationals, no ordered cumulation needed at all.
    * Degenerate boards (0%/100% pooled, or zero score variance) emit
    * NULL z/p. Output 1 row: (n, k, t_stat, var_t, z, p). */
  def cochranArmitage(units: DataFrame, scoreCol: Column,
      converted: Column): DataFrame = {
    val D = "decimal(38,0)"
    val w = scoreCol.cast("long")
    val perGroup = units.filter(scoreCol.isNotNull)
      .groupBy(w.as("w"))
      .agg(count(lit(1)).as("n_g"),
        coalesce(sum(converted.cast("long")), lit(0L)).as("c_g"))
    val agg = perGroup.agg(
      sum(col("n_g")).as("n"), count(lit(1)).as("k"),
      coalesce(sum(col("c_g")), lit(0L)).as("c"),
      sum(col("w").cast(D) * col("n_g").cast(D)).as("__wn"),
      sum(col("w").cast(D) * col("w").cast(D) * col("n_g").cast(D))
        .as("__wwn"),
      sum(col("w").cast(D) * col("c_g").cast(D)).as("__wc"))
    val nD = col("n").cast("double")
    val cD = col("c").cast("double")
    val pBar = cD / nD
    val t = col("__wc").cast("double") - col("__wn").cast("double") * pBar
    val varT = pBar * (lit(1.0) - pBar) *
      (col("__wwn").cast("double") -
        col("__wn").cast("double") * col("__wn").cast("double") / nD)
    val z = t / sqrt(varT)
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val ok = col("c") > 0 && col("c") < col("n")
    import graft.functions.q6
    agg.select(col("n"), col("k"),
      q6(when(ok, t)).as("t_stat"),
      q6(when(ok, varT)).as("var_t"),
      q6(when(ok && varT > 0, z)).as("z"),
      q6(when(ok && varT > 0, least(pTwo, lit(1.0)))).as("p"))
  }

  /** F57: EMPIRICAL-BAYES RATE SHRINKAGE (beta-binomial method of
    * moments — Robbins 1956, Efron & Morris 1975, public knowledge):
    * per-group conversion rates with small n are noise ("this user
    * converted 1/1 = 100%"); shrink toward the population with a
    * Beta(α, β) prior FITTED FROM THE GROUPS THEMSELVES:
    * `α+β = m(1−m)/v − 1` from the across-group mean m and variance v
    * of the raw rates, `shrunk = (c + α)/(n + α + β)`.
    *
    * Scale discipline: groups are UNBOUNDED (users, pages), so the
    * across-group rate moments cannot be a double Σ (order-drift) or an
    * ordered window (unbounded). Each rate is quantized to a scaled-1e9
    * LONG; Σ and Σ² run as exact DECIMAL(38,0) sums — order-free at any
    * group count. The fitted prior is a broadcast 1-row join back; the
    * data relation shuffles once (the groupBy). Degenerate boards
    * (v = 0, or v ≥ m(1−m) — overdispersion beyond beta-binomial —
    * where the MoM prior is undefined/negative) emit the RAW rate with
    * NULL alpha/beta rather than a corrupt shrink. Output per group:
    * (g, n, c, rate, alpha, beta, shrunk_rate). */
  def ebShrinkRates(units: DataFrame, groupCol: Column,
      converted: Column): DataFrame = {
    val D = "decimal(38,0)"
    val perGroup = units.groupBy(groupCol.as("g"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(converted.cast("long")), lit(0L)).as("c"))
    val rate = col("c").cast("double") / col("n").cast("double")
    val rl = floor(rate * lit(1e9) + lit(0.5)).cast("long")
    val scaled = perGroup.withColumn("__rl", rl)
    val prior = scaled.agg(
      count(lit(1)).as("__k"),
      sum(col("__rl").cast(D)).as("__s"),
      sum(col("__rl").cast(D) * col("__rl").cast(D)).as("__q"))
    val kD = col("__k").cast("double")
    val m = col("__s").cast("double") / lit(1e9) / kD
    val v = (col("__q").cast("double") / lit(1e18) -
      (col("__s").cast("double") / lit(1e9)) *
        (col("__s").cast("double") / lit(1e9)) / kD) / kD
    val ab = m * (lit(1.0) - m) / v - lit(1.0)
    val okP = col("__k") > 1 && v > 0 && ab > 0
    val priorRow = prior.select(
      when(okP, m * ab).as("__alpha"),
      when(okP, (lit(1.0) - m) * ab).as("__beta"))
    import graft.functions.q6
    scaled.crossJoin(broadcast(priorRow))
      .select(col("g"), col("n"), col("c"),
        q6(rate).as("rate"),
        q6(col("__alpha")).as("alpha"),
        q6(col("__beta")).as("beta"),
        q6(when(col("__alpha").isNotNull,
          (col("c").cast("double") + col("__alpha")) /
            (col("n").cast("double") + col("__alpha") + col("__beta")))
          .otherwise(rate)).as("shrunk_rate"))
  }

  /** F52: mSPRT ALWAYS-VALID p-VALUE for a two-proportion metric
    * (mixture sequential probability ratio test — Robbins 1970,
    * Johari, Pekelis & Walsh 2017, public knowledge). A fixed-n z-test
    * read daily is a peeking machine; the mSPRT p is valid at EVERY
    * interim look. Normal-mixture closed form over the effect estimate
    * `Δ = p₁ − p₀` with sampling variance `V = p̂(1−p̂)(1/n₀+1/n₁)`:
    * `Λ = √(V/(V+τ²)) · exp(Δ²τ²/(2V(V+τ²)))`, `p = min(1, 1/Λ)`,
    * with mixture width τ² a fixed design parameter.
    *
    * One map-side-combined groupBy to (n₀,n₁,c₀,c₁) per segment; the
    * statistic is a fixed IEEE tree over the exact counts
    * ([[msprtFromCounts]] — counters are mergeable, so the streaming
    * monitor publishes the identical always-valid p per batch).
    * Degenerate segments (an empty arm or 0%/100% pooled rate) emit
    * NULL. Output per segment: counts, delta, v, lambda, p_av. */
  def msprt(units: DataFrame, groupCols: Seq[String], variant: Column,
      converted: Column, tau2: Double = 1e-4): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    msprtFromCounts(units.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(variant === 0, converted.cast("long")).otherwise(0L))
          .as("c0"),
        sum(when(variant === 1, converted.cast("long")).otherwise(0L))
          .as("c1")), groupCols, tau2)
  }

  /** The [[msprt]] statistic over an already-counted per-group
    * (n0, n1, c0, c1) table — exact mergeable counters. */
  def msprtFromCounts(counts: DataFrame, groupCols: Seq[String],
      tau2: Double = 1e-4): DataFrame = {
    require(tau2 > 0, s"tau2 must be > 0, got $tau2")
    val n0 = col("n0").cast("double")
    val n1 = col("n1").cast("double")
    val p0 = col("c0").cast("double") / n0
    val p1 = col("c1").cast("double") / n1
    val pp = (col("c0") + col("c1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    val v = pp * (lit(1.0) - pp) * (lit(1.0) / n0 + lit(1.0) / n1)
    val delta = p1 - p0
    val lam = sqrt(v / (v + lit(tau2))) *
      exp(delta * delta * lit(tau2) /
        (lit(2.0) * v * (v + lit(tau2))))
    val ok = col("n0") > 0 && col("n1") > 0 &&
      col("c0") + col("c1") > 0 &&
      col("c0") + col("c1") < col("n0") + col("n1")
    import graft.functions.q6
    counts.select(groupCols.map(col) ++ Seq(
      col("n0"), col("n1"), col("c0"), col("c1"),
      q6(when(ok, delta)).as("delta"),
      graft.functions.quantize(when(ok, v), 9).as("v"),
      q6(when(ok, lam)).as("lambda"),
      q6(when(ok, least(lit(1.0) / lam, lit(1.0)))).as("p_av")): _*)
  }

  /** F38: BENJAMINI–HOCHBERG FDR CONTROL over MANY simultaneous A/B
    * tests (Benjamini & Hochberg 1995) — the metric-dashboard reality:
    * hundreds of (segment, metric) z-tests at once, where per-test
    * α = 0.05 would flag 5% of nulls. Per group: the [[abTest]]
    * two-proportion z, its two-sided p-value via the Abramowitz–Stegun
    * 26.2.17 normal-CDF polynomial (max abs error 7.5e-8 — far inside
    * any decision margin at these scales), and the BH step-up: rank
    * p ascending, k* = max{i : p(i) ≤ i·q/m}, reject ranks ≤ k*.
    *
    * Determinism: p-values quantize to scaled-1e12 LONGs; ranks come
    * from the two-phase [[graft.relational.Ranks.globalRank]] under
    * the total order (p_scaled, group) — no global-order window; the
    * step-up inequality `p·m·qDen ≤ i·qNum·1e12` is EXACT DECIMAL(38,0)
    * integer arithmetic (a float compare at the boundary would flip
    * between engines; LONG products overflow past ~1e6 groups).
    * Degenerate groups (empty arm, 0%/100% pooled rate — no sampling
    * variance) are EXCLUDED from the table and from m, by exact
    * integer conditions.
    *
    * 100 TB: one map-side-combined groupBy over the data; everything
    * after runs on the GROUPS table (two-phase rank shuffles only it;
    * k* is a broadcast 1-row aggregate). Output per kept group:
    * counts, z, p, rank, m, bh_cutoff_rank, significant. */
  def bhFdr(units: DataFrame, groupCols: Seq[String], variant: Column,
      converted: Column, qNum: Int = 1, qDen: Int = 20): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    bhFdrFromCounts(mtpCounts(units, groupCols, variant, converted),
      groupCols, qNum, qDen)
  }

  /** The [[bhFdr]] step-up over an already-counted per-group
    * (n0, n1, c0, c1) table. The four counters are exact and mergeable
    * — the streaming monitor sums per-batch group tables and publishes
    * the identical FDR decision. The degeneracy filter runs here, so
    * a group that becomes testable only after several batches merge is
    * admitted exactly when the batch operator would admit it. */
  def bhFdrFromCounts(counts0: DataFrame, groupCols: Seq[String],
      qNum: Int = 1, qDen: Int = 20): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qNum >= 1 && qDen > qNum,
      s"need 0 < qNum/qDen < 1, got $qNum/$qDen")
    val (ranked, m) = pRankedTests(counts0, groupCols)
    val lhs = col("__pl").cast("decimal(38,0)") * lit(m) * lit(qDen)
    val rhs = col("rank").cast("decimal(38,0)") * lit(qNum) *
      lit(1000000000000L)
    val kStar = ranked
      .agg(coalesce(max(when(lhs <= rhs, col("rank"))), lit(0L))
        .as("__kstar"))
    mtpPublish(ranked, kStar, m, groupCols, "bh_cutoff_rank")
  }

  /** Shared front of the multiple-testing family (F38 BH step-up,
    * F84 Holm step-down, F85 Benjamini–Yekutieli): the per-group
    * two-proportion z, the exact 1e12-scaled p (A&S 26.2.17), the
    * degeneracy filter, and the global two-phase (p, group) rank.
    * One body so the three procedures are decided over IDENTICAL
    * p-values. */
  private def pRankedTests(counts0: DataFrame, groupCols: Seq[String])
      : (DataFrame, Long) = {
    val counts = counts0
      .filter(col("n0") > 0 && col("n1") > 0 &&
        col("c0") + col("c1") > 0 &&
        col("c0") + col("c1") < col("n0") + col("n1"))
    val p0 = col("c0") / col("n0")
    val p1 = col("c1") / col("n1")
    val pp = (col("c0") + col("c1")) / (col("n0") + col("n1"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val z = (p1 - p0) / se
    val az = abs(col("__z"))
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val scored = counts
      .withColumn("__z", z)
      .withColumn("__pl", floor(pTwo * lit(1e12) + lit(0.5)).cast("long"))
    graft.relational.Ranks.globalRankAndCount(scored,
      col("__pl") +: groupCols.map(col), "rank")
  }

  /** The shared publish tail of the family — counts, z, p, rank, m,
    * the procedure's cutoff rank under `cutoffName`, significant. */
  private def mtpPublish(ranked: DataFrame, kStar: DataFrame, m: Long,
      groupCols: Seq[String], cutoffName: String): DataFrame =
    ranked.crossJoin(broadcast(kStar))
      .select(groupCols.map(col) ++ Seq(
        col("n0"), col("n1"), col("c0"), col("c1"),
        graft.functions.q6(col("__z")).as("z"),
        (col("__pl").cast("double") / lit(1e12)).as("p"),
        col("rank"), lit(m).as("m"),
        col("__kstar").as(cutoffName),
        (col("rank") <= col("__kstar")).cast("int").as("significant")): _*)

  /** F84: HOLM–BONFERRONI STEP-DOWN (Holm 1979, public knowledge) —
    * the FWER member of the multiple-testing family: [[bhFdr]] bounds
    * the FALSE-DISCOVERY RATE (some false positives tolerated, more
    * power), Holm bounds the probability of ANY false positive — the
    * right control when a single wrong "segment regressed" page fires
    * a rollback. Uniformly more powerful than plain Bonferroni at the
    * same guarantee, with no independence assumption at all.
    *
    * Step-down on the shared ranked-p table: reject ranks 1..k* where
    * k* + 1 is the FIRST rank failing `p·(m−r+1) ≤ α` — the compare
    * runs on exact integers (`p_l·(m−r+1)·αDen > αNum·10¹²` in
    * DECIMAL), so no float boundary can flip a verdict cross-engine.
    * Output per kept group: counts, z, p, rank, m, holm_cutoff_rank,
    * significant. */
  def holmBonferroni(units: DataFrame, groupCols: Seq[String],
      variant: Column, converted: Column, alphaNum: Int = 1,
      alphaDen: Int = 20): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    holmFromCounts(mtpCounts(units, groupCols, variant, converted),
      groupCols, alphaNum, alphaDen)
  }

  /** [[holmBonferroni]] over an already-counted (n0, n1, c0, c1)
    * table — mergeable cells, the bhFdrFromCounts contract. */
  def holmFromCounts(counts0: DataFrame, groupCols: Seq[String],
      alphaNum: Int = 1, alphaDen: Int = 20): DataFrame = {
    require(alphaNum >= 1 && alphaDen > alphaNum,
      s"need 0 < alphaNum/alphaDen < 1, got $alphaNum/$alphaDen")
    val D = "decimal(38,0)"
    val (ranked, m) = pRankedTests(counts0, groupCols)
    val lhs = col("__pl").cast(D) *
      (lit(m) - col("rank") + lit(1L)).cast(D) * lit(alphaDen)
    val rhs = lit(alphaNum).cast(D) * lit(1000000000000L).cast(D)
    val kStar = ranked
      .agg(coalesce(min(when(lhs > rhs, col("rank"))) - lit(1L),
        lit(m)).as("__kstar"))
    mtpPublish(ranked, kStar, m, groupCols, "holm_cutoff_rank")
  }

  /** F85: BENJAMINI–YEKUTIELI FDR (Benjamini & Yekutieli 2001, public
    * knowledge) — [[bhFdr]]'s guarantee holds under independence or
    * positive dependence; overlapping segments (country × device grids
    * share users) violate both. BY divides the BH line by the harmonic
    * factor c(m) = Σ 1/i and controls FDR under ARBITRARY dependence —
    * the conservative fallback when the grid is correlated.
    *
    * c(m) is summed ascending-rank on the driver (m is the test count
    * the shared rank already returns; the oracle reproduces the SAME
    * IEEE double with an ordered SQL aggregate over the ranks
    * themselves, 1/1 + 1/2 + … + 1/m). The cutoff compare keeps the
    * integer sides exact in DECIMAL and applies c(m) as one double
    * product per side. Output: counts, z, p, rank, m,
    * by_cutoff_rank, significant. */
  def byFdr(units: DataFrame, groupCols: Seq[String], variant: Column,
      converted: Column, qNum: Int = 1, qDen: Int = 20): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    byFdrFromCounts(mtpCounts(units, groupCols, variant, converted),
      groupCols, qNum, qDen)
  }

  /** [[byFdr]] over an already-counted (n0, n1, c0, c1) table. */
  def byFdrFromCounts(counts0: DataFrame, groupCols: Seq[String],
      qNum: Int = 1, qDen: Int = 20): DataFrame = {
    require(qNum >= 1 && qDen > qNum,
      s"need 0 < qNum/qDen < 1, got $qNum/$qDen")
    val D = "decimal(38,0)"
    val (ranked, m) = pRankedTests(counts0, groupCols)
    require(m <= 10000000L,
      s"byFdr: $m tests — the driver harmonic sum is bounded at 1e7")
    val cm = (1L to m).foldLeft(0.0)((a, i) => a + 1.0 / i)
    val lhs = (col("__pl").cast(D) * lit(m) * lit(qDen)).cast("double") *
      lit(cm)
    val rhs = (col("rank").cast(D) * lit(qNum) *
      lit(1000000000000L).cast(D)).cast("double")
    val kStar = ranked
      .agg(coalesce(max(when(lhs <= rhs, col("rank"))), lit(0L))
        .as("__kstar"))
    mtpPublish(ranked, kStar, m, groupCols, "by_cutoff_rank")
  }

  /** The shared (n0, n1, c0, c1) cell aggregate of the family. */
  private def mtpCounts(units: DataFrame, groupCols: Seq[String],
      variant: Column, converted: Column): DataFrame =
    units.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(variant === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(variant === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(variant === 0, converted.cast("long")).otherwise(0L))
          .as("c0"),
        sum(when(variant === 1, converted.cast("long")).otherwise(0L))
          .as("c1"))

  /** X117: GINI CONCENTRATION of a nonnegative integer weight — the
    * one-number corpus-skew report ("how unevenly are tokens spread
    * over domains / chars over documents"), the quantity mixture
    * designers look at before setting per-domain caps. Classic rank
    * formula `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over the ascending
    * (weight) order; tied weights occupy a fixed rank SET, so Σ i·xᵢ
    * is order-invariant and the statistic is deterministic without a
    * tiebreak column.
    *
    * Exactness + scale: weights aggregate per DISTINCT value, ranks
    * come from the two-phase prefix sum
    * ([[graft.relational.Ranks.prefixSums]] — no global-order window),
    * and the doubled rank-weight sum `Σ x·(2·c·cum_before + c·(c+1))`
    * is carried as DECIMAL(38,0) (exact far past BIGINT at 100 TB).
    * One correctly-rounded division at the end — bit-identical
    * cross-engine, no rounding. Negative weights fail loud. Output:
    * one row (n, total, gini); gini NULL when total = 0 or n < 2. */
  def giniConcentration(df: DataFrame, weightCol: Column): DataFrame = {
    val g = graft.util.Caches.persistTracked(
      df.select(weightCol.cast("long").as("__x"))
        .filter(col("__x").isNotNull)
        .groupBy(col("__x")).agg(count(lit(1)).as("__c")))
    require(g.filter(col("__x") < 0).limit(1).count() == 0L,
      "giniConcentration: negative weights are not a concentration")
    val ranked = graft.relational.Ranks.prefixSums(g, Seq(col("__x")),
      Seq("__cum" -> col("__c")))
    val agg = ranked.agg(
      sum(col("__c")).as("__n"),
      sum((col("__x") * col("__c")).cast("decimal(38,0)")).as("__t"),
      sum((col("__x") *
        (lit(2L) * col("__c") * (col("__cum") - col("__c")) +
          col("__c") * (col("__c") + lit(1L)))).cast("decimal(38,0)"))
        .as("__twos"))
    agg.select(col("__n").as("n"), col("__t").cast("long").as("total"),
      when(col("__t") > 0 && col("__n") >= 2,
        (col("__twos") - (col("__n") + lit(1L)) * col("__t"))
          .cast("double") /
          (col("__n").cast("double") * col("__t").cast("double")))
        .as("gini"))
  }

  /** X177: HBOS — HISTOGRAM-BASED OUTLIER SCORE (Goldstein &
    * Dengel 2012, public knowledge): per feature, an equal-width
    * histogram; a row's score is `Σ_f ln(n / count_f(bin_f(x)))` —
    * rows living in thin bins across several features score high. The
    * LINEAR-TIME multivariate screen between [[madOutliers]] (one
    * robust dimension) and [[graft.ann.Similarity.lofScores]]
    * (density-relative but pairwise-priced): HBOS assumes feature
    * independence and pays one aggregate + one broadcast join — the
    * only multivariate outlier shape that survives 100 TB unchanged.
    *
    * Engine parity: bin edges are pinned division trees over the
    * broadcast min/max; histogram counts exact; each feature term's
    * ln-argument is the exact rational n/count; terms floor-scale to
    * 1e9 LONGs and sum per row over the FIXED feature list (order
    * pinned by construction), published q6. NULL features fail loud
    * (a silent NULL would deflate the score of exactly the weird rows
    * the screen exists to catch). Degenerate features (min = max)
    * contribute ln(1) = 0 for every row. Output: one row per input
    * row — (id, hbos). */
  def hbosScores(df: DataFrame, idCol: String,
      features: Seq[(String, Column)], bins: Int = 10): DataFrame = {
    require(features.nonEmpty, "hbosScores: no features")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val fcols = features.map { case (n, c) =>
      when(c.isNull, raise_error(concat(
        lit(s"hbosScores: NULL feature '$n' at id "),
        col(idCol).cast("string"))))
        .otherwise(c.cast("double")).as(s"__f_$n")
    }
    val base = graft.util.Caches.persistTracked(
      df.select(col(idCol).as("__id") +: fcols: _*))
    val statAgg = Seq(count(lit(1)).as("__n")) ++ features.flatMap {
      case (n, _) => Seq(min(col(s"__f_$n")).as(s"__mn_$n"),
        max(col(s"__f_$n")).as(s"__mx_$n"))
    }
    val stats = base.agg(statAgg.head, statAgg.tail: _*)
    val nRows = stats.select(col("__n")).head().getLong(0)
    require(nRows > 0, "hbosScores: empty input")
    def binOf(n: String): org.apache.spark.sql.Column = {
      val step = (col(s"__mx_$n") - col(s"__mn_$n")) / bins
      when(step === 0, lit(0L)).otherwise(
        least(floor((col(s"__f_$n") - col(s"__mn_$n")) / step),
          lit(bins - 1L))).cast("long")
    }
    val binned = base.crossJoin(broadcast(stats))
      .select(col("__id") +: features.zipWithIndex.map {
        case ((n, _), i) => binOf(n).as(s"__b$i") }: _*)
    val exploded = binned.select(col("__id"),
      posexplode(array(features.indices.map(i => col(s"__b$i")): _*))
        .as(Seq("__fi", "__bin")))
    val hist = exploded.groupBy(col("__fi"), col("__bin"))
      .agg(count(lit(1)).as("__cnt"))
    import graft.functions.q6
    exploded.join(broadcast(hist), Seq("__fi", "__bin"))
      .withColumn("__t", floor(log(lit(nRows.toDouble) /
        col("__cnt").cast("double")) * lit(1e9) + lit(0.5))
        .cast("long"))
      .groupBy(col("__id"))
      .agg(sum(col("__t")).as("__s"))
      .select(col("__id").as(idCol),
        q6(col("__s").cast("double") / lit(1e9)).as("hbos"))
  }

  /** D12: ROBUST OUTLIER flags per group via MAD (median absolute
    * deviation) — the monitor that survives the outliers it hunts:
    * mean/stddev z-scores are dragged by the very anomalies they
    * should flag, while the median/MAD pair has a 50% breakdown point
    * (Hampel; public knowledge). Per group: `med` = type-1 median
    * (value at rank ⌈n/2⌉ under the (value, id) total order — the
    * X81/X111 integer-rank discipline, never a float percentile),
    * `mad` = type-1 median of |x − med| under the (deviation, id)
    * order, flag = |x − med| > k·MAD.
    *
    * Exactness: medians are data values picked by integer ranks;
    * |x − med| and the k·MAD compare are single correctly-rounded IEEE
    * ops — bit-identical cross-engine with no rounding or tolerance.
    * A degenerate group (> half identical values) has MAD 0 and flags
    * every deviating row — the standard convention, documented. Scale:
    * two group-keyed rank windows (group-partitioned, never global).
    * Output: one row per input row — (group, id, value, med, mad,
    * is_outlier). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: Column,
      idCol: Column, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    // NULLs excluded before ranking — same cross-engine NULL-order
    // hazard as winsorize (Spark NULLS FIRST vs DuckDB NULLS LAST).
    val base = df.select(col(groupCol), valueCol.cast("double")
      .as("value"), idCol.as("__id"))
      .filter(col("value").isNotNull)
    val wv = Window.partitionBy(col(groupCol))
      .orderBy(col("value"), col("__id"))
    val wn = Window.partitionBy(col(groupCol))
    val medOf = base
      .withColumn("__r", row_number().over(wv).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn).cast("long"))
      .filter(col("__r") === floor((col("__n") + lit(1L)) / lit(2L)).cast("long"))
      .select(col(groupCol).as("__g"), col("value").as("med"))
    val dev = base
      .join(medOf, col(groupCol) === col("__g")).drop("__g")
      .withColumn("__dev", abs(col("value") - col("med")))
    val wd = Window.partitionBy(col(groupCol))
      .orderBy(col("__dev"), col("__id"))
    val madOf = dev
      .withColumn("__r", row_number().over(wd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn).cast("long"))
      .filter(col("__r") === floor((col("__n") + lit(1L)) / lit(2L)).cast("long"))
      .select(col(groupCol).as("__g"), col("__dev").as("mad"))
    dev.join(madOf, col(groupCol) === col("__g")).drop("__g")
      .select(col(groupCol), col("__id").as("id"), col("value"),
        col("med"), col("mad"),
        (col("__dev") > lit(k) * col("mad")).cast("int")
          .as("is_outlier"))
  }

  /** X126: KEY-SKEW REPORT — the pre-join / pre-aggregate diagnostic
    * that predicts whether a shuffle on `keyCol` will straggle: per-key
    * counts, the top-`k` hottest keys under the (count desc, key) total
    * order, each with its share of all rows and its multiple of the
    * mean key size, plus corpus headline columns (n_keys, n_rows,
    * skew_factor = max/mean) broadcast onto every row. A skew_factor in
    * the hundreds is the cue to reach for the salted join (J12) or AQE
    * skew handling BEFORE the 100 TB run straggles.
    *
    * Exactness + scale: everything is exact integer counts with fixed
    * IEEE divisions (no rounding needed); the top-k is TakeOrdered
    * (never a global sort), the rank window runs AFTER limit(k) — a
    * k-row relation by construction — and the headline is a broadcast
    * 1-row aggregate. NULL keys are excluded (they hash to one lane in
    * a real join and deserve their own null-handling decision, not a
    * silent share of this report). Output: k rows —
    * (rank, key, n, share, x_mean, n_keys, n_rows, skew_factor). */
  def keySkewReport(df: DataFrame, keyCol: Column, k: Int = 10)
      : DataFrame =
    keySkewFromCounts(graft.util.Caches.persistTracked(
      df.select(keyCol.cast("string").as("key"))
        .filter(col("key").isNotNull)
        .groupBy(col("key")).agg(count(lit(1)).as("n"))), k)

  /** The skew arithmetic over any (key, n) count table — shared by
    * [[keySkewReport]] and the streaming key-skew monitor view
    * ([[graft.streaming.StreamingEvents.keySkewView]]): counts are
    * exact integers and MERGEABLE, so the stream-wide report over
    * per-batch persisted counts equals the batch report over the
    * union by construction. */
  private[graft] def keySkewFromCounts(cnt: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val stats = cnt.agg(count(lit(1)).as("n_keys"),
      coalesce(sum(col("n")), lit(0L)).as("n_rows"),
      max(col("n")).as("__mx"))
    // BOUNDED global window: ranks run AFTER limit(k) — k rows.
    val w = Window.orderBy(col("n").desc, col("key"))
    cnt.orderBy(col("n").desc, col("key")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("n"),
        (col("n").cast("double") / col("n_rows").cast("double"))
          .as("share"),
        (col("n").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("x_mean"),
        col("n_keys"), col("n_rows"),
        (col("__mx").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_factor"))
  }
}
