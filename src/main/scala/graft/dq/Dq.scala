package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality engine with the semantics of the reference's TopNotch
  * integration (SURVEY.md §2.13; behaviour spec reference:
  * docs/dq_testing.md:1-193, invocation DQTestSpec.scala:16-31):
  * assertions (valid-row predicate + failure threshold), diffs (row
  * comparison over join keys), views (named SQL), and plans (an ordered
  * command list with outputs feeding later inputs).
  *
  * Scale: an assertion is ONE aggregate pass — total and invalid counts
  * come from the same `count(when(...))` aggregation, not two `count()`
  * jobs over the same lineage; the invalid-row DataFrame is a lazy filter
  * the caller only pays for when it materializes the report.
  */
object Dq {

  /** D1 assertion outcome. `invalidRows` is lazy. */
  case class AssertionResult(
      validWhere: String,
      threshold: Double,
      total: Long,
      invalid: Long,
      ratio: Double,
      passed: Boolean,
      invalidRows: DataFrame)

  /** D1: rows NOT satisfying `validWhere` are invalid; the assertion fails
    * when their fraction exceeds `threshold`. A row whose predicate
    * evaluates to NULL (e.g. a NULL in the checked column) does NOT satisfy
    * it and counts as invalid — the reference spec says a row is invalid
    * "if it does not pass the query clause" (docs/dq_testing.md), so
    * NULL-predicate rows must not silently pass the gate. Hence invalid =
    * total − count(predicate true), not count(NOT predicate). */
  def assertion(df: DataFrame, validWhere: String,
      threshold: Double): AssertionResult = {
    val bad = !coalesce(expr(validWhere), lit(false))
    val row = df.agg(
      count(lit(1)).as("total"),
      count(when(expr(validWhere), 1)).as("valid")).head()
    val (total, invalid) = (row.getLong(0), row.getLong(0) - row.getLong(1))
    val ratio = if (total == 0) 0.0 else invalid.toDouble / total
    AssertionResult(validWhere, threshold, total, invalid, ratio,
      ratio <= threshold, df.filter(bad))
  }

  /** D2: join `left`/`right` on `joinCols` and compare `compareCols`;
    * returns only rows where any compared column differs, with both sides
    * and a per-column match flag. Null-safe equality (`<=>`). */
  def diff(left: DataFrame, right: DataFrame, joinCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val l = left.select((joinCols ++ compareCols).map(col): _*)
    val r = compareCols.foldLeft(
      right.select((joinCols ++ compareCols).map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"${c}_right")
    }
    val joined = l.join(r, joinCols)
    val flagged = compareCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_match", col(c) <=> col(s"${c}_right"))
    }
    flagged.filter(compareCols.map(c => !col(s"${c}_match")).reduce(_ || _))
  }

  /** D3: named SQL over previously registered temp views. */
  def view(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** D5: PSI FEATURE-DRIFT DETECTION (Population Stability Index — the
    * standard model-monitoring drift score, public knowledge):
    * `psi = Σ_bins (p_i − q_i)·ln(p_i/q_i)` where p/q are the
    * reference/current share of each reference-quantile bin; > 0.25 is
    * the conventional "significant drift" alarm. Bin EDGES come from
    * the reference distribution as exact type-1 quantiles (the value at
    * rank ⌈i·n/bins⌉ in (value, id) order — integer rank arithmetic,
    * no interpolation), so both populations are binned against
    * identical, engine-exact cut points; shares are clipped at
    * `minShare` (the standard guard against ln(0) on empty bins).
    *
    * Engine parity: edges are data values (bit-exact), bin assignment
    * is pure comparisons, shares are single correctly-rounded
    * divisions; only the ln-bearing contribution and the psi total are
    * rounded (ln is ≤1-ulp in both engines).
    *
    * Scale shape: ONE rank window over the reference builds the edges
    * (bins−1 driver-collected doubles — the centroid pattern); binning
    * is a when-chain projection; counts are two bins-sized aggregates.
    * The global rank sort is the exact-quantile cost — at extreme
    * reference sizes substitute sampled/sketched edges upstream, same
    * contract. Output: one row per bin + the repeated psi total. */
  /** D8: COLUMN PROFILING (the Deequ/TopNotch-profile shape, public
    * knowledge) — per column, exact row/null/distinct counts plus
    * min/max/mean for numeric columns and min/max for strings: the
    * first pass every data-quality onboarding runs.
    *
    * TWO aggregate passes: one for every plain statistic, one for the
    * exact distinct counts — mixing multi-column DISTINCT aggregates
    * with plain ones in a single agg makes Catalyst evaluate EVERY
    * aggregate over the (columns+1)x Expand of the table (measured 5x
    * the split cost at sf0.1); split, the plain pass stays
    * Expand-free. Exact distincts are the honest default — at extreme
    * cardinality swap in `approx_count_distinct`, same contract. The
    * numeric mean goes through DECIMAL(38,10) (exact integer-scaled
    * sum) and divides once — bit-identical cross-engine, no tolerance.
    * Non-numeric, non-string columns profile counts only. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    def kind(c: String) = df.schema(c).dataType match {
      case _: NumericType => "numeric"
      case StringType => "string"
      case _ => "other"
    }
    val aggs = cols.flatMap { c =>
      val base = Seq(count(col(c)).as(s"__nn_$c"))
      kind(c) match {
        case "numeric" => base ++ Seq(
          min(col(c).cast("double")).as(s"__mn_$c"),
          max(col(c).cast("double")).as(s"__mx_$c"),
          sum(col(c).cast("decimal(38,10)")).cast("double")
            .as(s"__sm_$c"))
        case "string" => base ++ Seq(
          min(col(c)).as(s"__mns_$c"), max(col(c)).as(s"__mxs_$c"))
        case _ => base
      }
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).head()
    val dRow = df.agg(
      count_distinct(col(cols.head)).as(s"__nd_${cols.head}"),
      cols.tail.map(c => count_distinct(col(c)).as(s"__nd_$c")): _*)
      .head()
    val n = row.getAs[Long]("__n")
    def opt[T](name: String): Option[T] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(
        row.fieldIndex(name))) Some(row.getAs[T](name)) else None
    cols.map { c =>
      val nn = row.getAs[Long](s"__nn_$c")
      val mean = opt[Double](s"__sm_$c").map(_ / nn)
      (c, kind(c), n, n - nn, dRow.getAs[Long](s"__nd_$c"),
        opt[Double](s"__mn_$c"), opt[Double](s"__mx_$c"),
        // driver-side mirror of graft.functions.q6 — NOT BigDecimal
        // HALF_UP (that is Spark round()'s shortest-repr semantics,
        // which diverges from DuckDB on half-boundary doubles)
        mean.map(m => math.floor(m * 1e6 + 0.5) / 1e6),
        opt[String](s"__mns_$c"), opt[String](s"__mxs_$c"))
    }.toDF("column", "kind", "n_rows", "n_nulls", "n_distinct",
      "num_min", "num_max", "num_mean", "str_min", "str_max")
  }

  /** D14: K-ANONYMITY RISK report — the re-identification audit run
    * on a training corpus before release (Sweeney 2002, public
    * knowledge): for each candidate k, how many quasi-identifier
    * groups have FEWER than k members and how many rows sit in them —
    * a row in a size-1 (lang, source, …) group is one odd document
    * away from being linkable. Exact counts from ONE pass over the
    * group-size table (per-k sums in a single aggregate, assembled by
    * literal-indexed struct explode — the D9 pattern), one division
    * per row.
    *
    * Scale: one map-side-combined groupBy over the quasi columns,
    * then everything is group-table-sized. Output: one row per k —
    * (k, n_rows, n_groups, n_small_groups, n_rows_at_risk,
    * risk_rate). */
  def kAnonymityRisk(df: DataFrame, quasiCols: Seq[String],
      ks: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityRisk: no quasi-identifiers")
    require(ks.nonEmpty, "kAnonymityRisk: no k values")
    ks.foreach(k => require(k >= 2, s"k must be >= 2, got $k"))
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val aggs = Seq(count(lit(1)).as("__ng"),
      coalesce(sum(col("__c")), lit(0L)).as("__n")) ++
      ks.flatMap(k => Seq(
        sum(when(col("__c") < k, 1L).otherwise(0L)).as(s"__sg_$k"),
        sum(when(col("__c") < k, col("__c")).otherwise(0L))
          .as(s"__sr_$k")))
    val m = sizes.agg(aggs.head, aggs.tail: _*)
    val rows = ks.map(k => struct(lit(k).as("k"),
      col("__n").as("n_rows"), col("__ng").as("n_groups"),
      col(s"__sg_$k").as("n_small_groups"),
      col(s"__sr_$k").as("n_rows_at_risk"),
      when(col("__n") > 0, col(s"__sr_$k").cast("double") /
        col("__n").cast("double")).as("risk_rate")))
    m.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** D24: L-DIVERSITY report — the companion release audit to [[kAnonymityRisk]]
    * (Machanavajjhala 2007, public knowledge): k-anonymity bounds
    * group SIZE, but a size-50 (lang, source) group whose sensitive
    * attribute is constant still leaks it for every member — distinct
    * l-diversity requires each quasi-identifier group to carry at
    * least l DISTINCT sensitive values. For each candidate l: how
    * many groups fall below it and how many rows sit in them.
    *
    * Exact counts: one map-side-combined groupBy over (quasi cols,
    * sensitive) — the distinct pre-aggregate — then a group-table
    * rollup; per-l sums assembled in a single aggregate by the D14
    * literal-indexed struct-explode pattern. NULL sensitive values
    * count as one value (a group of all-NULL sensitives is diversity
    * 1 — maximally leaky — not diversity 0). Everything after the
    * first aggregate is group-table-sized. Output: one row per l —
    * (l, n_rows, n_groups, n_low_groups, n_rows_at_risk, risk_rate). */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, ls: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity: no quasi-identifiers")
    require(ls.nonEmpty, "lDiversity: no l values")
    ls.foreach(l => require(l >= 2, s"l must be >= 2, got $l"))
    // distinct pre-aggregate: (quasi, sensitive) cells with row counts —
    // one shuffle; the exact-distinct count is then a cell-table count
    val cells = df.groupBy(
        (quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = cells.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__nd"), sum(col("__c")).as("__n"))
    val aggs = Seq(count(lit(1)).as("__ng"),
      coalesce(sum(col("__n")), lit(0L)).as("__nr")) ++
      ls.flatMap(l => Seq(
        sum(when(col("__nd") < l, 1L).otherwise(0L)).as(s"__lg_$l"),
        sum(when(col("__nd") < l, col("__n")).otherwise(0L))
          .as(s"__lr_$l")))
    val m = groups.agg(aggs.head, aggs.tail: _*)
    val rows = ls.map(l => struct(lit(l).as("l"),
      col("__nr").as("n_rows"), col("__ng").as("n_groups"),
      col(s"__lg_$l").as("n_low_groups"),
      col(s"__lr_$l").as("n_rows_at_risk"),
      when(col("__nr") > 0, col(s"__lr_$l").cast("double") /
        col("__nr").cast("double")).as("risk_rate")))
    m.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** D25: T-CLOSENESS report (Li, Li & Venkatasubramanian 2007,
    * public knowledge) — the third leg of the release-audit triad:
    * [[kAnonymityRisk]] bounds group SIZE, [[lDiversity]] bounds
    * sensitive-value COUNT, but a group whose 10 distinct salaries are
    * all in the top percentile still leaks; t-closeness bounds the
    * DISTANCE between each quasi-identifier group's sensitive
    * distribution and the global one. Distance = the ordered
    * equal-distance Earth-Mover's Distance of the paper's §4:
    * `EMD(g) = (1/(m−1)) · Σ_i |P_g(≤v_i) − Q(≤v_i)|` over the m
    * globally observed sensitive values in order.
    *
    * EXACT: the cumulative gap at value i is the rational
    * `(N·cumc_g,i − n_g·cumN_i) / (n_g·N)` — the numerator is an
    * exact DECIMAL(38,0) integer (N·cum can reach 10²⁰ at 10¹⁰ rows —
    * LONG overflows), |·|-summed per group, ONE division at the end:
    * order-free, engine-identical, no per-term float. The trailing
    * value's gap is identically 0 (both cumulatives hit their total).
    * NULL sensitive values carry no position in the value order (and
    * Spark sorts NULLS FIRST where DuckDB sorts NULLS LAST — a silent
    * cross-engine cut shift): they are EXCLUDED from the
    * distributions and censused in `n_null_rows`.
    *
    * Scale: one (quasi, sensitive) cell aggregate; the per-group
    * cumulative window is over the group × VALUE-ALPHABET grid —
    * bounded by m per group (a sensitive attribute in a release audit
    * is low-cardinality by definition; bucket continuous values
    * first), built by cross-joining the broadcast m-row value table;
    * global N/m ride as a broadcast 1-row aggregate. Degenerate m = 1
    * (constant sensitive value) ⇒ every EMD is exactly 0. Output: one
    * row per t — (t, n_rows, n_null_rows, n_groups, m_values,
    * n_violating_groups, n_rows_at_risk, risk_rate, max_emd). */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, ts: Seq[Double] = Seq(0.15, 0.2))
      : DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness: no quasi-identifiers")
    require(ts.nonEmpty, "tCloseness: no t thresholds")
    ts.foreach(t => require(t > 0 && t < 1,
      s"t must sit in (0,1), got $t"))
    val D = "decimal(38,0)"
    val base = df.select(
      quasiCols.map(col) :+ col(sensitiveCol).as("__s"): _*)
    val nullAgg = base.agg(
      sum(when(col("__s").isNull, 1L).otherwise(0L)).as("n_null_rows"))
    val cells = graft.util.Caches.persistTracked(
      base.filter(col("__s").isNotNull)
        .groupBy(quasiCols.map(col) :+ col("__s"): _*)
        .agg(count(lit(1)).as("__c")))
    val values = cells.groupBy(col("__s")).agg(sum(col("__c")).as("__nv"))
    val tot = values.agg(
      coalesce(sum(col("__nv")), lit(0L)).as("__tn"),
      count(lit(1)).as("__m"))
    val groups = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__n"))
    val grid = groups.crossJoin(broadcast(values))
      .join(cells, quasiCols :+ "__s", "left")
      .na.fill(0L, Seq("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__s"))
    val cum = grid
      .withColumn("__cp", sum(col("__c")).over(w))
      .withColumn("__cq", sum(col("__nv")).over(w))
    val perGroup = cum.crossJoin(broadcast(tot))
      .groupBy(quasiCols.map(col): _*)
      .agg(first(col("__n")).as("__n"), first(col("__tn")).as("__tn"),
        first(col("__m")).as("__m"),
        sum(abs(col("__tn").cast(D) * col("__cp").cast(D) -
          col("__n").cast(D) * col("__cq").cast(D))).as("__num"))
      .withColumn("__emd",
        when(col("__m") > 1,
          col("__num").cast("double") /
            (col("__n").cast("double") * col("__tn").cast("double") *
              (col("__m").cast("double") - lit(1.0))))
          .otherwise(lit(0.0)))
    val aggs = Seq(count(lit(1)).as("__ng"),
      coalesce(sum(col("__n")), lit(0L)).as("__nr"),
      coalesce(max(col("__emd")), lit(0.0)).as("__mx"),
      first(col("__m")).as("__mv")) ++
      ts.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("__emd") > t, 1L).otherwise(0L)).as(s"__tg_$i"),
        sum(when(col("__emd") > t, col("__n")).otherwise(0L))
          .as(s"__tr_$i")) }
    val m = perGroup.agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(nullAgg))
    val rows = ts.zipWithIndex.map { case (t, i) => struct(
      lit(t).as("t"), col("__nr").as("n_rows"),
      col("n_null_rows"), col("__ng").as("n_groups"),
      coalesce(col("__mv"), lit(0L)).as("m_values"),
      col(s"__tg_$i").as("n_violating_groups"),
      col(s"__tr_$i").as("n_rows_at_risk"),
      graft.functions.q6(when(col("__nr") > 0,
        col(s"__tr_$i").cast("double") / col("__nr").cast("double")))
        .as("risk_rate"),
      graft.functions.q6(col("__mx")).as("max_emd")) }
    m.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** X175: SEEDED-LAPLACE NOISY-COUNT RELEASE (the Dwork et al. 2006
    * Laplace mechanism, public knowledge) — the release SHAPE a
    * privacy-gated aggregate endpoint publishes: per-group count plus
    * Laplace(Δ/ε) noise, Δ = 1 for counting queries. Completes the
    * release-audit tier (D15 k-anonymity, D24 l-diversity, D25
    * t-closeness audit the TABLE; this op transforms the ANSWER).
    *
    * HONEST CAVEAT (read before deploying): the noise here is derived
    * from a SEEDED md5 uniform — deterministic so the release is
    * testable bit-for-bit cross-engine and replayable in CI. A
    * deterministic draw is NOT differential privacy: anyone holding
    * the seed can subtract the noise. A production release keeps this
    * exact pipeline shape and swaps the uniform for a CSPRNG draw;
    * everything else (sensitivity, inverse-CDF transform, the epsilon
    * accounting the caller does) is unchanged.
    *
    * Engine parity: u = (h + 0.5)/2^32 over the first 8 md5 hex digits
    * of (seed, group) — exact dyadic double, never exactly 0 or ½ —
    * then the inverse CDF `−b·sgn(u−½)·ln(1−2|u−½|)` as one pinned
    * tree; only the published noisy count is quantized (q6). One
    * aggregate + a projection. Output: (group, n, b, noisy_n) — n is
    * the audit column a real release DROPS. */
  def noisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: String, sensitivity: Double = 1.0): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    require(sensitivity > 0,
      s"sensitivity must be > 0, got $sensitivity")
    val b = sensitivity / epsilon
    // fail loud on NULL groups: concat_ws silently SKIPS NULL, so a
    // NULL group would draw seed-only noise here while a SQL mirror's
    // `||` concatenation yields NULL — a cross-engine divergence. A
    // release endpoint decides NULL-group policy upstream, explicitly.
    val guarded = df.select(
      when(col(groupCol).isNull,
        raise_error(lit(s"noisyCounts: NULL group in '$groupCol' — " +
          "filter or bucket NULLs explicitly before release")))
        .otherwise(col(groupCol)).as(groupCol))
    val counts = guarded.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val h = conv(substring(md5(concat_ws(":", lit(s"dp|$seed"),
      col(groupCol).cast("string"))), 1, 8), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    val d = u - lit(0.5)
    val noise = lit(-b) * signum(d) * log(lit(1.0) - lit(2.0) * abs(d))
    import graft.functions.q6
    counts.select(col(groupCol), col("n"), lit(b).as("b"),
      q6(col("n").cast("double") + noise).as("noisy_n"))
  }

  /** D13: REFERENTIAL-INTEGRITY sweep — orphan-FK rates for a set of
    * (child.fk → parent.pk) relationships in one report: row count,
    * NULL-FK count (NULL is "no reference", not an orphan — the SQL
    * convention), orphan count (non-NULL fk with no parent), orphan
    * rate. The first data-quality gate on any star/vault load: a
    * nonzero orphan rate after a load means the dimension arrived
    * late or the extractor dropped rows.
    *
    * Scale: per check, one aggregate scan of the child plus one
    * LEFT ANTI join against the DISTINCT parent keys (shuffle or
    * broadcast per Catalyst's choice) — never a row-level diff.
    * Counts exact; the rate is one division. Output: one row per
    * check — (check, n_rows, n_null_fk, n_orphans, orphan_rate). */
  def referentialIntegrity(
      checks: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(checks.nonEmpty, "referentialIntegrity: no checks")
    checks.map { case (name, child, fk, parent, pk) =>
      val base = child.agg(count(lit(1)).as("n_rows"),
        sum(when(col(fk).isNull, 1L).otherwise(0L)).as("n_null_fk"))
      val orphans = child.select(col(fk)).filter(col(fk).isNotNull)
        .join(parent.select(col(pk)).distinct(),
          col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      base.crossJoin(broadcast(orphans))
        .select(lit(name).as("check"), col("n_rows"), col("n_null_fk"),
          col("n_orphans"),
          when(col("n_rows") > 0, col("n_orphans").cast("double") /
            col("n_rows").cast("double")).as("orphan_rate"))
    }.reduce(_ unionByName _)
  }

  /** D6: CHI-SQUARE CATEGORICAL DRIFT — the PSI complement for
    * categorical features (language mix, source mix, event-type mix):
    * `chi2 = Σ_cats (o_i − e_i)²/e_i` with observed = current counts
    * and expected = current total × smoothed reference share
    * `(n_ref_i + ½) / (n_ref + ½·K)` (add-half smoothing keeps e > 0
    * for categories the reference never saw — the classic unseen-
    * category failure of the raw statistic). Everything is exact
    * integers and half-integers through correctly-rounded IEEE ops —
    * per-category outputs are BIT-IDENTICAL cross-engine with no
    * rounding; only the K-term total is rounded (distributed sum
    * order). Output: one row per category + dof + the repeated total.
    *
    * Scale shape: two category-sized aggregates and a category-spine
    * join — corpus-size-independent beyond the scans. */
  def chiSquareDrift(reference: DataFrame, current: DataFrame,
      catCol: String): DataFrame = {
    def cnts(df: DataFrame, out: String) = df
      .select(coalesce(col(catCol).cast("string"), lit("__null"))
        .as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as(out))
    val ref = cnts(reference, "n_ref")
    val cur = cnts(current, "n_cur")
    val spine = graft.util.Caches.persistTracked(
      ref.join(cur, Seq("category"), "full_outer")
        .select(col("category"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur")))
    val row = spine.agg(sum(col("n_ref")), sum(col("n_cur")),
      count(lit(1))).head()
    val (nRef, nCur, k) = (row.getLong(0), row.getLong(1), row.getLong(2))
    require(nRef > 0 && nCur > 0, "chiSquareDrift: empty population")
    val expected = ((col("n_ref").cast("double") + lit(0.5)) /
      lit(nRef.toDouble + 0.5 * k)) * lit(nCur.toDouble)
    val scored = spine
      .withColumn("expected", expected)
      .withColumn("contribution",
        ((col("n_cur").cast("double") - col("expected")) *
          (col("n_cur").cast("double") - col("expected"))) /
          col("expected"))
      .withColumn("dof", lit(k - 1))
    // the K-term total as a broadcast one-row aggregate, not a window
    // over a literal partition (Catalyst folds the literal away and
    // leaves a partition-less WindowExec)
    scored.crossJoin(broadcast(
      scored.agg(graft.functions.q6(sum(col("contribution")))
        .as("chi2"))))
  }

  /** D7: KOLMOGOROV–SMIRNOV DRIFT — the nonparametric numeric-drift
    * statistic: `ks = max_x |F_ref(x) − F_cur(x)|` over the pooled
    * sample, where F is the empirical CDF (share of values ≤ x).
    * Pure exact arithmetic end to end — cumulative integer counts,
    * one correctly-rounded division per side, exact |·| and max — so
    * the statistic is BIT-IDENTICAL cross-engine with no rounding or
    * tolerance anywhere.
    *
    * Scale shape: one (value)-keyed aggregate then the TWO-PHASE
    * prefix-sum rank ([[graft.relational.Ranks.prefixSums]]) over
    * distinct pooled values — within-partition cumulative counts in
    * parallel, only per-partition totals on the driver, no
    * single-partition window at any cardinality. Output: one row
    * (n_ref, n_cur, ks_stat). */
  def ksDrift(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), lit(r).as("__r"), lit(c).as("__c"))
    val pooled = clean(reference, 1L, 0L)
      .unionByName(clean(current, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    ksFromCells(pooled)
  }

  /** The [[ksDrift]] finish over an already-pooled distinct-value count
    * table (__v double, nr, nc) — per-value counts are exact mergeable
    * integers, so a streaming value-cell store can reuse this verbatim
    * (the cmhFromCounts pattern at value grain). */
  private[graft] def ksFromCells(pooled: DataFrame): DataFrame = {
    val (cum, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      pooled, Seq(col("__v")),
      Seq("__cnr" -> col("nr"), "__cnc" -> col("nc")))
    val (nRef, nCur) = (totals(0), totals(1))
    require(nRef > 0 && nCur > 0, "ksDrift: empty population")
    cum
      .withColumn("__gap", abs(
        col("__cnr").cast("double") / lit(nRef.toDouble) -
          col("__cnc").cast("double") / lit(nCur.toDouble)))
      .agg(max(col("__gap")).as("ks_stat"))
      .select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        col("ks_stat"))
  }

  /** D26: 1-WASSERSTEIN (EARTH-MOVER) NUMERIC DRIFT — `W₁ = ∫|F_ref −
    * F_cur| dx` — the MAGNITUDE companion of [[ksDrift]]'s max-gap and
    * [[psiDrift]]'s binned score: KS says "the worst vertical gap",
    * W₁ says "how far the mass actually moved, in the metric's own
    * units" (a 1% shift of every value and a 50% shift of 2% of
    * values can share a KS; their W₁ differ 25×). The numeric twin of
    * D25 t-closeness' categorical EMD.
    *
    * Exactness: values land on the 1e-6 quantized grid (`⌊v·10⁶+½⌋` —
    * the statistic is DEFINED on that grid, the [[graft.ml.Matching]]
    * scaled-term discipline), after which EVERYTHING is exact integer:
    * per-value counts, two-phase cumulative counts, the CDF gap as the
    * cross-multiplied `|cnr·n_cur − cnc·n_ref|` (no per-row division),
    * times the exact integer gap to the NEXT distinct value, summed in
    * DECIMAL; ONE final division by `n_ref·n_cur·10⁶`. The statistic
    * is bit-identical cross-engine, quantized only at publish (q6).
    *
    * Scale shape: one pooled value aggregate, one two-phase prefix
    * sum (rank rides the same call), one rank→rank+1 self-join of the
    * DISTINCT-VALUE table for the Δv adjacency (never a partition-less
    * lead window); the last value's open interval carries zero gap by
    * construction, so the inner join dropping it is exact. Output:
    * 1 row — (n_ref, n_cur, w1). */
  def wassersteinDrift(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("__raw"))
      .filter(col("__raw").isNotNull)
      .select(floor(col("__raw") * lit(1e6) + lit(0.5)).cast("long")
        .as("__v"), lit(r).as("__r"), lit(c).as("__c"))
    val pooled = clean(reference, 1L, 0L)
      .unionByName(clean(current, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    wassersteinFromCells(pooled)
  }

  /** The [[wassersteinDrift]] finish over an already-pooled MICRO-grid
    * distinct-value count table (__v = ⌊v·10⁶+½⌋ long, nr, nc) —
    * mergeable integer cells, shared with the streaming value-cell
    * store (quantizing cell values and summing counts is identical to
    * quantizing row values: same value → same micro cell). */
  private[graft] def wassersteinFromCells(pooled: DataFrame)
      : DataFrame = {
    val D = "decimal(38,0)"
    val (cum, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      pooled, Seq(col("__v")),
      Seq("__cnr" -> col("nr"), "__cnc" -> col("nc"),
        "__rk" -> lit(1L)))
    val (nRef, nCur) = (totals(0), totals(1))
    require(nRef > 0 && nCur > 0, "wassersteinDrift: empty population")
    val nxt = cum.select(col("__rk").as("__rk0"), col("__v").as("__nxt"))
    val terms = cum.join(nxt, col("__rk0") === col("__rk") + 1)
      .select((abs(col("__cnr").cast(D) * lit(nCur).cast(D) -
        col("__cnc").cast(D) * lit(nRef).cast(D)) *
        (col("__nxt") - col("__v")).cast(D)).as("__t"))
    import graft.functions.q6
    terms.agg(coalesce(sum(col("__t")), lit(0).cast(D)).as("__s"))
      .select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        q6(col("__s").cast("double") /
          (lit(nRef.toDouble) * lit(nCur.toDouble) * lit(1e6)))
          .as("w1"))
  }

  /** Exact type-1 quantile edges of `valueCol` (bins−1 cut points at
    * ranks ⌈i·n/bins⌉ in (value, id) order) — the frozen reference
    * contract [[psiDrift]] and the streaming drift monitor share.
    * Ranks come from the two-phase prefix-sum pattern
    * ([[graft.relational.Ranks.globalRank]]), never a global-order
    * window: exact at any reference cardinality. */
  def quantileEdges(df: DataFrame, valueCol: String, idCol: String,
      bins: Int): Array[Double] = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val (ranked, n) = graft.relational.Ranks.globalRankAndCount(df,
      Seq(col(valueCol), col(idCol)), "__r")
    require(n >= bins, s"quantileEdges: $n rows < $bins bins")
    val edgeRanks = (1 until bins).map(i => (i * n + bins - 1) / bins)
    ranked.filter(col("__r").isin(edgeRanks: _*))
      .select(col(valueCol).cast("double")).collect()
      .map(_.getDouble(0)).sorted
  }

  /** 1-based bin index of `v` against frozen `edges` — pure
    * comparisons, engine-exact. */
  def binOf(v: org.apache.spark.sql.Column,
      edges: Array[Double]): org.apache.spark.sql.Column =
    edges.foldLeft(lit(1)) { (acc, e) =>
      acc + when(v > lit(e), 1).otherwise(0)
    }

  /** D27: QUANTILE–QUANTILE DRIFT TABLE — WHERE the distribution moved,
    * completing the numeric-drift quartet: D5 PSI (binned score), D7 KS
    * (worst gap), D26 W₁ (total mass moved), and this (the per-decile
    * map a remediation actually reads: "p50 is flat, the p90 tail grew
    * 40%"). One row per interior quantile level with both sides' exact
    * type-1 order statistics and their difference.
    *
    * Exactness: both sides reuse [[quantileEdges]] — two-phase integer
    * ranks, ⌈i·n/bins⌉ picks, DATA VALUES only (no interpolation, so
    * both engines return the identical element); `diff` is one IEEE
    * subtraction of exact values; only the level label is quantized
    * (driver-side mirror of q6). Two rank passes + two (bins−1)-sized
    * collects. Output: (quantile_idx, level, q_ref, q_cur, diff). */
  def qqDrift(reference: DataFrame, current: DataFrame,
      valueCol: String, idCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = reference.sparkSession
    def clean(df: DataFrame) = df
      .select(col(valueCol).cast("double").as(valueCol), col(idCol))
      .filter(col(valueCol).isNotNull)
    val re = quantileEdges(clean(reference), valueCol, idCol, bins)
    val ce = quantileEdges(clean(current), valueCol, idCol, bins)
    import spark.implicits._
    (1 until bins).map { i =>
      (i.toLong, math.floor(i.toDouble / bins * 1e6 + 0.5) / 1e6,
        re(i - 1), ce(i - 1), ce(i - 1) - re(i - 1))
    }.toDF("quantile_idx", "level", "q_ref", "q_cur", "diff")
  }

  /** D30: CATEGORICAL DRIFT SCORECARD — TVD + Hellinger + Jensen–
    * Shannon in one pass, the categorical counterpart of the numeric
    * family ([[psiDrift]]/[[ksDrift]]/[[wassersteinDrift]]/
    * [[andersonDarlingDrift]]) and the metric complement of
    * [[chiSquareDrift]]'s TEST: χ² answers "is the shift sampling
    * noise", these three answer "HOW FAR apart are the distributions"
    * on bounded [0,1] scales a threshold policy can own (TVD = the
    * largest probability any event's mass can differ by; Hellinger
    * the geometric middle; JSD the information-theoretic one, in
    * bits).
    *
    * Exactness: TVD is EXACT integers end-to-end — Σ|c_r·N_c −
    * c_c·N_r| in DECIMAL with ONE final division by 2·N_r·N_c.
    * Hellinger/JSD terms are per-category fixed IEEE trees (sqrt is
    * correctly rounded; log2 follows the repo's libm precedent)
    * summed by the ORDERED category cumulative window (k-bounded —
    * one row per category, the kruskalWallis discipline), published
    * q6. NULL categories fail loud (engines disagree on NULL order);
    * category count is guarded by `maxCategories`. Output: 1 row —
    * (n_ref, n_cur, k, tvd, hellinger, jsd). */
  def categoricalDrift(reference: DataFrame, current: DataFrame,
      catCol: String, maxCategories: Int = 100000): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(when(col(catCol).isNull,
        raise_error(lit(s"categoricalDrift: NULL category in " +
          s"'$catCol' — bucket NULLs explicitly")))
        .otherwise(col(catCol).cast("string")).as("__cat"),
        lit(r).as("__r"), lit(c).as("__c"))
    categoricalDriftFromCells(
      clean(reference, 1L, 0L)
        .unionByName(clean(current, 0L, 1L))
        .groupBy(col("__cat"))
        .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc")),
      maxCategories)
  }

  /** [[categoricalDrift]] over an already-counted (__cat, nr, nc)
    * cell table — per-category counts are exact and mergeable, which
    * is what lets the streaming category-cell sink's merged view vs a
    * frozen reference reuse this finish verbatim (batch-parity
    * spec-proven). */
  private[graft] def categoricalDriftFromCells(cells: DataFrame,
      maxCategories: Int): DataFrame = {
    val D = "decimal(38,0)"
    val totals = cells.agg(
      coalesce(sum(col("nr")), lit(0L)).as("__nref"),
      coalesce(sum(col("nc")), lit(0L)).as("__ncur"),
      count(lit(1)).as("__k"))
      .select(
        when(col("__nref") === 0 || col("__ncur") === 0,
          raise_error(lit("categoricalDrift: empty population")))
          .otherwise(col("__nref")).as("__nref"),
        col("__ncur"),
        when(col("__k") > maxCategories,
          raise_error(lit(s"categoricalDrift: category count exceeds " +
            s"maxCategories=$maxCategories — bucket the long tail")))
          .otherwise(col("__k")).as("__k"))
    val withT = cells.crossJoin(broadcast(totals))
    val tvdNum = abs(col("nr").cast(D) * col("__ncur").cast(D) -
      col("nc").cast(D) * col("__nref").cast(D))
    val pr = col("nr").cast("double") / col("__nref").cast("double")
    val pc = col("nc").cast("double") / col("__ncur").cast("double")
    val hTerm = (sqrt(pr) - sqrt(pc)) * (sqrt(pr) - sqrt(pc))
    val mAvg = (pr + pc) / lit(2.0)
    val jTerm =
      when(col("nr") > 0, pr * log2(pr / mAvg)).otherwise(lit(0.0)) +
      when(col("nc") > 0, pc * log2(pc / mAvg)).otherwise(lit(0.0))
    val wC = org.apache.spark.sql.expressions.Window
      .orderBy(col("__cat"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    import graft.functions.q6
    withT
      .withColumn("__ch", sum(hTerm).over(wC))
      .withColumn("__cj", sum(jTerm).over(wC))
      .groupBy(col("__nref"), col("__ncur"), col("__k"))
      .agg(coalesce(sum(tvdNum), lit(0).cast(D)).as("__tvd"),
        max_by(col("__ch"), col("__cat")).as("__h"),
        max_by(col("__cj"), col("__cat")).as("__j"))
      .select(col("__nref").as("n_ref"), col("__ncur").as("n_cur"),
        col("__k").as("k"),
        q6(col("__tvd").cast("double") /
          (lit(2.0) * col("__nref").cast("double") *
            col("__ncur").cast("double"))).as("tvd"),
        q6(sqrt(col("__h") / lit(2.0))).as("hellinger"),
        q6(col("__j") / lit(2.0)).as("jsd"))
  }

  /** D29: TWO-SAMPLE ANDERSON–DARLING DRIFT (Scholz & Stephens 1987
    * midrank form A²akN — public knowledge) — the TAIL-sensitive
    * member completing the numeric-drift family: PSI bins, KS takes
    * the worst CDF gap (center-dominated — a pure tail shift barely
    * moves it), W₁ totals the mass moved, AD weights every gap by
    * `1/(F(1−F))` so the p99 tail that breaks latency SLOs and
    * quantile featurizers gets the microscope. This is the
    * tie-adjusted midrank version (the one scipy's anderson_ksamp
    * computes), DEFINED on the distinct-value grid:
    *
    *   A² = (N−1)/N² · Σ_j Σ_{i∈{ref,cur}} l_j·D_ij² / (n_i·E_j)
    *   D_ij = N·M2_ij − n_i·B2_j,  E_j = B2_j·(2N−B2_j) − N·l_j
    *
    * with DOUBLED midrank cumulatives (B2 = 2·cum − l, M2 likewise) so
    * the textbook ½s never appear: every D, E, numerator and
    * denominator is an EXACT integer in DECIMAL(38,0). Each of the 2L
    * per-term rationals is ONE correctly-rounded double division
    * (identical cross-engine) floor-scaled to 1e9 — the per-term
    * floor is part of the statistic's definition here, making the
    * cross-term sum an exact, ORDER-FREE integer (a raw double Σ over
    * an unordered grid would be engine-unstable). One final
    * (N−1)/N²·S/10⁹ tree, published q6.
    *
    * Scale shape: one pooled distinct-value aggregate + ONE two-phase
    * prefix sum carrying both sides' cumulatives (the ksDrift plan) —
    * no windows over data, no joins. E_j > 0 whenever the pooled
    * sample has ≥ 2 distinct values; the all-tied corpus emits NULL.
    * Output: 1 row — (n_ref, n_cur, a2). */
  def andersonDarlingDrift(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), lit(r).as("__r"), lit(c).as("__c"))
    val pooled = clean(reference, 1L, 0L)
      .unionByName(clean(current, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    andersonDarlingFromCells(pooled)
  }

  /** The [[andersonDarlingDrift]] finish over an already-pooled
    * distinct-value count table (__v double, nr, nc) — the third view
    * the streaming value-cell store feeds (KS takes the worst gap, W₁
    * the mass moved, AD the tail-weighted total). */
  private[graft] def andersonDarlingFromCells(pooled: DataFrame)
      : DataFrame = {
    val D = "decimal(38,0)"
    val (cum, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      pooled, Seq(col("__v")),
      Seq("__cnr" -> col("nr"), "__cnc" -> col("nc"),
        "__cn" -> (col("nr") + col("nc"))))
    val (nRef, nCur) = (totals(0), totals(1))
    val nTot = totals(2)
    require(nRef > 0 && nCur > 0, "andersonDarlingDrift: empty population")
    // exactness bound: l·d² ≤ N·(2N²)² = 4N⁵ must fit DECIMAL(38,0);
    // 4N⁵ < 10³⁸ ⇔ N ≤ 3.0e7. Past that Spark (non-ANSI) would NULL
    // the overflowed products and sum(when(e>0,…)) would silently drop
    // terms while the DuckDB oracle's HUGEINT errors — fail loud here
    // instead (sample/pre-aggregate above this pooled size).
    require(nTot <= 30000000L,
      s"andersonDarlingDrift: pooled N=$nTot exceeds the exact " +
        "DECIMAL(38,0) bound (4·N⁵ < 1e38 requires N ≤ 3.0e7) " +
        "— sample or pre-bin before testing")
    val l = (col("nr") + col("nc")).cast(D)
    val b2 = (lit(2L) * col("__cn")).cast(D) - l
    val e = b2 * (lit(2L * nTot).cast(D) - b2) - lit(nTot).cast(D) * l
    def term(m2: org.apache.spark.sql.Column, ni: Long)
        : org.apache.spark.sql.Column = {
      val d = lit(nTot).cast(D) * m2.cast(D) - lit(ni).cast(D) * b2
      floor((l * d * d).cast("double") /
        (lit(ni).cast(D) * e).cast("double") * lit(1e9)).cast(D)
    }
    val tRef = term((lit(2L) * col("__cnr")).cast(D) - col("nr").cast(D),
      nRef)
    val tCur = term((lit(2L) * col("__cnc")).cast(D) - col("nc").cast(D),
      nCur)
    import graft.functions.q6
    cum.agg(count(lit(1)).as("__nvals"),
        sum(when(e > 0, tRef + tCur)).as("__s"))
      .select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        q6(when(col("__nvals") > 1,
          lit((nTot - 1).toDouble) / lit(nTot.toDouble * nTot.toDouble) *
            (col("__s").cast("double") / lit(1e9)))).as("a2"))
  }

  /** D31: TWO-SAMPLE CRAMÉR–VON MISES DRIFT (Anderson 1962, public
    * knowledge) — the INTEGRATED-square member completing the
    * CDF-distance family: KS takes the single worst gap (a narrow
    * spike dominates), AD weights the tails, W₁ is metric-scaled; CvM
    * integrates the SQUARED gap over the pooled sample —
    * `T = (n_r·n_c/N²)·Σ_pooled (F_r − F_c)²` — the whole-shape score
    * that is robust to both a lone spike and metric rescaling.
    *
    * Exactness: on the pooled distinct-value grid
    * `T = Σ_j l_j·d_j² / (N²·n_r·n_c)` with `d_j = cnr_j·n_c −
    * cnc_j·n_r` — every term an EXACT integer in DECIMAL(38,0)
    * (Σ l_j = N so the sum is bounded by N·(n_r·n_c)² ≤ N⁵/16 — the
    * [[andersonDarlingDrift]] bound family; the shared N ≤ 3.0e7 guard
    * keeps it inside 38 digits), ONE final double division, published
    * q6. Scale shape: the ksDrift plan verbatim — one pooled value
    * aggregate + one two-phase prefix sum, no windows over data, no
    * joins. Output: 1 row — (n_ref, n_cur, cvm). */
  def cramerVonMisesDrift(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), lit(r).as("__r"), lit(c).as("__c"))
    val pooled = clean(reference, 1L, 0L)
      .unionByName(clean(current, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    cramerVonMisesFromCells(pooled)
  }

  /** The [[cramerVonMisesDrift]] finish over an already-pooled
    * distinct-value count table (__v double, nr, nc) — the fourth view
    * the streaming value-cell store feeds. */
  private[graft] def cramerVonMisesFromCells(pooled: DataFrame)
      : DataFrame = {
    val D = "decimal(38,0)"
    val (cum, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      pooled, Seq(col("__v")),
      Seq("__cnr" -> col("nr"), "__cnc" -> col("nc")))
    val (nRef, nCur) = (totals(0), totals(1))
    val nTot = nRef + nCur
    require(nRef > 0 && nCur > 0, "cramerVonMisesDrift: empty population")
    require(nTot <= 30000000L,
      s"cramerVonMisesDrift: pooled N=$nTot exceeds the exact " +
        "DECIMAL(38,0) bound (N⁵/16 < 1e38 requires N ≤ 3.0e7, the " +
        "andersonDarlingDrift guard family) — sample or pre-bin first")
    val l = (col("nr") + col("nc")).cast(D)
    val d = col("__cnr").cast(D) * lit(nCur).cast(D) -
      col("__cnc").cast(D) * lit(nRef).cast(D)
    import graft.functions.q6
    cum.agg(coalesce(sum(l * d * d), lit(0).cast(D)).as("__s"))
      .select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        q6(col("__s").cast("double") /
          (lit(nTot.toDouble) * lit(nTot.toDouble) *
            lit(nRef.toDouble) * lit(nCur.toDouble))).as("cvm"))
  }

  /** D32: KUIPER DRIFT (Kuiper 1960, public knowledge) — the
    * TWO-SIDED max-gap: `V = D⁺ + D⁻` with `D± = max ±(F_ref −
    * F_cur)`. KS sees only the single largest gap; a shift that moves
    * mass OUT of both ends (or any change KS happens to see only on
    * one side) doubles up in V — the classic equal-sensitivity-
    * across-the-range variant (and the circular-data statistic).
    *
    * Exactness: the two maxima are taken over EXACT integers
    * `d_j = cnr_j·n_c − cnc_j·n_r` (each bounded by n_r·n_c ≤ N²/4 —
    * fits DECIMAL(38,0) at any realistic N, no guard needed), then ONE
    * correctly-rounded division of their sum — bit-identical
    * cross-engine like [[ksDrift]], no quantization anywhere. The
    * ksDrift plan verbatim. D⁺, D⁻ ≥ 0 always (the gap is 0 at the top
    * grid value). Output: 1 row — (n_ref, n_cur, d_plus, d_minus,
    * kuiper). */
  def kuiperDrift(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), lit(r).as("__r"), lit(c).as("__c"))
    val pooled = clean(reference, 1L, 0L)
      .unionByName(clean(current, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    kuiperFromCells(pooled)
  }

  /** The [[kuiperDrift]] finish over an already-pooled distinct-value
    * count table (__v double, nr, nc) — the fifth view the streaming
    * value-cell store feeds. */
  private[graft] def kuiperFromCells(pooled: DataFrame): DataFrame = {
    val D = "decimal(38,0)"
    val (cum, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      pooled, Seq(col("__v")),
      Seq("__cnr" -> col("nr"), "__cnc" -> col("nc")))
    val (nRef, nCur) = (totals(0), totals(1))
    require(nRef > 0 && nCur > 0, "kuiperDrift: empty population")
    val d = col("__cnr").cast(D) * lit(nCur).cast(D) -
      col("__cnc").cast(D) * lit(nRef).cast(D)
    val den = nRef.toDouble * nCur.toDouble
    cum.agg(greatest(max(d), lit(0).cast(D)).as("__dp"),
        greatest(max(-d), lit(0).cast(D)).as("__dm"))
      .select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        (col("__dp").cast("double") / lit(den)).as("d_plus"),
        (col("__dm").cast("double") / lit(den)).as("d_minus"),
        ((col("__dp") + col("__dm")).cast("double") / lit(den))
          .as("kuiper"))
  }

  /** D34: JENSEN–SHANNON DIVERGENCE DRIFT — the bounded, symmetric
    * information-theoretic member the CDF-distance family lacks:
    * `JSD(P‖Q) = ½KL(P‖M) + ½KL(Q‖M)`, `M = (P+Q)/2`, in nats
    * (0 = identical, ln 2 = disjoint support — public knowledge).
    * KS/Kuiper read the worst CDF gap, W₁ the mass moved, AD/CvM the
    * integrated gaps; JSD reads the OVERLAP of the two distributions
    * — the score that saturates exactly when the populations stop
    * sharing values at all, which no CDF distance reports directly.
    *
    * Exactness: values land on the 1e-6 micro grid (the statistic is
    * DEFINED on that grid — the [[wassersteinDrift]] discipline), so
    * per-value counts are exact integers; each value's term
    * `p·ln(p/m) + q·ln(q/m)` is one fixed IEEE tree (p = nr/Nr,
    * q = nc/Nc, m = (p+q)/2 — each share ONE division of exact
    * integers), floor-scaled to a 1e12 LONG (the
    * [[graft.text.Retrieval]] scaled-term discipline: the float sum
    * order can never matter because the sum is integer), summed in
    * DECIMAL(38,0), halved once, published q6. Zero-count sides
    * contribute a zero term (lim x→0 of x·ln(x/m) — the KL
    * convention).
    *
    * Scale shape: one pooled distinct-value aggregate, one map-side
    * term projection, one scalar aggregate — no window, no join.
    * Output: 1 row — (n_ref, n_cur, jsd). */
  def jsdDrift(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    def clean(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("__raw"))
      .filter(col("__raw").isNotNull)
      .select(floor(col("__raw") * lit(1e6) + lit(0.5)).cast("long")
        .as("__v"), lit(r).as("__r"), lit(c).as("__c"))
    val pooled = clean(reference, 1L, 0L)
      .unionByName(clean(current, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    jsdFromCells(pooled)
  }

  /** The [[jsdDrift]] finish over an already-pooled MICRO-grid
    * distinct-value count table (__v long, nr, nc) — mergeable integer
    * cells, the sixth view the streaming value-cell store feeds. */
  private[graft] def jsdFromCells(pooled: DataFrame): DataFrame = {
    val D = "decimal(38,0)"
    val cells = graft.util.Caches.persistTracked(pooled)
    val t = cells.agg(sum(col("nr")).as("__tr"), sum(col("nc")).as("__tc"))
      .head()
    val (nRef, nCur) = (t.getAs[Long]("__tr"), t.getAs[Long]("__tc"))
    require(nRef > 0 && nCur > 0, "jsdDrift: empty population")
    // the per-value term's IEEE tree is the ORACLE CONTRACT — p, q
    // each one division, m = (p + q) / 2, ln of one division each
    val p = col("nr").cast("double") / lit(nRef.toDouble)
    val q = col("nc").cast("double") / lit(nCur.toDouble)
    val m = (p + q) / lit(2.0)
    val term =
      when(col("nr") > 0, p * log(p / m)).otherwise(lit(0.0)) +
        when(col("nc") > 0, q * log(q / m)).otherwise(lit(0.0))
    import graft.functions.q6
    cells
      .select(floor(term * lit(1e12) + lit(0.5)).cast("long").as("__t"))
      .agg(coalesce(sum(col("__t").cast(D)), lit(0).cast(D)).as("__s"))
      .select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        q6(lit(0.5) * (col("__s").cast("double") / lit(1e12)))
          .as("jsd"))
  }

  def psiDrift(reference: DataFrame, current: DataFrame,
      valueCol: String, idCol: String, bins: Int = 10,
      minShare: Double = 1e-4): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = reference.sparkSession
    def clean(df: DataFrame) = df
      .select(col(valueCol).cast("double").as("__v"), col(idCol).as("__i"))
      .filter(col("__v").isNotNull)
    val refV = graft.util.Caches.persistTracked(clean(reference))
    val curV = clean(current)
    val nRef = refV.count()
    val nCur = curV.count()
    require(nRef >= bins, s"psiDrift: reference has $nRef rows < $bins bins")
    require(nCur > 0, "psiDrift: empty current population")
    val edges = quantileEdges(refV, "__v", "__i", bins)
    def binCounts(df: DataFrame, out: String) = df
      .groupBy(binOf(col("__v"), edges).as("bin"))
      .agg(count(lit(1)).as(out))
    psiFinish(spark, binCounts(refV, "n_ref"), binCounts(curV, "n_cur"),
      nRef, nCur, bins, minShare)
  }

  /** The [[psiDrift]] finish over per-bin count tables (bin, n_ref) /
    * (bin, n_cur) — bin counts are exact mergeable integers and
    * [[binOf]] is a pure value comparison (binning merged cells ≡
    * binning rows), so the streaming value-cell store reuses this
    * verbatim against frozen reference edges. */
  private[graft] def psiFinish(spark: SparkSession, refBins: DataFrame,
      curBins: DataFrame, nRef: Long, nCur: Long, bins: Int,
      minShare: Double): DataFrame = {
    val spine = spark.range(1, bins + 1).select(col("id").cast("int").as("bin"))
    val perBin = graft.util.Caches.persistTracked(spine
      .join(refBins, Seq("bin"), "left")
      .join(curBins, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("share_ref",
        greatest(col("n_ref").cast("double") / lit(nRef.toDouble),
          lit(minShare)))
      .withColumn("share_cur",
        greatest(col("n_cur").cast("double") / lit(nCur.toDouble),
          lit(minShare)))
      .withColumn("__contrib",
        (col("share_ref") - col("share_cur")) *
          log(col("share_ref") / col("share_cur"))))
    // the bins-term total as a broadcast one-row aggregate, not a
    // window over a literal partition (Catalyst folds the literal
    // away and leaves a partition-less WindowExec)
    perBin
      .withColumn("contribution", round(col("__contrib"), 6))
      .crossJoin(broadcast(
        perBin.agg(round(sum(col("__contrib")), 6).as("psi"))))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("share_ref"),
        col("share_cur"), col("contribution"), col("psi"))
  }

  /** D4 plan commands. `input`/`output` keys address the plan context. */
  sealed trait Command { def output: String }
  case class AssertCmd(input: String, validWhere: String, threshold: Double,
      output: String) extends Command
  case class DiffCmd(leftInput: String, rightInput: String,
      joinCols: Seq[String], compareCols: Seq[String],
      output: String) extends Command
  case class ViewCmd(sql: String, output: String) extends Command

  /** D4: run commands in order; each output becomes addressable by later
    * commands and is registered as a temp view for ViewCmd SQL. Assertion
    * outputs are one-row summary frames (the invalid rows are registered
    * under `<output>_invalid`). Outputs named in `cacheKeys` are cached AS
    * CREATED, so later commands that reuse them don't recompute their
    * lineage — the point of the reference plan format's `cache` flag. */
  def runPlan(spark: SparkSession, commands: Seq[Command],
      inputs: Map[String, DataFrame],
      cacheKeys: Set[String] = Set.empty): Map[String, DataFrame] = {
    inputs.foreach { case (k, df) => df.createOrReplaceTempView(k) }
    commands.foldLeft(inputs) { (ctx, cmd) =>
      val out0 = cmd match {
        case AssertCmd(in, where, thr, _) =>
          val r = assertion(ctx(in), where, thr)
          ctx(in).sparkSession.range(1).select(
            lit(r.total).as("total"), lit(r.invalid).as("invalid"),
            graft.functions.q6(lit(r.ratio)).as("ratio"),
            lit(r.passed).as("passed"))
        case DiffCmd(li, ri, jc, cc, _) => diff(ctx(li), ctx(ri), jc, cc)
        case ViewCmd(sql, _) => view(spark, sql)
      }
      val out = if (cacheKeys.contains(cmd.output)) out0.cache() else out0
      out.createOrReplaceTempView(cmd.output)
      val extra = cmd match {
        case AssertCmd(in, where, _, o) =>
          // NULL-predicate rows are invalid too (see assertion scaladoc)
          val inv = ctx(in).filter(!coalesce(expr(where), lit(false)))
          inv.createOrReplaceTempView(s"${o}_invalid")
          Map(s"${o}_invalid" -> inv)
        case _ => Map.empty[String, DataFrame]
      }
      ctx ++ extra + (cmd.output -> out)
    }
  }

  /** D11: declarative CHECK definitions (the Deequ-style constraint
    * suite the reference's single assertion generalizes to). Each check
    * defines a per-row violation; `Unique` is table-level (duplicate
    * rows beyond the first are the violations). `threshold` is the
    * tolerated violation fraction (0 = strict). */
  sealed trait Check { def threshold: Double; def target: String }
  /** Column must be non-NULL. */
  final case class Complete(column: String, threshold: Double = 0.0)
      extends Check { def target: String = column }
  /** Column must fall in [lo, hi]; NULL violates. */
  final case class Between(column: String, lo: Double, hi: Double,
      threshold: Double = 0.0) extends Check { def target: String = column }
  /** Column must be one of `values`; NULL violates. */
  final case class InSet(column: String, values: Seq[String],
      threshold: Double = 0.0) extends Check { def target: String = column }
  /** Column must rlike `pattern`; NULL violates. */
  final case class MatchesRegex(column: String, pattern: String,
      threshold: Double = 0.0) extends Check { def target: String = column }
  /** Arbitrary SQL predicate must hold; NULL violates (D1 semantics). */
  final case class Satisfies(sql: String, threshold: Double = 0.0)
      extends Check { def target: String = sql }
  /** `columns` must uniquely identify rows; each surplus copy violates. */
  final case class Unique(columns: Seq[String], threshold: Double = 0.0)
      extends Check { def target: String = columns.mkString(",") }

  /** D11: run a whole check suite in ONE aggregate pass — total row
    * count plus one `count(when(violation))` per row-level check, and
    * `count − countDistinct` for each Unique check, all in the same
    * Aggregate node (each distinct adds an Expand duplicate of the
    * scan, like D8's profile; keep Unique checks few on huge tables or
    * split them out). Output: one row per check —
    * (check_id, check_type, target, n_violations, violation_ratio,
    * passed) — ordered by check_id, nothing collected except the 1-row
    * aggregate that the literal-struct explode unpacks. */
  def checkSuite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    def violation(c: Check): org.apache.spark.sql.Column = c match {
      case Complete(column, _) => col(column).isNull
      case Between(column, lo, hi, _) =>
        !coalesce(col(column) >= lo && col(column) <= hi, lit(false))
      case InSet(column, values, _) =>
        !coalesce(col(column).isin(values: _*), lit(false))
      case MatchesRegex(column, pattern, _) =>
        !coalesce(col(column).rlike(pattern), lit(false))
      case Satisfies(sql, _) => !coalesce(expr(sql), lit(false))
      case _: Unique => lit(false) // handled as an aggregate below
    }
    val aggs = count(lit(1)).cast("double").as("__total") +:
      checks.zipWithIndex.map {
        case (Unique(cols, _), i) =>
          (count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
            .cast("long").as(s"__v$i")
        case (c, i) =>
          count(when(violation(c), 1)).as(s"__v$i")
      }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val ratio = when(col("__total") > 0,
        col(s"__v$i") / col("__total")).otherwise(lit(0.0))
      struct(lit(i).as("check_id"),
        lit(c.getClass.getSimpleName).as("check_type"),
        lit(c.target).as("target"),
        col(s"__v$i").as("n_violations"),
        ratio.as("violation_ratio"),
        (ratio <= c.threshold).cast("int").as("passed"))
    }
    m.select(explode(array(rows: _*)).as("__c")).select(col("__c.*"))
      .orderBy(col("check_id"))
  }

  /** D16: PARTITION-GAP REPORT — the backfill planner's input: every
    * calendar day MISSING from a date column between its observed min
    * and max (a date-partitioned table with a hole is the classic
    * silently-wrong training window; "no rows that day" and "pipeline
    * never ran that day" look identical until someone checks).
    *
    * Scale: one distinct-days aggregate (bounded by the CALENDAR SPAN,
    * never row volume), the spine exploded from a broadcast 1-row
    * min/max — no driver loop, no row-sized anything — and one
    * days-sized LEFT ANTI. Output: (missing_day), ordered upstream by
    * the caller. Empty when the span is dense. */
  def missingPartitions(df: DataFrame,
      dateCol: org.apache.spark.sql.Column): DataFrame = {
    val days = graft.util.Caches.persistTracked(
      df.select(to_date(dateCol).as("day"))
        .filter(col("day").isNotNull).distinct())
    val mm = days.agg(min(col("day")).as("__mn"),
      max(col("day")).as("__mx"))
    mm.select(explode(sequence(col("__mn"), col("__mx"))).as("day"))
      .join(days, Seq("day"), "left_anti")
      .select(col("day").as("missing_day"))
  }

  /** D17: SCHEMA-DRIFT REPORT between two versions of a table — the
    * first thing to check when a downstream job breaks after an
    * upstream "harmless" change: per column, whether it was added /
    * removed / type-changed / kept, the type on each side, and the
    * NULL-rate on each side with its delta (a column that silently
    * went 40% NULL drifts without any schema change at all).
    *
    * Shape: the column census is driver-side METADATA (schemas are
    * KB-scale whatever the data volume); null rates are ONE aggregate
    * pass per side (count + per-column counts, map-side combined).
    * Exact counts, one division each. Output: one row per column in
    * either schema — (column, status, type_old, type_new,
    * null_rate_old, null_rate_new, null_rate_delta), sorted by
    * column; rates NULL for the absent side. */
  def schemaDrift(oldDf: DataFrame, curDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    def types(df: DataFrame): Map[String, String] =
      df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    def nullRates(df: DataFrame): Map[String, Double] = {
      val cols = df.columns.toSeq
      val row = df.agg(count(lit(1)).as("__n"),
        cols.map(c => count(col(c)).as(s"__c_$c")): _*).head()
      val n = row.getAs[Long]("__n")
      cols.map(c => c -> (if (n == 0) 0.0
        else (n - row.getAs[Long](s"__c_$c")).toDouble / n)).toMap
    }
    val (to, tc) = (types(oldDf), types(curDf))
    val (ro, rc) = (nullRates(oldDf), nullRates(curDf))
    val all = (to.keySet ++ tc.keySet).toSeq.sorted
    all.map { c =>
      val status = (to.get(c), tc.get(c)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _ => "kept"
      }
      (c, status, to.get(c), tc.get(c), ro.get(c), rc.get(c),
        for { a <- ro.get(c); b <- rc.get(c) } yield b - a)
    }.toDF("column", "status", "type_old", "type_new",
      "null_rate_old", "null_rate_new", "null_rate_delta")
  }

  /** D33: NULL-RATE DRIFT TEST per column (two-proportion z — public
    * knowledge) — the SIGNIFICANCE companion of [[schemaDrift]]'s
    * null-rate delta: "value went 0.3% → 0.5% NULL; is that a real
    * upstream change at this n, or noise?" — the schema-rot alarm a
    * raw delta can't threshold (the same delta is damning at 10⁹ rows
    * and meaningless at 10³). Per declared column: both sides' exact
    * (n, nulls), pooled p̄, `z = (p̂_cur − p̂_ref)/√(p̄(1−p̄)(1/n_r+1/n_c))`,
    * two-sided p via the A&S 26.2.17 polynomial.
    *
    * Shape: ONE map-side-combined aggregate pass per side (count +
    * per-column counts — the schemaDrift pass), then k rows of driver
    * arithmetic (column census is metadata-scale whatever the data
    * volume); every count exact, z/p fixed IEEE trees mirrored by the
    * oracle, published q6. Degenerate columns (both sides all-NULL or
    * no NULLs anywhere ⇒ p̄ ∈ {0,1}, or an empty side) emit NULL z/p.
    * Output per column: (column, n_ref, null_ref, n_cur, null_cur,
    * rate_ref, rate_cur, delta, z, p), sorted by column. */
  def nullRateDriftTest(reference: DataFrame, current: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullRateDriftTest: need >= 1 column")
    for (c <- cols; (df, side) <- Seq(reference -> "reference",
        current -> "current"))
      require(df.columns.contains(c),
        s"nullRateDriftTest: column $c missing from the $side side")
    val spark = reference.sparkSession
    val (nr, mr) = nullCounts(reference, cols)
    val (nc, mc) = nullCounts(current, cols)
    nullRateDriftFinish(spark,
      cols.map(c => (c, nr, mr(c), nc, mc(c))))
  }

  /** The [[nullRateDriftTest]] counts pass: ONE map-side-combined
    * aggregate — (total rows, per-column null counts). Package-private
    * so the streaming null-rate cell sink persists the identical
    * counters. */
  private[graft] def nullCounts(df: DataFrame, cols: Seq[String])
      : (Long, Map[String, Long]) = {
    val row = df.agg(count(lit(1)).as("__n"),
      cols.map(c => (count(lit(1)) - count(col(c))).as(s"__m_$c")): _*)
      .head()
    (row.getAs[Long]("__n"),
      cols.map(c => c -> row.getAs[Long](s"__m_$c")).toMap)
  }

  /** The [[nullRateDriftTest]] finish over per-column count cells
    * (column, n_ref, null_ref, n_cur, null_cur) — every input an exact
    * mergeable integer, so a streaming store sums per-batch cells and
    * reuses this verbatim (the *FromCells discipline). */
  private[graft] def nullRateDriftFinish(
      spark: org.apache.spark.sql.SparkSession,
      cells: Seq[(String, Long, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    def q6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    cells.sortBy(_._1).map { case (c, nr, a, nc, b) =>
      val rateR = if (nr > 0) Some(q6d(a.toDouble / nr.toDouble)) else None
      val rateC = if (nc > 0) Some(q6d(b.toDouble / nc.toDouble)) else None
      val zp: Option[(Double, Double)] =
        if (nr == 0 || nc == 0) None
        else {
          val pooled = (a + b).toDouble / (nr + nc).toDouble
          if (pooled <= 0.0 || pooled >= 1.0) None
          else {
            // the operand order is the ORACLE CONTRACT — mirrored
            // verbatim in SQL so both engines walk the same IEEE tree
            val se = math.sqrt(pooled * (1.0 - pooled) *
              (1.0 / nr.toDouble + 1.0 / nc.toDouble))
            val z = (b.toDouble / nc.toDouble -
              a.toDouble / nr.toDouble) / se
            val az = math.abs(z)
            val t = 1.0 / (1.0 + 0.2316419 * az)
            val poly = ((((1.330274429 * t + -1.821255978) * t +
              1.781477937) * t + -0.356563782) * t + 0.319381530) * t
            val p = 2.0 *
              (math.exp(-(az * az) / 2.0) / 2.5066282746310002) * poly
            Some((q6d(z), q6d(math.min(p, 1.0))))
          }
        }
      (c, nr, a, nc, b, rateR, rateC,
        for { x <- rateR; y <- rateC } yield q6d(y - x),
        zp.map(_._1), zp.map(_._2))
    }.toDF("column", "n_ref", "null_ref", "n_cur", "null_cur",
      "rate_ref", "rate_cur", "delta", "z", "p")
  }

  /** D18: KEY-UNIQUENESS REPORT — "is this really a primary key": one
    * row with exact row/key counts, how many key values repeat, how
    * many rows sit in repeated keys, and the worst multiplicity. The
    * check every SCD2/star load assumes and almost nobody runs; a
    * single duplicated entity id fans out through every downstream
    * join. One groupBy + one aggregate (map-side combined); NULL key
    * components count as a key value (they collide in joins too —
    * that is the point of surfacing them). */
  def uniquenessReport(df: DataFrame, keyCols: Seq[String])
      : DataFrame = {
    require(keyCols.nonEmpty, "uniquenessReport: no key columns")
    val perKey = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    perKey.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
      coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)),
        lit(0L)).as("n_dup_rows"),
      coalesce(max(col("__n")), lit(0L)).as("max_multiplicity"))
      .withColumn("is_unique", col("n_dup_keys") === 0)
  }

  /** D19: LOAD RECONCILIATION — per-partition row counts of a source
    * vs its loaded target, with the pass decision in EXACT integer
    * cross-multiplication: |n_dst − n_src| · den ≤ n_src · num (a
    * float relative-diff threshold flaps at the boundary; integers
    * cannot). The "did the load lose a partition" check that catches
    * both a missing day (n_dst = 0) and a double-load (n_dst = 2×).
    *
    * Shape: one count aggregate per side + a keys-sized FULL OUTER
    * join — absent keys coalesce to 0 on the missing side so a
    * partition present in only one table is a reported row, never a
    * dropped one. Output per key: (key, n_src, n_dst, diff,
    * rel_diff, passed). */
  def reconcileCounts(src: DataFrame, dst: DataFrame,
      keyCol: org.apache.spark.sql.Column, tolNum: Int = 0,
      tolDen: Int = 1): DataFrame = {
    require(tolDen >= 1 && tolNum >= 0,
      s"need tolNum >= 0 and tolDen >= 1, got $tolNum/$tolDen")
    def cnt(df: DataFrame, as: String) =
      df.select(keyCol.cast("string").as("key"))
        .groupBy(col("key")).agg(count(lit(1)).as(as))
    cnt(src, "__ns").join(cnt(dst, "__nd"), Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("__ns"), lit(0L)).as("n_src"),
        coalesce(col("__nd"), lit(0L)).as("n_dst"))
      .withColumn("diff", col("n_dst") - col("n_src"))
      .withColumn("rel_diff",
        when(col("n_src") > 0,
          abs(col("diff")).cast("double") / col("n_src").cast("double")))
      .withColumn("passed",
        abs(col("diff")) * tolDen <= col("n_src") * tolNum ||
          col("diff") === 0)
  }

  /** D20: FRESHNESS REPORT — per-group staleness of a timestamped
    * feed against an explicit `asOf` instant (PASSED IN, never
    * `now()` — reruns must reproduce): latest event time, hours since,
    * and the stale flag at `maxLagHours`. The "which sources stopped
    * writing" dashboard; one aggregate, exact epoch-second integer
    * arithmetic. Output: (group, n_rows, latest_ts, lag_hours,
    * is_stale). */
  def freshnessReport(df: DataFrame,
      groupCol: org.apache.spark.sql.Column,
      tsCol: org.apache.spark.sql.Column, asOf: String,
      maxLagHours: Long): DataFrame = {
    require(maxLagHours >= 0, s"maxLagHours must be >= 0, got $maxLagHours")
    // Exact epoch-MICROsecond arithmetic (timestamps carry micros;
    // second truncation mis-floors boundary rows). `(d - pmod(d,u))/u`
    // is exact integer FLOOR division — floor, not truncate-toward-
    // zero, so future-dated rows get a negative lag, not 0.
    val us = lit(3600000000L) // micros per hour
    val diff = unix_micros(lit(asOf).cast("timestamp")) -
      unix_micros(col("latest_ts"))
    df.groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n_rows"), max(tsCol).as("latest_ts"))
      .withColumn("lag_hours",
        ((diff - pmod(diff, us)) / us).cast("long"))
      .withColumn("is_stale", col("lag_hours") > maxLagHours)
  }

  /** D23: JOIN-FANOUT ESTIMATOR — the EXACT output cardinality of an
    * equi-join computed WITHOUT running it: `|A ⋈ B| = Σ_k c_A(k)·c_B(k)`
    * over per-key counts. The pre-flight check before any 100 TB join —
    * a duplicated key on both sides multiplies, and this report names
    * the key that would explode the job before the shuffle is paid.
    *
    * Exactness: per-key counts are one groupBy each; products and the
    * total are DECIMAL(38,0) (two billion-row hot keys multiply to
    * 10¹⁸·10¹⁸ — LONGs overflow); the hottest key is `max(struct(rows,
    * key))` — deterministic under ties, unlike max_by. NULL keys never
    * match in SQL equi-joins and are censused separately, not counted
    * into the output estimate. Output: 1 row (left_rows, right_rows,
    * left_null_keys, right_null_keys, matched_keys, output_rows,
    * max_key, max_rows, amplification = output/max(left,right)). */
  def joinFanout(left: DataFrame, right: DataFrame,
      leftKey: org.apache.spark.sql.Column,
      rightKey: org.apache.spark.sql.Column): DataFrame = {
    def cnt(df: DataFrame, k: org.apache.spark.sql.Column, as: String) =
      df.select(k.cast("string").as("key"))
        .groupBy(col("key")).agg(count(lit(1)).as(as))
    val l = cnt(left, leftKey, "__cl")
    val r = cnt(right, rightKey, "__cr")
    val joined = l.filter(col("key").isNotNull)
      .join(r.filter(col("key").isNotNull), Seq("key"), "inner")
      .withColumn("__prod",
        col("__cl").cast("decimal(38,0)") * col("__cr").cast("decimal(38,0)"))
    val nulls = l.filter(col("key").isNull)
      .agg(coalesce(sum(col("__cl")), lit(0L)).as("left_null_keys"))
      .crossJoin(r.filter(col("key").isNull)
        .agg(coalesce(sum(col("__cr")), lit(0L)).as("right_null_keys")))
    val sides = left.agg(count(lit(1)).as("left_rows"))
      .crossJoin(right.agg(count(lit(1)).as("right_rows")))
    val agg = joined.agg(
      count(lit(1)).as("matched_keys"),
      coalesce(sum(col("__prod")), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")).as("output_rows"),
      max(struct(col("__prod").as("rows"), col("key"))).as("__mx"))
    sides.crossJoin(broadcast(nulls)).crossJoin(broadcast(agg))
      .select(col("left_rows"), col("right_rows"),
        col("left_null_keys"), col("right_null_keys"),
        col("matched_keys"),
        col("output_rows"),
        col("__mx.key").as("max_key"),
        col("__mx.rows").as("max_rows"),
        graft.functions.q6(col("output_rows").cast("double") /
          greatest(col("left_rows"), col("right_rows")).cast("double"))
          .as("amplification"))
  }

  /** D21: BENFORD FIRST-DIGIT TEST (Benford 1938; Nigrini 2012 — the
    * standard forensic-accounting screen): the observed share of each
    * leading significant digit 1–9 against `log10(1 + 1/d)`, with the
    * Pearson χ² statistic over counts and Nigrini's MAD broadcast on
    * every row. Natural multi-scale amounts follow Benford; invented
    * or capped numbers don't.
    *
    * Digit extraction is DETERMINISTIC across engines: the value is
    * fixed to cents by `floor(|x|·100 + 0.5)` (exact IEEE ops) and the
    * leading digit read from the BIGINT's decimal string — no
    * log10/pow on doubles, whose 1-ulp disagreements flip digits at
    * power-of-ten boundaries. Rows whose scaled value is 0 (|x| <
    * 0.005) or NULL are excluded and reported in `n_skipped`.
    *
    * Determinism: digit counts are exact BIGINTs joined onto a
    * literal 1–9 spine (zero-count digits still emit rows); χ² and
    * MAD sum 9 quantized-6 terms as scaled LONGs (order-free);
    * shares/expectations are fixed IEEE trees quantized-6.
    *
    * 100 TB: one map-side-combined groupBy on 9 keys; the spine and
    * the 1-row totals are broadcast. Output: (digit, n, share,
    * expected, chi2, mad, n_used, n_skipped), one row per digit. */
  def benfordTest(df: DataFrame,
      valueCol: org.apache.spark.sql.Column): DataFrame = {
    val scaled = df.select(
      floor(abs(valueCol.cast("double")) * lit(100.0) + lit(0.5))
        .cast("long").as("__cents"))
    val digits = scaled.select(
      when(col("__cents") > 0,
        substring(col("__cents").cast("string"), 1, 1).cast("int"))
        .as("digit"))
    benfordFromCounts(digits.groupBy(col("digit"))
      .agg(count(lit(1)).as("__n")))
  }

  /** The [[benfordTest]] kernel over an already-counted digit table
    * (`digit` nullable INT — NULL rows are the skipped census — and a
    * `__n` BIGINT). Digit counts are exact and mergeable, which is what
    * lets the streaming monitor sum per-batch tables and publish the
    * identical statistic. */
  def benfordFromCounts(counted: DataFrame): DataFrame = {
    val spark = counted.sparkSession
    val spine = spark.range(1, 10).select(col("id").cast("int").as("digit"))
    val perDigit = spine.join(counted.filter(col("digit").isNotNull),
        Seq("digit"), "left")
      .select(col("digit"), coalesce(col("__n"), lit(0L)).as("n"))
    val totals = counted.agg(
      coalesce(sum(when(col("digit").isNotNull, col("__n"))), lit(0L))
        .as("__n_used"),
      coalesce(sum(when(col("digit").isNull, col("__n"))), lit(0L))
        .as("__n_skipped"))
    val nUsed = col("__n_used").cast("double")
    val share = col("n").cast("double") / nUsed
    val expected = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    // χ² term over counts: (n_d − N·e_d)² / (N·e_d); MAD term over
    // shares — each quantized-6 into a LONG so the 9-term sums are
    // aggregation-order-free.
    val chiTerm = (col("n").cast("double") - nUsed * expected) *
      (col("n").cast("double") - nUsed * expected) / (nUsed * expected)
    val terms = perDigit.crossJoin(broadcast(totals))
      .withColumn("share", graft.functions.q6(share))
      .withColumn("expected", graft.functions.q6(expected))
      .withColumn("__chi_scaled",
        floor(chiTerm * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("__mad_scaled",
        floor(abs(share - expected) * lit(1e6) + lit(0.5)).cast("long"))
    val stats = terms.agg(
      sum(col("__chi_scaled")).as("__chi_tot"),
      sum(col("__mad_scaled")).as("__mad_tot"))
    terms.crossJoin(broadcast(stats))
      .select(col("digit"), col("n"), col("share"), col("expected"),
        (col("__chi_tot").cast("double") / lit(1e6)).as("chi2"),
        (col("__mad_tot").cast("double") / lit(1e6) / lit(9.0)).as("mad"),
        col("__n_used").as("n_used"), col("__n_skipped").as("n_skipped"))
  }

  /** D22: FUNCTIONAL-DEPENDENCY VIOLATION REPORT — does `determinant →
    * dependent` hold, and how badly not (Huhtala et al. 1999, TANE's
    * g3 error: the minimum number of rows to delete so the FD holds =
    * `Σ_groups (n_group − max single-dependent count)`). The schema-
    * design / upstream-join-fanout audit: "is order status really a
    * function of order key?".
    *
    * Exact integers end to end: one groupBy on (determinant,
    * dependent), re-aggregated per determinant (max/sum/count over the
    * CELL table — never a second data pass), one final 1-row
    * aggregate. NULL determinant/dependent values group as values.
    * Output (1 row): n_rows, n_groups, n_violating_groups, g3_rows,
    * g3_rate (quantized-6), fd_holds. */
  def fdViolations(df: DataFrame, determinant: Seq[String],
      dependent: String): DataFrame = {
    require(determinant.nonEmpty, "need at least one determinant column")
    val cells = df.groupBy((determinant :+ dependent).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val groups = cells.groupBy(determinant.map(col): _*)
      .agg(sum(col("__n")).as("__rows"), max(col("__n")).as("__max"),
        count(lit(1)).as("__vals"))
    groups.agg(
      sum(col("__rows")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      coalesce(sum(when(col("__vals") > 1, 1L)), lit(0L))
        .as("n_violating_groups"),
      sum(col("__rows") - col("__max")).as("g3_rows"))
      .select(col("n_rows"), col("n_groups"), col("n_violating_groups"),
        col("g3_rows"),
        graft.functions.q6(col("g3_rows").cast("double") /
          col("n_rows").cast("double")).as("g3_rate"),
        (col("g3_rows") === 0).as("fd_holds"))
  }
}
