package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed RANK-BASED statistics — Spearman's ρ, Kruskal–Wallis H,
  * Mann–Whitney U — computed without ever ranking the data rows.
  *
  * The classic implementations sort the raw relation (a global-order
  * window: the scale-killer). Every statistic here needs only RANK
  * SUMS, and the average rank of a tied value is a function of the
  * counts of smaller values alone — so all three operators aggregate
  * to the DISTINCT-VALUE grid first (one map-side-combined groupBy of
  * the data), then rank the grid:
  *
  *   - grouped marginals rank under `Window.partitionBy(group)` whose
  *     partitions are sized by VALUE CARDINALITY, not row count;
  *   - pooled (global) ranks use the two-phase
  *     [[graft.relational.Ranks.prefixSums]] (never a partition-less
  *     window).
  *
  * Doubled average ranks `r2 = 2·(#smaller) + (#ties) + 1` keep every
  * rank an INTEGER (the ½s of midranks never appear), so all rank
  * sums are exact DECIMAL(38,0)/LONG arithmetic; the final statistic
  * is one fixed IEEE double tree over exact operands, quantized-6 —
  * reproducible bit-for-bit across engines.
  *
  * 100 TB: cost is one shuffle to the distinct grid plus grid-sized
  * joins; the data relation is touched once. Public formulas:
  * Spearman 1904; Kruskal & Wallis 1952; Mann & Whitney 1947; normal
  * approximation with tie correction per Lehmann, "Nonparametrics". */
object RankTests {

  private val D = "decimal(38,0)"

  /** F47: SPEARMAN RANK CORRELATION per group between two columns.
    *
    * Rows collapse to `(group, x, y)` cells; X-marginal doubled
    * midranks come from a cumulative count over the per-group distinct
    * X values (ditto Y), and every moment Σu, Σv, Σuv, Σu², Σv² is a
    * cell-count-weighted DECIMAL(38,0) sum. ρ is the Pearson formula
    * over the doubled ranks (the ×2 cancels). NULL x/y rows are
    * excluded (engines disagree on NULL sort order); groups with < 2
    * rows or a constant side emit NULL rho.
    *
    * Exactness bound: moments stay under 4n⁴ — inside DECIMAL(38,0)
    * to n ≈ 10⁹ rows per group. Output: (group, n, rho). */
  def spearman(df: DataFrame, group: Column, x: Column, y: Column)
      : DataFrame = {
    val cells = df
      .filter(x.isNotNull && y.isNotNull)
      .select(group.as("g"), x.as("x"), y.as("y"))
      .groupBy(col("g"), col("x"), col("y"))
      .agg(count(lit(1)).as("n_xy"))
    def marginal(vc: String, rankName: String): DataFrame = {
      val w = Window.partitionBy(col("g")).orderBy(col(vc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // partition = one GROUP's distinct values of one column —
      // value-cardinality-bounded, not data-bounded
      cells.groupBy(col("g"), col(vc))
        .agg(sum(col("n_xy")).as("c"))
        .withColumn("__cum", sum(col("c")).over(w))
        .select(col("g"), col(vc),
          (lit(2L) * (col("__cum") - col("c")) + col("c") + lit(1L))
            .cast(D).as(rankName))
    }
    val joined = cells
      .join(marginal("x", "rx"), Seq("g", "x"))
      .join(marginal("y", "ry"), Seq("g", "y"))
    val nD = col("n_xy").cast(D)
    val agg = joined.groupBy(col("g")).agg(
      sum(col("n_xy")).as("n"),
      sum(nD * col("rx")).as("__su"),
      sum(nD * col("ry")).as("__sv"),
      sum(nD * col("rx") * col("ry")).as("__suv"),
      sum(nD * col("rx") * col("rx")).as("__suu"),
      sum(nD * col("ry") * col("ry")).as("__svv"))
    val n = col("n").cast("double")
    def d(s: String) = col(s).cast("double")
    val num = n * d("__suv") - d("__su") * d("__sv")
    val varU = n * d("__suu") - d("__su") * d("__su")
    val varV = n * d("__svv") - d("__sv") * d("__sv")
    agg.select(col("g"), col("n"),
      graft.functions.q6(when(col("n") > 1 && varU > 0 && varV > 0,
        num / (sqrt(varU) * sqrt(varV)))).as("rho"))
  }

  /** F48: KRUSKAL–WALLIS H — the rank one-way ANOVA across k groups.
    *
    * Pooled doubled midranks come from the two-phase prefix sum over
    * the DISTINCT-VALUE count table (no global-order window); each
    * group's rank sum R2_g is an exact DECIMAL(38,0) count-weighted
    * sum. The k per-group terms (R2_g/2)²/n_g are summed by an
    * ORDERED cumulative window over the k-row GROUP table (addition
    * order = group order, identical in both engines — the
    * [[graft.events.Resample.kmFromSpans]] discipline; floor-scaled
    * LONGs would overflow here, the terms grow ~n_g·N²), and the tie
    * correction Σ(t³−t)/(N³−N) is exact DECIMAL. The group-ordered
    * window is global but BOUNDED: one row per distinct group.
    * Output 1 row: (n, k, dof, h, tie_c, h_adj). */
  def kruskalWallis(df: DataFrame, group: Column, value: Column)
      : DataFrame = {
    val rows = df.filter(value.isNotNull)
      .select(group.as("g"), value.as("v"))
    val byValue = rows.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val ranked = graft.relational.Ranks
      .prefixSums(byValue, Seq(col("v")), Seq("__cum" -> col("c")))
      .select(col("v"),
        (lit(2L) * (col("__cum") - col("c")) + col("c") + lit(1L))
          .as("r2"),
        col("c"))
    val perGroupValue = rows.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("n_gv"))
    val perGroup = perGroupValue.join(ranked, Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("n_gv")).as("n_g"),
        sum(col("n_gv").cast(D) * col("r2").cast(D)).as("__r2g"))
    // (R2_g/2)²/n_g as a fixed IEEE tree per group; summed by the
    // ordered k-row cumulative window so the cross-group addition
    // order is pinned (bounded: one row per group)
    val term = col("__r2g").cast("double") * col("__r2g").cast("double") /
      (lit(4.0) * col("n_g").cast("double"))
    val wG = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perGroup.withColumn("__ct", sum(term).over(wG)).agg(
      sum(col("n_g")).as("n"),
      count(lit(1)).as("k"),
      max_by(col("__ct"), col("g")).as("__st"))
    val ties = ranked.agg(
      coalesce(sum(col("c").cast(D) * col("c").cast(D) * col("c").cast(D)
        - col("c").cast(D)), lit(0).cast(D)).as("__t3"))
    val nn = col("n").cast("double")
    val h = lit(12.0) / (nn * (nn + lit(1.0))) * col("__st") -
      lit(3.0) * (nn + lit(1.0))
    val tieC = lit(1.0) - col("__t3").cast("double") /
      (nn * nn * nn - nn)
    totals.crossJoin(broadcast(ties)).select(
      col("n"), col("k"), (col("k") - lit(1L)).as("dof"),
      graft.functions.q6(when(col("n") > 1, h)).as("h"),
      graft.functions.q6(when(col("n") > 1, tieC)).as("tie_c"),
      graft.functions.q6(when(col("n") > 1 && tieC > 0, h / tieC))
        .as("h_adj"))
  }

  /** F49: MANN–WHITNEY U between two arms (`variant` 0/1) with the
    * tie-corrected normal approximation — the nonparametric two-sample
    * test ([[graft.ml.Eval.rocAuc]] reports the same U as an AUC; this
    * emits the TEST: U, z, and a two-sided p).
    *
    * Same distinct-value discipline as [[kruskalWallis]]: per-value
    * arm counts, two-phase pooled midranks, exact DECIMAL rank sums.
    * `U₁ = R₁ − n₁(n₁+1)/2` stays in doubled-integer form until one
    * final halving (exact — halves are representable). σ² carries
    * Lehmann's tie term `n₁n₂/12·[(N+1) − Σ(t³−t)/(N(N−1))]`; the
    * two-sided p uses the Abramowitz–Stegun 26.2.17 polynomial (the
    * [[graft.dq.Stats.bhFdr]] CDF). Degenerate inputs (an empty arm,
    * or all values tied ⇒ σ = 0) emit NULL z/p.
    * Output 1 row: (n0, n1, u1, u0, z, p). */
  def mannWhitney(df: DataFrame, variant: Column, value: Column)
      : DataFrame = {
    val rows = df.filter(value.isNotNull)
      .select(variant.cast("int").as("arm"), value.as("v"))
    val byValue = rows.groupBy(col("v")).agg(
      count(lit(1)).as("c"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"))
    val ranked = graft.relational.Ranks
      .prefixSums(byValue, Seq(col("v")), Seq("__cum" -> col("c")))
      .select(col("v"), col("c"), col("c1"),
        (lit(2L) * (col("__cum") - col("c")) + col("c") + lit(1L))
          .as("r2"))
    val agg = ranked.agg(
      coalesce(sum(col("c") - col("c1")), lit(0L)).as("n0"),
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c1").cast(D) * col("r2").cast(D)),
        lit(0).cast(D)).as("__r21"),
      coalesce(sum(col("c").cast(D) * col("c").cast(D) * col("c").cast(D)
        - col("c").cast(D)), lit(0).cast(D)).as("__t3"))
    val n0 = col("n0").cast("double")
    val n1 = col("n1").cast("double")
    val nn = n0 + n1
    // u1 from the doubled rank sum: 2·U₁ = R2₁·/1 − ... kept exact:
    // R2₁ = 2·R₁ so U₁ = (R2₁ − n₁(n₁+1)) / 2 — halves are exact
    val u1 = (col("__r21").cast("double") -
      n1 * (n1 + lit(1.0))) / lit(2.0)
    val u0 = n0 * n1 - u1
    val mu = n0 * n1 / lit(2.0)
    val sig2 = n0 * n1 / lit(12.0) *
      ((nn + lit(1.0)) -
        col("__t3").cast("double") / (nn * (nn - lit(1.0))))
    val z = (u1 - mu) / sqrt(sig2)
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val ok = col("n0") > 0 && col("n1") > 0 && sig2 > 0
    agg.select(col("n0"), col("n1"),
      graft.functions.q6(when(col("n0") > 0 && col("n1") > 0, u1))
        .as("u1"),
      graft.functions.q6(when(col("n0") > 0 && col("n1") > 0, u0))
        .as("u0"),
      graft.functions.q6(when(ok, z)).as("z"),
      graft.functions.q6(when(ok, least(pTwo, lit(1.0)))).as("p"))
  }

  /** F78: JONCKHEERE–TERPSTRA ORDERED-ALTERNATIVE TEST (Terpstra 1952,
    * Jonckheere 1954 — public knowledge): across k ORDERED groups
    * (doses, quality buckets, model sizes), is the metric trending
    * monotonically? `J = Σ_{i<j} U_ij` pools every pairwise
    * Mann–Whitney in the group order, so a consistent small lift at
    * each step — invisible to [[kruskalWallis]]'s any-difference
    * alternative — accumulates. The "does quality improve WITH the
    * knob" test.
    *
    * Exactness + scale: one distinct-value aggregate carries a count
    * column PER GROUP (k collected up front, fail-loud past
    * `maxGroups` — group identities are k-bounded metadata, the X166
    * convention); ONE two-phase prefix-sum call ranks all k columns
    * over the value order (no global window, no k² passes); the
    * DOUBLED statistic `2U_ij = Σ_v n_j(v)·(2·below_i(v) + n_i(v))`
    * (ties weigh ½) stays an exact integer in DECIMAL. The null
    * moments `E[J] = (N²−Σn_i²)/4` and
    * `Var[J] = (N²(2N+3) − Σn_i²(2n_i+3))/72` (tie-uncorrected —
    * documented approximation, standard form) are fixed IEEE trees
    * over exact integers; only z is published quantized. Output:
    * 1 row — (n, k, j2 fail-loud BIGINT, z). */
  def jonckheereTerpstra(df: DataFrame, group: Column, value: Column,
      maxGroups: Int = 16): DataFrame = {
    // the ordered-trend statistic is DEFINED on integer group levels:
    // fail loud when the cast loses information — a non-numeric label
    // casts to NULL (would NPE at the collect below) and a fractional
    // level silently truncates (0.2 and 0.9 both become level 0,
    // merging groups and corrupting J without error)
    val gLong = group.cast("long")
    val base = df.filter(value.isNotNull && group.isNotNull)
      .select(
        when(gLong.isNull || gLong.cast("double") =!= group.cast("double"),
          raise_error(lit("jonckheereTerpstra: group label is not " +
            "an exact integer level — map labels to ordered " +
            "integers explicitly")))
          .otherwise(gLong).as("__g"),
        value.as("__v"))
    val groups = base.select(col("__g")).distinct()
    val k = groups.count()
    require(k >= 2, s"jonckheereTerpstra: need >= 2 groups, got $k")
    require(k <= maxGroups,
      s"jonckheereTerpstra: $k groups > maxGroups=$maxGroups")
    val gs: Seq[Long] = groups.collect().map(_.getLong(0)).sorted.toSeq
    jtFromValueCells(jtValueCells(base, gs), gs)
  }

  /** The per-distinct-value group-count aggregate of
    * [[jonckheereTerpstra]] — `(__v, __n0 … __n{k−1})` over a FIXED
    * ordered group list. Counts are exact integers, so per-batch
    * persisted cell tables merge by value-keyed addition — the
    * streaming monitor's contract. Input must already carry the
    * guarded `(__g, __v)` projection. */
  private[graft] def jtValueCells(base: DataFrame, gs: Seq[Long])
      : DataFrame =
    base.groupBy(col("__v")).agg(
      sum(when(col("__g") === gs.head, 1L).otherwise(0L))
        .as(s"__n0"),
      gs.tail.zipWithIndex.map { case (g, i) =>
        sum(when(col("__g") === g, 1L).otherwise(0L)).as(s"__n${i + 1}")
      }: _*)

  /** The [[jonckheereTerpstra]] finish over an already-aggregated
    * value-cell table — shared verbatim by the batch test and the
    * streaming view. */
  private[graft] def jtFromValueCells(counts: DataFrame, gs: Seq[Long])
      : DataFrame = {
    val k = gs.length.toLong
    val ranked = graft.relational.Ranks.prefixSums(counts,
      Seq(col("__v")),
      gs.indices.map(i => s"__cum$i" -> col(s"__n$i")))
    // doubled pairwise contributions, all i<j in group order, summed
    // order-free in DECIMAL
    val j2terms = (for {
      i <- gs.indices; j <- gs.indices if i < j
    } yield col(s"__n$j").cast(D) *
      (lit(2L) * (col(s"__cum$i") - col(s"__n$i")) + col(s"__n$i"))
        .cast(D)).reduce(_ + _)
    val aggCols = Seq(coalesce(sum(j2terms), lit(0).cast(D)).as("__j2")) ++
      gs.indices.map(i =>
        coalesce(sum(col(s"__n$i")), lit(0L)).as(s"__t$i"))
    val agg = ranked.agg(aggCols.head, aggCols.tail: _*)
    val nTot = gs.indices.map(i => col(s"__t$i")).reduce(_ + _)
    val sumSq = gs.indices.map(i =>
      (col(s"__t$i") * col(s"__t$i")).cast(D)).reduce(_ + _)
    val sumSq23 = gs.indices.map(i =>
      (col(s"__t$i") * col(s"__t$i") *
        (lit(2L) * col(s"__t$i") + lit(3L))).cast(D)).reduce(_ + _)
    val nD = nTot.cast("double")
    val e2 = (nD * nD - sumSq.cast("double")) / lit(2.0)
    val v = (nD * nD * (lit(2.0) * nD + lit(3.0)) -
      sumSq23.cast("double")) / lit(72.0)
    val z = (col("__j2").cast("double") - e2) / (lit(2.0) * sqrt(v))
    def pubLong(c: Column, what: String) =
      when(c > lit(Long.MaxValue).cast(D),
        raise_error(lit(s"jonckheereTerpstra: $what overflows BIGINT")))
        .otherwise(c.cast("long"))
    agg.select(nTot.as("n"), lit(k).as("k"),
      pubLong(col("__j2"), "doubled statistic").as("j2"),
      graft.functions.q6(when(v > 0, z)).as("z"))
  }

  /** F82: FRIEDMAN TEST (Friedman 1937, public knowledge) — the
    * nonparametric REPEATED-MEASURES one-way: k treatments measured on
    * the SAME n blocks (k models scored on the same prompts, k
    * pipeline variants on the same shards). [[kruskalWallis]] assumes
    * independent groups and is wrong for matched designs — blocking
    * removes the between-block variance, exactly like [[graft.ml
    * .Eval]]'s Cochran's Q does for binary outcomes (Friedman is its
    * graded-response generalization; at k=2 it collapses to the sign
    * test's χ²).
    *
    * Exactness + scale: ranks are WITHIN-block, so every window
    * partition is one block's k cells — k-bounded, never data-sized;
    * doubled midranks keep ranks integral under ties; the
    * tie-corrected statistic (Conover's form)
    * `χ² = (k−1)·Σ_j (R2_j − n(k+1))² / (Σ_cells r2² − n·k·(k+1)²)`
    * has an exact-DECIMAL numerator and denominator (order-free
    * integer sums; the doubling cancels — both carry a factor 4), one
    * IEEE division at the end, published q6. Fails loud on NULLs, a
    * duplicate (block, treatment) observation, or an incomplete block
    * (a silent drop would bias R_j — the classic Friedman footgun).
    * All-tied blocks everywhere ⇒ denominator 0 ⇒ NULL chi2.
    * Output 1 row: (n_blocks, k, dof, chi2). */
  def friedman(df: DataFrame, block: Column, treatment: Column,
      value: Column): DataFrame = {
    val cells = friedmanGuardedCells(df, block, treatment, value)
    val cellR = friedmanRankedCells(cells)
    // the per-block completeness guard rides the per-block recount
    // (unchanged); n = block count with the guard fused into its plan
    val kRow = broadcast(cells.agg(
      countDistinct(col("__t")).as("__k")))
    val nRow = cellR.groupBy(col("__b"))
      .agg(count(lit(1)).as("__nb"))
      .crossJoin(kRow)
      .select(when(col("__nb") =!= col("__k"),
        raise_error(lit("friedman: incomplete block — every block " +
          "needs one observation of every treatment")))
        .otherwise(lit(1L)).as("__one"))
      .agg(coalesce(sum(col("__one")), lit(0L)).as("__n"))
    // per-treatment cells: Σ_cells r2² regrouped by treatment instead
    // of by block — the same exact-DECIMAL cell set, order-free — so
    // the finish is shared verbatim with the streaming cell store
    val perT = cellR.groupBy(col("__t"))
      .agg(sum(col("__r2").cast(D)).as("__R2"),
        sum((col("__r2") * col("__r2")).cast(D)).as("__sr2"))
      .crossJoin(broadcast(nRow))
      .select(col("__t"), col("__n"), col("__R2"), col("__sr2"))
    friedmanFromTreatmentCells(perT)
  }

  /** The [[friedman]] guard front: NULL block/treatment/value and
    * out-of-grid values fail loud; exactly one observation per (block,
    * treatment) — values on the DECIMAL(18,6) grid (the cusumFromDaily
    * normalization contract): a double cast would midrank-tie integer
    * values past 2^53 — exactly the micro-scaled LONG sums callers
    * feed this — while an exact-typed oracle distinguishes them.
    * Returns (__b, __t, __v). */
  private[graft] def friedmanGuardedCells(df: DataFrame, block: Column,
      treatment: Column, value: Column): DataFrame = {
    val vd = value.cast("decimal(18,6)")
    val rows = df.select(block.as("__b"), treatment.as("__t"),
      when(block.isNull || treatment.isNull || value.isNull,
        raise_error(lit("friedman: NULL block/treatment/value")))
        .when(vd.isNull,
          raise_error(lit("friedman: value outside the " +
            "DECIMAL(18,6) grid — rescale first")))
        .otherwise(vd).as("__v"))
    rows.groupBy(col("__b"), col("__t"))
      .agg(count(lit(1)).as("__c"), min(col("__v")).as("__v0"))
      .select(col("__b"), col("__t"),
        when(col("__c") > 1, raise_error(
          lit("friedman: duplicate (block, treatment) observation")))
          .otherwise(col("__v0")).as("__v"))
  }

  /** WITHIN-BLOCK doubled midranks over [[friedmanGuardedCells]]
    * output: partition = ONE block's distinct values (≤ k rows), never
    * data-sized. Returns (__b, __t, __v, __r2). */
  private[graft] def friedmanRankedCells(cells: DataFrame): DataFrame = {
    val byVal = cells.groupBy(col("__b"), col("__v"))
      .agg(count(lit(1)).as("__cv"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVal.withColumn("__cum", sum(col("__cv")).over(w))
      .select(col("__b"), col("__v"),
        (lit(2L) * (col("__cum") - col("__cv")) + col("__cv") + lit(1L))
          .as("__r2"))
    cells.join(ranked, Seq("__b", "__v"))
  }

  /** The [[friedman]] finish over per-treatment cells (__t, __n =
    * blocks covered by this treatment, __R2 = Σ doubled ranks, __sr2 =
    * Σ doubled-rank squares; both DECIMAL(38,0)) — every column is an
    * exact mergeable integer (a complete block contributes its k cells
    * whole), so a streaming block-grain store sums per-batch cells and
    * reuses this verbatim. Fails loud when treatments disagree on the
    * block count (an incomplete merged design). */
  private[graft] def friedmanFromTreatmentCells(perT: DataFrame)
      : DataFrame = {
    val tot = broadcast(perT
      .agg(count(lit(1)).as("__k"),
        min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"),
        sum(col("__sr2")).as("__sr2sq"))
      .select(
        when(col("__nmin") =!= col("__nmax"),
          raise_error(lit("friedman: incomplete design — treatments " +
            "cover different block counts")))
          .otherwise(col("__nmin")).as("__n"),
        col("__k"), col("__sr2sq")))
    // (R2_j − n(k+1))² exact in DECIMAL, order-free across treatments
    val terms = perT.select(col("__R2")).crossJoin(tot)
      .select(col("__n"), col("__k"), col("__sr2sq"),
        ((col("__R2") -
            col("__n").cast(D) * (col("__k") + lit(1L)).cast(D)) *
         (col("__R2") -
            col("__n").cast(D) * (col("__k") + lit(1L)).cast(D)))
          .as("__sq"))
      .groupBy(col("__n"), col("__k"), col("__sr2sq"))
      .agg(sum(col("__sq")).as("__num"))
    val den = col("__sr2sq") -
      col("__n").cast(D) * col("__k").cast(D) *
        (col("__k") + lit(1L)).cast(D) * (col("__k") + lit(1L)).cast(D)
    val chi2 = (col("__k") - lit(1L)).cast("double") *
      col("__num").cast("double") / den.cast("double")
    // Kendall's W (1939): the [0,1] concordance reading of the same
    // statistic — W = χ²/(n(k−1)); 1 = every block ranks the
    // treatments identically, 0 = no agreement.
    val kw = chi2 / (col("__n").cast("double") *
      (col("__k") - lit(1L)).cast("double"))
    terms.select(col("__n").as("n_blocks"), col("__k").as("k"),
      (col("__k") - lit(1L)).as("dof"),
      graft.functions.q6(when(den.cast("double") > 0, chi2)).as("chi2"),
      graft.functions.q6(when(den.cast("double") > 0, kw))
        .as("kendall_w"))
  }

  /** F83: KENDALL'S τ-b per group (Kendall 1938; τ-b tie form per
    * Kendall 1945 — public knowledge) — the concordance companion of
    * [[spearman]]: ρ correlates the RANKS (one big tie block can
    * dominate); τ counts PAIR INVERSIONS, the same quantity a
    * learning-to-rank swap loss measures, and is what [[graft.events
    * .Resample]]'s Mann–Kendall specializes to x = time.
    *
    * Exactness + scale: rows collapse to the (x, y) DISTINCT-CELL grid
    * per group first; C−D is an exact integer from the cell-pair
    * equi-join on the group key (each unordered cell pair once, via
    * lexicographic (x, y) order), and the tie terms n₀/n₁/n₂ come from
    * the marginal count tables — doubled (t·(t−1), n·(n−1)) so no
    * halving ever happens: the /2 cancels inside τ-b. The pair join is
    * quadratic in CELL count, never row count; it fails loud past
    * `maxCellsPerGroup` (the X165 LOF convention — at 100 TB, bucket
    * or quantize the value grids first). τ-b = (C−D)/√((n0−n1)(n0−n2))
    * is one IEEE tree over exact integers, published q6; a constant
    * side ⇒ NULL tau. Output per group: (g, n, n_cells,
    * conc_minus_disc, tau_b). */
  def kendallTau(df: DataFrame, group: Column, x: Column, y: Column,
      maxCellsPerGroup: Int = 20000): DataFrame =
    kendallTauFromCells(
      df.filter(x.isNotNull && y.isNotNull)
        .select(group.as("g"), x.as("x"), y.as("y"))
        .groupBy(col("g"), col("x"), col("y"))
        .agg(count(lit(1)).as("c")), maxCellsPerGroup)

  /** The [[kendallTau]] finish over an already-counted (g, x, y, c)
    * cell table — cells are exact mergeable integers, so a streaming
    * cell store re-aggregates per-batch partial counts and reuses this
    * verbatim (the cmhFromCounts pattern). */
  private[graft] def kendallTauFromCells(cells0: DataFrame,
      maxCellsPerGroup: Int = 20000): DataFrame = {
    val cells = graft.util.Caches.persistTracked(cells0)
    val nCells = cells.groupBy(col("g"))
      .agg(count(lit(1)).as("n_cells"), sum(col("c")).as("n"))
    // EAGER cap check (the X165 LOF convention, for real): a lazy
    // raise_error column shares the plan with the O(cells²) pair join
    // and Spark may schedule the quadratic shuffle before the guard
    // task ever runs — the cap must abort BEFORE the join exists
    val oversize = nCells.filter(col("n_cells") > maxCellsPerGroup)
      .limit(1).collect()
    require(oversize.isEmpty,
      s"kendallTau: group ${oversize.headOption.map(_.get(0)).orNull} " +
        s"has ${oversize.headOption.map(_.get(1)).orNull} distinct " +
        s"(x,y) cells > maxCellsPerGroup=$maxCellsPerGroup — bucket " +
        "or quantize first")
    val a = cells.select(col("g"), col("x").as("__xa"),
      col("y").as("__ya"), col("c").as("__ca"))
    val b = cells.select(col("g"), col("x").as("__xb"),
      col("y").as("__yb"), col("c").as("__cb"))
    // each unordered cell pair once: lexicographic (x, y)
    val pairs = a.join(b, Seq("g"))
      .filter(col("__xa") < col("__xb") ||
        (col("__xa") === col("__xb") && col("__ya") < col("__yb")))
    val sgn = when(col("__xa") === col("__xb") ||
        col("__ya") === col("__yb"), lit(0L))
      .when((col("__xa") < col("__xb")) === (col("__ya") < col("__yb")),
        lit(1L))
      .otherwise(lit(-1L))
    val cd = pairs.groupBy(col("g"))
      .agg(coalesce(sum((col("__ca") * col("__cb")).cast(D) *
        sgn.cast(D)), lit(0).cast(D)).as("__cd"))
    def tieTerm(vc: String, name: String): DataFrame =
      cells.groupBy(col("g"), col(vc)).agg(sum(col("c")).as("__t"))
        .groupBy(col("g"))
        .agg(coalesce(sum((col("__t") * (col("__t") - lit(1L))).cast(D)),
          lit(0).cast(D)).as(name))
    val joined = nCells
      .join(cd, Seq("g"), "left")
      .join(tieTerm("x", "__tx2"), Seq("g"))
      .join(tieTerm("y", "__ty2"), Seq("g"))
      .withColumn("__cd", coalesce(col("__cd"), lit(0).cast(D)))
    // doubled pair counts: n0₂ = n(n−1), n1₂ = Σt(t−1), n2₂ = Σu(u−1);
    // τ-b = 2(C−D)/√((n0₂−n1₂)(n0₂−n2₂)) — the halves cancel
    val n02 = col("n").cast(D) * (col("n") - lit(1L)).cast(D)
    val fx = (n02 - col("__tx2")).cast("double")
    val fy = (n02 - col("__ty2")).cast("double")
    def pubLong(c: Column) =
      when(abs(c) > lit(Long.MaxValue).cast(D),
        raise_error(lit("kendallTau: C−D overflows BIGINT")))
        .otherwise(c.cast("long"))
    joined.select(col("g"), col("n"), col("n_cells"),
      pubLong(col("__cd")).as("conc_minus_disc"),
      graft.functions.q6(when(fx > 0 && fy > 0,
        lit(2.0) * col("__cd").cast("double") / (sqrt(fx) * sqrt(fy))))
        .as("tau_b"))
  }
}
