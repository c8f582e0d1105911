package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Labeling-pipeline operators: inter-annotator agreement (Cohen 1960;
  * Fleiss 1971 — both public-domain statistics), majority-vote label
  * aggregation, and active-learning acquisition (uncertainty sampling,
  * Lewis & Gale 1994). A 100 TB training corpus is labeled by fleets of
  * human raters and model ensembles; before any label ships to training,
  * the pipeline needs (a) "do the raters even agree" (kappa), (b) one
  * consensus label per item with ties surfaced rather than coin-flipped
  * (majority vote), and (c) "which unlabeled items are worth the next
  * labeling dollar" (uncertainty acquisition).
  *
  * Determinism discipline (the e16/e17 lesson): every statistic here is
  * exact-integer until one fixed IEEE division tree — vote counts are
  * BIGINTs, kappa's expected-agreement numerators are DECIMAL(38,0) sums
  * of BIGINT products, entropy terms are floor-scaled 1e12 LONGs — so
  * the DuckDB oracle reproduces each output bit-for-bit. Ratios are
  * quantized via [[graft.functions.q6]], never the engine `round`.
  *
  * Scale shape: everything is one groupBy over (item, label) cells plus
  * label-cardinality-bounded joins; per-item windows partition by item
  * (bounded by the label alphabet, never corpus-global). No collects
  * except the fail-loud vote-integrity guard (a 1-row aggregate).
  */
object Labeling {

  import graft.functions.q6

  /** Fail loud if any (item, rater) pair casts more than one vote —
    * duplicate votes silently inflate both observed and expected
    * agreement (and fan out Cohen's pair join). One tiny aggregate job,
    * eager by design: a lazy raise_error guard would only fire after
    * the skewed join already ran (the Theil–Sen cap lesson). */
  private def requireOneVotePerRater(votes: DataFrame, what: String): Unit = {
    val r = votes.groupBy(col("__i"), col("__r"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), count(lit(1)).as("pairs")).head()
    if (!r.isNullAt(0)) {
      require(r.getLong(0) <= 1L,
        s"$what: some (item, rater) has ${r.getLong(0)} votes; " +
          "deduplicate or resolve before scoring agreement")
    }
  }

  /** F63: COHEN'S KAPPA between two named raters over a long-form vote
    * table (item, rater, label). Only items BOTH raters labeled count
    * (the standard paired design). Observed agreement `po` and expected
    * agreement `pe = Σ_k p_A(k)·p_B(k)` come from exact BIGINT counts —
    * the pe numerator is a DECIMAL(38,0) sum of count products over the
    * label alphabet, so no float accumulation order exists; kappa =
    * (po − pe)/(1 − pe), NULL when pe = 1 (both raters constant — chance
    * explains everything, kappa undefined). NULL labels are excluded
    * (an abstention is not a vote). Output one row:
    * (n_items, n_agree, po, pe, kappa). */
  def cohenKappa(annotations: DataFrame, item: Column, rater: Column,
      label: Column, raterA: String, raterB: String): DataFrame = {
    val votes = annotations
      .filter(label.isNotNull && rater.isin(raterA, raterB))
      .select(item.as("__i"), rater.as("__r"), label.as("__l"))
    requireOneVotePerRater(votes, "cohenKappa")
    val a = votes.filter(col("__r") === raterA)
      .select(col("__i"), col("__l").as("__la"))
    val b = votes.filter(col("__r") === raterB)
      .select(col("__i"), col("__l").as("__lb"))
    val paired = a.join(b, Seq("__i"))
    cohenKappaFromCells(paired.groupBy(col("__la"), col("__lb"))
      .agg(count(lit(1)).as("__c")))
  }

  /** The [[cohenKappa]] derivation from pre-aggregated label-pair cells
    * (__la, __lb, __c BIGINT) — the MERGEABLE form: cell counts are
    * exact and associative, so a streaming monitor can persist per-batch
    * cells and publish the identical kappa over their sum (the
    * confusion-sink discipline). The cell table is bounded by the label
    * alphabet squared, never by corpus size. */
  def cohenKappaFromCells(cells: DataFrame): DataFrame = {
    val tot = cells.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n"),
      coalesce(sum(when(col("__la") === col("__lb"), col("__c"))),
        lit(0L)).as("agree"))
    val ca = cells.groupBy(col("__la").as("__l"))
      .agg(sum(col("__c")).as("__ca"))
    val cb = cells.groupBy(col("__lb").as("__l"))
      .agg(sum(col("__c")).as("__cb"))
    // Label-alphabet-sized join; labels seen by only one rater contribute
    // zero to pe, so the inner join is lossless for the sum.
    // decimal(19,0) operands: the marginal product grows ~n² and would
    // overflow BIGINT near n ≈ 3e9 items (the rocAuc lesson).
    val peNum = ca.join(cb, Seq("__l"))
      .agg(coalesce(sum((col("__ca").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__s"))
    val nD = col("n").cast("double")
    val po = col("agree").cast("double") / nD
    val pe = col("__s").cast("double") / (nD * nD)
    tot.crossJoin(broadcast(peNum))
      .select(col("n").as("n_items"), col("agree").as("n_agree"),
        q6(when(col("n") > 0, po)).as("po"),
        q6(when(col("n") > 0, pe)).as("pe"),
        q6(when(col("n") > 0 && pe < 1.0, (po - pe) / (lit(1.0) - pe)))
          .as("kappa"))
  }

  /** F64: FLEISS' KAPPA over a long-form vote table with a FIXED number
    * of raters per item (the classic design; items with a different
    * rater count FAIL LOUD — silently dropping them would bias the
    * marginals, and varying-n generalizations are a different statistic).
    * With n items, r raters, cell counts n_ij (votes for label j on
    * item i), everything reduces to two exact DECIMAL(38,0) sums:
    * S2 = Σ n_ij² and Se = Σ_j (Σ_i n_ij)², giving
    * P̄ = (S2 − n·r)/(n·r·(r−1)) and P̄e = Se/(n·r)² in one fixed IEEE
    * tree each. kappa NULL when P̄e = 1. Output one row:
    * (n_items, n_raters, p_bar, p_e, kappa). */
  def fleissKappa(annotations: DataFrame, item: Column, rater: Column,
      label: Column): DataFrame = {
    val votes = annotations.filter(label.isNotNull)
      .select(item.as("__i"), rater.as("__r"), label.as("__l"))
    requireOneVotePerRater(votes, "fleissKappa")
    val perItem = votes.groupBy(col("__i")).agg(count(lit(1)).as("__ri"))
    val shape = perItem.agg(min(col("__ri")).as("lo"),
      max(col("__ri")).as("hi"), count(lit(1)).as("n")).head()
    require(shape.getLong(2) > 0, "fleissKappa: no votes")
    val (rLo, rHi) = (shape.getLong(0), shape.getLong(1))
    require(rLo == rHi,
      s"fleissKappa: rater count varies across items ($rLo..$rHi); " +
        "Fleiss' kappa requires a fixed panel size — filter to a " +
        "complete panel first")
    require(rLo >= 2, s"fleissKappa: needs >= 2 raters per item, got $rLo")
    val r = rLo
    val cells = votes.groupBy(col("__i"), col("__l"))
      .agg(count(lit(1)).as("__c"))
    val s2 = cells.agg(
      sum((col("__c") * col("__c")).cast("decimal(38,0)")).as("__s2"),
      count_distinct(col("__i")).as("__n"))
    val se = cells.groupBy(col("__l"))
      .agg(sum(col("__c")).as("__cj"))
      // decimal(19,0) operands: column totals grow with the corpus and
      // the square passes the BIGINT ceiling near 3e9 (the rocAuc lesson)
      .agg(sum((col("__cj").cast("decimal(19,0)") *
        col("__cj").cast("decimal(19,0)")).cast("decimal(38,0)"))
        .as("__se"))
    val nD = col("__n").cast("double")
    val rD = lit(r.toDouble)
    val pBar = (col("__s2").cast("double") - nD * rD) /
      (nD * rD * (rD - lit(1.0)))
    val pE = col("__se").cast("double") / (nD * rD * (nD * rD))
    s2.crossJoin(broadcast(se))
      .select(col("__n").as("n_items"), lit(r).as("n_raters"),
        q6(pBar).as("p_bar"), q6(pE).as("p_e"),
        q6(when(pE < 1.0, (pBar - pE) / (lit(1.0) - pE))).as("kappa"))
  }

  /** X144: MAJORITY-VOTE LABEL AGGREGATION — one consensus row per item:
    * total votes, the winning count, the consensus label (NULL on a tie
    * for first place — a tie is a routing signal for adjudication, never
    * a coin flip), an explicit `is_tie` flag, and the agreement share
    * `top/n` (quantized-6; exact BIGINT counts elsewhere). The per-item
    * window partitions by item and is bounded by the label alphabet.
    * NULL labels are excluded before counting. */
  def majorityVote(annotations: DataFrame, item: Column, rater: Column,
      label: Column): DataFrame = {
    val votes = annotations.filter(label.isNotNull)
      .select(item.as("item"), rater.as("__r"), label.as("__l"))
    requireOneVotePerRater(
      votes.select(col("item").as("__i"), col("__r"), col("__l")),
      "majorityVote")
    val cells = votes.groupBy(col("item"), col("__l"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("item"))
    val withMax = cells.withColumn("__mx", max(col("__c")).over(w))
    withMax.groupBy(col("item"))
      .agg(sum(col("__c")).as("n_votes"),
        max(col("__c")).as("top_count"),
        count(when(col("__c") === col("__mx"), 1)).as("__nt"),
        min(when(col("__c") === col("__mx"), col("__l"))).as("__w"))
      .select(col("item"), col("n_votes"), col("top_count"),
        when(col("__nt") === 1, col("__w")).as("consensus_label"),
        (col("__nt") > 1).as("is_tie"),
        q6(col("top_count").cast("double") /
          col("n_votes").cast("double")).as("agreement"))
  }

  /** X145 (scores half): PER-ITEM UNCERTAINTY from a long-form class
    * probability table (item, class, p) — predictive entropy
    * `−Σ p·ln p` (each term floor-scaled to a 1e12 LONG before the sum,
    * so the per-item addition is order-free and engine-exact; `ln` is
    * bitwise-reproducible on this input class — the q_x51 pin) and the
    * best-vs-second margin (exact comparisons; a tie at the top is
    * margin 0). Rows with NULL or non-positive p contribute zero entropy
    * and are ignored by the margin max. */
  def uncertaintyScores(scores: DataFrame, item: Column, p: Column)
      : DataFrame = {
    val base = scores.select(item.as("item"), p.cast("double").as("__p"))
    val term = when(col("__p") > 0.0,
      floor(-col("__p") * log(col("__p")) * lit(1e12) + lit(0.5))
        .cast("long")).otherwise(lit(0L))
    val w = Window.partitionBy(col("item"))
    val withMax = base.withColumn("__mx", max(col("__p")).over(w))
    withMax.groupBy(col("item"))
      .agg(sum(term).as("__e"),
        max(col("__p")).as("__top"),
        count(when(col("__p") === col("__mx"), 1)).as("__ntop"),
        max(when(col("__p") < col("__mx"), col("__p"))).as("__second"))
      .select(col("item"),
        q6(col("__e").cast("double") / lit(1e12)).as("entropy"),
        q6(when(col("__ntop") > 1, 0.0)
          .otherwise(col("__top") - coalesce(col("__second"), lit(0.0))))
          .as("margin"))
  }

  /** X145: UNCERTAINTY-SAMPLING ACQUISITION — the next `k` items to send
    * to labelers: top-k by entropy (method "entropy", descending) or by
    * smallest margin (method "margin", ascending), item id breaking ties
    * so reruns pick the same batch. orderBy+limit plans as TakeOrdered
    * (no global sort materializes); the pick_rank window runs AFTER the
    * limit on ≤ k rows. */
  def uncertaintySample(scores: DataFrame, item: Column, p: Column,
      k: Int, method: String = "entropy"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = uncertaintyScores(scores, item, p)
    val ordered = method match {
      case "entropy" => u.orderBy(col("entropy").desc, col("item"))
      case "margin"  => u.orderBy(col("margin").asc, col("item"))
      case other => throw new IllegalArgumentException(
        s"unknown acquisition method '$other' (entropy|margin)")
    }
    val picked = ordered.limit(k)
    val w = Window.orderBy(
      if (method == "entropy") col("entropy").desc else col("margin").asc,
      col("item"))
    picked.withColumn("pick_rank", row_number().over(w))
  }

  /** X156: PAIRWISE KAPPA MATRIX — Cohen's kappa for EVERY rater pair
    * in one distributed pass (the F63 two-rater statistic run per
    * pair would be O(R²) driver loops; here the item self-join emits
    * all pair cells at once and ONE aggregate per pair key finishes
    * the job) — the "which annotator disagrees with everyone"
    * triage view a labeling campaign reads before re-training anyone.
    * Same exactness as F63: BIGINT agreement counts, the pe numerator
    * a DECIMAL(38,0) sum of DECIMAL(19,0) marginal products, fixed
    * IEEE trees quantized-6, kappa NULL at pe = 1. Pairs are oriented
    * rater_a < rater_b (string order) so each pair appears once.
    * Plan: one item-keyed self-join (items bound the fan-out: a panel
    * of R raters emits R(R−1)/2 rows per item — R is people, not
    * data), one (pair, label-pair) cell aggregate, label-alphabet-
    * bounded marginal joins. Output: one row per rater pair —
    * (rater_a, rater_b, n_items, n_agree, po, pe, kappa). */
  def pairwiseKappa(annotations: DataFrame, item: Column, rater: Column,
      label: Column): DataFrame = {
    val votes = annotations.filter(label.isNotNull)
      .select(item.as("__i"), rater.as("__r"), label.as("__l"))
    requireOneVotePerRater(votes, "pairwiseKappa")
    val pairs = votes.as("a").join(votes.as("b"),
        col("a.__i") === col("b.__i") && col("a.__r") < col("b.__r"))
      .select(col("a.__r").as("ra"), col("b.__r").as("rb"),
        col("a.__l").as("la"), col("b.__l").as("lb"))
    val cells = pairs.groupBy(col("ra"), col("rb"), col("la"), col("lb"))
      .agg(count(lit(1)).as("__c"))
    val tot = cells.groupBy(col("ra"), col("rb"))
      .agg(sum(col("__c")).as("n_items"),
        coalesce(sum(when(col("la") === col("lb"), col("__c"))),
          lit(0L)).as("n_agree"))
    val ca = cells.groupBy(col("ra"), col("rb"), col("la").as("__l"))
      .agg(sum(col("__c")).as("__ca"))
    val cb = cells.groupBy(col("ra"), col("rb"), col("lb").as("__l"))
      .agg(sum(col("__c")).as("__cb"))
    val peNum = ca.join(cb, Seq("ra", "rb", "__l"))
      .groupBy(col("ra"), col("rb"))
      .agg(coalesce(sum((col("__ca").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))
        .as("__pe"))
    val nD = col("n_items").cast("double")
    val po = col("n_agree").cast("double") / nD
    val pe = col("__pe").cast("double") / (nD * nD)
    tot.join(peNum, Seq("ra", "rb"))
      .select(col("ra").as("rater_a"), col("rb").as("rater_b"),
        col("n_items"), col("n_agree"),
        q6(when(col("n_items") > 0, po)).as("po"),
        q6(when(col("n_items") > 0, pe)).as("pe"),
        q6(when(col("n_items") > 0 && pe < 1.0,
          (po - pe) / (lit(1.0) - pe))).as("kappa"))
  }

  /** X153: CONFIDENT-LEARNING JOINT ESTIMATE (Northcutt, Jiang &
    * Chuang 2021, public knowledge) — the label-noise census that
    * turns "model disagrees with label" into a calibrated (given,
    * suggested) count matrix: class thresholds `t_j` = mean predicted
    * probability of class j among examples GIVEN label j (so a
    * systematically under-confident class is not over-flagged), an
    * example counts toward cell (given, j*) only when `p_{j*} ≥ t_{j*}`
    * with j* the argmax over QUALIFYING classes; unconfident examples
    * (no class clears its threshold) are reported per given class, not
    * silently dropped. Off-diagonal mass is the label-noise estimate;
    * X112's out-of-fold suspects are the row-level drill-down.
    *
    * Exactness: per-example probabilities are floor-scaled to 1e12
    * LONGs before the threshold mean (order-free sums, one division —
    * the F65 discipline), so the `p ≥ t` boundary compare is
    * deterministic cross-engine; the per-example argmax is a window
    * bounded by the class alphabet, tie-broken (p desc, class asc).
    * Input: long form (id, given, class, p). Output: one row per
    * OBSERVED (given, suggested) cell plus per-given unconfident rows
    * (suggested NULL) — (given, suggested, n, frac_of_given)
    * quantized-6. */
  def confidentJoint(scores: DataFrame, id: Column, given: Column,
      cls: Column, p: Column): DataFrame = {
    val base = scores.select(id.as("__i"), given.as("__g"),
      cls.as("__c"), p.cast("double").as("__p"))
      .filter(col("__p").isNotNull)
    val scaled = base.withColumn("__pl",
      floor(col("__p") * lit(1e12) + lit(0.5)).cast("long"))
    val thresholds = scaled.filter(col("__g") === col("__c"))
      .groupBy(col("__c").as("__tc"))
      .agg((sum(col("__pl").cast("decimal(38,0)")).cast("double") /
        lit(1e12) / count(lit(1)).cast("double")).as("__t"))
    val qual = scaled
      .join(broadcast(thresholds), col("__c") === col("__tc"))
      .filter(col("__p") >= col("__t"))
    val w = Window.partitionBy(col("__i"))
      .orderBy(col("__pl").desc, col("__c"))
    val best = qual.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__i"), col("__c").as("__sug"))
    val perExample = base.select(col("__i"), col("__g")).distinct()
      .join(best, Seq("__i"), "left")
    val cells = perExample.groupBy(col("__g"), col("__sug"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("__g")).agg(sum(col("n")).as("__tn"))
    cells.join(totals, "__g")
      .select(col("__g").as("given"), col("__sug").as("suggested"),
        col("n"),
        q6(col("n").cast("double") / col("__tn").cast("double"))
          .as("frac_of_given"))
  }

  /** F70: KRIPPENDORFF'S ALPHA (nominal) — the agreement coefficient
    * that handles MISSING votes and VARYING panel sizes, which real
    * annotation runs always have (Fleiss demands a fixed panel; Cohen
    * demands exactly two raters). Krippendorff 2004, public knowledge:
    * over units with m_u ≥ 2 pairable values and per-(unit, label)
    * counts n_uc,
    *   D_o = (1/n)·Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1),
    *   D_e = (n² − Σ_c n_c²)/(n(n−1)),   α = 1 − D_o/D_e
    * with n = Σ m_u and n_c the label totals over pairable units.
    * Units with a single vote are EXCLUDED by definition (they have no
    * pairable disagreement), not an error.
    *
    * Exactness discipline: the per-unit term divides by (m_u − 1) — a
    * small-denominator rational — so each term is floor-scaled to a
    * 1e9 LONG and DECIMAL(38,0)-summed (the F65 "estimator defined on
    * quantized terms" convention: order-free at any unit count, and
    * the oracle mirrors the same literal floor). All counts and
    * Σ n_c² stay exact DECIMAL integers; the published D_o/D_e/α are
    * single fixed IEEE trees, quantized-6. α NULL when D_e = 0 (one
    * label total dominates completely / n < 2) — no evidence scale.
    *
    * Plan: two aggregates over the (unit, label) cell table (unit-keyed
    * then label-keyed) + two 1-row broadcasts — no windows, no
    * collects; cells are corpus-sized at most. Output one row:
    * (n_units, n_values, d_o, d_e, alpha). */
  def krippendorffAlpha(annotations: DataFrame, item: Column,
      rater: Column, label: Column): DataFrame = {
    val votes = annotations.filter(label.isNotNull)
      .select(item.as("__i"), rater.as("__r"), label.as("__l"))
    requireOneVotePerRater(votes, "krippendorffAlpha")
    krippendorffFromCells(votes.groupBy(col("__i"), col("__l"))
      .agg(count(lit(1)).as("__c")))
  }

  /** The [[krippendorffAlpha]] derivation over an already-aggregated
    * per-(unit, label) vote-count table (__i, __l, __c). Cell counts
    * are exact and ASSOCIATIVE — per-batch cell tables sum into the
    * identical coefficient, which is what the streaming monitor
    * publishes (a unit's votes may even arrive across batches; the
    * merged cell is the same count). */
  def krippendorffFromCells(cells: DataFrame): DataFrame = {
    val perUnit = cells.groupBy(col("__i"))
      .agg(sum(col("__c")).as("__m"),
        sum((col("__c") * col("__c")).cast("decimal(38,0)")).as("__s2"))
      .filter(col("__m") >= 2)
    val mD = col("__m").cast("double")
    val termQ = floor(
      (mD * mD - col("__s2").cast("double")) / (mD - lit(1.0)) *
        lit(1e9) + lit(0.5)).cast("long").cast("decimal(38,0)")
    val unitAgg = perUnit.agg(
      count(lit(1)).as("n_units"),
      coalesce(sum(col("__m")), lit(0L)).as("n_values"),
      coalesce(sum(termQ), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")).as("__su"))
    val labelAgg = cells
      .join(perUnit.select(col("__i")), "__i")
      .groupBy(col("__l")).agg(sum(col("__c")).as("__nc"))
      .agg(coalesce(sum((col("__nc").cast("decimal(19,0)") *
        col("__nc").cast("decimal(19,0)")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))
        .as("__sc"))
    val nD = col("n_values").cast("double")
    val dO = col("__su").cast("double") / lit(1e9) / nD
    val dE = (nD * nD - col("__sc").cast("double")) /
      (nD * (nD - lit(1.0)))
    unitAgg.crossJoin(broadcast(labelAgg))
      .select(col("n_units"), col("n_values"),
        q6(when(col("n_values") >= 2, dO)).as("d_o"),
        q6(when(col("n_values") >= 2, dE)).as("d_e"),
        q6(when(col("n_values") >= 2 && dE > 0.0,
          lit(1.0) - dO / dE)).as("alpha"))
  }
}
