package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X92: MARKET-BASKET ASSOCIATION RULES (Agrawal & Srikant 1994,
  * public knowledge) at the pair level: for items co-occurring in at
  * least `minCount` baskets, emit both directed rules A→B with
  * `support = n_both/N`, `confidence = n_both/n_ante` and
  * `lift = (n_both·N)/(n_ante·n_cons)` — the co-purchase /
  * co-occurrence signal recommendation and curation pipelines mine
  * from order or session logs.
  *
  * Engine parity: all three measures are built from exact integer
  * counts with PINNED IEEE expression trees (the [[graft.text.TextStats.pmiCollocations]]
  * discipline — one correctly-rounded division per factor, fixed
  * association order), so every value is bit-identical cross-engine
  * and the output needs no rounding or float tolerance; output order
  * is by the integer rule key, never by a float.
  *
  * Scale shape: one distinct (basket, item) projection; item counts
  * are one hash aggregate; the pair join is keyed on the basket id
  * (co-partitioned self-join — the classic shape) and explodes only
  * within baskets: cost Σ_b |b|², the inherent pair-counting work —
  * BOUNDED by the `maxBasketSize` cap when the caller opts in (the
  * DEFAULT is uncapped: truncation silently changes
  * support/confidence, so it must be explicit). The rule table joins
  * counts at candidate-set size, not corpus size.
  *
  * STRAGGLER CONTRACT at 100 TB: uncapped, ONE hot basket (a bot
  * session with 10⁶ items) contributes 10¹² pairs to a single
  * basket-keyed partition — a straggler no AQE skew split can fix
  * (the explosion is inside one key). PRE-FLIGHT with
  * [[graft.relational.Joins.joinCardinalityAudit]] (X64) on the
  * incidence against itself keyed by basket: its `join_rows` column
  * IS each basket's |b|² pair cost and `share` names the straggler
  * (spec-pinned in AssociationsSpec); then either cap via
  * `maxBasketSize` or drop the named baskets. [[basketRules]] also
  * logs the largest basket (one more row on the count aggregate it
  * already pays) so the price is visible in the driver log even when
  * nobody ran the audit.
  */
object Associations {

  /** The (basket, item) incidence, optionally capped to each basket's
    * `maxBasketSize` SMALLEST item ids — deterministic, so the capped
    * mining result is a pure function of the input, never of
    * partition order. One pathological mega-basket (a crawler session,
    * a bot account) contributes |b|² pairs and can take the stage down
    * at 100 TB; an explicit cap bounds Σ|b|² by N·maxBasketSize² with
    * a basket-keyed (never global) rank window. Counts are computed
    * AFTER the cap, so support/confidence/cosine stay internally
    * consistent over the capped incidence.
    *
    * The DEFAULT is uncapped (`Int.MaxValue`): truncation changes
    * support/confidence/cosine values, so it must be an explicit
    * caller opt-in, never a silent default divergence from the
    * uncapped association-mining semantics. */
  private def cappedItems(baskets: DataFrame, basketCol: String,
      itemCol: String, maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val dedup = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val capped =
      if (maxBasketSize == Int.MaxValue) dedup // uncapped: no window
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__b")).orderBy(col("__i"))
        dedup.withColumn("__r", row_number().over(w))
          .filter(col("__r") <= maxBasketSize)
          .drop("__r")
      }
    graft.util.Caches.persistTracked(capped)
  }

  def basketRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 2, maxBasketSize: Int = Int.MaxValue): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val items = cappedItems(baskets, basketCol, itemCol, maxBasketSize)
    // basket count AND the largest basket ride the same aggregate job:
    // the max prices the uncapped Σ|b|² straggler (see the scaladoc
    // contract) in the driver log before the pair join runs
    val bstats = items.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
      .agg(count(lit(1)).as("__nb"),
        coalesce(max(col("__sz")), lit(0L)).as("__mx")).head()
    val n = bstats.getLong(0)
    require(n > 0, "basketRules: no baskets")
    val largest = bstats.getLong(1)
    org.slf4j.LoggerFactory.getLogger(getClass).debug(
      "basketRules: {} baskets, largest |b| = {} -> worst-case {} pairs " +
        "in one basket partition (pre-flight: Joins.joinCardinalityAudit)",
      n, largest, largest * largest)
    val cnt = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val co = items.select(col("__b"), col("__i").as("__a"))
      .join(items.select(col("__b"), col("__i").as("__z")), "__b")
      .filter(col("__a") < col("__z"))
      .groupBy(col("__a"), col("__z"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minCount)
    // both directions of each surviving unordered pair
    val directed = co.select(col("__a").as("antecedent"),
        col("__z").as("consequent"), col("n_both"))
      .unionByName(co.select(col("__z").as("antecedent"),
        col("__a").as("consequent"), col("n_both")))
    directed
      .join(cnt.select(col("__i").as("antecedent"),
        col("__c").as("n_ante")), "antecedent")
      .join(cnt.select(col("__i").as("consequent"),
        col("__c").as("n_cons")), "consequent")
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ante"), col("n_cons"),
        (col("n_both").cast("double") / lit(n.toDouble)).as("support"),
        (col("n_both").cast("double") / col("n_ante").cast("double"))
          .as("confidence"),
        ((col("n_both").cast("double") / col("n_ante").cast("double")) *
          (lit(n.toDouble) / col("n_cons").cast("double"))).as("lift"))
  }

  /** X105: ITEM-ITEM COSINE similarity from the bipartite
    * basket-item incidence — the weighted one-mode projection behind
    * memory-based collaborative filtering ("customers who bought i
    * also bought", Sarwar et al. 2001, public knowledge):
    * `cos(i, j) = n_{ij} / √(n_i · n_j)` over binary basket vectors,
    * top-`k` neighbors per item. Complements [[basketRules]]: rules
    * rank by directional confidence/lift, the cosine is the symmetric
    * magnitude-normalized strength a kNN recommender consumes.
    *
    * Engine parity: counts are exact integers; `√` is IEEE
    * correctly-rounded, so the cosine is bit-identical cross-engine
    * and the per-item ranking (cosine DESC, neighbor id ASC) is
    * deterministic.
    *
    * Scale shape: same basket-keyed pair join as the rules (Σ|b|²,
    * the inherent work), then one item-keyed rank window over the
    * candidate-pair table (pair-sized, not corpus-sized). */
  def itemCosineTopK(baskets: DataFrame, basketCol: String,
      itemCol: String, minCount: Long = 2, k: Int = 5,
      maxBasketSize: Int = Int.MaxValue): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val items = cappedItems(baskets, basketCol, itemCol, maxBasketSize)
    val cnt = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val co = items.select(col("__b"), col("__i").as("__a"))
      .join(items.select(col("__b"), col("__i").as("__z")), "__b")
      .filter(col("__a") < col("__z"))
      .groupBy(col("__a"), col("__z"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minCount)
    val directed = co.select(col("__a").as("item"),
        col("__z").as("neighbor"), col("n_both"))
      .unionByName(co.select(col("__z").as("item"),
        col("__a").as("neighbor"), col("n_both")))
    val scored = directed
      .join(cnt.select(col("__i").as("item"), col("__c").as("n_item")),
        "item")
      .join(cnt.select(col("__i").as("neighbor"),
        col("__c").as("n_neighbor")), "neighbor")
      .withColumn("cosine", col("n_both").cast("double") /
        sqrt(col("n_item").cast("double") * col("n_neighbor")
          .cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_both"),
        col("cosine"), col("rank"))
  }
}
