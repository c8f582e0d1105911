package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X160: TextRank keyword extraction (Mihalcea & Tarau 2004, public
  * knowledge) — PageRank over the token co-occurrence graph picks the
  * corpus's load-bearing vocabulary; the unsupervised keyword list a
  * curation pipeline reads next to the X128 tf-idf terms (tf-idf
  * rewards rarity, TextRank rewards centrality — a term that co-occurs
  * with everything scores high even when common).
  *
  * Graph: an undirected edge per DISTINCT adjacent token pair
  * (window 2, the classic formulation) after a `minLen` token filter
  * (the stopword proxy that needs no list); both directions
  * materialized, so every node has out-degree ≥ 1 and the dangling
  * term vanishes from the update.
  *
  * EXACT INTEGER PageRank, and deliberately so: the float PageRank ops
  * (X83/X84/X97) sum hundreds of per-edge contributions per hot node,
  * which is engine-summation-order territory — fine for doc-graph
  * scores read by humans, wrong for an oracle-checked keyword RANKING
  * where a last-ulp swap reorders the list. Here rank mass is a
  * `scale`-scaled LONG: unit = scale/n, per-edge contribution
  * pr/deg and the damping 17/20 are FLOOR divisions
  * (pr ← 3·unit/20 + 17·Σ(pr_u/deg_u)/20 — multiply before divide),
  * so every intermediate is an exact integer both engines compute
  * identically; each floor loses < 1 per edge against the float fix
  * point, noise at scale = 1e12. Same keyed-shuffle loop discipline
  * as `graph/PageRank`: the degree-annotated edge table is
  * repartitioned by src and localCheckpoint'ed ONCE (the rank join
  * never re-exchanges the edge-sized side), and each iteration's rank
  * table is eagerly localCheckpoint'ed — materialize AND truncate
  * lineage, keeping per-iteration plans constant-sized (a plain
  * persist chain grows one plan level per iteration; Catalyst
  * re-analysis measured 9x slower by iteration 5 on the HITS twin).
  * Per-iteration exchanges are NODE-sized (pr hash → src, contrib
  * groupBy dst, the left join back onto the vocabulary).
  *
  * Output: the top `topK` tokens by (rank desc, token) —
  * (token, rank_scaled, degree). */
object TextRank {
  def textRankKeywords(df: DataFrame, idCol: String, textCol: String,
      iterations: Int = 5, topK: Int = 20, minLen: Int = 4,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    // an adjacent token pair IS a 2-gram shingle: one explode, no
    // positional self-join (tokens carry no whitespace, so the space
    // split recovers the pair exactly); the minLen filter applies to
    // both ENDPOINTS of an original-sequence adjacency, same as
    // filtering positions first
    val adj = df
      .select(explode(Dedup.shingles(col(textCol), 2)).as("__bi"))
      .select(split(col("__bi"), " ").getItem(0).as("src"),
        split(col("__bi"), " ").getItem(1).as("dst"))
      .filter(length(col("src")) >= minLen &&
        length(col("dst")) >= minLen && col("src") =!= col("dst"))
    val edges = graft.util.Caches.persistTracked(
      adj.unionByName(adj.select(col("dst").as("src"),
          col("src").as("dst")))
        .distinct())
    val deg = graft.util.Caches.persistTracked(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val n = deg.count()
    if (n == 0) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq.empty[(String, Long, Long)]
        .toDF("token", "rank_scaled", "degree")
    }
    val unit = scale / n
    val base = 3L * unit / 20L
    // static per-iteration join input: degree-annotated edges,
    // partitioned by src and checkpointed once — never re-exchanged
    val ed = graft.util.Caches.trackCheckpointed(
      edges.join(deg, "src").repartition(col("src"))
        .localCheckpoint(true))
    var pr = graft.util.Caches.trackCheckpointed(
      deg.select(col("src").as("v"), lit(unit).as("pr"))
        .localCheckpoint(true))
    (1 to iterations).foreach { _ =>
      val contrib = ed
        .join(pr.withColumnRenamed("v", "src"), "src")
        .select(col("dst"), expr("pr div deg").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__sum"))
      pr = graft.util.Caches.trackCheckpointed(
        deg.select(col("src").as("v"))
          .join(contrib, col("v") === col("dst"), "left")
          .select(col("v"),
            (lit(base) +
              expr("17 * coalesce(__sum, 0L) div 20")).as("pr"))
          .localCheckpoint(true))
    }
    pr.join(deg, pr("v") === deg("src"))
      .select(col("v").as("token"), col("pr").as("rank_scaled"),
        col("deg").as("degree"))
      .orderBy(col("rank_scaled").desc, col("token"))
      .limit(topK)
  }
}
