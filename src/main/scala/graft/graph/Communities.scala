package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X85/X86: community detection and hub/authority centrality — the two
  * graph signals web-corpus curation uses beyond PageRank: communities
  * group near-duplicate mirror sites / topic clusters for per-community
  * sampling caps, and HITS separates "pages many good pages point AT"
  * (authorities) from "pages that point at many good pages" (hubs) when
  * ranking seed lists for crawl frontiers.
  *
  * Both follow the [[PageRank]] loop discipline: the edge table is
  * partitioned on its join key and checkpointed ONCE, so every
  * iteration re-exchanges only the node-sized state table; per-iteration
  * state is persisted and the previous iteration released only after the
  * next materializes (no k-deep lineage recompute).
  */
object Communities {

  /** X85: synchronous LABEL PROPAGATION (Raghavan et al. 2007, public
    * knowledge). Undirected view of the edge set; every node starts
    * labelled with its own id; each iteration every node adopts the most
    * frequent label among its neighbours, ties broken by SMALLEST label
    * — fully deterministic, unlike the randomized-order original, so the
    * DuckDB oracle can replay it iteration by iteration.
    *
    * Scale shape: per iteration ONE node-sized exchange of the label
    * table onto the static edge partitioning, then a two-level aggregate
    * — `groupBy(node, label).count` (map-side combined, bounded by the
    * undirected edge count) and `groupBy(node).max_by` (node-sized).
    * Fixed `iterations`, no convergence collect. Synchronous updates can
    * oscillate on bipartite structures — callers pick `iterations`; the
    * result after k steps is exact and reproducible either way.
    *
    * Output: (node, community) — the label after `iterations` steps. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // undirected simple graph: both orientations, parallel edges collapsed
    val und = graft.util.Caches.trackCheckpointed(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b")).distinct()
        .repartition(col("b")).localCheckpoint(true))
    // und holds both orientations, so src alone already covers all nodes
    var lbl = graft.util.Caches.persistTracked(
      und.select(col("a").as("node")).distinct()
        .withColumn("lab", col("node")))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val cnt = und
        .join(lbl.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a"), col("lab"))
        .agg(count(lit(1)).as("c"))
      // most frequent neighbour label, tie -> smallest label: max_by on
      // (count, -label) — a struct max, deterministic
      val next = graft.util.Caches.persistTracked(
        cnt.groupBy(col("a"))
          .agg(max_by(col("lab"),
            struct(col("c"), (-col("lab")).as("nl"))).as("lab"))
          .withColumnRenamed("a", "node"))
      next.count() // materialize before releasing the parent
      prev.foreach(_.unpersist())
      prev = Some(lbl)
      lbl = next
    }
    prev.foreach(_.unpersist())
    lbl.select(col("node"), col("lab").as("community"))
  }

  /** X86: HITS hubs & authorities (Kleinberg 1999, public knowledge) by
    * fixed-iteration mutual recursion with L1 normalization:
    * `a'(v) = Σ_{u→v} h(u) / Σa'`, then `h'(v) = Σ_{v→u} a'(u) / Σh'`
    * — each half-step sums the OTHER score over in/out edges and
    * renormalizes to total mass 1, so scores are directly comparable
    * across graphs and iterations (the eigenvector direction is the
    * same as the classic L2 form; only the scale differs).
    *
    * Scale shape: TWO static edge checkpoints — one partitioned by dst
    * (authority half joins hubs on src, aggregates to dst), one by src
    * (hub half joins authorities on dst, aggregates to src) — so both
    * half-steps re-exchange only the node-sized score table. The two
    * normalization sums are one driver scalar each per iteration.
    *
    * Output: (node, authority, hub) — raw doubles; callers round. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = graft.util.Caches.persistTracked(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    val edForAuth = graft.util.Caches.trackCheckpointed(
      e.repartition(col("src")).localCheckpoint(true))
    val edForHub = graft.util.Caches.trackCheckpointed(
      e.repartition(col("dst")).localCheckpoint(true))
    var h = graft.util.Caches.persistTracked(
      nodes.withColumn("h", lit(1.0 / n)))
    var a: DataFrame = null
    var prevH: Option[DataFrame] = None
    var prevA: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val aRaw = edForAuth
        .join(h.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
      val aSum = aRaw.agg(coalesce(sum(col("ar")), lit(0.0)))
        .head().getDouble(0)
      require(aSum > 0.0, "hits: authority mass vanished (no edges?)")
      val aNext = graft.util.Caches.persistTracked(
        nodes.join(aRaw.withColumnRenamed("dst", "node"), Seq("node"),
            "left")
          .select(col("node"),
            (coalesce(col("ar"), lit(0.0)) / lit(aSum)).as("a")))
      aNext.count()
      prevA.foreach(_.unpersist())
      prevA = Some(aNext)
      a = aNext
      val hRaw = edForHub
        .join(a.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
      val hSum = hRaw.agg(coalesce(sum(col("hr")), lit(0.0)))
        .head().getDouble(0)
      require(hSum > 0.0, "hits: hub mass vanished (no edges?)")
      val hNext = graft.util.Caches.persistTracked(
        nodes.join(hRaw.withColumnRenamed("src", "node"), Seq("node"),
            "left")
          .select(col("node"),
            (coalesce(col("hr"), lit(0.0)) / lit(hSum)).as("h")))
      hNext.count()
      prevH.foreach(_.unpersist())
      prevH = Some(h)
      h = hNext
    }
    prevH.foreach(_.unpersist())
    nodes.join(a, "node").join(h.withColumnRenamed("h", "hub"), "node")
      .select(col("node"), col("a").as("authority"), col("hub"))
  }
}
