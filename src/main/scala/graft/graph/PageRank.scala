package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X83: PAGERANK over a directed edge set (Page et al. 1998 — public
  * knowledge) — the classic quality-centrality signal web-crawl
  * curation weights documents and hosts by (Common Crawl publishes
  * host-level ranks for exactly this use).
  *
  * Fixed-iteration power method with uniform teleport and dangling-mass
  * redistribution:
  * `pr'(v) = (1−d)/n + d·(Σ_{u→v} pr(u)/deg(u) + dangling/n)`.
  *
  * Distributed shape (the [[EntityResolution]] loop discipline): the
  * edge table is degree-joined, partitioned by `src` and checkpointed
  * ONCE — every iteration's contribution join re-exchanges only the
  * node-sized rank table onto that static partitioning, then one
  * `groupBy(dst)` aggregate (map-side combined) re-keys contributions;
  * so per-iteration shuffle volume is O(nodes), never O(edges). The
  * dangling mass is a broadcast 1-row aggregate riding the iteration's
  * own job (an anti-join aggregate over the node-sized rank table — no
  * driver round-trip). Ranks are eagerly localCheckpoint'ed per
  * iteration: materialized AND lineage-truncated, so every iteration
  * analyzes a constant-size plan (a persist chain instead grows
  * Catalyst re-analysis super-linearly with depth).
  *
  * Determinism: same float-accumulation caveat as every distributed sum
  * — values are stable to ulps under partitioning; consumers round
  * (the oracle checks round-6 ranks after 5 iterations). */
object PageRank {

  /** Ranks after `iterations` power steps. Nodes = src ∪ dst of the
    * edge set. Output: (node, pagerank) — raw doubles; callers round.
    * Σ pagerank = 1 up to float error (spec-checked). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = graft.util.Caches.persistTracked(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg"))
    // static per-iteration join input: edges with degree, partitioned by
    // src and checkpointed — the rank join never re-exchanges this side
    val ed = graft.util.Caches.trackCheckpointed(
      e.join(outdeg, "src").repartition(col("src")).localCheckpoint(true))
    val danglingNodes = graft.util.Caches.persistTracked(
      nodes.join(outdeg.select(col("src").as("node")), Seq("node"),
        "left_anti"))
    // eager localCheckpoint per iteration: materializes AND truncates
    // lineage, keeping the per-iteration plan CONSTANT-sized — a plain
    // persist chain embeds one more plan level per iteration and Catalyst
    // re-analysis grows super-linearly with depth (measured on the HITS
    // twin loop: iteration 5 ran 9x iteration 1 under persist)
    var pr = graft.util.Caches.trackCheckpointed(
      nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(true))
    for (_ <- 1 to iterations) {
      // dangling mass rides the iteration's own job as a broadcast
      // 1-row aggregate — no driver round-trip per iteration
      val dang = danglingNodes.join(pr, "node")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dang"))
      val contribs = ed
        .join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("deg")).as("__c"))
      pr = graft.util.Caches.trackCheckpointed(
        nodes.join(contribs.withColumnRenamed("dst", "node"),
            Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("__c"), lit(0.0)) +
                col("__dang") / lit(n.toDouble)))
              .as("pr"))
          .localCheckpoint(true))
    }
    pr.select(col("node"), col("pr").as("pagerank"))
  }

  /** X97: WEIGHTED PageRank — rank mass splits along out-edges in
    * proportion to EDGE WEIGHTS instead of uniformly
    * (`pr'(v) = (1−d)/n + d·(Σ_{u→v} pr(u)·w(u,v)/W(u) + dang/n)`,
    * `W(u) = Σ out-weights`): the form link graphs with
    * anchor-text/click counts actually use — a host linked once from a
    * nav bar and a host linked from every article should not receive
    * equal trust. Non-positive-weight edges are dropped up front (they
    * would corrupt W(u) and can make contributions negative); a node
    * whose every out-edge is dropped becomes dangling, exactly like a
    * node with no out-edges.
    *
    * Same loop discipline as [[pageRank]]: the weight-share-annotated
    * edge table (`w/W(u)` precomputed — one join at build time, never
    * per iteration) is partitioned by src and checkpointed once;
    * per-iteration shuffles stay node-sized; dangling mass rides the
    * iteration's job as a broadcast 1-row aggregate; ranks are eagerly
    * localCheckpoint'ed (constant-size plans). */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, damping: Double = 0.85,
      iterations: Int = 10): DataFrame = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("double").as("w"))
    // nodes come from ALL edges (a zero-weight out-edge still names its
    // endpoints); only the propagation drops non-positive weights
    val nodes = graft.util.Caches.persistTracked(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    val live = e.filter(col("w") > 0.0)
    val outw = live.groupBy(col("src"))
      .agg(sum(col("w")).as("__wsum"))
    val ed = graft.util.Caches.trackCheckpointed(
      live.join(outw, "src")
        .select(col("src"), col("dst"),
          (col("w") / col("__wsum")).as("__share"))
        .repartition(col("src")).localCheckpoint(true))
    val danglingNodes = graft.util.Caches.persistTracked(
      nodes.join(outw.select(col("src").as("node")), Seq("node"),
        "left_anti"))
    var pr = graft.util.Caches.trackCheckpointed(
      nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(true))
    for (_ <- 1 to iterations) {
      val dang = danglingNodes.join(pr, "node")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dang"))
      val contribs = ed
        .join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("__share")).as("__c"))
      pr = graft.util.Caches.trackCheckpointed(
        nodes.join(contribs.withColumnRenamed("dst", "node"),
            Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("__c"), lit(0.0)) +
                col("__dang") / lit(n.toDouble)))
              .as("pr"))
          .localCheckpoint(true))
    }
    pr.select(col("node"), col("pr").as("pagerank"))
  }

  /** X84: PERSONALIZED PageRank — teleport concentrated on a SEED set
    * instead of uniform (Haveliwala 2002 — public knowledge): the
    * "trust flows out from a curated whitelist" form quality-propagation
    * curation actually uses (seed a few known-good domains, rank
    * everything by how reachable it is from them; RefinedWeb-style
    * pipelines weight URLs this way). `pr'(v) = (1−d)·t(v) +
    * d·(Σ contribs + dangling·t(v))` with `t = 1/|seeds∩nodes|` on
    * seeds, 0 elsewhere — dangling mass also returns to the seeds, so
    * total mass stays 1 and unreachable nodes rank exactly 0·(1−d)
    * (spec-checked: a node with no path from the seeds scores 0).
    * Same loop discipline as [[pageRank]]: static degree-joined edge
    * checkpoint, node-sized per-iteration shuffles, deferred
    * unpersist. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      srcCol: String, dstCol: String, seedCol: String,
      damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val seedSet = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
    val ns = nodes.join(seedSet, "node").count()
    require(ns > 0, "personalizedPageRank: no seed is a graph node")
    // static teleport column: 1/|seeds ∩ nodes| on seeds, 0 elsewhere
    val nodesT = graft.util.Caches.persistTracked(
      nodes.join(seedSet.withColumn("__s", lit(1)), Seq("node"), "left")
        .select(col("node"),
          when(col("__s").isNotNull, lit(1.0 / ns)).otherwise(lit(0.0))
            .as("t")))
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val ed = graft.util.Caches.trackCheckpointed(
      e.join(outdeg, "src").repartition(col("src")).localCheckpoint(true))
    val danglingNodes = graft.util.Caches.persistTracked(
      nodesT.select(col("node"))
        .join(outdeg.select(col("src").as("node")), Seq("node"),
          "left_anti"))
    // same constant-plan loop discipline as [[pageRank]]
    var pr = graft.util.Caches.trackCheckpointed(
      nodesT.select(col("node"), col("t").as("pr")).localCheckpoint(true))
    for (_ <- 1 to iterations) {
      val dang = danglingNodes.join(pr, "node")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dang"))
      val contribs = ed
        .join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("deg")).as("__c"))
      pr = graft.util.Caches.trackCheckpointed(
        nodesT.join(contribs.withColumnRenamed("dst", "node"),
            Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"),
            (lit(1 - damping) * col("t") + lit(damping) *
              (coalesce(col("__c"), lit(0.0)) + col("__dang") * col("t")))
              .as("pr"))
          .localCheckpoint(true))
    }
    pr.select(col("node"), col("pr").as("pagerank"))
  }

  /** X168: KATZ CENTRALITY (Katz 1953 — public knowledge) —
    * `x'(v) = β + α·Σ_{u→v} x(u)`: influence that counts ALL inbound
    * walks, attenuated by length — the centrality that still ranks
    * nodes PageRank starves (a page linked by many zero-outdegree
    * leaves gets no PageRank mass from them next round, but Katz still
    * credits the walk). The complement of [[pageRank]] in the link-
    * quality toolbox: PageRank models a random surfer splitting mass
    * across out-links; Katz models raw reachability.
    *
    * ENGINE-STABLE EXACT-INTEGER iteration (the X160 TextRank
    * discipline): ranks are 1e9-scaled integers carried as
    * DECIMAL(38,0) (they can exceed LONG mid-loop on dense graphs —
    * decimal sums stay exact and order-free), β = 1 (scaled), α = the
    * rational `1/alphaInverse` applied as one floor division per edge
    * BEFORE the order-free integer sum. α must undercut 1/λ_max for
    * the series to converge; the default 1/8 covers in-degree-≤-8-ish
    * graphs, and with FIXED iterations any α still terminates —
    * divergence shows up as large (still exact) values, fail-loud at
    * the final LONG publish, never silent wraparound.
    *
    * Same loop discipline as [[pageRank]]: edges repartitioned by src
    * and localCheckpoint'ed ONCE, per-iteration exchanges node-sized,
    * ranks eagerly localCheckpoint'ed (constant-size plans). Output:
    * (node, katz_scaled, katz = scaled/1e9, one correctly-rounded
    * division). */
  def katzCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      alphaInverse: Int = 8, iterations: Int = 5): DataFrame = {
    // upper bound keeps the floor-division exact under Spark's
    // scale-6 HALF_UP decimal division: frac(x/d) ≤ (d−1)/d can only
    // round up to 1.000000 (corrupting the floor) once d ≥ 2e6
    require(alphaInverse >= 2 && alphaInverse <= 1000000,
      s"alphaInverse must be in [2, 1e6], got $alphaInverse")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val D = "decimal(38,0)"
    val S = 1000000000L
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = graft.util.Caches.persistTracked(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val ed = graft.util.Caches.trackCheckpointed(
      e.repartition(col("src")).localCheckpoint(true))
    var x = graft.util.Caches.trackCheckpointed(
      nodes.withColumn("x", lit(S).cast(D)).localCheckpoint(true))
    for (_ <- 1 to iterations) {
      val contribs = ed
        .join(x.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(floor(col("x") / lit(alphaInverse)).cast(D)).as("__c"))
      x = graft.util.Caches.trackCheckpointed(
        nodes.join(contribs.withColumnRenamed("dst", "node"),
            Seq("node"), "left")
          .select(col("node"),
            (lit(S).cast(D) + coalesce(col("__c"), lit(0).cast(D)))
              .cast(D).as("x"))
          .localCheckpoint(true))
    }
    // publish BIGINT (the d23 lesson: wide-DECIMAL outputs are
    // rendering-fragile cross-engine); overflow fails loud
    x.select(col("node"),
      when(col("x") > lit(Long.MaxValue).cast(D),
        raise_error(concat(lit("katzCentrality: rank overflow at node "),
          col("node").cast("string"),
          lit(" — alpha too large for this graph's spectrum"))))
        .otherwise(col("x").cast("long")).as("katz_scaled"),
      (col("x").cast("long").cast("double") / lit(1e9)).as("katz"))
  }
}
