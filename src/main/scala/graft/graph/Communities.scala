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
  * state is eagerly localCheckpoint'ed — materialized AND
  * lineage-truncated, keeping every iteration's analyzed plan
  * constant-sized (a persist chain grows Catalyst re-analysis
  * super-linearly with depth; measured 9x on iteration 5 of the HITS
  * loop).
  */
object Communities {

  /** X121: DEGREE DISTRIBUTION + POWER-LAW MLE — the first structural
    * report run on a link graph before tuning any degree cap (the X99
    * `maxDegree`, the crawl frontier's hub cutoff): one row per
    * distinct undirected degree with its node count, share, and
    * complementary CDF, plus the continuous-approximation maximum-
    * likelihood exponent `α = 1 + n_tail / Σ_{d≥dMin} c_d·ln(d/dMin)`
    * (Clauset–Shalizi–Newman 2009, public knowledge) repeated on
    * every row.
    *
    * Scale: degrees are one edge aggregate; everything after is
    * distinct-degree-sized. The CCDF rides the two-phase prefix sum
    * over (degree desc) — no global-order window even at extreme
    * degree cardinality. Counts/shares exact; α carries one
    * distributed ln-sum over distinct degrees, so α alone is
    * rounded to 6 (the D6 chi² convention). α is NULL when every
    * tail degree equals dMin (zero ln-mass). */
  def degreePowerLaw(edges: DataFrame, srcCol: String, dstCol: String,
      dMin: Long = 2L): DataFrame = {
    require(dMin >= 1, s"dMin must be >= 1, got $dMin")
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = e.select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b")).distinct()
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("__d"))
    val byDeg = deg.groupBy(col("__d").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
    val (ranked, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      byDeg, Seq(col("degree").desc), Seq("__cum" -> col("n_nodes")))
    val n = totals.head
    require(n > 0, "degreePowerLaw: empty edge set")
    val fit = ranked
      .filter(col("degree") >= dMin)
      .agg(sum(col("n_nodes")).as("__nt"),
        sum(col("n_nodes").cast("double") *
          log(col("degree").cast("double") / lit(dMin.toDouble)))
          .as("__lnsum"))
      .select(col("__nt"),
        round(when(col("__lnsum") > 0,
          lit(1.0) + col("__nt").cast("double") / col("__lnsum")), 6)
          .as("alpha"))
    ranked
      .crossJoin(broadcast(fit))
      .select(col("degree"), col("n_nodes"),
        (col("n_nodes").cast("double") / lit(n.toDouble)).as("share"),
        (col("__cum").cast("double") / lit(n.toDouble)).as("ccdf"),
        lit(dMin).as("d_min"), col("__nt").as("n_tail"), col("alpha"))
  }

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
  /** X184: GRAPH SHAPE REPORT — reciprocity + degree assortativity
    * (Newman 2002, 2003; the networkx degree-pair Pearson form —
    * public knowledge) of a DIRECTED edge list: the two dials that say
    * whether a similarity graph is NAVIGABLE before community ops
    * trust it. Reciprocity = the share of directed edges whose reverse
    * also exists (a k-NN graph full of one-way hub edges scores low —
    * the X183 mutuality cut removes exactly what this measures);
    * assortativity = the Pearson correlation of endpoint degrees over
    * the symmetrized edges (r < 0 ⇒ hub-and-spoke: hubs connect to
    * low-degree points, greedy graph search degrades; r > 0 ⇒
    * degree-stratified core).
    *
    * Exactness: self-loops dropped, duplicate directed edges
    * collapsed; degrees and all five Pearson moments are exact
    * integers in DECIMAL(38,0) (order-free sums; n·Σx² ≤ |E|²·|V| —
    * inside 38 digits to ~1e12 edges); r is ONE fixed IEEE tree with
    * the two variance roots taken separately (their decimal product
    * would overflow), published q6. Degenerate graphs (constant
    * degree ⇒ zero variance) emit NULL assortativity — a regular graph
    * has no degree mixing to measure. Scale: one distinct, one
    * intersect, one degree aggregate, two key joins — no all-pairs.
    * Output 1 row: (n_nodes, n_edges, n_reciprocal, reciprocity,
    * assortativity). */
  def graphShapeReport(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val D = "decimal(38,0)"
    val edges = graft.util.Caches.persistTracked(
      edges0.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
        .filter(col("__a") =!= col("__b")).distinct())
    val rev = edges.select(col("__b").as("__a"), col("__a").as("__b"))
    val eCount = edges.agg(count(lit(1)).as("n_edges"))
    val rCount = edges.intersect(rev)
      .agg(count(lit(1)).as("n_reciprocal"))
    val sym = graft.util.Caches.persistTracked(
      edges.unionByName(rev).distinct())
    val deg = sym.groupBy(col("__a")).agg(count(lit(1)).as("__d"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val pairs = sym
      .join(deg.select(col("__a"), col("__d").as("__dx")), "__a")
      .join(deg.select(col("__a").as("__b"), col("__d").as("__dy")),
        "__b")
    val m = pairs.agg(
      count(lit(1)).as("__n"),
      sum(col("__dx").cast(D)).as("__sx"),
      sum(col("__dy").cast(D)).as("__sy"),
      sum(col("__dx").cast(D) * col("__dy").cast(D)).as("__sxy"),
      sum(col("__dx").cast(D) * col("__dx").cast(D)).as("__sxx"),
      sum(col("__dy").cast(D) * col("__dy").cast(D)).as("__syy"))
    val n = col("__n").cast(D)
    val num = (n * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val vx = (n * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val vy = (n * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    import graft.functions.q6
    m.crossJoin(broadcast(nodes))
      .crossJoin(broadcast(eCount))
      .crossJoin(broadcast(rCount))
      .select(col("n_nodes"), col("n_edges"), col("n_reciprocal"),
        q6(when(col("n_edges") > 0,
          col("n_reciprocal").cast("double") /
            col("n_edges").cast("double"))).as("reciprocity"),
        q6(when(vx > 0 && vy > 0, num / (sqrt(vx) * sqrt(vy))))
          .as("assortativity"))
  }

  /** X186: GLOBAL CLUSTERING / TRANSITIVITY REPORT over an edge list
    * — the third graph-shape dimension [[graphShapeReport]] (X184)
    * lacks: reciprocity reads mutuality, assortativity degree mixing,
    * transitivity reads TRIANGLE CLOSURE — `3·T / W` (W = Σ d(d−1)/2
    * open-or-closed wedges; Watts–Strogatz / Newman, public
    * knowledge): do my neighbor's neighbors know each other (cluster
    * structure greedy graph search exploits), or is the graph
    * tree-like? Plus the AVERAGE LOCAL coefficient over nodes with
    * d ≥ 2 — the two disagree exactly when hubs are open (transitivity
    * low, average high), which IS the hub diagnosis.
    *
    * Exactness: the undirected simple graph and per-node triangle
    * counts come from [[triangleCounts]] verbatim (degree-oriented
    * wedge join — Σ min-degree orientation, never Σ d²); Σdeg, Σd(d−1)
    * and Σtri are exact DECIMAL sums whose DIV-2/DIV-3 finishes are
    * exact integers; transitivity is the pinned tree
    * `(2·Σtri)/Σd(d−1)` (= 3T/W — both sides carried doubled, one
    * ×2 exact, ONE division); each node's local coefficient is the
    * X91-published double, floor-scaled to a 1e12 LONG and summed in
    * DECIMAL (order-free), one division by the d ≥ 2 node count.
    * Published q6. Output 1 row: (n_nodes, n_edges, n_wedges,
    * n_triangles, transitivity, avg_clustering). */
  def clusteringReport(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val D = "decimal(38,0)"
    // the raw edge list materializes ONCE: it is consumed twice below
    // (triangle kernel + degree census), and when the caller hands in a
    // whole pipeline (X186: the knnGraph build; the store view), an
    // unpersisted plan would execute end-to-end twice in this one job
    val e = graft.util.Caches.persistTracked(
      edges0.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b")))
    val per = triangleCounts(e, "a", "b")
    val und = e.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    import graft.functions.q6
    deg.join(per, Seq("node"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("deg").cast(D)).as("__sd"),
        sum(col("deg").cast(D) * (col("deg") - 1).cast(D)).as("__w2"),
        sum(col("n_triangles").cast(D)).as("__t3"),
        sum(when(col("deg") >= 2,
          floor(col("clustering_coef") * lit(1e12) + lit(0.5))
            .cast("long")).cast(D)).as("__sc"),
        sum(when(col("deg") >= 2, lit(1L)).otherwise(lit(0L)))
          .as("__nc"))
      .selectExpr("n_nodes",
        "CAST(__sd AS BIGINT) DIV 2 AS n_edges",
        "CAST(__w2 AS BIGINT) DIV 2 AS n_wedges",
        "CAST(__t3 AS BIGINT) DIV 3 AS n_triangles",
        "__w2", "__t3", "__sc", "__nc")
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        q6(when(col("__w2").cast("double") > 0,
          (lit(2.0) * col("__t3").cast("double")) /
            col("__w2").cast("double"))).as("transitivity"),
        q6(when(col("__nc") > 0,
          (col("__sc").cast("double") / lit(1e12)) /
            col("__nc").cast("double"))).as("avg_clustering"))
  }

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
    // und holds both orientations, so src alone already covers all
    // nodes; eager localCheckpoint per iteration materializes AND
    // truncates lineage — constant per-iteration plan size (see
    // [[PageRank]]: a persist chain grows Catalyst re-analysis
    // super-linearly with iteration depth)
    var lbl = graft.util.Caches.trackCheckpointed(
      und.select(col("a").as("node")).distinct()
        .withColumn("lab", col("node")).localCheckpoint(true))
    for (_ <- 1 to iterations) {
      val cnt = und
        .join(lbl.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a"), col("lab"))
        .agg(count(lit(1)).as("c"))
      // most frequent neighbour label, tie -> smallest label: max_by on
      // (count, -label) — a struct max, deterministic
      lbl = graft.util.Caches.trackCheckpointed(
        cnt.groupBy(col("a"))
          .agg(max_by(col("lab"),
            struct(col("c"), (-col("lab")).as("nl"))).as("lab"))
          .withColumnRenamed("a", "node").localCheckpoint(true))
    }
    lbl.select(col("node"), col("lab").as("community"))
  }

  /** X91: per-node TRIANGLE COUNTS + local clustering coefficient —
    * the cohesion signal that separates genuinely interlinked
    * communities (mirror farms, topic hubs) from star-shaped link spam
    * with the same degree. Edge-iterator algorithm with DEGREE
    * ORIENTATION (Suri & Vassilvitskii 2011, public knowledge): orient
    * every undirected edge from its lower-(degree, id) endpoint to the
    * higher one, enumerate wedges at each pivot's out-neighbours, and
    * close them against the canonical edge set. Every triangle has
    * exactly one pivot whose both edges point outward under this
    * order, so each is found ONCE; out-degrees are bounded by O(√m),
    * so candidate wedges are O(m^1.5) — never the naive Σ deg² that a
    * hub node explodes.
    *
    * Scale shape: the oriented edge list is partitioned by pivot and
    * checkpointed; the wedge self-join co-locates on it; the closing
    * join is one exchange on the canonical (lo, hi) pair. Per-node
    * counts explode each triangle's 3 corners (3 rows per triangle)
    * into a map-side-combined aggregate.
    *
    * `clustering_coef = 2T(v) / (deg(v)·(deg(v)−1))` is one
    * correctly-rounded IEEE division of exact integers — bit-identical
    * cross-engine; degree-0/1 nodes score 0 by convention.
    *
    * Output: (node, n_triangles, clustering_coef), every graph node. */
  /** X113: NEWMAN MODULARITY of a community assignment (Newman &
    * Girvan 2004, public knowledge) — the standard "are these
    * communities better than chance" score the X85 labels need before
    * anyone acts on them: `Q = Σ_c (e_c/m − (d_c/2m)²)` over the
    * undirected simple graph (m unordered edges, e_c intra-community
    * edges, d_c summed degrees). Every term is an exact integer count
    * through two fixed IEEE divisions — bit-identical cross-engine, no
    * rounding.
    *
    * Shape: one unordered-distinct edge projection, two label joins on
    * edge endpoints (node-keyed), communities-sized aggregates. A
    * node missing from `assignment` contributes degree to no
    * community and its edges count inside none (strict-join
    * semantics, documented). Output: one row per community —
    * (community, n_nodes, e_in, d_tot, q_c); Σ q_c is the graph's
    * modularity. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      assignment: DataFrame, nodeCol: String, communityCol: String)
      : DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = graft.util.Caches.persistTracked(
      e.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b")).distinct())
    val m = und.count()
    require(m > 0, "modularity needs at least one edge")
    val labels = assignment.select(
      col(nodeCol).cast("long").as("__n"),
      col(communityCol).as("community"))
    val deg = und.select(col("a").as("__n"))
      .unionByName(und.select(col("b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    val dTot = deg.join(labels, "__n")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__d")).as("d_tot"))
    val eIn = und
      .join(labels.select(col("__n").as("a"),
        col("community").as("__ca")), "a")
      .join(labels.select(col("__n").as("b"),
        col("community").as("__cb")), "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("e_in"))
    dTot.join(eIn, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        (coalesce(col("e_in"), lit(0L)).cast("double") / m -
          (col("d_tot").cast("double") / (2.0 * m)) *
            (col("d_tot").cast("double") / (2.0 * m))).as("q_c"))
  }

  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // canonical undirected simple edges: (lo, hi), no self-loops
    val und = graft.util.Caches.trackCheckpointed(
      e.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
        .repartition(col("a"), col("b")).localCheckpoint(true))
    val deg = graft.util.Caches.persistTracked(
      und.select(col("a").as("node"))
        .unionByName(und.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    // degree orientation: u -> v iff (deg(u), u) < (deg(v), v)
    val dir = graft.util.Caches.trackCheckpointed(
      und.join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("v")))
            .otherwise(struct(col("b").as("u"), col("a").as("v")))
            .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(col("u")).localCheckpoint(true))
    // wedges at each pivot, corners id-canonical to match `und`
    val wedges = dir.select(col("u"), col("v").as("x"))
      .join(dir.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))
    val tri = wedges.join(und,
      wedges("x") === und("a") && wedges("y") === und("b"))
      .select(col("u"), col("x"), col("y"))
    val perNode = tri.select(explode(array(col("u"), col("x"),
        col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(
            (coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") /
              (col("deg") * (col("deg") - 1)).cast("double"))
          .as("clustering_coef"))
  }

  /** X93: K-CORE extraction (Seidman 1983, public knowledge) — the
    * maximal subgraph where every node keeps >= k neighbours INSIDE the
    * subgraph: the standard "structurally engaged" cut that degree
    * alone can't make (a degree-k node whose neighbours all peel away
    * is not in the core). Web-graph curation uses it to separate
    * densely interlinked content from chains of pointers.
    *
    * Synchronous peeling to the FIXPOINT: each round recomputes
    * within-subgraph degrees and drops every node below k at once —
    * deterministic (no peel order), and over-iterating past
    * convergence is a no-op, which is what lets a fixed-unroll SQL
    * oracle mirror a converged run exactly.
    *
    * Scale shape: the undirected edge set is checkpointed ONCE; each
    * round is two semi-joins of edges against the (shrinking)
    * member table + one degree aggregate; membership is eagerly
    * localCheckpoint'ed per round (constant-size plans, the
    * [[PageRank]] discipline). The driver sees one count per round —
    * peeling rounds, not nodes. Returns the member nodes. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val und = graft.util.Caches.trackCheckpointed(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b")).distinct()
        .repartition(col("a")).localCheckpoint(true))
    var members = graft.util.Caches.trackCheckpointed(
      und.select(col("a").as("node")).distinct().localCheckpoint(true))
    var n = members.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      it += 1
      val next = graft.util.Caches.trackCheckpointed(
        und
          .join(members.withColumnRenamed("node", "a"), "a")
          .join(members.withColumnRenamed("node", "b"), "b")
          .groupBy(col("a")).agg(count(lit(1)).as("__d"))
          .filter(col("__d") >= k)
          .select(col("a").as("node")).localCheckpoint(true))
      val nn = next.count()
      converged = nn == n
      n = nn
      members = next
    }
    members
  }

  /** X86: HITS hubs & authorities (Kleinberg 1999, public knowledge) by
    * fixed-iteration mutual recursion with L1 normalization:
    * `a'(v) = Σ_{u→v} h(u)`, then `h'(v) = Σ_{v→u} a'(u)`, output
    * scaled to total mass 1 — so scores are directly comparable
    * across graphs and iterations (the eigenvector direction is the
    * same as the classic L2 form; only the scale differs).
    *
    * The iteration is LINEAR in the score vector, so per-step L1
    * scalars propagate multiplicatively: normalizing ONCE at the end
    * yields the same direction as normalizing every half-step, and
    * the loop needs no normalization joins, no node-completion
    * left-joins (a node absent from a half-step's aggregate IS its
    * zero contribution to the next join) and no broadcasts — each
    * iteration is exactly 2 edge joins + 2 node-sized aggregates,
    * the information-flow minimum. Magnitudes stay bounded:
    * (1/n)·(max deg)^(2·iters) sits comfortably inside double range
    * for any real graph at the default 5 iterations.
    *
    * Scale shape: TWO static edge checkpoints — one partitioned by dst
    * (authority half joins hubs on src, aggregates to dst), one by src
    * (hub half joins authorities on dst, aggregates to src) — so both
    * half-steps re-exchange only the node-sized score table.
    * Iterations make NO driver round-trips and never scan edges twice.
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
    require(n > 0, "hits: empty edge set")
    val edForAuth = graft.util.Caches.trackCheckpointed(
      e.repartition(col("src")).localCheckpoint(true))
    val edForHub = graft.util.Caches.trackCheckpointed(
      e.repartition(col("dst")).localCheckpoint(true))
    var h = graft.util.Caches.trackCheckpointed(
      nodes.withColumn("s", lit(1.0 / n)).localCheckpoint(true))
    var a: DataFrame = null
    for (_ <- 1 to iterations) {
      // eager localCheckpoint: materializes AND truncates lineage — the
      // a/h mutual recursion otherwise embeds 2 plan levels per
      // iteration and Catalyst re-analysis grows super-linearly
      // (measured: iteration 5 ran 9x iteration 1 under plain persist)
      a = graft.util.Caches.trackCheckpointed(
        edForAuth
          .join(h.withColumnRenamed("node", "src")
            .withColumnRenamed("s", "__hs"), "src")
          .groupBy(col("dst")).agg(sum(col("__hs")).as("s"))
          .withColumnRenamed("dst", "node")
          .localCheckpoint(true))
      h = graft.util.Caches.trackCheckpointed(
        edForHub
          .join(a.withColumnRenamed("node", "dst")
            .withColumnRenamed("s", "__as"), "dst")
          .groupBy(col("src")).agg(sum(col("__as")).as("s"))
          .withColumnRenamed("src", "node")
          .localCheckpoint(true))
    }
    // the single L1 normalization: with >= 1 edge both sums are
    // strictly positive by induction (every out-neighbor has an
    // in-edge, so positivity flows through each half-step)
    val aSum = a.agg(sum(col("s")).as("__asum"))
    val hSum = h.agg(sum(col("s")).as("__hsum"))
    nodes
      .join(a.withColumnRenamed("s", "__ar"), Seq("node"), "left")
      .join(h.withColumnRenamed("s", "__hr"), Seq("node"), "left")
      .crossJoin(broadcast(aSum))
      .crossJoin(broadcast(hSum))
      .select(col("node"),
        (coalesce(col("__ar"), lit(0.0)) / col("__asum")).as("authority"),
        (coalesce(col("__hr"), lit(0.0)) / col("__hsum")).as("hub"))
  }
}
