package graft.queries

import graft.Tables.t
import graft.graph.EntityResolution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution coverage (SURVEY.md §2.12). The id-mapping graph is
  * derived deterministically from `customer`: each customer key k has a
  * customer id `c:k` and an email id `e:k`, and customers 2m/2m+1 share
  * phone id `p:m` — components of five vertices whose canonical label is
  * the minimum id string. The DuckDB oracle computes the same components
  * with a recursive transitive-closure CTE. */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    c.select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("e:"), col("c_custkey")).as("dst"),
        lit(1.0).as("confidence"))
      .unionByName(c.select(
        concat(lit("e:"), col("c_custkey")).as("src"),
        concat(lit("p:"), (col("c_custkey") / 2).cast("long")).as("dst"),
        lit(0.9).as("confidence")))
  }

  /** Shared G3/G4 fixture: labeled customer pairs — planted
    * transposed-name matches, adjacent-id non-matches, and a few
    * unlabeled probes — with 0/1 field agreements (JW-name at 0.985,
    * nation, segment). */
  private def linkagePairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.JaroWinklerExpr.register(s)
    val c = t(s, dir, "customer").select(
      col("c_custkey").as("cid"), col("c_name").as("name"),
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"))
    val b = c.select(col("cid").as("cid_b"), col("name").as("name_b"),
      col("nat").as("nat_b"), col("seg").as("seg_b"))
    val matches = c.filter(col("cid") % 7 === 0).select(
      col("cid").as("id_a"), (col("cid") + 100000).as("id_b"),
      col("name").as("name_a"),
      concat(substring(col("name"), 1, 16), substring(col("name"), 18, 1),
        substring(col("name"), 17, 1)).as("name_b"),
      col("nat").as("nat_a"), col("nat").as("nat_b"),
      col("seg").as("seg_a"), col("seg").as("seg_b"),
      lit(1).as("label"))
    def shifted(offset: Int, modFilter: Int, label: Option[Int]) = c
      .filter(col("cid") % modFilter === 0)
      .join(b, col("cid_b") === col("cid") + offset)
      .select(col("cid").as("id_a"), col("cid_b").as("id_b"),
        col("name").as("name_a"), col("name_b"),
        col("nat").as("nat_a"), col("nat_b"),
        col("seg").as("seg_a"), col("seg_b"),
        label.map(lit(_)).getOrElse(lit(null).cast("int")).as("label"))
    matches.unionByName(shifted(1, 5, Some(0)))
      .unionByName(shifted(2, 11, None))
      .select(col("id_a"), col("id_b"), col("label"),
        (call_function("graft_jw", col("name_a"), col("name_b")) >= 0.985)
          .cast("int").as("name_agree"),
        (col("nat_a") === col("nat_b")).cast("int").as("nation_agree"),
        (col("seg_a") === col("seg_b")).cast("int").as("seg_agree"))
  }

  /** Shared q_g4 pipeline: blocking quality of the X137 JW
    * neighborhood join against the planted transposed-name truth
    * pairs. The 0.985 cut is taken on the QUANTIZED-6 jw score (both
    * this side and the DuckDB oracle) so a sub-ulp cross-engine jw
    * difference can never flip a pair's candidate membership. */
  private def g4Report(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val base = c.select(col("c_custkey").as("cid"),
      col("c_name").as("name"))
    val mutated = c.filter(col("c_custkey") % 7 === 0)
      .select((col("c_custkey") + 100000).as("cid"),
        concat(substring(col("c_name"), 1, 16),
          substring(col("c_name"), 18, 1),
          substring(col("c_name"), 17, 1)).as("name"))
    val corpus = base.unionByName(mutated)
    val n = corpus.count()
    val cands = graft.text.Fuzzy.jwNeighborhoodJoin(corpus, "cid",
      col("name"), window = 4, minSim = 0.5)
      .filter(graft.functions.q6(col("jw")) >= 0.985)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val truth = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("a"),
        (col("c_custkey") + 100000).as("b"))
    graft.graph.EntityResolution.blockingQuality(cands, truth,
      "a", "b", n)
  }

  val queries: Map[String, Q] = Map(
    // G3: Fellegi-Sunter probabilistic linkage — m/u weights from the
    // labeled pairs, every pair scored by summed field log-weights.
    "q_g3_fellegi_sunter" -> { (s, dir) =>
      graft.graph.EntityResolution.fellegiSunter(linkagePairs(s, dir),
        Seq("name_agree", "nation_agree", "seg_agree"), "label",
        threshold = 2.0)
        .orderBy(col("id_a"), col("id_b"))
    },

    // G4: blocking quality of the X137 JW neighborhood join against
    // the planted transposed-name truth pairs. Two version-hardenings
    // vs the r11 driver-red (judge: zero cell diffs on DuckDB 1.0.0):
    // the jw cut is taken on the QUANTIZED-6 score on both sides so
    // sub-ulp engine drift can't flip candidate membership, and
    // n_all_pairs publishes as BIGINT (wide-DECIMAL pandas rendering
    // is DuckDB-version-dependent; see q_d23).
    "q_g4_blocking_quality" -> { (s, dir) =>
      g4Report(s, dir)
        .withColumn("n_all_pairs", col("n_all_pairs").cast("long"))
    },

    // G4 debug variant: the same report unpivoted to all-VARCHAR
    // (field, value) rows — rendering-proof (see q_d23_fanout_cells).
    "q_g4_blocking_cells" -> { (s, dir) =>
      val r = g4Report(s, dir)
      r.select(explode(array(r.columns.map(c =>
          struct(lit(c).as("field"),
            col(c).cast("string").as("value"))): _*)).as("kv"))
        .select(col("kv.field").as("field"), col("kv.value").as("value"))
        .orderBy(col("field"))
    },

    // G1: connected components by iterative min-label propagation.
    "q_g1_connected_components" -> { (s, dir) =>
      EntityResolution.connectedComponents(edges(s, dir), "src", "dst")
        .orderBy(col("v"))
    },

    // G2: resolve email ids to the phone id of the same component.
    "q_g2_resolve_ids" -> { (s, dir) =>
      EntityResolution.resolve(edges(s, dir), "src", "dst",
        "confidence", minConfidence = 0.5, fromType = "e", toType = "p")
        .orderBy(col("from_id"))
    },

    // X84: personalized PageRank from a curated seed set (doc_id % 25
    // == 0) over the same synthetic link graph — trust flows out of the
    // seeds; unreachable nodes rank exactly 0.
    "q_x84_personalized_pagerank" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.PageRank.personalizedPageRank(es,
        docs.filter(col("doc_id") % 25 === 0), "src", "dst", "doc_id",
        damping = 0.85, iterations = 5)
        .select(col("node"), round(col("pagerank"), 6).as("pagerank"))
        .orderBy(col("node"))
    },

    // X98: multi-source BFS hop distance from the curated seed set
    // (doc_id % 25 == 0) over the scrambled link graph, 6 hops —
    // reached nodes only; oracle = recursive-CTE min path length.
    "q_x98_bfs_hops" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.Paths.bfsHops(es, "src", "dst",
        docs.filter(col("doc_id") % 25 === 0), "doc_id", maxHops = 6)
        .orderBy(col("node"))
    },

    // X108: deterministic random-walk corpus — 8-step hash-indexed
    // walks from the seed set over the scrambled link graph (the
    // DeepWalk data-generation stage, re-runnable bit-for-bit).
    "q_x108_random_walks" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.Paths.randomWalks(es, "src", "dst",
        docs.filter(col("doc_id") % 25 === 0), "doc_id", length = 8)
        .orderBy(col("walk_id"), col("step"))
    },

    // X107: weighted shortest distances from the seed set over the
    // scrambled link graph with x97's integer weights — 6 Bellman-Ford
    // relaxation rounds, exact long distances.
    "q_x107_weighted_paths" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .withColumn("w", (col("src") * 7 + col("dst")) % 5 + 1)
      graft.graph.Paths.weightedDistances(es, "src", "dst", "w",
        docs.filter(col("doc_id") % 25 === 0), "doc_id", rounds = 6)
        .orderBy(col("node"))
    },

    // X99: Adamic-Adar link prediction over the planted block graph —
    // non-adjacent pairs scored by sum(1/ln(deg)) over shared
    // neighbors; one wedge join, existing edges anti-joined away.
    "q_x99_adamic_adar" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val es = docs.select(col("doc_id").as("src"),
        explode(array((1 to 2).map(j =>
          (col("doc_id") - col("doc_id") % 16) +
            ((col("doc_id") % 16) * 3 + j) % 16): _*)).as("dst"))
      graft.graph.LinkPrediction.adamicAdar(es, "src", "dst")
        .withColumn("score", graft.functions.q6(col("score")))
        .orderBy(col("node_a"), col("node_b"))
    },

    // X85: label-propagation communities over a planted block graph
    // (each doc links to 2 scrambled positions inside its 16-doc block)
    // — 4 synchronous iterations, ties to the smallest label; the
    // DuckDB oracle replays the same iterations with a window pick.
    "q_x85_label_propagation" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val es = docs.select(col("doc_id").as("src"),
        explode(array((1 to 2).map(j =>
          (col("doc_id") - col("doc_id") % 16) +
            ((col("doc_id") % 16) * 3 + j) % 16): _*)).as("dst"))
      graft.graph.Communities.labelPropagation(es, "src", "dst",
        iterations = 4)
        .orderBy(col("node"))
    },

    // X115: labeled link-prediction training pairs over the block
    // graph — positives = undirected edges, negatives = 2 hash-
    // proposed non-edges per node, collisions anti-joined away.
    "q_x115_negative_sampling" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
        explode(array((1 to 2).map(j =>
          (col("doc_id") - col("doc_id") % 16) +
            ((col("doc_id") % 16) * 3 + j) % 16): _*)).as("dst"))
      graft.graph.LinkPrediction.negativeSampledPairs(
        es, "src", "dst", nNodes = n, perNode = 2)
        .orderBy(col("src"), col("dst"), col("label"))
    },

    // X113: Newman modularity of the X85 LPA communities over the same
    // block graph — per-community e_c/m - (d_c/2m)^2, exact counts
    // through two fixed IEEE divisions.
    "q_x113_modularity" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val es = docs.select(col("doc_id").as("src"),
        explode(array((1 to 2).map(j =>
          (col("doc_id") - col("doc_id") % 16) +
            ((col("doc_id") % 16) * 3 + j) % 16): _*)).as("dst"))
      val labels = graft.graph.Communities.labelPropagation(
        es, "src", "dst", iterations = 4)
      graft.graph.Communities.modularity(es, "src", "dst",
        labels, "node", "community")
        .orderBy(col("community"))
    },

    // X86: HITS hubs/authorities over the same scrambled link graph as
    // q_x83 — 5 L1-normalized mutual-recursion iterations, round-6
    // scores oracle-checked.
    "q_x86_hits" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.Communities.hits(es, "src", "dst", iterations = 5)
        .select(col("node"), round(col("authority"), 6).as("authority"),
          round(col("hub"), 6).as("hub"))
        .orderBy(col("node"))
    },

    // X121: degree distribution + CSN power-law MLE over a hub-heavy
    // planted graph (each doc links to hubs drawn from moduli 4/16/64,
    // so in-degree varies across orders of magnitude) — per-degree
    // counts/share/ccdf (two-phase suffix-counts), alpha at dMin = 2
    // round-6.
    "q_x121_degree_powerlaw" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 7 + j) % math.pow(4, j).toLong): _*))
            .as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.Communities.degreePowerLaw(es, "src", "dst", dMin = 2)
        .orderBy(col("degree"))
    },

    // X91: per-node triangle counts + clustering coefficient over the
    // same planted block graph as q_x85 (dense 16-doc blocks are
    // triangle-rich; the coefficient is an exact-integer division).
    "q_x91_triangle_count" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val es = docs.select(col("doc_id").as("src"),
        explode(array((1 to 2).map(j =>
          (col("doc_id") - col("doc_id") % 16) +
            ((col("doc_id") % 16) * 3 + j) % 16): _*)).as("dst"))
      graft.graph.Communities.triangleCounts(es, "src", "dst")
        .orderBy(col("node"))
    },

    // X93: 3-core of the planted block graph — synchronous peeling to
    // the fixpoint; the oracle unrolls 6 rounds (converges in 2 at
    // sf0.01; over-unrolling past the fixpoint is a no-op).
    "q_x93_kcore" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val es = docs.select(col("doc_id").as("src"),
        explode(array((1 to 2).map(j =>
          (col("doc_id") - col("doc_id") % 16) +
            ((col("doc_id") % 16) * 3 + j) % 16): _*)).as("dst"))
      graft.graph.Communities.kCore(es, "src", "dst", k = 3)
        .orderBy(col("node"))
    },

    // X97: WEIGHTED PageRank over the same scrambled graph with
    // deterministic integer edge weights ((src·7+dst) mod 5 + 1) —
    // rank mass splits by weight share instead of uniformly.
    "q_x97_weighted_pagerank" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .withColumn("w",
          ((col("src") * 7 + col("dst")) % 5 + 1).cast("double"))
      graft.graph.PageRank.weightedPageRank(es, "src", "dst", "w",
        damping = 0.85, iterations = 5)
        .select(col("node"), round(col("pagerank"), 6).as("pagerank"))
        .orderBy(col("node"))
    },

    // X83: PageRank quality centrality over a deterministic synthetic
    // link graph (each doc links to (id·31 + 7j) mod N for j = 1..3,
    // self-links dropped — a scrambled, hub-forming shape both engines
    // construct identically); 5 power iterations, damping 0.85,
    // dangling mass redistributed, round-6 ranks oracle-checked.
    "q_x83_pagerank" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.PageRank.pageRank(es, "src", "dst",
        damping = 0.85, iterations = 5)
        .select(col("node"), round(col("pagerank"), 6).as("pagerank"))
        .orderBy(col("node"))
    },

    // X168: Katz centrality over the same synthetic link graph as x83
    // — exact 1e9-scaled-integer walk mass, alpha = 1/8 as per-edge
    // floor division, checkpointed src-partitioned edges, node-sized
    // per-iteration shuffles.
    "q_x168_katz" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val es = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            (col("doc_id") * 31 + j * 7) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.PageRank.katzCentrality(es, "src", "dst",
        alphaInverse = 8, iterations = 5)
        .orderBy(col("node"))
    })

  private val edgeCte =
    """base AS (
      |  SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS src,
      |    'e:' || CAST(c_custkey AS VARCHAR) AS dst
      |  FROM customer
      |  UNION ALL
      |  SELECT 'e:' || CAST(c_custkey AS VARCHAR),
      |    'p:' || CAST(c_custkey // 2 AS VARCHAR)
      |  FROM customer),
      |edges AS (
      |  SELECT src AS a, dst AS b FROM base
      |  UNION SELECT dst, src FROM base)""".stripMargin

  /** DuckDB mirror of [[graft.graph.PageRank.pageRank]] at q_x83's
    * settings: 5 power iterations unrolled, damping CAST to DOUBLE so
    * `1 − d` is the same IEEE 0.15000000000000002 the Scala side
    * computes, dangling mass via the same anti-join aggregate. */
  private val pageRankOracle: String = {
    val d = "CAST(0.85 AS DOUBLE)"
    def iter(k: Int): String = {
      val p = s"pr${k - 1}"
      s"""dang$k AS (
         |  SELECT coalesce(sum(p.pr), CAST(0 AS DOUBLE)) AS dang
         |  FROM $p p LEFT JOIN od ON od.src = p.v
         |  WHERE od.src IS NULL),
         |pr$k AS (
         |  SELECT nodes.v,
         |    (1 - $d) / (SELECT n FROM nn) + $d *
         |      (coalesce(s.c, CAST(0 AS DOUBLE)) +
         |        (SELECT dang FROM dang$k) / (SELECT n FROM nn)) AS pr
         |  FROM nodes
         |  LEFT JOIN (
         |    SELECT ed.dst, sum(p.pr / od.deg) AS c
         |    FROM ed JOIN $p p ON p.v = ed.src
         |    JOIN od ON od.src = ed.src
         |    GROUP BY ed.dst) s ON s.dst = nodes.v)""".stripMargin
    }
    s"""WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |ed AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
       |    FROM documents, n0, range(1, 4) AS r(j))
       |  WHERE src <> dst),
       |nodes AS (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM ed
       |       GROUP BY src),
       |pr0 AS (SELECT v, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr
       |        FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT v AS node, round(pr, 6) AS pagerank
       |FROM pr5 ORDER BY v""".stripMargin
  }

  /** DuckDB mirror of [[graft.graph.PageRank.katzCentrality]] at
    * q_x168's settings: unrolled iterations, HUGEINT rank mass,
    * `x // 8` floor attenuation per edge — bit-identical by
    * construction. */
  private val katzOracle: String = {
    def iter(k: Int): String = {
      val p = s"x${k - 1}"
      s"""x$k AS (
         |  SELECT nodes.v,
         |    CAST(1000000000 AS HUGEINT) +
         |      coalesce(s.c, CAST(0 AS HUGEINT)) AS x
         |  FROM nodes LEFT JOIN (
         |    SELECT ed.dst, sum(p.x // 8) AS c
         |    FROM ed JOIN $p p ON p.v = ed.src
         |    GROUP BY ed.dst) s ON s.dst = nodes.v)""".stripMargin
    }
    s"""WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |ed AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
       |    FROM documents, n0, range(1, 4) AS r(j))
       |  WHERE src <> dst),
       |nodes AS (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)),
       |x0 AS (SELECT v, CAST(1000000000 AS HUGEINT) AS x FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT v AS node, CAST(x AS BIGINT) AS katz_scaled,
       |  CAST(CAST(x AS BIGINT) AS DOUBLE) / 1000000000.0 AS katz
       |FROM x5 ORDER BY v""".stripMargin
  }

  /** DuckDB mirror of
    * [[graft.graph.PageRank.personalizedPageRank]] at q_x84's settings:
    * teleport `t(v) = 1/|seeds ∩ nodes|` on seeds, 0 elsewhere; same
    * IEEE-parity literal handling as the uniform oracle. */
  private val personalizedPageRankOracle: String = {
    val d = "CAST(0.85 AS DOUBLE)"
    def iter(k: Int): String = {
      val p = s"pr${k - 1}"
      s"""dang$k AS (
         |  SELECT coalesce(sum(p.pr), CAST(0 AS DOUBLE)) AS dang
         |  FROM $p p LEFT JOIN od ON od.src = p.v
         |  WHERE od.src IS NULL),
         |pr$k AS (
         |  SELECT tv.v,
         |    (1 - $d) * tv.t + $d *
         |      (coalesce(s.c, CAST(0 AS DOUBLE)) +
         |        (SELECT dang FROM dang$k) * tv.t) AS pr
         |  FROM tv
         |  LEFT JOIN (
         |    SELECT ed.dst, sum(p.pr / od.deg) AS c
         |    FROM ed JOIN $p p ON p.v = ed.src
         |    JOIN od ON od.src = ed.src
         |    GROUP BY ed.dst) s ON s.dst = tv.v)""".stripMargin
    }
    s"""WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |ed AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
       |    FROM documents, n0, range(1, 4) AS r(j))
       |  WHERE src <> dst),
       |nodes AS (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)),
       |sd AS (SELECT DISTINCT doc_id FROM documents
       |       WHERE doc_id % 25 = 0),
       |ns AS (SELECT count(*) AS c FROM nodes JOIN sd
       |       ON sd.doc_id = nodes.v),
       |tv AS (
       |  SELECT nodes.v,
       |    CASE WHEN sd.doc_id IS NOT NULL
       |      THEN CAST(1 AS DOUBLE) / (SELECT CAST(c AS DOUBLE) FROM ns)
       |      ELSE CAST(0 AS DOUBLE) END AS t
       |  FROM nodes LEFT JOIN sd ON sd.doc_id = nodes.v),
       |od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM ed
       |       GROUP BY src),
       |pr0 AS (SELECT v, t AS pr FROM tv),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT v AS node, round(pr, 6) AS pagerank
       |FROM pr5 ORDER BY v""".stripMargin
  }

  /** DuckDB mirror of [[graft.graph.Communities.labelPropagation]] at
    * q_x85's settings: 4 synchronous iterations unrolled; each picks
    * the most frequent neighbour label with a (count DESC, label ASC)
    * window — exactly the Scala side's `max_by(lab, (c, -lab))`. */
  private val labelPropagationOracle: String = {
    def iter(k: Int): String = {
      val p = s"lbl${k - 1}"
      s"""cnt$k AS (
         |  SELECT u.a AS v, l.lab, count(*) AS c
         |  FROM und u JOIN $p l ON l.v = u.b
         |  GROUP BY u.a, l.lab),
         |lbl$k AS (
         |  SELECT v, lab FROM (
         |    SELECT v, lab, row_number() OVER (PARTITION BY v
         |      ORDER BY c DESC, lab) AS rn
         |    FROM cnt$k) WHERE rn = 1)""".stripMargin
    }
    s"""WITH ed0 AS (
       |  SELECT doc_id AS a,
       |    (doc_id - doc_id % 16) + ((doc_id % 16) * 3 + j) % 16 AS b
       |  FROM documents, range(1, 3) AS r(j)),
       |und AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM ed0 WHERE a <> b
       |    UNION ALL
       |    SELECT b, a FROM ed0 WHERE a <> b)),
       |lbl0 AS (SELECT DISTINCT a AS v, a AS lab FROM und),
       |${(1 to 4).map(iter).mkString(",\n")}
       |SELECT v AS node, lab AS community FROM lbl4 ORDER BY v""".stripMargin
  }

  /** q_x113 oracle: the LPA chain above, then Newman modularity over
    * the unordered simple edge set — identical IEEE expression tree. */
  private val modularityOracle: String = {
    val chain = labelPropagationOracle
      .stripSuffix("\nSELECT v AS node, lab AS community FROM lbl4 ORDER BY v")
    s"""$chain,
       |umod AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
       |         FROM und),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM umod),
       |degm AS (
       |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
       |    SELECT a AS n FROM umod UNION ALL SELECT b FROM umod)
       |  GROUP BY n),
       |lab AS (SELECT v AS n, lab AS community FROM lbl4),
       |dt AS (
       |  SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(d) AS BIGINT) AS d_tot
       |  FROM degm JOIN lab USING (n) GROUP BY 1),
       |ei AS (
       |  SELECT la.community, CAST(count(*) AS BIGINT) AS e_in
       |  FROM umod u JOIN lab la ON la.n = u.a JOIN lab lb ON lb.n = u.b
       |  WHERE la.community = lb.community GROUP BY 1)
       |SELECT dt.community AS community, n_nodes,
       |  coalesce(e_in, 0) AS e_in, d_tot,
       |  CAST(coalesce(e_in, 0) AS DOUBLE) / m
       |    - (CAST(d_tot AS DOUBLE) / (2.0 * m))
       |      * (CAST(d_tot AS DOUBLE) / (2.0 * m)) AS q_c
       |FROM dt LEFT JOIN ei USING (community), mm
       |ORDER BY community""".stripMargin
  }

  /** DuckDB mirror of [[graft.graph.Communities.hits]] at q_x86's
    * settings: 5 UNNORMALIZED iterations unrolled (the recursion is
    * linear, so the per-step L1 scalars factor out) — authority half
    * then hub half per step, one L1 normalization at the end, same
    * coalesce-to-0 handling of nodes missing in/out edges. */
  private val hitsOracle: String = {
    def iter(k: Int): String = {
      val p = s"h${k - 1}"
      s"""a$k AS MATERIALIZED (
         |  SELECT ed.dst AS v, sum(p.s) AS s
         |  FROM ed JOIN $p p ON p.v = ed.src GROUP BY ed.dst),
         |h$k AS MATERIALIZED (
         |  SELECT ed.src AS v, sum(a.s) AS s
         |  FROM ed JOIN a$k a ON a.v = ed.dst GROUP BY ed.src)""".stripMargin
    }
    s"""WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |ed AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
       |    FROM documents, n0, range(1, 4) AS r(j))
       |  WHERE src <> dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |h0 AS MATERIALIZED (SELECT v, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS s
       |       FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT nodes.v AS node,
       |  round(coalesce(a5.s, CAST(0 AS DOUBLE))
       |    / (SELECT sum(s) FROM a5), 6) AS authority,
       |  round(coalesce(h5.s, CAST(0 AS DOUBLE))
       |    / (SELECT sum(s) FROM h5), 6) AS hub
       |FROM nodes LEFT JOIN a5 ON a5.v = nodes.v
       |LEFT JOIN h5 ON h5.v = nodes.v ORDER BY node""".stripMargin
  }

  /** DuckDB mirror of [[graft.graph.Communities.triangleCounts]]: with
    * id-canonical edges (lo < hi), every triangle x<y<z is found once
    * via (x,y),(y,z),(x,z) — the Spark side's degree orientation is a
    * work bound, not a semantic change, so the simple canonical join
    * chain is the exact oracle. */
  private val triangleOracle: String =
    """WITH ed0 AS (
      |  SELECT doc_id AS a,
      |    (doc_id - doc_id % 16) + ((doc_id % 16) * 3 + j) % 16 AS b
      |  FROM documents, range(1, 3) AS r(j)),
      |und AS (
      |  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
      |  FROM ed0 WHERE a <> b),
      |deg AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
      |  GROUP BY v),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM und e1
      |  JOIN und e2 ON e2.a = e1.b
      |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |pern AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri)
      |  GROUP BY v)
      |SELECT d.v AS node,
      |  coalesce(p.n_triangles, 0) AS n_triangles,
      |  CASE WHEN d.deg < 2 THEN CAST(0 AS DOUBLE)
      |    ELSE CAST(2 * coalesce(p.n_triangles, 0) AS DOUBLE) /
      |      CAST(d.deg * (d.deg - 1) AS DOUBLE) END AS clustering_coef
      |FROM deg d LEFT JOIN pern p ON p.v = d.v
      |ORDER BY node""".stripMargin

  /** DuckDB mirror of [[graft.graph.Communities.kCore]] at q_x93's
    * settings: 6 unrolled synchronous peels (fixture converges in 2;
    * extra rounds are no-ops at the fixpoint). */
  private val kCoreOracle: String = {
    def iter(i: Int): String =
      s"""d$i AS (
         |  SELECT u.a, count(*) AS c FROM und u
         |  JOIN rem${i - 1} ra ON ra.v = u.a
         |  JOIN rem${i - 1} rb ON rb.v = u.b
         |  GROUP BY u.a),
         |rem$i AS (SELECT a AS v FROM d$i WHERE c >= 3)""".stripMargin
    s"""WITH ed0 AS (
       |  SELECT doc_id AS a,
       |    (doc_id - doc_id % 16) + ((doc_id % 16) * 3 + j) % 16 AS b
       |  FROM documents, range(1, 3) AS r(j)),
       |und AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM ed0 WHERE a <> b
       |    UNION ALL
       |    SELECT b, a FROM ed0 WHERE a <> b)),
       |rem0 AS (SELECT DISTINCT a AS v FROM und),
       |${(1 to 6).map(iter).mkString(",\n")}
       |SELECT v AS node FROM rem6 ORDER BY node""".stripMargin
  }

  /** DuckDB mirror of [[graft.graph.PageRank.weightedPageRank]] at
    * q_x97's settings: integer-valued weight sums are exact under any
    * addition order, so the precomputed `w/W(u)` share is bit-identical
    * cross-engine; 5 unrolled iterations otherwise follow the uniform
    * oracle. */
  private val weightedPageRankOracle: String = {
    val d = "CAST(0.85 AS DOUBLE)"
    def iter(k: Int): String = {
      val p = s"pr${k - 1}"
      s"""dang$k AS (
         |  SELECT coalesce(sum(p.pr), CAST(0 AS DOUBLE)) AS dang
         |  FROM $p p LEFT JOIN od ON od.src = p.v
         |  WHERE od.src IS NULL),
         |pr$k AS (
         |  SELECT nodes.v,
         |    (1 - $d) / (SELECT n FROM nn) + $d *
         |      (coalesce(s.c, CAST(0 AS DOUBLE)) +
         |        (SELECT dang FROM dang$k) / (SELECT n FROM nn)) AS pr
         |  FROM nodes
         |  LEFT JOIN (
         |    SELECT e.dst, sum(p.pr * e.share) AS c
         |    FROM eds e JOIN $p p ON p.v = e.src
         |    GROUP BY e.dst) s ON s.dst = nodes.v)""".stripMargin
    }
    s"""WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |ed AS (
       |  SELECT src, dst,
       |    CAST((src * 7 + dst) % 5 + 1 AS DOUBLE) AS w
       |  FROM (
       |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
       |    FROM documents, n0, range(1, 4) AS r(j))
       |  WHERE src <> dst),
       |nodes AS (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |od AS (SELECT src, sum(w) AS wsum FROM ed WHERE w > 0
       |       GROUP BY src),
       |eds AS (SELECT ed.src, ed.dst, ed.w / od.wsum AS share
       |        FROM ed JOIN od ON od.src = ed.src WHERE ed.w > 0),
       |pr0 AS (SELECT v, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr
       |        FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT v AS node, round(pr, 6) AS pagerank
       |FROM pr5 ORDER BY v""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // Same pair fixture (DuckDB's jaro_winkler_similarity = graft_jw),
    // same +0.5/+1 adjusted m/u shares, same left-associated ln sum.
    "q_g3_fellegi_sunter" ->
      """WITH c AS (SELECT c_custkey AS cid, c_name AS name,
        |    c_nationkey AS nat, c_mktsegment AS seg FROM customer),
        |p AS (
        |  SELECT cid AS id_a, cid + 100000 AS id_b, name AS name_a,
        |    substr(name, 1, 16) || substr(name, 18, 1)
        |      || substr(name, 17, 1) AS name_b,
        |    nat AS nat_a, nat AS nat_b, seg AS seg_a, seg AS seg_b,
        |    1 AS label
        |  FROM c WHERE cid % 7 = 0
        |  UNION ALL
        |  SELECT a.cid, b.cid, a.name, b.name, a.nat, b.nat, a.seg,
        |    b.seg, 0
        |  FROM c a JOIN c b ON b.cid = a.cid + 1 WHERE a.cid % 5 = 0
        |  UNION ALL
        |  SELECT a.cid, b.cid, a.name, b.name, a.nat, b.nat, a.seg,
        |    b.seg, NULL
        |  FROM c a JOIN c b ON b.cid = a.cid + 2 WHERE a.cid % 11 = 0),
        |g AS (SELECT id_a, id_b, label,
        |    CASE WHEN jaro_winkler_similarity(name_a, name_b) >= 0.985
        |      THEN 1 ELSE 0 END AS name_agree,
        |    CASE WHEN nat_a = nat_b THEN 1 ELSE 0 END AS nation_agree,
        |    CASE WHEN seg_a = seg_b THEN 1 ELSE 0 END AS seg_agree
        |  FROM p),
        |est AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN label = 1 THEN 1 END), 0)
        |      AS BIGINT) AS nm,
        |    CAST(coalesce(sum(CASE WHEN label = 0 THEN 1 END), 0)
        |      AS BIGINT) AS nu,
        |    CAST(coalesce(sum(CASE WHEN label = 1 AND name_agree = 1
        |      THEN 1 END), 0) AS BIGINT) AS ma_name,
        |    CAST(coalesce(sum(CASE WHEN label = 0 AND name_agree = 1
        |      THEN 1 END), 0) AS BIGINT) AS ua_name,
        |    CAST(coalesce(sum(CASE WHEN label = 1 AND nation_agree = 1
        |      THEN 1 END), 0) AS BIGINT) AS ma_nat,
        |    CAST(coalesce(sum(CASE WHEN label = 0 AND nation_agree = 1
        |      THEN 1 END), 0) AS BIGINT) AS ua_nat,
        |    CAST(coalesce(sum(CASE WHEN label = 1 AND seg_agree = 1
        |      THEN 1 END), 0) AS BIGINT) AS ma_seg,
        |    CAST(coalesce(sum(CASE WHEN label = 0 AND seg_agree = 1
        |      THEN 1 END), 0) AS BIGINT) AS ua_seg
        |  FROM g),
        |sc AS (SELECT g.id_a, g.id_b, g.label, g.name_agree,
        |    g.nation_agree, g.seg_agree,
        |    floor((
        |      (CASE WHEN g.name_agree = 1 THEN
        |        ln(((est.ma_name + 0.5) / (est.nm + 1.0))
        |          / ((est.ua_name + 0.5) / (est.nu + 1.0)))
        |      ELSE
        |        ln((1.0 - (est.ma_name + 0.5) / (est.nm + 1.0))
        |          / (1.0 - (est.ua_name + 0.5) / (est.nu + 1.0)))
        |      END
        |      + CASE WHEN g.nation_agree = 1 THEN
        |        ln(((est.ma_nat + 0.5) / (est.nm + 1.0))
        |          / ((est.ua_nat + 0.5) / (est.nu + 1.0)))
        |      ELSE
        |        ln((1.0 - (est.ma_nat + 0.5) / (est.nm + 1.0))
        |          / (1.0 - (est.ua_nat + 0.5) / (est.nu + 1.0)))
        |      END)
        |      + CASE WHEN g.seg_agree = 1 THEN
        |        ln(((est.ma_seg + 0.5) / (est.nm + 1.0))
        |          / ((est.ua_seg + 0.5) / (est.nu + 1.0)))
        |      ELSE
        |        ln((1.0 - (est.ma_seg + 0.5) / (est.nm + 1.0))
        |          / (1.0 - (est.ua_seg + 0.5) / (est.nu + 1.0)))
        |      END) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM g, est)
        |SELECT id_a, id_b, label, name_agree, nation_agree, seg_agree,
        |  score, CASE WHEN score >= 2.0 THEN 1 ELSE 0 END AS classified
        |FROM sc ORDER BY id_a, id_b""".stripMargin,
    // X137's candidate pipeline feeding the Christen reduction-ratio /
    // pair-completeness formulas; HUGEINT all-pairs denominator.
    "q_g4_blocking_quality" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS key FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 100000,
        |    substr(c_name, 1, 16) || substr(c_name, 18, 1)
        |      || substr(c_name, 17, 1)
        |  FROM customer WHERE c_custkey % 7 = 0),
        |r AS (SELECT id, key,
        |    row_number() OVER (ORDER BY key, id) AS rk
        |  FROM base),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |    jaro_winkler_similarity(a.key, b.key) AS jw
        |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 4),
        |cand AS (SELECT DISTINCT LEAST(id_a, id_b) AS a,
        |    GREATEST(id_a, id_b) AS b
        |  FROM p
        |  WHERE floor(jw * 1000000.0 + 0.5) / 1000000.0 >= 0.985),
        |truth AS (SELECT DISTINCT c_custkey AS a,
        |    c_custkey + 100000 AS b
        |  FROM customer WHERE c_custkey % 7 = 0),
        |nrec AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |stats AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM cand)
        |      AS n_candidates,
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
        |    (SELECT CAST(count(*) AS BIGINT)
        |     FROM cand JOIN truth ON truth.a = cand.a
        |       AND truth.b = cand.b) AS n_hit,
        |    (SELECT CAST(CAST(n AS HUGEINT) * (n - 1) / 2
        |      AS BIGINT) FROM nrec) AS n_all_pairs)
        |SELECT n_candidates, n_truth, n_hit, n_all_pairs,
        |  floor((1.0 - CAST(n_candidates AS DOUBLE)
        |    / CAST(n_all_pairs AS DOUBLE)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS reduction_ratio,
        |  CASE WHEN n_truth > 0 THEN
        |    floor(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS pair_completeness
        |FROM stats""".stripMargin,
    // g4's report unpivoted to all-VARCHAR (field, value) rows —
    // rendering-proof rendition of the identical values.
    "q_g4_blocking_cells" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS key FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 100000,
        |    substr(c_name, 1, 16) || substr(c_name, 18, 1)
        |      || substr(c_name, 17, 1)
        |  FROM customer WHERE c_custkey % 7 = 0),
        |r AS (SELECT id, key,
        |    row_number() OVER (ORDER BY key, id) AS rk
        |  FROM base),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |    jaro_winkler_similarity(a.key, b.key) AS jw
        |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 4),
        |cand AS (SELECT DISTINCT LEAST(id_a, id_b) AS a,
        |    GREATEST(id_a, id_b) AS b
        |  FROM p
        |  WHERE floor(jw * 1000000.0 + 0.5) / 1000000.0 >= 0.985),
        |truth AS (SELECT DISTINCT c_custkey AS a,
        |    c_custkey + 100000 AS b
        |  FROM customer WHERE c_custkey % 7 = 0),
        |nrec AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |stats AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM cand)
        |      AS n_candidates,
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
        |    (SELECT CAST(count(*) AS BIGINT)
        |     FROM cand JOIN truth ON truth.a = cand.a
        |       AND truth.b = cand.b) AS n_hit,
        |    (SELECT CAST(CAST(n AS HUGEINT) * (n - 1) / 2
        |      AS HUGEINT) FROM nrec) AS n_all_pairs),
        |rep AS (SELECT n_candidates, n_truth, n_hit, n_all_pairs,
        |  floor((1.0 - CAST(n_candidates AS DOUBLE)
        |    / CAST(n_all_pairs AS DOUBLE)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS reduction_ratio,
        |  CASE WHEN n_truth > 0 THEN
        |    floor(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS pair_completeness
        |FROM stats)
        |SELECT field, value FROM (
        |  SELECT 'n_candidates' AS field,
        |    CAST(n_candidates AS VARCHAR) AS value FROM rep
        |  UNION ALL SELECT 'n_truth', CAST(n_truth AS VARCHAR) FROM rep
        |  UNION ALL SELECT 'n_hit', CAST(n_hit AS VARCHAR) FROM rep
        |  UNION ALL SELECT 'n_all_pairs', CAST(n_all_pairs AS VARCHAR)
        |    FROM rep
        |  UNION ALL SELECT 'reduction_ratio',
        |    CAST(reduction_ratio AS VARCHAR) FROM rep
        |  UNION ALL SELECT 'pair_completeness',
        |    CAST(pair_completeness AS VARCHAR) FROM rep)
        |ORDER BY field""".stripMargin,
    // Same arithmetic proposal and anti-join over the normalized pair.
    "q_x115_negative_sampling" ->
      """WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS nd
        |           FROM documents),
        |ed0 AS (
        |  SELECT doc_id AS a,
        |    (doc_id - doc_id % 16) + ((doc_id % 16) * 3 + j) % 16 AS b
        |  FROM documents, range(1, 3) AS r(j)),
        |und AS (
        |  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |  FROM ed0 WHERE a <> b),
        |nodes AS (SELECT DISTINCT u FROM (
        |  SELECT a AS u FROM und UNION ALL SELECT b FROM und)),
        |prop AS (
        |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM (
        |    SELECT u, (u * 17 + s * 23) % nd AS v
        |    FROM nodes, range(1, 3) AS rs(s), n0)
        |  WHERE u <> v),
        |neg AS (
        |  SELECT p.a, p.b FROM prop p
        |  LEFT JOIN und ON und.a = p.a AND und.b = p.b
        |  WHERE und.a IS NULL)
        |SELECT a AS src, b AS dst, 1 AS label FROM und
        |UNION ALL
        |SELECT a, b, 0 FROM neg
        |ORDER BY src, dst, label""".stripMargin,
    // Recursive path enumeration bounded at 6 hops; min path length
    // per node IS the BFS distance.
    "q_x98_bfs_hops" ->
      """WITH RECURSIVE n0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |ed AS (
        |  SELECT src, dst FROM (
        |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
        |    FROM documents, n0, range(1, 4) AS r(j))
        |  WHERE src <> dst),
        |walk(node, hops) AS (
        |  SELECT doc_id, 0 FROM documents WHERE doc_id % 25 = 0
        |  UNION ALL
        |  SELECT ed.dst, w.hops + 1 FROM walk w
        |  JOIN ed ON ed.src = w.node WHERE w.hops < 6)
        |SELECT node, CAST(min(hops) AS BIGINT) AS hops
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    // Each walk row has exactly one successor under the hash-indexed
    // pick, so the recursive CTE is linear, not exponential.
    "q_x108_random_walks" ->
      """WITH RECURSIVE n0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |ed AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
        |    FROM documents, n0, range(1, 4) AS r(j))
        |  WHERE src <> dst),
        |adj AS (
        |  SELECT src, dst,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst)
        |      AS BIGINT) - 1 AS idx,
        |    CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg
        |  FROM ed),
        |walk(walk_id, step, node) AS (
        |  SELECT doc_id, CAST(0 AS BIGINT), doc_id
        |  FROM documents WHERE doc_id % 25 = 0
        |  UNION ALL
        |  SELECT w.walk_id, w.step + 1, a.dst FROM walk w
        |  JOIN adj a ON a.src = w.node
        |    AND a.idx = (w.node * 13 + w.step * 17) % a.deg
        |  WHERE w.step < 8)
        |SELECT walk_id, step, node FROM walk
        |ORDER BY walk_id, step""".stripMargin,
    // Weighted-path enumeration bounded at 6 edges; min cumulative
    // weight per node IS the bounded Bellman-Ford distance.
    "q_x107_weighted_paths" ->
      """WITH RECURSIVE n0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |ed AS (
        |  SELECT src, dst, (src * 7 + dst) % 5 + 1 AS w FROM (
        |    SELECT doc_id AS src, (doc_id * 31 + j * 7) % nd AS dst
        |    FROM documents, n0, range(1, 4) AS r(j))
        |  WHERE src <> dst),
        |walk(node, d, steps) AS (
        |  SELECT doc_id, CAST(0 AS BIGINT), 0
        |  FROM documents WHERE doc_id % 25 = 0
        |  UNION ALL
        |  SELECT ed.dst, w.d + ed.w, w.steps + 1 FROM walk w
        |  JOIN ed ON ed.src = w.node WHERE w.steps < 6)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    // Same wedge construction: undirected block-graph adjacency with
    // 1/ln(deg) center weights, existing edges removed.
    "q_x99_adamic_adar" ->
      """WITH base AS (
        |  SELECT doc_id AS src,
        |    (doc_id - doc_id % 16) + ((doc_id % 16) * 3 + j) % 16 AS dst
        |  FROM documents, range(1, 3) AS r(j)),
        |e AS (SELECT src, dst FROM base WHERE src <> dst),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |        greatest(src, dst) AS b FROM e),
        |adj AS (SELECT a AS z, b AS nbr FROM und
        |        UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT z, count(*) AS d FROM adj GROUP BY z),
        |wadj AS (SELECT adj.z, adj.nbr, 1.0 / ln(CAST(d AS DOUBLE)) AS w
        |         FROM adj JOIN deg ON deg.z = adj.z),
        |sc AS (
        |  SELECT l.nbr AS node_a, r.nbr AS node_b,
        |    CAST(count(*) AS BIGINT) AS common, sum(l.w) AS score
        |  FROM wadj l JOIN wadj r ON l.z = r.z AND l.nbr < r.nbr
        |  GROUP BY 1, 2)
        |SELECT sc.node_a, sc.node_b, sc.common,
        |  floor(sc.score * 1000000.0 + 0.5) / 1000000.0 AS score
        |FROM sc LEFT JOIN und
        |  ON und.a = sc.node_a AND und.b = sc.node_b
        |WHERE und.a IS NULL
        |ORDER BY node_a, node_b""".stripMargin,
    "q_x113_modularity" -> modularityOracle,
    "q_x97_weighted_pagerank" -> weightedPageRankOracle,
    "q_x93_kcore" -> kCoreOracle,
    "q_x91_triangle_count" -> triangleOracle,
    // Same undirected degree table; suffix-count ccdf mirrors the
    // two-phase prefix sums; alpha = 1 + nt/Σ c·ln(d/2) round-6.
    "q_x121_degree_powerlaw" ->
      """WITH ed0 AS (
        |  SELECT src, dst FROM (
        |    SELECT doc_id AS src,
        |      (doc_id * 7 + j) % CAST(pow(4, j) AS BIGINT) AS dst
        |    FROM documents, range(1, 4) AS r(j))
        |  WHERE src <> dst),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |          greatest(src, dst) AS b FROM ed0),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY v),
        |byd AS (SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes
        |        FROM deg GROUP BY 1),
        |r AS (SELECT *, CAST(sum(n_nodes) OVER (ORDER BY degree DESC
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM byd),
        |t AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n FROM byd),
        |fit AS (
        |  SELECT CAST(sum(n_nodes) AS BIGINT) AS nt,
        |    sum(CAST(n_nodes AS DOUBLE)
        |      * ln(CAST(degree AS DOUBLE) / 2.0)) AS lnsum
        |  FROM byd WHERE degree >= 2)
        |SELECT degree, n_nodes,
        |  CAST(n_nodes AS DOUBLE) / CAST((SELECT n FROM t) AS DOUBLE)
        |    AS share,
        |  CAST(cum AS DOUBLE) / CAST((SELECT n FROM t) AS DOUBLE)
        |    AS ccdf,
        |  CAST(2 AS BIGINT) AS d_min, (SELECT nt FROM fit) AS n_tail,
        |  round(CASE WHEN (SELECT lnsum FROM fit) > 0
        |    THEN 1.0 + CAST((SELECT nt FROM fit) AS DOUBLE)
        |      / (SELECT lnsum FROM fit) END, 6) AS alpha
        |FROM r ORDER BY degree""".stripMargin,
    "q_x85_label_propagation" -> labelPropagationOracle,
    "q_x86_hits" -> hitsOracle,
    "q_x84_personalized_pagerank" -> personalizedPageRankOracle,
    "q_x83_pagerank" -> pageRankOracle,
    "q_x168_katz" -> katzOracle,
    "q_g1_connected_components" ->
      s"""WITH RECURSIVE $edgeCte,
         |reach(v, m) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.v)
         |SELECT v, min(m) AS component FROM reach
         |GROUP BY v ORDER BY v""".stripMargin,
    "q_g2_resolve_ids" ->
      """SELECT 'e:' || CAST(c_custkey AS VARCHAR) AS from_id,
        |  'p:' || CAST(c_custkey // 2 AS VARCHAR) AS to_id
        |FROM customer ORDER BY from_id""".stripMargin)
}
