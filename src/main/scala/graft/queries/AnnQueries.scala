package graft.queries

import graft.Tables.t
import graft.ann.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search coverage over the `embeddings` table (north-star
  * scope): brute-force cosine top-k, IVF bucketed approximate top-k, and
  * embedding-cosine near-duplicate pairs. Dot products are left-to-right
  * double folds on both engines (Spark `aggregate`, DuckDB
  * `list_dot_product`), so cosines are bit-identical before rounding.
  */
object AnnQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Corpus with planted near-duplicates: every vec_id ≡ 0 (mod 10) is
    * copied under vec_id+100000 with its first component shifted by +0.05
    * (organic pairs top out at cosine ≈ 0.51, planted ones ≈ 0.999).
    * `label` rides along as the blocking key. */
  private def corpusWithNearDups(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"), col("label"))
    base.unionByName(
      base.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 100000).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1) + lit(0.05)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"),
        col("label")))
  }

  private val Dim = 64

  /** Fixed ±1 SRP hyperplanes (6 bands × 10 bits × Dim), from a seeded
    * PRNG so the SAME literals are inlined in the Spark expression tree
    * and the generated DuckDB oracle — both engines compute identical
    * sign bits. */
  private val SrpBits = 10
  private val SrpSigns: Array[Array[Double]] = {
    val r = new scala.util.Random(20260814L)
    Array.fill(6 * SrpBits, Dim)(if (r.nextBoolean()) 1.0 else -1.0)
  }

  /** The generated DuckDB mirror of [[Similarity.srpNearDuplicates]]
    * over the planted corpus: same literal hyperplanes, same CASE-sum
    * signatures, same band-UNION candidates, same verify tree. */
  private def srpOracle: String = {
    def lst(p: Array[Double]): String =
      p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val sigExprs = (0 until 6).map { b =>
      (0 until SrpBits).map { i =>
        s"(CASE WHEN list_dot_product(v, ${lst(SrpSigns(b * SrpBits + i))}) >= 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ") + s" AS s$b"
    }.mkString(",\n  ")
    val cands = (0 until 6).map { b =>
      s"SELECT a.vec_id AS va, b.vec_id AS vb FROM sg a JOIN sg b ON a.s$b = b.s$b AND a.vec_id < b.vec_id"
    }.mkString("\n  UNION\n  ")
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000 AS vec_id,
       |    list_prepend(v[1] + 0.05, v[2:]) AS v
       |  FROM base WHERE vec_id % 10 = 0),
       |nn AS (SELECT vec_id, v,
       |  sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
       |sg AS (SELECT vec_id, v, nrm,
       |  $sigExprs
       |  FROM nn),
       |cand AS (
       |  $cands)
       |SELECT c.va AS vec_a, c.vb AS vec_b,
       |  round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cosine
       |FROM cand c JOIN sg x ON x.vec_id = c.va
       |  JOIN sg y ON y.vec_id = c.vb
       |WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.99
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Shared IVFADC fixture: deterministic centroids (every 40th
    * embedding) + sliced codebooks, queries = every 4th vector, k=3,
    * probes=2 — one body behind q_x26/q_x27/q_x28. */
  private def ivfadcQuery(s: SparkSession, dir: String, residual: Boolean,
      distributed: Boolean = false): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") % 40 === 0)
    val codebooks = (0 until 4).map(sub => cents.select(
        lit(sub).as("subspace"), col("vec_id").as("centroid_id"),
        slice(col("embedding").cast("array<double>"), sub * 16 + 1, 16)
          .as("centroid")))
      .reduce(_ unionByName _)
    val encoded = graft.ann.ProductQuantization.ivfEncode(
      emb, "vec_id", "embedding", cents, codebooks, 4, Dim, residual)
    val qs = emb.filter(col("vec_id") % 4 === 0)
    val top =
      if (distributed) graft.ann.ProductQuantization.ivfAdcTopKDistributed(
        qs, encoded, "vec_id", "embedding", cents, codebooks,
        m = 4, k = 3, dim = Dim, probes = 2, residual = residual)
      else graft.ann.ProductQuantization.ivfAdcTopK(
        qs, encoded, "vec_id", "embedding", cents, codebooks,
        m = 4, k = 3, probes = 2, residual = residual)
    top.orderBy(col("vec_id"), col("rk"))
  }

  val queries: Map[String, Q] = Map(
    // X102: population covariance of the embedding corpus — the PCA
    // moment pass (one custom typed aggregate, matrix-sized state);
    // upper-triangular (i, j, cov) rows, raw doubles under the
    // driver's relative tolerance.
    "q_x102_embedding_covariance" -> { (s, dir) =>
      graft.ml.Pca.covarianceMatrix(t(s, dir, "embeddings"),
          "embedding", Dim)
        .orderBy(col("i"), col("j"))
    },

    // X8: exact cosine top-5 over the index for a query batch (every 4th
    // vector — the realistic query-set-vs-index shape).
    "q_x8_ann_bruteforce" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") % 4 === 0), emb,
        "vec_id", "embedding", 5, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X49: IVF top-3 under EUCLIDEAN distance — the scale path for
    // q_x47's exact-L2 baseline; same deterministic centroid fixture.
    "q_x49_ann_ivf_l2" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 40 === 0)
      Similarity.ivfTopKL2(emb, "vec_id", "embedding", centroids, 3, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X47: exact EUCLIDEAN top-5 — the L2 metric variant (checked
    // against DuckDB's native list_distance).
    "q_x47_ann_l2" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopKL2(emb.filter(col("vec_id") % 4 === 0), emb,
        "vec_id", "embedding", 5, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X178: simplified silhouette against four fixed seed centroids —
    // the points-times-k clustering-quality dial; graft_l2 distances
    // (the X47 list_distance contract), k-bounded sorted assignment,
    // scaled-LONG per-cluster means.
    "q_x178_silhouette" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.simplifiedSilhouette(emb, "vec_id", "embedding",
        emb.filter(col("vec_id").isin(0L, 7L, 14L, 21L)),
        "vec_id", "embedding")
        .orderBy(col("cluster_id"))
    },

    // X165: local outlier factor on an embedding sample — tie-inclusive
    // 5-NN density ratios; scaled-LONG reach/lrd sums, fixed IEEE lof.
    "q_x165_lof" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 5 === 0)
      Similarity.lofScores(emb, "vec_id", "embedding", k = 5)
    },

    // X179: LOF per IVF bucket — the composed 100 TB form of q_x165:
    // nearest-centroid coarse cells (4 seed centroids), a bucket-keyed
    // pair equi-join (one centroid_id shuffle, never all-pairs), the
    // shared exact-LOF kernel per cell. Bucket-boundary caveat is part
    // of the semantics: scores mean "outlier WITHIN the coarse cell".
    "q_x179_lof_bucketed" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lofScoresBucketed(emb, "vec_id", "embedding",
        emb.filter(col("vec_id").isin(0L, 7L, 14L, 21L)), Dim, k = 5)
    },

    // X179 scale form, PROVEN: the wave-35 probe showed the FIXED
    // 4-centroid variant going super-linear at 10x data (exponent
    // 1.10 — O(N²/nlist) with nlist pinned, exactly as documented).
    // Here the centroid list is DATA-PROPORTIONAL (every vec_id
    // divisible by 3750: ~N/3750 centroids, so bucket size stays
    // ~constant as the corpus grows) — the form whose probe exponent
    // is ~linear and the one a 100 TB deployment runs.
    "q_x179b_lof_bucketed_adaptive" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lofScoresBucketed(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 3750 === 0), Dim, k = 5)
    },

    // X181: multi-probe HALO bucketed LOF — closes X179's stated
    // bucket-boundary caveat: every point is assigned to its top-2
    // centroids, pairs join on the probed cell (symmetric — two points
    // see each other iff they share >= 1 probed cell, a SUPERSET of the
    // bucketed relation), the exact kernel is shared, scores report
    // under the primary cell. Centroids are DATA-PROPORTIONAL
    // (vec_id % 250 = 0 -> ~N/250 cells, constant expected bucket size
    // — the x179b lesson, applied from day one: the ScaleGate caught
    // the fixed-4-seed form at exponent ~1.1 on its first wave run).
    "q_x181_lof_halo" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lofScoresHalo(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 250 === 0), Dim, k = 5,
        probes = 2)
    },

    // X182: per-cell exact k-NN graph — the graph-ANN edge list: exact
    // cosine top-5 neighbors within top-2-probe IVF cells (symmetric
    // halo candidates), brute-force output schema, Σ m_eff² cost.
    "q_x182_knn_graph" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.knnGraph(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 40 === 0), Dim, k = 5, probes = 2)
    },

    // X183: mutual-kNN near-dup communities — the X182 edge list cut
    // to RECIPROCAL top-5 edges (each endpoint ranks the other in its
    // own top-k: hub points lose their one-way edges), components via
    // the deterministic min-label CC. X17's output contract in
    // embedding space.
    "q_x183_mutual_knn_clusters" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.mutualKnnClusters(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 40 === 0), Dim, k = 5, probes = 2)
    },

    // X184: graph shape of the X182 k-NN edge list — reciprocity (the
    // share of one-way hub edges the X183 cut removes) and degree
    // assortativity (hub-and-spoke vs stratified core) in one report.
    "q_x184_graph_shape" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      graft.graph.Communities.graphShapeReport(
        Similarity.knnGraph(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") % 40 === 0), Dim, k = 5,
          probes = 2),
        "vec_id", "neighbor_id")
    },

    // X186: transitivity + average local clustering of the X182 k-NN
    // edge list — the triangle-closure dimension X184's shape report
    // lacks (are neighborhoods cliquish or tree-like); exact
    // DIV-2/DIV-3 census over the X91 triangle kernel, pinned
    // (2·Σtri)/Σd(d−1), scaled-term average of the local
    // coefficients.
    "q_x186_clustering_report" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      graft.graph.Communities.clusteringReport(
        Similarity.knnGraph(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") % 40 === 0), Dim, k = 5,
          probes = 2),
        "vec_id", "neighbor_id")
    },

    // X185: the MAINTAINED k-NN graph — the corpus arrives in three
    // interleaved increments (the production growth cycle), each one
    // a frozen-centroid assignment append + touched-cell-only edge
    // recompute; the published latest-batch-per-source view must equal
    // a full X182 rebuild over the union, which is exactly what the
    // oracle computes.
    "q_x185_knn_graph_incremental" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
      // suffixed with the application id so two concurrent harness
      // runs on one machine (bench beside verify) cannot clobber each
      // other's store mid-query
      val store = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_knn_store_x185_${s.sparkContext.applicationId}"
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      for (m <- 0 to 2)
        Similarity.knnGraphIncrement(emb.filter(col("vec_id") % 3 === m),
          "vec_id", "embedding", centroids, Dim, k = 4,
          storeDir = store, batchId = m.toLong, probes = 2)
      graft.streaming.StreamingEvents.knnGraphView(s, store)
    },

    // X187: mutual-kNN communities served FROM the maintained X185
    // store — the corpus arrives in two increments, the view cuts the
    // latest-batch edge list to reciprocal edges and closes components
    // — proving the maintenance story extends to the community layer:
    // the oracle is the one-shot X183 chain over the whole corpus.
    "q_x187_incremental_communities" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
      val store = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_knn_store_x187_${s.sparkContext.applicationId}"
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      for (m <- 0 to 1)
        Similarity.knnGraphIncrement(emb.filter(col("vec_id") % 2 === m),
          "vec_id", "embedding", centroids, Dim, k = 4,
          storeDir = store, batchId = m.toLong, probes = 2)
      graft.streaming.StreamingEvents.mutualKnnView(s, store)
    },

    // X188: tombstone DELETES in the maintained store — two increments
    // ingest the corpus, a delete batch tombstones the % 7 == 3 ids
    // (touched-cell edge recompute + rk=0 empty-recompute sentinels),
    // then compaction collapses both sides to one rebased directory
    // and applies the ledger; the view must equal a full X182 rebuild
    // over corpus-minus-deleted — exactly what the oracle computes.
    "q_x188_knn_graph_delete" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
      val store = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_knn_store_x188_${s.sparkContext.applicationId}"
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      for (m <- 0 to 1)
        Similarity.knnGraphIncrement(emb.filter(col("vec_id") % 2 === m),
          "vec_id", "embedding", centroids, Dim, k = 4,
          storeDir = store, batchId = m.toLong, probes = 2)
      Similarity.knnGraphDelete(emb.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id")), "vec_id", store, batchId = 2L, k = 4)
      Similarity.compactKnnStore(s, store)
      graft.streaming.StreamingEvents.knnGraphView(s, store)
    },

    // X189: the CENTROID-REFRESH epoch — increments + a delete build a
    // drifting store, then the epoch re-assigns the surviving corpus
    // (read back from the store's own index) to a NEW centroid set
    // (% 30), rebuilds the edges, rebases the directories and clears
    // the ledger; the view must equal a FRESH X182 build of the
    // survivors under the new centroids — the oracle's computation.
    "q_x189_knn_graph_refresh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
      val store = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_knn_store_x189_${s.sparkContext.applicationId}"
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      for (m <- 0 to 1)
        Similarity.knnGraphIncrement(emb.filter(col("vec_id") % 2 === m),
          "vec_id", "embedding", centroids, Dim, k = 4,
          storeDir = store, batchId = m.toLong, probes = 2)
      Similarity.knnGraphDelete(emb.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id")), "vec_id", store, batchId = 2L, k = 4)
      Similarity.knnGraphRefresh(s, store,
        emb.filter(col("vec_id") % 30 === 0), "vec_id", "embedding",
        Dim, k = 4, probes = 2)
      graft.streaming.StreamingEvents.knnGraphView(s, store)
    },

    // X180: per-dimension embedding drift between the even/odd vector
    // halves — which dimensions moved, in raw and pooled-sigma units;
    // one posexplode aggregate per side, dim-bounded output.
    "q_x180_embedding_drift" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.embeddingDimDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding", Dim)
    },

    // X29: exact cosine top-5 with the STREAMED-INDEX form — the query
    // batch broadcasts and the corpus streams, so exact search scales to
    // an unbounded index. Same function as q_x8, same oracle.
    "q_x29_bruteforce_streamed" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopKStreamed(emb.filter(col("vec_id") % 4 === 0),
        emb, "vec_id", "embedding", 5, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X76: persisted incremental IVF index — the corpus (vec_id % 4 != 0)
    // is indexed in TWO appended batches (a fresh overwrite then an
    // append: the production maintenance cycle), written partitioned by
    // centroid_id, read back, and queried by the % 4 == 0 batch. Green
    // proves assignment-only increments + the partitioned round-trip
    // preserve exact bucket search.
    "q_x76_ivf_index_query" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 40 === 0)
      val b1 = emb.filter(col("vec_id") % 4 === 1 ||
        col("vec_id") % 4 === 2)
      val b2 = emb.filter(col("vec_id") % 4 === 3)
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_" +
        s.sparkContext.applicationId
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(b1, "vec_id", "embedding", centroids,
          Dim), path, mode = "overwrite")
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(b2, "vec_id", "embedding", centroids,
          Dim), path)
      Similarity.ivfTopKFromIndex(Similarity.readIvfIndex(s, path),
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        centroids, 3, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X191: tombstone DELETES in the persisted IVF index — the X76
    // chain (two appended batches) plus a takedown of the % 9 == 2
    // vectors through the ledger; the canonical tombstone-aware read
    // must answer exactly like an index that never held them — the
    // oracle's computation over corpus-minus-deleted.
    "q_x191_ivf_index_delete" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 40 === 0)
      val b1 = emb.filter(col("vec_id") % 4 === 1 ||
        col("vec_id") % 4 === 2)
      val b2 = emb.filter(col("vec_id") % 4 === 3)
      val path = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_ivf_index_x191_${s.sparkContext.applicationId}"
      val hc = s.sessionState.newHadoopConf()
      for (p <- Seq(path, s"${path}__tombstones")) {
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(hc)
        if (fs.exists(hp)) fs.delete(hp, true)
      }
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(b1, "vec_id", "embedding", centroids,
          Dim), path, mode = "overwrite")
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(b2, "vec_id", "embedding", centroids,
          Dim), path)
      Similarity.deleteFromIvfIndex(s, path,
        emb.filter(col("vec_id") % 9 === 2).select(col("vec_id")),
        "vec_id", batchId = 0L)
      Similarity.ivfTopKFromIndex(Similarity.readIvfIndex(s, path),
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        centroids, 3, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X79: chunk → document embedding mean-pool — 8-chunk groups
    // (vec_id DIV 8), per-dim means and the norm rounded to 6 on both
    // engines (norm computed FROM the rounded means).
    "q_x79_mean_pool" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
        .select(expr("vec_id DIV 8").as("grp"), col("embedding"))
      graft.ann.Embeddings.meanPool(emb, "grp", "embedding")
        // exploded scalar rows: the hash compare cannot digest arrays
        .select(col("group_id"), col("n_vecs"), col("l2_norm"),
          posexplode(col("mean_embedding")))
        .withColumnRenamed("col", "mean_val")
        .orderBy(col("group_id"), col("pos"))
    },

    // X80: MMR diversified top-3 over each query's exact top-10
    // candidates, λ = 0.7 — the greedy is unrolled step-by-step in the
    // oracle, so every pick and every score is cross-engine-checked.
    "q_x80_mmr_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.mmrTopK(emb.filter(col("vec_id") % 4 === 0), emb,
        "vec_id", "embedding", k = 3, topN = 10, lambdaRel = 0.7,
        dim = Dim)
        .orderBy(col("vec_id"), col("rank"))
    },

    // X82: semi-hard triplet mining — per anchor (every 4th vector):
    // positive = best same-label candidate in the exact top-20,
    // negatives = top-3 cross-label candidates strictly below the
    // positive's cosine.
    "q_x82_triplet_mine" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.tripletMine(emb.filter(col("vec_id") % 4 === 0), emb,
        "vec_id", "embedding", "label", topN = 20, mNeg = 3, dim = Dim)
        .orderBy(col("vec_id"), col("role"), col("rank"))
    },

    // X9: IVF approximate top-3 — nearest-centroid buckets, in-bucket search.
    "q_x9_ann_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 40 === 0)
      Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, 3, Dim)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X9b: IVF multi-probe top-3 — each query searches its top-2 centroid
    // buckets (candidates indexed once, under their own bucket),
    // recovering recall lost at bucket boundaries.
    "q_x9b_ann_ivf_multiprobe" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 40 === 0)
      Similarity.ivfTopKMultiProbe(emb, "vec_id", "embedding", centroids,
        3, Dim, probes = 2)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X25: product-quantization encoding — 4 subspaces of 16 dims against
    // a deterministic codebook (every 40th embedding, sliced per
    // subspace); codes + total squared reconstruction error.
    "q_x25_pq_encode" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") % 40 === 0)
      val codebooks = (0 until 4).map(sub => cents.select(
          lit(sub).as("subspace"), col("vec_id").as("centroid_id"),
          slice(col("embedding").cast("array<double>"), sub * 16 + 1, 16)
            .as("centroid")))
        .reduce(_ unionByName _)
      graft.ann.ProductQuantization
        .encode(emb, "vec_id", "embedding", codebooks, 4)
        .select(col("vec_id"),
          element_at(col("codes"), 1).as("code_0"),
          element_at(col("codes"), 2).as("code_1"),
          element_at(col("codes"), 3).as("code_2"),
          element_at(col("codes"), 4).as("code_3"),
          round(col("sq_err"), 6).as("sq_err"))
        .orderBy(col("vec_id"))
    },

    // X26: IVFADC — the composed index: PQ codes searched only within
    // each query's top-2 probed IVF buckets (Jégou 2011 §IV). Same
    // deterministic centroids/codebooks as q_x9/q_x25, so encoding and
    // ADC distances are exactly reproducible.
    "q_x26_ivfadc" -> { (s, dir) => ivfadcQuery(s, dir, residual = false) },

    // X27: residual IVFADC — codes quantize v − centroid(bucket) (the
    // exact Jégou 2011 §IV structure) and each probed bucket gets its own
    // query-residual LUT. Same deterministic centroids/codebooks as
    // q_x26, so every distance is exactly reproducible.
    "q_x27_ivfadc_residual" -> { (s, dir) =>
      ivfadcQuery(s, dir, residual = true)
    },

    // X28: distributed-query IVFADC — identical semantics to q_x26
    // through the cogrouped form (no driver-collected query batch), so
    // it shares q_x26's oracle SQL verbatim.
    "q_x28_ivfadc_distributed" -> { (s, dir) =>
      ivfadcQuery(s, dir, residual = false, distributed = true)
    },

    // X16: int8 embedding quantization — per-vector scale, quantized
    // cells (summarized as exact integer sums for the scalar compare) and
    // max reconstruction error.
    // X95: dimension-ablation report — cosine fidelity of truncated
    // embedding prefixes (8/16/32 dims) vs the full 64 over a strided
    // pair sample; run before sizing an index.
    "q_x95_dim_ablation" -> { (s, dir) =>
      graft.ann.Embeddings.dimAblation(t(s, dir, "embeddings"),
        "vec_id", "embedding", dims = Seq(8, 16, 32, 64), stride = 17L)
        .orderBy(col("dim"))
    },

    // X104: pairwise-cosine isotropy histogram — strided pair sample,
    // fixed [-1,1] 20-bin exact bucket arithmetic, empty bins explicit.
    "q_x104_cosine_histogram" -> { (s, dir) =>
      graft.ann.Embeddings.cosineHistogram(t(s, dir, "embeddings"),
        "vec_id", "embedding", stride = 7L)
        .orderBy(col("bucket"))
    },

    "q_x16_int8_quantization" -> { (s, dir) =>
      graft.ann.Embeddings.quantizeInt8(t(s, dir, "embeddings"),
        "vec_id", "embedding")
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale"),
          element_at(col("q"), 1).as("q1"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_l1"),
          round(col("max_abs_err"), 6).as("max_abs_err"))
        .orderBy(col("vec_id"))
    },

    // X54: seeded sign-matrix random projection 64→16 (Achlioptas/JL) —
    // the ANN pre-shrink; long-form output (vec_id, dim, value).
    "q_x54_random_projection" -> { (s, dir) =>
      graft.ann.Embeddings.randomProject(t(s, dir, "embeddings"),
        "vec_id", "embedding", dIn = 64, dOut = 16)
        .orderBy(col("vec_id"), col("dim"))
    },

    // X55: two-stage ANN — top-20 candidates in the 16-d projected
    // space, exact 64-d L2 re-rank to top-5 (the FAISS refine shape).
    "q_x55_projected_rerank" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.projectedRerankTopKL2(emb.filter(col("vec_id") % 4 === 0),
        emb, "vec_id", "embedding", dIn = 64, dOut = 16, k = 5,
        overfetch = 20)
        .orderBy(col("vec_id"), col("rk"))
    },

    // X10: embedding-cosine near-duplicate pairs (threshold 0.99),
    // label-blocked: candidates must share the label metadata column.
    "q_x10_embedding_neardup" -> { (s, dir) =>
      Similarity.cosineNearDuplicates(
        corpusWithNearDups(t(s, dir, "embeddings")),
        "vec_id", "embedding", 0.99, Dim, blockCols = Seq("label"),
        saltBuckets = 8) // 10 labels alone would cap parallelism at 10 tasks
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // X30: IVF-bucketed near-dup pairs over the SAME planted corpus but
    // with NO metadata blocking — the approximate fallback when no
    // blocking column exists (q_x10's alternative was O(n²)).
    "q_x30_ivf_neardup" -> { (s, dir) =>
      val corpus = corpusWithNearDups(t(s, dir, "embeddings"))
      Similarity.ivfCosineNearDuplicates(corpus, "vec_id", "embedding",
        corpus.filter(col("vec_id") % 40 === 0), 0.99, Dim, probes = 2)
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // X139: embedding-centroid drift across the label "periods" —
    // centroid cosine/L2 per period pair, scaled-LONG exact sums.
    "q_x139_embedding_drift" -> { (s, dir) =>
      Similarity.embeddingDrift(t(s, dir, "embeddings")
        .filter(col("label") < 4), col("label"), col("embedding"))
        .orderBy(col("period_a"), col("period_b"))
    },

    // X136: signed-random-projection LSH near-dup pairs over the same
    // planted corpus — no blocking metadata, no trained centroids;
    // fixed ±1 hyperplanes shared bit-for-bit with the oracle.
    "q_x136_srp_neardup" -> { (s, dir) =>
      Similarity.srpNearDuplicates(
        corpusWithNearDups(t(s, dir, "embeddings")).drop("label"),
        "vec_id", "embedding", 0.99, SrpSigns, SrpBits)
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // X44: SemDeDup corpus pruning over the same planted corpus — the
    // +100000 planted copies must be dropped (dup_of = their source,
    // when both land in the same cluster), organic rows all kept.
    "q_x44_semdedup" -> { (s, dir) =>
      val corpus = corpusWithNearDups(t(s, dir, "embeddings"))
      Similarity.semDeDup(corpus, "vec_id", "embedding",
        corpus.filter(col("vec_id") % 40 === 0), 0.99, Dim)
        .orderBy(col("vec_id"))
    })

  private val nnCte =
    """nn AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings)""".stripMargin

  /** The q_x179 bucketed-LOF oracle chain, parameterized by the
    * centroid predicate (fixed seed list vs the data-proportional
    * `vec_id % 3750 = 0` scale form — same SQL otherwise). */
  private def lofBucketedOracle(centroidPred: String): String =
    s"""WITH $nnCte,
       |cent AS (
       |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
       |  FROM nn WHERE $centroidPred),
       |asg AS (
       |  SELECT vec_id, v, centroid_id FROM (
       |    SELECT n.vec_id, n.v, c.centroid_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
       |          c.centroid_id) AS rn
       |    FROM nn n, cent c) WHERE rn = 1),
       |pairs AS (
       |  SELECT a.vec_id AS p, b.vec_id AS o,
       |    list_distance(a.v, b.v) AS d
       |  FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id
       |    AND a.vec_id <> b.vec_id
       |  WHERE NOT isnan(list_distance(a.v, b.v))),
       |rk AS (SELECT p, o, d,
       |    row_number() OVER (PARTITION BY p ORDER BY d, o) AS rn
       |  FROM pairs),
       |kd AS (SELECT p, max(d) AS kd FROM rk WHERE rn <= 5
       |  GROUP BY 1),
       |nb AS (SELECT r.p, r.o, r.d
       |  FROM rk r JOIN kd ON kd.p = r.p WHERE r.d <= kd.kd),
       |rch AS (SELECT nb.p, nb.o,
       |    CAST(floor(greatest(nb.d, k2.kd) * 1000000000.0 + 0.5)
       |      AS BIGINT) AS rs
       |  FROM nb JOIN kd k2 ON k2.p = nb.o),
       |lrd0 AS (SELECT p, CAST(count(*) AS BIGINT) AS nnb,
       |    CAST(sum(rs) AS BIGINT) AS sr
       |  FROM rch GROUP BY 1),
       |lrd AS (SELECT p, nnb, sr,
       |    CASE WHEN sr > 0 THEN CAST(nnb AS DOUBLE) * 1000000000.0
       |      / CAST(sr AS DOUBLE) END AS lrd
       |  FROM lrd0),
       |lrds AS (SELECT *,
       |    CAST(floor(lrd * 1000000000.0 + 0.5) AS BIGINT) AS lrds
       |  FROM lrd),
       |num AS (SELECT nb.p,
       |    sum(CAST(l2.lrds AS HUGEINT)) AS slo,
       |    CAST(sum(CASE WHEN l2.lrds IS NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nulln
       |  FROM nb JOIN lrds l2 ON l2.p = nb.o GROUP BY 1)
       |SELECT l.p AS id, a2.centroid_id AS bucket_id,
       |  floor(kd.kd * 1000000.0 + 0.5) / 1000000.0 AS k_dist,
       |  l.nnb AS n_neighbors,
       |  CASE WHEN l.lrd IS NOT NULL THEN
       |    floor(l.lrd * 1000000.0 + 0.5) / 1000000.0 END AS lrd,
       |  CASE WHEN l.lrds IS NOT NULL AND n.nulln = 0 THEN
       |    floor(CAST(CAST(n.slo AS VARCHAR) AS DOUBLE)
       |      / (CAST(l.nnb AS DOUBLE) * CAST(l.lrds AS DOUBLE))
       |      * 1000000.0 + 0.5) / 1000000.0 END AS lof
       |FROM lrds l JOIN num n ON n.p = l.p JOIN kd ON kd.p = l.p
       |JOIN asg a2 ON a2.vec_id = l.p
       |ORDER BY id""".stripMargin

  /** The q_x181 halo-LOF oracle: the [[lofBucketedOracle]] chain with
    * pair generation widened to the top-`probes` cells per point —
    * `halo ⋈ halo` on the cell key, DISTINCT (two shared cells emit the
    * identical list_distance twice), scores keyed to the primary cell. */
  private def lofHaloOracle(centroidPred: String, probes: Int): String =
    s"""WITH $nnCte,
       |cent AS (
       |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
       |  FROM nn WHERE $centroidPred),
       |rnk AS (
       |  SELECT n.vec_id, n.v, c.centroid_id,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
       |        c.centroid_id) AS rn
       |  FROM nn n, cent c),
       |asg AS (SELECT vec_id, v, centroid_id FROM rnk WHERE rn = 1),
       |halo AS (SELECT vec_id, v, centroid_id FROM rnk
       |  WHERE rn <= $probes),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS p, b.vec_id AS o,
       |    list_distance(a.v, b.v) AS d
       |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
       |    AND a.vec_id <> b.vec_id
       |  WHERE NOT isnan(list_distance(a.v, b.v))),
       |rk AS (SELECT p, o, d,
       |    row_number() OVER (PARTITION BY p ORDER BY d, o) AS rn
       |  FROM pairs),
       |kd AS (SELECT p, max(d) AS kd FROM rk WHERE rn <= 5
       |  GROUP BY 1),
       |nb AS (SELECT r.p, r.o, r.d
       |  FROM rk r JOIN kd ON kd.p = r.p WHERE r.d <= kd.kd),
       |rch AS (SELECT nb.p, nb.o,
       |    CAST(floor(greatest(nb.d, k2.kd) * 1000000000.0 + 0.5)
       |      AS BIGINT) AS rs
       |  FROM nb JOIN kd k2 ON k2.p = nb.o),
       |lrd0 AS (SELECT p, CAST(count(*) AS BIGINT) AS nnb,
       |    CAST(sum(rs) AS BIGINT) AS sr
       |  FROM rch GROUP BY 1),
       |lrd AS (SELECT p, nnb, sr,
       |    CASE WHEN sr > 0 THEN CAST(nnb AS DOUBLE) * 1000000000.0
       |      / CAST(sr AS DOUBLE) END AS lrd
       |  FROM lrd0),
       |lrds AS (SELECT *,
       |    CAST(floor(lrd * 1000000000.0 + 0.5) AS BIGINT) AS lrds
       |  FROM lrd),
       |num AS (SELECT nb.p,
       |    sum(CAST(l2.lrds AS HUGEINT)) AS slo,
       |    CAST(sum(CASE WHEN l2.lrds IS NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nulln
       |  FROM nb JOIN lrds l2 ON l2.p = nb.o GROUP BY 1)
       |SELECT l.p AS id, a2.centroid_id AS bucket_id,
       |  floor(kd.kd * 1000000.0 + 0.5) / 1000000.0 AS k_dist,
       |  l.nnb AS n_neighbors,
       |  CASE WHEN l.lrd IS NOT NULL THEN
       |    floor(l.lrd * 1000000.0 + 0.5) / 1000000.0 END AS lrd,
       |  CASE WHEN l.lrds IS NOT NULL AND n.nulln = 0 THEN
       |    floor(CAST(CAST(n.slo AS VARCHAR) AS DOUBLE)
       |      / (CAST(l.nnb AS DOUBLE) * CAST(l.lrds AS DOUBLE))
       |      * 1000000.0 + 0.5) / 1000000.0 END AS lof
       |FROM lrds l JOIN num n ON n.p = l.p JOIN kd ON kd.p = l.p
       |JOIN asg a2 ON a2.vec_id = l.p
       |ORDER BY id""".stripMargin

  // NaN cosines (zero-norm vectors) are unrankable and dropped — the
  // shared contract of both Spark brute-force forms
  private val bruteForceOracle: String =
    s"""WITH $nnCte,
       |pairs AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
       |  FROM nn a, nn b
       |  WHERE a.vec_id % 4 = 0 AND a.vec_id <> b.vec_id
       |    AND NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
       |rk AS (
       |  SELECT vec_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM pairs)
       |SELECT vec_id, rk, neighbor_id, round(cos, 6) AS cosine
       |FROM rk WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  private val ivfadcOracle: String =
    s"""WITH $nnCte,
      |cent AS (
      |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
      |  FROM nn WHERE vec_id % 40 = 0),
      |rnk AS (
      |  SELECT n.vec_id, n.v, c.centroid_id,
      |    row_number() OVER (PARTITION BY n.vec_id
      |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
      |        c.centroid_id) AS rn
      |  FROM nn n, cent c),
      |own AS (SELECT vec_id, centroid_id FROM rnk WHERE rn = 1),
      |probe AS (
      |  SELECT vec_id, centroid_id FROM rnk
      |  WHERE vec_id % 4 = 0 AND rn <= 2),
      |cdist AS (
      |  SELECT n.vec_id, s.s AS sub, c.centroid_id AS cid,
      |    list_sum(list_transform(range(1, 17), i ->
      |      (n.v[CAST(s.s * 16 + i AS INT)] - c.cv[CAST(s.s * 16 + i AS INT)])
      |      * (n.v[CAST(s.s * 16 + i AS INT)] - c.cv[CAST(s.s * 16 + i AS INT)])))
      |      AS d
      |  FROM nn n, range(4) AS s(s), cent c),
      |codes AS (
      |  SELECT vec_id, sub, cid FROM (
      |    SELECT vec_id, sub, cid,
      |      row_number() OVER (PARTITION BY vec_id, sub
      |        ORDER BY d, cid) AS rn
      |    FROM cdist) WHERE rn = 1),
      |pairs AS (
      |  SELECT p.vec_id, o.vec_id AS neighbor_id,
      |    list_sum(list(q.d ORDER BY b.sub)) AS sq_dist
      |  FROM probe p
      |  JOIN own o ON p.centroid_id = o.centroid_id
      |    AND p.vec_id <> o.vec_id
      |  JOIN codes b ON b.vec_id = o.vec_id
      |  JOIN cdist q ON q.vec_id = p.vec_id AND q.sub = b.sub
      |    AND q.cid = b.cid
      |  GROUP BY p.vec_id, o.vec_id),
      |rk AS (
      |  SELECT vec_id, neighbor_id, sq_dist,
      |    CAST(row_number() OVER (PARTITION BY vec_id
      |      ORDER BY sq_dist, neighbor_id) AS BIGINT) AS rk
      |  FROM pairs)
      |SELECT vec_id, rk, neighbor_id, round(sq_dist, 6) AS sq_dist
      |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin

  val oracles: Map[String, String] = Map(
    // Same population-covariance formula from the same moment sums;
    // parallel unnest aligns value and index positionally.
    "q_x102_embedding_covariance" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    unnest(range(0, len(embedding))) AS i
        |  FROM embeddings),
        |n0 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
        |s AS (SELECT i, sum(x) AS sx FROM ex GROUP BY i),
        |p AS (
        |  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sp
        |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT p.i AS i, p.j AS j,
        |  sp / n - (si.sx / n) * (sj.sx / n) AS cov
        |FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j, n0
        |ORDER BY p.i, p.j""".stripMargin,
    "q_x8_ann_bruteforce" -> bruteForceOracle,
    // streamed-index form computes the SAME exact function — one oracle
    "q_x29_bruteforce_streamed" -> bruteForceOracle,
    // IVF-L2: argmin assignment (dist asc, centroid id — NaN last in
    // asc order on both engines), in-bucket ranking by the same key
    "q_x49_ann_ivf_l2" ->
      """WITH nn AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (
        |  SELECT vec_id AS centroid_id, v AS cv
        |  FROM nn WHERE vec_id % 40 = 0),
        |asg AS (
        |  SELECT vec_id, v, centroid_id FROM (
        |    SELECT n.vec_id, n.v, c.centroid_id,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_distance(n.v, c.cv), c.centroid_id) AS rn
        |    FROM nn n, cent c) WHERE rn = 1),
        |pairs AS (
        |  SELECT a.vec_id, a.centroid_id, b.vec_id AS neighbor_id,
        |    list_distance(a.v, b.v) AS dist
        |  FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id
        |    AND a.vec_id <> b.vec_id
        |  WHERE NOT isnan(list_distance(a.v, b.v))),
        |rk AS (
        |  SELECT vec_id, centroid_id, neighbor_id, dist,
        |    CAST(row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
        |  FROM pairs)
        |SELECT vec_id, centroid_id, rk, neighbor_id,
        |  round(dist, 6) AS distance
        |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    // L2 variant: DuckDB's native list_distance IS sqrt(Σ(a-b)²) with
    // the same left-to-right accumulation as the Spark kernel
    "q_x47_ann_l2" ->
      """WITH nn AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id, b.vec_id AS neighbor_id,
        |    list_distance(a.v, b.v) AS dist
        |  FROM nn a, nn b
        |  WHERE a.vec_id % 4 = 0 AND a.vec_id <> b.vec_id
        |    AND NOT isnan(list_distance(a.v, b.v))),
        |rk AS (
        |  SELECT vec_id, neighbor_id, dist,
        |    CAST(row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
        |  FROM pairs)
        |SELECT vec_id, rk, neighbor_id, round(dist, 6) AS distance
        |FROM rk WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin,
    // Simplified silhouette: same list_distance distances, same
    // (distance, centroid) tie-break, identical scaled-LONG means.
    "q_x178_silhouette" ->
      """WITH pts AS (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cs AS (SELECT vec_id AS cid, v AS cv FROM pts
        |       WHERE vec_id IN (0, 7, 14, 21)),
        |d AS (SELECT p.vec_id AS pid, c.cid,
        |    list_distance(p.v, c.cv) AS d
        |  FROM pts p CROSS JOIN cs c),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY pid
        |    ORDER BY d, cid) AS BIGINT) AS rk FROM d),
        |pp AS (SELECT a.pid, a.cid AS cluster_id, a.d AS da,
        |    b.d AS db
        |  FROM r a JOIN r b ON b.pid = a.pid AND b.rk = 2
        |  WHERE a.rk = 1),
        |s AS (SELECT cluster_id,
        |    CASE WHEN greatest(da, db) > 0
        |      THEN (db - da) / greatest(da, db) ELSE 0.0 END AS sil
        |  FROM pp)
        |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_points,
        |  floor(CAST(sum(CAST(floor(sil * 1000000000.0 + 0.5)
        |      AS BIGINT)) AS DOUBLE) / 1000000000.0
        |    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_silhouette
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same list_distance pairs; tie-inclusive k-distance neighborhood,
    // floor-scaled reach/lrd integers, the identical lof tree. The
    // HUGEINT lrd sum routes to DOUBLE via VARCHAR (the f42 cast
    // lesson).
    "q_x165_lof" ->
      """WITH nn AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |pairs AS (
        |  SELECT a.vec_id AS p, b.vec_id AS o,
        |    list_distance(a.v, b.v) AS d
        |  FROM nn a, nn b
        |  WHERE a.vec_id <> b.vec_id
        |    AND NOT isnan(list_distance(a.v, b.v))),
        |rk AS (SELECT p, o, d,
        |    row_number() OVER (PARTITION BY p ORDER BY d, o) AS rn
        |  FROM pairs),
        |kd AS (SELECT p, max(d) AS kd FROM rk WHERE rn <= 5
        |  GROUP BY 1),
        |nb AS (SELECT r.p, r.o, r.d
        |  FROM rk r JOIN kd ON kd.p = r.p WHERE r.d <= kd.kd),
        |rch AS (SELECT nb.p, nb.o,
        |    CAST(floor(greatest(nb.d, k2.kd) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS rs
        |  FROM nb JOIN kd k2 ON k2.p = nb.o),
        |lrd0 AS (SELECT p, CAST(count(*) AS BIGINT) AS nnb,
        |    CAST(sum(rs) AS BIGINT) AS sr
        |  FROM rch GROUP BY 1),
        |lrd AS (SELECT p, nnb, sr,
        |    CASE WHEN sr > 0 THEN CAST(nnb AS DOUBLE) * 1000000000.0
        |      / CAST(sr AS DOUBLE) END AS lrd
        |  FROM lrd0),
        |lrds AS (SELECT *,
        |    CAST(floor(lrd * 1000000000.0 + 0.5) AS BIGINT) AS lrds
        |  FROM lrd),
        |num AS (SELECT nb.p,
        |    sum(CAST(l2.lrds AS HUGEINT)) AS slo,
        |    CAST(sum(CASE WHEN l2.lrds IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nulln
        |  FROM nb JOIN lrds l2 ON l2.p = nb.o GROUP BY 1)
        |SELECT l.p AS id,
        |  floor(kd.kd * 1000000.0 + 0.5) / 1000000.0 AS k_dist,
        |  l.nnb AS n_neighbors,
        |  CASE WHEN l.lrd IS NOT NULL THEN
        |    floor(l.lrd * 1000000.0 + 0.5) / 1000000.0 END AS lrd,
        |  CASE WHEN l.lrds IS NOT NULL AND n.nulln = 0 THEN
        |    floor(CAST(CAST(n.slo AS VARCHAR) AS DOUBLE)
        |      / (CAST(l.nnb AS DOUBLE) * CAST(l.lrds AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS lof
        |FROM lrds l JOIN num n ON n.p = l.p JOIN kd ON kd.p = l.p
        |ORDER BY id""".stripMargin,
    // Embedding drift: the same 1e-6-grid micro moments per
    // (side, dimension); parallel unnest aligns value and index; all
    // published trees mirror the Spark expressions exactly.
    "q_x180_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    unnest(range(0, len(embedding))) AS i
        |  FROM embeddings),
        |xm AS (SELECT vec_id, i,
        |    CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS m FROM e),
        |mr AS (SELECT i AS dim_idx, CAST(count(*) AS BIGINT) AS n_ref,
        |    sum(CAST(m AS HUGEINT)) AS sr,
        |    sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS qr
        |  FROM xm WHERE vec_id % 2 = 0 GROUP BY 1),
        |mc AS (SELECT i AS dim_idx, CAST(count(*) AS BIGINT) AS n_cur,
        |    sum(CAST(m AS HUGEINT)) AS sc,
        |    sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS qc
        |  FROM xm WHERE vec_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT mr.dim_idx, n_ref, n_cur,
        |    CAST(sr AS DOUBLE) AS sr, CAST(qr AS DOUBLE) AS qr,
        |    CAST(sc AS DOUBLE) AS sc, CAST(qc AS DOUBLE) AS qc
        |  FROM mr JOIN mc ON mr.dim_idx = mc.dim_idx),
        |tm AS (SELECT *,
        |    sr / 1000000.0 / CAST(n_ref AS DOUBLE) AS mean_r,
        |    sc / 1000000.0 / CAST(n_cur AS DOUBLE) AS mean_c,
        |    sqrt(greatest(
        |      ((qr - sr * sr / CAST(n_ref AS DOUBLE))
        |        + (qc - sc * sc / CAST(n_cur AS DOUBLE)))
        |      / (CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE)),
        |      0.0)) / 1000000.0 AS sd
        |  FROM j)
        |SELECT CAST(dim_idx AS BIGINT) AS dim_idx, n_ref, n_cur,
        |  floor(mean_r * 1000000.0 + 0.5) / 1000000.0 AS mean_ref,
        |  floor(mean_c * 1000000.0 + 0.5) / 1000000.0 AS mean_cur,
        |  floor((mean_c - mean_r) * 1000000.0 + 0.5) / 1000000.0
        |    AS mean_diff,
        |  floor(sd * 1000000.0 + 0.5) / 1000000.0 AS pooled_sd,
        |  CASE WHEN sd > 0 THEN
        |    floor((mean_c - mean_r) / sd * 1000000.0 + 0.5) / 1000000.0
        |    END AS std_shift
        |FROM tm ORDER BY dim_idx""".stripMargin,
    // Bucketed LOF: the q_x9 assignment mirror (cos desc, centroid id
    // tie-break) + the q_x165 LOF chain with pairs generated WITHIN
    // the assigned bucket; bucket_id joins back onto the output.
    "q_x179_lof_bucketed" ->
      lofBucketedOracle("vec_id IN (0, 7, 14, 21)"),
    // The adaptive-nlist scale form: identical chain, centroid set
    // data-proportional (vec_id % 3750 = 0).
    "q_x179b_lof_bucketed_adaptive" ->
      lofBucketedOracle("vec_id % 3750 = 0"),
    // The halo form: pair generation widened to the top-2 probed cells
    // of a data-proportional centroid set.
    "q_x181_lof_halo" ->
      lofHaloOracle("vec_id % 250 = 0", probes = 2),
    // X183: the X182 chain cut to reciprocal edges, then the X17
    // recursive min-label closure.
    "q_x183_mutual_knn_clusters" ->
      s"""WITH RECURSIVE nn AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |      CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS rk,
         |    round(cos, 6) AS cosine
         |  FROM pairs),
         |knn AS (SELECT vec_id, neighbor_id FROM rk
         |  WHERE rk <= 5 AND cosine >= 0.0),
         |mutual AS (
         |  SELECT a.vec_id AS a, a.neighbor_id AS b
         |  FROM knn a JOIN knn b ON a.vec_id = b.neighbor_id
         |    AND a.neighbor_id = b.vec_id
         |  WHERE a.vec_id < a.neighbor_id),
         |edges AS (SELECT a, b FROM mutual
         |          UNION SELECT b, a FROM mutual),
         |reach(v, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON reach.v = e.a)
         |SELECT v AS vec_id, CAST(min(r) AS BIGINT) AS cluster_id,
         |  v = min(r) AS is_canonical
         |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin,
    // X184: the X182 chain, then exact-integer Pearson moments over
    // symmetrized edge-endpoint degrees; HUGEINT -> DOUBLE via VARCHAR.
    "q_x184_graph_shape" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |cand AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM cand),
         |e AS (SELECT DISTINCT vec_id AS a, neighbor_id AS b FROM rk
         |  WHERE rk <= 5 AND vec_id <> neighbor_id),
         |ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         |rc AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocal
         |  FROM e x JOIN e y ON x.a = y.b AND x.b = y.a),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d
         |  FROM sym GROUP BY 1),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
         |pr AS (
         |  SELECT dx.d AS x, dy.d AS y
         |  FROM sym JOIN deg dx ON dx.a = sym.a
         |  JOIN deg dy ON dy.a = sym.b),
         |mm AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    sum(CAST(x AS HUGEINT)) AS sx,
         |    sum(CAST(y AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * y) AS sxy,
         |    sum(CAST(x AS HUGEINT) * x) AS sxx,
         |    sum(CAST(y AS HUGEINT) * y) AS syy
         |  FROM pr)
         |SELECT (SELECT n_nodes FROM nc) AS n_nodes,
         |  (SELECT n_edges FROM ec) AS n_edges,
         |  (SELECT n_reciprocal FROM rc) AS n_reciprocal,
         |  CASE WHEN (SELECT n_edges FROM ec) > 0 THEN
         |    floor(CAST((SELECT n_reciprocal FROM rc) AS DOUBLE)
         |      / CAST((SELECT n_edges FROM ec) AS DOUBLE)
         |      * 1000000.0 + 0.5) / 1000000.0 END AS reciprocity,
         |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |    THEN floor(
         |      CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) /
         |      (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
         |       * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR)
         |           AS DOUBLE)))
         |      * 1000000.0 + 0.5) / 1000000.0 END AS assortativity
         |FROM mm""".stripMargin,
    // X182: the halo candidate relation ranked by (cos desc, id) per
    // source — the brute-force tie order, restricted to shared cells.
    "q_x182_knn_graph" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin,
    // X187: the X183 recursive-closure oracle with the X185 store's
    // parameters (cent % 50, k = 4) — the maintained view must equal
    // the one-shot chain over the union corpus.
    "q_x187_incremental_communities" ->
      s"""WITH RECURSIVE nn AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |      CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 50 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS rk,
         |    round(cos, 6) AS cosine
         |  FROM pairs),
         |knn AS (SELECT vec_id, neighbor_id FROM rk
         |  WHERE rk <= 4 AND cosine >= 0.0),
         |mutual AS (
         |  SELECT a.vec_id AS a, a.neighbor_id AS b
         |  FROM knn a JOIN knn b ON a.vec_id = b.neighbor_id
         |    AND a.neighbor_id = b.vec_id
         |  WHERE a.vec_id < a.neighbor_id),
         |edges AS (SELECT a, b FROM mutual
         |          UNION SELECT b, a FROM mutual),
         |reach(v, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON reach.v = e.a)
         |SELECT v AS vec_id, CAST(min(r) AS BIGINT) AS cluster_id,
         |  v = min(r) AS is_canonical
         |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin,
    // X186: the X184 halo/edge chain, then the exact triangle census —
    // canonical (a < b) simple edges, ordered two-wedge join closed by
    // a third edge, per-corner triangle counts; coefficients mirror
    // the X91 tree, the average rides 1e12 scaled terms; HUGEINT
    // reaches DOUBLE via VARCHAR (the x184 lesson).
    "q_x186_clustering_report" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |cand AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM cand),
         |e AS (SELECT DISTINCT vec_id AS a, neighbor_id AS b FROM rk
         |  WHERE rk <= 5 AND vec_id <> neighbor_id),
         |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
         |  FROM e),
         |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT a AS n FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY 1),
         |tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
         |  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
         |pn AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
         |    SELECT x AS n FROM tr UNION ALL SELECT y FROM tr
         |    UNION ALL SELECT z FROM tr)
         |  GROUP BY 1),
         |cf AS (SELECT deg.n, deg.d, COALESCE(pn.t, 0) AS t,
         |    CASE WHEN deg.d < 2 THEN 0.0
         |      ELSE CAST(COALESCE(pn.t, 0) * 2 AS DOUBLE)
         |        / CAST(deg.d * (deg.d - 1) AS DOUBLE) END AS coef
         |  FROM deg LEFT JOIN pn ON pn.n = deg.n),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |    sum(CAST(d AS HUGEINT)) AS sd,
         |    sum(CAST(d AS HUGEINT) * (d - 1)) AS w2,
         |    sum(CAST(t AS HUGEINT)) AS t3,
         |    sum(CASE WHEN d >= 2 THEN
         |      CAST(floor(coef * 1000000000000.0 + 0.5) AS HUGEINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS sc,
         |    CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nc
         |  FROM cf)
         |SELECT n_nodes,
         |  CAST(sd // 2 AS BIGINT) AS n_edges,
         |  CAST(w2 // 2 AS BIGINT) AS n_wedges,
         |  CAST(t3 // 3 AS BIGINT) AS n_triangles,
         |  CASE WHEN CAST(CAST(w2 AS VARCHAR) AS DOUBLE) > 0 THEN
         |    floor((2.0 * CAST(CAST(t3 AS VARCHAR) AS DOUBLE))
         |      / CAST(CAST(w2 AS VARCHAR) AS DOUBLE)
         |      * 1000000.0 + 0.5) / 1000000.0 END AS transitivity,
         |  CASE WHEN nc > 0 THEN
         |    floor((CAST(CAST(sc AS VARCHAR) AS DOUBLE)
         |        / 1000000000000.0) / CAST(nc AS DOUBLE)
         |      * 1000000.0 + 0.5) / 1000000.0 END AS avg_clustering
         |FROM m""".stripMargin,
    // X185: the REBUILD-PARITY contract is the oracle — the maintained
    // latest-batch-per-source view must equal the one-shot X182 chain
    // over the whole corpus (centroids % 50, k = 4).
    "q_x185_knn_graph_incremental" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 50 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 4 ORDER BY vec_id, rk""".stripMargin,
    // X188: rebuild-parity over the SURVIVORS — the centroid table
    // stays the frozen full-corpus % 50 set (a parameter, not data),
    // the point population drops the tombstoned % 7 == 3 ids; an
    // independent full recomputation of what delete + compaction must
    // leave behind.
    "q_x188_knn_graph_delete" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 50 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c WHERE n.vec_id % 7 <> 3),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 4 ORDER BY vec_id, rk""".stripMargin,
    // X189: fresh-build parity under the NEW centroid space (% 30)
    // over the surviving points — the refresh epoch must be
    // indistinguishable from building the graph from scratch.
    "q_x189_knn_graph_refresh" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 30 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c WHERE n.vec_id % 7 <> 3),
         |halo AS (SELECT vec_id, v, nrm, centroid_id FROM rnk
         |  WHERE rn <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM halo a JOIN halo b ON a.centroid_id = b.centroid_id
         |    AND a.vec_id <> b.vec_id
         |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |rk AS (
         |  SELECT vec_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 4 ORDER BY vec_id, rk""".stripMargin,
    // MMR: the 3-step greedy unrolled — sel1 = argmax rel, later steps
    // argmax λ·rel − (1−λ)·max(0, cos-to-selected). λ is CAST to DOUBLE
    // so (1 − λ) is the same IEEE 0.30000000000000004 the Scala side
    // computes (a DECIMAL literal would give exactly 0.3 and drift every
    // score); the penalty floor at zero mirrors the operator's
    // "negative similarity never rewards" convention.
    "q_x80_mmr_topk" -> {
      val lam = "CAST(0.7 AS DOUBLE)"
      s"""WITH $nnCte,
         |p0 AS (
         |  SELECT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos,
         |    b.v AS cv, b.nrm AS cn
         |  FROM nn a JOIN nn b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id % 4 = 0
         |    AND NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |cand AS (
         |  SELECT vec_id, neighbor_id, cos AS rel, cv, cn
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, neighbor_id) AS rk FROM p0)
         |  WHERE rk <= 10),
         |pw AS (
         |  SELECT a.vec_id, a.neighbor_id AS i, b.neighbor_id AS j,
         |    list_dot_product(a.cv, b.cv) / (a.cn * b.cn) AS s
         |  FROM cand a JOIN cand b ON a.vec_id = b.vec_id
         |    AND a.neighbor_id <> b.neighbor_id),
         |s1 AS (
         |  SELECT vec_id, neighbor_id, $lam * rel AS score
         |  FROM (SELECT vec_id, neighbor_id, rel,
         |          row_number() OVER (PARTITION BY vec_id
         |            ORDER BY rel DESC, neighbor_id) AS rn FROM cand)
         |  WHERE rn = 1),
         |r2 AS (
         |  SELECT c.vec_id, c.neighbor_id,
         |    $lam * c.rel - (1 - $lam) *
         |      greatest(CAST(0 AS DOUBLE), p.s) AS score
         |  FROM cand c
         |  JOIN s1 ON s1.vec_id = c.vec_id
         |    AND c.neighbor_id <> s1.neighbor_id
         |  JOIN pw p ON p.vec_id = c.vec_id AND p.i = c.neighbor_id
         |    AND p.j = s1.neighbor_id),
         |s2 AS (
         |  SELECT vec_id, neighbor_id, score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |          ORDER BY score DESC, neighbor_id) AS rn FROM r2)
         |  WHERE rn = 1),
         |r3 AS (
         |  SELECT c.vec_id, c.neighbor_id,
         |    $lam * c.rel - (1 - $lam) *
         |      greatest(CAST(0 AS DOUBLE), p1.s, p2.s) AS score
         |  FROM cand c
         |  JOIN s1 ON s1.vec_id = c.vec_id
         |    AND c.neighbor_id <> s1.neighbor_id
         |  JOIN s2 ON s2.vec_id = c.vec_id
         |    AND c.neighbor_id <> s2.neighbor_id
         |  JOIN pw p1 ON p1.vec_id = c.vec_id AND p1.i = c.neighbor_id
         |    AND p1.j = s1.neighbor_id
         |  JOIN pw p2 ON p2.vec_id = c.vec_id AND p2.i = c.neighbor_id
         |    AND p2.j = s2.neighbor_id),
         |s3 AS (
         |  SELECT vec_id, neighbor_id, score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |          ORDER BY score DESC, neighbor_id) AS rn FROM r3)
         |  WHERE rn = 1)
         |SELECT vec_id, CAST(1 AS BIGINT) AS rank, neighbor_id,
         |  round(score, 6) AS mmr_score FROM s1
         |UNION ALL
         |SELECT vec_id, CAST(2 AS BIGINT), neighbor_id, round(score, 6)
         |FROM s2
         |UNION ALL
         |SELECT vec_id, CAST(3 AS BIGINT), neighbor_id, round(score, 6)
         |FROM s3
         |ORDER BY vec_id, rank""".stripMargin
    },
    // Triplet mining: the same top-20 chain with labels; positive/
    // semi-hard-negative windows on the shared round-6 cosine.
    "q_x82_triplet_mine" ->
      s"""WITH $nnCte,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |p0 AS (
         |  SELECT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM nn a JOIN nn b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id % 4 = 0
         |    AND NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))),
         |cand AS (
         |  SELECT vec_id, neighbor_id, round(cos, 6) AS cosine
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, neighbor_id) AS rk FROM p0)
         |  WHERE rk <= 20),
         |lc AS (
         |  SELECT c.vec_id, c.neighbor_id, c.cosine,
         |    ql.label AS ql, cl.label AS cl
         |  FROM cand c
         |  JOIN lab ql ON ql.vec_id = c.vec_id
         |  JOIN lab cl ON cl.vec_id = c.neighbor_id),
         |pos AS (
         |  SELECT vec_id, neighbor_id, cosine
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cosine DESC, neighbor_id) AS rn
         |        FROM lc WHERE ql = cl)
         |  WHERE rn = 1),
         |negs AS (
         |  SELECT vec_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT l.* FROM lc l
         |        JOIN pos p ON p.vec_id = l.vec_id
         |        WHERE l.ql <> l.cl AND l.cosine < p.cosine) t)
         |SELECT vec_id, 'pos' AS role, CAST(1 AS BIGINT) AS rank,
         |  neighbor_id, cosine
         |FROM pos
         |UNION ALL
         |SELECT vec_id, 'neg', rank, neighbor_id, cosine
         |FROM negs WHERE rank <= 3
         |ORDER BY vec_id, role, rank""".stripMargin,
    // Mean-pool: per-(group, pos) sum/count, means rounded before the
    // norm fold so both engines square identical doubles.
    "q_x79_mean_pool" ->
      """WITH v AS (
        |  SELECT vec_id // 8 AS group_id,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |u AS (
        |  SELECT group_id, CAST(i AS INT) - 1 AS pos,
        |    v[CAST(i AS INT)] AS val
        |  FROM (SELECT group_id, v, unnest(range(1, len(v) + 1)) AS i
        |        FROM v)),
        |m AS (
        |  SELECT group_id, pos, round(sum(val) / count(*), 6) AS m,
        |    count(*) AS c
        |  FROM u GROUP BY 1, 2),
        |g AS (
        |  SELECT group_id, CAST(max(c) AS BIGINT) AS n_vecs,
        |    list(m ORDER BY pos) AS mean_embedding
        |  FROM m GROUP BY 1),
        |n AS (
        |  SELECT group_id, n_vecs,
        |    round(sqrt(list_sum(list_transform(mean_embedding,
        |      x -> x * x))), 6) AS l2_norm
        |  FROM g)
        |SELECT n.group_id, n.n_vecs, n.l2_norm,
        |  CAST(m.pos AS INT) AS pos, m.m AS mean_val
        |FROM n JOIN m ON m.group_id = n.group_id
        |ORDER BY n.group_id, pos""".stripMargin,
    // Index form: corpus buckets from the same argmax assignment (the
    // two-batch append is invisible to the result — set semantics),
    // query batch probe-1 assigned, in-bucket exact cosine.
    "q_x76_ivf_index_query" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |corp AS (
         |  SELECT vec_id, v, nrm, centroid_id FROM (
         |    SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |          c.centroid_id) AS rn
         |    FROM nn n, cent c WHERE n.vec_id % 4 <> 0) WHERE rn = 1),
         |qry AS (
         |  SELECT vec_id, v, nrm, centroid_id FROM (
         |    SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |          c.centroid_id) AS rn
         |    FROM nn n, cent c WHERE n.vec_id % 4 = 0) WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id, a.centroid_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM qry a JOIN corp b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, centroid_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    // X191: the q_x76 computation over an index corpus that excludes
    // the tombstoned % 9 == 2 vectors — what the canonical read must
    // be indistinguishable from.
    "q_x191_ivf_index_delete" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |corp AS (
         |  SELECT vec_id, v, nrm, centroid_id FROM (
         |    SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |          c.centroid_id) AS rn
         |    FROM nn n, cent c
         |    WHERE n.vec_id % 4 <> 0 AND n.vec_id % 9 <> 2) WHERE rn = 1),
         |qry AS (
         |  SELECT vec_id, v, nrm, centroid_id FROM (
         |    SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |          c.centroid_id) AS rn
         |    FROM nn n, cent c WHERE n.vec_id % 4 = 0) WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id, a.centroid_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM qry a JOIN corp b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, centroid_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "q_x9_ann_ivf" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |asg AS (
         |  SELECT vec_id, v, nrm, centroid_id FROM (
         |    SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |          c.centroid_id) AS rn
         |    FROM nn n, cent c) WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id, a.centroid_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM asg a JOIN asg b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, centroid_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "q_x9b_ann_ivf_multiprobe" ->
      s"""WITH $nnCte,
         |cent AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |rnk AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, cent c),
         |own AS (SELECT vec_id, v, nrm, centroid_id FROM rnk WHERE rn = 1),
         |probe AS (SELECT vec_id, v, nrm, centroid_id FROM rnk WHERE rn <= 2),
         |pairs AS (
         |  SELECT a.vec_id, b.vec_id AS neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM probe a JOIN own b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, rk, neighbor_id, round(cos, 6) AS cosine
         |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "q_x25_pq_encode" ->
      """WITH nn AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM nn WHERE vec_id % 40 = 0),
        |dists AS (
        |  SELECT n.vec_id, s.s AS sub, c.cid,
        |    list_sum(list_transform(range(1, 17), i ->
        |      (n.v[CAST(s.s * 16 + i AS INT)] - c.cv[CAST(s.s * 16 + i AS INT)])
        |      * (n.v[CAST(s.s * 16 + i AS INT)] - c.cv[CAST(s.s * 16 + i AS INT)])))
        |      AS d
        |  FROM nn n, range(4) AS s(s), cent c),
        |best AS (
        |  SELECT vec_id, sub, cid, d,
        |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
        |  FROM dists)
        |SELECT vec_id,
        |  max(CASE WHEN sub = 0 THEN cid END) AS code_0,
        |  max(CASE WHEN sub = 1 THEN cid END) AS code_1,
        |  max(CASE WHEN sub = 2 THEN cid END) AS code_2,
        |  max(CASE WHEN sub = 3 THEN cid END) AS code_3,
        |  round(list_sum(list(d ORDER BY sub)), 6) AS sq_err
        |FROM best WHERE rn = 1
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // IVFADC ground truth: probe-0 assignment (candidates) and top-2
    // probes (queries) by cosine as in q_x9/q_x9b; PQ codes as in q_x25;
    // ADC distance = per-subspace exact query-to-centroid squared
    // distances summed in subspace order (each pair appears once: a
    // candidate lives in exactly one bucket).
    "q_x26_ivfadc" -> ivfadcOracle,
    // the distributed-query form computes the SAME function — one oracle
    "q_x28_ivfadc_distributed" -> ivfadcOracle,
    // Residual IVFADC ground truth: same assignment/probing as q_x26;
    // candidate codes minimize the RESIDUAL subdistance against the
    // candidate's own bucket centroid; pair distance sums the query's
    // bucket-residual subdistances at the candidate's codes.
    "q_x27_ivfadc_residual" ->
      s"""WITH $nnCte,
         |centv AS (
         |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
         |  FROM nn WHERE vec_id % 40 = 0),
         |rnk AS (
         |  SELECT n.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
         |        c.centroid_id) AS rn
         |  FROM nn n, centv c),
         |own AS (SELECT vec_id, centroid_id FROM rnk WHERE rn = 1),
         |probe AS (
         |  SELECT vec_id, centroid_id FROM rnk
         |  WHERE vec_id % 4 = 0 AND rn <= 2),
         |crd AS (
         |  SELECT n.vec_id, s.s AS sub, c.centroid_id AS cid,
         |    list_sum(list_transform(range(1, 17), i ->
         |      ((n.v[CAST(s.s * 16 + i AS INT)] - oc.cv[CAST(s.s * 16 + i AS INT)])
         |        - c.cv[CAST(s.s * 16 + i AS INT)])
         |      * ((n.v[CAST(s.s * 16 + i AS INT)] - oc.cv[CAST(s.s * 16 + i AS INT)])
         |        - c.cv[CAST(s.s * 16 + i AS INT)]))) AS d
         |  FROM nn n
         |  JOIN own o ON o.vec_id = n.vec_id
         |  JOIN centv oc ON oc.centroid_id = o.centroid_id,
         |  range(4) AS s(s), centv c),
         |codes AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |        ORDER BY d, cid) AS rn
         |    FROM crd) WHERE rn = 1),
         |qrd AS (
         |  SELECT p.vec_id, p.centroid_id AS pc, s.s AS sub,
         |    c.centroid_id AS cid,
         |    list_sum(list_transform(range(1, 17), i ->
         |      ((n.v[CAST(s.s * 16 + i AS INT)] - pv.cv[CAST(s.s * 16 + i AS INT)])
         |        - c.cv[CAST(s.s * 16 + i AS INT)])
         |      * ((n.v[CAST(s.s * 16 + i AS INT)] - pv.cv[CAST(s.s * 16 + i AS INT)])
         |        - c.cv[CAST(s.s * 16 + i AS INT)]))) AS d
         |  FROM probe p
         |  JOIN nn n ON n.vec_id = p.vec_id
         |  JOIN centv pv ON pv.centroid_id = p.centroid_id,
         |  range(4) AS s(s), centv c),
         |pairs AS (
         |  SELECT p.vec_id, o.vec_id AS neighbor_id,
         |    list_sum(list(q.d ORDER BY b.sub)) AS sq_dist
         |  FROM probe p
         |  JOIN own o ON p.centroid_id = o.centroid_id
         |    AND p.vec_id <> o.vec_id
         |  JOIN codes b ON b.vec_id = o.vec_id
         |  JOIN qrd q ON q.vec_id = p.vec_id AND q.pc = p.centroid_id
         |    AND q.sub = b.sub AND q.cid = b.cid
         |  GROUP BY p.vec_id, o.vec_id),
         |rk AS (
         |  SELECT vec_id, neighbor_id, sq_dist,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY sq_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM pairs)
         |SELECT vec_id, rk, neighbor_id, round(sq_dist, 6) AS sq_dist
         |FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    // Dim ablation: same slices, same sequential dot-product
    // accumulation order; only the per-dim averages rounded.
    // Identical fold cosines, identical subtract/divide/floor buckets.
    "q_x104_cosine_histogram" ->
      """WITH nn AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT a.v AS va, b.v AS vb
        |  FROM nn a JOIN nn b ON b.vec_id = a.vec_id + 7),
        |c AS (
        |  SELECT CASE WHEN sqrt(list_dot_product(va, va)) *
        |      sqrt(list_dot_product(vb, vb)) > 0
        |    THEN list_dot_product(va, vb) /
        |      (sqrt(list_dot_product(va, va)) *
        |       sqrt(list_dot_product(vb, vb))) END AS cos
        |  FROM p),
        |bk AS (
        |  SELECT CAST(least(floor((cos + 1.0) / 0.1), 19.0) AS BIGINT)
        |    AS bucket, CAST(count(*) AS BIGINT) AS n
        |  FROM c WHERE cos IS NOT NULL GROUP BY 1),
        |grid AS (SELECT unnest(range(0, 20)) AS bucket)
        |SELECT g.bucket AS bucket,
        |  round(-1.0 + g.bucket * 0.1, 6) AS lo,
        |  round(-1.0 + (g.bucket + 1) * 0.1, 6) AS hi,
        |  coalesce(bk.n, 0) AS n
        |FROM grid g LEFT JOIN bk USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_x95_dim_ablation" ->
      """WITH nn AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT a.v AS va, b.v AS vb
        |  FROM nn a JOIN nn b ON b.vec_id = a.vec_id + 17),
        |c AS (
        |  SELECT d.d AS dim,
        |    CASE WHEN sqrt(list_dot_product(p.va[1:d.d], p.va[1:d.d])) *
        |        sqrt(list_dot_product(p.vb[1:d.d], p.vb[1:d.d])) > 0
        |      THEN list_dot_product(p.va[1:d.d], p.vb[1:d.d]) /
        |        (sqrt(list_dot_product(p.va[1:d.d], p.va[1:d.d])) *
        |         sqrt(list_dot_product(p.vb[1:d.d], p.vb[1:d.d]))) END
        |      AS cos,
        |    CASE WHEN sqrt(list_dot_product(p.va[1:64], p.va[1:64])) *
        |        sqrt(list_dot_product(p.vb[1:64], p.vb[1:64])) > 0
        |      THEN list_dot_product(p.va[1:64], p.vb[1:64]) /
        |        (sqrt(list_dot_product(p.va[1:64], p.va[1:64])) *
        |         sqrt(list_dot_product(p.vb[1:64], p.vb[1:64]))) END
        |      AS cfull
        |  FROM p, (VALUES (8), (16), (32), (64)) AS d(d)),
        |f AS (SELECT * FROM c
        |      WHERE cos IS NOT NULL AND cfull IS NOT NULL)
        |SELECT dim, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(avg(cos), 6) AS mean_cosine,
        |  round(avg(abs(cos - cfull)), 6) AS mad_vs_full
        |FROM f GROUP BY dim ORDER BY dim""".stripMargin,
    "q_x16_int8_quantization" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM base),
        |q AS (
        |  SELECT vec_id, v, scale,
        |    CASE WHEN scale > 0
        |      THEN list_transform(v, x -> CAST(round(x / scale) AS INTEGER))
        |      ELSE list_transform(v, x -> 0) END AS qv
        |  FROM s)
        |SELECT vec_id, round(scale, 6) AS scale, qv[1] AS q1,
        |  CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(qv, x -> CAST(abs(x) AS BIGINT))) AS BIGINT) AS q_l1,
        |  round(CASE WHEN scale > 0
        |    THEN list_max(list_transform(range(1, len(v) + 1),
        |      i -> abs(v[i] - qv[i] * scale)))
        |    ELSE 0.0 END, 6) AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,
    // Random projection: identical md5-parity sign matrix (0-based i, j),
    // multiply by the exact reciprocal 1/sqrt(16) = 0.25 on both engines.
    "q_x54_random_projection" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |mat AS (
        |  SELECT ti.i, tj.dim,
        |    CASE WHEN (strpos('0123456789abcdef',
        |        substr(md5('rp|' || tj.dim || '|' || ti.i), 1, 1)) - 1)
        |        % 2 = 0
        |      THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(64) ti(i), range(16) tj(dim)),
        |ev AS (
        |  SELECT vec_id, r.i - 1 AS i, v[r.i] AS x
        |  FROM base CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r)
        |SELECT e.vec_id, m.dim,
        |  round(sum(e.x * m.s) * (1.0 / sqrt(16.0)), 4) AS value
        |FROM ev e JOIN mat m ON m.i = e.i
        |GROUP BY 1, 2
        |ORDER BY e.vec_id, m.dim""".stripMargin,
    // Projected re-rank: the X54 projection chain (stage-1 distances
    // from the same ROUNDED projected values, so candidate sets are
    // bit-identical), then exact re-rank on the raw vectors.
    "q_x55_projected_rerank" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |mat AS (
        |  SELECT ti.i, tj.dim,
        |    CASE WHEN (strpos('0123456789abcdef',
        |        substr(md5('rp|' || tj.dim || '|' || ti.i), 1, 1)) - 1)
        |        % 2 = 0
        |      THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(64) ti(i), range(16) tj(dim)),
        |ev AS (
        |  SELECT vec_id, r.i - 1 AS i, v[r.i] AS x
        |  FROM base CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r),
        |sc AS (
        |  SELECT e.vec_id, m.dim,
        |    round(sum(e.x * m.s) * (1.0 / sqrt(16.0)), 4) AS value
        |  FROM ev e JOIN mat m ON m.i = e.i GROUP BY 1, 2),
        |parr AS (
        |  SELECT vec_id, list(value ORDER BY dim) AS pv FROM sc GROUP BY 1),
        |cand AS (
        |  SELECT q.vec_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_distance(q.pv, c.pv), c.vec_id) AS prk
        |  FROM parr q JOIN parr c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 4 = 0
        |    AND NOT isnan(list_distance(q.pv, c.pv))),
        |rr AS (
        |  SELECT t.vec_id, t.neighbor_id, list_distance(a.v, b.v) AS dist
        |  FROM (SELECT vec_id, neighbor_id FROM cand WHERE prk <= 20) t
        |  JOIN base a ON a.vec_id = t.vec_id
        |  JOIN base b ON b.vec_id = t.neighbor_id
        |  WHERE NOT isnan(list_distance(a.v, b.v))),
        |rk AS (
        |  SELECT vec_id, neighbor_id, dist,
        |    CAST(row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
        |  FROM rr)
        |SELECT vec_id, rk, neighbor_id, round(dist, 6) AS distance
        |FROM rk WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin,
    "q_x10_embedding_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |corpus AS (
        |  SELECT vec_id, v, label FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_prepend(v[1] + 0.05, v[2:]) AS v, label
        |  FROM base WHERE vec_id % 10 = 0),
        |nn AS (SELECT vec_id, v, label,
        |  sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
        |  FROM nn a JOIN nn b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, round(cos, 6) AS cosine
        |FROM pairs WHERE cos >= 0.99 ORDER BY vec_a, vec_b""".stripMargin,
    // IVF near-dup ground truth: probe/own assignment as in q_x9b over
    // the planted corpus; both orientations generated, then normalized
    // with least/greatest and deduplicated — the rounded cosine is
    // orientation-independent, so DISTINCT collapses the two rows.
    "q_x136_srp_neardup" -> srpOracle,
    // Same 1e9-scaled element sums, same centroid/dot/L2 trees over
    // quantized-12 scaled LONGs.
    "q_x139_embedding_drift" ->
      """WITH base AS (
        |  SELECT label AS period, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE label < 4),
        |n AS (SELECT period, CAST(count(*) AS BIGINT) AS n
        |      FROM base GROUP BY 1),
        |el AS (SELECT period, i AS pos,
        |    CAST(floor(v[i] * 1000000000.0 + 0.5) AS BIGINT) AS sx
        |  FROM (SELECT period, v,
        |          unnest(range(1, len(v) + 1)) AS i FROM base)),
        |comp AS (SELECT el.period, el.pos,
        |    CAST(CAST(sum(el.sx) AS DOUBLE) / 1000000000.0
        |      / CAST(n.n AS DOUBLE) AS DOUBLE) AS c, n.n
        |  FROM el JOIN n ON n.period = el.period
        |  GROUP BY el.period, el.pos, n.n),
        |pr AS (SELECT a.period AS period_a, b.period AS period_b,
        |    a.n AS n_a, b.n AS n_b,
        |    CAST(sum(CAST(floor(a.c * b.c * 1000000000000.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS dot_s,
        |    CAST(sum(CAST(floor(a.c * a.c * 1000000000000.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS na_s,
        |    CAST(sum(CAST(floor(b.c * b.c * 1000000000000.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS nb_s,
        |    CAST(sum(CAST(floor((a.c - b.c) * (a.c - b.c)
        |      * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS l2_s
        |  FROM comp a JOIN comp b
        |    ON b.pos = a.pos AND a.period < b.period
        |  GROUP BY 1, 2, 3, 4)
        |SELECT period_a, period_b, n_a, n_b,
        |  floor((CAST(dot_s AS DOUBLE) / 1000000000000.0)
        |    / (sqrt(CAST(na_s AS DOUBLE) / 1000000000000.0)
        |      * sqrt(CAST(nb_s AS DOUBLE) / 1000000000000.0))
        |    * 1000000.0 + 0.5) / 1000000.0 AS cosine,
        |  floor(sqrt(CAST(l2_s AS DOUBLE) / 1000000000000.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS l2
        |FROM pr ORDER BY period_a, period_b""".stripMargin,
    "q_x30_ivf_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_prepend(v[1] + 0.05, v[2:]) AS v
        |  FROM base WHERE vec_id % 10 = 0),
        |nn AS (SELECT vec_id, v,
        |  sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |cent AS (
        |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
        |  FROM nn WHERE vec_id % 40 = 0),
        |rnk AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
        |        c.centroid_id) AS rn
        |  FROM nn n, cent c),
        |own AS (SELECT vec_id, v, nrm, centroid_id FROM rnk WHERE rn = 1),
        |probe AS (SELECT vec_id, v, nrm, centroid_id FROM rnk WHERE rn <= 2),
        |pairs AS (
        |  SELECT DISTINCT
        |    least(a.vec_id, b.vec_id) AS vec_a,
        |    greatest(a.vec_id, b.vec_id) AS vec_b,
        |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
        |  FROM probe a JOIN own b
        |    ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
        |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.99)
        |SELECT vec_a, vec_b, cosine FROM pairs
        |ORDER BY vec_a, vec_b""".stripMargin,
    // SemDeDup ground truth: single-cluster assignment exactly as the
    // Spark argmax (cos desc — NaN sorts greatest in both engines —
    // then centroid id), dup evidence = lowest-id earlier cluster-mate
    // at cosine >= τ, NaN cosines excluded.
    "q_x44_semdedup" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_prepend(v[1] + 0.05, v[2:]) AS v
        |  FROM base WHERE vec_id % 10 = 0),
        |nn AS (SELECT vec_id, v,
        |  sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |cent AS (
        |  SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
        |  FROM nn WHERE vec_id % 40 = 0),
        |rnk AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
        |        c.centroid_id) AS rn
        |  FROM nn n, cent c),
        |own AS (SELECT vec_id, v, nrm, centroid_id FROM rnk WHERE rn = 1),
        |pairs AS (
        |  SELECT b.vec_id, a.vec_id AS dup_of,
        |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine,
        |    row_number() OVER (PARTITION BY b.vec_id
        |      ORDER BY a.vec_id) AS rn
        |  FROM own a JOIN own b
        |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        |  WHERE NOT isnan(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))
        |    AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.99),
        |ev AS (SELECT vec_id, dup_of, cosine FROM pairs WHERE rn = 1)
        |SELECT o.vec_id, o.centroid_id, e.dup_of, e.cosine,
        |  e.dup_of IS NULL AS keep
        |FROM own o LEFT JOIN ev e USING (vec_id)
        |ORDER BY o.vec_id""".stripMargin)
}
