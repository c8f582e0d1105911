package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval (Robertson & Zaragoza 2009, public
  * knowledge) — the ranking function behind targeted training-data
  * selection and retrieval-based decontamination: score every corpus
  * document against a query set, keep the top-k per query. The
  * reference has no retrieval operator; north-star surface.
  *
  * The "inverted index" is relational: the per-(doc, token) term
  * frequency table IS the postings list, partitioned by token — a query
  * probes it with a broadcast semi-join instead of a data structure, so
  * the same plan serves one query or a million (queries just stop being
  * the broadcast side).
  */
object Retrieval {

  /** Lucene-flavoured BM25 (the `+1` inside the log keeps IDF positive
    * for terms in over half the corpus). Repeated query terms count
    * once — queries are term SETS, the standard web-query treatment.
    *
    * Plan shape, bottom-up: one explode + map-side-combined aggregate
    * builds tf(doc, tok); doc lengths reduce from tf (no second corpus
    * pass); document frequency reduces from tf per token; corpus size N
    * and avgdl are one scalar row cross-joined broadcast. Query terms
    * broadcast-semi-join tf on token — the corpus is scanned once and
    * only postings for query terms survive. Scores sum per (query, doc),
    * then a per-query top-k window. Scores are ROUNDED to 4 decimals
    * before ranking so the (score desc, doc_id asc) tie-break is
    * identical across engines (1-ulp `ln` differences cannot reorder).
    *
    * At 100 TB: every aggregate is key-hashed and combinable; the only
    * per-query sort is over rows that matched a query term. The top-k
    * window partitions by query — fine for query sets that fit a task;
    * a million-query batch would swap the window for a grouped
    * bounded-heap aggregate, same upstream plan.
    *
    * Output: (query_id, doc_id, rank, score), rank 1..k per query. */
  def bm25TopK(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, queries: Seq[(String, String)], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    require(k >= 1, s"k must be >= 1, got $k")
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, qtext) =>
        qtext.toLowerCase.split("\\s+").toSeq.distinct.map((qid, _)) }
      .toDF("query_id", "tok")
    val tf = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.words(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("__tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("__tf")).as("__dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    val stats = dl.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), "tok")
      .join(dfreq, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * (col("__tf") * (k1 + 1)) /
        (col("__tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("__s")), 4).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** X89: RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher 2009,
    * public knowledge) — the standard hybrid-retrieval combiner:
    * `rrf(d) = Σ_lists 1/(c + rank_list(d))`, here over exactly a
    * LEXICAL ranking (BM25) and a SEMANTIC one (embedding cosine).
    * Rank-based fusion needs no score calibration between the two
    * systems, which is why it wins over score interpolation in
    * practice; `c = 60` is the paper's constant.
    *
    * Engine-exact: each term `1/(c+r)` is one correctly-rounded IEEE
    * division of exact integers, and the two-term sum is a PINNED
    * expression (coalesce(lex,0) + coalesce(sem,0)) — addition of two
    * doubles is commutative and single-rounded, so `rrf_score` is
    * bit-identical cross-engine and the fused ranking cannot flip.
    * (A Seq-of-N generalization would need a canonical summation
    * order to keep this property — two named lists keep it free.)
    *
    * Scale shape: ONE full-outer equi-join on (query, doc) between two
    * already-top-k'd inputs (each bounded by queries×k rows), then the
    * per-query rank window. The heavy lifting — corpus scans, postings,
    * vector scans — happens inside the input rankers; fusion itself is
    * rank-table-sized no matter the corpus.
    *
    * Inputs must carry (query_id, doc_id, rank). Output:
    * (query_id, doc_id, lex_rank, sem_rank, rrf_score, rank). */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, k: Int = 10,
      c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(c >= 0, s"c must be >= 0, got $c")
    val lex = lexical.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("lex_rank"))
    val sem = semantic.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("sem_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("sem_rank")), lit(0.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        col("sem_rank"), col("rrf_score"), col("rank"))
  }

  /** F23: RETRIEVAL RANKING METRICS — precision@k, recall@k,
    * reciprocal rank, DCG@k and NDCG@k per query (standard IR eval,
    * public knowledge) over any ranked result table ([[bm25Search]],
    * [[rrfFuse]], the ANN top-k operators) joined to a relevance
    * label set. The per-query TABLE, not just the means — a mean
    * hides exactly the failing queries an operator tunes on.
    *
    * Exactness: hits, precision, recall and reciprocal rank are exact
    * integer ratios (one correctly-rounded division each — no
    * tolerance); DCG/IDCG/NDCG carry ≤ k-term 1/log2 sums and are
    * rounded to 6 (the D6 convention). IDCG's ideal ranks come from a
    * bounded `sequence(1, min(k, n_rel))` explode — never a
    * cross-join. Queries with no relevant documents get NULL
    * recall/NDCG rather than a division error.
    *
    * Scale: results pre-filtered to rank ≤ k (k-bounded per query),
    * one equi-join to labels, query-keyed aggregates throughout.
    * Output: (query_id, n_rel, hits_at_k, p_at_k, recall_at_k,
    * reciprocal_rank, dcg, ndcg). */
  def retrievalMetrics(results: DataFrame, labels: DataFrame,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = labels.select(col("query_id"), col("doc_id"),
      lit(1).as("__rel"))
    val nrel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val topk = results
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("__r"))
      .filter(col("__r") <= k)
      .join(rel, Seq("query_id", "doc_id"), "left")
    val perQ = topk.groupBy(col("query_id"))
      .agg(
        sum(when(col("__rel").isNotNull, 1L).otherwise(0L))
          .as("hits_at_k"),
        min(when(col("__rel").isNotNull, col("__r"))).as("__minr"),
        sum(when(col("__rel").isNotNull,
          lit(1.0) / log2(col("__r").cast("double") + lit(1.0))))
          .as("__dcg"))
    // The output is driven from the DISTINCT query universe (results ∪
    // labels), not from the top-k side: a query whose every result
    // ranks > k is the worst failure mode and must surface as a
    // zero-metric row, not silently vanish from the table.
    val queries = results.select(col("query_id"))
      .unionByName(labels.select(col("query_id"))).distinct()
    val withN = graft.util.Caches.persistTracked(
      queries.join(perQ, Seq("query_id"), "left")
        .join(nrel, Seq("query_id"), "left")
        .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
        .withColumn("hits_at_k", coalesce(col("hits_at_k"), lit(0L))))
    val idcg = withN.filter(col("n_rel") > 0)
      .select(col("query_id"),
        explode(sequence(lit(1L), least(lit(k.toLong), col("n_rel"))))
          .as("__i"))
      .groupBy(col("query_id"))
      .agg(sum(lit(1.0) / log2(col("__i").cast("double") + lit(1.0)))
        .as("__idcg"))
    withN.join(idcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"), col("hits_at_k"),
        (col("hits_at_k").cast("double") / lit(k.toDouble))
          .as("p_at_k"),
        when(col("n_rel") > 0, col("hits_at_k").cast("double") /
          col("n_rel").cast("double")).as("recall_at_k"),
        coalesce(lit(1.0) / col("__minr").cast("double"), lit(0.0))
          .as("reciprocal_rank"),
        round(coalesce(col("__dcg"), lit(0.0)), 6).as("dcg"),
        round(when(col("__idcg") > 0,
          coalesce(col("__dcg"), lit(0.0)) / col("__idcg")), 6)
          .as("ndcg"))
  }

  /** X152: RANK-BIASED OVERLAP between two rankers (Webber, Moffat &
    * Zobel 2010, public knowledge) — the top-weighted "how differently
    * do these two rankers order results" score an eval harness runs
    * when swapping BM25 for an embedding ranker: truncated
    * `RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d` (prefix overlap
    * at every depth, geometrically discounted so rank 1 dominates).
    *
    * Exactness: prefix overlaps are exact integers (matched ids joined
    * once, counted per depth via a broadcast depth grid — never a
    * per-depth re-scan); each depth term is floor-scaled to a 1e12
    * LONG before the per-query sum (≤ k terms, but engine sum order is
    * still engine's choice — scaled LONGs make it order-free, the F65
    * discipline), one final division, quantized-6. The output is
    * driven from the DISTINCT QUERY SET of both sides (the
    * retrievalMetrics lesson: zero-overlap queries must appear as
    * rbo 0, not vanish). Ranks must be 1-based and unique per query —
    * enforced loud. Output: (query, n_overlap_k, rbo). */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, queryCol: String,
      idCol: String, rankCol: String, k: Int, p: Double = 0.9)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0 && p < 1, s"p must sit in (0,1), got $p")
    val spark = a.sparkSession
    import spark.implicits._
    def side(df: DataFrame, r: String) = {
      val s = df.select(col(queryCol).as("__q"), col(idCol).as("__id"),
        col(rankCol).cast("long").as(r)).filter(col(r) <= k)
      // eager guards, folded into ONE validation aggregate per side
      // (two separate collect()s doubled the operator's job count):
      // ranks must be 1-based and (query, id) unique, or the prefix
      // overlap double-counts silently
      val g = s.groupBy(col("__q"), col("__id"))
        .agg(count(lit(1)).as("__c"),
          sum(when(col(r) < 1, 1L).otherwise(0L)).as("__bad"))
        .agg(coalesce(sum(when(col("__c") > 1, 1L).otherwise(0L)),
            lit(0L)).as("__dups"),
          coalesce(sum(col("__bad")), lit(0L)).as("__bads"))
        .head()
      require(g.getLong(1) == 0, s"rankBiasedOverlap: rank < 1 in input")
      require(g.getLong(0) == 0,
        s"rankBiasedOverlap: duplicate (query, id) in a ranking")
      s
    }
    val sa = side(a, "__ra"); val sb = side(b, "__rb")
    val matched = sa.join(sb, Seq("__q", "__id"))
      .select(col("__q"), greatest(col("__ra"), col("__rb")).as("__d0"))
    val depths = spark.range(1, k + 1).select(col("id").as("__d"))
    // p^(d-1) as a LEFT-FOLDED multiplication chain, not pow(): libm
    // pow is only ~1-ulp accurate and differs across engines; a fixed
    // IEEE multiply chain is bit-identical everywhere
    val pw = when(col("__d") === 1, lit(1.0)).otherwise(
      aggregate(sequence(lit(2), col("__d")), lit(1.0),
        (acc, _) => acc * lit(p)))
    // per (query, depth): overlap = matches whose later rank <= d;
    // term = p^(d-1) * overlap / d, scaled to an order-free LONG
    val perDepth = matched.join(broadcast(depths), col("__d0") <= col("__d"))
      .groupBy(col("__q"), col("__d"))
      .agg(count(lit(1)).as("__ov"))
      .withColumn("__term",
        floor(pw *
          col("__ov").cast("double") / col("__d").cast("double") *
          lit(1e12) + lit(0.5)).cast("long"))
    val queries = sa.select(col("__q")).distinct()
      .unionByName(sb.select(col("__q")).distinct()).distinct()
    val perQuery = perDepth.groupBy(col("__q"))
      .agg(sum(col("__term")).as("__ts"),
        max(when(col("__d") === k, col("__ov"))).as("__ovk"))
    queries.join(perQuery, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        coalesce(col("__ovk"), lit(0L)).as("n_overlap_k"),
        graft.functions.q6(
          lit(1.0 - p) *
            coalesce(col("__ts"), lit(0L)).cast("double") / lit(1e12))
          .as("rbo"))
  }
}
