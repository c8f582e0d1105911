package graft.queries

import graft.Tables.t
import graft.ml.{Labeling, Matching}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Labeling-pipeline coverage (SURVEY §2.15 F63-F66, X144-X145):
  * inter-annotator agreement, consensus aggregation, active-learning
  * acquisition, and the propensity-weighted causal estimators. Raters,
  * class scores, treatments and propensities are synthesized as pure
  * md5/modular functions of the row ids, so the DuckDB oracle rebuilds
  * the identical inputs bit-for-bit (the X12 uniform-hash idiom).
  */
object LabelingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Rater panel: (name, agreement cut in 16ths) — r1 agrees with the
    * true label on ~13/16 of items, r3 on ~10/16. Shared verbatim with
    * the oracle's VALUES list. */
  private val raters = Seq(("r1", 13), ("r2", 12), ("r3", 10))

  /** Synthetic long-form annotations (doc_id, rater, label): each rater
    * reports the document's true `lang` when its (rater, doc) hash digit
    * clears the rater's cut, otherwise a hash-chosen noise label — so
    * agreement is high but imperfect, and per-rater reliability varies. */
  private def annotations(docs: DataFrame): DataFrame =
    raters.map { case (r, cut) =>
      val m = md5(concat_ws(":", lit(r), col("doc_id").cast("string")))
      val agree = conv(substring(m, 1, 1), 16, 10).cast("int") < cut
      val noise = pmod(conv(substring(m, 2, 1), 16, 10).cast("int"), lit(3))
      docs.select(col("doc_id"), lit(r).as("rater"),
        when(agree, col("lang"))
          .otherwise(when(noise === 0, "en").when(noise === 1, "de")
            .otherwise("fr")).as("label"))
    }.reduce(_ unionByName _)

  /** Per-document class-score weights (one hash digit + 1 per class →
    * p = w / (w1 + w2 + w3), an exact small-integer rational): the
    * wide form both engines explode identically. */
  private def classWeight(cl: String): Column =
    conv(substring(md5(concat_ws(":", lit(cl),
      col("doc_id").cast("string"))), 1, 1), 16, 10).cast("double") +
      lit(1.0)

  private def classScores(docs: DataFrame): DataFrame = {
    val wide = docs.select(col("doc_id"),
      classWeight("c1").as("w1"), classWeight("c2").as("w2"),
      classWeight("c3").as("w3"))
    val tot = col("w1") + col("w2") + col("w3")
    wide.select(col("doc_id"), explode(array(
      struct(lit("c1").as("cl"), (col("w1") / tot).as("p")),
      struct(lit("c2").as("cl"), (col("w2") / tot).as("p")),
      struct(lit("c3").as("cl"), (col("w3") / tot).as("p")))).as("s"))
      .select(col("doc_id"), col("s.cl").as("cl"), col("s.p").as("p"))
  }

  /** Treatment/propensity synthesis over orders: e ∈ [5/24, 19/24] from
    * one hash digit, t assigned with P(t=1) ≈ e (confounded by design —
    * the estimator must undo it). */
  private def causalBase(orders: DataFrame): DataFrame = {
    val dE = conv(substring(md5(concat_ws(":", lit("e"),
      col("o_orderkey").cast("string"))), 1, 1), 16, 10).cast("double")
    val e = (dE + lit(4.0)) / lit(24.0)
    val dT = conv(substring(md5(concat_ws(":", lit("t"),
      col("o_orderkey").cast("string"))), 1, 1), 16, 10).cast("double")
    val tr = ((dT + lit(0.5)) / lit(16.0) < e).cast("int")
    orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").as("y"), tr.as("t"), e.as("e"))
  }

  val queries: Map[String, Q] = Map(
    // F63: Cohen's kappa between the two most reliable raters —
    // exact-integer agreement and DECIMAL(38,0) marginal products.
    "q_f63_cohen_kappa" -> { (s, dir) =>
      Labeling.cohenKappa(annotations(t(s, dir, "documents")),
        col("doc_id"), col("rater"), col("label"), "r1", "r2")
    },

    // F64: Fleiss' kappa over the full fixed 3-rater panel.
    "q_f64_fleiss_kappa" -> { (s, dir) =>
      Labeling.fleissKappa(annotations(t(s, dir, "documents")),
        col("doc_id"), col("rater"), col("label"))
    },

    // F70: Krippendorff's alpha over the panel WITH missing votes —
    // each vote survives only when digit 3 of its (rater, doc) hash
    // clears 12/16, so panel sizes vary 0..3 and single-vote units
    // drop by definition (the statistic Fleiss/Cohen cannot compute).
    "q_f70_krippendorff" -> { (s, dir) =>
      val ann = annotations(t(s, dir, "documents"))
      val keep = conv(substring(md5(concat_ws(":", col("rater"),
        col("doc_id").cast("string"))), 3, 1), 16, 10).cast("int") < 12
      Labeling.krippendorffAlpha(ann.filter(keep),
        col("doc_id"), col("rater"), col("label"))
    },

    // X156: the full pairwise kappa matrix over the 3-rater panel in
    // one distributed pass — the "who disagrees with everyone" triage.
    "q_x156_pairwise_kappa" -> { (s, dir) =>
      Labeling.pairwiseKappa(annotations(t(s, dir, "documents")),
        col("doc_id"), col("rater"), col("label"))
        .orderBy(col("rater_a"), col("rater_b"))
    },

    // X153: confident-learning joint over hash-synthesized class
    // probabilities — per-class confidence thresholds, qualified
    // argmax, unconfident rows reported; the (given, suggested)
    // label-noise census.
    "q_x153_confident_joint" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      def w(cl: String): Column = classWeight(cl)
      val tot = w("en") + w("de") + w("fr")
      val long = docs.select(col("doc_id"), col("lang"), explode(array(
          struct(lit("en").as("cl"), (w("en") / tot).as("p")),
          struct(lit("de").as("cl"), (w("de") / tot).as("p")),
          struct(lit("fr").as("cl"), (w("fr") / tot).as("p")))).as("s"))
        .select(col("doc_id"), col("lang"), col("s.cl").as("cl"),
          col("s.p").as("p"))
      Labeling.confidentJoint(long, col("doc_id"), col("lang"),
          col("cl"), col("p"))
        .orderBy(col("given"), col("suggested"))
    },

    // X144: majority-vote consensus with explicit ties (3 raters over
    // ≥3 labels CAN tie 1-1-1) and exact agreement shares.
    "q_x144_majority_vote" -> { (s, dir) =>
      Labeling.majorityVote(annotations(t(s, dir, "documents")),
        col("doc_id"), col("rater"), col("label"))
        .orderBy(col("item"))
    },

    // X145: entropy-acquisition batch — top-40 most-uncertain items,
    // scaled-LONG-exact entropies, id tie-breaks at the k boundary.
    "q_x145_uncertainty_sample" -> { (s, dir) =>
      Labeling.uncertaintySample(classScores(t(s, dir, "documents")),
        col("doc_id"), col("p"), k = 40, method = "entropy")
    },

    // X166: Bradley-Terry preference strengths over per-user event-type
    // "duels" (the type a user fired more often wins the pair) — the
    // exact-integer MM leaderboard; k=5 items, solve k-bounded on the
    // driver, the comparison aggregate distributed.
    "q_x166_bradley_terry" -> { (s, dir) =>
      val counts = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val comps = counts.as("a").join(counts.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.c") =!= col("b.c"))
        .select(
          when(col("a.c") > col("b.c"), col("a.event_type"))
            .otherwise(col("b.event_type")).as("winner"),
          when(col("a.c") > col("b.c"), col("b.event_type"))
            .otherwise(col("a.event_type")).as("loser"))
      graft.ml.Preference.bradleyTerry(comps, col("winner"),
        col("loser"), iterations = 10)
        .orderBy(col("item"))
    },

    // F65: Hájek-stabilized IPW ATE under hash-synthesized confounding.
    "q_f65_ipw_ate" -> { (s, dir) =>
      val base = causalBase(t(s, dir, "orders"))
      Matching.ipwAte(base, col("y"), col("t"), col("e"))
    },

    // F79: positivity/overlap diagnostic over the same propensity —
    // exact per-stratum arm counts, one quantized share, per-bin
    // common-support verdict.
    "q_f79_positivity" -> { (s, dir) =>
      val base = causalBase(t(s, dir, "orders"))
      Matching.positivityReport(base, col("t"), col("e"), bins = 10)
        .orderBy(col("bin"))
    },

    // F66: doubly-robust AIPW ATE with deterministic outcome models
    // (m1 − m0 = 25 exactly — the estimator should land near it even
    // though the propensity confounds the raw means).
    "q_f66_aipw_ate" -> { (s, dir) =>
      val base = causalBase(t(s, dir, "orders"))
        .withColumn("m1",
          lit(125.0) + pmod(col("o_custkey"), lit(1000)).cast("double"))
        .withColumn("m0",
          lit(100.0) + pmod(col("o_custkey"), lit(1000)).cast("double"))
      Matching.aipwAte(base, col("y"), col("t"), col("e"),
        col("m1"), col("m0"))
    })

  /** The shared annotation CTE — the SQL mirror of [[annotations]]. */
  private val annSql: String =
    """rt AS (SELECT * FROM (VALUES ('r1', 13), ('r2', 12), ('r3', 10))
      |    AS v(rater, cut)),
      |ann AS (SELECT d.doc_id, rt.rater,
      |    CASE WHEN strpos('0123456789abcdef',
      |        substr(md5(rt.rater || ':' || CAST(d.doc_id AS VARCHAR)),
      |          1, 1)) - 1 < rt.cut
      |      THEN d.lang
      |      ELSE CASE CAST((strpos('0123456789abcdef',
      |          substr(md5(rt.rater || ':' || CAST(d.doc_id AS VARCHAR)),
      |            2, 1)) - 1) % 3 AS INT)
      |        WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END
      |    END AS label
      |  FROM documents d CROSS JOIN rt)""".stripMargin

  /** The shared class-score CTE — the SQL mirror of [[classScores]]. */
  private val scoreSql: String = {
    def w(cl: String) =
      s"""CAST(strpos('0123456789abcdef',
         |      substr(md5('$cl:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1
         |      AS DOUBLE) + 1.0""".stripMargin
    s"""ws AS (SELECT doc_id,
       |    ${w("c1")} AS w1,
       |    ${w("c2")} AS w2,
       |    ${w("c3")} AS w3
       |  FROM documents),
       |p AS (SELECT doc_id AS item, 'c1' AS cl,
       |    w1 / (w1 + w2 + w3) AS p FROM ws
       |  UNION ALL SELECT doc_id, 'c2', w2 / (w1 + w2 + w3) FROM ws
       |  UNION ALL SELECT doc_id, 'c3', w3 / (w1 + w2 + w3) FROM ws)""".stripMargin
  }

  /** The shared causal-base CTE — the SQL mirror of [[causalBase]]. */
  private val causalSql: String =
    """base AS (SELECT o_orderkey, o_custkey, o_totalprice AS y,
      |    CASE WHEN (CAST(strpos('0123456789abcdef',
      |          substr(md5('t:' || CAST(o_orderkey AS VARCHAR)), 1, 1))
      |          - 1 AS DOUBLE) + 0.5) / 16.0
      |        < (CAST(strpos('0123456789abcdef',
      |          substr(md5('e:' || CAST(o_orderkey AS VARCHAR)), 1, 1))
      |          - 1 AS DOUBLE) + 4.0) / 24.0
      |      THEN 1 ELSE 0 END AS t,
      |    (CAST(strpos('0123456789abcdef',
      |        substr(md5('e:' || CAST(o_orderkey AS VARCHAR)), 1, 1))
      |        - 1 AS DOUBLE) + 4.0) / 24.0 AS e
      |  FROM orders)""".stripMargin

  /** The X166 oracle: the MM iterations UNROLLED as CTE pairs (itK /
    * itKn = raw update + renormalization), generated by the same loop
    * count the Spark kernel runs — every arithmetic step is HUGEINT
    * floor division, so the fixed point is bit-identical. */
  private val bradleyTerryOracle: String = {
    val S2 = "CAST(1000000000000000000 AS HUGEINT)"
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    // step references its predecessor twice (x- and y-side joins) —
    // inlined, the 10-step unroll expands exponentially and re-opens
    // the parquet leaf thousands of times (observed: fd exhaustion)
    val base =
      """WITH cnt AS MATERIALIZED (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cmp AS MATERIALIZED (SELECT
        |    CASE WHEN a.c > b.c THEN a.event_type
        |      ELSE b.event_type END AS w,
        |    CASE WHEN a.c > b.c THEN b.event_type
        |      ELSE a.event_type END AS l
        |  FROM cnt a JOIN cnt b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  WHERE a.c <> b.c),
        |dw AS MATERIALIZED (SELECT w, l, CAST(count(*) AS BIGINT) AS n
        |  FROM cmp GROUP BY 1, 2),
        |pairs AS MATERIALIZED (
        |  SELECT CASE WHEN w < l THEN w ELSE l END AS a,
        |    CASE WHEN w < l THEN l ELSE w END AS b,
        |    CAST(sum(n) AS BIGINT) AS n
        |  FROM dw GROUP BY 1, 2),
        |items AS MATERIALIZED (SELECT DISTINCT w AS item FROM cmp
        |  UNION SELECT DISTINCT l FROM cmp),
        |wins AS MATERIALIZED (SELECT i.item,
        |    CAST(coalesce((SELECT sum(n) FROM dw WHERE dw.w = i.item),
        |      0) AS BIGINT) AS wins,
        |    CAST(coalesce((SELECT sum(n) FROM pairs
        |      WHERE pairs.a = i.item OR pairs.b = i.item), 0)
        |      AS BIGINT) AS n_comparisons
        |  FROM items i),
        |it0n AS MATERIALIZED (SELECT item, wins, n_comparisons,
        |    CAST(1000000000 AS HUGEINT) AS p
        |  FROM wins)""".stripMargin
    val steps = (1 to 10).map { k =>
      val prev = s"it${k - 1}n"
      s"""it$k AS MATERIALIZED (
         |  SELECT w.item, w.wins, w.n_comparisons,
         |    CASE WHEN w.wins = 0 OR d.d IS NULL OR d.d = 0
         |      THEN CAST(0 AS HUGEINT)
         |      ELSE (CAST(w.wins AS HUGEINT) * $S2) // d.d END AS praw
         |  FROM wins w LEFT JOIN (
         |    SELECT q.i, sum((CAST(q.n AS HUGEINT) * $S2)
         |        // (x.p + y.p)) AS d
         |    FROM (SELECT a AS i, b AS j, n FROM pairs
         |      UNION ALL SELECT b, a, n FROM pairs) q
         |    JOIN $prev x ON x.item = q.i
         |    JOIN $prev y ON y.item = q.j
         |    GROUP BY 1) d ON d.i = w.item),
         |it${k}n AS MATERIALIZED (
         |  SELECT item, wins, n_comparisons,
         |    CASE WHEN (SELECT sum(praw) FROM it$k) = 0 THEN praw
         |      ELSE (praw * (SELECT count(*) FROM wins)
         |        * CAST(1000000000 AS HUGEINT))
         |        // (SELECT sum(praw) FROM it$k) END AS p
         |  FROM it$k)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$steps
       |SELECT item, wins, n_comparisons,
       |  CAST(p AS BIGINT) AS strength_scaled,
       |  CAST(CAST(p AS BIGINT) AS DOUBLE) / 1000000000.0 AS strength
       |FROM it10n ORDER BY item""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_x166_bradley_terry" -> bradleyTerryOracle,
    // Positivity: same fixed-width propensity bins (floor(e*10)
    // clamped), exact arm counts, one quantized share, boolean
    // verdict.
    "q_f79_positivity" ->
      s"""WITH $causalSql,
         |b AS (SELECT least(CAST(floor(e * 10) AS BIGINT), 9) AS bin,
         |    t FROM base),
         |g AS (SELECT bin,
         |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_treated,
         |    CAST(sum(CASE WHEN t <> 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_control
         |  FROM b GROUP BY 1)
         |SELECT bin,
         |  floor(CAST(bin AS DOUBLE) / 10 * 1000000.0 + 0.5)
         |    / 1000000.0 AS lo,
         |  floor(CAST(bin + 1 AS DOUBLE) / 10 * 1000000.0 + 0.5)
         |    / 1000000.0 AS hi,
         |  n_treated, n_control,
         |  floor(CAST(n_treated AS DOUBLE)
         |      / CAST(n_treated + n_control AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS share_treated,
         |  n_treated > 0 AND n_control > 0 AS positivity_ok
         |FROM g ORDER BY bin""".stripMargin,
    // Exact BIGINT agreement counts; pe numerator = DECIMAL(38,0) sum
    // of DECIMAL(19,0) marginal products; one fixed IEEE tree each.
    "q_f63_cohen_kappa" ->
      s"""WITH $annSql,
         |pr AS (SELECT a.doc_id, a.label AS la, b.label AS lb
         |  FROM ann a JOIN ann b ON a.doc_id = b.doc_id
         |  WHERE a.rater = 'r1' AND b.rater = 'r2'),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    coalesce(CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END)
         |      AS BIGINT), 0) AS agree FROM pr),
         |ca AS (SELECT la AS l, CAST(count(*) AS BIGINT) AS ca
         |  FROM pr GROUP BY 1),
         |cb AS (SELECT lb AS l, CAST(count(*) AS BIGINT) AS cb
         |  FROM pr GROUP BY 1),
         |s AS (SELECT coalesce(sum(CAST(CAST(ca AS DECIMAL(19,0))
         |      * CAST(cb AS DECIMAL(19,0)) AS DECIMAL(38,0))),
         |    CAST(0 AS DECIMAL(38,0))) AS s
         |  FROM ca JOIN cb USING (l)),
         |d AS (SELECT n, agree,
         |    CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         |      AS pe
         |  FROM tot CROSS JOIN s)
         |SELECT n AS n_items, agree AS n_agree,
         |  CASE WHEN n > 0
         |    THEN floor(po * 1000000.0 + 0.5) / 1000000.0 END AS po,
         |  CASE WHEN n > 0
         |    THEN floor(pe * 1000000.0 + 0.5) / 1000000.0 END AS pe,
         |  CASE WHEN n > 0 AND pe < 1.0
         |    THEN floor((po - pe) / (1.0 - pe) * 1000000.0 + 0.5)
         |      / 1000000.0 END AS kappa
         |FROM d""".stripMargin,

    // S2 = Σ n_ij², Se = Σ (Σ_i n_ij)² as exact DECIMAL sums; fixed
    // P̄ / P̄e / kappa trees with r = 3 folded as a literal.
    "q_f64_fleiss_kappa" ->
      s"""WITH $annSql,
         |cells AS (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS c
         |  FROM ann GROUP BY 1, 2),
         |s2 AS (SELECT sum(CAST(c * c AS DECIMAL(38,0))) AS s2,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM cells),
         |se AS (SELECT sum(CAST(CAST(cj AS DECIMAL(19,0))
         |      * CAST(cj AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS se
         |  FROM (SELECT label, CAST(sum(c) AS BIGINT) AS cj
         |    FROM cells GROUP BY 1)),
         |d AS (SELECT n,
         |    (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * 3.0)
         |      / (CAST(n AS DOUBLE) * 3.0 * (3.0 - 1.0)) AS p_bar,
         |    CAST(se AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * 3.0 * (CAST(n AS DOUBLE) * 3.0))
         |      AS p_e
         |  FROM s2 CROSS JOIN se)
         |SELECT n AS n_items, CAST(3 AS BIGINT) AS n_raters,
         |  floor(p_bar * 1000000.0 + 0.5) / 1000000.0 AS p_bar,
         |  floor(p_e * 1000000.0 + 0.5) / 1000000.0 AS p_e,
         |  CASE WHEN p_e < 1.0
         |    THEN floor((p_bar - p_e) / (1.0 - p_e) * 1000000.0 + 0.5)
         |      / 1000000.0 END AS kappa
         |FROM d""".stripMargin,

    // Same item self-join pair cells, same DECIMAL pe numerators per
    // pair, same fixed IEEE po/pe/kappa trees.
    "q_x156_pairwise_kappa" ->
      s"""WITH $annSql,
         |pr AS (SELECT a.rater AS ra, b.rater AS rb,
         |    a.label AS la, b.label AS lb
         |  FROM ann a JOIN ann b
         |    ON a.doc_id = b.doc_id AND a.rater < b.rater),
         |cells AS (SELECT ra, rb, la, lb,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM pr GROUP BY 1, 2, 3, 4),
         |tot AS (SELECT ra, rb, CAST(sum(c) AS BIGINT) AS n_items,
         |    coalesce(CAST(sum(CASE WHEN la = lb THEN c ELSE 0 END)
         |      AS BIGINT), 0) AS n_agree
         |  FROM cells GROUP BY 1, 2),
         |ca AS (SELECT ra, rb, la AS l, CAST(sum(c) AS BIGINT) AS ca
         |  FROM cells GROUP BY 1, 2, 3),
         |cb AS (SELECT ra, rb, lb AS l, CAST(sum(c) AS BIGINT) AS cb
         |  FROM cells GROUP BY 1, 2, 3),
         |pe AS (SELECT ra, rb,
         |    coalesce(sum(CAST(CAST(ca AS DECIMAL(19,0))
         |      * CAST(cb AS DECIMAL(19,0)) AS DECIMAL(38,0))),
         |      CAST(0 AS DECIMAL(38,0))) AS s
         |  FROM ca JOIN cb USING (ra, rb, l) GROUP BY 1, 2),
         |d AS (SELECT t.ra, t.rb, t.n_items, t.n_agree,
         |    CAST(t.n_agree AS DOUBLE) / CAST(t.n_items AS DOUBLE)
         |      AS po,
         |    CAST(pe.s AS DOUBLE)
         |      / (CAST(t.n_items AS DOUBLE) * CAST(t.n_items AS DOUBLE))
         |      AS pe
         |  FROM tot t JOIN pe USING (ra, rb))
         |SELECT ra AS rater_a, rb AS rater_b, n_items, n_agree,
         |  CASE WHEN n_items > 0
         |    THEN floor(po * 1000000.0 + 0.5) / 1000000.0 END AS po,
         |  CASE WHEN n_items > 0
         |    THEN floor(pe * 1000000.0 + 0.5) / 1000000.0 END AS pe,
         |  CASE WHEN n_items > 0 AND pe < 1.0
         |    THEN floor((po - pe) / (1.0 - pe) * 1000000.0 + 0.5)
         |      / 1000000.0 END AS kappa
         |FROM d ORDER BY rater_a, rater_b""".stripMargin,

    // Same hash-synthesized probabilities, same scaled-LONG threshold
    // means, same qualified argmax with (p desc, class) tie-break.
    "q_x153_confident_joint" -> {
      def w(cl: String) =
        s"""CAST(strpos('0123456789abcdef',
           |      substr(md5('$cl:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1
           |      AS DOUBLE) + 1.0""".stripMargin
      s"""WITH ws AS (SELECT doc_id, lang,
         |    ${w("en")} AS we,
         |    ${w("de")} AS wd,
         |    ${w("fr")} AS wf
         |  FROM documents),
         |p AS (SELECT doc_id, lang, 'en' AS cl,
         |    we / (we + wd + wf) AS p FROM ws
         |  UNION ALL SELECT doc_id, lang, 'de', wd / (we + wd + wf)
         |    FROM ws
         |  UNION ALL SELECT doc_id, lang, 'fr', wf / (we + wd + wf)
         |    FROM ws),
         |pl AS (SELECT *, CAST(floor(p * 1000000000000.0 + 0.5)
         |    AS BIGINT) AS plv FROM p),
         |th AS (SELECT cl AS tc,
         |    CAST(sum(CAST(plv AS DECIMAL(38,0))) AS DOUBLE)
         |      / 1000000000000.0 / CAST(count(*) AS DOUBLE) AS t
         |  FROM pl WHERE lang = cl GROUP BY cl),
         |qual AS (SELECT pl.* FROM pl JOIN th ON pl.cl = th.tc
         |  WHERE pl.p >= th.t),
         |best AS (SELECT doc_id, cl AS sug FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY plv DESC, cl) AS rn FROM qual)
         |  WHERE rn = 1),
         |pe AS (SELECT DISTINCT doc_id, lang FROM p),
         |cells AS (SELECT lang AS given, b.sug AS suggested,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM pe LEFT JOIN best b USING (doc_id) GROUP BY 1, 2),
         |tot AS (SELECT given, CAST(sum(n) AS BIGINT) AS tn
         |  FROM cells GROUP BY 1)
         |SELECT given, suggested, n,
         |  floor(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS frac_of_given
         |FROM cells JOIN tot USING (given)
         |ORDER BY given, suggested NULLS FIRST""".stripMargin
    },

    // Same pairable-unit cells; per-unit disagreement terms floor-scaled
    // to 1e9 and DECIMAL-summed exactly as the Spark side defines them.
    "q_f70_krippendorff" ->
      s"""WITH $annSql,
         |votes AS (SELECT doc_id, label FROM ann
         |  WHERE strpos('0123456789abcdef', substr(md5(rater || ':' ||
         |    CAST(doc_id AS VARCHAR)), 3, 1)) - 1 < 12),
         |cells AS (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS c
         |  FROM votes GROUP BY 1, 2),
         |pu AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS m,
         |    sum(CAST(c * c AS DECIMAL(38,0))) AS s2
         |  FROM cells GROUP BY 1 HAVING CAST(sum(c) AS BIGINT) >= 2),
         |ua AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
         |    coalesce(CAST(sum(m) AS BIGINT), 0) AS n_values,
         |    coalesce(sum(CAST(floor((CAST(m AS DOUBLE)
         |        * CAST(m AS DOUBLE) - CAST(s2 AS DOUBLE))
         |      / (CAST(m AS DOUBLE) - 1.0) * 1000000000.0 + 0.5)
         |      AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS su
         |  FROM pu),
         |la AS (SELECT coalesce(sum(CAST(CAST(nc AS DECIMAL(19,0))
         |      * CAST(nc AS DECIMAL(19,0)) AS DECIMAL(38,0))),
         |    CAST(0 AS DECIMAL(38,0))) AS sc
         |  FROM (SELECT CAST(sum(c) AS BIGINT) AS nc
         |    FROM cells JOIN pu USING (doc_id) GROUP BY cells.label)),
         |d AS (SELECT n_units, n_values,
         |    CAST(su AS DOUBLE) / 1000000000.0
         |      / CAST(n_values AS DOUBLE) AS dobs,
         |    (CAST(n_values AS DOUBLE) * CAST(n_values AS DOUBLE)
         |        - CAST(sc AS DOUBLE))
         |      / (CAST(n_values AS DOUBLE)
         |        * (CAST(n_values AS DOUBLE) - 1.0)) AS dexp
         |  FROM ua CROSS JOIN la)
         |SELECT n_units, n_values,
         |  CASE WHEN n_values >= 2
         |    THEN floor(dobs * 1000000.0 + 0.5) / 1000000.0 END AS d_o,
         |  CASE WHEN n_values >= 2
         |    THEN floor(dexp * 1000000.0 + 0.5) / 1000000.0 END AS d_e,
         |  CASE WHEN n_values >= 2 AND dexp > 0.0
         |    THEN floor((1.0 - dobs / dexp) * 1000000.0 + 0.5) / 1000000.0
         |    END AS alpha
         |FROM d""".stripMargin,

    // Identical cell counts, per-item max window (bounded by the label
    // alphabet), min-label winner, NULL consensus on ties.
    "q_x144_majority_vote" ->
      s"""WITH $annSql,
         |cells AS (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS c
         |  FROM ann GROUP BY 1, 2),
         |m AS (SELECT doc_id, label, c,
         |    max(c) OVER (PARTITION BY doc_id) AS mx FROM cells),
         |g AS (SELECT doc_id AS item, CAST(sum(c) AS BIGINT) AS n_votes,
         |    max(c) AS top_count,
         |    CAST(count(CASE WHEN c = mx THEN 1 END) AS BIGINT) AS nt,
         |    min(CASE WHEN c = mx THEN label END) AS w
         |  FROM m GROUP BY 1)
         |SELECT item, n_votes, top_count,
         |  CASE WHEN nt = 1 THEN w END AS consensus_label,
         |  nt > 1 AS is_tie,
         |  floor(CAST(top_count AS DOUBLE) / CAST(n_votes AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS agreement
         |FROM g ORDER BY item""".stripMargin,

    // Scaled-1e12 LONG entropy terms (order-free sums), exact top/second
    // comparisons, (entropy DESC, item) total order at the k boundary.
    "q_x145_uncertainty_sample" ->
      s"""WITH $scoreSql,
         |q AS (SELECT item, p,
         |    max(p) OVER (PARTITION BY item) AS mx FROM p),
         |u AS (SELECT item,
         |    CAST(sum(CASE WHEN p > 0.0
         |      THEN CAST(floor(-p * ln(p) * 1000000000000.0 + 0.5)
         |        AS BIGINT) ELSE 0 END) AS BIGINT) AS e,
         |    max(p) AS top,
         |    CAST(count(CASE WHEN p = mx THEN 1 END) AS BIGINT) AS ntop,
         |    max(CASE WHEN p < mx THEN p END) AS second
         |  FROM q GROUP BY 1),
         |r AS (SELECT item,
         |    floor(CAST(e AS DOUBLE) / 1000000000000.0 * 1000000.0
         |      + 0.5) / 1000000.0 AS entropy,
         |    floor((CASE WHEN ntop > 1 THEN 0.0
         |      ELSE top - coalesce(second, 0.0) END) * 1000000.0 + 0.5)
         |      / 1000000.0 AS margin
         |  FROM u)
         |SELECT item, entropy, margin,
         |  CAST(row_number() OVER (ORDER BY entropy DESC, item) AS INT)
         |    AS pick_rank
         |FROM r ORDER BY entropy DESC, item LIMIT 40""".stripMargin,

    // Four scaled-1e6 DECIMAL(38,0) weighted sums, two Hájek ratios,
    // one difference — every tree fixed and engine-identical.
    "q_f65_ipw_ate" ->
      s"""WITH $causalSql,
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    coalesce(CAST(sum(t) AS BIGINT), 0) AS n_treated,
         |    sum(CAST(floor(CAST(t AS DOUBLE) * y / e * 1000000.0 + 0.5)
         |      AS DECIMAL(38,0))) AS ny1,
         |    sum(CAST(floor(CAST(t AS DOUBLE) / e * 1000000.0 + 0.5)
         |      AS DECIMAL(38,0))) AS dw1,
         |    sum(CAST(floor((1.0 - CAST(t AS DOUBLE)) * y / (1.0 - e)
         |      * 1000000.0 + 0.5) AS DECIMAL(38,0))) AS ny0,
         |    sum(CAST(floor((1.0 - CAST(t AS DOUBLE)) / (1.0 - e)
         |      * 1000000.0 + 0.5) AS DECIMAL(38,0))) AS dw0
         |  FROM base),
         |d AS (SELECT n, n_treated,
         |    CAST(ny1 AS DOUBLE) / CAST(dw1 AS DOUBLE) AS mu1,
         |    CAST(ny0 AS DOUBLE) / CAST(dw0 AS DOUBLE) AS mu0,
         |    dw1 > 0 AS ok1, dw0 > 0 AS ok0
         |  FROM a)
         |SELECT n, n_treated,
         |  CASE WHEN ok1
         |    THEN floor(mu1 * 1000000.0 + 0.5) / 1000000.0 END
         |    AS mu_treated,
         |  CASE WHEN ok0
         |    THEN floor(mu0 * 1000000.0 + 0.5) / 1000000.0 END
         |    AS mu_control,
         |  CASE WHEN ok1 AND ok0
         |    THEN floor((mu1 - mu0) * 1000000.0 + 0.5) / 1000000.0 END
         |    AS ate_ipw
         |FROM d""".stripMargin,

    // The AIPW influence term per row (fixed IEEE tree), scaled-1e6
    // DECIMAL sum, one division by n.
    "q_f66_aipw_ate" ->
      s"""WITH $causalSql,
         |b AS (SELECT y, t, e,
         |    125.0 + CAST(o_custkey % 1000 AS DOUBLE) AS m1,
         |    100.0 + CAST(o_custkey % 1000 AS DOUBLE) AS m0
         |  FROM base),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    coalesce(CAST(sum(t) AS BIGINT), 0) AS n_treated,
         |    sum(CAST(floor((m1 - m0) * 1000000.0 + 0.5)
         |      AS DECIMAL(38,0))) AS sm,
         |    sum(CAST(floor(((m1 - m0)
         |      + CAST(t AS DOUBLE) * (y - m1) / e
         |      - (1.0 - CAST(t AS DOUBLE)) * (y - m0) / (1.0 - e))
         |      * 1000000.0 + 0.5) AS DECIMAL(38,0))) AS st
         |  FROM b)
         |SELECT n, n_treated,
         |  floor(CAST(sm AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ate_model,
         |  floor(CAST(st AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ate_aipw
         |FROM a""".stripMargin)
}
