package graft.queries

import graft.Tables.t
import graft.dq.Dq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operator coverage (SURVEY.md §2.13 D1-D4). */
object DqQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F33: exact linear-SHAP attribution — per-row contributions
    // w_i * (x_i - mean(x_i)) over a 2-feature chars/tokens model;
    // DECIMAL-exact means, fixed IEEE trees, quantized-6 outputs.
    "q_f33_linear_contrib" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.ml.Scoring.linearContributions(docs,
        Seq("n_chars" -> 0.01, "n_tokens" -> 0.5), bias = 2.0)
        .orderBy(col("doc_id"))
    },

    // F34: weight-of-evidence / information-value table for
    // o_orderpriority against the finished-order label; +0.5 adjusted
    // WOE, IV terms summed as scaled LONGs.
    "q_f34_woe_iv" -> { (s, dir) =>
      graft.ml.FeaturePrep.woeTable(t(s, dir, "orders"),
        col("o_orderpriority"), (col("o_orderstatus") === "F").cast("int"))
        .orderBy(col("value"))
    },

    // F35: mutual information between document language and source —
    // exact BIGINT contingency cells, scaled-LONG entropy/MI sums,
    // normalized MI on every row.
    "q_f35_mutual_info" -> { (s, dir) =>
      graft.ml.Stats.mutualInformation(t(s, dir, "documents"),
        col("lang"), col("source"))
        .orderBy(col("x"), col("y"))
    },

    // D21: Benford first-digit screen over order totals — exact
    // cents-scaled digit extraction (no log10 on doubles), χ² + MAD
    // from scaled-LONG sums.
    "q_d21_benford" -> { (s, dir) =>
      graft.dq.Dq.benfordTest(t(s, dir, "orders"), col("o_totalprice"))
        .orderBy(col("digit"))
    },

    // D22: functional-dependency audit — does custkey determine order
    // priority (it should not), with TANE's g3 deletion count.
    "q_d22_fd_violations" -> { (s, dir) =>
      graft.dq.Dq.fdViolations(t(s, dir, "orders"), Seq("o_custkey"),
        "o_orderpriority")
    },

    // F46: CUPED variance reduction — customer pre-1998 spend as the
    // covariate for post-1998 spend; pooled theta, one moment pass.
    "q_f46_cuped" -> { (s, dir) =>
      val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")
      val per = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(
          coalesce(sum(when(col("o_orderdate") < "1998-01-01",
            col("o_totalprice").cast("decimal(18,6)"))), zero).as("pre"),
          coalesce(sum(when(col("o_orderdate") >= "1998-01-01",
            col("o_totalprice").cast("decimal(18,6)"))), zero).as("post"))
      graft.dq.Stats.cuped(per, pmod(col("o_custkey"), lit(2)),
        col("pre"), col("post"))
    },

    // F45: standard-scaler fit/transform round trip — DECIMAL-exact
    // moments, quantized params folded into literal expressions.
    "q_f45_standard_scaler" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val params = graft.ml.FeaturePrep.standardScalerFit(orders,
        Seq("o_totalprice", "o_custkey"))
      graft.ml.FeaturePrep.standardScalerTransform(orders, params)
        .select(col("o_orderkey"), col("o_totalprice_scaled"),
          col("o_custkey_scaled"))
        .orderBy(col("o_orderkey"))
    },

    // X140: signed feature hashing of three order categoricals into a
    // 32-bucket space — sparse (id, bucket, weight) rows.
    "q_x140_hash_features" -> { (s, dir) =>
      graft.ml.FeaturePrep.hashFeatures(t(s, dir, "orders"),
        "o_orderkey", Seq("o_orderpriority", "o_orderstatus", "o_custkey"),
        dims = 32)
        .orderBy(col("id"), col("bucket"))
    },

    // F43: UCB1 bandit snapshot over event types as arms, conversion
    // (value > 60) as reward — which arm a deterministic-index policy
    // pulls next.
    "q_f43_ucb_allocation" -> { (s, dir) =>
      graft.dq.Stats.ucbSnapshot(
        t(s, dir, "events").filter(col("value").isNotNull),
        col("event_type"), (col("value") > 60).cast("int"))
        .orderBy(col("arm"))
    },

    // F44: difference-in-differences on order totals — odd customers
    // "treated", 1998+ "post"; the quasi-experimental baseline.
    "q_f44_diff_in_diff" -> { (s, dir) =>
      graft.dq.Stats.diffInDiff(t(s, dir, "orders"),
        col("o_custkey") % 2,
        (col("o_orderdate") >= "1998-01-01").cast("int"),
        col("o_totalprice"))
    },

    // D23: exact join-fanout pre-flight for the events-on-user_id
    // self-join — the classic accidental O(n²) explosion, priced
    // before any shuffle is paid. The operator's DECIMAL(38,0)
    // totals are published as BIGINT here: r11's driver hash-red vs
    // a judge zero-cell-diff isolated to the two queries publishing
    // wide DECIMALs (DuckDB's pandas conversion of DECIMAL(38,0) is
    // version-dependent: float64 in 1.0.0); BIGINT renders
    // identically everywhere and is exact at any checkable sf.
    "q_d23_join_fanout" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      graft.dq.Dq.joinFanout(ev, ev, col("user_id"), col("user_id"))
        .withColumn("output_rows", col("output_rows").cast("long"))
        .withColumn("max_rows", col("max_rows").cast("long"))
    },

    // D23 debug variant: every output cell cast to VARCHAR, one row
    // per field — all-string results are immune to ANY engine-side
    // numeric-type rendering, so if the BIGINT form is ever red while
    // this is green the defect is rendering, not values.
    "q_d23_fanout_cells" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val r = graft.dq.Dq.joinFanout(ev, ev, col("user_id"),
        col("user_id"))
      val cols = r.columns
      r.select(explode(array(cols.map(c => struct(lit(c).as("field"),
          col(c).cast("string").as("value"))): _*)).as("kv"))
        .select(col("kv.field").as("field"), col("kv.value").as("value"))
        .orderBy(col("field"))
    },

    // F42: Welch's t between even/odd order totals — exact DECIMAL
    // moment sums, fixed IEEE t and Welch-Satterthwaite dof.
    "q_f42_welch_t" -> { (s, dir) =>
      graft.dq.Stats.welchT(t(s, dir, "orders"),
        col("o_orderkey") % 2, col("o_totalprice"))
    },

    // F81: seeded randomization test on the same arms — exact
    // inference without welch's assumptions; 50 md5-seeded
    // re-assignments in ONE corpus scan, quantized-value integer sums,
    // add-one rational p.
    "q_f81_randomization" -> { (s, dir) =>
      graft.dq.Stats.randomizationTest(t(s, dir, "orders"),
        col("o_orderkey"), (col("o_orderkey") % 2).cast("int"),
        col("o_totalprice"), reps = 50, seed = "rt1")
    },

    // F75: Cohen's d + Hedges' g over the same even/odd order-total
    // arms as f42 — the magnitude the t-test's p-value hides; same
    // exact DECIMAL moment kernel, O(1) outputs inside q6's contract.
    "q_f75_effect_size" -> { (s, dir) =>
      graft.dq.Stats.effectSize(t(s, dir, "orders"),
        col("o_orderkey") % 2, col("o_totalprice"))
    },

    // F80: Spiegelhalter's calibration Z over the same score — the
    // binning-free companion of f74; 1e9-scaled order-free term sums,
    // two pinned divisions + sqrt, q6.
    "q_f80_spiegelhalter" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ml.Eval.spiegelhalterZ(
        docs.select(
          (((col("doc_id") * 37) % 1000).cast("double") / lit(1000.0))
            .as("p"),
          ((col("doc_id") * 53) % 1000 < (col("doc_id") * 37) % 1000)
            .cast("int").as("y")),
        col("p"), col("y"))
    },

    // F74: Hosmer-Lemeshow calibration chi^2 over an exact-rational
    // probability score (p = (id*37%1000)/1000, y ~ Bernoulli(p) by
    // integer comparison) — two-phase ranks, computed ntile, scaled-
    // LONG expected sums, bounded 10-row window for the statistic.
    "q_f74_hosmer" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ml.Eval.hosmerLemeshow(
        docs.select(col("doc_id"),
          (((col("doc_id") * 37) % 1000).cast("double") / lit(1000.0))
            .as("p"),
          ((col("doc_id") * 53) % 1000 < (col("doc_id") * 37) % 1000)
            .cast("int").as("y")),
        col("p"), col("y"), col("doc_id"), buckets = 10)
        .orderBy(col("bucket"))
    },

    // X142: rendezvous (HRW) sharding of documents into 8 shards —
    // the minimal-reshuffle routing a shard split needs at 100 TB.
    "q_x142_rendezvous_shards" -> { (s, dir) =>
      graft.relational.Sharding.shardPlan(t(s, dir, "documents"),
        "doc_id", 8)
        .orderBy(col("shard"))
    },

    // F62: paired t on per-customer pre/post-1998 spend — the
    // between-customer variance cancels in the per-unit differences.
    "q_f62_paired_t" -> { (s, dir) =>
      val per = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(
          sum(when(col("o_orderdate") < "1998-01-01",
            col("o_totalprice").cast("decimal(18,6)"))).as("pre"),
          sum(when(col("o_orderdate") >= "1998-01-01",
            col("o_totalprice").cast("decimal(18,6)"))).as("post"))
      graft.dq.Stats.pairedT(per, col("pre"), col("post"))
    },

    // X143: Heaps'-law vocabulary growth fit over documents in id
    // order — two-phase rank+vocab prefix, quantized log-log OLS.
    "q_x143_heaps_law" -> { (s, dir) =>
      graft.text.TextStats.heapsLawFit(t(s, dir, "documents"),
        "doc_id", "text")
    },

    // F61: Wilson score intervals for the >60-value conversion rate
    // per event type — the small-n-safe binomial CI.
    "q_f61_wilson_ci" -> { (s, dir) =>
      graft.dq.Stats.wilsonCi(
        t(s, dir, "events").filter(col("value").isNotNull),
        Seq("event_type"), (col("value") > 60).cast("int"))
        .orderBy(col("event_type"))
    },

    // F59: TOST equivalence — are even/odd-key order totals equivalent
    // within +-2000? The burden-inverted test a flat A/B needs.
    "q_f59_tost" -> { (s, dir) =>
      graft.dq.Stats.tostEquivalence(t(s, dir, "orders"),
        col("o_orderkey") % 2, col("o_totalprice"), delta = 2000.0)
    },

    // F60: minimum-detectable-effect pre-flight per event type —
    // even/odd users as arms, conversion = value > 60.
    "q_f60_mde" -> { (s, dir) =>
      graft.dq.Stats.mdeTable(
        t(s, dir, "events").filter(col("user_id").isNotNull &&
          col("value").isNotNull),
        Seq("event_type"), pmod(col("user_id"), lit(2)),
        (col("value") > 60).cast("int"))
        .orderBy(col("event_type"))
    },

    // E34: cross-correlation of daily purchase vs error value at lags
    // -7..7 — the lead/lag detector over calendar-bounded grids.
    "q_e34_cross_correlation" -> { (s, dir) =>
      graft.events.Resample.crossCorrelation(t(s, dir, "events"),
        col("ts"),
        when(col("event_type") === "purchase", col("value")),
        when(col("event_type") === "error", col("value")), maxLag = 7)
        .orderBy(col("lag"))
    },

    // F56: Cochran-Armitage trend — is the finished-order rate
    // monotone in the priority digit? Exact integer score sums.
    "q_f56_cochran_armitage" -> { (s, dir) =>
      graft.dq.Stats.cochranArmitage(t(s, dir, "orders"),
        substring(col("o_orderpriority"), 1, 1).cast("long"),
        (col("o_orderstatus") === "F").cast("int"))
    },

    // F57: empirical-Bayes beta-binomial shrinkage of per-customer
    // finished-order rates — MoM prior from scaled-LONG rate moments.
    "q_f57_eb_shrinkage" -> { (s, dir) =>
      graft.dq.Stats.ebShrinkRates(t(s, dir, "orders"),
        col("o_custkey"), (col("o_orderstatus") === "F").cast("int"))
        .orderBy(col("g"))
    },

    // F58: Murphy Brier decomposition of a normalized-balance "score"
    // for the BUILDING segment — reliability/resolution/uncertainty
    // plus the honest discretization residual.
    "q_f58_brier_decomp" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val stats = cust.agg(min(col("c_acctbal")).as("__mn"),
        max(col("c_acctbal")).as("__mx"))
      val scored = cust.crossJoin(broadcast(stats))
        .select(((col("c_acctbal") - col("__mn")) /
          (col("__mx") - col("__mn"))).as("score"),
          (col("c_mktsegment") === "BUILDING").as("ok"))
      graft.ml.Eval.brierDecomposition(s, scored, "score", "ok", 10)
    },

    // F54: Cochran-Mantel-Haenszel stratified 2x2 test — pooled
    // evidence across event-type strata without pooling counts (the
    // Simpson's-paradox-safe A/B readout), plus the MH odds ratio.
    "q_f54_cmh" -> { (s, dir) =>
      graft.dq.Stats.cmhTest(
        t(s, dir, "events").filter(col("user_id").isNotNull &&
          col("value").isNotNull),
        Seq("event_type"), pmod(col("user_id"), lit(2)),
        (col("value") > 60).cast("int"))
    },

    // F86: Cochran-Armitage dose-response trend — is the high-value
    // order rate monotone in the customer-key exposure tier (declared
    // ordered levels 0..3)? Exact integer A/B, one IEEE z tree.
    "q_f86_cochran_armitage" -> { (s, dir) =>
      graft.dq.Stats.cochranArmitage(t(s, dir, "orders"),
        pmod(col("o_custkey"), lit(4)),
        (col("o_totalprice") > 150000).cast("long"),
        Seq(0L, 1L, 2L, 3L))
    },

    // F55: Theil-Sen robust slope of retail price on size per brand —
    // median of pairwise slopes, loud all-pairs cap.
    "q_f55_theil_sen" -> { (s, dir) =>
      graft.ml.Stats.theilSen(t(s, dir, "part"), col("p_brand"),
        col("p_size"), col("p_retailprice"))
        // references the fit outputs so a count()-shaped consumer
        // (the bench) cannot join-eliminate the estimator work
        .filter(length(concat_ws(",", col("slope"),
          col("intercept"))) >= 0)
        .orderBy(col("g"))
    },

    // X141: size-aware compaction planner — documents as "files"
    // (n_chars bytes), contiguous 4 KiB bins from two-phase prefix
    // sums and exact integer division.
    "q_x141_compaction_plan" -> { (s, dir) =>
      graft.relational.Compaction.compactionPlan(
        t(s, dir, "documents"), "doc_id", col("n_chars"), 4096L)
        .orderBy(col("bin"))
    },

    // F53: one-way ANOVA of order totals across the five priorities —
    // exact per-group moments, ordered k-row SSB/SSW cumulation.
    "q_f53_anova" -> { (s, dir) =>
      graft.dq.Stats.oneWayAnova(t(s, dir, "orders"),
        col("o_orderpriority"), col("o_totalprice"))
    },

    // F52: always-valid mSPRT p per event type — even/odd users as
    // arms, conversion = value > 60; peek-safe sequential testing.
    "q_f52_msprt" -> { (s, dir) =>
      graft.dq.Stats.msprt(
        t(s, dir, "events").filter(col("user_id").isNotNull &&
          col("value").isNotNull),
        Seq("event_type"), pmod(col("user_id"), lit(2)),
        (col("value") > 60).cast("int"))
        .orderBy(col("event_type"))
    },

    // F51: caliper propensity matching — BUILDING customers matched
    // to the nearest non-BUILDING control on normalized account
    // balance (caliper 0.02); outcome = total order spend.
    "q_f51_caliper_match" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("__sp"))
      val stats = cust.agg(min(col("c_acctbal")).as("__mn"),
        max(col("c_acctbal")).as("__mx"))
      val base = cust
        .join(spend, cust("c_custkey") === spend("o_custkey"), "left")
        .crossJoin(broadcast(stats))
        .select(col("c_custkey").as("id"),
          ((col("c_acctbal") - col("__mn")) /
            (col("__mx") - col("__mn"))).as("score"),
          coalesce(col("__sp"),
            lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"))
            .cast("double").as("y"),
          (col("c_mktsegment") === "BUILDING").as("__t"))
      graft.ml.Matching.caliperMatch(
        base.filter(col("__t")).select("id", "score", "y"),
        base.filter(!col("__t")).select("id", "score", "y"), 0.02)
        .orderBy(col("t_id"))
    },

    // F47: Spearman rank correlation per return flag between quantity
    // and extended price — distinct-cell grid ranks, exact DECIMAL
    // moments, one fixed IEEE rho tree.
    "q_f47_spearman" -> { (s, dir) =>
      graft.ml.RankTests.spearman(t(s, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("g"))
    },

    // F48: Kruskal-Wallis rank ANOVA of quantity across return flags —
    // two-phase pooled midranks, floor-scaled per-group terms.
    "q_f48_kruskal_wallis" -> { (s, dir) =>
      graft.ml.RankTests.kruskalWallis(t(s, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"))
    },

    // F49: Mann-Whitney U between high (1-2) and low (3-5) order
    // priorities over order totals — tie-corrected z + A&S p.
    "q_f49_mann_whitney" -> { (s, dir) =>
      graft.ml.RankTests.mannWhitney(t(s, dir, "orders"),
        (col("o_orderpriority") < "3").cast("int"), col("o_totalprice"))
    },

    // F82: Friedman repeated-measures rank test — the five event types
    // measured on the SAME users (exact micro-LONG per-cell sums;
    // only complete blocks enter, per the operator's fail-loud
    // contract). Within-block doubled midranks, exact DECIMAL
    // statistic, one IEEE division.
    "q_f82_friedman" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
      val cells = ev.groupBy(col("user_id").as("b"),
          col("event_type").as("tr"))
        .agg(sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
          .as("v"))
      val full = cells.groupBy(col("b")).agg(count(lit(1)).as("__nt"))
        .filter(col("__nt") === 5).select(col("b"))
      graft.ml.RankTests.friedman(cells.join(full, Seq("b")),
        col("b"), col("tr"), col("v"))
    },

    // F83: Kendall tau-b per return flag between quantity and discount
    // — distinct-cell pair join (50x11 grid, never row pairs), exact
    // integer C-D and tie terms.
    "q_f83_kendall_tau" -> { (s, dir) =>
      graft.ml.RankTests.kendallTau(t(s, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), col("l_discount"))
        .orderBy(col("g"))
    },

    // D28: Brown-Forsythe spread-equality test of extended price
    // across return flags — lower-median centering on the DECIMAL
    // grid, then the F53 ANOVA kernel on |x - med| verbatim.
    "q_d28_brown_forsythe" -> { (s, dir) =>
      graft.dq.Stats.brownForsythe(t(s, dir, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"))
    },

    // D29: two-sample Anderson-Darling drift between view and purchase
    // event values — the tail-weighted member of the drift family;
    // doubled-midrank exact integers, per-term 1e9 floor-scale.
    "q_d29_anderson_darling" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      graft.dq.Dq.andersonDarlingDrift(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), "value")
    },

    // F40: chi-square independence + Cramér's V between language and
    // source — the bounded companion of q_f35's mutual information.
    "q_f40_cramers_v" -> { (s, dir) =>
      graft.ml.Stats.cramersV(t(s, dir, "documents"),
        col("lang"), col("source"))
    },

    // F84: Holm step-down over the SAME (event_type, hour) grid as
    // q_f38 — the FWER decision next to BH's FDR one; exact integer
    // p*(m-r+1) <= alpha compares.
    "q_f84_holm" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .withColumn("hr", hour(col("ts")).cast("long"))
      graft.dq.Stats.holmBonferroni(ev, Seq("event_type", "hr"),
        pmod(col("user_id"), lit(2)), (col("value") > 60).cast("int"))
        .orderBy(col("rank"))
    },

    // F85: Benjamini-Yekutieli over the same grid — BH's line divided
    // by the harmonic c(m): FDR under arbitrary dependence.
    "q_f85_by_fdr" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .withColumn("hr", hour(col("ts")).cast("long"))
      graft.dq.Stats.byFdr(ev, Seq("event_type", "hr"),
        pmod(col("user_id"), lit(2)), (col("value") > 60).cast("int"))
        .orderBy(col("rank"))
    },

    // D30: categorical drift scorecard between two document sources'
    // language mixes — exact-integer TVD, windowed Hellinger/JSD.
    "q_d30_categorical_drift" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.dq.Dq.categoricalDrift(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") === "src1"), "lang")
    },

    // F38: BH false-discovery control across the 5x24 (event_type,
    // hour) A/B grid — hash-derived variant, exact integer step-up.
    "q_f38_bh_fdr" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .withColumn("hr", hour(col("ts")).cast("long"))
      graft.dq.Stats.bhFdr(ev, Seq("event_type", "hr"),
        pmod(col("user_id"), lit(2)), (col("value") > 60).cast("int"))
        .orderBy(col("rank"))
    },

    // F37: isotonic (PAV) calibration of n_chars as an English-ness
    // score — distributed via the minimax closed form over 20 exact
    // buckets; fitted must be monotone.
    "q_f37_isotonic" -> { (s, dir) =>
      graft.ml.Eval.isotonicCalibration(t(s, dir, "documents"),
        col("n_chars"), (col("lang") === "en").cast("int"), nBuckets = 20)
        .orderBy(col("bucket"))
    },

    // F36: full confusion scorecard for the chars>=300 -> English
    // rule: exact counts, MCC with double-first factors, Cohen's κ.
    "q_f36_confusion" -> { (s, dir) =>
      graft.ml.Eval.confusionSuite(t(s, dir, "documents"),
        col("n_chars") >= 300, col("lang") === "en")
    },

    // F29: split-conformal prediction intervals — q-hat is the exact
    // integer-rank calibration residual (two-phase ranks, rational
    // ceil), every scored prediction gets [pred - q, pred + q].
    "q_f29_conformal" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("__pred",
          size(split(col("text"), "\\s+")).cast("double") * 6.0)
      graft.ml.Eval.conformalInterval(
        docs.filter(col("doc_id") % 2 === 0), col("__pred"),
        col("n_chars"),
        docs.filter(col("doc_id") % 2 === 1), col("__pred"),
        col("doc_id"), alphaNum = 1, alphaDen = 10)
        .orderBy(col("id"))
    },

    // X126: key-skew report over event user_ids — top-10 hottest keys
    // with shares and the corpus skew factor; the pre-join straggler
    // diagnostic.
    "q_x126_key_skew" -> { (s, dir) =>
      graft.dq.Stats.keySkewReport(t(s, dir, "events"), col("user_id"),
        k = 10)
        .orderBy(col("rank"))
    },

    // D16: partition-gap report — days divisible by 5 are deleted from
    // January's events, and the report must name exactly the missing
    // days inside the surviving span.
    "q_d16_missing_partitions" -> { (s, dir) =>
      graft.dq.Dq.missingPartitions(
        t(s, dir, "events").filter(dayofmonth(col("ts")) % 5 =!= 0),
        col("ts"))
        .withColumn("missing_day",
          date_format(col("missing_day"), "yyyy-MM-dd"))
        .orderBy(col("missing_day"))
    },

    // F30: precision-recall curve + AP over "n_chars predicts English"
    // — one row per distinct score threshold, exact cumulative counts
    // via two-phase prefix sums, AP as a plain aggregate.
    "q_f30_pr_curve" -> { (s, dir) =>
      // the broadcast AP total is an order-sensitive float sum:
      // quantize-6 in the wrapper (the f42/ewma lesson)
      graft.ml.Eval.prCurve(t(s, dir, "documents"), col("n_chars"),
        (col("lang") === "en").cast("int"))
        .withColumn("ap", graft.functions.q6(col("ap")))
        .orderBy(col("score").desc)
    },

    // D17: schema-drift report — orders vs a mutated copy planting all
    // four statuses plus a NULL-rate drift on a kept column.
    "q_d17_schema_drift" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val old = o.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val cur = o.select(col("o_orderkey"),
        col("o_custkey").cast("string").as("o_custkey"),
        when(col("o_orderkey") % 3 =!= 0, col("o_orderstatus"))
          .as("o_orderstatus"),
        lit(1L).as("o_flag"))
      graft.dq.Dq.schemaDrift(old, cur).orderBy(col("column"))
    },

    // D18: key-uniqueness report — l_orderkey alone is NOT unique in
    // lineitem (multi-line orders); exact dup-key census.
    "q_d18_uniqueness" -> { (s, dir) =>
      graft.dq.Dq.uniquenessReport(t(s, dir, "lineitem"),
        Seq("l_orderkey"))
    },

    // F32: regression metrics — the 6-chars-per-token proxy model
    // scored against n_chars: MAE/RMSE/R²/guarded MAPE in one pass.
    "q_f32_regression_metrics" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("__pred",
          size(split(col("text"), "\\s+")).cast("double") * 6.0)
      graft.ml.Eval.regressionMetrics(docs, col("__pred"),
        col("n_chars"))
    },

    // D20: freshness report per event type at an explicit as-of —
    // exact integer lag hours, stale beyond 36h.
    "q_d20_freshness" -> { (s, dir) =>
      graft.dq.Dq.freshnessReport(t(s, dir, "events"),
        col("event_type"), col("ts"), "2024-02-01 00:00:00",
        maxLagHours = 36)
        .withColumn("latest_ts",
          date_format(col("latest_ts"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy(col("group"))
    },

    // F31: deployed operating point — the max-F1 distinct-score row of
    // the n_chars->English curve (tie -> higher threshold).
    "q_f31_operating_point" -> { (s, dir) =>
      graft.ml.Eval.maxF1Point(t(s, dir, "documents"), col("n_chars"),
        (col("lang") === "en").cast("int"))
    },

    // D19: load reconciliation per ship-day — the target copy planted
    // to lose l_orderkey % 97 rows; exact integer tolerance 1/100.
    "q_d19_reconcile" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      graft.dq.Dq.reconcileCounts(li,
        li.filter(col("l_orderkey") % 97 =!= 0),
        to_date(col("l_shipdate")), tolNum = 1, tolDen = 100)
        .orderBy(col("key"))
    },

    // D5: PSI drift between the first and second half of January's
    // event values — reference-decile bins, exact edges, clipped
    // shares; only ln-bearing outputs rounded.
    "q_d5_psi_drift" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Dq.psiDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value", "event_id", bins = 10)
        .orderBy(col("bin"))
    },

    // D6: chi-square categorical drift of the event-type mix between
    // January's halves — add-half smoothing, bit-identical per-category
    // arithmetic, only the total rounded.
    "q_d6_chi2_drift" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Dq.chiSquareDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "event_type")
        .orderBy(col("category"))
    },

    // D7: Kolmogorov-Smirnov drift of event values between January's
    // halves — exact empirical-CDF gap, no rounding anywhere.
    "q_d7_ks_drift" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Dq.ksDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value")
    },

    // D33: per-column null-rate drift significance on the same split —
    // the two-proportion z that makes schemaDrift's delta actionable.
    "q_d33_null_rate_drift" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Dq.nullRateDriftTest(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        Seq("value", "user_id", "event_type"))
    },

    // D31: two-sample Cramér–von Mises on the same split — the
    // integrated-square CDF distance (exact integer l·d² terms on the
    // pooled grid, one final division).
    "q_d31_cramer_von_mises" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Dq.cramerVonMisesDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value")
    },

    // D32: Kuiper V = D+ + D- on the same split — the two-sided
    // max-gap (exact integer maxima, one division — bit-identical
    // cross-engine like KS).
    "q_d32_kuiper" -> { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Dq.kuiperDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value")
    },

    // D8: one-pass column profiling of lineitem — exact counts and
    // distincts, decimal-exact numeric means, string min/max.
    "q_d8_profile" -> { (s, dir) =>
      Dq.profile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_returnflag",
          "l_shipdate"))
        .orderBy(col("column"))
    },

    // D9: one-pass pairwise correlation matrix of the lineitem measures
    // — 6 pairs from a single Aggregate node; the oracle recomputes the
    // same explicit-moment formula so both engines divide the same sums.
    "q_d9_correlation" -> { (s, dir) =>
      graft.dq.Stats.correlationMatrix(t(s, dir, "lineitem"),
          Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
        .orderBy(col("col_x"), col("col_y"))
    },

    // D10: two-proportion A/B z-test — hash-parity assignment on
    // user_id, conversion = any purchase event; exact counts then one
    // fixed IEEE expression tree, identical in both engines.
    "q_d10_ab_test" -> { (s, dir) =>
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 150, 1L).otherwise(0L)).as("converted"))
      graft.dq.Stats.abTest(units, pmod(col("user_id"), lit(2L)),
        col("converted"))
    },

    // D11: declarative check suite over orders — completeness, range,
    // set-membership, regex, SQL predicate and uniqueness verdicts in
    // one aggregate pass (the Between check legitimately fails: 40% of
    // totalprices exceed its bound at threshold 0).
    "q_d11_check_suite" -> { (s, dir) =>
      Dq.checkSuite(t(s, dir, "orders"), Seq(
        Dq.Complete("o_custkey"),
        Dq.Between("o_totalprice", 0, 300000),
        Dq.InSet("o_orderstatus", Seq("F", "O", "P")),
        Dq.MatchesRegex("o_orderpriority", "^[1-5]-"),
        Dq.Satisfies("o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'"),
        Dq.Unique(Seq("o_orderkey"))))
    },

    // F20: Poisson-bootstrap 95% CI for mean per-user purchase value —
    // deterministic md5-uniform weights through the literal inverse
    // Poisson CDF, replica-sized percentile cut.
    "q_f20_bootstrap_ci" -> { (s, dir) =>
      val units = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(sum(col("value")).as("x"))
      val r = graft.dq.Stats.bootstrapMeanCi(units, col("x"),
        col("user_id"))
      // replica means and the point estimate are float sums over
      // engine-ordered rows: quantize-6 in the wrapper
      Seq("point_est", "ci_lo", "ci_hi").foldLeft(r) { (d, c) =>
        d.withColumn(c, graft.functions.q6(col(c)))
      }
    },

    // X111: exact type-1 per-source quantiles of document length —
    // integer rank arithmetic, one group-keyed sort window.
    "q_x111_group_quantiles" -> { (s, dir) =>
      graft.dq.Stats.groupQuantiles(t(s, dir, "documents"),
        "source", col("n_chars"), col("doc_id"))
        .orderBy(col("source"), col("quantile"))
    },

    // F73: DeLong test comparing two synthetic rankers on the same
    // label — integer test scores (ties exercised), exact placement
    // numerators and DECIMAL covariance numerators to one literal
    // division/sqrt tree.
    "q_f73_delong" -> { (s, dir) =>
      val y1 = col("doc_id") % 3 === 0
      val scored = t(s, dir, "documents").select(col("doc_id"),
        when(y1, 1).otherwise(0).as("y"),
        (col("doc_id") * 37 % 1000 +
          when(y1, 200).otherwise(0)).cast("double").as("sa"),
        (col("doc_id") * 53 % 1000 +
          when(y1, 150).otherwise(0)).cast("double").as("sb"))
      graft.ml.Eval.deLongTest(scored, col("doc_id"), col("sa"),
        col("sb"), col("y"))
    },

    // F22: exact ROC AUC of "does document length order English above
    // the rest" — Mann-Whitney rank-sum over distinct-score groups
    // with average-rank ties, two-phase prefix-sum ranks, integer
    // arithmetic to one final division.
    "q_f22_auc" -> { (s, dir) =>
      graft.ml.Eval.rocAuc(t(s, dir, "documents"), col("n_chars"),
        (col("lang") === "en").cast("int"))
    },

    // F77: Cliff's delta of the same length-orders-English comparison
    // — the unfolded dominance difference; exact DECIMAL pair
    // products, ties contribute zero, one raw final division.
    "q_f77_cliffs_delta" -> { (s, dir) =>
      graft.ml.Eval.cliffsDelta(t(s, dir, "documents"), col("n_chars"),
        (col("lang") === "en").cast("int"))
    },

    // D26: 1-Wasserstein drift of n_chars between even/odd doc halves
    // — exact integer CDF-gap mass on the 1e-6 value grid, one final
    // division, q6.
    "q_d26_wasserstein" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.dq.Dq.wassersteinDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "n_chars")
    },

    // D34: Jensen–Shannon overlap divergence of n_chars between the
    // even/odd doc halves — micro-grid counts, ONE fixed IEEE term
    // per distinct value floor-scaled to a 1e12 LONG, exact DECIMAL
    // sum, halved once, published q6.
    "q_d34_jsd" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.dq.Dq.jsdDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "n_chars")
    },

    // D27: QQ drift table of n_chars between the even/odd halves —
    // exact type-1 order statistics per decile on both sides, raw
    // element values, one subtraction.
    "q_d27_qq_drift" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.dq.Dq.qqDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "n_chars", "doc_id")
        .orderBy(col("quantile_idx"))
    },

    // X177: HBOS multivariate outlier screen over (n_chars, n_tokens)
    // — equal-width histograms, exact counts, scaled-LONG ln terms,
    // q6 scores; the linear-time companion of LOF.
    "q_x177_hbos" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.dq.Stats.hbosScores(docs, "doc_id", Seq(
        "chars" -> col("n_chars"),
        "tokens" -> size(graft.text.Dedup.words(col("text")))
          .cast("double")), bins = 10)
        .orderBy(col("doc_id"))
    },

    // X175: seeded-Laplace noisy per-lang counts — the release
    // mechanism demo (deterministic md5 uniform -> inverse CDF; the
    // scaladoc's honest caveat applies); q6 noisy counts.
    "q_x175_noisy_counts" -> { (s, dir) =>
      graft.dq.Dq.noisyCounts(t(s, dir, "documents"), "lang",
        epsilon = 0.5, seed = "rel1")
        .orderBy(col("lang"))
    },

    // F78: Jonckheere-Terpstra ordered trend of n_chars across the
    // doc_id%4 groups — one k-column prefix-sum pass, exact doubled
    // statistic in DECIMAL, q6 z.
    "q_f78_jonckheere" -> { (s, dir) =>
      graft.ml.RankTests.jonckheereTerpstra(t(s, dir, "documents"),
        col("doc_id") % 4, col("n_chars"))
    },

    // F76: Cochran's Q over three deterministic pseudo-classifiers on
    // the same items — exact integer G/L sums in DECIMAL, one raw
    // division, chi2(2dof, 0.05) cut.
    "q_f76_cochran_q" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ml.Eval.cochranQ(docs, Seq(
        (col("doc_id") * 37) % 100 < 70,
        (col("doc_id") * 53) % 100 < 65,
        (col("doc_id") * 71) % 100 < 60), chi2Threshold = 5.991)
    },

    // X117: Gini concentration of characters over documents — the
    // corpus-skew one-number report; DECIMAL(38,0) rank-weight sums,
    // single final division, no rounding.
    "q_x117_gini" -> { (s, dir) =>
      graft.dq.Stats.giniConcentration(t(s, dir, "documents"),
        col("n_chars"))
    },

    // F28: decile lift/gains table — "length predicts English" scored
    // by n_chars desc; exact counts, two-phase ranks, computed ntile,
    // cumulative capture + lift per decile.
    "q_f28_lift_table" -> { (s, dir) =>
      graft.ml.Eval.liftTable(t(s, dir, "documents"), col("n_chars"),
        (col("lang") === "en").cast("int"), col("doc_id"))
        .orderBy(col("bucket"))
    },

    // F67: per-source ROC AUC of the same length-orders-English score —
    // the Simpson-reversal audit; exact grouped rank-sum, group-keyed
    // window, one final division per group.
    "q_f67_group_auc" -> { (s, dir) =>
      graft.ml.Eval.groupedAuc(t(s, dir, "documents"), "source",
        col("n_chars"), (col("lang") === "en").cast("int"))
        .orderBy(col("source"))
    },

    // F68: fairness audit of the "keep long documents" filter across
    // sources — selection-rate parity, disparate-impact ratio,
    // equalized-odds gaps; exact counts, quantized single divisions.
    "q_f68_fairness" -> { (s, dir) =>
      graft.ml.Eval.fairnessReport(t(s, dir, "documents"), "source",
        (col("n_chars") > 500).cast("int"),
        (col("lang") === "en").cast("int"))
        .orderBy(col("group"))
    },

    // F69: split-conformal outlier thresholds over the even-doc
    // calibration half of document lengths — exact k-th order
    // statistics via two-phase prefix sums, per-alpha coverage.
    "q_f69_conformal" -> { (s, dir) =>
      graft.ml.Eval.conformalThresholds(s,
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        col("n_chars"), Seq(0.01, 0.05, 0.1, 0.2))
        .orderBy(col("alpha"))
    },

    // F71: group-conditional (Mondrian) conformal thresholds per
    // source — the per-segment coverage guarantee one marginal cutoff
    // cannot give; small groups surface NULL, not invented cutoffs.
    "q_f71_group_conformal" -> { (s, dir) =>
      graft.ml.Eval.groupedConformalThresholds(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        "source", col("n_chars"), Seq(0.05, 0.1, 0.2))
        .orderBy(col("group"), col("alpha"))
    },

    // X125: split-balance audit — per (split, stratum) counts and the
    // within-split share after the X119 exact split; the governance
    // check that splits preserve the stratum mix.
    "q_x125_split_balance" -> { (s, dir) =>
      val split = graft.curate.Curation.exactStratifiedSplit(
        t(s, dir, "documents"), "doc_id", "source")
      val per = split.groupBy(col("split"), col("stratum"))
        .agg(count(lit(1)).as("n"))
      val tot = split.groupBy(col("split"))
        .agg(count(lit(1)).as("__t"))
      per.join(tot, "split")
        .select(col("split"), col("stratum"), col("n"),
          (col("n").cast("double") / col("__t").cast("double"))
            .as("share"))
        .orderBy(col("split"), col("stratum"))
    },

    // X124: per-source winsorization of document length at the
    // [p10, p90] integer-rank cuts — heavy-tail clamp that keeps
    // every row; exact data-value cuts, exact comparisons.
    "q_x124_winsorize" -> { (s, dir) =>
      graft.dq.Stats.winsorize(t(s, dir, "documents"), "source",
        col("n_chars"), col("doc_id"))
        .orderBy(col("source"), col("id"))
    },

    // D15: ingest-volume anomaly monitor — robust MAD flags over the
    // per-(type, day) event counts (a dead or runaway pipeline day
    // shows up as an outlier); D12 composed over the daily-count table.
    "q_d15_volume_anomaly" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      graft.dq.Stats.madOutliers(daily, "event_type", col("n"),
          col("day"))
        .withColumn("id", date_format(col("id"), "yyyy-MM-dd"))
        .orderBy(col("event_type"), col("id"))
    },

    // D14: k-anonymity risk — quasi-identifier (lang, source) group
    // sizes vs k in {2,5,10}; exact counts, one pass.
    "q_d14_k_anonymity" -> { (s, dir) =>
      graft.dq.Dq.kAnonymityRisk(t(s, dir, "documents"),
        Seq("lang", "source"))
        .orderBy(col("k"))
    },

    // D24: l-diversity — per source group (quasi-identifier), distinct
    // langs (sensitive) vs l in {2,3}; exact counts, one pass.
    "q_d24_l_diversity" -> { (s, dir) =>
      graft.dq.Dq.lDiversity(t(s, dir, "documents"),
        Seq("source"), "lang")
        .orderBy(col("l"))
    },

    // D25: t-closeness of bucketed account balance within
    // (nation, segment) quasi-groups — the ordered-EMD release audit;
    // exact DECIMAL cumulative-gap numerators, one division per group.
    "q_d25_t_closeness" -> { (s, dir) =>
      val c = t(s, dir, "customer").withColumn("bal_bucket",
        expr("(CAST(c_acctbal * 100 AS BIGINT) + 100000) div 200000"))
      graft.dq.Dq.tCloseness(c, Seq("c_nationkey", "c_mktsegment"),
        "bal_bucket", ts = Seq(0.1, 0.2))
        .orderBy(col("t"))
    },

    // D13: referential-integrity sweep — orphan-FK rates for the star
    // relationships in one report; exact counts, one division each.
    "q_d13_referential" -> { (s, dir) =>
      graft.dq.Dq.referentialIntegrity(Seq(
        ("orders.o_custkey->customer", t(s, dir, "orders"),
          "o_custkey", t(s, dir, "customer"), "c_custkey"),
        ("lineitem.l_orderkey->orders", t(s, dir, "lineitem"),
          "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
        ("lineitem.l_partkey->part", t(s, dir, "lineitem"),
          "l_partkey", t(s, dir, "part"), "p_partkey")))
        .orderBy(col("check"))
    },

    // D12: robust MAD outlier flags for document length per source —
    // type-1 medians by integer rank, k = 3 deviations.
    "q_d12_mad_outliers" -> { (s, dir) =>
      graft.dq.Stats.madOutliers(t(s, dir, "documents"), "source",
        col("n_chars"), col("doc_id"))
        .orderBy(col("source"), col("id"))
    },

    // D1: assertion summary — one aggregate pass over lineitem.
    "q_d1_assertion" -> { (s, dir) =>
      val r = Dq.assertion(t(s, dir, "lineitem"),
        "l_discount <= 0.08 AND l_quantity > 0", threshold = 0.25)
      s.range(1).select(
        lit(r.total).as("total"), lit(r.invalid).as("invalid"),
        graft.functions.q6(lit(r.ratio)).as("ratio"),
        lit(r.passed).as("passed"))
    },

    // D2: row diff between a table and a mutated copy.
    "q_d2_diff" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val mutated = orders
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 10)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 17 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      Dq.diff(orders, mutated, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // D4: plan chaining — an assertion's invalid rows feed a summary view.
    "q_d4_plan_view" -> { (s, dir) =>
      val out = Dq.runPlan(s,
        Seq(
          Dq.AssertCmd("lineitem_in", "l_discount <= 0.08", 0.25, "a1"),
          Dq.ViewCmd(
            """SELECT l_returnflag, count(1) AS n_invalid,
              |  round(sum(l_quantity), 2) AS qty
              |FROM a1_invalid GROUP BY l_returnflag""".stripMargin, "v1")),
        Map("lineitem_in" -> t(s, dir, "lineitem")))
      out("v1").orderBy(col("l_returnflag"))
    })

  /** md5-hex digits lo..hi as a base-10 integer — the SQL mirror of
    * Curation.uniformHash's 8-hex-digit prefix. */
  private def hexDigitSum(lo: Int, hi: Int): String = (lo to hi).map(j =>
    s"(strpos('0123456789abcdef', substr(m,$j,1)) - 1) * ${BigInt(16).pow(hi - j)}")
    .mkString(" + ")

  private val poissonW: String =
    """CASE WHEN h < 0.36787944117144233 THEN 0
      |     WHEN h < 0.7357588823428847 THEN 1
      |     WHEN h < 0.9196986029286058 THEN 2
      |     WHEN h < 0.9810118431238462 THEN 3
      |     WHEN h < 0.9963401531726563 THEN 4
      |     ELSE 5 END""".stripMargin

  val oracles: Map[String, String] = Map(
    // Same per-unit DECIMAL sums, same pooled moment pass ((19,6)
    // products), identical theta/lift/variance trees.
    "q_f46_cuped" ->
      """WITH per AS (SELECT o_custkey AS cid,
        |    coalesce(sum(CASE WHEN o_orderdate
        |        < TIMESTAMP '1998-01-01 00:00:00'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END),
        |      CAST(0 AS DECIMAL(18,6))) AS pre,
        |    coalesce(sum(CASE WHEN o_orderdate
        |        >= TIMESTAMP '1998-01-01 00:00:00'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END),
        |      CAST(0 AS DECIMAL(18,6))) AS post
        |  FROM orders GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN cid % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN cid % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CAST(pre AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(post AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(pre AS DECIMAL(19,6))
        |      * CAST(post AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(pre AS DECIMAL(19,6))
        |      * CAST(pre AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(post AS DECIMAL(19,6))
        |      * CAST(post AS DECIMAL(19,6))) AS DOUBLE) AS syy,
        |    CAST(sum(CASE WHEN cid % 2 = 0
        |      THEN CAST(pre AS DECIMAL(18,6)) END) AS DOUBLE) AS sx0,
        |    CAST(sum(CASE WHEN cid % 2 = 1
        |      THEN CAST(pre AS DECIMAL(18,6)) END) AS DOUBLE) AS sx1,
        |    CAST(sum(CASE WHEN cid % 2 = 0
        |      THEN CAST(post AS DECIMAL(18,6)) END) AS DOUBLE) AS sy0,
        |    CAST(sum(CASE WHEN cid % 2 = 1
        |      THEN CAST(post AS DECIMAL(18,6)) END) AS DOUBLE) AS sy1
        |  FROM per),
        |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
        |    CAST(n0 AS DOUBLE) AS nd0, CAST(n1 AS DOUBLE) AS nd1
        |  FROM a),
        |e AS (SELECT *,
        |    sxy - sx * sy / nd AS covn,
        |    sxx - sx * sx / nd AS varxn,
        |    syy - sy * sy / nd AS varyn
        |  FROM d),
        |f AS (SELECT *, covn / varxn AS theta,
        |    sy1 / nd1 - sy0 / nd0 AS lift_raw_r
        |  FROM e)
        |SELECT n, n0, n1,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 AND varxn > 0 THEN
        |    floor(theta * 1000000.0 + 0.5) / 1000000.0 END AS theta,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 THEN
        |    floor(lift_raw_r * 1000000.0 + 0.5) / 1000000.0
        |    END AS lift_raw,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 AND varxn > 0 THEN
        |    floor((lift_raw_r - theta * (sx1 / nd1 - sx0 / nd0))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS lift_cuped,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 THEN
        |    floor(varyn / (nd - 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS var_y,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 AND varxn > 0 THEN
        |    floor((varyn - 2.0 * theta * covn + theta * theta * varxn)
        |      / (nd - 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS var_y_cuped,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 AND varxn > 0
        |      AND varyn > 0 THEN
        |    floor((1.0 - ((varyn - 2.0 * theta * covn
        |        + theta * theta * varxn) / (nd - 1.0))
        |      / (varyn / (nd - 1.0))) * 1000000.0 + 0.5) / 1000000.0
        |    END AS variance_reduction
        |FROM f""".stripMargin,
    // Same DECIMAL moments ((19,6) squares); the transform uses the
    // QUANTIZED params exactly as the fit publishes them.
    "q_f45_standard_scaler" ->
      """WITH m AS (SELECT
        |  CAST(count(o_totalprice) AS BIGINT) AS n1,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS s1,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(19,6))
        |    * CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE) AS q1,
        |  CAST(count(o_custkey) AS BIGINT) AS n2,
        |  CAST(sum(CAST(o_custkey AS DECIMAL(18,6))) AS DOUBLE) AS s2,
        |  CAST(sum(CAST(o_custkey AS DECIMAL(19,6))
        |    * CAST(o_custkey AS DECIMAL(19,6))) AS DOUBLE) AS q2
        |  FROM orders),
        |p AS (SELECT
        |  floor(s1 / CAST(n1 AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS m1,
        |  floor(sqrt((q1 - s1 * s1 / CAST(n1 AS DOUBLE))
        |    / (CAST(n1 AS DOUBLE) - 1.0)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS sd1,
        |  floor(s2 / CAST(n2 AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS m2,
        |  floor(sqrt((q2 - s2 * s2 / CAST(n2 AS DOUBLE))
        |    / (CAST(n2 AS DOUBLE) - 1.0)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS sd2
        |  FROM m)
        |SELECT o.o_orderkey,
        |  floor((CAST(o.o_totalprice AS DOUBLE) - p.m1) / p.sd1
        |    * 1000000.0 + 0.5) / 1000000.0 AS o_totalprice_scaled,
        |  floor((CAST(o.o_custkey AS DOUBLE) - p.m2) / p.sd2
        |    * 1000000.0 + 0.5) / 1000000.0 AS o_custkey_scaled
        |FROM orders o, p ORDER BY o.o_orderkey""".stripMargin,
    // Same md5-over-hashInput buckets/signs (chr(31)/chr(1) are the
    // canonical separator/NULL sentinel), exact integer weights.
    "q_x140_hash_features" ->
      s"""WITH f AS (
         |  SELECT o_orderkey AS id,
         |    md5('o_orderpriority' || chr(31)
         |      || coalesce(CAST(o_orderpriority AS VARCHAR), chr(1)))
         |      AS m
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey,
         |    md5('o_orderstatus' || chr(31)
         |      || coalesce(CAST(o_orderstatus AS VARCHAR), chr(1)))
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey,
         |    md5('o_custkey' || chr(31)
         |      || coalesce(CAST(o_custkey AS VARCHAR), chr(1)))
         |  FROM orders),
         |g AS (SELECT id,
         |    CAST((${hexDigitSum(1, 8)}) % 32 AS BIGINT) AS bucket,
         |    CASE WHEN substr(m, 9, 1) IN
         |      ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS w
         |  FROM f)
         |SELECT id, bucket, CAST(sum(w) AS BIGINT) AS weight
         |FROM g GROUP BY 1, 2 ORDER BY id, bucket""".stripMargin,
    // Same exact counts; identical mean/UCB1 trees; the chosen arm via
    // the same (ucb, arm) descending order.
    "q_f43_ucb_allocation" ->
      """WITH arms AS (
        |  SELECT event_type AS arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value > 60 THEN 1 ELSE 0 END)
        |      AS DECIMAL(18,6)) AS r
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM arms),
        |w AS (SELECT arm, n,
        |    floor(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 AS mean_reward,
        |    floor((CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
        |      + sqrt(2.0 * ln(CAST(tot.nn AS DOUBLE))
        |        / CAST(n AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 AS ucb
        |  FROM arms, tot),
        |b AS (SELECT ucb AS bucb, arm AS barm FROM w
        |      ORDER BY ucb DESC, arm DESC LIMIT 1)
        |SELECT w.arm, w.n, w.mean_reward, w.ucb,
        |  CASE WHEN w.ucb = b.bucb AND w.arm = b.barm
        |    THEN 1 ELSE 0 END AS is_chosen
        |FROM w, b ORDER BY w.arm""".stripMargin,
    // Same DECIMAL cell moments ((19,6) squares — the F42 overflow
    // lesson), identical DiD/SE/z trees, quantized-6.
    "q_f44_diff_in_diff" ->
      """WITH a AS (SELECT
        |  CAST(sum(CASE WHEN o_custkey % 2 = 1
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        |  sum(CASE WHEN o_custkey % 2 = 1
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s_t_pre,
        |  sum(CASE WHEN o_custkey % 2 = 1
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q_t_pre,
        |  CAST(sum(CASE WHEN o_custkey % 2 = 1
        |    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        |  sum(CASE WHEN o_custkey % 2 = 1
        |    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s_t_post,
        |  sum(CASE WHEN o_custkey % 2 = 1
        |    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q_t_post,
        |  CAST(sum(CASE WHEN o_custkey % 2 = 0
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        |  sum(CASE WHEN o_custkey % 2 = 0
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s_c_pre,
        |  sum(CASE WHEN o_custkey % 2 = 0
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q_c_pre,
        |  CAST(sum(CASE WHEN o_custkey % 2 = 0
        |    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        |  sum(CASE WHEN o_custkey % 2 = 0
        |    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s_c_post,
        |  sum(CASE WHEN o_custkey % 2 = 0
        |    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q_c_post
        |  FROM orders),
        |d AS (SELECT *,
        |    CASE WHEN n_t_pre > 0 THEN CAST(s_t_pre AS DOUBLE)
        |      / CAST(n_t_pre AS DOUBLE) END AS m_t_pre,
        |    CASE WHEN n_t_post > 0 THEN CAST(s_t_post AS DOUBLE)
        |      / CAST(n_t_post AS DOUBLE) END AS m_t_post,
        |    CASE WHEN n_c_pre > 0 THEN CAST(s_c_pre AS DOUBLE)
        |      / CAST(n_c_pre AS DOUBLE) END AS m_c_pre,
        |    CASE WHEN n_c_post > 0 THEN CAST(s_c_post AS DOUBLE)
        |      / CAST(n_c_post AS DOUBLE) END AS m_c_post,
        |    CASE WHEN n_t_pre > 1 THEN (CAST(q_t_pre AS DOUBLE)
        |      - CAST(s_t_pre AS DOUBLE) * CAST(s_t_pre AS DOUBLE)
        |        / CAST(n_t_pre AS DOUBLE))
        |      / (CAST(n_t_pre AS DOUBLE) - 1.0) END AS v_t_pre,
        |    CASE WHEN n_t_post > 1 THEN (CAST(q_t_post AS DOUBLE)
        |      - CAST(s_t_post AS DOUBLE) * CAST(s_t_post AS DOUBLE)
        |        / CAST(n_t_post AS DOUBLE))
        |      / (CAST(n_t_post AS DOUBLE) - 1.0) END AS v_t_post,
        |    CASE WHEN n_c_pre > 1 THEN (CAST(q_c_pre AS DOUBLE)
        |      - CAST(s_c_pre AS DOUBLE) * CAST(s_c_pre AS DOUBLE)
        |        / CAST(n_c_pre AS DOUBLE))
        |      / (CAST(n_c_pre AS DOUBLE) - 1.0) END AS v_c_pre,
        |    CASE WHEN n_c_post > 1 THEN (CAST(q_c_post AS DOUBLE)
        |      - CAST(s_c_post AS DOUBLE) * CAST(s_c_post AS DOUBLE)
        |        / CAST(n_c_post AS DOUBLE))
        |      / (CAST(n_c_post AS DOUBLE) - 1.0) END AS v_c_post
        |  FROM a),
        |e AS (SELECT *,
        |    (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did_r,
        |    v_t_post / CAST(n_t_post AS DOUBLE)
        |      + v_t_pre / CAST(n_t_pre AS DOUBLE)
        |      + v_c_post / CAST(n_c_post AS DOUBLE)
        |      + v_c_pre / CAST(n_c_pre AS DOUBLE) AS se2
        |  FROM d)
        |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  floor(m_t_pre * 1000000.0 + 0.5) / 1000000.0 AS mean_t_pre,
        |  floor(m_t_post * 1000000.0 + 0.5) / 1000000.0 AS mean_t_post,
        |  floor(m_c_pre * 1000000.0 + 0.5) / 1000000.0 AS mean_c_pre,
        |  floor(m_c_post * 1000000.0 + 0.5) / 1000000.0 AS mean_c_post,
        |  floor(did_r * 1000000.0 + 0.5) / 1000000.0 AS did,
        |  CASE WHEN se2 > 0 THEN
        |    floor(sqrt(se2) * 1000000.0 + 0.5) / 1000000.0 END AS se,
        |  CASE WHEN se2 > 0 THEN
        |    floor(did_r / sqrt(se2) * 1000000.0 + 0.5) / 1000000.0
        |    END AS z
        |FROM e""".stripMargin,
    // Same per-key counts; products and the total in exact
    // DECIMAL(38,0)/HUGEINT; hottest key via (rows, key) max ordering.
    "q_d23_join_fanout" ->
      """WITH l AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS cl
        |  FROM events GROUP BY 1),
        |r AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS cr
        |  FROM events GROUP BY 1),
        |m AS (SELECT l.key,
        |    CAST(l.cl AS HUGEINT) * CAST(r.cr AS HUGEINT) AS prod
        |  FROM l JOIN r ON r.key = l.key
        |  WHERE l.key IS NOT NULL),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS matched_keys,
        |    CAST(coalesce(sum(prod), 0) AS BIGINT)
        |      AS output_rows
        |  FROM m),
        |mx AS (SELECT key AS max_key,
        |    CAST(prod AS BIGINT) AS max_rows
        |  FROM m ORDER BY prod DESC, key DESC LIMIT 1),
        |sides AS (SELECT CAST(count(*) AS BIGINT) AS left_rows,
        |    CAST(count(*) AS BIGINT) AS right_rows,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS left_null_keys,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS right_null_keys
        |  FROM events)
        |SELECT s.left_rows, s.right_rows, s.left_null_keys,
        |  s.right_null_keys, a.matched_keys, a.output_rows,
        |  mx.max_key, mx.max_rows,
        |  floor(CAST(a.output_rows AS DOUBLE)
        |    / CAST(GREATEST(s.left_rows, s.right_rows) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS amplification
        |FROM sides s, agg a, mx""".stripMargin,
    // d23's report unpivoted to all-VARCHAR (field, value) rows —
    // rendering-proof rendition of the identical values.
    "q_d23_fanout_cells" ->
      """WITH l AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS cl
        |  FROM events GROUP BY 1),
        |r AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS cr
        |  FROM events GROUP BY 1),
        |m AS (SELECT l.key,
        |    CAST(l.cl AS HUGEINT) * CAST(r.cr AS HUGEINT) AS prod
        |  FROM l JOIN r ON r.key = l.key
        |  WHERE l.key IS NOT NULL),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS matched_keys,
        |    CAST(coalesce(sum(prod), 0) AS BIGINT) AS output_rows
        |  FROM m),
        |mx AS (SELECT key AS max_key,
        |    CAST(prod AS BIGINT) AS max_rows
        |  FROM m ORDER BY prod DESC, key DESC LIMIT 1),
        |sides AS (SELECT CAST(count(*) AS BIGINT) AS left_rows,
        |    CAST(count(*) AS BIGINT) AS right_rows,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS left_null_keys,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS right_null_keys
        |  FROM events),
        |rep AS (SELECT s.left_rows, s.right_rows, s.left_null_keys,
        |  s.right_null_keys, a.matched_keys, a.output_rows,
        |  mx.max_key, mx.max_rows,
        |  floor(CAST(a.output_rows AS DOUBLE)
        |    / CAST(GREATEST(s.left_rows, s.right_rows) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS amplification
        |FROM sides s, agg a, mx)
        |SELECT field, value FROM (
        |  SELECT 'left_rows' AS field,
        |    CAST(left_rows AS VARCHAR) AS value FROM rep
        |  UNION ALL SELECT 'right_rows', CAST(right_rows AS VARCHAR)
        |    FROM rep
        |  UNION ALL SELECT 'left_null_keys',
        |    CAST(left_null_keys AS VARCHAR) FROM rep
        |  UNION ALL SELECT 'right_null_keys',
        |    CAST(right_null_keys AS VARCHAR) FROM rep
        |  UNION ALL SELECT 'matched_keys', CAST(matched_keys AS VARCHAR)
        |    FROM rep
        |  UNION ALL SELECT 'output_rows', CAST(output_rows AS VARCHAR)
        |    FROM rep
        |  UNION ALL SELECT 'max_key', max_key FROM rep
        |  UNION ALL SELECT 'max_rows', CAST(max_rows AS VARCHAR)
        |    FROM rep
        |  UNION ALL SELECT 'amplification',
        |    CAST(amplification AS VARCHAR) FROM rep)
        |ORDER BY field""".stripMargin,
    // Same DECIMAL moment sums cast to double once; identical t /
    // Welch-Satterthwaite trees, quantized-6. The squares cast to
    // (19,6): width 18 keeps DuckDB's multiply in int64 and overflows
    // — 19 forces INT128; the exact VALUES equal Spark's (18,6)².
    "q_f42_welch_t" ->
      """WITH a AS (SELECT
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n1,
        |  sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s0,
        |  sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s1,
        |  sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q0,
        |  sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q1
        |  FROM orders),
        |d AS (SELECT n0, n1,
        |    CAST(CAST(s0 AS VARCHAR) AS DOUBLE) AS s0,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(q0 AS VARCHAR) AS DOUBLE) AS q0,
        |    CAST(CAST(q1 AS VARCHAR) AS DOUBLE) AS q1,
        |    CAST(n0 AS DOUBLE) AS dn0, CAST(n1 AS DOUBLE) AS dn1
        |  FROM a),
        |e AS (SELECT *,
        |    CASE WHEN n0 > 0 THEN s0 / dn0 END AS m0,
        |    CASE WHEN n1 > 0 THEN s1 / dn1 END AS m1,
        |    CASE WHEN n0 > 1 THEN (q0 - s0 * s0 / dn0) / (dn0 - 1.0)
        |      END AS v0,
        |    CASE WHEN n1 > 1 THEN (q1 - s1 * s1 / dn1) / (dn1 - 1.0)
        |      END AS v1
        |  FROM d),
        |f AS (SELECT *, v1 / dn1 + v0 / dn0 AS se2 FROM e)
        |SELECT n0, n1,
        |  floor(m0 * 1000000.0 + 0.5) / 1000000.0 AS mean0,
        |  floor(m1 * 1000000.0 + 0.5) / 1000000.0 AS mean1,
        |  floor(v0 * 100.0 + 0.5) / 100.0 AS var0,
        |  floor(v1 * 100.0 + 0.5) / 100.0 AS var1,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0 THEN
        |    floor((m1 - m0) / sqrt(se2) * 1000000.0 + 0.5) / 1000000.0
        |    END AS t,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0 THEN
        |    floor(se2 * se2
        |      / ((v1 / dn1) * (v1 / dn1) / (dn1 - 1.0)
        |        + (v0 / dn0) * (v0 / dn0) / (dn0 - 1.0))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS dof
        |FROM f""".stripMargin,
    // Randomization test: same 1e6-quantized values, same md5 low-bit
    // re-assignment per (seed, rep, id), identical pinned mean-diff
    // trees so every >= comparison agrees; add-one rational p.
    "q_f81_randomization" ->
      """WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |    CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS t,
        |    CAST(floor(CAST(o_totalprice AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS x
        |  FROM orders),
        |obs AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS DOUBLE)
        |      / 1000000.0
        |      / CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    - CAST(sum(CASE WHEN t <> 1 THEN x ELSE 0 END) AS DOUBLE)
        |      / 1000000.0
        |      / CAST(sum(CASE WHEN t <> 1 THEN 1 ELSE 0 END)
        |        AS DOUBLE) AS dobs
        |  FROM base),
        |rp AS (SELECT CAST(unnest(range(0, 50)) AS BIGINT) AS j),
        |draws AS (SELECT r.j,
        |    (strpos('0123456789abcdef', substr(md5('rt|rt1:'
        |      || CAST(r.j AS VARCHAR) || ':' || b.id), 1, 1)) - 1) % 2
        |      AS rt,
        |    b.x
        |  FROM base b CROSS JOIN rp r),
        |pr AS (SELECT j,
        |    CASE WHEN sum(CASE WHEN rt = 1 THEN 1 ELSE 0 END) > 0
        |      AND sum(CASE WHEN rt <> 1 THEN 1 ELSE 0 END) > 0 THEN
        |      CAST(sum(CASE WHEN rt = 1 THEN x ELSE 0 END) AS DOUBLE)
        |        / 1000000.0
        |        / CAST(sum(CASE WHEN rt = 1 THEN 1 ELSE 0 END)
        |          AS DOUBLE)
        |      - CAST(sum(CASE WHEN rt <> 1 THEN x ELSE 0 END)
        |          AS DOUBLE) / 1000000.0
        |        / CAST(sum(CASE WHEN rt <> 1 THEN 1 ELSE 0 END)
        |          AS DOUBLE) END AS dj
        |  FROM draws GROUP BY 1)
        |SELECT obs.n, 50 AS reps,
        |  floor(obs.dobs * 1000000.0 + 0.5) / 1000000.0 AS diff_obs,
        |  CAST(sum(CASE WHEN abs(pr.dj) >= abs(obs.dobs) THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_extreme,
        |  CAST(CAST(sum(CASE WHEN abs(pr.dj) >= abs(obs.dobs) THEN 1
        |    ELSE 0 END) AS BIGINT) + 1 AS DOUBLE) / 51.0 AS p
        |FROM pr CROSS JOIN obs
        |GROUP BY obs.n, obs.dobs""".stripMargin,
    // Same DECIMAL moment CTE as f42 (VARCHAR-routed wide-decimal
    // casts), pooled-variance d and Hedges J to one literal tree.
    "q_f75_effect_size" ->
      """WITH a AS (SELECT
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n1,
        |  sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s0,
        |  sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s1,
        |  sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q0,
        |  sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q1
        |  FROM orders),
        |d AS (SELECT n0, n1,
        |    CAST(CAST(s0 AS VARCHAR) AS DOUBLE) AS s0,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(q0 AS VARCHAR) AS DOUBLE) AS q0,
        |    CAST(CAST(q1 AS VARCHAR) AS DOUBLE) AS q1,
        |    CAST(n0 AS DOUBLE) AS dn0, CAST(n1 AS DOUBLE) AS dn1
        |  FROM a),
        |e AS (SELECT *,
        |    CASE WHEN n0 > 0 THEN s0 / dn0 END AS m0,
        |    CASE WHEN n1 > 0 THEN s1 / dn1 END AS m1,
        |    CASE WHEN n0 > 1 THEN (q0 - s0 * s0 / dn0) / (dn0 - 1.0)
        |      END AS v0,
        |    CASE WHEN n1 > 1 THEN (q1 - s1 * s1 / dn1) / (dn1 - 1.0)
        |      END AS v1
        |  FROM d),
        |f AS (SELECT *,
        |    ((dn0 - 1.0) * v0 + (dn1 - 1.0) * v1) / (dn0 + dn1 - 2.0)
        |      AS pooled
        |  FROM e)
        |SELECT n0, n1,
        |  floor(m0 * 1000000.0 + 0.5) / 1000000.0 AS mean0,
        |  floor(m1 * 1000000.0 + 0.5) / 1000000.0 AS mean1,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND pooled > 0 THEN
        |    floor((m1 - m0) / sqrt(pooled) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS d,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND pooled > 0 THEN
        |    floor((m1 - m0) / sqrt(pooled)
        |      * (1.0 - 3.0 / (4.0 * (dn0 + dn1) - 9.0))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS g
        |FROM f""".stripMargin,
    // Spiegelhalter Z: same p/y, identical 1e9-scaled term trees
    // summed in HUGEINT, same two-division-plus-sqrt publish.
    "q_f80_spiegelhalter" ->
      """WITH s AS (SELECT
        |    CAST((doc_id * 37) % 1000 AS DOUBLE) / 1000.0 AS p,
        |    CASE WHEN (doc_id * 53) % 1000 < (doc_id * 37) % 1000
        |      THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor((CAST(y AS DOUBLE) - p) * (1.0 - 2.0 * p)
        |      * 1000000000.0 + 0.5) AS BIGINT)) AS num,
        |    sum(CAST(floor((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p
        |      * (1.0 - p) * 1000000000.0 + 0.5) AS BIGINT)) AS den
        |  FROM s)
        |SELECT n, CASE WHEN den > 0 THEN
        |    floor((CAST(num AS DOUBLE) / 1000000000.0)
        |      / sqrt(CAST(den AS DOUBLE) / 1000000000.0)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS z
        |FROM t""".stripMargin,
    // Same exact-rational p and integer-comparison label; ntile(10)
    // (the computed-ntile formula IS the SQL standard's), scaled-LONG
    // expected sums, the f15 full-window statistic pattern.
    "q_f74_hosmer" ->
      """WITH s AS (SELECT doc_id,
        |    CAST((doc_id * 37) % 1000 AS DOUBLE) / 1000.0 AS p,
        |    CASE WHEN (doc_id * 53) % 1000 < (doc_id * 37) % 1000
        |      THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |r AS (SELECT *, ntile(10) OVER (ORDER BY p, doc_id) AS bucket
        |  FROM s),
        |b AS (SELECT CAST(bucket AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_obs,
        |    sum(CAST(CAST(floor(p * 1000000000.0 + 0.5) AS BIGINT)
        |      AS HUGEINT)) AS el
        |  FROM r GROUP BY 1),
        |c AS (SELECT *, CAST(el AS DOUBLE) / 1000000000.0 AS e,
        |    CAST(n_obs AS DOUBLE) AS o, CAST(n AS DOUBLE) AS ng
        |  FROM b),
        |d AS (SELECT *, CASE WHEN e > 0 AND e < ng THEN
        |    (o - e) * (o - e) / (e * (1.0 - e / ng)) END AS trm
        |  FROM c)
        |SELECT bucket, n, n_obs,
        |  floor(e * 1000000.0 + 0.5) / 1000000.0 AS expected,
        |  CASE WHEN trm IS NOT NULL THEN
        |    floor(trm * 1000000.0 + 0.5) / 1000000.0 END AS term,
        |  floor(sum(trm) OVER () * 1000000.0 + 0.5) / 1000000.0
        |    AS hl_chi2,
        |  8 AS dof
        |FROM d ORDER BY bucket""".stripMargin,
    // Same seeded md5-uniform weights (hex digits re-derived in SQL);
    // argmax mirrored as row_number over (h DESC, k DESC) — greatest()
    // over (h, k) structs picks the same winner.
    "q_x142_rendezvous_shards" ->
      s"""WITH ks AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS k),
        |hx AS (SELECT doc_id, k,
        |    md5('hrw:' || CAST(doc_id AS VARCHAR) || '#'
        |      || CAST(k AS VARCHAR)) AS m
        |  FROM documents CROSS JOIN ks),
        |hh AS (SELECT doc_id, k,
        |    (${hexDigitSum(1, 8)}) / 4294967296.0 AS h FROM hx),
        |rn AS (SELECT doc_id, k, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY h DESC, k DESC) AS rn FROM hh)
        |SELECT k AS shard, CAST(count(*) AS BIGINT) AS n_rows
        |FROM rn WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    // Exact DECIMAL difference moments ((19,6) square products for the
    // INT128 path); identical t tree; f38's A&S p.
    "q_f62_paired_t" ->
      """WITH per AS (SELECT o_custkey,
        |    sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS pre,
        |    sum(CASE WHEN o_orderdate >= DATE '1998-01-01'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS post
        |  FROM orders GROUP BY 1),
        |dd AS (SELECT CAST(CAST(post AS DECIMAL(18,6))
        |      - CAST(pre AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS d
        |  FROM per WHERE pre IS NOT NULL AND post IS NOT NULL),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    coalesce(sum(d), 0) AS s,
        |    coalesce(sum(CAST(d AS DECIMAL(19,6))
        |      * CAST(d AS DECIMAL(19,6))), 0) AS q
        |  FROM dd),
        |b AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s AS DOUBLE) AS sd, CAST(q AS DOUBLE) AS qd FROM ag),
        |cc AS (SELECT *, sd / nd AS mean,
        |    (qd - sd * sd / nd) / (nd - 1.0) AS var FROM b),
        |ee AS (SELECT *, mean / sqrt(var / nd) AS t FROM cc),
        |pp AS (SELECT *, 2.0
        |    * (exp(-(abs(t) * abs(t)) / 2.0) / 2.5066282746310002)
        |    * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(t)))
        |      + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(t)))
        |      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(t)))
        |      + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(t)))
        |      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(t))))
        |    AS p2 FROM ee)
        |SELECT n,
        |  CASE WHEN n > 0
        |    THEN floor(mean * 1000000.0 + 0.5) / 1000000.0
        |    END AS mean_diff,
        |  CASE WHEN n > 1 AND var > 0
        |    THEN floor(sqrt(var) * 1000000.0 + 0.5) / 1000000.0
        |    END AS sd_diff,
        |  CASE WHEN n > 1 AND var > 0
        |    THEN floor(t * 1000000.0 + 0.5) / 1000000.0 END AS t,
        |  CAST(n - 1 AS BIGINT) AS dof,
        |  CASE WHEN n > 1 AND var > 0
        |    THEN floor(least(p2, 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p
        |FROM pp""".stripMargin,
    // First-doc per token, per-doc new-token counts, running rank/vocab
    // (Spark side: two-phase Ranks), ln values quantized to scaled-1e9
    // BIGINTs, HUGEINT moments, identical OLS trees.
    "q_x143_heaps_law" ->
      """WITH fd AS (SELECT t, min(d) AS fd FROM (
        |    SELECT doc_id AS d,
        |      unnest(string_split_regex(text, '\s+')) AS t
        |    FROM documents) WHERE t <> '' GROUP BY t),
        |npd AS (SELECT fd AS d, CAST(count(*) AS BIGINT) AS newt
        |  FROM fd GROUP BY 1),
        |docs AS (SELECT DISTINCT doc_id AS d FROM documents),
        |curve AS (SELECT docs.d, coalesce(npd.newt, 0) AS newt
        |  FROM docs LEFT JOIN npd ON docs.d = npd.d),
        |pc AS (SELECT d,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rnk,
        |    CAST(sum(newt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS v
        |  FROM curve),
        |pts AS (SELECT
        |    CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS y
        |  FROM pc WHERE v > 0),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy FROM pts),
        |vt AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM fd),
        |f AS (SELECT n_docs, vocab, CAST(n_docs AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / 1000000000.0 AS sxd,
        |    CAST(sy AS DOUBLE) / 1000000000.0 AS syd,
        |    CAST(sxy AS DOUBLE) / 1e18 AS sxyd,
        |    CAST(sxx AS DOUBLE) / 1e18 AS sxxd,
        |    CAST(syy AS DOUBLE) / 1e18 AS syyd
        |  FROM m, vt),
        |g AS (SELECT *, nd * sxyd - sxd * syd AS num,
        |    nd * sxxd - sxd * sxd AS vx,
        |    nd * syyd - syd * syd AS vy FROM f),
        |h AS (SELECT *, num / vx AS beta FROM g)
        |SELECT n_docs, vocab,
        |  CASE WHEN n_docs > 1 AND vx > 0
        |    THEN floor(beta * 1000000.0 + 0.5) / 1000000.0 END AS beta,
        |  CASE WHEN n_docs > 1 AND vx > 0
        |    THEN floor(exp((syd - beta * sxd) / nd) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS k,
        |  CASE WHEN n_docs > 1 AND vx > 0 AND vy > 0
        |    THEN floor(num * num / (vx * vy) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS r2
        |FROM h""".stripMargin,
    // Folded z / z-squared literals (1.9599639845400545 /
    // 3.841458820694127 — the Scala-side z*z double); identical
    // center/margin/denominator trees.
    "q_f61_wilson_ci" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    coalesce(CAST(sum(CASE WHEN value > 60 THEN 1 ELSE 0 END)
        |      AS BIGINT), 0) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
        |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM g),
        |e AS (SELECT *,
        |    1.0 + 3.841458820694127 / nd AS denom,
        |    p + 3.841458820694127 / (2.0 * nd) AS center,
        |    1.9599639845400545 * sqrt(p * (1.0 - p) / nd
        |      + 3.841458820694127 / (4.0 * nd * nd)) AS margin
        |  FROM d)
        |SELECT event_type, n, c,
        |  CASE WHEN n > 0
        |    THEN floor(p * 1000000.0 + 0.5) / 1000000.0 END AS rate,
        |  CASE WHEN n > 0
        |    THEN floor((center - margin) / denom * 1000000.0 + 0.5)
        |      / 1000000.0 END AS ci_lo,
        |  CASE WHEN n > 0
        |    THEN floor((center + margin) / denom * 1000000.0 + 0.5)
        |      / 1000000.0 END AS ci_hi
        |FROM e ORDER BY event_type""".stripMargin,
    // f42's moment CTE; one-sided A&S upper tail reflected for
    // negative z; identical boundary-z and max-p trees.
    "q_f59_tost" ->
      """WITH a AS (SELECT
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n1,
        |  sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s0,
        |  sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS s1,
        |  sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q0,
        |  sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6)) END) AS q1
        |  FROM orders),
        |d AS (SELECT n0, n1,
        |    CAST(CAST(s0 AS VARCHAR) AS DOUBLE) AS s0,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(q0 AS VARCHAR) AS DOUBLE) AS q0,
        |    CAST(CAST(q1 AS VARCHAR) AS DOUBLE) AS q1,
        |    CAST(n0 AS DOUBLE) AS dn0, CAST(n1 AS DOUBLE) AS dn1
        |  FROM a),
        |e AS (SELECT *,
        |    CASE WHEN n0 > 0 THEN s0 / dn0 END AS m0,
        |    CASE WHEN n1 > 0 THEN s1 / dn1 END AS m1,
        |    CASE WHEN n0 > 1 THEN (q0 - s0 * s0 / dn0) / (dn0 - 1.0)
        |      END AS v0,
        |    CASE WHEN n1 > 1 THEN (q1 - s1 * s1 / dn1) / (dn1 - 1.0)
        |      END AS v1
        |  FROM d),
        |f AS (SELECT *, v1 / dn1 + v0 / dn0 AS se2,
        |    m1 - m0 AS diff FROM e),
        |g AS (SELECT *, (diff + 2000.0) / sqrt(se2) AS zlo,
        |    (2000.0 - diff) / sqrt(se2) AS zhi FROM f),
        |h AS (SELECT *,
        |    CASE WHEN zlo >= 0 THEN
        |      (exp(-(abs(zlo) * abs(zlo)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(zlo))))
        |    ELSE 1.0 -
        |      (exp(-(abs(zlo) * abs(zlo)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(zlo)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(zlo))))
        |    END AS plo,
        |    CASE WHEN zhi >= 0 THEN
        |      (exp(-(abs(zhi) * abs(zhi)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(zhi))))
        |    ELSE 1.0 -
        |      (exp(-(abs(zhi) * abs(zhi)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(zhi)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(zhi))))
        |    END AS phi
        |  FROM g)
        |SELECT n0, n1,
        |  floor(m0 * 1000000.0 + 0.5) / 1000000.0 AS mean0,
        |  floor(m1 * 1000000.0 + 0.5) / 1000000.0 AS mean1,
        |  floor(diff * 1000000.0 + 0.5) / 1000000.0 AS diff,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN floor(sqrt(se2) * 1000000.0 + 0.5) / 1000000.0
        |    END AS se,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN floor(zlo * 1000000.0 + 0.5) / 1000000.0 END AS z_lower,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN floor(zhi * 1000000.0 + 0.5) / 1000000.0 END AS z_upper,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN floor(plo * 1000000.0 + 0.5) / 1000000.0 END AS p_lower,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN floor(phi * 1000000.0 + 0.5) / 1000000.0 END AS p_upper,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN floor(greatest(plo, phi) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p_equiv,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
        |    THEN CAST(greatest(plo, phi) < 0.05 AS INTEGER)
        |    END AS equivalent
        |FROM h""".stripMargin,
    // f38's count CTE; the Phi-inverse constants are folded literals
    // (2.801585218112969 = z_alpha/2 + z_beta), identical MDE trees.
    "q_f60_mde" ->
      """WITH g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    coalesce(CAST(sum(CASE WHEN value > 60 THEN 1 ELSE 0 END)
        |      AS BIGINT), 0) AS c
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |d AS (SELECT *,
        |    CAST(c AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS p,
        |    (n0 > 0 AND n1 > 0 AND c > 0 AND c < n0 + n1) AS ok
        |  FROM g),
        |e AS (SELECT *, 2.801585218112969
        |    * sqrt(p * (1.0 - p)
        |      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    AS mde FROM d)
        |SELECT event_type, n0, n1, c,
        |  CASE WHEN ok
        |    THEN floor(p * 1000000.0 + 0.5) / 1000000.0
        |    END AS pooled_rate,
        |  CASE WHEN ok
        |    THEN floor(mde * 1000000.0 + 0.5) / 1000000.0 END AS mde_abs,
        |  CASE WHEN ok
        |    THEN floor(mde / p * 1000000.0 + 0.5) / 1000000.0
        |    END AS mde_rel
        |FROM e ORDER BY event_type""".stripMargin,
    // Calendar-bounded lag grid; DECIMAL daily sums and per-lag
    // moments ((19,6) products force DuckDB's INT128 path); identical
    // per-lag correlation trees.
    "q_e34_cross_correlation" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS x,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'error'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS y
        |  FROM events GROUP BY 1),
        |lags AS (SELECT CAST(unnest(range(-7, 8)) AS INTEGER) AS lag),
        |j AS (SELECT l.lag AS lag, a.x AS x, b.y AS y
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.d = a.d + l.lag),
        |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(x AS DECIMAL(38,12))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,12))) AS sy,
        |    sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |      AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
        |      AS DECIMAL(38,12))) AS sxx,
        |    sum(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |      AS DECIMAL(38,12))) AS syy
        |  FROM j GROUP BY 1),
        |r AS (SELECT lag, n_days, CAST(n_days AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(syy AS DOUBLE) AS syyd
        |  FROM m)
        |SELECT lag, n_days,
        |  CASE WHEN n_days >= 3 AND nd * sxxd - sxd * sxd > 0
        |      AND nd * syyd - syd * syd > 0
        |    THEN floor((nd * sxyd - sxd * syd)
        |      / (sqrt(nd * sxxd - sxd * sxd)
        |        * sqrt(nd * syyd - syd * syd))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS r
        |FROM r ORDER BY lag""".stripMargin,
    // Exact HUGEINT score sums (≡ Spark DECIMAL(38,0)); identical
    // T/Var/z trees from the double-cast operands; f38's A&S p.
    "q_f56_cochran_armitage" ->
      """WITH pg AS (SELECT
        |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |    CAST(count(*) AS BIGINT) AS n_g,
        |    coalesce(CAST(sum(CASE WHEN o_orderstatus = 'F'
        |      THEN 1 ELSE 0 END) AS BIGINT), 0) AS c_g
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    coalesce(CAST(sum(c_g) AS BIGINT), 0) AS c,
        |    sum(CAST(w AS HUGEINT) * n_g) AS wn,
        |    sum(CAST(w AS HUGEINT) * w * n_g) AS wwn,
        |    sum(CAST(w AS HUGEINT) * c_g) AS wc FROM pg),
        |b AS (SELECT n, k, c, CAST(n AS DOUBLE) AS nd,
        |    CAST(c AS DOUBLE) AS cd, CAST(wn AS DOUBLE) AS wnd,
        |    CAST(wwn AS DOUBLE) AS wwnd, CAST(wc AS DOUBLE) AS wcd
        |  FROM a),
        |d AS (SELECT *, wcd - wnd * (cd / nd) AS t,
        |    (cd / nd) * (1.0 - cd / nd)
        |      * (wwnd - wnd * wnd / nd) AS vart
        |  FROM b),
        |e AS (SELECT *, t / sqrt(vart) AS z FROM d),
        |f AS (SELECT *, 2.0
        |    * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |    * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |    AS p2 FROM e)
        |SELECT n, k,
        |  CASE WHEN c > 0 AND c < n
        |    THEN floor(t * 1000000.0 + 0.5) / 1000000.0 END AS t_stat,
        |  CASE WHEN c > 0 AND c < n
        |    THEN floor(vart * 1000000.0 + 0.5) / 1000000.0 END AS var_t,
        |  CASE WHEN c > 0 AND c < n AND vart > 0
        |    THEN floor(z * 1000000.0 + 0.5) / 1000000.0 END AS z,
        |  CASE WHEN c > 0 AND c < n AND vart > 0
        |    THEN floor(least(p2, 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p
        |FROM f""".stripMargin,
    // Rates quantized to scaled-1e9 BIGINTs, HUGEINT moment sums
    // (order-free at any group count); identical MoM prior and
    // shrinkage trees; degenerate prior falls back to the raw rate.
    "q_f57_eb_shrinkage" ->
      """WITH pg AS (SELECT o_custkey AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    coalesce(CAST(sum(CASE WHEN o_orderstatus = 'F'
        |      THEN 1 ELSE 0 END) AS BIGINT), 0) AS c
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT *, CAST(floor(CAST(c AS DOUBLE)
        |    / CAST(n AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)
        |    AS rl FROM pg),
        |pr AS (SELECT CAST(count(*) AS BIGINT) AS kk,
        |    sum(CAST(rl AS HUGEINT)) AS s,
        |    sum(CAST(rl AS HUGEINT) * rl) AS q FROM sc),
        |pm AS (SELECT kk, CAST(kk AS DOUBLE) AS kd,
        |    CAST(s AS DOUBLE) / 1000000000.0 / CAST(kk AS DOUBLE) AS m,
        |    (CAST(q AS DOUBLE) / 1e18
        |      - (CAST(s AS DOUBLE) / 1000000000.0)
        |        * (CAST(s AS DOUBLE) / 1000000000.0)
        |        / CAST(kk AS DOUBLE)) / CAST(kk AS DOUBLE) AS v
        |  FROM pr),
        |ab AS (SELECT *, m * (1.0 - m) / v - 1.0 AS t FROM pm),
        |prior AS (SELECT
        |    CASE WHEN kk > 1 AND v > 0 AND t > 0 THEN m * t END
        |      AS alpha,
        |    CASE WHEN kk > 1 AND v > 0 AND t > 0 THEN (1.0 - m) * t END
        |      AS beta
        |  FROM ab)
        |SELECT g, n, c,
        |  floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0
        |    + 0.5) / 1000000.0 AS rate,
        |  floor(alpha * 1000000.0 + 0.5) / 1000000.0 AS alpha,
        |  floor(beta * 1000000.0 + 0.5) / 1000000.0 AS beta,
        |  CASE WHEN alpha IS NOT NULL THEN
        |    floor((CAST(c AS DOUBLE) + alpha)
        |      / (CAST(n AS DOUBLE) + alpha + beta) * 1000000.0 + 0.5)
        |      / 1000000.0
        |  ELSE floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0
        |    + 0.5) / 1000000.0 END AS shrunk_rate
        |FROM sc, prior ORDER BY g""".stripMargin,
    // Same min-max bucketing as the calibration curve; scores and
    // per-row squared errors quantized to scaled-1e9 BIGINTs summed
    // as HUGEINT; bucket terms cumulated over the ordered <=10-row
    // grid; identical Murphy trees.
    "q_f58_brier_decomp" ->
      """WITH st0 AS (SELECT min(c_acctbal) AS mn0, max(c_acctbal)
        |    AS mx0 FROM customer),
        |rows0 AS (SELECT
        |    (c_acctbal - st0.mn0) / (st0.mx0 - st0.mn0) AS s,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
        |  FROM customer, st0
        |  WHERE (c_acctbal - st0.mn0) / (st0.mx0 - st0.mn0)
        |    IS NOT NULL),
        |st AS (SELECT min(s) AS mn, max(s) AS mx FROM rows0),
        |bk AS (SELECT
        |    CASE WHEN (st.mx - st.mn) / 10 = 0 THEN 0
        |      ELSE CAST(least(floor((s - st.mn)
        |        / ((st.mx - st.mn) / 10)), 9) AS BIGINT) END AS bucket,
        |    s, y,
        |    CAST(floor(s * 1000000000.0 + 0.5) AS BIGINT) AS sl,
        |    CAST(floor((s - y) * (s - y) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS bl
        |  FROM rows0, st),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_k,
        |    coalesce(CAST(sum(y) AS BIGINT), 0) AS c_k,
        |    sum(CAST(sl AS HUGEINT)) AS slh,
        |    sum(CAST(bl AS HUGEINT)) AS blh
        |  FROM bk GROUP BY 1),
        |c1 AS (SELECT *,
        |    CAST(sum(n_k) OVER () AS BIGINT) AS nall,
        |    CAST(sum(c_k) OVER () AS BIGINT) AS call,
        |    sum(blh) OVER () AS ball
        |  FROM g),
        |c2 AS (SELECT *,
        |    sum(CAST(n_k AS DOUBLE)
        |      * (CAST(slh AS DOUBLE) / 1000000000.0
        |          / CAST(n_k AS DOUBLE)
        |        - CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE))
        |      * (CAST(slh AS DOUBLE) / 1000000000.0
        |          / CAST(n_k AS DOUBLE)
        |        - CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE)))
        |      OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS crel,
        |    sum(CAST(n_k AS DOUBLE)
        |      * (CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE)
        |        - CAST(call AS DOUBLE) / CAST(nall AS DOUBLE))
        |      * (CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE)
        |        - CAST(call AS DOUBLE) / CAST(nall AS DOUBLE)))
        |      OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cres,
        |    row_number() OVER (ORDER BY bucket) AS rn
        |  FROM c1),
        |ag AS (SELECT CAST(min(nall) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_buckets,
        |    CAST(min(call) AS BIGINT) AS ct,
        |    min(ball) AS bs,
        |    arg_max(crel, rn) AS rel0, arg_max(cres, rn) AS res0
        |  FROM c2),
        |fin AS (SELECT n, n_buckets,
        |    CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS ob,
        |    CAST(bs AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE)
        |      AS brier,
        |    rel0 / CAST(n AS DOUBLE) AS rel,
        |    res0 / CAST(n AS DOUBLE) AS res
        |  FROM ag)
        |SELECT n, n_buckets,
        |  floor(brier * 1000000.0 + 0.5) / 1000000.0 AS brier,
        |  floor(rel * 1000000.0 + 0.5) / 1000000.0 AS reliability,
        |  floor(res * 1000000.0 + 0.5) / 1000000.0 AS resolution,
        |  floor(ob * (1.0 - ob) * 1000000.0 + 0.5) / 1000000.0
        |    AS uncertainty,
        |  floor((brier - (rel - res + ob * (1.0 - ob))) * 1000000.0
        |    + 0.5) / 1000000.0 AS residual
        |FROM fin""".stripMargin,
    // Per-stratum E/V/OR terms summed by ordered cumulative windows
    // over the strata table (pinned addition order, one row per
    // stratum); identical z/chi2/odds-ratio trees; f38's A&S p.
    // F86: same integer A/B (HUGEINT), same one-tree denominator and
    // A&S polynomial; HUGEINT -> DOUBLE through VARCHAR.
    "q_f86_cochran_armitage" ->
      """WITH u AS (
        |  SELECT o_custkey % 4 AS g,
        |    CAST(o_totalprice > 150000 AS BIGINT) AS y
        |  FROM orders),
        |counts AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS c
        |  FROM u GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS converted,
        |    sum(CAST(g AS HUGEINT) * c) AS swc,
        |    sum(CAST(g AS HUGEINT) * n) AS swn,
        |    sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT) * n) AS sw2n
        |  FROM counts),
        |ab AS (
        |  SELECT *,
        |    CAST(n AS HUGEINT) * swc - CAST(converted AS HUGEINT) * swn
        |      AS a,
        |    CAST(n AS HUGEINT) * sw2n - swn * swn AS b
        |  FROM agg),
        |zz AS (
        |  SELECT *,
        |    CAST(CAST(a AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(converted AS DOUBLE) *
        |        CAST(n - converted AS DOUBLE) *
        |        CAST(CAST(b AS VARCHAR) AS DOUBLE) /
        |        CAST(n AS DOUBLE)) AS z
        |  FROM ab),
        |pp AS (
        |  SELECT *,
        |    2.0 * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |    * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |      AS p2
        |  FROM zz)
        |SELECT n, converted, k,
        |  CASE WHEN converted > 0 AND converted < n AND b > 0 THEN
        |    floor(z * 1000000.0 + 0.5) / 1000000.0 END AS z,
        |  CASE WHEN converted > 0 AND converted < n AND b > 0 THEN
        |    floor(least(p2, 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p
        |FROM pp""".stripMargin,
    "q_f54_cmh" ->
      """WITH g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |vv AS (SELECT * FROM g
        |  WHERE n0 > 0 AND n1 > 0 AND n0 + n1 > 1),
        |tm AS (SELECT *,
        |    CAST(n1 AS DOUBLE) * CAST(c0 + c1 AS DOUBLE)
        |      / CAST(n0 + n1 AS DOUBLE) AS e,
        |    CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
        |      * CAST(c0 + c1 AS DOUBLE)
        |      * (CAST(n0 + n1 AS DOUBLE) - CAST(c0 + c1 AS DOUBLE))
        |      / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE)
        |        * (CAST(n0 + n1 AS DOUBLE) - 1.0)) AS v,
        |    CAST(c1 AS DOUBLE) * CAST(n0 - c0 AS DOUBLE)
        |      / CAST(n0 + n1 AS DOUBLE) AS ad,
        |    CAST(n1 - c1 AS DOUBLE) * CAST(c0 AS DOUBLE)
        |      / CAST(n0 + n1 AS DOUBLE) AS bc
        |  FROM vv),
        |cm AS (SELECT *,
        |    sum(e) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING)
        |      AS ce,
        |    sum(v) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING)
        |      AS cv,
        |    sum(ad) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING)
        |      AS cad,
        |    sum(bc) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING)
        |      AS cbc,
        |    row_number() OVER (ORDER BY event_type) AS rn
        |  FROM tm),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    coalesce(CAST(sum(c1) AS BIGINT), 0) AS o1,
        |    arg_max(ce, rn) AS se, arg_max(cv, rn) AS sv,
        |    arg_max(cad, rn) AS sad, arg_max(cbc, rn) AS sbc
        |  FROM cm),
        |zz AS (SELECT *,
        |    (CAST(o1 AS DOUBLE) - se) / sqrt(sv) AS z FROM ag),
        |pp AS (SELECT *, 2.0
        |    * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |    * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |    AS p2 FROM zz)
        |SELECT n_strata, o1,
        |  floor(se * 1000000.0 + 0.5) / 1000000.0 AS e1,
        |  floor(sv * 1000000.0 + 0.5) / 1000000.0 AS v,
        |  CASE WHEN sv > 0
        |    THEN floor(z * z * 1000000.0 + 0.5) / 1000000.0 END AS chi2,
        |  CASE WHEN sv > 0
        |    THEN floor(z * 1000000.0 + 0.5) / 1000000.0 END AS z,
        |  CASE WHEN sv > 0
        |    THEN floor(least(p2, 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p,
        |  CASE WHEN sbc > 0
        |    THEN floor(sad / sbc * 1000000.0 + 0.5) / 1000000.0
        |    END AS or_mh
        |FROM pp""".stripMargin,
    // Pair multiset is row-order invariant (duplicate (x,y) rows are
    // interchangeable); both engines' 0.5-quantile midpoint
    // interpolation agrees; identical slope/intercept trees.
    "q_f55_theil_sen" ->
      """WITH base AS (SELECT p_brand AS g,
        |    CAST(p_size AS DOUBLE) AS x,
        |    CAST(p_retailprice AS DOUBLE) AS y
        |  FROM part
        |  WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY g
        |    ORDER BY x, y) AS rid FROM base),
        |pairs AS (SELECT a.g AS g, (b.y - a.y) / (b.x - a.x) AS m
        |  FROM rn a JOIN rn b ON a.g = b.g AND a.rid < b.rid
        |    AND a.x <> b.x),
        |sl AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
        |    median(m) AS slope_raw FROM pairs GROUP BY 1),
        |ct AS (SELECT g, CAST(count(*) AS BIGINT) AS n_points
        |  FROM base GROUP BY 1),
        |inter AS (SELECT base.g AS g,
        |    median(base.y - sl.slope_raw * base.x) AS intercept_raw
        |  FROM base JOIN sl ON base.g = sl.g GROUP BY 1),
        |j AS (SELECT ct.g AS g, ct.n_points,
        |    CAST(coalesce(sl.n_pairs, 0) AS BIGINT) AS n_pairs,
        |    sl.slope_raw, inter.intercept_raw
        |  FROM ct LEFT JOIN sl ON ct.g = sl.g
        |  LEFT JOIN inter ON ct.g = inter.g)
        |SELECT g, n_points, n_pairs,
        |  floor(slope_raw * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor(intercept_raw * 1000000.0 + 0.5) / 1000000.0
        |    AS intercept
        |FROM j ORDER BY g""".stripMargin,
    // Contiguous prefix-sum bin packing: cumulative bytes via window
    // (two-phase Ranks on the Spark side), exact integer division to
    // the 4 KiB bin, per-bin aggregation.
    "q_x141_compaction_plan" ->
      """WITH f AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT)
        |    AS bytes FROM documents),
        |c AS (SELECT id, bytes, CAST(sum(bytes) OVER (ORDER BY id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM f),
        |b AS (SELECT id, bytes, (cum - bytes) // 4096 AS bin FROM c)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bytes,
        |  min(id) AS first_id, max(id) AS last_id
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    // Friedman: same micro-LONG cells, within-block doubled midranks,
    // exact HUGEINT numerator/denominator, one quantized-6 division.
    "q_f82_friedman" ->
      """WITH cells AS (
        |  SELECT user_id AS b, event_type AS tr,
        |    CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |fb AS (SELECT b FROM cells GROUP BY b HAVING count(*) = 5),
        |cf AS (SELECT cells.* FROM cells JOIN fb USING (b)),
        |bv AS (SELECT b, v, CAST(count(*) AS BIGINT) AS cv
        |       FROM cf GROUP BY 1, 2),
        |rk AS (SELECT b, v,
        |    2 * (sum(cv) OVER (PARTITION BY b ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) - cv) + cv + 1 AS r2
        |  FROM bv),
        |cr AS (SELECT cf.b, cf.tr, rk.r2
        |       FROM cf JOIN rk ON cf.b = rk.b AND cf.v = rk.v),
        |tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n,
        |    CAST(count(DISTINCT tr) AS BIGINT) AS k,
        |    sum(CAST(r2 AS HUGEINT) * CAST(r2 AS HUGEINT)) AS sr2sq
        |  FROM cr),
        |pt AS (SELECT tr, sum(CAST(r2 AS HUGEINT)) AS R2
        |       FROM cr GROUP BY tr),
        |nm AS (SELECT sum((R2 - CAST(n AS HUGEINT) * (k + 1))
        |      * (R2 - CAST(n AS HUGEINT) * (k + 1))) AS num
        |  FROM pt, tot)
        |SELECT n AS n_blocks, k, k - 1 AS dof,
        |  CASE WHEN CAST(sr2sq - CAST(n AS HUGEINT) * CAST(k AS HUGEINT)
        |      * (k + 1) * (k + 1) AS DOUBLE) > 0 THEN
        |    floor(CAST(k - 1 AS DOUBLE) * CAST(num AS DOUBLE)
        |      / CAST(sr2sq - CAST(n AS HUGEINT) * CAST(k AS HUGEINT)
        |        * (k + 1) * (k + 1) AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS chi2,
        |  CASE WHEN CAST(sr2sq - CAST(n AS HUGEINT) * CAST(k AS HUGEINT)
        |      * (k + 1) * (k + 1) AS DOUBLE) > 0 THEN
        |    floor(CAST(k - 1 AS DOUBLE) * CAST(num AS DOUBLE)
        |      / CAST(sr2sq - CAST(n AS HUGEINT) * CAST(k AS HUGEINT)
        |        * (k + 1) * (k + 1) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(k - 1 AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS kendall_w
        |FROM tot, nm""".stripMargin,
    // Kendall tau-b: the same distinct-cell pair join and exact tie
    // terms; tau is one 2(C-D)/sqrt tree over exact integers.
    "q_f83_kendall_tau" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS g, l_quantity AS x, l_discount AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |nc AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |       CAST(count(*) AS BIGINT) AS n_cells FROM cells GROUP BY g),
        |cd AS (SELECT a.g,
        |    sum(CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT) *
        |      (CASE WHEN a.x = b.x OR a.y = b.y THEN 0
        |            WHEN (a.x < b.x) = (a.y < b.y) THEN 1
        |            ELSE -1 END)) AS cdv
        |  FROM cells a JOIN cells b ON a.g = b.g
        |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
        |  GROUP BY a.g),
        |tx AS (SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS tx2 FROM
        |  (SELECT g, x, CAST(sum(c) AS BIGINT) AS t FROM cells
        |   GROUP BY 1, 2) GROUP BY g),
        |ty AS (SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS ty2 FROM
        |  (SELECT g, y, CAST(sum(c) AS BIGINT) AS t FROM cells
        |   GROUP BY 1, 2) GROUP BY g)
        |SELECT nc.g, n, n_cells,
        |  CAST(coalesce(cdv, 0) AS BIGINT) AS conc_minus_disc,
        |  CASE WHEN CAST(CAST(n AS HUGEINT) * (n - 1) - tx2 AS DOUBLE) > 0
        |        AND CAST(CAST(n AS HUGEINT) * (n - 1) - ty2 AS DOUBLE) > 0
        |    THEN floor(2.0 * CAST(coalesce(cdv, 0) AS DOUBLE)
        |      / (sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - tx2 AS DOUBLE))
        |        * sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - ty2
        |            AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS tau_b
        |FROM nc LEFT JOIN cd ON nc.g = cd.g
        |JOIN tx ON nc.g = tx.g JOIN ty ON nc.g = ty.g
        |ORDER BY nc.g""".stripMargin,
    // Brown-Forsythe: lower median on the DECIMAL grid, |x - med|,
    // then exactly the f53 ANOVA SQL on z with f_stat -> w_stat.
    "q_d28_brown_forsythe" ->
      """WITH vals AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice AS DECIMAL(18,6)) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |bv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |       FROM vals GROUP BY 1, 2),
        |cm0 AS (SELECT g, v, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS nn FROM bv),
        |md AS (SELECT g, min(v) AS med FROM cm0
        |       WHERE cum * 2 >= nn GROUP BY g),
        |z AS (SELECT vals.g, CAST(abs(vals.v - md.med) AS DECIMAL(18,6))
        |        AS zv
        |      FROM vals JOIN md ON vals.g = md.g),
        |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    sum(zv) AS s,
        |    sum(CAST(zv AS DECIMAL(19,6)) * CAST(zv AS DECIMAL(19,6)))
        |      AS q
        |  FROM z GROUP BY 1),
        |gr AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    sum(CAST(s AS DECIMAL(38,6))) AS ss FROM pg),
        |tm AS (SELECT pg.g, pg.n_g, gr.n, gr.ss,
        |    CAST(pg.q AS DOUBLE) - CAST(pg.s AS DOUBLE)
        |      * CAST(pg.s AS DOUBLE) / CAST(pg.n_g AS DOUBLE) AS sswg,
        |    CAST(pg.n_g AS DOUBLE)
        |      * (CAST(pg.s AS DOUBLE) / CAST(pg.n_g AS DOUBLE)
        |        - CAST(gr.ss AS DOUBLE) / CAST(gr.n AS DOUBLE))
        |      * (CAST(pg.s AS DOUBLE) / CAST(pg.n_g AS DOUBLE)
        |        - CAST(gr.ss AS DOUBLE) / CAST(gr.n AS DOUBLE)) AS ssbg
        |  FROM pg, gr),
        |cmw AS (SELECT *,
        |    sum(sswg) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(ssbg) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cb
        |  FROM tm),
        |ag AS (SELECT CAST(min(n) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    arg_max(cw, g) AS ssw, arg_max(cb, g) AS ssb FROM cmw)
        |SELECT n, k, ssb, ssw,
        |  CASE WHEN k > 1 AND n > k AND ssw > 0
        |    THEN floor((ssb / (CAST(k AS DOUBLE) - 1.0))
        |      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS w_stat
        |FROM ag""".stripMargin,
    // Anderson-Darling: same doubled-midrank integers and per-term 1e9
    // floor-scale; one (N-1)/N^2 * S/1e9 publish tree.
    "q_d29_anderson_darling" ->
      """WITH pooled AS (
        |  SELECT v, CAST(sum(r) AS BIGINT) AS nr,
        |    CAST(sum(c) AS BIGINT) AS nc FROM (
        |    SELECT CAST(value AS DOUBLE) AS v, 1 AS r, 0 AS c
        |    FROM events WHERE event_type = 'view' AND value IS NOT NULL
        |    UNION ALL
        |    SELECT CAST(value AS DOUBLE) AS v, 0, 1
        |    FROM events
        |    WHERE event_type = 'purchase' AND value IS NOT NULL)
        |  GROUP BY v),
        |cum AS (SELECT *, sum(nr) OVER w AS cnr, sum(nc) OVER w AS cnc,
        |    sum(nr + nc) OVER w AS cn
        |  FROM pooled WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |tt AS (SELECT CAST(sum(nr) AS BIGINT) AS nref,
        |    CAST(sum(nc) AS BIGINT) AS ncur,
        |    CAST(sum(nr + nc) AS BIGINT) AS n FROM pooled),
        |tv AS (SELECT tt.n, tt.nref, tt.ncur,
        |    CAST(nr + nc AS HUGEINT) AS l,
        |    CAST(2 * cn - (nr + nc) AS HUGEINT) AS b2,
        |    CAST(2 * cnr - nr AS HUGEINT) AS m2r,
        |    CAST(2 * cnc - nc AS HUGEINT) AS m2c
        |  FROM cum, tt),
        |te AS (SELECT n, nref, ncur, l,
        |    b2 * (2 * CAST(n AS HUGEINT) - b2)
        |      - CAST(n AS HUGEINT) * l AS e,
        |    CAST(n AS HUGEINT) * m2r - CAST(nref AS HUGEINT) * b2 AS dr,
        |    CAST(n AS HUGEINT) * m2c - CAST(ncur AS HUGEINT) * b2 AS dc
        |  FROM tv),
        |sm AS (SELECT max(n) AS n, max(nref) AS nref,
        |    max(ncur) AS ncur, count(*) AS nvals,
        |    sum(CASE WHEN e > 0 THEN
        |      CAST(floor(CAST(l * dr * dr AS DOUBLE)
        |        / CAST(CAST(nref AS HUGEINT) * e AS DOUBLE)
        |        * 1000000000.0) AS HUGEINT)
        |      + CAST(floor(CAST(l * dc * dc AS DOUBLE)
        |        / CAST(CAST(ncur AS HUGEINT) * e AS DOUBLE)
        |        * 1000000000.0) AS HUGEINT) END) AS s
        |  FROM te)
        |SELECT nref AS n_ref, ncur AS n_cur,
        |  CASE WHEN nvals > 1 THEN
        |    floor(CAST(n - 1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |      * (CAST(s AS DOUBLE) / 1000000000.0)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS a2
        |FROM sm""".stripMargin,
    // f42's DECIMAL moment discipline per group; SSW/SSB terms summed
    // by the ordered k-row cumulative window; identical F/eta2 trees
    // from raw doubles, quantized-6 at the end.
    "q_f53_anova" ->
      """WITH pg AS (SELECT o_orderpriority AS g,
        |    CAST(count(*) AS BIGINT) AS n_g,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS s,
        |    sum(CAST(o_totalprice AS DECIMAL(19,6))
        |      * CAST(o_totalprice AS DECIMAL(19,6))) AS q
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |gr AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    sum(CAST(s AS DECIMAL(38,6))) AS ss FROM pg),
        |tm AS (SELECT pg.g, pg.n_g, gr.n, gr.ss,
        |    CAST(pg.q AS DOUBLE) - CAST(pg.s AS DOUBLE)
        |      * CAST(pg.s AS DOUBLE) / CAST(pg.n_g AS DOUBLE) AS sswg,
        |    CAST(pg.n_g AS DOUBLE)
        |      * (CAST(pg.s AS DOUBLE) / CAST(pg.n_g AS DOUBLE)
        |        - CAST(gr.ss AS DOUBLE) / CAST(gr.n AS DOUBLE))
        |      * (CAST(pg.s AS DOUBLE) / CAST(pg.n_g AS DOUBLE)
        |        - CAST(gr.ss AS DOUBLE) / CAST(gr.n AS DOUBLE)) AS ssbg
        |  FROM pg, gr),
        |cm AS (SELECT *,
        |    sum(sswg) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(ssbg) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cb
        |  FROM tm),
        |ag AS (SELECT CAST(min(n) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    arg_max(cw, g) AS ssw, arg_max(cb, g) AS ssb FROM cm)
        |SELECT n, k, ssb, ssw,
        |  CASE WHEN k > 1 AND n > k AND ssw > 0
        |    THEN floor((ssb / (CAST(k AS DOUBLE) - 1.0))
        |      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS f_stat,
        |  CASE WHEN ssb + ssw > 0
        |    THEN floor(ssb / (ssb + ssw) * 1000000.0 + 0.5) / 1000000.0
        |    END AS eta2
        |FROM ag""".stripMargin,
    // f38's count CTE; mixture-normal mSPRT closed form as one fixed
    // IEEE tree over the exact counts; v quantized-9 (it sits at the
    // 1e-4 scale), everything else quantized-6.
    "q_f52_msprt" ->
      """WITH g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |d AS (SELECT *,
        |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS delta,
        |    (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |      * (1.0 - CAST(c0 + c1 AS DOUBLE)
        |        / CAST(n0 + n1 AS DOUBLE))
        |      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
        |      AS v
        |  FROM g),
        |l AS (SELECT *,
        |    sqrt(v / (v + 0.0001))
        |      * exp(delta * delta * 0.0001
        |        / (2.0 * v * (v + 0.0001))) AS lam,
        |    (n0 > 0 AND n1 > 0 AND c0 + c1 > 0
        |      AND c0 + c1 < n0 + n1) AS ok
        |  FROM d)
        |SELECT event_type, n0, n1, c0, c1,
        |  CASE WHEN ok
        |    THEN floor(delta * 1000000.0 + 0.5) / 1000000.0
        |    END AS delta,
        |  CASE WHEN ok
        |    THEN floor(v * 1000000000.0 + 0.5) / 1000000000.0 END AS v,
        |  CASE WHEN ok
        |    THEN floor(lam * 1000000.0 + 0.5) / 1000000.0
        |    END AS lambda,
        |  CASE WHEN ok
        |    THEN floor(least(1.0 / lam, 1.0) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS p_av
        |FROM l ORDER BY event_type""".stripMargin,
    // Direct nearest-within-caliper argmin — semantically what the
    // 3-bin equi-join computes (any pair within the caliper differs by
    // at most one caliper-width bin); same (dist, score, id) tie
    // break, dist quantized-6.
    "q_f51_caliper_match" ->
      """WITH st AS (SELECT min(c_acctbal) AS mn, max(c_acctbal) AS mx
        |  FROM customer),
        |sp AS (SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS s
        |  FROM orders GROUP BY 1),
        |base AS (SELECT c_custkey AS id,
        |    (c_acctbal - st.mn) / (st.mx - st.mn) AS score,
        |    CAST(coalesce(sp.s, 0) AS DOUBLE) AS y,
        |    (c_mktsegment = 'BUILDING') AS trt
        |  FROM customer CROSS JOIN st
        |  LEFT JOIN sp ON customer.c_custkey = sp.o_custkey),
        |pr AS (SELECT t.id AS t_id, t.score AS t_score, t.y AS t_y,
        |    c.id AS c_id, c.score AS c_score, c.y AS c_y,
        |    abs(t.score - c.score) AS dist
        |  FROM base t JOIN base c
        |    ON t.trt AND NOT c.trt
        |      AND abs(t.score - c.score) <= 0.02),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY t_id
        |    ORDER BY dist, c_score, c_id) AS rn FROM pr)
        |SELECT t_id, t_score, t_y, c_id, c_score, c_y,
        |  floor(dist * 1000000.0 + 0.5) / 1000000.0 AS dist
        |FROM rn WHERE rn = 1 ORDER BY t_id""".stripMargin,
    // Distinct-cell grid midranks (HUGEINT ≡ Spark DECIMAL(38,0) —
    // both exact), doubled so ties stay integral; identical IEEE rho
    // tree over the double-cast moments, quantized-6.
    "q_f47_spearman" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS g, l_quantity AS x,
        |    l_extendedprice AS y, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |xm AS (SELECT g, x, CAST(sum(n_xy) AS BIGINT) AS c
        |  FROM cells GROUP BY 1, 2),
        |xr AS (SELECT g, x, CAST(2 * (CAST(sum(c) OVER
        |      (PARTITION BY g ORDER BY x) AS BIGINT) - c) + c + 1
        |    AS HUGEINT) AS rx FROM xm),
        |ym AS (SELECT g, y, CAST(sum(n_xy) AS BIGINT) AS c
        |  FROM cells GROUP BY 1, 2),
        |yr AS (SELECT g, y, CAST(2 * (CAST(sum(c) OVER
        |      (PARTITION BY g ORDER BY y) AS BIGINT) - c) + c + 1
        |    AS HUGEINT) AS ry FROM ym),
        |j AS (SELECT cells.g AS g, cells.n_xy AS n_xy,
        |    xr.rx AS rx, yr.ry AS ry
        |  FROM cells
        |  JOIN xr ON cells.g = xr.g AND cells.x = xr.x
        |  JOIN yr ON cells.g = yr.g AND cells.y = yr.y),
        |a AS (SELECT g, CAST(sum(n_xy) AS BIGINT) AS n,
        |    sum(CAST(n_xy AS HUGEINT) * rx) AS su,
        |    sum(CAST(n_xy AS HUGEINT) * ry) AS sv,
        |    sum(CAST(n_xy AS HUGEINT) * rx * ry) AS suv,
        |    sum(CAST(n_xy AS HUGEINT) * rx * rx) AS suu,
        |    sum(CAST(n_xy AS HUGEINT) * ry * ry) AS svv
        |  FROM j GROUP BY 1),
        |b AS (SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(su AS DOUBLE) AS sud, CAST(sv AS DOUBLE) AS svd,
        |    CAST(suv AS DOUBLE) AS suvd, CAST(suu AS DOUBLE) AS suud,
        |    CAST(svv AS DOUBLE) AS svvd
        |  FROM a)
        |SELECT g, n,
        |  CASE WHEN n > 1 AND nd * suud - sud * sud > 0
        |      AND nd * svvd - svd * svd > 0
        |    THEN floor((nd * suvd - sud * svd)
        |      / (sqrt(nd * suud - sud * sud)
        |        * sqrt(nd * svvd - svd * svd))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS rho
        |FROM b ORDER BY g""".stripMargin,
    // Pooled doubled midranks over the distinct-value table; per-group
    // (R2/2)^2/n terms summed by the ordered cumulative window over
    // the k-row group table (pinned addition order); exact tie term;
    // identical H / tie-correction trees from the RAW doubles,
    // quantized-6 only in the final select.
    "q_f48_kruskal_wallis" ->
      """WITH rows0 AS (SELECT l_returnflag AS g, l_quantity AS v
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS c
        |  FROM rows0 GROUP BY 1),
        |rk AS (SELECT v, c, CAST(2 * (CAST(sum(c) OVER (ORDER BY v)
        |    AS BIGINT) - c) + c + 1 AS HUGEINT) AS r2 FROM bv),
        |pgv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n_gv
        |  FROM rows0 GROUP BY 1, 2),
        |pg AS (SELECT g, CAST(sum(n_gv) AS BIGINT) AS n_g,
        |    sum(CAST(n_gv AS HUGEINT) * r2) AS r2g
        |  FROM pgv JOIN rk ON pgv.v = rk.v GROUP BY 1),
        |cumt AS (SELECT g, n_g,
        |    sum(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
        |      / (4.0 * CAST(n_g AS DOUBLE)))
        |      OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM pg),
        |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    arg_max(ct, g) AS st
        |  FROM cumt),
        |tc AS (SELECT coalesce(sum(CAST(c AS HUGEINT) * c * c - c), 0)
        |    AS t3 FROM rk),
        |fin AS (SELECT n, k, CAST(n AS DOUBLE) AS nd,
        |    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |      * st - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS hraw,
        |    1.0 - CAST(t3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS tcraw
        |  FROM tot, tc)
        |SELECT n, k, CAST(k - 1 AS BIGINT) AS dof,
        |  CASE WHEN n > 1
        |    THEN floor(hraw * 1000000.0 + 0.5) / 1000000.0 END AS h,
        |  CASE WHEN n > 1
        |    THEN floor(tcraw * 1000000.0 + 0.5) / 1000000.0 END AS tie_c,
        |  CASE WHEN n > 1 AND tcraw > 0
        |    THEN floor(hraw / tcraw * 1000000.0 + 0.5) / 1000000.0
        |    END AS h_adj
        |FROM fin""".stripMargin,
    // Same distinct-value midranks; doubled U kept integral until one
    // exact halving; Lehmann tie-corrected sigma; f38's A&S 26.2.17
    // polynomial for the two-sided p.
    "q_f49_mann_whitney" ->
      """WITH rows0 AS (SELECT CASE WHEN o_orderpriority < '3'
        |      THEN 1 ELSE 0 END AS arm, o_totalprice AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1
        |  FROM rows0 GROUP BY 1),
        |rk AS (SELECT v, c, c1, CAST(2 * (CAST(sum(c) OVER (ORDER BY v)
        |    AS BIGINT) - c) + c + 1 AS HUGEINT) AS r2 FROM bv),
        |a AS (SELECT coalesce(CAST(sum(c - c1) AS BIGINT), 0) AS n0,
        |    coalesce(CAST(sum(c1) AS BIGINT), 0) AS n1,
        |    coalesce(sum(CAST(c1 AS HUGEINT) * r2), 0) AS r21,
        |    coalesce(sum(CAST(c AS HUGEINT) * c * c - c), 0) AS t3
        |  FROM rk),
        |b AS (SELECT n0, n1, CAST(n0 AS DOUBLE) AS d0,
        |    CAST(n1 AS DOUBLE) AS d1, CAST(r21 AS DOUBLE) AS r21d,
        |    CAST(t3 AS DOUBLE) AS t3d FROM a),
        |cc AS (SELECT *,
        |    (r21d - d1 * (d1 + 1.0)) / 2.0 AS u1,
        |    d0 * d1 / 12.0 * ((d0 + d1 + 1.0)
        |      - t3d / ((d0 + d1) * (d0 + d1 - 1.0))) AS sig2
        |  FROM b),
        |dd AS (SELECT *,
        |    (u1 - d0 * d1 / 2.0) / sqrt(sig2) AS z FROM cc),
        |ee AS (SELECT *, 2.0
        |    * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |    * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |    AS p2 FROM dd)
        |SELECT n0, n1,
        |  CASE WHEN n0 > 0 AND n1 > 0
        |    THEN floor(u1 * 1000000.0 + 0.5) / 1000000.0 END AS u1,
        |  CASE WHEN n0 > 0 AND n1 > 0
        |    THEN floor((d0 * d1 - u1) * 1000000.0 + 0.5) / 1000000.0
        |    END AS u0,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND sig2 > 0
        |    THEN floor(z * 1000000.0 + 0.5) / 1000000.0 END AS z,
        |  CASE WHEN n0 > 0 AND n1 > 0 AND sig2 > 0
        |    THEN floor(least(p2, 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p
        |FROM ee""".stripMargin,
    // Same exact cell/marginal re-aggregation as f35; chi-square terms
    // floor-scaled to LONGs, identical V tree.
    "q_f40_cramers_v" ->
      """WITH cells AS (
        |  SELECT lang AS x, source AS y,
        |    CAST(count(*) AS BIGINT) AS n_xy
        |  FROM documents GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x
        |       FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y
        |       FROM cells GROUP BY 1),
        |sh AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n,
        |    CAST(count(DISTINCT x) AS BIGINT) AS r,
        |    CAST(count(DISTINCT y) AS BIGINT) AS c
        |  FROM cells),
        |grid AS (SELECT mx.x, my.y, mx.n_x, my.n_y,
        |    coalesce(cells.n_xy, 0) AS n_xy
        |  FROM mx CROSS JOIN my
        |  LEFT JOIN cells ON cells.x = mx.x AND cells.y = my.y),
        |ct AS (SELECT CAST(sum(CAST(floor(
        |    (CAST(grid.n_xy AS DOUBLE)
        |      - CAST(grid.n_x AS DOUBLE) * CAST(grid.n_y AS DOUBLE)
        |        / CAST(sh.n AS DOUBLE))
        |    * (CAST(grid.n_xy AS DOUBLE)
        |      - CAST(grid.n_x AS DOUBLE) * CAST(grid.n_y AS DOUBLE)
        |        / CAST(sh.n AS DOUBLE))
        |    / (CAST(grid.n_x AS DOUBLE) * CAST(grid.n_y AS DOUBLE)
        |        / CAST(sh.n AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS chi_tot
        |  FROM grid CROSS JOIN sh),
        |f AS (SELECT sh.n, sh.r, sh.c,
        |    CAST(ct.chi_tot AS DOUBLE) / 1000000.0 AS chi2
        |  FROM sh, ct)
        |SELECT n, r AS r_levels, c AS c_levels,
        |  CAST((r - 1) * (c - 1) AS BIGINT) AS dof, chi2,
        |  CASE WHEN r > 1 AND c > 1 THEN
        |    floor(sqrt(chi2 / (CAST(n AS DOUBLE)
        |      * (CAST(LEAST(r, c) AS DOUBLE) - 1.0)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS cramers_v
        |FROM f""".stripMargin,
    // Same exact counts/filters, same A&S 26.2.17 p-value tree
    // scaled to 1e12 LONGs, same HUGEINT-exact BH step-up.
    // Holm: same z/p/rank chain as f38; the step-down cutoff is the
    // first rank failing the exact-integer p*(m-r+1)*20 > 1e12 test.
    "q_f84_holm" ->
      """WITH g AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |v AS (SELECT * FROM g
        |  WHERE n0 > 0 AND n1 > 0 AND c0 + c1 > 0
        |    AND c0 + c1 < n0 + n1),
        |zt AS (SELECT *,
        |    (c1 / n1 - c0 / n0)
        |      / sqrt(((c0 + c1) / (n0 + n1))
        |        * (1.0 - (c0 + c1) / (n0 + n1))
        |        * (1.0 / n0 + 1.0 / n1)) AS z
        |  FROM v),
        |pt AS (SELECT *,
        |    CAST(floor(2.0
        |      * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |      * 1000000000000.0 + 0.5) AS BIGINT) AS pl
        |  FROM zt),
        |rk AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY pl, event_type, hr)
        |      AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM pt),
        |ks AS (SELECT coalesce(min(CASE
        |    WHEN CAST(pl AS HUGEINT) * (m - rank + 1) * 20
        |      > CAST(1 AS HUGEINT) * 1000000000000
        |    THEN rank END) - 1, max(m)) AS kstar FROM rk)
        |SELECT rk.event_type, rk.hr, rk.n0, rk.n1, rk.c0, rk.c1,
        |  floor(rk.z * 1000000.0 + 0.5) / 1000000.0 AS z,
        |  CAST(rk.pl AS DOUBLE) / 1000000000000.0 AS p,
        |  rk.rank, rk.m, ks.kstar AS holm_cutoff_rank,
        |  CASE WHEN rk.rank <= ks.kstar THEN 1 ELSE 0 END AS significant
        |FROM rk, ks ORDER BY rk.rank""".stripMargin,
    // BY: the BH cutoff divided by the harmonic c(m). c(m) is rebuilt
    // by a RECURSIVE CTE (1, +1/2, +1/3, …) — a literal sequential
    // left fold, bit-identical to the Spark driver's ascending sum; a
    // windowed double cumulation would leave the accumulation
    // strategy engine-internal (the pageHinkley hazard).
    "q_f85_by_fdr" ->
      """WITH RECURSIVE g AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |v AS (SELECT * FROM g
        |  WHERE n0 > 0 AND n1 > 0 AND c0 + c1 > 0
        |    AND c0 + c1 < n0 + n1),
        |zt AS (SELECT *,
        |    (c1 / n1 - c0 / n0)
        |      / sqrt(((c0 + c1) / (n0 + n1))
        |        * (1.0 - (c0 + c1) / (n0 + n1))
        |        * (1.0 / n0 + 1.0 / n1)) AS z
        |  FROM v),
        |pt AS (SELECT *,
        |    CAST(floor(2.0
        |      * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |      * 1000000000000.0 + 0.5) AS BIGINT) AS pl
        |  FROM zt),
        |rk AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY pl, event_type, hr)
        |      AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM pt),
        |rec AS (SELECT CAST(1 AS BIGINT) AS i, 1.0 AS c
        |  UNION ALL SELECT i + 1, c + 1.0 / (i + 1)
        |  FROM rec WHERE i < (SELECT max(m) FROM rk)),
        |hm AS (SELECT c AS cm FROM rec
        |  WHERE i = (SELECT max(m) FROM rk)),
        |ks AS (SELECT coalesce(max(CASE
        |    WHEN CAST(CAST(pl AS HUGEINT) * m * 20 AS DOUBLE) * hm.cm
        |      <= CAST(CAST(rank AS HUGEINT) * 1 * 1000000000000
        |        AS DOUBLE)
        |    THEN rank END), 0) AS kstar FROM rk, hm)
        |SELECT rk.event_type, rk.hr, rk.n0, rk.n1, rk.c0, rk.c1,
        |  floor(rk.z * 1000000.0 + 0.5) / 1000000.0 AS z,
        |  CAST(rk.pl AS DOUBLE) / 1000000000000.0 AS p,
        |  rk.rank, rk.m, ks.kstar AS by_cutoff_rank,
        |  CASE WHEN rk.rank <= ks.kstar THEN 1 ELSE 0 END AS significant
        |FROM rk, ks ORDER BY rk.rank""".stripMargin,
    // Categorical drift: exact HUGEINT TVD numerator; Hellinger/JSD
    // terms as the same IEEE trees summed by the category-ordered
    // cumulative window (arg_max picks the final cumulation).
    "q_d30_categorical_drift" ->
      """WITH cells AS (
        |  SELECT lang AS cat,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nr,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nc
        |  FROM documents WHERE source IN ('src0', 'src1')
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(nr) AS BIGINT) AS nref,
        |    CAST(sum(nc) AS BIGINT) AS ncur,
        |    CAST(count(*) AS BIGINT) AS k FROM cells),
        |tm AS (SELECT c.cat, tt.nref, tt.ncur, tt.k,
        |    abs(CAST(c.nr AS HUGEINT) * tt.ncur
        |      - CAST(c.nc AS HUGEINT) * tt.nref) AS tvdn,
        |    (sqrt(CAST(c.nr AS DOUBLE) / CAST(tt.nref AS DOUBLE))
        |      - sqrt(CAST(c.nc AS DOUBLE) / CAST(tt.ncur AS DOUBLE)))
        |    * (sqrt(CAST(c.nr AS DOUBLE) / CAST(tt.nref AS DOUBLE))
        |      - sqrt(CAST(c.nc AS DOUBLE) / CAST(tt.ncur AS DOUBLE)))
        |      AS ht,
        |    (CASE WHEN c.nr > 0 THEN
        |      (CAST(c.nr AS DOUBLE) / CAST(tt.nref AS DOUBLE))
        |        * log2((CAST(c.nr AS DOUBLE) / CAST(tt.nref AS DOUBLE))
        |          / ((CAST(c.nr AS DOUBLE) / CAST(tt.nref AS DOUBLE)
        |            + CAST(c.nc AS DOUBLE) / CAST(tt.ncur AS DOUBLE))
        |            / 2.0)) ELSE 0.0 END
        |    + CASE WHEN c.nc > 0 THEN
        |      (CAST(c.nc AS DOUBLE) / CAST(tt.ncur AS DOUBLE))
        |        * log2((CAST(c.nc AS DOUBLE) / CAST(tt.ncur AS DOUBLE))
        |          / ((CAST(c.nr AS DOUBLE) / CAST(tt.nref AS DOUBLE)
        |            + CAST(c.nc AS DOUBLE) / CAST(tt.ncur AS DOUBLE))
        |            / 2.0)) ELSE 0.0 END) AS jt
        |  FROM cells c, tt),
        |cw AS (SELECT *,
        |    sum(ht) OVER (ORDER BY cat ROWS UNBOUNDED PRECEDING) AS ch,
        |    sum(jt) OVER (ORDER BY cat ROWS UNBOUNDED PRECEDING) AS cj
        |  FROM tm),
        |ag AS (SELECT max(nref) AS nref, max(ncur) AS ncur,
        |    max(k) AS k, sum(tvdn) AS tvd,
        |    arg_max(ch, cat) AS h, arg_max(cj, cat) AS j FROM cw)
        |SELECT nref AS n_ref, ncur AS n_cur, k,
        |  floor(CAST(tvd AS DOUBLE)
        |    / (2.0 * CAST(nref AS DOUBLE) * CAST(ncur AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS tvd,
        |  floor(sqrt(h / 2.0) * 1000000.0 + 0.5) / 1000000.0
        |    AS hellinger,
        |  floor(j / 2.0 * 1000000.0 + 0.5) / 1000000.0 AS jsd
        |FROM ag""".stripMargin,
    "q_f38_bh_fdr" ->
      """WITH g AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 60
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |v AS (SELECT * FROM g
        |  WHERE n0 > 0 AND n1 > 0 AND c0 + c1 > 0
        |    AND c0 + c1 < n0 + n1),
        |zt AS (SELECT *,
        |    (c1 / n1 - c0 / n0)
        |      / sqrt(((c0 + c1) / (n0 + n1))
        |        * (1.0 - (c0 + c1) / (n0 + n1))
        |        * (1.0 / n0 + 1.0 / n1)) AS z
        |  FROM v),
        |pt AS (SELECT *,
        |    CAST(floor(2.0
        |      * (exp(-(abs(z) * abs(z)) / 2.0) / 2.5066282746310002)
        |      * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(z)))
        |        + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(z))))
        |      * 1000000000000.0 + 0.5) AS BIGINT) AS pl
        |  FROM zt),
        |rk AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY pl, event_type, hr)
        |      AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM pt),
        |ks AS (SELECT coalesce(max(CASE
        |    WHEN CAST(pl AS HUGEINT) * m * 20
        |      <= CAST(rank AS HUGEINT) * 1 * 1000000000000
        |    THEN rank END), 0) AS kstar FROM rk)
        |SELECT rk.event_type, rk.hr, rk.n0, rk.n1, rk.c0, rk.c1,
        |  floor(rk.z * 1000000.0 + 0.5) / 1000000.0 AS z,
        |  CAST(rk.pl AS DOUBLE) / 1000000000000.0 AS p,
        |  rk.rank, rk.m, ks.kstar AS bh_cutoff_rank,
        |  CASE WHEN rk.rank <= ks.kstar THEN 1 ELSE 0 END AS significant
        |FROM rk, ks ORDER BY rk.rank""".stripMargin,
    // Same exact bucket table; the same minimax (max over k<=i of min
    // over j>=i of exact-rational interval means) via joins.
    "q_f37_isotonic" ->
      """WITH s AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS x,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |st AS (SELECT min(x) AS lo, max(x) AS hi FROM s),
        |b AS (SELECT CASE WHEN (hi - lo) / 20 = 0 THEN 0
        |    ELSE LEAST(CAST(floor((x - lo) / ((hi - lo) / 20))
        |      AS BIGINT), 19) END AS bucket, y
        |  FROM s, st),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos
        |  FROM b GROUP BY 1),
        |iv AS (SELECT k.bucket AS k, j.bucket AS j,
        |    CAST(sum(m.n) AS BIGINT) AS sn,
        |    CAST(sum(m.pos) AS BIGINT) AS sp
        |  FROM g k JOIN g j ON k.bucket <= j.bucket
        |  JOIN g m ON m.bucket BETWEEN k.bucket AND j.bucket
        |  GROUP BY 1, 2),
        |inn AS (SELECT i.bucket AS i, iv.k,
        |    min(CAST(iv.sp AS DOUBLE) / CAST(iv.sn AS DOUBLE)) AS lo_m
        |  FROM g i JOIN iv ON iv.k <= i.bucket AND iv.j >= i.bucket
        |  GROUP BY 1, 2),
        |f AS (SELECT i, max(lo_m) AS fitted FROM inn GROUP BY 1)
        |SELECT g.bucket, g.n, g.pos,
        |  CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE) AS rate,
        |  f.fitted
        |FROM g JOIN f ON f.i = g.bucket ORDER BY g.bucket""".stripMargin,
    // Same cents-scaled BIGINT digit extraction, same raw-share χ²/MAD
    // terms floor-scaled to LONGs before summing.
    "q_d21_benford" ->
      """WITH s AS (
        |  SELECT CAST(floor(abs(CAST(o_totalprice AS DOUBLE)) * 100.0
        |    + 0.5) AS BIGINT) AS cents FROM orders),
        |d AS (SELECT CASE WHEN cents > 0 THEN
        |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
        |  END AS digit FROM s),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
        |      FROM d GROUP BY 1),
        |tot AS (SELECT
        |  CAST(coalesce(sum(CASE WHEN digit IS NOT NULL THEN n END), 0)
        |    AS BIGINT) AS n_used,
        |  CAST(coalesce(sum(CASE WHEN digit IS NULL THEN n END), 0)
        |    AS BIGINT) AS n_skipped
        |  FROM c),
        |p AS (SELECT sp.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |      FROM (SELECT CAST(unnest(range(1, 10)) AS INTEGER)
        |              AS digit) sp
        |      LEFT JOIN c ON c.digit = sp.digit),
        |terms AS (
        |  SELECT p.digit, p.n, tot.n_used, tot.n_skipped,
        |    CAST(p.n AS DOUBLE) / CAST(tot.n_used AS DOUBLE) AS share_r,
        |    ln(1.0 + 1.0 / CAST(p.digit AS DOUBLE)) / ln(10.0) AS exp_r,
        |    CAST(floor((CAST(p.n AS DOUBLE)
        |        - CAST(tot.n_used AS DOUBLE)
        |          * (ln(1.0 + 1.0 / CAST(p.digit AS DOUBLE)) / ln(10.0)))
        |      * (CAST(p.n AS DOUBLE)
        |        - CAST(tot.n_used AS DOUBLE)
        |          * (ln(1.0 + 1.0 / CAST(p.digit AS DOUBLE)) / ln(10.0)))
        |      / (CAST(tot.n_used AS DOUBLE)
        |        * (ln(1.0 + 1.0 / CAST(p.digit AS DOUBLE)) / ln(10.0)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS chi_scaled,
        |    CAST(floor(abs(
        |      CAST(p.n AS DOUBLE) / CAST(tot.n_used AS DOUBLE)
        |      - ln(1.0 + 1.0 / CAST(p.digit AS DOUBLE)) / ln(10.0))
        |      * 1000000.0 + 0.5) AS BIGINT) AS mad_scaled
        |  FROM p, tot),
        |st AS (SELECT CAST(sum(chi_scaled) AS BIGINT) AS chi_tot,
        |              CAST(sum(mad_scaled) AS BIGINT) AS mad_tot
        |       FROM terms)
        |SELECT t.digit, t.n,
        |  floor(t.share_r * 1000000.0 + 0.5) / 1000000.0 AS share,
        |  floor(t.exp_r * 1000000.0 + 0.5) / 1000000.0 AS expected,
        |  CAST(st.chi_tot AS DOUBLE) / 1000000.0 AS chi2,
        |  CAST(st.mad_tot AS DOUBLE) / 1000000.0 / 9.0 AS mad,
        |  t.n_used, t.n_skipped
        |FROM terms t, st ORDER BY t.digit""".stripMargin,
    // Exact BIGINT cell/group re-aggregation; g3 = Σ(rows − max).
    "q_d22_fd_violations" ->
      """WITH cells AS (
        |  SELECT o_custkey, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |g AS (SELECT o_custkey, CAST(sum(n) AS BIGINT) AS rows_,
        |        CAST(max(n) AS BIGINT) AS mx,
        |        CAST(count(*) AS BIGINT) AS vals
        |      FROM cells GROUP BY 1)
        |SELECT CAST(sum(rows_) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(coalesce(sum(CASE WHEN vals > 1 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_violating_groups,
        |  CAST(sum(rows_ - mx) AS BIGINT) AS g3_rows,
        |  floor(CAST(sum(rows_ - mx) AS DOUBLE)
        |    / CAST(sum(rows_) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS g3_rate,
        |  sum(rows_ - mx) = 0 AS fd_holds
        |FROM g""".stripMargin,
    // Same one-pass counts; every ratio divides once; MCC/κ factors
    // cast to double before multiplying; identical guard structure.
    "q_f36_confusion" ->
      """WITH a AS (SELECT
        |  CAST(sum(CASE WHEN n_chars >= 300 AND lang = 'en'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN n_chars >= 300 AND lang <> 'en'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN n_chars < 300 AND lang <> 'en'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  CAST(sum(CASE WHEN n_chars < 300 AND lang = 'en'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM documents)
        |SELECT tp, fp, tn, fn,
        |  floor((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
        |    / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |      + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS accuracy,
        |  CASE WHEN tp + fp > 0 THEN
        |    floor(CAST(tp AS DOUBLE)
        |      / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS precision,
        |  CASE WHEN tp + fn > 0 THEN
        |    floor(CAST(tp AS DOUBLE)
        |      / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS recall,
        |  CASE WHEN tn + fp > 0 THEN
        |    floor(CAST(tn AS DOUBLE)
        |      / (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS specificity,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    floor((2.0 * CAST(tp AS DOUBLE))
        |      / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |        + CAST(fn AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS f1,
        |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
        |      AND tn + fn > 0 THEN
        |    floor((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |      / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS mcc,
        |  CASE WHEN abs(1.0
        |      - ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |          * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |        + (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |          * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)))
        |        / ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |          + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |          * (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |            + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))) > 0
        |  THEN
        |    floor((((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
        |        / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |          + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))
        |      - ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |          * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |        + (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |          * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)))
        |        / ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |          + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |          * (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |            + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))))
        |      / (1.0
        |        - ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |            * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |          + (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |            * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)))
        |          / ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |            + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))
        |            * (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |              + CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS kappa
        |FROM a""".stripMargin,
    // DECIMAL(28,10)-exact means cast to double once; the same
    // left-associated IEEE score/contribution trees, quantized-6.
    "q_f33_linear_contrib" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |m AS (
        |  SELECT
        |    CAST(sum(CAST(n_chars AS DECIMAL(28,10))) AS DOUBLE)
        |      / count(n_chars) AS mu_c,
        |    CAST(sum(CAST(n_tokens AS DECIMAL(28,10))) AS DOUBLE)
        |      / count(n_tokens) AS mu_t
        |  FROM d)
        |SELECT d.doc_id, d.n_chars, d.n_tokens,
        |  floor((CAST(d.n_chars AS DOUBLE) * 0.01
        |      + CAST(d.n_tokens AS DOUBLE) * 0.5 + 2.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS score,
        |  floor((m.mu_c * 0.01 + m.mu_t * 0.5 + 2.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS baseline,
        |  floor(((CAST(d.n_chars AS DOUBLE) - m.mu_c) * 0.01)
        |    * 1000000.0 + 0.5) / 1000000.0 AS contrib_n_chars,
        |  floor(((CAST(d.n_tokens AS DOUBLE) - m.mu_t) * 0.5)
        |    * 1000000.0 + 0.5) / 1000000.0 AS contrib_n_tokens
        |FROM d, m ORDER BY d.doc_id""".stripMargin,
    // Same +0.5-adjusted WOE tree; IV terms floor-scaled to LONGs and
    // integer-summed so the total is aggregation-order-free.
    "q_f34_woe_iv" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS value,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_good,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_bad
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_good) AS DOUBLE) AS g,
        |               CAST(sum(n_bad) AS DOUBLE) AS b FROM c),
        |w AS (
        |  SELECT c.value, c.n, c.n_good, c.n_bad,
        |    ln(((CAST(c.n_good AS DOUBLE) + 0.5) / tot.g)
        |      / ((CAST(c.n_bad AS DOUBLE) + 0.5) / tot.b)) AS woe_raw,
        |    CAST(floor((CAST(c.n_good AS DOUBLE) / tot.g
        |        - CAST(c.n_bad AS DOUBLE) / tot.b)
        |      * ln(((CAST(c.n_good AS DOUBLE) + 0.5) / tot.g)
        |        / ((CAST(c.n_bad AS DOUBLE) + 0.5) / tot.b))
        |      * 1000000.0 + 0.5) AS BIGINT) AS iv_scaled
        |  FROM c, tot)
        |SELECT value, n, n_good, n_bad,
        |  floor(woe_raw * 1000000.0 + 0.5) / 1000000.0 AS woe,
        |  CAST(iv_scaled AS DOUBLE) / 1000000.0 AS iv_term,
        |  CAST((SELECT sum(iv_scaled) FROM w) AS DOUBLE) / 1000000.0
        |    AS iv_total
        |FROM w ORDER BY value""".stripMargin,
    // Exact BIGINT cells re-aggregated to marginals; entropies and MI
    // summed as floor-scaled LONGs; identical pmi/nmi IEEE trees.
    "q_f35_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang AS x, source AS y,
        |    CAST(count(*) AS BIGINT) AS n_xy
        |  FROM documents GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x
        |       FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells),
        |hx AS (SELECT CAST(sum(CAST(floor(
        |    -(CAST(n_x AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * ln(CAST(n_x AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hx_scaled
        |  FROM mx, tot),
        |hy AS (SELECT CAST(sum(CAST(floor(
        |    -(CAST(n_y AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * ln(CAST(n_y AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hy_scaled
        |  FROM my, tot),
        |terms AS (
        |  SELECT cells.x, cells.y, cells.n_xy,
        |    CAST(cells.n_xy AS DOUBLE) / CAST(tot.n AS DOUBLE) AS p_raw,
        |    ln((CAST(cells.n_xy AS DOUBLE) * CAST(tot.n AS DOUBLE))
        |      / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE)))
        |      AS pmi_raw,
        |    CAST(floor(
        |      (CAST(cells.n_xy AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * ln((CAST(cells.n_xy AS DOUBLE) * CAST(tot.n AS DOUBLE))
        |        / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS mi_scaled
        |  FROM cells
        |  JOIN mx ON cells.x = mx.x
        |  JOIN my ON cells.y = my.y
        |  CROSS JOIN tot),
        |mt AS (SELECT CAST(sum(mi_scaled) AS BIGINT) AS mi_tot_scaled
        |       FROM terms)
        |SELECT t.x, t.y, t.n_xy,
        |  floor(t.p_raw * 1000000.0 + 0.5) / 1000000.0 AS p_xy,
        |  floor(t.pmi_raw * 1000000.0 + 0.5) / 1000000.0 AS pmi,
        |  CAST(t.mi_scaled AS DOUBLE) / 1000000.0 AS mi_term,
        |  CAST(mt.mi_tot_scaled AS DOUBLE) / 1000000.0 AS mi_total,
        |  CASE WHEN hx.hx_scaled > 0 AND hy.hy_scaled > 0 THEN
        |    floor(((CAST(mt.mi_tot_scaled AS DOUBLE) / 1000000.0)
        |      / sqrt((CAST(hx.hx_scaled AS DOUBLE) / 1000000.0)
        |        * (CAST(hy.hy_scaled AS DOUBLE) / 1000000.0)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS nmi
        |FROM terms t, mt, hx, hy
        |ORDER BY t.x, t.y""".stripMargin,
    // Distinct-score cumulative TP/FP with the same tie-grouping; AP
    // as the step sum over per-score rows.
    "q_f30_pr_curve" ->
      """WITH g AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS score,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pos_at,
        |    CAST(count(*) AS BIGINT) AS n_at
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT *,
        |    CAST(sum(n_pos_at) OVER (ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(sum(n_at) OVER (ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM g),
        |tot AS (SELECT CAST(sum(n_pos_at) AS BIGINT) AS p FROM g),
        |r AS (
        |  SELECT c.score, c.n_pos_at, c.n_at, c.tp,
        |    c.cum - c.tp AS fp,
        |    CAST(c.tp AS DOUBLE) / CAST(c.cum AS DOUBLE) AS "precision",
        |    CAST(c.tp AS DOUBLE) / CAST(tot.p AS DOUBLE) AS recall,
        |    CAST(c.n_pos_at AS DOUBLE) / CAST(tot.p AS DOUBLE)
        |      * (CAST(c.tp AS DOUBLE) / CAST(c.cum AS DOUBLE)) AS apw
        |  FROM c, tot),
        |ap AS (SELECT sum(apw) AS ap FROM r)
        |SELECT r.score, r.n_pos_at, r.n_at, r.tp, r.fp, r."precision",
        |  r.recall,
        |  floor(ap.ap * 1000000.0 + 0.5) / 1000000.0 AS ap
        |FROM r, ap ORDER BY r.score DESC""".stripMargin,
    // The same column census and null-rate arithmetic, written as one
    // literal row per column.
    "q_d17_schema_drift" ->
      """WITH st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(count(o_orderkey) AS DOUBLE) AS c_ok,
        |    CAST(count(o_custkey) AS DOUBLE) AS c_ck,
        |    CAST(count(o_orderstatus) AS DOUBLE) AS c_os,
        |    CAST(count(o_totalprice) AS DOUBLE) AS c_tp,
        |    CAST(count(CASE WHEN o_orderkey % 3 <> 0
        |      THEN o_orderstatus END) AS DOUBLE) AS c_os_new
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'o_custkey' AS "column", 'type_changed' AS status,
        |    'bigint' AS type_old, 'string' AS type_new,
        |    (n - c_ck) / n AS null_rate_old,
        |    (n - c_ck) / n AS null_rate_new,
        |    0.0 AS null_rate_delta
        |  FROM st
        |  UNION ALL
        |  SELECT 'o_flag', 'added', NULL, 'bigint',
        |    NULL, 0.0, NULL FROM st
        |  UNION ALL
        |  SELECT 'o_orderkey', 'kept', 'bigint', 'bigint',
        |    (n - c_ok) / n, (n - c_ok) / n, 0.0 FROM st
        |  UNION ALL
        |  SELECT 'o_orderstatus', 'kept', 'string', 'string',
        |    (n - c_os) / n, (n - c_os_new) / n,
        |    (n - c_os_new) / n - (n - c_os) / n FROM st
        |  UNION ALL
        |  SELECT 'o_totalprice', 'removed', 'double', NULL,
        |    (n - c_tp) / n, NULL, NULL FROM st)
        |ORDER BY "column"""".stripMargin,
    // Same plain sums, same fixed IEEE metric tree; MAPE excludes
    // zero labels and counts them.
    "q_f32_regression_metrics" ->
      """WITH d AS (
        |  SELECT CAST(len(regexp_split_to_array(text, '\s+'))
        |      AS DOUBLE) * 6.0 AS p,
        |    CAST(n_chars AS DOUBLE) AS y
        |  FROM documents
        |  WHERE text IS NOT NULL AND n_chars IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(abs(p - y)) / count(*) AS mae,
        |  sqrt(sum((p - y) * (p - y)) / count(*)) AS rmse,
        |  CASE WHEN sum(y * y) - sum(y) * sum(y) / count(*) > 0
        |    THEN 1.0 - sum((p - y) * (p - y))
        |      / (sum(y * y) - sum(y) * sum(y) / count(*)) END AS r2,
        |  CASE WHEN sum(CASE WHEN y <> 0 THEN 1 ELSE 0 END) > 0
        |    THEN sum(CASE WHEN y <> 0 THEN abs((p - y) / y) END)
        |      / sum(CASE WHEN y <> 0 THEN 1 ELSE 0 END) END AS mape,
        |  CAST(count(*) - sum(CASE WHEN y <> 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_mape_excluded
        |FROM d""".stripMargin,
    // One aggregate; exact epoch-MICROsecond BIGINT lag (epoch() is a
    // fractional DOUBLE and double// does not floor), integer // hours.
    "q_d20_freshness" ->
      """SELECT event_type AS "group",
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
        |  CAST((epoch_us(TIMESTAMP '2024-02-01 00:00:00')
        |    - epoch_us(max(ts))) // 3600000000 AS BIGINT) AS lag_hours,
        |  (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(max(ts)))
        |    // 3600000000 > 36 AS is_stale
        |FROM events GROUP BY event_type ORDER BY "group"""".stripMargin,
    // Same curve CTEs as f30 + F1; ties prefer the higher threshold.
    "q_f31_operating_point" ->
      """WITH g AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS score,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(count(*) AS BIGINT) AS na
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT score,
        |    CAST(sum(np) OVER (ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(sum(na) OVER (ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM g),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS p FROM g),
        |r AS (
        |  SELECT c.score, c.tp, c.cum - c.tp AS fp,
        |    CAST(c.tp AS DOUBLE) / CAST(c.cum AS DOUBLE) AS "precision",
        |    CAST(c.tp AS DOUBLE) / CAST(tot.p AS DOUBLE) AS recall
        |  FROM c, tot),
        |f AS (
        |  SELECT *, CASE WHEN "precision" + recall > 0
        |    THEN 2.0 * "precision" * recall / ("precision" + recall)
        |    ELSE 0.0 END AS f1
        |  FROM r)
        |SELECT score, tp, fp, "precision", recall, f1
        |FROM f ORDER BY f1 DESC, score DESC LIMIT 1""".stripMargin,
    // Per-day counts both sides, FULL OUTER with zero coalesce, exact
    // integer tolerance cross-multiplication.
    "q_d19_reconcile" ->
      """WITH s AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS key,
        |    CAST(count(*) AS BIGINT) AS n_src
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS key,
        |    CAST(count(*) AS BIGINT) AS n_dst
        |  FROM lineitem WHERE l_orderkey % 97 <> 0 GROUP BY 1)
        |SELECT coalesce(s.key, d.key) AS key,
        |  coalesce(s.n_src, 0) AS n_src,
        |  coalesce(d.n_dst, 0) AS n_dst,
        |  coalesce(d.n_dst, 0) - coalesce(s.n_src, 0) AS diff,
        |  CASE WHEN coalesce(s.n_src, 0) > 0
        |    THEN CAST(abs(coalesce(d.n_dst, 0) - coalesce(s.n_src, 0))
        |      AS DOUBLE) / CAST(s.n_src AS DOUBLE) END AS rel_diff,
        |  abs(coalesce(d.n_dst, 0) - coalesce(s.n_src, 0)) * 100
        |      <= coalesce(s.n_src, 0) * 1
        |    OR coalesce(d.n_dst, 0) = coalesce(s.n_src, 0) AS passed
        |FROM s FULL OUTER JOIN d ON d.key = s.key
        |ORDER BY key""".stripMargin,
    // One group + one aggregate; NULL keys count as key values.
    "q_d18_uniqueness" ->
      """WITH k AS (
        |  SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_keys,
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_dup_rows,
        |  CAST(max(n) AS BIGINT) AS max_multiplicity,
        |  sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0 AS is_unique
        |FROM k""".stripMargin,
    // Same rational rank ((10-1)*(n+1)+9) div 10 over the ordered
    // calibration residuals, same fixed IEEE interval arithmetic.
    "q_f29_conformal" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE)
        |      * 6.0 AS pred
        |  FROM documents),
        |res AS (
        |  SELECT abs(CAST(n_chars AS DOUBLE) - pred) AS r FROM d
        |  WHERE doc_id % 2 = 0),
        |rk AS (SELECT r, row_number() OVER (ORDER BY r) AS rn,
        |              count(*) OVER () AS n
        |       FROM res),
        |q AS (SELECT r AS qhat FROM rk
        |      WHERE rn = (9 * (n + 1) + 9) // 10)
        |SELECT d.doc_id AS id, d.pred AS pred, q.qhat,
        |  d.pred - q.qhat AS lo, d.pred + q.qhat AS hi
        |FROM d, q WHERE d.doc_id % 2 = 1
        |ORDER BY id""".stripMargin,
    // Exact integer counts, fixed IEEE divisions, (count desc, key)
    // total order for the top-k.
    "q_x126_key_skew" ->
      """WITH c AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |              CAST(sum(n) AS BIGINT) AS n_rows,
        |              CAST(max(n) AS BIGINT) AS mx
        |       FROM c),
        |top AS (SELECT key, CAST(n AS BIGINT) AS n,
        |          CAST(row_number() OVER (ORDER BY n DESC, key)
        |            AS BIGINT) AS rank
        |        FROM c ORDER BY n DESC, key LIMIT 10)
        |SELECT t.rank, t.key, t.n,
        |  CAST(t.n AS DOUBLE) / CAST(st.n_rows AS DOUBLE) AS share,
        |  CAST(t.n AS DOUBLE) * CAST(st.n_keys AS DOUBLE)
        |    / CAST(st.n_rows AS DOUBLE) AS x_mean,
        |  st.n_keys, st.n_rows,
        |  CAST(st.mx AS DOUBLE) * CAST(st.n_keys AS DOUBLE)
        |    / CAST(st.n_rows AS DOUBLE) AS skew_factor
        |FROM top t, st ORDER BY t.rank""".stripMargin,
    // generate_series spine between observed min/max, anti-joined
    // against observed distinct days.
    "q_d16_missing_partitions" ->
      """WITH obs AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        |  WHERE ts IS NOT NULL AND day(ts) % 5 <> 0),
        |mm AS (SELECT min(day) AS mn, max(day) AS mx FROM obs),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM mm)
        |SELECT strftime(s.day, '%Y-%m-%d') AS missing_day
        |FROM spine s LEFT JOIN obs o ON o.day = s.day
        |WHERE o.day IS NULL
        |ORDER BY missing_day""".stripMargin,
    // Same md5-uniform, same Poisson thresholds, same (mean, replica)
    // rank order, ranks 3 and 98 of 100.
    "q_f20_bootstrap_ci" ->
      s"""WITH units AS (
         |  SELECT user_id, sum(value) AS x FROM events
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |con AS (
         |  SELECT x, o AS b,
         |    md5('boot' || ':' || (CAST(user_id AS VARCHAR) || '#' ||
         |      CAST(o AS VARCHAR))) AS m
         |  FROM units, range(0, 100) AS r(o)),
         |hw AS (
         |  SELECT x, b,
         |    (${hexDigitSum(1, 8)}) / 4294967296.0 AS h
         |  FROM con),
         |wts AS (SELECT x, b, $poissonW AS w FROM hw),
         |means AS (
         |  SELECT b, sum(w * x) / sum(w) AS mn FROM wts GROUP BY b
         |  HAVING sum(w) > 0),
         |ranked AS (
         |  SELECT mn, CAST(row_number() OVER (ORDER BY mn, b)
         |    AS BIGINT) AS rnk
         |  FROM means),
         |pt AS (SELECT avg(x) AS point_est,
         |  CAST(count(*) AS BIGINT) AS n_units FROM units)
         |SELECT n_units, 100 AS replicas,
         |  floor(point_est * 1000000.0 + 0.5) / 1000000.0 AS point_est,
         |  floor((SELECT mn FROM ranked WHERE rnk = 3)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
         |  floor((SELECT mn FROM ranked WHERE rnk = 98)
         |    * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
         |FROM pt""".stripMargin,
    // Same integer rank arithmetic: r = (num*n + den - 1) // den.
    "q_x111_group_quantiles" ->
      """WITH ranked AS (
        |  SELECT source, n_chars AS value, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rank,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT * FROM (VALUES (1, 4, 'p25'), (1, 2, 'p50'),
        |      (3, 4, 'p75'), (9, 10, 'p90')) AS q(num, den, label))
        |SELECT source, label AS quantile, n, rank, value
        |FROM ranked JOIN g ON rank = (num * n + den - 1) // den
        |ORDER BY source, quantile""".stripMargin,
    // Independent derivation: placements by explicit pos x neg pair
    // aggregation (affordable at oracle scale), HUGEINT moment sums,
    // then the IDENTICAL literal division/sqrt tree.
    "q_f73_delong" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y,
        |    CAST(doc_id * 37 % 1000 +
        |      CASE WHEN doc_id % 3 = 0 THEN 200 ELSE 0 END
        |      AS DOUBLE) AS sa,
        |    CAST(doc_id * 53 % 1000 +
        |      CASE WHEN doc_id % 3 = 0 THEN 150 ELSE 0 END
        |      AS DOUBLE) AS sb
        |  FROM documents),
        |p AS (SELECT * FROM s WHERE y = 1),
        |ng AS (SELECT * FROM s WHERE y = 0),
        |v10 AS (
        |  SELECT p.doc_id,
        |    CAST(sum(CASE WHEN ng.sa < p.sa THEN 2
        |      WHEN ng.sa = p.sa THEN 1 ELSE 0 END) AS HUGEINT) AS na,
        |    CAST(sum(CASE WHEN ng.sb < p.sb THEN 2
        |      WHEN ng.sb = p.sb THEN 1 ELSE 0 END) AS HUGEINT) AS nb
        |  FROM p, ng GROUP BY 1),
        |v01 AS (
        |  SELECT ng.doc_id,
        |    CAST(sum(CASE WHEN p.sa > ng.sa THEN 2
        |      WHEN p.sa = ng.sa THEN 1 ELSE 0 END) AS HUGEINT) AS na,
        |    CAST(sum(CASE WHEN p.sb > ng.sb THEN 2
        |      WHEN p.sb = ng.sb THEN 1 ELSE 0 END) AS HUGEINT) AS nb
        |  FROM ng, p GROUP BY 1),
        |m10 AS (SELECT CAST(count(*) AS HUGEINT) AS m,
        |    sum(na) AS sa10, sum(nb) AS sb10, sum(na * na) AS saa,
        |    sum(nb * nb) AS sbb, sum(na * nb) AS sab FROM v10),
        |m01 AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(na) AS sa01, sum(nb) AS sb01, sum(na * na) AS saa,
        |    sum(nb * nb) AS sbb, sum(na * nb) AS sab FROM v01),
        |final AS (
        |  SELECT m10.m, m01.n,
        |    CAST(m10.m AS DOUBLE) AS md, CAST(m01.n AS DOUBLE) AS nd,
        |    CAST(m10.sa10 AS DOUBLE) AS sa10d,
        |    CAST(m10.sb10 AS DOUBLE) AS sb10d,
        |    CAST(m10.m * (m10.saa + m10.sbb - 2 * m10.sab) -
        |      (m10.sa10 - m10.sb10) * (m10.sa10 - m10.sb10)
        |      AS DOUBLE) AS d10,
        |    CAST(m01.n * (m01.saa + m01.sbb - 2 * m01.sab) -
        |      (m01.sa01 - m01.sb01) * (m01.sa01 - m01.sb01)
        |      AS DOUBLE) AS d01
        |  FROM m10, m01)
        |SELECT CAST(m AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
        |  sa10d / (2.0 * md * nd) AS auc_a,
        |  sb10d / (2.0 * md * nd) AS auc_b,
        |  sa10d / (2.0 * md * nd) - sb10d / (2.0 * md * nd)
        |    AS delta_auc,
        |  CASE WHEN m >= 2 AND n >= 2 THEN
        |    d10 / (4.0 * nd * nd * md * md * (md - 1.0)) +
        |    d01 / (4.0 * md * md * nd * nd * (nd - 1.0)) END
        |    AS var_delta,
        |  CASE WHEN m >= 2 AND n >= 2 AND
        |    d10 / (4.0 * nd * nd * md * md * (md - 1.0)) +
        |    d01 / (4.0 * md * md * nd * nd * (nd - 1.0)) > 0 THEN
        |    (sa10d / (2.0 * md * nd) - sb10d / (2.0 * md * nd)) /
        |    sqrt(d10 / (4.0 * nd * nd * md * md * (md - 1.0)) +
        |      d01 / (4.0 * md * md * nd * nd * (nd - 1.0))) END AS z
        |FROM final""".stripMargin,
    // Same distinct-score groups, same doubled rank-sum numerator
    // (avg ranks over ties), same single division.
    "q_f22_auc" ->
      """WITH s AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT sc, CAST(sum(y) AS BIGINT) AS np,
        |    CAST(sum(1 - y) AS BIGINT) AS nn
        |  FROM s GROUP BY sc),
        |c AS (
        |  SELECT *, CAST(sum(np + nn) OVER (ORDER BY sc
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM g),
        |a AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS tp,
        |    CAST(sum(nn) AS BIGINT) AS tn,
        |    CAST(sum(np * (2 * (cum - np - nn) + np + nn + 1))
        |      AS BIGINT) AS num
        |  FROM c)
        |SELECT tp AS n_pos, tn AS n_neg,
        |  CASE WHEN tp > 0 AND tn > 0
        |    THEN CAST(num - tp * (tp + 1) AS DOUBLE)
        |      / (2.0 * CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)) END
        |    AS auc
        |FROM a""".stripMargin,
    // Cliff's delta: same distinct-score kernel; HUGEINT pair
    // products mirror the DECIMAL carries; lt via the tp*tn - le
    // identity; one raw division.
    "q_f77_cliffs_delta" ->
      """WITH s AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT sc, CAST(sum(y) AS BIGINT) AS np,
        |    CAST(sum(1 - y) AS BIGINT) AS nn
        |  FROM s GROUP BY sc),
        |c AS (
        |  SELECT *, CAST(sum(nn) OVER (ORDER BY sc
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumnn
        |  FROM g),
        |a AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS tp,
        |    CAST(sum(nn) AS BIGINT) AS tn,
        |    sum(CAST(np AS HUGEINT) * CAST(cumnn - nn AS HUGEINT))
        |      AS gt,
        |    sum(CAST(np AS HUGEINT) * CAST(cumnn AS HUGEINT)) AS le
        |  FROM c)
        |SELECT tp AS n_pos, tn AS n_neg, CAST(gt AS BIGINT) AS gt,
        |  CAST(CAST(tp AS HUGEINT) * CAST(tn AS HUGEINT) - le
        |    AS BIGINT) AS lt,
        |  CASE WHEN tp > 0 AND tn > 0 THEN
        |    CAST(gt - (CAST(tp AS HUGEINT) * CAST(tn AS HUGEINT) - le)
        |      AS DOUBLE)
        |    / (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)) END AS delta
        |FROM a""".stripMargin,
    // Wasserstein: same 1e-6 value grid, window-cumsum + lead mirror
    // of the prefix-sum + rank-adjacency join, HUGEINT gap mass, one
    // final division, q6.
    "q_d26_wasserstein" ->
      """WITH pooled AS (
        |  SELECT CAST(floor(CAST(n_chars AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS v,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS r,
        |    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS c
        |  FROM documents WHERE n_chars IS NOT NULL),
        |p AS (SELECT v, CAST(sum(r) AS BIGINT) AS nr,
        |    CAST(sum(c) AS BIGINT) AS nc
        |  FROM pooled GROUP BY 1),
        |tot AS (SELECT CAST(sum(nr) AS BIGINT) AS na,
        |    CAST(sum(nc) AS BIGINT) AS nb FROM p),
        |cum AS (SELECT *,
        |    CAST(sum(nr) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cnr,
        |    CAST(sum(nc) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cnc,
        |    lead(v) OVER (ORDER BY v) AS nxt
        |  FROM p)
        |SELECT (SELECT na FROM tot) AS n_ref,
        |  (SELECT nb FROM tot) AS n_cur,
        |  floor(CAST(coalesce(sum(
        |      abs(CAST(cnr AS HUGEINT) * (SELECT nb FROM tot)
        |        - CAST(cnc AS HUGEINT) * (SELECT na FROM tot))
        |      * CAST(nxt - v AS HUGEINT)), CAST(0 AS HUGEINT))
        |      AS DOUBLE)
        |    / (CAST((SELECT na FROM tot) AS DOUBLE)
        |      * CAST((SELECT nb FROM tot) AS DOUBLE) * 1000000.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS w1
        |FROM cum WHERE nxt IS NOT NULL""".stripMargin,
    // JSD: same 1e-6 value grid as Wasserstein; the per-value term's
    // IEEE tree is mirrored verbatim (one division per share,
    // m = (p+q)/2, ln of one division), floor-scaled to a 1e12 BIGINT
    // so the sum is order-free, halved once, q6.
    "q_d34_jsd" ->
      """WITH pooled AS (
        |  SELECT CAST(floor(CAST(n_chars AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS v,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS r,
        |    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS c
        |  FROM documents WHERE n_chars IS NOT NULL),
        |p AS (SELECT v, CAST(sum(r) AS BIGINT) AS nr,
        |    CAST(sum(c) AS BIGINT) AS nc
        |  FROM pooled GROUP BY 1),
        |tot AS (SELECT CAST(sum(nr) AS BIGINT) AS na,
        |    CAST(sum(nc) AS BIGINT) AS nb FROM p),
        |sh AS (SELECT nr, nc,
        |    CAST(nr AS DOUBLE) / CAST((SELECT na FROM tot) AS DOUBLE)
        |      AS pp,
        |    CAST(nc AS DOUBLE) / CAST((SELECT nb FROM tot) AS DOUBLE)
        |      AS qq
        |  FROM p),
        |terms AS (
        |  SELECT CAST(floor((
        |      CASE WHEN nr > 0 THEN pp * ln(pp / ((pp + qq) / 2.0))
        |        ELSE 0.0 END
        |      + CASE WHEN nc > 0 THEN qq * ln(qq / ((pp + qq) / 2.0))
        |        ELSE 0.0 END) * 1000000000000.0 + 0.5) AS BIGINT) AS t
        |  FROM sh)
        |SELECT (SELECT na FROM tot) AS n_ref,
        |  (SELECT nb FROM tot) AS n_cur,
        |  floor(0.5 * (CAST(coalesce(sum(CAST(t AS HUGEINT)),
        |      CAST(0 AS HUGEINT)) AS DOUBLE) / 1000000000000.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS jsd
        |FROM terms""".stripMargin,
    // QQ drift: same ceil-rank picks ((i*n + bins - 1) // bins) in the
    // same (value, id) order on both sides; raw element values.
    "q_d27_qq_drift" ->
      """WITH r AS (SELECT CAST(n_chars AS DOUBLE) AS v, doc_id
        |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
        |rr AS (SELECT v,
        |    CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT)
        |      AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS n FROM r),
        |c AS (SELECT CAST(n_chars AS DOUBLE) AS v, doc_id
        |  FROM documents
        |  WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
        |cc AS (SELECT v,
        |    CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT)
        |      AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS n FROM c),
        |idx AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS i),
        |re AS (SELECT idx.i, rr.v FROM idx JOIN rr
        |  ON rr.rk = (idx.i * rr.n + 9) // 10),
        |ce AS (SELECT idx.i, cc.v FROM idx JOIN cc
        |  ON cc.rk = (idx.i * cc.n + 9) // 10)
        |SELECT re.i AS quantile_idx,
        |  floor(CAST(re.i AS DOUBLE) / 10 * 1000000.0 + 0.5)
        |    / 1000000.0 AS level,
        |  re.v AS q_ref, ce.v AS q_cur, ce.v - re.v AS diff
        |FROM re JOIN ce ON ce.i = re.i
        |ORDER BY quantile_idx""".stripMargin,
    // HBOS: same broadcast min/max bin edges, exact histogram counts,
    // identical 1e9-scaled ln terms summed per doc, q6.
    "q_x177_hbos" ->
      """WITH f AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS f0,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+'))
        |      AS DOUBLE) AS f1
        |  FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    min(f0) AS mn0, max(f0) AS mx0,
        |    min(f1) AS mn1, max(f1) AS mx1 FROM f),
        |b AS (SELECT doc_id,
        |    CASE WHEN (st.mx0 - st.mn0) / 10 = 0 THEN CAST(0 AS BIGINT)
        |      ELSE least(CAST(floor((f.f0 - st.mn0)
        |        / ((st.mx0 - st.mn0) / 10)) AS BIGINT), 9) END AS b0,
        |    CASE WHEN (st.mx1 - st.mn1) / 10 = 0 THEN CAST(0 AS BIGINT)
        |      ELSE least(CAST(floor((f.f1 - st.mn1)
        |        / ((st.mx1 - st.mn1) / 10)) AS BIGINT), 9) END AS b1
        |  FROM f CROSS JOIN st),
        |h0 AS (SELECT b0, CAST(count(*) AS BIGINT) AS c
        |       FROM b GROUP BY 1),
        |h1 AS (SELECT b1, CAST(count(*) AS BIGINT) AS c
        |       FROM b GROUP BY 1)
        |SELECT b.doc_id,
        |  floor(CAST(
        |      CAST(floor(ln(CAST((SELECT n FROM st) AS DOUBLE)
        |          / CAST(h0.c AS DOUBLE)) * 1000000000.0 + 0.5)
        |        AS BIGINT)
        |      + CAST(floor(ln(CAST((SELECT n FROM st) AS DOUBLE)
        |          / CAST(h1.c AS DOUBLE)) * 1000000000.0 + 0.5)
        |        AS BIGINT) AS DOUBLE)
        |    / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS hbos
        |FROM b JOIN h0 ON h0.b0 = b.b0 JOIN h1 ON h1.b1 = b.b1
        |ORDER BY b.doc_id""".stripMargin,
    // Noisy counts: same md5 uniform ((h+0.5)/2^32 — exact dyadic),
    // same inverse-CDF tree, q6 on both sides.
    "q_x175_noisy_counts" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |hx AS (SELECT lang, n, md5('dp|rel1:' || lang) AS m FROM c),
        |u AS (SELECT lang, n,
        |    (CAST(${hexDigitSum(1, 8)} AS DOUBLE) + 0.5)
        |      / 4294967296.0 AS u
        |  FROM hx)
        |SELECT lang, n, 2.0 AS b,
        |  floor((CAST(n AS DOUBLE) + (-2.0)
        |      * (CASE WHEN u - 0.5 > 0 THEN 1.0 ELSE -1.0 END)
        |      * ln(1.0 - 2.0 * abs(u - 0.5)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS noisy_n
        |FROM u ORDER BY lang""".stripMargin,
    // Jonckheere: same per-group distinct-value counts, window cumsum
    // mirror of the prefix sums, identical doubled pairwise terms in
    // HUGEINT, the literal moment trees, q6 z.
    "q_f78_jonckheere" ->
      """WITH s AS (SELECT CAST(doc_id % 4 AS BIGINT) AS g,
        |    n_chars AS v FROM documents
        |  WHERE n_chars IS NOT NULL),
        |c AS (SELECT v,
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n3
        |  FROM s GROUP BY 1),
        |r AS (SELECT *,
        |    CAST(sum(n0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c0,
        |    CAST(sum(n1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c1,
        |    CAST(sum(n2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c2
        |  FROM c),
        |a AS (SELECT
        |    coalesce(sum(
        |      CAST(n1 AS HUGEINT) * (2 * (c0 - n0) + n0) +
        |      CAST(n2 AS HUGEINT) * (2 * (c0 - n0) + n0) +
        |      CAST(n3 AS HUGEINT) * (2 * (c0 - n0) + n0) +
        |      CAST(n2 AS HUGEINT) * (2 * (c1 - n1) + n1) +
        |      CAST(n3 AS HUGEINT) * (2 * (c1 - n1) + n1) +
        |      CAST(n3 AS HUGEINT) * (2 * (c2 - n2) + n2)),
        |      CAST(0 AS HUGEINT)) AS j2,
        |    CAST(sum(n0) AS BIGINT) AS t0,
        |    CAST(sum(n1) AS BIGINT) AS t1,
        |    CAST(sum(n2) AS BIGINT) AS t2,
        |    CAST(sum(n3) AS BIGINT) AS t3
        |  FROM r),
        |m AS (SELECT j2, t0 + t1 + t2 + t3 AS n,
        |    CAST(t0 + t1 + t2 + t3 AS DOUBLE) AS nd,
        |    CAST(CAST(t0 AS HUGEINT) * t0 + CAST(t1 AS HUGEINT) * t1
        |      + CAST(t2 AS HUGEINT) * t2 + CAST(t3 AS HUGEINT) * t3
        |      AS DOUBLE) AS ss,
        |    CAST(CAST(t0 AS HUGEINT) * t0 * (2 * t0 + 3)
        |      + CAST(t1 AS HUGEINT) * t1 * (2 * t1 + 3)
        |      + CAST(t2 AS HUGEINT) * t2 * (2 * t2 + 3)
        |      + CAST(t3 AS HUGEINT) * t3 * (2 * t3 + 3) AS DOUBLE)
        |      AS ss23
        |  FROM a)
        |SELECT n, CAST(4 AS BIGINT) AS k, CAST(j2 AS BIGINT) AS j2,
        |  CASE WHEN (nd * nd * (2.0 * nd + 3.0) - ss23) / 72.0 > 0
        |    THEN floor((CAST(j2 AS DOUBLE) - (nd * nd - ss) / 2.0)
        |      / (2.0 * sqrt((nd * nd * (2.0 * nd + 3.0) - ss23)
        |        / 72.0)) * 1000000.0 + 0.5) / 1000000.0 END AS z
        |FROM m""".stripMargin,
    // Cochran's Q: exact integer G/L2 sums in HUGEINT, the literal
    // (k-1)(k*sumG2 - T^2) / (kT - sumL2) tree, NULL-aware cut.
    "q_f76_cochran_q" ->
      """WITH s AS (SELECT
        |    CASE WHEN (doc_id * 37) % 100 < 70 THEN 1 ELSE 0 END AS o1,
        |    CASE WHEN (doc_id * 53) % 100 < 65 THEN 1 ELSE 0 END AS o2,
        |    CASE WHEN (doc_id * 71) % 100 < 60 THEN 1 ELSE 0 END AS o3
        |  FROM documents),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST((o1 + o2 + o3) * (o1 + o2 + o3) AS HUGEINT))
        |      AS l2,
        |    CAST(sum(o1) AS BIGINT) AS g1,
        |    CAST(sum(o2) AS BIGINT) AS g2,
        |    CAST(sum(o3) AS BIGINT) AS g3
        |  FROM s),
        |b AS (SELECT n, g1 + g2 + g3 AS t,
        |    CASE WHEN 3 * CAST(g1 + g2 + g3 AS HUGEINT) - l2 > 0 THEN
        |      CAST(2 * (3 * (CAST(g1 AS HUGEINT) * g1
        |          + CAST(g2 AS HUGEINT) * g2
        |          + CAST(g3 AS HUGEINT) * g3)
        |        - CAST(g1 + g2 + g3 AS HUGEINT)
        |          * CAST(g1 + g2 + g3 AS HUGEINT)) AS DOUBLE)
        |      / CAST(3 * CAST(g1 + g2 + g3 AS HUGEINT) - l2 AS DOUBLE)
        |      END AS q
        |  FROM a)
        |SELECT n, 3 AS k, t, q,
        |  CASE WHEN q IS NULL THEN NULL
        |    WHEN q > 5.991 THEN 1 ELSE 0 END AS significant
        |FROM b""".stripMargin,
    // Same distinct-weight groups, same rank-set invariant doubled
    // rank-weight sum, HUGEINT mirror of the DECIMAL(38,0) carries.
    "q_x117_gini" ->
      """WITH g AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT *, CAST(sum(c) OVER (ORDER BY x
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM g),
        |a AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(x * c AS HUGEINT)) AS t,
        |    sum(CAST(x * (2 * c * (cum - c) + c * (c + 1))
        |      AS HUGEINT)) AS twos
        |  FROM r)
        |SELECT n, CAST(t AS BIGINT) AS total,
        |  CASE WHEN t > 0 AND n >= 2
        |    THEN CAST(twos - (n + 1) * t AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) END AS gini
        |FROM a""".stripMargin,
    // Native ntile over the same (score desc, id) order (the computed
    // ntileOf is spec-proven equal), exact counts, same rate/lift
    // expressions.
    "q_f28_lift_table" ->
      """WITH base AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, doc_id
        |  FROM documents),
        |b AS (
        |  SELECT CAST(ntile(10) OVER (ORDER BY s DESC, doc_id)
        |    AS BIGINT) AS bucket, y
        |  FROM base),
        |per AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
        |        CAST(sum(n) AS BIGINT) AS nn FROM per),
        |c AS (
        |  SELECT *, CAST(sum(n_pos) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |  FROM per)
        |SELECT bucket, n, n_pos,
        |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
        |  cum_pos,
        |  CASE WHEN (SELECT tp FROM t) > 0
        |    THEN CAST(cum_pos AS DOUBLE)
        |      / CAST((SELECT tp FROM t) AS DOUBLE) END AS capture,
        |  CASE WHEN (SELECT tp FROM t) > 0
        |    THEN (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST((SELECT tp FROM t) AS DOUBLE)
        |        / CAST((SELECT nn FROM t) AS DOUBLE)) END AS lift
        |FROM c ORDER BY bucket""".stripMargin,
    // Same grouped rank-sum as f22 with the cumulation window
    // partitioned by source; integer arithmetic to one division.
    "q_f67_group_auc" ->
      """WITH s AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT source, sc, CAST(sum(y) AS BIGINT) AS np,
        |    CAST(sum(1 - y) AS BIGINT) AS nn
        |  FROM s GROUP BY source, sc),
        |c AS (
        |  SELECT *, CAST(sum(np + nn) OVER (PARTITION BY source
        |    ORDER BY sc ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM g),
        |a AS (
        |  SELECT source, CAST(sum(np) AS BIGINT) AS tp,
        |    CAST(sum(nn) AS BIGINT) AS tn,
        |    CAST(sum(np * (2 * (cum - np - nn) + np + nn + 1))
        |      AS BIGINT) AS num
        |  FROM c GROUP BY source)
        |SELECT source, tp AS n_pos, tn AS n_neg,
        |  CASE WHEN tp > 0 AND tn > 0
        |    THEN CAST(num - tp * (tp + 1) AS DOUBLE)
        |      / (2.0 * CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)) END
        |    AS auc
        |FROM a ORDER BY source""".stripMargin,
    // Same exact confusion cells per source, same overall/max-rate
    // broadcast terms, identical quantized single divisions.
    "q_f68_fairness" ->
      """WITH b AS (
        |  SELECT source AS grp,
        |    CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS p,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |cells AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS sel,
        |    CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM b GROUP BY grp),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(sel) AS BIGINT) AS st,
        |    CAST(sum(pos) AS BIGINT) AS pt,
        |    CAST(sum(tp) AS BIGINT) AS tpt,
        |    CAST(sum(fp) AS BIGINT) AS fpt,
        |    max(CAST(sel AS DOUBLE) / CAST(n AS DOUBLE)) AS max_sel
        |  FROM cells)
        |SELECT grp AS "group", n, pos AS n_pos_label,
        |  floor(CAST(sel AS DOUBLE) / CAST(n AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS sel_rate,
        |  floor(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS base_rate,
        |  CASE WHEN pos > 0 THEN floor(CAST(tp AS DOUBLE)
        |    / CAST(pos AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END
        |    AS tpr,
        |  CASE WHEN n - pos > 0 THEN floor(CAST(fp AS DOUBLE)
        |    / CAST(n - pos AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END
        |    AS fpr,
        |  floor((CAST(sel AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS parity_gap,
        |  CASE WHEN t.max_sel > 0 THEN floor(
        |    (CAST(sel AS DOUBLE) / CAST(n AS DOUBLE)) / t.max_sel
        |    * 1000000.0 + 0.5) / 1000000.0 END AS di_ratio,
        |  CASE WHEN pos > 0 AND t.pt > 0 THEN floor(
        |    (CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE)
        |      - CAST(t.tpt AS DOUBLE) / CAST(t.pt AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 END AS tpr_gap,
        |  CASE WHEN n - pos > 0 AND t.nt - t.pt > 0 THEN floor(
        |    (CAST(fp AS DOUBLE) / CAST(n - pos AS DOUBLE)
        |      - CAST(t.fpt AS DOUBLE) / CAST(t.nt - t.pt AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 END AS fpr_gap
        |FROM cells, tot t ORDER BY "group"""".stripMargin,
    // Group-partitioned cumulation, per-group n, same IEEE
    // ceil((n+1)(1-alpha)) and min-score-with-cum>=k order statistics.
    "q_f71_group_conformal" ->
      """WITH s AS (
        |  SELECT source AS grp, CAST(n_chars AS DOUBLE) AS sc
        |  FROM documents WHERE doc_id % 2 = 0),
        |g AS (SELECT grp, sc, CAST(count(*) AS BIGINT) AS c
        |      FROM s GROUP BY grp, sc),
        |cum AS (
        |  SELECT *, CAST(sum(c) OVER (PARTITION BY grp ORDER BY sc
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
        |  FROM g),
        |pg AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n
        |       FROM g GROUP BY grp),
        |grid AS (
        |  SELECT pg.grp, CAST(a.alpha AS DOUBLE) AS alpha, pg.n,
        |    CAST(ceil((CAST(pg.n AS DOUBLE) + 1.0)
        |      * (CAST(1 AS DOUBLE) - CAST(a.alpha AS DOUBLE)))
        |      AS BIGINT) AS k
        |  FROM pg, (VALUES (0.05), (0.1), (0.2)) AS a(alpha)),
        |hit AS (
        |  SELECT g.grp, g.alpha, g.n, g.k, min(cum.sc) AS threshold,
        |    CAST(min(cum.cm) AS BIGINT) AS cm
        |  FROM grid g JOIN cum ON cum.grp = g.grp AND cum.cm >= g.k
        |  GROUP BY g.grp, g.alpha, g.n, g.k)
        |SELECT g.grp AS "group", g.alpha, g.n, g.k,
        |  CASE WHEN g.k <= g.n THEN h.threshold END AS threshold,
        |  CASE WHEN g.k <= g.n THEN
        |    floor(CAST(h.cm AS DOUBLE) / CAST(g.n AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS emp_coverage
        |FROM grid g LEFT JOIN hit h
        |  ON g.grp = h.grp AND g.alpha = h.alpha AND g.k = h.k
        |ORDER BY g.grp, g.alpha""".stripMargin,
    // Same distinct-score cumulation and ceil((n+1)(1-alpha)) order
    // statistics; the k-th value is the min score with cum >= k.
    "q_f69_conformal" ->
      """WITH s AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS sc FROM documents
        |  WHERE doc_id % 2 = 0),
        |g AS (SELECT sc, CAST(count(*) AS BIGINT) AS c
        |      FROM s GROUP BY sc),
        |cum AS (
        |  SELECT *, CAST(sum(c) OVER (ORDER BY sc
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
        |  FROM g),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
        |grid AS (
        |  -- alpha and the (n+1)(1-alpha) product forced to DOUBLE: the
        |  -- Spark side runs IEEE doubles (40 * 0.95 = 38.000000000000004
        |  -- -> ceil 39); DuckDB DECIMAL literals would ceil the exact 38
        |  SELECT CAST(a.alpha AS DOUBLE) AS alpha, n.n,
        |    CAST(ceil(CAST(n.n + 1 AS DOUBLE)
        |      * (CAST(1 AS DOUBLE) - CAST(a.alpha AS DOUBLE)))
        |      AS BIGINT) AS k
        |  FROM (VALUES (0.01), (0.05), (0.1), (0.2)) AS a(alpha), n),
        |hit AS (
        |  SELECT g.alpha, g.n, g.k, min(cum.sc) AS threshold,
        |    CAST(min(cum.cm) AS BIGINT) AS cm
        |  FROM grid g JOIN cum ON cum.cm >= g.k
        |  GROUP BY g.alpha, g.n, g.k)
        |SELECT g.alpha, g.n, g.k,
        |  CASE WHEN g.k <= g.n THEN h.threshold END AS threshold,
        |  CASE WHEN g.k <= g.n THEN
        |    floor(CAST(h.cm AS DOUBLE) / CAST(g.n AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS emp_coverage
        |FROM grid g LEFT JOIN hit h
        |  ON g.alpha = h.alpha AND g.k = h.k
        |ORDER BY g.alpha""".stripMargin,
    // The X119 split CTE rolled up to per-(split, stratum) shares.
    "q_x125_split_balance" ->
      s"""WITH u AS (
         |  SELECT doc_id, source,
         |    md5('split:' || CAST(doc_id AS VARCHAR)) AS m
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY (${hexDigitSum(1, 8)}), doc_id) AS BIGINT) AS r,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM u),
         |sp AS (
         |  SELECT doc_id, source AS stratum,
         |    CASE WHEN r * 10 <= 8 * n THEN 'train'
         |         WHEN r * 10 <= 9 * n THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM r),
         |per AS (SELECT split, stratum, CAST(count(*) AS BIGINT) AS n
         |        FROM sp GROUP BY 1, 2),
         |t AS (SELECT split, CAST(count(*) AS BIGINT) AS tt
         |      FROM sp GROUP BY 1)
         |SELECT per.split, per.stratum, per.n,
         |  CAST(per.n AS DOUBLE) / CAST(t.tt AS DOUBLE) AS share
         |FROM per JOIN t ON t.split = per.split
         |ORDER BY per.split, per.stratum""".stripMargin,
    // Same X111 integer-rank cuts, same exact clamp.
    "q_x124_winsorize" ->
      """WITH base AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS value, doc_id
        |  FROM documents),
        |rv AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY value, doc_id) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM base),
        |lo AS (SELECT source AS g, value AS lo_cut FROM rv
        |       WHERE r = (1 * n + 9) // 10),
        |hi AS (SELECT source AS g, value AS hi_cut FROM rv
        |       WHERE r = (9 * n + 9) // 10)
        |SELECT b.source, b.doc_id AS id, b.value, lo.lo_cut, hi.hi_cut,
        |  least(greatest(b.value, lo.lo_cut), hi.hi_cut) AS winsorized
        |FROM base b
        |JOIN lo ON lo.g = b.source
        |JOIN hi ON hi.g = b.source
        |ORDER BY b.source, id""".stripMargin,
    // Same daily counts through the D12 integer-rank median/MAD chain.
    "q_d15_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT event_type, CAST(n AS DOUBLE) AS value, day
        |         FROM daily),
        |rv AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, day) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        |  FROM base),
        |med AS (SELECT event_type AS g, value AS med FROM rv
        |        WHERE r = (nn + 1) // 2),
        |dev AS (
        |  SELECT b.event_type, b.day, b.value, m.med,
        |    abs(b.value - m.med) AS d
        |  FROM base b JOIN med m ON m.g = b.event_type),
        |rd AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY d, day) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        |  FROM dev),
        |mad AS (SELECT event_type AS g, d AS mad FROM rd
        |        WHERE r = (nn + 1) // 2)
        |SELECT dev.event_type, strftime(dev.day, '%Y-%m-%d') AS id,
        |  dev.value, dev.med, mad.mad,
        |  CAST(dev.d > 3.0 * mad.mad AS INTEGER) AS is_outlier
        |FROM dev JOIN mad ON mad.g = dev.event_type
        |ORDER BY dev.event_type, id""".stripMargin,
    // Same one-pass group-size sums per k.
    // Distinct pre-aggregate on (source, lang), group rollup, per-l
    // sums — the d14 shape with the sensitive-distinct count inside.
    "q_d24_l_diversity" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(c) AS BIGINT) AS n
        |  FROM cells GROUP BY 1),
        |per AS (
        |  SELECT l.l, CAST(sum(g.n) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(CASE WHEN g.nd < l.l THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_low_groups,
        |    CAST(sum(CASE WHEN g.nd < l.l THEN g.n ELSE 0 END)
        |      AS BIGINT) AS n_rows_at_risk
        |  FROM (VALUES (2), (3)) AS l(l), g
        |  GROUP BY l.l)
        |SELECT l, n_rows, n_groups, n_low_groups, n_rows_at_risk,
        |  CASE WHEN n_rows > 0 THEN CAST(n_rows_at_risk AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) END AS risk_rate
        |FROM per ORDER BY l""".stripMargin,
    // Same ordered-EMD construction: exact HUGEINT cumulative-gap
    // numerators |N*cum_g - n*cum_N| over the group x value grid, one
    // division per group, identical threshold census.
    "q_d25_t_closeness" ->
      """WITH base AS (
        |  SELECT c_nationkey AS q1, c_mktsegment AS q2,
        |    (CAST(c_acctbal * 100 AS BIGINT) + 100000) // 200000 AS s
        |  FROM customer),
        |nulls AS (SELECT CAST(sum(CASE WHEN s IS NULL THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_null_rows FROM base),
        |cells AS (
        |  SELECT q1, q2, s, CAST(count(*) AS BIGINT) AS c
        |  FROM base WHERE s IS NOT NULL GROUP BY 1, 2, 3),
        |vals AS (SELECT s, CAST(sum(c) AS BIGINT) AS nv
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(coalesce(sum(nv), 0) AS BIGINT) AS N,
        |    CAST(count(*) AS BIGINT) AS m FROM vals),
        |grp AS (SELECT q1, q2, CAST(sum(c) AS BIGINT) AS n
        |  FROM cells GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.q1, g.q2, g.n, v.s, v.nv,
        |    CAST(coalesce(c.c, 0) AS BIGINT) AS c
        |  FROM grp g CROSS JOIN vals v
        |  LEFT JOIN cells c ON c.q1 = g.q1 AND c.q2 = g.q2
        |    AND c.s = v.s),
        |cum AS (
        |  SELECT q1, q2, n, s,
        |    sum(c) OVER (PARTITION BY q1, q2 ORDER BY s) AS cp,
        |    sum(nv) OVER (PARTITION BY q1, q2 ORDER BY s) AS cq
        |  FROM grid),
        |per AS (
        |  SELECT q1, q2, min(cum.n) AS n,
        |    sum(abs(CAST(t.N AS HUGEINT) * CAST(cp AS HUGEINT)
        |      - CAST(cum.n AS HUGEINT) * CAST(cq AS HUGEINT))) AS num
        |  FROM cum, tot t GROUP BY 1, 2),
        |emd AS (
        |  SELECT p.q1, p.q2, p.n,
        |    CASE WHEN t.m > 1 THEN CAST(p.num AS DOUBLE)
        |      / (CAST(p.n AS DOUBLE) * CAST(t.N AS DOUBLE)
        |        * (CAST(t.m AS DOUBLE) - 1.0))
        |    ELSE 0.0 END AS e
        |  FROM per p, tot t),
        |agg AS (
        |  SELECT ts.t, CAST(coalesce(sum(e.n), 0) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    coalesce(max(e.e), 0.0) AS mx,
        |    CAST(sum(CASE WHEN e.e > ts.t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating_groups,
        |    CAST(sum(CASE WHEN e.e > ts.t THEN e.n ELSE 0 END)
        |      AS BIGINT) AS n_rows_at_risk
        |  FROM (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.2 AS DOUBLE)))
        |    AS ts(t), emd e
        |  GROUP BY 1)
        |SELECT a.t, a.n_rows, nu.n_null_rows, a.n_groups,
        |  t.m AS m_values, a.n_violating_groups, a.n_rows_at_risk,
        |  CASE WHEN a.n_rows > 0 THEN
        |    floor(CAST(a.n_rows_at_risk AS DOUBLE)
        |      / CAST(a.n_rows AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    END AS risk_rate,
        |  floor(a.mx * 1000000.0 + 0.5) / 1000000.0 AS max_emd
        |FROM agg a, nulls nu, tot t ORDER BY a.t""".stripMargin,
    "q_d14_k_anonymity" ->
      """WITH s AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |per AS (
        |  SELECT k.k, CAST(sum(s.c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(CASE WHEN s.c < k.k THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_small_groups,
        |    CAST(sum(CASE WHEN s.c < k.k THEN s.c ELSE 0 END)
        |      AS BIGINT) AS n_rows_at_risk
        |  FROM (VALUES (2), (5), (10)) AS k(k), s
        |  GROUP BY k.k)
        |SELECT k, n_rows, n_groups, n_small_groups, n_rows_at_risk,
        |  CASE WHEN n_rows > 0 THEN CAST(n_rows_at_risk AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) END AS risk_rate
        |FROM per ORDER BY k""".stripMargin,
    // Same per-check count aggregate + NOT EXISTS orphan count.
    "q_d13_referential" ->
      """WITH b1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_fk FROM orders),
        |x1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM orders o
        |  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)),
        |b2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_fk FROM lineitem),
        |x2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM lineitem li
        |  WHERE li.l_orderkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_orderkey = li.l_orderkey)),
        |b3 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_fk FROM lineitem),
        |x3 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM lineitem li
        |  WHERE li.l_partkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM part WHERE p_partkey = li.l_partkey))
        |SELECT * FROM (
        |  SELECT 'orders.o_custkey->customer' AS "check", b1.n_rows,
        |    b1.n_null_fk, x1.n_orphans,
        |    CASE WHEN b1.n_rows > 0 THEN CAST(x1.n_orphans AS DOUBLE)
        |      / CAST(b1.n_rows AS DOUBLE) END AS orphan_rate
        |  FROM b1, x1
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders', b2.n_rows,
        |    b2.n_null_fk, x2.n_orphans,
        |    CASE WHEN b2.n_rows > 0 THEN CAST(x2.n_orphans AS DOUBLE)
        |      / CAST(b2.n_rows AS DOUBLE) END
        |  FROM b2, x2
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part', b3.n_rows, b3.n_null_fk,
        |    x3.n_orphans,
        |    CASE WHEN b3.n_rows > 0 THEN CAST(x3.n_orphans AS DOUBLE)
        |      / CAST(b3.n_rows AS DOUBLE) END
        |  FROM b3, x3)
        |ORDER BY "check"""".stripMargin,
    // Same type-1 integer-rank medians (rank = (n+1) // 2 under the
    // (value, id) / (dev, id) total orders), same k*MAD compare.
    "q_d12_mad_outliers" ->
      """WITH base AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS value, doc_id
        |  FROM documents),
        |rv AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY value, doc_id) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM base),
        |med AS (SELECT source AS g, value AS med FROM rv
        |        WHERE r = (n + 1) // 2),
        |dev AS (
        |  SELECT b.source, b.doc_id, b.value, m.med,
        |    abs(b.value - m.med) AS d
        |  FROM base b JOIN med m ON m.g = b.source),
        |rd AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY d, doc_id) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM dev),
        |mad AS (SELECT source AS g, d AS mad FROM rd
        |        WHERE r = (n + 1) // 2)
        |SELECT dev.source, dev.doc_id AS id, dev.value, dev.med,
        |  mad.mad, CAST(dev.d > 3.0 * mad.mad AS INTEGER) AS is_outlier
        |FROM dev JOIN mad ON mad.g = dev.source
        |ORDER BY dev.source, id""".stripMargin,
    // One violation-count branch per check, identical NULL semantics
    // (violation = NOT coalesce(pred, FALSE)).
    "q_d11_check_suite" ->
      """WITH t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM orders),
        |v AS (
        |  SELECT 0 AS check_id, 'Complete' AS check_type,
        |    'o_custkey' AS target,
        |    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n
        |  FROM orders
        |  UNION ALL SELECT 1, 'Between', 'o_totalprice',
        |    CAST(count(*) FILTER (WHERE NOT coalesce(
        |      o_totalprice >= 0 AND o_totalprice <= 300000, FALSE))
        |      AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 2, 'InSet', 'o_orderstatus',
        |    CAST(count(*) FILTER (WHERE NOT coalesce(
        |      o_orderstatus IN ('F', 'O', 'P'), FALSE)) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 3, 'MatchesRegex', 'o_orderpriority',
        |    CAST(count(*) FILTER (WHERE NOT coalesce(
        |      regexp_matches(o_orderpriority, '^[1-5]-'), FALSE))
        |      AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 4, 'Satisfies',
        |    'o_orderdate >= TIMESTAMP ''1995-01-01 00:00:00''',
        |    CAST(count(*) FILTER (WHERE NOT coalesce(
        |      o_orderdate >= TIMESTAMP '1995-01-01 00:00:00', FALSE))
        |      AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 5, 'Unique', 'o_orderkey',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders)
        |SELECT check_id, check_type, target, n AS n_violations,
        |  CASE WHEN total > 0 THEN n / total ELSE 0.0 END
        |    AS violation_ratio,
        |  CAST((CASE WHEN total > 0 THEN n / total ELSE 0.0 END) <= 0.0
        |    AS INTEGER) AS passed
        |FROM v, t ORDER BY check_id""".stripMargin,
    // Same explicit-moment Pearson formula, one aggregate pass.
    "q_d9_correlation" ->
      """WITH m AS (SELECT
        |  CAST(count(*) AS DOUBLE) AS n,
        |  sum(l_discount) AS s_d, sum(l_discount * l_discount) AS ss_d,
        |  sum(l_extendedprice) AS s_e,
        |  sum(l_extendedprice * l_extendedprice) AS ss_e,
        |  sum(l_quantity) AS s_q, sum(l_quantity * l_quantity) AS ss_q,
        |  sum(l_tax) AS s_t, sum(l_tax * l_tax) AS ss_t,
        |  sum(l_discount * l_extendedprice) AS sp_de,
        |  sum(l_discount * l_quantity) AS sp_dq,
        |  sum(l_discount * l_tax) AS sp_dt,
        |  sum(l_extendedprice * l_quantity) AS sp_eq,
        |  sum(l_extendedprice * l_tax) AS sp_et,
        |  sum(l_quantity * l_tax) AS sp_qt
        |  FROM lineitem)
        |SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
        |  (n * sp - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS pearson
        |FROM (
        |  SELECT 'l_discount' AS col_x, 'l_extendedprice' AS col_y,
        |    n, s_d AS sx, ss_d AS sxx, s_e AS sy, ss_e AS syy, sp_de AS sp
        |  FROM m
        |  UNION ALL SELECT 'l_discount', 'l_quantity',
        |    n, s_d, ss_d, s_q, ss_q, sp_dq FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax',
        |    n, s_d, ss_d, s_t, ss_t, sp_dt FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_quantity',
        |    n, s_e, ss_e, s_q, ss_q, sp_eq FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |    n, s_e, ss_e, s_t, ss_t, sp_et FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax',
        |    n, s_q, ss_q, s_t, ss_t, sp_qt FROM m)
        |ORDER BY col_x, col_y""".stripMargin,
    // Identical exact-count arithmetic; % on BIGINT matches pmod for
    // non-negative ids.
    "q_d10_ab_test" ->
      """WITH units AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |             THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM units)
        |SELECT n0, n1, c0, c1,
        |  CAST(c0 AS DOUBLE) / n0 AS p0, CAST(c1 AS DOUBLE) / n1 AS p1,
        |  CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0 AS lift,
        |  (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
        |    sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
        |      (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
        |      (1.0 / n0 + 1.0 / n1)) AS z,
        |  CAST(abs((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
        |    sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
        |      (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
        |      (1.0 / n0 + 1.0 / n1))) > 1.96 AS INTEGER) AS significant
        |FROM agg""".stripMargin,
    // Profiler: one row per column, numeric means through the same
    // DECIMAL(38,10)-exact sum and single division.
    "q_d8_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS "column", 'numeric' AS kind,
           |  CAST((SELECT n FROM t) AS BIGINT) AS n_rows,
           |  CAST((SELECT n FROM t) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS num_min,
           |  CAST(max($c) AS DOUBLE) AS num_max,
           |  floor(CAST(sum(CAST($c AS DECIMAL(38,10))) AS DOUBLE) /
           |    count($c) * 1000000.0 + 0.5) / 1000000.0 AS num_mean,
           |  CAST(NULL AS VARCHAR) AS str_min,
           |  CAST(NULL AS VARCHAR) AS str_max
           |FROM lineitem""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS "column", 'string' AS kind,
           |  CAST((SELECT n FROM t) AS BIGINT) AS n_rows,
           |  CAST((SELECT n FROM t) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS num_min,
           |  CAST(NULL AS DOUBLE) AS num_max,
           |  CAST(NULL AS DOUBLE) AS num_mean,
           |  min($c) AS str_min, max($c) AS str_max
           |FROM lineitem""".stripMargin
      def other(c: String) =
        s"""SELECT '$c' AS "column", 'other' AS kind,
           |  CAST((SELECT n FROM t) AS BIGINT) AS n_rows,
           |  CAST((SELECT n FROM t) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS num_min,
           |  CAST(NULL AS DOUBLE) AS num_max,
           |  CAST(NULL AS DOUBLE) AS num_mean,
           |  CAST(NULL AS VARCHAR) AS str_min,
           |  CAST(NULL AS VARCHAR) AS str_max
           |FROM lineitem""".stripMargin
      s"""WITH t AS (SELECT count(*) AS n FROM lineitem)
         |SELECT * FROM (
         |${num("l_quantity")}
         |UNION ALL
         |${num("l_extendedprice")}
         |UNION ALL
         |${str("l_returnflag")}
         |UNION ALL
         |${other("l_shipdate")})
         |ORDER BY "column"""".stripMargin
    },
    // Chi-square: same add-half smoothed expectation, every operand
    // exact (integers/half-integers), CAST(0.5 AS DOUBLE) so DuckDB's
    // decimal literal can't change the arithmetic.
    "q_d6_chi2_drift" ->
      """WITH r AS (
        |  SELECT coalesce(CAST(event_type AS VARCHAR), '__null')
        |    AS category
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |c AS (
        |  SELECT coalesce(CAST(event_type AS VARCHAR), '__null')
        |    AS category
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |rc AS (SELECT category, CAST(count(*) AS BIGINT) AS n_ref
        |       FROM r GROUP BY 1),
        |cc AS (SELECT category, CAST(count(*) AS BIGINT) AS n_cur
        |       FROM c GROUP BY 1),
        |spine AS (
        |  SELECT coalesce(rc.category, cc.category) AS category,
        |    coalesce(rc.n_ref, 0) AS n_ref,
        |    coalesce(cc.n_cur, 0) AS n_cur
        |  FROM rc FULL JOIN cc ON rc.category = cc.category),
        |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS nref,
        |    CAST(sum(n_cur) AS DOUBLE) AS ncur,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM spine),
        |e AS (
        |  SELECT s.category, s.n_ref, s.n_cur,
        |    ((CAST(s.n_ref AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
        |      ((SELECT nref FROM t) +
        |        CAST(0.5 AS DOUBLE) * (SELECT k FROM t))) *
        |      (SELECT ncur FROM t) AS expected
        |  FROM spine s),
        |co AS (
        |  SELECT *,
        |    ((CAST(n_cur AS DOUBLE) - expected) *
        |      (CAST(n_cur AS DOUBLE) - expected)) / expected
        |      AS contribution
        |  FROM e)
        |SELECT category, n_ref, n_cur, expected, contribution,
        |  (SELECT k FROM t) - 1 AS dof,
        |  floor(sum(contribution) OVER () * 1000000.0 + 0.5)
        |    / 1000000.0 AS chi2
        |FROM co ORDER BY category""".stripMargin,
    // KS: exact pooled empirical-CDF gap — cumulative integer counts,
    // one division per side, exact abs/max; zero tolerance needed.
    "q_d7_ks_drift" ->
      """WITH rv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-16 00:00:00'),
        |cv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |pooled AS (
        |  SELECT v, CAST(sum(r) AS BIGINT) AS nr,
        |    CAST(sum(c) AS BIGINT) AS nc
        |  FROM (
        |    SELECT v, 1 AS r, 0 AS c FROM rv
        |    UNION ALL
        |    SELECT v, 0, 1 FROM cv)
        |  GROUP BY v),
        |t AS (SELECT CAST(sum(nr) AS DOUBLE) AS nref,
        |    CAST(sum(nc) AS DOUBLE) AS ncur,
        |    CAST(sum(nr) AS BIGINT) AS nrl,
        |    CAST(sum(nc) AS BIGINT) AS ncl
        |  FROM pooled),
        |g AS (
        |  SELECT abs(
        |    CAST(sum(nr) OVER w AS DOUBLE) / (SELECT nref FROM t) -
        |    CAST(sum(nc) OVER w AS DOUBLE) / (SELECT ncur FROM t))
        |    AS gap
        |  FROM pooled
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT (SELECT nrl FROM t) AS n_ref,
        |  (SELECT ncl FROM t) AS n_cur,
        |  max(gap) AS ks_stat
        |FROM g""".stripMargin,
    // D33: per-column exact counts, the driver's IEEE z/p tree
    // mirrored verbatim (delta is computed from the ROUNDED rates —
    // the operator's published contract).
    "q_d33_null_rate_drift" ->
      """WITH r AS (SELECT * FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |c AS (SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |stats AS (
        |  SELECT 'event_type' AS col,
        |    (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_ref,
        |    (SELECT CAST(count(*) - count(event_type) AS BIGINT) FROM r)
        |      AS null_ref,
        |    (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_cur,
        |    (SELECT CAST(count(*) - count(event_type) AS BIGINT) FROM c)
        |      AS null_cur
        |  UNION ALL
        |  SELECT 'user_id',
        |    (SELECT count(*) FROM r),
        |    (SELECT count(*) - count(user_id) FROM r),
        |    (SELECT count(*) FROM c),
        |    (SELECT count(*) - count(user_id) FROM c)
        |  UNION ALL
        |  SELECT 'value',
        |    (SELECT count(*) FROM r),
        |    (SELECT count(*) - count(value) FROM r),
        |    (SELECT count(*) FROM c),
        |    (SELECT count(*) - count(value) FROM c)),
        |d AS (
        |  SELECT *,
        |    CAST(null_ref + null_cur AS DOUBLE)
        |      / CAST(n_ref + n_cur AS DOUBLE) AS pooled,
        |    floor(CAST(null_ref AS DOUBLE) / CAST(n_ref AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 AS rate_ref,
        |    floor(CAST(null_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 AS rate_cur
        |  FROM stats),
        |z0 AS (
        |  SELECT *,
        |    (CAST(null_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)
        |      - CAST(null_ref AS DOUBLE) / CAST(n_ref AS DOUBLE))
        |    / sqrt(pooled * (1.0 - pooled)
        |      * (1.0 / CAST(n_ref AS DOUBLE)
        |        + 1.0 / CAST(n_cur AS DOUBLE))) AS zr
        |  FROM d),
        |pp AS (
        |  SELECT *,
        |    2.0 * (exp(-(abs(zr) * abs(zr)) / 2.0) / 2.5066282746310002)
        |    * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs(zr)))
        |      + -1.821255978) * (1.0 / (1.0 + 0.2316419 * abs(zr)))
        |      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs(zr)))
        |      + -0.356563782) * (1.0 / (1.0 + 0.2316419 * abs(zr)))
        |      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs(zr))))
        |      AS p2
        |  FROM z0)
        |SELECT col AS "column", n_ref, null_ref, n_cur, null_cur,
        |  rate_ref, rate_cur,
        |  floor((rate_cur - rate_ref) * 1000000.0 + 0.5) / 1000000.0
        |    AS delta,
        |  CASE WHEN pooled > 0.0 AND pooled < 1.0 THEN
        |    floor(zr * 1000000.0 + 0.5) / 1000000.0 END AS z,
        |  CASE WHEN pooled > 0.0 AND pooled < 1.0 THEN
        |    floor(least(p2, 1.0) * 1000000.0 + 0.5) / 1000000.0
        |    END AS p
        |FROM pp ORDER BY col""".stripMargin,
    // D31: the same pooled-grid chain; l·d² terms exact in HUGEINT,
    // HUGEINT→DOUBLE through VARCHAR (the lof-oracle cast discipline),
    // denominator multiplied left-to-right like the Spark tree.
    "q_d31_cramer_von_mises" ->
      """WITH rv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-16 00:00:00'),
        |cv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |pooled AS (
        |  SELECT v, CAST(sum(r) AS BIGINT) AS nr,
        |    CAST(sum(c) AS BIGINT) AS nc
        |  FROM (
        |    SELECT v, 1 AS r, 0 AS c FROM rv
        |    UNION ALL
        |    SELECT v, 0, 1 FROM cv)
        |  GROUP BY v),
        |t AS (SELECT CAST(sum(nr) AS BIGINT) AS nrl,
        |    CAST(sum(nc) AS BIGINT) AS ncl FROM pooled),
        |g AS (
        |  SELECT CAST(nr + nc AS HUGEINT) AS l,
        |    CAST(sum(nr) OVER w AS HUGEINT) * (SELECT ncl FROM t) -
        |    CAST(sum(nc) OVER w AS HUGEINT) * (SELECT nrl FROM t) AS d
        |  FROM pooled
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT (SELECT nrl FROM t) AS n_ref,
        |  (SELECT ncl FROM t) AS n_cur,
        |  floor(CAST(CAST(sum(l * d * d) AS VARCHAR) AS DOUBLE) /
        |    (CAST((SELECT nrl FROM t) + (SELECT ncl FROM t) AS DOUBLE) *
        |     CAST((SELECT nrl FROM t) + (SELECT ncl FROM t) AS DOUBLE) *
        |     CAST((SELECT nrl FROM t) AS DOUBLE) *
        |     CAST((SELECT ncl FROM t) AS DOUBLE)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS cvm
        |FROM g""".stripMargin,
    // D32: exact integer maxima of ±d, one division each — no
    // rounding anywhere (the ksDrift contract).
    "q_d32_kuiper" ->
      """WITH rv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-16 00:00:00'),
        |cv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |pooled AS (
        |  SELECT v, CAST(sum(r) AS BIGINT) AS nr,
        |    CAST(sum(c) AS BIGINT) AS nc
        |  FROM (
        |    SELECT v, 1 AS r, 0 AS c FROM rv
        |    UNION ALL
        |    SELECT v, 0, 1 FROM cv)
        |  GROUP BY v),
        |t AS (SELECT CAST(sum(nr) AS BIGINT) AS nrl,
        |    CAST(sum(nc) AS BIGINT) AS ncl FROM pooled),
        |g AS (
        |  SELECT
        |    CAST(sum(nr) OVER w AS HUGEINT) * (SELECT ncl FROM t) -
        |    CAST(sum(nc) OVER w AS HUGEINT) * (SELECT nrl FROM t) AS d
        |  FROM pooled
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT greatest(max(d), 0) AS dp,
        |    greatest(max(-d), 0) AS dm FROM g)
        |SELECT (SELECT nrl FROM t) AS n_ref,
        |  (SELECT ncl FROM t) AS n_cur,
        |  CAST(CAST(dp AS VARCHAR) AS DOUBLE) /
        |    (CAST((SELECT nrl FROM t) AS DOUBLE) *
        |     CAST((SELECT ncl FROM t) AS DOUBLE)) AS d_plus,
        |  CAST(CAST(dm AS VARCHAR) AS DOUBLE) /
        |    (CAST((SELECT nrl FROM t) AS DOUBLE) *
        |     CAST((SELECT ncl FROM t) AS DOUBLE)) AS d_minus,
        |  CAST(CAST(dp + dm AS VARCHAR) AS DOUBLE) /
        |    (CAST((SELECT nrl FROM t) AS DOUBLE) *
        |     CAST((SELECT ncl FROM t) AS DOUBLE)) AS kuiper
        |FROM m""".stripMargin,
    // PSI: identical edge ranks (integer ceil arithmetic), identical
    // strict-greater binning against data-exact edges, clipped shares
    // as single divisions; only ln-bearing outputs rounded.
    "q_d5_psi_drift" ->
      """WITH refv AS (
        |  SELECT CAST(value AS DOUBLE) AS v, event_id AS i FROM events
        |  WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-16 00:00:00'),
        |curv AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL
        |    AND ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |nref AS (SELECT CAST(count(*) AS BIGINT) AS n FROM refv),
        |ncur AS (SELECT CAST(count(*) AS BIGINT) AS n FROM curv),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v, i) AS r
        |       FROM refv),
        |edges AS (
        |  SELECT rk.v AS e
        |  FROM range(1, 10) t(i) JOIN rk
        |    ON rk.r = (t.i * (SELECT n FROM nref) + 9) // 10),
        |spine AS (SELECT CAST(i AS INTEGER) AS bin
        |          FROM range(1, 11) t(i)),
        |rbins AS (
        |  SELECT CAST(1 + (SELECT count(*) FROM edges e
        |    WHERE r.v > e.e) AS INTEGER) AS bin
        |  FROM refv r),
        |rcnt AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref
        |         FROM rbins GROUP BY 1),
        |cbins AS (
        |  SELECT CAST(1 + (SELECT count(*) FROM edges e
        |    WHERE c.v > e.e) AS INTEGER) AS bin
        |  FROM curv c),
        |ccnt AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cur
        |         FROM cbins GROUP BY 1),
        |j AS (
        |  SELECT s.bin, coalesce(r.n_ref, 0) AS n_ref,
        |    coalesce(c.n_cur, 0) AS n_cur
        |  FROM spine s
        |  LEFT JOIN rcnt r ON r.bin = s.bin
        |  LEFT JOIN ccnt c ON c.bin = s.bin),
        |sh AS (
        |  SELECT bin, n_ref, n_cur,
        |    greatest(CAST(n_ref AS DOUBLE) /
        |      (SELECT CAST(n AS DOUBLE) FROM nref),
        |      CAST(0.0001 AS DOUBLE)) AS share_ref,
        |    greatest(CAST(n_cur AS DOUBLE) /
        |      (SELECT CAST(n AS DOUBLE) FROM ncur),
        |      CAST(0.0001 AS DOUBLE)) AS share_cur
        |  FROM j),
        |co AS (
        |  SELECT *, (share_ref - share_cur) *
        |    ln(share_ref / share_cur) AS contrib
        |  FROM sh)
        |SELECT bin, n_ref, n_cur, share_ref, share_cur,
        |  round(contrib, 6) AS contribution,
        |  round(sum(contrib) OVER (), 6) AS psi
        |FROM co ORDER BY bin""".stripMargin,
    // invalid = total - valid, so NULL-predicate rows count as invalid
    // (mirrors Dq.assertion's semantics).
    "q_d1_assertion" ->
      """SELECT count(1) AS total,
        |  count(1) - count(CASE WHEN l_discount <= 0.08 AND l_quantity > 0
        |    THEN 1 END) AS invalid,
        |  floor((count(1) - count(CASE WHEN l_discount <= 0.08 AND l_quantity > 0
        |    THEN 1 END)) / CAST(count(1) AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS ratio,
        |  (count(1) - count(CASE WHEN l_discount <= 0.08 AND l_quantity > 0
        |    THEN 1 END)) / CAST(count(1) AS DOUBLE) <= 0.25 AS passed
        |FROM lineitem""".stripMargin,
    "q_d2_diff" ->
      """WITH m AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10
        |      ELSE o_totalprice END AS o_totalprice_right,
        |    CASE WHEN o_orderkey % 17 = 0 THEN 'X'
        |      ELSE o_orderstatus END AS o_orderstatus_right
        |  FROM orders)
        |SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus,
        |  m.o_totalprice_right, m.o_orderstatus_right,
        |  o.o_totalprice = m.o_totalprice_right AS o_totalprice_match,
        |  o.o_orderstatus = m.o_orderstatus_right AS o_orderstatus_match
        |FROM orders o JOIN m USING (o_orderkey)
        |WHERE o.o_totalprice <> m.o_totalprice_right
        |   OR o.o_orderstatus <> m.o_orderstatus_right
        |ORDER BY o_orderkey""".stripMargin,
    "q_d4_plan_view" ->
      """SELECT l_returnflag, count(1) AS n_invalid,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem WHERE NOT coalesce(l_discount <= 0.08, false)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
