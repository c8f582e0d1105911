package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch analytics (Apache DataSketches HLL, exposed by Spark
  * 4 as `hll_sketch_agg` / `hll_union_agg`) — the approximate surface a
  * 100 TB store runs instead of exact distincts: per-partition/per-day
  * sketch TABLES are tiny (≤ ~2 KB per group at lgK 12), persistable,
  * and union-able, so "distinct tokens this quarter" is a merge over
  * stored sketches — no re-scan of raw data, no count-distinct shuffle
  * of the full corpus.
  */
object Sketches {

  /** Per-group distinct report with its own audit: the exact count, the
    * HLL estimate checked against it (`approx_ok`, relative error ≤
    * `relErr`), and a split-merge consistency check (`merge_ok`) —
    * sketches built over the `splitExpr` row partition and UNIONED must
    * estimate what the one-pass sketch estimates, the property that
    * makes persisted sketch tables sound.
    *
    * The exact count is corpus-priced (it exists to audit the sketch;
    * production reads drop it and keep only the sketch columns). Both
    * sketch paths are map-side-combinable aggregates. */
  def mergeableDistinct(df: DataFrame, groupCol: String, valueCol: String,
      splitExpr: Column, relErr: Double = 0.05): DataFrame = {
    require(relErr > 0, s"relErr must be positive, got $relErr")
    val full = df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg(col(valueCol))).as("__est"))
    val merged = df.withColumn("__h", splitExpr)
      .groupBy(col(groupCol), col("__h"))
      .agg(hll_sketch_agg(col(valueCol)).as("__sk"))
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__mest"))
    full.join(merged, groupCol)
      .select(col(groupCol), col("exact_distinct"),
        when(col("exact_distinct") > 0,
          abs(col("__est") - col("exact_distinct")) /
            col("exact_distinct") <= relErr)
          .otherwise(col("__est") === 0).as("approx_ok"),
        (abs(col("__mest") - col("__est")) /
          greatest(col("__est"), lit(1.0)) <= 0.01).as("merge_ok"))
  }

  /** Per-group quantile report with its own audit: the exact
    * interpolated median (cross-engine comparable — both engines use
    * type-7 linear interpolation), plus `percentile_approx` (the
    * Greenwald–Khanna mergeable summary, the sketch a 100 TB scan
    * actually runs) audited against its rank guarantee: the returned
    * element's exact rank must sit within ±n/accuracy of the target
    * rank. One corpus aggregate builds counts + sketch + exact check
    * values; a second pass ranks the (broadcast, per-group) approx
    * answers against the raw rows. The exact median is audit
    * scaffolding — production keeps only the sketch column. */
  def quantileReport(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.9), accuracy: Int = 100)
      : DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"percentiles must lie in (0,1), got $ps")
    val v = col(valueCol).cast("double")
    val base = df.select(col(groupCol), v.as("__v"))
    val agg = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        graft.functions.quantize(expr(s"percentile(__v, 0.5)"), 4)
          .as("exact_p50"),
        percentile_approx(col("__v"),
          array(ps.map(lit): _*), lit(accuracy)).as("__ap"))
    val eps = 1.0 / accuracy
    val rankCols = ps.indices.flatMap { i =>
      val a = col("__ap").getItem(i)
      Seq(sum(when(col("__v") <= a, 1L).otherwise(0L)).as(s"__le$i"),
        sum(when(col("__v") < a, 1L).otherwise(0L)).as(s"__lt$i"))
    }
    val audited = base.join(broadcast(agg), Seq(groupCol))
      .groupBy(col(groupCol), col("n"), col("exact_p50"))
      .agg(rankCols.head, rankCols.tail: _*)
    ps.indices.foldLeft(audited) { (d, i) =>
      val p = ps(i)
      d.withColumn(s"ok_p${(p * 100).round}",
        col(s"__le$i") >= lit(p) * col("n") - lit(eps) * col("n") - 1 &&
          col(s"__lt$i") <= lit(p) * col("n") + lit(eps) * col("n") + 1)
    }.select(col(groupCol) +: col("n") +: col("exact_p50") +:
      ps.map(p => col(s"ok_p${(p * 100).round}")): _*)
  }

  /** Hash row `r` of the Count–Min sketch: token → column index in
    * [0, width) via the first 8 md5 hex digits of `"cm|r|token"` — the
    * engine-neutral hash idiom (X12/X54/X56), so any engine recomputes
    * the exact cell placement. */
  private def cmCell(token: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cm|$r|"), token)), 1, 8),
      16, 10).cast("long"), lit(width.toLong))

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) as a SPARSE
    * relational cell table — the mergeable point-FREQUENCY summary that
    * completes the sketch family (X57 distincts, X58 quantiles, X60
    * heavy hitters): `(group, r, c, n)` with `n` = number of tokens
    * hashing to column `c` under hash row `r`.
    *
    * Everything is relational: the build is ONE map-side-combined
    * aggregate (after a depth-way posexplode), merging persisted
    * per-batch sketches is `groupBy(group, r, c).sum(n)` (cell-wise
    * addition — the CM merge), and a point query probes `depth` cells
    * and takes the min. The cell table never exceeds
    * `min(depth·width, depth·distinct_tokens)` rows per group — KBs at
    * any corpus scale — so "how often did token t appear this quarter"
    * is a lookup over stored sketches, not a raw re-scan. */
  def countMinCells(df: DataFrame, groupCol: String, tokenCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.select(col(groupCol), col(tokenCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull)
      .select(col(groupCol),
        posexplode(array((0 until depth).map(r =>
          cmCell(col("__t"), r, width)): _*)).as(Seq("r", "c")))
      .groupBy(col(groupCol), col("r"), col("c"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-frequency estimates from a Count–Min cell table:
    * `est_n(key) = min over r of cells(r, h_r(key))`, with absent cells
    * counting 0. The probe side is broadcast (a probe set is small by
    * design); the cell table is never shuffled. Estimates can only
    * OVERcount — `est_n >= exact_n` is a theorem, not a tendency. */
  def countMinEstimate(cells: DataFrame, probes: DataFrame,
      groupCol: String, keyCol: String, depth: Int, width: Int)
      : DataFrame = {
    val pc = probes
      .select(col(groupCol), col(keyCol).cast("string").as("key"))
      .distinct()
      .select(col(groupCol), col("key"),
        posexplode(array((0 until depth).map(r =>
          cmCell(col("key"), r, width)): _*)).as(Seq("r", "c")))
    broadcast(pc).join(cells, Seq(groupCol, "r", "c"), "left")
      .groupBy(col(groupCol), col("key"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }

  /** Count–Min audit report: every token with exact count >= `minExact`
    * probed against the sketch. `ge_ok` pins the overestimate-only
    * theorem; `bound_ok` checks the width guarantee in ALL-INTEGER form
    * — `(est_n - exact_n) * width <= 3 * n_tot` (a token's overcount is
    * collision mass, expected n_tot/width per hash row; the factor-3
    * Markov bound fails a given row with prob < 1/3, all `depth` rows
    * with prob < 3^-depth) — so both engines compare exact integers,
    * no float tolerance. The exact counts exist to audit the sketch;
    * production reads keep only the cells. */
  def countMinReport(df: DataFrame, groupCol: String, tokenCol: String,
      depth: Int, width: Int, minExact: Long): DataFrame = {
    val toks = df.select(col(groupCol),
      col(tokenCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull)
    val exact = toks.groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).as("exact_n"))
      .filter(col("exact_n") >= minExact)
      .withColumnRenamed("__t", "key")
    val tot = toks.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tot"))
    val cells = countMinCells(df, groupCol, tokenCol, depth, width)
    countMinEstimate(cells, exact, groupCol, "key", depth, width)
      .join(exact, Seq(groupCol, "key"))
      .join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col("key"), col("exact_n"), col("est_n"),
        (col("est_n") >= col("exact_n")).as("ge_ok"),
        ((col("est_n") - col("exact_n")) * width <=
          lit(3L) * col("n_tot")).as("bound_ok"))
  }

  /** X176: HLL PAIRWISE SOURCE-OVERLAP matrix — the SKETCH path for
    * X132's exact distinct-gram overlap: at 100 TB the exact matrix
    * carries a distinct-value self-join per source pair; this one
    * keeps ONE HLL sketch per source (≤ ~2 KB) and reads every
    * pairwise overlap by inclusion–exclusion over sketch unions
    * (`|A∩B| ≈ est(A) + est(B) − est(A∪B)`) — no raw re-scan, and new
    * sources join the matrix by sketching only themselves.
    *
    * The exact columns are corpus-priced AUDIT scaffolding (the X57
    * convention — production keeps the sketches): `overlap_ok` pins
    * the estimate within `relErr` of the exact UNION size (the right
    * error scale for a difference of estimates) + 1. Sketch estimates
    * are deterministic in the distinct set, so the booleans are
    * engine-stable facts. Output: one row per unordered source pair —
    * (source_a, source_b, exact_a, exact_b, exact_overlap,
    * overlap_ok). */
  def hllSourceOverlap(df: DataFrame, sourceCol: String,
      valueCol: String, relErr: Double = 0.1): DataFrame = {
    require(relErr > 0, s"relErr must be positive, got $relErr")
    val base = df.select(col(sourceCol).as("__src"),
      col(valueCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull)
    val perSource = base.groupBy(col("__src"))
      .agg(hll_sketch_agg(col("__v")).as("__sk"),
        count_distinct(col("__v")).as("__exact"))
    val pairs = perSource.select(col("__src").as("source_a"),
        col("__sk").as("__ska"), col("__exact").as("exact_a"))
      .join(perSource.select(col("__src").as("source_b"),
        col("__sk").as("__skb"), col("__exact").as("exact_b")),
        col("source_a") < col("source_b"))
    // exact pairwise intersections: the audit join (distinct values
    // only — vocabulary-sized, not corpus-sized)
    val dv = base.distinct()
    val inter = dv.select(col("__src").as("source_a"),
        col("__v"))
      .join(dv.select(col("__src").as("source_b"), col("__v")),
        Seq("__v"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    val estU = hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
    val estA = hll_sketch_estimate(col("__ska"))
    val estB = hll_sketch_estimate(col("__skb"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("exact_a"),
        col("exact_b"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"),
        (abs((estA + estB - estU) -
          coalesce(col("exact_overlap"), lit(0L)).cast("double")) <=
          lit(relErr) * (col("exact_a") + col("exact_b") -
            coalesce(col("exact_overlap"), lit(0L))).cast("double") +
            lit(1.0)).as("overlap_ok"))
  }

  /** ±1 sign for AMS counter `j`: the low bit of the first md5 hex
    * digit of `"ams|j|token"` — the engine-neutral hash idiom
    * ([[cmCell]]'s), so any engine recomputes the exact sign. */
  private def amsSign(token: Column, j: Int): Column =
    lit(1L) - lit(2L) * pmod(conv(substring(
      md5(concat(lit(s"ams|$j|"), token)), 1, 1), 16, 10).cast("long"),
      lit(2L))

  /** X169: AMS SECOND-MOMENT (F2) SKETCH CELLS (Alon–Matias–Szegedy
    * 1996 — public knowledge) as a relational counter table: counter
    * `j` of a group is `Σ_t sign_j(t)` over TOKEN OCCURRENCES, and
    * `counter²` estimates `F2 = Σ_key f_key²` — the repeat-skew moment
    * (self-join size, dedup pressure, collision mass) that completes
    * the sketch family: X57 distincts (F0), X68 point counts, X58
    * quantiles, and now the second moment.
    *
    * MERGEABLE like the Count–Min cells: counters are plain integer
    * sums, so per-batch persisted cell tables merge by
    * `groupBy(group, j).sum(counter)` — the property the split≡merge
    * spec pins. Build is ONE map-side-combined aggregate after a
    * `counters`-way posexplode. Output: (group, j, counter),
    * ≤ `counters` rows per group. */
  def amsF2Cells(df: DataFrame, groupCol: String, tokenCol: String,
      counters: Int = 9): DataFrame = {
    require(counters >= 1 && counters <= 64,
      s"counters must be in [1,64], got $counters")
    df.select(col(groupCol), col(tokenCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull)
      .select(col(groupCol),
        posexplode(array((0 until counters).map(j =>
          amsSign(col("__t"), j)): _*)).as(Seq("j", "__s")))
      .groupBy(col(groupCol), col("j"))
      .agg(sum(col("__s")).as("counter"))
  }

  /** The production read over an [[amsF2Cells]] table (one-pass or
    * merged): per group the median-of-counters F2 estimate — the same
    * element-exact odd-median pick as [[amsF2Report]], minus the
    * corpus-priced exact audit. Rows in = ≤ counters per group; fails
    * loud on an even counter census (a half-merged directory). */
  def amsF2EstimateFromCells(cells: DataFrame, groupCol: String)
      : DataFrame = {
    val D = "decimal(38,0)"
    val agg = cells.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("counters"),
        sort_array(collect_list(
          (col("counter") * col("counter")).cast(D))).as("__e"))
    agg.select(col(groupCol), col("counters"),
      when(col("counters") % 2 === 0,
        raise_error(concat(lit("amsF2EstimateFromCells: even counter "),
          lit("census for group "), col(groupCol).cast("string"),
          lit(" — merge is incomplete"))))
        .otherwise(element_at(col("__e"),
          ((col("counters") + lit(1)) / lit(2)).cast("int"))
          .cast("long"))
        .as("median_est"))
  }

  /** AMS F2 audit report: per group, the exact second moment (one
    * corpus-priced count-count aggregate — audit scaffolding;
    * production keeps only the cells) against the sketch's MEDIAN
    * estimator over an ODD number of counters. All integers: counters
    * and their squares are exact, the median of an odd list is an
    * element (no interpolation — a `counters`-bounded sorted-array
    * pick, never a percentile sketch), and the only division is the
    * one published quantized ratio. DECIMAL carries the squares (a
    * 1e10-token group's F2 overflows LONG); the BIGINT publish fails
    * loud past 2⁶³ rather than rendering a wide decimal (the d23
    * lesson). Output per group: (group, n_tokens, exact_f2,
    * median_est, rel_err). */
  def amsF2Report(df: DataFrame, groupCol: String, tokenCol: String,
      counters: Int = 9): DataFrame = {
    require(counters % 2 == 1,
      s"counters must be odd for an exact median, got $counters")
    val D = "decimal(38,0)"
    val toks = df.select(col(groupCol),
      col(tokenCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull)
    val exact = toks.groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum((col("__c") * col("__c")).cast(D)).as("__f2"))
    val ests = amsF2Cells(df, groupCol, tokenCol, counters)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(
        (col("counter") * col("counter")).cast(D))).as("__e"))
    def pubLong(c: Column, what: String) =
      when(c > lit(Long.MaxValue).cast(D),
        raise_error(lit(s"amsF2Report: $what overflows BIGINT")))
        .otherwise(c.cast("long"))
    val med = element_at(col("__e"), (counters + 1) / 2)
    exact.join(ests, Seq(groupCol))
      .select(col(groupCol), col("n_tokens"),
        pubLong(col("__f2"), "exact F2").as("exact_f2"),
        pubLong(med, "median estimate").as("median_est"),
        graft.functions.q6(
          when(col("__f2") > 0,
            abs(med.cast("double") - col("__f2").cast("double")) /
              col("__f2").cast("double"))).as("rel_err"))
  }
}
