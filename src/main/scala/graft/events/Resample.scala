package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-entity calendar-spine resampling with
  * forward fill.
  *
  * Feature pipelines want one row per (entity, day) even when the raw
  * event stream skips days — "last observed value carries forward". The
  * textbook encoding is a calendar-spine table joined against the
  * observations plus a `last(_, ignoreNulls)` window — two shuffles and
  * a join whose spine side is |entities| × |days| rows BEFORE the fill.
  *
  * The segment-explode form here needs NO spine and no ignoreNulls scan:
  * after the per-(entity, day) aggregate, each observed day looks at the
  * NEXT observed day (`lead` over the entity window) and emits itself
  * plus its gap days via `sequence(day, next−1)` — the filled value is
  * the segment's own value by construction. Row count materializes
  * directly to the output size; nothing is shuffled at spine
  * granularity (the explode happens after the last exchange).
  *
  * At 100 TB: one exchange for the (entity, day) aggregate, one for the
  * entity window — both key-sized; the explode is map-side. A hot
  * entity costs its own output rows, never a joined spine. */
object Resample {

  /** Daily resample of `valueCol` aggregated by `aggFn` per (key, day),
    * gaps forward-filled from the previous observed day. Output: key,
    * `day` (date), `value` (the EXACT aggregate — callers that want
    * display rounding apply it themselves), `filled` (0 = observed,
    * 1 = carried). The series spans each key's first to last observed
    * day — leading gaps have nothing to carry and trailing fill would
    * never terminate. */
  def dailyResampleFfill(df: DataFrame, key: String, ts: Column,
      valueCol: Column, aggFn: Column => Column = sum): DataFrame = {
    val daily = df
      .groupBy(col(key), to_date(ts).as("__d"))
      .agg(aggFn(valueCol).as("value"))
    val w = Window.partitionBy(col(key)).orderBy(col("__d"))
    daily
      .withColumn("__next", lead(col("__d"), 1).over(w))
      .select(col(key), col("__d"), col("value"),
        explode(sequence(col("__d"),
          coalesce(date_sub(col("__next"), 1), col("__d")))).as("day"))
      .select(col(key), col("day"), col("value"),
        (col("day") =!= col("__d")).cast("int").as("filled"))
  }

  /** E19: KAPLAN–MEIER survival of inter-event gaps (Kaplan & Meier
    * 1958, public knowledge) — "what fraction of users go t days
    * without another purchase", WITH censoring done right: each user's
    * final gap (last event → observation end) has not finished and
    * must leave the risk set at its censoring time, not count as an
    * event (dropping censored spans biases survival down — the classic
    * churn-analysis mistake).
    *
    * `S(t) = Π_{u ≤ t} (1 − d_u/n_u)` over distinct gap lengths, with
    * `d_u` completed gaps of length u, `n_u` the risk set (all spans,
    * complete or censored, of length ≥ u). The product is
    * `exp(Σ ln(1 − d/n))` over an ORDERED cumulative window — the
    * addition order is the window order, identical in both engines, so
    * the curve is reproducible to ln/exp ulps (round-6 output).
    *
    * Shape: one entity-keyed lag window for gaps, two durations-sized
    * aggregates and windows (distinct gap lengths, not events).
    * Output: (duration_days, n_risk, n_events, n_censored, survival).
    * Entities with a single event contribute one censored span. */
  def kaplanMeier(df: DataFrame, key: String, ts: Column,
      observationEnd: String): DataFrame =
    kmFromSpans(gapSpans(df, key, ts, observationEnd))

  /** The E19 span derivation: per entity, each event→next-event gap is
    * a completed span; the final open gap is censored at
    * `observationEnd`. Entity-keyed lag window only. */
  private[graft] def gapSpans(df: DataFrame, key: String, ts: Column,
      observationEnd: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"))
    df.select(col(key), ts.as("__ts"))
      .withColumn("__next", lead(col("__ts"), 1).over(w))
      .select(col(key),
        when(col("__next").isNotNull,
          datediff(to_date(col("__next")), to_date(col("__ts"))))
          .otherwise(datediff(lit(observationEnd).cast("date"),
            to_date(col("__ts")))).cast("long").as("t"),
        col("__next").isNull.as("__censored"))
      .filter(col("t") >= 0)
  }

  /** E33: NELSON–AALEN CUMULATIVE HAZARD over the same censored gap
    * spans as [[kaplanMeier]] (Nelson 1972, Aalen 1978, public
    * knowledge) — `H(t) = Σ_{u ≤ t} d_u/n_u` with the standard
    * variance `Σ d_u/n_u²`. Where the KM curve multiplies survival
    * fractions, NA sums hazard increments: it is the estimator whose
    * increments are unbiased under independent censoring, and
    * `exp(−H)` is the Fleming–Harrington survival alternative.
    *
    * Same reproducibility argument as KM: both cumulative sums run
    * over an ORDERED window whose addition order is the window order,
    * identical in both engines; the per-term doubles are fixed IEEE
    * trees over exact LONG counts. The window is global but BOUNDED —
    * one row per DISTINCT span duration (PlanGuardSpec census).
    * Output: (duration_days, n_risk, n_events, n_censored, cum_hazard,
    * cum_hazard_var) — hazard quantized-6, variance quantized-9 (the
    * d/n² increments sit at the 1e-7 scale already at modest n). */
  def nelsonAalen(df: DataFrame, key: String, ts: Column,
      observationEnd: String): DataFrame = {
    val byT = gapSpans(df, key, ts, observationEnd).groupBy(col("t"))
      .agg(sum(when(!col("__censored"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("__censored"), 1L).otherwise(0L)).as("n_censored"))
    val riskW = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(riskW))
      .withColumn("__h",
        sum(col("n_events").cast("double") /
          col("n_risk").cast("double")).over(cumW))
      .withColumn("__hv",
        sum(col("n_events").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double")))
          .over(cumW))
      .select(col("t").as("duration_days"), col("n_risk"),
        col("n_events"), col("n_censored"),
        graft.functions.q6(col("__h")).as("cum_hazard"),
        graft.functions.quantize(col("__hv"), 9).as("cum_hazard_var"))
  }

  /** F50: TWO-GROUP LOG-RANK TEST (Mantel 1966, Peto & Peto 1972,
    * public knowledge) — are two activation/survival curves the same?
    * Per distinct event time `t_j`: observed arm-1 deaths `d_1j`,
    * expectation under H₀ `E_1j = d_j·n_1j/n_j` from the at-risk
    * sets, hypergeometric variance
    * `V_j = d_j·(n_1j/n_j)·(1−n_1j/n_j)·(n_j−d_j)/(n_j−1)`;
    * `z = (O₁−E₁)/√ΣV`, `χ² = z²`, two-sided p via the
    * Abramowitz–Stegun 26.2.17 polynomial.
    *
    * At-risk sets come from per-group cumulative span counts over the
    * DISTINCT-duration table (global window, bounded by the
    * observation span in days — the KM/NA boundedness). The Σ over
    * event times of the E and V doubles is floor-scaled to 1e6 LONGs
    * first (a double Σ would re-order between engines). Output 1 row:
    * (n0, n1, n_times, o1, e1, v, z, chi2, p). */
  private[graft] def logRankFromSpans(spans: DataFrame): DataFrame = {
    val byT = spans.groupBy(col("t")).agg(
      sum(when(col("grp") === 1 && !col("__censored"), 1L).otherwise(0L))
        .as("d1"),
      sum(when(col("grp") === 0 && !col("__censored"), 1L).otherwise(0L))
        .as("d0"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c0"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byT.agg(
      coalesce(sum(col("c1")), lit(0L)).as("__N1"),
      coalesce(sum(col("c0")), lit(0L)).as("__N0"))
    val at = byT
      .withColumn("__cum1", sum(col("c1")).over(w))
      .withColumn("__cum0", sum(col("c0")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("n1", col("__N1") - (col("__cum1") - col("c1")))
      .withColumn("n0", col("__N0") - (col("__cum0") - col("c0")))
      .withColumn("nj", col("n0") + col("n1"))
      .withColumn("dj", col("d0") + col("d1"))
      .filter(col("dj") > 0)
    val n1d = col("n1").cast("double")
    val njd = col("nj").cast("double")
    val djd = col("dj").cast("double")
    val e1 = djd * n1d / njd
    val v = when(col("nj") > 1,
      djd * (n1d / njd) * (lit(1.0) - n1d / njd) *
        (njd - djd) / (njd - lit(1.0))).otherwise(lit(0.0))
    val agg = at.agg(
      first(col("__N0")).as("n0"), first(col("__N1")).as("n1"),
      count(lit(1)).as("n_times"),
      coalesce(sum(col("d1")), lit(0L)).as("o1"),
      coalesce(sum(floor(e1 * lit(1e6) + lit(0.5)).cast("long")),
        lit(0L)).as("__se1"),
      coalesce(sum(floor(v * lit(1e6) + lit(0.5)).cast("long")),
        lit(0L)).as("__sv"))
    val e1d = col("__se1").cast("double") / lit(1e6)
    val vd = col("__sv").cast("double") / lit(1e6)
    val z = (col("o1").cast("double") - e1d) / sqrt(vd)
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * tt + lit(-1.821255978)) * tt +
      lit(1.781477937)) * tt + lit(-0.356563782)) * tt +
      lit(0.319381530)) * tt
    val pTwo = lit(2.0) *
      (exp(-(az * az) / lit(2.0)) / lit(2.5066282746310002)) * poly
    val ok = col("__sv") > 0
    import graft.functions.q6
    agg.select(col("n0"), col("n1"), col("n_times"), col("o1"),
      q6(e1d).as("e1"), q6(vd).as("v"),
      q6(when(ok, z)).as("z"),
      q6(when(ok, z * z)).as("chi2"),
      q6(when(ok, least(pTwo, lit(1.0)))).as("p"))
  }

  /** [[logRankFromSpans]] over E25-style ACTIVATION spans: per entity
    * one span, first event → first `targetType` event, censored at
    * `observationEnd`, with the entity's arm from `arm` (must be
    * 0/1-valued and constant per entity — `max` is taken). */
  def activationLogRank(events: DataFrame, arm: Column,
      targetType: String, observationEnd: String,
      c: graft.events.EventCols = graft.events.EventCols()): DataFrame = {
    val spans = events.groupBy(col(c.entity))
      .agg(max(arm.cast("int")).as("grp"),
        min(col(c.ts)).as("__first"),
        min(when(col(c.eventType) === targetType, col(c.ts)))
          .as("__target"))
      .select(col("grp"),
        when(col("__target").isNotNull,
          datediff(to_date(col("__target")), to_date(col("__first"))))
          .otherwise(datediff(lit(observationEnd).cast("date"),
            to_date(col("__first")))).cast("long").as("t"),
        col("__target").isNull.as("__censored"))
      .filter(col("t") >= 0)
    logRankFromSpans(spans)
  }

  /** E25: ACTIVATION SURVIVAL — "what fraction of users go t days from
    * their first touch without reaching `targetType`" (time-to-first-
    * purchase, time-to-first-session-of-depth-k — the activation
    * funnel's denominator-honest form): per user ONE span, first
    * event → first target event, CENSORED at `observationEnd` for
    * users who never converted (dropping them biases activation up —
    * the same mistake E19 guards against for gaps). Same Kaplan–Meier
    * curve kernel, same ordered-window reproducibility argument.
    * Output: (duration_days, n_risk, n_events, n_censored, survival);
    * day-0 conversions (first event IS the target) are a t = 0 row. */
  def activationSurvival(events: DataFrame, targetType: String,
      observationEnd: String,
      c: graft.events.EventCols = graft.events.EventCols()): DataFrame = {
    val spans = events.groupBy(col(c.entity))
      .agg(min(col(c.ts)).as("__first"),
        min(when(col(c.eventType) === targetType, col(c.ts)))
          .as("__target"))
      .select(
        when(col("__target").isNotNull,
          datediff(to_date(col("__target")), to_date(col("__first"))))
          .otherwise(datediff(lit(observationEnd).cast("date"),
            to_date(col("__first")))).cast("long").as("t"),
        col("__target").isNull.as("__censored"))
      .filter(col("t") >= 0)
    kmFromSpans(spans)
  }

  /** The E19/E25 curve kernel over a spans table (`t` long,
    * `__censored` bool) — risk sets and the ordered cumulative ln-sum
    * over DISTINCT durations. */
  private[graft] def kmFromSpans(spans: DataFrame): DataFrame = {
    val byT = spans.groupBy(col("t"))
      .agg(sum(when(!col("__censored"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("__censored"), 1L).otherwise(0L)).as("n_censored"))
    // BOUNDED global windows: byT has one row per DISTINCT span
    // duration — bounded by the observation span in days, not event
    // volume (PlanGuardSpec census).
    val riskW = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val survW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(riskW))
      // d = n can only happen at the longest duration (its risk set is
      // itself): survival hits exactly 0 there — handled as a flag, not
      // as ln(0) (Spark's log(0) is NULL, DuckDB's is -inf: the one
      // place the two engines disagree on the same expression)
      .withColumn("__hit_zero",
        max(when(col("n_events") >= col("n_risk"), 1).otherwise(0))
          .over(survW))
      .withColumn("survival",
        when(col("__hit_zero") === 1, 0.0)
          .otherwise(round(exp(sum(
            when(col("n_events") > 0 && col("n_events") < col("n_risk"),
              log(lit(1.0) - col("n_events").cast("double") /
                col("n_risk"))).otherwise(lit(0.0))).over(survW)), 6)))
      .select(col("t").as("duration_days"), col("n_risk"),
        col("n_events"), col("n_censored"), col("survival"))
  }

  /** E17: DAY-OF-WEEK SEASONALITY STRENGTH per entity — how much of a
    * daily series' variance the weekly profile explains:
    * `strength = 1 − Var(residual)/Var(total)` where the residual is
    * the series minus its per-weekday mean (the R² of the constant
    * day-of-week model — the test run before shipping any
    * day-of-week feature). All variances from exact population moment
    * sums (`Σx²/n − (Σx/n)²` per weekday, summed), mirrored
    * operand-for-operand by the oracle; flat series (zero total
    * variance) yield NULL strength, not a division error. Two
    * aggregates — (entity, dow) then entity — nothing else. Output:
    * (key, n_days, total_var, resid_var, strength), quantized-6 via
    * [[graft.functions.q6]] (engine `round` builtins disagree on
    * half-boundary doubles — see the quantizer's scaladoc).
    *
    * REPRODUCIBILITY (the r9 hash-parity lesson): every float sum
    * whose accumulation order an engine may choose is carried as
    * DECIMAL instead — `value` is 2-decimal, so the daily sum is
    * exact in DECIMAL(18,6) and the moment sums `Σx`/`Σx²` are exact
    * in DECIMAL(28,6)/DECIMAL(38,12). The one remaining float sum —
    * SSE over the ≤7 weekday terms — is pivoted into a FIXED-ORDER
    * dow=1..7 addition (each `sum(when(dow=d))` has at most one
    * operand, so it is exact; the adds happen in expression order).
    * Doubles appear only in per-row arithmetic over those exact
    * operands, which IEEE 754 makes bit-identical across engines. */
  def dowSeasonalityStrength(df: DataFrame, key: String, ts: Column,
      valueCol: Column): DataFrame = {
    val daily = df.groupBy(col(key), to_date(ts).as("__d"))
      .agg(sum(valueCol.cast("decimal(18,2)")).cast("decimal(18,6)")
        .as("__x"))
    val byDow = daily
      .groupBy(col(key), dayofweek(col("__d")).as("__dow"))
      .agg(count(lit(1)).as("__nd"),
        sum(col("__x")).as("__sd"),
        sum(col("__x") * col("__x")).as("__ssd"))
      .withColumn("__td",
        col("__ssd").cast("double") -
          col("__sd").cast("double") * col("__sd").cast("double") /
            col("__nd").cast("double"))
    val sseFixedOrder = (1 to 7)
      .map(d => coalesce(sum(when(col("__dow") === d, col("__td"))),
        lit(0.0)))
      .reduce(_ + _)
    val nD = col("__n").cast("double")
    val sst = col("__ss") - col("__s") * col("__s") / nD
    byDow.groupBy(col(key))
      .agg(sum(col("__nd")).as("__n"),
        sum(col("__sd")).cast("double").as("__s"),
        sum(col("__ssd")).cast("double").as("__ss"),
        sseFixedOrder.as("__sse"))
      .select(col(key), col("__n").as("n_days"),
        graft.functions.q6(sst / nD).as("total_var"),
        graft.functions.q6(col("__sse") / nD).as("resid_var"),
        graft.functions.q6(when(sst > 0, lit(1.0) - col("__sse") / sst))
          .as("strength"))
  }

  /** E18: STL-LITE DECOMPOSITION per entity — the classical
    * moving-average decomposition (the additive classical form, public
    * knowledge; full STL's loess loops are driver-sequential and buy
    * little for a monitor): `trend` = centered 7-observation moving
    * average over the daily series, `seasonal` = per-weekday mean of
    * the detrended series, `remainder` = value − trend − seasonal (the
    * anomaly signal alerts threshold on). Row-frame windows (ROWS
    * BETWEEN 3 PRECEDING AND 3 FOLLOWING) — partial frames at series
    * edges average over the rows that exist, identically in both
    * engines. One (entity, day) aggregate + one entity-keyed window +
    * one (entity, dow)-keyed join (the seasonal table is entities×7
    * rows — NOT broadcast: entities are unbounded at scale, and the
    * join shares the window's entity partitioning); round-6. */
  def stlDecompose(df: DataFrame, key: String, ts: Column,
      valueCol: Column): DataFrame = {
    val c = stlComponents(df, key, ts, valueCol)
    c.select(col(key), col("day"),
      round(col("__x"), 2).as("value"),
      graft.functions.q6(col("__trend")).as("trend"),
      graft.functions.q6(col("__seas")).as("seasonal"),
      graft.functions.q6(col("__x") - col("__trend") - col("__seas"))
        .as("remainder"))
  }

  /** The E18 component derivation with RAW double columns
    * (__x, __trend, __seas) — shared by [[stlDecompose]] (which rounds
    * for display) and [[tsFeatureStrengths]] (which must NOT consume
    * engine-`round`ed values — the half-boundary divergence class). */
  private[graft] def stlComponents(df: DataFrame, key: String,
      ts: Column, valueCol: Column): DataFrame = {
    val daily = df.groupBy(col(key), to_date(ts).as("day"))
      .agg(sum(valueCol).as("__x"))
    val ma = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("__trend", avg(col("__x")).over(ma))
      .withColumn("__det", col("__x") - col("__trend"))
    val seasonal = trended
      .groupBy(col(key).as("__k"), dayofweek(col("day")).as("__dow"))
      .agg(avg(col("__det")).as("__seas"))
    trended
      .join(seasonal,
        trended(key) === col("__k") &&
          dayofweek(col("day")) === col("__dow"))
      .select(trended(key), col("day"), col("__x"), col("__trend"),
        col("__seas"))
  }

  /** E35: TIME-SERIES FEATURE STRENGTHS per entity (Wang, Smith &
    * Hyndman 2006 — the `tsfeatures` decomposition measures, public
    * knowledge): `trend_strength = max(0, 1 − Var(R)/Var(T+R))` and
    * `seasonal_strength = max(0, 1 − Var(R)/Var(S+R))` over the E18
    * STL-lite components — the scalar summaries that let a fleet of
    * series be triaged ("which of 10⁶ metrics are seasonal at all")
    * without eyeballing decomposition plots.
    *
    * Determinism: consumes the RAW [[stlComponents]] doubles (never
    * the display-`round`ed E18 outputs — engine round builtins diverge
    * on half-boundary doubles), quantizes each variance operand to a
    * scaled-1e6 LONG and takes population variances via
    * DECIMAL(38,0) moment sums — order-free at any series length (a
    * raw double Σ over an entity's days would re-order between
    * engines). Output per entity: (key, n_days, trend_strength,
    * seasonal_strength); sub-2-day or zero-variance series emit
    * NULL. */
  def tsFeatureStrengths(df: DataFrame, key: String, ts: Column,
      valueCol: Column): DataFrame = {
    val D = "decimal(38,0)"
    val stl = stlComponents(df, key, ts, valueCol)
    val r = col("__x") - col("__trend") - col("__seas")
    val tr = col("__x") - col("__seas") // T + R
    val sr = col("__x") - col("__trend") // S + R
    def sl(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("long")
    val agg = stl.groupBy(col(key))
      .agg(count(lit(1)).as("n_days"),
        sum(sl(r).cast(D)).as("__sr"),
        sum((sl(r) * sl(r)).cast(D)).as("__qr"),
        sum(sl(tr).cast(D)).as("__st"),
        sum((sl(tr) * sl(tr)).cast(D)).as("__qt"),
        sum(sl(sr).cast(D)).as("__ss"),
        sum((sl(sr) * sl(sr)).cast(D)).as("__qs"))
    val n = col("n_days").cast("double")
    def popVar(q: String, sm: String) =
      (col(q).cast("double") / lit(1e12) -
        (col(sm).cast("double") / lit(1e6)) *
          (col(sm).cast("double") / lit(1e6)) / n) / n
    val vR = popVar("__qr", "__sr")
    val vT = popVar("__qt", "__st")
    val vS = popVar("__qs", "__ss")
    import graft.functions.q6
    agg.select(col(key), col("n_days"),
      q6(when(col("n_days") > 1 && vT > 0,
        greatest(lit(0.0), lit(1.0) - vR / vT))).as("trend_strength"),
      q6(when(col("n_days") > 1 && vS > 0,
        greatest(lit(0.0), lit(1.0) - vR / vS))).as("seasonal_strength"))
  }

  /** E16: CUSUM CHANGEPOINT detection per entity (Page 1954, public
    * knowledge) — the "did this series shift level, and when" monitor:
    * `S_t = Σ_{i≤t} (x_i − x̄)` over the entity's daily series; the
    * day maximizing |S| is the estimated changepoint (the classic
    * at-most-one-changepoint estimator; a flat series has |S| ≈ 0
    * everywhere). One (entity, day) aggregate + one entity-keyed
    * cumulative window — no per-candidate re-scan of the series.
    *
    * Determinism: the argmax ranks on QUANTIZED-6 |S| — quantized via
    * [[graft.functions.q6]], not `round` (engine `round` builtins
    * disagree on half-boundary doubles; two genuinely tied days resolve
    * by earliest day, not float noise). Output: one row per
    * (entity, day) — (key, day, value, cusum, is_changepoint). */
  def cusumChangepoint(df: DataFrame, key: String, ts: Column,
      valueCol: Column): DataFrame =
    cusumFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key)

  /** [[cusumChangepoint]] over an already-aggregated (key, day, __x)
    * daily table — daily sums are associative, which is what lets the
    * streaming daily-aggregate sink's merged view reuse this body
    * verbatim (batch-parity spec-proven).
    *
    * REPRODUCIBILITY (the r9 hash-parity lesson): `S_t = Σ_{i≤t}
    * (x_i − x̄)` is computed as `C_t − t·(S/n)` where the cumulative
    * sum `C_t`, the total `S`, and the count are DECIMAL aggregates —
    * decimal addition is exact and ASSOCIATIVE, so partition order
    * and an engine's window-accumulation strategy (sequential vs
    * segment tree) cannot change them. The only doubles are the final
    * per-row expression over those exact operands — bit-identical
    * across engines under IEEE 754. `__x` of any numeric type is
    * normalized to DECIMAL(18,6) on entry. */
  /** The daily-family DECIMAL(18,6) grid cast with the fail-loud
    * overflow guard — a daily |sum| ≥ 1e12 would NULL out silently and
    * each finisher would corrupt differently (windows skip the day,
    * moments count it, pairs drop it); every `*FromDaily` front shares
    * this instead (the friedman out-of-grid discipline). */
  private[graft] def dailyGrid(c: Column, op: String): Column = {
    val cd = c.cast("decimal(18,6)")
    when(c.isNotNull && cd.isNull,
      raise_error(lit(s"$op: daily sum outside the DECIMAL(18,6) " +
        "grid — rescale first")))
      .otherwise(cd)
  }

  private[graft] def cusumFromDaily(daily0: DataFrame, key: String)
      : DataFrame = {
    val daily = daily0
      .withColumn("__x", dailyGrid(col("__x"), "cusum"))
    val wp = Window.partitionBy(col(key))
    val ord = Window.partitionBy(col(key)).orderBy(col("day"))
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val scored = daily
      .withColumn("__s", sum(col("__x")).over(wp))
      .withColumn("__n", count(lit(1)).over(wp))
      .withColumn("__c", sum(col("__x")).over(cum))
      .withColumn("__t", row_number().over(ord))
      .withColumn("cusum",
        col("__c").cast("double") -
          col("__t").cast("double") * col("__s").cast("double") /
            col("__n").cast("double"))
    val rank = Window.partitionBy(col(key))
      .orderBy(graft.functions.q6(abs(col("cusum"))).desc, col("day"))
    scored
      .withColumn("is_changepoint",
        (row_number().over(rank) === 1).cast("int"))
      .select(col(key), col("day"),
        graft.functions.quantize(col("__x").cast("double"), 2).as("value"),
        graft.functions.q6(col("cusum")).as("cusum"), col("is_changepoint"))
  }

  /** E36: PETTITT RANK-BASED CHANGEPOINT TEST per entity (Pettitt
    * 1979, public knowledge) — the NONPARAMETRIC companion of [[E16
    * cusumChangepoint]]: CUSUM estimates WHERE the mean shifted
    * (assuming the mean is the story); Pettitt tests WHETHER the
    * distribution shifted at all — `U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i−x_j)`
    * (a Mann–Whitney at every cut), `K = max_t |U_t|`, the classic
    * p ≈ 2·exp(−6K²/(n³+n²)), robust to the heavy-tailed dailies that
    * make a CUSUM argmax chase one outlier.
    *
    * Exactness + scale: U_t collapses to EXACT INTEGERS via the rank
    * identity `U_t = Σ_{i≤t} 2r̄_i − t(n+1)` (the doubled average
    * ranks `2r̄ = 2·rank + ties − 1` are integers even at tie
    * midpoints, and the t(n+1) shift makes U_t itself integral);
    * ranks, tie counts, the day-prefix sum and the max all ride
    * ENTITY-KEYED windows (never global); ties on |U| resolve to the
    * EARLIEST day. Only the published p is a double (one pinned
    * exp tree, clamped to 1, q6); `significant` compares the
    * UNQUANTIZED clamp to alpha. Single-day entities emit NULL
    * p/significant. Output: one row per entity —
    * (key, n_days, k = max|U|, changepoint_day, p, significant). */
  def pettittChangepoint(df: DataFrame, key: String, ts: Column,
      valueCol: Column, alpha: Double = 0.05): DataFrame =
    pettittFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key, alpha)

  /** [[pettittChangepoint]] over an already-aggregated (key, day, __x)
    * daily table — the associative-daily-sum contract [[cusumFromDaily]]
    * established, so a streaming daily-aggregate view could reuse this
    * body verbatim. */
  private[graft] def pettittFromDaily(daily0: DataFrame, key: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val daily = daily0.withColumn("__x",
      dailyGrid(col("__x"), "pettitt"))
    val wRank = Window.partitionBy(col(key)).orderBy(col("__x"))
    val wTie = Window.partitionBy(col(key), col("__x"))
    val wDayOrd = Window.partitionBy(col(key)).orderBy(col("day"))
    val wDayCum = wDayOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wKey = Window.partitionBy(col(key))
    val ranked = daily
      .withColumn("__r2", lit(2L) * rank().over(wRank).cast("long") +
        count(lit(1)).over(wTie).cast("long") - lit(1L))
      .withColumn("__t", row_number().over(wDayOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey).cast("long"))
      .withColumn("__v", sum(col("__r2")).over(wDayCum) -
        col("__t") * (col("__n") + lit(1L)))
      .withColumn("__av", abs(col("__v")))
      .withColumn("__k", max(abs(col("__v"))).over(wKey))
    val agg = ranked.groupBy(col(key))
      .agg(first(col("__n")).as("n_days"), first(col("__k")).as("k"),
        min(when(col("__av") === col("__k"), col("day"))).as("__cp"))
    val nD = col("n_days").cast("double")
    val kD = col("k").cast("double")
    val p = least(lit(2.0) * exp(lit(-6.0) * (kD * kD) /
      (nD * nD * nD + nD * nD)), lit(1.0))
    agg.select(col(key), col("n_days"), col("k"),
      date_format(col("__cp"), "yyyy-MM-dd").as("changepoint_day"),
      graft.functions.q6(when(col("n_days") > 1, p)).as("p"),
      when(col("n_days") > 1, (p < alpha).cast("int")).as("significant"))
  }

  /** E37: MANN–KENDALL TREND TEST per entity (Mann 1945 / Kendall
    * 1975, public knowledge) — the nonparametric IS-there-a-trend
    * verdict that pairs with F55's Theil–Sen HOW-BIG slope (the
    * classic combo: MK decides, Theil–Sen sizes; E16/E36 ask WHERE it
    * broke instead). `S = Σ_{t<u} sgn(x_u − x_t)` over the entity's
    * day-ordered daily sums; tie-corrected normal variance
    * `Var(S) = (n(n−1)(2n+5) − Σ_j t_j(t_j−1)(2t_j+5))/18`; the
    * continuity-corrected `z = (S ∓ 1)/√Var` (0 at S = 0).
    *
    * Exactness: daily sums compare in DECIMAL (exact), S and the tie
    * spectrum are exact integers, Var's numerator is exact integer
    * arithmetic with ONE division by 18, z is one pinned tree
    * published q6. n < 2 or zero variance (all days tied) ⇒ NULL z.
    *
    * Scale shape: the pair stage is an ENTITY-KEYED self-join on
    * day < day — per-entity O(n²) BOUNDED BY CONSTRUCTION: n is the
    * entity's count of observed DAYS (calendar-bounded; a year of
    * dailies is 365 days = 66k pairs), never event volume — the
    * dailies pre-aggregate exactly like E16/E36. One entity-keyed
    * exchange feeds both join sides (co-partitioned), the tie
    * spectrum is a second aggregate over the same cached dailies.
    * Output: (key, n_days, s, var_s, z). */
  def mannKendall(df: DataFrame, key: String, ts: Column,
      valueCol: Column): DataFrame =
    mannKendallFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key)

  /** [[mannKendall]] over an already-aggregated (key, day, __x) daily
    * table — the associative-daily-sum contract of [[cusumFromDaily]]
    * and [[pettittFromDaily]]. */
  private[graft] def mannKendallFromDaily(daily0: DataFrame,
      key: String): DataFrame = {
    val daily = graft.util.Caches.persistTracked(
      daily0.select(col(key), col("day"),
        dailyGrid(col("__x"), "mannKendall").as("__x")))
    val a = daily.select(col(key), col("day").as("__da"),
      col("__x").as("__xa"))
    val b = daily.select(col(key).as("__kb"), col("day").as("__db"),
      col("__x").as("__xb"))
    val pairS = a.join(b, col(key) === col("__kb") &&
        col("__da") < col("__db"))
      .groupBy(col(key))
      .agg(sum(when(col("__xb") > col("__xa"), 1L)
        .when(col("__xb") < col("__xa"), -1L)
        .otherwise(0L)).as("s"))
    val ties = daily.groupBy(col(key), col("__x"))
      .agg(count(lit(1)).as("__tj"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("__nv"),
        sum(col("__tj")).as("n_days"),
        sum(col("__tj") * (col("__tj") - lit(1L)) *
          (lit(2L) * col("__tj") + lit(5L))).as("__tieTerm"))
    val n = col("n_days")
    val varNum = n * (n - lit(1L)) * (lit(2L) * n + lit(5L)) -
      col("__tieTerm")
    val sC = coalesce(col("s"), lit(0L))
    val varS = varNum.cast("double") / lit(18.0)
    val z = when(sC > 0, (sC.cast("double") - lit(1.0)) / sqrt(varS))
      .when(sC < 0, (sC.cast("double") + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    import graft.functions.q6
    ties.join(pairS, Seq(key), "left")
      .select(col(key), col("n_days"), sC.as("s"),
        q6(varS).as("var_s"),
        q6(when(n >= 2 && varNum > 0, z)).as("z"))
  }

  /** E39: SEASONAL MANN–KENDALL trend test per entity (Hirsch & Slack
    * 1984, public knowledge) — the seasonality-robust form of E37: a
    * metric with a weekly rhythm (weekday traffic ≫ weekends) feeds
    * plain MK pairs that compare Mondays to Sundays and drowns a real
    * week-over-week trend in seasonal noise. Hirsch–Slack compares
    * LIKE WITH LIKE: the MK statistic runs WITHIN each season (default
    * season = day-of-week), then `S' = Σ_m S_m`, `Var' = Σ_m Var_m`
    * (independent seasons — the basic form without the serial-
    * correlation covariance term, as stated), z with the ±1 continuity
    * correction.
    *
    * Exactness: the E37 discipline verbatim — daily sums exact
    * DECIMAL, per-season S and tie-corrected variance numerators exact
    * BIGINT summed per key, ONE /18 division, one fixed z tree, q6.
    * Scale: the pair join is (key, season)-keyed — CHEAPER than plain
    * MK's (key)-keyed join (Σ n_m² < n²), calendar-bounded per key.
    * Output per entity: (key, n_seasons, n_days, s, var_s, z) — z NULL
    * when every season is degenerate (Var' = 0). */
  def seasonalMannKendall(df: DataFrame, key: String, ts: Column,
      valueCol: Column,
      seasonOf: Column => Column = dayofweek): DataFrame =
    seasonalMannKendallFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key,
      seasonOf)

  /** [[seasonalMannKendall]] over an already-aggregated (key, day,
    * __x) daily table — the associative-daily-sum contract of the
    * whole `*FromDaily` family, so the dailyAggSink store feeds this
    * as its fifth view. */
  private[graft] def seasonalMannKendallFromDaily(daily0: DataFrame,
      key: String, seasonOf: Column => Column = dayofweek)
      : DataFrame = {
    val daily = graft.util.Caches.persistTracked(
      daily0.select(col(key), col("day"),
        seasonOf(col("day")).cast("int").as("__sn"),
        dailyGrid(col("__x"), "seasonalMannKendall").as("__x")))
    val a = daily.select(col(key), col("__sn"), col("day").as("__da"),
      col("__x").as("__xa"))
    val b = daily.select(col(key).as("__kb"), col("__sn").as("__snb"),
      col("day").as("__db"), col("__x").as("__xb"))
    val pairS = a.join(b, col(key) === col("__kb") &&
        col("__sn") === col("__snb") && col("__da") < col("__db"))
      .groupBy(col(key))
      .agg(sum(when(col("__xb") > col("__xa"), 1L)
        .when(col("__xb") < col("__xa"), -1L)
        .otherwise(0L)).as("s"))
    val perSeason = daily.groupBy(col(key), col("__sn"), col("__x"))
      .agg(count(lit(1)).as("__tj"))
      .groupBy(col(key), col("__sn"))
      .agg(sum(col("__tj")).as("__nm"),
        sum(col("__tj") * (col("__tj") - lit(1L)) *
          (lit(2L) * col("__tj") + lit(5L))).as("__tieTerm"))
    val perKey = perSeason.groupBy(col(key))
      .agg(count(lit(1)).as("n_seasons"),
        sum(col("__nm")).as("n_days"),
        sum(col("__nm") * (col("__nm") - lit(1L)) *
          (lit(2L) * col("__nm") + lit(5L)) - col("__tieTerm"))
          .as("__varNum"))
    val sC = coalesce(col("s"), lit(0L))
    val varS = col("__varNum").cast("double") / lit(18.0)
    val z = when(sC > 0, (sC.cast("double") - lit(1.0)) / sqrt(varS))
      .when(sC < 0, (sC.cast("double") + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    import graft.functions.q6
    perKey.join(pairS, Seq(key), "left")
      .select(col(key), col("n_seasons"), col("n_days"), sC.as("s"),
        q6(varS).as("var_s"),
        q6(when(col("n_days") >= 2 && col("__varNum") > 0, z)).as("z"))
  }

  /** E40: SEASONAL THEIL–SEN SLOPE per entity (Hirsch, Slack & Smith
    * 1982's seasonal Kendall slope — public knowledge): the HOW-BIG
    * companion of [[seasonalMannKendall]] exactly as F55 Theil–Sen
    * pairs with E37 MK — "the metric rises 2.3 units/day, judged only
    * on like-with-like comparisons": pairwise slopes `(x_j − x_i) /
    * (day_j − day_i)` are taken WITHIN each season (default
    * day-of-week) and the estimate is the MEDIAN of all seasons'
    * slopes pooled per entity — cross-season level differences (the
    * weekend cliff) never enter a pair.
    *
    * Exactness: daily sums exact DECIMAL; each slope is ONE division
    * of the exact value difference by the exact integer day gap; the
    * median uses the F55 kernel — group-keyed RANK picks of the two
    * middle slopes, `lo + (hi − lo)·0.5` midpoint (identical
    * cross-engine). Scale: pairs are (key, season)-keyed and
    * calendar-bounded (dailies, Σ n_m² per key); the median is a
    * group-keyed window, never global. Output per entity:
    * (key, n_seasons, n_days, n_pairs, slope) — slope NULL when no
    * within-season pair exists. */
  def seasonalTheilSen(df: DataFrame, key: String, ts: Column,
      valueCol: Column,
      seasonOf: Column => Column = dayofweek): DataFrame =
    seasonalTheilSenFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key,
      seasonOf)

  /** [[seasonalTheilSen]] over an already-aggregated (key, day, __x)
    * daily table — the `*FromDaily` contract, so the dailyAggSink
    * store feeds this as its sixth view. */
  private[graft] def seasonalTheilSenFromDaily(daily0: DataFrame,
      key: String, seasonOf: Column => Column = dayofweek)
      : DataFrame = {
    val daily = graft.util.Caches.persistTracked(
      daily0.select(col(key), col("day"),
        seasonOf(col("day")).cast("int").as("__sn"),
        dailyGrid(col("__x"), "seasonalTheilSen").as("__x")))
    val counts = daily.groupBy(col(key))
      .agg(count_distinct(col("__sn")).as("n_seasons"),
        count(lit(1)).as("n_days"))
    val a = daily.select(col(key), col("__sn"), col("day").as("__da"),
      col("__x").as("__xa"))
    val b = daily.select(col(key).as("__kb"), col("__sn").as("__snb"),
      col("day").as("__db"), col("__x").as("__xb"))
    val pairs = a.join(b, col(key) === col("__kb") &&
        col("__sn") === col("__snb") && col("__da") < col("__db"))
      .select(col(key),
        ((col("__xb") - col("__xa")).cast("double") /
          datediff(col("__db"), col("__da")).cast("double")).as("__m"))
    val wm = Window.partitionBy(col(key)).orderBy(col("__m"))
    val ranked = pairs
      .withColumn("__rn", row_number().over(wm))
      .withColumn("__np", count(lit(1))
        .over(Window.partitionBy(col(key))))
    val med = ranked
      .filter(col("__rn") === expr("(__np + 1) div 2") ||
        col("__rn") === expr("(__np + 2) div 2"))
      .groupBy(col(key))
      .agg(max(col("__np")).as("n_pairs"),
        (min(col("__m")) +
          (max(col("__m")) - min(col("__m"))) * lit(0.5))
          .as("__slope"))
    import graft.functions.q6
    counts.join(med, Seq(key), "left")
      .select(col(key), col("n_seasons"), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        q6(col("__slope")).as("slope"))
  }

  /** E41: SIGMA-CLIPPED ANOMALOUS DAYS per entity (iterative sigma
    * clipping — the astronomy-standard robust outlier sweep, e.g.
    * Bertin's SExtractor lineage; public knowledge): the POINT-anomaly
    * complement of the changepoint family — E16/E36 find level SHIFTS,
    * E38 fires online; this flags the individual days whose value sits
    * beyond `nSigma` standard deviations of the entity's OTHER days,
    * with the moments re-fit after each clip round so one huge spike
    * can't inflate σ and hide its smaller siblings (the single-pass
    * z-score's classic masking failure).
    *
    * Exactness: daily sums exact DECIMAL; each round's mean/sd are
    * fixed IEEE trees over exact (n, Σx, Σx²); the clip decision
    * `|x − mean| > nSigma·sd` is the same tree cross-engine. Rounds
    * are a FIXED `maxIter` (deterministic plan, oracle unrolls the
    * same rounds); each round is persisted so the iterated lineage
    * stays linear (the CC-loop discipline). Keys need ≥ 3 unclipped
    * days and sd > 0 to clip further (a 2-day entity can't vote a day
    * out). Output: one row per CLIPPED day — (key, day, value, z =
    * the day against the FINAL surviving moments, clip_iter), ordered.
    * Scale: maxIter × (one key aggregate + one key join), dailies
    * only — never event volume. */
  def anomalousDays(df: DataFrame, key: String, ts: Column,
      valueCol: Column, nSigma: Double = 3.0, maxIter: Int = 3)
      : DataFrame = {
    require(nSigma > 0, s"nSigma must be > 0, got $nSigma")
    require(maxIter >= 1 && maxIter <= 10,
      s"maxIter must be in [1, 10], got $maxIter")
    val daily0 = df.groupBy(col(key), to_date(ts).as("day"))
      .agg(sum(valueCol.cast("decimal(18,2)")).as("__x"))
    anomalousDaysFromDaily(daily0, key, nSigma, maxIter)
  }

  /** [[anomalousDays]] over an already-aggregated (key, day, __x)
    * daily table — the `*FromDaily` contract (seventh dailyAggSink
    * view). */
  private[graft] def anomalousDaysFromDaily(daily0: DataFrame,
      key: String, nSigma: Double, maxIter: Int): DataFrame = {
    var cur = graft.util.Caches.persistTracked(
      daily0.select(col(key), col("day"),
        dailyGrid(col("__x"), "anomalousDays").as("__x"),
        lit(0).as("__clip")))
    def moments(of: DataFrame) = of.filter(col("__clip") === 0)
      .groupBy(col(key))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__q"))
    def meanSd = {
      val n = col("__n").cast("double")
      val s = col("__s").cast("double")
      val q = col("__q").cast("double")
      (s / n, sqrt((q - s * s / n) / (n - lit(1.0))))
    }
    for (i <- 1 to maxIter) {
      val (mean, sd) = meanSd
      cur = graft.util.Caches.persistTracked(
        cur.join(moments(cur), Seq(key), "left")
          .withColumn("__clip",
            when(col("__clip") === 0 && col("__n") >= 3 && sd > 0 &&
              abs(col("__x").cast("double") - mean) > lit(nSigma) * sd,
              lit(i)).otherwise(col("__clip")))
          .select(col(key), col("day"), col("__x"), col("__clip")))
    }
    val (meanF, sdF) = meanSd
    import graft.functions.q6
    cur.filter(col("__clip") > 0)
      .join(moments(cur), Seq(key), "left")
      .select(col(key),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("__x").cast("double").as("value"),
        q6(when(col("__n") >= 2 && sdF > 0,
          (col("__x").cast("double") - meanF) / sdF)).as("z"),
        col("__clip").as("clip_iter"))
      .orderBy(col(key), col("day"))
  }

  /** E42: WALD–WOLFOWITZ RUNS TEST per entity (Wald & Wolfowitz 1940,
    * public knowledge) — IS the daily series RANDOM around its level,
    * or does it cluster? The diagnostic the trend family can't give:
    * MK/Pettitt see monotone or one-break structure; a series that
    * oscillates in multi-day clumps (autocorrelated incidents,
    * weekly batching) passes both yet fails runs. Days dichotomize
    * against the entity's LOWER MEDIAN (the D28 grid discipline —
    * exact, engine-identical); days equal to the median are excluded
    * (standard). R = observed runs of consecutive same-side days (in
    * day order), `μ = 1 + 2n₁n₂/N`, `σ² = 2n₁n₂(2n₁n₂−N)/(N²(N−1))`,
    * z = (R−μ)/σ: z < 0 ⇒ clumping, z > 0 ⇒ over-alternation.
    *
    * Exactness: R/n₁/n₂ exact integers (run starts via an entity-keyed
    * day-ordered lag — calendar-bounded windows); μ/σ²/z one fixed
    * IEEE tree over the exact integers, published q6. Degenerate
    * entities (n₁ = 0 or n₂ = 0 or N < 2) emit NULL z. Output per
    * entity: (key, n_days, n_above, n_below, runs, z). */
  def runsTest(df: DataFrame, key: String, ts: Column,
      valueCol: Column): DataFrame =
    runsTestFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key)

  /** [[runsTest]] over an already-aggregated (key, day, __x) daily
    * table — the `*FromDaily` contract (eighth dailyAggSink view). */
  private[graft] def runsTestFromDaily(daily0: DataFrame, key: String)
      : DataFrame = {
    val daily = graft.util.Caches.persistTracked(
      daily0.select(col(key), col("day"),
        dailyGrid(col("__x"), "runsTest").as("__x")))
    // lower median on the value grid (the brownForsythe selection)
    val wOrd = Window.partitionBy(col(key)).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy(col(key))
    val med = daily.groupBy(col(key), col("__x"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wk))
      .filter(col("__cum") * lit(2) >= col("__n"))
      .groupBy(col(key)).agg(min(col("__x")).as("__med"))
    val sided = daily.join(med, Seq(key))
      .filter(col("__x") =!= col("__med"))
      .withColumn("__s", (col("__x") > col("__med")).cast("int"))
    val lagW = Window.partitionBy(col(key)).orderBy(col("day"))
    val agg = sided
      .withColumn("__prev", lag(col("__s"), 1).over(lagW))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__s").cast("long")).as("n_above"),
        sum(lit(1L) - col("__s")).as("n_below"),
        sum(when(col("__prev").isNull ||
          col("__prev") =!= col("__s"), 1L).otherwise(0L)).as("runs"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val nn = n1 + n2
    val mu = lit(1.0) + lit(2.0) * n1 * n2 / nn
    val varR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn) /
      (nn * nn * (nn - lit(1.0)))
    val z = (col("runs").cast("double") - mu) / sqrt(varR)
    import graft.functions.q6
    agg.select(col(key), col("n_days"), col("n_above"),
      col("n_below"), col("runs"),
      q6(when(col("n_above") > 0 && col("n_below") > 0 &&
        col("n_days") >= 2 && varR > 0, z)).as("z"))
  }

  /** E43: SERIES AUTOCORRELATION per entity (the textbook sample ACF,
    * Box & Jenkins — public knowledge): `r_l = Σ_{t≤n−l}(x_t−x̄)
    * (x_{t+l}−x̄) / Σ_t(x_t−x̄)²` with ONE shared denominator (the
    * full-series variance) and lags indexing the OBSERVED day-ordered
    * series (gaps compress — the *FromDaily family convention).
    * The complement of [[autocorrelation]] (E20), whose lags are
    * CALENDAR days and whose per-lag moments renormalize over each
    * lag's own pair set: E20 reads calendar seasonality through gaps,
    * E43 is the Box–Jenkins spectrum a model-identification step
    * expects — and, unlike E20, it is exactly mergeable from the
    * streaming daily store (the shared denominator needs only
    * full-series moments, so [[acfFromDaily]] is the ninth
    * dailyAggSink view).
    *
    * Exactness: daily sums on the DECIMAL(18,6) grid → micro LONGs;
    * centering multiplies through by n (`c_t = n·x_t − S`, exact in
    * DECIMAL(38,0) — the mean never materializes as a double), so
    * numerator and denominator are exact integers whose shared n²·10¹²
    * scale cancels in the ratio; ONE pinned double division per lag,
    * published q6. |c| is guarded below 3·10¹⁶ so squares and their
    * sums stay inside DECIMAL(38,0) for ≤ 10⁴ observed days (fail
    * loud — the friedman out-of-grid discipline).
    *
    * Scale: one (entity, day) aggregate, ONE entity-keyed window pass
    * carrying maxLag lead columns (calendar-bounded partitions — no
    * self-join, no global order), one aggregate, one bounded unpivot.
    * Output: (key, lag, n_days, n_pairs, r) for every lag 1..maxLag;
    * r is NULL when the lag has no pairs or the series is constant. */
  def seriesAutocorrelation(df: DataFrame, key: String, ts: Column,
      valueCol: Column, maxLag: Int = 7): DataFrame =
    acfFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")), key, maxLag)

  /** [[seriesAutocorrelation]] over an already-aggregated
    * (key, day, __x) daily table — the `*FromDaily` contract (ninth
    * dailyAggSink view). */
  private[graft] def acfFromDaily(daily0: DataFrame, key: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"maxLag must be in [1, 64], got $maxLag")
    val D = "decimal(38,0)"
    val ord = Window.partitionBy(col(key)).orderBy(col("day"))
    val wk = Window.partitionBy(col(key))
    val bound = lit(BigDecimal("30000000000000000")).cast(D)
    val base = daily0.select(col(key), col("day"),
        (dailyGrid(col("__x"), "acf") * lit(1000000L)).cast("long")
          .as("__m"))
      .withColumn("__n", count(lit(1)).over(wk).cast("long"))
      .withColumn("__s", sum(col("__m").cast(D)).over(wk))
      .withColumn("__c0",
        col("__n").cast(D) * col("__m").cast(D) - col("__s"))
      .withColumn("__c",
        when(abs(col("__c0")) >= bound,
          raise_error(lit("acf: centered daily magnitude above the " +
            "exact-moment bound (3e16 micro) — rescale first")))
          .otherwise(col("__c0")))
    val leads = base.select(
      col(key) +: col("__n") +: col("__c") +:
        (1 to maxLag).map(l =>
          lead(col("__c"), l).over(ord).as(s"__l$l")): _*)
    val aggCols =
      first(col("__n")).as("n_days") +:
        sum(col("__c") * col("__c")).as("__den") +:
        (1 to maxLag).flatMap(l => Seq(
          sum(col("__c") * col(s"__l$l")).as(s"__num$l"),
          count(col(s"__l$l")).as(s"__np$l")))
    val agg = leads.groupBy(col(key))
      .agg(aggCols.head, aggCols.tail: _*)
    // bounded unpivot: maxLag (lag, num, pairs) triples per entity
    val stacked = agg.selectExpr(
      Seq(key, "n_days", "__den") :+
        (s"stack($maxLag, " + (1 to maxLag).map(l =>
          s"$l, __num$l, __np$l").mkString(", ") +
          ") AS (lag, __num, n_pairs)"): _*)
    import graft.functions.q6
    stacked.select(col(key), col("lag").cast("long").as("lag"),
      col("n_days"), col("n_pairs"),
      q6(when(col("n_pairs") > 0 && col("__den") > 0,
        col("__num").cast("double") / col("__den").cast("double")))
        .as("r"))
  }

  /** E38: PAGE–HINKLEY SEQUENTIAL DRIFT DETECTOR per entity (Page
    * 1954; the streaming-drift form popularized by Gama et al. 2004 —
    * public knowledge): the ONLINE companion of the offline
    * changepoint family — E16 CUSUM estimates where the mean shifted
    * in hindsight, E36 Pettitt tests whether; Page–Hinkley answers
    * "WHEN would a monitor reading this series day by day have
    * FIRED?", with the δ (drift tolerance) / λ (alarm threshold)
    * knobs every production drift monitor exposes. `U_t = Σ_{i≤t}
    * (x_i − x̄_i − δ)` against the RUNNING mean, `PH_t = U_t −
    * min_{s≤t} U_s`, alarm at the first `PH_t > λ`.
    *
    * Exactness (the cusumFromDaily lesson, taken one step further):
    * a cumulative sum of per-step DOUBLES is engine-unstable (window
    * accumulation strategies differ), so the whole recursion runs on
    * MICRO-INTEGERS — daily sums exact in DECIMAL(18,6) → ×10⁶
    * LONGs; the running mean is the TRUNCATING integer division
    * `C_t div t` (Spark `div` ≡ DuckDB `//`, both toward zero), a
    * documented ≤1-micro-per-step quantization of the textbook mean
    * that buys bit-identical integer U/PH on every engine; δ and λ
    * quantize to micros the same way. Integer addition is
    * associative — no window-strategy hazard. Contract: cumulative
    * micro sums must stay inside BIGINT (|Σx|·10⁶ < 9.2·10¹⁸ — a
    * 10¹²/day series for 3 centuries).
    *
    * Scale: one (entity, day) aggregate + one chain of ENTITY-KEYED
    * windows (calendar-bounded partitions), no joins, no global
    * order. `detectIncrease = false` monitors a mean DROP (term
    * flips). Output per entity: (key, n_days, ph_max, alarm_day —
    * first firing day or NULL, alarmed). */
  def pageHinkley(df: DataFrame, key: String, ts: Column,
      valueCol: Column, delta: Double = 0.0, lambda: Double,
      detectIncrease: Boolean = true): DataFrame = {
    require(lambda > 0, s"pageHinkley: lambda must be > 0, got $lambda")
    pageHinkleyFromDaily(
      df.groupBy(col(key), to_date(ts).as("day"))
        .agg(sum(valueCol.cast("decimal(18,2)")).as("__x")),
      key, delta, lambda, detectIncrease)
  }

  /** [[pageHinkley]] over an already-aggregated (key, day, __x) daily
    * table — the associative-daily-sum contract shared with
    * [[cusumFromDaily]] / [[pettittFromDaily]] / [[mannKendallFromDaily]],
    * so a streaming daily-cell sink can reuse this finish verbatim. */
  private[graft] def pageHinkleyFromDaily(daily0: DataFrame, key: String,
      delta: Double, lambda: Double, detectIncrease: Boolean)
      : DataFrame = {
    val deltaMicro = math.floor(delta * 1e6 + 0.5).toLong
    val lambdaMicro = math.floor(lambda * 1e6 + 0.5).toLong
    val ord = Window.partitionBy(col(key)).orderBy(col("day"))
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // guard the grid cast: a daily |sum| ≥ 1e12 would NULL out of the
    // DECIMAL(18,6) cast and the windowed sums would silently skip that
    // day, corrupting C_t/U_t/ph_max — fail loud instead (the friedman
    // out-of-grid discipline; the docstring's BIGINT contract, enforced)
    val xd = col("__x").cast("decimal(18,6)")
    val daily = daily0.select(col(key), col("day"),
      (when(col("__x").isNotNull && xd.isNull,
        raise_error(lit("pageHinkley: daily sum outside the " +
          "DECIMAL(18,6) grid — rescale first")))
        .otherwise(xd) * lit(1000000L)).cast("long").as("__xm"))
    val term =
      if (detectIncrease)
        col("__xm") - expr("__cm div __t") - lit(deltaMicro)
      else expr("__cm div __t") - col("__xm") - lit(deltaMicro)
    val scored = daily
      .withColumn("__t", row_number().over(ord).cast("long"))
      .withColumn("__cm", sum(col("__xm")).over(cum))
      .withColumn("__term", term)
      .withColumn("__u", sum(col("__term")).over(cum))
      .withColumn("__minu", min(col("__u")).over(cum))
      .withColumn("__ph", col("__u") - col("__minu"))
    scored.groupBy(col(key))
      .agg(count(lit(1)).as("n_days"),
        max(col("__ph")).as("__phmax"),
        min(when(col("__ph") > lambdaMicro, col("day"))).as("__alarm"))
      .select(col(key), col("n_days"),
        graft.functions.q6(col("__phmax").cast("double") / lit(1e6))
          .as("ph_max"),
        date_format(col("__alarm"), "yyyy-MM-dd").as("alarm_day"),
        col("__alarm").isNotNull.cast("int").as("alarmed"))
  }

  /** E34: CROSS-CORRELATION FUNCTION between two daily series (the
    * lead/lag detector: "do errors LEAD purchases down, and by how
    * many days?" — Box & Jenkins, public knowledge). Builds the two
    * daily value sums, then for every lag l in [−maxLag, maxLag]
    * correlates (x_t, y_{t+l}) over the overlapping days:
    * positive-lag peaks mean x leads y.
    *
    * Exactness: daily sums and all five per-lag moments are DECIMAL
    * (2-decimal values — exact, order-free); r_l is one fixed IEEE
    * tree per lag (the Spearman discipline). Shapes: two day-bounded
    * aggregates, a lag-grid × days join (days × (2L+1) rows — bounded
    * by calendar, not event volume), one per-lag aggregate. Lags with
    * < 3 overlapping days or a constant side emit NULL r. Output:
    * (lag, n_days, r). */
  def crossCorrelation(events: DataFrame, ts: Column, valueA: Column,
      valueB: Column, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val D = "decimal(38,12)"
    val daily = events.groupBy(to_date(ts).as("__d"))
      .agg(
        coalesce(sum(valueA.cast("decimal(18,2)")), lit(
          java.math.BigDecimal.ZERO).cast("decimal(18,2)"))
          .cast("decimal(18,6)").as("__x"),
        coalesce(sum(valueB.cast("decimal(18,2)")), lit(
          java.math.BigDecimal.ZERO).cast("decimal(18,2)"))
          .cast("decimal(18,6)").as("__y"))
    val a = daily.select(col("__d"), col("__x"))
    val b = daily.select(col("__d").as("__d2"), col("__y"))
    val lags = events.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val joined = a.crossJoin(broadcast(lags))
      .join(b, col("__d2") === date_add(col("__d"), col("lag")))
    val agg = joined.groupBy(col("lag")).agg(
      count(lit(1)).as("n_days"),
      sum(col("__x").cast(D)).as("__sx"),
      sum(col("__y").cast(D)).as("__sy"),
      sum((col("__x") * col("__y")).cast(D)).as("__sxy"),
      sum((col("__x") * col("__x")).cast(D)).as("__sxx"),
      sum((col("__y") * col("__y")).cast(D)).as("__syy"))
    val n = col("n_days").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val vx = n * d("__sxx") - d("__sx") * d("__sx")
    val vy = n * d("__syy") - d("__sy") * d("__sy")
    agg.select(col("lag"), col("n_days"),
      graft.functions.q6(when(col("n_days") >= 3 && vx > 0 && vy > 0,
        num / (sqrt(vx) * sqrt(vy)))).as("r"))
  }

  /** E20: AUTOCORRELATION FUNCTION of a daily series per entity at
    * calendar lags 1..`maxLag` — the seasonality / persistence
    * detector run before committing to any lag feature (a weekly
    * rhythm shows as a spike at lag 7): `acf_k = Σ(x_t − x̄)(x_{t+k} −
    * x̄) / Σ(x_t − x̄)²` with the numerator over day-pairs exactly k
    * calendar days apart (gap days contribute no pair — documented;
    * resample first for the contiguous-series reading).
    *
    * REPRODUCIBILITY (the E16/E17 discipline): every engine-ordered
    * sum is DECIMAL-exact — the daily sums, the per-(entity, lag) pair
    * moments `Σx_t`, `Σx_{t+k}`, `Σx_t·x_{t+k}` and the per-entity
    * moments — and the mean and the final ratio are a fixed IEEE
    * expression tree over those exact operands. Flat series (zero
    * variance) yield NULL acf, not a division error.
    *
    * Scale: one (entity, day) aggregate, a ×maxLag contribution
    * explode, one entity-keyed equi-join on (key, day+k) — all
    * entity-partitioned; no windows. Output: (key, lag, n_pairs, acf)
    * for lags with ≥ 1 pair, round-6. */
  def autocorrelation(df: DataFrame, key: String, ts: Column,
      valueCol: Column, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = graft.util.Caches.persistTracked(
      df.groupBy(col(key), to_date(ts).as("__d"))
        .agg(sum(valueCol.cast("decimal(18,2)")).cast("decimal(18,6)")
          .as("__x")))
    val mom = daily.groupBy(col(key))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val base = daily.select(col(key), col("__d"), col("__x"),
      explode(sequence(lit(1), lit(maxLag))).as("lag"))
    val ahead = daily.select(col(key).as("__k2"),
      col("__d").as("__d2"), col("__x").as("__x2"))
    val pairs = base.join(ahead,
        col(key) === col("__k2") &&
          expr("date_add(__d, lag)") === col("__d2"))
      .groupBy(col(key), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sa"), sum(col("__x2")).as("__sb"),
        sum(col("__x") * col("__x2")).as("__sab"))
    val m = col("__sx").cast("double") / col("__n").cast("double")
    val den = col("__sxx").cast("double") -
      col("__n").cast("double") * m * m
    val num = col("__sab").cast("double") -
      m * col("__sa").cast("double") - m * col("__sb").cast("double") +
      col("n_pairs").cast("double") * m * m
    pairs.join(mom, key)
      .select(col(key), col("lag").cast("long").as("lag"),
        col("n_pairs"),
        graft.functions.q6(when(den > 0, num / den)).as("acf"))
  }

  /** E15: trailing EXPONENTIALLY-WEIGHTED moving average of a daily
    * series, per entity — the smoothed velocity feature a plain
    * trailing mean over-reacts on. The EWMA recursion
    * `y_t = α·x_t + (1−α)·y_{t−1}` is sequential, which is exactly what
    * a distributed plan can't do; the closed form over a bounded
    * horizon is a weighted sum `Σ_o (1−α)^o·x_{t−o} / Σ_o (1−α)^o`
    * (present days only — weights renormalize over observed lags, so
    * gaps decay naturally instead of reading as zeros).
    *
    * CONTRIBUTION-EXPLOSION shape (the E13 discipline): each observed
    * (entity, day, x) fans out to the `window` future days it
    * influences with its decayed weight — fixed ×window rows, one
    * (entity, day) aggregate, no per-day history rescan and no
    * unbounded `(1−α)^{−i}` overflow trick. The horizon truncation
    * error is (1−α)^window (≤ 0.7¹⁴ ≈ 0.7%), documented and mirrored
    * exactly by the oracle. Output: (key, day, value, ewma) for
    * OBSERVED days. */
  def ewmaDaily(df: DataFrame, key: String, ts: Column, valueCol: Column,
      alpha: Double = 0.3, window: Int = 14): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val daily = df
      .groupBy(col(key), to_date(ts).as("day"))
      .agg(sum(valueCol).as("__x"))
    val contrib = daily.select(col(key), col("day"), col("__x"),
        explode(sequence(lit(0), lit(window - 1))).as("__o"))
      .select(col(key),
        expr("date_add(day, __o)").as("__td"),
        (pow(lit(1.0 - alpha), col("__o")) * col("__x")).as("__wx"),
        pow(lit(1.0 - alpha), col("__o")).as("__w"))
    val sm = contrib.groupBy(col(key).as("__k"), col("__td"))
      .agg(sum(col("__wx")).as("__num"), sum(col("__w")).as("__den"))
    daily.join(sm,
        daily(key) === col("__k") && col("__td") === col("day"))
      .select(daily(key), col("day"), round(col("__x"), 2).as("value"),
        (col("__num") / col("__den")).as("ewma"))
  }
  /** E28: SEASONAL-NAIVE FORECAST BAND — the monitoring baseline that
    * respects the weekly rhythm: each (entity, day)'s expected value is
    * the mean of the SAME WEEKDAY's values over the trailing
    * `trailingWeeks` weeks (the seasonal-naive forecast, public
    * knowledge — the baseline every fancier forecaster must beat), and
    * a day is anomalous when its residual leaves the entity's robust
    * MAD band (D12 composed over residuals). Catches "this Monday is
    * wrong" where a plain trailing mean is blinded by the weekend dip.
    *
    * Exactness: daily sums and the trailing same-weekday sum are
    * DECIMAL (exact, order-immune); the forecast is one double
    * division of exact operands; the MAD band reuses the D12
    * integer-rank medians. Days with no prior same-weekday history
    * keep a NULL forecast and are excluded from scoring. Shape: one
    * (entity, day) aggregate + one (entity, weekday)-keyed window +
    * the D12 rank windows — all entity-keyed, no global sorts.
    * Output: (key, day, value, forecast, residual, med, mad,
    * is_anomaly). */
  def seasonalNaiveAnomaly(df: DataFrame, key: String, ts: Column,
      valueCol: Column, trailingWeeks: Int = 4, k: Double = 3.0)
      : DataFrame = {
    require(trailingWeeks >= 1,
      s"trailingWeeks must be >= 1, got $trailingWeeks")
    val daily = df.groupBy(col(key), to_date(ts).as("day"))
      .agg(sum(valueCol.cast("decimal(18,2)")).as("__x"))
    val w = Window.partitionBy(col(key), dayofweek(col("day")))
      .orderBy(col("day")).rowsBetween(-trailingWeeks, -1)
    val scored = daily
      .withColumn("__fs", sum(col("__x")).over(w))
      .withColumn("__fn", count(col("__x")).over(w))
      .withColumn("forecast",
        when(col("__fn") > 0,
          col("__fs").cast("double") / col("__fn").cast("double")))
      .withColumn("residual",
        col("__x").cast("double") - col("forecast"))
    val flagged = graft.dq.Stats.madOutliers(
      scored.filter(col("residual").isNotNull), key, col("residual"),
      col("day"), k)
      .select(col(key).as("__k"), col("id").as("__d"), col("med"),
        col("mad"), col("is_outlier"))
    scored.join(flagged,
        scored(key) === col("__k") && col("day") === col("__d"), "left")
      .select(scored(key), col("day"),
        col("__x").cast("double").as("value"), col("forecast"),
        col("residual"), col("med"), col("mad"),
        col("is_outlier").as("is_anomaly"))
  }

  /** E31: FORECAST-EVAL SUITE — MAE / RMSE / sMAPE / MASE of the
    * seasonal-naive lag-`season` forecast per entity (Hyndman &
    * Koehler 2006: MASE scales by the in-sample lag-1 naive MAE, so
    * it's unit-free, symmetric, and defined on zero-valued series
    * where MAPE explodes; MASE < 1 ⇔ the forecast beats the naive
    * one-step baseline). The yardstick every fancier forecaster must
    * report before being believed.
    *
    * Determinism: daily sums, forecast lags and |error| sums are
    * DECIMAL-exact (order-immune); RMSE and sMAPE accumulate
    * quantized-6 scaled-LONG per-row terms (their per-row doubles —
    * a square, a guarded ratio — can't sum exactly in decimal without
    * precision-cap loss); each output divides once, quantized-6. Rows
    * with |x|+|f| = 0 are EXCLUDED from sMAPE and counted — 0/0 is a
    * convention war, not a number. NULL mase when the series has no
    * lag-1 variation (scale 0).
    *
    * Scale: one (key, day) aggregate, two lags on ONE entity-keyed
    * ordered window, one final per-key aggregate. Output: one row per
    * key — (key, n_days, n_eval, mae, rmse, scale, mase, smape,
    * n_smape_excluded). */
  def forecastEval(df: DataFrame, key: String, ts: Column,
      valueCol: Column, season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val daily = df.groupBy(col(key), to_date(ts).as("day"))
      .agg(sum(valueCol.cast("decimal(18,6)")).as("__x"))
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
    val lagged = daily
      .withColumn("__f", lag(col("__x"), season).over(w))
      .withColumn("__n1", lag(col("__x"), 1).over(w))
    val err = abs(col("__x") - col("__f"))
    val errD = err.cast("double")
    val absSum = abs(col("__x").cast("double")) +
      abs(col("__f").cast("double"))
    val terms = lagged
      .withColumn("__abs_err", when(col("__f").isNotNull, err))
      .withColumn("__sq_scaled", when(col("__f").isNotNull,
        floor(errD * errD * lit(1e6) + lit(0.5)).cast("long")))
      .withColumn("__smape_scaled",
        when(col("__f").isNotNull && absSum > 0,
          floor(lit(2.0) * errD / absSum * lit(1e6) + lit(0.5))
            .cast("long")))
      .withColumn("__scale_err",
        when(col("__n1").isNotNull, abs(col("__x") - col("__n1"))))
    val agg = terms.groupBy(col(key))
      .agg(count(lit(1)).as("n_days"),
        count(col("__abs_err")).as("n_eval"),
        sum(col("__abs_err")).as("__ae_sum"),
        sum(col("__sq_scaled")).as("__sq_sum"),
        sum(col("__smape_scaled")).as("__sm_sum"),
        count(col("__smape_scaled")).as("__n_sm"),
        sum(col("__scale_err")).as("__sc_sum"),
        count(col("__scale_err")).as("__n_sc"))
    import graft.functions.q6
    val mae = col("__ae_sum").cast("double") / col("n_eval").cast("double")
    val scale = col("__sc_sum").cast("double") / col("__n_sc").cast("double")
    agg.select(col(key), col("n_days"), col("n_eval"),
      q6(when(col("n_eval") > 0, mae)).as("mae"),
      q6(when(col("n_eval") > 0,
        sqrt(col("__sq_sum").cast("double") / lit(1e6) /
          col("n_eval").cast("double")))).as("rmse"),
      q6(when(col("__n_sc") > 0, scale)).as("scale"),
      q6(when(col("n_eval") > 0 && col("__n_sc") > 0 &&
        col("__sc_sum") > 0, mae / scale)).as("mase"),
      q6(when(col("__n_sm") > 0,
        col("__sm_sum").cast("double") / lit(1e6) /
          col("__n_sm").cast("double"))).as("smape"),
      (col("n_eval") - col("__n_sm")).as("n_smape_excluded"))
  }
}
