package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for scale: skew salting and bucketed co-location.
  *
  * At 100 TB the two failure modes of a plain equi-join are (a) one hot
  * key landing an entire shuffle partition on one task and (b) re-shuffling
  * a table that is joined on the same key every day. Salting fixes (a)
  * without touching semantics; bucketing fixes (b) at write time. */
object Joins {

  /** Salted equi-join against a (broadcast-able or replicated) build side:
    * the probe side gets a deterministic per-row salt in [0, salts); the
    * build side is replicated once per salt value, so a hot key's rows
    * spread over `salts` shuffle partitions instead of one straggler task.
    *
    * The salt derives from a row hash, not `rand()` — plans stay
    * deterministic and re-executable (a task retry computes the same
    * salt). Results are identical to the unsalted join. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Build-side replication is only sound for probe-preserving joins: a
    // right/full join would emit every unmatched build row once per salt.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti", "cross")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports probe-preserving join types only, not $joinType")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(salts.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** AS-OF JOIN: every left row paired with the LATEST right row whose
    * timestamp is <= the left row's, per join key — the time-series join
    * behind point-in-time-correct feature lookup (a feature value is
    * visible from its own timestamp forward, never backward: the join
    * that prevents label leakage in training-data assembly). Spark has
    * no native form; the naive encodings are a range join (O(n·m)
    * nested-loop pair space) or a per-row subquery.
    *
    * This is the UNION + WINDOW form: both sides are tagged and unioned,
    * and each right payload column is carried forward by
    * `last(_, ignoreNulls)` over (key ORDER BY ts, side) — ONE shuffle
    * keyed on the join key, zero pair explosion, linear in rows. At
    * equal timestamps the right row sorts first and is therefore
    * visible to the left row (the `>=` convention, matching DuckDB's
    * native ASOF JOIN, which is the oracle).
    *
    * Output: every left column, then each right value column, then
    * `asof_ts` (the matched right timestamp) — all NULL when no right
    * row precedes. `toleranceSec` voids matches older than
    * `leftTs − tolerance` (stale features must not leak forward
    * indefinitely). Contract: right must be UNIQUE per (keys, rightTs) —
    * pre-aggregate otherwise (equal-key-and-ts right rows have no
    * deterministic winner); pass `checkUnique = true` to enforce that
    * precondition with one extra aggregate pass that fails loud naming
    * the duplicated (keys, ts) groups. Left/right non-key column names
    * must not collide. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      toleranceSec: Option[Long] = None,
      checkUnique: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    require(keys.nonEmpty, "asOfJoin needs at least one join key")
    val leftOther = left.columns.filterNot(keys.contains)
      .filterNot(_ == leftTs).toSeq
    val rightVals = right.columns.filterNot(keys.contains)
      .filterNot(_ == rightTs).toSeq
    val reserved = Set("asof_ts", "__ts", "__side", "__rp")
    val collide = (leftOther.toSet & rightVals.toSet) ++
      ((left.columns.toSet ++ right.columns.toSet) & reserved) ++
      (rightVals.toSet & Set(leftTs))
    require(collide.isEmpty,
      s"asOfJoin column collision: ${collide.mkString(", ")} — rename " +
        "(asof_ts/__ts/__side/__rp are reserved output/scratch names)")
    // the right payload travels as ONE nullable struct (its own matched
    // timestamp inside): last(_, ignoreNulls) then carries forward the
    // ENTIRE matched row — a genuine NULL inside the matched row stays
    // NULL instead of being backfilled from an older row, every output
    // column comes from the SAME right row, and tolerance judges the
    // timestamp of the row the values actually came from
    val payloadType = StructType(
      rightVals.map(c => StructField(c, right.schema(c).dataType)) :+
        StructField("__rts", TimestampType))
    val l = left.select(
      (keys.map(col) :+ col(leftTs).cast("timestamp").as("__ts") :+
        lit(1).as("__side") :+ lit(null).cast(payloadType).as("__rp")) ++
        leftOther.map(col): _*)
    val rightLive = right
      // NULL join keys never match in an equi-join (and in the DuckDB
      // ASOF oracle) — drop null-key RIGHT rows so the window's
      // null-groups-together partitioning cannot manufacture matches;
      // null-key LEFT rows keep left-join semantics (they land in a
      // partition with no right rows → null match). A NULL right
      // TIMESTAMP must go too: it casts to NULL __ts, sorts FIRST in
      // the ascending (ts, side) window, and last(ignoreNulls) would
      // then carry its payload into left rows that have no real
      // preceding right row (DuckDB's l.ts >= r.ts never matches NULL).
      .filter((keys.map(col(_).isNotNull) :+
        col(rightTs).cast("timestamp").isNotNull).reduce(_ && _))
    if (checkUnique) {
      // one aggregate over the live right side; only runs on request —
      // the count is an extra job, so the default stays zero-cost
      val dups = rightLive.groupBy(keys.map(col) :+
          col(rightTs).cast("timestamp").as("__ts"): _*)
        .count().filter(col("count") > 1)
        .limit(5).collect()
      require(dups.isEmpty,
        "asOfJoin: right side has duplicate (keys, ts) groups — no " +
          "deterministic winner; pre-aggregate first. First offenders: " +
          dups.map(_.toSeq.mkString("(", ",", ")")).mkString("; "))
    }
    val r = rightLive
      .select(
        (keys.map(col) :+ col(rightTs).cast("timestamp").as("__ts") :+
          lit(0).as("__side") :+
          struct(rightVals.map(col) :+
            col(rightTs).cast("timestamp").as("__rts"): _*).as("__rp")) ++
          leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
    val stale = toleranceSec.map(t =>
      col("__rp.__rts") < col("__ts") - expr(s"INTERVAL $t SECONDS"))
      .getOrElse(lit(false))
    val keep = when(stale, lit(null).cast(payloadType)).otherwise(col("__rp"))
    carried.filter(col("__side") === 1)
      .select((keys.map(col) :+ col("__ts").as(leftTs)) ++
        leftOther.map(col) ++
        rightVals.map(c => keep.getField(c).as(c)) :+
        keep.getField("__rts").as("asof_ts"): _*)
  }

  /** F24: POINT-IN-TIME TRAINING SET — the feature-store flagship: a
    * label table (entity, label ts) picks up, from EVERY feature
    * table, the latest feature row at or before the label timestamp —
    * one [[asOfJoin]] per feature table, folded left. This is the
    * operation that makes offline training sets leakage-free by
    * construction: a feature row with ts AFTER the label can never be
    * selected (the as-of window only looks backward), and
    * `toleranceSec` additionally voids features staler than the
    * horizon, so silently-dead feature pipelines surface as NULLs
    * instead of stale values.
    *
    * Column hygiene: every feature table's value columns (and its
    * `asof_ts`) are prefixed `<name>_`, so any number of single-column
    * or wide feature tables compose without collisions; duplicate
    * prefixes fail loud.
    *
    * Scale: k as-of joins, each ONE entity-keyed exchange of
    * labels ∪ that feature table (the [[asOfJoin]] union-window shape
    * — never a per-label range probe); feature tables are touched
    * once each. */
  def pointInTimeTrainingSet(labels: DataFrame,
      features: Seq[(String, DataFrame)], keys: Seq[String],
      labelTs: String, featureTs: String,
      toleranceSec: Option[Long] = None): DataFrame = {
    require(features.nonEmpty, "pointInTimeTrainingSet: no feature tables")
    val names = features.map(_._1)
    require(names.distinct.size == names.size,
      s"pointInTimeTrainingSet: duplicate feature prefixes " +
        s"${names.diff(names.distinct).distinct.mkString(", ")}")
    names.foreach(n => require(n.nonEmpty,
      "pointInTimeTrainingSet: empty feature prefix"))
    features.foldLeft(labels) { case (acc, (prefix, ft)) =>
      val renamed = ft.columns.foldLeft(ft) { (d, c) =>
        if (keys.contains(c) || c == featureTs) d
        else d.withColumnRenamed(c, s"${prefix}_$c")
      }
      asOfJoin(acc, renamed, keys, labelTs, featureTs, toleranceSec)
        .withColumnRenamed("asof_ts", s"${prefix}_asof_ts")
    }
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * exchange-free: `bucketBy` hashes rows into `buckets` files per
    * partition at WRITE time; a later join of two tables bucketed on the
    * same key with the same bucket count reads co-located buckets and
    * skips the shuffle entirely. Returns the catalog table names. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): String = {
    val spark = df.sparkSession
    // clear both the catalog entry and any stale warehouse location
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
    table
  }

  /** Pre-join cardinality/skew audit: the exact output size an equi-join
    * WOULD produce, per key — `|A ⋈ B| = Σ_k f_A(k)·f_B(k)` — plus each
    * key's share of the total, for the top `topK` contributors. This is
    * the check a 100 TB pipeline runs BEFORE paying for a join whose
    * fan-out it cannot predict: two map-side-combined key-count
    * aggregates and a join of the two count tables (distinct-key-sized,
    * orders of magnitude smaller than the data join), never the join
    * itself. A key with share ≳ 1/shufflePartitions is the straggler
    * [[saltedJoin]] exists for.
    *
    * All-integer arithmetic; ties rank by key so output is total-ordered
    * and engine-exact. */
  def joinCardinalityAudit(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val fa = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val fb = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val per = fa.join(fb, "key")
      .withColumn("join_rows", col("n_left") * col("n_right"))
    val tot = per.agg(sum(col("join_rows")).as("__t"))
    per.crossJoin(broadcast(tot))
      .select(col("key"), col("n_left"), col("n_right"), col("join_rows"),
        graft.functions.q6(col("join_rows").cast("double") / col("__t"))
          .as("share"))
      .orderBy(col("join_rows").desc, col("key"))
      .limit(topK)
  }
}
