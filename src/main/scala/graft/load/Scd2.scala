package graft.load

import graft.meta.Meta
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge configuration, the union of the reference loader signatures
  * (reference: diamond/load/DataLoader.scala:179-278 scaladoc;
  * ParquetDataLoader.scala:49-553).
  *
  * `processTime` is an explicit parameter everywhere the reference stamped
  * `current_timestamp()` (ParquetDataLoader.scala:388,413) — determinism is a
  * design requirement here (SURVEY.md §7.1): the DuckDB oracle must be able
  * to reproduce every stamped value.
  *
  * @param idFields  natural-key columns hashed into `entity_id`
  * @param idType    id-type discriminator mixed into the hash
  * @param isDelta   delta load (no delete detection by absence) vs full load
  * @param overwrite SCD2 close-off mode: superseded versions get
  *                  `end_time = new start_time` (mutually exclusive with
  *                  isDelta, reference: ParquetDataLoader.scala:290)
  * @param projection optional column subset applied before stamping
  * @param newNames   rename map applied before stamping
  * @param deleteIndicatorField (column, delete-marker values): rows whose
  *                  column value is in the set are logical deletes
  * @param dropKeys  drop natural-key columns from the stamped output
  *                  (satellite privacy mode, reference: ParquetDataLoader.scala:519-521)
  * @param validStartTimeField source column carrying the *business*
  *                  validity start (reference loadHub/loadSatellite
  *                  `validStartTimeField`, DataLoader.scala:188-189);
  *                  stamped as `valid_start_time` (processTime when absent)
  * @param validEndTimeField  likewise for `valid_end_time` (open-end
  *                  sentinel when absent)
  */
case class MergeConfig(
    idFields: Seq[String],
    idType: String,
    entityType: String,
    source: String,
    processType: String,
    processId: String,
    userId: String,
    processTime: String,
    isDelta: Boolean = true,
    overwrite: Boolean = false,
    projection: Option[Seq[String]] = None,
    newNames: Map[String, String] = Map.empty,
    deleteIndicatorField: Option[(String, Seq[String])] = None,
    dropKeys: Boolean = false,
    validStartTimeField: Option[String] = None,
    validEndTimeField: Option[String] = None,
    // store-level: append per-load new/changed/removed tables (reference
    // SatelliteTable `write-change-tables`; the reference defaults it OFF,
    // this store defaults ON because its change tables feed S13 retention)
    writeChangeTables: Boolean = true) {
  require(!(isDelta && overwrite), "isDelta and overwrite are mutually exclusive")
}

/** The generic SCD2 merge kernel — the one algorithm behind the reference's
  * four ~250-line loaders (hub/satellite/link/mapping, reference:
  * diamond/load/ParquetDataLoader.scala:49-975). Pure DataFrame-in /
  * DataFrame-out so results are oracle-checkable; [[Scd2Store]] adds the
  * history/current/new/changed/removed parquet layout.
  *
  * Scale design (100 TB): every join is an equi-join on the uniformly
  * distributed md5 `entity_id` — no surrogate-key lookup step, so hubs,
  * satellites and links of one source can load in parallel (the reference's
  * stated design goal, DataLoader.scala:15-21). The merge reads `existing`
  * as the *current snapshot* (latest version per entity), not full history:
  * incoming ⋈ current is bounded by entity count, never by history depth.
  * Branch counts come from one `observe()` pass instead of the reference's
  * 4-6 repeated `count()` actions (ParquetDataLoader.scala:493-497).
  */
object Scd2Merge {
  import Meta._

  /** Branches of one merge, pre-union. `history` is the full new history.
    * `cachedPlans` are intermediate plans the merge cached; call
    * [[MergeResult.unpersist]] once all branches are materialized so cached
    * snapshots don't accumulate executor memory across successive loads. */
  case class MergeResult(
      history: DataFrame,
      current: DataFrame,
      inserted: DataFrame,
      changed: DataFrame,
      removed: DataFrame,
      cachedPlans: Seq[DataFrame] = Nil) {
    def unpersist(): Unit = cachedPlans.foreach(_.unpersist())

    /** Materialize `history` for plan-chaining callers — feeding this
      * merge's in-memory result straight into a further merge without it,
      * every branch of the next merge (and its snapshot) re-executes this
      * merge's shuffles; chains recompute combinatorially. `localCheckpoint`
      * runs one eager job and truncates lineage; `current` is rebuilt over
      * the checkpointed history so it shares the materialized blocks.
      *
      * Memory contract: holds one history copy on executor block storage
      * (memory-and-disk). The store paths ([[Scd2Store]]/[[CatalogStore]])
      * materialize to parquet between loads instead and don't need this. */
    def materialized: MergeResult = {
      val h = graft.util.Caches.trackCheckpointed(history.localCheckpoint())
      copy(history = h, current = Scd2Merge.snapshot(h))
    }
  }

  /** Latest version per entity (C7 `snapshot`, reference:
    * ParquetDataLoader.scala:977-990 reduceByKey arg-max). `max_by` compiles
    * to a single partial+final hash aggregate — one shuffle, no sort. */
  def snapshot(history: DataFrame): DataFrame = {
    val cols = history.columns
    history.groupBy(col(EntityId))
      .agg(max_by(struct(cols.filter(_ != EntityId).map(col): _*),
        col(Version)).as("__r"))
      .select(col(EntityId) +: cols.filter(_ != EntityId)
        .map(c => col(s"__r.$c").as(c)): _*)
      .select(cols.map(col): _*)
  }

  /** Current active view: latest versions minus logical deletes
    * (reference: ParquetDataLoader.scala:342-344). */
  def currentActive(history: DataFrame): DataFrame =
    snapshot(history).filter(col(RecType) =!= Rec.Delete)

  /** Time-travel read: the snapshot as it stood at `asOf` — the latest
    * version per entity among rows whose `start_time` is at or before the
    * instant. SCD2 histories are append-only, so this is a filter + the
    * same one-shuffle arg-max as [[snapshot]]; entities first loaded
    * after `asOf` simply don't appear. */
  def snapshotAsOf(history: DataFrame, asOf: String): DataFrame =
    snapshot(history.filter(col(StartTime) <= lit(asOf).cast("timestamp")))

  /** Dedup + project + rename + stamp metadata columns onto an incoming
    * batch (reference: ParquetDataLoader.scala:292-322). Output columns:
    * entity_id, [natural keys unless dropKeys], attrs…, then Meta.StampedCols.
    *
    * The delete-indicator column is *consumed* here (into `__is_delete`),
    * never persisted and never part of the change hash — a flipped flag must
    * not masquerade as an attribute change, and the history schema must not
    * depend on whether a given load carried the indicator. */
  def stamp(incoming: DataFrame, cfg: MergeConfig): DataFrame = {
    val projected = cfg.projection
      .map(p => incoming.select(p.map(col): _*)).getOrElse(incoming)
      .withColumnsRenamed(cfg.newNames)
      .distinct()
    val keyCols = cfg.idFields.map(projected(_))
    // Load-metadata columns (delete flag, business-validity sources) are
    // consumed into their stamped forms: they must not ride in the payload
    // (the history schema would depend on which loads carried them) and
    // must not feed the change hash (a flag/validity-only change is not an
    // attribute change). A natural-key column doubling as a validity
    // source stays in the payload — keys are never dropped unless
    // `dropKeys` says so. NOTE: histories persisted by versions that kept
    // the raw validity column in the payload need a one-time column drop
    // before merging with this stamp.
    val metaFields = (cfg.deleteIndicatorField.map(_._1).toSeq ++
      cfg.validStartTimeField ++ cfg.validEndTimeField)
      .filterNot(cfg.idFields.contains)
    val attrNames = projected.columns
      .filterNot(cfg.idFields.contains).filterNot(metaFields.contains)
    val delCol = cfg.deleteIndicatorField.map { case (f, vs) =>
      col(f).isin(vs: _*)
    }.getOrElse(lit(false))
    val dataCols =
      if (cfg.dropKeys) attrNames.map(col).toSeq
      else projected.columns.filterNot(metaFields.contains).map(col).toSeq
    val validStart = cfg.validStartTimeField.map(col(_).cast("timestamp"))
      .getOrElse(lit(cfg.processTime).cast("timestamp"))
    val validEnd = cfg.validEndTimeField.map(col(_).cast("timestamp"))
      .getOrElse(lit(OpenEndDate).cast("timestamp"))
    projected.select(
      (graft.functions.entityIdHash(cfg.idType, keyCols).as(EntityId) +:
        dataCols :+
        lit(cfg.processTime).cast("timestamp").as(StartTime) :+
        lit(OpenEndDate).cast("timestamp").as(EndTime) :+
        validStart.as(ValidStartTime) :+
        validEnd.as(ValidEndTime) :+
        lit(cfg.source).as(Source) :+
        lit(cfg.processType).as(ProcessType) :+
        lit(cfg.processId).as(ProcessId) :+
        lit(cfg.processTime).cast("date").as(ProcessDate) :+
        lit(cfg.userId).as(UserId) :+
        graft.functions.changeHash(attrNames.map(col)).as(HashedValue) :+
        delCol.as("__is_delete")): _*)
  }

  /** Full merge: incoming batch vs existing history (None ⇒ first load). */
  def merge(incoming: DataFrame, existingHistory: Option[DataFrame],
      cfg: MergeConfig): MergeResult = {
    val inc = stamp(incoming, cfg)
    existingHistory match {
      case None =>
        val first = inc.filter(!col("__is_delete"))
          .withColumn(RecType, lit(Rec.Insert))
          .withColumn(Version, lit(1))
          .drop("__is_delete")
        MergeResult(first, snapshot(first), first,
          first.limit(0), first.limit(0))

      case Some(hist) =>
        val snap = snapshot(hist).cache()
        val cur = snap.filter(col(RecType) =!= Rec.Delete)
        // The stamped batch feeds four branch plans (inserted / changed /
        // deleteIds / deleteFlagged) — cache it so stamp's distinct()
        // shuffle runs once per merge, not once per branch.
        val incC = inc.cache()
        // Delete markers take precedence: an entity with both a live row and
        // a delete-marker row in the same batch emits only the D row —
        // otherwise a changed (U) and a removed (D) row would tie on the new
        // version number and the snapshot arg-max would be nondeterministic.
        val deleteFlagged = incC.filter(col("__is_delete"))
          .select(col(EntityId)).distinct()
        val incLive = incC.filter(!col("__is_delete")).drop("__is_delete")
          .join(deleteFlagged, Seq(EntityId), "left_anti")
        val curKeyed = cur.select(
          col(EntityId).as("__ex_id"),
          col(Version).as("__ex_version"),
          col(HashedValue).as("__ex_hash"))

        // J1: inserts — incoming entities absent from the active current.
        // Version picks up after any prior (deleted) lineage rather than
        // restarting at 1, so the snapshot arg-max can never be shadowed by
        // a stale rectype='D' row.
        val snapVersions = snap.select(
          col(EntityId).as("__sn_id"), col(Version).as("__sn_version"))
        val inserted = incLive
          .join(curKeyed, col(EntityId) === col("__ex_id"), "left_anti")
          .join(snapVersions, col(EntityId) === col("__sn_id"), "left")
          .withColumn(RecType, lit(Rec.Insert))
          .withColumn(Version, coalesce(col("__sn_version") + 1, lit(1)))
          .drop("__sn_id", "__sn_version")

        // J2: updates — present with a different change hash.
        val changed = incLive
          .join(curKeyed, col(EntityId) === col("__ex_id") &&
            col(HashedValue) =!= col("__ex_hash"))
          .withColumn(RecType, lit(Rec.Update))
          .withColumn(Version, col("__ex_version") + 1)
          .drop("__ex_id", "__ex_version", "__ex_hash")

        // J3 / delete-indicator: logical deletes, stamped off the existing
        // current row's attributes with fresh process metadata. Full loads
        // delete by absence from the live incoming set AND by delete flag;
        // delta loads only by flag.
        val deleteIds: DataFrame =
          if (!cfg.isDelta)
            cur.select(col(EntityId))
              .join(incLive.select(col(EntityId)), Seq(EntityId), "left_anti")
              .unionByName(deleteFlagged).distinct()
          else
            deleteFlagged
        val removed = cur
          .join(deleteIds, Seq(EntityId), "left_semi")
          .withColumn(RecType, lit(Rec.Delete))
          .withColumn(Version, col(Version) + 1)
          .withColumn(StartTime, lit(cfg.processTime).cast("timestamp"))
          .withColumn(ProcessDate, lit(cfg.processTime).cast("date"))
          .withColumn(ProcessType, lit(cfg.processType))
          .withColumn(ProcessId, lit(cfg.processId))
          .withColumn(UserId, lit(cfg.userId))

        val outCols = inserted.columns.map(col).toSeq
        val delta = inserted.select(outCols: _*)
          .unionByName(changed.select(outCols: _*))
          .unionByName(removed.select(outCols: _*))

        // Overwrite mode closes superseded versions (true SCD2 close-off,
        // reference: ParquetDataLoader.scala:436-471); append mode keeps
        // history rows untouched.
        val newHistory =
          if (cfg.overwrite) {
            val superseded = changed.select(col(EntityId))
              .unionByName(removed.select(col(EntityId))).distinct()
            val closed = hist.join(superseded, Seq(EntityId), "left_semi")
              .withColumn(EndTime,
                when(col(EndTime) === lit(OpenEndDate).cast("timestamp"),
                  lit(cfg.processTime).cast("timestamp"))
                  .otherwise(col(EndTime)))
            val untouched = hist.join(superseded, Seq(EntityId), "left_anti")
            untouched.unionByName(closed).unionByName(delta.select(outCols: _*))
          } else hist.unionByName(delta.select(outCols: _*))

        MergeResult(newHistory, snapshot(newHistory), inserted, changed,
          removed, cachedPlans = Seq(snap, incC))
    }
  }
}
