package graft.load

import graft.meta.Meta
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Parquet persistence for SCD2 loads — the reference's on-disk contract
  * (reference: diamond/load/usage.md "Files created"):
  *
  * `<base>/<table>/history.parquet`   full versioned history
  * `<base>/<table>/current.parquet`   latest version per entity
  * `<base>/<table>/new.parquet` / `changed.parquet` / `removed.parquet`
  *                                    per-load change tables, partitioned by
  *                                    process_date with N-day retention
  *                                    (reference: ParquetDataLoader.scala:1067-1103)
  * `<base>/<table>/proc.csv`          load-stats log
  *
  * Scale notes: change tables are `partitionBy(process_date)` so retention
  * is a driver-side partition-directory delete, not a data rewrite. Load
  * stats come from `observe()` metrics on the single history write — the
  * reference re-ran `count()` 4-6 times over the same lineage
  * (ParquetDataLoader.scala:493-497).
  */
class Scd2Store(val spark: SparkSession, base: String) {
  import Meta._

  private def p(table: String, name: String) = s"$base/$table/$name.parquet"

  def historyExists(table: String): Boolean = {
    val path = new Path(p(table, "history"))
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  def readHistory(table: String): Option[DataFrame] =
    if (historyExists(table)) Some(spark.read.parquet(p(table, "history")))
    else None

  def readCurrent(table: String): DataFrame =
    spark.read.parquet(p(table, "current"))
      .filter(col(RecType) =!= Rec.Delete)

  /** Current view with history fallback (reference `readCurrentMapping`,
    * ParquetDataLoader.scala:992-1001): prefer the materialized current
    * table; when only a history exists (e.g. written by an external job),
    * derive the latest-per-entity view from it. For links/mappings the
    * entity id IS the (src, dst) pair hash, so this equals the
    * reference's latest-per-pair `readMapping`. */
  def readCurrentOrSnapshot(table: String): DataFrame = {
    val cur = new Path(p(table, "current"))
    if (cur.getFileSystem(spark.sessionState.newHadoopConf()).exists(cur))
      readCurrent(table)
    else
      Scd2Merge.currentActive(spark.read.parquet(p(table, "history")))
  }

  /** Time-travel read of a stored table (see [[Scd2Merge.snapshotAsOf]]). */
  def readSnapshotAsOf(table: String, asOf: String): DataFrame =
    Scd2Merge.snapshotAsOf(spark.read.parquet(p(table, "history")), asOf)

  /** Run a merge against the stored history and persist all outputs.
    * Returns the per-branch counts (inserted/changed/removed).
    *
    * Branch counts ride on the history write via `observe()` — rows of
    * this load are identified by (process_id, rectype), so the metrics
    * cost zero extra jobs (the reference re-ran `count()` 4-6 times over
    * the same lineage, ParquetDataLoader.scala:493-497). `processId` must
    * be unique per load for the attribution to hold. */
  def runLoad(table: String, incoming: DataFrame, cfg: MergeConfig): Map[String, Long] = {
    requireCompatibleHashEncoding(table)
    val result = Scd2Merge.merge(incoming, readHistory(table), cfg)
    // The merge plan reads the OLD history lazily, so the new history is
    // written to a staging dir and swapped in with a rename — never an
    // overwrite-in-place of an input path.
    val conf = spark.sessionState.newHadoopConf()
    val histPath = new Path(p(table, "history"))
    val staging = new Path(s"$base/$table/.history_staging_${cfg.processId}")
    val fs = histPath.getFileSystem(conf)
    val obs = org.apache.spark.sql.Observation(s"scd2_${table}_${cfg.processId}")
    def branch(rectype: String) = count(
      when(col(ProcessId) === cfg.processId && col(RecType) === rectype, 1))
    result.history
      .observe(obs,
        branch(Rec.Insert).as("inserted"),
        branch(Rec.Update).as("changed"),
        branch(Rec.Delete).as("removed"))
      .write.mode("overwrite").parquet(staging.toString)
    val metrics = obs.get
    val counts = Map(
      "inserted" -> metrics("inserted").asInstanceOf[Long],
      "changed" -> metrics("changed").asInstanceOf[Long],
      "removed" -> metrics("removed").asInstanceOf[Long])
    if (cfg.writeChangeTables) {
      result.inserted.write.mode("append").partitionBy(ProcessDate).parquet(p(table, "new"))
      result.changed.write.mode("append").partitionBy(ProcessDate).parquet(p(table, "changed"))
      result.removed.write.mode("append").partitionBy(ProcessDate).parquet(p(table, "removed"))
    }
    result.unpersist()
    // Swap via backup, never delete-then-rename: HDFS `rename` reports
    // failure as `false` rather than throwing, and a crash between a delete
    // and a rename would permanently lose the history table.
    val backup = new Path(s"$base/$table/.history_backup_${cfg.processId}")
    if (fs.exists(backup)) fs.delete(backup, true)
    val hadOld = fs.exists(histPath)
    if (hadOld && !fs.rename(histPath, backup))
      throw new java.io.IOException(
        s"could not move $histPath aside to $backup; history left untouched")
    if (!fs.rename(staging, histPath)) {
      if (hadOld) fs.rename(backup, histPath)
      throw new java.io.IOException(
        s"could not publish $staging to $histPath; old history restored")
    }
    val hist = spark.read.parquet(histPath.toString)
    Scd2Merge.snapshot(hist).write.mode("overwrite").parquet(p(table, "current"))
    if (hadOld) fs.delete(backup, true)
    counts
  }

  /** Publish the stored history and current views as catalog tables
    * BUCKETED (and sorted) on entity_id
    * ([[graft.relational.Joins.writeBucketed]]) — the storage layout for
    * a table merged every day. Every join in the merge kernel keys on
    * entity_id (inserts anti-join, changed-detection join, delete
    * semi-join), so against a staged batch bucketed the same way they run
    * EXCHANGE-FREE (plan-guarded in PlanGuardSpec), and against a plain
    * unbucketed delta only the small batch side shuffles — the 100 TB
    * history/current side is never re-partitioned, load after load.
    * Returns the (history, current) catalog table names. */
  def publishBucketed(table: String, buckets: Int): (String, String) = {
    val histT = s"${table}_history_bucketed"
    val curT = s"${table}_current_bucketed"
    val hist = readHistory(table).getOrElse(throw new IllegalArgumentException(
      s"publishBucketed: no history stored for '$table'"))
    graft.relational.Joins.writeBucketed(hist, histT, Seq(EntityId), buckets)
    graft.relational.Joins.writeBucketed(
      spark.read.parquet(p(table, "current")), curT, Seq(EntityId), buckets)
    (histT, curT)
  }

  /** Read `<base>/<table>/meta.json` as a flat string map (empty when the
    * table was never logged through [[writeMeta]]). */
  def readMeta(table: String): Map[String, String] = {
    val metaPath = new Path(new Path(p(table, "history")).getParent, "meta.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaPath)) Map.empty
    else {
      val in = fs.open(metaPath)
      val txt =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      // flat {"k": "v", ...} as written by writeMeta — a full JSON parser
      // is not needed for our own escaped output
      """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(txt)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
    }
  }

  private def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Refuse to merge into a history stamped with a different [[graft.functions.HashEncodingVersion]]:
    * entity/change hashes from another encoding would classify every
    * existing entity as deleted + re-inserted — silent corruption, not a
    * merge. Histories logged before versions were stamped count as v1.
    * Unlogged histories (no meta.json) can't be checked and pass through. */
  private def requireCompatibleHashEncoding(table: String): Unit = {
    val meta = readMeta(table)
    if (meta.nonEmpty && historyExists(table)) {
      val stored = meta.getOrElse("hash_encoding", "1")
      val current = graft.functions.HashEncodingVersion.toString
      require(stored == current,
        s"history for '$table' was written with hash encoding v$stored but " +
          s"this library stamps v$current: merging would mark every entity " +
          "deleted+re-inserted. Rehash the stored history (recompute " +
          "entity_id/hashed_value from the natural keys) before loading.")
    }
  }

  /** S14 process-log sink: append one stats line per load to
    * `<base>/<table>/proc.csv` (reference schema: DataLoader.scala:85-96;
    * the reference's collect+re-parallelize merge, ParquetDataLoader.scala:
    * 1014-1056, is replaced by a driver-side append — the log is one line
    * per load, never data-sized). */
  def logProcess(table: String, cfg: MergeConfig, readCount: Long,
      duplicates: Long, counts: Map[String, Long]): Unit = {
    // Hadoop FS, not java.nio: `base` may be any filesystem URI (hdfs://,
    // s3a://...) — local Paths would silently write to the driver's cwd.
    // Read-modify-write instead of append: HDFS append support is
    // configuration-dependent and the log is one line per load.
    val f = new Path(p(table, "history")).getParent
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    val procPath = new Path(f, "proc.csv")
    val header =
      "process_id,process_type,table,read_count,duplicates,inserted,changed,removed,process_time\n"
    val line = Seq(cfg.processId, cfg.processType, table, readCount,
      duplicates, counts("inserted"), counts("changed"), counts("removed"),
      cfg.processTime).mkString(",") + "\n"
    val existing =
      if (fs.exists(procPath)) {
        val in = fs.open(procPath)
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      } else header
    // write-then-swap: truncating proc.csv in place would lose the whole
    // log if the driver dies mid-write, and delete-then-rename leaves NO
    // published log if it dies between the two — so the old file is moved
    // ASIDE (not deleted) until the new one is in place. Any crash leaves
    // either the old log or the new log at a findable name. The
    // read-modify-write makes this single-writer-per-table; concurrent
    // loads of the SAME table are outside the store's contract (the
    // reference's loader had the same constraint).
    val tag = cfg.processId.replaceAll("\\W", "_")
    val tmp = new Path(f, s".proc_$tag.tmp")
    val out = fs.create(tmp, true)
    try out.write((existing + line).getBytes("UTF-8")) finally out.close()
    val aside = new Path(f, s".proc_$tag.old")
    val hadOld = fs.exists(procPath)
    if (hadOld && !fs.rename(procPath, aside))
      throw new java.io.IOException(
        s"could not move $procPath aside to $aside; log left untouched")
    if (!fs.rename(tmp, procPath)) {
      if (hadOld) fs.rename(aside, procPath)
      throw new java.io.IOException(
        s"could not publish $tmp to $procPath; old log restored")
    }
    if (hadOld) fs.delete(aside, false)
  }

  /** S15 meta-file sink: load parameters as `<base>/<table>/meta.json`
    * (reference: ParquetDataLoader.scala:1058-1065). */
  def writeMeta(table: String, cfg: MergeConfig): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json = Seq(
      "table" -> table, "id_type" -> cfg.idType,
      "entity_type" -> cfg.entityType, "source" -> cfg.source,
      "process_type" -> cfg.processType, "process_id" -> cfg.processId,
      "user_id" -> cfg.userId, "process_time" -> cfg.processTime,
      "id_fields" -> cfg.idFields.mkString("|"),
      // guards future loads against a silent hash-format break
      "hash_encoding" -> graft.functions.HashEncodingVersion.toString)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")
    val metaPath = new Path(new Path(p(table, "history")).getParent, "meta.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(metaPath, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** [[runLoad]] plus the A7 duplicates metric and the S14/S15 sinks. */
  def runLoadLogged(table: String, incoming: DataFrame,
      cfg: MergeConfig): Map[String, Long] = {
    val readCount = incoming.count()
    val duplicates = readCount - incoming.distinct().count()
    val counts = runLoad(table, incoming, cfg)
    logProcess(table, cfg, readCount, duplicates, counts)
    writeMeta(table, cfg)
    counts + ("read" -> readCount) + ("duplicates" -> duplicates)
  }

  /** Crash-safe in-place consolidation of one parquet directory: rows are
    * rewritten into `targetFiles` files in a dot-prefixed staging dir
    * (invisible to parquet readers), then swapped in via the same
    * rename-aside discipline as [[runLoad]]'s history publish. The swap
    * itself is two renames; a crash exactly between them leaves the data
    * at the DETERMINISTIC backup name (tags are content-addressed, never
    * timestamped), and the recovery preamble of the next call — or of
    * [[recoverCompact]] directly — renames it back before doing anything
    * else, so the table is restored by re-running the maintenance job.
    * The backup is deleted last. `dropCols` lets partitioned callers
    * strip the column the directory name re-materializes. Staging and
    * backup names are the live directory's own name behind a dot prefix,
    * so a backup always names exactly the directory it must restore. */
  private def rewriteCompact(dir: Path, targetFiles: Int,
      dropCols: Seq[String] = Nil): Unit = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val parent = dir.getParent
    val staging = new Path(parent, s".compact_staging_${dir.getName}")
    val backup = new Path(parent, s".compact_backup_${dir.getName}")
    // recovery preamble: a backup with no live dir is the crashed-between-
    // renames state — restore it; everything else hidden is stale output
    if (fs.exists(backup) && !fs.exists(dir)) fs.rename(backup, dir)
    if (fs.exists(staging)) fs.delete(staging, true)
    if (fs.exists(backup)) fs.delete(backup, true)
    spark.read.parquet(dir.toString)
      .drop(dropCols: _*)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(dir, backup))
      throw new java.io.IOException(
        s"could not move $dir aside to $backup; data left untouched")
    if (!fs.rename(staging, dir)) {
      fs.rename(backup, dir)
      throw new java.io.IOException(
        s"could not publish $staging to $dir; old data restored")
    }
    fs.delete(backup, true)
  }

  private def partFileCount(dir: Path): Int = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(_.getPath.getName.startsWith("part-"))
  }

  /** Consolidate the history and current tables to `targetFiles` files
    * each. Every load's full-history rewrite emits one file per shuffle
    * partition regardless of data size, so a long-lived small table
    * carries hundreds of KB-sized files whose open/footer cost dominates
    * reads (the classic small-file problem; the reference's README asks
    * for the same "stitching function"). Run in a maintenance window —
    * single-writer-per-table, like every store mutation. */
  def compactHistory(table: String, targetFiles: Int = 8): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    recoverCompact(table)
    for (name <- Seq("history", "current")) {
      val dir = new Path(p(table, name))
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(dir) && partFileCount(dir) > targetFiles)
        rewriteCompact(dir, targetFiles)
    }
  }

  /** Restore any compaction backup whose live directory is missing (the
    * crashed-between-renames state) — called automatically by
    * [[compactHistory]]/[[compactChangeTables]], exposed for explicit
    * recovery. A backup dir is `.compact_backup_<liveName>` in the live
    * directory's parent, so restoration is a prefix strip + rename. */
  def recoverCompact(table: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val parents = new Path(s"$base/$table") +:
      Seq("new", "changed", "removed").map(n => new Path(p(table, n)))
    for (parent <- parents) {
      val fs = parent.getFileSystem(conf)
      if (fs.exists(parent)) {
        fs.listStatus(parent).map(_.getPath)
          .filter(_.getName.startsWith(".compact_backup_")).foreach { b =>
            val live = new Path(parent,
              b.getName.stripPrefix(".compact_backup_"))
            if (!fs.exists(live)) fs.rename(b, live)
          }
      }
    }
  }

  /** Consolidate change-table partitions whose per-load appends exceeded
    * `targetFiles` part files. Appends accumulate one file set per load
    * into each `process_date=` partition (retention deletes whole
    * partitions but never consolidates live ones); this rewrites only
    * the partitions over the threshold, one at a time, keeping the
    * directory-per-partition layout [[expireChangeTables]] deletes by. */
  def compactChangeTables(table: String, targetFiles: Int = 4): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    recoverCompact(table)
    val conf = spark.sessionState.newHadoopConf()
    for (name <- Seq("new", "changed", "removed")) {
      val root = new Path(p(table, name))
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith(s"$ProcessDate="))
          .filter(partFileCount(_) > targetFiles)
          .foreach { part =>
            // the partition column lives in the directory name; dropping
            // it from the rewrite keeps the read-back schema identical
            rewriteCompact(part, targetFiles, dropCols = Seq(ProcessDate))
          }
      }
    }
  }

  /** S13: drop change-table partitions older than `retainDays` relative to
    * `asOf` — a partition-directory delete, no rewrite
    * (reference: ParquetDataLoader.scala:1091-1103 `removeParts`). */
  def expireChangeTables(table: String, asOf: java.time.LocalDate,
      retainDays: Int): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    for (name <- Seq("new", "changed", "removed")) {
      val dir = new Path(p(table, name))
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir)) {
        fs.listStatus(dir).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(s"$ProcessDate=")) {
            val d = java.time.LocalDate.parse(n.stripPrefix(s"$ProcessDate="))
            if (d.isBefore(asOf.minusDays(retainDays.toLong)))
              fs.delete(st.getPath, true)
          }
        }
      }
    }
  }
}
