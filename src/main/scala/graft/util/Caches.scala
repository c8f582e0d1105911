package graft.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

import scala.collection.mutable

/** Session-scoped registry of operator-internal cached state — the
  * storage-handle pattern. Operators that `persist()` intermediates (or
  * pin `localCheckpoint` blocks) register them here instead of leaking
  * them; the CALLER releases everything once results are materialized:
  *
  * {{{
  *   val result = Dedup.dedupPipeline(corpus, "doc_id", "text")
  *   result.write.parquet(out)          // materialize first —
  *   graft.util.Caches.releaseAll(spark) // checkpoints can't recompute
  * }}}
  *
  * Without this, a long-running composed pipeline (the X18 production
  * shape) accumulates cached blocks until eviction pressure; with it, a
  * run ends with zero leaked blocks (asserted by CacheHygieneSpec).
  * Registration is session-keyed so concurrent sessions cannot release
  * each other's state.
  */
object Caches {
  private val dfs = mutable.Map.empty[SparkSession, mutable.Buffer[DataFrame]]
  private val rdds = mutable.Map.empty[SparkSession, mutable.Buffer[RDD[_]]]

  /** Drop registry entries whose session is already stopped — their
    * blocks are gone with the context, and holding the references would
    * otherwise pin dead sessions forever in a long-lived JVM that cycles
    * SparkSessions without calling [[releaseAll]]. Called on every
    * registration; the maps stay small (one entry per live session). */
  private def pruneStopped(): Unit = {
    dfs.filterInPlace((s, _) => !s.sparkContext.isStopped)
    rdds.filterInPlace((s, _) => !s.sparkContext.isStopped)
  }

  /** `df.persist()`, registered for [[releaseAll]]. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    pruneStopped()
    dfs.getOrElseUpdate(df.sparkSession, mutable.Buffer.empty) += df
    df.persist()
  }

  /** Register an already-pinned RDD (a `localCheckpoint` block). */
  def trackRdd(spark: SparkSession, rdd: RDD[_]): Unit = synchronized {
    pruneStopped()
    rdds.getOrElseUpdate(spark, mutable.Buffer.empty) += rdd
  }

  /** The pinned RDDs beneath a checkpointed Dataset's plan. */
  def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** Register every checkpoint block beneath `df` and return `df`. */
  def trackCheckpointed(df: DataFrame): DataFrame = {
    checkpointRdds(df).foreach(trackRdd(df.sparkSession, _))
    df
  }

  /** Blocking-unpersist every tracked plan and checkpoint block of the
    * session. Call AFTER materializing results: dropped checkpoint data
    * cannot be recomputed (the lineage was truncated by design). */
  def releaseAll(spark: SparkSession): Unit = {
    val (d, r) = synchronized {
      (dfs.remove(spark).map(_.toList).getOrElse(Nil),
        rdds.remove(spark).map(_.toList).getOrElse(Nil))
    }
    d.foreach(_.unpersist(true))
    r.foreach(_.unpersist(true))
  }
}
