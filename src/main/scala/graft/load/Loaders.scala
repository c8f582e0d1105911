package graft.load

import graft.meta.Meta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Thin typed wrappers over the [[Scd2Merge]] kernel — the four Data Vault
  * loader surfaces of the reference (C1–C4, reference:
  * diamond/load/ParquetDataLoader.scala:49-975). All four share the same
  * I/U/D state machine; they differ only in how the entity key is formed
  * and which payload columns ride along.
  */
object Loaders {
  import Meta._

  /** C1 `loadHub`: register entities — natural keys + id-type, no payload
    * (reference: ParquetDataLoader.scala:49-270). */
  def loadHub(incoming: DataFrame, existing: Option[DataFrame],
      cfg: MergeConfig): Scd2Merge.MergeResult = {
    val keysOnly = cfg.copy(projection =
      Some(cfg.projection.getOrElse(incoming.columns.toSeq)
        .filter(c => cfg.idFields.contains(cfg.newNames.getOrElse(c, c)) ||
          cfg.idFields.contains(c))))
    Scd2Merge.merge(incoming, existing, keysOnly)
      .copy()
  }

  /** C2 `loadSatellite`: full-payload SCD2 history
    * (reference: ParquetDataLoader.scala:272-553). */
  def loadSatellite(incoming: DataFrame, existing: Option[DataFrame],
      cfg: MergeConfig): Scd2Merge.MergeResult =
    Scd2Merge.merge(incoming, existing, cfg)

  /** C3 `loadLink`: many-to-many (src, dst) hashed-pair keys
    * (reference: ParquetDataLoader.scala:555-764). The pair key is the
    * concatenation of the two per-side entity hashes; both side hashes are
    * kept as `src_entity_id` / `dst_entity_id` columns. */
  def loadLink(incoming: DataFrame, existing: Option[DataFrame],
      srcFields: Seq[String], srcIdType: String,
      dstFields: Seq[String], dstIdType: String,
      cfg: MergeConfig): Scd2Merge.MergeResult = {
    val withSides = incoming
      .withColumn(SrcEntityId,
        graft.functions.entityIdHash(srcIdType, srcFields.map(col)))
      .withColumn(DstEntityId,
        graft.functions.entityIdHash(dstIdType, dstFields.map(col)))
    Scd2Merge.merge(withSides, existing,
      cfg.copy(idFields = Seq(SrcEntityId, DstEntityId)))
  }

  /** One table of a C5 `loadAll` run. `kind` decides the loader surface;
    * links/mappings carry their side-key config. */
  case class TableLoad(
      table: String,
      incoming: DataFrame,
      cfg: MergeConfig,
      kind: String = "satellite",
      srcFields: Seq[String] = Nil, srcIdType: String = "",
      dstFields: Seq[String] = Nil, dstIdType: String = "")

  /** C5 `loadAll`: config-driven orchestration — hubs, then satellites,
    * then links/mappings, each persisted and logged through the store
    * (reference: DataLoader.scala:98-151). Hash keys mean the phases have
    * no surrogate-lookup dependency; the phase order only preserves the
    * reference's audit convention. */
  def loadAll(store: Scd2Store, loads: Seq[TableLoad]): Map[String, Map[String, Long]] = {
    val phase = Map("hub" -> 0, "satellite" -> 1, "link" -> 2, "mapping" -> 2)
    loads.sortBy(l => phase.getOrElse(l.kind, 3)).map { l =>
      val incoming = l.kind match {
        case "hub" =>
          // keep key columns whether idFields name their raw or renamed
          // form — same rule as loadHub
          l.incoming.select(l.incoming.columns.toSeq
            .filter(c => l.cfg.idFields.contains(l.cfg.newNames.getOrElse(c, c)) ||
              l.cfg.idFields.contains(c)).map(col): _*)
        case "link" | "mapping" =>
          l.incoming
            .withColumn(SrcEntityId,
              graft.functions.entityIdHash(l.srcIdType, l.srcFields.map(col)))
            .withColumn(DstEntityId,
              graft.functions.entityIdHash(l.dstIdType, l.dstFields.map(col)))
        case _ => l.incoming
      }
      val cfg = l.kind match {
        case "link" | "mapping" =>
          l.cfg.copy(idFields = Seq(SrcEntityId, DstEntityId))
        case _ => l.cfg
      }
      l.table -> store.runLoadLogged(l.table, incoming, cfg)
    }.toMap
  }

  /** [[loadAll]] with intra-phase parallelism — the reference's stated
    * design goal for hash keys (DataLoader.scala:15-21: no surrogate-key
    * lookup step means hubs, satellites and links of one source have no
    * load-order dependency). Tables of the SAME phase submit their Spark
    * jobs concurrently (the scheduler interleaves them across the
    * cluster); phases still run in the reference's audit order. Each
    * table's store directory is independent, so the concurrent writes
    * never contend. */
  def loadAllParallel(store: Scd2Store, loads: Seq[TableLoad],
      maxConcurrent: Int = 4): Map[String, Map[String, Long]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val phase = Map("hub" -> 0, "satellite" -> 1, "link" -> 2, "mapping" -> 2)
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, maxConcurrent))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      loads.groupBy(l => phase.getOrElse(l.kind, 3)).toSeq.sortBy(_._1)
        .flatMap { case (_, phaseLoads) =>
          val fs = phaseLoads.map(l => Future(loadAll(store, Seq(l)).head))
          fs.map(Await.result(_, Duration.Inf))
        }.toMap
    } finally pool.shutdown()
  }

  /** C4 `loadMapping`: a link with a `confidence` weight, feeding entity
    * resolution (reference: ParquetDataLoader.scala:766-975). */
  def loadMapping(incoming: DataFrame, existing: Option[DataFrame],
      srcFields: Seq[String], srcIdType: String,
      dstFields: Seq[String], dstIdType: String,
      confidenceCol: String,
      cfg: MergeConfig): Scd2Merge.MergeResult = {
    require(incoming.columns.contains(confidenceCol),
      s"mapping load requires a $confidenceCol column")
    loadLink(
      incoming.withColumn(Confidence, col(confidenceCol).cast("double")),
      existing, srcFields, srcIdType, dstFields, dstIdType, cfg)
  }
}
