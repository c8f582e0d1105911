package graft.load

import graft.config.Hocon
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C5 CONFIG SURFACE: build a [[Loaders.loadAll]] run from the reference's
  * HOCON `data.acquisition` layout (schema: diamond/conf.scala:10-267;
  * orchestration: diamond/load/DataLoader.scala:98-151; fixture shape:
  * src/test/resources/data.conf):
  *
  * {{{
  * data {
  *   acquisition {
  *     hubs       { <name> { entity-type, delta, id-fields, id-type,
  *                           source, table-name?, new-names?, overwrite? } }
  *     satellites { <name> { table-name, delta, id-fields, id-type, source,
  *                           projection?, new-names?, overwrite?,
  *                           write-change-tables? } }
  *     links      { <name> { src-entity-type, src-id-fields, src-id-type,
  *                           dst-entity-type, dst-id-fields, dst-id-type,
  *                           delta, source, table-name? } }
  *     mappings   { <name> { entity-type, src-id-fields, src-id-type,
  *                           dst-id-fields, dst-id-type, confidence,
  *                           delta, source, table-name? } }
  *   }
  * }
  * }}}
  *
  * `source` is a parquet path (the reference's raw-table refs resolve to
  * parquet URIs via `$${data.raw.tables…}` substitutions, which
  * [[Hocon]] expands). Per-run identity (process id/time/user) is an
  * argument, not config — the reference took it from the job context the
  * same way. A mapping's constant `confidence` becomes the mapping load's
  * confidence column. */
object LoadConfig {

  /** Parse `confText` and build the load set, reading each table's
    * `source` with `readSource` (defaults to a parquet read). Table name
    * precedence: `table-name`, else the block's own name. */
  def tableLoads(spark: SparkSession, confText: String,
      processId: String, processTime: String, userId: String = "system",
      readSource: String => DataFrame = null): Seq[Loaders.TableLoad] = {
    val read: String => DataFrame =
      if (readSource != null) readSource else spark.read.parquet(_)
    val conf = Hocon.parse(confText)
    val acq = "data.acquisition"

    def mergeCfg(c: Hocon.Conf, idFields: Seq[String], idType: String,
        entityType: String, kind: String): MergeConfig = MergeConfig(
      // the reference config names id-fields PRE-rename (data.conf pairs
      // `id-fields = [cust_id]` with `new-names { cust_id: customer_id }`);
      // the merge keys on the post-rename schema
      idFields = idFields.map(f => c.stringMap("new-names").getOrElse(f, f)),
      idType = idType,
      entityType = entityType,
      source = c.getString("source"),
      processType = s"${kind}_load",
      processId = processId, userId = userId, processTime = processTime,
      isDelta = c.getBool("delta"),
      overwrite = c.getBool("overwrite"),
      projection = if (c.has("projection")) Some(c.getSeq("projection")) else None,
      newNames = c.stringMap("new-names"),
      // reference satellites default this OFF; absent = keep the store's
      // default (on) so unconfigured loads keep their change tables
      writeChangeTables = c.getBool("write-change-tables", default = true))

    val hubs = conf.children(s"$acq.hubs").map { case (name, c) =>
      Loaders.TableLoad(
        table = c.getOpt("table-name").getOrElse(name),
        incoming = read(c.getString("source")),
        cfg = mergeCfg(c, c.getSeq("id-fields"), c.getString("id-type"),
          c.getString("entity-type"), "hub"),
        kind = "hub")
    }
    val sats = conf.children(s"$acq.satellites").map { case (name, c) =>
      Loaders.TableLoad(
        table = c.getOpt("table-name").getOrElse(name),
        incoming = read(c.getString("source")),
        cfg = mergeCfg(c, c.getSeq("id-fields"), c.getString("id-type"),
          c.getOpt("entity-type").getOrElse(name), "satellite"),
        kind = "satellite")
    }
    def sides(c: Hocon.Conf, name: String, kind: String,
        entityType: String): Loaders.TableLoad = Loaders.TableLoad(
      table = c.getOpt("table-name").getOrElse(name),
      incoming = {
        val df = read(c.getString("source"))
        if (kind == "mapping")
          df.withColumn(graft.meta.Meta.Confidence,
            lit(c.getDouble("confidence")))
        else df
      },
      // the pair key is built from the side configs by loadAll; idFields
      // here are informational until it swaps in the hashed sides
      cfg = mergeCfg(c, c.getSeq("src-id-fields") ++ c.getSeq("dst-id-fields"),
        s"${c.getString("src-id-type")}|${c.getString("dst-id-type")}",
        entityType, kind),
      kind = kind,
      srcFields = c.getSeq("src-id-fields"),
      srcIdType = c.getString("src-id-type"),
      dstFields = c.getSeq("dst-id-fields"),
      dstIdType = c.getString("dst-id-type"))
    val links = conf.children(s"$acq.links").map { case (name, c) =>
      sides(c, name, "link",
        s"${c.getString("src-entity-type")}_${c.getString("dst-entity-type")}")
    }
    val mappings = conf.children(s"$acq.mappings").map { case (name, c) =>
      sides(c, name, "mapping", c.getString("entity-type"))
    }
    hubs ++ sats ++ links ++ mappings
  }

  /** Parse + run in one step (sequential phases; use
    * [[Loaders.loadAllParallel]] on the parsed loads for intra-phase
    * concurrency). */
  def loadAll(store: Scd2Store, confText: String, processId: String,
      processTime: String, userId: String = "system")
      : Map[String, Map[String, Long]] =
    Loaders.loadAll(store,
      tableLoads(store.spark, confText, processId, processTime, userId))
}
