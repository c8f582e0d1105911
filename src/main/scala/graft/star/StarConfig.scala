package graft.star

import graft.config.Hocon
import org.apache.spark.sql.DataFrame

/** T1 CONFIG SURFACE: build a [[Star.dimensionalize]] run from the
  * reference's `star.conf` layout (schema: star/conf.scala:13-44; fixture:
  * src/test/resources/star.conf):
  *
  * {{{
  * unknown = unknown
  * dims {
  *   "superstore_sales.csv" = [
  *     [[order_priority], []]
  *     [[province, region], []]
  *   ]
  * }
  * facts { "superstore_sales.csv" = [ order_id, sales, … ] }
  * tables = [ "superstore_sales.csv" ]
  * }}}
  *
  * Each `dims` entry is a list of `[keyFields, attrFields]` pairs — the
  * reference's `(List[String], List[String])` — one [[DimSpec]] each,
  * named after its first key field (the reference's `dim_<head>` naming,
  * star/Loader.scala:52). `facts` lists the fact-table output columns;
  * fact keys default to each dim's own key fields, as the reference's
  * `loadFacts(df, facts(source), dims(source).map(_._1), …)` call does.
  * `readSource` maps a source name to its DataFrame (the reference's
  * Reader indirection — CSV/parquet/JDBC is the caller's choice). */
object StarConfig {

  /** Parse `confText` into the [[Star.StarSource]] sequence
    * [[Star.dimensionalize]] consumes. */
  def starSources(confText: String,
      readSource: String => DataFrame): Seq[Star.StarSource] = {
    val conf = Hocon.parse(confText)
    val unknown = conf.getOpt("unknown").getOrElse("unknown")
    def entriesOf(block: String): Map[String, Any] =
      if (conf.has(block)) conf.getObj(block).root else Map.empty
    val dims = entriesOf("dims")
    val facts = entriesOf("facts")

    def strings(v: Any, what: String): Seq[String] = v match {
      case xs: Seq[Any @unchecked] => xs.map {
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"$what must hold strings, got: $other")
      }
      case other => throw new IllegalArgumentException(
        s"$what must be a list, got: $other")
    }

    conf.getSeq("tables").map { source =>
      val specs = dims.get(source).toSeq.flatMap {
        case pairs: Seq[Any @unchecked] => pairs.map {
          case Seq(keys, attrs) =>
            val keyFields = strings(keys, s"dims.$source key fields")
            require(keyFields.nonEmpty, s"dims.$source: empty key-field list")
            DimSpec(keyFields.head,
              keyFields, strings(attrs, s"dims.$source attr fields"), unknown)
          case other => throw new IllegalArgumentException(
            s"dims.$source entries must be [keyFields, attrFields] pairs, got: $other")
        }
        case other => throw new IllegalArgumentException(
          s"dims.$source must be a list of pairs, got: $other")
      }
      Star.StarSource(
        name = source.replaceAll("\\.[^.]+$", ""),
        df = readSource(source),
        dims = specs,
        factOutCols = facts.get(source)
          .map(strings(_, s"facts.$source")).getOrElse(Nil))
    }
  }

  /** Parse + run in one step. */
  def dimensionalize(confText: String, readSource: String => DataFrame,
      processTime: String,
      existing: Map[String, DataFrame] = Map.empty): Star.StarRun =
    Star.dimensionalize(starSources(confText, readSource), processTime, existing)
}
