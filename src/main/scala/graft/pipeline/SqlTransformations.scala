package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** R5: SQL-text transformations — inline, file-backed and named
  * (reference: the diamond/transform/sql package). Parameter substitution uses
  * the quote-aware `$name` templating (graft.functions.template), the same
  * surface the reference used in place of parameterized queries
  * (reference: docs/executing_sql.md:66-74). */
object SqlTransformations {

  /** Inline SQL with `$param` substitution from the context's sqlparams. */
  def sql(spark: SparkSession, text: String,
      ctx: TransformationContext): DataFrame =
    spark.sql(graft.functions.template(text, ctx.sqlParams))

  /** Spark-4-native parameterized SQL (`:name` markers) — the engine-level
    * replacement for string templating the reference lacked
    * (docs/executing_sql.md:66-74 explains its `$var` workaround; Spark 4
    * binds parameters in the parser, so values need no quoting/escaping). */
  def sqlWithArgs(spark: SparkSession, text: String,
      args: Map[String, Any]): DataFrame =
    spark.sql(text, args)

  /** Table-scoped: register the input as a temp view first (reference:
    * table/SQLTableTransformation.scala:23-27). */
  def sqlTable(df: DataFrame, viewName: String, text: String,
      ctx: TransformationContext): DataFrame = {
    df.createOrReplaceTempView(viewName)
    sql(df.sparkSession, text, ctx)
  }

  /** Named queries from a `.properties` file — line-oriented, or the Java
    * XML properties format when the path ends in `.xml` — cached per path
    * (reference: sql/SQLLoader.scala:27-56 — synchronized map cache with
    * the same extension rule). */
  private val cache = TrieMap.empty[String, Map[String, String]]

  def loadNamed(propsPath: String): Map[String, String] =
    cache.getOrElseUpdate(propsPath, {
      val p = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(propsPath))
      try {
        if (propsPath.endsWith(".xml")) p.loadFromXML(in) else p.load(in)
      } finally in.close()
      import scala.jdk.CollectionConverters._
      p.asScala.toMap
    })

  def namedSql(spark: SparkSession, propsPath: String, queryName: String,
      ctx: TransformationContext): DataFrame = {
    val text = loadNamed(propsPath).getOrElse(queryName,
      throw new NoSuchElementException(s"no query '$queryName' in $propsPath"))
    sql(spark, text, ctx)
  }

  /** SQL from a plain file (reference: sql/SQLFileTransformation.scala:13-22). */
  def fileSql(spark: SparkSession, path: String,
      ctx: TransformationContext): DataFrame =
    sql(spark, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), ctx)
}
