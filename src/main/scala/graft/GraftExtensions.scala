package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.DotProductExpr

/** SparkSessionExtensions entry point: launch any session with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and the library's
  * native expressions are available to pure-SQL users (`SELECT
  * graft_dot(a, b)`) with no registration code. Sessions created without
  * the conf can call [[graft.functions.DotProductExpr.register]] instead —
  * both routes install the same builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectFunction((
      FunctionIdentifier(DotProductExpr.Name),
      DotProductExpr.info,
      DotProductExpr.builder))
}
