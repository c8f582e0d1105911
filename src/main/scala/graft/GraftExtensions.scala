package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.{DotProductExpr, JaroWinklerExpr, L2DistanceExpr}

/** SparkSessionExtensions entry point: launch any session with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and the library's
  * native expressions are available to pure-SQL users (`SELECT
  * graft_dot(a, b)`, `graft_l2(a, b)`) with no registration code.
  * Sessions created without the conf can call
  * [[graft.functions.DotProductExpr.register]] /
  * [[graft.functions.L2DistanceExpr.register]] instead — both routes
  * install the same builders. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier(DotProductExpr.Name),
      DotProductExpr.info,
      DotProductExpr.builder))
    extensions.injectFunction((
      FunctionIdentifier(L2DistanceExpr.Name),
      L2DistanceExpr.info,
      L2DistanceExpr.builder))
    extensions.injectFunction((
      FunctionIdentifier(JaroWinklerExpr.Name),
      JaroWinklerExpr.info,
      JaroWinklerExpr.builder))
  }
}
