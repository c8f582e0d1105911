package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst Euclidean (L2) distance over two `array<double>`
  * columns — the second codegen'd vector kernel beside
  * [[DotProductExpr]], for the metric half of the ANN surface (papers
  * and indexes quote L2 as often as cosine; IVF/PQ literature is
  * L2-native). Same design rationale: the generated loop reads
  * `ArrayData` in place inside whole-stage codegen — no Seq conversion,
  * no eval boundary.
  *
  * Computed DIRECTLY as `sqrt(Σ (aᵢ−bᵢ)²)` with left-to-right
  * accumulation — bit-identical to DuckDB `list_distance` — rather than
  * via the algebraic `√(a·a − 2a·b + b·b)`, whose float rounding
  * differs and which loses precision catastrophically for near-equal
  * vectors (the exact case near-duplicate thresholds care about).
  * Ragged inputs truncate to the shorter length (the [[DotProductExpr]]
  * contract); NULL in → NULL out. */
case class L2DistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2DistanceExpr {
  val Name = "graft_l2"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[L2DistanceExpr].getCanonicalName, Name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name takes exactly 2 arguments")
    L2DistanceExpr(exprs.head, exprs(1))
  }

  /** Idempotently register `graft_l2` with an EXISTING session (for
    * sessions not launched with [[graft.GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "internal")
}
