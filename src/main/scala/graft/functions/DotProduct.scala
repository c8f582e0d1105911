package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns — the
  * level-(b) extension point of the design rules: a codegen'd
  * `Expression` beats a Scala UDF because the generated loop reads
  * `ArrayData` in place (no per-call conversion of both arrays to
  * `Seq[Double]`), and it stays INSIDE whole-stage codegen instead of
  * forcing an eval boundary.
  *
  * Semantics match [[graft.ann.Similarity.dot]] exactly: left-to-right
  * accumulation (bit-identical to DuckDB `list_dot_product`), ragged
  * inputs truncate to the shorter length, NULL in → NULL out. */
case class DotProductExpr(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  val Name = "graft_dot"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProductExpr].getCanonicalName, Name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name takes exactly 2 arguments")
    DotProductExpr(exprs.head, exprs(1))
  }

  /** Idempotently register `graft_dot` with an EXISTING session (for
    * sessions not launched with [[graft.GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "internal")
}
