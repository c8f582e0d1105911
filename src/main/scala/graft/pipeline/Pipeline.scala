package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructField
import org.apache.spark.util.LongAccumulator
import scala.collection.mutable

/** Mutable state baton threaded through a pipeline run (reference:
  * diamond/transform/TransformationContext.scala:19-36 — a serializable
  * `Map[String, Any]` with well-known keys). */
class TransformationContext extends Serializable {
  val values: mutable.Map[String, Any] = mutable.Map(
    TransformationContext.Steps -> Vector.empty[JobStep],
    TransformationContext.SqlParams -> Map.empty[String, String])
  def apply[T](key: String): T = values(key).asInstanceOf[T]
  def get[T](key: String): Option[T] = values.get(key).map(_.asInstanceOf[T])
  def update(key: String, v: Any): Unit = values(key) = v
  def steps: Vector[JobStep] = apply(TransformationContext.Steps)
  def addStep(s: JobStep): Unit =
    values(TransformationContext.Steps) = steps :+ s
  def sqlParams: Map[String, String] = apply(TransformationContext.SqlParams)
}
object TransformationContext {
  val Steps = "steps"
  val SqlParams = "sqlparams"
  val Errors = "errors"
}

/** Audit record per pipeline step (reference: diamond/models/JobStep.scala:9-15). */
case class JobStep(name: String, ok: Boolean, detail: String = "")

/** A named table-level transformation with explicit dependencies
  * (reference: diamond/transform/Transformation.scala:8-15). */
trait Transformation extends Serializable {
  def name: String
  def dependencies: Seq[String] = Nil
  def apply(df: DataFrame, ctx: TransformationContext): DataFrame
}

object Transformation {
  def apply(n: String, deps: Seq[String] = Nil)(
      f: (DataFrame, TransformationContext) => DataFrame): Transformation =
    new Transformation {
      val name: String = n
      override def dependencies: Seq[String] = deps
      def apply(df: DataFrame, ctx: TransformationContext): DataFrame = f(df, ctx)
    }
}

object Pipeline {

  /** O7 `tsort`: topological order of (from, to) edges; cycles throw
    * (reference: common/utility/sortFunctions.scala:18-35). */
  def tsort(edges: Seq[(String, String)]): Seq[String] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = mutable.ListBuffer.empty[String]
    val incoming = mutable.Map(nodes.map(n =>
      n -> edges.count(_._2 == n)): _*)
    val ready = mutable.Queue(nodes.filter(incoming(_) == 0).sorted: _*)
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += n
      edges.filter(_._1 == n).map(_._2).sorted.foreach { m =>
        incoming(m) -= 1
        if (incoming(m) == 0) ready += m
      }
    }
    if (out.size != nodes.size)
      throw new IllegalStateException(
        s"cycle among ${nodes.diff(out.toSeq).mkString(", ")}")
    out.toSeq
  }

  /** Order transformations by their declared dependencies; independent
    * transformations keep registration order (reference:
    * table/RowTransformationPipeline.scala:73-83). Kahn's algorithm over
    * ALL registered transformations with the ready set ordered by
    * registration index — a dependency-free step registered first runs
    * first, never after the dependent chain. */
  def order(ts: Seq[Transformation]): Seq[Transformation] = {
    val byName = ts.map(t => t.name -> t).toMap
    val regIndex = ts.map(_.name).zipWithIndex.toMap
    val incoming = mutable.Map(ts.map(t =>
      t.name -> t.dependencies.count(byName.contains)): _*)
    val dependents = ts.flatMap(t =>
      t.dependencies.filter(byName.contains).map(_ -> t.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ready = mutable.PriorityQueue.empty[String](
      Ordering.by[String, Int](regIndex).reverse)
    ready ++= ts.filter(t => incoming(t.name) == 0).map(_.name)
    val out = mutable.ListBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += n
      dependents.getOrElse(n, Nil).foreach { m =>
        incoming(m) -= 1
        if (incoming(m) == 0) ready += m
      }
    }
    if (out.size != ts.size)
      throw new IllegalStateException(
        s"cycle among ${ts.map(_.name).diff(out.toSeq).mkString(", ")}")
    out.toSeq.map(byName)
  }

  /** R4 `TableTransformationPipeline`: dependency-ordered fold with JobStep
    * audit; a failing step records failure and rethrows (reference:
    * table/TableTransformationPipeline.scala:21-51). */
  def run(df: DataFrame, ts: Seq[Transformation],
      ctx: TransformationContext): DataFrame =
    order(ts).foldLeft(df) { (d, t) =>
      try {
        val out = t(d, ctx)
        ctx.addStep(JobStep(t.name, ok = true))
        out
      } catch {
        case e: Exception =>
          ctx.addStep(JobStep(t.name, ok = false, detail = e.getMessage))
          throw e
      }
    }

  /** R6 two-source join variant — implemented correctly: the reference
    * discarded the join predicates it built (reference:
    * diamond/transform/Pipeline.scala:23-29, `where` results never
    * reassigned — a documented bug we do not reproduce). */
  def join2(left: DataFrame, right: DataFrame,
      keyPairs: Seq[(String, String)]): DataFrame =
    left.join(right,
      keyPairs.map { case (l, r) => left(l) === right(r) }.reduce(_ && _))

  /** R6 `Pipeline.run`: source → ordered transformations → sink
    * (reference: diamond/transform/Pipeline.scala:20-22). Lazy end to end —
    * the single action is the sink's write. */
  def runPipeline(spark: SparkSession, source: graft.sources.Source,
      ts: Seq[Transformation], sink: graft.sources.Sink,
      ctx: TransformationContext): Unit =
    sink.write(run(source(spark, ctx), ts, ctx), ctx)

  /** R6 `printDAG`: ASCII rendering of the dependency-ordered plan
    * (reference: Pipeline.scala:31-45). */
  def renderDag(ts: Seq[Transformation]): String =
    order(ts).map { t =>
      if (t.dependencies.isEmpty) t.name
      else s"${t.dependencies.mkString(", ")} --> ${t.name}"
    }.mkString("\n")
}

/** Signal for R3's error budget (reference:
  * diamond/models/Errors.scala + RowTransformationPipeline.scala:40-51). */
class ErrorThresholdReachedException(val errors: Long, val threshold: Long)
  extends RuntimeException(s"row errors $errors exceeded threshold $threshold")

/** R1-R3: row-level transformation pipeline. Where the reference mapped
  * `Row => Row` lambdas over `df.rdd` and mutated a serialized context
  * (an acknowledged limitation, RowTransformationPipeline.scala:47-51),
  * this keeps the row function but counts failures with a Spark
  * accumulator and drops failed rows. Prefer column expressions — this
  * exists for genuinely imperative per-row logic. */
object RowPipeline {

  /** Append computed columns; failed rows are dropped and counted in the
    * returned accumulator (informational — accumulators in transformations
    * over-count on task retries). With a finite `errorThreshold` the
    * result is materialized eagerly (localCheckpoint) and the budget is
    * enforced on the DETERMINISTIC error count, input rows minus surviving
    * rows — retry- and speculation-proof. */
  def appendColumns(df: DataFrame, appended: Seq[StructField],
      f: Row => Seq[Any], errorThreshold: Long = Long.MaxValue)(
      implicit spark: SparkSession): (DataFrame, LongAccumulator) = {
    val errors = spark.sparkContext.longAccumulator("row_errors")
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields ++ appended)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        try Iterator.single(Row.fromSeq(row.toSeq ++ f(row)))
        catch { case _: Exception => errors.add(1); Iterator.empty }
      }
    }
    val out = spark.createDataFrame(rdd, schema)
    if (errorThreshold == Long.MaxValue) (out, errors)
    else {
      val materialized = graft.util.Caches.trackCheckpointed(
        out.localCheckpoint(true))
      val errCount = df.count() - materialized.count()
      if (errCount > errorThreshold) {
        materialized.unpersist()
        throw new ErrorThresholdReachedException(errCount, errorThreshold)
      }
      (materialized, errors)
    }
  }
}
