package graft.sources

import graft.pipeline.TransformationContext
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1-S5: context-driven sources and sinks (reference: diamond/io/
  * Source.scala:25-144, Sink.scala:22-63). Context keys follow the
  * reference (`in_path`, `out_path`, `header`, `schema`, `sql`). */
trait Source extends Serializable {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame
}
trait Sink extends Serializable {
  def write(df: DataFrame, ctx: TransformationContext): Unit
}

/** S1 CSVSource: header option + optional explicit schema from ctx. */
object CsvSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame = {
    val r = spark.read
      .option("header", ctx.get[Boolean]("header").getOrElse(true).toString)
    ctx.get[StructType]("schema").map(r.schema).getOrElse(r.option("inferSchema", "true"))
      .csv(ctx[String]("in_path"))
  }
}

/** S2 ParquetSource. */
object ParquetSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame =
    spark.read.parquet(ctx[String]("in_path"))
}

/** S3 SQLSource: templated SQL over registered views. */
object SqlSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame =
    spark.sql(graft.functions.template(ctx[String]("sql"), ctx.sqlParams))
}

/** S4 CSVSink (header always written; overwrite mode). */
object CsvSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(ctx[String]("out_path"))
}

/** S5 ParquetSink with optional `partition_by` list. */
object ParquetSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    ctx.get[Seq[String]]("partition_by")
      .map(p => w.partitionBy(p: _*)).getOrElse(w)
      .parquet(ctx[String]("out_path"))
  }
}

/** S8/O8-style sample writer (reference: star/io/ParquetWriter.scala:20-32). */
object SampleParquetSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit =
    df.sample(withReplacement = false,
        ctx.get[Double]("fraction").getOrElse(0.1), seed = 42)
      .write.mode(SaveMode.Overwrite).parquet(ctx[String]("out_path"))
}
