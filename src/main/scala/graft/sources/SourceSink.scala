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

/** S6 JdbcSource (reference: star/io/JdbcReader.scala:13-22). Context keys:
  * `url`, `dbtable` (a table name OR a parenthesized pushdown subquery),
  * optional `driver`, `user`, `password`, and — for parallel reads —
  * `partition_column`/`lower_bound`/`upper_bound`/`num_partitions` (without
  * them the whole table arrives through ONE connection on one task; any
  * table worth reading at scale should set them).
  *
  * Exercised END-TO-END against an embedded Derby database (shipped in
  * Spark's own jars): write -> read round-trip, pushdown subquery, and a
  * partitioned parallel read split into stride queries (PipelineSpec). */
object JdbcSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame =
    reader(spark, ctx).load()

  /** Visible for the plumbing spec: the fully-configured reader. */
  private[graft] def reader(spark: SparkSession, ctx: TransformationContext) = {
    val r = spark.read.format("jdbc")
      .option("url", ctx[String]("url"))
      .option("dbtable", ctx[String]("dbtable"))
    val withOpt = Seq("driver", "user", "password").foldLeft(r) { (acc, k) =>
      ctx.get[String](k).map(acc.option(k, _)).getOrElse(acc)
    }
    ctx.get[String]("partition_column").map { pc =>
      val (lo, hi) = (ctx.get[String]("lower_bound"), ctx.get[String]("upper_bound"))
      require(lo.isDefined && hi.isDefined,
        "partition_column requires lower_bound and upper_bound ctx keys " +
          "(Spark needs the range to split the read into stride queries)")
      withOpt.option("partitionColumn", pc)
        .option("lowerBound", lo.get)
        .option("upperBound", hi.get)
        .option("numPartitions",
          ctx.get[Int]("num_partitions").getOrElse(8).toString)
    }.getOrElse(withOpt)
  }
}

/** S6 JdbcSink: append/overwrite into a JDBC table. `batchsize` bounds
  * per-round-trip row count; writes run one connection per partition, so
  * `coalesce` the input if the target DB can't take the fan-in. */
object JdbcSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit = {
    val w = df.write.format("jdbc")
      .mode(ctx.get[String]("mode").getOrElse("append"))
      .option("url", ctx[String]("url"))
      .option("dbtable", ctx[String]("dbtable"))
      .option("batchsize", ctx.get[Int]("batchsize").getOrElse(1000).toString)
    Seq("driver", "user", "password").foldLeft(w) { (acc, k) =>
      ctx.get[String](k).map(acc.option(k, _)).getOrElse(acc)
    }.save()
  }
}

/** JSONL source (beyond the reference — the interchange format LLM text
  * corpora actually ship as: one JSON object per line, newline-delimited,
  * splittable so a 100 TB dump still reads one HDFS block per task).
  * Schema from ctx when given (the scale path: inference reads the whole
  * input TWICE — never let it near a large corpus), else inferred.
  * Multiline JSON is deliberately NOT supported: a multiline file is not
  * splittable and serializes the read through one task per file. */
object JsonlSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame = {
    val r = spark.read
    ctx.get[StructType]("schema").map(r.schema).getOrElse(r)
      .json(ctx[String]("in_path"))
  }
}

/** JSONL sink: newline-delimited JSON, overwrite mode, optional
  * `compression` (zstd/gzip — line-oriented codecs keep splittability
  * only for block codecs; prefer zstd). Column TYPES survive the round
  * trip only through an explicit read schema — JSON itself stores
  * numbers untyped. */
object JsonlSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    ctx.get[String]("compression").map(w.option("compression", _))
      .getOrElse(w)
      .json(ctx[String]("out_path"))
  }
}

/** ORC source (beyond the reference): the other columnar lake format —
  * Spark's native ORC reader gives the same predicate pushdown / column
  * pruning path as parquet, so Hive-era lakes read at full scan speed
  * without conversion. */
object OrcSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame =
    spark.read.orc(ctx[String]("in_path"))
}

/** ORC sink: overwrite mode, optional `partition_by` (the ParquetSink
  * contract on the ORC writer). */
object OrcSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    ctx.get[Seq[String]]("partition_by")
      .map(p => w.partitionBy(p: _*)).getOrElse(w)
      .orc(ctx[String]("out_path"))
  }
}

/** Binary-file source (beyond the reference): raw media ingestion for
  * the multimodal pipeline — each matched file becomes one row of
  * (path, modificationTime, length, content), the schema
  * [[graft.multimodal.Multimodal]] decoders consume. Context keys:
  * `in_path` (directory or glob), optional `glob` (pathGlobFilter,
  * e.g. `*.png`), optional `recursive` (recursiveFileLookup).
  *
  * Scale notes: Spark's `binaryFile` format lists and assigns files to
  * tasks like any file source (driver listing parallelizes past
  * `spark.sql.sources.parallelPartitionDiscovery.threshold`), so 10⁸
  * images shard across executors with no custom code; but each CONTENT
  * cell is one in-memory byte array — raw media should flow straight
  * into a decode `mapPartitions` (M3) or be re-packed into parquet
  * blob tables, never collected. Filter on `length` BEFORE touching
  * `content` — the reader prunes columns, so a metadata-only pass
  * never reads file bytes. */
object BinaryFileSource extends Source {
  def apply(spark: SparkSession, ctx: TransformationContext): DataFrame = {
    val r = spark.read.format("binaryFile")
    val withGlob = ctx.get[String]("glob")
      .map(g => r.option("pathGlobFilter", g)).getOrElse(r)
    ctx.get[Boolean]("recursive")
      .map(b => withGlob.option("recursiveFileLookup", b.toString))
      .getOrElse(withGlob)
      .load(ctx[String]("in_path"))
  }
}

/** S8/O8-style sample writer (reference: star/io/ParquetWriter.scala:20-32). */
object SampleParquetSink extends Sink {
  def write(df: DataFrame, ctx: TransformationContext): Unit =
    df.sample(withReplacement = false,
        ctx.get[Double]("fraction").getOrElse(0.1), seed = 42)
      .write.mode(SaveMode.Overwrite).parquet(ctx[String]("out_path"))
}

/** One column of a fixed-width record layout: 1-based `start`, byte
  * `len`, target Spark `typ` (cast after an optional trim — numeric
  * mainframe extracts are space-padded). */
case class FixedWidthField(name: String, start: Int, len: Int,
    typ: String = "string", trimPad: Boolean = true)

/** S20: FIXED-WIDTH record parsing — the companion of the S16 EBCDIC
  * decode on mainframe-extract ingest paths: COBOL copybook layouts
  * are positional, not delimited, so each field is one `substring`
  * projection (codegen'd, no UDF, no regex) with an optional trim and
  * cast. [[format]] is the inverse (right-pad to each width) so
  * round-trip contracts are testable; [[parse]] is embarrassingly
  * parallel — one scan, zero shuffles at any scale. */
object FixedWidth {
  import org.apache.spark.sql.functions._

  def parse(df: DataFrame, lineCol: String,
      fields: Seq[FixedWidthField]): DataFrame = {
    require(fields.nonEmpty, "FixedWidth.parse: no fields")
    fields.foreach { f =>
      require(f.start >= 1 && f.len >= 1,
        s"field '${f.name}': 1-based start and positive len required")
    }
    df.select(fields.map { f =>
      val raw = substring(col(lineCol), f.start, f.len)
      val v = if (f.trimPad) trim(raw) else raw
      (if (f.typ == "string") v else v.cast(f.typ)).as(f.name)
    }: _*)
  }

  /** Right-pad each column to its field width and concatenate in
    * layout order. Values longer than their width fail loud (a silent
    * truncation corrupts every downstream offset), and so do NULLs:
    * a NULL would otherwise make the whole concat NULL and the record
    * silently vanish from the extract — encode absence explicitly
    * (empty string, a sentinel) before formatting. */
  def format(df: DataFrame, fields: Seq[FixedWidthField]): DataFrame = {
    require(fields.nonEmpty, "FixedWidth.format: no fields")
    val checked = fields.map { f =>
      val s = col(f.name).cast("string")
      when(s.isNull,
        raise_error(lit(s"FixedWidth.format: NULL value in '${f.name}'" +
          " — records must encode absence explicitly, not vanish")))
        .when(length(s) > f.len,
          raise_error(concat(lit(s"FixedWidth.format: value of '${f.name}' exceeds width ${f.len}: "), s)))
        .otherwise(rpad(s, f.len, " "))
    }
    df.select(concat(checked: _*).as("line"))
  }
}
