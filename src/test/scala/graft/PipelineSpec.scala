package graft

import graft.infer.{BooleanParser, CsvSniffer, DateParser, Ebcdic}
import graft.pipeline._
import graft.store._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Pipeline"

  it should "order transformations topologically and reject cycles" in {
    Pipeline.tsort(Seq("a" -> "b", "b" -> "c", "a" -> "c")) shouldBe
      Seq("a", "b", "c")
    an[IllegalStateException] should be thrownBy
      Pipeline.tsort(Seq("a" -> "b", "b" -> "a"))
  }

  it should "run steps in dependency order with audit" in {
    val ctx = new TransformationContext
    val ts = Seq(
      Transformation("double", deps = Seq("inc")) { (df, _) =>
        df.withColumn("x", col("x") * 2) },
      Transformation("inc") { (df, _) => df.withColumn("x", col("x") + 1) })
    val out = Pipeline.run(Seq(1).toDF("x"), ts, ctx)
    out.select("x").as[Int].head() shouldBe 4 // (1+1)*2, not 1*2+1
    ctx.steps.map(s => (s.name, s.ok)) shouldBe
      Vector(("inc", true), ("double", true))
  }

  it should "run a dependency-free step registered first before dependent chains" in {
    val ctx = new TransformationContext
    val ts = Seq(
      Transformation("filter") { (df, _) => df.filter(col("x") < 10) },
      Transformation("agg", deps = Seq("derive")) { (df, _) =>
        df.agg(sum(col("x")).as("x")) },
      Transformation("derive", deps = Seq("filter")) { (df, _) =>
        df.withColumn("x", col("x") * 2) })
    // a pre-fix ordering appended the independent 'filter' AFTER the
    // chain, aggregating unfiltered data
    val out = Pipeline.run(Seq(1, 50).toDF("x"), ts, ctx)
    out.as[Long].head() shouldBe 2L // only x=1 survives the filter
    ctx.steps.map(_.name) shouldBe Vector("filter", "derive", "agg")
  }

  it should "record the failing step and rethrow" in {
    val ctx = new TransformationContext
    val boom = Transformation("boom") { (_, _) =>
      throw new RuntimeException("nope") }
    an[RuntimeException] should be thrownBy
      Pipeline.run(Seq(1).toDF("x"), Seq(boom), ctx)
    ctx.steps shouldBe Vector(JobStep("boom", ok = false, detail = "nope"))
  }

  it should "join two sources on all key pairs (fixed reference bug)" in {
    val l = Seq((1, "a"), (2, "b")).toDF("k1", "v1")
    val r = Seq((1, "a", 10), (1, "x", 20)).toDF("k2", "v2", "w")
    val out = Pipeline.join2(l, r, Seq("k1" -> "k2", "v1" -> "v2"))
    out.count() shouldBe 1 // cartesian would give 2 for k1=1
  }

  it should "bind native SQL parameters without string splicing" in {
    Seq((1, "a"), (2, "o'brien")).toDF("id", "name")
      .createOrReplaceTempView("sqlargs_in")
    val out = SqlTransformations.sqlWithArgs(spark,
      "SELECT id FROM sqlargs_in WHERE name = :n", Map("n" -> "o'brien"))
    out.as[Int].collect() shouldBe Array(2)
  }

  it should "execute named SQL from line-oriented and XML properties files" in {
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "tag")
      .createOrReplaceTempView("named_in")
    val ctx = new TransformationContext
    ctx.update(TransformationContext.SqlParams, Map("tag" -> "a"))
    // line-oriented .properties
    val pf = java.nio.file.Files.createTempFile("queries", ".properties")
    java.nio.file.Files.writeString(pf,
      "count_by_tag=SELECT count(1) AS n FROM named_in WHERE tag = '$tag'\n")
    SqlTransformations.namedSql(spark, pf.toString, "count_by_tag", ctx)
      .as[Long].head() shouldBe 2L
    // the XML properties format the reference's SQLLoader supports for
    // .xml extensions (TransformSpec "from an XML configuration file")
    val xf = java.nio.file.Files.createTempFile("queries", ".xml")
    java.nio.file.Files.writeString(xf,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<!DOCTYPE properties SYSTEM "http://java.sun.com/dtd/properties.dtd">
        |<properties>
        |  <entry key="count_by_tag">SELECT count(1) AS n FROM named_in WHERE tag = '$tag'</entry>
        |</properties>""".stripMargin)
    SqlTransformations.namedSql(spark, xf.toString, "count_by_tag", ctx)
      .as[Long].head() shouldBe 2L
    // unknown names fail loudly
    a[NoSuchElementException] should be thrownBy
      SqlTransformations.namedSql(spark, pf.toString, "missing", ctx)
  }

  it should "run source -> transforms -> sink end to end" in {
    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$dir/in")
    val ctx = new TransformationContext
    ctx.update("in_path", s"$dir/in")
    ctx.update("out_path", s"$dir/out")
    Pipeline.runPipeline(spark, graft.sources.ParquetSource,
      Seq(Transformation("only_a") { (df, _) => df.filter(col("tag") === "a") }),
      graft.sources.ParquetSink, ctx)
    spark.read.parquet(s"$dir/out").count() shouldBe 2
    ctx.steps.map(_.name) shouldBe Vector("only_a")
  }

  it should "ingest raw media files through the binaryFile source" in {
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("red.png", graft.multimodal.Multimodal.solidPng(4, 3, 255, 0, 0))
    put("blue.png", graft.multimodal.Multimodal.solidPng(2, 2, 0, 0, 255))
    put("notes.txt", "not an image".getBytes("UTF-8"))
    val ctx = new TransformationContext
    ctx.update("in_path", dir.toString)
    ctx.update("glob", "*.png")
    val files = graft.sources.BinaryFileSource(spark, ctx)
    files.count() shouldBe 2 // the txt is glob-filtered out
    // metadata-only pass prunes the content column entirely
    files.select("path", "length").collect()
      .map(_.getLong(1)) should contain theSameElementsAs
      Seq(dir.resolve("red.png").toFile.length,
        dir.resolve("blue.png").toFile.length)
    // and the bytes feed the M3 decoder unchanged
    val feats = graft.multimodal.Multimodal.decodeImageFeatures(
      files.select(col("path").as("media_id"), col("content")),
      "media_id")
      .orderBy("media_id").collect()
    feats.length shouldBe 2
    feats.map(_.getAs[Int]("width")).toSeq shouldBe Seq(2, 4) // blue, red
  }

  it should "render the dependency DAG" in {
    val ts = Seq(
      Transformation("b", deps = Seq("a")) { (df, _) => df },
      Transformation("a") { (df, _) => df })
    Pipeline.renderDag(ts) shouldBe "a\na --> b"
  }

  behavior of "RowPipeline"

  it should "append computed columns and count row errors" in {
    implicit val s: SparkSession = spark
    val df = Seq("4", "oops", "6").toDF("v")
    val (out, errors) = RowPipeline.appendColumns(df,
      Seq(StructField("n", LongType)),
      r => Seq(r.getString(0).toLong * 2))
    out.count() shouldBe 2
    errors.value shouldBe 1
  }

  behavior of "CsvSniffer"

  it should "sniff delimiter, quote and header" in {
    val d = CsvSniffer.sniff("name;age;city\nbob;3;NY\nsue;4;SF\n")
    d.delimiter shouldBe ';'
    d.hasHeader shouldBe true
    CsvSniffer.sniff("1,2\n3,4\n").hasHeader shouldBe false
    CsvSniffer.sniff("a\tb\nc\td\n").delimiter shouldBe '\t'
    CsvSniffer.detectLineEnding("a\r\nb") shouldBe "\r\n"
  }

  it should "sniff the delimiter on ragged samples by mode-of-counts" in {
    // per-line ';' counts 2,2,3,2,1 — no uniform count, but the MODE (2)
    // covers most lines; the old consistency vote fell back to ','
    val ragged =
      "a;b;c\n" +
        "1;2;3\n" +
        "4;5;6;EXTRA\n" +
        "7;8;9\n" +
        "10;11\n"
    CsvSniffer.guessDelimiter(ragged.split("\n").toSeq) shouldBe ';'
    CsvSniffer.sniff(ragged).delimiter shouldBe ';'
    // a candidate must still win MOST lines: two dialects split 2/2 with
    // one tie-breaking third line elects the majority character
    CsvSniffer.guessDelimiter(Seq("a|b", "c|d", "e;f", "g|h")) shouldBe '|'
    // all lines disagree on every candidate -> conventional fallback
    CsvSniffer.guessDelimiter(Seq("abc", "def")) shouldBe ','
    // a consistently-EMBEDDED higher-preference character must not beat
    // the true delimiter: both are fully consistent here, but '|' splits
    // more fields per line than the one embedded ';'
    CsvSniffer.guessDelimiter(Seq("a;b|c|d", "e;f|g|h")) shouldBe '|'
  }

  it should "sniff a file from a bounded sample cut at a line boundary" in {
    val f = java.nio.file.Files.createTempFile("sample", ".csv")
    val content = (1 to 200).map(i => s"$i;x$i;y$i").mkString("\n")
    java.nio.file.Files.writeString(f, content)
    // tiny budget: the sample must end on a complete line, not mid-record
    val sample = CsvSniffer.readSample(f.toString, maxBytes = 100)
    sample.split("\n").forall(_.count(_ == ';') == 2) shouldBe true
    CsvSniffer.sniffFile(f.toString, maxBytes = 100).delimiter shouldBe ';'
    // a budget larger than the file keeps the (unterminated) last line
    CsvSniffer.readSample(f.toString, maxBytes = 1 << 20) shouldBe content
  }

  behavior of "type parsers"

  it should "parse booleans and dates with move-to-front" in {
    BooleanParser.parse("Yes") shouldBe Some(true)
    BooleanParser.parse("off") shouldBe Some(false)
    BooleanParser.parse("maybe") shouldBe None
    val p = new DateParser()
    p.parse("2024-03-01").map(_.toString) shouldBe Some("2024-03-01 00:00:00.0")
    p.parse("01/03/2024") should not be empty
    p.parse("not a date") shouldBe None
  }

  it should "cover the reference's long-tail date patterns" in {
    def ts(s: String) = new DateParser().parse(s).map(_.toString)
    // ISO with millis + offsets (both RFC822 and colon forms)
    ts("2001-07-04T12:08:56.235-0700") shouldBe Some("2001-07-04 19:08:56.235")
    ts("2001-07-04 12:08:56.235+02:00") shouldBe Some("2001-07-04 10:08:56.235")
    // micros survive (not misread as 235000 milliseconds)
    ts("2001-07-04T12:08:56.235000") shouldBe Some("2001-07-04 12:08:56.235")
    // compact, dotted, named-weekday, 2-digit-year, d/MMM forms
    ts("20010704 12:08:56") shouldBe Some("2001-07-04 12:08:56.0")
    ts("2001.07.04") shouldBe Some("2001-07-04 00:00:00.0")
    ts("Wed, Jul 4, 2001") shouldBe Some("2001-07-04 00:00:00.0")
    ts("04-07-01") shouldBe Some("2001-07-04 00:00:00.0")
    ts("03/Apr/15") shouldBe Some("2015-04-03 00:00:00.0")
    ts("03-Apr-2015") shouldBe Some("2015-04-03 00:00:00.0")
    // partial-precision ISO keeps the parsed hour
    ts("2024-03-01 07") shouldBe Some("2024-03-01 07:00:00.0")
    ts("2024-03-01T07:30") shouldBe Some("2024-03-01 07:30:00.0")
    // dd/MM wins over MM/dd in the ambiguous family (reference order)
    ts("04/07/2001") shouldBe Some("2001-07-04 00:00:00.0")
  }

  it should "sniff quote-doubling and skip-initial-space on dirty CSVs" in {
    // superstore-style: quoted cells with embedded commas + doubled quotes
    val dirty =
      "id,product,note\n" +
        "1,\"Desk, oak\",\"said \"\"fragile\"\" on box\"\n" +
        "2,\"Chair, blue\",plain\n"
    val d = CsvSniffer.sniff(dirty)
    d.delimiter shouldBe ','
    d.quote shouldBe '"'
    d.doubleQuoted shouldBe true
    d.sparkOptions("escape") shouldBe "\"" // RFC-4180 doubling for Spark
    // ", "-separated dialect: every delimiter followed by one space
    val spaced = CsvSniffer.sniff("a, b, c\n1, 2, 3\n4, 5, 6\n")
    spaced.skipInitialSpace shouldBe true
    CsvSniffer.sniff("a,b\n1,2\n").skipInitialSpace shouldBe false
    // the dirty sample must ALSO round-trip through spark.read with the
    // sniffed options: embedded commas and doubled quotes intact
    val f = java.nio.file.Files.createTempFile("sniff", ".csv")
    java.nio.file.Files.writeString(f, dirty)
    val opts = d.sparkOptions
    val df = spark.read.options(opts).csv(f.toString)
    df.count() shouldBe 2
    df.where(col("id") === "1").select("note").as[String].head() shouldBe
      "said \"fragile\" on box"
    df.where(col("id") === "1").select("product").as[String].head() shouldBe
      "Desk, oak"
  }

  it should "decode EBCDIC ibm500 bytes" in {
    // 'A' = 0xC1, '1' = 0xF1 in EBCDIC cp500
    Ebcdic.decodeBytes(Array(0xC1.toByte, 0xF1.toByte)) shouldBe "A1"
  }

  behavior of "JdbcSource plumbing"
  // No database ships in the sandbox, so these verify the option wiring
  // reaches Spark's JDBC layer (the driver lookup fails with OUR url),
  // not an end-to-end read.

  it should "pass url/dbtable through to the jdbc relation" in {
    val ctx = new TransformationContext
    ctx("url") = "jdbc:nosuchdb://localhost/x"
    ctx("dbtable") = "t1"
    val e = intercept[Exception] {
      graft.sources.JdbcSource(spark, ctx).collect()
    }
    // DriverManager rejects the unknown scheme — proof the url arrived
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage != null) shouldBe true
  }

  it should "wire partition-read options without failing reader construction" in {
    val ctx = new TransformationContext
    ctx("url") = "jdbc:nosuchdb://localhost/x"
    ctx("dbtable") = "t1"
    ctx("partition_column") = "id"
    ctx("lower_bound") = "0"
    ctx("upper_bound") = "100"
    ctx("num_partitions") = 4
    noException should be thrownBy graft.sources.JdbcSource.reader(spark, ctx)
  }

  behavior of "FeatureRegistry"

  it should "round-trip features through the CSV repository" in {
    val reg = new FeatureRegistry
    reg.register(Feature("spend", AttributeType.Base, "cust", "double"))
    reg.register(Feature("clicks", AttributeType.Derived, "web", "long",
      description = "clicks, last 7d", active = false))
    val f = java.nio.file.Files.createTempFile("feats", ".csv").toString
    FeatureRepository.save(f, reg)
    val back = FeatureRepository.load(f)
    back.all.map(_.attribute) shouldBe Seq("spend", "clicks")
    back.active.map(_.attribute) shouldBe Seq("spend")
    back.attributes("cust") shouldBe Seq("spend")
  }

  it should "persist job-step and row-error audit as CSV" in {
    import graft.store.AuditRepository
    val pt = "2024-03-01 00:00:00"
    val sf = java.nio.file.Files.createTempFile("steps", ".csv").toString
    AuditRepository.saveSteps(sf, Seq(
      graft.pipeline.JobStep("load", ok = true),
      graft.pipeline.JobStep("validate", ok = false,
        detail = "bad, \"quoted\" detail")), pt)
    AuditRepository.loadSteps(sf) shouldBe Seq(
      ("load", "completed", pt, ""),
      ("validate", "failed", pt, "bad, \"quoted\" detail"))
    val ef = java.nio.file.Files.createTempFile("errs", ".csv").toString
    AuditRepository.saveErrors(ef, Seq(
      AuditRepository.RowError("validate", "parse", "not a number",
        Seq("42", "x,y"))), pt)
    val errs = AuditRepository.loadErrors(ef)
    errs.head.stepName shouldBe "validate"
    errs.head.errorType shouldBe "parse"
    errs.head.row shouldBe Seq("42", "x,y")
  }

  "FixedWidth (S20)" should "round-trip a copybook layout and fail loud on overflow" in {
    import graft.sources.{FixedWidth, FixedWidthField}
    import spark.implicits._
    val layout = Seq(
      FixedWidthField("id", 1, 6, "long"),
      FixedWidthField("name", 7, 10),
      FixedWidthField("amt", 17, 8, "double"))
    val orig = Seq((42L, "alice", 12.5), (7L, "bob jr", 0.25))
      .toDF("id", "name", "amt")
    val lines = FixedWidth.format(orig, layout)
    // positional layout: every line is exactly the summed width
    lines.select(org.apache.spark.sql.functions.length(lines("line")))
      .as[Int].collect().foreach(_ shouldBe 24)
    val back = FixedWidth.parse(lines, "line", layout)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    back shouldBe Array((7L, "bob jr", 0.25), (42L, "alice", 12.5))
    // an over-width value must fail loud, not silently shift offsets
    val bad = Seq((1L, "a name far too long for ten", 1.0))
      .toDF("id", "name", "amt")
    intercept[Exception] {
      FixedWidth.format(bad, layout).collect()
    }.getMessage should include("exceeds width")
    // a NULL must also fail loud: concat would otherwise NULL the whole
    // line and the record silently vanishes from the extract
    val withNull = Seq((Some(1L), Option.empty[String], Some(1.0)))
      .toDF("id", "name", "amt")
    intercept[Exception] {
      FixedWidth.format(withNull, layout).collect()
    }.getMessage should include("NULL value in 'name'")
  }

  behavior of "JdbcSource / JdbcSink (S6)"

  it should "round-trip through an embedded Derby database and split the parallel read" in {
    import graft.pipeline.TransformationContext
    import graft.sources.{JdbcSink, JdbcSource}
    // Derby ships in /opt/spark/jars (Hive metastore dependency) — an
    // embedded JDBC engine, so S6 is exercised END-TO-END with zero
    // added dependencies: Spark's JDBC writer creates the table, the
    // reader pulls it back, and the partitioned read splits into
    // numPartitions stride queries.
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dbDir/s6db;create=true"
    val orig = (1L to 100L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "amt")
    val wctx = new TransformationContext
    wctx.update("url", url)
    wctx.update("dbtable", "people")
    wctx.update("mode", "overwrite")
    JdbcSink.write(orig, wctx)
    // plain read-back
    val rctx = new TransformationContext
    rctx.update("url", url)
    rctx.update("dbtable", "people")
    val back = JdbcSource(spark, rctx)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    back shouldBe (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toArray
    // pushdown subquery form: dbtable as a parenthesized SELECT
    val qctx = new TransformationContext
    qctx.update("url", url)
    qctx.update("dbtable", // Derby folds unquoted idents to upper-case;
      // Spark wrote the columns quoted lower-case, so quote them here
      """(SELECT "id", "amt" FROM people WHERE "id" <= 10) t""")
    JdbcSource(spark, qctx).count() shouldBe 10L
    // partitioned parallel read: the range splits into stride queries
    val pctx = new TransformationContext
    pctx.update("url", url)
    pctx.update("dbtable", "people")
    pctx.update("partition_column", "id")
    pctx.update("lower_bound", "1")
    pctx.update("upper_bound", "101")
    pctx.update("num_partitions", 4)
    val par = JdbcSource(spark, pctx)
    par.rdd.getNumPartitions shouldBe 4
    par.count() shouldBe 100L // no rows lost or duplicated at stride edges
    // append lands on top of the existing rows
    val actx = new TransformationContext
    actx.update("url", url)
    actx.update("dbtable", "people")
    JdbcSink.write(orig.limit(5), actx) // default mode = append
    JdbcSource(spark, rctx).count() shouldBe 105L
  }
}
