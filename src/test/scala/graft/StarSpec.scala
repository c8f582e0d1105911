package graft

import graft.star.{DimSpec, Star}
import org.apache.spark.sql.functions._

class StarSpec extends SparkSpec {
  import spark.implicits._

  private val spec = DimSpec("dim_city", Seq("city"), Seq("region"))
  private val PT = "2024-03-01 00:00:00"

  private val src = Seq(
    ("NY", "east"), ("NY", "west"), // duplicate key, first-wins = east
    ("SF", "west"), (null, "south"))
    .toDF("city", "region")

  it should "build first-wins dims with unknown member and dense ids" in {
    val dim = Star.mergeDim(None, Star.loadDim(src, spec, PT), spec, PT)
    dim.count() shouldBe 4 // NY, SF, unknown(null-filled), id=-1 member
    dim.filter(col("city") === "NY").select("region").as[String]
      .head() shouldBe "east"
    dim.filter(col("id") === -1L).count() shouldBe 1
    dim.filter(col("id") > 0).select("id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L)
  }

  it should "keep surrogate ids stable across merges and close old versions" in {
    val d1 = Star.mergeDim(None, Star.loadDim(src, spec, PT), spec, PT)
    val nyId = d1.filter(col("city") === "NY").select("id").as[Long].head()
    val batch2 = Seq(("NY", "north"), ("SF", "west"), ("LA", "west"))
      .toDF("city", "region")
    val d2 = Star.mergeDim(Some(d1),
      Star.loadDim(batch2, spec, "2024-04-01 00:00:00"), spec,
      "2024-04-01 00:00:00")
    val ny = d2.filter(col("city") === "NY")
      .select("id", "version", "rectype").as[(Long, Int, String)]
      .collect().sortBy(_._2)
    ny.map(_._1).toSet shouldBe Set(nyId) // same id for both versions
    ny.map(_._3).toSeq shouldBe Seq("I", "U")
    // LA inserted with an id above the previous max
    val laId = d2.filter(col("city") === "LA").select("id").as[Long].head()
    laId should be > d1.agg(max("id")).as[Long].head()
    // old NY version closed at the new start_time
    d2.filter(col("city") === "NY" && col("version") === 1)
      .select(col("end_time").cast("string")).as[String]
      .head() shouldBe "2024-04-01 00:00:00"
  }

  it should "resolve fact FKs with unknown fallback" in {
    val dim = Star.mergeDim(None, Star.loadDim(src, spec, PT), spec, PT)
    val facts = Seq(("NY", 10.0), ("XX", 99.0)).toDF("city", "amount")
    val out = Star.loadFacts(facts,
      Seq(Star.FactDim(spec, dim)), Seq("city", "amount"))
    val m = out.select("city", "fk_dim_city").as[(String, Long)].collect().toMap
    m("NY") should be > 0L
    m("XX") shouldBe -1L // no matching dim member
  }

  behavior of "dimensionalize (T1 orchestration)"

  it should "run a multi-source loop: shared dim merges, facts resolve against final state" in {
    // Source 1 contributes cities NY/SF; source 2 adds LA to the SAME dim
    // and produces a fact table. The fact's LA row must resolve to LA's
    // surrogate id (final dim state), not the unknown member.
    val sales = Seq(("NY", "q1", 10.0), ("LA", "q2", 30.0))
      .toDF("city", "quarter", "amount")
    // NY keeps its source-1 attributes so the shared-dim merge adds LA
    // without versioning NY
    val citySrc2 = Seq(("NY", "east"), ("LA", "west")).toDF("city", "region")
    val qSpec = DimSpec("dim_quarter", Seq("quarter"), Seq())
    val run = Star.dimensionalize(Seq(
      Star.StarSource("cities", src, Seq(spec)),
      Star.StarSource("sales",
        sales.join(citySrc2, Seq("city"), "left"),
        Seq(spec, qSpec),
        factOutCols = Seq("city", "quarter", "amount"))), PT)
    run.dims.keySet shouldBe Set("dim_city", "dim_quarter")
    // shared dim carries members from both sources under one id space
    // (src contributes NY/SF plus a null-key "unknown" member; sales adds LA)
    val cities = run.dims("dim_city")
    cities.filter(col("id") > 0).select("city").as[String].collect().toSet shouldBe
      Set("NY", "SF", "unknown", "LA")
    cities.select("id").as[Long].collect().distinct.length shouldBe 5 // + id=-1
    val fact = run.facts("sales")
    fact.columns should contain allOf ("fk_dim_city", "fk_dim_quarter")
    val byCity = fact.select("city", "fk_dim_city").as[(String, Long)]
      .collect().toMap
    byCity("LA") should be > 0L // resolved, not unknown
    fact.filter(col("fk_dim_quarter") === -1L).count() shouldBe 0
  }

  it should "hold id-stability invariants across random dim-merge chains" in {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val keys = Vector("NY", "SF", "LA", "CHI", "DAL", "SEA")
      def batch() = keys.filter(_ => rnd.nextDouble() > 0.3)
        .map(k => (k, s"r${rnd.nextInt(3)}"))
        .toDF("city", "region")
      var dim: Option[org.apache.spark.sql.DataFrame] = None
      for (step <- 1 to 4) {
        val merged = Star.mergeDim(dim,
          Star.loadDim(batch(), spec, s"2024-0$step-01 00:00:00"),
          spec, s"2024-0$step-01 00:00:00").localCheckpoint(true)
        // one id per key, forever (id never reassigned across versions)
        merged.filter(col("id") =!= -1L)
          .groupBy(col("city"))
          .agg(countDistinct(col("id")).as("nid"))
          .filter(col("nid") =!= 1).count() shouldBe 0
        // ids are dense 1..n with the -1 unknown member
        val ids = merged.select("id").distinct().as[Long].collect().sorted
        ids.head shouldBe -1L
        ids.tail shouldBe (1L to ids.tail.length)
        // exactly one OPEN row per key (old versions closed off)
        merged.filter(col("id") =!= -1L &&
            col("end_time") === lit("9999-12-31 00:00:00").cast("timestamp"))
          .groupBy(col("city")).count()
          .filter(col("count") =!= 1).count() shouldBe 0
        dim = Some(merged)
      }
    }
  }

  it should "drive dimensionalize from the reference's star.conf shape" in {
    // the reference fixture's syntax verbatim: quoted source keys with an
    // extension, multi-line dims lists of [keyFields, attrFields] pairs
    // with NO commas between entries, a facts column list, substitutions
    val confText =
      """base-uri = "hdfs://example"
        |unknown = unknown
        |default-end-date = 9999-12-31
        |dims {
        |  "superstore_sales.csv" = [
        |    [[order_priority], []]
        |    [[province, region], []]
        |  ]
        |}
        |facts {
        |  "superstore_sales.csv" = [
        |    order_id
        |    sales
        |  ]
        |}
        |tables = [
        |  "superstore_sales.csv"
        |]""".stripMargin
    val sales = Seq(
      (1L, "HIGH", "NSW", "east", 10.0),
      (2L, "LOW", "VIC", "south", 20.0),
      (3L, "HIGH", "NSW", "east", 30.0))
      .toDF("order_id", "order_priority", "province", "region", "sales")
    val run = graft.star.StarConfig.dimensionalize(confText,
      { name => name shouldBe "superstore_sales.csv"; sales }, PT)
    // dim named after its first key field; two dims from the pair list
    run.dims.keySet shouldBe Set("order_priority", "province")
    run.dims("order_priority").filter(col("id") > 0).count() shouldBe 2
    run.dims("province").filter(col("id") > 0).count() shouldBe 2 // NSW, VIC
    // facts: configured out-cols + one fk per dim, resolved
    val f = run.facts("superstore_sales")
    f.columns.toSeq shouldBe
      Seq("order_id", "sales", "fk_order_priority", "fk_province")
    f.filter(col("fk_order_priority") === -1L).count() shouldBe 0
    f.filter(col("fk_province") === -1L).count() shouldBe 0
    // the composite (province, region) key resolves rows 1 and 3 together
    f.select("order_id", "fk_province").as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet shouldBe
      Set(Set(1L, 3L), Set(2L))
  }

  it should "seed from previously stored dims" in {
    val d1 = Star.mergeDim(None, Star.loadDim(src, spec, PT), spec, PT)
    val nyId = d1.filter(col("city") === "NY").select("id").as[Long].head()
    val batch = Seq(("NY", "north")).toDF("city", "region")
    val run = Star.dimensionalize(
      Seq(Star.StarSource("s", batch, Seq(spec))),
      "2024-04-01 00:00:00", existing = Map("dim_city" -> d1))
    val ny = run.dims("dim_city").filter(col("city") === "NY" && col("rectype") === "U")
    ny.select("id").as[Long].head() shouldBe nyId // id stable across the seed
  }

  "dateDimension (T5)" should "generate correct calendar attributes across an ISO-year boundary" in {
    val d = Star.dateDimension(spark, "2023-12-30", "2024-01-02")
      .as[(String, Long, Long, Long, Long, Long, Long, Int, String)]
      .collect().map(r => r._1 -> r).toMap
    d.size shouldBe 4
    // Sat 2023-12-30: ISO week 52, weekend, dow 7 (Sunday-first)
    d("2023-12-30") shouldBe (("2023-12-30", 20231230L, 2023L, 4L, 12L,
      52L, 7L, 1, "2023-12"))
    // Sun 2023-12-31: still ISO week 52 of 2023
    d("2023-12-31")._6 shouldBe 52L
    d("2023-12-31")._8 shouldBe 1
    // Mon 2024-01-01: ISO week 1, weekday
    d("2024-01-01") shouldBe (("2024-01-01", 20240101L, 2024L, 1L, 1L,
      1L, 2L, 0, "2024-01"))
    d("2024-01-02")._7 shouldBe 3L
  }
}
