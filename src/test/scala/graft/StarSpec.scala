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
}
