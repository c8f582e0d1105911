package graft

import org.apache.spark.sql.functions._

/** C10/C11: the bitemporal kernel against a hand-built correction
  * scenario — the canonical "late-arriving correction" sequence from
  * Snodgrass's bitemporal chapter, reduced to one entity. */
class BitemporalSpec extends SparkSpec {
  import spark.implicits._

  // entity 1 price history as asserted over time:
  //  tx 2024-01-05: from 2024-01-01 the price is 10
  //  tx 2024-02-10: from 2024-02-01 the price is 20
  //  tx 2024-03-15: CORRECTION — from 2024-01-01 it was 12 all along
  private def log = Seq(
    (1L, "2024-01-01 00:00:00", "2024-01-05 00:00:00", 101L, 10.0),
    (1L, "2024-02-01 00:00:00", "2024-02-10 00:00:00", 102L, 20.0),
    (1L, "2024-01-01 00:00:00", "2024-03-15 00:00:00", 103L, 12.0))
    .toDF("e", "vf", "tx", "tie", "value")

  private def bt = graft.load.Bitemporal.fromAssertions(log,
    col("e"), col("vf"), col("tx"), col("tie"), Seq("value"))

  behavior of "load.Bitemporal"

  it should "close the corrected assertion's transaction interval" in {
    val rows = bt.select("valid_from", "value", "tx_to")
      .as[(java.sql.Timestamp, Double, Option[java.sql.Timestamp])]
      .collect().toSet
    // the original Jan assertion is closed by the March correction
    rows.map(r => (r._1.toString.take(10), r._2,
      r._3.map(_.toString.take(10)))) shouldBe Set(
      ("2024-01-01", 10.0, Some("2024-03-15")),
      ("2024-02-01", 20.0, None),
      ("2024-01-01", 12.0, None))
  }

  it should "answer the four bitemporal point reads" in {
    def read(tx: String, valid: String): Option[Double] =
      graft.load.Bitemporal.asOf(bt, tx, valid)
        .select("value").as[Double].collect().headOption
    // before anything was known
    read("2024-01-01 00:00:00", "2024-06-01 00:00:00") shouldBe None
    // Jan knowledge about Jan: the original 10
    read("2024-01-31 00:00:00", "2024-01-15 00:00:00") shouldBe Some(10.0)
    // Feb knowledge about Feb: the new period wins over Jan's
    read("2024-02-20 00:00:00", "2024-02-15 00:00:00") shouldBe Some(20.0)
    // post-correction knowledge about Jan: the corrected 12
    read("2024-04-01 00:00:00", "2024-01-15 00:00:00") shouldBe Some(12.0)
    // post-correction knowledge about Feb is untouched
    read("2024-04-01 00:00:00", "2024-02-15 00:00:00") shouldBe Some(20.0)
  }

  it should "report the retroactive revision and late additions" in {
    val d = graft.load.Bitemporal.retroDiff(bt,
      "2024-01-31 00:00:00", "2024-04-01 00:00:00",
      "2024-01-15 00:00:00")
      .select("entity", "change", "value_a", "value_b")
      .as[(Long, String, Option[Double], Option[Double])].collect()
    d shouldBe Array((1L, "revised", Some(10.0), Some(12.0)))
    // an entity first asserted between the instants shows as added
    val log2 = log.union(Seq(
      (2L, "2024-01-01 00:00:00", "2024-02-01 00:00:00", 201L, 5.0))
      .toDF("e", "vf", "tx", "tie", "value"))
    val bt2 = graft.load.Bitemporal.fromAssertions(log2,
      col("e"), col("vf"), col("tx"), col("tie"), Seq("value"))
    graft.load.Bitemporal.retroDiff(bt2, "2024-01-31 00:00:00",
      "2024-04-01 00:00:00", "2024-01-15 00:00:00")
      .filter(col("entity") === 2)
      .select("change", "value_b").as[(String, Option[Double])]
      .collect() shouldBe Array(("added", Some(5.0)))
  }

  it should "fail loud on a non-total tie order" in {
    val dup = log.union(Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-05 00:00:00", 101L, 99.0))
      .toDF("e", "vf", "tx", "tie", "value"))
    an[Exception] should be thrownBy {
      graft.load.Bitemporal.fromAssertions(dup, col("e"), col("vf"),
        col("tx"), col("tie"), Seq("value")).collect()
    }
  }
}
