package graft

import graft.events.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  it should "fill gaps forward from the previous observed day, per key" in {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 5.0),  // same day: aggregated
      (1L, ts("2024-01-04 08:00:00"), 7.0),  // 2-day gap before
      (2L, ts("2024-01-02 12:00:00"), 1.0))  // singleton key
      .toDF("user_id", "ts", "value")
    val r = Resample.dailyResampleFfill(df, "user_id", col("ts"), col("value"))
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .as[(Long, String, Double, Int)].collect().sortBy(t => (t._1, t._2))
    r shouldBe Array(
      (1L, "2024-01-01", 15.0, 0),
      (1L, "2024-01-02", 15.0, 1),
      (1L, "2024-01-03", 15.0, 1),
      (1L, "2024-01-04", 7.0, 0),
      (2L, "2024-01-02", 1.0, 0))
  }

  it should "produce a contiguous daily series per key (no holes, no duplicates)" in {
    val rnd = new scala.util.Random(7)
    val df = (0 until 300).map { _ =>
      (rnd.nextInt(5).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(28)}%02d 06:00:00"),
        rnd.nextInt(100).toDouble)
    }.toDF("user_id", "ts", "value")
    val days = Resample.dailyResampleFfill(df, "user_id", col("ts"), col("value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("day")).as("nd"),
        datediff(max(col("day")), min(col("day"))).as("span"))
      .as[(Long, Long, Long, Int)].collect()
    days.foreach { case (_, n, nd, span) =>
      n shouldBe nd         // no duplicate days
      n shouldBe span + 1L  // no holes: first..last inclusive
    }
  }
}
