package graft

import graft.text.Fuzzy
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, w: Int, k: Int) = {
    // reference: single-partition row_number + range self-join
    val r = df.withColumn("rnk",
      row_number().over(Window.orderBy(col("key"), col("id"))))
    r.as("a").join(r.as("b"),
        col("b.rnk") > col("a.rnk") && col("b.rnk") <= col("a.rnk") + w &&
          levenshtein(col("a.key"), col("b.key")) <= k)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .as[(Long, Long)].collect().toSet
  }

  it should "match the single-window reference on seeded noisy keys, at any partitioning" in {
    val rnd = new scala.util.Random(13)
    val base = Seq("alpha bravo", "charlie delta", "echo foxtrot",
      "golf hotel", "india juliet")
    val rows = (0 until 120).map { i =>
      val s = base(rnd.nextInt(base.size)).toCharArray
      // sprinkle up to 2 typos
      (0 until rnd.nextInt(3)).foreach { _ =>
        s(rnd.nextInt(s.length)) = ('a' + rnd.nextInt(26)).toChar }
      (i.toLong, new String(s))
    }
    val df = rows.toDF("id", "key")
    val expected = naive(df, 6, 2)
    for (parts <- Seq(1, 7)) {
      val got = Fuzzy.sortedNeighborhoodJoin(
        df.repartition(parts), "id", col("key"), window = 6, maxDist = 2)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
      got.length shouldBe got.toSet.size // no duplicate pairs
      got.toSet shouldBe expected
    }
    graft.util.Caches.releaseAll(spark)
  }

  it should "catch adjacent typo variants and respect the window bound" in {
    // identical keys sort adjacently: all caught; the window cuts pairs
    // further apart than `window` ranks even when within edit distance
    val df = (0L until 12L).map(i => (i, "samekey")).toDF("id", "key")
    val got = Fuzzy.sortedNeighborhoodJoin(df, "id", col("key"),
      window = 3, maxDist = 0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // ranks follow id order (equal keys tie-break by id): pairs with
    // id_b - id_a <= 3 only
    got shouldBe (for {
      a <- 0L until 12L; b <- a + 1 to math.min(a + 3, 11L)
    } yield (a, b)).toSet
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "functions.JaroWinkler"

  it should "reproduce the published Winkler reference values" in {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinkler.similarity(u(a), u(b))
    jw("MARTHA", "MARHTA") shouldBe 0.9611111111111111 +- 1e-15
    jw("DIXON", "DICKSONX") shouldBe 0.8133333333333332 +- 1e-15
    jw("DWAYNE", "DUANE") shouldBe 0.84 +- 1e-15
    jw("abc", "abc") shouldBe 1.0
    jw("", "abc") shouldBe 0.0
    jw("", "") shouldBe 0.0 // DuckDB's both-empty convention
    // no prefix boost below the 0.7 jaro threshold
    jw("abhello", "abzzzzzqqq") shouldBe 0.49523809523809526 +- 1e-15
  }

  it should "link transposed-digit name variants through the JW neighborhood join" in {
    import spark.implicits._
    val names = (0 until 40).map(i => (i.toLong, f"Customer#$i%09d")) ++
      Seq((1000L, "Customer#000000021".dropRight(2) + "12")) // 21 -> 12
    val df = names.toDF("id", "name")
    val got = graft.text.Fuzzy.jwNeighborhoodJoin(df, "id", col("name"),
      window = 4, minSim = 0.985)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // transposing 21's last digits yields customer 12's exact name —
    // the planted row sorts beside id 12 and links there (jw = 1);
    // the sort moved it AWAY from 21, the method's documented recall
    // boundary
    got should contain((12L, 1000L))
    // sequential ids (jw ~ 0.978) stay below the threshold
    got.filter(p => p._1 < 40 && p._2 < 40) shouldBe empty
    // the transposed NAMES themselves still clear the threshold at the
    // kernel level (jaro 0.98148 boosted to 0.98889)
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    graft.functions.JaroWinkler.similarity(
      u("Customer#000000021"), u("Customer#000000012")) shouldBe
      0.9888888888888889 +- 1e-12
    graft.util.Caches.releaseAll(spark)
  }
}
