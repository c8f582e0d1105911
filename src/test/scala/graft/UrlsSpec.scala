package graft

import graft.text.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  behavior of "canonicalizeUrl"

  it should "apply every normalization rule" in {
    canon(
      "HTTPS://WWW.Example.COM:443/A/b/?b=2&utm_source=x&a=1#frag",
      "http://example.com:80/",
      "http://example.com:8080/x",
      "https://example.com",
      "http://example.com/a//",
      "http://example.com/?fbclid=z&gclid=y&ref=r&utm_campaign=c",
      "http://example.com/p?z=1&a=2&m=3") shouldBe Seq(
      "https://example.com/A/b?a=1&b=2", // case, www, :443, slash, utm, sort
      "http://example.com/", // default port dropped, root path kept
      "http://example.com:8080/x", // non-default port kept
      "https://example.com/", // empty path becomes /
      "http://example.com/a", // repeated trailing slashes trimmed
      "http://example.com/", // all params tracking -> no query
      "http://example.com/p?a=2&m=3&z=1") // params sorted
  }

  it should "keep schemeless garbage stable (minus fragment) and pass nulls through" in {
    canon("not a url#x", "relative/path") shouldBe
      Seq("not a url", "relative/path")
    Seq[Option[String]](None).toDF("url")
      .select(Urls.canonicalizeUrl(col("url")).as("c"))
      .collect().head.isNullAt(0) shouldBe true
  }

  it should "be idempotent" in {
    val in = Seq("HTTPS://WWW.Ex.COM:443/A/?b=2&a=1#f",
      "http://ex.com:8080/x?utm_a=1", "weird")
    val once = canon(in: _*)
    canon(once: _*) shouldBe once
  }

  behavior of "urlDedup"

  it should "group variants under the min-id representative" in {
    val df = Seq(
      (1L, "http://example.com/p?a=1&b=2"),
      (2L, "HTTP://WWW.example.com:80/p/?b=2&a=1&utm_x=9#top"),
      (3L, "http://example.com/q"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "url")
    val got = Urls.urlDedup(df, "id", "url")
      .select(col("id"), col("rep_id"), col("n_variants"),
        col("is_canonical"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(1L) shouldBe ((1L, 2L, true))
    got(2L) shouldBe ((1L, 2L, false))
    got(3L) shouldBe ((3L, 1L, true))
    got(4L) shouldBe ((4L, 1L, true)) // null URL: its own singleton
  }
}
