package graft

import graft.ext.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: the classic variants collapse to one key") {
    val variants = Seq(
      "https://www.Example.COM/a/b/?utm_source=x&b=2&a=1#frag",
      "HTTPS://example.com:443/a/b?a=1&b=2",
      "https://EXAMPLE.com/a/b//?b=2&a=1&fbclid=zzz")
    canon(variants: _*).distinct shouldBe
      Seq("https://example.com/a/b?a=1&b=2")
  }

  test("canonicalizeUrl: what must NOT collapse, doesn't") {
    // scheme, path case, non-default port, param VALUES are significant
    canon(
      "http://example.com/a",          // http vs https
      "https://example.com/A",         // path case-sensitive
      "https://example.com:8443/a",    // non-default port kept
      "https://example.com/a?x=1",     // different query
      "https://example.com/a?x=2"
    ).distinct.size shouldBe 5
    canon("https://example.com:8443/a").head shouldBe
      "https://example.com:8443/a"
  }

  test("canonicalizeUrl: bare host, empty path, tracking-only query") {
    canon("https://www.example.com").head shouldBe "https://example.com/"
    canon("http://Example.com:80?utm_campaign=c&utm_medium=m").head shouldBe
      "http://example.com/"
    // utm_ prefix matches bare `utm_x` and `ref=...`, but NOT `referrer=`
    canon("https://e.com/p?referrer=a&ref=b").head shouldBe
      "https://e.com/p?referrer=a"
  }

  test("canonicalizeUrl: schemeless values refuse to guess (NULL)") {
    val out = Seq("example.com/a", "not a url", "")
      .toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.isNullAt(0))
    out shouldBe Array(true, true, true)
  }

  test("component extractors agree with the composed form") {
    val u = "HTTPS://WWW.Shop.Example.com:443/Items/7/?ref=x&size=XL#top"
    val row = Seq(u).toDF("url").select(
      UrlOps.urlScheme(col("url")), UrlOps.urlHost(col("url")),
      UrlOps.urlPath(col("url")), UrlOps.urlQuery(col("url")),
      UrlOps.canonicalizeUrl(col("url"))).head()
    row.getString(0) shouldBe "https"
    row.getString(1) shouldBe "shop.example.com"
    row.getString(2) shouldBe "/Items/7"
    row.getString(3) shouldBe "?size=XL"
    row.getString(4) shouldBe "https://shop.example.com/Items/7?size=XL"
  }
}
