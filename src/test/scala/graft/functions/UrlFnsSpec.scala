package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFns.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://Example.COM/Path/File") ===
      Seq("http://example.com/Path/File"))
  }

  test("default ports stripped only for the matching scheme") {
    assert(canon(
      "http://h.com:80/a", "https://h.com:443/a",
      "http://h.com:443/a", "https://h.com:80/a",
      "ftp://h.com:80/a") ===
      Seq("http://h.com/a", "https://h.com/a",
        "http://h.com:443/a", "https://h.com:80/a",
        "ftp://h.com:80/a"))
  }

  test("fragment dropped, query order normalized, empty params removed") {
    assert(canon(
      "http://h/p?b=2&a=1#frag",
      "http://h/p?a=1&b=2",
      "http://h/p?&a=1&&b=2&") ===
      Seq("http://h/p?a=1&b=2", "http://h/p?a=1&b=2",
        "http://h/p?a=1&b=2"))
  }

  test("trailing slashes stripped; bare query survives without path") {
    assert(canon(
      "http://h/p/", "http://h/p///", "http://h/", "http://h",
      "http://h/?x=1") ===
      Seq("http://h/p", "http://h/p", "http://h", "http://h",
        "http://h?x=1"))
  }

  test("all four q134 surface forms of a page collapse pairwise") {
    val c = canon(
      "HTTP://Example.COM:80/docs/7/?b=2&a=1#frag",
      "http://example.com/docs/7?a=1&b=2",
      "https://CDN.Example.com:443/docs/7/",
      "https://cdn.example.com/docs/7#x")
    assert(c(0) === c(1) && c(2) === c(3) && c(0) != c(2))
    assert(c(0) === "http://example.com/docs/7?a=1&b=2")
    assert(c(2) === "https://cdn.example.com/docs/7")
  }
}
