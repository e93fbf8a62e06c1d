package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.UrlOps

/** URL canonicalization corner cases beyond the fixture's shapes. */
class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def one(url: String): (String, String, String) = {
    import spark.implicits._
    val r = Seq(url).toDF("url").select(
      UrlOps.normalize($"url"), UrlOps.host($"url"),
      UrlOps.registrableDomain(UrlOps.host($"url"))).head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("host: userinfo, port, www, case") {
    assert(one("http://USER:pw@WWW.Example.COM:8080/a?q=1#f") ==
      (("http://example.com/a?q=1", "example.com", "example.com")))
    assert(one("https://sub.shop.example.co.uk/x") ==
      (("https://sub.shop.example.co.uk/x", "sub.shop.example.co.uk",
        "example.co.uk")))
    assert(one("ftp://www.a.b.c.org")._3 == "c.org")
  }

  test("fragment drops, path case survives, query order untouched") {
    val (n, _, _) = one("HTTPS://Example.de/CaseSensitive/Path?b=2&a=1#frag")
    assert(n == "https://example.de/CaseSensitive/Path?b=2&a=1")
  }

  test("bare host and single-label host do not throw") {
    assert(one("https://localhost/x")._2 == "localhost")
    assert(one("not a url")._1 == "://") // empty extracts, no exception
  }
}
