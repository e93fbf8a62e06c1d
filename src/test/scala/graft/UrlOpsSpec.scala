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

  test("robots: group selection, longest-match, anchors, malformed lines") {
    import graft.ops.RobotsOps
    val r = RobotsOps.parse(
      """User-agent: Googlebot
        |User-agent: graftbot
        |Disallow: /a
        |Allow: /a/b
        |
        |User-agent: graftbot-images
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /everything
        |nonsense line without colon value?
        |: empty key
        |Crawl-delay: not-a-number
        |""".stripMargin)
    // longest agent-token match wins: graftbot-images over graftbot
    val gi = RobotsOps.groupFor(r, "GraftBot-Images/2.0").get
    assert(gi.rules == Seq(RobotsOps.RobotsRule(allow = false, "/")))
    val gb = RobotsOps.groupFor(r, "graftbot/1.0").get
    assert(gb.rules.size == 2)
    assert(!RobotsOps.decide(gb, "/a/x"))
    assert(RobotsOps.decide(gb, "/a/b/x"), "longer Allow wins")
    assert(RobotsOps.decide(gb, "/other"))
    // unknown agent falls to *
    val star = RobotsOps.groupFor(r, "randombot").get
    assert(!RobotsOps.decide(star, "/everything/else"))
    // wildcard + anchor semantics
    val g2 = RobotsOps.parse(
      "User-agent: *\nDisallow: /*.pdf$\nDisallow: /x*y\n")
      .groups.head
    assert(!RobotsOps.decide(g2, "/docs/file.pdf"))
    assert(RobotsOps.decide(g2, "/docs/file.pdfx"), "$ anchors the end")
    assert(!RobotsOps.decide(g2, "/x123y"))
    assert(RobotsOps.decide(g2, "/x123z"))
    // empty Disallow means allow-all; empty file means allow-all
    val g3 = RobotsOps.parse("User-agent: *\nDisallow:\n").groups.head
    assert(RobotsOps.decide(g3, "/anything"))
    assert(RobotsOps.parse("").groups.isEmpty)
  }
}
