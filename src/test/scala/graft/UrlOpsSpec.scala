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

  test("robots: repeated user-agent groups MERGE (RFC 9309 §2.2.1)") {
    import graft.ops.RobotsOps
    // real-world shape: separate Allow and Disallow blocks for the same
    // agent, plus two * groups — losing either block mis-allows paths
    val r = RobotsOps.parse(
      """User-agent: graftbot
        |Disallow: /private
        |
        |User-agent: graftbot
        |Allow: /private/ok
        |Crawl-delay: 7
        |
        |User-agent: *
        |Disallow: /star-a
        |Crawl-delay: 3
        |
        |User-agent: *
        |Disallow: /star-b
        |""".stripMargin)
    val g = RobotsOps.groupFor(r, "graftbot/1.0").get
    assert(g.rules.size == 2, "both graftbot blocks must merge")
    assert(!RobotsOps.decide(g, "/private/data"))
    assert(RobotsOps.decide(g, "/private/ok/x"),
      "the Allow from the second block must survive the merge")
    assert(g.crawlDelay.contains(7.0))
    val star = RobotsOps.groupFor(r, "otherbot").get
    assert(!RobotsOps.decide(star, "/star-a/x") &&
      !RobotsOps.decide(star, "/star-b/x"),
      "ALL * groups merge, not just the first")
    assert(star.crawlDelay.contains(3.0), "min crawl-delay across groups")
    // specificity still wins over the merge: a longer-token group is
    // NOT diluted by shorter-token matches
    val r2 = RobotsOps.parse(
      "User-agent: graftbot\nDisallow: /a\n\n" +
        "User-agent: graftbot-images\nDisallow: /b\n")
    val gi = RobotsOps.groupFor(r2, "graftbot-images/2.0").get
    assert(gi.rules == Seq(RobotsOps.RobotsRule(allow = false, "/b")))
  }
}
