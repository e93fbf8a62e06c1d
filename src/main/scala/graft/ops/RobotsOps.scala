package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt parsing + rule evaluation (RFC 9309) — the third leg of
  * crawl curation beside the WARC front door and the URL keys: a
  * corpus pipeline re-checks robots BEFORE training on a crawl (pages
  * fetched years ago may since be disallowed).
  *
  * [[parse]] handles group structure (consecutive `User-agent` lines
  * share the following rules), case-insensitive directives, comments,
  * `Crawl-delay` and `Sitemap` extras. [[decide]] implements the
  * spec's longest-match rule: the matching Allow/Disallow with the
  * longest path prefix wins, Allow winning length ties; no match →
  * allowed. `$` end-anchors and `*` wildcards supported (translated to
  * an anchored regex — RE2-safe, no backtracking blowup: `*` → `.*`,
  * everything else quoted). */
object RobotsOps {

  final case class RobotsRule(allow: Boolean, path: String)

  final case class RobotsGroup(
      agents: Seq[String], rules: Seq[RobotsRule], crawlDelay: Option[Double])

  final case class Robots(groups: Seq[RobotsGroup], sitemaps: Seq[String])

  def parse(content: String): Robots = {
    val groups = Seq.newBuilder[RobotsGroup]
    val sitemaps = Seq.newBuilder[String]
    var agents = Vector.empty[String]
    var rules = Vector.empty[RobotsRule]
    var delay: Option[Double] = None
    var inAgents = false // consecutive User-agent lines stack
    def flush(): Unit = {
      if (agents.nonEmpty) groups += RobotsGroup(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }
    content.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents :+= value.toLowerCase
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (agents.nonEmpty)
              rules :+= RobotsRule(key == "allow", value)
          case "crawl-delay" =>
            inAgents = false
            if (agents.nonEmpty)
              delay = try Some(value.toDouble) catch {
                case _: Exception => delay
              }
          case "sitemap" => sitemaps += value
          case _ => inAgents = false
        }
      }
    }
    flush()
    Robots(groups.result(), sitemaps.result())
  }

  /** Group selection per RFC 9309 §2.2.1: the most specific matching
    * agent token (longest substring match) picks the tier, and ALL
    * groups carrying a token at that tier are MERGED — real robots.txt
    * files routinely repeat `User-agent` lines (separate Allow and
    * Disallow blocks) and the spec says rules from groups matching the
    * same user-agent combine. Rules concatenate (decide() then applies
    * longest-match over the union), crawl-delay takes the minimum of
    * the declared delays. `*` groups (all of them, merged) are the
    * fallback when no named token matches. */
  def groupFor(r: Robots, agent: String): Option[RobotsGroup] = {
    val a = agent.toLowerCase
    val named = r.groups
      .flatMap(g => g.agents.filter(t => t != "*" && a.contains(t))
        .map(t => (t.length, g)))
    val tier =
      if (named.nonEmpty) {
        val best = named.map(_._1).max
        named.collect { case (len, g) if len == best => g }.distinct
      } else r.groups.filter(_.agents.contains("*"))
    if (tier.isEmpty) None
    else Some(RobotsGroup(
      tier.flatMap(_.agents).distinct,
      tier.flatMap(_.rules),
      tier.flatMap(_.crawlDelay) match {
        case Seq() => None
        case ds => Some(ds.min)
      }))
  }

  /** Path pattern match: anchored at the path start, `*` wildcards,
    * optional `$` end anchor. */
  private[ops] def matches(pattern: String, path: String): Boolean = {
    val (p, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val rx = new StringBuilder("^")
    p.foreach {
      case '*' => rx.append(".*")
      case ch => rx.append(java.util.regex.Pattern.quote(ch.toString))
    }
    if (anchored) rx.append("$")
    val m = java.util.regex.Pattern.compile(rx.toString).matcher(path)
    m.find()
  }

  /** Longest-match decision; Allow wins length ties; empty Disallow
    * matches nothing; no match → allowed. */
  def decide(g: RobotsGroup, path: String): Boolean = {
    val hits = g.rules.filter(r => r.path.nonEmpty && matches(r.path, path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(r => (r.path.length, r.allow))
        .sortBy(t => (-t._1, !t._2)) // longest first, allow before disallow
      best.head._2
    }
  }

  /** One evaluated fixture row. */
  final case class RobotsDecision(
      doc_id: Long, crawl_delay: Double, n_rules: Int, n_sitemaps: Int,
      private_blocked: Boolean, private_ok_allowed: Boolean,
      tmp_blocked: Boolean, pub_allowed: Boolean,
      anchored_blocked: Boolean, anchored_suffix_allowed: Boolean)

  /** Evaluate the shared probe paths against each doc's robots file —
    * the REAL generic parser/evaluator runs; the oracle recomputes the
    * expected decisions from the generation formulas. */
  def extractDecisions(
      spark: SparkSession, files: DataFrame): Dataset[RobotsDecision] = {
    import spark.implicits._
    files.select(col("doc_id"), col("content")).as[(Long, String)]
      .mapPartitions(_.map { case (id, content) =>
        val r = parse(content)
        val g = groupFor(r, "graftbot/1.0")
          .getOrElse(RobotsGroup(Seq("*"), Nil, None))
        RobotsDecision(id,
          g.crawlDelay.getOrElse(0.0),
          g.rules.size,
          r.sitemaps.size,
          private_blocked = !decide(g, "/private/data"),
          private_ok_allowed = decide(g, "/private/ok/page"),
          // fixed probe path: blocked only when the doc's wildcard rule
          // happens to cover /tmp3 (id % 5 == 3) — a per-doc varying
          // decision, so a stuck evaluator cannot pass by constant
          tmp_blocked = !decide(g, "/tmp3/f"),
          pub_allowed = decide(g, "/pub/index.html"),
          anchored_blocked = !decide(g, "/exact"),
          anchored_suffix_allowed = decide(g, "/exactly"))
      })
  }

  /** The composed crawl-curation gate — the real thing the three legs
    * exist for: per-document URI → (host, path) with codegen'd
    * extraction, the per-HOST robots.txt joined in by BROADCAST (a
    * robots table is tiny next to a crawl — a few MB for millions of
    * hosts), then the RFC 9309 longest-match verdict per (host, path).
    * The robots file is parsed ONCE per host per task (memoized), not
    * once per document; the doc side never shuffles for the join.
    * Output: (doc_id, host, path, allowed, crawl_delay). */
  def curationGate(
      spark: SparkSession, docs: DataFrame, robots: DataFrame,
      agent: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val withKeys = docs
      .withColumn("host", UrlOps.host(col("uri")))
      .withColumn("path", regexp_extract(col("uri"),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .join(broadcast(robots), Seq("host"), "left")
    withKeys
      .select(col("doc_id").cast("long"), col("host"), col("path"),
        col("robots_txt"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        val memo =
          scala.collection.mutable.HashMap.empty[String, Option[RobotsGroup]]
        rows.map { case (id, h, rawPath, robotsTxt) =>
          val g = memo.getOrElseUpdate(h,
            Option(robotsTxt).flatMap(t => groupFor(parse(t), agent)))
          val path = if (rawPath == null || rawPath.isEmpty) "/" else rawPath
          // no robots file for the host → allowed (RFC 9309 §2.3.1)
          val allowed = g.forall(decide(_, path))
          (id, h, path, allowed,
            g.flatMap(_.crawlDelay).getOrElse(0.0))
        }
      }.toDF("doc_id", "host", "path", "allowed", "crawl_delay")
  }

  /** Per-host politeness frontier — what the crawl-delay the curation
    * gate surfaced is FOR: the allowed documents of each host queue
    * FIFO with the host's delay between fetches (RFC 9309's
    * Crawl-delay convention), giving every URL a fetch sequence number
    * and a start offset in seconds. ONE shuffle (the window's
    * partition-by-host), which is also the right 100 TB shape: hosts
    * are the natural unit of politeness, so per-host state never
    * crosses partitions, and a mega-host costs one fat partition (its
    * real-world crawl cost), never a global structure. */
  def frontierSchedule(spark: SparkSession, gated: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col("doc_id"))
    gated.filter(col("allowed"))
      .withColumn("fetch_seq", row_number().over(w))
      .withColumn("fetch_offset_s",
        (col("fetch_seq") - lit(1)).cast("double") * col("crawl_delay"))
  }

  /** Curation fixture: one robots.txt per host `host{k}.example.com`
    * (k = 0..16) in the REAL-WORLD repeated-group shape — the same
    * agent named twice (a Disallow block, present only for even k, and
    * a separate Allow + Crawl-delay block), plus a `*` group that
    * disallows everything (so a selector that wrongly falls through to
    * `*`, or merges tiers, blocks every path and breaks the oracle). */
  def curationRobotsFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 17).map { k =>
      val disallowBlock =
        if (k % 2 == 0) "User-agent: graftbot\nDisallow: /private\n\n"
        else ""
      val content = disallowBlock +
        s"""User-agent: graftbot
           |Allow: /private/ok
           |Crawl-delay: ${k % 10}
           |
           |User-agent: *
           |Disallow: /
           |""".stripMargin
      (s"host$k.example.com", content)
    }.toDF("host", "robots_txt")
  }

  /** Fixture robots.txt from the row id: a `*` group with nested
    * Allow-under-Disallow (longest-match), a wildcard rule, a
    * `$`-anchored rule, crawl-delay, sitemap, comments, and a decoy
    * named group that must NOT be selected for our agent. */
  def asRobotsPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions(_.map { docId =>
        val delay = (docId % 10).toInt
        val content =
          s"""# robots for doc $docId
             |User-agent: otherbot
             |Disallow: /
             |
             |User-agent: *
             |Disallow: /private
             |Allow: /private/ok
             |Disallow: /tmp${docId % 5}*
             |Disallow: /exact$$
             |Crawl-delay: $delay
             |
             |Sitemap: https://example.com/sitemap$docId.xml
             |""".stripMargin
        (docId, content)
      }).toDF("doc_id", "content")
  }
}
