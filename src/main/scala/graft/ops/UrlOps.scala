package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL curation primitives — the companion to the WARC front door: a
  * crawl corpus dedups, rate-limits, and quality-buckets BY HOST and
  * registrable domain before any content model runs. Everything here
  * is a chain of built-in `functions` (codegen'd, no UDF) over
  * RE2-compatible patterns, so the DuckDB oracle replays the exact
  * semantics — the same discipline as the PII-scan entry.
  *
  * `registrableDomain` uses a deterministic two-level heuristic with a
  * small embedded multi-part-TLD list (co.uk-style) rather than the
  * full Public Suffix List — documented approximation, stable for
  * ranking/grouping purposes. */
object UrlOps {

  /** Lowercased host: authority between `://` and the first `/?#`,
    * userinfo and port stripped, leading `www.` dropped. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          lower(regexp_extract(url,
            "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
          "^[^@]*@", ""),
        ":[0-9]+$", ""),
      "^www\\.", "")

  /** Multi-part public suffixes the heuristic recognizes (second level
    * of the common ccTLD conventions). */
  private val MultiTld = "(co|com|org|net|ac|gov|edu)\\.(uk|jp|au|nz|in|za|br|kr)"

  /** Registrable domain: last three labels under a recognized
    * multi-part suffix, else last two. */
  def registrableDomain(h: Column): Column =
    when(h.rlike(s"\\.$MultiTld$$"),
      regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(regexp_extract(h, "([^.]+\\.[^.]+)$", 1))

  /** Normalized URL: lowercased scheme + canonical host + the original
    * path?query with the fragment dropped (path case is significant
    * per RFC 3986 and preserved). */
  def normalize(url: Column): Column =
    concat(
      lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)),
      lit("://"),
      host(url),
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1))
}
