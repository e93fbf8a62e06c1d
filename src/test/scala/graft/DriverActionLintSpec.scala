package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Driver-materialization lint — the companion of [[RegistryPlanLintSpec]]
  * for the OTHER scale cliff: a `collect()`/`head()` inside a registered
  * query's builder that silently gathers unbounded rows on the driver.
  *
  * Every driver action in `ops/`, `queries/`, `functions/` and
  * `streaming/` must appear below with its BOUND — why the materialized
  * result is O(sketch)/O(k)/O(dim²)/O(catalog), never O(rows). Adding a
  * new `collect()` without registering a bound here fails the build; a
  * stale entry (site removed or rewritten) fails too, so the list can
  * never drift from the code.
  */
class DriverActionLintSpec extends AnyFunSuite {

  /** One justified driver-action site: `file` basename, a substring of the
    * trimmed source line, how many times that line shape may appear in the
    * file, and the bound that keeps it driver-safe. */
  private final case class Allowed(
      file: String, lineContains: String, count: Int, bound: String)

  private val allowed = Seq(
    Allowed("BloomOps.scala", ".collect()", 1,
      "O(numBits/64) bit-or'd words of the aggregated Bloom filter — " +
        "filter-sized, never row-sized"),
    Allowed("MlOps.scala", ".collect()", 1,
      "O(hash buckets) gradient aggregate per LR iteration (the one " +
        "combinable action per round, r4 verdict ask #4)"),
    Allowed("GraphOps.scala",
      "sum(col(\"component\").cast(\"decimal(38,0)\"))).head()", 1,
      "one-row (count, label-sum) convergence probe per propagation round " +
        "— two scalars, never row-sized"),
    Allowed("PqOps.scala", ".collect().map(_.getSeq[Double](1).toArray)", 1,
      "O(k·dim) k-means centroids per codebook training round"),
    Allowed("IvfOps.scala", ".collect().map(_.getSeq[Double](1).toArray)", 1,
      "O(numCells·dim) IVF cell centroids per training round"),
    Allowed("PcaOps.scala", ".collect()", 2,
      "O(dim) per-dimension means and the O(dim²) upper-triangle Gram " +
        "aggregate — covariance is dimension-, not row-, sized"),
    Allowed("BpeOps.scala", ".limit(1).collect()", 1,
      "exactly one row: the argmax merge pair per BPE round (limit(1) is " +
        "in the plan)"),
    Allowed("ExtQueries.scala",
      ".select(graft.ops.VectorOps.vecD($\"embedding\")).head().getSeq[Double](0)", 1,
      "one O(dim) query vector for the persisted-IVF probe"),
    Allowed("ExtQueries.scala", ".head().getAs[Array[Byte]](\"sk\")", 1,
      "one O(depth·width) CMS sketch blob per side of the join-cardinality " +
        "estimate"),
    Allowed("SourcesCatalog.scala", ".collect().sortBy(_._1).toSeq", 1,
      "the 5-row region dimension (fixture-sized COPY/EXPORT input)"),
    Allowed("SourcesCatalog.scala",
      ".collect() // 25-row dimension: fixture-sized, driver-local DB", 1,
      "the 25-row nation dimension staged into the embedded Derby " +
        "database that backs the read_jdbc TVF oracle"),
    Allowed("SourcesCatalog.scala", "WHERE schema_name = 'staging'\"\"\").head().getLong(0)", 1,
      "a single scalar: information_schema.schemata count"),
    Allowed("StreamingOps.scala", "batch.collect().foreach { r =>", 1,
      "per-micro-batch changed-key upsert set in update mode — bounded by " +
        "the materialized view's key cardinality, the point of update mode"),
    Allowed("DdlDml.scala", "\"TARGET 65536 BYTES\").head()", 1,
      "exactly one row: OPTIMIZE returns (table, files_before, files_after)"),
    Allowed("DdlDml.scala", "df.collect()", 1,
      "the DPP proof's one in-builder execution — O(distinct " +
        "o_orderpriority) = 5 grouped rows; the collect exists to advance " +
        "the runtime-pruned-file counter the proof asserts on"),
    Allowed("DdlDml.scala", ".head().getLong(0)", 1,
      "a single scalar: the pre-replace snapshot's row count the staged-" +
        "RTAS proof compares against the base table"),
    Allowed("CdcMvOps.scala", ".head().getLong(0)", 1,
      "a single scalar: the MV's applied-version watermark " +
        "(coalesce(max(__as_of), 0))"),
    Allowed("GraftDiskCatalog.scala",
      ".collect() // O(straddling files) triples — DriverActionLint-bounded", 1,
      "O(straddling files) (rel, sidecar, cardinality) triples from the " +
        "deletion-vector write job — file names and counts, never rows"),
    Allowed("GraftDiskCatalog.scala",
      ".collect() // O(files) metadata triples — DriverActionLint-bounded", 2,
      "the distributed stats harvests (CONVERT adopt + OPTIMIZE rewrite): " +
        "O(files) (rel, footer-stat map, size) triples — metadata, never " +
        "rows"),
    Allowed("GraftDiskCatalog.scala",
      "percentile_approx(surrogate(c), probs, lit(10000)).as(c)): _*).head()", 1,
      "one row of O(zorder-cols × bucket-count) percentile boundaries — " +
        "the ZORDER range-partition seed, sketch-sized"))

  /** DF driver actions with materialized-row results. `.count()` /
    * `.isEmpty` return scalars and are exempt; bare `.head`/`.take(n)`
    * also appear on Scala collections, so only the unambiguous
    * empty-paren DataFrame forms are linted. */
  private val actionRe =
    """\.collect\(\)|\.head\(\)|\.collectAsList\(\)|\.first\(\)|\.toLocalIterator""".r

  private val roots = Seq("ops", "queries", "functions", "streaming", "sources")
    .map(d => Paths.get(s"src/main/scala/graft/$d"))

  test("every driver action in query-building code carries a documented bound") {
    val sites = scala.collection.mutable.Map
      .empty[(String, String), Int].withDefaultValue(0)
    def scan(p: Path): Unit =
      Files.walk(p).iterator().asScala
        .filter(f => f.toString.endsWith(".scala") && Files.isRegularFile(f))
        .foreach { f =>
          val name = f.getFileName.toString
          Files.readAllLines(f).asScala.foreach { raw =>
            val line = raw.trim
            val isComment = line.startsWith("//") || line.startsWith("*") ||
              line.startsWith("/*")
            if (!isComment && actionRe.findFirstIn(line).isDefined)
              sites((name, line)) += 1
          }
        }
    roots.foreach(scan)

    val unjustified = sites.toSeq.filter { case ((file, line), _) =>
      !allowed.exists(a => a.file == file && line.contains(a.lineContains))
    }
    assert(unjustified.isEmpty,
      "driver action(s) without a registered bound — add an Allowed entry " +
        "with the reason the result is NOT row-sized:\n" +
        unjustified.map { case ((f, l), n) => s"  $f ($n×): $l" }.mkString("\n"))

    allowed.foreach { a =>
      val n = sites.toSeq.collect {
        case ((file, line), c) if file == a.file && line.contains(a.lineContains) => c
      }.sum
      assert(n == a.count,
        s"stale/miscounted lint entry ${a.file} '${a.lineContains}': " +
          s"expected ${a.count} site(s), found $n — update the allowlist " +
          "so it matches the code")
    }
  }
}
