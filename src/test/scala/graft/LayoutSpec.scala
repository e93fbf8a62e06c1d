package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LayoutOps

/** Z-order layout: interleave arithmetic vs a bit-twiddling reference, and
  * the property the layout exists for — a box predicate touches far fewer
  * files under Z-order than under a single-column sort. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue2 matches the reference interleave on a 32x32 grid") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", LayoutOps.zValue2($"x", $"y", 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === refZ(x, y, 5), s"($x, $y)")
    }
  }

  test("zValueN generalizes zValue2 and interleaves three columns") {
    import graft.ops.LayoutOps.{zValue2, zValueN}
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    // N=2 must agree with the specialized two-column form
    val both = pts.toDF("x", "y")
      .select(zValue2($"x", $"y", 4).as("z2"), zValueN(Seq($"x", $"y"), 4).as("zn"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // three columns: bit i of column j lands at position 3i + j
    val z3 = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (2L, 0L, 4L))
      .toDF("a", "b", "c")
      .select(zValueN(Seq($"a", $"b", $"c"), 4).as("z"))
      .collect().map(_.getLong(0))
    assert(z3(0) === 1L)      // a bit0 -> out bit 0
    assert(z3(1) === 2L)      // b bit0 -> out bit 1
    assert(z3(2) === 4L)      // c bit0 -> out bit 2
    assert(z3(3) === (1L << 3 | 1L << 8)) // a bit1 -> bit 3, c bit2 -> bit 8
  }

  test("zValue2 clamps negative/out-of-range inputs to their low bits") {
    // masked inputs: -1 has all low bits set → same z as the max in-range
    // value; 2^bits + v aliases to v (no sign-bit leakage into the key)
    val got = Seq((-1L, 0L), (31L, 0L), (33L, 0L), (1L, 0L))
      .toDF("x", "y")
      .select(LayoutOps.zValue2($"x", $"y", 5).as("z"))
      .collect().map(_.getLong(0))
    assert(got(0) === got(1)) // -1 masks to 31
    assert(got(2) === got(3)) // 33 masks to 1
  }

  test("globalRowNumber equals a global window row_number (ties included)") {
    // keys with heavy ties so bucket boundaries land inside tie runs
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "k")
    val expected = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"k", $"id")))
      .select($"id", $"rn")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = LayoutOps.globalRowNumber(df, $"k", Seq($"k", $"id"), buckets = 16)
      .select($"id", col("global_rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, rn) =>
      assert(got(id) == rn.toLong, s"id $id")
    }
    // the plan must not contain an unpartitioned window over the data
    val wins = LayoutOps.globalRowNumber(df, $"k", Seq($"k", $"id"), buckets = 16)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("count_below_arr matches the size(filter) HOF it replaced (incl. NaN/-0.0/nulls)") {
    // the globalRowNumber bucket rank: parity on every double edge case —
    // Spark `<` ordering (NaN greatest, -0.0 == 0.0), null elements dropped
    val bounds = Seq(
      Seq[java.lang.Double](-5.0, -0.0, 1.5, 1.5, Double.NaN),
      Seq[java.lang.Double](0.0, null, 3.0),
      Seq[java.lang.Double]())
    val xs = Seq(-10.0, -0.0, 0.0, 1.5, 2.0, Double.NaN, 1e308, -1e308)
    val df = (for (b <- bounds; x <- xs) yield (x, b)).toDF("x", "bounds")
    val rows = df.select(
        graft.functions.NativeFunctions.count_below_arr($"x", $"bounds").as("native"),
        size(filter($"bounds", b => b < $"x")).cast("long").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("z-order locality: adjacent z-values are near in space") {
    // the defining property vs a linear key: walking the curve stays local
    val n = 1 << 12 // full 64x64 grid as a z-ordered walk
    val cells = (0 until n).map { z =>
      // deinterleave: even bits -> x, odd bits -> y
      val x = (0 until 6).map(i => ((z >> (2 * i)) & 1) << i).sum
      val y = (0 until 6).map(i => ((z >> (2 * i + 1)) & 1) << i).sum
      (x, y)
    }
    val jumps = cells.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    // mean step along the curve is tiny relative to the 64-wide grid
    assert(jumps.sum.toDouble / jumps.size < 3.0)
  }

  test("compact collapses a small-file directory, preserving rows") {
    val dir = Files.createTempDirectory("graft-compact").toFile
    dir.deleteOnExit()
    val in = s"${dir.getAbsolutePath}/in"
    val out = s"${dir.getAbsolutePath}/out"
    // 64 tiny files
    spark.range(0, 10000).withColumn("payload", md5($"id".cast("string")))
      .repartition(64).write.parquet(in)
    def parquetFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in).length === 64)
    val inBytes = parquetFiles(in).map(_.length()).sum
    LayoutOps.compact(spark, in, out, targetBytes = inBytes / 4)
    val outFiles = parquetFiles(out)
    assert(outFiles.length <= 8 && outFiles.length >= 2,
      s"got ${outFiles.length} files")
    // content unchanged
    assert(spark.read.parquet(out).count() === 10000L)
    val a = spark.read.parquet(in).orderBy($"id").collect()
    val b = spark.read.parquet(out).orderBy($"id").collect()
    assert(a === b)
  }

  test("z-ordered files skip a box query that a linear sort cannot") {
    val dir = Files.createTempDirectory("graft-layout").toFile
    dir.deleteOnExit()
    val zPath = s"${dir.getAbsolutePath}/zorder"
    val linPath = s"${dir.getAbsolutePath}/linear"
    // 64x64 grid, one row per cell
    val grid = spark.range(0, 64L * 64L)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    LayoutOps.zorderWrite(grid, $"x", $"y", bits = 6, numFiles = 16, zPath)
    grid.repartitionByRange(16, $"x")
      .sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(linPath)

    // per-file min/max stats — what parquet footer pruning sees
    def overlapping(path: String): Long = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
      stats.filter($"x0" <= 31 && $"x1" >= 16 && $"y0" <= 31 && $"y1" >= 16)
        .count()
    }
    val zFiles = overlapping(zPath)
    val linFiles = overlapping(linPath)
    // linear-by-x layout: every file spans all y, so only the x-range cuts
    // (4 of 16 files); z-order confines the box to its quadrant files
    assert(zFiles < linFiles, s"z=$zFiles linear=$linFiles")
    assert(zFiles <= 2, s"z=$zFiles")
    // both layouts hold the same rows
    assert(spark.read.parquet(zPath).count() === 64L * 64L)
    val box = spark.read.parquet(zPath)
      .filter($"x".between(16, 31) && $"y".between(16, 31)).count()
    assert(box === 256L)
  }
}
