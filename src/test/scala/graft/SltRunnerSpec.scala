package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.slt.SltRunner

/** Runs every .slt file in src/test/resources/slt through the runner, one
  * fresh session per file (like the reference harness's per-file sessions,
  * `qurious/tests/sqllogictests.rs:20-43` — here a fresh GraftSession over
  * the shared SparkSession, with per-file table names for isolation). */
class SltRunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = new File("src/test/resources/slt")
  private val files = Option(dir.listFiles()).getOrElse(Array.empty)
    .filter(_.getName.endsWith(".slt")).sortBy(_.getName)

  assert(files.nonEmpty, s"no slt files found in ${dir.getAbsolutePath}")

  files.foreach { f =>
    test(s"slt: ${f.getName}") {
      val checks = SltRunner.runFile(new GraftSession(spark), f.getPath)
      assert(checks > 0)
    }
  }

  test("cell formatting parity with the reference harness") {
    assert(SltRunner.cellToString(null) == "NULL")
    assert(SltRunner.cellToString("") == "(empty)")
    assert(SltRunner.cellToString(true) == "true")
    assert(SltRunner.cellToString(3.0) == "3")
    assert(SltRunner.cellToString(15.5) == "15.5")
    assert(SltRunner.cellToString(Double.NaN) == "NaN")
    assert(SltRunner.cellToString(Double.PositiveInfinity) == "Infinity")
    assert(SltRunner.cellToString(Double.NegativeInfinity) == "-Infinity")
  }
}
