package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.slt.SltRunner

/** Runs the reference's own sqllogictest corpus VERBATIM
  * (the 20 .slt files under `qurious/tests/sql/`, copied unmodified into
  * src/test/resources/slt/reference/) through SltRunner — the parity bar the
  * reference harness itself sets (`qurious/tests/sqllogictests.rs:20-107`):
  * one fresh session per file. `tpch.slt` pulls in the tests/tpch chain
  * (create_tables / COPY FROM .tbl / q1-q12 / drop_tables) via its `include`
  * directives; the q-file golden blocks are regenerated against the
  * committed fixtures (dbgen data is not distributable — see
  * resources/slt/tpch/README.md), with the SQL text verbatim.
  */
class SltReferenceCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = new File("src/test/resources/slt/reference")
  private val files = Option(dir.listFiles()).getOrElse(Array.empty)
    .filter(_.getName.endsWith(".slt")).sortBy(_.getName)

  assert(files.nonEmpty, s"no slt files found in ${dir.getAbsolutePath}")

  // the reference runs COPY paths relative to its repo root
  private val tpchData = new File("src/test/resources/slt/tpch").getAbsolutePath
  private def resolve(p: String): String =
    if (p.startsWith("./tests/tpch/")) tpchData + "/" + p.stripPrefix("./tests/tpch/")
    else p

  files.foreach { f =>
    test(s"reference slt: ${f.getName}") {
      val checks = SltRunner.runFile(new GraftSession(spark, resolve), f.getPath)
      assert(checks > 0)
    }
  }
}
