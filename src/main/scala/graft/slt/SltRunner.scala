package graft.slt

import scala.io.Source

import org.apache.spark.sql.Row

import graft.GraftSession

/** Minimal sqllogictest runner driving [[GraftSession]] — the Spark
  * equivalent of the reference harness (`qurious/tests/sqllogictests.rs`),
  * with its cell-formatting rules (`:188-228`): NULL → "NULL", empty
  * varchar → "(empty)", booleans as words, floats as NaN/Infinity/shortest
  * decimal (integral doubles print without a fraction, Rust-style).
  *
  * Supported records: `statement ok`, `statement error`,
  * `query <types> [rowsort]` with a `----` expected block, `#` comments.
  */
object SltRunner {

  final case class SltFailure(file: String, line: Int, message: String)
    extends Exception(s"$file:$line $message")

  def runFile(g: GraftSession, path: String): Int = {
    val src = Source.fromFile(path)
    val lines = try src.getLines().toVector finally src.close()
    var i = 0
    var checks = 0

    def collectSql(): String = {
      val sb = new StringBuilder
      while (i < lines.length && lines(i).trim.nonEmpty && !lines(i).startsWith("----")) {
        sb.append(lines(i)).append('\n')
        i += 1
      }
      sb.toString.trim
    }

    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#") || line.startsWith("subtest")) {
        i += 1
      } else if (line == "statement ok") {
        i += 1
        val at = i
        val sql = collectSql()
        try g.sql(sql).collect()
        catch {
          case e: Exception =>
            throw SltFailure(path, at + 1, s"statement failed: ${e.getMessage}")
        }
        checks += 1
      } else if (line == "statement error") {
        i += 1
        val at = i
        val sql = collectSql()
        val failed =
          try { g.sql(sql).collect(); false }
          catch { case _: Exception => true }
        if (!failed) throw SltFailure(path, at + 1, "expected error, statement succeeded")
        checks += 1
      } else if (line.startsWith("query")) {
        val rowsort = line.split("\\s+").contains("rowsort")
        i += 1
        val at = i
        val sql = collectSql()
        if (i < lines.length && lines(i).startsWith("----")) i += 1
        val expected = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          expected += normalizeWs(lines(i))
          i += 1
        }
        val rows =
          try g.sql(sql).collect().toVector
          catch {
            case e: Exception => throw SltFailure(path, at + 1, s"query failed: ${e.getMessage}")
          }
        var got = rows.map(formatRow)
        var want = expected.result()
        if (rowsort) { got = got.sorted; want = want.sorted }
        if (got != want)
          throw SltFailure(path, at + 1,
            s"result mismatch\n  got:  ${got.mkString(" | ")}\n  want: ${want.mkString(" | ")}")
        checks += 1
      } else {
        throw SltFailure(path, i + 1, s"unrecognized record: $line")
      }
    }
    checks
  }

  private def normalizeWs(s: String): String = s.trim.replaceAll("\\s+", " ")

  def formatRow(r: Row): String =
    (0 until r.length).map(idx => cellToString(r.get(idx))).mkString(" ")

  /** Reference cell formatting (`sqllogictests.rs:188-228`). */
  def cellToString(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case s: String => if (s.isEmpty) "(empty)" else s.stripSuffix("\n")
    case f: Float => floatToString(f.toDouble)
    case d: Double => floatToString(d)
    case d: java.math.BigDecimal => d.toPlainString
    case other => other.toString
  }

  private def floatToString(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}
