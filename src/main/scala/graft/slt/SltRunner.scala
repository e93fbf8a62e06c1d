package graft.slt

import java.io.File
import scala.io.Source

import org.apache.spark.sql.Row

import graft.GraftSession

/** Minimal sqllogictest runner driving [[GraftSession]] — the Spark
  * equivalent of the reference harness (`qurious/tests/sqllogictests.rs`),
  * with its cell-formatting rules (`:188-228`): NULL → "NULL", empty
  * varchar → "(empty)", booleans as words, floats as NaN/Infinity/shortest
  * decimal (integral doubles print without a fraction, Rust-style),
  * timestamps in Arrow's `yyyy-MM-ddTHH:mm:ss` form.
  *
  * Supported records: `statement ok`, `statement error`, `query error`,
  * `query <types> [rowsort]` with a `----` expected block, `include <glob>`
  * (relative to the including file, as in the reference's
  * `tests/sql/tpch.slt`), `#` comments.
  *
  * Comparison: `rowsort` sorts both sides (sqllogictest standard). Queries
  * without `rowsort` and without ORDER BY compare as multisets — the
  * reference's goldens encode its single-threaded hash-table iteration
  * order, which no other engine (Spark included) reproduces; values and
  * multiplicities are still fully checked. Queries with ORDER BY compare
  * in order.
  */
object SltRunner {

  final case class SltFailure(file: String, line: Int, message: String)
    extends Exception(s"$file:$line $message")

  def runFile(g: GraftSession, path: String): Int = {
    // explicit UTF-8: the platform default charset may be ASCII in a bare
    // container, and slt comments are allowed non-ASCII punctuation
    val src = Source.fromFile(path)(scala.io.Codec.UTF8)
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

    def expectError(): Unit = {
      val at = i
      val sql = collectSql()
      // optional expected-error block (ignored content, like the reference
      // harness's regex-less default)
      if (i < lines.length && lines(i).startsWith("----")) {
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      }
      val failed =
        try { g.sql(sql).collect(); false }
        catch { case _: Exception => true }
      if (!failed) throw SltFailure(path, at + 1, "expected error, statement succeeded")
      checks += 1
    }

    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#") || line.startsWith("subtest")) {
        i += 1
      } else if (line == "halt") {
        // sqllogictest halt: skip the remainder of the file (the reference
        // corpus uses it to fence off FIXME sections, select.slt:92)
        return checks
      } else if (line.startsWith("include")) {
        val pattern = line.drop("include".length).trim
        i += 1
        val base = new File(path).getParentFile
        val resolved = new File(base, pattern)
        val dir = resolved.getParentFile
        val nameGlob = resolved.getName
        val re = ("\\Q" + nameGlob.replace("*", "\\E.*\\Q") + "\\E").r
        val matches = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => re.pattern.matcher(f.getName).matches())
          .sortBy(_.getName)
        if (matches.isEmpty)
          throw SltFailure(path, i, s"include matched no files: $pattern")
        matches.foreach(f => checks += runFile(g, f.getPath))
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
        expectError()
      } else if (line.startsWith("query error")) {
        i += 1
        expectError()
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
        val ordered = sql.toLowerCase.contains("order by")
        if (rowsort || !ordered) { got = got.sorted; want = want.sorted }
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
    case f: Float => floatCell(f)
    case d: Double => doubleCell(d)
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case t: java.sql.Timestamp => timestampCell(t.toLocalDateTime)
    case t: java.time.LocalDateTime => timestampCell(t)
    case t: java.time.Instant =>
      timestampCell(java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC))
    case other => other.toString
  }

  /** Arrow prints timestamps as `1999-01-08T01:00:00` (fraction only when
    * nonzero) — `sqllogictests.rs` falls through to `ArrayFormatter`. */
  private def timestampCell(t: java.time.LocalDateTime): String = {
    val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d" +
      f"T${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    if (t.getNano == 0) base
    else base + "." + f"${t.getNano / 1000000}%03d".reverse.dropWhile(_ == '0').reverse
  }

  /** Rust `f32::to_string` parity: shortest round-trip repr of the *float*,
    * integral values without a fraction. */
  private def floatCell(f: Float): String =
    if (f.isNaN) "NaN"
    else if (f == Float.PositiveInfinity) "Infinity"
    else if (f == Float.NegativeInfinity) "-Infinity"
    else if (f == math.rint(f) && math.abs(f) < 1e15f) f.toLong.toString
    else f.toString

  private def doubleCell(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}
