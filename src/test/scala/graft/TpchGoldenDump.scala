package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

import graft.slt.SltRunner

/** Dev tool (not a test): loads the reference TPC-H DDL + COPY chain over
  * the committed .tbl fixtures, runs each reference q-file's SQL verbatim
  * through GraftSession, and dumps formatted rows + result schema to
  * target/tpch_dump/. `scripts/make_tpch_goldens.py` then cross-checks the
  * values against DuckDB on the same fixtures and (only if they agree)
  * writes the golden blocks of src/test/resources/slt/tpch/q*.slt.
  *
  * Run: sbt "Test/runMain graft.TpchGoldenDump"
  */
object TpchGoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tpchDir = new File("src/test/resources/slt/tpch")
    val refDir = new File("/root/reference/qurious/tests/tpch")
    def resolve(p: String): String =
      if (p.startsWith("./tests/tpch/")) tpchDir.getAbsolutePath + "/" + p.stripPrefix("./tests/tpch/")
      else p
    val g = new GraftSession(spark, resolve)

    SltRunner.runFile(g, new File(tpchDir, "create_tables.slt").getPath)
    SltRunner.runFile(g, new File(tpchDir, "insert.slt").getPath)

    val outDir = new File("target/tpch_dump")
    outDir.mkdirs()

    (1 to 12).foreach { n =>
      val src = scala.io.Source.fromFile(new File(refDir, s"q$n.slt"))
      val lines = try src.getLines().toVector finally src.close()
      val header = lines.indexWhere(_.startsWith("query"))
      val sep = lines.indexWhere(_.startsWith("----"))
      val sql = lines.slice(header + 1, sep).mkString("\n")
      val df = g.sql(sql)
      val rows = df.collect().toIndexedSeq.map(SltRunner.formatRow)
      val pw = new PrintWriter(new File(outDir, s"q$n.rows"))
      try rows.foreach(pw.println) finally pw.close()
      val pws = new PrintWriter(new File(outDir, s"q$n.meta"))
      try {
        pws.println(lines(header))
        pws.println(df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(","))
        pws.println(sql)
      } finally pws.close()
      println(s"q$n: ${rows.size} rows, schema ${df.schema.map(_.dataType.simpleString).mkString(",")}")
    }
    spark.stop()
  }
}
