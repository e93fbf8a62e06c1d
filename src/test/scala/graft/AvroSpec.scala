package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroOps

/** Avro reader/writer: full type-matrix round trips, nullability, and
  * the sync-marker split path (one fat file → many tasks, exact rows). */
class AvroSpec extends AnyFunSuite {

  // the JVM-shared test session — NEVER stop() it (suites run after us)
  private lazy val spark = TestSpark.spark
  private val tmp =
    java.nio.file.Files.createTempDirectory("graft_avro_spec").toString

  test("type matrix round-trips losslessly, including nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(12, 2)),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, StringType)),
      StructField("rec", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val rows = (0 until 50).map { i =>
      if (i % 7 == 3)
        Row(i.toLong, null, null, null, null, null, null, null, null,
          null, null, null, null, null)
      else Row(
        i.toLong, i * 2, i * 1.5, i * 0.5f, i % 2 == 0, s"s$i",
        Array[Byte](i.toByte, (i + 1).toByte),
        new java.math.BigDecimal(s"$i.25"),
        java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        java.sql.Timestamp.from(
          java.time.Instant.parse("2024-06-01T12:00:00Z").plusSeconds(i)),
        java.time.LocalDateTime.of(2024, 6, 1, 3, 4, 5).plusMinutes(i),
        Seq(i.toLong, i + 1L),
        Map(s"k$i" -> s"v$i"),
        Row(i.toLong, s"inner$i"))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val path = s"$tmp/types"
    AvroOps.writeAvro(df, path)
    val back = AvroOps.readAvro(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      // binary needs content comparison (arrays compare by reference)
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (xb: Array[Byte], yb: Array[Byte]) =>
            assert(java.util.Arrays.equals(xb, yb), s"field $i of ${x.get(0)}")
          case (xv, yv) => assert(xv == yv, s"field $i of ${x.get(0)}")
        }
      }
    }
  }

  test("sync-marker splits: one fat file reads as many tasks, rows exact") {
    val n = 120000L
    // md5 hex keeps the payload incompressible so the deflated file
    // stays well past one split
    val df = spark.range(n).select(col("id"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("txt"))
      .coalesce(1)
    val path = s"$tmp/fat"
    AvroOps.writeAvro(df, path)
    val old = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
    try {
      val back = AvroOps.readAvro(spark, path)
      assert(back.rdd.getNumPartitions > 1,
        "a multi-MB file must split across tasks")
      assert(back.count() == n, "every row in exactly one split")
      assert(back.agg(sum(col("id"))).head().getLong(0) == n * (n - 1) / 2)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("empty directory and non-avro files are rejected cleanly") {
    val dir = s"$tmp/empty"
    new java.io.File(dir).mkdirs()
    intercept[IllegalArgumentException] { AvroOps.readAvro(spark, dir) }
  }
}
