package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** zstd-compressed text ingestion — the layout LLM training corpora
  * actually ship in (`.jsonl.zst` shards): Spark's text/json readers
  * cannot open them without a natively-installed Hadoop codec, but the
  * zstd-jni runtime is on every Spark 4 classpath. One task per shard
  * (the shard fan-out IS the parallelism in these corpora — thousands
  * of ~100 MB files), streaming decompression (never the whole file in
  * memory), session Hadoop configuration shipped to tasks.
  *
  * [[readLines]] yields (path, line) rows; [[readJsonl]] layers
  * `spark.read.json` schema inference + parsing on top, so a
  * `.jsonl.zst` corpus lands as typed columns in one call. gzip shards
  * (`.jsonl.gz`) route through the JDK inflater — the two compressors
  * cover the common-crawl-derivative distributions. */
object ZstText {

  private def listShards(
      spark: SparkSession, path: String, suffixes: Seq[String])
      : Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
          .filter(f => suffixes.exists(f.getName.endsWith(_)) &&
            !f.getName.startsWith("_"))
      else Seq(p)
    require(files.nonEmpty,
      s"zst-text: no ${suffixes.mkString("/")} shards under $path")
    files.map(_.toString).sorted
  }

  /** Decompressed lines of every shard: (shard path, line). */
  def readLines(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    val shards = listShards(spark, path, Seq(".zst", ".gz", ".jsonl", ".txt"))
    val hconf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    spark.sparkContext.parallelize(shards, shards.size)
      .flatMap { f =>
        val p = new HPath(f)
        val raw = p.getFileSystem(hconf.value).open(p)
        val in: java.io.InputStream =
          if (f.endsWith(".zst"))
            new com.github.luben.zstd.ZstdInputStream(raw)
          else if (f.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(raw)
          else raw
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(in,
            java.nio.charset.StandardCharsets.UTF_8))
        // early-terminating consumers (LIMIT, take, failed downstream
        // task) must not leak the decompressor + handle for the
        // executor's lifetime — drain-close only covers full reads
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try reader.close() catch { case _: Throwable => () }
          })
        new Iterator[(String, String)] {
          private var nextLine = reader.readLine()
          override def hasNext: Boolean = {
            val h = nextLine != null
            if (!h) reader.close()
            h
          }
          override def next(): (String, String) = {
            val l = nextLine
            nextLine = reader.readLine()
            (f, l)
          }
        }
      }.toDS().toDF("shard", "line").as[(String, String)]
  }

  /** `.jsonl.zst` corpus → typed DataFrame (Spark's JSON parser over
    * the decompressed line stream; schema inferred or supplied). */
  def readJsonl(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    import spark.implicits._
    val lines = readLines(spark, path).map(_._2)
    val r = spark.read
    schema.fold(r)(r.schema).json(lines)
  }

  /** Sink: one zstd-compressed JSONL shard per partition + _SUCCESS
    * (level 3 — the corpus-distribution default). */
  def writeJsonlZst(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val target = new HPath(path)
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target)
    val hconf = new SerializableConfiguration(conf)
    df.toJSON.rdd.foreachPartition { lines =>
      if (lines.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val part = new HPath(target, f"part-$pid%05d.jsonl.zst")
        val out = part.getFileSystem(hconf.value).create(part, true)
        val z = new com.github.luben.zstd.ZstdOutputStream(out, 3)
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(z,
            java.nio.charset.StandardCharsets.UTF_8))
        try lines.foreach { l => w.write(l); w.write('\n') }
        finally w.close()
      }
    }
    fs.create(new HPath(target, "_SUCCESS"), true).close()
  }
}
