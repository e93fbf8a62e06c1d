package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter skipping indexes for gdisk tables — the tier of
  * data skipping that min/max statistics cannot provide: a point predicate
  * on an UNSORTED high-cardinality column (doc ids, user ids, content
  * hashes) overlaps every file's min/max range, but a per-file Bloom
  * filter proves non-membership and drops the file before the scan plans
  * it. The public Delta Lake / Iceberg bloom-index shape, manifest-native.
  *
  * Declared as a table property: `TBLPROPERTIES ('bloom.columns'='id,key')`
  * (+ optional `bloom.expectedItems`, default 100k/file, and `bloom.fpp`,
  * default 1%). Integral and string columns only.
  *
  * Lifecycle:
  *  - ingest writers ([[GraftDiskWriterFactory]]) feed each row's indexed
  *    values into a per-open-file filter AS THE ROW IS WRITTEN — zero
  *    extra I/O — and persist one sidecar per (file, column) under
  *    `_bloom/` at task commit (the executor task owns its files; the
  *    driver never sees row data);
  *  - sidecars are IMMUTABLE like the data files they index (leaf names
  *    are UUID-unique, never reused), so time travel reads old files with
  *    their original filters and a driver-side LRU cache can never go
  *    stale;
  *  - scans test EqualTo/IN literals against each candidate file's
  *    sidecar and skip files where every literal is provably absent; a
  *    MISSING sidecar (pre-index files, CONVERT-adopted files) always
  *    keeps the file — skipping is never load-bearing for correctness;
  *  - OPTIMIZE rebuilds filters for its rewritten files in one
  *    distributed job ([[rebuild]] — partial filters shuffle as
  *    O(sketch-size) payloads, never rows); VACUUM deletes sidecars of
  *    the data files it removes.
  */
object DiskBloom {

  val ColumnsProp = "bloom.columns"
  val ItemsProp = "bloom.expectedItems"
  val FppProp = "bloom.fpp"
  val DirName = "_bloom"

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** The schema-canonical bloom column names declared on a table; throws
    * on an unknown column or unsupported type (a config error should
    * surface, not silently disable the index). */
  def spec(properties: Map[String, String], schema: StructType): Seq[String] = {
    properties.get(ColumnsProp).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map { c =>
        val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(
            s"gdisk: $ColumnsProp names unknown column '$c'"))
        require(supported(f.dataType),
          s"gdisk: bloom index on '${f.name}' has unsupported type " +
            s"${f.dataType.simpleString} (integral or string only)")
        f.name
      }
  }

  def expectedItems(properties: Map[String, String]): Long =
    properties.get(ItemsProp).map(_.toLong).getOrElse(100000L)

  def fpp(properties: Map[String, String]): Double =
    properties.get(FppProp).map(_.toDouble).getOrElse(0.01)

  // '=' is the one separator URLEncoder always escapes (%3D) inside the
  // encoded parts, so splitting a sidecar name at its LAST raw '=' is
  // unambiguous even for rels/columns containing dots or dashes.
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  def sidecar(dataDir: HPath, rel: String, colName: String): HPath =
    new HPath(dataDir, s"$DirName/${enc(rel)}=${enc(colName)}.bloom")

  /** The data-file rel a sidecar name indexes (VACUUM's sweep key). */
  def relOfSidecar(name: String): Option[String] = {
    if (!name.endsWith(".bloom")) return None
    val stem = name.stripSuffix(".bloom")
    val cut = stem.lastIndexOf('=')
    if (cut <= 0) None
    else Some(java.net.URLDecoder.decode(stem.substring(0, cut), "UTF-8"))
  }

  /** Feed one row value (InternalRow/Row representation) into a filter. */
  def feed(bf: BloomFilter, dt: DataType, v: Any): Unit = dt match {
    case ByteType => bf.putLong(v.asInstanceOf[Byte].toLong)
    case ShortType => bf.putLong(v.asInstanceOf[Short].toLong)
    case IntegerType => bf.putLong(v.asInstanceOf[Int].toLong)
    case LongType => bf.putLong(v.asInstanceOf[Long])
    case StringType => bf.putString(v.toString) // UTF8String or String
    case other => throw new IllegalStateException(s"bloom feed: $other")
  }

  /** Test a Catalyst literal value against a filter (same keying as
    * [[feed]], so scan probes and writer feeds agree bit-for-bit). */
  def mightContain(bf: BloomFilter, dt: DataType, v: Any): Boolean = dt match {
    case ByteType => bf.mightContainLong(v.asInstanceOf[Byte].toLong)
    case ShortType => bf.mightContainLong(v.asInstanceOf[Short].toLong)
    case IntegerType => bf.mightContainLong(v.asInstanceOf[Int].toLong)
    case LongType => bf.mightContainLong(v.asInstanceOf[Long])
    case StringType => bf.mightContainString(v.toString)
    case _ => true
  }

  def write(fs: FileSystem, path: HPath, bf: BloomFilter): Unit = {
    fs.mkdirs(path.getParent)
    val out = fs.create(path, true)
    try bf.writeTo(out) finally out.close()
  }

  // Driver-side sidecar LRU (sidecars are immutable → never stale).
  // Missing files cache as None so repeated probes of unindexed files
  // don't re-stat storage every query.
  private val MaxCached = 512
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Option[BloomFilter]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[BloomFilter]]): Boolean =
        size() > MaxCached
    })

  def load(fs: FileSystem, path: HPath): Option[BloomFilter] = {
    val key = path.toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val loaded =
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        try Some(BloomFilter.readFrom(in)) finally in.close()
      }
    cache.put(key, loaded)
    loaded
  }

  /** Evict cached entries under a table's `_bloom/` dir (used by VACUUM,
    * whose deletions are the one event that invalidates). */
  private[sources] def invalidateUnder(bloomDir: HPath): Unit = {
    val prefix = bloomDir.toString
    cache.synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(prefix)) it.remove()
    }
  }

  /** Distributed filter rebuild for maintenance rewrites (OPTIMIZE):
    * one pass over the rewritten files tagged with `_metadata.file_path`,
    * per-partition partial filters merged by (file, column) key — the
    * shuffle carries O(sketch-size) payloads, never rows — and sidecars
    * written from the reducer tasks. Identity-partition columns are
    * skipped (their values live in dir names, already pruned exactly). */
  /** Rebuild sidecars for `rels`. `schema` and `cols` carry PHYSICAL
    * column names (what the files hold and what sidecars are keyed by) —
    * the caller resolves the logical bloom declaration first. */
  def rebuild(spark: SparkSession, dataDir: HPath, rels: Seq[String],
      properties: Map[String, String], schema: StructType,
      cols: Seq[String]): Unit = {
    if (cols.isEmpty || rels.isEmpty) return
    val items = expectedItems(properties)
    val p = fpp(properties)
    val dataDirStr = dataDir.toString
    val types = cols.map(c => schema(schema.fieldIndex(c)).dataType)
    val df = spark.read.parquet(rels.map(r => new HPath(dataDir, r).toString): _*)
      .select(col("_metadata.file_path") +: cols.map(col): _*)
    val nCols = cols.length
    val partials = df.rdd.mapPartitions { rows =>
      val acc = scala.collection.mutable.HashMap
        .empty[String, Array[BloomFilter]]
      rows.foreach { r =>
        val file = r.getString(0)
        val bfs = acc.getOrElseUpdate(file,
          Array.fill(nCols)(BloomFilter.create(items, p)))
        var i = 0
        while (i < nCols) {
          if (!r.isNullAt(i + 1)) feed(bfs(i), types(i), r.get(i + 1))
          i += 1
        }
      }
      acc.iterator.flatMap { case (file, bfs) =>
        bfs.iterator.zipWithIndex.map { case (bf, i) =>
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          ((file, i), bos.toByteArray)
        }
      }
    }
    val colNames = cols
    // leaf names are UUID-unique per table, so they key the rel mapping
    // without any URI decoding (partition dirs carry %-escapes that a
    // URI round-trip would corrupt)
    val relByLeaf = rels.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
    partials.reduceByKey { (a, b) =>
      val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
      fa.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
      val bos = new java.io.ByteArrayOutputStream()
      fa.writeTo(bos)
      bos.toByteArray
    }.foreachPartition { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.foreach { case ((filePath, i), bytes) =>
        val leaf = filePath.substring(filePath.lastIndexOf('/') + 1)
        relByLeaf.get(leaf).foreach { rel =>
          val side = sidecar(new HPath(dataDirStr), rel, colNames(i))
          val fs = side.getFileSystem(conf)
          val out = fs.create(side, true)
          try out.write(bytes) finally out.close()
        }
      }
    }
    // rebuild/backfill writes sidecars at paths earlier probes may have
    // cached as ABSENT — drop those entries (the one way "immutable"
    // sidecar state can change under the cache)
    invalidateUnder(new HPath(dataDir, DirName))
  }
}
