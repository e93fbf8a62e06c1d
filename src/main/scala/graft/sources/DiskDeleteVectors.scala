package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** MERGE-ON-READ DELETION VECTORS — Delta's DV shape re-expressed on the
  * gdisk manifest. A DELETE whose condition straddles a file (some rows
  * match, some don't) no longer rewrites that file: it records the
  * matching ROW INDEXES in a tiny immutable sidecar under `data/_dv/` and
  * commits one manifest whose `deleteVectors` map points the file at its
  * sidecar. Reads subtract DV'd rows by the parquet reader's own row
  * index (`_tmp_metadata_row_index` — robust to splits AND row-group
  * skipping, the same mechanism Spark's `_metadata.row_index` uses), so
  * a 1-row GDPR erasure in a 1 GB file costs O(matched rows) instead of
  * O(file). OPTIMIZE purges: rewritten files materialize the deletes and
  * drop their DV entries, restoring the fully-vectorized scan path.
  *
  * Reference parity anchor: the delete surface the reference plans
  * (qurious/src/provider/table.rs:43-58) — whose gdisk form must not
  * cost O(file) per deleted row.
  *
  * Sidecar format (versioned, magic "GDV1"): BE int word count, BE long
  * cardinality, then the fixed-width bitset words GZIP-compressed. A
  * bitset (not an index list) keeps repeated deletes on the same file
  * union-idempotent and bounds the sidecar at rows/8 bytes before
  * compression (a sparse vector gzips to almost nothing). Sidecars are
  * immutable — a re-delete writes a NEW sidecar with the union and the
  * manifest swap makes it visible; VACUUM sweeps unreferenced ones. */
object DiskDv {
  /** Sidecar filesystem loads by this JVM — test observability for the
    * "plan time opens zero sidecars" bound (local-mode tests tell driver
    * from executor work apart by WHEN the counter moves, not by JVM). */
  private[graft] val loads = new java.util.concurrent.atomic.AtomicLong()

  val DirName = "_dv"
  /** Manifest property that opts a table into merge-on-read deletes.
    * Default (absent / "cow") keeps the copy-on-write rewrite. */
  val ModeProp = "delete.mode"
  private val Magic = 0x47445631 // "GDV1"

  def enabled(props: Map[String, String]): Boolean =
    props.get(ModeProp).exists(_.equalsIgnoreCase("dv"))

  def sidecar(dataDir: HPath, rel: String) = new HPath(dataDir, rel)

  def newRelName(): String =
    s"$DirName/dv-${java.util.UUID.randomUUID}.dv"

  def serialize(bits: DvBitmap): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeInt(Magic)
    d.writeInt(bits.words.length)
    d.writeLong(bits.cardinality)
    val gz = new java.util.zip.GZIPOutputStream(d)
    val gd = new java.io.DataOutputStream(gz)
    bits.words.foreach(gd.writeLong)
    gd.flush(); gz.finish()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): DvBitmap = {
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(d.readInt() == Magic, "gdisk: not a deletion-vector sidecar")
    val n = d.readInt()
    val card = d.readLong()
    val gz = new java.io.DataInputStream(new java.util.zip.GZIPInputStream(d))
    val words = Array.fill(n)(gz.readLong())
    new DvBitmap(words, card)
  }

  def write(fs: FileSystem, dataDir: HPath, bits: DvBitmap): String = {
    val rel = newRelName()
    val p = sidecar(dataDir, rel)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, false)
    try out.write(serialize(bits)) finally out.close()
    rel
  }

  def read(fs: FileSystem, dataDir: HPath, rel: String): DvBitmap = {
    loads.incrementAndGet()
    val in = fs.open(sidecar(dataDir, rel))
    try deserialize(in.readAllBytes()) finally in.close()
  }

  def readBytes(fs: FileSystem, dataDir: HPath, rel: String): Array[Byte] = {
    loads.incrementAndGet()
    val in = fs.open(sidecar(dataDir, rel))
    try in.readAllBytes() finally in.close()
  }

  /** Executor-side sidecar load by absolute path (the scan partitions
    * ship paths, not bytes — sidecars are immutable, so the task-side
    * read is race-free). `conf` is the SESSION Hadoop configuration
    * shipped inside the partition: a fresh `new Configuration()` here
    * would ignore credentials/filesystem keys the session set. */
  def readAbsolute(path: String, conf: Configuration): DvBitmap = {
    loads.incrementAndGet()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try deserialize(in.readAllBytes()) finally in.close()
  }

  /** List every sidecar under `data/_dv/` as data-dir-relative names
    * (VACUUM's sweep universe). */
  def listSidecars(fs: FileSystem, dataDir: HPath): Seq[String] = {
    val dir = new HPath(dataDir, DirName)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.collect {
      case st if st.getPath.getName.endsWith(".dv") =>
        s"$DirName/${st.getPath.getName}"
    }
  }
}

/** A grow-on-demand bitset over parquet row indexes within ONE data file.
  * Word layout matches `java.util.BitSet` (index i → word i>>6, bit
  * i&63) but stays a plain long array so (de)serialization is a straight
  * copy and `union`/`minus` are word-wise loops. */
final class DvBitmap(
    private[sources] var words: Array[Long],
    private var card: Long) extends Serializable {

  def this() = this(Array.emptyLongArray, 0L)

  def cardinality: Long = card

  def contains(idx: Long): Boolean = {
    val w = (idx >> 6).toInt
    w < words.length && ((words(w) >>> (idx & 63)) & 1L) == 1L
  }

  def set(idx: Long): Unit = {
    if (idx < 0)
      throw new IllegalArgumentException(
        s"gdisk: negative parquet row index $idx — corrupt row-index column")
    val w = (idx >> 6).toInt
    if (w >= words.length)
      words = java.util.Arrays.copyOf(words, math.max(w + 1, words.length * 2))
    val bit = 1L << (idx & 63)
    if ((words(w) & bit) == 0L) { words(w) |= bit; card += 1 }
  }

  /** [[set]] clamped against the file's recorded row count: an index at or
    * past `bound` means a corrupt row-index column or a stale manifest, and
    * silently honoring it would allocate `idx/64` longs (a 2^60 index is a
    * multi-exabyte "file" — and an instant executor OOM). Error cleanly
    * instead of letting the allocator discover it. */
  def setBounded(idx: Long, bound: Long): Unit = {
    if (idx < 0 || idx >= bound)
      throw new IllegalArgumentException(
        s"gdisk: parquet row index $idx outside the file's recorded row " +
          s"count $bound — corrupt row index or stale manifest stats")
    set(idx)
  }

  /** Highest set row index, or -1 when empty (the recorded-row-count
    * sanity check after a sidecar union). */
  def maxSetBit: Long = {
    var wi = words.length - 1
    while (wi >= 0 && words(wi) == 0L) wi -= 1
    if (wi < 0) -1L
    else (wi.toLong << 6) | (63 - java.lang.Long.numberOfLeadingZeros(words(wi)))
  }

  /** All set row indexes, ascending. */
  def iterator: Iterator[Long] =
    words.iterator.zipWithIndex.flatMap { case (w, wi) =>
      if (w == 0L) Iterator.empty
      else (0 until 64).iterator
        .filter(b => ((w >>> b) & 1L) == 1L)
        .map(b => (wi.toLong << 6) | b)
    }

  /** In-place union with `other`. */
  def unionWith(other: DvBitmap): Unit = {
    if (other.words.length > words.length)
      words = java.util.Arrays.copyOf(words, other.words.length)
    var i = 0
    var c = 0L
    while (i < words.length) {
      if (i < other.words.length) words(i) |= other.words(i)
      c += java.lang.Long.bitCount(words(i))
      i += 1
    }
    card = c
  }

  /** New bitmap of rows present here but NOT in `other` (CDC's "newly
    * deleted by this commit" / "revived by this restore" diff). */
  def diff(other: DvBitmap): DvBitmap = {
    val out = new Array[Long](words.length)
    var i = 0
    var c = 0L
    while (i < words.length) {
      out(i) = words(i) &
        ~(if (i < other.words.length) other.words(i) else 0L)
      c += java.lang.Long.bitCount(out(i))
      i += 1
    }
    new DvBitmap(out, c)
  }

  /** Row indexes present here but NOT in `other` — [[diff]]'s iterator
    * form (one subtraction implementation, two shapes). */
  def minus(other: DvBitmap): Iterator[Long] = diff(other).iterator
}

/** One manifest entry: sidecar (data-dir-relative) + deleted-row count,
  * so COUNT pushdown and CBO row estimates subtract without opening the
  * sidecar. */
case class DvEntry(dv: String, card: Long)

/** Per-file row-index harvest for the merge-on-read DELETE: aggregates the
  * matched rows' parquet row indexes (grouped by file) straight into a
  * [[DvBitmap]] and emits the serialized sidecar bytes. The buffer is
  * O(rows/8) packed bits with map-side partial aggregation — a DELETE
  * matching half of every 1 GB file costs each executor a ~1 MB bitmap per
  * file, where the previous `collect_list` harvest materialized tens of
  * millions of boxed longs in one aggregation row. `rowBound` (the largest
  * recorded row count among the straddling files) rejects corrupt indexes
  * before they allocate. */
case class DvBitmapAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    rowBound: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[DvBitmap] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dv_bitmap_agg requires a BIGINT row-index column, got $other")
    }

  override def createAggregationBuffer(): DvBitmap = new DvBitmap()

  override def update(buf: DvBitmap, input: InternalRow): DvBitmap = {
    val v = child.eval(input)
    if (v != null) buf.setBounded(v.asInstanceOf[Long], rowBound)
    buf
  }

  override def merge(buf: DvBitmap, other: DvBitmap): DvBitmap = {
    buf.unionWith(other)
    buf
  }

  override def eval(buf: DvBitmap): Any = DiskDv.serialize(buf)
  override def serialize(buf: DvBitmap): Array[Byte] = DiskDv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): DvBitmap =
    DiskDv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DvBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DvBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DvBitmapAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "dv_bitmap_agg"
}

/** Driver-side LRU cache of sidecar bytes for the paths that still ship
  * bytes in closures (CDC change groups, the delta write's old-DV map).
  * Sidecars are IMMUTABLE — a re-delete writes a new name — so the
  * (dataDir, rel) key can never serve stale bytes; the cache turns the
  * per-plan re-read of an unchanged trickle-upsert table's vectors into a
  * hit. Bounded by entry count AND total bytes (compressed bitmaps are
  * small, but thousands of wide ones must not pin the driver heap). */
private[graft] object DvSidecarCache {
  private val MaxEntries = 4096
  private val MaxBytes = 64L << 20
  private var totalBytes = 0L
  // access-ordered; eviction is an explicit LOOP after each insert —
  // LinkedHashMap.removeEldestEntry evicts at most ONE entry per put,
  // which lets a single wide sidecar pin the byte cap arbitrarily high
  private val map =
    new java.util.LinkedHashMap[String, Array[Byte]](64, 0.75f, true)
  // per-key single-flight: concurrent misses on one sidecar (parallel
  // CDC planning) share ONE filesystem read instead of racing and
  // discarding the losers' bytes
  private val inFlight =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CompletableFuture[Array[Byte]]]()

  private[graft] def currentBytes: Long = map.synchronized(totalBytes)

  def get(fs: FileSystem, dataDir: HPath, rel: String): Array[Byte] = {
    val key = s"$dataDir/$rel"
    map.synchronized(Option(map.get(key))) match {
      case Some(b) => b
      case None =>
        val mine = new java.util.concurrent.CompletableFuture[Array[Byte]]()
        val winner = inFlight.putIfAbsent(key, mine)
        if (winner != null) return winner.join() // someone else is reading
        try {
          val b = DiskDv.readBytes(fs, dataDir, rel)
          map.synchronized {
            if (!map.containsKey(key)) {
              totalBytes += b.length; map.put(key, b)
            }
            val it = map.entrySet().iterator()
            while ((map.size() > MaxEntries || totalBytes > MaxBytes) &&
              it.hasNext) {
              totalBytes -= it.next().getValue.length
              it.remove()
            }
          }
          mine.complete(b)
          b
        } catch {
          case e: Throwable => mine.completeExceptionally(e); throw e
        } finally inFlight.remove(key, mine)
    }
  }
}

/** Test observability for the DELETE harvest: the executed plan of the last
  * row-index aggregation, so specs can prove the bitmap aggregate (not a
  * `collect_list`) is what actually ran. */
private[graft] object DvDebug {
  @volatile var lastHarvestPlan: String = ""
}
