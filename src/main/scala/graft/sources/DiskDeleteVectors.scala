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
    val in = fs.open(sidecar(dataDir, rel))
    try deserialize(in.readAllBytes()) finally in.close()
  }

  def readBytes(fs: FileSystem, dataDir: HPath, rel: String): Array[Byte] = {
    val in = fs.open(sidecar(dataDir, rel))
    try in.readAllBytes() finally in.close()
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
    val w = (idx >> 6).toInt
    if (w >= words.length)
      words = java.util.Arrays.copyOf(words, math.max(w + 1, words.length * 2))
    val bit = 1L << (idx & 63)
    if ((words(w) & bit) == 0L) { words(w) |= bit; card += 1 }
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

  /** Row indexes present here but NOT in `other` (CDC's "newly deleted
    * by this commit" / "revived by this restore" diff). */
  def minus(other: DvBitmap): Iterator[Long] =
    words.iterator.zipWithIndex.flatMap { case (w0, wi) =>
      val w = w0 & ~(if (wi < other.words.length) other.words(wi) else 0L)
      if (w == 0L) Iterator.empty
      else (0 until 64).iterator
        .filter(b => ((w >>> b) & 1L) == 1L)
        .map(b => (wi.toLong << 6) | b)
    }
}

/** One manifest entry: sidecar (data-dir-relative) + deleted-row count,
  * so COUNT pushdown and CBO row estimates subtract without opening the
  * sidecar. */
case class DvEntry(dv: String, card: Long)
