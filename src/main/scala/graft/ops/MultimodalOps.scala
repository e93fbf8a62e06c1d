package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed batch-wise per partition.
  *
  * The Spark-side structure is real — schema, partition-parallel batch
  * processing, typed output rows. The media *decode* itself is STUBBED
  * (`decodeStub`): the container has no image/audio codecs, so the stub
  * derives deterministic fake dimensions/features from the payload bytes.
  * Swapping in a real decoder (JNI/FFI or a vectorized Python worker via
  * `mapInPandas` on PySpark) changes only the function body — the plumbing,
  * batch shape, and schema stay as tested here.
  */
object MultimodalOps {

  /** Typed media row: payload + extracted metadata. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      checksum: String,
      width: Int,
      height: Int,
      feat_mean: Double)

  /** Wrap a text table as a binary media table (fixture adapter: the driver
    * data has no real media; payload = UTF-8 bytes). */
  def asBinaryPayload(df: DataFrame, id: String, payloadSrc: String): DataFrame =
    df.select(
      col(id).cast("long").as("doc_id"),
      encode(col(payloadSrc), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake of an image decode. Replace the body
    * with a real codec to productionize; signature and batch shape stay. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val h = graft.functions.SimHash64.fnv1a64(payload)
    val width = 64 + (math.abs(h) % 1024).toInt
    val height = 64 + (math.abs(h >> 32) % 1024).toInt
    // "feature" = mean byte value — a stand-in for a pooled embedding
    val mean = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / payload.length
    (width, height, mean)
  }

  /** Partition-parallel batch decode: one task per partition, rows streamed
    * through the decoder — the Scala analogue of `mapInPandas` batches. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          md.reset()
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          val (w, h, mean) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, sum, w, h, mean)
        }
      }
  }
}
