package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video ride as opaque `binary`
 * columns with typed metadata; decode / feature-extraction runs as a
 * partition-mapped batch stage over the binary payloads.
 *
 * The actual codec is STUBBED (this container has no image/audio libraries):
 * [[fakeDecode]] is a deterministic placeholder that derives "dimensions"
 * and a tiny "feature vector" from the bytes, so the Spark-side contract —
 * schema, batch shape, partition-parallel decode, metadata projection — is
 * real and tested; swap `fakeDecode` for a real codec (e.g. a JNI/Pandas-UDF
 * decode stage) without touching the plumbing.
 */
object Multimodal {

  final case class MediaMeta(
      id: Long,
      n_bytes: Long,
      magic_hex: String, // first 4 payload bytes, hex — format sniffing
      width: Int, height: Int, // stubbed decode output
      feature: Array[Float]) // stubbed 8-dim feature

  /** Deterministic stand-in for a real decoder: dims + features from bytes. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    val magic = (if (bytes == null) Array.empty[Byte] else bytes.take(4))
      .map(b => f"$b%02x").mkString
    var h = 1125899906842597L
    var i = 0
    while (i < n) { h = 31 * h + bytes(i); i += 1 }
    val feat = Array.tabulate(8)(j => (((h >>> (j * 8)) & 0xff).toInt - 128) / 128.0f)
    MediaMeta(id, n.toLong, magic, 64 + (math.abs(h) % 960).toInt,
      64 + (math.abs(h >> 10) % 960).toInt, feat)
  }

  /** Decode stage: partition-mapped over (id, payload) batches — the decode
    * work is embarrassingly parallel and stays off the driver. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }

  /** Pure-expression metadata (portable to a SQL oracle): byte length +
    * magic bytes of a binary column. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      lower(hex(substring(col(binCol), 1, 4))).as("magic_hex"))
}
