package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video ride as opaque `binary`
 * columns with typed metadata; decode / feature-extraction runs as a
 * partition-mapped batch stage over the binary payloads.
 *
 * The HEADER decode is REAL: [[decodeHeader]] parses PNG (IHDR), GIF
 * (logical screen descriptor) and JPEG (marker scan to the SOF frame
 * header) dimensions with pure byte arithmetic — no image library needed,
 * pinned by golden byte vectors (MultimodalSpec) and a DuckDB round-trip
 * oracle (SparkEntry q27). The FEATURE vector is a real (if simple)
 * content feature — the normalized 8-bin byte histogram of the payload
 * ([[byteHistogramFeature]], bin = byte >>> 5) — whose formula is replayed
 * bin-exactly by a DuckDB oracle (SparkEntry q31) and pinned Scala ≡
 * Catalyst in MultimodalSpec. A LEARNED extractor still cannot exist in
 * this container; the histogram is the honest stand-in with the same
 * Spark-side contract (schema, batch shape, partition-parallel decode).
 */
object Multimodal {

  final case class MediaMeta(
      id: Long,
      n_bytes: Long,
      magic_hex: String, // first 4 payload bytes, hex — format sniffing
      format: String, // png | gif | jpeg | unknown (header-decoded)
      width: Int, height: Int, // real header decode; 0 when unknown
      feature: Array[Float]) // 8-bin normalized byte histogram (q31-oracled formula)

  final case class Decoded(format: String, width: Int, height: Int)
  private val unknown = Decoded("unknown", 0, 0)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** PNG signature 89 50 4E 47 0D 0A 1A 0A + first chunk must be IHDR:
    * width = bytes 16-19 (big-endian), height = 20-23. */
  private def decodePng(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 24) return None
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (u8(b, i) != sig(i)) return None; i += 1 }
    // chunk type at 12-15 must spell IHDR
    if (u8(b, 12) != 'I' || u8(b, 13) != 'H' || u8(b, 14) != 'D' || u8(b, 15) != 'R') return None
    Some(Decoded("png", be32(b, 16), be32(b, 20)))
  }

  /** GIF87a/GIF89a: logical screen descriptor — width LE16 @6, height @8. */
  private def decodeGif(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 10) return None
    val h = new String(b, 0, 6, "ISO-8859-1")
    if (h != "GIF87a" && h != "GIF89a") return None
    Some(Decoded("gif", le16(b, 6), le16(b, 8)))
  }

  /** JPEG: SOI (FF D8) then a marker scan — skip fill bytes and non-frame
    * segments by their big-endian lengths until a SOF marker (C0-CF minus
    * C4/C8/CC), whose payload is [len][precision][height BE16][width BE16]. */
  private def decodeJpeg(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced — not a marker
      var j = i
      while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val m = u8(b, j)
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (j + 8 >= b.length) return None
        return Some(Decoded("jpeg", be16(b, j + 6), be16(b, j + 4)))
      } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        i = j + 1 // standalone marker
      } else {
        if (j + 2 >= b.length) return None
        i = j + 1 + be16(b, j + 1) // segment length includes itself
      }
    }
    None
  }

  /** Real header decode: format + dimensions from the payload bytes. */
  def decodeHeader(bytes: Array[Byte]): Decoded =
    if (bytes == null) unknown
    else decodePng(bytes)
      .orElse(decodeGif(bytes))
      .orElse(decodeJpeg(bytes))
      .getOrElse(unknown)

  /** 8-dim content feature: the normalized byte histogram, bin j = share of
    * payload bytes whose top 3 bits equal j. Deterministic, O(bytes), and
    * SQL-replayable — [[byteHistCountCol]] computes the same bin COUNTS in
    * pure Catalyst and SparkEntry q31's DuckDB oracle replays them
    * bin-exactly (the one feature formula three independent engines agree
    * on). Stand-in for a learned extractor (none can exist in this
    * container) with the real extractor's plumbing contract. */
  def byteHistogramFeature(bytes: Array[Byte]): Array[Float] = {
    val n = if (bytes == null) 0 else bytes.length
    val cnt = new Array[Int](8)
    var i = 0
    while (i < n) { cnt((bytes(i) & 0xff) >>> 5) += 1; i += 1 }
    if (n == 0) new Array[Float](8)
    else Array.tabulate(8)(j => cnt(j).toFloat / n)
  }

  /** High nibbles of a hex string — one char per payload byte. The high
    * nibble alone carries the byte's top 3 bits (bin = high_nibble div 2),
    * and high nibbles sit at the odd 1-based positions, so a single global
    * capture-replace halves the string once and every bin count below is a
    * codegen'd translate over it. (A first cut used
    * filter(sequence(1, len, 2), ...) — an interpreted lambda per byte per
    * bin, measured 26 s over sf0.1's documents; this shape runs in ~1 s.) */
  def highNibbles(hexCol: Column): Column = regexp_replace(hexCol, "(.).", "$1")

  /** Catalyst twin of [[byteHistogramFeature]]'s bin counts: number of bytes
    * whose value >>> 5 == j, counted over the HIGH-NIBBLE string (a column
    * named `highCol`, from [[highNibbles]]) as length minus
    * length-after-deleting the bin's two nibble chars — `translate` and
    * `length` are codegen'd, so the hot path is one regex pass plus 8
    * O(bytes) scans. Both Spark and DuckDB emit UPPERCASE hex, so the q31
    * oracle replays the same alphabet (it keeps the positional list_filter
    * form — an independent derivation of the same counts). */
  def byteHistCountCol(highCol: String, j: Int): Column = {
    require(j >= 0 && j < 8, s"bin out of range: $j")
    val chars = "0123456789ABCDEF".substring(2 * j, 2 * j + 2)
    expr(s"CAST(length($highCol) - length(translate($highCol, '$chars', '')) AS BIGINT)")
  }

  def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    val magic = (if (bytes == null) Array.empty[Byte] else bytes.take(4))
      .map(b => f"$b%02x").mkString
    val d = decodeHeader(bytes)
    MediaMeta(id, n.toLong, magic, d.format, d.width, d.height, byteHistogramFeature(bytes))
  }

  /** Decode stage: partition-mapped over (id, payload) batches — the decode
    * work is embarrassingly parallel and stays off the driver. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  /** Pure-expression metadata (portable to a SQL oracle): byte length +
    * magic bytes of a binary column. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      lower(hex(substring(col(binCol), 1, 4))).as("magic_hex"))

  // ---- synthetic valid-header payload builders (pure column ops, so a SQL
  // oracle can construct byte-identical payloads) ----

  /** int column → 4-byte big-endian binary. */
  def be32Col(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  /** int column → 2-byte big-endian binary. */
  def be16Col(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  /** int column → 2-byte little-endian binary. Both bytes explicitly masked:
    * an unmasked high byte of a value ≥ 65536 would hex to >2 chars, and the
    * resulting odd-length concat makes `unhex` return null SILENTLY. */
  def le16Col(c: Column): Column =
    unhex(concat(lpad(hex(c % 256), 2, "0"),
      lpad(hex(floor(c / 256).cast("int") % 256), 2, "0")))

  /** Valid PNG header (sig + IHDR chunk with the given dims + zero CRC)
    * followed by `tail` — 33 header bytes. */
  def pngPayload(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be32Col(w), be32Col(h), unhex(lit("0806000000" + "00000000")), tail)

  /** Valid GIF89a header (logical screen descriptor) + tail — 13 bytes. */
  def gifPayload(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("474946383961")), le16Col(w), le16Col(h),
      unhex(lit("F70000")), tail)

  /** Valid JPEG SOI + APP0(JFIF) + SOF0 header + tail — 39 bytes. The SOF0
    * is NOT the first segment, so the decoder's marker scan is exercised. */
  def jpegPayload(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("FFD8" + "FFE000104A46494600010100000100010000" + "FFC00011" + "08")),
      be16Col(h), be16Col(w), unhex(lit("03012200021101031101")), tail)
}
