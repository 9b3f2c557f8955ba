package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Pins the REAL multimodal header decoder against golden byte vectors of
  * the actual file formats (spec-derived, not produced by our own payload
  * builders — so a builder/decoder bug pair cannot cancel out), plus the
  * builder↔decoder round-trip the q27 DuckDB oracle replays at scale. */
class MultimodalSpec extends SparkSuite {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG golden: canonical 1x1 IHDR decodes (spec offsets 16-23, big-endian)") {
    // real-world minimal PNG prefix: signature + IHDR for a 1x1 RGBA image
    // (the CRC 1F15C489 is the genuine IHDR crc32 of that chunk)
    val png = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 00 00 00 1F15C489 00")
    assert(Multimodal.decodeHeader(png) == Multimodal.Decoded("png", 1, 1))
    // large dims exercise all four BE bytes
    val big = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00012345 000A0B0C 08 06 00 00 00 00000000 00")
    assert(Multimodal.decodeHeader(big) == Multimodal.Decoded("png", 0x12345, 0xA0B0C))
  }

  test("GIF golden: logical screen descriptor is little-endian") {
    val gif = hexBytes("474946383961 0201 0301 F7 00 00 00") // GIF89a, w=0x0102 h=0x0103
    assert(Multimodal.decodeHeader(gif) == Multimodal.Decoded("gif", 258, 259))
    val gif87 = hexBytes("474946383761 4001 F000 00 00 00 00") // GIF87a 320x240
    assert(Multimodal.decodeHeader(gif87) == Multimodal.Decoded("gif", 320, 240))
  }

  test("JPEG golden: marker scan skips APP0/DQT/COM and reads SOF0 height-then-width") {
    // SOI, APP0(JFIF, len 16), COM(len 7), DQT(len 5), SOF0 640x480
    val jpg = hexBytes(
      "FFD8" +
        "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" + // APP0
        "FFFE 0007 68656C6C6F" + // COM "hello"
        "FFDB 0005 000102" + // (truncated) DQT-shaped segment
        "FFC0 0011 08 01E0 0280 03 012200 021101 031101" + // SOF0: h=480 w=640
        "00")
    assert(Multimodal.decodeHeader(jpg) == Multimodal.Decoded("jpeg", 640, 480))
    // progressive SOF2 is a frame header too
    val sof2 = hexBytes("FFD8 FFC2 0011 08 0064 00C8 03 012200 021101 031101 00")
    assert(Multimodal.decodeHeader(sof2) == Multimodal.Decoded("jpeg", 200, 100))
    // DHT (C4) must NOT be treated as a frame header
    val dht = hexBytes("FFD8 FFC4 0005 000102 FFC0 0011 08 0010 0020 03 012200 021101 031101 00")
    assert(Multimodal.decodeHeader(dht) == Multimodal.Decoded("jpeg", 32, 16))
  }

  test("non-image and truncated payloads decode as unknown") {
    assert(Multimodal.decodeHeader(null) == Multimodal.Decoded("unknown", 0, 0))
    assert(Multimodal.decodeHeader("plain text".getBytes("UTF-8")).format == "unknown")
    assert(Multimodal.decodeHeader(hexBytes("89504E47")).format == "unknown") // cut sig
    assert(Multimodal.decodeHeader(hexBytes("474946383961 01")).format == "unknown")
    assert(Multimodal.decodeHeader(hexBytes("FFD8FF")).format == "unknown")
  }

  test("column payload builders round-trip through the decoder (the q27 contract)") {
    import org.apache.spark.sql.Row
    val s = spark
    import s.implicits._
    val df = (0L until 60L).toDF("doc_id").withColumn("text", concat(lit("body-"), col("doc_id")))
    val w = (col("doc_id") % 900 + 100).cast("int")
    val h = (col("doc_id") % 500 + 50).cast("int")
    val tail = col("text").cast("binary")
    val payload = when(col("doc_id") % 3 === 0, Multimodal.pngPayload(w, h, tail))
      .when(col("doc_id") % 3 === 1, Multimodal.gifPayload(w, h, tail))
      .otherwise(Multimodal.jpegPayload(w, h, tail))
    val out = Multimodal.decodeMeta(spark, df.withColumn("payload", payload), "doc_id", "payload")
      .collect()
    assert(out.length == 60)
    out.foreach { m =>
      val fmt = (m.id % 3) match { case 0 => "png"; case 1 => "gif"; case _ => "jpeg" }
      assert(m.format == fmt, s"id=${m.id}")
      assert(m.width == (m.id % 900 + 100).toInt && m.height == (m.id % 500 + 50).toInt,
        s"id=${m.id}: ${m.width}x${m.height}")
      val hdr = fmt match { case "png" => 33; case "gif" => 13; case _ => 39 }
      assert(m.n_bytes == hdr + s"body-${m.id}".getBytes("UTF-8").length, s"id=${m.id}")
    }
  }

  test("byte-histogram feature: Scala decoder path ≡ Catalyst twin (the q31 contract)") {
    val s = spark
    import s.implicits._
    // payloads spanning all 8 bins, incl. an empty one (the sequence guard)
    val rows = Seq(
      0L -> Array.empty[Byte],
      1L -> Array.tabulate(256)(_.toByte), // uniform: every bin = 32
      2L -> "hello wbot — höhößü".getBytes("UTF-8"),
      3L -> hexBytes("89504E470D0A1A0A FF 00 1F 20 3F 40 5F 60 7F 80 9F A0 BF C0 DF E0"))
    val df = rows.toDF("id", "payload")
      .withColumn("__high", Multimodal.highNibbles(hex(col("payload"))))
    val bins = (0 until 8).map(j => Multimodal.byteHistCountCol("__high", j).as(s"b$j"))
    val got = df.select(col("id") +: bins: _*).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toVector).toMap
    rows.foreach { case (id, bytes) =>
      val cnt = new Array[Long](8)
      bytes.foreach(b => cnt((b & 0xff) >>> 5) += 1)
      assert(got(id) == cnt.toVector, s"id=$id")
      // and the normalized decoder feature is exactly cnt/total
      val feat = Multimodal.byteHistogramFeature(bytes)
      val n = bytes.length
      (0 until 8).foreach { j =>
        val want = if (n == 0) 0.0f else cnt(j).toFloat / n
        assert(feat(j) == want, s"id=$id bin=$j")
      }
    }
  }
}
