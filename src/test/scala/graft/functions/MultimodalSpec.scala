package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.functions.Multimodal.VideoCodecs

class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("MP4 writer/parser round-trips brand, timescale, duration and dims") {
    val bytes = VideoCodecs.encodeMp4Header("isom", timescale = 30000L,
      durationTicks = 90000L, width = 1920, height = 1080,
      mdat = Array.fill[Byte](100)(7))
    assert(Multimodal.sniffFormat(bytes) == "mp4")
    val info = VideoCodecs.parseMp4(bytes).get
    assert(info.brand == "isom")
    assert(info.timescale == 30000L)
    assert(info.durationS.contains(3.0))
    assert(info.nTracks == 1)
    assert(info.width.contains(1920))
    assert(info.height.contains(1080))
    // documented fixed header size: 244 bytes + mdat payload
    assert(bytes.length == 244 + 100)
  }

  test("MP4 parser handles version-1 mvhd/tkhd (64-bit times) and " +
    "largesize boxes") {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tag.getBytes("ASCII") ++ payload
    val ftyp = box("ftyp", "mp42".getBytes("ASCII") ++ be32(0))
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(600) ++ be64(1200) ++ new Array[Byte](80))
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
      be32(1) ++ be32(0) ++ be64(1200) ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ new Array[Byte](36) ++
      be32(640L << 16) ++ be32(480L << 16))
    // wrap moov in a 64-bit largesize box (size==1 + 8-byte largesize)
    val moovPayload = mvhd ++ box("trak", tkhd)
    val moov = be32(1) ++ "moov".getBytes("ASCII") ++
      be64(moovPayload.length + 16L) ++ moovPayload
    val info = VideoCodecs.parseMp4(ftyp ++ moov).get
    assert(info.brand == "mp42")
    assert(info.timescale == 600L)
    assert(info.durationS.contains(2.0))
    assert(info.width.contains(640) && info.height.contains(480))
  }

  test("MP4 parser never throws on truncated or corrupt blobs") {
    val good = VideoCodecs.encodeMp4Header("isom", 600L, 600L, 64, 64)
    for (n <- 0 to good.length) {
      val truncated = java.util.Arrays.copyOf(good, n)
      VideoCodecs.parseMp4(truncated) // must not throw
    }
    assert(VideoCodecs.parseMp4("not a video".getBytes) === None)
    // declared box size larger than the blob: walk ends cleanly
    val lying = good.clone()
    lying(0) = 0x7f.toByte
    VideoCodecs.parseMp4(lying)
  }

  test("describe reports real MP4 dims; describeVideo keeps nulls for " +
    "non-video rows") {
    import spark.implicits._
    val mp4 = VideoCodecs.encodeMp4Header("isom", 1000L, 2500L, 320, 240)
    val media = Seq((1L, mp4), (2L, "plain text".getBytes))
      .toDF("id", "data")
    val d = Multimodal.describe(media, "id", "data")
      .select($"media_id", $"format", $"width", $"height")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(d(1L) == (("mp4", 320, 240)))
    assert(d(2L)._1 == "unknown")
    val v = Multimodal.describeVideo(media, "id", "data").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(v(1L).getString(3) == "isom")
    assert(v(1L).getDouble(5) == 2.5)
    assert(v(1L).getInt(7) == 320 && v(1L).getInt(8) == 240)
    assert(v(2L).isNullAt(3) && v(2L).isNullAt(5) && v(2L).isNullAt(7))
  }
}
