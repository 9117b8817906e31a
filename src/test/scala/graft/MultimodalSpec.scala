package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Header-decode specs: golden byte arrays built HERE with ByteBuffer /
  * hand-laid hex — independent of the asBinary* synthesis expressions — so
  * the parsers are validated against the container specs, not against the
  * fixture generator that feeds the driver gate. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaFrom(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "bytes")

  // ---- image: golden containers -------------------------------------

  test("mediaDims parses a golden PNG IHDR (big-endian, fixed offset)") {
    // signature + IHDR(len 13) with width=640 height=480
    val png = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "0802000000" + "00000000")
    val r = Multimodal.mediaDims(mediaFrom(Seq((1L, png)))).collect().head
    assert(r.getString(1) == "png" && r.getLong(2) == 640L && r.getLong(3) == 480L)
  }

  test("mediaDims walks golden JPEG segments (APP0+COM before SOF0)") {
    // SOI; APP0 len 16; COM len 7; SOF0 len 17 with height=123 width=77
    val jpg = hexBytes("FFD8" +
      "FFE0" + "0010" + "4A46494600" + "00" * 9 +
      "FFFE" + "0007" + "4141414141" +
      "FFC0" + "0011" + "08" + "007B" + "004D" + "03" + "011100021101031101")
    val r = Multimodal.mediaDims(mediaFrom(Seq((1L, jpg)))).collect().head
    assert(r.getString(1) == "jpeg" && r.getLong(2) == 77L && r.getLong(3) == 123L)
  }

  test("mediaDims falls back to unknown/-1 on unrecognized bytes") {
    val r = Multimodal.mediaDims(mediaFrom(Seq((1L, "not an image".getBytes))))
      .collect().head
    assert(r.getString(1) == "unknown" && r.getLong(2) == -1L && r.getLong(3) == -1L)
  }

  // ---- audio: golden WAV built with little-endian ByteBuffer ---------

  private def goldenWav(channels: Int, rate: Int, bits: Int,
                        dataBytes: Int, listLen: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val listPad = listLen % 2
    val total = 12 + 8 + listLen + listPad + 24 + 8 + dataBytes
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(total - 8); bb.put("WAVE".getBytes)
    bb.put("LIST".getBytes); bb.putInt(listLen)
    bb.put(Array.fill(listLen + listPad)(0x20.toByte))
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * bits / 8); bb.putShort((channels * bits / 8).toShort)
    bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataBytes)
    bb.put(Array.fill(dataBytes)(0x55.toByte))
    bb.array()
  }

  test("audioMeta parses a golden WAV (LE fields, even LIST chunk)") {
    val wav = goldenWav(channels = 2, rate = 44100, bits = 16, dataBytes = 40, listLen = 6)
    val r = Multimodal.audioMeta(mediaFrom(Seq((1L, wav)))).collect().head
    assert(r.getString(1) == "wav")
    assert(r.getLong(2) == 2L && r.getLong(3) == 44100L && r.getLong(4) == 16L)
    assert(r.getLong(5) == 10L) // 40 bytes / (2ch * 2B) = 10 sample frames
  }

  test("audioMeta honors RIFF even-byte padding on an odd-sized chunk") {
    // listLen=7 → 1 pad byte; a parser that skips by raw size misreads
    // the fmt tag one byte early and returns -1s
    val wav = goldenWav(channels = 1, rate = 8000, bits = 24, dataBytes = 9, listLen = 7)
    val r = Multimodal.audioMeta(mediaFrom(Seq((1L, wav)))).collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 8000L && r.getLong(4) == 24L)
    assert(r.getLong(5) == 3L) // floor(9 / 3)
  }

  test("audioMeta falls back to unknown/-1 on non-RIFF bytes") {
    val r = Multimodal.audioMeta(mediaFrom(Seq((1L, "definitely not a wav file ........".getBytes))))
      .collect().head
    assert(r.getString(1) == "unknown" && r.getLong(2) == -1L && r.getLong(5) == -1L)
  }

  test("audioMeta round-trips asBinaryAudio and matches the doc_id formulas") {
    val docs = (0L until 24L).map(i => (i, "x" * (10 + i.toInt * 7))).toDF("doc_id", "text")
    val got = Multimodal.audioMeta(Multimodal.asBinaryAudio(docs))
      .orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val ch = 1 + id % 2
      val rate = Seq(8000L, 16000L, 22050L, 44100L)((id % 4).toInt)
      val bits = 8 * (1 + id % 3)
      val dataLen = 10 + id * 7
      assert(r.getString(1) == "wav")
      assert(r.getLong(2) == ch, s"channels id=$id")
      assert(r.getLong(3) == rate, s"rate id=$id")
      assert(r.getLong(4) == bits, s"bits id=$id")
      assert(r.getLong(5) == dataLen / (ch * bits / 8), s"frames id=$id")
    }
  }

  // ---- raster pixels: golden netpbm images built by hand -------------

  test("rasterPixels decodes a golden P6 PPM (header parse + channel sums)") {
    // 2x2 RGB, maxval 255; pixels laid out row-major R,G,B:
    // (10,20,30) (40,50,60) (70,80,90) (200,210,255)
    val px = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 255).map(_.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val r = Multimodal.rasterPixels(mediaFrom(Seq((1L, ppm)))).collect().head
    assert(r.getString(1) == "ppm" && r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 4L)
    assert(r.getLong(5) == 10 + 40 + 70 + 200, "sum_r")
    assert(r.getLong(6) == 20 + 50 + 80 + 210, "sum_g")
    assert(r.getLong(7) == 30 + 60 + 90 + 255, "sum_b")
  }

  test("rasterPixels decodes a golden P5 PGM and reports gray on all channels") {
    // 3x1 grayscale with multi-digit width to exercise the ASCII parse
    val pgm = "P5\n3 1\n255\n".getBytes("US-ASCII") ++ Array(0, 128, 255).map(_.toByte)
    val r = Multimodal.rasterPixels(mediaFrom(Seq((1L, pgm)))).collect().head
    assert(r.getString(1) == "pgm" && r.getLong(2) == 3L && r.getLong(3) == 1L)
    assert(r.getLong(5) == 383L && r.getLong(6) == 383L && r.getLong(7) == 383L)
  }

  test("rasterPixels header parse is positional, not fixed-offset") {
    // same image twice with different digit widths: 10x2 vs 2x10 — a
    // fixed-offset reader (netpbm headers vary byte length with the
    // decimal dims) gets at least one of them wrong
    val a = "P5\n10 2\n255\n".getBytes("US-ASCII") ++ Array.fill(20)(7.toByte)
    val c = "P5\n2 10\n255\n".getBytes("US-ASCII") ++ Array.fill(20)(7.toByte)
    val rows = Multimodal.rasterPixels(mediaFrom(Seq((1L, a), (2L, c))))
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(2) == 10L && rows(0).getLong(3) == 2L)
    assert(rows(1).getLong(2) == 2L && rows(1).getLong(3) == 10L)
    assert(rows.forall(_.getLong(5) == 140L))
  }

  test("rasterPixels falls back to unknown/-1 on truncated or foreign bytes") {
    // truncated raster (header claims 4x4 gray, only 3 bytes present) and
    // a non-pnm payload both degrade instead of failing the scan
    val short = "P5\n4 4\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val rows = Multimodal.rasterPixels(mediaFrom(Seq(
        (1L, short), (2L, "plain text".getBytes))))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getString(1) == "unknown" && r.getLong(4) == -1L && r.getLong(5) == -1L)
    }
  }

  test("rasterPixels round-trips asBinaryRaster and matches the doc_id formulas") {
    val docs = (0L until 24L).map(i => (i, "unused")).toDF("doc_id", "text")
    val got = Multimodal.rasterPixels(Multimodal.asBinaryRaster(docs))
      .orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (1 + id % 12, 1 + (id * 5) % 9)
      val npix = w * h
      def chanSum(c: Long): Long =
        (0L until npix).map(p => (id * 31 + p * 7 + c * 54) % 256).sum
      assert(r.getString(1) == (if (id % 2 == 0) "ppm" else "pgm"), s"fmt id=$id")
      assert(r.getLong(2) == w && r.getLong(3) == h && r.getLong(4) == npix, s"dims id=$id")
      if (id % 2 == 0) {
        assert(r.getLong(5) == chanSum(0), s"sum_r id=$id")
        assert(r.getLong(6) == chanSum(1), s"sum_g id=$id")
        assert(r.getLong(7) == chanSum(2), s"sum_b id=$id")
      } else {
        val g = chanSum(0)
        assert(r.getLong(5) == g && r.getLong(6) == g && r.getLong(7) == g, s"gray id=$id")
      }
    }
  }

  test("header decoders are pure projections — no Exchange in either plan") {
    val docs = (0L until 8L).map(i => (i, "abc " * 10)).toDF("doc_id", "text")
    for (df <- Seq(Multimodal.mediaDims(Multimodal.asBinaryMedia(docs)),
                   Multimodal.audioMeta(Multimodal.asBinaryAudio(docs)))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "header decode shuffled:\n" + plan.take(1200))
    }
  }

  test("rasterPixels: codegen'd posexplode + partial-agg-before-exchange shape (r12)") {
    // r12 rewrote the per-byte fold (interpreted `aggregate` lambda —
    // CodegenFallback) into posexplode + a real hash aggregation. The plan
    // contract: the per-byte Generate feeds a PARTIAL HashAggregate BELOW
    // the single exchange, so only per-doc partial rows ever shuffle, and
    // no higher-order ArrayAggregate lambda remains in the plan.
    val docs = (0L until 8L).map(i => (i, "abc " * 10)).toDF("doc_id", "text")
    val df = Multimodal.rasterPixels(Multimodal.asBinaryRaster(docs))
    val plan = df.queryExecution.optimizedPlan.toString
    // the per-BYTE ArrayAggregate fold must stay gone; the per-CHUNK
    // `transform` lambda (runs once per 64 KiB slice, bounding per-row
    // memory) is the one higher-order function the shape allows
    assert(!plan.contains("aggregate("),
      "interpreted fold lambda back in the pixel path:\n" + plan.take(1200))
    val phys = df.queryExecution.executedPlan.toString
    val gen1 = phys.indexOf("Generate posexplode")
    assert(gen1 >= 0, "pixel explode missing:\n" + phys.take(1200))
    assert(phys.indexOf("Generate posexplode", gen1 + 1) > gen1,
      "chunk explode missing (per-row memory no longer bounded):\n" + phys.take(1200))
    val partialIdx = phys.indexOf("partial_sum")
    val exchangeIdx = phys.indexOf("Exchange")
    assert(partialIdx >= 0, "no partial aggregation in the pixel plan")
    // executedPlan prints top-down: the exchange must appear ABOVE (before)
    // the partial agg, i.e. partials are computed map-side below it
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "per-byte rows would cross the exchange unaggregated:\n" + phys.take(1200))
  }

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}
