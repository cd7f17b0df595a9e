package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import graft.multimodal.MediaCodec

/** Real-decoder spec: MediaCodec parses HAND-WRITTEN golden bytes
  * (built here straight from the format specs, independently of
  * MediaCodec.render), so the generator and the parser cannot share a
  * consistent-but-wrong reading of an offset or endianness. Also pins
  * render→decode round trips against the corpus formulas and the
  * RIFF chunk walk on non-canonical layouts.
  */
class MultimodalSpec extends AnyFunSuite {

  test("golden BMP: hand-built 2x2 24bpp header parses exactly") {
    val rowSize = 8 // ((2*3 + 3)/4)*4
    val buf = ByteBuffer.allocate(54 + rowSize * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(70).putInt(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(2)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val m = MediaCodec.decode(buf.array())
    assert(m.format == "bmp" && m.width.contains(2) && m.height.contains(2)
      && m.channels.contains(3))
  }

  test("golden BMP: top-down negative height reads as absolute") {
    val buf = ByteBuffer.allocate(70).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(70).putInt(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(-2) // top-down DIB
    buf.putShort(1).putShort(32)
    val m = MediaCodec.decode(buf.array())
    assert(m.height.contains(2) && m.channels.contains(4))
  }

  test("golden PNG: hand-built IHDR (3x5, truecolor) parses exactly") {
    val out = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(3).putInt(5)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC (not verified by the header parser)
    val m = MediaCodec.decode(out.array())
    assert(m.format == "png" && m.width.contains(3) && m.height.contains(5)
      && m.channels.contains(3))
  }

  test("golden WAV: chunk walk survives a LIST chunk before fmt") {
    val dataBytes = 16 // 4 frames, stereo 16-bit
    val buf = ByteBuffer.allocate(12 + 14 + 24 + 8 + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(58).put("WAVE".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(6)
      .put(Array.fill[Byte](6)(0x20)) // a metadata chunk the walk must skip
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(2).putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    buf.put(Array.fill[Byte](dataBytes)(1))
    val m = MediaCodec.decode(buf.array())
    assert(m.format == "wav" && m.channels.contains(2)
      && m.sampleRate.contains(44100) && m.durationMs.contains(0L))
  }

  test("render → decode round trip matches the corpus formulas") {
    for (id <- 0L to 30L) {
      val m = MediaCodec.decode(MediaCodec.render(id))
      assert(m.format == MediaCodec.kindOf(id), s"id $id")
      MediaCodec.kindOf(id) match {
        case "bmp" =>
          val (w, h) = MediaCodec.bmpDims(id)
          assert(m.width.contains(w) && m.height.contains(h)
            && m.channels.contains(3), s"id $id: $m")
        case "png" =>
          val (w, h) = MediaCodec.pngDims(id)
          assert(m.width.contains(w) && m.height.contains(h)
            && m.channels.contains(3), s"id $id: $m")
        case _ =>
          val (c, r, n) = MediaCodec.wavShape(id)
          assert(m.channels.contains(c) && m.sampleRate.contains(r)
            && m.durationMs.contains(n * 1000L / r), s"id $id: $m")
      }
    }
  }

  test("rendered PNGs are fully valid: ImageIO can decode the pixels") {
    // javax.imageio ships with the JDK — an independent reference
    // decoder for the generator side
    val (w, h) = MediaCodec.pngDims(1L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaCodec.render(1L)))
    assert(img != null, "ImageIO rejected the rendered PNG")
    assert(img.getWidth == w && img.getHeight == h)
  }

  test("rendered BMPs are fully valid: ImageIO agrees on dimensions") {
    val (w, h) = MediaCodec.bmpDims(0L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaCodec.render(0L)))
    assert(img != null, "ImageIO rejected the rendered BMP")
    assert(img.getWidth == w && img.getHeight == h)
  }

  test("unknown magic and truncated payloads throw, not corrupt") {
    intercept[Exception](MediaCodec.decode(Array[Byte](1, 2, 3)))
    intercept[Exception](MediaCodec.decode(Array.fill[Byte](32)('X')))
  }
}
