package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pins the container formats against HAND-WRITTEN byte fixtures (not
  * the encoders — a symmetric encode/decode bug cannot cancel out
  * here), plus round-trip properties over generated content.
  */
class MediaCodecSpec extends AnyFunSuite {
  import MediaCodec._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---- WAV: hand-built 44-byte header + two samples 1000, -2 ----
  private val wavFixture: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ b(40, 0, 0, 0) ++ // riff size 36+4
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ b(16, 0, 0, 0) ++
      b(1, 0) ++ b(1, 0) ++            // PCM, mono
      b(0x40, 0x1f, 0, 0) ++           // 8000 Hz
      b(0x80, 0x3e, 0, 0) ++           // byte rate 16000
      b(2, 0) ++ b(16, 0) ++           // block align, bits
      "data".getBytes("US-ASCII") ++ b(4, 0, 0, 0) ++
      b(0xe8, 0x03) ++ b(0xfe, 0xff)   // 1000, -2 little-endian

  test("decodeWav parses a hand-written PCM fixture") {
    val w = decodeWav(wavFixture)
    assert(w.channels == 1 && w.sampleRate == 8000 && w.bitsPerSample == 16)
    assert(w.samples.toSeq == Seq(1000, -2))
  }

  test("decodeWav skips unknown chunks and handles odd-size word alignment") {
    // insert a 3-byte junk chunk (padded to 4) between fmt and data
    val before = wavFixture.slice(0, 36)
    val data = wavFixture.slice(36, wavFixture.length)
    val junk = "LIST".getBytes("US-ASCII") ++ b(3, 0, 0, 0) ++ b(9, 9, 9, 0)
    val fixed = before ++ junk ++ data
    // patch riff size (not actually validated, but keep it honest)
    val w = decodeWav(fixed)
    assert(w.samples.toSeq == Seq(1000, -2))
  }

  test("decodeWav rejects non-PCM and truncated payloads") {
    val nonPcm = wavFixture.clone(); nonPcm(20) = 3 // IEEE float format tag
    intercept[IllegalArgumentException](decodeWav(nonPcm))
    intercept[IllegalArgumentException](decodeWav(wavFixture.take(30)))
  }

  // ---- BMP: hand-built 2x2 24-bit, bottom-up, stride 8 (2*3 -> pad 2) ----
  // pixels top-down: (255,0,0) (0,255,0) / (0,0,255) (10,20,30)
  private val bmpFixture: Array[Byte] =
    b('B', 'M') ++ b(70, 0, 0, 0) ++ b(0, 0, 0, 0) ++ b(54, 0, 0, 0) ++
      b(40, 0, 0, 0) ++ b(2, 0, 0, 0) ++ b(2, 0, 0, 0) ++
      b(1, 0) ++ b(24, 0) ++ b(0, 0, 0, 0) ++ b(16, 0, 0, 0) ++
      b(0, 0, 0, 0) ++ b(0, 0, 0, 0) ++ b(0, 0, 0, 0) ++ b(0, 0, 0, 0) ++
      // bottom row first (BGR): (0,0,255)->B=255.. wait BGR of (0,0,255) = 255,0,0
      b(255, 0, 0) ++ b(30, 20, 10) ++ b(0, 0) ++ // row y=1: (0,0,255),(10,20,30) + pad
      b(0, 0, 255) ++ b(0, 255, 0) ++ b(0, 0)     // row y=0: (255,0,0),(0,255,0) + pad

  test("decodeBmp parses a hand-written bottom-up 24-bit fixture with stride") {
    val img = decodeBmp(bmpFixture)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.map(_ & 0xff).toSeq ==
      Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30))
  }

  test("decodeBmp honors a negative (top-down) height") {
    val td = bmpFixture.clone()
    // height = -2 little-endian at offset 22
    td(22) = 0xfe.toByte; td(23) = 0xff.toByte; td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val img = decodeBmp(td)
    // rows now read in stored order: stored row 0 becomes top row
    assert(img.rgb.map(_ & 0xff).toSeq ==
      Seq(0, 0, 255, 10, 20, 30, 255, 0, 0, 0, 255, 0))
  }

  // ---- PPM: hand-written header with a comment ----
  test("decodePpm parses header grammar incl. comments") {
    val ppm = "P6\n# test comment\n2 1\n255\n".getBytes("US-ASCII") ++
      b(1, 2, 3, 4, 5, 6)
    val img = decodePpm(ppm)
    assert(img.width == 2 && img.height == 1)
    assert(img.rgb.map(_ & 0xff).toSeq == Seq(1, 2, 3, 4, 5, 6))
  }

  test("round-trips: encode then decode is identity") {
    val samples = Array.tabulate(300)(i => ((i * 7919) % 65536) - 32768)
    val w = decodeWav(encodeWav(samples, 16000, 1))
    assert(w.sampleRate == 16000 && w.samples.toSeq == samples.toSeq)

    val rgb = Array.tabulate(15 * 4 * 3)(i => ((i * 31) % 256).toByte)
    val img = RgbImage(15, 4, rgb) // width 15 -> stride padding exercised
    assert(decodeBmp(encodeBmp(img)).rgb.toSeq == rgb.toSeq)
    assert(decodePpm(encodePpm(img)).rgb.toSeq == rgb.toSeq)
    assert(decodeBmp(encodeBmp(img)).width == 15)
    assert(decodePpm(encodePpm(img)).height == 4)
  }

  test("sniff dispatches by content") {
    assert(sniff(wavFixture).contains("audio/wav"))
    assert(sniff(bmpFixture).contains("image/bmp"))
    assert(sniff("P6\n1 1\n255\n...".getBytes("US-ASCII")).contains("image/x-portable-pixmap"))
    assert(sniff(b(1, 2, 3, 4)).isEmpty)
  }
}
