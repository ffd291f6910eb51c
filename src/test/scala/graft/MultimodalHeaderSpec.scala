package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal.{buildImagePayload, parseImageHeader}

/** The real-header decode, fed PLANTED real-world header bytes —
  * fixed binary literals transcribed from the published format specs
  * (not from the repo's own generator), so a generator/parser bug
  * pair that cancels out in mm2's cross-derivation gate still fails
  * here. */
class MultimodalHeaderSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(x => (x & 0xff).toByte).toArray

  test("planted PNG: the canonical 1x1 transparent-pixel file header parses to 1x1") {
    // the first 33 bytes every tool emits for a 1x1 RGBA PNG:
    // signature, IHDR(len 13), w=1, h=1, depth 8, color 6, then CRC
    val png = bytes(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89)
    assert(parseImageHeader(png) === (("png", 1, 1)))
  }

  test("planted PNG: multi-byte big-endian dims (640x480)") {
    val png = bytes(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x02, 0x80, // 640
      0x00, 0x00, 0x01, 0xe0, // 480
      0x08, 0x02, 0x00, 0x00, 0x00)
    assert(parseImageHeader(png) === (("png", 640, 480)))
  }

  test("planted JPEG: JFIF APP0 + Exif APP1 + DQT before SOF0 — the marker walk must skip them") {
    // a camera-style file: SOI, APP0(JFIF), APP1(Exif, 8-byte stub),
    // DQT(5-byte stub), then SOF0 with 1024x768 (h first, big-endian)
    val jpeg = bytes(
      0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x02, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xe1, 0x00, 0x08, 'E', 'x', 'i', 'f', 0x00, 0x00,
      0xff, 0xdb, 0x00, 0x05, 0x00, 0x01, 0x02,
      0xff, 0xc0, 0x00, 0x11, 0x08,
      0x03, 0x00, // height 768
      0x04, 0x00, // width 1024
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    assert(parseImageHeader(jpeg) === (("jpeg", 1024, 768)))
  }

  test("planted progressive JPEG (SOF2) and restart markers are handled") {
    val jpeg = bytes(
      0xff, 0xd8,
      0xff, 0x01, // TEM standalone: no length
      0xff, 0xc2, 0x00, 0x0b, 0x08,
      0x00, 0x64, // height 100
      0x00, 0xc8, // width 200
      0x01, 0x01, 0x11, 0x00)
    assert(parseImageHeader(jpeg) === (("jpeg", 200, 100)))
  }

  test("planted GIF87a and GIF89a little-endian logical-screen dims") {
    val gif89 = bytes('G', 'I', 'F', '8', '9', 'a',
      0x20, 0x03, // 800 LE
      0x58, 0x02, // 600 LE
      0xf7, 0x00, 0x00)
    assert(parseImageHeader(gif89) === (("gif", 800, 600)))
    val gif87 = bytes('G', 'I', 'F', '8', '7', 'a', 0x01, 0x00, 0x01, 0x00, 0x00, 0x00, 0x00)
    assert(parseImageHeader(gif87) === (("gif", 1, 1)))
  }

  test("garbage, truncation, and missing-SOF streams report unknown instead of throwing") {
    assert(parseImageHeader(Array.empty[Byte]) === (("unknown", -1, -1)))
    assert(parseImageHeader("plain text bytes".getBytes("UTF-8")) === (("unknown", -1, -1)))
    // PNG signature but truncated before IHDR dims
    assert(parseImageHeader(bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)) ===
      (("unknown", -1, -1)))
    // JPEG that hits start-of-scan without any SOF marker
    assert(parseImageHeader(bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02, 0x00)) ===
      (("unknown", -1, -1)))
    // JPEG with a segment length pointing past the buffer
    assert(parseImageHeader(bytes(0xff, 0xd8, 0xff, 0xe0, 0x40, 0x00, 0x00)) ===
      (("unknown", -1, -1)))
  }

  test("generator/parser round-trip on every format and boundary dims") {
    for (fmt <- 0 to 2; (w, h) <- Seq((64, 64), (127, 127), (65535, 1), (1, 65535))) {
      // GIF/JPEG dims are u16; PNG supports u32 — probe a big one there
      val dims = if (fmt == 0) Seq((w, h), (1 << 20, 3)) else Seq((w, h))
      for ((ww, hh) <- dims) {
        val kind = Seq("png", "jpeg", "gif")(fmt)
        val payload = buildImagePayload(fmt, ww, hh, "body".getBytes("UTF-8"))
        assert(parseImageHeader(payload) === ((kind, ww, hh)),
          s"round-trip failed for $kind ${ww}x$hh")
      }
    }
  }
}
