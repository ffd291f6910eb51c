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

  // ------------------------- mm9: WAV / MP4 -------------------------
  import graft.operators.Multimodal.{buildMediaPayload, parseMediaHeader}

  // spec-transcription helpers, written independently of the generator
  private def le16b(x: Int) = bytes(x, x >> 8)
  private def le32b(x: Long) = bytes(x.toInt, (x >> 8).toInt, (x >> 16).toInt, (x >> 24).toInt)
  private def be32b(x: Long) = bytes((x >> 24).toInt, (x >> 16).toInt, (x >> 8).toInt, x.toInt)
  private def fourcc(s: String) = s.getBytes("US-ASCII")

  test("planted WAV: the textbook 44-byte mono 8kHz PCM16 header parses to 1000 ms") {
    // 16000 data bytes at 8000 Hz mono 16-bit = 8000 frames = 1 s
    val wav = fourcc("RIFF") ++ le32b(36 + 16000) ++ fourcc("WAVE") ++
      fourcc("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(1) ++ le32b(8000) ++
      le32b(16000) ++ le16b(2) ++ le16b(16) ++
      fourcc("data") ++ le32b(16000) // header only: data size field is the contract
    assert(parseMediaHeader(wav) === (("wav", 8000L, 1000L)))
  }

  test("planted WAV: LIST chunk (odd size, padded) before fmt; stereo 44.1kHz") {
    // real encoders put LIST/INFO chunks first — the walk must skip
    // them, including the RIFF odd-size pad byte
    val list = fourcc("LIST") ++ le32b(5) ++ bytes('I', 'N', 'F', 'O', 'x') ++ bytes(0)
    val dataBytes = 441000L // 110250 frames at 44100 Hz stereo 16-bit = 2.5 s
    val wav = fourcc("RIFF") ++ le32b(36 + 14 + dataBytes) ++ fourcc("WAVE") ++
      list ++
      fourcc("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(2) ++ le32b(44100) ++
      le32b(44100L * 4) ++ le16b(4) ++ le16b(16) ++
      fourcc("data") ++ le32b(dataBytes)
    assert(parseMediaHeader(wav) === (("wav", 44100L, 2500L)))
  }

  test("planted MP4: free box before moov; mvhd v0 at 600 timescale") {
    // ftyp + free + moov[mvhd v0: timescale 600, duration 1500 = 2.5 s]
    val mvhd = be32b(108) ++ fourcc("mvhd") ++ bytes(0, 0, 0, 0) ++
      be32b(0) ++ be32b(0) ++ be32b(600) ++ be32b(1500) ++
      Array.fill[Byte](108 - 28)(0)
    val mp4 = be32b(16) ++ fourcc("ftyp") ++ fourcc("isom") ++ be32b(512) ++
      be32b(12) ++ fourcc("free") ++ fourcc("pad.") ++
      be32b(8 + 108) ++ fourcc("moov") ++ mvhd
    assert(parseMediaHeader(mp4) === (("mp4", 600L, 2500L)))
  }

  test("planted MP4: mvhd VERSION 1 (64-bit creation/duration) parses through the long layout") {
    // v1 mvhd: 120-byte box, 8-byte creation/modification/duration
    val mvhd = be32b(120) ++ fourcc("mvhd") ++ bytes(1, 0, 0, 0) ++
      be32b(0) ++ be32b(0) ++ be32b(0) ++ be32b(0) ++ // creation, modification (u64 each)
      be32b(90000) ++ // timescale
      be32b(0) ++ be32b(270000) ++ // duration u64 = 270000 → 3 s
      Array.fill[Byte](120 - 40)(0)
    val mp4 = be32b(16) ++ fourcc("ftyp") ++ fourcc("mp42") ++ be32b(0) ++
      be32b(8 + 120) ++ fourcc("moov") ++ mvhd
    assert(parseMediaHeader(mp4) === (("mp4", 90000L, 3000L)))
  }

  test("media garbage and truncation report unknown instead of throwing") {
    assert(parseMediaHeader(Array.empty[Byte]) === (("unknown", -1L, -1L)))
    assert(parseMediaHeader("not media at all".getBytes("UTF-8")) === (("unknown", -1L, -1L)))
    // RIFF but not WAVE (an AVI would say 'AVI ')
    assert(parseMediaHeader(fourcc("RIFF") ++ le32b(4) ++ fourcc("AVI ")) ===
      (("unknown", -1L, -1L)))
    // WAV with a chunk size running past the buffer, then nothing
    assert(parseMediaHeader(fourcc("RIFF") ++ le32b(100) ++ fourcc("WAVE") ++
      fourcc("fmt ") ++ le32b(16)) === (("unknown", -1L, -1L)))
    // MP4 box size pointing past the buffer
    assert(parseMediaHeader(be32b(16) ++ fourcc("ftyp") ++ fourcc("isom") ++ be32b(0) ++
      be32b(4096) ++ fourcc("moov")) === (("unknown", -1L, -1L)))
    // moov present but no mvhd child
    assert(parseMediaHeader(be32b(16) ++ fourcc("ftyp") ++ fourcc("isom") ++ be32b(0) ++
      be32b(16) ++ fourcc("moov") ++ be32b(8) ++ fourcc("iods")) === (("unknown", -1L, -1L)))
  }

  test("WAV chunk sizes >= 2^31 terminate (round-15 ADVICE: Int-truncated cursor)") {
    // Declared size 0xFFFFFFF8: through toInt (-8) the old cursor
    // advanced by 8 + (-8) = 0 — an INFINITE LOOP; other large sizes
    // stepped the cursor backwards until cc(i) threw. The Long-cursor
    // walk must stop at the buffer end and report what it found.
    val frozen = fourcc("RIFF") ++ le32b(100) ++ fourcc("WAVE") ++
      fourcc("JUNK") ++ le32b(0xFFFFFFF8L) ++ Array.fill[Byte](16)(0)
    assert(parseMediaHeader(frozen) === (("unknown", -1L, -1L)))
    // backward-stepping size (0x80000010 -> toInt negative): must not
    // re-walk earlier bytes or throw
    val backward = fourcc("RIFF") ++ le32b(100) ++ fourcc("WAVE") ++
      fourcc("JUNK") ++ le32b(0x80000010L) ++ Array.fill[Byte](16)(0)
    assert(parseMediaHeader(backward) === (("unknown", -1L, -1L)))
    // a TRAILING data chunk with a huge declared size keeps the
    // documented truncation behavior: the declared size IS the
    // contract once fmt was parsed (duration from header fields)
    val bigData = fourcc("RIFF") ++ le32b(0xFFFFFFF0L) ++ fourcc("WAVE") ++
      fourcc("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(1) ++ le32b(8000) ++
      le32b(16000) ++ le16b(2) ++ le16b(16) ++
      fourcc("data") ++ le32b(0x80000000L)
    assert(parseMediaHeader(bigData) ===
      (("wav", 8000L, 0x80000000L / 2 * 1000L / 8000L)))
  }

  test("media generator/parser round-trip across parameter grids") {
    for (ch <- Seq(1, 2); rate <- Seq(8000L, 16000L, 44100L); nb <- Seq(0, 7, 4096)) {
      val body = Array.fill[Byte](nb)(0x5a)
      val got = parseMediaHeader(buildMediaPayload(0, ch, rate, body))
      val want = ("wav", rate, nb.toLong / (ch * 2) * 1000L / rate)
      assert(got === want, s"wav ch=$ch rate=$rate nb=$nb")
    }
    for (ts <- Seq(600, 1000, 90000); dur <- Seq(0L, 601L, 123456L)) {
      val got = parseMediaHeader(buildMediaPayload(1, ts, dur, "x".getBytes))
      assert(got === (("mp4", ts.toLong, dur * 1000L / ts)), s"mp4 ts=$ts dur=$dur")
    }
  }
}
