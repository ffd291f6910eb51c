package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal legacy `.xls` (BIFF8 inside a CFB/OLE2 compound file)
  * cell reader — closes the one ingest gap vs the reference, whose
  * `pd.read_excel` accepts pre-2007 workbooks
  * (/root/reference/main.py:402,409). Pure JDK, no dependencies —
  * the same doctrine as [[Excel]]'s xlsx reader, which consumes this
  * reader's row output through the shared inference/DataFrame tail.
  *
  * Scope (documented, not silent): BIFF8 only (Excel 97-2003 — the
  * format every pre-2007 writer in the wild emits; BIFF5 and earlier
  * report an actionable error), cell VALUES only (LABELSST, LABEL,
  * NUMBER, RK, MULRK, BOOLERR, FORMULA caches incl. string results),
  * no date-style detection (serials surface raw — the xlsx reader's
  * same documented trade), no encrypted workbooks (FILEPASS errors).
  *
  * Scale note: like xlsx, `.xls` is an upload format parsed on the
  * driver — a sheet caps at 65,536 rows by the format itself.
  */
object Biff {

  val CfbMagic: Array[Byte] =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  // ------------------------------------------------------------------
  // CFB (Compound File Binary / OLE2) container

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Extract a named stream ("Workbook" or the BIFF5-era "Book") from
    * a CFB file, walking the FAT — or the mini-FAT over the root
    * entry's mini stream for streams under the 4096-byte cutoff. */
  private[sources] def cfbStream(bytes: Array[Byte], names: Seq[String]): Option[Array[Byte]] = {
    require(bytes.length >= 512 && bytes.take(8).sameElements(CfbMagic),
      "not a CFB (OLE2 compound) file")
    val sectorShift = le16(bytes, 30)
    // real files use 9 (v3) or 12 (v4); anything outside a sane band
    // is a corrupt header — fail actionably before any arithmetic on it
    require(sectorShift >= 7 && sectorShift <= 20,
      s"corrupt CFB header: sector shift $sectorShift")
    val secSize = 1 << sectorShift
    val miniSecSize = 1 << le16(bytes, 32)
    val miniCutoff = le32(bytes, 56)
    def sector(id: Long): Array[Byte] = {
      val off = (id.toInt + 1) * secSize
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + secSize, bytes.length))
    }
    // FAT sector list: 109 DIFAT slots in the header, then chained
    // DIFAT sectors (last u32 of each = next DIFAT sector)
    val fatSectors = ArrayBuffer.empty[Long]
    var i = 0
    while (i < 109) {
      val v = le32(bytes, 76 + i * 4)
      if (v != FreeSect && v != EndOfChain) fatSectors += v
      i += 1
    }
    var difat = le32(bytes, 68)
    val entriesPerSec = secSize / 4
    var guard = 0
    while (difat != EndOfChain && difat != FreeSect && guard < (1 << 16)) {
      val s = sector(difat)
      (0 until entriesPerSec - 1).foreach { j =>
        val v = le32(s, j * 4)
        if (v != FreeSect && v != EndOfChain) fatSectors += v
      }
      difat = le32(s, (entriesPerSec - 1) * 4)
      guard += 1
    }
    val fat: Array[Long] = fatSectors.toArray.flatMap { fs =>
      val s = sector(fs)
      (0 until s.length / 4).map(j => le32(s, j * 4))
    }
    def chain(start: Long, table: Array[Long]): Seq[Long] = {
      val out = ArrayBuffer.empty[Long]
      var cur = start
      while (cur != EndOfChain && cur != FreeSect && cur >= 0 &&
             cur < table.length && out.length <= table.length) {
        out += cur
        cur = table(cur.toInt)
      }
      out.toSeq
    }
    def readChain(start: Long, size: Long): Array[Byte] = {
      val buf = chain(start, fat).flatMap(id => sector(id)).toArray
      java.util.Arrays.copyOfRange(buf, 0, math.min(size, buf.length.toLong).toInt)
    }
    // directory entries, scanned LINEARLY (robust to odd sibling trees)
    val dir = chain(le32(bytes, 48), fat).flatMap(id => sector(id)).toArray
    case class Entry(name: String, objType: Int, start: Long, size: Long)
    val entries = (0 until dir.length / 128).map { e =>
      val o = e * 128
      val nameLen = le16(dir, o + 64) // bytes incl. UTF-16 terminator
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dir(o + 66) & 0xff, le32(dir, o + 116), le32(dir, o + 120))
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB file has no root directory entry"))
    entries.find(e => e.objType == 2 && names.contains(e.name)).map { e =>
      if (e.size >= miniCutoff) readChain(e.start, e.size)
      else {
        // mini stream: the root entry's stream, in mini sectors,
        // chained through the mini-FAT
        val miniStream = readChain(root.start, root.size)
        val miniFat: Array[Long] = chain(le32(bytes, 60), fat).toArray
          .flatMap { id => val s = sector(id); (0 until s.length / 4).map(j => le32(s, j * 4)) }
        val buf = chain(e.start, miniFat).flatMap { id =>
          val off = (id * miniSecSize).toInt
          java.util.Arrays.copyOfRange(miniStream, off,
            math.min(off + miniSecSize, miniStream.length))
        }.toArray
        java.util.Arrays.copyOfRange(buf, 0, math.min(e.size, buf.length.toLong).toInt)
      }
    }
  }

  // ------------------------------------------------------------------
  // BIFF8 record stream

  private object Rec {
    val Bof = 0x0809; val Eof = 0x000A; val BoundSheet = 0x0085
    val Sst = 0x00FC; val Continue = 0x003C; val FilePass = 0x002F
    val LabelSst = 0x00FD; val Label = 0x0204; val Number = 0x0203
    val Rk = 0x027E; val MulRk = 0x00BD; val BoolErr = 0x0205
    val Formula = 0x0006; val StringRec = 0x0207
  }

  /** Cursor over a list of raw record payloads (an SST plus its
    * CONTINUE records), implementing the BIFF8 continuation rule:
    * when CHARACTER data crosses into a CONTINUE record the first
    * byte there is a fresh fHighByte flag; rich-run and ext data
    * cross without one. */
  private final class Cursor(parts: IndexedSeq[Array[Byte]]) {
    private var p = 0
    private var o = 0
    private def ensure(): Unit = {
      while (p < parts.length && o >= parts(p).length) { p += 1; o = 0 }
    }
    def hasMore: Boolean = { ensure(); p < parts.length }
    /** ensure() + reject exhaustion: a truncated workbook (declared
      * lengths past the bytes present, missing CONTINUE) must surface
      * as the reader's actionable IllegalArgumentException contract,
      * not an IndexOutOfBoundsException from parts(p). */
    private def need(): Unit = {
      ensure()
      if (p >= parts.length) throw new IllegalArgumentException(
        "not a readable .xls: record data ends mid-structure (truncated file?)")
    }
    def u8(): Int = { need(); val v = parts(p)(o) & 0xff; o += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        need()
        val take = math.min(left, (parts(p).length - o).toLong).toInt
        o += take; left -= take
      }
    }
    /** XLUnicodeRichExtendedString (the SST entry / LABEL payload). */
    def readString(): String = {
      val cch = u16()
      var flags = u8()
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) u32() else 0L
      val sb = new java.lang.StringBuilder(cch)
      val headerPart = p // part the header ended in
      var charPart = -1  // part we last read chars from
      var read = 0
      while (read < cch) {
        need() // cch past the data present = truncation, not a crash
        if (charPart != p) {
          // crossed into a CONTINUE record mid-character-data (or the
          // chars start in the record after the header): a fresh
          // grbit byte leads — only fHighByte is meaningful there
          if (charPart != -1 || p != headerPart) flags = u8()
          charPart = p
        }
        val twoByte = (flags & 0x01) != 0
        val bytesLeft = parts(p).length - o
        val charsHere = math.min(cch - read,
          if (twoByte) bytesLeft / 2 else bytesLeft)
        if (charsHere == 0) {
          // 0 whole chars before the boundary (malformed tail byte) —
          // force advance rather than loop
          o = parts(p).length
        } else {
          var k = 0
          while (k < charsHere) {
            val c = if (twoByte) u16() else u8()
            sb.append(c.toChar)
            k += 1
          }
          read += charsHere
        }
      }
      skip(4L * cRun + cbExt)
      sb.toString
    }
  }

  /** Parse one record's payload as a standalone cursor. */
  private def cur(data: Array[Byte]): Cursor = new Cursor(IndexedSeq(data))

  private def rkValue(rk: Long): String = {
    val div100 = (rk & 1L) != 0
    val isInt = (rk & 2L) != 0
    if (isInt) {
      val n = rk.toInt >> 2 // arithmetic shift sign-extends the 30-bit value
      if (div100) formatDouble(n / 100.0) else n.toString
    } else {
      val bits = (rk & 0xFFFFFFFCL) << 32
      val d = java.lang.Double.longBitsToDouble(bits)
      formatDouble(if (div100) d / 100 else d)
    }
  }

  /** Match the xlsx reader's number surface: integral doubles print
    * without the trailing `.0` so type inference sees longs. */
  private def formatDouble(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15 && !d.isInfinite) d.toLong.toString
    else d.toString

  private case class Sheet(name: String, offset: Int)

  /** Read one sheet of a BIFF8 workbook into the same row shape the
    * xlsx reader produces: dense string arrays, null = blank cell. */
  def readRows(path: String, sheet: Option[String]): Seq[Array[String]] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb = cfbStream(bytes, Seq("Workbook", "Book")).getOrElse(
      throw new IllegalArgumentException(
        s"CFB file has no Workbook/Book stream (not an Excel workbook?): $path"))

    // pass 1 — workbook globals: version check, SST, BOUNDSHEETs
    val sst = ArrayBuffer.empty[String]
    val sheets = ArrayBuffer.empty[Sheet]
    var pos = 0
    def recType = le16(wb, pos)
    def recLen = le16(wb, pos + 2)
    var depth = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val t = recType; val n = recLen
      val data = java.util.Arrays.copyOfRange(wb, pos + 4, pos + 4 + n)
      t match {
        case Rec.Bof =>
          if (depth == 0) {
            val ver = le16(data, 0)
            if (ver != 0x0600) throw new IllegalArgumentException(
              f"unsupported BIFF version 0x$ver%04X — only BIFF8 (Excel 97-2003) " +
                "is supported; re-save as .xlsx or CSV")
          }
          depth += 1
        case Rec.Eof =>
          depth -= 1
          if (depth <= 0) done = true // end of the globals substream
        case Rec.FilePass =>
          throw new IllegalArgumentException(
            s"encrypted .xls workbook not supported: $path")
        case Rec.BoundSheet =>
          val off = le32(data, 0).toInt
          val nameLen = data(6) & 0xff // ShortXLUnicodeString: u8 cch
          val twoByte = (data(7) & 1) != 0
          val name =
            if (twoByte) new String(data, 8, nameLen * 2, "UTF-16LE")
            else new String(data, 8, nameLen, "ISO-8859-1")
          sheets += Sheet(name, off)
        case Rec.Sst =>
          // SST payload + its CONTINUE records as one cursor
          val parts = ArrayBuffer(data)
          var q = pos + 4 + n
          while (q + 4 <= wb.length && le16(wb, q) == Rec.Continue) {
            val cn = le16(wb, q + 2)
            parts += java.util.Arrays.copyOfRange(wb, q + 4, q + 4 + cn)
            q += 4 + cn
          }
          val c = new Cursor(parts.toIndexedSeq)
          c.skip(4) // cstTotal
          val unique = c.u32()
          var k = 0L
          while (k < unique && c.hasMore) { sst += c.readString(); k += 1 }
        case _ => ()
      }
      pos += 4 + n
    }
    if (sheets.isEmpty)
      throw new IllegalArgumentException("workbook has no sheets")
    val chosen = sheet match {
      case Some(nm) => sheets.find(_.name == nm).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$nm' not found; workbook has: ${sheets.map(_.name).mkString(", ")}"))
      case None => sheets.head
    }

    // pass 2 — the chosen sheet substream: cell value records
    val cells = ArrayBuffer.empty[(Int, Int, String)] // (row, col, value)
    pos = chosen.offset
    depth = 0; done = false
    var pendingFormulaString: Option[(Int, Int)] = None
    while (!done && pos + 4 <= wb.length) {
      val t = recType; val n = recLen
      val data = java.util.Arrays.copyOfRange(wb, pos + 4, pos + 4 + n)
      t match {
        case Rec.Bof => depth += 1
        case Rec.Eof => depth -= 1; if (depth <= 0) done = true
        case Rec.LabelSst =>
          val r = le16(data, 0); val ccol = le16(data, 2)
          val idx = le32(data, 6).toInt
          if (idx >= 0 && idx < sst.length) cells += ((r, ccol, sst(idx)))
        case Rec.Label => // BIFF8 inline string cell
          val r = le16(data, 0); val ccol = le16(data, 2)
          val c = cur(java.util.Arrays.copyOfRange(data, 6, data.length))
          cells += ((r, ccol, c.readString()))
        case Rec.Number =>
          val r = le16(data, 0); val ccol = le16(data, 2)
          val bits = le32(data, 6) | (le32(data, 10) << 32)
          cells += ((r, ccol, formatDouble(java.lang.Double.longBitsToDouble(bits))))
        case Rec.Rk =>
          val r = le16(data, 0); val ccol = le16(data, 2)
          cells += ((r, ccol, rkValue(le32(data, 6))))
        case Rec.MulRk =>
          // payload: row(2) colFirst(2) [xf(2) rk(4)]* colLast(2)
          val r = le16(data, 0); val colFirst = le16(data, 2)
          val nCells = (data.length - 6) / 6
          (0 until nCells).foreach { j =>
            cells += ((r, colFirst + j, rkValue(le32(data, 4 + j * 6 + 2))))
          }
        case Rec.BoolErr =>
          val r = le16(data, 0); val ccol = le16(data, 2)
          val isErr = (data(7) & 0xff) != 0
          if (!isErr) cells += ((r, ccol, if (data(6) != 0) "true" else "false"))
        case Rec.Formula =>
          val r = le16(data, 0); val ccol = le16(data, 2)
          if (le16(data, 12) == 0xFFFF) {
            (data(6) & 0xff) match {
              case 0 => pendingFormulaString = Some((r, ccol)) // STRING follows
              case 1 => cells += ((r, ccol, if (data(8) != 0) "true" else "false"))
              case _ => () // error / empty-string results: blank
            }
          } else {
            val bits = le32(data, 6) | (le32(data, 10) << 32)
            cells += ((r, ccol, formatDouble(java.lang.Double.longBitsToDouble(bits))))
          }
        case Rec.StringRec =>
          pendingFormulaString.foreach { case (r, ccol) =>
            cells += ((r, ccol, cur(data).readString()))
          }
          pendingFormulaString = None
        case _ => ()
      }
      pos += 4 + n
    }

    if (cells.isEmpty) return Seq.empty
    val maxRow = cells.map(_._1).max
    val byRow = cells.groupBy(_._1)
    (0 to maxRow).map { r =>
      byRow.get(r) match {
        case None => Array.empty[String]
        case Some(cs) =>
          val width = cs.map(_._2).max + 1
          val arr = new Array[String](width)
          cs.foreach { case (_, c, v) => arr(c) = v }
          arr
      }
    }
  }
}
