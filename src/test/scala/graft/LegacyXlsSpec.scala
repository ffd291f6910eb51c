package graft

import graft.sources.{Biff, Excel}

/** Planted legacy `.xls` (BIFF8-in-CFB) workbooks, built byte-by-byte
  * the way MultimodalHeaderSpec plants media headers: every container
  * and record layout quirk the generator-side writer would never
  * emit — mini-FAT storage, the BIFF5-era "Book" stream name, SST
  * CONTINUE splits with an encoding flip, RK/MULRK packings, formula
  * string caches — so an offset/chain/continuation bug in the reader
  * fails a value assertion, not a fuzz test. */
class LegacyXlsSpec extends SparkSuite {

  // ---------- byte builders ----------
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le64(v: Long): Array[Byte] = le32(v & 0xFFFFFFFFL) ++ le32(v >>> 32)
  private def rec(t: Int, data: Array[Byte]): Array[Byte] =
    le16(t) ++ le16(data.length) ++ data

  /** Compressed (1-byte-per-char) BIFF8 string, cch+flags header. */
  private def biffStr(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")

  private def bof(docType: Int): Array[Byte] =
    rec(0x0809, le16(0x0600) ++ le16(docType) ++ le16(0x0DBB) ++ le16(0x07CC) ++
      le32(0) ++ le32(0x0606))
  private val eof = rec(0x000A, Array.empty[Byte])

  private def labelSst(r: Int, c: Int, i: Int): Array[Byte] =
    rec(0x00FD, le16(r) ++ le16(c) ++ le16(0) ++ le32(i))
  private def number(r: Int, c: Int, d: Double): Array[Byte] =
    rec(0x0203, le16(r) ++ le16(c) ++ le16(0) ++ le64(java.lang.Double.doubleToLongBits(d)))
  private def rkInt(v: Int, div100: Boolean = false): Long =
    ((v.toLong << 2) & 0xFFFFFFFFL) | 2L | (if (div100) 1L else 0L)
  private def rkFloat(d: Double, div100: Boolean = false): Long =
    ((java.lang.Double.doubleToLongBits(d) >>> 32) & 0xFFFFFFFCL) | (if (div100) 1L else 0L)
  private def rk(r: Int, c: Int, rkv: Long): Array[Byte] =
    rec(0x027E, le16(r) ++ le16(c) ++ le16(0) ++ le32(rkv))
  private def mulRk(r: Int, colFirst: Int, rks: Seq[Long]): Array[Byte] =
    rec(0x00BD, le16(r) ++ le16(colFirst) ++
      rks.flatMap(v => le16(0) ++ le32(v)).toArray ++ le16(colFirst + rks.length - 1))
  private def boolCell(r: Int, c: Int, v: Boolean): Array[Byte] =
    rec(0x0205, le16(r) ++ le16(c) ++ le16(0) ++
      Array((if (v) 1 else 0).toByte, 0.toByte))
  private def formulaNum(r: Int, c: Int, d: Double): Array[Byte] =
    rec(0x0006, le16(r) ++ le16(c) ++ le16(0) ++
      le64(java.lang.Double.doubleToLongBits(d)) ++ le16(0) ++ le32(0) ++ le16(0))
  private def formulaStr(r: Int, c: Int): Array[Byte] =
    rec(0x0006, le16(r) ++ le16(c) ++ le16(0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ le16(0) ++ le32(0) ++ le16(0))
  private def stringRec(s: String): Array[Byte] = rec(0x0207, biffStr(s))

  private def sstRec(strings: Seq[String]): Array[Byte] =
    rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++
      strings.flatMap(biffStr).toArray)

  /** Globals + sheets assembled with patched BOUNDSHEET offsets. */
  private def workbookStream(sst: Array[Byte],
      sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    def boundSheet(off: Int, name: String): Array[Byte] =
      rec(0x0085, le32(off) ++ Array(0.toByte, 0.toByte) ++
        Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))
    // fixed-point: BOUNDSHEET length depends only on the name
    val globalsLen = (bof(0x0005) ++ sst ++
      sheets.map(s => boundSheet(0, s._1)).reduce(_ ++ _) ++ eof).length
    val offsets = sheets.scanLeft(globalsLen)((acc, s) => acc + s._2.length).init
    bof(0x0005) ++ sst ++
      sheets.zip(offsets).map { case ((n, _), off) => boundSheet(off, n) }.reduce(_ ++ _) ++
      eof ++ sheets.map(_._2).reduce(_ ++ _)
  }

  private def sheetStream(cells: Array[Byte]): Array[Byte] =
    bof(0x0010) ++ cells ++ eof

  // ---------- CFB container builders ----------
  private val Free = 0xFFFFFFFFL
  private val End = 0xFFFFFFFEL
  private val FatSect = 0xFFFFFFFDL

  private def dirEntry(name: String, objType: Int, start: Long, size: Long,
      child: Long = Free): Array[Byte] = {
    val nm = name.getBytes("UTF-16LE")
    val padded = nm ++ new Array[Byte](64 - nm.length)
    padded ++ le16(nm.length + 2) ++ Array(objType.toByte, 1.toByte) ++
      le32(Free) ++ le32(Free) ++ le32(child) ++ // siblings + child
      new Array[Byte](36) ++ // clsid + state + times
      le32(start) ++ le32(size) ++ le32(0)
  }

  private def cfbHeader(numFat: Int, firstDir: Long, firstMiniFat: Long,
      numMiniFat: Int, difat0: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, b: Array[Byte]): Unit = System.arraycopy(b, 0, h, off, b.length)
    put(0, Biff.CfbMagic)
    put(24, le16(0x003E)); put(26, le16(0x0003)) // minor/major
    put(28, le16(0xFFFE))                        // little-endian marker
    put(30, le16(9)); put(32, le16(6))           // sector 512, mini 64
    put(44, le32(numFat.toLong)); put(48, le32(firstDir))
    put(56, le32(4096))                          // mini cutoff
    put(60, le32(firstMiniFat)); put(64, le32(numMiniFat.toLong))
    put(68, le32(End)); put(72, le32(0))         // no DIFAT chain
    put(76, le32(difat0))
    (1 until 109).foreach(i => put(76 + i * 4, le32(Free)))
    h
  }

  private def pad(b: Array[Byte], unit: Int): Array[Byte] =
    b ++ new Array[Byte]((unit - b.length % unit) % unit)

  private def fatSector(entries: Seq[Long]): Array[Byte] = {
    val b = entries.flatMap(le32).toArray
    b ++ Array.fill(512 - b.length)(0xFF.toByte) // pad with FREESECT
  }

  /** Regular-FAT container: stream stored in 512-byte sectors. The
    * workbook is padded to ≥ 4096 bytes so it stays above the mini
    * cutoff (the padding is after the final EOF — never parsed). */
  private def cfbRegular(streamName: String, wb0: Array[Byte]): Array[Byte] = {
    val wb = if (wb0.length >= 4096) wb0 else wb0 ++ new Array[Byte](4096 - wb0.length)
    val wbSec = pad(wb, 512)
    val w = wbSec.length / 512
    // sectors: 0..w-1 workbook, w dir, w+1 FAT
    val fat = (1L until w.toLong) ++ Seq(End, End, FatSect)
    val dir = pad(dirEntry("Root Entry", 5, End, 0, child = 1) ++
      dirEntry(streamName, 2, 0, wb.length.toLong), 512)
    cfbHeader(1, w.toLong, End, 0, (w + 1).toLong) ++ wbSec ++ dir ++ fatSector(fat)
  }

  /** Mini-FAT container: the workbook (< 4096 bytes) lives in 64-byte
    * mini sectors inside the root entry's mini stream. */
  private def cfbMini(streamName: String, wb: Array[Byte]): Array[Byte] = {
    require(wb.length < 4096)
    val miniStream = pad(wb, 64)
    val k = miniStream.length / 64
    val msSec = pad(miniStream, 512)
    val m = msSec.length / 512
    // sectors: 0..m-1 mini stream, m dir, m+1 miniFAT, m+2 FAT
    val fat = (1L until m.toLong) ++ Seq(End, End, End, FatSect)
    val miniFat = (1L until k.toLong) :+ End
    val dir = pad(dirEntry("Root Entry", 5, 0, miniStream.length.toLong, child = 1) ++
      dirEntry(streamName, 2, 0, wb.length.toLong), 512)
    cfbHeader(1, m.toLong, (m + 1).toLong, 1, (m + 2).toLong) ++
      msSec ++ dir ++ fatSector(miniFat) ++ fatSector(fat)
  }

  private def writeTmp(bytes: Array[Byte]): String = {
    val p = java.nio.file.Files.createTempFile("graft-biff", ".xls")
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  // ---------- tests ----------

  test("BIFF8 cell records through the regular FAT: every value kind types correctly") {
    val sst = sstRec(Seq("name", "qty", "price", "ok", "note", "alpha", "beta"))
    val cells =
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
        labelSst(0, 3, 3) ++ labelSst(0, 4, 4) ++
      labelSst(1, 0, 5) ++ rk(1, 1, rkInt(42)) ++ number(1, 2, 19.75) ++
        boolCell(1, 3, true) ++ rec(0x0204, le16(1) ++ le16(4) ++ le16(0) ++ biffStr("inline")) ++
      labelSst(2, 0, 6) ++ rk(2, 1, rkInt(-7)) ++ rk(2, 2, rkFloat(2.5)) ++
        boolCell(2, 3, false) ++ formulaStr(2, 4) ++ stringRec("cached")
    val wb = workbookStream(sst, Seq(("Sheet1", sheetStream(cells))))
    val df = Excel.read(spark, writeTmp(cfbRegular("Workbook", wb)), header = true)
    assert(df.columns.toSeq === Seq("name", "qty", "price", "ok", "note"))
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) === Seq("alpha", 42L, 19.75, true, "inline"))
    assert(rows(1) === Seq("beta", -7L, 2.5, false, "cached"))
    assert(df.schema.fields.map(_.dataType.typeName).toSeq ===
      Seq("string", "long", "double", "boolean", "string"))
  }

  test("MULRK packing, RK div-100 flags, and numeric formula caches decode raw") {
    val cells =
      mulRk(0, 0, Seq(rkInt(1), rkInt(314, div100 = true), rkFloat(150.0, div100 = true))) ++
        formulaNum(0, 3, 6.0)
    val wb = workbookStream(sstRec(Seq("unused")), Seq(("S", sheetStream(cells))))
    val df = Excel.read(spark, writeTmp(cfbRegular("Workbook", wb)), header = false)
    assert(df.collect().map(_.toSeq).toSeq === Seq(Seq(1L, 3.14, 1.5, 6L)))
  }

  test("mini-FAT storage and the BIFF5-era 'Book' stream name both resolve") {
    val sst = sstRec(Seq("k", "v", "a"))
    val cells = labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      labelSst(1, 0, 2) ++ rk(1, 1, rkInt(7))
    val wb = workbookStream(sst, Seq(("S", sheetStream(cells))))
    assert(wb.length < 4096, "mini-FAT case requires a sub-cutoff stream")
    val df = Excel.read(spark, writeTmp(cfbMini("Book", wb)))
    assert(df.columns.toSeq === Seq("k", "v"))
    assert(df.collect().map(_.toSeq).toSeq === Seq(Seq("a", 7L)))
  }

  test("SST spanning CONTINUE records, with an encoding flip at the split") {
    // string 0: 'aaaa' starts in the SST record and CONTINUES into the
    // next record where the fresh grbit switches to 16-bit chars
    val s0Head = le16(6) ++ Array(0.toByte) ++ "aaa".getBytes("ISO-8859-1")
    val s0Cont = Array(1.toByte) ++ "böc".getBytes("UTF-16LE")
    val sstBody = le32(2) ++ le32(2) ++ s0Head
    val contBody = s0Cont ++ biffStr("plain")
    val sst = rec(0x00FC, sstBody) ++ rec(0x003C, contBody)
    val cells = labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      labelSst(1, 0, 1) ++ labelSst(1, 1, 0)
    val wb = workbookStream(sst, Seq(("S", sheetStream(cells))))
    val df = Excel.read(spark, writeTmp(cfbRegular("Workbook", wb)), header = false)
    assert(df.collect().map(_.toSeq).toSeq ===
      Seq(Seq("aaaböc", "plain"), Seq("plain", "aaaböc")))
  }

  test("sheet selection by name walks BOUNDSHEET offsets") {
    val sst = sstRec(Seq("x"))
    val s1 = sheetStream(rk(0, 0, rkInt(1)))
    val s2 = sheetStream(rk(0, 0, rkInt(2)) ++ rk(1, 0, rkInt(3)))
    val wb = workbookStream(sst, Seq(("first", s1), ("second", s2)))
    val path = writeTmp(cfbRegular("Workbook", wb))
    assert(Excel.read(spark, path, header = false).collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(Excel.read(spark, path, sheet = Some("second"), header = false)
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    val e = intercept[IllegalArgumentException] {
      Excel.read(spark, path, sheet = Some("nope"))
    }
    assert(e.getMessage.contains("workbook has: first, second"))
  }

  test("garbage and unsupported variants report actionable errors, never zip noise") {
    // CFB magic but no workbook stream
    val noStream = cfbRegular("NotAWorkbook", workbookStream(sstRec(Seq("a")),
      Seq(("S", sheetStream(rk(0, 0, rkInt(1)))))))
    val e1 = intercept[IllegalArgumentException] { Excel.read(spark, writeTmp(noStream)) }
    assert(e1.getMessage.contains("no Workbook/Book stream"))
    // BIFF5 version word
    val old = workbookStream(sstRec(Seq("a")), Seq(("S", sheetStream(rk(0, 0, rkInt(1))))))
    val patched = old.clone()
    System.arraycopy(le16(0x0500), 0, patched, 4, 2) // BOF version field
    val e2 = intercept[IllegalArgumentException] {
      Excel.read(spark, writeTmp(cfbRegular("Workbook", patched)))
    }
    assert(e2.getMessage.contains("only BIFF8"))
    // FILEPASS (encryption) directly after BOF
    val enc = bof(0x0005) ++ rec(0x002F, le16(1) ++ le16(1) ++ new Array[Byte](48)) ++ eof
    val e3 = intercept[IllegalArgumentException] {
      Excel.read(spark, writeTmp(cfbRegular("Workbook", enc)))
    }
    assert(e3.getMessage.contains("encrypted"))
  }

  test("xls and xlsx of the same table infer identical schemas and values") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.5, true), ("b", -2L, 0.25, false))
      .toDF("s", "n", "d", "f")
    val xlsxPath = java.nio.file.Files.createTempFile("graft-tw", ".xlsx").toString
    Excel.write(df, xlsxPath)
    val viaXlsx = Excel.read(spark, xlsxPath)
    val sst = sstRec(Seq("s", "n", "d", "f", "a", "b"))
    val cells =
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++ labelSst(0, 3, 3) ++
      labelSst(1, 0, 4) ++ rk(1, 1, rkInt(1)) ++ number(1, 2, 1.5) ++ boolCell(1, 3, true) ++
      labelSst(2, 0, 5) ++ rk(2, 1, rkInt(-2)) ++ number(2, 2, 0.25) ++ boolCell(2, 3, false)
    val wb = workbookStream(sst, Seq(("Sheet1", sheetStream(cells))))
    val viaXls = Excel.read(spark, writeTmp(cfbRegular("Workbook", wb)))
    assert(viaXls.schema === viaXlsx.schema)
    assert(viaXls.collect().map(_.toSeq).toSeq === viaXlsx.collect().map(_.toSeq).toSeq)
  }
}
