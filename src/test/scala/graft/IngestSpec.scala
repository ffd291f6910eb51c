package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

class IngestSpec extends SparkSuite {

  test("csv roundtrip with header + inference + column normalization") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", " O_OrderKey ")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = Ingest.normalizeColumns(Ingest.readCsv(spark, dir))
    assert(back.columns.contains("o_orderkey"))
    assert(back.count() === Tables.orders(spark, sf).count())
    assert(back.schema("o_totalprice").dataType.typeName === "double")
  }

  test("xlsx roundtrip equals the CSV twin (types, names, values)") {
    import graft.sources.Excel
    val orders = Tables.orders(spark, sf).limit(200)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    // CSV twin
    val csvDir = java.nio.file.Files.createTempDirectory("graft-csvtwin").toString
    orders.coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    val viaCsv = Ingest.readCsv(spark, csvDir)
    // xlsx via our writer → our reader
    val xlsx = java.nio.file.Files.createTempDirectory("graft-xlsx").toString + "/orders.xlsx"
    Excel.write(orders, xlsx)
    val viaXlsx = Ingest.readExcel(spark, xlsx)
    assert(viaXlsx.columns.toSeq === viaCsv.columns.toSeq)
    assert(viaXlsx.schema("o_orderkey").dataType.typeName === "long")
    assert(viaXlsx.schema("o_totalprice").dataType.typeName === "double")
    assert(viaXlsx.schema("o_orderstatus").dataType.typeName === "string")
    val a = viaXlsx.orderBy("o_orderkey").collect().map(_.toSeq)
    val b = viaCsv.select(viaXlsx.columns.toSeq.map(col): _*)
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.length === 200)
    assert(a.sameElements(b) || a.zip(b).forall { case (x, y) => x == y })
  }

  test("xlsx reader handles shared strings, gaps, and sheet selection") {
    import graft.sources.Excel
    // hand-built workbook: sharedStrings + a skipped cell (B omitted
    // via r= refs) + two sheets
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx2")
    val path = dir.toString + "/t.xlsx"
    val out = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(n: String, c: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(n)); out.write(c.getBytes("UTF-8")); out.closeEntry()
    }
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>""")
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="first" sheetId="1" r:id="rId1"/><sheet name="second" sheetId="2" r:id="rId2"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>name</t></si><si><t>x</t></si><si><t>note</t></si><si><t>alpha</t></si><si><t>with &amp; gap</t></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>42</v></c><c r="C2" t="inlineStr"><is><t>inline!</t></is></c></row>""" +
        """<row r="3"><c r="A3" t="s"><v>4</v></c><c r="C3" t="b"><v>1</v></c></row>""" +
        """</sheetData></worksheet>""")
    part("xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row><c t="inlineStr"><is><t>only</t></is></c></row><row><c><v>7</v></c></row>""" +
        """</sheetData></worksheet>""")
    out.close()
    val df = Excel.read(spark, path)
    assert(df.columns.toSeq === Seq("name", "x", "note"))
    assert(df.schema("x").dataType.typeName === "long") // "42" + a null → long
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    val byName = rows.map(r => r.getString(0) -> (r.get(1), r.getString(2))).toMap
    assert(byName("alpha") === ((42L, "inline!")))
    assert(byName("with & gap") === ((null, "true")))     // B3 absent → null
    val second = Excel.read(spark, path, sheet = Some("second"), header = false)
    assert(second.count() === 2)
    intercept[IllegalArgumentException] { Excel.read(spark, path, sheet = Some("nope")) }
  }

  test("corrupt CFB .xls reports an actionable error, not a zip error (round 15: real .xls now READS — LegacyXlsSpec)") {
    import graft.sources.Excel
    val path = java.nio.file.Files.createTempFile("graft-legacy", ".xls").toString
    val out = new java.io.FileOutputStream(path)
    out.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)) // OLE2 magic
    out.write(new Array[Byte](512)) // ...but zeroed structures: corrupt
    out.close()
    val e = intercept[IllegalArgumentException] { Excel.read(spark, path) }
    assert(e.getMessage.contains("CFB") || e.getMessage.contains("Workbook"),
      s"unexpected: ${e.getMessage}")
  }

  test("Excel.write refuses frames over the row cap instead of collecting them") {
    import graft.sources.Excel
    assert(Excel.MaxWriteRows == 1048575) // Excel's sheet limit minus the header row
    val path = java.nio.file.Files.createTempFile("graft-cap", ".xlsx").toString
    val big = spark.range(100) // tiny data, tiny cap: proves the mechanism, not the constant
    val e = intercept[IllegalArgumentException] { Excel.write(big.toDF(), path, maxRows = 99) }
    assert(e.getMessage.contains("exceeds 99 rows"))
    assert(e.getMessage.contains("parquet"))
    Excel.write(big.toDF(), path, maxRows = 100) // at the cap: succeeds
    assert(Ingest.readExcel(spark, path).count() == 100)
    intercept[IllegalArgumentException] {
      Excel.write(big.toDF(), path, maxRows = Excel.MaxWriteRows + 1) // over the sheet limit
    }
  }

  test("compactSmallFiles rejects outDir == inDir (overwrite would delete the input)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-self").toString
    Tables.orders(spark, sf).limit(10).write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Ingest.compactSmallFiles(spark, dir, dir)
    }
    assert(e.getMessage.contains("outDir must differ"))
    // trailing-slash alias of the same directory is caught by path qualification
    intercept[IllegalArgumentException] {
      Ingest.compactSmallFiles(spark, dir, dir + "/")
    }
  }

  test("compaction merges a many-file directory and preserves every row") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    val src = Tables.orders(spark, sf)
    src.repartition(40).write.mode("overwrite").parquet(inDir) // simulate small-files debris
    val inFiles = new java.io.File(inDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(inFiles >= 30)
    val written = Ingest.compactSmallFiles(spark, inDir, outDir, targetMB = 128)
    val outFiles = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(written === 1 && outFiles === 1, "tiny table compacts to one target-sized file")
    assert(spark.read.parquet(outDir).count() === src.count())
  }

  test("sorted write clusters the key space per file (row-group skipping layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    Ingest.writeSorted(Tables.orders(spark, sf), dir, Seq("o_orderkey"), numFiles = Some(6))
    // per-file key ranges must not overlap: each file covers one slice
    val perFile = spark.read.parquet(dir)
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy("f").agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1, "range repartition should produce several files")
    perFile.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, "file key ranges overlap")
      case _ =>
    }
  }

  test("q8 on a user_id-bucketed events table runs with NO exchange (shuffle paid at ingest)") {
    import graft.sources.Ingest
    Ingest.writeBucketed(Tables.events(spark, sf), "events_q8b", "user_id", 4)
    val df = graft.operators.Relational.runningTotal(spark.table("events_q8b"))
    val plan = df.queryExecution.executedPlan.toString
    // the bucketed scan reports hashpartitioning(user_id), which
    // satisfies the window's required distribution — the per-user
    // running total needs only a local sort, never a shuffle
    assert(!plan.contains("Exchange"),
      s"bucketed layout must elide the window shuffle:\n$plan")
    assert(plan.contains("Sort"), "window still needs the within-bucket sort")
    // layout changes the plan, never the answer
    val got = df.orderBy(col("user_id"), col("event_id")).collect().map(_.toSeq).toSeq
    val want = graft.operators.Relational.q8(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("writeSorted layout skips row groups: selective scans read a fraction of the rows") {
    import graft.sources.Ingest
    val sortedDir = java.nio.file.Files.createTempDirectory("graft-rg-sorted").toString
    val plainDir = java.nio.file.Files.createTempDirectory("graft-rg-plain").toString
    val orders = Tables.orders(spark, sf)
    Ingest.writeSorted(orders, sortedDir, Seq("o_orderkey"), numFiles = Some(6))
    orders.repartition(6).write.mode("overwrite").parquet(plainDir) // same files, random layout
    val total = orders.count()
    // rows the parquet reader actually DECODED for a narrow key range,
    // from the scan node's own metric (pushed min/max vs row-group
    // stats) — the thing writeSorted exists to minimize
    def scannedRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("o_orderkey").between(600L, 650L))
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val sortedScanned = scannedRows(sortedDir)
    val plainScanned = scannedRows(plainDir)
    assert(plainScanned === total,
      s"random layout must decode every row group ($plainScanned vs $total)")
    assert(sortedScanned <= total / 3,
      s"sorted layout should skip most row groups: decoded $sortedScanned of $total")
  }

  test("writeZOrdered skips row groups on BOTH dimensions; layout never changes the answer") {
    import graft.sources.Ingest
    val zDir = java.nio.file.Files.createTempDirectory("graft-rg-z").toString
    val sortedDir = java.nio.file.Files.createTempDirectory("graft-rg-z1d").toString
    val orders = Tables.orders(spark, sf)
    Ingest.writeZOrdered(orders, zDir, Seq("o_orderkey", "o_custkey"), numFiles = Some(16))
    Ingest.writeSorted(orders, sortedDir, Seq("o_orderkey"), numFiles = Some(16))
    val total = orders.count()
    val (kLo, kHi, cLo, cHi) = {
      val r = orders.agg(min("o_orderkey"), max("o_orderkey"),
        min("o_custkey"), max("o_custkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // ~3%-of-domain predicates, one per dimension
    val kPred = col("o_orderkey").between(kLo, kLo + (kHi - kLo) / 32)
    val cPred = col("o_custkey").between(cLo, cLo + (cHi - cLo) / 32)
    def scanned(dir: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(dir).filter(pred)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head.metrics("numOutputRows").value
    }
    // z layout: row-group min/max stats are tight on BOTH dims, so a
    // selective predicate on EITHER skips most of the table
    assert(scanned(zDir, kPred) <= total / 2,
      s"z layout should skip on dim 1: decoded ${scanned(zDir, kPred)} of $total")
    assert(scanned(zDir, cPred) <= total / 2,
      s"z layout should skip on dim 2: decoded ${scanned(zDir, cPred)} of $total")
    // single-key sorted layout: skips hard on its own key, but the
    // non-sorted dim's values span every row group — no skipping
    assert(scanned(sortedDir, kPred) <= total / 3)
    // (>= 80%, not == total: a ~90-row file can miss a 3% slice by
    // chance; systematic skipping is what it must NOT show)
    assert(scanned(sortedDir, cPred) >= (total * 4) / 5,
      "1-D sort cannot systematically skip on the other dimension — that's what z-order buys")
    // layout is physical only: the z-ordered table holds the same rows
    val a = spark.read.parquet(zDir).orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = orders.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("writeZOrdered handles constant and null-bearing dimensions") {
    import graft.sources.Ingest
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-z-edge").toString
    val df = Seq((1L, java.lang.Long.valueOf(5L), 1.0), (2L, null.asInstanceOf[java.lang.Long], 2.0),
      (3L, java.lang.Long.valueOf(7L), 3.0)).toDF("k", "v", "c")
      .withColumn("const", lit(42L))
    Ingest.writeZOrdered(df, dir, Seq("v", "const"), numFiles = Some(1))
    val back = spark.read.parquet(dir)
    assert(back.count() === 3) // nulls and constant dims survive the write
    assert(back.columns.toSet === Set("k", "v", "c", "const")) // __z dropped
  }

  test("json roundtrip preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    Tables.customer(spark, sf).write.mode("overwrite").json(dir)
    assert(Ingest.readJson(spark, dir).count() === Tables.customer(spark, sf).count())
  }

  test("orc roundtrip preserves rows and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Tables.customer(spark, sf).write.mode("overwrite").orc(dir)
    val back = Ingest.readOrc(spark, dir)
    assert(back.count() === Tables.customer(spark, sf).count())
    val plan = back.filter(col("c_custkey") === 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"))
  }

  test("salted aggregation equals plain aggregation") {
    import graft.operators.Skew
    val ev = Tables.events(spark, sf)
    val salted = Skew.saltedAgg(ev, "event_type", "event_id", 8, Seq("value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = ev.groupBy("event_type").agg(count(lit(1)), sum("value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet === plain.keySet)
    assert(salted.forall { case (k, (n, s)) =>
      n == plain(k)._1 && math.abs(s - plain(k)._2) < 1e-6 })
  }

  test("salted join equals plain join") {
    import graft.operators.Skew
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val users = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("u_events"))
    val salted = Skew.saltedJoin(ev, users, "user_id", 4)
    val plain = ev.join(users, "user_id")
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("u_events")).head().getLong(0) === plain.agg(sum("u_events")).head().getLong(0))
  }

  test("bucketed tables join without a shuffle") {
    import graft.sources.Ingest
    Ingest.writeBucketed(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 4)
    Ingest.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() === Tables.lineitem(spark, sf).count())
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("typed JSON parsing agrees with the regex extraction path") {
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sf)
    val parsed = graft.sources.Ingest.parseJsonColumn(ev, "props",
      StructType(Seq(StructField("k", LongType))))
    val viaJson = parsed.agg(sum(col("props_parsed.k"))).head().getLong(0)
    val viaRegex = ev.agg(sum(
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))).head().getLong(0)
    assert(viaJson === viaRegex)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Ingest.writeParquet(Tables.events(spark, sf), dir, Seq("event_type"))
    val pruned = Ingest.readParquet(spark, dir).filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    // partition filter, not a data filter: the scan reads only one dir
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
  }

  test("dynamic partition pruning: a dim-side filter prunes the partitioned fact scan at runtime") {
    import spark.implicits._
    // the 100 TB pattern: fact partitioned on a key, the predicate
    // arrives only through a JOIN to a filtered dimension — static
    // pruning can't help, DPP must inject the dim's surviving keys
    // into the fact scan's partition filter at runtime
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Ingest.writeParquet(Tables.events(spark, sf), dir, Seq("event_type"))
    // the dim must be a real source: a literal frame constant-folds
    // (ConvertToLocalRelation) and the pruning rule never sees a
    // selective filter to push
    Seq(("click", 1.0), ("view", 0.5), ("purchase", 9.9), ("share", 0.1))
      .toDF("etype", "weight").write.mode("overwrite").parquet(dimDir)
    val dim = Ingest.readParquet(spark, dimDir)
    val fact = Ingest.readParquet(spark, dir)
    // AQE off for THIS plan only: its stage wrappers are opaque
    // leaves, hiding the scan node whose metric we must read; DPP
    // itself is orthogonal to AQE
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = fact.join(dim.filter(col("weight") > 5.0), // survives: purchase only
        col("event_type") === col("etype"))
      // collect() (not count()) so the metrics-bearing plan is the one
      // that executed — count() spawns its own query execution
      val rows = joined.collect().length.toLong
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("dynamicpruning"),
        s"fact scan must carry a runtime partition filter:\n$executed")
      // the pruning is real, not cosmetic: the fact scan decoded only
      // the surviving partition's rows
      val factScanRows = joined.queryExecution.executedPlan.collectLeaves()
        .filter(l => l.metrics.contains("numOutputRows") &&
          l.output.map(_.name).contains("event_type")) // the fact scan, not the dim's
        .head.metrics("numOutputRows").value
      val purchaseRows = Tables.events(spark, sf)
        .filter(col("event_type") === "purchase").count()
      assert(rows === purchaseRows)
      assert(factScanRows === purchaseRows,
        s"DPP should confine the scan to one partition ($factScanRows vs $purchaseRows)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("events loader canary: both testdata ts flavors normalize to TimestampType") {
    // The driver has regenerated /root/testdata with events.ts in two
    // parquet flavors: TIMESTAMP(NANOS) (rounds 1-6; the legacy
    // nanosAsLong conf surfaces it to the loader as LongType) and
    // timestamp[us] (round 7+; surfaces as TIMESTAMP_NTZ). The round-7
    // flip silently broke 44 queries at analysis time. Synthesize each
    // flavor as the loader OBSERVES it and assert Tables.events
    // normalizes both to the same TimestampType instants.
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    import spark.implicits._
    val microsA = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    val microsB = 1700000060654321L
    def payload(id: Long, tsExpr: org.apache.spark.sql.Column) =
      Seq((id, 10L, "view", 1.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .withColumn("ts", tsExpr)

    // Flavor 1: ts as int64 nanos (exactly what nanosAsLong yields).
    val nanosDir = java.nio.file.Files.createTempDirectory("graft-ev-nanos").toString
    (payload(1L, lit(microsA * 1000L)) union payload(2L, lit(microsB * 1000L)))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // Flavor 2: ts as timestamp[us] isAdjustedToUTC=false — written by
    // Spark for a TIMESTAMP_NTZ column, byte-compatible with what the
    // round-7 testdata stores (pyarrow timestamp[us], no timezone).
    val ntzDir = java.nio.file.Files.createTempDirectory("graft-ev-ntz").toString
    (payload(1L, timestamp_micros(lit(microsA)).cast(TimestampNTZType))
      union payload(2L, timestamp_micros(lit(microsB)).cast(TimestampNTZType)))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    val viaNanos = Tables.events(spark, nanosDir)
    val viaNtz = Tables.events(spark, ntzDir)
    assert(viaNanos.schema("ts").dataType === TimestampType)
    assert(viaNtz.schema("ts").dataType === TimestampType)
    val a = viaNanos.orderBy("event_id").select("ts").collect().toSeq
    val b = viaNtz.orderBy("event_id").select("ts").collect().toSeq
    assert(a === b, "the two flavors must decode to identical instants (UTC session)")
    // And the real regenerated testdata still loads + filters:
    assert(Tables.events(spark, sf).where(col("ts").isNotNull).count() > 0)
  }

  test("readMerges: standard merges.txt (header + rank order) drives t22's BPE fold (r17 directive 7)") {
    import spark.implicits._
    import graft.operators.TextOps
    // a planted REAL-FORMAT file: the '#version' header every
    // published tokenizer release carries, blank lines, and the first
    // rules of TextOps.DefaultMerges plus a multi-char composed rule —
    // rank = line order
    val dir = java.nio.file.Files.createTempDirectory("graft-merges")
    val f = dir.resolve("merges.txt")
    java.nio.file.Files.writeString(f,
      "#version: 0.2\nt h\nth e\ni n\n\na n\ne r\nan d\n")
    val loaded = Ingest.readMerges(spark, f.toString)
    assert(loaded === Seq("t" -> "h", "th" -> "e", "i" -> "n",
      "a" -> "n", "e" -> "r", "an" -> "d"),
      "header/blank-line handling or rank order broke")
    // the loaded table drives the SAME compiled fold t22 runs: counts
    // from the file equal counts from the identical in-code table
    val texts = Seq("the andante band in another era", "than then the end")
      .toDF("text")
    val viaFile = texts.select(TextOps.bpeTokenCount(col("text"), loaded).as("n"))
      .collect().map(_.getLong(0)).toSeq
    val viaCode = texts.select(TextOps.bpeTokenCount(col("text"),
        Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r", "an" -> "d")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaFile === viaCode)
    // rank order MATTERS and the loader preserved it: 'th e' can only
    // fire after 't h' created 'th' — "the" folds to ONE symbol
    val one = Seq("the").toDF("text")
      .select(TextOps.bpeTokenCount(col("text"), loaded)).head().getLong(0)
    assert(one === 1L, s"'the' folded to $one symbols — rank order lost")
    // a malformed rule fails fast with its line number, never a
    // silently dropped rule (that would shift every downstream count)
    val bad = dir.resolve("bad.txt")
    java.nio.file.Files.writeString(bad, "#version: 0.2\nt h\nx y z\n")
    val e = intercept[IllegalArgumentException](Ingest.readMerges(spark, bad.toString))
    assert(e.getMessage.contains(":3:"), e.getMessage)
  }
}
