package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion sources (the Spark-native analogue of the reference's
  * CSV/Excel upload path, /root/reference/main.py:396-413).
  *
  * The reference reads a single file into pandas; these readers target
  * directories of files on distributed storage. Schema inference is
  * opt-in (it costs an extra pass — at 100 TB always pass a schema or
  * let `inferSample` bound the pass to a fraction).
  *
  * .xlsx uploads are read via `readExcel` (graft.sources.Excel — a
  * dependency-free zip+StAX parser, driver-side like every xlsx
  * reader); convert to parquet before serious processing.
  */
object Ingest {

  /** Excel upload parity (reference main.py:402,410): one sheet of an
    * .xlsx as a typed DataFrame. See graft.sources.Excel for the
    * supported cell kinds and scale caveats. */
  def readExcel(s: SparkSession, path: String, sheet: Option[String] = None,
      header: Boolean = true, inferTypes: Boolean = true): DataFrame =
    Excel.read(s, path, sheet, header, inferTypes)

  /** CSV with the reference's ergonomics: header row, type inference,
    * permissive parsing with a quarantine column for malformed rows
    * (instead of pandas' hard failure). */
  def readCsv(s: SparkSession, path: String, inferSchema: Boolean = true): DataFrame =
    s.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("encoding", "UTF-8")
      .option("nullValue", "")
      .csv(path)

  /** Line-delimited JSON. */
  def readJson(s: SparkSession, path: String): DataFrame =
    s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Parquet (the canonical lake format for every graft table). */
  def readParquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  /** ORC (the other columnar lake format; same pushdown/pruning story
    * as parquet). */
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Normalize column names the way the reference does
    * (strip + lowercase, main.py:200) plus de-spacing — applied at the
    * ingest boundary so every downstream operator sees stable names. */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) =>
      d.withColumnRenamed(c, c.trim.toLowerCase.replaceAll("\\s+", "_")))

  /** Write a table for scale: snappy parquet, optionally partitioned
    * by a low-cardinality column — the layout that gives downstream
    * queries partition pruning. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Parse an embedded JSON string column with an EXPLICIT schema —
    * the 100 TB path for q13-style extraction: one parse per row into
    * typed fields (vs one regex pass per extracted field), no schema
    * inference job. */
  def parseJsonColumn(df: DataFrame, column: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.withColumn(s"${column}_parsed", from_json(col(column), schema))

  /** Bucketed managed table: pre-shuffles data into `nBuckets` by
    * `bucketCol` at write time so every later join/agg on that key is
    * shuffle-free (the 100 TB answer for fact-fact joins repeated
    * across a pipeline — pay the shuffle once, at ingest). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Compact a directory of small parquet files into ~`targetMB`-sized
    * ones — THE recurring operational job of any streaming-fed or
    * over-parallel lake (10k × 1 MB files cost 10k footer reads, 10k
    * scheduler tasks, and NameNode/listing pressure per query; the
    * same bytes in 80 files cost 80). Sizing comes from the actual
    * on-disk bytes listed through the session's Hadoop FileSystem —
    * so hdfs:// and s3a:// URIs size correctly, not just local paths
    * (a java.io.File walk silently returns 0 there and everything
    * would coalesce into ONE task). `coalesce` (not repartition)
    * merges without a shuffle. outDir must differ from inDir:
    * mode("overwrite") deletes the output before writing, and the
    * lazily-read input would be gone mid-scan. Returns the file count
    * written. */
  def compactSmallFiles(s: SparkSession, inDir: String, outDir: String,
      targetMB: Int = 128): Int = {
    val conf = s.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = in.getFileSystem(conf)
    val inQ = fs.makeQualified(in)
    require(inQ != out.getFileSystem(conf).makeQualified(out),
      s"compactSmallFiles: outDir must differ from inDir ($inQ) — " +
        "overwrite would delete the input while reading it")
    var bytes = 0L
    val it = fs.listFiles(inQ, /* recursive = */ true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) bytes += st.getLen
    }
    val nFiles = math.max(1, math.ceil(bytes / (targetMB * 1024.0 * 1024.0)).toInt)
    s.read.parquet(inDir).coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Sorted parquet write: globally range-sort on `sortCols` so each
    * file (and each row group inside it) covers a narrow slice of the
    * key space — parquet min/max statistics then let a reader SKIP
    * whole row groups for selective predicates on those columns.
    * Complements partitionBy (coarse directory pruning on
    * low-cardinality keys) for high-cardinality sort keys like
    * timestamps or ids. The sort is one range-shuffle at write time;
    * it buys every future scan's skipping. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Option[Int] = None): Unit = {
    val ranged = numFiles match {
      case Some(n) => df.repartitionByRange(n, sortCols.map(col): _*)
      case None    => df.repartitionByRange(sortCols.map(col): _*) // session parallelism / AQE decides
    }
    ranged.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order (Morton-curve) clustered parquet write: interleave the
    * bits of each column's quantized cell id and range-sort on the
    * resulting z-value, so every file AND row group covers a small
    * hyper-rectangle of the multi-dimensional key space. Parquet
    * min/max statistics then skip row groups for selective predicates
    * on ANY of the z columns — where [[writeSorted]] buys skipping
    * only on its leading sort key. This is the standard multi-
    * dimensional clustering layout for large scans (z-ordering as in
    * the Bayer/Markl UB-tree line of work, re-expressed as a one-shot
    * Spark write): the quantize + interleave is pure codegen'd
    * integer arithmetic per row, the sort is ONE range shuffle at
    * write time, and every future scan inherits the skipping.
    *
    * Quantization is equal-width over each column's [min, max]
    * (measured by a single 1-row aggregate; the driver sees 2·k
    * scalars, never data). Equal-width keeps the cell arithmetic
    * codegen'd but is skew-sensitive: a dimension where 99% of values
    * share one cell contributes no discrimination — pre-transform
    * such a column (e.g. log for heavy-tailed amounts) or fall back
    * to [[writeSorted]] on the dominant key. Constant columns
    * degrade gracefully to cell 0. Nulls sort first (cell 0).
    *
    * `bits` per dimension: bits·k must fit a signed long; 16 bits ×
    * 2-4 dims (the useful range — beyond 4 dims z-order's locality
    * collapses) gives 65k cells per dim, far finer than any row-group
    * granularity. The z column is internal and dropped before write
    * (a Project after the sort preserves intra-partition order). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Option[Int] = None, bits: Int = 16): Unit = {
    require(zCols.size >= 2, "z-ordering needs >= 2 dims (use writeSorted for 1)")
    require(zCols.size <= 4, s"z-order locality collapses beyond 4 dims (got ${zCols.size})")
    require(bits * zCols.size <= 62, s"bits*dims must fit a signed long ($bits*${zCols.size})")
    val cells = (1L << bits).toDouble
    // one 1-row aggregate for every dim's min/max
    val aggCols = zCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"mn$i"), max(col(c).cast("double")).as(s"mx$i"))
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*).head()
    val zExpr = zCols.zipWithIndex.map { case (c, j) =>
      val mn = Option(row.get(row.fieldIndex(s"mn$j"))).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val mx = Option(row.get(row.fieldIndex(s"mx$j"))).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val span = mx - mn
      val cell =
        if (span <= 0) lit(0L) // constant (or all-null) dim
        else least(greatest(
          floor((col(c).cast("double") - lit(mn)) / lit(span) * lit(cells)).cast("long"),
          lit(0L)), lit((1L << bits) - 1))
      val safeCell = coalesce(cell, lit(0L)) // nulls sort first
      // spread cell j's bit i to interleaved position i*k + j
      (0 until bits).map { i =>
        shiftleft(shiftright(safeCell, i).bitwiseAND(lit(1L)), i * zCols.size + j)
      }.reduce[Column](_.bitwiseOR(_))
    }.reduce[Column](_.bitwiseOR(_))
    val withZ = df.withColumn("__z", zExpr)
    val ranged = numFiles match {
      case Some(n) => withZ.repartitionByRange(n, col("__z"))
      case None    => withZ.repartitionByRange(col("__z"))
    }
    ranged.sortWithinPartitions(col("__z")).drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Standard merges.txt loader (round-17 VERDICT directive 7) — the
    * published-tokenizer artifact format every BPE release ships: an
    * optional `#version: …` header line, then ONE merge rule per line
    * as two space-separated symbols, rank = line order. Returns the
    * rank-ordered pairs [[graft.operators.TextOps.bpeTokenCount]] /
    * BpeCountExpr consume (the compiled counter already takes any
    * merges table; this closes the load-a-real-file gap). Empty lines
    * are skipped; a malformed line fails fast with its line number —
    * a silently dropped rule would change every downstream token
    * count. Vocab-bounded (~50k lines for published tokenizers), read
    * whole on the driver through the session's Hadoop FS so HDFS/S3
    * paths resolve like any table path. */
  def readMerges(s: SparkSession, path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.linesIterator.zipWithIndex.toSeq
      .map { case (l, i) => (l.trim, i + 1) }
      .filter { case (l, i) => l.nonEmpty && !(i == 1 && l.startsWith("#version")) }
      .map { case (l, i) =>
        l.split(" ") match {
          case Array(left, right) => (left, right)
          case parts => throw new IllegalArgumentException(
            s"$path:$i: a merges.txt rule is 'left right' (two space-separated " +
              s"symbols); got ${parts.length} fields in '$l'")
        }
      }
  }
}
