package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** G-family: multimodal columns (SURVEY.md §2.G).
  *
  * Images/audio/video are opaque `binary` columns plus typed metadata;
  * the heavy decode runs as a batched partition-level function (the
  * Scala analogue of mapInPandas). The decode itself is STUBBED — the
  * image/audio libs aren't in this container — with a deterministic
  * fake; the Spark-side plumbing (schema, batching, partitioning) is
  * real and tested.
  */
object Multimodal {

  // -------------------------------------------------------------------
  // mm1: binary payload + typed metadata. Payload is the utf-8 encoding
  // of the text (a stand-in for real media bytes); metadata (byte size,
  // modality kind) is computed without ever decoding — the cheap
  // pruning pass a media pipeline runs first. Map-only.
  def mm1(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (ascii(col("text")) % 3 + 1).cast("int")).as("kind"))
      .orderBy(col("doc_id"))
  }

  val mm1Sql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  (['image', 'audio', 'video'])[ascii(text) % 3 + 1] AS kind
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm2: batched feature extraction over binary payloads.
  // mapPartitions processes a whole partition per call (amortizing any
  // per-batch model-load cost, exactly like mapInPandas batches); the
  // decode step is a deterministic stub. Output schema is the real one
  // a vision tower would produce: (id, width, height, features).
  // The stub's byte-fold checksum is pure integer arithmetic, so even
  // this query carries a full DuckDB oracle (list_reduce twin).
  def mm2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    docs.mapPartitions { batch =>
      // STUB decode: a real implementation calls the media library here,
      // once per partition-batch. The fake derives deterministic
      // "features" from the bytes so the plumbing is testable.
      batch.map { case (id, bytes) =>
        val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        val w = 64 + (checksum % 64)
        val h = 64 + ((checksum / 64) % 64)
        val f = Array.tabulate(4)(i => ((checksum >> (8 * i)) & 0xff).toDouble / 255.0)
        (id, w, h, f(0), f(1), f(2), f(3))
      }
    }.toDF("doc_id", "width", "height", "f0", "f1", "f2", "f3")
      .orderBy(col("doc_id"))
  }

  // text is pure ASCII, so the utf-8 payload bytes equal the per-char
  // code points — the fold is replicable over ascii(substr(...)).
  val mm2Sql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
      |      generate_series(1, length(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |      (acc, x) -> (acc*31 + x) % 1000000007) AS cs
      |  FROM documents)
      |SELECT doc_id,
      |  64 + cs % 64 AS width,
      |  64 + (cs // 64) % 64 AS height,
      |  CAST((cs >> 0) & 255 AS DOUBLE)/255.0 AS f0,
      |  CAST((cs >> 8) & 255 AS DOUBLE)/255.0 AS f1,
      |  CAST((cs >> 16) & 255 AS DOUBLE)/255.0 AS f2,
      |  CAST((cs >> 24) & 255 AS DOUBLE)/255.0 AS f3
      |FROM c
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm3: frame sampling from video metadata — every 10th frame index,
  // with a timestamp at 24 fps. explode(sequence) is the scalable way
  // to fan one row out to its frames (no driver loop, no UDF).
  def mm3(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_chars") - 1, lit(10L))))
      .select(col("doc_id"), col("frame_idx"),
        round(col("frame_idx") / 24.0, 6).as("ts_sec"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mm3Sql: String =
    """SELECT doc_id, f AS frame_idx, round(f/24.0, 6) AS ts_sec
      |FROM documents, LATERAL (SELECT unnest(generate_series(0, n_chars-1, 10)) AS f)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // -------------------------------------------------------------------
  // mm4: corpus modality composition — the per-modality storage report
  // (counts, total/avg bytes, size extremes) a multimodal-corpus build
  // publishes before deciding shard layouts and decode budgets.
  // Reuses mm1's metadata pass (size + kind WITHOUT decoding) and
  // reduces to O(modalities) rows: scan → map-side partial agg →
  // 3-key shuffle. Byte totals are exact integers.
  def mm4(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (ascii(col("text")) % 3 + 1).cast("int")).as("kind"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        round(sum(col("n_bytes")).cast("double") / count(lit(1)), 2).as("avg_bytes"))
      .orderBy(col("kind"))
  }

  val mm4Sql: String =
    """SELECT (['image', 'audio', 'video'])[ascii(text) % 3 + 1] AS kind,
      |  count(*) AS n_items,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
      |  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
      |  round(CAST(sum(octet_length(encode(text))) AS DOUBLE) / count(*), 2) AS avg_bytes
      |FROM documents
      |GROUP BY 1
      |ORDER BY kind""".stripMargin

  // -------------------------------------------------------------------
  // mm5: content-hash payload dedup report — the storage-level dedup a
  // media lake runs BEFORE any decode: identical blobs (re-uploads,
  // mirror crawls) collapse on a content hash, and the report prices
  // what dedup would reclaim per modality. No decode, no pairwise
  // compare — one hash per blob, one shuffle at group cardinality.
  //
  // Scale shape: groupBy(kind, md5(payload)) with map-side combine
  // (duplicate blobs on the same executor collapse before the
  // shuffle); a hash group is a duplicate-set so its size is bounded
  // by the corpus's true duplication, never by a hot key. The second
  // agg is O(#kinds). wasted_bytes = (copies−1)·size summed per kind —
  // payload size is constant within a hash group by construction.
  def mm5(s: SparkSession, dir: String): DataFrame = {
    val groups = Tables.documents(s, dir)
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (ascii(col("text")) % 3 + 1).cast("int")).as("kind"),
        md5(col("payload")).as("h"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("kind"), col("h"))
      .agg(count(lit(1)).as("copies"), first(col("n_bytes")).as("sz"))
    groups.groupBy(col("kind"))
      .agg(sum(col("copies")).as("n_blobs"),
        count(lit(1)).as("n_unique"),
        (sum(col("copies")) - count(lit(1))).as("n_dup_blobs"),
        sum((col("copies") - 1) * col("sz")).as("wasted_bytes"))
      .orderBy(col("kind"))
  }

  val mm5Sql: String =
    """WITH g AS (
      |  SELECT (['image', 'audio', 'video'])[ascii(text) % 3 + 1] AS kind,
      |    md5(text) AS h,  -- this DuckDB's md5 is VARCHAR-only; the digest of the
      |                     -- utf-8 payload equals the digest of the string
      |    count(*) AS copies,
      |    min(octet_length(encode(text))) AS sz
      |  FROM documents GROUP BY 1, 2)
      |SELECT kind,
      |  CAST(sum(copies) AS BIGINT) AS n_blobs,
      |  count(*) AS n_unique,
      |  CAST(sum(copies) - count(*) AS BIGINT) AS n_dup_blobs,
      |  CAST(sum((copies - 1) * sz) AS BIGINT) AS wasted_bytes
      |FROM g
      |GROUP BY kind
      |ORDER BY kind""".stripMargin

  // -------------------------------------------------------------------
  // mm6: shard-layout plan — content-hash-assign blobs to 16 shards
  // and report each shard's blob count and byte volume against the
  // ideal (total/16). Content addressing (first md5 nibble) makes the
  // assignment stable under re-runs and independent of ingest order —
  // the property a resumable 100 TB shard-writer needs — and the skew
  // column IS the decision output: a skew near 1.0 means hash
  // sharding suffices; a hot shard would send the writer to a
  // byte-aware planner instead. Map-side assign, O(shards) agg.
  def mm6(s: SparkSession, dir: String): DataFrame = {
    val blobs = Tables.documents(s, dir)
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(substring(md5(col("payload")), 1, 1).as("shard"),
        length(col("payload")).cast("long").as("n_bytes"))
    val per = blobs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("n_bytes")).as("shard_bytes"))
    per.withColumn("__total", sum(col("shard_bytes")).over(Window.partitionBy()))
      .select(col("shard"), col("n_blobs"), col("shard_bytes"),
        (col("shard_bytes").cast("double") / (col("__total").cast("double") / 16.0))
          .as("skew_vs_ideal"))
      .orderBy(col("shard"))
  }

  val mm6Sql: String =
    """WITH b AS (
      |  SELECT substr(md5(text), 1, 1) AS shard,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |p AS (SELECT shard, count(*) AS n_blobs, CAST(sum(n_bytes) AS BIGINT) AS shard_bytes
      |      FROM b GROUP BY 1)
      |SELECT shard, n_blobs, shard_bytes,
      |  CAST(shard_bytes AS DOUBLE) / (CAST(sum(shard_bytes) OVER () AS DOUBLE) / 16.0)
      |    AS skew_vs_ideal
      |FROM p
      |ORDER BY shard""".stripMargin

  // -------------------------------------------------------------------
  // mm7: decode-budget plan — given a global frame-decode budget
  // (decode is THE dominating multimodal cost), allocate each video a
  // quota proportional to its frame count with a per-video floor
  // (short clips must not starve), capped at its own length, plus the
  // sampling stride that realizes the quota. m16's token-budget shape
  // applied to frames: ONE 1-row total broadcast, then every quota is
  // a map-side integer expression — exact in both engines, no FP
  // proration drift. A mapInPandas decoder then reads `stride` as its
  // every-k-th argument (mm3's sampling machinery).
  def mm7(s: SparkSession, dir: String): DataFrame = {
    val Budget = 100000L // frames per corpus pass
    val Floor = 8L       // minimum frames per video
    val v = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_frames"))
    val tot = v.agg(sum(col("n_frames")).as("__tot"))
    v.crossJoin(broadcast(tot)) // provably 1 row
      .withColumn("quota", least(col("n_frames"),
        greatest(lit(Floor), expr(s"(${Budget}L * n_frames) div __tot"))))
      .select(col("doc_id"), col("n_frames"), col("quota"),
        expr("(n_frames + quota - 1) div quota").as("stride")) // ceil division
      .orderBy(col("doc_id"))
  }

  val mm7Sql: String =
    """WITH tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS t FROM documents),
      |q AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_frames,
      |    least(CAST(n_chars AS BIGINT),
      |          greatest(8, (100000 * CAST(n_chars AS BIGINT)) // t)) AS quota
      |  FROM documents, tot)
      |SELECT doc_id, n_frames, quota,
      |  (n_frames + quota - 1) // quota AS stride
      |FROM q
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm8: perceptual-hash near-dup detection over binary payloads — the
  // image-dedup pass (pHash/dHash family) every multimodal corpus runs.
  // A real pHash comes from the DECODED image's DCT; the decode is this
  // container's one stub (mm2), so the hash here is a simhash64 over
  // the payload's byte 4-grams (ASCII text ⇒ byte == char code point,
  // same equivalence mm2 documents) — the locality-sensitive
  // bit-majority structure is the same, and everything downstream IS
  // the production machinery: 64-bit hash, 4×16-bit pigeonhole chunk
  // bucketing (Hamming ≤ 3 ⇒ at least one of 4 chunks untouched, so
  // banding is lossless at the threshold), bucket-join candidates only
  // (never doc×doc), exact Hamming verify, per-doc best match.
  // Scale: the join shuffles fixed-width (chunk, value) keys; output is
  // LEFT-joined back so every payload reports (is_neardup 0/1).
  //
  // Three costs were measured and engineered out of the first cut
  // (123 s → ~2 s at sf0.1):
  //  - per-position substr() on a string re-scans from the start, so
  //    extracting L overlapping grams was O(L²) PER PAYLOAD. The
  //    byte codes are now materialized ONCE as an array column and
  //    grams read them via O(1) element_at — O(L);
  //  - hashing every overlapping 4-gram put 64·L interpreted
  //    higher-order-function evals per payload into simhash64. The
  //    feature set is subsampled by CONTENT (keep grams ≡ 0 mod 4 —
  //    winnowing's trick: membership depends on the gram's bytes,
  //    never its offset, so the sampled set is shift-invariant and
  //    identical payloads still collide exactly) — 4× fewer features
  //    at the cost of a noisier (still unbiased) bit majority;
  //  - the signature frame fed both the bucket explode and the final
  //    left-join, and Spark computes an unshared subtree TWICE —
  //    localCheckpoint materializes the (doc_id, ncodes, phash) frame
  //    once (24 B/doc; d12's exchange lesson).
  // Payloads with NO sampled gram (tiny, or < 4 bytes) hash to 0 and
  // are excluded from bucketing — they must not pair with each other.
  // A MaxBucket cap (Dedup's rule, mirrored in the oracle via
  // QUALIFY) keeps a degenerate hot bucket from going quadratic.
  private val Mm8MaxBucket = 1000

  def mm8(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.simhash64
    val grams = when(length(col("text")) >= 4,
      filter(
        transform(sequence(lit(1), length(col("text")) - 3),
          i => element_at(col("__chars"), i) * 29791L +
            element_at(col("__chars"), i + lit(1)) * 961L +
            element_at(col("__chars"), i + lit(2)) * 31L +
            element_at(col("__chars"), i + lit(3))),
        c => c % 4 === 0))
      .otherwise(array().cast("array<bigint>"))
    // feature extraction is CPU-bound per payload, so it must run at
    // CLUSTER parallelism, not input-split parallelism (locally: one
    // single-row-group parquet file = one task). A bare repartition is
    // not enough — Catalyst pushes the projection below the exchange,
    // landing the per-payload compute back on the scan task — so the
    // exchange is pinned with a checkpoint of the raw (id, payload)
    // pairs, the same bytes the shuffle itself spills. On a cluster
    // with many splits this is one extra payload write, the standard
    // price of decoupling decode-bound work from input skew.
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint()
      .select(col("doc_id"), col("text"),
        transform(split(col("text"), ""), ch => ascii(ch).cast("bigint")).as("__chars"))
      .select(col("doc_id"), grams.as("__codes"))
      .select(col("doc_id"), size(col("__codes")).cast("long").as("__ncodes"),
        simhash64(col("__codes")).as("phash"))
      .localCheckpoint()
    val chunks0 = sigs.filter(col("__ncodes") > 0).select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        shiftright(col("phash"), 16 * b).bitwiseAND(lit(65535L)) * 4 + b): _*))
        .as("bkey"))
    val chunks = chunks0
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("bkey"))))
      .filter(col("__bsz") <= Mm8MaxBucket).drop("__bsz")
    val a = chunks.select(col("doc_id").as("x"), col("phash").as("px"), col("bkey"))
    val b = chunks.select(col("doc_id").as("y"), col("phash").as("py"), col("bkey"))
    val pairs = a.join(b, Seq("bkey")).filter(col("x") < col("y"))
      .select(col("x"), col("y"), col("px"), col("py")).distinct()
    val nd = pairs
      .withColumn("h", bit_count(expr("px ^ py")).cast("long"))
      .filter(col("h") <= 3)
    val sym = nd.select(col("x").as("d"), col("y").as("o"), col("h"))
      .union(nd.select(col("y").as("d"), col("x").as("o"), col("h")))
    val w = Window.partitionBy(col("d")).orderBy(col("h"), col("o"))
    val best = sym.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
    sigs.join(best, sigs("doc_id") === best("d"), "left")
      .select(col("doc_id"), col("phash"), col("o").as("best_match"),
        col("h").as("best_hamming"),
        when(col("o").isNull, 0L).otherwise(1L).as("is_neardup"))
      .orderBy(col("doc_id"))
  }

  val mm8Sql: String = {
    import graft.functions.TextFunctions.simhash64Sql
    s"""WITH ch AS (
       |  SELECT doc_id, length(text) AS len,
       |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)) AS chars
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN len >= 4 THEN
       |      list_filter(list_transform(generate_series(1, len - 3),
       |        i -> chars[i] * 29791 + chars[i + 1] * 961
       |           + chars[i + 2] * 31 + chars[i + 3]),
       |        c -> c % 4 = 0)
       |    ELSE CAST([] AS BIGINT[]) END AS codes
       |  FROM ch),
       |s AS (SELECT doc_id, len(codes) AS ncodes, ${simhash64Sql("codes")} AS phash FROM g),
       |k AS (
       |  SELECT doc_id, phash, ((phash >> (16 * b)) & 65535) * 4 + b AS bkey
       |  FROM s, LATERAL (SELECT unnest([0, 1, 2, 3]) AS b)
       |  WHERE ncodes > 0
       |  QUALIFY count(*) OVER (PARTITION BY ((phash >> (16 * b)) & 65535) * 4 + b) <= 1000),
       |p AS (
       |  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y, a.phash AS px, b.phash AS py
       |  FROM k a JOIN k b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |nd AS (
       |  SELECT x, y, CAST(bit_count(xor(px, py)) AS BIGINT) AS h
       |  FROM p WHERE bit_count(xor(px, py)) <= 3),
       |sym AS (SELECT x AS d, o, h FROM (
       |  SELECT x, y AS o, h FROM nd UNION ALL SELECT y AS x, x AS o, h FROM nd)),
       |best AS (
       |  SELECT d, o, h FROM sym
       |  QUALIFY row_number() OVER (PARTITION BY d ORDER BY h, o) = 1)
       |SELECT s.doc_id, s.phash, best.o AS best_match, best.h AS best_hamming,
       |  CAST(CASE WHEN best.o IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_neardup
       |FROM s LEFT JOIN best ON s.doc_id = best.d
       |ORDER BY s.doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm8_phash_neardup" -> (mm8 _),
    "mm7_decode_budget" -> (mm7 _),
    "mm6_shard_plan" -> (mm6 _),
    "mm5_payload_dedup" -> (mm5 _),
    "mm1_binary_meta" -> (mm1 _), "mm2_feature_extract" -> (mm2 _), "mm3_frame_sample" -> (mm3 _),
    "mm4_modality_stats" -> (mm4 _))

  def oracles: Map[String, String] = Map(
    "mm8_phash_neardup" -> mm8Sql,
    "mm7_decode_budget" -> mm7Sql,
    "mm6_shard_plan" -> mm6Sql,
    "mm5_payload_dedup" -> mm5Sql,
    "mm1_binary_meta" -> mm1Sql, "mm2_feature_extract" -> mm2Sql,
    "mm3_frame_sample" -> mm3Sql, "mm4_modality_stats" -> mm4Sql)
}
