package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text/hash primitives (SURVEY.md §2.D/E).
  *
  * Everything here is pure 64-bit integer arithmetic over built-in
  * array expressions — (a) it stays inside whole-stage codegen (no
  * UDFs), and (b) each primitive has a DuckDB SQL twin generated from
  * the SAME Scala constants (the `*Sql` builders below), so oracle
  * parity is structural, not coincidental.
  *
  * Hash quality note: `tcode` is a weak positional token code (length +
  * boundary chars), sufficient to discriminate a natural-language
  * vocabulary for MinHash/SimHash banding; collisions only make the
  * sketch slightly more permissive and occur identically in both
  * engines. For production-grade sketches swap in xxhash64 — the
  * operator shapes don't change.
  */
object TextFunctions {
  val P: Long = 2147483647L           // 2^31-1, Mersenne prime modulus
  val FpMod: Long = 1000000007L       // fingerprint modulus
  val MinhashK = 16                   // signature length
  val Bands = 4                       // LSH bands (rows per band = 4)
  val SimBits = 16                    // SimHash width

  def permA(i: Int): Long = ((2L * i + 1) * 1103515245L) % P
  def permB(i: Int): Long = (i * 40503L + 6789L) % P
  val pow31: Seq[Long] = (0 until 8).scanLeft(1L)((a, _) => a * 31L).take(8)
  /** 31^k mod FpMod — the fingerprint multiplies REDUCED factors only:
    * (c mod M)·(31^k mod M) ≤ ~1e18 < Long.MaxValue, so no silent Spark
    * wraparound / DuckDB BIGINT-overflow error on adversarially long
    * tokens (unreduced 31^7 ≈ 2.75e10 overflowed for codes > ~3.3e8). */
  val pow31m: Seq[Long] = pow31.map(_ % FpMod)

  // ---------------- Spark Column side ----------------

  def tokens(text: Column): Column = split(text, " ")

  /** Weak portable token code — see class doc. */
  def tcode(t: Column): Column =
    length(t).cast("long") * 1000003L + ascii(t) * 81761L +
      ascii(reverse(t)) * 3119L + ascii(substring(concat(t, lit("xx")), 2, 1)) * 31L

  def tokenCodes(text: Column): Column = transform(tokens(text), t => tcode(t))

  /** Codes of the distinct word-3-gram shingles — the MinHash input.
    * Hashing shingles (not tokens) makes the estimated Jaccard match
    * the shingle Jaccard the verify step uses; token-set Jaccard of
    * UNRELATED docs over a finite vocabulary is high (≈0.6 on the test
    * corpus), which made token-based band buckets collapse most of the
    * corpus into one hot bucket. Shingle Jaccard of unrelated docs is
    * ≈0.001, so band collisions ≈ J⁴ are genuinely rare. */
  def shingleCodes(text: Column): Column =
    transform(shingles3(tokens(text)), t => tcode(t))

  /** Full MinHash signature (all [[MinhashK]] minima) in ONE pass: the
    * accumulator carries 16 running minima; per token, zip_with folds
    * in that token's 16 permuted hashes. The per-index formulation
    * (array_min of a transform per minhash) traverses the codes array
    * 16× in the interpreted higher-order-function path — this is the
    * same one-traversal rewrite that made simhash 3-4× faster.
    * Empty codes → null signature (array_min of empty is null in both
    * engines; short docs must NOT share a common bucketable key). */
  def minhashSignature(codes: Column): Column =
    // ALWAYS the fused codegen'd expression (graft.plans.
    // MinHashSigExpr — one codes×16 primitive loop, zero lambda
    // dispatch, same permutation tables and integer arithmetic as the
    // historical HOF fold → bit-identical; TextDedupSpec keeps the
    // HOF reference inlined and asserts parity). Built DIRECTLY as a
    // Catalyst expression, NOT via catalog lookup: round-10 ADVICE —
    // routing on SparkSession.getActiveSession at Column-construction
    // time made the physical plan depend on ambient thread-local
    // state, and a Column built under a GraftExtensions session
    // failed analysis when executed against one without it. A
    // directly-constructed expression resolves on ANY session; the
    // graft_minhash SQL registration remains for SQL-text callers.
    org.apache.spark.sql.GraftSqlBridge.columnOf(
      graft.plans.MinHashSigExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(codes)))

  /** LSH band key from a (bound) signature column: 4 consecutive
    * minhashes packed with *31 chaining (31-bit each — fits a BIGINT).
    * Bind [[minhashSignature]] to a column first so the aggregate runs
    * once per row, not once per band. */
  def bandKeyFromSig(sig: Column, band: Int): Column =
    (0 until MinhashK / Bands).map(r =>
      element_at(sig, band * (MinhashK / Bands) + r + 1))
      .reduce((acc, h) => acc * 31L + h)

  /** 16-bit SimHash: bit b set iff the majority of token-hash bits are
    * 1. ONE aggregate pass: a 17-slot accumulator carries all 16
    * bit-sums plus the token count, and the finish lambda packs the
    * majority bits (16 separate per-bit aggregates re-traverse the
    * array 16× interpreted — measured 3.3× slower at sf0.1). */
  /** ALWAYS the fused codegen'd SimHashExpr, constructed directly —
    * one codes×bits primitive loop, same integer formulas as the
    * historical 17/65-slot HOF accumulator (TextDedupSpec keeps that
    * reference inlined and asserts bit-equality). Direct construction
    * replaces the round-10 getActiveSession routing: no thread-local
    * state, resolvable on any session (the minhashSignature note). */
  private def simhashFused(codes: Column, bits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(
      graft.plans.SimHashExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(codes), bits))

  def simhash16(codes: Column): Column = simhashFused(codes, 16)

  /** 64-bit SimHash — the scale variant of simhash16, same single-pass
    * shape (65-slot accumulator, 4× faster than per-bit aggregates).
    * Per-(token, bit) hashes use the Lehmer-style double-mod (a plain
    * linear form's parity is separable, which would make all 64 bits
    * measure the same token statistic). Σ of distinct powers of two
    * equals the bit pattern (including the sign bit). */
  def simhash64(codes: Column): Column = simhashFused(codes, 64)

  def simhash64Sql(codes: String): String =
    (0 until 64).map { b =>
      s"(CASE WHEN 2*CAST(list_sum(list_transform($codes, c -> (((c*1103515245 + $b*2654435761 + 12345) % $P) * 48271 % $P) % 2)) AS BIGINT) > len($codes) THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Positional polynomial fingerprint: Σ code_i · 31^((i-1) mod 8) mod M.
    * Factors are reduced mod M BEFORE the multiply (see pow31m); the
    * per-term mod keeps partial sums well inside BIGINT range. */
  def fingerprint(codes: Column): Column = {
    val pows = array(pow31m.map(lit): _*)
    aggregate(
      zip_with(codes, sequence(lit(1), size(codes)),
        (c, i) => ((c % FpMod) * element_at(pows, (i - lit(1)) % 8 + lit(1))) % FpMod),
      lit(0L), (acc, x) => acc + x) % FpMod
  }

  /** Distinct word-k-gram shingles (empty for docs shorter than k).
    *
    * Built from zip_with over k-1 shifted slices — NOT a transform
    * whose lambda indexes back into `toks`. The distinction matters:
    * inside a lambda, a captured expression like `element_at(
    * split(text), i)` re-evaluates the split PER ELEMENT, and the
    * explode (GenerateExec) path gets no codegen subexpression
    * elimination to save it — measured 7× slower on t7 at sf0.1
    * (3.7 s → 0.55 s). Here `toks` appears O(k) times per ROW; the
    * zip_with null-pads the shorter slice and concat null-propagates,
    * so the trailing k-1 partial grams drop out in the filter. */
  /** Set-Jaccard over two string arrays: distinct intersection count
    * over raw sizes (array_intersect semantics). NULL when both are
    * empty — matching what the pre-helper inline Divide produced, so
    * a `>= tau` filter rejects empty-vs-empty pairs (NaN would pass
    * it: Spark orders NaN above every double). The explicit guard
    * also keeps ANSI mode from throwing on the zero divisor. */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("double")
    val u = size(a).cast("double") + size(b) - i
    when(u =!= 0.0, i / u)
  }

  /** Prefer the fused codegen'd expression (graft.plans.JaccardExpr —
    * one pass, no intersection array materialized per candidate pair)
    * when GraftExtensions is installed; identical values either way. */
  def jaccardAuto(s: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (s.catalog.functionExists("graft_jaccard")) call_function("graft_jaccard", a, b)
    else jaccard(a, b)

  def shinglesK(toks: Column, k: Int): Column =
    array_distinct(shinglesAllK(toks, k))

  /** Every word-k-gram occurrence in document order (NOT deduped) —
    * for repetition statistics (t9) where multiplicity IS the signal.
    * Same zip_with-over-shifted-slices construction as [[shinglesK]]
    * (see that scaladoc for why a transform lambda is 7× slower). */
  def shinglesAllK(toks: Column, k: Int): Column = {
    require(k >= 1, s"shingle width must be >= 1, got $k")
    val shifted = (1 until k).map(j =>
      slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0))))
    val grams = shifted.foldLeft(toks)((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    // A null `toks` null-propagates through slice/zip_with/filter; keep
    // the original empty-array contract (callers use size()/array ops
    // on the result, and explode of [] vs null is the same zero rows).
    coalesce(filter(grams, g => g.isNotNull),
      array().cast("array<string>"))
  }

  /** Distinct word-3-gram shingles (guarded for short docs). */
  def shingles3(toks: Column): Column = shinglesK(toks, 3)

  /** Stopword list shared by the quality score (t2), language ID (t3)
    * and Corpus.curate. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /** Per-language marker words for the language-ID heuristic, with a
    * deterministic tie order (en > es > de > und). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "das"))

  /** Quality heuristic (t2's formula): length saturation × (1 − punct
    * ratio) × (1 − stopword ratio). Unrounded — callers round for
    * display/oracle parity. Empty text scores 0.0 explicitly: the
    * length factor is 0 there anyway, but the punct ratio would
    * divide by zero (an ERROR under ANSI mode — and empty documents
    * are a certainty in a web crawl). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
    val nPunct = regexp_count(text, lit("[^a-z0-9 ]")).cast("long")
    when(length(text) === 0, 0.0).otherwise(
      least(lit(1.0), length(text) / 500.0) *
        (lit(1.0) - nPunct.cast("double") / length(text)) *
        (lit(1.0) - nStop.cast("double") / nTok))
  }

  /** Marker count for one language of [[LangMarkers]]. */
  def langMarkerCount(text: Column, lang: String): Column = {
    val ws = LangMarkers.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(ws: _*))).cast("long")
  }

  /** Language-ID argmax over [[LangMarkers]] (t3's rule): highest
    * marker count wins, earlier language wins ties, zero counts →
    * "und". */
  def predLang(text: Column): Column = {
    val en = langMarkerCount(text, "en")
    val es = langMarkerCount(text, "es")
    val de = langMarkerCount(text, "de")
    when(en >= es && en >= de && en > 0, "en")
      .when(es >= de && es > 0, "es")
      .when(de > 0, "de")
      .otherwise("und")
  }

  // ---------------- DuckDB SQL twins (same constants) ----------------

  /** SQL: token list of column `c`. */
  def tokensSql(c: String): String = s"string_split($c, ' ')"

  /** SQL: [[qualityScore]]'s DuckDB twin over a text column `c` —
    * the ONE statement of the length/punct/stopword formula (t2Sql
    * and t10Sql both call this; a third restated copy is how the
    * engines silently desync). Unrounded, like the Column version. */
  def qualityScoreSql(c: String): String = {
    val toks = tokensSql(c)
    val inList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""CASE WHEN length($c) = 0 THEN 0.0 ELSE
       |    least(1.0, length($c)/500.0)
       |    * (1.0 - CAST(len(regexp_extract_all($c, '[^a-z0-9 ]')) AS DOUBLE)/length($c))
       |    * (1.0 - CAST(len(list_filter($toks, t -> t IN ($inList))) AS DOUBLE)/len($toks))
       |    END""".stripMargin
  }

  /** SQL: [[predLang]]'s DuckDB twin over a text column `c` — the ONE
    * statement of the marker-argmax rule (t3Sql and t11Sql both call
    * this; qualityScoreSql's restated-copy rationale). */
  def predLangSql(c: String): String = {
    val toks = tokensSql(c)
    def cnt(ws: Seq[String]) =
      s"CAST(len(list_filter($toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
    val en = cnt(LangMarkers(0)._2); val es = cnt(LangMarkers(1)._2); val de = cnt(LangMarkers(2)._2)
    s"""CASE WHEN $en >= $es AND $en >= $de AND $en > 0 THEN 'en'
       |       WHEN $es >= $de AND $es > 0 THEN 'es'
       |       WHEN $de > 0 THEN 'de'
       |       ELSE 'und' END""".stripMargin
  }

  /** SQL: tcode of a scalar token expression `t`. */
  def tcodeSql(t: String): String =
    s"(length($t)*1000003 + ascii($t)*81761 + ascii(reverse($t))*3119 + ascii(substr($t || 'xx', 2, 1))*31)"

  /** SQL: list of token codes for text column `c`. */
  def tokenCodesSql(c: String): String =
    s"list_transform(${tokensSql(c)}, t -> ${tcodeSql("t")})"

  /** SQL: list of shingle codes for text column `c` (minhash input). */
  def shingleCodesSql(c: String): String =
    s"list_transform(${shingles3Sql(tokensSql(c))}, t -> ${tcodeSql("t")})"

  /** SQL: i-th minhash over a codes-list expression. */
  def minhashSql(codes: String, i: Int): String =
    s"list_min(list_transform($codes, c -> (c*${permA(i)} + ${permB(i)}) % $P))"

  def bandKeySql(codes: String, band: Int): String =
    (0 until MinhashK / Bands).map(r => minhashSql(codes, band * (MinhashK / Bands) + r))
      .reduce((acc, h) => s"(($acc)*31 + $h)")

  def simhash16Sql(codes: String): String =
    (0 until SimBits).map { b =>
      s"(CASE WHEN 2*CAST(list_sum(list_transform($codes, c -> ((c*1103515245 + 12345) % $P >> $b) & 1)) AS BIGINT) > len($codes) THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def fingerprintSql(codes: String): String = {
    val pows = pow31m.mkString("[", ", ", "]")
    s"CAST(list_sum(list_transform(generate_series(1, len($codes)), i -> ((($codes)[i] % $FpMod) * ($pows)[(i-1)%8 + 1]) % $FpMod)) AS BIGINT) % $FpMod"
  }

  def shinglesKSql(toks: String, k: Int): String =
    s"list_distinct(${shinglesAllKSql(toks, k)})"

  /** DuckDB twin of [[shinglesAllK]] (all occurrences, no dedup). */
  def shinglesAllKSql(toks: String, k: Int): String = {
    val cat = (0 until k).map(j => s"($toks)[i+$j]").mkString(" || ' ' || ")
    s"CASE WHEN len($toks) >= $k THEN list_transform(generate_series(1, len($toks)-${k - 1}), i -> $cat) ELSE [] END"
  }

  def shingles3Sql(toks: String): String = shinglesKSql(toks, 3)
}
