package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar library (LLM-data extensions, BASELINE.json north
  * star): tokenization, shingling, portable hashing, quality features.
  * Everything is pure `Column` expressions — no UDFs — so whole-stage
  * codegen and pushdown stay intact at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish token counting: letter runs, single digits, single
    * non-alphanumeric marks (a cheap stand-in for a real BPE vocab that
    * preserves the scaling shape: count ∝ subword units, not words). */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Word n-gram shingles from a token array: ["a","b","c"], n=2 ->
    * ["a b","b c"]. Empty result when fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Stable 60-bit hash, portable across engines: the first 15 hex chars of
    * md5 parsed as an integer. DuckDB twin:
    * `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`. Always >= 0.
    * Evaluated by the codegen'd [[expressions.Md5Prefix60]] (digest bytes
    * directly — no hex-string round trip). */
  def portableHash60(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      expressions.Md5Prefix60(GraftColumnBridge.expression(c.cast("binary"))))
  }

  /** Fused tokenize→shingle→hash→distinct in ONE codegen'd pass
    * ([[expressions.ShingleHashesExpr]]): bit-identical to
    * `array_distinct(transform(shingles(tokens(text), n), portableHash60))`
    * (spec-pinned) but ~50× cheaper — the declarative chain runs as
    * interpreted higher-order evals with a per-element md5 sub-eval, and it
    * is the hot per-document stage of every dedup operator. */
  def shingleHashes60(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(expressions.ShingleHashesExpr(
      GraftColumnBridge.expression(text), n))
  }

  /** Positional sibling of [[shingleHashes60]]: ALL shingle hashes in
    * token order (no dedup), so `posexplode` recovers gram positions —
    * bit-identical to `transform(shingles(tokens(text), n),
    * portableHash60)` (spec-pinned) in one codegen'd pass. */
  def shingleHashes60All(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(expressions.ShingleHashesAllExpr(
      GraftColumnBridge.expression(text), n))
  }

  /** Universal-hash family over a base hash: h_ab(x) = (a*(x mod p) + b) mod p
    * with p = 2^31 - 1 (products stay within Long).
    *
    * NOTE (bucket families): every member of this family is a function of
    * `x mod p` alone, so two 60-bit inputs congruent mod p collide in
    * EVERY member — fine for MinHash (min-wise use over small per-doc
    * sets), but it floors the false-positive rate of a Bloom/CMS bucket
    * family at ~n/2^31 regardless of width. Bucket families use
    * [[hash60b]]-based double hashing instead. */
  val MinhashPrime: Long = 2147483647L
  def universalHash(x: Column, a: Long, b: Long): Column =
    pmod(lit(a) * pmod(x, lit(MinhashPrime)) + lit(b), lit(MinhashPrime))

  /** Second, independent 60-bit hash of a [[portableHash60]] value —
    * md5 of the first hash's decimal string, salted by the family seed.
    * Feeds Kirsch–Mitzenmacher double hashing (`(h1 + j·h2) mod m`) in
    * the Bloom/CMS bucket families: positions depend on the full 60-bit
    * input (collision probability 2^-60 per pair, not the universal
    * family's mod-2^31 collapse). Engine-portable: the DuckDB twin is
    * `md5(concat(CAST(h1 AS VARCHAR), '#<seed>'))` prefix arithmetic. */
  def hash60b(h1: Column, seed: Long): Column =
    portableHash60(concat(h1.cast("string"), lit("#" + seed)))

  /** Deterministic (a, b) parameter list for a minhash family. */
  def minhashParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (MinhashPrime - 1) + 1,
      math.abs(rnd.nextLong()) % MinhashPrime))
  }

  /** MinHash signature: array of per-hash minima over the shingle-hash
    * array. NULL when the shingle set is empty. Evaluated by the codegen'd
    * single-pass [[expressions.MinhashSig]] (one traversal updating all k
    * minima — vs k interpreted `array_min(transform(...))` passes; the
    * declarative twin is kept in MinhashSigSpec as the semantic oracle). */
  def minhashSignature(shingleHashes: Column, params: Seq[(Long, Long)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(expressions.MinhashSig(
      GraftColumnBridge.expression(shingleHashes),
      params.map(_._1), params.map(_._2)))
  }

  /** The declarative (interpreted higher-order) form of [[minhashSignature]]
    * — k separate passes. Retained as the spec oracle for the codegen'd
    * expression; do not use on hot paths. */
  def minhashSignatureHof(shingleHashes: Column, params: Seq[(Long, Long)]): Column =
    when(size(shingleHashes) === 0, lit(null))
      .otherwise(array(params.map { case (a, b) =>
        array_min(transform(shingleHashes, x => universalHash(x, a, b)))
      }: _*))

  /** 32-bit SimHash over a token array, single pass: accumulate the
    * ±1-per-bit sums in a 32-element array, then assemble the fingerprint
    * (bit j set iff its weighted sum > 0). Engine-portable: integer-only
    * math on [[portableHash60]] token hashes. */
  def simhash32(toks: Column): Column = {
    val perTokenBits = (x: Column) =>
      array((0 until 32).map(j =>
        (shiftright(x, j).bitwiseAND(lit(1L))) * 2 - 1): _*)
    val sums = aggregate(
      transform(toks, t => portableHash60(t)),
      array_repeat(lit(0L), 32),
      (acc, x) => zip_with(acc, perTokenBits(x), (s, d) => s + d))
    (0 until 32).map(j =>
      when(element_at(sums, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Fused tokenize→hash→bit-vote SimHash in ONE codegen'd pass
    * ([[expressions.SimHash32Expr]]): bit-identical to
    * `simhash32(tokens(text))` (spec-pinned in SimHash32Spec) but avoids
    * the interpreted per-token `aggregate`/`zip_with` evaluation — the hot
    * stage of the SimHash dedup operators. */
  def simhash32Fused(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(expressions.SimHash32Expr(
      GraftColumnBridge.expression(text)))
  }

  /** Fused 64-bit SimHash ([[expressions.SimHash64Expr]]) — the scale
    * path of the SimHash dedup family: same tokenize→hash→bit-vote
    * pipeline as [[simhash32Fused]] but voting all 64 bits of the
    * md5 prefix, so band signatures can be 16 bits wide at the same
    * pigeonhole recall contract. */
  def simhash64Fused(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(expressions.SimHash64Expr(
      GraftColumnBridge.expression(text)))
  }

  /** Rolling/polynomial document fingerprint: the minimum [[portableHash60]]
    * over word `n`-shingles (1-hash MinHash — a winnowing-style content
    * fingerprint stable under small reorderings of unrelated regions). */
  def docFingerprint(text: Column, n: Int = 5): Column =
    array_min(shingleHashes60(text, n))

  /** True when `c`'s chars, read as bytes (a latin-1 decode of raw
    * bytes -- every char <= U+00FF), form a valid UTF-8 sequence.
    * Implemented as two ITERATIVE probes, never a whole-string
    * `(?:alt|alt|...)*` regex: Java's Pattern engine recurses once
    * per iteration of a repeated group, so the classic UTF-8
    * validation regex stack-overflows around ~100 KB of input -- the
    * round-12 WarcScale rehearsal found exactly that on 128 KiB crawl
    * pages. Instead: (1) a char-class scan proves every char is a
    * byte, then (2) the bytes re-encode and cast back through
    * UTF8String, whose java-String materialization (forced by the
    * regexp engine) replaces every malformed sequence with U+FFFD --
    * the replacement char's presence IS the invalidity verdict.
    * Overlong/surrogate encodings also decode to U+FFFD, so the old
    * regex's exclusions are preserved. One documented edge: a GENUINE
    * U+FFFD already in the bytes reads as invalid -- conservative for
    * both callers (repairMojibake leaves the string alone;
    * [[CharsetDecode]] routes an already-corrupt page to the cp1252
    * fallback). Shared by [[repairMojibake]] (validity proven BEFORE
    * `decode` runs -- Spark 4's decode raises on malformed input) and
    * [[CharsetDecode]]'s mislabeled-utf-8 detection (a binary cast
    * keeps invalid bytes RAW inside UTF8String, so only a
    * materializing probe sees them). */
  def isUtf8Bytes(c: Column): Column = {
    val allBytes = !c.rlike("[^\u0000-\u00FF]")
    allBytes &&
      !encode(c, "ISO-8859-1").cast("string").rlike("\uFFFD")
  }

  /** Mojibake repair — the encoding-corruption fix of corpus cleaning:
    * text that was UTF-8 bytes mis-decoded as Latin-1 (the classic
    * "CafA(c)") re-encodes to its original bytes losslessly, so the repair
    * is the built-in codegen'd round trip
    * `decode(encode(text, ISO-8859-1), UTF-8)`. Two regex gates keep it
    * safe: (1) only strings showing the UTF-8-lead-byte-as-Latin-1
    * signature (a C2-DF char followed by a continuation char) are
    * touched; (2) the WHOLE string must be a structurally valid UTF-8
    * byte sequence under the chars-are-bytes reading (the classic UTF-8
    * validation regex, surrogate and overlong ranges excluded) — Spark
    * 4's `decode` raises on malformed input rather than replacing, so
    * validity is proven BEFORE decode ever runs, and genuine Latin-1
    * prose (which fails the structure check) never degrades. */
  def repairMojibake(c: Column): Column = {
    val suspicious = c.rlike("[\u00C2-\u00DF][\u0080-\u00BF]")
    when(suspicious && isUtf8Bytes(c),
      decode(encode(c, "ISO-8859-1"), "UTF-8")).otherwise(c)
  }
}
