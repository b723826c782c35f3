package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-exact text kernels, as composable Column functions.
  *
  * Semantics recovered from the reference mapper binary
  * (`MapperImpl.so → Mapper::lowerRemovePunc @0x1f558`,
  * `Mapper::tokenize @0x1f8da`; SURVEY.md §4.3.2):
  *
  *  - punctuation characters are '''deleted''' (not replaced by a space):
  *    `don't` → `dont`, `end.Start` → `endstart`;
  *  - ASCII lowercasing (C-locale `std::tolower`);
  *  - split on a '''single space''' `' '` only (`getline` delim 0x20) —
  *    tabs are NOT delimiters and survive inside tokens;
  *  - empty tokens dropped (`empty()` check @0x1f976).
  *
  * Everything here stays inside Catalyst built-ins so the whole pipeline
  * is codegen'd and the `regexp_replace`/`split` fold into one
  * WholeStageCodegen span over the scan.
  */
object TextFunctions {

  /** Java regex class matching C `ispunct` in the C locale: the 32 ASCII
    * punctuation characters. `\p{Punct}` in Java is exactly
    * {{{!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~}}} — the same set.
    */
  val PunctClass = "[\\p{Punct}]"

  private val AsciiUpper = ('A' to 'Z').mkString
  private val AsciiLower = ('a' to 'z').mkString

  /** ASCII-only lowercase, matching the reference's C-locale
    * `std::tolower` exactly: 'É' passes through unchanged, where Spark's
    * Unicode-aware `lower()` would map it. `translate` is codegen'd and
    * has the same semantics in DuckDB, so the oracle can mirror it. */
  def asciiLower(c: Column): Column = translate(c, AsciiUpper, AsciiLower)

  /** `lowerRemovePunc` as Catalyst built-ins: strip ASCII punctuation,
    * then ASCII-lowercase. Kept as the reference implementation that the
    * fused-kernel equivalence property checks against (and the shape the
    * DuckDB oracle mirrors). */
  def normalizeBuiltin(c: Column): Column =
    asciiLower(regexp_replace(c, PunctClass, ""))

  /** `lowerRemovePunc`, fused: one codegen'd byte-level pass via the
    * native [[graft.functions.expr.LowerRemovePunc]] expression — no
    * regex engine, no intermediate string. Semantics are identical to
    * [[normalizeBuiltin]] (ScalaCheck-pinned), so every oracle still
    * matches. */
  def normalize(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expr.LowerRemovePunc(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Unicode NFC canonicalization via the native codegen kernel
    * [[graft.functions.expr.NfcNormalize]] — the composed/decomposed
    * unification every hashing or tokenizing pass needs first. */
  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expr.NfcNormalize(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** `tokenize`: split the normalized line on single spaces, keeping empty
    * fragments out of the result (the reference emits one `(word,1,part)`
    * tuple per non-empty fragment). Returns `array<string>`.
    *
    * NB: the split pattern is a literal single space, not `\\s+` — the
    * reference never treats tabs or other whitespace as delimiters.
    *
    * Empty fragments are dropped with `array_remove(_, "")` rather than a
    * `filter` lambda: higher-order functions are interpreted (no codegen,
    * no CSE), and CollapseProject can inline the normalize+split into every
    * lambda reference. `array_remove` is a codegen'd built-in with identical
    * semantics here (`split` never yields nulls), keeping the whole token
    * path inside one WholeStageCodegen span.
    */
  def tokenize(c: Column): Column =
    array_remove(split(normalize(c), " ", -1), "")

  /** Tokens of raw (un-normalized) text split on whitespace runs — the
    * "plain whitespace" token counter for the text-analysis surface. */
  def whitespaceTokens(c: Column): Column =
    array_remove(split(c, "\\s+", -1), "")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, or single
    * non-space symbols — the common GPT-2-style pretoken classes, kept to
    * a regex subset shared by Java and RE2 so the DuckDB oracle matches. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Word-level n-grams over an `array<string>` column: contiguous runs of
    * `n` tokens joined by a single space. Uses only codegen'd built-ins
    * (transform + slice + array_join). */
  def wordNgrams(tokens: Column, n: Int): Column =
    // sequence(1, k) is descending for k < 1, so guard short docs explicitly
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** The 16-byte MD5 digests of every word n-gram, fused: one codegen'd
    * pass via [[graft.functions.expr.NgramMd5]] — digest-for-digest the
    * `unhex` of `md5(wordNgrams(tokens, n))` element-wise (ScalaCheck-
    * pinned), with no interpreted lambda, no per-gram joined string and
    * no per-call digest instance. For gram-IDENTITY consumers only
    * (groupBy/join keys): callers that emit or re-parse the gram text
    * keep [[wordNgrams]]. */
  def wordNgramMd5(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expr.NgramMd5(
        org.apache.spark.sql.GraftSqlBridge.expression(tokens), n))
}
