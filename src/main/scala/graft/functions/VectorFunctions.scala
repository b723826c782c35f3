package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd collection expressions (`zip_with`/`aggregate`) — no UDFs, so
  * the arithmetic stays inside WholeStageCodegen and the DuckDB oracle can
  * reproduce it exactly (identical sequential fold order).
  */
object VectorFunctions {

  /** Sequential-fold dot product in double precision. Element order is the
    * array order in both engines, so results are bit-identical. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Sequential-fold SQUARED L2 distance in double precision — same
    * bit-identical cross-engine contract as [[dot]]. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity as built-in collection expressions, structured as
    * dot/(sqrt(aa)*sqrt(bb)) — the shape the oracle mirrors, kept as the
    * reference implementation the native kernel is property-checked
    * against. */
  def cosineBuiltin(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity via the native codegen'd
    * [[graft.functions.expr.CosineSimilarity]] kernel — bit-identical to
    * [[cosineBuiltin]] (same sequential fold order), one fused loop
    * instead of three interpreted HOF folds. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expr.CosineSimilarity(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Sign-LSH coarse bucket from the first `nBits` dimensions: bit d set
    * iff v[d] >= 0. A deterministic stand-in for an IVF coarse quantizer —
    * the bucketing that turns an all-pairs scan into a per-bucket scan.
    *
    * Unrolled `element_at` comparisons with literal powers of two, NOT an
    * `aggregate(sequence(...))` lambda: higher-order functions are
    * interpreted (no codegen, no CSE), and this column sits on the
    * per-row hot path of every bucketed ANN/dedup query. The unrolled
    * form is one WholeStageCodegen span and needs no floating-point
    * `pow`. */
  def signBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map(d =>
      when(element_at(v, d + 1) >= 0, lit(1L << d)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** One machine word of a BINARY-QUANTIZED vector: bit d set iff
    * v[lo + d] >= 0 — [[signBucket]] generalized to an arbitrary
    * dimension window, so a d-dim vector packs into ⌈d/nBits⌉ BIGINT
    * words (the 1-bit-per-dimension code of sign-random-projection
    * hashing, Charikar STOC'02, with axis-aligned hyperplanes).
    * Same unrolled codegen-friendly shape as [[signBucket]]: this
    * column is the per-row hot path of the BQ signature scan. */
  def signWord(v: Column, lo: Int, nBits: Int): Column =
    (0 until nBits).map(d =>
      when(element_at(v, lo + d + 1) >= 0, lit(1L << d)).otherwise(lit(0L)))
      .reduce(_ + _)
}
