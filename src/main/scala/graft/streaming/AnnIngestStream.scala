package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Streaming VECTOR-INDEX INGEST — the streaming twin of the IVF-PQ
  * add path (`SimSearch.annIndexMergeServe`'s delta-merge): arriving
  * vectors are assigned to the FROZEN coarse cells and encoded with
  * the FROZEN PQ codebooks as pure per-row projections, emitting the
  * (vec_id, cent_id, sub, code_id) inverted-list rows a sink appends
  * to the persisted index. This is the production ingest shape: train
  * once (a batch job), broadcast the frozen artifacts, encode forever
  * — FAISS `add` as a stream.
  *
  * The streaming constraint dictates the shape, exactly as in
  * [[EmbeddingsStream.assignToQuantizer]]: the batch path's
  * explode → join → per-(vector, subspace) argmin window is not
  * streaming-legal, so both the coarse argmax and the per-subspace
  * codeword argmins evaluate as ONE narrow projection against the
  * driver-held artifacts — `array_min` over (distance, id) structs,
  * the batch tie-breaks verbatim. STATELESS: no watermark, no state
  * store, exactly-once under any restart.
  *
  * Parity contract: the coarse leg reuses the rounded-cosine fold
  * bit-for-bit (cents held as raw FLOATS, so the float→double casts
  * match `rankedAgainst`), hence exact. The PQ leg's batch twin sums
  * join rows with no accumulation order, so codeword parity is
  * EMPIRICAL on geometry separated beyond the float-summation noise
  * floor — the [[EmbeddingsStream.assignToQuantizer]] caveat, pinned
  * by the suite on the shipped corpus. */
object AnnIngestStream {

  /** One narrow projection: (vec_id, cent_id, codes[(sub, code_id)]).
    * `cents` are the frozen coarse cells as float vectors; `book` is
    * the frozen codebook as (sub, code_id, ordered (dim, c) pairs). */
  def encodeAgainstFrozen(vecs: DataFrame,
      cents: Seq[(Long, Seq[Float])],
      book: Seq[(Int, Long, Seq[(Int, Double)])]): DataFrame = {
    require(cents.nonEmpty && book.nonEmpty, "empty frozen artifacts")
    // coarse: argmax of round(cosine, 6) with the min-cent_id tie-break
    // == array_min over (-cos, cent_id) structs
    val coarsePacked = array(cents.map { case (cid, cvec) =>
      val centLit = array(cvec.map(lit): _*)
      struct(
        (round(VectorFunctions.cosineBuiltin(col("embedding"), centLit), 6)
          * lit(-1.0)).as("neg_cos"),
        lit(cid).as("cent_id"))
    }: _*)
    // PQ: per subspace, argmin of the in-order (v_d − c_d)² fold with
    // the min-code_id tie-break (pqAssign's (d2, code_id) ordering)
    def subD2(dims: Seq[(Int, Double)]): Column =
      dims.foldLeft(lit(0.0)) { case (acc, (d, c)) =>
        acc + pow(element_at(col("embedding"), d + 1).cast("double") - lit(c),
          lit(2))
      }
    val codesPacked = array(
      book.groupBy(_._1).toSeq.sortBy(_._1).map { case (sub, codes) =>
        val packed = array(codes.sortBy(_._2).map { case (_, code, dims) =>
          struct(subD2(dims).as("d2"), lit(code).as("code_id"))
        }: _*)
        struct(lit(sub).as("sub"),
          array_min(packed).getField("code_id").as("code_id"))
      }: _*)
    vecs.select(col("vec_id"),
      array_min(coarsePacked).getField("cent_id").as("cent_id"),
      codesPacked.as("codes"))
  }

  /** The inverted-list row form a sink appends to the persisted index:
    * one row per (vector, subspace). Row-local explode — still
    * stateless and streaming-legal. */
  def ingestRows(vecs: DataFrame,
      cents: Seq[(Long, Seq[Float])],
      book: Seq[(Int, Long, Seq[(Int, Double)])]): DataFrame =
    encodeAgainstFrozen(vecs, cents, book)
      .select(col("vec_id"), col("cent_id"), explode(col("codes")).as("c"))
      .select(col("vec_id"), col("cent_id"),
        col("c.sub").as("sub"), col("c.code_id").as("code_id"))
}
