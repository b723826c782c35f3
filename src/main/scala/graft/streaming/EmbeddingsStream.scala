package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming EMBEDDING-DRIFT monitor — the streaming twin of
  * `SimSearch.embeddingDrift`: new vectors arrive as a stream, each is
  * assigned to its nearest centroid of a FROZEN trained quantizer, and
  * a running per-cluster arrival count feeds the same smoothed-PSI
  * arithmetic the batch monitor uses. This is the production shape of
  * "did the new crawl move in embedding space": the quantizer is
  * trained once on the reference snapshot (a batch job), persisted,
  * and every ingest batch updates cluster shares incrementally.
  *
  * The streaming constraint dictates the assignment shape: the batch
  * path's explode → broadcast-join → per-vector argmin needs a window
  * (or a second aggregation), neither allowed on a stream — so the
  * stream side evaluates the K squared-L2 distances as ONE narrow
  * per-row projection against the driver-held quantizer (K fold
  * expressions over the embedding array, argmin via `array_min` on
  * (d2, cent_id) structs — the same (d2, cent_id) tie-break as batch)
  * and the ONLY stateful operator is a K-keyed running count. State is
  * O(K) forever, independent of stream length; the suite pins
  * stream ≡ batch on both the assignment and the PSI report. */
object EmbeddingsStream {

  /** Bounded file-source stream over embeddings parquet in a directory
    * (glob `embeddings*.parquet`, so multi-shard arrival replays as
    * multiple micro-batches under `maxFilesPerTrigger=1`). Schema is
    * probed from the batch reader — fails at PLAN time if absent, the
    * loader-level fail-fast `EventsStream.readEvents` documents. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read
      .option("pathGlobFilter", "embeddings*.parquet").parquet(dir).schema
    spark.readStream
      .schema(fileSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "embeddings*.parquet")
      .parquet(dir)
  }

  /** Narrow per-row nearest-centroid assignment against a driver-held
    * quantizer (cent_id → dense centroid, 0-based dims): K sequential
    * fold expressions + `array_min` over (d2, cent_id) structs — the
    * batch argmin's (d2, cent_id) tie-break, with a deterministic
    * left-to-right summation order.
    *
    * Stream ≡ batch assignment parity is EMPIRICAL, not guaranteed:
    * the batch side's `sum` partial aggregation carries no accumulation
    * order, so a vector whose two nearest cells differ by under the
    * float-summation noise floor (~1 ulp × dims) could in principle
    * flip between the paths under a different partitioning. The suite
    * pins parity on the shipped data/partitioning; a guarantee would
    * require ranking on a fixed-precision rounding of d2 in BOTH
    * engines and every kmeans oracle — a cross-cutting change not
    * taken because no shipped geometry sits near the noise floor
    * (planted cells are separated by whole units). Streaming-safe (no
    * window, no aggregation) and exactly the expression a codegen'd
    * serving path evaluates per row. */
  def assignToQuantizer(vecs: DataFrame,
                        cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "empty quantizer")
    val packed = array(cents.sortBy(_._1).map { case (cid, cvec) =>
      val centLit = array(cvec.map(lit): _*)
      struct(
        aggregate(
          // pow(·, 2), NOT (x−c)*(x−c): the batch argmin squares via
          // the Pow expression (SimSearch.kmeansAssign), and Math.pow
          // is only 1-ulp-accurate — a self-multiply here could flip a
          // near-equidistant assignment between stream and batch
          zip_with(col("embedding"), centLit,
            (x, c) => pow(x.cast("double") - c, lit(2))),
          lit(0.0), (acc, v) => acc + v).as("d2"),
        lit(cid).as("cent_id"))
    }: _*)
    vecs.select(col("vec_id"),
      array_min(packed).getField("cent_id").as("cent_id"))
  }

  /** Running per-cluster arrival counts for a (possibly streaming)
    * vector frame — the monitor's only stateful operator, K keys of
    * state. Run in `complete` output mode; each trigger emits the
    * up-to-date (cent_id, n_cur) table the PSI tail consumes. */
  def clusterArrivals(newVecs: DataFrame,
                      cents: Seq[(Long, Seq[Double])]): DataFrame =
    assignToQuantizer(newVecs, cents)
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_cur"))

  /** The PSI tail over materialized counts: smoothed population
    * stability per cluster on the TRAINED-centroid spine — `refCounts`
    * (cent_id, n_ref) from the reference snapshot's batch assignment,
    * `curCounts` (cent_id, n_cur) from the streaming arrivals table.
    * Identical arithmetic to `SimSearch.embeddingDriftOf`; K-sized
    * input, trivially batch. */
  def psiReport(spine: Seq[Long], refCounts: DataFrame,
                curCounts: DataFrame): DataFrame = {
    val spark = refCounts.sparkSession
    import spark.implicits._
    val full = spine.toDF("cent_id")
      .join(refCounts, Seq("cent_id"), "left")
      .join(curCounts, Seq("cent_id"), "left")
      .select(col("cent_id"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = full.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"),
      count(lit(1)).as("k_live"))
    full.crossJoin(broadcast(tot))
      .withColumn("p_ref", (col("n_ref") + 0.5) / (col("t_ref") + col("k_live") * 0.5))
      .withColumn("p_cur", (col("n_cur") + 0.5) / (col("t_cur") + col("k_live") * 0.5))
      .select(col("cent_id"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
          .as("psi_term"))
      .orderBy("cent_id")
  }
}
