package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.multimodal.{MediaRecord, Multimodal}

/** Streaming image-ingest screening — the streaming twin of
  * [[graft.multimodal.Multimodal.phashScreenInc]]: a stream of arriving
  * media records is decoded → dHashed → probed against the PERSISTED
  * banded hash index of the existing catalog
  * ([[Multimodal.imageHashIndexOf]], bucketed by (band, band_sig) in
  * production).
  *
  * The whole query is STATELESS: the decode and hash are row-local
  * `mapPartitions` work (the same real-codec kernel as the batch path,
  * with its corrupt-payload `ok = false` contract), the probe is one
  * stream-static equi-join — no watermark, no state store, exactly-once
  * under any restart, the [[DocsStream.nearDupScreen]] posture for the
  * image modality. The screen kernel is literally the batch one
  * ([[Multimodal.imageNearDupScreen]]), so stream ≡ batch is parity by
  * construction, and the suite pins it. */
object MediaStream {

  /** Parquet schema of a persisted media-record batch. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mime", StringType),
    StructField("content", BinaryType)))

  /** Bounded file-source stream over media-record parquet files. */
  def readMedia(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(mediaSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Screen an arriving media stream against the static banded hash
    * index: decode → dHash → asymmetric band probe, emitting
    * (new_id, dup_of, hamming) for every catalog near-duplicate. */
  def phashScreen(newMedia: DataFrame, index: DataFrame,
      maxHamming: Int = Multimodal.DHashMaxHamming): DataFrame = {
    val spark = newMedia.sparkSession
    import spark.implicits._
    Multimodal.imageNearDupScreen(
      Multimodal.dHash(newMedia.as[MediaRecord]).toDF(), index, maxHamming)
  }

  /** The AUDIO twin of [[phashScreen]]: arriving WAVs decode through
    * the real PCM path into envelope fingerprints, then probe the same
    * static banded index shape — `Multimodal.audioFpScreenInc`'s
    * kernel verbatim, so stream ≡ batch is parity by construction. */
  def audioFpScreen(newMedia: DataFrame, index: DataFrame,
      maxHamming: Int = Multimodal.DHashMaxHamming): DataFrame = {
    val spark = newMedia.sparkSession
    import spark.implicits._
    Multimodal.imageNearDupScreen(
      Multimodal.audioFingerprint(newMedia.as[MediaRecord]).toDF()
        .withColumnRenamed("fp", "dhash"), index, maxHamming)
  }

  /** The VIDEO twin of [[phashScreen]]: arriving Y4M clips demux
    * through the codec-free container path into frame-sampled majority
    * fingerprints, then probe the same static banded index shape —
    * `Multimodal.videoFpScreenInc`'s kernel verbatim, so stream ≡
    * batch is parity by construction. */
  def videoFpScreen(newMedia: DataFrame, index: DataFrame,
      maxHamming: Int = Multimodal.DHashMaxHamming): DataFrame = {
    val spark = newMedia.sparkSession
    import spark.implicits._
    Multimodal.imageNearDupScreen(
      Multimodal.videoFingerprint(newMedia.as[MediaRecord]).toDF()
        .withColumnRenamed("fp", "dhash"), index, maxHamming)
  }
}
