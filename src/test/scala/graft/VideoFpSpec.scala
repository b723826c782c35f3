package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{MediaRecord, Multimodal}

/** Video fingerprinting (`q_multimodal_video_fp` / `_inc`): Y4M demux →
  * frame-sampled luma dHash → per-bit temporal majority. The decisive
  * pins: gain invariance (a re-grade flips zero bits, by the
  * cross-multiplied integer comparison), minority-frame robustness (an
  * edit confined to fewer than half the sampled frames cannot flip any
  * clip bit — the majority's whole point), corrupt-container
  * degradation (`ok = false`, never a dead task), C420 demux (the y4m
  * default colorspace, chroma skipped), planted-pair recall through the
  * banded screen, and stream ≡ batch for the streaming twin. */
class VideoFpSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val W = 18
  private val H = 16

  /** A clip whose frame t is produced by `pixel(t, x, y)`. */
  private def clip(n: Int)(pixel: (Int, Int, Int) => Int): Array[Byte] =
    Multimodal.y4mMono(W, H, (0 until n).map { t =>
      val f = new Array[Byte](W * H)
      for (y <- 0 until H; x <- 0 until W) f(y * W + x) = pixel(t, x, y).toByte
      f
    })

  // a static two-tone pattern with a strong horizontal gradient
  private def basePix(x: Int, y: Int): Int =
    if ((x * 9 / W) % 2 == 0) 0x30 else 0xc0

  test("gain re-grade flips zero fingerprint bits") {
    val base = clip(8)((_, x, y) => basePix(x, y))
    val graded = clip(8)((_, x, y) => basePix(x, y) * 102 / 100)
    val fps = Multimodal.videoFingerprint(Seq(
      MediaRecord(1L, "video/x-y4m", base),
      MediaRecord(2L, "video/x-y4m", graded)).toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(fps.values.forall(_.ok))
    assert(fps(1L).fp == fps(2L).fp)
  }

  test("minority-frame edit flips no bit; persistent edit flips its cells' bits") {
    // 8 frames, sample-every-4 → frames 0 and 4 are hashed
    def edited(x: Int, y: Int): Int =
      if (x * 9 / W == 2 && y * 8 / H == 3) 0xff else basePix(x, y)
    val base = clip(8)((_, x, y) => basePix(x, y))
    // edit on a NON-sampled frame only: invisible to the fingerprint
    val minority = clip(8)((t, x, y) => if (t == 1) edited(x, y) else basePix(x, y))
    // edit on EVERY frame: majority must flip the affected comparisons
    val persistent = clip(8)((_, x, y) => edited(x, y))
    val fps = Multimodal.videoFingerprint(Seq(
      MediaRecord(1L, "video/x-y4m", base),
      MediaRecord(2L, "video/x-y4m", minority),
      MediaRecord(3L, "video/x-y4m", persistent)).toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(fps.values.forall(_.ok))
    assert(fps(2L).fp == fps(1L).fp)
    val ham = java.lang.Long.bitCount(fps(3L).fp ^ fps(1L).fp)
    assert(ham >= 1 && ham <= 2, s"persistent edit hamming $ham")
  }

  test("C420 clips demux (chroma skipped) and equal their mono twin") {
    val y = (0 until W * H).map(i => basePix(i % W, i / W).toByte).toArray
    val mono = Multimodal.y4mMono(W, H, Seq(y))
    val c420 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$W H$H F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(y)
      out.write(Array.fill(W * H / 2)(0x80.toByte)) // neutral chroma
      out.toByteArray
    }
    val fps = Multimodal.videoFingerprint(Seq(
      MediaRecord(1L, "video/x-y4m", mono),
      MediaRecord(2L, "video/x-y4m", c420)).toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(fps.values.forall(_.ok))
    assert(fps(1L).fp == fps(2L).fp)
  }

  test("corrupt containers degrade to ok=false, never a dead task") {
    val truncated = {
      val full = clip(4)((_, x, y) => basePix(x, y))
      java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    }
    val recs = Seq(
      MediaRecord(99L, "video/x-y4m", "MPEG4 who knows".getBytes("UTF-8")),
      MediaRecord(98L, "video/x-y4m", "YUV4MPEG2 W0 H0\n".getBytes("UTF-8")),
      MediaRecord(97L, "video/x-y4m", "YUV4MPEG2 Wx Hy Cmono\n".getBytes("UTF-8")),
      MediaRecord(96L, "video/x-y4m", truncated),
      MediaRecord(95L, "video/x-y4m", Array.emptyByteArray)).toDS()
    assert(Multimodal.videoFingerprint(recs).collect().forall(!_.ok))
  }

  test("incremental video screen: every arriving re-edit finds its base") {
    import org.apache.spark.sql.functions.col
    val out = Multimodal.videoFpScreenInc(spark, dir).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of")))
    val nPlanted = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).count()
    val expected = (0L until nPlanted).map(_ * 10)
      .map(id => (id + Multimodal.PlantShift, id)).toSet
    assert(expected.subsetOf(out.toSet),
      s"missing planted hits: ${(expected -- out.toSet).take(5)}")
    assert(out.forall(_._1 >= Multimodal.PlantShift))
  }

  test("streaming video screen == batch incremental screen") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val recs = Multimodal.plantedVideoRecords(spark, dir)
    val fps = Multimodal.videoFingerprint(recs).toDF()
      .withColumnRenamed("fp", "dhash")
    val index = Multimodal.imageHashIndexOf(
      fps.filter(col("media_id") < Multimodal.PlantShift))
    val arrivals = java.nio.file.Files
      .createTempDirectory("graft_video_stream").toString
    recs.toDF().filter(col("media_id") >= Multimodal.PlantShift)
      .write.parquet(s"$arrivals/batch1.parquet")
    val q = graft.streaming.MediaStream.videoFpScreen(
        graft.streaming.MediaStream.readMedia(spark, s"$arrivals/batch1.parquet"),
        index)
      .writeStream
      .format("memory")
      .queryName("video_screen_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("video_screen_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Multimodal.imageNearDupScreen(
        fps.filter(col("media_id") >= Multimodal.PlantShift), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
