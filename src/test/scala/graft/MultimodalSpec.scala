package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.BinaryType
import graft.multimodal.{MediaRecord, Multimodal}

/** The decode step is a stub (no media libs in this environment), but
  * the Spark plumbing around it is real: binary column schema, typed
  * Dataset shape, deterministic per-partition batch processing, and
  * narrow (partition-preserving) execution.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("media table: binary content column + typed metadata") {
    val m = Multimodal.mediaFromDocuments(spark, dir)
    assert(m.schema("content").dataType == BinaryType)
    val mimes = m.select("mime").distinct().as[String].collect().toSet
    assert(mimes == Set("image/png", "audio/wav", "video/mp4"))
    val row = m.filter($"media_id" === 0L).head()
    assert(new String(row.getAs[Array[Byte]]("content"), "UTF-8").nonEmpty)
  }

  test("decodeStub: deterministic features, one pass per partition, narrow") {
    val records = Multimodal.mediaFromDocuments(spark, dir)
      .select("media_id", "mime", "content").as[MediaRecord]
    val feats = Multimodal.decodeStub(records)
    // narrow: no shuffle, partitioning preserved
    assert(feats.rdd.getNumPartitions == records.rdd.getNumPartitions)
    val f = feats.filter(_.media_id == 0L).head()
    val bytes = records.filter(_.media_id == 0L).head().content
    assert(f.n_bytes == bytes.length)
    val expectedSum = bytes.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) & 0x7fffffffL)
    assert(f.checksum == expectedSum)
    assert(f.fake_width == ((expectedSum % 640) + 1).toInt)
    // deterministic across runs
    assert(Multimodal.decodeStub(records).filter(_.media_id == 0L).head() == f)
  }

  test("decodeImage: real javax.imageio decode of committed PNG fixtures") {
    // (name, true width, true height) written by the fixture generator
    val fixtures = Seq(
      ("red_7x5.png", 7, 5), ("green_16x9.png", 16, 9), ("blue_3x11.png", 3, 11))
    val records = spark.createDataset(fixtures.zipWithIndex.map {
      case ((name, _, _), i) =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/root/repo/fixtures/media/$name"))
        MediaRecord(i.toLong, "image/png", bytes)
    })
    val feats = Multimodal.decodeImage(records).collect().sortBy(_.media_id)
    fixtures.zip(feats).foreach { case ((_, w, h), f) =>
      assert(f.ok, s"fixture ${f.media_id} should decode")
      assert(f.width == w && f.height == h, s"true dims for ${f.media_id}")
      assert(f.channels == 3) // 8-bit RGB, no alpha
    }
    // narrow: partitioning preserved, like the stubs
    assert(Multimodal.decodeImage(records).rdd.getNumPartitions ==
      records.rdd.getNumPartitions)
    // corrupt payloads degrade to ok=false rows, not task failures
    val bad = spark.createDataset(Seq(
      MediaRecord(99L, "image/png", Array[Byte](1, 2, 3, 4))))
    val badFeat = Multimodal.decodeImage(bad).head()
    assert(!badFeat.ok && badFeat.width == 0)
  }

  test("decodeAudio: real javax.sound decode of committed PCM WAV fixtures") {
    // (name, sample rate, channels, frame count) from the fixture generator
    val fixtures = Seq(
      ("tone_8k_mono_100.wav", 8000, 1, 100L),
      ("tone_44k_stereo_441.wav", 44100, 2, 441L),
      ("tone_16k_mono_320.wav", 16000, 1, 320L))
    val records = spark.createDataset(fixtures.zipWithIndex.map {
      case ((name, _, _, _), i) =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/root/repo/fixtures/media/$name"))
        MediaRecord(i.toLong, "audio/wav", bytes)
    })
    val feats = Multimodal.decodeAudio(records).collect().sortBy(_.media_id)
    fixtures.zip(feats).foreach { case ((_, rate, ch, n), f) =>
      assert(f.ok, s"fixture ${f.media_id} should decode")
      assert(f.sample_rate == rate && f.channels == ch && f.n_frames == n)
      assert(f.bits_per_sample == 16)
      assert(f.duration_ms == n * 1000L / rate)
    }
    assert(Multimodal.decodeAudio(records).rdd.getNumPartitions ==
      records.rdd.getNumPartitions)
    // corrupt and non-audio payloads degrade to ok=false rows
    val bad = spark.createDataset(Seq(
      MediaRecord(98L, "audio/wav", Array[Byte](82, 73, 70, 70, 0, 0)), // truncated RIFF
      MediaRecord(99L, "audio/wav", "not audio at all".getBytes)))
    val badFeats = Multimodal.decodeAudio(bad).collect()
    assert(badFeats.forall(f => !f.ok && f.sample_rate == 0))
  }

  test("resizeStub: narrow, content-in/content-out, size tracks target") {
    val records = Multimodal.mediaFromDocuments(spark, dir)
      .select("media_id", "mime", "content").as[MediaRecord]
    val resized = Multimodal.resizeStub(records, 64, 64)
    assert(resized.rdd.getNumPartitions == records.rdd.getNumPartitions)
    val before = records.filter(_.media_id == 0L).head().content.length
    val after = resized.filter(_.media_id == 0L).head().content.length
    assert(after <= before && after > 0)
  }

  test("frameSampleStub: one row fans out to every Nth frame, lazily") {
    val records = Multimodal.mediaFromDocuments(spark, dir)
      .select("media_id", "mime", "content").as[MediaRecord]
    val frames = Multimodal.frameSampleStub(records, everyNth = 2, frameBytes = 16)
    val f0 = frames.filter(_.media_id == 0L).collect()
    val nWindows = (records.filter(_.media_id == 0L).head().content.length + 15) / 16
    assert(f0.length == (nWindows + 1) / 2) // frames 0, 2, 4, ...
    assert(f0.forall(_.frame_idx % 2 == 0))
    assert(f0.forall(_.frame.length <= 16))
  }

  test("mimeStats aggregates the binary payload like any column") {
    val stats = Multimodal.mimeStats(spark, dir).collect()
    assert(stats.nonEmpty)
    val total = stats.map(_.getAs[Long]("n_media")).sum
    val docs = graft.sources.Tables.documents(spark, dir).count()
    assert(total == docs)
  }

  test("audio fingerprint: planted re-masters found, no false positives") {
    val pairs = Multimodal.audioFpPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    val planted = pairs.filter { case (a, b, _) =>
      b == a + Multimodal.PlantShift }
    val nExpected = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 10 === 0).count()
    // every planted re-master pairs with its base within 2 bits (one
    // localized segment edit moves at most the two adjacent gradients)
    assert(planted.length == nExpected && nExpected > 0)
    assert(planted.forall(_._3 <= 2))
    // and the xor-shift envelope mix keeps accidental collisions out
    assert(pairs.length == planted.length, s"unexpected pairs: ${
      pairs.filterNot { case (a, b, _) => b == a + Multimodal.PlantShift }
        .take(5).toSeq}")
  }

  test("audio fingerprint: uniform gain change never flips a bit") {
    val rate = 8000
    val amps = Array.tabulate(65)(s => (2000 + 370 * (s % 11)).toShort)
    def wav(scaleNum: Int): Array[Byte] =
      Multimodal.wavPcm16Mono(rate,
        amps.flatMap(a => Array.fill(16)((a * scaleNum / 100).toShort)))
    val recs = Seq(
      MediaRecord(1L, "audio/wav", wav(100)),
      MediaRecord(2L, "audio/wav", wav(150)), // +50% gain
      MediaRecord(3L, "audio/wav", wav(60))). // -40% gain
      toDS()
    val fps = Multimodal.audioFingerprint(recs).collect()
      .map(f => f.media_id -> f).toMap
    assert(fps.values.forall(_.ok))
    assert(fps(2L).fp == fps(1L).fp && fps(3L).fp == fps(1L).fp)
  }

  test("audio fingerprint: corrupt and non-PCM payloads degrade to ok=false") {
    val recs = Seq(
      MediaRecord(97L, "audio/wav", Array[Byte](82, 73, 70, 70, 0, 0)),
      MediaRecord(96L, "audio/wav", "not audio at all".getBytes("UTF-8")),
      // too short for 65 segments: 10 samples
      MediaRecord(95L, "audio/wav",
        Multimodal.wavPcm16Mono(8000, Array.fill(10)(1000.toShort)))).toDS()
    val fps = Multimodal.audioFingerprint(recs).collect()
    assert(fps.forall(!_.ok))
  }

  test("audio fingerprint: decodes the committed real-world WAV fixtures") {
    val f = new java.io.File("fixtures/media/tone_16k_mono_320.wav")
    assume(f.exists())
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val fps = Multimodal.audioFingerprint(
      Seq(MediaRecord(7L, "audio/wav", bytes)).toDS()).collect()
    assert(fps.length == 1 && fps.head.ok)
  }

  test("incremental audio screen: every arriving re-master finds its base") {
    import org.apache.spark.sql.functions.col
    val out = Multimodal.audioFpScreenInc(spark, dir).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of")))
    val nPlanted = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).count()
    val expected = (0L until nPlanted).map(_ * 10)
      .map(id => (id + Multimodal.PlantShift, id)).toSet
    assert(expected.subsetOf(out.toSet),
      s"missing planted hits: ${(expected -- out.toSet).take(5)}")
    // asymmetry: the catalog never self-pairs
    assert(out.forall(_._1 >= Multimodal.PlantShift))
  }

  test("streaming audio screen == batch incremental screen") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val recs = Multimodal.plantedAudioRecords(spark, dir)
    val fps = Multimodal.audioFingerprint(recs).toDF()
      .withColumnRenamed("fp", "dhash")
    val index = Multimodal.imageHashIndexOf(
      fps.filter(col("media_id") < Multimodal.PlantShift))
    val arrivals = java.nio.file.Files
      .createTempDirectory("graft_audio_stream").toString
    recs.toDF().filter(col("media_id") >= Multimodal.PlantShift)
      .write.parquet(s"$arrivals/batch1.parquet")
    val q = graft.streaming.MediaStream.audioFpScreen(
        graft.streaming.MediaStream.readMedia(spark, s"$arrivals/batch1.parquet"),
        index)
      .writeStream
      .format("memory")
      .queryName("audio_screen_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("audio_screen_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Multimodal.imageNearDupScreen(
        fps.filter(col("media_id") >= Multimodal.PlantShift), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
