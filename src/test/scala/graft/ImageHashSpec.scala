package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{MediaRecord, Multimodal}

/** Perceptual-hash tests over REAL in-memory PNGs: the dHash of a
  * lightly edited or brightness-shifted image must sit within the
  * near-dup band of the original, a structurally different image must
  * not, and corrupt payloads must degrade to ok=false. Images are drawn
  * and PNG-encoded in-test (java.awt + ImageIO — deterministic), so the
  * decode → downsample → gradient pipeline runs on genuine codec
  * output, not fixtures of itself. */
class ImageHashSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def png(f: (Int, Int) => Int, w: Int = 72, h: Int = 48): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def rgb(r: Int, g: Int, b: Int): Int =
    (r.max(0).min(255) << 16) | (g.max(0).min(255) << 8) | b.max(0).min(255)

  // a diagonal gradient with a bright block — structured content
  private def base(x: Int, y: Int): Int =
    if (x / 8 == 2 && y / 8 == 1) rgb(240, 240, 240)
    else rgb(x * 3, y * 5, (x + y) * 2)

  private lazy val records = Seq(
    MediaRecord(0L, "image/png", png(base)),
    // small local edit: one 8x8 block recolored
    MediaRecord(1L, "image/png", png((x, y) =>
      if (x / 8 == 7 && y / 8 == 4) rgb(10, 200, 10) else base(x, y))),
    // global brightness shift: gradients unchanged
    MediaRecord(2L, "image/png", png((x, y) => {
      val v = base(x, y)
      rgb(((v >> 16) & 0xff) + 12, ((v >> 8) & 0xff) + 12, (v & 0xff) + 12)
    })),
    // structurally different: inverted diagonal, no block
    MediaRecord(3L, "image/png", png((x, y) => rgb(255 - x * 3, 255 - y * 5, x))),
    // corrupt payload
    MediaRecord(4L, "image/png", Array[Byte](0x50, 0x4e, 0x47, 0x00))
  ).toDS()

  private lazy val hashes = Multimodal.dHash(records).collect()
    .map(r => r.media_id -> r).toMap

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("decode contract: real PNGs hash ok, corrupt payload degrades") {
    assert((0L to 3L).forall(hashes(_).ok))
    assert(!hashes(4L).ok && hashes(4L).dhash == 0L)
  }

  test("edits and brightness shifts stay within the near-dup band") {
    assert(hamming(hashes(0L).dhash, hashes(1L).dhash) <= Multimodal.DHashMaxHamming)
    // constant luminance offset cancels in the gradient comparison
    assert(hamming(hashes(0L).dhash, hashes(2L).dhash) <= 2)
  }

  test("a structurally different image is far in hamming space") {
    assert(hamming(hashes(0L).dhash, hashes(3L).dhash) > 20)
  }

  test("imageNearDup pairs the edited copies, not the different image") {
    val pairs = Multimodal.imageNearDup(Multimodal.dHash(records).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
    // each pair exactly once (first-matching-band discipline)
    val all = Multimodal.imageNearDup(Multimodal.dHash(records).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.distinct.length)
  }

  test("hash-group pairs are a lossless compression of the id-grain pairs") {
    import org.apache.spark.sql.functions.col
    // constructed groups: h1 ×3 ids, h2 ×2 (hamming 1 from h1, shares
    // bands), h3 far — id-grain pairs = C(3,2) + C(2,2...) = 3 + 1
    // within-group plus 3·2 = 6 cross-group = 10 total
    val h1 = 0x1111222233334444L
    val h2 = h1 ^ 1L   // hamming 1, three bands identical
    val h3 = -h1       // far
    val hs = Seq(
      (10L, true, h1), (11L, true, h1), (12L, true, h1),
      (20L, true, h2), (21L, true, h2),
      (30L, true, h3), (31L, false, h1))
      .toDF("media_id", "ok", "dhash")
    val grouped = Multimodal.phashGroupPairsOf(hs).collect()
    assert(grouped.map(_.getAs[Long]("n_pairs")).sum == 10L)
    assert(grouped.length == 3) // (h1,h2) off-diag + h1/h2 diagonals
    val idGrain = Multimodal.imageNearDup(hs).count()
    assert(idGrain == 10L)
    // the same identity on the corpus-scale planted catalog: summed
    // multiplicities reproduce the id-grain banded pair count EXACTLY
    val catalog = Multimodal.dHash(
      Multimodal.plantedMediaRecords(spark, "/root/testdata/sf0.001")).toDF()
    val sumPairs = Multimodal.phashGroupPairsOf(catalog)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).collect()(0).getLong(0)
    assert(sumPairs == Multimodal.imageNearDup(catalog.filter(col("ok"))).count())
    assert(sumPairs > 0L)
  }

  test("binaryFile source ingests on-disk PNGs into the hash pipeline") {
    // the production ingest path for raw media: spark.read.format
    // ("binaryFile") over a directory → (path, content) rows → the same
    // decode/hash pipeline as any other binary column
    import org.apache.spark.sql.functions.{col, element_at, split => fsplit}
    val dir = java.nio.file.Files.createTempDirectory("graft-imgs")
    java.nio.file.Files.write(dir.resolve("img0.png"), png(base))
    java.nio.file.Files.write(dir.resolve("img1.png"),
      png((x, y) => if (x / 8 == 7 && y / 8 == 4) rgb(10, 200, 10) else base(x, y)))
    val recs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir.toString)
      .select(
        element_at(fsplit(element_at(fsplit(col("path"), "/"), -1), "\\."), 1)
          .substr(4, 9).cast("long").as("media_id"),
        org.apache.spark.sql.functions.lit("image/png").as("mime"),
        col("content"))
      .as[MediaRecord]
    val hs = Multimodal.dHash(recs).collect().map(r => r.media_id -> r.dhash).toMap
    assert(hs.keySet == Set(0L, 1L))
    assert(hs(0L) == hashes(0L).dhash) // identical bytes → identical hash
    assert(hamming(hs(0L), hs(1L)) <= Multimodal.DHashMaxHamming)
  }

  test("incremental screen: every arriving edit hits its base image via the index") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val hashes = Multimodal.dHash(Multimodal.plantedMediaRecords(spark, dir)).toDF()
    val out = Multimodal.imageNearDupScreen(
        hashes.filter(col("media_id") >= Multimodal.PlantShift),
        Multimodal.imageHashIndexOf(
          hashes.filter(col("media_id") < Multimodal.PlantShift)))
      .collect()
    // every planted arriving edit must find its own base as a near-dup
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = hashes.filter(col("media_id") >= Multimodal.PlantShift)
      .collect().map(_.getLong(0))
      .map(id => (id, id - Multimodal.PlantShift)).toSet
    assert(expected.subsetOf(found),
      s"missing planted hits: ${(expected -- found).take(5)}")
    // asymmetry: the catalog never self-pairs — new_id is always planted
    assert(out.forall(_.getLong(0) >= Multimodal.PlantShift))
  }

  test("streaming phash screen == batch incremental screen, via the persisted index") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val recs = Multimodal.plantedMediaRecords(spark, dir)
    val hashes = Multimodal.dHash(recs).toDF()
    val index = Multimodal.imageHashIndexOf(
      hashes.filter(col("media_id") < Multimodal.PlantShift))
    val arrivals = java.nio.file.Files
      .createTempDirectory("graft_media_stream").toString
    recs.toDF().filter(col("media_id") >= Multimodal.PlantShift)
      .write.parquet(s"$arrivals/batch1.parquet")
    val q = graft.streaming.MediaStream.phashScreen(
        graft.streaming.MediaStream.readMedia(spark, s"$arrivals/batch1.parquet"),
        index)
      .writeStream
      .format("memory")
      .queryName("phash_screen_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("phash_screen_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Multimodal.imageNearDupScreen(
        hashes.filter(col("media_id") >= Multimodal.PlantShift), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("registered planted query: full recall of the planted edits") {
    val row = Multimodal.phashNearDupPlanted(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(1) == 0)                  // every PNG decodes
    assert(row.getLong(2) > 0)                   // plants exist
    assert(row.getLong(3) == row.getLong(2))     // planted_found == expected
    assert(row.getLong(5) <= Multimodal.DHashMaxHamming)
  }
}
