package graft.multimodal

import org.apache.spark.sql.SparkSession

/** One-shot generator for the committed [[Multimodal.VideoFpFixturePath]]
  * fixture: demux→[[Multimodal.videoFingerprint]] over the planted
  * video catalog at the driver's verify scale, written as a single
  * parquet FILE so the oracle SQL can read it by path — the
  * [[PhashFixtureGen]] discipline on the video modality. Re-run (and
  * re-commit) only when the catalog recipe or the fingerprint kernel
  * intentionally changes:
  *
  *   sbt "runMain graft.multimodal.VideoFpFixtureGen /root/testdata/sf0.01"
  */
object VideoFpFixtureGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("video_fp_fixture").toString
    Multimodal.videoFingerprint(Multimodal.plantedVideoRecords(spark, sfDir))
      .toDF().orderBy("media_id")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dest = java.nio.file.Paths.get(Multimodal.VideoFpFixturePath)
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"fixture written: $dest (${java.nio.file.Files.size(dest)} bytes)")
    spark.stop()
  }
}
