package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-generic read/write: the connector surface beyond the parquet
  * test tables (SURVEY.md §2.2 row "File formats"). All of these are
  * `DataFrameReader`/`DataFrameWriter` built-ins — the point of this
  * module is a single audited place for the options that make each
  * format ROUND-TRIP SAFE (header/schema for CSV, line-delimited JSON),
  * plus partitioned layouts for pruning.
  */
object Formats {

  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv", "xml")

  /** Write `df` in `format`. CSV keeps a header; JSON is line-delimited;
    * XML (built into Spark 4's core) uses a fixed row tag; timestamps
    * survive every format as ISO-8601 strings where the format has no
    * native type. */
  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite")
    (format match {
      case "csv" => w.option("header", "true")
      case "xml" => w.option("rootTag", "rows").option("rowTag", "row")
      case _ => w
    }).format(format).save(path)
  }

  /** Read back with an explicit schema — schema inference is a full
    * extra pass over the data at 100 TB (and type-lossy for CSV/JSON),
    * so round-trips always carry the schema. */
  def read(spark: SparkSession, format: String, path: String, schema: StructType): DataFrame = {
    val r = spark.read.schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case "xml" => r.option("rowTag", "row")
      case _ => r
    }).format(format).load(path)
  }

  /** Hive-style partitioned write: one directory per value of
    * `partitionCol` so a filter on it becomes a PartitionFilter (pruned
    * at planning, never scanned). The layout every large events/logs
    * table should use. */
  def writePartitioned(df: DataFrame, format: String, path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).format(format).save(path)

  /** JDBC sink (SURVEY §2.2 connector row): save `df` as a database
    * table through Spark's built-in JDBC source. Exercised in the suite
    * against embedded Derby — the one database this environment ships
    * (in Spark's own jars). */
  def jdbcWrite(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table).save()

  /** JDBC source. `partitioning = Some((col, lower, upper, n))` splits
    * the read into `n` range-partitioned queries — at cluster scale each
    * executor opens its own connection and pulls one stride, instead of
    * the whole table streaming through one task. Filters on the returned
    * frame push down into the remote SQL (`PushedFilters` on the JDBC
    * scan node), so the database does the selection, not the cluster. */
  def jdbcRead(spark: SparkSession, url: String, table: String,
      partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitioning.fold(r) { case (c, lo, hi, n) =>
      r.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }
}
