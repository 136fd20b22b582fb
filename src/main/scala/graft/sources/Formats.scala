package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources/sinks glue (SURVEY §2.5): the reference's batch formats map
  * onto Spark built-ins — SequenceFile (F1) via the hadoopFile RDD API,
  * compression codecs (F4) via writer options, sorted/indexed KV files
  * (F2/F3) via sorted-bucketed parquet, and the fsimage-style namespace
  * export (F11) as json/csv of the materialized paths.
  */
object Formats {

  /** F1: read a SequenceFile[Text, Text] as a (key, value) DataFrame.
    * (C/org/apache/hadoop/io/SequenceFile.java — reader side.) */
  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile[String, String](path)
      .toDF("key", "value")
  }

  /** F1: write a 2-column DataFrame as SequenceFile[Text, Text]; the
    * `sorted` flag mirrors SequenceFile.Sorter (sort before write). */
  def writeSequenceFile(df: DataFrame, path: String, sorted: Boolean = false): Unit = {
    import org.apache.hadoop.io.Text
    val cols = df.columns
    require(cols.length == 2, s"sequence file needs (key,value), got ${cols.mkString(",")}")
    val ordered = if (sorted) df.orderBy(col(cols(0))) else df
    ordered.rdd
      .map(r => (new Text(String.valueOf(r.get(0))), new Text(String.valueOf(r.get(1)))))
      .saveAsSequenceFile(path)
  }

  /** F1: SequenceFile.Sorter merge analog (C/org/apache/hadoop/io/
    * SequenceFile.java — Sorter.merge :2637-2687, MergeQueue): k-way
    * merge of pre-sorted runs into one globally sorted sequence file,
    * duplicates preserved (merge, not dedup). Spark-first: the union of
    * runs is range-partitioned and sorted — the shuffle's range partition
    * IS the distributed merge pass, and unlike the reference's
    * single-process heap (bounded by `factor` streams per pass) it takes
    * any number of runs in one pass at any scale. Equal keys are ordered
    * by value (the reference's equal-key order is stream-arrival order,
    * which a distributed merge cannot reproduce — pin a total order
    * instead). */
  def mergeSequenceFiles(spark: SparkSession, runPaths: Seq[String],
                         outPath: String): Unit = {
    require(runPaths.nonEmpty, "mergeSequenceFiles needs at least one run")
    val merged = runPaths.map(p => readSequenceFile(spark, p))
      .reduce(_ unionByName _)
      .orderBy(col("key"), col("value"))
    writeSequenceFile(merged, outPath)
  }

  /** F2/F3: MapFile/TFile analog — a sorted, bucketed parquet table whose
    * row-group min/max stats serve as the key index (point lookups skip
    * row groups the way MapFile's index skips blocks). */
  def writeSortedKeyed(df: DataFrame, keyCol: String, path: String,
                       codec: String = "snappy"): Unit =
    df.repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .parquet(path)

  /** F4: supported write codecs (DefaultCodec/Gzip/BZip2/Deflate/Snappy
    * in the reference → parquet codecs here). */
  val Codecs: Seq[String] = Seq("snappy", "gzip", "zstd", "lz4", "none")

  /** F11: offlineImageViewer analog — export the whole live namespace
    * (id, path, attrs) as json or csv. */
  def exportNamespace(file: DataFrame, path: String, format: String = "json"): Unit = {
    val ns = graft.state.StateManager.materializePaths(file)
      .select("id", "path", "length", "blockSize", "replication",
        "atime", "mtime", "owner", "version")
    format match {
      case "json" => ns.write.mode(SaveMode.Overwrite).json(path)
      case "csv"  => ns.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      case other  => ns.write.mode(SaveMode.Overwrite).format(other).save(path)
    }
  }
}
