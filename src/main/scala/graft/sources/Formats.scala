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

  /** F1 write modes: the reference's three SequenceFile layouts
    * (C/org/apache/hadoop/io/SequenceFile.java:78-93 — NONE = plain
    * records, RECORD = each value compressed alone, BLOCK = key/value
    * runs compressed together). */
  val SeqCompressionModes: Seq[String] = Seq("none", "record", "block")

  /** F1: write a 2-column DataFrame as SequenceFile[Text, Text]; the
    * `sorted` flag mirrors SequenceFile.Sorter (sort before write),
    * `compression` picks the NONE/RECORD/BLOCK layout. The mode is set
    * on a per-job JobConf — never the shared session Configuration — so
    * concurrent writers with different modes don't race. */
  def writeSequenceFile(df: DataFrame, path: String, sorted: Boolean = false,
                        compression: String = "none"): Unit = {
    import org.apache.hadoop.io.Text
    import org.apache.hadoop.io.compress.DefaultCodec
    import org.apache.hadoop.mapred.{JobConf, SequenceFileOutputFormat}
    val cols = df.columns
    require(cols.length == 2, s"sequence file needs (key,value), got ${cols.mkString(",")}")
    require(SeqCompressionModes.contains(compression),
      s"compression must be one of ${SeqCompressionModes.mkString("/")}, got $compression")
    val ordered = if (sorted) df.orderBy(col(cols(0))) else df
    val conf = new JobConf(df.sparkSession.sparkContext.hadoopConfiguration)
    compression match {
      case "none" =>
        org.apache.hadoop.mapred.FileOutputFormat.setCompressOutput(conf, false)
      case mode =>
        org.apache.hadoop.mapred.FileOutputFormat.setCompressOutput(conf, true)
        org.apache.hadoop.mapred.FileOutputFormat
          .setOutputCompressorClass(conf, classOf[DefaultCodec])
        SequenceFileOutputFormat.setOutputCompressionType(conf,
          org.apache.hadoop.io.SequenceFile.CompressionType
            .valueOf(mode.toUpperCase))
    }
    ordered.rdd
      .map(r => (new Text(String.valueOf(r.get(0))), new Text(String.valueOf(r.get(1)))))
      .saveAsHadoopFile(path, classOf[Text], classOf[Text],
        classOf[SequenceFileOutputFormat[Text, Text]], conf)
  }

  /** F1: SequenceFile.Sorter.sort analog (SequenceFile.java — the full
    * external sort, not just the merge): one range-partitioned shuffle
    * sort replaces the reference's spill-runs-then-heap-merge loop; any
    * input size sorts in a single distributed pass. */
  def sortSequenceFile(spark: SparkSession, inPath: String, outPath: String,
                       compression: String = "none"): Unit =
    writeSequenceFile(readSequenceFile(spark, inPath), outPath,
      sorted = true, compression = compression)

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

  /** F2 read side (MapFile.Reader.get, C/org/apache/hadoop/io/
    * MapFile.java:420-437): keyed point lookup over a writeSortedKeyed
    * table. The parquet row-group min/max stats ARE the MapFile key
    * index: the pushed equality predicate skips every row group whose
    * key range excludes the probe, reading only the group the index
    * points at — the same block-skip MapFile.Reader does with its
    * in-memory index. */
  def pointLookup(spark: SparkSession, path: String, keyCol: String,
                  key: Any): DataFrame =
    spark.read.parquet(path).filter(col(keyCol) === lit(key))

  /** F2 getClosest (MapFile.java:439-462): the entry with the smallest
    * key at-or-after the probe — a pushed range predicate (row-group
    * skip below the probe) + top-1, never a full scan. */
  def closestLookup(spark: SparkSession, path: String, keyCol: String,
                    key: Any): DataFrame =
    spark.read.parquet(path).filter(col(keyCol) >= lit(key))
      .orderBy(col(keyCol)).limit(1)

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
