package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Layout experiment main (local iteration; not part of the driver
  * contract): measures what [[graft.core.Scale.writeStateTables]]'s
  * bucketed layout buys on real state-table workloads vs the derived
  * views — the numbers behind the ScaleSpec plan pins. Times, on the
  * view and on the written layout: the S8 BlockEntry grouping, the N5
  * genstamp arbiter aggregation, and one path-recursion level (child
  * join) under forced sort-merge. Usage: runMain graft.LayoutBench [sfDir]
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.DerivedState.register(spark, sfDir)

    def time(name: String)(f: => Long): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[layout] $name%-34s $s%7.2f s  (rows=$n)")
      s
    }

    // materialize the layout once (cost reported separately — it is the
    // amortized write a real deployment pays per snapshot, not per query)
    val tWrite = time("writeStateTables") {
      graft.core.Scale.writeStateTables(
        spark.table("file"), spark.table("block"), spark.table("datanode"),
        prefix = "layoutbench", buckets = 32,
        reported = Some(spark.table("reported")))
      spark.table("layoutbench_block").count()
    }
    val viewBlock = spark.table("block")
    val layBlock = spark.table("layoutbench_block")
    val viewFile = spark.table("file")
    val layFile = spark.table("layoutbench_file")

    def s8(b: org.apache.spark.sql.DataFrame) =
      graft.state.StateManager.blockEntries(b).count()
    def arbiter(b: org.apache.spark.sql.DataFrame) =
      b.filter(col("version") > 0).groupBy(col("id"))
        .agg(max(col("generationStamp")), max(col("length"))).count()
    def level(f: org.apache.spark.sql.DataFrame) = {
      val frontier = f.filter(col("parentId") === 0L && col("id") =!= 0L)
        .select(col("id").as("__pid"))
      f.join(frontier, col("parentId") === col("__pid")).count()
    }

    val r = Seq(
      "s8_view" -> time("s8_blockEntries view")(s8(viewBlock)),
      "s8_layout" -> time("s8_blockEntries bucketed")(s8(layBlock)),
      "arbiter_view" -> time("n5_arbiter view")(arbiter(viewBlock)),
      "arbiter_layout" -> time("n5_arbiter bucketed")(arbiter(layBlock)),
    )
    // N5 reconcile: the derived views vs the co-bucketed staged layout
    // (the two co-partition knobs per Scale.writeStateTables scaladoc)
    def n5(b: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      graft.analytics.Dataflows.reconcileReports(b, r)
        .groupBy(col("action")).count().count()
    val rView = time("n5 reconcile views")(n5(viewBlock, spark.table("reported")))
    val prevScan = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val prevCoPart = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val rLay = time("n5 reconcile co-bucketed")(
      n5(layBlock, spark.table("layoutbench_reported")))
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevScan)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevCoPart)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val r2 = Seq(
      "level_view" -> time("path level view (SMJ)")(level(viewFile)),
      "level_layout" -> time("path level bucketed (SMJ)")(level(layFile)))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val all = ("write" -> tWrite) +: (r ++ Seq("n5_view" -> rView, "n5_layout" -> rLay) ++ r2)
    println(all.map { case (k, v) => s""""$k":$v""" }
      .mkString("""{"metric":"layout","sf":"""" + sfDir + "\",", ",", "}"))
    spark.stop()
  }
}
