package graft

import org.apache.spark.sql.SparkSession

/** n1 bucket-granularity sweep (r18 judge item #6): the bucketed bench
  * pass carries a reproducible ~25% premium on n1_block_locations vs
  * the views layout (r18: 1.69 vs 1.32, attributed to 32-bucket scan
  * granularity on a multi-join — 32 buckets × per-bucket files caps
  * scan parallelism below the box's 32 cores once three state tables
  * are read together). This main makes the attribution a TABLE: the
  * same n1 timed (MIN-of-reps, RehearsalUtil protocol) on the views
  * layout and on state layouts materialized at each requested bucket
  * count. If the premium is granularity, it should shrink as buckets
  * grow past the core count; if it doesn't, "inherent, in-band" gets
  * recorded in BASELINE.md and the default stands.
  *
  * Usage: runMain graft.SweepBuckets [sfDir] [buckets...]
  *        (default sf0.1; 32 64 128)
  */
object SweepBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(32, 64, 128)
    RehearsalUtil.enforceHeapRule(1.0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.DerivedState.register(spark, sfDir)
    val reps = RehearsalUtil.reps(default = 3)

    // views baseline in the same window — cross-window comparisons are
    // exactly what the r17/r18 bucketed adjudication showed to be weak
    val tViews = RehearsalUtil.timeReps(spark, "sweep", "n1_views", reps) {
      SparkEntry.queries("n1_block_locations")(spark, sfDir).count()
    }
    val lines = counts.map { b =>
      // re-register the derivation views before each materialization:
      // the timed query's register() under graft.layout=bucketed
      // SHADOWS file/block/datanode with the catalog tables, and
      // writing graft_state_* from its own shadow is a read-write
      // conflict (and would measure a bucketed-to-bucketed copy)
      spark.conf.set("graft.layout", "views")
      graft.model.DerivedState.register(spark, sfDir)
      val t0 = System.nanoTime()
      graft.core.Scale.writeStateTables(spark.table("file"),
        spark.table("block"), spark.table("datanode"), buckets = b)
      val writeSec = (System.nanoTime() - t0) / 1e9
      spark.conf.set("graft.layout", "bucketed")
      spark.conf.set(graft.core.Tables.LayoutDirKey, sfDir)
      val t = RehearsalUtil.timeReps(spark, "sweep", s"n1_b$b", reps) {
        SparkEntry.queries("n1_block_locations")(spark, sfDir).count()
      }
      println(f"[sweep] buckets=$b%d n1=$t%.2f s (layout write $writeSec%.1f s)")
      s"n1_b$b" -> t
    }
    val all = ("n1_views" -> tViews) +: lines
    println(all.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"metric":"sweep_buckets","sf":"$sfDir","reps":$reps,""",
        ",", "}"))
    spark.stop()
  }
}
