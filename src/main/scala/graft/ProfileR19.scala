package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for the round-19 optimization pass (local
  * iteration only; not part of the driver contract — the Profile.scala
  * precedent). Times the sub-stages of the heaviest bench lines so plan
  * work targets the real cost, per guide §1: sub-frames are forced with
  * the noop sink (computes every column, §1.4), full queries with the
  * bench's own count() action for like-for-like numbers.
  * Usage: runMain graft.ProfileR19 [sfDir]
  */
object ProfileR19 {
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"[r19] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.sparkContext.setJobDescription(null)
    }

    // warmup: session + codegen + parquet footers
    SparkEntry.queries("q6_revenue_forecast")(spark, sfDir).count()

    // SPARK_GRAFT_PROFILE_FSCK=1: attribute n11_fsck_move's time (the
    // r19 sweep's 176 s outlier) — sizes of the corrupt/dirs frames and
    // the ancestor-probe join alone, both the startsWith (BNL) and the
    // keyed prefix formulation.
    if (sys.env.get("SPARK_GRAFT_PROFILE_FSCK").contains("1")) {
      val deadDn = spark.sql(graft.queries.AnalyticsQueries.FsckDeadNodesSql)
      val corrupt = graft.analytics.Dataflows.fsckFiles(
          spark.table("file"), spark.table("block"), deadDn,
          graft.model.DerivedState.NowMs)
        .filter(col("missingBlocks") > 0)
        .select(col("fileId").as("__cfid"), col("path").as("__cpath"))
        .localCheckpoint()
      println(s"[r19] corrupt rows = ${corrupt.count()}")
      val paths = graft.state.StateManager.materializePaths(spark.table("file"))
        .select(col("id").as("__lid"), col("length").as("__llen"),
          col("path").as("__lpath"))
      val dirs = paths.filter(col("__llen") === -1L && col("__lid") =!= 0L)
        .select(col("__lpath").as("__dpath")).localCheckpoint()
      println(s"[r19] dirs rows = ${dirs.count()}")
      time("fsck_anc_startsWith[noop]") {
        noop(broadcast(corrupt).join(dirs,
          col("__cpath").startsWith(concat(col("__dpath"), lit("/"))))
          .select(col("__cfid"),
            concat(lit("/lost+found"), col("__dpath")).as("cpath")))
      }
      time("fsck_anc_prefix_keyed[noop]") {
        val pref = corrupt
          .select(col("__cfid"), split(col("__cpath"), "/").as("__parts"))
          .filter(size(col("__parts")) >= 3)
          .select(col("__cfid"), explode(
            transform(sequence(lit(2), size(col("__parts")) - 1),
              i => array_join(slice(col("__parts"), lit(1), i), "/")))
            .as("__apath"))
        noop(pref.join(dirs, col("__apath") === col("__dpath"))
          .select(col("__cfid"),
            concat(lit("/lost+found"), col("__dpath")).as("cpath")))
      }
      time("n11_fsck_move_full[count]")(
        SparkEntry.queries("n11_fsck_move")(spark, sfDir).count())
      spark.stop(); return
    }

    // SPARK_GRAFT_PROFILE_BR=1: attribute n_block_received (29 s in the
    // r19 sweep) — the standing-marks pass, the receipt batch, the
    // pruned scan, and the full op.
    if (sys.env.get("SPARK_GRAFT_PROFILE_BR").contains("1")) {
      time("br_marks[action]") {
        graft.analytics.Replication.corruptMarks(
          graft.analytics.Dataflows.reconcileReports(
            spark.table("block"), spark.table("reported")))
          .localCheckpoint()
      }
      time("br_ops[action]") {
        spark.sql(graft.queries.AnalyticsQueries.BlockReceivedOpsSql)
          .localCheckpoint()
      }
      time("br_keyprune[action]") {
        val ops = spark.sql(graft.queries.AnalyticsQueries.BlockReceivedOpsSql)
          .localCheckpoint()
        graft.core.Scale.keyPrune(
          graft.store.StateStore.live(spark.table("block")), "id", ops, "blockId")
          .localCheckpoint()
      }
      time("n_block_received_full[count]")(
        SparkEntry.queries("n_block_received")(spark, sfDir).count())
      time("n_block_received_full2[count]")(
        SparkEntry.queries("n_block_received")(spark, sfDir).count())
      spark.stop(); return
    }

    // SPARK_GRAFT_PROFILE_BR2=1: attribute the r20 PINNED path of
    // n_block_received stage by stage — pin write, marks-over-pin,
    // ops-over-pin, and the blockReceived ladder remainder.
    if (sys.env.get("SPARK_GRAFT_PROFILE_BR2").contains("1")) {
      var pin: DataFrame = null
      time("br2_pin[action]") {
        pin = graft.store.StateStore.live(spark.table("block")).localCheckpoint()
      }
      pin.createOrReplaceTempView("graft_block_pin")
      val rep = spark.sql(
        graft.model.DerivedState.reportedSqlFrom("graft_block_pin"))
      rep.createOrReplaceTempView("graft_reported_pin")
      var marks: DataFrame = null
      time("br2_marks_over_pin[action]") {
        marks = graft.analytics.Replication.corruptMarks(
          graft.analytics.Dataflows.reconcileReports(pin, rep))
          .localCheckpoint()
      }
      var ops: DataFrame = null
      time("br2_ops_over_pin[action]") {
        ops = spark.sql(graft.queries.AnalyticsQueries
          .blockReceivedOpsSqlFrom("graft_reported_pin", "graft_block_pin"))
          .localCheckpoint()
      }
      time("br2_blockReceived_rest[count]") {
        graft.analytics.Replication.blockReceived(pin, spark.table("file"),
          spark.table("datanode"), ops, corrupt = Some(marks)).count()
      }
      // bisect the ranked action: holder-set build vs each window layer
      locally {
        import org.apache.spark.sql.expressions.Window
        val pruned = graft.core.Scale.keyPrune(pin, "id", ops, "blockId")
          .localCheckpoint()
        val ddim = spark.table("datanode").filter(col("version") > 0)
          .select(col("id").as("__did"), col("location").as("__rack"),
            col("remaining").as("__rem"), col("adminState").as("__adm"))
        val holders0 = pruned.select(col("id").as("__hb"), col("datanodeId"))
          .distinct()
          .join(broadcast(ddim), col("datanodeId") === col("__did"), "left")
          .filter(col("__adm").isNull || col("__adm") === "NORMAL")
          .withColumn("__rackKey",
            coalesce(col("__rack"), concat(lit("?"), col("datanodeId").cast("string"))))
        time("br2_holders[noop]")(noop(holders0))
        val wBlk = Window.partitionBy(col("__hb"))
        val wRack = Window.partitionBy(col("__hb"), col("__rackKey"))
        time("br2_holders_w1[noop]")(noop(
          holders0.withColumn("__cnt", count(lit(1)).over(wBlk))))
        time("br2_holders_w12[noop]")(noop(
          holders0.withColumn("__cnt", count(lit(1)).over(wBlk))
            .withColumn("__pri", count(lit(1)).over(wRack) > 1)))
        time("br2_holders_w123[noop]")(noop(
          holders0.withColumn("__cnt", count(lit(1)).over(wBlk))
            .withColumn("__pri", count(lit(1)).over(wRack) > 1)
            .withColumn("__stdRank", row_number().over(wBlk.orderBy(
              col("__pri").desc, col("__rem").asc_nulls_last,
              col("datanodeId").asc)))))
        val ranked0 = holders0
          .withColumn("__cnt", count(lit(1)).over(wBlk))
          .withColumn("__pri", count(lit(1)).over(wRack) > 1)
          .withColumn("__stdRank", row_number().over(wBlk.orderBy(
            col("__pri").desc, col("__rem").asc_nulls_last,
            col("datanodeId").asc)))
        time("br2_ranked_ckpt_alone")(ranked0.localCheckpoint())
        time("br2_ranked_ckpt_again")(ranked0.localCheckpoint())
      }
      time("n_block_received_full[count]")(
        SparkEntry.queries("n_block_received")(spark, sfDir).count())
      spark.stop(); return
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    (1 to reps).foreach { r =>
      println(s"--- rep $r ---")
      // ---- derivations -------------------------------------------------
      time("file_view[noop]")(noop(spark.table("file")))
      time("block_view[noop]")(noop(spark.table("block")))
      time("reported_view[noop]")(noop(spark.table("reported")))

      // ---- n5 decomposition -------------------------------------------
      val live = (df: DataFrame) => graft.store.StateStore.live(df)
      time("n5_foj_only[noop]") {
        val stored = live(spark.table("block")).select(
          col("id").as("blockId"), col("datanodeId"),
          col("length").as("storedLength"),
          col("generationStamp").as("storedGenStamp"))
        noop(spark.table("reported")
          .join(stored, Seq("datanodeId", "blockId"), "full_outer"))
      }
      time("n5_freshest_only[noop]") {
        noop(live(spark.table("block")).groupBy(col("id"))
          .agg(max(col("generationStamp")).as("maxGenStamp"),
            max_by(col("length"),
              struct(col("generationStamp"), col("version"))).as("freshestLength")))
      }
      time("n5_reconcile[noop]") {
        noop(graft.analytics.Dataflows.reconcileReports(
          spark.table("block"), spark.table("reported")))
      }
      time("n5_full[count]")(
        SparkEntry.queries("n5_block_report")(spark, sfDir).count())

      // ---- n6 decomposition -------------------------------------------
      time("n6_pruned[noop]") {
        noop(graft.analytics.Dataflows.underReplicatedPruned(
          spark.table("block"), spark.table("file"), spark.table("datanode"),
          graft.model.DerivedState.NowMs, k = 100))
      }
      time("n6_full[count]")(
        SparkEntry.queries("n6_under_replicated")(spark, sfDir).count())

      // ---- s1/s2 decomposition ----------------------------------------
      time("s1_dir_collect") {
        graft.state.StateManager.collectDirChildren(
          live(spark.table("file")), 2000000L)
      }
      time("s1_full[count]")(
        SparkEntry.queries("s1_path_resolution")(spark, sfDir).count())
      time("s2_full[count]")(
        SparkEntry.queries("s2_paths")(spark, sfDir).count())

      // ---- n15 ----------------------------------------------------------
      time("n15_dir_collect_nonames") {
        graft.state.StateManager.collectDirChildren(
          live(spark.table("file")), 2000000L, needNames = false)
      }
      time("n15_full[count]")(
        SparkEntry.queries("n15_content_summary")(spark, sfDir).count())

      // ---- s8 / n1 ------------------------------------------------------
      time("s8_full[count]")(
        SparkEntry.queries("s8_block_entries")(spark, sfDir).count())
      time("n1_full[count]")(
        SparkEntry.queries("n1_block_locations")(spark, sfDir).count())

      // ---- d2 stages (fuller set in Profile.scala) ----------------------
      time("d2_full[count]")(
        SparkEntry.queries("d2_minhash_lsh")(spark, sfDir).count())

      // ---- n11 / r9 ------------------------------------------------------
      time("n11_full[count]")(
        SparkEntry.queries("n11_fsck")(spark, sfDir).count())
      time("r9_full[count]")(
        SparkEntry.queries("r9_replay")(spark, sfDir).count())
    }
    spark.stop()
  }
}
