package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Dataflows
import graft.model.DerivedState
import graft.state.StateManager

/** FsShell-style verbs (SURVEY §2.5 F9, C/org/apache/hadoop/fs/
  * FsShell.java) over the engine's state tables — the demo CLI surface.
  *
  * Usage: runMain graft.cli.Shell <sfDir> <verb> [arg]
  *   ls <path>      listing of a directory
  *   lsr <path>     recursive listing
  *   du <path>      per-child subtree sizes
  *   dus <path>     single subtree summary
  *   count <path>   {dirs, files, bytes} of a subtree
  *   stat <path>    file status (with derived length)
  *   fsck           namespace health report
  *   report         datanode report
  *   dedup          simhash near-duplicate census over the documents corpus
  *   clean          the corpus cleaning pipeline (dedup → near-dup → quality)
  *   append <path>  reopen-for-append write-set for one file
  *   decontaminate  train/eval n-gram overlap report over the documents corpus
  */
object Shell {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Shell <sfDir> <verb> [path]")
    val (sfDir, verb) = (args(0), args(1))
    val path = if (args.length > 2) args(2) else "/"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    DerivedState.register(spark, sfDir)
    val file = spark.table("file")
    val block = spark.table("block")
    val datanode = spark.table("datanode")
    val Now = DerivedState.NowMs

    def resolve(p: String): Long =
      if (p == "/" || p.isEmpty) 0L
      else {
        import spark.implicits._
        val hits = StateManager.resolvePaths(file, Seq(p).toDF("path"))
          .select("id").collect()
        require(hits.nonEmpty, s"no such path: $p")
        hits.head.getLong(0)
      }

    verb match {
      case "ls" =>
        StateManager.listChildren(file, resolve(path))
          .select(col("name"), col("length"), col("replication"), col("mtime"))
          .orderBy(col("name")).show(50, truncate = false)
      case "lsr" =>
        StateManager.descendants(file, Seq(resolve(path)))
          .select(col("id"), col("parentId"), col("name"), col("length"))
          .orderBy(col("id")).show(50, truncate = false)
      case "du" =>
        val children = StateManager.listChildren(file, resolve(path))
          .select(col("id")).collect().map(_.getLong(0)).toSeq
        Dataflows.contentSummary(file, children).orderBy(col("rootId")).show(50)
      case "dus" | "count" =>
        Dataflows.contentSummary(file, Seq(resolve(path))).show()
      case "stat" =>
        val id = resolve(path)
        StateManager.fileInfo(file, block).filter(col("id") === id).show(truncate = false)
      case "fsck" =>
        Dataflows.fsck(file, block, datanode, Now).show(truncate = false)
      case "report" =>
        Dataflows.datanodeReport(datanode, Now)
          .select(col("id"), col("name"), col("alive"), col("adminState"),
            col("capacity"), col("remaining"))
          .orderBy(col("id")).show(50, truncate = false)
      case "dedup" =>
        // near-duplicate census over the documents corpus
        val docs = graft.core.Tables.documents(spark, sfDir)
        graft.functions.Dedup.simhashNearDups(docs, "doc_id", "text")
          .orderBy(col("hamming"), col("id1"), col("id2"))
          .show(20, truncate = false)
      case "clean" =>
        // the t5 pipeline: survivors of dedup + near-dup + quality gate
        graft.SparkEntry.queries("t5_clean_corpus")(spark, sfDir)
          .show(20, truncate = false)
      case "append" =>
        import spark.implicits._
        val id = resolve(path)
        val target = file.filter(col("id") === id && col("version") > 0)
          .select(col("parentId"), col("name")).collect()
        require(target.nonEmpty, s"no such live file: $path")
        val reqs = Seq((target.head.getLong(0), target.head.getString(1), "shell"))
          .toDF("parentId", "name", "holder")
        graft.state.Mutations.appendFile(file, block, reqs, nowMs = Now)
          .orderBy(col("writeOp"), col("id")).show(50, truncate = false)
      case "decontaminate" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
        graft.functions.Dedup.contamination(
            docs.filter(col("doc_id") % 97 =!= 0L),
            docs.filter(col("doc_id") % 97 === 0L),
            "doc_id", "text", minShared = 2)
          .orderBy(col("sharedShingles").desc, col("trainId"), col("evalId"))
          .show(20, truncate = false)
      case other => sys.error(s"unknown verb: $other")
    }
    spark.stop()
  }
}
