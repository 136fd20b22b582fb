package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Dataflows
import graft.model.DerivedState
import graft.state.{Mutations, StateManager}
import graft.store.StateStore

/** FsShell-style verbs (SURVEY §2.5 F9, C/org/apache/hadoop/fs/
  * FsShell.java) over the engine's state tables — the demo CLI surface.
  *
  * Usage: runMain graft.cli.Shell <sfDir> <verb> [args...]
  *
  * Namespace verbs (over the derived state tables):
  *   ls <path>       listing of a directory
  *   lsr <path>      recursive listing
  *   du <path>       per-child subtree sizes
  *   dus <path>      single subtree summary
  *   count <path>    {dirs, files, bytes} of a subtree
  *   stat <path>     file status (with derived length)
  *   test <path>     existence/type probe (exists, isDir, isFile)
  *   mkdir <path>    mkdir write-set (parent must exist)
  *   touchz <path>   zero-length file-create write-set
  *   mv <src> <dst>  rename/move write-set (+ both-parent mtime touches)
  *   rm [-trash] <path>  guarded non-recursive delete write-set; -trash
  *                   moves to /.Trash/Current instead (Trash.moveToTrash)
  *   rmr <path>      recursive subtree tombstone write-set
  *   setrep <path> <n>   replication write-set for one live file
  *   chown <path> <uid>  owner write-set for one live file
  *   chmod <path> <octal> validate + resolve, then reference-faithful no-op
  *   chgrp <path> <group> validate + resolve, then reference-faithful no-op
  *   df                  cluster capacity/used/remaining (S13 agg)
  *   fsck            namespace health report
  *   report          datanode report
  *   stats           dfsadmin -report header: capacity + block counters
  *   oiv [-xml]      offline image viewer: ls lines / XML INODE elements
  *   balancer [-threshold t] [-report]  balancer move schedule / node classes
  *   append <path>   reopen-for-append write-set for one file
  *
  * Content verbs (over SequenceFile dirs — the engine's F1 storage
  * format; the reference's cat/text/tail/getmerge read DFS bytes, which
  * SURVEY scopes to the storage layer, so here they read the engine's
  * own on-disk format):
  *   cat <dir>             all (key, value) rows in key order
  *   text <dir>            alias of cat (values are already text)
  *   tail <dir> [n]        last n rows by key (default 10)
  *   getmerge <in>... <out>  merge pre-sorted runs into <out>, show result
  *
  * Corpus verbs (documents table):
  *   dedup / clean / decontaminate / score / classify / langid / drift
  *   bm25index [maxPostings]   build the PRODUCTION serve index —
  *                             BOUNDED by default (ServeMaxPostings);
  *                             0 = exact unbounded (the gates' config)
  *
  * `run` returns the frame `main` displays — the session lifecycle stays
  * in `main`, so specs drive every verb end-to-end through `run`.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Shell <sfDir> <verb> [args...]")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, args(0), args(1), args.drop(2).toSeq).show(50, truncate = false)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, verb: String,
          args: Seq[String] = Seq("/")): DataFrame = {
    import spark.implicits._
    lazy val tables = { DerivedState.register(spark, sfDir); () }
    def file = { tables; spark.table("file") }
    def block = { tables; spark.table("block") }
    def datanode = { tables; spark.table("datanode") }
    val Now = DerivedState.NowMs
    val path = args.headOption.getOrElse("/")

    // "/a/b/c" → ("/a/b", "c"); "/x" → ("/", "x")
    def splitPath(p: String): (String, String) = {
      require(p.startsWith("/"), s"not an absolute path: $p")
      val trimmed = p.stripSuffix("/")
      val cut = trimmed.lastIndexOf('/')
      require(cut >= 0 && trimmed.length > cut + 1, s"not an absolute path: $p")
      (if (cut == 0) "/" else trimmed.substring(0, cut), trimmed.substring(cut + 1))
    }

    // bounded write-sets come back as local-row frames: the distributed
    // plan executes exactly once and no persisted/checkpointed storage
    // outlives the verb (run() is reused across many calls in one session)
    def localized(rows: Array[org.apache.spark.sql.Row],
                  schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

    def resolve(p: String): Long =
      if (p == "/" || p.isEmpty) 0L
      else {
        val hits = StateManager.resolvePaths(file, Seq(p).toDF("path"))
          .select("id").collect()
        require(hits.nonEmpty, s"no such path: $p")
        hits.head.getLong(0)
      }

    def hasGlob(p: String): Boolean =
      p.exists(c => "*?[{".indexOf(c.toInt) >= 0)

    // FsShell expands glob arguments before dispatch (globStatus) — a
    // multi-target verb takes every match, a literal path stays single
    def resolveMany(p: String): Seq[Long] =
      if (hasGlob(p)) {
        val ids = StateManager.resolveGlobs(file, Seq(p))
          .select(col("id")).collect().map(_.getLong(0)).toSeq
        require(ids.nonEmpty, s"no match: $p")
        ids
      } else Seq(resolve(p))

    verb match {
      case "ls" =>
        // glob patterns list their MATCHES (globStatus semantics); a
        // literal path lists its children
        if (hasGlob(path))
          StateManager.resolveGlobs(file, Seq(path))
            .select(col("path"), col("length"), col("replication"), col("mtime"))
            .orderBy(col("path"))
        else StateManager.listChildren(file, resolve(path))
          .select(col("name"), col("length"), col("replication"), col("mtime"))
          .orderBy(col("name"))
      case "lsr" =>
        StateManager.descendants(file, Seq(resolve(path)))
          .select(col("id"), col("parentId"), col("name"), col("length"))
          .orderBy(col("id"))
      case "du" =>
        // du prints per-child sizes only (FsShell.du) — the quota columns
        // belong to count -q, keep this surface at its pre-quota shape
        val children = StateManager.listChildren(file, resolve(path))
          .select(col("id")).collect().map(_.getLong(0)).toSeq
        Dataflows.contentSummary(file, children)
          .select(col("rootId"), col("length"), col("fileCount"), col("dirCount"))
          .orderBy(col("rootId"))
      case "dus" | "count" =>
        // count [-q] <path> (fs/shell/Count.java:30-77): -q prefixes the
        // quota columns in ContentSummary.toString(true) order — "none"/
        // "inf" when unset (quota<=0), which in this engine is always,
        // faithfully: the ADFS file model carries no quota column, so no
        // quota is ever set (INode.getNsQuota default -1)
        val qOpt = args.contains("-q")
        val target = args.filterNot(_ == "-q").headOption.getOrElse("/")
        val s = Dataflows.contentSummary(file, resolveMany(target))
        if (qOpt) s.select(
          when(col("quota") > 0, col("quota").cast("string"))
            .otherwise(lit("none")).as("quota"),
          when(col("quota") > 0,
            (col("quota") - (col("dirCount") + col("fileCount"))).cast("string"))
            .otherwise(lit("inf")).as("remainingQuota"),
          when(col("spaceQuota") > 0, col("spaceQuota").cast("string"))
            .otherwise(lit("none")).as("spaceQuota"),
          when(col("spaceQuota") > 0,
            (col("spaceQuota") - col("spaceConsumed")).cast("string"))
            .otherwise(lit("inf")).as("remainingSpaceQuota"),
          col("dirCount"), col("fileCount"), col("length"))
        // without -q, count prints only dirCount/fileCount/length
        // (Count.java:63-66) — keep the pre-quota column surface
        else s.select(col("rootId"), col("length"), col("fileCount"),
          col("dirCount"))
      case "stat" =>
        val id = resolve(path)
        StateManager.fileInfo(file, block).filter(col("id") === id)
      case "test" =>
        // FsShell test -e/-d/-f probe as one row (exit codes are not a
        // DataFrame surface; the caller reads the booleans)
        val hits = StateManager.resolvePaths(file, Seq(path).toDF("path"))
          .select(col("id"), col("length")).collect()
        val exists = path == "/" || hits.nonEmpty
        val isDir = path == "/" || hits.headOption.exists(_.getLong(1) == -1L)
        Seq((path, exists, isDir, exists && !isDir))
          .toDF("path", "exists", "isDir", "isFile")
      case "mkdir" | "touchz" =>
        // write-set only (like append/setrep): parent must already exist,
        // new id = max live id + rank — the caller applies it under the
        // single-writer discipline. A refused request fails LOUD with the
        // validator's reason instead of returning an empty frame.
        val (pPath, name) = splitPath(path)
        // dfs.max.objects gate, reference default 0 = disabled
        // (FSNamesystem.java:4070-4073 via startFile :1031 / mkdirs :1451)
        Mutations.checkFsObjectLimit(file, block,
          spark.conf.get("graft.dfs.max.objects", "0").toLong)
        val req = Seq((resolve(pPath), name)).toDF("parentId", "name")
        val rejects = Mutations.validateInserts(file, req)
          .filter(col("reject").isNotNull).select(col("reject")).collect()
        require(rejects.isEmpty, s"$verb $path refused: ${rejects.head.getString(0)}")
        val idBase = file.agg(max(col("id"))).collect()(0).getLong(0)
        // collect: execute the write-set plan ONCE, then both the drift
        // guard below and the caller's consumption read the local rows
        // (mkdirs re-validates internally; if its rules ever drift ahead
        // of the pre-check above, fail loud, not empty). A write-set is
        // bounded by the request batch — localizing it leaves nothing
        // cached behind in a long-lived session (run() is a reusable API).
        val ws = Mutations.mkdirs(file, req, idBase = idBase, nowMs = Now,
          leafLength = if (verb == "mkdir") -1L else 0L)
        val rows = ws.orderBy(col("writeOp"), col("id")).collect()
        require(rows.exists(_.getAs[String]("writeOp") == "insert"),
          s"$verb $path refused by mkdirs validation")
        localized(rows, ws.schema)
      case "mv" =>
        require(args.size >= 2, "usage: mv <src> <dstPath>")
        val id = resolve(path)
        val (dstParent, newName) = splitPath(args(1))
        // rename returns a MATERIALIZED persisted write-set (Caching
        // contract); localize it and release the cache whether or not the
        // refusal check passes — run() is a reusable API, not only the
        // one-verb-per-process CLI, so it must not leak per-call storage
        val out = Mutations.rename(file,
          Seq((id, resolve(dstParent), newName)).toDF("id", "newParentId", "newName"),
          nowMs = Now)
        try {
          val rows = out.orderBy(col("writeOp"), col("id")).collect()
          // rename drops rejected rows from the write-set — surface the
          // refusal (target exists / under own subtree / ...) loudly
          require(rows.exists(_.getAs[String]("writeOp") == "move"),
            s"mv $path -> ${args(1)} refused by rename validation")
          localized(rows, out.schema)
        } finally out.unpersist(blocking = false)
      case "cp" =>
        require(args.size >= 2, "usage: cp <src> <dstPath>")
        val id = resolve(path)
        val (dstParent, newName) = splitPath(args(1))
        // coalesce: an empty table's max(id) is null and getLong would NPE
        // (a directories-only namespace has zero block rows)
        val maxFileId = file.agg(coalesce(max(col("id")), lit(0L)))
          .collect()(0).getLong(0)
        val maxBlockId = block.agg(coalesce(max(col("id")), lit(0L)))
          .collect()(0).getLong(0)
        // copy returns a MATERIALIZED persisted write-set (Caching
        // contract, like rename) — release it whether or not the refusal
        // check passes
        val out = Mutations.copy(file, block,
          Seq((id, resolve(dstParent), newName))
            .toDF("srcId", "dstParentId", "newName"),
          idBase = maxFileId, blockIdBase = maxBlockId)
        try {
          val rows = out.orderBy(col("writeOp"), col("tbl"), col("id")).collect()
          // a refused copy fails LOUD with the validator's reason
          rows.find(_.getAs[String]("writeOp") == "reject").foreach(r =>
            throw new IllegalArgumentException(
              s"cp $path -> ${args(1)} refused: ${r.getAs[String]("reject")}"))
          localized(rows, out.schema)
        } finally out.unpersist(blocking = false)
      case "put" | "copyFromLocal" | "moveFromLocal" =>
        // namenode side of the client write loop (FsShell.java:128-161 →
        // DFSClient create/addBlock/complete): the LOCAL file's real
        // length drives the declarative block fan-out; byte transport
        // (F10) is out of scope per SURVEY
        require(args.size >= 2, s"usage: $verb <localFile> <dfsPath>")
        val local = new java.io.File(path)
        require(local.isFile, s"local file not found: $path")
        val (pPath, name) = splitPath(args(1))
        Mutations.checkFsObjectLimit(file, block,
          spark.conf.get("graft.dfs.max.objects", "0").toLong)
        val req = Seq((resolve(pPath), name, "shell", local.length()))
          .toDF("parentId", "name", "holder", "fileLength")
        val idBase = file.agg(coalesce(max(col("id")), lit(0L)))
          .collect()(0).getLong(0)
        val blockIdBase = block.agg(coalesce(max(col("id")), lit(0L)))
          .collect()(0).getLong(0)
        val ws = Mutations.putFile(file, req, idBase = idBase,
          blockIdBase = blockIdBase,
          blockSize = spark.conf.get("graft.dfs.block.size", "67108864").toLong,
          nowMs = Now)
        val rows = ws.orderBy(col("writeOp"), col("tbl"), col("id")).collect()
        rows.find(_.getAs[String]("writeOp") == "reject").foreach(r =>
          throw new IllegalArgumentException(
            s"$verb $path -> ${args(1)} refused: ${r.getAs[String]("reject")}"))
        // moveFromLocal = copyFromLocal + local delete (FsShell.java:140-151)
        if (verb == "moveFromLocal") local.delete()
        localized(rows, ws.schema)
      case "get" | "copyToLocal" =>
        // namenode side of get (FsShell.java:163-234 copyToLocal →
        // DFSClient.open → getBlockLocations): the block manifest the
        // client would fetch, replicas distance-ordered for a client on
        // clientRack (conf) — byte transport out of scope per SURVEY
        val id = resolve(path)
        val reqs = Seq((id, 0L, Long.MaxValue)).toDF("fileId", "offset", "reqLen")
        val manifest = Dataflows.blockLocations(block, reqs)
          .select(col("fileId"), col("id"), col("fileIndex"),
            col("blockStart"), col("blockEnd"))
        val ordered = Dataflows.replicasByDistance(
            block.filter(col("fileId") === id), datanode,
            clientRack = spark.conf.get("graft.client.rack", "/default-rack"))
          .select(col("id").as("__bid"), col("orderedReplicas"))
        manifest.join(ordered, col("id") === col("__bid"), "left").drop("__bid")
          .orderBy(col("fileIndex"))
      case "moveToLocal" =>
        // the reference refuses too (FsShell.java:329-330)
        throw new UnsupportedOperationException(
          "Option '-moveToLocal' is not implemented yet.")
      case "metasave" | "finalizeUpgrade" =>
        // both have EMPTY bodies in the reference (FSNamesystem.java:
        // 460-461 metaSave, :3472-3473 finalizeUpgrade — ADFS dropped
        // them with the in-memory namespace); the faithful behavior is
        // the same no-op
        spark.emptyDataFrame
      case "safemode" =>
        // dfsadmin -safemode get (SafeModeInfo, FSNamesystem.java:3531-
        // 3700): blocks at minimal replication vs total against the
        // threshold; enter/leave are process state in the reference —
        // here the frame IS the state, so get reports it
        Dataflows.safeModeStatus(block, minReplication = 1,
          thresholdPct = spark.conf
            .get("graft.dfs.safemode.threshold.pct", "0.999").toDouble)
      case "refreshNodes" =>
        // dfsadmin -refreshNodes (FSNamesystem.java:3444-3470): re-read
        // dfs.hosts / dfs.hosts.exclude and reconcile every datanode —
        // not-in-hosts → DECOMMISSIONED outright (case 2), excluded →
        // startDecommission (case 3), re-included → stopDecommission
        // (case 4). Args: <hostsFile|-> <excludesFile|->, local newline
        // lists of node NAMES; '-'/missing = empty (empty hosts = all
        // included, the Hadoop convention).
        def readList(p: String): Set[String] =
          if (p == "-") Set.empty
          else {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
              .asScala.map(_.trim).filter(_.nonEmpty).toSet
          }
        val hosts = readList(args.headOption.getOrElse("-"))
        val excludes = readList(args.drop(1).headOption.getOrElse("-"))
        // node-dimension bounded, like the reference's descriptor walk
        val nodes = datanode.filter(col("version") > 0)
          .select(col("id"), col("name"), col("adminState"), col("version"))
          .collect()
        def inHosts(n: String) = hosts.isEmpty || hosts.contains(n)
        val reqs = nodes.flatMap { r =>
          val (name, st) = (r.getString(1), r.getString(2))
          if (!inHosts(name)) None // case 2 handled below
          else if (excludes.contains(name) && st == "NORMAL")
            Some((r.getLong(0), "start")) // case 3
          else if (!excludes.contains(name) && st != "NORMAL")
            Some((r.getLong(0), "stop")) // case 4
          else None
        }.toSeq
        val directRows = nodes.toSeq
          .filter(r => !inHosts(r.getString(1)) && r.getString(2) != "DECOMMISSIONED")
        val direct = directRows
          .map(r => ("admin", r.getLong(0), r.getString(2), "DECOMMISSIONED",
            None: Option[Long], None: Option[Long], None: Option[Long],
            r.getLong(3) + 1L))
          .toDF("writeOp", "id", "prevAdminState", "adminState",
            "underReplicatedBlocks", "decommissionOnlyReplicas",
            "underReplicatedInOpenFiles", "version")
        // setAdminState re-gates EVERY DECOMMISSION_INPROGRESS node; a
        // dropped-from-hosts node in that state is already decided by the
        // direct case-2 row — keep exactly one row per node
        val directIds = directRows.map(_.getLong(0))
        val ws = Mutations.setAdminState(datanode, block, file,
            reqs.toDF("nodeId", "op"))
          .filter(if (directIds.isEmpty) lit(true)
                  else !col("id").isin(directIds: _*))
        ws.unionByName(direct).orderBy(col("writeOp"), col("id"))
      case "setQuota" | "setSpaceQuota" | "clrQuota" | "clrSpaceQuota" =>
        // DFSAdmin quota commands (hdfs/tools/DFSAdmin.java:71-160):
        // write-set rows against the quotas side-table contentSummary
        // consumes — the ADFS file table carries no quota column, so the
        // side-table IS the store. QUOTA_DONT_SET leaves the other leg
        // untouched on apply (FSConstants.java:30-31).
        val QuotaDontSet = Long.MaxValue
        val QuotaReset = -1L
        val (q, dirs) =
          if (verb.startsWith("set")) {
            require(args.size >= 2, s"usage: $verb <quota> <dir>...")
            (args.head.toLong, args.tail)
          } else (QuotaReset, args)
        require(!verb.startsWith("set") || q > 0,
          s"$verb: quota must be positive, got $q") // DFSAdmin.java:121-124
        val ids = dirs.flatMap(resolveMany)
        // per-directory commands: a file target fails loud, like the
        // reference's "not a directory" from setQuota
        val targets = file.filter(col("id").isin(ids: _*) && col("version") > 0)
          .select(col("id"), col("length")).collect()
        targets.filter(_.getLong(1) != -1L).foreach(r =>
          throw new IllegalArgumentException(
            s"$verb: ${r.getLong(0)} is not a directory"))
        val nsQ = verb match {
          case "setQuota" => q
          case "clrQuota" => QuotaReset
          case _          => QuotaDontSet
        }
        val dsQ = verb match {
          case "setSpaceQuota" => q
          case "clrSpaceQuota" => QuotaReset
          case _               => QuotaDontSet
        }
        ids.map(i => ("quota", i, nsQ, dsQ))
          .toDF("writeOp", "dirId", "nsQuota", "dsQuota")
          .orderBy(col("dirId"))
      case "expunge" =>
        Mutations.expunge(file, nowMs = Now)
          .orderBy(col("writeOp"), col("id"))
      case "rm" =>
        // -trash simulates fs.trash.interval > 0: FsShell delete first
        // tries Trash.moveToTrash (fs/Trash.java:103-152) and only
        // deletes for real when the trash is disabled — the default
        // interval is 0, so plain rm stays a true delete
        if (args.contains("-trash")) {
          val target = args.filterNot(_ == "-trash").headOption.getOrElse("/")
          val maxFileId = file.agg(coalesce(max(col("id")), lit(0L)))
            .collect()(0).getLong(0)
          // FsShell expands globs before dispatch for every path argument,
          // trash-enabled deletes included — mirror rm/rmr's resolveMany
          val out = Mutations.moveToTrash(file,
            resolveMany(target).toDF("id"), idBase = maxFileId, nowMs = Now)
          val rows = out.orderBy(col("writeOp"), col("id")).collect()
          rows.find(_.getAs[String]("writeOp") == "reject").foreach(r =>
            throw new IllegalArgumentException(
              s"rm -trash $target refused: ${r.getAs[String]("reject")}"))
          localized(rows, out.schema)
        } else Mutations.guardedDelete(file, resolveMany(path).toDF("id"))
          .orderBy(col("id"))
      case "rmr" =>
        val ids = resolveMany(path)
        require(!ids.contains(0L), "cannot delete root") // match rm's guard
        StateManager.recursiveDelete(file, ids)
          .select(col("id"), col("parentId"), col("name"), col("version"))
          .orderBy(col("id"))
      case "setrep" =>
        require(args.size >= 2, "usage: setrep <path> <replication>")
        val id = resolve(path)
        // replication is a FILE attribute (dirs have length = -1)
        require(file.filter(col("id") === id && col("version") > 0 &&
            col("length") >= 0L).limit(1).count() > 0,
          s"setrep: not a live file: $path")
        Mutations.setAttrs(file, col("id") === id && col("version") > 0,
            Map("replication" -> StateStore.Assign(args(1).toLong)), nowMs = Now)
          .filter(col("id") === id)
          .select(col("id"), col("name"), col("replication"), col("version"))
      case "chown" =>
        require(args.size >= 2, "usage: chown <path> <ownerId>")
        val id = resolve(path)
        Mutations.setAttrs(file, col("id") === id && col("version") > 0,
            Map("owner" -> StateStore.Assign(args(1).toLong)), nowMs = Now)
          .filter(col("id") === id)
          .select(col("id"), col("name"), col("owner"), col("version"))
      case "df" =>
        // FsShell df (C/org/apache/hadoop/fs/FsShell.java "-df"): cluster
        // capacity/used/remaining + use% — one S13 wide agg over live nodes
        StateManager.clusterStats(datanode, Now)
          .select(col("capacity"), col("dfsUsed"), col("remaining"),
            // zero live capacity (empty/all-dead cluster) is 0% used, not
            // NaN/Infinity from the raw division
            when(col("capacity") > 0,
              round(col("dfsUsed") * 100.0 / col("capacity"), 2))
              .otherwise(lit(0.0)).as("usePct"),
            col("liveNodes"), col("deadNodes"))
      case "chgrp" =>
        require(args.size >= 2, s"usage: chgrp <path> <group>")
        val id = resolve(path)
        // Same fidelity class as chmod: the reference's file model has no
        // group column (A/file/File.java:37-58 — owner int only; its
        // FsShellPermissions routes chgrp through the chown handler into
        // setOwner, which is a TODO no-op, FSNamesystem.java:587-589).
        // Validate + resolve loudly, change nothing.
        file.filter(col("id") === id && col("version") > 0)
          .select(col("id"), col("name"), col("owner"), col("version"))
      case "chmod" =>
        require(args.size >= 2, "usage: chmod <path> <octalMode>")
        val mode =
          try java.lang.Integer.parseInt(args(1), 8)
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(s"chmod: bad octal mode: ${args(1)}") }
        require(mode >= 0 && mode <= 0xFFF, s"chmod: bad octal mode: ${args(1)}")
        val id = resolve(path)
        // Fidelity note: the reference's file model carries NO permission
        // column (A/file/File.java:37-58 — owner is the only principal
        // field) and its FSNamesystem.setPermission is an explicit TODO
        // no-op (H/org/apache/hadoop/hdfs/server/namenode/
        // FSNamesystem.java:578-580). chmod therefore validates the mode
        // and resolves the path like every verb — refusing bad input
        // loudly — and then, exactly like the reference, changes nothing:
        // the live row comes back untouched (version included).
        file.filter(col("id") === id && col("version") > 0)
          .select(col("id"), col("name"), col("owner"), col("version"))
      case "balancer" =>
        // start-balancer.sh [-threshold t] (server/balancer/Balancer.java):
        // prints the move schedule; -report prints the per-node
        // classification instead
        val t = args.sliding(2).collectFirst {
          case Seq("-threshold", v) => v.toDouble }.getOrElse(10.0)
        if (args.contains("-report"))
          graft.analytics.Balancer.classify(datanode, Now, t)
            .orderBy(col("id"))
        else
          graft.analytics.Balancer.pairs(datanode, Now, t)
            .orderBy(col("pass"), col("sourceId"), col("targetId"))
      case "fsck" =>
        // flags follow DFSck (NamenodeFsck.java:118-145): -files lists
        // per-file findings, -move rescues corrupt files to /lost+found
        // (a write-set here), -delete removes them; default = the
        // aggregate Result row
        // the reference's fsck is path-scoped: the first non-flag arg
        // bounds every surface, including the -move/-delete write-sets
        val scope = args.find(!_.startsWith("-")).getOrElse("/")
        if (args.contains("-move")) {
          // action flags take precedence: the reference runs the rescue
          // alongside any print flags, and of the two surfaces only the
          // write-set has effects — never silently drop it
          val idBase = file.agg(coalesce(max(col("id")), lit(0L)))
            .collect()(0).getLong(0)
          Dataflows.fsckMove(file, block, datanode, Now, idBase,
              pathPrefix = scope)
            .orderBy(col("writeOp"), col("tbl"), col("id"), col("datanodeId"))
        } else if (args.contains("-delete"))
          Dataflows.fsckDelete(file, block, datanode, Now, pathPrefix = scope)
            .orderBy(col("writeOp"), col("tbl"), col("id"), col("datanodeId"))
        else if (args.exists(Set("-blocks", "-locations", "-racks"))) {
          // -blocks per-block detail; -locations adds holders, -racks
          // their racks (NamenodeFsck.java:139-141)
          val detail = Dataflows.fsckBlocks(file, block, datanode, Now,
            pathPrefix = scope)
          val drop =
            (if (args.contains("-racks")) Seq.empty[String] else Seq("racks")) ++
            (if (args.contains("-locations") || args.contains("-racks"))
               Seq.empty[String] else Seq("locations"))
          detail.drop(drop: _*).orderBy(col("path"), col("fileIndex"))
        } else if (args.contains("-files") || args.contains("-openforwrite"))
          Dataflows.fsckFiles(file, block, datanode, Now,
              showOpenFiles = args.contains("-openforwrite"))
            .orderBy(col("path"))
        else Dataflows.fsck(file, block, datanode, Now)
      case "report" =>
        Dataflows.datanodeReport(datanode, Now)
          .select(col("id"), col("name"), col("alive"), col("adminState"),
            col("capacity"), col("remaining"))
          .orderBy(col("id"))
      case "stats" =>
        // dfsadmin -report header (getStats, FSNamesystem.java:3040-3042):
        // S13 capacity aggregates + the three block counters. The shell
        // session keeps no standing corrupt map, so that counter reads 0
        // (the reference too starts empty after a namenode restart).
        val noMarks = spark.emptyDataFrame
          .withColumn("blockId", lit(null).cast("long"))
          .withColumn("datanodeId", lit(null).cast("long"))
        StateManager.clusterStats(datanode, Now)
          .crossJoin(Dataflows.blockStats(block, file, datanode, noMarks, Now))
      case "oiv" =>
        // offlineImageViewer: -xml emits the INODE elements, default the
        // Ls visitor lines (OfflineImageViewer.java processor choice)
        if (args.contains("-xml"))
          graft.sources.Formats.oivXml(file, block)
            .orderBy(col("path")).select(col("xml"))
        else
          graft.sources.Formats.oivLs(file)
            .orderBy(col("path")).select(col("line"))
      case "cat" | "text" =>
        graft.sources.Formats.readSequenceFile(spark, path)
          .orderBy(col("key"), col("value"))
      case "tail" =>
        val n = if (args.size > 1) args(1).toInt else 10
        // top-n via orderBy+limit → TakeOrderedAndProject (per-partition
        // top-n + driver merge), never a single-partition window over the
        // whole file
        graft.sources.Formats.readSequenceFile(spark, path)
          .orderBy(col("key").desc, col("value").desc).limit(n)
          .orderBy(col("key"), col("value"))
      case "getmerge" =>
        require(args.size >= 2, "usage: getmerge <in>... <out>")
        graft.sources.Formats.mergeSequenceFiles(spark, args.dropRight(1), args.last)
        graft.sources.Formats.readSequenceFile(spark, args.last)
          .orderBy(col("key"), col("value"))
      case "dedup" =>
        // near-duplicate census over the documents corpus
        val docs = graft.core.Tables.documents(spark, sfDir)
        graft.functions.Dedup.simhashNearDups(docs, "doc_id", "text")
          .orderBy(col("hamming"), col("id1"), col("id2"))
      case "clean" =>
        // the t5 pipeline: survivors of dedup + near-dup + quality gate
        graft.SparkEntry.queries("t5_clean_corpus")(spark, sfDir)
      case "append" =>
        val id = resolve(path)
        val target = file.filter(col("id") === id && col("version") > 0)
          .select(col("parentId"), col("name")).collect()
        require(target.nonEmpty, s"no such live file: $path")
        val reqs = Seq((target.head.getLong(0), target.head.getString(1), "shell"))
          .toDF("parentId", "name", "holder")
        Mutations.appendFile(file, block, reqs, nowMs = Now)
          .orderBy(col("writeOp"), col("id"))
      case "score" =>
        // CCNet-style LM bucket report: the t27 pipeline (train-slice
        // bigram model, exact tercile cutoffs) summarized per bucket
        graft.SparkEntry.queries("t27_ppl_buckets")(spark, sfDir)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("nDocs"),
            min(col("scaledMean")).as("minScore"),
            max(col("scaledMean")).as("maxScore"))
          .orderBy(col("bucket"))
      case "classify" =>
        // model-based quality filter report: the t28 classifier
        // summarized per verdict (DCLM/FineWeb's keep/drop tallies)
        graft.SparkEntry.queries("t28_quality_classifier")(spark, sfDir)
          .groupBy(col("keep"))
          .agg(count(lit(1)).as("nDocs"),
            min(col("score")).as("minScore"),
            max(col("score")).as("maxScore"))
          .orderBy(col("keep"))
      case "langid" =>
        // model-based language routing report: the t31 k-class NB argmax
        // summarized per predicted language (the crawl-routing tallies)
        graft.SparkEntry.queries("t31_langid_model")(spark, sfDir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("nDocs"),
            min(col("score")).as("minScore"),
            max(col("score")).as("maxScore"))
          .orderBy(col("lang"))
      case "drift" =>
        // the v4 watchdog report: per-comparison TVD + verdict
        graft.SparkEntry.queries("v4_dist_drift")(spark, sfDir)
          .select(col("lbl"), col("tvd_ppm"), col("drifted")).distinct()
          .orderBy(col("lbl"))
      case "bm25index" =>
        // THE production serve-index build over the documents corpus
        // (r19 judge item #2): bounded by DEFAULT — bm25ServeIndex caps
        // each surviving term at ServeMaxPostings highest-impact
        // postings (the priced recall@10 0.960 / MRR 1.000 setting;
        // BASELINE.md r18 recall table), so a deployer who never read
        // the docs still ships a serve whose per-query candidate cost
        // is scale-invariant instead of the 48%-of-corpus hot-list
        // join. `bm25index [maxPostings]` overrides the bound
        // EXPLICITLY; 0 asks for the exact unbounded index (the gates'
        // config — the writePostingIndex hot-list warning is the only
        // guard rail on that path, by design).
        val bound = args.headOption.filter(_.nonEmpty).map(_.toLong)
          .getOrElse(graft.functions.TextFunctions.ServeMaxPostings)
        val docs = graft.core.Tables.documents(spark, sfDir)
        val posts = graft.functions.TextFunctions.bm25Postings(
          docs, "doc_id", "text")
        val idx = graft.functions.TextFunctions.bm25ServeIndex(posts,
          maxDfPpm = 900000L,
          maxPostings = if (bound == 0L) Long.MaxValue else bound)
        idx.groupBy(col("term"))
          .agg(count(lit(1)).as("postings"), max(col("df")).as("df"))
          .orderBy(col("postings").desc, col("term")).limit(50)
      case "decontaminate" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
        graft.functions.Dedup.contamination(
            docs.filter(col("doc_id") % 97 =!= 0L),
            docs.filter(col("doc_id") % 97 === 0L),
            "doc_id", "text", minShared = 2)
          .orderBy(col("sharedShingles").desc, col("trainId"), col("evalId"))
      case other => sys.error(s"unknown verb: $other")
    }
  }
}
