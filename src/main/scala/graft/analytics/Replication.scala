package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.state.StateManager

/** Replication bookkeeping the monitor loop reads and writes (SURVEY
  * §2.4 N9/N10): the PendingReplicationBlocks lifecycle
  * (H/org/apache/hadoop/hdfs/server/namenode/PendingReplicationBlocks.java),
  * the CorruptReplicasMap standing state
  * (H/.../namenode/CorruptReplicasMap.java wired through
  * FSNamesystem.java:666-701, 2648-2657) and the heartbeat command caps
  * (handleHeartbeat, FSNamesystem.java:1801-1935) — each as a
  * declarative merge over a small standing table, never a scan-the-world
  * loop.
  *
  * The `pending` table is (blockId, inFlight, since): one row per block
  * with replications in flight, the in-flight target count and the
  * schedule (or last re-schedule) timestamp. It is work-list-sized —
  * bounded by budget × timeout/tickInterval, namenode-memory-scale like
  * the reference's HashMap — so every join against big tables broadcasts
  * the pending side.
  */
object Replication {

  private def live(df: DataFrame) = graft.store.StateStore.live(df)

  // ---- N10: PendingReplicationBlocks lifecycle -------------------------

  /** pendingReplications.add for a batch of scheduled work
    * (PendingReplicationBlocks.java:69-79, called from
    * computeReplicationWorkForBlock at FSNamesystem.java:2173): a block
    * new to the table inserts with (numTargets, now); an existing entry
    * increments its in-flight count AND resets its timestamp (the
    * reference's found.incrementReplicas + setTimeStamp). `scheduled`:
    * (blockId, numTargets) — the tick's replication work with
    * numTargets = size(targetDatanodeIds). */
  def pendingAfterSchedule(pending: DataFrame, scheduled: DataFrame,
                           nowMs: Long): DataFrame = {
    val s = scheduled.groupBy(col("blockId"))
      .agg(sum(col("numTargets")).as("__add"))
    pending.join(s, Seq("blockId"), "full_outer")
      .select(col("blockId"),
        (coalesce(col("inFlight"), lit(0L)) + coalesce(col("__add"), lit(0L)))
          .as("inFlight"),
        when(col("__add").isNotNull, lit(nowMs)).otherwise(col("since"))
          .as("since"))
  }

  /** pendingReplications.remove, one per blockReceived
    * (PendingReplicationBlocks.java:86-97, called from blockReceived at
    * FSNamesystem.java:3028): decrement in-flight by the number of
    * receipts for the block, drop the entry when it reaches zero (the
    * reference removes at <= 0). A receipt for an untracked block is a
    * no-op, exactly like the reference's null lookup. `received`: one
    * row per received replica (blockId, ...). */
  def pendingAfterReceipts(pending: DataFrame, received: DataFrame): DataFrame = {
    val r = received.groupBy(col("blockId")).agg(count(lit(1)).as("__done"))
    pending.join(r, Seq("blockId"), "left")
      .select(col("blockId"),
        (col("inFlight") - coalesce(col("__done"), lit(0L))).as("inFlight"),
        col("since"))
      .filter(col("inFlight") > 0L)
  }

  /** pendingReplicationCheck (PendingReplicationBlocks.java:189-207):
    * the entries whose request aged past `timeoutMs` (reference default
    * 5 minutes) — the timedOutItems the monitor hands to
    * processPendingReplications. */
  def pendingTimedOut(pending: DataFrame, nowMs: Long,
                      timeoutMs: Long = 5 * 60 * 1000L): DataFrame =
    pending.filter(lit(nowMs) > col("since") + lit(timeoutMs))

  /** The entries the timeout scan keeps (the reference's iter.remove()
    * complement — one tick = [[pendingTimedOut]] out, survivors stay). */
  def pendingSurvivors(pending: DataFrame, nowMs: Long,
                       timeoutMs: Long = 5 * 60 * 1000L): DataFrame =
    pending.filter(!(lit(nowMs) > col("since") + lit(timeoutMs)))

  /** processPendingReplications (FSNamesystem.java:2324-2334): each
    * timed-out block re-enters neededReplications with its CURRENT
    * replica statistics — without this, a lost replication command is
    * never retried and under-replication leaks at cluster scale. Emits
    * (blockId, fileId, liveReplicaCount, expectedReplication, priority)
    * for timed-out blocks still under-replicated against live NORMAL
    * nodes (the same count and the same priority ladder N6 scores with;
    * UnderReplicatedBlocks.add ignores a block that has recovered, hence
    * the < expected filter). Queue membership, not the budgeted pick —
    * the next N6 tick picks from the re-entered queue.
    *
    * Scale shape: the timed-out set is work-list-sized, so it broadcasts
    * into a left-semi prune of the block table BEFORE any aggregation —
    * per tick this reads only the timed-out blocks' replica rows. */
  def pendingRequeue(timedOut: DataFrame, block: DataFrame, file: DataFrame,
                     datanode: DataFrame, nowMs: Long): DataFrame = {
    val liveNodeIds = StateManager.liveDatanodes(datanode, nowMs)
      .filter(col("adminState") === "NORMAL")
      .select(col("id").as("nodeId"))
    val pruned = live(block)
      .join(broadcast(timedOut.select(col("blockId")).distinct()),
        col("id") === col("blockId"), "left_semi")
    // LEFT join the live-node dimension: a timed-out block whose replicas
    // all sit on dead nodes must still re-enter the queue (liveReplicaCount
    // 0), matching neededReplications.add with num.liveReplicas() == 0 —
    // N6's inner-semi shape would silently drop it
    val counts = pruned
      .join(liveNodeIds, col("datanodeId") === col("nodeId"), "left")
      .groupBy(col("id").as("blockId"), col("fileId"))
      .agg(count(col("nodeId")).as("liveReplicaCount"))
    val expected = live(file).filter(col("length") =!= -1L)
      .select(col("id").as("fid"), col("replication").as("expectedReplication"))
    counts.join(expected, col("fileId") === col("fid")).drop("fid")
      .filter(col("liveReplicaCount") < col("expectedReplication"))
      .withColumn("priority",
        when(col("liveReplicaCount") <= 1, lit(0))
          .when(col("liveReplicaCount") * 3 < col("expectedReplication"), lit(1))
          .otherwise(lit(2)))
  }

  /** The pending discount inside one replication-monitor tick
    * (computeReplicationWorkForBlock, FSNamesystem.java:2120-2128):
    * effective replicas = live + in-flight, so a block with enough work
    * already scheduled schedules nothing more, and the rest carry
    * needed = expected − effective targets. Input `workList` is the N6
    * pick ((blockId, fileId, liveReplicaCount, expectedReplication,
    * priority) rows); output appends (pendingReplicas, effectiveReplicas,
    * needed) and keeps only rows that still need work. `pending` is the
    * standing table — broadcast, work-list-sized. */
  def discountPending(workList: DataFrame, pending: DataFrame): DataFrame =
    workList
      .join(broadcast(pending.select(col("blockId"), col("inFlight"))),
        Seq("blockId"), "left")
      .withColumn("pendingReplicas", coalesce(col("inFlight"), lit(0L)))
      .drop("inFlight")
      .withColumn("effectiveReplicas",
        col("liveReplicaCount") + col("pendingReplicas"))
      .withColumn("needed", col("expectedReplication") - col("effectiveReplicas"))
      .filter(col("needed") > 0L)

  // ---- CorruptReplicasMap (FSNamesystem.java:666-701, 2648-2657) -------

  /** The standing corrupt-replica marks derived from N5 classification
    * output: a stored replica the reconciliation decided to invalidate is
    * exactly what markBlockAsCorrupt records (stale genstamp or short
    * length vs the entry primary, FSNamesystem.java:2648-2657). A
    * reported-only toInvalidate has no stored replica row to mark — the
    * invalidation command alone handles it. */
  def corruptMarks(actions: DataFrame): DataFrame =
    actions
      .filter(col("action") === "toInvalidate" && col("storedGenStamp").isNotNull)
      .select(col("blockId"), col("datanodeId")).distinct()

  /** removeFromCorruptReplicasMap on replica removal
    * (FSNamesystem.java:2988): marks whose (blockId, datanodeId) replica
    * row no longer exists live are dropped from the standing state. */
  def corruptMarksCompact(marks: DataFrame, block: DataFrame): DataFrame =
    marks.join(
      live(block).select(col("id").as("blockId"), col("datanodeId")),
      Seq("blockId", "datanodeId"), "left_semi")

  /** invalidateCorruptReplicas (FSNamesystem.java:2760-2780, gated at
    * :2736 by corruptReplicas > 0 && liveReplicas >= replication): once a
    * block has enough GOOD live replicas, its corrupt marks convert to
    * invalidation work (one row per corrupt replica) and leave the map.
    * Emits (blockId, datanodeId, action='toInvalidate'); the map after
    * the sweep is marks minus these rows. Good = live replica on a live
    * NORMAL node without a mark. */
  def corruptInvalidations(marks: DataFrame, block: DataFrame, file: DataFrame,
                           datanode: DataFrame, nowMs: Long): DataFrame = {
    val liveNodeIds = StateManager.liveDatanodes(datanode, nowMs)
      .filter(col("adminState") === "NORMAL")
      .select(col("id").as("nodeId"))
    // marks are corrupt-set-sized (namenode-memory scale): broadcast into
    // a prune so only marked blocks' replica rows are ever read
    val markedBlocks = marks.select(col("blockId")).distinct()
    val markDim = marks
      .select(col("blockId").as("__mbid"), col("datanodeId").as("__mdid"),
        lit(true).as("__marked"))
    val goodCounts = live(block)
      .join(broadcast(markedBlocks), col("id") === col("blockId"), "left_semi")
      .join(liveNodeIds, col("datanodeId") === col("nodeId"), "left_semi")
      .join(broadcast(markDim),
        col("id") === col("__mbid") && col("datanodeId") === col("__mdid"), "left")
      .filter(col("__marked").isNull)
      .groupBy(col("id").as("__gbid"))
      .agg(count(lit(1)).as("__good"))
    val expected = live(file).filter(col("length") =!= -1L)
      .select(col("id").as("__fid"), col("replication"))
    val owner = live(block)
      .select(col("id").as("__obid"), col("fileId")).distinct()
    marks
      .join(goodCounts, col("blockId") === col("__gbid"), "left")
      .join(owner, col("blockId") === col("__obid"), "left")
      .join(broadcast(expected), col("fileId") === col("__fid"), "left")
      .filter(coalesce(col("__good"), lit(0L)) >= col("replication"))
      .select(col("blockId"), col("datanodeId"),
        lit("toInvalidate").as("action"))
  }

  // ---- N9: heartbeat command caps (handleHeartbeat :1801-1935) ---------

  /** The per-heartbeat command cap, batch form — ONE definition shared
    * with [[graft.streaming.Changefeed.heartbeatCommands]]'s per-batch
    * body (stream/batch parity): the reporting nodes pick up their queued
    * work capped the way the reference caps it (:1841-1846) — at most
    * maxReplicationStreams − xmitsInProgress replication commands and at
    * most blockInvalidateLimit invalidations, in blockId order, so a node
    * with a deep queue drains across beats instead of being handed
    * unbounded work. `work`: (datanodeId, blockId, command ∈
    * replicate|invalidate, ...); `beating`: (datanodeId[, xmitsInProgress])
    * — one row per reporting node. */
  def capCommands(work: DataFrame, beating: DataFrame,
                  maxReplicationStreams: Int = 2,
                  blockInvalidateLimit: Int = 100): DataFrame = {
    val hasXmits = beating.columns.contains("xmitsInProgress")
    val nodes =
      if (hasXmits)
        beating.groupBy(col("datanodeId"))
          .agg(max(col("xmitsInProgress")).as("__xmits"))
      else beating.select(col("datanodeId")).distinct()
    // coalesce: a null xmits value means "none in flight", not a zeroed cap
    val replCap =
      if (hasXmits)
        greatest(lit(0),
          lit(maxReplicationStreams) - coalesce(col("__xmits"), lit(0L)))
      else lit(maxReplicationStreams)
    val w = Window.partitionBy(col("datanodeId"), col("command"))
      .orderBy(col("blockId"))
    val capped = work
      .join(nodes, Seq("datanodeId"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <=
        when(col("command") === "replicate", replCap)
          .otherwise(lit(blockInvalidateLimit)))
      .drop("__rn")
    if (hasXmits) capped.drop("__xmits") else capped
  }
}
