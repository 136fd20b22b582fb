package graft.analytics

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N7 replica placement (ReplicationTargetChooser.java:77-178) — the one
  * genuinely sequential, topology-aware algorithm in the reference. Kept
  * as driver-side Scala over a broadcast topology snapshot (SURVEY §4):
  * forcing the pipeline case-ladder into SQL would serialize through a
  * single partition anyway.
  *
  * Case ladder (:138-178): 1st replica on the writer's node/rack, 2nd on a
  * remote rack, 3rd on the same rack as the 2nd, rest random —
  * subject to isGoodTarget (space, load, per-rack quota).
  */
object Placement {

  final case class Node(id: Long, rack: String, remaining: Long,
                        xceiverCount: Long, adminState: String)

  /** isGoodTarget (ReplicationTargetChooser.java): enough space, not
    * overloaded vs cluster average, rack not over quota, not
    * decommissioning. */
  private def isGood(n: Node, blockSize: Long, avgLoad: Double,
                     chosen: Seq[Node], maxPerRack: Int): Boolean =
    n.adminState == "NORMAL" &&
      n.remaining >= blockSize * 2 &&
      n.xceiverCount <= 2.0 * avgLoad + 2 &&
      chosen.count(_.rack == n.rack) < maxPerRack &&
      !chosen.exists(_.id == n.id)

  /** Choose `replication` NEW targets. Deterministic given `seed` (the
    * caller passes e.g. the block id) so tests and replays are stable.
    *
    * `existing` = nodes already holding a replica (the reference seeds
    * chooseTarget with them, ReplicationTargetChooser.java:84-103): they
    * are never chosen again, they count toward the per-rack quota, and
    * they shift the case ladder the same way the reference's
    * numOfResults switch does (a block with one live replica places its
    * next one on a REMOTE rack, etc.). Only the new targets return. */
  def chooseTargets(nodes: Seq[Node], replication: Int, writerRack: Option[String],
                    blockSize: Long, seed: Long,
                    existing: Seq[Node] = Nil): Seq[Node] = {
    if (nodes.isEmpty || replication <= 0) return Nil
    val rnd = new Random(seed)
    val racks = nodes.map(_.rack).distinct.size.max(1)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Node]
    chosen ++= existing
    val want = chosen.size + replication
    val maxPerRack = (want - 1) / racks + 2
    val avgLoad = nodes.map(_.xceiverCount).sum.toDouble / nodes.size

    def pick(candidates: Seq[Node]): Option[Node] = {
      val good = candidates.filter(isGood(_, blockSize, avgLoad, chosen.toSeq, maxPerRack))
      if (good.isEmpty) None
      else Some(good(rnd.nextInt(good.size)))
    }

    // 1st overall: writer-local rack if possible, else anywhere
    if (chosen.isEmpty) {
      writerRack.flatMap(r => pick(nodes.filter(_.rack == r))).orElse(pick(nodes))
        .foreach(chosen += _)
    }
    // 2nd overall: remote rack from the 1st
    if (chosen.size == 1 && chosen.size < want) {
      val f = chosen.head
      pick(nodes.filter(_.rack != f.rack)).orElse(pick(nodes)).foreach(chosen += _)
    }
    // 3rd overall: same rack as the 2nd — unless the first two already
    // share a rack, in which case a REMOTE rack (ReplicationTargetChooser
    // case 2: two same-rack replicas must not become three)
    if (chosen.size == 2 && chosen.size < want) {
      val (a, b) = (chosen(0), chosen(1))
      val cand =
        if (a.rack == b.rack) nodes.filter(_.rack != b.rack)
        else nodes.filter(_.rack == b.rack)
      pick(cand).orElse(pick(nodes)).foreach(chosen += _)
    }
    // rest: random fill — the guard and the placement consume the SAME
    // draw, so each filled slot advances the RNG exactly once (replay
    // traces match a single-draw reference walk)
    var fill = if (chosen.size < want) pick(nodes) else None
    while (fill.isDefined) {
      fill.foreach(chosen += _)
      fill = if (chosen.size < want) pick(nodes) else None
    }
    chosen.drop(existing.size).toSeq
  }

  /** The candidates-SCORING variant of chooseTarget (SURVEY §2.4 N7):
    * the same case ladder and isGoodTarget checks as [[chooseTargets]],
    * but the random draw is replaced by a deterministic per-(request,
    * node, slot) arithmetic score, so the whole placement is ONE
    * declarative dataflow a differential oracle can replay — and the
    * shape that places a million blocks per tick on a real cluster,
    * where the driver-side walk would serialize.
    *
    * Per request (reqId, writerRack, blockSize), over live NORMAL nodes
    * (ReplicationTargetChooser.isGoodTarget :260-319): space
    * `remaining >= 2*blockSize`, load `xceiver <= 2*avg + 2` (compared
    * cross-multiplied so both engines stay in exact integer arithmetic),
    * per-rack quota `(want-1)/racks + 2` (:175-178 — with want=3 it can
    * only bind on the third slot, so slots 1-2 skip the count). The
    * ladder (:138-178) becomes slot-wise ORDER BY preference: slot 1
    * prefers the writer's rack, slot 2 a rack other than the first's,
    * slot 3 the second's rack — unless the first two share one, then a
    * remote rack — each falling back to any good candidate, tie-broken
    * by score then node id. Empty candidate sets simply emit fewer (or
    * no) slots, the reference's "cannot place" outcome.
    *
    * Scale: the node/stats dims broadcast into the request frame, so
    * candidate generation is a narrow map over the requests; every
    * window and slot self-join keys on reqId — no cross-request key
    * ever shuffles. The candidate frame is request-corpus-sized and so
    * deliberately NOT checkpointed (the one-copy convention): each slot
    * re-derives it from the broadcast join, and the slot joins run as
    * reqId-keyed sort-merge — ~four narrow scans plus reqId exchanges,
    * never anything quadratic. */
  def chooseTargetsScored(requests: DataFrame, datanode: DataFrame,
                          nowMs: Long): DataFrame = {
    val nodes = graft.state.StateManager.liveDatanodes(datanode, nowMs)
      .filter(col("adminState") === "NORMAL")
      .select(col("id").as("__nid"), col("location").as("__nrack"),
        col("remaining").as("__nrem"), col("xceiverCount").as("__nx"))
    val stats = nodes.agg(sum(col("__nx")).as("__sumL"),
      count(lit(1)).as("__nL"), countDistinct(col("__nrack")).as("__racks"))
    def score(slot: Int) =
      ((col("reqId") % 97) * 31 + col("__nid") * 17 + lit(slot * 7)) % 89
    val cand = requests
      .crossJoin(broadcast(nodes))
      .crossJoin(broadcast(stats))
      .filter(col("__nrem") >= col("blockSize") * 2 &&
        col("__nx") * col("__nL") <= col("__sumL") * 2 + col("__nL") * 2)
      .withColumn("__maxPerRack",
        lit(2L) + floor(lit(2.0) / col("__racks")).cast("long"))
    val w1 = Window.partitionBy(col("reqId")).orderBy(
      (col("__nrack") === col("writerRack")).desc, score(1), col("__nid"))
    val c1 = cand.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") === 1)
      .select(col("reqId"), col("__nid").as("__dn1"), col("__nrack").as("__rack1"))
    val w2 = Window.partitionBy(col("reqId")).orderBy(
      (col("__nrack") =!= col("__rack1")).desc, score(2), col("__nid"))
    val c2 = cand.join(c1, Seq("reqId"))
      .filter(col("__nid") =!= col("__dn1"))
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") === 1)
      .select(col("reqId"), col("__nid").as("__dn2"), col("__nrack").as("__rack2"))
    val pref3 = when(col("__rack1") === col("__rack2"),
      col("__nrack") =!= col("__rack2")).otherwise(col("__nrack") === col("__rack2"))
    val w3 = Window.partitionBy(col("reqId")).orderBy(
      pref3.desc, score(3), col("__nid"))
    val c3 = cand.join(c1, Seq("reqId")).join(c2, Seq("reqId"))
      .filter(col("__nid") =!= col("__dn1") && col("__nid") =!= col("__dn2") &&
        when(col("__nrack") === col("__rack1"), 1L).otherwise(0L) +
          when(col("__nrack") === col("__rack2"), 1L).otherwise(0L) <
          col("__maxPerRack"))
      .withColumn("__rn", row_number().over(w3))
      .filter(col("__rn") === 1)
      .select(col("reqId"), col("__nid").as("__dn3"), col("__nrack").as("__rack3"))
    c1.select(col("reqId"), lit(1L).as("slot"),
        col("__dn1").as("datanodeId"), col("__rack1").as("rack"))
      .unionByName(c2.select(col("reqId"), lit(2L).as("slot"),
        col("__dn2").as("datanodeId"), col("__rack2").as("rack")))
      .unionByName(c3.select(col("reqId"), lit(3L).as("slot"),
        col("__dn3").as("datanodeId"), col("__rack3").as("rack")))
  }
}
