package graft

import org.apache.spark.sql.functions._

import graft.analytics.Placement
import graft.store.{Comparator, IndexDef, StateStore}

/** Algebraic laws of the find() comparator surface on a seeded random
  * table, plus placement edge cases — the reference's semantics that are
  * easy to break silently during refactors. */
class AlgebraLawsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private lazy val tbl = (1 to 400)
    .map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong, i.toLong))
    .toDF("id", "grp", "value", "version")
  private val ById = IndexDef("PRIMARY", Seq("id"))
  private val ByGrp = IndexDef("GRP", Seq("grp"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("comparator partition laws: LE = LT ∪ EQ; GE/LT partition the table") {
    for (k <- Seq(1L, 57L, 200L, 400L, 999L)) {
      val lt = ids(StateStore.find(tbl, ById, Seq(k), Comparator.LT))
      val eq = ids(StateStore.find(tbl, ById, Seq(k), Comparator.EQ))
      val le = ids(StateStore.find(tbl, ById, Seq(k), Comparator.LE))
      val ge = ids(StateStore.find(tbl, ById, Seq(k), Comparator.GE))
      assert(le == (lt ++ eq))
      assert((lt ++ ge) == ids(tbl) && (lt & ge).isEmpty)
    }
  }

  test("IN equals the union of EQs on a non-unique index") {
    val keys = Seq(3L, 17L, 99L)
    val inSet = ids(StateStore.find(tbl, ByGrp, keys, Comparator.IN))
    val eqUnion = keys.map(k => ids(StateStore.find(tbl, ByGrp, Seq(k), Comparator.EQ)))
      .reduce(_ ++ _)
    assert(inSet == eqUnion)
  }

  test("limit/offset paginate without overlap or loss") {
    val pages = (0 until 5).map(p =>
      StateStore.find(tbl, ById, Seq(0L), Comparator.GT, limit = 100, offset = p * 100))
    val collected = pages.map(ids)
    assert(collected.map(_.size).sum == 400)
    assert(collected.reduce(_ ++ _) == ids(tbl))
    for (Seq(a, b) <- collected.sliding(2)) assert((a & b).isEmpty)
  }

  test("DEQ returns the same rows as EQ, descending") {
    val eq = StateStore.find(tbl, ByGrp, Seq(5L), Comparator.EQ)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val deq = StateStore.find(tbl, ByGrp, Seq(5L), Comparator.DEQ)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(eq.toSet == deq.toSet)
  }

  test("placement: degenerate topologies") {
    // all decommissioned → nothing placeable
    val dead = (1 to 4).map(i =>
      Placement.Node(i.toLong, "/r0", 1L << 30, 0, "DECOMMISSIONED"))
    assert(Placement.chooseTargets(dead, 3, None, 1024, seed = 1L).isEmpty)
    // single rack: all replicas land there, still distinct nodes
    val oneRack = (1 to 5).map(i => Placement.Node(i.toLong, "/r0", 1L << 30, 0, "NORMAL"))
    val t = Placement.chooseTargets(oneRack, 3, Some("/r0"), 1024, seed = 2L)
    assert(t.size == 3 && t.map(_.id).distinct.size == 3)
    // replication larger than cluster → capped at cluster size
    val tiny = oneRack.take(2)
    assert(Placement.chooseTargets(tiny, 5, None, 1024, seed = 3L).size == 2)
  }
}
