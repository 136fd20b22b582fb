package graft

import org.apache.spark.sql.functions._

import graft.functions.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000000L // 1 h in ns

  test("funnel walks ordered steps within the conversion window") {
    val ev = Seq(
      // user 1: full chain, each hop within 24 h
      (1L, "signup", 100L * H), (1L, "view", 101L * H),
      (1L, "click", 102L * H), (1L, "purchase", 103L * H),
      // user 2: only a view BEFORE signup → chain breaks at stage 1
      (2L, "view", 90L * H), (2L, "signup", 100L * H),
      // user 3: click lands outside t2's 24 h window → stage 2
      (3L, "signup", 0L), (3L, "view", 1L * H),
      (3L, "click", 26L * H), (3L, "purchase", 27L * H),
      // user 4: never signs up → stage 0
      (4L, "view", 5L * H),
    ).toDF("user_id", "event_type", "ts")
    val out = rows(Events.funnel(ev,
        Seq("signup", "view", "click", "purchase"), windowNs = 24L * H)
      .select(col("user_id"), col("stage")).orderBy(col("user_id")))
    assert(out == Seq(Seq(1L, 4L), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 0L)))
  }

  test("funnel picks the FIRST qualifying event per step") {
    val ev = Seq(
      (1L, "signup", 10L * H), (1L, "view", 12L * H), (1L, "view", 11L * H),
    ).toDF("user_id", "event_type", "ts")
    val out = rows(Events.funnel(ev, Seq("signup", "view"),
      windowNs = 24L * H).select(col("t1"), col("t2")))
    assert(out == Seq(Seq(10L * H, 11L * H)))
  }

  test("retention: cohort from first activity, per-offset distinct users") {
    val D = Events.DayNs
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 1L * D + 5L), (1L, "view", 1L * D + 7L),
      (2L, "view", 2L), (2L, "view", 2L * D),
      (3L, "view", 1L * D),
    ).toDF("user_id", "event_type", "ts")
    val out = rows(Events.retention(ev)
      .select(col("cohortDay"), col("dayOffset"), col("activeUsers"),
        col("cohortSize"), col("retention"))
      .orderBy(col("cohortDay"), col("dayOffset")))
    assert(out == Seq(
      Seq(0L, 0L, 2L, 2L, 1.0),
      Seq(0L, 1L, 1L, 2L, 0.5),
      Seq(0L, 2L, 1L, 2L, 0.5),
      Seq(1L, 0L, 1L, 1L, 1.0)))
  }
}
