package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics for product/behavioral pipelines: ordered
  * funnels with conversion windows and cohort retention. Inputs are
  * (user_id, event_type, ts) frames with ts in epoch NANOSECONDS (the
  * engine's event-time convention — see DerivedState.normalizeEventTs).
  *
  * Both operators are single-shuffle shapes: funnel is one hash
  * aggregate on the user key; retention's three aggregates share the
  * user-keyed exchange and its ratio join broadcasts the cohort-sized
  * dimension. No self-joins, no per-step passes — at 100 TB each stays
  * a linear scan plus user-keyed shuffles.
  */
object Events {

  /** Nanoseconds per day (ts convention is epoch nanos). */
  val DayNs: Long = 86400000000000L

  /** Ordered k-step funnel with a conversion window: step i's timestamp
    * is the FIRST event of `steps(i)` strictly after step i−1 and within
    * `windowNs` of it (standard funnel attribution; step 0 is the user's
    * first event of `steps(0)`). One row per user: t1..tk (null once the
    * chain breaks) and `stage` = number of steps completed.
    *
    * Single groupBy(user) with per-step conditional sorted collects,
    * then pure array expressions walk the chain — per-user array sizes
    * are bounded by that user's per-type event count (the usual
    * funnel-operator contract). get() (0-based, null out-of-bounds)
    * rather than element_at: ANSI mode throws on the empty-array probe
    * a missing step produces. */
  def funnel(events: DataFrame, steps: Seq[String],
             windowNs: Long = DayNs): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(when(col("event_type") === st, col("ts"))))
        .as(s"a$i")
    }
    var df = events.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      .withColumn("t1", get(col("a0"), lit(0)))
    for (i <- 1 until steps.size) {
      val prev = col(s"t$i")
      df = df.withColumn(s"t${i + 1}",
        get(filter(col(s"a$i"),
          x => x > prev && x <= prev + lit(windowNs)), lit(0)))
    }
    val stage = (steps.size to 2 by -1)
      .foldLeft(when(col(s"t${steps.size}").isNotNull, steps.size.toLong)) {
        (acc, k) => acc.when(col(s"t${k - 1}").isNotNull, (k - 1).toLong)
      }.otherwise(0L)
    df.select(col("user_id") +:
      (1 to steps.size).map(i => col(s"t$i")) :+ stage.as("stage"): _*)
  }

  /** Cohort day-N retention: cohort = day of a user's first activity;
    * one row per (cohortDay, dayOffset) with the distinct active users,
    * the cohort size and the retention ratio. */
  def retention(events: DataFrame): DataFrame = {
    // integer `div`, not `/`: Column./ is double division and epoch
    // nanos (~1.7e18) exceed the 2^53 exact-double range
    val days = events
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohortDay"))
    val cohortSize = cohort.groupBy(col("cohortDay"))
      .agg(count(lit(1)).as("cohortSize"))
    days.join(cohort, Seq("user_id"))
      .withColumn("dayOffset", col("day") - col("cohortDay"))
      .groupBy(col("cohortDay"), col("dayOffset"))
      .agg(count(lit(1)).as("activeUsers"))
      .join(broadcast(cohortSize), Seq("cohortDay"))
      .withColumn("retention",
        col("activeUsers").cast("double") / col("cohortSize"))
  }
}
