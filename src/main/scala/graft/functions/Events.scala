package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics for product/behavioral pipelines: ordered
  * funnels with conversion windows, cohort retention, and the
  * time-series join family — as-of (backward/forward/nearest),
  * point-in-interval range join and interval-overlap join. Inputs are
  * event frames with ts in epoch NANOSECONDS (the engine's event-time
  * convention — see DerivedState.normalizeEventTs).
  *
  * Every operator here is a bounded-shuffle shape: funnel is one hash
  * aggregate on the user key; retention's aggregates share the
  * user-keyed exchange with a broadcast ratio join; the as-of family
  * is union-tag + ONE key exchange + per-key windows (never a
  * range-predicate join); the range/interval joins are equi-joins on
  * (key, time bucket) with exactly-once pair semantics. No self-joins,
  * no nested loops — at 100 TB each stays a linear scan plus key-local
  * work.
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

  /** As-of join (kdb `aj` / pandas `merge_asof` / DuckDB ASOF JOIN
    * semantics): each probe row is matched with one quote row of the
    * same key by time proximity —
    *  - `backward` (default): the greatest quote ts ≤ probe ts,
    *  - `forward`: the smallest quote ts ≥ probe ts,
    *  - `nearest`: whichever of those two is closer (tie → backward,
    *    so an exact-ts quote always wins) —
    * or no match when none qualifies (or it is farther than
    * `toleranceNs`). `quotes` must be unique per (key, ts): at equal
    * timestamps the pick among duplicate quotes would otherwise be
    * engine-dependent, so dedupe first (the e7 entry keeps MAX(value)
    * per (user, ts)).
    *
    * NOT a join at execution time: both sides are tagged and unioned,
    * shuffled ONCE on the key, and a per-key ordered window carries the
    * last quote forward (`last(_, ignoreNulls)` over unbounded-preceding
    * rows; quotes order before probes at equal ts, giving the closed
    * bound). `forward` is the same walk over the reversed ordering;
    * `nearest` evaluates both windows over the SAME single exchange
    * (only the sort differs) and picks per row. That is the canonical
    * distributed as-of shape: one exchange, per-key sorts, no
    * range-predicate join — which Spark would execute as
    * BroadcastNestedLoop (or a cartesian) and which blows up as
    * probes × quotes at cluster scale. Left-row ties in the window order
    * are harmless (probe rows carry a null quote, so the running "last
    * non-null" is unaffected by their relative order).
    *
    * Output: every probe column, then `matchedTs` + the payload columns
    * (null when unmatched / out of tolerance) — probe columns must not
    * collide with those names. */
  def asofJoin(probes: DataFrame, quotes: DataFrame, key: String,
               ts: String, payload: Seq[String],
               toleranceNs: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    // NULL-key quotes can never match under join semantics (DuckDB's
    // ASOF ON c.k = q.k, kdb aj, merge_asof all agree) — but
    // Window.partitionBy GROUPS nulls, so without this filter a
    // NULL-key probe would silently match a NULL-key quote. Dropping
    // them leaves NULL-key probes in a quote-free partition → unmatched
    // rows, preserving the LEFT semantics.
    val q = quotes.filter(col(key).isNotNull).select(col(key), col(ts),
      struct(col(ts).as("matchedTs") +: payload.map(col): _*).as("__q"),
      lit(0).as("__side"))
    val p = probes.select(col(key), col(ts),
      struct(probes.columns.map(col).toSeq: _*).as("__l"),
      lit(1).as("__side"))
    val u = q.withColumn("__l", lit(null).cast(p.schema("__l").dataType))
      .unionByName(p.withColumn("__q", lit(null).cast(q.schema("__q").dataType)))
    def carriedOver(reversed: Boolean) = {
      val o = if (reversed) col(ts).desc else col(ts).asc
      last(col("__q"), ignoreNulls = true).over(
        Window.partitionBy(col(key)).orderBy(o, col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    // distance of a candidate match, ∞ when absent/out-of-tolerance —
    // backward distance = ts − mts, forward = mts − ts (both ≥ 0)
    def dist(m: org.apache.spark.sql.Column, forward: Boolean) = {
      val d = if (forward) m("matchedTs") - col(ts) else col(ts) - m("matchedTs")
      val tolOk = toleranceNs.map(t => d <= t).getOrElse(lit(true))
      when(m.isNotNull && tolOk, d)
    }
    val carried = direction match {
      case "backward" => u.withColumn("__mb", carriedOver(reversed = false))
        .filter(col("__side") === 1)
        .withColumn("__m", when(dist(col("__mb"), forward = false).isNotNull, col("__mb")))
      case "forward" => u.withColumn("__mf", carriedOver(reversed = true))
        .filter(col("__side") === 1)
        .withColumn("__m", when(dist(col("__mf"), forward = true).isNotNull, col("__mf")))
      case "nearest" => u
        .withColumn("__mb", carriedOver(reversed = false))
        .withColumn("__mf", carriedOver(reversed = true))
        .filter(col("__side") === 1)
        .withColumn("__db", dist(col("__mb"), forward = false))
        .withColumn("__df", dist(col("__mf"), forward = true))
        .withColumn("__m",
          when(col("__db").isNotNull &&
               (col("__df").isNull || col("__db") <= col("__df")), col("__mb"))
          .otherwise(when(col("__df").isNotNull, col("__mf"))))
    }
    carried.select(probes.columns.toSeq.map(c => col("__l")(c).as(c)) ++
      ("matchedTs" +: payload).map(c => col("__m")(c).as(c)): _*)
  }

  /** The per-interval bucket cap [[bucketized]] enforces: one corrupt
    * or open-ended-sentinel end value (e.g. Long.MaxValue) must fail
    * loudly on ITS row, not OOM an executor mid-explode. 2^20 buckets
    * ≈ a year of 30 s buckets — far beyond any sane bucketNs choice
    * (fan-out is meant to be O(1)); genuinely longer intervals call for
    * a coarser bucketNs. */
  val MaxBucketsPerInterval: Long = 1L << 20

  /** Shared bucketizer for the range/interval join family (the batch
    * operators AND [[graft.streaming.Changefeed.streamingRangeJoin]]'s
    * pinned standing frame build on this one definition — exactly-once
    * pairing and stream/batch parity depend on the point-side keying
    * and interval-side explode using the SAME bucket function): keeps
    * non-empty intervals and explodes each to the `bucketNs`-wide
    * buckets it covers, guarded by [[MaxBucketsPerInterval]] via a
    * row-level raise_error — the bad row is named, the job dies
    * cleanly. */
  private[graft] def bucketized(intervals: DataFrame, start: String,
                                end: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    val b0 = expr(s"`$start` div ${bucketNs}L")
    val b1 = expr(s"(`$end` - 1) div ${bucketNs}L")
    // span check in DECIMAL(38,0): b1 - b0 in Long can wrap negative for
    // extreme bounds (start near Long.MinValue, end positive), bypassing
    // this named-row diagnostic in favor of Spark's generic
    // sequence-length error
    val span = b1.cast(org.apache.spark.sql.types.DecimalType(38, 0)) -
      b0.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    intervals.filter(col(end) > col(start))
      .withColumn("__b", explode(
        when(span < MaxBucketsPerInterval, sequence(b0, b1))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval ["), col(start), lit(", "), col(end),
            lit(s") spans more than $MaxBucketsPerInterval buckets of " +
              s"$bucketNs ns — corrupt bound or bucketNs far too small"))))))
  }

  /** Point-in-interval (range) join: every (point, interval) pair of the
    * same key with start ≤ ts < end (half-open; empty/negative intervals
    * drop out). Executed as an EQUI-join on (key, time bucket): each
    * interval explodes to the `bucketNs`-wide buckets it covers
    * (⌈len/bucketNs⌉+1 copies, capped loudly at
    * [[MaxBucketsPerInterval]]), each point lands in exactly one
    * bucket — so a qualifying pair meets exactly once and needs no
    * dedup pass, and the exact range predicate runs only on
    * bucket-local candidates. Pick bucketNs near the typical interval
    * length: fan-out stays O(1) per interval while candidates stay
    * bucket-local. A raw range-predicate join would plan as
    * BroadcastNestedLoop — every point scanned per interval — which no
    * cluster survives at 100 TB.
    *
    * Column names (other than `key`) must not collide across the two
    * inputs; rename before calling. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                ts: String, start: String, end: String,
                bucketNs: Long): DataFrame =
    probeJoin(points, bucketized(intervals, start, end, bucketNs),
      key, ts, start, end, bucketNs)

  /** The probe side of the bucketized range join — point bucket keying,
    * the (key, bucket) equi-join against an ALREADY-bucketized interval
    * frame, and the exact half-open predicate. One definition shared by
    * [[rangeJoin]] and the streaming twin's per-batch body: stream/batch
    * parity depends on this keying and predicate being byte-identical. */
  private[graft] def probeJoin(points: DataFrame, bucketedIntervals: DataFrame,
                               key: String, ts: String, start: String,
                               end: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    points.withColumn("__b", expr(s"`$ts` div ${bucketNs}L"))
      .join(bucketedIntervals, Seq(key, "__b"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__b")
  }

  /** Interval-overlap join: every (left, right) interval pair of the
    * same key that OVERLAPS — `ls < re && rs < le` (half-open;
    * empty intervals drop out). Both sides explode to the `bucketNs`
    * buckets they cover, equi-join on (key, bucket) — and since two
    * overlapping intervals co-occupy every bucket of their overlap, the
    * pair is kept only in the FIRST bucket both occupy
    * (max(⌊ls/B⌋, ⌊rs/B⌋)), which makes each pair meet exactly once
    * with no distinct/dedup shuffle. Same scale story as [[rangeJoin]]:
    * fan-out ⌈len/B⌉+1 per interval, candidates bucket-local, no
    * nested-loop join. Column names other than `key` must not collide
    * across the inputs. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   ls: String, le: String, rs: String, re: String,
                   bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    bucketized(left, ls, le, bucketNs)
      .join(bucketized(right, rs, re, bucketNs), Seq(key, "__b"))
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("__b") === greatest(
        expr(s"`$ls` div ${bucketNs}L"), expr(s"`$rs` div ${bucketNs}L")))
      .drop("__b")
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
