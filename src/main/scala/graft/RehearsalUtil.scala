package graft

import org.apache.spark.sql.SparkSession

/** Shared rehearsal instrumentation — the n5 adjudication protocol made
  * the default (r16 follow-up): back-to-back idle-box IO windows differ
  * 2-10× on IDENTICAL plans (BASELINE.md round-16 notes), so a recorded
  * rehearsal number is only evidence as the MIN of repeated runs with
  * the OS load sampled around them. Every rehearsal main times through
  * [[timeReps]]; rep count comes from `SPARK_GRAFT_REHEARSAL_REPS`
  * (each main picks its own default — the 100× q-family pass and the
  * XL headliners default to multi-rep, the cheap 10× sweeps to 1).
  *
  * Also hosts the two helpers every streaming/plan rehearsal needs and
  * previously duplicated: FileStreamSource slice stamping and the
  * executed-plan audit line.
  */
object RehearsalUtil {

  /** OS 1-minute load average (−1 when unreadable). Advisory: it
    * includes this JVM's own local[N] execution, so only a reading well
    * above the core count says "the box was busy with something else". */
  def loadAvg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Rep count for a rehearsal main: env override, else the main's
    * default. Clamped to ≥1. */
  def reps(default: Int): Int =
    sys.env.get("SPARK_GRAFT_REHEARSAL_REPS").map(_.toInt).getOrElse(default).max(1)

  /** MIN-of-reps timing: runs `f` `reps` times (SQL cache cleared before
    * each), prints every rep plus a min/median/max spread line with the
    * load average sampled before and after, and returns the MIN — the
    * one number exogenous box load can only inflate, never deflate. A
    * single-rep call prints exactly the old one-line format. */
  def timeReps(spark: SparkSession, tag: String, name: String, reps: Int)
              (f: => Long): Double = {
    val lb = loadAvg1m()
    val ts = (1 to reps).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      val repTag = if (reps > 1) f" rep $i/$reps" else ""
      println(f"[$tag] $name%-36s$repTag $s%8.2f s  (rows=$n)")
      s
    }
    if (reps > 1) {
      val sorted = ts.sorted
      val la = loadAvg1m()
      println(f"[$tag] $name%-36s MIN ${sorted.head}%.2f  " +
        f"median ${sorted(ts.size / 2)}%.2f  max ${sorted.last}%.2f s  " +
        f"load $lb%.1f->$la%.1f")
    }
    ts.min
  }

  /** FileStreamSource orders files by MODIFICATION TIME, not path — two
    * slices written inside the same mtime granularity could replay out
    * of order, silently breaking the time-ordered-triggers contract the
    * asof/sessionize/session_window twins assume (their parity checks
    * would flip on a reordered run, not on a code change). Stamp
    * strictly increasing, slice-indexed mtimes on every data file after
    * writing; kept within the last hour so the source's default
    * maxFileAge never drops one. Null-guarded: a missing feed dir (or a
    * race-deleted slice) is a no-op here and surfaces downstream as the
    * stream reading nothing, not as an NPE inside the stamping. */
  def stampSliceOrder(feedDir: String): Unit = {
    val slices = Option(new java.io.File(feedDir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).sortBy(_.getName)
    val base = System.currentTimeMillis() - 3600000L
    slices.zipWithIndex.foreach { case (d, i) =>
      val t = java.nio.file.attribute.FileTime.fromMillis(base + i * 60000L)
      Option(d.listFiles()).toSeq.flatten.foreach(f =>
        java.nio.file.Files.setLastModifiedTime(f.toPath, t))
    }
  }

  /** Executed-plan audit line: join strategies chosen, SHUFFLE exchange
    * count, reuse, cartesians. Enforces the zero-cartesian policy.
    *
    * Shuffles = every "Exchange " occurrence minus broadcast and reused
    * nodes (ADVICE r17: enumerating partitioning spellings silently
    * dropped RoundRobinPartitioning — `repartition(n)` — and any future
    * distribution, so the line could under-count while reading as
    * complete; "BroadcastExchange "/"ReusedExchange " both contain the
    * "Exchange " substring, hence the subtraction). */
  def auditPlan(tag: String, name: String, plan: String, label: String): Unit = {
    def cnt(s: String) = s.r.findAllIn(plan).length
    val shuffles = cnt("Exchange ") - cnt("BroadcastExchange ") -
      cnt("ReusedExchange ")
    println(s"[$tag] PLAN $name: " +
      s"broadcastHashJoin=${cnt("BroadcastHashJoin")} " +
      s"sortMergeJoin=${cnt("SortMergeJoin")} " +
      s"shuffledHashJoin=${cnt("ShuffledHashJoin")} " +
      s"shuffleExchanges=$shuffles " +
      s"broadcastExchanges=${cnt("BroadcastExchange")} " +
      s"reusedExchanges=${cnt("ReusedExchange")} " +
      s"cartesian=${cnt("CartesianProduct")}")
    require(!plan.contains("CartesianProduct"),
      s"$name planned a CartesianProduct at $label")
    // SPARK_GRAFT_PLAN_DUMP=1: print the full executed plan under the
    // audit line — for adjudicating WHICH join got which strategy when
    // the counts alone can't say (e.g. a threshold-boundary broadcast)
    if (sys.env.get("SPARK_GRAFT_PLAN_DUMP").contains("1"))
      println(s"[$tag] PLAN-DUMP $name:\n$plan")
  }
}
