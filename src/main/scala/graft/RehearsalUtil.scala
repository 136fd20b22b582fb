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

  /** The heap rule as a pure predicate (r18's "what's wrong": a rule
    * that lives only in BASELINE.md prose gets broken — and WAS, the
    * first r18 10× pass reading q8/q9 at 8-10× band on byte-identical
    * plans under a 64g heap). Two documented traps:
    *   - small scales (≤20×) on an OVERSIZED heap (>24g): accumulated
    *     broadcasts + full-GC mid-family — the 10× family and Streams
    *     run on the default heap;
    *   - XL scales (>50×) on a HUGE heap (>80g): 96g starves the OS
    *     page cache, 2-6× slower full-table scans (r16) — XL runs 64g,
    *     never 96g.
    * Returns the violation message, or None. */
  def heapRuleViolation(scale: Double, maxHeapBytes: Long): Option[String] = {
    val g = maxHeapBytes / (1L << 30)
    if (scale <= 20 && maxHeapBytes > 24L * (1L << 30))
      Some(f"heap ${g}g > 24g at ${scale}%.0fx — the oversized-heap GC " +
        "trap (BASELINE.md r18: q8/q9 read 8-10x their band on identical " +
        "plans under 64g at 10x). Run 10x/Streams on the default heap; " +
        "64g is for 100x/XL.")
    else if (scale > 50 && maxHeapBytes > 80L * (1L << 30))
      Some(f"heap ${g}g > 80g at ${scale}%.0fx — starves the OS page " +
        "cache (BASELINE.md r16: XL runs 64g, never 96g; 2-6x slower " +
        "full-table scans).")
    else None
  }

  /** Enforce [[heapRuleViolation]] for a rehearsal main: throw (the
    * recorded lines would be garbage) unless SPARK_GRAFT_ALLOW_BIG_HEAP=1
    * downgrades it to a loud warning. */
  def enforceHeapRule(scale: Double): Unit =
    heapRuleViolation(scale, Runtime.getRuntime.maxMemory()).foreach { msg =>
      if (sys.env.get("SPARK_GRAFT_ALLOW_BIG_HEAP").contains("1"))
        System.err.println(s"[graft] WARN (SPARK_GRAFT_ALLOW_BIG_HEAP=1): $msg")
      else throw new IllegalStateException(
        s"[graft] $msg  Set SPARK_GRAFT_ALLOW_BIG_HEAP=1 to override.")
    }

  /** Machine-checked rehearsal bands (r19; the judge's "bands are
    * narrative" item): `tools/rehearsal_bands.json` maps
    * family → line → [lo, hi] (MIN-of-reps seconds, or the line's
    * metric unit for quality lines like recall). Every rehearsal main
    * calls this over its recorded lines; an out-of-band line prints a
    * loud BAND-BREAK marker so window-vs-regression adjudication is
    * mechanical instead of prose against BASELINE.md. A line (or
    * family) absent from the file is unchecked — new lines get bands
    * once they have two recorded rounds. Bands are deliberately WIDE
    * (the documented 2-10× IO-window scatter on identical plans must
    * not trip them); a break means "investigate with plan audits",
    * not "regression proven". */
  def checkBands(family: String, lines: Seq[(String, Double)]): Unit = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BANDS", "tools/rehearsal_bands.json")
    val f = new java.io.File(path)
    if (!f.exists()) {
      println(s"[band] no band file at $path — $family unchecked"); return
    }
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    val fam = root.get(family)
    if (fam == null) {
      println(s"[band] no bands for family '$family' — unchecked"); return
    }
    var breaks = 0; var checked = 0
    lines.foreach { case (name, v) =>
      val b = fam.get(name)
      if (b != null && b.size() == 2) {
        checked += 1
        val (lo, hi) = (b.get(0).asDouble(), b.get(1).asDouble())
        if (v < lo || v > hi) {
          breaks += 1
          println(f"[band] *** BAND-BREAK $family/$name: $v%.3f outside [$lo%.3f, $hi%.3f] ***")
        } else println(f"[band] $family/$name $v%.3f in [$lo%.3f, $hi%.3f]")
      }
    }
    println(s"[band] $family: $checked/${lines.size} lines checked, $breaks breaks")
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
    * Shuffle/broadcast/reused exchanges are counted LINE-ANCHORED — the
    * node name is the first identifier after the tree-art prefix
    * (`: +- *(3) ` etc, all non-letters) — because raw substring
    * subtraction double-cancels: a ReusedExchange's one-line rendering
    * embeds its reused child's own "Exchange <partitioning>" text as a
    * node ARG (TreeNode prints non-child args inline), so
    * `cnt("Exchange ") - cnt("ReusedExchange ")` still netted +1 per
    * reused shuffle (ADVICE r18). Anchoring at line start counts only
    * NODES: the embedded arg text sits mid-line behind letters the
    * `[^A-Za-z]*` prefix cannot cross, and "BroadcastExchange"/
    * "ReusedExchange" can never match the "Exchange" pattern because
    * their leading letters block the anchor the same way. (Covers
    * RoundRobin and any future distribution by construction — the
    * count keys on the node name, not the partitioning spelling.) */
  def auditPlan(tag: String, name: String, plan: String, label: String): Unit = {
    def cnt(s: String) = s.r.findAllIn(plan).length
    def nodeCnt(node: String) =
      ("(?m)^[^A-Za-z]*" + node + " ").r.findAllIn(plan).length
    val shuffles = nodeCnt("Exchange")
    println(s"[$tag] PLAN $name: " +
      s"broadcastHashJoin=${cnt("BroadcastHashJoin")} " +
      s"sortMergeJoin=${cnt("SortMergeJoin")} " +
      s"shuffledHashJoin=${cnt("ShuffledHashJoin")} " +
      s"shuffleExchanges=$shuffles " +
      s"broadcastExchanges=${nodeCnt("BroadcastExchange")} " +
      s"reusedExchanges=${nodeCnt("ReusedExchange")} " +
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
