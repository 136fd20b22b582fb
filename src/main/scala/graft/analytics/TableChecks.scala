package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level data-quality checks for lake pipelines (the Deequ-style
  * constraint surface): column profiles, key uniqueness and referential
  * integrity — each a single aggregation or one semi/anti join, so every
  * check is one scan (profiles share ONE pass across all requested
  * columns) and nothing collects more than the check-dimension row set.
  * At 100 TB these are the nightly gates that catch a bad upstream
  * delivery before training reads it.
  */
object TableChecks {

  /** One row per profiled column: row count, nulls, distinct count and
    * min/max (as strings — type-agnostic, engine-portable ordering is
    * the caller's concern for non-numeric types). ALL columns profile in
    * ONE pass: a single aggregate computes every metric, then a stack
    * expression melts the row — no per-column scans. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        // coalesced: SUM over an EMPTY table is NULL, and an empty
        // delivery is exactly what these checks exist to catch — the
        // profile must say 0 nulls, not null nulls
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // melt via explode-of-structs with UNIFORM field names (stack()
    // types each tuple by its source column names and refuses the mix)
    val structs = cols.map(c => struct(
      lit(c).as("colName"), col(s"__n_$c").as("nRows"),
      col(s"__null_$c").as("nNulls"), col(s"__dist_$c").as("nDistinct"),
      col(s"__min_$c").as("minVal"), col(s"__max_$c").as("maxVal")))
    one.select(explode(array(structs: _*)).as("m")).select(col("m.*"))
  }

  /** Duplicate-key report: every key value violating a uniqueness
    * constraint, with its multiplicity — empty means the constraint
    * holds. One hash aggregate on the key. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1)

  /** Referential-integrity orphans: child rows whose key has no parent
    * (a LEFT ANTI join — the parent side hashes/broadcasts, no fact
    * fan-out). NULL child keys are excluded, as in SQL FK semantics. */
  def fkOrphans(child: DataFrame, parent: DataFrame,
                childKey: String, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)),
        Seq(childKey), "left_anti")

  /** The roll-up gate: one row of pass/fail counters for a standard
    * constraint set — key uniqueness, FK integrity, and a non-null
    * requirement — the shape a scheduler alerts on. */
  def gate(child: DataFrame, parent: DataFrame, childKey: String,
           parentKey: String, uniqueKeys: Seq[String],
           notNullCol: String): DataFrame = {
    val dups = duplicateKeys(parent, uniqueKeys)
      .agg(coalesce(sum(col("multiplicity")), lit(0L)).as("dupKeyRows"))
    val orphans = fkOrphans(child, parent, childKey, parentKey)
      .agg(count(lit(1)).as("orphanRows"))
    // coalesced: an EMPTY child table must yield pass=true, not the
    // NULL verdict a bare SUM's three-valued && would produce
    val nulls = child.agg(coalesce(
      sum(when(col(notNullCol).isNull, 1L).otherwise(0L)), lit(0L))
      .as("nullRows"))
    dups.crossJoin(orphans).crossJoin(nulls)
      .withColumn("pass",
        col("dupKeyRows") === 0 && col("orphanRows") === 0 &&
        col("nullRows") === 0)
  }

  /** Distribution-drift check between two table snapshots (yesterday's
    * corpus vs today's, reference slice vs delivery): fixed-width
    * histograms of `valueCol` are compared bin-by-bin and summarized by
    * the TOTAL VARIATION DISTANCE in parts-per-million —
    * TVD = ½ Σ_bins |p_a(bin) − p_b(bin)|, the standard drift measure
    * whose ppm form stays INTEGER-EXACT (per-bin proportions by integral
    * division, no floating sums whose order could differ across engines
    * or cluster sizes). `drifted` fires when TVD exceeds `thresholdPpm`.
    * Bins below 0 clamp to 0 and at/above `maxBins` clamp to the last
    * bin, so outliers drift the tails instead of exploding the grid.
    *
    * Emits one row per occupied bin (bin, cA, cB, pA_ppm, pB_ppm,
    * diff_ppm) plus the snapshot-level (tvd_ppm, drifted) on every row.
    *
    * Scale shape: two histogram aggregates (output ≤ maxBins rows each),
    * a bin-keyed full outer join of two bounded frames, and a 1-row
    * totals/TVD frame broadcast back — the only corpus-sized work is
    * the two scans. */
  def distributionDrift(a: DataFrame, b: DataFrame, valueCol: String,
                        binWidth: Long, maxBins: Int,
                        thresholdPpm: Long): DataFrame = {
    require(binWidth >= 1 && maxBins >= 1, "degenerate bin grid")
    def hist(df: DataFrame, cName: String): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .select(least(greatest(
          expr(s"CAST($valueCol AS BIGINT) DIV ${binWidth}L"), lit(0L)),
        lit(maxBins - 1L)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(cName))
    // bounded (≤ maxBins rows) and read by totals + ppm + tvd + the
    // final select — pinned so the corpus-scanning histogram subtree
    // executes once (the multiply-read-bounded-frame convention)
    val joined = hist(a, "cA").join(hist(b, "cB"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cA"), lit(0L)).as("cA"),
        coalesce(col("cB"), lit(0L)).as("cB"))
      .localCheckpoint()
    val totals = joined.agg(sum(col("cA")).as("__ta"),
      sum(col("cB")).as("__tb"))
    // an EMPTY side (the missing-delivery case a drift monitor exists to
    // catch) contributes all-zero proportions — the other side then sums
    // to ~1e6 so TVD ≈ 500000 ppm and any sane threshold trips; an
    // unguarded DIV would instead throw under ANSI (or NULL the verdict)
    val ppm = joined.crossJoin(broadcast(totals))
      .withColumn("pA_ppm", when(col("__ta") > 0,
        expr("(cA * 1000000) DIV __ta")).otherwise(lit(0L)))
      .withColumn("pB_ppm", when(col("__tb") > 0,
        expr("(cB * 1000000) DIV __tb")).otherwise(lit(0L)))
      .withColumn("diff_ppm", abs(col("pA_ppm") - col("pB_ppm")))
    val tvd = ppm.agg(expr("sum(diff_ppm) DIV 2").as("tvd_ppm"))
    ppm.crossJoin(broadcast(tvd))
      .select(col("bin"), col("cA"), col("cB"), col("pA_ppm"),
        col("pB_ppm"), col("diff_ppm"), col("tvd_ppm"),
        (col("tvd_ppm") > thresholdPpm).as("drifted"))
  }
}
