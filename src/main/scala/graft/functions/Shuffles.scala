package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling for training-data pipelines: a global
  * permutation of the corpus without a global sort.
  *
  * Training runs shuffle the corpus before packing so consecutive
  * sequences don't share a domain/source; doing that with ORDER BY
  * rand() is nondeterministic and a single global sort. This is the
  * scale shape instead: shard = leading 32 bits of md5(id ∥ salt) mod
  * nShards (uniform, engine-portable, replayable from the salt), and
  * position = rank of the SAME hash within the shard. At 100 TB the
  * shard column is the partition key — ONE narrow hash shuffle — and
  * each shard sorts only its ~corpus/nShards rows locally; no
  * single-partition global window ever materializes. Downstream packing
  * ([[graft.queries.DataOpsQueries]] t7) consumes (shard, pos) order.
  * A different `salt` is a fresh independent permutation (per-epoch
  * reshuffle).
  */
object Shuffles {

  /** Engine-portable 32-bit hash key: value of the first 8 hex chars of
    * md5(id ∥ salt) — always in [0, 2^32), so plain % stays positive in
    * both Spark and DuckDB. */
  def hashKey(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** Assign (shard, pos): a deterministic permutation presented as
    * shard-local contiguous ranks 1..|shard|. Ties in the 32-bit key
    * break by id, so the permutation is total and replayable. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int,
                   salt: String = "epoch0"): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("hkey"), col(idCol))
    df.withColumn("hkey", hashKey(col(idCol), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Token-budgeted mixture sampling — the data-mixing step of a
    * training pipeline: each source (`groupCol`) gets a token budget,
    * and the sample admits that source's docs in deterministic hash
    * order until the budget is spent. Groups absent from `budgets` are
    * dropped (budget 0).
    *
    * Scale shape: a per-source cumulative sum would be ONE window
    * partition per source — a near-global sort for a big source — so the
    * budget is split evenly across `nShards` hash shards and each
    * (source, shard) window is corpus/nShards-bounded. The admission
    * rule (tokens spent BEFORE the doc < shard budget) admits at most
    * one budget-straddling doc per shard; the result is deterministic,
    * replayable from the salt, and within nShards·avgDocTokens of the
    * target. Returns the input plus (hkey, shard, cumBefore, keep). */
  def budgetedMix(df: DataFrame, idCol: String, groupCol: String,
                  tokenCol: String, budgets: Map[String, Long],
                  nShards: Int, salt: String = "mix0"): DataFrame = {
    // shard budget in DOUBLE: integer division would floor a budget
    // smaller than nShards to 0 and silently drop the source outright —
    // exactly the small sources a mixture exists to protect. With the
    // fractional quota the first doc of each shard always admits
    // (cumBefore 0 < b/n for any b > 0), so a positive budget keeps
    // ≥ 1 doc and the overshoot stays ≤ nShards straddling docs.
    val shardBudget = budgets.foldLeft(lit(0.0)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b.toDouble / nShards)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol), col("shard"))
      .orderBy(col("hkey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("hkey", hashKey(col(idCol), salt))
      .withColumn("shard", col("hkey") % nShards)
      .withColumn("cumBefore", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("keep", col("cumBefore") < shardBudget)
  }
}
