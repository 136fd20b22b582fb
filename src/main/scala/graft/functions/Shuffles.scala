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
}
