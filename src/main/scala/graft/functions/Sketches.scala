package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Membership/cardinality sketches (SURVEY §2.5 F7): the reference's
  * bloom-filter family (standard/counting/dynamic/retouched, under
  * C/org/apache/hadoop/util/bloom/) maps to Spark's built-in
  * BloomFilter sketch + approx_count_distinct (HLL). The filter is built
  * distributed (one pass, merged on the driver) and applied as a
  * broadcast predicate — the classic semi-join pruning pattern for
  * 100 TB joins where the build side is small.
  */
object Sketches {

  /** Build a bloom filter over a column (distributed build + merge). */
  def buildBloom(df: DataFrame, column: String, expectedItems: Long,
                 fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(column, expectedItems, fpp)

  /** Prune `df` to rows whose `column` might be in the filter — false
    * positives possible, false negatives not (BloomMapFile semantics). */
  def mightContain(df: DataFrame, column: String, bloom: BloomFilter): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(bloom)
    val contains = udf((v: Long) => bc.value.mightContainLong(v))
    df.filter(contains(col(column)))
  }

  /** HLL cardinality per group — the sketch analog of COUNT(DISTINCT). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approxDistinct"))

  /** Quantile sketch (Greenwald-Khanna) — percentiles without a sort. */
  def approxQuantiles(df: DataFrame, column: String,
                      probabilities: Array[Double], relErr: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(column, probabilities, relErr)
}
