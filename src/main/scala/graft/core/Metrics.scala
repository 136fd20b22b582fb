package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Operator-latency metrics (SURVEY §2.6 D10,
  * A/distributed/metrics/DistributedMetrics.java): the reference wraps
  * every repository op in a time-varying rate counter; here a
  * QueryExecutionListener records each action's duration and the result
  * is itself a queryable DataFrame — the "metrics table" surface. */
object Metrics {

  final case class OpMetric(action: String, durationNs: Long, failed: Boolean)

  final class Recorder extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[OpMetric]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      buf.add(OpMetric(funcName, durationNs, failed = false))

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      buf.add(OpMetric(funcName, 0L, failed = true))

    def snapshot: Seq[OpMetric] = buf.iterator().asScala.toSeq
    def clear(): Unit = buf.clear()
  }

  /** Attach a recorder to the session; returns it for later inspection. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  /** The metrics table: per-action count / total / mean duration. */
  def asDataFrame(spark: SparkSession, r: Recorder): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    r.snapshot.toDF()
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n"),
        sum(col("durationNs")).as("totalNs"),
        avg(col("durationNs")).as("meanNs"),
        count(when(col("failed"), 1)).as("failures"))
  }
}
