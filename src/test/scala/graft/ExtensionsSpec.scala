package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.expr.FixedPointDot

/** SQL-surface registration of the native expressions. (A fully fresh
  * session with withExtensions can't be built here — getOrCreate reuses
  * the suite JVM's session — so the spec registers through the same
  * function-registry path the extension uses and smokes the injection.) */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injection applies cleanly") {
    new graft.core.GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("fixed_point_dot is callable from SQL once registered") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fixed_point_dot",
      exprs => FixedPointDot(exprs(0), exprs(1)),
      "scala_udf")
    val out = spark.sql(
      """SELECT fixed_point_dot(
        |  array(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |  array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS d""".stripMargin)
      .collect().head.getLong(0)
    assert(out == 4L * 1000000000000L) // 1.5*2 + 2*0.5 = 4.0 at 1e12 scale
  }
}
