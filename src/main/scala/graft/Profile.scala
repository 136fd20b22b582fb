package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the LSH pipelines (local iteration only;
  * not part of the driver contract). Times each stage of d2 cold. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables
    import graft.functions.Dedup

    def corpus = {
      val d = Tables.documents(spark, sfDir)
      d.select(col("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }
    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    // warmup
    corpus.count()
    time("corpus")(corpus.count())
    time("tokens_explode")(corpus.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokens(col("text"))).as(Seq("pos", "w"))).count())
    time("shingleRows")(Dedup.shingleRows(corpus, "doc_id", "text").count())
    time("signatures")(Dedup.minhashSignatures(corpus, "doc_id", "text").count())
    time("sig+bands+melt")({
      val sig = Dedup.withBands(Dedup.minhashSignatures(corpus, "doc_id", "text"))
      sig.select(col("doc_id"), posexplode(array((0 until 4).map(b => col(s"band$b")): _*))
        .as(Seq("bandIdx", "bandKey"))).count()
    })
    time("lshCandidates_full")(Dedup.lshCandidates(corpus, "doc_id", "text").count())
    spark.stop()
  }
}
