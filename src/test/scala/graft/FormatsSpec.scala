package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.sources.Formats
import graft.store.{IndexDef, Tdhs}

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("F1: sequence file round-trip (sorted)") {
    val dir = Files.createTempDirectory("graft-seq").toString + "/sf"
    val df = Seq(("b", "2"), ("a", "1"), ("c", "3")).toDF("key", "value")
    Formats.writeSequenceFile(df, dir, sorted = true)
    val back = rows(Formats.readSequenceFile(spark, dir).orderBy(col("key")))
    assert(back == Seq(Seq("a", "1"), Seq("b", "2"), Seq("c", "3")))
  }

  test("F2/F3: sorted keyed parquet round-trip with codec") {
    val dir = Files.createTempDirectory("graft-kv").toString + "/kv"
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Formats.writeSortedKeyed(df, "k", dir, codec = "gzip")
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    assert(rows(back.filter(col("k") === 42L)).head == Seq(42L, "v42"))
  }

  test("F11: namespace export to json") {
    val dir = Files.createTempDirectory("graft-ns").toString + "/ns"
    val file = Seq(
      (0L, -1L, "", -1L, 0L, 0L, 0L, 0L, 0L, None: Option[String], 0L, 1L),
      (1L, 0L, "a", 10L, 0L, 0L, 0L, 0L, 0L, None: Option[String], 0L, 2L),
    ).toDF("id", "parentId", "name", "length", "blockSize", "replication",
      "atime", "mtime", "owner", "leaseHolder", "leaseRecoveryTime", "version")
    Formats.exportNamespace(file, dir, "json")
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(rows(back.filter(col("id") === 1L).select(col("path"))).head == Seq("/a"))
  }

  test("F7: bloom filter prunes with no false negatives") {
    val keys = (1L to 1000L).filter(_ % 3 == 0)
    val build = keys.toDF("k")
    val bloom = Sketches.buildBloom(build, "k", expectedItems = 400)
    val probe = (1L to 1000L).toDF("k")
    val kept = rows(Sketches.mightContain(probe, "k", bloom)).map(_.head.asInstanceOf[Long]).toSet
    assert(keys.forall(kept.contains)) // no false negatives
    assert(kept.size < 1000)           // pruned most non-members
  }

  test("F7: approx distinct close to exact") {
    val df = (1 to 10000).map(i => ("g", i % 500)).toDF("g", "v")
    val approx = rows(Sketches.approxDistinct(df, Seq("g"), "v")).head(1).asInstanceOf[Long]
    assert(math.abs(approx - 500) < 50)
  }

  test("P7: TDHS fluent DSL composes index find + post filters + limit") {
    val kv = Seq(
      (1L, 10L, "x", 1L), (2L, 10L, "y", 2L), (3L, 20L, "y", 3L),
      (4L, 10L, "z", 4L), (5L, 10L, null, 5L),
    ).toDF("id", "grp", "tag", "version")
    val out = rows(Tdhs.from(kv)
      .select("id", "tag")
      .index(IndexDef("GRP", Seq("grp")))
      .equal(10L)
      .and().field("tag").not("x")
      .limit(0, 10)
      .get().orderBy(col("id")))
    assert(out == Seq(Seq(2L, "y"), Seq(4L, "z"))) // null tag excluded by NOT
    val nulls = rows(Tdhs.from(kv).index(IndexDef("GRP", Seq("grp"))).equal(10L)
      .and().field("tag").isNull().get().select(col("id")))
    assert(nulls == Seq(Seq(5L)))
    // update + delete through the DSL
    val upd = Tdhs.from(kv).index(IndexDef("GRP", Seq("grp"))).equal(20L)
      .update(Map("grp" -> graft.store.StateStore.Add(1L)), nowMs = 0L)
    assert(rows(upd.filter(col("id") === 3L)).head(1) == 21L)
    val del = Tdhs.from(kv).index(IndexDef("GRP", Seq("grp"))).equal(10L).delete()
    assert(rows(graft.store.StateStore.live(del)).map(_.head) == Seq(3L))
  }
}
