package graft

import org.apache.spark.sql.functions._

import graft.functions.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000000L // 1 h in ns

  test("funnel walks ordered steps within the conversion window") {
    val ev = Seq(
      // user 1: full chain, each hop within 24 h
      (1L, "signup", 100L * H), (1L, "view", 101L * H),
      (1L, "click", 102L * H), (1L, "purchase", 103L * H),
      // user 2: only a view BEFORE signup → chain breaks at stage 1
      (2L, "view", 90L * H), (2L, "signup", 100L * H),
      // user 3: click lands outside t2's 24 h window → stage 2
      (3L, "signup", 0L), (3L, "view", 1L * H),
      (3L, "click", 26L * H), (3L, "purchase", 27L * H),
      // user 4: never signs up → stage 0
      (4L, "view", 5L * H),
    ).toDF("user_id", "event_type", "ts")
    val out = rows(Events.funnel(ev,
        Seq("signup", "view", "click", "purchase"), windowNs = 24L * H)
      .select(col("user_id"), col("stage")).orderBy(col("user_id")))
    assert(out == Seq(Seq(1L, 4L), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 0L)))
  }

  test("funnel picks the FIRST qualifying event per step") {
    val ev = Seq(
      (1L, "signup", 10L * H), (1L, "view", 12L * H), (1L, "view", 11L * H),
    ).toDF("user_id", "event_type", "ts")
    val out = rows(Events.funnel(ev, Seq("signup", "view"),
      windowNs = 24L * H).select(col("t1"), col("t2")))
    assert(out == Seq(Seq(10L * H, 11L * H)))
  }

  test("asofJoin matches the greatest quote ts ≤ probe ts, per key") {
    val quotes = Seq(
      (1L, 10L * H, 1.0), (1L, 20L * H, 2.0), (1L, 30L * H, 3.0),
      (2L, 15L * H, 9.0),
    ).toDF("user_id", "ts", "quote")
    val probes = Seq(
      (100L, 1L, 20L * H),  // equal ts → the 20 h quote itself (≤ bound)
      (101L, 1L, 25L * H),  // between 20 h and 30 h → 20 h quote
      (102L, 1L, 5L * H),   // before every quote → unmatched
      (103L, 2L, 50L * H),  // other key → that key's only quote
      (104L, 3L, 50L * H),  // key with no quotes at all → unmatched
    ).toDF("event_id", "user_id", "ts")
    val out = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote"))
      .select(col("event_id"), col("matchedTs"), col("quote"))
      .orderBy(col("event_id")))
    assert(out == Seq(
      Seq(100L, 20L * H, 2.0),
      Seq(101L, 20L * H, 2.0),
      Seq(102L, null, null),
      Seq(103L, 15L * H, 9.0),
      Seq(104L, null, null)))
  }

  test("asofJoin forward matches the smallest quote ts ≥ probe ts") {
    val quotes = Seq(
      (1L, 10L * H, 1.0), (1L, 20L * H, 2.0), (1L, 30L * H, 3.0),
    ).toDF("user_id", "ts", "quote")
    val probes = Seq(
      (100L, 1L, 20L * H),  // equal ts → the 20 h quote itself (≥ bound)
      (101L, 1L, 25L * H),  // between → the NEXT quote at 30 h
      (102L, 1L, 35L * H),  // after every quote → unmatched
    ).toDF("event_id", "user_id", "ts")
    val out = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote"), direction = "forward")
      .select(col("event_id"), col("matchedTs"), col("quote"))
      .orderBy(col("event_id")))
    assert(out == Seq(
      Seq(100L, 20L * H, 2.0),
      Seq(101L, 30L * H, 3.0),
      Seq(102L, null, null)))
  }

  test("asofJoin nearest picks the closer side; ties go backward") {
    val quotes = Seq(
      (1L, 10L * H, 1.0), (1L, 20L * H, 2.0),
    ).toDF("user_id", "ts", "quote")
    val probes = Seq(
      (100L, 1L, 13L * H),  // 3 h back vs 7 h forward → backward
      (101L, 1L, 18L * H),  // 8 h back vs 2 h forward → forward
      (102L, 1L, 15L * H),  // equidistant → backward wins the tie
      (103L, 1L, 25L * H),  // only a backward candidate
      (104L, 1L, 5L * H),   // only a forward candidate
    ).toDF("event_id", "user_id", "ts")
    val out = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote"), direction = "nearest")
      .select(col("event_id"), col("matchedTs"), col("quote"))
      .orderBy(col("event_id")))
    assert(out == Seq(
      Seq(100L, 10L * H, 1.0),
      Seq(101L, 20L * H, 2.0),
      Seq(102L, 10L * H, 1.0),
      Seq(103L, 20L * H, 2.0),
      Seq(104L, 10L * H, 1.0)))
    // nearest + tolerance: both sides farther than the bound → unmatched
    val tol = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote"), toleranceNs = Some(2L * H), direction = "nearest")
      .select(col("event_id"), col("matchedTs"))
      .orderBy(col("event_id")))
    assert(tol == Seq(
      Seq(100L, null), Seq(101L, 20L * H), Seq(102L, null),
      Seq(103L, null), Seq(104L, null)))
  }

  test("asofJoin tolerance nulls matches older than the bound") {
    val quotes = Seq((1L, 10L * H, 1.0)).toDF("user_id", "ts", "quote")
    val probes = Seq((100L, 1L, 11L * H), (101L, 1L, 20L * H))
      .toDF("event_id", "user_id", "ts")
    val out = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote"), toleranceNs = Some(2L * H))
      .select(col("event_id"), col("matchedTs"), col("quote"))
      .orderBy(col("event_id")))
    assert(out == Seq(
      Seq(100L, 10L * H, 1.0),   // 1 h old, inside the 2 h tolerance
      Seq(101L, null, null)))    // 10 h old → nulled
  }

  test("rangeJoin: half-open bounds, bucket spanning, exactly-once pairs") {
    val B = 6L * H
    val iv = Seq(
      // interval spanning three buckets: [5h, 14h)
      (10L, 1L, 5L * H, 14L * H),
      // second interval overlapping the first: [8h, 9h)
      (11L, 1L, 8L * H, 9L * H),
      // empty interval → dropped
      (12L, 1L, 20L * H, 20L * H),
    ).toDF("iv_id", "user_id", "s", "e")
    val pts = Seq(
      (100L, 1L, 5L * H),   // inclusive start of 10
      (101L, 1L, 8L * H),   // inside BOTH 10 and 11
      (102L, 1L, 13L * H),  // third bucket of 10 only
      (103L, 1L, 14L * H),  // exclusive end → no match
      (104L, 1L, 20L * H),  // only the empty interval → no match
      (105L, 2L, 8L * H),   // other key → no match
    ).toDF("p_id", "user_id", "ts")
    val out = rows(Events.rangeJoin(pts, iv, "user_id", "ts", "s", "e", B)
      .select(col("p_id"), col("iv_id")).orderBy(col("p_id"), col("iv_id")))
    assert(out == Seq(
      Seq(100L, 10L), Seq(101L, 10L), Seq(101L, 11L), Seq(102L, 10L)))
  }

  test("asofJoin: NULL-key probes never match NULL-key quotes (join semantics)") {
    val quotes = Seq[(java.lang.Long, Long, Double)](
      (null, 5L * H, 1.0), (1L, 5L * H, 2.0),
    ).toDF("user_id", "ts", "quote")
    val probes = Seq[(Long, java.lang.Long, Long)](
      (100L, null, 10L * H), (101L, 1L, 10L * H),
    ).toDF("event_id", "user_id", "ts")
    val out = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote"))
      .select(col("event_id"), col("matchedTs"), col("quote"))
      .orderBy(col("event_id")))
    // the NULL-key probe stays (LEFT semantics) but matches nothing —
    // Window.partitionBy groups nulls, a raw window plan would pair them
    assert(out == Seq(Seq(100L, null, null), Seq(101L, 5L * H, 2.0)))
  }

  test("rangeJoin: a bucket-bomb interval fails loudly, not with an OOM") {
    val iv = Seq((10L, 1L, 0L, Long.MaxValue))
      .toDF("iv_id", "user_id", "s", "e")
    val pts = Seq((100L, 1L, 5L)).toDF("p_id", "user_id", "ts")
    val err = intercept[Exception] {
      Events.rangeJoin(pts, iv, "user_id", "ts", "s", "e", 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("spans more than")),
      s"expected the named-row raise_error, got: $err")
  }

  test("intervalJoin: overlap pairs meet exactly once across bucket spans") {
    val B = 6L * H
    val left = Seq(
      (10L, 1L, 5L * H, 20L * H),   // spans buckets 0..3
      (11L, 1L, 30L * H, 31L * H),  // disjoint from everything on the right
      (12L, 1L, 40L * H, 40L * H),  // empty → dropped
    ).toDF("l_id", "user_id", "ls", "le")
    val right = Seq(
      (20L, 1L, 0L, 36L * H),       // covers left 10 entirely (6 shared buckets)
      (21L, 1L, 19L * H, 22L * H),  // overlaps left 10 by [19h, 20h)
      (22L, 1L, 20L * H, 25L * H),  // touches left 10's exclusive end → no pair
      (23L, 2L, 5L * H, 20L * H),   // other key
    ).toDF("r_id", "user_id", "rs", "re")
    val out = rows(Events.intervalJoin(left, right, "user_id",
        "ls", "le", "rs", "re", B)
      .select(col("l_id"), col("r_id")).orderBy(col("l_id"), col("r_id")))
    assert(out == Seq(Seq(10L, 20L), Seq(10L, 21L), Seq(11L, 20L)))
  }

  test("as-of law: every direction × tolerance matches a brute-force reference") {
    val rnd = new scala.util.Random(42)
    val quoteRows = (1 to 120).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(500).toLong, rnd.nextInt(1000) / 10.0))
      .groupBy(q => (q._1, q._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, ts)
    val probeRows = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(550).toLong))
    val quotes = quoteRows.toDF("user_id", "ts", "quote")
    val probes = probeRows.toDF("event_id", "user_id", "ts")
    val byKey = quoteRows.groupBy(_._1)
    def brute(key: Long, ts: Long, dir: String, tol: Option[Long]) = {
      val qs = byKey.getOrElse(key, Seq.empty)
      val back = qs.filter(q => q._2 <= ts && tol.forall(t => ts - q._2 <= t))
        .sortBy(_._2).lastOption
      val fwd = qs.filter(q => q._2 >= ts && tol.forall(t => q._2 - ts <= t))
        .sortBy(_._2).headOption
      dir match {
        case "backward" => back
        case "forward"  => fwd
        case "nearest"  => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (ts - b._2 <= f._2 - ts) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
    }
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(37L))) {
      val got = rows(Events.asofJoin(probes, quotes, "user_id", "ts",
          Seq("quote"), toleranceNs = tol, direction = dir)
        .select(col("event_id"), col("matchedTs"), col("quote")))
        .map(r => r.head -> ((r(1), r(2)))).toMap
      probeRows.foreach { case (id, key, ts) =>
        val want = brute(key, ts, dir, tol)
          .map(q => (q._2, q._3)).getOrElse((null, null))
        assert(got(id) == want, s"dir=$dir tol=$tol probe=$id: ${got(id)} vs $want")
      }
    }
  }

  test("range/interval law: any bucket width equals the brute predicate join") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(800).toLong))
    val ivs = (1 to 80).map(i =>
      { val s = rnd.nextInt(800).toLong
        (1000L + i, rnd.nextInt(6).toLong, s, s + rnd.nextInt(120).toLong - 10L) })
    val pdf = pts.toDF("p_id", "user_id", "ts")
    val idf = ivs.toDF("iv_id", "user_id", "s", "e")
    val bruteRange = (for {
      (pid, pk, ts) <- pts; (vid, vk, s, e) <- ivs
      if pk == vk && ts >= s && ts < e } yield (pid, vid)).sorted
    val bruteOverlap = (for {
      (aid, ak, as_, ae) <- ivs.map(v => (v._1, v._2, v._3, v._4))
      (bid, bk, bs, be) <- pts.map(p => (p._1, p._2, p._3, p._3 + 50L))
      if ak == bk && as_ < be && bs < ae && ae > as_ && be > bs
    } yield (aid, bid)).sorted
    val pIv = pts.map(p => (p._1, p._2, p._3, p._3 + 50L))
      .toDF("b_id", "user_id", "bs", "be")
    for (bucket <- Seq(1L, 7L, 64L, 1000L)) {
      val gotR = rows(Events.rangeJoin(pdf, idf, "user_id", "ts", "s", "e",
          bucket).select(col("p_id"), col("iv_id")))
        .map(r => (r.head.asInstanceOf[Long], r.last.asInstanceOf[Long])).sorted
      assert(gotR == bruteRange, s"rangeJoin bucket=$bucket diverged")
      val gotO = rows(Events.intervalJoin(idf, pIv, "user_id", "s", "e",
          "bs", "be", bucket).select(col("iv_id"), col("b_id")))
        .map(r => (r.head.asInstanceOf[Long], r.last.asInstanceOf[Long])).sorted
      assert(gotO == bruteOverlap, s"intervalJoin bucket=$bucket diverged (exactly-once included)")
    }
  }

  test("retention: cohort from first activity, per-offset distinct users") {
    val D = Events.DayNs
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 1L * D + 5L), (1L, "view", 1L * D + 7L),
      (2L, "view", 2L), (2L, "view", 2L * D),
      (3L, "view", 1L * D),
    ).toDF("user_id", "event_type", "ts")
    val out = rows(Events.retention(ev)
      .select(col("cohortDay"), col("dayOffset"), col("activeUsers"),
        col("cohortSize"), col("retention"))
      .orderBy(col("cohortDay"), col("dayOffset")))
    assert(out == Seq(
      Seq(0L, 0L, 2L, 2L, 1.0),
      Seq(0L, 1L, 1L, 2L, 0.5),
      Seq(0L, 2L, 1L, 2L, 0.5),
      Seq(1L, 0L, 1L, 1L, 1.0)))
  }
}
