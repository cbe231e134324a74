package graft

import graft.ops.Behavior
import org.scalatest.funsuite.AnyFunSuite

/** Funnel ordering semantics and retention-triangle arithmetic on
  * hand-built event sequences (the catalog oracle checks the real-data
  * path; sf0.01 users are dense enough that all reach stage 3, so the
  * ordering edge cases live here). */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("funnel: steps must occur in order, strictly after the previous") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "signup", 100L), (1L, "view", 200L), (1L, "purchase", 300L),
      // u2: purchase BEFORE view — stops at stage 1 (signup only, the
      // view at t=50 precedes signup and must not count either)
      (2L, "view", 50L), (2L, "signup", 100L), (2L, "purchase", 80L),
      // u3: signup + later view, no purchase — stage 2
      (3L, "signup", 10L), (3L, "view", 20L), (3L, "error", 30L),
      // u4: never signs up — stage 0
      (4L, "view", 10L), (4L, "purchase", 20L),
      // u5: view at the SAME instant as signup — "strictly after" excludes
      // it, so stage 1
      (5L, "signup", 10L), (5L, "view", 10L)
    ).toDF("user_id", "event_type", "t")
    val got = Behavior.funnelOf(ev).as[(Int, Long)].collect().toMap
    assert(got == Map(0 -> 1L, 1 -> 2L, 2 -> 1L, 3 -> 1L))
  }

  test("windowed funnel: a step past its deadline does not count") {
    val ddl = Behavior.FunnelDeadlineNs
    val ev = Seq(
      // u1 converts inside both deadlines
      (1L, "signup", 0L), (1L, "view", ddl), (1L, "purchase", 2 * ddl),
      // u2's view comes one ns after the deadline -> stuck at stage 1
      (2L, "signup", 0L), (2L, "view", ddl + 1L), (2L, "purchase", ddl + 2L),
      // u3 views in time but purchases too late -> stage 2
      (3L, "signup", 0L), (3L, "view", 10L), (3L, "purchase", 10L + ddl + 1L)
    ).toDF("user_id", "event_type", "t")
    // funnelWindowed reads from Tables.events; drive the same logic by a
    // local copy of its window chain over this frame
    val got = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("user_id")
      ev
        .withColumn("t1",
          min(when(col("event_type") === "signup", col("t"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "view" && col("t") > col("t1")
            && col("t") <= col("t1") + ddl, col("t"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("t") > col("t2")
            && col("t") <= col("t2") + ddl, col("t"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .select(col("user_id"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0).as("stage"))
        .as[(Long, Int)].collect().toMap
    }
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("cohort retention: offsets count distinct users per week") {
    val wk = Behavior.WeekSecs
    val ev = Seq(
      // u1 first seen week 0, active weeks 0 and 2 (twice in week 2 —
      // distinct must collapse)
      (1L, 10L), (1L, 2 * wk + 5L), (1L, 2 * wk + 6L),
      // u2 first seen week 0, active week 1
      (2L, 20L), (2L, wk + 1L),
      // u3 first seen week 1 — its own cohort
      (3L, wk + 100L)
    ).toDF("user_id", "ts_sec")
    val got = Behavior.cohortRetentionOf(ev)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set(
      (0L, 0, 2L), (0L, 1, 1L), (0L, 2, 1L),
      (wk, 0, 1L)))
  }

  test("attribution: one row per conversion, credited strictly earlier") {
    import org.apache.spark.sql.functions._
    val a = Behavior.attribution(spark, GraftSpark.Sf)
    val nConv = Tables.events(spark, GraftSpark.Sf)
      .filter(col("event_type") === Behavior.ConversionType).count()
    assert(a.count() == nConv)
    // credited touch is never the conversion type and strictly precedes it
    assert(a.filter(col("attributed_type") === Behavior.ConversionType)
      .isEmpty)
    assert(a.filter(col("attributed_t").isNotNull && col("gap_us") < 0)
      .isEmpty)
    // direct rows are exactly the NULL-timestamp rows
    assert(a.filter((col("attributed_type") === "direct") =!=
      col("attributed_t").isNull).isEmpty)
  }

  test("next-event pairs: totals equal events with three predecessors") {
    val rows = Behavior.nextEventPairs(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("context").split(" ").length == 3)
      assert(r.getAs[Long]("n") >= 1)
    }
    // every event with >= 3 per-user predecessors contributes exactly once
    val expected = Tables.events(spark, GraftSpark.Sf)
      .groupBy("user_id").count().collect()
      .map(r => math.max(0L, r.getAs[Long]("count") - 3L)).sum
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("ab test: arms partition viewers, rates recompute, lift vs A is exact") {
    val rows = graft.ops.Behavior.abTestReadout(spark, GraftSpark.Sf)
      .collect()
    assert(rows.map(_.getAs[String]("arm")).toSeq == Seq("A", "B"))
    val ev = Tables.events(spark, GraftSpark.Sf)
      .select("user_id", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): String = {
      val h = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("02468ace".contains(h.head)) "A" else "B"
    }
    val byUser = ev.groupBy(_._1)
    val expected = byUser.toSeq.flatMap { case (u, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val conv = es.exists(e => e._2 == "purchase" && e._3 > fv)
        Some((arm(u), conv))
      }
    }
    for (r <- rows) {
      val a = r.getAs[String]("arm")
      val mine = expected.filter(_._1 == a)
      assert(r.getAs[Long]("n_users") == mine.length)
      assert(r.getAs[Long]("n_converted") == mine.count(_._2))
      assert(r.getAs[Double]("rate") ==
        mine.count(_._2).toDouble / mine.length.toDouble)
    }
    val rateA = rows.find(_.getAs[String]("arm") == "A").get
      .getAs[Double]("rate")
    for (r <- rows)
      assert(r.getAs[Double]("lift_vs_a") == r.getAs[Double]("rate") - rateA)
  }

  test("dapp overlap: intersections recompute from counterparty audiences") {
    val rows = graft.ops.Dapps.dappOverlap(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "to_address")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val reg = Tables.DappRegistry.flatMap { case (id, _, as) =>
      as.map(a => a -> id) }.toMap
    val aud = scala.collection.mutable.Map.empty[String, Set[String]]
      .withDefaultValue(Set.empty)
    for ((f, to) <- t) {
      reg.get(to).foreach(d => aud(d) = aud(d) + f)
      reg.get(f).foreach(d => aud(d) = aud(d) + to)
    }
    for (r <- rows) {
      val (da, db) = (r.getAs[String]("da"), r.getAs[String]("db"))
      assert(da < db)
      val (sa, sb) = (aud(da), aud(db))
      assert(r.getAs[Long]("inter") == (sa intersect sb).size)
      assert(r.getAs[Long]("union_n") == (sa union sb).size)
    }
  }

  test("session paths: totals match a driver-side sessionizer recount") {
    val rows = graft.ops.Behavior.sessionPaths(spark, GraftSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    // recount: sessionize each user stream with the same gap rule
    val ev = Tables.events(spark, GraftSpark.Sf)
      .select("user_id", "event_id", "event_type", "ts", "ts_sec")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val paths = scala.collection.mutable.Map.empty[String, Long]
    for ((_, es) <- ev.groupBy(_._1)) {
      val ordered = es.sortBy(e => (e._4, e._2))
      var prev = Long.MinValue
      var cur = List.empty[String]
      def flush(): Unit = if (cur.nonEmpty) {
        val p = cur.reverse.take(graft.ops.Behavior.PathLen).mkString(">")
        paths(p) = paths.getOrElse(p, 0L) + 1
        cur = Nil
      }
      for (e <- ordered) {
        if (prev != Long.MinValue &&
          e._5 - prev > graft.ops.Behavior.SessionGapSec) flush()
        cur = e._3 :: cur
        prev = e._5
      }
      flush()
    }
    assert(rows.toMap == paths.toMap)
    // ranking is (count desc, path asc)
    val sorted = rows.sortBy { case (p, n) => (-n, p) }
    assert(rows.toSeq == sorted.toSeq)
  }

  test("linear attribution: ppm credit conserves exactly per conversion") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Behavior.attributionLinear(spark, GraftSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    // total credit = 1,000,000 × conversions that have >= 1 touch
    val ev = Tables.events(spark, GraftSpark.Sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val touchedConvs = ev.filter(_._3 == graft.ops.Behavior.ConversionType)
      .count { c =>
        ev.exists(t => t._1 == c._1 &&
          t._3 != graft.ops.Behavior.ConversionType &&
          (t._4 < c._4 || (t._4 == c._4 && t._2 < c._2)))
      }
    assert(rows.map(_.getAs[Long]("credit_ppm")).sum ==
      1000000L * touchedConvs)
    // channel totals never negative, touch counts bounded by K per conv
    rows.foreach { r =>
      assert(r.getAs[Long]("credit_ppm") > 0)
      assert(r.getAs[Long]("n_touches") <=
        graft.ops.Behavior.LinearTouchK * r.getAs[Long]("n_conversions"))
    }
  }

  test("wallet adoption: cumulative totals end at the distinct wallet " +
    "count and news are disjoint by construction") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Metrics.walletAdoption(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_new"),
        r.getAs[Long]("cum_wallets")))
    assert(rows.nonEmpty)
    val byTok = rows.groupBy(_._1)
    val wallets = Tables.transfers(spark, GraftSpark.Sf)
      .select(col("contract_address"),
        explode(array(col("from_address"), col("to_address"))).as("w"))
      .distinct().groupBy("contract_address").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byTok.foreach { case (tok, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.last._4 == wallets(tok), tok)
      assert(ordered.map(_._3).sum == ordered.last._4, tok)
      ordered.foldLeft(0L) { (acc, r) =>
        assert(r._4 == acc + r._3, s"$tok ${r._2}"); r._4
      }
    }
  }

  test("debounce: burst accounting matches the per-sender gap recount") {
    val got = graft.ops.Behavior.debounce(spark, GraftSpark.Sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("max_burst_len"))).toMap
    val w = graft.ops.Behavior.ThrottleSec
    val byKey = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "from_address", "transact_at",
        "block_number").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
    // burst lengths per sender: a new burst starts when the gap >= throttle
    val burstsByTok = byKey.toSeq.flatMap { case ((tok, _), es) =>
      val ts = es.sortBy(e => (e._3, e._4)).map(_._3)
      val lens = scala.collection.mutable.ArrayBuffer[Long]()
      var cur = 0L; var prev = Long.MinValue
      ts.foreach { t =>
        if (cur == 0L || t - prev >= w) { if (cur > 0) lens += cur; cur = 1 }
        else cur += 1
        prev = t
      }
      if (cur > 0) lens += cur
      lens.map(tok -> _)
    }.groupBy(_._1)
    val expect = burstsByTok.view.mapValues { ls =>
      val lens = ls.map(_._2)
      (lens.sum, lens.length.toLong, lens.sum - lens.length, lens.max)
    }.toMap
    assert(got == expect)
    assert(got.values.exists(_._3 > 0)) // the throttle actually drops some
  }

  test("time to convert: gap order statistics match the driver recount") {
    val row = graft.ops.Behavior.timeToConvert(spark, GraftSpark.Sf)
      .collect().head
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "from_address", "transact_at").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val firstView = t.filter(_._1 == "view").groupBy(_._2)
      .view.mapValues(_.map(_._3).min).toMap
    val gaps = firstView.toSeq.flatMap { case (w, tv) =>
      val ps = t.filter(x => x._1 == "purchase" && x._2 == w && x._3 >= tv)
      if (ps.isEmpty) None else Some(ps.map(_._3).min - tv)
    }.sorted
    assert(row.getAs[Long]("n_viewers") == firstView.size)
    assert(row.getAs[Long]("n_converted") == gaps.length)
    assert(gaps.nonEmpty)
    def rankStat(mul: Long, num: Long): Long = {
      // smallest gap g with mul*|{<=g}| >= num*n
      val n = gaps.length
      gaps.find(g => mul * gaps.count(_ <= g) >= num * n).get
    }
    assert(row.getAs[Long]("median_gap_sec") == rankStat(2, 1))
    assert(row.getAs[Long]("p90_gap_sec") == rankStat(10, 9))
  }

  test("token migration: matrix matches the half-window argmax recount") {
    val got = graft.ops.Wallet.tokenMigration(spark, GraftSpark.Sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n_wallets"))).toMap
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "contract_address", "transact_at").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val mid = (t.map(_._3).min + t.map(_._3).max) / 2
    def best(half: Seq[(String, String, Long)]): Map[String, String] =
      half.groupBy(_._1).view.mapValues { rs =>
        rs.groupBy(_._2).toSeq
          .map { case (tok, xs) => (xs.length, tok) }
          .maxBy(identity)._2
      }.toMap
    val (b1, b2) = (best(t.filter(_._3 < mid).toSeq),
      best(t.filter(_._3 >= mid).toSeq))
    val expect = b1.keySet.intersect(b2.keySet).toSeq
      .map(w => (b1(w), b2(w)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("cohortLtv: cumulative spend recount; cohort sizes partition " +
    "the spender population") {
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "transact_at", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 604800,
        (BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt.toLong))
    val cohort = t.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val per = t.groupBy(x => (cohort(x._1), x._2 - cohort(x._1)))
      .map { case ((cw, age), xs) =>
        (cw, age, xs.map(_._1).distinct.size.toLong, xs.map(_._3).sum) }
      .toSeq.sortBy(x => (x._1, x._2))
    val sizes = cohort.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    var cums = Map[Long, Long]().withDefaultValue(0L)
    val expect = per.map { case (cw, age, na, cents) =>
      cums += cw -> (cums(cw) + cents)
      (cw, age, sizes(cw), na, cents, cums(cw),
        (BigInt(cums(cw)) * 1000000 / sizes(cw)).toLong)
    }
    val got = graft.ops.Behavior.cohortLtv(spark, GraftSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect)
    // every spender is in exactly one cohort
    assert(sizes.values.sum == cohort.size.toLong)
    assert(got.nonEmpty)
  }

  test("ksDrift: exact KS recount over the hourly distribution halves") {
    val hourly = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "transact_at", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600 * 3600,
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(t => (t._1, t._2)).view
      .mapValues(xs => (xs.map(_._3).sum * 100).toBigInt.toLong).toMap
    val ts = hourly.keys.map(_._2)
    val (mn, mx) = (ts.min, ts.max)
    val expect = hourly.groupBy(_._1._1).view.mapValues { h =>
      val (h1, h2) = h.partition(_._1._2 * 2 <= mn + mx)
      val (n1, n2) = (h1.size.toLong, h2.size.toLong)
      val support = h.values.toSeq.distinct.sorted
      val ks = support.map { v =>
        val f1 = h1.values.count(_ <= v).toLong
        val f2 = h2.values.count(_ <= v).toLong
        math.abs(f1 * n2 - f2 * n1)
      }.max
      (n1, n2, ks, ks * 1000000L / (n1 * n2))
    }.toMap
    val got = Behavior.ksDrift(spark, GraftSpark.Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == expect.filter { case (_, (n1, n2, _, _)) =>
      n1 > 0 && n2 > 0 })
    assert(got.nonEmpty)
  }

  test("mannWhitney: doubled-U rank-sum recount over log2 buckets " +
    "with midrank ties") {
    val rows = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "transact_at", "value").collect()
      .map { r =>
        val cents = (BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt.toLong
        (r.getString(0), (r.getLong(1) / 86400 + 4) % 7, cents)
      }
      .filter(_._3 > 0)
      .map { case (tok, wd, cents) =>
        (tok, 63 - java.lang.Long.numberOfLeadingZeros(cents),
          wd == 0 || wd == 6)
      }
    val expect = rows.groupBy(_._1).view.mapValues { xs =>
      val byB = xs.groupBy(_._2).view.mapValues(g =>
        (g.count(_._3).toLong, g.count(!_._3).toLong)).toMap
      val buckets = byB.keys.toSeq.sorted
      var cum2 = 0L; var u2 = 0L
      buckets.foreach { b =>
        val (a, d) = byB(b); u2 += 2 * a * cum2 + a * d; cum2 += d
      }
      val (n1, n2) = (xs.count(_._3).toLong, xs.count(!_._3).toLong)
      (n1, n2, u2, u2 * 1000000L / (2 * n1 * n2))
    }.filter { case (_, (n1, n2, _, _)) => n1 > 0 && n2 > 0 }.toMap
    val got = Behavior.mannWhitney(spark, GraftSpark.Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // AUC is a probability in ppm
    got.values.foreach { case (_, _, _, auc) =>
      assert(auc >= 0L && auc <= 1000000L)
    }
  }

  test("whale contrast: both groups present and reconcile with exact " +
    "final balances over both legs") {
    val rows = graft.ops.Wallet.whaleContrast(spark, GraftSpark.Sf)
      .collect()
      .map(r => r.getBoolean(0) -> (r.getAs[Long]("n_wallets"),
        r.getAs[Long]("n_sends"), r.getAs[Long]("n_receives"),
        r.getAs[Double]("total_sent"), r.getAs[Double]("total_received")))
      .toMap
    val ft = Tables.transfers(spark, GraftSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("contract_address")
        === Tables.FocusToken)
      .select("from_address", "to_address", "value").collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val bal = scala.collection.mutable.Map[String, BigDecimal]()
      .withDefaultValue(BigDecimal(0))
    ft.foreach { case (f, to, v) => bal(f) -= v; bal(to) += v }
    val whale = bal.view.mapValues(
      _ >= BigDecimal(Tables.WhaleThreshold)).toMap
    val legs = ft.flatMap(x => Seq((x._1, x._3, true), (x._2, x._3, false)))
    val byGroup = legs.groupBy(l => whale(l._1))
    assert(rows.keySet == byGroup.keySet)
    assert(rows.keySet == Set(true, false)) // the contrast is non-degenerate
    byGroup.foreach { case (g, xs) =>
      val (nw, ns, nr, ts, tr) = rows(g)
      assert(nw == xs.map(_._1).distinct.size)
      assert(ns == xs.count(_._3) && nr == xs.count(!_._3))
      assert(math.abs(ts - xs.filter(_._3).map(_._2).sum.toDouble) < 1e-9)
      assert(math.abs(tr - xs.filterNot(_._3).map(_._2).sum.toDouble) < 1e-9)
    }
  }
}
