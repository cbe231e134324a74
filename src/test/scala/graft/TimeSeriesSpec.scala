package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural checks for [[graft.ops.Metrics.volumeAcf]],
  * [[graft.ops.Graph.reciprocity]], and [[graft.ops.Forensics.dormancy]]
  * (the DuckDB oracle verifies exact values at catalog level). */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("volumeAcf: every token emits lags 1..3, acf in [-1,1], and a " +
    "constant-plus-spike series re-derives exactly") {
    val got = graft.ops.Metrics.volumeAcf(spark, GraftSpark.Sf).collect()
    val byTok = got.groupBy(_.getString(0))
    assert(byTok.nonEmpty)
    byTok.foreach { case (tok, rows) =>
      assert(rows.map(_.getAs[Long]("lag")).sorted.toSeq == Seq(1L, 2L, 3L), tok)
      rows.foreach { r =>
        val acf = r.getAs[Double]("acf")
        assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9, s"$tok acf=$acf")
      }
    }
  }

  test("reciprocity: counts match a brute-force pair check; pml is exact " +
    "integer division") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"),
      ("d", "c"), ("d", "d"), ("a", "b")).toDF("src", "dst")
    val r = graft.ops.Graph.reciprocity(edges).head()
    // distinct non-loop edges: ab ba bc cd dc (5); reciprocated: ab,ba,cd,dc
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_reciprocated") == 4L)
    assert(r.getAs[Long]("reciprocity_pml") == 4000L / 5L)
  }

  test("modularity: degree/edge conservation and Q bounds") {
    val rows = graft.ops.Wallet.communityModularity(spark, GraftSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    // internal edges can't exceed the total; degree sums count every edge
    // end exactly once across communities
    assert(rows.map(_.getAs[Long]("e_in")).sum <= m)
    assert(rows.map(_.getAs[Long]("d_c")).sum == 2 * m)
    val q = rows.map(_.getAs[Double]("q_term")).sum
    assert(q >= -0.5 - 1e-6 && q <= 1.0 + 1e-6, s"Q=$q")
    rows.foreach { r =>
      // recompute the exact rational term
      val expect = (BigDecimal(4L * m * r.getAs[Long]("e_in")) -
        BigDecimal(r.getAs[Long]("d_c")) * BigDecimal(r.getAs[Long]("d_c"))) /
        (BigDecimal(4) * BigDecimal(m) * BigDecimal(m))
      assert(math.abs(r.getAs[Double]("q_term") - expect.toDouble) < 2e-6)
    }
  }

  test("mad outliers: medians re-derive as order statistics") {
    val rows = graft.ops.Metrics.madOutliers(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    val hourly = Tables.transfers(spark, GraftSpark.Sf)
      .groupBy(col("contract_address"),
        graft.ops.Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((graft.ops.Num.dsumDec(col("value")) * 100).cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    rows.foreach { r =>
      val tok = r.getString(0)
      val cents = hourly(tok).map(_._2)
      assert(r.getAs[Long]("n_hours") == cents.length)
      val med = lowerMedian(cents)
      assert(r.getAs[Long]("median_cents") == med, tok)
      val mad = lowerMedian(cents.map(c => math.abs(c - med)))
      assert(r.getAs[Long]("mad_cents") == mad, tok)
      assert(r.getAs[Long]("n_outliers") ==
        cents.count(c => math.abs(c - med) > graft.ops.Metrics.MadK * mad))
    }
  }

  test("dormancy: gap accounting on a hand-built history") {
    // one token; wallet w1 active at 0, 100, 700000 (one dormant gap);
    // wallet w2 active once (no gap)
    import org.apache.spark.sql.Row
    val rows = graft.ops.Forensics.dormancy(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") > 0)
      assert(r.getAs[Long]("n_reactivations") <= r.getAs[Long]("n_gaps"))
      assert(r.getAs[Double]("avg_gap_sec") <= r.getAs[Long]("max_gap_sec"))
    }
    // exact semantics on the sf0.001 data: recount gaps for one token
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "from_address", "to_address", "transact_at")
      .collect()
    val tok = rows.head.getString(0)
    val acts = t.filter(_.getString(0) == tok)
      .flatMap(x => Seq((x.getString(1), x.getLong(3)), (x.getString(2), x.getLong(3))))
      .distinct
      .groupBy(_._1).values
      .flatMap { ws =>
        val ts = ws.map(_._2).sorted
        ts.zip(ts.drop(1)).map { case (a, b) => b - a }
      }.toSeq
    assert(rows.head.getAs[Long]("n_gaps") == acts.length)
    assert(rows.head.getAs[Long]("n_reactivations") ==
      acts.count(_ > graft.ops.Forensics.DormantSec))
    assert(rows.head.getAs[Long]("max_gap_sec") == acts.max)
  }

  test("volume cross-correlation: every token pair present, corr in [-1,1], " +
    "and one pair matches the BigInt moment recount") {
    val rows = graft.ops.Metrics.volumeCrossCorr(spark, GraftSpark.Sf)
      .collect()
    val toks = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address").distinct().collect()
      .map(_.getString(0)).sorted
    assert(rows.length == toks.length * (toks.length - 1) / 2)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("corr"))) {
        val c = r.getAs[Double]("corr")
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
    // full recount of the first pair from raw transfers
    val (ta, tb) = (rows.head.getString(0), rows.head.getString(1))
    val raw = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "transact_at", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600 * 3600,
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    def grid(tok: String): Map[Long, BigInt] = {
      val hourly = raw.filter(_._1 == tok).groupBy(_._2)
        .view.mapValues(v => (v.map(_._3).sum * 100).toBigIntExact.get).toMap
      val (t0, t1) = (hourly.keys.min, hourly.keys.max)
      (t0 to t1 by 3600).map(t => t -> hourly.getOrElse(t, BigInt(0))).toMap
    }
    val (ga, gb) = (grid(ta), grid(tb))
    val ts = ga.keySet & gb.keySet
    val n = BigInt(ts.size)
    val sx = ts.toSeq.map(ga).sum; val sy = ts.toSeq.map(gb).sum
    val sxx = ts.toSeq.map(t => ga(t) * ga(t)).sum
    val syy = ts.toSeq.map(t => gb(t) * gb(t)).sum
    val sxy = ts.toSeq.map(t => ga(t) * gb(t)).sum
    val (num, d1, d2) = (n * sxy - sx * sy, n * sxx - sx * sx,
      n * syy - sy * sy)
    val expect =
      if (d1 == 0 || d2 == 0) None
      else Some(BigDecimal(num.toDouble
        / math.sqrt(d1.toDouble * d2.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val gotN = rows.head.getAs[Long]("n")
    assert(gotN == n.toLong)
    val gotCorr = if (rows.head.isNullAt(rows.head.fieldIndex("corr"))) None
      else Some(rows.head.getAs[Double]("corr"))
    assert(gotCorr.isDefined == expect.isDefined)
    for (g <- gotCorr; e <- expect) assert(math.abs(g - e) < 2e-6)
  }

  test("wow growth: weekly cents and signed truncated ppm recount") {
    val rows = graft.ops.Metrics.wowGrowth(spark, GraftSpark.Sf).collect()
    val weekly = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "transact_at", "value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 604800 * 604800),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view
      .mapValues(v => (v.map(_._2).sum * 100).toLongExact).toMap
    val byTok = rows.groupBy(_.getString(0))
    byTok.foreach { case (tok, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("week"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val c = r.getAs[Long]("cents")
        assert(c == weekly((tok, r.getAs[Long]("week"))))
        if (i == 0) assert(r.isNullAt(r.fieldIndex("prev_cents")))
        else {
          val prev = sorted(i - 1).getAs[Long]("cents")
          assert(r.getAs[Long]("prev_cents") == prev)
          val diff = c - prev
          val exp = if (prev == 0) None
            else Some(if (diff >= 0) diff * 1000000 / prev
              else -((-diff) * 1000000 / prev))
          val g = if (r.isNullAt(r.fieldIndex("growth_ppm"))) None
            else Some(r.getAs[Long]("growth_ppm"))
          assert(g == exp, s"$tok week ${r.getAs[Long]("week")}")
        }
      }
    }
    // negative growth exists somewhere — the sign path is exercised
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("growth_ppm")) &&
      r.getAs[Long]("growth_ppm") < 0))
  }

  test("max drawdown: top-k matches the per-wallet running recount") {
    val rows = graft.ops.Balances.maxDrawdown(spark, GraftSpark.Sf).collect()
    assert(rows.length <= graft.ops.Balances.DrawdownTopK && rows.nonEmpty)
    val hist = graft.ops.Balances.balanceHistory(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("balance")))
      .groupBy(_._1)
    val dd = hist.view.mapValues { rs =>
      val bs = rs.sortBy(_._2).map(_._3)
      val peaks = bs.scanLeft(Double.MinValue)(_ max _).tail
      (peaks.zip(bs).map { case (p, b) => p - b }.max, peaks.max)
    }.toMap
    val expectTop = dd.toSeq.sortBy { case (a, (d, _)) => (-d, a) }
      .take(graft.ops.Balances.DrawdownTopK)
    assert(rows.map(r => (r.getString(0), r.getAs[Double]("max_drawdown"),
      r.getAs[Double]("peak"))).toSeq ==
      expectTop.map { case (a, (d, p)) => (a, d, p) })
  }

  test("peak-to-average: exact rational ppm recount per token") {
    val rows = graft.ops.Metrics.peakToAverage(spark, GraftSpark.Sf)
      .collect()
    val hourly = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "transact_at", "value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 3600 * 3600),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view
      .mapValues(v => (v.map(_._2).sum * 100).toLongExact).toMap
    rows.foreach { r =>
      val tok = r.getString(0)
      val cs = hourly.collect { case ((t, _), c) if t == tok => c }.toSeq
      assert(r.getAs[Long]("n_hours") == cs.length)
      assert(r.getAs[Long]("peak_cents") == cs.max)
      assert(r.getAs[Long]("total_cents") == cs.sum)
      assert(r.getAs[Long]("par_ppm") ==
        (BigInt(cs.max) * cs.length * 1000000 / BigInt(cs.sum)).toLong)
      assert(r.getAs[Long]("par_ppm") >= 1000000) // peak >= average
    }
  }

  test("activity streaks: distribution matches the islands recount") {
    val rows = graft.ops.Metrics.activityStreaks(spark, GraftSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_wallets")).toMap
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "to_address", "transact_at").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 86400))
    val days = t.flatMap(x => Seq((x._1, x._3), (x._2, x._3))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def longest(ds: Seq[Long]): Long = {
      var best = 1L; var cur = 1L
      ds.zip(ds.tail).foreach { case (a, b) =>
        if (b == a + 1) { cur += 1; best = best max cur } else cur = 1
      }
      best
    }
    val expect = days.values.map(ds => longest(ds.toSeq)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(rows == expect)
    assert(rows.nonEmpty)
  }
}
