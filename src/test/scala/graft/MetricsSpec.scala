package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("wallet concentration: gini/hhi/top10 re-derive exactly in BigInt") {
    val got = graft.ops.Metrics.walletConcentration(spark, GraftSpark.Sf)
      .collect()
    assert(got.nonEmpty)
    val cents = Tables.transfers(spark, GraftSpark.Sf)
      .groupBy(col("contract_address"), col("from_address").as("w"))
      .agg((graft.ops.Num.dsumDec(col("value")) * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getString(1), r.getLong(2)))).toMap
    got.foreach { row =>
      val tok = row.getString(0)
      val xs = cents(tok).sortBy(x => (x._2, x._1)).map(x => BigInt(x._2))
      val n = BigInt(xs.length)
      val s = xs.sum
      assert(row.getAs[Long]("n_wallets") == xs.length)
      val si = xs.zipWithIndex.map { case (x, i0) => x * (i0 + 1) }.sum
      val giniExpect = (BigDecimal(2 * si - (n + 1) * s) /
        (BigDecimal(n) * BigDecimal(s)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getAs[Double]("gini") - giniExpect) < 2e-6, tok)
      val hhiExpect = (BigDecimal(xs.map(x => x * x).sum) /
        (BigDecimal(s) * BigDecimal(s)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getAs[Double]("hhi") - hhiExpect) < 2e-6, tok)
      val t10 = xs.takeRight(10).sum
      assert(BigInt(row.getAs[Long]("top10_pml")) == t10 * 1000 / s, tok)
      // bounds: gini in [0,1), hhi in (0,1], top10 share <= 1000
      assert(row.getAs[Double]("gini") >= 0.0 && row.getAs[Double]("gini") < 1.0)
      assert(row.getAs[Double]("hhi") > 0.0 && row.getAs[Double]("hhi") <= 1.0)
      assert(row.getAs[Long]("top10_pml") <= 1000L)
    }
  }

  test("incremental base-plus-delta merge equals the full recompute") {
    import graft.ops.Num
    val inc = graft.ops.Metrics.incrementalHourlyVolume(spark, GraftSpark.Sf)
      .collect().toSeq
    val full = graft.Tables.transfers(spark, GraftSpark.Sf)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).as("t"))
      .agg(Num.dsum(col("value")).as("volume"), count(lit(1)).as("tx_count"))
      .orderBy("contract_address", "t")
      .collect().toSeq
    // bit-identical, not approximately equal: decimal partials make the
    // split point and merge order irrelevant
    assert(inc == full)
  }

  test("decayed volume equals a BigDecimal reconvolution of the hourly series") {
    import org.apache.spark.sql.functions._
    val h = graft.ops.Metrics.DecayHorizonHours
    val hourly = Tables.transfers(spark, GraftSpark.Sf)
      .groupBy(col("contract_address"),
        (expr("transact_at div 3600") * 3600).as("t"))
      .agg(sum(col("value").cast("decimal(25,2)")).as("vol"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDecimal(2))
      .toMap
    val got = graft.ops.Metrics.decayedVolume(spark, GraftSpark.Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = r.getString(0); val t = r.getLong(1)
      val s = (0 to h).map { j =>
        Option(hourly.getOrElse((key, t - j * 3600L), null))
          .map(v => BigDecimal(v) * BigDecimal(1L << (h - j)))
          .getOrElse(BigDecimal(0))
      }.sum
      assert(r.getDouble(3) == s.toDouble / (1L << h).toDouble,
        s"$key@$t: ${r.getDouble(3)} vs $s/2^$h")
    }
  }

  test("volume anomalies: flagged hours are a sparse tail of the series") {
    import org.apache.spark.sql.functions._
    val flagged = graft.ops.Metrics.volumeAnomalies(spark, GraftSpark.Sf)
    val hv = graft.ops.Metrics.hourlyVolume(spark, GraftSpark.Sf)
    assert(!flagged.isEmpty)
    // Chebyshev: at |z| >= 2 no more than 1/4 of any token's hours flag
    val ratios = flagged.groupBy("contract_address")
      .agg(count(lit(1)).as("nf"))
      .join(hv.groupBy("contract_address").agg(count(lit(1)).as("nh")),
        Seq("contract_address"))
      .filter(col("nf").cast("double") > col("nh").cast("double") / 4.0)
    assert(ratios.isEmpty)
    // every flagged (token, hour) exists in the base series
    assert(flagged.select("contract_address", "t")
      .exceptAll(hv.select("contract_address", "t")).isEmpty)
  }

  test("HLL distinct counts stay within the configured error bound") {
    import spark.implicits._
    // rsd = 0.01 configured in hourlyUniqueWalletsApprox; assert every group
    // lands within 5× the rsd (≈5σ — a deterministic sketch either passes
    // this forever or is broken) of the exact count.
    val exact = graft.ops.Metrics.hourlyUniqueWallets(spark, GraftSpark.Sf)
      .withColumnRenamed("unique_wallets", "exact")
    val approx = graft.ops.Metrics.hourlyUniqueWalletsApprox(spark, GraftSpark.Sf)
      .withColumnRenamed("unique_wallets", "approx")
    val errs = exact.join(approx, Seq("contract_address", "t"))
      .select((abs(col("approx") - col("exact")).cast("double")
        / col("exact").cast("double")).as("rel_err"))
      .as[Double].collect()
    assert(errs.nonEmpty)
    val worst = errs.max
    assert(worst <= 0.05, s"worst HLL relative error $worst exceeds 5%")
  }

  test("approx percentiles stay close to the exact percentiles") {
    import spark.implicits._
    // percentile_approx(accuracy=1000) guarantees rank error <= n/1000 per
    // group; at test cardinalities assert each quantile within 2% relative
    // value error of the exact computation.
    val exact = graft.ops.Relational.orderPercentiles(spark, GraftSpark.Sf)
    val approx = graft.ops.Relational.orderPercentilesApprox(spark, GraftSpark.Sf)
    val joined = exact.alias("e").join(approx.alias("a"), "o_orderstatus")
      .select(col("e.p50"), col("a.p50"), col("e.p90"), col("a.p90"),
        col("e.p99"), col("a.p99"))
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (e50, a50, e90, a90, e99, a99) =>
      Seq((e50, a50), (e90, a90), (e99, a99)).foreach { case (e, a) =>
        assert(math.abs(a - e) / e <= 0.02, s"approx $a vs exact $e")
      }
    }
  }

  test("HLL sketch REAGGREGATION: hourly sketches union to the daily truth") {
    // the pre-aggregated-sketch-table pattern: store one small sketch per
    // (token, hour); answer any coarser rollup by MERGING sketches instead
    // of re-scanning the fact table — the distinct-count architecture that
    // makes 100 TB dashboards cheap. Datasketches HLL merge is lossless
    // w.r.t. the sketch state, so the merged estimate must stay inside the
    // same relative error band as a direct sketch.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select(col("contract_address"),
        expr("transact_at div 3600").as("hour"),
        expr("transact_at div 86400").as("day"),
        col("from_address"))
    val hourly = t.groupBy("contract_address", "day", "hour")
      .agg(expr("hll_sketch_agg(from_address)").as("sk"))
    val daily = hourly.groupBy("contract_address", "day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = t.groupBy("contract_address", "day")
      .agg(countDistinct("from_address").as("n"))
    val joined = daily.join(exact, Seq("contract_address", "day"))
      .select("n", "est").as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (n, est) =>
      assert(math.abs(est.toDouble - n) / n <= 0.05,
        s"merged estimate $est vs exact $n")
    }
  }

  test("skyline: no emitted order is dominated; every dropped one is") {
    val sky = graft.ops.Relational.orderSkyline(spark, GraftSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val all = graft.Tables.orders(spark, GraftSpark.Sf)
      .selectExpr("o_orderkey", "o_totalprice",
        "unix_timestamp(o_orderdate)")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominates(a: (Long, Double, Long), b: (Long, Double, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    val skySet = sky.map(_._1).toSet
    for (s <- sky; o <- all if o._1 != s._1)
      assert(!dominates(o, s), s"skyline ${s._1} dominated by ${o._1}")
    for (o <- all if !skySet(o._1))
      assert(all.exists(x => x._1 != o._1 && dominates(x, o))
        || sky.exists(s => s._2 == o._2 && s._3 == o._3),
        s"dropped ${o._1} is neither dominated nor a frontier tie")
  }

  test("weighted median: half the weight sits at or below it") {
    val rows = graft.ops.Relational.weightedMedianPrice(spark, GraftSpark.Sf)
      .collect()
    val items = graft.Tables.lineitem(spark, GraftSpark.Sf)
      .selectExpr("l_returnflag", "l_extendedprice",
        "CAST(l_quantity AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    for (r <- rows) {
      val flag = r.getString(0); val med = r.getDouble(1)
      val grp = items.filter(_._1 == flag)
      val tot = grp.map(_._3).sum
      assert(r.getAs[Long]("total_weight") == tot)
      val below = grp.filter(_._2 <= med).map(_._3).sum
      val above = grp.filter(_._2 >= med).map(_._3).sum
      assert(below * 2 >= tot, s"$flag: below=$below tot=$tot")
      assert(above * 2 >= tot, s"$flag: above=$above tot=$tot")
    }
  }

  test("community flow: volume mass is conserved through coarsening") {
    import graft.ops.Num
    val rows = graft.ops.Wallet.communityFlow(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    val totalFlow = rows.map(r => BigDecimal(r.getAs[Double]("volume"))).sum
    val raw = graft.Tables.transfers(spark, GraftSpark.Sf)
      .agg(Num.dsum(col("value"))).collect()(0).getDouble(0)
    assert((totalFlow - BigDecimal(raw)).abs < BigDecimal(0.01))
    assert(rows.map(_.getAs[Long]("n_transfers")).sum ==
      graft.Tables.transfers(spark, GraftSpark.Sf).count())
    for (r <- rows)
      assert(r.getAs[Boolean]("internal") ==
        (r.getAs[String]("c_src") == r.getAs[String]("c_dst")))
  }

  test("seasonal backtest: MAE reconciles with a raw holdout recompute") {
    import graft.ops.Num
    val rows = graft.ops.Metrics.seasonalBacktest(spark, GraftSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    val hourly = graft.Tables.transfers(spark, GraftSpark.Sf)
      .groupBy(col("contract_address").as("token"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg(Num.dsum(col("value")).as("vol"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val tmin = hourly.map(_._2).min; val tmax = hourly.map(_._2).max
    val cutoff = tmin + (tmax - tmin) * 4 / 5
    for (r <- rows) {
      val tok = r.getAs[String]("token")
      val train = hourly.filter(h => h._1 == tok && h._2 < cutoff)
      val test = hourly.filter(h => h._1 == tok && h._2 >= cutoff)
      assert(r.getAs[Long]("n_train") == train.length)
      assert(r.getAs[Long]("n_test") == test.length)
      def mean(xs: Array[Double]) = xs.map(BigDecimal(_)).sum.toDouble / xs.length
      val gm = mean(train.map(_._3))
      val prof = train.groupBy(h => (h._2 % 86400) / 3600).view
        .mapValues(hs => mean(hs.map(_._3))).toMap
      val errs = test.map { h =>
        math.abs(h._3 - prof.getOrElse((h._2 % 86400) / 3600, gm)) }
      val mae = errs.map(BigDecimal(_)).sum.toDouble / errs.length
      assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-6,
        s"$tok mae ${r.getAs[Double]("mae")} vs $mae")
    }
  }

  test("burst intervals: episodes are maximal runs of top-decile hours") {
    val bursts = graft.ops.Metrics.burstIntervals(spark, GraftSpark.Sf)
      .collect()
    assert(bursts.nonEmpty)
    val devs = graft.ops.Metrics.cusumDrift(spark, GraftSpark.Sf)
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("t"),
        math.abs(r.getAs[Long]("dev"))))
    for ((tok, rs) <- bursts.groupBy(_.getAs[String]("token"))) {
      val ds = devs.filter(_._1 == tok).map(d => (d._2, d._3)).sortBy(_._1)
      // exact p90 threshold from the |dev| distribution
      val sortedA = ds.map(_._2).sorted
      val thr = sortedA((9 * sortedA.length + 9) / 10 - 1)
      val flagged = ds.filter(d => d._2 >= thr && d._2 > 0).map(_._1).toSet
      // every burst hour is flagged, episodes don't touch (maximality)
      val covered = rs.flatMap(r =>
        (r.getAs[Long]("burst_start") to r.getAs[Long]("burst_end") by 3600)
          .filter(flagged)).toSet
      assert(covered == flagged, s"$tok: coverage mismatch")
      val sorted = rs.sortBy(_.getAs[Long]("burst_start"))
      for (w <- sorted.sliding(2) if w.length == 2)
        assert(w(1).getAs[Long]("burst_start") >
          w(0).getAs[Long]("burst_end") + 3600,
          s"$tok: adjacent episodes should have merged")
    }
  }

  test("market share: shares sum to 1 per hour") {
    val rows = graft.ops.Metrics.hourlyMarketShare(spark, GraftSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_.getAs[Long]("t"))) {
      val s = rs.map(r => BigDecimal(r.getAs[Double]("share"))).sum
      assert((s - 1).abs < BigDecimal(1e-9))
      val vols = rs.map(r => BigDecimal(r.getAs[Double]("volume"))).sum
      for (r <- rs)
        assert(math.abs(r.getAs[Double]("share") -
          r.getAs[Double]("volume") / vols.toDouble) < 1e-12)
    }
  }

  test("cusum: dev recomputes from raw cumulative counts, final dev = 0") {
    val rows = graft.ops.Metrics.cusumDrift(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    val byTok = rows.groupBy(_.getAs[String]("token"))
    for ((_, rs) <- byTok) {
      val ordered = rs.sortBy(_.getAs[Long]("t"))
      val xs = ordered.map(_.getAs[Long]("x"))
      val s = xs.sum; val n = xs.length.toLong
      var cum = 0L
      for ((r, i) <- ordered.zipWithIndex) {
        cum += xs(i)
        val dev = n * cum - (i + 1).toLong * s
        assert(r.getAs[Long]("dev") == dev)
        assert(r.getAs[Boolean]("drift") ==
          (math.abs(dev) * graft.ops.Metrics.CusumDenom > n * s))
      }
      assert(ordered.last.getAs[Long]("dev") == 0L)
    }
  }

  test("rfm: bands are metric-monotone tertiles and compose the segment code") {
    val rows = graft.ops.Wallet.rfmSegments(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (rb, fb, mb) = (r.getAs[Int]("r_band"), r.getAs[Int]("f_band"),
        r.getAs[Int]("m_band"))
      assert(rb >= 1 && rb <= graft.ops.Wallet.RfmBands)
      assert(fb >= 1 && fb <= graft.ops.Wallet.RfmBands)
      assert(mb >= 1 && mb <= graft.ops.Wallet.RfmBands)
      assert(r.getAs[Int]("rfm") == rb * 100 + fb * 10 + mb)
    }
    // monotone: a strictly larger metric value never lands in a lower band
    def mono(metric: String, band: String): Unit = {
      val pairs = rows.map(r =>
        (BigDecimal(r.getAs[Any](metric).toString), r.getAs[Int](band)))
      for (w <- pairs.sortBy(_._1).sliding(2) if w.length == 2
           && w(0)._1 < w(1)._1)
        assert(w(0)._2 <= w(1)._2,
          s"$metric ${w(0)._1}->${w(1)._1} band ${w(0)._2}->${w(1)._2}")
    }
    mono("rec_days", "r_band"); mono("freq", "f_band"); mono("volume", "m_band")
  }

  test("seasonal decomposition reconstructs exactly and means recompute") {
    val rows = graft.ops.Metrics.seasonalDecompose(spark, GraftSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    // volume = trend + seasonal + residual, bit-exact by construction
    for (r <- rows) {
      val (v, t, s, res) = (r.getAs[Double]("volume"), r.getAs[Double]("trend"),
        r.getAs[Double]("seasonal"), r.getAs[Double]("residual"))
      assert(res == v - t - s)
    }
    // seasonal is the exact per-(token, hour-of-day) mean of hourly volume
    val byKey = rows.groupBy(r =>
      (r.getAs[String]("token"), (r.getAs[Long]("t") % 86400) / 3600))
    for (((tok, hod), rs) <- byKey) {
      val vols = rs.map(r => BigDecimal(r.getAs[Double]("volume"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val mean = (vols.sum.toDouble) / vols.length.toDouble
      assert(rs.forall(_.getAs[Double]("seasonal") == mean),
        s"seasonal mismatch for ($tok, $hod)")
    }
  }

  test("top supplier: exactly the argmax suppliers of the exact-decimal " +
    "quarterly revenue recount") {
    val rows = graft.ops.Relational.topSupplier(spark, GraftSpark.Sf)
      .collect()
    val t0 = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val t1 = java.time.LocalDateTime.parse("1996-04-01T00:00:00")
    val rev = Tables.lineitem(spark, GraftSpark.Sf)
      .select("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .collect()
      .filter { r =>
        val d = r.getAs[java.time.LocalDateTime]("l_shipdate")
        !d.isBefore(t0) && d.isBefore(t1)
      }
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => BigDecimal(
        r.getDouble(1) * (1.0 - r.getDouble(2)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum)
      .toMap
    assert(rev.nonEmpty)
    val mx = rev.values.max
    val expectKeys = rev.filter(_._2 == mx).keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expectKeys)
    rows.foreach(r => assert(
      math.abs(r.getAs[Double]("total_revenue") - mx.toDouble) < 1e-6))
  }

  test("props extract: per-type stats match the regex-parsed recount") {
    val rows = graft.sources.JsonRegistry.propsExtract(spark, GraftSpark.Sf)
      .collect()
    val K = """"k":\s*(-?\d+)""".r
    val raw = Tables.events(spark, GraftSpark.Sf)
      .select("event_type", "props").collect()
      .map(r => (r.getString(0),
        K.findFirstMatchIn(r.getString(1)).map(_.group(1).toLong)))
    val byType = raw.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet == byType.keySet)
    rows.foreach { r =>
      val (n, ks) = (byType(r.getString(0)).length,
        byType(r.getString(0)).flatMap(_._2))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("k_sum") == ks.sum)
      assert(r.getAs[Long]("k_min") == ks.min)
      assert(r.getAs[Long]("k_max") == ks.max)
    }
  }

  test("late orders: priority counts match the exists re-derivation") {
    val got = graft.ops.Relational.lateOrders(spark, GraftSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    val ship = Tables.lineitem(spark, GraftSpark.Sf)
      .select("l_orderkey", "l_shipdate").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[java.time.LocalDateTime](1)).max).toMap
    val expect = Tables.orders(spark, GraftSpark.Sf)
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .filter { r =>
        ship.get(r.getLong(0)).exists(_.isAfter(
          r.getAs[java.time.LocalDateTime](1)
            .plusDays(graft.ops.Relational.LateShipDays)))
      }
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("lateness profile: running high-water-mark recount and exact p95 " +
    "order statistic") {
    val got = graft.ops.Metrics.latenessProfile(spark, GraftSpark.Sf)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_out_of_order"), r.getAs[Long]("max_lateness_sec"),
        r.getAs[Long]("p95_lateness_sec"))).toMap
    val byTok = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "block_number", "transact_at").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expect = byTok.view.mapValues { rows =>
      val seq = rows.sortBy(_._2)
      val lates = seq.scanLeft(Long.MinValue) { (hi, r) => hi max r._3 }
        .tail.zip(seq).map { case (hi, r) => hi - r._3 }
      val sorted = lates.sorted
      val p95 = sorted((19 * seq.length + 19) / 20 - 1)
      (seq.length.toLong, lates.count(_ > 0).toLong, lates.max, p95)
    }.toMap
    assert(got == expect)
  }

  test("largest transfers: per-token top-k matches the sort recount") {
    val got = graft.ops.Metrics.largestTransfers(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("rnk"),
        r.getAs[Long]("block_number"), r.getAs[Double]("value")))
    val expect = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "block_number", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .flatMap { case (tok, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(graft.ops.Metrics.LargestK)
          .zipWithIndex.map { case (r, i) => (tok, i + 1L, r._2, r._3) }
      }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == expect)
  }

  test("incremental join view: merged delta terms equal the direct full " +
    "join recompute") {
    val got = graft.ops.Relational.incrementalJoinView(spark, GraftSpark.Sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("tx_volume"), r.getAs[Double]("tick_volume")))).toMap
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "block_number", "transact_at", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2) / 3600 * 3600,
        BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val aG = t.filter(_._2 % 5 != 0).groupBy(x => (x._1, x._3))
    val bG = t.filter(_._2 % 5 == 0).groupBy(x => (x._1, x._3))
    val expect = (aG.keySet & bG.keySet).map { k =>
      val (as, bs) = (aG(k), bG(k))
      k -> (as.length.toLong * bs.length,
        (as.map(_._4).sum * bs.length).toDouble,
        (bs.map(_._4).sum * as.length).toDouble)
    }.toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (n, tx, tk)) =>
      val (en, etx, etk) = expect(k)
      assert(n == en, s"$k")
      assert(math.abs(tx - etx) < 1e-9, s"$k")
      assert(math.abs(tk - etk) < 1e-9, s"$k")
    }
  }

  test("seasonal outliers: flags are exactly the beyond-K-MAD residuals") {
    val rows = graft.ops.Metrics.seasonalOutliers(spark, GraftSpark.Sf)
      .collect()
    val res = graft.ops.Metrics.seasonalDecompose(spark, GraftSpark.Sf)
      .select("token", "t", "residual").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(((s.length + 1) / 2 - 1).max(0))
    }
    val expect = res.toSeq.flatMap { case (tok, rs) =>
      val med = lowerMedian(rs.toSeq.map(_._3))
      val mad = lowerMedian(rs.toSeq.map(x => math.abs(x._3 - med)))
      rs.toSeq.filter(x => math.abs(x._3 - med) >
          graft.ops.Metrics.SeasonalMadK * mad)
        .map(x => (tok, x._2, x._3, med, mad))
    }.toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))).toSet == expect)
    assert(rows.nonEmpty)
  }

  test("wallet diversity: impurity recounts as exact rational ppm") {
    val rows = graft.ops.Metrics.walletDiversity(spark, GraftSpark.Sf)
      .collect()
    val byWallet = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "contract_address").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet == byWallet.keySet)
    rows.foreach { r =>
      val ts = byWallet(r.getString(0)).map(_._2)
      val cs = ts.groupBy(identity).values.map(_.length.toLong)
      val n = BigInt(ts.length)
      assert(r.getAs[Long]("n_events") == ts.length)
      assert(r.getAs[Long]("n_types") == cs.size)
      val imp = (n * n - cs.map(c => BigInt(c) * c).sum) * 1000000 / (n * n)
      assert(r.getAs[Long]("impurity_ppm") == imp.toLong, r.getString(0))
    }
  }

  test("watermark tuning: exact local recount of the global high-water " +
    "drop counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = graft.ops.Metrics.watermarkTuning(spark, GraftSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == graft.ops.Metrics.WatermarkDelays)
    // sequential truth: running max of event time in global block order
    val ev = Tables.transfers(spark, GraftSpark.Sf)
      .select(col("block_number"), col("transact_at"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    var hwm = Long.MinValue
    val lates = ev.map { case (_, ts) =>
      hwm = math.max(hwm, ts); hwm - ts
    }
    for ((delay, n, ooo, dropped, ppm) <- got) {
      assert(n == lates.size)
      assert(ooo == lates.count(_ > 0))
      assert(dropped == lates.count(_ > delay), s"delay=$delay")
      assert(ppm == lates.count(_ > delay).toLong * 1000000L / lates.size)
    }
    // a longer delay can only keep more
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
    // the driver feed is perfectly ordered (a truthful all-zero answer);
    // drive the same core over a genuinely out-of-order stream and
    // recount sequentially
    val disordered = (1L to 400L).map { b =>
      // event time jitters up to 1200s behind a rising front
      (b, 10000L + b * 10L - (b * 37L % 4L) * 400L)
    }
    val dGot = graft.ops.Metrics.watermarkTuningOf(spark,
        disordered.toDF("b", "ts"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    var h2 = Long.MinValue
    val l2 = disordered.sortBy(_._1).map { case (_, ts) =>
      h2 = math.max(h2, ts); h2 - ts
    }
    assert(l2.count(_ > 600L) > 0, "spec stream must actually drop rows")
    for ((delay, n, ooo, dropped, ppm) <- dGot) {
      assert(n == l2.size && ooo == l2.count(_ > 0))
      assert(dropped == l2.count(_ > delay), s"delay=$delay")
      assert(ppm == l2.count(_ > delay).toLong * 1000000L / l2.size)
    }
  }

  test("tpch q10/q14: returned revenue recounts; promo share is the " +
    "exact floor chain of its own sums") {
    import org.apache.spark.sql.functions._
    val top = graft.ops.Relational.returnedItems(spark, GraftSpark.Sf)
      .collect()
    assert(top.length == graft.ops.Relational.ReturnedTopK)
    val revs = top.map(_.getAs[Double]("revenue"))
    assert(revs.toSeq == revs.sorted.reverse.toSeq)
    // recount the leader's revenue straight off the fact tables
    val leader = top.head.getAs[Long]("c_custkey")
    val expect = Tables.lineitem(spark, GraftSpark.Sf)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, GraftSpark.Sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") === leader)
      .agg(graft.ops.Num.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8))
      .head().getDouble(0)
    assert(top.head.getAs[Double]("revenue") == expect)
    val months = graft.ops.Relational.promoRevenue(spark, GraftSpark.Sf)
      .collect()
    assert(months.nonEmpty)
    for (m <- months) {
      val (p, t) = (m.getAs[Double]("promo_revenue"),
        m.getAs[Double]("total_revenue"))
      assert(p >= 0.0 && p <= t)
      assert(m.getAs[Long]("promo_ppm") ==
        math.floor(p * 1000000.0 / t).toLong)
    }
  }

  test("olsTrend: BigInt sufficient-statistics recount reproduces " +
    "slope/intercept/r2 renderings") {
    val hourly = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "transact_at", "value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 3600 * 3600),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum * 100).toBigInt).toMap
    // truncating signed division: Spark div / abs-wrapped DuckDB //
    def tdiv(a: BigInt, b: BigInt): BigInt =
      if (a < 0) -((-a) / b) else a / b
    val expect = hourly.groupBy(_._1._1).view.mapValues { h =>
      val t0 = h.keys.map(_._2).min
      val pts = h.toSeq.map { case ((_, t), y) =>
        (BigInt((t - t0) / 3600), y) }
      val n = BigInt(pts.size)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      (n.toLong,
        tdiv(num * 1000000, den).toLong,
        tdiv((sy * den - num * sx) * 1000000, n * den).toLong,
        if (deny == 0) None
        else Some(((num.abs * 1000000 / den) * num.abs / deny).toLong))
    }.filter(_._2._1 >= 2L).toMap
    val got = graft.ops.Metrics.olsTrend(spark, GraftSpark.Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // r2 is a proportion in ppm
    got.values.flatMap(_._4).foreach(r2 => assert(r2 >= 0L && r2 <= 1000000L))
  }

  test("orderCountDistribution: zero-order customers populate the " +
    "largest bucket (Q13 LEFT-join semantics)") {
    val custs = Tables.customer(spark, GraftSpark.Sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val perCust = Tables.orders(spark, GraftSpark.Sf)
      .select("o_custkey", "o_orderpriority").collect()
      .filter(!_.getString(1).startsWith(
        graft.ops.Relational.Q13ExcludedPriorityPrefix))
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val expect = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = graft.ops.Relational.orderCountDistribution(
        spark, GraftSpark.Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the LEFT-join contract: every customer lands in exactly one bucket
    // (an inner join would silently shrink the total by the zero-order
    // customers; this data has none at sf0.001, so the sum IS the check)
    assert(got.values.sum == custs.length.toLong)
  }
}
