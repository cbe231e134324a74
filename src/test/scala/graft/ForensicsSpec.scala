package graft

import org.scalatest.funsuite.AnyFunSuite

/** Re-derives the [[graft.ops.Forensics]] screens in plain Scala on the
  * sf0.001 transfers (1k rows) — the DuckDB oracle verifies the same
  * queries at catalog level; here the semantics are checked structurally. */
class ForensicsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private lazy val transfers: Seq[(String, String, String, Long, Double, Long)] =
    Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "from_address", "to_address",
        "block_number", "value", "transact_at")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq

  test("wash trading: one summary row matching the pairwise re-derivation") {
    val rows = graft.ops.Forensics.washTrading(spark, GraftSpark.Sf).collect()
    assert(rows.length == 1)
    val w = graft.ops.Forensics.WashWindowSec
    val rts = for {
      f <- transfers
      r <- transfers
      if f._1 == r._1 && f._2 == r._3 && f._3 == r._2
      if r._4 > f._4 && r._6 >= f._6 && r._6 <= f._6 + w
    } yield (f._1, Ordering[String].min(f._2, f._3),
      Ordering[String].max(f._2, f._3), f._5 min r._5)
    assert(rows(0).getAs[Long]("n_roundtrips") == rts.length)
    assert(rows(0).getAs[Long]("n_pairs") ==
      rts.map(x => (x._1, x._2, x._3)).distinct.length)
    val vol = rts.map(x => BigDecimal(x._4).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(rows(0).getAs[Double]("washed_volume") - vol.toDouble) < 1e-9)
  }

  test("airdrop fanout: every flagged sender-day has >= threshold distinct " +
    "receivers, and the flags match the re-derivation") {
    val got = graft.ops.Forensics.airdropFanout(spark, GraftSpark.Sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getAs[Long]("n_recipients"), r.getAs[Long]("n_tx")))).toMap
    val expect = transfers
      .groupBy(t => (t._2, t._6 / 86400 * 86400))
      .view.mapValues(ts =>
        (ts.map(_._3).distinct.length.toLong, ts.length.toLong))
      .filter(_._2._1 >= graft.ops.Forensics.FanoutMinRecipients)
      .toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("relay chains: per-relay counts match the pairwise re-derivation") {
    val got = graft.ops.Forensics.relayChains(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), (r.getAs[Long]("n_chains"),
        r.getAs[Long]("n_endpoint_pairs")))).toMap
    val w = graft.ops.Forensics.RelayWindowSec
    val chains = for {
      i <- transfers
      o <- transfers
      if i._3 == o._2 // relay: in-leg to == out-leg from
      if o._4 > i._4 && o._6 >= i._6 && o._6 <= i._6 + w && i._2 != o._3
    } yield (i._3, i._2, o._3)
    val expect = chains.groupBy(_._1).view.mapValues(cs =>
      (cs.length.toLong, cs.map(c => (c._2, c._3)).distinct.length.toLong))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("new vs returning: per-token news sum to the distinct wallet count; " +
    "new + returning covers every active wallet-hour") {
    val got = graft.ops.Forensics.newVsReturning(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_returning")))
    val active = transfers.flatMap(t => Seq(
      (t._1, t._2, t._6 / 3600 * 3600), (t._1, t._3, t._6 / 3600 * 3600)))
      .distinct
    // total new per token == distinct wallets ever active for that token
    val newByTok = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val walletsByTok = active.map(a => (a._1, a._2)).distinct
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(newByTok == walletsByTok)
    // every (token, hour) bucket's new+returning == active wallets that hour
    val activeByBucket = active.groupBy(a => (a._1, a._3))
      .view.mapValues(_.length.toLong).toMap
    got.foreach { case (tok, t, nNew, nRet) =>
      assert(nNew + nRet == activeByBucket((tok, t)), s"$tok/$t")
    }
    assert(got.map(g => (g._1, g._2)).toSet == activeByBucket.keySet)
  }

  test("benford: digit counts match the exact-cents recount, shares are " +
    "floor per-mille of the total") {
    val rows = graft.ops.Forensics.benford(spark, GraftSpark.Sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val digits = transfers
      .map(t => (BigDecimal(t._5).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * 100).toLongExact)
      .filter(_ > 0)
      .map(_.toString.head.asDigit.toLong)
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = digits.length.toLong
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      val n = counts.getOrElse(d, 0L)
      assert(r.getAs[Long]("n") == n, s"digit $d")
      assert(r.getAs[Long]("share_pml") == n * 1000 / total, s"digit $d")
      assert(r.getAs[Long]("dev_pml") ==
        math.abs(n * 1000 / total - r.getAs[Long]("benford_pml")))
    }
    assert(total > 0)
  }

  test("circular triples: per-token cycle counts match the chained " +
    "re-derivation") {
    val got = graft.ops.Forensics.circularTriples(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), (r.getAs[Long]("n_cycles"),
        r.getAs[Long]("n_initiators"), r.getAs[Long]("n_relays")))).toMap
    val w = graft.ops.Forensics.CycleWindowSec
    // out-edge index on (token, sender) keeps the re-derivation near-linear
    val bySender = transfers.groupBy(t => (t._1, t._2)).withDefaultValue(Nil)
    val cycles = for {
      x <- transfers
      if x._2 != x._3
      y <- bySender((x._1, x._3))
      if y._4 > x._4 && y._6 >= x._6 && y._6 <= x._6 + w
      if y._3 != x._3 && y._3 != x._2 // c distinct from b and a
      z <- bySender((x._1, y._3))
      if z._3 == x._2 // closes back to a
      if z._4 > y._4 && z._6 >= y._6 && z._6 <= x._6 + w
    } yield (x._1, x._2, x._3)
    val byTok = cycles.groupBy(_._1)
    // densified: every observed token reports, clean ones as zeros
    val expect = transfers.map(_._1).distinct.map { tok =>
      val cs = byTok.getOrElse(tok, Nil)
      tok -> (cs.length.toLong, cs.map(_._2).distinct.length.toLong,
        cs.map(_._3).distinct.length.toLong)
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("co-holders: pair intersections and jaccard match the set recount") {
    val got = graft.ops.Wallet.coHolders(spark, GraftSpark.Sf).collect()
      .map(r => ((r.getAs[String]("tok_a"), r.getAs[String]("tok_b")),
        (r.getAs[Long]("n_common"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("jaccard_pml")))).toMap
    val held = transfers.flatMap(t => Seq((t._1, t._2), (t._1, t._3))).toSet
    val toks = held.map(_._1).toSeq.sorted
    val aud = toks.map(t => t -> held.collect {
      case (tok, w) if tok == t => w }).toMap
    val expect = (for {
      a <- toks; b <- toks if a < b
      common = (aud(a) & aud(b)).size.toLong if common > 0
    } yield ((a, b), (common, aud(a).size.toLong, aud(b).size.toLong,
      common * 1000 / (aud(a).size + aud(b).size - common)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("association rules: support/confidence/lift match the set recount " +
    "in exact ppm") {
    val got = graft.ops.Wallet.assocRules(spark, GraftSpark.Sf).collect()
      .map(r => ((r.getAs[String]("tok_x"), r.getAs[String]("tok_y")),
        (r.getAs[Long]("n_common"), r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_ppm")))).toMap
    val held = transfers.flatMap(t => Seq((t._1, t._2), (t._1, t._3))).toSet
    val toks = held.map(_._1).toSeq.sorted
    val aud = toks.map(t => t -> held.collect {
      case (tok, w) if tok == t => w }).toMap
    val nWallets = held.map(_._2).size.toLong
    val expect = (for {
      x <- toks; y <- toks if x != y
      common = (aud(x) & aud(y)).size.toLong if common > 0
    } yield ((x, y), (common, common * 1000000 / nWallets,
      common * 1000000 / aud(x).size,
      common * nWallets * 1000000 / (aud(x).size.toLong * aud(y).size))))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("flow imbalance: top pairs match the exact-decimal pair recount") {
    val got = graft.ops.Forensics.flowImbalance(spark, GraftSpark.Sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getAs[Double]("gross"), r.getAs[Double]("net"),
          r.getAs[Long]("imbalance_pml"), r.getAs[Long]("n_tx"))))
    def cents(v: Double) = BigDecimal(v).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)
    val pairs = transfers.filter(t => t._2 != t._3)
      .groupBy(t => (t._1, Ordering[String].min(t._2, t._3),
        Ordering[String].max(t._2, t._3)))
      .view.mapValues { ts =>
        val gross = ts.map(t => cents(t._5)).sum
        val net = ts.map(t =>
          if (t._2 < t._3) cents(t._5) else -cents(t._5)).sum
        (gross, net, ts.length.toLong)
      }.toMap
    val expect = pairs.toSeq
      .sortBy { case (k, (g, _, _)) => (-g, k._1, k._2, k._3) }
      .take(graft.ops.Forensics.ImbalanceTopK)
      .map { case (k, (g, n, c)) =>
        (k, (g.toDouble, n.toDouble,
          ((n.abs * 100000).toBigInt / (g * 100).toBigInt).toLong, c))
      }
    assert(got.toSeq == expect)
  }

  test("tx size histogram: log2 buckets partition the cents exactly") {
    val rows = graft.ops.Forensics.txSizeHistogram(spark, GraftSpark.Sf)
      .collect()
    val cents = transfers.map(t => (t._1,
      (BigDecimal(t._5).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * 100).toLongExact)).filter(_._2 > 0)
    val expect = cents.groupBy { case (tok, c) =>
        (tok, (63 - java.lang.Long.numberOfLeadingZeros(c)).toLong) }
      .view.mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getAs[Long]("bucket"))
      assert((r.getAs[Long]("n_tx"), r.getAs[Long]("total_cents"))
        == expect(k), k)
      assert(r.getAs[Long]("lo_cents") == (1L << k._2))
    }
  }

  test("activity histogram: day counts partition the wallet population") {
    val rows = graft.ops.Forensics.activityHistogram(spark, GraftSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_wallets")).toMap
    val perWallet = transfers
      .flatMap(t => Seq((t._2, t._6 / 86400 * 86400),
        (t._3, t._6 / 86400 * 86400)))
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect = perWallet.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(rows == expect)
    assert(rows.values.sum == perWallet.size)
  }

  test("dapp funnel: audiences and purchase conversion recount") {
    val got = graft.ops.Dapps.dappFunnel(spark, GraftSpark.Sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_audience"),
        r.getAs[Long]("n_purchasers"), r.getAs[Long]("purchase_pml"))).toMap
    val reg = Tables.DappRegistry
      .flatMap { case (id, _, as) => as.map(a => a -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val buyers = transfers.filter(_._1 == "purchase").map(_._2).toSet
    val aud = transfers.flatMap(t =>
        reg.getOrElse(t._3, Nil).map(d => (d, t._2)) ++
        reg.getOrElse(t._2, Nil).map(d => (d, t._3)))
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = aud.map { case (d, ws) =>
      val np = ws.count(buyers).toLong
      d -> (ws.size.toLong, np, np * 1000 / ws.size)
    }
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("bot score: components recount and the composite is their weighted " +
    "sum") {
    val rows = graft.ops.Forensics.botScore(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty &&
      rows.length <= graft.ops.Forensics.BotTopK)
    val w = graft.ops.Forensics.WashWindowSec
    val bySender = transfers.groupBy(_._2)
    rows.foreach { r =>
      val wal = r.getString(0)
      val rt = (for {
        x <- bySender.getOrElse(wal, Nil)
        y <- transfers
        if y._1 == x._1 && y._2 == x._3 && y._3 == x._2
        if y._4 > x._4 && y._6 >= x._6 && y._6 <= x._6 + w
      } yield 1).size.toLong
      assert(r.getAs[Long]("round_trips") == rt, s"$wal rt")
      val fd = bySender(wal).groupBy(_._6 / 86400 * 86400)
        .count(_._2.map(_._3).distinct.size >=
          graft.ops.Forensics.FanoutMinRecipients)
      assert(r.getAs[Long]("fanout_days") == fd, s"$wal fd")
      val ts = bySender(wal).sortBy(t => (t._6, t._4)).map(_._6)
      val nb = ts.zip(ts.tail).count { case (a, b) =>
        b - a < graft.ops.Behavior.ThrottleSec }
      assert(r.getAs[Long]("burst_pml") == nb.toLong * 1000 / ts.length)
      assert(r.getAs[Long]("bot_score") ==
        rt * graft.ops.Forensics.BotRtWeight +
        fd * graft.ops.Forensics.BotFanoutWeight +
        r.getAs[Long]("burst_pml"))
    }
  }

  test("mergeIntervals: plain-Scala interval-union recount; coverage " +
    "bounded by raw span sum") {
    val L = graft.ops.Forensics.IntervalLenSec
    val byWallet = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "transact_at").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val expect = byWallet.map { case (w, ts) =>
      var merged = List.empty[(Long, Long)] // reversed (start, end)
      ts.foreach { t =>
        merged = merged match {
          case (s0, e0) :: rest if t <= e0 =>
            (s0, math.max(e0, t + L)) :: rest
          case m => (t, t + L) :: m
        }
      }
      (w, (ts.size.toLong, merged.size.toLong,
        merged.map(iv => iv._2 - iv._1).sum))
    }
    val got = graft.ops.Forensics.mergeIntervals(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // union coverage never exceeds the raw span sum, and something merged
    got.values.foreach { case (n, m, cov) =>
      assert(cov <= n * L && m <= n && cov >= L)
    }
    assert(got.values.exists { case (n, m, _) => m < n })
  }
}
