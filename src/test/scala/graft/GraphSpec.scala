package graft

import graft.ops.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("connected components: chain, pair, triangle collapse to min ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: a long path needs diameter rounds and converges") {
    val n = 9L
    val edges = (1L until n).map(i => (i + 1, i)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 1L))
  }

  test("result is independent of input partitioning") {
    val edges = Seq((5L, 3L), (3L, 8L), (8L, 1L), (100L, 42L)).toDF("src", "dst")
    val a = Graph.connectedComponents(edges.repartition(1))
      .as[(Long, Long)].collect().toSet
    val b = Graph.connectedComponents(edges.repartition(7))
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a == Set((1L, 1L), (3L, 1L), (5L, 1L), (8L, 1L),
      (42L, 42L), (100L, 42L)))
  }
}
