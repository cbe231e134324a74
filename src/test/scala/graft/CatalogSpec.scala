package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the driver-facing catalog. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("catalog names are unique") {
    val names = Catalog.entries.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, GraftSpark.Sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
