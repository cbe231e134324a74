package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[tools.BenchFloors]] contract the elevated-minimum detector
  * rides on: the checked-in resource parses, covers the catalog, carries
  * the `_calib` yardstick, and a missing resource degrades to an empty
  * map (detector no-ops) rather than throwing. */
class BenchFloorsSpec extends AnyFunSuite {

  test("checked-in floor table parses and covers the whole catalog") {
    val floors = tools.BenchFloors.load()
    assert(floors.nonEmpty, "bench_floors.tsv resource must be present")
    // the controlled session's calib mean rides along for two-yardstick
    // elevation records
    assert(floors.contains("_calib"))
    assert(floors("_calib") > 0.1 && floors("_calib") < 5.0,
      s"calib ${floors("_calib")} outside any plausible probe range")
    // every catalog query has a floor (regenerate after catalog changes),
    // and every floor is a positive steady-state seconds value
    val missing = SparkEntry.queries.keySet -- floors.keySet
    assert(missing.isEmpty, s"queries without floors: $missing")
    val bad = floors.filter { case (_, v) => v <= 0 || v > 600 }
    assert(bad.isEmpty, s"implausible floors: $bad")
  }

  test("floors are steady-state scale: no floor claims under 10ms") {
    // a sub-10ms floor would make the 2x elevation gate fire on pure
    // scheduling noise; ElevatedMinSec guards the detector, but the
    // table itself should never carry such a value for a Spark query
    val floors = tools.BenchFloors.load() - "_calib"
    assert(floors.values.forall(_ >= 0.01))
  }
}
