package graft.tools

/** Per-query EXPECTED-MIN floor table for [[graft.Bench]]'s
  * elevated-minimum detector (round-11 verdict directive #1).
  *
  * Round 10 proved a diagnostic hole: `warm_anomalies` only fires when a
  * NON-FIRST pass exceeds 2× the query's own session min, so a query whose
  * every pass is slow — an ELEVATED MINIMUM, the exact shape of the
  * driver-session five (q_join_cardinality 7.85 s vs 1.70 s controlled,
  * same code, faster calib probe) — sails through unattributed. The fix
  * needs an expectation EXTERNAL to the session: this table, the per-query
  * steady-state mins of a controlled builder session (Bench alone on an
  * otherwise idle box), checked into the repo. When a session min exceeds
  * [[graft.Bench.ElevatedMinRatio]]× its floor, Bench captures the same
  * evidence bundle warm anomalies get (at-the-moment calib probe, GC
  * fraction) PLUS the [[StageAudit]] stage/task breakdown of the best
  * pass, emitted under `elevated_minima` in BENCH_DETAIL.
  *
  * Format (`bench_floors.tsv` resource): `#`-comment provenance header,
  * then `name<TAB>floor_seconds` lines. The pseudo-entry `_calib` records
  * the controlled session's [[CalibProbe]] mean so elevation records can
  * show BOTH yardsticks. Regenerate with `scripts/make_floors.py` from a
  * controlled BENCH_DETAIL.json whenever query code or the catalog
  * changes — a stale floor fires a false elevation (annoying but loud)
  * rather than masking a real one, the right failure direction. */
object BenchFloors {
  val Resource = "/bench_floors.tsv"

  /** Numeric scale factor parsed from an sf-dir path (`…/sf0.1` → 0.1);
    * None when the path carries no `sf<number>` segment (e.g. a ScaleGen
    * output dir like `/tmp/scale100ev`). The floor table's `_sf`
    * pseudo-entry (written by `scripts/make_floors.py`) is compared
    * against this at Bench startup: floors measured at one scale are
    * meaningless expectations at another — a mismatch (or an
    * unparseable dir) disables the elevated-minimum check instead of
    * firing a mass false elevation that pays the 2 s straggler poll per
    * query and floods BENCH_DETAIL. */
  private val SfPattern = "sf([0-9]+(?:\\.[0-9]+)?)".r
  def sfOf(dir: String): Option[Double] =
    SfPattern.findAllMatchIn(dir).toSeq.lastOption
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)

  /** name → controlled floor seconds (incl. the `_calib` pseudo-entry);
    * empty when the resource is absent (elevation checks then no-op). */
  def load(): Map[String, Double] = {
    val in = getClass.getResourceAsStream(Resource)
    if (in == null) return Map.empty
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split('\t') match {
            case Array(n, v) => scala.util.Try(n -> v.toDouble).toOption
            case _ => None
          }
        }.toMap
    } finally in.close()
  }
}
