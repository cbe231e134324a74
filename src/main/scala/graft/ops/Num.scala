package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric / time-bucket helpers shared by all operators.
  *
  * Determinism note: the engine's correctness gate hash-compares results
  * against a DuckDB oracle, so every floating-point aggregate must be
  * independent of partition count and evaluation order. Double sums are
  * routed through exact DECIMAL accumulation and only rendered back to
  * DOUBLE at the end ([[dsum]]); time bucketing uses the same floor
  * arithmetic the oracle SQL spells out ([[graft.Oracle]]).
  */
object Num {

  /** Exact, order-independent sum of a double column, rendered as double.
    * Decimal partial aggregation is still map-side combinable, so this keeps
    * Spark's two-phase hash aggregate (no extra shuffle) while making the
    * result bit-stable at any partition count. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  /** Cumulative (window) variant of [[dsum]]. */
  def dsumDec(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(25, scale)))

  /** Hourly tumbling bucket on epoch seconds — integer-division bucketing,
    * the reference's signature time op
    * (reference: src/main/scala/etl/BaseEnricher.scala:88-89,110;
    * constants/Time.scala:7-8). */
  def hourBucket(epochSec: Column): Column =
    floor(epochSec / 3600) * 3600

  def dayBucket(epochSec: Column): Column =
    floor(epochSec / 86400) * 86400
}
