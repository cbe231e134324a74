package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic change-log assembly (SURVEY §7.1): collapse (key, value) rows
  * into the reference's signature `Map[timestamp → value]` column shape
  * (A9/C9, reference: src/main/scala/etl/BaseEnricher.scala:162-177 and six
  * siblings) — deterministically: entries are sorted before `map_from_entries`
  * (the reference's unordered `collect_list` makes map key order
  * run-dependent, SURVEY §7.4.1).
  *
  * Scale note: the reference collapses each metric to ONE global row —
  * all-to-one skew at scale. [[perKey]] is the grouped form (one map per
  * group key, as WalletEnricher already does), which spreads the collapse
  * across the key space; use [[global]] only for per-token frames that are
  * already small.
  */
object ChangeLogs {

  /** One map column per group key. */
  def perKey(df: DataFrame, groupKey: Column, mapKey: Column, mapValue: Column,
      as: String): DataFrame =
    df.groupBy(groupKey)
      .agg(map_from_entries(array_sort(collect_list(struct(mapKey, mapValue))))
        .as(as))

  /** Several map columns per group key in ONE aggregation pass — the fused
    * form for metrics sharing an upstream frame (keeps the sorted-entries
    * determinism invariant in one place). */
  def perKeyMulti(df: DataFrame, groupKey: Column, mapKey: Column,
      values: Seq[(Column, String)]): DataFrame = {
    val aggs = values.map { case (v, name) =>
      map_from_entries(array_sort(collect_list(struct(mapKey, v)))).as(name)
    }
    df.groupBy(groupKey).agg(aggs.head, aggs.tail: _*)
  }

  /** Whole-frame collapse to a single map row (the reference's shape). */
  def global(df: DataFrame, mapKey: Column, mapValue: Column,
      as: String): DataFrame =
    df.groupBy()
      .agg(map_from_entries(array_sort(collect_list(struct(mapKey, mapValue))))
        .as(as))
}
