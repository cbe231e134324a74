package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with event-time-bounded state (SURVEY §2.12
  * extension): both sides carry watermarks and the join condition bounds
  * how far apart matching events may sit in event time, so the state store
  * holds only the watermark horizon of each side — the property that keeps
  * a continuously-running join alive at 100 TB/day, where an unbounded
  * stream-stream join would accumulate state forever.
  */
object StreamJoins {

  /** Enrich a transfer stream with the latest price observations within the
    * preceding `windowSeconds`: inner equi-join on the token plus an
    * event-time range predicate. Expected columns:
    * `transfers(contract_address, value, t_ts)`,
    * `prices(p_contract, price, p_ts)` — distinct names keep the join
    * condition unambiguous without aliases. */
  def transfersWithRecentPrices(transfers: DataFrame, prices: DataFrame,
      windowSeconds: Long = 3600L): DataFrame = {
    val t = transfers.withWatermark("t_ts", s"$windowSeconds seconds")
    val p = prices.withWatermark("p_ts", s"${2 * windowSeconds} seconds")
    t.join(p,
      col("contract_address") === col("p_contract") &&
        col("p_ts") >= col("t_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("p_ts") <= col("t_ts"))
      .select(col("contract_address"), col("value"), col("t_ts"),
        col("price"), col("p_ts"))
  }

  /** Stream-STATIC enrichment: join a stream against a batch dimension
    * table (the dapp registry). No watermark and no join state at all —
    * the static side is broadcast per micro-batch and re-read if it
    * changes under a lazily-refreshed format — which is why dimension
    * enrichment should always be spelled stream-static, never as a
    * stream-stream join that would buffer the dimension in the state
    * store. `stream` columns: (address, …). */
  def enrichWithDapps(stream: DataFrame, dapps: DataFrame): DataFrame = {
    val reg = dapps
      .select(col("dapp_id"), col("dapp_name"),
        explode(col("addresses")).as("address"))
    stream.join(broadcast(reg), Seq("address"), "left")
  }
}
