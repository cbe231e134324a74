package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact-dedup: suppress re-deliveries of the same key within the
  * watermark horizon — the incremental form of [[graft.ops.Dedup.exactGroups]]
  * for a continuously-ingested corpus. State per key lives in the state
  * store and is evicted once the watermark passes, so memory is bounded by
  * the horizon, not the stream length. */
object StreamDedup {

  def dedupedStream(df: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
