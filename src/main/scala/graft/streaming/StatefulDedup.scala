package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.PageRow

/** Stateful first-seen filter over a pages stream
  * (`flatMapGroupsWithState`): unbounded-lookback exactly-once per url —
  * the streaming-state analog of the reference's persistent Redis
  * idempotency claim (`processor.py:213-244` NX read-or-lock), where
  * watermarked `dropDuplicates` only covers the watermark window.
  *
  * State per url is one boolean (seen) — tiny; at scale the state store
  * shards by the url key and lives in the checkpoint. Optional TTL via
  * ProcessingTimeTimeout mirrors the reference's idempotency-cache TTL
  * (config.py:73, 3600 s).
  */
object StatefulDedup {

  def firstSeen(pages: Dataset[PageRow]): Dataset[PageRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .groupByKey(_.url)
      .flatMapGroupsWithState[Boolean, PageRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[PageRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1) // first occurrence within this batch wins too
          }
      }
  }
}
