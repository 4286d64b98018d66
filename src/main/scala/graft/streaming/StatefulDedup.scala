package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.PageRow

/** Stateful first-seen filter over a pages stream
  * (`flatMapGroupsWithState`): unbounded-lookback exactly-once per url —
  * the streaming-state analog of the reference's persistent Redis
  * idempotency claim (`processor.py:213-244` NX read-or-lock), where
  * watermarked `dropDuplicates` only covers the watermark window.
  *
  * State per url is one long (the claim's processing-time ms) — tiny; at
  * scale the state store shards by the url key and lives in the
  * checkpoint. The optional `ttl` mirrors the reference's
  * idempotency-cache TTL (`config.py:73`, 3600 s): a claim expires `ttl`
  * after it was FIRST made (duplicates do not extend it, like Redis SET
  * NX EX), the expired key is removed from the store, and the url is
  * re-admitted — bounding state at 10^12 urls to the crawl's working
  * set. Default (`ttl = None`) keeps the unbounded exactly-once
  * behavior.
  *
  * Engine note: with a TTL set, Spark schedules micro-batches
  * CONTINUOUSLY to fire due timers
  * (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is
  * unconditionally true under ProcessingTimeTimeout) — so
  * `processAllAvailable()` never returns on such a query; poll the sink
  * or use a bounded `awaitTermination`.
  */
object StatefulDedup {

  def firstSeen(pages: Dataset[PageRow],
                ttl: Option[FiniteDuration] = None): Dataset[PageRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val timeoutConf = ttl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    pages
      .groupByKey(_.url)
      .flatMapGroupsWithState[Long, PageRow](OutputMode.Append, timeoutConf)(
        stateFn(ttl))
  }

  /** The per-key state function, extracted so the claim/expiry branches
    * are unit-testable with TestGroupState (clock-controlled) — the
    * expired-claim re-admission race can't be driven through a real
    * stream deterministically. */
  private[streaming] def stateFn(ttl: Option[FiniteDuration])
      : (String, Iterator[PageRow], GroupState[Long]) => Iterator[PageRow] =
    (_: String, rows: Iterator[PageRow], state: GroupState[Long]) =>
      {
          if (state.hasTimedOut) {
            // claim expired: drop the state so the next arrival of this
            // url is treated as first-seen again
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // duplicate: check the claim's own clock FIRST — an arrival
            // after the TTL elapsed but before Spark fired the timeout
            // must be re-admitted as first-seen (Redis SET NX EX
            // semantics: an expired key admits the next writer), not
            // suppressed under a re-armed remainder.
            val expired = ttl.exists { d =>
              state.get + d.toMillis - state.getCurrentProcessingTimeMs() <= 0
            }
            if (expired) {
              state.update(state.getCurrentProcessingTimeMs())
              ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
              rows.take(1)
            } else {
              // within the claim window. Spark cancels a pending
              // timeout whenever the function is invoked for the key,
              // so re-arm it for the REMAINDER of the original claim —
              // the duplicate must not extend the TTL.
              ttl.foreach { d =>
                val remaining =
                  state.get + d.toMillis - state.getCurrentProcessingTimeMs()
                state.setTimeoutDuration(math.max(1L, remaining))
              }
              Iterator.empty
            }
          } else {
            state.update(state.getCurrentProcessingTimeMs())
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            rows.take(1) // first occurrence within this batch wins too
          }
      }
}
