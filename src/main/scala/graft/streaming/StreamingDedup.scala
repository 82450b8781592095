package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup with BOUNDED state — the production variant of
  * the unbounded `dropDuplicates` gate query (q44): state for a key is
  * kept only until the event-time watermark passes it, so a perpetual
  * stream holds a rolling window of fingerprints instead of every
  * fingerprint ever seen.
  *
  * Determinism contract (what the q50 oracle relies on): duplicates
  * whose event times lie within `delay` of each other are GUARANTEED to
  * collapse — the earlier row's state cannot be evicted before the
  * later row arrives, because eviction requires the watermark (= max
  * seen event time − delay, which only monotonically trails the data)
  * to pass the earlier event time. Duplicates farther apart than
  * `delay` MAY or may not collapse (state is evicted lazily), so a
  * deterministic pipeline keys its dedup with a time bucket no wider
  * than `delay` — e.g. fingerprint + minute bucket under a 10-minute
  * watermark — making the emitted set exactly DISTINCT(keys).
  *
  * The 100 TB story: state size is O(keys within the watermark
  * horizon), not O(stream history); the spec asserts the bound through
  * the state-store metrics of a multi-batch run.
  */
object StreamingDedup {

  /** `stream` must be a streaming DataFrame containing `eventTime` and
    * every column of `keys`. Emits the first occurrence of each key (in
    * append mode) and evicts a key's state once the watermark passes
    * its event time.
    */
  def withinWatermark(
      stream: DataFrame,
      eventTime: String,
      delay: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "streaming dedup needs at least one key column")
    stream
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }
}
