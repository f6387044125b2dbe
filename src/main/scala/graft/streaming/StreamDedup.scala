package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate candidate detection — the streaming face of
  * `Dedup.minhashPairs`' bucket stage (driver prompt: dedup is a first-class
  * training-data operation; a live ingest pipeline needs it BEFORE the
  * batch pass exists).
  *
  * Each arriving document emits its `bands` LSH band keys (same signature
  * kernel and band-key derivation as the batch pipeline, so batch and
  * stream agree on bucketing); per-bucket state holds the ids seen so far
  * and every new member emits candidate pairs against them — ACROSS
  * micro-batches, which is exactly what a per-batch self-join would miss.
  *
  * State shape, honestly: PER-BUCKET state is bounded at `maxBucket` ids
  * with the batch cap policy (under the cap every pair; over it a star
  * pair against the bucket's running minimum — same connectivity and
  * linearity guarantees; online divergence: the hub is the min of the
  * first `maxBucket` arrivals, where batch uses the global bucket min).
  * TOTAL state still grows with the number of distinct buckets ever seen —
  * for an endless stream set `stateTtlMinutes` > 0 and buckets idle past
  * the TTL are evicted (processing-time timeout), trading cross-epoch
  * recall for bounded state; leave it 0 for bounded corpora/sessions.
  * TTL mode is for daemon (processing-time-trigger) streams — its natural
  * home; under `Trigger.AvailableNow` Spark 4.1.2's planner hits an
  * internal NPE scheduling the timeout batch (upstream bug, reproduced in
  * isolation). Drain-and-stop jobs that need eviction use
  * [[candidatesEventTime]] (watermark-driven TTL — plans cleanly under
  * every trigger); the default no-TTL mode remains for bounded corpora.
  *
  * Delivery: candidates are AT-LEAST-ONCE. Under-cap members are recorded
  * in state, so a replayed doc re-pairs nothing; an over-cap arrival is
  * deliberately NOT recorded (that's what bounds the state), so its star
  * pair can repeat under source replay. The exact-verify stage downstream
  * deduplicates pairs anyway (as the batch pipeline's verify groupBy does).
  */
object StreamDedup {

  final case class DocRow(doc_id: Long, text: String)
  final case class DocTsRow(doc_id: Long, text: String, ts: java.sql.Timestamp)
  final case class CandPair(id_a: Long, id_b: Long, band: Int)

  // state: ids seen in this bucket; slot 0 is the bucket minimum (the star
  // hub once the cap is hit). maxEventMs tracks the latest event time seen
  // (event-time-TTL path only; 0 under processing-time/no-TTL) so a LATE
  // replayed row can never shorten an already-granted TTL deadline.
  final case class BucketState(ids: Seq[Long], maxEventMs: Long = 0L)

  def candidates(spark: SparkSession, docs: Dataset[DocRow],
      k: Int = 64, bands: Int = 16, maxBucket: Int = 64,
      stateTtlMinutes: Int = 0): Dataset[CandPair] = {
    import spark.implicits._
    // same fused banding kernel as the batch pipelines (DedupExpr) — the
    // batch and streaming paths can never hash differently, and the
    // per-batch corpus side pays no encoder round trip. Stateless
    // projection, so it plans cleanly upstream of the stateful operator.
    val banded: Dataset[(Int, Long, Long)] = docs.toDF()
      .select(col("doc_id"), explode(graft.dedup.DedupExpr.minhashBandsCol(
        spark, col("text"), k, bands)).as("bb"))
      .select(col("bb.band"), col("bb.bkey"), col("doc_id"))
      .as[(Int, Long, Long)]
    val timeout =
      if (stateTtlMinutes > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    banded
      .groupByKey { case (band, bkey, _) => (band, bkey) }
      .flatMapGroupsWithState[BucketState, CandPair](OutputMode.Append(), timeout) {
        (key: (Int, Long), rowsIt: Iterator[(Int, Long, Long)], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket evicted — bounded total state
            Iterator.empty
          } else {
            val out = updateBucket(key._1, rowsIt.map(_._3), state, maxBucket)
            if (stateTtlMinutes > 0)
              state.setTimeoutDuration(stateTtlMinutes.toLong * 60000L)
            out
          }
      }
  }

  /** Event-time-TTL variant of [[candidates]] for DRAIN-AND-STOP jobs
    * (`Trigger.AvailableNow`): identical bucket/pair/cap semantics, but
    * idle-bucket eviction keys off the WATERMARK instead of wall-clock —
    * a bucket is dropped once the watermark passes its last arrival's
    * event time + `ttlMinutes`. This sidesteps the reproduced Spark 4.1.2
    * planner NPE (ProcessingTimeTimeout + AvailableNow, see class doc):
    * EventTimeTimeout plans cleanly under every trigger, and event-time
    * TTL is also the semantically right eviction for replayed/backfilled
    * streams (wall-clock TTL would evict mid-replay).
    *
    * Docs must carry an event-time column; set `watermarkDelay` to the
    * source's out-of-orderness bound.
    */
  def candidatesEventTime(spark: SparkSession, docs: Dataset[DocTsRow],
      k: Int = 64, bands: Int = 16, maxBucket: Int = 64,
      ttlMinutes: Int = 60, watermarkDelay: String = "0 seconds"): Dataset[CandPair] = {
    import spark.implicits._
    // fused banding, as in [[candidates]]; ts rides along for the watermark
    val banded = docs.toDF()
      .select(col("doc_id"), col("ts"), explode(graft.dedup.DedupExpr.minhashBandsCol(
        spark, col("text"), k, bands)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("doc_id"), col("ts"))
      // the watermark rides on the banded rows (same event time, band
      // fan-out doesn't change it) — EventTimeTimeout requires it upstream
      // of the stateful operator
      .withWatermark("ts", watermarkDelay)
      .as[(Int, Long, Long, java.sql.Timestamp)]

    banded
      .groupByKey { case (band, bkey, _, _) => (band, bkey) }
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rowsIt: Iterator[(Int, Long, Long, java.sql.Timestamp)],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = rowsIt.toArray
            // RUNNING max event time: a late (within-watermark) replayed
            // row must never shorten an already-granted deadline — Spark
            // clears the timeout on every data invocation, so the state
            // carries the max and the deadline is recomputed from it
            val newMax = math.max(
              state.getOption.map(_.maxEventMs).getOrElse(0L),
              rows.iterator.map(_._4.getTime).max)
            val out = updateBucket(key._1, rows.iterator.map(_._3), state, maxBucket, newMax)
            // evict once the watermark passes max-arrival + TTL; clamped a
            // tick past the current watermark (setTimeoutTimestamp rejects
            // timestamps at or behind it)
            state.setTimeoutTimestamp(
              math.max(newMax + ttlMinutes.toLong * 60000L,
                state.getCurrentWatermarkMs() + 1L))
            out
          }
      }
  }

  /** Shared bucket update: emits candidate pairs for `freshIn` against the
    * per-bucket state under the cap policy (all pairs below `maxBucket`,
    * star pairs against the minimum-id hub above it) and writes the state
    * back. See class doc for determinism and at-least-once notes.
    */
  private def updateBucket(band: Int, freshIn: Iterator[Long],
      state: GroupState[BucketState], maxBucket: Int,
      maxEventMs: Long = 0L): Iterator[CandPair] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
    var ids = state.getOption.map(_.ids.toVector).getOrElse(Vector.empty)
    // deterministic intra-batch order (micro-batch iterator order is
    // not guaranteed): new arrivals processed in ascending id
    val fresh = freshIn.toArray.sorted.distinct.filterNot(ids.contains)
    fresh.foreach { id =>
      if (ids.length < maxBucket) {
        ids.foreach(s => out += CandPair(math.min(s, id), math.max(s, id), band))
        ids = if (ids.isEmpty || id > ids.head) ids :+ id
              else id +: ids // keep the minimum in slot 0
      } else {
        // over the cap: star pair vs the bucket's running minimum —
        // bounded state, cluster stays connected
        val hub = ids.head
        out += CandPair(math.min(hub, id), math.max(hub, id), band)
      }
    }
    state.update(BucketState(ids, maxEventMs))
    out.iterator
  }
}
