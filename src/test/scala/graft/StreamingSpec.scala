package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed agg over a file source equals the batch result") {
    val batchDf = spark.read.parquet(s"$sfDir/events.parquet")
    val schema = batchDf.schema
    // the file stream source wants a DIRECTORY; stage the single parquet
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.windowedAgg(stream)
      .writeStream.outputMode("append").format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")

    // append mode only emits windows the watermark has passed — compare on
    // the emitted set (all but the trailing windows for this finite input)
    val got = spark.table("win_out")
      .select("bucket_s", "event_type", "n", "value_cents")
      .as[(Long, String, Long, Long)].collect().toSet
    val want = EventStream.windowedAgg(batchDf) // same plan, batch source
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got.subsetOf(want), s"streaming emitted rows not in batch: ${got -- want}")
    assert(got.nonEmpty)
    // everything the watermark closed must have been emitted
    val maxTs = batchDf.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val closed = want.filter { case (b, _, _, _) => b + 300 <= maxTs - 600 }
    assert(closed.subsetOf(got), s"closed windows missing: ${closed -- got}")
  }

  test("stream-stream interval join matches across micro-batches and equals the batch join") {
    import graft.streaming.StreamJoin
    def ev(id: Long, minute: Int, user: Long, typ: String, value: Double) =
      (id, java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), user, typ, value)
    // batch 1: purchases; batch 2: clicks — every match must SPAN batches,
    // which is exactly what the buffered join state exists for
    val batch1 = Seq(
      ev(1, 0, 7, "purchase", 10.0),   // 10:00 — inside u7's click window
      ev(2, 30, 7, "purchase", 20.0),  // 10:30 — inside
      ev(3, 5, 8, "purchase", 30.0),   // different user
      ev(4, 1, 9, "purchase", 40.0))   // user with no later click
    val batch2 = Seq(
      ev(10, 45, 7, "click", 0.0),     // matches purchases 1 and 2 (60-min window)
      ev(11, 50, 8, "click", 0.0),     // matches purchase 3
      ev(12, 55, 12, "click", 0.0))    // user with no purchases
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    def stage(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)], n: Int): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(s"$dir/b$n")
    stage(batch1, 1); stage(batch2, 2)
    val staged = java.nio.file.Files.createTempDirectory("graft-ssj-in").toString
    // one file per micro-batch, in order
    Seq(1, 2).foreach { n =>
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/b$n"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$staged/batch$n.parquet"))
    }
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val joined = StreamJoin.clicksWithRecentPurchase(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream-stream join timed out")
    val got = spark.table("ssj_out")
      .select("click_id", "purchase_id", "purchase_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((10L, 1L, 10.0), (10L, 2L, 20.0), (11L, 3L, 30.0)))
    // batch equivalence on the same rows
    val all = (batch1 ++ batch2).toDF("event_id", "ts", "user_id", "event_type", "value")
    val batchGot = StreamJoin.clicksWithRecentPurchase(
      all.filter(col("event_type") === "click"),
      all.filter(col("event_type") === "purchase"))
      .select("click_id", "purchase_id", "purchase_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(batchGot === got)
  }

  test("flatMapGroupsWithState sessionization closes sessions on the gap") {
    import graft.streaming.EventStream.EventRow
    def ev(id: Long, user: Long, minute: Long, v: Double) =
      EventRow(id, new java.sql.Timestamp(1700000000000L + minute * 60000), user, "x", v, "{}")
    // user 1: two sessions separated by a 90-minute gap; user 2: one session
    val rows = Seq(
      ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 100, 4.0), ev(4, 1, 110, 8.0),
      ev(5, 2, 0, 5.0), ev(6, 2, 20, 5.0),
      // sentinel far in the future advances the watermark so earlier
      // sessions time out and emit
      ev(99, 9, 10000, 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    rows.toDS().write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.toDS().schema).parquet(s"$dir/in").as[EventRow]
    val q = EventStream.sessionize(spark, stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val got = spark.table("sess_out")
      .as[graft.streaming.EventStream.SessionOut].collect()
      .map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(got.contains((1L, 2, 3.0)), s"first session of user 1 missing: $got")
    assert(got.contains((1L, 2, 12.0)), s"second session of user 1 missing: $got")
    assert(got.contains((2L, 2, 10.0)), s"user 2 session missing: $got")
  }

  test("spike alerts: a 4x jump flags, a flat profile does not, timeout flushes") {
    import graft.streaming.EventStream.EventRow
    // base 1700000100000 ms is 5-minute aligned (5666667 × 300000), so
    // minutes 0..4 share one tumbling window and 5..9 the next
    def ev(id: Long, user: Long, minute: Long) =
      EventRow(id, new java.sql.Timestamp(1700000100000L + minute * 60000), user, "x", 1.0, "{}")
    // user 1: 2 events in window A, 9 in the NEXT window (spike);
    // user 2: 3 then 3 (no spike). Sentinel advances the watermark.
    val rows =
      (1L to 2L).map(i => ev(i, 1, i % 2)) ++          // minutes 0..1
      (10L to 18L).map(i => ev(i, 1, 5 + (i % 5))) ++  // minutes 5..9
      (20L to 22L).map(i => ev(i, 2, i % 2)) ++
      (30L to 32L).map(i => ev(i, 2, 5 + (i % 5))) :+
      ev(99, 9, 10000)
    val dir = java.nio.file.Files.createTempDirectory("graft-alert").toString
    rows.toDS().write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.toDS().schema).parquet(s"$dir/in")
      .as[EventRow]
    val q = graft.streaming.EventStream.spikeAlerts(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName("alert_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val got = spark.table("alert_out")
      .as[graft.streaming.EventStream.AlertOut].collect()
      .filter(_.user_id != 9L)
    val u1 = got.filter(_.user_id == 1L).sortBy(_.window_s)
    val u2 = got.filter(_.user_id == 2L).sortBy(_.window_s)
    // both windows of both users emitted (second via a later-window
    // close or the event-time timeout)
    assert(u1.map(_.n).toSeq == Seq(2L, 9L), s"u1 windows: ${u1.toSeq}")
    assert(u1.last.prev_n == 2L && u1.last.spike == 1,
      s"9 > 3*2 must flag: ${u1.toSeq}")
    assert(u1.head.spike == 0, "first window has no predecessor to spike on")
    assert(u2.map(_.n).toSeq == Seq(3L, 3L) && u2.forall(_.spike == 0),
      s"flat profile must not flag: ${u2.toSeq}")
  }

  test("streaming dedup finds near-dup pairs SPANNING micro-batches via bucket state") {
    import graft.streaming.StreamDedup
    import graft.streaming.StreamDedup.DocRow
    // originals in micro-batch 1, near-dup copies in micro-batch 2 — every
    // planted pair spans the batch boundary, so a per-batch self-join would
    // find NONE of them; only the cross-batch bucket state can
    val base = (0L until 40L).map(i =>
      DocRow(i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 500}").mkString(" ")))
    val dups = base.filter(_.doc_id % 10 == 0).map(d => DocRow(d.doc_id + 1000, d.text + " tail"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    def stage(rows: Seq[DocRow], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup-w").toString + "/out"
      rows.toDS().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
    }
    stage(base, "f1.parquet")
    Thread.sleep(20) // distinct mod times → deterministic file order
    stage(dups, "f2.parquet")

    val schema = base.toDS().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[DocRow]
    val q = StreamDedup.candidates(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName("sdedup_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")

    val pairs = spark.table("sdedup_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = base.filter(_.doc_id % 10 == 0).map(d => (d.doc_id, d.doc_id + 1000)).toSet
    assert(planted.subsetOf(pairs), s"cross-batch pairs missing: ${planted -- pairs}")

    // TTL mode (ProcessingTimeTimeout) must run cleanly end-to-end — a
    // missing setTimeoutDuration would throw at the first state update.
    // Uses its intended daemon trigger: AvailableNow + ProcessingTimeTimeout
    // NPEs inside Spark 4.1.2's timeout-batch planner (see StreamDedup doc)
    val stream2 = spark.readStream.schema(schema).parquet(dir).as[DocRow]
    val q2 = StreamDedup.candidates(spark, stream2, stateTtlMinutes = 60)
      .writeStream.outputMode("append").format("memory").queryName("sdedup_ttl_out")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    def ttlPairs() = spark.table("sdedup_ttl_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    while (!planted.subsetOf(ttlPairs()) && System.nanoTime() < deadline)
      Thread.sleep(500)
    q2.stop()
    assert(planted.subsetOf(ttlPairs()), s"TTL-mode pairs missing: ${planted -- ttlPairs()}")
  }

  test("event-time TTL evicts idle buckets under Trigger.AvailableNow") {
    import graft.streaming.StreamDedup
    import graft.streaming.StreamDedup.DocTsRow
    // VERDICT r3 #4: drain-and-stop jobs need TTL too — EventTimeTimeout
    // sidesteps the Spark 4.1.2 AvailableNow+ProcessingTimeTimeout NPE.
    // Batch sequence (maxFilesPerTrigger=1, watermark delay 0):
    //  f1 docs at t0              → buckets seeded, timeout ≈ t0+60min
    //  f2 dup of doc 0 at t0+30m  → state alive → pair (0,1000) FOUND
    //  f3 advancer at t0+3h       → watermark jumps to t0+3h after batch
    //  f4 advancer at t0+3h       → batch runs with wm=t0+3h: idle buckets
    //                               (timeout < wm) fire hasTimedOut → evicted
    //  f5 dup of doc 3 at t0+3h+1m→ state gone → pair (3,1003) NOT found
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(minutes: Long) = new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val base = (0L until 20L).map(i =>
      DocTsRow(i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 500}").mkString(" "), t0))
    def dup(of: Long, id: Long, ts: java.sql.Timestamp) =
      DocTsRow(id, base(of.toInt).text + " tail", ts)
    def advancer(id: Long, ts: java.sql.Timestamp) =
      DocTsRow(id, (0 until 30).map(j => s"adv${id}x$j").mkString(" "), ts)

    val dir = java.nio.file.Files.createTempDirectory("graft-etttl").toString
    def stage(rows: Seq[DocTsRow], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-etttl-w").toString + "/out"
      rows.toDS().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
      Thread.sleep(20) // distinct mod times → deterministic file order
    }
    stage(base, "f1.parquet")
    stage(Seq(dup(0L, 1000L, at(30))), "f2.parquet")
    stage(Seq(advancer(5000L, at(180))), "f3.parquet")
    stage(Seq(advancer(5001L, at(180))), "f4.parquet")
    stage(Seq(dup(3L, 1003L, at(181))), "f5.parquet")

    val schema = base.toDS().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[DocTsRow]
    val q = StreamDedup.candidatesEventTime(spark, stream, ttlMinutes = 60)
      .writeStream.outputMode("append").format("memory").queryName("etttl_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")

    val pairs = spark.table("etttl_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1000L)), s"within-TTL pair missing: $pairs")
    assert(!pairs.contains((3L, 1003L)),
      s"bucket state should have been TTL-evicted before the late dup: $pairs")
  }

  test("a late replayed row must not SHORTEN an event-time TTL deadline") {
    import graft.streaming.StreamDedup
    import graft.streaming.StreamDedup.DocTsRow
    // review finding: Spark clears the timeout on every data invocation;
    // recomputing the deadline from only the current batch would let a
    // late (within-watermark) replay pull it backwards. Sequence
    // (ttl=60m, watermark delay 45m):
    //  g1 doc A @10:00      → deadline 11:00, wm 9:15
    //  g2 REPLAY of A @9:30 → not late (wm 9:15); deadline must STAY 11:00
    //  g3+g4 advancers @11:30 → wm 10:45 < 11:00: bucket must survive
    //  g5 dup of A @10:50   → pair found iff the deadline wasn't shortened
    val day = "2026-01-01 "
    def ts(hm: String) = java.sql.Timestamp.valueOf(day + hm + ":00")
    val text = (0 until 30).map(j => s"w${(j * 7) % 200}").mkString(" ")
    def adv(id: Long) = DocTsRow(id, (0 until 30).map(j => s"adv${id}x$j").mkString(" "), ts("11:30"))
    val dir = java.nio.file.Files.createTempDirectory("graft-etlate").toString
    def stage(rows: Seq[DocTsRow], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-etlate-w").toString + "/out"
      rows.toDS().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
      Thread.sleep(20)
    }
    stage(Seq(DocTsRow(0L, text, ts("10:00"))), "g1.parquet")
    stage(Seq(DocTsRow(0L, text, ts("09:30"))), "g2.parquet") // replay, earlier ts
    stage(Seq(adv(5000L)), "g3.parquet")
    stage(Seq(adv(5001L)), "g4.parquet")
    stage(Seq(DocTsRow(77L, text + " tail", ts("10:50"))), "g5.parquet")
    val schema = Seq(adv(0L)).toDS().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[DocTsRow]
    val q = StreamDedup.candidatesEventTime(spark, stream,
      ttlMinutes = 60, watermarkDelay = "45 minutes")
      .writeStream.outputMode("append").format("memory").queryName("etlate_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val pairs = spark.table("etlate_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 77L)),
      s"replay shortened the TTL deadline — bucket evicted early: $pairs")
  }
}
