package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSessionizeSpec extends SparkSpec {

  private val Gap = 1800L * 1000000L

  /** Batch truth: the w2 window construction on the same rows. */
  private def batchSessions(evs: Seq[StreamingSessionize.Ev]) = {
    val sp = spark; import sp.implicits._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    evs.toDF("user_id", "event_id", "ts_us")
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("ns", when(col("prev").isNull ||
        col("ts_us") - col("prev") > Gap, 1).otherwise(0))
      .withColumn("session_id", sum(col("ns")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("streamed sessions == batch w2 sessions, session split across micro-batches") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    def m(minutes: Long) = minutes * 60L * 1000000L
    // user 1: events at 0,10,20 | gap | 80,90 — second session SPLIT
    // across the two triggers; user 2: one long session spanning both
    val b1 = Seq((1L, 1L, m(0)), (1L, 2L, m(10)), (1L, 3L, m(20)), (1L, 4L, m(80)),
      (2L, 5L, m(5)), (2L, 6L, m(25)))
      .map((StreamingSessionize.Ev.apply _).tupled)
    val b2 = Seq((1L, 7L, m(90)), (2L, 8L, m(50)), (2L, 9L, m(70)))
      .map((StreamingSessionize.Ev.apply _).tupled)
    val mem = MemoryStream[StreamingSessionize.Ev]
    val q = StreamingSessionize.sessions(mem.toDS(), Gap)
      .writeStream.format("memory").queryName("ssz_out").outputMode("update").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // latest row per (user, session) — Update mode re-emits refreshed rows
    val streamed = sp.sql(
      """SELECT user_id, session_id,
        |  max_by(n_events, struct(end_us, n_events)) AS n_events,
        |  max_by(start_us, struct(end_us, n_events)) AS start_us,
        |  max(end_us) AS end_us
        |FROM ssz_out GROUP BY user_id, session_id""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val batch = batchSessions(b1 ++ b2)
    assert(streamed == batch,
      s"streaming/batch sessions diverged:\n  streamed=$streamed\n  batch=$batch")
    // and the cross-batch split really happened: user 1 session 2 spans
    // both triggers (event 80' in b1, 90' in b2)
    assert(batch((1L, 2L))._1 == 2L)
    assert(batch((2L, 1L))._1 == 4L)
  }

  test("event-time twin: SHUFFLED / cross-batch out-of-order input == batch, lateness ≤ watermark") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    // base offset: the initial watermark is epoch 0, so an event AT
    // epoch 0 is born late — keep the test clock a day away from it
    def m(minutes: Long) = (1440L + minutes) * 60L * 1000000L
    // deliberately disordered: within-batch shuffle (10' before 0') and
    // cross-batch lateness (2' arrives a batch after 10'/20') — all
    // within the 30' watermark delay
    val b1 = Seq((1L, 2L, m(10)), (1L, 1L, m(0)), (2L, 5L, m(5)))
    val b2 = Seq((1L, 10L, m(2)), (1L, 3L, m(20)), (2L, 6L, m(25)))
    val b3 = Seq((1L, 4L, m(80)), (2L, 8L, m(50)))
    val b4 = Seq((1L, 7L, m(90)))
    // heartbeats push the final watermark past every real event so the
    // last sessions flush (standard event-time close-out)
    val f1 = Seq((999L, 100L, m(200)))
    val f2 = Seq((999L, 101L, m(201)))
    val mem = MemoryStream[StreamingSessionize.Ev]
    val q = StreamingSessionize.sessionsEventTime(mem.toDS(), Gap, "30 minutes")
      .writeStream.format("memory").queryName("sszw_out").outputMode("update").start()
    for (b <- Seq(b1, b2, b3, b4, f1, f2)) {
      mem.addData(b.map((StreamingSessionize.Ev.apply _).tupled): _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = sp.sql(
      """SELECT user_id, session_id,
        |  max_by(n_events, struct(end_us, n_events)) AS n_events,
        |  max_by(start_us, struct(end_us, n_events)) AS start_us,
        |  max(end_us) AS end_us
        |FROM sszw_out WHERE user_id < 999 GROUP BY user_id, session_id""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val batch = batchSessions((b1 ++ b2 ++ b3 ++ b4)
      .map((StreamingSessionize.Ev.apply _).tupled))
    assert(streamed == batch,
      s"event-time/batch sessions diverged:\n  streamed=$streamed\n  batch=$batch")
    // the late 2' event really landed inside session 1 (4 events, not 3)
    assert(batch((1L, 1L))._1 == 4L)
  }

  test("event-time twin: an event later than the watermark delay is dropped (documented divergence)") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    def m(minutes: Long) = (1440L + minutes) * 60L * 1000000L
    val mem = MemoryStream[StreamingSessionize.Ev]
    val q = StreamingSessionize.sessionsEventTime(mem.toDS(), Gap, "30 minutes")
      .writeStream.format("memory").queryName("sszw_late").outputMode("update").start()
    mem.addData(StreamingSessionize.Ev(1L, 1L, m(0)),
      StreamingSessionize.Ev(1L, 2L, m(10)))
    q.processAllAvailable()
    // heartbeat advances the watermark to 170'
    mem.addData(StreamingSessionize.Ev(999L, 100L, m(200)))
    q.processAllAvailable()
    mem.addData(StreamingSessionize.Ev(999L, 101L, m(201)))
    q.processAllAvailable()
    // 60' is now 110' older than the watermark: beyond the contract
    mem.addData(StreamingSessionize.Ev(1L, 3L, m(60)))
    q.processAllAvailable()
    mem.addData(StreamingSessionize.Ev(999L, 102L, m(202)))
    q.processAllAvailable()
    q.stop()
    val s1 = sp.sql(
      """SELECT max(session_id), sum(n_events) FROM (
        |  SELECT session_id, max(n_events) AS n_events
        |  FROM sszw_late WHERE user_id = 1 GROUP BY session_id)""".stripMargin)
      .collect().head
    q.stop()
    // the too-late event opened no session and joined none: one session
    // of exactly the two in-time events
    assert(s1.getLong(0) == 1L && s1.getLong(1) == 2L, s1.toString)
  }

  test("event-time twin: the exactness boundary is STRICT — ts == watermark arriving late is dropped by Spark") {
    // Empirically pinned semantics (surfaced by a review finding that
    // assumed Spark's late filter was strict): Spark drops arrivals with
    // ts <= watermark BEFORE the operator sees them, so an event at
    // exactly the watermark one trigger late never lands and the
    // contract is lateness STRICTLY below the delay. The kernel's
    // strict (<) pop is the conservative match for this filter.
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    def m(minutes: Long) = (1440L + minutes) * 60L * 1000000L
    val mem = MemoryStream[StreamingSessionize.Ev]
    val q = StreamingSessionize.sessionsEventTime(mem.toDS(), Gap, "30 minutes")
      .writeStream.format("memory").queryName("sszw_edge").outputMode("update").start()
    val batches = Seq(
      Seq((1L, 1L, m(0)), (1L, 2L, m(10))),
      Seq((999L, 100L, m(40))), // => watermark m(10): u1 pops m(0), m(10) stays pending
      Seq((999L, 101L, m(40))), // timeout fires for u1 under watermark m(10)
      Seq((1L, 5L, m(10))),     // ts == watermark, one trigger late
      Seq((999L, 102L, m(100))),
      Seq((999L, 103L, m(101)))) // watermark m(70): everything flushes
    for (b <- batches) {
      mem.addData(b.map((StreamingSessionize.Ev.apply _).tupled): _*)
      q.processAllAvailable()
    }
    q.stop()
    val s1 = sp.sql(
      """SELECT session_id, max(n_events) AS n, min(start_us), max(end_us)
        |FROM sszw_edge WHERE user_id = 1 GROUP BY session_id""".stripMargin)
      .collect()
    assert(s1.length == 1, s1.toSeq.toString)
    // the two in-time events; the ts == watermark straggler was filtered
    // by Spark before the operator — if this ever reads 3, Spark's late
    // filter became strict and the contract comment can be relaxed
    assert(s1.head.getLong(1) == 2L,
      s"boundary semantics changed: session has ${s1.head.getLong(1)} events")
  }

  test("per-user state is four longs: deep histories do not grow state") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val mem = MemoryStream[StreamingSessionize.Ev]
    val q = StreamingSessionize.sessions(mem.toDS(), Gap)
      .writeStream.format("memory").queryName("ssz_state").outputMode("update").start()
    // 500 sessions for one user (every event past the gap)
    mem.addData((0 until 500).map(i =>
      StreamingSessionize.Ev(1L, i.toLong, i.toLong * (Gap + 1))): _*)
    q.processAllAvailable()
    val last = sp.table("ssz_state").agg(max(col("session_id"))).collect().head.getLong(0)
    q.stop()
    assert(last == 500L, s"expected 500 sessions, got $last")
  }
}
