package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming-only semantics (what the batch DuckDB oracles can't see):
  * watermark-driven append-mode window closes, late-data drops, and
  * event-time state timeout in the custom sessionizer. MemoryStream +
  * processAllAvailable gives deterministic micro-batch boundaries.
  */
class EventStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.schemaInference", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  final case class RawEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  test("tumbling window closes in append mode only after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val q = EventStreams
      .tumblingCounts(mem.toDF(), window = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      // two events inside hour 10:00; watermark stays < 11:00 → nothing emits
      mem.addData(RawEv(1, ts(5), 1, "click", 1.0), RawEv(2, ts(30), 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("tumb").count() == 0)
      // an 11:20 event pushes the watermark to 11:10 ≥ 11:00 → hour 10 closes
      mem.addData(RawEv(3, ts(80), 1, "view", 3.0))
      q.processAllAvailable()
      val closed = spark.table("tumb").collect()
      assert(closed.length == 1)
      assert(closed(0).getAs[String]("event_type") == "click")
      assert(closed(0).getAs[Long]("n_events") == 2)
      assert(closed(0).getAs[Long]("sum_value_c") == 300)
    } finally q.stop()
  }

  test("late event behind the watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val q = EventStreams
      .tumblingCounts(mem.toDF(), window = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      mem.addData(RawEv(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // push watermark past hour 10 (12:30 → wm 12:20)
      mem.addData(RawEv(2, ts(150), 1, "view", 1.0))
      q.processAllAvailable()
      val afterClose = spark.table("late").filter(col("event_type") === "click")
        .agg(sum("n_events")).collect()(0).getLong(0)
      assert(afterClose == 1)
      // a 10:40 straggler is now behind the watermark → dropped, no new output
      mem.addData(RawEv(3, ts(40), 1, "click", 9.0))
      // and advance watermark further so any (wrong) re-emit would surface
      mem.addData(RawEv(4, ts(300), 1, "view", 1.0))
      q.processAllAvailable()
      val totalClicks = spark.table("late").filter(col("event_type") === "click")
        .agg(sum("n_events")).collect()(0).getLong(0)
      assert(totalClicks == 1, "late click must not re-open the closed window")
    } finally q.stop()
  }

  test("stateful sessionizer emits a session via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val evs = EventStreams.toEv(mem.toDF().withWatermark("ts", "0 seconds"))
    val q = EventStreams.statefulSessions(evs, gapUs = 1800000000L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // 3 events 10:00-10:20 for user 7 — session stays open
      mem.addData(RawEv(1, ts(0), 7, "a", 1.0), RawEv(2, ts(10), 7, "a", 2.0),
        RawEv(3, ts(20), 7, "a", 3.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0, "open session must not emit")
      // user 8 event at 11:30 pushes the watermark past 10:20 + 30 min
      mem.addData(RawEv(4, ts(90), 8, "a", 1.0))
      q.processAllAvailable()
      // timeout fires on the NEXT batch boundary after watermark advance
      mem.addData(RawEv(5, ts(95), 8, "a", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").filter(col("user_id") === 7).collect()
      assert(sessions.length == 1)
      assert(sessions(0).getAs[Long]("n_events") == 3)
      assert(sessions(0).getAs[Long]("sum_value_c") == 600)
    } finally q.stop()
  }

  test("windowed top-k emits per-window ranks via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val typed = EventStreams.toTypedEv(mem.toDF().withWatermark("ts", "0 seconds"))
    val q = EventStreams.windowTopTypes(typed, k = 2)
      .writeStream.format("memory").queryName("wtop").outputMode("append").start()
    try {
      // hour 10:00 window: click x3, view x2, cart x1 — top-2 = click, view
      mem.addData(
        RawEv(1, ts(1), 1, "click", 0), RawEv(2, ts(2), 1, "click", 0),
        RawEv(3, ts(3), 1, "click", 0), RawEv(4, ts(4), 1, "view", 0),
        RawEv(5, ts(5), 1, "view", 0), RawEv(6, ts(6), 1, "cart", 0))
      q.processAllAvailable()
      assert(spark.table("wtop").count() == 0, "open window must not emit")
      // 11:05 event advances the watermark past 11:00; timeout fires on
      // the batch AFTER the advance (same two-step as the sessionizer)
      mem.addData(RawEv(7, ts(65), 1, "click", 0))
      q.processAllAvailable()
      mem.addData(RawEv(8, ts(70), 1, "click", 0))
      q.processAllAvailable()
      val rows = spark.table("wtop").collect()
        .map(r => (r.getAs[Long]("rk"), r.getAs[String]("event_type"),
          r.getAs[Long]("n")))
      assert(rows.toSet == Set((1L, "click", 3L), (2L, "view", 2L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val q = EventStreams.enrichedTumbling(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      // user 1 (BUILDING) twice, user 2 (MACHINERY) once, user 99 (no
      // dim row — inner join drops it), all inside hour 10:00
      mem.addData(RawEv(1, ts(5), 1, "click", 1.0), RawEv(2, ts(6), 1, "view", 2.0),
        RawEv(3, ts(7), 2, "click", 4.0), RawEv(4, ts(8), 99, "click", 8.0))
      q.processAllAvailable()
      assert(spark.table("enrich").count() == 0, "window still open")
      mem.addData(RawEv(5, ts(80), 2, "click", 1.0)) // watermark past 11:00
      q.processAllAvailable()
      val rows = spark.table("enrich").collect()
        .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("n_events"),
          r.getAs[Long]("sum_value_c"))).toSet
      assert(rows == Set(("BUILDING", 2L, 300L), ("MACHINERY", 1L, 400L)))
    } finally q.stop()
  }

  test("foreachBatch maintains an upsert table from a CDC stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // streaming CDC feed folded into a keyed state table with
    // TableOps.upsert per micro-batch — the composition a warehouse
    // sink runs; state lives across batches in a driver-held var here
    // (a table format at scale), correctness is what's pinned
    var state = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "n")
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("k", "v", "n")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = graft.ops.TableOps.upsert(state, batch,
          keys = Seq("k"), cols = Seq("v", "n"))
          .localCheckpoint(eager = true) // cut lineage across batches
      }.start()
    try {
      mem.addData((2L, "b2", 21L), (3L, "c", 30L)) // update + insert
      q.processAllAvailable()
      mem.addData((3L, "c2", 31L)) // second batch updates the insert
      q.processAllAvailable()
      val got = state.collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
      assert(got == Map(1L -> ("a", 10L), 2L -> ("b2", 21L), 3L -> ("c2", 31L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases to in-window clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val q = EventStreams.purchaseClickJoin(mem.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      // click 10:00, purchase 10:10 → in the 30-min window
      mem.addData(RawEv(1, ts(0), 1, "click", 1.0), RawEv(2, ts(10), 1, "purchase", 1.0))
      q.processAllAvailable()
      val m1 = spark.table("ssj").collect()
      assert(m1.length == 1)
      assert(m1(0).getAs[Long]("purchase_id") == 2 && m1(0).getAs[Long]("click_id") == 1)
      assert(m1(0).getAs[Long]("gap_us") == 600000000L)
      // purchase 10:50 is > 30 min after the only click → no new match;
      // then click 10:45 arrives LATER and joins it (gap 5 min)
      mem.addData(RawEv(3, ts(50), 1, "purchase", 1.0))
      q.processAllAvailable()
      assert(spark.table("ssj").count() == 1)
      mem.addData(RawEv(4, ts(45), 1, "click", 1.0))
      q.processAllAvailable()
      val m2 = spark.table("ssj").collect().map(r =>
        (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
      assert(m2 == Set((2L, 1L), (3L, 4L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join null-pads once the click watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val q = EventStreams.purchaseClickLeftJoin(mem.toDF())
      .writeStream.format("memory").queryName("ssjl").outputMode("append").start()
    try {
      // purchase 10:10 with a matching click 10:00 emits immediately;
      // purchase 10:50 has no click in [10:20, 10:50] — held in state
      mem.addData(RawEv(1, ts(0), 1, "click", 1.0), RawEv(2, ts(10), 1, "purchase", 1.0),
        RawEv(3, ts(50), 1, "purchase", 1.0))
      q.processAllAvailable()
      val m1 = spark.table("ssjl").collect()
      assert(m1.length == 1 && m1(0).getAs[Long]("click_id") == 1)
      // 11:40 events on BOTH sides (each side's watermark node sits
      // after its event_type filter) push the GLOBAL watermark to
      // 11:30 ≥ 10:50 (the unmatched purchase's window upper bound) →
      // "no match" is final and the null-padded row emits
      mem.addData(RawEv(4, ts(100), 2, "click", 1.0), RawEv(5, ts(100), 2, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssjl").collect()
        .map(r => (r.getAs[Long]("purchase_id"),
          if (r.isNullAt(r.fieldIndex("click_id"))) -1L else r.getAs[Long]("click_id"))).toSet
      // (5,4): the 11:40 purchase matches the same-instant click inline;
      // (3,-1): the 10:50 purchase null-pads now that no click can match
      assert(rows == Set((2L, 1L), (3L, -1L), (5L, 4L)))
    } finally q.stop()
  }

  test("chained stateful operators: dedup state feeds tumbling-window state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val q = EventStreams.dedupThenTumbling(mem.toDF(), window = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("ddt").outputMode("append").start()
    try {
      // duplicate event_id 1 inside hour 10 — dedup must eat it before
      // the window agg sees it; nothing emits while the window is open
      mem.addData(RawEv(1, ts(5), 1, "click", 1.0), RawEv(1, ts(6), 1, "click", 1.0),
        RawEv(2, ts(30), 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("ddt").count() == 0)
      // 11:20 event → watermark 11:10 ≥ 11:00 closes hour 10
      mem.addData(RawEv(3, ts(80), 1, "view", 3.0))
      q.processAllAvailable()
      val closed = spark.table("ddt").collect()
      assert(closed.length == 1)
      assert(closed(0).getAs[Long]("n_events") == 2, "duplicate must not be counted")
      assert(closed(0).getAs[Long]("sum_value_c") == 300)
    } finally q.stop()
  }

  test("streaming dedup drops an in-watermark duplicate event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val q = EventStreams.dedupEvents(mem.toDF(), watermark = "10 minutes")
      .select("event_id", "user_id")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(RawEv(1, ts(0), 1, "a", 1.0), RawEv(1, ts(1), 1, "a", 1.0),
        RawEv(2, ts(2), 1, "a", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }
}
