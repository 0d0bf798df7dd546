package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, SessionsTws}

/** The transformWithState sessionizer must reproduce the FMGWS
  * sessionizer's output exactly on the same feed: same closed
  * sessions while streaming, same timer-driven final flush. Runs on
  * the RocksDB state store (the only provider the new API supports).
  */
class SessionsTwsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  final case class RawEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  // same feed for both implementations: two users, one mid-stream
  // session break for user 7 (gap > 30 min), interleaved batches
  private val batches: Seq[Seq[RawEv]] = Seq(
    Seq(RawEv(1, ts(0), 7, "a", 1.0), RawEv(2, ts(10), 7, "a", 2.0)),
    Seq(RawEv(3, ts(20), 7, "a", 3.0), RawEv(4, ts(25), 8, "a", 5.0)),
    // 11:10 for user 7 = 50 min after 10:20 → breaks session 1
    Seq(RawEv(5, ts(70), 7, "a", 4.0)),
    // push the watermark far ahead so every open session times out
    Seq(RawEv(6, ts(300), 9, "a", 1.0)),
    Seq(RawEv(7, ts(600), 9, "a", 1.0)),
    Seq(RawEv(8, ts(900), 9, "a", 1.0)))

  private def run(name: String,
      build: org.apache.spark.sql.Dataset[EventStreams.Ev] =>
        org.apache.spark.sql.Dataset[EventStreams.SessionOut]): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEv]
    val evs = EventStreams.toEv(mem.toDF().withWatermark("ts", "0 seconds"))
    val q = build(evs).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
  }

  test("transformWithState sessions ≡ flatMapGroupsWithState sessions") {
    spark.sparkContext.setLogLevel("WARN")
    val fmgws = run("sess_fmgws", ds => EventStreams.statefulSessions(ds))

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val tws =
      try run("sess_tws", ds => SessionsTws.sessions(ds))
      finally prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }

    assert(tws == fmgws, s"tws=$tws\nfmgws=$fmgws")
    // and the feed actually exercised the interesting paths:
    // a mid-stream break for user 7 (two sessions) + timer flushes
    val user7 = tws.filter(_._1 == 7L)
    assert(user7.size == 2, s"expected a session break for user 7: $user7")
    assert(user7.exists(s => s._4 == 3L && s._5 == 600L)) // 3 events, 6.00
    assert(user7.exists(s => s._4 == 1L && s._5 == 400L)) // the post-gap single
  }
}
