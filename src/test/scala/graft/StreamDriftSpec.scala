package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming drift monitor (`tumblingDrift`): stream ≡ batch row-for-
  * row on the same data, a window matching the reference rate reports
  * ~zero drift, and a planted traffic flood dominates exactly its
  * window's row. */
final case class DriftRawEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamDriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  /** 3 steady hours at 4 clicks/hour + one flooded hour at 40. */
  private def evs: Seq[DriftRawEv] = {
    val steady = for (h <- 0 until 3; i <- 0 until 4)
      yield DriftRawEv(h * 100L + i, ts(h * 60 + i * 12), 1, "click", 1.0)
    val flood = (0 until 40).map(i =>
      DriftRawEv(900L + i, ts(3 * 60 + (i % 58)), 1, "click", 1.0))
    steady ++ flood
  }

  test("stream equals batch row-for-row; the flooded window dominates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val staticDf = evs.toDF()
    val batch = EventStreams.tumblingDrift(staticDf, staticDf)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[DriftRawEv]
    val q = EventStreams.tumblingDrift(mem.toDF(), staticDf)
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // close every window: an event far in the future pushes the
      // watermark past the last data hour (its own window stays open,
      // so filter it out of the compare)
      mem.addData(DriftRawEv(9999L, ts(60 * 24), 1, "click", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("drift").collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream/batch mismatch:\n  stream ${streamed}\n  batch $batch")
    } finally q.stop()

    // reference rate = 52 events / 4 windows = 13: the flood window's
    // contribution ((40-13)^2/13) must dominate every steady window's
    // ((4-13)^2/13) by the exact integer ratio
    val byWin = batch.map(r => r.head.asInstanceOf[Long] ->
      r(4).asInstanceOf[Long]).toMap
    val floodWin = byWin.maxBy(_._2)
    assert(floodWin._2 == (40L - 13L) * (40L - 13L) * 1000000L / 13L)
    assert(byWin.values.count(_ == (4L - 13L) * (4L - 13L) * 1000000L / 13L) == 3)
  }

  test("a stream matching the reference rate reports zero drift exactly") {
    import spark.implicits._
    // 4 uniform hours at the same rate: expected = total/4 = per-window
    // count, so every chi2 contribution is exactly 0
    val uniform = (for (h <- 0 until 4; i <- 0 until 6)
      yield DriftRawEv(h * 10L + i, ts(h * 60 + i * 10), 1, "view", 1.0)).toDF()
    val out = EventStreams.tumblingDrift(uniform, uniform).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("chi2_ppm") == 0L))
  }
}
