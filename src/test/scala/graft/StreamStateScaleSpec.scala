package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, SessionsTws}

/** State-scale evidence for the transformWithState sessionizer on its
  * native RocksDB store (SessionsTws claims state = O(live users)
  * regardless of event volume — this measures it):
  *
  *  1. 10× the events per user may not grow the state store's row
  *     count at all: one ValueState + one timer per live user, and
  *     re-arming a timer REPLACES the old one (stale timers deleted
  *     each batch) — if either leaked per-event or per-batch rows,
  *     this pins it.
  *  2. A checkpointed RocksDB restart reloads that state and the
  *     timers still fire: sessions opened before the stop are closed
  *     by a watermark push after the restart — none lost, none
  *     duplicated. Restart wall time and state-store metrics are
  *     printed for the scale record (SURVEY §2.4).
  */
object StreamStateScaleSpec {
  // top-level: the encoder must re-instantiate this on checkpoint
  // restart without an outer test-class instance
  final case class RawEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
}

class StreamStateScaleSpec extends AnyFunSuite {
  import StreamStateScaleSpec.RawEv

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try f
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("RocksDB state rows stay O(live users) under 10x event volume") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val nUsers = 400L

    def stateRows(eventsPerUser: Int): (Long, Long) = withRocksDb {
      val mem = MemoryStream[RawEv]
      val evs = EventStreams.toEv(mem.toDF().withWatermark("ts", "0 seconds"))
      val q = SessionsTws.sessions(evs)
        .writeStream.format("noop").outputMode("append").start()
      try {
        // two microbatches (state must persist across batches); events
        // 1 min apart inside one session — every user session stays OPEN
        val half = eventsPerUser / 2
        def batch(ms: Range) = for {
          u <- 1L to nUsers; m <- ms
        } yield RawEv(u * 10000 + m, ts(m), u, "a", 1.0)
        mem.addData(batch(0 until half): _*)
        q.processAllAvailable()
        mem.addData(batch(half until eventsPerUser): _*)
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators(0)
        (so.numRowsTotal, so.memoryUsedBytes)
      } finally q.stop()
    }

    val (rows1x, mem1x) = stateRows(4)
    val (rows10x, mem10x) = stateRows(40)
    println(f"[state-scale] 1x: $rows1x state rows, mem=$mem1x B; " +
      f"10x: $rows10x state rows, mem=$mem10x B")
    assert(rows1x >= nUsers, s"expected >= $nUsers state rows, got $rows1x")
    assert(rows10x == rows1x,
      s"state rows grew with event volume: $rows1x -> $rows10x")
  }

  test("checkpointed RocksDB restart: timers fire, sessions neither lost nor duplicated") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val inDir = Files.createTempDirectory("tws_in").toString
    val outDir = Files.createTempDirectory("tws_out").toString
    val ckDir = Files.createTempDirectory("tws_ck").toString
    val nUsers = 300L

    val schema = Seq(RawEv(0, ts(0), 1, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value").schema

    def start() = withRocksDb {
      val src = spark.readStream.schema(schema).parquet(inDir)
      val evs = EventStreams.toEv(src.withWatermark("ts", "0 seconds"))
      SessionsTws.sessions(evs)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
    }

    // batch 1: every user opens a session (2 events, 5 min apart)
    (for (u <- 1L to nUsers; m <- Seq(0, 5))
      yield RawEv(u * 100 + m, ts(m), u, "a", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // batch 2 lands while the query is DOWN: one far-future event
    // pushes the watermark past every open session's timer
    Seq(RawEv(999999, ts(600), 999999L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)
    val t0 = System.nanoTime()
    val q2 = start()
    q2.processAllAvailable()
    val restartS = (System.nanoTime() - t0) / 1e9
    val so = q2.lastProgress.stateOperators(0)
    println(f"[state-scale] restart+flush of $nUsers sessions: $restartS%.1f s, " +
      f"state rows after flush: ${so.numRowsTotal}")
    q2.stop()

    val out = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // exactly one closed session per original user: 2 events, sum 4.00
    assert(out.length == nUsers,
      s"expected $nUsers closed sessions, got ${out.length}")
    assert(out.forall { case (u, n, sum) => u <= nUsers && n == 2L && sum == 400L })
    assert(out.map(_._1).distinct.length == nUsers, "duplicated session for a user")
  }
}
