package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Committed repro of WHY the engine does not use state TTL for the
  * streaming LSH dedup (StreamLshDedup): TTLConfig requires
  * TimeMode.ProcessingTime, and a ProcessingTime transformWithState
  * deadlocks `processAllAvailable` in Spark 4.1.2 local mode — the
  * query's first microbatch never completes, even for a single-stage
  * processor with an explicit one-shot trigger and the RocksDB store.
  *
  * The production decision this pins: bucket state is bounded by
  * EVENT-time timers instead (StreamLshDedup.keepExpiring — watermark
  * eviction, the SessionsTws pattern), which Spark executes correctly.
  *
  * The repro test is `ignore`d so CI never hangs on it. To re-check
  * after a Spark upgrade: flip `ignore` to `test`, run
  *   sbt "testOnly graft.TwsProcessingTimeProbeSpec"
  * and if it PASSES (no timeout), ProcessingTime TWS works again and
  * a TTL variant of StreamLshDedup becomes shippable. The watchdog
  * bounds the hang at 60 s, so an un-ignored run fails fast instead of
  * freezing the suite.
  */
class TwsProcessingTimeProbeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Minimal ProcessingTime processor: counts rows per key with a
    * 1-minute TTL on the counter — the exact shape a TTL-bounded
    * bucket-claim store would use. */
  class CountProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMinutes(1)))
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[(Long, Long)] = {
      val total = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(total)
      Iterator.single(key -> total)
    }
  }

  ignore("ProcessingTime TWS: first microbatch completes (hangs on Spark 4.1.2)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new CountProcessor,
          TimeMode.ProcessingTime(), OutputMode.Append())
        .writeStream.format("memory").queryName("tws_ptime_probe")
        .outputMode("append").start()
      try {
        mem.addData(1L -> 10L, 2L -> 20L)
        // watchdog: processAllAvailable never returns on 4.1.2 local —
        // bound the hang so an un-ignored run FAILS instead of freezing
        val done = new java.util.concurrent.CountDownLatch(1)
        val worker = new Thread(() => {
          try q.processAllAvailable() finally done.countDown()
        }, "tws-ptime-probe")
        worker.setDaemon(true)
        worker.start()
        val finished = done.await(60, java.util.concurrent.TimeUnit.SECONDS)
        assert(finished,
          "ProcessingTime TWS microbatch did not complete within 60 s " +
            "(the Spark 4.1.2 deadlock this spec exists to pin)")
        assert(spark.table("tws_ptime_probe").count() == 2)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
