package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamLshDedup

/** Offline state introspection (Spark 4 `statestore` / `state-metadata`
  * readers) against the streaming dedup checkpoint: at 100 TB the
  * question "what does the dedup filter currently remember, and is it
  * actually shrinking after expiry" must be answerable WITHOUT
  * attaching to the running query — these readers are that surface,
  * and this spec pins (a) the operator layout the readers expose,
  * (b) that on-disk claim state equals the relational bandKeys
  * derivation exactly, and (c) that watermark expiry removes rows from
  * the STORE, not just from a metric. */
class StateIntrospectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(min: Long) = new java.sql.Timestamp((1000000L + min) * 60000L)

  test("claim store on disk ≡ relational band keys; expiry shrinks the store") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val ck = java.nio.file.Files.createTempDirectory("introspect_ck").toString
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, RocksDb)
    try {
      val docs = Seq(
        (1L, "one document claiming a pair of lsh buckets right now"),
        (2L, "a second unrelated document claiming two more buckets here"))

      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds")
      def start() = StreamLshDedup.keepExpiring(stream, retentionMs = 30L * 60000)
        .writeStream.format("noop").option("checkpointLocation", ck)
        .outputMode("append").start()

      val q1 = start()
      mem.addData(docs.map { case (id, t) => (id, t, ts(0)) }: _*)
      q1.processAllAvailable(); q1.stop()

      // (a) operator layout: claim stage = operatorId 1 (EventTime,
      // owner ValueState + event timers), verdict stage = 0
      val meta = spark.read.format("state-metadata").load(ck)
        .select("operatorId", "operatorProperties")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(meta(1L).contains("\"timeMode\":\"EventTime\"") &&
        meta(1L).contains("\"stateName\":\"owner\"") &&
        meta(1L).contains("TimerState"),
        s"claim stage must be operator 1 with owner state + timers: ${meta(1L)}")
      assert(meta(0L).contains("\"stateName\":\"acc\""),
        s"verdict stage must be operator 0: ${meta(0L)}")

      // (b) the on-disk claim store equals the relational derivation:
      // every (band, key) of the fed docs, owned by its doc
      val onDisk = StreamLshDedup.ownerState(spark, ck)
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      val expected = graft.ops.DedupOps.bandKeys(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(1), r.getString(2)) -> r.getLong(0)).toMap
      assert(onDisk == expected,
        s"state store rows must equal relational band keys:\n disk=$onDisk\n rel=$expected")

      // (c) push the watermark past the horizon on a restarted query;
      // the expired buckets must be GONE from the store itself
      val q2 = start()
      mem.addData((3L, "watermark pusher far in the future of both documents", ts(60)))
      q2.processAllAvailable()
      mem.addData((4L, "second watermark pusher even further out into the future", ts(120)))
      q2.processAllAvailable(); q2.stop()
      val after = StreamLshDedup.ownerState(spark, ck)
        .collect().map(r => r.getLong(2)).toSet
      assert(!after.contains(1L) && !after.contains(2L),
        s"expired buckets must leave the on-disk store, still present: $after")
      assert(after.nonEmpty, "the pushers' own live buckets remain")
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
