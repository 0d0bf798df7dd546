package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamLshDedup

/** The streaming LSH dedup (chained transformWithState bucket-claim →
  * verdict-collect, RocksDB store) must agree with its relational
  * batch equivalent on a doc_id-ascending feed — including a
  * cross-batch duplicate, which only survives the comparison if the
  * bucket-owner STATE persisted between microbatches. */
class StreamLshDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  // near-dup groups: 1≈2 (identical text), 5≈6 (identical), rest unique.
  // doc 6 arrives a BATCH LATER than 5 — the cross-batch state case.
  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "the quick brown fox jumps over the lazy dog again and again",
    3L -> "completely different text about spark query engines at scale",
    4L -> "yet another unrelated document mentioning parquet and shuffles",
    5L -> "duplicate payload arriving in two different micro batches here",
    6L -> "duplicate payload arriving in two different micro batches here")

  test("stream ≡ batch equivalent, bucket state survives across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")

    val batchDf = docs.toDF("doc_id", "text")
    val want = StreamLshDedup.batchEquivalent(batchDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // sanity on the data: dups dropped, uniques kept
    assert(want.contains(1L) && !want.contains(2L))
    assert(want.contains(5L) && !want.contains(6L))
    assert(want.contains(3L) && want.contains(4L))

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try {
      val mem = MemoryStream[(Long, String)]
      val q = StreamLshDedup.keep(mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("lsh_dedup")
        .outputMode("append").start()
      try {
        // doc_id-ascending batches; 6 (dup of 5) arrives one batch later
        mem.addData(docs.take(3): _*); q.processAllAvailable()
        mem.addData(docs.slice(3, 5): _*); q.processAllAvailable()
        mem.addData(docs.drop(5): _*); q.processAllAvailable()
        // TWO more dups of doc 5's text in ONE batch: the bucket's
        // owner already exists, so this exercises the zero-buffering
        // lazy verdict path with a MULTI-row group (the map over the
        // live input iterator) — both must collide
        mem.addData(7L -> docs(4)._2, 8L -> docs(4)._2); q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("lsh_dedup")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out.keySet == docs.map(_._1).toSet + 7L + 8L,
        "every doc must get a verdict")
      assert(!out(7L) && !out(8L),
        s"multi-row lazy claim path must report both collisions, got $out")
      assert(out.filter(_._2).keySet == want,
        s"stream kept ${out.filter(_._2).keySet}, batch kept $want")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  // base minute offset: events at epoch-0 would tie the INITIAL
  // watermark and be dropped as late rows before reaching the operator
  private def ts(min: Long) = new java.sql.Timestamp((1000000L + min) * 60000L)

  /** Claim-store row count from the most recent DATA batch: TWS
    * operators report numRowsTotal=0 on the no-data batches
    * processAllAvailable appends, so lastProgress is useless — scan
    * recentProgress for the last batch that actually took input. The
    * claim operator is the max across operators (stage-2 verdict state
    * is transient within a batch, so it reports 0 or near-0). */
  private def claimRowsLastDataBatch(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.filter(_.numInputRows > 0).lastOption
      .map(_.stateOperators.map(_.numRowsTotal).max).getOrElse(-1L)

  test("keepExpiring: buckets are watermark-evicted in place; dup after horizon kept") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    val retentionMs = 30L * 60000 // 30 min of event-time silence
    try {
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds")
      val q = graft.streaming.StreamLshDedup.keepExpiring(
          stream, retentionMs = retentionMs)
        .writeStream.format("memory").queryName("lsh_dedup_exp")
        .outputMode("append").start()
      try {
        // batch 1 at T+0: dup pair 1≈2 within one batch + one unique.
        // Bucket timers arm at T+30min.
        mem.addData((1L, "duplicate payload arriving in two different micro batches here", ts(0)),
          (2L, "duplicate payload arriving in two different micro batches here", ts(0)),
          (3L, "completely different text about spark query engines at scale", ts(0)))
        q.processAllAvailable()
        assert(claimRowsLastDataBatch(q) > 0, "claim state must hold live buckets")
        // batch 2 at T+60: watermark reaches T+60 after it, so the
        // T+30 timers fire and every batch-1 bucket forgets its owner
        mem.addData((4L, "yet another unrelated document mentioning parquet and shuffles", ts(60)))
        q.processAllAvailable()
        mem.addData((5L, "fresh filler document to push the event time watermark forward", ts(120)))
        q.processAllAvailable()
        // batch 4: doc 6 re-sends doc 1's text AFTER its buckets
        // expired -> no collision recorded, doc 6 is KEPT (the
        // retention recall trade, made in place, no epoch restart)
        mem.addData((6L, "duplicate payload arriving in two different micro batches here", ts(150)))
        q.processAllAvailable()
        val out = spark.table("lsh_dedup_exp")
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(out(1L) && !out(2L), "within-horizon dup must still drop (parity)")
        assert(out(3L) && out(4L) && out(5L), "uniques kept")
        assert(out(6L), s"dup after retention horizon must be kept, got $out")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("keepExpiring ≡ batchEquivalentExpiring on a watermark-advancing feed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val retentionMs = 30L * 60000
    // one doc per microbatch, ascending time — the regime where the
    // streaming watermark eviction and the relational gap-sessionized
    // ownership agree exactly. d2 collides in-horizon (gap 10 < 30 min
    // from d1's buckets), d5 re-sends d1's text after two intermediate
    // docs pushed the watermark past the deadline (gap 80 > 30) — the
    // batch side must KEEP d5 for the same reason the stream does.
    val feed = Seq(
      (1L, "duplicate payload arriving in two different micro batches here", 0L),
      (2L, "duplicate payload arriving in two different micro batches here", 10L),
      (3L, "completely different text about spark query engines at scale", 50L),
      (4L, "yet another unrelated document mentioning parquet and shuffles", 80L),
      (5L, "duplicate payload arriving in two different micro batches here", 90L))

    val batchDf = feed.toDF("doc_id", "text", "min")
      .withColumn("ts_us", col("min") * 60000000L).drop("min")
    val want = graft.streaming.StreamLshDedup.batchEquivalentExpiring(
        batchDf, retentionUs = retentionMs * 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want == Set(1L, 3L, 4L, 5L),
      s"batch side: expected in-horizon dup 2 dropped, post-horizon dup 5 kept, got $want")

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try {
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds")
      val q = graft.streaming.StreamLshDedup.keepExpiring(
          stream, retentionMs = retentionMs)
        .writeStream.format("memory").queryName("lsh_dedup_parity")
        .outputMode("append").start()
      try {
        feed.foreach { case (id, text, min) =>
          mem.addData((id, text, ts(min)))
          q.processAllAvailable()
        }
        val kept = spark.table("lsh_dedup_parity")
          .filter(col("kept")).collect().map(_.getLong(0)).toSet
        assert(kept == want, s"stream kept $kept, batch equivalent kept $want")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("keepExpiring: claim state-row count drops after the horizon passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try {
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds")
      val q = graft.streaming.StreamLshDedup.keepExpiring(
          stream, retentionMs = 30L * 60000)
        .writeStream.format("memory").queryName("lsh_dedup_exp2")
        .outputMode("append").start()
      try {
        // 3 unique docs -> 6 claimed buckets, timers at T+30min
        mem.addData(
          (1L, "one document claiming a pair of lsh buckets right now", ts(0)),
          (2L, "a second unrelated document claiming two more buckets here", ts(0)),
          (3L, "a third distinct text occupying its own two lsh buckets", ts(0)))
        q.processAllAvailable()
        val before = claimRowsLastDataBatch(q)
        assert(before >= 6, s"3 docs x 2 bands must claim >= 6 buckets, saw $before")
        // two watermark pushers an hour apart: by the second pusher's
        // data batch the T+30 timers have fired, so its end-of-batch
        // total holds only the pushers' own (still-live) buckets
        mem.addData((4L, "watermark pusher number one far in the future of them", ts(60)))
        q.processAllAvailable()
        mem.addData((5L, "watermark pusher number two even further in the future", ts(120)))
        q.processAllAvailable()
        val after = claimRowsLastDataBatch(q)
        assert(after >= 0 && after < before,
          s"expired buckets must leave the store: before=$before after=$after")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

}
