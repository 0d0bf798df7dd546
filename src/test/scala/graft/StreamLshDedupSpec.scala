package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
      } finally q.stop()
      val out = spark.table("lsh_dedup")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out.keySet == docs.map(_._1).toSet, "every doc must get a verdict")
      assert(out.filter(_._2).keySet == want,
        s"stream kept ${out.filter(_._2).keySet}, batch kept $want")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

}
