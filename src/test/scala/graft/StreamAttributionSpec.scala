package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps
import graft.streaming.StreamAttribution

/** The streaming attribution path (narrow band kernels + stream-static
  * candidate joins + TopKJaccDistinctAgg) must (a) reproduce the batch
  * attributionTopK operator row for row in batch mode — the band-level
  * duplicates it dedups in the agg instead of distinct() — and (b)
  * produce the same answers with queries split across micro-batches. */
class StreamAttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base =
    "one two three four five six seven eight nine ten eleven twelve"

  /** train: 2 verbatim copies of the base + graded tails + unrelated;
    * queries: the base (multi-candidate), a tailed variant, a novel. */
  private def train = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    ((1L to 2L).map(i => i -> base) ++
      (3L to 8L).map(i => i -> (base + s" tail$i extra$i pad$i")) :+
      (9L -> "wholly unrelated content sits here apart from everything"))
      .toDF("doc_id", "text")
  }

  private def queries: Seq[(Long, String)] = Seq(
    100L -> base,
    101L -> (base + " tail3 extra3 pad3"),
    102L -> "entirely novel text no shingles shared with training data")

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSet

  test("batch twin ≡ attributionTopK row for row (band dups deduped in the agg)") {
    import spark.implicits._
    val qdf = queries.toDF("doc_id", "text")
    val want = asTuples(DedupOps.attributionTopK(train, qdf).collect())
    val got = asTuples(StreamAttribution.serveTopK(qdf, train).collect())
    assert(want.nonEmpty && got == want)
    // the verbatim-copy query attributes both copies at 1e6, id order
    val top = got.filter(r => r._1 == 100L).toSeq.sortBy(_._5)
    assert(top.take(2).map(t => (t._2, t._4)) == Seq((1L, 1000000L), (2L, 1000000L)))
  }

  test("stream ≡ batch across 3 micro-batches, answers complete per batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val want = asTuples(StreamAttribution.serveTopK(
      queries.toDF("doc_id", "text"), train).collect())

    val mem = MemoryStream[(Long, String)]
    val qdf = mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val served = StreamAttribution.serveTopK(qdf, train)
    val query = served.writeStream.format("memory").queryName("attr_serve")
      .outputMode("update").start()
    try {
      mem.addData(queries(0)); query.processAllAvailable()
      val afterB1 = spark.table("attr_serve").collect()
      assert(afterB1.nonEmpty && afterB1.map(_.getLong(0)).toSet == Set(100L),
        "a query's attribution completes within its own micro-batch")
      mem.addData(queries(1)); query.processAllAvailable()
      mem.addData(queries(2)); query.processAllAvailable()
      assert(asTuples(spark.table("attr_serve").collect()) == want,
        "streamed answers must equal the batch twin's")
    } finally query.stop()
  }
}
