package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps
import graft.serving.IndexStore
import graft.streaming.StreamAttribution

/** The streaming attribution path (persisted band/shingle artifacts +
  * probed-bucket partition pruning + TopKJaccDistinctAgg) must (a)
  * reproduce the batch attributionTopK operator row for row when
  * serving from the ARTIFACT — the band-level duplicates it dedups in
  * the agg instead of distinct() — (b) produce the same answers with
  * queries split across micro-batches (foreachBatch), and (c) prove
  * both artifact scans read only their probed buckets. */
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

  private lazy val index: IndexStore.AttrIndex = {
    val dir = IndexStore.scratchDir("spec_attr", "attr")
    IndexStore.writeAttr(train, dir)
    IndexStore.loadAttr(spark, dir)
  }

  private def queries: Seq[(Long, String)] = Seq(
    100L -> base,
    101L -> (base + " tail3 extra3 pad3"),
    102L -> "entirely novel text no shingles shared with training data")

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSet

  test("artifact serve ≡ attributionTopK row for row (band dups deduped in " +
    "the agg; signatures through a parquet write/load roundtrip)") {
    import spark.implicits._
    val qdf = queries.toDF("doc_id", "text")
    val want = asTuples(DedupOps.attributionTopK(train, qdf).collect())
    val got = asTuples(StreamAttribution.serveTopK(qdf, index).collect())
    assert(want.nonEmpty && got == want)
    // the verbatim-copy query attributes both copies at 1e6, id order
    val top = got.filter(r => r._1 == 100L).toSeq.sortBy(_._5)
    assert(top.take(2).map(t => (t._2, t._4)) == Seq((1L, 1000000L), (2L, 1000000L)))
  }

  test("both artifact scans read ONLY probed buckets: PartitionFilters on " +
    "pb (bands) and tb (shingles)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val oneQuery = Seq(queries.head).toDF("doc_id", "text")
    // the band scan lives in the candidate stage's plan (serveTopK
    // checkpoints it before the rerank); the shingle scan in the
    // served plan
    val candStage = StreamAttribution.candidates(oneQuery, index)
    val served = StreamAttribution.serveTopK(oneQuery, index)
    def scansFor(stage: org.apache.spark.sql.DataFrame,
        tag: String, part: String): Unit = {
      val scans = stage.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(tag))
          => f
      }
      assert(scans.nonEmpty, s"the serve must scan the persisted $tag table")
      scans.foreach { f =>
        val static = f.partitionFilters.filterNot(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
        assert(static.nonEmpty &&
          static.exists(_.references.exists(_.name == part)),
          s"$tag scan must carry a literal $part partition filter, got ${f.partitionFilters}")
        val pruned = f.relation.location.listFiles(static, Nil).length
        val total = f.relation.location.listFiles(Nil, Nil).length
        assert(pruned < total,
          s"one query must prune the $tag scan, got $pruned of $total buckets")
      }
    }
    scansFor(candStage, "/bands", "pb")
    scansFor(served, "/shingles", "tb")
  }

  test("stream ≡ batch across 3 micro-batches (foreachBatch against the " +
    "loaded artifact), answers complete per batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val want = asTuples(StreamAttribution.serveTopK(
      queries.toDF("doc_id", "text"), index).collect())

    val mem = MemoryStream[(Long, String)]
    val qdf = mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long, Long)])]
    val query = StreamAttribution.serveStream(qdf, index) { (out, id) =>
      perBatch.synchronized { perBatch += id -> asTuples(out.collect()) }
    }
    try {
      mem.addData(queries(0)); query.processAllAvailable()
      val afterB1 = perBatch.synchronized(perBatch.flatMap(_._2).toSet)
      assert(afterB1.nonEmpty && afterB1.map(_._1) == Set(100L),
        "a query's attribution completes within its own micro-batch")
      mem.addData(queries(1)); query.processAllAvailable()
      mem.addData(queries(2)); query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.flatMap(_._2).toSet) == want,
        "streamed answers must equal the batch twin's")
    } finally query.stop()
  }
}
