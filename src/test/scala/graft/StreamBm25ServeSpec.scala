package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps
import graft.serving.IndexStore
import graft.streaming.StreamBm25Serve

/** The streaming BM25 path (persisted term-bucketed inverted index +
  * probed-bucket pruning + per-query bounded top-k) must (a)
  * reproduce the live-scan bm25TopDocs scorer row for row for ANY
  * term set — scores through the artifact's idf/tf/dl instead of the
  * per-query corpus derivation — (b) prune the postings/terms scans
  * to the query vocabulary's buckets, and (c) serve micro-batches ≡
  * batch (foreachBatch). */
class StreamBm25ServeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }

  private lazy val index: IndexStore.TextIndex = {
    val dir = IndexStore.scratchDir("spec_text", "text")
    IndexStore.writeText(docs, dir)
    IndexStore.loadText(spark, dir)
  }

  /** Three query term sets: the driver's fixed set, a subset, and one
    * with an out-of-vocabulary term (must contribute nothing). */
  private val termSets: Seq[(Long, Seq[String])] = Seq(
    0L -> TextOps.Bm25Terms,
    1L -> Seq("vector", "data"),
    2L -> Seq("spark", "zzz_not_in_vocab", "hash"))

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSet

  test("artifact serve ≡ bm25TopDocs row for row, per query term set " +
    "(incl. an out-of-vocabulary term contributing nothing)") {
    import spark.implicits._
    val qdf = termSets.toDF("q_id", "terms")
    val got = StreamBm25Serve.serveTopK(qdf, index).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    termSets.foreach { case (qId, terms) =>
      val want = TextOps.bm25TopDocs(docs, terms).collect()
        .zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), (i + 1).toLong) }
        .map(t => (t._1, t._2, t._3, t._4, t._5)).toSet
      assert(want.nonEmpty && got(qId).map(t =>
        (t._1, t._2, t._3, t._4, t._5)) == want,
        s"query $qId (terms=$terms) must match the live scorer")
    }
  }

  test("postings/terms scans read ONLY the query vocabulary's buckets: " +
    "PartitionFilters on tb") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val oneQuery = Seq(1L -> Seq("vector")).toDF("q_id", "terms")
    val served = StreamBm25Serve.serveTopK(oneQuery, index)
    Seq("/postings", "/terms").foreach { tag =>
      val scans = served.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(tag))
          => f
      }
      assert(scans.nonEmpty, s"the serve must scan the persisted $tag table")
      scans.foreach { f =>
        val static = f.partitionFilters.filterNot(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
        assert(static.nonEmpty &&
          static.exists(_.references.exists(_.name == "tb")),
          s"$tag scan must carry a literal tb partition filter, got ${f.partitionFilters}")
        val pruned = f.relation.location.listFiles(static, Nil).length
        val total = f.relation.location.listFiles(Nil, Nil).length
        assert(pruned == 1 && pruned < total,
          s"a one-term query must read exactly its bucket, got $pruned of $total")
      }
    }
  }

  test("stream ≡ batch across 3 micro-batches (foreachBatch against the " +
    "loaded artifact), answers complete per batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val want = asTuples(StreamBm25Serve.serveTopK(
      termSets.toDF("q_id", "terms"), index).collect())

    val mem = MemoryStream[(Long, Seq[String])]
    val qdf = mem.toDF().select(col("_1").as("q_id"), col("_2").as("terms"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long, Long)])]
    val query = StreamBm25Serve.serveStream(qdf, index) { (out, id) =>
      perBatch.synchronized {
        perBatch += id -> out.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      }
    }
    try {
      mem.addData(termSets(0)); query.processAllAvailable()
      val afterB1 = perBatch.synchronized(perBatch.flatMap(_._2).toSet)
      assert(afterB1.nonEmpty && afterB1.map(_._1) == Set(0L),
        "a query's answer must complete within its own micro-batch")
      mem.addData(termSets(1)); query.processAllAvailable()
      mem.addData(termSets(2)); query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.flatMap(_._2).toSet) == want,
        "streamed answers must equal the batch twin's")
    } finally query.stop()
  }
}
