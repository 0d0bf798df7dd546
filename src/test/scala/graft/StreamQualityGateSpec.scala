package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Streaming quality gate (`stream_quality_keep`): gopherKeep is a
  * stateless narrow projection, so it is streaming-legal verbatim —
  * stream ≡ batch across micro-batches with no watermark or state —
  * and each planted violator fails EXACTLY its own rule (the
  * QualityEnsembleSpec discipline applied to the per-doc gate). */
final case class QDoc(doc_id: Long, text: String, source: String)

class StreamQualityGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // one violator per Gopher rule + one clean doc
  private val docs = Seq(
    QDoc(1L, "the cat sat down near the door mat", "s"),          // passes all
    QDoc(2L, "the cat sleeps.", "s"),                             // r_words (3 toks)
    QDoc(3L, "a b c d e the", "s"),                               // r_wlen (mean < 3)
    QDoc(4L, "alpha beta gamma delta epsilon zeta", "s"),         // r_stop (none)
    QDoc(5L, "the cat sat on mat!!!!!!!", "s"))                   // r_punct

  private def flags(rows: Seq[QDoc]): Map[Long, (Boolean, Boolean, Boolean, Boolean, Boolean)] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    TextOps.gopherKeep(rows.toDF()).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
  }

  test("each planted violator fails exactly its own rule; the clean doc keeps") {
    val f = flags(docs)
    assert(f(1L) == ((true, true, true, true, true)))
    assert(f(2L) == ((false, true, true, true, false)))
    assert(f(3L) == ((true, false, true, true, false)))
    assert(f(4L) == ((true, true, false, true, false)))
    assert(f(5L) == ((true, true, true, false, false)))
  }

  test("stream equals batch across micro-batches, append mode, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = flags(docs)

    val mem = MemoryStream[QDoc]
    val q = TextOps.gopherKeep(mem.toDF())
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("qgate").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
        .toMap
      assert(streamed == batch, "stream must reproduce the batch gate")
    } finally q.stop()
  }
}
