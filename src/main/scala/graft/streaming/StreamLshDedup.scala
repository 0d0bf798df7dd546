package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming ingest-time near-dup filter: MinHash-LSH bucket claiming
  * over Spark 4's arbitrary-state API — the "dedup against all history
  * without re-scanning the corpus" shape a continuously-fed training
  * pipeline needs (the batch pipeline — lshCandidatePairs → connected
  * components — re-reads the corpus per run; this keeps O(buckets)
  * state instead).
  *
  * Two chained `transformWithState` operators (`TimeMode.None`, no
  * timers, RocksDB store):
  *
  *  1. CLAIM, keyed by (band, key): one ValueState[Long] per LSH
  *     bucket remembering the first doc that claimed it (ties within a
  *     batch break to the lowest doc_id); every row comes out with a
  *     per-band `collided` verdict. Bucket space grows with distinct
  *     content over an infinite stream — bound it operationally by
  *     running the filter per retention epoch (fresh checkpoint per
  *     window), the recall/state trade every production stream dedup
  *     makes. (State TTL would express this in-place, but TTL requires
  *     TimeMode.ProcessingTime and a ProcessingTime TWS deadlocks
  *     `processAllAvailable` in Spark 4.1.2 local mode — probed and
  *     rejected rather than shipped untested.)
  *  2. VERDICT, keyed by doc_id: counts its nBands verdicts (they all
  *     arrive in the doc's own microbatch — stage 1 emits
  *     synchronously) and emits (doc_id, kept) once complete, clearing
  *     its state — so stage-2 state is transient within a batch.
  *
  * Semantics: a doc is KEPT iff it owns every one of its buckets —
  * the aggressive candidate-level filter (any bucket collision drops
  * the doc, no Jaccard rerank). First arrival wins across batches;
  * batch parity therefore holds for doc_id-ascending feeds, which is
  * what [[batchEquivalent]] computes relationally (owner = min doc_id
  * per bucket) and what the `dedup_stream_keep` driver query + DuckDB
  * oracle pin. StreamLshDedupSpec pins stream ≡ batch on a staged
  * MemoryStream feed including a cross-batch duplicate.
  */
object StreamLshDedup {

  final case class BandRow(band: Int, key: String, doc_id: Long)
  final case class Verdict(doc_id: Long, collided: Boolean)
  final case class Kept(doc_id: Long, kept: Boolean)

  /** Stage 1: first doc to touch an LSH bucket owns it. */
  class ClaimProcessor
      extends StatefulProcessor[(Int, String), BandRow, Verdict] {
    @transient private var owner: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
        tv: TimerValues): Iterator[Verdict] = {
      val sorted = rows.toSeq.sortBy(_.doc_id)
      if (sorted.isEmpty) return Iterator.empty
      val own =
        if (owner.exists()) owner.get()
        else { owner.update(sorted.head.doc_id); sorted.head.doc_id }
      sorted.iterator.map(r => Verdict(r.doc_id, r.doc_id != own))
    }
  }

  /** Stage 2: a doc is kept iff none of its nBands verdicts collided. */
  class VerdictProcessor(nBands: Int)
      extends StatefulProcessor[Long, Verdict, Kept] {
    @transient private var acc: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[(Long, Long)](
        "acc", Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(doc: Long, rows: Iterator[Verdict],
        tv: TimerValues): Iterator[Kept] = {
      var (seen, bad) = if (acc.exists()) acc.get() else (0L, 0L)
      rows.foreach { v => seen += 1; if (v.collided) bad += 1 }
      if (seen >= nBands) { acc.clear(); Iterator.single(Kept(doc, bad == 0L)) }
      else { acc.update((seen, bad)); Iterator.empty }
    }
  }

  /** Streaming (doc_id, text) → (doc_id, kept). Requires the RocksDB
    * state store provider. */
  def keep(docs: DataFrame, textCol: String = "text"): Dataset[Kept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBands = 2 // bandKeys emits 2 bands over the 4-lane signature
    graft.ops.DedupOps.bandKeys(docs, textCol)
      .select(col("band"), col("key"), col("doc_id")).as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new ClaimProcessor,
        TimeMode.None(), OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new VerdictProcessor(nBands),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch-relational equivalent of [[keep]] for a doc_id-ascending
    * feed: bucket owner = MIN doc_id, a doc survives iff it owns every
    * bucket. Two keyed aggregations + one semi-filter join — no state,
    * no Expand, oracle-checkable (driver query `dedup_stream_keep`). */
  def batchEquivalent(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bands = graft.ops.DedupOps.bandKeys(docs, textCol)
    val owners = bands.groupBy("band", "key").agg(min("doc_id").as("owner"))
    val verdict = bands.join(owners, Seq("band", "key"))
      .groupBy("doc_id")
      .agg(max(when(col("owner") =!= col("doc_id"), 1).otherwise(0)).as("collided"))
    docs.join(verdict.filter(col("collided") === 0).select("doc_id"), "doc_id")
  }
}
