package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming ingest-time near-dup filter: MinHash-LSH bucket claiming
  * over Spark 4's arbitrary-state API — the "dedup against all history
  * without re-scanning the corpus" shape a continuously-fed training
  * pipeline needs (the batch pipeline — lshCandidatePairs → connected
  * components — re-reads the corpus per run; this keeps O(buckets)
  * state instead).
  *
  * Two chained `transformWithState` operators (RocksDB store):
  *
  *  1. CLAIM, keyed by (band, key): one ValueState[Long] per LSH
  *     bucket remembering the first doc that claimed it (ties within a
  *     batch break to the lowest doc_id); every row comes out with a
  *     per-band `collided` verdict. Two flavors:
  *     - [[keep]] (TimeMode.None): bucket state lives for the life of
  *       the checkpoint; bound it operationally by running the filter
  *       per retention epoch (fresh checkpoint per window).
  *     - [[keepExpiring]] (TimeMode.EventTime): each bucket re-arms a
  *       single event-time timer at (current watermark + retention) on
  *       every batch that touches it; when the watermark passes the
  *       timer the bucket's owner is cleared IN-PLACE, so state holds
  *       only buckets touched within the retention horizon — no epoch
  *       restarts. (State TTL would also express this, but TTL
  *       requires TimeMode.ProcessingTime and a ProcessingTime TWS
  *       deadlocks `processAllAvailable` in Spark 4.1.2 local mode —
  *       see TwsProcessingTimeProbeSpec for the committed repro.)
  *
  *     Per-batch memory: when the bucket already has an owner the
  *     verdicts stream through a lazy single pass — zero buffering; a
  *     bucket's FIRST batch must find the min doc_id before any
  *     verdict is known, so it buffers that batch's doc_ids (8 B each,
  *     one bucket of one batch) — the only O(batch-slice) allocation,
  *     and only on first touch.
  *
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
  *
  * Precondition (both flavors): doc_ids are unique across the stream.
  * A re-ingested doc_id delivers nBands FRESH verdicts to stage 2
  * (whose state was cleared at emission), so it re-emits a second
  * Kept row for that doc_id — under [[keepExpiring]] that is exactly
  * the intended re-evaluation of a doc arriving after its buckets
  * expired; under [[keep]] treat output as "first verdict wins" or
  * keep feed ids unique.
  */
object StreamLshDedup {

  final case class BandRow(band: Int, key: String, doc_id: Long)
  final case class BandRowT(band: Int, key: String, doc_id: Long,
      ts: java.sql.Timestamp)
  final case class Verdict(doc_id: Long, collided: Boolean)
  final case class Kept(doc_id: Long, kept: Boolean)

  /** Claim core shared by both processors: stream verdicts lazily when
    * the owner is known; buffer doc_ids (only) to find the min on a
    * bucket's first-ever batch. */
  private def claim(owner: ValueState[Long],
      docIds: Iterator[Long]): Iterator[Verdict] =
    if (owner.exists()) {
      val own = owner.get()
      docIds.map(id => Verdict(id, id != own))
    } else {
      var minId = Long.MaxValue
      val ids = scala.collection.mutable.ArrayBuffer[Long]()
      docIds.foreach { id => ids += id; if (id < minId) minId = id }
      if (ids.isEmpty) Iterator.empty
      else {
        owner.update(minId)
        val own = minId
        ids.iterator.map(id => Verdict(id, id != own))
      }
    }

  /** Stage 1, epoch-bounded flavor: first doc to touch an LSH bucket
    * owns it until the checkpoint is retired. */
  class ClaimProcessor
      extends StatefulProcessor[(Int, String), BandRow, Verdict] {
    @transient private var owner: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
        tv: TimerValues): Iterator[Verdict] =
      claim(owner, rows.map(_.doc_id))
  }

  /** Stage 1, watermark-bounded flavor: same claim semantics, but the
    * bucket re-arms one event-time timer per touching batch at
    * (max event time seen + retentionMs); when the watermark passes it
    * the owner is cleared, so a duplicate arriving after retentionMs
    * of event-time silence on its bucket is (by design) KEPT — the
    * recall/state trade, made in-place instead of via checkpoint
    * retirement. The timer clock is event time, NOT the watermark:
    * the watermark is epoch-0 on the first batch (and lags during
    * backfill), which would expire freshly-claimed buckets instantly.
    *
    * Unlike [[ClaimProcessor]], this flavor always makes one eager
    * pass (buffering doc_ids, 8 B each, one bucket of one batch): the
    * timer timestamp needs the batch's max event time, which is only
    * known after consuming the single-pass row iterator, and timers
    * can only be registered inside handleInputRows. */
  class ExpiringClaimProcessor(retentionMs: Long)
      extends StatefulProcessor[(Int, String), BandRowT, Verdict] {
    @transient private var owner: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: (Int, String), rows: Iterator[BandRowT],
        tv: TimerValues): Iterator[Verdict] = {
      // late rows can trail the watermark: never arm in the past
      var maxTsMs = tv.getCurrentWatermarkInMs()
      var minId = Long.MaxValue
      val ids = scala.collection.mutable.ArrayBuffer[Long]()
      rows.foreach { r =>
        ids += r.doc_id
        if (r.doc_id < minId) minId = r.doc_id
        val t = r.ts.getTime
        if (t > maxTsMs) maxTsMs = t
      }
      if (ids.isEmpty) return Iterator.empty
      val own = if (owner.exists()) owner.get() else { owner.update(minId); minId }
      // exactly one live timer per bucket, pushed out on every touch
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(maxTsMs + retentionMs)
      ids.iterator.map(id => Verdict(id, id != own))
    }
    override def handleExpiredTimer(key: (Int, String), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Verdict] = {
      owner.clear()
      Iterator.empty
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

  /** bandKeys emits 2 bands over the 4-lane signature. */
  private val NBands = 2

  /** Streaming (doc_id, text) → (doc_id, kept); state bounded per
    * retention epoch (checkpoint retirement). Requires the RocksDB
    * state store provider. */
  def keep(docs: DataFrame, textCol: String = "text"): Dataset[Kept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.DedupOps.bandKeys(docs, textCol)
      .select(col("band"), col("key"), col("doc_id")).as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new ClaimProcessor,
        TimeMode.None(), OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new VerdictProcessor(NBands),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming (doc_id, text, ts) → (doc_id, kept) with in-place
    * watermark eviction of bucket state: `docs` must carry a watermark
    * on `tsCol` (TimeMode.EventTime requires it), and any bucket
    * untouched for `retentionMs` of watermark progress forgets its
    * owner. Requires the RocksDB state store provider. */
  def keepExpiring(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", retentionMs: Long = 24L * 3600 * 1000): Dataset[Kept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.DedupOps.bandKeys(docs, textCol, passthrough = Seq(tsCol))
      .select(col("band"), col("key"), col("doc_id"), col(tsCol).as("ts"))
      .as[BandRowT]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new ExpiringClaimProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new VerdictProcessor(NBands),
        TimeMode.None(), OutputMode.Append())
  }

  /** Offline snapshot of the claim store from a [[keepExpiring]] (or
    * [[keep]]) checkpoint, via Spark 4's `statestore` reader: one row
    * per live LSH bucket with its owning doc_id, as of the latest
    * committed batch — the operational "what does the dedup filter
    * currently remember" view, readable without touching the running
    * query (point-in-time via `.option("batchId", n)` upstream if
    * needed). `operatorId` 1 is the claim stage's position in the
    * chained plan (0 = the downstream verdict stage — Spark numbers
    * stateful operators sink-first); StateIntrospectionSpec pins both
    * the numbering and the key layout against the relational bandKeys
    * derivation, so a Spark change to either fails CI. */
  def ownerState(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", 1)
      .option("stateVarName", "owner")
      .load(checkpointDir)
      .select(col("key._1").as("band"), col("key._2").as("key"),
        col("value.value").as("owner"))

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

  /** Batch-relational equivalent of [[keepExpiring]]: bucket touches
    * are SESSIONIZED by event time (a gap > retentionUs between
    * consecutive touches of a bucket starts a fresh ownership — the
    * relational mirror of the expiry timer clearing the claim), the
    * session's first toucher owns it, and a doc survives iff it owns
    * every one of its buckets' sessions.
    *
    * One shuffle on (band, key) feeds both windows and the final
    * per-doc aggregation regroups on doc_id — no state, no corpus
    * re-scan, oracle-checkable (driver query `dedup_stream_keep_recent`).
    *
    * Streaming convergence caveat: the streaming operator expires a
    * bucket when the WATERMARK passes last-touch + retention, so a
    * duplicate can land in a microbatch where the gap already exceeds
    * retention but the watermark has not yet crossed the deadline —
    * it is then dropped where this formulation keeps it. With the
    * watermark advancing between touches (steady-state streams; the
    * parity spec's feed), the two agree exactly. */
  def batchEquivalentExpiring(docs: DataFrame, textCol: String = "text",
      tsUsCol: String = "ts_us", retentionUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = graft.ops.DedupOps.bandKeys(docs, textCol,
      passthrough = Seq(tsUsCol))
    val touchW = Window.partitionBy("band", "key")
      .orderBy(col(tsUsCol), col("doc_id"))
    val sess = bands
      .withColumn("gap_us", col(tsUsCol) - lag(col(tsUsCol), 1).over(touchW))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > retentionUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(touchW))
    val sessW = Window.partitionBy("band", "key", "sess_id")
      .orderBy(col(tsUsCol), col("doc_id"))
    val verdict = sess
      .withColumn("owner", first(col("doc_id")).over(sessW))
      .groupBy("doc_id")
      .agg(max(when(col("owner") =!= col("doc_id"), 1).otherwise(0)).as("collided"))
    docs.join(verdict.filter(col("collided") === 0).select("doc_id"), "doc_id")
  }
}
