package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.DedupOps
import graft.serving.IndexStore
import graft.serving.IndexStore.AttrIndex

/** Streaming training-data ATTRIBUTION: a continuous stream of texts
  * (generated samples under audit, arriving benchmark docs) attributed
  * against a PREBUILT index of the training corpus — the lexical twin
  * of [[StreamAnnServe]]'s vector serving, answering the batch
  * `dedup_attribution_topk` question online.
  *
  * The serve reads the persisted band/shingle artifacts
  * ([[graft.serving.IndexStore.writeAttr]]), never raw train text:
  *
  *  1. SIGNATURE — each query row derives its shingle array and its
  *     MinHash band keys via the one-pass native kernels (narrow ops
  *     only — the property that let [[StreamLshDedup]] run the same
  *     derivation on a stream).
  *  2. PRUNE + CANDIDATES — the batch's band keys map to their
  *     (band, key-hash) buckets `pb`; the bounded distinct-pb set
  *     (≤ 2·B regardless of batch size) becomes a literal filter on
  *     the band table's PARTITION column, so the static scan reads
  *     only the buckets this batch collides with. The equi-join on
  *     (band, key) then yields candidates exactly as the batch
  *     operator does.
  *  3. RERANK + TOP-K — candidate t_ids prune the shingle artifact
  *     the same way (their `tb` buckets, ≤ B values, collected from
  *     the locally-checkpointed candidate frame), then exact
  *     sorted-intersection Jaccard in integer ppm and
  *     [[graft.functions.TopKJaccDistinctAgg]] per query (band
  *     duplicates carry identical scores, so the id-dedup top-k is
  *     safe), ≤ k rows of state per query.
  *
  * At 100 TB a micro-batch therefore pays its colliding buckets' IO
  * — |probed pb|/(2·B) of the band table and |candidate tb|/B of the
  * shingle table — where the previous in-plan form re-derived BOTH
  * tables from the full train corpus inside every micro-batch
  * (Structured Streaming re-executes the static side per batch).
  *
  * Because the prunes are literal filters derived from batch
  * contents, the streaming form runs through foreachBatch
  * ([[serveStream]]) — each micro-batch served by the SAME batch
  * function, so stream ≡ batch is structural (spec-pinned).
  *
  * Batch twin: `stream_attribution` builds the artifact, loads it,
  * and runs [[serveTopK]] on the bounded eval frame — it must equal
  * [[DedupOps.attributionTopK]] row for row (spec-pinned), so it
  * shares that committed DuckDB oracle. */
object StreamAttribution {

  /** The candidate stage as a pure plan (pre-checkpoint), so its
    * band-table pruning is spec-inspectable: query band keys →
    * probed-pb literal filter on the band artifact → (band, key)
    * equi-join → (q_id, q_shs, t_id, tb). */
  private[graft] def candidates(queries: DataFrame, index: AttrIndex,
      textCol: String = "text",
      bandDfCap: Int = DedupOps.AttributionBandDfCap): DataFrame = {
    val qb = DedupOps.bandKeys(
        queries.select(col("doc_id"), col(textCol),
          DedupOps.shingleHashes(col(textCol)).as("q_shs")),
        textCol, passthrough = Seq("q_shs"))
      .select(col("doc_id").as("q_id"), col("q_shs"), col("band"), col("key"))
      .withColumn("pb", IndexStore.pbCol(col("band"), col("key")))
    // bounded: distinct band buckets ≤ 2·AttrBuckets — the literal
    // partition filter pruning the band-table scan
    val tRaw = graft.serving.ProbePrune.scan(index.bands, "pb", qb)
      .select(col("t_id"), col("band"), col("key"))
    // hot-band guard, IDENTICAL to the batch operator's: a key's df
    // depends only on its own rows, which all live in its one bucket —
    // so the df computed over the PRUNED scan equals the full-table df
    // for every candidate key, and batch ≡ stream parity holds even
    // when the cap binds
    val keyDf = tRaw.groupBy("band", "key").agg(count(lit(1)).as("df"))
    val nHot = keyDf.filter(col("df") > bandDfCap).count()
    if (nHot > 0)
      attrLog.warn(s"serveTopK: dropping $nHot hot band bucket(s) with " +
        s"df > $bandDfCap from candidate generation")
    val tBands = tRaw.join(keyDf.filter(col("df") <= bandDfCap),
        Seq("band", "key"))
      .select(col("t_id"), col("band"), col("key"))
    qb.join(tBands, Seq("band", "key"))
      .select(col("q_id"), col("q_shs"), col("t_id"),
        IndexStore.tbCol(col("t_id")).as("tb"))
  }

  private lazy val attrLog =
    org.slf4j.LoggerFactory.getLogger("graft.streaming.StreamAttribution")

  def serveTopK(queries: DataFrame, index: AttrIndex,
      textCol: String = "text",
      k: Int = DedupOps.AttributionK,
      bandDfCap: Int = DedupOps.AttributionBandDfCap): DataFrame = {
    // candidates are the batch's band collisions — bounded; checkpoint
    // so the tb-collect below cannot re-run the band join
    val cand = candidates(queries, index, textCol, bandDfCap).localCheckpoint()
    val tArr = graft.serving.ProbePrune.scan(index.shingles, "tb", cand)
      .select(col("t_id"), col("t_shs"))
    val topk = udaf(new graft.functions.TopKJaccDistinctAgg(k))
    cand.join(tArr, Seq("t_id"))
      .withColumn("n_inter", graft.functions.TextNative
        .sorted_inter_count(col("q_shs"), col("t_shs")).cast("long"))
      .withColumn("n_union",
        size(col("q_shs")).cast("long") + size(col("t_shs")).cast("long")
          - col("n_inter"))
      .withColumn("jacc_ppm",
        expr("(n_inter * 1000000) div greatest(n_union, 1)"))
      .groupBy("q_id")
      .agg(topk(col("t_id"), col("n_inter"), col("jacc_ppm")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.t_id").as("t_id"),
        col("col.n_inter").as("n_inter"),
        col("col.jacc_ppm").as("jacc_ppm"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Streaming attribution: each micro-batch of texts served by
    * [[serveTopK]] against the same loaded artifact (foreachBatch —
    * see [[StreamAnnServe.serveStream]] for why). */
  def serveStream(queries: DataFrame, index: AttrIndex,
      textCol: String = "text", k: Int = DedupOps.AttributionK)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), index, textCol, k), id))
      .start()

  /** [[serveStream]] bound to the artifact DIRECTORY: generation
    * re-resolved per micro-batch ([[graft.serving.IndexStore
    * .GenCached]] — see [[StreamAnnServe.serveStreamFrom]]). */
  def serveStreamFrom(queries: DataFrame, dir: String,
      textCol: String = "text", k: Int = DedupOps.AttributionK)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = queries.sparkSession
    val cache = new graft.serving.IndexStore.GenCached[AttrIndex](
      spark, dir, g => graft.serving.IndexStore.loadAttrAt(spark, dir, g))
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), cache.get(), textCol, k), id))
      .start()
  }
}
