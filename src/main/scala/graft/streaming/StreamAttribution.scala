package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Streaming training-data ATTRIBUTION: a continuous stream of texts
  * (generated samples under audit, arriving benchmark docs) attributed
  * against a STATIC training corpus — the lexical twin of
  * [[StreamAnnServe]]'s vector serving, answering the batch
  * `dedup_attribution_topk` question online.
  *
  * Every stage is streaming-legal by design (no windows, no sorts, no
  * distinct on the stream):
  *
  *  1. SIGNATURE — each query row derives its shingle array and its
  *     MinHash band keys via the one-pass native kernels
  *     ([[DedupOps.bandKeys]] is narrow ops only — the property that
  *     let [[StreamLshDedup]] run the same derivation on a stream).
  *  2. CANDIDATES — stream-static INNER equi-join on (band, key)
  *     against the train corpus's band table, then a second
  *     stream-static join attaching the candidate's shingle array.
  *     Stateless; a pair arrives once per colliding band — the
  *     duplicate the batch path removed with distinct().
  *  3. RERANK + TOP-K — exact sorted-intersection Jaccard in integer
  *     ppm (a narrow projection), then streaming groupBy(q_id) with
  *     [[graft.functions.TopKJaccDistinctAgg]] — the TopKSimAgg
  *     partial-top-k contract plus id dedup (safe because band
  *     duplicates carry identical scores), ≤ k rows of state per
  *     query, update mode: a query's answer completes within its own
  *     micro-batch (candidates come only from the static side).
  *
  * At 100 TB the static side is the dedup serving index laid out once
  * (band table bucketed by (band, key), shingle arrays by doc id) and
  * a micro-batch pays only its own band-bucket collisions.
  *
  * Batch twin: the SAME function on a bounded query frame must equal
  * [[DedupOps.attributionTopK]] row for row (spec-pinned), so
  * `stream_attribution` shares that committed DuckDB oracle. */
object StreamAttribution {

  def serveTopK(queries: DataFrame, train: DataFrame,
      textCol: String = "text",
      k: Int = DedupOps.AttributionK): DataFrame = {
    val tBands = DedupOps.bandKeys(train, textCol)
      .select(col("doc_id").as("t_id"), col("band"), col("key"))
    val tArr = train.select(col("doc_id").as("t_id"),
      DedupOps.shingleHashes(col(textCol)).as("t_shs"))
    val qb = DedupOps.bandKeys(
        queries.select(col("doc_id"), col(textCol),
          DedupOps.shingleHashes(col(textCol)).as("q_shs")),
        textCol, passthrough = Seq("q_shs"))
      .select(col("doc_id").as("q_id"), col("q_shs"), col("band"), col("key"))
    val topk = udaf(new graft.functions.TopKJaccDistinctAgg(k))
    qb.join(tBands, Seq("band", "key"))
      .join(tArr, Seq("t_id"))
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
}
