package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.serving.IndexStore
import graft.serving.IndexStore.TextIndex

/** Streaming LEXICAL (BM25) serving against the persisted inverted
  * index — the text twin of [[StreamAnnServe]], completing the
  * offline/online split on the lexical side: `serve_text_index` /
  * [[graft.serving.IndexStore.writeText]] build the artifact once;
  * a continuous stream of term-set queries probes it.
  *
  *  1. PROBE — each query's distinct terms map to their term-hash
  *     buckets `tb`; the bounded distinct-tb set (≤ B regardless of
  *     batch size) becomes a literal filter on the postings/terms
  *     PARTITION column, so a micro-batch reads only the buckets its
  *     vocabulary touches — never the whole postings table.
  *  2. SCORE — one equi-join on term attaches (idf_milli) and fans
  *     out to the term's postings (tf, dl riding the posting row —
  *     no corpus-sized doc-length join); the per-(query, doc)
  *     contribution is [[graft.ops.TextOps.bm25TopDocs]]'s EXACT
  *     integer Okapi form with the corpus totals baked in as
  *     literals from the index manifest, so an index-served score
  *     can never disagree with the live-scan scorer.
  *  3. TOP-K — per-(query, doc) rollup then a per-query PARTIAL
  *     top-k aggregator ([[graft.functions.TopKScoreAgg]]: score
  *     DESC, doc_id ASC, exact-integer scores), k rows out per query
  *     — a stop-word query's corpus-sized candidate set merges
  *     map-side in ≤ k-row partials instead of sorting in one window
  *     partition.
  *
  * Streaming form: foreachBatch ([[serveStream]]) — the prune is a
  * literal filter derived from batch contents, the per-batch plan is
  * the batch twin's (see [[StreamAnnServe]]).
  *
  * Batch twin: `stream_bm25_topk` builds + loads the artifact and
  * serves the fixed [[graft.ops.TextOps.Bm25Terms]] query — it must
  * reproduce `txt_bm25` row for row (spec-pinned), so it shares that
  * committed DuckDB oracle. */
object StreamBm25Serve {

  /** Serve BM25 top-k for a BOUNDED frame of (q_id, terms) queries
    * against the loaded index. */
  def serveTopK(queries: DataFrame, index: TextIndex,
      k: Int = graft.ops.TextOps.Bm25TopK): DataFrame = {
    val qt = queries
      .select(col("q_id"), explode(array_distinct(col("terms"))).as("term"))
      .withColumn("tb", IndexStore.tbTermCol(col("term")))
    // bounded: distinct term buckets ≤ TextBuckets — one collect
    // prunes BOTH lexical tables
    val probedTb = graft.serving.ProbePrune.keys(qt, "tb")
    val terms = graft.serving.ProbePrune.scan(index.terms, "tb", probedTb)
      .select(col("term"), col("idf_milli"))
    val posts = graft.serving.ProbePrune.scan(index.postings, "tb", probedTb)
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    val (nT, nD) = (index.nTokens, index.nDocs)
    val topk = udaf(new graft.functions.TopKScoreAgg(k))
    qt.join(terms, Seq("term"))
      .join(posts, Seq("term"))
      .withColumn("contrib",
        expr(s"(idf_milli * 22 * ${nT}L * tf) div " +
          s"(10 * ${nT}L * tf + 3 * ${nT}L + 9 * dl * ${nD}L)"))
      .groupBy("q_id", "doc_id", "dl")
      .agg(sum("contrib").as("score_u"),
        count(lit(1)).as("n_hit_terms"))
      .groupBy("q_id")
      .agg(topk(col("doc_id"), col("dl"), col("n_hit_terms"),
        col("score_u")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.doc_id").as("doc_id"),
        col("col.dl").as("dl"), col("col.n_hit_terms").as("n_hit_terms"),
        col("col.score_u").as("score_u"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Streaming BM25: each micro-batch of term-set queries served by
    * [[serveTopK]] against the same loaded artifact (foreachBatch —
    * see [[StreamAnnServe.serveStream]] for why). */
  def serveStream(queries: DataFrame, index: TextIndex,
      k: Int = graft.ops.TextOps.Bm25TopK)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), index, k), id))
      .start()

  /** [[serveStream]] bound to the artifact DIRECTORY: generation
    * re-resolved per micro-batch ([[graft.serving.IndexStore
    * .GenCached]] — see [[StreamAnnServe.serveStreamFrom]]). */
  def serveStreamFrom(queries: DataFrame, dir: String,
      k: Int = graft.ops.TextOps.Bm25TopK)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = queries.sparkSession
    val cache = new graft.serving.IndexStore.GenCached[TextIndex](
      spark, dir, g => graft.serving.IndexStore.loadTextAt(spark, dir, g))
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), cache.get(), k), id))
      .start()
  }
}
