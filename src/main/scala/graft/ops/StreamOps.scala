package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.streaming.EventStreams

/** Batch-mode oracle checks for the Structured Streaming surface: each
  * [[EventStreams]] transformation runs unchanged on the batch events
  * table (the Structured Streaming contract), so its event-time
  * semantics — window alignment, session merging, custom state — are
  * hash-checked against DuckDB. Watermark/late-data/timeout behavior
  * (stream-only) is covered by EventStreamsSpec with MemoryStream.
  */
object StreamOps {

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "stream_tumbling" -> ((s, d) =>
      EventStreams.tumblingCounts(t(s, d, "events"))),
    "stream_sliding" -> ((s, d) =>
      EventStreams.slidingStats(t(s, d, "events"))),
    "stream_session_window" -> ((s, d) =>
      EventStreams.sessionWindows(t(s, d, "events"))),
    "stream_stateful_sessions" -> ((s, d) =>
      EventStreams.statefulSessions(EventStreams.toEv(t(s, d, "events"))).toDF()),
    "stream_dedup" -> ((s, d) =>
      EventStreams.dedupEvents(t(s, d, "events"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_value_c"))),
    "stream_interval_join" -> ((s, d) =>
      EventStreams.purchaseClickJoin(t(s, d, "events"))),
    "stream_interval_join_left" -> ((s, d) =>
      EventStreams.purchaseClickLeftJoin(t(s, d, "events"))),
    "stream_dedup_tumbling" -> ((s, d) =>
      EventStreams.dedupThenTumbling(t(s, d, "events"))),
    "stream_topk_window" -> ((s, d) =>
      EventStreams.windowTopTypes(
        EventStreams.toTypedEv(t(s, d, "events"))).toDF()),
    "stream_static_enrich" -> ((s, d) =>
      EventStreams.enrichedTumbling(t(s, d, "events"), t(s, d, "customer"))),
    "stream_drift_chi2" -> ((s, d) =>
      EventStreams.tumblingDrift(t(s, d, "events"), t(s, d, "events"))),
    // streaming ANN serving (batch twin): build + persist the IVF
    // index artifact, load it, serve the bounded query batch from the
    // cid-partitioned assignment (probed cells prune the scan) — must
    // reproduce sim_ivf_topk row for row, so it shares that oracle
    "stream_ann_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val dir = graft.serving.IndexStore.scratchDir(d, "ann")
      graft.serving.IndexStore.ensureAnn(e, dir,
        graft.ops.SimilarityOps.IvfCentroids)
      graft.streaming.StreamAnnServe.serveTopK(
        e.filter(graft.ops.SimilarityOps.servingQueryPred(e))
          .select(col("vec_id"), col("embedding")),
        graft.serving.IndexStore.loadAnn(s, dir),
        nProbe = graft.ops.SimilarityOps.IvfProbe)
    }),
    // streaming graph-ANN serving (batch twin): build + persist the
    // kNN-graph artifact (src-bucketed edges, node-bucketed vectors,
    // entry points), serve the bounded query batch with
    // frontier-pruned hop joins — must reproduce sim_graph_topk row
    // for row, so it shares that oracle
    "stream_graph_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val dir = graft.serving.IndexStore.scratchDir(d, "knn")
      graft.serving.IndexStore.ensureKnn(e, dir)
      graft.streaming.StreamGraphServe.serveTopK(
        e.filter(graft.ops.SimilarityOps.servingQueryPred(e))
          .select(col("vec_id"), col("embedding")),
        graft.serving.IndexStore.loadKnn(s, dir))
    }),
    // streaming BM25 serving (batch twin): build + persist the
    // inverted-index artifact, serve the fixed Bm25Terms query from
    // the term-bucketed postings — must reproduce txt_bm25 row for
    // row, so it shares that oracle
    "stream_bm25_topk" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val dir = graft.serving.IndexStore.scratchDir(d, "text")
      graft.serving.IndexStore.ensureText(docs, dir)
      val idx = graft.serving.IndexStore.loadText(s, dir)
      import s.implicits._
      val q = Seq((0L, graft.ops.TextOps.Bm25Terms)).toDF("q_id", "terms")
      graft.streaming.StreamBm25Serve.serveTopK(q, idx)
        .select(col("doc_id"), col("dl"), col("n_hit_terms"),
          col("score_u"))
    })
  )

  val oracle: Map[String, String] = Map(
    // the serving stream's batch twin is sim_ivf_topk row for row
    // (same first-K centroids, probe count, tie-breaks), so its
    // oracle is the identical committed IVF CTE chain
    "stream_ann_topk" -> graft.ops.SimilarityOps.oracle("sim_ivf_topk"),
    // the graph serve's batch twin is sim_graph_topk row for row
    // (same entry points, hop unrolling, beam, tie-breaks)
    "stream_graph_topk" -> graft.ops.SimilarityOps.oracle("sim_graph_topk"),
    // the lexical serve's batch twin is txt_bm25 row for row (same
    // terms, integer Okapi form, tie-breaks) — identical committed CTE
    "stream_bm25_topk" -> graft.ops.TextOps.oracle("txt_bm25"),
    // Spark's tumbling windows are epoch-aligned: start = us - us % len
    "stream_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1, 2""".stripMargin,

    // 1 h window / 15 min slide: every event is in exactly 4 windows
    // with starts (us//sl - k)*sl for k in 0..3
    "stream_sliding" ->
      """SELECT ((epoch_us(ts) // 900000000) - k) * 900000000 AS window_start_us,
        |  COUNT(1) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) ks
        |GROUP BY 1""".stripMargin,

    // session_window semantics: a gap >= 30 min breaks; end = last + gap
    "stream_session_window" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(ROUND(value*100) AS BIGINT) AS vc,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        |), s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us,
        |  COUNT(1) AS n_events, CAST(SUM(vc) AS BIGINT) AS sum_value_c
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "stream_static_enrich" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  c_mktsegment, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    // batch replay of the streaming drift monitor: same hour windows
    // as stream_tumbling, reference rate = per-type history count over
    // distinct hour windows (integral division both times)
    "stream_drift_chi2" ->
      """WITH nw AS (
        |  SELECT COUNT(DISTINCT epoch_us(ts) // 3600000000) AS n FROM events),
        |ref AS (
        |  SELECT event_type,
        |    CAST(COUNT(1) // GREATEST(nw.n, 1) AS BIGINT) AS expected
        |  FROM events, nw GROUP BY 1, nw.n),
        |w AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |    event_type, CAST(COUNT(1) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT w.window_start_us, w.event_type, w.n_events, r.expected,
        |  CAST(((n_events - expected) * (n_events - expected) * 1000000)
        |    // GREATEST(expected, 1) AS BIGINT) AS chi2_ppm
        |FROM w JOIN ref r USING (event_type)""".stripMargin,

    // FMGWS windowed top-k: rank ties broken by type name
    "stream_topk_window" ->
      """WITH w AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |    event_type
        |  FROM events),
        |c AS (SELECT window_start_us, event_type, COUNT(1) AS n
        |      FROM w GROUP BY 1, 2)
        |SELECT window_start_us, rk, event_type, n FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start_us
        |    ORDER BY n DESC, event_type ASC) AS rk
        |  FROM c) r
        |WHERE rk <= 3""".stripMargin,

    // custom FMGWS sessionizer: STRICT > gap breaks; end = last event
    "stream_stateful_sessions" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(ROUND(value*100) AS BIGINT) AS vc,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), ROUND(value*100))
        |), s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
        |  COUNT(1) AS n_events, CAST(SUM(vc) AS BIGINT) AS sum_value_c
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "stream_dedup" ->
      """SELECT COUNT(1) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM (SELECT DISTINCT ON (event_id) * FROM events)""".stripMargin,

    "stream_interval_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE""".stripMargin,

    "stream_interval_join_left" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE""".stripMargin,

    "stream_dedup_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM (SELECT DISTINCT ON (event_id) * FROM events)
        |GROUP BY 1, 2""".stripMargin
  )
}
