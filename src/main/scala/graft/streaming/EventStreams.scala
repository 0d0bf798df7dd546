package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table (SURVEY §2.3
  * "Streaming" row — absent in the reference, engine roadmap §7 M9).
  *
  * Every transformation here is written against a plain DataFrame and
  * works UNCHANGED on a batch read or a `readStream` source — the
  * Structured Streaming contract. Batch runs double as DuckDB-oracle
  * correctness checks (see [[StreamOps]]); streaming execution
  * (watermarks, append-mode window closes, late-data drops, state
  * timeouts) is exercised with MemoryStream in EventStreamsSpec.
  *
  * Scale notes: windowed aggs shuffle once on (window, key) with
  * partial aggregation map-side; session windows shuffle on user_id —
  * the natural key at any scale; state size is bounded by watermark
  * eviction (tumbling/sliding) or EventTimeTimeout (custom sessions).
  */
object EventStreams {

  /** The tumbling count/sum aggregation WITHOUT a watermark — shared by
    * [[tumblingCounts]] (which declares one) and [[dedupThenTumbling]]
    * (whose upstream dedup already declared it; re-declaring a
    * watermark across chained stateful operators is an
    * AnalysisException in streaming). */
  private def tumblingAgg(events: DataFrame, window: String): DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value_c"))

  /** STREAMING DRIFT MONITOR — the windowed twin of
    * [[graft.ops.QualityOps.driftChi2]]: per tumbling window, each
    * event type's observed count against the STATIC reference profile's
    * expected per-window rate (history count div history window count),
    * as an exact-integer chi-square contribution in ppm. The production
    * shape: reference = yesterday's profile, stream = today's ingest;
    * a traffic flood or outage in any window dominates its row.
    *
    * Stream legality is load-bearing in the plan order: Structured
    * Streaming forbids ANY join after an aggregation, so the reference
    * is broadcast onto raw events BEFORE the windowed agg (the
    * [[enrichedTumbling]] pattern) and carried through with max() —
    * the chi2 itself is a stateless post-agg projection. The reference
    * window count is one driver scalar off the STATIC side (legal
    * before stream start; the BM25 df/N idiom).
    *
    * Integer bounds: expected ≤ history/type/windows and n_events is
    * per-window bounded (windows grow in NUMBER with data span, not in
    * size), so (n−e)²·10⁶ stays far inside int64 at any corpus scale.
    * Batch form on the same table is the DuckDB oracle; stream ≡ batch
    * row-for-row is pinned in StreamDriftSpec. */
  def tumblingDrift(events: DataFrame, refEvents: DataFrame,
      window: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val nWin = refEvents
      .select(countDistinct(expr("unix_micros(ts) div 3600000000")))
      .first().getLong(0)
    val ref = refEvents.groupBy("event_type")
      .agg(expr(s"count(1) div ${math.max(nWin, 1L)}L").as("expected"))
    val wm = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    wm.join(broadcast(ref), Seq("event_type"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), max("expected").as("expected"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("expected"),
        expr("((n_events - expected) * (n_events - expected) * 1000000)" +
          " div greatest(expected, 1)").as("chi2_ppm"))
  }

  /** Tumbling-window counts/sums per event type. Watermark bounds state
    * and admits ≤`watermark` of event-time lateness. */
  def tumblingCounts(
      events: DataFrame,
      window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    tumblingAgg(events.withWatermark("ts", watermark), window)

  /** Sliding-window average value (1 h window every 15 min → every
    * event lands in 4 windows). */
  def slidingStats(
      events: DataFrame,
      window: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("sum_value_c"))

  /** Per-user session windows with a 30 min inactivity gap
    * (`session_window`: events < gap apart merge; the session closes at
    * last event + gap). */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("sum_value_c"))

  /** Streaming exact dedup on event_id. In a stream the watermark lets
    * Spark evict seen-keys state; in batch it is a plain dropDuplicates. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** TWO stateful operators chained in one query — dedup state feeding
    * tumbling-window aggregation state (multiple stateful operators in
    * append mode are a Spark 4 capability; older versions rejected this
    * plan). Batch: dropDuplicates → groupBy, DuckDB-oracle-checked. */
  def dedupThenTumbling(
      events: DataFrame,
      window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    tumblingAgg(dedupEvents(events, watermark), window)

  /** Stream-stream join: purchases joined to the same user's clicks
    * within [-30 min, 0] of the purchase. Both sides carry watermarks
    * so Spark can bound the join state (late side evicted once the
    * watermark passes the join window). Works unchanged in batch. */
  def purchaseClickJoin(
      events: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** LEFT OUTER stream-stream join: like [[purchaseClickJoin]] but a
    * purchase with no in-window click still emits, null-padded. In a
    * stream, Spark holds the unmatched purchase in state until the
    * CLICK-side watermark passes the join window's upper bound (only
    * then is "no match" final) and emits the null row — verified in
    * EventStreamsSpec. In batch it is a plain left join, so the DuckDB
    * oracle covers the match semantics. */
  def purchaseClickLeftJoin(
      events: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  // ------------------------------------------------- custom state (FMGWS)

  /** `ts` stays alongside the derived micros: event-time timeout
    * requires the WATERMARKED timestamp column to survive into the
    * grouped Dataset (projecting it away fails analysis). */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, us: Long, value_c: Long)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, sumC: Long)
  final case class SessionOut(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long, sum_value_c: Long)

  /** Stream-STATIC enrichment: the dimension side is a bounded table
    * broadcast to every task — stateless per event (no join state, no
    * watermark interplay), the standard shape for profile/metadata
    * enrichment of a 100 TB/day event firehose. The windowed aggregate
    * AFTER the join is the only stateful operator. Same code runs
    * batch for the DuckDB oracle. */
  def enrichedTumbling(events: DataFrame, dim: DataFrame,
      eventKey: String = "user_id", dimKey: String = "c_custkey",
      dimAttr: String = "c_mktsegment",
      window: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    wm.join(broadcast(dim.select(col(dimKey), col(dimAttr))),
        col(eventKey) === col(dimKey))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col(dimAttr))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col(dimAttr), col("n_events"), col("sum_value_c"))
  }

  /** Custom sessionization via flatMapGroupsWithState: a session breaks
    * after > gapUs of event-time silence (the win_sessionize contract).
    *
    * Streaming: EventTimeTimeout + watermark emit a session once no
    * more in-gap events can arrive. Batch: each group's full history
    * arrives in one call (sorted here — Spark gives no intra-group
    * order) and all sessions are emitted, which makes the operator
    * DuckDB-oracle-checkable on the batch table. */
  def statefulSessions(
      events: Dataset[Ev], gapUs: Long = 1800000000L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    // captured OUTSIDE the closure: inside, GroupState has no reliable
    // batch/streaming probe (and setTimeoutTimestamp throws in batch)
    val streaming = events.isStreaming

    def close(u: Long, s: SessionState) = SessionOut(u, s.startUs, s.lastUs, s.n, s.sumC)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (!it.hasNext) {
            if (state.hasTimedOut && state.exists) {
              val out = close(user, state.get)
              state.remove()
              Iterator.single(out)
            } else Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.us, e.value_c))
            var cur = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              if (cur == null) cur = SessionState(e.us, e.us, 1, e.value_c)
              else if (e.us - cur.lastUs > gapUs) {
                out += close(user, cur)
                cur = SessionState(e.us, e.us, 1, e.value_c)
              } else cur = cur.copy(
                lastUs = math.max(cur.lastUs, e.us), n = cur.n + 1, sumC = cur.sumC + e.value_c)
            }
            if (streaming) {
              // keep the open session in state; emit it at event-time
              // timeout (watermark passes last event + gap)
              state.update(cur)
              state.setTimeoutTimestamp(cur.lastUs / 1000 + gapUs / 1000 + 1)
              out.iterator
            } else {
              // batch: the group is complete — emit the final session too
              (out :+ close(user, cur)).iterator
            }
          }
      }
  }

  final case class TypedEv(event_type: String, ts: java.sql.Timestamp, us: Long)
  final case class WinTopOut(
      window_start_us: Long, rk: Long, event_type: String, n: Long)
  final case class TypeCounts(counts: Map[String, Long])

  /** Batch events → typed (event_type, ts, us) rows for [[windowTopTypes]]. */
  def toTypedEv(events: DataFrame): Dataset[TypedEv] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), col("ts"),
      unix_micros(col("ts")).as("us")).as[TypedEv]
  }

  /** Windowed top-k: the k most frequent event types per tumbling
    * window, rank ties broken by type name. A streaming RANK over an
    * aggregate is not expressible in append mode (the agg output is
    * itself a stream), so this is flatMapGroupsWithState keyed by
    * WINDOW START: state is one small counts map per open window,
    * emitted and evicted when the watermark passes the window end.
    * Batch: each window's events arrive in one group call — emit
    * immediately, which keeps the operator DuckDB-oracle-checkable.
    *
    * Scale: one shuffle keyed by window; per-group state is
    * O(#distinct types), not O(#events); windows close monotonically
    * so state count is bounded by watermark lag / window size. */
  def windowTopTypes(events: Dataset[TypedEv],
      windowUs: Long = 3600000000L, k: Int = 3): Dataset[WinTopOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming

    def topk(ws: Long, counts: Map[String, Long]): Seq[WinTopOut] =
      counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
        .map { case ((t, n), i) => WinTopOut(ws, i + 1L, t, n) }

    events
      .groupByKey(e => e.us / windowUs * windowUs)
      .flatMapGroupsWithState[TypeCounts, WinTopOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ws: Long, it: Iterator[TypedEv], state: GroupState[TypeCounts]) =>
          if (!it.hasNext) {
            if (state.hasTimedOut && state.exists) {
              val out = topk(ws, state.get.counts)
              state.remove()
              out.iterator
            } else Iterator.empty
          } else {
            val m = scala.collection.mutable.Map.empty[String, Long]
            state.getOption.foreach(_.counts.foreach { case (t, n) =>
              m.update(t, m.getOrElse(t, 0L) + n) })
            it.foreach(e => m.update(e.event_type, m.getOrElse(e.event_type, 0L) + 1L))
            if (streaming) {
              state.update(TypeCounts(m.toMap))
              // close when the watermark passes the window end
              state.setTimeoutTimestamp((ws + windowUs) / 1000 + 1)
              Iterator.empty
            } else topk(ws, m.toMap).iterator
          }
      }
  }

  /** Batch events → typed Ev rows (micros + integer cents). */
  def toEv(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("user_id"),
      col("ts"),
      unix_micros(col("ts")).as("us"),
      round(col("value") * 100).cast("long").as("value_c")).as[Ev]
  }

  /** Streaming entry: file/memory source → the same transformations.
    * (Parquet dir example; any streaming source slots in.) */
  def readEventStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)
}
