package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{AsofJoin, RangeJoin}

/** Temporal join operators over the events table: as-of join (latest
  * earlier row per key) and banded range join — the SURVEY §2.3
  * "as-of / interval / range" row. DuckDB's native ASOF JOIN is the
  * oracle for the former; a plain inequality join for the latter.
  */
object TemporalOps {

  type QFn = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").withColumn("us", unix_micros(col("ts")))

  val queries: Map[String, QFn] = Map(
    // for each purchase: the same user's most recent prior-or-equal click
    "asof_purchase_click" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("us"))
      AsofJoin.asof(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightPayload = Map("event_id" -> "click_event_id", "us" -> "click_us"),
          tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"),
          col("us").as("purchase_us"),
          col("click_event_id"), col("click_us"),
          (col("us") - col("click_us")).as("gap_us"))
    }),

    // identical semantics via the custom physical operator
    // (AsofJoinNode → AsofJoinStrategy → AsofJoinExec streaming merge):
    // same oracle as asof_purchase_click, so the DuckDB hash compare
    // pins the tier-(c) extension path end-to-end, not just in specs
    "asof_native_purchase_click" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("us"))
      graft.plans.AsofJoinNative.asof(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightPayload = Map("event_id" -> "click_event_id", "us" -> "click_us"),
          tieBreak = Seq("event_id"),
          broadcast = Some(false)) // pin the co-partitioned merge: this
          // query IS the committed x2:s2 shuffle-contract evidence;
          // asof_bcast_purchase_click exercises the size-based pick
        .select(col("user_id"), col("event_id"),
          col("us").as("purchase_us"),
          col("click_event_id"), col("click_us"),
          (col("us") - col("click_us")).as("gap_us"))
    }),

    // same semantics a THIRD time, via the broadcast as-of exec: the
    // strategy is left UNHINTED here, so the size-based pick itself is
    // under oracle — at correctness-gate scale the click timeline's
    // plan stats sit under autoBroadcastJoinThreshold and
    // AsofJoinStrategy lowers to BroadcastAsofJoinExec (asserted in
    // BroadcastAsofSpec): the purchase side keeps its scan
    // partitioning, never shuffles, never sorts; clicks broadcast once
    // and index per executor. The 100 TB shape for "enrich every event
    // with the in-force config/price at its timestamp".
    "asof_bcast_purchase_click" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("us"))
      graft.plans.AsofJoinNative.asof(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightPayload = Map("event_id" -> "click_event_id", "us" -> "click_us"),
          tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"),
          col("us").as("purchase_us"),
          col("click_event_id"), col("click_us"),
          (col("us") - col("click_us")).as("gap_us"))
    }),

    // all same-user event pairs within 60 s of each other
    "range_event_pairs" -> ((s, d) =>
      RangeJoin.bandedSelfPairs(events(s, d),
        keyCol = "user_id", idCol = "event_id", valCol = "us",
        band = 60000000L)),

    // Trailing-7-day distinct users per active day, computed from
    // reusable DAILY partials — the rollup-reuse pattern behind every
    // "sliding distinct" dashboard metric at scale. The raw log is
    // scanned ONCE into one per-day distinct set (map-side partial
    // collect_set, |days| output rows); each day-partial is then
    // fanned out to the ≤ 7 windows it belongs to and merged per
    // anchor day. Every post-scan shuffle moves |days| × |per-day
    // distinct| rows — independent of |events| — where the naive
    // shapes either re-scan the log per window or range-join events
    // 7× (|events|-proportional both times). A global window over the
    // partials would also work but serializes onto one task; the
    // explode keeps the merge keyed and parallel. At unbounded user
    // cardinality the exact set partial swaps for a mergeable sketch
    // partial (KMV — `agg_kmv_distinct`) with the SAME fan-out/merge
    // shape; at sf the user dimension is small so the exact set is
    // the right partial and the oracle can hash-match it.
    "ts_sliding_distinct" -> ((s, d) =>
      slidingDistinct(t(s, d, "events"), "ts", "user_id"))
  )

  /** Distinct `idCol` values per trailing `window`-day window, one row
    * per day that has data (`day` = yyyy-MM-dd string, `u7` = count).
    * See the `ts_sliding_distinct` scaladoc above for the shape
    * rationale; day arithmetic is on integer day numbers, so calendar
    * gaps are handled exactly (a day-partial fans out only to window
    * anchors within range, whether or not those days exist). */
  def slidingDistinct(ev: DataFrame, tsCol: String, idCol: String,
      window: Int = 7): DataFrame = {
    val daily = ev
      .groupBy(
        date_format(date_trunc("day", col(tsCol)), "yyyy-MM-dd").as("day"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).as("day_num"))
      .agg(collect_set(col(idCol)).as("us"))
      .localCheckpoint(eager = false) // read twice: fan-out + anchors
    val merged = daily
      .select(
        explode(sequence(col("day_num"), col("day_num") + (window - 1)))
          .as("win"),
        col("us"))
      .groupBy("win")
      .agg(array_distinct(flatten(collect_list(col("us")))).as("users"))
    daily.select(col("day"), col("day_num").as("win"))
      .join(merged, "win") // anchor windows only at days with data
      .select(col("day"), size(col("users")).cast("long").as("u7"))
  }

  val oracle: Map[String, String] = Map(
    "asof_purchase_click" ->
      """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  c.event_id AS click_event_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "asof_native_purchase_click" ->
      """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  c.event_id AS click_event_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "asof_bcast_purchase_click" ->
      """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  c.event_id AS click_event_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "range_event_pairs" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |  abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000""".stripMargin,

    // independent recomputation: a date-range join straight off the
    // raw log — no partials — so a fan-out/merge bug can't be mirrored
    "ts_sliding_distinct" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day FROM events GROUP BY 1)
        |SELECT strftime(a.day, '%Y-%m-%d') AS day,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS u7
        |FROM daily a
        |JOIN events e ON CAST(e.ts AS DATE) BETWEEN a.day - 6 AND a.day
        |GROUP BY 1""".stripMargin
  )
}
