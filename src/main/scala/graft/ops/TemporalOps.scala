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

    // all same-user event pairs within 60 s of each other
    "range_event_pairs" -> ((s, d) =>
      RangeJoin.bandedSelfPairs(events(s, d),
        keyCol = "user_id", idCol = "event_id", valCol = "us",
        band = 60000000L))
  )

  val oracle: Map[String, String] = Map(
    "asof_purchase_click" ->
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
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000""".stripMargin
  )
}
