package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, cents}

/** Table-maintenance operators a large-scale pipeline runs constantly:
  * MERGE-shaped upsert and snapshot diff (CDC). Both are pure
  * compositions of one keyed equi-join — the preferred implementation
  * order (SURVEY §7.1): no custom plan work, Catalyst broadcasts or
  * shuffles on the key as sizes dictate, AQE handles skew.
  */
object TableOps {

  /** MERGE INTO semantics without a table format: rows of `source`
    * override same-key rows of `target`; unmatched target rows are
    * kept; source-only keys are inserted. One full-outer equi-join on
    * the key — at scale both sides shuffle once on the key (or the
    * source broadcasts when small, the common CDC case).
    *
    * @param cols the non-key columns to carry (same names both sides).
    */
  def upsert(target: DataFrame, source: DataFrame,
      keys: Seq[String], cols: Seq[String]): DataFrame = {
    val src = source.select((keys ++ cols).map(c => col(c).as(s"_s_$c")): _*)
    val cond = keys.map(k => col(k) === col(s"_s_$k")).reduce(_ && _)
    target.join(src, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"_s_$k"), col(k)).as(k)) ++
          cols.map(c => coalesce(col(s"_s_$c"), col(c)).as(c)): _*)
  }

  /** Snapshot diff (CDC between two versions of a keyed table): one
    * row per key whose state changed, tagged `added` / `removed` /
    * `changed`. Change detection compares the given columns
    * null-safely. Same single keyed full-outer join shape as
    * [[upsert]]. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], cols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ cols).map(c => col(c).as(s"_o_$c")): _*)
    val n = newDf.select((keys ++ cols).map(c => col(c).as(s"_n_$c")): _*)
    val cond = keys.map(k => col(s"_o_$k") === col(s"_n_$k")).reduce(_ && _)
    val anyKeyOld = col(s"_o_${keys.head}")
    val anyKeyNew = col(s"_n_${keys.head}")
    val changed: Column = cols
      .map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, cond, "full_outer")
      .withColumn("change_type",
        when(anyKeyOld.isNull, "added")
          .when(anyKeyNew.isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change_type").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"_n_$k"), col(s"_o_$k")).as(k)) :+
          col("change_type"): _*)
  }

  /** SCD Type-2 history build from an observation log: collapse each
    * key's consecutive runs of an equal attribute value into validity
    * intervals `[valid_from, valid_to)`, `valid_to` NULL for the
    * current state — the gaps-and-islands pattern warehouses run on
    * every CDC feed.
    *
    * Scale shape: two windows and one aggregation, ALL partitioned by
    * the entity key — a single shuffle-partitioning by key serves the
    * run detection; no global ordering anywhere. Per-key history fits
    * a task because it is one entity's change log.
    *
    * @param tieBreak unique per-observation column ordering same-timestamp rows.
    */
  def scd2(obs: DataFrame, key: String, attr: String, tsCol: String,
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(tsCol).asc, col(tieBreak).asc)
    val prev = lag(col(attr), 1).over(w)
    val runs = obs
      .withColumn("_chg", when(prev.isNull || prev =!= col(attr), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // run_id disambiguates runs whose boundary observations share a
    // timestamp (the tie-broken event order can split them at equal ts)
    val w2 = Window.partitionBy(key).orderBy(col("valid_from").asc, col("run_id").asc)
    runs.groupBy(col(key), col("run_id"), col(attr))
      .agg(min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_obs"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
  }

  /** Incremental aggregate maintenance (the materialized-view pattern):
    * fold a new batch into an existing aggregate STATE without
    * rescanning history. Works for any decomposable aggregate kept as
    * mergeable state — here (count, sums); averages derive from them.
    *
    * Scale shape: the delta partial-aggregates map-side before its
    * shuffle, and the merge shuffles only |state| + |delta-partials|
    * rows — history is never read again. This is what turns a daily
    * 100 TB rescan into a per-batch merge costing only the batch.
    */
  def incrementalAgg(prevState: DataFrame, delta: DataFrame,
      keys: Seq[String], cntCol: String, sumCols: Seq[String]): DataFrame = {
    def reAgg(df: DataFrame, preCount: Boolean): DataFrame = {
      val aggs =
        (if (preCount) count(lit(1)).as(cntCol) else sum(col(cntCol)).as(cntCol)) +:
          sumCols.map(c => sum(col(c)).as(c))
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    reAgg(prevState.unionByName(reAgg(delta, preCount = true)), preCount = false)
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  /** Deterministic "source" for the upsert demo: every 10th customer
    * with its balance bumped 100.00, plus the same rows re-keyed past
    * the existing key range (the insert case). */
  private def mergeSource(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "customer").filter(col("c_custkey") % 10 === 0)
    val updates = base.withColumn("c_acctbal", col("c_acctbal") + 100.0)
    val inserts = base.withColumn("c_custkey", col("c_custkey") + 1000000L)
    updates.unionByName(inserts)
  }

  val queries: Map[String, QFn] = Map(
    "table_upsert" -> ((s, d) =>
      upsert(t(s, d, "customer"), mergeSource(s, d),
        keys = Seq("c_custkey"),
        cols = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          cents(col("c_acctbal")).as("bal_c"), col("c_mktsegment"))),

    "table_snapshot_diff" -> ((s, d) => {
      val old = t(s, d, "customer")
      // new version: every 7th balance changed, every 13th key dropped,
      // one block of re-keyed rows added
      val newV = upsert(
        old.filter(col("c_custkey") % 13 =!= 0),
        mergeSource(s, d).filter(col("c_custkey") % 7 === 0 || col("c_custkey") >= 1000000L),
        keys = Seq("c_custkey"),
        cols = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      snapshotDiff(old, newV,
        keys = Seq("c_custkey"),
        cols = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
        .select(col("c_custkey").cast("long").as("c_custkey"), col("change_type"))
    }),

    // incremental-maintenance demo: state built from pre-cutoff months,
    // one batch of post-cutoff rows merged in — the oracle recomputes
    // from scratch, proving merged state ≡ full recompute
    "table_incr_agg" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        cents(col("o_totalprice")).as("total_c"))
      val cutoff = "1995-07"
      val prevState = o.filter(col("month") < cutoff)
        .groupBy("o_orderstatus", "month")
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("total_c"))
      incrementalAgg(prevState, o.filter(col("month") >= cutoff),
          keys = Seq("o_orderstatus", "month"),
          cntCol = "n_orders", sumCols = Seq("total_c"))
        .select(col("o_orderstatus"), col("month"),
          col("n_orders"), col("total_c").as("sum_c"))
    }),

    // SCD2 over the event log: each user's event_type as the tracked
    // attribute, micros since epoch as the validity clock
    "table_scd2" -> ((s, d) => {
      val ev = t(s, d, "events").withColumn("us", unix_micros(col("ts")))
        .select("user_id", "event_type", "us", "event_id")
      scd2(ev, key = "user_id", attr = "event_type", tsCol = "us",
          tieBreak = "event_id")
        .select(col("user_id"), col("run_id"), col("event_type"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"), col("n_obs"))
    })
  )

  private val srcSql =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey % 10 = 0
      |UNION ALL
      |SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey % 10 = 0""".stripMargin

  val oracle: Map[String, String] = Map(
    "table_upsert" ->
      s"""WITH src AS ($srcSql)
         |SELECT CAST(COALESCE(s.c_custkey, t.c_custkey) AS BIGINT) AS c_custkey,
         |  COALESCE(s.c_name, t.c_name) AS c_name,
         |  CAST(COALESCE(s.c_nationkey, t.c_nationkey) AS BIGINT) AS c_nationkey,
         |  CAST(ROUND(COALESCE(s.c_acctbal, t.c_acctbal) * 100) AS BIGINT) AS bal_c,
         |  COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
         |FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey""".stripMargin,

    "table_snapshot_diff" ->
      s"""WITH src AS ($srcSql),
         |newv AS (
         |  SELECT CAST(COALESCE(s.c_custkey, t.c_custkey) AS BIGINT) AS c_custkey,
         |    COALESCE(s.c_name, t.c_name) AS c_name,
         |    CAST(COALESCE(s.c_nationkey, t.c_nationkey) AS BIGINT) AS c_nationkey,
         |    COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
         |    COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
         |  FROM (SELECT * FROM customer WHERE c_custkey % 13 != 0) t
         |  FULL OUTER JOIN (SELECT * FROM src
         |                   WHERE c_custkey % 7 = 0 OR c_custkey >= 1000000) s
         |    ON t.c_custkey = s.c_custkey),
         |j AS (
         |  SELECT o.c_custkey AS ok, n.c_custkey AS nk,
         |    CASE WHEN o.c_custkey IS NULL THEN 'added'
         |         WHEN n.c_custkey IS NULL THEN 'removed'
         |         WHEN NOT (o.c_name IS NOT DISTINCT FROM n.c_name
         |               AND o.c_nationkey IS NOT DISTINCT FROM n.c_nationkey
         |               AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
         |               AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
         |         THEN 'changed' END AS change_type
         |  FROM customer o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey)
         |SELECT CAST(COALESCE(nk, ok) AS BIGINT) AS c_custkey, change_type
         |FROM j WHERE change_type IS NOT NULL""".stripMargin,

    "table_incr_agg" ->
      """SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "table_scd2" ->
      """WITH obs AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events),
        |runs AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                   OR lag(event_type) OVER w != event_type
        |            THEN 1 ELSE 0 END AS chg
        |  FROM obs
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |r2 AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM runs),
        |g AS (
        |  SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
        |    MIN(us) AS valid_from_us, CAST(COUNT(1) AS BIGINT) AS n_obs
        |  FROM r2 GROUP BY 1, 2, 3)
        |SELECT user_id, run_id, event_type, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, run_id) AS valid_to_us,
        |  n_obs
        |FROM g""".stripMargin
  )
}
