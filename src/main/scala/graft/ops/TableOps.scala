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
         |FROM j WHERE change_type IS NOT NULL""".stripMargin
  )
}
