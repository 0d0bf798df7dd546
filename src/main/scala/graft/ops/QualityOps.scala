package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, cents}

/** Data-quality operators: column profiling and declarative constraint
  * checks — the validation layer every large-scale ingest pipeline
  * runs before training data ships.
  *
  * Both are single-pass / single-join aggregations:
  *  - [[profile]] computes all columns' stats in ONE scan (one wide
  *    agg, map-side partial), then unpivots driver-side — never one
  *    job per column;
  *  - [[checkViolations]] evaluates row-level predicates in one scan
  *    (conditional counts) and set-level constraints (referential
  *    integrity) as keyed anti-joins.
  */
object QualityOps {

  /** Per-column profile of the given numeric/string columns: null
    * count, exact distinct count, min/max (as strings for a uniform
    * schema). Two jobs regardless of column count:
    *  1. nulls/min/max ride ONE narrow scan (no distinct aggregates,
    *     so no Expand — min/max are computed in the column's own type
    *     and stringified after, preserving numeric ordering);
    *  2. distinct counts via posexplode(values) → map-side-deduped
    *     two-phase distinct per column ordinal. N exact countDistinct
    *     in one agg would Expand the scan N+1-fold (measured 9.8 s vs
    *     ~2 s for this shape at sf0.1); the explode form dedupes each
    *     column's values in the partial aggregate before anything
    *     shuffles. Value→string is injective per type, so distinct
    *     counts are unchanged. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("pos"), lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    val basic = row.select(explode(array(stacked: _*)).as("p")).select("p.*")

    val values = df.select(posexplode(array(cols.map(c => col(c).cast("string")): _*)))
      .toDF("pos", "value")
      .filter(col("value").isNotNull) // COUNT(DISTINCT) ignores nulls
    val distincts = values.distinct()
      .groupBy("pos").agg(count(lit(1)).as("n_distinct"))

    basic.join(distincts, Seq("pos"), "left")
      .select(col("col_name"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }

  /** Declarative constraint check. Row-level predicates are evaluated
    * as conditional counts in one scan; the referential constraint
    * (`fkChild(fkCol)` ⊆ `fkParent(pkCol)`) is a left-anti join (the
    * scale shape: shuffle/broadcast on the key, never a collect).
    * Output: one row per constraint with its violation count — zero
    * means the contract holds. */
  def checkViolations(
      rowDf: DataFrame, rowChecks: Seq[(String, org.apache.spark.sql.Column)],
      fkChild: DataFrame, fkCol: String,
      fkParent: DataFrame, pkCol: String): DataFrame = {
    val spark = rowDf.sparkSession
    import spark.implicits._
    val rowAggs = rowChecks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val rowRes = rowDf.agg(rowAggs.head, rowAggs.tail: _*)
    val rowLong = rowChecks.map { case (name, _) =>
      struct(lit(name).as("check_name"), col(name).as("n_violations"))
    }
    val rows = rowRes.select(explode(array(rowLong: _*)).as("c")).select("c.*")
    val orphans = fkChild.select(col(fkCol))
      .join(fkParent.select(col(pkCol)), col(fkCol) === col(pkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"fk_${fkCol}_in_$pkCol").as("check_name"), col("n_violations"))
    rows.unionByName(orphans)
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  private val ProfileCols =
    Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")

  val queries: Map[String, QFn] = Map(
    "dq_profile" -> ((s, d) =>
      profile(
        t(s, d, "lineitem").withColumn("l_shipdate",
          date_format(col("l_shipdate"), "yyyy-MM-dd")),
        ProfileCols)),

    "dq_violations" -> ((s, d) =>
      checkViolations(
        t(s, d, "lineitem"),
        Seq(
          "quantity_positive" -> (col("l_quantity") > 0),
          "discount_in_range" -> (col("l_discount") >= 0 && col("l_discount") <= 0.1),
          "price_positive_cents" -> (cents(col("l_extendedprice")) > 0L),
          "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R")),
        fkChild = t(s, d, "lineitem"), fkCol = "l_orderkey",
        fkParent = t(s, d, "orders"), pkCol = "o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
    "dq_profile" -> {
      val per = ProfileCols.map { c =>
        val v = if (c == "l_shipdate") "strftime(l_shipdate, '%Y-%m-%d')" else c
        s"""SELECT '$c' AS col_name,
           |  CAST(SUM(CASE WHEN $v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $v) AS BIGINT) AS n_distinct,
           |  MIN($v)::VARCHAR AS min_value,
           |  MAX($v)::VARCHAR AS max_value
           |FROM lineitem""".stripMargin
      }
      per.mkString("\nUNION ALL\n")
    },

    "dq_violations" ->
      """SELECT 'quantity_positive' AS check_name,
        |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_quantity > 0, FALSE)) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'discount_in_range',
        |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_discount >= 0 AND l_discount <= 0.1, FALSE)) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'price_positive_cents',
        |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(CAST(ROUND(l_extendedprice*100) AS BIGINT) > 0, FALSE)) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'returnflag_domain',
        |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'fk_l_orderkey_in_o_orderkey',
        |  CAST((SELECT COUNT(1) FROM lineitem l LEFT JOIN orders o
        |        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)""".stripMargin
  )
}
