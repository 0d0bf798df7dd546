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

  /** Corpus DRIFT detection between two snapshots — the
    * distribution-shift monitor a recurring ingest runs before mixing
    * a new crawl into training data. Token mass is bucketed by hash
    * (the DSIR/perceptron feature space), the reference snapshot's
    * distribution predicts expected counts in the current one, and
    * each bucket reports a chi-square-style contribution in EXACT ppm
    * (integer cross-multiplication — no logs, no floats, so the whole
    * monitor replays hash-exact; PSI's ln(o/e) is monotone-equivalent
    * for ranking drifted buckets, which is what the alert consumes).
    *
    * Shape: ONE explode + (bucket)-keyed agg with conditional sums for
    * both snapshots (map-side partials → ≤ B rows per task), totals as
    * windows over the B-row frame — the corpus is scanned once. */
  def driftChi2(docs: DataFrame, nBuckets: Int = 64,
      refPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => c % 2 === 0): DataFrame = {
    import TextOps.{tokens, strHash, HashMod}
    // totals over the ≤nBuckets-row agg frame (bounded by construction)
    val all = WindowUtil.boundedGlobal(col("f"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    docs
      .select(when(refPred(col("doc_id")), 1L).otherwise(0L).as("is_ref"),
        explode(transform(tokens(col("text")), x => strHash(x) % nBuckets))
          .as("f"))
      .groupBy(col("f"))
      .agg(sum(col("is_ref")).as("c_ref"),
        sum(lit(1L) - col("is_ref")).as("c_cur"))
      .select(col("f"), col("c_ref"), col("c_cur"),
        sum(col("c_ref")).over(all).as("t_ref"),
        sum(col("c_cur")).over(all).as("t_cur"))
      .withColumn("expected", expr("(c_ref * t_cur) div greatest(t_ref, 1)"))
      .withColumn("chi2_ppm", expr(
        "((c_cur - expected) * (c_cur - expected) * 1000000) div greatest(expected, 1)"))
      .select(col("f"), col("c_ref"), col("c_cur"), col("expected"),
        col("chi2_ppm"))
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  private val ProfileCols =
    Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")

  /** POPULATION STABILITY INDEX drift — the second standard drift
    * metric next to [[driftChi2]] (risk/monitoring stacks report both:
    * chi² weights absolute count deviation, PSI weights the LOG-RATIO
    * of the bucket shares, so a bucket going 0.1 % → 1 % of the
    * distribution screams in PSI and whispers in chi²). Same hashed
    * token-bucket frame; per bucket
    * psi_u = (p_cur_ppm − p_ref_ppm) · (l2m(p_cur) − l2m(p_ref)) —
    * the PSI term in ppm·milli-bits (base-2 PSI scaled 10⁹), exact
    * integers end to end via the house bit-length log2 ([[TextOps
    * .sparkL2M]]), shares floored at 1 ppm so every term is log-able.
    * Both factors always share a sign (l2m is monotone), so every
    * term is ≥ 0 like the real PSI — and no negative integer division
    * exists anywhere to desync floor vs truncation.
    *
    * Scale shape: identical to chi² — ONE corpus scan into a
    * ≤nBuckets-row agg; the share/total windows run on that bounded
    * frame. */
  def driftPsi(docs: DataFrame, nBuckets: Int = 64,
      refPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => c % 2 === 0): DataFrame = {
    import TextOps.{tokens, strHash}
    val all = WindowUtil.boundedGlobal(col("f"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    docs
      .select(when(refPred(col("doc_id")), 1L).otherwise(0L).as("is_ref"),
        explode(transform(tokens(col("text")), x => strHash(x) % nBuckets))
          .as("f"))
      .groupBy(col("f"))
      .agg(sum(col("is_ref")).as("c_ref"),
        sum(lit(1L) - col("is_ref")).as("c_cur"))
      .select(col("f"), col("c_ref"), col("c_cur"),
        sum(col("c_ref")).over(all).as("t_ref"),
        sum(col("c_cur")).over(all).as("t_cur"))
      .withColumn("p_ref_ppm",
        expr("greatest(1L, (c_ref * 1000000) div greatest(t_ref, 1))"))
      .withColumn("p_cur_ppm",
        expr("greatest(1L, (c_cur * 1000000) div greatest(t_cur, 1))"))
      .withColumn("psi_u", expr(
        s"(p_cur_ppm - p_ref_ppm) * (${TextOps.sparkL2M("p_cur_ppm")}" +
          s" - ${TextOps.sparkL2M("p_ref_ppm")})"))
      .select(col("f"), col("c_ref"), col("c_cur"),
        col("p_ref_ppm"), col("p_cur_ppm"), col("psi_u"))
  }

  /** CORPUS DATA CARD — the per-(source, lang) release artifact
    * dataset documentation practice asks for (Gebru et al. 2021
    * "Datasheets for Datasets"; Pushkarna et al. 2022 "Data Cards"),
    * as ONE composed measurement over the corpus: volume (docs,
    * tokens, mean doc length), quality (fraction passing the Gopher
    * gate — the SHARED [[TextOps.gopherFlags]] derivation, so the
    * card, the `txt_gopher_gate` monitor, the ensemble, and the
    * streaming keep can never disagree on a rule), and exact-dup
    * pollution (fraction of docs whose full-text md5 appears more
    * than once corpus-wide — `dedup_exact`'s hash convention), each
    * rate in exact integer ppm.
    *
    * Shape at scale: one corpus scan computes flags + token counts +
    * the 16-byte text hash; the dup side is the standard exact-dedup
    * hash-keyed agg (map-side combine) whose count joins back on the
    * hash — both exchanges carry ~40-byte narrow rows, never text —
    * and the rollup is |sources|·|langs| output rows. */
  def dataCard(docs: DataFrame): DataFrame = {
    val flags = TextOps.gopherFlags(docs, "text", Seq("lang"))
    val hashes = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val hCnt = hashes.groupBy("h").agg(count(lit(1)).as("n_h"))
    val dup = hashes.join(hCnt, "h")
      .select(col("doc_id"), (col("n_h") > 1L).as("is_dup"))
    flags.join(dup, "doc_id")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        expr("sum(n_tok) div count(1)").as("mean_tokens"),
        expr("(sum(case when r_words and r_wlen and r_stop and r_punct" +
          " then 1L else 0L end) * 1000000) div count(1)").as("keep_ppm"),
        expr("(sum(case when is_dup then 1L else 0L end) * 1000000)" +
          " div count(1)").as("dup_ppm"))
  }

  val queries: Map[String, QFn] = Map(
    "dq_datacard" -> ((s, d) => dataCard(t(s, d, "documents"))),

    "dq_profile" -> ((s, d) =>
      profile(
        t(s, d, "lineitem").withColumn("l_shipdate",
          date_format(col("l_shipdate"), "yyyy-MM-dd")),
        ProfileCols)),

    "dq_drift_chi2" -> ((s, d) => driftChi2(t(s, d, "documents"))),
    "dq_drift_psi" -> ((s, d) => driftPsi(t(s, d, "documents"))),

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
  ,

    // Per-group IQR-fence outlier detection (the Tukey boxplot rule —
    // the standard numeric-DQ primitive): exact interpolated quartiles
    // per event_type (5 groups), broadcast back, count rows beyond
    // q1/q3 ± 1.5·IQR. Two passes over the fact but the first reduces
    // to one row per group, so the join side is always broadcastable.
    // Cents domain keeps the quartile interpolation (and therefore the
    // fence comparison) bit-identical across engines.
    "dq_outliers" -> ((s, d) => {
      val ev = t(s, d, "events").withColumn("value_c", cents(col("value")))
      val q = ev.groupBy("event_type").agg(
        expr("percentile(value_c, 0.25)").as("q1_c"),
        expr("percentile(value_c, 0.75)").as("q3_c"))
      val iqr = col("q3_c") - col("q1_c")
      ev.join(broadcast(q), "event_type")
        .withColumn("lo", col("q1_c") - iqr * 1.5)
        .withColumn("hi", col("q3_c") + iqr * 1.5)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value_c") < col("lo") || col("value_c") > col("hi"), 1L)
            .otherwise(0L)).as("n_outliers"),
          min("q1_c").as("q1_c"),
          min("q3_c").as("q3_c"))
    }))

  private val sqlToksQ =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '')"

  val oracle: Map[String, String] = Map(
    // dataCard: the Gopher rule bodies (stream_quality_keep's CTE,
    // source/lang-keyed) + md5 exact-dup counts, rolled to ppm rates
    "dq_datacard" ->
      s"""WITH f AS (
         |  SELECT doc_id, source, lang, md5(text) AS h,
         |    CAST(len($sqlToksQ) AS BIGINT) AS n_tok,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform($sqlToksQ, x -> CAST(length(x) AS BIGINT))),
         |      (a, b) -> a + b) AS sum_wlen,
         |    len(list_filter($sqlToksQ,
         |      x -> list_contains(['the','and','of','to','is'], x))) AS n_stop,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         |    length(text) AS n_chars
         |  FROM documents),
         |c AS (SELECT h, COUNT(1) AS n_h FROM f GROUP BY 1),
         |r AS (
         |  SELECT f.source, f.lang, f.n_tok,
         |    (f.n_tok >= 5 AND f.n_tok <= 100000) AS r_words,
         |    (f.sum_wlen >= f.n_tok * 3 AND f.sum_wlen <= f.n_tok * 10)
         |      AS r_wlen,
         |    (f.n_stop >= 1) AS r_stop,
         |    (f.n_punct * 10 <= f.n_chars) AS r_punct,
         |    (c.n_h > 1) AS is_dup
         |  FROM f JOIN c USING (h))
         |SELECT source, lang, COUNT(1)::BIGINT AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_tok) // COUNT(1) AS BIGINT) AS mean_tokens,
         |  CAST((SUM(CASE WHEN r_words AND r_wlen AND r_stop AND r_punct
         |      THEN 1 ELSE 0 END) * 1000000) // COUNT(1) AS BIGINT)
         |    AS keep_ppm,
         |  CAST((SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1000000)
         |      // COUNT(1) AS BIGINT) AS dup_ppm
         |FROM r GROUP BY 1, 2""".stripMargin,

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

    "dq_drift_chi2" ->
      s"""WITH tk AS (
         |  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1000000007 % 64 AS f
         |  FROM (SELECT doc_id,
         |      unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        x -> x != '')) AS tok
         |    FROM documents)),
         |b AS (
         |  SELECT f, CAST(SUM(is_ref) AS BIGINT) AS c_ref,
         |    CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
         |  FROM tk GROUP BY 1),
         |w AS (
         |  SELECT f, c_ref, c_cur,
         |    CAST(SUM(c_ref) OVER () AS BIGINT) AS t_ref,
         |    CAST(SUM(c_cur) OVER () AS BIGINT) AS t_cur
         |  FROM b)
         |SELECT f, c_ref, c_cur,
         |  CAST((c_ref * t_cur) // GREATEST(t_ref, 1) AS BIGINT) AS expected,
         |  CAST(((c_cur - (c_ref * t_cur) // GREATEST(t_ref, 1))
         |      * (c_cur - (c_ref * t_cur) // GREATEST(t_ref, 1)) * 1000000)
         |    // GREATEST((c_ref * t_cur) // GREATEST(t_ref, 1), 1) AS BIGINT)
         |    AS chi2_ppm
         |FROM w""".stripMargin,

    // driftPsi: the chi2 bucket frame with the log-ratio PSI term in
    // exact ppm·milli-bits through the bit-length log2
    "dq_drift_psi" ->
      s"""WITH tk AS (
         |  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1000000007 % 64 AS f
         |  FROM (SELECT doc_id,
         |      unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        x -> x != '')) AS tok
         |    FROM documents)),
         |b AS (
         |  SELECT f, CAST(SUM(is_ref) AS BIGINT) AS c_ref,
         |    CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
         |  FROM tk GROUP BY 1),
         |w AS (
         |  SELECT f, c_ref, c_cur,
         |    CAST(SUM(c_ref) OVER () AS BIGINT) AS t_ref,
         |    CAST(SUM(c_cur) OVER () AS BIGINT) AS t_cur
         |  FROM b),
         |p AS (
         |  SELECT f, c_ref, c_cur,
         |    GREATEST(1, (c_ref * 1000000) // GREATEST(t_ref, 1)) AS p_ref_ppm,
         |    GREATEST(1, (c_cur * 1000000) // GREATEST(t_cur, 1)) AS p_cur_ppm
         |  FROM w)
         |SELECT f, c_ref, c_cur,
         |  CAST(p_ref_ppm AS BIGINT) AS p_ref_ppm,
         |  CAST(p_cur_ppm AS BIGINT) AS p_cur_ppm,
         |  CAST((p_cur_ppm - p_ref_ppm)
         |    * (${TextOps.sqlL2M("p_cur_ppm")} - ${TextOps.sqlL2M("p_ref_ppm")})
         |    AS BIGINT) AS psi_u
         |FROM p""".stripMargin,

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
        |        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)""".stripMargin,

    "dq_outliers" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS value_c FROM events),
        |q AS (
        |  SELECT event_type,
        |    quantile_cont(value_c, 0.25) AS q1_c,
        |    quantile_cont(value_c, 0.75) AS q3_c
        |  FROM ev GROUP BY 1)
        |SELECT ev.event_type,
        |  COUNT(1) AS n,
        |  CAST(SUM(CASE WHEN value_c < q1_c - (q3_c - q1_c) * 1.5
        |                  OR value_c > q3_c + (q3_c - q1_c) * 1.5
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  MIN(q1_c) AS q1_c,
        |  MIN(q3_c) AS q3_c
        |FROM ev JOIN q USING (event_type)
        |GROUP BY ev.event_type""".stripMargin
  )
}
