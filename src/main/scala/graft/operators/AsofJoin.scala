package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row with
  * `right.ts <= left.ts` (per key), the canonical time-series lookup
  * Spark has no built-in for (SURVEY §2.3 "as-of / interval / range").
  *
  * Spark-first plan: NO join node at all. Both sides are union'd with a
  * side tag, shuffled ONCE on the key, and sorted by (ts, side) inside
  * each partition; `last(right_payload, ignoreNulls)` over the running
  * window then carries the most recent right row into every left row.
  *
  * vs the naive `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + row_number:
  * that plan materializes every (left, earlier-right) pair — O(n·m) per
  * key — before pruning to rank 1. The union+window form is O(n+m) per
  * key with exactly one shuffle and no intermediate blowup, which is
  * the difference between working and not working at 100 TB.
  *
  * Skew note: all rows of one key land in one partition (any as-of
  * needs that); for a pathologically hot key use [[asofSalted]], which
  * splits each key across `salts` partitions.
  */
object AsofJoin {

  /** @param rightPayload right columns carried to the match (renamed as
    *                     given); all other right columns are dropped.
    * @param tieBreak     deterministic order among right rows sharing a
    *                     timestamp — the LAST one in this order wins.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Map[String, String],
      tieBreak: Seq[String] = Nil): DataFrame = {

    val leftCols = left.columns.toSeq
    // side 0 sorts BEFORE side 1 at equal ts: a right row at exactly
    // left.ts matches (non-strict asof, DuckDB's `>=` convention)
    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("string"))
    val payload = rightPayload.toSeq
    // SQL NULL semantics, aligned with the native AsofJoinExec: a right
    // row with a NULL key or NULL timestamp can never be a match, so it
    // is dropped before the union — otherwise the window's null-first
    // ordering would let it be carried into every row of its key group,
    // and NULL-key left rows would absorb NULL-key right payloads
    // (partitionBy groups nulls together). Left rows with NULL key/ts
    // still flow through and emit a null-padded match, as a left join
    // should. Parity with the native form is pinned in AsofNativeSpec.
    val rNonNull = (keys :+ rightTs).foldLeft(right) {
      (df, c) => df.filter(col(c).isNotNull)
    }
    val rTagged = rNonNull
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_tie",
        if (tieBreak.isEmpty) lit("").cast("string")
        // U+241F (printable unit-separator glyph) keeps the file
        // grep/diff-friendly; same separator as the native
        // AsofJoinNative build side so tie ordering stays in parity.
        else concat_ws("␟", tieBreak.map(c => col(c).cast("string")): _*))
      .select(
        (keys.map(col) :+ col("_ts") :+ col("_side") :+ col("_tie")) ++
          payload.map { case (src, dst) => col(src).as(s"_r_$dst") }: _*)

    val lSel = lTagged.select(
      (keys.map(col) :+ col("_ts") :+ col("_side") :+ col("_tie")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map { case (_, dst) => lit(null).as(s"_r_$dst") }: _*)

    val unioned = lSel.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = payload.foldLeft(unioned) { case (df, (_, dst)) =>
      df.withColumn(dst, last(col(s"_r_$dst"), ignoreNulls = true).over(w))
    }
    matched.filter(col("_side") === 1)
      .drop((payload.map { case (_, dst) => s"_r_$dst" } ++
        Seq("_ts", "_side", "_tie")): _*)
  }

  /** Hot-key-safe as-of: identical output to [[asof]], but each key's
    * left rows are spread across `salts` sub-partitions (salt =
    * hash(left ts, payload-independent) mod salts) and the right side
    * is REPLICATED into every sub-partition, so one pathological key
    * no longer serializes onto a single task. The classic salted-join
    * trade: left work parallelizes `salts`-way, right rows are scanned
    * `salts` times — right for a skewed LEFT (events) against a
    * moderate RIGHT (reference states).
    *
    * Correctness: every left row still sees ALL right rows of its key
    * inside its salt bucket, and the per-bucket window computes the
    * same latest-≤-ts match — verified row-identical to [[asof]] in
    * AsofSaltedSpec. */
  def asofSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Map[String, String],
      tieBreak: Seq[String] = Nil,
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("_salt",
      pmod(hash(col(leftTs)), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    asof(l, r, keys :+ "_salt", leftTs, rightTs, rightPayload, tieBreak)
      .drop("_salt")
  }
}

/** Banded range join: all pairs with |a.v − b.v| ≤ band. The 1-D
  * sibling of the spatial grid join (SURVEY O8): bucket = v div band,
  * one side explodes its 3-neighborhood, equi-join on (key, bucket),
  * exact |Δ| predicate as the residual — a shuffle-partitionable plan
  * instead of an O(n²) theta join. */
object RangeJoin {

  /** Self range join on `valCol` (long) within `band`, deduped
    * structurally by `idCol` (a.id < b.id). Output: key, a_/b_ id and
    * value columns, gap = |Δ|. */
  def bandedSelfPairs(
      df: DataFrame, keyCol: String, idCol: String, valCol: String,
      band: Long): DataFrame = {
    val base = df.select(col(keyCol), col(idCol), col(valCol))
      .withColumn("_bucket", expr(s"$valCol div ${band}L"))
    val a = base.select(
      col(keyCol), col(idCol).as("a_id"), col(valCol).as("a_v"), col("_bucket"))
      .withColumn("_nb", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_jb", col("_bucket") + col("_nb"))
    val b = base.select(
      col(keyCol).as("_k2"), col(idCol).as("b_id"), col(valCol).as("b_v"),
      col("_bucket").as("_b2"))
    a.join(b,
        col(keyCol) === col("_k2") && col("_jb") === col("_b2") &&
          col("a_id") < col("b_id") &&
          abs(col("a_v") - col("b_v")) <= lit(band))
      .select(col(keyCol), col("a_id"), col("b_id"),
        abs(col("a_v") - col("b_v")).as("gap"))
  }
}
