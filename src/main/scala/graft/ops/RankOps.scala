package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global total-order ranking without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses
  * the whole input onto ONE task — the canonical 100 TB anti-pattern
  * (Spark even warns `WindowExec: No Partition Defined`). The scalable
  * shape is the TeraSort pattern:
  *
  *   1. `repartitionByRange` on the order keys — sampled range
  *      boundaries put partition i strictly before partition i+1;
  *   2. `sortWithinPartitions` — now the data is globally ordered by
  *      (partition, position);
  *   3. `zipWithIndex` — one lightweight count-job over partition
  *      SIZES (metadata, not data), then each task stamps
  *      `offset(partition) + local position` in a single pass.
  *
  * Every partition sorts only its own slice; no row ever funnels
  * through one task. The boundary SAMPLING only affects partition
  * sizes, never the rank values: any boundary choice preserves the
  * total order, so the assigned ranks are deterministic for a
  * deterministic total order (callers must include a tie-breaking
  * key, same as any ROW_NUMBER).
  *
  * This is one of the rare justified RDD drops (SURVEY §7.1): Catalyst
  * has no contiguous-global-index operator — `monotonically_increasing_id`
  * is ordered but not contiguous, and windows serialize.
  */
object RankOps {

  /** Append a contiguous 1-based `rankCol` following the total order
    * given by `orderCols` (include a unique tie-breaker for
    * determinism). `numPartitions` <= 0 uses spark.sql.shuffle.partitions. */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      rankCol: String = "global_rank", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = ranged.schema.add(rankCol, LongType, nullable = false)
    val rdd = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
