package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Distributed skyline (Pareto frontier) — the multi-objective
  * counterpart of top-k: keep every row not dominated by another row
  * (dominated = no better on any minimized dimension, strictly worse
  * on at least one). The curation use: picking the quality/cost
  * frontier of candidate documents or model checkpoints, where a
  * single weighted score would hide the trade-off.
  *
  * Two phases, the standard distributed-skyline decomposition:
  *
  *   1. **Local skyline per partition** (`mapPartitions`): dominance is
  *      transitive, so a row dominated inside its partition is
  *      dominated globally — each task emits only its local frontier
  *      and the candidate set shrinks from |rows| to Σ|local
  *      frontiers| without any shuffle. The in-task frontier buffer is
  *      bounded by the local skyline size: O(√rows) expected for
  *      independent dimensions, |rows| only in the fully
  *      anti-correlated worst case (where the true skyline IS the
  *      whole input and no algorithm can emit less).
  *   2. **Exact dominance anti-join over the candidates**: the
  *      surviving set is frontier-sized, so it broadcasts; one
  *      BroadcastNestedLoopJoin LeftAnti removes rows dominated by a
  *      candidate from another partition. No sort, no global window,
  *      no driver collect.
  *
  * Ties: a duplicate point never dominates its twin (no strict
  * inequality), so equal-coordinate rows all survive — same semantics
  * as the SQL `NOT EXISTS` dominance oracle.
  */
object SkylineOps {

  /** Rows of `df` not dominated on the given dimensions (all
    * minimized; negate a column upstream to maximize it). Dimension
    * columns must be numeric and non-null. */
  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex)

    def vals(r: Row): Array[Double] =
      idx.map(i => r.get(i).asInstanceOf[Number].doubleValue).toArray
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var allLe = true; var oneLt = false; var i = 0
      while (i < a.length && allLe) {
        if (a(i) > b(i)) allLe = false
        else if (a(i) < b(i)) oneLt = true
        i += 1
      }
      allLe && oneLt
    }

    val local = df.mapPartitions { it =>
      val frontier = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { r =>
        val v = vals(r)
        if (!frontier.exists { case (f, _) => dominates(f, v) }) {
          // v enters; evict everything it now dominates
          val kept = frontier.filterNot { case (f, _) => dominates(v, f) }
          frontier.clear(); frontier ++= kept; frontier += ((v, r))
        }
      }
      frontier.iterator.map(_._2)
    }(Encoders.row(schema))
      // phase 2 reads the candidates twice (probe + broadcast build);
      // materialize so the full phase-1 scan runs once
      .localCheckpoint(eager = false)

    // rename the broadcast copy's columns — sidesteps Spark's
    // ambiguous-self-join detection and keeps the output schema clean
    // (left_anti returns only the probe side's columns)
    val bCols = dims.map(c => col(c).as(s"__sk_$c"))
    val other = broadcast(local.select(bCols: _*))
    val allLe = dims.map(c => col(s"__sk_$c") <= col(c)).reduce(_ && _)
    val oneLt = dims.map(c => col(s"__sk_$c") < col(c)).reduce(_ || _)
    local.join(other, allLe && oneLt, "left_anti")
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // Cheapest-for-the-size part frontier: no other part is both <= in
    // size and <= in price (strictly better in one). Price compares as
    // the raw 2-decimal double — comparison-only, no arithmetic, so
    // the cross-engine hash is exact without the cents transform.
    "skyline_parts" -> ((s, d) =>
      skyline(t(s, d, "part"), Seq("p_size", "p_retailprice"))
        .select(col("p_partkey"), col("p_brand"),
          col("p_size").cast("long").as("p_size"), col("p_retailprice")))
  )

  /** Oracle: the textbook NOT EXISTS dominance predicate — an
    * independent quadratic recomputation of the same frontier. */
  val oracle: Map[String, String] = Map(
    "skyline_parts" ->
      """SELECT a.p_partkey, a.p_brand, CAST(a.p_size AS BIGINT) AS p_size,
        |  a.p_retailprice
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
        |    AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))""".stripMargin
  )
}
