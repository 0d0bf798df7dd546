package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The shared PROBE → PRUNE step of every online serve: a bounded
  * probe frame's distinct bucket keys (≤ the artifact's bucket fanout
  * by construction, no matter the batch size) become a LITERAL `isin`
  * filter on a bucket-partitioned index table, which Spark pushes
  * down as parquet PartitionFilters — so a micro-batch's IO is its
  * own probed buckets, never the artifact (spec-pinned per serve).
  *
  * One helper instead of four hand-rolled copies (StreamAnnServe's
  * probed cells, StreamBm25Serve's term buckets, StreamAttribution's
  * band + shingle buckets, StreamGraphServe's frontier buckets): the
  * next serving rung, and the partition-filter spec, are written
  * once. The `keys` collect is the serve's one tiny driver action —
  * callers probing SEVERAL tables with the same key set collect once
  * and reuse the array. */
object ProbePrune {

  /** The bounded distinct key set of `keyCol` in the probe frame. */
  def keys(probe: DataFrame, keyCol: String): Array[Any] =
    probe.select(keyCol).distinct().collect().map(_.get(0))

  /** Prune a bucketed index table to a pre-collected key set. */
  def scan(index: DataFrame, keyCol: String, ks: Array[Any]): DataFrame =
    index.filter(col(keyCol).isin(ks.toIndexedSeq: _*))

  /** Prune a bucketed index table to ONLY the buckets the probe frame
    * touches on `keyCol` (present in both frames). */
  def scan(index: DataFrame, keyCol: String, probe: DataFrame): DataFrame =
    scan(index, keyCol, keys(probe, keyCol))
}
