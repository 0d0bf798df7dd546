package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin
import graft.plans.AsofJoinNative

/** The native as-of operator's scale claim, measured: the composed
  * union+window form shuffles EVERY row at the combined left+right
  * width (each side null-padded with the other side's columns plus the
  * _ts/_side/_tie tags), while the native exec shuffles each side at
  * its own natural width. On a wide-payload workload the byte gap is
  * the whole story at 100 TB — wall time at test scale is noise, bytes
  * exchanged are the cluster cost. Results must also stay identical,
  * so the cheaper shuffle is provably not a semantics trade.
  */
class AsofNativeShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private final class Meter extends SparkListener {
    val bytes = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  private def shuffleBytes(df: DataFrame): Long = {
    val sc = spark.sparkContext
    val meter = new Meter
    sc.addSparkListener(meter)
    try {
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graft.Bridge.drainListenerBus(sc, 30000)
      meter.bytes.get
    } finally sc.removeSparkListener(meter)
  }

  test("native shuffles strictly fewer bytes than composed on wide payloads") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // left: 20k rows, 6 wide string columns; right: 5k rows, 2 payload
    // columns — both directions of null-padding cost the composed form
    val leftCols = Seq(
      col("id").as("l_id"), (col("id") % 50).as("k"),
      ((col("id") * 37) % 10000).as("ts")) ++
      (0 until 6).map(i => concat(lit(s"left-payload-$i-"),
        col("id").cast("string")).as(s"pl_$i"))
    val left = spark.range(20000).select(leftCols: _*)
    val right = spark.range(5000).select(
      col("id").as("r_id"), (col("id") % 50).as("k"),
      ((col("id") * 91) % 10000).as("ts"),
      concat(lit("right-payload-a-"), col("id").cast("string")).as("pa"),
      concat(lit("right-payload-b-"), col("id").cast("string")).as("pb"))
    def run(f: (DataFrame, DataFrame, Seq[String], String, String,
        Map[String, String], Seq[String]) => DataFrame): DataFrame =
      f(left, right, Seq("k"), "ts", "ts",
        Map("r_id" -> "m_id", "pa" -> "m_pa", "pb" -> "m_pb"), Seq("r_id"))

    val composed = run(AsofJoin.asof)
    val native = run((l, r, k, lt, rt, p, tb) =>
      AsofJoinNative.asof(l, r, k, lt, rt, p, tb, broadcast = Some(false)))
    // parity first (same wide workload the byte claim is made on)
    val cols = Seq("l_id", "k", "ts", "pl_0", "pl_5", "m_id", "m_pa", "m_pb")
    assert(native.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      == composed.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq)

    val cBytes = shuffleBytes(composed)
    val nBytes = shuffleBytes(native)
    info(f"composed=${cBytes / 1024.0}%.1f KiB native=${nBytes / 1024.0}%.1f KiB " +
      f"ratio=${nBytes.toDouble / cBytes}%.2f")
    assert(nBytes > 0 && cBytes > 0)
    // Margin set from measurement, not hope: on this exact workload the
    // byte counts are deterministic (two independent machines measured
    // the identical 1,252,221 vs 1,398,573 B → ratio 0.90). LZ4 squeezes
    // the composed form's fixed per-row overhead (tag cols + null
    // slots), so the compressed gap is ~10%, not the ~30% raw-width
    // arithmetic suggests. Assert with headroom: a plan change that
    // erodes the advantage toward parity still flags.
    assert(nBytes < cBytes * 0.95,
      s"native shuffled $nBytes vs composed $cBytes — width advantage lost")
  }
}
