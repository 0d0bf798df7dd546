package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Adversarial connected-components scale probe (manual main) — the
  * topologies where a wrong CC implementation dies, NOT the easy
  * dedup graph (tiny dense components) ScaleProfile covers:
  *
  *  - `path n` / `ring n`: ONE giant component of diameter ~n. Plain
  *    min-label propagation needs n rounds (3M rounds at 30×);
  *    pointer jumping must hold rounds ≈ O(log n) — the printed curve
  *    is rounds and shuffle-per-round vs n at 1×/10×/30×.
  *  - `star n`: one hub-centered component holding HALF the vertices,
  *    rest singletons — the skewed-component case. The hub key
  *    receives n/2 edge rows in the neighbor-min aggregation; because
  *    min() partial-aggregates map-side, no single reducer ever sees
  *    the hub's whole edge list. Expect 2-3 rounds, flat per-round
  *    shuffle ∝ touched vertices (singletons never enter the loop).
  *
  * Every run also asserts exact labels (path/ring → all comp 0; star →
  * hub component + untouched singletons), so the numbers can't come
  * from a silently-wrong result.
  */
object CcAdversarialProfile {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def nodes(n: Long): DataFrame = spark.range(n).select(col("id").as("node"))

    def run(label: String, n: Long, edges: DataFrame,
        check: DataFrame => Unit): Unit = {
      meter.bytes.set(0L)
      val t0 = System.nanoTime()
      val (cc, rounds) = graft.ops.GraphOps.ccWithStats(nodes(n), edges)
      check(cc)
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext, 2000L)
      val mb = meter.bytes.get() / 1e6
      println(f"[cc-adv] $label n=$n%,d rounds=$rounds wall=$dt%.1f s " +
        f"shuffle=$mb%.0f MB (${mb / rounds}%.1f MB/round)")
    }

    for (n <- args.headOption.map(s => Seq(s.toLong)).getOrElse(Seq(100000L, 1000000L, 3000000L))) {
      // path 0-1-2-...-n-1: diameter n-1
      run("path", n,
        spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst")),
        cc => assert(cc.filter(col("comp") =!= 0L).isEmpty, "path: non-0 label"))
      // ring: path + closing edge — same diameter class, no endpoints
      run("ring", n,
        spark.range(n).select(col("id").as("src"), ((col("id") + 1) % n).as("dst")),
        cc => assert(cc.filter(col("comp") =!= 0L).isEmpty, "ring: non-0 label"))
      // star: hub 0 + spokes 1..n/2 (one component = 50% of vertices),
      // vertices n/2+1..n-1 isolated singletons
      run("star", n,
        spark.range(1, n / 2 + 1).select(lit(0L).as("src"), col("id").as("dst")),
        cc => {
          val bad = cc.filter(
            (col("node") <= n / 2 && col("comp") =!= 0L) ||
            (col("node") > n / 2 && col("comp") =!= col("node")))
          assert(bad.isEmpty, "star: wrong labels")
        })
    }
    spark.stop()
  }
}
