package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall profile of one registered query, including the GAPS
  * between consecutive jobs (driver-side planning / FS / collect
  * latency that per-stage profiles can't see). The diagnosis tool for
  * "hundreds of tiny stages, where did the wall go" — prints each
  * job's duration plus the idle gap before it, and a summary split of
  * total wall into in-job vs between-job time.
  *
  * Usage: runMain graft.tools.JobGapProbe <sfDir> <query> [runs]
  */
object JobGapProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    final class L extends SparkListener {
      val start = new ConcurrentHashMap[Int, Long]()
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        start.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = start.getOrDefault(j.jobId, j.time)
        rows.add((j.jobId, s, j.time))
      }
    }

    for (r <- 1 to runs) {
      val l = new L
      spark.sparkContext.addSparkListener(l)
      val t0 = System.currentTimeMillis()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext, 2000L)
      spark.sparkContext.removeSparkListener(l)
      val jobs = l.rows.toArray(Array.empty[(Int, Long, Long)]).sortBy(_._2)
      var prevEnd = t0
      var inJob = 0L
      var gap = 0L
      println(f"[jobgap] ===== run $r: ${(t1 - t0) / 1000.0}%.2f s, ${jobs.length} jobs")
      for ((id, s, e) <- jobs) {
        val g = math.max(0L, s - prevEnd)
        gap += g
        inJob += (e - s)
        if (e - s > 150 || g > 150)
          println(f"[jobgap] job $id%4d gapBefore=${g / 1000.0}%6.2fs dur=${(e - s) / 1000.0}%6.2fs")
        prevEnd = math.max(prevEnd, e)
      }
      println(f"[jobgap] run $r total=${(t1 - t0) / 1000.0}%.2f s inJob=${inJob / 1000.0}%.2f s " +
        f"gaps=${gap / 1000.0}%.2f s tail=${math.max(0L, t1 - prevEnd) / 1000.0}%.2f s")
    }
    spark.stop()
  }
}
