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
      val start = new ConcurrentHashMap[Int, (Long, String)]()
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // prefer an explicit job description; else the first stage
        // name that is a real call site (SQL actions run through the
        // execution thread pool, whose RESULT stage names are the
        // pool frame, but shuffle-map stages keep their call sites)
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val site = desc.orElse(
          j.stageInfos.map(_.name.takeWhile(_ != '(').trim)
            .find(n => !n.contains("CompletableFuture") && n.nonEmpty))
          .getOrElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '(').trim)
            .getOrElse("?"))
        start.put(j.jobId, (j.time, site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (s, site) = start.getOrDefault(j.jobId, (j.time, "?"))
        rows.add((j.jobId, s, j.time, site))
      }
    }

    // SQL-action-level attribution: every DataFrame action (collect /
    // first / save / count — including the ProbePrune bucket collects
    // and the parquet writes) reports its duration plus a plan digest,
    // which the job-level rollup below cannot see through the SQL
    // execution thread pool's anonymous stage names.
    final class Q extends org.apache.spark.sql.util.QueryExecutionListener {
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
      private def digest(qe: org.apache.spark.sql.execution.QueryExecution): String = {
        val cmd = qe.analyzed.collectFirst {
          case c: org.apache.spark.sql.execution.datasources
              .InsertIntoHadoopFsRelationCommand =>
            "write " + c.outputPath.toString.split("/").takeRight(2).mkString("/")
        }
        cmd.getOrElse {
          val leaves = qe.analyzed.collectLeaves().map(_.nodeName).distinct
          qe.analyzed.nodeName + "<" + leaves.mkString(",") + ">"
        }
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        rows.add((funcName + " " + digest(qe), durationNs / 1000000L))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }

    for (r <- 1 to runs) {
      val l = new L
      val ql = new Q
      spark.sparkContext.addSparkListener(l)
      spark.listenerManager.register(ql)
      val t0 = System.currentTimeMillis()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext, 2000L)
      spark.sparkContext.removeSparkListener(l)
      val jobs = l.rows.toArray(Array.empty[(Int, Long, Long, String)]).sortBy(_._2)
      var prevEnd = t0
      var inJob = 0L
      var gap = 0L
      // per-callsite rollup: (jobs, in-job ms, gap-before ms) — names the
      // code line that spawns each job family, so "148 tiny jobs" becomes
      // "N collects from ProbePrune.scan, M checkpoint materializations"
      val bySite = scala.collection.mutable.Map.empty[String, (Int, Long, Long)]
      println(f"[jobgap] ===== run $r: ${(t1 - t0) / 1000.0}%.2f s, ${jobs.length} jobs")
      for ((id, s, e, site) <- jobs) {
        val g = math.max(0L, s - prevEnd)
        gap += g
        inJob += (e - s)
        val (c0, d0, g0) = bySite.getOrElse(site, (0, 0L, 0L))
        bySite(site) = (c0 + 1, d0 + (e - s), g0 + g)
        if (e - s > 150 || g > 150)
          println(f"[jobgap] job $id%4d gapBefore=${g / 1000.0}%6.2fs dur=${(e - s) / 1000.0}%6.2fs  $site")
        prevEnd = math.max(prevEnd, e)
      }
      println(f"[jobgap] run $r total=${(t1 - t0) / 1000.0}%.2f s inJob=${inJob / 1000.0}%.2f s " +
        f"gaps=${gap / 1000.0}%.2f s tail=${math.max(0L, t1 - prevEnd) / 1000.0}%.2f s")
      for ((site, (c, d, g)) <- bySite.toSeq.sortBy(t => -(t._2._2 + t._2._3)))
        println(f"[jobgap]   site $site%-40s jobs=$c%3d inJob=${d / 1000.0}%6.2fs gapBefore=${g / 1000.0}%6.2fs")
      spark.listenerManager.unregister(ql)
      val acts = ql.rows.toArray(Array.empty[(String, Long)])
      val byAct = scala.collection.mutable.Map.empty[String, (Int, Long)]
      for ((a, ms) <- acts) {
        val (c0, d0) = byAct.getOrElse(a, (0, 0L))
        byAct(a) = (c0 + 1, d0 + ms)
      }
      println(f"[jobgap] run $r sql actions=${acts.length} sum=${acts.map(_._2).sum / 1000.0}%.2f s")
      for ((a, (c, d)) <- byAct.toSeq.sortBy(-_._2._2).take(30))
        println(f"[jobgap]   act n=$c%3d sum=${d / 1000.0}%6.2fs  $a")
    }
    spark.stop()
  }
}
