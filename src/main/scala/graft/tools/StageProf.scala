package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/CPU/GC/spill profile of one registered query — the
  * diagnosis tool for "same plan, same data, 2× wall time" mysteries
  * (variance between identical runs is GC/spill/scheduling, never the
  * plan; this prints which).
  *
  * Usage: runMain graft.tools.StageProf <sfDir> <query> [runs]
  */
object StageProf {

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
      val rows = new ConcurrentHashMap[Int, String]()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(-1L)
        rows.put(i.stageId, f"stage ${i.stageId}%4d wall=${wall / 1000.0}%7.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.2fs run=${m.executorRunTime / 1000.0}%8.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.2fs " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spillMem=${m.memoryBytesSpilled / 1e6}%8.1fMB " +
          f"spillDisk=${m.diskBytesSpilled / 1e6}%8.1fMB tasks=${i.numTasks}%3d  " +
          i.name.takeWhile(_ != '\n').take(80))
      }
    }

    for (r <- 1 to runs) {
      val l = new L
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Bridge
        .drainListenerBus(spark.sparkContext, 30000)
      spark.sparkContext.removeSparkListener(l)
      println(f"== run $r: $name $wall%.2f s ==")
      l.rows.entrySet().stream().sorted(
        java.util.Comparator.comparingInt[java.util.Map.Entry[Int, String]](_.getKey))
        .forEach(e => println(e.getValue))
      System.gc(); Thread.sleep(500)
    }
    spark.stop()
  }
}
