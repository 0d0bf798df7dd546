package graft

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TemporalOps

/** Scala brute-force oracle for the partial-set sliding distinct:
  * calendar gaps (a partial must fan out to absent anchor days and be
  * dropped, not shift the frame), month boundaries, duplicate users
  * per day, and a window-width variant — the cases a ROWS-frame
  * window over partials would get wrong on sparse calendars.
  */
class SlidingDistinctSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(String, Long)], window: Int)
      : Map[String, Long] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val df = rows.toDF("ds", "user_id")
      .select(to_timestamp(col("ds")).as("ts"), col("user_id"))
      .repartition(3)
    TemporalOps.slidingDistinct(df, "ts", "user_id", window)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def brute(rows: Seq[(String, Long)], window: Int)
      : Map[String, Long] = {
    val byDay = rows.map { case (ds, u) => (LocalDate.parse(ds.take(10)), u) }
    byDay.map(_._1).distinct.map { d =>
      val users = byDay.collect {
        case (dd, u) if !dd.isAfter(d) && !dd.isBefore(d.minusDays(window - 1)) => u
      }.toSet
      d.toString -> users.size.toLong
    }.toMap
  }

  test("calendar gaps: stale partials age out exactly, not by row frame") {
    // days 1,2,3 then a 10-day gap, then 14,15: the gap must fully
    // reset the window (a ROWS BETWEEN 6 PRECEDING frame would not)
    val rows = Seq(
      ("2024-01-01 09:00:00", 1L), ("2024-01-01 10:00:00", 2L),
      ("2024-01-02 09:00:00", 2L), ("2024-01-03 09:00:00", 3L),
      ("2024-01-14 09:00:00", 4L), ("2024-01-15 09:00:00", 1L))
    val want = brute(rows, 7)
    assert(run(rows, 7) == want)
    assert(want("2024-01-14") == 1L && want("2024-01-15") == 2L)
  }

  test("randomized sparse calendar matches brute force (window=7 and 3)") {
    val rnd = new scala.util.Random(5)
    val base = LocalDate.parse("2024-02-20") // crosses a month boundary
    val rows = (1 to 300).map { _ =>
      val d = base.plusDays(rnd.nextInt(25).toLong)
      (s"$d ${10 + rnd.nextInt(10)}:00:00", rnd.nextInt(12).toLong)
    }
    for (w <- Seq(7, 3))
      assert(run(rows, w) == brute(rows, w), s"window $w")
  }
}
