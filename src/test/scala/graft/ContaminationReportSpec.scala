package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** Contamination report (`dedup_contamination_report`): planted
  * full-copy, half-copy, and novel eval docs score exactly 1e6,
  * the hand-computed fraction, and 0. */
class ContaminationReportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 3-token shingles: a 10-token doc has 8, all distinct here
  private val trainText =
    "one two three four five six seven eight nine ten"
  private val novelText =
    "red blue green yellow purple orange pink black white gray"

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    rows.toDF("doc_id", "text")
  }

  test("full copy scores 1e6, novel scores 0, splice scores the shingle fraction") {
    val train = mk(Seq(1L -> trainText, 2L -> "alpha beta gamma delta eps"))
    // splice: 5 train tokens + 5 novel tokens — shingles fully inside
    // the train half: (one,two,three),(two,three,four),(three,four,five) = 3 of 8
    val eval = mk(Seq(
      10L -> trainText,
      11L -> novelText,
      12L -> "one two three four five red blue green yellow purple"))
    val rows = DedupOps.contaminationReport(train, eval).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(10L) == ((8L, 8L, 1000000L)))
    assert(rows(11L) == ((8L, 0L, 0L)))
    assert(rows(12L) == ((8L, 3L, 3L * 1000000L / 8L)))
  }

  test("duplicate shingles in eval count once (distinct semantics)") {
    val train = mk(Seq(1L -> trainText))
    // "one two three" repeated: distinct shingles = (one,two,three),
    // (two,three,one), (three,one,two) — only the first is in train
    val eval = mk(Seq(20L -> "one two three one two three one two three"))
    val r = DedupOps.contaminationReport(train, eval).collect().head
    assert(r.getLong(1) == 3L, "distinct shingles")
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 1000000L / 3L)
  }
}
