package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin

/** The deletion-neighborhood fuzzy join must produce exactly the pairs
  * the naive cross-join + levenshtein filter produces (the oracle the
  * driver also runs at sf0.01), and must plan as an equi-join — the
  * whole point is killing the O(n·m) nested loop.
  */
class FuzzyJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // every distance-1 edit class + equal strings + distance-2 negatives
  private val left = Seq(
    "gear", "gears", "gea", "bear", "small ring", "smal ring",
    "widget", "widgett", "xyz")
  private val right = Seq(
    "gear",        // equal → dist 0
    "gears",       // vs gear: one insertion
    "ger",         // vs gear: one deletion (and vs gea: substitution)
    "fear",        // vs gear/bear: one substitution
    "small ring",  // space handling: equal + "smal ring" deletion
    "widget",      // vs widgett: insertion
    "abcdef")      // matches nothing

  test("editDistance1Join ≡ cross join + levenshtein <= 1, planned as equi-join") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val l = left.toDF("a").distinct()
    val r = right.toDF("b").distinct()

    val fuzzy = FuzzyJoin.editDistance1Join(l, "a", r, "b")
    val naive = l.crossJoin(r)
      .filter(levenshtein(col("a"), col("b")) <= 1)
      .select(col("a"), col("b"), levenshtein(col("a"), col("b")).cast("long").as("dist"))

    val got = fuzzy.collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    val want = naive.collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(got == want, s"fuzzy=$got\nnaive=$want")
    // sanity: the oracle itself is non-trivial (several match classes hit)
    assert(want.exists(_._3 == 0L) && want.exists(_._3 == 1L) && want.size >= 8)

    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"fuzzy join fell back to a nested loop:\n$plan")
  }

  test("exhaustive parity on the full {a,b}<=4 language (incl. empty string)") {
    import spark.implicits._
    // 31 strings; every unordered pair is some edit-distance case:
    // equal, insert, delete, substitute, repeated-char collapses, ""
    val lang = (0 to 4).flatMap(n =>
      Seq.fill(n)(Seq("a", "b")).foldLeft(Seq("")) { (acc, cs) =>
        for (p <- acc; c <- cs) yield p + c
      }).distinct
    val l = lang.toDF("a")
    val r = lang.toDF("b")
    val got = FuzzyJoin.editDistance1Join(l, "a", r, "b")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    val want = l.crossJoin(r)
      .filter(levenshtein(col("a"), col("b")) <= 1)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == want,
      s"missing=${want -- got}\nextra=${got -- want}")
  }

  test("deletionKeys: {s} plus unique single-deletions") {
    import spark.implicits._
    val keys = Seq("aab").toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s")).as("k"))
      .head().getSeq[String](0).toSet
    // deleting position 1 or 2 both give "ab" — deduped
    assert(keys == Set("aab", "ab", "aa"))
  }
}
