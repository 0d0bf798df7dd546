package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** Salted as-of parity: [[AsofJoin.asofSalted]] must be row-identical
  * to [[AsofJoin.asof]] — salting is a physical re-partitioning, never
  * a semantic change. Data includes one pathologically hot key (80 % of
  * rows) — the case salting exists for — plus ties at equal timestamps
  * to exercise the tie-break inside each salt bucket.
  */
class AsofSaltedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asofSalted == asof on a hot-key workload (incl. ts ties)") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def rows(n: Int, seed: Int) = (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0xffffffffL
      // key 0 takes ~80% of rows; ts collides every ~50 values
      val key = if (h % 10 < 8) 0L else (h % 10)
      (i.toLong, key, ((h >> 4) % 50L) * 1000L)
    }
    val left = rows(2000, 3).toDF("l_id", "k", "ts")
    val right = rows(500, 11).toDF("r_id", "k", "ts")

    val plain = AsofJoin.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "match_id"), tieBreak = Seq("r_id"))
    val salted = AsofJoin.asofSalted(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "match_id"), tieBreak = Seq("r_id"), salts = 7)

    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("l_id", "k", "ts", "match_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    val p = toSet(plain)
    val s = toSet(salted)
    assert(p == s)
    assert(p.size == 2000)
    assert(p.exists(_._4 >= 0), "expected at least one match")
  }
}
