package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Feistel global shuffle (`feistelShuffle`): a 4-round balanced
  * Feistel permutation is a bijection for ANY round function, so the
  * shuffle key is provably collision-free — pinned here by replaying
  * the exact arithmetic locally and by distinct-count identities, plus
  * the positional contract (dense 1..n_s per shard) and domain
  * independence (ids need not start at 0 or be dense). */
class FeistelShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, "/root/testdata/sf0.01", "documents").cache()
  }

  /** Local replay of the engine/oracle arithmetic — same constants,
    * same bound intermediates. */
  private def refPerm(id: Long, w: Int): Long = {
    val mask = (1L << w) - 1L
    val M = 2147483647L; val A = 48271L
    var l = id >> w
    var r = id & mask
    for (c <- CurationOps.FeistelKeys) {
      val f = (((r + c) % M) * A + c) % M
      val nr = l ^ (f & mask)
      l = r; r = nr
    }
    (l << w) | r
  }

  test("perm is a bijection: distinct, in-domain, and replays locally row-for-row") {
    val out = CurationOps.feistelShuffle(docs).cache()
    val n = docs.count()
    assert(out.count() == n)
    assert(out.select("perm").distinct().count() == n)
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxId, 1L))
    val w = math.max(4, (bitlen + 1) / 2)
    assert(out.filter(col("perm") < 0 || col("perm") >= (1L << (2 * w))).isEmpty)
    val mismatches = out.select("doc_id", "perm").collect()
      .count(r => refPerm(r.getLong(0), w) != r.getLong(1))
    assert(mismatches == 0)
  }

  test("positions are dense 1..n_s per shard and deterministic across runs") {
    val a = CurationOps.feistelShuffle(docs)
    val b = CurationOps.feistelShuffle(docs)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
    assert(perShard.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("nd") =!= col("n")).isEmpty)
  }

  test("shard balance: avalanche spreads a dense id range ~uniformly") {
    val n = docs.count().toDouble
    val sizes = CurationOps.feistelShuffle(docs)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 16)
    // binomial(n, 1/16): mean ~31, sd ~5.4 at sf0.01 — allow 4 sd
    val mean = n / 16.0
    val sd = math.sqrt(n * (1.0 / 16) * (15.0 / 16))
    assert(sizes.forall(s => math.abs(s - mean) <= 4 * sd),
      s"shard sizes ${sizes.mkString(",")} vs mean $mean sd $sd")
  }

  test("sparse, offset id domains still permute bijectively") {
    import spark.implicits._
    val ids = Seq(1000L, 1001L, 1007L, 1040L, 5000L, 99999L)
    val df = ids.toDF("doc_id")
    val out = CurationOps.feistelShuffle(df)
    assert(out.select("perm").distinct().count() == ids.size)
    val maxId = ids.max
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(maxId)
    val w = math.max(4, (bitlen + 1) / 2)
    out.select("doc_id", "perm").collect()
      .foreach(r => assert(refPerm(r.getLong(0), w) == r.getLong(1)))
  }

  test("consecutive ids scatter: no shard keeps a run of neighbors") {
    import spark.implicits._
    // 0..255 in order; after the permutation, adjacent ids should
    // almost never be adjacent in (shard, pos) — the i.i.d.-stream
    // property sequential shard readers rely on
    val df = (0L until 256L).toDF("doc_id")
    val out = CurationOps.feistelShuffle(df)
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val adjacentKept = (0L until 255L).count { i =>
      val (s1, p1) = out(i); val (s2, p2) = out(i + 1)
      s1 == s2 && math.abs(p1 - p2) == 1
    }
    info(s"adjacent pairs still adjacent after shuffle: $adjacentKept/255")
    assert(adjacentKept <= 8)
  }
}
