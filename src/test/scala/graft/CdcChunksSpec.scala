package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** Content-defined chunking: the re-synchronization guarantee that is
  * the whole point of CDC over fixed-width (an insertion shifts only
  * the chunk it lands in — everything after the next boundary hashes
  * identically), chunk bookkeeping exactness, and exact-duplicate
  * sharing. The driver gate additionally cross-checks the operator
  * against DuckDB at sf0.01 (`dedup_cdc_chunks`). */
class CdcChunksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def chunksOf(rows: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, String)]] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    DedupOps.cdcChunks(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).sortBy(_._1).toSeq
      }
  }

  // 60 deterministic pseudo-words — long enough that several chunk
  // boundaries fire at CdcMod = 8
  private val words = (1 to 60).map(i => s"tok${i * 7 % 101}x$i")
  private val base = words.mkString(" ")

  test("bookkeeping: chunk token counts sum to the doc's token count; " +
    "indices are dense from 0; identical docs share every chunk hash") {
    val got = chunksOf(Seq((1L, base), (2L, base)))
    val c1 = got(1L)
    assert(c1.map(_._2).sum == 60L)
    assert(c1.map(_._1) == c1.indices.map(_.toLong))
    assert(c1.size > 1, "CdcMod=8 over 60 tokens must produce several chunks")
    assert(got(2L).map(_._3) == c1.map(_._3))
    val shared = DedupOps.cdcChunks {
      import spark.implicits._
      Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    }.collect()
    shared.foreach(r => assert(r.getLong(4) == 2L,
      s"every chunk of an exact duplicate pair is shared by both: $r"))
  }

  test("re-synchronization: a token inserted at the FRONT perturbs only " +
    "chunks before the first boundary — the tail chunk hashes realign") {
    val got = chunksOf(Seq((1L, base), (2L, "zzzinserted " + base)))
    val (h1, h2) = (got(1L).map(_._3), got(2L).map(_._3))
    val common = h1.toSet.intersect(h2.toSet)
    // everything after the first boundary of the original is untouched:
    // all but the first chunk of doc 1 must reappear verbatim in doc 2
    assert(h1.tail.forall(common.contains),
      s"CDC must realign after one boundary; missing: ${h1.tail.filterNot(common.contains)}")
    assert(!h2.head.equals(h1.head) || h2.size != h1.size,
      "the perturbed head must differ somewhere")
  }

  test("kernel boundaries match the committed token hash: a doc whose " +
    "every token hashes nonzero mod 8 is ONE chunk") {
    // search deterministic words with md5Mod % 8 != 0
    val nz = (1 to 500).map(i => s"w$i")
      .filter(w => graft.functions.TextKernel.md5Mod(w) % DedupOps.CdcMod != 0)
      .take(12)
    val got = chunksOf(Seq((1L, nz.mkString(" "))))
    assert(got(1L).size == 1 && got(1L).head._2 == 12L,
      s"no boundary token ⇒ a single 12-token chunk: ${got(1L)}")
  }
}
