package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BpeKernel, TextNative}

/** BPE tokenizer kernel: parity vs an independent brute-force
  * reference encoder, structural invariants, and distributed
  * execution. The fixture-literal oracle (`txt_bpe_encode`) is
  * additionally hash-checked by the driver gate. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Straight-from-the-definition reference: repeatedly merge the
    * lowest-rank adjacent pair (immutable lists, no index juggling). */
  private def refEncode(word: String): List[String] = {
    val rank = BpeKernel.Merges.zipWithIndex.toMap
    def step(parts: List[String]): List[String] = {
      val cands = parts.zip(parts.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (cands.isEmpty) parts
      else {
        val (_, i) = cands.minBy(_._1)
        step(parts.take(i) ::: (parts(i) + parts(i + 1)) :: parts.drop(i + 2))
      }
    }
    if (word.isEmpty) Nil else step(word.map(_.toString).toList)
  }

  test("kernel matches the brute-force reference on random words") {
    val alphabet = "abcdefghijklmnopqrstuvwxyz0139"
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val w = (0 until (1 + rnd.nextInt(14)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(BpeKernel.encodeWord(w).toList == refEncode(w), s"word: $w")
    }
    // every merge-table output string must round-trip as a full merge
    BpeKernel.Merges.foreach { case (a, b) =>
      assert(BpeKernel.encodeWord(a + b).length == 1,
        s"'$a$b' is in the vocab and must encode to one token")
    }
  }

  test("tokens concatenate back to the pretoken stream (losslessness)") {
    val texts = Seq("the customer table joins a small batch",
      "Filter ORDER BY key hash value", "unseen zebra qq", "x", "")
    texts.foreach { t =>
      val pre = graft.functions.TextKernel.tokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val enc = BpeKernel.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(enc.mkString == pre.mkString, s"text: $t")
    }
  }

  test("distributed execution: token count bounded by chars, >= pretokens; deterministic") {
    import spark.implicits._
    val docs = (1L to 300L).map(i =>
      (i, s"customer $i orders a small batch of ${i % 7} filters"))
      .toDF("doc_id", "text")
    def run(p: Int) = docs.repartition(p)
      .select(col("doc_id"), TextNative.bpe_encode(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("n"),
        array_join(col("tk"), " ").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val a = run(1)
    assert(a == run(9))
    a.foreach { case (id, n, s) =>
      assert(n >= 8, s"doc $id: fewer tokens than pretokens")
      assert(s.replace(" ", "").length < 60, s"doc $id: no compression")
    }
    // the trained vocab compresses its own corpus vocabulary well:
    // common words are single tokens
    val one = BpeKernel.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "customer table value hash batch scan"))
    assert(one.length == 6, s"got ${one.mkString("|")}")
  }

  /** Independent reference TRAINER: word-frequency map, overlapping
    * adjacent pair counts, (count desc, pair asc) argmax, greedy
    * left-to-right merge application via an explicit list walk — no
    * separator strings, no replace(), so it can't share a bug with
    * the operator's string-based formulation. */
  private def refTrain(corpus: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[List[String], Long] = corpus
      .flatMap(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toList -> ws.size.toLong
      }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      def merge(s: List[String]): List[String] = s match {
        case `a` :: `b` :: rest => (a + b) :: merge(rest)
        case h :: rest => h :: merge(rest)
        case Nil => Nil
      }
      vocab = vocab.toSeq.map { case (s, n) => (merge(s), n) }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      (r.toLong, a, b, cnt)
    }
  }

  test("trainer matches the independent list-walk reference, incl. the overlap case") {
    import spark.implicits._
    val corpus = Seq(
      "the theme thesis then the the",
      "aaa aaa aa baaab",          // overlap: greedy leftmost (aa)(a)
      "order order order by key",
      "zz qq zz qq zz")
    val expected = refTrain(corpus, 6)
    val got = graft.ops.TextOps.bpeTrainMerges(
      corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), rounds = 6)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
  }

  test("trainer is partitioning-invariant and merges compose left-to-right") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, s"pipeline pipeline value id$i"))
      .toDF("doc_id", "text")
    val a = graft.ops.TextOps.bpeTrainMerges(docs, rounds = 3).collect().toSeq
    val b = graft.ops.TextOps.bpeTrainMerges(docs.repartition(11), rounds = 3)
      .collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
    // round k's merged symbol can feed round k+1 (pair symbols grow)
    val syms = a.map(r => (r.getString(1), r.getString(2)))
    assert(syms.exists { case (x, y) => (x + y).length > 2 },
      s"no composed merge in $syms")
  }
}
