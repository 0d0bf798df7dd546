package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.UnigramKernel
import graft.ops.TextOps

/** Unigram-LM tokenizer: list-walk reference parity for the Viterbi
  * segmenter (vs exhaustive enumeration of ALL segmentations with the
  * same tie-break), exact-integer cost properties, and train/encode
  * sanity on the real corpus. */
class UnigramSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("log2Milli: exact at powers of two, monotone, zero at one") {
    assert(UnigramKernel.log2Milli(1) == 0L)
    for (b <- 0 to 40) assert(UnigramKernel.log2Milli(1L << b) == 1000L * b)
    val vals = (1L to 5000L).map(UnigramKernel.log2Milli)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
    // linear-interp error stays under one octave step
    assert(UnigramKernel.log2Milli(6) == 2500L) // log2 6 ≈ 2.585
  }

  /** Every segmentation of `word` into pieces from `table`, by simple
    * recursive list-walk (the brute-force reference). */
  private def allSegs(word: String, table: Map[String, Long],
      maxPieceLen: Int): Seq[List[String]] =
    if (word.isEmpty) Seq(Nil)
    else (1 to math.min(maxPieceLen, word.length)).flatMap { l =>
      val p = word.substring(0, l)
      if (table.contains(p)) allSegs(word.substring(l), table, maxPieceLen).map(p :: _)
      else Nil
    }

  test("viterbi ≡ brute-force min-cost list walk (incl. tie-break) on random words") {
    val alpha = Gen.oneOf('a', 'b', 'c')
    val wordGen = for {
      n <- Gen.choose(0, 10)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    // random piece table: all singles (so words always segment) plus
    // random multi-char pieces with random small costs — small cost
    // range forces frequent TIES so the plen-DESC break is exercised
    val tableGen = for {
      nMulti <- Gen.choose(0, 8)
      multis <- Gen.listOfN(nMulti, for {
        l <- Gen.choose(2, 4); cs <- Gen.listOfN(l, alpha)
      } yield cs.mkString)
      costs <- Gen.listOfN(nMulti + 3, Gen.choose(0L, 4L))
    } yield (Seq("a", "b", "c") ++ multis).distinct.zip(costs).toMap
    check(Prop.forAll(wordGen, tableGen) { (w, table) =>
      val hm = new java.util.HashMap[String, java.lang.Long]()
      table.foreach { case (p, c) => hm.put(p, c) }
      val got = UnigramKernel.viterbi(w, hm, 4)
      val segs = allSegs(w, table, 4)
      if (w.isEmpty) assert(got.sameElements(Array.empty[String]))
      else {
        assert(segs.nonEmpty) // singles make every word segmentable
        val cost = (s: List[String]) => s.map(table).sum
        val best = cost(segs.minBy(cost))
        assert(cost(got.toList) == best,
          s"viterbi cost ${cost(got.toList)} != best $best for '$w'")
        // tie-break: among min-cost segmentations, viterbi must pick
        // the one the (cost ASC, plen DESC) DP picks — greedily
        // longest LAST piece at every suffix. Reference: walk the
        // min-cost segmentations and keep those with the longest last
        // piece, recursively from the end.
        val minSegs = segs.filter(cost(_) == best)
        val ref = minSegs.reduceLeft { (x, y) =>
          // lexicographic-from-the-END on piece lengths, longer wins
          val (rx, ry) = (x.reverse.map(_.length), y.reverse.map(_.length))
          if (Ordering.Implicits.seqOrdering[Seq, Int].compare(rx, ry) >= 0) x else y
        }
        assert(got.toList == ref,
          s"tie-break drift for '$w': got ${got.toList}, want $ref of $minSegs")
      }
      true
    })
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("train on sf0.001: singles retained, costs non-negative, EM used pieces") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val vocab = TextOps.unigramTrain(docs).collect()
    assert(vocab.nonEmpty)
    val pieces = vocab.map(_.getString(0))
    assert(pieces.distinct.length == pieces.length)
    assert(vocab.forall(_.getLong(2) >= 0L), "negative cost")
    // every character of the corpus token stream must be present as a
    // single (the coverage rule), so every string stays encodable
    val chars = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .select(explode(split(col("w"), "")).as("c")).filter(col("c") =!= "")
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces.toSet), s"missing singles: ${chars -- pieces.toSet}")
    // EM actually kept multi-char pieces (a vocab of only singles
    // means the trainer degenerated to a char tokenizer)
    assert(pieces.exists(_.length > 1), "no multi-char piece survived EM")
  }

  test("corpus encode: n_tokens ≤ n_pieces ≤ n_chars; deterministic re-run") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val st = TextOps.unigramCorpusStats(docs).collect()
    assert(st.length == docs.count())
    val tokStats = TextOps.tokenStats(docs).select("doc_id", "n_tokens", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    st.foreach { r =>
      val (nTok, nPieces) = (r.getLong(1), r.getLong(2))
      val (wantTok, _) = tokStats(r.getLong(0))
      assert(nTok == wantTok)
      assert(nPieces >= nTok, s"fewer pieces than tokens: $r")
      assert(r.getLong(3) >= 0L)
    }
    val again = TextOps.unigramCorpusStats(docs).collect()
    assert(st.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("long words fall back to characters on the engine side") {
    import spark.implicits._
    val longWord = "x" * (TextOps.UniMaxWordLen + 5)
    val docs = Seq((1L, s"aa $longWord bb")).toDF("doc_id", "text")
    val st = TextOps.unigramCorpusStats(docs).collect()(0)
    // the long word contributes exactly length(w) single-char pieces
    assert(st.getLong(1) == 3L)
    assert(st.getLong(2) >= (TextOps.UniMaxWordLen + 5).toLong)
  }
}
