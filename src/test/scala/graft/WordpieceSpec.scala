package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.functions.WordpieceKernel
import graft.ops.TextOps

/** WordPiece tokenizer: the likelihood argmax that distinguishes it
  * from BPE (a rare pair of rare symbols beats a frequent pair of
  * ubiquitous symbols), greedy longest-match-first encode parity
  * against a brute-force reference, and corpus-level invariants. */
class WordpieceSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("trainer picks the likelihood argmax where BPE picks the count argmax") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // pair (a,b): 10 adjacent occurrences, but both symbols are
    // ubiquitous (100 extra standalone occurrences each) — high count,
    // low likelihood gain. pair (q,z): 8 occurrences, symbols appear
    // nowhere else — lower count, far higher likelihood gain.
    //   score(a,b) = l2m(10) − 2·l2m(110) ≈ −10.2 bits
    //   score(q,z) = l2m(8) − 2·l2m(8) = −3 bits
    val text = (Seq.fill(10)("ab") ++ Seq.fill(100)("a") ++
      Seq.fill(100)("b") ++ Seq.fill(8)("qz")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val wp = TextOps.wordpieceTrainMerges(docs, rounds = 1).collect()(0)
    assert((wp.getString(1), wp.getString(2)) == ("q", "z"),
      s"WordPiece must take the likelihood argmax: $wp")
    val bpe = TextOps.bpeTrainMerges(docs, rounds = 1).collect()(0)
    assert((bpe.getString(1), bpe.getString(2)) == ("a", "b"),
      s"BPE control arm must take the count argmax: $bpe")
  }

  test("trainer tie-break: equal scores resolve (a ASC, b ASC)") {
    import spark.implicits._
    // two pairs with identical counts and identical unit counts —
    // identical scores; (p,q) < (r,s) lexicographically
    val text = (Seq.fill(5)("pq") ++ Seq.fill(5)("rs")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val m = TextOps.wordpieceTrainMerges(docs, rounds = 1).collect()(0)
    assert((m.getString(1), m.getString(2)) == ("p", "q"), m.toString)
  }

  /** Brute-force greedy longest-match reference. */
  private def refGreedy(w: String, vocab: Set[String], maxLen: Int): Int = {
    var pos = 0; var n = 0
    while (pos < w.length) {
      val l = (math.min(maxLen, w.length - pos) to 2 by -1)
        .find(k => vocab.contains(w.substring(pos, pos + k))).getOrElse(1)
      n += 1; pos += l
    }
    n
  }

  test("greedy kernel ≡ brute-force reference on random words/vocabs") {
    val alpha = Gen.choose('a', 'd')
    val wordGen = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    val vocabGen = for {
      n <- Gen.choose(0, 8)
      ps <- Gen.listOfN(n, for {
        l <- Gen.choose(2, 5)
        cs <- Gen.listOfN(l, alpha)
      } yield cs.mkString)
    } yield ps.toSet
    check(Prop.forAll(wordGen, vocabGen) { (w, vocab) =>
      val hs = new java.util.HashSet[String]()
      vocab.foreach(hs.add)
      WordpieceKernel.greedyPieces(w, hs, 16) == refGreedy(w, vocab, 16) ||
        w.isEmpty
    })
  }

  test("longest-match-first: 'abcd' with vocab {ab, abc} is [abc, d]") {
    val hs = new java.util.HashSet[String]()
    Seq("ab", "abc").foreach(hs.add)
    assert(WordpieceKernel.greedyPieces("abcd", hs, 16) == 2)
    // greedy, not optimal: vocab {ab, bcd} on "abcd" takes ab + c + d
    val hs2 = new java.util.HashSet[String]()
    Seq("ab", "bcd").foreach(hs2.add)
    assert(WordpieceKernel.greedyPieces("abcd", hs2, 16) == 3)
  }

  test("corpus stats: n_tokens ≤ n_pieces ≤ n_chars; long-word fallback; rerun-deterministic") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val st = TextOps.wordpieceCorpusStats(docs).collect()
    assert(st.length == docs.count())
    st.foreach { r =>
      val (nTok, nPieces, nChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok <= nPieces, s"fewer pieces than tokens: $r")
      assert(nPieces <= nChars, s"more pieces than chars: $r")
      assert(r.getLong(4) == (if (nChars == 0) 0L
        else nPieces * 1000000L / nChars))
    }
    val again = TextOps.wordpieceCorpusStats(docs).collect()
    assert(st.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    import spark.implicits._
    val longWord = "y" * (TextOps.WpMaxWordLen + 4)
    val d2 = Seq((1L, s"aa $longWord")).toDF("doc_id", "text")
    val s2 = TextOps.wordpieceCorpusStats(d2).collect()(0)
    assert(s2.getLong(1) == 2L)
    // the long word contributes exactly length(w) per-char pieces
    assert(s2.getLong(2) >= (TextOps.WpMaxWordLen + 4 + 1).toLong)
  }

  test("train on sf0.001: merges non-trivial, scores finite, rounds sequential") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val m = TextOps.wordpieceTrainMerges(docs).collect()
    assert(m.length == TextOps.WpTrainRounds)
    assert(m.map(_.getLong(0)).toSeq == (1L to TextOps.WpTrainRounds).toSeq)
    m.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert(r.getLong(3) >= 1L, s"merge with zero pair count: $r")
    }
  }
}
