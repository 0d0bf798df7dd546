package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Property checks for the UniMax waterfall (`mix_unimax`): the
  * Spark op must agree EXACTLY with a plain-Scala fold of the same
  * round definition on randomized corpora, and the allocation
  * invariants (caps respected, budget never exceeded, uncapped
  * equality, bounded floor residue, budget monotonicity) must hold at
  * every generated parameter choice. The pure-fold properties run
  * hundreds of cases without Spark; the Spark≡fold equality runs a
  * smaller generated batch through the real operator. */
class UnimaxPropsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Plain-Scala reference: the driver loop verbatim, zero Spark. */
  private def reference(sizes: Map[String, Long], mult: Long, maxE: Long,
      rounds: Int = CurationOps.UnimaxRounds): Map[String, Long] = {
    val budget = sizes.values.sum * mult
    val cap = sizes.map { case (l, n) => l -> n * maxE }
    var alloc: Map[String, Long] = sizes.map { case (l, _) => l -> 0L }
    for (_ <- 1 to rounds) {
      val spent = alloc.values.sum
      val nUnc = math.max(alloc.count { case (l, a) => a < cap(l) }, 1).toLong
      val share = (budget - spent) / nUnc
      alloc = alloc.map { case (l, a) =>
        l -> (if (a < cap(l)) math.min(a + share, cap(l)) else a)
      }
    }
    alloc
  }

  private val sizesGen: Gen[Map[String, Long]] = for {
    n <- Gen.choose(1, 6)
    sizes <- Gen.listOfN(n, Gen.choose(1L, 5000L))
  } yield sizes.zipWithIndex.map { case (s, i) => s"l$i" -> s }.toMap
  private val multGen = Gen.choose(1L, 8L)
  private val epochGen = Gen.choose(1L, 5L)

  test("fold invariants: caps respected, never over budget, uncapped " +
    "languages get exactly equal tokens, floor residue < rounds * n_langs") {
    check(Prop.forAll(sizesGen, multGen, epochGen) { (sizes, mult, maxE) =>
      val a = reference(sizes, mult, maxE)
      val budget = sizes.values.sum * mult
      assert(a.forall { case (l, v) => v <= sizes(l) * maxE }, "caps")
      assert(a.values.sum <= budget, "budget")
      val uncapped = a.filter { case (l, v) => v < sizes(l) * maxE }
      assert(uncapped.values.toSet.size <= 1, s"uncapped equality: $uncapped")
      // residue: either everyone capped (sum == cap total <= budget) or
      // what remains is floor loss, < one share-floor per round per lang
      if (uncapped.nonEmpty)
        assert(budget - a.values.sum <
          CurationOps.UnimaxRounds.toLong * sizes.size,
          s"residue ${budget - a.values.sum}")
      true
    })
  }

  test("fold monotonicity: growing the budget never shrinks any " +
    "language's allocation; growing the epoch cap never shrinks the TOTAL " +
    "(per-language cap monotonicity is provably false — a higher cap lets " +
    "small languages absorb shares that previously flowed to large ones)") {
    // floor truncation re-lands differently when shares change, so
    // both directions hold only up to the rounds x n_langs floor loss
    check(Prop.forAll(sizesGen, multGen, epochGen) { (sizes, mult, maxE) =>
      val slack = CurationOps.UnimaxRounds.toLong * sizes.size
      val a = reference(sizes, mult, maxE)
      val b = reference(sizes, mult + 1, maxE)
      assert(sizes.keys.forall(l => b(l) >= a(l) - slack), "budget monotone")
      val c = reference(sizes, mult, maxE + 1)
      assert(c.values.sum >= a.values.sum - slack, "cap monotone in the total")
      true
    })
  }

  test("Spark operator ≡ plain fold exactly on randomized corpora") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    check(Prop.forAll(sizesGen, multGen, epochGen) { (sizes, mult, maxE) =>
      val docs = sizes.toSeq.zipWithIndex.map { case ((lang, n), i) =>
        (i.toLong, Seq.fill(n.toInt)("w").mkString(" "), lang)
      }.toDF("doc_id", "text", "lang")
      val got = CurationOps.mixUnimax(docs, budgetMult = mult, maxEpochs = maxE)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val want = reference(sizes, mult, maxE)
      assert(got == want, s"sizes=$sizes mult=$mult maxE=$maxE:\n$got\nvs $want")
      true
    }, n = 12)
  }
}
