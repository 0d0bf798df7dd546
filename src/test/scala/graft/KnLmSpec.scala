package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.TextOps

/** Interpolated Kneser-Ney bigram LM: trainer parity against a plain
  * in-memory reference, the continuation-count property ("san
  * FRANCISCO": frequency inside one fixed collocation earns almost no
  * backoff mass), the OOV perplexity ceiling, and explicit fate for
  * sub-bigram docs. */
class KnLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** House milli-log2 (the bit-length formula), x ≥ 1. */
  private def l2m(x: Long): Long = {
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    1000L * (bl - 1) + ((x * 1000) >> (bl - 1)) - 1000
  }

  /** Plain-Scala KN reference: same D = 3/4 ppm arithmetic as the
    * operator, written as naive loops over in-memory token lists. */
  private def refKn(refDocs: Seq[Seq[String]]) = {
    val bi = refDocs.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cA = bi.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1f = bi.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val n1b = bi.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nT = bi.size.toLong
    val lam = cA.keys.map(w => w -> (3 * n1f(w) * 250000L) / cA(w)).toMap
    val cont = n1b.keys.map(w => w -> (n1b(w) * 1000000L) / nT).toMap
    val p = bi.map { case ((a, b), c) =>
      (a, b) -> math.max(1L,
        ((4 * c - 3) * 250000L) / cA(a) + (lam(a) * cont(b)) / 1000000L)
    }
    (p, lam, cont)
  }

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ref split = doc_id % 4 == 0; ids 0,4,8,... are reference docs
  private val refTexts = Seq(
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog and a bird",
    "san francisco san francisco san francisco")
  private val refRows = refTexts.zipWithIndex.map { case (t, i) => (4L * i, t) }

  test("trainer ≡ in-memory reference on every bigram; score replays the cascade") {
    spark.sparkContext.setLogLevel("WARN")
    val extra = Seq((1L, "the cat sat quietly"), (2L, "zz qq"), (3L, "solo"))
    val df = docsDf(refRows ++ extra)
    val (pRef, lamRef, contRef) = refKn(refTexts.map(_.split(" ").toSeq))

    val model = TextOps.knTrain(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(model.keySet == pRef.keySet, "bigram-type sets differ")
    pRef.foreach { case (k, v) =>
      assert(model(k) == v, s"p_ppm mismatch at $k: ${model(k)} vs $v")
    }

    // score: recompute each doc's expected ppl through the cascade
    val scored = TextOps.knScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    (refRows ++ extra).foreach { case (id, text) =>
      val ts = text.split(" ").toSeq
      val bgs = ts.zip(ts.drop(1))
      val (n, want) = (bgs.size.toLong, if (bgs.isEmpty) None else Some {
        val s = bgs.map { case (a, b) =>
          val p = math.max(1L, pRef.getOrElse((a, b),
            lamRef.get(a) match {
              case Some(l) => (l * contRef.getOrElse(b, 0L)) / 1000000L
              case None => contRef.getOrElse(b, 0L)
            }))
          TextOps.L2M1M - l2m(p)
        }.sum
        s / bgs.size
      })
      assert(scored(id) == ((n, want)), s"doc $id: ${scored(id)} vs ($n, $want)")
    }
  }

  test("KN continuation property: collocation-locked word gets less backoff mass") {
    spark.sparkContext.setLogLevel("WARN")
    // 'francisco' occurs 3x but ONLY after 'san' (1 context);
    // 'bird'/'cat'/'dog' appear after diverse contexts
    val df = docsDf(refRows)
    val (_, _, cont) = refKn(refTexts.map(_.split(" ").toSeq))
    assert(cont("francisco") < cont("cat"),
      "continuation mass must count CONTEXTS, not occurrences")
    // scored through the engine: unseen-context bigrams back off to
    // pure continuation, so the francisco doc must score HIGHER ppl
    val probe = docsDf(refRows ++ Seq(
      (5L, "qqq francisco"), (6L, "qqq cat")))
    val out = TextOps.knScore(probe).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(5L) > out(6L),
      s"ppl(francisco-after-OOV) ${out(5L)} must exceed ppl(cat-after-OOV) ${out(6L)}")
  }

  test("fully-OOV doc hits the perplexity ceiling exactly; sub-bigram docs keep null") {
    spark.sparkContext.setLogLevel("WARN")
    val df = docsDf(refRows ++ Seq(
      (7L, "zzz yyy xxx"), (9L, "solo"), (10L, "")))
    val out = TextOps.knScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(7L) == ((2L, Some(TextOps.L2M1M))),
      s"every OOV bigram floors at p=1 ppm: ${out(7L)}")
    assert(out(9L) == ((0L, None)))
    assert(out(10L) == ((0L, None)))
  }

  test("deterministic under repartition") {
    spark.sparkContext.setLogLevel("WARN")
    val df = docsDf(refRows ++ Seq((1L, "the cat sat quietly")))
    val a = TextOps.knScore(df).collect().map(_.toString).sorted
    val b = TextOps.knScore(df.repartition(7)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
