package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Pins the one-pass [[graft.functions.StopwordScores]] kernel to the
  * higher-order-function formulation it replaced in
  * `TextOps.languageId` (`size(filter(tokens, _.isin(list)))` per
  * language, which re-instantiated the split/filter tokenizer once per
  * referencing column — ~8× per row). Parity is row-EXHAUSTIVE over
  * the sf0.001 documents corpus plus hand-built edge rows, so a
  * semantics drift in the kernel is a failing equality, not a bench
  * mystery. */
class StopwordKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The pre-kernel HOF formulation, kept verbatim as the reference. */
  private def hofLanguageId(docs: org.apache.spark.sql.DataFrame) = {
    val toks = TextOps.tokens(col("text"))
    def score(words: Seq[String]) =
      size(filter(toks, x => x.isin(words: _*))).cast("long")
    val Seq(en, de, fr, es) = TextOps.StopwordProfiles.map(p => score(p._2))
    docs.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("en_score"), de.as("de_score"), fr.as("fr_score"), es.as("es_score"),
      when(en >= greatest(de, fr, es) && en > 0, "en")
        .when(de >= greatest(fr, es) && de > 0, "de")
        .when(fr >= es && fr > 0, "fr")
        .when(es > 0, "es")
        .otherwise("und").as("pred_lang"))
  }

  test("kernel languageId ≡ HOF formulation on every sf0.001 document") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val got = TextOps.languageId(docs).orderBy("doc_id").collect()
    val want = hofLanguageId(docs).orderBy("doc_id").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"row drift: $g vs $w") }
  }

  test("kernel languageId ≡ HOF on edge rows (null, empty, ties, unicode)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", null.asInstanceOf[String]),
      (2L, "en", ""),
      (3L, "en", "   \t\n  "),
      (4L, "en", "the der le el"), // 4-way tie → priority order wins
      (5L, "de", "DER Die UND das das das"), // case-fold + duplicates weigh
      (6L, "fr", "le le les est une et"),
      (7L, "es", "el y una los"),
      (8L, "und", "zzz qqq 汉字 Ünïcodé"),
      (9L, "en", "the the the und und le el es y")
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.languageId(docs).orderBy("doc_id").collect()
    val want = hofLanguageId(docs).orderBy("doc_id").collect()
    got.zip(want).foreach { case (g, w) => assert(g == w, s"row drift: $g vs $w") }
    // spot-pin the semantics themselves, not just HOF parity
    val byId = got.map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(byId(1L) == "und" && byId(2L) == "und" && byId(3L) == "und")
    assert(byId(4L) == "en") // tie → fixed priority en > de > fr > es
    assert(byId(5L) == "de" && byId(6L) == "fr" && byId(7L) == "es")
    assert(byId(9L) == "en")
  }

  test("stopword_scores counts the token MULTISET (duplicates weigh)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.StringType
    val lists = TextOps.StopwordProfiles.map(_._2)
    def kernel(text: String): Seq[Long] =
      graft.functions.StopwordScores(
          Literal.create(UTF8String.fromString(text), StringType), lists)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    assert(kernel("the the the") == Seq(3L, 0L, 0L, 0L))
    assert(kernel("  The\tAND  of ") == Seq(3L, 0L, 0L, 0L))
    assert(kernel("y y es es es") == Seq(0L, 0L, 0L, 5L))
    // "es" lives only in the es list; "est/et" only fr; "is" only en
    assert(kernel("is ist est es") == Seq(1L, 1L, 1L, 1L))
    assert(kernel("") == Seq(0L, 0L, 0L, 0L))
  }

  test("langIdConfusion: rows recompose languageId's counts exactly; " +
    "per-true-language fractions sum to 1e6 minus only floor residue") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val conf = TextOps.langIdConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val pred = TextOps.languageId(docs)
      .select("labeled_lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = pred.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(conf.nonEmpty && conf.length == want.size)
    conf.foreach { case (t, p, n, nTrue, ppm) =>
      assert(n == want((t, p)), s"cell ($t,$p)")
      assert(nTrue == pred.count(_._1 == t).toLong, s"row total for $t")
      assert(ppm == n * 1000000L / nTrue, s"ppm exact for ($t,$p)")
    }
    conf.groupBy(_._1).foreach { case (t, rows) =>
      val s = rows.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$t fractions must cover 1e6 up to floor residue, got $s")
    }
  }

  test("planted unambiguous corpus: the confusion diagonal is exactly 1e6") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the and of to is", "en"), (2L, "the of is and the", "en"),
      (3L, "der die und ist das", "de"), (4L, "le les et est une", "fr"),
      (5L, "el los y es una", "es")).toDF("doc_id", "text", "lang")
    val conf = TextOps.langIdConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(conf.map(_._1).toSet == Set("en", "de", "fr", "es"))
    assert(conf.forall { case (t, p, ppm) => t == p && ppm == 1000000L },
      s"expected a pure diagonal, got ${conf.mkString(", ")}")
  }
}
