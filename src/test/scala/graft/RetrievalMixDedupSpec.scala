package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, DedupOps, SimilarityOps, TextOps}

/** Behavioral invariants for the round-9 retrieval/curation additions
  * (the driver gate additionally cross-checks each against DuckDB at
  * sf0.01): BM25 ranking order, SemDeDup keeper selection, the
  * bloom-prefiltered incremental dedup's exactness, and the
  * temperature mixture's token-budget preservation. */
class RetrievalMixDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bm25TopDocs: more matched terms rank higher; shorter docs beat " +
    "longer at equal tf; non-matching docs never appear") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq(
      (1L, "data model data hash"), // data tf=2 + hash tf=1, dl=4
      (2L, "data filler filler filler filler filler filler filler"), // dl=8
      (3L, "data filler filler"), // same tf as 2, dl=3
      (4L, "nothing here at all")) // zero query terms
      .toDF("doc_id", "text")
    val got = TextOps.bm25TopDocs(docs, Seq("data", "hash"), k = 10)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!got.contains(4L)) // no hit, no row
    assert(got(1L)._2 == 2L && got(3L)._2 == 1L) // n_hit_terms
    assert(got(1L)._3 > got(3L)._3) // extra matched term wins
    assert(got(3L)._3 > got(2L)._3) // length normalization: short doc wins
  }

  test("semDedup: min-id representative kept per duplicate set; " +
    "zero-norm vectors screened out") {
    import spark.implicits._
    val v1 = Array(1.0f, 0.0f)
    val v2 = Array(0.0f, 1.0f)
    val rows = Seq(
      (0L, v1), (1L, v2), // first-2 rows double as the centroids
      (10L, v1), (11L, v1), // exact dups of 0 → cluster 0, dropped
      (20L, v2), // exact dup of 1 → cluster 1, dropped
      (30L, Array(0.0f, 0.0f))) // zero norm: cannot cosine-match
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.semDedup(rows, tau = 0.99, nCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(!got.map(_._1).contains(30L))
    assert(got.filter(_._3).map(_._1).toSet == Set(0L, 1L))
    assert(got.filterNot(_._3).map(_._1).toSet == Set(10L, 11L, 20L))
    // cluster assignment: dups sit with their identical centroid
    assert(got.filter(r => Set(10L, 11L)(r._1)).forall(_._2 == 0L))
    assert(got.filter(_._1 == 20L).forall(_._2 == 1L))
  }

  test("incrementalNovelPairs equals the plain anti-join — the bloom " +
    "prefilter is pure shuffle reduction, zero result error") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.t(spark, d, "events")
    val got = DedupOps.incrementalNovelPairs(ev)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val keyed = ev.withColumn("item",
      get_json_object(col("props"), "$.k").cast("long"))
    val cut = lit(DedupOps.IncrCutTs).cast("timestamp")
    val batch = keyed.filter(col("ts") >= cut).groupBy("user_id", "item")
      .agg(count(lit(1)).as("n_events"), min("event_id").as("first_event_id"))
    val hist = keyed.filter(col("ts") < cut)
      .select("user_id", "item").distinct()
    val want = batch.join(hist, Seq("user_id", "item"), "left_anti")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("mixTemperature: Σ rate·n_tokens preserves the corpus total and " +
    "the mixture flattens toward low-resource groups") {
    val rows = CurationOps.queries("mix_temperature")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(rows.length >= 2)
    val total = rows.map(_._3).sum.toDouble
    val weighted = rows.map(r => r._5 * r._3.toDouble).sum
    assert(math.abs(weighted - total) / total < 1e-4,
      s"token budget drifted: $weighted vs $total")
    // temperature flattening: fewest-token group gets the highest rate
    val byTok = rows.sortBy(_._3)
    assert(byTok.head._5 == rows.map(_._5).max)
    assert(byTok.last._5 == rows.map(_._5).min)
    // realized copies bracket: every doc emits whole or whole+1 copies
    rows.foreach { r =>
      val whole = math.floor(r._5).toLong
      assert(r._6 >= whole * r._2 && r._6 <= (whole + 1) * r._2,
        s"${r._1}: n_out ${r._6} outside [$whole, ${whole + 1}]×${r._2}")
    }
  }

  test("spanRemove ≡ brute-force reference on random small-vocab corpora " +
    "(fuzz: shared-span detection, interval union, accounting)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val (k, stride) = (4, 2)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val docGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 10).flatMap(n => Gen.listOfN(n, docGen))

    def reference(texts: Seq[String]): Map[Long, (Long, Long, String)] = {
      val toks = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      val spans = toks.flatMap { case (id, ts) =>
        (1 to ts.length - (k - 1) by stride)
          .map(s => (id, s, ts.slice(s - 1, s - 1 + k).mkString(" "))) }
      val shared = spans.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      toks.map { case (id, ts) =>
        val covered = spans.collect {
          case (d, s, c) if d == id && shared(c) => (s to s + k - 1) }
          .flatten.toSet
        val kept = ts.zipWithIndex.collect {
          case (tk, i) if !covered(i + 1) => tk }
        id -> (ts.length.toLong, (ts.length - kept.length).toLong,
          kept.mkString(" "))
      }.toMap
    }

    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(corpusGen) { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = DedupOps.spanRemove(df, spanSize = k, stride = stride)
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getString(3))).toMap
        got == reference(texts)
      })
    assert(res.passed, res.status.toString)
  }

  test("spanRemove: cross-doc shared spans are excised token-exactly; " +
    "unique docs pass through untouched") {
    import spark.implicits._
    // spanSize=4, stride=2. Docs 1 and 2 share the 8-token prefix →
    // starts {1,3,5} cover tokens 1..8 in both. Doc 3 is unique.
    val sharedPrefix = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$sharedPrefix a1 a2 a3 a4"),
      (2L, s"$sharedPrefix b1 b2 b3 b4"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
      .toDF("doc_id", "text")
    val got = DedupOps.spanRemove(docs, spanSize = 4, stride = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // spans at starts 1,3,5,7,9 — 7 and 9 mix shared+unique tail so
    // only 1,3,5 are cross-doc shared; they cover token idx 1..8
    assert(got(1L) == ((12L, 8L, "a1 a2 a3 a4")))
    assert(got(2L) == ((12L, 8L, "b1 b2 b3 b4")))
    assert(got(3L) == ((10L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")))
    // accounting invariant: n_removed + kept token count = n_toks
    got.values.foreach { case (n, rem, kept) =>
      val nKept = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(rem + nKept == n)
    }
  }
}
