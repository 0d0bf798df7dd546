package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Hand-computed oracles for the curation operators (the driver gate
  * additionally cross-checks them against DuckDB at sf0.01). */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("repetitionStats: hand-computed repetition signals") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // "a b a b a" → tokens 5 (distinct 2, top 'a'=3);
    // bigrams: "a b","b a","a b","b a" → 4 total, 2 distinct, top=2
    val df = Seq((1L, "a b a b a"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val got = CurationOps.repetitionStats(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8))).toMap
    assert(got(1L) == ((5L, 2L, 3L, 4L, 2L, 2L, 0.5, 0.8)))
    // single token: no bigrams, fractions 0
    assert(got(2L) == ((1L, 1L, 1L, 0L, 0L, 0L, 0.0, 0.0)))
    // empty text: all zero
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  test("redactPii scrubs emails, IPs, phones in order and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "server 192.168.0.1 dialed 555-0147 twice: 555-0147"),
      (3L, "clean text, no pii 1234-5678")).toDF("doc_id", "text")
    val got = CurationOps.redactPii(df, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(got(1L) == ((1, 0, 0, "mail <EMAIL> now")))
    assert(got(2L) == ((0, 1, 2, "server <IP> dialed <PHONE> twice: <PHONE>")))
    // 1234-5678 is not a NNN-NNNN phone (\b\d{3}- requires exactly 3)
    assert(got(3L) == ((0, 0, 0, "clean text, no pii 1234-5678")))
  }

  test("stratified sample is deterministic and respects thresholds") {
    val d = "/root/testdata/sf0.001"
    val a = CurationOps.queries("sample_stratified")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = CurationOps.queries("sample_stratified")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b) // same rows kept on every run
    val thr = CurationOps.SampleThresholds.toMap
    a.foreach { case (tpe, (total, sampled)) =>
      assert(sampled <= total)
      // purchase kept fully; sampled fraction near thr/10000 elsewhere
      if (thr(tpe) == 10000L) assert(sampled == total)
      else assert(math.abs(sampled.toDouble / total - thr(tpe) / 10000.0) < 0.15)
    }
  }

  test("mixTokenBudget stripe-count invariance: cum_before identical at " +
    "1 (the single global window), 7, and 64 stripes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.sparkContext.setLogLevel("WARN")
    val docs = (0 until 400).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      (i.toLong, lang, Seq.fill(3 + i % 7)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val weights = Seq("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)
    def run(n: Int) =
      CurationOps.mixTokenBudget(docs, budget = 500L, weights, stripes = n)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val one = run(1)
    assert(one.nonEmpty && run(7) == one && run(64) == one)
    // the greedy-prefix rule still holds: every kept doc's cum_before
    // is under its stratum budget
    val budgets = weights.map { case (k, f) => k -> Math.round(f * 500L) }.toMap
    one.foreach { case (_, lang, _, cum) => assert(cum < budgets(lang)) }
  }

  test("curate_keep output satisfies every filter it claims") {
    val d = "/root/testdata/sf0.01"
    val kept = CurationOps.queries("curate_keep")(spark, d).collect()
    assert(kept.nonEmpty && kept.length < 500) // genuinely filters
    kept.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_tokens"))
      assert(n >= 30 && n <= 100)
      assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) < 0.05)
    }
    // keeper selection: no two kept docs share content
    val docs = graft.Tables.t(spark, d, "documents")
    val ids = kept.map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions._
    val dupContent = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .groupBy(md5(lower(trim(col("text"))))).count()
      .filter(col("count") > 1).count()
    assert(dupContent == 0)
  }

  test("event_funnel stages are ordered and monotonically shrinking") {
    val got = CurationOps.queries("event_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("1_view", "2_click_after_view", "3_purchase_after_click"))
    assert(got("1_view") >= got("2_click_after_view"))
    assert(got("2_click_after_view") >= got("3_purchase_after_click"))
    assert(got("1_view") > 0)
  }

  test("itemCooccur: generous cap = exact pairs; tight cap truncates per user") {
    import spark.implicits._
    // user 1 touches items 1-5, user 2 items 1-3, user 3 items 1-2
    val ui = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L)).toDF("user_id", "item")
    def pairs(capN: Int) = CurationOps.itemCooccur(ui, capN, minUsers = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // cap above every user's item count == the honest all-pairs answer
    assert(pairs(100) == Map((1L, 2L) -> 3L, (1L, 3L) -> 2L, (2L, 3L) -> 2L))
    // cap 2: every user keeps {1,2} (count ties break by item asc), so
    // only that pair survives — bounded fanout, deterministic keep-set
    assert(pairs(2) == Map((1L, 2L) -> 3L))
  }

  test("observedHealth: metrics ride the main scan — no second pass") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val df = Seq(
      (1L, "some actual document text", "en"),
      (2L, "", "en"),
      (3L, "   ", null.asInstanceOf[String]),
      (4L, "more text here", "de")).toDF("doc_id", "text", "lang")
    val (observed, obs) = CurationOps.observedHealth(df)
    // the observed frame is the same rows (pass-through operator) ...
    assert(observed.count() == 4)
    // ... and after that ONE action the counters are available
    val m = obs.get
    assert(m("n_docs") == 4L)
    assert(m("n_empty_text") == 2L, s"blank + whitespace-only: $m")
    assert(m("n_null_lang") == 1L)
    assert(m("total_chars") == df.select(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"text"))).head.getLong(0))
    // single-pass claim, verified against the plan: CollectMetrics is
    // a pass-through node, no extra exchange or subtree duplication
    val plan = observed.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan)
    assert(!plan.contains("Exchange"),
      s"observe must not add a shuffle to a narrow pipeline:\n$plan")
  }

  test("observedHealthStream: per-batch counters surface in query progress") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = CurationOps.observedHealthStream(
        mem.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("noop").outputMode("append").start()
    try {
      mem.addData((1L, "text one", "en"), (2L, "", null.asInstanceOf[String]))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("corpus_health"))).lastOption
        .getOrElse(fail("no corpus_health metrics in any progress"))
      assert(m.getAs[Long]("n_docs") == 2L)
      assert(m.getAs[Long]("n_empty_text") == 1L)
      assert(m.getAs[Long]("n_null_lang") == 1L)
    } finally q.stop()
  }

  test("driftChi2: identical snapshots report zero drift; a planted " +
    "token flood dominates the statistic in exactly its bucket") {
    import spark.implicits._
    val balanced = (0L until 20L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val zero = graft.ops.QualityOps.driftChi2(balanced).collect()
    assert(zero.nonEmpty)
    zero.foreach(r => assert(r.getLong(4) == 0L,
      s"identical distributions must show zero drift: $r"))
    // flood the CURRENT split (odd ids) with a token absent from the
    // reference: expected=0 → the contribution lands in that bucket
    val drifted = (0L until 20L).map { i =>
      if (i % 2 == 1) (i, "alpha beta gamma flood flood flood flood")
      else (i, "alpha beta gamma")
    }.toDF("doc_id", "text")
    val rows = graft.ops.QualityOps.driftChi2(drifted)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val top = rows.maxBy(_._4)
    assert(top._2 == 0L && top._3 == 40L,
      s"the flooded bucket must be ref-absent with 40 current hits: $top")
    assert(rows.filter(_ != top).forall(r => r._4 < top._4),
      "the flooded bucket must dominate the drift statistic")
  }

  test("driftPsi: identical snapshots report zero PSI; every term is " +
    "non-negative; a share collapse screams where chi2 whispers") {
    import spark.implicits._
    val balanced = (0L until 20L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val zero = graft.ops.QualityOps.driftPsi(balanced).collect()
    assert(zero.nonEmpty)
    zero.foreach(r => assert(r.getLong(5) == 0L,
      s"identical shares must score zero PSI: $r"))
    // the flood shifts every bucket's SHARE (flood inflates t_cur),
    // so all terms are >= 0 and the flooded bucket dominates
    val drifted = (0L until 20L).map { i =>
      if (i % 2 == 1) (i, "alpha beta gamma flood flood flood flood")
      else (i, "alpha beta gamma")
    }.toDF("doc_id", "text")
    val rows = graft.ops.QualityOps.driftPsi(drifted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    rows.foreach(r => assert(r._4 >= 0L,
      s"PSI terms share a sign by construction: $r"))
    val top = rows.maxBy(_._4)
    assert(top._2 == 0L && top._3 == 40L,
      s"the ref-absent flooded bucket must dominate PSI: $top")
  }

  test("curatePipeline: exact dups collapse BEFORE span sharing is " +
    "derived, short docs drop at the gate, rollup is per-lang exact") {
    import spark.implicits._
    // 25-token body so spans exist (spanSize 20); doc 2 is an exact
    // dup of doc 1 (different case/whitespace — normalization must
    // catch it); doc 3 shares doc 1's 25-token body verbatim plus a
    // tail → span removal bites; doc 4 is short → gated out
    val body = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, body, "en"),
      (2L, "  " + body.toUpperCase + " ", "en"), // exact dup after norm
      (3L, body + " " + (1 to 12).map(i => s"t$i").mkString(" "), "de"),
      (4L, "tiny doc under gate", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = CurationOps.curatePipeline(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // dedup survivors: 1 (en), 3 (de), 4 (fr). Span starts (size 20,
    // stride 10): doc1 (25 toks) → {1}; doc3 (37 toks) → {1, 11}.
    // Shared: the [1..20] window (identical w1..w20 both docs). After
    // removal doc1 keeps 5 tokens (< 10 → gated), doc3 keeps 17
    // (kept), doc4 has 4 (< 10 → gated). Only de survives:
    // n_removed 20 of 37 → removed_ppm = 20e6 div 37 = 540540.
    assert(got.keySet == Set("de"), s"got $got")
    assert(got("de") == ((1L, 17L, 540540L)))
  }
}
