package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{RankOps, TableOps, TextOps, DedupOps}

/** Unit oracles for the round-4 operators: global rank (vs the
  * single-partition window it replaces), SCD2 interval construction,
  * decontamination hit semantics, and TF-IDF top-k tie-breaking.
  */
class RankTableTextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("globalRank equals window row_number across many partitions") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // values with heavy ties so the tie-breaker is load-bearing
    val df = (1L to 5000L).map(i => (i, i % 97)).toDF("id", "v")
    val got = RankOps.globalRank(df,
        Seq(col("v").desc, col("id").asc), numPartitions = 8)
      .select("id", "global_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("global_rank",
        row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select("id", "global_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // contiguity: ranks are exactly 1..n
    assert(got.values.toSeq.sorted == (1L to 5000L))
  }

  test("globalRank partition count is respected (no single-task funnel)") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val ranked = RankOps.globalRank(df, Seq(col("id").asc), numPartitions = 8)
    assert(ranked.rdd.getNumPartitions == 8)
  }

  test("scd2 collapses runs into [from, to) intervals with NULL-open tail") {
    import spark.implicits._
    // user 1: A@10 A@20 B@30 A@40 — three runs; user 2: single run
    val obs = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L), (2L, "X", 5L, 5L)
    ).toDF("user_id", "event_type", "us", "event_id")
    val got = TableOps.scd2(obs, "user_id", "event_type", "us", "event_id")
      .select("user_id", "run_id", "event_type", "valid_from", "valid_to", "n_obs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      (1L, 1L, "A", 10L, 30L, 2L),
      (1L, 2L, "B", 30L, 40L, 1L),
      (1L, 3L, "A", 40L, -1L, 1L),
      (2L, 1L, "X", 5L, -1L, 1L)))
  }

  test("scd2 same-timestamp boundary: tie-breaker splits runs deterministically") {
    import spark.implicits._
    // two events at us=10 with different types: event_id orders them,
    // producing two runs whose valid_from collide at 10
    val obs = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 10L, 2L), (1L, "B", 20L, 3L)
    ).toDF("user_id", "event_type", "us", "event_id")
    val got = TableOps.scd2(obs, "user_id", "event_type", "us", "event_id")
      .select("run_id", "event_type", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set((1L, "A", 10L, 10L), (2L, "B", 10L, -1L)))
  }

  test("decontaminate flags exactly the docs sharing a shingle with eval") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps high"),   // shares "the quick brown"
      (2L, "completely different words entirely here now"),
      (3L, "tiny")                               // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val got = DedupOps.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // eval has shingles {the quick brown, quick brown fox}; doc 1
    // contains both, docs 2 and 3 contain neither
    assert(got(1L) == (2L, true))
    assert(got(2L) == (0L, false))
    assert(got(3L) == (0L, false))
  }

  test("incrementalAgg merged state equals full recompute on any split") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (s"k${i % 7}", i % 3, i * 10))
      .toDF("k1", "k2", "v")
    val full = rows.groupBy("k1", "k2")
      .agg(count(lit(1)).as("n"), sum("v").as("v"))
      .collect().map(r => (r.getString(0), r.get(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (cut <- Seq(0L, 150L, 300L)) { // empty-prev, mid, empty-delta
      val prev = rows.filter(col("v") <= cut * 10).groupBy("k1", "k2")
        .agg(count(lit(1)).as("n"), sum("v").as("v"))
      val delta = rows.filter(col("v") > cut * 10)
      val got = TableOps.incrementalAgg(prev, delta,
          keys = Seq("k1", "k2"), cntCol = "n", sumCols = Seq("v"))
        .collect().map(r => (r.getString(0), r.get(1).toString) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got == full, s"cut=$cut")
    }
  }

  test("quantizeInt8: codes bounded to [-127,127], zero vector → zero codes") {
    import spark.implicits._
    import graft.ops.SimilarityOps
    val embs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),   // amax 2 → codes 64, -127, 32
      (2L, Array(0.0f, 0.0f, 0.0f))     // zero vector
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(embs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // round(1/2*127)=round(63.5)=64 (half away from zero), round(-2/2*127)=-127,
    // round(0.5/2*127)=round(31.75)=32
    assert(got(1L) == (2000000L, -31L, -127L, 64L, 223L))
    assert(got(2L) == (0L, 0L, 0L, 0L, 0L))
  }

  test("mortonCode interleaves bits; zorderBy tiles both dimensions") {
    import spark.implicits._
    import graft.ops.LayoutOps
    // known interleavings: (1,0)->1, (0,1)->2, (1,1)->3, (3,5)->39
    val known = Seq((1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L)).toDF("x", "y")
      .select(LayoutOps.mortonCode(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(known == Seq(1L, 2L, 3L, 39L))
    // a 64x64 grid z-ordered into 16 partitions: every partition's
    // bounding box must be a small tile on BOTH axes (the data-skipping
    // property), unlike an x-sorted layout where y spans the full range
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val parts = LayoutOps.zorderBy(grid, col("x"), col("y"), numPartitions = 16)
      .select(spark_partition_id().as("pid"), col("x"), col("y"))
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .collect()
    assert(parts.length == 16)
    // each of the 16 tiles of a 64x64 z-curve spans at most half the
    // domain on either axis (perfect tiling gives 16x16 tiles; range
    // boundaries may straddle one tile edge)
    parts.foreach { r =>
      assert(r.getLong(1) <= 32 && r.getLong(2) <= 32,
        s"partition ${r.getInt(0)} bbox ${r.getLong(1)}x${r.getLong(2)} too wide")
    }
  }

  test("tfidf ranks rarity over raw frequency and breaks ties on token") {
    import spark.implicits._
    // "common" appears in all docs (df=3), "rare" only in doc 1 (df=1):
    // rare outranks common in doc 1 despite equal tf
    val docs = Seq(
      (1L, "common rare common rare zeta"),
      (2L, "common filler tokens here"),
      (3L, "common other words again")
    ).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, k = 2, minTokenLen = 3)
      .filter(col("doc_id") === 1L).orderBy("rk")
      .select("tok", "score_ppm", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // doc 1: tf(rare)=2 df=1 → 2*3*1e6/1 = 6e6; tf(zeta)=1 df=1 → 3e6;
    // tf(common)=2 df=3 → 2e6
    assert(got.toSeq == Seq(("rare", 6000000L, 1L), ("zeta", 3000000L, 2L)))
  }

  test("mode ties exist in the data, so agg_listagg_mode's window tie-break is load-bearing") {
    // at sf0.001, status P has a genuine count tie (2-HIGH and
    // 4-NOT SPECIFIED both 111) — a bare mode() in the driver query
    // WOULD flake cross-engine, which is why agg_listagg_mode breaks
    // ties explicitly (ORDER BY n DESC, priority ASC). This pins (a)
    // the builtin mode() still honors its contract — it returns one of
    // the max-count values per group — and (b) the window tie-break is
    // the deterministic min-priority among max-count rows.
    spark.sparkContext.setLogLevel("WARN")
    val orders = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val counts = orders.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val maxCountPris: Map[String, Set[String]] = counts.groupBy(_._1).map {
      case (st, rows) =>
        val mx = rows.map(_._3).max
        st -> rows.filter(_._3 == mx).map(_._2).toSet
    }
    val builtinMode = orders.groupBy("o_orderstatus")
      .agg(mode(col("o_orderpriority")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    builtinMode.foreach { case (st, m) =>
      assert(maxCountPris(st).contains(m),
        s"mode() returned non-max value $m for $st (max set ${maxCountPris(st)})")
    }
    // the explicit tie-break in the driver query resolves to min priority
    val got = SparkEntry.queries("agg_listagg_mode")(spark, "/root/testdata/sf0.001")
      .select("o_orderstatus", "mode_pri")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    maxCountPris.foreach { case (st, pris) =>
      assert(got(st) == pris.min, s"$st: expected ${pris.min}, got ${got(st)}")
    }
  }

  test("pocket perceptron: separable corpus reaches 100% accuracy; " +
    "rerun is bit-identical; pocket beats the final oscillating weights") {
    import spark.implicits._
    // separable: the labeling rule (spark > hash) is realized by
    // disjoint keyword docs plus shared filler tokens
    val docs = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, s"spark run fast table value row line agg v$i")
      else (i, s"hash run fast table value row line agg v$i")
    }.toDF("doc_id", "text")
    def score() = graft.ops.TextOps.perceptronScore(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = score()
    assert(got.size == 20)
    assert(got.values.forall(_._4 == 1L),
      s"separable data must classify perfectly: $got")
    // labels follow the rule: even docs contain 'spark' → +1
    (0L until 20L).foreach { i =>
      assert(got(i)._1 == (if (i % 2 == 0) 1L else -1L))
    }
    assert(score() == got, "integer training must be bit-deterministic")
    val w = graft.ops.TextOps.perceptronTrain(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == graft.ops.TextOps.PercF + 1)
    // a non-trivial model was selected, not the zero pocket
    assert(w.values.exists(_ != 0L))
  }

  test("perceptronPr: curve invariants — cum counts monotone along " +
    "descending margin, final recall 100%, perfect separation at the top") {
    import spark.implicits._
    val docs = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, s"spark run fast table value row line agg v$i")
      else (i, s"hash run fast table value row line agg v$i")
    }.toDF("doc_id", "text")
    val rows = graft.ops.TextOps.perceptronPr(docs)
      .orderBy(col("margin").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // cum_n strictly increasing, cum_pos non-decreasing
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 > a._2 && b._3 >= a._3, s"monotonicity: $a -> $b")
      case _ =>
    }
    // the corpus is separable (spec above): every positive margin row
    // is pure positives → precision 1e6 down to the last positive cut
    val lastPosRow = rows.filter(_._1 > 0).last
    assert(lastPosRow._4 == 1000000L, s"separable → perfect precision: $lastPosRow")
    assert(lastPosRow._5 == 1000000L, s"all positives above 0 margin: $lastPosRow")
    // final point includes everything: recall 100%, precision = base rate
    val last = rows.last
    assert(last._2 == 20L && last._5 == 1000000L)
    assert(last._4 == (last._3 * 1000000L) / last._2)
  }

  test("perceptronApply scores a STREAM with batch-identical results — " +
    "train offline, score at ingest") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, s"spark run fast table value row line agg v$i")
      else (i, s"hash run fast table value row line agg v$i")
    }
    val trainDf = docs.toDF("doc_id", "text")
    val w = graft.ops.TextOps.weightsFromTable(
      graft.ops.TextOps.perceptronTrain(trainDf))
    val batch = graft.ops.TextOps.perceptronApply(trainDf, w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mem = MemoryStream[(Long, String)]
    val q = graft.ops.TextOps.perceptronApply(
        mem.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("perc_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(7): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(7): _*)
      q.processAllAvailable()
      val streamed = spark.table("perc_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch,
        "streaming scorer must agree with the batch scorer row-for-row")
    } finally q.stop()
  }
}
