package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, DedupOps}

/** Winnowing fingerprints (substring-level near-dup) and deterministic
  * mixture up-sampling. The driver gate additionally cross-checks both
  * against DuckDB at sf0.01 (`dedup_winnow_pairs`, `mix_upsample`). */
class WinnowMixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fpSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("winnowing guarantee: a shared substring of length >= k+w-1 yields a shared fingerprint") {
    import spark.implicits._
    val k = DedupOps.WinnowK; val w = DedupOps.WinnowW
    // the planted common block is exactly k+w-1 = 23 chars; prefix/suffix differ
    val block = "the quick brown fox jum" // 23 chars
    assert(block.length == k + w - 1)
    val docs = Seq(
      (1L, s"AAAA unrelated prefix one $block and a different tail xx"),
      (2L, s"zz 9417 other start text $block closing words entirely"),
      (3L, "completely different content with zero overlap at all qq"))
      .toDF("doc_id", "text")
    val fps = fpSet(DedupOps.winnowFingerprints(docs))
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "docs sharing a full window must share the window-min fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty &&
      (fps(2L) intersect fps(3L)).isEmpty,
      "no shared k-gram => no shared fingerprint")
  }

  test("fingerprint density: at most one per window start, at least one per w windows") {
    import spark.implicits._
    val k = DedupOps.WinnowK; val w = DedupOps.WinnowW
    // aperiodic text (every 4-char block distinct), so every k-gram is
    // unique and the density floor applies to VALUES, not just positions
    val text = (1000 to 1074).map(_.toString).mkString // 300 chars
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val n = fpSet(DedupOps.winnowFingerprints(docs))(1L).size
    val nWindows = text.length - (k - 1) - (w - 1)
    // a selected value covers at most w consecutive windows
    assert(n >= nWindows / w, s"density floor: $n < ${nWindows / w}")
    assert(n <= nWindows, s"density ceiling: $n > $nWindows")
  }

  test("short docs (< k+w-1 chars) yield no fingerprints and no failures") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, "a" * 22), (3L, "b" * 23))
      .toDF("doc_id", "text")
    val fps = fpSet(DedupOps.winnowFingerprints(docs))
    assert(!fps.contains(1L) && !fps.contains(2L))
    assert(fps(3L).size == 1) // identical grams -> one distinct fingerprint
  }

  test("winnowPairs finds the planted near-dup and orders d1 < d2") {
    import spark.implicits._
    val base = "shared sentence number %d with plenty of characters to fingerprint"
    val longDoc = (1 to 8).map(base.format(_)).mkString(" ")
    val nearDup = longDoc.replace("number 3", "number 99") // one small edit
    val docs = Seq(
      (10L, longDoc), (20L, nearDup),
      (30L, "this text shares nothing with the pair above, totally disjoint words"))
      .toDF("doc_id", "text")
    val rows = DedupOps.winnowPairs(docs, dfCap = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 20L)
    assert(r.getDouble(3) > 0.6, s"overlap ${r.getDouble(3)} too low for a 1-edit dup")
  }

  test("native kernel is bit-identical to the HOF formulation (incl. multi-byte text)") {
    import spark.implicits._
    val k = DedupOps.WinnowK; val w = DedupOps.WinnowW
    val docs = Seq(
      (1L, "The Quick Brown Fox Jumps Over The Lazy Dog Repeatedly"),
      (2L, "数据 批处理 窗口 聚合 连接 的 大规模 训练 管道 操作 符号 序列"),
      (3L, "mixed ascii 与 中文 text in one document body here"),
      (4L, (1000 to 1060).map(_.toString).mkString))
      .toDF("doc_id", "text")
    val hof = docs
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"), lower(col("text")).as("_t"))
      .select(col("doc_id"), expr(
        s"transform(sequence(1, length(_t) - ${k - 1}), i -> " +
          s"cast(conv(substring(md5(substring(_t, i, $k)), 1, 15), 16, 10) AS bigint))").as("_hs"))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(_hs) - ${w - 1}), i -> " +
          s"array_min(slice(_hs, i, $w))))")).as("fp"))
    assert(fpSet(DedupOps.winnowFingerprints(docs)) == fpSet(hof))
  }

  test("winnowing is partitioning-invariant (fingerprints are a pure row function)") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, s"document body $i " + ("lorem ipsum dolor sit amet " * 4) + i))
      .toDF("doc_id", "text")
    val a = fpSet(DedupOps.winnowFingerprints(docs.repartition(1)))
    val b = fpSet(DedupOps.winnowFingerprints(docs.repartition(13)))
    assert(a == b)
  }

  test("mixUpsample: every doc appears floor(rate) or ceil(rate) times, copies contiguous") {
    import spark.implicits._
    val docs = (1L to 600L).map(i =>
      (i, Seq("en", "zh", "de", "fr", "es")((i % 5).toInt), s"text $i"))
      .toDF("doc_id", "lang", "text")
    val out = CurationOps.mixUpsample(docs).cache()
    val rates = CurationOps.MixRates.toMap
    val perDoc = out.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"), max("copy").as("maxc"), min("copy").as("minc"))
      .collect()
    perDoc.foreach { r =>
      val rate = rates(r.getString(1))
      val n = r.getLong(2)
      assert(n == math.floor(rate).toLong || n == math.ceil(rate).toLong,
        s"doc ${r.getLong(0)} lang ${r.getString(1)}: $n copies for rate $rate")
      assert(r.getLong(4) == 1L && r.getLong(3) == n, "copy indices must be 1..n")
    }
    // realized mixture converges to the target rate per language
    val realized = out.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (lang, rate) =>
      val nDocs = 120.0 // 600 docs / 5 langs
      val got = realized.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - nDocs * rate) <= nDocs * 0.15,
        s"$lang: realized $got vs target ${nDocs * rate}")
    }
    out.unpersist()
  }

  test("mixUpsample is deterministic and partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "es" else "en", "t"))
      .toDF("doc_id", "lang", "text")
    def runSet(p: Int) = CurationOps.mixUpsample(docs.repartition(p))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(runSet(1) == runSet(7))
    // down-sampled stratum: a doc either survives with ONE copy or is gone
    val es = CurationOps.mixUpsample(docs).filter(col("lang") === "es")
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(es.forall(_ == 1L))
  }
}
