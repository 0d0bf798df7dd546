package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{SimilarityOps, TextOps}

/** Round-11 additions: the serving-index build capstone
  * (`serve_index_build`), topic-balanced cluster capping
  * (`mix_cluster_cap`), and the per-language tokenizer fertility audit
  * (`txt_fertility`). */
class IndexBuildSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb(n: Int, d: Int = 8) = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = (0 until d).map(j =>
        (math.sin(i * 12.9898 + j * 78.233) * 0.5).toFloat)
      (i.toLong, v, (i % 3).toLong)
    }.toDF("vec_id", "embedding", "label")
  }

  test("indexBuild: manifest partitions the corpus exactly once") {
    spark.sparkContext.setLogLevel("WARN")
    val e = emb(400)
    val m = SimilarityOps.indexBuild(e).collect()
    // every defined-norm vector lands in exactly one cell
    assert(m.map(_.getLong(1)).sum == 400L)
    // cell ids come from the first-K centroid sample
    assert(m.forall(r => r.getLong(0) < SimilarityOps.autoCentroids(400)))
    // id spans are consistent and the code mass is positive for
    // non-degenerate vectors
    m.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // min_vec_id <= max_vec_id
      assert(r.getLong(5) > 0L) // sum_code_l1
    }
    // manifest agrees with an independent per-vector recompute of the
    // assignment arm joined to the quantizer arm
    val q = SimilarityOps.quantizeInt8(e)
      .agg(sum("amax_u"), sum("code_l1")).collect()(0)
    assert(m.map(_.getLong(4)).sum == q.getLong(0))
    assert(m.map(_.getLong(5)).sum == q.getLong(1))
  }

  test("indexBuild: zero/NaN-norm vectors are excluded from every cell") {
    import spark.implicits._
    val bad = Seq(
      (1000L, Seq.fill(8)(0.0f), 0L), // zero norm
      (1001L, Seq(Float.NaN) ++ Seq.fill(7)(0.1f), 0L)) // NaN norm
      .toDF("vec_id", "embedding", "label")
    val m = SimilarityOps.indexBuild(emb(100).unionByName(bad)).collect()
    assert(m.map(_.getLong(1)).sum == 100L)
    assert(m.forall(_.getLong(3) < 1000L)) // max_vec_id below the bad ids
  }

  test("clusterCap: per-cell cap holds, ranks dense, fate deterministic") {
    val e = emb(500)
    val out = SimilarityOps.clusterCap(e, cap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 500)
    // kept <=> cell_rank <= cap; per-cell ranks are dense from 1
    assert(out.forall { case (_, _, rk, kept) => kept == (rk <= 4L) })
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
      assert(rows.count(_._4) == math.min(4, rows.length))
    }
    // determinism: same input, same fates (partitioning-independent)
    val again = SimilarityOps.clusterCap(e.repartition(3), cap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("clusterCap caps the planted hot topic while sparing cold cells") {
    import spark.implicits._
    // 60 near-identical vectors (one semantic mode) + 40 spread ones;
    // the hot mode lands in one cell and must lose rows to the cap
    val hot = (0 until 60).map { i =>
      (i.toLong, Seq(1.0f, 0.01f * (i % 3), 0f, 0f, 0f, 0f, 0f, 0f), 0L)
    }
    val cold = (60 until 100).map { i =>
      val v = (0 until 8).map(j =>
        (math.sin(i * 7.77 + j * 3.33)).toFloat)
      (i.toLong, v, 1L)
    }
    val df = (hot ++ cold).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.clusterCap(df, cap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val hotKept = out.filter(_._1 < 60).count(_._3)
    assert(hotKept <= 4 * out.filter(_._1 < 60).map(_._2).distinct.length)
    assert(hotKept < 60, "the hot mode must actually be capped")
  }

  test("indexAppend: delta manifest counts the split exactly; drift signal moves") {
    import spark.implicits._
    val e = emb(400)
    val m = SimilarityOps.indexAppend(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // split is exact: 400 vectors, vec_id % 8 == 7 -> 50 new, 350 base
    assert(m.map(_._2).sum == 350L)
    assert(m.map(_._3).sum == 50L)
    // centroids froze on the base: every cell id is a base vector id
    assert(m.forall { case (cid, _, _, _) => cid % 8 != 7 })
    // drift alarm: an ingest batch pointing AWAY from every base
    // vector scores lower assignment mass per vector than an in-
    // distribution batch
    val drifted = e.filter(col("vec_id") % 8 =!= 7).unionByName(
      (0 until 50).map { i =>
        val id = i * 8L + 7L
        // constant direction orthogonal-ish to the sin soup
        (id, Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f), 0L)
      }.toDF("vec_id", "embedding", "label"))
    val dm = SimilarityOps.indexAppend(drifted).collect()
    def meanSim(rows: Array[(Long, Long, Long, Long)]) =
      rows.map(_._4).sum.toDouble / math.max(rows.map(_._3).sum, 1L)
    val inDist = meanSim(m)
    val offDist = dm.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3)))
    info(f"mean new-assignment micro-cos: in-dist $inDist%.0f, " +
      f"drifted ${meanSim(offDist)}%.0f")
    assert(meanSim(offDist) < inDist,
      "drifted ingest must score lower assignment mass")
  }

  test("semDedupRecall: exact copies audit at recall 1.0 in the hi band") {
    import spark.implicits._
    // 10 exact-duplicate pairs planted among spread vectors: identical
    // embeddings get identical assignments, so cell-scoping can NEVER
    // split them — hi band must audit 1.0 while lo-band boundary pairs
    // may be partial (the honest number). Spread vectors are md5-
    // derived (verified max pairwise cos 0.966 < 0.98 — a single-phase
    // sin construction aliases into thousands of accidental near-dups)
    def h8(i: Int, j: Int): Float = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex, 16) % 2000) / 1000.0f) - 1.0f
    }
    val spread = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(j => h8(i, j)), 0L)
    }
    val dups = (0 until 10).flatMap { k =>
      val v = (0 until 8).map(j => h8(9000 + k, j))
      Seq((1000L + 2 * k, v, 1L), (1001L + 2 * k, v, 1L))
    }
    val df = (spread ++ dups).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.semDedupRecall(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (nExact, nFound, ppm) = out("hi")
    assert(nExact == 10L, s"expected exactly the planted duplicate pairs: $nExact")
    assert(nFound == nExact && ppm == 1000000L,
      s"identical vectors must always share a cell: $nFound/$nExact")
  }

  test("gopherGate: each rule fails exactly the planted violator") {
    import spark.implicits._
    val docs = Seq(
      // passes all four rules
      (1L, "a", "the quick brown foxes jumped over the lazy sleeping dogs"),
      // too short (r_words)
      (2L, "b", "the tiny doc"),
      // mean word length > 10 (r_wlen) — but long enough and stopworded
      (3L, "c", "the extraordinarily incomprehensible characteristics "
        + "neuroplasticity internationalization"),
      // no stopwords (r_stop)
      (4L, "d", "quick brown foxes jumped over lazy sleeping dogs"),
      // > 10% punctuation (r_punct)
      (5L, "e", "the dots... what, dots?! ?!?!;; the dots!!!"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.gopherGate(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(2) == 1L) // n_pass
    assert(out("b").getLong(3) == 1L) // n_fail_words
    assert(out("c").getLong(4) == 1L) // n_fail_wlen
    assert(out("d").getLong(5) == 1L) // n_fail_stop
    assert(out("e").getLong(6) == 1L) // n_fail_punct
    // and each planted violator fails ONLY its own rule (pass count 0,
    // the other reason columns 0)
    Seq("b", "c", "d", "e").foreach { s =>
      assert(out(s).getLong(2) == 0L, s"source $s must not pass")
      val fails = (3 to 6).map(out(s).getLong(_)).sum
      assert(fails == 1L, s"source $s should fail exactly one rule: $fails")
    }
  }

  test("bpeFertility: hand-computable per-language ratios") {
    import spark.implicits._
    // 'zz' is not in the BPE merge vocab -> every char is a token
    // (fertility 4x); 'the' merges exist -> 1 token per word
    val docs = Seq(
      (1L, "en", "the the"),
      (2L, "zz", "zzzz zzzz")).toDF("doc_id", "lang", "text")
    val out = TextOps.bpeFertility(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(2) == 2L) // n_words
    assert(en.getLong(5) == (en.getLong(3) * 1000000L) / 2L) // fertility
    val zz = out("zz")
    assert(zz.getLong(2) == 2L)
    assert(zz.getLong(3) == 8L, "unmerged chars: 4 tokens per word")
    assert(zz.getLong(5) == 4000000L) // 4 tokens per word exactly
    // bytes: "zzzz zzzz" = 9 UTF-8 bytes over 8 tokens
    assert(zz.getLong(4) == 9L)
    assert(zz.getLong(6) == 9000000L / 8L)
  }
}
