package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale experiment for the training-data operator families (manual
  * main, like [[NgramProfile]]): the sf0.1 documents/embeddings tables
  * replicated in memory with offset ids (1x / 4x / 10x), each family
  * timed per scale. The point is the CURVE — an operator whose wall
  * time grows superlinearly here has a plan that dies at 100 TB.
  * Replication shifts the corpus's duplicate structure (every doc
  * gains k exact copies), which is a WORST case for dedup ops: output
  * pair counts grow ~k^2 within each copy-group while the candidate
  * joins must stay keyed, never all-pairs.
  */
object ScaleProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def docsX(k: Int): DataFrame = {
      val base = Tables.t(spark, d, "documents")
      (0 until k).map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
    }
    def embX(k: Int): DataFrame = {
      val base = Tables.t(spark, d, "embeddings")
      (0 until k).map(i => base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (k <- Seq(1, 4, 10)) {
      val docs = docsX(k)
      val emb = embX(k)
      time(s"${k}x dedup_exact")(
        docs.groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(count(lit(1)).as("n")).count())
      time(s"${k}x minhash_sig")(graft.ops.DedupOps.minhashSignatures(docs).count())
      time(s"${k}x lsh_pairs")(graft.ops.DedupOps.lshCandidatePairs(docs).count())
      time(s"${k}x ngram_jaccard")(graft.ops.DedupOps.ngramJaccardPairs(docs).count())
      time(s"${k}x simhash_pairs")(graft.ops.DedupOps.simhashPairs(docs).count())
      time(s"${k}x sim_topk")(graft.ops.SimilarityOps.bruteForceTopK(
        emb, col("vec_id") % 100 === 0, k = 10).count())
      time(s"${k}x ivf_topk")(graft.ops.SimilarityOps.ivfTopK(
        emb, col("vec_id") % 100 === 0,
        nCentroids = graft.ops.SimilarityOps.IvfCentroids,
        nProbe = graft.ops.SimilarityOps.IvfProbe).count())
      time(s"${k}x txt_quality")(graft.ops.TextOps.qualityScore(docs).count())
      // replication is the CC worst case: exact copies share every LSH
      // band key, so each copy-group becomes one dense component whose
      // edge count grows ~k^2 while vertices grow k
      time(s"${k}x dedup_cc")(graft.ops.GraphOps.connectedComponents(
        docs.select(col("doc_id").as("node")),
        graft.ops.DedupOps.lshCandidatePairs(docs).toDF("src", "dst")).count())
      time(s"${k}x txt_repetition")(
        graft.ops.CurationOps.repetitionStats(docs).count())
      // decontaminate: eval side stays FIXED as the corpus scales —
      // the broadcast probe must scale linearly in the train side
      time(s"${k}x decontaminate")(graft.ops.DedupOps.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        Tables.t(spark, d, "documents").filter(col("doc_id") % 50 === 0)).count())
      // global rank: range-shuffle + per-partition sort + zipWithIndex;
      // superlinear growth here would mean a hidden serialization point
      time(s"${k}x global_rank")(graft.ops.RankOps.globalRank(
        docs.select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars").desc, col("doc_id").asc)).count())
      time(s"${k}x tfidf")(graft.ops.TextOps.tfidfTopTerms(docs).count())
      time(s"${k}x quantize_int8")(graft.ops.SimilarityOps.quantizeInt8(emb).count())
      // item co-occurrence: replicas get DISJOINT item universes
      // (item + i*101), so items-per-user grows ~k× — the self-join
      // worst case. The top-20 cap must hold the curve flat; the
      // uncapped contrast (capN=1e6, measured to 4x only) shows the
      // ~k² pair blowup the cap prevents.
      def userItemX(kk: Int): DataFrame = {
        val base = Tables.t(spark, d, "events")
          .withColumn("item",
            get_json_object(col("props"), "$.k").cast("long"))
        (0 until kk).map(i =>
            base.withColumn("item", col("item") + lit(i * 101L)))
          .reduce(_ unionByName _)
          .select("user_id", "item")
      }
      time(s"${k}x item_cooccur_cap20")(
        graft.ops.CurationOps.itemCooccur(userItemX(k)).count())
      if (k <= 4)
        time(s"${k}x item_cooccur_uncapped")(
          graft.ops.CurationOps.itemCooccur(userItemX(k), capN = 1000000).count())
    }
    spark.stop()
  }
}
