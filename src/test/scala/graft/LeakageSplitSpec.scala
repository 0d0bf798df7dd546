package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DedupOps, GraphOps, TextOps}

/** Leakage-safe splitting (`leakageSafeSplit`): no near-dup pair may
  * straddle a train/valid/test boundary. Pins the universal property
  * on the real corpus (every LSH-CC component maps to exactly one
  * split), demonstrates the defect it fixes with a PLANTED duplicate
  * whose per-doc hash split (`split_train_test` arithmetic) separates
  * the pair, and checks the marginal rates stay near 80/10/10. */
class LeakageSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, "/root/testdata/sf0.01", "documents").cache()
  }

  private def docSplit(idCol: org.apache.spark.sql.Column) = {
    val h = TextOps.strHash(concat(lit("split:"), idCol.cast("string")))
    when(h % 100 < 80, "train").when(h % 100 < 90, "valid").otherwise("test")
  }

  test("every LSH-CC component lands in exactly one split; splits cover all docs") {
    val out = GraphOps.leakageSafeSplit(docs).cache()
    assert(out.count() == docs.count())
    assert(out.groupBy("comp").agg(countDistinct("split").as("k"))
      .filter(col("k") =!= 1).isEmpty)
    // non-vacuous: the corpus has multi-doc components to protect
    val multi = out.groupBy("comp").count().filter(col("count") > 1).count()
    info(s"multi-doc components on the sf0.01 corpus: $multi")
    assert(multi > 0)
  }

  test("a planted duplicate the per-doc hash split separates stays together here") {
    import spark.implicits._
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val donor = docs.orderBy("doc_id").select("doc_id", "text")
      .as[(Long, String)].head()
    val donorSplit = spark.range(1).select(docSplit(lit(donor._1)))
      .first().getString(0)
    // find a clone id whose PER-DOC split differs from the donor's —
    // the md5 arithmetic is deterministic, so scan a few candidates
    val cloneId = (maxId + 1 to maxId + 64).find { id =>
      spark.range(1).select(docSplit(lit(id))).first().getString(0) != donorSplit
    }.get
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq((cloneId, donor._2)).toDF("doc_id", "text"))
    // the clone is an exact duplicate ⇒ identical minhash band keys ⇒
    // the pair is an LSH candidate edge by construction
    val pairs = DedupOps.lshCandidatePairs(planted)
      .filter(col("d1") === donor._1 && col("d2") === cloneId)
    assert(!pairs.isEmpty)
    val out = GraphOps.leakageSafeSplit(planted)
      .filter(col("doc_id").isin(donor._1, cloneId))
      .select("split").distinct().collect().map(_.getString(0))
    // the per-doc arithmetic WOULD separate them (that's how cloneId
    // was chosen); the component split keeps them together
    assert(out.length == 1,
      s"near-dup pair split across ${out.mkString(",")}")
  }

  test("capstone manifest: exactly the train-split keepers, bijectively sharded") {
    val split = GraphOps.leakageSafeSplit(docs).cache()
    val expectIds = split
      .filter(col("doc_id") === col("comp") && col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = graft.SparkEntry.queries("curate_export_manifest")(
      spark, "/root/testdata/sf0.01").cache()
    val gotIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expectIds)
    // permutation stays bijective over the survivor subset
    assert(out.select("perm").distinct().count() == gotIds.size)
    // positions dense per shard
    assert(out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("hi"), countDistinct("pos").as("nd"))
      .filter(col("hi") =!= col("n") || col("nd") =!= col("n")).isEmpty)
    // comp_size metadata: totals add back to the full corpus count
    // when summed over ALL keepers (not just train) — check the train
    // subset is consistent with the split frame
    val sizes = split.groupBy("comp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("doc_id", "comp_size").collect()
      .foreach(r => assert(r.getLong(1) == sizes(r.getLong(0))))
  }

  test("marginal rates stay near 80/10/10 (components are mostly singletons)") {
    val n = docs.count().toDouble
    val byS = GraphOps.leakageSafeSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"split counts: $byS")
    assert(byS("train") / n > 0.70 && byS("train") / n < 0.90)
    assert(byS.getOrElse("valid", 0L) / n < 0.20)
    assert(byS.getOrElse("test", 0L) / n < 0.20)
  }
}
