package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.serving.IndexStore
import graft.streaming.StreamAttribution

/** The attribution index lifecycle completed (round 16): append +
  * compact join the round-15 write + mask, closing "all four families
  * carry the full lifecycle" without the mask-and-rebuild asterisk.
  * Pinned here:
  *   - append is directory-additive AND exact: band/shingle rows are
  *     per-doc derivable, so append ≡ rebuild row for row (no stale
  *     window — the one append in the ladder with nothing frozen)
  *   - compact-after-delete ≡ writeAttr(truth-minus-deleted) across
  *     BOTH tables, tombstones dropped physically
  *   - the compacted artifact serves the masked artifact's answers
  */
class AttrLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }

  private def fresh(name: String): String = {
    val dir = IndexStore.scratchDir(s"spec_attr_$name", name)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def bands(i: IndexStore.AttrIndex) =
    i.bands.select("t_id", "band", "key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def shingles(i: IndexStore.AttrIndex) =
    i.shingles.select(col("t_id"), array_join(col("t_shs"), ",")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("append is directory-additive and EXACT: base files untouched, " +
    "bands and shingles == a full rebuild's, the serve agrees") {
    val newPred = col("doc_id") % 10 === 7
    val dir = fresh("append")
    IndexStore.writeAttr(docs.filter(!newPred), dir)
    val baseFiles = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(dir), null, true)
      .toArray.map(_.toString).toSet
    IndexStore.appendAttr(docs.filter(newPred), dir)
    val afterFiles = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(dir), null, true)
      .toArray.map(_.toString).toSet
    assert(baseFiles.subsetOf(afterFiles),
      "an append never rewrites or removes an existing file")
    val got = IndexStore.loadAttr(spark, dir)
    val fullDir = fresh("append_full")
    IndexStore.writeAttr(docs, fullDir)
    val want = IndexStore.loadAttr(spark, fullDir)
    assert(bands(got) == bands(want), "bands == rebuild's, row for row")
    assert(shingles(got) == shingles(want), "shingles == rebuild's")
    val q = docs.filter(col("doc_id") % 50 === 0).limit(10)
    assert(StreamAttribution.serveTopK(q, got).collect().toSet ==
      StreamAttribution.serveTopK(q, want).collect().toSet,
      "append ≡ rebuild at serve time (nothing is stale in this family)")
  }

  test("bandKeysFromShingles == bandKeys over the originating text, " +
    "row for row (the r16 one-text-pass build optimization)") {
    val fromText = graft.ops.DedupOps.bandKeys(docs)
      .select("doc_id", "band", "key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(x => (x._1, x._2))
    val shs = docs.select(col("doc_id").as("t_id"),
      graft.ops.DedupOps.shingleHashes(col("text")).as("t_shs"))
    val fromHashes = graft.ops.DedupOps
      .bandKeysFromShingles(shs, "t_id", "t_shs")
      .select("doc_id", "band", "key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(x => (x._1, x._2))
    assert(fromText.toSeq == fromHashes.toSeq,
      "minhash lanes from the stored shingle-hash set are bit-identical")
  }

  test("compact-after-delete == writeAttr(truth-minus-deleted) across " +
    "both tables; tombstones dropped physically; serve unchanged") {
    val delPred = col("doc_id") % 25 === 3
    val dir = fresh("compact")
    IndexStore.writeAttr(docs, dir)
    IndexStore.deleteAttr(docs.filter(delPred).select("doc_id"), dir)
    val masked = IndexStore.loadAttr(spark, dir)
    val q = docs.filter(col("doc_id") % 50 === 0).limit(10)
    val servedMasked = StreamAttribution.serveTopK(q, masked).collect().toSet
    IndexStore.compactAttr(spark, dir)
    assert(!new java.io.File(
      IndexStore.tableDir(spark, dir, "tombstones")).exists(),
      "the compacted generation carries no tombstone table")
    val got = IndexStore.loadAttr(spark, dir)
    val wantDir = fresh("compact_want")
    IndexStore.writeAttr(docs.filter(!delPred), wantDir)
    val want = IndexStore.loadAttr(spark, wantDir)
    assert(bands(got) == bands(want))
    assert(shingles(got) == shingles(want))
    assert(StreamAttribution.serveTopK(q, got).collect().toSet
      == servedMasked, "mask ≡ physical drop at serve time")
  }
}
