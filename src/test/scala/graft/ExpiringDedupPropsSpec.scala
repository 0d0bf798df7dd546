package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamLshDedup

/** Property check for the sessionized-ownership windowing behind
  * `dedup_stream_keep_recent`: on randomized feeds (duplicate-heavy
  * small vocabulary, shuffled event times, ties included) the Spark
  * window pipeline in [[StreamLshDedup.batchEquivalentExpiring]] must
  * agree with a direct in-memory fold of the same definition —
  * sessionize each bucket's touches by gap > retention, first toucher
  * owns, keep iff owning every bucket. The fold consumes the SAME
  * (band, key) rows the pipeline derives, so this isolates the
  * window/sessionization logic (lag → gap flag → running sum →
  * first-per-session) from the minhash derivation, which has its own
  * kernel + oracle coverage. */
class ExpiringDedupPropsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Plain-Scala reference: same inputs, zero Spark. */
  private def referenceKeep(
      bands: Seq[(Long, Long, Int, String)], // (doc_id, ts_us, band, key)
      retentionUs: Long): Set[Long] = {
    val collided = scala.collection.mutable.Set[Long]()
    bands.groupBy(r => (r._3, r._4)).values.foreach { touches =>
      var owner = -1L
      var lastTs = Long.MinValue
      touches.sortBy(r => (r._2, r._1)).foreach { case (doc, ts, _, _) =>
        if (lastTs == Long.MinValue || ts - lastTs > retentionUs) owner = doc
        if (doc != owner) collided += doc
        lastTs = ts
      }
    }
    bands.map(_._1).toSet -- collided
  }

  test("batchEquivalentExpiring ≡ in-memory sessionized-ownership fold (randomized)") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(42)
    // duplicate-heavy vocabulary: ~8 base texts over 40-80 docs per
    // case guarantees bucket collisions and multi-session buckets
    val baseTexts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "completely different text about spark query engines at scale",
      "yet another unrelated document mentioning parquet and shuffles",
      "duplicate payload arriving in two different micro batches here",
      "a fifth base text with enough tokens to shingle properly now",
      "sixth distinct sentence used to diversify the bucket space ok",
      "seventh base document text that fills one more lsh bucket pair",
      "eighth and final base string for the randomized corpus builder")
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(41)
      val retentionUs = (1 + rnd.nextInt(50)).toLong * 1000000L
      val docs = (1L to n).map { id =>
        // ts decoupled from doc_id (shuffled order) with frequent ties
        val tsUs = rnd.nextInt(120).toLong * 1000000L
        (id, baseTexts(rnd.nextInt(baseTexts.length)), tsUs)
      }
      val df = docs.toDF("doc_id", "text", "ts_us")
      val got = StreamLshDedup.batchEquivalentExpiring(df, retentionUs = retentionUs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bandRows = graft.ops.DedupOps
        .bandKeys(df, passthrough = Seq("ts_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
        .toSeq
      val want = referenceKeep(bandRows, retentionUs)
      assert(got == want,
        s"trial $trial (n=$n retention=${retentionUs / 1000000} s): " +
          s"spark=${got.toSeq.sorted.take(20)}... reference=${want.toSeq.sorted.take(20)}... " +
          s"sparkOnly=${(got -- want).toSeq.sorted} refOnly=${(want -- got).toSeq.sorted}")
    }
  }
}
