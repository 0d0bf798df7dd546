package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` must answer SQL that
  * uses the custom kernels with no Scala imports. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // extensions only apply at session CREATION — a session left over
    // from another suite in this JVM would shadow them
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("custom kernels are callable from pure SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT
        |  st_geodesic_distance(0D, 0D, 1D, 0D) AS lon_deg_m,
        |  st_azimuth(0D, 0D, 1D, 0D) AS az_east,
        |  bearing_diff(170D, -170D) AS wrap,
        |  vec_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS dot,
        |  sorted_inter_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS inter,
        |  size(shingle_hashes('a b c d')) AS n_shingles,
        |  size(minhash_sig('a b c d')) AS n_lanes,
        |  simhash60('hello world') AS sh,
        |  simhash60('') AS sh_empty,
        |  pq_encode(array(1.0F, 2.0F, 9.0F, 9.0F),
        |            array(array(1.0F, 2.0F), array(8.0F, 8.0F),
        |                  array(0.0F, 0.0F), array(9.0F, 9.0F)), 2, 2) AS pq_codes,
        |  pq_adc(array(1.0F, 2.0F, 9.0F, 9.0F), array(0, 1),
        |         array(array(1.0F, 2.0F), array(8.0F, 8.0F),
        |               array(0.0F, 0.0F), array(9.0F, 9.0F)), 2, 2) AS pq_dist,
        |  feature_counts('a b A', 4) AS fc,
        |  entropy_stats('x x y y') AS es,
        |  entropy_stats('') AS es_empty
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getAs[Double]("lon_deg_m") - 111319.4908) < 0.1)
    assert(math.abs(r.getAs[Double]("az_east") - 90.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("wrap") - 20.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("dot") - 32.0) < 1e-12)
    assert(r.getAs[Long]("inter") == 2L)
    assert(r.getAs[Int]("n_shingles") == 2)
    assert(r.getAs[Int]("n_lanes") == 4)
    assert(r.getAs[Long]("sh") > 0L) // 60-bit, non-negative
    assert(r.getAs[Long]("sh_empty") == 0L) // token-less doc contract
    // subspace 0 of (1,2) → codeword 0 (exact); subspace 1 of (9,9) →
    // codeword 1 = (9,9) (exact); adc vs codes (0,1) = 0
    assert(r.getSeq[Int](r.fieldIndex("pq_codes")) == Seq(0, 1))
    assert(r.getAs[Double]("pq_dist") == 0.0)
    // 'a' (x2 after lowercasing) and 'b' land in hashed buckets; bias=1
    val fc = r.getSeq[Long](r.fieldIndex("fc"))
    assert(fc.length == 5 && fc.last == 1L && fc.take(4).sum == 3L)
    // uniform 2 distinct tokens → H = log2(2) = 1000 milli-bits exactly
    assert(r.getSeq[Long](r.fieldIndex("es")) == Seq(4L, 2L, 1000L))
    assert(r.isNullAt(r.fieldIndex("es_empty"))) // token-less contract
  }

  test("a geodesic SQL query over a table plans and runs") {
    import spark.implicits._
    Seq((0.0, 0.0, 0.5, 0.5), (1.0, 1.0, 1.0, 2.0))
      .toDF("lon1", "lat1", "lon2", "lat2").createOrReplaceTempView("pts")
    val d = spark.sql(
      "SELECT sum(st_geodesic_distance(lon1, lat1, lon2, lat2)) AS total FROM pts")
      .collect()(0).getDouble(0)
    assert(d > 180000 && d < 200000) // ~78 km + ~110 km
  }
}
