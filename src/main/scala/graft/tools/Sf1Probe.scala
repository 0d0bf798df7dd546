package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 headroom probe (manual main): materializes a 10× replica of the
  * sf0.1 tables on disk (key-offset replication — each replica gets
  * disjoint key ranges so per-replica join cardinalities are preserved
  * and totals scale ~10×), then times the committed-plan top-10
  * ([[PlanDump.Audited]]) at both scales and writes `BENCH_SF1.json`
  * with the per-query scaling slope t(sf1)/t(sf0.1).
  *
  * Interpretation: ~10 = linear in data volume (the plan would survive
  * a 100× scale-up, modulo memory); <10 = fixed overhead amortizing
  * out; >10 needs a NAMED cause. Two known causes are designed in:
  * replicated documents are k× EXACT duplicates, so dedup pair/edge
  * structures grow ~k² inside copy-groups (the ScaleProfile worst
  * case); and rec_cte_tree's replicas deepen no tree but add frontier
  * rows per BFS round, so per-round fixed costs multiply.
  *
  * Usage: runMain graft.tools.Sf1Probe [gen|bench|all]  (default all)
  */
object Sf1Probe {

  val Src = "/root/testdata/sf0.1"
  val Dst = "/tmp/graft_sf1"
  val K = 10
  val Off = 100000000L // per-replica key offset, >> any sf0.1 key

  /** key columns to shift per replica; dims (nation/region) copy 1×,
    * nationkey FKs stay — every replica shares the fixed dims */
  val KeyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def gen(spark: SparkSession): Unit = {
    Seq("nation", "region").foreach { name =>
      graft.Tables.t(spark, Src, name).write.mode("overwrite")
        .parquet(s"$Dst/$name.parquet")
    }
    KeyCols.foreach { case (name, keys) =>
      // Tables.t normalizes the events TIMESTAMP(NANOS) column to
      // micros on read; the replica is written with the normalized
      // schema, which Tables.events' pass-through branch reads back
      val base = graft.Tables.t(spark, Src, name)
      val replicas = (0 until K).map { i =>
        keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * Off)))
      }
      replicas.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$Dst/$name.parquet")
      println(s"[sf1gen] $name x$K written")
    }
  }

  def bench(spark: SparkSession): Unit = {
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // codegen/shuffle warmup, same as Bench
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    // pipe_* stages read the KMZ fixture, not the sf directory — at
    // "both scales" they'd run the identical workload (slope ≡ 1), so
    // they carry no headroom signal and are excluded
    val rows = PlanDump.Audited.filterNot(_.startsWith("pipe_")).map { name =>
      // min of 2 per scale, interleaved: the first execution of a query
      // carries its whole-stage-codegen compile, which at sf0.1 is a
      // large share of wall time and would understate every slope
      val s1 = run(name, Src); val d1 = run(name, Dst)
      val s2 = run(name, Src); val d2 = run(name, Dst)
      val t01 = math.min(s1, s2)
      val t1 = math.min(d1, d2)
      println(f"[sf1] $name%-22s sf0.1=$t01%6.2f s  sf1=$t1%7.2f s  slope=${t1 / t01}%5.2f")
      (name, t01, t1)
    }
    val json = rows.map { case (n, a, b) =>
      f""""$n":{"sf01_sec":$a%.3f,"sf1_sec":$b%.3f,"slope":${b / a}%.2f}"""
    }.mkString(",")
    val out = s"""{"metric":"sf1_headroom","k":$K,"queries":{$json}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SF1.json"), out + "\n")
    println(s"[sf1] wrote BENCH_SF1.json")
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "gen" || mode == "all") gen(spark)
    if (mode == "bench" || mode == "all") bench(spark)
    spark.stop()
  }
}
