package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Measures what the fused native PQ kernels buy over the interpreted
  * HOF towers they replace (results are bit-identical — PqSpec pins
  * parity; this tool reports the wall-clock delta for SURVEY, not an
  * assertion).
  *
  *  - encode: pq_encode vs transform/array_min/aggregate (M×K
  *    sub-distance argmin per row)
  *  - adc: pq_adc vs aggregate-over-sequence (M sub-distances per
  *    scored pair)
  *
  * Usage: runMain graft.tools.PqKernelBench [rows] [runs]
  */
object PqKernelBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = SimilarityOps.OracleDim
    val (m, k) = (SimilarityOps.PqSubs, SimilarityOps.PqCodes)
    // deterministic synthetic floats; vec_id 0..k-1 double as codebook
    // samples, matching pqCodebookRow's convention
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((((col("id") * 31 + j * 17 + 7) % 1001) - 500).cast("double") / 100d)
          .cast("float"))
        .as("embedding"))
      .localCheckpoint() // freeze the input so only the kernel differs
    val cb = SimilarityOps.pqCodebookRow(emb, dim, m, k).localCheckpoint()
    val base = emb.crossJoin(broadcast(cb))

    def encNative: DataFrame = base.select(
      graft.functions.VectorFunctions.pq_encode(col("embedding"), col("fcb"), m, k)
        .as("codes"))
    def encHof: DataFrame = base.select(
      SimilarityOps.pqEncodeHof(dim, m, k).as("codes"))

    // ADC over a 32-query broadcast against the encoded corpus
    val enc = base.withColumn("codes", graft.functions.VectorFunctions
        .pq_encode(col("embedding"), col("fcb"), m, k))
      .select("vec_id", "codes", "fcb").localCheckpoint()
    val q = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def adcNative: DataFrame = enc.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(graft.functions.VectorFunctions
        .pq_adc(col("q_emb"), col("codes"), col("fcb"), m, k).as("dist"))
    def adcHof: DataFrame = enc.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(SimilarityOps.pqAdcHof(dim, m, k).as("dist"))

    def time(mk: () => DataFrame): Double = {
      mk().write.format("noop").mode("overwrite").save() // warm
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val en = time(() => encNative); val eh = time(() => encHof)
    val an = time(() => adcNative); val ah = time(() => adcHof)
    println(f"[pqbench] rows=$n encode: native=$en%.2fs hof=$eh%.2fs ratio=${eh / en}%.2fx")
    println(f"[pqbench] pairs=${n.toLong * 32} adc: native=$an%.2fs hof=$ah%.2fs ratio=${ah / an}%.2fx")
    spark.stop()
  }
}
