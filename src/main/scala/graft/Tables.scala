package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + cross-engine-exact numeric helpers.
  *
  * All oracle-checked aggregates use integer cents (`round(x*100)` as
  * BIGINT): every monetary/quantity column in the driver testdata is an
  * exact 2-decimal value, so both Spark and DuckDB recover the same
  * int64 per row and integer aggregation is exact — float summation
  * order can never flip a comparison.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and truncate to micros (exactly
    * what DuckDB's epoch_us does on a nanosecond timestamp). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer 1e-4 units for price*(1-discount) style products. */
  def revenueC4(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))
}
