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
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The regenerated testdata stores ALL timestamp columns
    // (events.ts, o_orderdate, l_shipdate) as TIMESTAMP(MICROS,
    // isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ by
    // default. Pin the inference off for EVERY table read, not just
    // events: otherwise the type a query sees depends on whether an
    // events read already flipped the session conf — an order-dependent
    // schema is poison for committed plan fingerprints.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The events table's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (rejected by Spark's reader unless
    * read as long), and TIMESTAMP(MICROS, isAdjustedToUTC=false) (which
    * Spark 4 infers as TIMESTAMP_NTZ, incompatible with the LTZ-typed
    * temporal surface: unix_micros, window(), watermarks). Normalize all
    * of them to TIMESTAMP_LTZ micros, which with the UTC session
    * timezone carries the identical epoch-micros DuckDB's oracle sees.
    * `inferTimestampNTZ.enabled=false` keeps the scan emitting LTZ
    * directly so ts predicates still push down to parquet; the NTZ cast
    * branch is a belt-and-braces fallback for already-cached scans. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer 1e-4 units for price*(1-discount) style products. */
  def revenueC4(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))
}
