package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the parquet tables from it. Schemas are fixed by the generator; we rely
  * on parquet self-description + Catalyst column pruning / filter pushdown
  * (verified via .explain: PushedFilters / ReadSchema reach the scan).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations. Spark's vectorized
    * reader rejects NANOS outright, so nanosAsLong surfaces that case as a
    * raw long we rebuild into a µs timestamp with exact integer division
    * (identical to DuckDB's ns→µs cast); a MICROS file arrives as a native
    * timestamp and passes through untouched. Branching on the observed
    * schema keeps every query source-format agnostic. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock == the same instant under the UTC session tz the
        // whole harness runs in (the DuckDB oracle reads the identical
        // naive value), so the cast is value-preserving and restores the
        // TIMESTAMP type every downstream unix_micros/window expects.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — known generator " +
          "formats are INT64 nanos (read as long under nanosAsLong), " +
          "TIMESTAMP_NTZ, and TIMESTAMP(MICROS); teach Tables.events the " +
          "new format instead of letting it fail downstream")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
