package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dimension-table loader — the reference builds Python dicts from JSON
  * files, where duplicate keys resolve LAST-WINS by file order
  * (ref: Python-pipeline/dataingestion1.py:53-56, dataingestion3.py:37).
  *
  * Spark-first: `multiLine` JSON read (single file ⇒ single partition ⇒
  * file order preserved), explicit order column, row_number window for
  * deterministic last-wins dedup, then `broadcast()` at the join site —
  * dims are KBs, so at 100 TB the fact side never shuffles for these.
  */
object DimLoader {

  /** Read a JSON array-of-objects file preserving file order. */
  def readOrdered(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(path)
      .withColumn("__file_order", monotonically_increasing_id())

  /** Last-wins dedup on `key` by file order (dict-build semantics),
    * trimming the key and dropping null/blank keys like the reference's
    * guards. */
  def lastWins(df: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("__file_order").desc)
    df.withColumn(key, trim(col(key)))
      .where(col(key).isNotNull && col(key) =!= "")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__file_order")
  }

  def loadDim(spark: SparkSession, path: String, schema: StructType,
      key: String): DataFrame =
    lastWins(readOrdered(spark, path, schema), key)
}
