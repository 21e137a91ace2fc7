package graft.text

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash aggregator (SURVEY.md §7.3d): maintains a k-slot
  * signature as an elementwise min over per-shingle hashes. Unlike the
  * per-document batch computation in NearDup, an Aggregator composes into
  * ANY grouping — incremental signature maintenance in a streaming
  * `foreachBatch`/state update, signatures per (source, day) bucket, etc.
  *
  * merge() is associative+commutative ⇒ Spark plans it as partial
  * (map-side) aggregation + final merge — the signature of a 100 TB key
  * group reduces tree-wise, never collecting shingles anywhere.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[String], Array[String]] {

  private def hash(seed: Int, shingle: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$shingle".getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString
  }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var i = 0
    while (i < k) {
      val h = hash(i, shingle)
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
