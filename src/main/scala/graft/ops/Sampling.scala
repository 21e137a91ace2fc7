package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-size deterministic uniform sampling as a typed Aggregator —
  * the "bottom-k sketch": give every element priority md5(id) and keep
  * the k smallest priorities.
  *
  * Why this shape at 100 TB:
  *  - ORDER-INDEPENDENT and MERGEABLE: partial buffers combine
  *    associatively, so it runs as a partial-aggregable hash aggregate
  *    (map-side combine), never a global sort. Classic reservoir
  *    sampling is neither (merge of two reservoirs loses uniformity
  *    without weighted coin flips; results depend on arrival order).
  *  - DETERMINISTIC: same input set → same sample, on any cluster, any
  *    partitioning, any engine with md5 — re-runs and oracle checks
  *    reproduce it (p7_bottomk_sample).
  *  - UNIFORM: md5 is effectively a random permutation of ids; the k
  *    smallest hashes are a uniform k-subset.
  */
object Sampling {

  /** (priority, id) pairs, kept sorted ascending, capped at k. */
  type Buf = List[(String, Long)]

  final case class BottomK(k: Int)
      extends Aggregator[(String, Long), Buf, Seq[Long]] {

    override def zero: Buf = Nil

    private def insert(buf: Buf, e: (String, Long)): Buf = {
      // buf is sorted ascending; drop the element past position k
      val (lt, ge) = buf.span(b => b._1 < e._1 || (b._1 == e._1 && b._2 < e._2))
      val merged = lt ::: e :: ge
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(buf: Buf, in: (String, Long)): Buf = insert(buf, in)

    override def merge(a: Buf, b: Buf): Buf = b.foldLeft(a)(insert)

    override def finish(buf: Buf): Seq[Long] = buf.map(_._2)

    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
