package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class ScoredId(id: Long, score: Double)

/** Bounded per-group top-k as a typed `Aggregator` — the SURVEY §2.10
  * fallback for when window `row_number` is too slow: the buffer never
  * exceeds k entries, so each partition does O(n log k) work and the merge
  * combines two k-lists, versus the window's full per-partition sort. The
  * distributed analog of the reference's `argpartition` partial top-k
  * (`ocr_retrieval.py:66-75`) at per-group granularity.
  *
  * Order contract matches the engine's: score desc, id asc on ties.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    val (before, after) = buf.span(e => lt(e, x))
    (before ::: x :: after).take(k)
  }

  override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] = {
    val out = scala.collection.mutable.ListBuffer.empty[ScoredId]
    var (l, r) = (b1, b2)
    while (out.size < k && (l.nonEmpty || r.nonEmpty)) {
      if (r.isEmpty || (l.nonEmpty && lt(l.head, r.head))) {
        out += l.head; l = l.tail
      } else { out += r.head; r = r.tail }
    }
    out.toList
  }

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  // expression encoders, not kryo: the buffer crosses the partial/final
  // boundary on every shuffled row, and ArrayType(struct) ser/de is
  // codegen'd while kryo is reflective and several times slower
  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
