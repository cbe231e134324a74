package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator (SURVEY §7.3: the one place custom
  * Catalyst code is justified — a sketch-like aggregate Spark lacks).
  *
  * Keeps at most k (id, score) pairs per group ordered by (score desc,
  * id asc); `merge` is associative and commutative, so Spark runs it as a
  * proper partial aggregate: each partition reduces to ≤k rows before the
  * shuffle, which is what makes group-wise top-k viable at 100 TB — the
  * row_number()-window formulation must shuffle *every* candidate row to
  * sort it, while this moves ≤k·partitions rows.
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))

  override def zero: List[Scored] = Nil
  override def reduce(b: List[Scored], a: Scored): List[Scored] =
    (a :: b).sorted(ord).take(k)
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    (a ++ b).sorted(ord).take(k)
  override def finish(b: List[Scored]): Seq[Scored] = b.sorted(ord)

  override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
