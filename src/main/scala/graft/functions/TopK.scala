package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-K aggregator: keeps the K largest (score, payload) pairs per
  * group without a per-group sort or shuffle-the-world Window. This is the
  * scale-correct top-K (partial aggregation runs map-side; only K rows per
  * group cross the shuffle), used by the prior-dictionary ETL (REL
  * `wikipedia_yago_freq` top-100 cap analogue, SURVEY.md §2.4) and by
  * brute-force ANN.
  *
  * Ordering: score desc, then payload asc — fully deterministic ties.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, String), Array[(Double, String)], Array[(Double, String)]] {

  private val ord: Ordering[(Double, String)] =
    Ordering.by[(Double, String), (Double, String)] { case (s, p) => (-s, p) }

  override def zero: Array[(Double, String)] = Array.empty

  private def trim(buf: Array[(Double, String)]): Array[(Double, String)] = {
    val sorted = buf.sorted(ord)
    if (sorted.length <= k) sorted else sorted.take(k)
  }

  override def reduce(buf: Array[(Double, String)],
                      in: (Double, String)): Array[(Double, String)] = {
    // cheap fast-path: buffer full and the new item can't enter
    if (buf.length == k && ord.compare(in, buf(k - 1)) >= 0) buf
    else trim(buf :+ in)
  }

  override def merge(a: Array[(Double, String)],
                     b: Array[(Double, String)]): Array[(Double, String)] =
    if (a.isEmpty) b else if (b.isEmpty) a else trim(a ++ b)

  override def finish(r: Array[(Double, String)]): Array[(Double, String)] = r

  // ExpressionEncoder (not Kryo) so the output is a real
  // array<struct<_1:double,_2:string>> column — explodable downstream.
  override def bufferEncoder: Encoder[Array[(Double, String)]] =
    ExpressionEncoder[Array[(Double, String)]]()
  override def outputEncoder: Encoder[Array[(Double, String)]] =
    ExpressionEncoder[Array[(Double, String)]]()
}
