package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k aggregator for similarity ranking: keeps the k best
 * `(score, id)` pairs per group — score DESC, id ASC on ties, the exact
 * comparator of the `row_number` window it replaces. Where the window
 * ranks ALL n² candidate rows through a full sort-shuffle, this holds k
 * elements of state per group and combines map-side: the exchange carries
 * `groups · k` rows instead of every candidate, which is the difference
 * between a bounded and an O(n²) shuffle for the brute-force baseline.
 *
 * A typed `Aggregator` (SURVEY §2.8): state is a plain sorted Seq capped at
 * k (k is single-digit here — insertion into a k-vector beats heap overhead).
 */
case class TopKAgg(k: Int) extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(x => better(e, x)) match { case -1 => buf.size; case n => n }
      (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (in._2, in._1))
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopKAgg {
  /** `top_k(struct(id, score))` as an aggregation column: array of
   *  `(score, id)` structs, best-first. */
  def topK(k: Int, id: Column, score: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(TopKAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(id, score)
  }
}
