package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.4): corral's only aggregation hook is
  * writing a `Reducer`; the Spark-native typed equivalent is
  * `Aggregator[IN, BUF, OUT]` — partial (map-side) aggregation, spillable
  * merge, codegen'd buffer encoding, none of which the reference has.
  *
  * The buffer keeps exact integer sums so `finish` is a single
  * deterministic IEEE division — oracle-stable (see QueryDef notes).
  */
object Aggregators {

  final case class LangDoc(lang: String, n_chars: Long)

  /** Mean chars per group via exact (Long, Long) sums. */
  object MeanChars extends Aggregator[LangDoc, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), d: LangDoc): (Long, Long) =
      (b._1 + d.n_chars, b._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Double = b._1.toDouble / b._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
