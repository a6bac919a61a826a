package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed [[Aggregator]] — the third extension
  * surface next to codegen'd expressions (VectorDot) and SQL-registered
  * UDFs: log-sum partials combine associatively, so Spark runs it as a
  * standard two-phase (map-side partial + merge) aggregate with a tiny
  * (sum, count) buffer. Nulls/non-positives are skipped, matching
  * `exp(avg(ln(x)))` over a positive column. */
class GeoMean extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
    if (a == null || a <= 0.0) b else (b._1 + math.log(a), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): java.lang.Double =
    if (r._2 == 0L) null else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
