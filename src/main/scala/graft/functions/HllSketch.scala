package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}

/** Single-pass HyperLogLog (m = 64 registers) over a 60-bit hash column,
  * as a [[TypedImperativeAggregate]] — the fourth extension surface next
  * to codegen'd expressions (VectorDot), typed Aggregators (GeoMean) and
  * reused internal aggregates (BloomFilterAggregate). The buffer is the
  * raw 64-byte register array; partials merge by element-wise max, so
  * Spark runs it map-side-combined like any native sketch.
  *
  * Register/rho layout matches the expression-level HLL in
  * `TextOps.t13_hll_shingles` exactly (register = h mod 64, rho = 55 -
  * bitlength(h div 64), empty = 0), and `HllAggSpec` pins the two
  * implementations to byte-identical estimates — the imperative form is
  * ONE aggregate pass (64-byte state per group) where the expression form
  * costs an intermediate (group, register) aggregate, which is the
  * difference that matters when the group count is large.
  *
  * Estimator: raw Flajolet HLL with alpha_64 = 0.709; the harmonic
  * denominator sum(2^(55 - rho_j)) is computed in exact 64-bit integers
  * (each term a power of two), so the result is independent of merge
  * order — same reproducibility argument as the SQL twin.
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = 64

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate needs a BIGINT hash column, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_estimate"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = java.lang.Math.floorMod(h, m.toLong).toInt
      val rem = java.lang.Math.floorDiv(h, m.toLong)
      val rho =
        if (rem == 0L) 55
        else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var denom = 0L
    var i = 0
    while (i < m) { denom += 1L << (55 - buf(i)); i += 1 }
    // alpha_64 * m^2 * 2^55 as one double literal (see t13's scaladoc)
    math.floor(1.0462993238608057e20 / denom.toDouble + 0.5).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllSketchAgg =
    copy(child = c)
}
