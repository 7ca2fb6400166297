package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_hll(value_string)` — HyperLogLog distinct-count as a custom
  * `TypedImperativeAggregate`: the remaining Catalyst extension tier
  * (imperative aggregate with BINARY MERGEABLE STATE), and the
  * single-shuffle form of [[graft.ext.Hll]].
  *
  * The declarative Hll shuffles (group, bucket) register rows twice
  * (max per bucket, then fold); this aggregate carries one 256-byte
  * register buffer per group through the standard partial/merge
  * protocol — update on the map side, bytewise-max merge across
  * partitions (HLL's register merge IS max, which is commutative,
  * associative and idempotent: exactly what partial aggregation
  * needs). At 100 TB the exchange moves one buffer per group per
  * partition, independent of input rows.
  *
  * Bit-compatible with [[graft.ext.Hll]] (bucket = first md5 byte,
  * rho = leading zeros of the next 40 bits + 1, same exact-integer
  * harmonic sum and IEEE estimate chain), so the `approx_distinct`
  * DuckDB oracle gates this operator too (`approx_hll_agg`).
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hll expects a string column (cast first), got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // shared derivation with the declarative path ([[Md5Util
      // .bucketRho]] — one copy, so the register layout cannot
      // silently diverge between the two oracle-gated sketch paths)
      val br = Md5Util.bucketRho(Md5Util.digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))
      val bucket = br >>> 8
      val rho = br & 0xff
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 256) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact-integer harmonic sum: Σ 2^(41 - M), M = 0 for empty
    // registers — identical to Hll.estimate's BIGINT fold
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < 256) {
      val m = buf(i).toInt
      if (m == 0) zeros += 1
      s += 1L << (41 - m)
      i += 1
    }
    // the same literal association as Hll.estimate / the DuckDB oracle,
    // so the double chain folds to bit-equal results
    val alphaM2 = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
    val eRaw = alphaM2 * 2199023255552.0 / s
    val v = zeros.toDouble
    val est =
      if (eRaw <= 640.0 && v > 0.0) 256.0 * math.log(256.0 / v) else eRaw
    math.floor(est).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll"
}

object HllAgg {
}
