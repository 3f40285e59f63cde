package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PCA second-moment summary as ONE mergeable aggregate
  * (`TypedImperativeAggregate`, the TopKAgg/CountMin buffer tier):
  * per-partition accumulation of (n, s_i = Σ x_i, pp_ij = Σ x_i·x_j)
  * over a quantized vector column, into a single primitive
  * `Array[Long]` buffer.
  *
  * This replaces the double-`posexplode` formulation of
  * [[graft.operators.Pca.moments]], which materialized dim² rows PER
  * VECTOR inside the task (~590k rows/vector at dim=768) before the
  * map-side combine could collapse them. Here the dim² multiply-adds
  * run as a tight primitive loop with NO row materialization — the
  * intrinsic covariance cost and nothing else — and what crosses the
  * shuffle is exactly one buffer per partition (8·(1 + d + d(d+1)/2)
  * bytes; 2.4 MB at dim=768, model-sized).
  *
  * The accumulated sums are the same exact BIGINTs in the same
  * commutative integer arithmetic, so [[graft.operators.Pca.solve]]
  * and the q96/q97 oracles are bit-for-bit unchanged.
  *
  * Buffer layout (`Array[Long]`, length 1 + d + d(d+1)/2):
  * `[n, s_0..s_{d-1}, upper-triangle pp row-major]` — pp is symmetric,
  * so only i ≤ j is stored; [[MomentsAgg.unpack]] mirrors it back to
  * the full matrix on the driver.
  *
  * Input rows whose array is null, has the wrong length, or contains
  * null elements at position i contribute nothing at the affected
  * cells — identical to the SQL formulation, where a null `x_i`
  * vanishes from `sum(xi)` and `sum(xi*xj)` but still counts in n.
  */
case class MomentsAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val bufLen = 1 + dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"moments_agg needs an array<bigint> column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.ofDim[Long](bufLen)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buffer
      case arr: ArrayData =>
        if (arr.numElements() != dim) return buffer
        buffer(0) += 1L
        // triangle base for row i: 1 + dim + i*dim - i*(i-1)/2 - i·…
        var i = 0
        var tri = 1 + dim
        while (i < dim) {
          if (!arr.isNullAt(i)) {
            val xi = arr.getLong(i)
            buffer(1 + i) += xi
            var j = i
            while (j < dim) {
              if (!arr.isNullAt(j)) buffer(tri + (j - i)) += xi * arr.getLong(j)
              j += 1
            }
          }
          tri += dim - i
          i += 1
        }
        buffer
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MomentsAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "moments_agg"
}

object MomentsAgg {

  /** Column form over a quantized `array<bigint>` vector column. */
  def momentsAgg(qv: Column, dim: Int): Column =
    GraftBridge.column(
      MomentsAgg(GraftBridge.expression(qv), dim).toAggregateExpression())

  /** Driver-side unpack of the packed buffer back to
    * (n, s, full symmetric pp). */
  def unpack(packed: Seq[Long], dim: Int): (Long, Array[Long], Array[Array[Long]]) = {
    require(packed.length == 1 + dim + dim * (dim + 1) / 2,
      s"packed moments length ${packed.length} does not match dim $dim")
    val n = packed.head
    val s = packed.slice(1, 1 + dim).toArray
    val pp = Array.ofDim[Long](dim, dim)
    var i = 0
    var tri = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = packed(tri + (j - i))
        pp(i)(j) = v
        pp(j)(i) = v
        j += 1
      }
      tri += dim - i
      i += 1
    }
    (n, s, pp)
  }
}
