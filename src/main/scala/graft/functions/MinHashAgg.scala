package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.DedupApprox

/** Corpus-level MinHash signature as a custom Catalyst aggregate
  * (`TypedImperativeAggregate` — the mutable-buffer tier used for
  * sketches). Aggregating documents' shingle minhashes element-wise
  * gives the signature of the UNION of their shingle sets, so two
  * corpora (or partitions, or snapshots) can be compared for Jaccard
  * similarity without touching row data again: the sketch is
  * mergeable, a few hundred bytes, and computed in one scan — the
  * HLL-style pattern for set similarity.
  *
  * Buffer = Array[Long] of element-wise minima; merge = min; the
  * combine is associative+commutative, so Spark runs it partial/final
  * with map-side combine like any built-in aggregate.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // same seeded permutations + overflow-free 31-bit hashing as
  // DedupApprox, so the sketch is replayable by the DuckDB oracle.
  private lazy val perms: Array[(Long, Long)] = DedupApprox.perms(numHashes)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_agg needs a string or array<string> column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(DedupApprox.EmptySentinel)

  private def updateWith(buffer: Array[Long], h: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val v = (perms(i)._1 * h + perms(i)._2) % DedupApprox.HashMod
      if (v < buffer(i)) buffer(i) = v
      i += 1
    }
  }

  override def update(buffer: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buffer
      case s: UTF8String =>
        DedupApprox.shingleHashesOf(s.toString, 3).foreach(updateWith(buffer, _))
        buffer
      case arr: ArrayData =>
        var i = 0
        while (i < arr.numElements()) {
          val e = arr.getUTF8String(i)
          // a caller-supplied token is a 1-gram shingle: its window
          // fold reduces to the bare token hash
          if (e != null) updateWith(buffer, DedupApprox.tokenHash31(e.toString))
          i += 1
        }
        buffer
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {

  /** Column form: corpus minhash signature of a text / token column. */
  def minhashAgg(c: Column, numHashes: Int = 64): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(c), numHashes)
        .toAggregateExpression())

  /** Jaccard estimate between two signatures: fraction of agreeing
    * components (driver-side, the signatures are tiny). */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
