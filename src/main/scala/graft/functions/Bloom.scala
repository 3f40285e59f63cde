package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a mergeable sketch: build once over a (small-ish)
  * key set, ship ~m/8 bytes to every executor, test membership
  * scan-locally with h hashes and ZERO joins. The scale story for
  * decontamination: a benchmark suite of 10⁷ 13-grams broadcasts as a
  * fixed 2 MB bit array instead of a multi-GB string set, and the
  * training corpus probes it inside whole-stage codegen. False
  * positives at rate ≈ (1 − e^(−h·n/m))^h are the documented price;
  * false negatives are impossible (the filter flags a superset).
  *
  * Self-describing serialization (`[numHashes:int][words:long*]`):
  * the membership expression reads h from the artifact, so a filter
  * built with one parameterization can never be probed with another.
  */
object BloomKernels {

  /** 64-bit FNV-1a over the UTF-8 bytes, seed-mixed — self-contained
    * and deterministic across JVMs/engines (no JVM hashCode, no Spark
    * internals). */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer: FNV alone is weak in the high bits
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Double hashing (Kirsch–Mitzenmacher 2006): gᵢ = h1 + i·h2 gives
    * h independent-enough probes from two hash calls. */
  def setBits(words: Array[Long], numHashes: Int, s: UTF8String): Unit = {
    val mask = words.length * 64 - 1
    val h1 = hash64(s, 0L); val h2 = hash64(s, 1L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Membership probe against the serialized artifact. */
  def mightContain(artifact: Array[Byte], s: UTF8String): Boolean = {
    val bb = ByteBuffer.wrap(artifact)
    val numHashes = bb.getInt
    val words = (artifact.length - 4) / 8
    val mask = words * 64 - 1
    val h1 = hash64(s, 0L); val h2 = hash64(s, 1L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      if ((bb.getLong(4 + (bit >>> 6) * 8) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * words.length)
    bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }
}

/** `bloom_agg(string) -> binary`: build the filter over a key column.
  * Buffer = the bit words; merge = OR (associative+commutative, so
  * Spark runs partial/final with map-side combine). */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64 (got $numBits)")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16] (got $numHashes)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs a string column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buffer
      case s: UTF8String =>
        BloomKernels.setBits(buffer, numHashes, s)
        buffer
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomKernels.serialize(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numBits / 64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(binary, string) -> boolean` as a native
  * codegen expression — the probe side stays inside whole-stage
  * codegen (one static call, no join, no UDF serde). */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary artifact, string key), got $other")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(artifact: Any, key: Any): Any =
    BloomKernels.mightContain(artifact.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.BloomKernels.mightContain($a, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}

object Bloom {

  /** Column form: build the filter over a string key column. */
  def bloomAgg(key: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Column form: probe a built artifact (usually a `lit(bytes)`). */
  def mightContain(artifact: Column, key: Column): Column =
    GraftBridge.column(
      BloomContainsExpr(GraftBridge.expression(artifact),
        GraftBridge.expression(key)))
}
