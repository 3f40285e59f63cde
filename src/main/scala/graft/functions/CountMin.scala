package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005): mergeable
  * frequency sketch — d rows of w counters, each key bumps one counter
  * per row, the estimate is the row-minimum. Always an OVERestimate
  * (collisions only add), error ≤ 2N/w with probability 1−(1/2)^d.
  * Completes the engine's sketch family (MinHash similarity, HLL
  * distinct, Bloom membership, TopK order statistics — CMS is the
  * frequency axis): per-token corpus frequencies at 100 TB become a
  * fixed d·w·8-byte artifact that merges across partitions/streams
  * with element-wise +, instead of a vocab-sized exact count table
  * that must shuffle.
  *
  * Hashing reuses [[BloomKernels.hash64]] (FNV-1a + splitmix, seeded
  * per row) — deterministic across JVMs, so a sketch built anywhere
  * probes identically everywhere. Self-describing artifact:
  * `[d:int][w:int][counters:long*]` (row-major), so probe and build
  * parameterizations can never diverge. */
object CountMinKernels {

  def rowIndex(w: Int, row: Int, s: UTF8String): Int =
    (((BloomKernels.hash64(s, 100 + row) % w) + w) % w).toInt

  def estimate(artifact: Array[Byte], s: UTF8String): Long = {
    val bb = ByteBuffer.wrap(artifact)
    val d = bb.getInt; val w = bb.getInt
    // Offsets stay in Long until proven < artifact.length (an Int), so
    // d*w up to the byte[] ceiling can never wrap to a wrong counter.
    require(8L + d.toLong * w * 8L == artifact.length,
      s"malformed CMS artifact: header says d=$d w=$w but length=${artifact.length}")
    var min = Long.MaxValue
    var r = 0
    while (r < d) {
      val off = 8L + (r.toLong * w + rowIndex(w, r, s)) * 8L
      val c = bb.getLong(off.toInt)
      if (c < min) min = c
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  def serialize(counters: Array[Long], d: Int, w: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(d); bb.putInt(w)
    counters.foreach(bb.putLong)
    bb.array()
  }
}

/** `cms_agg(string [, weight]) -> binary`: build the sketch over a key
  * column, each occurrence adding `weight` (default 1). Merge =
  * element-wise + (associative+commutative → map-side combine). */
case class CountMinAgg(
    key: Expression,
    weight: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16] (got $depth)")
  require(width >= 16 && (width & (width - 1)) == 0,
    s"width must be a power of two >= 16 (got $width)")
  require(depth.toLong * width <= (Int.MaxValue - 8) / 8,
    s"depth*width=${depth.toLong * width} counters exceed the 2^28-ish " +
      "byte[] artifact ceiling (8 + 8*d*w must fit an Int)")

  override def children: Seq[Expression] = Seq(key, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, weight.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_agg needs (string key, bigint weight) children, got $other")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    val wv = weight.eval(input)
    if (k != null && wv != null) {
      val s = k.asInstanceOf[UTF8String]
      val inc = wv.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buffer(r * width + CountMinKernels.rowIndex(width, r, s)) += inc
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    CountMinKernels.serialize(buffer, depth, width)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(key = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "cms_agg"
}

/** `cms_estimate(binary, string) -> bigint` as a native codegen
  * expression: scan-local frequency probe against a broadcast
  * artifact — no join. */
case class CountMinEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary artifact, string key), got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(artifact: Any, k: Any): Any =
    CountMinKernels.estimate(artifact.asInstanceOf[Array[Byte]],
      k.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.CountMinKernels.estimate($a, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CountMinEstimateExpr =
    copy(left = newLeft, right = newRight)
}

object CountMin {

  /** Column form: build a sketch over a key column (unit weight). */
  def cmsAgg(key: Column, depth: Int = 4, width: Int = 1 << 18): Column =
    cmsAggWeighted(key, org.apache.spark.sql.functions.lit(1L), depth, width)

  /** Column form with a per-row weight (e.g. token counts). */
  def cmsAggWeighted(key: Column, weight: Column, depth: Int = 4,
                     width: Int = 1 << 18): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(key),
        GraftBridge.expression(weight.cast("long")), depth, width)
        .toAggregateExpression())

  /** Column form: probe a built artifact (usually a `lit(bytes)`). */
  def estimate(artifact: Column, key: Column): Column =
    GraftBridge.column(
      CountMinEstimateExpr(GraftBridge.expression(artifact),
        GraftBridge.expression(key)))

  /** Probe factory carrying the artifact on a BROADCAST VARIABLE
    * instead of a plan literal: a production-width sketch (d·w·8
    * bytes — megabytes) embedded via `lit()` is serialized into the
    * expression tree shipped with EVERY task and bloats explain
    * output; broadcast ships it once per executor (the
    * [[graft.operators.LmScore.bigramScoreBroadcast]] carrier
    * pattern). Returns a Column → Column probe closed over the
    * broadcast. */
  def estimateBroadcast(spark: org.apache.spark.sql.SparkSession,
                        artifact: Array[Byte]): Column => Column = {
    val bc = spark.sparkContext.broadcast(artifact)
    val probe = org.apache.spark.sql.functions.udf { (k: String) =>
      if (k == null) 0L
      else CountMinKernels.estimate(bc.value, UTF8String.fromString(k))
    }
    (key: Column) => probe(key)
  }
}
