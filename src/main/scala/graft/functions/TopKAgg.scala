package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a mergeable aggregate — the missing piece for
  * BATCH similarity search: `groupBy(query).agg(topk(score, id, k))`
  * keeps only k (score, id) entries per group per map partition before
  * the shuffle, so a 1000-query × 10⁹-row batch moves `queries × k ×
  * partitions` tiny structs instead of the full n×q scored cross
  * product a window-rank plan would sort. The combine is
  * associative+commutative (merge two top-k lists → top-k of the
  * union), so Spark runs it partial/final with map-side combine like
  * any built-in aggregate.
  *
  * Total order: score DESC, id ASC — ties cut deterministically, so
  * results are partitioning-independent (and oracle-replayable with
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id)`).
  *
  * Buffer = unsorted growable array, compacted to k whenever it
  * reaches 4k (amortized O(n log k) per partition, no per-row heap
  * churn); eval = final sort + trim.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k >= 1, s"top-k needs k >= 1 (got $k)")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_agg needs (double score, bigint id) children, got $other")
    }

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buffer: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: TopKAgg.Buf): Any = {
    val top = buffer.top()
    new GenericArrayData(top.map { case (s, i) =>
      InternalRow(i, s)
    })
  }

  override def serialize(buffer: TopKAgg.Buf): Array[Byte] = {
    val top = buffer.top() // shrink before shipping: never > k entries
    val bb = ByteBuffer.allocate(4 + 16 * top.length)
    bb.putInt(top.length)
    top.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(k)
    var j = 0
    while (j < n) {
      buf.add(bb.getDouble, bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_agg"
}

object TopKAgg {

  /** Mutable bounded buffer: grows to 4k, compacts to k. Comparison
    * (score DESC, id ASC) is a total order, so compaction never
    * depends on arrival order. */
  final class Buf(k: Int) {
    private var scores = new Array[Double](math.max(4 * k, 8))
    private var ids = new Array[Long](scores.length)
    private var n = 0
    // worst score currently guaranteed to survive compaction; entries
    // strictly worse than this once n == k can be skipped early
    private var haveFull = false
    private var cutScore = Double.NegativeInfinity
    private var cutId = Long.MaxValue

    private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean =
      s > s2 || (s == s2 && i < i2)

    def add(s: Double, i: Long): Unit = {
      if (haveFull && !beats(s, i, cutScore, cutId)) return
      if (n == scores.length) compact()
      scores(n) = s; ids(n) = i; n += 1
      if (n == scores.length) compact()
    }

    def addAll(other: Buf): Unit = {
      var j = 0
      while (j < other.n) { add(other.scores(j), other.ids(j)); j += 1 }
    }

    private def sortedIdx(): Array[Integer] = {
      val idx = Array.tabulate[Integer](n)(Integer.valueOf)
      java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
        val c = java.lang.Double.compare(scores(b), scores(a))
        if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
      })
      idx
    }

    private def compact(): Unit = {
      if (n <= k) return
      val idx = sortedIdx()
      val ns = new Array[Double](scores.length)
      val ni = new Array[Long](ids.length)
      var j = 0
      while (j < k) { ns(j) = scores(idx(j)); ni(j) = ids(idx(j)); j += 1 }
      scores = ns; ids = ni; n = k
      haveFull = true
      cutScore = scores(k - 1); cutId = ids(k - 1)
    }

    /** Final (score, id) list, best first, at most k entries. */
    def top(): Array[(Double, Long)] = {
      val idx = sortedIdx()
      Array.tabulate(math.min(n, k))(j => (scores(idx(j)), ids(idx(j))))
    }
  }

  /** Column form: per-group top-k (id, score) structs, best first. */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
