package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded max-heap of the k smallest longs seen — the aggregation state
  * behind [[BottomK]]. Layout: `heap(0)` is the LARGEST retained value, so
  * a new value only enters (evicting the root) when it beats the current
  * worst — each row costs O(1) when it misses and O(log k) when it hits.
  */
final class BottomKHeap(val k: Int) {
  val heap = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit =
    if (size < k) {
      // grow phase: append + sift up
      var i = size
      heap(i) = v
      size += 1
      while (i > 0 && heap((i - 1) / 2) < heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v < heap(0)) {
      // replace the worst + sift down
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && heap(l) > heap(m)) m = l
        if (r < size && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
    }

  def sortedAscending: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, size)
    java.util.Arrays.sort(out)
    out
  }
}

/** Aggregate: the k smallest values of a long column per group, returned
  * sorted ascending — the bounded-state replacement for
  * `slice(sort_array(collect_list(x)), 1, k)`.
  *
  * The composable form's `collect_list` buffers EVERY value of the group
  * before sorting: per-group state is O(group size), which on a bottom-k
  * shingle sketch means a million-shingle document materializes a
  * million-element array to keep 64 of them — the exact unbounded-state
  * shape this engine bans from 100 TB paths. This aggregate's state is the
  * k-slot heap above, serialized as 8k bytes, and TypedImperativeAggregate
  * runs under ObjectHashAggregate with full map-side partial aggregation:
  * each shuffle block carries at most k longs per group, not the group.
  *
  * Result equivalence with the composable form holds whenever values are
  * distinct within the group (the shingle relations here are — `shingles`
  * applies `array_distinct` per doc); with duplicates both forms keep
  * duplicates, but relative order of equal values is trivially equal since
  * longs are their own sort key. Nulls are skipped, matching
  * `collect_list`. Property-tested against the composable form in
  * BottomKSpec.
  */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKHeap] with UnaryLike[Expression] {

  require(k >= 1, s"bottom_k: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bottom_k expects BIGINT, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKHeap = new BottomKHeap(k)

  override def update(buffer: BottomKHeap, input: InternalRow): BottomKHeap = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BottomKHeap, other: BottomKHeap): BottomKHeap = {
    var i = 0
    while (i < other.size) { buffer.insert(other.heap(i)); i += 1 }
    buffer
  }

  override def eval(buffer: BottomKHeap): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buffer.sortedAscending)

  override def serialize(buffer: BottomKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): BottomKHeap = {
    val bb = java.nio.ByteBuffer.wrap(storageFormat)
    val n = bb.getInt()
    val h = new BottomKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
  override def prettyName: String = "bottom_k"
}

object BottomK {
  /** Column form: k smallest values of `c` (BIGINT) per group, ascending. */
  def bottom_k(c: Column, k: Int): Column =
    ColumnShim.column(BottomK(ColumnShim.expression(c), k).toAggregateExpression())
}
