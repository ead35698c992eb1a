package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list_capped(child, maxElems)` — collect_list with a HARD buffer
  * bound: the aggregation buffer never holds more than `maxElems` elements,
  * in update AND in merge.
  *
  * This is the skew guard for the LSH bucket-pair expansion. The plain
  * `collect_list(...)` + `filter(size <= cap)` plan is correct but
  * materializes a boilerplate mega-bucket IN FULL inside one aggregation
  * buffer before the filter drops it — at production scale a bucket shared
  * by 10^8 near-identical documents is a single-row OOM precisely where the
  * cap was meant to protect. Callers pass `maxElems = cap + 1`: buckets
  * with ≤ cap members are collected completely (bit-identical output to
  * plain collect_list), anything larger stops accumulating at cap + 1
  * elements — enough for the downstream `size(...) between 2 and cap`
  * filter to recognise and drop it, never more than cap + 1 values in
  * memory. Which cap + 1 elements survive truncation is partial-order
  * dependent, but only for buckets the filter discards, so query results
  * are unaffected.
  *
  * Element values are copied on insert (UnsafeRow-backed inputs are reused
  * buffers); serialize/deserialize round-trips the buffer through a
  * single-column UnsafeRow, the standard TypedImperativeAggregate shape, so
  * partial aggregation and spilling work like any ObjectHashAggregate.
  */
case class CollectListCapped(
    child: Expression,
    maxElems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(maxElems > 0, s"collect_list_capped bound must be positive: $maxElems")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "collect_list_capped"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length < maxElems) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v) // collect_list skips nulls
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.length < maxElems && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(obj.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = mutable.ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buf += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectListCapped =
    copy(child = newChildren.head)
}
