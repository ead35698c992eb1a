package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `heavy_hitters(tokens, m, k)` — mergeable Misra-Gries top-k sketch over
  * an `array<string>` column: at most `m` counters per aggregation buffer,
  * final value = the `k` heaviest keys as `array<struct<token,cnt>>`,
  * ordered (cnt desc, token asc).
  *
  * This is the frequent-items shape for key spaces too large to shuffle:
  * `groupBy(key).count + TopM` is the right plan when the DISTINCT key set
  * is bounded (a natural-language vocabulary), but top-URLs / top-hosts /
  * top-shingles over a 10^12-doc crawl has a distinct set proportional to
  * the corpus — hashing every distinct key through an Exchange is the
  * bottleneck the sketch removes. Here each map task folds its rows into
  * one m-entry summary, the shuffle carries partitions×m rows, and the
  * final merge is a bounded fold — corpus keys never shuffle.
  *
  * Semantics (Misra-Gries with the PODS'12 mergeable compress, batched):
  * insert adds weight 1; the map may grow to 2m entries, and crossing that
  * capacity triggers one compress — the (m+1)-th largest count c is
  * subtracted from every entry and non-positive entries drop, leaving at
  * most m survivors (only counts strictly above c remain). merge sums two
  * summaries then compresses the same way. Batching is what makes the
  * sketch O(log m) AMORTIZED per insert in its target regime (a tail of
  * once-seen keys): a compress that frees ≥ m slots is paid for by the ≥ m
  * novel-key inserts that filled them — the compress-at-m+1 variant would
  * pay O(m) per tail insert, quadratic exactly where the sketch matters.
  * The error bound is unchanged: each compress removes ≥ c·(m+1) count
  * mass (the m+1 largest entries each lose exactly c) and mass only enters
  * via real arrivals, so Σc ≤ N/(m+1) — estimates are underestimates with
  * error ≤ N/(m+1) (N = total weight seen), and every key with true count
  * > N/(m+1) survives. When the distinct key count never exceeds the
  * capacity, no compress ever fires and counts are EXACT — the regime the
  * DuckDB oracle pins; the approximation bound is spec-asserted separately
  * on a Zipf stream with m far below the vocabulary.
  *
  * Null handling: a null array contributes nothing (mirrors
  * `unnest(string_split(NULL, ' '))` = no rows); null elements are skipped.
  */
case class HeavyHitters(
    child: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(m > 0, s"heavy_hitters counter bound must be positive: $m")
  require(k > 0 && k <= m, s"heavy_hitters k must be in 1..m: k=$k m=$m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHitters.resultType
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Buffer capacity: compress only once the map exceeds 2m entries, so a
    * compress (which leaves ≤ m survivors) amortizes over the ≥ m novel-key
    * inserts that refilled it.
    */
  private val capacity = 2 * m

  /** One PODS'12 compress: subtract the (m+1)-th largest count from every
    * entry, drop non-positives. At most m entries can strictly exceed that
    * value, so a single pass restores the bound.
    */
  private def compress(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val c = counts(counts.length - (m + 1)) // (m+1)-th largest
      buf.filterInPlace((_, v) => v > c)
      buf.mapValuesInPlace((_, v) => v - c)
    }

  private def insert(buf: mutable.HashMap[String, Long], key: String): Unit = {
    buf.update(key, buf.getOrElse(key, 0L) + 1L)
    compress(buf)
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val data = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = data.numElements()
      while (i < n) {
        if (!data.isNullAt(i)) insert(buf, data.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, w) => buf.update(key, buf.getOrElse(key, 0L) + w) }
    compress(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toArray
      .sortBy { case (key, cnt) => (-cnt, key) }
      .take(k)
      .map { case (key, cnt) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(key), cnt)): Any
      }
    new GenericArrayData(top)
  }

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](HeavyHitters.resultType))

  /** The FULL summary round-trips (sorted for byte determinism), not just
    * the top-k — partial aggregation ships the whole (≤ 2m-entry) state.
    */
  override def serialize(obj: mutable.HashMap[String, Long]): Array[Byte] = {
    val rows = obj.toArray.sortBy(_._1).map { case (key, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(key), cnt)): Any
    }
    projection.apply(InternalRow(new GenericArrayData(rows))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val buf = mutable.HashMap.empty[String, Long]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      buf.update(s.getUTF8String(0).toString, s.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
}
