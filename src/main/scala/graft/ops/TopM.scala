package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact per-key top-m selection without a per-key single-task sort.
  *
  * `Window.partitionBy(key).orderBy(...)` + `filter(rn <= m)` funnels EVERY
  * candidate row for a key through one task's sort — at 10^9+ candidates per
  * query that serializes the scan's reduce side. This helper computes the
  * identical result in two bounded phases:
  *
  *   1. per input partition, a bounded heap keeps at most m rows per key —
  *      O(m) state per (partition, key), no shuffle, no sort of the full
  *      candidate set;
  *   2. the survivors (≤ partitions × m rows per key) shuffle by key and a
  *      second bounded heap merges them to the exact global top-m, which is
  *      then sorted (≤ m rows) to emit a 1-based rank column.
  *
  * The ordering must be total (include a unique tiebreak column) so the
  * result is deterministic and equal to the window form / the SQL oracle.
  *
  * Memory bound: phase 1 holds one m-row heap PER DISTINCT KEY seen in the
  * partition, i.e. O(min(rowsInPartition, distinctKeysInPartition) × m)
  * rows of executor state. That is the right shape when the key side is
  * small relative to the candidate side (here: keys = queries, candidates =
  * the corpus — a partition sees every query but the heaps hold m rows
  * each). For a HIGH-cardinality key (millions of distinct groups per
  * partition) the per-partition map itself becomes the footprint and a
  * plain `groupBy(key).agg(...)` with partial aggregation (or a window
  * after a repartition on key) is the better plan — this helper targets
  * the few-keys/many-candidates regime.
  */
object TopM {

  /** @param ord (column, ascending) orderings, best-first; must be total. */
  def topM(df: DataFrame, key: String, ord: Seq[(String, Boolean)], m: Int,
           rankName: String = "rank"): DataFrame = {
    require(m > 0, "m must be positive")
    val schema = df.schema
    val keyIdx = schema.fieldIndex(key)
    val ordIdx: Array[(Int, Boolean, DataType)] =
      ord.map { case (c, asc) => (schema.fieldIndex(c), asc, schema(c).dataType) }.toArray

    // "better" = smaller under this ordering. Null and string semantics
    // MATCH THE WINDOW FORM this helper replaces: Spark orders nulls FIRST
    // ascending / LAST descending (null = smallest before the direction
    // flip — a primitive getter on a null cell would NPE instead), and
    // strings sort in UTF8String BINARY order (java.lang.String.compareTo
    // ranks supplementary-plane chars below U+E000..U+FFFF because it
    // compares UTF-16 code units — a different top-m than the SQL oracle).
    val rowOrd: Ordering[Row] = new Ordering[Row] {
      override def compare(x: Row, y: Row): Int = {
        var i = 0
        while (i < ordIdx.length) {
          val (idx, asc, dt) = ordIdx(i)
          val xn = x.isNullAt(idx)
          val yn = y.isNullAt(idx)
          val c =
            if (xn && yn) 0
            else if (xn) -1
            else if (yn) 1
            else dt match {
              case IntegerType => java.lang.Integer.compare(x.getInt(idx), y.getInt(idx))
              case LongType => java.lang.Long.compare(x.getLong(idx), y.getLong(idx))
              case DoubleType => java.lang.Double.compare(x.getDouble(idx), y.getDouble(idx))
              case FloatType => java.lang.Float.compare(x.getFloat(idx), y.getFloat(idx))
              case StringType =>
                org.apache.spark.unsafe.types.UTF8String.fromString(x.getString(idx))
                  .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y.getString(idx)))
              case other => throw new IllegalArgumentException(s"unsupported ordering type $other")
            }
          if (c != 0) return if (asc) c else -c
          i += 1
        }
        0
      }
    }

    // bounded per-key selection over one partition (max-heap holds the worst
    // of the current best-m on top, so each new row is one compare + maybe
    // one heap op)
    def localTop(it: Iterator[Row]): Iterator[Row] = {
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(keyIdx),
          scala.collection.mutable.PriorityQueue.empty(rowOrd))
        if (h.size < m) h.enqueue(r)
        else if (rowOrd.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    val enc = Encoders.row(schema)
    val outSchema = schema.add(rankName, IntegerType, nullable = false)
    val outEnc = Encoders.row(outSchema)

    val partial = df.mapPartitions(localTop(_))(enc)
    // after repartition every row of a key is in ONE partition, so the second
    // bounded pass is the exact global top-m; sorting ≤ m rows yields the rank
    partial.repartition(col(key)).mapPartitions { it =>
      val merged = localTop(it).toVector.groupBy(_.get(keyIdx))
      merged.valuesIterator.flatMap { rows =>
        rows.sorted(rowOrd).iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (i + 1))
        }
      }
    }(outEnc)
  }
}
