package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state k-minimum-values aggregate: keeps the `k` smallest
  * DISTINCT long inputs per group (the KMV / bottom-k distinct sketch of
  * Bar-Yossef et al. '02 / Beyer et al., SIGMOD '07).
  *
  * This exists because the composition spelling — `distinct` + window
  * `row_number <= k` — shuffles EVERY distinct hash, i.e. pays the full
  * `COUNT(DISTINCT)` exchange the sketch is meant to avoid. Here the
  * aggregation buffer is a size-capped ordered set, so map-side partial
  * aggregation reduces each partition to at most k longs per group and
  * the exchange carries k values per (group, partition) — sketch cost,
  * not data cost. Merge = set-union-then-trim: associative, commutative,
  * idempotent, so re-merging a partition (speculative retry, stage
  * replay) cannot change the result.
  *
  * The input is expected to be an already-computed PORTABLE hash (the
  * 60-bit md5 prefix from [[graft.operators.Sketches]]); keeping the
  * hashing in the plan keeps this aggregate generic and keeps every bit
  * of the sketch recomputable by any engine with md5 — the register
  * contract the HLL profile uses, extended to set intersections.
  *
  * Runs on the ObjectHashAggregate path (same as `collect_set`), but
  * unlike `collect_set` the per-group state can never exceed k longs.
  * Output: the sketch as an ascending `array<long>` (size <= k; size < k
  * means the group had fewer than k distinct hashes — the estimate is
  * then exact by construction). */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // cheap reject before mutating: values above the current kth
      // smallest can never enter a full sketch
      if (buf.size() < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size() > k) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size() < k) a.add(h)
      else if (h < a.last()) { a.add(h); if (a.size() > k) a.pollLast() }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinK =
    copy(child = newChild)
  override def prettyName: String = "bounded_min_k"
}
