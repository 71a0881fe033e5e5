package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer for [[CappedCollectSet]]: a distinct-value set that
  * stops growing the moment it would exceed the cap. `overflowed` groups
  * drop their elements immediately — once a group is over the cap its
  * contents can never be output, so retaining them would be exactly the
  * unbounded buffering the cap exists to prevent. */
final class CappedSetBuffer(var overflowed: Boolean,
                            val set: java.util.HashSet[Any])

/** `collect_set` with a hard cap on per-group state: collects the
  * DISTINCT non-null inputs of a group, but the instant a group's
  * distinct count would exceed `cap` the buffer flips to a 1-bit
  * overflow marker and the group evaluates to NULL.
  *
  * This exists for [[graft.operators.Association.cooccurrencePairs]]'
  * mega-basket guard (round-13 ADVICE): the plain spelling —
  * `collect_set` then `size(...) <= cap` — must fully materialize an
  * over-cap basket in one aggregation buffer before the filter can drop
  * it, so the exact input the cap guards against (a 10^7-item feed
  * artifact) is the one input that can OOM an executor (per-GROUP state
  * on the ObjectHashAggregate path does not spill; only cross-group
  * fallback does). Here the buffer holds at most `cap` elements by
  * construction, on every path: update stops adding at the boundary,
  * and merge unions two sub-cap sets with the same check. Map-side
  * partial aggregation still applies, and an overflow discovered on ANY
  * partial poisons the merged group (1 byte across the exchange instead
  * of the basket).
  *
  * Null contract: identical to `collect_set` — null inputs are dropped,
  * so a (basket, null) membership counts toward nothing. NULL output =
  * "group exceeded the cap" (a real empty group yields an empty array,
  * distinguishable by construction).
  *
  * Element type: any atomic type with value equality (the catalyst
  * runtime classes — UTF8String, boxed numerics, Decimal — all hash
  * correctly in a java.util.HashSet). */
case class CappedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedSetBuffer]
  with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def createAggregationBuffer(): CappedSetBuffer =
    new CappedSetBuffer(false, new java.util.HashSet[Any]())

  private def add(buf: CappedSetBuffer, v: Any): Unit =
    if (!buf.overflowed && !buf.set.contains(v)) {
      if (buf.set.size() >= cap) { buf.overflowed = true; buf.set.clear() }
      else buf.set.add(v)
    }

  override def update(buf: CappedSetBuffer, input: InternalRow): CappedSetBuffer = {
    val v = child.eval(input)
    // copyValue: UTF8String (and friends) handed to eval may be backed by
    // a reused row buffer — storing the reference would alias later rows
    if (v != null) add(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(a: CappedSetBuffer, b: CappedSetBuffer): CappedSetBuffer = {
    if (b.overflowed) { a.overflowed = true; a.set.clear() }
    else {
      val it = b.set.iterator()
      while (it.hasNext && !a.overflowed) add(a, it.next())
    }
    a
  }

  override def eval(buf: CappedSetBuffer): Any =
    if (buf.overflowed) null
    else new GenericArrayData(buf.set.toArray.asInstanceOf[Array[Any]])

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: CappedSetBuffer): Array[Byte] =
    if (buf.overflowed) Array[Byte](1)
    else {
      val arr = new GenericArrayData(buf.set.toArray.asInstanceOf[Array[Any]])
      val rowBytes = projection.apply(InternalRow(arr)).getBytes
      val out = new Array[Byte](1 + rowBytes.length)
      out(0) = 0
      System.arraycopy(rowBytes, 0, out, 1, rowBytes.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): CappedSetBuffer =
    if (bytes(0) == 1) new CappedSetBuffer(true, new java.util.HashSet[Any]())
    else {
      val body = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
      val row = new UnsafeRow(1)
      row.pointTo(body, body.length)
      val arr = row.getArray(0).toObjectArray(child.dataType)
      val set = new java.util.HashSet[Any](arr.length * 2)
      var i = 0
      while (i < arr.length) { set.add(arr(i)); i += 1 }
      new CappedSetBuffer(false, set)
    }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectSet =
    copy(child = newChild)
  override def prettyName: String = "capped_collect_set"
}
