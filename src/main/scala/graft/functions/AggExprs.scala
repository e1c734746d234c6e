package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
import org.apache.spark.sql.types.DataType

/** Native aggregate expressions for the banded dedup/similarity operators
  * (SURVEY.md §4.3 family — see [[ArrayExprs]] for the scalar siblings).
  */
object AggExprs {

  /** `collect_list` with a HARD per-group element cap: once a group's
    * buffer holds `cap` elements, further inputs are discarded during both
    * update and merge, so aggregation state is O(cap) — never O(group).
    *
    * This exists for the capped banded operators
    * ([[graft.textops.Dedup]] / [[graft.textops.Similarity]]): their
    * `maxBucket`/`maxPostingList` caps DROP oversize groups, but a plain
    * `collect_list` would still materialize the full degenerate group
    * (one boilerplate shingle holding 10 % of a corpus ≈ the corpus in one
    * aggregation buffer on one executor) before the size filter could
    * discard it — the cap must bound the buffer, not just the output.
    * Callers pair it with a `count(*)` in the same aggregation: the count
    * (O(1) state, partial-aggregating) carries the TRUE group size for the
    * drop decision and the drop metrics, so the truncated list of a
    * to-be-dropped group is never observed.
    *
    * Collection order is input order per partial buffer, like
    * `collect_list` — callers must not depend on element order (the pair
    * exploders sort/dedup downstream). Groups at or under `cap` collect
    * completely, so for surviving groups the result is exactly
    * `collect_list`'s up to ordering.
    */
  case class CollectCapped(child: Expression, cap: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends Collect[mutable.ArrayBuffer[Any]]
      with UnaryLike[Expression] {
    require(cap > 0, s"cap must be positive, got $cap")

    override lazy val bufferElementType: DataType = child.dataType
    override def convertToBufferElement(value: Any): Any =
      InternalRow.copyValue(value)
    override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
      mutable.ArrayBuffer.empty

    override def update(buffer: mutable.ArrayBuffer[Any],
        input: InternalRow): mutable.ArrayBuffer[Any] =
      if (buffer.length >= cap) buffer else super.update(buffer, input)

    override def merge(buffer: mutable.ArrayBuffer[Any],
        other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
      val room = cap - buffer.length
      if (room >= other.length) buffer ++= other
      else if (room > 0) buffer ++= other.take(room)
      buffer
    }

    override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
      new GenericArrayData(buffer.toArray)

    override def withNewMutableAggBufferOffset(
        newOffset: Int): CollectCapped =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): CollectCapped =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): CollectCapped = copy(child = newChild)
    override def prettyName: String = "graft_collect_capped"
  }

  /** Column wrapper for [[CollectCapped]]. */
  def collectCapped(e: Column, cap: Int): Column =
    exprColumn(CollectCapped(columnExpr(e), cap).toAggregateExpression())

  /** The LARGEST `k` values of `child` per group under the type's natural
    * ordering (struct = lexicographic by field — pack
    * `struct(ord, tiebreak, payload…)` and ties are total), returned
    * sorted DESCENDING. Aggregation state is a bounded sorted buffer:
    * O(k) per group through update AND merge, partial-aggregating
    * map-side — so "top-k per group" costs one hash aggregate instead of
    * the window formulation's full shuffle + per-group SORT of every row
    * (the `row_number() <= k` plan sorts a hot group's entire 10⁷-row
    * history to keep 10 of them; this keeps 10 of them, period). The
    * [[graft.operators.Relational]] grouped-top-k query (q96) gates it
    * against exactly that window SQL.
    */
  case class CollectTopK(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends Collect[mutable.ArrayBuffer[Any]]
      with UnaryLike[Expression] {
    require(k > 0, s"k must be positive, got $k")

    override lazy val bufferElementType: DataType = child.dataType
    override def convertToBufferElement(value: Any): Any =
      InternalRow.copyValue(value)
    override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
      mutable.ArrayBuffer.empty

    @transient private lazy val ord =
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(child.dataType)

    // buffer invariant: sorted ASCENDING, length <= k; the head is the
    // current cutoff (smallest kept value)
    private def insert(buffer: mutable.ArrayBuffer[Any],
        v: Any): mutable.ArrayBuffer[Any] = {
      if (buffer.length < k || ord.compare(v, buffer.head) > 0) {
        var lo = 0
        var hi = buffer.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ord.compare(buffer(mid), v) < 0) lo = mid + 1 else hi = mid
        }
        buffer.insert(lo, v)
        if (buffer.length > k) buffer.remove(0)
      }
      buffer
    }

    override def update(buffer: mutable.ArrayBuffer[Any],
        input: InternalRow): mutable.ArrayBuffer[Any] = {
      val v = child.eval(input)
      if (v == null) buffer else insert(buffer, convertToBufferElement(v))
    }

    override def merge(buffer: mutable.ArrayBuffer[Any],
        other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
      other.foreach(v => insert(buffer, v))
      buffer
    }

    override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
      new GenericArrayData(buffer.reverse.toArray)

    override def withNewMutableAggBufferOffset(
        newOffset: Int): CollectTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): CollectTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): CollectTopK = copy(child = newChild)
    override def prettyName: String = "graft_collect_topk"
  }

  /** Column wrapper for [[CollectTopK]]. */
  def collectTopK(e: Column, k: Int): Column =
    exprColumn(CollectTopK(columnExpr(e), k).toAggregateExpression())

  /** Fixed-width histogram aggregate: counts of an integer bin column
    * (values MUST lie in [0, bins) — out-of-range fails loudly, never
    * silently misbins) into one `long[bins]` buffer per group. State is
    * FIXED-SIZE and mergeable (element-wise sum), partial-aggregating
    * map-side — the [[graft.operators.Sketches]] register pattern applied
    * to histograms, so a per-group histogram costs ONE hash aggregate
    * whose exchange carries G arrays, not a (group, bin) pre-aggregation
    * plus a second collect shuffle. Null bins are skipped (the histogram
    * of the non-null values). Serves [[graft.operators.Profile]]'s
    * sort-free exact quantiles; the output array is positional (index =
    * bin), ready for an in-row cumulative walk.
    */
  case class BinCounts(child: Expression, bins: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate
        .TypedImperativeAggregate[Array[Long]]
      with UnaryLike[Expression] {
    require(bins >= 2 && bins <= (1 << 20),
      s"bins must be in [2, 2^20], got $bins")

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_bin_counts"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](bins)

    override def update(buffer: Array[Long],
        input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val i = v.asInstanceOf[Long]
        require(i >= 0 && i < bins,
          s"bin $i out of [0, $bins) — caller's bin expression is broken")
        buffer(i.toInt) += 1L
      }
      buffer
    }

    override def merge(buffer: Array[Long],
        other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bins) { buffer(i) += other(i); i += 1 }
      buffer
    }

    override def eval(buffer: Array[Long]): Any =
      new GenericArrayData(buffer)

    override def serialize(buffer: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(bins * 8)
      bb.asLongBuffer().put(buffer)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val out = new Array[Long](bins)
      java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
      out
    }

    override def withNewMutableAggBufferOffset(
        newOffset: Int): BinCounts =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): BinCounts =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): BinCounts = copy(child = newChild)
  }

  /** Column wrapper for [[BinCounts]]. */
  def binCounts(bin: Column, bins: Int): Column =
    exprColumn(BinCounts(columnExpr(bin), bins).toAggregateExpression())

  /** One-pass HyperLogLog register summary over a 64-bit HASH column —
    * [[graft.operators.Sketches.hllDistinct]]'s register geometry
    * (top p bits pick one of 2^p registers, register keeps max
    * rank = 64−p+1 − bitlength of the suffix) held as a FIXED int
    * array per group, map-side combining by per-register max. `eval`
    * finishes the register walk inside the aggregate: it emits
    * (v_empty, tp) where tp = Σ_j 2^(64−p+1 − M_j) is the EXACT
    * integer harmonic sum (empty registers contribute 2^(64−p+1)),
    * computed in BigInteger and returned as DECIMAL(38,0) — the same
    * FP-determinism contract as hllDistinct: the only floating-point
    * op left to the caller is the final one-shot division (and the
    * linear-counting ln, absorbed by rounding to a whole count).
    *
    * This is the single-aggregation form of the two-level
    * groupBy(scope, register) SQL composition: per-group state is 2^p
    * ints regardless of value cardinality, so a profile over any
    * number of rows shuffles ONE buffer per (group × map partition).
    * Null hashes are skipped (callers route null VALUES around the
    * sketch and count them separately).
    */
  case class HllSummary(child: Expression, p: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate
        .TypedImperativeAggregate[Array[Int]]
      with UnaryLike[Expression] {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    private val m = 1 << p
    private val sw = 64 - p
    private val mask = (1L << sw) - 1

    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("v_empty",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("tp",
          org.apache.spark.sql.types.DecimalType(38, 0), nullable = false)))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_hll_summary"

    override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

    override def update(buffer: Array[Int],
        input: InternalRow): Array[Int] = {
      val h = child.eval(input)
      if (h != null) {
        val hash = h.asInstanceOf[Long]
        val bucket = (hash >>> sw).toInt
        val v = hash & mask
        val rho =
          if (v == 0L) sw + 1
          else sw + 1 - (64 - java.lang.Long.numberOfLeadingZeros(v))
        if (rho > buffer(bucket)) buffer(bucket) = rho
      }
      buffer
    }

    override def merge(buffer: Array[Int],
        other: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) {
        if (other(i) > buffer(i)) buffer(i) = other(i)
        i += 1
      }
      buffer
    }

    override def eval(buffer: Array[Int]): Any = {
      var empty = 0L
      var tp = java.math.BigInteger.ZERO
      var i = 0
      while (i < m) {
        val r = buffer(i)
        if (r == 0) empty += 1L
        tp = tp.add(java.math.BigInteger.ONE.shiftLeft(sw + 1 - r))
        i += 1
      }
      InternalRow(empty,
        org.apache.spark.sql.types.Decimal(BigDecimal(tp), 38, 0))
    }

    override def serialize(buffer: Array[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(m * 4)
      bb.asIntBuffer().put(buffer)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Int] = {
      val out = new Array[Int](m)
      java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
      out
    }

    override def withNewMutableAggBufferOffset(
        newOffset: Int): HllSummary =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): HllSummary =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): HllSummary = copy(child = newChild)
  }

  /** Column wrapper for [[HllSummary]]. */
  def hllSummary(hash: Column, p: Int): Column =
    exprColumn(HllSummary(columnExpr(hash), p).toAggregateExpression())
}
