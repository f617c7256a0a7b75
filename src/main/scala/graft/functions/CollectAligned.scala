package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Row-aligned multi-column collect as ONE native aggregate.
  *
  * `collect_aligned(c1, ..., cn)` returns a struct of n parallel primitive
  * arrays where index i of every array came from the SAME input row — the
  * alignment is structural (one buffer, one append per row), not an
  * artifact of Spark's undocumented "all aggregates in a groupBy consume
  * rows in the same order" behavior that parallel `collect_list` columns
  * lean on. This replaces the r16 collect_list pairs in `Bracken.weights`
  * and `IndexOps.classifyReport` (the boxed `Seq[(Long,...)]` struct
  * decode they avoided stays avoided: each emitted field is an
  * `UnsafeArrayData.fromPrimitiveArray`, so the Dataset decode to
  * `Array[Long]`/`Array[Int]` is a memcopy).
  *
  * Null inputs are a hard error: `collect_list` silently DROPS nulls,
  * which is exactly how parallel collects mis-align — callers must
  * coalesce upstream (both call sites do), and a nullable column slipping
  * in fails loudly here instead of mis-pairing keys with taxa.
  *
  * Columns must be IntegerType or LongType; ints are buffered and
  * shuffled at 4 bytes (the partial-aggregation payload matters — the r16
  * bracken fix was exactly a shuffle-payload diet).
  */
case class CollectAligned(
    children: Seq[Expression],
    fieldNames: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CollectAligned.Buffer] {

  require(children.nonEmpty && children.size == fieldNames.size,
    s"collect_aligned arity ${children.size} != ${fieldNames.size} field names")

  private def isLong: Array[Boolean] = children.map(_.dataType match {
    case LongType => true
    case IntegerType => false
    case other => throw new IllegalArgumentException(
      s"collect_aligned supports int/long columns only, got $other")
  }).toArray

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(
    fieldNames.zip(isLong).map { case (n, l) =>
      StructField(n, ArrayType(if (l) LongType else IntegerType,
        containsNull = false), nullable = false)
    })

  override def createAggregationBuffer(): CollectAligned.Buffer =
    new CollectAligned.Buffer(isLong)

  override def update(buf: CollectAligned.Buffer, input: InternalRow)
      : CollectAligned.Buffer = {
    buf.ensure(buf.size + 1)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null)
        throw new IllegalStateException(
          s"collect_aligned: null in column '${fieldNames(i)}' — coalesce " +
            "upstream; a silent drop would mis-align the parallel arrays")
      if (buf.isLong(i)) buf.longCols(i)(buf.size) = v.asInstanceOf[Long]
      else buf.intCols(i)(buf.size) = v.asInstanceOf[Int]
      i += 1
    }
    buf.size += 1
    buf
  }

  override def merge(b1: CollectAligned.Buffer, b2: CollectAligned.Buffer)
      : CollectAligned.Buffer = {
    b1.ensure(b1.size + b2.size)
    var i = 0
    while (i < b1.isLong.length) {
      if (b1.isLong(i))
        System.arraycopy(b2.longCols(i), 0, b1.longCols(i), b1.size, b2.size)
      else
        System.arraycopy(b2.intCols(i), 0, b1.intCols(i), b1.size, b2.size)
      i += 1
    }
    b1.size += b2.size
    b1
  }

  override def eval(buf: CollectAligned.Buffer): Any = {
    val fields = new Array[Any](buf.isLong.length)
    var i = 0
    while (i < buf.isLong.length) {
      fields(i) =
        if (buf.isLong(i))
          UnsafeArrayData.fromPrimitiveArray(
            java.util.Arrays.copyOf(buf.longCols(i), buf.size))
        else
          UnsafeArrayData.fromPrimitiveArray(
            java.util.Arrays.copyOf(buf.intCols(i), buf.size))
      i += 1
    }
    new GenericInternalRow(fields)
  }

  override def serialize(buf: CollectAligned.Buffer): Array[Byte] = {
    val bytes =
      CollectAligned.checkedSerializedBytes(buf.size, buf.isLong, fieldNames)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.isLong.length) {
      var j = 0
      if (buf.isLong(i)) while (j < buf.size) { bb.putLong(buf.longCols(i)(j)); j += 1 }
      else while (j < buf.size) { bb.putInt(buf.intCols(i)(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectAligned.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new CollectAligned.Buffer(isLong)
    buf.ensure(n)
    var i = 0
    while (i < buf.isLong.length) {
      var j = 0
      if (buf.isLong(i)) while (j < n) { buf.longCols(i)(j) = bb.getLong(); j += 1 }
      else while (j < n) { buf.intCols(i)(j) = bb.getInt(); j += 1 }
      i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectAligned =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CollectAligned =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object CollectAligned {

  /** Serialized size of a `size`-row buffer, computed in Long space. A
    * degenerate group (one hot title from malformed input) past ~2^31
    * buffer bytes used to overflow the Int math and die inside
    * `ByteBuffer.allocate` with an undiagnosable negative-size error —
    * now it fails with a message naming the aggregate and its columns
    * (ADVICE r17). collect_list dies at the same scale, just opaquely. */
  private[functions] def checkedSerializedBytes(size: Int,
      isLong: Array[Boolean], fieldNames: Seq[String]): Int = {
    var bytes = 4L
    var i = 0
    while (i < isLong.length) {
      bytes += size.toLong * (if (isLong(i)) 8L else 4L); i += 1
    }
    if (bytes > Int.MaxValue)
      throw new IllegalStateException(
        s"collect_aligned group exceeds 2GB serialized ($bytes bytes, " +
          s"$size rows over columns ${fieldNames.mkString(", ")}) — a " +
          "group this hot needs pre-aggregation or a key salt upstream")
    bytes.toInt
  }

  /** Parallel growable primitive columns sharing one size — the alignment
    * invariant is that every append writes ALL columns at the same index. */
  final class Buffer(val isLong: Array[Boolean]) {
    var size: Int = 0
    private var cap: Int = 0
    var longCols: Array[Array[Long]] =
      isLong.map(l => if (l) Array.emptyLongArray else null)
    var intCols: Array[Array[Int]] =
      isLong.map(l => if (l) null else Array.emptyIntArray)

    def ensure(n: Int): Unit = if (n > cap) {
      val newCap = math.max(n, math.max(16, cap * 2))
      var i = 0
      while (i < isLong.length) {
        if (isLong(i)) longCols(i) = java.util.Arrays.copyOf(longCols(i), newCap)
        else intCols(i) = java.util.Arrays.copyOf(intCols(i), newCap)
        i += 1
      }
      cap = newCap
    }
  }

  /** Register a session function for a given output field naming; the
    * column types are taken from the call-site expressions. Idempotent per
    * name set (same pattern as [[graft.taxa.LcaAggregate.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession,
      fieldNames: Seq[String]): String = {
    val name = s"collect_aligned_${fieldNames.mkString("_")}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => CollectAligned(es, fieldNames).toAggregateExpression(),
      "built-in")
    name
  }

  def apply(name: String, cols: Column*): Column = call_function(name, cols: _*)
}
