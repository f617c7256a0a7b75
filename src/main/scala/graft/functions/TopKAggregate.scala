package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k as a native aggregate: folds struct rows into a k-capped
  * heap per group, ordered lexicographically by the struct's leading
  * `sortDesc.length` fields (true = descending). The scale story is the
  * point: `groupBy(key).agg(topk(...))` runs as a partial aggregation —
  * every map task keeps at most k rows per group and the final merge folds
  * k-sized heaps — so a "top k per group" never sorts a whole group in one
  * task, unlike `row_number().over(Window.partitionBy(key))`, which puts
  * ALL rows of a key through a single-task sort (the classic skew killer
  * when one group holds a large fraction of a 100 TB corpus).
  *
  * Ties: callers must make the sort prefix a TOTAL order over the group's
  * rows (add a unique tie-break column), exactly as a deterministic
  * `row_number` window would need.
  */
case class TopKAggregate(
    child: Expression,
    k: Int,
    sortDesc: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(structType)

  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    structType.fields.take(sortDesc.length)
      .map(f => TypeUtils.getInterpretedOrdering(f.dataType))

  /** Lexicographic compare over the sort prefix; < 0 means a ranks first. */
  private def cmp(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < sortDesc.length) {
      val dt = structType(i).dataType
      val av = a.get(i, dt)
      val bv = b.get(i, dt)
      val c =
        if (av == null && bv == null) 0
        else if (av == null) -1
        else if (bv == null) 1
        else fieldOrds(i).compare(av, bv)
      if (c != 0) return if (sortDesc(i)) -c else c
      i += 1
    }
    0
  }

  // heap keeps the WORST retained row on top so a full heap evicts in O(log k)
  @transient private lazy val worstFirst: java.util.Comparator[UnsafeRow] =
    (a: UnsafeRow, b: UnsafeRow) => cmp(b, a)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k + 1, worstFirst)

  private def offer(buf: java.util.PriorityQueue[UnsafeRow],
      row: UnsafeRow): Unit = {
    if (buf.size < k) buf.add(row)
    else if (cmp(row, buf.peek()) < 0) { buf.poll(); buf.add(row) }
  }

  override def update(buf: java.util.PriorityQueue[UnsafeRow],
      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      // UnsafeProjection reuses its result row and parquet readers reuse
      // string buffers — copy() makes the retained row self-contained
      offer(buf, proj(v.asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[UnsafeRow],
      b2: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = new Array[UnsafeRow](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, (a: UnsafeRow, b: UnsafeRow) => cmp(a, b))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    var total = 4
    val it0 = buf.iterator()
    while (it0.hasNext) total += 4 + it0.next().getSizeInBytes
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val r = it.next()
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = bb.getInt
      val rowBytes = new Array[Byte](size)
      bb.get(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, size)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object TopKAggregate {
  /** Register `name`(structCol) keeping the top `k` rows ordered by the
    * struct's first `desc.length` fields (true = descending). */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int,
      desc: Seq[Boolean], name: String): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => TopKAggregate(es.head, k, desc).toAggregateExpression(),
      "built-in")

  def topK(name: String, c: Column): Column = call_function(name, c)
}
