package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom filter over 64-bit key hashes, as a native aggregate plus a
  * codegen'd membership test.
  *
  * The scale pattern this enables: when a blocklist/eval set is too large to
  * broadcast as an exact hash relation but its Bloom filter fits comfortably
  * in executor memory (~1.2 bytes per key at 1% fp), a huge probe side can be
  * prefiltered locally — no shuffle — so only the (true hits + fp) sliver
  * reaches the exact confirm join. Bloom filters have NO false negatives, so
  * a bloom-prefilter + exact-confirm pipeline returns exactly the result of
  * the plain join; the filter is purely a physical optimization. (Spark's
  * own runtime row-level filtering injects the same shape for some shuffle
  * joins; materializing it explicitly makes the prefilter guaranteed, keyed
  * on the aggregated DISTINCT set, and reusable across queries.)
  *
  * Probes use Kirsch–Mitzenmacher double hashing: index_i = h + i·h2 with
  * h2 = mix64(h) | 1, masked to 2^logm bits — one multiply-free loop per key.
  */
object BloomKernels {

  /** Buffer word count for a 2^logm-bit filter. */
  def words(logm: Int): Int = 1 << (logm - 6)

  def insert(bits: Array[Long], h: Long, k: Int, logm: Int): Unit = {
    val mask = (1L << logm) - 1
    val h2 = TextAnalysis.mix64(h) | 1L
    var i = 0
    var x = h
    while (i < k) {
      val idx = x & mask
      bits((idx >>> 6).toInt) |= 1L << (idx & 63)
      x += h2
      i += 1
    }
  }

  /** Membership probe against an array<bigint> column (one static call per
    * row from generated code; early-outs on the first clear bit). */
  def contains(bits: ArrayData, h: Long, k: Int, logm: Int): Boolean = {
    val mask = (1L << logm) - 1
    val h2 = TextAnalysis.mix64(h) | 1L
    var i = 0
    var x = h
    while (i < k) {
      val idx = x & mask
      if ((bits.getLong((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L)
        return false
      x += h2
      i += 1
    }
    true
  }
}

/** bloom_agg(h64) -> array<bigint>: fold 64-bit key hashes into one
  * 2^logm-bit filter per group. Merge is word-wise OR, so map-side partial
  * aggregation applies and the shuffle carries one fixed-size bitset per
  * task regardless of input size. */
case class BloomFilterAggregate(
    child: Expression,
    logm: Int,
    numProbes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(logm >= 6 && logm <= 30, s"logm out of range: $logm")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomKernels.words(logm))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomKernels.insert(buffer, v.asInstanceOf[Long], numProbes, logm)
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** bloom_contains(bits, h64) -> boolean, codegen'd: whole-stage codegen
  * emits a single static probe call per row; `bits` is typically a Literal
  * array riding the plan (the collected filter), so no join or broadcast
  * variable is involved at all. */
case class BloomContains(left: Expression, right: Expression,
    numProbes: Int, logm: Int) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bits: Any, h: Any): Any =
    BloomKernels.contains(bits.asInstanceOf[ArrayData],
      h.asInstanceOf[Long], numProbes, logm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bits, h) =>
      s"graft.functions.BloomKernels.contains($bits, $h, $numProbes, $logm)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object BloomFilterAggregate {
  /** Register bloom_agg(h64) and bloom_contains(bits, h64) with fixed
    * geometry (2^logm bits, numProbes probes). */
  def register(spark: SparkSession, logm: Int = 20, numProbes: Int = 5): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      es => BloomFilterAggregate(Cast(es.head, LongType), logm, numProbes)
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      es => BloomContains(Cast(es(0), ArrayType(LongType)),
        Cast(es(1), LongType), numProbes, logm),
      "built-in")
  }

  def bloomAgg(c: Column): Column = call_function("bloom_agg", c)

  def bloomContains(bits: Column, h: Column): Column =
    call_function("bloom_contains", bits, h)
}
