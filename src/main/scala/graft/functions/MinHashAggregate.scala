package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash sketch as a native aggregate: folds a column of 64-bit shingle
  * hashes into a numHashes-wide signature per group — one aggregation pass
  * instead of collecting shingle sets. The merge is elementwise min, so
  * partial (map-side) aggregation applies, and signatures of unions are the
  * elementwise min of signatures — exactly the sketch property that makes
  * group-level similarity estimation cheap at corpus scale.
  */
case class MinHashAggregate(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  // flat long arrays: the update loop runs per (row, hash) — no tuple boxing
  @transient private lazy val paramsA: Array[Long] =
    Array.tabulate(numHashes)(i => TextAnalysis.mix64(2 * i + 1) | 1L)
  @transient private lazy val paramsB: Array[Long] =
    Array.tabulate(numHashes)(i => TextAnalysis.mix64(2 * i + 2))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = TextAnalysis.mix64(paramsA(i) * s + paramsB(i))
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MinHashAggregate {
  /** Register minhash_agg(shingleHash) with a fixed signature width. */
  def register(spark: org.apache.spark.sql.SparkSession,
      numHashes: Int = 64, name: String = "minhash_agg"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => MinHashAggregate(es.head, numHashes).toAggregateExpression(),
      "built-in")

  def minhashAgg(c: Column): Column = call_function("minhash_agg", c)

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def estimateSimilarity(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
