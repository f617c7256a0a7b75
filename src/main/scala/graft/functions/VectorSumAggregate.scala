package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of fixed-width long vectors as a native aggregate: the
  * centroid-update half of distributed Lloyd's iterations. `groupBy(cluster)
  * .agg(vec_sum(qv))` runs with partial (map-side) aggregation — every map
  * task folds its rows into one `dim`-long buffer per cluster, so the shuffle
  * carries at most k·dim longs per task regardless of input size. The
  * alternative (posexplode to (cluster, pos, value) rows) amplifies the
  * shuffle input dim-fold before the partial agg can see it.
  *
  * Exactness is the point of summing longs: integer addition is associative,
  * so the merge order Spark picks cannot perturb the result — the property
  * the deterministic k-means in [[graft.operators.Clustering]] is built on.
  *
  * Since r21 the Lloyd's training rounds run as treeAggregate jobs
  * ([[graft.operators.Clustering.kmeansCentroids]]) and no production path
  * calls this aggregate; it is retained as a tested reference kernel for
  * the DataFrame formulation (VectorSumAggregateSpec) and as the sparse
  * per-occupied-cluster alternative should a huge-k regime outgrow the
  * treeAggregate's dense per-task accumulator (see the note there).
  */
case class VectorSumAggregate(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vec_sum(dim=$dim) got a ${arr.numElements()}-element vector")
      var i = 0
      while (i < dim) {
        buffer(i) += arr.getLong(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) {
      b1(i) += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object VectorSumAggregate {
  /** Register vec_sum(longArrayCol) with a fixed vector width. */
  def register(spark: org.apache.spark.sql.SparkSession, dim: Int,
      name: String = "vec_sum"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => VectorSumAggregate(es.head, dim).toAggregateExpression(),
      "built-in")

  def vecSum(c: Column): Column = call_function("vec_sum", c)
}
