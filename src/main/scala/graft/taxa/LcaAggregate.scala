package graft.taxa

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native LCA aggregate as a TypedImperativeAggregate — the SURVEY §4/§7
  * optional upgrade over the Aggregator-based UDAF: the buffer is a bare Int
  * (no Encoder roundtrip per update), serialized as 4 bytes between partial
  * and final aggregation. Same algebra: zero = NONE, merge = LCA, so
  * map-side partial aggregation applies unchanged.
  */
case class LcaAggregate(
    child: Expression,
    bcTax: Broadcast[Taxonomy],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Int] {

  @transient private lazy val tax = bcTax.value

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType

  override def createAggregationBuffer(): Int = Taxonomy.NONE

  override def update(buffer: Int, input: InternalRow): Int = {
    val v = child.eval(input)
    if (v == null) buffer else tax.lca(buffer, v.asInstanceOf[Int])
  }

  override def merge(b1: Int, b2: Int): Int = tax.lca(b1, b2)

  override def eval(buffer: Int): Any = buffer

  override def serialize(buffer: Int): Array[Byte] = {
    val out = new Array[Byte](4)
    out(0) = (buffer >>> 24).toByte
    out(1) = (buffer >>> 16).toByte
    out(2) = (buffer >>> 8).toByte
    out(3) = buffer.toByte
    out
  }

  override def deserialize(bytes: Array[Byte]): Int =
    ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)

  override def withNewMutableAggBufferOffset(newOffset: Int): LcaAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): LcaAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object LcaAggregate {
  /** Column-level entry: registers a per-session function bound to the
    * broadcast taxonomy under a name UNIQUE to that broadcast (so two index
    * builds over different taxonomies in one session never race on a shared
    * binding) and returns the bound name. Re-registering the same broadcast
    * is idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession,
      bcTax: Broadcast[Taxonomy]): String = {
    val name = s"lca_agg_${bcTax.id}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => LcaAggregate(es.head, bcTax).toAggregateExpression(), "built-in")
    name
  }

  def lcaAgg(name: String, c: Column): Column = call_function(name, c)
}
