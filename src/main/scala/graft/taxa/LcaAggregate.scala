package graft.taxa

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Codegen'd pairwise LCA over the broadcast taxonomy — the update/merge
  * kernel of [[LcaAggregate]]. Inputs and output are taxon ids;
  * `Taxonomy.NONE` is the fold identity (see [[Taxonomy.lca]]). The
  * broadcast handle rides the expression tree exactly as it rode the old
  * imperative aggregate; generated code resolves it ONCE per task into an
  * instance field, so the per-row cost is the parent-array ascent alone. */
case class Lca2(left: Expression, right: Expression, bcTax: Broadcast[Taxonomy])
    extends BinaryExpression {

  @transient private lazy val tax = bcTax.value

  override def nullable: Boolean = left.nullable || right.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "taxon_lca"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    tax.lca(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcTax", bcTax,
      classOf[Broadcast[Taxonomy]].getName)
    val taxCls = classOf[Taxonomy].getName
    val taxField = ctx.addMutableState(taxCls, "lcaTaxonomy",
      v => s"$v = ($taxCls)$bcRef.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $taxField.lca($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native LCA aggregate as a DeclarativeAggregate over a fixed-width Int
  * buffer (r21 optimization; guide §4 "prefer DeclarativeAggregate").
  *
  * The r20-and-earlier form was a TypedImperativeAggregate — correct, but
  * any TypedImperativeAggregate forces the whole aggregation into
  * ObjectHashAggregateExec, which abandons its hash map after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128!) distinct keys and re-processes the remaining input through an
  * UnsafeKVExternalSorter. Every index-build LCA fold has millions of
  * distinct minimizer keys per task, so every fold paid a full sort +
  * per-row buffer serialization it never needed — measured r21 as the
  * dominant memory-traffic source of the g-lane record folds (and the
  * path most amplified by host memory-bus contention: same-stage reps
  * swung 1.4 s → 62 s inside one JVM).
  *
  * As a DeclarativeAggregate the buffer is one Int slot in the standard
  * UnsafeRow hash map (HashAggregateExec, whole-stage codegen, graceful
  * spill), and update/merge are the codegen'd [[Lca2]] kernel. Algebra
  * unchanged: zero = NONE, merge = LCA — associative and commutative, so
  * map-side partial aggregation applies exactly as before and every fold
  * result is bit-identical.
  */
case class LcaAggregate(child: Expression, bcTax: Broadcast[Taxonomy])
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lca_agg"

  private lazy val lca = AttributeReference("lca", IntegerType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(lca)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Taxonomy.NONE))

  // null inputs keep the buffer (the old imperative update's `if (v == null)
  // buffer` arm); non-null inputs fold through the codegen'd LCA kernel
  override lazy val updateExpressions: Seq[Expression] =
    if (child.nullable)
      Seq(If(IsNull(child), lca, Lca2(lca, child, bcTax)))
    else Seq(Lca2(lca, child, bcTax))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Lca2(lca.left, lca.right, bcTax))

  override lazy val evaluateExpression: Expression = lca

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
