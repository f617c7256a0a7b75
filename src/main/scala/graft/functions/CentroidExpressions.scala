package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Static kernels for centroid assignment against a BROADCAST integer
  * centroid matrix (`Array[Array[Long]]`, k rows of dim milli-quantized
  * components — the [[graft.operators.Clustering]] representation).
  *
  * Rationale (r10 verdict): the previous argmin formulation embedded every
  * centroid as a `typedlit` plan literal inside an `array_min` over k
  * structs — plan size and generated code grew linearly in k·dim, which is
  * fine at k=8 but a structural blocker at SemDeDup-regime k (~10^4-10^5
  * at 100 TB: millions of literals, Catalyst analysis blowup, codegen past
  * the 64 KB method limit). Here the matrix rides an ordinary Spark
  * broadcast (torrent-distributed once per executor, NOT per task closure)
  * and the plan carries ONE expression node regardless of k.
  *
  * Semantics are identical to the literal formulation: exact long
  * arithmetic, argmin by (distance, cluster-index) — smallest distance,
  * then smallest index — so the c01-c04 DuckDB oracles are byte-identical.
  */
object CentroidKernels {

  /** Argmin over centroids: (squared L2 distance, cluster index) as an
    * InternalRow(dist: Long, cluster: Long). Ties keep the SMALLEST
    * cluster index (first strict improvement wins). Partial-distance
    * pruning: the inner loop aborts as soon as the running sum reaches the
    * best-so-far — distances only grow, so an aborted candidate can never
    * win, and ties resolve to the earlier index exactly as struct-min
    * (dist, cid) did. */
  def argmin(qv: ArrayData, cents: Array[Array[Long]]): InternalRow = {
    var bestD = Long.MaxValue
    var bestC = 0L
    var c = 0
    while (c < cents.length) {
      val m = cents(c)
      val n = math.min(qv.numElements(), m.length)
      var s = 0L
      var i = 0
      while (i < n && s < bestD) {
        val d = qv.getLong(i) - m(i)
        s += d * d
        i += 1
      }
      if (i == n && s < bestD) { bestD = s; bestC = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  /** [[argmin]] over a plain long array, returning only the cluster index —
    * the executor-side kernel of the k-means treeAggregate round
    * ([[graft.operators.Clustering.kmeansCentroids]]). Same exact long
    * arithmetic, same partial-distance pruning, same (distance, index)
    * tie-break, so the RDD loop and the Catalyst expression assign
    * identically. */
  def argminIdx(qv: Array[Long], cents: Array[Array[Long]]): Int = {
    var bestD = Long.MaxValue
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val m = cents(c)
      val n = math.min(qv.length, m.length)
      var s = 0L
      var i = 0
      while (i < n && s < bestD) {
        val d = qv(i) - m(i)
        s += d * d
        i += 1
      }
      if (i == n && s < bestD) { bestD = s; bestC = c }
      c += 1
    }
    bestC
  }

  /** The `n` nearest centroid indices ordered by (distance, index) — the
    * IVF probe list. Returns array<long> of cluster ids. */
  def nearest(qv: ArrayData, cents: Array[Array[Long]], n: Int): ArrayData = {
    val k = cents.length
    val dists = new Array[Long](k)
    var c = 0
    while (c < k) {
      val m = cents(c)
      val lim = math.min(qv.numElements(), m.length)
      var s = 0L
      var i = 0
      while (i < lim) { val d = qv.getLong(i) - m(i); s += d * d; i += 1 }
      dists(c) = s
      c += 1
    }
    val order = Array.range(0, k)
      .sortBy(i => (dists(i), i))
      .take(math.min(n, k))
      .map(_.toLong)
    new GenericArrayData(order)
  }
}

/** Native codegen'd argmin over a broadcast centroid matrix: returns
  * struct(dist: bigint, cluster: bigint) — smallest exact squared L2
  * distance, ties to the smallest cluster index. One plan node and one
  * static call per row for ANY k. */
case class ArgminCentroids(child: Expression,
    centroids: Broadcast[Array[Array[Long]]]) extends UnaryExpression {

  override def dataType: DataType = ArgminCentroids.Schema

  override protected def nullSafeEval(qv: Any): Any =
    CentroidKernels.argmin(qv.asInstanceOf[ArrayData], centroids.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Long]]]].getName)
    // dereference the broadcast once per codegen instance, not per row
    val cents = ctx.addMutableState("long[][]", "centroids",
      v => s"$v = (long[][]) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidKernels.argmin($c, $cents)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ArgminCentroids {
  val Schema: StructType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cluster", LongType, nullable = false)))
}

/** Native codegen'd n-nearest-centroids probe list over a broadcast
  * centroid matrix: array<bigint> of the `n` cluster ids nearest to the
  * quantized vector, ordered by (distance, index). The IVF query-side
  * multi-probe expansion. */
case class NearestCentroids(child: Expression,
    centroids: Broadcast[Array[Array[Long]]], n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(qv: Any): Any =
    CentroidKernels.nearest(qv.asInstanceOf[ArrayData], centroids.value, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Long]]]].getName)
    val cents = ctx.addMutableState("long[][]", "centroids",
      v => s"$v = (long[][]) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidKernels.nearest($c, $cents, $n)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
