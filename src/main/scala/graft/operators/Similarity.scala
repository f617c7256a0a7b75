package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextAnalysis.mix64

/** Approximate nearest-neighbor search over embedding columns.
  *
  * Brute force (exact, O(Q*N)) is the correctness baseline; the scale path is
  * random-hyperplane LSH: a narrow map computes a small bucket id per vector,
  * the join runs bucket-to-bucket (with optional multi-probe), and only
  * candidates get exact cosine. At 100 TB the bucketed variant replaces the
  * cross join with an equi-join whose build side partitions by bucket.
  */
object Similarity {

  /** dot(a, b) over float array columns, accumulated in double (codegen'd
    * higher-order functions, no UDF). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** Cosine via the native codegen'd expression (graft.functions
    * .CosineSimilarity) — bitwise-equal to the HOF formulation but with no
    * per-row array allocation. Callers must have run
    * [[graft.functions.GraftFunctions.register]] on the session (all
    * Similarity entry points do). */
  def cosineCol(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * queries/base: (id, vec). */
  def bruteForceKnn(queries: DataFrame, base: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
    val b = base.select(col("id").as("nid"), col("vec").as("nv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    q.join(b, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineCol(col("qv"), col("nv")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  // ---------------- random-hyperplane LSH ----------------

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  @inline private def planeComponent(plane: Int, dim: Int): Double = {
    // map a mixed 64-bit hash to (-1, 1)
    mix64(plane.toLong << 32 | dim.toLong).toDouble / Long.MaxValue.toDouble
  }

  /** Sign-pattern bucket of a vector under `planes` random hyperplanes. */
  def hyperplaneBucket(vec: Array[Float], planes: Int): Int = {
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * planeComponent(p, d); d += 1 }
      if (dot > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Buckets with multi-probe: the exact bucket plus all single-bit flips
    * (catches neighbors that fall just across one hyperplane). */
  def probeBuckets(vec: Array[Float], planes: Int): Array[Int] = {
    val b = hyperplaneBucket(vec, planes)
    val out = new Array[Int](planes + 1)
    out(0) = b
    var p = 0
    while (p < planes) { out(p + 1) = b ^ (1 << p); p += 1 }
    out
  }

  /** ANN top-k: bucket the base once, probe each query's adjacent buckets,
    * exact cosine only within candidate buckets. vectors: (id, vec). */
  def lshKnn(queries: Dataset[(Long, Array[Float])],
      base: Dataset[(Long, Array[Float])], k: Int, planes: Int = 12): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val baseB = base.map { case (id, v) =>
      (hyperplaneBucket(v, planes), id, v)
    }.toDF("bucket", "nid", "nv")
    val queryB = queries.flatMap { case (id, v) =>
      probeBuckets(v, planes).iterator.map(b => (b, id, v))
    }.toDF("bucket", "qid", "qv")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    queryB.join(baseB, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineCol(col("qv"), col("nv")).as("sim"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** IVF top-k: a k-means coarse quantizer (Spark ML, trained on a sample)
    * partitions the base into cells; queries probe the nProbe nearest
    * centroids and run exact cosine only inside those cells. The alternative
    * scale path to hyperplane LSH: recall tunes with nProbe, and the cell
    * assignment is one narrow pass over the base. */
  def ivfKnn(queries: Dataset[(Long, Array[Float])],
      base: Dataset[(Long, Array[Float])], k: Int, nCells: Int = 16,
      nProbe: Int = 3, sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors

    val train = (if (sampleFraction < 1.0)
      base.sample(withReplacement = false, sampleFraction, seed) else base)
      .map { case (_, v) => Tuple1(Vectors.dense(v.map(_.toDouble))) }
      .toDF("features")
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    def nearestCells(v: Array[Float], n: Int): Array[Int] = {
      val cs = bcCentroids.value
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        (c, d)
      }.sortBy(_._2).take(n).map(_._1).toArray
    }

    val baseCells = base.map { case (id, v) => (nearestCells(v, 1)(0), id, v) }
      .toDF("cell", "nid", "nv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queryCells = queries.flatMap { case (id, v) =>
      nearestCells(v, nProbe).iterator.map(c => (c, id, v))
    }.toDF("cell", "qid", "qv")

    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    queryCells.join(baseCells, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineCol(col("qv"), col("nv")).as("sim"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** All pairs above a cosine threshold via LSH buckets (near-dup detection
    * for embeddings). Buckets larger than `maxBucket` are dropped
    * ([[Dedup.capBuckets]]): embedding mass concentrated on one side of all
    * hyperplanes (e.g. near-zero vectors) would otherwise pair
    * quadratically. */
  def cosineDedup(vectors: Dataset[(Long, Array[Float])], threshold: Double,
      planes: Int = 12, maxBucket: Int = Dedup.DEFAULT_MAX_BUCKET): DataFrame = {
    val spark = vectors.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val banded0 = vectors.flatMap { case (id, v) =>
      probeBuckets(v, planes).iterator.map(b => (b, id, v))
    }.toDF("bucket", "id", "vec")
    // persist the capped result: window evaluated once, both sides share it
    val banded = Dedup.capBuckets(banded0, Seq("bucket"), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, expr("a.bucket = b.bucket AND a.id < b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineCol(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }
}
