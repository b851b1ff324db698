package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (Array[Float]) — the
  * engine behind the reference's VectorIndexStore.nearest_n_to
  * (aligned/feature_store.py:1734-1798; sources/lancedb.py:158-215 loops
  * per-row against LanceDB — here it is one distributed plan).
  *
  * Baseline: brute-force cosine top-k (exact, O(n·q), fine when one side
  * broadcasts). Scale path: IVF-style coarse quantization — assign every
  * vector to its nearest of `nlist` centroids, search only `nprobe` inverted
  * lists per query, so the join key is the centroid id and the shuffle is
  * bucket-local instead of a cross join.
  */
object Similarity {

  /** dot(a, b) — native single-pass kernel (graft.functions.VecDot); the
    * Column-function formulation (`aggregate(zip_with(...))`, like the
    * reference's ListDotProduct, transformation.py:3114-3166) is interpreted
    * per element and ~100× slower in pairwise joins. */
  def dot(a: Column, b: Column): Column = graft.functions.Native.dotProduct(a, b)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) = dot / (sqrt(Σa²)·sqrt(Σb²)), sequential accumulation —
    * native kernel, 0.0 on zero norms. */
  def cosine(a: Column, b: Column): Column = graft.functions.Native.cosineSim(a, b)

  /** Exact brute-force top-k: for each query row, the k nearest corpus rows by
    * cosine. The corpus×queries product is bounded by broadcasting the
    * (small) query side; ranking partitions by query id. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      corpusVec: String = "embedding", queryVec: String = "embedding",
      corpusId: String = "vec_id", queryId: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qvec")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cvec"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qvec"), col("__cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Distributed Lloyd k-means over an embedding column: `iters` rounds of
    * assign-to-nearest (broadcast centroids) + elementwise-mean recompute
    * (posexplode → groupBy(centroid, dim) → avg — fully distributed, no
    * driver-side vectors beyond the k centroids themselves). Deterministic:
    * init = hash-ordered pick of k corpus vectors. Returns (centroid_id,
    * cvec). */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    // the init + every Lloyd round rescans the corpus projection — pin it in
    // memory for the duration (k+iters small jobs over the same data)
    val base = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .persist()
    // deterministic farthest-point init (k-means++ flavour): random seeds can
    // land two in one cluster, which plain Lloyd never recovers from. Each
    // round is one distributed min-similarity scan; only k vectors ever reach
    // the driver.
    val first = base.orderBy(xxhash64(col("cid")), col("cid")).limit(1)
      .select("cvec").collect()(0).getSeq[Double](0)
    var chosen = Vector(first)
    while (chosen.size < k) {
      val chosenArr = typedlit(chosen.map(_.toArray))
      val next = base
        .withColumn("__minSim", aggregate(chosenArr, lit(-2.0),
          (best, cv) => greatest(best, cosine(col("cvec"), cv))))
        .orderBy(col("__minSim").asc, col("cid").asc)
        .limit(1).select("cvec").collect()(0).getSeq[Double](0)
      chosen = chosen :+ next
    }
    import spark.implicits._
    var centroids = chosen.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("centroid_id", "cvec")
    var i = 0
    while (i < iters) {
      val cb = broadcast(centroids.withColumnRenamed("cvec", "__cv"))
      val assigned = base
        .crossJoin(cb)
        .withColumn("__d", cosine(col("cvec"), col("__cv")))
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("cid")).orderBy(col("__d").desc, col("centroid_id"))))
        .filter(col("__r") === 1)
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("cvec")))
        .groupBy("centroid_id", "pos").agg(avg(col("col").cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("cvec"))
      i += 1
    }
    val out = centroids.collect() // materialize before unpersisting the input
    base.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(out.toIndexedSeq), centroids.schema)
  }

  /** IVF approximate nearest neighbours: coarse-quantize the corpus into
    * `nlist` inverted lists (k-means centroids, `kmeansIters` Lloyd rounds —
    * 0 keeps the deterministic hash-picked seeds); each query probes its
    * `nprobe` nearest lists and ranks only those. Join key = centroid id →
    * the shuffle is inverted-list-local, never a full cross join. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 2,
      corpusVec: String = "embedding", queryVec: String = "embedding",
      corpusId: String = "vec_id", queryId: String = "vec_id"): DataFrame = {
    val centroids = kmeansCentroids(corpus, corpusVec, corpusId, nlist, kmeansIters)
    val cb = broadcast(centroids)

    def nearestCentroids(df: DataFrame, vec: String, n: Int): DataFrame = {
      val scored = df.crossJoin(cb).withColumn("__cd", cosine(col(vec), col("cvec")))
      val w = Window.partitionBy(col("__pk")).orderBy(col("__cd").desc)
      scored.withColumn("__cr", row_number().over(w)).filter(col("__cr") <= n)
        .drop("cvec", "__cd", "__cr")
    }

    val assigned = nearestCentroids(
      corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cvec"),
        col(corpusId).as("__pk")), "__cvec", 1).drop("__pk")
    val probed = nearestCentroids(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("__qvec"),
        col(queryId).as("__pk")), "__qvec", nprobe).drop("__pk")

    val scored = assigned.join(probed, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qvec"), col("__cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Explode an embedding column into scalar columns (UnpackEmbedding,
    * retrieval_job.py:3296-3320). */
  def unpackEmbedding(df: DataFrame, vecCol: String, dims: Int, prefix: String = "dim_"): DataFrame =
    (0 until dims).foldLeft(df)((d, i) => d.withColumn(s"$prefix$i", element_at(col(vecCol), i + 1)))
}
