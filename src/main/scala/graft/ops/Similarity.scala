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

  /** Distributed Lloyd k-means over an embedding column, shaped for scale:
    *
    *  - **init**: deterministic farthest-point (k-means++ flavour — random
    *    seeds can land two in one cluster, which plain Lloyd never recovers
    *    from) over a fixed-size hash-ordered SAMPLE collected once; the
    *    k·sample·d flops run on the driver. One distributed job regardless
    *    of k (previously k sequential min-similarity scans of the corpus).
    *  - **each Lloyd round**: assignment is a narrow map via the
    *    [[graft.functions.Native.nearestCentroids]] kernel (centroids baked
    *    into the plan — no crossJoin, no rows×k shuffle), then the
    *    elementwise-mean recompute posexplodes to (centroid, dim) partial
    *    sums — the only shuffle, k·d rows after map-side combine.
    *
    * Deterministic throughout. Empty clusters drop (as before). Returns
    * (centroid_id, cvec: array<double>). */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 2, initSample: Int = 2048): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"))
    if (iters > 0) base.persist()
    val sample = base.orderBy(xxhash64(col("cid")), col("cid")).limit(initSample)
      .select("cvec").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "kmeans: empty corpus")
    // farthest-point init shared with the driver-side [[localKMeans]]
    // (iters = 0 returns exactly the chosen seeds) — ONE implementation so
    // the PQ codebooks and the coarse quantizer can never desynchronize
    var centroids: IndexedSeq[(Int, Array[Double])] =
      localKMeans(sample, k, iters = 0).zipWithIndex.map { case (v, i) => (i + 1, v) }
    var it = 0
    while (it < iters) {
      val assign = element_at(graft.functions.Native.nearestCentroids(
        col("cvec"), centroids.map(_._1), centroids.map(_._2.toSeq), 1), 1)
      // k·d partial means reach the driver — that IS the next centroid set
      val means = base.withColumn("centroid_id", assign)
        .select(col("centroid_id"), posexplode(col("cvec")))
        .groupBy("centroid_id", "pos").agg(avg(col("col")).as("m"))
        .collect()
      centroids = means.groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1).map { case (id, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val v = new Array[Double](dim)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
        (id, v)
      }
      it += 1
    }
    if (iters > 0) base.unpersist()
    centroids.map { case (id, v) => (id, v.toSeq) }.toDF("centroid_id", "cvec")
  }

  /** ONE Lloyd round's EXACT sufficient statistic, oracle-checkable
    * (SparkEntry q173): assign every vector to its nearest of the given
    * plan-time centroids (cosine argmax, ties to the lowest id — the same
    * [[graft.functions.Native.nearestCentroids]] kernel the production
    * loop in [[kmeansCentroids]] uses), then per (centroid, dimension)
    * emit the member count and the exact integer partial sum
    * Σ floor(v_pos · 2^20). Power-of-two scaling never rounds a double
    * and floor of an identical double is engine-independent, so the
    * update statistic hash-matches across engines where a double mean
    * would be summation-order-dependent; the quantized next centroid is
    * sum_q / (n · 2^20). [[kmeansCentroids]] keeps the double mean for
    * its own loop (convergence is spec-gated there) — THIS form puts the
    * distributed content of a Lloyd round, assignment + the (centroid,
    * pos) partial-sum shuffle (k·d rows after map-side combine), under
    * the oracle gate. Assignment is a narrow map: centroids are baked
    * into the plan, no join, no rows×k shuffle. */
  def kmeansRoundStats(corpus: DataFrame, vecCol: String,
      ids: Seq[Int], mat: Seq[Seq[Double]]): DataFrame =
    corpus.select(col(vecCol).cast("array<double>").as("__v"))
      .withColumn("centroid_id", element_at(
        graft.functions.Native.nearestCentroids(col("__v"), ids, mat, 1), 1))
      .select(col("centroid_id"), posexplode(col("__v")))
      .groupBy("centroid_id", "pos")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("col") * lit(1048576.0))).cast("long").as("sum_q"))

  /** PROTOTYPICALITY PRUNING (Sorscher et al., "Beyond neural scaling
    * laws", NeurIPS 2022): drop the `dropFrac` most prototypical members
    * of each embedding cluster — the vectors closest to their cluster
    * centroid carry the least marginal information, so pruning them loses
    * less than random subsampling. Scale shape mirrors q169's blessed
    * tercile pattern, NOT a per-cluster window (a window partitioned by
    * k≈16 centroids would sort corpus/k rows in one task at 100 TB):
    *
    *  1. narrow-map assignment to the nearest plan-time centroid + the
    *     cosine to it, quantized to `buckets` integer buckets
    *     (bucket-granular pruning — deterministic, no intra-bucket ties);
    *  2. one (centroid, bucket) histogram shuffle, O(k · 2·buckets) rows
    *     pulled to the driver — bounded, never corpus-scale;
    *  3. per-cluster cutoff = the smallest bucket whose suffix count is ≤
    *     floor(dropFrac · cluster_size); docs at or above it drop. A
    *     cluster where even the top bucket exceeds the budget keeps all
    *     rows (no qualifying cutoff).
    *
    * The corpus is scanned twice (histogram pass + literal-threshold
    * filter pass) — same trade as q169's tercile chain; both passes are
    * narrow maps over the scan. Returns kept (vec_id, centroid_id, qcos). */
  def prototypePrune(df: DataFrame, vecCol: String, idCol: String,
      ids: Seq[Int], mat: Seq[Seq[Double]], dropFrac: Double,
      buckets: Int = 1000): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac=$dropFrac must be in [0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val cents = broadcast(ids.zip(mat).toDF("centroid_id", "__cent"))
    val scored = df
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("centroid_id", element_at(
        graft.functions.Native.nearestCentroids(col("__v"), ids, mat, 1), 1))
      .join(cents, Seq("centroid_id"))
      .withColumn("qcos", floor(cosine(col("__v"), col("__cent")) * buckets))
      .select("vec_id", "centroid_id", "qcos")
    // bounded driver pull: the (centroid, bucket) histogram, ≤ k · 2·buckets rows
    val hist = scored.groupBy("centroid_id", "qcos").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val cuts: Map[Int, Long] = hist.groupBy(_._1).flatMap { case (cid, rows) =>
      val target = math.floor(dropFrac * rows.map(_._3).sum).toLong
      var suffix = 0L
      var cut = Option.empty[Long]
      // descending bucket scan: suffix after adding bucket b = #(qcos ≥ b),
      // monotone in b — the last qualifying b is the minimal cutoff
      rows.sortBy(-_._2).foreach { case (_, qb, cnt) =>
        suffix += cnt
        if (suffix <= target) cut = Some(qb)
      }
      cut.map(cid -> _)
    }
    if (cuts.isEmpty) scored
    else {
      val cutCol = cuts.foldLeft(lit(Long.MaxValue)) { case (acc, (cid, c)) =>
        when(col("centroid_id") === cid, lit(c)).otherwise(acc)
      }
      scored.filter(col("qcos") < cutCol)
    }
  }

  /** SIMPLIFIED SILHOUETTE per cluster (Hruschka et al.'s centroid-based
    * form of Rousseeuw's silhouette — per-point against CENTROIDS, not all
    * pairs, so it is one narrow map where the classic definition is
    * O(n²)): for each vector, a = cosine distance to its nearest
    * plan-time centroid, b = distance to the SECOND nearest, and
    * s = (b − a)/max(a, b) ∈ [0, 1] here (b ≥ a by construction); the
    * cluster's score is the mean of s over its members. The clustering
    * quality gate a SemDeDup/prototype-prune pipeline checks before
    * trusting cluster-local dedup decisions ([[kmeansRoundStats]] gates
    * the update step; this gates the RESULT).
    *
    * Engine-exactness: s is a fixed IEEE tree over two [[cosine]] values
    * (bit-identical per q30), and the per-cluster MEAN would be
    * summation-order-dependent in double — so s is floor-quantized to
    * micro units and summed EXACTLY in long ([[kmeansRoundStats]]'s
    * sum_q discipline); mean_sil = sum_q / (n · 10⁶) is one final
    * division. Both-distances-zero (the vector IS both centroids) yields
    * s = 0. Assignment and scoring are narrow maps over plan-literal
    * centroids — no join, no shuffle besides the O(k) aggregate. Returns
    * (centroid_id, n, sum_sil_micro, mean_sil). */
  def clusterSilhouette(df: DataFrame, vecCol: String,
      ids: Seq[Int], mat: Seq[Seq[Double]]): DataFrame = {
    require(ids.length >= 2, "clusterSilhouette needs at least 2 centroids")
    val spark = df.sparkSession
    import spark.implicits._
    val cents = broadcast(ids.zip(mat).toDF("__cid", "__cent"))
    val top2 = df.select(col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__near",
        graft.functions.Native.nearestCentroids(col("__v"), ids, mat, 2))
      .select(col("__v"), element_at(col("__near"), 1).as("centroid_id"),
        element_at(col("__near"), 2).as("__cid2"))
    val scored = top2
      .join(cents.withColumnRenamed("__cent", "__c1"),
        col("centroid_id") === col("__cid"))
      .drop("__cid")
      .join(cents.withColumnRenamed("__cent", "__c2"),
        col("__cid2") === col("__cid"))
      .withColumn("__a", lit(1.0) - cosine(col("__v"), col("__c1")))
      .withColumn("__b", lit(1.0) - cosine(col("__v"), col("__c2")))
      .withColumn("__s", when(greatest(col("__a"), col("__b")) === 0.0, lit(0.0))
        .otherwise((col("__b") - col("__a")) / greatest(col("__a"), col("__b"))))
    scored.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("__s") * lit(1000000.0)).cast("long")).as("sum_sil_micro"))
      .withColumn("mean_sil", col("sum_sil_micro").cast("double")
        / (col("n").cast("double") * lit(1000000.0)))
  }

  /** GROUPED COVARIANCE MATRIX (upper triangle) over the first `dim`
    * embedding dimensions — the full-matrix extension of
    * [[groupFrechetDiag]]'s diagonal moments: per (group, i ≤ j), exact
    * quantized moment sums and the covariance
    * cov_ij = S_ij/n − (s_i/n)(s_j/n), the input to whitening, PCA (eigen
    * on the bounded d×d result is a driver-side step), and the
    * full-covariance Fréchet/Mahalanobis drift audits.
    *
    * Plan shape — the reason this is a CUSTOM CATALYST AGGREGATE
    * ([[graft.functions.Native.CovMoments]], a TypedImperativeAggregate):
    * each task folds its rows into ONE flat moment buffer per group
    * (count + d sums + d(d+1)/2 pair sums) and the shuffle moves one
    * buffer row per (group, partition) — the explode-to-pairs alternative
    * multiplies the shuffle by d(d+1)/2 (2080× at d = 64). The buffer
    * unpacks into (i, j) rows through plan-literal index decode (O(d²)
    * struct literals — bounded by the dim guard).
    *
    * Exactness: elements quantize to floor(v·2^scaleBits) longs (floor of
    * an identical double is engine-independent), every sum is exact
    * integer arithmetic with LOUD overflow (Math.addExact — ~2³¹ rows per
    * group at unit-scale 2²⁰-quantized inputs), and cov is a fixed IEEE
    * tree of three divisions, one product, one subtraction — the oracle
    * restates the same sums via the explode form and lands on identical
    * bits. Returns (group, n, i, j, sum_i, sum_j, s_ij, cov), 1-based
    * i ≤ j. */
  def covarianceMatrix(df: DataFrame, vecCol: String, groupCol: String,
      dim: Int, scaleBits: Int = 20): DataFrame = {
    require(dim >= 1 && dim <= 128,
      s"covarianceMatrix: dim=$dim outside [1, 128] — the unpack stage bakes" +
        " O(dim²) literals into the plan; block-partition the matrix past 128")
    require(scaleBits >= 0 && scaleBits <= 30, s"scaleBits=$scaleBits outside [0, 30]")
    val scale = math.pow(2.0, scaleBits) // exact power of two
    val q = transform(slice(col(vecCol).cast("array<double>"), 1, dim),
      x => floor(x * lit(scale)).cast("long"))
    val agged = df.filter(col(vecCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.Native.covMoments(q, dim).as("__m"))
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    val entries = array(pairs.zipWithIndex.map { case ((i, j), idx) =>
      struct(lit(i + 1).as("i"), lit(j + 1).as("j"),
        col("__m").getItem(1 + i).as("sum_i"),
        col("__m").getItem(1 + j).as("sum_j"),
        col("__m").getItem(1 + dim + idx).as("s_ij"))
    }: _*)
    val denom = lit(math.pow(2.0, 2 * scaleBits))
    agged.select(col(groupCol), col("__m").getItem(0).as("n"),
        explode(entries).as("e"))
      .select(col(groupCol), col("n"), col("e.i").as("i"), col("e.j").as("j"),
        col("e.sum_i").as("sum_i"), col("e.sum_j").as("sum_j"),
        col("e.s_ij").as("s_ij"))
      .withColumn("cov", (col("s_ij").cast("double") / col("n").cast("double")
        - (col("sum_i").cast("double") / col("n").cast("double"))
          * (col("sum_j").cast("double") / col("n").cast("double"))) / denom)
  }

  /** Cyclic JACOBI eigensolver for a symmetric matrix (driver-side — the
    * input is the BOUNDED d×d covariance, never data-scale): rotate away
    * the largest off-diagonal until convergence. Deterministic: fixed
    * sweep order, fixed tolerance, no randomness. Returns (eigenvalues,
    * eigenvectors as rows), unsorted.
    *
    * Tolerances are RELATIVE to the input's largest |entry| (floored at
    * the original absolute values, so matrices with entries ≤ 1 — every
    * covariance the engine feeds it today — behave bit-identically to
    * the historical absolute gates). This is what makes the q240/q240b
    * single-rotation claim scale-free: one 2×2 rotation leaves a float
    * residual of O(eps·‖a‖), which sits below eps-relative-to-‖a‖ at ANY
    * input magnitude, whereas an absolute 1e-14 gate would re-rotate —
    * and break the bit-exact oracle — once entries grow past ~1e2. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // scale from the ORIGINAL matrix, fixed across sweeps (a drifting
    // threshold would make rotation decisions order-dependent)
    val maxAbs0 = a0.map(_.map(math.abs).max).max
    val rotTol = 1e-14 * math.max(1.0, maxAbs0)
    val sweepTol = 1e-12 * math.max(1.0, maxAbs0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > sweepTol && sweep < 100) {
      off = 0.0
      for (p <- 0 until d; q <- (p + 1) until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > rotTol) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // theta = 0 (equal diagonal) still needs the full 45-degree
          // rotation — signum(0) = 0 would make it a no-op and stall
          val t = if (theta == 0.0) 1.0
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    require(off <= 1e-10 * math.max(1.0, maxAbs0),
      s"jacobiEigen: no convergence after $sweep sweeps (off=$off)")
    (Array.tabulate(d)(i => a(i)(i)), Array.tabulate(d, d)((j, i) => v(i)(j)))
  }

  /** PCA PROJECTION onto the top `nComponents` principal axes of the first
    * `dim` embedding dimensions — the decorrelation/compression step
    * upstream of visualization, whitened drift scores, and cheap ANN
    * pre-filters. Three stages, each in its blessed scale shape:
    *
    *  1. ONE [[graft.functions.Native.CovMoments]] fold over the corpus →
    *     a single moment buffer (the q234 kernel, groupless);
    *  2. driver-side: covariance from the buffer, [[jacobiEigen]] on the
    *     BOUNDED d×d matrix (O(d³) on O(d²) numbers — never data-scale),
    *     components sorted by eigenvalue desc with a deterministic sign
    *     convention (largest-|loading| coordinate made positive, first
    *     index on ties);
    *  3. mean vector + component matrix become PLAN LITERALS (the
    *     centroid-matrix idiom) and the projection is a narrow map —
    *     score_j = Σᵢ (vᵢ − μᵢ)·wᵢⱼ via the [[cosine]]-family VecDot
    *     kernel, no join, no shuffle.
    *
    * Oracle-gated at dim 2 (q240): a 2×2 Jacobi solve is exactly ONE
    * rotation — a short fixed float program the oracle restates literally
    * (theta/t/c/s, the two-sided update, the sort and sign convention,
    * the centered VecDot), so projections match bit-for-bit at full
    * double precision. PcaSpec additionally pins a hand 2×2 eigensystem,
    * orthonormality, the variance-ordering of the scores, and the sign
    * convention at higher dims; the covariance it consumes is q234.
    * Two corpus passes (moments + projection).
    * Returns (idCol, component 1-based, score). */
  def pcaProject(df: DataFrame, vecCol: String, idCol: String, dim: Int,
      nComponents: Int, scaleBits: Int = 20): DataFrame = {
    require(nComponents >= 1 && nComponents <= dim,
      s"pcaProject: nComponents=$nComponents outside [1, $dim]")
    val scale = math.pow(2.0, scaleBits)
    val q = transform(slice(col(vecCol).cast("array<double>"), 1, dim),
      x => floor(x * lit(scale)).cast("long"))
    // bounded driver pull: ONE moment buffer, 1 + d + d(d+1)/2 longs
    val buf = df.filter(col(vecCol).isNotNull)
      .agg(graft.functions.Native.covMoments(q, dim).as("m"))
      .collect().head.getSeq[Long](0)
    val n = buf(0).toDouble
    require(n >= 2, s"pcaProject: need >= 2 vectors, got ${buf(0)}")
    val mean = Array.tabulate(dim)(i => buf(1 + i) / n / scale)
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = (buf(idx) / n - (buf(1 + i) / n) * (buf(1 + j) / n)) / (scale * scale)
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val top = eigVals.zip(eigVecs).zipWithIndex
      .sortBy { case ((ev, _), i) => (-ev, i) }.take(nComponents)
      .map { case ((ev, w0), _) =>
        val pivot = w0.zipWithIndex.maxBy { case (x, i) => (math.abs(x), -i) }._2
        (ev, if (w0(pivot) < 0) w0.map(-_) else w0)
      }
    val centered = transform(slice(col(vecCol).cast("array<double>"), 1, dim),
      (x, i) => x - element_at(typedLit(mean.toSeq), (i + 1).cast("int")))
    val scores = array(top.zipWithIndex.map { case ((_, w), j) =>
      struct(lit(j + 1).as("component"),
        graft.functions.Native.dotProduct(centered, typedLit(w.toSeq)).as("score"))
    }: _*)
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), explode(scores).as("e"))
      .select(col(idCol), col("e.component").as("component"),
        col("e.score").as("score"))
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
    // the quantizer is k·d doubles — collect it and bake it into the plan as
    // a narrow-map kernel: assignment and probing shuffle NOTHING, the only
    // exchange left is the inverted-list bucket join itself
    val cents = kmeansCentroids(corpus, corpusVec, corpusId, nlist, kmeansIters)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    ivfWithCentroids(corpus, queries, k, nprobe, cents.map(_._1).toSeq,
      cents.map(_._2).toSeq, corpusVec, queryVec, corpusId, queryId)
  }

  /** [[ivfTopK]] with PLAN-TIME FIXED portable centroids
    * ([[graft.ops.Dedup.portablePlanes]]) instead of trained k-means — no
    * training stage at all; coarse quantization by deterministic
    * pseudo-random directions (the LSH limit of IVF). List balance is
    * slightly worse than k-means, but every stage — assignment argmax,
    * probe set, candidate cosine, rank — is restatable literally in an
    * external engine's SQL, so the WHOLE ANN pipeline is oracle-checkable
    * (SparkEntry q32), not merely recall-gated. Same plan shape: the only
    * exchange is the inverted-list equi-join. */
  def ivfTopKPortable(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nlist: Int = 16, nprobe: Int = 4,
      corpusVec: String = "embedding", queryVec: String = "embedding",
      corpusId: String = "vec_id", queryId: String = "vec_id"): DataFrame =
    ivfWithCentroids(corpus, queries, k, nprobe, 1 to nlist,
      Dedup.portablePlanes(nlist, dim), corpusVec, queryVec, corpusId, queryId)

  /** Shared IVF body: assignment + probing are narrow-map kernels over the
    * given plan-time centroid matrix; the bucket equi-join on centroid_id is
    * the single exchange. */
  private def ivfWithCentroids(
      corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      ids: Seq[Int], mat: Seq[Seq[Double]],
      corpusVec: String, queryVec: String,
      corpusId: String, queryId: String): DataFrame = {
    val assigned = corpus
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cvec"))
      .withColumn("centroid_id", element_at(
        graft.functions.Native.nearestCentroids(col("__cvec"), ids, mat, 1), 1))
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("__qvec"))
      .withColumn("centroid_id", explode(
        graft.functions.Native.nearestCentroids(col("__qvec"), ids, mat, nprobe)))

    val scored = assigned.join(probed, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qvec"), col("__cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** PRODUCT QUANTIZATION codebooks: split `dim` dimensions into `m`
    * subspaces and k-means each independently ([[kmeansCentroids]] per
    * slice). A vector's PQ code is its per-subspace nearest-centroid id —
    * `m` small ints (m bytes at k ≤ 256) standing in for `dim` floats, a
    * 32× storage cut at (m=8, dim=64, float32). THE memory lever for ANN
    * over 100 TB of embeddings: codes live in RAM, raw vectors stay in cold
    * storage for final re-ranking only. Returns one (id, centroid) list per
    * subspace. */
  def pqTrain(corpus: DataFrame, vecCol: String, idCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 2, sampleSize: Int = 2048): Seq[Seq[(Int, Seq[Double])]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // ONE hash-ordered sample collect; all m codebooks train driver-side on
    // its slices (k·sample·sub flops each — trivial). Codebooks are always
    // sample-trained at scale: m distributed Lloyd jobs over the full corpus
    // buy nothing but 2m collect barriers (measured 4.5 s → 1.4 s for the
    // IVF-PQ query at sf0.1).
    val sample = corpus
      .select(col(idCol).as("__cid"), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(xxhash64(col("__cid")), col("__cid")).limit(sampleSize)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pqTrain: empty corpus")
    (0 until m).map { s =>
      val slices = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      localKMeans(slices, k, iters).zipWithIndex.map { case (v, i) => (i + 1, v.toSeq) }
    }
  }

  /** Driver-side cosine k-means with the same semantics as
    * [[kmeansCentroids]] (farthest-point init, Lloyd rounds, empty clusters
    * drop) for pre-collected samples. Deterministic: ties keep the earlier
    * index. */
  private[ops] def localKMeans(sample: Array[Array[Double]], k: Int, iters: Int): IndexedSeq[Array[Double]] = {
    def cosL(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }
    val maxSim = Array.fill(sample.length)(-2.0)
    var chosen = Vector(sample(0))
    while (chosen.size < math.min(k, sample.length)) {
      val newest = chosen.last
      var bestIdx = 0; var bestVal = Double.PositiveInfinity
      var i = 0
      while (i < sample.length) {
        val s = cosL(sample(i), newest)
        if (s > maxSim(i)) maxSim(i) = s
        if (maxSim(i) < bestVal) { bestVal = maxSim(i); bestIdx = i }
        i += 1
      }
      chosen = chosen :+ sample(bestIdx)
    }
    var centroids: IndexedSeq[Array[Double]] = chosen.toIndexedSeq
    var it = 0
    while (it < iters) {
      val dim = sample.head.length
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      var i = 0
      while (i < sample.length) {
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < centroids.length) {
          val s = cosL(sample(i), centroids(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        val acc = sums(best)
        var j = 0
        while (j < dim) { acc(j) += sample(i)(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      centroids = centroids.indices.collect { case c if counts(c) > 0 =>
        sums(c).map(_ / counts(c))
      }.toIndexedSeq
      it += 1
    }
    centroids
  }

  /** Encode vectors to PQ codes: per subspace, the nearest codebook
    * centroid id via the plan-time [[graft.functions.Native.nearestCentroids]]
    * kernel — a narrow map, no shuffle, codebooks baked into the plan. */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
      codebooks: Seq[Seq[(Int, Seq[Double])]], dim: Int): DataFrame =
    df.select(col(idCol), pqCodes(col(vecCol), codebooks, dim).as("pq_code"))

  /** The per-subspace nearest-codebook-id array as a single Column (each
    * subspace is a plan-time [[graft.functions.Native.nearestCentroids]]
    * kernel over a slice — narrow map, no shuffle). */
  private def pqCodes(vec: Column, codebooks: Seq[Seq[(Int, Seq[Double])]], dim: Int): Column = {
    val m = codebooks.length
    require(dim % m == 0,
      s"dim=$dim not divisible by ${m} codebooks — trailing dims would be silently dropped")
    val sub = dim / m
    array(codebooks.zipWithIndex.map { case (cb, s) =>
      element_at(graft.functions.Native.nearestCentroids(
        slice(vec.cast("array<double>"), s * sub + 1, sub),
        cb.map(_._1), cb.map(_._2), 1), 1)
    }: _*)
  }

  /** Approximate vector reconstructed from a PQ code column (per-subspace
    * codebook lookup, concatenated). */
  private def pqVec(code: Column, codebooks: Seq[Seq[(Int, Seq[Double])]]): Column =
    flatten(array(codebooks.zipWithIndex.map { case (cb, s) =>
      val mapping = map_from_arrays(
        array(cb.map(c => lit(c._1)): _*),
        array(cb.map(c => lit(c._2.toArray)): _*))
      element_at(mapping, element_at(code, s + 1))
    }: _*))

  /** Reconstruct approximate vectors from PQ codes (codebook lookup per
    * subspace, concatenated). Used for approximate scoring without touching
    * raw vectors; ids map through a literal int→centroid map because empty
    * clusters leave codebook ids non-contiguous. */
  def pqDecode(codes: DataFrame, codebooks: Seq[Seq[(Int, Seq[Double])]],
      codeCol: String = "pq_code", out: String = "pq_vec"): DataFrame =
    codes.withColumn(out, pqVec(col(codeCol), codebooks))

  /** IVF-PQ approximate nearest neighbours — the memory-bounded ANN shape
    * for 100 TB of embeddings: the candidate structure is (centroid_id,
    * pq_code) = ~m bytes per vector, built once; raw vectors are touched
    * only by the optional exact re-rank of the final small candidate set.
    *
    *  - coarse stage: [[kmeansCentroids]] quantizer, queries probe `nprobe`
    *    inverted lists (plan-time kernel — no shuffle to assign or probe);
    *  - fine stage: candidates score by cosine against the PQ-RECONSTRUCTED
    *    vector (codebook lookup per subspace — the classic ADC lookup-table
    *    evaluation computes exactly this sum, subspace partial dots
    *    pre-tabled per query; the reconstruction form reuses the native
    *    cosine kernel and touches only the m-byte codes);
    *  - re-rank stage (`rerankDepth` > 0): the top `rerankDepth` candidates
    *    per query join raw vectors back ON THE ID — a k-row-per-query join,
    *    never a corpus scan — and exact cosine decides the final top-k.
    *
    * Deterministic: every stage inherits the hash-seeded k-means and ties
    * break on the neighbour id. */
  def ivfpqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, kpq: Int = 16,
      kmeansIters: Int = 2, rerankDepth: Int = 0,
      corpusVec: String = "embedding", queryVec: String = "embedding",
      corpusId: String = "vec_id", queryId: String = "vec_id"): DataFrame = {
    val cents = kmeansCentroids(corpus, corpusVec, corpusId, nlist, kmeansIters)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val codebooks = pqTrain(corpus, corpusVec, corpusId, dim, m, kpq, kmeansIters)
    ivfpqWithModels(corpus, queries, k, dim, nprobe, rerankDepth,
      cents.toSeq, codebooks, corpusVec, queryVec, corpusId, queryId)
  }

  /** [[ivfpqTopK]] with PLAN-TIME FIXED portable models — coarse centroids
    * from [[graft.ops.Dedup.portablePlanes]] and per-subspace PQ codebooks
    * from [[graft.ops.Dedup.portablePlanesSalt]] (salt = subspace index, so
    * the m codebooks are independent). No training stage; every stage —
    * coarse argmax, probe set, per-subspace code argmax, ADC cosine against
    * the reconstructed vector, exact re-rank — is restatable literally in
    * external SQL, making the full IVF-PQ pipeline oracle-checkable
    * (SparkEntry q86). Trained models (the k-means form above) remain the
    * recall-quality path; this is the determinism-anchored one. */
  def ivfpqTopKPortable(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, kpq: Int = 16,
      rerankDepth: Int = 0,
      corpusVec: String = "embedding", queryVec: String = "embedding",
      corpusId: String = "vec_id", queryId: String = "vec_id"): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val cents = (1 to nlist).zip(Dedup.portablePlanes(nlist, dim))
    val codebooks = portablePqCodebooks(dim, m, kpq)
    ivfpqWithModels(corpus, queries, k, dim, nprobe, rerankDepth,
      cents, codebooks, corpusVec, queryVec, corpusId, queryId)
  }

  /** The deterministic PQ codebooks [[ivfpqTopKPortable]] bakes into its
    * plan — exposed so SparkEntry's oracle generator restates the SAME
    * literals in SQL. */
  def portablePqCodebooks(dim: Int, m: Int, kpq: Int): Seq[Seq[(Int, Seq[Double])]] = {
    val sub = dim / m
    (0 until m).map(s =>
      (1 to kpq).zip(Dedup.portablePlanesSalt(s"pq$s", kpq, sub))
        .map { case (i, v) => (i, v) })
  }

  /** Shared IVF-PQ body over given coarse centroids + codebooks. */
  private def ivfpqWithModels(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nprobe: Int, rerankDepth: Int,
      cents: Seq[(Int, Seq[Double])], codebooks: Seq[Seq[(Int, Seq[Double])]],
      corpusVec: String, queryVec: String,
      corpusId: String, queryId: String): DataFrame = {
    // the compact index: (neighbor_id, centroid_id, pq_code) — no raw vectors
    val index = corpus.select(col(corpusId).as("neighbor_id"),
      element_at(graft.functions.Native.nearestCentroids(
        col(corpusVec), cents.map(_._1).toSeq, cents.map(_._2).toSeq, 1), 1).as("centroid_id"),
      pqCodes(col(corpusVec), codebooks, dim).as("pq_code"))
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("__qvec"))
      .withColumn("centroid_id", explode(graft.functions.Native.nearestCentroids(
        col("__qvec"), cents.map(_._1).toSeq, cents.map(_._2).toSeq, nprobe)))

    val scored = index.join(probed, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_cosine", cosine(col("__qvec"), pqVec(col("pq_code"), codebooks)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_cosine").desc, col("neighbor_id"))
    if (rerankDepth <= 0)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("adc_cosine").as("cosine"), col("rank"))
    else {
      val cands = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= math.max(k, rerankDepth))
        .select("query_id", "neighbor_id", "__qvec")
      val exact = cands.join(
          corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cvec")),
          Seq("neighbor_id"))
        .withColumn("cosine", cosine(col("__qvec"), col("__cvec")))
      val w2 = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      exact.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    }
  }

  /** Symmetric per-vector INT8 quantization (the embedding-storage analog of
    * [[pqEncode]] — 4× smaller than float32 with no codebook): codes =
    * floor(x·127/maxabs + 0.5) via the single-pass
    * [[graft.functions.Native.int8Codes]] kernel, scale = maxabs/127.
    * Dequantize ≈ code·scale. Every arithmetic step is IEEE-exact and
    * restatable in any engine (the codes string hash-matches DuckDB's
    * list_transform restatement). */
  def int8Quantize(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      (array_max(transform(col(vecCol).cast("array<double>"), x => abs(x))) / 127)
        .as("scale"),
      graft.functions.Native.int8Codes(col(vecCol)).as("codes"))

  /** Per-group mean embedding (class centroids / prototype vectors — the
    * aggregation behind SemDeDup-style semantic clustering and per-label
    * retrieval prototypes), emitted LONG-FORM as (group, dim, mean_val, n).
    * The elementwise sum goes through DECIMAL(18,9) so the result is
    * order-independent and bit-identical across engines (double sums commute
    * only approximately; both Spark and DuckDB round double→decimal ties
    * half-away-from-zero). Plan: posexplode → ONE partial-aggregated
    * shuffle of (group, dim) pairs — |groups|·dim rows of agg state, never
    * a vector collect. */
  def groupCentroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    // per-element quantization via round(x·1e9) INTEGER units, not a
    // double→decimal cast: both engines compute the identical double x·1e9
    // and share the same round-half-away rule, whereas decimal casts round
    // the value's EXACT binary expansion, whose rare exact-midpoint cases
    // tie-break differently per engine (surfaced as a 5e-12 drift in one
    // sf0.1 dimension). Longs then sum exactly in any order.
    df.select(col(groupCol), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col(groupCol), (col("pos") + 1).cast("long").as("dim"))
      .agg((sum(round(col("col") * 1e9).cast("long")).cast("double")
          / (lit(1e9) * count(lit(1)))).as("mean_val"),
        count(lit(1)).as("n"))

  /** DIAGONAL-COVARIANCE FRÉCHET DISTANCE between each pair of groups'
    * embedding distributions — the FID family's statistic restricted to
    * per-dimension variances: Σ_d (μa−μb)² + σ²a + σ²b − 2·σa·σb. The
    * embedding-space answer to "how far apart are these two sources /
    * labels / snapshots as DISTRIBUTIONS" (drift detection, synthetic-vs-
    * real audits, source mixing) — one number per group pair, complements
    * [[graft.ops.TextAnalysis.distributionDistance]] (token space) and
    * [[groupCentroids]] (means only; this adds the variance axis).
    *
    * Engine-exact like [[groupCentroids]]: per-row x and x² quantized to
    * integer nanos and summed exactly, so μ and σ² per (group, dim) are
    * identical doubles in any engine; each pair's per-dim term is one
    * fixed IEEE expression quantized back to nanos, so the final Σ_d is
    * again an exact integer sum.
    *
    * Plan shape at 100 TB: ONE corpus explode into a partial-aggregated
    * (group, dim) group-by — the only thing that shuffles is O(groups·d)
    * integer triples; the pair join and final reduce are O(groups²·d) on
    * a table that fits in one task. */
  def groupFrechetDiag(df: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val stats = df
      .select(col(groupCol).as("__g"), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("__g"), col("pos"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col("col") * lit(1e9)).cast("long")).as("__sx"),
        sum(round(col("col") * col("col") * lit(1e9)).cast("long")).as("__sxx"))
      .select(col("__g"), col("pos"), col("__n"),
        (col("__sx").cast("double") / (lit(1e9) * col("__n").cast("double")))
          .as("__mu"),
        (col("__sxx").cast("double") / (lit(1e9) * col("__n").cast("double")))
          .as("__ex2"))
      // population variance; greatest() guards the quantization residue
      // when a dimension is (near-)constant
      .withColumn("__vr", greatest(col("__ex2") - col("__mu") * col("__mu"), lit(0.0)))
    val a = stats.select(col("__g").as("group_a"), col("pos"), col("__n").as("n_a"),
      col("__mu").as("__mua"), col("__vr").as("__va"))
    val b = stats.select(col("__g").as("group_b"), col("pos"), col("__n").as("n_b"),
      col("__mu").as("__mub"), col("__vr").as("__vb"))
    a.join(b, Seq("pos")).filter(col("group_a") < col("group_b"))
      .withColumn("__term", round(
        (((col("__mua") - col("__mub")) * (col("__mua") - col("__mub"))
          + (col("__va") + col("__vb")))
          - lit(2.0) * sqrt(col("__va") * col("__vb"))) * lit(1e9)).cast("long"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        (sum(col("__term")).cast("double") / lit(1e9)).as("frechet_diag"))
  }

  /** Explode an embedding column into scalar columns (UnpackEmbedding,
    * retrieval_job.py:3296-3320). */
  def unpackEmbedding(df: DataFrame, vecCol: String, dims: Int, prefix: String = "dim_"): DataFrame =
    (0 until dims).foldLeft(df)((d, i) => d.withColumn(s"$prefix$i", element_at(col(vecCol), i + 1)))

  /** HARD-NEGATIVE mining for contrastive training: for each query row the
    * top-k most-cosine-similar corpus rows with a DIFFERENT label — the
    * pairs a contrastive loss learns most from. Exact form for bounded
    * query batches: the query side broadcasts and the corpus streams
    * through one pass (broadcast-NLJ IS the operator, as with
    * [[bruteForceTopK]]); at corpus×corpus scale run [[ivfpqTopK]] with
    * k + slack and drop same-label candidates — the IVF/PQ index prunes
    * before any pairwise work. Ties break on neighbor id. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__qlabel"), col(vecCol).as("__qvec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__clabel"), col(vecCol).as("__cvec"))
      // null-safe inequality: a null label is its own class — plain =!= is
      // null for null labels and silently drops those rows from mining
      .join(q, !(col("__clabel") <=> col("__qlabel")))
      .withColumn("cosine", cosine(col("__qvec"), col("__cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Johnson-Lindenstrauss RANDOM PROJECTION to `outDim` dimensions using
    * the PORTABLE plane matrix ([[graft.ops.Dedup.portablePlanes]]): y_j =
    * ⟨plane_j, x⟩, each plane baked into the plan as literals and evaluated
    * by the native dot kernel — a pure narrow map (no shuffle, no fit step,
    * no driver state beyond the plan-time matrix). The standard
    * pre-ANN/pre-clustering dimensionality cut: distances are preserved
    * within JL distortion while memory and dot-product cost drop dim/outDim.
    * Long-form output (idCol, out_dim 1-based, value) — deterministic
    * left-to-right summation, so external engines reproduce it bit-exactly.
    */
  def randomProject(df: DataFrame, vecCol: String, idCol: String,
      outDim: Int, dim: Int): DataFrame = {
    val mat = Dedup.portablePlanes(outDim, dim)
    val comps = mat.zipWithIndex.map { case (plane, j) =>
      struct(lit(j + 1L).as("out_dim"),
        dot(col(vecCol), lit(plane.toArray)).as("value"))
    }
    df.select(col(idCol), explode(array(comps: _*)).as("__p"))
      .select(col(idCol), col("__p.out_dim"), col("__p.value"))
  }

  /** RECIPROCAL RANK FUSION of two rankers (Cormack, Clarke & Buettcher,
    * SIGIR'09) — the standard hybrid-retrieval combiner: fused(d) =
    * Σᵢ 1/(k + rankᵢ(d)), an id absent from a list contributing 0. The
    * canonical pairing here is [[graft.ops.TextAnalysis.bm25TopK]] lexical
    * ranks with a [[bruteForceTopK]]/[[ivfTopKPortable]] vector rank list;
    * any (id, rank) frames fuse.
    *
    * Determinism: each term is one IEEE division by an integer (k + rank),
    * the two-term total is a single fixed-order `+` — never an unordered
    * float aggregate — and the final ordering tie-breaks on the id, so
    * external engines reproduce the fused list bit-exactly.
    *
    * Plan shape: one full-outer equi-join of two ALREADY-top-k lists
    * (bounded by k_a + k_b rows, broadcast-sized at any corpus scale) and
    * a ranking window over that bounded union — the corpus itself is never
    * touched here. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String = "rank", kRrf: Int = 60, topK: Int = 20): DataFrame = {
    require(kRrf >= 1, s"kRrf=$kRrf must be >= 1 (k=0 over-weights rank 1)")
    val la = a.select(col(idCol), col(rankCol).cast("int").as("rank_a"))
    val lb = b.select(col(idCol), col(rankCol).cast("int").as("rank_b"))
    val fused = la.join(lb, Seq(idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("rank_b")), lit(0.0)))
    val w = Window.orderBy(col("rrf").desc, col(idCol).asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("int"))
      .filter(col("fused_rank") <= topK)
      .select(col(idCol), col("rank_a"), col("rank_b"), col("rrf"), col("fused_rank"))
  }
}
