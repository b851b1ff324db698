package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling and distribution-drift screens — the observability layer a
  * training-data pipeline runs before (and between) expensive stages. All
  * exact and engine-portable: no sampling, no transcendentals (libm log/exp
  * differ across engines in the last ulp — a determinism hazard; every score
  * here is built from counts, ratios and square roots only).
  */
object Profiling {

  /** Per-column profile in ONE pass over the data: row count, null count,
    * distinct count, min/max (as strings, so heterogeneous columns stack
    * into one frame). One wide aggregate — no per-column jobs, no unpivot
    * shuffle; a 100-column profile of a 100 TB table is still a single scan
    * with map-side partials. `exactDistinct = false` swaps count_distinct
    * for the HLL estimate: EXACT multi-distinct plans an Expand that
    * multiplies the shuffle by the column count (n_cols copies of every
    * row), while sketches partial-aggregate — at profiling scale the
    * estimate is the right default, the exact form the auditable one. */
  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      val dst =
        if (exactDistinct) count_distinct(col(c))
        else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"__cnt_$c"),
        dst.as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row into (column, stats) rows — driver-side on
    // a 1-row frame, not a shuffle
    val stats = cols.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(stats: _*)).as("p")).select("p.*")
  }

  /** Distribution DRIFT between two slices of the same column (yesterday vs
    * today, train vs serve): bin both on the REFERENCE slice's exact
    * quartile cuts, then score the binned histograms with the
    * triangular-discrimination statistic Σ (pᵢ−qᵢ)²/(pᵢ+qᵢ) ∈ [0, 2] — the
    * PSI-style screen minus PSI's ln() (engine-portable; same ordering of
    * drifts). Returns one row: per-bin fractions and the score. The
    * reference slice is scanned twice (cut points, then binning) — cuts
    * need a completed pass before binning can start. */
  def drift(reference: DataFrame, current: DataFrame, valueCol: String): DataFrame = {
    // the three cut points are a plan-time scalar (the IVF-centroid /
    // corpus-count idiom): joining a 1-row frame on a constant key folds
    // the condition away and replans as a BroadcastNestedLoopJoin, which
    // the plan invariants ban corpus-wide
    val cr = Aggregations.exactPercentiles(
      reference.select(lit(1).as("__g"), col(valueCol)), Seq("__g"), valueCol,
      Seq(0.25, 0.5, 0.75), Seq("c1", "c2", "c3"))
      .select("c1", "c2", "c3").collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"drift: reference slice has no non-null '$valueCol' rows — no cut points"))
    val (c1, c2, c3) = (cr.getDouble(0), cr.getDouble(1), cr.getDouble(2))
    def binned(df: DataFrame, tag: String) =
      df.select(((col(valueCol) > c1).cast("int")
          + (col(valueCol) > c2).cast("int")
          + (col(valueCol) > c3).cast("int")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(s"n_$tag"))
    val joined = binned(reference, "ref")
      .join(binned(current, "cur"), Seq("bin"), "full")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // totals via a window over the (≤4-row) bin frame keeps the whole op
    // lazy — no driver action at plan-build time
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val p = col("n_ref").cast("double") / sum(col("n_ref")).over(w).cast("double")
    val q = col("n_cur").cast("double") / sum(col("n_cur")).over(w).cast("double")
    val term = when(p + q > 0, (p - q) * (p - q) / (p + q)).otherwise(0.0)
    joined.select(col("bin"), col("n_ref"), col("n_cur"), term.as("__t"))
      .agg(sum(col("__t")).as("drift_score"),
        count(lit(1)).as("n_bins"), sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
  }

  /** JOIN-KEY SKEW diagnostic: the top-`k` heaviest keys with each key's
    * share of the table and the ratio to a perfectly uniform key — the
    * number that says "this join needs [[graft.ops.Joins.saltedJoin]] /
    * AQE skew handling" BEFORE the straggler task does. One
    * partial-aggregated groupBy on the key + a top-k window over the
    * O(distinct keys) count frame; integer counts, exact ratios. */
  def keySkew(df: DataFrame, keys: Seq[String], k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persist the counts: the totals collect below and the returned top-k
    // plan both read them — without the cache the full groupBy over df
    // would run twice. (MEMORY_AND_DISK; Spark's context cleaner drops the
    // cache once the frame is unreferenced.)
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // totals are plan-time scalars (one parallel aggregate, 1-row collect —
    // the quantile-cut idiom): a global no-partition window here would sort
    // the ENTIRE key domain on one task, and for THIS op the key domain is
    // exactly what's huge. Top-k via orderBy+limit compiles to a parallel
    // TakeOrderedAndProject; the rank window then runs over ≤ k rows.
    val s = counts.agg(sum(col("n")), count(lit(1))).collect().head
    if (s.isNullAt(0))
      return counts.withColumn("share", lit(0.0))
        .withColumn("skew_vs_uniform", lit(0.0))
        .withColumn("key_rank", lit(0)).limit(0)
    val total = s.getLong(0)
    val nKeys = s.getLong(1)
    counts.orderBy(col("n").desc +: keys.map(col): _*).limit(k)
      .withColumn("share", col("n").cast("double") / lit(total).cast("double"))
      .withColumn("skew_vs_uniform",
        col("n").cast("double") * lit(nKeys) / lit(total).cast("double"))
      .withColumn("key_rank", row_number().over(
        Window.orderBy(col("n").desc +: keys.map(col): _*)).cast("int"))
  }

  /** EMBEDDING corpus health screen, per label: row count, zero-vector
    * count (an upstream-encoder failure signal), wrong-width count (schema
    * drift inside the array type, which `df.schema` can't see), and the
    * mean SQUARED L2 norm — summed through DECIMAL(18,9) like
    * [[graft.ops.Similarity.groupCentroids]], so the statistic is
    * order-independent and engine-exact (a double accumulation would hash
    * differently per partition order). One narrow map + one partial-agged
    * groupBy; vectors never shuffle — only the per-row scalars do. */
  def embeddingProfile(df: DataFrame, vecCol: String, labelCol: String,
      expectedDim: Int): DataFrame = {
    val v = col(vecCol)
    // squared norm per row via the native dot kernel (deterministic
    // left-to-right summation), quantized to round(x·1e6) INTEGER units —
    // q90's shared-rounding discipline (decimal casts of full-mantissa
    // doubles can hit exact-midpoint ties that engines break differently).
    // 1e6 units keep a broken-encoder vector (sq norm ~1e9 → 1e15 units)
    // inside long range, so the screen REPORTS the anomaly instead of
    // overflowing on it; ANSI would still surface a truly pathological sum
    // loudly rather than wrap
    val sqUnits = round(graft.ops.Similarity.dot(v, v) * 1e6).cast("long")
    df.select(col(labelCol),
        size(v).as("__w"),
        sqUnits.as("__sq"),
        forall(v, x => x === 0f).as("__zero"))
      .groupBy(labelCol)
      .agg(count(lit(1)).as("n"),
        sum(col("__zero").cast("long")).as("n_zero"),
        sum((col("__w") =!= expectedDim).cast("long")).as("n_wrong_dim"),
        (sum(col("__sq")).cast("double") / (lit(1e6) * count(lit(1))))
          .as("mean_sq_norm"))
  }

  /** K-ANONYMITY RISK PROFILE over a quasi-identifier column set — the
    * privacy screen a dataset passes before release: group rows into
    * equivalence classes on the QI columns, then report the CLASS-SIZE
    * DISTRIBUTION with a cumulative at-risk count. A row in a class of
    * size s is re-identifiable at any k > s, so `rows_at_or_below` at
    * size s is exactly the population that fails (s+1)-anonymity — one
    * frame answers every k at once instead of re-scanning per threshold.
    * Complements [[graft.ops.TextAnalysis.redactPii]] (free-text PII)
    * with the structured-column side of the same release gate.
    *
    * All-integer output (exact, engine-portable). Plan shape at 100 TB:
    * one partial-aggregated group-by on the QI key (the only
    * corpus-sized shuffle), a second fold to O(distinct class sizes)
    * rows — at most O(√n) of them, in practice tens — and the cumulative
    * window runs unpartitioned over THAT bounded frame only. */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityProfile: need at least one " +
      "quasi-identifier column — an empty QI set makes every row one class")
    import org.apache.spark.sql.expressions.Window
    val classes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__s"))
    val wCum = Window.orderBy(col("class_size"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes.groupBy(col("__s").as("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("class_size") * col("n_classes"))
      .withColumn("rows_at_or_below", sum(col("n_rows")).over(wCum))
  }
}
