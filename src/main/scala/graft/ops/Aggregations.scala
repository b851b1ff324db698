package graft.ops

import graft.contract.{AggregatedFeature, AggregationWindow}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The three aggregation execution shapes of the reference (SURVEY §2.6;
  * aligned/local/job.py:78-166, 366-402):
  * 1. plain group-by over entities;
  * 2. time-windowed over history (rolling per-row, or aligned sliding via
  *    every_interval);
  * 3. point-in-time windowed per fact row.
  * All lower to groupBy/Window — partial (map-side) aggregation and AQE come
  * free; the rolling form shuffles once on the group keys.
  */
object Aggregations {

  /** Shape 1: plain `group_by(entities).agg(...)` (local/job.py:83-95). */
  def groupBy(df: DataFrame, keys: Seq[String], aggs: Seq[AggregatedFeature]): DataFrame = {
    val exprs = aggs.map(a => a.agg(col(a.sourceColumn)).as(a.name))
    df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Shape 2a: rolling trailing window per input row — for each row, aggregate
    * peer rows of the same keys within (ts - window, ts]. polars
    * `rolling(ts, period=w, group_by=keys)` (local/job.py:137-141) →
    * `Window.partitionBy(keys).orderBy(unix_µs).rangeBetween(-w + 1µs, 0)`.
    * The lower bound is EXCLUSIVE, like polars rolling — a row exactly `w`
    * before the current one is NOT counted. (The PIT aggregates below are
    * inclusive at both ends instead, matching the reference's
    * `is_between(start, end)` — local/job.py:383-387.)
    * One shuffle on `keys`; the sort is per-partition. */
  def rolling(df: DataFrame, keys: Seq[String], ts: String, aggs: Seq[AggregatedFeature]): DataFrame = {
    // order on epoch MICROS as long: exact integer range arithmetic — a double
    // seconds ordering would round sub-µs and disagree with µs-exact engines
    // at window boundaries.
    val micros = unix_micros(col(ts))
    aggs.foldLeft(df) { (d, a) =>
      val w = a.window.map(_.window.getSeconds * 1000000L).getOrElse(Long.MaxValue / 4)
      val win = Window.partitionBy(keys.map(col): _*).orderBy(micros)
        .rangeBetween(-w + 1, 0)
      d.withColumn(a.name, a.agg(col(a.sourceColumn)).over(win))
    }
  }

  /** Shape 2b: aligned sliding windows — polars `group_by_dynamic(ts, every=e,
    * period=w, offset=-w)` (local/job.py:121-135) → Spark
    * `groupBy(window(ts, w, e), keys)`, taking window.end as the result
    * timestamp. Two reference-parity details (local/job.py:121-145):
    * 1. windows whose END exceeds the max observed ts are DROPPED (the
    *    reference filters `label = start + period <= max(ts)` — a trailing
    *    partial window is suppressed, not emitted);
    * 2. `offset_interval` is SUBTRACTED from the result timestamp, AFTER the
    *    clip (`pl.col(time_name) - over.offset_interval`). */
  def sliding(
      df: DataFrame, keys: Seq[String], ts: String,
      aggs: Seq[AggregatedFeature], win: AggregationWindow,
      tsOut: String = "window_ts"): DataFrame = {
    val every = win.everyInterval.getOrElse(win.window)
    val exprs = aggs.map(a => a.agg(col(a.sourceColumn)).as(a.name))
    val wcol = window(col(ts), s"${win.window.getSeconds} seconds", s"${every.getSeconds} seconds")
    val grouped = df.groupBy(wcol +: keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
    val maxTs = df.agg(max(col(ts))).head().getTimestamp(0)
    val shifted = win.offsetInterval.fold(col("window.end"))(o =>
      col("window.end") - expr(s"INTERVAL ${o.getSeconds} SECOND"))
    grouped
      .filter(col("window.end") <= lit(maxTs))
      .withColumn(tsOut, shifted)
      .drop("window")
  }

  /** EXACT grouped percentiles via value histogram — the scale path for
    * MedianAggregation / PercentileAggregation (SURVEY §2.6) when the value
    * column has bounded cardinality (prices, quantities, scores, ratings…).
    *
    * Spark's exact `percentile()` buffers EVERY group row in the aggregation
    * state; at 100 TB a hot group OOMs the executor. Here state is one row
    * per DISTINCT (keys, value): groupBy histogram (map-side combined) →
    * per-key cumulative counts (one window pass over the tiny histogram) →
    * order statistics by conditional min, linearly interpolated exactly like
    * `percentile(col, p)` / DuckDB `quantile_cont`: rank r = p·(n−1),
    * result = v⌊r⌋ + (v⌈r⌉ − v⌊r⌋)·(r − ⌊r⌋).
    *
    * Output: one row per key combination with `outNames` double columns.
    * Null values are excluded (like percentile/quantile_cont). */
  def exactPercentiles(df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length, "one output name per percentile")
    val v = col(valueCol).cast("double")
    val hist = df.filter(v.isNotNull)
      .groupBy(keys.map(col) :+ v.as("__v"): _*).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    // v at 0-based order-stat index i = min(v) over rows whose cumulative
    // count exceeds i; lo/hi ranks are per-row expressions but constant
    // within each key group
    def orderStat(rank: Column): Column = min(when(col("__cum") > rank, col("__v")))
    val aggs = ps.zip(outNames).flatMap { case (p, name) =>
      val r = lit(p) * (col("__n") - 1)
      Seq(orderStat(floor(r)).as(s"__lo_$name"), orderStat(ceil(r)).as(s"__hi_$name"))
    } :+ max(col("__n")).as("__n")
    val agged = cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val out = ps.zip(outNames).foldLeft(agged) { case (d, (p, name)) =>
      val r = lit(p) * (col("__n") - 1)
      val frac = r - floor(r)
      // lo·(1−f) + hi·f, NOT lo + (hi−lo)·f: algebraically equal, but the
      // operand order must match quantile_cont's lerp bit-for-bit — the
      // difference is a ulp, which is exactly what hash-matching catches
      // (found as a 9e-13 drift in one sf0.001 group)
      d.withColumn(name,
        col(s"__lo_$name") * (lit(1.0) - frac) + col(s"__hi_$name") * frac)
    }
    out.select(keys.map(col) ++ outNames.map(col): _*)
  }

  /** EXACT TRIMMED MEAN per key: drop exactly k = floor(n·trimMilli/1000)
    * rows from EACH end of the value order and average the rest — the
    * outlier-robust mean for monitoring metrics whose tails are garbage
    * (truncated scrapes, pathological documents). Integer-exact end to
    * end: the metric is integral, boundary values contribute PARTIALLY
    * (v · min(c, k − cum_before) at the cut), so the result equals the
    * sorted-and-sliced definition without any sort of the data — only the
    * per-key VALUE HISTOGRAM is windowed (distinct values, not rows; the
    * [[exactPercentiles]] histogram idiom — same scale caveat, same
    * bracketed escape hatch for near-continuous domains). */
  def trimmedStats(df: DataFrame, keys: Seq[String], valueCol: String,
      trimMilli: Int): DataFrame = {
    require(trimMilli >= 0 && trimMilli < 500,
      s"trimmedStats: trimMilli=$trimMilli outside [0, 500) — trimming half" +
        " from each end leaves nothing")
    val v = col(valueCol).cast("long")
    val hist = df.filter(v.isNotNull)
      .groupBy(keys.map(col) :+ v.as("__v"): _*).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__k", expr(s"(__n * $trimMilli) div 1000"))
    // of this value's c copies, the bottom cut eats min(c, k − cum_before)
    // (clamped at 0) and the top cut eats min(c, k − (n − cum))
    val eatLo = greatest(lit(0L), least(col("__c"), col("__k") - (col("__cum") - col("__c"))))
    val eatHi = greatest(lit(0L), least(col("__c"), col("__k") - (col("__n") - col("__cum"))))
    cum.groupBy(keys.map(col): _*)
      .agg(max(col("__n")).as("n_rows"), max(col("__k")).as("n_trimmed_each"),
        sum(col("__v") * col("__c")).as("__sum"),
        sum(col("__v") * eatLo).as("__lo"), sum(col("__v") * eatHi).as("__hi"))
      .select(keys.map(col) :+ col("n_rows") :+ col("n_trimmed_each") :+
        when(col("n_rows") > lit(2L) * col("n_trimmed_each"),
          (col("__sum") - col("__lo") - col("__hi")).cast("double")
            / (col("n_rows") - lit(2L) * col("n_trimmed_each")).cast("double"))
          .as("trimmed_mean"): _*)
  }

  /** ROBUST CENTER per key: exact MEDIAN and MAD (median absolute
    * deviation) — the location/scale pair whose breakdown point survives
    * 50% garbage, for anomaly thresholds that a single pathological batch
    * cannot drag ([[graft.ops.EventAnalytics.volumeAnomalies]] uses
    * mean/stddev; this is the robust alternative's building block). Two
    * [[exactPercentiles]] passes: the median, then the median of
    * |x − median| with the per-key median broadcast back onto the scan —
    * both windows run over per-key DISTINCT-value histograms, and the
    * lerp matches quantile_cont bit-for-bit, so any engine reproduces the
    * pair exactly. */
  def robustCenter(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val med = exactPercentiles(df, keys, valueCol, Seq(0.5), Seq("median"))
    val dev = df.join(broadcast(med), keys)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("median")))
    val mad = exactPercentiles(dev, keys, "__dev", Seq(0.5), Seq("mad"))
    val n = df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    n.join(med, keys).join(mad, keys)
      .select(keys.map(col) :+ col("n_rows") :+ col("median") :+ col("mad"): _*)
  }

  /** [[exactPercentiles]] for NEAR-CONTINUOUS domains with FEW keys — the
    * case where the histogram path degrades (O(distinct)≈O(rows) per-key
    * ordered window, parallel only across keys). Same results, different
    * physical plan:
    *
    *  1. ONE pass: per key, n + approx_percentile probes at p ± margin
    *     (GK sketch — deterministic rank error ≤ n/accuracy), collected
    *     (|keys|·|ps| scalars — the plan-time-literal idiom);
    *  2. ONE pass: exact rank of each bracket start (count of values below
    *     it) via a broadcast join on the probe table — partial-aggregated
    *     counters, no window;
    *  3. ONE pass: only rows INSIDE a bracket (≈ margin·n per key·prob)
    *     survive the filter; the order statistics come from a window over
    *     that tiny set.
    *
    * Every pass is fully parallel — no per-key single-threaded scan; the
    * probes only choose brackets, so the output is exact (and identical to
    * [[exactPercentiles]] — equivalence spec) regardless of sketch
    * nondeterminism. If a bracket somehow misses its rank (coverage is
    * checked against the exact counts), falls back to the histogram path
    * rather than return an approximation. Collects |keys|·|ps| rows at
    * plan time — use the histogram path for high-cardinality keys. */
  def exactPercentilesBracketed(df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[Double], outNames: Seq[String], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length, "one output name per percentile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), "percentiles in [0,1]")
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull).select(keys.map(col) :+ v.as("__v"): _*)
    val margin = 4.0 / accuracy
    val probePs = ps.flatMap(p =>
      Seq(math.max(0.0, p - margin), math.min(1.0, p + margin)))
    val probeRows = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        expr(s"approx_percentile(__v, array(${probePs.mkString(",")}), $accuracy)").as("__probes"))
      .collect()
    // empty input, or null KEY values: the bracket path's equi-joins would
    // silently drop null-key groups that the histogram's groupBy keeps —
    // fall back rather than break the exact-equivalence contract
    if (probeRows.isEmpty || probeRows.exists(r => keys.indices.exists(r.isNullAt)))
      return exactPercentiles(df, keys, valueCol, ps, outNames)
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val keyFields = base.schema.fields.filter(f => keys.contains(f.name))
    val probeSchema = StructType(keyFields ++ Seq(
      StructField("__pi", IntegerType), StructField("__n", LongType),
      StructField("__alo", DoubleType), StructField("__ahi", DoubleType),
      StructField("__ilo", LongType), StructField("__ihi", LongType)))
    val probeData = probeRows.flatMap { r =>
      val n = r.getLong(keys.length)
      val probes = r.getSeq[Double](keys.length + 1)
      ps.indices.map { i =>
        val r0 = ps(i) * (n - 1) // the same double arithmetic as the histogram path
        Row.fromSeq(keys.indices.map(r.get) ++
          Seq[Any](i, n, probes(2 * i), probes(2 * i + 1),
            math.floor(r0).toLong, math.ceil(r0).toLong))
      }
    }
    val probeDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(probeData.toIndexedSeq, 1), probeSchema))
    val joined = base.join(probeDf, keys)
    // exact rank of each bracket start + coverage check counters
    val ranks = joined.groupBy(keys.map(col) :+ col("__pi"): _*)
      .agg(sum((col("__v") < col("__alo")).cast("long")).as("__cb"),
        sum((col("__v") <= col("__ahi")).cast("long")).as("__cble"))
      .collect()
    val covered = ranks.forall { r =>
      val (cb, cble) = (r.getLong(keys.length + 1), r.getLong(keys.length + 2))
      val pi = r.getInt(keys.length)
      val probe = probeData.find(p => keys.indices.forall(i => p.get(i) == r.get(i))
        && p.getInt(keys.length) == pi).get
      cb <= probe.getLong(keys.length + 4) && probe.getLong(keys.length + 5) < cble
    }
    if (!covered) return exactPercentiles(df, keys, valueCol, ps, outNames)
    val cbSchema = StructType(keyFields ++ Seq(
      StructField("__pi", IntegerType), StructField("__cb", LongType)))
    val cbDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(
        ranks.map(r => Row.fromSeq(keys.indices.map(r.get) ++
          Seq[Any](r.getInt(keys.length), r.getLong(keys.length + 1)))).toIndexedSeq, 1), cbSchema))
    // in-bracket rows only: tiny per (key, prob); order stats via a window
    // over the bracket histogram
    val cands = joined.filter(col("__v") >= col("__alo") && col("__v") <= col("__ahi"))
      .groupBy(keys.map(col) ++ Seq(col("__pi"), col("__n"), col("__ilo"), col("__ihi"), col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .join(cbDf, keys :+ "__pi")
    val wCum = Window.partitionBy(keys.map(col) :+ col("__pi"): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cands.withColumn("__cum", sum(col("__c")).over(wCum) + col("__cb"))
    def orderStat(rank: Column): Column = min(when(col("__cum") > rank, col("__v")))
    val stats = cum.groupBy(keys.map(col) :+ col("__pi"): _*)
      .agg(orderStat(col("__ilo")).as("__lo"), orderStat(col("__ihi")).as("__hi"),
        max(col("__n")).as("__n"))
    // pivot the |keys|·|ps| stat rows wide and interpolate with the SAME
    // Column arithmetic as the histogram path (bit-identical results)
    val wide = ps.indices.foldLeft(
      stats.select(keys.map(col): _*).distinct()) { case (acc, i) =>
      acc.join(stats.filter(col("__pi") === i)
        .select(keys.map(col) ++ Seq(col("__lo").as(s"__lo_$i"), col("__hi").as(s"__hi_$i"),
          col("__n").as(s"__n_$i")): _*), keys)
    }
    val out = ps.zip(outNames).zipWithIndex.foldLeft(wide) { case (d, ((p, name), i)) =>
      val r = lit(p) * (col(s"__n_$i") - 1)
      val frac = r - floor(r)
      // same lerp form as the histogram path (lo·(1−f) + hi·f) — see the
      // operand-order note there
      d.withColumn(name,
        col(s"__lo_$i") * (lit(1.0) - frac) + col(s"__hi_$i") * frac)
    }
    out.select(keys.map(col) ++ outNames.map(col): _*)
  }

  /** WINSORIZE a value column per group: clip to its group's
    * [lower, upper] exact percentile cuts (the standard outlier treatment
    * before scaling/training). The cut table is |groups| rows — broadcast
    * back onto the scan, so clipping adds NO shuffle (the q65 binning
    * shape). Adds `<out>` (clipped value), `<out>_lo`/`<out>_hi` (the
    * cuts). */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
      lower: Double, upper: Double, out: String): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper, "need 0 <= lower < upper <= 1")
    val cuts = exactPercentiles(df, keys, valueCol,
      Seq(lower, upper), Seq(s"${out}_lo", s"${out}_hi"))
    df.join(broadcast(cuts), keys)
      .withColumn(out,
        greatest(least(col(valueCol).cast("double"), col(s"${out}_hi")), col(s"${out}_lo")))
  }

  /** Shape 3 scale path: PIT windowed aggregate with TIME-BUCKETED join.
    *
    * [[pointInTimeAgg]] equi-joins facts to a key's ENTIRE feature history
    * and discards out-of-window rows afterwards — with months of history per
    * hot key the pre-filter fan-in is unbounded. Here both sides carry a
    * bucket column of width = the largest aggregate window `w`:
    * every feature row lands in its own bucket b and (replicated once) b+1,
    * so a fact in bucket b meets exactly the feature rows of buckets
    * {b−1, b} — a superset of its (factTs−w, factTs] window, 2·w of history
    * per fact regardless of total history length. The join becomes a plain
    * equi-join on (keys, bucket) — AQE/broadcast/skew handling apply — and
    * the per-agg range predicates then filter exactly as in the join path.
    *
    * Requires every aggregate to declare a window. Results are identical to
    * [[pointInTimeAgg]] (equivalence spec in ScalePathSpec). */
  def pointInTimeAggBucketed(
      facts: DataFrame, features: DataFrame, entityKeys: Seq[String],
      featureTs: String, factTs: String, aggs: Seq[AggregatedFeature]): DataFrame = {
    require(aggs.forall(_.window.isDefined),
      "bucketed PIT aggregation needs a time window on every aggregate")
    val wUs = aggs.map(_.window.get.window.getSeconds * 1000000L).max
    val rid = "__graft_row_id"
    val bkt = "__graft_bucket"
    val f = facts.withColumn(rid, monotonically_increasing_id())
      .withColumn(bkt, floor(unix_micros(col(factTs)) / wUs))
    val renamed = features.columns.map(c => c -> ("__r_" + c)).toMap
    val ft = features.select(features.columns.map(c => col(c).as(renamed(c))): _*)
    val fts = col(renamed(featureTs))
    // each feature row is visible from its own bucket and the next one
    val rbkt = "__graft_rbucket"
    val ftb = ft.withColumn(rbkt, explode(array(
      floor(unix_micros(fts) / wUs), floor(unix_micros(fts) / wUs) + 1)))
    val joined = f.join(ftb,
      (entityKeys.map(k => col(k) === col(renamed(k))) :+ (col(bkt) === col(rbkt)))
        .reduce(_ && _) && fts <= col(factTs), "left")
    val windowed = aggs.map { a =>
      val w = a.window.get.window.getSeconds
      val inWin = fts >= col(factTs) - expr(s"INTERVAL $w SECOND")
      a.agg(when(inWin, col(renamed(a.sourceColumn)))).as(a.name)
    }
    joined.groupBy(col(rid) +: facts.columns.map(col): _*)
      .agg(windowed.head, windowed.tail: _*)
      .drop(rid, bkt)
  }

  /** Shape 3: point-in-time windowed aggregate per fact row
    * (local/job.py:366-402): join facts×features on entities with the range
    * predicate factTs - w <= featureTs <= factTs, then group by the fact row
    * id. Facts keep all their columns; one aggregate column per feature. */
  def pointInTimeAgg(
      facts: DataFrame, features: DataFrame, entityKeys: Seq[String],
      featureTs: String, factTs: String, aggs: Seq[AggregatedFeature]): DataFrame = {
    val rid = "__graft_row_id"
    val f = facts.withColumn(rid, monotonically_increasing_id())
    val renamed = features.columns.map(c => c -> ("__r_" + c)).toMap
    val ft = features.select(features.columns.map(c => col(c).as(renamed(c))): _*)
    val fts = col(renamed(featureTs))
    val conds = entityKeys.map(k => col(k) === col(renamed(k)))
    val joined = f.join(ft, conds.reduce(_ && _) && fts <= col(factTs), "left")
    val windowed = aggs.map { a =>
      val inWin = a.window.map(_.window.getSeconds) match {
        case Some(w) => fts >= col(factTs) - expr(s"INTERVAL $w SECOND")
        case None => lit(true)
      }
      a.agg(when(inWin, col(renamed(a.sourceColumn)))).as(a.name)
    }
    joined.groupBy(col(rid) +: facts.columns.map(col): _*)
      .agg(windowed.head, windowed.tail: _*)
      .drop(rid)
  }

  /** Per-group exact MODE with a TOTAL tie order (most frequent value;
    * ties → smallest value): two partial-aggregated passes over (keys,
    * value) counts plus a top-1 window that compiles to `WindowGroupLimit`.
    * Spark's builtin `mode()` keeps an O(distinct) map per group in ONE
    * aggregation buffer and makes no tie promise; this form shuffles only
    * (keys, value, count) rows, ties are deterministic, and external
    * engines reproduce it exactly. */
  def groupMode(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col) :+ col(valueCol): _*).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__c").desc, col(valueCol))
    counts.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(keys.map(col) :+ col(valueCol).as("mode_value") :+
        col("__c").as("mode_count"): _*)
  }

  /** MERGEABLE distinct-count sketches (Apache DataSketches HLL, built into
    * Spark): one sketch per group. At 100 TB this is the distinct-count
    * pattern — `count_distinct` shuffles every distinct raw value, while
    * sketches partial-aggregate to a few KB per group and re-merge across
    * groups, days, or incremental loads in O(sketch) without rescanning. */
  def hllSketches(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .withColumn("est_distinct", hll_sketch_estimate(col("sketch")))

  /** Roll precomputed sketches up to coarser keys (possibly none = global):
    * sketch union + estimate, never touching raw data again. The UNIONED
    * sketch rides along so rollups chain (day → week → month) without ever
    * rescanning raw data — dropping it would force a rescan at the next
    * level and defeat the mergeable-sketch point. */
  def hllRollup(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))
      .withColumn("est_distinct", hll_sketch_estimate(col("sketch")))

  /** PORTABLE HyperLogLog registers: the engine-restatable sibling of
    * [[hllSketches]] (whose DataSketches binary is opaque to any oracle).
    * Hash = first 14 hex chars of md5 (56 bits, exact in any BIGINT);
    * bucket = low `lgK` bits, rank = 1 + leading zeros of the remaining
    * `width = 56 − lgK` bits (an integer when-chain — no libm log2), and a
    * group's register M_j is max(rank) over its bucket-j values. Every step
    * is integer arithmetic both engines reproduce bit-for-bit (SparkEntry
    * q137's DuckDB oracle restates it with `%`, `//` and CASE).
    * Returns (keys…, hll_bucket, hll_reg) — only OCCUPIED buckets
    * materialize; absent buckets mean register 0.
    *
    * At 100 TB this is the cardinality path that stays auditable: registers
    * are (group, int, int) rows that merge by elementwise max
    * ([[hllPortableRollup]]) across shards/days without rescanning, and any
    * engine — including the oracle — can recompute or verify them. */
  def hllPortableRegisters(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 8): DataFrame = {
    val (bucket, rho) = hllBucketRho(col(valueCol), lgK)
    // nulls are "no value", not a value: md5(NULL) would otherwise mint a
    // phantom NULL bucket with max rank and skew the estimate
    df.filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ bucket.as("hll_bucket") :+ rho.as("__rho"): _*)
      .groupBy(keys.map(col) :+ col("hll_bucket"): _*)
      .agg(max(col("__rho")).as("hll_reg"))
  }

  /** The (bucket, rank) derivation of the portable HLL, exposed as ONE
    * body so the batch registers ([[hllPortableRegisters]]) and the
    * streaming register state ([[graft.streaming.Streaming.stagedHllRun]])
    * cannot drift: bucket = low lgK bits of the 56-bit md5 prefix, rank =
    * 1 + leading zeros of the remaining bits (integer when-chain, no
    * libm). */
  def hllBucketRho(value: Column, lgK: Int): (Column, Column) = {
    require(lgK >= 4 && lgK <= 16, "4 <= lgK <= 16")
    val m = 1L << lgK
    val width = 56 - lgK
    val h = conv(substring(md5(value.cast("string")), 1, 14), 16, 10).cast("long")
    val bucket = h.bitwiseAND(lit(m - 1))
    // h >> lgK, exact (never a double division — 56-bit values exceed 2^53)
    val r = shiftright(h, lgK)
    var rho: Column = lit(width + 1) // r == 0 ⇒ all width bits are zeros
    for (k <- width to 1 by -1)
      rho = when(r >= lit(1L << (width - k)), lit(k)).otherwise(rho)
    (bucket, rho)
  }

  /** Merge portable HLL registers to coarser keys: elementwise max per
    * bucket — the HLL union, exact (not estimate-level) and restatable in
    * SQL, so rollup chains (shard → day → corpus) stay oracle-checkable. */
  def hllPortableRollup(regs: DataFrame, keys: Seq[String]): DataFrame =
    regs.groupBy(keys.map(col) :+ col("hll_bucket"): _*)
      .agg(max(col("hll_reg")).as("hll_reg"))

  /** Raw HLL estimate from portable registers, with the float work reduced
    * to ONE division of exact numbers: denom_scaled = Σ_j 2^(W−M_j) (W =
    * width+1 ≥ max rank) sums as exact longs — empty buckets contribute
    * 2^W — and est = numerator / denom_scaled where the numerator
    * α_m·m²·2^W is a single plan-time double literal (the oracle restates
    * the identical literal). No small/large-range corrections: this is the
    * raw estimator, accuracy-gated in PortableHllSpec; the point here is
    * exactness OF THE SKETCH, which DataSketches can't give an oracle.
    * Returns (keys…, n_buckets_set, denom_scaled, est_distinct). */
  def hllPortableEstimate(regs: DataFrame, keys: Seq[String], lgK: Int = 8): DataFrame = {
    val m = 1L << lgK
    val width = 56 - lgK
    val bigW = width + 1
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_buckets_set"),
        sum(call_function("shiftleft", lit(1L), lit(bigW) - col("hll_reg"))).as("__d"))
      .withColumn("denom_scaled",
        col("__d") + (lit(m) - col("n_buckets_set")) * lit(1L << bigW))
      .withColumn("est_distinct",
        lit(hllPortableNumerator(lgK)) / col("denom_scaled").cast("double"))
      .drop("__d")
  }

  /** The exact double literal α_m·m²·2^W both engines divide by
    * denom_scaled — exposed so SparkEntry's oracle embeds the same bits. */
  def hllPortableNumerator(lgK: Int): Double = {
    val m = (1L << lgK).toDouble
    val alpha =
      if (lgK == 4) 0.673 else if (lgK == 5) 0.697
      else if (lgK == 6) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, 56 - lgK + 1)
  }

  /** The shared slot derivation: ONE md5 per value, row d's slot = low
    * lgWidth bits of the d-th 8-hex-char (32-bit) chunk of the digest —
    * 128 md5 bits give 4 independent 32-bit rows, no per-depth re-hash.
    * `depthCol` must hold 0-based ints < 4. */
  private[graft] def cmsSlot(md5Hex: Column, depthCol: Column, lgWidth: Int): Column =
    conv(md5Hex.substr(depthCol * 8 + 1, lit(8)), 16, 10)
      .cast("long").bitwiseAND(lit((1L << lgWidth) - 1))

  /** PORTABLE Count-Min Sketch (Cormode & Muthukrishnan 2005): the FREQUENCY
    * sibling of [[hllPortableRegisters]] (distinct-count). `depth` hash rows
    * × `2^lgWidth` counters; row d hashes value v at slot = the d-th 32-bit
    * chunk of md5(v) masked to lgWidth bits ([[cmsSlot]]) — one digest per
    * value, the same md5-prefix primitive as the portable HLL. Counters are
    * PLAIN integer sums, so the sketch, its merge ([[cmsPortableRollup]] —
    * counter-wise add) and every estimate are bit-exact in any engine
    * (SparkEntry q150's DuckDB oracle recomputes all three), unlike the
    * opaque binary sketches of DataSketches.
    *
    * Execution shape: occurrences are pre-aggregated to (keys, value, n) —
    * ONE map-side-combined shuffle over the raw data — and only the
    * DISTINCT values are hashed and exploded to depth rows, so the md5 and
    * the depth-fan run over the vocabulary, not the corpus.
    *
    * At 100 TB this is the frequency path that stays auditable: per-shard
    * sketches are (group, int, int, long) rows bounded by depth·2^lgWidth
    * per group — they merge by addition across shards/days without
    * rescanning raw data, and point-frequency queries need only the merged
    * table. Only OCCUPIED slots materialize; absent slots mean 0. */
  def cmsPortableSketch(df: DataFrame, keys: Seq[String], valueCol: String,
      depth: Int = 4, lgWidth: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 4, "1 <= depth <= 4 (32 md5 bits per row)")
    require(lgWidth >= 4 && lgWidth <= 20, "4 <= lgWidth <= 20")
    df.filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ col(valueCol).cast("string").as("__v"): _*)
      .groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("cms_depth", explode(lit((0 until depth).toArray)))
      .withColumn("cms_slot", cmsSlot(md5(col("__v")), col("cms_depth"), lgWidth))
      .groupBy(keys.map(col) ++ Seq(col("cms_depth"), col("cms_slot")): _*)
      .agg(sum(col("__n")).as("cms_n"))
  }

  /** Merge portable CMS sketches to coarser keys: counter-wise SUM per
    * (depth, slot) — exact (the linearity of CMS), restatable in SQL, so
    * rollup chains (shard → day → corpus) stay oracle-checkable. */
  def cmsPortableRollup(sketch: DataFrame, keys: Seq[String]): DataFrame =
    sketch.groupBy(keys.map(col) ++ Seq(col("cms_depth"), col("cms_slot")): _*)
      .agg(sum(col("cms_n")).as("cms_n"))

  /** Point-frequency estimates from a portable CMS: for each probe value,
    * est = min over the depth rows of the counter at that row's slot (absent
    * slot = 0). Estimates NEVER undercount (every occurrence of the probe
    * landed in each probed slot); overcounts are collision mass, bounded in
    * expectation by (total − true)/2^lgWidth per row, and the min over
    * `depth` independent rows drives the tail down. The probe slots are
    * computed with the engine's own md5 — no JVM-side hashing — so the
    * DuckDB oracle reproduces them verbatim. Returns (keys…, probe,
    * est_count); the keys×probes×depth probe frame is tiny and broadcasts. */
  def cmsPortableEstimate(sketch: DataFrame, keys: Seq[String], probes: Seq[String],
      depth: Int = 4, lgWidth: Int = 10): DataFrame = {
    require(keys.nonEmpty, "estimate needs at least one group key")
    // groups × probes × depth fan-out as two narrow EXPLODES over the
    // distinct-keys frame (probes and depth indices are plan-time
    // literals) — no join, so no cross-join-shaped plan; slots are
    // computed per exploded row with the engine's md5
    sketch.select(keys.map(col): _*).distinct()
      .withColumn("probe", explode(lit(probes.toArray)))
      .withColumn("cms_depth", explode(lit((0 until depth).toArray)))
      .withColumn("cms_slot", cmsSlot(md5(col("probe")), col("cms_depth"), lgWidth))
      .join(sketch, keys ++ Seq("cms_depth", "cms_slot"), "left")
      .na.fill(0L, Seq("cms_n"))
      .groupBy(keys.map(col) :+ col("probe"): _*)
      .agg(min(col("cms_n")).as("est_count"))
  }

  /** MERGEABLE fixed-width HISTOGRAM sketches per group: bin = floor(value /
    * binWidth), one (keys…, bin, n) row per occupied bin. [[hllSketches]]'
    * quantile sibling, but — unlike HLL's opaque binary — the sketch is
    * PLAIN integer arithmetic, so it is engine-portable and oracle-checkable
    * (SparkEntry q104), and rollups are just re-aggregations of (bin, n).
    * State is O(occupied bins) per group vs percentile()'s O(rows) buffer;
    * quantile error is bounded by binWidth. */
  def histSketch(df: DataFrame, keys: Seq[String], valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    df.groupBy(keys.map(col) :+
        floor(col(valueCol).cast("double") / binWidth).cast("long").as("bin"): _*)
      .agg(count(col(valueCol)).as("n"))
  }

  /** Roll histogram sketches up to coarser keys without rescanning raw data:
    * re-sum per (coarser keys, bin). Chains like [[hllRollup]] (hour → day →
    * month), and merged sketches answer quantiles via [[histQuantile]]. */
  def histRollup(sketch: DataFrame, keys: Seq[String]): DataFrame =
    sketch.groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(sum(col("n")).as("n"))

  /** TIME-DECAYED aggregate (recency-weighted engagement counts, the
    * feature-store staple usually written `sum(x · exp(-λ·age))`) with
    * DYADIC decay: weight = 2^(−⌊age / halfLife⌋), computed ENTIRELY in
    * integers — value in fixed-point units (10^valueScale), shifted left by
    * (maxBuckets − bucket), summed as longs, divided ONCE at the end. One
    * exact integer sum + one correctly-rounded division means the result
    * is order-independent and bit-identical on any engine — which no
    * exp()-based decay can be (libm exp differs by ULPs across platforms,
    * float sums reorder under retries, and decimal rescaling casts round
    * differently per engine: Spark HALF_UP, DuckDB truncates). `asOf` is
    * an explicit reference time — decay against a pinned timestamp, never
    * wall-clock, so backfills reproduce. Events older than `maxBuckets`
    * half-lives weigh 0. One partial-aggregated groupBy; the scaled sum
    * stays < 2^53 for corpus sums up to 10^(15−valueScale−maxBuckets·0.3).
    */
  def decayedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      tsCol: String, asOf: java.sql.Timestamp, halfLifeSeconds: Long,
      maxBuckets: Int = 12, valueScale: Int = 2): DataFrame = {
    require(halfLifeSeconds > 0, "halfLifeSeconds > 0")
    require(maxBuckets >= 0 && maxBuckets <= 20, "0 <= maxBuckets <= 20")
    val age = lit(asOf).cast("long") - col(tsCol).cast("long")
    val b = floor(age / halfLifeSeconds.toDouble).cast("int")
    val unit = math.pow(10, valueScale).toLong
    val fixed = round(col(valueCol) * unit).cast("long")
    val term = fixed * call_function("shiftleft", lit(1L), lit(maxBuckets) - b)
    val denom = (unit * (1L << maxBuckets)).toDouble
    df.filter(col(tsCol) <= lit(asOf) && b <= maxBuckets)
      .groupBy(keys.map(col): _*)
      .agg((sum(term).cast("double") / denom).as("decayed_sum"),
        count(lit(1)).as("n_events"))
  }

  /** Approximate quantile FROM a histogram sketch: per group, the lower edge
    * (bin · binWidth) of the first bin whose cumulative count reaches
    * ceil(p · total) — deterministic integer-rank arithmetic (no float
    * cumulative fractions), so external engines restate it exactly. Error ≤
    * binWidth, the sketch's contract. One window pass over bins (there are
    * O(bins) rows here, not O(rows)). */
  def histQuantile(sketch: DataFrame, keys: Seq[String], p: Double,
      binWidth: Double): DataFrame = {
    require(p > 0 && p <= 1, "0 < p <= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("bin"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    sketch
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__rank", ceil(lit(p) * sum(col("n")).over(tot)).cast("long"))
      .filter(col("__cum") >= col("__rank") &&
        col("__cum") - col("n") < col("__rank"))
      .select(keys.map(col) :+ (col("bin") * binWidth).as("quantile_lo"): _*)
  }

  /** GROUPED OLS LINEAR TREND over integer (x, y) pairs — per group the
    * closed-form slope/intercept from the five classic sums:
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * The monitoring primitive behind "is this source's document length /
    * quality score drifting over ingest order" — a fitted direction per
    * slice, not a full regression stack.
    *
    * Determinism at any scale: every sum runs in DECIMAL(38,0)
    * unconditionally (operands pre-cast to DECIMAL(19,0) so products stay
    * exact — the TV-distance lesson: Σx² over ordinal ids passes 2^63 long
    * before the data is big, and non-ANSI long arithmetic wraps silently),
    * numerator and denominator are exact integers, and the only float ops
    * are ONE cast each plus ONE division — bit-identical in any IEEE
    * engine (DuckDB restates the sums in HUGEINT). A constant-x group
    * (den = 0) yields null slope/intercept rather than ±Inf.
    *
    * Plan shape: one groupBy with map-side partial aggregation — a single
    * shuffle of O(groups) rows, nothing else. */
  def linearTrend(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol).cast(d19)
    val y = col(yCol).cast(d19)
    val sums = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_points"),
      sum(col(xCol).cast(d38)).as("__sx"),
      sum(col(yCol).cast(d38)).as("__sy"),
      sum((x * y).cast(d38)).as("__sxy"),
      sum((x * x).cast(d38)).as("__sxx"))
    val n38 = col("n_points").cast(d38)
    val num = n38 * col("__sxy") - col("__sx") * col("__sy")
    val den = n38 * col("__sxx") - col("__sx") * col("__sx")
    val slope = when(den === lit(0L).cast(d38), lit(null))
      .otherwise(num.cast("double") / den.cast("double"))
    sums
      .withColumn("slope", slope)
      .withColumn("intercept",
        when(col("slope").isNull, lit(null)).otherwise(
          (col("__sy").cast("double") - col("slope") * col("__sx").cast("double")) /
            col("n_points").cast("double")))
      .select(col(groupCol), col("n_points"), col("slope"), col("intercept"))
  }

  /** GROUPED SPEARMAN RANK CORRELATION with exact tie correction — the
    * monotone-association sibling of [[linearTrend]] (OLS asks "linear in
    * the values"; this asks "monotone in the ranks", robust to outliers
    * and any monotone rescaling — the drift monitor for "does this score
    * still order the same way").
    *
    * Never ranks rows: both inputs are INTEGER expressions, so ranks come
    * from the marginal histograms — centered DOUBLED average ranks
    * (2·avgrank − (n+1) = 2·cumBelow + tieCount − n, an exact integer even
    * at half-rank ties) joined back onto the joint (x, y) histogram. The
    * windows and joins all run over O(group × value-range) histogram rows,
    * never the corpus. ρ = Σc·rx·ry / (√Σc·rx² · √Σc·ry²) with the sums
    * exact in DECIMAL(38,0) (bounded by 4n³ — inside 38 digits to n≈10¹²)
    * and the only float ops the final casts, two exact-rounded sqrts, and
    * one division — bit-identical in any IEEE engine. A group constant in
    * either variable yields NULL (ρ undefined), never 0/0. */
  def spearmanByGroup(df: DataFrame, groupCol: String, xInt: Column,
      yInt: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val joint = df.groupBy(col(groupCol), xInt.cast("long").as("__x"),
        yInt.cast("long").as("__y"))
      .agg(count(lit(1)).as("__c"))
    // centered doubled rank of each margin, as RANGE windows directly over
    // the joint histogram (RANGE, not ROWS: "strictly below this value"
    // must exclude every tied row, whatever (x, y) cell it sits in) — the
    // corpus folds ONCE; no marginal re-aggregation, no join-back
    def centered(valCol: String): Column = {
      val below = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
        .rangeBetween(Window.unboundedPreceding, -1)
      val ties = Window.partitionBy(col(groupCol), col(valCol))
      val wAll = Window.partitionBy(col(groupCol))
      coalesce(sum(col("__c")).over(below), lit(0L)) * 2L +
        sum(col("__c")).over(ties) - sum(col("__c")).over(wAll)
    }
    joint
      .withColumn("__rx", centered("__x"))
      .withColumn("__ry", centered("__y"))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_points"),
        sum((col("__c").cast(d19) * col("__rx").cast(d19) * col("__ry").cast(d19))
          .cast(d38)).as("__sxy"),
        sum((col("__c").cast(d19) * col("__rx").cast(d19) * col("__rx").cast(d19))
          .cast(d38)).as("__sxx"),
        sum((col("__c").cast(d19) * col("__ry").cast(d19) * col("__ry").cast(d19))
          .cast(d38)).as("__syy"))
      .select(col(groupCol), col("n_points"),
        when(col("__sxx") === lit(0L).cast(d38) || col("__syy") === lit(0L).cast(d38),
          lit(null).cast("double"))
          .otherwise(col("__sxy").cast("double")
            // one sqrt of the DOUBLE product (not sqrt·sqrt: that loses an
            // ulp and reports 0.99999…8 for a perfectly monotone group;
            // the decimal product would overflow 38 digits instead)
            / sqrt(col("__sxx").cast("double") * col("__syy").cast("double")))
          .as("rho"))
  }

  /** PER-SOURCE DATASET CARD — the datasheet row a curation run publishes
    * beside its output shards: doc count, size totals/extremes, mean size,
    * corpus share (milli), language spread, and the dominant language with
    * its share. Two narrow aggregates (a (source, lang) histogram and a
    * per-source stats fold) — never a row-level window; the corpus grand
    * total rides a window over the BOUNDED per-source frame (O(sources)
    * rows — the q180 lesson: a constant-key totals join folds to
    * BroadcastNestedLoopJoin). Top-language ties break lexicographically,
    * shares are integer `div`s and the mean one IEEE division of exact
    * longs, so any engine reproduces the card bit-for-bit. Reference
    * analogy: aligned's freshness/source-validation summaries
    * (feature_store.py:700+) extended to the corpus-profile card a 100 TB
    * training set ships with. */
  def datasetCard(df: DataFrame, sourceCol: String, langCol: String,
      sizeCol: String): DataFrame = {
    val sz = col(sizeCol).cast("long")
    val base = df.filter(sz.isNotNull)
    val langHist = base.groupBy(col(sourceCol), col(langCol).as("__lang"))
      .agg(count(lit(1)).as("__lc"))
    val wTop = Window.partitionBy(col(sourceCol))
      .orderBy(col("__lc").desc, col("__lang"))
    // rank <= 1 compiles to WindowGroupLimit — the top language never
    // materializes a per-source sort of the lang histogram
    val langs = langHist
      .withColumn("__r", row_number().over(wTop))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_langs"),
        max(when(col("__r") === 1, col("__lang"))).as("top_lang"),
        max(when(col("__r") === 1, col("__lc"))).as("__topc"))
    val stats = base.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(sz).as("chars_total"),
        min(sz).as("chars_min"), max(sz).as("chars_max"))
    stats.join(langs, sourceCol)
      .withColumn("__grand", sum(col("chars_total")).over(Window.partitionBy()))
      .select(col(sourceCol), col("n_docs"), col("chars_total"),
        col("chars_min"), col("chars_max"),
        (col("chars_total").cast("double") / col("n_docs").cast("double"))
          .as("mean_chars"),
        expr("(1000 * chars_total) div __grand").as("share_milli"),
        col("n_langs"), col("top_lang"),
        expr("(1000 * __topc) div n_docs").as("top_lang_milli"))
  }

  /** EXACT GINI COEFFICIENT per key over non-negative integer metrics —
    * the inequality monitor (how concentrated are doc sizes / daily
    * volumes / token masses within a slice; 0 = uniform,
    * (n−1)/n = one row holds everything), complementing [[graft.ops
    * .TextAnalysis.keyConcentration]]'s HHI which reads SHARE
    * concentration over categories where Gini reads VALUE inequality over
    * rows. Exact rank formula with ties:
    *
    *   G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n
    *
    * where a tied block of c copies of v occupies ranks cb+1..cb+c (cb =
    * count strictly below), contributing v·(c·cb + c(c+1)/2) — so the
    * whole rank sum comes from the per-key DISTINCT-VALUE histogram (the
    * [[exactPercentiles]] idiom: the ordered window runs over distinct
    * values, never rows). The rank sum accumulates in DECIMAL(38,0) (it
    * is bounded by v_max·n², far past 2⁶³ at corpus scale); the float
    * tail is one fixed IEEE tree. Negative values fail loudly (Gini is
    * undefined); an all-zero key yields NULL (0/0). A tied block past
    * 3·10⁹ copies of ONE value in ONE key would overflow the triangular
    * long — loud error, widen to a decimal triangle then. Returns
    * (keys…, n_rows, total_value, gini). */
  def giniByGroup(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v0 = col(valueCol).cast("long")
    val v = when(v0 < 0, raise_error(concat(
        lit(s"giniByGroup: negative $valueCol — Gini is undefined; value "),
        v0.cast("string")))).otherwise(v0)
    val hist = df.filter(v0.isNotNull)
      .groupBy(keys.map(col) :+ v.as("__v"): _*).agg(count(lit(1)).as("__c"))
    val wBelow = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("__cb", coalesce(sum(col("__c")).over(wBelow), lit(0L)))
    val cGuard = when(col("__c") > lit(3000000000L), raise_error(lit(
      "giniByGroup: > 3e9 ties on one value in one key — the triangular " +
        "term would overflow long; widen it to DECIMAL(38,0)"))).otherwise(col("__c"))
    // c(c+1)/2 in exact longs: the product is even, so a right shift IS
    // the halving (a double division would round past 2^53)
    val tri = shiftright((cGuard * (col("__c") + lit(1L))).cast("long"), 1)
    cum.groupBy(keys.map(col): _*)
      .agg(sum(col("__c")).as("n_rows"),
        sum((col("__v").cast(d19) * col("__c").cast(d19)).cast(d38))
          .cast("long").as("total_value"),
        sum((col("__v").cast(d19)
          * (col("__c").cast(d19) * col("__cb").cast(d19)
            + tri.cast(d19))).cast(d38)).as("__a"))
      .select(keys.map(col) :+ col("n_rows") :+ col("total_value") :+
        when(col("total_value") === 0L, lit(null).cast("double"))
          .otherwise(lit(2.0) * col("__a").cast("double")
            / (col("n_rows").cast("double") * col("total_value").cast("double"))
            - (col("n_rows") + lit(1L)).cast("double")
              / col("n_rows").cast("double")).as("gini"): _*)
  }

  /** EXACT PERCENTILE-RANK transform: appends SQL `percent_rank` of
    * `valueCol` within each key group — (rank − 1)/(n − 1) with ties
    * sharing the MIN rank — WITHOUT sorting rows: ranks come from the
    * per-key DISTINCT-VALUE histogram (cumulative count of
    * strictly-smaller values + 1), joined back on (keys, value), so the
    * ordered window runs over distinct values, not rows (the
    * [[exactPercentiles]] idiom). The ratio is one IEEE division of two
    * exact integers — bit-identical in any engine. Single-value groups get
    * 0.0 (percent_rank's convention); NULL values pass through with a NULL
    * rank (left join). The per-row normalized position is the standard
    * quality-score calibration step before cross-source thresholding
    * (reference: transformation.py grouped rank transforms). */
  def percentileRank(df: DataFrame, keys: Seq[String], valueCol: String,
      outCol: String): DataFrame = {
    // DOUBLE, not long (the exactPercentiles rule): fractional quality
    // scores are this operator's advertised input, and a silent long cast
    // would collapse distinct scores onto truncated integers — wrong ranks
    // with no error. Distinct-value histogram cardinality is the same
    // bound either way; the join-back key compares the identical cast.
    val v = col(valueCol).cast("double")
    val hist = df.filter(v.isNotNull)
      .groupBy(keys.map(col) :+ v.as("__v"): _*).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val ranks = hist
      .withColumn("__rank", sum(col("__c")).over(wCum) - col("__c") + lit(1L))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .select(keys.map(col) :+ col("__v") :+
        when(col("__n") > lit(1L),
          (col("__rank") - lit(1L)).cast("double")
            / (col("__n") - lit(1L)).cast("double"))
          .otherwise(lit(0.0)).as(outCol): _*)
    df.withColumn("__v", v)
      .join(ranks, (keys :+ "__v").toSeq, "left")
      .drop("__v")
  }
}
