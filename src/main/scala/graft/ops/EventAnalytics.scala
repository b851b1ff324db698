package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an event stream (user_id, ts, …) — the
  * product-analytics layer next to [[Aggregations]]'s sessionization
  * (reference scope ends at windowed aggregates; funnels/retention are the
  * standard questions asked of the same events table).
  *
  * Both operators aggregate FIRST and join the per-user skeletons after —
  * every shuffle is on the user key with map-side partials, never on raw
  * events × stages.
  */
object EventAnalytics {

  /** ORDERED FUNNEL: for each user, the earliest timestamp of stage 1, then
    * the earliest stage-2 event AT OR AFTER it, and so on — each step
    * optionally within `maxStepGap` of the previous. Returns one row per
    * user who completed stage 1, with `ts_1..ts_k` (null once a stage is
    * missed) and `stages_completed`.
    *
    * Plan: stage i is one filtered aggregation on the user key joined to
    * the stage-(i−1) skeleton — k partial-aggregated passes, all sharing
    * the user-key partitioning, no event×event self-join. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[Column], maxStepGap: Option[java.time.Duration] = None): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val first = events.filter(stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("ts_1"))
    val funneled = stages.zipWithIndex.drop(1).foldLeft(first) { case (prev, (pred, i)) =>
      val prevTs = col(s"ts_$i")
      val gapOk = maxStepGap.fold(lit(true))(g =>
        col(tsCol) <= prevTs + expr(s"INTERVAL ${g.getSeconds} SECOND"))
      val next = events.filter(pred)
        .join(prev.select(col(userCol), prevTs), Seq(userCol))
        .filter(col(tsCol) >= prevTs && gapOk)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"ts_${i + 1}"))
      prev.join(next, Seq(userCol), "left")
    }
    val completed = stages.indices.map(i => col(s"ts_${i + 1}").isNotNull.cast("int"))
      .reduce(_ + _)
    funneled.withColumn("stages_completed", completed)
  }

  /** Funnel CONVERSION COUNTS: one row per stage with the number of users
    * whose ordered journey reached it (monotone by construction). */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[Column], maxStepGap: Option[java.time.Duration] = None): DataFrame = {
    val f = funnel(events, userCol, tsCol, stages, maxStepGap)
    // coalesce: a funnel nobody entered must count 0, not null (a global
    // agg over an empty frame yields one all-null row)
    val counts = stages.indices.map(i =>
      coalesce(sum(col(s"ts_${i + 1}").isNotNull.cast("long")), lit(0L)).as(s"__s${i + 1}"))
    val one = f.agg(counts.head, counts.tail: _*)
    val rows = stages.indices.map(i =>
      struct(lit(i + 1).as("stage"), col(s"__s${i + 1}").as("n_users")))
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** COHORT RETENTION: cohort = the user's first-activity week (Monday
    * date_trunc, ISO — identical in Spark and DuckDB); one row per
    * (cohort_week, week_offset) with the distinct users active then.
    * Weeks are exact integer arithmetic on epoch seconds (a 7-day week is
    * 604800 s — date_trunc output carries no DST here because the session
    * runs UTC). Two aggregations on the user key + one distinct count —
    * no event×event join. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val week = date_trunc("week", col(tsCol))
    val firstWeek = events.groupBy(col(userCol))
      .agg(min(week).as("__cohort"))
    val active = events.select(col(userCol), week.as("__week")).distinct()
    active.join(firstWeek, Seq(userCol))
      .withColumn("week_offset",
        ((unix_timestamp(col("__week")) - unix_timestamp(col("__cohort"))) / 604800L)
          .cast("long"))
      .groupBy(col("__cohort").cast("date").as("cohort_week"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** EVENT-TRANSITION matrix (first-order Markov counts): for each user's
    * time-ordered event sequence, count (event_type → next event_type)
    * adjacencies and the conditional probability given the source type.
    * One lead() window on the user key + one partial-aggregated groupBy on
    * the O(types²) pair space; probabilities are exact integer ratios.
    * Ties on ts break by `tieCol` so sequences are total. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    pairs.withColumn("p_cond",
      col("n").cast("double") / sum(col("n")).over(tot).cast("double"))
  }

  /** INTER-ARRIVAL gaps: seconds between consecutive events per user (one
    * lag window on the user key), the raw material for engagement-cadence
    * features and session-gap calibration — feed the output through
    * [[graft.ops.Aggregations.histSketch]] for the distribution (q131
    * composes exactly that). Ties on ts break by `tieCol`. */
  def interArrival(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col(userCol),
        (col(tsCol).cast("long") - col("__prev").cast("long")).as("gap_sec"))
  }

  /** SCD TYPE-2 history from a CHANGELOG: one row per change event carrying
    * `valid_from` (the event ts), `valid_to` (the NEXT change's ts for the
    * same key — null while current) and `is_current`. The batch complement
    * of `Streaming.statefulLatest`: replaying a CDC/update stream into the
    * validity-interval table a point-in-time join can consume directly
    * (reference PIT semantics `local/job.py:567-595` — a feature value is
    * valid from its event until superseded).
    *
    * One window shuffle on the entity key; ties on ts break by `tieCol` so
    * the interval chain is total and deterministic. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Changelog COMPACTION: the current snapshot only — the latest change per
    * key (same window, `WindowGroupLimit` pushes a partial top-1 below the
    * exchange, so raw history never shuffles whole). */
  def latestSnapshot(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** DAILY-VOLUME ANOMALY SCORES per key: z-score of each (key, day)'s
    * event count against that key's own daily mean/σ — the ingest-monitor
    * question "did source X suddenly send 5× its usual volume (or go
    * dark)?" asked of the same events table the funnels read.
    *
    * The per-key day grid is DENSIFIED between that key's first and last
    * active day (`sequence` + explode, zero-filled) before scoring, so a
    * day the source went completely dark IS a scored row (n_events = 0,
    * negative z) rather than silently absent from the groupBy — the
    * ADVICE r10 finding. Days outside a key's own [min, max] activity span
    * are not scored (there is no principled global calendar for a key that
    * didn't exist yet). The grid is O(span days) per key — bounded by
    * calendar time, never by event volume.
    *
    * Determinism: mean and the variance numerator n·Σc² − (Σc)² are exact
    * DECIMAL(38,0) integers (counts pre-cast to DECIMAL(19,0) before
    * squaring — per-day counts at 100 TB overflow a squared long), and the
    * float tail is a FIXED chain: two casts, one division for the mean,
    * one sqrt (IEEE-754 requires sqrt correctly rounded — bit-exact in
    * every engine, unlike libm log/exp), one subtraction, one division. A
    * constant-volume key (variance 0) scores z = 0 for every day rather
    * than 0/0.
    *
    * Plan shape: one groupBy (key, day) with map-side partials, then one
    * window pass PARTITIONED BY KEY over the per-day rows — O(keys·days)
    * rows in the window, never raw events; no global window, no second
    * scan. */
  def volumeAnomalies(events: DataFrame, tsCol: String, keyCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    require(zThreshold > 0, s"zThreshold=$zThreshold must be positive")
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val active = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).as("__c"))
    // zero-fill the key's own activity span: one bounded O(keys) aggregate
    // for the spans, one explode of O(span days) rows per key, one
    // co-partitioned left join back — raw events are scanned exactly once
    val grid = active.groupBy(col(keyCol))
      .agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("__d"))
    val daily = grid.join(active, Seq(keyCol, "__d"), "left")
      .select(col(keyCol), date_format(col("__d"), "yyyy-MM-dd").as("day"),
        coalesce(col("__c"), lit(0L)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val c19 = col("n_events").cast(d19)
    val withSums = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sc", sum(col("n_events").cast(d38)).over(w))
      .withColumn("__scc", sum((c19 * c19).cast(d38)).over(w))
    val n38 = col("__n").cast(d38)
    val varNum = n38 * col("__scc") - col("__sc") * col("__sc")
    val mean = col("__sc").cast("double") / col("__n").cast("double")
    val sd = sqrt(varNum.cast("double") / (col("__n") * col("__n")).cast("double"))
    val z = when(varNum === lit(0L).cast(d38), lit(0.0))
      .otherwise((col("n_events").cast("double") - mean) / sd)
    withSums
      .withColumn("z_score", z)
      .withColumn("is_anomaly", abs(col("z_score")) > zThreshold)
      .select(col(keyCol), col("day"), col("n_events"), col("z_score"),
        col("is_anomaly"))
  }
}
