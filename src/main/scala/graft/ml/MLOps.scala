package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exposed-model abstraction (reference: exposed_model/interface.py:102+).
  * In a Scala engine, user models are first-class code: a model is a function
  * DataFrame → DataFrame. The reference's dill-pickled variants have no JVM
  * analog (SURVEY §7.4); CodePredictor/PolarsExpression models map to
  * expression-based models, heavyweight inference maps to mapPartitions.
  */
trait ExposedModel {
  def name: String
  def version: String
  def predict(input: DataFrame): DataFrame
}

/** A model that is a pure column expression over its inputs (the reference's
  * PolarsExpression model, exposed_model/interface.py:433). Stays inside
  * whole-stage codegen. */
final case class ExpressionModel(name: String, version: String, output: String, expr: Column)
    extends ExposedModel {
  def predict(input: DataFrame): DataFrame = input.withColumn(output, expr)
}

/** Per-partition batched inference (the mapPartitions shape used for real
  * model servers / embedding models — exposed_model/interface.py:251,
  * ollama.py etc.). `f` sees an iterator of rows per partition so it can
  * batch RPC calls; here the contract is DataFrame→DataFrame to stay
  * engine-agnostic. */
final case class FunctionModel(name: String, version: String, f: DataFrame => DataFrame)
    extends ExposedModel {
  def predict(input: DataFrame): DataFrame = f(input)
}

/** Text-embedding model surface (reference: WordVectoriser +
  * EmbeddingModel zoo, schemas/text_vectoriser.py; OllamaEmbedding,
  * transformation.py:2744-2867). Real models plug in as a FunctionModel
  * wrapping mapPartitions batch inference; this deterministic stand-in keeps
  * the whole embedding → index → search pipeline testable offline: dim i of
  * the vector is a hash of (text, i) scaled to [-1, 1] — pure codegen'd
  * expressions, no UDF. */
final case class HashEmbeddingModel(
    name: String, version: String,
    textCol: String, out: String = "embedding", dims: Int = 16) extends ExposedModel {
  def predict(input: DataFrame): DataFrame =
    input.withColumn(out, array((0 until dims).map { i =>
      ((pmod(xxhash64(col(textCol), lit(i)), lit(2000)) - 1000).cast("double") / 1000.0)
        .cast("float")
    }: _*))
}

object MLOps {

  /** Shadow deployment (exposed_model/interface.py:517): all rows scored by
    * the primary, a fraction also scored by the shadow, outputs unioned with
    * a `model_version` provenance column. Deterministic hash-based sampling
    * (no rand() — reproducible across retries, which matters for exactly-once
    * sinks). */
  def shadow(primary: ExposedModel, shadowModel: ExposedModel, fraction: Double, idCol: String)(
      input: DataFrame): DataFrame = {
    val p = primary.predict(input).withColumn("model_version", lit(primary.version))
    val routed = input.filter(pmod(xxhash64(col(idCol)), lit(10000)) < lit(math.round(fraction * 10000).toInt))
    val s = shadowModel.predict(routed).withColumn("model_version", lit(shadowModel.version))
    p.unionByName(s)
  }

  /** Deterministic bucket in [0, buckets) from the md5 hex prefix of a key.
    * Slower than xxhash64 but reproducible in ANY engine with md5 — the
    * router to use when assignment must be auditable outside Spark
    * (duckdb: `CAST('0x'||substr(md5(CAST(k AS VARCHAR)),1,8) AS BIGINT) % buckets`). */
  def md5Bucket(c: Column, buckets: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** SHARD MANIFEST — the per-shard integrity card of an exported training
    * dataset: row count plus an ORDER-INDEPENDENT integer checksum (sum of
    * a 32-bit md5 prefix over the concatenated key columns), so a copy,
    * re-export, or engine port can be verified shard-by-shard without
    * reading rows in any particular order. 32-bit summands keep the sum
    * long-safe to 2³¹ rows per shard; the md5 base makes the checksum
    * recomputable in ANY engine (same portability family as
    * [[md5Bucket]]). One partial-aggregated pass — no window, no driver
    * state; at 100 TB this is the cheapest possible full-scan shape.
    * NULL key columns are skipped by concat_ws identically in Spark and
    * DuckDB, so the checksum stays engine-portable on sparse rows. */
  def shardManifest(df: DataFrame, shardCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(md5(concat_ws("\u0001",
            keyCols.map(c => col(c).cast("string")): _*)), 1, 8), 16, 10)
          .cast("long")).as("checksum"))

  /** Deterministic STRATIFIED sampling: keep a row iff its key's hash bucket
    * falls under its stratum's rate — per-class downsampling of a training
    * corpus (e.g. keep 10% of crawl text but 100% of curated text) with no
    * rand(), so the sample is stable across retries/engines and any subset
    * rerun reproduces the same rows. Pure narrow filter — no shuffle, no
    * per-stratum pass; the stratum rate is a CASE expression. Uses
    * [[md5Bucket]] (1e6 buckets) so external engines can audit membership. */
  def stratifiedSampleHash(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val buckets = 1000000
    // math.round, not truncation: (0.29 * 1e6).toLong is 289999 in IEEE
    // arithmetic, which would disagree with any external engine auditing
    // membership against the documented threshold 290000
    val rateBuckets = rates.foldLeft(lit(math.round(defaultRate * buckets))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(math.round(r * buckets))).otherwise(acc)
    }
    df.filter(md5Bucket(col(keyCol), buckets) < rateBuckets)
  }

  /** IMPORTANCE sampling with a per-row CONTINUOUS rate: keep a row iff its
    * key's bucket falls under `rate` (a Column in [0,1] — e.g. a quality
    * score, a length-proportional weight, an upsample factor for rare
    * classes). The md5 keying keeps it deterministic and nested like
    * [[stratifiedSampleHash]]: raising any row's rate only ever ADDS rows.
    * Pure narrow filter. */
  def sampleByRate(df: DataFrame, keyCol: String, rate: Column): DataFrame = {
    val buckets = 1000000
    df.filter(md5Bucket(col(keyCol), buckets).cast("double") < rate * buckets)
  }

  /** WEIGHTED sampling WITHOUT replacement, exactly k per group
    * (Efraimidis-Spirakis A-ES): each row draws priority log2(u)/w from
    * the md5 of its key — u uniform on (0,1], w the row's weight — and
    * the k LARGEST priorities win, which is distributionally identical to
    * weighted draws without replacement. The deterministic way to take
    * "k documents per source, weighted by quality/length" where Bernoulli
    * thresholding ([[sampleByRate]]) cannot hit an exact k and plain
    * [[groupCap]] ignores weights. log2 goes through
    * [[graft.functions.Portable.log2Micro]] (integer fixed point, no
    * libm) and the division by w is one correctly-rounded IEEE op, so any
    * engine ranks the identical priorities. Zero/negative/NULL weights
    * fail loudly — a silent drop would skew the distribution invisibly.
    *
    * Plan shape at 100 TB: rank ≤ k compiles to WindowGroupLimit — each
    * task keeps only its local top-k per group before the shuffle; no
    * full per-group sort materializes. */
  def weightedSampleK(df: DataFrame, groupCol: String, keyCol: String,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"weightedSampleK: k=$k must be >= 1")
    // +1 maps the 32-bit hash onto (0, 2^32] so u is never 0 and
    // log2(u) = log2(h+1) − 32 is always defined; u = 1 gives priority 0
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(1L)
    val w = when(weight.isNull || weight <= lit(0), raise_error(concat(
        lit("weightedSampleK: non-positive or NULL weight for key "),
        col(keyCol).cast("string")))).otherwise(weight.cast("double"))
    val win = Window.partitionBy(col(groupCol))
      .orderBy(col("__pr").desc, col(keyCol))
    df.withColumn("__pr",
        (graft.functions.Portable.log2Micro(h) - lit(32000000L)).cast("double") / w)
      .withColumn("sample_rank", row_number().over(win))
      .filter(col("sample_rank") <= k)
      .drop("__pr")
  }

  /** MIXTURE RESAMPLING to target domain weights (the DoReMi/Pile recipe:
    * downsample over-represented sources until the kept corpus approaches
    * `targetFracs`): keep_rate(g) = min(1, target_g · N / n_g), thresholded
    * through the auditable md5 router. Sources absent from `targetFracs`
    * keep rate 1 (pass through). Rates are DATA-DRIVEN (per-group counts +
    * the corpus total) but the plan stays two partial-aggregated passes:
    * the tiny per-group count table gets its total from an unpartitioned
    * window over itself (a |groups|-row frame — never a 1-row join, which
    * would fold to a nested loop) and broadcast-joins back onto the scan.
    * Cannot upsample (rate caps at 1) — like any filter-based resampler. */
  def mixtureResample(df: DataFrame, keyCol: String, groupCol: String,
      targetFracs: Map[String, Double]): DataFrame = {
    val buckets = 1000000
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .withColumn("__total", sum(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val target = targetFracs.foldLeft(lit(Double.NaN)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit(f)).otherwise(acc)
    }
    val rate = when(isnan(target), lit(1.0))
      .otherwise(least(lit(1.0), target * col("__total").cast("double") / col("__n").cast("double")))
    val rates = counts.select(col(groupCol), rate.as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      // round, never truncate ((0.29*1e6).toLong is 289999); round() is
      // half-away-from-zero in both JVM BigDecimal-land and DuckDB
      .filter(md5Bucket(col(keyCol), buckets) < round(col("__rate") * buckets).cast("long"))
      .drop("__rate")
  }

  /** TEMPERATURE resampling (Pile/DoReMi-style α-mixing): target fraction
    * of group g ∝ n_g^α, flattening the natural size distribution toward
    * uniform as α → 0. Restricted to α = 0.5 — sqrt is IEEE
    * correctly-rounded, so every engine computes the identical weight,
    * while pow(x, α) for general α is a libm estimate that differs by ULPs
    * across platforms and would never hash-match. Group counts are
    * plan-time scalars (groups are bounded — domains, languages); weights
    * sum LEFT-TO-RIGHT over groups sorted by name, so the normalizing
    * total is order-deterministic and an external engine reproduces it
    * with an ordered cumulative sum. Sampling itself is
    * [[mixtureResample]]'s md5-threshold filter. */
  def temperatureResample(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    // NULL-group rows are not part of the mixture: they pass through at
    // rate 1 (the CASE fallback) and add no weight mass — String.valueOf(null)
    // would otherwise mint a phantom "null" stratum that never joins back
    // yet deflates every real group's rate
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(groupCol).agg(count(lit(1)).as("n"))
      // keep the NATIVE group value for the filter literal — routing
      // through String.valueOf and an implicit-cast comparison would
      // silently send non-string groups (dates, decimals, booleans whose
      // string form does not cast back) to the default rate. The string
      // form is used ONLY to order the weight summation deterministically.
      .collect().map(r => r.get(0) -> r.getLong(1))
      .sortBy { case (g, _) => String.valueOf(g) }
    require(counts.nonEmpty, "temperatureResample: no non-null groups")
    val weights = counts.map { case (g, n) => (g, n, math.sqrt(n.toDouble)) }
    val total = weights.map(_._3).foldLeft(0.0)(_ + _) // left-to-right, sorted
    val bigN = counts.map(_._2).sum.toDouble
    // everything is already on the driver: apply the rates as ONE narrow
    // CASE filter over typed literals (same shape as stratifiedSampleHash;
    // re-deriving them through mixtureResample would aggregate the counts a
    // second time and add a broadcast join to the executed plan)
    val buckets = 1000000
    val rateBuckets = weights.foldLeft(lit(math.round(1.0 * buckets))) {
      case (acc, (g, n, w)) =>
        val rate = math.min(1.0, w / total * bigN / n.toDouble)
        when(col(groupCol) === lit(g), lit(math.round(rate * buckets))).otherwise(acc)
    }
    df.filter(md5Bucket(col(keyCol), buckets) < rateBuckets)
  }

  /** Deterministic EPOCH SHUFFLE: the training-export ordering. Sorting by
    * md5(epoch ‖ key) gives a different-but-reproducible permutation per
    * epoch — retries, speculative tasks, and other engines all agree, which
    * `ORDER BY rand()` never does. A Spark `orderBy` is a RANGE-partitioned
    * distributed sort (sampled boundaries → per-partition sorts), so this
    * scales to any corpus; take the first n of the ordering for shard i=0,
    * or write with `sortWithinPartitions` for the full sharded export. No
    * global row-number window anywhere (that would serialize on one task). */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame =
    df.orderBy(
      md5Bucket(concat_ws(":", lit(epoch), col(keyCol)), 1000000), col(keyCol))

  /** EQUAL-TOKEN training shards via a DISTRIBUTED PREFIX SUM: assign each
    * document to shard ⌊tokens_before / targetTokens⌋ in the deterministic
    * md5 corpus order — every shard carries ~targetTokens tokens, so no
    * training worker drags a fat-shard tail. A naive global cumulative sum
    * is a single-partition window; here the corpus hashes into `buckets`
    * COARSE buckets, per-bucket token totals (tiny) prefix-sum on the
    * driver, and each bucket's offset broadcasts back — the in-bucket
    * cumulative window runs partitioned by bucket, fully parallel, and
    * equals the global cumsum because bucket order is a prefix of row
    * order. All-integer arithmetic → portable. Returns df + (n_tok_col,
    * shard). */
  def tokenShards(df: DataFrame, keyCol: String, tokenCount: Column,
      targetTokens: Long, buckets: Int = 256,
      shardCol: String = "shard"): DataFrame = {
    require(targetTokens > 0 && buckets > 0, "targetTokens > 0, buckets > 0")
    withTokenPrefix(df, keyCol, tokenCount, buckets)
      .withColumn(shardCol, floor(col("__before") / targetTokens.toDouble).cast("long"))
      .drop("__before")
  }

  /** The DISTRIBUTED PREFIX SUM shared by [[tokenShards]] and
    * [[packSequences]]: adds `__n` (the long token count) and `__before`
    * (tokens strictly before this row in the global md5 corpus order) —
    * per-bucket totals prefix-sum on the driver (O(buckets) rows pulled),
    * offsets broadcast back as one plan literal, in-bucket cumulative
    * windows fully parallel. Equal to the global cumsum because bucket
    * order is a prefix of the (u, key) row order. */
  private[graft] def withTokenPrefix(df: DataFrame, keyCol: String,
      tokenCount: Column, buckets: Int): DataFrame = {
    val u = md5Bucket(col(keyCol), 1000000)
    // monotone in u and strictly < buckets — bucket boundaries refine the
    // md5 order, so (bucket, u, key) IS the global (u, key) order
    val b = floor(u * buckets / lit(1000000.0)).cast("int")
    val based = df.withColumn("__n", tokenCount.cast("long"))
      .withColumn("__b", b).withColumn("__u", u)
    // a bucket whose every tokenCount is null sums to NULL, not 0 — guard
    // the unbox or the whole shard assignment NPEs on one bad bucket
    val totals = based.groupBy("__b").agg(sum(col("__n")).as("__t"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val offsets = {
      var acc = 0L
      (0 until buckets).map { i =>
        val o = i -> acc; acc += totals.getOrElse(i, 0L); o
      }.toMap
    }
    val offCol = element_at(
      typedLit((0 until buckets).map(i => offsets(i))), col("__b") + 1)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))
      .orderBy(col("__u"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    based
      .withColumn("__before", coalesce(sum(col("__n")).over(w), lit(0L)) + offCol)
      .drop("__b", "__u")
  }

  /** CONTEXT-WINDOW PACKING PLAN (concat-and-chunk, the GPT-style training
    * layout): lay the corpus out as one deterministic token stream — the
    * md5 corpus order of [[epochShuffle]]/[[tokenShards]] — and split it
    * at every `seqLen` boundary. Each document then occupies the
    * half-open token span [before, before + n_tok), so its sequence
    * assignment is pure integer arithmetic on the prefix sum:
    * start_seq = before div L, end_seq = (before + n − 1) div L, and
    * `n_seqs_spanned`/`is_split` read off whether the document straddles a
    * boundary. Zero waste by construction (every slot is a token); the
    * split fraction is the packing-quality number a training team tunes
    * seqLen against. A zero-token document occupies no span: NULL
    * sequence bounds, n_seqs_spanned = 0, never a phantom slot.
    *
    * Reference-semantics anchor: the training-export side of aligned's
    * dataset store (`aligned/schemas/folder.py` train/test artifacts);
    * the packing itself is the standard LM data layout aligned leaves to
    * the trainer.
    *
    * Plan shape at 100 TB: identical to [[tokenShards]] — the
    * O(buckets) driver prefix-sum plus per-bucket windows; everything
    * else is per-row arithmetic. All-integer (`div`, not float floor),
    * so the plan is exact and engine-portable at any corpus size. */
  def packSequences(df: DataFrame, keyCol: String, tokenCount: Column,
      seqLen: Long, buckets: Int = 256): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be > 0, got $seqLen")
    require(buckets > 0, "packSequences: buckets > 0")
    withTokenPrefix(df, keyCol, tokenCount, buckets)
      .withColumn("start_seq",
        when(col("__n") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"__before div ${seqLen}L")))
      .withColumn("end_seq",
        when(col("__n") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"(__before + __n - 1) div ${seqLen}L")))
      .withColumn("n_seqs_spanned",
        coalesce(col("end_seq") - col("start_seq") + 1L, lit(0L)))
      .withColumn("is_split", col("n_seqs_spanned") > 1L)
      .withColumnRenamed("__n", "n_tok")
      .withColumnRenamed("__before", "tokens_before")
  }

  /** CURRICULUM ORDER — materialize a deterministic global training order
    * (SparkEntry q179): rank 1..N in (phase asc, md5 shuffle within phase)
    * order — the sequence-length-warmup / easy-to-hard curriculum, with
    * the md5 hash standing in for the within-phase shuffle so the order is
    * reproducible in any engine. Same distributed-prefix-sum shape as
    * [[tokenShards]], never a global window: per-(phase, coarse-bucket)
    * COUNTS (O(phases·buckets) rows) prefix-sum on the driver, offsets
    * broadcast back, and the in-bucket row_number window runs partitioned
    * by (phase, bucket) — fully parallel, equal to the global rank because
    * (phase, bucket) order is a prefix of (phase, u, key) order. `phase`
    * must evaluate into [0, phases) — out-of-range fails loudly here, not
    * as a silent mis-ranking, and so does a null `keyCol` value (a null key
    * cannot be hashed into the shuffle order). Returns df + (phaseCol,
    * rankCol); both names must be free in the input frame. */
  def curriculumOrder(df: DataFrame, keyCol: String, phase: Column,
      phases: Int, buckets: Int = 256,
      rankCol: String = "curriculum_rank",
      phaseCol: String = "phase"): DataFrame = {
    require(phases >= 1 && buckets >= 1, "phases >= 1, buckets >= 1")
    // the offsets table ships as a plan-literal typedLit array serialized to
    // every executor (and into codegen) — bound it like domainReweightRound
    // bounds its domain count, rather than letting a large phase count bloat
    // the plan silently. 10^6 Longs ≈ 8 MB is the broadcast-threshold-sized
    // ceiling; past that the offsets belong in a broadcast join, not a literal
    require(phases.toLong * buckets <= 1000000L,
      s"curriculumOrder: phases*buckets = ${phases.toLong * buckets} exceeds 10^6 —" +
        " the plan-literal offset table would bloat the serialized plan; lower" +
        " buckets or restructure the phase space")
    require(!df.columns.contains(phaseCol) && !df.columns.contains(rankCol),
      s"curriculumOrder: output columns '$phaseCol'/'$rankCol' already exist in the" +
        " input frame — pass phaseCol/rankCol names that are free")
    val u = md5Bucket(col(keyCol), 1000000)
    val b = floor(u * buckets / lit(1000000.0)).cast("int")
    val based = df.withColumn("__p", phase.cast("int"))
      .withColumn("__b", b).withColumn("__u", u)
    val counts = based.groupBy("__p", "__b").agg(count(lit(1)).as("__c"))
      .collect()
      // a NULL phase (null phase expression) or a NULL bucket (null keyCol
      // value — md5 of null is null) maps to -1 so it reaches the
      // descriptive checks below, not a bare NPE on the unboxing getInt
      .map(r => ((if (r.isNullAt(0)) -1 else r.getInt(0)),
        (if (r.isNullAt(1)) -1 else r.getInt(1))) -> r.getLong(2))
      .toMap
    require(!counts.keys.exists(_._2 < 0),
      s"curriculumOrder: null $keyCol value(s) in the input frame — the shuffle" +
        " hash needs a non-null key")
    val badPhases = counts.keys.map(_._1).filter(p => p < 0 || p >= phases)
    require(badPhases.isEmpty,
      s"curriculumOrder: phase values ${badPhases.toSeq.sorted.distinct} outside [0, $phases)" +
        " (-1 = null phase)")
    val offsets = {
      var acc = 0L
      (for (p <- 0 until phases; i <- 0 until buckets) yield {
        val o = (p, i) -> acc; acc += counts.getOrElse((p, i), 0L); o
      }).toMap
    }
    val offCol = element_at(
      typedLit((0 until phases).flatMap(p => (0 until buckets).map(i => offsets((p, i))))),
      col("__p") * buckets + col("__b") + 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__p"), col("__b")).orderBy(col("__u"), col(keyCol))
    based.withColumn(rankCol, row_number().over(w).cast("long") + offCol)
      .withColumnRenamed("__p", phaseCol).drop("__b", "__u")
  }

  /** LEAVE-ONE-SOURCE-OUT ablation bookkeeping (SparkEntry q180): for every
    * source, the corpus stats of its COMPLEMENT (docs, whitespace tokens,
    * en-doc fraction in milli) — what a data-ablation study trains against
    * when it excludes that source. ONE corpus scan computes the per-source
    * stats; complements are total-minus-source arithmetic with the totals
    * window-summed over the BOUNDED per-source frame (the mixtureResample
    * discipline — a constant-key totals join would fold to a nested-loop
    * join, the SCALE.md driver-discipline hazard; the single-partition
    * window touches O(sources) rows, never the corpus). K ablation slices
    * never cost K scans. nullif guards the one-source corpus (empty
    * complement → null milli). */
  def ablationComplements(docs: DataFrame, textCol: String,
      sourceCol: String, langCol: String, lang: String): DataFrame = {
    val per = docs.groupBy(col(sourceCol).as("excluded_source"))
      .agg(count(lit(1)).as("__d"),
        sum(graft.ops.TextAnalysis.tokenCountWs(col(textCol))).as("__t"),
        sum(when(col(langCol) === lang, 1L).otherwise(0L)).as("__e"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    per
      .withColumn("__td", sum("__d").over(w))
      .withColumn("__tt", sum("__t").over(w))
      .withColumn("__te", sum("__e").over(w))
      .select(col("excluded_source"),
        (col("__td") - col("__d")).as("n_docs"),
        (col("__tt") - col("__t")).as("n_tokens"),
        expr("(1000 * (__te - __e)) div nullif(__td - __d, 0)").as("en_milli"))
  }

  /** Per-group deterministic CAP: at most `k` rows per group, chosen by md5
    * hash order of the key (C4-style per-domain caps; also the reproducible
    * "reservoir" for eval-slice extraction). One row_number window per
    * group; the hash order makes the selection independent of scan order
    * and reproducible in any engine. Emits `rankCol` (1..k) for audit. */
  def groupCap(df: DataFrame, keyCol: String, groupCol: String, k: Int,
      rankCol: String = "sample_rank"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5Bucket(col(keyCol), 1000000), col(keyCol))
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** TIME-based cross-validation FOLDS: fold = the event-time quantile bin
    * (exact percentile cuts of the epoch, broadcast over the scan — q65's
    * binning discipline on time), so fold k's data strictly precedes fold
    * k+1's. The temporal split family's missing member next to the random
    * ([[stratifiedSampleHash]]) and group ([[groupSplit]]/[[kFold]])
    * routers: expanding-window CV trains on folds < k and tests on fold k,
    * optionally skipping an embargo gap — row-level random splits leak
    * future information into training. Narrow assignment; cuts are
    * plan-time scalars. */
  def timeFolds(df: DataFrame, tsCol: String, nFolds: Int,
      foldCol: String = "fold"): DataFrame = {
    require(nFolds >= 2, "nFolds >= 2")
    val epoch = unix_micros(col(tsCol)).cast("double")
    val ps = (1 until nFolds).map(_.toDouble / nFolds)
    val names = ps.indices.map(i => s"c$i")
    // bracketed, not histogram, percentiles: microsecond epochs are
    // near-unique, so the histogram path's per-key ordered window would be
    // one task sorting the whole table (its scaladoc's documented
    // degraded case; identical results, equivalence-gated)
    val cutsRow = graft.ops.Aggregations.exactPercentilesBracketed(
      df.select(lit(1).as("__g"), epoch.as("__e")), Seq("__g"), "__e", ps, names)
      .select(names.map(col): _*).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"timeFolds: no non-null '$tsCol' rows — no cut points"))
    val cuts = names.indices.map(cutsRow.getDouble)
    // null timestamps land in fold 0 ("before everything"), matching SQL
    // CASE semantics — a bare (null > cut) would propagate a NULL fold
    df.withColumn(foldCol,
      cuts.map(c => coalesce((epoch > c).cast("int"), lit(0))).reduce(_ + _))
  }

  /** CALIBRATION / reliability table: bin a model score, and per bin report
    * count, positive rate, and mean score — the curve that says whether
    * "0.8 means 80%". Exact integer rate; mean score through one
    * double→decimal cast per row (order-independent, q110's discipline).
    * One partial-aggregated groupBy on O(bins) keys. */
  def calibrationTable(df: DataFrame, scoreCol: String, labelCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    // mean score through round(x·1e6) integer units — the shared-rounding
    // discipline (decimal casts of arbitrary doubles can hit exact
    // midpoints that engines tie-break differently)
    df.groupBy(floor(col(scoreCol).cast("double") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        (sum(round(col(scoreCol).cast("double") * 1e6).cast("long")).cast("double")
          / (lit(1e6) * count(lit(1)))).as("mean_score"))
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** CONFUSION counts at a decision threshold (tp/fp/tn/fn + derived
    * precision/recall as exact integer ratios) — one aggregation, the
    * other half of the eval pair next to [[calibrationTable]]. */
  def confusionAtThreshold(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double): DataFrame = {
    val pred = col(scoreCol).cast("double") >= threshold
    val label = col(labelCol).cast("int") === 1
    // coalesce: a sum over zero rows is null, which would poison the
    // derived ratios AND the documented zero-denominator contract
    df.agg(
      coalesce(sum((pred && label).cast("long")), lit(0L)).as("tp"),
      coalesce(sum((pred && !label).cast("long")), lit(0L)).as("fp"),
      coalesce(sum((!pred && !label).cast("long")), lit(0L)).as("tn"),
      coalesce(sum((!pred && label).cast("long")), lit(0L)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))))
  }

  /** The LOUD 0/1 label guard shared by the histogram-fold eval family
    * ([[aucByGroup]]/[[prCurveByGroup]]/[[ksByGroup]]/[[chiSquareByGroup]]) —
    * the [[isotonicCalibrate]] convention applied uniformly: the folds
    * derive the negative count as Σ(1 − label), so a NULL label would
    * silently vanish from BOTH classes and a label of 2 would produce a
    * NEGATIVE count and a corrupt statistic. Both now fail in-plan with
    * the offending value in the message. */
  private def binaryLabel(labelCol: String, op: String): Column =
    when(col(labelCol).isNull || (col(labelCol) =!= 0 && col(labelCol) =!= 1),
      raise_error(concat(lit(s"$op: label must be 0/1, got "),
        coalesce(col(labelCol).cast("string"), lit("NULL")))))
      .otherwise(col(labelCol).cast("long"))

  /** EXACT grouped ROC-AUC from the SCORE HISTOGRAM — the ranking member
    * of the eval family next to [[calibrationTable]] (is the probability
    * honest) and [[confusionAtThreshold]] (one operating point): AUC is
    * the probability a random positive outscores a random negative, ties
    * at half credit (Mann-Whitney with tie correction).
    *
    * The naive form ranks every row — a global sort, the shape this repo
    * bans. This form never sorts rows: fold the corpus to one histogram
    * row per (group, distinct score) — O(groups × score-range) rows for
    * integer scores, regardless of corpus size — then one bounded window
    * ordered by score inside each group gives negBelow(s), and
    *   AUC = Σ_s [negBelow(s)·pos(s) + neg(s)·pos(s)/2] / (P·N)
    * carried as the all-integer half-unit numerator
    * num2 = Σ 2·negBelow·pos + neg·pos in DECIMAL(38,0) (operands pre-cast
    * to DECIMAL(19,0): each product is ≤ N·P — past long at 100 TB counts),
    * with the single float division last. A one-class group yields NULL
    * (AUC is undefined), never 0/0.
    *
    * Callers pass an INTEGER score expression (milli-scale floats first:
    * `floor(col*1000)`) — integer scores are what make the histogram
    * bounded and the grouping portable across engines. */
  def aucByGroup(df: DataFrame, groupCol: String, scoreInt: Column,
      labelCol: String): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val y = binaryLabel(labelCol, "aucByGroup")
    val hist = df.groupBy(col(groupCol), scoreInt.cast("long").as("__s"))
      .agg(sum(y).as("__pos"), sum(lit(1L) - y).as("__neg"))
    val below = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hist
      .withColumn("__negBelow", coalesce(sum(col("__neg")).over(below), lit(0L)))
      .groupBy(col(groupCol))
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        // 2·negBelow fits a long (≤ 2N); the d19×d19 products land in d38
        // before summing — the volumeAnomalies decimal discipline
        sum(((col("__negBelow") * 2L).cast(d19) * col("__pos").cast(d19)
          + col("__neg").cast(d19) * col("__pos").cast(d19)).cast(d38)).as("__num2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(col("__num2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"))
  }

  /** GROUPED PRECISION-RECALL CURVE from the score histogram — the
    * threshold-sweep member of the eval family: one row per (group,
    * distinct integer score), reading "predict positive at score ≥
    * threshold". Same never-sort-rows shape as [[aucByGroup]]: fold the
    * corpus to the O(groups × score-range) histogram, then one descending
    * cumulative window gives tp/fp at every operating point. precision and
    * recall are each ONE integer÷integer IEEE division (tp+fp ≥ 1 by
    * construction — the row exists because something scored there);
    * recall is NULL for a positive-free group, never 0/0. */
  def prCurveByGroup(df: DataFrame, groupCol: String, scoreInt: Column,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val y = binaryLabel(labelCol, "prCurveByGroup")
    val hist = df.groupBy(col(groupCol), scoreInt.cast("long").as("threshold"))
      .agg(sum(y).as("__pos"), sum(lit(1L) - y).as("__neg"))
    val wDesc = Window.partitionBy(col(groupCol)).orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // group totals via a window over the BOUNDED histogram frame (the
    // constant-key-join ban: a 1-row totals join folds to NLJ)
    val wAll = Window.partitionBy(col(groupCol))
    hist
      .withColumn("tp", sum(col("__pos")).over(wDesc))
      .withColumn("fp", sum(col("__neg")).over(wDesc))
      .withColumn("__p", sum(col("__pos")).over(wAll))
      .select(col(groupCol), col("threshold"), col("tp"), col("fp"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("__p") === 0L, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") / col("__p").cast("double"))
          .as("recall"))
  }

  /** EXACT two-sample KOLMOGOROV-SMIRNOV statistic per group — "did this
    * feature's distribution shift between the two labeled populations"
    * (treatment/control, this-week/last-week, train/serve), the
    * distribution-drift member of the eval family. D = max over thresholds
    * of |ecdfA − ecdfB|, carried as the common-denominator integer
    * numerator max |cumA·nB − cumB·nA| (DECIMAL products — cumA·nB passes
    * 2^63 long before 100 TB counts do) with the single float division
    * last. Same histogram fold as [[aucByGroup]]: no row ever sorts, the
    * windows run over O(groups × score-range) rows. A one-class group
    * yields NULL (no second sample to compare). */
  def ksByGroup(df: DataFrame, groupCol: String, scoreInt: Column,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val y = binaryLabel(labelCol, "ksByGroup")
    val hist = df.groupBy(col(groupCol), scoreInt.cast("long").as("__s"))
      .agg(sum(y).as("__pos"), sum(lit(1L) - y).as("__neg"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__ca", sum(col("__pos")).over(wCum))
      .withColumn("__cb", sum(col("__neg")).over(wCum))
      .withColumn("__na", sum(col("__pos")).over(wAll))
      .withColumn("__nb", sum(col("__neg")).over(wAll))
      .groupBy(col(groupCol))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(col("__ca").cast(d19) * col("__nb").cast(d19)
          - col("__cb").cast(d19) * col("__na").cast(d19)).cast(d38)).as("__dnum"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("double"))
          .otherwise(col("__dnum").cast("double")
            / (col("n_a").cast(d19) * col("n_b").cast(d19)).cast("double"))
          .as("ks"))
  }

  /** The nDCG@k discount table in integer MICRO-units:
    * round(10⁶ / log2(rank+1)) for rank 1..k. Computed ONCE here and
    * injected as plan-time literals on the engine side and as an array
    * literal in any cross-engine restatement — the log never runs inside
    * either engine, so the last-ulp libm differences that make raw
    * transcendental math a determinism hazard cannot reach the data path
    * (the [[graft.ops.Profiling]] no-libm discipline applied to ranking). */
  def ndcgDiscountMicros(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 * math.log(2.0) / math.log(r + 1.0)))

  /** RANKED-RETRIEVAL QUALITY per query — nDCG@k, reciprocal rank, and
    * recall@k over a labeled run: one row per query with its judged
    * candidate set. The eval-family member for the retrieval side of the
    * engine ([[graft.ops.TextAnalysis.bm25TopK]] / rrfFuse / kNN produce
    * runs; this scores them against graded relevance labels).
    * Reference-semantics anchor: aligned's model-eval metric annotations
    * (`aligned/schemas/model.py` metric fields); the ranking metrics
    * themselves are the standard IR definitions (Järvelin & Kekäläinen
    * nDCG), which aligned does not compute.
    *
    * Exactness: every sum is INTEGER — gains are small integers, the
    * log2 discount enters as the [[ndcgDiscountMicros]] micro-unit
    * literal table — and each emitted float is ONE integer÷integer IEEE
    * division (rr, recall@k, nDCG@k), so the result hash-matches any
    * engine restating the same table. The ideal ordering needs no
    * tie-break policy: equal gains are interchangeable under the sum, and
    * the (rel desc, rank asc) window order makes the assignment
    * deterministic anyway.
    *
    * Plan shape at 100 TB: ONE window partitioned by query over that
    * query's judged candidates (O(candidates/query) rows — runs are
    * top-n shaped, never corpus-shaped) feeding one partial-aggregated
    * group-by; no global sort. The duplicate-rank guard's count_distinct
    * plans an Expand (×2 on the run rows) — accepted: runs are the small
    * side of the pipeline by construction, and a duplicated rank would
    * silently double-count DCG gain. Guards raise loudly in-plan: ranks
    * must be ≥ 1 and unique per query, gains non-negative. */
  def rankingMetrics(df: DataFrame, queryCol: String, rankCol: Column,
      relCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics: k must be >= 1, got $k")
    val discs = ndcgDiscountMicros(k)
    def disc(r: Column): Column = element_at(typedLit(discs), r.cast("int"))
    val base = df.select(col(queryCol).as("__q"), rankCol.cast("long").as("__r"),
      relCol.cast("long").as("__rel"))
    val wIdeal = Window.partitionBy(col("__q"))
      .orderBy(col("__rel").desc, col("__r").asc)
    base
      .withColumn("__ip", row_number().over(wIdeal))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_labeled"),
        sum(when(col("__rel") > 0L, 1L).otherwise(0L)).as("n_relevant"),
        min(when(col("__rel") > 0L, col("__r"))).as("first_rel_rank"),
        sum(when(col("__rel") > 0L && col("__r") <= k, 1L).otherwise(0L))
          .as("hits_at_k"),
        sum(when(col("__r").between(1L, k.toLong),
          col("__rel") * disc(col("__r"))).otherwise(0L)).as("dcg_micro"),
        sum(when(col("__ip") <= k, col("__rel") * disc(col("__ip")))
          .otherwise(0L)).as("idcg_micro"),
        min(col("__r")).as("__minr"), min(col("__rel")).as("__minrel"),
        count_distinct(col("__r")).as("__ndr"))
      .select(col("__q").as(queryCol),
        when(col("__ndr") =!= col("n_labeled"), raise_error(concat(
            lit("rankingMetrics: duplicate ranks in the run for query "),
            col("__q").cast("string"))))
          .when(col("__minr") < 1L, raise_error(concat(
            lit("rankingMetrics: rank < 1 in the run for query "),
            col("__q").cast("string"))))
          .when(col("__minrel") < 0L, raise_error(concat(
            lit("rankingMetrics: negative relevance gain for query "),
            col("__q").cast("string"))))
          .otherwise(col("n_labeled")).as("n_labeled"),
        col("n_relevant"), col("first_rel_rank"),
        (lit(1.0) / col("first_rel_rank").cast("double")).as("rr"),
        col("hits_at_k"),
        when(col("n_relevant") === 0L, lit(null).cast("double"))
          .otherwise(col("hits_at_k").cast("double")
            / col("n_relevant").cast("double")).as("recall_at_k"),
        col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") === 0L, lit(null).cast("double"))
          .otherwise(col("dcg_micro").cast("double")
            / col("idcg_micro").cast("double")).as("ndcg_at_k"))
  }

  /** The truncated-RBO weight table in integer NANO-units:
    * W(m) = round(10⁹ · Σ_{d=m..k} p^{d−1}/d) for m = 1..k — an item whose
    * ranks first agree at depth m contributes p^{d−1}·|A_d∩B_d|-mass to
    * every depth d ≥ m, so its TOTAL contribution to Σ p^{d−1}·X_d/d is
    * exactly this suffix sum. Computed ONCE here and injected as
    * plan-time literals on both engines (the [[ndcgDiscountMicros]]
    * discipline — the pow never runs inside either data path). */
  def rboWeightsNano(k: Int, pMilli: Int): Seq[Long] = {
    val p = pMilli / 1000.0
    val terms = (1 to k).map(d => math.pow(p, d - 1) / d)
    (1 to k).map(m => math.round(terms.drop(m - 1).sum * 1e9))
  }

  /** TRUNCATED RANK-BIASED OVERLAP at depth k (Webber, Moffat & Zobel
    * 2010, §4.1 — the ⊕ prefix sum RBO_min truncates to; the residual of
    * the untruncated geometric tail is NOT added, so this is the
    * conservative lower band): per query,
    *
    *   RBO@k = (1 − p) · Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d
    *
    * comparing two rankers' top-k lists — the ranker-agreement monitor a
    * retrieval stack runs when swapping scorers (does the new BM25 field
    * weighting actually change what users see, or only the tail?). Top-
    * weightedness comes from p: at p = 0.9 the first rank carries ~14% of
    * the total mass.
    *
    * Input: one row per (query, item) carrying that item's FULL rank
    * under each ranker (NULL = unranked); ranks > k simply fall out of
    * the truncated intersection. An item enters |A_d ∩ B_d| for every
    * d ≥ max(rank_a, rank_b), so its total contribution is the
    * [[rboWeightsNano]] literal at m = max — ONE array lookup per row,
    * no per-depth explode; the per-query sum is EXACT in long and the
    * final float is one division and one multiply by the (1 − p) literal
    * — hash-identical on any engine restating the same table. Ranks < 1
    * fail loudly in-plan. Plan: narrow map + one partial-aggregated
    * group-by on the query — no window, no join, run-shaped not
    * corpus-shaped. Returns (query, n_a, n_b, overlap_k, rbo). */
  def rboTruncated(df: DataFrame, queryCol: String, rankA: Column,
      rankB: Column, k: Int, pMilli: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"rboTruncated: k=$k outside [1, 1000]")
    require(pMilli >= 1 && pMilli <= 999,
      s"rboTruncated: pMilli=$pMilli outside [1, 999]")
    val weights = rboWeightsNano(k, pMilli)
    def guarded(r: Column, side: String): Column =
      when(r < 1L, raise_error(concat(lit(
        s"rboTruncated: rank_$side < 1 for query "), col("__q").cast("string"))))
        .otherwise(r.cast("long"))
    val base = df.select(col(queryCol).as("__q"), rankA.as("__ra"), rankB.as("__rb"))
      .select(col("__q"), guarded(col("__ra"), "a").as("__ra"),
        guarded(col("__rb"), "b").as("__rb"))
    // NULL if EITHER side is null (unranked): greatest() SKIPS nulls, so a
    // bare greatest would hand a one-list item its single-list rank and
    // credit it full co-occurrence weight — the explicit when() is the fix
    val m = when(col("__ra").isNull || col("__rb").isNull, lit(null).cast("long"))
      .otherwise(greatest(col("__ra"), col("__rb")))
    base
      .withColumn("__w", when(m.isNull || m > k, lit(0L))
        .otherwise(element_at(typedLit(weights), m.cast("int"))))
      .groupBy(col("__q").as(queryCol))
      .agg(count(when(col("__ra") <= k, 1)).as("n_a"),
        count(when(col("__rb") <= k, 1)).as("n_b"),
        count(when(m <= k, 1)).as("overlap_k"),
        sum(col("__w")).as("__sw"))
      .withColumn("rbo", lit((1000 - pMilli) / 1000.0)
        * (col("__sw").cast("double") / lit(1e9)))
      .drop("__sw")
  }

  /** CLOSED-FORM OLS (the LINEAR PROBE): fit y ≈ β·x + β₀ over the first
    * `dim` vector dimensions in ONE corpus fold — the regression sibling
    * of the online perceptron (`perceptronTrain` learns a classifier
    * iteratively; this solves the least-squares regressor exactly).
    * The [[graft.functions.Native.CovMoments]] kernel aggregates the
    * JOINT moment buffer of [features ++ target] (one buffer per task,
    * merged — the q234 shuffle shape), the normal equations
    * Cov_xx·β = Cov_xy solve driver-side by Gaussian elimination with
    * partial pivoting on the BOUNDED (d+1)×(d+1) matrix, and R² falls out
    * of the same moments (residual variance = Var_y − β·Cov_xy). A
    * near-singular system fails loudly (collinear features need a ridge
    * term, not a silent garbage fit). Returns (β, β₀, r²). */
  def olsFit(df: DataFrame, vecCol: String, targetCol: String, dim: Int,
      scaleBits: Int = 20): (Array[Double], Double, Double) = {
    require(dim >= 1 && dim <= 128, s"olsFit: dim=$dim outside [1, 128]")
    val scale = math.pow(2.0, scaleBits)
    val joint = transform(
      concat(slice(col(vecCol).cast("array<double>"), 1, dim),
        array(col(targetCol).cast("double"))),
      x => floor(x * lit(scale)).cast("long"))
    val d = dim + 1
    val buf = df.filter(col(vecCol).isNotNull && col(targetCol).isNotNull)
      .agg(graft.functions.Native.covMoments(joint, d).as("m"))
      .collect().head.getSeq[Long](0)
    val n = buf(0).toDouble
    require(buf(0) >= dim + 2, s"olsFit: need >= ${dim + 2} rows, got ${buf(0)}")
    val mean = Array.tabulate(d)(i => buf(1 + i) / n / scale)
    val cov = Array.ofDim[Double](d, d)
    var idx = 1 + d
    for (i <- 0 until d; j <- i until d) {
      val c = (buf(idx) / n - (buf(1 + i) / n) * (buf(1 + j) / n)) / (scale * scale)
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }
    // Gaussian elimination with partial pivoting on [Cov_xx | Cov_xy]
    val a = Array.tabulate(dim, dim + 1)((i, j) =>
      if (j < dim) cov(i)(j) else cov(i)(dim))
    for (p <- 0 until dim) {
      val piv = (p until dim).maxBy(r => math.abs(a(r)(p)))
      require(math.abs(a(piv)(p)) > 1e-12,
        s"olsFit: singular normal equations at column $p — features are " +
          "collinear or constant; drop or regularize them")
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (r <- p + 1 until dim) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p to dim) a(r)(c) -= f * a(p)(c)
      }
    }
    val beta = new Array[Double](dim)
    for (p <- (dim - 1) to 0 by -1) {
      var s = a(p)(dim)
      for (c <- p + 1 until dim) s -= a(p)(c) * beta(c)
      beta(p) = s / a(p)(p)
    }
    val intercept = mean(dim) - (0 until dim).map(i => beta(i) * mean(i)).sum
    val varY = cov(dim)(dim)
    val explained = (0 until dim).map(i => beta(i) * cov(i)(dim)).sum
    val r2 = if (varY <= 0) Double.NaN else explained / varY
    (beta, intercept, r2)
  }

  /** [[olsFit]] + prediction: β/β₀ become plan literals and the fitted
    * value is ONE VecDot per row — a narrow map, no join, no shuffle
    * (the [[graft.ops.Similarity.pcaProject]] projection discipline).
    * Oracle-gated at dim 2 (q239/q239b): the Gaussian elimination and the
    * VecDot accumulation are short fixed float programs, restated
    * literally in SQL over the same exact integer moments — predictions
    * match bit-for-bit at full double precision; the moment kernel is
    * separately gated as q234, higher dims pinned by OlsSpec. */
  def olsPredict(df: DataFrame, vecCol: String, targetCol: String, dim: Int,
      scaleBits: Int = 20, outCol: String = "ols_pred"): DataFrame = {
    val (beta, b0, _) = olsFit(df, vecCol, targetCol, dim, scaleBits)
    df.withColumn(outCol,
      graft.functions.Native.dotProduct(
        slice(col(vecCol).cast("array<double>"), 1, dim),
        typedLit(beta.toSeq)) + lit(b0))
  }

  /** ISOTONIC CALIBRATION (pool-adjacent-violators) of a [0, 1) score
    * against binary labels — the non-parametric recalibration step when a
    * model's scores rank well but their VALUES are off (q217's ECE
    * measures the miscalibration; this repairs it). Three stages in the
    * blessed shapes:
    *
    *  1. ONE partial-aggregated fold to the (bucket, positives, n) score
    *     histogram — `buckets` integer cells, never row-scale;
    *  2. driver-side PAV over the BOUNDED histogram (O(buckets) longs;
    *     the stack-based linear-time pooling): merge adjacent buckets
    *     while a later bucket's positive rate falls below an earlier
    *     one's, comparing rates as CROSS-MULTIPLIED integers so pooling
    *     decisions never touch a float;
    *  3. the pooled rates become a plan-literal bucket→micro-rate table
    *     (exact: round(1e6·pos/n) on driver doubles of exact longs) and
    *     each row picks its calibrated probability by ONE array lookup —
    *     a narrow map, no join, no shuffle.
    *
    * Oracle-gated (q241): PAV's sequential pooling IS SQL-restatable
    * through the minimax theorem fit(i) = max_{j≤i} min_{k≥i}
    * mean(y[j..k]) with exact cross-multiplied rational comparisons —
    * the selected interval mean equals the pool mean as a rational, so
    * the micro rates match bit-for-bit (IsotonicSpec additionally pins
    * the textbook pooling case, monotonicity, weighted pools, and the
    * loud guards); the histogram it
    * consumes is the q207/q217 family shape. Labels must be 0/1 and
    * scores in [0, 1) — loud errors otherwise. Returns df +
    * `calibrated` (double, micro-quantized — engine-reproducible). */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 1000, outCol: String = "calibrated"): DataFrame = {
    require(buckets >= 2 && buckets <= 100000,
      s"isotonicCalibrate: buckets=$buckets outside [2, 100000]")
    val score = col(scoreCol).cast("double")
    val label = when(col(labelCol).isNull || (col(labelCol) =!= 0 && col(labelCol) =!= 1),
        raise_error(concat(lit("isotonicCalibrate: label must be 0/1, got "),
          col(labelCol).cast("string"))))
      .otherwise(col(labelCol).cast("long"))
    val bucket = when(score.isNull || score < 0.0 || score >= 1.0,
        raise_error(concat(lit("isotonicCalibrate: score outside [0, 1): "),
          score.cast("string"))))
      .otherwise(floor(score * buckets).cast("int"))
    // bounded driver pull: the (bucket, positives, n) histogram
    val hist = df.select(bucket.as("__b"), label.as("__y"))
      .groupBy("__b").agg(sum(col("__y")).as("pos"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(hist.nonEmpty, "isotonicCalibrate: empty input")
    // PAV: pool while rate(prev) > rate(next), integer cross-multiplied
    case class Pool(lastBucket: Int, pos: Long, n: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    for ((b, p, n) <- hist) {
      var cur = Pool(b, p, n)
      while (stack.nonEmpty &&
          stack.last.pos * cur.n > cur.pos * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Pool(cur.lastBucket, prev.pos + cur.pos, prev.n + cur.n)
      }
      stack += cur
    }
    // bucket → micro-rate lookup table (plan literal, length = buckets);
    // empty buckets inherit the nearest pool to their RIGHT (trailing
    // empties the last pool) — either choice is monotone, and no row in
    // df ever lands there anyway; the table just stays total
    val rates = new Array[Long](buckets)
    var i = 0
    for (pool <- stack) {
      val r = math.round(1e6 * pool.pos / pool.n)
      while (i <= pool.lastBucket) { rates(i) = r; i += 1 }
    }
    while (i < buckets) { rates(i) = rates(i - 1); i += 1 }
    df.withColumn(outCol,
      element_at(typedLit(rates.toSeq), bucket + lit(1)).cast("double") / lit(1e6))
  }

  /** Exact two-sample CHI-SQUARE homogeneity statistic per group (+
    * Cramér's V) — "are these two labeled populations drawn from the same
    * binned distribution", the significance-flavored sibling of
    * [[ksByGroup]] (KS reads the worst single threshold; chi-square reads
    * the whole table, so it sees multi-bin drift KS dilutes). Same
    * histogram fold: the corpus collapses to O(groups × bins) rows before
    * any window.
    *
    * Determinism discipline for the float sum: per-bin terms are
    * (cA·nB − cB·nA)²/m with the cross-product formed in DECIMAL (the
    * [[aucByGroup]] overflow rule), each term ONE deterministic
    * cast-multiply-divide; the Σ over bins — a float sum, normally
    * ordering-dependent — runs as a SEQUENTIAL FOLD IN BIN ORDER
    * (sort_array over the bounded per-group term list, then a left fold),
    * so every engine restating the same fold produces the identical IEEE
    * operation sequence. collect_list is bounded by the bin count, never
    * the row count. Algebra: χ² for the 2×B table telescopes to
    * Σ_b D_b²/m_b / (nA·nB) with D = cA·nB − cB·nA, m = cA+cB ≥ 1.
    * Cramér's V = √(χ²/n) (min(2,B)−1 = 1), NULL for a one-bin or
    * one-class group; sqrt is IEEE-correctly-rounded everywhere, so it is
    * the one transcendental-adjacent op the no-libm rule admits. */
  def chiSquareByGroup(df: DataFrame, groupCol: String, binInt: Column,
      labelCol: String): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val y = binaryLabel(labelCol, "chiSquareByGroup")
    val hist = df.groupBy(col(groupCol), binInt.cast("long").as("__b"))
      .agg(sum(y).as("__ca"), sum(lit(1L) - y).as("__cb"))
    val wAll = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__d", (col("__ca").cast(d19) * col("__nb").cast(d19)
        - col("__cb").cast(d19) * col("__na").cast(d19)).cast(d38).cast("double"))
      .withColumn("__term", col("__d") * col("__d")
        / (col("__ca") + col("__cb")).cast("double"))
      .groupBy(col(groupCol))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        count(lit(1)).as("n_bins"),
        aggregate(sort_array(collect_list(struct(col("__b"), col("__term")))),
          lit(0.0), (acc, x) => acc + x.getField("__term")).as("__s"))
      .withColumn("chi2",
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("double"))
          .otherwise(col("__s")
            / (col("n_a").cast(d19) * col("n_b").cast(d19)).cast(d38)
              .cast("double")))
      .select(col(groupCol), col("n_a"), col("n_b"), col("n_bins"),
        col("chi2"),
        when(col("chi2").isNull || col("n_bins") <= 1L,
            lit(null).cast("double"))
          .otherwise(sqrt(col("chi2")
            / (col("n_a") + col("n_b")).cast("double"))).as("cramers_v"))
  }

  /** COHEN'S KAPPA per group — chance-corrected agreement between two
    * categorical raters over the same rows: the standard QA statistic for
    * "do my two labeling heuristics / annotator pools actually agree",
    * run before trusting either as training labels. Entirely RATIONAL —
    * κ = (n·agree − S)/(n² − S) with S = Σ_cat rowMargin·colMargin — so
    * the output is integer counts plus ONE float division; no libm, no
    * float sums.
    *
    * Plan shape at 100 TB: the corpus folds to the O(groups × cats²)
    * contingency cells in one partial aggregate; marginals and their
    * product-sum are aggregates and an equi-join over O(groups × cats)
    * rows. A rater-degenerate group (both raters constant and equal:
    * pe = 1) has undefined κ → NULL, never 0/0. */
  def cohenKappaByGroup(df: DataFrame, groupCol: String, raterA: Column,
      raterB: Column): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df.groupBy(col(groupCol), raterA.cast("string").as("__a"),
        raterB.cast("string").as("__b"))
      .agg(count(lit(1)).as("__c"))
    val margA = cells.groupBy(col(groupCol), col("__a").as("__k"))
      .agg(sum(col("__c")).as("__ma"))
    val margB = cells.groupBy(col(groupCol), col("__b").as("__k"))
      .agg(sum(col("__c")).as("__mb"))
    val peNum = margA.join(margB, Seq(groupCol, "__k"))
      .groupBy(col(groupCol))
      .agg(sum((col("__ma").cast(d19) * col("__mb").cast(d19)).cast(d38))
        .as("__S"))
    cells.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
          .as("n_agree"))
      .join(peNum, Seq(groupCol))
      .select(col(groupCol), col("n"), col("n_agree"),
        when((col("n").cast(d19) * col("n").cast(d19)).cast(d38)
            === col("__S"), lit(null).cast("double"))
          .otherwise(((col("n").cast(d19) * col("n_agree").cast(d19)).cast(d38)
              - col("__S")).cast("double")
            / ((col("n").cast(d19) * col("n").cast(d19)).cast(d38)
              - col("__S")).cast("double")).as("kappa"))
  }

  /** EXPECTED CALIBRATION ERROR per group — [[calibrationTable]] folded to
    * the one number a monitoring page alerts on: ECE = Σ_b (n_b/N)·|acc_b −
    * conf_b|, plus MCE (the worst single bin). The weighted form telescopes
    * to an ALL-INTEGER numerator:
    *   (n_b/N)·|pos_b/n_b − S_b/(10⁶·n_b)| = |10⁶·pos_b − S_b| / (10⁶·N)
    * with S_b = Σ round(score·10⁶) (the calibrationTable micro-unit
    * discipline), so ECE is one integer÷integer division and never a float
    * sum. MCE divides each bin's exact integer term by its exact count —
    * one IEEE division per bin, max over exact values (order-independent).
    * Per-bin term products run in DECIMAL (micro-units × 100 TB counts pass
    * long). One partial-aggregated groupBy on O(groups × bins) keys. */
  def eceByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "eceByGroup: binWidth > 0")
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val hist = df.groupBy(col(groupCol),
        floor(col(scoreCol).cast("double") / binWidth).cast("long").as("__bin"))
      .agg(count(lit(1)).as("__nb"),
        sum(col(labelCol).cast("long")).as("__pos"),
        sum(round(col(scoreCol).cast("double") * 1e6).cast("long").cast(d19))
          .as("__S"))
    hist
      .withColumn("__term", abs((col("__pos").cast(d19) * lit(1000000L).cast(d19)
        - col("__S").cast(d19)).cast(d38)))
      .groupBy(col(groupCol))
      .agg(sum(col("__nb")).as("n"), count(lit(1)).as("n_bins"),
        sum(col("__term")).as("__tsum"),
        max(col("__term").cast("double")
          / (lit(1e6) * col("__nb").cast("double"))).as("mce"))
      .select(col(groupCol), col("n"), col("n_bins"),
        (col("__tsum").cast("double") / (lit(1e6) * col("n").cast("double")))
          .as("ece"),
        col("mce"))
  }

  /** FLEISS' KAPPA per group — chance-corrected agreement for r ≥ 2 raters
    * (the multi-rater generalization of [[cohenKappaByGroup]]): input is
    * LONG form, one row per (group, item, assigned category). With
    * A = Σ_i Σ_c n_ic(n_ic−1), C = Σ_c (Σ_i n_ic)², I items and r raters,
    *   po = A / (I·r·(r−1)),  pe = C / (I·r)²,
    *   κ = (po − pe)/(1 − pe) = (A·I·r − C·(r−1)) / ((I²r² − C)·(r−1))
    * — entirely rational, every product in DECIMAL (A·I·r ≈ (I·r)²·(r−1)
    * passes long at 100 TB item counts), ONE float division last. κ is
    * NULL when pe = 1 (every rating in one category — agreement is
    * undefined, not zero).
    *
    * Every item in a group MUST carry the same rater count — an uneven
    * panel makes po's denominator meaningless, so the plan raises loudly
    * naming the group instead of averaging over a lie. Plan shape: the
    * ratings fold to O(items × categories) cells in one partial aggregate;
    * everything downstream is O(groups × categories). */
  def fleissKappaByGroup(df: DataFrame, groupCol: String, itemCol: String,
      catCol: Column): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df.groupBy(col(groupCol), col(itemCol).as("__i"),
        catCol.cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val items = cells.groupBy(col(groupCol), col("__i"))
      .agg(sum(col("__n")).as("__r"),
        sum(col("__n") * (col("__n") - 1L)).as("__agree"))
    val catTot = cells.groupBy(col(groupCol), col("__c"))
      .agg(sum(col("__n")).as("__m"))
    val pe = catTot.groupBy(col(groupCol))
      .agg(sum((col("__m").cast(d19) * col("__m").cast(d19)).cast(d38)).as("__C"))
    val grouped = items.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"), min(col("__r")).as("__rmin"),
        max(col("__r")).as("__rmax"), sum(col("__agree")).as("__A"))
      .join(pe, Seq(groupCol))
      // I·r fits a plain long (items × a small panel) — form it ONCE so
      // every decimal product below is a single d19×d19 → d38 step, never
      // a chained multiplication that trips the 38-precision cap
      .withColumn("__ir", col("n_items") * col("__rmin"))
      .withColumn("__irSq",
        (col("__ir").cast(d19) * col("__ir").cast(d19)).cast(d38))
    grouped
      .select(col(groupCol),
        when(col("__rmin") =!= col("__rmax"), raise_error(concat(
            lit("fleissKappaByGroup: uneven rater counts in group "),
            col(groupCol).cast("string"), lit(" (min "),
            col("__rmin").cast("string"), lit(", max "),
            col("__rmax").cast("string"), lit(")"))))
          .when(col("__rmin") < 2L, raise_error(concat(
            lit("fleissKappaByGroup: need >= 2 raters per item, group "),
            col(groupCol).cast("string"), lit(" has "),
            col("__rmin").cast("string"))))
          .otherwise(col("n_items")).as("n_items"),
        col("__rmin").as("n_raters"),
        when(col("__irSq") === col("__C"), lit(null).cast("double"))
          .otherwise(
            ((col("__A").cast(d19) * col("__ir").cast(d19)).cast(d38)
              - (col("__C") * (col("__rmin") - 1L).cast(d19)).cast(d38))
              .cast("double")
            / ((col("__irSq") - col("__C")).cast("double")
              * (col("__rmin") - 1L).cast("double"))).as("kappa"))
  }

  /** POISSON-BOOTSTRAP percentile confidence interval for a per-group
    * MEAN of an integral metric: every row enters each of `resamples`
    * virtual resamples with a Poisson(1) multiplicity drawn from the md5
    * of (key, resample) — the standard one-pass bootstrap at scale (the
    * with-replacement draw that needs no global n), here DETERMINISTIC:
    * the 32-bit hash is compared against integer CDF thresholds
    * ([[graft.functions.Portable.poissonCount]]), so any engine draws the
    * identical counts. Puts an uncertainty band on every monitoring mean
    * this suite reports (quality scores, token counts, latencies) —
    * "source B's mean dropped" only matters outside its CI.
    *
    * CI convention: per group, resample means sorted ascending (ties by
    * resample index); with k = ceil(B·tailMilli/1000), ci_lo is the k-th
    * smallest and ci_hi the k-th largest. Resamples whose total weight is
    * zero (only possible for near-empty groups) are dropped and `b_kept`
    * reports the survivors. `mean_x` is the plain exact mean.
    *
    * Engine-exact: the metric is integral, so Σ(c·x) and Σc are exact
    * longs and every mean is one double division.
    *
    * Plan shape at 100 TB: the explode is a narrow map (B× CPU, not B×
    * shuffle) — map-side partial aggregation collapses each partition to
    * O(groups·B) integer triples before anything moves; the rank window
    * runs over B rows per group. */
  def bootstrapMeanCI(df: DataFrame, groupCol: String, valueCol: Column,
      keyCol: String, resamples: Int = 100, tailMilli: Int = 25): DataFrame = {
    require(resamples >= 4 && resamples <= 10000,
      s"bootstrapMeanCI: resamples=$resamples outside [4, 10000]")
    require(tailMilli >= 1 && tailMilli < 500,
      s"bootstrapMeanCI: tailMilli=$tailMilli outside [1, 500)")
    val base = df.select(col(groupCol).as("grp"),
      valueCol.cast("long").as("__x"), col(keyCol).cast("string").as("__k"))
    val h = conv(substring(md5(concat(col("__k"), lit(":"),
      col("__b").cast("string"))), 1, 8), 16, 10).cast("long")
    val perB = base
      .select(col("grp"), col("__x"), col("__k"),
        explode(sequence(lit(0), lit(resamples - 1))).as("__b"))
      .withColumn("__c", graft.functions.Portable.poissonCount(h))
      .groupBy(col("grp"), col("__b"))
      .agg(sum(col("__c") * col("__x")).as("__swx"), sum(col("__c")).as("__sw"))
      .filter(col("__sw") > 0L)
      .withColumn("__m", col("__swx").cast("double") / col("__sw").cast("double"))
    val w = Window.partitionBy(col("grp"))
    val ranked = perB
      .withColumn("__rn", row_number().over(w.orderBy(col("__m"), col("__b"))))
      .withColumn("__bk", count(lit(1)).over(w))
      .withColumn("__klo", expr(s"(__bk * $tailMilli + 999) div 1000"))
    val ci = ranked.groupBy(col("grp")).agg(
      max(when(col("__rn") === col("__klo"), col("__m"))).as("ci_lo"),
      max(when(col("__rn") === col("__bk") - col("__klo") + 1L, col("__m"))).as("ci_hi"),
      max(col("__bk")).as("b_kept"))
    base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__x")).cast("double") / count(lit(1)).cast("double")).as("mean_x"))
      .join(ci, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n_rows"), col("mean_x"),
        col("ci_lo"), col("ci_hi"), col("b_kept"))
  }

  /** SPLIT LEAKAGE AUDIT: given near-duplicate PAIRS and a split
    * assignment, count how many pairs CROSS the split boundary — the
    * contamination a naive per-document split leaks from train into eval
    * ([[leakageSafeSplit]] is the constructive fix; this is the diagnostic
    * that tells you whether you needed it, and audits splits made by
    * systems that did not route components together). One row:
    * (n_pairs, n_cross_split, n_within, leakage_milli).
    *
    * Plan shape at 100 TB: two broadcast-or-shuffle equi-joins of the
    * O(pairs) edge list against the (id, split) projection, then one
    * partial-aggregated global reduce — the corpus text never moves. */
  def splitLeakageAudit(docs: DataFrame, pairs: DataFrame, idCol: String,
      splitCol: String): DataFrame = {
    val s = docs.select(col(idCol), col(splitCol))
    pairs
      .join(s.select(col(idCol).as("id_a"), col(splitCol).as("__sa")), Seq("id_a"))
      .join(s.select(col(idCol).as("id_b"), col(splitCol).as("__sb")), Seq("id_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L)).as("n_cross_split"),
        sum(when(col("__sa") === col("__sb"), 1L).otherwise(0L)).as("n_within"))
      .select(col("n_pairs"), col("n_cross_split"), col("n_within"),
        when(col("n_pairs") > 0L,
          expr("(1000 * n_cross_split) div n_pairs")).as("leakage_milli"))
  }

  /** CLASS-BALANCED downsampling: cap every class at the MINORITY class's
    * row count, members chosen by md5 hash order of the key — the
    * deterministic alternative to weighted-loss training when the skew is
    * extreme ([[classWeights]]' sampling sibling; same auditable router as
    * [[groupCap]]). The cap is a plan-time scalar (one tiny aggregate
    * collect, the quantile-cut idiom — a 1-row join would fold to a
    * nested loop); selection is one per-class window in hash order. */
  def balanceClasses(df: DataFrame, labelCol: String, keyCol: String): DataFrame = {
    val minRow = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).collect().head
    // empty input: keep the output schema identical to the non-empty path
    // (groupCap appends sample_rank — a bare df.limit(0) would break
    // callers selecting it)
    if (minRow.isNullAt(0)) return groupCap(df.limit(0), keyCol, labelCol, 1)
    // clamp, don't wrap: a >2^31-row minority class must not truncate the
    // cap negative and silently empty the result
    val cap = math.min(minRow.getLong(0), Int.MaxValue.toLong).toInt
    groupCap(df, keyCol, labelCol, cap)
  }

  /** Inverse-frequency CLASS WEIGHTS: w_c = N / (k · n_c) (sklearn's
    * "balanced" convention) — the loss-reweighting table for skewed label
    * distributions, emitted as one tiny frame to broadcast-join onto
    * training rows. N and k come from windows over the per-class count
    * frame (O(classes) rows), never a 1-row join against the corpus. */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .withColumn("weight",
        sum(col("n")).over(w).cast("double") / (count(lit(1)).over(w) * col("n")))
      .select(col(labelCol), col("n"), col("weight"))
  }

  /** Keep the TOP `frac` of every group by a SCORE column — the
    * quality-percentile filter ("best 30% of each domain by classifier
    * score"), [[groupCap]]'s score-driven sibling (groupCap bounds COUNT by
    * hash order; this bounds the QUALITY QUANTILE). Exact integer rank
    * arithmetic: keep rank ≤ ceil(frac · n) with ties broken by `keyCol`,
    * so membership is deterministic and engine-auditable — no float
    * percent_rank comparisons, whose `(rank-1)/(n-1)` boundary behavior
    * differs across engines. One window shuffle on the group key. */
  def topFractionByScore(df: DataFrame, groupCol: String, scoreCol: String,
      keyCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, "0 < frac <= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(keyCol))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")).cast("long"))
      .drop("__rn", "__n")
  }

  /** GROUP-AWARE split: every row of a group (user, session, document
    * cluster) lands in the SAME fold — random row-level splits leak
    * correlated rows of one entity across train and test, inflating eval
    * metrics. Deterministic md5 thresholding on the group key (same
    * auditable router as [[stratifiedSampleHash]]); no shuffle, no rand(). */
  def groupSplit(df: DataFrame, groupCol: String, trainFrac: Double,
      out: String = "split"): DataFrame = {
    val buckets = 1000000
    df.withColumn(out,
      when(md5Bucket(col(groupCol), buckets) < lit(math.round(trainFrac * buckets.toDouble)), "train")
        .otherwise("test"))
  }

  /** Group-aware K-FOLD assignment: fold = md5(group) mod k, so all of a
    * group's rows share a fold and fold i's test set never leaks entities
    * into its train set (the k-way generalization of [[groupSplit]]).
    * Deterministic, shuffle-free; folds are reproducible across engines. */
  def kFold(df: DataFrame, groupCol: String, k: Int, out: String = "fold"): DataFrame = {
    require(k >= 2, "k >= 2")
    df.withColumn(out, md5Bucket(col(groupCol), k).cast("int"))
  }

  /** A/B assignment (exposed_model/interface.py:566): hash-based stable split
    * of traffic between two models. `router` overrides the bucket expression
    * (must be in [0, 10000)); default is xxhash64 — fastest, Spark-specific. */
  def abTest(a: ExposedModel, b: ExposedModel, aShare: Double, idCol: String,
      router: Option[Column] = None)(input: DataFrame): DataFrame = {
    val bucket = router.getOrElse(pmod(xxhash64(col(idCol)), lit(10000)))
    val aRows = a.predict(input.filter(bucket < lit(math.round(aShare * 10000).toInt)))
      .withColumn("model_version", lit(a.version))
    val bRows = b.predict(input.filter(bucket >= lit(math.round(aShare * 10000).toInt)))
      .withColumn("model_version", lit(b.version))
    aRows.unionByName(bRows)
  }

  /** Partitioned model routing (exposed_model/partitioned.py): route rows to a
    * model by a partition-key column, union the results. */
  def partitioned(models: Map[String, ExposedModel], keyCol: String)(input: DataFrame): DataFrame =
    models.map { case (k, m) =>
      m.predict(input.filter(col(keyCol) === k)).withColumn("model_version", lit(m.version))
    }.reduce(_ unionByName _)

  /** Train/test(/validate) split (retrieval_job.py:917-1050): ordered by the
    * event timestamp when present (temporal split), otherwise a deterministic
    * hash order; optional stratification on a target column. Implemented with
    * percent_rank per stratum — one window, no driver-side sampling. */
  def trainTestValidate(
      df: DataFrame,
      trainFrac: Double,
      testFrac: Double,
      orderBy: Option[String] = None,
      stratifyOn: Option[String] = None): (DataFrame, DataFrame, DataFrame) = {
    val ord = orderBy.map(c => col(c).asc).getOrElse(xxhash64(struct(df.columns.map(col): _*)).asc)
    val part = stratifyOn.map(c => Window.partitionBy(col(c))).getOrElse(Window.partitionBy())
    val ranked = df.withColumn("__pr", percent_rank().over(part.orderBy(ord)))
    val train = ranked.filter(col("__pr") <= trainFrac).drop("__pr")
    val test = ranked.filter(col("__pr") > trainFrac && col("__pr") <= trainFrac + testFrac).drop("__pr")
    val validate = ranked.filter(col("__pr") > trainFrac + testFrac).drop("__pr")
    (train, test, validate)
  }

  def trainTest(df: DataFrame, trainFrac: Double, orderBy: Option[String] = None,
      stratifyOn: Option[String] = None): (DataFrame, DataFrame) = {
    val (tr, te, va) = trainTestValidate(df, trainFrac, 1.0 - trainFrac, orderBy, stratifyOn)
    (tr, te.unionByName(va))
  }

  /** LEAKAGE-SAFE SPLIT: train/test assignment by duplicate CLUSTER, not
    * by document. A near-duplicate of a test document sitting in the
    * training set is test-set contamination (the dedup-before-eval finding
    * of Lee et al. 2021), so the split router must move whole near-dup
    * components together. Components come from
    * [[graft.ops.Dedup.connectedComponents]] over a near-dup pair list;
    * documents absent from `pairs` are their own singleton component. The
    * router is [[md5Bucket]] on the component id — engine-auditable and
    * reproducible, and every member of a component lands in the same split
    * BY CONSTRUCTION (one hash per component, not per doc).
    *
    * At scale: the pair list is already banded near-dup output, CC is
    * diameter-bounded min-label propagation (it THROWS rather than return
    * partial labels when `ccMaxIter` rounds don't converge — a
    * half-propagated component would route one duplicate cluster to both
    * splits, the exact leakage this operator promises to prevent; raise
    * `ccMaxIter` for pathologically deep near-dup chains), and the split
    * adds one left equi-join plus a narrow hash map — no extra corpus
    * shuffle. Returns the docs frame + (component, split ∈ train|test). */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
      trainPct: Int = 80, ccMaxIter: Int = 30,
      components: Option[DataFrame] = None): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct=$trainPct out of [0,100]")
    val comp = components
      .getOrElse(graft.ops.Dedup.connectedComponents(pairs, maxIter = ccMaxIter))
      .withColumnRenamed("id", "__cc_id")
    docs.join(comp, docs(idCol) === comp("__cc_id"), "left")
      .withColumn("component", coalesce(col("comp"), col(idCol)))
      .drop("__cc_id", "comp")
      .withColumn("split",
        when(md5Bucket(col("component"), 100) < trainPct, "train")
          .otherwise("test"))
  }

  /** Distributed INTEGER batch-perceptron trainer for hashed-BoW quality
    * classifiers — the in-engine TRAINING step behind
    * [[graft.ops.TextAnalysis.hashedLinearScore]]'s documented drop-in
    * ("a real trained model drops in by replacing the hash-derived weight
    * with a broadcast weight-table join"). The FineWeb-style quality line:
    * label a seed set (heuristics, an edu rubric, an existing gate), train
    * a linear text classifier over hashed unigrams, score the corpus.
    *
    * Everything is integer arithmetic — counts, weights, scores — so
    * training is deterministic across partitionings and retries (no float
    * gradient accumulation order, no learning-rate ULP drift). Per epoch:
    * one broadcast join of the O(buckets) weight table onto the
    * ONE-TIME-FOLDED (doc, bucket, n) feature frame, a full-batch
    * misclassified-set gradient (equi-join + partial-aggregated sum), and
    * an O(buckets) driver pull. The corpus text is scanned exactly once —
    * epochs iterate over the bounded fold, [[graft.ops.Bpe.train]]-style.
    * Stops early when an epoch produces a zero gradient. `positive` is the
    * label predicate (+1 where true, −1 otherwise).
    *
    * Returns the weight table (bucket, weight) — feed it to
    * [[linearScoreWith]], persist it like any contract artifact. */
  def perceptronTrain(df: DataFrame, textCol: String, idCol: String,
      positive: Column, buckets: Int = 1 << 15, maxEpochs: Int = 5): DataFrame = {
    require(buckets > 0 && maxEpochs >= 1, s"buckets=$buckets maxEpochs=$maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val feats = df.select(col(idCol).as("__id"),
        when(positive, 1L).otherwise(-1L).as("__y"),
        explode(graft.ops.Dedup.portableShingleHashes(col(textCol), 1)).as("__h"))
      .select(col("__id"), col("__y"), pmod(col("__h"), lit(buckets.toLong)).as("__b"))
      .groupBy("__id", "__y", "__b").agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // the one corpus scan; epochs reread this fold
    try {
    var w = Map.empty[Long, Long]
    var epoch = 0
    var converged = false
    while (epoch < maxEpochs && !converged) {
      val wDf = w.toSeq.toDF("__b", "__w")
      val mis = feats.join(broadcast(wDf), Seq("__b"), "left")
        .groupBy("__id", "__y")
        .agg(sum(col("__n") * coalesce(col("__w"), lit(0L))).as("__s"))
        .filter(col("__y") * col("__s") <= 0) // sign(0) counts as wrong
        .select("__id")
      // full-batch gradient over the misclassified docs only; the pull is
      // bounded by `buckets` rows of longs, never by corpus size
      val grad = feats.join(mis, Seq("__id"))
        .groupBy("__b").agg(sum(col("__n") * col("__y")).as("__g"))
        .filter(col("__g") =!= 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      if (grad.isEmpty) converged = true
      else {
        grad.foreach { case (b, g) => w += b -> (w.getOrElse(b, 0L) + g) }
        epoch += 1
      }
    }
    // the returned frame is driver-local (toDF over the weight map), so
    // it survives the fold's release below
    w.toSeq.sortBy(_._1).toDF("bucket", "weight")
    // the checkpointed fold must not outlive training: repeated training
    // calls would otherwise accumulate blocks in the block manager for
    // the session's lifetime (Bpe.train releases its checkpoints the
    // same way)
    } finally feats.unpersist(blocking = false)
  }

  /** Score a corpus with a trained hashed-BoW weight table (the drop-in
    * form [[graft.ops.TextAnalysis.hashedLinearScore]] documents): token
    * hashes fold through the same portable hash and bucket count as
    * [[perceptronTrain]], the weight table broadcasts, and the per-doc
    * score is an exact integer sum — order-independent, engine-portable.
    * Returns (idCol, n_tokens, score, keep = score > 0). */
  def linearScoreWith(df: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, buckets: Int = 1 << 15): DataFrame =
    df.select(col(idCol),
        explode_outer(graft.ops.Dedup.portableShingleHashes(col(textCol), 1)).as("__h"))
      .withColumn("__b", pmod(col("__h"), lit(buckets.toLong)))
      .join(broadcast(weights.select(col("bucket").as("__b"),
        col("weight").as("__w"))), Seq("__b"), "left")
      .groupBy(idCol)
      .agg(count(col("__h")).as("n_tokens"),
        sum(coalesce(col("__w"), lit(0L))).as("score"))
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("keep", col("score") > 0)

  /** TOKEN-BUDGET MIXTURE ALLOCATION (the pretraining "data recipe" step —
    * the planning counterpart of [[mixtureResample]]): given per-document
    * token counts, a target total token budget, and desired mixture
    * weights per group, report for each group its available mass and the
    * sampling rate that hits its share of the budget. `rate > 1` means the
    * group must be epoch-repeated (the up-sampling regime Pile/LLaMA-style
    * recipes publish); weights are renormalized over the groups actually
    * present so a missing group never silently deflates the mixture.
    *
    * Weights are INTEGER relative weights (parts-per-whatever): the
    * renormalizer is then an exact integer window sum — order-independent
    * across engines — and every emitted ratio is a single IEEE division/
    * multiplication of exact operands (deterministic; oracle-checked).
    * Double weights would make the normalizer an order-dependent float
    * sum, the classic cross-engine ulp trap.
    *
    * One groupBy shuffle over (group) — the per-group table is O(groups),
    * the broadcast-scale side of any downstream resample join.
    *
    * Returns (groupCol, n_docs, n_tokens, weight, target_tokens, rate,
    * epochs). */
  /** One DOMAIN-REWEIGHTING round — the DoReMi idea (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining"): lift the mixture weight of domains whose proxy loss
    * EXCEEDS the current-mixture average, smooth toward uniform,
    * renormalize — the trainer side of [[tokenBudget]]/[[mixtureResample]]
    * (those CONSUME a weight table; this one COMPUTES the next one, and a
    * training loop alternates the two).
    *
    * All-INTEGER multiplicative weights, exactly restatable in any
    * engine: the paper's exp(η·excess) step is replaced by the linear MW
    * form w·(1000 + η·excess/1000) (Arora-Hazan-Kale; equal to first
    * order in η·excess, and exp through libm is the classic cross-engine
    * ulp trap), smoothing by the closed-form mix
    * (1000−s)/1000·norm(raw) + s/1000·uniform, and the final milli
    * weights by floor division with largest-remainder rounding (remainder
    * desc, domain asc) so they sum to EXACTLY 1000. Per-doc losses clamp
    * into [0, 10^6] milli so a poisoned loss column cannot overflow the
    * sums (safe to ~10^12 docs/domain); the requires bound every operand
    * far inside int64.
    *
    * Plan shape: ONE partial-aggregated groupBy folds the corpus to
    * O(domains) rows; everything after — mixture average, excess, MW
    * step, normalization — is single-partition windows over that bounded
    * frame (the mixtureResample discipline: a constant-key totals join
    * would fold to a nested-loop join). Domains absent from `weights`
    * drop, like [[tokenBudget]].
    *
    * Returns (domainCol, mean_loss_milli, excess_milli, weight_milli,
    * new_weight_milli), new weights summing to 1000. */
  def domainReweightRound(df: DataFrame, domainCol: String, lossMilli: Column,
      weights: Map[String, Long], etaMilli: Long = 1000L,
      smoothMilli: Long = 100L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(w => w > 0L && w <= 1000000L),
      "weights must be positive milli values <= 1e6")
    require(weights.size <= 10000, "at most 10^4 domains")
    require(etaMilli >= 0L && etaMilli <= 10000L, "etaMilli in [0, 10^4]")
    require(smoothMilli >= 0L && smoothMilli <= 1000L, "smoothMilli in [0, 1000]")
    // int64 headroom, checked on the ACTUAL worst case rather than each
    // knob in isolation (k = 10^4 AND w = 10^6 AND eta = 10^4 together
    // would overflow the k²-scaled denominator): raw ≤ 1000·w·(1+η) per
    // domain, numer ≤ 1000·k·raw_max, den = k·Σraw ≤ k²·raw_max — bound
    // the larger of the two. BigInt so the check itself cannot wrap.
    val rawMax = BigInt(1000) * weights.values.max * (1 + etaMilli)
    val k0 = BigInt(weights.size)
    require((k0 * k0 * rawMax).max(BigInt(1000) * k0 * rawMax) <=
        BigInt("9000000000000000000"),
      s"domainReweightRound: k=${weights.size} domains with max weight " +
        s"${weights.values.max} and etaMilli=$etaMilli would overflow the " +
        "int64 normalization — lower the weight scale, eta, or domain count")
    val k = weights.size.toLong
    val weightExpr = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (g, w)) => when(col(domainCol) === g, lit(w)).otherwise(acc)
    }
    // NULL losses fail LOUDLY at execution: greatest() ignores nulls, so the
    // clamp alone would coerce null → 0 and silently deflate the domain mean
    // (the ADVICE r10 finding). The null count rides the same aggregate —
    // no extra pass — and raise_error fires before any consumer reads a row.
    df.select(col(domainCol),
        when(lossMilli.isNull, lit(null).cast("long"))
          .otherwise(least(greatest(lossMilli.cast("long"), lit(0L)),
            lit(1000000L))).as("__l"))
      .groupBy(domainCol)
      .agg(expr("sum(__l) div count(1)").as("__mean_raw"),
        sum(col("__l").isNull.cast("long")).as("__nulls"))
      .withColumn("mean_loss_milli",
        when(col("__nulls") > 0L, raise_error(concat(
          lit("domainReweightRound: NULL lossMilli rows in domain '"),
          col(domainCol),
          lit("' — a null loss would silently deflate the domain mean; filter or fix upstream"))))
          .otherwise(col("__mean_raw")))
      .drop("__mean_raw", "__nulls")
      .withColumn("__w", weightExpr).filter(col("__w").isNotNull)
      .withColumn("__wl", col("__w") * col("mean_loss_milli"))
      .withColumn("__avg", expr("sum(__wl) over () div sum(__w) over ()"))
      .withColumn("excess_milli",
        greatest(col("mean_loss_milli") - col("__avg"), lit(0L)))
      .withColumn("__raw",
        col("__w") * (lit(1000L) + expr(s"($etaMilli * excess_milli) div 1000")))
      .withColumn("__sumraw", expr("sum(__raw) over ()"))
      // Σ_d numer_d = 1000·k·Σraw exactly, so den = k·Σraw normalizes to
      // milli without a further 1000× factor (int64 headroom)
      .withColumn("__numer", lit(1000L - smoothMilli) * lit(k) * col("__raw") +
        lit(smoothMilli) * col("__sumraw"))
      .withColumn("__den", lit(k) * col("__sumraw"))
      .withColumn("__flo", expr("__numer div __den"))
      .withColumn("__rem", expr("__numer % __den"))
      .withColumn("__left", lit(1000L) - expr("sum(__flo) over ()"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy()
          .orderBy(col("__rem").desc, col(domainCol).asc)).cast("long"))
      .select(col(domainCol), col("mean_loss_milli"), col("excess_milli"),
        col("__w").as("weight_milli"),
        (col("__flo") + when(col("__rk") <= col("__left"), lit(1L))
          .otherwise(lit(0L))).as("new_weight_milli"))
  }

  def tokenBudget(df: DataFrame, groupCol: String, tokenCount: Column,
      totalBudget: Long, weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0L),
      "weights must be non-empty and positive")
    val weightExpr = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (g, w)) => when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val perGroup = df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
      .withColumn("__w", weightExpr)
      .filter(col("__w").isNotNull)
    val wsum = org.apache.spark.sql.expressions.Window.partitionBy()
    perGroup
      .withColumn("weight",
        col("__w").cast("double") / sum(col("__w")).over(wsum).cast("double"))
      .withColumn("target_tokens", col("weight") * lit(totalBudget.toDouble))
      .withColumn("rate", col("target_tokens") / col("n_tokens").cast("double"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"), col("rate"),
        ceil(col("rate")).cast("long").as("epochs"))
  }

  /** MATERIALIZE a [[tokenBudget]] plan: emit each row of group g
    * `floor(rate(g))` times, plus one extra copy decided by the
    * deterministic md5 coin on (id, copy) at probability frac(rate(g)) —
    * the epoch-repeat + fractional-tail sampling step that turns the
    * recipe's per-group rates into an actual upsampled/downsampled corpus
    * (rate < 1 downsamples, rate > 1 epoch-repeats; groups absent from
    * the recipe are dropped). No rand() anywhere: retries, engines and
    * subset reruns reproduce the same rows. Narrow explode + filter — no
    * shuffle; the per-group copy count and coin threshold are plan-time
    * CASE literals computed from the driver-side rate map (O(groups),
    * the same table [[tokenBudget]] emits).
    *
    * Returns the input rows + `epoch` (0-based copy index). */
  def materializeBudget(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && !r.isNaN && !r.isInfinite),
      "rates must be finite and non-negative")
    val buckets = 1000000
    def chain(f: Double => Long): Column =
      rates.foldLeft(lit(0L)) { case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(f(r))).otherwise(acc)
      }
    val nCopies = chain(r => math.ceil(r).toLong)
    val fullCopies = chain(r => math.floor(r).toLong)
    val coinThr = chain(r => math.floor((r - math.floor(r)) * buckets).toLong)
    df.withColumn("epoch", explode(
        when(nCopies >= 1L, sequence(lit(0L), nCopies - 1))
          .otherwise(array().cast("array<long>"))))
      .filter(col("epoch") < fullCopies ||
        md5Bucket(concat_ws(":", col(idCol), col("epoch")), buckets) < coinThr)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"), INTEGER-QUANTIZED so any
    * engine reproduces it bit-for-bit: features are hashed unigrams
    * ([[md5Bucket]] over `buckets`); each bucket scores
    * `((n_target+1)·scale) DIV (n_raw+1)` — the add-one-smoothed
    * target/raw likelihood ratio in fixed point, integer floor division —
    * and a document's importance is the exact LONG sum of its token
    * positions' bucket scores. (The paper's log-likelihood-ratio sum is an
    * order-dependent float chain through libm log — the classic
    * cross-engine trap; the fixed-point ratio sum gives the same
    * target-like-documents-first ordering and is exactly restatable in
    * SQL.) Docs are ranked (score desc, id) and the top `keepPct`% flagged,
    * with k = (N·keepPct + 99) DIV 100 — all integer, ties deterministic.
    *
    * Shuffle shape: ONE token-level shuffle, folding tokens to (doc,
    * bucket, n) with map-side combine and lineage truncated there; the
    * O(buckets) score table derives from that frame and BROADCASTS back
    * for the per-doc sum. The final global rank is a single-sort window —
    * fine to ~10^8 docs; at 100 TB use [[dsirSelectByThreshold]], which
    * replaces the exact rank with an iteratively-refined score histogram
    * and a threshold filter — no global sort, no single-partition window
    * (equivalence spec-gated on ties-free data).
    * `scale·max_bucket_count` must stay < 2^63: the default 10^6 scale
    * holds to ~10^12 tokens per bucket.
    *
    * Returns (idCol, dsir_score, rank, selected); docs with no tokens
    * score 0. */
  def dsirSelect(df: DataFrame, textCol: String, idCol: String, targetPred: Column,
      buckets: Int = 4096, scale: Long = 1000000L, keepPct: Int = 25): DataFrame = {
    require(buckets > 0 && scale > 0 && keepPct >= 0 && keepPct <= 100,
      "buckets/scale positive, 0 <= keepPct <= 100")
    dsirScores(df, textCol, idCol, targetPred, buckets, scale)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("dsir_score").desc, col(idCol))).cast("long"))
      .withColumn("__total", count(lit(1)).over(Window.partitionBy()))
      .withColumn("selected", col("rank") <= expr(s"(__total * $keepPct + 99) DIV 100"))
      .drop("__total")
  }

  /** The shared DSIR scoring pass of [[dsirSelect]] /
    * [[dsirSelectByThreshold]]: exact integer (idCol, dsir_score) for EVERY
    * input document (token-free docs score 0), lineage truncated at the
    * (doc, bucket, n) fold so no caller ever reruns the text scan. */
  private def dsirScores(df: DataFrame, textCol: String, idCol: String,
      targetPred: Column, buckets: Int, scale: Long): DataFrame = {
    val ws = filter(split(lower(trim(col(textCol))), "\\s+"), w => length(w) > 0)
    val toks = df.select(col(idCol), targetPred.as("__tgt"), explode(ws).as("__w"))
      .withColumn("__b", md5Bucket(col("__w"), buckets))
    // ONE pass over the exploded tokens: fold them to (doc, tgt, bucket, n)
    // and truncate lineage there — both the global bucket table and the
    // per-doc scores derive from this (much smaller) frame, so the text
    // scan + explode never reruns. Σ_positions sc ≡ Σ_buckets n·sc: the
    // integer scores are unchanged
    val docBuckets = toks
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val bucketScores = docBuckets.groupBy("__b")
      .agg(sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__nt"),
        sum(col("__c")).as("__nr"))
      .withColumn("__sc", expr(s"((__nt + 1) * ${scale}L) DIV (__nr + 1)"))
      .select("__b", "__sc")
    val docScores = docBuckets
      .join(broadcast(bucketScores), "__b")
      .groupBy(idCol).agg(sum(col("__c") * col("__sc")).as("dsir_score"))
    df.select(col(idCol)).join(docScores, Seq(idCol), "left")
      .na.fill(0L, Seq("dsir_score"))
  }

  /** THE 100 TB FORM of [[dsirSelect]]: same integer scores, but the top-k
    * selection is a THRESHOLD, found by iteratively-refined banded score
    * histograms — the [[graft.ops.TextAnalysis.retentionCurve]] shape —
    * instead of a global single-task sort.
    *
    * The k-th largest score value T is located by narrowing a value range:
    * each round splits the current [lo, hi] into ≤ `bands` equal-width
    * value bands, aggregates a per-band doc-count histogram (map-side
    * combine; O(bands) rows to the driver), and a driver suffix-sum walks
    * the bands from the top to find the band containing the k-th doc.
    * The range shrinks by ~`bands`× per round, so ≤ ⌈64 / log2(bands)⌉ = 6
    * rounds bound ANY long score range; each round is one narrow
    * aggregation over the checkpointed (id, score) frame. The output is
    * then one filter: `selected = dsir_score >= T`.
    *
    * Contract vs [[dsirSelect]]: identical selected set when scores at the
    * cut are ties-free (equivalence spec-gated). When several documents tie
    * exactly AT the threshold, ALL ties are kept (so `selected` can exceed
    * k) — the deterministic, engine-portable convention for threshold
    * selects; dsirSelect instead breaks such ties by id to land on exact k.
    * No global sort, no single-partition window, no O(docs) driver pull
    * anywhere: driver traffic is O(bands) longs per round.
    *
    * Returns (idCol, dsir_score, selected). */
  def dsirSelectByThreshold(df: DataFrame, textCol: String, idCol: String,
      targetPred: Column, buckets: Int = 4096, scale: Long = 1000000L,
      keepPct: Int = 25, bands: Int = 4096): DataFrame = {
    require(buckets > 0 && scale > 0 && keepPct >= 0 && keepPct <= 100,
      "buckets/scale positive, 0 <= keepPct <= 100")
    require(bands >= 2, "bands must be >= 2")
    val scores = dsirScores(df, textCol, idCol, targetPred, buckets, scale)
      .localCheckpoint(true) // (id, long) — re-read per refinement round
    val head = scores.agg(count(lit(1)).as("n"),
      coalesce(max(col("dsir_score")), lit(0L)).as("mx"),
      coalesce(min(col("dsir_score")), lit(0L)).as("mn")).head()
    val n = head.getLong(0)
    val k = (n * keepPct + 99) / 100
    val thr: Long =
      if (n == 0 || k <= 0) Long.MaxValue      // select nothing
      else if (k >= n) head.getAs[Long]("mn")  // select everything
      else {
        var lo = head.getAs[Long]("mn")
        var hi = head.getAs[Long]("mx")
        var above = 0L // docs with score > hi (already accounted for)
        // invariant: the k-th largest score lies in [lo, hi]
        while (lo < hi) {
          // ceil-div band width so bands*width covers [lo, hi] without
          // overflow (hi - lo < 2^63 is guaranteed: scores are >= 0)
          val width = math.max(1L, (hi - lo) / bands + 1)
          val hist = scores
            .filter(col("dsir_score").between(lo, hi))
            .groupBy(expr(s"(dsir_score - ${lo}L) DIV ${width}L").as("__band"))
            .agg(count(lit(1)).as("__c"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          // walk bands from the top; find the band holding the k-th doc
          var band = (hi - lo) / width
          var cum = above
          while (band >= 0 && cum + hist.getOrElse(band, 0L) < k) {
            cum += hist.getOrElse(band, 0L)
            band -= 1
          }
          above = cum
          val newLo = lo + band * width
          val newHi = math.min(hi, lo + (band + 1) * width - 1)
          if (newLo == lo && newHi == hi) {
            // width == 1 band resolved to a single value
            lo = newLo; hi = newLo
          } else { lo = newLo; hi = newHi }
        }
        lo
      }
    scores.withColumn("selected", col("dsir_score") >= lit(thr))
  }
}
