package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan invariants AT SCALE (round-13 scale-proof): the sf0.001 run of
  * `PlanInvariantsSpec` cannot catch a plan that DEGRADES with data size —
  * the classic flip is a dimension or derived small side outgrowing
  * `spark.sql.autoBroadcastJoinThreshold` and a broadcast hash join
  * silently becoming something worse. This spec replans the registry
  * against the 10× synthetic corpus (`tools/scaleup.py --synth-only`) and
  * re-asserts the two structural invariants there.
  *
  * OPT-IN: the synth corpus is a `target/` artifact, not repo data — the
  * spec cancels cleanly unless `SPARK_GRAFT_SCALE_DIR` points at it.
  * Streaming-staged gates are excluded: building their frame RUNS a real
  * staged stream (minutes at 10×), and their stateful plans are
  * data-size-independent by construction (watermark/bound-ed state).
  *
  * Run: `tools/scaleup.py --synth-only && SPARK_GRAFT_SCALE_DIR=\
  * target/scaleup/sf0.1x10 sbt "testOnly graft.ScalePlanInvariantsSpec"` */
class ScalePlanInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "")
  private def ready = scaleDir.nonEmpty &&
    new java.io.File(s"$scaleDir/lineitem.parquet").exists()

  private val allowedNonEqui =
    Set("q30_knn_bruteforce", "q112_hard_negatives", "q194_rrf_hybrid")

  test("10x corpus: no query plans a cartesian product or nested-loop join") {
    assume(ready, s"scale dir absent — build with tools/scaleup.py --synth-only")
    val offenders = SparkEntry.specs
      .filterNot(q => allowedNonEqui(q.name))
      .filterNot(q => SparkEntry.familyOf(q.name) == "stream")
      .flatMap { q =>
        val plan = q.fn(spark, scaleDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          Some(q.name)
        else None
      }
    assert(offenders.isEmpty, s"cross-join-shaped plans at 10x: $offenders")
  }

  test("10x corpus: the load-bearing broadcasts survive the scale-up") {
    assume(ready, s"scale dir absent — build with tools/scaleup.py --synth-only")
    // the sides that MUST stay broadcast because the other side is the
    // corpus AND the side is bounded by CONSTRUCTION (eval-set gram sets,
    // quantile cut tables, mixture rates, MG candidates, winsor bounds) —
    // corpus growth cannot grow them, so a flip to a corpus-shuffling
    // sort-merge join is a planning defect at any scale
    for (name <- Seq("q62_decontaminate", "q184_decontam_matrix",
        "q65_quantile_bins", "q87_mixture_sample",
        "q92_heavy_hitters", "q96_winsorize")) {
      val plan = SparkEntry.queries(name)(spark, scaleDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: broadcast lost at scale\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name: small side fell into a sort-merge join at scale")
    }
  }

  test("scaled corpus: vocab-bounded sides degrade to a shuffled EQUI join, never worse") {
    assume(ready, s"scale dir absent — build with tools/scaleup.py --synth-only")
    // q83's LM-count table is VOCAB-bounded, not constant-bounded: this
    // spec CAUGHT it losing its broadcast at the ×100 corpus (the synth's
    // token-disjoint copies grow vocabulary linearly — the worst case a
    // multilingual 100 TB crawl approaches). That is the DESIGNED
    // degradation, not a defect: the scoring join stays an equi-join that
    // shuffles (id, gram) pairs only (lmCoverage's scaladoc), so the
    // invariant here is hash/merge EQUI join — broadcast when the vocab
    // fits, shuffle when it doesn't, never a nested loop either way.
    val plan = SparkEntry.queries("q83_lm_coverage")(spark, scaleDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
        || plan.contains("ShuffledHashJoin"),
      s"q83_lm_coverage: scoring join is not an equi-join at scale\n$plan")
  }
}

/** Exact-arithmetic anchors AT SCALE that the DuckDB oracle cannot reach:
  * q239c's exact-integer Cramér restatement overflows INT128 once the
  * ×100 corpus pushes the determinant products past 2^127 (SCALE.md —
  * the one exclusion-by-construction in the ×100 correctness sweep).
  * BigInt has no such ceiling, so this spec re-derives the same exact
  * rational at ANY corpus size: integer sums via plain Spark SQL over
  * floor(v·2^6) (a different code path from MLOps.olsFit's moment fold),
  * Cramér over BigInt on the driver, the same exact half-up
  * micro-rounding — and compares against the registered q239c output.
  * Opt-in like the other scale gates (SPARK_GRAFT_SCALE_DIR). */
class ScaleExactAnchorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "")
  private def ready = scaleDir.nonEmpty &&
    new java.io.File(s"$scaleDir/embeddings.parquet").exists()

  test("q239c's dim-3 OLS matches an exact BigInt Cramér at the scaled corpus") {
    assume(ready, s"scale dir absent — build with tools/scaleup.py --synth-only")
    import org.apache.spark.sql.functions._
    val engine = SparkEntry.queries("q239c_ols_dim3_cramer")(spark, scaleDir)
      .collect().head
    // independent integer sums: plain SQL aggregation, exact in long at
    // any reachable corpus size (|q| ≲ 2^7, so Σq·q over 2^31 rows < 2^45)
    val q = spark.read.parquet(s"$scaleDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select((1 to 3).map(i =>
          floor(element_at(col("embedding").cast("array<double>"), i) * 64.0)
            .cast("long").as(s"q$i")) :+
        floor(element_at(col("embedding").cast("array<double>"), 4) * 64.0)
          .cast("long").as("qy"): _*)
      .filter(col("qy").isNotNull)
    val s = q.agg(count(lit(1)).as("n"),
      sum("q1").as("s1"), sum("q2").as("s2"), sum("q3").as("s3"), sum("qy").as("sy"),
      sum(col("q1") * col("q1")).as("s11"), sum(col("q1") * col("q2")).as("s12"),
      sum(col("q1") * col("q3")).as("s13"), sum(col("q1") * col("qy")).as("s1y"),
      sum(col("q2") * col("q2")).as("s22"), sum(col("q2") * col("q3")).as("s23"),
      sum(col("q2") * col("qy")).as("s2y"), sum(col("q3") * col("q3")).as("s33"),
      sum(col("q3") * col("qy")).as("s3y")).collect().head
    def B(name: String) = BigInt(s.getAs[Long](name))
    val n = B("n")
    val (s1, s2, s3, sy) = (B("s1"), B("s2"), B("s3"), B("sy"))
    val a11 = n * B("s11") - s1 * s1; val a12 = n * B("s12") - s1 * s2
    val a13 = n * B("s13") - s1 * s3; val a22 = n * B("s22") - s2 * s2
    val a23 = n * B("s23") - s2 * s3; val a33 = n * B("s33") - s3 * s3
    val b1 = n * B("s1y") - s1 * sy; val b2 = n * B("s2y") - s2 * sy
    val b3 = n * B("s3y") - s3 * sy
    val det = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val det1 = b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
      a13 * (b2 * a23 - a22 * b3)
    val det2 = a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * b3 - b2 * a13)
    val det3 = a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13) +
      b1 * (a12 * a23 - a22 * a13)
    // exact half-up micro-rounding: floor((2·10⁶·p + q) / (2q)) with the
    // sign normalized onto the numerators (the oracle's own discipline)
    val qq = det.abs
    assert(qq > 0, "singular normal equations at scale — synth corpus defect")
    def microRound(p0: BigInt): Long = {
      val p = if (det < 0) -p0 else p0
      val num = BigInt(2000000) * p + qq
      val den = BigInt(2) * qq
      // BigInt `/` truncates toward zero; emulate floor division
      val fd = if (num.sign * den.sign >= 0 || num % den == 0) num / den
               else num / den - 1
      fd.toLong
    }
    assert(microRound(det1) == engine.getLong(0),
      s"mb1: exact ${microRound(det1)} vs engine ${engine.getLong(0)}")
    assert(microRound(det2) == engine.getLong(1),
      s"mb2: exact ${microRound(det2)} vs engine ${engine.getLong(1)}")
    assert(microRound(det3) == engine.getLong(2),
      s"mb3: exact ${microRound(det3)} vs engine ${engine.getLong(2)}")
  }

  test("q1's sum_charge matches the exact-integer sum rounded ONCE at the scaled corpus") {
    // The ×10/×100 sweep's q1 exclusion is DuckDB's DECIMAL→DOUBLE
    // double-rounding (int128→double, then ÷10⁶) once a sum passes
    // 2⁵³/10⁶ — an oracle CONVERSION artifact. This anchor proves the
    // ENGINE side exact at any scale: charge·10⁶ is an exact integer per
    // row (2-decimal × 2-decimal × 2-decimal = exact at 6 decimals), its
    // group sum is summed in DECIMAL(38,0) (never overflows, never
    // rounds), and the correct double is THAT integer ÷10⁶ rounded once
    // — which must equal Spark's BigDecimal→double cast bit-for-bit.
    assume(ready && new java.io.File(s"$scaleDir/lineitem.parquet").exists(),
      "scale dir absent")
    import org.apache.spark.sql.functions._
    val engine = SparkEntry.queries("q1_pricing_summary")(spark, scaleDir)
      .select("l_returnflag", "l_linestatus", "sum_charge").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = spark.read.parquet(s"$scaleDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .select(col("l_returnflag"), col("l_linestatus"),
        // rint the 2-decimal doubles onto their exact integer grids first
        (expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))") *
         expr("CAST(100 - round(l_discount * 100) AS DECIMAL(38,0))") *
         expr("CAST(100 + round(l_tax * 100) AS DECIMAL(38,0))")).as("c6"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("c6")).as("s6"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDecimal(2)).toMap
    assert(exact.keySet == engine.keySet)
    for ((k, s6) <- exact) {
      val once = new java.math.BigDecimal(s6.toBigInteger, 6).doubleValue()
      assert(once == engine(k),
        s"group $k: exact-once $once vs engine ${engine(k)} " +
          f"(delta ${once - engine(k)}%.3e)")
    }
  }
}
