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
