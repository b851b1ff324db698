package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FULL streaming-gate family under the RocksDB state store (r12
  * verdict ask #2). q187b/q176b oracle-gate the two heaviest state codecs
  * (join state, dedup-key state) on RocksDB every round at SF data; this
  * matrix closes the OTHER modalities — windowed aggs, restart + crash
  * recovery, HLL max-state, CMS sum-state, flatMapGroupsWithState,
  * append-mode LSH state, inner interval join, session windows, plus the
  * stateless enrich/trigger shapes for completeness — by re-executing each
  * staged gate under `withStateStoreProvider(RocksDbProvider)` and
  * asserting ROW-EXACT equality with the default-provider (executor-heap
  * HDFSBacked) run on the same input.
  *
  * Why equality is exact: both runs stage identical chunk files, so batch
  * boundaries match; every gate's emissions are exactly-once by
  * construction (decimal sums, pure per-row/per-pair functions, or
  * idempotent merges), so values are bit-identical no matter which
  * provider round-tripped the state. An invalid provider class fails the
  * query at start, so a green RocksDB run is itself proof the provider
  * engaged — there is no silent fallback.
  *
  * Inputs are spec-sized (the q-rows re-prove the two heavy gates at SF
  * scale each round); the matrix's job is PROVIDER coverage, not load. */
class RocksDbMatrixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime
  private def ts(m: Int) = new java.sql.Timestamp(t0 + m * 60000L)

  /** Run `gate` on the default (heap) provider and again on RocksDB;
    * assert non-trivial, row-exact agreement. */
  private def matrix(name: String)(gate: => DataFrame): Unit = {
    val heap = gate.collect().map(_.toString).toSet
    val rocks = graft.streaming.Streaming.withStateStoreProvider(
      spark, graft.streaming.Streaming.RocksDbProvider) {
      gate.collect().map(_.toString).toSet
    }
    assert(heap.nonEmpty, s"$name: gate produced no rows — the matrix row proves nothing")
    assert(rocks == heap,
      s"$name: RocksDB run diverged from heap run — " +
        s"only-rocks=${(rocks -- heap).take(3)} only-heap=${(heap -- rocks).take(3)}")
  }

  private def events(n: Int) = (0 until n).map { i =>
    (ts(i), if (i % 3 == 0) "click" else "view", (i % 7).toDouble, i.toLong)
  }.toDF("ts", "event_type", "value", "event_id")

  test("windowed agg (q165 shape): heap = RocksDB") {
    matrix("windowAgg") {
      graft.streaming.Streaming.stagedWindowAggRun(
        spark, events(150), "ts", "event_type", "value")
    }
  }

  test("restart recovery (q212 shape): heap = RocksDB") {
    matrix("restartRecovery") {
      graft.streaming.Streaming.stagedRestartRecoveryRun(
        spark, events(120), "ts", "event_type", "value")
    }
  }

  test("mid-batch crash recovery (q212b shape): heap = RocksDB") {
    // the torn-batch replay exercises the provider's abort/reload path,
    // not just commit — the one modality where state is loaded for a
    // batch id the provider already saw
    matrix("crashRecovery") {
      graft.streaming.Streaming.stagedCrashRecoveryRun(
        spark, events(120).select("ts", "event_type", "value"),
        "ts", "event_type", "value")
    }
  }

  test("HLL max-state sketch (q233 shape): heap = RocksDB") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", s"w${i % 7} w${i % 11} w$i"))
      .toDF("doc_id", "src", "text")
    matrix("hll") {
      graft.streaming.Streaming.stagedHllRun(
        spark, docs, keyCol = "src", valueCol = "w", orderCol = "doc_id",
        lgK = 6, chunks = 3,
        prepare = d => d.select(col("src"),
          explode(split(col("text"), "\\s+")).as("w")))
    }
  }

  test("CMS sum-state sketch (q237 shape): heap = RocksDB") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", s"t${i % 5} t${i % 9} t$i"))
      .toDF("doc_id", "src", "text")
    matrix("cms") {
      graft.streaming.Streaming.stagedCmsRun(
        spark, docs, keyCol = "src", valueCol = "w", orderCol = "doc_id",
        depth = 2, lgWidth = 6, chunks = 3,
        prepare = d => d.select(col("src"),
          explode(split(col("text"), "\\s+")).as("w")))
    }
  }

  test("flatMapGroupsWithState latest-row (q167 shape): heap = RocksDB") {
    val rows = ((1 to 60).map(i => (ts(i), (i % 4).toLong, s"e$i", i.toLong)) ++
      Seq((ts(200), 9L, "tie_low", 900L), (ts(200), 9L, "tie_high", 901L)))
      .toDF("ts", "user_id", "event_type", "event_id")
    matrix("statefulLatest") {
      graft.streaming.Streaming.stagedStatefulLatestRun(
        spark, rows, Seq("user_id"), "ts", tieCol = Some("event_id"))
    }
  }

  test("append-mode LSH near-dup state (q172 shape): heap = RocksDB") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "the quick brown fox jumps over the lazy dog near the river delta"),
      (4L, "completely different text about distributed query engines and parquet"),
      (5L, "another unrelated document discussing spark catalyst optimizer rules"),
      (6L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    matrix("nearDup") {
      graft.streaming.Streaming.stagedNearDupRun(
        spark, docs, "text", "doc_id", threshold = 0.5, bands = 4, k = 3)
    }
  }

  test("inner interval stream-stream join (q175 shape): heap = RocksDB") {
    val rows = (
      (0 until 30).map(i => (ts(i * 10), (i % 3).toLong, "click", 1000L + i)) ++
      (0 until 30).map(i => (ts(i * 10 + 45), (i % 3).toLong, "purchase", 2000L + i))
    ).toDF("ts", "user_id", "event_type", "event_id")
    matrix("intervalJoin") {
      graft.streaming.Streaming.stagedIntervalJoinRun(
        spark, rows, "ts", Seq("user_id"), "event_id",
        leftPred = "event_type = 'click'", rightPred = "event_type = 'purchase'",
        after = "1 hour")
    }
  }

  test("session windows (q177 shape): heap = RocksDB") {
    val rows = (
      (0 until 24).map(i => (ts(i * 7), (i % 3).toLong, (i % 4).toDouble, i.toLong)) ++
      (0 until 8).map(i => (ts(400 + i * 5), (i % 3).toLong, 1.5, 100L + i))
    ).toDF("ts", "user_id", "value", "event_id")
    matrix("sessionAgg") {
      graft.streaming.Streaming.stagedSessionAggRun(
        spark, rows, "ts", "user_id", "value", gap = "30 minutes")
    }
  }

  test("stream-static enrich join (q183 shape): heap = RocksDB") {
    val rows = (1 to 30).map(i => (i.toLong, (i % 4).toLong, ts(i), i * 2.0))
      .toDF("id", "k", "ts", "v")
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "tier")
    matrix("enrichJoin") {
      graft.streaming.Streaming.stagedEnrichJoinRun(
        spark, rows, orderCol = "ts", idCol = "id", dim = dim,
        joinKeys = Seq("k"))
    }
  }

  test("event trigger through the worker (q198 shape): heap = RocksDB") {
    import graft.contract._
    import graft.core.FeatureType._
    import graft.expr.{Lit, Ref}
    val rows = (1 to 30).map(i =>
        (i.toLong, ts(i), s"t${i % 3}", i * 10.0))
      .toDF("event_id", "ts", "evt_type", "value")
    val view = FeatureView("rocks_trig", graft.sources.CustomSource(_.emptyDataFrame),
      entities = Seq(Feature("event_id", FInt64)),
      features = Seq(Feature("value", FFloat64), Feature("event_type", FString)),
      derived = Seq(DerivedFeature("hot", FBool, Ref("value") > Lit(200.0), Seq("value"))),
      eventTimestamp = Some(EventTimestamp("ts")),
      mappingKeys = Map("evt_type" -> "event_type"))
    matrix("trigger") {
      graft.streaming.Streaming.stagedTriggerRun(spark, rows, "ts",
        "event_id", view, col("hot"))
    }
  }
}
