package graft

import graft.contract._
import graft.core.FeatureType._
import graft.sources._
import graft.store.ContractStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.util.{Failure, Success, Try}

/** Concurrency gates: ONE SparkSession, many threads — the shape a
  * long-lived store actually has on a cluster (one driver JVM serving many
  * planning/query threads; the reference's store is used the same way from
  * async Python, feature_store.py:148-188). Spark documents SparkSession
  * as thread-safe; these gates prove OUR layer on top is too:
  *   - plan construction from shared operator code (no hidden global
  *     builder state) — a pool of registry queries, concurrent vs serial;
  *   - concurrent `executeSql` statements on one store (idempotent
  *     temp-view re-registration, immutable catalog snapshot per call);
  *   - contract registration RACING readers (@volatile snapshot
  *     publication — a reader sees a consistent catalog, never a torn one);
  *   - concurrent `executeSqlWrite` to DISTINCT targets.
  * NOT promised (documented on executeSql): two different stores sharing
  * one session with COLLIDING contract names — session-global temp views
  * make that last-writer-wins, like any Spark temp view. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Canonical result fingerprint: schema + sorted rendered rows. */
  private def canon(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted
    df.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(",") +
      "\n" + rows.mkString("\n")
  }

  private def inPool[A](n: Int)(tasks: Seq[() => A]): Seq[Try[A]] = {
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futures = tasks.map(t => pool.submit(new Callable[A] {
        def call(): A = t()
      }))
      futures.map(f => Try(f.get(300, TimeUnit.SECONDS)))
    } finally { pool.shutdownNow(); () }
  }

  test("registry queries produce identical results concurrent vs serial") {
    // a diverse pure-read subset: agg, window, as-of join, minhash LSH,
    // inverted-index jaccard, constraint filter, pivot, exact percentiles,
    // CC dedup, text stats, BPE fold, BM25 — none registers a temp view,
    // so they exercise shared operator code + per-query stores only
    val names = Seq("q1_pricing_summary", "q5_window_rank", "q9_asof_last_click",
      "q23_minhash_neardup", "q24_jaccard_pairs", "q37_invalid_rows",
      "q52_pivot", "q65_quantile_bins", "q69_dedup_groups_portable",
      "q100_type_token", "q161_bpe_pair_counts", "q193_bm25_topk")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    val serial = qs.map { case (n, fn) => n -> canon(fn(spark, sfDir)) }.toMap
    val results = inPool(6)(qs.map { case (n, fn) =>
      () => n -> canon(fn(spark, sfDir))
    })
    val failures = results.collect { case Failure(e) => e }
    assert(failures.isEmpty, s"concurrent query threw: ${failures.headOption}")
    results.collect { case Success((n, c)) =>
      assert(c == serial(n), s"$n: concurrent result differs from serial")
    }
  }

  test("concurrent executeSql statements on one store are safe and correct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conc-sql").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "grp", "v").write.mode("overwrite").parquet(s"$dir/base.parquet")
    Seq(("a", 1.5), ("b", 2.5)).toDF("grp", "w")
      .write.mode("overwrite").parquet(s"$dir/weights.parquet")
    val store = new ContractStore()
      .addView(FeatureView("base", ParquetSource(s"$dir/base.parquet"),
        entities = Seq(Feature("id", FInt64)),
        features = Seq(Feature("grp", FString), Feature("v", FFloat64))))
      .addView(FeatureView("weights", ParquetSource(s"$dir/weights.parquet"),
        entities = Seq(Feature("grp", FString)),
        features = Seq(Feature("w", FFloat64))))
    val statements = Seq(
      "SELECT grp, sum(v) AS sv FROM base GROUP BY grp",
      "SELECT count(*) AS n FROM base",
      "SELECT b.id, b.v * w.w AS wv FROM base b JOIN weights w ON b.grp = w.grp",
      "SELECT max(v) AS mx FROM base",
      "SELECT grp, count(*) AS c FROM base GROUP BY grp")
    val serial = statements.map(s => canon(store.executeSql(spark, s)))
    // each statement runs on several threads at once, interleaved with the
    // OTHERS re-registering the same temp views — 4 rounds of 5 statements
    val tasks = (0 until 4).flatMap(_ => statements.map(s =>
      () => s -> canon(store.executeSql(spark, s))))
    val results = inPool(8)(tasks)
    val failures = results.collect { case Failure(e) => e }
    assert(failures.isEmpty, s"concurrent executeSql threw: ${failures.headOption}")
    val expect = statements.zip(serial).toMap
    results.collect { case Success((s, c)) =>
      assert(c == expect(s), s"statement '$s' diverged under concurrency")
    }
  }

  test("contract registration racing readers publishes atomically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conc-reg").toString
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val store = new ContractStore().addView(
      FeatureView("stable", ParquetSource(s"$dir/t.parquet"),
        entities = Seq(Feature("id", FInt64)),
        features = Seq(Feature("v", FFloat64))))
    @volatile var stop = false
    val readers = (0 until 4).map(_ => () => {
      var n = 0
      while (!stop && n < 200) {
        val c = store.executeSql(spark, "SELECT count(*) AS n FROM stable")
          .collect()(0).getLong(0)
        assert(c == 2L, s"reader saw $c rows")
        // catalog reads mid-registration must be consistent snapshots
        store.views.foreach { case (k, fv) => assert(k == fv.name) }
        n += 1
      }
      n
    })
    val writer = () => {
      (0 until 50).foreach { i =>
        store.addView(FeatureView(s"extra_$i", ParquetSource(s"$dir/t.parquet"),
          entities = Seq(Feature("id", FInt64)),
          features = Seq(Feature("v", FFloat64))))
      }
      stop = true
      -1
    }
    val results = inPool(5)(readers :+ writer)
    val failures = results.collect { case Failure(e) => e }
    assert(failures.isEmpty, s"registration race threw: ${failures.headOption}")
    assert(store.views.size == 51)
  }

  test("concurrent executeSqlWrite to distinct targets both land") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conc-write").toString
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$dir/src.parquet")
    val store = new ContractStore()
      .addView(FeatureView("src_v", ParquetSource(s"$dir/src.parquet"),
        entities = Seq(Feature("id", FInt64)),
        features = Seq(Feature("s", FString))))
      .addView(FeatureView("dst_a", ParquetSource(s"$dir/dst_a.parquet"),
        entities = Seq(Feature("id", FInt64)),
        features = Seq(Feature("s", FString))))
      .addView(FeatureView("dst_b", ParquetSource(s"$dir/dst_b.parquet"),
        entities = Seq(Feature("id", FInt64)),
        features = Seq(Feature("s", FString))))
    val results = inPool(2)(Seq(
      () => store.executeSqlWrite(spark, "INSERT INTO dst_a SELECT id, s FROM src_v WHERE id <= 2"),
      () => store.executeSqlWrite(spark, "INSERT INTO dst_b SELECT id, s FROM src_v WHERE id >= 2")))
    val failures = results.collect { case Failure(e) => e }
    assert(failures.isEmpty, s"concurrent write threw: ${failures.headOption}")
    assert(spark.read.parquet(s"$dir/dst_a.parquet").count() == 2)
    assert(spark.read.parquet(s"$dir/dst_b.parquet").count() == 2)
  }

  test("concurrent upserts to ONE target serialize: final table is their exact union") {
    // VERDICT r13 #2 — without the per-canonical-path lock in StageAndSwap,
    // two upserts to one path both merge against the same old snapshot and
    // the last rename-swap silently drops the other's rows (lost update).
    // N threads upsert DISJOINT key ranges; done = every key lands exactly
    // once, on EVERY upsert-capable store shape (merge-on-write, bucketed
    // merge, log append). Intra-JVM scope only (cross-process = the commit
    // log's job).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conc-upsert").toString
    val stores: Seq[(String, WritableSource)] = Seq(
      "parquet" -> ParquetSource(s"$dir/p.parquet"),
      "bucketed" -> BucketedParquetSource(s"$dir/b.parquet", Seq("id"), numBuckets = 8),
      "log" -> LogUpsertSource(s"$dir/l.parquet", Seq("id")))
    for ((label, src) <- stores) {
      src.overwrite(Seq((-1L, "seed")).toDF("id", "v"))
      val n = 6
      val results = inPool(n)((0 until n).map { t => () =>
        src.upsert((0 until 20).map(i => (t * 100L + i, s"w$t")).toDF("id", "v"), Seq("id"))
      })
      val failures = results.collect { case Failure(e) => e }
      assert(failures.isEmpty, s"[$label] concurrent same-target upsert threw: ${failures.headOption}")
      val out = src.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.size == n * 20 + 1, s"[$label] lost update: expected ${n * 20 + 1} rows, got ${out.size}")
      (0 until n).foreach { t =>
        (0 until 20).foreach(i => assert(out(t * 100L + i) == s"w$t", s"[$label] key ${t * 100L + i}")) }
      assert(out(-1L) == "seed", s"[$label] seed row lost")
    }
  }
}
