package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 gates for the retrieval + monitoring operators the r10 ADVICE
  * flagged as registered-but-ungated (each also has an oracle row,
  * q193-q197), plus the three loud-guard fixes from the same review. */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- bm25TopK ---

  private def corpus = Seq(
    (1L, "spark window merge spark"),  // tf(spark)=2 + two other terms
    (2L, "spark join filter sort"),    // one term, short doc
    (3L, "window window window window window window window window"), // high tf, long doc
    (4L, "table scan row group"),      // no query term
    (5L, "merge")                      // one term, shortest doc
  ).toDF("doc_id", "text")

  test("bm25: doc with more distinct query terms outranks single-term docs") {
    val got = graft.ops.TextAnalysis.bm25TopK(corpus, "text", "doc_id",
      Seq("spark", "window", "merge"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(1L) == 1, s"doc 1 matches all three terms, got ranks $got")
    assert(!got.contains(4L), "a doc with no query term must not be ranked")
    // every match is ranked: 4 matching docs → ranks 1..4
    assert(got.values.toSeq.sorted == Seq(1, 2, 3, 4))
  }

  test("bm25: tf saturates — 8 repeats in a long doc beat 1 occurrence but not linearly") {
    val got = graft.ops.TextAnalysis.bm25TopK(corpus, "text", "doc_id",
      Seq("window"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) > got(1L), "higher tf must score higher")
    assert(got(3L) < 8.0 * got(1L), "saturation must cap the tf gain well below linear")
  }

  test("bm25: duplicate and empty term lists are rejected up front") {
    assert(intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.bm25TopK(corpus, "text", "doc_id",
        Seq("spark", "Spark"), topK = 5)
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.bm25TopK(corpus, "text", "doc_id", Nil, topK = 5)
    }.getMessage.contains("empty"))
  }

  // --- rrfFuse ---

  test("rrf: id on both lists outranks a higher-placed single-list id; absent list contributes 0") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((99L, 1), (11L, 2), (12L, 4)).toDF("id", "rank")
    val got = graft.ops.Similarity.rrfFuse(a, b, "id", kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(4),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]))).sortBy(_._2)
    // 11 is on both lists (1/62 + 1/62) — beats 10 and 99 (rank-1 singles, 1/61)
    assert(got.head._1 == 11L)
    // single-list ids carry a null rank for the missing side
    val r99 = got.find(_._1 == 99L).get
    assert(r99._3.isEmpty && r99._4.contains(1))
    // all four ids survive the fusion
    assert(got.map(_._1).toSet == Set(10L, 11L, 12L, 99L))
  }

  test("rrf: k guard rejects 0") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    assert(intercept[IllegalArgumentException] {
      graft.ops.Similarity.rrfFuse(a, a, "id", kRrf = 0)
    }.getMessage.contains("kRrf"))
  }

  // --- knRareBigrams ---

  test("kn: reference-fluent doc scores fewer rare bigrams than scrambled or OOV text") {
    val ref = Seq.tabulate(10)(i => (100L + i, "the cat sat on the mat")).toDF("doc_id", "text")
    val c = Seq(
      (1L, "the cat sat on the mat"),  // seen bigrams throughout
      (2L, "mat on sat the cat the"),  // same words, unseen transitions
      (3L, "zzz qqq www"),             // OOV everywhere → backoff → rare
      (4L, "word")                     // < 2 tokens: no bigram
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.knRareBigrams(ref, c, "text", "doc_id",
        rareMilli = 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._3 < got(2L)._3, s"fluent must be less rare than scrambled: $got")
    assert(got(3L)._3 == 1.0, "fully-OOV text must be entirely rare")
    assert(got(4L) == ((0L, 0L, -1.0)), "no-bigram doc takes the -1 sentinel")
  }

  test("kn: an all-short-doc reference is rejected loudly") {
    val ref = Seq((1L, "word"), (2L, "x")).toDF("doc_id", "text")
    val c = Seq((3L, "a b")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.knRareBigrams(ref, c, "text", "doc_id")
    }.getMessage.contains("no bigram"))
  }

  // --- linearTrend ---

  test("linearTrend: recovers an exact line, and a constant-x group yields null slope") {
    val df = Seq(
      ("up", 1L, 12L), ("up", 2L, 14L), ("up", 3L, 16L),   // y = 2x + 10
      ("flat", 5L, 7L), ("flat", 5L, 9L)                    // constant x: den = 0
    ).toDF("g", "x", "y")
    val got = graft.ops.Aggregations.linearTrend(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got("up")._1.contains(2.0) && got("up")._2.contains(10.0))
    assert(got("flat")._1.isEmpty && got("flat")._2.isEmpty)
  }

  test("linearTrend: big ordinal ids do not overflow the squared sums") {
    // Σx² over ~3e9-scale ids wraps a long; the DECIMAL(38,0) path must not
    val base = 3000000000L
    val df = Seq(("g", base, 1L), ("g", base + 1000000L, 2L), ("g", base + 2000000L, 3L))
      .toDF("g", "x", "y")
    val got = graft.ops.Aggregations.linearTrend(df, "g", "x", "y").collect()(0)
    assert(math.abs(got.getDouble(2) - 1e-6) < 1e-18, s"slope=${got.getDouble(2)}")
  }

  // --- volumeAnomalies ---

  test("volumeAnomalies: a dark day inside the span is scored as an n=0 row") {
    val ts = (d: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d 0$i:00:00")
    // key A: 3 events on the 1st, NONE on the 2nd, 3 on the 3rd
    val rows = (Seq.tabulate(3)(i => ("A", ts(1, i))) ++
      Seq.tabulate(3)(i => ("A", ts(3, i))) ++
      Seq.tabulate(2)(i => ("B", ts(1, i)))).toDF("k", "ts")
    val got = graft.ops.EventAnalytics.volumeAnomalies(rows, "ts", "k")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // the zero-filled interior day exists and scores negative
    assert(got.contains(("A", "2024-03-02")), s"dark day missing: ${got.keys}")
    assert(got(("A", "2024-03-02"))._1 == 0L)
    assert(got(("A", "2024-03-02"))._2 < 0.0)
    // days outside a key's own span are NOT invented
    assert(!got.contains(("B", "2024-03-02")))
    // constant-volume key scores z = 0, not 0/0
    assert(got(("B", "2024-03-01"))._2 == 0.0)
    assert(got.size == 4)
  }

  // --- chunkDocuments ---

  test("chunking: windows cover every token, overlap context, no phantom tail") {
    val df = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 toks → chunks at 0,8,16
      (2L, "a b c"),                                   // shorter than one chunk
      (3L, "   ")                                      // zero tokens → no chunk
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.chunkDocuments(df, "text", "doc_id",
        chunkTokens = 10, overlapTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: k_last = (25-10+7) div 8 = 2 → chunks 0..2 at starts 0/8/16
    assert(got.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted == Seq(0L, 1L, 2L))
    assert(got((1L, 0L))._1 == 0L && got((1L, 0L))._2 == 10L)
    assert(got((1L, 1L))._1 == 8L)
    // overlap: chunk 1 starts with the last 2 tokens of chunk 0
    assert(got((1L, 1L))._3.startsWith("w9 w10"))
    // the last chunk is the only short one and still reaches token 25
    assert(got((1L, 2L))._2 == 9L && got((1L, 2L))._3.endsWith("w25"))
    // short doc: one chunk, whole doc
    assert(got((2L, 0L)) == ((0L, 3L, "a b c")))
    // zero-token doc emits nothing
    assert(!got.keys.exists(_._1 == 3L))
  }

  // --- redactPii ---

  test("pii: counts are stage-disjoint and the redaction chain is ordered email→ip→phone") {
    val df = Seq(
      (1L, "mail a.b+c@ex.org and 10.0.0.1@ex.com then ip 192.168.1.1 call +4912345678"),
      (2L, "no identifiers here"),
      (3L, "two mails x@y.de z@w.fr one ip 8.8.8.8"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.redactPii(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: the dotted-quad LOCAL PART belongs to the email it was redacted
    // with — 2 emails, 1 ip (not 2), 1 phone
    assert((got(1L).getLong(1), got(1L).getLong(2), got(1L).getLong(3)) == ((2L, 1L, 1L)))
    assert(got(1L).getString(4) ==
      "mail [EMAIL] and [EMAIL] then ip [IP] call [PHONE]")
    assert((got(2L).getLong(1), got(2L).getLong(2), got(2L).getLong(3)) == ((0L, 0L, 0L)))
    assert(got(2L).getString(4) == "no identifiers here")
    assert((got(3L).getLong(1), got(3L).getLong(2)) == ((2L, 1L)))
    // null text stays null all the way through — no fabricated zeros
    assert(got(4L).isNullAt(1) && got(4L).isNullAt(4))
  }

  test("chunking: a non-advancing overlap is rejected up front") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.chunkDocuments(df, "text", "doc_id", 10, 10)
    }.getMessage.contains("overlapTokens"))
  }

  // --- aucByGroup ---

  test("auc: hand-computed value with ties, perfect/inverted/one-class groups") {
    // group "m": pos scores {3, 2}, neg scores {2, 1}
    //   pairs: (3,2)+ (3,1)+ (2,2)tie (2,1)+  → AUC = 3.5/4
    val rows = Seq(
      ("m", 3L, 1), ("m", 2L, 1), ("m", 2L, 0), ("m", 1L, 0),
      ("perfect", 9L, 1), ("perfect", 1L, 0),
      ("inverted", 1L, 1), ("inverted", 9L, 0),
      ("onecls", 5L, 1), ("onecls", 7L, 1)
    ).toDF("g", "s", "label")
    val got = graft.ml.MLOps.aucByGroup(rows, "g", col("s"), "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got("m") == ((2L, 2L, Some(0.875))))
    assert(got("perfect") == ((1L, 1L, Some(1.0))))
    assert(got("inverted") == ((1L, 1L, Some(0.0))))
    // one-class AUC is undefined → NULL, never 0/0
    assert(got("onecls") == ((2L, 0L, None)))
  }

  test("auc: all-ties group scores exactly 0.5") {
    val rows = Seq(("g", 4L, 1), ("g", 4L, 0), ("g", 4L, 1), ("g", 4L, 0))
      .toDF("g", "s", "label")
    val got = graft.ml.MLOps.aucByGroup(rows, "g", col("s"), "label").collect()(0)
    assert(got.getDouble(3) == 0.5)
  }

  // --- prCurveByGroup ---

  test("pr curve: cumulative tp/fp and exact ratios at every distinct score") {
    // scores desc: 3(pos) | 2(pos,neg) | 1(neg)  → P=2
    val rows = Seq(("g", 3L, 1), ("g", 2L, 1), ("g", 2L, 0), ("g", 1L, 0))
      .toDF("g", "s", "label")
    val got = graft.ml.MLOps.prCurveByGroup(rows, "g", col("s"), "label")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(3L) == ((1L, 0L, 1.0, 0.5)))
    assert(got(2L) == ((2L, 1L, 2.0 / 3.0, 1.0)))
    assert(got(1L) == ((2L, 2L, 0.5, 1.0)))
  }

  test("pr curve: positive-free group has NULL recall, defined precision") {
    val rows = Seq(("g", 5L, 0), ("g", 7L, 0)).toDF("g", "s", "label")
    val got = graft.ml.MLOps.prCurveByGroup(rows, "g", col("s"), "label").collect()
    assert(got.forall(r => r.isNullAt(5)), "recall undefined with P=0")
    assert(got.forall(r => r.getDouble(4) == 0.0), "precision tp/(tp+fp) = 0")
  }

  // --- ksByGroup ---

  test("ks: separated, interleaved, identical, and one-class groups") {
    val rows = Seq(
      // "sep": A={1,2} fully below B={3,4} → D = 1
      ("sep", 1L, 1), ("sep", 2L, 1), ("sep", 3L, 0), ("sep", 4L, 0),
      // "mix": A={1,3}, B={2,4} → max gap 1/2 (at s=1)
      ("mix", 1L, 1), ("mix", 3L, 1), ("mix", 2L, 0), ("mix", 4L, 0),
      // "same": identical samples → D = 0
      ("same", 5L, 1), ("same", 5L, 0),
      ("onecls", 9L, 1), ("onecls", 8L, 1)
    ).toDF("g", "s", "label")
    val got = graft.ml.MLOps.ksByGroup(rows, "g", col("s"), "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got("sep") == ((2L, 2L, Some(1.0))))
    assert(got("mix") == ((2L, 2L, Some(0.5))))
    assert(got("same") == ((1L, 1L, Some(0.0))))
    assert(got("onecls") == ((2L, 0L, None)))
  }

  // --- spearmanByGroup ---

  test("spearman: monotone=1, inverted=-1, tied hand case, constant margin=NULL") {
    val rows = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 90L),
      ("down", 1L, 3L), ("down", 2L, 2L), ("down", 3L, 1L),
      // "tie": x=(1,2,2,3), y=(1,3,2,4); avg-ranks x=(1,2.5,2.5,4)
      // y=(1,3,2,4) → rho = 11/(sqrt(12.5)*sqrt(13...)) hand-checked below
      ("tie", 1L, 1L), ("tie", 2L, 3L), ("tie", 2L, 2L), ("tie", 3L, 4L),
      ("const", 7L, 1L), ("const", 7L, 2L)
    ).toDF("g", "x", "y")
    val got = graft.ops.Aggregations.spearmanByGroup(rows, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got("up") == ((3L, Some(1.0))))
    assert(got("down") == ((3L, Some(-1.0))))
    assert(got("const")._2.isEmpty, "constant x → rho undefined → NULL")
    // tie group, centered doubled ranks: x → (-3, 0, 0, 3), y → (-3, 1, -1, 3)
    // num = 9+0+0+9 = 18; dx = 9+0+0+9 = 18; dy = 9+1+1+9 = 20
    val expected = 18.0 / math.sqrt(18.0 * 20.0)
    assert(math.abs(got("tie")._2.get - expected) < 1e-15)
  }

  // --- keyConcentration ---

  test("hhi: monopoly=1, uniform=1/k, effective count is the reciprocal") {
    val rows = Seq(
      ("mono", "a"), ("mono", "a"), ("mono", "a"),
      ("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d"),
      // skew: 3+1 → hhi = (9+1)/16
      ("skew", "a"), ("skew", "a"), ("skew", "a"), ("skew", "b")
    ).toDF("g", "k")
    val got = graft.ops.TextAnalysis.keyConcentration(rows, "g", "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("mono") == ((1L, 3L, 1.0, 1.0)))
    assert(got("uni") == ((4L, 4L, 0.25, 4.0)))
    assert(got("skew") == ((2L, 4L, 10.0 / 16.0, 16.0 / 10.0)))
  }

  // --- loud-guard fixes (ADVICE r10) ---

  test("domainReweightRound: a NULL loss fails loudly instead of deflating the mean") {
    val df = Seq(("a", Some(100L)), ("a", None), ("b", Some(100L)))
      .toDF("domain", "loss")
    val e = intercept[Exception] {
      graft.ml.MLOps.domainReweightRound(df, "domain", col("loss"),
        Map("a" -> 500L, "b" -> 500L)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL lossMilli"),
      s"expected the loud null-loss error, got: ${e.getMessage}")
  }

  test("curriculumOrder: a plan-bloating phases*buckets is rejected up front") {
    val df = Seq((1L, 0)).toDF("doc_id", "p")
    val e = intercept[IllegalArgumentException] {
      graft.ml.MLOps.curriculumOrder(df, "doc_id", col("p"),
        phases = 2000, buckets = 1000)
    }
    assert(e.getMessage.contains("10^6"))
  }
}

/** q198's staged EventTrigger gate (streaming modality #9): the trigger
  * store's final state equals the static filter, the worker store holds
  * every row, and the contract pipeline (rename + derived predicate) runs
  * INSIDE the stream. */
class StagedTriggerGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.contract._
  import graft.core.FeatureType._
  import graft.expr.{Lit, Ref}

  test("trigger store equals the static filter; worker store sees every row") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
    val rows = (1 to 40).map(i =>
        (i.toLong, new java.sql.Timestamp(t0 + i * 60000L), s"t${i % 3}", i * 10.0))
      .toDF("event_id", "ts", "evt_type", "value")
    val view = FeatureView("trig_spec", graft.sources.CustomSource(_.emptyDataFrame),
      entities = Seq(Feature("event_id", FInt64)),
      features = Seq(Feature("value", FFloat64), Feature("event_type", FString)),
      derived = Seq(DerivedFeature("hot", FBool, Ref("value") > Lit(300.0), Seq("value"))),
      eventTimestamp = Some(EventTimestamp("ts")),
      mappingKeys = Map("evt_type" -> "event_type"))
    val work = java.nio.file.Files.createTempDirectory("graft_trig_spec")
    val got = graft.streaming.Streaming.stagedTriggerRun(spark, rows, "ts",
        "event_id", view, col("hot"), chunks = 3, workDir = Some(work.toString))
      .collect().map(_.getAs[Long]("event_id")).sorted.toSeq
    assert(got == (31L to 40L), s"trigger store must hold exactly value>300 rows, got $got")
    // the rename ran in-stream: the store carries event_type, not evt_type
    val main = spark.read.parquet(work.resolve("store").toString)
    assert(main.columns.contains("event_type") && !main.columns.contains("evt_type"))
    assert(main.count() == 40)
    // genuinely multi-batch: one commit marker per staged chunk
    assert(new java.io.File(work.resolve("commitlog").toString).listFiles()
      .count(_.getName.startsWith("batch-")) >= 3)
  }
}
