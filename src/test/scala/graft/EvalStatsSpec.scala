package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 eval/monitoring additions: ranked-retrieval quality
  * (rankingMetrics, q213), chi-square homogeneity + Cramér's V
  * (chiSquareByGroup, q214), Cohen's kappa (cohenKappaByGroup, q215) and
  * the k-anonymity class-size profile (kAnonymityProfile, q216). Each has
  * a hand-computed closed-form case plus its loud-guard edges. */
class EvalStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- rankingMetrics ---

  test("rankingMetrics: hand-computed nDCG@3 / RR / recall@3 on one query") {
    // ranks 1..4 with gains 0,3,1,2; k=3. discs = [1e6, 630930, 500000]
    val run = Seq(("q", 1L, 0L), ("q", 2L, 3L), ("q", 3L, 1L), ("q", 4L, 2L))
      .toDF("qid", "rnk", "rel")
    val r = graft.ml.MLOps.rankingMetrics(run, "qid", col("rnk"), col("rel"), 3)
      .collect().head
    assert(r.getAs[Long]("n_labeled") == 4L)
    assert(r.getAs[Long]("n_relevant") == 3L)
    assert(r.getAs[Long]("first_rel_rank") == 2L)
    assert(r.getAs[Double]("rr") == 0.5)
    assert(r.getAs[Long]("hits_at_k") == 2L)
    assert(r.getAs[Double]("recall_at_k") == 2.0 / 3.0)
    // DCG = 3·630930 + 1·500000; ideal gains desc = 3,2,1 over discs 1..3
    assert(r.getAs[Long]("dcg_micro") == 3L * 630930L + 500000L)
    assert(r.getAs[Long]("idcg_micro") == 3L * 1000000L + 2L * 630930L + 500000L)
    assert(r.getAs[Double]("ndcg_at_k") == 2392790.0 / 4761860.0)
  }

  test("rankingMetrics: no relevant docs -> null rank metrics, zero recall denominator") {
    val run = Seq(("q", 1L, 0L), ("q", 2L, 0L)).toDF("qid", "rnk", "rel")
    val r = graft.ml.MLOps.rankingMetrics(run, "qid", col("rnk"), col("rel"), 2)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("first_rel_rank")))
    assert(r.isNullAt(r.fieldIndex("rr")))
    assert(r.isNullAt(r.fieldIndex("recall_at_k")))
    assert(r.isNullAt(r.fieldIndex("ndcg_at_k")), "idcg=0 must yield NULL, not 0/0")
  }

  test("rankingMetrics: duplicate ranks in a run fail loudly") {
    val run = Seq(("q", 1L, 1L), ("q", 1L, 2L)).toDF("qid", "rnk", "rel")
    val e = intercept[Exception] {
      graft.ml.MLOps.rankingMetrics(run, "qid", col("rnk"), col("rel"), 2).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("duplicate ranks"))
  }

  test("rankingMetrics: rank < 1 and negative gain fail loudly") {
    val r0 = Seq(("q", 0L, 1L)).toDF("qid", "rnk", "rel")
    val e0 = intercept[Exception] {
      graft.ml.MLOps.rankingMetrics(r0, "qid", col("rnk"), col("rel"), 2).collect()
    }
    assert(e0.getMessage != null && e0.getMessage.contains("rank < 1"))
    val rn = Seq(("q", 1L, -1L)).toDF("qid", "rnk", "rel")
    val en = intercept[Exception] {
      graft.ml.MLOps.rankingMetrics(rn, "qid", col("rnk"), col("rel"), 2).collect()
    }
    assert(en.getMessage != null && en.getMessage.contains("negative relevance"))
  }

  // --- chiSquareByGroup ---

  test("chiSquare: complete separation gives chi2 = n and V = 1") {
    // pop A entirely in bin 1, pop B entirely in bin 2, two rows each
    val rows = Seq(("g", 1L, 1), ("g", 1L, 1), ("g", 2L, 0), ("g", 2L, 0))
      .toDF("g", "b", "label")
    val r = graft.ml.MLOps.chiSquareByGroup(rows, "g", col("b"), "label")
      .collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Double]("chi2") == 4.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("chiSquare: identical distributions give chi2 = 0; one-class group is NULL") {
    val same = Seq(("g", 1L, 1), ("g", 1L, 0), ("g", 2L, 1), ("g", 2L, 0))
      .toDF("g", "b", "label")
    val r = graft.ml.MLOps.chiSquareByGroup(same, "g", col("b"), "label")
      .collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    val oneClass = Seq(("g", 1L, 1), ("g", 2L, 1)).toDF("g", "b", "label")
    val r1 = graft.ml.MLOps.chiSquareByGroup(oneClass, "g", col("b"), "label")
      .collect().head
    assert(r1.isNullAt(r1.fieldIndex("chi2")), "one-class chi2 is undefined")
  }

  test("chiSquare: a single shared bin gives chi2 = 0 and NULL V") {
    val rows = Seq(("g", 7L, 1), ("g", 7L, 0)).toDF("g", "b", "label")
    val r = graft.ml.MLOps.chiSquareByGroup(rows, "g", col("b"), "label")
      .collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.isNullAt(r.fieldIndex("cramers_v")), "V needs >= 2 bins")
  }

  // --- cohenKappaByGroup ---

  test("kappa: textbook 2x2 table gives 0.6; perfect agreement gives 1") {
    // cells: (1,1)x4 (0,0)x4 (1,0)x1 (0,1)x1 -> po=.8, pe=.5, kappa=.6
    val rows = (Seq.fill(4)((1, 1)) ++ Seq.fill(4)((0, 0)) ++
      Seq((1, 0), (0, 1))).map { case (a, b) => ("g", a, b) }.toDF("g", "a", "b")
    val r = graft.ml.MLOps.cohenKappaByGroup(rows, "g", col("a"), col("b"))
      .collect().head
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_agree") == 8L)
    assert(r.getAs[Double]("kappa") == 0.6)
    val perfect = Seq(("g", 1, 1), ("g", 0, 0), ("g", 2, 2)).toDF("g", "a", "b")
    val rp = graft.ml.MLOps.cohenKappaByGroup(perfect, "g", col("a"), col("b"))
      .collect().head
    assert(rp.getAs[Double]("kappa") == 1.0)
  }

  test("kappa: both raters constant and equal -> pe = 1, NULL not 0/0") {
    val rows = Seq(("g", 1, 1), ("g", 1, 1)).toDF("g", "a", "b")
    val r = graft.ml.MLOps.cohenKappaByGroup(rows, "g", col("a"), col("b"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  // --- kAnonymityProfile ---

  test("kAnonymity: class-size distribution with cumulative at-risk rows") {
    val rows = Seq("a", "a", "a", "b", "b", "c").toDF("qi")
    val got = graft.ops.Profiling.kAnonymityProfile(rows, Seq("qi"))
      .collect().map(r => (r.getAs[Long]("class_size"),
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("rows_at_or_below")))).toMap
    assert(got == Map(1L -> (1L, 1L, 1L), 2L -> (1L, 2L, 3L), 3L -> (1L, 3L, 6L)))
  }

  test("kAnonymity: an empty QI set is rejected") {
    val e = intercept[IllegalArgumentException] {
      graft.ops.Profiling.kAnonymityProfile(Seq("x").toDF("c"), Seq.empty)
    }
    assert(e.getMessage.contains("quasi-identifier"))
  }

  // --- eceByGroup ---

  test("ece: hand-computed two-bin case, exact integer numerator") {
    // bin 2: scores .2/.2 labels 1,0 -> term |1e6 - 400000| = 600000
    // bin 7: score .75 label 1      -> term |1e6 - 750000| = 250000
    // ece = 850000 / (1e6 * 3); mce = 600000 / (1e6 * 2) = 0.3
    val rows = Seq(("g", 0.2, 1), ("g", 0.2, 0), ("g", 0.75, 1))
      .toDF("g", "score", "label")
    val r = graft.ml.MLOps.eceByGroup(rows, "g", "score", "label", 0.1)
      .collect().head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Double]("ece") == 850000.0 / 3000000.0)
    assert(r.getAs[Double]("mce") == 0.3)
  }

  test("ece: perfectly calibrated bin gives zero; bad binWidth rejected") {
    // bin with pos rate .5 and mean score exactly .5 -> term 0
    val rows = Seq(("g", 0.5, 1), ("g", 0.5, 0)).toDF("g", "score", "label")
    val r = graft.ml.MLOps.eceByGroup(rows, "g", "score", "label", 1.0)
      .collect().head
    assert(r.getAs[Double]("ece") == 0.0 && r.getAs[Double]("mce") == 0.0)
    intercept[IllegalArgumentException] {
      graft.ml.MLOps.eceByGroup(rows, "g", "score", "label", 0.0)
    }
  }

  // --- fleissKappaByGroup ---

  test("fleiss: hand-computed 2-item 2-rater tables") {
    // item1 AA, item2 AB: A=2, C=3^2+1^2=10, I*r=4 -> kappa = (8-10)/6
    val mixed = Seq(("g", "i1", "A"), ("g", "i1", "A"),
      ("g", "i2", "A"), ("g", "i2", "B")).toDF("g", "item", "cat")
    val rm = graft.ml.MLOps.fleissKappaByGroup(mixed, "g", "item", col("cat"))
      .collect().head
    assert(rm.getAs[Long]("n_items") == 2L && rm.getAs[Long]("n_raters") == 2L)
    assert(rm.getAs[Double]("kappa") == -2.0 / 6.0)
    // item1 AA, item2 BB: po=1, pe=.5 -> kappa=1
    val perfect = Seq(("g", "i1", "A"), ("g", "i1", "A"),
      ("g", "i2", "B"), ("g", "i2", "B")).toDF("g", "item", "cat")
    val rp = graft.ml.MLOps.fleissKappaByGroup(perfect, "g", "item", col("cat"))
      .collect().head
    assert(rp.getAs[Double]("kappa") == 1.0)
  }

  test("fleiss: one-category degenerate is NULL; uneven panels fail loudly") {
    val oneCat = Seq(("g", "i1", "A"), ("g", "i1", "A"),
      ("g", "i2", "A"), ("g", "i2", "A")).toDF("g", "item", "cat")
    val r = graft.ml.MLOps.fleissKappaByGroup(oneCat, "g", "item", col("cat"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("kappa")), "pe = 1 must yield NULL, not 0/0")
    val uneven = Seq(("g", "i1", "A"), ("g", "i1", "B"),
      ("g", "i2", "A")).toDF("g", "item", "cat")
    val e = intercept[Exception] {
      graft.ml.MLOps.fleissKappaByGroup(uneven, "g", "item", col("cat")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("uneven rater counts"))
    val solo = Seq(("g", "i1", "A"), ("g", "i2", "B")).toDF("g", "item", "cat")
    val e1 = intercept[Exception] {
      graft.ml.MLOps.fleissKappaByGroup(solo, "g", "item", col("cat")).collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains(">= 2 raters"))
  }

  // --- packSequences ---

  test("packSequences: uniform docs tile sequences exactly, order-free asserts") {
    val docs = (1 to 6).map(i => (s"d$i", 10L)).toDF("k", "n")
    val got = graft.ml.MLOps.packSequences(docs, "k", col("n"),
      seqLen = 10, buckets = 4).collect()
    assert(got.length == 6)
    assert(got.forall(_.getAs[Long]("n_seqs_spanned") == 1L))
    assert(got.forall(!_.getAs[Boolean]("is_split")))
    // six 10-token docs at L=10 occupy seqs 0..5, one doc each
    assert(got.map(_.getAs[Long]("start_seq")).sorted.toSeq == (0L to 5L))
    assert(got.forall(r => r.getAs[Long]("end_seq") == r.getAs[Long]("start_seq")))
  }

  test("packSequences: 7-token docs at L=10 straddle as the offsets dictate") {
    // offsets 0,7,14 whatever the md5 order: spans (0,0) (0,1) (1,2)
    val docs = Seq(("a", 7L), ("b", 7L), ("c", 7L)).toDF("k", "n")
    val got = graft.ml.MLOps.packSequences(docs, "k", col("n"),
      seqLen = 10, buckets = 2).collect()
    val spans = got.map(r => (r.getAs[Long]("start_seq"), r.getAs[Long]("end_seq")))
      .sortBy(identity).toSeq
    assert(spans == Seq((0L, 0L), (0L, 1L), (1L, 2L)))
    assert(got.count(_.getAs[Boolean]("is_split")) == 2)
  }

  test("packSequences: zero-token doc occupies no span; bad seqLen rejected") {
    val docs = Seq(("a", 0L), ("b", 5L)).toDF("k", "n")
    val got = graft.ml.MLOps.packSequences(docs, "k", col("n"),
      seqLen = 10, buckets = 1).collect()
    val empty = got.find(_.getAs[String]("k") == "a").get
    assert(empty.isNullAt(empty.fieldIndex("start_seq")))
    assert(empty.getAs[Long]("n_seqs_spanned") == 0L)
    assert(!empty.getAs[Boolean]("is_split"))
    intercept[IllegalArgumentException] {
      graft.ml.MLOps.packSequences(docs, "k", col("n"), seqLen = 0, buckets = 1)
    }
  }

  // --- Portable fixed-point log2 ---

  test("Portable.log2Micro: within 1 micro of true log2 across magnitudes, exact at powers of two") {
    val ms = (1L to 64L) ++ Seq(100L, 999L, 4096L, 1000000L, 1L << 40, (1L << 40) + 12345L)
    val got = ms.toDF("m").select(col("m"),
        graft.functions.Portable.log2Micro(col("m")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ms.foreach { m =>
      val want = math.log(m.toDouble) / math.log(2.0) * 1e6
      assert(math.abs(got(m) - want) <= 1.0, s"m=$m got=${got(m)} want=$want")
    }
    assert(got(1L) == 0L && got(2L) == 1000000L && got(4096L) == 12000000L)
  }

  test("Portable.poissonCount: integer threshold edges give the documented counts") {
    val t = graft.functions.Portable.PoissonThresholds32
    val hs = Seq(0L, t(0) - 1, t(0), t(1) - 1, t(1), t.last - 1, t.last, 4294967295L)
    val got = hs.toDF("h").select(col("h"),
        graft.functions.Portable.poissonCount(col("h")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(t(0) - 1) == 0L && got(t(0)) == 1L)
    assert(got(t(1) - 1) == 1L && got(t(1)) == 2L)
    assert(got(t.last - 1) == 7L && got(t.last) == 8L && got(4294967295L) == 8L)
  }

  // --- bootstrapMeanCI ---

  test("bootstrapMeanCI: CI brackets a stable mean, b_kept drops only for tiny groups") {
    val rows = (1L to 400L).map(i => ("big", i % 7 + 10L, i)) :+ (("one", 5L, 9999L))
    val df = rows.toDF("grp", "v", "id")
    val out = graft.ml.MLOps.bootstrapMeanCI(df, "grp", col("v"), "id",
        resamples = 100, tailMilli = 25)
      .collect().map(r => r.getString(0) -> r).toMap
    val big = out("big")
    assert(big.getAs[Long]("n_rows") == 400L)
    val mean = big.getAs[Double]("mean_x")
    assert(big.getAs[Double]("ci_lo") <= mean && mean <= big.getAs[Double]("ci_hi"))
    assert(big.getAs[Double]("ci_lo") < big.getAs[Double]("ci_hi"))
    assert(big.getAs[Long]("b_kept") == 100L) // 400 rows: no zero-weight resample
    val one = out("one") // 1-row group: ~1/e of resamples draw weight 0 and drop
    assert(one.getAs[Long]("b_kept") < 100L && one.getAs[Long]("b_kept") > 0L)
    assert(one.getAs[Double]("ci_lo") == 5.0 && one.getAs[Double]("ci_hi") == 5.0)
    intercept[IllegalArgumentException] {
      graft.ml.MLOps.bootstrapMeanCI(df, "grp", col("v"), "id", resamples = 2)
    }
    intercept[IllegalArgumentException] {
      graft.ml.MLOps.bootstrapMeanCI(df, "grp", col("v"), "id", tailMilli = 600)
    }
  }

  // --- groupFrechetDiag ---

  test("groupFrechetDiag: zero for identical groups, hand-computed for a mean shift") {
    val va = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 6.0f))
    val df = (va.map(("a", _)) ++ va.map(("b", _)) ++
        va.map { v => ("c", Seq(v(0) + 10.0f, v(1))) })
      .toDF("g", "emb")
    val out = graft.ops.Similarity.groupFrechetDiag(df, "emb", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("frechet_diag")).toMap
    assert(out(("a", "b")) == 0.0)
    // c = a shifted +10 in dim 1 only: variances equal, so distance = 100
    assert(math.abs(out(("a", "c")) - 100.0) < 1e-6)
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c"))) // a < b ordering only
  }

  // --- zipfSlope ---

  test("zipfSlope: exact power law fits slope -1 with r2 ~ 1; topN cap enforced") {
    // word w_r appears round(64/r) times => log2 f ~ 6 - log2 r
    val words = (1 to 16).flatMap(r => Seq.fill(math.round(64.0 / r).toInt)(s"w$r"))
    val df = Seq(("s", words.mkString(" "))).toDF("src", "text")
    val out = graft.ops.TextAnalysis.zipfSlope(df, "text", "src", topN = 16)
      .collect().head
    assert(out.getAs[Long]("n_terms") == 16L)
    assert(math.abs(out.getAs[Double]("zipf_slope") + 1.0) < 0.05)
    assert(out.getAs[Double]("r2") > 0.99)
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.zipfSlope(df, "text", "src", topN = 129)
    }
  }

  // --- trimmedStats / robustCenter ---

  test("trimmedStats: sort-and-slice equality incl. partial boundary eating") {
    val a = (1L to 10L).map(("a", _))          // trim 20%: k=2, mean(3..8)=5.5
    val b = Seq(1L, 1L, 1L, 1L, 100L).map(("b", _)) // k=1: eat ONE of the four 1s + the 100
    val df = (a ++ b).toDF("g", "v")
    val out = graft.ops.Aggregations.trimmedStats(df, Seq("g"), "v", trimMilli = 200)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_trimmed_each") == 2L)
    assert(out("a").getAs[Double]("trimmed_mean") == 5.5)
    assert(out("b").getAs[Long]("n_trimmed_each") == 1L)
    assert(out("b").getAs[Double]("trimmed_mean") == 1.0)
    // trimMilli=0 is the plain mean; k hitting everything nulls the mean
    val plain = graft.ops.Aggregations.trimmedStats(df, Seq("g"), "v", 0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("trimmed_mean")).toMap
    assert(plain("a") == 5.5 && plain("b") == 20.8)
    val tiny = Seq(("t", 7L), ("t", 9L)).toDF("g", "v")
    val r = graft.ops.Aggregations.trimmedStats(tiny, Seq("g"), "v", 499)
      .collect().head
    assert(r.getAs[Long]("n_trimmed_each") == 0L && r.getAs[Double]("trimmed_mean") == 8.0)
    intercept[IllegalArgumentException] {
      graft.ops.Aggregations.trimmedStats(df, Seq("g"), "v", 500)
    }
  }

  test("robustCenter: exact median and MAD, lerp on even counts") {
    val df = (Seq(1L, 2L, 3L, 4L, 100L).map(("odd", _)) ++
      Seq(1L, 2L, 3L, 10L).map(("even", _))).toDF("g", "v")
    val out = graft.ops.Aggregations.robustCenter(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("odd").getAs[Long]("n_rows") == 5L)
    assert(out("odd").getAs[Double]("median") == 3.0)
    assert(out("odd").getAs[Double]("mad") == 1.0) // devs 0,1,1,2,97
    assert(out("even").getAs[Double]("median") == 2.5)
    assert(out("even").getAs[Double]("mad") == 1.0) // devs .5,.5,1.5,7.5 -> lerp 1.0
  }

  // --- splitLeakageAudit ---

  test("splitLeakageAudit: exact cross/within counts and milli rate") {
    val docs = Seq((1L, "train"), (2L, "train"), (3L, "eval"), (4L, "eval"))
      .toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("id_a", "id_b")
    val r = graft.ml.MLOps.splitLeakageAudit(docs, pairs, "doc_id", "split")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Long]("n_cross_split") == 2L)
    assert(r.getAs[Long]("n_within") == 2L)
    assert(r.getAs[Long]("leakage_milli") == 500L)
  }

  // --- weightedSampleK ---

  test("weightedSampleK: exactly k per group, small groups pass whole, deterministic") {
    val df = ((1L to 40L).map(i => ("big", i, i)) ++
      Seq(("small", 100L, 5L), ("small", 101L, 5L))).toDF("g", "id", "w")
    val out = graft.ml.MLOps.weightedSampleK(df, "g", "id", col("w"), k = 7)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("big" -> 7L, "small" -> 2L))
    // sample_rank is dense 1..k within each group
    val ranks = out.filter(col("g") === "big")
      .select("sample_rank").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to 7))
    // same input, same winners — the draw is a pure function of the key
    val again = graft.ml.MLOps.weightedSampleK(df, "g", "id", col("w"), 7)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    intercept[IllegalArgumentException] {
      graft.ml.MLOps.weightedSampleK(df, "g", "id", col("w"), 0)
    }
    // the rank<=k filter compiles to WindowGroupLimit: local top-k per
    // group before the shuffle, no full per-group sort (the docstring's
    // 100 TB claim, pinned)
    val plan = graft.ml.MLOps.weightedSampleK(df, "g", "id", col("w"), 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(400))
  }

  test("weightedSampleK: non-positive and NULL weights fail loudly") {
    val bad = Seq(("g", 1L, java.lang.Long.valueOf(3L)),
      ("g", 2L, java.lang.Long.valueOf(0L))).toDF("g", "id", "w")
    val e = intercept[Exception] {
      graft.ml.MLOps.weightedSampleK(bad, "g", "id", col("w"), 1).collect()
    }
    assert(e.getMessage.contains("weightedSampleK"))
    val withNull = Seq(("g", 1L, Some(3L)), ("g", 2L, None))
      .toDF("g", "id", "w")
    val e2 = intercept[Exception] {
      graft.ml.MLOps.weightedSampleK(withNull, "g", "id", col("w"), 1).collect()
    }
    assert(e2.getMessage.contains("weightedSampleK"))
  }

  test("weightedSampleK: heavier rows win more often across group replicas") {
    // 200 replica groups of {heavy w=50, 9 light w=1}, k=1: the heavy row
    // should win far more often than any single light one (E≈50/59); with
    // md5 draws this is deterministic, so pin a generous band
    val rows = for (g <- 1 to 200; i <- 0 to 9)
      yield (s"g$g", g * 100L + i, if (i == 0) 50L else 1L)
    val won = graft.ml.MLOps.weightedSampleK(rows.toDF("g", "id", "w"),
        "g", "id", col("w"), 1)
      .filter(col("id") % 100 === 0).count()
    assert(won > 120 && won < 200, s"heavy row won $won/200")
  }

  // --- datasetCard ---

  test("datasetCard: hand-computed card incl. lexicographic top-lang tie-break") {
    val df = Seq(
      ("s1", "en", 10L), ("s1", "en", 20L), ("s1", "de", 30L),
      ("s2", "fr", 20L), ("s2", "de", 20L)).toDF("source", "lang", "n_chars")
    val out = graft.ops.Aggregations.datasetCard(df, "source", "lang", "n_chars")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") == 3L && s1.getAs[Long]("chars_total") == 60L)
    assert(s1.getAs[Long]("chars_min") == 10L && s1.getAs[Long]("chars_max") == 30L)
    assert(s1.getAs[Double]("mean_chars") == 20.0)
    assert(s1.getAs[Long]("share_milli") == 600L) // 60 of 100
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[String]("top_lang") == "en")
    assert(s1.getAs[Long]("top_lang_milli") == 666L)
    val s2 = out("s2")
    assert(s2.getAs[String]("top_lang") == "de") // tie de/fr -> lexicographic
    assert(s2.getAs[Long]("top_lang_milli") == 500L)
  }

  // --- percentileRank ---

  test("percentileRank: matches percent_rank incl. ties, singletons, NULL passthrough") {
    val df = Seq(("a", 1L, Some(10L)), ("a", 2L, Some(10L)), ("a", 3L, Some(20L)),
      ("a", 4L, Some(40L)), ("b", 5L, Some(7L)), ("b", 6L, None))
      .toDF("g", "id", "v")
    val out = graft.ops.Aggregations.percentileRank(df, Seq("g"), "v", "pr")
      .collect().map(r => r.getLong(1) -> Option(r.getAs[java.lang.Double]("pr"))).toMap
    assert(out(1L) == Some(0.0) && out(2L) == Some(0.0)) // ties share min rank
    assert(out(3L) == Some(2.0 / 3.0) && out(4L) == Some(1.0))
    assert(out(5L) == Some(0.0)) // single non-null value in group b
    assert(out(6L).isEmpty)      // NULL passes through with NULL rank
    // equality with the row-window builtin on the non-null rows
    val builtin = df.filter(col("v").isNotNull).withColumn("pr",
        percent_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v"))))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    builtin.foreach { case (id, p) => assert(out(id) == Some(p)) }
  }

  test("percentileRank: fractional values rank distinctly (no long truncation)") {
    // 0.1 / 0.5 / 0.9 would all truncate to 0L under a long cast and tie
    // at rank 0 — the double histogram must separate them
    val df = Seq(("g", 1L, 0.1), ("g", 2L, 0.5), ("g", 3L, 0.9))
      .toDF("g", "id", "v")
    val out = graft.ops.Aggregations.percentileRank(df, Seq("g"), "v", "pr")
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("pr")).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.5 && out(3L) == 1.0)
  }

  // --- unigramEntropy ---

  test("unigramEntropy: hand-computed H and KL on a two-slice corpus") {
    val df = Seq(("a", "x x y"), ("b", "x")).toDF("src", "text")
    val out = graft.ops.TextAnalysis.unigramEntropy(df, "text", "src")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_tokens") == 3L && a.getAs[Long]("vocab") == 2L)
    // H(a) = log2(3) - (2*log2(2) + 1*log2(1))/3 = 1.584963 - 2/3
    assert(math.abs(a.getAs[Double]("entropy_bits") - (math.log(3) / math.log(2) - 2.0 / 3.0)) < 3e-6)
    // KL(a||corpus) = 2*(log2(2)-log2(3))/3 + log2(4) - log2(3)
    val klA = 2.0 * (1.0 - math.log(3) / math.log(2)) / 3.0 + 2.0 - math.log(3) / math.log(2)
    assert(math.abs(a.getAs[Double]("kl_bits") - klA) < 3e-6)
    val b = out("b")
    assert(b.getAs[Long]("n_tokens") == 1L && b.getAs[Long]("vocab") == 1L)
    assert(b.getAs[Double]("entropy_bits") == 0.0) // single token: log2(1) - 0
    // KL(b||corpus) = -log2(3) + log2(4)
    assert(math.abs(b.getAs[Double]("kl_bits") - (2.0 - math.log(3) / math.log(2))) < 3e-6)
  }

  // --- clusterSilhouette ---

  test("clusterSilhouette: axis clusters score 1, the tie diagonal scores 0") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)), // pure c1: a=0, b=1 -> s=1
      (3L, Seq(1.0, 1.0)),                      // equidistant, ties to c1 -> s=0
      (4L, Seq(0.0, 5.0)))                      // pure c2 -> s=1
      .toDF("vec_id", "v")
    val out = graft.ops.Similarity.clusterSilhouette(vecs, "v",
        Seq(1, 2), Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getAs[Long]("n") == 3L)
    assert(out(1).getAs[Long]("sum_sil_micro") == 2000000L)
    assert(math.abs(out(1).getAs[Double]("mean_sil") - 2.0 / 3.0) < 1e-12)
    assert(out(2).getAs[Long]("n") == 1L)
    assert(out(2).getAs[Double]("mean_sil") == 1.0)
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.clusterSilhouette(vecs, "v", Seq(1), Seq(Seq(1.0, 0.0)))
    }
  }

  // --- rboTruncated ---

  test("rboTruncated: identical lists hit the closed form, disjoint lists hit 0") {
    val same = Seq(("q", 1L, 1, 1), ("q", 2L, 2, 2), ("q", 3L, 3, 3))
      .toDF("qid", "item", "ra", "rb")
    val r = graft.ml.MLOps.rboTruncated(same, "qid", col("ra"), col("rb"),
      k = 3, pMilli = 900).collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("overlap_k") == 3L)
    // identical lists: every item contributes W(its rank); RBO = 0.1 * ΣW/1e9
    val w = graft.ml.MLOps.rboWeightsNano(3, 900)
    assert(r.getAs[Double]("rbo") == 0.1 * (w.sum.toDouble / 1e9))
    val disjoint = Seq(("q", 1L, 1, 20), ("q", 2L, 20, 1))
      .toDF("qid", "item", "ra", "rb")
    val d = graft.ml.MLOps.rboTruncated(disjoint, "qid", col("ra"), col("rb"), 3, 900)
      .collect().head
    assert(d.getAs[Long]("overlap_k") == 0L && d.getAs[Double]("rbo") == 0.0)
    // swapped pair: both items first co-present at depth 2
    val swap = Seq(("q", 1L, 1, 2), ("q", 2L, 2, 1)).toDF("qid", "item", "ra", "rb")
    val s = graft.ml.MLOps.rboTruncated(swap, "qid", col("ra"), col("rb"), 3, 900)
      .collect().head
    assert(s.getAs[Long]("overlap_k") == 2L)
    assert(s.getAs[Double]("rbo") == 0.1 * (2.0 * w(1) / 1e9))
    intercept[Exception] {
      graft.ml.MLOps.rboTruncated(
        Seq(("q", 1L, 0, 1)).toDF("qid", "item", "ra", "rb"),
        "qid", col("ra"), col("rb"), 3, 900).collect()
    }
  }

  test("rboTruncated: a NULL rank (item on one list only) contributes zero weight") {
    // item 2 is ranked ONLY by ranker A: greatest() skips nulls, so the
    // naive form would hand it m = 2 and the full depth-2 co-occurrence
    // weight — it must contribute 0 and stay out of overlap_k
    val df = Seq(("q", 1L, Some(1), Some(1)), ("q", 2L, Some(2), None),
      ("q", 3L, None, Some(2)))
      .toDF("qid", "item", "ra", "rb")
    val r = graft.ml.MLOps.rboTruncated(df, "qid", col("ra"), col("rb"),
      k = 3, pMilli = 900).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("overlap_k") == 1L) // only item 1 is on both lists
    val w = graft.ml.MLOps.rboWeightsNano(3, 900)
    assert(r.getAs[Double]("rbo") == 0.1 * (w(0).toDouble / 1e9))
  }

  test("histogram eval folds fail loudly on NULL and non-0/1 labels") {
    // sum(1 - label) would silently drop a NULL from both classes and
    // turn a label of 2 into a NEGATIVE count — the shared guard raises
    val nullLab = Seq(("g", 5, Some(1)), ("g", 3, None)).toDF("g", "s", "y")
    intercept[Exception] {
      graft.ml.MLOps.aucByGroup(nullLab, "g", col("s"), "y").collect()
    }
    val badLab = Seq(("g", 5, 1), ("g", 3, 2)).toDF("g", "s", "y")
    intercept[Exception] {
      graft.ml.MLOps.aucByGroup(badLab, "g", col("s"), "y").collect()
    }
    intercept[Exception] {
      graft.ml.MLOps.prCurveByGroup(badLab, "g", col("s"), "y").collect()
    }
    intercept[Exception] {
      graft.ml.MLOps.ksByGroup(badLab, "g", col("s"), "y").collect()
    }
    intercept[Exception] {
      graft.ml.MLOps.chiSquareByGroup(badLab, "g", col("s"), "y").collect()
    }
    // valid 0/1 labels still compute (the guard must not fire spuriously)
    val ok = Seq(("g", 5, 1), ("g", 3, 0)).toDF("g", "s", "y")
    assert(graft.ml.MLOps.aucByGroup(ok, "g", col("s"), "y")
      .collect().head.getAs[Double]("auc") == 1.0)
  }

  // --- covarianceMatrix (CovMoments custom aggregate) ---

  test("covarianceMatrix: hand-computed 2x2 incl. cross-partition buffer merge") {
    // scaleBits=0: integer vectors pass through quantization unchanged
    val df = Seq(("g", Seq(1.0, 2.0)), ("g", Seq(3.0, 4.0)),
      ("h", Seq(5.0, 5.0)))
      .toDF("grp", "v").repartition(7) // force partial buffers + merge
    val out = graft.ops.Similarity.covarianceMatrix(df, "v", "grp",
        dim = 2, scaleBits = 0)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getInt(3)) -> r).toMap
    val g11 = out(("g", 1, 1))
    assert(g11.getAs[Long]("n") == 2L && g11.getAs[Long]("sum_i") == 4L)
    assert(g11.getAs[Long]("s_ij") == 10L)
    assert(g11.getAs[Double]("cov") == 1.0) // 10/2 - 2*2
    val g12 = out(("g", 1, 2))
    assert(g12.getAs[Long]("s_ij") == 14L && g12.getAs[Double]("cov") == 1.0)
    val g22 = out(("g", 2, 2))
    assert(g22.getAs[Long]("s_ij") == 20L && g22.getAs[Double]("cov") == 1.0)
    // no (2,1) row: upper triangle only
    assert(!out.contains(("g", 2, 1)))
    // the custom aggregate plans as a PARTIAL+FINAL ObjectHashAggregate —
    // buffers merge map-side; the shuffle carries one buffer per group
    val plan = graft.ops.Similarity.covarianceMatrix(df, "v", "grp", 2, 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert("graft_cov_moments".r.findAllIn(plan).size >= 2, plan.take(500))
    val h = out(("h", 1, 2))
    assert(h.getAs[Long]("n") == 1L && h.getAs[Double]("cov") == 0.0)
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.covarianceMatrix(df, "v", "grp", dim = 200)
    }
  }

  test("covarianceMatrix: a wrong-width vector fails loudly, nulls are skipped") {
    val mixed = Seq(("g", Some(Seq(1.0, 2.0))), ("g", None))
      .toDF("grp", "v")
    val ok = graft.ops.Similarity.covarianceMatrix(mixed, "v", "grp", 2, 0)
      .collect()
    assert(ok.forall(_.getAs[Long]("n") == 1L)) // the null row never counted
    // longer vectors TRUNCATE to the first dim (the operator contract);
    // shorter ones cannot fill the buffer and must fail loudly
    val bad = Seq(("g", Seq(1.0))).toDF("grp", "v")
    val e = intercept[Exception] {
      graft.ops.Similarity.covarianceMatrix(bad, "v", "grp", 2, 0).collect()
    }
    assert(e.getMessage != null)
    // a holey vector (NULL element) must fail loudly, not read garbage
    val holey = Seq(("g", Seq(Some(1.0), None)), ("g", Seq(Some(2.0), Some(3.0))))
      .toDF("grp", "v")
    val e2 = intercept[Exception] {
      graft.ops.Similarity.covarianceMatrix(holey, "v", "grp", 2, 0).collect()
    }
    assert(e2.getMessage != null)
  }

  // --- giniByGroup ---

  test("giniByGroup: hand-computed values incl. ties, uniform zero, all-zero NULL") {
    val df = (Seq(1L, 1L, 2L).map(("t", _)) ++ Seq(5L, 5L).map(("u", _)) ++
      Seq(0L, 0L, 10L).map(("x", _)) ++ Seq(0L, 0L).map(("z", _)))
      .toDF("g", "v")
    val out = graft.ops.Aggregations.giniByGroup(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // t: sorted 1,1,2 -> rank sum 1+2+6=9; G = 18/(3*4) - 4/3 = 1/6
    assert(out("t").getAs[Long]("n_rows") == 3L)
    assert(out("t").getAs[Long]("total_value") == 4L)
    assert(math.abs(out("t").getAs[Double]("gini") - 1.0 / 6.0) < 1e-15)
    assert(out("u").getAs[Double]("gini") == 0.0) // equal values: no inequality
    // x: one row holds everything -> (n-1)/n = 2/3
    assert(math.abs(out("x").getAs[Double]("gini") - 2.0 / 3.0) < 1e-15)
    assert(out("z").isNullAt(out("z").fieldIndex("gini"))) // all-zero: 0/0
    intercept[Exception] {
      graft.ops.Aggregations.giniByGroup(
        Seq(("g", -1L)).toDF("g", "v"), Seq("g"), "v").collect()
    }
  }

  // --- mutualInformation ---

  test("mutualInformation: hand-computed MI and marginal entropies") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s2", "en"))
      .toDF("src", "lang")
    val r = graft.ops.TextAnalysis.mutualInformation(df, "src", "lang")
      .collect().head
    def lg(x: Double) = math.log(x) / math.log(2)
    assert(r.getAs[Long]("n_rows") == 4L)
    // MI = .5*log2(8/9) + .25*log2(4/3) + .25*log2(4/3)
    val mi = 0.5 * lg(8.0 / 9.0) + 0.5 * lg(4.0 / 3.0)
    assert(math.abs(r.getAs[Double]("mi_bits") - mi) < 5e-6)
    val h = -(0.75 * lg(0.75) + 0.25 * lg(0.25))
    assert(math.abs(r.getAs[Double]("h_a_bits") - h) < 5e-6)
    assert(math.abs(r.getAs[Double]("h_b_bits") - h) < 5e-6)
  }

  test("mutualInformation: independent columns give MI 0; identical give MI = H") {
    // 2x2 balanced independent grid
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("p", "q")
    val ri = graft.ops.TextAnalysis.mutualInformation(ind, "p", "q")
      .collect().head
    assert(math.abs(ri.getAs[Double]("mi_bits")) < 5e-6)
    assert(math.abs(ri.getAs[Double]("h_a_bits") - 1.0) < 5e-6)
    // b determines a exactly: MI = H(a) = H(b) = 1 bit
    val dup = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("p", "q")
    val rd = graft.ops.TextAnalysis.mutualInformation(dup, "p", "q")
      .collect().head
    assert(math.abs(rd.getAs[Double]("mi_bits") - 1.0) < 5e-6)
  }

  // --- isotonicCalibrate ---

  test("isotonicCalibrate: textbook PAV pooling, monotone output, weighted pools") {
    // 4 score buckets at 0.05/0.15/0.25/0.35 with rates 0.0, 1.0, 0.5, 1.0
    // over weights 2,2,4,2: PAV pools buckets 1 and 2 (1.0 > 0.5) into the
    // WEIGHTED rate (2+2)/(2+4) = 2/3, then 0.0 <= 2/3 <= 2/3 <= 1.0 holds
    val rows =
      Seq((0.05, 0L), (0.06, 0L),
        (0.15, 1L), (0.16, 1L),
        (0.25, 1L), (0.26, 1L), (0.27, 0L), (0.28, 0L),
        (0.35, 1L), (0.36, 1L))
    val df = rows.toDF("s", "y")
    val out = graft.ml.MLOps.isotonicCalibrate(df, "s", "y", buckets = 10)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(out(0.05) == 0.0)
    assert(out(0.15) == 0.666667) // micro-rounded pooled 2/3
    assert(out(0.25) == 0.666667)
    assert(out(0.35) == 1.0)
    // output is monotone in the score everywhere
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted)
    // already-monotone input passes through as per-bucket rates
    val mono = Seq((0.05, 0L), (0.15, 1L), (0.16, 0L), (0.25, 1L))
      .toDF("s", "y")
    val m = graft.ml.MLOps.isotonicCalibrate(mono, "s", "y", 10)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(m(0.05) == 0.0 && m(0.15) == 0.5 && m(0.25) == 1.0)
    intercept[Exception] {
      graft.ml.MLOps.isotonicCalibrate(
        Seq((1.5, 0L)).toDF("s", "y"), "s", "y", 10).collect()
    }
    intercept[Exception] {
      graft.ml.MLOps.isotonicCalibrate(
        Seq((0.5, 2L)).toDF("s", "y"), "s", "y", 10).collect()
    }
  }

  // --- olsFit / olsPredict ---

  test("olsFit: exact recovery on noiseless linear data; singular fails loudly") {
    // y = 2*x1 - 3*x2 + 5 over integer grid points (scaleBits=0: exact)
    val rows = for (x1 <- 0L to 4L; x2 <- 0L to 4L)
      yield (Seq(x1.toDouble, x2.toDouble), 2.0 * x1 - 3.0 * x2 + 5.0)
    val df = rows.toDF("v", "y")
    val (beta, b0, r2) = graft.ml.MLOps.olsFit(df, "v", "y", dim = 2,
      scaleBits = 0)
    assert(math.abs(beta(0) - 2.0) < 1e-9 && math.abs(beta(1) + 3.0) < 1e-9)
    assert(math.abs(b0 - 5.0) < 1e-9)
    assert(math.abs(r2 - 1.0) < 1e-12)
    val pred = graft.ml.MLOps.olsPredict(df, "v", "y", 2, 0)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2))
    pred.foreach { case (y, p) => assert(math.abs(y - p) < 1e-9) }
    // collinear features -> loud singularity, never a garbage fit
    val collinear = (1L to 10L).map(i =>
      (Seq(i.toDouble, 2.0 * i), 3.0 * i)).toDF("v", "y")
    val e = intercept[IllegalArgumentException] {
      graft.ml.MLOps.olsFit(collinear, "v", "y", 2, 0)
    }
    assert(e.getMessage.contains("singular"))
  }

  test("olsFit dim 3: GE solution equals the exact-rational Cramer solve on random data") {
    // q239 gates the dim-2 GE path bit-exactly; this property covers the
    // MULTI-PIVOT path (dim 3) against an independent EXACT reference:
    // the centered normal equations A·β = b with A = n·S_xx − S_x·S_xᵀ,
    // b = n·S_xy − S_x·S_y have integer entries at scaleBits = 0, so
    // Cramer's rule in BigInt is an exact oracle (the n² and scale²
    // factors cancel on both sides)
    val rnd = new scala.util.Random(7)
    var checked = 0
    for (trial <- 0 until 8) {
      val rows = (0 until 40).map { _ =>
        val x = Array.fill(3)((rnd.nextInt(21) - 10).toLong)
        val y = 3L * x(0) - 2L * x(1) + x(2) + rnd.nextInt(9) - 4
        (x.map(_.toDouble).toSeq, y.toDouble)
      }
      val n = BigInt(rows.size)
      def s(f: ((Seq[Double], Double)) => Long): BigInt =
        rows.map(r => BigInt(f(r))).sum
      val sx = Array.tabulate(3)(i => s(r => r._1(i).toLong))
      val sy = s(_._2.toLong)
      val sxx = Array.tabulate(3, 3)((i, j) =>
        s(r => r._1(i).toLong * r._1(j).toLong))
      val sxy = Array.tabulate(3)(i => s(r => r._1(i).toLong * r._2.toLong))
      val a = Array.tabulate(3, 3)((i, j) => n * sxx(i)(j) - sx(i) * sx(j))
      val b = Array.tabulate(3)(i => n * sxy(i) - sx(i) * sy)
      def det(m: Array[Array[BigInt]]): BigInt =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      val d = det(a)
      if (d != 0) {
        val exact = (0 until 3).map { i =>
          val ai = Array.tabulate(3, 3)((r, c) => if (c == i) b(r) else a(r)(c))
          BigDecimal(det(ai)) / BigDecimal(d)
        }
        val (beta, _, _) = graft.ml.MLOps.olsFit(
          rows.toDF("v", "y"), "v", "y", dim = 3, scaleBits = 0)
        for (i <- 0 until 3) {
          val e = exact(i).toDouble
          assert(math.abs(beta(i) - e) <= 1e-6 * math.max(1.0, math.abs(e)),
            s"trial $trial beta($i): GE ${beta(i)} vs exact $e")
        }
        checked += 1
      }
    }
    assert(checked >= 6, s"only $checked nonsingular trials")
  }

  test("isotonicCalibrate equals the exact-rational minimax formula on random histograms") {
    // the SAME theorem q241's oracle uses — fit(i) = max_{j<=i} min_{k>=i}
    // mean(y[j..k]) — here as a pure-Scala exact-Long reference, cross-
    // checked over random label patterns rather than one dataset
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 6) {
      val rows = (0 until 60).map { r =>
        val bucket = rnd.nextInt(10)
        (r.toLong, bucket / 10.0 + 0.05, if (rnd.nextInt(100) < bucket * 11) 1 else 0)
      }
      val hist = rows.groupBy(r => (r._2 * 10).toInt).toSeq.sortBy(_._1)
        .map { case (bkt, rs) => (bkt, rs.map(_._3.toLong).sum, rs.size.toLong) }
      val cp = hist.scanLeft(0L)(_ + _._2).tail
      val cn = hist.scanLeft(0L)(_ + _._3).tail
      val fit = hist.indices.map { i =>
        var best: (Long, Long) = null
        for (j <- 0 to i) {
          var mn: (Long, Long) = null
          for (k <- i until hist.size) {
            val num = cp(k) - (if (j == 0) 0L else cp(j - 1))
            val den = cn(k) - (if (j == 0) 0L else cn(j - 1))
            if (mn == null || num * mn._2 < mn._1 * den) mn = (num, den)
          }
          if (best == null || mn._1 * best._2 > best._1 * mn._2) best = mn
        }
        // the engine's exact rounding sequence: micro = round(1e6·p/n),
        // calibrated = micro.toDouble / 1e6
        hist(i)._1 -> (math.round(1e6 * best._1 / best._2).toDouble / 1e6)
      }.toMap
      val out = graft.ml.MLOps.isotonicCalibrate(
          rows.toDF("id", "s", "y"), "s", "y", buckets = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      rows.foreach { case (id, sc, _) =>
        val expect = fit((sc * 10).toInt)
        assert(out(id) == expect, s"trial $trial id $id: ${out(id)} vs $expect")
      }
    }
  }

  // --- jacobiEigen / pcaProject ---

  test("jacobiEigen: hand 2x2 eigensystem") {
    val (vals, vecs) = graft.ops.Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.zip(vecs).sortBy(-_._1)
    assert(math.abs(sorted(0)._1 - 3.0) < 1e-10)
    assert(math.abs(sorted(1)._1 - 1.0) < 1e-10)
    // leading eigenvector is ±[1,1]/sqrt(2)
    val w = sorted(0)._2
    assert(math.abs(math.abs(w(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(w(0) - w(1)) < 1e-10)
  }

  test("jacobiEigen: random symmetric matrices — residual, orthonormality, trace") {
    // q240 gates the single-rotation 2x2 path bit-exactly; this property
    // covers the MULTI-SWEEP path (d up to 5) structurally: A·v = λ·v,
    // the eigenbasis is orthonormal, and Σλ preserves the trace
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 8; d <- 2 to 5) {
      val m = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val x = rnd.nextDouble() * 4 - 2
        m(i)(j) = x; m(j)(i) = x
      }
      val (vals, vecs) = graft.ops.Similarity.jacobiEigen(m)
      for (k <- 0 until d; i <- 0 until d) {
        val av = (0 until d).map(j => m(i)(j) * vecs(k)(j)).sum
        assert(math.abs(av - vals(k) * vecs(k)(i)) < 1e-9,
          s"trial $trial d=$d: eigen residual at ($k,$i)")
      }
      for (a <- 0 until d; b <- a until d) {
        val dot = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
        assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
          s"trial $trial d=$d: basis not orthonormal at ($a,$b)")
      }
      assert(math.abs(vals.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-9,
        s"trial $trial d=$d: trace not preserved")
    }
  }

  test("jacobiEigen: tolerances are scale-relative — large-entry matrices converge") {
    // ADVICE r12: with an ABSOLUTE 1e-14 rotation gate, a 2x2 with entries
    // >>1 can leave a one-rotation float residual above the gate and
    // trigger a bit-diverging second rotation (or a convergence failure at
    // extreme scales). The gates are now relative to max|a_ij|: the same
    // matrix at scale 1 and at scale 1e8 must produce the SAME rotation
    // sequence, i.e. eigensystems that are exact scalar multiples.
    // POWER-OF-TWO scales: ×2^k is exact on every float, so the scaled
    // run's theta/c/s chain is the unit run's with shifted exponents and
    // the eigenvectors must match BIT-FOR-BIT — any divergence can only
    // come from a threshold that failed to scale. base(0)(0) ≥ 1 keeps
    // max|a_ij| ≥ 1 so the tolerance floor (max(1, ·)) stays inactive on
    // the unit-scale side and the two thresholds stay exactly proportional.
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 4; d <- 2 to 4;
         scale <- Seq(math.pow(2, 20), math.pow(2, 40), math.pow(2, 60))) {
      val base = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val x = rnd.nextDouble() * 4 - 2
        base(i)(j) = x; base(j)(i) = x
      }
      base(0)(0) = math.abs(base(0)(0)) + 2.0
      val m = base.map(_.map(_ * scale))
      val (vals, vecs) = graft.ops.Similarity.jacobiEigen(m) // must not throw
      for (k <- 0 until d; i <- 0 until d) {
        val av = (0 until d).map(j => m(i)(j) * vecs(k)(j)).sum
        assert(math.abs(av - vals(k) * vecs(k)(i)) < 1e-9 * scale,
          s"trial $trial d=$d scale=$scale: eigen residual at ($k,$i)")
      }
      // scale-equivariance of the ROTATION SEQUENCE: the scaled matrix's
      // eigenvectors must match the unit-scale run's bit-for-bit (theta =
      // (aqq-app)/(2apq) is scale-invariant, so identical rotations fire
      // iff the thresholds scale with the input — the fix under test)
      val (vals1, vecs1) = graft.ops.Similarity.jacobiEigen(base)
      for (k <- 0 until d; i <- 0 until d)
        assert(vecs(k)(i) == vecs1(k)(i),
          s"trial $trial d=$d scale=$scale: rotation sequence diverged at ($k,$i)")
      assert(vals.zip(vals1).forall { case (s, u) => s == u * scale },
        s"trial $trial d=$d scale=$scale: eigenvalues not exact 2^k multiples")
    }
  }

  test("pcaProject: perfectly correlated 2D collapses onto one axis") {
    val df = (1L to 8L).map(t => (t, Seq(t.toDouble, t.toDouble)))
      .toDF("id", "v")
    val out = graft.ops.Similarity.pcaProject(df, "v", "id", dim = 2,
        nComponents = 2, scaleBits = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // component 1 = [1,1]/sqrt(2) (sign-fixed positive):
    // score(t) = sqrt(2) * (t - 4.5); component 2 carries ~nothing
    for (t <- 1L to 8L) {
      assert(math.abs(out((t, 1)) - math.sqrt(2.0) * (t - 4.5)) < 1e-4,
        s"t=$t got ${out((t, 1))}")
      assert(math.abs(out((t, 2))) < 1e-4)
    }
    // variance ordering: comp-1 scores dominate comp-2
    def variance(c: Int) = {
      val xs = (1L to 8L).map(t => out((t, c)))
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    assert(variance(1) > 100 * variance(2))
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.pcaProject(df, "v", "id", 2, 3)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.pcaProject(df.limit(1), "v", "id", 2, 1)
    }
  }
}
