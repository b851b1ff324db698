package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property-based checks: the native kernels must agree with their
  * Column-function formulations and hold structural invariants on random
  * inputs — not just on the fixtures the example tests happen to use.
  */
class KernelPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** deterministic sampling in place of scalatest-plus forAll (offline deps
    * ship scalacheck but not the scalatest bridge) */
  private def samples[T](g: Gen[T], n: Int = 30): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(i.toLong)))
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga).zip(samples(gb)).foreach { case (a, b) => f(a, b) }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit = samples(ga).foreach(f)
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val longSetGen = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    .map(_.distinct.sorted)

  test("portable kernels equal their Column-pipeline definitions") {
    import org.apache.spark.sql.functions._
    val p = graft.ops.Dedup.PortableP
    forAll(textGen) { text: String =>
      val df = Seq(Tuple1(text)).toDF("t")
      // base hashes: kernel vs interpreted md5 pipeline (the cross-engine
      // contract the DuckDB oracles restate)
      val viaKernel = df.select(
        graft.functions.Native.portableShingleHashes(col("t"), 3, p)).head().getSeq[Long](0)
      val viaColumns = df.select(
        transform(graft.ops.Dedup.shingles(col("t"), 3),
          s => pmod(conv(substring(md5(s), 1, 14), 16, 10).cast("long"), lit(p))))
        .head().getSeq[Long](0)
      assert(viaKernel == viaColumns, s"base hashes diverge for: '$text'")
      // minhash signature: kernel vs per-coefficient array_min pipeline
      if (viaKernel.nonEmpty) {
        val sigKernel = df.select(graft.ops.Dedup.minhashSignaturePortable(
          graft.functions.Native.portableShingleHashes(col("t"), 3, p))).head().getSeq[Long](0)
        val sigColumns = graft.ops.Dedup.portableCoeffs.map { case (a, b) =>
          viaKernel.map(h => java.lang.Math.floorMod(a * h + b, p)).min
        }
        assert(sigKernel == sigColumns, s"minhash sig diverges for: '$text'")
      }
      // gram strings: kernel vs shingles()
      val gsKernel = df.select(
        graft.functions.Native.wordShingleStrings(col("t"), 2)).head().getSeq[String](0)
      val gsColumns = df.select(graft.ops.Dedup.shingles(col("t"), 2)).head().getSeq[String](0)
      assert(gsKernel == gsColumns, s"gram strings diverge for: '$text'")
    }
  }

  test("CmsSlots kernel equals the md5-substr-conv Column formula (q237's " +
      "single-pass coordinate fan, VERDICT r14 #4)") {
    forAll(textGen) { text: String =>
      for (lgWidth <- Seq(4, 10, 20); depth = 4) {
        val df = Seq(Tuple1(text)).toDF("v")
        val viaKernel = df.select(
          graft.functions.Native.cmsSlots(col("v"), depth, lgWidth))
          .head().getSeq[Long](0)
        val viaColumns = (0 until depth).map { d =>
          df.select(graft.ops.Aggregations.cmsSlot(md5(col("v")), lit(d), lgWidth))
            .head().getLong(0)
        }
        assert(viaKernel == viaColumns,
          s"CMS slots diverge for '$text' at lgWidth=$lgWidth")
      }
    }
  }

  test("NearestCentroids returns ids in exact cosine-desc order vs local reference") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    val matGen = Gen.listOfN(6, vecGen)
    forAll(matGen, vecGen) { (mat: List[List[Double]], v: List[Double]) =>
      val ids = mat.indices.map(_ + 10)
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
        if (d == 0.0) 0.0 else dot / d
      }
      // stable sort: cosine desc, ties keep ids order — mirrors the kernel
      val expected = mat.zip(ids).sortBy { case (c, _) => -cos(v, c) }.map(_._2).take(3)
      val got = Seq(Tuple1(v)).toDF("v")
        .select(graft.functions.Native.nearestCentroids(col("v"), ids, mat.map(_.toSeq), 3))
        .head().getSeq[Int](0)
      assert(got == expected)
    }
  }

  test("NearestCentroids on float arrays matches double arrays") {
    val mat = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.5))
    val ids = Seq(1, 2, 3)
    val f = Seq(Tuple1(Seq(0.5f, 0.25f))).toDF("v")
      .select(graft.functions.Native.nearestCentroids(col("v"), ids, mat, 3)).head().getSeq[Int](0)
    val d = Seq(Tuple1(Seq(0.5, 0.25))).toDF("v")
      .select(graft.functions.Native.nearestCentroids(col("v"), ids, mat, 3)).head().getSeq[Int](0)
    assert(f == d && f == Seq(1, 2, 3))
  }

  test("JaccardSortedLongs equals the set-expression Jaccard on random sets") {
    forAll(longSetGen, longSetGen) { (a: List[Long], b: List[Long]) =>
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(graft.functions.Native.jaccardSortedLongs(col("a"), col("b"))).head().getDouble(0)
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val union = a.toSet.union(b.toSet).size.toDouble
      val expected = if (union == 0) 0.0 else inter / union
      assert(native == expected)
    }
  }

  test("VecDot/VecCosine equal the aggregate/zip_with formulation") {
    val vecGen = Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100, 100).map(_.toDouble / 10)))
    forAll(vecGen, vecGen) { (a: List[Double], b0: List[Double]) =>
      val b = b0.take(a.size).padTo(a.size, 0.0)
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(
        graft.functions.Native.dotProduct(col("a"), col("b")),
        graft.functions.Native.cosineSim(col("a"), col("b"))).head()
      val hof = df.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x),
        sqrt(aggregate(col("a"), lit(0.0), (s, x) => s + x * x)),
        sqrt(aggregate(col("b"), lit(0.0), (s, x) => s + x * x))).head()
      assert(native.getDouble(0) == hof.getDouble(0))
      val denom = hof.getDouble(1) * hof.getDouble(2)
      val expectedCos = if (denom == 0.0) 0.0 else hof.getDouble(0) / denom
      assert(native.getDouble(1) == expectedCos)
    }
  }

  test("WordShingleHashes: count = max(0, words-k+1); sorted-distinct variant is sorted and unique") {
    forAll(textGen, Gen.chooseNum(1, 4)) { (text: String, k: Int) =>
      val df = Seq(Tuple1(text)).toDF("t")
      val all = df.select(graft.ops.Dedup.hashedShingles(col("t"), k)).head().getSeq[Long](0)
      val set = df.select(graft.ops.Dedup.hashedShingleSet(col("t"), k)).head().getSeq[Long](0)
      val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val expected = if (text.trim.isEmpty || words.length < k) 0 else words.length - k + 1
      assert(all.size == expected)
      assert(set == set.distinct.sorted)
      assert(set.toSet == all.toSet)
    }
  }

  test("MinHashSig and SimHash64 are permutation-invariant (set semantics of minima/votes)") {
    forAll(Gen.listOfN(25, Gen.chooseNum(Long.MinValue, Long.MaxValue))) { (hs: List[Long]) =>
      whenever(hs.nonEmpty) {
        val shuffled = scala.util.Random.shuffle(hs)
        val df = Seq((hs, shuffled)).toDF("a", "b")
        val r = df.select(
          graft.functions.Native.minhashSig(col("a"), 16),
          graft.functions.Native.minhashSig(col("b"), 16),
          graft.functions.Native.simhash64(col("a")),
          graft.functions.Native.simhash64(col("b"))).head()
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
        assert(r.getLong(2) == r.getLong(3))
      }
    }
  }

  test("minhash similarity estimates Jaccard on overlapping sets") {
    // structural sanity: identical sets → identical signatures; disjoint sets
    // rarely collide on many components
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val disjoint = (100 to 150).map(i => s"tok$i").mkString(" ")
    val df = Seq((base, base, disjoint)).toDF("a", "b", "c")
      .select(
        graft.functions.Native.minhashSig(graft.ops.Dedup.hashedShingles(col("a"), 2), 32).as("sa"),
        graft.functions.Native.minhashSig(graft.ops.Dedup.hashedShingles(col("b"), 2), 32).as("sb"),
        graft.functions.Native.minhashSig(graft.ops.Dedup.hashedShingles(col("c"), 2), 32).as("sc"))
    val r = df.head()
    val (sa, sb, sc) = (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
    assert(sa == sb)
    val collisions = sa.zip(sc).count { case (x, y) => x == y }
    assert(collisions <= 4, s"disjoint sets collide on $collisions/32 components")
  }
}

/** Brute-force equivalence for the substring/segment dedup trio on random
  * small-vocabulary corpora (tiny vocab forces real cross-doc collisions).
  * The brute force is a direct driver-side restatement of the definitions;
  * the operators must match it exactly on every sampled corpus. */
class SubstringDedupPropertiesSpec extends AnyFunSuite {
  import graft.ops.Dedup
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(1000L + i)))
  }

  private val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
  private val docGen = Gen.chooseNum(0, 18).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val corpusGen = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, docGen))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def toks(t: String): Array[String] =
    t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  test("duplicateSpans equals brute force on random corpora") {
    val k = 3
    samples(corpusGen, 15).foreach { corpus =>
      val byDoc = corpus.map { case (id, t) =>
        id -> toks(t).sliding(k).filter(_.length == k).map(_.mkString(" ")).toArray
      }.toMap
      val gramDocs = byDoc.toSeq.flatMap { case (id, gs) => gs.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expected = byDoc.toSeq.flatMap { case (id, gs) =>
        val qual = gs.zipWithIndex.collect { case (g, i) if gramDocs(g) >= 2 => i + 1 }
        // merge consecutive positions into maximal runs
        qual.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p.toLong) :: rest
          case (acc, p) => (p.toLong, p.toLong) :: acc
        }.map { case (s, e) => (id, s, e + k - 1, e + k - 1 - s + 1) }
      }.toSet
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, "text", "doc_id", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"corpus: $corpus")
    }
  }

  test("segmentDedup equals brute force on random corpora") {
    val sw = 2
    samples(corpusGen, 15).foreach { corpus =>
      val segsByDoc = corpus.map { case (id, t) =>
        id -> toks(t).grouped(sw).map(_.mkString(" ")).toArray
      }
      val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Int)]
      segsByDoc.sortBy(_._1).foreach { case (id, segs) =>
        segs.zipWithIndex.foreach { case (s, i) =>
          if (!firstOwner.contains(s)) firstOwner(s) = (id, i)
        }
      }
      val expected = segsByDoc.filter(_._2.nonEmpty).map { case (id, segs) =>
        val kept = segs.zipWithIndex.filter { case (s, i) => firstOwner(s) == ((id, i)) }
        (id, kept.map(_._1).mkString(" "), segs.length.toLong,
          (segs.length - kept.length).toLong)
      }.toSet
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.segmentDedup(df, "text", "doc_id", segWords = sw)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"corpus: $corpus")
    }
  }

  test("crossDocDupFraction equals brute force on random corpora") {
    val k = 2
    samples(corpusGen, 15).foreach { corpus =>
      val byDoc = corpus.map { case (id, t) =>
        id -> toks(t).sliding(k).filter(_.length == k).map(_.mkString(" ")).toArray
      }
      val gramDocs = byDoc.flatMap { case (id, gs) => gs.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expected = byDoc.map { case (id, gs) =>
        val nd = gs.count(g => gramDocs(g) >= 2)
        (id, gs.length.toLong,
          if (gs.isEmpty) 0.0 else nd.toDouble / gs.length)
      }.toSet
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.crossDocDupFraction(df, "text", "doc_id", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"corpus: $corpus")
    }
  }
}

/** Structural properties of the round-8 dedup additions on random inputs:
  * the incremental form must equal the filtered full form on ANY corpus
  * and split, and quality canonicalization must pick exactly the argmax
  * doc of every component — not just on the planted fixtures. */
class IncrementalDedupPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(i.toLong + 1000)))
  }

  // corpora with real near-dup structure: docs are noisy slices of two
  // base word sequences, so band collisions and verified pairs both occur
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(4, 8)
    picks <- Gen.listOfN(n, for {
      base <- Gen.oneOf(0, 1)
      drop <- Gen.chooseNum(0, 3)
      extra <- Gen.chooseNum(0, 2)
    } yield (base, drop, extra))
  } yield picks.zipWithIndex.map { case ((base, drop, extra), i) =>
    val words = (1 to 30).map(w => if (base == 0) s"tok$w" else s"w$w")
    val text = (words.dropRight(drop) ++ (1 to extra).map(e => s"x${i}_$e")).mkString(" ")
    (i + 1).toLong -> text
  }

  test("incremental near-dup == full pair set filtered to new-touching, any split") {
    samples(corpusGen.flatMap(c => Gen.chooseNum(1, c.size - 1).map(c -> _)), 8)
      .foreach { case (docs, splitAt) =>
        val df = docs.toDF("doc_id", "text")
        val cut = splitAt.toLong
        val inc = graft.ops.Dedup.nearDuplicatesAgainstPortable(
            df.filter(col("doc_id") <= cut), df.filter(col("doc_id") > cut),
            "text", "doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val full = graft.ops.Dedup.nearDuplicatesPortable(df, "text", "doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val expected = full.filter { case (a, b, _) => a > cut || b > cut }
        assert(inc == expected, s"split=$cut docs=${docs.map(_._1)}")
      }
  }

  test("canonicalizeBy keeps exactly the argmax-score doc of every component") {
    val caseGen = for {
      n <- Gen.chooseNum(3, 9)
      edges <- Gen.listOf(Gen.zip(Gen.chooseNum(1, n), Gen.chooseNum(1, n)))
      scores <- Gen.listOfN(n, Gen.chooseNum(0L, 5L)) // small range forces ties
    } yield (n, edges.collect { case (a, b) if a < b => (a.toLong, b.toLong) }.distinct, scores)
    samples(caseGen, 10).foreach { case (n, edges, scores) =>
      val docs = (1 to n).map(i => i.toLong -> scores(i - 1)).toDF("doc_id", "s")
      val pairs = edges.toDF("id_a", "id_b")
      val kept = graft.ops.Dedup.canonicalizeBy(docs, pairs, "doc_id", col("s"))
        .collect().map(_.getLong(0)).toSet
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map((1 to n).map(i => i.toLong -> i.toLong): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expected = (1 to n).map(_.toLong).groupBy(find)
        .values.map(c => c.maxBy(id => (scores(id.toInt - 1), -id))).toSet
      assert(kept == expected, s"n=$n edges=$edges scores=$scores")
    }
  }
}

/** Metric / reconstruction properties of the round-8 operators. */
class Round8PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(100L + i)))
  }

  test("distributionDistance is a metric: bounds and triangle inequality") {
    val vocab = Vector("ka", "kb", "kc", "kd")
    val sliceGen = Gen.listOfN(20, Gen.oneOf(vocab))
    samples(Gen.listOfN(3, sliceGen), 8).foreach { slices =>
      val docs = slices.zipWithIndex
        .map { case (ws, i) => (s"s$i", ws.mkString(" ")) }
        .toDF("source", "text")
      val tv = graft.ops.TextAnalysis.distributionDistance(docs, "text", "source")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
      def d(a: Int, b: Int) =
        if (a == b) 0.0 else tv((s"s${math.min(a, b)}", s"s${math.max(a, b)}"))
      for (i <- 0 to 2; j <- 0 to 2 if i < j) {
        assert(d(i, j) >= 0.0 && d(i, j) <= 1.0, s"bounds: ${d(i, j)}")
        val k = 3 - i - j // the third slice
        assert(d(i, j) <= d(i, k) + d(k, j) + 1e-12,
          s"triangle: d($i,$j)=${d(i, j)} > d($i,$k)+d($k,$j)")
      }
    }
  }

  test("BPE encode reconstructs the corpus under any learned merge table") {
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    samples(Gen.listOfN(10, wordGen), 6).foreach { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("id", "text")
      val merges = graft.ops.Bpe.train(docs, "text", maxMerges = 5)
      val toks = graft.ops.Bpe.encode(docs, "text", "id", merges)
        .collect().head.getSeq[String](1)
      assert(toks.mkString == words.mkString, s"corpus $words merges $merges")
    }
  }
}
