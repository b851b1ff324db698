package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot loops of the dedup/similarity
  * operators. The Column-function versions (higher-order `transform` /
  * `aggregate`) are interpreted per-element with boxing and get no
  * common-subexpression elimination; at 100 TB these per-row kernels dominate,
  * so each is a single tight JVM loop over the unsafe array data instead
  * (SURVEY §7.3 — "custom Expression beats Scala UDF beats anything else").
  * CodegenFallback is fine here: one virtual call per ROW, with the per-element
  * work in compiled Scala, which is what whole-stage codegen would buy anyway.
  */
object Native {

  /** SplitMix64 finalizer — the standard 64-bit mixer (public domain
    * constant set; same recurrence as java.util.SplittableRandom). */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  def simhash64(hashes: Column): Column = toColumn(SimHash64(toExpr(hashes)))
  def minhashSig(hashes: Column, numHashes: Int): Column =
    toColumn(MinHashSig(toExpr(hashes), numHashes))
  def jaccardSortedLongs(a: Column, b: Column): Column =
    toColumn(JaccardSortedLongs(toExpr(a), toExpr(b)))
  def dotProduct(a: Column, b: Column): Column = toColumn(VecDot(toExpr(a), toExpr(b)))
  def cosineSim(a: Column, b: Column): Column = toColumn(VecCosine(toExpr(a), toExpr(b)))
  def wordShingleHashes(text: Column, k: Int, distinctSorted: Boolean): Column =
    toColumn(WordShingleHashes(toExpr(text), k, distinctSorted))
  def portableShingleHashes(text: Column, k: Int, p: Long): Column =
    toColumn(PortableShingleHashes(toExpr(text), k, p))
  def wordShingleStrings(text: Column, k: Int): Column =
    toColumn(WordShingleStrings(toExpr(text), k))
  def portableMinHashSig(baseHashes: Column, coeffs: Seq[(Long, Long)], p: Long): Column =
    toColumn(PortableMinHashSig(toExpr(baseHashes), coeffs.toIndexedSeq, p))
  def portableSimHash(baseHashes: Column, bits: Int): Column =
    toColumn(PortableSimHash(toExpr(baseHashes), bits))
  def nearestCentroids(vec: Column, ids: Seq[Int], centroids: Seq[Seq[Double]], n: Int): Column =
    toColumn(NearestCentroids(toExpr(vec), ids.toIndexedSeq,
      centroids.map(_.toIndexedSeq).toIndexedSeq, n))
  def int8Codes(vec: Column): Column = toColumn(Int8Codes(toExpr(vec)))
  def cmsSlots(value: Column, depth: Int, lgWidth: Int): Column =
    toColumn(CmsSlots(toExpr(value), depth, lgWidth))
  /** [[CovMoments]] as an aggregate Column over a pre-quantized
    * array<long> vector column of exactly `dim` elements. */
  def covMoments(qvec: Column, dim: Int): Column =
    toColumn(CovMoments(toExpr(qvec), dim).toAggregateExpression())

  /** Register the kernels in the session's FunctionRegistry so `spark.sql`
    * (and therefore ContractStore.executeSql) can call them:
    * graft_simhash64(hashes), graft_minhash(hashes, n), graft_jaccard(a, b),
    * graft_dot(a, b), graft_cosine(a, b), graft_shingles(text, k, sorted). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => MinHashSig(es.head, es(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard", es => JaccardSortedLongs(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot", es => VecDot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine", es => VecCosine(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      es => WordShingleHashes(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Boolean]), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_strings",
      es => WordShingleStrings(es.head,
        es(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_portable_shingles",
      es => PortableShingleHashes(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].longValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_int8_codes",
      es => Int8Codes(es.head), "built-in")
  }
}

/** Word k-gram shingle hashes in one pass: lowercase → whitespace-split →
  * per-word 64-bit hash → k-gram combine via mix64 chaining. Replaces the
  * interpreted `split/transform/slice/concat_ws` pipeline (which allocates a
  * UTF8 string per shingle) with long arithmetic. With `distinctSorted` the
  * output is the sorted distinct set — the exact input format of
  * [[JaccardSortedLongs]] and of inverted-index joins. */
case class WordShingleHashes(child: Expression, k: Int, distinctSorted: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val words = s.split("\\s+")
    val n = words.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = words(i)
      var h = 1125899906842597L
      var j = 0
      while (j < w.length) { h = 31 * h + w.charAt(j); j += 1 }
      wh(i) = Native.mix64(h)
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var c = wh(i)
      var j = 1
      while (j < k) { c = Native.mix64(c ^ (wh(i + j) * 0x9e3779b97f4a7c15L)); j += 1 }
      out(i) = c
      i += 1
    }
    if (!distinctSorted) new GenericArrayData(out)
    else {
      java.util.Arrays.sort(out)
      var m = 0
      i = 0
      while (i < out.length) {
        if (m == 0 || out(m - 1) != out(i)) { out(m) = out(i); m += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, m))
    }
  }
  override protected def withNewChildInternal(c: Expression): WordShingleHashes = copy(child = c)
}

/** 64-bit SimHash from an array of shingle hashes: bit i of the result is set
  * iff more element-hashes have bit i set than cleared. One pass per row. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** MinHash signature from an array of base shingle hashes: signature(i) =
  * min over shingles of mix64(h ^ seed_i), i.e. `numHashes` universal hash
  * functions derived from one base hash — one pass per row instead of
  * numHashes interpreted traversals. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => Native.mix64(0x5851f42d4c957f2dL * (i + 1)))
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = Native.mix64(h ^ seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** PORTABLE word k-gram shingle hashes in one pass: lowercase → whitespace
  * split → k-gram string → (first 14 hex chars of md5) mod p. Bit-identical
  * to the Column pipeline `transform(shingles(text,k), s →
  * pmod(conv(substring(md5(s),1,14),16,10) % p))` and to DuckDB's
  * `CAST(concat('0x', substr(md5(s),1,14)) AS BIGINT) % p`, but ONE md5 pass
  * per shingle — the interpreted HOF form is re-evaluated per reference
  * after projection collapse (16 minhash transforms × 4 bands recomputed the
  * md5 array ~64× per row; found as a 30s q67 at sf0.1). */
case class PortableShingleHashes(child: Expression, k: Int, p: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val words = s.split("\\s+")
    val n = words.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val md = PortableShingleHashes.digest.get()
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 14 hex chars = first 7 bytes = 56 bits (always positive)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = h % p
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): PortableShingleHashes =
    copy(child = c)
}

object PortableShingleHashes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Word k-gram shingle STRINGS in one pass (lowercase → whitespace split →
  * join k words with single spaces) — for operators whose OUTPUT is the gram
  * text itself (LM count tables), where hashing would lose the string. Same
  * normalization as [[WordShingleHashes]]; one StringBuilder per gram
  * replaces the interpreted `transform(sequence)/slice/concat_ws` pipeline
  * (~1 ms/doc interpreted → ~1 µs/doc here; found as a 5 s explode over 5k
  * docs). */
case class WordShingleStrings(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = s.split("\\s+")
    val n = words.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordShingleStrings =
    copy(child = c)
}

/** All `depth` portable-CMS slots of one value in ONE md5 pass: slot d =
  * low `lgWidth` bits of the d-th 32-bit big-endian chunk of md5(value) —
  * bit-identical to the Column form
  * `conv(substr(md5(v), d*8+1, 8), 16, 10) & (2^lgWidth - 1)`
  * ([[graft.ops.Aggregations.cmsSlot]]) and to the DuckDB oracle's
  * restatement, but one digest + integer masks instead of `depth`
  * hex-string substr/conv evaluations per row. Built for the STREAMED
  * sketch (q237), whose one-stateful-agg constraint forbids the batch
  * op's pre-aggregation: every raw occurrence fans to depth coordinates
  * inside the stream, so this per-row cost is the whole gate's compute
  * at ×100 state density (VERDICT r14 #4). Output index = depth. */
case class CmsSlots(child: Expression, depth: Int, lgWidth: Int)
    extends UnaryExpression with CodegenFallback {
  require(depth >= 1 && depth <= 4, "1 <= depth <= 4 (32 md5 bits per row)")
  require(lgWidth >= 4 && lgWidth <= 20, "4 <= lgWidth <= 20")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val md = CmsSlots.digest.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    val mask = (1L << lgWidth) - 1
    val out = new Array[Long](depth)
    var i = 0
    while (i < depth) {
      val x = ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
        ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
      out(i) = x & mask
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CmsSlots =
    copy(child = c)
}

object CmsSlots {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** PORTABLE minhash signature over precomputed base hashes: sig_i = min over
  * shingles of (a_i·h + b_i) mod p, all coefficients in one pass (the
  * arithmetic twin of [[MinHashSig]] for the cross-engine hash family). */
case class PortableMinHashSig(child: Expression, coeffs: IndexedSeq[(Long, Long)], p: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = coeffs.length
    val mins = Array.fill(m)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < m) {
        val v = (coeffs(i)._1 * h + coeffs(i)._2) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): PortableMinHashSig =
    copy(child = c)
}

/** PORTABLE SimHash over md5-derived base hashes: bit i (i < `bits`) of the
  * signature is set iff Σ over hashes of (2·bit_i(h) − 1) > 0 — plain
  * integer arithmetic on the [[PortableShingleHashes]] values, restatable
  * in any engine as `(h // 2^i) % 2` votes (SparkEntry q81's oracle). */
case class PortableSimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): PortableSimHash = copy(child = c)
}

/** Jaccard similarity of two SORTED distinct long arrays via a merge scan —
  * O(|a|+|b|), no boxing, no hash sets. */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Top-n centroid ids by cosine for a vector column against a PLAN-TIME
  * centroid matrix (k·d doubles baked into the expression). One JVM loop per
  * row replaces the crossJoin(centroids) + row_number() shape, whose
  * intermediate is rows×k through a shuffle — this is a narrow map, no
  * shuffle at all. Ties: higher cosine wins, then the earlier id in `ids`
  * order (callers pass ids ascending → deterministic). Used by the IVF
  * assign/probe steps and each Lloyd round (ops.Similarity).
  * IndexedSeq (not Array) parameters so case-class equality/canonicalization
  * compares by value. */
case class NearestCentroids(child: Expression, ids: IndexedSeq[Int],
    centroids: IndexedSeq[IndexedSeq[Double]], n: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val mat: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val norms: Array[Double] = mat.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val vec = new Array[Double](dim)
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      vec(i) = x; na += x * x; i += 1
    }
    val nrm = math.sqrt(na)
    val k = mat.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = mat(c)
      val m = math.min(dim, cv.length)
      var dot = 0.0; var j = 0
      while (j < m) { dot += vec(j) * cv(j); j += 1 }
      val denom = nrm * norms(c)
      sims(c) = if (denom == 0.0) 0.0 else dot / denom
      c += 1
    }
    val take = math.min(n, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var o = 0
    while (o < take) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && sims(c2) > bestSim) { best = c2; bestSim = sims(c2) }
        c2 += 1
      }
      used(best) = true; out(o) = ids(best); o += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Symmetric int8 quantization codes for an embedding, as a ","-joined
  * string: code_i = floor(x_i·127/maxabs + 0.5) (round-half-up, the floor
  * form both JVMs and C engines agree on bit-for-bit), all-zero when the
  * vector is all-zero. One pass computes maxabs, a second emits codes — a
  * single narrow-map kernel instead of an interpreted `transform` whose
  * maxabs subexpression is re-evaluated per ELEMENT after CollapseProject
  * inlines it (the round-2 minhash lesson). The matching scale is
  * maxabs/127, computed by the caller as a Column (one reference — safe
  * interpreted). */
case class Int8Codes(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > maxabs) maxabs = x
      i += 1
    }
    val sb = new java.lang.StringBuilder(n * 4)
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val code = if (maxabs == 0.0) 0L else math.floor(x * 127 / maxabs + 0.5).toLong
      sb.append(code)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): Int8Codes = copy(child = c)
}

private[functions] trait VecBinary extends BinaryExpression with CodegenFallback {
  /** read element i as double regardless of float/double element type */
  @inline protected final def elem(arr: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
  protected final def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

private[functions] object VecBinary {
  /** codegen element getter matching [[VecBinary.elem]] */
  def getter(arr: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"$arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot(a, b): sequential left-to-right accumulation in double — bit-identical
  * to the Column-function formulation it replaces (and to engines that
  * accumulate sequentially). Real `doGenCode` (not CodegenFallback): the
  * loop inlines into the whole-stage-codegen method instead of bouncing
  * through an interpreted eval call per joined row — dot/cosine sit in the
  * innermost loop of every pairwise-similarity join. */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  private lazy val lf = isFloatArr(left)
  private lazy val rf = isFloatArr(right)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += elem(a, lf, i) * elem(b, rf, i); i += 1 }
    java.lang.Double.valueOf(acc)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) ${VecBinary.getter(a, lf, i)})
            * ((double) ${VecBinary.getter(b, rf, i)});
        }
        ${ev.value} = $acc;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (sqrt(norm_a) * sqrt(norm_b)), each sum accumulated
  * sequentially — matches the previous zip_with/aggregate semantics exactly.
  * Codegen'd like [[VecDot]] (identical loop structure and accumulation
  * order, so interpreted and generated paths are bit-identical — the oracle
  * gates would catch any drift). */
case class VecCosine(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  private lazy val lf = isFloatArr(left)
  private lazy val rf = isFloatArr(right)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += elem(a, lf, i) * elem(b, rf, i); i += 1 }
    var na = 0.0; i = 0
    while (i < n) { val x = elem(a, lf, i); na += x * x; i += 1 }
    var nb = 0.0; i = 0
    while (i < n) { val x = elem(b, rf, i); nb += x * x; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += ((double) ${VecBinary.getter(a, lf, i)})
            * ((double) ${VecBinary.getter(b, rf, i)});
        }
        double $na = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) ${VecBinary.getter(a, lf, i)};
          $na += $x * $x;
        }
        double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) ${VecBinary.getter(b, rf, i)};
          $nb += $x * $x;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** One-pass GROUPED COVARIANCE MOMENTS as a custom TypedImperativeAggregate:
  * per group, count n, the d element sums Σq_i, and the d(d+1)/2
  * upper-triangle pair sums Σ q_i·q_j over a PRE-QUANTIZED integer vector
  * column — one flat Array[Long] buffer per group per task, merged
  * elementwise across partitions (map-side combine of WHOLE matrices).
  * This is the 100 TB-correct shape for a covariance/moment matrix: the
  * alternative — exploding every row into d(d+1)/2 (i, j) pairs and
  * re-aggregating — multiplies the shuffle by the pair count (2080× at
  * d = 64), where this kernel shuffles ONE buffer row per (group,
  * partition). All sums are exact integers over the quantized inputs, so
  * the result is engine-reproducible (the oracle restates the explode
  * form — same sums, wildly different plan); Math.addExact/multiplyExact
  * throw loudly on overflow instead of wrapping (~2³¹ rows per group at
  * 2²⁰-quantized unit-scale inputs — widen the buffer to paired
  * hi/lo longs past that, don't widen silently). */
case class CovMoments(child: Expression, dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  private val nPairs = dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + dim + nPairs)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"CovMoments: expected $dim elements, got ${arr.numElements()}")
    buf(0) = Math.addExact(buf(0), 1L)
    var i = 0
    while (i < dim) {
      // a NULL element would read as unsafe garbage — fail loudly (a
      // whole-NULL vector is skipped above; a holey one is corrupt input)
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"CovMoments: NULL element at position $i")
      buf(1 + i) = Math.addExact(buf(1 + i), arr.getLong(i)); i += 1
    }
    var idx = 1 + dim
    i = 0
    while (i < dim) {
      val qi = arr.getLong(i)
      var j = i
      while (j < dim) {
        buf(idx) = Math.addExact(buf(idx), Math.multiplyExact(qi, arr.getLong(j)))
        idx += 1; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CovMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): CovMoments = copy(child = c)
  override def prettyName: String = "graft_cov_moments"
}
