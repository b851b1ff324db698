package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines. All
  * variants are pure DataFrame plans: hash-based exact dedup, MinHash+LSH,
  * SimHash, n-gram Jaccard verification, and embedding-cosine near-dup.
  *
  * Scale design: every algorithm reduces to groupBy/join on a *bucket* key
  * (band hash, simhash band, LSH bucket), so candidate generation is a single
  * shuffle on bucket ids and never a cross join; pair verification only runs
  * within buckets. That is the standard web-scale dedup shape (one shuffle
  * per band, candidate set ≪ n²).
  */
object Dedup {

  /** Exact dedup on a normalized text hash. Returns the input with
    * `is_duplicate` (true for every row after the first in its group) and the
    * canonical (minimum) id per group. groupBy on a 64-bit hash — one
    * shuffle, no skew beyond true duplicate groups. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = xxhash64(col(textCol))
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.withColumn("dup_rank", row_number().over(w))
      .withColumn("canonical_id", first(col(idCol)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_duplicate", col("dup_rank") > 1)
      .drop("dup_rank")
  }

  /** Normalize + shingle a text column into k-gram (word) shingles. */
  def shingles(textCol: Column, k: Int = 3): Column = {
    val words = split(lower(trim(textCol)), "\\s+")
    // sliding word k-grams via transform over indices
    val n = size(words)
    filter(
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => when(n >= k, concat_ws(" ", slice(words, i + 1, lit(k))))),
      x => x.isNotNull)
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the min
    * over shingle hashes. Pure expression (no UDF): xxhash64(shingle, seed). */
  def minhashSignature(textCol: Column, numHashes: Int = 32, k: Int = 3): Column = {
    val sh = shingles(textCol, k)
    array((0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(s, lit(seed))))
    }: _*)
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * `rowsPerBand` hashes; docs sharing any band bucket are candidate pairs.
    * Returns candidate pairs (id_a < id_b) with their band-collision count.
    * Plan shape: explode to (bandId, bandHash) → groupBy bucket (one shuffle)
    * → self-join within buckets only. */
  def minhashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, k: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"), minhashSignature(col(textCol), numHashes, k).as("sig"))
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_bands"))
  }

  /** SimHash: 64-bit signature where bit i is the sign of the weighted sum of
    * shingle-hash bit i. Near-dups = signatures within a small Hamming
    * distance; bucketing on bit-bands makes candidate generation linear. */
  def simhash(textCol: Column, k: Int = 2): Column = {
    val sh = shingles(textCol, k)
    val hashes = transform(sh, s => xxhash64(s))
    // For each bit position, count +1/-1 votes; assemble the sign bits.
    // shiftleft + bitwise OR: bit 63 would overflow any additive encoding.
    val bits = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard similarity between two text columns (verification step for
    * LSH candidates). Pure set expressions over shingle arrays. */
  def ngramJaccard(a: Column, b: Column, k: Int = 3): Column = {
    val sa = array_distinct(shingles(a, k))
    val sb = array_distinct(shingles(b, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Full MinHash-LSH near-dup pipeline: candidates from banding, verified
    * with n-gram Jaccard ≥ threshold. Returns verified duplicate pairs. */
  def nearDuplicates(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8, k: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, numHashes, bands, k)
    val txt = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    cands
      .join(txt.withColumnsRenamed(Map("__id" -> "id_a", "__text" -> "text_a")), "id_a")
      .join(txt.withColumnsRenamed(Map("__id" -> "id_b", "__text" -> "text_b")), "id_b")
      .withColumn("jaccard", ngramJaccard(col("text_a"), col("text_b"), k))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared_bands", "jaccard")
  }

  /** Embedding-cosine near-dup: candidate pairs from random-hyperplane LSH
    * buckets, verified by exact cosine ≥ threshold. Deterministic
    * pseudo-random hyperplanes derived from xxhash64(dim, bit). */
  def embeddingNearDup(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 16): DataFrame = {
    val sigBits = (0 until planes).map { p =>
      // hyperplane component for dim i: hash(p, i) mapped to [-1, 1]
      val dot = aggregate(
        zip_with(col("vec"), sequence(lit(0), size(col("vec")) - 1),
          (v, i) => v.cast("double") * ((xxhash64(lit(p), i) % 1000).cast("double") / 1000.0)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", sigBits.reduce(_ bitwiseOR _))
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
