package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer
  * TRAINING step of a pretraining pipeline (the reference ships only
  * pretrained-tokenizer counting, `aligned/schemas/text_vectoriser.py`;
  * training the vocabulary over the corpus itself is the at-scale step
  * upstream of [[TextAnalysis.tokenizeToIds]]).
  *
  * Scale shape — the same decomposition every single-node BPE trainer
  * (HuggingFace tokenizers, SentencePiece) uses, distributed: the corpus
  * folds ONCE to its bounded (word, count) vocabulary — one
  * partial-aggregated shuffle over word hashes; 100 TB of text is ~10⁶
  * distinct words — and every merge round after that touches ONLY the
  * vocabulary table. A k-merge training run costs one corpus scan plus k
  * bounded-table rounds, never k corpus scans. Per round the driver pulls
  * exactly ONE (pair, count) row (TakeOrdered top-1 — per-partition
  * partial top-1, no global sort), and the re-segmented vocabulary is
  * localCheckpointed so lineage stays flat across rounds.
  */
object Bpe {

  /** One learned merge rule: at `rank` (1-based), replace every
    * left-to-right adjacent (left, right) with left+right. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Corpus → bounded (word, cnt) vocabulary: the ONE corpus-scaled scan. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** (word, cnt) → (syms: array<string>, cnt): initial character
    * segmentation. Spark's split keeps a trailing "" at limit -1 — filter
    * keeps exactly the character symbols. */
  private def charVocab(vocab: DataFrame): DataFrame =
    vocab.select(
      filter(split(col("word"), ""), s => s =!= lit("")).as("syms"),
      col("cnt"))

  /** Adjacent symbol pairs of every vocabulary word, occurrence-weighted:
    * zip arr[0..n-2] with arr[1..n-1] (overlapping pairs count fully, the
    * standard convention — "aaa" yields (a,a) twice). Pure HOFs over the
    * bounded vocab — no corpus rows involved. */
  private[ops] def pairCounts(symVocab: DataFrame): DataFrame =
    symVocab.select(col("cnt"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("n"))

  /** Left-to-right greedy application of ONE merge rule to a symbol array,
    * as a single codegen-friendly fold: append, or fuse with the previous
    * symbol when (prev, cur) is the rule. A just-fused symbol can never
    * re-fuse (left+right ≠ left for nonempty right), so the fold IS the
    * non-overlapping left-to-right semantics. try_element_at keeps the
    * empty-accumulator probe null-safe under ANSI. */
  private def mergeSyms(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(try_element_at(acc, lit(-1)) === lit(left) && (s === lit(right)),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(s))))

  /** Learn up to `maxMerges` merge rules from the corpus. Stops early when
    * no pair reaches `minCount`. Ties break lexicographically on (left,
    * right) — deterministic across partitionings and retries. */
  def train(df: DataFrame, textCol: String, maxMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    var vocab = charVocab(wordCounts(df, textCol)).localCheckpoint()
    val learned = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= maxMerges && !exhausted) {
      // O(1) driver pull: the single best (pair, count) row of this round
      val top = pairCounts(vocab)
        .orderBy(desc("n"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Merge(rank, l, r, n)
        val next = vocab
          .select(mergeSyms(col("syms"), l, r).as("syms"), col("cnt"))
          .localCheckpoint() // flat lineage: each round reads the last materialization
        vocab.unpersist(blocking = false)
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist(blocking = false)
    learned.result()
  }

  /** The learned rules as a DataFrame (rank, left, right, pair_count) —
    * O(merges) driver-side rows, the persisted tokenizer artifact. */
  def mergesDF(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Inverse of [[mergesDF]]: load a persisted merge table (e.g. read back
    * from parquet) into the rule list, rank-ordered — the tokenizer
    * artifact round trip. O(merges) driver rows by construction. */
  def mergesFrom(df: DataFrame): Seq[Merge] =
    df.select(col("rank").cast("int"), col("left"), col("right"),
        col("pair_count").cast("long"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** BPE-encode a corpus with learned rules: per word, repeatedly fuse the
    * LOWEST-RANK adjacent pair (the standard encode). The merge table is a
    * bounded broadcast; the per-row loop is O(len·applied) imperative
    * symbol surgery over the corpus — the documented mapPartitions case
    * (no Column-algebra form avoids materializing one plan node per rule). */
  def encode(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = ranks.value
        // per-partition word memo: vocabulary is Zipf-bounded (a few
        // million entries at web-corpus scale — bounded executor memory)
        // while occurrences are corpus-scale, so each distinct word pays
        // the merge loop once per partition instead of once per occurrence
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          // Locale.ROOT: Spark's lower() is locale-independent — a tr_TR
          // default locale would otherwise map I->dotless-i here and
          // diverge from the Column path (portableTokenHash precedent)
          val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            .filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, rk)))
          (id, toks)
        }
      }.toDF(idCol, "tokens")
  }

  private def encodeWord(w: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    // CODE-POINT segmentation, not UTF-16 units: Spark's split(w, "") — the
    // trainer's and encodeColumn's symbol granularity — keeps astral chars
    // (emoji) whole; w.map(_.toString) would shear them into lone
    // surrogates and break the fold ≡ encode equivalence
    var syms = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var done = syms.length < 2
    while (!done) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Rank-order FOLD of the single-rule merge over a symbol array — the
    * pure-Column form of [[encode]] for a bounded LITERAL rule list (one
    * nested [[mergeSyms]] HOF per rule, codegen-friendly, no
    * mapPartitions). Equivalence with encode's lowest-rank-first loop is
    * the classical BPE argument: a merge only ever creates adjacencies
    * that involve the NEW symbol (neighbors of a fused pair become
    * adjacent to the fusion, never to each other), and a rule's
    * components predate it by construction of training — so once rule k
    * has been applied exhaustively, no later rule can create a fresh
    * (left_k, right_k) adjacency, and applying rules 1..k in rank order
    * (each as one greedy left-to-right pass) IS the standard encode.
    * Property-gated against [[encode]] in BpeSpec, including l==r chains
    * where the greedy no-refuse subtlety lives. */
  def applyMergesColumn(syms: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(syms) { case (c, (l, r)) => mergeSyms(c, l, r) }

  /** [[encode]] restated as pure Columns for a literal rule list: per doc,
    * whitespace-split words each char-segment and fold through
    * [[applyMergesColumn]]; the doc's token stream is the in-order
    * flatten. Emits (idCol, tokens_str — space-joined symbols (lossless:
    * symbols never contain whitespace), n_syms) — flat hash-friendly
    * columns for the oracle gate. */
  def encodeColumn(df: DataFrame, textCol: String, idCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    val words = filter(split(lower(trim(col(textCol))), "\\s+"), w => length(w) > 0)
    val encoded = flatten(transform(words, w =>
      applyMergesColumn(filter(split(w, ""), s => s =!= lit("")), rules)))
    df.select(col(idCol), array_join(encoded, " ").as("tokens_str"),
      size(encoded).cast("long").as("n_syms"))
  }

  /** Round-1 character-pair counts straight off the corpus — the
    * SQL-restatable slice of the trainer (the iterative rounds are
    * driver-steered and spec-gated instead). Top-k by (count desc, l, r). */
  def firstRoundPairs(df: DataFrame, textCol: String, k: Int): DataFrame =
    pairCounts(charVocab(wordCounts(df, textCol)))
      .orderBy(desc("n"), asc("l"), asc("r")).limit(k)
}
