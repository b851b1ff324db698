package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical data-layout planning: Z-order (Morton) clustering keys for
  * multi-dimensional file skipping, and small-file compaction planning —
  * the table-maintenance half of a 100 TB lakehouse pipeline. The reference
  * stops at hive partitioning (sources/local.py partition_by); these are
  * "beyond the reference" layout operators a large-scale corpus store needs:
  * without Z-ordering, a min/max-pruned scan filtered on two columns reads
  * nearly every file; without compaction, streaming/upsert ingest decays
  * into millions of KB-sized files and the scan goes metadata-bound.
  *
  * Everything here is exact integer arithmetic (bucket = affine rescale with
  * integer division, zkey = bit interleave, bin = cumsum DIV target), so
  * every plan is hash-verifiable cross-engine — no floats anywhere.
  */
object Layout {

  /** `a DIV b` on longs. The DataFrame `/` lowers to double division for
    * integral inputs, and floor-of-double breaks past 2^53 — so integer
    * division goes through Catalyst's IntegralDivide directly. */
  private def longDiv(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(new IntegralDivide(
      GraftColumnBridge.toExpr(a.cast("long")), GraftColumnBridge.toExpr(b.cast("long"))))

  /** Morton (Z-order) interleave key over `dims` integer columns.
    *
    * Each dimension is rescaled to `bits`-bit bucket space with plan-time
    * [min, max] bounds: bucket = ((v - min) * 2^bits) DIV (max - min + 1) —
    * pure long arithmetic, monotone, range-preserving. The buckets are then
    * bit-interleaved (dimension i contributes its bit b at output bit
    * b*n_dims + i), so lexicographic order on zkey ≈ locality in ALL
    * dimensions at once: a range predicate on any one dimension touches
    * only the files whose zkey prefix ranges overlap it.
    *
    * The whole key is one narrow codegen'd projection — no shuffle, no UDF.
    * Overflow headroom: (max - min + 1) * 2^bits must fit a long; with
    * bits=8 and a 100 TB-scale 1e12 key range that is ~2.6e14 ≪ 2^63.
    */
  def zorderKey(dims: Seq[Column], mins: Seq[Long], maxs: Seq[Long], bits: Int): Column = {
    require(dims.nonEmpty && dims.length == mins.length && mins.length == maxs.length)
    val n = dims.length
    val buckets = dims.lazyZip(mins).lazyZip(maxs).map { (c, mn, mx) =>
      // clamp first so out-of-bounds rows (bounds computed on an earlier
      // snapshot; late-arriving data) land in the edge bucket instead of a
      // negative / overflowed key
      val clamped = least(greatest(c.cast("long"), lit(mn)), lit(mx))
      longDiv((clamped - lit(mn)) * lit(1L << bits), lit(mx - mn + 1))
    }.toSeq
    val terms = for {
      b <- 0 until bits
      (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _).cast("long")
  }

  /** Per-file min/max envelope audit for a Z-ordered write.
    *
    * Files are the top bits of the zkey (file = zkey DIV (keySpace/nFiles)
    * for nFiles dividing the key space) — exactly the boundaries a
    * `repartitionByRange(zkey)` writer draws on uniform keys, but computed
    * without range-exchange sampling, so the assignment is deterministic
    * and cross-engine reproducible. Output: one row per file with its row
    * count and the min/max of every dimension — the envelope a parquet
    * footer / Delta stats entry would carry, i.e. the file-skipping
    * effectiveness of the layout, made queryable.
    *
    * One narrow projection + one hash aggregate on file_id — partial
    * (map-side) aggregation reduces the shuffle to nFiles×dims tiny rows at
    * any scale. The physical write at scale is `df.repartitionByRange(
    * nFiles, $"zkey").sortWithinPartitions($"zkey").write...`; this
    * operator is that write's plan-level audit.
    */
  def zorderFileSummary(df: DataFrame, dims: Seq[String], mins: Seq[Long], maxs: Seq[Long],
      bits: Int, nFiles: Int): DataFrame = {
    val keySpace = 1L << (bits * dims.length)
    require(nFiles > 0 && keySpace % nFiles == 0,
      s"nFiles must divide the 2^${bits * dims.length} key space")
    val z = zorderKey(dims.map(col), mins, maxs, bits)
    val withKey = df.withColumn("zkey", z)
      .withColumn("file_id", longDiv(col("zkey"), lit(keySpace / nFiles)))
    val aggs = count(lit(1)).as("n_rows") +:
      (dims.flatMap(d => Seq(min(col(d)).cast("long").as(s"min_$d"),
        max(col(d)).cast("long").as(s"max_$d"))) ++
        Seq(min("zkey").as("min_zkey"), max("zkey").as("max_zkey")))
    withKey.groupBy("file_id")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Small-file compaction plan: greedy sequential bin-packing of input
    * files into ~`targetBytes` output bins, per table partition.
    *
    * Input is a FILE MANIFEST (one row per file with its size), not data —
    * at 100 TB the manifest is ~1e6 rows against ~1e10 data rows, so the
    * per-partition window below runs over metadata and costs nothing.
    * Files keep their `orderCol` order inside a partition (preserving any
    * clustering the writer established); the bin boundary is
    * bin = (running size before this file) DIV targetBytes — the classic
    * next-fit packer: deterministic, no driver loop, exact longs, every bin
    * except the last ends at or past the target.
    *
    * Output: every manifest row annotated with `cum_before` and `out_bin` —
    * the rewrite job's work list (one bin = one output file's inputs).
    */
  def compactionPlan(manifest: DataFrame, partitionCols: Seq[String], orderCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("cum_before", coalesce(sum(col(sizeCol)).over(w), lit(0L)).cast("long"))
      .withColumn("out_bin", longDiv(col("cum_before"), lit(targetBytes)))
  }
}
