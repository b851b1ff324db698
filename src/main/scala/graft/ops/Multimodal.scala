package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs, plus decode / feature-extract / resize /
  * frame-sample operators (reference analog: LoadImageUrl/GrayscaleImage,
  * aligned/schemas/transformation.py:2200-2281).
  *
  * The decode kernels themselves are STUBBED with deterministic fakes —
  * image/audio codecs are not in this container — but the Spark-side
  * contract is real: schemas, batch shape (mapPartitions over row
  * iterators so a codec can batch), partition sizing, and metadata
  * propagation are exactly what a real decoder plugs into.
  */
object Multimodal {

  /** metadata struct carried next to every media binary column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a deterministic fake media payload + metadata to each row — the
    * test stand-in for `spark.read.format("binaryFile")`. The fake dimensions
    * derive from an md5 prefix (not xxhash64) so an external engine can
    * recompute them — that makes the downstream plumbing oracle-checkable:
    * h = CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,8) AS BIGINT), in
    * [0, 2^32). */
  def withFakeMedia(df: DataFrame, idCol: String, mime: String = "image/png"): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    df.withColumn("media_bytes", to_binary(conv(h % 1000000, 10, 16), lit("hex")))
      .withColumn("media_meta", struct(
        lit(mime).as("mime"),
        (h % 1024 + 32).cast("int").as("width"),
        (h % 768 + 32).cast("int").as("height"),
        (h % 300 + 1).cast("int").as("n_frames"),
        lit(16000).as("sample_rate"),
        (h % 60000).cast("long").as("duration_ms")))
  }

  /** STUB decode kernel: a real implementation would decode `bytes` with an
    * image codec; the fake derives a deterministic fixed-size feature vector
    * from the bytes so pipelines are testable end-to-end. Runs per partition
    * so a real codec can amortize init across a batch of rows. */
  private def fakeDecodeFeatures(bytes: Array[Byte], dims: Int): Array[Float] = {
    // ??? <- real codec goes here (e.g. javax.imageio / ffmpeg bindings)
    val seed = java.util.Arrays.hashCode(bytes)
    Array.tabulate(dims)(i => (((seed * 31 + i) % 1000).toFloat / 1000.0f))
  }

  /** Decode + feature-extract: binary column → fixed-size float vector.
    * mapPartitions keeps codec init per-partition, and the output schema is
    * explicit so Catalyst can keep planning around the opaque kernel. */
  def extractFeatures(df: DataFrame, bytesCol: String, dims: Int = 16,
      out: String = "media_features"): DataFrame = {
    val schema = df.schema.add(out, ArrayType(FloatType))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition init of the (stubbed) codec happens here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) null else fakeDecodeFeatures(bytes, dims)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Decode + feature-extract with an EXPLICIT batch contract: the kernel
    * receives fixed-size batches of byte payloads (last batch ragged) — the
    * Scala analog of mapInPandas' batch frames, which is what a GPU codec
    * or model server actually wants (one inference call per batch, not per
    * row). `kernel` maps a batch of payloads to a batch of vectors;
    * replace the default (the deterministic fake) with a real codec. */
  def extractFeaturesBatched(df: DataFrame, bytesCol: String, dims: Int = 16,
      batchSize: Int = 64, out: String = "media_features",
      kernel: (Seq[Array[Byte]], Int) => Seq[Array[Float]] =
        (batch, d) => batch.map(b => if (b == null) null else fakeDecodeFeatures(b, d)))
      : DataFrame = {
    require(batchSize > 0, "batchSize > 0")
    val schema = df.schema.add(out, ArrayType(FloatType))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = kernel(batch.map(_.getAs[Array[Byte]](idx)), dims)
        // a kernel that drops failed decodes would silently truncate the
        // zip — corrupt rows must surface as nulls, not disappear
        require(feats.length == batch.length,
          s"media kernel returned ${feats.length} vectors for ${batch.length} payloads")
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f))
      }
    }(enc)
  }

  /** Resize metadata transform (pure expression — resize itself is a kernel,
    * but the shape math and metadata update are engine-side). */
  def resizeMeta(df: DataFrame, metaCol: String, maxSide: Int): DataFrame = {
    val m = col(metaCol)
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(m.getField("width"), m.getField("height")).cast("double"))
    df.withColumn(metaCol, struct(
      m.getField("mime").as("mime"),
      (m.getField("width") * scale).cast("int").as("width"),
      (m.getField("height") * scale).cast("int").as("height"),
      m.getField("n_frames").as("n_frames"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("duration_ms").as("duration_ms")))
  }

  /** Frame sampling plan: one output row per sampled frame index, at `fps`
    * against the clip's metadata — pure explode, ready for a per-frame
    * decode kernel downstream. */
  def sampleFrames(df: DataFrame, metaCol: String, everyNth: Int): DataFrame =
    df.withColumn("frame_index",
      explode(sequence(lit(0), greatest(col(metaCol).getField("n_frames") - 1, lit(0)), lit(everyNth))))

  /** FIXED-SIZE BYTE CHUNKING of a binary column with per-chunk digests —
    * the blob-level dedup/upload prep (chunk a media payload, digest each
    * window, dedup or upload by digest). One narrow map: hex once, explode
    * O(chunks) rows, digest per chunk. Digests run over the UPPERCASE HEX
    * of the window (`hex()` agrees byte-for-byte across engines, which
    * keeps the op oracle-checkable; a deployment hashing raw bytes instead
    * only changes the digest expression). Returns (idCol, chunk_idx 0-based,
    * chunk_len bytes, digest). */
  def chunkBytes(df: DataFrame, bytesCol: String, idCol: String,
      chunkSize: Int): DataFrame = {
    // upper bound: 2*chunkSize (hex chars per chunk) must not wrap Int
    require(chunkSize > 0 && chunkSize <= Int.MaxValue / 2,
      s"0 < chunkSize <= ${Int.MaxValue / 2}")
    val hx = hex(col(bytesCol))
    val hexChunk = lit(2 * chunkSize)
    df.select(col(idCol), hx.as("__hx"))
      .filter(length(col("__hx")) > 0)
      .select(col(idCol), col("__hx"),
        explode(sequence(lit(0L),
          ceil(length(col("__hx")) / hexChunk.cast("double")).cast("long") - 1))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (length(substring_index_expr(col("__hx"), col("chunk_idx"), hexChunk)) / 2)
          .cast("long").as("chunk_len"),
        md5(substring_index_expr(col("__hx"), col("chunk_idx"), hexChunk)).as("digest"))
  }

  /** hex substring for chunk `idx` of width `hexChunk` (1-based substring). */
  private def substring_index_expr(hx: org.apache.spark.sql.Column,
      idx: org.apache.spark.sql.Column,
      hexChunk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hx.substr((idx * hexChunk + 1).cast("int"), hexChunk.cast("int"))

  /** Row-wise presigned-URL construction (reference: PresignedAwsUrl,
    * transformation.py:2670-2708 — an S3 client call per row). The signing
    * call is STUBBED (no cloud SDK offline); the row-wise URL assembly and
    * deterministic signature plumbing are real expressions. */
  def presignedUrlStub(bucket: String, keyCol: org.apache.spark.sql.Column,
      expirySeconds: Int = 3600): org.apache.spark.sql.Column =
    format_string(s"https://$bucket.s3.amazonaws.com/%s?X-Expires=$expirySeconds&X-Signature=%s",
      keyCol, conv(abs(xxhash64(keyCol, lit(expirySeconds))).cast("string"), 10, 16))
}
