package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travel as opaque
  * `binary` columns + typed metadata; decode / feature-extract / frame-
  * sample run per partition over iterators (one codec instance per
  * partition, streaming — never materializing a partition in memory).
  *
  * Image decode is REAL: [[decodeBinary]] runs the JDK's javax.imageio
  * readers (PNG/JPEG/GIF/BMP — no external dependency) per partition.
  * Blobs no installed reader recognizes (this container's synthetic
  * testdata, or genuinely un-decodable bytes at 100 TB — a pipeline must
  * not die on one corrupt blob) fall back to [[decodeFallback]]'s
  * deterministic byte-derived metadata, flagged `decoded = false`.
  *
  * Scale notes (100 TB): media rows are large → keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits in executor memory, and select the binary column only in
  * the decode stage (column pruning keeps it out of every other scan).
  */
object Multimodal {

  /** Decoded-media metadata. `decoded = true` means a real image codec
    * produced the geometry; false means the deterministic fallback did. */
  final case class MediaMeta(
      id: Long, width: Int, height: Int, channels: Int, n_pixels: Long,
      decoded: Boolean)

  /** One sampled frame of a multi-frame media blob. `decoded = true`
    * means a real codec produced the frame count and geometry (the JDK's
    * GIF reader exposes both); false means the deterministic fallback. */
  final case class Frame(
      id: Long, frame_idx: Int, width: Int, height: Int, decoded: Boolean)

  /** Deterministic byte-derived metadata for blobs no codec recognizes:
    * corrupt/unknown formats must yield a row (so downstream joins keep
    * the document), not an exception or a dropped blob. */
  private def decodeFallback(id: Long, bytes: Array[Byte]): MediaMeta = {
    val w = 1 + (bytes.length % 64)
    val h = 1 + ((if (bytes.nonEmpty) bytes(0) & 0xff else 0) % 64)
    MediaMeta(id, w, h, 3, w.toLong * h * 3, decoded = false)
  }

  /** Real image METADATA via the JDK's ImageIO registry — header-only:
    * geometry and channel count come from the reader's header and
    * declared image type with NO raster allocation, so a 12000×8000
    * image reports its true geometry (the metadata path needs no
    * decode-bomb ceiling — there is nothing to bomb) and a malicious
    * header costs nothing. Returns None when no installed reader
    * recognizes the bytes or the header is corrupt. */
  private def decodeImage(id: Long, bytes: Array[Byte]): Option[MediaMeta] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // null check BEFORE getImageReaders: a null stream makes it throw
      // IllegalArgumentException, which the broad guard would swallow —
      // the check must gate the call, not trail it
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            val (w, h) = (r.getWidth(0), r.getHeight(0))
            val types = r.getImageTypes(0)
            if (w <= 0 || h <= 0 || types == null || !types.hasNext) None
            else {
              val channels = types.next().getColorModel.getNumComponents
              Some(MediaMeta(id, w, h, channels,
                w.toLong * h * channels, decoded = true))
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Decode a binary column into media metadata, one codec setup per
    * partition. Input: (id: Long, bytes: binary). */
  def decodeBinary(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // per-partition codec setup: ImageIO's default stream cache is a
        // temp FILE per decode — in-memory cache only, once per partition
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeImage(id, bytes).getOrElse(decodeFallback(id, bytes))
        }
      }
  }

  /** Real frame enumeration via the ImageIO registry: readers for
    * multi-image containers (the JDK ships GIF) report the frame count
    * and per-frame geometry without decoding pixels we don't sample.
    * Returns None when no reader recognizes the bytes. */
  private def readFrames(id: Long, bytes: Array[Byte], stride: Int): Option[Seq[Frame]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true) // allowSearch: scan the container index
          if (n <= 0) None
          else Some((0 until n by stride).map(i =>
            Frame(id, i, reader.getWidth(i), reader.getHeight(i), decoded = true)))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  /** Sample every `stride`-th frame of a media blob: one output row per
    * sampled frame, streamed from the partition iterator. Blobs no codec
    * recognizes fall back to a deterministic synthetic frame index
    * (count = len % 5 + 1, geometry from [[decodeFallback]]) so corrupt
    * inputs yield rows, not failures. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): Dataset[Frame] = {
    require(stride > 0, "stride must be positive")
    implicit val enc = Encoders.product[Frame]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          readFrames(id, bytes, stride).getOrElse {
            val meta = decodeFallback(id, bytes)
            val frames = bytes.length % 5 + 1
            (0 until frames by stride).map(i =>
              Frame(id, i, meta.width, meta.height, decoded = false))
          }
        }
      }
  }

  /** Decoded-audio metadata. `decoded = true` means a real audio codec
    * (javax.sound.sampled — WAV/AIFF/AU ship with the JDK) parsed the
    * container header; false means the deterministic fallback. */
  final case class AudioMeta(
      id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      decoded: Boolean)

  private def audioFallback(id: Long, bytes: Array[Byte]): AudioMeta =
    AudioMeta(id, 8000, 1 + bytes.length % 2, bytes.length.toLong,
      decoded = false)

  /** Container magic for the JDK's audio readers (WAV=RIFF, AIFF=FORM,
    * AU=.snd): probing AudioSystem on arbitrary bytes costs a thrown
    * UnsupportedAudioFileException per blob — at corpus scale that is
    * real time, so non-candidates skip straight to the fallback. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && {
      val m = (b(0) & 0xff) << 24 | (b(1) & 0xff) << 16 | (b(2) & 0xff) << 8 | (b(3) & 0xff)
      m == 0x52494646 /* RIFF */ || m == 0x464f524d /* FORM */ ||
        m == 0x2e736e64 /* .snd */
    }

  /** Real audio header decode: format + frame count without reading the
    * PCM payload. None when no installed reader recognizes the bytes. */
  private def decodeAudioReal(id: Long, bytes: Array[Byte]): Option[AudioMeta] =
    if (!looksLikeAudio(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        Some(AudioMeta(id, f.getSampleRate.toInt, f.getChannels,
          in.getFrameLength, decoded = true))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Decode an audio binary column into (sample_rate, channels, n_frames),
    * streamed per partition; unrecognized bytes take the deterministic
    * fallback so corrupt blobs yield rows, not failures. */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    implicit val enc = Encoders.product[AudioMeta]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAudioReal(id, bytes).getOrElse(audioFallback(id, bytes))
        }
      }
  }

  /** Resized-media metadata: target box + the scale applied. */
  final case class ResizedMeta(
      id: Long, width: Int, height: Int, out_width: Int, out_height: Int,
      scale: Double)

  /** Fit decoded media into a `maxSide`×`maxSide` box preserving aspect
    * ratio (never upscales). The geometry is real; only the pixel
    * resample inside a real decoder is stubbed away — the metadata math
    * is exactly what a resize stage must emit for downstream batching. */
  def resizeBinary(df: DataFrame, idCol: String, binCol: String,
      maxSide: Int): Dataset[ResizedMeta] = {
    require(maxSide > 0, "maxSide must be positive")
    implicit val enc = Encoders.product[ResizedMeta]
    decodeBinary(df, idCol, binCol).map { m =>
      val s = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      ResizedMeta(m.id, m.width, m.height,
        math.max(1, math.floor(m.width * s).toInt),
        math.max(1, math.floor(m.height * s).toInt), s)
    }
  }

  /** A really-resized media blob: the re-encoded PNG bytes plus output
    * geometry. `decoded = false` rows carry the original bytes untouched
    * (pass-through — a resize stage must not corrupt what it cannot
    * decode). */
  final case class ResizedImage(
      id: Long, out_width: Int, out_height: Int, decoded: Boolean,
      bytes: Array[Byte])

  /** REAL pixel resize: decode via ImageIO, scale into a maxSide box with
    * Graphics2D bilinear interpolation, re-encode as PNG — all JDK, no
    * new dependency. Non-decodable blobs pass through with their original
    * bytes and `decoded = false`. One codec setup per partition, streamed
    * (the [[resizeBinary]] geometry op remains the metadata-only form for
    * manifest building — this one produces the actual training asset). */
  def resizePixels(df: DataFrame, idCol: String, binCol: String,
      maxSide: Int): Dataset[ResizedImage] = {
    require(maxSide > 0, "maxSide must be positive")
    implicit val enc = Encoders.product[ResizedImage]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          // header-first + dimension-bounded: a decode-bomb header must
          // take the pass-through, not OOM the task
          boundedDecode(bytes) match {
            case None => ResizedImage(id, 0, 0, decoded = false, bytes)
            case Some(src) =>
              val s = math.min(1.0,
                maxSide.toDouble / math.max(src.getWidth, src.getHeight))
              val (ow, oh) = (math.max(1, math.floor(src.getWidth * s).toInt),
                math.max(1, math.floor(src.getHeight * s).toInt))
              val dst = new java.awt.image.BufferedImage(ow, oh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, ow, oh, null)
              } finally g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              ResizedImage(id, ow, oh, decoded = true, out.toByteArray)
          }
        }
      }
  }

  /** Pixel ceiling for [[boundedDecode]] (8192×8192): above it a raster
    * allocation is a decode bomb, not training data. */
  val MaxDecodePixels: Long = 8192L * 8192L

  /** Header-first decode: geometry is read WITHOUT allocating pixels,
    * oversized or unrecognized blobs yield None, and only then does the
    * full raster decode run — the guard that keeps a malicious header
    * from OOM-killing a task (an Error, which no Exception catch
    * stops). */
  private def boundedDecode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // null gates the reader call (see decodeImage)
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            val (w, h) = (r.getWidth(0), r.getHeight(0))
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  final case class ImageFeatureRow(id: Long, decoded: Boolean,
      features: Seq[Double])

  /** REAL image features with no model weights: decode
    * (javax.imageio), mean-pool the BT.601 luma
    * ((299·r + 587·g + 114·b)/255000 ∈ [0, 1]) over a `grid`×`grid`
    * raster — the perceptual-hash family's feature front half (pHash/
    * aHash pool exactly this grid before thresholding), useful as-is
    * for near-duplicate screening, brightness/structure clustering, or
    * as input to [[extractFeatures]]'s projection path. Pixel (x, y)
    * belongs to cell (x·grid/w, y·grid/h) — the standard integer
    * pooling partition; images smaller than the grid leave empty cells
    * at 0.0. Non-decodable blobs fall back to [[extractFeatures]]'s
    * byte fold at the same grid²-width (flagged `decoded = false`), so
    * mixed corpora keep one schema.
    *
    * Scale shape: one codec setup per partition, rows streamed; output
    * is grid² doubles per blob regardless of resolution — the fixed-
    * width index row a 100 TB media corpus persists next to its bytes.
    *
    * Decode-bomb guard: the header is read FIRST (no pixel
    * allocation) and blobs declaring more than [[MaxDecodePixels]]
    * pixels take the fallback — a few-hundred-byte file claiming
    * 60000×60000 would otherwise make ImageIO allocate a multi-GB
    * raster and throw an OutOfMemoryError past any Exception guard,
    * killing the task instead of degrading the row. An arbitrary
    * corpus is exactly where such blobs occur. */
  def imageFeatures(df: DataFrame, idCol: String, binCol: String,
      grid: Int = 8): DataFrame = {
    require(grid > 0, "grid must be positive")
    implicit val enc = Encoders.product[ImageFeatureRow]
    val dim = grid * grid
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = boundedDecode(bytes)
          img match {
            case None =>
              val acc = new Array[Double](dim)
              var i = 0
              while (i < bytes.length) {
                acc(i % dim) += (bytes(i) & 0xff) / 255.0
                i += 1
              }
              ImageFeatureRow(id, decoded = false, acc.toSeq)
            case Some(src) =>
              val (w, h) = (src.getWidth, src.getHeight)
              val sums = new Array[Double](dim)
              val counts = new Array[Long](dim)
              var y = 0
              while (y < h) {
                val gy = math.min(grid - 1, y * grid / h)
                var x = 0
                while (x < w) {
                  val gx = math.min(grid - 1, x * grid / w)
                  val rgb = src.getRGB(x, y)
                  val lum = 299L * ((rgb >> 16) & 0xff) +
                    587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                  val cell = gy * grid + gx
                  sums(cell) += lum / 255000.0
                  counts(cell) += 1L
                  x += 1
                }
                y += 1
              }
              val feats = Array.tabulate(dim)(i =>
                if (counts(i) == 0L) 0.0 else sums(i) / counts(i))
              ImageFeatureRow(id, decoded = true, feats.toSeq)
          }
        }
      }
      .toDF("id", "decoded", "features")
  }

  /** Fixed-width feature vector per media blob, one "model" instance per
    * partition (the mapPartitions shape a real embedding stage needs:
    * load weights once, stream the batch through).
    *
    * Two paths share the pipeline shape:
    *   - `weights = None` (default) — ======== STUB ======== a
    *     deterministic fold of the raw bytes (no model weights can exist
    *     in this environment).
    *   - `weights = Some(W)` — REAL math: the byte fold becomes the input
    *     vector x, and the output is `tanh(W · x)` (a 1-layer linear
    *     projection; W is `outDim × dim`, broadcast to every executor
    *     once and reused across the partition's rows — the exact
    *     lifecycle a real weight matrix needs). PipelineSpec proves the
    *     projection against a hand-computed vector.
    *
    * ==== THE SWAP POINT (pluggable-featurizer contract) ====
    * A real model replaces ONLY the body of the `it.map` below (the
    * per-row bytes → Array[Double] function) plus the per-partition
    * setup line above it (where `bw.map(_.value)` materializes the
    * broadcast weights — a JNI session / ONNX runtime / tokenizer
    * loads THERE, once per partition, never per row and never on the
    * driver). Callers are untouched because the boundary is pinned by
    * MultimodalContractSpec and must be preserved by any drop-in:
    *   - output schema is exactly `(id: long, features: array<double>)`
    *     on BOTH paths — downstream (Similarity.fitCodebook / knn*)
    *     consumes it positionally;
    *   - the kernel consumes the partition ITERATOR lazily (map, not
    *     toList) — a 100 TB partition must stream through the model in
    *     batches, never materialize;
    *   - per-element code touches NO SparkSession/SparkContext (the
    *     closure runs on executors; session access throws there);
    *   - heavyweight state rides a BROADCAST handle created once on
    *     the driver (`bw`), materialized once per partition — per-task
    *     closure capture would re-ship the weights with every task;
    *   - the result is a pure function of (bytes, weights): same rows
    *     under any partitioning yield the same feature set
    *     (repartition-invariance, spec-pinned).
    */
  final case class FeatureRow(id: Long, features: Seq[Double])

  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 8,
      weights: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(dim > 0, "dim must be positive")
    weights.foreach { w =>
      require(w.nonEmpty && w.forall(_.size == dim),
        s"weight matrix must be outDim x $dim (rows of input-dim width)")
    }
    implicit val enc = Encoders.product[FeatureRow]
    val spark = df.sparkSession
    // broadcast, not closure-capture: one deserialized copy per executor
    // (a real weight matrix is MBs-GBs; per-task closures would re-ship
    // it). Only created when weights exist — the default fold path must
    // not pay a broadcast. The handle lives as long as the returned
    // frame; callers looping over many matrices should reuse one frame
    // per matrix (the ContextCleaner reclaims dropped broadcasts on GC).
    val bw = weights.map(w =>
      spark.sparkContext.broadcast(w.map(_.toArray).toArray))
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val w = bw.map(_.value) // weights materialize once per partition
        it.map { case (id, bytes) =>
          val acc = new Array[Double](dim)
          var i = 0
          while (i < bytes.length) {
            acc(i % dim) += (bytes(i) & 0xff) / 255.0
            i += 1
          }
          val feats = w match {
            case None => acc
            case Some(m) =>
              val out = new Array[Double](m.length)
              var r = 0
              while (r < m.length) {
                val row = m(r)
                var c = 0
                var s = 0.0
                while (c < dim) { s += row(c) * acc(c); c += 1 }
                out(r) = math.tanh(s)
                r += 1
              }
              out
          }
          FeatureRow(id, feats.toSeq)
        }
      }
      .toDF("id", "features")
  }
}
