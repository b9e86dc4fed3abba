package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode
  * and feature extraction run batch-wise per partition.
  *
  * IMAGE decode is REAL: `javax.imageio` (in the JDK — PNG, JPEG, GIF,
  * BMP) sniffs and decodes the payload, emitting true width/height and
  * a normalized 16-bin luminance histogram. AUDIO decode is REAL for
  * the JDK's containers: `javax.sound.sampled` (WAV/AIFF/AU, linear
  * PCM + A-law/µ-law) — see [[audioFeatures]]. Video, and payloads no
  * installed codec accepts, take the deterministic fallback (16-bin
  * BYTE histogram for images, raw-PCM interpretation for audio) and a
  * NULL `decoded` struct, keeping the boundary honest and visible. The
  * Spark-side plumbing is identical for both: per-partition batch
  * iteration (the Scala analog of a `mapInPandas` batch UDF: one
  * iterator in, one iterator out, no per-row scheduling), partition
  * sizing, and a feature-vector output that feeds the Knn/Dedup
  * operators.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, false),
    StructField("kind", StringType, false),      // image|audio|video
    StructField("bytes", BinaryType, true),      // opaque payload
    StructField("meta", StructType(Seq(          // typed sidecar
      StructField("format", StringType, true),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("duration_ms", LongType, true))), true)))

  /** Deterministic synthetic media table derived from `documents`:
    * payload = utf-8 text bytes, kind round-robins image/audio/video.
    * Stands in for a real binary-file scan
    * (`spark.read.format("binaryFile")`) so the pipeline is testable.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("synthetic").as("format"),
        length(col("text")).cast("int").as("width"),
        lit(1).as("height"),
        (length(col("text")) * 10L).as("duration_ms")).as("meta"))

  /** Synthetic media with REAL image payloads: image-kind rows carry a
    * deterministic PNG (rendered from the media id, encoded with the
    * JDK's ImageIO writer), so the decode path below runs against true
    * compressed image bytes end-to-end. Audio/video rows keep the text
    * payload.
    */
  def syntheticMediaWithImages(documents: DataFrame): DataFrame =
    syntheticMediaWithImages(documents, None)

  /** As above, but image CONTENT is keyed by `media_id % groupMod`
    * when `groupMod` is set: ids in the same residue class render
    * byte-identical PNGs — a controlled exact-duplicate population for
    * the image near-dup operator, whose ground truth is then
    * SQL-expressible (same group ⇔ identical payload ⇔ dHash Hamming
    * distance 0).
    */
  def syntheticMediaWithImages(
      documents: DataFrame, groupMod: Option[Long]): DataFrame = {
    // PNG encode is CPU-bound and the documents parquet scans as one
    // partition — spread BEFORE the mapPartitions or it runs one-core
    val base = syntheticMedia(documents)
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col("media_id"))
    val schema = base.schema
    val idIdx = schema.fieldIndex("media_id")
    val kindIdx = schema.fieldIndex("kind")
    base.mapPartitions { iter =>
      iter.map { row =>
        if (row.getString(kindIdx) == "image") {
          val id = row.getLong(idIdx)
          val seed = groupMod.map(id % _).getOrElse(id)
          val img = renderImage(seed)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.setUseCache(false) // no temp-file spool
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, "image", bos.toByteArray,
            Row("png", img.getWidth, img.getHeight, null))
        } else row
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** splitmix64 finalizer — a well-mixed deterministic per-pixel hash. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic seed-keyed test image (also used by DedupSpec to
    * build controlled perturbations): width varies with the seed
    * (8 + seed % 8, height 8 — StreamSpec pins the geometry), pixels
    * are seed-keyed splitmix noise in all three channels so distinct
    * seeds produce structurally distinct images — a smooth ramp would
    * make different seeds dHash-collide (their neighbor-luminance
    * ORDER survives a constant shift), which DedupSpec's pairwise-
    * distinct precondition for the q_image_neardup oracle forbids.
    */
  def renderImage(seed: Long): java.awt.image.BufferedImage = {
    val w = 8 + (seed % 8).toInt
    val h = 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = mix64(seed * 65599L + y.toLong * 131L + x.toLong)
        img.setRGB(x, y, (m & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Decode to a BufferedImage via the JDK's `javax.imageio`: sniffs
    * the payload for a registered reader (PNG/JPEG/GIF/BMP magic
    * bytes). None when the payload is null, not an image, or corrupt —
    * callers degrade instead of failing the partition.
    */
  private def decodeBuffered(
      bytes: Array[Byte]): Option[(java.awt.image.BufferedImage, String)] = {
    if (bytes == null) return None
    try {
      // default ImageIO stream cache spools through a TEMP FILE per
      // call — for in-memory byte payloads that is pure disk overhead
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some((reader.read(0), reader.getFormatName.toLowerCase))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }
  }

  /** ITU-R 601 integer luminance of a packed RGB pixel, 0..255. */
  @inline private def luminance(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
      (rgb & 0xff) * 114) / 1000

  /** Real image decode: (width, height, format, normalized 16-bin
    * luminance histogram), or None when undecodable.
    */
  private def decodeImage(
      bytes: Array[Byte]): Option[(Int, Int, String, Array[Float])] =
    decodeBuffered(bytes).map { case (img, fmt) =>
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Float](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          hist(luminance(img.getRGB(x, y)) >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(w * h, 1)
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      (w, h, fmt, hist)
    }

  /** 64-bit dHash (difference hash) of a decoded image: average-pool
    * the luminance plane onto a 9×8 grid, then bit (y*8+x) = 1 iff
    * grid(y)(x+1) > grid(y)(x). Scale/encode-invariant enough that a
    * lightly perturbed re-encode lands within a small Hamming
    * distance — the classic perceptual near-dup key.
    */
  def dhash64(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val grid = Array.ofDim[Double](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh
      val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw
        val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += luminance(img.getRGB(x, y)); n += 1; x += 1 }
          y += 1
        }
        grid(gy)(gx) = sum.toDouble / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < 8) {
        if (grid(gy)(gx + 1) > grid(gy)(gx)) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Perceptual-hash table for image near-dup: (idCol, dhash) with a
    * NULL dhash for undecodable/non-image payloads. Decode is
    * CPU-bound, so the scan is spread like [[extractFeatures]]; the
    * output is two scalars per row — the narrow shape the Hamming
    * banding join wants at corpus scale.
    */
  def dhash(
      media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes", minPartitions: Option[Int] = None): DataFrame = {
    val target = minPartitions.getOrElse(
      media.sparkSession.sparkContext.defaultParallelism)
    val narrowed = media.select(col(idCol), col(bytesCol))
    val spread =
      if (narrowed.rdd.getNumPartitions < target) narrowed.repartition(target)
      else narrowed
    val outSchema = StructType(Seq(
      StructField(idCol, media.schema(idCol).dataType, false),
      StructField("dhash", LongType, true)))
    spread.mapPartitions { iter =>
      iter.map { row =>
        val bytes = if (row.isNullAt(1)) null else row.getAs[Array[Byte]](1)
        val hash = decodeBuffered(bytes) match {
          case Some((img, _)) => java.lang.Long.valueOf(dhash64(img))
          case None => null
        }
        Row(row.get(0), hash)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Image near-dup pairs: dHash each decodable payload, then reuse
    * the generic 64-bit Hamming banding join
    * ([[graft.operators.Dedup.hammingPairs]]) — candidates meet on an
    * identical 3-of-6 block combination, never all-pairs. Output
    * (d1, d2, hamming) with d1 < d2.
    */
  def imageNearDupPairs(
      media: DataFrame, maxDist: Int, idCol: String = "media_id",
      bytesCol: String = "bytes"): DataFrame =
    Dedup.hammingPairs(
      dhash(media, idCol, bytesCol).filter(col("dhash").isNotNull),
      idCol, "dhash", maxDist)

  /** Non-image fallback features: a normalized 16-bin byte histogram —
    * the same fixed-width shape, deterministic, null-safe.
    */
  private def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(bytes.length, 1)
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
    }
    hist
  }

  /** Feature extraction over the media table: batch-iterates each
    * partition (mapPartitions — the JVM analog of a batched pandas
    * UDF) and appends a fixed-width feature vector plus a `decoded`
    * struct (real width/height/format for payloads ImageIO can read,
    * NULL otherwise). Decode is CPU-bound, so a scan with too few
    * partitions (a one-row-group parquet scans as ONE) is spread to
    * `minPartitions` first — otherwise the whole decode runs on one
    * core no matter how many executors exist; when the scan already
    * has enough partitions the op stays narrow (no shuffle).
    */
  def extractFeatures(media: DataFrame, minPartitions: Option[Int] = None): DataFrame = {
    val target = minPartitions.getOrElse(
      media.sparkSession.sparkContext.defaultParallelism)
    val spread =
      if (media.rdd.getNumPartitions < target) media.repartition(target)
      else media
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType, false), false),
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType, true),
        StructField("height", IntegerType, true),
        StructField("format", StringType, true))), true)))
    val byteIdx = media.schema.fieldIndex("bytes")
    spread.mapPartitions { iter =>
      // batch shape: one iterator in, one iterator out — the decoder
      // could hold per-partition state (model handle, codec context)
      iter.map { row =>
        val bytes =
          if (row.isNullAt(byteIdx)) null else row.getAs[Array[Byte]](byteIdx)
        decodeImage(bytes) match {
          case Some((w, h, fmt, hist)) =>
            Row.fromSeq(row.toSeq :+ hist.toSeq :+ Row(w, h, fmt))
          case None =>
            Row.fromSeq(row.toSeq :+ byteHistogram(bytes).toSeq :+ null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Audio feature extraction: per-window RMS energy and zero-crossing
    * rate — the two classic cheap audio descriptors (energy envelope +
    * a crude pitch/noisiness proxy).
    *
    * DECODE is REAL for the containers the JDK ships codecs for:
    * `javax.sound.sampled.AudioSystem` sniffs WAV/AIFF/AU payloads and
    * decodes linear PCM (8/16-bit, any endianness, any channel count —
    * channels are mean-downmixed to mono) and, via the JDK's
    * conversion providers, A-law/µ-law. Container-decoded rows carry a
    * non-null `decoded` struct with the source format's sample rate /
    * channels / bits / encoding. Payloads NO JDK codec accepts
    * (MP3/OGG/FLAC/raw captures) fall back to the deterministic
    * 16-bit little-endian PCM interpretation with a NULL `decoded` —
    * the same honest-boundary posture as the image path's ImageIO
    * fallback. Swapping in a richer decoder changes ONLY the
    * bytes→samples step inside the kernel; the Spark plumbing
    * (schema, batching, partition spreading, null posture) is the
    * production shape and is what the spec tests.
    *
    * Output: `audio` = array<struct<rms float, zcr float>> of
    * ⌈samples/windowSamples⌉ windows (empty array for empty/null
    * payloads — absence of signal, not an error), plus `decoded` =
    * struct<sample_rate float, channels int, bits int, encoding
    * string> (null on the raw-PCM fallback).
    */
  def audioFeatures(
      media: DataFrame, windowSamples: Int = 1024,
      minPartitions: Option[Int] = None): DataFrame = {
    require(windowSamples >= 2, s"windowSamples must be ≥ 2, got $windowSamples")
    val target = minPartitions.getOrElse(
      media.sparkSession.sparkContext.defaultParallelism)
    val spread =
      if (media.rdd.getNumPartitions < target) media.repartition(target)
      else media
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("audio", ArrayType(StructType(Seq(
        StructField("rms", FloatType, false),
        StructField("zcr", FloatType, false))), containsNull = false), false),
      StructField("decoded", StructType(Seq(
        StructField("sample_rate", FloatType, true),
        StructField("channels", IntegerType, true),
        StructField("bits", IntegerType, true),
        StructField("encoding", StringType, true))), true)))
    val byteIdx = media.schema.fieldIndex("bytes")
    spread.mapPartitions { iter =>
      iter.map { row =>
        val bytes =
          if (row.isNullAt(byteIdx)) null else row.getAs[Array[Byte]](byteIdx)
        decodeAudio(bytes) match {
          case Some((mono, rate, ch, bits, enc)) =>
            Row.fromSeq(row.toSeq :+ windowFeatures(mono, windowSamples) :+
              Row(rate, ch, bits, enc))
          case None =>
            Row.fromSeq(row.toSeq :+ pcmWindows(bytes, windowSamples) :+ null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Container decode via the JDK's sampled-audio stack: bytes →
    * mono samples in [-1, 1] plus the SOURCE format's metadata.
    * Linear PCM (8/16/24/32-bit, both endiannesses, unsigned or
    * signed, n channels) decodes directly; non-linear encodings
    * (A-law/µ-law) route through `AudioSystem`'s converter to 16-bit
    * signed PCM first. Returns None for payloads no installed reader accepts —
    * the caller's raw-PCM fallback keeps the operator total.
    */
  private[operators] def decodeAudio(
      bytes: Array[Byte]): Option[(Array[Double], Float, Int, Int, String)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    import AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
    if (bytes == null || bytes.length < 12) return None
    // container-magic gate before touching AudioSystem: the JDK's
    // readers accept exactly RIFF/WAVE, FORM/AIFF(-C) and .snd (AU);
    // sniffing via getAudioInputStream on a NON-container payload
    // costs an exception + SPI iteration per row — measured 3× on the
    // audio bench query at sf0.1 — for a rejection this comparison
    // gets for free
    val isContainer =
      (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F') ||
      (bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' &&
        bytes(3) == 'M') ||
      (bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' &&
        bytes(3) == 'd')
    if (!isContainer) return None
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f0 = in.getFormat
        // linear PCM at any whole-byte width (8/16/24/32-bit) decodes
        // directly via the generic sample loop below — a valid 24-bit
        // WAV must never fall through to the raw-PCM reinterpretation
        // of its whole container; only non-linear encodings
        // (A-law/µ-law) go through AudioSystem's converter, which the
        // JDK is guaranteed to provide for them
        val direct =
          (f0.getEncoding == PCM_SIGNED || f0.getEncoding == PCM_UNSIGNED) &&
            f0.getSampleSizeInBits % 8 == 0 &&
            f0.getSampleSizeInBits >= 8 && f0.getSampleSizeInBits <= 32
        val (stream, fmt) =
          if (direct)
            (in, f0)
          else {
            val target = new AudioFormat(PCM_SIGNED, f0.getSampleRate, 16,
              f0.getChannels, 2 * f0.getChannels, f0.getSampleRate, false)
            (AudioSystem.getAudioInputStream(target, in), target)
          }
        val raw = stream.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        if (ch < 1 || bits % 8 != 0 || bits < 8 || bits > 32) return None
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * ch
        val nFrames = raw.length / frameBytes
        val signed = fmt.getEncoding == PCM_SIGNED
        val big = fmt.isBigEndian
        val scale = (1L << (bits - 1)).toDouble
        val mono = new Array[Double](nFrames)
        var i = 0
        while (i < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val off = i * frameBytes + c * bytesPerSample
            // assemble the sample most-significant-byte first, then
            // sign-extend (signed) or re-center (unsigned)
            var u = 0L
            var k = 0
            while (k < bytesPerSample) {
              val idx = off + (if (big) k else bytesPerSample - 1 - k)
              u = (u << 8) | (raw(idx) & 0xffL)
              k += 1
            }
            val v =
              if (signed) (u << (64 - bits)) >> (64 - bits)
              else u - (1L << (bits - 1))
            acc += v / scale
            c += 1
          }
          mono(i) = acc / ch
          i += 1
        }
        Some((mono, f0.getSampleRate, f0.getChannels, f0.getSampleSizeInBits,
          f0.getEncoding.toString))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // no conversion provider
    }
  }

  /** Raw fallback: bytes as 16-bit LE PCM → per-window features,
    * streamed straight off the byte array (no samples materialized —
    * this is the hot path for every non-container payload). Pure,
    * deterministic, total (any byte string is readable as PCM).
    */
  private[graft] def pcmWindows(
      bytes: Array[Byte], windowSamples: Int): Seq[Row] = {
    if (bytes == null || bytes.length < 2) return Seq.empty
    val nSamples = bytes.length / 2
    val out = Seq.newBuilder[Row]
    var w = 0
    while (w < nSamples) {
      val end = math.min(w + windowSamples, nSamples)
      var sumSq = 0.0
      var crossings = 0
      var prevNeg = false
      var i = w
      while (i < end) {
        // 16-bit little-endian signed sample, normalized to [-1, 1]
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort / 32768.0
        sumSq += s * s
        val neg = s < 0
        if (i > w && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      val n = end - w
      out += Row(
        math.sqrt(sumSq / n).toFloat,
        if (n > 1) crossings.toFloat / (n - 1) else 0f)
      w += windowSamples
    }
    out.result()
  }

  /** The descriptor kernel over DECODED mono samples: per-window
    * (rms ∈ [0,1], zcr ∈ [0,1]) — same fold as [[pcmWindows]].
    */
  private[operators] def windowFeatures(
      samples: Array[Double], windowSamples: Int): Seq[Row] = {
    val nSamples = samples.length
    if (nSamples == 0) return Seq.empty
    val out = Seq.newBuilder[Row]
    var w = 0
    while (w < nSamples) {
      val end = math.min(w + windowSamples, nSamples)
      var sumSq = 0.0
      var crossings = 0
      var prevNeg = false
      var i = w
      while (i < end) {
        val s = samples(i)
        sumSq += s * s
        val neg = s < 0
        if (i > w && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      val n = end - w
      out += Row(
        math.sqrt(sumSq / n).toFloat,
        if (n > 1) crossings.toFloat / (n - 1) else 0f)
      w += windowSamples
    }
    out.result()
  }

  /** Per-row LOB export — the write-back half of the reference's
    * Import/Export Column (…/Глава 05…md:98: one FILE per row's binary
    * column). Each task writes its partition's payloads straight to
    * `outDir/<id>.<ext>` through the Hadoop FileSystem API (no driver
    * round-trip, no two-phase commit: each file is self-named by its
    * row id, so re-runs overwrite idempotently) and the returned
    * manifest carries one row per exported file. At 100 TB the export
    * parallelizes as a narrow map over the source partitions; callers
    * control file count by filtering/repartitioning the input.
    * Duplicate ids collapse to one file (last writer wins) while the
    * manifest keeps one row per INPUT row — dedupe upstream when ids
    * are not unique.
    */
  def exportFiles(media: DataFrame, idCol: String, payloadCol: String,
      outDir: String, ext: String = "bin"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    media.select(col(idCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        val dir = new org.apache.hadoop.fs.Path(outDir)
        // raw FS: skip ChecksumFileSystem's per-file .crc sibling —
        // it doubles small-file create cost and the payload integrity
        // is the manifest/roundtrip's job, not the transport's
        val fs = dir.getFileSystem(conf.value) match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case f => f
        }
        rows.map { case (id, bytes) =>
          // fail BEFORE any byte is written: a null id would collapse
          // every null-id row onto one "null.<ext>" file and a null
          // payload would NPE mid-partition, leaving earlier files on
          // disk with no complete manifest — refuse the whole task
          if (id == null || bytes == null) throw new IllegalArgumentException(
            s"exportFiles: null ${if (id == null) "id" else "payload"} row " +
              "— filter nulls upstream (WHERE id IS NOT NULL AND " +
              "payload IS NOT NULL) or fix the source")
          val p = fs.makeQualified(
            new org.apache.hadoop.fs.Path(dir, s"$id.$ext"))
          val out = fs.create(p, true)
          try out.write(bytes) finally out.close()
          (id, p.toString, bytes.length.toLong)
        }
      }
      .toDF(idCol, "path", "n_bytes")
  }

  /** Frame sampling stub: split the payload into `frames` equal chunks
    * and keep every `stride`-th — the Spark-side shape of video frame
    * extraction (explode to one row per sampled frame).
    */
  def sampleFrames(media: DataFrame, frames: Int, stride: Int): DataFrame =
    media
      .withColumn("__len", length(col("bytes")))
      .withColumn("frame_idx",
        explode(filter(
          sequence(lit(0), lit(frames - 1)),
          i => i % stride === 0)))
      .withColumn("frame_bytes",
        expr(s"substring(bytes, cast(frame_idx * (__len div $frames) + 1 as int), " +
          s"cast(__len div $frames as int))"))
      .drop("__len")
}
