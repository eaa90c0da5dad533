package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Catalog

/** Multimodal-column plumbing (SURVEY §2.9 / BASELINE north star): treat
  * media payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a BATCHED per-partition stage — the Spark
  * shape a real image/audio pipeline uses (arrow-batched UDF or
  * mapPartitions with a per-partition decoder handle).
  *
  * The generic decode step is a STUB — this container has no native
  * image/audio codecs — implemented as a deterministic pure function of
  * the payload bytes so the whole pipeline stays testable end-to-end and
  * oracle-checkable. Swapping `decodeStub` for a real codec (JNI/FFM
  * decoder initialized once per partition, amortized over the iterator)
  * changes no schema, partitioning, or plan shape. Since r14 that swap
  * is PROVEN, not prose: [[decodeReal]] runs an actual
  * `javax.imageio` PNG/BMP encode→decode roundtrip (pure-JVM codecs —
  * present everywhere) through the identical mapPartitions slot, and
  * `mm_decode_real` is fully hash-oracled because the synthesized
  * rasters follow a closed-form pixel formula the SQL oracle replays
  * without decoding.
  */
object MultimodalOps {

  /** One media record: id + opaque payload + declared kind. The harness has
    * no binary tables, so payloads are synthesized from `documents.text`
    * bytes — schema and flow are what matter. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], kind: String)

  /** Decoded metadata + feature vector. */
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 width: Long, height: Long,
                                 features: Array[Float])

  private val Formats = Array("jpeg", "png", "webp")

  /** STUB decoder: deterministic pure function of the payload. A real
    * implementation decodes the container header (width/height/format) and
    * runs feature extraction; every derived value here is reproducible
    * integer arithmetic on the byte length so the DuckDB oracle can verify
    * the pipeline end-to-end. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    val format = Formats((n % 3).toInt)
    val width = 64 + (n * 31) % 960
    val height = 64 + (n * 17) % 960
    // fake 8-dim feature vector, deterministic in n
    val feats = Array.tabulate(8)(i => ((n * (i + 1)) % 997).toFloat / 997f)
    MediaFeatures(r.doc_id, format, n, width, height, feats)
  }

  /** One REAL media record: id + actual PNG/BMP container bytes + the
    * container format. */
  final case class RealMediaRecord(doc_id: Long, payload: Array[Byte],
                                   fmt: String)

  /** REAL decode output: container format, encoded size, decoded
    * dimensions, and the exact decoded-pixel sum (the roundtrip proof —
    * it only matches the oracle if the codec reproduced every sample). */
  final case class RealDecoded(doc_id: Long, format: String, n_bytes: Long,
                               width: Long, height: Long, sum_pixels: Long)

  /** documents → REAL media records: a deterministic grayscale raster is
    * synthesized per document (w = 8 + n_chars % 32,
    * h = 8 + (7·n_chars) % 32, pixel(x,y) = (31x + 17y + doc_id) % 256)
    * and ENCODED with `javax.imageio` — PNG for even doc_ids, BMP for
    * odd — inside mapPartitions (encoder state per partition;
    * `ImageIO.setUseCache(false)` keeps streams heap-only, no temp-file
    * I/O per row). The payloads are genuine container bytes: magic
    * numbers, headers, zlib streams — not arithmetic stand-ins. */
  def realMediaRecords(spark: SparkSession, dir: String)
      : Dataset[RealMediaRecord] = {
    import spark.implicits._
    Catalog.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long"))
      // r19 (guide §2 parallelism floor, the VectorOps.emb precedent):
      // the documents table arrives as 1–4 parquet splits, which pinned
      // every downstream codec mapPartitions to 1–4 tasks; fan the
      // 16-byte (doc_id, n_chars) METADATA rows — never payloads — out
      // to cluster width on the deterministic doc_id key before the
      // synth+encode. Per-row output is a pure function of the row, so
      // results are partitioning-independent.
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val w = (8 + nChars % 32).toInt
          val h = (8 + (nChars * 7) % 32).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((x * 31 + y * 17 + id) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val fmt = if (id % 2 == 0) "png" else "bmp"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          RealMediaRecord(id, bos.toByteArray, fmt)
        }
      }
  }

  /** The REAL decode stage (r12-VERDICT item "real media decode"): an
    * actual `javax.imageio` PNG/BMP DECODE of genuine container bytes in
    * the same mapPartitions slot the stub documents — per-partition
    * decoder configuration, embarrassingly parallel, no shuffle. Output
    * carries the decoded dimensions and the exact decoded-pixel sum:
    * both PNG and BMP are lossless for 8-bit gray, so the sum matches
    * the synthesis formula bit-for-bit — which is what makes
    * `mm_decode_real` hash-oracle-able (the SQL replays the closed-form
    * pixel arithmetic; Spark must survive a real encode→decode roundtrip
    * to agree). At 100 TB this stage is the narrow per-asset decode pass
    * of a crawl pipeline: codec handles amortized per partition, pixels
    * never shuffled, only O(1) features emitted per asset. */
  def decodeReal(spark: SparkSession, dir: String): Dataset[RealDecoded] = {
    import spark.implicits._
    realMediaRecords(spark, dir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        RealDecoded(r.doc_id, r.fmt, r.payload.length.toLong, w.toLong,
          h.toLong, s)
      }
    }
  }

  /** Oracle-facing projection of [[decodeReal]]: the encoded byte count
    * is codec-version-dependent (PNG zlib settings) and stays out of the
    * compared columns; format, dimensions, and the exact pixel sum are
    * deterministic and hash-checked. */
  def decodeRealQuery(spark: SparkSession, dir: String): DataFrame =
    decodeReal(spark, dir)
      .select("doc_id", "format", "width", "height", "sum_pixels")
      .orderBy("doc_id")

  /** REAL resize output: decoded source dims, the fixed thumbnail dims,
    * and the exact resized-pixel sum (the proof the resize read the
    * genuinely decoded raster, not the synthesis formula). */
  final case class RealResized(doc_id: Long, width: Long, height: Long,
                               out_w: Long, out_h: Long, sum_resized: Long)

  /** The REAL resize stage (closing `mm_resize_stub`'s marked slot the
    * way [[decodeReal]] closed the decode stub): a nearest-neighbor
    * downsample of the GENUINELY DECODED raster to a fixed out×out
    * thumbnail, inside the same mapPartitions slot as the decode —
    * srcX = x·w/out, srcY = y·h/out (integer floor indices, the
    * canonical NN mapping), so the oracle can replay the sampled
    * coordinates in closed form while Spark must survive a real
    * encode→decode→resample chain to agree. At 100 TB this is the
    * thumbnail pass of a crawl pipeline: codec handles per partition,
    * pixels never shuffled, O(out²) work and O(1) features per asset. */
  def resizeReal(spark: SparkSession, dir: String,
                 out: Int = 16): Dataset[RealResized] = {
    import spark.implicits._
    realMediaRecords(spark, dir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var s = 0L
        var y = 0
        while (y < out) {
          val sy = y * h / out
          var x = 0
          while (x < out) { s += raster.getSample(x * w / out, sy, 0); x += 1 }
          y += 1
        }
        RealResized(r.doc_id, w.toLong, h.toLong, out.toLong, out.toLong, s)
      }
    }
  }

  /** Oracle-facing projection of [[resizeReal]]: dims + the exact
    * resized-pixel sum (all deterministic; the encoded byte count stays
    * out, as in [[decodeRealQuery]]). */
  def resizeRealQuery(spark: SparkSession, dir: String): DataFrame =
    resizeReal(spark, dir)
      .select("doc_id", "width", "height", "out_w", "out_h", "sum_resized")
      .orderBy("doc_id")

  /** Per-asset REAL-raster aHash as four 16-bit blocks. */
  final case class RealPhash(doc_id: Long, b0: Long, b1: Long,
                             b2: Long, b3: Long)

  /** REAL-raster perceptual hash (average hash) — the [[phashDedup]]
    * hash slot upgraded from the stub decoder's arithmetic to the
    * GENUINELY DECODED pixels: the 8×8 nearest-neighbor thumbnail of
    * the decoded raster ([[resizeReal]]'s sampling), each cell's bit =
    * whether its pixel clears the thumbnail mean (the classic aHash),
    * packed as the same FOUR 16-bit blocks the exact-group and
    * hamming-band stages band on. The mean comparison is INTEGER
    * (pixel·64 > sum — no division, no floats anywhere), so the oracle
    * replays the bits in closed form at the sampled coordinates while
    * Spark must survive the real encode→decode→resample chain.
    * Per-partition codec config, no shuffle, O(64) work per asset past
    * the decode. Bit order: k = y·8 + x, block k/16, bit k%16. */
  def phashRealBlocks(spark: SparkSession, dir: String)
      : Dataset[RealPhash] = {
    import spark.implicits._
    realMediaRecords(spark, dir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val px = new Array[Int](64)
        var sum = 0L
        var k = 0
        var y = 0
        while (y < 8) {
          val sy = y * h / 8
          var x = 0
          while (x < 8) {
            val p = raster.getSample(x * w / 8, sy, 0)
            px(k) = p; sum += p; k += 1; x += 1
          }
          y += 1
        }
        val blocks = new Array[Long](4)
        k = 0
        while (k < 64) {
          if (px(k).toLong * 64L > sum) blocks(k / 16) |= 1L << (k % 16)
          k += 1
        }
        RealPhash(r.doc_id, blocks(0), blocks(1), blocks(2), blocks(3))
      }
    }
  }

  /** Oracle-facing projection of [[phashRealBlocks]]: per-asset blocks
    * plus the exact-duplicate group size per full hash (the
    * [[phashDedup]] read over the real hash — a shared-raster pair
    * shows as n_dups ≥ 2). The group rollup keys on the 8-byte hash:
    * map-side combinable, O(assets). */
  def phashRealQuery(spark: SparkSession, dir: String): DataFrame = {
    val hdf = phashRealBlocks(spark, dir).toDF()
    val groups = hdf.groupBy("b0", "b1", "b2", "b3")
      .agg(count(lit(1)).as("n_dups"))
    hdf.join(groups, Seq("b0", "b1", "b2", "b3"))
      .select("doc_id", "b0", "b1", "b2", "b3", "n_dups")
      .orderBy("doc_id")
  }

  /** One REAL audio record: id + actual RIFF/WAVE container bytes. */
  final case class RealAudioRecord(doc_id: Long, payload: Array[Byte])

  /** REAL audio decode output: container-reported rate/depth, decoded
    * frame count, and the exact decoded-sample sums (the roundtrip
    * proof — they only match the oracle if the codec reproduced every
    * 16-bit sample). */
  final case class RealAudioDecoded(doc_id: Long, n_samples: Long,
                                    sample_rate: Long, bits: Long,
                                    sum_samples: Long, sum_abs: Long)

  /** documents → REAL audio records: a deterministic 16-bit PCM mono
    * signal is synthesized per document
    * (n = 64 + n_chars % 256 samples,
    * sample(i) = (31·doc_id + 131·i) mod 65536 − 32768) and ENCODED
    * with `javax.sound.sampled` as a genuine RIFF/WAVE container
    * (PCM_SIGNED 16-bit LE mono 16 kHz) inside mapPartitions — the
    * audio twin of [[realMediaRecords]]'s ImageIO path. The payloads
    * are real WAV bytes: RIFF magic, fmt/data chunks — not arithmetic
    * stand-ins. */
  def realAudioRecords(spark: SparkSession, dir: String)
      : Dataset[RealAudioRecord] = {
    import spark.implicits._
    Catalog.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long"))
      // DELIBERATELY NOT fanned out like realMediaRecords (r19,
      // measured): javax.sound's AudioSystem entry points take a
      // synchronized provider-registry lookup PER CALL, and the WAV
      // synth itself is a few hundred samples — at 32 concurrent tasks
      // the lock convoy made every audio face 2–2.3× SLOWER than the
      // 4-split scan (bench: mm_audio_rms_real 0.75 → 1.77 s). A real
      // audio pipeline decodes through a per-task codec handle
      // (guide §4.5), where the fan-out would win; javax.sound cannot
      // amortize its registry, so input-split width is the right
      // local shape.
      .as[(Long, Long)]
      .mapPartitions { it =>
        import javax.sound.sampled._
        // encoder format handle per partition, amortized over the iterator
        val fmt = new AudioFormat(16000f, 16, 1, true, false)
        it.map { case (id, nChars) =>
          val n = (64 + nChars % 256).toInt
          val raw = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = (((id * 31 + i.toLong * 131) % 65536) - 32768).toInt
            raw(2 * i) = (v & 0xff).toByte        // little-endian lo
            raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          RealAudioRecord(id, bos.toByteArray)
        }
      }
  }

  /** The REAL audio decode stage (r14-VERDICT item 6): an actual
    * `javax.sound.sampled` WAV DECODE of genuine container bytes in the
    * same mapPartitions slot — per-partition codec handles, no shuffle,
    * O(1) features out per asset. Emits the container-REPORTED rate and
    * bit depth plus the decoded 16-bit samples' sum and |sum| — WAV PCM
    * is lossless, so both sums match the synthesis formula bit-for-bit,
    * which is what makes `mm_decode_audio_real` hash-oracle-able (the
    * SQL replays the closed-form sample arithmetic; Spark must survive
    * a real encode→decode roundtrip to agree). At 100 TB this is the
    * narrow per-asset decode pass of an audio crawl pipeline. */
  def decodeAudioReal(spark: SparkSession, dir: String)
      : Dataset[RealAudioDecoded] = {
    import spark.implicits._
    realAudioRecords(spark, dir).mapPartitions { it =>
      import javax.sound.sampled._
      it.map { r =>
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = ais.getFormat
        require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
          !f.isBigEndian, s"unexpected decoded format: $f")
        val n = ais.getFrameLength.toInt
        val bytes = new Array[Byte](n * 2)
        var off = 0
        while (off < bytes.length) {
          val k = ais.read(bytes, off, bytes.length - off)
          require(k > 0, s"short read at $off/${bytes.length}")
          off += k
        }
        var (s, sa) = (0L, 0L)
        var i = 0
        while (i < n) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
          s += v; sa += math.abs(v.toLong)
          i += 1
        }
        RealAudioDecoded(r.doc_id, n.toLong, f.getSampleRate.toLong,
          f.getSampleSizeInBits.toLong, s, sa)
      }
    }
  }

  /** Oracle-facing projection of [[decodeAudioReal]] (all columns are
    * deterministic; the WAV container byte count would be too, but the
    * image face's contract — codec-identity columns only — is kept). */
  def decodeAudioRealQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAudioReal(spark, dir)
      .select("doc_id", "n_samples", "sample_rate", "bits",
        "sum_samples", "sum_abs")
      .orderBy("doc_id")

  final case class RealAudioFrame(doc_id: Long, frame: Long, n: Long,
                                  energy: Long)

  /** Per-frame ENERGY over the REAL decoded WAV — the feature-extract
    * stage after [[decodeAudioReal]]'s decode: frame the decoded 16-bit
    * PCM stream into non-overlapping `frameLen`-sample windows (tail
    * kept) and emit each frame's exact integer sum of squares — the RMS
    * numerator every VAD / silence-trim / loudness-normalization pass
    * starts from. Runs the genuine `javax.sound.sampled` encode→decode
    * roundtrip in the same per-partition codec slot; WAV PCM is
    * lossless and the energies are pure int64 arithmetic, so the oracle
    * replays the closed-form synthesis formula and Spark must survive a
    * real roundtrip to agree. O(samples) work, O(frames) rows out, no
    * shuffle before the harness orderBy. */
  def audioRmsReal(spark: SparkSession, dir: String,
                   frameLen: Int = 32): Dataset[RealAudioFrame] = {
    import spark.implicits._
    realAudioRecords(spark, dir).mapPartitions { it =>
      import javax.sound.sampled._
      it.flatMap { r =>
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = ais.getFormat
        require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
          !f.isBigEndian, s"unexpected decoded format: $f")
        val n = ais.getFrameLength.toInt
        val bytes = new Array[Byte](n * 2)
        var off = 0
        while (off < bytes.length) {
          val k = ais.read(bytes, off, bytes.length - off)
          require(k > 0, s"short read at $off/${bytes.length}")
          off += k
        }
        (0 until (n + frameLen - 1) / frameLen).map { fi =>
          var e = 0L
          var c = 0L
          var i = fi * frameLen
          val end = math.min(n, i + frameLen)
          while (i < end) {
            val v =
              ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
            e += v.toLong * v.toLong
            c += 1
            i += 1
          }
          RealAudioFrame(r.doc_id, fi.toLong, c, e)
        }
      }
    }
  }

  /** Oracle-facing projection of [[audioRmsReal]]. */
  def audioRmsRealQuery(spark: SparkSession, dir: String): DataFrame =
    audioRmsReal(spark, dir).toDF()
      .orderBy("doc_id", "frame")

  final case class RealAudioZcr(doc_id: Long, frame: Long, n_pairs: Long,
                                crossings: Long)

  /** Per-frame ZERO-CROSSING counts over the REAL decoded WAV — the
    * second classic VAD/pitch feature next to [[audioRmsReal]]'s
    * energy (a voiced frame is high-energy/low-ZCR, fricatives and
    * noise the reverse): for each non-overlapping `frameLen`-sample
    * frame, the number of adjacent sample pairs (both endpoints inside
    * the frame) whose signs differ, sign = `v < 0` (zero counts as
    * non-negative). Pure INTEGER comparisons on the genuinely decoded
    * 16-bit PCM — no arithmetic on the samples at all, so the oracle
    * (which replays the closed-form synthesis at each index) agrees
    * bit-for-bit only if the real encode→decode roundtrip reproduced
    * every sample. Same per-partition codec slot as the decode stage:
    * O(samples) work, O(frames) rows, no shuffle before the harness
    * orderBy. */
  def audioZcrReal(spark: SparkSession, dir: String,
                   frameLen: Int = 32): Dataset[RealAudioZcr] = {
    import spark.implicits._
    realAudioRecords(spark, dir).mapPartitions { it =>
      it.flatMap { r =>
        val samples = decodePcm16(r.payload)
        val n = samples.length
        (0 until (n + frameLen - 1) / frameLen).map { fi =>
          val start = fi * frameLen
          val end = math.min(n, start + frameLen)
          var c = 0L
          var i = start + 1
          while (i < end) {
            if ((samples(i) < 0) != (samples(i - 1) < 0)) c += 1
            i += 1
          }
          RealAudioZcr(r.doc_id, fi.toLong,
            math.max(end - start - 1, 0).toLong, c)
        }
      }
    }
  }

  /** Oracle-facing projection of [[audioZcrReal]]. */
  def audioZcrRealQuery(spark: SparkSession, dir: String): DataFrame =
    audioZcrReal(spark, dir).toDF()
      .orderBy("doc_id", "frame")

  /** Shared 16-bit mono LE WAV → samples decode (the loop
    * [[decodeAudioReal]] and [[audioRmsReal]] inline): real
    * `javax.sound.sampled` container parse + full sample read. */
  private def decodePcm16(payload: Array[Byte]): Array[Short] = {
    import javax.sound.sampled._
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
      !f.isBigEndian, s"unexpected decoded format: $f")
    val n = ais.getFrameLength.toInt
    val bytes = new Array[Byte](n * 2)
    var off = 0
    while (off < bytes.length) {
      val k = ais.read(bytes, off, bytes.length - off)
      require(k > 0, s"short read at $off/${bytes.length}")
      off += k
    }
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  /** One REAL multi-frame container: id + genuine animated-GIF bytes +
    * the encoded frame count. */
  final case class RealVideoRecord(doc_id: Long, payload: Array[Byte],
                                   n_frames: Int)

  /** A sampled, genuinely-decoded frame: container frame count, the
    * sampled index, decoded dims, and the frame's exact pixel sum. */
  final case class RealFrame(doc_id: Long, n_frames: Long, frame_idx: Long,
                             width: Long, height: Long, sum_pixels: Long)

  /** documents → REAL multi-frame containers (the video stand-in this
    * JVM can actually encode): an ANIMATED GIF synthesized per document
    * — `frames = 2 + n_chars % 7` grayscale rasters of
    * `w = 8 + n_chars % 16, h = 8 + (3·n_chars) % 16`, frame f's pixel
    * `(x, y) = (31x + 17y + 19f + doc_id) % 256` — encoded with
    * `javax.imageio`'s GIF sequence writer inside mapPartitions
    * (per-partition encoder handle, `prepareWriteSequence` →
    * `writeToSequence` per frame). Frames use an explicit 256-entry
    * grayscale `IndexColorModel`, so the palette round-trips losslessly
    * and the payloads are genuine multi-frame containers: logical
    * screen descriptor, per-frame image descriptors, LZW streams. */
  def realVideoRecords(spark: SparkSession, dir: String)
      : Dataset[RealVideoRecord] = {
    import spark.implicits._
    Catalog.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long"))
      // metadata fan-out to cluster width before the codec stage — see
      // realMediaRecords (r19)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val grayCmap = Array.tabulate(256)(i =>
          (0xff << 24) | (i << 16) | (i << 8) | i)
        val icm = new java.awt.image.IndexColorModel(
          8, 256, grayCmap, 0, false, -1,
          java.awt.image.DataBuffer.TYPE_BYTE)
        it.map { case (id, nChars) =>
          val nFrames = (2 + nChars % 7).toInt
          val w = (8 + nChars % 16).toInt
          val h = (8 + (nChars * 3) % 16).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  ((x * 31 + y * 17 + f * 19 + id) % 256).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          RealVideoRecord(id, bos.toByteArray, nFrames)
        }
      }
  }

  /** REAL frame sampling (closing `mm_frame_sample`'s stub slot the way
    * [[decodeReal]]/[[decodeAudioReal]] closed theirs): per container,
    * `ImageReader.getNumImages` reads the REAL frame count out of the
    * container, then ONLY the stride-sampled indices are decoded —
    * `reader.read(i)` is random-access, which is the entire point of
    * frame sampling at scale (a 10 000-frame asset sampled every 300
    * frames decodes 34 frames, not 10 000). Each sampled frame's exact
    * pixel sum is read via palette-independent `getRGB` (the GIF writer
    * may permute the color table; colors, not indices, are the
    * contract). GIF's LZW is lossless, so the oracle replays the
    * closed-form synthesis at the sampled (frame, x, y) coordinates and
    * Spark only agrees if the real container round-trip — multi-frame
    * encode, frame-count read, random-access decode — is faithful.
    * Scale: same narrow per-asset mapPartitions slot as every codec
    * stage; per-partition reader handle; O(sampled frames) rows out; no
    * shuffle before the harness orderBy. */
  def frameSampleReal(spark: SparkSession, dir: String,
                      stride: Int = 3): Dataset[RealFrame] = {
    import spark.implicits._
    realVideoRecords(spark, dir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val out = (0 until n by stride).map { fi =>
          val img = reader.read(fi)
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += (img.getRGB(x, y) & 0xff); x += 1 }
            y += 1
          }
          RealFrame(r.doc_id, n.toLong, fi.toLong, w.toLong, h.toLong, s)
        }
        iis.close()
        out
      }
    }
  }

  /** Oracle-facing projection of [[frameSampleReal]]. */
  def frameSampleRealQuery(spark: SparkSession, dir: String,
                           stride: Int = 3): DataFrame =
    frameSampleReal(spark, dir, stride).toDF()
      .orderBy("doc_id", "frame_idx")

  /** documents → media records: payload = UTF-8 bytes of the text. */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Catalog.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("image").as("kind"))
      .as[MediaRecord]
  }

  /** The decode stage: mapPartitions so a real decoder would be initialized
    * once per partition and amortized across the iterator (the Scala analog
    * of a pandas-batched UDF). Narrow — no shuffle; partitioning is
    * whatever the scan gave us, which is correct for an embarrassingly
    * parallel decode. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaRecords(spark, dir).mapPartitions { it =>
      // real pipeline: val decoder = Codec.open() — once per partition
      it.map(decodeStub)
    }
  }

  /** Oracle-facing projection: scalar metadata per record (the feature
    * array is exercised by the test suite; DuckDB compares the scalars). */
  def decodeStubQuery(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .select("doc_id", "format", "n_bytes", "width", "height")
      .orderBy("doc_id")

  /** Resize planning for image-kind payloads: aspect-preserving fit to a
    * target box (STUB: pure integer arithmetic on the decoded dimensions;
    * a real implementation hands (payload, out_w, out_h) to the codec in
    * the same mapPartitions stage as the decode). */
  def resizeQuery(spark: SparkSession, dir: String,
                  target: Long = 224): DataFrame = {
    import spark.implicits._
    decodeFeatures(spark, dir)
      .map { f =>
        // fit the longer edge to `target`, scale the other proportionally
        val (ow, oh) =
          if (f.width >= f.height) (target, (f.height * target) / f.width)
          else ((f.width * target) / f.height, target)
        (f.doc_id, f.width, f.height, ow, oh)
      }
      .toDF("doc_id", "width", "height", "out_w", "out_h")
      .orderBy("doc_id")
  }

  /** Perceptual-hash dedup groups over the decoded media features — the
    * multimodal fast-path dedup a crawl pipeline runs before any
    * pairwise comparison: one 64-bit pHash per asset, exact-hash groups
    * are duplicates. The hash here is the STUB decoder's analog of a
    * DCT pHash: 64 threshold bits derived from the deterministic
    * decoded feature arithmetic (bit j = whether (n·(j+1)) mod 997
    * lands in the upper half), carried as four 16-bit blocks — the same
    * layout `TextOps.dedupSimhash` bands on, so a hamming-band near-dup
    * stage composes directly if the real codec's pHash needs it.
    *
    * Scale: decode is the narrow mapPartitions stage; the hash is pure
    * codegen'd integer arithmetic per row; the group step shuffles an
    * 8-byte-equivalent key with map-side combine — O(assets), no pair
    * explosion anywhere. */
  /** Per-asset pHash as four 16-bit blocks (the [[phashDedup]] /
    * [[phashNearDup]] shared hash table — one definition so exact and
    * near dedup cannot band on different hashes). */
  /** The block-bit arithmetic over an explicit (doc_id, n) table — ONE
    * definition for the session path (n from the [[decodeFeatures]]
    * mapPartitions stage) and the ingest-maintained index table
    * ([[graft.streaming.FeatureIndex]] writes the blocks per batch; the
    * hash is a per-row function of the payload, so batch-partitioned
    * append IS the correct incremental maintenance — the word_counts
    * argument). */
  private[graft] def phashBlocksOf(withN: DataFrame): DataFrame = {
    def block(b: Int) = (0 until 16).map { r =>
      when(pmod(col("n") * (16 * b + r + 1), lit(997L)) >= 498,
        lit(1L << r)).otherwise(lit(0L))
    }.reduce(_ + _)
    withN.select(col("doc_id"), block(0).as("b0"), block(1).as("b1"),
      block(2).as("b2"), block(3).as("b3"))
  }

  /** [[phashBlocksOf]] over a (doc_id, text) batch — the index write
    * path's entry: n = the stub payload's byte length (the UTF-8 bytes
    * [[mediaRecords]] synthesizes), computed as `octet_length` so the
    * indexed blocks equal the session-decoded ones bit-for-bit (parity
    * suite-pinned via the `index_mm_phash_incremental` face). */
  private[graft] def phashBlocksOfText(docs: DataFrame): DataFrame =
    phashBlocksOf(docs.select(col("doc_id"),
      expr("octet_length(text)").cast("long").as("n")))

  private def phashBlocks(spark: SparkSession, dir: String): DataFrame =
    phashBlocksOf(decodeFeatures(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes").as("n")))

  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    phashBlocks(spark, dir)
      .groupBy("b0", "b1", "b2", "b3")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
      .where(col("n_docs") >= 2)
      .orderBy("b0", "b1", "b2", "b3")
  }

  /** pHash NEAR-dup pairs (hamming ≤ `maxHamming` of 64 bits) — the
    * multimodal sibling of `dedup_simhash`'s banded LSH: with the hash
    * carried as FOUR 16-bit blocks, any pair within hamming ≤ 3 shares
    * at least one identical block (pigeonhole: 4 bands, ≤3 differing
    * bits), so candidates come from four equality band-joins — never an
    * all-pairs scan — and the exact hamming verify (`bit_count` on the
    * XORed blocks, codegen'd integer ops) runs on candidates only.
    *
    * Scale: band keys are 16-bit values; each band join shuffles
    * O(assets) rows with map-side-combinable distinct, and the verify
    * touches only bucket-cohabiting pairs (the text-LSH cost argument;
    * a skewed band bucket is the signal the hash is degenerate, which
    * [[phashDedup]]'s exact groups would already show). Requires
    * maxHamming < 4 — the banding guarantee; a larger radius needs more
    * bands, not a bigger scan. */
  def phashNearDup(spark: SparkSession, dir: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming < 4,
      s"banding guarantees recall only for maxHamming in [1,4): $maxHamming")
    val h = phashBlocks(spark, dir).localCheckpoint(true)
    val bands = h.select(col("doc_id"),
      explode(array(
        struct(lit(0).as("band"), col("b0").as("v")),
        struct(lit(1).as("band"), col("b1").as("v")),
        struct(lit(2).as("band"), col("b2").as("v")),
        struct(lit(3).as("band"), col("b3").as("v")))).as("bv"))
      .select(col("doc_id"), col("bv.band").as("band"), col("bv.v").as("v"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val ha = h.select(col("doc_id").as("id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = h.select(col("doc_id").as("id_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, "id_a").join(hb, "id_b")
      .withColumn("hamming",
        bit_count(expr("a0 ^ c0")) + bit_count(expr("a1 ^ c1")) +
          bit_count(expr("a2 ^ c2")) + bit_count(expr("a3 ^ c3")))
      .where(col("hamming") <= maxHamming && col("hamming") > 0)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Membership flag of the multimodal INCREMENTAL-admission scenario:
    * the same stable md5 doc_id bucket (first 4 hex nibbles mod 10,
    * buckets 8–9) that plays the "newly arrived batch" on the text
    * (`dedup_incremental`) and embedding (`embed_dedup_incremental`)
    * sides — one batch boundary across all three modalities, so a
    * mixed-modality ingest pipeline admits the SAME arriving documents
    * everywhere. A pure function of doc_id: the boundary costs no join
    * and is stable under re-runs and shuffles. */
  private def newAssetFlag: Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 10 >= 8

  /** Multimodal ROLLING-INGEST admission — the pHash incremental
    * near-dup verdicts of an arriving asset batch against the already
    * indexed corpus (the `dedup_incremental` shape applied to
    * [[phashNearDup]]'s pigeonhole bands): per NEW asset whose hash
    * lands within hamming ≤ `maxHamming` (INCLUDING 0 — an arriving
    * exact copy must be rejected at admission too, so the admission
    * face spans the whole dup spectrum the batch faces split) of an
    * indexed asset or an earlier asset of its own batch (smaller
    * doc_id keeps — first arrival wins), the best match: minimum
    * hamming, smallest incumbent id on ties.
    *
    * THE 100 TB shape: the band join is new-side-driven — a candidate
    * exists only where a NEW asset co-buckets with something, so
    * admission work is proportional to the batch, never the corpus;
    * in production the left side IS the persisted `mm_phash` index
    * table, and [[graft.streaming.FeatureIndex.indexedMmPhashIncremental]]
    * proves that read path against this same oracle (row-for-row
    * parity suite-pinned). Recall is not weakened vs the full face:
    * the candidate set is the band self-join restricted to new right
    * sides, so every ≤-radius pair with a new member survives banding
    * exactly when the full pigeonhole join finds it. */
  def phashIncremental(spark: SparkSession, dir: String,
                       maxHamming: Int = 3): DataFrame =
    phashIncrementalFromBlocks(
      phashBlocks(spark, dir).localCheckpoint(true), maxHamming)

  /** Per-source admission summary of the multimodal incremental batch —
    * the `dedup_incremental_stats` twin for media: batch size, rejected
    * count, reject ratio per source of the NEW assets (asset metadata
    * comes from the documents table the payloads derive from). The
    * monitoring readout that says whether a source's new media crawl is
    * mostly re-crawl. Scale: the rejected set is the batch-cardinality
    * [[phashIncremental]] output reduced to ids; the rollup is one
    * doc_id-keyed left join + O(#sources) aggregation. */
  def phashIncrementalStats(spark: SparkSession, dir: String,
                            maxHamming: Int = 3): DataFrame = {
    val rejected = phashIncremental(spark, dir, maxHamming)
      .select(col("doc_id")).withColumn("rej", lit(1L))
    Catalog.documents(spark, dir).where(newAssetFlag)
      .select("doc_id", "source")
      .join(rejected, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_new"),
        sum(coalesce(col("rej"), lit(0L))).as("n_rejected"))
      .select(col("source"), col("n_new"), col("n_rejected"),
        q6(col("n_rejected") * lit(1.0) / col("n_new"))
          .as("reject_ratio"))
      .orderBy("source")
  }

  /** The incremental band join + exact verify over an EXPLICIT block
    * table — ONE definition for the session path and the index-served
    * face, so the "in production the left side is the persisted index"
    * claim is a checked contract, not prose (the
    * `incrementalVerifiedFromTables` discipline). */
  private[graft] def phashIncrementalFromBlocks(
      blocks: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"banding guarantees recall only for maxHamming in [0,4): $maxHamming")
    val flagged = blocks.withColumn("is_new", newAssetFlag)
    val bands = flagged.select(col("doc_id"), col("is_new"),
      explode(array(
        struct(lit(0).as("band"), col("b0").as("v")),
        struct(lit(1).as("band"), col("b1").as("v")),
        struct(lit(2).as("band"), col("b2").as("v")),
        struct(lit(3).as("band"), col("b3").as("v")))).as("bv"))
      .select(col("doc_id"), col("is_new"),
        col("bv.band").as("band"), col("bv.v").as("v"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("y.is_new") &&
          (!col("x.is_new") || col("x.doc_id") < col("y.doc_id")))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val ha = blocks.select(col("doc_id").as("id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = blocks.select(col("doc_id").as("id_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val verified = cand.join(ha, "id_a").join(hb, "id_b")
      .withColumn("hamming",
        bit_count(expr("a0 ^ c0")) + bit_count(expr("a1 ^ c1")) +
          bit_count(expr("a2 ^ c2")) + bit_count(expr("a3 ^ c3")))
      .where(col("hamming") <= maxHamming)
    // per-NEW-asset best match: batch-cardinality window, never corpus
    val w = Window.partitionBy("id_b")
      .orderBy(col("hamming").asc, col("id_a").asc)
    verified
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id_b").as("doc_id"), col("id_a").as("dup_of"),
        col("hamming").cast("long").as("hamming"))
      .orderBy("doc_id")
  }

  /** Session-cached (id, label) component labels of the pHash near-dup
    * graph — the multimodal twin of the text/embedding label tables
    * (shared [[GraphOps.connectedComponents]] star-contraction
    * machinery, one cache key, one build shared by clusters/apply). The
    * pair graph is [[phashNearDup]]'s banded candidates + exact-hamming
    * verify PLUS [[phashDedup]]'s exact-collision groups as (keeper,
    * member) star edges: hamming-0 pairs are deliberately excluded from
    * the near-dup face (the two faces partition the dup spectrum), but a
    * CLUSTER closure must see both, or two exact copies whose shared
    * hash sits hamming-2 from a third asset would land in different
    * components depending on which copy the band join surfaced. */
  private def phashLabels(spark: SparkSession, dir: String,
                          maxHamming: Int, maxIters: Int): DataFrame = {
    val near = phashNearDup(spark, dir, maxHamming).select("id_a", "id_b")
    val blocks = phashBlocks(spark, dir)
    val keepers = blocks.groupBy("b0", "b1", "b2", "b3")
      .agg(min("doc_id").as("id_a"))
    // (keeper, member) star per exact-hash group — O(group) edges via a
    // hash-keyed join, never a collected member list (a mega-group of
    // exact copies must not materialize as one row)
    val exact = blocks
      .join(keepers, Seq("b0", "b1", "b2", "b3"))
      .where(col("doc_id") =!= col("id_a"))
      .select(col("id_a"), col("doc_id").as("id_b"))
    GraphOps.connectedComponents(spark, near.unionByName(exact),
      s"mmphash:$dir:$maxHamming:$maxIters", maxIters)
  }

  /** pHash near-dup CLUSTERS — the multimodal dup spectrum closed the
    * way the text ([[graft.operators.TextOps.dedupClusters]]) and
    * embedding sides already are: the banded pair graph (near-dups +
    * exact-collision stars) contracted into connected components,
    * cluster id = min doc_id = the keeper. One row per cluster with its
    * member count. Scale: the pair graph is band-join-sized (never
    * all-pairs), star contraction converges in O(log n) rounds
    * regardless of chain diameter — the GraphOps contract. */
  def phashClusters(spark: SparkSession, dir: String,
                    maxHamming: Int = 3, maxIters: Int = 25): DataFrame =
    GraphOps.clusterSizes(
      phashLabels(spark, dir, maxHamming, maxIters),
      countName = "n_assets")

  /** Asset dup-family SIZE HISTOGRAM: the [[phashClusters]] components
    * rolled into integer ⌊log2 size⌋ buckets — the multimodal twin of
    * `dedup_cluster_sizes` ("a long tail of pairs or a few
    * mega-families", the number that decides whether cluster-keeper or
    * exact-hash dedup carries the volume). `bin()` string-length
    * bucketing, never floating log2. Scale: O(#clusters) rollup on the
    * session-cached label table. */
  def phashClusterSizes(spark: SparkSession, dir: String,
                        maxHamming: Int = 3): DataFrame =
    phashClusters(spark, dir, maxHamming)
      .withColumn("bucket",
        expr("cast(length(bin(n_assets)) - 1 as bigint)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_clusters"), sum("n_assets").as("n_assets"),
        min("n_assets").as("min_size"), max("n_assets").as("max_size"))
      .orderBy("bucket")

  /** The multimodal dedup APPLY — the kept asset set after pHash
    * keeper selection (keeper = min doc_id per component; exact copies
    * enter via the collision-group star edges, so exact dedup is
    * subsumed exactly as jaccard-1.0 pairs are on the text side): every
    * asset except non-keeper cluster members, with the decoded scalar
    * metadata. Anti-join against the session-cached label table, no
    * hint — the label build is checkpointed so AQE sizes it at runtime
    * (the `dedup_apply` contract). The closing orderBy is the oracle
    * harness's determinism contract, not part of the operator. */
  def phashDedupApply(spark: SparkSession, dir: String,
                      maxHamming: Int = 3, maxIters: Int = 25): DataFrame =
    decodeFeatures(spark, dir).toDF()
      .join(phashLabels(spark, dir, maxHamming, maxIters)
          .where(col("id") =!= col("label"))
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id", "format", "n_bytes", "width", "height")
      .orderBy("doc_id")

  /** Frame sampling for video-kind payloads: the payload is treated as a
    * container of fixed-size frames (STUB: 1000 bytes/frame) and every
    * `stride`-th frame index is emitted — the explode-shaped plumbing a
    * real pipeline uses to fan one video row out into per-frame rows for
    * downstream (decode → embed) stages. Narrow until the explode, then
    * embarrassingly parallel; no shuffle. */
  /** AUDIO FRAMING plumbing (the STFT window plan): each asset's payload
    * treated as `n_samples = octet_length` mono samples, split into
    * OVERLAPPING analysis windows of `window` samples every `hop`
    * samples — frame start/end offsets plus a `padded` flag on the tail
    * window that runs past the signal (a real pipeline zero-pads it).
    * Companion to [[frameSampleQuery]]'s stride sampling: same
    * sequence+explode fan-out, no shuffle, the real decode slots into
    * the [[decodeFeatures]] mapPartitions stage.
    *
    * n_windows = 1 + ceil(max(0, n−window)/hop) — every sample is
    * covered and a short signal still yields its one padded window. */
  def audioWindowQuery(spark: SparkSession, dir: String,
                       window: Int = 400, hop: Int = 160): DataFrame = {
    require(window > 0 && hop > 0, s"window/hop must be positive")
    val n = expr("octet_length(payload)").cast("long")
    mediaRecords(spark, dir).toDF()
      .withColumn("n_samples", n)
      .withColumn("n_windows",
        lit(1L) + expr(s"(greatest(n_samples - $window, 0) + $hop - 1) div $hop"))
      .select(col("doc_id"), col("n_samples"), col("n_windows"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("win_idx"))
      .withColumn("start_off", col("win_idx") * hop)
      .withColumn("end_off", col("start_off") + window)
      .withColumn("padded", col("end_off") > col("n_samples"))
      .orderBy("doc_id", "win_idx")
  }

  /** Stratified per-FORMAT cap sampling over the DECODED corpus — the
    * multimodal training-set curation step (keep at most ~`cap` assets
    * per decoded format so one over-crawled container type cannot
    * dominate an epoch): deterministic md5 bucketing on the asset id
    * (no `rand()` — re-runs and engines agree row-for-row; the
    * `source_cap_sample` contract applied downstream of the decode
    * stage). Emits per-format totals and kept counts.
    *
    * Scale: decode stays the narrow mapPartitions stage; the stratum
    * count table is O(#formats) and broadcasts; kept/total is one
    * map-side-combinable rollup — no shuffle of asset payloads. */
  def stratifiedSampleQuery(spark: SparkSession, dir: String,
                            cap: Long = 100): DataFrame = {
    val d = decodeFeatures(spark, dir).toDF()
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000L
    val counts = d.groupBy("format").agg(count(lit(1)).as("n"))
    d.select(col("doc_id"), col("format"), bucket.as("b"))
      .join(broadcast(counts), "format") // O(#formats) side
      .withColumn("kept", col("b") * col("n") < lit(1000L) * cap)
      .groupBy("format")
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("format")
  }

  def frameSampleQuery(spark: SparkSession, dir: String,
                       stride: Int = 10): DataFrame = {
    val nFrames = (expr("octet_length(payload) div 1000") + 1).cast("long")
    mediaRecords(spark, dir).toDF()
      .withColumn("n_frames", nFrames)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .withColumn("frame_offset", col("frame_idx") * 1000)
      .orderBy("doc_id", "frame_idx")
  }
}
