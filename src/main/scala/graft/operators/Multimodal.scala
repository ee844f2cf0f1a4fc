package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batched per partition.
  *
  * Two decode tiers share the same batching shape: `decodeImages` /
  * `resizeImages` run a REAL byte codec ([[ImageCodec]] — PPM and
  * 24-bit BMP header+pixel parsers, pure JVM) over formats it can
  * parse; `decodeFeatures` keeps the deterministic `decodeStub` for
  * mime types whose codecs aren't in this container (JPEG, video).
  * Everything Spark-side is identical between the tiers: the asset
  * schema, the binary column handling, the mapPartitions batching
  * (one decoder init per partition, the way a JNI/FFI codec handle
  * would be held), and the typed output.
  *
  * Scale: payloads never pass through the driver; a real deployment
  * keeps assets in parquet binary columns (or object-store pointers
  * for >~64 MB payloads) partitioned so one partition ≈ one decoder
  * batch; decode parallelism = partition count, and the metadata-only
  * projection reads ZERO payload bytes thanks to parquet column
  * pruning — filters on meta run before any decode.
  */
object Multimodal {

  final case class AssetMeta(mime: String, nBytes: Long, sourceId: Long)
  final case class Asset(id: Long, payload: Array[Byte], meta: AssetMeta)
  final case class DecodedFeatures(
      id: Long, nBytes: Long, checksum: Long, feature: Array[Float])

  /** Wrap a (id, payload) frame into the asset schema with populated
    * metadata — the ingest-side operator. */
  def toAssets(df: DataFrame, id: String, payload: String, mime: String): DataFrame =
    df.select(
      col(id).cast("long").as("id"),
      col(payload).cast("binary").as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(payload).cast("binary")).cast("long").as("nBytes"),
        col(id).cast("long").as("sourceId")).as("meta"))

  /** ??? in spirit — deterministic stand-in for the real codec (e.g.
    * libjpeg/ffmpeg via FFI). Produces a stable checksum + a tiny fake
    * feature vector from the payload bytes so the pipeline shape is
    * testable end-to-end. */
  private[operators] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % TextHash.P
      i += 1
    }
    val feat = Array.tabulate(4) { d =>
      if (payload.length > d) (payload(d) & 0xff) / 255.0f else 0.0f
    }
    (h, feat)
  }

  /** Batched decode: one "decoder" per partition (the expensive init a
    * real codec needs), rows streamed through it. */
  def decodeFeatures(spark: SparkSession, assets: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    assets.select(col("id"), col("payload"), col("meta.nBytes").as("nBytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        // real impl: val decoder = Codec.open(...) once per partition
        rows.map { case (id, payload, nBytes) =>
          val (checksum, feature) = decodeStub(payload)
          DecodedFeatures(id, nBytes, checksum, feature)
        }
      }
  }

  final case class DecodedImage(
      id: Long, width: Int, height: Int, meanRgb: Array[Float], ahash: Long)

  /** REAL decode: parses each payload with [[ImageCodec]] (format
    * dispatched on `meta.mime`) and extracts features over decoded
    * PIXELS — dimensions from the file header, per-channel means, and
    * a perceptual 8x8 average hash. Same mapPartitions batching as
    * `decodeFeatures`; a payload that fails to parse fails the task
    * with the codec's validation message (corrupt-input capture, if
    * wanted, wraps this in the engine's dead-letter split upstream). */
  def decodeImages(spark: SparkSession, assets: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    assets.select(col("id"), col("payload"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mime) =>
          val img = ImageCodec.decode(mime, payload)
          DecodedImage(id, img.width, img.height,
            ImageCodec.meanRgb(img), ImageCodec.ahash64(img))
        }
      }
  }

  final case class PatchHash(id: Long, patch_row: Int, patch_col: Int,
      ahash: Long)

  /** Patch-grid perceptual hashing — the prep step of patch-based
    * image pipelines (ViT-style patch embeddings, regional near-dup):
    * decode ONCE, slice the raster into `grid`×`grid` equal patches,
    * and hash each patch with the same aHash kernel as the full-image
    * path, so regional duplicates (a copied logo, a shared border)
    * band-join exactly like whole images do (`Dedup.hammingJoin` over
    * (patch_row, patch_col, ahash)). Pure per-row fan-out of
    * grid² — stays in the scan stage, no shuffle. Dimensions must be
    * divisible by `grid` (resize first — `resizeImages` — otherwise). */
  def patchAHashes(spark: SparkSession, assets: DataFrame,
      grid: Int): Dataset[PatchHash] = {
    require(grid >= 1, s"grid must be positive, got $grid")
    import spark.implicits._
    assets.select(col("id"), col("payload"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload, mime) =>
          val img = ImageCodec.decode(mime, payload)
          require(img.width % grid == 0 && img.height % grid == 0,
            s"image ${img.width}x${img.height} not divisible into ${grid}x$grid patches")
          val pw = img.width / grid
          val ph = img.height / grid
          for (pr <- 0 until grid; pc <- 0 until grid) yield {
            val rgb = new Array[Byte](pw * ph * 3)
            var y = 0
            while (y < ph) {
              System.arraycopy(img.rgb,
                (((pr * ph + y) * img.width) + pc * pw) * 3,
                rgb, y * pw * 3, pw * 3)
              y += 1
            }
            PatchHash(id, pr, pc,
              ImageCodec.ahash64(ImageCodec.Image(pw, ph, rgb)))
          }
        }
      }
  }

  final case class AttemptedImage(id: Long, width: Int, height: Int,
      meanRgb: Array[Float], ahash: Long, mime: String, nBytes: Long,
      error: String)

  /** Decode with CORRUPT-PAYLOAD CAPTURE — the multimodal twin of the
    * engine's signature dead-letter split (Enforce.split): instead of
    * failing the task on the first bad payload, each row carries an
    * `error` column (null = decoded fine) and the codec's validation
    * message otherwise. Split with two filters exactly like the
    * row-level enforcement path; consumers of BOTH sides persist this
    * frame first (decode is the expensive step — same cache contract
    * as Enforce's scaladoc states for its split). */
  def decodeImagesWithError(spark: SparkSession, assets: DataFrame)
      : Dataset[AttemptedImage] = {
    import spark.implicits._
    assets.select(col("id"), col("payload"), col("meta.mime").as("mime"),
        col("meta.nBytes").as("nBytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mime, nBytes) =>
          try {
            val img = ImageCodec.decode(mime, payload)
            AttemptedImage(id, img.width, img.height,
              ImageCodec.meanRgb(img), ImageCodec.ahash64(img),
              mime, nBytes, null)
          } catch {
            // NonFatal, not just IllegalArgumentException: a corrupt
            // payload can fail OUTSIDE the codec's requires (index
            // out of bounds, negative array size from a lying header,
            // malformed varint...) and every such failure must route
            // to the dead-letter side rather than kill the task
            case scala.util.control.NonFatal(e) =>
              AttemptedImage(id, -1, -1, Array.empty, 0L, mime, nBytes,
                if (e.getMessage == null) e.getClass.getSimpleName
                else e.getMessage)
          }
        }
      }
  }

  /** The two-filter split over [[decodeImagesWithError]]'s output:
    * (ok = decoded feature rows, dead = (id, mime, nBytes, error) for
    * the dead-letter sink). */
  def splitDecoded(attempted: Dataset[AttemptedImage])
      : (DataFrame, DataFrame) = {
    val df = attempted.toDF()
    (df.filter(col("error").isNull)
        .select(col("id"), col("width"), col("height"),
          col("meanRgb"), col("ahash")),
      df.filter(col("error").isNotNull)
        .select(col("id"), col("mime"), col("nBytes"), col("error")))
  }

  final case class DecodedAudio(id: Long, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Long, durationMs: Long,
      meanAmp: Double, peakAmp: Long, meanCrossings: Long)

  /** REAL audio decode: parses each payload's RIFF/WAVE container with
    * [[AudioCodec]] and extracts clip features over decoded SAMPLES —
    * format fields from the actual header walk, duration, mean/peak
    * amplitude, and the mean-crossing count (sign flips of s−mean̄,
    * compared via the exact cross-multiplication s·n vs Σs so no
    * float ever enters the comparison). Same mapPartitions batching as
    * the image tier. */
  def decodeAudio(spark: SparkSession, assets: DataFrame): Dataset[DecodedAudio] = {
    import spark.implicits._
    assets.select(col("id"), col("payload"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mime) =>
          val clip = AudioCodec.decode(mime, payload)
          val s = clip.samples
          val n = s.length.toLong
          var sum = 0L
          var peak = 0L
          var i = 0
          while (i < s.length) {
            sum += s(i)
            if (math.abs(s(i).toLong) > peak) peak = math.abs(s(i).toLong)
            i += 1
          }
          var crossings = 0L
          i = 1
          while (i < s.length) {
            // sign of (s(i) − mean) without division: s(i)·n − Σs
            val a = s(i - 1) * n - sum
            val b = s(i) * n - sum
            if ((a > 0 && b < 0) || (a < 0 && b > 0)) crossings += 1
            i += 1
          }
          DecodedAudio(id, clip.sampleRate, clip.channels,
            clip.bitsPerSample, n, AudioCodec.durationMs(clip),
            if (n > 0) sum.toDouble / n else 0.0, peak, crossings)
        }
      }
  }

  final case class ResizedAsset(id: Long, width: Int, height: Int, payload: Array[Byte])
  final case class Frame(id: Long, frameIdx: Int, payload: Array[Byte])

  /** Resize stub: real impl scales pixels via a codec; the stand-in
    * deterministically re-buckets bytes to the target size so output
    * schema, sizing and partition behavior are real. */
  def resize(spark: SparkSession, assets: DataFrame, w: Int, h: Int): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          // long multiply: 65536×65536 in Int wraps to 0 (and larger
          // to negative), bypassing the 1 MB cap it exists for
          val out = Array.tabulate[Byte](math.min(w.toLong * h, 1L << 20).toInt) { i =>
            if (payload.isEmpty) 0 else payload(i % payload.length)
          }
          ResizedAsset(id, w, h, out)
        }
      }
  }

  /** REAL resize: decode ([[ImageCodec]]) → nearest-neighbor pixel
    * resample → re-encode as P6 — actual pixels move, unlike the
    * byte-rebucketing `resize` stub kept for unparseable formats. */
  def resizeImages(spark: SparkSession, assets: DataFrame,
      w: Int, h: Int): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.select(col("id"), col("payload"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mime) =>
          val out = ImageCodec.encodePpm(
            ImageCodec.resizeNearest(ImageCodec.decode(mime, payload), w, h))
          ResizedAsset(id, w, h, out)
        }
      }
  }

  final case class SampledFrame(id: Long, frameIdx: Int, width: Int,
      height: Int, ahash: Long, payload: Array[Byte])

  /** REAL frame sampling: the payload is a multi-frame container
    * (consecutive P6 frames — [[ImageCodec.decodeFrameContainer]]),
    * every k-th decoded frame is re-encoded with its perceptual hash —
    * the generator-shaped mapPartitions (1 asset → n rows) running a
    * genuine byte decoder end to end. Real video swaps the container
    * parse for an FFI demuxer with the identical call structure. */
  def sampleFramesReal(spark: SparkSession, assets: DataFrame, everyK: Int,
      maxFrames: Int = 8): Dataset[SampledFrame] = {
    import spark.implicits._
    require(everyK >= 1, s"everyK must be positive, got $everyK")
    assets.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          ImageCodec.decodeFrameContainer(payload).zipWithIndex.iterator
            .filter(_._2 % everyK == 0)
            .take(maxFrames)
            .map { case (img, idx) =>
              SampledFrame(id, idx, img.width, img.height,
                ImageCodec.ahash64(img), ImageCodec.encodePpm(img))
            }
        }
      }
  }

  /** Frame sampling stub (video → every k-th frame): a generator-shaped
    * mapPartitions (1 asset → n frame rows) — the row-explosion pattern
    * a real ffmpeg-backed sampler has, with deterministic fake frames. */
  def sampleFrames(spark: SparkSession, assets: DataFrame, everyK: Int,
      maxFrames: Int = 8): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val nFrames = math.min(math.max(payload.length / math.max(everyK, 1), 1), maxFrames)
          (0 until nFrames).iterator.map { f =>
            val start = f * everyK
            val frame = payload.slice(start, math.min(start + everyK, payload.length))
            Frame(id, f, frame)
          }
        }
      }
  }

  /** Fixed-size payload paging: one asset → ceil(len/chunk) ordered
    * chunk rows, each with its size and content digest — the upload/
    * dedup-unit shape for large binary payloads (multipart staging,
    * chunk-level dedup, range reads). Pure generator expressions
    * (sequence → posexplode → substr), no UDF: stays in whole-stage
    * codegen and distributes as a narrow map — 1 row in, n rows out,
    * no shuffle. Byte-based slicing on the binary column. */
  def chunkPages(assets: DataFrame, chunkBytes: Int): DataFrame =
    paged(assets, col("id"), col("payload"),
      octet_length(col("payload")), chunkBytes)

  /** Character-based twin of `chunkPages` over a string column — the
    * oracle-checkable form (the oracle engine cannot slice blobs;
    * char and byte slicing coincide on ASCII payloads). Same shared
    * pipeline, so the oracle-gated query (m71) exercises the exact
    * code the binary operator runs. */
  def chunkPagesChars(df: DataFrame, id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column, chunkChars: Int): DataFrame =
    paged(df, id, text, length(text), chunkChars)

  /** Shared chunking pipeline: `substr` slices bytes on binary columns
    * and characters on string columns — everything else (index
    * generation, sizes, digests) is identical. posexplode_outer, not
    * posexplode: a plain Generate gets an inferred size()>0 filter
    * pushed below the projection chain. */
  private def paged(df: DataFrame, id: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column,
      len: org.apache.spark.sql.Column, chunk: Int): DataFrame = {
    require(chunk > 0, "chunk size must be positive")
    df.select(id.as("id"), payload.as("graft_payload"), len.as("graft_len"))
      .select(col("id"), col("graft_payload"),
        posexplode_outer(
          when(col("graft_len") > 0, sequence(
            lit(0), ceil(col("graft_len").cast("double") / chunk).cast("int") - 1))
            .otherwise(array().cast("array<int>"))).as(Seq("pos", "i")))
      .filter(col("i").isNotNull)
      .select(col("id"), col("i").cast("long").as("chunk_idx"),
        col("graft_payload").substr(col("i") * chunk + 1, lit(chunk)).as("chunk"))
      .select(col("id"), col("chunk_idx"),
        octet_length(col("chunk")).cast("long").as("n_bytes"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
  }
}
