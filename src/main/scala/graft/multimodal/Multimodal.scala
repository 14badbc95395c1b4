package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns beside typed metadata;
  * decode / feature-extract run as partition-batched transforms
  * (`mapPartitions` — the Scala analog of `mapInPandas` batching).
  *
  * Codec honesty (round 6): ALL THREE payload kinds are now REAL
  * containers parsed from their bytes — uncompressed 24-bit BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up padded rows; the
  * public Windows DIB layout), canonical-form RIFF/WAVE PCM16, and
  * uncompressed-DIB RIFF/AVI (hdrl/strl/movi lists) — with pure-JVM
  * [[encodeBmp24]]/[[bmpDims]], [[encodeWavPcm16]]/[[wavInfo]], and
  * [[encodeAvi]]/[[aviInfo]] in the same spirit as `ingest.GeoTiff`/
  * `Las`. Compressed formats (JPEG/H.264/Opus …) remain out of scope —
  * this container ships no codec libraries — so the deep-feature step
  * ([[decodeFeatures]]) still derives its vector from payload bytes via
  * FNV-1a while the container/metadata layer is real and oracle-gated
  * (`i_multimodal_meta` parses width/height/duration out of the bytes).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("payload", BinaryType, nullable = true), // opaque encoded bytes
    StructField("meta_source", StringType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** FNV-1a 64-bit over payload bytes — the deterministic stand-in for a
    * real decode. A production build replaces [[decodeOne]]'s body with the
    * actual codec call; everything around it stays. */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  private def decodeOne(mediaId: Long, kind: String, payload: Array[Byte]): Row = {
    val h = fnv1a(payload)
    def field(shift: Int, mod: Int, off: Int) =
      (((h >>> shift) & 0xffffL) % mod).toInt + off
    val width = field(0, 1920, 16)
    val height = field(16, 1080, 16)
    val channels = if (kind == "audio") 1 else 3
    val luma = ((h >>> 32) & 0xffffffL).toDouble / 0xffffffL.toDouble * 255.0
    val features = Array.tabulate(8)(i =>
      (((h >>> (i * 7)) & 0x3ffL).toDouble / 1024.0) * 2.0 - 1.0)
    Row(mediaId, kind, payload.length, width, height, channels, luma,
      features.toSeq)
  }

  /** Batched decode/feature-extract. Rows with null payloads are dropped
    * (mirroring nodata-pixel normalization). Runs once per partition —
    * codec initialization cost is amortized per-batch, the reason this is
    * mapPartitions and not a per-row UDF. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      // per-partition codec setup would go here
      it.flatMap { r =>
        Option(r.getAs[Array[Byte]]("payload")).map(p =>
          decodeOne(r.getAs[Long]("media_id"), r.getAs[String]("kind"), p))
      }
    }(enc)
  }

  // ---- real containers (pure JVM, public formats) ----------------------

  /** Uncompressed 24-bit BMP: 14-byte BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER + bottom-up rows padded to 4 bytes. Pixels are a
    * deterministic LCG fill of `seed` (content is irrelevant to the
    * metadata path but the container is byte-complete — any BMP reader
    * opens it). */
  def encodeBmp24(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dims must be positive")
    val rowBytes = (3 * width + 3) / 4 * 4
    val size = 54 + rowBytes * height
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(size)
    b.putInt(0) // reserved
    b.putInt(54) // pixel data offset
    b.putInt(40) // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height)
    b.putShort(1) // planes
    b.putShort(24) // bpp
    b.putInt(0) // BI_RGB, uncompressed
    b.putInt(rowBytes * height)
    b.putInt(2835).putInt(2835) // 72 dpi
    b.putInt(0).putInt(0) // palette
    var s = seed
    var i = 54
    while (i < size) {
      s = s * 6364136223846793005L + 1442695040888963407L
      b.put(i, (s >>> 40).toByte)
      i += 1
    }
    b.array()
  }

  /** Parse (width, height) from BMP bytes; validates magic, header size,
    * and 24-bit uncompressed layout. */
  def bmpDims(bytes: Array[Byte]): (Int, Int) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    require(b.getInt(14) == 40, "only BITMAPINFOHEADER supported")
    require(b.getShort(28) == 24 && b.getInt(30) == 0,
      "only uncompressed 24-bit BMP supported")
    (b.getInt(18), b.getInt(22))
  }

  /** Canonical-form RIFF/WAVE, PCM 16-bit mono: RIFF header, `fmt ` chunk
    * (16 bytes, audio format 1), `data` chunk with the samples. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = 2 * samples.length
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2) // byte rate
    b.putShort(2) // block align
    b.putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Walk the RIFF chunks of a WAV and return (sampleRate, nSamples,
    * durationMs). durationMs is the exact integer floor
    * dataBytes·1000 / byteRate. */
  def wavInfo(bytes: Array[Byte]): (Int, Long, Long) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV")
    var off = 12
    var rate = 0; var blockAlign = 0; var dataBytes = -1L
    while (off + 8 <= bytes.length && (rate == 0 || dataBytes < 0)) {
      val id = tag(off)
      val len = b.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"corrupt WAV chunk '$id' length $len")
      if (id == "fmt ") {
        require(b.getShort(off + 8) == 1, "only PCM WAV supported")
        rate = b.getInt(off + 12)
        blockAlign = b.getShort(off + 20)
      } else if (id == "data") dataBytes = len.toLong
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && blockAlign > 0 && dataBytes >= 0, "missing fmt/data chunk")
    (rate, dataBytes / blockAlign, dataBytes * 1000L / (rate.toLong * blockAlign))
  }

  /** Decode the PCM16 samples out of a WAV's data chunk (mono, little-
    * endian) — the payload counterpart of [[wavInfo]]'s header walk, so
    * the sample path itself can be round-trip gated. */
  def wavSamples(bytes: Array[Byte]): Array[Short] = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV")
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val len = b.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"corrupt WAV chunk '$id' length $len")
      if (id == "data") {
        require(len % 2 == 0, "odd PCM16 data length")
        return Array.tabulate(len / 2)(i => b.getShort(off + 8 + 2 * i))
      }
      off += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException("missing data chunk")
  }

  /** Canonical uncompressed-DIB AVI (RIFF 'AVI '): LIST hdrl { avih,
    * LIST strl { strh 'vids'/'DIB ', strf BITMAPINFOHEADER } }, LIST
    * movi with `frames` '00db' frames of deterministic LCG fill. Fixed
    * 25 fps (40 000 µs/frame), so durationMs = 40·frames exactly. Total
    * size is the closed form 224 + frames·(8 + rowBytes·height) the
    * oracle recomputes. */
  def encodeAvi(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0,
      "AVI dims/frames must be positive")
    val rowBytes = (3 * width + 3) / 4 * 4
    val fsz = rowBytes * height
    val total = 224 + frames * (8 + fsz)
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); b.putInt(192); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(40000)        // dwMicroSecPerFrame (25 fps)
    b.putInt(fsz * 25)     // dwMaxBytesPerSec
    b.putInt(0)            // dwPaddingGranularity
    b.putInt(0)            // dwFlags
    b.putInt(frames)       // dwTotalFrames
    b.putInt(0)            // dwInitialFrames
    b.putInt(1)            // dwStreams
    b.putInt(fsz)          // dwSuggestedBufferSize
    b.putInt(width)
    b.putInt(height)
    b.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    // LIST ckSize includes the 4-byte list-type fourcc: 4 + strh(8+56) + strf(8+40)
    fourcc("LIST"); b.putInt(116); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    b.putInt(0)            // dwFlags
    b.putInt(0)            // wPriority + wLanguage
    b.putInt(0)            // dwInitialFrames
    b.putInt(1)            // dwScale
    b.putInt(25)           // dwRate (fps = rate/scale)
    b.putInt(0)            // dwStart
    b.putInt(frames)       // dwLength
    b.putInt(fsz)          // dwSuggestedBufferSize
    b.putInt(0)            // dwQuality
    b.putInt(0)            // dwSampleSize
    b.putShort(0).putShort(0)
    b.putShort(width.toShort).putShort(height.toShort) // rcFrame
    fourcc("strf"); b.putInt(40)
    b.putInt(40); b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24)
    b.putInt(0)            // BI_RGB
    b.putInt(fsz)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(4 + frames * (8 + fsz)); fourcc("movi")
    var s = seed
    var f = 0
    while (f < frames) {
      fourcc("00db"); b.putInt(fsz)
      var i = 0
      while (i < fsz) {
        s = s * 6364136223846793005L + 1442695040888963407L
        b.put((s >>> 40).toByte)
        i += 1
      }
      f += 1
    }
    b.array()
  }

  /** MJPEG-style AVI: the same RIFF layout as [[encodeAvi]] but the
    * stream is fourcc 'MJPG' (biCompression = 'MJPG') and each movi
    * chunk is a COMPLETE baseline JPEG stream ('00dc' = compressed
    * frame, variable length, word-aligned per the RIFF rule). This is
    * the actual shape multimodal ingest meets in the wild: a container
    * walk that yields per-frame codec payloads, each independently
    * decodable — the (file, frame) fan-out unit of a distributed video
    * pipeline. Frames are passed in pre-encoded so the codec choice
    * stays composable (ingest.Jpeg here; any T.81 encoder works). */
  def encodeAviMjpeg(width: Int, height: Int,
                     frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty,
      "AVI dims/frames must be positive")
    val padded = frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + padded.map(8 + _).sum
    val maxF = frames.map(_.length).max
    val total = 224 + moviSize - 4 // 12 RIFF + 200 hdrl + 8 + moviSize
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); b.putInt(192); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(40000)            // dwMicroSecPerFrame (25 fps)
    b.putInt(maxF * 25)        // dwMaxBytesPerSec
    b.putInt(0).putInt(0)      // padding granularity, flags
    b.putInt(frames.length)    // dwTotalFrames
    b.putInt(0); b.putInt(1)   // initial frames, streams
    b.putInt(maxF)             // dwSuggestedBufferSize
    b.putInt(width); b.putInt(height)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(116); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(1); b.putInt(25)  // scale, rate
    b.putInt(0); b.putInt(frames.length)
    b.putInt(maxF); b.putInt(0); b.putInt(0)
    b.putShort(0).putShort(0)
    b.putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); b.putInt(40)
    b.putInt(40); b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24)
    fourcc("MJPG")             // biCompression
    b.putInt(maxF)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); b.putInt(f.length)
      b.put(f)
      if ((f.length & 1) == 1) b.put(0.toByte) // RIFF word alignment
    }
    b.array()
  }

  /** Walk an AVI's movi list and return every frame payload ('00dc'
    * compressed or '00db' uncompressed), in stream order. Bounds are
    * validated at every hop; junk and truncation throw. */
  def aviFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "not an AVI")
    val out = Array.newBuilder[Array[Byte]]
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val len = b.getInt(off + 4)
      // Long math: a hostile length near Int.MaxValue wraps the Int bound
      // check and reads as in-bounds
      require(len >= 0 && off + 8 + len.toLong <= bytes.length,
        s"corrupt AVI chunk '$id' length $len at $off")
      if (id == "LIST" && len >= 4 && tag(off + 8) == "movi") {
        var o2 = off + 12
        val end = off + 8 + len
        while (o2 + 8 <= end) {
          val cid = tag(o2)
          val l2 = b.getInt(o2 + 4)
          require(l2 >= 0 && o2 + 8 + l2.toLong <= end,
            s"corrupt movi chunk '$cid' length $l2 at $o2")
          if (cid == "00dc" || cid == "00db")
            out += java.util.Arrays.copyOfRange(bytes, o2 + 8, o2 + 8 + l2)
          o2 += 8 + l2 + (l2 & 1)
        }
      }
      off += 8 + len + (len & 1)
    }
    val frames = out.result()
    require(frames.nonEmpty, "no frames in movi list")
    frames
  }

  /** Walk the RIFF lists of an AVI and return (width, height, nFrames,
    * durationMs) from the avih main header; durationMs is the exact
    * integer µsPerFrame·frames / 1000. Junk and truncation throw. */
  def aviInfo(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 72 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "not an AVI")
    var off = 12
    var res: (Int, Int, Long, Long) = null
    while (off + 12 <= bytes.length && res == null) {
      val id = tag(off)
      val len = b.getInt(off + 4)
      require(len >= 0, s"corrupt AVI chunk '$id' length $len")
      if (id == "LIST" && tag(off + 8) == "hdrl") {
        var o2 = off + 12
        val end = math.min(off + 8 + len, bytes.length)
        while (o2 + 8 <= end && res == null) {
          if (tag(o2) == "avih") {
            require(o2 + 8 + 48 <= bytes.length, "truncated avih")
            val us = b.getInt(o2 + 8)
            val fr = b.getInt(o2 + 24)
            res = (b.getInt(o2 + 40), b.getInt(o2 + 44),
              fr.toLong, us.toLong * fr / 1000L)
          }
          val l2 = b.getInt(o2 + 4)
          require(l2 >= 0, s"corrupt AVI hdrl child length $l2")
          o2 += 8 + l2 + (l2 & 1)
        }
      }
      off += 8 + len + (len & 1)
    }
    require(res != null, "missing avih header")
    res
  }

  /** Synthetic media table derived from `documents`: image rows carry a
    * REAL BMP whose dimensions derive from doc_id, audio rows a REAL
    * PCM16 WAV whose sample count derives from the text length, video
    * rows a REAL uncompressed-DIB AVI whose dimensions and frame count
    * derive from doc_id. Deep codecs (JPEG/H.264/Opus) remain out of
    * scope — no codec libs in the container — but every payload is now a
    * parseable standard container. The derivations are pure integer
    * functions of (doc_id, octet length), so the DuckDB oracle can
    * recompute every parsed header field. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("textBytes"),
      col("source").as("meta_source"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    // positional access: Catalyst pipelines consecutive object-typed
    // operators without re-serializing, so downstream mapPartitions may
    // receive these literal Rows (no schema attached — name lookup throws)
    base.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val tb = r.getAs[Array[Byte]](2)
        val payload = r.getString(1) match {
          case "image" =>
            encodeBmp24((16 + id % 48).toInt, (16 + (id * 7) % 48).toInt, id)
          case "audio" =>
            val n = 64 + tb.length % 256
            var s = id
            encodeWavPcm16(8000, Array.tabulate(n) { _ =>
              s = s * 6364136223846793005L + 1442695040888963407L
              (s >>> 48).toShort
            })
          case _ =>
            encodeAvi((16 + id % 32).toInt, (16 + (id * 5) % 32).toInt,
              (1 + id % 8).toInt, id)
        }
        Row(id, r.getString(1), payload, r.getString(3))
      }
    }(enc)
  }

  /** Parsed per-item container metadata: width/height from the BMP or
    * AVI header, duration from the WAV chunks or the AVI frame clock. */
  def containerMeta(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("meta_source", StringType, nullable = true),
      StructField("byte_len", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "kind", "payload", "meta_source").mapPartitions { it =>
      it.flatMap { r =>
        Option(r.getAs[Array[Byte]](2)).map { p =>
          val kind = r.getString(1)
          val (w, h, dur) = kind match {
            case "image" => val (bw, bh) = bmpDims(p); (bw, bh, 0L)
            case "audio" => (0, 0, wavInfo(p)._3)
            case _ => val (aw, ah, _, ms) = aviInfo(p); (aw, ah, ms)
          }
          Row(r.getLong(0), kind, r.getString(3), p.length.toLong, w, h, dur)
        }
      }
    }(enc)
  }

  /** Frame-sample: pick every `stride`-th feature vector per media group —
    * the video-frame subsampling shape, pure relational. */
  def frameSample(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("media_id") % stride === 0)
}
