package graft.operators

/** Minimal REAL audio byte codec: RIFF/WAVE PCM container parsing and
  * encoding, pure JVM — the audio twin of [[ImageCodec]]. Parses the
  * public WAV layout (RIFF header, `fmt ` chunk, `data` chunk, with
  * unknown chunks skipped by their declared size, as the format
  * requires): 8-bit unsigned and 16-bit signed little-endian PCM.
  *
  * Like ImageCodec, this exists so the multimodal decode path runs a
  * GENUINE byte parser end to end — header validation, chunk walking,
  * sample extraction — with the exact call shape an FFI codec
  * (libsndfile et al.) would have. Production swaps the parser, not
  * the plumbing.
  */
object AudioCodec {

  val WavMime = "audio/wav"

  /** Decoded clip: per-channel-interleaved samples as Ints (u8 PCM:
    * 0..255; s16 PCM: -32768..32767). */
  final case class WavClip(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Int])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"WAV decode: $msg")

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE PCM payload. Unknown chunks (LIST, fact, …) are
    * skipped by size; `fmt ` must precede `data` (the spec's layout);
    * non-PCM formats and bit depths other than 8/16 are rejected. */
  def decode(mime: String, payload: Array[Byte]): WavClip = {
    if (mime != WavMime) fail(s"unsupported mime $mime")
    if (payload.length < 12) fail(s"truncated header (${payload.length} bytes)")
    if (tag(payload, 0) != "RIFF") fail(s"bad magic '${tag(payload, 0)}'")
    if (tag(payload, 8) != "WAVE") fail(s"not a WAVE form '${tag(payload, 8)}'")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val size = u32(payload, off + 4)
      if (off + 8 + size > payload.length)
        fail(s"chunk '$id' overruns payload ($size bytes at $off)")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small ($size)")
          val audioFormat = u16(payload, off + 8)
          if (audioFormat != 1) fail(s"not PCM (format $audioFormat)")
          val channels = u16(payload, off + 10)
          val rate = u32(payload, off + 12).toInt
          val bits = u16(payload, off + 22)
          if (channels < 1) fail(s"bad channel count $channels")
          if (rate < 1) fail(s"bad sample rate $rate")
          if (bits != 8 && bits != 16) fail(s"unsupported bit depth $bits")
          fmt = Some((channels, rate, bits))
        case "data" =>
          val (channels, rate, bits) = fmt.getOrElse(fail("data before fmt"))
          val n = size.toInt / (bits / 8)
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) =
              if (bits == 8) payload(off + 8 + i) & 0xff
              else { // 16-bit signed little-endian
                val lo = payload(off + 8 + 2 * i) & 0xff
                val hi = payload(off + 8 + 2 * i + 1).toInt // sign-extends
                (hi << 8) | lo
              }
            i += 1
          }
          return WavClip(rate, channels, bits, samples)
        case _ => // LIST/fact/cue…: skip by declared size (+pad to even)
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    fail("no data chunk")
  }

  /** Encode 8-bit unsigned mono PCM — the test/fixture encoder (raw
    * bytes ARE the samples, so text corpora make deterministic clips). */
  def encodeWav8(sampleRate: Int, data: Array[Byte]): Array[Byte] =
    wavHeader(sampleRate, channels = 1, bits = 8, dataLen = data.length) ++ data

  /** Just the 44-byte canonical header for a PCM payload of `dataLen`
    * bytes — lets SQL fixtures build genuine WAV payloads as
    * `concat(lit(header), textBytes)`. */
  def wavHeader(sampleRate: Int, channels: Int, bits: Int,
      dataLen: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * bits / 8
    val blockAlign = channels * bits / 8
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array()
  }

  /** Frame count per channel. */
  def nFrames(c: WavClip): Long = c.samples.length.toLong / c.channels

  /** Clip duration in milliseconds (integer arithmetic — exact and
    * engine-portable). */
  def durationMs(c: WavClip): Long = nFrames(c) * 1000L / c.sampleRate
}
