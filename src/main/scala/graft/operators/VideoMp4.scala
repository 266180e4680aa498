package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ISO-BMFF / MP4 container codec — the SECOND video container next to
  * [[VideoAvi]]'s RIFF: the box-tree layout (ftyp/mdat/moov with the
  * full trak → mdia → minf → stbl sample-table walk) that every modern
  * video file shares. Like the AVI codec, this is the "container →
  * sampled frames" hop of a multimodal pipeline, pure JVM, with the
  * frames stored UNCOMPRESSED ('raw ' visual sample entries, top-down
  * interleaved RGB): the box walk, the 16.16 fixed-point track
  * dimensions, and the stsc/stsz/stco sample-to-offset resolution are
  * all real ISO 14496-12 structure; a compressed-codec library would
  * drop in at the per-sample decode point exactly as documented for
  * AVI. Corrupt/foreign input decodes to null, never a misread.
  *
  * Decoder discipline: big-endian reads, size==1 largesize and
  * size==0 to-end handling, and GENERAL stsc chunk-run expansion
  * (sample → (chunk, index-in-chunk) → stco offset + intra-chunk size
  * prefix) — not an assumption that one sample is one chunk, even
  * though the encoder writes that layout; stride sampling seeks via
  * the sample table, unsampled frames are never materialized.
  */
object VideoMp4 {

  final case class Mp4Clip(width: Int, height: Int, timescale: Long,
      duration: Long, nSamples: Int, frames: Array[Array[Byte]])

  // ---------------------------------------------------------------- io
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def rdBe16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def rdBe32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def rdBe64(b: Array[Byte], o: Int): Long =
    (rdBe32(b, o) << 32) | rdBe32(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def box(fourcc: String, payload: Array[Array[Byte]]): Array[Byte] = {
    val body = payload.flatMap(_.toSeq)
    val out = new Array[Byte](8 + body.length)
    System.arraycopy(be32(8L + body.length), 0, out, 0, 4)
    System.arraycopy(fourcc.getBytes("US-ASCII"), 0, out, 4, 4)
    System.arraycopy(body.toArray, 0, out, 8, body.length)
    out
  }
  private def full(version: Int, flags: Int): Array[Byte] = Array(
    version.toByte, ((flags >> 16) & 0xff).toByte,
    ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte)

  // ------------------------------------------------------------ encode

  /** Encode a minimal spec-conformant MP4: ftyp(isom), mdat with
    * nFrames uncompressed top-down RGB frames, moov with the full
    * sample-table chain (one video trak; `samplesPerChunk` samples
    * per chunk — a ragged final chunk gets its own stsc run, so
    * spc > 1 exercises the decoder's run expansion; mvhd/mdhd
    * timescale = `timescale`, one tick per frame).
    * `pixel(f, x, y)` returns (r, g, b).
    */
  def mp4Encode(width: Int, height: Int, nFrames: Int, timescale: Int,
      pixel: (Int, Int, Int) => (Int, Int, Int),
      samplesPerChunk: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && timescale > 0)
    require(samplesPerChunk >= 1)
    val frameSize = width * height * 3
    val frames = (0 until nFrames).map { f =>
      val fb = new Array[Byte](frameSize)
      var i = 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, bch) = pixel(f, x, y)
          fb(i) = r.toByte; fb(i + 1) = g.toByte; fb(i + 2) = bch.toByte
          i += 3; x += 1
        }
        y += 1
      }
      fb
    }
    val ftyp = box("ftyp", Array(
      "isom".getBytes("US-ASCII"), be32(0),
      "isom".getBytes("US-ASCII")))
    val mdat = box("mdat", frames.toArray)
    // frame i starts at ftyp + mdat header + i * frameSize
    val frameOff = (i: Int) => ftyp.length + 8 + i * frameSize

    val mvhd = box("mvhd", Array(full(0, 0),
      be32(0), be32(0),                        // creation, modification
      be32(timescale), be32(nFrames),          // timescale, duration
      be32(0x00010000L), be16(0x0100), be16(0),// rate 1.0, volume, rsvd
      be32(0), be32(0),                        // reserved
      be32(0x00010000L), be32(0), be32(0),     // unity matrix
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0), // pre_defined
      be32(2)))                                // next track id
    val tkhd = box("tkhd", Array(full(0, 7),
      be32(0), be32(0), be32(1), be32(0), be32(nFrames),
      be32(0), be32(0),                        // reserved
      be16(0), be16(0), be16(0), be16(0),      // layer, alt, volume, rsvd
      be32(0x00010000L), be32(0), be32(0),     // unity matrix
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16))) // 16.16
    val mdhd = box("mdhd", Array(full(0, 0),
      be32(0), be32(0), be32(timescale), be32(nFrames),
      be16(0x55c4), be16(0)))                  // language 'und'
    val hdlr = box("hdlr", Array(full(0, 0), be32(0),
      "vide".getBytes("US-ASCII"), be32(0), be32(0), be32(0),
      Array(0.toByte)))
    val vmhd = box("vmhd", Array(full(0, 1),
      be16(0), be16(0), be16(0), be16(0)))
    val dref = box("dref", Array(full(0, 0), be32(1),
      box("url ", Array(full(0, 1)))))         // self-contained
    val dinf = box("dinf", Array(dref))
    val rawEntry = box("raw ", Array(
      new Array[Byte](6), be16(1),             // reserved, data ref idx
      be16(0), be16(0), be32(0), be32(0), be32(0), // predefined/rsvd
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L),    // 72 dpi
      be32(0), be16(1),                        // reserved, frame count
      new Array[Byte](32),                     // compressor name
      be16(24), be16(0xffff)))                 // depth, pre_defined -1
    val stsd = box("stsd", Array(full(0, 0), be32(1), rawEntry))
    val stts = box("stts", Array(full(0, 0), be32(1),
      be32(nFrames), be32(1)))
    val spc = samplesPerChunk
    val nChunks = (nFrames + spc - 1) / spc
    val tail = nFrames % spc
    val runs: Seq[Array[Byte]] =
      if (tail == 0 || nChunks == 1)
        Seq(be32(1), be32(if (nChunks == 1) nFrames else spc), be32(1))
      else Seq(be32(1), be32(spc), be32(1),
        be32(nChunks), be32(tail), be32(1))
    val stsc = box("stsc",
      Array(full(0, 0), be32(runs.length / 3)) ++ runs)
    val stsz = box("stsz", Array(full(0, 0), be32(0), be32(nFrames)) ++
      (0 until nFrames).map(_ => be32(frameSize)))
    val stco = box("stco", Array(full(0, 0), be32(nChunks)) ++
      (0 until nChunks).map(c => be32(frameOff(c * spc))))
    val stbl = box("stbl", Array(stsd, stts, stsc, stsz, stco))
    val minf = box("minf", Array(vmhd, dinf, stbl))
    val mdia = box("mdia", Array(mdhd, hdlr, minf))
    val trak = box("trak", Array(tkhd, mdia))
    val moov = box("moov", Array(mvhd, trak))
    ftyp ++ mdat ++ moov
  }

  // ------------------------------------------------------------ decode

  /** Child boxes of b[start, end): (fourcc, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], start: Int,
      end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    while (o + 8 <= end) {
      val size32 = rdBe32(b, o)
      val fc = tag(b, o + 4)
      val (payload, next) =
        if (size32 == 1L && o + 16 <= end) {
          val largesize = rdBe64(b, o + 8)
          (o + 16, o + largesize)
        } else if (size32 == 0L) (o + 8, end.toLong)
        else (o + 8, o + size32)
      if (next < payload || next > end) return out.result() // corrupt
      out += ((fc, payload, next.toInt))
      o = next.toInt
    }
    out.result()
  }

  private def child(bs: Seq[(String, Int, Int)],
      fc: String): Option[(Int, Int)] =
    bs.find(_._1 == fc).map(t => (t._2, t._3))

  /** Decode an MP4 written by [[mp4Encode]]-compatible muxers (raw
    * visual samples), sampling every `stride`-th frame; null on
    * anything structurally corrupt or compressed.
    */
  def mp4Decode(b: Array[Byte], stride: Int): Mp4Clip =
    try {
      require(stride >= 1)
      val top = boxes(b, 0, b.length)
      if (!top.headOption.exists(_._1 == "ftyp")) return null
      val (moovS, moovE) = child(top, "moov").getOrElse(return null)
      val moov = boxes(b, moovS, moovE)
      val (mvS, _) = child(moov, "mvhd").getOrElse(return null)
      val mvVer = b(mvS) & 0xff
      val (timescale, duration) =
        if (mvVer == 1) (rdBe32(b, mvS + 20), rdBe64(b, mvS + 24))
        else (rdBe32(b, mvS + 12), rdBe32(b, mvS + 16))
      val (trS, trE) = child(moov, "trak").getOrElse(return null)
      val trak = boxes(b, trS, trE)
      val (tkS, tkE) = child(trak, "tkhd").getOrElse(return null)
      // width/height are the LAST two 16.16 fields of tkhd
      val width = (rdBe32(b, tkE - 8) >> 16).toInt
      val height = (rdBe32(b, tkE - 4) >> 16).toInt
      // decompression-bomb guard: corrupt 16.16 fields can declare
      // multi-GB frames — cap pixels BEFORE any size-driven allocation
      // (an OutOfMemoryError is an Error, not an Exception: it would
      // abort the task, not null the row)
      if (width <= 0 || height <= 0 ||
        width.toLong * height > (1L << 26)) return null
      val (mdS, mdE) = child(trak, "mdia").getOrElse(return null)
      val mdia = boxes(b, mdS, mdE)
      val (hdS, _) = child(mdia, "hdlr").getOrElse(return null)
      if (tag(b, hdS + 8) != "vide") return null
      val (miS, miE) = child(mdia, "minf").getOrElse(return null)
      val (sbS, sbE) = child(boxes(b, miS, miE), "stbl")
        .getOrElse(return null)
      val stbl = boxes(b, sbS, sbE)
      val (sdS, _) = child(stbl, "stsd").getOrElse(return null)
      // first sample entry's fourcc sits 8 bytes into the entry
      if (tag(b, sdS + 8 + 4) != "raw ") return null // compressed: no codec
      val (szS, _) = child(stbl, "stsz").getOrElse(return null)
      val uniform = rdBe32(b, szS + 4)
      // structural bomb guards: each stsz entry occupies 4 bytes of
      // THIS file, each stco/stsc entry 4/12 — declared counts beyond
      // that are lies, rejected before the count-sized allocations
      val nSamples = rdBe32(b, szS + 8).toInt
      if (nSamples < 0 || nSamples > b.length) return null
      val sizes = Array.tabulate(nSamples)(i =>
        if (uniform != 0L) uniform else rdBe32(b, szS + 12 + 4 * i))
      val (coS, _) = child(stbl, "stco").getOrElse(return null)
      val nChunks = rdBe32(b, coS + 4).toInt
      if (nChunks < 0 || nChunks > b.length / 4) return null
      val chunkOff = Array.tabulate(nChunks)(i => rdBe32(b, coS + 8 + 4 * i))
      val (scS, _) = child(stbl, "stsc").getOrElse(return null)
      val nRuns = rdBe32(b, scS + 4).toInt
      if (nRuns < 0 || nRuns > b.length / 12) return null
      val runs = Array.tabulate(nRuns)(i => (
        rdBe32(b, scS + 8 + 12 * i).toInt,      // first_chunk (1-based)
        rdBe32(b, scS + 12 + 12 * i).toInt))    // samples_per_chunk
      // a run with samples_per_chunk <= 0 never advances the sample
      // cursor, and non-increasing first_chunk wraps `chunk` through
      // Int overflow — either makes the expansion below spin forever
      // on crafted input, so reject up front
      if (runs.exists(_._2 <= 0)) return null
      if (runs.headOption.exists(_._1 < 1)) return null
      var rv = 0
      while (rv + 1 < nRuns) {
        if (runs(rv + 1)._1 <= runs(rv)._1) return null
        rv += 1
      }
      // expand stsc runs: sample index -> (chunk, index within chunk)
      val loc = new Array[(Int, Int)](nSamples)
      var s = 0
      var run = 0
      var chunk = runs.headOption.map(_._1).getOrElse(return null)
      // backstop: each outer iteration consumes a chunk; more chunk
      // visits than samples + declared chunks means the tables lie
      var outerLeft = nSamples.toLong + nChunks + 1
      while (s < nSamples) {
        if (outerLeft <= 0) return null
        outerLeft -= 1
        val spc = runs(run)._2
        val runEnds = if (run + 1 < nRuns) runs(run + 1)._1 else Int.MaxValue
        var k = 0
        while (k < spc && s < nSamples) { loc(s) = (chunk, k); k += 1; s += 1 }
        chunk += 1
        if (chunk >= runEnds) run += 1
      }
      val frames = (0 until nSamples by stride).map { i =>
        val (c, idx) = loc(i)
        var off = chunkOff(c - 1)
        // skip the sizes of earlier samples in this chunk
        var j = i - idx
        while (j < i) { off += sizes(j); j += 1 }
        if (sizes(i) != width.toLong * height * 3) return null
        val f = new Array[Byte](sizes(i).toInt)
        System.arraycopy(b, off.toInt, f, 0, f.length)
        f
      }.toArray
      Mp4Clip(width, height, timescale, duration, nSamples, frames)
    } catch { case _: Exception => null }

  val mp4Schema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("timescale", LongType),
    StructField("duration_ts", LongType),
    StructField("n_samples", IntegerType),
    StructField("n_sampled", IntegerType),
    StructField("f_first_r", IntegerType),
    StructField("f_first_g", IntegerType),
    StructField("f_first_b", IntegerType),
    StructField("l_last_r", IntegerType),
    StructField("l_last_g", IntegerType),
    StructField("l_last_b", IntegerType),
    StructField("pix_sum", LongType)))

  /** Distributed MP4 walk + stride frame sampling — the
    * [[VideoAvi.videoFeatures]] shape over the box-tree container. */
  def mp4Features(media: DataFrame, stride: Int): DataFrame = {
    val enc = Encoders.row(mp4Schema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val clip = mp4Decode(r.getAs[Array[Byte]](1), stride)
          if (clip == null || clip.frames.isEmpty)
            Row(r.getLong(0), null, null, null, null, null, null, null,
              null, null, null, null, null, null)
          else {
            var sum = 0L
            clip.frames.foreach { f =>
              var i = 0
              while (i < f.length) { sum += f(i) & 0xff; i += 1 }
            }
            val first = clip.frames.head
            val last = clip.frames.last
            val lo = (clip.height * clip.width - 1) * 3
            Row(r.getLong(0), clip.width, clip.height, clip.timescale,
              clip.duration, clip.nSamples, clip.frames.length,
              first(0) & 0xff, first(1) & 0xff, first(2) & 0xff,
              last(lo) & 0xff, last(lo + 1) & 0xff, last(lo + 2) & 0xff,
              sum)
          }
        }
      }(enc)
  }
}
