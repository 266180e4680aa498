package graft.core

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** POSIX ustar TAR interchange — the WebDataset shard format
  * (tar archives of `key.ext` members, one sample = all members
  * sharing a basename key), the de-facto layout multimodal training
  * corpora ship in (image+caption+metadata triples, audio+transcript
  * pairs). Not part of the reference surface; added for the
  * training-data pipeline, which must both ingest and publish
  * WebDataset shards.
  *
  * Pure-JVM codec, spec'd from the POSIX.1-1988 ustar layout: each
  * member is one 512-byte header (NUL-padded name, octal size/mode/
  * mtime, space-initialized checksum, `ustar\0` magic) + payload
  * rounded up to 512-byte blocks; the archive ends with two zero
  * blocks. The writer emits fully deterministic archives (mode 0644,
  * uid/gid 0, mtime 0, empty uname/gname) so byte-identical inputs
  * produce byte-identical shards — the reproducibility contract the
  * rest of the engine keeps. Interop is pinned by TarSpec against
  * GNU tar when present.
  *
  * Scale notes (100 TB):
  *  - tar has no central index and no sync markers, so a shard is not
  *    splittable: one file = one read task — exactly WebDataset's own
  *    discipline (shards of ~1 GB, parallelism across shards, which
  *    is also [[WarcTable]]'s model; size shards via repartition);
  *  - the reader is a `binaryFile` scan → per-partition header walk:
  *    one pass, no driver involvement, memory bounded by one member;
  *  - sample assembly (members → one row per key) is ONE groupBy on
  *    the key — members of a sample are adjacent in a shard, so at
  *    scale the shuffle is within-partition-heavy and AQE-coalesced;
  *  - malformed trailing data degrades to a clean stop (never throws
  *    mid-scan), matching the null-on-corrupt media-codec contract.
  */
object TarTable {

  private val Block = 512

  /** Read-back schema: one row per tar member, plus its provenance —
    * the archive path and the member's 0-based position within it.
    * (archive, member_idx) is a STABLE total order derived from the
    * inputs alone, so downstream last-wins rules are deterministic
    * across runs, retries, and file-split layouts (a
    * monotonically_increasing_id would order by partition index, which
    * changes with listing order).
    */
  val schema: StructType = StructType(Seq(
    StructField("member_name", StringType, nullable = false),
    StructField("member_size", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("archive", StringType, nullable = false),
    StructField("member_idx", LongType, nullable = false)))

  /** Write `df` as sharded .tar files (one per partition). Expected
    * columns: member_name (string ≤ 100 bytes), payload (binary).
    * Existing output is replaced. Member order within a shard is the
    * partition's row order — callers sort so a sample's members are
    * adjacent (the WebDataset convention).
    */
  def write(df: DataFrame, path: String): Unit = {
    val out = new Path(path)
    val fs = out.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.delete(out, true)
    fs.mkdirs(out)
    val cols = df.select(col("member_name"), col("payload"))
    cols.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val part = new Path(out, f"part-$pid%05d.tar")
        val efs = part.getFileSystem(new Configuration())
        val os = efs.create(part, true)
        try {
          rows.foreach { r =>
            val payload = r.getAs[Array[Byte]](1)
            os.write(header(r.getString(0), payload.length.toLong))
            os.write(payload)
            val pad = (Block - payload.length % Block) % Block
            if (pad > 0) os.write(new Array[Byte](pad))
          }
          os.write(new Array[Byte](2 * Block)) // end-of-archive marker
        } finally os.close()
      }
    }
  }

  /** Parse every member of every .tar file under `path`, tagging each
    * row with (archive, member_idx) provenance per [[schema]].
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(path)
      .select(col("path"), col("content"))
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val archive = r.getString(0)
        members(r.getAs[Array[Byte]](1)).zipWithIndex.map { case (m, i) =>
          Row(m.getString(0), m.getLong(1), m.get(2), archive, i.toLong)
        }
      }
    }(Encoders.row(schema))
  }

  /** Convenience: write + read back (round-trip proof shape). */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    write(df, path)
    read(df.sparkSession, path)
  }

  /** One member per (key, ext) → one row per sample key with a
    * map(ext → payload) — the WebDataset sample assembly step. The
    * key is the member name up to the LAST dot; extension after it.
    */
  def samples(members: DataFrame): DataFrame =
    members.select(
        regexp_extract(col("member_name"), "^(.*)\\.([^.]*)$", 1).as("key"),
        regexp_extract(col("member_name"), "^(.*)\\.([^.]*)$", 2).as("ext"),
        col("payload"),
        // duplicate member names are legal tar (later entries override
        // on extract); a last-wins reduce drops the shadowed payloads
        // BEFORE map assembly — without it, map_from_entries throws
        // under mapKeyDedupPolicy=EXCEPTION and one untrusted shard
        // fails the job. The order key is the STABLE provenance pair
        // from [[read]] (struct ordering is lexicographic): within an
        // archive, member_idx is the tar contract's extract order;
        // across archives the winner is pinned by path, never by
        // partition layout or recompute.
        struct(col("archive"), col("member_idx")).as("__seq"))
      .groupBy(col("key"), col("ext"))
      .agg(max_by(col("payload"), col("__seq")).as("payload"))
      .groupBy(col("key"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("ext"), col("payload"))))).as("parts"))

  // -- ustar encoding ---------------------------------------------------

  /** Deterministic POSIX ustar header for one regular-file member. */
  private[core] def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100, s"member name too long: $name")
    require(size >= 0, s"negative member size: $size")
    val h = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    putOctal(h, 100, 8, 420L)  // mode 0644
    putOctal(h, 108, 8, 0L)    // uid
    putOctal(h, 116, 8, 0L)    // gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 0L)   // mtime (epoch: deterministic output)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces
    h(156) = '0'               // typeflag: regular file
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5) // magic, NUL at 262
    h(263) = '0'; h(264) = '0' // version "00"
    // uname/gname empty; dev fields octal zero per GNU/BSD practice
    putOctal(h, 329, 8, 0L)
    putOctal(h, 337, 8, 0L)
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    putOctal(h, 148, 7, sum)   // 6 octal digits + NUL
    h(155) = ' '
    h
  }

  /** Zero-padded octal field: (width−1) digits + NUL, the classic
    * layout every tar implementation accepts.
    */
  private def putOctal(h: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    val digits = width - 1
    var x = v
    var i = off + digits - 1
    while (i >= off) {
      h(i) = ('0' + (x & 7)).toByte
      x >>= 3
      i -= 1
    }
    require(x == 0, s"value $v overflows $digits-digit octal field")
    h(off + digits) = 0
  }

  /** Walk one archive's members; clean stop on the zero block, on a
    * short/garbled header, or on a payload that overruns the archive
    * (never throws — the media-codec corruption contract).
    */
  private[core] def members(bytes: Array[Byte]): Iterator[Row] = {
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var off = 0
    var done = false
    while (!done && off + Block <= bytes.length) {
      if (bytes(off) == 0) done = true // end-of-archive zero block
      else {
        val ok = bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' &&
          bytes(off + 261) == 'r'
        val size = if (ok) parseOctal(bytes, off + 124, 12) else -1L
        if (!ok || size < 0 || off + Block + size > bytes.length) done = true
        else {
          val nameEnd0 = {
            var i = off
            while (i < off + 100 && bytes(i) != 0) i += 1
            i
          }
          val name = new String(bytes, off, nameEnd0 - off, UTF_8)
          // only regular files carry sample payloads; directories /
          // pax headers etc. are walked over by the same size rule
          if (bytes(off + 156) == '0'.toByte || bytes(off + 156) == 0) {
            val payload = java.util.Arrays.copyOfRange(
              bytes, off + Block, off + Block + size.toInt)
            out += Row(name, size, payload)
          }
          off += Block + ((size.toInt + Block - 1) / Block) * Block
        }
      }
    }
    out.iterator
  }

  /** Octal field parse: skip leading spaces/NULs, read digits until a
    * terminator; −1 on anything malformed.
    */
  private def parseOctal(bytes: Array[Byte], off: Int, width: Int): Long = {
    var i = off
    val end = off + width
    while (i < end && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
      v = (v << 3) | (bytes(i) - '0'); any = true; i += 1
    }
    while (i < end && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
    if (any && i == end) v else if (any) -1L else -1L
  }
}
