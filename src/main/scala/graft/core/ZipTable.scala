package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** PKZIP interchange (PKWARE APPNOTE layout) — the other archive
  * format training corpora ship in next to [[TarTable]]'s WebDataset
  * tars. Pure-JVM codec: the writer emits stored or deflated members
  * with a central directory; the reader walks the CENTRAL DIRECTORY
  * (located via the end-of-central-directory record), which is the
  * format's defining feature vs tar — a central index that makes
  * selective member access possible without scanning payloads.
  *
  * Determinism: fixed version/flag/timestamp fields (DOS epoch
  * 1980-01-01), fixed deflate level — byte-identical inputs produce
  * byte-identical shards, the engine's reproducibility contract.
  * Interop is pinned by ZipSpec against `java.util.zip` both ways.
  *
  * Corruption / bomb contract (the TAR/WARC discipline):
  *  - never throws on malformed bytes: structural violations stop the
  *    central walk cleanly; per-member violations (bad method, sizes
  *    out of bounds, CRC mismatch) skip that member and continue —
  *    the central directory stays walkable around a damaged member;
  *  - allocation is bounded: a member only allocates its DECLARED
  *    uncompressed size after that size passes the [[MaxMember]] cap
  *    and its compressed extent passes the bytes-present check, so a
  *    forged 4 GiB size field cannot balloon (the size-field-bomb
  *    fuzz lane), and inflation stops at the declared bound;
  *  - ZIP64 is out of scope (members stay under 4 GiB — shards are
  *    ~1 GB by the same sizing discipline as tar/WARC).
  *
  * Scale notes (100 TB): zip shards are one-file-one-task like tar
  * (the deflate streams aren't splittable mid-member); parallelism
  * comes from shard count. Reading is a `binaryFile` scan → per-
  * partition central walk — one pass, memory bounded by one member.
  * Sample assembly reuses [[TarTable.samples]] (identical schema).
  */
object ZipTable {

  /** Same read-back schema and provenance contract as
    * [[TarTable.schema]]: (archive, member_idx) is the stable total
    * order (member_idx = central-directory position).
    */
  val schema: StructType = TarTable.schema

  /** Per-member allocation cap: a declared uncompressed size above
    * this skips the member instead of allocating (zip-bomb guard).
    */
  private[core] val MaxMember: Int = 1 << 28 // 256 MiB

  /** Write `df` as sharded .zip files (one per partition). Expected
    * columns: member_name (string), payload (binary). Existing output
    * is replaced. Member order within a shard is the partition's row
    * order (callers sort samples adjacent, the WebDataset convention).
    */
  def write(df: DataFrame, path: String, deflate: Boolean = true): Unit = {
    val out = new Path(path)
    val fs = out.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.delete(out, true)
    fs.mkdirs(out)
    val cols = df.select(col("member_name"), col("payload"))
    cols.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val part = new Path(out, f"part-$pid%05d.zip")
        val efs = part.getFileSystem(new Configuration())
        val os = efs.create(part, true)
        try {
          // stream local headers + data; buffer the (small) central
          // records: 46 + name bytes per member, not the payloads
          val central = new java.io.ByteArrayOutputStream()
          var offset = 0L
          var nMembers = 0L
          rows.foreach { r =>
            // Classic (non-ZIP64) limits: 16-bit member count, 32-bit
            // offsets. Fail loudly rather than wrap — a wrapped EOCD
            // count makes the central-directory reader silently drop
            // the excess members on read-back.
            require(nMembers < 0xFFFFL,
              s"zip shard exceeds 65535 members (ZIP64 not supported); " +
                s"repartition to smaller shards")
            require(offset <= 0xFFFFFFFFL,
              s"zip shard exceeds 4 GiB offset $offset (ZIP64 not supported)")
            val name = r.getString(0).getBytes(UTF_8)
            val payload = r.getAs[Array[Byte]](1)
            val crc = new CRC32(); crc.update(payload)
            val (method, data) =
              if (deflate) (8, deflateBytes(payload)) else (0, payload)
            val lh = java.nio.ByteBuffer.allocate(30 + name.length)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            lh.putInt(0x04034b50).putShort(20).putShort(0)
              .putShort(method.toShort)
              .putShort(0).putShort(0x21) // DOS time 0, date 1980-01-01
              .putInt(crc.getValue.toInt)
              .putInt(data.length).putInt(payload.length)
              .putShort(name.length.toShort).putShort(0)
              .put(name)
            os.write(lh.array()); os.write(data)
            val ce = java.nio.ByteBuffer.allocate(46 + name.length)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            ce.putInt(0x02014b50).putShort(20).putShort(20).putShort(0)
              .putShort(method.toShort)
              .putShort(0).putShort(0x21)
              .putInt(crc.getValue.toInt)
              .putInt(data.length).putInt(payload.length)
              .putShort(name.length.toShort).putShort(0).putShort(0)
              .putShort(0).putShort(0).putInt(0)
              .putInt(offset.toInt)
              .put(name)
            central.write(ce.array())
            offset += 30 + name.length + data.length
            nMembers += 1
          }
          val cd = central.toByteArray
          os.write(cd)
          val eocd = java.nio.ByteBuffer.allocate(22)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          eocd.putInt(0x06054b50).putShort(0).putShort(0)
            .putShort(nMembers.toShort).putShort(nMembers.toShort)
            .putInt(cd.length).putInt(offset.toInt).putShort(0)
          os.write(eocd.array())
        } finally os.close()
      }
    }
  }

  /** Parse every member of every .zip file under `path` via the
    * central-directory walk, tagging rows with (archive, member_idx)
    * provenance per [[schema]].
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip").load(path)
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
  def roundTrip(df: DataFrame, path: String, deflate: Boolean = true)
      : DataFrame = {
    write(df, path, deflate)
    read(df.sparkSession, path)
  }

  /** WebDataset sample assembly — identical schema, identical rule:
    * delegate to [[TarTable.samples]].
    */
  def samples(members: DataFrame): DataFrame = TarTable.samples(members)

  private def deflateBytes(payload: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6, true) // raw deflate, fixed level
    d.setInput(payload); d.finish()
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, payload.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Walk one archive's central directory; yields (name, size,
    * payload) rows. Clean stop on structural violations, clean SKIP
    * on per-member ones — never throws, never allocates past
    * [[MaxMember]] or the bytes present.
    */
  private[core] def members(bytes: Array[Byte]): Iterator[Row] = {
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    if (bytes == null || bytes.length < 22) return out.iterator
    // EOCD: last PK\5\6 within the final 64 KiB + 22 (max comment)
    val floor = math.max(0, bytes.length - 65557)
    var e = bytes.length - 22
    var eocd = -1
    while (e >= floor && eocd < 0) {
      if (bytes(e) == 'P' && bytes(e + 1) == 'K' && bytes(e + 2) == 5 &&
        bytes(e + 3) == 6) eocd = e
      e -= 1
    }
    if (eocd < 0) return out.iterator
    val nEntries = le16(bytes, eocd + 10)
    val cdOff = le32(bytes, eocd + 16)
    if (cdOff < 0 || cdOff > bytes.length) return out.iterator
    var pos = cdOff
    var i = 0
    var done = false
    while (!done && i < nEntries) {
      if (pos + 46 > bytes.length ||
          !(bytes(pos.toInt) == 'P' && bytes(pos.toInt + 1) == 'K' &&
            bytes(pos.toInt + 2) == 1 && bytes(pos.toInt + 3) == 2)) {
        done = true // structural: central chain broken
      } else {
        val p = pos.toInt
        val method = le16(bytes, p + 10)
        val crc = le32(bytes, p + 16)
        val csize = le32(bytes, p + 20)
        val usize = le32(bytes, p + 24)
        val nameLen = le16(bytes, p + 28)
        val extraLen = le16(bytes, p + 30)
        val cmtLen = le16(bytes, p + 32)
        val localOff = le32(bytes, p + 42)
        if (p + 46 + nameLen > bytes.length) done = true
        else {
          val name = new String(bytes, p + 46, nameLen, UTF_8)
          // local header carries its OWN name/extra lengths (may
          // differ from central); central sizes are authoritative
          val payload: Option[Array[Byte]] =
            if (localOff + 30 > bytes.length ||
                !(bytes(localOff.toInt) == 'P' &&
                  bytes(localOff.toInt + 1) == 'K' &&
                  bytes(localOff.toInt + 2) == 3 &&
                  bytes(localOff.toInt + 3) == 4)) None
            else {
              val lo = localOff.toInt
              val dataOff = localOff + 30 + le16(bytes, lo + 26) +
                le16(bytes, lo + 28)
              if (dataOff + csize > bytes.length || usize > MaxMember ||
                  csize > MaxMember) None
              else method match {
                case 0 if csize == usize =>
                  Some(java.util.Arrays.copyOfRange(bytes,
                    dataOff.toInt, (dataOff + csize).toInt))
                case 8 =>
                  inflateBounded(bytes, dataOff.toInt, csize.toInt,
                    usize.toInt)
                case _ => None
              }
            }
          payload match {
            case Some(data) =>
              val c = new CRC32(); c.update(data)
              // CRC mismatch ⇒ damaged member: skip, keep walking
              if (c.getValue == crc) out += Row(name, usize, data)
            case None => // skip member, keep walking the directory
          }
          pos += 46 + nameLen + extraLen + cmtLen
          i += 1
        }
      }
    }
    out.iterator
  }

  /** Inflate exactly `usize` bytes (already cap-checked) from the raw
    * deflate stream at [off, off+csize); None on any inflater error,
    * short output, or output beyond the declared size.
    */
  private def inflateBounded(bytes: Array[Byte], off: Int, csize: Int,
      usize: Int): Option[Array[Byte]] = {
    val inf = new Inflater(true)
    try {
      inf.setInput(bytes, off, csize)
      val out = new Array[Byte](usize)
      var n = 0
      var stalled = false
      while (n < usize && !inf.finished() && !stalled) {
        val got = inf.inflate(out, n, usize - n)
        if (got == 0 && (inf.needsInput() || inf.needsDictionary()))
          stalled = true // truncated/garbled stream: clean reject
        n += got
      }
      // declared size must be exact: stream must END here too
      if (n == usize && (inf.finished() ||
          inf.inflate(new Array[Byte](1)) == 0)) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }
}
