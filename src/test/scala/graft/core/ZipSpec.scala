package graft.core

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZipSpec extends SparkSpec {
  import spark.implicits._

  private def writeReadBack(rows: Seq[(String, Array[Byte])],
      deflate: Boolean = true) = {
    val tmp = Files.createTempDirectory("zip_spec").toString
    val df = rows.toDF("member_name", "payload").coalesce(1)
    ZipTable.write(df, tmp, deflate)
    (tmp, ZipTable.read(spark, tmp))
  }

  private def shardBytes(tmp: String): Array[Byte] = {
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.toString.endsWith(".zip")).toSeq.head
    Files.readAllBytes(part)
  }

  test("central walk survives seeded fuzz: truncations, corruptions, size bombs") {
    val payload = Array.tabulate(700)(i => (i * 7 % 256).toByte)
    val (tmp, _) = writeReadBack(
      Seq(("a.txt", payload), ("b.bin", payload)))
    val arc = shardBytes(tmp)
    assert(ZipTable.members(arc).size === 2, "fixture must parse clean")
    for (cut <- 0 to arc.length by 7)
      ZipTable.members(arc.take(cut)).size // must not throw
    var lcg = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    for (_ <- 0 until 400) {
      val s = arc.clone()
      for (_ <- 0 to next(4)) s(next(s.length)) = next(256).toByte
      ZipTable.members(s).size // must not throw
    }
    for (off <- 0 until arc.length by 3) {
      val s = arc.clone()
      var i = 0
      while (i < 4 && off + i < s.length) { s(off + i) = 0xFF.toByte; i += 1 }
      ZipTable.members(s).size // size-field bombs must not balloon
    }
  }

  test("write fails loudly past the classic 65535-member cap (no EOCD wrap)") {
    val tmp = Files.createTempDirectory("zip_spec_cap").toString
    val df = spark.range(0x10000L + 1)
      .select(concat(lit("m"), col("id")).as("member_name"),
        lit(Array[Byte](1)).as("payload"))
      .coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      ZipTable.write(df, tmp, deflate = false)
    }
    assert(e.getMessage.contains("65535") ||
      Option(e.getCause).exists(_.getMessage.contains("65535")))
  }

  test("round trip is byte-lossless, stored and deflated, incl. empty members") {
    val rows = Seq(
      ("empty.bin", Array.empty[Byte]),
      ("one.bin", Array[Byte](42)),
      ("text.txt", "the quick brown fox".getBytes("UTF-8")),
      ("rep.bin", Array.fill(4096)(7.toByte))) // deflate actually shrinks
    for (deflate <- Seq(true, false)) {
      val (_, back) = writeReadBack(rows, deflate)
      val got = back.orderBy("member_idx")
        .select("member_name", "member_size", "payload", "member_idx")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getAs[Array[Byte]](2).toSeq, r.getLong(3)))
      assert(got.map(_._1).toSeq === rows.map(_._1),
        s"names/order (deflate=$deflate)")
      for (((name, p), (gn, gs, gp, gi)) <- rows.zip(got)) {
        assert(gn === name)
        assert(gs === p.length.toLong, s"$name size")
        assert(gp === p.toSeq, s"$name payload (deflate=$deflate)")
      }
      assert(got.map(_._4).toSeq === rows.indices.map(_.toLong))
    }
    // deflated shard really is compressed: repetitive payloads shrink
    val (tmpD, _) = writeReadBack(rows, deflate = true)
    val (tmpS, _) = writeReadBack(rows, deflate = false)
    assert(shardBytes(tmpD).length < shardBytes(tmpS).length)
  }

  test("interop: java.util.zip reads our shards; we read java's") {
    val rows = Seq(
      ("x.txt", "hello zip".getBytes("UTF-8")),
      ("y.bin", Array.tabulate(513)(i => (i * 31 % 256).toByte)))
    val (tmp, _) = writeReadBack(rows)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.toString.endsWith(".zip")).toSeq.head
    // java's ZipFile walks the same central directory we wrote
    val zf = new java.util.zip.ZipFile(part.toFile)
    try {
      val entries = zf.entries().asScala.toSeq
      assert(entries.map(_.getName) === rows.map(_._1))
      for ((e, (_, p)) <- entries.zip(rows)) {
        assert(e.getSize === p.length.toLong)
        val got = zf.getInputStream(e).readAllBytes()
        assert(got.toSeq === p.toSeq, s"${e.getName} via java.util.zip")
      }
    } finally zf.close()
    // and our central walk reads a zip java wrote (deflate entries)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    for ((n, p) <- rows) {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(p)
      zos.closeEntry()
    }
    zos.close()
    val ours = ZipTable.members(bos.toByteArray).toSeq
    assert(ours.map(_.getString(0)) === rows.map(_._1))
    for ((r, (_, p)) <- ours.zip(rows)) {
      assert(r.getLong(1) === p.length.toLong)
      assert(r.getAs[Array[Byte]](2).toSeq === p.toSeq)
    }
  }

  test("samples assembly and provenance ride the shared tar contract") {
    val (tmp, members) = writeReadBack(Seq(
      ("1.txt", "alpha".getBytes("UTF-8")),
      ("1.json", """{"k":1}""".getBytes("UTF-8")),
      ("2.txt", "beta".getBytes("UTF-8")),
      ("2.json", """{"k":2}""".getBytes("UTF-8"))))
    assert(members.columns.toSeq ===
      Seq("member_name", "member_size", "payload", "archive", "member_idx"))
    val got = ZipTable.samples(members).orderBy("key").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("1", "2"))
    val parts = got(0).getAs[Map[String, Array[Byte]]]("parts")
    assert(parts.keySet === Set("txt", "json"))
    assert(new String(parts("txt"), "UTF-8") === "alpha")
  }
}
