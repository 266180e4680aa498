package graft.core

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TarSpec extends SparkSpec {
  import spark.implicits._

  private def writeReadBack(rows: Seq[(String, Array[Byte])]) = {
    val tmp = Files.createTempDirectory("tar_spec").toString
    val df = rows.toDF("member_name", "payload").coalesce(1)
    TarTable.write(df, tmp)
    (tmp, TarTable.read(spark, tmp))
  }

  test("member walk survives seeded fuzz: truncations, corruptions, size bombs") {
    // the CodecFuzzSpec contract applied to the archive walker: every
    // truncation, a seeded sample of byte corruptions, and a sliding
    // 0xFF window (maxing every octal size field) must CLEAN-STOP —
    // never throw, never overrun, never spin
    val payload = Array.tabulate(700)(i => (i * 7 % 256).toByte)
    val arc = {
      val bos = new java.io.ByteArrayOutputStream()
      for (n <- Seq("a.txt", "b.bin")) {
        bos.write(TarTable.header(n, payload.length.toLong))
        bos.write(payload)
        bos.write(new Array[Byte](512 - payload.length % 512))
      }
      bos.write(new Array[Byte](1024))
      bos.toByteArray
    }
    assert(TarTable.members(arc).size === 2, "fixture must parse clean")
    for (cut <- 0 to arc.length by 7)
      TarTable.members(arc.take(cut)).size // must not throw
    var lcg = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    for (_ <- 0 until 400) {
      val s = arc.clone()
      for (_ <- 0 to next(4)) s(next(s.length)) = next(256).toByte
      TarTable.members(s).size // must not throw
    }
    for (off <- 0 until arc.length by 3) {
      val s = arc.clone()
      var i = 0
      while (i < 4 && off + i < s.length) { s(off + i) = 0xFF.toByte; i += 1 }
      TarTable.members(s).size // size-field bombs must not balloon
    }
  }

  test("round trip is byte-lossless across every padding edge") {
    // 0 / 1 / 511 / 512 / 513-byte payloads hit the header-only,
    // partial-block, exact-block, and block+1 padding branches
    val rows = Seq(
      "empty.bin" -> Array.empty[Byte],
      "one.bin" -> Array[Byte](42),
      "b511.bin" -> Array.tabulate(511)(i => (i % 251).toByte),
      "b512.bin" -> Array.tabulate(512)(i => (i % 253).toByte),
      "b513.bin" -> Array.tabulate(513)(i => (i % 255).toByte),
      "utf8 nåme.txt" -> "unicode påyload ∑".getBytes("UTF-8"))
    val (_, back) = writeReadBack(rows)
    val got = back.collect().map(r => r.getAs[String]("member_name") ->
      r.getAs[Array[Byte]]("payload")).toMap
    assert(got.keySet === rows.map(_._1).toSet)
    rows.foreach { case (n, p) =>
      assert(got(n).toSeq === p.toSeq, s"member $n")
      assert(back.filter(col("member_name") === n).head()
        .getAs[Long]("member_size") === p.length.toLong)
    }
  }

  test("header is golden-byte deterministic: octal fields, magic, checksum") {
    val h = TarTable.header("hello.txt", 11L)
    assert(h.length === 512)
    assert(new String(h, 0, 9, "UTF-8") === "hello.txt" && h(9) === 0)
    assert(new String(h, 100, 7, "UTF-8") === "0000644") // mode
    assert(new String(h, 124, 11, "UTF-8") === "00000000013") // 11 = 013 octal
    assert(new String(h, 257, 5, "UTF-8") === "ustar" && h(262) === 0)
    assert(h(263) === '0'.toByte && h(264) === '0'.toByte)
    assert(h(156) === '0'.toByte) // regular file
    // checksum: sum of all header bytes with the checksum field as
    // spaces, stored as 6 octal digits + NUL + space
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val want = copy.foldLeft(0L)((a, b) => a + (b & 0xff))
    val stored = new String(h, 148, 6, "UTF-8")
    assert(java.lang.Long.parseLong(stored, 8) === want)
    assert(h(154) === 0 && h(155) === ' '.toByte)
    // determinism: same input, same bytes
    assert(TarTable.header("hello.txt", 11L).toSeq === h.toSeq)
  }

  test("GNU tar reads our shards; we read GNU tar's") {
    assume(Files.exists(Paths.get("/usr/bin/tar")) ||
      Files.exists(Paths.get("/bin/tar")))
    val (tmp, _) = writeReadBack(Seq(
      "0001.txt" -> "first doc".getBytes("UTF-8"),
      "0001.json" -> """{"id":1}""".getBytes("UTF-8")))
    val shard = Files.list(Paths.get(tmp)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.find(_.toString.endsWith(".tar")).get.toString
    // list + extract with the system tar: a non-zero exit or byte
    // mismatch fails the interop pin
    val lst = new ProcessBuilder("tar", "-tf", shard).start()
    val names = scala.io.Source.fromInputStream(lst.getInputStream)
      .getLines().toList
    assert(lst.waitFor() === 0)
    assert(names.sorted === List("0001.json", "0001.txt"))
    val ex = Files.createTempDirectory("tar_x").toString
    val unp = new ProcessBuilder("tar", "-xf", shard, "-C", ex).start()
    assert(unp.waitFor() === 0)
    assert(new String(Files.readAllBytes(Paths.get(ex, "0001.txt")),
      "UTF-8") === "first doc")
    // reverse direction: an archive GNU tar wrote parses identically
    val src = Files.createTempDirectory("tar_src")
    Files.write(src.resolve("a.txt"), "alpha".getBytes("UTF-8"))
    Files.write(src.resolve("b.bin"), Array.tabulate(700)(_.toByte))
    val gnuDir = Files.createTempDirectory("tar_gnu").toString
    val mk = new ProcessBuilder("tar", "-cf", s"$gnuDir/gnu.tar",
      "-C", src.toString, "a.txt", "b.bin").start()
    assert(mk.waitFor() === 0)
    val back = TarTable.read(spark, gnuDir).collect()
      .map(r => r.getAs[String]("member_name") ->
        r.getAs[Array[Byte]]("payload")).toMap
    assert(back("a.txt").toSeq === "alpha".getBytes("UTF-8").toSeq)
    assert(back("b.bin").toSeq === Array.tabulate(700)(_.toByte).toSeq)
  }

  test("samples assembles members by basename key; corruption stops cleanly") {
    val (tmp, members) = writeReadBack(Seq(
      "7.txt" -> "seven".getBytes("UTF-8"),
      "7.json" -> """{"k":7}""".getBytes("UTF-8"),
      "8.txt" -> "eight".getBytes("UTF-8")))
    val got = TarTable.samples(members).collect()
      .map(r => r.getAs[String]("key") ->
        r.getAs[Map[String, Array[Byte]]]("parts").view
          .mapValues(new String(_, "UTF-8")).toMap).toMap
    assert(got("7") === Map("txt" -> "seven", "json" -> """{"k":7}"""))
    assert(got("8") === Map("txt" -> "eight"))
    // truncate mid-payload and flip magic bytes: reader must emit the
    // intact prefix (or nothing) without throwing
    val shard = Files.list(Paths.get(tmp)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.find(_.toString.endsWith(".tar")).get
    val bytes = Files.readAllBytes(shard)
    for (cut <- Seq(bytes.length - 700, 600, 100, 0)) {
      val dir = Files.createTempDirectory("tar_cut").toString
      Files.write(Paths.get(dir, "cut.tar"),
        java.util.Arrays.copyOfRange(bytes, 0, math.max(cut, 0)))
      val n = TarTable.read(spark, dir).count() // must not throw
      assert(n <= 3)
    }
    val garbled = bytes.clone()
    garbled(258) = 'X' // break magic of the first header
    val dir = Files.createTempDirectory("tar_bad").toString
    Files.write(Paths.get(dir, "bad.tar"), garbled)
    assert(TarTable.read(spark, dir).count() === 0)
  }

  test("duplicate member names: samples keeps the last, never throws") {
    // legal tar: a later member with the same name overrides on
    // extract. Pre-fix this threw MAP_KEY_DUPLICATE under Spark's
    // default mapKeyDedupPolicy=EXCEPTION.
    val (_, members) = writeReadBack(Seq(
      "9.txt" -> "first".getBytes("UTF-8"),
      "9.json" -> """{"k":9}""".getBytes("UTF-8"),
      "9.txt" -> "second".getBytes("UTF-8"),
      "9.txt" -> "third".getBytes("UTF-8")))
    assert(members.count() === 4) // read surface keeps every member
    val got = TarTable.samples(members).collect()
      .map(r => r.getAs[String]("key") ->
        r.getAs[Map[String, Array[Byte]]]("parts").view
          .mapValues(new String(_, "UTF-8")).toMap).toMap
    assert(got === Map("9" -> Map("txt" -> "third", "json" -> """{"k":9}""")))
  }
}
