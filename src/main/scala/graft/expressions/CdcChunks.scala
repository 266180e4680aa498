package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of one document in ONE expression eval:
  * tokenize (Spark's trim+split semantics, identical to
  * [[ShingleHashes]]), roll the w-gram polynomial hash, close a chunk
  * at token i+w-1 wherever hash(window i) ≡ 0 mod divisor (plus the
  * final token), and emit `array<struct<n_tokens, chunk_idx,
  * chunk_start, chunk_end, chunk_len, chunk_hash>>` with chunk_hash =
  * md5 of the space-joined token span.
  *
  * Why an expression and not the equivalent HOF/posexplode pipeline:
  * the declarative formulation (transform/filter over
  * graft_shingle_hashes + posexplode carrying the token array) was
  * semantically right but CollapseProject inlines the token/boundary
  * expressions PAST the Generate, so they re-evaluate per chunk row
  * and per reference — measured ~10× the one-pass cost at sf0.1 (the
  * q30/semanticDedup no-CSE lesson, this time through a generator).
  * Here the whole per-doc computation is a single generator input
  * evaluated once per document; the explode then only expands
  * precomputed structs. Per-row narrow work, zero shuffle, O(chars +
  * chunks·span) per document.
  *
  * Boundary semantics mirror the DuckDB oracle in
  * TrainingPrepQueries.cdcEndsSql exactly: 1-based token positions,
  * ends = sorted distinct {i + w − 1 : hash_i ≡ 0 (mod divisor)} ∪
  * {n_tokens}; chunk k spans (prev end + 1) .. ends(k).
  */
case class CdcChunksExpr(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1 && divisor >= 1, "cdc chunking needs w >= 1, divisor >= 1")

  private val structType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_start", IntegerType, nullable = false),
    StructField("chunk_end", IntegerType, nullable = false),
    StructField("chunk_len", IntegerType, nullable = false),
    StructField("chunk_hash", StringType, nullable = false)))

  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks expects STRING, got ${child.dataType.simpleString}")

  override def nullable: Boolean = child.nullable

  // one digest per task-deserialized expression instance (not shared
  // across tasks); MessageDigest.digest() resets state between rows
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    // ' '-only trim + split("\\s+", -1): Spark's trim/split semantics,
    // byte-compatible with ShingleHashes (see its comment)
    val raw = v.asInstanceOf[UTF8String].toString
    var start = 0
    var end = raw.length
    while (start < end && raw.charAt(start) == ' ') start += 1
    while (end > start && raw.charAt(end - 1) == ' ') end -= 1
    val tokens = raw.substring(start, end).split("\\s+", -1)
    val n = tokens.length // split never yields an empty array: n >= 1

    // chunk ends, 1-based: i + w - 1 for every shingle position i
    // (1-based) whose rolling hash ≡ 0 mod divisor, plus the final
    // token. Positions are generated in increasing order, so "sorted
    // distinct with n appended" is just "skip a duplicate final end".
    val ends = new java.util.ArrayList[Int]()
    val nShingles = n - w + 1
    var i = 0
    while (i < nShingles) {
      var h = 0L
      var j = 0
      while (j < w) {
        if (j > 0) h = (h * 31L + ' ') % RollingHash.P
        val t = tokens(i + j)
        var k = 0
        while (k < t.length) { h = (h * 31L + t.charAt(k)) % RollingHash.P; k += 1 }
        j += 1
      }
      if (h % divisor == 0) ends.add(i + w) // (i+1) + w - 1, 1-based
      i += 1
    }
    if (ends.isEmpty || ends.get(ends.size - 1) != n) ends.add(n)

    val out = new Array[Any](ends.size)
    var prevEnd = 0
    var c = 0
    while (c < ends.size) {
      val ce = ends.get(c)
      val cs = prevEnd + 1
      val sb = new java.lang.StringBuilder
      var t = cs - 1
      while (t < ce) {
        if (t > cs - 1) sb.append(' ')
        sb.append(tokens(t))
        t += 1
      }
      val digest = md5.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val hex = new java.lang.StringBuilder(32)
      var b = 0
      while (b < digest.length) {
        hex.append(Character.forDigit((digest(b) >> 4) & 0xf, 16))
        hex.append(Character.forDigit(digest(b) & 0xf, 16))
        b += 1
      }
      out(c) = new GenericInternalRow(Array[Any](
        n, c + 1, cs, ce, ce - cs + 1, UTF8String.fromString(hex.toString)))
      prevEnd = ce
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}
