package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables.Tpch
import graft.operators.Multimodal

/** Multimodal binary-column plumbing exercised end-to-end over real
  * data: documents.text encoded to a binary payload column, then
  * byte-level features (length, md5 checksum, fixed-stride frame
  * samples) — the schema/partitioning/slicing path a real image/audio
  * pipeline rides, with the codec stubbed (see operators.Multimodal).
  *
  * Oracle note: DuckDB 1.0 has no BLOB substring, but the corpus is
  * ASCII, so the oracle slices text then encodes — byte-identical.
  */
object MultimodalQueries {

  private val FRAME = 32
  private val STRIDE = 64

  private val q29 = Q(
    "q29_binary_features",
    (s, dir) => {
      val t = Tpch(s, dir)
      val bin = t.documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      bin.select(
          col("doc_id"),
          octet_length(col("content")).as("byte_len"),
          md5(col("content")).as("checksum"),
          floor((octet_length(col("content")) + lit(STRIDE - 1))
            / lit(STRIDE.toDouble)).cast("long").as("n_frames"),
          base64(col("content").substr(lit(1), lit(FRAME))).as("frame0_b64"),
          base64(col("content").substr(lit(STRIDE + 1), lit(FRAME))).as("frame1_b64"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
      octet_length(encode(text)) AS byte_len,
      md5(text) AS checksum,
      CAST(floor((octet_length(encode(text)) + ${STRIDE - 1}) / ${STRIDE}.0) AS BIGINT) AS n_frames,
      base64(encode(substr(text, 1, $FRAME))) AS frame0_b64,
      base64(encode(substr(text, ${STRIDE + 1}, $FRAME))) AS frame1_b64
    FROM documents
    ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(q29)
}
