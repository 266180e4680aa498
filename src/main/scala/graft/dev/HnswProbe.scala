package graft.dev

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables.Tpch
import graft.operators.Similarity

/** Dev-only knob probe for the layered HNSW arm (q227 extension):
  * prints (recall@K, n_scored) for the 1-layer baseline and a grid of
  * 2-layer configs, at the given SF dir. Not part of the driver
  * contract; run: `runMain graft.dev.HnswProbe /root/testdata/sf0.01`.
  */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.local(appName = "hnsw-probe")
    val t = Tpch(spark, dir)
    val QMOD = 50; val K = 5
    val SEEDMOD = 25; val NPROBE = 2
    val DEG = 3; val BEAM = 4; val HOPS = 2; val UP = 2
    val queries = t.embeddings.filter(col("vec_id") % QMOD === 0)
    val nq = queries.count()
    val exact = Similarity.topK(t.embeddings, queries, "vec_id",
        "embedding", K)
      .select(col("query_id"), col("corpus_id")).localCheckpoint(true)
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    def eval(name: String, vis: org.apache.spark.sql.DataFrame): Unit = {
      val v = vis.localCheckpoint(true)
      val top = v.withColumn("rk", row_number().over(wr))
        .filter(col("rk") <= K).select(col("query_id"), col("corpus_id"))
      val hits = top.join(exact, Seq("query_id", "corpus_id")).count()
      println(f"[probe] $name%-40s recall=${hits.toDouble / (K * nq)}%.4f " +
        s"n_scored=${v.count()} n_hits=$hits")
    }
    eval("nsw (flat)", Similarity.nswScored(t.embeddings, queries,
      "vec_id", "embedding", SEEDMOD, NPROBE, DEG, BEAM, HOPS))
    eval("hnsw L1 (baseline)", Similarity.hnswScored(t.embeddings, queries,
      "vec_id", "embedding", SEEDMOD, NPROBE, DEG, BEAM, HOPS, UP))
    eval("ivf nprobe=2", Similarity.ivfTopK(t.embeddings, queries,
      "vec_id", "embedding", SEEDMOD, NPROBE, K)
      .select(col("query_id"), col("corpus_id"), col("cosine")))
    eval("mplsh probes=4", Similarity.mpLshScored(t.embeddings, queries,
      "vec_id", "embedding", 8, 4))
    for (lv <- Seq(2, 3); up <- Seq(1, 2); beam <- Seq(2, 3, 4);
         hops <- Seq(1, 2)) {
      eval(s"hnsw L$lv up=$up beam=$beam hops=$hops",
        Similarity.hnswScored(t.embeddings, queries, "vec_id", "embedding",
          SEEDMOD, NPROBE, DEG, beam, hops, up, lv))
    }
    spark.stop()
  }
}
