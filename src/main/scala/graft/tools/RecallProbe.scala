package graft.tools

import graft.corpus.Corpus
import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: recall@5 of the approximate ANN operators vs brute force
  * across parameter settings, at a given sf dir — used to pick the
  * registered (nLists, nProbe) / (nBits, bands) so the driver-visible
  * recall gate (q_ann_*_recall, ≥ 0.8) holds with margin at every sf. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("recall-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Corpus.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(q, emb, 5).select("qid", "vec_id").cache()
    val n = brute.count()
    for ((nl, np) <- Seq((16, 4), (16, 6), (16, 8), (32, 8), (8, 4))) {
      val ivf = Similarity.ivfTopK(q, emb, 5, nLists = nl, nProbe = np)
        .select("qid", "vec_id")
      val hits = brute.join(ivf, Seq("qid", "vec_id"), "left_semi").count()
      println(s"[probe] $sf ivf nLists=$nl nProbe=$np hits=$hits/$n")
    }
    for ((nb, bd) <- Seq((16, 8), (16, 4), (24, 12))) {
      val lsh = Similarity.lshTopK(q, emb, 5, nBits = nb, bands = bd,
        maxBucketDf = 0)
        .select("qid", "vec_id")
      val hits = brute.join(lsh, Seq("qid", "vec_id"), "left_semi").count()
      println(s"[probe] $sf lsh nBits=$nb bands=$bd hits=$hits/$n")
    }
    // add-path: quantizer frozen on 80% of the corpus, the held-out 20%
    // wave added against the frozen centroids — the q_ann_ivf_recall
    // incremental scenario. Measures how much frozen-quantizer drift costs.
    locally {
      val dir = java.nio.file.Files.createTempDirectory("probe-ivf").toString
      val idx = graft.pipeline.IvfIndex.build(
        emb.filter(col("vec_id") % 5 =!= 3), dir, nLists = 16, seed = 42L)
      idx.add(emb.filter(col("vec_id") % 5 === 3).select("vec_id", "embedding"))
      val got = idx.topK(q, 5, nProbe = 8).select("qid", "vec_id")
      val hits = brute.join(got, Seq("qid", "vec_id"), "left_semi").count()
      println(s"[probe] $sf ivf-add80 nLists=16 nProbe=8 hits=$hits/$n")
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
