package graft.tools

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes index-build time at a given core count: tokenize+tf flatMap,
  * groupBy+blob-encode, final write. Run order is CLI-controlled to expose
  * order/JIT effects. */
object BuildProbe {
  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"buildprobe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128L << 10).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_BENCH_DOCS", "60000").toLong
    val order = sys.env.getOrElse("GRAFT_PROBE_ORDER", "8,32,32,8")
      .split(",").map(_.trim.toInt)
    // full = time IndexStore.createSegment (the bench's timed unit) and
    // print the per-stage wallMs recorded by the checkpoint markers,
    // instead of the decomposed flatmap/agg/write pipeline
    val full = sys.env.get("GRAFT_PROBE_FULL").contains("1")
    val work = java.nio.file.Files.createTempDirectory("graft-probe").toString
    locally {
      val s = session(32)
      try CorpusGen.generate(s, n, seed = 42, numRepos = 200)
        .write.mode("overwrite").parquet(s"$work/corpus")
      finally s.stop()
    }
    order.zipWithIndex.foreach { case (cores, i) =>
      val s = session(cores)
      try {
        import s.implicits._
        val corpus = s.read.parquet(s"$work/corpus").as[CorpusDoc]
        if (full) {
          val base = s"$work/idx-$i"
          val store = new graft.index.IndexStore(s, base,
            IndexConfig(shardSpan = 1 << 14))
          val t0 = System.nanoTime()
          store.createSegment(corpus)
          val total = (System.nanoTime() - t0) / 1e9
          val stages = Seq("corpus", "docstats", "postings", "df", "fieldstats")
            .map { st =>
              val f = new java.io.File(s"$base/seg-0/_checkpoints/$st.json")
              if (!f.exists) s"$st=?" else {
                val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
                s"$st=${node.get("wallMs").asLong()}ms"
              }
            }.mkString(" ")
          println(f"[probe] run$i cores=$cores createSegment=${total}%.2fs " +
            f"(${n / total}%.0f docs/s) $stages")
        } else {
          val t0 = System.nanoTime()
          val cnt1 = IndexBuilder.postings(corpus, Seq("content", "repo", "path", "lang", "commit")).count()
          val t1 = System.nanoTime()
          val shards = IndexBuilder.encodeShards(
            IndexBuilder.postings(corpus, Seq("content", "repo", "path", "lang", "commit")), 1 << 14)
          val cnt2 = shards.count()
          val t2 = System.nanoTime()
          shards.sortWithinPartitions("field", "term", "shard")
            .write.mode("overwrite").parquet(s"$work/out-$i")
          val t3 = System.nanoTime()
          println(f"[probe] run$i cores=$cores postings=${cnt1} flatmap=${(t1 - t0) / 1e9}%.2fs " +
            f"agg=${(t2 - t1) / 1e9}%.2fs write=${(t3 - t2) / 1e9}%.2fs shards=$cnt2")
        }
      } finally s.stop()
    }
  }
}
