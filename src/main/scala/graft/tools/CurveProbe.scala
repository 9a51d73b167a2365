package graft.tools

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.index.IndexStore

/** Measures full segment-build time across a ladder of core counts to locate
  * the memory-bandwidth ceiling of this VM and pick the N vs 4N pair for the
  * scaling benchmark. */
object CurveProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_BENCH_DOCS", "250000").toLong
    val ladder = sys.env.getOrElse("GRAFT_PROBE_LADDER", "2,4,8,16,32")
      .split(",").map(_.trim.toInt)
    val work = java.nio.file.Files.createTempDirectory("graft-curve").toString
    locally {
      val s = BuildProbe.session(32)
      try {
        CorpusGen.generate(s, n, seed = 42, numRepos = 200)
          .write.mode("overwrite").parquet(s"$work/corpus")
        CorpusGen.generate(s, 5000, seed = 99, numRepos = 20)
          .write.mode("overwrite").parquet(s"$work/warmup")
      } finally s.stop()
    }
    val results = ladder.map { cores =>
      val s = BuildProbe.session(cores)
      try {
        import s.implicits._
        new IndexStore(s, s"$work/w-$cores", IndexConfig(shardSpan = 1 << 14))
          .createSegment(s.read.parquet(s"$work/warmup").as[CorpusDoc])
        val m = new TaskMetricsListener
        s.sparkContext.addSparkListener(m)
        val t0 = System.nanoTime()
        new IndexStore(s, s"$work/i-$cores", IndexConfig(shardSpan = 1 << 14))
          .createSegment(s.read.parquet(s"$work/corpus").as[CorpusDoc])
        val sec = (System.nanoTime() - t0) / 1e9
        s.sparkContext.removeSparkListener(m)
        println(f"[curve] cores=$cores%2d sec=$sec%.1f docs_per_sec=${n / sec}%.0f " +
          m.report(sec, cores) + m.timeline())
        cores -> sec
      } finally s.stop()
    }
    results.sliding(2).foreach {
      case Array((c1, t1), (c2, t2)) =>
        println(f"[curve] $c1->$c2: speedup=${t1 / t2}%.2f eff=${t1 / t2 / (c2.toDouble / c1)}%.2f")
      case _ =>
    }
  }
}
