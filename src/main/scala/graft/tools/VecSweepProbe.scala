package graft.tools

import graft.pipeline.{IvfIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the LSH-bucketed vector sweep (`IvfIndex.sweep`, the
  * operator round-4 flagged scale-weak before its keys were widened):
  * n seeded unit-ish vectors + 1% injected exact copies + one degenerate
  * 2,000-copy cluster, swept in LSH mode under the 16-bit × 12-band
  * default scheme with a hot-bucket cap small enough to fire on the
  * degenerate cluster. Verifies that (a) every injected pairwise copy is
  * tombstoned, (b) the capped cluster's victims are STILL removed —
  * identical vectors share every band bucket, so capping them requires
  * the cap to fire per-bucket, not per-vector... they would lose recall;
  * the probe therefore runs the degenerate cluster at a cap ABOVE its
  * size (the documented discipline: exact-dedup such clusters first) and
  * separately demonstrates the cap bounding candidate volume at a small
  * cap. Prints `[probe]` lines; exits nonzero on a miss. */
object VecSweepProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    // optional second arg: sweep threshold — tau=0.95 exercises the
    // adaptive scheme's most expensive point (bandsFor(0.95) = 20 bands
    // vs 3 at the 0.999 default); injected exact dups sweep at any tau
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.999)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("vec-sweep-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val work = java.nio.file.Files.createTempDirectory("graft-vecsweep").toString
    try {
      // deterministic synthetic embeddings: 64 dims from a seeded hash mix
      // (plan-side, no driver data). Base ids [0, n); copies of every
      // 100th at id+10^8; a 2,000-copy degenerate cluster at [2*10^8, +2k)
      // duplicating vector 7.
      val dim = 64
      def vec(idCol: org.apache.spark.sql.Column) = array(
        (0 until dim).map(j =>
          (pmod(xxhash64(idCol, lit(j)), lit(1000000L)).cast("double")
            / 500000.0 - 1.0)): _*)
      val base = spark.range(n).select(col("id").as("vec_id"), vec(col("id")).as("embedding"))
      val copies = spark.range(n).filter(col("id") % 100 === 0)
        .select((col("id") + 100000000L).as("vec_id"), vec(col("id")).as("embedding"))
      val cluster = spark.range(2000)
        .select((col("id") + 200000000L).as("vec_id"), vec(lit(7L)).as("embedding"))
      val nCopies = spark.range(n).filter(col("id") % 100 === 0).count()
      base.unionByName(copies).unionByName(cluster)
        .write.mode("overwrite").parquet(s"$work/emb")
      val emb = spark.read.parquet(s"$work/emb")
      println(s"[probe] corpus: ${emb.count()} vectors ($nCopies pair copies + 2000-copy cluster)")

      val idx = timed(s"IvfIndex.build (${n} + dups)")(
        IvfIndex.build(emb, s"$work/ivf", nLists = 0)) // √n cells
      // LSH-mode sweep, tau-adaptive default scheme (bandsFor(tau) bands
      // of 16-bit keys), cap above the cluster so its 1,999 victims are
      // sweepable
      val swept = timed(s"LSH sweep tau=$tau (default scheme, " +
        s"${graft.pipeline.Similarity.bandsFor(tau)} bands)")(
        idx.sweep(tau = tau))
      require(swept >= nCopies + 1999,
        s"sweep removed $swept < ${nCopies + 1999} injected dups")
      val live = idx.live
      val survivors = live.filter(col("vec_id") >= 100000000L).count()
      require(survivors == 0, s"$survivors injected dup ids survived")
      require(live.filter(col("vec_id") === 7L).count() == 1,
        "cluster keeper (vec 7) must survive")
      println(s"[probe] OK: $swept vectors swept, keepers intact")

      // cap discipline: with a tiny cap the degenerate cluster's buckets
      // are dropped from candidate generation (bounded join), recall on
      // those pairs knowingly sacrificed — candidate volume stays bounded
      val planes = Similarity.hyperplanes(Similarity.DefaultLshBits, dim, 42L)
      val clusterRows = Similarity.lshBucketRows(
        spark.read.parquet(s"$work/emb").filter(col("vec_id") >= 200000000L),
        "vec_id", "v", planes, Similarity.DefaultLshBands, maxBucketDf = 100)
      require(clusterRows.count() == 0,
        "a 2000-copy cluster must be fully df-capped at maxBucketDf=100")
      println("[probe] OK: hot-bucket cap drops the degenerate cluster's buckets")
    } finally {
      try {
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(work), true); ()
      } catch { case _: Exception => () }
      spark.stop()
    }
  }
}
