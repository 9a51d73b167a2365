package graft.tools

import org.apache.spark.sql.SparkSession

/** Environment probe: pure-CPU scaling of this sandbox at two local[N]
  * levels, independent of the engine (diagnoses bench scaling). */
object ScaleProbe {
  def run(cores: Int, n: Long): Double = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      val t0 = System.nanoTime()
      val r = s.range(0, n, 1, cores * 4).rdd.map { i =>
        var h = i
        var j = 0
        while (j < 2000) { h = h * 6364136223846793005L + 1442695040888963407L; j += 1 }
        h
      }.reduce(_ ^ _)
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"[probe] cores=$cores n=$n sec=$sec checksum=$r")
      sec
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = 3000000L
    val t8 = run(8, n)
    val t32 = run(32, n)
    println(f"[probe] speedup=${t8 / t32}%.2f efficiency=${t8 / t32 / 4}%.2f")
  }
}
