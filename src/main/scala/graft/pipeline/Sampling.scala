package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data curation.
  *
  * `df.sample` / `df.stat.sampleBy` draw per-partition pseudo-randoms, so
  * the selected ROWS change under repartitioning, AQE, or re-runs — poison
  * for reproducible corpus construction at 100 TB (a re-run of one failed
  * stage would silently pick a different subset). These operators key every
  * decision on a multiplicative hash of a stable id instead: the same row
  * always lands in the same bucket, on any cluster size, forever. Pure
  * map-side Column arithmetic — no shuffle, no UDF, exact DuckDB twin.
  */
object Sampling {

  /** Knuth's multiplicative constant (2^32 / phi). */
  val Knuth: Long = 2654435761L

  /** Bucket granularity: per-million (rate resolution 0.0001%). */
  val Buckets: Long = 1000000L

  /** Deterministic per-row bucket in [0, Buckets): (id · Knuth) mod Buckets,
    * computed as ((id mod B) · (Knuth mod B)) mod B — identical by modular
    * arithmetic, but every intermediate stays < 10^12, so arbitrary 64-bit
    * ids can never overflow (Spark 4 runs ANSI mode, where a raw id·Knuth
    * at id ≳ 3.5e9 would throw; DuckDB BIGINT overflow errors too). */
  def bucket(id: Column): Column =
    pmod(pmod(id, lit(Buckets)) * lit(Knuth % Buckets), lit(Buckets))

  /** SQL twin of [[bucket]] for oracle queries. */
  def bucketSql(idExpr: String): String = {
    val k = Knuth % Buckets
    s"(((($idExpr % $Buckets + $Buckets) % $Buckets) * $k) % $Buckets + $Buckets) % $Buckets"
  }

  /** Stratified sample: keep `ratesPpm(stratum)` parts-per-million of each
    * stratum (unlisted strata are dropped). Unlike `sampleBy`, re-runs and
    * repartitions select the SAME rows. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       ratesPpm: Map[String, Long]): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }

  /** Deterministic train/val/test split: disjoint bucket ranges of the same
    * hash, so membership is stable and the three sets can never overlap —
    * including across separate runs that materialize each split alone. */
  def withSplit(df: DataFrame, idCol: String,
                trainPpm: Long, valPpm: Long): DataFrame = {
    require(trainPpm + valPpm <= Buckets, "train+val rates exceed 100%")
    df.withColumn("split",
      when(bucket(col(idCol)) < trainPpm, "train")
        .when(bucket(col(idCol)) < trainPpm + valPpm, "val")
        .otherwise("test"))
  }
}
