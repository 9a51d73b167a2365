package graft.index

import graft.core.IndexConfig
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Multi-app namespace registry: one [[IndexStore]] per app name under a
  * root directory — the catalog layer the reference keeps as named
  * in-memory indexes (`indexing.go:28, 40-44, 69-76`) with `ListApps`
  * enumeration (`indexing.go:196-202`).
  *
  * An "app" here IS a directory with a committed manifest; no separate
  * registry state exists, so the catalog can never disagree with storage
  * (the reference's in-memory map is rebuilt from disk the same way on
  * startup, `indexing.go:69-76`).
  */
class AppRegistry(val spark: SparkSession, val rootDir: String,
                  val cfg: IndexConfig = IndexConfig()) {
  import spark.implicits._

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(rootDir).getFileSystem(hconf)

  /** Floor for [[listTimeout]]: a small catalog on a healthy FS finishes
    * in seconds, so ten minutes only ever signals a stall. */
  private val ListTimeoutFloor = scala.concurrent.duration.Duration(10, "min")

  /** Stall deadline for the listApps metadata fan-out, scaled to the work:
    * a fixed ceiling fails HEALTHY large catalogs (10^4 apps on a
    * throttled object store at ~0.5 s/app over an 8-thread pool needs
    * ~10 min of legitimate wall time), while no deadline at all hangs the
    * listing on one dead FS probe. Budget 2 s per app per pool thread —
    * an order of magnitude over observed healthy reads — on top of the
    * floor. */
  private def listTimeout(nApps: Int, poolSize: Int) =
    ListTimeoutFloor.max(scala.concurrent.duration.Duration(
      2L * nApps / math.max(poolSize, 1) + 60, "s"))

  /** App names must be path-safe (one directory level; "." and ".." would
    * escape the namespace — dropApp("..") must never delete the parent) and
    * must not end in IndexStore.compact()'s reserved working suffixes: an
    * app named "x.compact" would be destroyed by compacting app "x", and a
    * crashed compact's "x.old" must never surface as a phantom app. */
  private def validate(name: String): String = {
    require(name.nonEmpty && name != "." && name != ".." &&
      !name.endsWith(".compact") && !name.endsWith(".old") &&
      name.forall(c => c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"invalid app name: $name")
    name
  }

  /** The app's store (creates nothing until a segment commits). An existing
    * app adopts its persisted storage layout; a new one uses this
    * registry's config. */
  def app(name: String): IndexStore =
    IndexStore.open(spark, s"$rootDir/${validate(name)}", cfg)

  def exists(name: String): Boolean =
    fs.exists(new Path(s"$rootDir/${validate(name)}/manifest.json"))

  /** Registered app names = child directories with a committed manifest,
    * excluding compact()'s reserved working directories. */
  def appNames(): Seq[String] = {
    val root = new Path(rootDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        !st.getPath.getName.endsWith(".compact") &&
        !st.getPath.getName.endsWith(".old") &&
        fs.exists(new Path(st.getPath, "manifest.json")))
      .map(_.getPath.getName)
      .sorted
  }

  /** The reference's ListApps surface: per-app segment and live-doc counts.
    * Runs AT MOST ONE Spark job regardless of app count: manifest reads and
    * tombstone row counts are driver-side FS/footer metadata; apps without
    * tombstones report Σ manifest numDocs directly, and the tombstone
    * corrections of every remaining app are unioned into a single
    * killed-count plan (slim docstats ⋉ tombstones per app) collected once.
    * A 10^4-app catalog listing must not schedule 10^4 count jobs. */
  def listApps(): DataFrame = {
    // per-app manifest/footer reads are independent driver-side FS
    // round-trips — fan them out on a thread pool (like IndexStore's
    // parquetFileMetrics): a 10^4-app catalog must not pay 10^4
    // SEQUENTIAL metadata reads while every core sits idle. The pool is
    // BOUNDED and DEDICATED (the global pool is shared with
    // parquetFileMetrics' inner futures — unbounded fan-out there could
    // starve this listing and vice versa), and the wait is FINITE: one
    // hung filesystem probe (a dead remote FS) must fail the listing with
    // the stalled app's name, not hang the whole catalog forever.
    val infos = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      // DAEMON threads: a read still blocked on the dead FS after the
      // timeout fired must not keep the JVM alive once the driver exits
      val poolSize = math.min(32, Runtime.getRuntime.availableProcessors * 2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        poolSize,
        (r: Runnable) => {
          val t = new Thread(r, "graft-listapps")
          t.setDaemon(true)
          t
        })
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        val names = appNames()
        val deadline = listTimeout(names.size, poolSize)
        val futs = names.map { name => name -> Future {
          // raw constructor, not app(): the listing reads only the manifest's
          // segment list and tombstone footers — both layout-independent — so
          // open()'s extra per-app manifest probe would double the driver-side
          // FS round-trips of a large catalog for nothing
          val store = new IndexStore(spark, s"$rootDir/$name", cfg)
          (name, store.segments, store.tombstoneCount())
        }}
        try Await.result(Future.sequence(futs.map(_._2)), deadline)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            val stalled = futs.filterNot(_._2.isCompleted).map(_._1)
            sys.error(s"listApps: metadata reads still pending after " +
              s"$deadline for apps [${stalled.take(10).mkString(", ")}" +
              s"${if (stalled.size > 10) s", … ${stalled.size} total" else ""}] " +
              "— filesystem stalled?")
        }
      } finally {
        // shutdownNow (not shutdown): interrupt the stalled reads too —
        // plain shutdown only stops NEW submissions and would leak a
        // blocked thread per timed-out listing in a long-lived server
        pool.shutdownNow(); ()
      }
    }
    val plain = infos.collect { case (name, segs, 0L) =>
      (name, segs.size.toLong, segs.map(_.numDocs).sum)
    }
    val tombstoned = infos.filter(_._3 > 0L)
    val corrected =
      if (tombstoned.isEmpty) Seq.empty[(String, Long, Long)]
      else {
        // AQE would execute each shuffle stage of the unioned plan as its
        // own job; the correction query is metadata-sized (docstats ids +
        // tombstones, never the corpus), so run it on a cloned session with
        // AQE off — one action, one job, regardless of app count
        val s = spark.newSession()
        s.conf.set("spark.sql.adaptive.enabled", "false")
        // broadcast exchanges materialize as their own jobs too — shuffle
        // joins keep the whole correction union inside the single action
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val kills = tombstoned.map { case (name, _, _) =>
            new IndexStore(s, s"$rootDir/$name", cfg)
              .killedDocCountDF().withColumn("app", lit(name))
          }.reduce(_ unionByName _)
          .collect().map(r => r.getAs[String]("app") -> r.getAs[Long]("n_killed"))
          .toMap
        tombstoned.map { case (name, segs, _) =>
          (name, segs.size.toLong, segs.map(_.numDocs).sum - kills.getOrElse(name, 0L))
        }
      }
    (plain ++ corrected).sortBy(_._1).toDF("app", "n_segments", "n_docs")
  }

  /** Drop an app (delete its store directory). */
  def dropApp(name: String): Boolean =
    fs.delete(new Path(s"$rootDir/${validate(name)}"), true)
}
