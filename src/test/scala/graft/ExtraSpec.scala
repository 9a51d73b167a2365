package graft

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.functions.JsonShape
import graft.index.IndexStore
import graft.search.SearchEngine
import graft.streaming.StreamingIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fuzzy search (O10), catalog (O21), JSON flatten/nest (O3/O4), and the
  * Structured Streaming surface (§7.6). */
class ExtraSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzy expansion: first-char subtree + all-chars containment") {
    val dir = TestSpark.tempDir("fuzzy")
    val store = new IndexStore(spark, dir, IndexConfig(shardSpan = 64, fields = Seq("content")))
    store.createSegment(CorpusGen.generate(spark, 80, seed = 3))
    val engine = new SearchEngine(store)
    val terms = engine.expandFuzzy("ipmort", Seq("content")).map(_._2)
    assert(terms.contains("import"), s"got $terms") // i-subtree, chars {i,p,m,o,r,t}
    assert(terms.forall(t => t.startsWith("i") && "ipmort".distinct.forall(t.contains(_))))
    val hits = engine.searchFuzzy("ipmort", Seq("content"), k = 5).collect()
    assert(hits.nonEmpty)
  }

  test("listFields catalog matches corpus-derived counts") {
    val dir = TestSpark.tempDir("cat")
    val store = new IndexStore(spark, dir, IndexConfig(shardSpan = 64))
    val docs = CorpusGen.generate(spark, 40, seed = 5)
    store.createSegment(docs)
    val rows = store.listFields().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("repo", "path", "commit", "lang", "content"))
    assert(rows("lang")._1 == 40)
    val langTerms = docs.collect().map(_.lang.toLowerCase).distinct.length
    assert(rows("lang")._2 == langTerms)
  }

  test("flatten produces reference-style keys; nest inverts it") {
    val df = Seq((1L, ("x", (2, "y")))).toDF("id", "info")
      .select($"id", $"info._1".as("a"),
        struct($"info._1".as("b"), struct($"info._2._1".as("c")).as("m")).as("s"))
    val flat = JsonShape.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "a", "s\\.b", "s\\.m\\.c"))
    val restored = JsonShape.nest(flat)
    assert(restored.schema == df.schema)
    assert(restored.collect().toSeq == df.collect().toSeq)
  }

  test("posting_explode generator decodes blobs identically to the codec, incl. SQL") {
    val ps = (0 until 500).map(i => (i * 7L, 1 + i % 9, 50 + i % 31)).toArray
    val (blocks, blob) = graft.index.PostingCodec.encode(ps)
    val _ = blocks
    val df = Seq(Tuple1(blob)).toDF("blob")
    val viaCol = df.select(graft.functions.GraftFunctions.posting_explode($"blob"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(viaCol.toSeq == ps.toSeq)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("blobs")
    val viaSql = spark.sql("SELECT posting_explode(blob) AS (doc_id, tf, dl) FROM blobs")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(viaSql.toSeq == ps.toSeq)
  }

  test("streaming micro-batch indexing equals batch build") {
    val work = TestSpark.tempDir("stream")
    val docs = CorpusGen.generate(spark, 90, seed = 17)
    // three chunk files arriving as separate micro-batches
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { i =>
      docs.filter($"doc_id" % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$work/chunks/c$i")
      val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/chunks/c$i/*.parquet")).head.getPath
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
      fs.rename(src, new org.apache.hadoop.fs.Path(s"$work/stream/c$i.parquet"))
    }
    val cfg = IndexConfig(shardSpan = 64, fields = Seq("content"))
    val streamStore = new IndexStore(spark, s"$work/sidx", cfg)
    StreamingIndex.indexStream(spark, s"$work/stream", streamStore).awaitTermination()
    assert(streamStore.segments.size == 3, "one segment per micro-batch")
    val batchStore = new IndexStore(spark, s"$work/bidx", cfg)
    batchStore.createSegment(docs)
    val q = "import the class"
    val a = new SearchEngine(streamStore).search(q, Seq("content"), k = 15)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
    val b = new SearchEngine(batchStore).search(q, Seq("content"), k = 15)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
    assert(a.toSeq == b.toSeq, "segmented streaming index must equal batch index")
  }

  test("streaming replay after crash is idempotent (no duplicate segments)") {
    val work = TestSpark.tempDir("replay")
    val docs = CorpusGen.generate(spark, 60, seed = 19)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { i =>
      docs.filter($"doc_id" % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$work/chunks/c$i")
      val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/chunks/c$i/*.parquet")).head.getPath
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
      fs.rename(src, new org.apache.hadoop.fs.Path(s"$work/stream/c$i.parquet"))
    }
    val cfg = IndexConfig(shardSpan = 64, fields = Seq("content"))
    val store = new IndexStore(spark, s"$work/sidx", cfg)
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.size == 3)
    def results: Seq[(Long, Long)] =
      new SearchEngine(store).search("import the", Seq("content"), k = 10)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val before = results
    val nDocsBefore = store.segments.map(_.numDocs).sum
    // simulate a crash AFTER the last segment's manifest commit but BEFORE
    // the stream checkpoint commit: drop the commit marker so the restarted
    // stream replays batch 2 — the replay must be a no-op
    val ckptDir = StreamingIndex.defaultCheckpointDir(s"$work/stream", store)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckptDir/commits/2"), false)
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.size == 3, "replayed batch must not append a duplicate segment")
    assert(store.segments.map(_.numDocs).sum == nDocsBefore)
    assert(results == before, "df/fieldstats must not be double-counted by replay")
  }

  test("two stores fed from the same input dir each ingest fully (checkpoint keyed to the store)") {
    // the checkpoint records what THIS STORE consumed; keyed to the input
    // alone, store B would see every file already marked consumed and
    // silently ingest nothing
    val work = TestSpark.tempDir("twostores")
    val docs = CorpusGen.generate(spark, 30, seed = 37)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    docs.coalesce(1).write.mode("overwrite").parquet(s"$work/tmp/c0")
    val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/tmp/c0/*.parquet")).head.getPath
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
    fs.rename(src, new org.apache.hadoop.fs.Path(s"$work/stream/c0.parquet"))
    val cfg = IndexConfig(shardSpan = 64, fields = Seq("content"))
    val a = new IndexStore(spark, s"$work/idxA", cfg)
    StreamingIndex.indexStream(spark, s"$work/stream", a).awaitTermination()
    assert(a.segments.map(_.numDocs).sum == 30)
    val b = new IndexStore(spark, s"$work/idxB", cfg)
    StreamingIndex.indexStream(spark, s"$work/stream", b).awaitTermination()
    assert(b.segments.map(_.numDocs).sum == 30,
      "second store must not inherit the first store's checkpoint")
  }

  test("pre-canonicalization raw-string-hash checkpoints are adopted, not orphaned") {
    val work = TestSpark.tempDir("rawckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val store = new IndexStore(spark, s"$work/idx",
      IndexConfig(shardSpan = 64, fields = Seq("content")))
    val input = s"$work/stream" // raw string differs from the file: URI form
    fs.mkdirs(new org.apache.hadoop.fs.Path(input))
    def tag(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val rawDir = s"$work/idx.stream-${tag(input)}.checkpoint"
    // no raw-keyed dir on disk -> the canonical (file:-qualified) key wins
    val canonical = StreamingIndex.defaultCheckpointDir(input, store)
    assert(canonical != rawDir, "sanity: raw and canonical keys must differ")
    // an existing raw-keyed checkpoint (the pre-canonicalization layout)
    // must be adopted so the same store+input doesn't re-ingest everything
    fs.mkdirs(new org.apache.hadoop.fs.Path(rawDir))
    assert(StreamingIndex.defaultCheckpointDir(input, store) == rawDir)
  }

  test("a legacy input-keyed checkpoint with no keyed one demands an explicit choice") {
    val work = TestSpark.tempDir("legacyckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
    // pre-(input,store)-keying layout: a checkpoint at <input>.checkpoint
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream.checkpoint"))
    val store = new IndexStore(spark, s"$work/idx",
      IndexConfig(shardSpan = 64, fields = Seq("content")))
    // ambiguous (may belong to another store): default must refuse loudly
    intercept[IllegalArgumentException](
      StreamingIndex.indexStream(spark, s"$work/stream", store))
    // explicit checkpoint dir resolves it either way
    StreamingIndex.indexStream(spark, s"$work/stream", store,
      Some(s"$work/stream.checkpoint")).awaitTermination()
  }

  test("stream restart after a manual add() between runs neither loses nor duplicates batches") {
    val work = TestSpark.tempDir("interleave")
    val docs = CorpusGen.generate(spark, 60, seed = 23).collect().toSeq
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
    def shipChunk(part: Seq[CorpusDoc], name: String): Unit = {
      spark.createDataset(part).coalesce(1).write.mode("overwrite").parquet(s"$work/tmp/$name")
      val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/tmp/$name/*.parquet")).head.getPath
      fs.rename(src, new org.apache.hadoop.fs.Path(s"$work/stream/$name.parquet"))
    }
    val cfg = IndexConfig(shardSpan = 64, fields = Seq("content"))
    val store = new IndexStore(spark, s"$work/idx", cfg)
    // run 1: two micro-batches
    shipChunk(docs.slice(0, 20), "c0")
    shipChunk(docs.slice(20, 40), "c1")
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.size == 2)
    // manual add BETWEEN stream runs takes its own segment id
    val manual = Seq(CorpusDoc(7777L, "rm", "p/m", "m" * 40, "en", "graftmanual doc content"))
    store.add(spark.createDataset(manual))
    assert(store.segments.size == 3)
    // run 2: a third file arrives; its batch must claim a FRESH id, not
    // collide with the manual segment (the old batchId-derived scheme lost
    // this batch silently)
    shipChunk(docs.slice(40, 60), "c2")
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.size == 4, s"got ${store.segments}")
    assert(store.segments.map(_.numDocs).sum == 61)
    val eng = new SearchEngine(store)
    assert(eng.search("graftmanual", Seq("content"), k = 5).collect().map(_.getLong(0)).toSeq == Seq(7777L))
    // every original doc is searchable exactly once: compare against batch twin
    val twin = new IndexStore(spark, s"$work/twin", cfg)
    twin.createSegment(spark.createDataset(docs ++ manual))
    val a = eng.search("import the", Seq("content"), k = 20)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val b = new SearchEngine(twin).search("import the", Seq("content"), k = 20)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(a == b, "interleaved stream+add store must equal one batch build")
  }

  test("replayed batch whose claimed seg id was taken by an add() re-claims, never skips") {
    // The claim window: batch 0 wrote its marker (claiming seg 0) but
    // crashed before the manifest commit; a non-stream add() then committed
    // ITS OWN segment as seg 0. On restart the replayed batch must detect
    // (by content fingerprint) that seg 0 is not its own and re-claim a
    // fresh id — skipping on id alone would silently drop the batch.
    val work = TestSpark.tempDir("claimcol")
    val docs = CorpusGen.generate(spark, 20, seed = 29).collect().toSeq
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
    spark.createDataset(docs).coalesce(1).write.mode("overwrite").parquet(s"$work/tmp/c0")
    val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/tmp/c0/*.parquet")).head.getPath
    fs.rename(src, new org.apache.hadoop.fs.Path(s"$work/stream/c0.parquet"))
    val cfg = IndexConfig(shardSpan = 64, fields = Seq("content"))
    val store = new IndexStore(spark, s"$work/idx", cfg)
    // pre-place the orphaned claim marker for batch 0
    val ckpt = new org.apache.hadoop.fs.Path(
      StreamingIndex.defaultCheckpointDir(s"$work/stream", store))
    fs.mkdirs(ckpt)
    val out = fs.create(new org.apache.hadoop.fs.Path(ckpt, "graft-batch-0"), true)
    out.write("0".getBytes("UTF-8")); out.close()
    val stolen = Seq(CorpusDoc(8888L, "rs", "p/s", "s" * 40, "en", "graftstolen doc content"))
    store.add(spark.createDataset(stolen)) // commits seg 0 under the claimed id
    assert(store.segments.map(_.id) == Seq(0))
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.map(_.id).sorted == Seq(0, 1),
      s"batch must land in a fresh segment, got ${store.segments}")
    assert(store.segments.map(_.numDocs).sum == 21)
    val eng = new SearchEngine(store)
    assert(eng.search("graftstolen", Seq("content"), k = 5)
      .collect().map(_.getLong(0)).toSeq == Seq(8888L))
    assert(eng.search("import the", Seq("content"), k = 20).collect().nonEmpty)
    // and a SECOND restart replaying the same batch is now a verified no-op
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/commits/0"), false)
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.size == 2 && store.segments.map(_.numDocs).sum == 21)
  }

  test("claimed seg id with FOREIGN uncommitted stage leftovers is wiped, not resumed") {
    // sibling of the committed-collision case: a non-stream add() claimed
    // the same id, wrote its stage outputs + done-markers, and crashed
    // BEFORE the manifest commit. A replayed stream batch that resumed onto
    // those markers would commit the add()'s documents as its own.
    val work = TestSpark.tempDir("claimforeign")
    val docs = CorpusGen.generate(spark, 20, seed = 31).collect().toSeq
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
    spark.createDataset(docs).coalesce(1).write.mode("overwrite").parquet(s"$work/tmp/c0")
    val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/tmp/c0/*.parquet")).head.getPath
    fs.rename(src, new org.apache.hadoop.fs.Path(s"$work/stream/c0.parquet"))
    val cfg = IndexConfig(shardSpan = 64, fields = Seq("content"))
    val store = new IndexStore(spark, s"$work/idx", cfg)
    // crashed foreign add(): full stage outputs at seg 0, then roll back the
    // manifest commit (the crash point) — stage done-markers remain
    val foreign = Seq(CorpusDoc(9999L, "rf", "p/f", "f" * 40, "en", "graftforeign doc content"))
    store.buildSegmentAt(0, spark.createDataset(foreign), resume = false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/idx/manifest.json"), false)
    assert(store.segments.isEmpty && store.stageDone(0, "corpus"))
    // orphaned claim marker for batch 0 claiming seg 0
    val ckpt = new org.apache.hadoop.fs.Path(
      StreamingIndex.defaultCheckpointDir(s"$work/stream", store))
    fs.mkdirs(ckpt)
    val out = fs.create(new org.apache.hadoop.fs.Path(ckpt, "graft-batch-0"), true)
    out.write("0".getBytes("UTF-8")); out.close()
    StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination()
    assert(store.segments.map(_.id) == Seq(0))
    assert(store.segments.head.numDocs == 20, "segment must hold the BATCH docs")
    val eng = new SearchEngine(store)
    assert(eng.search("graftforeign", Seq("content"), k = 5).isEmpty,
      "foreign uncommitted docs must not be committed by the stream batch")
    assert(eng.search("import the", Seq("content"), k = 10).collect().nonEmpty)
  }

  test("streaming dedup-on-ingest keeps one copy per key across re-delivered files") {
    val work = TestSpark.tempDir("sdedup")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val rows = (0 until 50).map(i => (i.toLong,
      new java.sql.Timestamp(1700000000000L + i * 60000L),
      (i % 5).toLong, s"t${i % 3}", i * 1.5, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/tmp")
    val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/tmp/*.parquet")).head.getPath
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/in"))
    // re-deliver the same file twice: every row is a duplicate
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new org.apache.hadoop.fs.Path(s"$work/in/a.parquet"), false, spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new org.apache.hadoop.fs.Path(s"$work/in/b.parquet"), false, spark.sparkContext.hadoopConfiguration)
    StreamingIndex.dedupEventsStream(spark, s"$work/in", s"$work/sink").awaitTermination()
    val out = spark.read.parquet(s"$work/sink")
    assert(out.count() == 50, "each re-delivered event must be dropped")
    assert(out.select("event_id").distinct().count() == 50)
    // kept rows carry the source columns (dupes are identical, so the
    // winner's values are deterministic)
    val r7 = out.filter($"event_id" === 7L).collect().head
    assert(r7.getAs[Long]("user_id") == 2L && r7.getAs[String]("event_type") == "t1")
  }

  test("append-mode windowed agg emits exactly the watermark-closed windows to a file sink") {
    val work = TestSpark.tempDir("winappend")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/ev"))
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path("/root/testdata/sf0.001/events.parquet"),
      fs, new org.apache.hadoop.fs.Path(s"$work/ev/e0.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    StreamingIndex.windowedEventCountsAppend(spark, s"$work/ev", s"$work/sink")
      .awaitTermination()
    val got = spark.read.parquet(s"$work/sink")
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    // expected: the batch aggregation restricted to windows the FINAL
    // watermark (max ts − 10 min) has closed — the append-mode bound
    val ev = spark.read.schema(StreamingIndex.eventsSchema).parquet(s"$work/ev")
    val maxEpoch = ev.agg(max(unix_timestamp($"ts"))).head.getLong(0)
    val expected = ev
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"window.start".cast("long").as("window_start"),
        $"event_type", $"n", round($"sum_value", 4).as("sum_value"))
      .filter($"window_start" + 3600 <= maxEpoch - 600)
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    assert(got.nonEmpty, "append sink must contain closed windows")
    assert(got == expected,
      s"append output must equal the watermark-bounded batch agg (got ${got.size} vs ${expected.size})")
  }

  test("windowed streaming agg equals batch aggregation") {
    val work = TestSpark.tempDir("winstream")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/ev"))
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path("/root/testdata/sf0.001/events.parquet"),
      fs, new org.apache.hadoop.fs.Path(s"$work/ev/e0.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    StreamingIndex.windowedEventCounts(spark, s"$work/ev", "t_win").awaitTermination()
    val streamed = spark.table("t_win")
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    val batch = spark.read.schema(StreamingIndex.eventsSchema).parquet(s"$work/ev")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"window.start".cast("long").as("window_start"),
        $"event_type", $"n", round($"sum_value", 4).as("sum_value"))
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }
}
