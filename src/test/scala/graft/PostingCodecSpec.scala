package graft

import graft.index.PostingCodec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class PostingCodecSpec extends AnyFunSuite {

  private val postingsGen: Gen[Array[(Long, Int, Int)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1L << 40),
      Gen.chooseNum(1, 500), Gen.chooseNum(1, 5000)))
      .map(_.groupBy(_._1).map(_._2.head).toArray.sortBy(_._1))

  test("decode(encode(xs)) == xs (property)") {
    PropCheck.forAllG(postingsGen) { ps =>
      val (blocks, blob) = PostingCodec.encode(ps)
      assert(PostingCodec.decodeAll(blob).toSeq == ps.toSeq)
      val metas = PostingCodec.decodeBlocks(blocks)
      assert(metas.map(_.count).sum == ps.length)
      if (ps.nonEmpty) {
        assert(metas.head.firstDocId == ps.head._1)
        assert(metas.last.lastDocId == ps.last._1)
        // block invariants: maxTf / minDl dominate members
        var idx = 0
        metas.foreach { m =>
          val members = ps.slice(idx, idx + m.count)
          assert(members.forall(_._2 <= m.maxTf))
          assert(members.forall(_._3 >= m.minDl))
          idx += m.count
        }
      }
    }
  }

  test("cursor full iteration equals decodeAll") {
    PropCheck.forAllG(postingsGen) { ps =>
      val (blocks, blob) = PostingCodec.encode(ps)
      val cur = new PostingCodec.Cursor(blob, PostingCodec.decodeBlocks(blocks))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
      while (cur.next()) out += ((cur.docId, cur.tf, cur.dl))
      assert(out.toSeq == ps.toSeq)
    }
  }

  test("cursor advanceTo lands on first docId >= target") {
    PropCheck.forAllG2(postingsGen.suchThat(_.length > 2), Gen.chooseNum(0L, 1L << 40)) {
      (ps, target) =>
        val (blocks, blob) = PostingCodec.encode(ps)
        val cur = new PostingCodec.Cursor(blob, PostingCodec.decodeBlocks(blocks))
        cur.next()
        val expected = ps.find(_._1 >= target)
        val ok = cur.advanceTo(target)
        expected match {
          case Some((d, tf, dl)) =>
            assert(ok && cur.docId == d && cur.tf == tf && cur.dl == dl)
          case None => assert(!ok && cur.isExhausted)
        }
    }
  }

  test("blockFor finds containing block or proves absence") {
    val ps = (0 until 1000).map(i => (i * 3L, 1 + i % 7, 100 + i % 50)).toArray
    val (blocks, blob) = PostingCodec.encode(ps)
    val metas = PostingCodec.decodeBlocks(blocks)
    val cur = new PostingCodec.Cursor(blob, metas)
    cur.next()
    assert(cur.blockFor(300L).exists(m => m.firstDocId <= 300 && m.lastDocId >= 300))
    assert(cur.blockFor(3L * 999).isDefined)
    assert(cur.blockFor(3L * 1000 + 5).isEmpty) // beyond last
  }

  test("Aggregator (hash-agg) path produces blobs identical to the sort-based encoder") {
    // PostingBlobAggregator is the groupBy/udaf alternative to the
    // sort-based ShardEncoder (kept for incremental small-batch merges; the
    // bulk build uses the sorted walk — see IndexBuilder.encodeShards docs).
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val postings = graft.corpus.CorpusGen.generate(spark, 60, seed = 41)
      .flatMap { d =>
        graft.analysis.Analyzer.termFrequencies(d.content).map { case (t, tf) =>
          graft.core.Posting("content", t, d.doc_id,
            tf, graft.analysis.Analyzer.tokenize(d.content).length)
        }
      }
    val viaSort = graft.index.IndexBuilder.encodeShards(postings, 16)
      .select($"term", $"shard", hex($"blob").as("b"), hex($"blocks").as("bl"),
        $"count", $"sum_tf", $"max_tf")
      .collect().map(_.toString).sorted.toSeq
    val blobAgg = udaf(graft.index.PostingBlobAggregator,
      org.apache.spark.sql.Encoders.product[graft.index.PostingIn])
    val viaAgg = postings.toDF()
      .withColumn("shard", floor($"doc_id" / 16).cast("long"))
      .groupBy($"field", $"term", $"shard")
      .agg(blobAgg($"doc_id", $"tf", $"dl").as("enc"))
      .select($"term", $"shard", hex($"enc.blob").as("b"), hex($"enc.blocks").as("bl"),
        $"enc.count".as("count"), $"enc.sum_tf".as("sum_tf"), $"enc.max_tf".as("max_tf"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaSort == viaAgg)
  }

  test("varint round-trips boundary values") {
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, Long.MaxValue)
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    vals.foreach(v => PostingCodec.writeVarint(buf, v))
    val arr = buf.toArray
    val pos = Array(0)
    vals.foreach(v => assert(PostingCodec.readVarint(arr, pos) == v))
    assert(pos(0) == arr.length)
  }
}
