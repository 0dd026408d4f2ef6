package graft

import graft.operators.{BloomManifest, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-9 curation operators: fixed-budget reservoir sample, per-shard
  * Bloom manifest + probe, split-leakage guard.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sfDir, "documents")

  test("reservoirSample takes exactly min(k, |group|) docs per group, " +
    "equal to the window form") {
    val k = 7
    val r = TextAnalysis.reservoirSample(docs, "lang", k)
      .select("lang", "rank", "priority", "doc_id")
      .as[(String, Long, Long, Long)].collect()

    val sizes = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val byLang = r.groupBy(_._1)
    assert(byLang.keySet == sizes.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(k.toLong, sizes(lang)))
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length))
      // rank order IS priority order (doc_id tiebreak)
      val inRank = rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(inRank == inRank.sorted)
    }

    // the aggregate selects the identical rows as the window form
    val pri = pmod(conv(substring(
      md5(concat(lit("res:"), col("doc_id").cast("string"))), 1, 12),
      16, 10).cast("long"), lit(1000000007L))
    val window = docs.select(col("lang"), col("doc_id"), pri.as("pri"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (t._3, t._2)).take(k).map(t => (t._1, t._2))
      }.toSet
    assert(r.map(t => (t._1, t._4)).toSet == window)
  }

  test("bloom manifest stays inside the 60-bit word layout") {
    val words = 17
    val m = BloomManifest.manifest(docs, "source", "doc_id", words)
      .select("shard", "word", "bits", "set_bits")
      .as[(String, Long, Long, Long)].collect()
    assert(m.nonEmpty)
    m.foreach { case (_, word, bits, setBits) =>
      assert(word >= 0 && word < words)
      // bits 60..63 never set — the sign-safe layout contract
      assert((bits & ~((1L << BloomManifest.WordBits) - 1)) == 0L)
      assert(java.lang.Long.bitCount(bits) == setBits && setBits >= 1)
    }
    m.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= words)
      assert(rows.map(_._2).distinct.length == rows.length)
    }
  }

  test("bloom probe has zero false negatives and bounded counts") {
    val d = docs
    val mf = BloomManifest.manifest(d, "source", "doc_id")
    // every true member must come back maybe=1: n_maybe == n_probes when
    // probing the corpus against itself
    val self = d.select(col("source"), col("doc_id").as("probe_key"))
    val allIn = BloomManifest.probe(self, self, mf, "source", "probe_key")
      .select("n_probes", "n_maybe", "n_present")
      .as[(Long, Long, Long)].collect()
    assert(allIn.nonEmpty)
    allIn.foreach { case (p, m, t) => assert(m == p && t == p) }

    // mixed batch: the Bloom contract n_present <= n_maybe <= n_probes
    val mixed = d.select(col("source"),
      when(col("doc_id") % 3 === 0, col("doc_id"))
        .otherwise(col("doc_id") + 1000000L).as("probe_key"))
    val r = BloomManifest.probe(mixed, self, mf, "source", "probe_key")
      .select("n_probes", "n_maybe", "n_present")
      .as[(Long, Long, Long)].collect()
    r.foreach { case (p, m, t) => assert(t <= m && m <= p) }
    assert(r.map(_._3).sum > 0, "mixed batch must contain true members")
    assert(r.map(_._1).sum > r.map(_._3).sum,
      "mixed batch must contain absent keys")
  }

  test("bloom merge equals full rebuild and geometry mismatch throws") {
    val standing = BloomManifest.manifest(
      docs.filter(col("doc_id") % 5 =!= 0), "source", "doc_id")
    val merged = BloomManifest.merge(standing,
        docs.filter(col("doc_id") % 5 === 0), "source", "doc_id")
      .select("shard", "word", "bits", "set_bits")
      .as[(String, Long, Long, Long)].collect().toSet
    val rebuilt = BloomManifest.manifest(docs, "source", "doc_id")
      .select("shard", "word", "bits", "set_bits")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(merged == rebuilt, "merge(standing, batch) must == full rebuild")

    // the manifest self-describes words; a disagreeing explicit value is
    // a construction error, caught before any wrong-bit-space probe runs
    assert(BloomManifest.manifestWords(standing) == 17)
    val self = docs.select(col("source"), col("doc_id").as("probe_key"))
    intercept[IllegalArgumentException] {
      BloomManifest.probe(self, self, standing, "source", "probe_key",
        wordsOpt = Some(34))
    }
  }

  test("cdcChunks spans tile every document exactly and re-sync after edits") {
    val r = TextAnalysis.cdcChunks(docs)
      .select("doc_id", "chunk_idx", "start", "chunk_len")
      .as[(Long, Long, Long, Long)].collect()
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    r.groupBy(_._1).foreach { case (doc, rows) =>
      val byIdx = rows.sortBy(_._2)
      assert(byIdx.map(_._2).toSeq == (1L to rows.length))
      // chunks tile [1, len+1): consecutive, gap-free, full coverage
      assert(byIdx.head._3 == 1L)
      byIdx.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3)
        case _           =>
      }
      assert(byIdx.last._3 + byIdx.last._4 == lens(doc) + 1)
    }

    // the CDC contract: an insertion near the front changes only a
    // bounded prefix of chunk hashes — the tail re-synchronizes (this is
    // exactly what fixed windows cannot do)
    val spark2 = spark
    import spark2.implicits._
    val one = docs.filter(col("doc_id") === 1).select("text")
      .as[String].head()
    val edited = Seq((1L, one), (2L, "XYZQ" + one)).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(edited)
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
    val orig = chunks.filter(_._1 == 1L).map(_._2).toSet
    val shifted = chunks.filter(_._1 == 2L).map(_._2).toSet
    assert((orig & shifted).nonEmpty,
      "tail chunks must re-synchronize after a prefix insertion")
  }

  test("cdcChunks tiles non-BMP (surrogate-pair) documents by code points") {
    val spark2 = spark
    import spark2.implicits._
    // every 🦀 is one code point but two UTF-16 units: a UTF-16-unit
    // kernel would emit cut positions in the wrong unit space and the
    // SQL substring assembly would mis-slice or fail to tile
    val body = (1 to 40).map(i => s"🦀 emoji text segment $i 🚀").mkString(" ")
    val d = Seq((1L, body)).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(d)
      .select("chunk_idx", "start", "chunk_len")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val cpLen = body.codePointCount(0, body.length).toLong
    assert(chunks.head._2 == 1L)
    chunks.sliding(2).foreach {
      case Array(a, b) => assert(a._2 + a._3 == b._2)
      case _           =>
    }
    assert(chunks.last._2 + chunks.last._3 == cpLen + 1,
      "chunks must tile the code-point length, not the UTF-16 length")
    // and code-point slicing by (start, chunk_len) reassembles the
    // document exactly — the contract the SQL substring assembly relies on
    def cpSlice(s: String, start1: Long, len: Long): String = {
      val a = s.offsetByCodePoints(0, (start1 - 1).toInt)
      val b = s.offsetByCodePoints(a, len.toInt)
      s.substring(a, b)
    }
    val joined = chunks.map(c => cpSlice(body, c._2, c._3)).mkString
    assert(joined == body)
  }

  test("split_leakage_guard pair counts conserve the minhash pair set") {
    val total = SparkEntry.queries("split_leakage_guard")(spark, sfDir)
      .agg(sum("n_pairs")).as[Long].collect().head
    val pairs = Dedup.minhashNearDups(docs, 0.5).count()
    assert(total == pairs && pairs > 0)
  }
}
