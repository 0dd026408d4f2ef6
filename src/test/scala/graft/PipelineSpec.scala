package graft

import graft.operators._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  private lazy val corpus = Seq(
    doc(1, "the quick brown fox jumps over the lazy dog"),
    doc(2, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    doc(3, "completely different words appear here today friends"),
    doc(4, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    doc(5, "hi")) // shorter than one shingle
    .toDF("doc_id", "text")

  test("incremental mining finds cross pairs only, never within-batch pairs") {
    val newBatch = Seq(
      doc(101, "the quick brown fox jumps over the lazy dog"),  // dup of idx 1
      doc(102, "the quick brown fox jumps over the lazy dog"),  // dup of 101 too
      doc(103, "nothing like anything in the standing index at all"))
      .toDF("doc_id", "text")
    val index = corpus.filter(col("doc_id") =!= 4)
    val got = Dedup.minhashAgainstIndex(newBatch, index, 0.5)
      .select("new_id", "index_id").as[(Long, Long)].collect().toSet
    // both new dups hit index docs 1 and 2; the 101-102 within-batch pair
    // and the novel doc 103 never appear
    assert(got.contains((101L, 1L)) && got.contains((102L, 1L)))
    assert(got.forall { case (n, i) => n > 100L && i <= 5L })
  }

  test("shingles: short docs yield empty sets, no nulls") {
    val sh = Dedup.withShingles(corpus).filter(col("doc_id") === 5)
      .select(size(col("sh"))).as[Int].head()
    assert(sh == 0)
  }

  test("exact dedup groups identical texts under min doc_id") {
    val groups = Dedup.exact(corpus).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("canonical_doc_id") == 1L)
    assert(groups(0).getAs[Long]("dup_count") == 2L)
  }

  test("minhash LSH surfaces high-jaccard pairs, verified exactly") {
    val pairs = Dedup.minhashNearDups(corpus, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical: jaccard 1.0, all bands match
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact jaccard join finds the same planted pairs as minhash on fixtures") {
    val docs = Tables.load(spark, sfDir, "documents")
    val mh = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val ex = Dedup.jaccardNearDups(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(ex)) // LSH can only miss, never invent
    assert(ex.nonEmpty)
  }

  test("stop-shingle cap only loses recall, never invents pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = Dedup.jaccardNearDups(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.jaccardNearDups(docs, 0.5, maxBucket = Some(5))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact))
    assert(capped.nonEmpty) // planted near-dups ride on rare shingles
  }

  test("components chain pairs transitively and pick the minimum canonical id") {
    // (1~2, 2~3) must merge into one cluster even though (1,3) was never
    // a mined pair — the collapse pair output alone cannot express
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("doc_a", "doc_b")
    val m = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("components converge on a long chain and refuse a truncated run") {
    // a 12-hop path needs ~12 min-label rounds; maxIter guards against a
    // silently half-merged clustering
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val canon = Dedup.components(chain)
      .select("canonical_id").distinct().as[Long].collect().toSeq
    assert(canon == Seq(0L))
    intercept[IllegalArgumentException] {
      Dedup.components(chain, maxIter = 3)
    }
  }

  test("contamination flags corpus docs overlapping the benchmark, benchmark side broadcast") {
    val corpus = Seq(
      doc(1, "the quick brown fox jumps over the lazy dog"),
      doc(2, "totally unrelated content lives in this row here"),
      doc(3, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    val bench = Seq(doc(100, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, bench, 0.5)
    val got = hits.select("doc_id", "bench_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(t => (t._1, t._2)) == Set((1L, 100L), (3L, 100L)))
    assert(got.find(_._1 == 1L).get._3 == 1.0) // exact copy of the benchmark doc
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastQueryStage"),
      "benchmark postings must broadcast, never shuffle the corpus")
  }

  test("splitAssign is stable under corpus growth and covers all splits") {
    val docs = Tables.load(spark, sfDir, "documents")
    val subset = docs.filter(col("doc_id") < 100)
    val full = TextAnalysis.splitAssign(docs)
      .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
    val sub = TextAnalysis.splitAssign(subset)
      .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
    // hash assignment: growing the corpus never moves an existing doc
    sub.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved") }
    val byCounts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byCounts.keySet == Set("train", "val", "test"))
    assert(byCounts("train") > byCounts("val") && byCounts("train") > byCounts("test"))
  }

  test("simhash is identical for identical texts, near for near-dups") {
    val sig = Dedup.simhash(corpus).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(4L))
    val hamming = java.lang.Long.bitCount(sig(1L) ^ sig(2L))
    assert(hamming <= 4, s"near-dup hamming was $hamming")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Array(0f, 1f, 0f, 0f), 1),
    (3L, Array(-1f, 0f, 0f, 0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("composed dedup runs share one materialized signature relation") {
    val docs = Tables.load(spark, sfDir, "documents").limit(150)
    val sk = Dedup.shingleKernel(docs).persist() // caller-owned, as per contract
    try {
      val mhFrom = Dedup.minhashNearDupsFrom(sk, 0.5)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val mhDirect = Dedup.minhashNearDups(docs, 0.5)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(mhFrom == mhDirect)
      val jcFrom = Dedup.jaccardNearDupsFrom(sk, 0.5, None)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val jcDirect = Dedup.jaccardNearDups(docs, 0.5)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(jcFrom == jcDirect)
    } finally sk.unpersist()
  }

  test("simhash48 kernel matches the declarative majority-vote definition") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    // declarative twin: simhash16's shape widened to 48 bits (interpreted
    // HOFs — fine at 60 rows, the kernel exists because this is ~100x
    // slower at corpus scale)
    def h48c(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 12), 16, 10).cast("long")
    val hashes = transform(split(col("text"), " "), t => h48c(t))
    val n = size(hashes)
    val declarative = (0 until 48).map { b =>
      when(size(filter(hashes, hv => pmod(shiftright(hv, b), lit(2)) === 1)) * 2 > n,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val expected = docs.select(col("doc_id"), declarative.as("simhash"))
      .as[(Long, Long)].collect().toMap
    val kernel = Dedup.simhash48(docs).as[(Long, Long)].collect().toMap
    assert(kernel == expected)
  }

  test("simhash banded pairing equals exact all-pairs Hamming (lossless for d < bands)") {
    val docs = Tables.load(spark, sfDir, "documents").limit(120)
    val banded = Dedup.simhashPairs(docs, 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val sig = Dedup.simhash(docs).as[(Long, Long)].collect()
    val exact = (for {
      (a, sa) <- sig; (b, sb) <- sig if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == exact)
    assert(exact.nonEmpty, "fixture should contain close simhash pairs")
  }

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val out = vecs.as("a").join(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(out((0L, 0L)) == 1.0)
    assert(out((0L, 2L)) == 0.0)
    assert(out((0L, 3L)) == -1.0)
  }

  test("brute-force top-k ranks nearest first with id tie-break") {
    val top = Similarity.bruteForceTopK(vecs, col("vec_id") === 0, 3)
      .select("cand_id", "rank").as[(Long, Int)].collect().toSeq
    assert(top.head == ((1L, 1))) // 0.9-aligned vector is nearest
    assert(top.map(_._2) == Seq(1, 2, 3))
  }

  test("hard negatives exclude same-label neighbors and rank after the filter") {
    // query 0 (label 0): nearest overall is vec 1 (same label — excluded);
    // hard negatives are vec 2 (cos 0) then vec 3 (cos -1)
    val out = Similarity.hardNegatives(vecs, col("vec_id") === 0, 3)
      .select("cand_id", "c_label", "rank").as[(Long, Int, Int)]
      .collect().toSeq
    assert(out == Seq((2L, 1, 1), (3L, 1, 2)))
  }

  test("sign-LSH candidates stay within the query's bucket") {
    val more = vecs.unionByName(
      Seq((4L, Array(2f, 0f, 0f, 0f), 0)).toDF("vec_id", "embedding", "label"))
    val out = Similarity.signLshTopK(more, col("vec_id") === 0, 5, bits = Some(4))
      .select("cand_id").as[Long].collect().toSet
    // v0's bucket is sign pattern (+,0,0,0) = 1; only v4 shares it —
    // v1 (0.9, 0.1, ...) sets bit 2 as well, v2/v3 have no positive dim 1
    assert(out == Set(4L))
  }

  test("cosine_score expression: codegen value parity, nulls, idempotent registration") {
    graft.functions.CosineScore.register(spark)
    graft.functions.CosineScore.register(spark) // second call must no-op
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f)))
      .toDF("a", "b")
      .withColumn("na", sqrt(Similarity.dot(col("a"), col("a"))))
      .withColumn("nb", sqrt(Similarity.dot(col("b"), col("b"))))
    val viaExpr = df.selectExpr("cosine_score(a, b, na, nb)")
      .as[Double].collect().toSeq
    // twin: the interpreted HOF fold + Spark round — same contract
    val viaHof = df.select(
      round(Similarity.dot(col("a"), col("b")) / (col("na") * col("nb")), 6))
      .as[Double].collect().toSeq
    assert(viaExpr == viaHof)
    // null-intolerant: any null input -> null output, no NPE
    val withNull = spark.sql(
      "SELECT cosine_score(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)), 1.0D, 1.0D) AS s")
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("native function descriptors register on a fresh session registry") {
    // spark.sql.extensions is a STATIC conf read from the SparkContext at
    // session creation, so build-time injection can't be exercised on the
    // shared test context; verify the same descriptors GraftExtensions
    // injects resolve on a genuinely fresh function registry instead.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    val s2 = spark.newSession() // fresh registry, no graft functions yet
    intercept[org.apache.spark.sql.AnalysisException] {
      s2.sql("SELECT simhash48('a b')").collect()
    }
    graft.functions.CosineScore.register(s2)
    graft.functions.TextKernels.register(s2)
    val r = s2.sql(
      """SELECT cosine_score(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)), 1.0D, 1.0D) AS c,
        |       simhash48('a b') AS s,
        |       winnow_fp('abcdefgh') AS w,
        |       shingle_hashes('a b c d', 3).sh AS sh""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[String](3) == Seq("a_b_c", "b_c_d"))
    // and the original session's registry is untouched by s2's
    assert(spark ne s2)
  }

  test("deriveBits tracks corpus size toward ~1000-row buckets, clamped") {
    assert(Similarity.deriveBits(0) == 1)
    assert(Similarity.deriveBits(500) == 1)      // sub-target corpus: 2 buckets
    assert(Similarity.deriveBits(2000) == 1)
    assert(Similarity.deriveBits(2001) == 2)
    assert(Similarity.deriveBits(500000) == 9)   // 512 buckets -> ~977/bucket
    assert(Similarity.deriveBits(10000000) == 14)
    assert(Similarity.deriveBits(Long.MaxValue / 2) == 16) // hard clamp
    // expected bucket size stays within [target/2, ~target] pre-clamp
    for (n <- Seq(5000L, 80000L, 1234567L, 9999999L)) {
      val buckets = 1L << Similarity.deriveBits(n)
      assert(n / buckets <= 1000 && n / buckets >= 250, s"n=$n buckets=$buckets")
    }
  }

  test("caller-supplied corpus stats replace the per-query count and probe") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val d = Similarity.dimOf(emb)
    // true stats supplied -> identical results to the probing path
    val probed = Similarity.signLshTopK(emb, col("vec_id") < 20, 3)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    val stated = Similarity.signLshTopK(emb, col("vec_id") < 20, 3,
      corpusCount = Some(n), dim = Some(d))
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(stated == probed && stated.nonEmpty)
    // behavioral proof the stated count is USED (not re-counted): a
    // stated 33M-row corpus derives clamp-width bits, which must act
    // exactly like explicit bits=16 — the fixture's true count would
    // derive 1 bit and produce a different candidate structure
    val viaStats = Similarity.signLshTopK(emb, col("vec_id") < 20, 3,
      corpusCount = Some(33000000L))
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    val viaBits = Similarity.signLshTopK(emb, col("vec_id") < 20, 3,
      bits = Some(16))
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaStats == viaBits)
  }

  test("derived-bits ladder hits the 16-bit clamp at scale and banded paths still verify (VERDICT r04 #7)") {
    // the clamp thresholds themselves (integer ladder, no float log)
    assert(Similarity.deriveBits(33000000L) == 16)
    assert(Similarity.deriveBits(33000000L, Similarity.PairMiningTargetBucket) == 16)
    assert(Similarity.deriveBits(Long.MaxValue / 4) == 16)
    // drive the REAL banded operators through the clamp branch by stating
    // a 33M corpus over the physical fixture: bands become 4 x 16-bit
    // dim-slices (min(4, 64/16)), and every emitted pair must still carry
    // the exact verified score
    val emb = Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.nearDupPairs(emb, 0.4)
      .select("id_a", "id_b", "score").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val clamped = Similarity.nearDupPairsBanded(emb, 0.4,
      corpusCount = Some(33000000L))
      .select("id_a", "id_b", "score").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    clamped.foreach { case (p, s) =>
      assert(exact.get(p).contains(s), s"pair $p not in exact or score drifted")
    }
    // identical embeddings share every sign slice: the planted exact-dup
    // pairs survive any bit width, so the clamp path is non-vacuous
    val identicals = exact.filter { case (_, s) => s >= 0.999999 }.keySet
    identicals.foreach(p => assert(clamped.contains(p), s"lost identical pair $p"))
  }

  test("hash-sampled IVF centroids spread across clusters (seeded quantizer)") {
    // clustered fixture engineered against the old first-N quantizer:
    // ids 0..15 all sit in cluster A (axis 0), ids 16..99 in cluster B
    // (axis 1). First-N centroids would all be cluster-A vectors, leaving
    // every B vector boundary-assigned to one degenerate list; the md5
    // sample is order-independent, so centroids land in both clusters.
    val rows = (0L until 100L).map { i =>
      if (i < 16) (i, Array(1f, 0f, (i % 5).toFloat / 50f, 0f))
      else (i, Array(0f, 1f, 0f, (i % 7).toFloat / 70f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(emb, nCentroids = 8)
    val byCid = idx.groupBy("cid").count()
      .as[(Long, Long)].collect().toMap
    assert(byCid.keys.exists(_ >= 16L),
      s"no cluster-B centroid selected: ${byCid.keys.toSeq.sorted}")
    // with in-cluster centroids available, no single inverted list
    // swallows the corpus (the failure mode of the first-N quantizer)
    assert(byCid.values.max < 90L, s"degenerate list sizes: $byCid")
    assert(idx.count() == 100L) // every vector assigned exactly once
  }

  test("sign-LSH with a skewed bucket distribution still verifies exactly") {
    // all-positive leading dims -> every vector lands in ONE bucket
    // regardless of bit count: the equi-join degenerates to the full
    // pair set for that bucket (AQE skew handling territory) but scores
    // and ranking must remain exact
    val skewed = (0L until 40L).map { i =>
      (i, Array(1f, 1f, (i % 7 + 1).toFloat / 7f, (i % 11 + 1).toFloat / 11f))
    }.toDF("vec_id", "embedding")
    val lsh = Similarity.signLshTopK(skewed, col("vec_id") < 5, 3, bits = Some(4))
      .select("query_id", "cand_id", "score").as[(Long, Long, Double)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(skewed, col("vec_id") < 5, 3)
      .select("query_id", "cand_id", "score").as[(Long, Long, Double)]
      .collect().toSet
    assert(lsh == exact) // one shared bucket => LSH candidates = all pairs
  }

  test("near-dup pairs are id-oriented and thresholded") {
    val pairs = Similarity.nearDupPairs(vecs, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("bucketed near-dup pairs: subset of exact with identical scores") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.nearDupPairs(emb, 0.4)
      .select("id_a", "id_b", "score").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val bucketed = Similarity.nearDupPairsBucketed(emb, 0.4)
      .select("id_a", "id_b", "score").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    assert(bucketed.nonEmpty)
    bucketed.foreach { case (pair, s) =>
      assert(exact.get(pair).contains(s), s"pair $pair not in exact or score drifted")
    }
  }

  test("banded top-k scores drawn from exact; candidates superset of single-bucket") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val banded = Similarity.signLshTopKBanded(emb, col("vec_id") < 20, 3)
      .select("query_id", "cand_id", "score").as[(Long, Long, Double)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 20, 1000)
      .select("query_id", "cand_id", "score").as[(Long, Long, Double)]
      .collect().map { case (q, c, s) => (q, c) -> s }.toMap
    assert(banded.nonEmpty)
    banded.foreach { case (q, c, s) =>
      assert(exact.get((q, c)).contains(s), s"($q,$c) score drifted from exact")
    }
    // more bands => at least as many candidates per query as one bucket
    val single = Similarity.signLshTopK(emb, col("vec_id") < 20, 3)
      .select("query_id").as[Long].collect().groupBy(identity).view.mapValues(_.length)
    val multi = banded.toSeq.groupBy(_._1).view.mapValues(_.length)
    single.foreach { case (q, n) => assert(multi.getOrElse(q, 0) >= n.min(3)) }
  }

  test("banded near-dups: superset of single-bucket, subset of exact, scores identical") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "score").as[(Long, Long, Double)]
        .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val exact = pairs(Similarity.nearDupPairs(emb, 0.4))
    val banded = pairs(Similarity.nearDupPairsBanded(emb, 0.4))
    val bucketed = pairs(Similarity.nearDupPairsBucketed(emb, 0.4))
    assert(banded.nonEmpty)
    banded.foreach { case (p, s) =>
      assert(exact.get(p).contains(s), s"pair $p not in exact or score drifted")
    }
    // band 0 IS the single-bucket scheme, so its pairs are all recovered
    bucketed.keySet.foreach(p => assert(banded.contains(p), s"lost bucketed pair $p"))
    assert(banded.size >= bucketed.size)
  }

  test("sign-LSH top-k matches brute force restricted to the query bucket") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val lsh = Similarity.signLshTopK(emb, col("vec_id") < 20, 3)
      .select("query_id", "cand_id", "score").as[(Long, Long, Double)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 20, 1000)
      .select("query_id", "cand_id", "score").as[(Long, Long, Double)]
      .collect().map { case (q, c, s) => (q, c) -> s }.toMap
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, c, s) =>
      assert(exact.get((q, c)).contains(s), s"($q,$c) score drifted from exact")
    }
  }

  test("mmrSelect: diversity penalty breaks the near-duplicate monopoly") {
    // Query along e1; clones 1-2 sit at -30° in the e1e2 plane, the
    // diverse candidate 10 at +30°: all three share relevance cos30 ~
    // 0.866, so plain top-2 takes both clones (lowest-id tie). Under
    // MMR, after pick 1 (clone 1): clone 2 pays sim/2 ~ 0.5 -> score
    // ~0.366; candidate 10 pays cos60/2 = 0.25 -> score ~0.616 and
    // must be the second pick.
    val c30 = 0.8660254f; val s30 = 0.5f
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), // query
      (1L, Seq(c30, -s30, 0f, 0f)),
      (2L, Seq(c30, -s30, 0.0001f, 0f)),
      (10L, Seq(c30, s30, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(rows, col("vec_id") === 0, 3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == 1L) // relevance tie -> lowest id
    assert(out(2) == 10L, s"second pick not the diverse vector: $out")
    assert(out.values.toSet == Set(1L, 2L, 10L))
  }

  test("semdedupSweep: monotone curve whose 400-milli row equals the shipped face") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sweep = Similarity.semdedupSweep(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // raising the threshold can only shed pairs and drops
    val ts = sweep.keys.toSeq.sorted
    ts.sliding(2).foreach { case Seq(a, b) =>
      assert(sweep(a)._1 >= sweep(b)._1 && sweep(a)._2 >= sweep(b)._2)
    }
    // the sweep's 0.4 operating point must equal the semdedup face
    val dropped = Similarity.semdedup(emb, 0.4)
      .filter(col("dropped")).count()
    assert(sweep(400L)._2 == dropped,
      s"sweep says ${sweep(400L)._2} dropped at 0.4, face says $dropped")
    assert(sweep(400L)._3 == emb.count() - dropped)
  }

  test("kmeansTrainCurve: cohesion ascends and the clean two-cluster fixture separates") {
    // Two tight cosine clusters with jitter: Lloyd must end with every
    // member at cos ~1 to its centroid, and the spherical objective
    // (total cohesion) must not decrease round over round (the Lloyd
    // ascent property; micro-quantization noise is bounded by n).
    val rows = (0L until 60L).map { i =>
      if (i % 2 == 0) (i, Array(1f, (i % 7).toFloat / 100f, 0f, 0f))
      else (i, Array(0f, 0f, 1f, (i % 5).toFloat / 100f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val curve = Similarity.kmeansTrainCurve(emb, nCentroids = 4, rounds = 3)
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(rs => (rs.map(_.getLong(2)).sum,
        rs.map(_.getLong(3)).sum)).toMap
    // every round covers the whole corpus exactly once
    assert(curve.values.forall(_._1 == 60L))
    val coh = (1 to 3).map(r => curve(r)._2)
    assert(coh(1) >= coh(0) - 60L && coh(2) >= coh(1) - 60L,
      s"cohesion regressed: $coh")
    // converged: mean cosine within 1% of perfect
    assert(coh(2) > 60L * 990000L, s"final cohesion too low: ${coh(2)}")
  }

  test("ivfTopKFrom over a materialized index equals ivfTopK") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val idx = Similarity.ivfIndex(emb).persist() // caller-owned, as per contract
    try {
      val fromIdx = Similarity.ivfTopKFrom(idx, emb, col("vec_id") < 10, 3)
        .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
      val direct = Similarity.ivfTopK(emb, col("vec_id") < 10, 3)
        .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(fromIdx == direct && fromIdx.nonEmpty)
    } finally idx.unpersist()
  }

  test("bucketed ivfIndex materialization serves probe joins without a corpus-side shuffle") {
    // The 100 TB contract stated on ivfIndex: materialize the inverted
    // lists ONCE as a table bucketed by cid, and every subsequent query
    // joins on cid without re-shuffling the corpus. Disable auto-broadcast
    // so the probe join would otherwise be a shuffle-both-sides SMJ, and
    // assert the bucketed side's Exchange is gone.
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.ivfIndex(emb, nCentroids = 8).write
      .bucketBy(8, "cid").sortBy("cid")
      .mode("overwrite").saveAsTable("ivf_lists")
    val lists = spark.table("ivf_lists")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probes = Similarity.ivfIndex(emb, nCentroids = 8)
        .filter(col("c_id") < 10)
        .select(col("c_id").as("q_id"), col("cid"))
      val joined = lists.join(probes, Seq("cid"))
        .filter(col("q_id") =!= col("c_id"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      // exactly one shuffle: the probe side; the bucketed scan's hash
      // distribution satisfies the join's requirement
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 exchange (probe side), got $exchanges:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "lists side should scan the bucketed table")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ivf_lists")
    }
  }

  test("refined centroids are the member means of the seed assignment") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(120)
    val members = Similarity.ivfIndex(emb, nCentroids = 4)
      .select("cid", "c_emb")
      .as[(Long, Array[Float])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val refined = Similarity.refinedCentroids(emb, nCentroids = 4)
      .as[(Long, Array[Double])].collect().toMap
    assert(refined.keySet == members.keySet)
    refined.foreach { case (cid, cv) =>
      val vs = members(cid)
      cv.zipWithIndex.foreach { case (c, i) =>
        // decimal-exact sum / count — compare against a BigDecimal fold
        val exact = vs.map(v => BigDecimal(v(i).toDouble)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        assert(math.abs(c - exact.toDouble / vs.length) < 1e-12,
          s"cid=$cid dim=$i")
      }
    }
    // the k-means path is deterministic end to end
    val a = Similarity.ivfTopKKmeans(emb, col("vec_id") < 10, 3)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    val b = Similarity.ivfTopKKmeans(emb, col("vec_id") < 10, 3)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("IVF probes only nearest inverted lists and ranks deterministically") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 10, 3)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect()
    assert(ivf.nonEmpty)
    // per query: ranks are 1..k with no gaps
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // IVF recall: its top-1 must appear in the exact top-k reasonably
    // often; at minimum the result is stable across invocations
    val again = Similarity.ivfTopK(emb, col("vec_id") < 10, 3)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect()
    assert(ivf.toSet == again.toSet)
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest at-or-before right row per key, inclusive ties, null when none") {
    val left = Seq(
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
      (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 900.0))
      .toDF("k", "t", "price")
    val out = AsOf.asOf(left, right, "k", "t", Seq("price"))
      .select("tag", "asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("a").isEmpty)          // before any right row
    assert(out("b").contains(100.0))  // tie: left t == right t is inclusive
    assert(out("c").contains(150.0))  // latest earlier row wins
    assert(out("d").isEmpty)          // key 2's right row is later (9 > 7)
  }

  test("payload is not torn: all asof_* values come from the same right row") {
    // latest right row has price=NULL but a non-null note; a per-column
    // fill would resurrect the OLDER price next to the newer note
    val left = Seq((1L, 20L, "x")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, Some(100.0), Some("old")),
      (1L, 10L, None: Option[Double], Some("new")))
      .toDF("k", "t", "price", "note")
    val r = AsOf.asOf(left, right, "k", "t", Seq("price", "note"))
      .select("asof_price", "asof_note")
      .as[(Option[Double], Option[String])].collect()(0)
    assert(r == ((None, Some("new"))), s"torn payload: $r")
  }

  test("tolerance nulls a stale match, keeps boundary-exact and fresh ones") {
    val left = Seq((1L, 20L, "stale"), (1L, 12L, "fresh"),
      (1L, 15L, "boundary"), (2L, 9L, "none"))
      .toDF("k", "ms", "tag")
      .withColumn("t", timestamp_millis(col("ms")))
    val right = Seq((1L, 10L, 100.0)).toDF("k", "ms", "price")
      .withColumn("t", timestamp_millis(col("ms")))
    val out = AsOf.asOfWithin(left.drop("ms"), right.drop("ms"),
        "k", "t", Seq("price"), toleranceMs = 5L)
      .select("tag", "asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("stale").isEmpty)            // gap 10 > 5 — nulled
    assert(out("fresh").contains(100.0))    // gap 2
    assert(out("boundary").contains(100.0)) // gap == tolerance is inclusive
    assert(out("none").isEmpty)             // no right row at all
  }

  test("as-of plan is one key shuffle — no range-join candidate blowup") {
    val e = Tables.load(spark, sfDir, "events")
    val joined = AsOf.asOf(e, e.filter(col("event_type") === "purchase"),
      "user_id", "ts", Seq("event_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a pair blowup:\n$plan")
    assert(plan.contains("Window"), "running last() should drive the match")
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog", "en"),
    (2L, "zz9 xx8 yy7", "xx"))
    .toDF("doc_id", "text", "lang")

  test("stats compute token counts and ratios") {
    val r = TextAnalysis.stats(docs).filter(col("doc_id") === 1).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("text_chars") == 19L)
    assert(r.getAs[Double]("stopword_ratio") == 0.6) // the, and, the
    assert(r.getAs[Double]("alpha_ratio") == 1.0)
  }

  test("tokenCounts: whitespace vs BPE-ish vs chars/4 estimate") {
    val one = Seq((1L, "hello world42 x!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(one).collect()(0)
    assert(r.getLong(1) == 3L) // ws: hello | world42 | x!
    // bpe-ish: hello, world, 42, x, ! -> 5
    assert(r.getLong(2) == 5L)
    assert(r.getLong(3) == (16L + 3) / 4)
  }

  test("langId guesses en on stopword evidence, und without") {
    val out = TextAnalysis.langId(docs)
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "und")
  }

  test("packShards fills each shard to the token budget in doc order per group") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = TextAnalysis.packShards(docs, 2000L)
      .as[(Long, String, Long, Long)].collect()
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(_._1)
      // shard ids are non-decreasing in doc order and start at 0
      assert(ordered.head._4 == 0L)
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 >= a._4, s"$lang shards must be contiguous")
      }
      // a shard never holds more than budget tokens unless a single doc
      // alone exceeds it (the straddling doc lands with its last token)
      ordered.groupBy(_._4).foreach { case (_, members) =>
        val total = members.map(_._3).sum
        val prevSpill = 2000L // straddle allowance from the previous shard
        assert(total <= 2000L + prevSpill || members.exists(_._3 > 2000L))
      }
    }
  }

  test("fingerprints: identical text identical fp; small edit keeps winnow fp") {
    val d = Seq((1L, "abcdefghijklmnopqrstuvwxyz"), (2L, "abcdefghijklmnopqrstuvwxyz"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(d)
      .select("text_md5", "winnow_fp").collect()
    assert(fps(0) == fps(1))
  }

  test("assembleShards concatenates payloads in doc order within the shard") {
    val d = Seq(
      (1L, "aaaa", "en"), (2L, "bbbb", "en"), (3L, "cccc", "en"))
      .toDF("doc_id", "text", "lang")
    // est 1 token each, budget 2 -> shard 0 = docs 1+2, shard 1 = doc 3
    val out = TextAnalysis.assembleShards(d, 2L)
      .orderBy("shard_id")
      .select("shard_id", "n_docs", "shard_tokens", "payload_md5")
      .as[(Long, Long, Long, String)].collect()
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, md5("aaaa\nbbbb")),
      (1L, 1L, 1L, md5("cccc"))))
  }

  test("rep_signals kernel matches the declarative HOF reference on the corpus") {
    val d = Tables.load(spark, sfDir, "documents")
    val toks = split(col("text"), " ")
    val grams = when(size(toks) > 1,
      transform(sequence(lit(1), size(toks) - 1), i =>
        concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val ref = d.select(col("doc_id"),
      size(toks).cast("long").as("n"),
      array_max(transform(array_distinct(toks),
        t => size(filter(toks, x => x === t)))).cast("long").as("top"),
      size(grams).cast("long").as("ng"),
      (size(grams) - size(array_distinct(grams))).cast("long").as("dup"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    graft.functions.TextKernels.register(spark)
    val got = d.select(col("doc_id"), expr("rep_signals(text)").as("r"))
      .select(col("doc_id"), col("r.n_tokens"), col("r.top_cnt"),
        col("r.n_bigrams"), col("r.dup_bigrams"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("repetitionSignals flag repetitive text and keep varied text") {
    val d = Seq(
      (1L, ("spam " * 30).trim),                        // one token dominates
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")),   // all distinct
      (3L, "ab"),                                       // single token: no bigrams
      (4L, (((1 to 15).map(i => s"w$i").mkString(" ") + " ") * 2).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(d)
      .select("doc_id", "top_token_share", "dup_bigram_frac", "keep")
      .as[(Long, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1.0 && !out(1L)._4)
    assert(out(2L)._2 < 0.05 && out(2L)._3 == 0.0 && out(2L)._4)
    assert(out(3L)._3 == 0.0 && !out(3L)._4) // too short, but no crash
    assert(out(4L)._3 > 0.4 && !out(4L)._4)  // duplicated half
  }

  test("stratifiedSample is deterministic, stable under growth, independent of splitAssign") {
    val docs = Tables.load(spark, sfDir, "documents")
    val rates = Map("en" -> 300, "zh" -> 500)
    val a = TextAnalysis.stratifiedSample(docs, rates).as[(Long, String, Long)]
      .collect().toSet
    val b = TextAnalysis.stratifiedSample(docs, rates).as[(Long, String, Long)]
      .collect().toSet
    assert(a == b && a.nonEmpty)
    // growth stability: sampling a subset yields exactly the subset's rows
    val sub = TextAnalysis.stratifiedSample(
      docs.filter(col("doc_id") < 100), rates).as[(Long, String, Long)]
      .collect().toSet
    assert(sub == a.filter(_._1 < 100))
    // salted hash differs from the split bucket (independence)
    val splitBuckets = TextAnalysis.splitAssign(docs)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(a.exists { case (id, _, bucket) => splitBuckets(id) != bucket })
  }

  test("tfidfTopK ranks a document's distinctive term above ubiquitous ones") {
    val d = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "gamma common")).toDF("doc_id", "text")
    val top1 = TextAnalysis.tfidfTopK(d, 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    // each doc's unique term (df=1) outranks 'common' (df=3) despite tf
    assert(top1 == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")

  test("gap over threshold starts a new session; sessions roll up correctly") {
    val e = ev(
      (1L, 1L, 0L, 1.0), (2L, 1L, 100L, 2.0),   // session 1
      (3L, 1L, 5000L, 3.0),                      // gap 4900 > 1800 -> session 2
      (4L, 2L, 0L, 4.0))                         // other user
    val out = Sessionize.sessions(e, 1800L)
      .select("user_id", "session_seq", "n_events", "value_cents", "duration_ms")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 2L, 300L, 100000L),
      (1L, 2L, 1L, 300L, 0L),
      (2L, 1L, 1L, 400L, 0L)))
  }

  test("assign is total: every event gets exactly one (user, session) id") {
    val e = Tables.load(spark, sfDir, "events")
    val assigned = Sessionize.assign(e, 43200L)
    assert(assigned.count() == e.count())
    assert(assigned.filter(col("session_seq").isNull).count() == 0)
  }

  test("session rollup reuses the user-key exchange: exactly one shuffle") {
    val e = Tables.load(spark, sfDir, "events")
    val plan = Sessionize.sessions(e, 43200L).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}

class KeyStatsSpec extends SparkSpec {
  import spark.implicits._

  test("keyStats ranks heavy hitters with exact shares") {
    val d = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val out = functions.Salt.keyStats(d, "k", 2)
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
  }
}

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("discrete quantiles select the exact ceil-rank member per group") {
    // g1: values 1..10 -> p50 = 5th = 5, p90 = 9th = 9
    // g2: values 1..3  -> p50 = 2nd = 2, p90 = ceil(2.7) = 3rd = 3
    val d = ((1 to 10).map(i => ("g1", i.toLong, i.toLong)) ++
      (1 to 3).map(i => ("g2", i.toLong, 100L + i)))
      .toDF("g", "v", "id")
    val out = Quantiles.groupStats(d, "g", "v", "id")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(("g1", 10L, 1L, 10L, 5L, 9L), ("g2", 3L, 1L, 3L, 2L, 3L)))
  }

  test("sampleQuantiles audits its own rank error and is partition-invariant") {
    val d = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val out = Quantiles.sampleQuantiles(d, "event_type", "event_id", "cents")
      .orderBy("event_type", "q")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // EVERY (group, q) of the base relation is present — sampled or not
    // (the left-join contract: an unsampled group emits NULL est_v, not
    // a missing row)
    val allGroups = d.select("event_type").distinct()
      .as[String].collect().toSet
    assert(rows.map(_.getString(0)).toSet == allGroups)
    assert(rows.length == allGroups.size * 2)
    rows.foreach { r =>
      val (cnt, ns) = (r.getLong(2), r.getLong(3))
      assert(ns <= cnt && cnt > 0)
      if (r.isNullAt(4)) {
        // unsampled group: the whole estimate lane is the NULL sentinel
        assert(ns == 0 && r.isNullAt(5) && r.isNullAt(7))
      } else {
        assert(ns > 0)
        val (trueRank, targetRank, err) =
          (r.getLong(5), r.getLong(6), r.getLong(7))
        assert(err == math.abs(trueRank - targetRank) * 1000000L / cnt)
        // sampling rank error concentrates at O(1/sqrt(n_sample)); 3
        // sigma of the binomial bound keeps the check meaningful at
        // sf0.001's ~40-row samples without flaking
        val bound = (3.0e6 / math.sqrt(ns.toDouble)).toLong
        assert(err <= bound, s"rank error $err ppm > $bound ppm: $r")
      }
    }
    // hash-sample determinism: same result at a different partitioning
    val re = Quantiles.sampleQuantiles(
      d.repartition(7, col("event_id")), "event_type", "event_id", "cents")
      .orderBy("event_type", "q").collect()
    assert(re.toSeq == rows.toSeq)
  }

  test("sampleQuantiles merges: shard SAMPLE relations union into the sketch") {
    // The mergeability contract, exercised through the merge FACE (the
    // r10 advice: test the shard-sample concatenation the scaladoc
    // claims, not just operator-over-union): two shard-local sample
    // relations combined by plain union yield bit-identical estimates
    // to the one-pass sketch — no rescan of either shard.
    val d = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val a = d.filter(col("event_id") % 2 === 0)
    val b = d.filter(col("event_id") % 2 =!= 0)
    val whole = Quantiles.quantilesFromSample(
        Quantiles.sampleRelation(d, "event_type", "event_id", "cents"))
      .orderBy("g", "q").collect()
    val merged = Quantiles.quantilesFromSample(
        Quantiles.sampleRelation(a, "event_type", "event_id", "cents")
          .unionByName(
            Quantiles.sampleRelation(b, "event_type", "event_id", "cents")))
      .orderBy("g", "q").collect()
    assert(merged.toSeq == whole.toSeq && whole.nonEmpty)
  }

  test("sampleQuantiles keeps groups too small to sample, with NULL estimate") {
    // 40 one-row groups at permille=200: most draw no sample. The
    // expected sampled id set is computed from the SAME hash predicate
    // the operator uses, so the test is deterministic and pins the
    // left-join behavior for both populations.
    val d = (1L to 40L).map(i => (s"g$i", i, i * 10)).toDF("g", "id", "v")
    val sampledIds = Quantiles.sampleRelation(d, "g", "id", "v")
      .select("id").as[Long].collect().toSet
    assert(sampledIds.size < 40, "fixture unexpectedly fully sampled")
    val out = Quantiles.sampleQuantiles(d, "g", "id", "v")
      .collect()
    assert(out.length == 40 * 2)
    out.foreach { r =>
      val id = r.getString(0).drop(1).toLong
      if (sampledIds(id)) {
        assert(r.getLong(3) == 1L && !r.isNullAt(4) &&
          r.getLong(4) == id * 10)
      } else {
        assert(r.getLong(3) == 0L && r.isNullAt(4) && r.isNullAt(5) &&
          r.isNullAt(7))
      }
    }
  }

  test("quantile plan shuffles once on the group key") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val plan = Quantiles.groupStats(d, "lang", "n", "doc_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("audit counts orphans exactly and passes clean edges") {
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 9L), (13L, 8L))
      .toDF("cid", "fk")
    val r = Integrity.check("c->p", child, parent, Seq("fk" -> "pid"))
      .as[(String, Long, Long, Boolean)].collect()(0)
    assert(r == (("c->p", 4L, 2L, false)))
    val clean = Integrity.check("ok", child.filter(col("fk") <= 3), parent,
      Seq("fk" -> "pid")).as[(String, Long, Long, Boolean)].collect()(0)
    assert(clean == (("ok", 2L, 0L, true)))
  }

  test("duplicate parent keys do not inflate child counts") {
    val parent = Seq(1L, 1L, 1L).toDF("pid") // non-unique parent side
    val child = Seq((10L, 1L), (11L, 2L)).toDF("cid", "fk")
    val r = Integrity.check("dup", child, parent, Seq("fk" -> "pid"))
      .as[(String, Long, Long, Boolean)].collect()(0)
    assert(r == (("dup", 2L, 1L, false)))
  }
}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", timestamp_seconds(col("ts_s"))).drop("ts_s")

  test("funnel counts only in-order progressions") {
    val e = ev(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
      (4L, 2L, 10L, "click"), (5L, 2L, 20L, "view"),    // click BEFORE view
      (6L, 3L, 10L, "view"),
      (7L, 4L, 10L, "purchase"))                         // purchase only
    val got = Funnel.reach(e, Seq("view", "click", "purchase"))
      .select("step", "event_type", "users")
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("reachTimes carries nulls for unreached steps, same-instant counts") {
    val e = ev(
      (1L, 1L, 10L, "view"), (2L, 1L, 10L, "click"),    // same instant: counts
      (3L, 2L, 10L, "view"))
    val rt = Funnel.reachTimes(e, Seq("view", "click"))
      .select("user_id", "t_view", "t_click")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rt(1L) == ((Some(10000L), Some(10000L))))
    assert(rt(2L) == ((Some(10000L), None)))
  }
}

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingSessions

  test("event-time timeout closes sessions that match the batch operator") {
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamingSessions.sessionize(mem.toDF(), gapSeconds = 1800L,
      watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def ev(id: Long, min: Int, user: Long, v: Double) =
        Ev(id, new java.sql.Timestamp(1704067200000L + min * 60000L),
          user, "click", v)
      // user 10: two events 5 min apart (one session), then 2h of silence
      mem.addData(ev(1, 0, 10, 1.0), ev(2, 5, 10, 2.5))
      q.processAllAvailable()
      // a much later event advances the watermark past the session's
      // gap horizon -> the open session times out and is emitted
      mem.addData(ev(3, 180, 11, 9.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .as[StreamingSessions.ClosedSession].collect().toSet
      val base = 1704067200000L
      assert(got == Set(StreamingSessions.ClosedSession(
        10L, base, base + 5 * 60000L, 2L, 350L)))
    } finally q.stop()
  }

  test("in-batch gaps split sessions without waiting for the timeout") {
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamingSessions.sessionize(mem.toDF(), gapSeconds = 600L,
      watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      def ev(id: Long, min: Int, user: Long, v: Double) =
        Ev(id, new java.sql.Timestamp(1704067200000L + min * 60000L),
          user, "click", v)
      // one micro-batch carrying TWO sessions for user 5 (gap 30 > 10 min)
      mem.addData(ev(1, 0, 5, 1.0), ev(2, 2, 5, 1.0), ev(3, 40, 5, 1.0))
      q.processAllAvailable()
      val got = spark.table("sessions2")
        .as[StreamingSessions.ClosedSession].collect().toSet
      val base = 1704067200000L
      // the first session closed in-batch; the second is still open
      assert(got == Set(StreamingSessions.ClosedSession(
        5L, base, base + 2 * 60000L, 2L, 200L)))
    } finally q.stop()
  }
}

class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("decode stub is deterministic and bounded") {
    val (w1, h1, c1, l1) = Multimodal.decodeStub("payload".getBytes)
    val (w2, _, _, _) = Multimodal.decodeStub("payload".getBytes)
    assert(w1 == w2)
    assert(w1 >= 16 && w1 < 256 && h1 >= 16 && h1 < 256)
    assert(c1 == 3 && l1 >= 0.0 && l1 < 1.0)
  }

  test("features preserve row count and schema through batched decode") {
    val f = Multimodal.features(spark, docs)
    assert(f.count() == docs.count())
    assert(f.columns.toSeq ==
      Seq("doc_id", "byte_len", "width", "height", "channels", "luminance"))
  }

  test("resize plan preserves aspect with integer floors and a 1px floor") {
    import spark.implicits._
    val dims = Seq((1L, 100, 50), (2L, 50, 100), (3L, 64, 64), (4L, 2000, 10))
      .toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(dims, 64, 64)
      .select("doc_id", "out_w", "out_h").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((64, 32)))  // wide: clamp width, floor height
    assert(out(2L) == ((32, 64)))  // tall: clamp height, floor width
    assert(out(3L) == ((64, 64)))  // exact fit
    assert(out(4L) == ((64, 1)))   // extreme ratio floors to 1px, never 0
  }

  test("frame sampling emits every stride-th full frame") {
    val media = Multimodal.withPayload(docs)
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 4)
    val perDoc = frames.groupBy("doc_id").count()
    val expect = docs.select(col("doc_id"),
      ceil((floor(length(col("text")) / 32)).cast("double") / 4).cast("long").as("e"))
    val bad = perDoc.join(expect, Seq("doc_id"))
      .filter(col("count") =!= col("e"))
    assert(bad.isEmpty)
  }

  // Independent in-test reference: exact rational block means via
  // double-precision accumulation over fractional overlaps would risk
  // parity noise, so the reference recomputes the SAME exact-integer
  // contract (overlap-weighted sums in 1/(64·L) units) from its own
  // loop shape — a per-block scan, not the kernel's per-byte scatter.
  private def dhashRef(bytes: Array[Byte]): Long = {
    val L = bytes.length.toLong
    val s = (0 until 64).map { b =>
      bytes.indices.map { i =>
        val lo = 64L * i; val hi = lo + 64L
        val ov = math.min(hi, (b + 1) * L) - math.max(lo, b * L)
        if (ov > 0) (bytes(i) & 0xff).toLong * ov else 0L
      }.sum
    }
    (0 until 63).map(b => if (s(b) > s(b + 1)) 1L << b else 0L).sum
  }

  test("dhash63 kernel matches the independent block-scan reference") {
    import spark.implicits._
    val sample = docs.select("text").as[String].take(50) ++
      Seq("a", "zz", " ", "x" * 63, "y" * 64, "q" * 65)
    graft.functions.TextKernels.register(spark)
    val got = sample.toSeq.toDF("t")
      .selectExpr("dhash63(encode(t, 'UTF-8')) AS h").as[Long].collect()
    val want = sample.map(t => dhashRef(t.getBytes("UTF-8")))
    assert(got.toSeq == want.toSeq)
    assert(graft.functions.TextKernels.dhash63(Array.emptyByteArray) == 0L)
    // high bytes (>0x7F — a real JPEG payload is full of them; the
    // ASCII fixture never exercises this): signed-byte masking must
    // read 0..255, and the kernel must agree with the reference
    val hi = Array.tabulate(200)(i => ((i * 37 + 130) % 256).toByte)
    assert(graft.functions.TextKernels.dhash63(hi) == dhashRef(hi))
    assert((0 until 200).exists(i => (hi(i) & 0xff) > 127)) // test is live
  }

  test("phash is exactly invariant under integer upsampling (box filter)") {
    import graft.functions.TextKernels.dhash63
    val texts = docs.select("text").as[String](
      org.apache.spark.sql.Encoders.STRING).take(30)
    texts.foreach { t =>
      val b = t.getBytes("UTF-8")
      Seq(2, 3, 7).foreach { k =>
        val up = b.flatMap(x => Array.fill(k)(x))
        assert(dhash63(up) == dhash63(b),
          s"${k}x upsample moved the hash for a ${b.length}-byte payload")
      }
    }
  }

  test("planted recompressed/rescaled variants pair with their originals") {
    val planted = Multimodal.plantVariants(docs)
    val pairs = Multimodal.phashPairs(Multimodal.withPayload(planted))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val shift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val origIds = docs.select("doc_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val wantA = origIds.filter(_ % 20 == 0).map(id => (id, id + shift))
    val wantB = origIds.filter(_ % 20 == 10).map(id => (id, id + 2 * shift))
    val got = pairs.map(p => (p._1, p._2)).toSet
    // full recall on BOTH variant families at radius 4...
    assert((wantA ++ wantB).subsetOf(got))
    // ...with tight distances (the ≤2-bit margin the radius rests on)
    assert(pairs.forall(_._3 <= 4))
    // and no original-vs-original noise pairs at fixture scale
    assert(got.forall { case (a, b) => !(origIds(a) && origIds(b)) })
  }

  test("binary lane: full-range payloads, planted bounds, empty contract") {
    import spark.implicits._
    // the payload really exercises the full byte range (>0x7F and low)
    val byDoc = Multimodal.withBinaryPayload(docs.limit(50))
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val payloads = byDoc.map(_._2)
    assert(payloads.exists(_.exists(b => (b & 0xff) > 0x7f)))
    assert(payloads.exists(_.exists(b => (b & 0xff) < 0x10)))
    // both 48- and 64-byte lengths occur (overlap-weighting live), and
    // the % 50 = 7 docs carry the planted ZERO-LENGTH payload (r15 #5)
    assert(payloads.map(_.length).toSet == Set(0, 48, 64))
    assert(byDoc.forall { case (id, p) => (p.length == 0) == (id % 50 == 7) })
    // planted bounds: perturbed <= 3 bits, exact dup = 0, full recall
    val planted = Multimodal.plantBinaryVariants(docs)
    val pairs = Multimodal.phashPairs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val shift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val origIds = docs.select("doc_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val wantPert = origIds.filter(_ % 20 == 0).map(id => (id, id + shift))
    val wantDup = origIds.filter(_ % 20 == 10).map(id => (id, id + 2 * shift))
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert((wantPert ++ wantDup).subsetOf(got))
    assert(pairs.filter(p => wantDup((p._1, p._2))).forall(_._3 == 0L))
    assert(pairs.filter(p => wantPert((p._1, p._2))).forall(_._3 <= 3L))
    assert(got.forall { case (a, b) => !(origIds(a) && origIds(b)) })
    // empty payload: NO fingerprint row (ADVICE r14 — the oracle's
    // per-byte unnest emits no row, so neither does the engine)
    val empty = Seq((7L, Array.emptyByteArray)).toDF("doc_id", "payload")
    assert(Multimodal.phash(empty).isEmpty)
    // ...and the CORPUS-PLANTED empty docs (id % 50 = 7) are absent
    // from the fingerprint relation, oracle-tier via image_phash_binary
    val phashIds = Multimodal.phash(Multimodal.withBinaryPayload(docs))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(origIds.exists(_ % 50 == 7), "fixture must contain a planted doc")
    assert(phashIds == origIds.filterNot(_ % 50 == 7))
  }

  test("frameHashes: every whole frame hashed, short payloads yield none") {
    import graft.functions.TextKernels.dhash63
    val media = Multimodal.withPayload(docs.limit(40))
    val got = Multimodal.frameHashes(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = docs.limit(40).select("doc_id", "text").collect().flatMap { r =>
      val b = r.getString(1).getBytes("UTF-8")
      (0 until b.length / 32).map(i =>
        (r.getLong(0), i.toLong) ->
          dhash63(java.util.Arrays.copyOfRange(b, i * 32, (i + 1) * 32)))
    }.toMap
    assert(got == want)
    // a sub-frame payload must produce zero rows, not a crash (the
    // descending-sequence pitfall)
    import spark.implicits._
    val tiny = Seq((1L, "short")).toDF("doc_id", "text")
    assert(Multimodal.frameHashes(Multimodal.withPayload(tiny)).isEmpty)
  }

  test("video near-dups: planted cuts pair at full containment") {
    val planted = Multimodal.plantVideoVariants(docs)
    val pairs = Multimodal.videoNearDups(Multimodal.withPayload(planted))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val shift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    import spark.implicits._
    val meta = docs.select("doc_id", "n_chars").as[(Long, Long)]
      .collect().toMap
    // every tail-cut variant (>= 2 original frames, so the cut keeps a
    // distinct-frame subset) and every intro-cut variant pairs with its
    // original at exactly 1000 permille — cut frames stay byte-identical
    val tails = meta.keys.filter(id => id % 20 == 5 && meta(id) / 32 >= 2)
    val intros = meta.keys.filter(id => id % 20 == 15 && meta(id) >= 97)
    (tails.map(id => (id, id + shift)) ++
      intros.map(id => (id, id + 2 * shift))).foreach { p =>
      assert(pairs.get(p).contains(1000L), s"planted pair $p: ${pairs.get(p)}")
    }
  }

  test("audio near-dups: CDC chunks survive the unaligned trims that defeat framing") {
    import spark.implicits._
    val planted = Multimodal.plantAudioVariants(docs)
    val shift = Multimodal.plantShift(docs)
    val meta = docs.select("doc_id", "n_chars").as[(Long, Long)]
      .collect().toMap
    val wantA = meta.keys.filter(id => id % 20 == 3 && meta(id) >= 50)
      .map(id => (id, id + shift)).toSet
    val wantB = meta.keys.filter(id => id % 20 == 13 && meta(id) >= 55)
      .map(id => (id, id + 2 * shift)).toSet
    assert(wantA.nonEmpty && wantB.nonEmpty)
    val audio = Multimodal.audioNearDups(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // content-defined chunking recovers the planted trim pairs; a clip
    // that survives the min-chunk clamp with only 2-3 chunks can
    // legitimately land under the half-containment threshold when the
    // trim rewrites its boundary chunk — allow at most one such
    // physical-limit miss per family (full recall at the oracle SF)
    assert((wantA -- audio).size <= 1, s"head-trim missed: ${wantA -- audio}")
    assert((wantB -- audio).size <= 1, s"tail-trim missed: ${wantB -- audio}")
    // the contrast that justifies CDC: positional frame containment
    // dies on the 17-sample HEAD trim (every frame shifts off its
    // 32-byte grid) while it trivially survives tail cuts — which is
    // exactly why the video face plants frame-aligned edits and the
    // audio face exists
    val video = Multimodal.videoNearDups(Multimodal.withPayload(planted))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wantA.count(video.contains) == 0,
      "frame-aligned containment unexpectedly survived an unaligned head trim")
  }

  test("video near-dup hot-frame cap drops ubiquitous-frame-only pairs") {
    import spark.implicits._
    // 100 clips sharing one 32-byte intro frame plus a unique body
    // frame: every pair shares ONLY the intro (containment 500), and
    // the intro's document frequency (100) is over the cap, so the
    // capped face must report nothing while an uncapped run drowns in
    // C(100,2) junk pairs. Bodies are md5-hex (32 random-looking
    // chars) — near-identical zero-padded counters can legitimately
    // dhash-collide, which is not what this test measures.
    val intro = "x" * 32
    def body(i: Int): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"clip$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val clips = (0 until 100)
      .map(i => (i.toLong, intro + body(i)))
      .toDF("doc_id", "text")
    val media = Multimodal.withPayload(clips)
    assert(Multimodal.videoNearDups(media).isEmpty)
    assert(Multimodal.videoNearDups(media, maxPosting = 1000).count() == 4950L)
  }

  test("radius sweep: recall monotone and FULL at the shipped radius 4") {
    val rows = graft.SparkEntry.queries("image_radius_sweep")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(rows.keySet == Set(0L, 2L, 4L, 6L, 8L))
    // recall climbs with radius; most variants land within 2 bits but
    // a short jittered doc can drift to 3-4 (this fixture has one) —
    // which is exactly the margin the shipped radius 4 buys
    val recalls = Seq(0L, 2L, 4L, 6L, 8L).map(rows(_)._3)
    assert(recalls == recalls.sorted)
    assert(rows(2L)._3 >= 900L, s"radius-2 recall collapsed: ${rows(2L)}")
    assert(rows(4L)._3 == 1000L, s"radius-4 recall: ${rows(4L)}")
    // pair counts monotone in radius (a wider radius only adds pairs)
    val counts = Seq(0L, 2L, 4L, 6L, 8L).map(rows(_)._1)
    assert(counts == counts.sorted)
  }

  test("decoded lane: PNG roundtrip is exact; a recompressed container diverges in bytes but not in decoded hash (r18)") {
    import spark.implicits._
    // roundtrip exactness doc-by-doc: decode(encode(px)) == px, so the
    // decoded fingerprints equal the binary lane's bit-for-bit
    val pixelsByDoc = Multimodal.withBinaryPayload(docs.limit(60))
      .filter(length(col("payload")) > 0)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val pngByDoc = Multimodal.withPngPayload(docs.limit(60))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(pngByDoc.keySet == pixelsByDoc.keySet)
    pngByDoc.foreach { case (id, png) =>
      // a REAL container, not the raw bytes: PNG signature up front
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte, s"doc $id")
      assert(graft.functions.ImageKernels.pngGrayDecode(png)
        .sameElements(pixelsByDoc(id)), s"doc $id roundtrip")
    }
    val decoded = Multimodal.phashDecoded(
      Multimodal.withPngPayload(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = Multimodal.phash(Multimodal.withBinaryPayload(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decoded.nonEmpty && decoded == raw)
    // recompress divergence: splice a tEXt ancillary chunk after IHDR
    // (valid PNG, same pixels, different bytes — what a re-save does).
    // The PAYLOAD-byte fingerprints diverge; the DECODED ones cannot.
    def recompress(png: Array[Byte]): Array[Byte] = {
      val ihdrLen = java.nio.ByteBuffer.wrap(png, 8, 4).getInt
      val at = 8 + 12 + ihdrLen
      val data = "Comment recompressed".getBytes("ISO-8859-1")
      val crc = new java.util.zip.CRC32()
      crc.update("tEXt".getBytes("ISO-8859-1"))
      crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length)
      bb.put("tEXt".getBytes("ISO-8859-1"))
      bb.put(data)
      bb.putInt(crc.getValue.toInt)
      png.slice(0, at) ++ bb.array() ++ png.slice(at, png.length)
    }
    val (someId, somePng) = pngByDoc.head
    val re = recompress(somePng)
    assert(!re.sameElements(somePng))
    assert(graft.functions.TextKernels.dhash63(re) !=
      graft.functions.TextKernels.dhash63(somePng),
      "payload-byte hashes should diverge across a re-save")
    assert(graft.functions.ImageKernels.pngGrayDecode(re)
      .sameElements(pixelsByDoc(someId)))
    val twoLanes = Multimodal.phashDecoded(
      Seq((someId, somePng), (someId + 1000000L, re))
        .toDF("doc_id", "payload"))
      .collect().map(_.getLong(1)).toSet
    assert(twoLanes.size == 1,
      "decoded hashes must be identical across the recompress")
  }

  test("banded phash pairing equals the brute-force all-pairs answer") {
    val sig = Multimodal.phash(Multimodal.withPayload(docs.limit(200)))
    val banded = Multimodal.phashPairs(
        Multimodal.withPayload(docs.limit(200)), maxHamming = 4)
      .select("doc_a", "doc_b", "hamming").collect().toSet
    val brute = sig.select(col("doc_id").as("doc_a"), col("phash").as("pa"))
      .join(sig.select(col("doc_id").as("doc_b"), col("phash").as("pb")),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 4).collect().toSet
    assert(banded == brute)
  }
}
