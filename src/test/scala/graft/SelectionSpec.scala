package graft

import graft.operators.{Dedup, Selection}
import org.apache.spark.sql.functions._

/** Specs for the data-selection operators and the winnowing kernel. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("winnow_set guarantees a shared fingerprint for long shared substrings") {
    graft.functions.TextKernels.register(spark)
    // SWA coverage: any shared substring of length >= 7 + w (here 15)
    // must share at least one window-min fingerprint.
    val shared = "zqxwvukjhgfedcba" // 16 chars, appears in both docs
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different $shared tail")).toDF("doc_id", "text")
    val sets = df.select(col("doc_id"), expr("winnow_set(text, 8)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sets(1L).intersect(sets(2L)).nonEmpty)
  }

  test("winnow_set is the sorted distinct window-min set; winnow_fp its global min") {
    graft.functions.TextKernels.register(spark)
    val r = Seq(("abcdefghijklmnop", 1))
      .toDF("text", "x")
      .select(expr("winnow_set(text, 4)").as("s"), expr("winnow_fp(text)").as("g"))
      .collect()(0)
    val s = r.getSeq[Long](0)
    assert(s == s.sorted && s.distinct == s)
    assert(s.min == r.getLong(1))
  }

  test("winnowOverlapPairs finds a planted excerpt, permille near containment") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog"), // prefix excerpt
      (3L, "zebra xylophone quartz jackal vivid mosaic")).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, window = 4, minShared = 2L)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(p12.getAs[Long]("overlap_permille") >= 700L) // excerpt ~contained
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("dsirTopK ranks target-domain-like docs first") {
    // Target = docs tagged 'en'; 'xx' docs use a disjoint vocabulary, and
    // one untagged doc ('mix') written in target vocabulary must outrank
    // the off-domain ones.
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta alpha beta"),
      (2L, "en", "beta gamma delta epsilon alpha gamma"),
      (3L, "xx", "uno dos tres cuatro cinco seis"),
      (4L, "xx", "sept huit neuf dix onze douze"),
      (5L, "mix", "alpha beta gamma delta epsilon beta")
    ).toDF("doc_id", "lang", "text")
    val ranked = Selection.dsirTopK(docs, "lang = 'en'", 256, 5)
      .collect().map(r => r.getAs[Long]("doc_id")).toSeq
    val pos = ranked.zipWithIndex.toMap
    assert(pos(5L) < pos(3L) && pos(5L) < pos(4L))
    assert(Set(1L, 2L, 5L).map(pos).max < Set(3L, 4L).map(pos).min)
  }

  test("dsirSample is a replayable draw: identical across runs, weight-biased") {
    val docs = (1L to 40L).map { i =>
      val lang = if (i <= 10) "en" else "xx"
      val text = if (i <= 20) "alpha beta gamma delta" else "uno dos tres cuatro"
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val a = Selection.dsirSample(docs, "lang = 'en'", 256, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val b = Selection.dsirSample(docs, "lang = 'en'", 256, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(a == b) // hash-derived Gumbel: the draw replays bit-identically
    // weight bias: target-vocabulary docs (1-20) dominate the draw
    val drawn = a.map(_._2).toSet
    assert(drawn.count(_ <= 20L) > drawn.count(_ > 20L))
  }

  test("unigramPpl: repetitive common-token docs score lower than rare-token docs") {
    val docs = Seq(
      (1L, "common common common common common common"),
      (2L, "common common common rare1 rare2 rare3")).toDF("doc_id", "text")
    val out = Selection.unigramPpl(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(out(1L) < out(2L))
    // doc of only the modal token: ppl = total/cnt(common) = 12/9 exactly
    assert(math.abs(out(1L) - 12.0 / 9.0) < 1e-6)
  }

  test("bigramPpl: order-aware — scrambled word order raises perplexity") {
    // Two docs share the exact unigram census (c:3, d:3 — unigramPpl
    // ties them) but doc 2 uses the pairs (dd, cc) the corpus sees only
    // once; only the bigram LM separates them: p(cd)=p(dc)=0.74 vs
    // p(dd)=p(cc)=0.26 under λ=0.8 with pu=0.5.
    val docs = Seq(
      (1L, "c d c d c d"),
      (2L, "d c d d c c")).toDF("doc_id", "text")
    val out = Selection.bigramPpl(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl"))).toMap
    assert(out(1L)._1 == 5L && out(2L)._1 == 5L)
    // doc 1 is all 0.74-pairs: ppl = 1/0.74 exactly
    assert(math.abs(out(1L)._2 - 1.0 / 0.74) < 1e-5)
    assert(out(1L)._2 < out(2L)._2)
  }

  test("bigramPpl: one-token documents drop out (no pairs to score)") {
    val docs = Seq((1L, "solo"), (2L, "two tokens here")).toDF("doc_id", "text")
    val ids = Selection.bigramPpl(docs).collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("zipfSlope: a planted power law reads back near -1 with a tight fit") {
    // token k repeated floor(96/k) times -> cnt ~ 96/k, an exact
    // rank-frequency power law up to integer flooring.
    val text = (1 to 24).flatMap(k => Seq.fill(96 / k)(f"t$k%02d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = Selection.zipfSlope(docs, topR = 24).collect()(0)
    assert(r.getLong(0) == 24L)
    val slope = r.getLong(1)
    assert(slope > -1150L && slope < -850L, s"slope_milli=$slope")
    assert(r.getLong(2) > 950L) // r² permille: near-perfect log-log line
  }

  test("zipfSlope: a flat census has slope 0 and NULL r2, not an infinity") {
    val docs = Seq((1L, "aa bb cc dd aa bb cc dd")).toDF("doc_id", "text")
    val r = Selection.zipfSlope(docs, topR = 4).collect()(0)
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(2))
  }

  test("sourceProfile: exact card values and lexicographic dominant-lang ties") {
    val docs = Seq(
      (1L, "a", "en", "web", 10L), (2L, "b", "en", "web", 20L),
      (3L, "c", "fr", "web", 30L), (4L, "d", "fr", "web", 41L),
      (5L, "e", "de", "books", 100L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Selection.sourceProfile(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6))).toMap
    // web: 4 docs, 101 chars, mean 25 (truncating div), 2 langs; the
    // en/fr count tie resolves to 'en' (lexicographic), share 500
    assert(out("web") == ((4L, 101L, 25L, 2L, "en", 500L)))
    assert(out("books") == ((1L, 100L, 100L, 1L, "de", 1000L)))
  }

  test("docTokenEntropy: looping text collapses toward zero, diverse text to ln n") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // H = 0, TTR 125
      (2L, "one two three four five six seven eight")) // H = ln 8, TTR 1000
      .toDF("doc_id", "text")
    val out = Selection.docTokenEntropy(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("h_nats"), r.getAs[Long]("ttr_permille"))).toMap
    assert(out(1L)._1 == 0.0 && out(1L)._2 == 125L)
    assert(math.abs(out(2L)._1 - math.log(8.0)) < 1e-5)
    assert(out(2L)._2 == 1000L)
  }

  test("ngramNovelty: a re-fetch scores zero, fresh content full permille") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact re-fetch of doc 1
      (3L, "zeta eta theta iota"), // all-new trigrams
      (4L, "alpha beta gamma zeta eta theta")) // mixed: 2 old, 2 new
      .toDF("doc_id", "text")
    val out = Selection.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 3L, 1000L)))
    assert(out(2L) == ((3L, 0L, 0L)))
    assert(out(3L) == ((2L, 2L, 1000L)))
    // doc 4: a_b_g seen; b_g_z, g_z_e, z_e_t new... b_g_zeta and g_zeta_eta
    // are genuinely new trigrams; zeta_eta_theta was introduced by doc 3
    assert(out(4L) == ((4L, 2L, 500L)))
  }

  test("vocabGrowth: cumulative counts reconcile and repeated text stops adding types") {
    // Buckets 0-1 introduce the whole vocabulary; the later docs only
    // repeat it, so n_types_new must go to zero while tokens keep
    // accumulating — the Heaps flattening the gauge exists to show.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (3L, "delta epsilon"),
      (6L, "alpha beta delta"),
      (9L, "gamma gamma epsilon")).toDF("doc_id", "text")
    val out = Selection.vocabGrowth(docs, buckets = 4).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bucket rule: id*4 div 10 -> 0,1,2,3
    assert(out.keySet == Set(0, 1, 2, 3))
    assert(out(0) == ((3L, 3L, 3L, 3L)))
    assert(out(1) == ((2L, 5L, 2L, 5L)))
    assert(out(2)._3 == 0L && out(3)._3 == 0L) // nothing new after b1
    assert(out(3)._2 == 11L && out(3)._4 == 5L) // totals reconcile
  }

  test("sourceTokenKl: corpus-typical source ~0, drifted source > it, argmax attributes") {
    // Sources A and B have the corpus-typical mix; C is dominated by a
    // token that is rare corpus-wide — C must carry the largest KL and
    // its top contributing token must be the drift term itself.
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "A"),
      (2L, "alpha beta gamma alpha beta", "B"),
      (3L, "drift drift drift drift gamma", "C")).toDF("doc_id", "text", "source")
    val out = Selection.sourceTokenKl(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("kl_nats"), r.getAs[String]("top_tok"))).toMap
    assert(out("A")._1 == out("B")._1) // identical distributions tie
    assert(out("C")._1 > out("A")._1)
    assert(out("C")._2 == "drift")
    assert(out.keySet == Set("A", "B", "C"))
  }
}
