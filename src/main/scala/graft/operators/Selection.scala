package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-selection operators for the training-data pipeline: which
  * documents to KEEP, ranked by statistical fit rather than filtered by
  * per-document heuristics (the [[TextAnalysis]] quality rules).
  *
  *  - [[dsirTopK]]: DSIR-style importance ranking (Xie et al. 2023,
  *    "Data Selection for Language Models via Importance Resampling") —
  *    documents scored by the log-likelihood ratio of a target domain
  *    vs the raw corpus under a hashed bag-of-ngrams model. The
  *    domain-targeted selection step between crawling and training.
  *  - [[unigramPpl]]: corpus-unigram-LM cross-entropy / perplexity per
  *    document — the CCNet-style LM quality signal (there the LM is
  *    wiki-trained KenLM; the unigram corpus LM is its engine-portable,
  *    oracle-exact analogue). High perplexity = lexically atypical
  *    (gibberish, wrong language, encoding damage).
  *
  * Scale posture (100 TB): both operators reduce the corpus to BOUNDED
  * statistics first (a `buckets`-sized feature census / a vocabulary
  * census), join those back in one pass over the exploded tokens, and
  * aggregate per document — one shuffle each side, map-side partials
  * everywhere, nothing driver-side. All hashing is md5-derived and all
  * scores round at fixed precision, so the DuckDB oracle reproduces
  * ranks exactly.
  */
object Selection {

  /** 48-bit md5-derived hash — the ONE portable spelling
    * ([[graft.functions.Canonical.hex48]]); every operator's oracle
    * parity depends on all call sites staying bit-identical.
    */
  private def h48(c: Column): Column =
    graft.functions.Canonical.hex48(md5(c))

  /** Hashed unigram+bigram feature ids for one document's token array:
    * every token and every adjacent pair hashes into `buckets` buckets.
    * Occurrences (not distinct features) — DSIR's bag model.
    */
  private def featureIds(toks: Column, buckets: Int): Column = {
    val unis = transform(toks, t => pmod(h48(t), lit(buckets.toLong)))
    val bis = when(size(toks) >= 2,
      transform(slice(toks, lit(1), size(toks) - 1),
        (t, i) => pmod(h48(concat(t, lit("_"), element_at(toks, i + 2))),
          lit(buckets.toLong))))
      .otherwise(array().cast("array<bigint>"))
    concat(unis, bis)
  }

  /** Top-`k` documents by DSIR importance weight to a target domain.
    *
    * weight(doc) = sum over feature occurrences f of
    *   ln((cnt_target(f)+1) / (tot_target+B)) -
    *   ln((cnt_raw(f)+1)    / (tot_raw+B))        (Laplace-smoothed)
    *
    * reported in integer micro-nats (round(w * 1e6)) so the cross-engine
    * rank order is bit-stable. The feature census is `buckets`-bounded
    * (default 256) — it broadcasts at ANY corpus size, which is the whole
    * point of DSIR's hashed projection.
    *
    * @param targetPred SQL predicate over `documents` rows defining the
    *                   target domain (e.g. "lang = 'en'")
    */
  /** (doc_id, w_nano, n_feats) — per-doc DSIR log-weight as the EXACT
    * long sum of occurrence-weighted nano-nat LLRs (see [[dsirTopK]]'s
    * determinism note). Shared by ranking and resampling.
    */
  private def dsirWeights(docs: DataFrame, targetPred: String,
                          buckets: Int): DataFrame = {
    val feats = graft.Tables.spread(docs)
      .select(col("doc_id"), expr(targetPred).as("__in_target"),
        explode(featureIds(split(col("text"), " "), buckets)).as("f"))
    // Per-doc feature HISTOGRAM first: one map-side-combining shuffle
    // collapses the corpus-token-sized explode to <= |docs| x buckets
    // rows; both the census and the weights derive from it — the raw
    // exploded relation never shuffles again.
    val hist = feats.groupBy("doc_id", "__in_target", "f")
      .agg(count(lit(1)).as("occ"))
    val census = hist.groupBy("f").agg(
      sum(col("occ")).as("cnt_raw"),
      sum(when(col("__in_target"), col("occ")).otherwise(0L)).as("cnt_tgt"))
    // Totals fold into the b-bounded census (no second corpus pass, no
    // 1-row crossJoin): window-free sums via a pmod-keyed self-aggregate.
    val totals = census.agg(
      sum(col("cnt_raw")).as("tot_raw"), sum(col("cnt_tgt")).as("tot_tgt"))
      .withColumn("__one", pmod(col("tot_raw"), lit(1L)))
    // Per-bucket LLR quantized to integer NANO-nats (one pair of ln calls
    // per bucket, 256 total): per-doc weights then sum LONGS — exact and
    // associative, so the result does not depend on shuffle merge order
    // (the double-sum form was deterministic only because the broadcast
    // join happened to preserve per-doc partitioning).
    val llr = census
      .withColumn("__one", pmod(col("f"), lit(1L)))
      .join(broadcast(totals), "__one").drop("__one")
      .withColumn("llr_nano", round((
        log((col("cnt_tgt") + 1).cast("double") /
          (col("tot_tgt") + buckets).cast("double")) -
          log((col("cnt_raw") + 1).cast("double") /
            (col("tot_raw") + buckets).cast("double"))) * lit(1e9))
        .cast(LongType))
      .select("f", "llr_nano")
    hist
      .join(broadcast(llr), "f")
      .groupBy("doc_id")
      .agg(sum(col("occ") * col("llr_nano")).as("w_nano"),
        sum(col("occ")).as("n_feats"))
  }

  def dsirTopK(docs: DataFrame, targetPred: String, buckets: Int = 256,
               k: Int = 50): DataFrame = {
    val weights = dsirWeights(docs, targetPred, buckets)
      .withColumn("weight_micro",
        round(col("w_nano").cast("double") / lit(1e3)).cast(LongType))
    // Distributed top-k FIRST (orderBy+limit plans as TakeOrdered — every
    // partition keeps its own k, the driver merges k*partitions rows), so
    // the corpus-sized weights relation never funnels through a global
    // single-partition window; the rank window then runs over k rows.
    val topK = weights
      .orderBy(col("weight_micro").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight_micro").desc, col("doc_id").asc)
    topK.withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "weight_micro", "n_feats")
  }

  /** DSIR importance RESAMPLING (the paper's actual selection step):
    * Gumbel-top-k over the log-weights — sampling k documents WITHOUT
    * replacement with probability proportional to importance — with the
    * Gumbel noise derived from the doc id's portable hash rather than a
    * RNG: u = (h48(doc_id)+0.5)/2^48, g = -ln(-ln(u)). Deterministic, so
    * the draw replays identically across runs/engines (no rand() in
    * plans — the engine-wide replayability rule) and the oracle can pin
    * the SAMPLE itself, not just its distribution. Same TakeOrdered
    * top-k shape as [[dsirTopK]].
    */
  def dsirSample(docs: DataFrame, targetPred: String, buckets: Int = 256,
                 k: Int = 50): DataFrame = {
    val u = (h48(col("doc_id").cast("string")).cast("double") + lit(0.5)) /
      lit(281474976710656.0) // 2^48
    val scored = dsirWeights(docs, targetPred, buckets)
      .withColumn("gumbel", -log(-log(u)))
      .withColumn("score_micro",
        round((col("w_nano").cast("double") / lit(1e9) + col("gumbel")) *
          lit(1e6)).cast(LongType))
    val topK = scored
      .orderBy(col("score_micro").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    topK.withColumn("draw", row_number().over(w))
      .select("draw", "doc_id", "score_micro", "n_feats")
  }

  /** Per-document cross-entropy (nats/token) and perplexity under the
    * corpus unigram LM: H(d) = -mean over token occurrences of
    * ln(cnt(t)/total), ppl = e^H. Every token is in-vocabulary by
    * construction (the LM is fit on the same corpus), so no OOV floor is
    * needed; a held-out LM would add one.
    *
    * The unigram census is vocabulary-sized: no broadcast hint on
    * purpose — locally AQE broadcasts it, at 100 TB (vocabulary in the
    * hundreds of millions) it shuffle-joins on the token, which is the
    * right plan at both scales.
    *
    * Determinism: the per-token log-probability quantizes to integer
    * NANO-nats ONCE, in the vocabulary census (one ln per distinct
    * token), and each document sums LONGS — an exact associative
    * aggregate, stable under any shuffle/merge order. A double sum here
    * would merge partials in shuffle-fetch arrival order, which varies
    * run to run once the census join shuffles — exactly the flakiness
    * the fixed-precision oracle contract cannot absorb.
    */
  def unigramPpl(docs: DataFrame): DataFrame = {
    val toks = graft.Tables.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val uni0 = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = uni0.agg(sum(col("cnt")).as("total"))
      .withColumn("__one", pmod(col("total"), lit(1L)))
    val uni = uni0
      .withColumn("__one", pmod(col("cnt"), lit(1L)))
      .join(broadcast(total), "__one").drop("__one")
      .withColumn("llp_nano",
        round(log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1e9)).cast(LongType))
      .select("tok", "llp_nano")
    val scored = toks
      .join(uni, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("llp_nano")).as("__s"))
      .withColumn("h",
        -(col("__s").cast("double") / (col("n_tokens").cast("double") * 1e9)))
    scored.select(col("doc_id"), col("n_tokens"),
      round(col("h"), 6).as("h_nats"),
      round(exp(col("h")), 6).as("ppl"))
  }

  /** Per-document cross-entropy and perplexity under an INTERPOLATED
    * corpus bigram LM — the sequential upgrade of [[unigramPpl]] (CCNet's
    * actual filter is a 5-gram KenLM; the interpolated bigram corpus LM
    * is its engine-portable, oracle-exact analogue one order up). A
    * document of common words in an uncommon ORDER now scores high where
    * the unigram signal is blind to ordering.
    *
    * Model: p(w2|w1) = λ·c(w1,w2)/c(w1,·) + (1−λ)·c(w2)/total with
    * λ = 0.8 (Jelinek–Mercer interpolation; the unigram back-off term
    * keeps every in-vocabulary continuation nonzero, so no OOV floor is
    * needed — both censuses are fit on the scored corpus itself).
    * H(d) = −mean over the document's adjacent pairs of ln p(w2|w1);
    * ppl = e^H. One-token documents have no pairs and drop out (the
    * oracle's empty range mirrors this).
    *
    * Scale posture (100 TB): the bigram census is vocabulary²-bounded
    * but corpus-sparse; like the unigram census it carries no broadcast
    * hint — locally AQE broadcasts it, at scale it shuffle-joins on the
    * pair key, the right plan at both scales. Pairs come from one
    * arrays_zip of two slices of the same split — no self-join, no
    * positional window, no second scan of the text.
    *
    * Determinism: identical contract to [[unigramPpl]] — ln quantizes to
    * integer nano-nats ONCE per DISTINCT pair (the census row), and each
    * document sums longs, exact under any shuffle order.
    */
  def bigramPpl(docs: DataFrame): DataFrame = {
    // Both interpolation weights are SPELLED literals (0.8 / 0.2), not
    // derived (1.0 - 0.8 is one ulp off the double nearest 0.2) — the
    // oracle writes the same two literals and must get the same bits.
    val lambda = 0.8
    val backoff = 0.2
    val base = graft.Tables.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val bi = base
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1))).as("z"))
      .select(col("doc_id"), col("z.0").as("w1"), col("z.1").as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val cu0 = base.select(explode(col("w")).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("cu"))
    val total = cu0.agg(sum(col("cu")).as("tt"))
      .withColumn("__one", pmod(col("tt"), lit(1L)))
    val probs = c2.join(c1, "w1").join(cu0, "w2")
      .withColumn("__one", pmod(col("c2"), lit(1L)))
      .join(broadcast(total), "__one").drop("__one")
      .withColumn("llp_nano",
        round(log(lit(lambda) * (col("c2").cast("double") / col("c1")) +
          lit(backoff) * (col("cu").cast("double") / col("tt")))
          * lit(1e9)).cast(LongType))
      .select("w1", "w2", "llp_nano")
    bi.join(probs, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("llp_nano")).as("__s"))
      .withColumn("h",
        -(col("__s").cast("double") / (col("n_bigrams").cast("double") * 1e9)))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("h"), 6).as("h_nats"),
        round(exp(col("h")), 6).as("ppl"))
  }

  /** Per-source KL divergence of the token distribution against the
    * whole corpus — KL(P_source ‖ P_corpus) in nats — the lexical
    * drift/mix gauge over the `source` dimension (which crawl snapshots
    * or ingest feeds are lexically atypical; the signal DoReMi-style
    * mixture re-weighting and CCNet's per-domain filtering read). KL is
    * well-defined with no smoothing: every source token is in the corpus
    * census by construction (P_corpus has full support over P_source).
    *
    * Per source: token count, distinct-token count, and kl_nats. Also
    * emits `top_tok` — the argmax contributing token (ties to the
    * lexicographically smallest) — so a drifted source is directly
    * attributable, not just flagged.
    *
    * Scale posture (100 TB): two censuses (source×token and token), one
    * shuffle-join on the token key (no broadcast hint — AQE broadcasts
    * locally, shuffle-joins at scale), exact long sums per source.
    * Determinism: each (source, token) term quantizes to integer
    * nano-nats ONCE in the joined census; the per-source sum is an exact
    * long aggregate; the argmax is a row_number window over the census
    * with the (term_nano desc, tok asc) total order made explicit.
    */
  def sourceTokenKl(docs: DataFrame): DataFrame = {
    val toks = graft.Tables.spread(docs)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val cs = toks.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val totS = cs.groupBy("source").agg(sum(col("cs")).as("tots"))
    val cc = cs.groupBy("tok").agg(sum(col("cs")).as("cc"))
    val tt = totS.agg(sum(col("tots")).as("tt"))
      .withColumn("__one", pmod(col("tt"), lit(1L)))
    val terms = cs.join(totS, "source").join(cc, "tok")
      .withColumn("__one", pmod(col("cs"), lit(1L)))
      .join(broadcast(tt), "__one").drop("__one")
      .withColumn("term_nano",
        round((col("cs").cast("double") / col("tots")) *
          log((col("cs").cast("double") / col("tots")) /
            (col("cc").cast("double") / col("tt"))) * lit(1e9))
          .cast(LongType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("term_nano").desc, col("tok").asc)
    val top = terms
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("source"), col("tok").as("top_tok"))
    terms.groupBy("source")
      .agg(max(col("tots")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("term_nano")).as("__kl"))
      .join(top, "source")
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        round(col("__kl").cast("double") / lit(1e9), 6).as("kl_nats"),
        col("top_tok"))
      .orderBy("source")
  }

  /** Per-source dataset card — the corpus-documentation rollup a
    * datasheet/dataset-card pipeline emits per ingest feed: document
    * and character volume, integer mean length, language spread
    * (distinct count + the dominant language and its permille share,
    * ties to the lexicographically smallest). Pure exact-integer
    * aggregates plus one source-partitioned window over the
    * (source, lang) census — bounded by sources×languages, never by
    * the corpus.
    */
  def sourceProfile(docs: DataFrame): DataFrame = {
    val base = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("mean_chars", expr("n_chars div n_docs"))
    val sl = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c").desc, col("lang").asc)
    val top = sl.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c").as("__tc"))
    base.join(top, "source")
      .select(col("source"), col("n_docs"), col("n_chars"), col("mean_chars"),
        col("n_langs"), col("top_lang"),
        expr("__tc * 1000 div n_docs").as("top_lang_permille"))
      .orderBy("source")
  }

  /** Within-document token entropy and type-token ratio — the
    * repetitiveness quality pair: H = −Σ (c/n)·ln(c/n) over the doc's
    * own token distribution (a looping/boilerplate doc collapses toward
    * 0 even when every token is corpus-common, which the corpus-LM
    * perplexities cannot see), and TTR = distinct/total in permille
    * (the classic lexical-diversity score). Purely per-document: one
    * (doc, token) census, no corpus-global state at all — embarrassing
    * parallelism at any scale.
    *
    * Determinism: each (doc, token) entropy term quantizes to integer
    * nano-nats once; documents sum exact longs; TTR is integer
    * division.
    */
  def docTokenEntropy(docs: DataFrame): DataFrame = {
    val toks = graft.Tables.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val ct = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val n = ct.groupBy("doc_id").agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_distinct"))
    ct.join(n, "doc_id")
      .withColumn("term_nano",
        round((col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("n")) * lit(1e9)).cast(LongType))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_tokens"), max(col("n_distinct")).as("n_distinct"),
        sum(col("term_nano")).as("__h"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(-(col("__h").cast("double") / lit(1e9)), 6).as("h_nats"),
        expr("n_distinct * 1000 div n_tokens").as("ttr_permille"))
      .orderBy("doc_id")
  }

  /** Per-document trigram NOVELTY against everything ingested before it
    * (doc-id order): the fraction of the document's distinct 3-grams
    * whose corpus-wide FIRST occurrence is this document. The
    * incremental-content gauge — a crawl re-fetch or template page
    * scores ~0 even when fuzzy dedup missed it, and the per-doc face
    * complements the corpus-level [[vocabGrowth]] curve. One distinct
    * (doc, trigram) relation, one trigram-keyed min census, one join
    * back — all counts exact.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val tri = graft.Tables.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w) - 2),
          |  i -> concat_ws('_', w[i - 1], w[i], w[i + 1]))""".stripMargin))
        .as("g"))
      .distinct()
    val first = tri.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    tri.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000 div n_grams").as("novelty_permille"))
      .orderBy("doc_id")
  }

  /** Zipf power-law gauge: OLS slope (and fit quality) of the
    * rank-frequency census in log-log space over the top `topR` ranks —
    * natural text sits near slope −1 with a tight fit; a corpus whose
    * slope or r² drifts (template spam flattens it, deduplication
    * residue steepens it) is flagged by ONE number per snapshot.
    *
    * Scale posture: the census is vocabulary-sized; the top-`topR`
    * selection is a TakeOrdered (never a global sort), and the window
    * that assigns ranks runs over `topR` rows only. Determinism: each
    * point's (ln rank, ln cnt) quantizes to integer MICRO once, the
    * OLS sums are exact longs (ln cnt ≤ ~30 even at 10¹² tokens ⇒
    * y ≤ 3e7 micro, n·Σy² ≤ topR²·9e14 — long-safe for topR ≤ 100),
    * and slope/r² are single double expressions over those longs. A
    * zero y-variance census (all top counts equal) yields NULL r²
    * rather than a cross-engine infinity.
    */
  def zipfSlope(docs: DataFrame, topR: Int = 100): DataFrame = {
    require(topR >= 3 && topR <= 100, s"zipfSlope: topR=$topR")
    val census = graft.Tables.spread(docs)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val top = census.orderBy(col("cnt").desc, col("tok")).limit(topR)
    val W = org.apache.spark.sql.expressions.Window
    val pts = top
      .withColumn("rnk", row_number().over(
        W.orderBy(col("cnt").desc, col("tok"))))
      .select(
        round(log(col("rnk").cast("double")) * lit(1e6)).cast("long").as("x"),
        round(log(col("cnt").cast("double")) * lit(1e6)).cast("long").as("y"))
    pts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"))
      .select(col("n"),
        round(col("num").cast("double") * lit(1000) / col("denx"))
          .cast("long").as("slope_milli"),
        when(col("deny") === 0, lit(null).cast("long"))
          .otherwise(round(col("num").cast("double") * col("num") * lit(1000)
            / (col("denx").cast("double") * col("deny"))).cast("long"))
          .as("r2_permille"))
  }

  /** Heaps'-law vocabulary-growth curve: the corpus in `buckets`
    * doc-id-ordered increments, and per increment the cumulative token
    * count, the NEW distinct types it contributes (types whose first
    * occurrence lands in it), and the cumulative vocabulary — the
    * "what does the next data increment buy" gauge for dataset-growth
    * planning (Heaps/Herdan: V(n) ~ K·nᵝ; a flattening curve means
    * more data adds occurrences, not coverage).
    *
    * Scale posture: one token census keyed by token (min-bucket +
    * count — vocabulary-sized, one shuffle), one buckets-sized window
    * for the cumulative sums. Everything is exact integer counts; the
    * bucket rule `least(buckets-1, id·buckets div (max+1))` is integer
    * arithmetic off the 1-row max, broadcast via the pmod-one key.
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"vocabGrowth: buckets=$buckets")
    val mx = docs.agg(max(col("doc_id")).as("mx"))
      .withColumn("__one", pmod(col("mx"), lit(1L)))
    val toks = graft.Tables.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("__one", pmod(col("doc_id"), lit(1L)))
      .join(broadcast(mx), "__one").drop("__one")
      .withColumn("bucket",
        least(lit(buckets - 1),
          expr(s"doc_id * $buckets div (mx + 1)")).cast("int"))
    val occ = toks.groupBy("bucket").agg(count(lit(1)).as("n_occ"))
    val types = toks.groupBy("tok").agg(min(col("bucket")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_types_new"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    occ.join(types, Seq("bucket"), "left")
      .withColumn("n_types_new", coalesce(col("n_types_new"), lit(0L)))
      .withColumn("n_tokens_cum", sum(col("n_occ")).over(w))
      .withColumn("n_types_cum", sum(col("n_types_new")).over(w))
      .select("bucket", "n_occ", "n_tokens_cum", "n_types_new", "n_types_cum")
      .orderBy("bucket")
  }
}
