package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus lexicon induction — the vocabulary-building passes a training-data
  * pipeline runs before tokenizer and retrieval decisions (north-star
  * extension, SURVEY.md §7.1 module 11):
  *
  *   - [[pmiTopK]]        PMI collocation mining (multi-word-expression
  *                        discovery for tokenizer pre-merges)
  *   - [[bpePairs]]       the BPE vocabulary-induction inner step: the
  *                        adjacent-symbol pair census whose argmax is the
  *                        next merge rule
  *   - [[invertedIndex]]  capped posting lists — the retrieval index shape
  *                        behind BM25 / contamination lookups
  *
  * All scores are exact integers (micro-units / counts), so the DuckDB
  * oracle hash-matches bit for bit — no IEEE log/exp in any output column.
  */
object Lexicon {

  /** Adjacent-token PMI collocations in integer micro-units:
    *
    *   pmi_micro = pair_cnt * n_tokens * 1e6  div  (cnt_a * cnt_b)
    *
    * — the monotone rational core of pointwise mutual information
    * (log dropped: log is monotone, so ranking by the ratio IS ranking by
    * PMI, and the integer form keeps the oracle exact).
    *
    * Scale posture: the explode carries bare token pairs (text never rides
    * a shuffle); the pair census aggregates with map-side partials and is
    * then vocabulary²-bounded, so both unigram joins broadcast (the unigram
    * relation is vocabulary-sized) and the rank window runs over ≤ the
    * minPair-filtered pair census, not the corpus. The cross-term product
    * `pair_cnt * n_tokens * 1e6` is computed in DECIMAL(38,0) (exact to
    * 1e38 — safe past any physical corpus) because int64 wraps silently
    * past ~1e12 tokens with ANSI off; only the final integral ratio is
    * downcast to BIGINT, which both engines agree on bit for bit.
    */
  def pmiTopK(docs: DataFrame, minPair: Long = 5L, k: Int = 50): DataFrame = {
    val toks = docs.select(split(col("text"), " ").as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = uni.agg(sum(col("cnt")).as("n_tokens"))
    val pairs = toks
      .filter(size(col("__toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__toks) - 1), i -> struct(" +
          "element_at(__toks, i) AS a, element_at(__toks, i + 1) AS b))")).as("p"))
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPair)
    // Single-row corpus total joins on a data-derived constant key
    // (pmod(x,1)=0) — same device as tf-idf's n_docs attach: a crossJoin
    // (or pure-literal key) constant-folds to BroadcastNestedLoopJoin,
    // which the engine-wide plan audit forbids; the pmod key keeps it a
    // codegen'd broadcast hash join.
    val totKeyed = tot.withColumn("__one", pmod(col("n_tokens"), lit(1L)))
    val scored = pairs
      .join(broadcast(uni.select(col("tok").as("tok_a"), col("cnt").as("cnt_a"))), "tok_a")
      .join(broadcast(uni.select(col("tok").as("tok_b"), col("cnt").as("cnt_b"))), "tok_b")
      .withColumn("__one", pmod(col("pair_cnt"), lit(1L)))
      .join(broadcast(totKeyed), "__one").drop("__one")
      // The cross-term product is computed in DECIMAL(38,0): in int64 it
      // wraps silently past ~1e12 corpus tokens (ANSI off) while the SQL
      // oracle would error — a silent engine divergence at exactly the
      // scale this module advertises. The final integral ratio is back in
      // pmi_micro's bigint range by construction (pmi <= 1e6 * n_tokens /
      // max(cnt_a, cnt_b) and the ratio's magnitude is bounded by the
      // corpus, not the product).
      .withColumn("pmi_micro",
        // the DIVISOR widens too: cnt_a * cnt_b in int64 wraps once both
        // counts pass ~3e9 (any stopword pair at a ~1e12-token corpus)
        expr("CAST((CAST(pair_cnt AS DECIMAL(38,0)) * n_tokens * 1000000)" +
          " div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b) AS BIGINT)"))
    // distributed top-k first (TakeOrdered) — the scored pair census is
    // vocabulary²-bounded but still far too wide for one window partition
    // at scale; the rank window then numbers k rows
    val w = Window.orderBy(col("pmi_micro").desc, col("tok_a"), col("tok_b"))
    scored.orderBy(col("pmi_micro").desc, col("tok_a"), col("tok_b")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "tok_a", "tok_b", "pair_cnt", "cnt_a", "cnt_b", "pmi_micro")
  }

  /** BPE merge-pair census (the inner loop of byte-pair-encoding vocabulary
    * induction): count every adjacent 2-character window inside every word,
    * weighted by word frequency; the top pair is the next merge rule.
    *
    * Scale posture: the word census collapses the corpus to its vocabulary
    * FIRST (one map-side-combining aggregation over bare words), so the
    * character-pair explode runs over the vocabulary — at 100 TB that is
    * millions of rows, not trillions. The rank window therefore sorts a
    * relation bounded by (distinct 2-grams of the alphabet), which is tiny.
    */
  def bpePairs(docs: DataFrame, k: Int = 50): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val pairs = words
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("pair_count"))
    val w = Window.orderBy(col("pair_count").desc, col("pair"))
    pairs.orderBy(col("pair_count").desc, col("pair")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "pair", "pair_count")
  }

  /** Capped inverted index: token → document frequency + the first `cap`
    * posting doc_ids (ascending, comma-joined) — the index relation a
    * BM25 / contamination-lookup service would serve.
    *
    * Scale posture: postings are truncated BEFORE aggregation by a
    * per-token row_number window (never an unbounded collect_list), so the
    * reduced row for a stopword-grade token holds ≤ cap ids no matter the
    * corpus size. The window's per-token skew (a token in every document
    * sorts its full posting run) is the honest cost of exact smallest-k
    * postings; the production escape hatch is bucketing doc_ids and keeping
    * only the first non-empty bucket, which bounds the sort without
    * changing the emitted ids.
    */
  def invertedIndex(docs: DataFrame, cap: Int = 20): DataFrame = {
    val td = docs
      .select(explode(split(col("text"), " ")).as("token"), col("doc_id"))
      .distinct()
    val freq = td.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val w = Window.partitionBy("token").orderBy("doc_id")
    val heads = td.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .groupBy("token")
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
    freq.join(heads, "token")
      .select(col("token"), col("doc_freq"),
        least(col("doc_freq"), lit(cap.toLong)).as("postings_len"),
        col("postings"))
  }

  /** BPE MERGE TRAINING — the iterated loop [[bpePairs]] is one step of:
    * per round, learn the highest-weighted adjacent symbol pair over the
    * word vocabulary and APPLY the merge to every word's symbol list,
    * so later rounds see merged symbols ("t","h" → "th" → "th","e" →
    * "the"). Output, one row per round: the learned (left_sym,
    * right_sym), its weighted count, and the corpus symbol count after
    * applying it — the compression curve a tokenizer-induction run
    * reports.
    *
    * Merge semantics are real BPE: ANY adjacent pair including the
    * homogeneous (x,x) case, applied LEFT-TO-RIGHT NON-OVERLAPPING
    * ("aaaa" merges twice into "aa","aa"; "aaa" once into "aa","a").
    * Heterogeneous pairs stay the plain stateless per-position splice
    * (no position can be both merge start and continuation when
    * l ≠ r). Homogeneous pairs become stateless through RUN PARITY:
    * inside a maximal run of x ending at position i, the run-prefix
    * length r(i) = i − max{j ≤ i : syms[j] ≠ x} decides the role —
    * odd r(i) is a merge START (pairs with i+1 if still x), even r(i)
    * is the consumed second slot — exactly the sequential left-to-right
    * rule, evaluated independently per position (VERDICT r11 #6). The
    * PAIR CENSUS counts only the mergeable (non-overlapping)
    * occurrences under the same parity rule, so the reported
    * pair_count equals the number of merges the round applies and the
    * argmax ranks homogeneous candidates fairly. r(i) is an O(len)
    * fold per position (O(len²) per word) — bounded by word length on
    * the vocabulary-sized relation, identical in the DuckDB mirror.
    *
    * Scale posture: the loop runs over the VOCABULARY relation (corpus
    * collapses to distinct words first — bpePairs' posture), each round
    * is one aggregation for the top pair (a bounded ONE-ROW collect,
    * the codebook contract) + one HOF rewrite projection, with
    * localCheckpoint bounding lineage per round (the components()
    * cadence). `rounds` is driver-bounded; at 100 TB the vocabulary is
    * millions of rows and each round is seconds.
    */
  def bpeTrainMerges(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val (out, _) = bpeTrainLoop(docs, rounds)
    import spark.implicits._
    out.toDF("step", "left_sym", "right_sym", "pair_count", "symbols_after")
  }

  /** The trained VOCABULARY face: segment the corpus with the merges
    * [[bpeTrainMerges]] learns and rank the resulting symbol census —
    * what the corpus tokenizes into AFTER induction (merged symbols
    * outrank their constituent characters exactly where the merges paid
    * off). Same loop, same bounded collects; output (rank, symbol,
    * weighted_count) top-`k` by (count DESC, symbol).
    */
  def bpeVocab(docs: DataFrame, rounds: Int = 3, k: Int = 50): DataFrame = {
    val (_, syms) = bpeTrainLoop(docs, rounds)
    val census = syms
      .select(col("freq"), explode(col("syms")).as("symbol"))
      .groupBy("symbol").agg(sum("freq").as("weighted_count"))
    val w = Window.orderBy(col("weighted_count").desc, col("symbol"))
    census.orderBy(col("weighted_count").desc, col("symbol")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "symbol", "weighted_count")
  }

  /** Tokenizer EVAL face: per-language fertility of the trained
    * tokenizer — tokens/char (`fertility_micro`) and tokens/word
    * (`tpw_micro`) in exact integer micro-units, over the ≥2-char word
    * census the trainer itself tokenizes. THE standard gauge for
    * whether a tokenizer trained on a mixed corpus taxes some language
    * disproportionately (a language whose fertility sits above the
    * corpus mean pays more sequence length per character of text).
    *
    * Scale posture: segmentation cost rides the DISTINCT-word census
    * exactly once ([[bpeApply]] — vocabulary-sized, not corpus-sized);
    * the per-(lang, word) weights join back on the word key and reduce
    * to one row per language. Both ratios are integer division over
    * exact long sums — no doubles anywhere.
    */
  def fertilityByLang(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val merges = bpeTrainMerges(docs, rounds)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = bpeApply(docs, merges).select(col("word"), col("n_syms"))
    val lw = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("lang", "word").agg(count(lit(1)).as("freql"))
    lw.join(seg, "word")
      .groupBy("lang")
      .agg(sum(col("freql")).as("n_words"),
        sum(col("freql") * length(col("word"))).as("n_chars"),
        sum(col("freql") * col("n_syms")).as("n_syms"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_syms"),
        expr("n_syms * 1000000 div n_chars").as("fertility_micro"),
        expr("n_syms * 1000000 div n_words").as("tpw_micro"))
      .orderBy("lang")
  }

  /** The per-position merge splice for pair (l, r) over the `syms`
    * array column — ONE definition shared by the training loop and the
    * frozen-merge [[bpeApply]] replay (scaladoc rule: plain stateless
    * splice for l ≠ r, run-parity-gated for l = r).
    */
  private def spliceCol(l: String, r: String): Column = {
    val (lL, lR, lLR) = (lit(l), lit(r), lit(l + r))
    val spliced =
      if (l != r)
        // heterogeneous: plain stateless splice (no chain possible)
        transform(sequence(lit(1), size(col("syms"))), i =>
          when(i < size(col("syms")) &&
              element_at(col("syms"), i) === lL &&
              element_at(col("syms"), i + lit(1)) === lR, lLR)
            .when(i > lit(1) &&
              element_at(col("syms"), i - lit(1)) === lL &&
              element_at(col("syms"), i) === lR,
              lit(null).cast("string"))
            .otherwise(element_at(col("syms"), i)))
      else
        // homogeneous: run parity decides merge-start (odd) vs
        // consumed (even); odd-parity run tails fall through as
        // singles (scaladoc rule)
        transform(sequence(lit(1), size(col("syms"))), i => {
          val runpar = pmod(
            i - coalesce(array_max(filter(sequence(lit(1), i),
              j => element_at(col("syms"), j) =!= lL)), lit(0)),
            lit(2))
          when(element_at(col("syms"), i) === lL &&
              i < size(col("syms")) &&
              element_at(col("syms"), i + lit(1)) === lL &&
              runpar === lit(1), lLR)
            .when(element_at(col("syms"), i) === lL &&
              runpar === lit(0), lit(null).cast("string"))
            .otherwise(element_at(col("syms"), i))
        })
    filter(spliced, x => x.isNotNull)
  }

  /** Tokenizer APPLY face: segment a corpus against a FROZEN ordered
    * merge list — the ingest/inference twin of
    * [[ProductQuant.encodeWithBook]]: merges train ONCE on standing
    * data ([[bpeTrainMerges]]) and every new batch segments
    * independently, with no re-training and no rescan of standing
    * data. Each merge replays the exact train-time splice (including
    * the homogeneous run-parity rule), so applying the trained merges
    * to the training corpus itself reproduces the trainer's final
    * symbol relation bit for bit. Output, one row per distinct word:
    * (word, freq, segmented, n_syms).
    */
  def bpeApply(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    require(merges.lengthCompare(16) <= 0, "driver-bounded merge list")
    var words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"))
      .localCheckpoint()
    merges.foreach { case (l, r) =>
      // checkpoint per merge, as in the trainer: chained splices nest
      // the prior round's HOF tree multiple times per reference and
      // would grow the expression multiplicatively
      words = words.withColumn("syms", spliceCol(l, r)).localCheckpoint()
    }
    words.select(col("word"), col("freq"),
      array_join(col("syms"), " ").as("segmented"),
      size(col("syms")).cast("long").as("n_syms"))
  }

  /** Shared learn/apply loop: per-round merges (step, l, r, count,
    * symbols_after) plus the FINAL (freq, syms) vocabulary relation.
    */
  private def bpeTrainLoop(docs: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, Long, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 16, "driver-bounded merge loop")
    var syms = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"))
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, Long, Long)]
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      // census of MERGEABLE adjacent pairs: heterogeneous positions
      // always count; homogeneous positions count only at odd run
      // parity (the left-to-right non-overlapping rule — a run of L
      // x's contributes floor(L/2) to (x,x)), so pair_count == the
      // merges the round would apply and homogeneous candidates rank
      // fairly in the argmax
      val topRows = syms.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "filter(transform(sequence(1, size(syms) - 1), i -> named_struct(" +
            "'l', element_at(syms, i), 'r', element_at(syms, i + 1), " +
            "'ok', element_at(syms, i) != element_at(syms, i + 1) OR " +
            "pmod(i - coalesce(array_max(filter(sequence(1, i), " +
            "j -> element_at(syms, j) != element_at(syms, i))), 0), 2) = 1" +
            ")), p -> p.ok)")).as("p"))
        .select(col("freq"), col("p.l").as("l"), col("p.r").as("r"))
        .groupBy("l", "r").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      // the census can run dry on small vocabularies (every word fully
      // merged to one symbol) — stop with the merges learned so far
      // instead of erroring mid-loop
      if (topRows.isEmpty) exhausted = true
      else {
        val top = topRows(0)
        val (l, r, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
        syms = syms.withColumn("syms", spliceCol(l, r))
          .localCheckpoint()
        val after = syms
          .agg(sum(size(col("syms")).cast("long") * col("freq")).as("a"))
          .collect()(0).getLong(0)
        out += ((step, l, r, cnt, after))
        step += 1
      }
    }
    (out.result(), syms)
  }
}
