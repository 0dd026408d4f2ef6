package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for the large-scale training-data pipeline
  * (north-star extension; SURVEY.md §7.1 module 11). All operators here are
  * NARROW per-row column transforms — no shuffle, no UDFs, whole-stage
  * codegen'd — so they stream over a 100 TB corpus at scan speed and
  * compose freely with the dedup/diff operators.
  *
  * Every derived value is engine-portable (plain string/arithmetic ops +
  * md5) so the DuckDB oracle reproduces it bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens of a single-space-normalized text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Small per-language stopword inventories for the language-ID
    * heuristic. N-gram-frequency language ID degenerates to stopword
    * hit-rate scoring at this vocabulary size; lists are deliberately tiny
    * and deterministic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "un"),
    "es" -> Seq("el", "la", "los", "y", "un"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Per-document shape/quality statistics: token count, char count,
    * average token length, stopword ratio, alphabetic-token ratio, and a
    * bounded composite quality score. One narrow projection.
    */
  def stats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks).cast(LongType)
    val stopHits = hitCount(toks, stopwords("en")).cast(LongType)
    val alphaToks = size(filter(toks, t => t.rlike("^[a-z]+$"))).cast(LongType)
    val tokLenSum = aggregate(
      transform(toks, t => length(t).cast(LongType)), lit(0L), (acc, v) => acc + v)
    docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      length(col("text")).cast(LongType).as("text_chars"),
      round(tokLenSum.cast("double") / n, 6).as("avg_token_len"),
      round(stopHits.cast("double") / n, 6).as("stopword_ratio"),
      round(alphaToks.cast("double") / n, 6).as("alpha_ratio"),
      // Composite score: length saturation x (base + stopword evidence),
      // bounded to [0, 1]; mirrors the published length/stopword-ratio
      // quality-filter heuristics used by LLM data pipelines.
      round(
        least(n.cast("double") / 100d, lit(1d)) *
          (lit(0.5) + lit(0.5) * (stopHits.cast("double") / n)), 6)
        .as("quality"))
  }

  /** Stopword-hit language ID: score each candidate language by stopword
    * hits; guess = argmax, 'und' when nothing hits. Ties resolve to the
    * alphabetically first language code (explicit CASE chain — trivially
    * portable to the SQL oracle).
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val codes = stopwords.keys.toSeq.sorted
    val hits = codes.map(c => c -> hitCount(toks, stopwords(c)).cast(LongType)).toMap
    val maxHits = greatest(codes.map(hits): _*)
    val guess = codes.foldRight(lit("und")) { (c, els) =>
      when(maxHits > 0 && hits(c) === maxHits, lit(c)).otherwise(els)
    }
    docs.select(
      col("doc_id"),
      col("lang").as("lang_declared"),
      guess.as("lang_guess"),
      maxHits.as("hits"))
  }

  /** Token counting for pipeline budgeting (north-star "token counting"):
    * whitespace tokens, a BPE-ish pre-tokenizer count (letter runs, digit
    * runs, single punctuation marks — the GPT-2 pre-tokenizer shape
    * reduced to an engine-portable character-class regex), and the
    * classic chars/4 estimate (integer arithmetic, so the oracle needs no
    * float ceil). One narrow codegen'd projection.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast(LongType)
        .as("bpe_tokens"),
      expr("(length(text) + 3) div 4").cast(LongType).as("est_tokens"))
  }

  /** Corpus vocabulary: per-token total occurrences and document
    * frequency over the BPE-ish segmentation, top `k` by occurrence count
    * (token tie-break) — the vocabulary-building pass a tokenizer
    * training run makes over the corpus.
    *
    * Scale posture: the explode emits only narrow (token, doc_id) pairs
    * (text never rides the shuffle), the count aggregates with map-side
    * partials, and the top-k is a TakeOrderedAndProject — no full sort of
    * the vocabulary. Document frequency is an exact distinct count; at
    * 100 TB swap in approx_count_distinct if ±1% is acceptable (kept
    * exact here for the oracle contract).
    */
  def vocab(docs: DataFrame, k: Int = 100): DataFrame = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(pat), lit(0))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(k)
  }

  /** Deterministic train/val/test assignment: the document's 48-bit
    * md5-derived id hash mod 1000 picks a permille bucket, and the bucket
    * maps to a split by the requested proportions. Hash-based (never
    * random) so the split is stable across runs, machines, and corpus
    * growth — adding documents never moves an existing one between
    * splits, the property training pipelines need for eval hygiene.
    * Narrow projection; engine-portable md5 arithmetic.
    */
  def splitAssign(docs: DataFrame, valPermille: Int = 50,
                  testPermille: Int = 50): DataFrame = {
    require(valPermille + testPermille < 1000, "val+test must leave room for train")
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast(LongType), lit(1000L))
    docs.select(col("doc_id"), bucket.as("bucket"),
      when(bucket < testPermille, "test")
        .when(bucket < testPermille + valPermille, "val")
        .otherwise("train").as("split"))
  }

  /** Training-shard packing: documents are packed in deterministic order
    * (doc_id) into shards of ~`budgetTokens` estimated tokens, per
    * `groupCol` partition — the shard-assembly step between a cleaned
    * corpus and a training run. A document lands in the shard its LAST
    * token falls into: shard_id = (running_total - 1) / budget, so shard
    * boundaries are reproducible from the data alone.
    *
    * Scale posture: packing is inherently sequential WITHIN a shard
    * stream, so the operator parallelizes across the `groupCol`
    * partitions (one window per group — language here; a 100 TB run uses
    * (split, hash-macro-bucket) as the group to bound any one group's
    * stream) and never sorts globally.
    */
  def packShards(docs: DataFrame, budgetTokens: Long,
                 groupCol: String = "lang"): DataFrame =
    packed(docs, budgetTokens, groupCol, keepText = false)

  private def packed(docs: DataFrame, budgetTokens: Long, groupCol: String,
                     keepText: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = expr("(length(text) + 3) div 4").cast(LongType)
    val w = Window.partitionBy(groupCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = if (keepText)
      docs.select(col("doc_id"), col(groupCol), col("text"), est.as("est_tokens"))
    else docs.select(col("doc_id"), col(groupCol), est.as("est_tokens"))
    base
      .withColumn("__cum", sum(col("est_tokens")).over(w))
      .withColumn("shard_id", expr(s"(__cum - 1) div $budgetTokens"))
      .drop("__cum")
  }

  /** Shard assembly on top of [[packShards]]: the per-shard training
    * payload — documents concatenated in doc_id order with newline
    * separators — plus shard size stats. The payload is emitted as its
    * md5 (the artifact a writer would checksum) so result rows stay
    * narrow; a real run writes the payload column itself, partitioned by
    * (group, shard).
    *
    * Scale posture: the per-shard collect_list is bounded by the token
    * budget by construction (a shard holds ~budget tokens of text, never
    * the corpus), and the grouping reuses the pack window's group-key
    * exchange — one shuffle end to end.
    */
  def assembleShards(docs: DataFrame, budgetTokens: Long,
                     groupCol: String = "lang"): DataFrame =
    packed(docs, budgetTokens, groupCol, keepText = true)
      .groupBy(col(groupCol), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("est_tokens")).as("shard_tokens"),
        md5(concat_ws("\n",
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s.getField("text")))).as("payload_md5"))

  /** Token-level sequence packing — the real LLM-pretraining packer:
    * documents stream in deterministic (doc_id) order into fixed
    * `seqTokens`-wide training sequences, and a document whose tokens
    * straddle a boundary is SPLIT across sequences (unlike
    * [[packShards]], which places whole documents). Emits one span row
    * per (sequence, document) overlap: the doc's [tok_start, tok_end)
    * token slice that lands in that sequence. All-integer arithmetic
    * from one prefix sum: a doc covering cumulative tokens
    * [cum_before, cum_before+est) overlaps sequences
    * cum_before/W .. (cum_before+est-1)/W.
    *
    * Scale posture: one window per `groupCol` partition (same contract
    * as [[packShards]]: a 100 TB run groups by (split, macro-bucket) to
    * bound any one stream), then a narrow explode of span rows — the
    * text never moves; a writer joins spans back to content by doc_id.
    */
  def packSequences(docs: DataFrame, seqTokens: Long = 512L,
                    groupCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqTokens >= 1, "sequence width must be positive")
    val est = expr("(length(text) + 3) div 4").cast(LongType)
    val w = Window.partitionBy(groupCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col(groupCol), est.as("est_tokens"))
      .withColumn("cum_before", coalesce(sum(col("est_tokens")).over(w), lit(0L)))
      .select(col(groupCol), col("doc_id"), col("est_tokens"), col("cum_before"),
        explode(sequence(
          expr(s"cum_before div $seqTokens"),
          expr(s"(cum_before + est_tokens - 1) div $seqTokens"))).as("seq_id"))
      .select(col(groupCol), col("seq_id"), col("doc_id"),
        greatest(lit(0L), col("seq_id") * seqTokens - col("cum_before"))
          .as("tok_start"),
        least(col("est_tokens"), (col("seq_id") + 1) * seqTokens - col("cum_before"))
          .as("tok_end"))
      .withColumn("n_toks", col("tok_end") - col("tok_start"))
  }

  /** Tokenizer-vocabulary coverage: per document, the fraction of BPE-ish
    * tokens OUTSIDE the corpus top-`k` vocabulary ([[vocab]]) — the
    * out-of-vocabulary audit run before committing to a tokenizer. The
    * vocabulary is top-k-bounded, so it broadcasts at any corpus size;
    * the token explode carries only (doc_id, token).
    */
  def vocabCoverage(docs: DataFrame, k: Int = 100): DataFrame = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    val v = vocab(docs, k).select(col("token")).withColumn("__in", lit(1))
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(pat), lit(0))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bpe"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov"))
      .withColumn("oov_rate", round(col("oov").cast("double") / col("n_bpe"), 6))
  }

  /** Length-decile assignment (curriculum/binning pass): rank documents
    * by token count (doc_id tiebreak — fully deterministic) into 10
    * equal-depth bins.
    *
    * EXACT ntile without the global window: a naive
    * `ntile(10) OVER (ORDER BY ...)` funnels the whole corpus through one
    * WindowExec partition. Instead the global rank decomposes as
    *   rank(doc) = cum_before(n_tokens) + rn_within(n_tokens, doc_id)
    * where cum_before is a running sum over the DISTINCT-LENGTH census (a
    * bounded relation — thousands of distinct lengths, not corpus rows)
    * and rn_within is a row_number partitioned BY length (bounded, well-
    * spread partitions). The decile then follows from rank with Spark's
    * NTile distribution rule (first n%10 buckets take one extra row) —
    * bit-identical to the window form, which the unchanged DuckDB ntile
    * oracle proves.
    */
  def lengthDeciles(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tokens"))
    val census = lens.groupBy("n_tokens").agg(count(lit(1)).as("__cnt"))
    val wLen = Window.orderBy("n_tokens")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = census.select(col("n_tokens"),
      coalesce(sum(col("__cnt")).over(wLen), lit(0L)).as("__cum_before"))
    val totals = census.agg(sum(col("__cnt")).as("__n"))
      .withColumn("__one", pmod(col("__n"), lit(1L)))
    val wIn = Window.partitionBy("n_tokens").orderBy("doc_id")
    lens
      .withColumn("__rn", row_number().over(wIn).cast(LongType))
      .join(cum, "n_tokens")
      .withColumn("__one", pmod(col("__rn"), lit(1L)))
      .join(broadcast(totals), "__one")
      .withColumn("__rank", col("__cum_before") + col("__rn"))
      .withColumn("decile", expr(
        // Spark NTile rule: base = n div 10, rem = n % 10; the first rem
        // buckets hold base+1 rows each.
        """CASE WHEN __rank <= (__n % 10) * (__n div 10 + 1)
          |     THEN (__rank - 1) div (__n div 10 + 1) + 1
          |     ELSE (__n % 10) +
          |          (__rank - (__n % 10) * (__n div 10 + 1) - 1)
          |            div (__n div 10) + 1
          |END""".stripMargin).cast("int"))
      .select("doc_id", "n_tokens", "decile")
  }

  /** Document fingerprints: the full-text md5 plus a winnowing-style
    * content fingerprint — the minimum 48-bit hash over all character
    * 8-grams (a rolling window of hashes reduced by min; robust to small
    * edits anywhere outside the minimizing window). Narrow per-row
    * compute; the 8-gram array never leaves the row.
    *
    * Backed by the native codegen'd `winnow_fp` expression
    * ([[graft.functions.TextKernels]]): a digest per 8-gram through
    * Catalyst's interpreted lambda path is ~20x slower than the
    * expression's generated loop, and the projection stays narrow inside
    * whole-stage codegen (no RDD boundary). Values are identical to the
    * declarative form `array_min(transform(sequence(1, greatest(len-7,
    * 1)), i -> hex48(md5(substring(text, i, 8)))))`.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    graft.Tables.spread(docs).select(
      col("doc_id"),
      md5(col("text")).as("text_md5"),
      expr("winnow_fp(text)").as("winnow_fp"))
  }

  /** Repetition-based quality signals (the Gopher-rule family every LLM
    * corpus filter applies): the most-frequent token's share of the
    * document and the duplicated-bigram fraction, plus the resulting keep
    * verdict. Repetitive boilerplate (nav bars, scraped templates, decode
    * loops) scores high on both and is dropped before training.
    *
    * Narrow per-row projection — nothing shuffles, so the filter runs at
    * scan speed over 100 TB. The counters come from the native codegen'd
    * `rep_signals` expression ([[graft.functions.TextKernels]]): one
    * hash-map pass per row, where the declarative HOF form
    * (`array_max(transform(array_distinct(toks), t -> size(filter(...))))`)
    * is O(tokens²) through Catalyst's interpreted lambda path — the same
    * upgrade `winnow_fp` made for fingerprints.
    */
  def repetitionSignals(docs: DataFrame, maxTopTokenShare: Double = 0.12,
                        maxDupBigramFrac: Double = 0.05,
                        minTokens: Int = 20): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    val r = expr("rep_signals(text)")
    val n = r.getField("n_tokens")
    val nGrams = r.getField("n_bigrams")
    val dupFrac = when(nGrams > 0,
      round(r.getField("dup_bigrams").cast("double") / nGrams, 6))
      .otherwise(lit(0.0))
    docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      round(r.getField("top_cnt").cast("double") / n, 6).as("top_token_share"),
      dupFrac.as("dup_bigram_frac"))
      .withColumn("keep",
        col("n_tokens") >= minTokens &&
          col("top_token_share") <= maxTopTokenShare &&
          col("dup_bigram_frac") <= maxDupBigramFrac)
  }

  /** Context-window chunking: slice each document into overlapping
    * character windows `chunkChars` wide, `stride` apart — the prep step
    * between a cleaned corpus and sequence packing, where long documents
    * must become model-context-sized pieces without losing boundary text
    * (the overlap keeps spans that straddle a cut). A document shorter
    * than one window yields exactly one chunk; otherwise windows start at
    * 0, stride, 2*stride, ... until the text is covered, so chunk count
    * and boundaries are reproducible from (doc_id, length) alone:
    * n = ceil(max(1, len - overlap) / stride), all-integer.
    *
    * Scale posture: narrow sequence+explode flatMap — no shuffle; the
    * output carries each chunk's md5 and length, never a second copy of
    * the corpus, so the result stays ~rows x 40 bytes.
    */
  def chunk(docs: DataFrame, chunkChars: Int = 200, stride: Int = 150): DataFrame = {
    require(stride >= 1 && stride <= chunkChars, "need 1 <= stride <= chunkChars")
    val overlap = chunkChars - stride
    docs
      .select(col("doc_id"), col("text"),
        expr(s"(greatest(1L, length(text) - ${overlap}L) + ${stride - 1}L) div ${stride}L")
          .as("__n"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("__n") - 1)).as("chunk_id"))
      .withColumn("__ct", expr(s"substring(text, chunk_id * $stride + 1, $chunkChars)"))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        length(col("__ct")).cast(LongType).as("chunk_len"),
        md5(col("__ct")).as("chunk_md5"))
  }

  /** Canonical text form for content-identity comparisons: lowercase,
    * punctuation/controls to spaces, runs of spaces collapsed, ends
    * trimmed. Engine-portable — both Java regex and RE2 give `\p{L}` /
    * `\p{N}` Unicode general-category semantics, so the DuckDB oracle
    * reproduces the byte-exact same string.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N} ]", " "), " +", " "))

  /** Normalization audit: the canonical form's md5 and length plus a
    * changed flag — the pass a pipeline runs BEFORE content dedup so
    * whitespace/case/punctuation variants of one page collapse to one
    * content key. Narrow projection.
    */
  def normalizeStats(docs: DataFrame): DataFrame = {
    val nt = normalized(col("text"))
    docs.select(
      col("doc_id"),
      md5(nt).as("norm_md5"),
      length(nt).cast(LongType).as("norm_len"),
      (nt =!= col("text")).as("changed"))
  }

  /** Deterministic stratified sampling: each stratum (language here) keeps
    * a configured permille of its documents, selected by an md5-derived
    * bucket SALTED differently from `splitAssign`'s bucket — the sample is
    * independent of the train/val/test split. Hash-based, never random:
    * re-running over a grown corpus keeps every previously sampled
    * document, so downstream caches stay valid. Narrow projection.
    */
  def stratifiedSample(docs: DataFrame, permille: Map[String, Int],
                       defaultPermille: Int = 100): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))),
        1, 12), 16, 10).cast(LongType), lit(1000L))
    val rate = permille.foldLeft(lit(defaultPermille)) { case (els, (lang, p)) =>
      when(col("lang") === lang, lit(p)).otherwise(els)
    }
    docs.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < rate)
  }

  /** Deterministic per-stratum reservoir sample: EXACTLY `k` documents
    * per group (vs [[stratifiedSample]]'s rate-based expected count) —
    * the fixed-budget selection behind "pull 10k inspection docs per
    * language" / "k eval prompts per domain" corpus QA, where a permille
    * rate over skewed stratum sizes gives 3 docs from one language and
    * 300k from another.
    *
    * Selection is the k smallest salted-hash priorities per group with
    * doc_id as the total-order tiebreak — hash-based, never random, so a
    * re-run over a grown corpus keeps every still-qualifying pick, and
    * retries cannot drift (same replayability contract as the other
    * sampling lanes).
    *
    * Scale posture: selection runs through the bounded-buffer
    * [[graft.functions.TopKHeap]] AGGREGATE, not a window — Catalyst
    * plans a partial top-k before the exchange, so each map task ships
    * ≤ k candidate rows per group and no stratum is ever globally
    * sorted. At 100 TB, sampling 10k docs from a 10-billion-doc stratum
    * shuffles kilobytes, not the corpus.
    */
  def reservoirSample(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    val pri = pmod(
      conv(substring(md5(concat(lit("res:"), col("doc_id").cast("string"))),
        1, 12), 16, 10).cast(LongType), lit(1000000007L))
    val topk = udaf(new graft.functions.TopKHeap(k))
    docs
      .select(col(groupCol), col("doc_id").cast(LongType).as("doc_id"),
        pri.as("pri"))
      // TopKHeap orders score DESC; the sample wants smallest priority
      // first, so the score lane carries the negated priority.
      .groupBy(groupCol)
      .agg(topk((lit(0L) - col("pri")).as("score"), col("doc_id")).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(groupCol), (col("pos") + 1).cast(LongType).as("rank"),
        (lit(0L) - col("t.score")).as("priority"), col("t.id").as("doc_id"))
  }

  /** Content-defined chunking (TextKernels.cdcBounds scaladoc): every
    * document splits at hash-determined cut points (expected chunk ≈
    * `d` chars), so an edit re-synchronizes within one chunk and every
    * chunk after it hashes identically again — the insertion-robust
    * sub-document dedup unit the fixed-window `doc_chunks` face cannot
    * provide. Output: (doc_id, chunk_idx, start, chunk_len, chunk_md5).
    *
    * Scale posture: the boundary scan is ONE codegen'd kernel call per
    * document (no per-position explode — the cut list rides as a small
    * array); span assembly is array arithmetic over that list; only the
    * chunk hashes — never chunk text — need leave the row. Grouping by
    * chunk_md5 downstream is the standard dedup shuffle on a 16-byte
    * key.
    */
  def cdcChunks(docs: DataFrame, d: Int = 64): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    docs
      .withColumn("b", expr(s"cdc_bounds(text, $d)"))
      .withColumn("cuts", expr(
        "concat(array(1), filter(b, x -> x > 1), array(length(text) + 1))"))
      .select(col("doc_id"), col("text"),
        posexplode(expr(
          """transform(sequence(1, size(cuts) - 1),
            |  j -> struct(element_at(cuts, j) AS start,
            |              element_at(cuts, j + 1) - element_at(cuts, j) AS len))
            |""".stripMargin)).as(Seq("pos", "span")))
      .select(col("doc_id"),
        (col("pos") + 1).cast(LongType).as("chunk_idx"),
        col("span.start").cast(LongType).as("start"),
        col("span.len").cast(LongType).as("chunk_len"),
        md5(expr("substring(text, span.start, span.len)")).as("chunk_md5"))
  }

  /** Per-language top-`k` token bigrams — the collocation census a corpus
    * report runs (and the seed list for the boilerplate scan below).
    *
    * Scale posture: the explode carries only (lang, ngram) — text never
    * rides the shuffle; the count aggregates with map-side partials; the
    * ranking window runs over the COUNTED relation (vocabulary-sized, not
    * corpus-sized), so the 5-partition lang window is cheap even though the
    * language key space is tiny.
    */
  def ngramTopK(docs: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = docs
      .select(col("lang"), split(col("text"), " ").as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, size(__toks) - 1)," +
          " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"))
        .as("ngram"))
      .groupBy("lang", "ngram").agg(count(lit(1)).as("occurrences"))
    val w = Window.partitionBy("lang")
      .orderBy(col("occurrences").desc, col("ngram").asc)
    counted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("lang", "ngram", "occurrences", "rank")
  }

  /** Corpus-level boilerplate scan (the CCNet/RefinedWeb shared-shingle
    * rule): a token `n`-gram window is boilerplate when it occurs in at
    * least `minDocs` DISTINCT documents (nav bars, scraped templates,
    * license footers); each document reports its window count, boilerplate
    * window count, and fraction.
    *
    * Scale posture: windows travel as 48-bit md5 prefixes — (doc_id,
    * 12-char hash) pairs, never the window text — so both the frequency
    * aggregate and the window⋈frequency join shuffle narrow rows; the
    * frequency side aggregates with map-side partials. Documents shorter
    * than one window carry no boilerplate by definition and are dropped.
    */
  def boilerplate(docs: DataFrame, n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n >= 2, "window size must be >= 2")
    val gramExpr = (0 until n).map(j => s"element_at(__toks, i + $j)")
      .mkString("concat(", ", ' ', ", ")")
    val wins = docs
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(__toks) - ${n - 1}), i -> $gramExpr)")).as("__w"))
      .select(col("doc_id"), substring(md5(col("__w")), 1, 12).as("w_hash"))
    val freq = wins.groupBy("w_hash")
      .agg(countDistinct(col("doc_id")).as("w_docs"))
    wins.join(freq, "w_hash")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("w_docs") >= minDocs, 1L).otherwise(0L)).as("boiler_windows"))
      .withColumn("boiler_frac",
        round(col("boiler_windows").cast("double") / col("n_windows"), 6))
  }

  /** PII detection + redaction: per-document email / phone match counts and
    * the md5 of the redacted text (emails first, then phones, so a phone
    * pattern can never match inside a placeholder). Patterns stay within
    * the Java∩RE2 regex subset so the DuckDB oracle reproduces the exact
    * same redacted bytes. Narrow per-row projection — the scrub runs at
    * scan speed over 100 TB and composes before any dedup/packing stage.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val email = "[a-z0-9._]+@[a-z0-9.]+"
    val phone = "[0-9]{3}-[0-9]{4}"
    val red = regexp_replace(
      regexp_replace(col("text"), lit(email), lit("<EMAIL>")),
      lit(phone), lit("<PHONE>"))
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(email), lit(0))).cast(LongType)
        .as("n_emails"),
      size(regexp_extract_all(col("text"), lit(phone), lit(0))).cast(LongType)
        .as("n_phones"),
      md5(red).as("redacted_md5"),
      (red =!= col("text")).as("redacted"))
  }

  /** Domain mixing: resample sources to target permille proportions
    * WITHOUT upsampling — the corpus-mixture step between cleaning and
    * packing. The feasible total is water-filled from the data
    * (T = min over sources of n_total*1000/share), each source's quota is
    * T*share/1000, and quota members are picked by an md5 rank salted
    * independently of the split/sample hashes — deterministic, so a
    * re-run over a grown corpus keeps previously picked documents until
    * its quota grows. All-integer arithmetic (the oracle reproduces T and
    * quotas exactly).
    *
    * Scale posture: counts and the 1-row feasible-total aggregate
    * broadcast (sources number in the hundreds, never corpus-scale); the
    * per-source pick window is a rank-then-filter — at 100 TB swap the
    * global rank for the two-phase per-partition top-quota selection, same
    * contract. The single-row T relation joins on a DATA-DERIVED constant
    * key (pmod(n, 1)) so Catalyst plans a hash join, not a BNLJ.
    */
  def domainMix(docs: DataFrame, sharesPermille: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sharesPermille.values.forall(_ > 0), "shares must be positive")
    val share = sharesPermille.foldLeft(lit(0)) { case (els, (src, p)) =>
      when(col("source") === src, lit(p)).otherwise(els)
    }
    val scoped = docs.filter(col("source").isin(sharesPermille.keys.toSeq: _*))
    val counts = scoped.groupBy("source")
      .agg(count(lit(1)).as("n_total"))
      .withColumn("share_pm", share)
    val t = counts.agg(min(expr("n_total * 1000 div share_pm")).as("t_total"))
      .withColumn("__one", pmod(col("t_total"), lit(1L)))
    val quotas = counts.withColumn("__one", pmod(col("n_total"), lit(1L)))
      .join(broadcast(t), "__one").drop("__one")
      .withColumn("quota", expr("t_total * share_pm div 1000"))
      .select("source", "quota")
    val w = Window.partitionBy("source").orderBy(
      substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 12),
      col("doc_id"))
    scoped.select(col("doc_id"), col("source"))
      .withColumn("pick_rank", row_number().over(w))
      .join(broadcast(quotas), "source")
      .filter(col("pick_rank") <= col("quota"))
      .select("doc_id", "source", "pick_rank", "quota")
  }

  /** Temperature-scaled domain mixing at α = 1/2 — the standard
    * "flatten the source distribution" reweighting (multilingual and
    * multi-corpus training mixes sample domain d with probability
    * ∝ n_d^α, α<1, so giant domains stop drowning small ones). α = 1/2
    * keeps the lane engine-exact WITHOUT a float tolerance: the weight is
    * floor(sqrt(n_d)) and IEEE-754 requires sqrt to be CORRECTLY ROUNDED,
    * so Spark and DuckDB compute the identical double for any n_d < 2^52
    * and the floor agrees bit for bit (a relational assert_true guards
    * that bound — loud failure, not drift, past it). Quotas are then
    * integer: quota_d = min(budget · w_d div Σw, n_d).
    *
    * Pick order reuses [[domainMix]]'s seeded-md5 rank: deterministic,
    * engine-reproducible, uncorrelated with doc ids.
    *
    * Scale posture: identical to domainMix — source-sized aggregates
    * broadcast; the pick window is per-source; the 1-row Σw relation
    * joins on a data-derived constant key (hash join, not BNLJ).
    */
  def domainTemperatureMix(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "budget must be positive")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
      .withColumn("wgt",
        floor(sqrt(col("n_total").cast("double"))).cast("long"))
    val t = counts
      .agg(sum("wgt").as("w_sum"), max("n_total").as("n_max"))
      .withColumn("__one", pmod(col("w_sum"), lit(1L)))
    val quotas = counts.withColumn("__one", pmod(col("n_total"), lit(1L)))
      .join(broadcast(t), "__one").drop("__one")
      .withColumn("quota",
        least(expr(s"${budget}L * wgt div w_sum"), col("n_total")) +
          coalesce(
            assert_true(col("n_max") <= lit(1L << 52),
              lit("temperature mix: domain count exceeds 2^52 — " +
                "floor(sqrt(double)) is no longer integer-exact")).cast("long"),
            lit(0L)))
      .select("source", "quota")
    val w = Window.partitionBy("source").orderBy(
      substring(md5(concat(lit("tmix:"), col("doc_id").cast("string"))), 1, 12),
      col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("pick_rank", row_number().over(w))
      .join(broadcast(quotas), "source")
      .filter(col("pick_rank") <= col("quota"))
      .select("doc_id", "source", "pick_rank", "quota")
  }

  /** Per-document top-`k` distinguishing terms by a log-free tf-idf
    * variant: score = tf × (N / df), monotone in the classic tf·idf for
    * fixed tf and rank-equivalent per (tf, df) cell. Log-free on purpose —
    * tf, N and df are integers and one IEEE division is exactly
    * reproducible across engines, where `ln` is library-dependent in the
    * last ulp and would make the oracle hash flaky.
    *
    * Scale posture: the explode carries only (doc_id, token) — text never
    * rides the shuffle; tf and df aggregate with map-side partials; N
    * arrives via a broadcast single-row aggregate (no driver action); the
    * df lookup is a broadcast-sized join at any realistic vocabulary.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    val tf = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(pat), lit(0))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // the single-row corpus count joins on a constant-valued but
    // DATA-DERIVED key (pmod(x, 1) = 0): a pure-literal key would
    // constant-fold the join condition away and Catalyst would fall back
    // to BroadcastNestedLoopJoin — the engine-wide plan audit asserts no
    // BNLJ in operator code, and a hash join keeps the row path codegen'd
    val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      .withColumn("__one", pmod(col("n_docs"), lit(1L)))
    val score = (col("tf") * col("n_docs")).cast("double") / col("df")
    val w = Window.partitionBy("doc_id").orderBy(score.desc, col("token").asc)
    tf.join(broadcast(df), "token")
      .withColumn("__one", pmod(col("tf"), lit(1L)))
      .join(broadcast(n), "__one").drop("__one")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(score, 6).as("score"), col("rank"))
  }

  /** BM25 document ranking (Robertson–Spärck Jones Okapi weighting,
    * k1=1.2 b=0.75) for a query made of the corpus's `nTerms` most
    * frequent tokens — the retrieval-scoring pass next to [[tfidfTopK]].
    *
    * Engine-exactness: the idf uses the RATIO form (N-df+0.5)/(df+0.5)
    * without the log — log() is the one primitive whose last-ulp
    * behavior differs across engines, and dropping it preserves the
    * per-term ordering (log is monotone). Per-term scores canonicalize
    * to micro-units (round(score*1e6) BIGINT) BEFORE the per-document
    * sum, so the cross-term accumulation is integer — exact and
    * order-independent under any partitioning (the float-parity posture
    * of `Canonical`; a double sum would depend on aggregation order).
    *
    * Plan: the tiny term list and the vocabulary df relation broadcast;
    * tf shrinks to |terms| rows per doc BEFORE the doc-keyed join with
    * the length relation; the (n_docs, avgdl) scalar rides a
    * broadcast hash join on a data-derived constant key (pmod trick —
    * see [[tfidfTopK]]'s BNLJ note). One doc-keyed shuffle total.
    */
  def bm25TopK(docs: DataFrame, nTerms: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit(pat), lit(0))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n_docs"),
        expr("CAST(SUM(dl) AS DOUBLE) / CAST(count(1) AS DOUBLE)").as("avgdl"))
      .withColumn("__one", pmod(col("n_docs"), lit(1L)))
    val terms = vocab(docs, nTerms).select("token")
    val micro = expr(
      "CAST(round(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))" +
        " * (CAST(tf AS DOUBLE) * 2.2)" +
        " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))" +
        " * 1000000) AS BIGINT)")
    val scored = tf
      .join(broadcast(terms), Seq("token"), "left_semi")
      .join(broadcast(dfRel), "token")
      .join(dl, "doc_id")
      .withColumn("__one", pmod(col("tf"), lit(1L)))
      .join(broadcast(st), "__one")
      .select(col("doc_id"), micro.as("micro"))
      .groupBy("doc_id")
      .agg(sum(col("micro")).as("score_u"), count(lit(1)).as("n_terms"))
    // Distributed top-k (TakeOrdered) before the rank window, so the
    // scored relation — corpus-sized when the query terms are common —
    // never funnels through a global single-partition window; the window
    // then numbers k rows.
    scored
      .orderBy(col("score_u").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_u").desc, col("doc_id").asc)))
      .select(col("doc_id"),
        round(col("score_u").cast("double") / 1000000.0, 6).as("score"),
        col("n_terms"), col("rank"))
  }
}
