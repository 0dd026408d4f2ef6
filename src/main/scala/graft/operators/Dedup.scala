package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for the training-data pipeline (north-star
  * extension): exact, MinHash+LSH near-dup, SimHash, and exact n-gram
  * Jaccard via a shingle inverted index.
  *
  * Scale posture (100 TB):
  *  - signatures (minhash/simhash/shingles) are NARROW per-row transforms —
  *    the shingle arrays never leave their row; no explode-shuffle for
  *    signature computation.
  *  - candidate generation shuffles only small keys: (band_id, band_key)
  *    for LSH, shingle hash for the inverted index — never full documents.
  *  - verification joins carry doc_id + shingle array only for CANDIDATE
  *    pairs (drift/dup-bounded, not corpus-bounded).
  *
  * All hashing is md5-derived (engine-portable) so the DuckDB oracle
  * reproduces candidate sets and scores bit-for-bit.
  */
object Dedup {

  /** 48-bit md5-derived hash of a string expression (portable — the one
    * spelling, [[graft.functions.Canonical.hex48]]).
    */
  private def h48(c: Column): Column =
    graft.functions.Canonical.hex48(md5(c))

  /** Word w-shingles (default 3-grams), distinct, underscore-joined.
    * Documents shorter than w words yield an empty set.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    when(n >= w,
      array_distinct(transform(sequence(lit(1), n - (w - 1)),
        i => concat_ws("_", (0 until w).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Digest twin of [[shingles]] + per-shingle 48-bit md5 base hash as
    * ONE narrow projection: (doc_id, sh: array<string>, hb: array<long>).
    *
    * Backed by the native codegen'd `shingle_hashes` expression
    * ([[graft.functions.TextKernels]]): Catalyst evaluates
    * higher-order-function lambdas interpreted, and a digest per element
    * through that path measures ~2 ms/doc (10+ s at sf0.1) vs ~10 us/doc
    * in the expression's generated loop — and unlike the earlier
    * `mapPartitions` kernel this stays inside whole-stage codegen with
    * no RDD boundary (SURVEY.md §7.3 ladder step (b)). Semantics are
    * exactly [[shingles]]: split-on-space with limit -1, w-gram
    * underscore join, first-occurrence distinct; hb(i) = first 6 md5
    * bytes of sh(i), the same value as Canonical.hex48(md5(s)).
    */
  def shingleKernel(docs: DataFrame, w: Int = 3): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    graft.Tables.spread(docs)
      .select(col("doc_id"), expr(s"shingle_hashes(text, $w)").as("s"))
      .select(col("doc_id"), col("s.sh").as("sh"), col("s.hb").as("hb"))
  }

  /** doc_id + distinct shingle set. */
  def withShingles(docs: DataFrame, w: Int = 3): DataFrame =
    shingleKernel(docs, w).select(col("doc_id"), col("sh"))

  // ------------------------------------------------------------- exact

  /** Exact duplicate groups over md5(text): canonical (min) doc_id per
    * duplicated text + multiplicity. One groupBy shuffle on the 128-bit
    * hash — at 100 TB this is the standard first dedup pass. The shuffle
    * key is the 16-byte BINARY digest (hex restored only on the
    * dup-bounded output), same width discipline as [[HashDiff]].
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(unhex(md5(col("text"))).as("k"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
      .select(lower(hex(col("k"))).as("text_md5"),
        col("canonical_doc_id"), col("dup_count"))

  /** Cross-source content dedup: group by the md5 of the NORMALIZED text
    * ([[TextAnalysis.normalized]] — case/whitespace/punctuation variants
    * of one page collapse to one key) and keep, per content group, the
    * single copy with the lowest (priority, doc_id) — the "prefer the
    * curated crawl over the recrawl" selection a multi-source corpus
    * assembly needs. Emits one row per distinct content with the kept
    * copy's identity and the group's multiplicity.
    *
    * Scale posture: one shuffle on the 16-byte binary content key (the
    * [[exact]] width discipline); the min-of-struct aggregation is
    * map-side partial, so no window/sort over the corpus and no row ever
    * carries the text past the projection.
    */
  def canonicalByContent(docs: DataFrame, priority: Column): DataFrame =
    docs
      .select(unhex(md5(TextAnalysis.normalized(col("text")))).as("k"),
        priority.cast(LongType).as("__prio"), col("doc_id"), col("source"))
      .groupBy(col("k"))
      .agg(
        min(struct(col("__prio"), col("doc_id"), col("source"))).as("kept"),
        count(lit(1)).as("n_copies"))
      .select(lower(hex(col("k"))).as("content_key"),
        col("kept.doc_id").as("doc_id"), col("kept.source").as("source"),
        col("n_copies"))

  // ----------------------------------------------------------- minhash

  /** 48-bit mask for the affine per-lane permutations. */
  val Mask48: Long = (1L << 48) - 1

  /** Lane-i affine permutation over Z_2^48: odd multiplier makes it a
    * bijection, so min over permuted base hashes is a proper minhash.
    * One md5 per SHINGLE (the base hash) instead of one per shingle PER
    * LANE — 16x less digest work in the signature stage; the per-lane
    * mixing is two integer ops, exactly mirrorable in SQL.
    */
  def laneMix(h: Column, i: Int): Column =
    ((h * lit(2L * i + 3)) + lit((i + 1) * 1099511628211L)).bitwiseAND(lit(Mask48))

  /** k-lane MinHash signature from a base-hash array column (h48 per
    * shingle): lane i = min over laneMix(base, i). NULL-free: empty
    * shingle sets get sentinel -1 per lane. Narrow per-row compute.
    */
  def minhashSignature(baseHashes: Column, k: Int): Seq[Column] =
    (0 until k).map(i =>
      coalesce(array_min(transform(baseHashes, h => laneMix(h, i))), lit(-1L)))

  /** LSH banding: (doc_id, band_id, band_key) rows, band_key = md5 of
    * the comma-joined lanes of that band, carried as 16-byte BINARY (the
    * band self-join shuffles every posting on this key — half the width
    * of the hex rendering; the key never appears in user output).
    */
  def lshBands(docs: DataFrame, bands: Int, rowsPerBand: Int, w: Int = 3): DataFrame =
    lshBandsFrom(shingleKernel(docs, w), bands, rowsPerBand)

  /** [[lshBands]] over an existing [[shingleKernel]] relation. */
  def lshBandsFrom(sk: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = minhashSignature(col("hb"), bands * rowsPerBand)
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        unhex(md5(concat_ws(",",
          sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand).map(_.cast("string")): _*)))
          .as("band_key"))
    }
    sk.select(col("doc_id"), explode(array(bandKeys: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
  }

  /** MinHash+LSH near-duplicate pairs, exact-Jaccard-verified.
    *
    * candidates: self-join of the band relation on (band_id, band_key),
    * id< to orient, distinct to collapse multi-band hits — the shuffle key
    * is the small band key, never the document. verify: join candidate
    * pairs back to shingle sets, exact Jaccard, threshold filter.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double,
                      bands: Int = 4, rowsPerBand: Int = 4): DataFrame =
    minhashNearDupsFrom(shingleKernel(docs), threshold, bands, rowsPerBand)

  /** [[minhashNearDups]] over an existing [[shingleKernel]] relation —
    * the signature-reuse surface (VERDICT r03 #10): the shingle kernel is
    * the dominant narrow cost shared by the minhash and jaccard paths, so
    * a composed pipeline run materializes it ONCE (caller-owned
    * persist/checkpoint — the engine never hides a persist, ADVICE r01)
    * and feeds both `*From` variants.
    */
  def minhashNearDupsFrom(sk: DataFrame, threshold: Double,
                          bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val b = lshBandsFrom(sk, bands, rowsPerBand)
    val cand = b.as("a")
      .join(b.as("b"), Seq("band_id", "band_key"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val sh = sk.select(col("doc_id"), col("sh"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash estimator accuracy eval — the quality gate that decides
    * whether the k-lane estimate may stand in for exact Jaccard at scale
    * (the dedup-family twin of the ANN recall gate): for every banded
    * candidate pair, the lane-agreement estimate (matching lanes / k)
    * against the exact shingle-set Jaccard, plus the absolute error.
    * est is exact binary arithmetic (k is a power of two), so the oracle
    * reproduces every cell.
    *
    * Scale posture: candidates come from the same narrow band self-join
    * as mining (never all pairs); signatures ride the pair join as k
    * longs per side.
    */
  def minhashEval(docs: DataFrame, bands: Int = 4,
                  rowsPerBand: Int = 4): DataFrame =
    minhashEvalFrom(shingleKernel(docs), bands, rowsPerBand)

  /** [[minhashEval]] over an existing [[shingleKernel]] relation. */
  def minhashEvalFrom(sk: DataFrame, bands: Int = 4,
                      rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val b = lshBandsFrom(sk, bands, rowsPerBand)
    val cand = b.as("a")
      .join(b.as("b"), Seq("band_id", "band_key"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val sigCols = minhashSignature(col("hb"), k)
    val aSide = sk.select(col("doc_id").as("doc_a") +: col("sh").as("sh_a") +:
      sigCols.zipWithIndex.map { case (c, i) => c.as(s"a$i") }: _*)
    val bSide = sk.select(col("doc_id").as("doc_b") +: col("sh").as("sh_b") +:
      sigCols.zipWithIndex.map { case (c, i) => c.as(s"b$i") }: _*)
    val matching = (0 until k)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(aSide, "doc_a").join(bSide, "doc_b")
      .withColumn("est_jaccard", round(matching.cast("double") / k, 6))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"),
        round(abs(col("est_jaccard") - col("jaccard")), 6).as("abs_err"))
  }

  /** Banding-parameter sweep for the MinHash+LSH family — the dedup
    * twin of [[ProductQuant.ivfadcProbeSweep]]: for each (bands,
    * rows_per_band) split of ONE k-lane signature, the candidate-pair
    * volume (the exact-verification workload that banding buys) against
    * the verified true-pair recall — so the (b, r) operating point is
    * read off a measured curve instead of hardcoded. ONE pass: the
    * corpus shingles and signs once, every config's band keys ride one
    * array explode, and candidates for all configs come from one
    * (cfg, band_id, band_key) self-join — never an all-pairs anything.
    *
    * Truth = the exact-Jaccard-verified candidates of the LOOSEST
    * banding (k bands × 1 row): an r-row band collision means each of
    * its lanes collides individually, so EVERY config's candidate set
    * is a subset of the 1-row banding's and truth is a superset of
    * every config's verified output by construction. The residual
    * corpus-wide miss is P[no lane of k collides] ≤ (1−t)^k — 2.4e-4
    * at t=0.5, k=12 — stated, not hidden. The bands=k row therefore
    * reads recall_permille=1000: the built-in self-check, exactly like
    * the probe sweep's nprobe=16 row.
    *
    * Output per config: (bands, rows_per_band, n_candidates, n_truth,
    * hits, recall_permille, precision_permille, dropped_postings) —
    * all-integer, hash-stable; precision is verified-true candidates
    * over candidates, i.e. the fraction of verification work that pays
    * off.
    *
    * @param maxBucket hot-bucket frequency cap, the [[jaccardNearDups]]
    *   stop-shingle pattern applied to band buckets: postings whose
    *   (cfg, band_id, band_key) bucket holds more than this many
    *   documents are dropped BEFORE the candidate self-join. This
    *   matters most for the loosest (k, 1) config, where a "band" is a
    *   single minhash lane — on a template-heavy corpus every document
    *   sharing one min-shingle lands in one bucket and the join cost is
    *   Σ bucket², quadratic in the hottest bucket. The cap bounds it at
    *   Σ cap·bucket; what was skipped is STATED per config in the
    *   `dropped_postings` column (total postings removed), mirroring how
    *   the sweep already states its (1−t)^k truth residual. Since truth
    *   is the loosest config's verified candidates, capping shrinks
    *   truth too — the gauge's recall stays internally consistent and
    *   the residual is accounted, not hidden. None = exact (fixture
    *   scale only).
    */
  def minhashBandSweep(docs: DataFrame, threshold: Double = 0.5,
                       configs: Seq[(Int, Int)] =
                         Seq((2, 6), (3, 4), (4, 3), (6, 2), (12, 1)),
                       maxBucket: Option[Int] = None)
      : DataFrame = {
    val ks = configs.map { case (b, r) => b * r }.distinct
    require(ks.length == 1, s"configs must split one signature: $configs")
    val k = ks.head
    val loosest = configs.indexWhere(_._2 == 1)
    require(loosest >= 0, "configs must include the (k, 1) loosest banding")
    val sk = shingleKernel(docs)
    val sig = minhashSignature(col("hb"), k)
    val bandStructs = configs.zipWithIndex.flatMap { case ((bc, r), ci) =>
      (0 until bc).map { b =>
        struct(lit(ci).as("cfg"), lit(b).as("band_id"),
          unhex(md5(concat_ws(",",
            sig.slice(b * r, (b + 1) * r).map(_.cast("string")): _*)))
            .as("band_key"))
      }
    }
    val bandsAll = sk
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.cfg").as("cfg"),
        col("bd.band_id").as("band_id"), col("bd.band_key").as("band_key"))
    // hot-bucket cap (scaladoc): kept postings feed the self-join;
    // dropped posting counts surface per config in the output. The
    // bucket frequency rides a WINDOW count over the bucket key — one
    // shuffle of the band relation, no second shingle pass and no
    // semi-join (the r13 bench showed the groupBy+semi form recomputing
    // the shingle+sign scan for the frequency side).
    val capped = maxBucket.map { cap =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cfg", "band_id", "band_key")
      val withF = bandsAll.withColumn("__f", count(lit(1)).over(w))
      val kept = withF.filter(col("__f") <= cap).drop("__f")
      // one row per dropped POSTING, so the per-config count is the
      // same Σ bucket-size the bucket-level sum stated
      val dropped = withF.filter(col("__f") > cap).groupBy("cfg")
        .agg(count(lit(1)).as("dropped_postings"))
      (kept, dropped)
    }
    val bandsRel = capped.map(_._1).getOrElse(bandsAll)
    val cand = bandsRel.as("a")
      .join(bandsRel.as("b"), Seq("cfg", "band_id", "band_key"))
      .select(col("cfg"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
      // materialized ONCE (r20): cand feeds the truth verification,
      // the per-config hit semi-join, and the candidate census — three
      // consumers that would each re-run the banded self-join
      .localCheckpoint()
    val sh = sk.select(col("doc_id"), col("sh"))
    val truth = cand.filter(col("cfg") === loosest)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .filter((size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b")))) >= threshold)
      .select(col("doc_a"), col("doc_b"))
      // truth feeds the static-spine explode AND the truth census
      .localCheckpoint()
    val truthS = truth.select(col("doc_a"), col("doc_b"),
      explode(typedLit(configs.indices.toList)).as("cfg"))
    val hits = truthS.join(cand, Seq("cfg", "doc_a", "doc_b"), "left_semi")
      .groupBy("cfg").agg(count(lit(1)).as("hits"))
    val nCand = cand.groupBy("cfg").agg(count(lit(1)).as("n_candidates"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      .withColumn("__one", pmod(col("n_truth"), lit(1L)))
    // STATIC cfg spine (the configs are a parameter, not data — the r13
    // bench caught the data-derived distinct() re-running the whole
    // shingle+sign scan just to list them), so every config emits a row
    // even at zero candidates — or when the cap drops a config's every
    // bucket
    val spine = docs.sparkSession.range(configs.length)
      .select(col("id").cast("int").as("cfg"))
      .join(nCand, Seq("cfg"), "left")
      .join(hits, Seq("cfg"), "left")
    val withDropped = capped.fold(spine.withColumn("dropped_postings", lit(0L))) {
      case (_, dropped) =>
        spine.join(dropped, Seq("cfg"), "left")
          .withColumn("dropped_postings",
            coalesce(col("dropped_postings"), lit(0L)))
    }
    withDropped
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("__one", pmod(col("hits"), lit(1L)))
      .join(broadcast(nTruth), "__one")
      .select(
        element_at(typedLit(configs.map(_._1)), col("cfg") + 1).as("bands"),
        element_at(typedLit(configs.map(_._2)), col("cfg") + 1)
          .as("rows_per_band"),
        col("n_candidates"), col("n_truth"), col("hits"),
        expr("CASE WHEN n_truth = 0 THEN 0L " +
          "ELSE 1000 * hits div n_truth END").as("recall_permille"),
        expr("CASE WHEN n_candidates = 0 THEN 0L " +
          "ELSE 1000 * hits div n_candidates END").as("precision_permille"),
        col("dropped_postings"))
      .orderBy("bands")
  }

  /** Incremental near-dup mining: a NEW batch against an EXISTING corpus
    * index — the production shape at 100 TB, where re-mining the whole
    * corpus per ingest is off the table. The index side's band relation
    * is materialized once (bucketed by band_key in a real deployment) and
    * only the new batch is banded per run; candidates come from the
    * new-vs-index band join (no self-join — within-batch dups are
    * [[minhashNearDupsFrom]]'s job), verified by exact Jaccard. The new
    * batch's band relation is ingest-sized, so AQE broadcasts it and the
    * index side never shuffles.
    */
  def minhashAgainstIndexFrom(newSk: DataFrame, indexSk: DataFrame,
                              threshold: Double, bands: Int = 4,
                              rowsPerBand: Int = 4): DataFrame = {
    val nb = lshBandsFrom(newSk, bands, rowsPerBand)
    val ib = lshBandsFrom(indexSk, bands, rowsPerBand)
    val cand = nb.as("a")
      .join(ib.as("b"), Seq("band_id", "band_key"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("index_id"))
      .distinct()
    cand
      .join(newSk.select(col("doc_id").as("new_id"), col("sh").as("sh_n")),
        Seq("new_id"))
      .join(indexSk.select(col("doc_id").as("index_id"), col("sh").as("sh_i")),
        Seq("index_id"))
      .select(col("new_id"), col("index_id"),
        (size(array_intersect(col("sh_n"), col("sh_i"))).cast("double") /
          size(array_union(col("sh_n"), col("sh_i")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("index_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** [[minhashAgainstIndexFrom]] from raw documents on both sides. */
  def minhashAgainstIndex(newDocs: DataFrame, indexDocs: DataFrame,
                          threshold: Double, bands: Int = 4,
                          rowsPerBand: Int = 4): DataFrame =
    minhashAgainstIndexFrom(shingleKernel(newDocs), shingleKernel(indexDocs),
      threshold, bands, rowsPerBand)

  // ---------------------------------------------- cluster collapse (CC)

  /** Connected components over a near-dup pair relation — the collapse
    * step every dedup pipeline runs AFTER pair mining: pairs chain into
    * clusters (A~B, B~C => {A,B,C}) and each clustered document maps to
    * one canonical (minimum) doc_id to keep. Output: (doc_id,
    * canonical_id) for every document that appears in a pair.
    *
    * Algorithm: distributed min-label propagation. Each round is one
    * shuffle — edges carry the neighbor's current label, a groupBy(min)
    * folds them, and a label only ever decreases — so the fixpoint is the
    * component minimum, reached in <= component-diameter rounds. Near-dup
    * clusters are shallow by construction (members are all near one
    * text), so the loop converges in a handful of rounds; `maxIter`
    * guards the pathological chain and THROWS rather than return a
    * silently half-merged clustering.
    *
    * Scale posture: state per round is one narrow (doc_id, label) pair
    * per clustered doc — dup-bounded, never corpus-bounded — and each
    * round eagerly checkpoints its result so lineage stays one round deep
    * (an iteration's plan references the previous round TWICE — min-fold
    * plus convergence compare — so un-truncated lineage doubles per round
    * and analysis goes exponential; this is the standard iterative-graph
    * checkpoint cadence). Local checkpoints suffice in one JVM; a
    * 1000-executor run swaps in reliable `checkpoint` for the same
    * truncation plus fault tolerance. Blocks are released by the context
    * cleaner — nothing outlives the returned relation.
    *
    * Deterministic: min-label over a fixed edge set; the DuckDB oracle
    * mirrors it as the recursive reachability closure's per-node minimum.
    */
  def components(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("doc_a").cast(LongType).as("src"), col("doc_b").cast(LongType).as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(true) // scanned every round — compute the miner once
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("canonical_id", col("doc_id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("canonical_id").as("nl")),
          Seq("dst"))
        .groupBy("src").agg(min(col("nl")).as("nbl"))
        .select(col("src").as("doc_id"), col("nbl"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("canonical_id"), coalesce(col("nbl"), col("canonical_id")))
            .as("canonical_id"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("doc_id"), col("canonical_id").as("old")),
          Seq("doc_id"))
        .filter(col("canonical_id") =!= col("old")).count()
      labels = next
      iter += 1
    }
    require(changed == 0,
      s"component labels still changing after $maxIter rounds — raise maxIter")
    labels
  }

  // ----------------------------------------------------------- simhash

  /** 16-bit SimHash over the token multiset: bit b is set iff more than
    * half the token hashes have bit b set. Narrow per-row compute; near
    * duplicates are then doc pairs within small Hamming distance (the
    * 64/16-bit variant of Charikar's scheme).
    */
  def simhash16(text: Column): Column = {
    val hashes = transform(split(text, " "), t => h48(t))
    val n = size(hashes)
    (0 until 16).map { b =>
      when(size(filter(hashes, hv => pmod(shiftright(hv, b), lit(2)) === 1)) * 2 > n,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** (doc_id, simhash) signature relation. */
  def simhash(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), simhash16(col("text")).as("simhash"))

  /** 48-bit SimHash over the token multiset — the scale-honest signature
    * width: [[simhash16]]'s space saturates (hundreds of chance-identical
    * pairs at just 500 docs), while 48 bits keep random pairs ~24 bits
    * apart so small Hamming radii select genuine near-dups. Bit b is set
    * iff more than half the token 48-bit md5 hashes (same value as
    * [[h48]]) have bit b set.
    *
    * Backed by the native codegen'd `simhash48` expression
    * ([[graft.functions.TextKernels]]): 48 interpreted HOF filter passes
    * per row (the [[simhash16]] declarative shape scaled up) measures
    * ~100x slower than the expression's one generated digest loop —
    * identical values to the declarative form (spec-checked).
    */
  def simhash48(docs: DataFrame): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    graft.Tables.spread(docs)
      .select(col("doc_id"), expr("simhash48(text)").as("simhash"))
  }

  /** SimHash near-duplicate pairs — the phase-2 pairing the signature
    * exists for (VERDICT r03 #3): candidate pairs agree exactly on at
    * least one of `bands` contiguous `bandBits`-bit slices of the
    * signature (an equi-join on (band_id, band_key) — the shuffle key is
    * a few bits, never the document), then popcount of the XOR verifies
    * Hamming distance <= maxHamming.
    *
    * By pigeonhole the banding is LOSSLESS for maxHamming < bands (a
    * pair differing in fewer bits than there are bands leaves some band
    * untouched), so with the defaults the result EQUALS the exact
    * all-pairs answer — same shape as [[minhashNearDups]]'s band->verify
    * split. The 16-bit/4-band configuration matches [[simhash16]]'s
    * fixture-sized signature; the 100 TB path is [[simhash48]] with 8
    * bands of 6 bits via [[simhashPairsOf]].
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   bands: Int = 4, bandBits: Int = 4): DataFrame =
    simhashPairsOf(simhash(docs), maxHamming, bands, bandBits)

  /** [[simhashPairs]] over any (doc_id, simhash) signature relation. */
  def simhashPairsOf(sig: DataFrame, maxHamming: Int,
                     bands: Int, bandBits: Int): DataFrame = {
    require(maxHamming < bands,
      s"banding is lossless only for maxHamming < bands ($maxHamming >= $bands)")
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_id"),
          shiftright(col("simhash"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("band_key"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("simhash"),
        col("band.band_id"), col("band.band_key"))
    banded.as("a").join(banded.as("b"), Seq("band_id", "band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // -------------------------------------- cross-corpus contamination scan

  /** Benchmark-contamination scan: corpus documents whose shingle-set
    * Jaccard against ANY benchmark document reaches `threshold` — the
    * eval-leakage gate a training-data pipeline runs before shipping a
    * corpus (same inverted-index shape as [[jaccardNearDupsFrom]], but a
    * CROSS-relation join: every (corpus, benchmark) pairing is eligible,
    * no id-orientation).
    *
    * Scale posture: benchmark sets are small by nature, so the benchmark
    * posting relation broadcasts and the corpus-side postings stream
    * through a BroadcastHashJoin — the 100 TB corpus is never shuffled.
    * Output (doc_id, bench_id, jaccard) is contamination-bounded.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    threshold: Double): DataFrame =
    contaminationFrom(shingleKernel(corpus), shingleKernel(benchmark), threshold)

  /** [[contamination]] over existing [[shingleKernel]] relations. */
  def contaminationFrom(corpusSk: DataFrame, benchSk: DataFrame,
                        threshold: Double): DataFrame = {
    def postings(sk: DataFrame, idAs: String, nAs: String): DataFrame =
      sk.select(col("doc_id").as(idAs),
        size(col("sh")).cast(LongType).as(nAs), explode(col("sh")).as("sh_h"))
    val cp = postings(corpusSk, "doc_id", "n_c")
    val bp = broadcast(postings(benchSk, "bench_id", "n_b"))
    cp.join(bp, Seq("sh_h"))
      .groupBy(col("doc_id"), col("bench_id"), col("n_c"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .select(col("doc_id"), col("bench_id"),
        (col("common").cast("double") / (col("n_c") + col("n_b") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("bench_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------- exact n-gram Jaccard join

  /** Exact all-pairs n-gram Jaccard >= threshold via a shingle inverted
    * index (SSJoin-style): explode shingles, self-join per shingle to
    * count co-occurrences (= |A n B|), then Jaccard from |A|+|B|-common.
    * Only doc_id + one shingle per posting shuffles; document text never
    * moves. At Zipfian 100 TB scale the hot-shingle buckets dominate —
    * cap them with a stop-shingle frequency cutoff (drop postings whose
    * bucket exceeds a bound; pairs lost there are re-checked by the
    * minhash path) before the self-join.
    */
  def jaccardNearDups(docs: DataFrame, threshold: Double): DataFrame =
    jaccardNearDups(docs, threshold, maxBucket = None)

  /** @param maxBucket stop-shingle frequency cap: postings whose shingle
    *   occurs in more than this many documents are dropped BEFORE the
    *   self-join. On Zipfian corpora the hot-shingle buckets dominate the
    *   quadratic join (sum of bucket^2); capping bounds it at the cost of
    *   undercounting |A n B| for pairs whose overlap rides on hot
    *   shingles (recall loss only — the minhash path re-covers them).
    *   None = exact.
    */
  def jaccardNearDups(docs: DataFrame, threshold: Double,
                      maxBucket: Option[Int]): DataFrame =
    jaccardNearDupsFrom(
    // kernel materialized ONCE — see the threshold-only overload
    shingleKernel(docs).localCheckpoint(), threshold, maxBucket)

  /** [[jaccardNearDups]] over an existing [[shingleKernel]] relation —
    * see [[minhashNearDupsFrom]] for the signature-reuse contract.
    */
  def jaccardNearDupsFrom(sk: DataFrame, threshold: Double,
                          maxBucket: Option[Int]): DataFrame = {
    // postings carry the raw shingle string: at this shingle length the
    // string is barely wider than a hash, and skipping the per-posting
    // digest keeps the explode stage cheap (the join result is identical)
    val allPostings = sk
      .select(col("doc_id"), size(col("sh")).cast(LongType).as("sh_n"),
        explode(col("sh")).as("sh_h"))
    val sh = maxBucket.fold(allPostings) { cap =>
      val keep = allPostings.groupBy("sh_h")
        .agg(count(lit(1)).as("__f")).filter(col("__f") <= cap)
        .select("sh_h")
      allPostings.join(keep, Seq("sh_h"), "left_semi")
    }
    val common = sh.as("a")
      .join(sh.as("b"), col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh_n").as("n_a"), col("b.sh_n").as("n_b"))
      .agg(count(lit(1)).as("common"))
    common
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ----------------------------------------------- asymmetric containment

  /** Shingle CONTAINMENT pairs — the asymmetric near-dup relation Jaccard
    * misses: an excerpt quoted inside a much longer document has
    * |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0, so symmetric thresholds
    * never fire. Containment is the deduplication signal for
    * quote/excerpt/page-within-crawl cases (the overlap measure of
    * Broder's resemblance/containment pair, syntactic-clustering line of
    * work).
    *
    * Same SSJoin posting plan as [[jaccardNearDupsFrom]] (narrow
    * postings, co-occurrence count per id-ordered pair, optional
    * stop-shingle cap bounding Zipfian bucket blowup); a pair is emitted
    * when EITHER direction's containment reaches `threshold`, with both
    * directions reported (cont_a = |A∩B|/|A|, cont_b = |A∩B|/|B|).
    */
  def containmentPairs(docs: DataFrame, threshold: Double,
                       maxBucket: Option[Int] = None): DataFrame =
    containmentPairsFrom(
    // kernel materialized ONCE — the jaccardNearDups rationale
    shingleKernel(docs).localCheckpoint(), threshold, maxBucket)

  /** [[containmentPairs]] over an existing [[shingleKernel]] relation. */
  def containmentPairsFrom(sk: DataFrame, threshold: Double,
                           maxBucket: Option[Int]): DataFrame = {
    val allPostings = sk
      .select(col("doc_id"), size(col("sh")).cast(LongType).as("sh_n"),
        explode(col("sh")).as("sh_h"))
    val sh = maxBucket.fold(allPostings) { cap =>
      val keep = allPostings.groupBy("sh_h")
        .agg(count(lit(1)).as("__f")).filter(col("__f") <= cap)
        .select("sh_h")
      allPostings.join(keep, Seq("sh_h"), "left_semi")
    }
    val common = sh.as("a")
      .join(sh.as("b"), col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh_n").as("n_a"), col("b.sh_n").as("n_b"))
      .agg(count(lit(1)).as("common"))
    common
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") / col("n_a")).as("cont_a"),
        (col("common").cast("double") / col("n_b")).as("cont_b"))
      .filter(col("cont_a") >= threshold || col("cont_b") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("cont_a"), 6).as("cont_a"), round(col("cont_b"), 6).as("cont_b"))
  }

  // ------------------------------------------ substring overlap (winnowing)

  /** Character-level substring-overlap pairs from winnowing fingerprint
    * SETS — the shuffle-friendly stand-in for suffix-array exact-substring
    * dedup (the Lee et al. "Deduplicating Training Data" exact-substring
    * pass, whose suffix array does not distribute): by the
    * Schleimer–Wilkerson–Aiken coverage theorem, any verbatim substring of
    * length >= 7 + `window` shared by two documents shares at least one
    * winnow fingerprint, so the shared-fingerprint count witnesses long
    * verbatim overlap that token-shingle Jaccard dilutes (an excerpt
    * embedded in a longer page) and SimHash never localizes.
    *
    * Plan shape: the same capped inverted-index SSJoin as
    * [[jaccardNearDupsFrom]] — only (doc_id, 8-byte fingerprint) postings
    * shuffle, text never moves, and `maxBucket` drops boilerplate-hot
    * fingerprints before the quadratic bucket join (recall on planted
    * pairs rides their RARE fingerprints, so the cap costs ~nothing
    * there). Output overlap_permille = shared*1000 div min(n_a, n_b) —
    * the containment-oriented normalization, excerpt-safe.
    */
  def winnowOverlapPairs(docs: DataFrame, window: Int = 8,
                         minShared: Long = 2L,
                         maxBucket: Option[Int] = None,
                         minPermille: Long = 0L): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    // winnow_set computed ONCE (r20): the posting relation feeds the
    // hot-fingerprint census AND the capped semi-join, and the kernel
    // is the dominant per-row cost — materializing the per-doc
    // fingerprint sets halved this face at sf0.1 (one text pass, not
    // two, at any scale)
    val fps = graft.Tables.spread(docs)
        .select(col("doc_id"), expr(s"winnow_set(text, $window)").as("fps"))
        .localCheckpoint()
      .select(col("doc_id"), size(col("fps")).cast(LongType).as("n_fp"),
        explode(col("fps")).as("fp"))
    val pruned = maxBucket.fold(fps) { cap =>
      val keep = fps.groupBy("fp").agg(count(lit(1)).as("__f"))
        .filter(col("__f") <= cap).select("fp")
      fps.join(keep, Seq("fp"), "left_semi")
    }
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_fp").as("n_a"), col("b.n_fp").as("n_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        expr("shared * 1000 div least(n_a, n_b)").as("overlap_permille"))
      .filter(col("overlap_permille") >= minPermille)
  }

  /** Character-level benchmark-contamination scan via winnowing — the
    * eval-leakage case the shingle-Jaccard [[contamination]] dilutes: a
    * short benchmark item pasted VERBATIM inside a long training page has
    * near-zero symmetric Jaccard but shares essentially all of the
    * benchmark side's winnow fingerprints. Coverage is normalized on the
    * BENCHMARK side (shared/n_b — containment of the eval item), so
    * document length cannot wash out a leak.
    *
    * Scale posture: benchmark sets are small by nature — their
    * fingerprint postings broadcast, and the 100 TB corpus streams
    * through a BroadcastHashJoin without shuffling (same shape as
    * [[contaminationFrom]]).
    */
  def winnowContamination(corpus: DataFrame, benchmark: DataFrame,
                          window: Int = 8,
                          minPermille: Long = 500L): DataFrame = {
    graft.functions.TextKernels.register(corpus.sparkSession)
    def postings(df: DataFrame, idAs: String): DataFrame =
      graft.Tables.spread(df)
        .select(col("doc_id").as(idAs),
          expr(s"winnow_set(text, $window)").as("f"))
        .select(col(idAs), size(col("f")).cast(LongType).as("__n"),
          explode(col("f")).as("fp"))
    val cp = postings(corpus, "doc_id").drop("__n")
    val bp = broadcast(postings(benchmark, "bench_id")
      .withColumnRenamed("__n", "n_b"))
    cp.join(bp, Seq("fp"))
      .groupBy("doc_id", "bench_id", "n_b")
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_id"), col("bench_id"), col("shared"), col("n_b"),
        expr("shared * 1000 div n_b").as("bench_permille"))
      .filter(col("bench_permille") >= minPermille)
  }

  /** Sub-document dedup-and-REWRITE — the paragraph-dedup pass of the
    * big public curation pipelines, on fixed-width chunks (the fixture
    * corpus has no paragraph delimiters): split every document into
    * non-overlapping `chunkChars` spans, keep each distinct span text
    * only in its FIRST owning document (min doc_id), and re-assemble
    * every document from its surviving spans in order. Duplicated
    * boilerplate thus survives exactly once corpus-wide while unique
    * content is untouched — a finer instrument than whole-doc dedup,
    * which either keeps or kills entire documents.
    *
    * Output per document: total/kept span counts, rewritten length, and
    * the md5 of the rewritten text (the compact oracle-comparable witness
    * of the exact reassembled bytes).
    *
    * Scale posture: spans shuffle ONCE on their content to find the first
    * owner (a 100-char string key — bounded, never the whole doc), the
    * keep-join is on the same key, and reassembly is a per-doc groupBy
    * whose collect_list is ordered deterministically by array_sort before
    * joining. No corpus-global window, no collect. Within-doc repeats of
    * an owned span are all kept — removal semantics stay local to the
    * ownership rule, so the operator is one deterministic pass.
    */
  def chunkDedupRewrite(docs: DataFrame, chunkChars: Int = 100): DataFrame = {
    require(chunkChars > 0, "chunkChars must be positive")
    val base = docs.select(col("doc_id"), col("text"),
      expr(s"greatest(CAST(1 AS BIGINT), " +
        s"(CAST(length(text) AS BIGINT) + ${chunkChars - 1}) div $chunkChars)")
        .as("n"))
    val spans = base.select(col("doc_id"),
      explode(expr(
        s"""transform(sequence(CAST(0 AS BIGINT), n - 1),
           |  i -> struct(i AS chunk_id,
           |    substring(text, CAST(i * $chunkChars + 1 AS INT),
           |      $chunkChars) AS ct))""".stripMargin)).as("s"))
      .select(col("doc_id"), col("s.chunk_id"), col("s.ct"))
    val owner = spans.groupBy("ct").agg(min("doc_id").as("keep_doc"))
    val kept = spans.join(owner, "ct")
      .filter(col("doc_id") === col("keep_doc"))
    val rewritten = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("kept_chunks"),
        expr("array_join(transform(array_sort(" +
          "collect_list(struct(chunk_id, ct))), x -> x.ct), '')")
          .as("newtext"))
    base.select(col("doc_id"), col("n"))
      .join(rewritten, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_chunks"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        length(coalesce(col("newtext"), lit(""))).cast(LongType)
          .as("new_len"),
        md5(coalesce(col("newtext"), lit(""))).as("new_md5"))
      .orderBy("doc_id")
  }
}
