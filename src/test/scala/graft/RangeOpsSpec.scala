package graft

import graft.operators.{Dedup, RangeJoin, Sessionize, Similarity, TextAnalysis, ZOrder}
import org.apache.spark.sql.functions._

/** Specs for the round-7 batch: binned range join, z-order layout,
  * first-touch attribution, containment dedup, BM25, semdedup.
  */
class RangeOpsSpec extends SparkSpec {

  private def ev = Tables.load(spark, sfDir, "events")

  test("binned trailing-window join equals the naive theta-join") {
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val got = RangeJoin.trailingAgg(purchases, clicks, "user_id", "ts",
      "value", 86400000L, Seq("event_id"))
      .select("event_id", "n_in_window", "cents_in_window")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
      graft.functions.Canonical.epochMs(col("ts")).as("p_ms"))
    val c = clicks.select(col("user_id"),
      graft.functions.Canonical.epochMs(col("ts")).as("c_ms"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val naive = p.join(c, Seq("user_id"), "left")
      .withColumn("hit", col("c_ms").isNotNull &&
        col("c_ms") > col("p_ms") - 86400000L && col("c_ms") <= col("p_ms"))
      .groupBy("p_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n"),
        sum(when(col("hit"), col("cents")).otherwise(0L)).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(got == naive)
    assert(got.values.map(_._1).sum > 0, "window must catch some clicks")
  }

  test("z-value interleaves bits exactly") {
    import spark.implicits._
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 3L), (65535L, 0L), (65536L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows(0) == 1L)      // x bit 0 -> position 0
    assert(rows(1) == 2L)      // y bit 0 -> position 1
    assert(rows(2) == 15L)     // 2x2 grid cell (3,3) -> 0b1111
    assert(rows(3) == 0x55555555L) // all x bits -> even positions
    assert(rows(4) == 0L)      // bit 16 masked off
  }

  test("z-order files are disjoint z-ranges in curve order") {
    val files = ZOrder.layout(
      ev.select(col("event_id"), col("user_id"),
        (graft.functions.Canonical.epochMs(col("ts")) / 3600000L)
          .cast("long").as("hr")),
      "user_id", "hr", "event_id", 8)
      .orderBy("file_id").collect()
    assert(files.length == 8)
    val total = files.map(_.getLong(1)).sum
    assert(total == ev.count())
    // equal-depth: ntile spreads rows within 1 of each other
    assert(files.map(_.getLong(1)).max - files.map(_.getLong(1)).min <= 1)
    // consecutive files never overlap on the curve (boxes can only be
    // pruned if the assignment really is a curve split)
    files.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"file ${a.getInt(0)} z_max > file ${b.getInt(0)} z_min")
    }
  }

  test("first-touch attribution conserves sessions and purchases") {
    val att = Sessionize.attribution(ev, 43200L).collect()
    val channels = att.map(_.getString(0))
    assert(channels.distinct.length == channels.length)
    val nSessions = att.map(_.getLong(1)).sum
    assert(nSessions == Sessionize.sessions(ev, 43200L).count())
    val nPurch = att.map(_.getLong(2)).sum
    assert(nPurch == ev.filter(col("event_type") === "purchase").count())
  }

  test("attribution credits the session's first event type") {
    import spark.implicits._
    // user 1: view at t0 opens session 1 (purchase inside), purchase at
    // t2 opens session 2 (gap > 100s) and is its own first touch
    val e = Seq(
      (1L, 1L, "view", 0L, 10.0),
      (2L, 1L, "purchase", 50L, 20.0),
      (3L, 1L, "purchase", 300L, 5.0))
      .toDF("event_id", "user_id", "event_type", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessionize.attribution(e, 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("view") == ((1L, 1L, 2000L)))
    assert(got("purchase") == ((1L, 1L, 500L)))
  }

  test("containment catches an excerpt Jaccard misses") {
    import spark.implicits._
    val full = (1 to 30).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, full), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, 0.8).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    // excerpt fully contained: 10 of its 10 shingles appear in full
    assert(r.getDouble(3) == 1.0)   // cont_b = |A∩B| / |B|
    assert(r.getDouble(2) < 0.5)    // cont_a small: full doc not in excerpt
    // the symmetric detector misses the pair at the same strength
    assert(Dedup.jaccardNearDups(docs, 0.5).count() == 0)
  }

  test("bm25 ranks a doc stuffed with the query terms first") {
    import spark.implicits._
    // terms 'x'/'y' dominate the corpus; doc 1 repeats them most, and
    // short length boosts its per-term weight further
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "x y a b c d e f g h"),
      (3L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, nTerms = 2, k = 3).collect()
    assert(got.head.getLong(0) == 1L)
    assert(got.map(_.getInt(3)).toSeq == (1 to got.length))
    val scores = got.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 3 shares no query term -> not scored at all
    assert(!got.map(_.getLong(0)).contains(3L))
  }

  test("semdedup verdicts are complete and internally consistent") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val v = Similarity.semdedup(emb, 0.4).collect()
    assert(v.length == emb.count())
    assert(v.map(_.getLong(0)).distinct.length == v.length)
    v.foreach { r =>
      assert(r.getLong(2) >= 0L)
      assert(r.getBoolean(3) == (r.getLong(2) > 0L))
    }
    // some duplicates exist at this threshold in the fixture corpus
    assert(v.count(_.getBoolean(3)) > 0)
  }
}
