package graft

import graft.functions.{Scored, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKHeapSpec extends SparkSpec {
  import spark.implicits._

  test("buffer algebra: insert keeps order, merge is a bounded k-way") {
    val a = new TopKHeap(3)
    // build up via reduce in worst-case (ascending) order
    val buf = Seq(1L, 5L, 3L, 5L, 9L, 2L).zipWithIndex
      .map { case (s, i) => Scored(s, i.toLong) }
      .foldLeft(a.zero)(a.reduce)
    assert(buf == Seq(Scored(9, 4), Scored(5, 1), Scored(5, 3)))
    // merge two disjoint sorted buffers; ties cut by id ASC
    val other = Seq(Scored(9, 0), Scored(5, 2))
    assert(a.merge(buf, other) ==
      Seq(Scored(9, 0), Scored(9, 4), Scored(5, 1)))
    assert(a.merge(a.zero, a.zero).isEmpty)
  }

  test("aggregate equals the window top-k on a skewed dataset") {
    // one hot group (80 rows), several small ones, score ties included
    val rows = (0 until 80).map(i => ("hot", (i % 7).toLong, i.toLong)) ++
      Seq(("a", 5L, 100L), ("a", 5L, 101L), ("b", 1L, 102L))
    val df = rows.toDF("g", "score", "id").repartition(4)
    val top3 = udaf(new TopKHeap(3))
    val agg = df
      .groupBy("g").agg(top3(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("t.score").as("score"), col("t.id").as("id"))
    val win = df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rank") <= 3)
      .select("g", "rank", "score", "id")
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
    assert(agg.count() == win.count())
  }

  test("groups smaller than k return all their rows, in order") {
    val top5 = udaf(new TopKHeap(5))
    val out = Seq(("x", 2L, 1L), ("x", 7L, 2L)).toDF("g", "score", "id")
      .groupBy("g").agg(top5(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.score")).as[Long].collect().toSeq
    assert(out == Seq(7L, 2L))
  }
}
