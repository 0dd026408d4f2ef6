package graft

import graft.functions.Canonical
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("null columns serialize to the sentinel, not dropped") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "s")
    val out = df.select(Canonical.serial(Seq(
      (col("id"), LongType), (col("s"), StringType))).as("ser"))
      .orderBy("ser").as[String].collect()
    assert(out.toSeq == Seq("1|@NULL@", "2|x"))
  }

  test("money doubles canonicalize to exact cents") {
    val df = Seq(123.45, 0.1 + 0.2, 100.0).toDF("m")
    val out = df.select(Canonical.canonical(col("m"), DoubleType).as("c"))
      .as[String].collect().toSeq
    assert(out == Seq("12345", "30", "10000"))
  }

  test("sqlLiteral quotes strings and doubles embedded quotes") {
    val df = Seq(("it's", 1.5), ("plain", 2.0)).toDF("s", "m")
    val out = df.select(Canonical.sqlValues(Seq(
      (col("s"), StringType), (col("m"), DoubleType))).as("v"))
      .orderBy("v").as[String].collect().toSeq
    assert(out == Seq("'it''s', 1.50", "'plain', 2.00"))
  }

  test("sqlLiteral renders NULL keyword unquoted") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "s")
    val out = df.select(Canonical.sqlValues(Seq(
      (col("id"), LongType), (col("s"), StringType))).as("v"))
      .as[String].head()
    assert(out == "1, NULL")
  }

  test("equality lane is full 128-bit md5 hex; checksum lane is 48-bit") {
    val df = Seq("a").toDF("s")
    val fp = df.select(Canonical.fingerprint(Seq((col("s"), StringType))))
      .as[String].head()
    assert(fp.length == 32 && fp.matches("[0-9a-f]{32}"))
    val fp48 = df.select(Canonical.fingerprint48(Seq((col("s"), StringType))))
      .as[Long].head()
    assert(fp48 >= 0L && fp48 < (1L << 48))
    // the 48-bit lane is the md5 prefix, so the lanes agree
    assert(java.lang.Long.parseLong(fp.substring(0, 12), 16) == fp48)
  }

  test("chunkId floors negatives correctly") {
    val df = Seq(-1L, 0L, 499L, 500L).toDF("k")
    val out = df.select(Canonical.chunkId(col("k"), 500).as("c"))
      .as[Long].collect().toSeq
    assert(out == Seq(-1L, 0L, 0L, 1L))
  }
}
