package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling: per-column row/null/distinct counts and
  * min/max — the stats pass the reference reads from
  * `information_schema.tables` and `ANALYZE` output (`config.toml:16`,
  * `step1_creat_config.sh:37-44`) but computed from the data itself, so
  * the engine can profile ANY source (parquet snapshots included), not
  * just a live catalog. Feeds chunk-width choice (C1) and the discovery
  * contract (S1/P1-P5).
  *
  * All columns profile in ONE aggregation pass over the table. Min/max
  * render through type-aware canonical forms (doubles as DECIMAL(18,2)
  * strings, timestamps as epoch-millis strings) so the DuckDB oracle
  * reproduces every cell byte-for-byte.
  *
  * Scale posture: the exact per-column distinct counts make Catalyst plan
  * an Expand (one input replica per distinct aggregate) — the right
  * trade at audit time, but at 100 TB routine profiling should pass
  * `exactDistinct = false` to use HLL sketches (approx_count_distinct,
  * one pass, no Expand); the exact form is kept default here for the
  * oracle contract.
  */
object Profile {

  private def repr(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
    // parquet timestamps may surface as NTZ (isAdjustedToUTC=false); the
    // session runs UTC, so the NTZ→TZ cast is the identity on the instant
    case TimestampType | TimestampNTZType =>
      graft.functions.Canonical.epochMs(c).cast("string")
    case _ => c.cast("string")
  }

  def profile(df: DataFrame, exactDistinct: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        (if (exactDistinct) countDistinct(c)
         else approx_count_distinct(c)).as(s"__dst_${f.name}"),
        repr(min(c), f.dataType).as(s"__min_${f.name}"),
        repr(max(c), f.dataType).as(s"__max_${f.name}"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_${f.name}")).as("n_nulls"),
        col(s"__dst_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_repr"),
        col(s"__max_${f.name}").as("max_repr"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** [[profile]]'s oracle mirror for a named DuckDB table: one stats CTE,
    * one UNION ALL branch per column. Kept beside the operator so the
    * type-renderer mapping can never drift from the Spark side.
    */
  def oracleSql(table: String, cols: Seq[(String, String)]): String = {
    def reprSql(agg: String, kind: String): String = kind match {
      case "double"    => s"CAST(CAST($agg AS DECIMAL(18,2)) AS VARCHAR)"
      case "timestamp" => s"CAST(epoch_ms($agg) AS VARCHAR)"
      case _           => s"CAST($agg AS VARCHAR)"
    }
    val aggs = cols.zipWithIndex.flatMap { case ((c, kind), i) =>
      Seq(s"count($c) AS c$i", s"count(DISTINCT $c) AS d$i",
        s"${reprSql(s"min($c)", kind)} AS mn$i",
        s"${reprSql(s"max($c)", kind)} AS mx$i")
    }
    val branches = cols.zipWithIndex.map { case ((c, _), i) =>
      s"""SELECT '$c' AS col_name, n AS n_rows, n - c$i AS n_nulls,
         |  d$i AS n_distinct, mn$i AS min_repr, mx$i AS max_repr FROM s""".stripMargin
    }
    s"""WITH s AS (SELECT count(*) AS n, ${aggs.mkString(",\n  ")} FROM $table)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY col_name""".stripMargin
  }

  /** Exact join-output cardinality WITHOUT executing the join — the
    * "plan before you spend cluster-hours" estimator: |A ⋈ B| on an
    * equi-key is Σ_k cnt_A(k)·cnt_B(k), computable from two per-key
    * count aggregations joined on the key (each input read once, no row
    * ever replicated). Alongside the total the relation reports the
    * structural facts a planner acts on: per-side key cardinalities,
    * matching-key count, and the largest single-key output (the skew
    * number that decides salting BEFORE the job runs — one hot key
    * producing 10^10 rows is invisible in the total until it kills a
    * 100 TB run).
    *
    * Scale posture: both aggregations are map-side-partial groupBys; the
    * histogram join carries (key, count) pairs only; the final aggregate
    * is one row. Never materializes a joined row.
    */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String): DataFrame = {
    val la = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cnt_a"))
    val ra = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cnt_b"))
    // data-derived constant join key (pmod(x,1)=0): a pure-literal key
    // would constant-fold the 1-row attaches into BNLJ, which the
    // engine-wide plan audit forbids (same device as the pmi/tf-idf
    // total attaches)
    val leftKeys = la.agg(count(lit(1)).as("n_keys_left"))
      .withColumn("__one", pmod(col("n_keys_left"), lit(1L)))
    val rightKeys = ra.agg(count(lit(1)).as("n_keys_right"))
      .withColumn("__one", pmod(col("n_keys_right"), lit(1L)))
    la.join(ra, "k")
      .select((col("cnt_a") * col("cnt_b")).as("out_rows"))
      .agg(coalesce(sum("out_rows"), lit(0L)).as("est_rows"),
        count(lit(1)).as("n_common_keys"),
        coalesce(max("out_rows"), lit(0L)).as("max_key_rows"))
      .withColumn("__one", pmod(col("n_common_keys"), lit(1L)))
      .join(broadcast(leftKeys), "__one")
      .join(broadcast(rightKeys), "__one")
      .select("est_rows", "n_common_keys", "n_keys_left", "n_keys_right",
        "max_key_rows")
  }
}
