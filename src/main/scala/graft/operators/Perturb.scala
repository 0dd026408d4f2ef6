package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic "downstream replica drift" derivation.
  *
  * The reference compares a master table against a slave replica that may
  * have drifted (missing / extra / mutated rows — exactly the three classes
  * its `export-fix-sql` repairs, `my_database_users.toml:8`). The fixtures
  * ship only one copy of each table, so the engine's test/verify harness
  * derives the slave side by a *deterministic, SQL-expressible* perturbation
  * — reproducible bit-for-bit by the DuckDB oracle.
  *
  * Note: the fixture lineitem's (l_orderkey, l_linenumber) is NOT unique
  * (l_linenumber is uniform 1..7), so PK-keyed drift uses `orders`
  * (o_orderkey is dense-unique 0..N); lineitem drift feeds the keyless
  * multiset diff ([[HashDiff]]).
  */
object Perturb {

  /** orders drift: delete (%997=1), mutate o_totalprice (+1 where %991=2),
    * insert (keys %983=3 duplicated at key + max(o_orderkey)+1).
    *
    * The insert offset is DERIVED FROM THE DATA (max key + 1, broadcast as
    * a 1-row join side) so shifted keys can never collide with existing
    * dense keys at any scale factor — a fixed +100000 offset collided with
    * real PKs at sf0.1 (150k orders), handing the downstream side duplicate
    * PKs and fanning out the full-outer row join (ADVICE r01).
    */
  def ordersDownstream(up: DataFrame): DataFrame = {
    val mutated = up
      .filter(!(col("o_orderkey") % 997 === 1))
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 991 === 2, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
    val off = up.agg((coalesce(max(col("o_orderkey")), lit(0L)) + 1L).as("__off"))
    val extra = up
      .filter(col("o_orderkey") % 983 === 3)
      .crossJoin(broadcast(off))
      .withColumn("o_orderkey", col("o_orderkey") + col("__off"))
      .drop("__off")
    mutated.unionByName(extra)
  }

  /** [[ordersDownstream]] as identically-shaped ANSI SQL (CTE body). */
  val ordersDownstreamSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val mutated = cols.map {
      case "o_totalprice" =>
        "CASE WHEN o_orderkey % 991 = 2 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice"
      case c => c
    }.mkString(", ")
    val extra = cols.map {
      case "o_orderkey" =>
        "o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders) AS o_orderkey"
      case c => c
    }.mkString(", ")
    s"""SELECT $mutated FROM orders WHERE o_orderkey % 997 <> 1
       |UNION ALL
       |SELECT $extra FROM orders WHERE o_orderkey % 983 = 3""".stripMargin
  }

  /** lineitem drift for the keyless (multiset) diff: delete (%997=1),
    * mutate l_quantity (+1 where %991=2), insert (one extra copy-with-bump
    * for %983=3, l_linenumber=1 rows, shifted to l_linenumber+100).
    */
  def lineitemDownstream(up: DataFrame): DataFrame = {
    val mutated = up
      .filter(!(col("l_orderkey") % 997 === 1))
      .withColumn(
        "l_quantity",
        when(col("l_orderkey") % 991 === 2, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
    val extra = up
      .filter(col("l_orderkey") % 983 === 3 && col("l_linenumber") === 1)
      .withColumn("l_linenumber", (col("l_linenumber") + 100).cast("int"))
    mutated.unionByName(extra)
  }

  /** [[lineitemDownstream]] as identically-shaped ANSI SQL (CTE body). */
  val lineitemDownstreamSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val mutated = cols.map {
      case "l_quantity" =>
        "CASE WHEN l_orderkey % 991 = 2 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity"
      case c => c
    }.mkString(", ")
    val extra = cols.map {
      case "l_linenumber" => "CAST(l_linenumber + 100 AS INTEGER) AS l_linenumber"
      case c => c
    }.mkString(", ")
    s"""SELECT $mutated FROM lineitem WHERE l_orderkey % 997 <> 1
       |UNION ALL
       |SELECT $extra FROM lineitem WHERE l_orderkey % 983 = 3 AND l_linenumber = 1""".stripMargin
  }
}
