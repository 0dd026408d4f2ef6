package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy matching by SYMMETRIC DELETE (SymSpell) keys —
  * the recovery lane for the reference's diff/repair theme: when a key
  * or name column arrives corrupted (one dropped/typoed character), the
  * exact row-diff can only report delete+insert; this operator re-links
  * the corrupted row to its master candidate so the repair can be an
  * UPDATE instead of a blind replace.
  *
  * Why symmetric delete and not blocking-by-prefix: every levenshtein-1
  * pair (insert, delete, OR substitute) shares at least one common
  * 1-deletion variant, so generating each side's deletion neighborhood
  * and equi-joining on the variant string finds EXACTLY the candidate
  * set — no giant shared-prefix block (an all-pairs bomb on templated
  * names), no missed pair. The expansion is bounded at (len+1) variants
  * per row, the join key is a short string, and the final
  * `levenshtein() <= 1` verify runs only on candidate pairs — the same
  * candidate-bounded shape as the MinHash verify join. Both engines
  * implement classic Levenshtein, so the verdict is oracle-exact.
  */
object Fuzzy {

  /** The 1-deletion neighborhood of `nameCol` (including the string
    * itself), as one row per (id, variant). */
  private def deletionVariants(df: DataFrame, idCol: String,
                               nameCol: String, idAs: String,
                               nameAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(nameCol).as(nameAs))
      .select(col(idAs), col(nameAs),
        explode(expr(
          s"""array_distinct(transform(sequence(0, length($nameAs)),
             |  i -> if(i = 0, $nameAs,
             |    concat(substring($nameAs, 1, i - 1),
             |           substring($nameAs, i + 1, length($nameAs))))))"""
            .stripMargin)).as("variant"))

  /** All pairs (a.idCol, b.idCol) whose names are within levenshtein
    * distance 1, with the distance. Candidates come from the deletion-
    * variant equi-join; the levenshtein verify is candidate-bounded. */
  def editDistance1Join(a: DataFrame, b: DataFrame,
                        aId: String, aName: String,
                        bId: String, bName: String): DataFrame = {
    val av = deletionVariants(a, aId, aName, "id_a", "name_a")
    val bv = deletionVariants(b, bId, bName, "id_b", "name_b")
    av.join(bv, "variant")
      .select("id_a", "name_a", "id_b", "name_b")
      .distinct()
      .withColumn("distance", levenshtein(col("name_a"), col("name_b")))
      .filter(col("distance") <= 1)
  }
}
