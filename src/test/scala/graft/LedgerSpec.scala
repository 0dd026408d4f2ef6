package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized coverage ledger — pins the registry/oracle/SURVEY counts to
  * each other so they can never drift apart silently again (VERDICT r07:
  * SURVEY said 100, the registry held 106, CORRECTNESS recorded 105, and
  * the count had been hand-corrected twice in one round).
  *
  * The single source of truth is `SparkEntry.queries.size`; SURVEY.md §2.12
  * must state exactly that number in its "(N oracle queries total)" line,
  * and every query must have an oracle (the driver's hash compare is the
  * correctness gate — a query without an oracle is unverified by
  * definition, and an oracle without a query is dead text).
  */
class LedgerSpec extends AnyFunSuite {

  test("every registered query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("no duplicate query names across registries") {
    val sizes = Seq(
      graft.queries.CoreQueries.queries.size,
      graft.queries.PipelineQueries.queries.size,
      graft.queries.EventQueries.queries.size,
      graft.queries.OlapQueries.queries.size)
    assert(sizes.sum == SparkEntry.queries.size,
      s"registry name collision: per-registry sizes $sizes sum to " +
        s"${sizes.sum} but the merged map holds ${SparkEntry.queries.size}")
  }

  test("SURVEY.md §2.12 states the actual oracle-query count") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = "\\((\\d+) oracle queries total\\)".r.findAllMatchIn(survey).toList
    assert(m.nonEmpty, "SURVEY.md must contain '(N oracle queries total)'")
    m.foreach { hit =>
      assert(hit.group(1).toInt == SparkEntry.queries.size,
        s"SURVEY.md claims ${hit.group(1)} oracle queries; the registry " +
          s"holds ${SparkEntry.queries.size} — update SURVEY.md §2.12")
    }
  }
}
