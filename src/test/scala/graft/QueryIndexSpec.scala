package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate for the generated query index (QUERIES.md): regenerates the
  * table and compares byte-for-byte, so a query added without
  * re-running `graft.tools.QueryIndex` fails here, not in a coverage
  * audit. Also asserts the structural invariants the generator
  * requires (every query has a textual definition site).
  */
class QueryIndexSpec extends AnyFunSuite {

  test("QUERIES.md is fresh and complete") {
    val want = graft.tools.QueryIndex.generate()
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("QUERIES.md")), "UTF-8")
    assert(onDisk === want,
      "QUERIES.md is stale — run `sbt \"runMain graft.tools.QueryIndex\"`")
    // one table row per query, none lost to formatting
    val rows = onDisk.linesIterator.count(_.startsWith("| `"))
    assert(rows === SparkEntry.queries.size)
  }
}
