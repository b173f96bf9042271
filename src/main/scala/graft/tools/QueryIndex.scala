package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Mechanical coverage index: one generated table row per query in
  * [[graft.SparkEntry.queries]] — definition site (file:line), oracle
  * status, and the specs that mention it — written to `QUERIES.md` and
  * asserted fresh by `QueryIndexSpec`, so coverage audits diff a
  * generated artifact instead of re-reading a 1000-line SURVEY section
  * (VERDICT r8 #8).
  *
  * Definition sites are found textually (the literal `"<name>" ->` in
  * src/main), which is exactly how the repo declares query entries;
  * the spec fails if any query has zero or multiple definition sites,
  * so drift between the map and the index is impossible to miss.
  */
object QueryIndex {

  private def scalaFiles(root: String): Seq[Path] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq.sortBy(_.toString)

  /** (file:line) hits of the literal query declaration in a tree. */
  private def sites(name: String, files: Seq[(Path, Array[String])])
      : Seq[String] =
    for {
      (p, lines) <- files
      (line, i) <- lines.zipWithIndex
      if line.contains("\"" + name + "\" ->")
    } yield s"${p.toString.stripPrefix("src/main/scala/")}:${i + 1}"

  def generate(): String = {
    val mainFiles = scalaFiles("src/main/scala/graft")
      .map(p => p -> Files.readAllLines(p).asScala.toArray)
    val testFiles = scalaFiles("src/test/scala/graft")
      .map(p => p -> new String(Files.readAllBytes(p), "UTF-8"))
    val oracles = graft.SparkEntry.oracleSql.keySet
    val rows = graft.SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val defs = sites(name, mainFiles)
        .filterNot(_.contains("tools/")) // the index tool itself
      require(defs.nonEmpty, s"query $name: no definition site found")
      val oracle =
        if (oracles(name)) "duckdb-hash" else "rows-only (declared)"
      val specs = testFiles.collect {
        case (p, txt) if txt.contains("\"" + name + "\"") =>
          p.getFileName.toString.stripSuffix(".scala")
      }
      val specCell = if (specs.isEmpty) "—" else specs.mkString(", ")
      s"| `$name` | ${defs.mkString("; ")} | $oracle | $specCell |"
    }
    val nOracle = graft.SparkEntry.queries.keys.count(oracles)
    (s"""# Query index (GENERATED — `runMain graft.tools.QueryIndex`)
        |
        |${graft.SparkEntry.queries.size} queries, $nOracle
        |DuckDB-oracle-checked, ${graft.SparkEntry.queries.size - nOracle}
        |rows-only by declared design. `QueryIndexSpec` fails when this
        |file is stale or a query's definition site is ambiguous.
        |
        || query | defined at (query; oracle twin) | oracle | specs mentioning it |
        ||---|---|---|---|
        |""".stripMargin + rows.mkString("\n") + "\n")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("QUERIES.md")
    Files.write(Paths.get(out), generate().getBytes("UTF-8"))
    println(s"[queryindex] wrote $out")
  }
}
