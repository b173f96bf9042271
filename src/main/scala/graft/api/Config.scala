package graft.api

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's config surface (S6): a 6-key flat YAML —
  * remote_url / local_dir / data_format / gdb_path / proj_dir / proj_loc
  * (reference config_loader.py:4-7; config/wnvoutbreak.yaml:1-6).
  *
  * The reference calls `yaml.safe_load`; for a flat `key: value` file a
  * dependency-free parser suffices (no PyYAML analogue is available in
  * the offline build, and nesting never occurs in the surface we
  * rebuild). Quoted values and `#` comments are handled; anything
  * nested fails fast rather than mis-parsing.
  */
object Config {

  def load(path: String): Map[String, String] =
    parse(Files.readAllLines(Paths.get(path)).asScala.toSeq)

  def parse(lines: Seq[String]): Map[String, String] =
    lines.iterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .map { line =>
        require(!line.startsWith("-") && line.contains(":"),
          s"flat key: value expected, got: $line")
        val Array(k, v) = line.split(":", 2)
        require(!k.startsWith(" ") && k.trim.nonEmpty, s"bad key in: $line")
        k.trim -> stripQuotes(v.trim)
      }
      .toMap

  private def stripQuotes(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v
}
