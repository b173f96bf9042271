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
      .map(stripComment(_).trim)
      .filter(_.nonEmpty)
      .map { line =>
        require(!line.startsWith("-") && line.contains(":"),
          s"flat key: value expected, got: $line")
        val Array(k, v) = line.split(":", 2)
        require(k.trim.nonEmpty, s"bad key in: $line")
        // an empty unquoted value is a nested-mapping parent ("proj:")
        // — fail fast instead of flattening the nesting
        require(v.trim.nonEmpty, s"nested yaml not supported: $line")
        k.trim -> stripQuotes(v.trim)
      }
      .toMap

  /** Drop a `#` comment, but never inside a quoted value. Matches
    * yaml.safe_load on the edges: a quote only OPENS a string at the
    * start of a scalar (so `O'Brien` in an unquoted value stays a
    * literal apostrophe), and `#` only starts a comment at line start
    * or after whitespace (so `value#x` keeps the `#`).
    */
  private def stripComment(line: String): String = {
    val sb = new StringBuilder
    var quote: Char = 0
    var atScalarStart = true // line start, or just after ':' + whitespace
    var prev: Char = ' '
    line.foreach { c =>
      if (quote != 0) { sb += c; if (c == quote) quote = 0 }
      else if (c == '#' && prev.isWhitespace) return sb.toString
      else {
        if ((c == '"' || c == '\'') && atScalarStart) quote = c
        if (c == ':') atScalarStart = true
        else if (!c.isWhitespace) atScalarStart = false
        sb += c
      }
      prev = c
    }
    sb.toString
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v
}
