package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Config

class ConfigSpec extends AnyFunSuite {

  test("parses the reference's flat 6-key config shape") {
    val cfg = Config.parse(Seq(
      "remote_url: https://docs.example.com/sheet.csv  # published sheet",
      "local_dir: C:/Temp/",
      "data_format: csv",
      "gdb_path: 'C:/Projects/wnv.gdb'",
      "proj_dir: \"C:/Projects/\"",
      "proj_loc: wnv.aprx",
      ""))
    assert(cfg("remote_url") === "https://docs.example.com/sheet.csv")
    assert(cfg("gdb_path") === "C:/Projects/wnv.gdb")
    assert(cfg("proj_dir") === "C:/Projects/")
    assert(cfg.size === 6)
  }

  test("values containing colons survive (split on first colon only)") {
    assert(Config.parse(Seq("u: https://h:8080/x"))("u") === "https://h:8080/x")
  }

  test("nested yaml fails fast") {
    intercept[IllegalArgumentException] {
      Config.parse(Seq("- item"))
    }
  }
}
