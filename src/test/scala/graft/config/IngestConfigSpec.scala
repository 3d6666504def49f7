package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** YAML config loading: key normalization, validation and version gating
  * (mirrors the reference's config test behaviors).
  */
class IngestConfigSpec extends AnyFunSuite {

  test("parses snake_case and kebab-case, normalizes symbols") {
    val cfg = IngestConfig.loadString(
      """config_version: "1"
        |symbols: [aapl, " msft "]
        |start: 2024-01-02
        |end: 2024-01-05
        |batch-size: 500
        |feed-type: sip
        |output-path: /tmp/data
        |""".stripMargin)
    assert(cfg.symbols == Seq("AAPL", "MSFT"))
    assert(cfg.batchSize == 500)
    assert(cfg.feedType == "sip")
    assert(cfg.outputPath == "/tmp/data")
    assert(cfg.timeframe == "1m") // default
  }

  test("rejects unknown keys") {
    val e = intercept[ConfigError](IngestConfig.loadString(
      "symbols: [A]\nstart: 2024-01-02\nend: 2024-01-03\nbogus_key: 1\n"))
    assert(e.getMessage.contains("bogus_key"))
  }

  test("refuses configs newer than this binary") {
    val e = intercept[ConfigVersionError](IngestConfig.loadString(
      "config_version: \"2\"\nsymbols: [A]\nstart: 2024-01-02\nend: 2024-01-03\n"))
    assert(e.getMessage.contains("upgrade"))
  }

  test("validates dates, bounds, timeframe and symbols") {
    intercept[ConfigError](IngestConfig.loadString(
      "symbols: [A]\nstart: 2024-01-05\nend: 2024-01-02\n")) // end < start
    intercept[ConfigError](IngestConfig.loadString(
      "symbols: [A]\nstart: 2024-1-2\nend: 2024-01-03\n")) // bad date format
    intercept[ConfigError](IngestConfig.loadString(
      "symbols: [A]\nstart: 2024-01-02\nend: 2024-01-03\nbatch_size: 0\n"))
    intercept[ConfigError](IngestConfig.loadString(
      "symbols: [A]\nstart: 2024-01-02\nend: 2024-01-03\ntimeframe: 7m\n"))
    intercept[ConfigError](IngestConfig.loadString(
      "symbols: ['BAD SYMBOL!']\nstart: 2024-01-02\nend: 2024-01-03\n"))
    intercept[ConfigError](IngestConfig.loadString(
      "symbols: []\nstart: 2024-01-02\nend: 2024-01-03\n"))
  }

  test("loads from a file") {
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yaml")
    java.nio.file.Files.writeString(f,
      "symbols: [TSLA]\nstart: 2024-01-02\nend: 2024-01-02\n")
    val cfg = IngestConfig.load(f.toString)
    assert(cfg.symbols == Seq("TSLA"))
    assert(cfg.configVersion == "1")
  }
}
