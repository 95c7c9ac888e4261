package graft

/** Env-driven log level (the reference's `LOG_LEVEL` contract,
  * `ingestion/config.py:8-18`): parse/validate, and the observable root
  * logger switch on a running context.
  */
class GraftSessionSpec extends SparkSpec {

  test("GRAFT_LOG_LEVEL parses case-insensitively; a typo fails loudly") {
    assert(GraftSession.parseLogLevel("debug") == "DEBUG")
    assert(GraftSession.parseLogLevel(" Warn ") == "WARN")
    intercept[IllegalArgumentException] {
      GraftSession.parseLogLevel("VERBOSE")
    }
  }

  test("applyEnvLogLevel switches the root logger of a running context") {
    import org.apache.logging.log4j.{Level, LogManager}
    def rootLevel: Level = LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel
    val sc = spark.sparkContext
    try {
      assert(GraftSession.applyEnvLogLevel(sc,
        Map("GRAFT_LOG_LEVEL" -> "error")).contains("ERROR"))
      assert(rootLevel == Level.ERROR)
      // absent env var: no-op, level stays where it was
      assert(GraftSession.applyEnvLogLevel(sc, Map.empty).isEmpty)
      assert(rootLevel == Level.ERROR)
    } finally sc.setLogLevel("WARN") // restore the suite-wide default
    assert(rootLevel == Level.WARN)
  }
}
