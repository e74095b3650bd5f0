package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's stdout expecting ONE JSON line; rounds 6
  * and 7 both came back `parsed: null` because Spark log noise shared
  * the stream. The fix is a classpath log4j2.properties that pins the
  * root logger to stderr — this spec locks that contract in-repo.
  */
class BenchContractSpec extends AnyFunSuite {

  test("log4j2.properties is on the classpath and targets SYSTEM_ERR") {
    val res = getClass.getClassLoader.getResourceAsStream("log4j2.properties")
    assert(res != null, "log4j2.properties missing from classpath")
    val text = new String(res.readAllBytes())
    assert(text.contains("target = SYSTEM_ERR"),
      "console appender must write to stderr, stdout is the bench contract")
    assert(!text.contains("SYSTEM_OUT"))
  }

  test("live log4j routes through the stderr appender") {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appenders = ctx.getConfiguration.getAppenders
    import scala.jdk.CollectionConverters._
    val consoles = appenders.values.asScala.collect {
      case c: org.apache.logging.log4j.core.appender.ConsoleAppender => c
    }
    assert(consoles.nonEmpty, "expected a console appender")
    consoles.foreach { c =>
      assert(c.getTarget == org.apache.logging.log4j.core.appender.ConsoleAppender.Target.SYSTEM_ERR,
        s"appender ${c.getName} writes to ${c.getTarget}, must be SYSTEM_ERR")
    }
  }
}
