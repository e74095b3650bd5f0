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

  test("end-to-end: sbt-forked Bench emits a bare unprefixed JSON line on stdout") {
    // Rounds 6-8 all shipped `parsed: null` driver artifacts: first from
    // log noise sharing stdout, then from sbt's logger prefixing the
    // forked JVM's stdout with "[info] ". This launches the REAL
    // incantation (sbt runMain through the fork) on a 1-query subset at
    // sf0.001 and asserts the JSON line arrives verbatim.
    import scala.sys.process._
    val out = new StringBuilder
    val logger = ProcessLogger(line => out.append(line).append('\n'), _ => ())
    val cmd = Seq("sbt", "-batch", "-Dsbt.server.autostart=false", "runMain graft.Bench")
    val env = Seq(
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_ONLY" -> "q01_pricing_summary",
      "SPARK_GRAFT_CPUS" -> "4")
    val exit = Process(cmd, new java.io.File("."), env: _*).!(logger)
    val lines = out.toString.linesIterator.toVector
    assert(exit == 0, s"sbt runMain graft.Bench exited $exit\n${lines.takeRight(20).mkString("\n")}")
    val jsonLines = lines.filter(_.contains("\"metric\":\"total\""))
    assert(jsonLines.nonEmpty, "no bench JSON line on stdout")
    val last = jsonLines.last
    assert(last.startsWith("{"),
      s"bench JSON line must be unprefixed bare JSON, got: ${last.take(80)}")
    assert(last.trim.endsWith("}"))
    assert(last.contains("\"q01_pricing_summary\""))
  }

  test("parseSnapshot recovers the per-query map from a bench.json line") {
    val line = """{"metric":"total","value":12.3,"unit":"sec","queries":{"q01_pricing_summary":0.51,"q59_dup_clusters":2.064},"sf":"/x","loadavg_start":"0.5 0.4 0.3"}"""
    val m = Bench.parseSnapshot(line)
    assert(m == Map("q01_pricing_summary" -> 0.51, "q59_dup_clusters" -> 2.064))
    assert(Bench.parseSnapshot("garbage").isEmpty)
  }

  test("contamination verdict flags diffuse total-wall drift, not just per-query blowouts") {
    // Round 11's driver artifact: loadavg 2.06, total +17%, q154 at
    // 3.7x idle — but only ONE query crossed the 3x line, so the old
    // >=3-blowouts rule published `contaminated: false`. The total-wall
    // guard (shared total > 1.25x shared idle total) must catch it.
    val idle = Map("qa" -> 3.0, "qb" -> 4.0, "qc" -> 5.0, "qd" -> 8.0)

    // healthy run: mild noise, under both thresholds
    assert(!Bench.contaminationVerdict(
      Seq("qa" -> 3.2, "qb" -> 4.1, "qc" -> 5.3, "qd" -> 8.2), idle, hotStart = false))

    // round-11 shape: one 3x+ blowout, everything else +10-20% -> total
    // drift crosses 1.25x even though per-query blowouts stay at 1
    assert(Bench.contaminationVerdict(
      Seq("qa" -> 11.0, "qb" -> 4.8, "qc" -> 6.0, "qd" -> 9.5), idle, hotStart = false))

    // classic shape: >=3 per-query blowouts still flags on its own
    assert(Bench.contaminationVerdict(
      Seq("qa" -> 10.0, "qb" -> 13.0, "qc" -> 16.0, "qd" -> 8.0), idle, hotStart = false))

    // 1-query subset pass (BenchContractSpec's own e2e case): shared
    // idle under the 5 s floor -> sub-second noise can never flag
    assert(!Bench.contaminationVerdict(
      Seq("qa" -> 4.4), Map("qa" -> 3.0), hotStart = false))

    // no snapshot at all: flag conservatively only under a hot start
    assert(Bench.contaminationVerdict(Seq("qa" -> 1.0), Map.empty, hotStart = true))
    assert(!Bench.contaminationVerdict(Seq("qa" -> 1.0), Map.empty, hotStart = false))

    // queries with no snapshot entry (new this round) never count
    // toward the drift ratio
    assert(!Bench.contaminationVerdict(
      Seq("qa" -> 3.1, "qnew" -> 99.0), Map("qa" -> 3.0, "qb" -> 4.0, "qc" -> 5.0), hotStart = false))
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
