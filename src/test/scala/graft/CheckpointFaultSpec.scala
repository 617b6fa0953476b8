package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes the localCheckpoint fault drill (CheckpointFaultSmoke) in a
  * child JVM: the drill needs its own `local-cluster[2,1,1024]` master,
  * which cannot coexist with the suite-shared local[*] SparkContext in
  * this JVM, and the standalone worker's executor command builder needs
  * SPARK_HOME / SPARK_SCALA_VERSION in the environment — a child
  * ProcessBuilder can set both without touching this process.
  *
  * Asserts the materialize() failure contract: after a hard executor
  * kill, a consumer of the checkpointed relation either retries to the
  * correct result or fails loudly — never returns silently wrong rows —
  * and the live lineage still recomputes correctly. See
  * ScalableCumulate.materialize scaladoc.
  */
class CheckpointFaultSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("executor loss after materialize(): retry-correct or loud, never silent-wrong") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.CheckpointFaultSmoke", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME",
      sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    // watchdog: the EOF read below blocks until the child dies, so a hung
    // drill (e.g. a stuck local-cluster) must be killed from the side or
    // this suite would hang sbt test forever
    val watchdog = new Thread(() => {
      if (!p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS))
        p.destroyForcibly()
    })
    watchdog.setDaemon(true); watchdog.start()
    // read to EOF first (avoids pipe-buffer deadlock), then reap
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val done = p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); fail(s"fault drill timed out:\n$out") }
    val faultLines = out.linesIterator.filter(_.contains("[fault]")).mkString("\n")
    assert(p.exitValue() == 0 && out.contains("[fault] PASS"),
      s"fault drill failed (exit=${p.exitValue()}):\n$faultLines\n--- tail ---\n${out.takeRight(3000)}")
  }
}
