package graft

/** The cluster deployment route — `spark.sql.extensions=
  * graft.functions.GraftExtensions` with no programmatic registration —
  * must provide every custom function, both optimizer rules, and the
  * TopK planner strategy. Extensions are applied at SparkContext +
  * session creation, so a spec sharing the process-wide test
  * SparkContext cannot exercise config-only registration; instead this
  * forks [[graft.ExtensionsCheck]] in a fresh JVM with the same
  * classpath and JDK-17 opens and asserts it passes. */
class ExtensionsSpec extends SparkSpec {

  test("config-only GraftExtensions session passes ExtensionsCheck (fresh JVM)") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic"
    ).map(p => s"--add-opens=java.base/$p=ALL-UNNAMED") ++ Seq(
      "sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar"
    ).map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.ExtensionsCheck")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0, s"ExtensionsCheck failed (rc=$rc):\n${out.takeRight(4000)}")
    assert(out.contains("[extcheck] OK"), s"missing OK marker:\n${out.takeRight(2000)}")
  }
}
