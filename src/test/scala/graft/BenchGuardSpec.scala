package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's baseline contamination guard, pinned directly (r14
  * verdict item 1: the driver-gate run shipped `reruns:[]` with a query
  * at 8× its baseline because the guard's file never resolved from the
  * driver's cwd — an inert guard is indistinguishable from a clean run
  * in the artifact).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("a poisoned draw fires the baseline guard; a clean one does not") {
    val baseline = Map("v9_multiquery_funnel" -> 0.29, "p3_pack" -> 0.5)
    // the r14 driver-gate shape: v9 at 8.1x its quiet-machine min
    val poisoned = Seq("v9_multiquery_funnel" -> 2.37, "p3_pack" -> 0.7)
    assert(Bench.slowVsBaseline(poisoned, baseline, 1.5) ==
      Seq("v9_multiquery_funnel"))
    val clean = Seq("v9_multiquery_funnel" -> 0.35, "p3_pack" -> 0.6)
    assert(Bench.slowVsBaseline(clean, baseline, 1.5).isEmpty)
    // boundary: exactly slack x the min is NOT flagged (strict >);
    // 0.5 * 1.5 = 0.75 is exactly representable
    assert(Bench.slowVsBaseline(
      Seq("p3_pack" -> 0.75), baseline, 1.5).isEmpty)
    // a query with no baseline entry can never flag (new queries must
    // not block the gate before the next baseline refresh)
    assert(Bench.slowVsBaseline(
      Seq("brand_new_query" -> 99.0), baseline, 1.5).isEmpty)
  }

  test("the baseline file resolves from the repo root via the classpath anchor") {
    // sbt's test JVM runs with cwd = repo root, so this also covers the
    // cwd candidate; the classpath candidate is what holds when the
    // driver launches from an arbitrary cwd.
    val f = Bench.resolveBaselineFile()
    assert(f.isDefined, "BENCH_baseline_local.json must resolve (it is " +
      "committed at the repo root; if this fails the guard is inert)")
    assert(f.get.getName == "BENCH_baseline_local.json")
    // the classpath anchor alone must also produce a live candidate:
    // derive it the way Bench does and check the file is there
    val viaClasspath = System.getProperty("java.class.path", "")
      .split(java.io.File.pathSeparatorChar).toSeq
      .filter(_.replace('\\', '/').endsWith("target/scala-2.13/classes"))
      .flatMap { p =>
        Option(new java.io.File(p).getParentFile)
          .flatMap(d => Option(d.getParentFile))
          .flatMap(d => Option(d.getParentFile))
          .map(root => new java.io.File(root, "BENCH_baseline_local.json"))
      }
    assert(viaClasspath.exists(_.isFile),
      s"classpath anchor must find the baseline, candidates: $viaClasspath")
  }
}
