package graft

import org.scalatest.funsuite.AnyFunSuite

/** SELF-SEALING chaos gate (VERDICT r12 #2): the committed CHAOS_r{N}.json
  * is only a "full-surface" guarantee while it covers the CURRENT registry.
  * This spec fails the suite the moment a query registers without the
  * sweep being re-run — so the gate cannot silently go stale again
  * (dedup_url registered after the r12 sweep and shipped untested under
  * retries; that class of gap now breaks `sbt test`). */
class ChaosGateSpec extends AnyFunSuite {

  private def newest(prefix: String): Option[(String, String)] = {
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches(java.util.regex.Pattern.quote(prefix) + "\\d+\\.json"))
    if (files.isEmpty) None
    else {
      val f = files.maxBy(f => f.getName.stripPrefix(prefix).stripSuffix(".json").toInt)
      Some(f.getName -> new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }
  }

  private def newestArtifact: Option[(String, String)] = newest("CHAOS_r")

  private def intField(json: String, name: String): Option[Long] =
    s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)

  test("newest chaos artifact covers the whole current registry with zero failures") {
    newestArtifact match {
      case None => fail("no CHAOS_r*.json artifact — run tools/chaos.sh")
      case Some((fname, json)) =>
        val total = intField(json, "total")
          .getOrElse(fail(s"$fname has no total field"))
        val failed = intField(json, "failed")
          .getOrElse(fail(s"$fname has no failed field"))
        assert(failed == 0L, s"$fname records $failed failures")
        assert(total == SparkEntry.queries.size.toLong,
          s"$fname swept $total queries but the registry has " +
            s"${SparkEntry.queries.size} — re-run tools/chaos.sh (a new " +
            "registration is NOT retry-tested until the sweep reruns)")
        assert(intField(json, "injected_task_deaths").exists(_ > 0L),
          s"$fname recorded zero injected deaths — the sweep was a no-op")
    }
  }

  test("newest streaming chaos artifact covers every stateful twin with zero failures") {
    newest("CHAOS_STREAM_r") match {
      case None => fail("no CHAOS_STREAM_r*.json artifact — run tools/chaos.sh")
      case Some((fname, json)) =>
        assert(intField(json, "failed").contains(0L), s"$fname records failures")
        assert(intField(json, "total")
          .contains(graft.tools.ChaosStreamSweep.runners.size.toLong),
          s"$fname does not cover all ${graft.tools.ChaosStreamSweep.runners.size} twins")
        assert(intField(json, "injected_task_deaths").exists(_ > 0L),
          s"$fname recorded zero injected deaths — the sweep was a no-op")
    }
  }
}
