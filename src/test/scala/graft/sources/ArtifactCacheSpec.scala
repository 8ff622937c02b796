package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Per-fixture generation cache: build exactly once per key, rebuild on
  * fixture change or artifact death — the bench-measures-queries-not-
  * ingest contract (round-12). */
class ArtifactCacheSpec extends AnyFunSuite {

  test("memo: one build per key, per-key isolation") {
    var builds = 0
    def build(): java.lang.Integer = { builds += 1; Integer.valueOf(builds) }
    val k = s"spec-memo-${System.nanoTime()}"
    assert(ArtifactCache.memo(k)(build()) == 1)
    assert(ArtifactCache.memo(k)(build()) == 1, "second invocation rebuilt")
    assert(ArtifactCache.memo(k + "-other")(build()) == 2)
    assert(builds == 2)
  }

  test("cachedBuild: skip on same key, rebuild on new key or dead artifact") {
    val dir = java.nio.file.Files.createTempDirectory("acspec").toString
    val path = s"$dir/artifact"
    var builds = 0
    ArtifactCache.cachedBuild(path, "k1") { builds += 1 }
    ArtifactCache.cachedBuild(path, "k1") { builds += 1 }
    assert(builds == 1, "same key must skip")
    ArtifactCache.cachedBuild(path, "k2") { builds += 1 }
    assert(builds == 2, "fixture change must rebuild")
    ArtifactCache.cachedBuild(path, "k2", alive = false) { builds += 1 }
    assert(builds == 3, "dead artifact (e.g. dropped catalog table) must rebuild")
    ArtifactCache.cachedBuild(path, "k2") { builds += 1 }
    assert(builds == 3, "rebuild must re-record the key")
  }

  test("fixtureKey: stable on unchanged dir, moves when a parquet changes") {
    val dir = java.nio.file.Files.createTempDirectory("acfix")
    val f = dir.resolve("t.parquet")
    java.nio.file.Files.writeString(f, "x")
    val k1 = ArtifactCache.fixtureKey(dir.toString)
    assert(k1 == ArtifactCache.fixtureKey(dir.toString))
    java.nio.file.Files.writeString(f, "xy") // size changes
    assert(k1 != ArtifactCache.fixtureKey(dir.toString))
  }
}
