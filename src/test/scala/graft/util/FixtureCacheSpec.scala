package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** The cross-JVM durable fixture layer (round-9 ask #3): opt-in flag,
  * marker-gated adoption, fingerprint isolation. Pure filesystem — no
  * Spark session needed.
  */
class FixtureCacheSpec extends AnyFunSuite {

  private def withDurable[T](body: => T): T = {
    System.setProperty("graft.fixture.durable", "1")
    try body
    finally System.clearProperty("graft.fixture.durable")
  }

  private val sfKey = s"fixspec://${System.nanoTime()}"

  test("durable dir: build once, marker written, fresh-JVM adoption skips the build") {
    withDurable {
      var builds = 0
      def build(dir: String): Unit = {
        builds += 1
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, "payload.txt"), "x".getBytes)
      }
      val d1 = FixtureCache.durableDir("fixspec_a", sfKey, "v1")(build)
      assert(builds == 1)
      assert(new java.io.File(d1, "_GRAFT_FIXTURE_OK").isFile)
      assert(new java.io.File(d1, "payload.txt").isFile)
      // same JVM: memo hit
      assert(FixtureCache.durableDir("fixspec_a", sfKey, "v1")(build) == d1)
      assert(builds == 1)
      // simulated fresh JVM: empty memo + durable dir present → adopted
      FixtureCache.clearForTest()
      assert(FixtureCache.durableDir("fixspec_a", sfKey, "v1")(build) == d1)
      assert(builds == 1, "adoption must not rebuild")
    }
  }

  test("fingerprint change is a different directory (never a reuse)") {
    withDurable {
      var builds = 0
      def build(dir: String): Unit = { builds += 1 }
      val d1 = FixtureCache.durableDir("fixspec_b", sfKey, "v1")(build)
      FixtureCache.clearForTest()
      val d2 = FixtureCache.durableDir("fixspec_b", sfKey, "v2")(build)
      assert(builds == 2)
      assert(d1 != d2)
    }
  }

  test("flag off: falls back to per-JVM scratch (correctness gate never reuses)") {
    assert(System.getProperty("graft.fixture.durable") == null)
    val d = FixtureCache.durableDir("fixspec_c", sfKey, "v1")(_ => ())
    assert(!d.contains("graft_fixture_cache"),
      s"without the opt-in flag the durable root must not be used: $d")
  }

  test("torn build (no marker) is rebuilt, not adopted") {
    withDurable {
      var builds = 0
      val d1 = FixtureCache.durableDir("fixspec_d", sfKey, "v1")(_ => builds += 1)
      // simulate a killed JVM: marker gone, dir remains
      assert(new java.io.File(d1, "_GRAFT_FIXTURE_OK").delete())
      FixtureCache.clearForTest()
      val d2 = FixtureCache.durableDir("fixspec_d", sfKey, "v1")(_ => builds += 1)
      assert(builds == 2, "a torn durable dir must rebuild")
      assert(new java.io.File(d2, "_GRAFT_FIXTURE_OK").isFile)
    }
  }
}
