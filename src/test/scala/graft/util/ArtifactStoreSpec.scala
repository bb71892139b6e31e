package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Committed driver-side artifacts (round-10 ask #4): the scalar twin of
  * the durable fixture layer. Pins the cold-JVM reuse contract — a fresh
  * process (simulated by clearing the in-JVM memo) READS the committed
  * lines instead of re-running the distributed build — plus bit-exact
  * codec round-trips for every payload shape the call sites persist
  * (prefix structures with and without splits, centroid matrices).
  */
class ArtifactStoreSpec extends AnyFunSuite {

  private def withDurable[T](body: => T): T = {
    System.setProperty("graft.fixture.durable", "1")
    try body
    finally System.clearProperty("graft.fixture.durable")
  }

  private val sfKey = s"artspec://${System.nanoTime()}"

  test("cold-JVM reuse: second (memo-cleared) fetch decodes the committed file, no rebuild") {
    withDurable {
      var builds = 0
      def fetch() = ArtifactStore.lines("artspec_a", sfKey, "v1") {
        builds += 1
        Seq("42", "", "1,2,3")
      }
      assert(fetch() == Seq("42", "", "1,2,3"))
      assert(builds == 1)
      FixtureCache.clearForTest() // a fresh JVM is exactly this state
      assert(fetch() == Seq("42", "", "1,2,3"))
      assert(builds == 1, "the committed artifact must be read, not rebuilt")
    }
  }

  test("prefix-structure codec round-trips bit-exactly (incl. empty splits)") {
    val st = graft.ops.DenseId.PrefixStructure(
      Array(1.5, -2.25, 1e17 + 1), Seq(0L, 7L, Long.MaxValue - 3), 123456789L)
    val back = ArtifactStore.decodePrefix(ArtifactStore.encodePrefix(st))
    assert(back.splits.toSeq == st.splits.toSeq)
    assert(back.offsets == st.offsets)
    assert(back.total == st.total)

    val single = graft.ops.DenseId.PrefixStructure(Array.empty, Seq(0L), 5L)
    val back1 = ArtifactStore.decodePrefix(ArtifactStore.encodePrefix(single))
    assert(back1.splits.isEmpty && back1.offsets == Seq(0L) && back1.total == 5L)
  }

  test("long-matrix codec round-trips (quantizer centroid shape)") {
    val m = Array(Array(1L, -2L, 3L), Array(Long.MinValue, 0L, Long.MaxValue))
    val back = ArtifactStore.decodeMatrix(ArtifactStore.encodeMatrix(m))
    assert(back.length == 2 && back(0).toSeq == m(0).toSeq && back(1).toSeq == m(1).toSeq)
  }

  test("flag off: lines still build-and-return via per-JVM scratch (correctness gate unaffected)") {
    assert(System.getProperty("graft.fixture.durable") == null)
    var builds = 0
    val got = ArtifactStore.lines("artspec_b", sfKey, "v1") {
      builds += 1; Seq("a", "b")
    }
    assert(got == Seq("a", "b") && builds == 1)
  }
}
