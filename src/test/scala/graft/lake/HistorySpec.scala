package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X54 SCD2 history: run-collapse goldens, tie-breaking, interval chaining,
  * and the one-shuffle plan pin.
  */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private val cols = Seq("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")

  test("golden: A A B A collapses to three chained intervals") {
    val df = Seq(
      (1L, 10L, ts(1), "A"),
      (1L, 11L, ts(2), "A"),
      (1L, 12L, ts(3), "B"),
      (1L, 13L, ts(4), "A"),
    ).toDF(cols: _*)
    val out = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").orderBy("version").collect()

    assert(out.length == 3)
    assert(out.map(_.getAs[String]("o_orderstatus")).toSeq == Seq("A", "B", "A"))
    assert(out.map(_.getAs[Long]("n_rows")).toSeq == Seq(2L, 1L, 1L))
    // Each interval closes at the next run's start; the last is open.
    assert(out(0).getAs[Timestamp]("valid_from") == ts(1))
    assert(out(0).getAs[Timestamp]("valid_to") == ts(3))
    assert(out(1).getAs[Timestamp]("valid_to") == ts(4))
    assert(out(2).getAs[Timestamp]("valid_to") == null)
    assert(out.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
  }

  test("same-date ties break on the orderkey tiebreaker deterministically") {
    val df = Seq(
      (1L, 20L, ts(1), "A"),
      (1L, 21L, ts(1), "B"), // same date, higher key → second
    ).toDF(cols: _*)
    val out = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").orderBy("version").collect()
    assert(out.map(_.getAs[String]("o_orderstatus")).toSeq == Seq("A", "B"))
  }

  test("single-state key is one current interval; keys are independent") {
    val df = Seq(
      (1L, 30L, ts(1), "A"),
      (1L, 31L, ts(5), "A"),
      (2L, 32L, ts(2), "B"),
    ).toDF(cols: _*)
    val out = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    assert(out.size == 2)
    assert(out(1L).getAs[Long]("n_rows") == 2L)
    assert(out(1L).getAs[Boolean]("is_current"))
    assert(out(2L).getAs[Boolean]("is_current"))
  }

  test("plan pin: windows and aggregate share ONE exchange on the key") {
    val df = graft.sources.Tables.orders(spark, sf)
    val plan = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  // --- X164 point-in-time join ---

  private def pitFixture() = {
    // key 1: status A on days 1-2 (two obs), B from day 5 onward
    val obs = Seq((1L, ts(1), 101L, "A"), (1L, ts(2), 102L, "A"),
      (1L, ts(5), 103L, "B"))
      .toDF("k", "t", "tie", "st")
    History.scd2(obs, "k", Seq("t", "tie"), "st", "t")
  }

  private def pit(facts: Seq[(Long, Timestamp)]): Map[Timestamp, String] = {
    val f = facts.toDF("k", "ft")
    History.pitJoin(f, pitFixture(), "k", "ft", "st")
      .collect().map(r => r.getAs[Timestamp]("ft") -> r.getAs[String]("st")).toMap
  }

  test("pit join: facts pick the interval CONTAINING their timestamp, [from, to) at boundaries") {
    val got = pit(Seq((1L, ts(1)), (1L, ts(3)), (1L, ts(5)), (1L, ts(9))))
    assert(got(ts(1)) === "A")
    assert(got(ts(3)) === "A", "inside [1, 5): still A — a latest-status join would say B")
    assert(got(ts(5)) === "B", "boundary belongs to the NEW interval")
    assert(got(ts(9)) === "B", "open current interval")
  }

  test("pit join: facts before the first interval (or for unknown keys) drop") {
    val f = Seq((1L, Timestamp.valueOf("2023-12-25 00:00:00")), (99L, ts(3)))
      .toDF("k", "ft")
    assert(History.pitJoin(f, pitFixture(), "k", "ft", "st").count() === 0L)
  }

  // --- X165 incremental SCD2 maintenance ---

  test("scd2 incremental: init + apply equals the full rebuild bit-for-bit") {
    val root = graft.util.Scratch.dir("scd2_incr_spec")
    val o = graft.sources.Tables.orders(spark, sf)
    val cut = to_date(lit("1998-01-01"))
    History.scd2Init(o.where(col("o_orderdate").cast("date") < cut),
      "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", root, 20250601, 900)
    History.scd2Apply(o.where(col("o_orderdate").cast("date") >= cut),
      "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", root, 20250601, 930)
    val inc = History.scd2Read(spark, root)
      .select(col("o_custkey"), col("version"), col("state"),
        col("valid_from"), col("n_rows"), col("valid_to"))
      .orderBy("o_custkey", "version").collect().map(_.toString).toSeq
    val full = History.scd2(o, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate")
      .select(col("o_custkey"), col("version"), col("o_orderstatus"),
        col("valid_from"), col("n_rows"), col("valid_to"))
      .orderBy("o_custkey", "version").collect().map(_.toString).toSeq
    assert(inc === full)
    // the closed table only ever APPENDS: batch-2 files are a superset
    val snaps = ManifestTable.snapshots(spark, s"$root/closed")
    assert(snaps.size === 2 && snaps.head.files.toSet.subsetOf(snaps.last.files.toSet))
  }

  test("scd2 incremental: late observations refuse loudly; untouched keys keep their tails") {
    val root = graft.util.Scratch.dir("scd2_late_spec")
    val init = Seq((1L, ts(5), 1L, "A"), (2L, ts(3), 2L, "B"))
      .toDF("k", "t", "tie", "st")
    History.scd2Init(init, "k", "t", "tie", "st", root, 20250601, 900)
    // a batch row at key 1 BEFORE its absorbed day-5 observation
    val late = Seq((1L, ts(4), 9L, "A")).toDF("k", "t", "tie", "st")
    val e = intercept[IllegalArgumentException](
      History.scd2Apply(late, "k", "t", "tie", "st", root, 20250601, 930))
    assert(e.getMessage.contains("late"))
    // a clean batch touching only key 1 (and a brand-new key 3)
    History.scd2Apply(Seq((1L, ts(8), 9L, "C"), (3L, ts(8), 10L, "A"))
      .toDF("k", "t", "tie", "st"), "k", "t", "tie", "st", root, 20250601, 940)
    val out = History.scd2Read(spark, root).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("state"),
        r.getAs[Boolean]("is_current"))).toSet
    assert(out === Set((1L, "A", false), (1L, "C", true),
      (2L, "B", true), (3L, "A", true)))
  }

  test("scd2 incremental: replay after a crash between the closed append and the catalog publish lands exactly once") {
    val root = graft.util.Scratch.dir("scd2_crash_spec")
    val init = Seq((1L, ts(1), 1L, "A"), (1L, ts(2), 2L, "A"))
      .toDF("k", "t", "tie", "st")
    History.scd2Init(init, "k", "t", "tie", "st", root, 20250601, 900)
    val batch = Seq((1L, ts(5), 3L, "B")).toDF("k", "t", "tie", "st")
    // Simulate the crashed first attempt: its closed-table append landed
    // on the table log (committed but unreferenced by any catalog cut),
    // the catalog publish did not. The orphan carries EXACTLY the rows
    // the replay will close — the duplicate-on-replay shape.
    val orphan = Seq((1L, 1L, "A", ts(1), 2L, ts(5)))
      .toDF("k", "version", "state", "valid_from", "n_rows", "valid_to")
    ManifestTable.appendRetrying(orphan, s"$root/closed", 20250601, 930)
    // the replay re-runs the full apply
    History.scd2Apply(batch, "k", "t", "tie", "st", root, 20250601, 931)
    val out = History.scd2Read(spark, root)
    assert(out.where(!col("is_current")).count() === 1L,
      "closed A-run must appear once — the orphaned append must not be stacked on")
    assert(out.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("state"),
      r.getAs[Boolean]("is_current"))).toSet ===
      Set((1L, "A", false), (1L, "B", true)))
  }

  test("scd2 reopen: rebases on the catalog-referenced closed version, never an orphaned log-latest") {
    val root = graft.util.Scratch.dir("scd2_reopen_orphan")
    val init = Seq((1L, ts(1), 1L, "A"), (1L, ts(3), 2L, "B"),
      (2L, ts(1), 3L, "X")).toDF("k", "t", "tie", "st")
    History.scd2Init(init, "k", "t", "tie", "st", root, 20250601, 900)
    // A crashed/CAS-refused scd2Apply left this committed-but-UNREFERENCED
    // closed append as closed log-latest: it closes key 2's X run, but
    // key 2's tail is still OPEN in the published cut — a reopen that
    // tombstoned/rebased on log-latest would re-reference these files and
    // publish a duplicate, contradictory run (round-7 ADVICE).
    val orphan = Seq((2L, 1L, "X", ts(1), 1L, ts(9)))
      .toDF("k", "version", "state", "valid_from", "n_rows", "valid_to")
    ManifestTable.appendRetrying(orphan, s"$root/closed", 20250601, 930)
    // late data reopens key 1 only
    val reopenObs = Seq((1L, ts(1), 1L, "A"), (1L, ts(2), 10L, "C"),
      (1L, ts(3), 2L, "B")).toDF("k", "t", "tie", "st")
    History.scd2Reopen(reopenObs, "k", "t", "tie", "st", root, 20250601, 940)
    val out = History.scd2Read(spark, root)
    val k2 = out.where(col("k") === 2L).collect()
    assert(k2.length === 1 && k2.head.getAs[Boolean]("is_current"),
      s"orphaned closed run re-published: ${k2.mkString(",")}")
    assert(out.where(col("k") === 1L).collect()
      .map(r => (r.getAs[String]("state"), r.getAs[Boolean]("is_current"))).toSet ===
      Set(("A", false), ("C", false), ("B", true)))
  }

  test("scd2 apply: shuffle fallback path (maxBroadcastKeys=0) agrees with the broadcast path bit-for-bit") {
    val o = graft.sources.Tables.orders(spark, sf)
    val cut = to_date(lit("1998-01-01"))
    def build(maxB: Long): Seq[String] = {
      val root = graft.util.Scratch.dir(s"scd2_bb_$maxB")
      History.scd2Init(o.where(col("o_orderdate").cast("date") < cut),
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", root, 20250601, 900)
      History.scd2Apply(o.where(col("o_orderdate").cast("date") >= cut),
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", root, 20250601, 930,
        maxBroadcastKeys = maxB)
      History.scd2Read(spark, root)
        .orderBy("o_custkey", "version").collect().map(_.toString).toSeq
    }
    assert(build(0L) === build(4000000L))
  }

  test("scd2 apply: a raced concurrent apply refuses with nothing visible committed") {
    val root = graft.util.Scratch.dir("scd2_race")
    History.scd2Init(Seq((1L, ts(1), 1L, "A")).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 900)
    // writer B lands between A's tail read and A's publish — simulate by
    // publishing an interleaved cut (any catalog advance loses A the CAS)
    History.scd2Apply(Seq((2L, ts(2), 2L, "B")).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 910)
    val before = Catalog.snapshots(spark, root).last
    // A replays against a stale pre-advance read: force it by publishing
    // B's cut first, then checking A's CAS refusal via publishCatalog
    val e = intercept[IllegalStateException](
      Catalog.publishCatalog(spark, root, 20250601, 920,
        Map("tail" -> 1), expectBase = Some(before.version - 1)))
    assert(e.getMessage.contains("advanced past expected base"))
    // nothing visible moved: the latest cut is still B's
    assert(Catalog.snapshots(spark, root).last.version === before.version)
    assert(History.scd2Read(spark, root).count() === 2L)
  }

  test("scd2 reopen: a late batch lands via per-key rebuild and equals the full rebuild; untouched keys' files are byte-identical") {
    val root = graft.util.Scratch.dir("scd2_reopen_spec")
    // key 1: A(1) A(2) B(5) with the day-2 A held out; key 2 untouched
    val full = Seq((1L, ts(1), 1L, "A"), (1L, ts(2), 2L, "A"), (1L, ts(5), 3L, "B"),
      (2L, ts(3), 4L, "X"), (2L, ts(4), 5L, "Y"))
    val heldOut = Seq(full(1))
    val init = full.filterNot(heldOut.contains)
    History.scd2Init(init.toDF("k", "t", "tie", "st"), "k", "t", "tie", "st",
      root, 20250601, 900)
    // late arrival refuses through the apply path…
    val e = intercept[IllegalArgumentException](History.scd2Apply(
      heldOut.toDF("k", "t", "tie", "st"), "k", "t", "tie", "st", root, 20250601, 920))
    assert(e.getMessage.contains("late"))
    val closedFilesBefore = ManifestTable.snapshots(spark, s"$root/closed").last.files
    // …and lands through reopen with key 1's COMPLETE history
    History.scd2Reopen(full.filter(_._1 == 1L).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 930)
    val got = History.scd2Read(spark, root)
      .orderBy("k", "version").collect().map(_.toString).toSeq
    val rebuildRoot = graft.util.Scratch.dir("scd2_reopen_full")
    History.scd2Init(full.toDF("k", "t", "tie", "st"), "k", "t", "tie", "st",
      rebuildRoot, 20250601, 900)
    val want = History.scd2Read(spark, rebuildRoot)
      .orderBy("k", "version").collect().map(_.toString).toSeq
    assert(got === want)
    // the reopen rewrote NO pre-existing data file: old closed files are
    // all still in the new manifest (tombstoned rows, not rewritten bytes)
    val closedAfter = ManifestTable.snapshots(spark, s"$root/closed").last
    assert(closedFilesBefore.toSet.subsetOf(closedAfter.files.toSet))
    assert(closedAfter.deletes.nonEmpty, "old runs die by deletion vector")
  }

  test("scd2 reopen: an over-bound key count refuses with nothing committed") {
    val root = graft.util.Scratch.dir("scd2_reopen_bound")
    History.scd2Init(Seq((1L, ts(1), 1L, "A"), (2L, ts(1), 2L, "B"))
      .toDF("k", "t", "tie", "st"), "k", "t", "tie", "st", root, 20250601, 900)
    val before = Catalog.snapshots(spark, root).last.version
    // a "backfill" touching more keys than the bound allows
    val wide = (1L to 5L).map(k => (k, ts(2), 10L + k, "C"))
      .toDF("k", "t", "tie", "st")
    val e = intercept[IllegalArgumentException](History.scd2Reopen(
      wide, "k", "t", "tie", "st", root, 20250601, 930, maxReopenKeys = 3))
    assert(e.getMessage.contains("full rebuild"))
    assert(Catalog.snapshots(spark, root).last.version === before,
      "refusal must leave the catalog where it was")
  }

  test("pit join: a same-day status flip yields the LATER run (empty interval filtered)") {
    // A and B both start day 3: A's interval is [3, 3) = empty
    val obs = Seq((1L, ts(3), 1L, "A"), (1L, ts(3), 2L, "B"))
      .toDF("k", "t", "tie", "st")
    val dim = History.scd2(obs, "k", Seq("t", "tie"), "st", "t")
    val got = History.pitJoin(Seq((1L, ts(3))).toDF("k", "ft"), dim, "k", "ft", "st")
      .collect()
    assert(got.length === 1 && got.head.getAs[String]("st") === "B")
  }
}
