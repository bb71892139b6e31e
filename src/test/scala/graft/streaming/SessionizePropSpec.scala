package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the interval-merge sessionizer's pure core:
  * gap sessionization is a partition into connected components, so the
  * streaming insert must agree with sort+break for EVERY arrival order
  * and every split into batches (SURVEY §5 property-test mandate).
  */
object SessionizePropSpec extends Properties("Sessionize.insert") {

  private val hourUs = 3600L * 1000000
  private val gapUs = 12L * 3600 * 1000000

  /** Ground truth: sort, then break on gaps. */
  private def sortBreak(times: Seq[Long]): List[(Long, Long, Long)] =
    times.sorted.foldLeft(List.empty[(Long, Long, Long)]) {
      case ((s0, e0, n0) :: rest, t) if t - e0 <= gapUs => (s0, t, n0 + 1) :: rest
      case (acc, t) => (t, t, 1L) :: acc
    }.reverse

  private def viaState(batches: Seq[Seq[Long]]): List[(Long, Long, Long)] = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    var st: Option[Sessionize.SessState] = None
    var out: List[Session] = Nil
    batches.foreach { b =>
      val gs = TestGroupState.create[Sessionize.SessState](
        st.map(Optional.of[Sessionize.SessState]).getOrElse(Optional.empty()),
        GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), hasTimedOut = false)
      out = Sessionize.sessionizeGroup(1L,
        b.iterator.map(us => SessEvent(1L, us, new java.sql.Timestamp(us / 1000))),
        gs).toList
      st = Some(gs.get)
    }
    out.filter(_.n_events > 0)
      .map(s => (s.t_start.getTime * 1000, s.t_end.getTime * 1000, s.n_events))
  }

  // event times land on whole milliseconds (Timestamp carries ms in this
  // encoder path) spread over ~2 weeks so merges and breaks both occur
  private val genTimes: Gen[List[Long]] =
    Gen.listOfN(40, Gen.choose(0L, 14L * 24 * hourUs / 1000).map(_ * 1000)).map(_.distinct)

  property("any arrival order + any batch split == sort+break") =
    Prop.forAll(genTimes, Gen.choose(0, 100)) { (times, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(times)
      val splitAt = if (shuffled.isEmpty) 0 else rnd.nextInt(shuffled.length + 1)
      val (b1, b2) = shuffled.splitAt(splitAt)
      viaState(Seq(b1, b2)) == sortBreak(times)
    }

  property("tombstones retract exactly the orphaned seqs") =
    Prop.forAll(genTimes) { times =>
      val sorted = times.sorted
      // batch 1 = every other event (maximizes initial fragmentation),
      // batch 2 = the rest (bridges some of them)
      val (b1, b2) = sorted.zipWithIndex.partition(_._2 % 2 == 0)
      import org.apache.spark.api.java.Optional
      import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
      val gs1 = TestGroupState.create[Sessionize.SessState](
        Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), false)
      val out1 = Sessionize.sessionizeGroup(1L,
        b1.map(_._1).iterator.map(us => SessEvent(1L, us, new java.sql.Timestamp(us / 1000))),
        gs1).toList
      val gs2 = TestGroupState.create[Sessionize.SessState](
        Optional.of(gs1.get), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), false)
      val out2 = Sessionize.sessionizeGroup(1L,
        b2.map(_._1).iterator.map(us => SessEvent(1L, us, new java.sql.Timestamp(us / 1000))),
        gs2).toList
      val live = out2.filter(_.n_events > 0)
      val tombs = out2.filter(_.n_events == 0)
      // final live sessions equal ground truth; tombstones cover exactly
      // the seqs batch 1 emitted beyond the surviving count
      live.map(s => (s.t_start.getTime * 1000, s.t_end.getTime * 1000, s.n_events)) ==
        sortBreak(times) &&
        tombs.map(_.session_seq).sorted ==
          ((live.length + 1L) to out1.count(_.n_events > 0).toLong).toList
    }
}
