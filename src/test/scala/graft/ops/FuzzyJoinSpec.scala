package graft.ops

import graft.SparkSpec

/** X65: deletion-neighborhood fuzzy join — the candidate equi-join must
  * be exactly as complete as the quadratic levenshtein join it replaces.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("golden: one substitution, one insertion, one deletion, no match") {
    val left = Seq((1L, "martin"), (2L, "claire"), (3L, "bob")).toDF("id", "s")
    val right = Seq((10L, "martln"), // substitution
      (20L, "clairee"), // insertion
      (30L, "bb"), // deletion (vs bob)
      (40L, "zzz") // distance > 1 from everything
    ).toDF("id", "s")
    val got = FuzzyJoin.join(left, right, "id", "s")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("no false negatives vs brute force on random perturbed strings") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc" // small alphabet → dense collisions, hard case
    val base = (1 to 60).map(_ => (1 to (3 + rnd.nextInt(5)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val strs = base.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }
    val df = strs.toDF("id", "s")
    val got = FuzzyJoin.join(df, df, "id", "s", selfJoin = true)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = Seq(m(i - 1)(j) + 1, m(i)(j - 1) + 1,
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      m(a.length)(b.length)
    }
    val expect = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("property: any single edit of any string is always found (one batched check)") {
    // 300 seeded (original, edited) pairs — every edit kind at every
    // position class — joined in ONE Spark job: each original must match
    // its own edit (and only strings at distance ≤ 1 overall)
    val rnd = new scala.util.Random(23)
    val pairs = (0 until 300).flatMap { i =>
      val s0 = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val pos = rnd.nextInt(s0.length)
      val ch = ('a' + rnd.nextInt(26)).toChar
      val edited = i % 3 match {
        case 0 => s0.updated(pos, ch) // substitute
        case 1 => s0.substring(0, pos) + ch + s0.substring(pos) // insert
        case _ => s0.substring(0, pos) + s0.substring(pos + 1) // delete
      }
      if (edited.isEmpty) None else Some((i.toLong, s0, edited))
    }
    val left = pairs.map { case (i, s0, _) => (i, s0) }.toDF("id", "s")
    val right = pairs.map { case (i, _, e) => (i, e) }.toDF("id", "s")
    val got = FuzzyJoin.join(left, right, "id", "s")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val missing = pairs.map(p => (p._1, p._1)).toSet -- got
    assert(missing.isEmpty, s"edits not found for ids: ${missing.map(_._1)}")
  }

  test("compact md5 keys give the same pairs; plan has no cartesian product") {
    val df = graft.sources.Tables.supplier(spark, sf).select("s_suppkey", "s_name")
      .limit(40)
    val plain = FuzzyJoin.join(df, df, "s_suppkey", "s_name", selfJoin = true)
    val compact = FuzzyJoin.join(df, df, "s_suppkey", "s_name",
      selfJoin = true, compactKeys = true)
    assert(plain.select("a_id", "b_id").collect().toSet ==
      compact.select("a_id", "b_id").collect().toSet)
    val plan = plain.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to a product join:\n$plan")
  }
}
