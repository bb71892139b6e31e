package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Branches and tags over the manifest lake (X95) — Iceberg-shaped named
  * refs: a TAG is an immutable pointer to a committed version (release
  * marks, audit pins); a BRANCH is a mutable pointer carrying its full
  * version LINEAGE (the chain of versions reachable from it), so two
  * branches diverge by lineage while sharing the one global manifest log
  * and all data files below it — branching copies NOTHING.
  *
  * Commits to a branch allocate the next GLOBAL version (the existing
  * two-step rename-as-commit, untouched) and then advance the ref, also
  * rename-atomic: a crash between manifest and ref publish leaves the
  * branch at its old head with one orphaned-but-valid version, never a
  * torn ref. Reads resolve ONLY through refs → manifests, so a reader
  * holding branch `exp` is isolated from `main` commits and vice versa.
  * Merging is fast-forward only (target's lineage must prefix the
  * source's): content-level three-way merge belongs to X31's keyed
  * upsert, not the ref layer — the refusal is loud, not a silent
  * overwrite.
  *
  * At scale this is pure metadata: a ref is one small JSON, reads add one
  * ref lookup to X39's single-manifest read, and no operation here
  * touches data bytes.
  */
object Branches {

  case class Ref(name: String, kind: String, lineage: Seq[Int]) {
    def head: Int = lineage.last
  }

  private def refsDir(dir: String) = s"$dir/_refs"
  private def refPath(dir: String, name: String) = s"${refsDir(dir)}/$name.json"

  private def writeRef(spark: SparkSession, dir: String, ref: Ref): Unit = {
    val fs = ManifestTable.fsFor(spark, dir)
    fs.mkdirs(new Path(refsDir(dir)))
    val json = s"""{"name": "${ref.name}", "kind": "${ref.kind}",
                  | "lineage": [${ref.lineage.mkString(", ")}]}""".stripMargin
    val tmp = new Path(refsDir(dir), s".${ref.name}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // rename-as-publish, same discipline as the manifest commit — but a
    // ref ADVANCE must atomically replace the old pointer, which plain
    // FileSystem.rename refuses (existing destination); FileContext's
    // Rename.OVERWRITE is Hadoop's atomic-replace contract for this.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(refPath(dir, ref.name)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def readRef(spark: SparkSession, dir: String, name: String): Ref = {
    val fs = ManifestTable.fsFor(spark, dir)
    val p = new Path(refPath(dir, name))
    require(fs.exists(p), s"no ref '$name' at $dir")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(text)
    Ref((j \ "name").extract[String], (j \ "kind").extract[String],
      (j \ "lineage").extract[Seq[Int]])
  }

  /** Lineage of `fromVersion` as seen from an existing ref (a prefix of
    * its lineage ending at that version), or the trivial chain for a
    * version with no branching history.
    */
  private def lineageTo(spark: SparkSession, dir: String, base: Option[Ref],
      fromVersion: Int): Seq[Int] = base match {
    case Some(r) =>
      require(r.lineage.contains(fromVersion),
        s"version $fromVersion is not on ${r.name}'s lineage")
      r.lineage.takeWhile(_ != fromVersion) :+ fromVersion
    case None => (1 to fromVersion) // linear pre-branching history
  }

  def createBranch(spark: SparkSession, dir: String, name: String,
      fromVersion: Int, fromRef: Option[String] = None): Ref = {
    val base = fromRef.map(readRef(spark, dir, _))
    val ref = Ref(name, "branch", lineageTo(spark, dir, base, fromVersion))
    writeRef(spark, dir, ref)
    ref
  }

  def createTag(spark: SparkSession, dir: String, name: String,
      atVersion: Int, fromRef: Option[String] = None): Ref = {
    val base = fromRef.map(readRef(spark, dir, _))
    val ref = Ref(name, "tag", lineageTo(spark, dir, base, atVersion))
    writeRef(spark, dir, ref)
    ref
  }

  /** Commit `df` as the next global version and advance the branch ref.
    * Tags refuse: they are immutable by contract.
    */
  def commitToBranch(df: DataFrame, dir: String, branch: String,
      date: Int, time: Int): Int = {
    val spark = df.sparkSession
    val ref = readRef(spark, dir, branch)
    require(ref.kind == "branch", s"ref '$branch' is a ${ref.kind}; tags are immutable")
    val v = ManifestTable.commit(df, dir, date, time)
    writeRef(spark, dir, ref.copy(lineage = ref.lineage :+ v))
    v
  }

  def readBranch(spark: SparkSession, dir: String, name: String): DataFrame =
    ManifestTable.readVersion(spark, dir, readRef(spark, dir, name).head)

  /** Fast-forward `target` to `source`'s head. Refuses when the target
    * has commits the source lacks (divergence) — content merging is a
    * keyed-upsert problem (X31), not a ref operation.
    */
  def fastForward(spark: SparkSession, dir: String, target: String,
      source: String): Ref = {
    val t = readRef(spark, dir, target)
    val sRef = readRef(spark, dir, source)
    require(t.kind == "branch", s"ref '$target' is a ${t.kind}")
    require(sRef.lineage.startsWith(t.lineage),
      s"'$target' and '$source' diverge: fast-forward impossible")
    val merged = t.copy(lineage = sRef.lineage)
    writeRef(spark, dir, merged)
    merged
  }

  type Q = (SparkSession, String) => DataFrame

  /** Timeline: main=v1 → branch exp → exp commits v2 → main commits v3 →
    * tag rel1 at v1. Reads through all three refs must reconstruct the
    * three predicate-defined contents — isolation in both directions.
    */
  def buildFixture(s: SparkSession, d: String): String =
    graft.util.FixtureCache.dir("branches_fixture", d) { root =>
      val dir = s"$root/t"
      val k = col("o_orderkey")
      val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
      ManifestTable.commit(ord.where(k % 3 === 0), dir, 20250810, 900)
      createBranch(s, dir, "main", 1)
      createBranch(s, dir, "exp", 1, Some("main"))
      createTag(s, dir, "rel1", 1, Some("main"))
      commitToBranch(readBranch(s, dir, "exp").unionByName(ord.where(k % 3 === 1)),
        dir, "exp", 20250810, 1000)
      commitToBranch(readBranch(s, dir, "main").unionByName(ord.where(k % 3 === 2)),
        dir, "main", 20250810, 1100)
    }

  val queries: Map[String, Q] = Map(
    "q_branch_read" -> ((s, d) => {
      val dir = s"${buildFixture(s, d)}/t"
      Seq("exp", "main", "rel1").map { r =>
        readBranch(s, dir, r).agg(
          lit(r).as("ref"),
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).cast("long").as("key_sum"))
      }.reduce(_ unionByName _)
        .select("ref", "n_rows", "key_sum")
        .orderBy("ref")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_branch_read" ->
      """WITH rows AS (
        |  SELECT 'exp' AS ref, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |  UNION ALL
        |  SELECT 'main' AS ref, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 2)
        |  UNION ALL
        |  SELECT 'rel1' AS ref, o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT ref, count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM rows GROUP BY ref ORDER BY ref""".stripMargin,
  )
}
