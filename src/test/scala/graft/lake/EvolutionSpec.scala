package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.util.Scratch

/** X60 schema evolution: the widening lattice, conflict refusal, and the
  * reconciled history read.
  */
class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("widen: integral ladder, float ladder, decimal max, conflicts refused") {
    assert(Evolution.widen(IntegerType, LongType).contains(LongType))
    assert(Evolution.widen(LongType, IntegerType).contains(LongType))
    assert(Evolution.widen(ByteType, ShortType).contains(ShortType))
    assert(Evolution.widen(FloatType, DoubleType).contains(DoubleType))
    assert(Evolution.widen(DecimalType(10, 2), DecimalType(12, 4))
      .contains(DecimalType(12, 4)))
    assert(Evolution.widen(StringType, LongType).isEmpty)
    assert(Evolution.widen(LongType, DoubleType).isEmpty) // lossy, refused
    assert(Evolution.widen(StringType, StringType).contains(StringType))
  }

  test("history read reconciles added columns and widened types") {
    val dir = Scratch.dir("evo_hist")
    ManifestTable.commit(
      Seq((1, 10)).toDF("k", "v").select($"k", $"v".cast("int")), dir, 20250501, 900)
    ManifestTable.commit(
      Seq((2L, 20L, "x")).toDF("k", "v", "w")
        .select($"k".cast("int").as("k"), $"v".cast("long"), $"w"), dir, 20250501, 1000)

    val hist = Evolution.readHistory(spark, dir).orderBy("version")
    assert(hist.schema("v").dataType == LongType)
    assert(hist.schema("w").dataType == StringType)
    val rows = hist.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("v") == 10L && rows(0).getAs[String]("w") == null)
    assert(rows(1).getAs[Long]("v") == 20L && rows(1).getAs[String]("w") == "x")
  }

  test("incompatible drift throws instead of silently coercing") {
    val dir = Scratch.dir("evo_conflict")
    ManifestTable.commit(Seq((1, "a")).toDF("k", "v"), dir, 20250501, 900)
    ManifestTable.commit(Seq((2, 5L)).toDF("k", "v"), dir, 20250501, 1000)
    val e = intercept[IllegalArgumentException](Evolution.readHistory(spark, dir))
    assert(e.getMessage.contains("column v"))
  }

  test("schema audit sees the UNION of a mixed-era version's footers") {
    // An APPEND after drift produces one version whose file list mixes
    // schema eras — exactly the timeline the audit exists for. Without
    // mergeSchema the inferred schema comes from an arbitrary footer and
    // the audit would report phantom adds/removes.
    val dir = Scratch.dir("evo_mixed")
    ManifestTable.commit(Seq((1L, 10L)).toDF("k", "qty"), dir, 20250501, 900)
    ManifestTable.appendRetrying( // v2's files: {k,qty} era + {k,price} era
      Seq((2L, 1.5)).toDF("k", "price"), dir, 20250501, 1000)

    val rows = Evolution.schemaHistory(spark, dir).orderBy("version").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_cols") == 2L)
    // v2 holds BOTH eras: price appeared, qty did NOT disappear
    assert(rows(1).getAs[Long]("n_cols") == 3L)
    assert(rows(1).getAs[String]("added_cols") == "price")
    assert(rows(1).getAs[String]("removed_cols") == "")
  }

  test("X248 compat verdicts: widen=backward, narrow=none, remove=backward, add=full") {
    val dir = Scratch.dir("evo_compat")
    // v1 {k int}, v2 {k long} (widen), v3 {k long, v string} (add),
    // v4 {k int, v string} (NARROWED k — breaks backward too)
    ManifestTable.commit(Seq(1).toDF("k"), dir, 20250501, 900)
    ManifestTable.commit(Seq(1L).toDF("k"), dir, 20250501, 1000)
    ManifestTable.commit(Seq((1L, "a")).toDF("k", "v"), dir, 20250501, 1100)
    ManifestTable.commit(Seq((1, "a")).toDF("k", "v"), dir, 20250501, 1200)
    val t = Evolution.compatTransitions(spark, dir).orderBy("from_v")
      .collect().map(r => (r.getAs[Long]("from_v"), r.getAs[String]("verdict"),
        r.getAs[Long]("n_widened"), r.getAs[Long]("n_broken")))
    assert(t.toSeq == Seq(
      (1L, "backward", 1L, 0L), // int→long: new reader fine, old reader not
      (2L, "full", 0L, 0L),     // pure add: both directions fine
      (3L, "none", 0L, 1L)))    // long→int narrows: nothing can promise
  }
}
