package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.util.Scratch

/** X156 Avro container round-trip: type fidelity across every supported
  * type (nulls included), per-partition file parallelism, cross-reader
  * compatibility of the logical-type encodings, unsupported-type refusal.
  */
class AvroSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("ts", TimestampType),
    StructField("dt", DateType)))

  private def mkTs(s: String, nanos: Int): java.sql.Timestamp = {
    val t = java.sql.Timestamp.valueOf(s); t.setNanos(nanos); t
  }

  private val rows = Seq(
    Row(1L, 2, 3.5, 4.25f, true, "plain", Array[Byte](1, 2, 3),
      mkTs("2024-03-01 10:30:00", 123456000), java.sql.Date.valueOf("2024-03-01")),
    // every field null — the union(null, T) branch
    Row(null, null, null, null, null, null, null, null, null),
    // quoting/comma/unicode hazards + a pre-epoch date and sub-second ts
    Row(-9L, -1, -0.0, Float.MinPositiveValue, false, "a,\"b\"\né",
      Array[Byte](), mkTs("1969-12-31 23:59:59", 999999000),
      java.sql.Date.valueOf("1969-12-31")))

  test("avro: all supported types round-trip exactly, nulls included") {
    val dir = Scratch.dir("avro_spec")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    assert(Avro.write(df, s"$dir/a") === 2) // one container per non-empty partition
    val back = Avro.read(spark, s"$dir/a", schema)
    // Row.toString renders binary columns by reference — normalize them
    def norm(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => b.mkString("<", ",", ">")
      case x              => String.valueOf(x)
    }.mkString("|")
    assert(back.collect().map(norm).sorted.toSeq === rows.map(norm).sorted)
  }

  test("avro: timestamp encodes as timestamp-micros readable by a plain avro reader") {
    val dir = Scratch.dir("avro_micros")
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.take(1), 1), schema)
    Avro.write(df, s"$dir/a")
    val f = new java.io.File(s"$dir/a").listFiles().filter(_.getName.endsWith(".avro")).head
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      f, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val rec = r.next(); r.close()
    // 2024-03-01T10:30:00.123456Z in micros since epoch (UTC session zone)
    val expectedMicros = java.time.LocalDateTime.parse("2024-03-01T10:30:00.123456")
      .toInstant(java.time.ZoneOffset.UTC)
    assert(rec.get("ts") === expectedMicros.getEpochSecond * 1000000L + 123456L)
    // logical types declared in the writer schema (any conforming reader maps them)
    val tsField = rec.getSchema.getField("ts").schema().getTypes.get(1)
    assert(tsField.getLogicalType.getName === "timestamp-micros")
    assert(rec.getSchema.getField("dt").schema().getTypes.get(1)
      .getLogicalType.getName === "date")
  }

  test("avro: unsupported column types are refused loudly") {
    val bad = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val e = intercept[IllegalArgumentException](Avro.avroSchema(bad))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("avro: non-nullable fields build a defaultless non-union schema and round-trip") {
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val avro = Avro.avroSchema(s) // a null default on a non-union would throw here
    assert(avro.getField("id").schema().getType === org.apache.avro.Schema.Type.LONG)
    assert(!avro.getField("id").hasDefaultValue)
    assert(avro.getField("name").schema().getType === org.apache.avro.Schema.Type.UNION)
    val dir = Scratch.dir("avro_nonnull")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, null)), 1), s)
    Avro.write(df, s"$dir/a")
    assert(Avro.read(spark, s"$dir/a", s).collect().map(_.toString).sorted
      === Array("[1,a]", "[2,null]"))
  }

  test("avro: empty partitions write no file and read back empty") {
    val dir = Scratch.dir("avro_empty")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 3), schema)
    assert(Avro.write(df, s"$dir/a") === 0)
    assert(Avro.read(spark, s"$dir/a", schema).count() === 0L)
  }
}
