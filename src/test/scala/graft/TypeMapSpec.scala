package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.TypeMap
import graft.sinks.WarehouseSink
import graft.state.SchemaHistory

class TypeMapSpec extends AnyFunSuite with SparkFixture {

  private val schema =
    """{"type":"struct","fields":[
      |{"field":"id","type":"int64"},
      |{"field":"d","type":"int32","name":"io.debezium.time.Date"},
      |{"field":"t","type":"int64","name":"io.debezium.time.Timestamp"},
      |{"field":"z","type":"string","name":"io.debezium.time.ZonedTimestamp"},
      |{"field":"nano","type":"int64","name":"io.debezium.time.NanoTimestamp"},
      |{"field":"idt","type":"string","name":"io.debezium.time.IsoTimestamp"},
      |{"field":"it","type":"string","name":"io.debezium.time.IsoTime"},
      |{"field":"m","type":"map","values":{"type":"int64"}},
      |{"field":"j","type":"string","name":"io.debezium.data.Json"},
      |{"field":"arr","type":"array","items":{"type":"int32"}},
      |{"field":"b","type":"bytes"},
      |{"field":"g","type":"struct","name":"io.debezium.data.geometry.Geometry",
      | "fields":[{"field":"srid","type":"int32"},{"field":"wkb","type":"bytes"}]},
      |{"field":"n","type":"struct",
      | "fields":[{"field":"x","type":"int64"},{"field":"y","type":"string"}]},
      |{"field":"__ts_ms","type":"int64"},
      |{"field":"__deleted","type":"string"}
      |]}""".stripMargin

  private def oneRecord = {
    import spark.implicits._
    // 2024-01-02 = epoch day 19724; QQ== is base64("A"); wkb base64("pt")
    Seq("""{"id":7,"d":19724,"t":1704153600000,
      |"z":"2024-01-02T00:00:00.000000Z","nano":1704153600000000000,
      |"idt":"2024-01-02T00:00:00","it":"12:34:56","m":{"a":1,"b":2},
      |"j":"{\"k\":42}","arr":[1,2,3],
      |"b":"QQ==","g":{"srid":4326,"wkb":"cHQ="},
      |"n":{"x":5,"y":"hi"},"__ts_ms":1704153600000,"__deleted":"false"}"""
      .stripMargin.replace("\n", "")).toDF("value")
  }

  test("full Connect type surface maps to typed Spark columns") {
    val out = TypeMap.convert(oneRecord, schema)
    val row = out.head()
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("d") === DateType)
    assert(types("t") === TimestampType)
    assert(types("z") === TimestampType)
    assert(types("nano") === TimestampType)
    assert(types("idt") === TimestampNTZType)
    assert(types("it") === StringType) // no TIME type in Spark: ISO string
    assert(types("m") === MapType(StringType, LongType))
    assert(types("__ts_ms") === TimestampType)
    assert(types("b") === BinaryType)
    assert(types("arr") === ArrayType(LongType))
    assert(types("g") === StructType(Seq(
      StructField("srid", LongType), StructField("wkb", BinaryType))))
    assert(types("__deleted") === BooleanType)
    assert(row.getAs[java.sql.Date]("d").toString === "2024-01-02")
    assert(row.getAs[java.sql.Timestamp]("t") ===
      row.getAs[java.sql.Timestamp]("z"))
    // nano (1704153600000000000 ns) is the same instant as t (ms)
    assert(row.getAs[java.sql.Timestamp]("nano") ===
      row.getAs[java.sql.Timestamp]("t"))
    assert(row.getAs[String]("it") === "12:34:56")
    assert(row.getAs[Map[String, Long]]("m") === Map("a" -> 1L, "b" -> 2L))
    assert(new String(row.getAs[Array[Byte]]("b"), "UTF-8") === "A")
    assert(new String(row.getAs[org.apache.spark.sql.Row]("g")
      .getAs[Array[Byte]]("wkb"), "UTF-8") === "pt")
    assert(row.getAs[org.apache.spark.sql.Row]("n").getAs[Long]("x") === 5L)
    assert(row.getAs[Boolean]("__deleted") === false)
  }

  test("JSON semantic type stays queryable text") {
    val out = TypeMap.convert(oneRecord, schema)
      .select(get_json_object(col("j"), "$.k").cast("int").as("k"))
    assert(out.head().getInt(0) === 42)
  }

  test("nested-as-json mode renders plain structs as JSON, not geometry") {
    val out = TypeMap.convert(oneRecord, schema, nestedAsJson = true)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("n") === StringType)
    // geometry keeps its typed struct even in nested-as-json mode
    assert(types("g").isInstanceOf[StructType])
    val n = out.select(get_json_object(col("n"), "$.x").cast("long")).head().getLong(0)
    assert(n === 5L)
  }

  test("schema evolution against a live stored table: add + relax") {
    import spark.implicits._
    val sink = new WarehouseSink(tmpDir("wh_evolve_"))
    val hist = new SchemaHistory(tmpDir("wh_evolve_hist_") + "/h", spark)
    val v1 = Seq((1L, "a", "2024-01-01 00:00:00"))
      .toDF("id", "name", "ts").withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("part_month", WarehouseSink.monthPartition("ts"))
    sink.evolveAndAppend(spark, v1, "t", "part_month", Seq("id"), Some(hist))
    // v2 adds `score`, drops `name` (relaxed to NULL for new rows)
    val v2 = Seq((2L, 0.5, "2024-02-01 00:00:00"))
      .toDF("id", "score", "ts").withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("part_month", WarehouseSink.monthPartition("ts"))
    sink.evolveAndAppend(spark, v2, "t", "part_month", Seq("id"), Some(hist))
    val out = sink.read(spark, "t")
    assert(out.columns.toSet === Set("id", "name", "score", "ts", "part_month"))
    val rows = out.select("id", "name", "score")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(rows === Array((1L, Some("a"), None), (2L, None, Some(0.5))))
    val ddl = hist.replay()
    assert(ddl.exists(_.startsWith("CREATE TABLE t")))
    assert(ddl.exists(_.contains("ADD COLUMN score")))
  }

  test("convertWithRejects: unparseable SEMANTIC values quarantine, never throw") {
    import spark.implicits._
    val schemaJson =
      """{"type":"struct","fields":[
        |{"field":"k","type":"string","name":"io.debezium.time.ZonedTimestamp"},
        |{"field":"id","type":"int64"},
        |{"field":"note","type":"string","name":"io.debezium.time.IsoDate"}]}""".stripMargin
    val rows = Seq(
      """{"k":"2024-01-01T00:00:00Z","id":1,"note":"2024-05-05"}""",
      // k parses as a wire STRING but not as a timestamp: the required
      // check must run on the SEMANTIC value (pre-fix this merged a
      // null-keyed row, or threw under ANSI and killed the stream)
      """{"k":"not a timestamp","id":2,"note":"2024-05-05"}""",
      // garbage in a NON-required semantic field nulls out, row survives
      """{"k":"2024-02-02T00:00:00Z","id":3,"note":"not a date"}"""
    ).toDF("value")
    val out = graft.cdc.TypeMap
      .convertWithRejects(rows, schemaJson, requiredCols = Seq("k"))
      .select("id", "__rejected", "__reject_reason", "note")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.getString(2)), Option(r.getDate(3)).map(_.toString)))
      .sortBy(_._1)
    assert(out(0) === ((1L, false, None, Some("2024-05-05"))))
    assert(out(1) === ((2L, true, Some("null_required:k"), Some("2024-05-05"))))
    assert(out(2) === ((3L, false, None, None)))
  }

  test("lenient boolean accepts every spelling the strict cast does") {
    import spark.implicits._
    val schemaJson =
      """{"type":"struct","fields":[
        |{"field":"id","type":"int64"},
        |{"field":"__deleted","type":"string"}]}""".stripMargin
    // every legal Spark boolean spelling (strict cast under ANSI would
    // THROW on anything else, so legality == survives convert())
    val legal = Seq(
      """{"id":1,"__deleted":"1"}""",
      """{"id":2,"__deleted":"yes"}""",
      """{"id":3,"__deleted":"t"}""",
      """{"id":4,"__deleted":"FALSE"}""",
      """{"id":5,"__deleted":" no "}""").toDF("value")
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "__deleted").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val strict = collected(graft.cdc.TypeMap.convert(legal, schemaJson))
    val lenientOut = graft.cdc.TypeMap
      .convertWithRejects(legal, schemaJson, requiredCols = Seq("id"))
    // no legal spelling quarantines or diverges from the strict cast
    // (pre-fix: "1"/"yes"/"t" nulled out in lenient mode)
    assert(lenientOut.filter(col("__rejected")).count() === 0)
    assert(collected(lenientOut) === strict)
    assert(strict === Map(1L -> Some(true), 2L -> Some(true), 3L -> Some(true),
      4L -> Some(false), 5L -> Some(false)))
    // genuine garbage: strict mode dies (ANSI cast), lenient nulls the
    // non-required field and keeps the row
    val bad = Seq("""{"id":6,"__deleted":"maybe"}""").toDF("value")
    intercept[Exception] {
      graft.cdc.TypeMap.convert(bad, schemaJson).collect()
    }
    val badOut = graft.cdc.TypeMap
      .convertWithRejects(bad, schemaJson, requiredCols = Seq("id"))
    assert(badOut.filter(col("__rejected")).count() === 0)
    assert(collected(badOut) === Map(6L -> None))
  }

  test("convertWithRejects: a schema field named __corrupt0 is data, not the parse signal") {
    import spark.implicits._
    val schemaJson =
      """{"type":"struct","fields":[
        |{"field":"__corrupt0","type":"string"},
        |{"field":"id","type":"int64"}]}""".stripMargin
    val out = graft.cdc.TypeMap.convertWithRejects(
        Seq("""{"__corrupt0":"legit data","id":9}""").toDF("value"),
        schemaJson, requiredCols = Seq("id"))
      .select("id", "__corrupt0", "__rejected").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
      === Seq((9L, "legit data", false)))
  }

  test("ignoreUnknownFields=false quarantines extra payload keys; default drops them") {
    import spark.implicits._
    val schemaJson =
      """{"type":"struct","fields":[
        |{"field":"id","type":"int64"},
        |{"field":"name","type":"string"}]}""".stripMargin
    val rows = Seq(
      """{"id":1,"name":"ok"}""",
      """{"id":2,"name":"extra","surprise":42,"another":"x"}""",
      """not json at all""").toDF("value")
    // default mode: extra keys silently dropped (the reference's
    // ignore-unknown-fields=true), only the garbage line rejects
    val lenient = graft.cdc.TypeMap
      .convertWithRejects(rows, schemaJson, requiredCols = Seq("id"))
      .select("__rejected", "__reject_reason").collect()
      .map(r => (r.getBoolean(0), Option(r.getString(1))))
    assert(lenient.count(_._1) === 1)
    assert(lenient.flatMap(_._2).toSeq === Seq("malformed_json"))
    // strict mode: the extra-field record lands in the dead letter with
    // the offending key names; the clean record still passes
    val strict = graft.cdc.TypeMap
      .convertWithRejects(rows, schemaJson, requiredCols = Seq("id"),
        ignoreUnknownFields = false)
      .select("id", "__rejected", "__reject_reason").collect()
      .map(r => (Option(r.get(0)), r.getBoolean(1), Option(r.getString(2))))
    assert(strict.toSet === Set(
      (Some(1L), false, None),
      (Some(2L), true, Some("unknown_field:surprise,another")),
      (None, true, Some("malformed_json"))))
  }
}
