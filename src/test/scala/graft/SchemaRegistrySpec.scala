package graft

import org.apache.spark.sql.types.{IntegerType, LongType}

/** Per-type frozen schema inference (reference src/main.cpp:302-317). */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def ragged() = {
    val events = Seq(
      (1L, 1000000000L, 1L, "alpha", 1.0, """{"x": 1, "y": "a"}"""),
      (2L, 2000000000L, 1L, "alpha", 1.0, """{"x": 2, "y": "b", "late": 9}"""),
      (3L, 3000000000L, 2L, "beta", 2.0, """{"z": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    tempSfDir("events" -> events)
  }

  test("catalog bound: a type-cardinality blowout refuses loudly instead " +
      "of collecting an unbounded sample table to the driver") {
    // event_type with a leaked id: every row its own "type"
    val blown = (1L to 50L).map(i =>
        (i, i * 1000000000L, 1L, s"type_$i", 1.0, """{"x": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> blown)
    val ev = operators.EventOps.events(spark, dir)
    val e = intercept[IllegalArgumentException] {
      SchemaRegistry.build(ev, maxTypes = 10)
    }
    assert(e.getMessage.contains("distinct event types"))
    // at the bound (or raised deliberately) the same corpus builds fine
    assert(SchemaRegistry.build(ev, maxTypes = 50)("type_7")
      .fieldNames.sameElements(Array("x")))
  }

  test("schema frozen at first sight: later keys don't widen the type") {
    val reg = SchemaRegistry.build(
      operators.EventOps.events(spark, ragged()))
    assert(reg("alpha").fieldNames.sorted.sameElements(Array("x", "y")))
    assert(reg("beta").fieldNames.sameElements(Array("z")))
    // the 'late' key from event 2 must NOT appear — schema came from event 1
    assert(!reg("alpha").fieldNames.contains("late"))
  }

  test("decode applies the per-type schema; decodeAll pads ragged rows") {
    val dir = ragged()
    val ev = operators.EventOps.events(spark, dir)
    val reg = SchemaRegistry.build(ev)
    val alpha = reg.decode(ev, "alpha")
      .select($"event_id", $"props_struct.x", $"props_struct.y").collect()
    assert(alpha.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet ==
      Set((1L, 1L, "a"), (2L, 2L, "b")))
    val all = reg.decodeAll(ev)
      .select($"event_id", $"props_struct.x", $"props_struct.z").collect()
    // beta row has null x; alpha rows have null z (UI ragged padding)
    val betaRow = all.find(_.getLong(0) == 3L).get
    assert(betaRow.isNullAt(1) && betaRow.getLong(2) == 5L)
    val alphaRow = all.find(_.getLong(0) == 1L).get
    assert(alphaRow.getLong(1) == 1L && alphaRow.isNullAt(2))
  }

  test("nested props: ArrayType and StructType inferred and decoded") {
    import org.apache.spark.sql.functions.element_at
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val events = Seq(
      (1L, 1000000000L, 1L, "gamma", 1.0,
        """{"tags": [1, 2, 3], "m": {"a": 7, "b": "x"}}"""),
      (2L, 2000000000L, 1L, "gamma", 1.0,
        """{"tags": [4], "m": {"a": 8, "b": "y"}}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val ev = operators.EventOps.events(spark, dir)
    val reg = SchemaRegistry.build(ev)
    val st = reg("gamma")
    assert(st("tags").dataType.isInstanceOf[ArrayType])
    assert(st("m").dataType.isInstanceOf[StructType])
    val rows = reg.decode(ev, "gamma")
      .select($"event_id", element_at($"props_struct.tags", 1).as("t1"),
        $"props_struct.m.a".as("a"), $"props_struct.m.b".as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSet == Set((1L, 1L, 7L, "x"), (2L, 4L, 8L, "y")))
  }

  test("bare-string payload type (P7): inferred as string, decoded to message") {
    val events = Seq(
      (1L, 1000000000L, 1L, "note", 1.0, "\"hello world\""),
      (2L, 2000000000L, 1L, "note", 1.0, "\"second note\""),
      (3L, 3000000000L, 2L, "alpha", 2.0, """{"x": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val ev = operators.EventOps.events(spark, dir)
    val reg = SchemaRegistry.build(ev)
    assert(reg.stringTypes == Set("note"))
    assert(reg.schemas.keySet == Set("alpha"))
    val msgs = reg.decode(ev, "note")
      .select($"event_id", $"message").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(msgs == Set((1L, "hello world"), (2L, "second note")))
  }

  test("decodeAll collision: same name, different types widens deterministically") {
    import org.apache.spark.sql.types.{DoubleType, StringType}
    // Three event types all declare "code", each with a different type:
    // long (alpha), double (beta), string (gamma). The merged schema must
    // take the widest common readable type regardless of map order —
    // long+double → double; double+string → string.
    val events = Seq(
      (1L, 1000000000L, 1L, "alpha", 1.0, """{"code": 7, "n": 1}"""),
      (2L, 2000000000L, 1L, "beta", 1.0, """{"code": 2.5}"""),
      (3L, 3000000000L, 2L, "gamma", 2.0, """{"code": "X9"}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev = operators.EventOps.events(spark, tempSfDir("events" -> events))
    val reg = SchemaRegistry.build(ev)
    // Per-type schemas stay frozen and untouched by the merge.
    assert(reg("alpha")("code").dataType == LongType)
    assert(reg("beta")("code").dataType == DoubleType)
    assert(reg("gamma")("code").dataType == StringType)
    val all = reg.decodeAll(ev)
      .select($"event_id", $"props_struct.code".as("code")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // String is the merged type: every row decodes to its raw JSON text,
    // none nulls out.
    assert(all == Map(1L -> "7", 2L -> "2.5", 3L -> "X9"))
  }

  test("decodeAll collision: numeric ladder long+double stays numeric") {
    import org.apache.spark.sql.types.DoubleType
    val events = Seq(
      (1L, 1000000000L, 1L, "alpha", 1.0, """{"v": 7}"""),
      (2L, 2000000000L, 1L, "beta", 1.0, """{"v": 2.5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev = operators.EventOps.events(spark, tempSfDir("events" -> events))
    val all = SchemaRegistry.build(ev).decodeAll(ev)
    assert(all.select($"props_struct.v").schema.head.dataType == DoubleType)
    val vals = all.select($"event_id", $"props_struct.v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vals == Map(1L -> 7.0, 2L -> 2.5))
  }

  test("decodeAll collision: struct fields merge recursively by name") {
    val events = Seq(
      (1L, 1000000000L, 1L, "alpha", 1.0, """{"m": {"a": 1}}"""),
      (2L, 2000000000L, 1L, "beta", 1.0, """{"m": {"b": "x"}}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev = operators.EventOps.events(spark, tempSfDir("events" -> events))
    val all = SchemaRegistry.build(ev).decodeAll(ev)
      .select($"event_id", $"props_struct.m.a".as("a"),
        $"props_struct.m.b".as("b")).collect()
    val alphaRow = all.find(_.getLong(0) == 1L).get
    val betaRow = all.find(_.getLong(0) == 2L).get
    // Union of nested field sets with null padding, same as the top level.
    assert(alphaRow.getLong(1) == 1L && alphaRow.isNullAt(2))
    assert(betaRow.isNullAt(1) && betaRow.getString(2) == "x")
  }

  test("widen is commutative and associative over the inferred lattice") {
    import org.apache.spark.sql.types._
    val types = Seq(LongType, DoubleType, StringType, BooleanType,
      DecimalType(20, 0), DecimalType(10, 4), ArrayType(LongType),
      StructType(Seq(StructField("a", LongType))),
      StructType(Seq(StructField("a", DoubleType), StructField("b", StringType))))
    for (a <- types; b <- types) {
      assert(SchemaRegistry.widen(a, b) == SchemaRegistry.widen(b, a),
        s"commutativity failed for ($a, $b)")
      for (c <- types)
        assert(
          SchemaRegistry.widen(SchemaRegistry.widen(a, b), c) ==
            SchemaRegistry.widen(a, SchemaRegistry.widen(b, c)),
          s"associativity failed for ($a, $b, $c)")
    }
  }

  test("registry on the real corpus: k inferred as integral for all types") {
    val reg = SchemaRegistry.build(
      operators.EventOps.events(spark, sf))
    assert(reg.schemas.keySet ==
      Set("click", "view", "error", "signup", "purchase"))
    reg.schemas.values.foreach { st =>
      assert(st.fieldNames.sameElements(Array("k")))
      assert(st("k").dataType == LongType || st("k").dataType == IntegerType)
    }
  }
}
