package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

/** T1–T5/T13 unit semantics against the reference's documented math
  * (FIXTURES.md §B5 expectations). */
class ScalarOpsSpec extends SparkTestBase {
  import ScalarOps._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("epochUs accepts TIMESTAMP and TIMESTAMP_NTZ and agrees (UTC session)") {
    import org.apache.spark.sql.types.TimestampNTZType
    val us = 1700000123456789L
    val tz = one(epochUs(timestamp_micros(lit(us))))
    val ntz = one(epochUs(timestamp_micros(lit(us)).cast(TimestampNTZType)))
    assert(tz == us && ntz == us)
  }

  test("T1 unit scale: 234 tenths -> 23.4 C (ref producer.c:260)") {
    assert(one(unitScale(lit(234))) == 23.4)
  }

  test("T2 two's complement: values > 0x8000 wrap (ref module_rpi_ups_hat.c:89-99)") {
    assert(one(twosComplement16(lit(0xFFFF - 99))) == -99)
    assert(one(twosComplement16(lit(1234))) == 1234)
  }

  test("T2 bus voltage: (reg >> 3) * 0.004 (ref module_rpi_ups_hat.c:130-143)") {
    assert(one(busVoltage(lit(0x2000))) == 0x400 * 0.004)
  }

  test("clamp and battPct propagate NULL (a missing reading is unknown, not 0%)") {
    // Spark's least/greatest SKIP nulls: the unguarded composition turned
    // battPct(null) into the lower bound — a fabricated "fully discharged"
    assert(one(clamp(lit(null).cast("double"), 0.0, 100.0)) == null)
    assert(one(battPct(lit(null).cast("double"))) == null)
  }

  test("T3+T4 battery pct: 8.4V -> 100, 6.0V -> 0, 7.2V -> 50, clamped outside") {
    assert(one(battPct(lit(8.4))).asInstanceOf[Double] === 100.0 +- 1e-9)
    assert(one(battPct(lit(6.0))).asInstanceOf[Double] === 0.0 +- 1e-9)
    assert(one(battPct(lit(7.2))).asInstanceOf[Double] === 50.0 +- 1e-9)
    assert(one(battPct(lit(9.9))) == 100.0)
    assert(one(battPct(lit(1.0))) == 0.0)
  }

  test("T13 charge status by sign (ref module_rpi_ups_hat.c:204-206)") {
    assert(one(chargeStatus(lit(0.5))) == "Charging")
    assert(one(chargeStatus(lit(-0.5))) == "Discharging")
    assert(one(chargeStatus(lit(0.0))) == "Discharging")
  }

  test("T5/T6 ISO-8601 round trip at second precision") {
    assert(one(isoFormat(isoParse(lit("2024-12-23T08:00:00Z")))) == "2024-12-23T08:00:00Z")
  }

  test("T8 JSON extract with 888.8 default (ref consumer.cpp:124-131)") {
    assert(one(jsonDoubleOrDefault(lit("""{"temp": 21.5}"""), "$.temp", 888.8)) == 21.5)
    assert(one(jsonDoubleOrDefault(lit("""{"other": 1}"""), "$.temp", 888.8)) == 888.8)
    assert(one(jsonDoubleOrDefault(lit("not json"), "$.temp", 888.8)) == 888.8)
  }

  test("property: clamp is idempotent and bounded over a value sweep") {
    import spark.implicits._
    val xs = (-100 to 1100 by 7).map(_ / 7.3).toDF("x")
    val bad = xs.select(
      clamp(col("x"), 0, 100).as("once"),
      clamp(clamp(col("x"), 0, 100), 0, 100).as("twice"))
      .filter(col("once") =!= col("twice") || col("once") < 0 || col("once") > 100)
    assert(bad.count() == 0)
  }

  test("T2 full register decode pipeline (FIXTURES B5 expectations)") {
    import spark.implicits._
    // one charging sample, one discharging (current reg > 0x8000)
    val raw = Seq((1L, 0x2D00, 100, 500, 250), (2L, 0x2000, 0x8000 + 100, 0xFFFF - 499, 250))
      .toDF("id", "bus_reg", "shunt_reg", "current_reg", "power_reg")
    val out = graft.streaming.Pipelines.upsDecode(raw).orderBy("id").collect()
    assert(out(0).getAs[Double]("bus_voltage") === (0x2D00 >> 3) * 0.004 +- 1e-9)
    assert(out(0).getAs[Double]("current_ma") === 50.0 +- 1e-9)
    assert(out(0).getAs[String]("status") == "Charging")
    assert(out(1).getAs[Double]("current_ma") === -49.9 +- 1.0)
    assert(out(1).getAs[String]("status") == "Discharging")
  }
}
