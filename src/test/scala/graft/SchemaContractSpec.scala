package graft

import org.apache.spark.sql.types._
import graft.queries.T

/** Guards against driver-side testdata schema drift (the round-6 killer:
  * events.ts silently flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and 14
  * declared queries died on an analysis error). T.t now normalizes the ts
  * column on either shape and pins every table's loaded schema; this
  * suite loads all 10 tables at both SFs so any future regeneration fails
  * HERE with a named diff, not downstream.
  */
class SchemaContractSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("all 10 tables load under the pinned schema contract at both SFs") {
    for (dir <- Seq(sf0001, sf001); tbl <- tables) {
      val df = T.t(spark, dir, tbl) // checkContract runs inside t()
      assert(df.schema.fieldNames.nonEmpty, s"$dir/$tbl")
    }
  }

  test("events.ts normalizes to TimestampType from nanos-long, NTZ and TZ") {
    import spark.implicits._
    val ntz = T.t(spark, sf0001, "events")
    assert(ntz.schema("ts").dataType == TimestampType)

    // nanos-as-long shape (the pre-r6 testdata): 1.5ms → 1500µs floor
    val longDf = Seq((1L, 1500999L * 1000L)).toDF("event_id", "ts")
    val fromLong = T.normalizeEventTs(longDf)
    assert(fromLong.schema("ts").dataType == TimestampType)
    assert(fromLong.select("ts").head.getTimestamp(0).getTime == 1500L)

    // already-TimestampType shape passes through unchanged
    val tsDf = ntz.limit(1)
    assert(T.normalizeEventTs(tsDf).schema("ts").dataType == TimestampType)
  }

  test("contract violation fails with a named diff") {
    import spark.implicits._
    val bad = Seq((1, "x")).toDF("r_regionkey", "r_name")
      .withColumn("r_name", org.apache.spark.sql.functions.lit(7L))
    val e = intercept[IllegalArgumentException] {
      T.checkContract("region", bad.schema)
    }
    assert(e.getMessage.contains("SchemaContract[region]"))
    assert(e.getMessage.contains("r_name"))

    val missing = Seq(1).toDF("r_regionkey")
    val e2 = intercept[IllegalArgumentException] {
      T.checkContract("region", missing.schema)
    }
    assert(e2.getMessage.contains("columns"))
  }

  test("unsupported ts type names the drift instead of an analysis error") {
    import spark.implicits._
    val weird = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      T.normalizeEventTs(weird)
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
