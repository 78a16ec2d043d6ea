package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Stamp
import graft.streaming.MemoryTable

final case class ToolInfo(tool: String, team: String, updated: Timestamp)

/** Specs for the memory enrichment table (sink + source + join faces,
  * TTL) and the metadata-stamp / trace-unwrap operators.
  */
class MemoryTableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("tool", StringType), StructField("team", StringType),
    StructField("updated", TimestampType)))

  test("memory table: streaming upserts are last-write-wins per key") {
    val mt = new MemoryTable(spark, schema, Seq("tool"), "updated")
    val input = MemoryStream[ToolInfo](spark)
    val q = input.toDF().writeStream.outputMode("append")
      .foreachBatch(mt.sink).start()
    try {
      input.addData(
        ToolInfo("search", "infra", ts("2024-01-01 00:00:00")),
        ToolInfo("code", "devx", ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      input.addData(ToolInfo("search", "platform", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      val snap = mt.snapshot.orderBy("tool").collect()
      assert(snap.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("code", "devx"), ("search", "platform")))
    } finally q.stop()
  }

  test("memory table: same-timestamp re-upsert wins (generation tie-break)") {
    val mt = new MemoryTable(spark, schema, Seq("tool"), "updated")
    mt.upsert(Seq(ToolInfo("search", "infra", ts("2024-01-01 00:00:00"))).toDF())
    mt.upsert(Seq(ToolInfo("search", "platform", ts("2024-01-01 00:00:00"))).toDF())
    assert(mt.snapshot.select("team").as[String].collect().toSeq == Seq("platform"))
  }

  test("memory table: 500 upserts stay flat (lineage truncated per merge)") {
    val mt = new MemoryTable(spark, schema, Seq("tool"), "updated")
    // without localCheckpoint each merge's plan nests the previous one
    // and the analyzer stack-overflows long before 500 generations
    (1 to 500).foreach { i =>
      mt.upsert(Seq(
        ToolInfo(s"tool_${i % 25}", s"team_$i", ts("2024-01-01 00:00:00"))).toDF())
    }
    val snap = mt.snapshot.collect()
    assert(snap.length == 25)
    assert(snap.map(_.getString(1)).forall(_.stripPrefix("team_").toInt > 475))
  }

  test("memory table: TTL expiry and enrichment join") {
    val mt = new MemoryTable(spark, schema, Seq("tool"), "updated",
      ttlSecs = Some(3600))
    mt.upsert(Seq(
      ToolInfo("old", "gone", ts("2024-01-01 00:00:00")),
      ToolInfo("search", "infra", ts("2024-01-01 01:30:00"))).toDF())
    mt.expire(ts("2024-01-01 02:00:00"))
    assert(mt.snapshot.select("tool").as[String].collect().toSeq == Seq("search"))

    val events = Seq(("e1", "search"), ("e2", "unknown")).toDF("id", "tool")
    val enriched = mt.enrich(events).select("id", "team").orderBy("id").collect()
    assert(enriched.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("e1", "infra"), ("e2", null)))
  }

  test("stamp: metadata columns and trace unwrap") {
    val df = Seq(("c1", "t-9", "s-1")).toDF("conv_id", "trace_id", "span_id")
    val stamped = Stamp.withMetadata(df, Map("az" -> "us-east-1a", "iid" -> "i-123"))
    val row = stamped.select("az", "iid").head
    assert((row.getString(0), row.getString(1)) == ("us-east-1a", "i-123"))
    assert(Stamp.traceToLog(stamped).columns.toSet ==
      Set("conv_id", "az", "iid"))
  }
}
