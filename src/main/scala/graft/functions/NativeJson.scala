package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector's `native_json` codec (SURVEY.md §2.8 row 46) — the engine's
  * own event interchange format: a one-arm envelope `{"log": {...}}` /
  * `{"metric": {...}}` / `{"trace": {...}}` with the metric arm
  * carrying exactly one value variant (counter/gauge/set/distribution/
  * aggregated_histogram/aggregated_summary). Reference:
  * lib/codecs/src/{encoding,decoding}/format/native_json.rs and the
  * corpus under lib/codecs/tests/data/native_encoding/json/ (the spec
  * decodes that corpus directly).
  *
  * Numeric caveat, stated: u64 histogram/set counts parse into
  * DECIMAL(20,0) (full u64 range); float metric values are doubles —
  * the same "lossy" trade the reference's deserializer option makes.
  * The binary `native` codec is the protobuf form of the same model —
  * [[NativeProto]] decodes/encodes it over the ProtoWire kernel and is
  * spec-proven equivalent to this json form on the reference's paired
  * fixture corpus.
  */
object NativeJson {

  private val u64 = DataTypes.createDecimalType(20, 0)

  /** Full metric-arm schema (value.rs:20-95 variants). */
  val metricSchema: StructType = StructType(Seq(
    StructField("name", StringType), StructField("namespace", StringType),
    StructField("timestamp", StringType), StructField("interval_ms", LongType),
    StructField("kind", StringType),
    StructField("counter", StructType(Seq(StructField("value", DoubleType)))),
    StructField("gauge", StructType(Seq(StructField("value", DoubleType)))),
    StructField("set", StructType(Seq(
      StructField("values", ArrayType(StringType))))),
    StructField("distribution", StructType(Seq(
      StructField("samples", ArrayType(StructType(Seq(
        StructField("value", DoubleType), StructField("rate", LongType))))),
      StructField("statistic", StringType)))),
    StructField("aggregated_histogram", StructType(Seq(
      StructField("buckets", ArrayType(StructType(Seq(
        StructField("upper_limit", DoubleType), StructField("count", u64))))),
      StructField("count", u64), StructField("sum", DoubleType)))),
    StructField("aggregated_summary", StructType(Seq(
      StructField("quantiles", ArrayType(StructType(Seq(
        StructField("quantile", DoubleType), StructField("value", DoubleType))))),
      StructField("count", u64), StructField("sum", DoubleType)))),
    // MetricValue::Sketch — the mergeable DDSketch arm (value.rs:20-95);
    // the engine-side aggregate for this is SketchExpressions.DDSketchQuantiles
    StructField("sketch", StructType(Seq(
      StructField("sketch", StructType(Seq(
        StructField("AgentDDSketch", StructType(Seq(
          StructField("bins", StructType(Seq(
            StructField("k", ArrayType(LongType)),
            StructField("n", ArrayType(LongType))))),
          StructField("count", u64), StructField("min", DoubleType),
          StructField("max", DoubleType), StructField("sum", DoubleType),
          StructField("avg", DoubleType)))))))))),
    StructField("tags", MapType(StringType, StringType))))

  /** Envelope schema: exactly one arm non-null. `log`/`trace` arms stay
    * as raw JSON text (their fields are schemaless by design — Kind::
    * json() in the reference) for downstream `from_json`/variant use.
    */
  def envelopeSchema(logSchema: DataType = MapType(StringType, StringType)): StructType =
    StructType(Seq(
      StructField("log", logSchema),
      StructField("metric", metricSchema),
      StructField("trace", MapType(StringType, StringType))))

  /** Decode a native_json line. `logSchema` types the log arm (default:
    * flat string map — pass a StructType for typed fields).
    */
  def decode(c: Column, logSchema: DataType = MapType(StringType, StringType)): Column =
    from_json(c, envelopeSchema(logSchema))

  /** Which arm an encoded line carries ("log"/"metric"/"trace"). */
  def eventKind(c: Column): Column =
    when(get_json_object(c, "$.log").isNotNull, "log")
      .when(get_json_object(c, "$.metric").isNotNull, "metric")
      .when(get_json_object(c, "$.trace").isNotNull, "trace")
      .otherwise(lit(null).cast("string"))

  /** Encode a log event from typed field columns: {"log": {fields}}.
    * to_json drops null fields — absent keys, like the reference.
    */
  def encodeLog(fields: Seq[(String, Column)]): Column =
    to_json(struct(struct(fields.map { case (n, c) => c.as(n) }: _*).as("log")))

  /** Encode one metric row (the `Metrics.logToMetric` shape: name,
    * tags, kind, value_type, value) as native_json. Counter/gauge carry
    * `value`; `set` carries the stringified value as a one-element set;
    * `distribution` a single (value, rate=1) sample — the row-level
    * forms the reference emits before aggregation.
    */
  def encodeMetric(name: Column, tags: Column, kind: Column,
                   valueType: Column, value: Column): Column = {
    val counter = when(valueType === "counter",
      struct(value.as("value")))
    val gauge = when(valueType === "gauge", struct(value.as("value")))
    val set = when(valueType === "set",
      struct(array(value.cast("string")).as("values")))
    val dist = when(valueType === "distribution" || valueType === "dist",
      struct(array(struct(value.as("value"), lit(1L).as("rate"))).as("samples"),
        lit("histogram").as("statistic")))
    to_json(struct(struct(
      name.as("name"), kind.as("kind"),
      counter.as("counter"), gauge.as("gauge"), set.as("set"),
      dist.as("distribution"), tags.as("tags")).as("metric")))
  }
}
