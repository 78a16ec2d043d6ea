package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The statsd/DogStatsD wire codec (reference
  * src/sources/statsd/parser.rs): `<key>:<value>|<type>[|@<rate>][|#<tags>]`
  *
  *   - `c`  → incremental counter, value scaled by 1/rate;
  *   - `ms` → incremental distribution (histogram statistic), value
  *     converted ms→seconds (the source's default ConversionUnit),
  *     sample weight = round(1/rate);
  *   - `h`  → incremental distribution (histogram), no conversion;
  *   - `d`  → incremental distribution (summary statistic);
  *   - `g`  → absolute gauge, or incremental signed gauge when the
  *     value has an explicit `+`/`-` prefix (parser.rs:100-123);
  *   - `s`  → incremental set; the flat metric model stores NUMERIC
  *     values, so non-numeric set members parse to null and are
  *     dropped (documented model narrowing, not silent coercion).
  *
  * Key sanitization (parser.rs:181-189, on by default in the source):
  * `/`→`-`, whitespace→`_`, then every char outside
  * `[a-zA-Z_\-0-9.]` removed. DogStatsD tags `#k:v,bare` render into
  * the canonical sorted `k=v` tag string with bare tags as `k=`
  * (TagValue::Bare); duplicate tag keys are all kept, like the
  * reference's multi-value tag sets.
  *
  * Everything is codegen'd Column arithmetic — one narrow projection
  * per line, no UDFs.
  */
object StatsdCodec {

  /** Sampling component: `1 / rate` with rate 0 sanitized to 1
    * (parser.rs sanitize_sampling).
    */
  private def rateOf(sampling: Column): Column = {
    val parsed = substring(sampling, 2, 1000000).try_cast("double")
    lit(1.0) / coalesce(nullif(parsed, lit(0.0)), lit(1.0))
  }

  private def sanitizeKey(c: Column): Column =
    regexp_replace(
      regexp_replace(translate(c, "/", "-"), "\\s+", "_"),
      "[^a-zA-Z_\\-0-9.]", "")

  /** Parses one statsd line into a struct with the flat-model fields
    * plus `weight` (distribution sample multiplicity). Null when the
    * line is malformed (no `:`, fewer than two `|` parts, unknown
    * type, unparseable value) — the caller's drop channel.
    */
  /** The shared intermediate columns both entry points feed into
    * [[assemble]]: [[parse]] composes them inline (one Column tree),
    * [[withParsed]] stages each as a real projection column.
    */
  private final case class Parts(key: Column, raw: Column, mtype: Column,
                                 nparts: Column, sampling: Column,
                                 tagsPart: Column, rate: Column, num: Column,
                                 signed: Column, gaugeNum: Column)

  /** One source of truth for the statsd semantics: the five type arms,
    * tag rendering, gauge sign handling, and the malformed gate — over
    * whatever form the intermediates take.
    */
  private def assemble(p: Parts, sanitize: Boolean,
                       timersToSeconds: Boolean): Column = {
    val name = if (sanitize) sanitizeKey(p.key) else p.key
    // "#k:v,bare" → sorted multiset of "k=v" / "bare=" strings
    val tags = when(p.tagsPart.isNotNull, array_join(
      sort_array(transform(
        split(substring(p.tagsPart, 2, 1000000), ","),
        t => when(t.contains(":"),
          concat(regexp_extract(t, "^([^:]*):", 1), lit("="),
            regexp_extract(t, "^[^:]*:(.*)$", 1)))
          .otherwise(concat(t, lit("="))))), ","))
    val msScale = if (timersToSeconds) lit(0.001) else lit(1.0)
    def m(kind: Column, vt: String, value: Column, weight: Column) = struct(
      name.as("name"), kind.as("kind"), lit(vt).as("value_type"),
      value.as("value"), tags.as("tags"), weight.as("weight"))
    val one = lit(1L)
    // `sample_rate as u32` (parser.rs:94) TRUNCATES toward zero, not
    // rounds: @0.4 -> 1/0.4 = 2.5000..4 -> weight 2. Rust's float->u32
    // `as` SATURATES below zero, so @2 -> 1/2 = 0.5 -> weight 0 (zero
    // samples) and a negative rate also clamps to 0 — callers must
    // gate their sample explode on weight >= 1.
    val distW = greatest(floor(p.rate), lit(0.0)).cast("long")
    val parsed =
      when(p.mtype === "c", m(lit("incremental"), "counter", p.num * p.rate, one))
        .when(p.mtype === "ms",
          m(lit("incremental"), "distribution", p.num * msScale, distW))
        .when(p.mtype === "h" || p.mtype === "d",
          m(lit("incremental"), "distribution", p.num, distW))
        .when(p.mtype === "g",
          m(when(p.signed, "incremental").otherwise("absolute"), "gauge",
            p.gaugeNum, one))
        .when(p.mtype === "s", m(lit("incremental"), "set", p.num, one))
    // malformed → null: missing ':', short body, bad number
    when(length(p.key) > 0 && p.nparts >= 2 && parsed.getField("value").isNotNull,
      parsed)
  }

  def parse(line: Column, sanitize: Boolean = true,
            timersToSeconds: Boolean = true): Column = {
    val key = regexp_extract(line, "^([^:]*):(.*)$", 1)
    val body = regexp_extract(line, "^([^:]*):(.*)$", 2)
    val parts = split(body, "\\|")
    val rawVal = element_at(parts, 1)
    val p3 = when(size(parts) >= 3, element_at(parts, 3))
    val p4 = when(size(parts) >= 4, element_at(parts, 4))
    val sampling = when(p3.startsWith("@"), p3)
    val num = rawVal.try_cast("double")
    // gauges: explicit sign prefix = incremental delta (parse_direction)
    val signed = rawVal.rlike("^[+-]")
    assemble(Parts(
      key = key,
      raw = rawVal,
      mtype = element_at(parts, 2),
      nparts = size(parts),
      sampling = sampling,
      tagsPart = coalesce(
        when(sampling.isNull && p3.startsWith("#"), p3),
        when(sampling.isNotNull && p4.startsWith("#"), p4)),
      rate = coalesce(when(sampling.isNotNull, rateOf(sampling)), lit(1.0)),
      num = num,
      signed = signed,
      gaugeNum = when(signed,
        substring(rawVal, 2, 1000000).try_cast("double") *
          when(rawVal.startsWith("-"), -1.0).otherwise(1.0))
        .otherwise(num)), sanitize, timersToSeconds)
  }

  /** STAGED form of [[parse]] for bulk decode: [[parse]] composes one
    * Column tree, and the Column DSL has no sharing — every reference
    * to an intermediate (`parts`, `body`, the input line) re-embeds its
    * whole subtree, multiplying through the layers to ~450 regex
    * evaluations PER ROW in the final plan (codegen subexpression
    * elimination can't recover them: most sit under conditional
    * branches). This form stages each shared intermediate as a real
    * projection column across successive selects; Catalyst's
    * CollapseProject keeps a non-cheap producer that is consumed more
    * than once, so each regex/split runs ONCE per row (~8 total).
    * Adds `outCol` (same struct as [[parse]]) and drops the stage
    * columns. Same null-on-malformed contract.
    */
  def withParsed(df: org.apache.spark.sql.DataFrame, line: Column,
                 outCol: String, sanitize: Boolean = true,
                 timersToSeconds: Boolean = true): org.apache.spark.sql.DataFrame = {
    val u = "__statsd_"
    def c(n: String) = col(u + n)
    val s1 = df.withColumn(u + "line", line)
    val s2 = s1.withColumns(Map(
      u + "key" -> regexp_extract(c("line"), "^([^:]*):(.*)$", 1),
      u + "body" -> regexp_extract(c("line"), "^([^:]*):(.*)$", 2)))
    val s3 = s2.withColumn(u + "parts", split(c("body"), "\\|"))
    val s4 = s3.withColumns(Map(
      u + "raw" -> element_at(c("parts"), 1),
      u + "mtype" -> element_at(c("parts"), 2),
      u + "p3" -> when(size(c("parts")) >= 3, element_at(c("parts"), 3)),
      u + "p4" -> when(size(c("parts")) >= 4, element_at(c("parts"), 4)),
      u + "nparts" -> size(c("parts"))))
    val s5 = s4.withColumns(Map(
      u + "sampling" -> when(c("p3").startsWith("@"), c("p3")),
      u + "num" -> c("raw").try_cast("double"),
      u + "signed" -> c("raw").rlike("^[+-]")))
    val s6 = s5.withColumns(Map(
      u + "tagsPart" -> coalesce(
        when(c("sampling").isNull && c("p3").startsWith("#"), c("p3")),
        when(c("sampling").isNotNull && c("p4").startsWith("#"), c("p4"))),
      u + "rate" -> coalesce(when(c("sampling").isNotNull, rateOf(c("sampling"))),
        lit(1.0)),
      u + "gaugeNum" -> when(c("signed"),
        substring(c("raw"), 2, 1000000).try_cast("double") *
          when(c("raw").startsWith("-"), -1.0).otherwise(1.0))
        .otherwise(c("num"))))
    val s7 = s6.withColumn(outCol, assemble(Parts(
      key = c("key"), raw = c("raw"), mtype = c("mtype"),
      nparts = c("nparts"), sampling = c("sampling"),
      tagsPart = c("tagsPart"), rate = c("rate"), num = c("num"),
      signed = c("signed"), gaugeNum = c("gaugeNum")),
      sanitize, timersToSeconds))
    s7.drop(Seq("line", "key", "body", "parts", "raw", "mtype", "p3", "p4",
      "nparts", "sampling", "num", "signed", "tagsPart", "rate",
      "gaugeNum").map(u + _): _*)
  }
}
