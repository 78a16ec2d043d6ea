package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VRL long-tail parsers (SURVEY.md §2.7 row 58) — the log-centric
  * functions a migrating user greps for first. Reference behavior:
  * website/cue/reference/remap/functions/{parse_tokens, parse_bytes,
  * parse_linux_authorization, parse_aws_alb_log, parse_aws_vpc_flow_log,
  * parse_aws_cloudwatch_log_subscription_message, parse_etld}.cue.
  * All Column-composed (regexp/split/transform — codegen'd, no UDFs);
  * the tokenizer-grade ones (cbor, ruby_hash, punycode, mime_q) live in
  * `org.apache.spark.sql.graftvec.StringExpressions`.
  */
object VrlParsers {

  // ---------------------------------------------------------- tokens

  /** One token: a double-quoted string (escapes allowed), a bracketed
    * group, or a bare word.
    */
  private val tokenRe = "\"(?:\\\\.|[^\"\\\\])*\"|\\[[^\\]]*\\]|\\S+"

  /** `parse_tokens!(s)` → array<string> (parse_tokens.cue): quoted
    * tokens are unquoted + unescaped, bracketed tokens lose the
    * brackets, bare words pass through.
    */
  def parseTokens(c: Column): Column =
    transform(regexp_extract_all(c, lit(tokenRe), lit(0)), t =>
      when(t.startsWith("\""),
        regexp_replace(t.substr(lit(2), length(t) - 2), "\\\\(.)", "$1"))
        .when(t.startsWith("["), t.substr(lit(2), length(t) - 2))
        .otherwise(t))

  // ---------------------------------------------------------- linux auth

  private val monthMap: Column = {
    val pairs = Seq("Jan" -> "01", "Feb" -> "02", "Mar" -> "03", "Apr" -> "04",
      "May" -> "05", "Jun" -> "06", "Jul" -> "07", "Aug" -> "08",
      "Sep" -> "09", "Oct" -> "10", "Nov" -> "11", "Dec" -> "12")
    map(pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
  }

  private val authRe =
    "^([A-Z][a-z]{2}) +(\\d{1,2}) (\\d{2}:\\d{2}:\\d{2}) (\\S+) ([^\\[:]+?)(?:\\[(\\d+)\\])?: (.*)$"

  /** `parse_linux_authorization!(s)` (parse_linux_authorization.cue):
    * RFC3164-style auth.log line → struct(appname, hostname, message,
    * procid, timestamp). The source format carries no year — the
    * reference assumes the current year; here it's an explicit
    * parameter so results are deterministic. The timestamp is an ISO
    * string (timestamp-column oracle portability, TranscriptSql.fmtIso
    * convention).
    */
  def parseLinuxAuthorization(c: Column, year: Int = 2024): Column = {
    def g(i: Int) = regexp_extract(c, authRe, i)
    val ts = concat(lit(f"$year%04d-"), element_at(monthMap, g(1)), lit("-"),
      lpad(g(2), 2, "0"), lit("T"), g(3), lit("Z"))
    when(g(4) === "", lit(null)).otherwise(struct(
      g(5).as("appname"),
      g(4).as("hostname"),
      g(7).as("message"),
      when(g(6) === "", lit(null).cast("long"))
        .otherwise(g(6).try_cast("long")).as("procid"),
      ts.as("timestamp")))
  }

  // ---------------------------------------------------------- AWS ALB

  /** ALB token: a quoted span or a bare field. */
  private val albTokenRe = "\"[^\"]*\"|\\S+"

  /** `parse_aws_alb_log!(line)` (parse_aws_alb_log.cue) — the
    * AWS-documented access-log field order (type through
    * classification_reason, 29 fields). `-` / `"-"` → null; the quoted
    * request splits into method/url/protocol; the two list fields split
    * on space. Struct output, codegen-friendly (one regexp_extract_all
    * + positional getItem).
    */
  def parseAwsAlbLog(c: Column): Column = {
    val toks = regexp_extract_all(c, lit(albTokenRe), lit(0))
    // strip surrounding quotes; "-" and empty → null
    def tok(i: Int): Column = {
      // try_element_at + try_cast: a truncated/older-format line (fewer
      // than 29 tokens, or garbage in a numeric slot) must yield null
      // fields — the caller's raise channel — not an ANSI-mode job abort.
      val raw = try_element_at(toks, lit(i + 1))
      val unq = when(raw.startsWith("\""),
        regexp_replace(raw, "^\"|\"$", "")).otherwise(raw)
      when(unq === "-" || unq === "", lit(null).cast("string")).otherwise(unq)
    }
    def num(i: Int): Column = tok(i).try_cast("double")
    def lng(i: Int): Column = tok(i).try_cast("long")
    def lst(i: Int): Column =
      when(tok(i).isNull, array().cast("array<string>"))
        .otherwise(split(tok(i), " "))
    val request = tok(12)
    struct(
      tok(0).as("type"), tok(1).as("timestamp"), tok(2).as("elb"),
      tok(3).as("client_host"), tok(4).as("target_host"),
      num(5).as("request_processing_time"),
      num(6).as("target_processing_time"),
      num(7).as("response_processing_time"),
      tok(8).as("elb_status_code"), tok(9).as("target_status_code"),
      lng(10).as("received_bytes"), lng(11).as("sent_bytes"),
      regexp_extract(request, "^(\\S+) (\\S+) (\\S+)$", 1).as("request_method"),
      regexp_extract(request, "^(\\S+) (\\S+) (\\S+)$", 2).as("request_url"),
      regexp_extract(request, "^(\\S+) (\\S+) (\\S+)$", 3).as("request_protocol"),
      tok(13).as("user_agent"), tok(14).as("ssl_cipher"),
      tok(15).as("ssl_protocol"), tok(16).as("target_group_arn"),
      tok(17).as("trace_id"), tok(18).as("domain_name"),
      tok(19).as("chosen_cert_arn"), tok(20).as("matched_rule_priority"),
      tok(21).as("request_creation_time"), tok(22).as("actions_executed"),
      tok(23).as("redirect_url"), tok(24).as("error_reason"),
      lst(25).as("target_port_list"), lst(26).as("target_status_code_list"),
      tok(27).as("classification"), tok(28).as("classification_reason"))
  }

  // ---------------------------------------------------------- VPC flow

  /** The v2 default format (parse_aws_vpc_flow_log.cue). */
  val VpcFlowDefaultFormat: String =
    "version account_id interface_id srcaddr dstaddr srcport dstport protocol packets bytes start end action log_status"

  private val vpcIntFields = Set("version", "srcport", "dstport", "protocol",
    "packets", "bytes", "start", "end", "tcp_flags", "traffic_path")

  /** `parse_aws_vpc_flow_log!(line, format)` — space-separated fields
    * zipped with the caller's format string (any field order, v2-v5
    * names); `-` → null; the numeric fields cast to long.
    */
  def parseAwsVpcFlowLog(c: Column, format: String = VpcFlowDefaultFormat): Column = {
    val names = format.split(' ')
    val toks = split(c, " ")
    val fields = names.zipWithIndex.map { case (name, i) =>
      // try_element_at/try_cast: short or malformed lines → null fields,
      // not an ANSI-mode array-index/cast job abort
      val raw = try_element_at(toks, lit(i + 1))
      val v = when(raw === "-" || raw === "", lit(null).cast("string")).otherwise(raw)
      (if (vpcIntFields(name)) v.try_cast("long") else v).as(name)
    }
    struct(fields.toIndexedSeq: _*)
  }

  // ---------------------------------------------------------- CloudWatch

  private val cloudwatchSchema = StructType(Seq(
    StructField("owner", StringType), StructField("messageType", StringType),
    StructField("logGroup", StringType), StructField("logStream", StringType),
    StructField("subscriptionFilters", ArrayType(StringType)),
    StructField("logEvents", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("timestamp", LongType),
      StructField("message", StringType)))))))

  /** `parse_aws_cloudwatch_log_subscription_message!(json)` — the
    * subscription envelope (owner/messageType/logGroup/logStream/
    * subscriptionFilters/logEvents) parsed into the reference's
    * snake_case field names; event epoch-millis timestamps become real
    * timestamps (the reference's DateTime<Utc>,
    * parse_aws_cloudwatch_log_subscription_message.cue example).
    */
  def parseAwsCloudwatchLogSubscriptionMessage(c: Column): Column = {
    val j = from_json(c, cloudwatchSchema)
    struct(
      j.getField("owner").as("owner"),
      j.getField("messageType").as("message_type"),
      j.getField("logGroup").as("log_group"),
      j.getField("logStream").as("log_stream"),
      j.getField("subscriptionFilters").as("subscription_filters"),
      transform(j.getField("logEvents"), e => struct(
        e.getField("id").as("id"),
        timestamp_millis(e.getField("timestamp")).as("timestamp"),
        e.getField("message").as("message"))).as("log_events"))
  }

  // ---------------------------------------------------------- bytes

  private val bytesRe = "^\\s*([0-9]*\\.?[0-9]+)\\s*([KkMmGgTtPp]?)([Ii]?)[Bb]?\\s*$"

  private def bytePower(letter: Column): Column =
    when(lower(letter) === "k", 1).when(lower(letter) === "m", 2)
      .when(lower(letter) === "g", 3).when(lower(letter) === "t", 4)
      .when(lower(letter) === "p", 5).otherwise(0)

  /** `parse_bytes!(s, unit, base)` (parse_bytes.cue): "1024KiB" with
    * unit "MiB" → 1.0. `base="2"` reads ambiguous decimal suffixes (KB,
    * MB) as binary (the cue's "1GB" base-2 → 1073741824); explicit
    * binary suffixes (KiB) are always 1024-based. Null when unparsable.
    */
  def parseBytes(c: Column, unit: String = "B", base: String = "2"): Column = {
    val num = regexp_extract(c, bytesRe, 1)
    val letter = regexp_extract(c, bytesRe, 2)
    val binMark = regexp_extract(c, bytesRe, 3)
    val factor =
      if (base == "2") lit(1024.0)
      else when(binMark =!= "", 1024.0).otherwise(1000.0)
    val mult = pow(factor, bytePower(letter))
    val unitM = unit match {
      case u if u.length > 1 =>
        val p = "kmgtp".indexOf(u.head.toLower) + 1
        math.pow(if (u.contains("i") || base == "2") 1024.0 else 1000.0, p)
      case _ => 1.0
    }
    when(num === "", lit(null).cast("double"))
      .otherwise(num.cast("double") * mult / unitM)
  }

  /** `parse_float!(s)` — null on unparsable (VRL fallible analog);
    * try_cast, since a plain cast aborts the job under ANSI mode.
    */
  def parseFloat(c: Column): Column = c.try_cast("double")

  // --------------------------------------------- apache / nginx formats

  private def dashNull(c: Column): Column =
    when(c === "" || c === "-", lit(null).cast("string")).otherwise(c)
  private def clfTs(c: Column): Column =
    try_to_timestamp(c, lit("dd/MMM/yyyy:HH:mm:ss Z"))

  /** `parse_apache_log!(line, format)` (parse_apache_log.cue): the
    * three Apache formats with the reference's exact field names and
    * types. `-` fields are null; common/combined expose the request
    * line as `message` plus split method/path/protocol; `error` pulls
    * module/severity/pid/thread and client/port. Null when the line
    * doesn't match (the caller's raise channel).
    */
  def apacheLog(c: Column, format: String): Column = format match {
    case "common" | "combined" =>
      val re = "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"([^\"]*)\" (\\d+|-) (\\d+|-)" +
        (if (format == "combined") " \"([^\"]*)\" \"([^\"]*)\"$" else "$")
      def g(i: Int) = regexp_extract(c, re, i)
      val msg = dashNull(g(5))
      val reqRe = "^(\\S+) (\\S+) (\\S+)$"
      val base = Seq(
        dashNull(g(1)).as("host"), dashNull(g(2)).as("identity"),
        dashNull(g(3)).as("user"), clfTs(g(4)).as("timestamp"),
        msg.as("message"),
        regexp_extract(msg, reqRe, 1).as("method"),
        regexp_extract(msg, reqRe, 2).as("path"),
        regexp_extract(msg, reqRe, 3).as("protocol"),
        dashNull(g(6)).try_cast("long").as("status"),
        dashNull(g(7)).try_cast("long").as("size"))
      val extra =
        if (format == "combined")
          Seq(dashNull(g(8)).as("referrer"), dashNull(g(9)).as("agent"))
        else Nil
      when(c.rlike(re), struct(base ++ extra: _*))
    case "error" =>
      // [ts] [module:severity] [pid N:tid M] [client ip:port] message
      val re = "^\\[([^\\]]+)\\] \\[(?:([^:\\]]*):)?([^\\]]+)\\] \\[pid (\\d+)(?::tid (\\d+))?\\]" +
        "(?: \\[client ([^:\\]]+)(?::(\\d+))?\\])? (.*)$"
      def g(i: Int) = regexp_extract(c, re, i)
      when(c.rlike(re), struct(
        clfTs(g(1)).as("timestamp"),
        dashNull(g(2)).as("module"), dashNull(g(3)).as("severity"),
        g(4).try_cast("long").as("pid"), dashNull(g(5)).as("thread"),
        dashNull(g(6)).as("client"), dashNull(g(7)).try_cast("long").as("port"),
        g(8).as("message")))
    case other =>
      throw new IllegalArgumentException(s"parse_apache_log format $other")
  }

  /** `parse_nginx_log!(line, format)` (parse_nginx_log.cue): combined /
    * error / main / ingress_upstreaminfo with the reference's field
    * names and types; null when the line doesn't match.
    */
  def nginxLog(c: Column, format: String): Column = format match {
    case "combined" =>
      val re = "^(\\S+) - (\\S+) \\[([^\\]]+)\\] \"([^\"]*)\" (\\d+) (\\d+)" +
        " \"([^\"]*)\" \"([^\"]*)\"(?: \"([^\"]*)\")?$"
      def g(i: Int) = regexp_extract(c, re, i)
      when(c.rlike(re), struct(
        g(1).as("client"), dashNull(g(2)).as("user"),
        clfTs(g(3)).as("timestamp"), g(4).as("request"),
        g(5).try_cast("long").as("status"), g(6).try_cast("long").as("size"),
        dashNull(g(7)).as("referer"), dashNull(g(8)).as("agent"),
        dashNull(g(9)).as("compression")))
    case "error" =>
      val re = "^(\\d{4}/\\d{2}/\\d{2} \\d{2}:\\d{2}:\\d{2}) \\[(\\w+)\\] (\\d+)#(\\d+):" +
        " \\*(\\d+) (.*?)(?:, client: (\\S+), server: (\\S*), request: \"([^\"]*)\"" +
        "(?:, upstream: \"([^\"]*)\")?(?:, host: \"([^\"]*)\")?" +
        "(?:, referrer: \"([^\"]*)\")?)?$"
      def g(i: Int) = regexp_extract(c, re, i)
      when(c.rlike(re), struct(
        try_to_timestamp(g(1), lit("yyyy/MM/dd HH:mm:ss")).as("timestamp"),
        g(2).as("severity"), g(3).try_cast("long").as("pid"),
        g(4).try_cast("long").as("tid"), g(5).try_cast("long").as("cid"),
        g(6).as("message"), dashNull(g(7)).as("client"),
        dashNull(g(8)).as("server"), dashNull(g(9)).as("request"),
        dashNull(g(10)).as("upstream"), dashNull(g(11)).as("host"),
        dashNull(g(12)).as("referrer")))
    case "main" =>
      val re = "^(\\S+) - (\\S+) \\[([^\\]]+)\\] \"([^\"]*)\" (\\d+) (\\d+)" +
        " \"([^\"]*)\" \"([^\"]*)\" \"([^\"]*)\"$"
      def g(i: Int) = regexp_extract(c, re, i)
      when(c.rlike(re), struct(
        g(1).as("remote_addr"), dashNull(g(2)).as("remote_user"),
        clfTs(g(3)).as("timestamp"), g(4).as("request"),
        g(5).try_cast("long").as("status"),
        g(6).try_cast("long").as("body_bytes_size"),
        dashNull(g(7)).as("http_referer"), dashNull(g(8)).as("http_user_agent"),
        dashNull(g(9)).as("http_x_forwarded_for")))
    case "ingress_upstreaminfo" =>
      val re = "^(\\S+) - (\\S+) \\[([^\\]]+)\\] \"([^\"]*)\" (\\d+) (\\d+)" +
        " \"([^\"]*)\" \"([^\"]*)\" (\\d+) ([0-9.]+)" +
        " \\[([^\\]]*)\\] \\[([^\\]]*)\\] (\\S+) (\\d+) ([0-9.]+) (\\d+) (\\S+)$"
      def g(i: Int) = regexp_extract(c, re, i)
      when(c.rlike(re), struct(
        g(1).as("remote_addr"), dashNull(g(2)).as("remote_user"),
        clfTs(g(3)).as("timestamp"), g(4).as("request"),
        g(5).try_cast("long").as("status"),
        g(6).try_cast("long").as("body_bytes_size"),
        dashNull(g(7)).as("http_referer"), dashNull(g(8)).as("http_user_agent"),
        g(9).try_cast("long").as("request_length"),
        g(10).try_cast("double").as("request_time"),
        dashNull(g(11)).as("proxy_upstream_name"),
        dashNull(g(12)).as("proxy_alternative_upstream_name"),
        dashNull(g(13)).as("upstream_addr"),
        g(14).try_cast("long").as("upstream_response_length"),
        g(15).try_cast("double").as("upstream_response_time"),
        g(16).try_cast("long").as("upstream_status"),
        dashNull(g(17)).as("req_id")))
    case other =>
      throw new IllegalArgumentException(s"parse_nginx_log format $other")
  }
}

/** parse_etld support data: a compact, commonly-hit subset of the
  * Mozilla Public Suffix List (publicsuffix.org, MPL-licensed public
  * data) — exact rules plus the wildcard/exception forms the algorithm
  * needs. Production loads the full PSL file and passes it in; the
  * ALGORITHM (longest match, wildcards, exceptions) is complete either
  * way.
  */
object Etld {
  val DefaultSuffixes: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz", "io",
    "co", "ai", "app", "dev", "cloud", "me", "tv", "cc", "us", "ca",
    "de", "fr", "nl", "es", "it", "pl", "ru", "ch", "at", "be", "se",
    "no", "fi", "dk", "cz", "eu", "in", "cn", "br", "mx", "ar", "kr",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk",
    "jp", "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "nz", "co.nz", "org.nz", "net.nz", "govt.nz",
    "za", "co.za", "org.za", "web.za",
    "github.io", "gitlab.io", "pages.dev", "vercel.app", "netlify.app",
    "herokuapp.com", "appspot.com", "blogspot.com", "cloudfront.net",
    "amazonaws.com", "s3.amazonaws.com",
    // wildcard + exception rule forms (PSL ck section — the canonical
    // algorithm test: *.ck is a suffix EXCEPT www.ck)
    "*.ck", "!www.ck", "*.bd", "*.er", "*.fk", "*.jm", "*.kw")

  /** `parse_etld!(host, plus_parts)` → struct(etld, etld_plus,
    * known_suffix) — see StringExpressions.EtldExtract.
    */
  def parseEtld(c: Column, plusParts: Int = 0,
                suffixes: Seq[String] = DefaultSuffixes): Column =
    org.apache.spark.sql.graftvec.StringExpressions.parseEtld(c, suffixes, plusParts)
}
