package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** uap-style user-agent parsing where the RULESET IS DATA, mirroring
  * the reference's embedded uap-core database (parse_user_agent.cue —
  * "uses the uap-core rules"): an ordered list of (regex,
  * family/version extraction) rules, FIRST match wins, exactly the
  * uap-core matching contract (ua-parser/uap-core regexes.yaml, a
  * public Apache-2.0 data file).
  *
  * `DefaultRules` ships a compact subset written in the uap-core rule
  * SHAPE (priority-ordered, specific before generic — Edge before
  * Chrome, CriOS before Safari, Trident before MSIE) covering the
  * dominant agents; production loads the full regexes.yaml via
  * `fromTable` for bit-parity with uap — the ENGINE (ordered
  * first-match compilation into one codegen'd when-chain) is identical
  * either way.
  */
object UserAgent {

  /** One uap rule: `family` is the literal family replacement;
    * `v1Group`/`v2Group` are regex group indices for major/minor
    * version (0 = absent → null).
    */
  final case class Rule(regex: String, family: String,
                        v1Group: Int = 1, v2Group: Int = 2)

  val DefaultRules: Seq[Rule] = Seq(
    // mobile webviews / in-app browsers first (most specific)
    Rule("CriOS/(\\d+)\\.(\\d+)", "Chrome Mobile iOS"),
    Rule("FxiOS/(\\d+)\\.(\\d+)", "Firefox iOS"),
    Rule("EdgiOS/(\\d+)\\.(\\d+)", "Edge Mobile"),
    Rule("SamsungBrowser/(\\d+)\\.(\\d+)", "Samsung Internet"),
    // desktop/mobile Edge + Opera ride on a Chrome token — before Chrome
    Rule("Edge?/(\\d+)\\.(\\d+)", "Edge"),
    Rule("EdgA/(\\d+)\\.(\\d+)", "Edge Mobile"),
    Rule("OPR/(\\d+)\\.(\\d+)", "Opera"),
    Rule("Opera/(\\d+)\\.(\\d+)", "Opera"),
    Rule("Chromium/(\\d+)\\.(\\d+)", "Chromium"),
    Rule("Chrome/(\\d+)\\.(\\d+)", "Chrome"),
    Rule("Firefox/(\\d+)\\.(\\d+)", "Firefox"),
    // Safari carries its version in a separate token; Mobile before desktop
    Rule("Version/(\\d+)\\.(\\d+)[^ ]* Mobile[^ ]* Safari/", "Mobile Safari"),
    Rule("Version/(\\d+)\\.(\\d+)[^ ]* Safari/", "Safari"),
    // IE: Trident token outlived the MSIE token (IE11), so it goes first
    Rule("Trident/[\\d.]+;[^)]*rv:(\\d+)\\.(\\d+)", "IE"),
    Rule("MSIE (\\d+)\\.(\\d+)", "IE"),
    // tools & bots
    Rule("curl/(\\d+)\\.(\\d+)", "curl"),
    Rule("[Ww]get/(\\d+)\\.(\\d+)", "Wget"),
    Rule("python-requests/(\\d+)\\.(\\d+)", "python-requests"),
    Rule("Go-http-client/(\\d+)(?:\\.(\\d+))?", "Go-http-client"),
    Rule("okhttp/(\\d+)\\.(\\d+)", "okhttp"),
    Rule("Googlebot/(\\d+)\\.(\\d+)", "Googlebot"),
    Rule("bingbot/(\\d+)\\.(\\d+)", "bingbot"))

  /** Compile the ordered ruleset into ONE first-match-wins when-chain →
    * struct(family, major, minor). Same linear-scan semantics as the
    * reference's per-event uap iteration, but vectorized and codegen'd;
    * rule count only grows the expression, not the row work for early
    * matches.
    */
  def parse(ua: Column, rules: Seq[Rule] = DefaultRules): Column = {
    val noMatch = struct(lit("Other").as("family"),
      lit(null).cast("string").as("major"), lit(null).cast("string").as("minor"))
    rules.foldRight(noMatch: Column) { (r, fallback) =>
      // ONE RegexGroups run per rule per row (null array = no match):
      // the rlike + regexp_extract x2 form executed the same regex up
      // to 3 times per rule — with the full ~1200-rule uap-core set
      // that's the difference between 1x and 3x regex work on every row
      val g = org.apache.spark.sql.graftvec.RegexExpressions
        .regexGroups(ua, r.regex)
      def grp(i: Int): Column =
        if (i == 0) lit(null).cast("string")
        else {
          val x = element_at(g, i)
          when(x === "", lit(null).cast("string")).otherwise(x)
        }
      when(g.isNotNull, struct(lit(r.family).as("family"),
        grp(r.v1Group).as("major"), grp(r.v2Group).as("minor")))
        .otherwise(fallback)
    }
  }

  /** Load a uap-style ruleset from a table (priority:int, regex:string,
    * family:string, v1_group:int, v2_group:int) — the full
    * uap-core regexes.yaml flattens to exactly this shape. The ruleset
    * is CONFIG-sized (uap-core ≈ 1200 browser rules) and compiled into
    * the plan at build time, so the collect here is a config read, not
    * a data-path collect.
    */
  def fromTable(rules: DataFrame): Seq[Rule] = {
    // uap-core rules routinely carry only a family_replacement with no
    // version capture groups — a null group means "absent" (0), and
    // must not NPE the ruleset load
    def intOr0(r: org.apache.spark.sql.Row, i: Int): Int =
      if (r.isNullAt(i)) 0 else r.getInt(i)
    rules.select(col("priority").cast("int"), col("regex"), col("family"),
        col("v1_group").cast("int"), col("v2_group").cast("int"))
      .collect()
      .sortBy(intOr0(_, 0))
      .map(r => Rule(r.getString(1), r.getString(2), intOr0(r, 3), intOr0(r, 4)))
      .toSeq
  }
}
