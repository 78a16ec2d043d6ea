package graft.config

import scala.util.matching.Regex

/** `$VAR` / `${VAR}` environment-variable interpolation over the raw
  * config text, before parsing — the reference's src/config/vars.rs
  * grammar exactly:
  *
  *   - `$$`           → literal `$`
  *   - `$VAR`, `${VAR}` → value; missing is an error
  *   - `${VAR:-def}`  → value if set and non-empty, else `def`
  *   - `${VAR-def}`   → value if set, else `def`
  *   - `${VAR:?err}`  → error `err` when unset OR empty
  *   - `${VAR?err}`   → error `err` when unset
  *
  * Names are `[\w.]+` (the `.` for Java-properties-style vars). Values
  * containing CR/LF are rejected (vars.rs:34-44 — a multiline value
  * spliced into TOML would reshape the document). Error messages keep
  * the reference's wording.
  */
object EnvVars {

  private val Pattern: Regex =
    """\$\$|\$([\w.]+)|\$\{([\w.]+)(?:(:?-|:?\?)([^}]*))?\}""".r

  def interpolate(input: String, vars: Map[String, String]): String = {
    val errors = Seq.newBuilder[String]
    val out = Pattern.replaceAllIn(input, m => {
      val name = Option(m.group(1)).orElse(Option(m.group(2)))
      val flags = Option(m.group(3)).getOrElse("")
      val defOrErr = Option(m.group(4)).getOrElse("")
      val replaced = name match {
        case None => "$" // the $$ escape
        case Some(n) =>
          val value = vars.get(n).flatMap { v =>
            if (v.contains('\n') || v.contains('\r')) {
              errors += s"Environment variable contains newline character. name = \"$n\""
              None
            } else Some(v)
          }
          flags match {
            case ":-" => value.filter(_.nonEmpty).getOrElse(defOrErr)
            case "-" => value.getOrElse(defOrErr)
            case ":?" => value.filter(_.nonEmpty).getOrElse {
              errors += s"Non-empty environment variable required in config. name = \"$n\", error = \"$defOrErr\""
              ""
            }
            case "?" => value.getOrElse {
              errors += s"Missing environment variable required in config. name = \"$n\", error = \"$defOrErr\""
              ""
            }
            case _ => value.getOrElse {
              errors += s"Missing environment variable in config. name = \"$n\""
              ""
            }
          }
      }
      Regex.quoteReplacement(replaced)
    })
    val errs = errors.result()
    if (errs.nonEmpty) throw new IllegalArgumentException(errs.mkString("; "))
    out
  }

  def interpolate(input: String): String = interpolate(input, sys.env)
}
