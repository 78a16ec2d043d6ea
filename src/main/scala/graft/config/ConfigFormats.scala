package graft.config

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import Toml._

/** The reference accepts the same topology in TOML, JSON, or YAML
  * (src/config/format.rs, exercised by tests/behavior/formats/
  * simple.{toml,json,yaml,yml}); this converts the JSON/YAML document
  * trees into the shared [[Toml.V]] model so one loader path serves
  * all three. Jackson (bundled with Spark, yaml dataformat included)
  * does the parsing; key order is preserved by Jackson's ObjectNode.
  */
object ConfigFormats {

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

  def parseJson(text: String): TTab = root(new ObjectMapper().readTree(text))

  def parseYaml(text: String): TTab =
    root(new ObjectMapper(new YAMLFactory()).readTree(text))

  /** Dispatch on file extension; everything not json/yaml is TOML
    * (the reference's Format::from_str default).
    */
  def parseFile(path: String, text: String): TTab = {
    val lower = path.toLowerCase
    if (lower.endsWith(".json")) parseJson(text)
    else if (lower.endsWith(".yaml") || lower.endsWith(".yml")) parseYaml(text)
    else Toml.parse(text)
  }

  private def root(n: JsonNode): TTab = toV(n) match {
    case t: TTab => t
    case other => throw new IllegalArgumentException(
      s"config root must be an object, got $other")
  }

  private def toV(n: JsonNode): V =
    if (n == null || n.isNull) TNull
    else if (n.isObject) {
      val t = TTab(mutable.LinkedHashMap.empty)
      n.properties().iterator().asScala.foreach { e =>
        t.entries(e.getKey) = toV(e.getValue)
      }
      t
    }
    else if (n.isArray) TArr(n.elements().asScala.map(toV).toVector)
    else if (n.isTextual) TStr(n.asText())
    else if (n.isIntegralNumber) TInt(n.asLong())
    else if (n.isNumber) TFloat(n.asDouble())
    else if (n.isBoolean) TBool(n.asBoolean())
    else TStr(n.asText())
}
