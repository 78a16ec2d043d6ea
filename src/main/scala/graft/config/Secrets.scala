package graft.config

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import Toml._

/** `SECRET[backend.key]` config interpolation (reference
  * src/secrets/ + src/config/loading/secret.rs:31 — pattern
  * `SECRET\[(\w+)\.([\w.-]+)\]`): `[secret.<name>]` blocks declare
  * backends, every other string value in the config is interpolated at
  * LOAD, before anything compiles. Backends, matching the reference
  * set that works without cloud credentials:
  *
  *  - `test`      — every key resolves to the fixed `replacement`
  *                  (secrets/test.rs; the reference's own corpus uses it)
  *  - `file`      — a JSON object `{key: value}` at `path` (file.rs)
  *  - `directory` — one file per key under `path`;
  *                  `remove_trailing_whitespace` trims the tail
  *                  (directory.rs:42-43)
  *  - `exec`      — run `command`, write
  *                  `{"version":"1.0","secrets":[keys…]}` to stdin,
  *                  read `{key: {value, error}}` from stdout
  *                  (exec.rs ExecQuery/ExecResponse, protocol v1.0)
  *
  * A missing/empty/errored secret fails the load loudly, same wording
  * as the reference ("secret for key '<k>' was not retrieved").
  */
object Secrets {

  private val Pattern = """SECRET\[(\w+)\.([\w.\-]+)\]""".r

  /** Interpolates in place over the parsed tree (equivalent to the
    * reference's raw-text interpolation — secret blocks themselves are
    * excluded). No-op when the config has no `[secret]` table.
    */
  def interpolate(root: TTab, resolvePath: String => String): Unit = {
    val backends: Map[String, TTab] = root.tab("secret") match {
      case Some(t) => t.entries.toSeq.collect { case (n, tab: TTab) => n -> tab }.toMap
      case None => return
    }

    // collect every referenced (backend, key) first — exec/file
    // backends resolve one batch per backend, like the reference
    val wanted = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
    def scan(v: V): Unit = v match {
      case TStr(s) => Pattern.findAllMatchIn(s).foreach { m =>
        wanted.getOrElseUpdate(m.group(1), mutable.LinkedHashSet.empty) += m.group(2)
      }
      case t: TTab => t.entries.valuesIterator.foreach(scan)
      case TArr(xs) => xs.foreach(scan)
      case _ => ()
    }
    root.entries.foreach { case (k, v) => if (k != "secret") scan(v) }
    if (wanted.isEmpty) return

    val resolved: Map[(String, String), String] = wanted.flatMap { case (b, keys) =>
      val cfg = backends.getOrElse(b, throw new IllegalArgumentException(
        s"config references unknown secret backend '$b'"))
      retrieve(b, cfg, keys.toSeq, resolvePath).map { case (k, v) => (b, k) -> v }
    }.toMap

    def subst(s: String): String =
      Pattern.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        resolved((m.group(1), m.group(2)))))
    def walk(v: V): V = v match {
      case TStr(s) => TStr(subst(s))
      case t: TTab =>
        t.entries.keysIterator.toSeq.foreach(k => t.entries(k) = walk(t.entries(k)))
        t
      case TArr(xs) => TArr(xs.map(walk))
      case other => other
    }
    root.entries.keysIterator.toSeq.foreach { k =>
      if (k != "secret") root.entries(k) = walk(root.entries(k))
    }
  }

  private def retrieve(name: String, cfg: TTab, keys: Seq[String],
                       resolvePath: String => String): Map[String, String] = {
    def fail(k: String, why: String): Nothing = throw new IllegalArgumentException(
      s"secret for key '$k' was not retrieved: $why")
    def nonEmpty(k: String, v: String): String =
      if (v.isEmpty) fail(k, "secret was empty") else v

    cfg.str("type").getOrElse(throw new IllegalArgumentException(
      s"secret backend $name has no type")) match {

      case "test" =>
        val rep = cfg.str("replacement").getOrElse(throw new IllegalArgumentException(
          s"secret backend $name (test): no replacement"))
        keys.map(k => k -> nonEmpty(k, rep)).toMap

      case "file" =>
        val path = cfg.str("path").getOrElse(throw new IllegalArgumentException(
          s"secret backend $name (file): no path"))
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(resolvePath(path))), "UTF-8")
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
        keys.map { k =>
          val v = node.get(k)
          if (v == null || !v.isTextual) fail(k, s"key not in $path")
          k -> nonEmpty(k, v.asText())
        }.toMap

      case "directory" =>
        val dir = cfg.str("path").getOrElse(throw new IllegalArgumentException(
          s"secret backend $name (directory): no path"))
        val trim = cfg.bool("remove_trailing_whitespace").getOrElse(false)
        keys.map { k =>
          val p = java.nio.file.Paths.get(resolvePath(dir)).resolve(k)
          if (!java.nio.file.Files.isRegularFile(p)) fail(k, s"no file $p")
          val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          k -> nonEmpty(k, if (trim) raw.replaceAll("\\s+$", "") else raw)
        }.toMap

      case "exec" =>
        val command = cfg.strArr("command")
        if (command.isEmpty) throw new IllegalArgumentException(
          s"secret backend $name (exec): no command")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val query = mapper.createObjectNode()
        query.put("version", "1.0")
        val arr = query.putArray("secrets")
        keys.foreach(arr.add)
        // the command spawns as-is (reference: relative to the process
        // CWD, with PATH lookup — not config-dir-relative)
        val proc = new ProcessBuilder(command.asJava)
          .redirectErrorStream(false).start()
        proc.getOutputStream.write(mapper.writeValueAsBytes(query))
        proc.getOutputStream.close()
        val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
        if (!proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)) {
          proc.destroyForcibly()
          throw new IllegalArgumentException(s"secret backend $name (exec): timeout")
        }
        val node = mapper.readTree(out)
        keys.map { k =>
          val e = node.get(k)
          if (e == null) fail(k, "backend returned no entry")
          val err = e.get("error")
          if (err != null && !err.isNull) fail(k, err.asText())
          val v = e.get("value")
          if (v == null || v.isNull) fail(k, "backend returned no value")
          k -> nonEmpty(k, v.asText())
        }.toMap

      case other => throw new IllegalArgumentException(
        s"secret backend $name: unsupported type '$other' " +
          "(supported: test, file, directory, exec)")
    }
  }
}
