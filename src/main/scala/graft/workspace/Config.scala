package graft.workspace

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** `slicer.ini`-style workspace configuration (reference
  * `cubes/workspace.py:56-230` + `slicer/commands.py` `--config`,
  * example format `examples/hello_world/slicer.ini`):
  *
  * {{{
  * [workspace]
  * log_level: info
  *
  * [server]
  * host: 127.0.0.1
  * port: 5000
  *
  * [store]
  * type: parquet_dir          ; the Spark-native store: a directory of
  * path: /data/tables         ;   <table>.parquet files
  *
  * [store_lab]                ; named store: its cubes live in namespace
  * type: parquet_dir          ;   "lab" (override with `namespace:`) and
  * path: /data/lab_tables     ;   are addressed as `lab.<cube>`
  * model: lab_model.json      ; optional store-bound model
  *
  * [models]
  * main: model.json           ; paths relative to the config file
  *
  * [translations]
  * de: translations_de.json   ; model-label translations per locale
  * }}}
  */
object WorkspaceConfig {

  /** Minimal INI parser: `[section]` headers, `key: value` / `key = value`
    * entries, `;`/`#` comment lines. Last duplicate key wins (reference
    * uses Python ConfigParser semantics). */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var section = ""
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith(";") && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          out.getOrElseUpdate(section, scala.collection.mutable.LinkedHashMap.empty)
        } else {
          val idx = {
            val c = line.indexOf(':'); val e = line.indexOf('=')
            if (c < 0) e else if (e < 0) c else math.min(c, e)
          }
          require(idx > 0, s"bad config line: '$line'")
          out.getOrElseUpdate(section,
            scala.collection.mutable.LinkedHashMap.empty)
            .put(line.take(idx).trim, line.drop(idx + 1).trim)
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** Build a [[Workspace]] from a config file: registers the store's
    * parquet tables, imports every `[models]` entry, and registers
    * `[translations]`. Relative paths resolve against the config file's
    * directory (reference behavior). */
  def load(spark: SparkSession, configPath: String): Workspace =
    loadWithConfig(spark, configPath)._1

  /** [[load]] plus the parsed config (so callers needing `[server]` etc.
    * don't re-read and re-parse the file). */
  def loadWithConfig(spark: SparkSession,
      configPath: String): (Workspace, Map[String, Map[String, String]]) = {
    val path = Paths.get(configPath)
    val cfg = parseIni(Files.readString(path))
    val baseDir = Option(path.getParent).getOrElse(Paths.get("."))
    def resolve(p: String): String = {
      val pp = Paths.get(p)
      (if (pp.isAbsolute) pp else baseDir.resolve(pp)).toString
    }

    val ws = new Workspace(spark)
    // stores that asked for denormalized browsing: namespace → (prefix,
    // suffix) for the materialized view name (reference store options
    // `use_denormalization` + `denormalized_prefix`/`denormalized_suffix`,
    // `sql/store.py:138-144`, naming `sql/mapper.py:163-168`)
    val denormStores = scala.collection.mutable.Map.empty[String, (String, String)]
    def truthy(v: String): Boolean =
      Set("true", "yes", "on", "1").contains(v.trim.toLowerCase)
    def registerStore(ns: String, store: Map[String, String]): Unit = {
      // type: slicer = HTTP federation — another slicer server's cubes
      // browsed by relay (reference SlicerStore, cubes/server/store.py)
      if (store.get("type").contains("slicer")) {
        ws.registerSlicerStore(new graft.federation.SlicerStore(
          store.getOrElse("url", "http://localhost:5000"),
          authentication = store.get("authentication"),
          authIdentity = store.get("auth_identity"),
          authParameter = store.getOrElse("auth_parameter", "api_key")), ns)
        return
      }
      store.get("type").foreach { t =>
        require(t == "parquet_dir",
          s"unsupported store type '$t' (this engine's store is a parquet directory)")
      }
      store.get("path").foreach(p => ws.registerTableDir(resolve(p), ns))
      // a store section may bring its own model, loaded into the store's
      // namespace (reference workspace.py:342-364)
      store.get("model").foreach { m =>
        val json = Files.readString(Paths.get(resolve(m)))
        if (ns.isEmpty) ws.importModel(json) else ws.importModel(json, ns)
      }
      if (store.get("use_denormalization").exists(truthy) ||
        store.get("is_denormalized").exists(truthy))
        denormStores(ns) = (store.getOrElse("denormalized_prefix", ""),
          store.getOrElse("denormalized_suffix", ""))
    }
    // [store] = default store; [store_<name>] / [store.<name>] /
    // [store <name>] = named store whose cubes live in namespace <name>
    // (overridable with a `namespace:` key) — reference workspace.py:205-223.
    // The separator is REQUIRED: a section like [storage] or [stores] is
    // not a store section and must not be misparsed as one.
    // (.*) not (.+): a typo'd `[store_]` must reach the require below and
    // abort loudly, not be silently dropped as a non-store section
    val NamedStore = "store[._ ](.*)".r
    cfg.get("store").foreach(registerStore("", _))
    cfg.keys.toSeq.sorted.foreach {
      case sec @ NamedStore(rawName) =>
        val name = rawName.trim
        require(name.nonEmpty, s"store section '[$sec]' has no name")
        val ns = cfg(sec).getOrElse("namespace", name)
        registerStore(ns, cfg(sec))
      case _ =>
    }
    cfg.getOrElse("models", Map.empty).values.foreach { m =>
      ws.importModel(Files.readString(Paths.get(resolve(m))))
    }
    val translations = cfg.getOrElse("translations", Map.empty).map {
      case (locale, p) => locale -> Files.readString(Paths.get(resolve(p)))
    }
    if (translations.nonEmpty) ws.importTranslations(translations)
    // flip denormalized-store cubes over to their materialized views,
    // named prefix+cube+suffix within the store's table registry
    denormStores.foreach { case (ns, (pre, suf)) =>
      ws.cubeNames
        .filter(n => if (ns.isEmpty) !n.contains('.') else n.startsWith(ns + "."))
        .foreach { ref =>
          val bare = ref.split('.').last
          ws.useDenormalized(ref, s"$pre$bare$suf")
        }
    }
    (ws, cfg)
  }

  def serverPort(cfg: Map[String, Map[String, String]]): Int =
    cfg.getOrElse("server", Map.empty).get("port").map(_.toInt).getOrElse(5000)
}
