package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods
import scala.jdk.CollectionConverters._

/** Model metadata as raw JSON, readable from a single file or a
  * `model.cubesmodel/` directory bundle and writable back in either form
  * (reference `read_model_metadata` / `read_model_metadata_bundle` /
  * `write_model_metadata_bundle`, `cubes/metadata/base.py:142-266`).
  * Bundle layout: `model.json` plus `dim_<name>.json` / `cube_<name>.json`
  * whose contents are concatenated onto the model's `dimensions`/`cubes`
  * lists. Works on the METADATA (raw JSON), not parsed model objects, so
  * convert round-trips byte-level content the parser would normalize. */
object ModelBundle {

  private def parseFile(p: Path): JValue =
    JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))

  /** `Files.list` holds a directory handle until closed — materialize and
    * close eagerly so repeated validate/convert runs don't leak handles. */
  private def listJsonFiles(dir: Path): Seq[Path] = {
    val stream = Files.list(dir)
    try stream.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)
    finally stream.close()
  }

  /** Read a model description from a file or a bundle directory.
    * Fail-fast: any unparsable member throws (the programmatic contract —
    * a silently-dropped cube file would be worse than an error). */
  def read(path: String): JObject = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) readBundle(p)
    else parseFile(p) match {
      case o: JObject => o
      case _ => throw new IllegalArgumentException(
        s"model root in '$path' must be a JSON object")
    }
  }

  /** Lenient read for VALIDATION: unparsable member files (the reference's
    * own webshop example ships two) become collected issues instead of a
    * first-failure crash, so `model validate` reports EVERY broken file
    * alongside the semantic findings on the parsable remainder. */
  def readLenient(path: String): (JObject, Seq[ValidationIssue]) = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[ValidationIssue]
    val p = Paths.get(path)
    val metadata: JObject =
      if (Files.isDirectory(p)) {
        // validate each member independently first, so one bad file does
        // not hide the rest. Duplicate names are tracked across member
        // files (seeded with model.json's inline lists, mirroring the
        // assembly's own check) so a member the lenient assembly will
        // drop for duplicating an earlier name is REPORTED, not silently
        // missing from the assembled model
        def inlineNames(key: String): scala.collection.mutable.Set[String] = {
          val s = scala.collection.mutable.Set.empty[String]
          try {
            (parseFile(p.resolve("model.json")) \ key) match {
              case JArray(xs) => xs.foreach {
                case o: JObject => (o \ "name") match {
                  case JString(n) => s += n
                  case _          => ()
                }
                case _ => ()
              }
              case _ => ()
            }
          } catch { case _: Exception => () } // unreadable root reported below
          s
        }
        val seenDims = inlineNames("dimensions")
        val seenCubes = inlineNames("cubes")
        listJsonFiles(p)
          .foreach { f =>
            val fname = f.getFileName.toString
            try {
              val v = parseFile(f)
              // a dim_/cube_ member that parses but has no usable name is
              // skipped by the lenient assembly below — report it here so
              // the skip is visible in the findings, not silent
              val prefix = fname.split("_", 2).head
              val isDim = prefix == "dim" || prefix == "dimension"
              if (isDim || prefix == "cube")
                v match {
                  case o: JObject => (o \ "name") match {
                    case JString(n) =>
                      val seen = if (isDim) seenDims else seenCubes
                      val kind = if (isDim) "dimension" else "cube"
                      if (!seen.add(n))
                        issues += ValidationIssue("error", "model",
                          Some(fname), None,
                          s"$kind '$n' defined multiple times; skipped")
                    case _ => issues += ValidationIssue("error", "model",
                      Some(fname), None, "member file has no 'name' key; skipped")
                  }
                  case _ => issues += ValidationIssue("error", "model",
                    Some(fname), None, "member file must hold a JSON object; skipped")
                }
            } catch { case e: Exception =>
              issues += ValidationIssue("error", "model", Some(fname),
                None, s"member file is not valid JSON: ${e.getMessage}")
            }
          }
        try readBundleSkippingBad(p)
        catch { case e: Exception =>
          issues += ValidationIssue("error", "model", None, None, e.getMessage)
          JObject(Nil)
        }
      } else
        try read(path)
        catch { case e: Exception =>
          issues += ValidationIssue("error", "model", None, None,
            s"model is not readable: ${e.getMessage}")
          JObject(Nil)
        }
    (metadata, issues.toSeq)
  }

  /** Bundle assembly that silently skips unparsable member files — only
    * for [[readLenient]], which has already reported them. */
  private def readBundleSkippingBad(dir: Path): JObject = readBundle(dir, skipBad = true)

  private def readBundle(dir: Path, skipBad: Boolean = false): JObject = {
    val infoPath = dir.resolve("model.json")
    require(Files.exists(infoPath), s"main model info $infoPath does not exist")
    val base = parseFile(infoPath) match {
      case o: JObject => o
      case _ => throw new IllegalArgumentException(
        s"model root in '$infoPath' must be a JSON object")
    }
    var dims = (base \ "dimensions") match {
      case JArray(ds) => ds
      case _          => Nil
    }
    var cubes = (base \ "cubes") match {
      case JArray(cs) => cs
      case _          => Nil
    }
    def names(xs: Seq[JValue]): Set[String] =
      xs.collect { case o: JObject => (o \ "name") match {
        case JString(s) => Some(s)
        case _          => None
      }}.flatten.toSet
    val files = listJsonFiles(dir)
    files.foreach { f =>
      val fname = f.getFileName.toString
      val prefix = fname.split("_", 2).head
      def objIn(v: JValue): JObject = v match {
        case o: JObject => o
        case _ => throw new IllegalArgumentException(s"'$f' must hold a JSON object")
      }
      def nameIn(o: JObject): String = (o \ "name") match {
        case JString(s) => s
        case _ => throw new IllegalArgumentException(s"'$f' has no name key")
      }
      def parsed(): Option[JObject] =
        if (!skipBad) Some(objIn(parseFile(f)))
        else try Some(objIn(parseFile(f))) catch { case _: Exception => None }
      // in skipBad mode a member that PARSES but lacks/duplicates a name
      // must also become a skip: readLenient has one shot at assembling
      // the metadata, and a throw here would discard the whole assembly
      // and silence semantic validation of every healthy member
      def checked(body: => Unit): Unit =
        if (!skipBad) body
        else try body catch { case _: Exception => () }
      if (prefix == "dim" || prefix == "dimension") {
        parsed().foreach { o => checked {
          val n = nameIn(o)
          require(!names(dims).contains(n), s"Dimension '$n' defined multiple times (in '$f')")
          dims = dims :+ o
        }}
      } else if (prefix == "cube") {
        parsed().foreach { o => checked {
          val n = nameIn(o)
          require(!names(cubes).contains(n), s"Cube '$n' defined multiple times (in '$f')")
          cubes = cubes :+ o
        }}
      }
    }
    val rest = base.obj.filterNot(kv => kv._1 == "dimensions" || kv._1 == "cubes")
    JObject(rest ++ List("dimensions" -> JArray(dims.toList), "cubes" -> JArray(cubes.toList)))
  }

  def renderJson(v: JValue): String =
    JsonMethods.pretty(JsonMethods.render(v))

  /** Write metadata as a bundle directory (reference
    * `write_model_metadata_bundle`): refuses to clobber unless `replace`
    * AND the target already looks like a model bundle. */
  def writeBundle(path: String, metadata: JObject, replace: Boolean = false): Unit = {
    val dir = Paths.get(path)
    if (Files.exists(dir)) {
      require(Files.isDirectory(dir), "Target exists and is a file, can not replace")
      require(Files.exists(dir.resolve("model.json")),
        "Target is not a model directory, can not replace.")
      require(replace, "Target already exists. Remove it or force replacement.")
      // delete the old bundle's json files only — not a recursive rm of an
      // arbitrary directory the user mistyped
      listJsonFiles(dir).foreach(Files.delete)
    } else Files.createDirectories(dir)

    def write(p: Path, v: JValue): Unit =
      Files.write(p, renderJson(v).getBytes(StandardCharsets.UTF_8))

    def nameOf(o: JValue, kind: String): String = (o \ "name") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(s"$kind without a name in bundle write")
    }
    (metadata \ "dimensions") match {
      case JArray(ds) => ds.foreach {
        case o: JObject => write(dir.resolve(s"dim_${nameOf(o, "dimension")}.json"), o)
        case s: JString => // bare-string dim stays in model.json's list
        case other => throw new IllegalArgumentException(s"bad dimension: $other")
      }
      case _ => ()
    }
    (metadata \ "cubes") match {
      case JArray(cs) => cs.foreach {
        case o: JObject => write(dir.resolve(s"cube_${nameOf(o, "cube")}.json"), o)
        case other => throw new IllegalArgumentException(s"bad cube: $other")
      }
      case _ => ()
    }
    // model.json keeps everything except the split-out objects; bare-string
    // dimensions (legal shorthand) remain listed
    val bareDims = (metadata \ "dimensions") match {
      case JArray(ds) => ds.collect { case s: JString => s }
      case _          => Nil
    }
    val rest = metadata.obj.filterNot(kv => kv._1 == "dimensions" || kv._1 == "cubes") ++
      (if (bareDims.nonEmpty) List("dimensions" -> JArray(bareDims.toList)) else Nil)
    write(dir.resolve("model.json"), JObject(rest))
  }
}
