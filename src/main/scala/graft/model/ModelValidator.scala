package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** One finding of [[ModelValidator]]: `severity` is `error` (model cannot
  * be used), `warning` (use not recommended) or `default` (a defaulting
  * rule will fill the gap) — the reference's three-level vocabulary
  * (`ValidationError`, `cubes/metadata/defaults.py:24-25`). */
final case class ValidationIssue(
    severity: String, scope: String, obj: Option[String],
    property: Option[String], message: String) {
  /** Rendered like the reference CLI: `ERROR in cube 'x' property 'p': m`
    * (`cubes/slicer/commands.py:168-189`). */
  def render: String = {
    val where = obj match {
      case Some(o) => s"$scope '$o'"
      case None    => scope
    }
    val prop = property.map(p => s" property '$p'").getOrElse("")
    s"${severity.toUpperCase} in $where$prop: $message"
  }
}

/** Whole-model validation that AGGREGATES every finding instead of
  * throwing at the first (reference `validate_model`,
  * `cubes/metadata/defaults.py:28-124`, surfaced by `slicer model
  * validate`, `cubes/slicer/commands.py:152-216`). [[ModelJson.loadString]]
  * stays fail-fast for programmatic loads; this walks the raw JSON
  * leniently so a model author sees ALL the problems in one run —
  * structural gaps, dangling references, unknown aggregate functions, and
  * cyclic expressions. */
object ModelValidator {

  /** Property allowlists mirroring the reference JSON Schemas'
    * `additionalProperties: false` (`cubes/schemas/model.json`,
    * `cube.json`, `dimension.json`) plus graft's documented extensions
    * (attribute `expression`/`extract`/`function` mapping hooks,
    * measure/aggregate `window_size`, cube-level `nonadditive` default,
    * the `hierarchy` shortcut). Measure/aggregate/detail ITEM properties
    * are deliberately not restricted: the reference cube schema's item
    * constraints are spelled `anyof`/`allof`/`additionalproperties`
    * (not valid JSON-Schema keywords), so the reference validator never
    * enforces them either — parity means not inventing stricter rules. */
  private val ModelProps = Set("name", "label", "description", "info",
    "provider", "browser_options", "cubes", "dimensions", "schema", "store",
    "mappings", "joins")
  private val CubeProps = Set("name", "label", "description", "category",
    "info", "fact", "key", "store", "browser_options", "measures",
    "aggregates", "details", "implicit_aggregates", "dimensions",
    "hierarchies", "mappings", "joins", "nonadditive")
  private val DimensionProps = Set("name", "label", "template",
    "description", "info", "role", "nonadditive", "cardinality", "levels",
    "attributes", "hierarchies", "hierarchy", "default_hierarchy_name",
    "key", "label_attribute", "order_attribute")
  private val LevelProps = Set("name", "label", "description", "info",
    "role", "cardinality", "key", "label_attribute", "order_attribute",
    "attributes", "order")
  private val HierarchyProps = Set("name", "label", "description", "info",
    "levels")
  private val AttributeProps = Set("name", "label", "description", "info",
    "format", "order", "missing_value", "locales", "expression", "extract",
    "function")
  private val Cardinalities = Set("tiny", "low", "medium", "high")

  def validateString(json: String): Seq[ValidationIssue] = {
    val root =
      try JsonMethods.parse(json)
      catch {
        case e: Exception =>
          return Seq(ValidationIssue("error", "model", None, None,
            s"model is not valid JSON: ${e.getMessage}"))
      }
    root match {
      case o: JObject => validate(o)
      case _ =>
        Seq(ValidationIssue("error", "model", None, None,
          "model root must be a JSON object"))
    }
  }

  def validate(root: JObject): Seq[ValidationIssue] = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[ValidationIssue]
    def err(scope: String, obj: Option[String], prop: Option[String], msg: String): Unit =
      issues += ValidationIssue("error", scope, obj, prop, msg)
    def warn(scope: String, obj: Option[String], prop: Option[String], msg: String): Unit =
      issues += ValidationIssue("warning", scope, obj, prop, msg)
    def dflt(scope: String, obj: Option[String], prop: Option[String], msg: String): Unit =
      issues += ValidationIssue("default", scope, obj, prop, msg)

    def str(o: JValue, k: String): Option[String] = (o \ k) match {
      case JString(s) => Some(s)
      case _          => None
    }

    /** `additionalProperties: false` of the reference schemas, as
      * collected findings instead of jsonschema exceptions. */
    def unknownProps(scope: String, obj: Option[String], o: JObject,
        allowed: Set[String], where: Option[String] = None): Unit =
      o.obj.map(_._1).filterNot(allowed).foreach(k =>
        err(scope, obj, where.orElse(Some(k)), s"unknown property '$k'"))

    def checkCardinality(scope: String, obj: Option[String], o: JObject,
        where: String): Unit = (o \ "cardinality") match {
      case JNothing                       => ()
      case JString(c) if Cardinalities(c) => ()
      case JString(c) => err(scope, obj, Some(where),
        s"cardinality must be one of tiny/low/medium/high, got '$c'")
      case _ => err(scope, obj, Some(where), "'cardinality' must be a string")
    }

    def checkOrder(scope: String, obj: Option[String], o: JObject,
        where: String): Unit =
      str(o, "order").filterNot(v => v == "asc" || v == "desc").foreach(v =>
        err(scope, obj, Some(where), s"order must be 'asc' or 'desc', got '$v'"))

    /** Attribute-object checks of the reference attribute schema: `name`
      * required, property allowlist, `order` enum, `locales` array of
      * strings, `missing_value` scalar. */
    def checkAttribute(a: JObject, scope: String, obj: Option[String],
        where: String): Unit = {
      val label = str(a, "name").map(n => s"attribute '$n'").getOrElse(where)
      if (str(a, "name").isEmpty)
        err(scope, obj, Some(where), "attribute without a name")
      unknownProps(scope, obj, a, AttributeProps, Some(label))
      checkOrder(scope, obj, a, label)
      (a \ "locales") match {
        case JNothing   => ()
        case JArray(ls) =>
          if (!ls.forall(_.isInstanceOf[JString]))
            err(scope, obj, Some(label), "'locales' must be an array of strings")
        case _ => err(scope, obj, Some(label),
          "'locales' must be an array of strings")
      }
      (a \ "missing_value") match {
        case JNothing | JNull | _: JString | _: JInt | _: JLong |
             _: JDouble | _: JDecimal | _: JBool => ()
        case _ => err(scope, obj, Some(label),
          "'missing_value' must be a string, number, boolean or null")
      }
    }

    // ----------------------------------------------------------- model scope
    val dimsRaw: Seq[JValue] = (root \ "dimensions") match {
      case JArray(ds) => ds
      case JNothing   => Nil
      case _ =>
        err("model", None, Some("dimensions"), "'dimensions' must be an array")
        Nil
    }
    val cubesRaw: Seq[JValue] = (root \ "cubes") match {
      case JArray(cs) => cs
      case JNothing   => Nil
      case _ =>
        err("model", None, Some("cubes"), "'cubes' must be an array")
        Nil
    }

    unknownProps("model", None, root, ModelProps)
    Seq("name", "label", "description", "provider", "schema", "store")
      .foreach(k => (root \ k) match {
        case JNothing | _: JString => ()
        case _ => err("model", None, Some(k), s"'$k' must be a string")
      })
    Seq("info", "browser_options", "mappings").foreach(k =>
      (root \ k) match {
        case JNothing | _: JObject => ()
        case _ => err("model", None, Some(k), s"'$k' must be an object")
      })
    (root \ "joins") match {
      case JNothing | _: JArray => ()
      case _ => err("model", None, Some("joins"), "'joins' must be an array")
    }

    dimsRaw.foreach {
      case JString(s) =>
        // legal, but worth surfacing like the reference does
        dflt("model", None, Some("dimensions"),
          s"Dimension '$s' is not described, creating flat single-attribute dimension")
      case _ => ()
    }

    val dimObjs = dimsRaw.collect { case o: JObject => o }
    val dimNames = dimObjs.flatMap(str(_, "name")) ++
      dimsRaw.collect { case JString(s) => s }
    dimNames.groupBy(identity).collect { case (n, xs) if xs.size > 1 =>
      err("model", None, Some("dimensions"), s"duplicate dimension name '$n'")
    }

    val dimByName = dimObjs.flatMap(o => str(o, "name").map(_ -> o)).toMap

    // ------------------------------------------------------- dimension scope
    def checkDimensionBody(o: JObject, name: Option[String], scope: String): Unit = {
      val levels = (o \ "levels")
      val attrs = (o \ "attributes")
      if (levels != JNothing && attrs != JNothing)
        err(scope, name, None, "Both levels and attributes specified")
      if (levels == JNothing && attrs == JNothing && (o \ "template") == JNothing)
        dflt(scope, name, None,
          "Neither levels nor attributes specified, creating flat dimension without details")
      if (str(o, "default_hierarchy_name").isEmpty && scope == "dimension")
        dflt(scope, name, None,
          "No default hierarchy name specified, using first one")
      checkCardinality(scope, name, o, "cardinality")
      attrs match {
        case JArray(as) => as.foreach {
          case a: JObject => checkAttribute(a, scope, name, "attributes")
          case _: JString => ()
          case _ => err(scope, name, Some("attributes"),
            "attribute must be a string or an object")
        }
        case JNothing => ()
        case _ =>
          err(scope, name, Some("attributes"), "'attributes' must be an array")
      }

      val levelNames: Seq[String] = levels match {
        case JArray(ls) => ls.zipWithIndex.flatMap {
          case (JString(s), _) => Some(s)
          case (l: JObject, i) =>
            val ln = str(l, "name")
            if (ln.isEmpty)
              err(scope, name, Some(s"levels[$i]"), "level without a name")
            val lWhere = ln.map(n => s"level '$n'").getOrElse(s"levels[$i]")
            unknownProps(scope, name, l, LevelProps, Some(lWhere))
            checkCardinality(scope, name, l, lWhere)
            // level/attribute "order" must be asc/desc (reference
            // natural-order vocabulary); anything else silently sorts
            // wrong at browse
            checkOrder(scope, name, l, lWhere)
            (l \ "attributes") match {
              case JArray(as) => as.foreach {
                case a: JObject =>
                  checkAttribute(a, scope, name, s"$lWhere.attributes")
                case _: JString => ()
                case _ => err(scope, name, Some(s"$lWhere.attributes"),
                  "attribute must be a string or an object")
              }
              case JNothing => ()
              case _ => err(scope, name, Some(lWhere),
                "'attributes' must be an array")
            }
            ln
          case (_, i) =>
            err(scope, name, Some(s"levels[$i]"),
              "level must be a string or an object")
            None
        }
        case JNothing => Nil
        case _ =>
          err(scope, name, Some("levels"), "'levels' must be an array")
          Nil
      }

      if ((o \ "hierarchy") != JNothing && (o \ "hierarchies") != JNothing)
        err(scope, name, None,
          "Both 'hierarchy' and 'hierarchies' specified. Use only one")
      (o \ "hierarchy") match {
        case JArray(ls) =>
          val hLevels = ls.collect { case JString(s) => s }
          if (levelNames.nonEmpty)
            hLevels.filterNot(levelNames.contains).foreach(missing =>
              err(scope, name, Some("hierarchy"),
                s"references unknown level '$missing'"))
        case JNothing => ()
        case _ => err(scope, name, Some("hierarchy"),
          "'hierarchy' must be an array of level names")
      }
      val hierNames: Seq[String] = (o \ "hierarchies") match {
        case JArray(hs) => hs.flatMap {
          case h: JObject =>
            val hn = str(h, "name").getOrElse("default")
            if (str(h, "name").isEmpty)
              err(scope, name, Some("hierarchies"), "hierarchy without a name")
            unknownProps(scope, name, h, HierarchyProps,
              Some(s"hierarchy '$hn'"))
            val hLevels = (h \ "levels") match {
              case JArray(xs) =>
                if (!xs.forall(_.isInstanceOf[JString]))
                  err(scope, name, Some(s"hierarchy '$hn'"),
                    "'levels' must be an array of level names")
                xs.collect { case JString(s) => s }
              case JNothing => Nil
              case _ =>
                err(scope, name, Some(s"hierarchy '$hn'"),
                  "'levels' must be an array of level names")
                Nil
            }
            // a templated dimension may inherit its level set; only check
            // hierarchy/level consistency when levels are declared here
            if (levelNames.nonEmpty)
              hLevels.filterNot(levelNames.contains).foreach(missing =>
                err(scope, name, Some(s"hierarchy '$hn'"),
                  s"references unknown level '$missing'"))
            Some(hn)
          case _ =>
            err(scope, name, Some("hierarchies"), "hierarchy must be an object")
            None
        }
        case JNothing => Nil
        case _ =>
          err(scope, name, Some("hierarchies"), "'hierarchies' must be an array")
          Nil
      }
      str(o, "default_hierarchy_name").foreach { dh =>
        if (hierNames.nonEmpty && !hierNames.contains(dh))
          err(scope, name, Some("default_hierarchy_name"),
            s"references unknown hierarchy '$dh'")
      }
    }

    def checkTemplateChain(start: String, o: JObject): Unit = {
      // walk the template chain from this dimension, flagging unknown
      // targets and cycles (ModelJson.resolveTemplate throws on these;
      // here they become collected errors)
      var visiting = Set(start)
      var cur = o
      var done = false
      while (!done) {
        str(cur, "template") match {
          case None => done = true
          case Some(t) if visiting.contains(t) =>
            err("dimension", Some(start), Some("template"),
              s"circular dimension template chain at '$t'")
            done = true
          case Some(t) => dimByName.get(t) match {
            case None =>
              err("dimension", Some(start), Some("template"),
                s"unknown dimension template '$t'")
              done = true
            case Some(next) =>
              visiting += t
              cur = next
          }
        }
      }
    }

    dimObjs.foreach { o =>
      val name = str(o, "name")
      if (name.isEmpty)
        err("dimension", None, Some("name"), "dimension without a name")
      unknownProps("dimension", name, o, DimensionProps)
      name.foreach(n => checkTemplateChain(n, o))
      checkDimensionBody(o, name, "dimension")
    }

    // ------------------------------------------------------------ cube scope
    val cubeObjs = cubesRaw.collect { case o: JObject => o }
    cubesRaw.foreach {
      case _: JObject => ()
      case other => err("model", None, Some("cubes"), s"cube must be an object, got $other")
    }
    cubeObjs.flatMap(str(_, "name")).groupBy(identity)
      .collect { case (n, xs) if xs.size > 1 =>
        err("model", None, Some("cubes"), s"duplicate cube name '$n'")
      }

    cubeObjs.foreach { c =>
      val cubeName = str(c, "name")
      if (cubeName.isEmpty)
        err("cube", None, Some("name"), "cube without a name")
      unknownProps("cube", cubeName, c, CubeProps)
      (c \ "implicit_aggregates") match {
        case JNothing | _: JBool => ()
        case _ => err("cube", cubeName, Some("implicit_aggregates"),
          "'implicit_aggregates' must be a boolean")
      }

      // dimension references / inline dimensions
      (c \ "dimensions") match {
        case JArray(ds) => ds.zipWithIndex.foreach {
          case (JString(s), _) =>
            if (!dimNames.contains(s))
              dflt("cube", cubeName, Some("dimensions"),
                s"Dimension '$s' is not described, creating flat single-attribute dimension")
          case (d: JObject, i) =>
            if (str(d, "name").isEmpty)
              err("cube", cubeName, Some(s"dimensions[$i]"),
                "dimension without a name")
            // inline dimension definition (not a bare link) gets the body checks
            if ((d \ "levels") != JNothing || (d \ "attributes") != JNothing ||
              (d \ "template") != JNothing)
              checkDimensionBody(d, str(d, "name").orElse(cubeName), "cube")
            str(d, "template").foreach(t =>
              if (!dimByName.contains(t))
                err("cube", cubeName, Some(s"dimensions[$i]"),
                  s"unknown dimension template '$t'"))
          case (_, i) =>
            err("cube", cubeName, Some(s"dimensions[$i]"),
              "dimension must be a string or an object")
        }
        case JNothing => ()
        case _ => err("cube", cubeName, Some("dimensions"),
          "'dimensions' must be an array")
      }

      // measures
      val measureNames: Seq[String] = (c \ "measures") match {
        case JArray(ms) => ms.zipWithIndex.flatMap {
          case (JString(s), _) => Some(s)
          case (m: JObject, i) =>
            val mn = str(m, "name")
            if (mn.isEmpty)
              err("cube", cubeName, Some(s"measures[$i]"), "measure without a name")
            // measure-level "aggregates" list spawns implicit
            // <measure>_<fn> aggregates — an unknown fn there fails at
            // browse time, so surface it here like the explicit form
            (m \ "aggregates") match {
              case JArray(fs) => fs.collect { case JString(f) => f }
                .filterNot(f => graft.functions.AggFunctions.isRegistered(f) ||
                  graft.functions.WindowCalcs.isWindowFunction(f))
                .foreach(f => warn("cube", cubeName,
                  mn.map(n => s"measure '$n'").orElse(Some(s"measures[$i]")),
                  s"unknown aggregate function '$f'"))
              case _ => ()
            }
            mn
          case (_, i) =>
            err("cube", cubeName, Some(s"measures[$i]"),
              "measure must be a string or an object")
            None
        }
        case JNothing => Nil
        case _ =>
          err("cube", cubeName, Some("measures"), "'measures' must be an array")
          Nil
      }

      // aggregates: dangling measure refs + unknown functions
      val aggObjs = (c \ "aggregates") match {
        case JArray(as) => as.collect { case o: JObject => o }
        case _          => Nil
      }
      aggObjs.foreach { a =>
        val an = str(a, "name")
        if (an.isEmpty)
          err("cube", cubeName, Some("aggregates"), "aggregate without a name")
        str(a, "measure").foreach { m =>
          if (!measureNames.contains(m))
            err("cube", cubeName,
              an.map(n => s"aggregate '$n'").orElse(Some("aggregates")),
              s"references unknown measure '$m'")
        }
        str(a, "function").foreach { f =>
          if (!graft.functions.AggFunctions.isRegistered(f) &&
            !graft.functions.WindowCalcs.isWindowFunction(f))
            warn("cube", cubeName,
              an.map(n => s"aggregate '$n'").orElse(Some("aggregates")),
              s"unknown aggregate function '$f'")
        }
        if (str(a, "function").isEmpty && str(a, "measure").isEmpty &&
          str(a, "expression").isEmpty)
          warn("cube", cubeName,
            an.map(n => s"aggregate '$n'").orElse(Some("aggregates")),
            "aggregate has neither function, measure nor expression " +
              "(treated as a base fact column)")
      }

      // expression graph: parse errors + cycles, across measures,
      // aggregates and level attributes of inline dimensions
      val exprOf = scala.collection.mutable.Map.empty[String, String]
      def addExpr(name: Option[String], where: String, e: String): Unit =
        name match {
          case Some(n) => exprOf(n) = e
          case None    => () // nameless object already reported above
        }
      (c \ "measures") match {
        case JArray(ms) => ms.foreach {
          case m: JObject =>
            str(m, "expression").foreach(addExpr(str(m, "name"), "measure", _))
          case _ => ()
        }
        case _ => ()
      }
      aggObjs.foreach(a =>
        str(a, "expression").foreach(addExpr(str(a, "name"), "aggregate", _)))
      (c \ "dimensions") match {
        case JArray(ds) => ds.foreach {
          case d: JObject => (d \ "levels") match {
            case JArray(ls) => ls.foreach {
              case l: JObject => (l \ "attributes") match {
                case JArray(as) => as.foreach {
                  case a: JObject =>
                    str(a, "expression").foreach(addExpr(str(a, "name"), "attribute", _))
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }

      val deps: Map[String, Set[String]] = exprOf.toMap.map { case (n, e) =>
        n -> (try graft.exprs.ExprLang.identifiers(e)
        catch {
          case ex: Exception =>
            err("cube", cubeName, Some(s"expression of '$n'"),
              s"cannot parse expression: ${ex.getMessage}")
            Set.empty[String]
        }).filter(exprOf.contains)
      }
      // DFS cycle detection over derived-name edges; each cycle reported
      // once, anchored at its lexicographically-first member
      val inCycle = scala.collection.mutable.Set.empty[String]
      def visit(n: String, stack: List[String]): Unit =
        if (!inCycle(n)) {
          val i = stack.indexOf(n)
          if (i >= 0) {
            val cycle = (n :: stack.take(i)).reverse
            if (!cycle.exists(inCycle)) {
              inCycle ++= cycle
              err("cube", cubeName, Some("expressions"),
                s"cyclic expression dependency: ${(cycle :+ n).mkString(" -> ")}")
            }
          } else deps(n).foreach(visit(_, n :: stack))
        }
      deps.keys.toSeq.sorted.foreach(visit(_, Nil))

      // joins + mappings: table.column shape
      def checkRef(kind: String, v: JValue): Unit = v match {
        case JString(s) =>
          if (!s.contains("."))
            err("cube", cubeName, Some(kind), s"expected table.column, got '$s'")
        case o: JObject =>
          if (str(o, "table").isEmpty)
            err("cube", cubeName, Some(kind), "missing 'table'")
        case JNothing =>
          err("cube", cubeName, Some(kind), "missing")
        case other =>
          err("cube", cubeName, Some(kind), s"bad reference: $other")
      }
      (c \ "joins") match {
        case JArray(js) => js.zipWithIndex.foreach {
          case (j: JObject, i) =>
            checkRef(s"joins[$i].master", j \ "master")
            checkRef(s"joins[$i].detail", j \ "detail")
          case (_, i) =>
            err("cube", cubeName, Some(s"joins[$i]"), "join must be an object")
        }
        case JNothing => ()
        case _ => err("cube", cubeName, Some("joins"), "'joins' must be an array")
      }
      (c \ "mappings") match {
        case jo: JObject => jo.obj.foreach { case (k, v) =>
          v match {
            // a bare column is legal: table defaults to the fact table
            // (reference to_column default_table, sql/query.py:64-100)
            case _: JString => ()
            case o: JObject if str(o, "column").isEmpty =>
              err("cube", cubeName, Some(s"mappings.$k"),
                "mapping object needs a 'column' (table defaults to the fact)")
            case _: JObject => ()
            case other =>
              err("cube", cubeName, Some(s"mappings.$k"), s"bad mapping: $other")
          }
        }
        case JNothing => ()
        case _ => err("cube", cubeName, Some("mappings"),
          "'mappings' must be an object")
      }
    }

    issues.toSeq
  }

  /** Counts by severity: (defaults, warnings, errors). */
  def counts(issues: Seq[ValidationIssue]): (Int, Int, Int) = (
    issues.count(_.severity == "default"),
    issues.count(_.severity == "warning"),
    issues.count(_.severity == "error"))

  /** The reference CLI's one-line verdict (`commands.py:191-204`). */
  def verdict(issues: Seq[ValidationIssue]): String = {
    val (defaults, warnings, errors) = counts(issues)
    if (errors > 0) "model can not be used"
    else if (warnings > 0)
      "not recommended to use the model, some issues might emerge"
    else if (defaults > 0)
      "model can be used, make sure that the defaults reflect reality"
    else "model can be used"
  }
}
