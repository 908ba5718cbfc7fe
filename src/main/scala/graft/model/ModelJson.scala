package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON model loader: parses the reference's model-description format into
  * [[Cube]]/[[Dimension]] metadata, with the same expansion/defaulting
  * rules — bare-string dimensions become flat one-level dimensions, string
  * levels/attributes expand, templates clone other dimensions
  * (reference `expand_cube_metadata` `cube.py:781-826`,
  * `expand_dimension_metadata`/`expand_level_metadata`
  * `dimension.py:1238-1342`, templates `dimension.py:73-102`).
  */
object ModelJson {

  def loadString(json: String): Seq[Cube] = {
    val root = JsonMethods.parse(json)
    val dimDefs = (root \ "dimensions") match {
      case JArray(ds) => ds
      case _          => Nil
    }
    // resolve templates: a dimension may clone another's definition
    val byName = dimDefs.collect { case o: JObject =>
      str(o, "name").getOrElse(
        throw new IllegalArgumentException("dimension without a name")) -> o
    }.toMap
    val dims: Map[String, Dimension] = byName.map { case (n, o) =>
      n -> parseDimension(resolveTemplate(o, byName))
    }

    (root \ "cubes") match {
      case JArray(cs) => cs.collect { case o: JObject => parseCube(o, dims, byName) }
      case _          => Nil
    }
  }

  // ------------------------------------------------------------ helpers

  private def str(o: JValue, k: String): Option[String] = (o \ k) match {
    case JString(s) => Some(s)
    case _          => None
  }
  private def strList(o: JValue, k: String): Seq[String] = (o \ k) match {
    case JArray(xs)  => xs.collect { case JString(s) => s }
    case JString(s)  => Seq(s)
    case _           => Nil
  }
  private def intOpt(o: JValue, k: String): Option[Int] = (o \ k) match {
    case JInt(i) => Some(i.toInt)
    case _       => None
  }

  private def resolveTemplate(o: JObject, byName: Map[String, JObject],
      visiting: Set[String] = Set.empty): JObject =
    str(o, "template") match {
      case Some(t) =>
        require(!visiting.contains(t),
          s"circular dimension template chain at '$t'")
        val base0 = byName.getOrElse(t,
          throw new IllegalArgumentException(s"unknown dimension template '$t'"))
        // templates chain: the base may itself be templated — resolve it
        // first so A→B→C inherits C's fields instead of silently losing
        // them through B's unresolved template key
        val base = resolveTemplate(base0, byName, visiting + t)
        val merged = base.obj.filterNot(_._1 == "name").toMap ++
          o.obj.filterNot(_._1 == "template").toMap
        JObject(merged.toList)
      case None => o
    }

  private def parseAttribute(v: JValue, dim: Option[String], flat: Boolean): Attribute =
    v match {
      case JString(s) => Attribute(s, dim, flatRef = flat)
      case o: JObject =>
        Attribute(
          str(o, "name").getOrElse(throw new IllegalArgumentException(
            "attribute without a name")),
          dim, flatRef = flat,
          expression = str(o, "expression"),
          label = str(o, "label"),
          orderAttribute = str(o, "order_attribute"),
          order = str(o, "order"),
          locales = strList(o, "locales"))
      case other => throw new IllegalArgumentException(s"bad attribute: $other")
    }

  private def parseLevel(v: JValue, dim: String): Level = v match {
    case JString(s) =>
      Level(s, Seq(Attribute(s, Some(dim))))
    case o: JObject =>
      val name = str(o, "name").getOrElse(
        throw new IllegalArgumentException("level without a name"))
      val attrs0 = (o \ "attributes") match {
        case JArray(xs) => xs.map(parseAttribute(_, Some(dim), flat = false))
        case _          => Seq(Attribute(name, Some(dim)))
      }
      Level(name, attrs0,
        keyName = str(o, "key"),
        labelAttributeName = str(o, "label_attribute"),
        orderAttributeName = str(o, "order_attribute"),
        order = str(o, "order"),
        cardinality = str(o, "cardinality"),
        role = str(o, "role"),
        nonadditive = str(o, "nonadditive"))
    case other => throw new IllegalArgumentException(s"bad level: $other")
  }

  def parseDimension(o: JObject): Dimension = {
    val name = str(o, "name").getOrElse(
      throw new IllegalArgumentException("dimension without a name"))
    val levels = (o \ "levels") match {
      case JArray(ls) => ls.map(parseLevel(_, name))
      case _ =>
        (o \ "attributes") match {
          // dimension-level attribute list: one level holding them all
          // (reference expand_dimension_metadata, dimension.py:1238-1342)
          case JArray(attrs) =>
            Seq(Level(name, attrs.map(parseAttribute(_, Some(name), flat = false))))
          case _ =>
            // bare dimension: one flat level named after the dimension
            Seq(Level(name, Seq(Attribute(name, Some(name), flatRef = true))))
        }
    }
    // single-level single-attribute dims keep the flat (bare-name) ref
    val levelsFlat =
      if (levels.size == 1 && levels.head.attributes.size == 1 &&
        levels.head.attributes.head.name == name)
        Seq(levels.head.copy(attributes =
          levels.head.attributes.map(_.copy(flatRef = true))))
      else levels
    val plural = (o \ "hierarchies") match {
      case JArray(hs) => hs.collect { case h: JObject =>
        Hierarchy(str(h, "name").getOrElse("default"), strList(h, "levels"))
      }
      case _ => Nil
    }
    // singular shorthand: `"hierarchy": [levels]` expands to one default
    // hierarchy; combining both forms is an error (reference
    // expand_dimension_metadata, dimension.py:1277-1285)
    val singular = (o \ "hierarchy") match {
      case JArray(ls) => Some(Hierarchy("default", ls.collect { case JString(s) => s }))
      case _          => None
    }
    require(singular.isEmpty || plural.isEmpty,
      s"dimension '$name': both 'hierarchy' and 'hierarchies' specified. Use only one")
    val hiers = singular.map(Seq(_)).getOrElse(plural)
    Dimension(name, levelsFlat, hiers,
      defaultHierarchyName = str(o, "default_hierarchy_name"),
      role = str(o, "role"),
      cardinality = str(o, "cardinality"),
      nonadditive = str(o, "nonadditive"),
      label = str(o, "label"))
  }

  private def parseMeasure(v: JValue): Measure = v match {
    case JString(s) => Measure(s)
    case o: JObject => Measure(
      str(o, "name").getOrElse(throw new IllegalArgumentException(
        "measure without a name")),
      expression = str(o, "expression"),
      aggregates = { val a = strList(o, "aggregates"); if (a.isEmpty) Seq("sum") else a },
      nonadditive = str(o, "nonadditive"),
      windowSize = intOpt(o, "window_size"),
      label = str(o, "label"))
    case other => throw new IllegalArgumentException(s"bad measure: $other")
  }

  private def parseAggregate(v: JValue): MeasureAggregate = v match {
    case JString(s) => MeasureAggregate(s)
    case o: JObject => MeasureAggregate(
      str(o, "name").getOrElse(throw new IllegalArgumentException(
        "aggregate without a name")),
      function = str(o, "function"),
      measure = str(o, "measure"),
      expression = str(o, "expression"),
      windowSize = intOpt(o, "window_size"),
      label = str(o, "label"))
    case other => throw new IllegalArgumentException(s"bad aggregate: $other")
  }

  private def tableCol(s: String): (String, String) = s.split("\\.", 2) match {
    case Array(t, c) => (t, c)
    case _ => throw new IllegalArgumentException(s"expected table.column, got '$s'")
  }

  private def parseJoin(o: JObject): JoinSpec = {
    def key(k: String): (String, Seq[String]) = (o \ k) match {
      case JString(s) => val (t, c) = tableCol(s); (t, Seq(c))
      case jo: JObject =>
        (str(jo, "table").getOrElse(throw new IllegalArgumentException(
          s"join $k without table")), strList(jo, "column"))
      case other => throw new IllegalArgumentException(s"bad join key: $other")
    }
    val (mt, mc) = key("master")
    val (dt, dc) = key("detail")
    JoinSpec(mt, mc, dt, dc,
      alias = str(o, "alias"),
      method = str(o, "method").getOrElse(JoinMethod.Match),
      integrity = str(o, "integrity"))
  }

  /** A mapping without a table part names a column of the FACT table
    * (reference `to_column` `default_table`, `sql/query.py:64-100` — the
    * form the shipped example models use, e.g. `"item.line_item":
    * "line_item"` in hello_world). */
  private def parseMapping(v: JValue, defaultTable: String): PhysicalRef = v match {
    case JString(s) => s.split("\\.", 2) match {
      case Array(t, c) => PhysicalRef(t, c)
      case Array(c)    => PhysicalRef(defaultTable, c)
    }
    case o: JObject => PhysicalRef(
      str(o, "table").getOrElse(defaultTable),
      str(o, "column").getOrElse(throw new IllegalArgumentException(
        "mapping without column")),
      extract = str(o, "extract"),
      function = str(o, "function"))
    case other => throw new IllegalArgumentException(s"bad mapping: $other")
  }

  private def parseCube(o: JObject, dims: Map[String, Dimension],
      dimJsonByName: Map[String, JObject] = Map.empty): Cube = {
    val name = str(o, "name").getOrElse(
      throw new IllegalArgumentException("cube without a name"))
    val cubeDims = (o \ "dimensions") match {
      case JArray(ds) => ds.map {
        case JString(s) =>
          // bare name links a shared dimension, or expands to a flat one
          dims.getOrElse(s, Dimension.flat(s))
        case d: JObject if str(d, "name").exists(dims.contains) &&
            (d \ "levels") == JNothing && (d \ "template") == JNothing =>
          // dimension LINK with clone options (reference dimension_links,
          // `cube.py:519-530` → `Dimension.clone`, `dimension.py:473-559`)
          val base = dims(str(d, "name").get)
          val hiers = (d \ "hierarchies") match {
            case JArray(hs) => Some(hs.collect { case JString(h) => h })
            case _          => None
          }
          base.cloneWith(
            hierarchies = hiers,
            excludeHierarchies = strList(d, "exclude_hierarchies"),
            alias = str(d, "alias"),
            defaultHierarchyName = str(d, "default_hierarchy_name"),
            cardinality = str(d, "cardinality"),
            nonadditive = str(d, "nonadditive"))
        // cube-inline dimension (possibly templating a shared one)
        case d: JObject => parseDimension(resolveTemplate(d, dimJsonByName))
        case other => throw new IllegalArgumentException(s"bad dimension: $other")
      }
      case _ => Nil
    }
    // cube-level `nonadditive` is the default for its measures (reference
    // `Cube.from_metadata` / tests `test_inherit_nonadditive`)
    val cubeNonadditive = str(o, "nonadditive")
    val measures = ((o \ "measures") match {
      case JArray(ms) => ms.map(parseMeasure)
      case _          => Nil
    }).map(m =>
      if (m.nonadditive.isEmpty) m.copy(nonadditive = cubeNonadditive) else m)
    val aggregates = (o \ "aggregates") match {
      case JArray(as) => as.map(parseAggregate)
      case _ =>
        // defaults: per-measure declared aggregates + fact count
        // (reference cube.py:26-30, attributes.py:372-403)
        measures.flatMap(m => m.aggregates.map(f =>
          MeasureAggregate(s"${m.name}_$f", function = Some(f),
            measure = Some(m.name), windowSize = m.windowSize))) :+ Cube.FactCount
    }
    val joins = (o \ "joins") match {
      case JArray(js) => js.collect { case j: JObject => parseJoin(j) }
      case _          => Nil
    }
    val factTable = str(o, "fact").getOrElse(name)
    val mappings = (o \ "mappings") match {
      case jo: JObject =>
        jo.obj.map { case (k, v) => k -> parseMapping(v, factTable) }.toMap
      case _           => Map.empty[String, PhysicalRef]
    }
    Cube(name,
      factTable = factTable,
      dimensions = cubeDims,
      measures = measures,
      aggregates = aggregates,
      details = (o \ "details") match {
        case JArray(ds) => ds.map(parseAttribute(_, None, flat = false))
        case _          => Nil
      },
      joins = joins,
      mappings = mappings,
      keyColumn = str(o, "key"),
      label = str(o, "label"))
  }
}
