package graft.profile

/** API-source extraction cores (SURVEY.md §2.1 S10/S11): the parse,
  * validate, and select logic of the CKAN and FAOSTAT runners, minus
  * the HTTP transport (zero egress — a downloader hands these the
  * response bodies). The period-desc/latest-N ordering they feed is
  * `operators.Discovery.selectLatest` in relational form. */
object Ckan {

  /** package_show policy gate (reference
    * datasets/supranational/runner.py:387-395): public, active, open,
    * and — when a license allow-list is configured — license-accepted. */
  def validatePackage(pkg: JObj, acceptedLicenses: Seq[String] = Nil): Either[String, Unit] = {
    val m = pkg.v.toMap
    def str(k: String) = m.get(k).collect { case JStr(s) => s }.getOrElse("")
    if (m.get("private").contains(JBool(true))) Left("package is private")
    else if (!Set("", "active").contains(str("state").toLowerCase)) Left(s"state=${str("state")}")
    else if (!m.get("isopen").contains(JBool(true))) Left("package is not open")
    else if (acceptedLicenses.nonEmpty && !acceptedLicenses.contains(str("license_id")))
      Left(s"license not accepted: ${str("license_id")}")
    else Right(())
  }

  /** The package's resource dicts (non-dict entries dropped, the
    * reference's isinstance filter, cvm/ckan_dataset.py:336-339). */
  def resources(pkg: JObj): Seq[JObj] =
    pkg.v.toMap.get("resources") match {
      case Some(JArr(xs)) => xs.collect { case o: JObj => o }
      case _ => Nil
    }

  private def field(r: JObj, k: String): String =
    r.v.toMap.get(k).collect { case JStr(s) => s }.getOrElse("")

  /** Filename from the resource URL path (unquoted last segment) with
    * the name/format fallback (cvm/ckan_dataset.py:190-206). */
  def filenameOf(r: JObj): String = {
    val url = field(r, "url")
    val path = try java.net.URLDecoder.decode(
      new java.net.URI(url).getPath match { case null => ""; case p => p }, "UTF-8")
    catch { case _: Exception => "" }
    val name = path.split('/').lastOption.getOrElse("")
    if (name.nonEmpty && !Set("view", "baixar", "consulta").contains(name.toLowerCase)
        && name.contains('.')) name
    else {
      val fallback = Option(field(r, "name")).filter(_.nonEmpty).getOrElse(
        if (name.nonEmpty) name else "download")
      val fmt = field(r, "format").trim.toLowerCase
      val safe = fallback.trim.replaceAll("[^A-Za-z0-9._-]+", "_")
        .replaceAll("^[._-]+|[._-]+$", "") match { case "" => "download"; case x => x }
      if (fmt.nonEmpty && !safe.toLowerCase.endsWith(s".$fmt")) s"$safe.$fmt" else safe
    }
  }

  /** URL + state + include/exclude policy (P10 family;
    * cvm/ckan_dataset.py:213-236 core). The match target is
    * filename + name + description + format, case-insensitive. */
  def resourceAllowed(r: JObj, allowedHosts: Seq[String],
                      include: Seq[String] = Nil, exclude: Seq[String] = Nil): Boolean = {
    val url = field(r, "url").trim
    val host = try Option(new java.net.URI(url)).filter(_.getScheme == "https")
      .flatMap(u => Option(u.getHost)).map(_.toLowerCase).getOrElse("")
    catch { case _: Exception => "" }
    val stateOk = {
      val s = field(r, "state"); s.isEmpty || s.toLowerCase == "active"
    }
    val target = Seq(filenameOf(r), field(r, "name"), field(r, "description"),
      field(r, "format")).mkString(" ")
    def matches(ps: Seq[String]) =
      ps.exists(p => ("(?i)" + p).r.findFirstIn(target).isDefined)
    stateOk && host.nonEmpty && allowedHosts.contains(host) &&
      (include.isEmpty || matches(include)) && !matches(exclude)
  }

  private val DefaultPeriodRe = "((?:19|20)\\d{2})(?:[-_]?([01]\\d))?".r

  /** Period key for latest-N ordering (cvm/ckan_dataset.py:248-264):
    * period regex over filename+name, else last_modified/created date
    * prefix, else "current". */
  def periodOf(r: JObj): String = {
    val target = filenameOf(r) + " " + field(r, "name")
    DefaultPeriodRe.findFirstMatchIn(target).map { m =>
      Option(m.group(2)).filter(_ != null).map(mm => s"${m.group(1)}-$mm")
        .getOrElse(m.group(1))
    }.getOrElse {
      val modified = (field(r, "last_modified") match {
        case "" => field(r, "created"); case x => x
      }).trim
      if (modified.length >= 10 && modified.take(10).matches("\\d{4}-\\d{2}-\\d{2}"))
        modified.take(10)
      else "current"
    }
  }

  /** Allowed resources sorted period-desc then filename-desc, top
    * `limit` (cvm/ckan_dataset.py:267-275 — the driver-side twin of
    * Discovery.selectLatest). */
  def selectResources(pkg: JObj, allowedHosts: Seq[String], limit: Int,
                      include: Seq[String] = Nil, exclude: Seq[String] = Nil): Seq[JObj] =
    resources(pkg)
      .filter(resourceAllowed(_, allowedHosts, include, exclude))
      .sortBy(r => (periodOf(r), filenameOf(r)))(Ordering.Tuple2(
        Ordering.String.reverse, Ordering.String.reverse))
      .take(limit)
}

/** FAOSTAT XML catalog lookup (S11,
  * datasets/supranational/runner.py:422-431): the first element whose
  * children carry DatasetCode/Code equal to `code` (case-insensitive)
  * yields its FileLocation. Namespace-agnostic DOM walk. */
object Faostat {
  def fileLocation(xml: String, code: String): Option[String] = {
    val wanted = code.trim.toUpperCase
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = try dbf.newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
    catch { case _: Exception => return None }
    val all = doc.getElementsByTagName("*")
    (0 until all.getLength).iterator.flatMap { i =>
      val node = all.item(i)
      val kids = node.getChildNodes
      val fields = (0 until kids.getLength).map(kids.item)
        .filter(_.getNodeType == org.w3c.dom.Node.ELEMENT_NODE)
        .map(n => (n.getLocalName match { case null => n.getNodeName; case l => l },
          Option(n.getTextContent).getOrElse("").trim))
        .toMap
      val codeVal = fields.get("DatasetCode").orElse(fields.get("Code"))
      val loc = fields.get("FileLocation").orElse(fields.get("fileLocation"))
      if (codeVal.exists(_.trim.toUpperCase == wanted) && loc.exists(_.nonEmpty)) loc
      else None
    }.nextOption()
  }
}
