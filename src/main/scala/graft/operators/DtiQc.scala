package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DTIPrep data-plane operators (`DTIPrep/DTI/DTI.pm`): the XML protocol /
  * QC-report parse (`readDTIPrepXMLprot`, DTI.pm:282-293), the rejected-
  * directions summary (`getRejectedDirections`, DTI.pm:1151-1233), its
  * header-feedback projection (`DTIPrepRegister.pl insertPipelineSummary`,
  * :1252-1300) and the protocol-driven output naming
  * (`createDTIhashref`/`determinePreprocOutputs`, DTI.pm:324-397).
  *
  * The pipeline driver itself (DTIPrep binary, minc tool calls) is
  * external-tool orchestration and stays out of scope; everything here is
  * the catalog-facing data plane that feeds the already-modeled
  * processed-file registration ([[ProcessedRegistration]]).
  *
  * Scale posture: the XML parse is a row-local flatMap (reports are
  * KB-sized headers, one per scan — never a shuffle of report bodies);
  * the summary is one count-style agg keyed by report id; the naming
  * projection joins a 1-row broadcast suffix frame. All map-shaped.
  */
object DtiQc {

  /** Row-local parse of the DTIPrep XML dialect (`XML::Simple` with
    * `KeyAttr => {entry => 'parameter'}`): nested
    * `<entry parameter="NAME">` elements form a '/'-joined path; their
    * non-entry leaf children (`<value>`, `<processing>`, ...) become one
    * (path, name, value) triple each, document order preserved.
    * Unparseable XML yields no rows (the reference would die; the batch
    * form must not poison the partition). DOCTYPE is rejected — report
    * bodies are untrusted bytes, so no entity expansion ever runs. */
  def parseEntries(xml: String): Seq[(String, String, String)] = {
    import javax.xml.parsers.DocumentBuilderFactory
    import org.w3c.dom.Element
    val dbf = DocumentBuilderFactory.newInstance()
    try {
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl",
        true)
    } catch { case _: Exception => () }
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc =
      try dbf.newDocumentBuilder().parse(new org.xml.sax.InputSource(
        new java.io.StringReader(xml)))
      catch { case _: Exception => return Nil }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def children(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
    }
    def walk(e: Element, path: String): Unit = children(e).foreach { c =>
      if (c.getTagName == "entry") {
        val p = Option(c.getAttribute("parameter")).filter(_.nonEmpty)
          .getOrElse("?")
        walk(c, if (path.isEmpty) p else s"$path/$p")
      } else if (children(c).isEmpty) {
        out += ((path, c.getTagName,
          Option(c.getTextContent).map(_.trim).getOrElse("")))
      } else walk(c, path)
    }
    walk(doc.getDocumentElement, "")
    out.toSeq
  }

  /** `readDTIPrepXMLprot` as a relation: one row per leaf element of each
    * document — (idCol, `path`, `name`, `value`). */
  def protocolRows(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(xmlCol)).as[(String, String)]
      .flatMap { case (id, xml) =>
        parseEntries(xml).map(t => (id, t._1, t._2, t._3))
      }
      .toDF(idCol, "path", "name", "value")
  }

  /** `getRejectedDirections` (DTI.pm:1151-1233): per QC XML report, the
    * gradient-exclusion summary — total/excluded/included counts, per-
    * artifact counts and the reference's quoted `'Directions i,j(n)'`
    * strings. Direction lists are ordered by gradient NUMBER ascending
    * (the reference iterates a Perl hash, whose order is
    * nondeterministic run-to-run — an ordered list is the only
    * reproducible reading of the same data). Gradient numbers strip the
    * `gradient_0...` prefix exactly as the reference's substitution does. */
  def rejectedDirections(reports: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    val grads = protocolRows(reports, idCol, xmlCol)
      .filter(col("name") === "processing" &&
        col("path").rlike("(?i)^DWI Check/gradient_[0-9]+$"))
      .select(col(idCol),
        regexp_replace(element_at(split(col("path"), "/"), -1),
          "(?i)^gradient_0*", "").as("grad"),
        upper(col("value")).as("status"))
      .withColumn("excl_type",
        when(col("status").contains("EXCLUDE_SLICECHECK"), "slice")
          .when(col("status").contains("EXCLUDE_GRADIENTCHECK"), "intergrad")
          .when(col("status").contains("EXCLUDE_INTERLACECHECK"), "interlace"))
    def nbFor(t: String) =
      count(when(col("excl_type") === t, lit(1))).as(s"${t}_nb")
    def txtFor(t: String) = concat(lit("'Directions "),
      array_join(transform(
        array_sort(collect_list(when(col("excl_type") === t,
          struct(col("grad").cast("int").as("n"), col("grad").as("s"))))),
        x => x("s")), ","),
      lit("("), count(when(col("excl_type") === t, lit(1))).cast("string"),
      lit(")'")).as(s"${t}_txt")
    grads.groupBy(col(idCol)).agg(
      count(lit(1)).as("total_nb"),
      count(col("excl_type")).as("excluded_nb"),
      (count(lit(1)) - count(col("excl_type"))).as("included_nb"),
      nbFor("slice"), txtFor("slice"),
      nbFor("intergrad"), txtFor("intergrad"),
      nbFor("interlace"), txtFor("interlace"))
  }

  /** `insertPipelineSummary` (DTIPrepRegister.pl:1252-1300): the summary
    * as minc-header FEEDBACK rows — (idCol, `header`, `value`) long form,
    * ready for the header-update sink. `DTIPrepNoReg` scan types skip the
    * intergradient header and subtract its count from `total_rejected`,
    * exactly as the reference branches. */
  def pipelineSummaryHeaders(reports: DataFrame, idCol: String,
      xmlCol: String, scanTypeCol: String): DataFrame = {
    val s = rejectedDirections(reports, idCol, xmlCol)
      .join(reports.select(col(idCol).cast("string").as(idCol),
        col(scanTypeCol)), Seq(idCol))
    val noReg = upper(col(scanTypeCol)).contains("DTIPREPNOREG")
    val rows = array(
      struct(lit("processing:slicewise_rejected").as("header"),
        col("slice_txt").as("value")),
      struct(lit("processing:interlace_rejected").as("header"),
        col("interlace_txt").as("value")),
      when(!noReg,
        struct(lit("processing:intergradient_rejected").as("header"),
          col("intergrad_txt").as("value"))),
      struct(lit("processing:total_rejected").as("header"),
        when(noReg, col("excluded_nb") - col("intergrad_nb"))
          .otherwise(col("excluded_nb")).cast("string").as("value")))
    s.select(col(idCol), explode(rows).as("h"))
      .filter(col("h").isNotNull)
      .select(col(idCol), col("h.header").as("header"),
        col("h.value").as("value"))
  }

  /** `createDTIhashref`/`determinePreprocOutputs` (DTI.pm:324-397): the
    * protocol-driven output-naming convention, one row per raw DWI file —
    * raw nrrd, copied protocol, XML/txt QC reports, QCed nrrd/minc. The
    * two suffixes come from the parsed protocol
    * (`QC_reportFileNameSuffix`, `QC_QCedDWIFileNameSuffix` minus its
    * trailing `.nrrd`), joined as a 1-row broadcast. */
  def preprocOutputs(files: DataFrame, pathCol: String, qcOutDir: String,
      protocolName: String, protocol: DataFrame): DataFrame = {
    val sfx = protocol.agg(
      max(when(col("path") === "QC_reportFileNameSuffix" &&
        col("name") === "value", col("value"))).as("__txt_sfx"),
      max(when(col("path") === "QC_QCedDWIFileNameSuffix" &&
        col("name") === "value", col("value"))).as("__qced_raw"))
      .withColumn("__qced_sfx", expr(
        "substring(__qced_raw, 1, length(__qced_raw) - 5)"))
    val base = element_at(split(col(pathCol), "/"), -1)
    val dtiName = base.substr(lit(1), length(base) - 4)
    files.crossJoin(broadcast(sfx)).select(
      col(pathCol),
      concat(lit(s"$qcOutDir/"), dtiName, lit(".nrrd")).as("raw_nrrd"),
      lit(s"$qcOutDir/$protocolName").as("qc_protocol"),
      concat(lit(s"$qcOutDir/"), dtiName, lit("_XMLQCResult.xml"))
        .as("qc_report_xml"),
      concat(lit(s"$qcOutDir/"), dtiName, col("__txt_sfx"))
        .as("qc_report_txt"),
      concat(lit(s"$qcOutDir/"), dtiName, col("__qced_sfx"), lit(".nrrd"))
        .as("qced_nrrd"),
      concat(lit(s"$qcOutDir/"), dtiName, col("__qced_sfx"), lit(".mnc"))
        .as("qced_minc"))
  }
}
