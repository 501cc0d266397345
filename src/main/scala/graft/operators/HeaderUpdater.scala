package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DicomTagParser, DicomTagWriter, TarGzSource, TarArchive, TarSink}

/** `tools/updateHeaders.pl` — update DICOM headers across a study archive
  * (optionally one series) and rebuild the archive — as a distributed
  * dataflow: archives expand partition-parallel (the script's tempdir
  * extract), the `dcmodify --insert` step becomes a row-local
  * [[graft.sources.DicomTagWriter]] pass, and the rebuild
  * (`dicomTar.pl -clobber`) regroups members per archive.
  *
  * Reference fidelity (`updateHeaders.pl:165-209,283-313`):
  *  - a file counts as DICOM when StudyInstanceUID is non-empty
  *    (`$studyUID eq "" → not dicom`);
  *  - `-series N` compares `trimwhitespace(SeriesNumber) + 0` — i.e. the
  *    NUMERIC value — against the target;
  *  - every `-set` pair is applied as insert-or-modify to every selected
  *    file; non-DICOM members ride along untouched.
  *
  * Scale: expansion and header-rewrite are one map-side pass over the
  * archive scan (no shuffle); the rebuild shuffles once, keyed by archive
  * — each group is one study archive, the same boundedness the reference
  * assumes when it extracts a whole archive into one tempdir. A
  * million-archive catalog update is one exchange keyed by archive path.
  */
object HeaderUpdater {

  /** One rebuilt archive. */
  final case class RebuiltArchive(archive_path: String, content: Array[Byte])

  /** Apply `sets` to the DICOM members of every archive under `dir` and
    * rebuild each archive (outer tar, nested `.tar.gz` bundles re-gzipped).
    *
    * @param sets field-name/value pairs, names in either script spelling
    *             (`(xxxx,yyyy)` or dcmtk name)
    * @param targetSeries when set, only files of that series number are
    *                     touched
    */
  def updateArchives(spark: SparkSession, dir: String,
                     sets: Seq[(String, String)],
                     targetSeries: Option[Int] = None,
                     glob: String = "*.{tar,tar.gz,tgz}"): Dataset[RebuiltArchive] = {
    import spark.implicits._
    val tagSets: Map[Int, String] = sets.map { case (spec, v) =>
      val tag = DicomTagWriter.parseTagSpec(spec).getOrElse(
        throw new IllegalArgumentException(s"unrecognized DICOM field: $spec"))
      tag -> v
    }.toMap
    val series = targetSeries
    TarGzSource.members(spark, dir, glob)
      .groupByKey(_.archive_path)
      .mapGroups { (path, it) =>
        val ms = it.toSeq
        def updateBytes(content: Array[Byte]): Array[Byte] = {
          val parsed = DicomTagParser.parse(content)
          val isDicom = parsed != null &&
            parsed.getOrElse("study_uid", "").nonEmpty
          val seriesOk = isDicom && series.forall { n =>
            // trimwhitespace + 0: Perl numeric coercion of the IS value
            val raw = parsed.getOrElse("series_number", "").trim
            raw.takeWhile(c => c.isDigit || c == '-' || c == '+') match {
              case s if s.nonEmpty &&
                s.exists(_.isDigit) => s.toLong == n.toLong
              case _ => 0L == n.toLong
            }
          }
          if (isDicom && seriesOk) {
            val out = DicomTagWriter.setTags(content, tagSets)
            if (out != null) out else content
          } else content
        }
        // nested bundles rebuild from their member rows; other members
        // update in place
        val nested = ms.filter(_.nested_in != null).groupBy(_.nested_in)
        val entries = ms.filter(_.nested_in == null)
          .sortBy(_.member_path)
          .map { m =>
            if (nested.contains(m.member_path)) {
              val inner = nested(m.member_path).sortBy(_.member_path).map {
                im =>
                  im.member_path -> (if (im.is_dir) Array.emptyByteArray
                  else updateBytes(im.content))
              }
              m.member_path -> TarSink.gzipBytes(TarSink.tarBytes(inner))
            } else if (m.is_dir) m.member_path -> Array.emptyByteArray
            else m.member_path -> updateBytes(m.content)
          }
        RebuiltArchive(path, TarSink.tarBytes(entries))
      }
  }

  /** Round-trip proof surface: expand the REBUILT archives and re-parse
    * every DICOM member — the values seen here went through
    * write → tar → gzip → tar → read. */
  def reparse(rebuilt: Dataset[RebuiltArchive]): DataFrame = {
    import rebuilt.sparkSession.implicits._
    rebuilt.flatMap { r =>
      TarGzSource.expandArchive(r.archive_path, r.content).flatMap { m =>
        if (m.is_dir || m.nested_in == null) Nil
        else {
          val parsed = DicomTagParser.parse(m.content)
          if (parsed == null || parsed.getOrElse("study_uid", "").isEmpty) Nil
          else Seq((m.member_path, parsed.getOrElse("series_number", null),
            parsed.getOrElse("patient_name", null),
            parsed.getOrElse("patient_id", null),
            parsed.getOrElse("institution", null)))
        }
      }
    }.toDF("member_path", "series_number", "patient_name", "patient_id",
      "institution")
  }
}
