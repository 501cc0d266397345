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
    rebuildArchives(spark, dir, glob, { content =>
      val parsed = DicomTagParser.parse(content)
      val isDicom = parsed != null &&
        parsed.getOrElse("study_uid", "").nonEmpty
      val seriesOk = isDicom && series.forall { n =>
        // trimwhitespace + 0: Perl numeric coercion of the IS value —
        // the LEADING numeric prefix only ("1-2" coerces to 1; interior
        // signs and >19-digit strings made the old takeWhile+toLong
        // THROW where Perl never does), 0 when no digits lead
        val raw = parsed.getOrElse("series_number", "").trim
        "^[+-]?\\d{1,18}".r.findFirstIn(raw) match {
          case Some(p) if p.exists(_.isDigit) => p.toLong == n.toLong
          case _ => 0L == n.toLong
        }
      }
      if (isDicom && seriesOk) {
        val out = DicomTagWriter.setTags(content, tagSets)
        if (out != null) out else content
      } else content
    })
  }

  /** Parsed `updateHeadersBatch.pl` spec file: the key tag list (taken
    * from the FIRST data line only — `parse_specfile`'s `$madeKeyList`
    * latch) and the key-hash → set-list table. Key hashes join the RAW
    * key-column values with `---` terminators, exactly as the script
    * builds both sides of its lookup. */
  final case class BatchSpec(keyTags: Seq[(Int, Int)],
      setTable: Map[String, Seq[(String, String)]])

  private val TagSpecRe = "\\(([0-9a-fA-F]{4}),([0-9a-fA-F]{4})\\)".r

  /** `updateHeadersBatch.pl parse_specfile:233-263`: one series per line,
    * tab-separated; blank and `#` lines skipped; the first `keyCols`
    * column PAIRS are `(XXXX,YYYY)`-formatted key fields and their match
    * values, the remaining pairs are (dcmtk field name, new value) sets.
    * A trailing odd field is ignored (`$i<$#bits`), and a key column not
    * matching the tag pattern contributes nothing to the hash. The Perl
    * regex is an UNANCHORED substring match (`$bits[$i] =~ /\(..\)/`), so
    * a key field like `x(0020,0011)` still counts; a trailing key tag
    * with no value column appends an empty segment (`undef . "---"`). */
  def parseSpecFile(lines: Seq[String], keyCols: Int): BatchSpec = {
    var keyTags = Vector.empty[(Int, Int)]
    var made = false
    val table = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(String, String)]]
    lines.foreach { line =>
      if (line.nonEmpty && !line.startsWith("#")) {
        val bits = line.split('\t')
        var key = ""
        (0 until keyCols * 2 by 2).foreach { i =>
          if (i < bits.length)
            TagSpecRe.findFirstMatchIn(bits(i)).foreach { m =>
              if (!made) keyTags :+=
                ((Integer.parseInt(m.group(1), 16),
                  Integer.parseInt(m.group(2), 16)))
              key += (if (i + 1 < bits.length) bits(i + 1) else "") + "---"
            }
        }
        made = true
        val sets = (keyCols * 2 until bits.length - 1 by 2)
          .map(i => (bits(i), bits(i + 1)))
        table(key) = sets
      }
    }
    BatchSpec(keyTags, table.toMap)
  }

  /** `tools/updateHeadersBatch.pl` — the spec-file-driven batch form of
    * [[updateArchives]]: every DICOM member's key hash (the trimmed
    * values of the spec's key tags, `---`-joined) selects its set list;
    * members whose hash has no spec row — and non-DICOM members — ride
    * along untouched; every archive is rebuilt (`dicomTar -clobber`).
    * Unknown set field names throw up front, the analogue of `dcmodify`
    * failing on a bad `--insert-tag`. */
  def updateArchivesBatch(spark: SparkSession, dir: String,
      specLines: Seq[String], keyCols: Int = 1,
      glob: String = "*.{tar,tar.gz,tgz}"): Dataset[RebuiltArchive] = {
    val spec = parseSpecFile(specLines, keyCols)
    // The Perl file-side hash always has exactly keyCols `---` segments:
    // with fewer parsed key tags the find handler dies dereferencing
    // `@{$keys[$i]}` (strict refs) on the first DICOM file. Mirror that
    // up front — otherwise an empty keyTags list would make every file's
    // keyhash "" and a malformed first spec line would silently
    // mass-rewrite headers in every archive.
    require(spec.keyTags.size == keyCols,
      s"spec file defines ${spec.keyTags.size} key tag(s) but keyCols=" +
        s"$keyCols (updateHeadersBatch.pl:190-194 dies on this)")
    // resolve every set list to tag ints once, driver-side
    val setsByHash: Map[String, Map[Int, String]] = spec.setTable.map {
      case (hash, sets) => hash -> sets.map { case (name, v) =>
        DicomTagWriter.parseTagSpec(name).getOrElse(
          throw new IllegalArgumentException(
            s"unrecognized DICOM field: $name")) -> v
      }.toMap
    }
    val keyTags = spec.keyTags
    rebuildArchives(spark, dir, glob, { content =>
      val walked = DicomTagParser.describe(content)
      // e.value is NULL for non-text VRs and implicit-VR tags outside the
      // summary set — a spec key tag resolving to one of those must hash
      // as "" (Perl undef), not NPE the executor
      val isDicom = walked.exists(e =>
        e.group == 0x0020 && e.element == 0x000D &&
          Option(e.value).exists(_.nonEmpty))
      if (!isDicom) content
      else {
        val keyhash = keyTags.map { case (g, el) =>
          walked.find(e => e.group == g && e.element == el)
            .flatMap(e => Option(e.value)).map(_.trim).getOrElse("") + "---"
        }.mkString
        setsByHash.get(keyhash) match {
          case Some(sets) =>
            val out = DicomTagWriter.setTags(content, sets)
            if (out != null) out else content
          case None => content
        }
      }
    })
  }

  /** The shared extract → per-member update → rebuild dataflow: archives
    * expand partition-parallel, `update` runs row-local on every file
    * member, the rebuild regroups members per archive (ONE exchange keyed
    * by archive path — each group is one study archive, the boundedness
    * the reference assumes when extracting an archive into one tempdir).
    *
    * INTEGRITY CONTRACT: the rebuild trusts the parse. The hardened read
    * path ([[graft.sources.TarGzSource]]) deliberately stops at the first
    * malformed header / truncated gzip stream (its bomb-guard posture),
    * so an archive that fails integrity would rebuild SHORT — run the
    * read-side `scanAudit` first and exclude flagged archives; never
    * point a destructive header-update run at unaudited input. */
  private def rebuildArchives(spark: SparkSession, dir: String, glob: String,
      update: Array[Byte] => Array[Byte]): Dataset[RebuiltArchive] = {
    import spark.implicits._
    TarGzSource.members(spark, dir, glob)
      .groupByKey(_.archive_path)
      .mapGroups { (path, it) =>
        val ms = it.toSeq
        // nested bundles rebuild from their member rows; other members
        // update in place
        val nested = ms.filter(_.nested_in != null).groupBy(_.nested_in)
        // a directory member whose stored name lacks the trailing '/'
        // (legal in tar — dir-ness lives in the typeflag) must keep its
        // dir-ness through TarSink, which re-derives it from the name
        def dirName(p: String): String = if (p.endsWith("/")) p else p + "/"
        val entries = ms.filter(_.nested_in == null)
          .sortBy(_.member_path)
          .map { m =>
            if (nested.contains(m.member_path)) {
              val inner = nested(m.member_path).sortBy(_.member_path).map {
                im =>
                  (if (im.is_dir) dirName(im.member_path)
                  else im.member_path) ->
                    (if (im.is_dir) Array.emptyByteArray
                    else update(im.content))
              }
              m.member_path -> TarSink.gzipBytes(TarSink.tarBytes(inner))
            } else if (m.is_dir) dirName(m.member_path) -> Array.emptyByteArray
            else m.member_path -> update(m.content)
          }
        // a .tar.gz/.tgz outer archive must be rewritten gzip-compressed —
        // a plain tar under the unchanged gz name lies to every consumer
        // that trusts the extension
        val tar = TarSink.tarBytes(entries)
        val content = if (path.endsWith(".tar.gz") || path.endsWith(".tgz"))
          TarSink.gzipBytes(tar) else tar
        RebuiltArchive(path, content)
      }
  }

  /** Round-trip proof surface: expand the REBUILT archives and re-parse
    * every DICOM member — the values seen here went through
    * write → tar → gzip → tar → read. */
  def reparse(rebuilt: Dataset[RebuiltArchive]): DataFrame = {
    import rebuilt.sparkSession.implicits._
    rebuilt.flatMap { r =>
      TarGzSource.expandArchive(r.archive_path, r.content).flatMap { m =>
        // TOP-LEVEL members parse too: updateArchives rewrites them, and
        // skipping them made this proof surface vacuous for flat archives
        // (nested bundle blobs parse as non-DICOM and drop naturally)
        if (m.is_dir) Nil
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
