package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merged-series split specfile (SURVEY.md §2 — `tools/splitMergedSeries
  * .pl`, `-echo` mode): detects multi-echo series whose EchoNumber was
  * never set and sub-acquisitions merged into one series, and emits the
  * fix-up rows the reference writes to its specfile.
  *
  * Reference semantics preserved:
  *  - series key is (StudyInstanceUID, SeriesNumber) (`:150-182`);
  *  - echo counters are the 1-based rank of EchoTime sorted ascending
  *    within the series (`:243-246`);
  *  - a series with >1 EchoTime and UNDEF echo numbers gets one
  *    `EchoNumber = echoctr` row keyed by (SeriesNumber, StudyUID,
  *    EchoTime) (`:253-258`);
  *  - sub-acquisition detection walks images sorted by ImageNumber and
  *    starts a new group on same-position, too-small step (<0.1×thick),
  *    too-large step (>1.5×thick), or direction change
  *    (`split_on_slicepos_breaks:351-407`). NOTE the reference's
  *    `$slicethick = undef if ($slicethick != /^\d+$/)` compares the
  *    thickness to a match on `$_` — at RUNTIME the DICOM thickness is
  *    effectively always discarded and re-derived from the first
  *    nonzero inter-slice delta; this operator reproduces that actual
  *    behavior (the header value is never consulted);
  *  - in `-echo` mode each later sub-series gets per-image
  *    `EchoNumber = 100·subseries + echoctr` rows keyed by
  *    (SeriesNumber, StudyUID, ImageNumber) (`new_sub_series:435-440`,
  *    `:280-285`) — repeated dual-echo series become 1,2 / 101,102 /
  *    201,202…; sub-series 0 keeps its fields.
  *
  * Scale posture: one exchange keyed by (study, series[, TE]) — the
  * break scan is inherently sequential PER SERIES-ECHO (bounded: the
  * images of one acquisition), so it runs as `mapGroups` state inside
  * the partition; everything around it is window/join expressions.
  */
/** Encoder rows for [[SeriesSplitter]] — top-level so Catalyst's
  * generated projections can instantiate them. */
case class SliceImg(study: String, series: Int, te: Double,
    img: Int, pos: Double)
case class SliceSubSeries(study: String, series: Int, te: Double,
    img: Int, subseries: Int)

object SeriesSplitter {

  /** The reference's break walk, faithfully sequential. */
  private def subSeriesOf(imgs: Iterator[SliceImg]): Iterator[SliceSubSeries] = {
    val sorted = imgs.toSeq.sortBy(_.img)
    if (sorted.size < 2)
      return sorted.iterator.map(i =>
        SliceSubSeries(i.study, i.series, i.te, i.img, 0))
    var group = 0
    var dir: Option[Double] = None
    var thick: Option[Double] = None // runtime behavior: derived, never read
    val out = Seq.newBuilder[SliceSubSeries]
    out += SliceSubSeries(sorted.head.study, sorted.head.series,
      sorted.head.te, sorted.head.img, 0)
    for (i <- 1 until sorted.size) {
      val delta = sorted(i).pos - sorted(i - 1).pos
      if (dir.isEmpty && delta != 0) dir = Some(delta / math.abs(delta))
      if (thick.isEmpty && delta != 0) thick = Some(math.abs(delta))
      val t = thick.getOrElse(0.0)
      val break =
        math.abs(delta) < 1e-5 ||
          math.abs(delta) < 0.1 * t ||
          math.abs(delta) > 1.5 * t ||
          dir.exists(d => d > 0 && delta < 0) ||
          dir.exists(d => d < 0 && delta > 0)
      if (break) { group += 1; dir = None }
      out += SliceSubSeries(sorted(i).study, sorted(i).series, sorted(i).te,
        sorted(i).img, group)
    }
    out.result().iterator
  }

  /** Specfile rows, `-echo` mode. Input columns: StudyInstanceUID,
    * SeriesNumber, EchoTime, EchoNumber (null = the reference's UNDEF),
    * ImageNumber, SlicePosition. Output: (study_uid, series_number,
    * echo_time, image_number, field, value). */
  def splitSpec(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._

    val echoW = Window.partitionBy(col("StudyInstanceUID"),
      col("SeriesNumber")).orderBy(col("EchoTime"))
    val ranked = files.withColumn("echoctr",
      dense_rank().over(echoW))
    val seriesStats = files.groupBy(col("StudyInstanceUID"),
      col("SeriesNumber"))
      .agg(countDistinct(col("EchoTime")).as("n_te"))

    // one EchoNumber row per (series, TE) whose OWN echo is UNDEF
    // (`:253`: the per-TE $echo is tested, not the whole series)
    val echoRows = ranked
      .join(seriesStats, Seq("StudyInstanceUID", "SeriesNumber"))
      .filter(col("n_te") > 1 && col("EchoNumber").isNull)
      .select(col("StudyInstanceUID").as("study_uid"),
        col("SeriesNumber").as("series_number"),
        col("EchoTime").as("echo_time"), col("echoctr")).distinct()
      .select(col("study_uid"), col("series_number"), col("echo_time"),
        lit(null).cast("int").as("image_number"),
        lit("EchoNumber").as("field"), col("echoctr").as("value"))

    // sub-acquisition walk per (study, series, TE)
    val subs: Dataset[SliceSubSeries] = files
      .select(col("StudyInstanceUID").as("study"),
        col("SeriesNumber").as("series"), col("EchoTime").as("te"),
        col("ImageNumber").as("img"), col("SlicePosition").as("pos"))
      .as[SliceImg]
      .groupByKey(i => (i.study, i.series, i.te))
      .flatMapGroups((_, imgs) => subSeriesOf(imgs))
    val imageRows = subs.toDF()
      .filter(col("subseries") > 0)
      .join(ranked.select(col("StudyInstanceUID").as("study"),
        col("SeriesNumber").as("series"), col("EchoTime").as("te"),
        col("echoctr")).distinct(), Seq("study", "series", "te"))
      .select(col("study").as("study_uid"),
        col("series").as("series_number"),
        lit(null).cast("double").as("echo_time"),
        col("img").as("image_number"),
        lit("EchoNumber").as("field"),
        (col("subseries") * 100 + col("echoctr")).as("value"))

    echoRows.unionByName(imageRows)
  }
}
