package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HED tag-group parser (SURVEY.md §2.8 regex-as-data family): a faithful
  * port of the reference's reverse-iteration stack machine
  * (`python/lib/physio/hed.py:34-121`), producing one member per tag plus
  * synthetic members for nested parenthesized groups, each carrying
  * (tag, hasPairing, additionalMembers).
  *
  * The reference resolves tag names to schema-node ids inline; we return the
  * stripped tag NAME (NULL for synthetic group members) — joining to a HED
  * schema dictionary afterwards is the standard get-or-create pattern
  * ([[graft.operators.Catalog.getOrCreate]]).
  *
  * Row-local by nature → implemented as a UDF returning nested structs,
  * exploded to rows by [[explodeHedString]] (the UDTF shape).
  */
object HedParser {

  case class HedMember(tag: Option[String], hasPairing: Boolean, additionalMembers: Int)

  private def countChar(s: String, c: Char): Int = s.count(_ == c)

  /** `get_additional_members_from_parenthesis_index` (`hed.py:34-60`). */
  private def additionalMembersFrom(
      stringSplit: Array[String], parenthesesToFind: Int, endIndex: Int): Int = {
    var leftToFind = parenthesesToFind
    val sub = stringSplit.drop(stringSplit.length - endIndex - 1)
    var additional = 0
    var i = 0
    while (i < sub.length) {
      val el = sub(i)
      leftToFind -= countChar(el, ')')
      if (i > 0) leftToFind += countChar(el, '(')
      if (leftToFind == 1 && el.endsWith(")")) additional += 1
      if (leftToFind < 1) return additional
      i += 1
    }
    0
  }

  /** `build_hed_tag_groups` (`hed.py:63-121`). */
  def parse(hedString: String): Seq[Seq[HedMember]] = {
    if (hedString == null || hedString.trim.isEmpty) return Seq.empty
    val stringSplit = hedString.split(",", -1)
    var groupDepth = 0
    val tagGroups = scala.collection.mutable.ArrayBuffer.empty[Seq[HedMember]]
    var tagGroup = scala.collection.mutable.ArrayBuffer.empty[HedMember]

    for ((splitElement, elementIndex) <- stringSplit.reverse.zipWithIndex) {
      if (groupDepth == 0 && tagGroup.nonEmpty) {
        tagGroups += tagGroup.toSeq
        tagGroup = scala.collection.mutable.ArrayBuffer.empty[HedMember]
      }
      val element = splitElement.trim
      val rightStripped = element.reverse.dropWhile(_ == ')').reverse
      val leftStripped = rightStripped.dropWhile(_ == '(')
      val numOpening = rightStripped.length - leftStripped.length

      val hasPairing = element.startsWith("(") &&
        (groupDepth == 0 || !element.endsWith(")"))
      val additional =
        if (hasPairing) additionalMembersFrom(stringSplit, 1, elementIndex) else 0
      tagGroup += HedMember(
        if (leftStripped.isEmpty) None else Some(leftStripped), hasPairing, additional)

      val start =
        if (groupDepth > 0 && element.startsWith("(") && element.endsWith(")")) 0 else 1
      var i = start
      while (i < numOpening) {
        tagGroup += HedMember(None, hasPairing = true,
          additionalMembersFrom(stringSplit, i + 1, elementIndex))
        i += 1
      }
      groupDepth += element.length - rightStripped.length
      groupDepth -= numOpening
    }
    if (tagGroup.nonEmpty) tagGroups += tagGroup.toSeq
    tagGroups.toSeq
  }

  private val parseUdf = udf((s: String) => parse(s))

  /** UDTF shape: one output row per tag-group member —
    * (input columns..., group_index, member_index, tag, has_pairing,
    * additional_members). */
  def explodeHedString(df: DataFrame, hedCol: String): DataFrame =
    df.withColumn("__groups", parseUdf(col(hedCol)))
      .select(col("*"), posexplode(col("__groups")).as(Seq("group_index", "__members")))
      .select(col("*"), posexplode(col("__members")).as(Seq("member_index", "__m")))
      .select(
        df.columns.map(col) ++ Seq(
          col("group_index"), col("member_index"),
          col("__m.tag").as("tag"),
          col("__m.hasPairing").as("has_pairing"),
          col("__m.additionalMembers").as("additional_members")): _*)
}
