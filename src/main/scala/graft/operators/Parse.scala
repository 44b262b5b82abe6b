package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** OCR-lines → card-fields parser (SURVEY §2.B1-B6, B10).
  *
  * Reference: GetTextFromS3Image/get_text_from_s3_image.py:19-56
  * (`parse_textract_data`):
  *  - company, name, job_title := lines[0..2] (positional; a card with
  *    fewer than 3 lines raises → error channel, :50-54)
  *  - for every line, try email / address / phone extractors; a
  *    non-empty result OVERWRITES the field — i.e. the LAST matching
  *    line wins (:43-48)
  *  - within a line, the FIRST regex match is taken (:20-23, :31-35)
  *  - address lines are detected by a stopword score >= 3 (:25-29)
  *
  * Implementation is pure built-in expressions — higher-order array
  * functions over `text_lines`, no explode, no UDF — so one input row
  * stays one output row and the whole parse is a single codegen'd
  * projection (no shuffle at any scale).
  */
object Parse {

  /** Last-matching-line-wins fold: pick the last element of
    * `filter(lines, pred)` then apply the extractor to that line.
    * `try_element_at` (not `element_at`): under ANSI mode (Spark 4
    * default) `element_at(-1)` on an empty array throws; we want null →
    * coalesced to '' (the reference initializes fields to '' — :37-42).
    */
  private def lastMatching(lines: org.apache.spark.sql.Column,
                           pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    try_element_at(filter(lines, pred), lit(-1))

  /** Parse a DataFrame bearing `text_lines: array<string>` into card
    * fields. Rows with < 3 lines get `parse_error = true` and null
    * positional fields (the reference's crash-→-error-counter path,
    * get_text_from_s3_image.py:51,196-201, re-expressed as an error
    * side-channel so the batch keeps flowing — SURVEY §2.J5).
    */
  def parseCardLines(ocr: DataFrame, linesCol: String = "text_lines"): DataFrame = {
    val lines = col(linesCol)
    val ok = size(lines) >= 3

    ocr
      .withColumn("parse_error", !ok)
      .withColumn("company", when(ok, element_at(lines, 1)))
      .withColumn("name", when(ok, element_at(lines, 2)))
      .withColumn("job_title", when(ok, element_at(lines, 3)))
      .withColumn("email",
        coalesce(extractEmail(lastMatching(lines, l => extractEmail(l) =!= lit(""))), lit("")))
      .withColumn("phone_number",
        coalesce(extractPhone(lastMatching(lines, l => extractPhone(l) =!= lit(""))), lit("")))
      .withColumn("addr",
        coalesce(lastMatching(lines, l => addrScore(l) >= 3), lit("")))
  }

  /** Enrich parsed cards into the search-document shape
    * (upsert_bizcard_to_es.py:66-75): doc_id, image_id, owner, is_alive,
    * content_id. Requires `s3_key` plus the parsed fields.
    */
  def enrich(cards: DataFrame): DataFrame =
    cards
      .withColumn("image_id", imageId(col("s3_key")))
      .withColumn("doc_id", md5_8(col("image_id")))
      .withColumn("owner", ownerFromKey(col("s3_key")))
      .withColumn("is_alive", lit(1))
      .withColumn("content_id",
        contentId(col("name"), col("email"), col("phone_number")))
}
