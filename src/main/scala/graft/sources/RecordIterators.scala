package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference ObjectBank's record-iterator layer as Spark sources
  * (objectbank/LineIterator.java, DelimitRegExIterator.java:37-55,
  * XMLBeginEndIterator.java:62-117): a corpus file is cut into STRING RECORDS
  * before any tokenization; readers/classifiers consume records.
  *
  * Scale shapes:
  *  - line records ride `spark.read.text` — files are split at block
  *    boundaries and the scan parallelizes within a file, no driver work;
  *  - delimiter/XML records can span lines, so (like every record format
  *    without sync markers) the parallel unit is the FILE:
  *    `spark.read.option("wholetext", true)` gives one row per file and the
  *    record fold runs partition-locally. At 100 TB the corpus is many files,
  *    so per-file parallelism saturates the cluster; a single monolithic file
  *    is a data-layout bug no engine can split on an arbitrary regex.
  * Every record carries (file, record_idx) so downstream joins/resume have a
  * stable key.
  */
object RecordIterators {

  /** DelimitRegExIterator semantics (:37-55): join lines with \n, strip one
    * leading `^delim` match and one trailing `delim$` match, trim, then
    * Java-split on the delimiter regex (trailing empty strings dropped).
    */
  def delimitRecords(content: String, delimiter: String): Seq[String] = {
    var line = content.linesIterator.mkString("", "\n", "\n")
    line = ("^" + delimiter).r.replaceAllIn(line, "")
    line = (delimiter + "$").r.replaceAllIn(line, "")
    line = line.trim
    line.split(delimiter).toSeq
  }

  /** XMLBeginEndIterator semantics (:62-117): emit the text between each
    * begin/end tag pair whose NAME matches `tagNameRegexp` (full match); text
    * outside matching elements is discarded; internal (non-matching) tags are
    * dropped unless `keepInternalTags`; the delimiting tags themselves are
    * dropped unless `keepDelimitingTags`. An element left open at EOF is
    * dropped (the reference returns null mid-element). Minimal tag scanner:
    * a tag is `<` .. `>`, its name the first token (leading `/` = end tag) —
    * the same model as the reference's XMLUtils.readAndParseTag for the
    * well-formed inputs this layer is used on.
    */
  def xmlRecords(content: String, tagNameRegexp: String,
      keepInternalTags: Boolean = false, keepDelimitingTags: Boolean = false): Seq[String] = {
    val namePat = tagNameRegexp.r
    def nameOf(tag: String): (String, Boolean) = { // (name, isEnd)
      val inner = tag.substring(1, tag.length - 1).trim
      val isEnd = inner.startsWith("/")
      val body = if (isEnd) inner.substring(1).trim else inner
      val name = body.takeWhile(c => !c.isWhitespace && c != '/' && c != '>')
      (name, isEnd)
    }
    val out = Vector.newBuilder[String]
    var i = 0
    val n = content.length
    def nextTag(from: Int): Option[(Int, Int)] = { // [start, end) of "<...>"
      val lt = content.indexOf('<', from)
      if (lt < 0) return None
      val gt = content.indexOf('>', lt + 1)
      if (gt < 0) None else Some((lt, gt + 1))
    }
    while (i < n) {
      // seek a matching begin tag
      var begin: Option[(Int, Int)] = None
      var scan = i
      while (begin.isEmpty && scan < n) {
        nextTag(scan) match {
          case None => scan = n
          case Some((s, e)) =>
            val (nm, isEnd) = nameOf(content.substring(s, e))
            if (!isEnd && namePat.matches(nm)) begin = Some((s, e)) else scan = e
        }
      }
      begin match {
        case None => i = n
        case Some((bs, be)) =>
          val sb = new java.lang.StringBuilder()
          if (keepDelimitingTags) sb.append(content, bs, be)
          var p = be
          var closed = false
          while (!closed && p < n) {
            nextTag(p) match {
              case None =>
                p = n // EOF mid-element: record dropped, like the reference
              case Some((ts, te)) =>
                sb.append(content, p, ts)
                val tag = content.substring(ts, te)
                val (nm, isEnd) = nameOf(tag)
                if (isEnd && namePat.matches(nm)) {
                  if (keepDelimitingTags) sb.append(tag)
                  closed = true
                } else if (keepInternalTags) sb.append(tag)
                p = te
            }
          }
          if (closed) out += sb.toString
          i = p
      }
    }
    out.result()
  }

  /** One record per line (LineIterator): splittable scan, (file, idx) keyed.
    * `input_file_name` + a per-file window index would force a shuffle, so
    * the line index is assigned partition-locally relative to the split —
    * callers needing a global per-file index use the wholetext readers.
    */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("record")
      .select(input_file_name().as("file"), col("record"))

  private def readWhole(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").textFile(path).toDF("content")
      .select(input_file_name().as("file"), col("content"))

  /** Regex-delimited records over one or many files (one task per file). */
  def readDelimited(spark: SparkSession, path: String, delimiter: String): DataFrame = {
    import spark.implicits._
    readWhole(spark, path).as[(String, String)]
      .flatMap { case (f, c) => delimitRecords(c, delimiter).iterator.zipWithIndex
        .map { case (r, idx) => (f, idx, r) } }
      .toDF("file", "record_idx", "record")
  }

  /** XML begin/end-tag records over one or many files (one task per file). */
  def readXmlElements(spark: SparkSession, path: String, tagNameRegexp: String,
      keepInternalTags: Boolean = false, keepDelimitingTags: Boolean = false): DataFrame = {
    import spark.implicits._
    readWhole(spark, path).as[(String, String)]
      .flatMap { case (f, c) =>
        xmlRecords(c, tagNameRegexp, keepInternalTags, keepDelimitingTags)
          .iterator.zipWithIndex.map { case (r, idx) => (f, idx, r) } }
      .toDF("file", "record_idx", "record")
  }
}
