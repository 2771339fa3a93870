package graft.sources

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Goldens hand-traced through the reference record iterators
  * (objectbank/DelimitRegExIterator.java:37-55, XMLBeginEndIterator.java:
  * 62-117, LineIterator.java): the Java code was executed on paper over these
  * exact fixtures; each expected value is that trace.
  */
class RecordIteratorsSpec extends AnyFunSuite {

  test("delimitRecords: strip one leading/trailing delimiter, trim, Java split") {
    // plain interior split
    assert(RecordIterators.delimitRecords("aa@bb@cc", "@") == Seq("aa", "bb", "cc"))
    // ^delim and delim$ are stripped BEFORE the split (replaceAll of the
    // anchored pattern), then the whole buffer is trimmed
    assert(RecordIterators.delimitRecords("@aa@bb@", "@") == Seq("aa", "bb"))
    // interior empty records survive (Java split keeps interior empties)
    assert(RecordIterators.delimitRecords("a@@b", "@") == Seq("a", "", "b"))
    // trailing empty records are dropped (Java split semantics)
    assert(RecordIterators.delimitRecords("a@b@@", "@") == Seq("a", "b"))
    // lines are re-joined with \n and regex delimiters work across them
    assert(RecordIterators.delimitRecords("one\n--\ntwo\n--\nthree", "\\n--\\n")
      == Seq("one", "two", "three"))
    // the reference reads line-wise and appends \n to EVERY line, so a
    // missing final newline is normalized away before trim
    assert(RecordIterators.delimitRecords("x\ny", "NEVER") == Seq("x\ny"))
  }

  test("xmlRecords: matching elements only; internal/delimiting tag options; EOF drop") {
    val c = "junk <doc>alpha</doc> mid <meta>skip</meta> <doc>beta <b>bold</b> tail</doc> <doc>open"
    // default: internal tags dropped, delimiting tags dropped, unclosed
    // final element dropped (reference returns null mid-element)
    assert(RecordIterators.xmlRecords(c, "doc") == Seq("alpha", "beta bold tail"))
    // keepInternalTags keeps non-matching tags inside the element
    assert(RecordIterators.xmlRecords(c, "doc", keepInternalTags = true)
      == Seq("alpha", "beta <b>bold</b> tail"))
    // keepDelimitingTags keeps the element's own begin/end tags
    assert(RecordIterators.xmlRecords("<doc>x</doc>", "doc", keepDelimitingTags = true)
      == Seq("<doc>x</doc>"))
    // tag NAME is regex-matched with matches() (full match), like the
    // reference's tagNamePattern.matcher(tag.name).matches()
    assert(RecordIterators.xmlRecords("<a>1</a><ab>2</ab><b>3</b>", "a|b") == Seq("1", "3"))
    // attributes don't participate in the name match
    assert(RecordIterators.xmlRecords("""<doc id="7">x</doc>""", "doc") == Seq("x"))
    // an end tag of the target name with no open element is skipped while
    // seeking (the begin-tag scan requires !isEndTag)
    assert(RecordIterators.xmlRecords("</doc><doc>y</doc>", "doc") == Seq("y"))
  }

  test("file readers round-trip records with stable (file, record_idx) keys") {
    val spark = SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_reciter_")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "r1\n==\nr2\n==\nr3\n")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "s1\n==\ns2\n")
    val got = RecordIterators.readDelimited(spark, dir.toString, "\\n==\\n")
      .collect().map(r => (r.getString(0).split('/').last, r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(("a.txt", 0, "r1"), ("a.txt", 1, "r2"), ("a.txt", 2, "r3"),
      ("b.txt", 0, "s1"), ("b.txt", 1, "s2")))

    java.nio.file.Files.writeString(dir.resolve("c.xml"),
      "<doc>one</doc><junk>no</junk><doc>two</doc>")
    val xml = RecordIterators.readXmlElements(spark, dir.resolve("c.xml").toString, "doc")
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1).toSeq
    assert(xml == Seq((0, "one"), (1, "two")))

    val lines = RecordIterators.readLines(spark, dir.resolve("b.txt").toString)
      .collect().map(_.getString(1)).sorted.toSeq
    assert(lines == Seq("==", "s1", "s2"))
  }
}
