package graft.serving

import graft.ner.NerModels
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

class NerServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val model = NerModels.default(spark).value

  private def ask(port: Int, line: String): String = {
    val s = new Socket("localhost", port)
    try {
      val out = new PrintWriter(s.getOutputStream, true)
      out.println(line)
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, "UTF-8"))
      val sb = new StringBuilder
      var c = in.read()
      while (c >= 0) { sb.append(c.toChar); c = in.read() }
      sb.toString
    } finally s.close()
  }

  test("one-line-per-connection protocol; reply == classifyToString; spacing preserved") {
    val server = new NerServer(port = 0, model).start()
    try {
      val text = "Alice Johnson visited Berlin ."
      val reply = ask(server.boundPort, text)
      assert(reply == NerServer.classifyToString(model, text))
      // every token is rendered word/LABEL and original spacing survives
      assert(reply.count(_ == '/') == 5)
      assert(reply.replaceAll("/[A-Z]+", "") == text)
      // concurrent sessions: each connection is its own request
      val r2 = ask(server.boundPort, "Bob met Carol .")
      assert(r2.startsWith("Bob/"))
    } finally server.close()
  }

  test("classifyToString formats: slashTags / inlineXML / standoff") {
    val text = "Alice Johnson visited Berlin ."
    val slash = NerServer.classifyToString(model, text, "slashTags", spacing = false)
    assert(slash.split(" ").forall(_.contains("/")))
    val xml = NerServer.classifyToString(model, text, "inlineXML")
    // inline XML wraps entity spans and keeps the full original text inside
    assert(xml.replaceAll("</?[A-Z]+>", "") == text)
    val standoff = NerServer.classifyToString(model, text, "standoff")
    assert(standoff.linesIterator.forall(_.split("\t").length == 4))
    intercept[IllegalArgumentException] {
      NerServer.classifyToString(model, text, "nope")
    }
  }
}
