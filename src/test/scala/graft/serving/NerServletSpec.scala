package graft.serving

import graft.ner.NerModels
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** NERServlet semantics (src/com/ntrepid/tartan/NERServlet.java:22-128) over
  * the JDK HTTP server: param fallbacks, echo headers, classifyToString body,
  * and the offsets rendering.
  */
class NerServletSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val model = NerModels.default(spark).value

  private def get(port: Int, params: (String, String)*): (String, Map[String, String]) = {
    val q = params.map { case (k, v) =>
      s"${URLEncoder.encode(k, "UTF-8")}=${URLEncoder.encode(v, "UTF-8")}" }.mkString("&")
    val conn = new URI(s"http://localhost:$port/ner?$q").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val headers = Seq("classifier", "outputFormat", "preserveSpacing")
      .flatMap(h => Option(conn.getHeaderField(h)).map(h -> _)).toMap
    (body, headers)
  }

  private def post(port: Int, params: (String, String)*): String = {
    val q = params.map { case (k, v) =>
      s"${URLEncoder.encode(k, "UTF-8")}=${URLEncoder.encode(v, "UTF-8")}" }.mkString("&")
    val conn = new URI(s"http://localhost:$port/ner").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.getOutputStream.write(q.getBytes(StandardCharsets.UTF_8))
    new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
  }

  test("GET/POST with param fallbacks; body == classifyToString; echo headers") {
    val servlet = new NerServlet(port = 0, Map("ner3" -> model), "ner3").start()
    try {
      val text = "Alice Johnson visited Berlin ."
      val (body, headers) = get(servlet.boundPort, "input" -> text)
      assert(body == NerServer.classifyToString(model, text))
      assert(headers("classifier") == "ner3" && headers("outputFormat") == "slashTags" &&
        headers("preserveSpacing") == "true")
      // per-request overrides (blank params fall back like the reference)
      val (xml, h2) = get(servlet.boundPort, "input" -> text,
        "outputFormat" -> "inlineXML", "preserveSpacing" -> "")
      assert(xml == NerServer.classifyToString(model, text, "inlineXML"))
      assert(h2("outputFormat") == "inlineXML" && h2("preserveSpacing") == "true")
      // POST form body carries the same params (doGet delegates to doPost)
      assert(post(servlet.boundPort, "input" -> text,
        "preserveSpacing" -> "false") ==
        NerServer.classifyToString(model, text, spacing = false))
      // a KNOWN classifier name serves and echoes itself
      val (b3, h3) = get(servlet.boundPort, "input" -> text, "classifier" -> "ner3")
      assert(b3 == body && h3("classifier") == "ner3")
      // a genuinely UNKNOWN name is an HTTP 500, mirroring the reference's
      // NPE on classifierMap.get (NERServlet.java:99-104) — the old silent
      // fallback echoed a classifier that did not serve the request
      val conn = new java.net.URI(
        s"http://localhost:${servlet.boundPort}/ner?input=x&classifier=nope").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 500)
      val err = new String(conn.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(err.contains("unknown classifier 'nope'"), err)
    } finally servlet.close()
  }

  test("outputFormat=offsets renders List<Triple>.toString like the reference") {
    val servlet = new NerServlet(port = 0, Map("ner3" -> model), "ner3").start()
    try {
      val text = "Alice Johnson visited Berlin ."
      val (body, _) = get(servlet.boundPort, "input" -> text, "outputFormat" -> "offsets")
      // label-change span fold over invertible offsets: "[(TYPE,b,e), ...]"
      assert(body.startsWith("[") && body.endsWith("]"))
      assert(body.contains(s"(PERSON,0,${"Alice Johnson".length})"), body)
      val berlinAt = text.indexOf("Berlin")
      assert(body.contains(s"(LOCATION,$berlinAt,${berlinAt + "Berlin".length})"), body)
      // offsets of an empty-entity input render as the empty list
      val (none, _) = get(servlet.boundPort, "input" -> "nothing here .", "outputFormat" -> "offsets")
      assert(none == "[]")
    } finally servlet.close()
  }
}
