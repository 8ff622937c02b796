package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HTML main-text extraction beyond the value oracle: a driver-local
  * reference extractor (independent Java-regex implementation of the same
  * block classification) over every planted page, the block-separation
  * contract (boilerplate dies, content survives — nav/ads on word count,
  * footer on link density ONLY), and the map-only plan pin. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def refExtract(html: String): (String, Int) = {
    def txt(b: String) =
      b.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
    def noAnchor(b: String) =
      b.replaceAll("<a[^>]*>.*?</a>", " ").replaceAll("<[^>]*>", " ")
        .replaceAll("\\s+", " ").trim
    val blocks = html.replaceAll("<(p|div|h1|li)([ >])", "\u0001<$1$2").split('\u0001')
    val kept = blocks.filter { b =>
      val t = txt(b)
      t.split(" ", -1).length >= 5 && (t.length - noAnchor(b).length) * 3 <= t.length
    }
    (kept.map(txt).mkString("\n"), kept.length)
  }

  test("text_html_extract == driver-local reference on every planted page") {
    val pages = graft.Fixtures.htmlDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = TextAnalysis.htmlExtract(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got.keySet == pages.keySet)
    pages.foreach { case (id, html) =>
      val (refText, refKept) = refExtract(html)
      val refMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(refText.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(id) == ((refMd5, refKept, refText.length.toLong)),
        s"doc $id: got ${got(id)}, want ($refMd5, $refKept, ${refText.length})")
    }
  }

  test("boilerplate separation: chrome dies, content survives, density is load-bearing") {
    val docs = graft.Tables.documents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = TextAnalysis.htmlExtract(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    // every fixture doc's text splits into two >=5-word halves at spec sf,
    // so exactly the 2 content paragraphs survive on every page — never
    // the nav (3 words), the ads (4 words), or the footer (5 words but
    // half anchor chars: word count alone would KEEP it)
    assert(got.values.forall(_._2 == 2), {
      val bad = got.filter(_._2._2 != 2).take(3)
      s"pages not keeping exactly the 2 content blocks: $bad"
    })
    // and the extraction is the doc text itself with the midpoint space
    // swapped for the block separator — boilerplate-free by construction
    docs.take(50).foreach { case (id, text) =>
      val w = text.split(" ", -1)
      val h = (w.length + 1) / 2
      val want = w.take(h).mkString(" ") + "\n" + w.drop(h).mkString(" ")
      val wantMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(want.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(id)._1 == wantMd5, s"doc $id extraction is not the clean text")
    }
    // footer kill really is the density rule: its word count passes
    val (footerTxt, footerKept) =
      refExtract("""<div class="footer"><a href="/tos">Terms</a> <a href="/priv">Privacy</a> (c) 2026 Graft</div>""")
    assert(footerKept == 0 && footerTxt.isEmpty)
    assert("Terms Privacy (c) 2026 Graft".split(" ").length >= 5)
  }

  test("plan: extraction is map-only — zero exchanges at any corpus size") {
    val plan = TextAnalysis.htmlExtract(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"HTML extraction should never shuffle:\n${plan.take(1200)}")
  }
}
