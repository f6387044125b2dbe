package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** URL canonicalization pins: case, default ports, param order, tracking
  * params, fragments, empty paths — and that distinct sources of the same
  * resource collapse to one canonical string.
  */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(TextOps.canonicalUrlCol(col("u"))).as[String].collect().toSeq

  test("canonical form: case, default port, utm params, param order, fragment") {
    assert(canon("HTTPS://Example.COM:443/a/1?utm_source=x&id=2&b=3#frag")
      === Seq("https://example.com/a/1?b=3&id=2"))
    assert(canon("https://example.com/a/1?id=2&b=3")
      === Seq("https://example.com/a/1?b=3&id=2"))
    assert(canon("http://Host.Org:80/p") === Seq("http://host.org/p"))
    // non-default port survives; https keeps :80 (not its default)
    assert(canon("https://example.com:80/x") === Seq("https://example.com:80/x"))
    assert(canon("http://example.com:8080/x") === Seq("http://example.com:8080/x"))
  }

  test("empty path normalizes to /, empty query drops the ?") {
    assert(canon("https://example.com") === Seq("https://example.com/"))
    assert(canon("https://example.com?utm_a=1") === Seq("https://example.com/"))
    assert(canon("https://example.com/x?") === Seq("https://example.com/x"))
  }

  test("registered domain is the last two host labels") {
    val got = Seq("https://a.b.Example.COM/x", "http://news.example.org:80/")
      .toDF("u").select(TextOps.registeredDomainCol(col("u"))).as[String].collect().toSeq
    assert(got === Seq("example.com", "example.org"))
  }

  test("single-label host is its own registered domain (SQL-parity rule)") {
    // concat_ws would silently skip the missing label while the SQL
    // oracle's bare || NULL-propagates; the explicit branch states one
    // rule both engines replay
    val got = Seq("http://localhost/x", "http://intranet:80/", "https://a.b.example.com/")
      .toDF("u").select(TextOps.registeredDomainCol(col("u"))).as[String].collect().toSeq
    assert(got === Seq("localhost", "intranet", "example.com"))
  }

  test("canonicalization is a pure column expression (no UDF in plan)") {
    val plan = Seq("https://e.com/x").toDF("u")
      .select(TextOps.canonicalUrlCol(col("u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }
}
