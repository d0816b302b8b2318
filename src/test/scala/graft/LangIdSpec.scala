package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.LangId

/** Reference-derived vectors: the langdetect cases checked into the
  * reference's own suite (tests/test_topic_modeling.py:21-33). */
class LangIdSpec extends AnyFunSuite {

  test("reference vector: english sentence → en") {
    assert(LangId.detect("english text goes here") === Some("en"))
  }

  test("reference vector: german sentence → de") {
    assert(LangId.detect("hier ist ein deutscher Text") === Some("de"))
  }

  test("reference vector: link-only text → None (LangDetectException case)") {
    assert(LangId.detect("https://blablabla.de") === None)
  }

  test("more sentences route to the right profile") {
    assert(LangId.detect("der Hund und die Katze sind nicht hier")
      === Some("de"))
    assert(LangId.detect("this is the first time that we have been there")
      === Some("en"))
    assert(LangId.detect("esta es la casa de los otros") === Some("es"))
    assert(LangId.detect("ces quelques mots sont pour vous") === Some("fr"))
  }

  test("null, empty, digits-only → None; fallback composition works") {
    assert(LangId.detect(null) === None)
    assert(LangId.detect("") === None)
    assert(LangId.detect("12345 !!! 67") === None)
    assert(LangId.detectOrElse("9999", _ => "und") === "und")
  }

  test("deterministic: same input, same answer, and scores are exact longs") {
    val s = "hier ist ein deutscher Text"
    assert((1 to 5).map(_ => LangId.detect(s)).distinct.size === 1)
  }

  test("mail addresses are stripped like URLs") {
    assert(LangId.detect("someone@example.com") === None)
  }
}
