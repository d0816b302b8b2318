package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Tokenizer

class TokenizerSpec extends AnyFunSuite {
  private def words(s: String) = Tokenizer.tokenize(s).map(_.word)

  test("sentence split on terminal punctuation and newlines") {
    val toks = Tokenizer.tokenize("Great museum. Loved it!\nWill return")
    assert(toks.map(t => (t.word, t.sentenceIndex)) === Seq(
      ("great", 1), ("museum", 1), ("loved", 2), ("it", 2), ("will", 3), ("return", 3)))
  }

  test("word_index is 1-based over the whole post") {
    assert(Tokenizer.tokenize("One two. Three").map(_.wordIndex) === Seq(1, 2, 3))
  }

  test("punctuation stripped but @ and # preserved") {
    assert(words("Hello, @museum!!! #art (wow)") === Seq("hello", "@museum", "#art", "wow"))
  }

  test("slash splits tokens") {
    assert(words("open monday/tuesday") === Seq("open", "monday", "tuesday"))
  }

  test("single-character tokens dropped") {
    assert(words("a bb c dd") === Seq("bb", "dd"))
  }

  test("emoji isolated and repeated emoji compressed") {
    assert(words("nice❤❤❤day here") === Seq("nice", "❤", "day", "here"))
  }

  test("null and empty") {
    assert(Tokenizer.tokenize(null).isEmpty)
    assert(Tokenizer.tokenize("").isEmpty)
  }
}
