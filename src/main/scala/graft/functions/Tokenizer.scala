package graft.functions

/** The reference's ABSA tokenizer (N1; reference
  * src/absa/post_words.py:150-231), as a pure Scala function:
  *
  *  - sentence split on `[.?!]+` followed by whitespace/end, or newlines;
  *  - emoji (`\p{So}`) isolated into standalone tokens, runs of the same
  *    emoji compressed to one;
  *  - tokens split on whitespace and `/`;
  *  - punctuation stripped, preserving `@` and `#` (the reference's
  *    `[\p{P}--[@#]]` character-class subtraction, expressed here with
  *    Java's `&&[^@#]` intersection);
  *  - lowercased; single-character non-emoji tokens dropped;
  *  - `word_index` is 1-based over the whole post, `sentence_index`
  *    1-based per post (W5 ordinal semantics).
  */
object Tokenizer {

  final case class Token(word: String, sentenceIndex: Int, wordIndex: Int)

  // Terminal punctuation consumes its trailing whitespace so "it!\nNext"
  // is ONE sentence boundary, not a punctuation split plus a newline split
  // (which would burn a sentence index on an empty segment).
  private val sentenceSplit = "(?:[.?!]+(?:\\s+|$))|\\n+"
  private val emojiIsolate = "(\\p{So})".r
  private val punct = "[\\p{P}&&[^@#]]".r
  private val repeatEmoji = "(\\p{So})\\1+".r

  def tokenize(text: String): Seq[Token] = {
    if (text == null) return Seq.empty
    val out = Seq.newBuilder[Token]
    var wordIdx = 0
    text.split(sentenceSplit).zipWithIndex.foreach { case (sentence, si) =>
      val isolated = emojiIsolate.replaceAllIn(
        repeatEmoji.replaceAllIn(sentence, m => m.group(1)), m => s" ${m.group(1)} ")
      isolated.split("[\\s/]+").foreach { raw =>
        val stripped = punct.replaceAllIn(raw, "").toLowerCase(java.util.Locale.ROOT)
        val isEmoji = stripped.length >= 1 && stripped.exists(c => Character.getType(c) == Character.OTHER_SYMBOL)
        if (stripped.length > 1 || isEmoji) {
          wordIdx += 1
          out += Token(stripped, si + 1, wordIdx)
        }
      }
    }
    out.result()
  }
}
