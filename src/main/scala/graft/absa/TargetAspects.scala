package graft.absa

import scala.jdk.CollectionConverters._

/** The ABSA aspect-tree config transform (SURVEY §3 "Aspect tree";
  * reference src/absa/target_aspects.py:110-149 + data/absa/
  * target_aspects.jsonc): a nested JSONC hierarchy of aspects flattens to
  * `(aspect path, signal words)` rows, which expand to the
  * `(aspect, word)` lexicon that feeds the J6 aspect-matching joins.
  *
  * Faithful semantics, including the reference's quirks:
  *  - a key wrapped in single quotes ('X') strips the quotes and does NOT
  *    add itself as a signal word; an unquoted key appends itself;
  *  - a subtree node ALSO yields its own row, whose word list inherits
  *    the words of its LAST flattened descendant (the reference's loop
  *    variable scoping — `words` is rebound by the inner for) plus the
  *    node name;
  *  - duplicate flattened paths collapse dict-style: first position,
  *    last value.
  *
  * This runs on the driver over a small checked-in config — exactly like
  * the reference — and enters the engine as a broadcast-able lexicon
  * DataFrame.
  */
object TargetAspects {

  /** Strip block comments, parse preserving key order. */
  def parseJsonc(jsonc: String): java.util.LinkedHashMap[String, Object] = {
    val json = jsonc.replaceAll("(?s)/\\*.*?\\*/", "")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readValue(json, classOf[java.util.LinkedHashMap[String, Object]])
  }

  /** Port of the reference generator: yields (path, words) in generation
    * order, scope-leak included. */
  def flatten(aspects: java.util.Map[String, Object]): Seq[(Seq[String], Seq[String])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[String])]
    aspects.asScala.foreach { case (aspect, value) =>
      // `words` mirrors the reference's rebound loop variable.
      var words: Seq[String] = Seq.empty
      value match {
        case m: java.util.Map[_, _] =>
          flatten(m.asInstanceOf[java.util.Map[String, Object]]).foreach {
            case (subPath, subWords) =>
              out += ((aspect +: subPath, subWords))
              words = subWords
          }
        case l: java.util.List[_] =>
          words = l.asScala.toSeq.map(_.toString)
        case other =>
          throw new IllegalArgumentException(s"unexpected node: $other")
      }
      if (aspect.length >= 2 && aspect.head == '\'' && aspect.last == '\'')
        out += ((Seq(aspect.substring(1, aspect.length - 1)), words))
      else
        out += ((Seq(aspect), words :+ aspect))
    }
    out.toSeq
  }

  /** dict(...) collapse: first insertion position, last value. */
  def lastWins(flat: Seq[(Seq[String], Seq[String])]): Seq[(Seq[String], Seq[String])] = {
    val positions = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Seq[String]]
    flat.foreach { case (path, words) => positions(path) = words }
    positions.toSeq
  }

  /** (aspect path, word) lexicon rows. */
  def expand(flat: Seq[(Seq[String], Seq[String])]): Seq[(Seq[String], String)] =
    for ((path, words) <- flat; w <- words) yield (path, w)

  /** Full pipeline from JSONC text. */
  def lexicon(jsonc: String): Seq[(Seq[String], String)] =
    expand(lastWins(flatten(parseJsonc(jsonc))))
}
