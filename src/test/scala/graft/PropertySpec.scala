package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.gen.{ColSpec, TypeSpecParser}

/** Property-based tests (SURVEY.md §5.2.2): parser round-trips over
  * arbitrary valid specs, and rkey bijectivity over arbitrary id
  * windows — pure-Scala properties, no Spark session needed.
  * (Raw ScalaCheck Properties: the scalatest bridge artifact is not in
  * the offline cache; sbt runs these natively.)
  */
object PropertySpec extends Properties("graft") {

  private val typeTokens = Gen.oneOf(
    "bit", "tinyint", "smallint", "mediumint", "int", "bigint",
    "float", "double", "text", "blob", "date", "datetime",
    "timestamp", "time", "year", "key", "rkey")
  private val sizedTokens = Gen.oneOf("char", "nchar", "varchar", "varchar2", "nvarchar2")
  private val len = Gen.choose(1, 255)

  private val element: Gen[(String, ColSpec)] = Gen.oneOf(
    typeTokens.map(t => (t, ColSpec(t))),
    for { t <- sizedTokens; n <- len } yield (s"$t($n)", ColSpec(t, length = n)),
    for {
      t <- Gen.oneOf("decimal", "number")
      p <- Gen.choose(1, 18)
      s <- Gen.choose(0, 18)
    } yield (s"$t($p,$s)", ColSpec(t, precision = math.max(p, s), scale = s)))

  property("parser round-trips arbitrary well-formed specs") =
    forAll(Gen.nonEmptyListOf(element)) { elems =>
      val input = elems.map(_._1).mkString(",")
      TypeSpecParser.parse(input) == elems.map(_._2).toVector
    }

  property("parser is case-insensitive for arbitrary casing") =
    forAll(Gen.nonEmptyListOf(element)) { elems =>
      val shouted = elems.map(_._1.toUpperCase(java.util.Locale.ROOT)).mkString(",")
      TypeSpecParser.parse(shouted) == elems.map(_._2).toVector
    }

  // pure-Scala mirror of GenExprs.rkey (also used by GenQueries' oracle)
  private def bps(x: Long, m: Long, s: Int): Long = {
    val t = ((x >>> s) ^ x) & m; (x ^ t) ^ (t << s)
  }
  private def rkey(id: Long): Long = {
    val g = id + 1
    val r = (g << 63) | (g >>> 1)
    bps(bps(bps(r, 0x2222222222222222L, 1), 0x0c0c0c0c0c0c0c0cL, 2),
      0x00f000f000f000f0L, 4)
  }

  private val window = for {
    start <- Gen.choose(0L, Long.MaxValue - 10000)
    n <- Gen.choose(1, 2000)
  } yield (start, n)

  property("rkey is collision-free over arbitrary id windows") =
    forAll(window, window) { (w1: (Long, Int), w2: (Long, Int)) =>
      val all = ((w1._1 until w1._1 + w1._2) ++ (w2._1 until w2._1 + w2._2)).distinct
      all.map(rkey).distinct.size == all.size
    }

  property("rkey matches the reference's published first values") =
    Prop((0L to 3L).map(rkey) == Seq(Long.MinValue, 1L, Long.MinValue + 1, 256L))

  // pure-Scala mirror of q_join_fuzzy's symmetric-deletion blocking:
  // keys(s) = {s} ∪ one-char deletions of s. The blocking-completeness
  // claim: ANY pair at edit distance ≤ 1 shares a key (deletion → the
  // short string itself; substitution → the common deletion at that
  // position; insertion is the mirror of deletion).
  private def delKeys(s: String): Set[String] =
    Set(s) ++ s.indices.map(i => s.substring(0, i) + s.substring(i + 1))

  private val asciiStr = for {
    n <- Gen.choose(2, 30)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val edit: Gen[(String, String)] = for {
    s <- asciiStr
    pos <- Gen.choose(0, s.length - 1)
    c <- Gen.alphaNumChar
    op <- Gen.oneOf(0, 1, 2) // delete, substitute, insert
  } yield op match {
    case 0 => (s, s.substring(0, pos) + s.substring(pos + 1))
    case 1 => (s, s.substring(0, pos) + c + s.substring(pos + 1))
    case 2 => (s, s.substring(0, pos) + c + s.substring(pos))
  }

  property("symmetric-deletion blocking is complete for edit distance <= 1") =
    forAll(edit) { case (a, b) =>
      (delKeys(a) intersect delKeys(b)).nonEmpty
    }
}

object BpeCountProperties extends Properties("graft.bpe") {

  import org.apache.spark.unsafe.types.UTF8String

  /** REFERENCE implementation: the literal replace-chain spec the
    * native BpeTokenCountImpl claims to equal — per word, regex-expand
    * each code point (java-regex '.', so line terminators pass through
    * unexpanded), then java String.replace per merge in order (the
    * same literal non-overlapping left-to-right scan Spark's replace
    * uses), then count non-empty space-separated tokens.
    */
  private def referenceCount(text: String, merges: Seq[(String, String)]): Long =
    text.split(" ", -1).map { w =>
      var seq = "  " + java.util.regex.Pattern.compile("(.)")
        .matcher(w).replaceAll("$1  ")
      merges.foreach { case (a, b) => seq = seq.replace(s" $a  $b ", s" $a$b ") }
      seq.split(" ", -1).count(_.nonEmpty).toLong
    }.sum

  // words over a tiny alphabet so merges actually fire, with line
  // terminators mixed in (supplementary code points are covered by
  // BpeEncodeEquivalenceSpec's fixed cases — Gen over Char cannot
  // produce them)
  private val wordChar = Gen.frequency(
    8 -> Gen.oneOf('a', 'b', 'c'),
    1 -> Gen.oneOf('\n', '\r'),
    1 -> Gen.const('x'))
  private val word = Gen.listOf(wordChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))
  // terminator runs INCLUDED: a merge whose second element is a
  // terminator combined with a word ending in it is exactly the class
  // where a naive symbol-list merge diverges from the replace chain
  // (the trailing pending symbol has no trailing separator, so the
  // literal replace can never match it — the sealed-tail rule)
  private val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "abc",
    "\n", "\r", "\n\n", "a\n")
  private val mergeTable = Gen.listOfN(8, Gen.zip(sym, sym))

  property("native BPE token count equals the replace-chain reference") =
    forAll(text, mergeTable) { (t, ms) =>
      val table = ms.map { case (a, b) => Array(a, b) }.toArray
      graft.gen.BpeTokenCountImpl.countTokens(UTF8String.fromString(t), table) ==
        referenceCount(t, ms)
    }

  /** Reference for the merged-pairs expression: one merge, then
    * adjacent concat over the surviving symbols.
    */
  private def referencePairs(tok: String, a: String, b: String): Seq[String] = {
    var seq = "  " + java.util.regex.Pattern.compile("(.)")
      .matcher(tok).replaceAll("$1  ")
    seq = seq.replace(s" $a  $b ", s" $a$b ")
    val sym = seq.split(" ", -1).filter(_.nonEmpty)
    if (sym.length < 2) Seq.empty
    else sym.sliding(2).map(p => p(0) + p(1)).toSeq
  }

  property("native BPE merged pairs equal the replace-chain reference") =
    forAll(word, sym, sym) { (w, a, b) =>
      val got = graft.gen.BpeMergedPairsImpl.pairs(
        UTF8String.fromString(w), UTF8String.fromString(a), UTF8String.fromString(b))
      (0 until got.numElements()).map(i => got.getUTF8String(i).toString) ==
        referencePairs(w, a, b)
    }
}
