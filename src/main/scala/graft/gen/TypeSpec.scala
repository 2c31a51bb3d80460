package graft.gen

/** One parsed column element of a type-spec string.
  *
  * Mirrors the reference's `struct DataType`
  * (/root/reference/generate_csv.cpp:15-23): `length` is used by
  * char/varchar-family generators, `precision`/`scale` by decimal/number.
  * Defaults (length=0, precision=16, scale=6) replicate the reference's
  * struct initializer (generate_csv.cpp:20).
  */
final case class ColSpec(token: String, length: Int = 0, precision: Int = 16, scale: Int = 6)

/** Parse error, mirroring the reference's thrown C-string messages
  * (generate_csv.cpp:258,270,295,329).
  */
final case class SpecParseException(msg: String) extends RuntimeException(msg)

/** Recursive-descent parser for the column-type mini-language.
  *
  * Grammar (reference comment at generate_csv.cpp:336-339):
  * {{{
  *   input   = element(,element)*
  *   element = type | type(num) | type(num,num)
  * }}}
  *
  * Faithfully reproduced reference quirks:
  *   - input is lowercased first → case-insensitive (generate_csv.cpp:366)
  *   - `type(a)` stores a into `length`; `type(a,b)` moves a to `precision`,
  *     resets length to 0, stores b into `scale`, and bumps precision up to
  *     scale when precision < scale (generate_csv.cpp:312-327)
  *   - `decimal(10)` therefore KEEPS the default (16,6) — the single arg
  *     lands in `length`, which the decimal generator ignores
  *   - separators are lax: after each element exactly one character is
  *     skipped without checking it is ',' (generate_csv.cpp:344-349)
  *   - spaces are allowed around tokens and numbers (generate_csv.cpp:247-251)
  *   - error messages match the reference's thrown strings
  */
object TypeSpecParser {

  def parse(rawInput: String): Vector[ColSpec] = {
    // Locale.ROOT: the reference lowercases bytes with std::tolower
    // (generate_csv.cpp:366) — default-locale toLowerCase would diverge
    // (e.g. Turkish dotless-i).
    val input = rawInput.toLowerCase(java.util.Locale.ROOT)
    val out = Vector.newBuilder[ColSpec]
    var pos = 0
    while (pos < input.length) {
      val (spec, next) = element(input, pos)
      out += spec
      pos = next + 1 // lax separator: skip one char unconditionally (:348)
    }
    out.result()
  }

  // element = space* type [ '(' int [space* ',' space* int space*] ')' ] space*
  private def element(input: String, pos0: Int): (ColSpec, Int) = {
    var pos = skipSpace(input, pos0)
    if (pos >= input.length) throw SpecParseException("Unexpected EOL")
    val (tok, p1) = typeToken(input, pos)
    pos = p1
    var length = 0
    var precision = 16
    var scale = 6
    if (pos < input.length && input.charAt(pos) == '(') {
      pos += 1
      val (a, p2) = int(input, pos)
      pos = skipSpace(input, p2)
      length = a
      if (pos < input.length && input.charAt(pos) == ',') {
        pos += 1
        pos = skipSpace(input, pos)
        precision = length
        length = 0
        val (b, p3) = int(input, pos)
        pos = skipSpace(input, p3)
        scale = b
        if (precision < scale) precision = scale // fixup (:323-326)
      }
      if (pos >= input.length || input.charAt(pos) != ')')
        throw SpecParseException("Unterminated bracket!")
      pos += 1
    }
    pos = skipSpace(input, pos)
    (ColSpec(tok, length, precision, scale), pos)
  }

  private def skipSpace(input: String, pos0: Int): Int = {
    var pos = pos0
    while (pos < input.length && input.charAt(pos) == ' ') pos += 1
    pos
  }

  // ASCII-only classes, matching C isdigit/isalpha in the "C" locale
  // (generate_csv.cpp:262,282) — Char.isDigit/isLetter would admit
  // Unicode digits/letters the reference rejects.
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAsciiAlnum(c: Char): Boolean =
    isAsciiDigit(c) || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def int(input: String, pos0: Int): (Int, Int) = {
    if (pos0 >= input.length) throw SpecParseException("Unexpected EOL")
    var pos = pos0
    while (pos < input.length && isAsciiDigit(input.charAt(pos))) pos += 1
    if (pos == pos0) throw SpecParseException("No int value found in (...)")
    // Digit runs beyond Int range must still surface as SpecParseException —
    // callers rely on that error contract (the reference separately catches
    // stoi's std::out_of_range, generate_csv.cpp:372).
    try (input.substring(pos0, pos).toInt, pos)
    catch {
      case _: NumberFormatException =>
        throw SpecParseException("Int value out of range in (...)")
    }
  }

  private def typeToken(input: String, pos0: Int): (String, Int) = {
    if (pos0 >= input.length) throw SpecParseException("Unexpected EOL")
    var pos = pos0
    while (pos < input.length && isAsciiAlnum(input.charAt(pos))) pos += 1
    if (pos == pos0) throw SpecParseException("No type found while parsing")
    (input.substring(pos0, pos), pos)
  }
}
