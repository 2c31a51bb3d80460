package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.{ColSpec, SpecParseException, TypeSpecParser}

/** Unit tests for the type-spec mini-language parser, pinning the
  * reference quirks documented in SURVEY.md §1.2
  * (/root/reference/generate_csv.cpp:247-351).
  */
class TypeSpecParserSpec extends AnyFunSuite {

  test("flagship spec parses all seven columns") {
    val specs = TypeSpecParser.parse("key,bigint,int(11),varchar(50),double,date,bigint(20)")
    assert(specs.map(_.token) ==
      Vector("key", "bigint", "int", "varchar", "double", "date", "bigint"))
    assert(specs(2).length == 11)  // display width parsed (then ignored by gen)
    assert(specs(3).length == 50)
    assert(specs(6).length == 20)
  }

  test("type(p,s) moves first arg to precision, resets length") {
    val Vector(d) = TypeSpecParser.parse("decimal(10,2)")
    assert(d == ColSpec("decimal", length = 0, precision = 10, scale = 2))
  }

  test("precision < scale is bumped up to scale (generate_csv.cpp:323-326)") {
    val Vector(d) = TypeSpecParser.parse("decimal(2,5)")
    assert(d.precision == 5 && d.scale == 5)
  }

  test("decimal(10) keeps default (16,6): single arg lands in length") {
    val Vector(d) = TypeSpecParser.parse("decimal(10)")
    assert(d == ColSpec("decimal", length = 10, precision = 16, scale = 6))
  }

  test("bare decimal keeps struct defaults (16,6)") {
    val Vector(d) = TypeSpecParser.parse("decimal")
    assert(d.precision == 16 && d.scale == 6 && d.length == 0)
  }

  test("case-insensitive: input lowercased before parse") {
    val specs = TypeSpecParser.parse("DECIMAL(5, 2), INT")
    assert(specs == Vector(ColSpec("decimal", 0, 5, 2), ColSpec("int", 0, 16, 6)))
  }

  test("locale-independent lowercasing (Turkish I)") {
    // 'I'.toLowerCase under tr-TR is dotless ı; Locale.ROOT keeps ASCII 'i'.
    val Vector(c) = TypeSpecParser.parse("INT")
    assert(c.token == "int")
  }

  test("spaces tolerated before type, after first int, around comma — not after '('") {
    val specs = TypeSpecParser.parse("  int , varchar(50 ) ,  decimal(10 , 2 ) ")
    assert(specs.map(_.token) == Vector("int", "varchar", "decimal"))
    assert(specs(1).length == 50)
    assert(specs(2).precision == 10 && specs(2).scale == 2)
    // expectInt is called immediately after '(' with no space skip
    // (generate_csv.cpp:313-314), so a space there is an error.
    assertThrows[SpecParseException](TypeSpecParser.parse("varchar( 50)"))
  }

  test("lax separator: any single char accepted between elements") {
    // parseDataTypes advances one char past each element unchecked (:344-349)
    val specs = TypeSpecParser.parse("int;bigint")
    assert(specs.map(_.token) == Vector("int", "bigint"))
  }

  test("unknown tokens preserved (emit empty column downstream)") {
    val specs = TypeSpecParser.parse("foo,int")
    assert(specs.map(_.token) == Vector("foo", "int"))
  }

  test("error: unterminated bracket / EOL") {
    assertThrows[SpecParseException](TypeSpecParser.parse("int("))
    assertThrows[SpecParseException](TypeSpecParser.parse("int(11"))
  }

  test("error: no int inside parens") {
    assertThrows[SpecParseException](TypeSpecParser.parse("int(x)"))
  }

  test("error: out-of-Int-range digit run is a SpecParseException, not NFE") {
    val e = intercept[SpecParseException](TypeSpecParser.parse("varchar(99999999999999)"))
    assert(e.msg.contains("out of range"))
  }

  test("non-ASCII digits are rejected, not parsed") {
    // Arabic-Indic digit ٥ passes Char.isDigit but must not reach toInt.
    assertThrows[SpecParseException](TypeSpecParser.parse("varchar(٥)"))
  }

  test("trailing separator is tolerated (loop ends at EOL)") {
    assert(TypeSpecParser.parse("int,").map(_.token) == Vector("int"))
  }
}
