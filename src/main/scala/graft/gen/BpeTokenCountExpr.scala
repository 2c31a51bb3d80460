package graft.gen

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document BPE token count against a FIXED merge table — the
  * codegen'd form of q_bpe_encode's per-word merge chain.
  *
  * Semantically identical to the Column formulation it replaces:
  *
  *   aggregate(transform(split(text, ' '), w ->
  *     size(filter(split(
  *       fold(merges, '  ' || regexp_replace(w, '(.)', '$1  '),
  *            (acc, m) -> replace(acc, ' a  b ', ' ab ')), ' '),
  *       x -> x != ''))), 0L, (a, x) -> a + x)
  *
  * but computed in one pass per word with no intermediate strings. The
  * equivalence rests on two facts, both load-bearing and pinned by
  * BpeEncodeEquivalenceSpec:
  *
  *  - the doubled-separator replace ' a  b ' -> ' ab ' over a
  *    '  '-separated symbol string IS a left-to-right NON-OVERLAPPING
  *    adjacent-pair merge over the symbol list (the replacement scan
  *    resumes after each replaced section, so a freshly merged symbol
  *    can never start or join another match in the same pass, and the
  *    double separators are restored around every merged symbol — the
  *    invariant that makes pass k+1 see a well-formed symbol string);
  *  - java-regex '(.)' does NOT match line terminators (LF, CR,
  *    NEL U+0085, LS U+2028, PS U+2029), so a terminator gets no
  *    separators appended and GLUES to the next matched character as
  *    one symbol (or forms a trailing symbol of its own) — reproduced
  *    here by the `pending` buffer rather than silently "fixed".
  *
  * The merge table is tiny (BpeMerges = 8 entries) and rides into
  * codegen as a reference object; symbols compare by string equality
  * exactly like the literal replace patterns.
  */
case class BpeTokenCountExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray

  override protected def nullSafeEval(s: Any): Any =
    BpeTokenCountImpl.countTokens(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.gen.BpeTokenCountImpl.countTokens($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}

object BpeTokenCountImpl {

  /** Σ over ' '-separated words of the word's post-merge symbol count.
    * Empty words (doubled/leading/trailing spaces) count 0 symbols,
    * exactly like the filtered split they replace.
    */
  def countTokens(text: UTF8String, merges: Array[Array[String]]): Long = {
    val s = text.toString
    val len = s.length
    var total = 0L
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          val syms = symbols(s, start, i)
          val sealedTail = trailingTerminatorSymbol(s, start, i)
          var m = 0
          while (m < merges.length) {
            mergePass(syms, merges(m)(0), merges(m)(1), sealedTail)
            m += 1
          }
          total += syms.size
        }
        start = i + 1
      }
      i += 1
    }
    total
  }

  // java-regex '.' default exclusions (UNIX_LINES off)
  private def isLineTerm(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  /** Symbol build over s[from, until): one CODE POINT per symbol
    * ('(.)' is supplementary-aware), line terminators glue to the next
    * symbol / trail alone — the `pending` rule.
    */
  def symbols(s: String, from: Int, until: Int): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](until - from)
    val pending = new java.lang.StringBuilder()
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (isLineTerm(cp)) pending.append(s, i, i + n)
      else if (pending.length() > 0) {
        pending.append(s, i, i + n)
        syms.add(pending.toString)
        pending.setLength(0)
      } else syms.add(s.substring(i, i + n))
      i += n
    }
    if (pending.length() > 0) syms.add(pending.toString)
    syms
  }

  /** True when the word ends in a line-terminator run, i.e. the LAST
    * symbol is the flushed `pending` buffer. In the doubled-separator
    * encoding such a symbol gets NO trailing space ('(.)' never
    * matched it), so the literal replace " a  t " can never match it
    * as the second element of a pair — it is SEALED against merging
    * for the whole pass chain (it stays last, so it is never a pair's
    * first element either). Glued terminator runs mid-word end in a
    * matched character and carry normal separators.
    */
  def trailingTerminatorSymbol(s: String, from: Int, until: Int): Boolean =
    from < until && isLineTerm(s.codePointBefore(until))

  /** One merge pass, in place: left-to-right, non-overlapping; a
    * merged symbol never re-matches within its own pass (write/read
    * cursors) — the doubled-separator replace rule. `sealedTail`
    * excludes the word-trailing terminator symbol from merging (see
    * trailingTerminatorSymbol).
    */
  def mergePass(syms: java.util.ArrayList[String], a: String, b: String,
                sealedTail: Boolean): Unit = {
    var read = 0
    var write = 0
    val sz = syms.size
    val mergeLimit = if (sealedTail) sz - 1 else sz
    while (read < sz) {
      if (read + 1 < mergeLimit && syms.get(read) == a && syms.get(read + 1) == b) {
        syms.set(write, a + b)
        read += 2
      } else {
        if (write != read) syms.set(write, syms.get(read))
        read += 1
      }
      write += 1
    }
    var drop = syms.size
    while (drop > write) { drop -= 1; syms.remove(drop) }
  }
}
