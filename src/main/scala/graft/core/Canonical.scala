package graft.core

/** Shared control-char sentinels for canonical tie-break keys.
  *
  * Defined via numeric char codes (not `\ u`-style escapes) so no source
  * file carries a Java/Scala unicode-escape form for a control character —
  * a pre-lexer that expands those everywhere (comments included) would
  * otherwise see raw NUL bytes and misclassify the file as binary.
  */
object Canonical {
  /** NUL U+0000 — joins multi-part keys for deterministic lexicographic order. */
  val NulSep: String = 0.toChar.toString
}
