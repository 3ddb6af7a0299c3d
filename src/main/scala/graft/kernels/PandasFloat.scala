package graft.kernels

/** Port of pandas' default CSV float parser `precise_xstrtod`
  * (pandas/_libs/src/parser/tokenizer.c — public BSD-3 pandas source;
  * since pandas 1.x the C-engine default `float_precision="high"`).
  *
  * Java's `Double.parseDouble` is correctly rounded; `precise_xstrtod`
  * instead accumulates at most 17 significant digits into a running
  * double and applies the decimal exponent with ONE multiply/divide
  * against a power-of-ten table — off by 1 ULP from correct rounding for
  * some 16-17-digit inputs (e.g. "121.63297364647785" →
  * 0x1.e6882a3e5b68ap+6, where correct rounding gives ...b68b).
  *
  * The reference reads every fundamental/derived measure CSV through
  * pandas, and its threshold comparisons (riskloc's `risk >= 0.5` hits
  * exactly 0.5 on anomaly leaves) sit right on those ULPs — so snapshot
  * reads must parse bit-identically ([[graft.sources.InstanceSource]]).
  * Pinned against the container's pandas by
  * fixtures/pandas_float_golden.tsv (tools/make_pandasfloat_golden.py).
  */
object PandasFloat {

  private val MaxDigits = 17

  /** e[i] = 10^i as the correctly-rounded double literal (the C table
    * `e[]` of constants 1e0..1e308). */
  private val e: Array[Double] = {
    val a = new Array[Double](309)
    var i = 0
    while (i < 309) { a(i) = BigDecimal(10).pow(i).doubleValue; i += 1 }
    a
  }

  /** precise_xstrtod replica over a complete trimmed token (sci='e',
    * decimal='.', no thousands separator — pandas C-parser defaults).
    * Non-numeric content falls back to Java parsing (pandas routes
    * inf/nan spellings through a separate path), else NaN. */
  def parse(str: String): Double = {
    val s = str.trim
    val len = s.length
    if (len == 0) return Double.NaN
    var p = 0
    var negative = false
    if (s.charAt(0) == '-') { negative = true; p = 1 }
    else if (s.charAt(0) == '+') p = 1

    var number = 0.0
    var exponent = 0
    var numDigits = 0
    var numDecimals = 0

    while (p < len && isDigit(s.charAt(p))) {
      if (numDigits < MaxDigits) {
        number = number * 10.0 + (s.charAt(p) - '0')
        numDigits += 1
      } else exponent += 1
      p += 1
    }

    if (p < len && s.charAt(p) == '.') {
      p += 1
      while (numDigits < MaxDigits && p < len && isDigit(s.charAt(p))) {
        number = number * 10.0 + (s.charAt(p) - '0')
        p += 1
        numDigits += 1
        numDecimals += 1
      }
      if (numDigits >= MaxDigits) while (p < len && isDigit(s.charAt(p))) p += 1
      exponent -= numDecimals
    }

    if (numDigits == 0) return fallback(s)
    if (negative) number = -number

    if (p < len && (s.charAt(p) == 'e' || s.charAt(p) == 'E')) {
      p += 1
      var negExp = false
      if (p < len && s.charAt(p) == '-') { negExp = true; p += 1 }
      else if (p < len && s.charAt(p) == '+') p += 1
      var n = 0
      var expDigits = 0
      while (expDigits < MaxDigits && p < len && isDigit(s.charAt(p))) {
        n = n * 10 + (s.charAt(p) - '0')
        expDigits += 1
        p += 1
      }
      if (negExp) exponent -= n else exponent += n
      if (expDigits == 0) return fallback(s) // bare trailing 'e'
    }
    if (p != len) return fallback(s) // trailing junk — not a plain float

    // Known divergence from pandas: for exponent>308 tokens (e.g. "1e309")
    // precise_xstrtod sets ERANGE and pandas refuses the float64 coercion
    // (column stays object / raises); we return ±Infinity instead. Such
    // overflow tokens never occur in the reference corpora (generator
    // emits %f-formatted values), so no golden can pin the difference.
    if (exponent > 308) {
      if (negative) Double.NegativeInfinity else Double.PositiveInfinity
    } else if (exponent > 0) number * e(exponent)
    else if (exponent < -308) { // subnormal range: two divisions
      if (exponent < -616) 0.0
      else {
        val n1 = number / e(-308 - exponent)
        n1 / e(308)
      }
    } else number / e(-exponent)
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def fallback(s: String): Double =
    try java.lang.Double.parseDouble(s)
    catch { case _: NumberFormatException => Double.NaN }
}
