package graft.eval

import graft.model.Labels

/** Set-match evaluation of predicted vs ground-truth root causes
  * (reference utils/evaluation.py:4-28, run.py:87-88). */
object Evaluation {

  final case class Score(tp: Int, fp: Int, fn: Int) {
    def f1: Double =
      if (2 * tp + fp + fn == 0) 0.0 else 2.0 * tp / (2 * tp + fp + fn)
    def +(o: Score): Score = Score(tp + o.tp, fp + o.fp, fn + o.fn)
  }

  /** TP/FP/FN for one instance. Predictions are canonicalized before the
    * set match; an empty prediction list scores (0, 0, |truth|). */
  def score(predictions: Seq[String], label: String): Score = {
    val truth = Labels.parse(label)
    val preds = Labels.canonicalPredictions(predictions)
    if (preds.isEmpty) return Score(0, 0, truth.size)
    val tp = truth.count(preds.contains)
    val fn = truth.size - tp
    val fp = math.max(preds.size - tp, 0)
    Score(tp, fp, fn)
  }
}
