package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier — the fastText-style linear model every
  * large pipeline ends up with once hand-tuned rule batteries
  * ([[TextStats.gopherVerdicts]], C4 line rules) run out of precision:
  * label a seed set, featurize cheaply, fit logistic weights, score the
  * corpus, keep by threshold or feed [[Sampling.byScoreProbabilityPredicate]]
  * for soft filtering (the CCNet/LLaMA "wikipedia-like" classifier
  * pattern, re-derived).
  *
  * Training is FULL-BATCH gradient descent, deterministic by
  * construction: no sampling, no shuffling, no per-row state — the
  * gradient is a (dim+1)-wide mean over the corpus, i.e. one map-side
  * partially-aggregated pass per step (Spark's `treeAggregate` shape,
  * expressed as a declarative agg so codegen + AQE apply). Weights live
  * on the driver between steps (dim doubles — a bounded scalar read, the
  * centroid-read idiom) and enter the next step's plan as literals, so
  * at 100 TB each step costs exactly one corpus scan and nothing
  * shuffles but partial sums. Deliberately NOT SGD: determinism is what
  * makes the operator oracle-able and its releases reproducible;
  * logistic loss is convex, so full-batch GD converges without the
  * tricks SGD needs.
  */
object QualityModel {

  /** The fixed featurizer: [bias, log1p(token count), punctuation ratio,
    * digit ratio, uppercase ratio] — cheap single-pass character/token
    * arithmetic (codegen'd, zero shuffle), each a known quality signal
    * (length prior; symbol/boilerplate load; numeric-table load;
    * shouting/code load). Ratios are over character length with an
    * empty-text guard.
    */
  def features(text: Column): Column = {
    val len = length(text).cast("double")
    def ratioOf(pattern: String): Column =
      when(len > 0,
        (len - length(regexp_replace(text, pattern, ""))) / len)
        .otherwise(lit(0.0))
    array(
      lit(1.0),
      log1p(graft.functions.TextFns.tokenCount(text).cast("double")),
      ratioOf("[^A-Za-z0-9\\s]"),
      ratioOf("[0-9]"),
      ratioOf("[A-Z]"))
  }

  val FeatureDim = 5

  private def dotW(feat: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(feat, array(w.map(lit(_)): _*), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Fit logistic weights by `steps` full-batch GD steps at rate `lr`
    * from w = 0. `featCol` is an `array<double>` of width `dim`,
    * `labelCol` a 0/1 numeric. Returns the learned weights.
    *
    * Each step: grad_j = mean((sigmoid(w·x) − y) · x_j), w ← w − lr·grad
    * — one job per step, each a map-side (dim+1)-column avg.
    */
  def trainLogistic(df: DataFrame, featCol: String, labelCol: String,
                    dim: Int, steps: Int, lr: Double): Array[Double] = {
    require(dim >= 1 && steps >= 0 && lr > 0, s"bad hyperparams ($dim, $steps, $lr)")
    val f = col(s"`$featCol`")
    val y = col(s"`$labelCol`").cast("double")
    var w = Array.fill(dim)(0.0)
    for (_ <- 0 until steps) {
      val resid = sigmoid(dotW(f, w)) - y
      val grads = df.agg(
        avg(resid * element_at(f, 1)).as("g0"),
        (1 until dim).map(j => avg(resid * element_at(f, j + 1)).as(s"g$j")): _*)
        .head()
      // empty corpus: avg is null — no evidence, weights stand
      w = Array.tabulate(dim)(j =>
        if (grads.isNullAt(j)) w(j) else w(j) - lr * grads.getDouble(j))
    }
    w
  }

  /** Score a corpus with learned weights: appends `quality_score`
    * (sigmoid of the margin) — map-side, zero shuffle, composes with the
    * sampling/split family downstream.
    */
  def score(df: DataFrame, featCol: String, w: Array[Double]): DataFrame =
    df.withColumn("quality_score", sigmoid(dotW(col(s"`$featCol`"), w)))

  /** Training summary over a fitted model: document count, per-weight
    * values, threshold-0.5 accuracy, mean negative log-likelihood — the
    * one-row audit record a training run logs.
    */
  def fitSummary(df: DataFrame, featCol: String, labelCol: String,
                 w: Array[Double]): DataFrame = {
    val f = col(s"`$featCol`")
    val y = col(s"`$labelCol`").cast("double")
    val p = sigmoid(dotW(f, w))
    val weightCols = w.zipWithIndex.map { case (v, j) =>
      round(lit(v), 6).as(s"w$j") }
    df.agg(
      count(lit(1)).as("n_docs"),
      (weightCols :+
        sum(when((p > 0.5).cast("double") === y, 1L).otherwise(0L)).as("n_correct") :+
        round(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))), 6)
          .as("mean_nll")): _*)
  }
}
