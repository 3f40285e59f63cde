package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Corpus-trained linear quality classifier — the fastText/logistic-
  * regression filter every modern pretraining pipeline runs (GPT-3:
  * LR over web pages with curated corpora as positives, Brown et al.
  * 2020 §A; LLaMA: fastText quality scores): hash each token into a
  * `dim`-bucket feature space (hashing trick), train full-batch
  * logistic regression IN-ENGINE, score every document.
  *
  * Everything is engine-portable BY CONSTRUCTION, the [[LmScore]]
  * discipline applied to training: weights live on an integer
  * micro-logit grid, per-doc sigmoid errors quantize to the same grid
  * before any aggregation (so float sums never cross a shuffle —
  * only exact integers do), and the weight update is a sign-split
  * truncating integer division (identical in Spark `div` and SQL).
  * The ONE residual float per doc per iteration is `exp` inside the
  * sigmoid, whose cross-engine 1-ulp wobble is absorbed by the 1e6
  * grid (flip probability ≈ ulp/grid ≈ 1e-10 per value — the
  * accepted q50/q51/q60 precedent). Training therefore REPLAYS IN
  * SQL, iterations unrolled as CTEs: q66 hash-verifies a full
  * train-and-score round trip, which is rare air for a distributed
  * learner.
  *
  * Scale shape per iteration: margins = feats ⋈ broadcast(weights)
  * (the model is `dim` rows — driver/model-sized BY DESIGN) → one
  * groupBy on the DOC id; gradients = feats ⋈ errors (doc-keyed hash
  * join) → one groupBy on the FEATURE id (dim-bounded, map-side
  * combined). The corpus text is tokenized once into the feature
  * table; raw text never moves again. `iters` × 2 narrow shuffles
  * total, nothing corpus-sized collects.
  */
object LogReg {

  /** Portable hashed feature id: md5 bucket of the token, mod `dim`
    * (the engine-wide q46 recipe — any system with md5 reproduces
    * the feature space exactly). */
  def featureId(token: Column, dim: Int): Column =
    conv(substring(md5(token.cast("binary")), 1, 6), 16, 10)
      .cast("long") % dim

  /** Sparse hashed bag-of-words: one row per (doc, feature) with the
    * integer token count `x`. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     dim: Int): DataFrame =
    df.select(col(idCol),
        explode(Analyzer.tokenize(coalesce(col(textCol), lit("")))).as("__tok"))
      .select(col(idCol), featureId(col("__tok"), dim).as("f"))
      .groupBy(col(idCol), col("f"))
      .agg(count(lit(1)).as("x"))

  /** Quantized sigmoid error: floor(1e6·σ(m) + 0.5) − y·1e6, with the
    * margin read off the integer micro-logit grid. Rendered the same
    * way in the SQL oracle — every double op except exp is correctly
    * rounded, so both engines see identical inputs. */
  private def errorQ(marginQ: Column, y: Column): Column =
    floor(lit(1000000.0) /
        (lit(1.0) + exp(-(marginQ.cast("double") / lit(1000000.0))))
      + lit(0.5)).cast("long") - y.cast("long") * lit(1000000L)

  /** Full-batch logistic-regression training. `labels` = (idCol, y)
    * with y ∈ {0,1}; returns the weight table `(f, w)` in integer
    * micro-logits — the model, `dim` rows. Update per iteration:
    * w ← w − truncdiv(Σ_docs e_q·x, N) (unit learning rate on the
    * micro-logit grid; sign-split so Spark's truncating `div` and
    * SQL's `//` agree on negatives). */
  def train(df: DataFrame, idCol: String, textCol: String, label: Column,
            dim: Int = 256, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val feats = hashedFeatures(df, idCol, textCol, dim).localCheckpoint()
    val labels = df.select(col(idCol), label.cast("long").as("y"))
      .localCheckpoint()
    val n = labels.count()
    var w: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("f",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType))))
    for (_ <- 1 to iters) {
      val m = marginsQ(feats, labels, idCol, w)
      val e = m.join(labels, idCol)
        .select(col(idCol), errorQ(col("margin_q"), col("y")).as("e"))
      val g = feats.join(e, idCol)
        .groupBy(col("f")).agg(sum(col("e") * col("x")).as("g"))
      w = g.join(w, Seq("f"), "left")
        .select(col("f"),
          (coalesce(col("w"), lit(0L)) -
            when(col("g") >= 0, expr(s"g div ${n}L"))
              .otherwise(-expr(s"(-g) div ${n}L"))).as("w"))
        .localCheckpoint()
    }
    w
  }

  /** Integer margins under a weight table: Σ_f w(f)·x(doc,f), docs
    * with no known features score 0. */
  private def marginsQ(feats: DataFrame, docs: DataFrame, idCol: String,
                       weights: DataFrame): DataFrame = {
    val contrib = feats.join(broadcast(weights), Seq("f"))
      .groupBy(col(idCol)).agg(sum(col("w") * col("x")).as("margin_q"))
    docs.select(col(idCol))
      .join(contrib, Seq(idCol), "left")
      .withColumn("margin_q", coalesce(col("margin_q"), lit(0L)))
  }

  /** Score a corpus under a trained weight table: `(idCol, margin_q,
    * p_q, pred)` — micro-logit margin, micro-quantized probability,
    * and the >0.5 verdict. */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, dim: Int = 256): DataFrame =
    marginsQ(hashedFeatures(df, idCol, textCol, dim),
      df.select(col(idCol)), idCol, weights)
      .withColumn("p_q",
        floor(lit(1000000.0) /
            (lit(1.0) + exp(-(col("margin_q").cast("double") / lit(1000000.0))))
          + lit(0.5)).cast("long"))
      .withColumn("pred", (col("margin_q") > 0).cast("boolean"))

  /** Train-and-score in one call (the q66 surface). */
  def trainScore(df: DataFrame, idCol: String, textCol: String,
                 label: Column, dim: Int = 256, iters: Int = 2): DataFrame = {
    val w = train(df, idCol, textCol, label, dim, iters)
    df.select(col(idCol), label.cast("long").as("y"))
      .join(score(df, idCol, textCol, w, dim), Seq(idCol))
  }
}
