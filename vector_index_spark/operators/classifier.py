"""fastText-style document quality classifier — the model-based filter of
the CCNet / LLaMA curation pipelines (Wenzek et al. 2019; Touvron et al.
2023; both public papers), built on Spark MLlib.

The reference engine has no ML surface at all (SURVEY §2A is pure ANN
search); this operator is part of the north-star training-data pipeline:
rule-based filters (``gopher_quality``) catch gross junk, a learned
classifier ranks the rest. Architecture is the public fastText recipe —
hashed unigram+bigram bag-of-words, linear logistic model — expressed as a
Spark ML pipeline so training is a handful of ``treeAggregate`` passes over
the corpus (L-BFGS), and scoring is one map-only transform:

  tokenize -> bigrams -> union -> HashingTF(2^18) -> LogisticRegression

Weak supervision comes for free from the rule filters: ``gopher_quality``'s
conjunction labels the training set (the CCNet trick of using a trusted
subset as positives), so no hand labels are needed.

Scale notes: HashingTF is stateless (no vocabulary shuffle — the hashing
trick caps feature dim at 2^18 regardless of corpus size); LogisticRegression
training is O(iters) treeAggregate rounds, each a map-side gradient sum;
scoring is embarrassingly parallel with no shuffle. At 100 TB the only
state is the 2^18-dim coefficient vector, broadcast once.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import NGram, HashingTF, RegexTokenizer, SQLTransformer
from pyspark.sql import DataFrame, functions as F

from vector_index_spark.operators.textstats import gopher_quality

TOKEN_PATTERN = "[a-z0-9]+"


def weak_quality_labels(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Label documents 1.0/0.0 from the Gopher rule conjunction — the
    CCNet-style weak supervision source for classifier training."""
    flags = gopher_quality(df, text_col=text_col, id_col=id_col)
    return df.join(
        flags.select(id_col, F.col("keep").cast("double").alias("label")),
        on=id_col,
    )


def quality_pipeline(
    text_col: str = "text",
    num_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
) -> Pipeline:
    """The fastText-shaped Spark ML pipeline (untrained)."""
    tokenizer = RegexTokenizer(
        inputCol=text_col,
        outputCol="__toks",
        pattern=TOKEN_PATTERN,
        gaps=False,
        toLowercase=True,
    )
    bigrams = NGram(n=2, inputCol="__toks", outputCol="__bigrams")
    # one hashed space for unigrams+bigrams, like fastText's wordNgrams=2
    unioner = SQLTransformer(
        statement="SELECT *, concat(__toks, __bigrams) AS __grams FROM __THIS__"
    )
    tf = HashingTF(
        inputCol="__grams", outputCol="features", numFeatures=num_features
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        featuresCol="features",
        labelCol="label",
    )
    return Pipeline(stages=[tokenizer, bigrams, unioner, tf, lr])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
) -> PipelineModel:
    """Fit the classifier on a (text, label) frame. Training cost is
    max_iter treeAggregate gradient passes; no shuffle of the corpus."""
    return quality_pipeline(
        text_col=text_col,
        num_features=num_features,
        max_iter=max_iter,
        reg_param=reg_param,
    ).fit(labeled)


def score_quality(
    model: PipelineModel,
    df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Map-only scoring: (id, quality_prob, keep). The P(label=1) component
    is extracted JVM-side via vector_to_array — no Python in the hot path
    beyond the pipeline's JVM transforms."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    prob = vector_to_array(F.col("probability")).getItem(1)
    return scored.select(
        F.col(id_col),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= F.lit(threshold)).alias("keep"),
    )


def quality_filter_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_features: int = 1 << 18,
    max_iter: int = 30,
) -> DataFrame:
    """End-to-end weak-label -> train -> score -> filter on one corpus.
    Returns the surviving rows of ``df``. The train pass runs on the same
    frame being filtered (self-training on rule labels, as in CCNet)."""
    labeled = weak_quality_labels(df, text_col=text_col, id_col=id_col)
    model = train_quality_classifier(
        labeled, text_col=text_col, num_features=num_features, max_iter=max_iter
    )
    scores = score_quality(model, df, id_col=id_col, threshold=threshold)
    return df.join(
        scores.filter(F.col("keep")).select(id_col), on=id_col, how="left_semi"
    )
