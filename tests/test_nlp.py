"""Model-backed NLP path (N1/N3/N5): auto-fallback resolution, loud
ImportError when the model backend is forced but absent, and the
deterministic fallback UDFs producing the reference's own fallback
behaviors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omni_crawler_spark.operators import nlp as N

TEXT = (
    "Alice Johnson met Bob Smith in Geneva. Acme Corp reported strong "
    "growth and success, a great win. The failure in Lyon was bad news."
)


def test_auto_resolves_to_deterministic_in_sandbox():
    # spaCy/TextBlob are not installed here: auto must fall back
    assert not N.backend_available("spacy")
    assert not N.backend_available("textblob")
    assert N.ner_entities_udf("auto") is not None
    assert N.sentiment_udf("auto") is not None


def test_model_backend_raises_loudly_when_absent():
    with pytest.raises(ImportError):
        N.ner_entities_udf("model")
    with pytest.raises(ImportError):
        N.sentiment_udf("model")
    with pytest.raises(ImportError):
        N.key_phrases_udf("model")


def test_ner_regex_fallback(spark):
    df = spark.createDataFrame([(1, TEXT)], "id long, text string")
    row = df.select(N.ner_entities_udf()(F.col("text")).alias("e")).collect()[0]
    assert "Alice Johnson" in row.e["persons"]
    assert "Bob Smith" in row.e["persons"]
    assert "Acme Corp" in row.e["organizations"]
    assert "Geneva" in row.e["locations"]
    assert "Lyon" in row.e["locations"]


def test_sentiment_lexicon_fallback(spark):
    df = spark.createDataFrame(
        [(1, "growth success win great"), (2, "bad failure crisis"),
         (3, "nothing scored here")],
        "id long, text string",
    )
    rows = {
        r.id: r.s
        for r in df.select(
            "id", N.sentiment_udf()(F.col("text")).alias("s")
        ).collect()
    }
    assert rows[1].label == "positive" and rows[1].polarity == 1.0
    assert rows[2].label == "negative" and rows[2].polarity == -1.0
    assert rows[3].label == "neutral" and rows[3].polarity == 0.0
    assert rows[3].subjectivity == 0.0


def test_key_phrases_bigram_fallback(spark):
    df = spark.createDataFrame(
        [(1, "market growth market growth market growth other words")],
        "id long, text string",
    )
    row = df.select(N.key_phrases_udf()(F.col("text")).alias("p")).collect()[0]
    assert row.p[0] == "market growth"  # most frequent bigram first


def test_langid_ngram_fit_predict(spark):
    """Distributed Cavnar-Trenkle langid: profiles separate languages
    with distinct character distributions; prediction is deterministic
    (total-order tie-breaks) and exact on a separable corpus."""
    from pyspark.sql import functions as F

    from omni_crawler_spark.operators import langid as L

    phrases = {
        "aa": "zork blim quux fizzle",
        "bb": "grunt wobble snark jent",
        "cc": "plonk dree vast umber",
    }
    rows = []
    for li, (lang, phrase) in enumerate(sorted(phrases.items())):
        for i in range(20):
            rows.append(
                (li * 100 + i, lang,
                 f"common shared words here {phrase} {phrase} tail {i}")
            )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    fit = docs.filter(F.pmod("doc_id", F.lit(5)) < 4)
    test = docs.filter(F.pmod("doc_id", F.lit(5)) == 4)
    prof = L.fit_profiles(fit, k=32)
    # profile shape: exactly k rows per lang, weights k..1
    sizes = {r.lang: r.n for r in
             prof.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"aa": 32, "bb": 32, "cc": 32}
    pred1 = {r.doc_id: r.lang_pred for r in L.predict(test, prof).collect()}
    pred2 = {r.doc_id: r.lang_pred for r in L.predict(test, prof).collect()}
    assert pred1 == pred2  # deterministic
    truth = {r.doc_id: r.lang for r in test.collect()}
    assert pred1 == truth  # separable corpus -> exact
