"""Distributed BPE trainer (operators/bpe.py) — exact merge-sequence
parity against an independent sequential reference, plus the greedy
in-word merge semantics."""

import pandas as pd
import pytest

from odc_stac_spark.operators.bpe import bpe_reference, bpe_train, word_histogram


@pytest.fixture()
def corpus_df(spark):
    texts = [
        "low lower lowest new newer newest wide wider widest",
        "low low lower new new newest",
        "the newer the wider the lower the better",
        "aaa aaaa aa aaa banana bandana",
    ]
    return spark.createDataFrame(pd.DataFrame({"text": texts}))


def test_merge_sequence_matches_reference_exactly(spark, corpus_df):
    merges = bpe_train(corpus_df, n_merges=15)
    hist = {r["word"]: r["cnt"] for r in word_histogram(corpus_df).collect()}
    ref = bpe_reference(hist.items(), n_merges=15)
    assert merges == ref
    assert len(merges) >= 10
    # counts strictly positive, steps consecutive
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert all(m[3] >= 2 for m in merges)


def test_greedy_overlap_semantics(spark):
    # merging (a, a) over "aaaa" must produce [aa, aa], not [aa, a, a] or
    # a triple — both the Catalyst fold and the reference scan agree
    df = spark.createDataFrame(pd.DataFrame({"text": ["aaaa aaaa aaa"]}))
    merges = bpe_train(df, n_merges=2)
    hist = {r["word"]: r["cnt"] for r in word_histogram(df).collect()}
    assert merges == bpe_reference(hist.items(), n_merges=2)
    assert merges[0][1] == "a" and merges[0][2] == "a"
    # "aaaa"×2 contributes 2 pairs each post-greedy; "aaa" contributes 1
    assert merges[1][1] == "aa" and merges[1][2] == "aa"


def test_registry_query_runs(spark, sf_dir):
    from odc_stac_spark.queries import load_all

    REGISTRY = load_all()
    out = REGISTRY["text_bpe_train"].spark_fn(spark, sf_dir).toPandas()
    assert len(out) >= 5
    assert list(out.columns) == ["step", "left", "right", "merged", "pair_count"]
    assert (out["merged"] == out["left"] + out["right"]).all()
    # deterministic: a second run reproduces the identical table
    out2 = REGISTRY["text_bpe_train"].spark_fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(out, out2)
