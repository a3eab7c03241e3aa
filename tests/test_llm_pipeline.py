"""Focused semantics tests for queries/llm_pipeline.py operators
(driver-gate parity is covered by tools/driver_check.py; these pin the
algorithmic details on hand-built corpora where expected outputs are
derivable by hand)."""

import numpy as np
import pandas as pd
import pytest

from odc_stac_spark.queries import REGISTRY
from odc_stac_spark.queries.llm_pipeline import SUBSTR_WINDOW


@pytest.fixture()
def mini_docs_dir(tmp_path, spark):
    """documents.parquet with hand-built duplication structure."""
    words = [f"w{i}" for i in range(100)]
    shared = " ".join(f"s{i}" for i in range(10))  # 10-token shared span
    shared2 = " ".join(f"z{i}" for i in range(SUBSTR_WINDOW))  # exactly W tokens
    docs = [
        # docs 0 and 1 share the 10-token span (plus unique tails)
        (0, " ".join(words[:20]) + " " + shared + " " + " ".join(words[20:40])),
        (1, " ".join(words[40:60]) + " " + shared + " " + " ".join(words[60:80])),
        # doc 2: totally unique
        (2, " ".join(f"u{i}" for i in range(50))),
        # doc 3: shares TWO disjoint spans (with 1 and with 2^... with 0/1 via
        # `shared`, and with doc 4 via `shared2`)
        (3, shared + " " + " ".join(f"m{i}" for i in range(30)) + " " + shared2),
        (4, " ".join(f"k{i}" for i in range(25)) + " " + shared2),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": ["en"] * len(docs),
            "source": ["test"] * len(docs),
            "n_chars": [len(d[1]) for d in docs],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_substring_dedup_interval_union(spark, mini_docs_dir):
    out = (
        REGISTRY["text_substring_dedup"]
        .spark_fn(spark, mini_docs_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    W = SUBSTR_WINDOW
    # doc 2 has no cross-doc duplicated window at all
    assert 2 not in out.index
    # docs 0/1: the shared 10-token span yields 10-W+1 = 3 windows whose
    # interval union covers exactly 10 tokens (8 + 1 + 1 — the merge rule)
    assert int(out.loc[0, "dup_windows"]) == 10 - W + 1
    assert int(out.loc[0, "dup_tokens"]) == 10
    assert int(out.loc[1, "dup_tokens"]) == 10
    # doc 3 carries BOTH spans: 10 + W tokens across two disjoint intervals
    assert int(out.loc[3, "dup_tokens"]) == 10 + W
    assert int(out.loc[3, "dup_windows"]) == (10 - W + 1) + 1
    # doc 4: exactly one duplicated window of exactly W tokens
    assert int(out.loc[4, "dup_windows"]) == 1
    assert int(out.loc[4, "dup_tokens"]) == W
    # fractions = dup_tokens / n_tokens
    for d in out.index:
        assert abs(
            out.loc[d, "dup_fraction"]
            - out.loc[d, "dup_tokens"] / out.loc[d, "n_tokens"]
        ) < 1e-6


def test_substring_dedup_no_python_udfs(spark, sf_dir):
    df = REGISTRY["text_substring_dedup"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_filter_hand_built(spark, tmp_path):
    """Gopher repetition fractions on a corpus with known structure."""
    import pandas as pd

    docs = [
        # doc 0: "a b" repeated 10× → top bigram "a b" ×10 of 19 bigrams,
        # covering 20/20 tokens; heavy 5-gram repetition too
        (0, " ".join(["a", "b"] * 10)),
        # doc 1: 30 distinct tokens → no repetition at all
        (1, " ".join(f"w{i}" for i in range(30))),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [len(d[1]) for d in docs],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    from odc_stac_spark.queries import load_all

    out = (
        load_all()["text_repetition_filter"]
        .spark_fn(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    # doc 0: top bigram count 10 → 10*2/20 = 1.0; every 5-gram duplicated
    assert abs(out.loc[0, "top_bigram_frac"] - 1.0) < 1e-9
    assert abs(out.loc[0, "dup_fivegram_frac"] - 1.0) < 1e-9
    assert bool(out.loc[0, "would_filter"])
    # doc 1: all counts 1 → top fracs = n/n_tokens, no dup 5-grams
    assert abs(out.loc[1, "top_bigram_frac"] - 2 / 30) < 1e-6  # ROUND(.,6)
    assert out.loc[1, "dup_fivegram_frac"] == 0.0
    assert not bool(out.loc[1, "would_filter"])
