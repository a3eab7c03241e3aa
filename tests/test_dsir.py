"""DSIR data selection (text_dsir_select): behavioral invariants beyond
the DuckDB hash gate in test_oracle.py.

Paper rule (Xie et al. 2023, arXiv:2302.03169): importance weight =
summed log-ratio of smoothed target vs raw unigram probabilities;
selection = Gumbel-perturbed score over a threshold. Our Gumbel uniform
is an integer hash of doc_id, so the whole query is deterministic.
"""

from __future__ import annotations

import math

from odc_stac_spark.queries.llm_pipeline import (
    _DSIR_A,
    _DSIR_M,
    DSIR_THRESHOLD,
    text_dsir_select,
)


def test_dsir_invariants(spark, sf_dir):
    rows = text_dsir_select(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(by_id) == len(rows) > 0

    # selection must be a real partition at the synthetic threshold
    kept = [r for r in rows if r.selected]
    assert kept and len(kept) < len(rows)

    for r in rows:
        assert r.n_tokens > 0
        # score = weight + gumbel(hash(doc_id)) — recompute the
        # deterministic Gumbel key scalar-side and check the decision
        u = ((r.doc_id * _DSIR_A) % _DSIR_M + 1) / float(_DSIR_M + 1)
        gumbel = -math.log(-math.log(u))
        # weight/score are rounded to 6 digits in the output; allow the
        # rounding slack when re-deriving the decision
        score = r.weight + gumbel
        if abs(score - DSIR_THRESHOLD) > 1e-4:
            assert r.selected == (score >= DSIR_THRESHOLD), r

    # determinism: a second run returns the identical decision set
    again = {r.doc_id: r.selected for r in text_dsir_select(spark, sf_dir).collect()}
    assert again == {r.doc_id: r.selected for r in rows}
