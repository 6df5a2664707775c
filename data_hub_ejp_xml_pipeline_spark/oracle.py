"""Trivially-correct pandas oracle for the CDC final state (FIXTURES.md §3).

Independent of the engine: plain pandas groupby → max-lsn → drop deletes.
Mirrors the reference's golden-dict unit-test style
(``tests/unit_test/formats/ejp_manuscript_xml_test.py:224-886``): the
expected output is computed by the dumbest possible correct program.
"""

from __future__ import annotations

import pandas as pd


def expected_final_state_pandas(changelog: pd.DataFrame) -> pd.DataFrame:
    """Per-key last-writer-wins final state.

    For each ``doc_id`` take the event with max ``lsn`` (replayed events
    are identical full-row images, so ties are harmless); a final ``D``
    removes the key. Returns columns
    ``doc_id, tokens, n_tok, source, _lsn`` sorted by ``doc_id``.
    """
    latest = (
        changelog.sort_values(["doc_id", "lsn"], kind="mergesort")
        .drop_duplicates(["doc_id"], keep="last")
    )
    final = latest[latest["op"] != "D"]
    out = final[["doc_id", "tokens", "n_tok", "source", "lsn"]].rename(columns={"lsn": "_lsn"})
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_final_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Per-row token-array equality vs the fixture (BASELINE.json invariant)."""
    a = actual.sort_values("doc_id").reset_index(drop=True)
    e = expected.sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    assert list(a["doc_id"]) == list(e["doc_id"]), "doc_id sets differ"
    for col in ("n_tok", "source", "_lsn"):
        if col in a.columns and col in e.columns:
            mism = (a[col].fillna(-1) != e[col].fillna(-1)).sum()
            assert mism == 0, f"{col}: {mism} mismatching rows"
    for i, (ta, te) in enumerate(zip(a["tokens"], e["tokens"])):
        la = list(ta) if ta is not None else None
        le = list(te) if te is not None else None
        assert la == le, f"token-array mismatch at row {i} doc_id={a['doc_id'][i]}"
