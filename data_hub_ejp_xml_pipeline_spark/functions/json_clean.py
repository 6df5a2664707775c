"""Recursive null-key stripping with False preserved.

Re-implements the semantics of the reference's ``remove_key_with_null_value``
(``ejp_xml_pipeline/transform_json.py:1-15``, pinned by
``tests/unit_test/transform_json_test.py:5-21``): ``None``, ``''``, ``[]``,
``{}`` are dropped; ``False`` and ``0`` survive. Used driver-side by the
zip/XML parser before JSON serialization (the Spark-side analog for struct
columns is ``functions.scalars.to_clean_json``)."""

from __future__ import annotations

from typing import Any


def remove_empty_keys(obj: Any) -> Any:
    """Recursively strip keys whose value is empty (None/''/[]/{}).

    ``False`` and ``0`` are kept — emptiness, not falsiness, is the test.
    Lists are cleaned element-wise; elements that become empty are dropped.
    """
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            cleaned = remove_empty_keys(v)
            if _keep(cleaned):
                out[k] = cleaned
        return out
    if isinstance(obj, list):
        return [c for c in (remove_empty_keys(v) for v in obj) if _keep(c)]
    return obj


def _keep(v: Any) -> bool:
    if v is None:
        return False
    if isinstance(v, (str, list, dict)) and len(v) == 0:
        return False
    return True
