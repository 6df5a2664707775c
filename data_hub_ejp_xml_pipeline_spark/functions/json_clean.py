"""Recursive null-key stripping, exact reference semantics.

Re-implements the reference's ``remove_key_with_null_value``
(``ejp_xml_pipeline/transform_json.py:1-15``, pinned by
``tests/unit_test/transform_json_test.py:5-21``) byte-for-byte on the
stored JSON:

* a dict key is dropped when its value is falsy and not a bool —
  ``None``, ``''``, ``0``, ``0.0``, ``[]``, ``{}`` all go; ``False`` and
  ``True`` stay;
* the falsiness test runs BEFORE recursion, so a container that only
  becomes empty after cleaning its children is kept (as an empty
  container);
* list elements are never dropped — they are only recursed into.

Used driver-side by the zip/XML parser before JSON serialization (the
Spark-side analog for struct columns is ``functions.scalars.to_clean_json``,
which documents its own, struct-typed semantics).
"""

from __future__ import annotations

from typing import Any


def remove_empty_keys(obj: Any) -> Any:
    """Pure (non-mutating) equivalent of the reference algorithm: the
    keep-test runs on the pre-recursion value, so containers that empty
    out during cleaning survive as empty containers."""
    if isinstance(obj, dict):
        return {
            k: remove_empty_keys(v)
            for k, v in obj.items()
            if v or isinstance(v, bool)
        }
    if isinstance(obj, list):
        return [remove_empty_keys(v) for v in obj]
    return obj
