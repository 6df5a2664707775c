"""Algebraic properties of merge_schemas under hypothesis-generated
schemas (nested structs/arrays, case-varying name collisions, widening
chains). Pure driver-side — no Spark jobs, so hundreds of examples are
cheap."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.table.schema_evolution import (
    _WIDENING_CHAINS,
    merge_schemas,
)

_SCALARS = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
]
# small name pool with case variants → frequent (case-insensitive) collisions
_NAMES = st.sampled_from(["a", "A", "b", "B", "cc", "CC", "d"])


def _dtype(depth: int):
    if depth <= 0:
        return st.sampled_from(_SCALARS)
    return st.one_of(
        st.sampled_from(_SCALARS),
        st.deferred(lambda: _struct(depth - 1)),
        st.deferred(lambda: _dtype(depth - 1).map(T.ArrayType)),
    )


def _struct(depth: int):
    return st.lists(
        st.tuples(_NAMES, _dtype(depth)), min_size=1, max_size=4,
        unique_by=lambda t: t[0].lower(),
    ).map(
        lambda fs: T.StructType([T.StructField(n, d, True) for n, d in fs])
    )


SCHEMAS = _struct(2)


def _chain_of(t):
    for chain in _WIDENING_CHAINS:
        if t in chain:
            return chain
    return None


@settings(max_examples=150, deadline=None)
@given(SCHEMAS)
def test_idempotent(a):
    assert merge_schemas(a, a) == a


@settings(max_examples=150, deadline=None)
@given(SCHEMAS, SCHEMAS)
def test_absorbing_and_stable(a, b):
    """Re-merging the same incoming schema changes nothing (what per-batch
    evolution relies on), and merging the RESULT back into itself is the
    identity."""
    m = merge_schemas(a, b)
    assert merge_schemas(m, b) == m
    assert merge_schemas(m, m) == m


@settings(max_examples=150, deadline=None)
@given(SCHEMAS, SCHEMAS)
def test_existing_names_and_order_survive(a, b):
    m = merge_schemas(a, b)
    assert [f.name for f in m.fields][: len(a.fields)] == [f.name for f in a.fields]
    # appended fields come only from b, in b's order
    extra = [f.name for f in m.fields][len(a.fields):]
    a_lower = {f.name.lower() for f in a.fields}
    assert extra == [f.name for f in b.fields if f.name.lower() not in a_lower]


@settings(max_examples=150, deadline=None)
@given(SCHEMAS, SCHEMAS)
def test_scalar_types_only_widen_along_chains(a, b):
    """For every name collision: merged type equals existing, OR both sit
    on one widening chain and merged is the wider — never anything else
    (no silent narrowing, no cross-chain jumps, no struct clobbering)."""
    m = merge_schemas(a, b)
    by_lower = {f.name.lower(): f for f in b.fields}
    for fa, fm in zip(a.fields, m.fields):
        inc = by_lower.get(fa.name.lower())
        if inc is None:
            assert fm.dataType == fa.dataType
            continue
        if isinstance(fa.dataType, (T.StructType, T.ArrayType)):
            continue  # recursion covered by the same property at depth
        chain = _chain_of(fa.dataType)
        if chain is not None and inc.dataType in chain:
            wider = chain[max(chain.index(fa.dataType), chain.index(inc.dataType))]
            assert fm.dataType == wider
        else:
            assert fm.dataType == fa.dataType  # existing wins
