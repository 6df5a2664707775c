"""Scalar function parity tests — golden-value style, mirroring the
reference's unit suites (utils/timestamp_test.py, utils/xml_test.py,
ejp_manuscript_xml_test.py key-extraction tests)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.functions import scalars as S


def _one(spark, col, **row):
    import json

    df = spark.createDataFrame([row]) if row else spark.range(1)
    del json
    return df.select(col.alias("v")).first().v


def test_to_bool(spark):
    df = spark.createDataFrame(
        [("true",), ("false",), ("TRUE",), ("",), (None,)], ["c"]
    ).select(S.to_bool("c").alias("v"))
    assert [r.v for r in df.collect()] == [True, False, None, None, None]


def test_parse_yes_no(spark):
    df = spark.createDataFrame(
        [("yes",), ("No",), ("YES",), ("maybe",), (None,)], ["c"]
    ).select(S.parse_yes_no("c").alias("v"))
    assert [r.v for r in df.collect()] == [True, False, True, None, None]


def test_to_int(spark):
    df = spark.createDataFrame([("42",), ("",), ("x",), (None,)], ["c"]).select(
        S.to_int("c").alias("v")
    )
    assert [r.v for r in df.collect()] == [42, None, None, None]


def test_flag_active(spark):
    df = spark.createDataFrame([("1",), ("0",), ("",)], ["c"]).select(
        S.flag_active("c").alias("v")
    )
    assert [r.v for r in df.collect()] == [True, False, False]


def test_parse_timestamp_naive_is_us_eastern(spark):
    """Reference trap (SURVEY.md §7): naive inputs are US/Eastern, not UTC
    (timestamp.py:8-17). 2020-01-01 12:00 EST == 17:00 UTC."""
    df = spark.createDataFrame(
        [("2020-01-01T12:00:00",), ("2020-01-01T12:00:00Z",), ("2020-07-01T12:00:00",)],
        ["c"],
    ).select(S.parse_timestamp_utc("c").alias("v"))
    vals = [r.v for r in df.collect()]
    assert vals[0] == dt.datetime(2020, 1, 1, 17, 0)  # EST = UTC-5
    assert vals[1] == dt.datetime(2020, 1, 1, 12, 0)
    assert vals[2] == dt.datetime(2020, 7, 1, 16, 0)  # EDT = UTC-4


def test_format_iso_z(spark):
    df = spark.createDataFrame([(dt.datetime(2020, 1, 1, 17, 0),)], ["ts"]).select(
        S.format_iso_utc("ts").alias("v")
    )
    assert df.first().v == "2020-01-01T17:00:00Z"


def test_coalesce_timestamp(spark):
    df = spark.createDataFrame(
        [("2020-01-01", "fb"), ("", "fb"), (None, "fb")], ["p", "f"]
    ).select(S.coalesce_timestamp("p", "f").alias("v"))
    assert [r.v for r in df.collect()] == ["2020-01-01", "fb", "fb"]


@pytest.mark.parametrize(
    "number,filename,expected",
    [
        ("eLife-12345", "x/05-02-2020-RA-eLife-12345.xml", "12345"),
        ("elife-123456-x", "f.xml", "123456"),
        ("OTHER-99", "f.xml", "OTHER-99"),  # fallback to full number
        ("", "dir/stem-name.xml", "stem-name"),  # fallback to filename stem
        # stem fallback re-runs the eLife regex (ejp_manuscript_xml.py:242-250)
        ("", "x/05-02-2020-RA-eLife-12345.xml", "12345"),
        ("   ", "dir/stem-name.xml", "stem-name"),  # whitespace = missing
    ],
)
def test_extract_manuscript_id(spark, number, filename, expected):
    df = spark.createDataFrame([(number, filename)], ["n", "f"]).select(
        S.extract_manuscript_id("n", "f").alias("v")
    )
    assert df.first().v == expected


def test_version_id(spark):
    df = spark.createDataFrame(
        [("m1", "2020-01-01T00:00:00Z"), ("m2", ""), ("m3", None)], ["m", "t"]
    ).select(S.version_id("m", "t").alias("v"))
    # sentinel rendering is byte-exact with the reference f-string
    # (ejp_manuscript_xml.py:429): '' interpolates as '', None as 'None'
    assert [r.v for r in df.collect()] == [
        "m1/2020-01-01T00:00:00Z",
        "NotAcceptable m2/",
        "NotAcceptable m3/None",
    ]


def test_synthetic_person_id_and_classifier(spark):
    df = spark.createDataFrame(
        [("p9", "a.zip/b.xml", 0), ("", "a.zip/b.xml", 3), (None, "z.xml", 7)],
        ["pid", "sf", "idx"],
    ).select(S.synthetic_person_id("pid", "sf", "idx").alias("v"))
    vals = [r.v for r in df.collect()]
    assert vals == ["p9", "generated-a.zip/b.xml-3", "generated-z.xml-7"]
    df2 = spark.createDataFrame([(v,) for v in vals], ["v"]).select(
        S.is_generated_id("v").alias("g")
    )
    assert [r.g for r in df2.collect()] == [False, True, True]


def test_filename_stem_and_join(spark):
    df = spark.createDataFrame([("dir/sub/file.name.xml", "z.zip", "m.xml")], ["f", "z", "m"])
    row = df.select(
        S.filename_stem("f").alias("stem"), S.join_zip_and_xml("z", "m").alias("j")
    ).first()
    assert row.stem == "file.name"
    assert row.j == "z.zip/m.xml"


def test_split_stage_and_type(spark):
    df = spark.createDataFrame(
        [("Initial Submission: Research Article",), ("Research Article",)], ["c"]
    ).select(S.split_stage_and_type("c").alias("v"))
    rows = [r.v.asDict() for r in df.collect()]
    assert rows[0] == {"overall_stage": "Initial Submission", "manuscript_type": "Research Article"}
    assert rows[1] == {"overall_stage": "Full Submission", "manuscript_type": "Research Article"}


def test_html_unescape_both_paths(spark):
    data = [("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;",), ("&amp;lt;",), ("&copy;",)]
    df = spark.createDataFrame(data, ["c"]).select(
        S.html_unescape_basic("c").alias("fast"), S.html_unescape("c").alias("full")
    )
    rows = df.collect()
    assert rows[0].fast == rows[0].full == "a & b <c> \"d\" 'e'"
    assert rows[1].fast == "&lt;"  # single pass: &amp;lt; → &lt; (not '<')
    assert rows[1].full == "&lt;" or rows[1].full == "<"  # html.unescape → '<'? no: single pass too
    assert rows[2].full == "©"  # named entity only on the full path


def test_null_strip_semantics(spark):
    """False survives; '' , [] , null are dropped (transform_json.py:1-15)."""
    df = spark.createDataFrame(
        [(False, "", [], None, "x")],
        schema="b boolean, s string, a array<string>, n string, k string",
    )
    cleaned = df.select(
        S.to_clean_json(
            F.struct(
                F.col("b"),
                S.empty_string_to_null("s").alias("s"),
                S.empty_array_to_null("a").alias("a"),
                F.col("n"),
                F.col("k"),
            )
        ).alias("j")
    ).first()
    assert cleaned.j == '{"b":false,"k":"x"}'


def test_fuzzy_parse_timestamp(spark):
    df = spark.createDataFrame([("2020-01-01 12:00:00",), (None,)], ["c"]).select(
        S.fuzzy_parse_timestamp("c").alias("v")
    )
    vals = [r.v for r in df.collect()]
    assert vals[0] == dt.datetime(2020, 1, 1, 17, 0)
    assert vals[1] is None


def test_config_env_substitution():
    """P20: {ENV} placeholder substitution, recursive through dicts/lists
    (reference xml_config.py:115-150)."""
    from data_hub_ejp_xml_pipeline_spark.config import (
        PipelineConfig,
        substitute_env_placeholder,
    )

    raw = {
        "zipPath": "/data/{ENV}/zips",
        "warehouseRoot": "/warehouse/{ENV}",
        "dataPipelineId": "ejp-xml-{ENV}",
        "fileNameExclusionRegexPattern": "",
        "nested": {"list": ["a-{ENV}", {"deep": "{ENV}"}], "n": 7},
    }
    out = substitute_env_placeholder(raw, "staging")
    assert out["nested"]["list"] == ["a-staging", {"deep": "staging"}]
    assert out["nested"]["n"] == 7

    cfg = PipelineConfig.from_dict(raw, "prod")
    assert cfg.zip_path == "/data/prod/zips"
    assert cfg.pipeline_id == "ejp-xml-prod"
    assert cfg.exclusion_pattern is None  # '' → None
    assert cfg.table_root("person_v2") == "/warehouse/prod/person_v2"
    assert set(cfg.entity_tables) == {
        "person", "person_v2", "manuscript", "manuscript_version"
    }


def test_state_datetime_codec_round_trip(spark):
    """P10 (timestamp.py:40-51): the state-file codec renders
    '%Y-%m-%d %H:%M:%S' and parses it back (whitespace-stripped).
    Golden values computed with the reference's own strftime/strptime."""
    ref = dt.datetime(2023, 7, 4, 15, 30, 45)
    assert ref.strftime("%Y-%m-%d %H:%M:%S") == "2023-07-04 15:30:45"

    df = spark.createDataFrame([(ref,)], ["ts"])
    rendered = df.select(S.state_datetime_to_string("ts").alias("v")).first().v
    assert rendered == "2023-07-04 15:30:45"

    back = (
        spark.createDataFrame([(rendered,), ("  2023-07-04 15:30:45  ",), ("junk",)], ["s"])
        .select(S.state_string_to_datetime("s").alias("v"))
        .collect()
    )
    assert back[0].v == ref
    assert back[1].v == ref  # reference strips before strptime
    assert back[2].v is None


def test_display_format_eastern(spark):
    """timestamp.py:34-37 analog: '%d %b %y  %H:%M:%S' (double space) in
    US/Eastern. Golden values from the reference's strftime under both
    EDT (UTC-4) and EST (UTC-5)."""
    rows = [
        (dt.datetime(2023, 7, 4, 16, 0, 5),),   # summer → EDT 12:00:05
        (dt.datetime(2023, 1, 4, 16, 0, 5),),   # winter → EST 11:00:05
    ]
    out = [
        r.v
        for r in spark.createDataFrame(rows, ["ts"])
        .select(S.to_default_tz_display_format("ts").alias("v"))
        .collect()
    ]
    assert out == ["04 Jul 23  12:00:05", "04 Jan 23  11:00:05"]
