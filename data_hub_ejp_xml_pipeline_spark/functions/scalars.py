"""Column-expression re-implementations of the reference's per-record
transforms (SURVEY.md §2.2). Every function returns a pyspark Column built
from JVM-side builtins (whole-stage-codegen'd); the two genuinely
Python-bound ones (full HTML entity decode, fuzzy timestamp parse) are
vectorized pandas UDFs.

Reference citations per function are in the docstrings (file:line into
/root/reference)."""

from __future__ import annotations

import html as _html

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------- booleans


def to_bool(c: Column | str) -> Column:
    """'true'/'false' → bool, else null (ejp_manuscript_xml.py:59-64, P4)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(c == "true", F.lit(True)).when(c == "false", F.lit(False))


def parse_yes_no(c: Column | str) -> Column:
    """case-insensitive 'yes'/'no' → bool, else null
    (ejp_manuscript_xml.py:336-343, P5)."""
    c = F.col(c) if isinstance(c, str) else c
    low = F.lower(c)
    return F.when(low == "yes", F.lit(True)).when(low == "no", F.lit(False))


def flag_active(c: Column | str) -> Column:
    """active_ind == '1' (ejp_person_xml.py:43,66,84, P7)."""
    c = F.col(c) if isinstance(c, str) else c
    return c == F.lit("1")


# ---------------------------------------------------------------- numerics


def to_int(c: Column | str) -> Column:
    """empty string → null, else int (ejp_manuscript_xml.py:67-68, P6).
    try_cast keeps malformed values null instead of failing under ANSI."""
    c = F.col(c) if isinstance(c, str) else c
    return F.nullif(c, F.lit("")).try_cast("int")


# -------------------------------------------------------------- timestamps

_ISO_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def parse_timestamp_utc(c: Column | str, naive_tz: str = "US/Eastern") -> Column:
    """Parse a timestamp string; tz-naive inputs are localized ``naive_tz``
    then converted to UTC (utils/xml_transform_util/timestamp.py:8-17, P8).

    tz-presence is detected structurally (trailing Z or ±hh[:]mm offset);
    fixed formats stay JVM-side. Fuzzy formats → fuzzy_parse_timestamp."""
    c = F.col(c) if isinstance(c, str) else c
    # offsets may be hh, hhmm or hh:mm (ISO-8601 allows all three)
    has_tz = c.rlike(r"(Z|[+-]\d{2}(:?\d{2})?)$")
    aware = F.try_to_timestamp(c)  # session tz = UTC → absolute instant
    naive = F.to_utc_timestamp(F.try_to_timestamp(c), naive_tz)
    return F.when(has_tz, aware).otherwise(naive)


def format_iso_utc(c: Column | str) -> Column:
    """Render ISO-8601 with 'Z' (timestamp.py:28-31, P9): the reference's
    ``isoformat()`` prints microseconds IFF they are non-zero, and these
    strings feed version-id keys — render identically."""
    c = F.col(c) if isinstance(c, str) else c
    base = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.date_format(c, "SSSSSS")
    rendered = F.when(frac == "000000", base).otherwise(
        F.concat(base, F.lit("."), frac)
    )
    tz = F.date_format(c, "XXX")
    return F.concat(rendered, F.regexp_replace(tz, r"^\+00:00$", "Z"))


def coalesce_timestamp(primary: Column | str, fallback: Column | str) -> Column:
    """profile-modify-date or file modified ts (ejp_manuscript_xml.py:151-155;
    ejp_person_xml.py:171-176, P19); empty string counts as missing."""
    p = F.col(primary) if isinstance(primary, str) else primary
    fb = F.col(fallback) if isinstance(fallback, str) else fallback
    return F.coalesce(F.nullif(p, F.lit("")), fb)


@F.pandas_udf(T.TimestampType())
def fuzzy_parse_timestamp(s: pd.Series) -> pd.Series:
    """dateutil fuzzy parse for non-fixed formats (timestamp.py:8-17) —
    the reference's EXACT library, applied per element so a batch mixing
    tz-aware and tz-naive values (or mixed offsets across DST) cannot
    poison the whole column the way a vectorized pd.to_datetime does
    (object-dtype result → .dt raises → task dies). Arrow-batched; the
    slow path by design — fixed formats stay in parse_timestamp_utc."""
    import datetime as _dt

    import dateutil.parser
    import pytz

    eastern = pytz.timezone("US/Eastern")

    def one(x):
        if x is None:
            return None
        try:
            dt = dateutil.parser.parse(str(x))
        except (ValueError, OverflowError):
            return None
        if dt.tzinfo is None:
            try:
                dt = eastern.localize(dt)
            except Exception:  # noqa: BLE001 — nonexistent/ambiguous wall time
                return None
        return dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)

    return s.map(one)


STATE_DT_FMT = "yyyy-MM-dd HH:mm:ss"


def state_datetime_to_string(c: Column | str) -> Column:
    """Render a timestamp in the reference's STATE-FILE codec format
    ``%Y-%m-%d %H:%M:%S`` (timestamp.py:40-41, P10) — the format its
    watermark state file stores. The engine's watermark state is the
    Spark checkpoint (binary, Spark-native); this codec exists for
    interop surfaces that exchange the reference's textual form
    (diagnostics, migration of an existing state file)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c, STATE_DT_FMT)


def state_string_to_datetime(c: Column | str) -> Column:
    """Parse the state-file codec back (timestamp.py:44-51, P10):
    whitespace is stripped before parsing, exactly as the reference's
    ``datetime_as_string.strip()``. The reference attaches the LOCAL
    zone on parse (``tz.tzlocal()``); the engine runs sessions in UTC,
    where that is the identity — documented divergence for non-UTC
    deployments (the engine never round-trips state through local time)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.try_to_timestamp(F.trim(c), F.lit(STATE_DT_FMT))


def to_default_tz_display_format(c: Column | str, tz: str = "US/Eastern") -> Column:
    """Operator-facing display render ``%d %b %y  %H:%M:%S`` in the
    reference's default zone (timestamp.py:34-37; display-only, feeds no
    keys). Note the DOUBLE space — reproduced byte-for-byte."""
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(F.from_utc_timestamp(c, tz), "dd MMM yy  HH:mm:ss")


# ------------------------------------------------------------------- keys

MANUSCRIPT_NO_PATTERN = r".*e[Ll]ife.*-(\d{5,6})"


def extract_manuscript_id(number: Column | str, filename: Column | str) -> Column:
    """Regex key extract with fallback chain (ejp_manuscript_xml.py:56,71-89,
    232-250, P11): eLife-number regex → raw number → filename STEM
    RE-EXTRACTED through the same regex → raw stem. Whitespace-only numbers
    count as missing (the reference strips before testing)."""
    num = F.col(number) if isinstance(number, str) else number
    fn = F.col(filename) if isinstance(filename, str) else filename
    num_t = F.nullif(F.trim(num), F.lit(""))
    rex = F.nullif(
        F.regexp_extract(F.coalesce(num_t, F.lit("")), MANUSCRIPT_NO_PATTERN, 1),
        F.lit(""),
    )
    stem = filename_stem(fn)
    stem_rex = F.nullif(F.regexp_extract(stem, MANUSCRIPT_NO_PATTERN, 1), F.lit(""))
    return F.coalesce(rex, num_t, stem_rex, stem)


def version_id(manuscript_id: Column | str, created_ts: Column | str) -> Column:
    """``{id}/{created}`` with the reference's EXACT sentinel rendering for
    a missing created timestamp (ejp_manuscript_xml.py:425-431, P13):
    ``'NotAcceptable {id}/None'`` for NULL, ``'NotAcceptable {id}/'`` for
    '' — the reference f-string interpolates the falsy value as-is, and
    these strings ARE the doc keys, so rendering must match byte-for-byte
    (cf. sources/xml_entities.py derive_version_id)."""
    mid = F.col(manuscript_id) if isinstance(manuscript_id, str) else manuscript_id
    ts = F.col(created_ts) if isinstance(created_ts, str) else created_ts
    return (
        F.when(ts.isNull(), F.concat(F.lit("NotAcceptable "), mid, F.lit("/None")))
        .when(ts == "", F.concat(F.lit("NotAcceptable "), mid, F.lit("/")))
        .otherwise(F.concat_ws("/", mid, ts))
    )


GENERATED_PREFIX = "generated-"


def synthetic_person_id(pid: Column | str, source_file: Column | str, idx: Column | str) -> Column:
    """Deterministic synthetic key when person-id blank
    (ejp_person_xml.py:142-164, P14). Replay regenerates identical keys."""
    p = F.col(pid) if isinstance(pid, str) else pid
    sf = F.col(source_file) if isinstance(source_file, str) else source_file
    i = F.col(idx) if isinstance(idx, str) else idx
    return F.coalesce(
        F.nullif(p, F.lit("")),
        F.concat(F.lit(GENERATED_PREFIX), sf, F.lit("-"), i.cast("string")),
    )


def is_generated_id(c: Column | str) -> Column:
    """classifier (ejp_person_xml.py:146-151)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.startswith(c, F.lit(GENERATED_PREFIX))


# ------------------------------------------------------------------ paths


def filename_stem(c: Column | str) -> Column:
    """basename without extension (ejp_manuscript_xml.py:88-89, P15)."""
    c = F.col(c) if isinstance(c, str) else c
    base = F.element_at(F.split(c, "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


def join_zip_and_xml(zip_name: Column | str, member: Column | str) -> Column:
    """'zip/xml' provenance path (ejp_zip.py:48-49, P16)."""
    z = F.col(zip_name) if isinstance(zip_name, str) else zip_name
    m = F.col(member) if isinstance(member, str) else member
    return F.concat_ws("/", z, m)


# ---------------------------------------------------------------- strings

_STAGE_PREFIX = "Initial Submission:"


def split_stage_and_type(c: Column | str) -> Column:
    """strip 'Initial Submission:' prefix → struct(overall_stage,
    manuscript_type) (ejp_manuscript_xml.py:31,219-229, P12)."""
    c = F.col(c) if isinstance(c, str) else c
    stripped = F.trim(F.substring(c, len(_STAGE_PREFIX) + 1, 1 << 20))
    return F.when(
        c.startswith(_STAGE_PREFIX),
        F.struct(
            F.lit("Initial Submission").alias("overall_stage"),
            stripped.alias("manuscript_type"),
        ),
    ).otherwise(
        F.struct(F.lit("Full Submission").alias("overall_stage"), c.alias("manuscript_type"))
    )


# The 5 entities covering ~all real-world XML text (fast JVM path);
# anything beyond falls back to the pandas UDF.
_COMMON_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]


def html_unescape_basic(c: Column | str) -> Column:
    """JVM-side decode of the common entities (xml.py:25-26, P3 fast path).
    &amp; must be decoded LAST so '&amp;lt;' → '&lt;' (single pass)."""
    c = F.col(c) if isinstance(c, str) else c
    for ent, ch in [e for e in _COMMON_ENTITIES if e[0] != "&amp;"] + [("&amp;", "&")]:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


@F.pandas_udf(T.StringType())
def html_unescape(s: pd.Series) -> pd.Series:
    """Full entity decode (named + numeric), vectorized (P3 slow path)."""
    return s.map(lambda x: _html.unescape(x) if x is not None else None)


# ------------------------------------------------- null-strip serialization


def to_clean_json(struct_col: Column) -> Column:
    """Serialize a struct dropping null fields (False kept — booleans are
    only null when absent). Callers pre-normalize '' / [] with
    empty_to_null_* helpers below."""
    return F.to_json(struct_col, {"ignoreNullFields": "true"})


def empty_string_to_null(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.nullif(c, F.lit(""))


def empty_array_to_null(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.when(F.size(c) > 0, c)
