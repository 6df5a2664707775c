"""Zip-of-XML changelog source: binaryFile scan + vectorized parse.

Spark-first re-expression of the reference's extract stage
(``ejp_xml_pipeline/etl.py:71-102`` + ``transform_zip_xml/ejp_zip.py:31-74``):

* the S3 object scan (S5) becomes ``spark.read.format('binaryFile')`` —
  distributed, with Spark's listing doing the incremental watermark when
  used through ``readStream``;
* the per-file generator pipeline becomes ``mapInPandas`` — one Python
  call per Arrow batch of files, each yielding its entity rows;
* the manifest (``go.xml``: create date + member list) drives which
  members are parsed, the exclusion regex (S6) filters members, malformed
  XML lands in a **quarantine branch** instead of failing the job (S7:
  the reference re-reads to report the offending line,
  ``utils/xml_transform_util/xml.py:8-22``);
* provenance (P18): every row carries ``zip_file/xml_file`` +
  ``node_index`` (``ejp_zip.py:66-69``, ``ejp_person_xml.py:166-169``).

The output is a generic entity-event DataFrame ready for the CDC
pipeline: ``doc_id`` (synthetic when absent, P14), ``modified_timestamp``
(fallback chain, P19), a null-stripped JSON payload (P17), and a
deterministic ``lsn`` built WITHOUT a global sort (file-mtime-major,
node-minor) so replay regenerates identical keys and order.

The parser is written from scratch against observed behavior; reference
citations are for semantics parity only.
"""

from __future__ import annotations

import io
import json
import re
import zipfile
import xml.etree.ElementTree as ET
from datetime import timezone as _dt_timezone
from typing import Any, Iterator

_UTC = _dt_timezone.utc

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.functions.json_clean import remove_empty_keys
from data_hub_ejp_xml_pipeline_spark.sources.xml_entities import (
    child_text,
    format_iso,
    node_text,
    parse_manuscript_document,
    parse_persons_document,
    parse_xml_recovering,
)

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("zip_file", T.StringType()),
        T.StructField("xml_file", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("modified_timestamp", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("node_index", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField("file_mtime_ms", T.LongType()),
    ]
)

MANIFEST_NAME = "go.xml"


# ----------------------------------------------------------------- parsing


def _read_manifest(manifest_root: ET.Element) -> tuple[str | None, list[str]]:
    """Reference go.xml format (ejp_zip.py:31-38): ``create_date``
    ATTRIBUTE on the root + ``file_nm`` member elements. The engine's
    round-1 fixture format (``create-date``/``file-nm`` children) is kept
    readable for back-compat."""
    create_date = manifest_root.attrib.get("create_date") or child_text(
        manifest_root, "create-date"
    )
    listed = [
        node_text(node).strip() for node in manifest_root.iter("file_nm")
    ] or [node_text(node).strip() for node in manifest_root.iter("file-nm")]
    return create_date, [n for n in listed if n]


def parse_zip_bytes(
    content: bytes,
    zip_name: str,
    exclusion_pattern: str | None = None,
    default_modified_iso: str | None = None,
) -> Iterator[dict[str, Any]]:
    """One zip → entity/quarantine row dicts (manifest-driven member scan).

    ``default_modified_iso`` is the fallback document timestamp when the
    zip has no manifest create_date (the Spark layer passes the zip file's
    modificationTime); the reference hard-requires go.xml
    (ejp_zip.py:57-58) — this engine quarantines per member instead of
    failing the whole batch.
    """
    excl = re.compile(exclusion_pattern) if exclusion_pattern else None
    try:
        zf = zipfile.ZipFile(io.BytesIO(content))
    except zipfile.BadZipFile as exc:
        yield {
            "zip_file": zip_name, "xml_file": None, "entity_type": "error",
            "doc_id": None, "modified_timestamp": None, "payload": None,
            "node_index": None, "error": f"bad zip: {exc}",
        }
        return
    names = set(zf.namelist())
    modified_timestamp_str = default_modified_iso or ""
    members: list[str] = sorted(n for n in names if n != MANIFEST_NAME)
    if MANIFEST_NAME in names:
        manifest_root, err = parse_xml_recovering(zf.read(MANIFEST_NAME))
        if manifest_root is None:
            yield {
                "zip_file": zip_name, "xml_file": MANIFEST_NAME,
                "entity_type": "error", "doc_id": None,
                "modified_timestamp": None, "payload": None,
                "node_index": None, "error": f"manifest parse: {err}",
            }
        else:
            create_date, listed = _read_manifest(manifest_root)
            if create_date:
                try:
                    modified_timestamp_str = format_iso(create_date)
                except (ValueError, OverflowError, TypeError) as exc:
                    # a parseable go.xml with an unparseable create_date
                    # must not fail the whole mapInPandas batch — same
                    # per-member quarantine contract as a manifest parse
                    # error; members still load with the default timestamp
                    yield {
                        "zip_file": zip_name, "xml_file": MANIFEST_NAME,
                        "entity_type": "error", "doc_id": None,
                        "modified_timestamp": None, "payload": None,
                        "node_index": None,
                        "error": f"manifest create_date: {exc}",
                    }
            if listed:
                members = [n for n in listed if n in names]
    for member in members:
        if excl is not None and excl.match(member):
            continue
        zip_xml = f"{zip_name}/{member}"
        data = zf.read(member)
        root, err = parse_xml_recovering(data)
        if root is None:
            # quarantine branch — the error carries the offending source
            # line (parity with xml.py:8-22); the malformed head is
            # preserved for replay/debugging
            yield {
                "zip_file": zip_name, "xml_file": member, "entity_type": "error",
                "doc_id": None, "modified_timestamp": None,
                "payload": data[:2048].decode("utf-8", "replace"),
                "node_index": None, "error": err,
            }
            continue
        if root.tag == "persons":
            rows: Iterator[dict[str, Any]] = parse_persons_document(
                root, modified_timestamp_str, zip_xml
            )
        elif root.tag == "xml":
            rows = parse_manuscript_document(root, modified_timestamp_str, zip_xml)
        else:
            yield {
                "zip_file": zip_name, "xml_file": member, "entity_type": "error",
                "doc_id": None, "modified_timestamp": None, "payload": None,
                "node_index": None, "error": f"unknown root tag: {root.tag}",
            }
            continue
        try:
            # materialize the WHOLE document before yielding anything:
            # the reference's ParseDocumentError is all-or-nothing
            # (ejp_xml.py:24-42) — yielding lazily would half-ingest a
            # document whose later entity then fails and quarantines
            doc_rows = [
                {
                    "zip_file": zip_name,
                    "xml_file": member,
                    "entity_type": row["entity_type"],
                    "doc_id": row["doc_id"],
                    "modified_timestamp": row["modified_timestamp"] or None,
                    "payload": json.dumps(
                        remove_empty_keys(row["payload"]),
                        sort_keys=True,
                        ensure_ascii=False,
                    ),
                    "node_index": row["node_index"],
                    "error": None,
                }
                for row in rows
            ]
        except Exception as exc:  # noqa: BLE001 — ParseDocumentError analog
            # transform failure becomes ONE quarantine row (with
            # provenance) so a bad document cannot fail the distributed
            # batch — and contributes no partial entities
            yield {
                "zip_file": zip_name, "xml_file": member, "entity_type": "error",
                "doc_id": None, "modified_timestamp": None, "payload": None,
                "node_index": None, "error": f"transform: {exc}",
            }
            continue
        yield from doc_rows


# ------------------------------------------------------------- Spark layer


def read_zip_entities(
    spark: SparkSession,
    path: str,
    exclusion_pattern: str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """binaryFile scan → mapInPandas parse → entity/quarantine DataFrame."""
    reader = spark.readStream if streaming else spark.read
    if streaming:
        # streaming sources require an explicit schema; binaryFile's is fixed
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    files = reader.format("binaryFile").option("pathGlobFilter", "*.zip").load(path)

    def parse_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict[str, Any]] = []
            for _, row in pdf.iterrows():
                zip_name = row["path"].rsplit("/", 1)[-1]
                mtime = row["modificationTime"]
                mtime_ms = int(mtime.timestamp() * 1000)
                # file mtimes are UTC instants (session tz is UTC); do NOT
                # route through format_iso, which treats naive as US/Eastern
                mdt = mtime.to_pydatetime()
                if mdt.tzinfo is None:
                    mdt = mdt.replace(tzinfo=_UTC)
                mtime_iso = mdt.astimezone(_UTC).isoformat().replace("+00:00", "Z")
                for rec in parse_zip_bytes(
                    bytes(row["content"]), zip_name, exclusion_pattern,
                    default_modified_iso=mtime_iso,
                ):
                    rec["file_mtime_ms"] = mtime_ms
                    out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in ENTITY_SCHEMA.fields]
            ) if out else pd.DataFrame(columns=[f.name for f in ENTITY_SCHEMA.fields])

    return files.mapInPandas(parse_batch, schema=ENTITY_SCHEMA)


def entities_to_changelog(entities: DataFrame) -> DataFrame:
    """Entity rows → CDC changelog shape with a deterministic ``lsn`` built
    without a global sort: file-mtime-major, path-hash-mid, node-minor.
    Replaying the same files regenerates identical LSNs (the reference's
    LastModified total order, ``dags/s3_xml_import_pipeline.py:213-221``)."""
    ok = entities.filter(F.col("error").isNull())
    lsn = (
        F.col("file_mtime_ms") * F.lit(1 << 22)
        + F.pmod(F.xxhash64("zip_file", "xml_file"), F.lit(1 << 12)) * F.lit(1 << 10)
        + F.pmod(F.col("node_index").cast("long"), F.lit(1 << 10))
    )
    return ok.select(
        lsn.alias("lsn"),
        F.lit("U").alias("op"),
        F.concat_ws(":", "entity_type", "doc_id").alias("doc_id"),
        F.col("payload"),
        F.col("modified_timestamp"),
        F.col("entity_type").alias("source"),
        F.concat_ws("/", "zip_file", "xml_file").alias("source_file"),
        F.col("node_index").cast("long").alias("offset"),
    )


def quarantine(entities: DataFrame) -> DataFrame:
    """The dead-letter branch: malformed zips/members/XML."""
    return entities.filter(F.col("error").isNotNull())
