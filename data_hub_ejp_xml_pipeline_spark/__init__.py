"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the semantics of
``elifesciences/data-hub-ejp-xml-pipeline`` (reference at /root/reference,
surveyed in SURVEY.md): an ordered changelog of full-row-image change events
keyed by ``doc_id`` with a monotonic ``lsn``, deduplicated per-key by
max-LSN (last-writer-wins), MERGE-upserted into an Iceberg-style snapshot
table of pre-tokenized training sequences, with exactly-once epoch commits,
add-only recursive schema evolution, hot-key salting, and per-partition
lineage + metrics.

Everything is the DataFrame API + vectorized pandas/Arrow UDFs — no
per-row Python in any hot path.
"""

__version__ = "0.1.0"

from data_hub_ejp_xml_pipeline_spark.session import get_spark  # noqa: F401
