"""Structured Streaming changelog tailer (SURVEY.md §7 M4)."""

from data_hub_ejp_xml_pipeline_spark.streaming.tailer import ChangelogTailer  # noqa: F401
