"""Logical pipeline composition (batch facade over the engine)."""

from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline  # noqa: F401
