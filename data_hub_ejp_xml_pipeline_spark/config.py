"""Pipeline configuration with deployment-env placeholder substitution.

Spark-engine analog of the reference's config layer
(``dag_pipeline_config/xml_config.py:40-150``, P20 in SURVEY.md §2):
a config dict (usually parsed from YAML/JSON) carries ``{ENV}``
placeholders that are substituted recursively — dicts, lists and string
leaves — with the deployment environment name, then mapped onto the
engine's per-entity table roots.

The reference binds entities to BigQuery table names + S3 prefixes; this
engine binds them to SnapshotTable roots (or Iceberg identifiers) under a
common warehouse path — same shape, storage-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

ENTITY_TYPES = ("person", "person_v2", "manuscript", "manuscript_version")


def substitute_env_placeholder(
    value: Any, deployment_env: str, placeholder: str = "{ENV}"
) -> Any:
    """Recursively replace ``placeholder`` with ``deployment_env`` in every
    string leaf of dicts/lists (reference xml_config.py:115-150)."""
    if isinstance(value, dict):
        return {
            k: substitute_env_placeholder(v, deployment_env, placeholder)
            for k, v in value.items()
        }
    if isinstance(value, list):
        return [
            substitute_env_placeholder(v, deployment_env, placeholder)
            for v in value
        ]
    if isinstance(value, str):
        return value.replace(placeholder, deployment_env)
    return value


@dataclass
class PipelineConfig:
    """Engine pipeline config (reference eJPXmlDataConfig analog)."""

    zip_path: str
    warehouse_root: str
    pipeline_id: str = "ejp-xml"
    exclusion_pattern: str | None = None
    checkpoint_root: str | None = None
    entity_tables: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dict(
        cls,
        raw: dict[str, Any],
        deployment_env: str,
        placeholder: str = "{ENV}",
    ) -> "PipelineConfig":
        cfg = substitute_env_placeholder(raw, deployment_env, placeholder)
        warehouse = cfg["warehouseRoot"]
        tables = {
            entity: cfg.get("entityTables", {}).get(entity, f"{warehouse}/{entity}")
            for entity in ENTITY_TYPES
        }
        return cls(
            zip_path=cfg["zipPath"],
            warehouse_root=warehouse,
            pipeline_id=cfg.get("dataPipelineId", "ejp-xml"),
            exclusion_pattern=cfg.get("fileNameExclusionRegexPattern") or None,
            checkpoint_root=cfg.get("checkpointRoot"),
            entity_tables=tables,
        )

    def table_root(self, entity_type: str) -> str:
        # plain-constructor configs have no entity_tables map: fall back to
        # the same warehouse layout from_dict defaults to
        return self.entity_tables.get(
            entity_type, f"{self.warehouse_root}/{entity_type}"
        )
