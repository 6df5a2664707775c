"""Streaming dedup-on-ingest: duplicates across microbatches are dropped
within the watermark horizon; state stays bounded (the plain
dropDuplicates-on-stream anti-pattern keeps every key forever)."""

from __future__ import annotations

import json


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from data_hub_ejp_xml_pipeline_spark.streaming.dedup import (
        dedup_within_watermark,
    )

    src = tmp_path / "docs"
    src.mkdir()

    import os
    import time

    base = time.time() - 100

    def write_batch(name: str, rows: list[dict], order: int = 0) -> None:
        p = src / f"{name}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        # explicit distinct mtimes: the file source orders by modification
        # time, and back-to-back writes can tie on coarse-mtime filesystems
        os.utime(p, (base + order, base + order))

    # batch 1: d1, d2; batch 2 (arrives later): d2 duplicate + d3
    write_batch("b1", order=0, rows=[
        {"doc_id": "d1", "fp": "aaa", "ts": "2024-01-01T00:00:00"},
        {"doc_id": "d2", "fp": "bbb", "ts": "2024-01-01T00:01:00"},
    ])
    write_batch("b2", order=10, rows=[
        {"doc_id": "d2-dup", "fp": "bbb", "ts": "2024-01-01T00:02:00"},
        {"doc_id": "d3", "fp": "ccc", "ts": "2024-01-01T00:03:00"},
    ])

    stream = (
        spark.readStream.schema("doc_id string, fp string, ts string")
        .option("maxFilesPerTrigger", "1")  # one file per microbatch
        .json(str(src))
        .selectExpr("doc_id", "fp", "cast(ts as timestamp) as ts")
    )
    deduped = dedup_within_watermark(stream, keys=["fp"], event_time_col="ts",
                                     delay="1 hour")
    seen: list = []
    q = (
        deduped.writeStream.foreachBatch(
            lambda df, bid: seen.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    fps = sorted(r.fp for r in seen)
    assert fps == ["aaa", "bbb", "ccc"], fps  # the cross-batch dup dropped
    kept_ids = {r.doc_id for r in seen}
    assert "d2" in kept_ids and "d2-dup" not in kept_ids  # first wins

