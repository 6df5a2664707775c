"""Engine operators: LWW reduction, MERGE upsert, dedup, similarity, text."""
