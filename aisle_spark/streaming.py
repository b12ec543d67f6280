"""Structured Streaming ingestion for the engine: a micro-batch sink that
encodes each batch with the narrow inline path and commits its block files
into an encoded table directory with exactly-once semantics.

Shape:  readStream (any source) -> encode_stream(...) -> encoded table
        readable by read_encoded()/scan() WHILE the stream keeps appending.

Exactly-once protocol (the streaming face of the batch direct-write
commit): every micro-batch writes its blocks under a batch-keyed staging
directory, promotes them into the table root under batch-keyed file names,
and rewrites the committed-file manifest (``_aisle_files.json``) via
tmp+atomic-rename. A replayed batch (failure before the manifest rename)
overwrites the SAME file names and manifest entry, so duplicates are
impossible — the same idempotency argument as the resumable batch encode
(checkpoint.py), keyed by Spark's monotonically increasing batchId.

This mirrors the reference's "streaming extensibility" surface
(SURVEY.md §2.9) re-expressed on Spark's own streaming engine: watermarks,
triggers and source offsets all come from Structured Streaming; the engine
contributes only the per-batch vectorized encode + the commit protocol.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from aisle_spark.pipeline import (
    DEFAULT_BLOCK_ROWS,
    DEFAULT_MAX_VALUES,
    _write_schema_sidecar,
    arrow_schema_of,
    encode_table_inline,
)


def _manifest_path(out_path: str) -> str:
    return os.path.join(out_path, "_aisle_files.json")


def _read_manifest(out_path: str) -> dict:
    p = _manifest_path(out_path)
    if not os.path.exists(p):
        return {"files": [], "batches": {}}
    from aisle_spark.pipeline import load_manifest

    m = load_manifest(None, out_path)  # resolves the pointer form
    m.setdefault("batches", {})
    return m


def _commit_batch(out_path: str, batch_id: int, files: list[str]) -> None:
    """Atomically record this batch's files; replays replace, never add.
    Each commit also records the files' [min,max] bounds so streamed
    tables participate in the manifest-list pruning tier
    (datasource.file_keep) like batch-written ones."""
    from aisle_spark.pipeline import manifest_lock

    with manifest_lock(None, out_path):
        _commit_batch_locked(out_path, batch_id, files)


def _commit_batch_locked(out_path: str, batch_id: int, files: list[str]) -> None:
    m = _read_manifest(out_path)
    replaced = set(m["batches"].get(str(batch_id), []))
    m["batches"][str(batch_id)] = files
    # files = non-batch files (compaction retires the batches map but its
    # output files must survive subsequent batch commits — ADVICE r3 high)
    # ∪ every live batch's files; a replayed batch replaces, never adds
    batch_files = {f for fs in m["batches"].values() for f in fs}
    m["files"] = sorted(
        (set(m.get("files", [])) - replaced) | set(files) | batch_files
    )
    stats = {
        k: v
        for k, v in m.get("file_stats", {}).items()
        if k in set(m["files"]) - replaced
    }
    if files:
        from aisle_spark.maintenance import _recompute_file_stats

        stats.update(_recompute_file_stats(None, out_path.rstrip("/"), files))
    m["file_stats"] = stats
    # a compaction commit leaves "compacted_from" in the current
    # manifest; republishing it here would tag THIS batch's snapshot as
    # a compaction commit too, and stream readers skip those
    # (_additions returns []) — every post-OPTIMIZE batch would be
    # silently invisible downstream
    m.pop("compacted_from", None)
    from aisle_spark.pipeline import publish_manifest

    publish_manifest(None, out_path, m)


def encode_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    parts: int = 64,
    salt_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    max_values: int = DEFAULT_MAX_VALUES,
    query_name: str = "aisle_encode_stream",
):
    """Attach the encoder to a streaming DataFrame; returns the started
    StreamingQuery. The caller controls triggers/await on the handle."""
    os.makedirs(out_path, exist_ok=True)
    schema = arrow_schema_of(stream_df)
    _write_schema_sidecar(out_path, schema)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import glob
        import shutil

        blocks = encode_table_inline(
            batch_df,
            parts=parts,
            salt_cols=salt_cols,
            sort_cols=sort_cols,
            block_rows=block_rows,
            max_values=max_values,
            redistribute=False,  # micro-batches are small; no reshuffle
        )
        staging = os.path.join(out_path, f".staging-batch-{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        blocks.write.mode("overwrite").option("compression", "none").parquet(staging)
        names = []
        for k, src in enumerate(
            sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
        ):
            name = f"stream-b{batch_id:08d}-{k:04d}.parquet"
            os.replace(src, os.path.join(out_path, name))  # replay-safe
            names.append(name)
        shutil.rmtree(staging, ignore_errors=True)
        _commit_batch(out_path, batch_id, names)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
