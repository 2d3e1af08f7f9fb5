"""The flagship extraction job (SURVEY.md §3.2):

read -> resume-filter -> keys/salt -> extractor actor pool -> ONE salted
(part, bucket, salt) shuffle restoring stable turn ordering + dedup ->
partitioned parquet + per-part lineage commit.

Never calls ray.init()/ray.shutdown(): session ownership stays with the
caller (driver contract, bench.py, tests).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Union

import pyarrow as pa
import pyarrow.dataset as pads

import ray
import ray.data

from bank_statement_pdf_parser_ray import EXTRACTOR_VERSION
from bank_statement_pdf_parser_ray.core.hashing import row_hash_batch
from bank_statement_pdf_parser_ray.stages.extract import ExtractorActor
from bank_statement_pdf_parser_ray.stages.keys import (
    DEFAULT_N_PARTS,
    DEFAULT_SALT_CHUNK,
    add_keys,
)
from bank_statement_pdf_parser_ray.stages.order import restore_order
from bank_statement_pdf_parser_ray.state.manifest import Manifest, PartMeta, promote_part

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_CHECKSUM_MOD = 1 << 63


def _default_concurrency() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    # leave headroom for read/write/shuffle tasks so the pool doesn't
    # starve the rest of the streaming pipeline (ray_guide: actor pools)
    return max(1, cpus - 2)


def _open_transcript_source(source: str) -> tuple["ray.data.Dataset", int | None]:
    """Open a parquet transcript source with one driver-side footer
    probe (metadata only, threaded): if every fragment already carries
    the 6 canonical columns at canonical types, take the fast path — a
    single pruned ``read_parquet`` with the row count summed from
    footers. Otherwise fall back to the schema-evolution reader
    (``_read_parquet_evolved``: per-footer-group pruned reads +
    per-batch normalization), so a shard directory written by evolving
    producers streams through the same pipeline instead of dying at the
    first narrow footer."""
    import pyarrow.parquet as pq

    from bank_statement_pdf_parser_ray.schema import INPUT_SCHEMA
    from bank_statement_pdf_parser_ray.sources.transcripts import _read_parquet_evolved

    try:
        files = pads.dataset(source, format="parquet").files
        from concurrent.futures import ThreadPoolExecutor

        # read_metadata holds no file handle open after returning —
        # a ParquetFile per fragment would pin one fd each until GC,
        # an fd-exhaustion risk on exactly the many-shard directories
        # this probe exists for (ADVICE round 2)
        def _probe(f: str) -> tuple[int, "pa.Schema"]:
            md = pq.read_metadata(f)
            return md.num_rows, md.schema.to_arrow_schema()

        with ThreadPoolExecutor(max_workers=min(32, max(1, len(files)))) as pool:
            metas = list(pool.map(_probe, files))
        input_rows = sum(n for n, _ in metas)
        canonical = all(
            all(
                c in sch.names and sch.field(c).type == INPUT_SCHEMA.field(c).type
                for c in INPUT_COLUMNS
            )
            for _, sch in metas
        )
    except Exception:
        return ray.data.read_parquet(source, columns=INPUT_COLUMNS), None
    if canonical:
        return ray.data.read_parquet(source, columns=INPUT_COLUMNS), input_rows
    return _read_parquet_evolved(source), input_rows


def _add_row_hash(batch: pa.Table) -> pa.Table:
    h = row_hash_batch(
        batch.column("conv_id"),
        batch.column("turn_idx"),
        batch.column("extracted_text"),
    )
    return batch.append_column("row_h", h)


def _drop_committed(batch: pa.Table, committed: frozenset[int]) -> pa.Table:
    if not committed:
        return batch
    import pyarrow.compute as pc

    mask = pc.invert(pc.is_in(batch.column("part"), value_set=pa.array(list(committed), type=pa.int32())))
    return batch.filter(mask)


def build_extracted(
    source: Union[str, "ray.data.Dataset"],
    *,
    n_parts: int = DEFAULT_N_PARTS,
    salt_chunk: int = DEFAULT_SALT_CHUNK,
    committed: frozenset[int] = frozenset(),
    concurrency: int | None = None,
    batch_size: int = 1024,
    shuffle_block_rows: int | None = 32_768,
) -> "ray.data.Dataset":
    """Lazy Dataset of ordered, deduped extraction results (part/row_h
    columns included for the sink).

    ``shuffle_block_rows``: the extraction stage wants MANY small tasks
    (actor-pool balance: hundreds of tasks across ~30 actors), but the
    sort exchange cost grows with map_blocks x reduce_partitions (the
    shuffle-object count: measured 93k objects = 117 s vs 4k objects =
    43 s on the 2M-turn corpus, BASELINE.md §3). A streaming
    ``repartition(target_num_rows_per_block=...)`` between the two
    coalesces extractor output into fat blocks (~32k rows ≈ 35 MB)
    WITHOUT an extra all-to-all, decoupling pool balance from exchange
    fan-in. None disables the coalesce."""
    input_rows: int | None = None
    if isinstance(source, str):
        ds, input_rows = _open_transcript_source(source)
    else:
        ds = source.select_columns(INPUT_COLUMNS)
    ds = ds.map_batches(
        partial(add_keys, n_parts=n_parts, salt_chunk=salt_chunk),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if committed:
        ds = ds.map_batches(
            partial(_drop_committed, committed=committed),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # Pool floor by job size (interleaved A/B on the 2M-turn corpus at
    # 32 CPUs: full floor 38.7/40.9/40.2 s vs autoscaled-from-8
    # 43.2/55.9/46.0 s — the autoscaler ramp starves compute-dominated
    # jobs even with upscaling_threshold=1.0 — while a 150k-turn job is
    # ~1 s FASTER with the small floor, which skips ~22 useless actor
    # spin-ups). Input size is known for parquet sources from footer
    # metadata; unknown sizes get the safe small floor.
    max_actors = concurrency or _default_concurrency()
    big_job = input_rows is not None and input_rows >= 500_000
    floor = max_actors if big_job else min(8, max_actors)
    ds = ds.map_batches(
        ExtractorActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(floor, max_actors),
        num_cpus=1,
    )
    if shuffle_block_rows:
        # streaming coalesce: an identity map whose batch_size makes the
        # executor BUNDLE several small extractor-output blocks into one
        # task (and thus one fat output block). repartition(
        # target_num_rows_per_block=...) can't do this — it only splits
        # oversized blocks, never merges small ones.
        ds = ds.map_batches(
            lambda t: t,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=shuffle_block_rows,
        )
    ds = restore_order(ds)
    return ds.map_batches(_add_row_hash, batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
def _commit_part(staging_root: str, out_dir: str, manifest_dir: str, part: int, meta_base: dict) -> int:
    """Promote one staged part and commit its lineage entry (S5).
    Runs as a Ray task so commits parallelize across parts."""
    final_dir = promote_part(staging_root, out_dir, part)
    t = pads.dataset(final_dir, format="parquet").to_table(columns=["row_h"])
    checksum = 0
    for chunk in t.column("row_h").chunks:
        s = chunk.to_numpy(zero_copy_only=False)
        checksum = (checksum + int(s.sum() % _CHECKSUM_MOD)) % _CHECKSUM_MOD
    Manifest(manifest_dir).commit(
        PartMeta(part=part, rows=t.num_rows, checksum=checksum, **meta_base)
    )
    return t.num_rows


def run_flagship(
    source: Union[str, "ray.data.Dataset"],
    out_dir: str | None = None,
    *,
    manifest_dir: str | None = None,
    n_parts: int = DEFAULT_N_PARTS,
    salt_chunk: int = DEFAULT_SALT_CHUNK,
    concurrency: int | None = None,
    batch_size: int = 1024,
    shuffle_block_rows: int | None = 32_768,
    only_parts: frozenset[int] | None = None,
):
    """Run the flagship job.

    - ``out_dir`` None: return the lazy result Dataset (tests, entry()).
    - ``out_dir`` set: resumable partitioned write; returns a summary dict
      {parts_written, parts_skipped, rows_written}.
    - ``only_parts``: restrict this invocation to a subset of output
      parts (rows of other parts are dropped before extraction, exactly
      like resume's committed-part filter). This is the WAVE primitive:
      at 100 TB a single global exchange is the wrong tool, so
      ``run_flagship_waves`` loops part subsets through this — each
      wave's shuffle and object-store footprint is 1/n_waves of the
      whole, and every wave commits through the same manifest, so a
      crashed wave run resumes like any other.
    """
    input_desc = source if isinstance(source, str) else "<dataset>"
    if out_dir is None:
        return build_extracted(
            source,
            n_parts=n_parts,
            salt_chunk=salt_chunk,
            concurrency=concurrency,
            batch_size=batch_size,
            shuffle_block_rows=shuffle_block_rows,
        ).drop_columns(["part"])

    manifest_dir = manifest_dir or os.path.join(out_dir, "_manifest")
    manifest = Manifest(manifest_dir)
    committed = frozenset(manifest.committed_parts())
    if committed:
        # resuming against a manifest written with different parameters
        # silently corrupts the output (part ids from a different hash
        # layout, a different input, or a different extractor) — refuse
        prev = manifest.read(min(committed))
        # an ingest-touched part records provenance as
        # "<base input>+ingest:<wave>…"; the resume contract is against
        # the BASE input — re-offering it must resume cleanly (no-op or
        # completing missing parts), while a truly different input
        # still refuses. Complete the base run before the first ingest:
        # a part first created BY an ingest wave is committed, so a
        # later base resume would skip it and its base rows would need
        # a manifest clear to land (ingest_append docstring).
        prev_base_input = prev.input.split("+ingest:", 1)[0]
        mismatches = {
            k: (p, v)
            for k, (p, v) in {
                "n_parts": (prev.n_parts, n_parts),
                "salt_chunk": (prev.salt_chunk, salt_chunk),
                "input": (prev_base_input, input_desc),
                "extractor_version": (prev.extractor_version, EXTRACTOR_VERSION),
            }.items()
            if p != v
        }
        if mismatches:
            raise ValueError(
                f"checkpoint manifest at {manifest_dir} was written with different "
                f"parameters {mismatches} (manifest value, current value); resume "
                "with matching parameters or clear the manifest and output dir"
            )
    # clear orphaned staging dirs from CRASHED runs only (their content
    # is uncommitted by definition; leaving them would make recursive
    # readers of out_dir see duplicate rows). A staging dir whose
    # embedded pid is still alive belongs to a concurrently running job
    # writing to the same out_dir — removing it would corrupt that
    # job's write (ADVICE round 1), so it is left alone.
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("_staging-"):
                try:
                    owner_pid = int(name.split("-")[1])  # _staging-<pid>[-tag]
                except (IndexError, ValueError):
                    owner_pid = None
                if owner_pid is not None:
                    if owner_pid == os.getpid():
                        continue  # a concurrent wave of THIS process — never touch
                    try:
                        os.kill(owner_pid, 0)  # probe only: signal 0 sends nothing
                        continue  # owner alive -> not an orphan
                    except ProcessLookupError:
                        pass  # owner dead -> orphan, safe to clear
                    except PermissionError:
                        continue  # alive under another uid -> leave it
                import shutil as _shutil

                _shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    skip = committed
    if only_parts is not None:
        skip = committed | frozenset(p for p in range(n_parts) if p not in only_parts)
    ds = build_extracted(
        source,
        n_parts=n_parts,
        salt_chunk=salt_chunk,
        committed=skip,
        concurrency=concurrency,
        batch_size=batch_size,
        shuffle_block_rows=shuffle_block_rows,
    )
    import time as _time
    import uuid as _uuid

    t_write0 = _time.perf_counter()
    # pid identifies the owner for orphan cleanup; the random tag keeps
    # concurrent waves of ONE process (run_flagship_waves concurrent
    # mode) from sharing a staging root
    staging_root = os.path.join(out_dir, f"_staging-{os.getpid()}-{_uuid.uuid4().hex[:8]}")
    ds.write_parquet(staging_root, partition_cols=["part"])
    t_write = _time.perf_counter() - t_write0

    t_commit0 = _time.perf_counter()
    written = []
    meta_base = {
        "extractor_version": EXTRACTOR_VERSION,
        "n_parts": n_parts,
        "salt_chunk": salt_chunk,
        "input": input_desc,
    }
    # a fully-resumed run writes 0 rows and no staging dir at all
    parts_found = (
        sorted(
            int(name.split("=", 1)[1])
            for name in os.listdir(staging_root)
            if name.startswith("part=")
        )
        if os.path.isdir(staging_root)
        else []
    )
    refs = [
        _commit_part.remote(staging_root, out_dir, manifest_dir, p, meta_base)
        for p in parts_found
    ]
    rows = sum(ray.get(refs))
    written = parts_found
    # clear the (now empty) staging root
    import shutil

    shutil.rmtree(staging_root, ignore_errors=True)
    if only_parts is None:
        # whole-input run finished every commit -> the base is complete
        # and ingest waves may extend it (see _mark_base_complete)
        _mark_base_complete(
            manifest_dir,
            {"input": input_desc, "n_parts": n_parts, "salt_chunk": salt_chunk},
        )
    return {
        "parts_written": len(written),
        "parts_skipped": len(committed),
        "rows_written": rows,
        "write_sec": round(t_write, 3),
        "commit_sec": round(_time.perf_counter() - t_commit0, 3),
    }


def run_flagship_waves(
    source: Union[str, "ray.data.Dataset"],
    out_dir: str,
    *,
    n_waves: int = 4,
    n_parts: int = DEFAULT_N_PARTS,
    concurrent: bool = False,
    **kwargs,
) -> dict:
    """Run the flagship as ``n_waves`` part-subset jobs (SCALE.md §9):
    wave w processes parts where ``part % n_waves == w``. Each wave is a
    full resumable run restricted via ``only_parts``, so its exchange
    moves ~1/n_waves of the data — the knob that keeps a single sort
    exchange's shuffle-object count and object-store footprint bounded
    when the input no longer fits one exchange. All waves share the
    output dir and manifest; the final output is byte-identical to a
    single-run output (asserted in tests).

    ``concurrent=True`` runs the waves in threads over one Ray session,
    splitting the extraction CPU budget between them. Staging dirs are
    uniquely tagged per wave and manifest commits are per-part, so the
    waves never collide. MEASURED single-node verdict: do NOT use it
    there — two streaming executors contend (2-wave concurrent 92 s vs
    35 s single-pipeline on the 2M-turn corpus at 32 CPUs; dual actor
    pools + dual shuffles starve each other, occasionally to a stall).
    A single Ray Data pipeline already overlaps its own stages; the
    concurrent mode only makes sense multi-node where each wave's
    exchange is bounded by different hardware (and even then, measure
    first). Sequential waves remain the footprint-bounding tool."""
    totals = {"parts_written": 0, "parts_skipped": 0, "rows_written": 0, "waves": n_waves}
    wave_parts = [
        frozenset(p for p in range(n_parts) if p % n_waves == w) for w in range(n_waves)
    ]
    if concurrent:
        from concurrent.futures import ThreadPoolExecutor

        # Ray's write path imports fsspec.implementations.http per write
        # and catches only ModuleNotFoundError. In this environment that
        # import FAILS (no aiohttp), and failed imports are not cached —
        # so concurrent waves re-import simultaneously and can observe a
        # partially-initialized module, raising plain ImportError, which
        # Ray does not catch. Register a stub module once so every
        # later import succeeds deterministically; the dummy class makes
        # Ray's isinstance() check correctly answer "not HTTP".
        import sys as _sys
        import types as _types

        if "fsspec.implementations.http" not in _sys.modules:
            try:
                import fsspec.implementations.http  # noqa: F401
            except Exception:
                _stub = _types.ModuleType("fsspec.implementations.http")

                class _NoHTTPFileSystem:  # only ever used in isinstance checks
                    pass

                _stub.HTTPFileSystem = _NoHTTPFileSystem
                _sys.modules["fsspec.implementations.http"] = _stub
        if "concurrency" not in kwargs:
            # reserve 2 CPUs per wave for its read/sort/write tasks on
            # top of the global -2, else the fixed-size wave pools
            # jointly hold every CPU and the shuffles starve (the
            # round-1 two-pools-plus-shuffle deadlock, at any scale)
            cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
            kwargs["concurrency"] = max(1, (cpus - 2 - 2 * n_waves) // n_waves)
        with ThreadPoolExecutor(max_workers=n_waves) as ex:
            futs = [
                ex.submit(
                    run_flagship, source, out_dir, n_parts=n_parts, only_parts=wp, **kwargs
                )
                for wp in wave_parts
            ]
            results = [f.result() for f in futs]
    else:
        results = [
            run_flagship(source, out_dir, n_parts=n_parts, only_parts=wp, **kwargs)
            for wp in wave_parts
        ]
    for s in results:
        totals["parts_written"] += s["parts_written"]
        totals["rows_written"] += s["rows_written"]
    # every wave committed -> the base input is fully represented
    manifest_dir = kwargs.get("manifest_dir") or os.path.join(out_dir, "_manifest")
    _mark_base_complete(
        manifest_dir,
        {
            "input": source if isinstance(source, str) else "<dataset>",
            "n_parts": n_parts,
            "salt_chunk": kwargs.get("salt_chunk", DEFAULT_SALT_CHUNK),
        },
    )
    return totals


def read_extracted(out_dir: str) -> "ray.data.Dataset":
    """Read back a committed flagship output (the part=k dirs only —
    never the manifest or any orphaned staging dir)."""
    files = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part="):
            sub = os.path.join(out_dir, d)
            files.extend(
                os.path.join(sub, f) for f in sorted(os.listdir(sub)) if f.endswith(".parquet")
            )
    return ray.data.read_parquet(files)


@ray.remote
def _delete_from_part(
    out_dir: str, manifest_dir: str, part: int, conv_ids: tuple[str, ...]
) -> tuple[int, int]:
    """Rewrite ONE part without the target conversations. Returns
    (rows_deleted, rewritten 0/1). A part with no matching rows is left
    byte-identical (checked with a pruned conv_id-only read first).
    The part's OWN manifest entry supplies the re-commit metadata, so
    per-part ingest provenance survives a delete."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    prev = Manifest(manifest_dir).read(part)
    meta_base = {
        "extractor_version": prev.extractor_version,
        "n_parts": prev.n_parts,
        "salt_chunk": prev.salt_chunk,
        "input": prev.input,
    }
    part_dir = os.path.join(out_dir, f"part={part}")
    targets = pa.array(list(conv_ids), pa.string())
    probe = pads.dataset(part_dir, format="parquet").to_table(columns=["conv_id"])
    hit = pc.sum(pc.cast(pc.is_in(probe.column("conv_id"), value_set=targets), pa.int64())).as_py() or 0
    if hit == 0:
        return 0, 0
    t = pads.dataset(part_dir, format="parquet").to_table()
    kept = t.filter(pc.invert(pc.is_in(t.column("conv_id"), value_set=targets)))
    # name follows the _staging-<pid>-... convention so run_flagship's
    # orphan cleanup can parse the owner pid and leave a LIVE delete's
    # staging alone (ADVICE round 2: the old _staging-delete-<pid> name
    # made int(name.split('-')[1]) raise and the dir was rmtree'd even
    # while its owner was mid-rewrite)
    staging = os.path.join(out_dir, f"_staging-{os.getpid()}-delete-{part}")
    stage_part = os.path.join(staging, f"part={part}")
    os.makedirs(stage_part, exist_ok=True)
    pq.write_table(kept, os.path.join(stage_part, "data-0.parquet"))
    promote_part(staging, out_dir, part)
    import shutil as _sh

    _sh.rmtree(staging, ignore_errors=True)
    checksum = 0
    for chunk in kept.column("row_h").chunks or [kept.column("row_h").combine_chunks()]:
        s = chunk.to_numpy(zero_copy_only=False)
        if len(s):
            checksum = (checksum + int(s.sum() % _CHECKSUM_MOD)) % _CHECKSUM_MOD
    Manifest(manifest_dir).commit(
        PartMeta(part=part, rows=kept.num_rows, checksum=checksum, **meta_base)
    )
    return int(hit), 1


def _turn_keys(t: pa.Table) -> pa.Array:
    """Packed (conv_id, turn_idx) key for vectorized cross-wave dedup —
    a separator no conv_id contains keeps the packing injective."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        pc.cast(t.column("conv_id"), pa.string()),
        pc.cast(t.column("turn_idx"), pa.string()),
        "\x1f",
    )


def _heal_manifest(manifest_dir: str, part: int, part_dir: str, meta_base: dict) -> None:
    """Re-commit a part's manifest entry from the dir's actual content
    if a crash between promote/append and commit left it stale."""
    t = pads.dataset(part_dir, format="parquet").to_table(columns=["row_h"])
    man = Manifest(manifest_dir)
    prev = man.read(part)
    if prev.rows != t.num_rows:
        s = t.column("row_h").combine_chunks().to_numpy(zero_copy_only=False)
        checksum = int(s.sum() % _CHECKSUM_MOD) if len(s) else 0
        man.commit(PartMeta(part=part, rows=t.num_rows, checksum=checksum, **meta_base))


def _base_complete_path(manifest_dir: str) -> str:
    return os.path.join(manifest_dir, "base_complete.json")


def _mark_base_complete(manifest_dir: str, info: dict) -> None:
    """Atomic marker written ONLY after a whole-input flagship run (or a
    full wave sweep) finishes every commit. ingest_append requires it:
    without the marker, an ingest wave against a partially-committed
    base could create parts a later base-run resume then skips, silently
    losing the base rows that hash into them (ADVICE round 2)."""
    import json as _json

    os.makedirs(manifest_dir, exist_ok=True)
    tmp = _base_complete_path(manifest_dir) + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(info, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _base_complete_path(manifest_dir))


def _tombstones_path(manifest_dir: str) -> str:
    return os.path.join(manifest_dir, "tombstones.json")


def _read_tombstones(manifest_dir: str) -> list[str]:
    import json as _json

    p = _tombstones_path(manifest_dir)
    if os.path.exists(p):
        with open(p) as f:
            return _json.load(f)
    return []


@ray.remote
def _ingest_merge_part(
    out_dir: str,
    manifest_dir: str,
    part: int,
    staged_dir: str,
    meta_base: dict,
    mode: str,
    tombstones: tuple[str, ...] = (),
) -> tuple[int, int, int, int]:
    """Merge ONE staged wave part into the committed output. Returns
    (rows_appended, rows_deduped, created 0/1, rows_tombstoned).
    Cross-wave dedup is first-wins on (conv_id, turn_idx) — identical
    to D1's resume semantics, so replayed input rows can never
    duplicate output. ``tombstones`` is this part's slice of the
    delete ledger (hash-pruned driver-side): rows of conversations the
    user asked to forget are dropped BEFORE the merge, so a takedown
    survives later waves that re-deliver the content.

    mode="cow": rewrite the part as old + fresh, re-sorted — one file,
    read path unchanged. mode="mor": read ONLY the two key columns of
    the committed part, append a delta file holding just the fresh rows
    (rename into place is atomic within the dir) — rewrite cost drops
    from O(part) to O(fresh), at the price of per-conversation rows
    spanning files (consumers key on (conv_id, turn_idx), never file
    position)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    new = pads.dataset(staged_dir, format="parquet").to_table()
    n_tomb = 0
    if tombstones:
        alive = pc.invert(
            pc.is_in(new.column("conv_id"), value_set=pa.array(list(tombstones), pa.string()))
        )
        kept = new.filter(alive)
        n_tomb = new.num_rows - kept.num_rows
        new = kept
        if new.num_rows == 0:
            return 0, 0, 0, n_tomb
    part_dir = os.path.join(out_dir, f"part={part}")
    created = 0
    if os.path.isdir(part_dir):
        key_cols = ["conv_id", "turn_idx"] if mode == "mor" else None
        old = pads.dataset(part_dir, format="parquet").to_table(columns=key_cols)
        dup = pc.is_in(_turn_keys(new), value_set=_turn_keys(old).combine_chunks())
        fresh = new.filter(pc.invert(dup))
        n_dup = new.num_rows - fresh.num_rows
        if fresh.num_rows == 0:
            # nothing to add — but heal a stale manifest left by a crash
            # between a previous merge's promote/append and its commit
            _heal_manifest(manifest_dir, part, part_dir, meta_base)
            return 0, n_dup, 0, n_tomb
        if mode == "mor":
            import uuid as _uuid

            fresh = fresh.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            tag = _uuid.uuid4().hex[:8]
            tmp = os.path.join(part_dir, f".delta-{tag}.parquet.tmp")
            pq.write_table(fresh, tmp)
            os.replace(tmp, os.path.join(part_dir, f"delta-{tag}.parquet"))
            total = pads.dataset(part_dir, format="parquet").to_table(columns=["row_h"])
            s = total.column("row_h").combine_chunks().to_numpy(zero_copy_only=False)
            checksum = int(s.sum() % _CHECKSUM_MOD) if len(s) else 0
            Manifest(manifest_dir).commit(
                PartMeta(part=part, rows=total.num_rows, checksum=checksum, **meta_base)
            )
            return int(fresh.num_rows), int(n_dup), 0, n_tomb
        merged = pa.concat_tables([old, fresh.select(old.schema.names)]).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    else:
        merged = new.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n_dup = 0
        fresh = new
        created = 1
    staging = os.path.join(out_dir, f"_staging-{os.getpid()}-ingestmerge-{part}")
    stage_part = os.path.join(staging, f"part={part}")
    os.makedirs(stage_part, exist_ok=True)
    pq.write_table(merged, os.path.join(stage_part, "data-0.parquet"))
    promote_part(staging, out_dir, part)
    import shutil as _sh

    _sh.rmtree(staging, ignore_errors=True)
    checksum = 0
    s = merged.column("row_h").combine_chunks().to_numpy(zero_copy_only=False)
    if len(s):
        checksum = int(s.sum() % _CHECKSUM_MOD)
    Manifest(manifest_dir).commit(
        PartMeta(part=part, rows=merged.num_rows, checksum=checksum, **meta_base)
    )
    return int(fresh.num_rows), int(n_dup), created, n_tomb


def ingest_append(
    new_source: Union[str, "ray.data.Dataset"],
    out_dir: str,
    *,
    manifest_dir: str | None = None,
    wave_id: str | None = None,
    concurrency: int | None = None,
    mode: str = "cow",
) -> dict:
    """Incremental micro-batch ingest (the structured-streaming wave
    pattern a standing 100 TB pipeline needs): extract a NEWLY-ARRIVED
    input wave and merge it into an already-committed flagship output,
    touching only the partitions the wave's conversations hash into.

    Scale shape: the wave runs the normal flagship pipeline (keys ->
    actor-pool extraction -> ONE salted ordering exchange sized to the
    WAVE, not the accumulated corpus) into its own staging root; each
    affected part is then merged by an independent Ray task —
    copy-on-write: old part + surviving new rows, re-sorted, atomic
    staging promote, manifest re-commit. Cross-wave replays dedup
    first-wins on (conv_id, turn_idx) (D1 semantics), so at-least-once
    upstream delivery is safe. A consumed-inputs ledger
    (``_manifest/ingested.json``, atomic replace, written only after
    every part commit succeeds) makes the whole wave idempotent: a
    crashed wave re-runs and its rows dedup to zero, healing any
    stale manifest entry along the way.

    Two merge strategies, the standard lakehouse trade (Delta/Iceberg):
    ``mode="cow"`` (default) rewrites each affected part as old + fresh
    re-sorted — read path unchanged, rewrite cost O(affected parts).
    ``mode="mor"`` reads only the committed part's (conv_id, turn_idx)
    keys and appends a delta file of just the fresh rows — write cost
    O(fresh), for wave frequencies where COW rewrite amplification
    dominates; per-conversation rows then span files, which is fine for
    every consumer that keys on (conv_id, turn_idx) (all of ours do;
    the oracle check and compaction are order-restoring). The modes
    compose: ``compact`` later folds MOR deltas back into one sorted
    file per part via delete-style COW. After the first ingest the
    output's provenance is the ledger, not run_flagship's single-input
    manifest field — extend the output only via further ingest_append
    calls. Complete the base run before the first ingest: a part whose
    FIRST commit came from an ingest wave would be skipped by a later
    base-run resume (committed parts are resume-final), so base rows
    for it would need a manifest clear to land — ENFORCED: this
    function refuses unless the base-complete marker written by a
    finished run_flagship / run_flagship_waves is present."""
    manifest_dir = manifest_dir or os.path.join(out_dir, "_manifest")
    manifest = Manifest(manifest_dir)
    committed = manifest.committed_parts()
    if not committed:
        raise ValueError(
            f"ingest_append requires a committed flagship output at {out_dir}; "
            "run run_flagship first"
        )
    if not os.path.exists(_base_complete_path(manifest_dir)):
        # committed parts exist but the base run never FINISHED: an
        # ingest now could create parts a later base resume then skips,
        # silently dropping the base rows hashing into them
        raise ValueError(
            f"flagship output at {out_dir} has committed parts but no "
            "base-complete marker (the base run_flagship crashed partway); "
            "finish the base run (resume run_flagship) before ingesting"
        )
    sample = manifest.read(min(committed))
    if sample.extractor_version != EXTRACTOR_VERSION:
        raise ValueError(
            f"output was extracted with version {sample.extractor_version}, "
            f"current is {EXTRACTOR_VERSION}; re-extract instead of ingesting"
        )
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    wave_desc = wave_id or (os.path.abspath(new_source) if isinstance(new_source, str) else None)
    if wave_desc is None:
        raise ValueError("pass wave_id= when ingesting from an in-memory Dataset")

    import json as _json

    ledger_path = os.path.join(manifest_dir, "ingested.json")
    ledger: list[str] = []
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            ledger = _json.load(f)
    if wave_desc in ledger:
        return {
            "wave": wave_desc,
            "already_ingested": True,
            "parts_updated": 0,
            "parts_created": 0,
            "rows_appended": 0,
            "rows_deduped": 0,
        }

    ds = build_extracted(
        new_source,
        n_parts=sample.n_parts,
        salt_chunk=sample.salt_chunk,
        concurrency=concurrency,
    )
    import uuid as _uuid

    staging_root = os.path.join(out_dir, f"_staging-{os.getpid()}-{_uuid.uuid4().hex[:8]}")
    ds.write_parquet(staging_root, partition_cols=["part"])
    parts_found = (
        sorted(
            int(name.split("=", 1)[1])
            for name in os.listdir(staging_root)
            if name.startswith("part=")
        )
        if os.path.isdir(staging_root)
        else []
    )
    meta_base = {
        "extractor_version": sample.extractor_version,
        "n_parts": sample.n_parts,
        "salt_chunk": sample.salt_chunk,
        "input": f"{sample.input}+ingest:{wave_desc}",
    }
    # tombstones: conversations deleted via delete_conversations must
    # stay deleted even when a later wave re-delivers their content —
    # hash-prune the ledger to each part's own slice (k tombstones ship
    # to at most k merge tasks, never all of them)
    from bank_statement_pdf_parser_ray.core.hashing import stable_hash64

    tomb_by_part: dict[int, list[str]] = {}
    for c in _read_tombstones(manifest_dir):
        tomb_by_part.setdefault(int(stable_hash64(c) % sample.n_parts), []).append(c)
    refs = [
        _ingest_merge_part.remote(
            out_dir,
            manifest_dir,
            p,
            os.path.join(staging_root, f"part={p}"),
            meta_base,
            mode,
            tuple(tomb_by_part.get(p, ())),
        )
        for p in parts_found
    ]
    results = ray.get(refs)
    import shutil as _sh

    _sh.rmtree(staging_root, ignore_errors=True)

    # ledger written LAST: a crash anywhere above re-runs the wave and
    # dedups to zero; once this replace lands the wave is a no-op
    tmp = ledger_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(ledger + [wave_desc], f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ledger_path)
    return {
        "wave": wave_desc,
        "already_ingested": False,
        "parts_updated": sum(1 for r in results if r[0] > 0 and not r[2]),
        "parts_created": sum(r[2] for r in results),
        "rows_appended": sum(r[0] for r in results),
        "rows_deduped": sum(r[1] for r in results),
        "rows_tombstoned": sum(r[3] for r in results),
    }


@ray.remote
def _compact_part(out_dir: str, manifest_dir: str, part: int) -> tuple[int, int]:
    """Fold one multi-file part (MOR deltas) back into a single sorted
    file via the atomic staging promote. Single-file parts untouched.
    The part's OWN manifest entry supplies the re-commit metadata, so
    per-part ingest provenance survives compaction."""
    import pyarrow.parquet as pq

    prev = Manifest(manifest_dir).read(part)
    meta_base = {
        "extractor_version": prev.extractor_version,
        "n_parts": prev.n_parts,
        "salt_chunk": prev.salt_chunk,
        "input": prev.input,
    }
    part_dir = os.path.join(out_dir, f"part={part}")
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    if len(files) <= 1:
        return 0, 0
    t = pads.dataset(part_dir, format="parquet").to_table().sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    staging = os.path.join(out_dir, f"_staging-{os.getpid()}-compact-{part}")
    stage_part = os.path.join(staging, f"part={part}")
    os.makedirs(stage_part, exist_ok=True)
    pq.write_table(t, os.path.join(stage_part, "data-0.parquet"))
    promote_part(staging, out_dir, part)
    import shutil as _sh

    _sh.rmtree(staging, ignore_errors=True)
    s = t.column("row_h").combine_chunks().to_numpy(zero_copy_only=False)
    checksum = int(s.sum() % _CHECKSUM_MOD) if len(s) else 0
    Manifest(manifest_dir).commit(
        PartMeta(part=part, rows=t.num_rows, checksum=checksum, **meta_base)
    )
    return 1, t.num_rows


def compact_output(out_dir: str, manifest_dir: str | None = None) -> dict:
    """Maintenance compaction over a committed flagship output: every
    part holding more than one parquet file (MOR ingest deltas) is
    rewritten as ONE sorted file through the same atomic staging
    promote + manifest re-commit as a normal commit — content
    unchanged, file count and in-part ordering restored. One Ray task
    per affected part; single-file parts are never touched."""
    manifest_dir = manifest_dir or os.path.join(out_dir, "_manifest")
    manifest = Manifest(manifest_dir)
    committed = manifest.committed_parts()
    if not committed:
        return {"parts_compacted": 0, "rows": 0}
    refs = [_compact_part.remote(out_dir, manifest_dir, p) for p in sorted(committed)]
    results = ray.get(refs)
    return {
        "parts_compacted": sum(r[0] for r in results),
        "rows": sum(r[1] for r in results),
    }


def delete_conversations(out_dir: str, conv_ids: list[str], manifest_dir: str | None = None) -> dict:
    """Targeted delete (GDPR right-to-be-forgotten / takedown): remove
    every row of the given conversations from a COMMITTED flagship
    output, touching only the partitions that can contain them.

    Scale shape: ``part = stable_hash64(conv_id) % n_parts`` is the
    committed layout's own assignment, so the affected part set is
    computed driver-side from the keys alone — a delete of k
    conversations reads k/n_parts of the output on average, never all
    of it. Each affected part is rewritten by an independent Ray task
    (probe-first: a part with no matching rows is left byte-identical),
    promoted with the same atomic staging rename as a normal commit,
    and its manifest entry is re-committed with the new row count and
    checksum — so a crash mid-delete leaves every part either fully old
    or fully new, and resume/read paths never see a half-deleted part.
    Idempotent: a second call deletes 0 rows and rewrites nothing.

    The conversation ids are also recorded in a tombstone ledger
    (``_manifest/tombstones.json``, written atomically BEFORE any part
    rewrite): later ingest waves drop tombstoned rows before merging,
    so a takedown survives upstream re-delivery of the same content."""
    from bank_statement_pdf_parser_ray.core.hashing import stable_hash64

    manifest_dir = manifest_dir or os.path.join(out_dir, "_manifest")
    manifest = Manifest(manifest_dir)
    committed = manifest.committed_parts()
    if not committed:
        return {"parts_scanned": 0, "parts_rewritten": 0, "rows_deleted": 0}
    # record the takedown FIRST (atomic replace): even if this process
    # dies mid-delete, future ingest waves must never re-add the
    # conversation (right-to-be-forgotten outlives reprocessing); the
    # rerun of delete_conversations finishes the part rewrites
    import json as _json

    tombs = sorted(set(_read_tombstones(manifest_dir)) | set(conv_ids))
    tmp = _tombstones_path(manifest_dir) + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(tombs, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _tombstones_path(manifest_dir))
    n_parts = manifest.read(min(committed)).n_parts
    by_part: dict[int, list[str]] = {}
    for c in conv_ids:
        p = int(stable_hash64(c) % n_parts)
        if p in committed:
            by_part.setdefault(p, []).append(c)
    refs = [
        _delete_from_part.remote(out_dir, manifest_dir, p, tuple(cs))
        for p, cs in sorted(by_part.items())
    ]
    results = ray.get(refs)
    return {
        "parts_scanned": len(refs),
        "parts_rewritten": sum(r[1] for r in results),
        "rows_deleted": sum(r[0] for r in results),
    }
