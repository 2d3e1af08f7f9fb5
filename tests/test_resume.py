"""S5 resume gate: identical final output after kill-and-rerun from a
partial checkpoint manifest (BASELINE.json north_rule; SURVEY.md §5.4)."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship
from bank_statement_pdf_parser_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory, tiny_corpus):
    p = tmp_path_factory.mktemp("corpus_r") / "tiny.parquet"
    pq.write_table(tiny_corpus, str(p))
    return str(p)


def _read_all(out_dir: str) -> pd.DataFrame:
    files = []
    for d in os.listdir(out_dir):
        if d.startswith("part="):
            sub = os.path.join(out_dir, d)
            files.extend(os.path.join(sub, f) for f in os.listdir(sub) if f.endswith(".parquet"))
    ds = pads.dataset(files)
    df = ds.to_table(columns=["conv_id", "turn_idx", "extracted_text", "row_h"]).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


class TestResume:
    def test_kill_and_rerun_identical(self, corpus_path, tmp_path):
        ref_dir = str(tmp_path / "ref")
        out_dir = str(tmp_path / "resumable")
        s1 = run_flagship(corpus_path, ref_dir, salt_chunk=25, n_parts=8)
        assert s1["parts_written"] > 0 and s1["parts_skipped"] == 0
        reference = _read_all(ref_dir)

        # full run, then simulate a crash that lost 3 parts AND their
        # manifest entries (uncommitted work)
        s2 = run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        manifest = Manifest(os.path.join(out_dir, "_manifest"))
        lost = sorted(manifest.committed_parts())[:3]
        for p in lost:
            shutil.rmtree(os.path.join(out_dir, f"part={p}"))
            os.remove(os.path.join(out_dir, "_manifest", f"part-{p:05d}.json"))

        s3 = run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        assert s3["parts_written"] == len(lost)
        assert s3["parts_skipped"] == s2["parts_written"] - len(lost)
        resumed = _read_all(out_dir)
        pd.testing.assert_frame_equal(reference, resumed)

    def test_orphan_part_dir_replaced(self, corpus_path, tmp_path):
        out_dir = str(tmp_path / "orphan")
        run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        manifest = Manifest(os.path.join(out_dir, "_manifest"))
        victim = sorted(manifest.committed_parts())[0]
        # crash between promote and manifest commit: dir exists, no entry
        os.remove(os.path.join(out_dir, "_manifest", f"part-{victim:05d}.json"))
        before = _read_all(out_dir)
        s = run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        assert s["parts_written"] == 1
        pd.testing.assert_frame_equal(before, _read_all(out_dir))

    def test_manifest_records_lineage(self, corpus_path, tmp_path):
        out_dir = str(tmp_path / "lineage")
        run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        mdir = os.path.join(out_dir, "_manifest")
        entries = [
            json.load(open(os.path.join(mdir, f)))
            for f in sorted(os.listdir(mdir))
            if f.startswith("part-")  # the dir also holds the base-complete marker
        ]
        assert entries
        # a FINISHED base run must leave the base-complete marker that
        # gates ingest_append (ADVICE round 2)
        assert os.path.exists(os.path.join(mdir, "base_complete.json"))
        for e in entries:
            assert e["rows"] > 0
            assert e["checksum"] > 0
            assert e["extractor_version"]
            assert e["input"] == corpus_path
        # checksums are content-derived: identical rerun -> identical checksums
        out2 = str(tmp_path / "lineage2")
        run_flagship(corpus_path, out2, salt_chunk=25, n_parts=8)
        m2 = os.path.join(out2, "_manifest")
        entries2 = [
            json.load(open(os.path.join(m2, f)))
            for f in sorted(os.listdir(m2))
            if f.startswith("part-")
        ]
        assert [e["checksum"] for e in entries] == [e["checksum"] for e in entries2]


class TestResumeSafety:
    def test_mismatched_params_refused(self, corpus_path, tmp_path):
        out_dir = str(tmp_path / "mismatch")
        run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        with pytest.raises(ValueError, match="different\\s+parameters"):
            run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=16)
        with pytest.raises(ValueError, match="different\\s+parameters"):
            run_flagship(corpus_path.replace(".parquet", "x.parquet"), out_dir, salt_chunk=25, n_parts=8)

    def test_orphan_staging_cleared(self, corpus_path, tmp_path):
        import pandas as pd

        out_dir = str(tmp_path / "stalestage")
        run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        stale = os.path.join(out_dir, "_staging-99999")
        os.makedirs(os.path.join(stale, "part=0"))
        open(os.path.join(stale, "part=0", "junk.parquet"), "w").write("x")
        s = run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        assert s["parts_written"] == 0
        assert not os.path.exists(stale)


class TestWaves:
    def test_waves_equal_single_run(self, corpus_path, tmp_path):
        """run_flagship_waves output (3 waves over 8 parts, shared
        manifest) must equal a single-run output row for row, and a
        second waves pass must be a full resume no-op."""
        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship_waves

        single = str(tmp_path / "single")
        waved = str(tmp_path / "waved")
        run_flagship(corpus_path, single, salt_chunk=25, n_parts=8)
        t = run_flagship_waves(corpus_path, waved, n_waves=3, salt_chunk=25, n_parts=8)
        assert t["parts_written"] == 8
        a, b = _read_all(single), _read_all(waved)
        pd.testing.assert_frame_equal(a, b)
        # rerun: everything already committed
        t2 = run_flagship_waves(corpus_path, waved, n_waves=3, salt_chunk=25, n_parts=8)
        assert t2["parts_written"] == 0 and t2["rows_written"] == 0


class TestStagingCleanup:
    def test_live_owner_staging_preserved_dead_removed(self, corpus_path, tmp_path):
        """Only staging dirs whose embedded pid is DEAD are orphans; a
        live concurrent writer's staging dir must be left alone
        (removing it would corrupt that job's write)."""
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir)
        live = os.path.join(out_dir, "_staging-1")       # pid 1: alive (init)
        dead = os.path.join(out_dir, "_staging-999999999")  # beyond pid_max: dead
        os.makedirs(live)
        os.makedirs(dead)
        run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=4)
        assert os.path.isdir(live)      # concurrent writer untouched
        assert not os.path.isdir(dead)  # orphan cleared

    def test_concurrent_waves_equal_single_run(self, corpus_path, tmp_path):
        """concurrent=True waves (threaded, shared session) must still
        produce single-run-identical output — the collision surfaces
        are per-wave staging tags and per-part manifest commits."""
        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship_waves

        single = str(tmp_path / "single")
        conc = str(tmp_path / "conc")
        run_flagship(corpus_path, single, salt_chunk=25, n_parts=8)
        t = run_flagship_waves(
            corpus_path, conc, n_waves=2, concurrent=True, salt_chunk=25, n_parts=8
        )
        assert t["parts_written"] == 8
        pd.testing.assert_frame_equal(_read_all(single), _read_all(conc))


class TestDelete:
    """GDPR-style targeted delete over a committed output: only the
    hash-targeted parts are touched, untouched parts stay byte-identical,
    manifests re-commit, resume never resurrects, idempotent."""

    def _file_bytes(self, out_dir):
        out = {}
        for d in sorted(os.listdir(out_dir)):
            if d.startswith("part="):
                sub = os.path.join(out_dir, d)
                for f in sorted(os.listdir(sub)):
                    with open(os.path.join(sub, f), "rb") as fh:
                        out[f"{d}/{f}"] = fh.read()
        return out

    def test_delete_targets_only_their_parts(self, corpus_path, tmp_path):
        from bank_statement_pdf_parser_ray.core.hashing import stable_hash64
        from bank_statement_pdf_parser_ray.pipelines.flagship import delete_conversations

        out_dir = str(tmp_path / "del")
        run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        before = _read_all(out_dir)
        convs = sorted(before["conv_id"].unique())[:3]
        target_parts = {int(stable_hash64(c) % 8) for c in convs}
        pre_bytes = self._file_bytes(out_dir)
        n_target_rows = int(before["conv_id"].isin(convs).sum())

        s = delete_conversations(out_dir, list(convs))
        assert s["rows_deleted"] == n_target_rows
        assert s["parts_scanned"] == len(target_parts)
        assert s["parts_rewritten"] <= len(target_parts)

        after = _read_all(out_dir)
        assert not after["conv_id"].isin(convs).any()
        assert len(after) == len(before) - n_target_rows
        # rows of OTHER conversations are untouched, value-identical
        keep = before[~before["conv_id"].isin(convs)].reset_index(drop=True)
        pd.testing.assert_frame_equal(after, keep)
        # parts that cannot contain a target are byte-identical
        post_bytes = self._file_bytes(out_dir)
        for name, blob in pre_bytes.items():
            part = int(name.split("/")[0].split("=")[1])
            if part not in target_parts:
                assert post_bytes[name] == blob, name

        # manifest row counts re-committed
        man = Manifest(os.path.join(out_dir, "_manifest"))
        total = sum(man.read(p).rows for p in man.committed_parts())
        assert total == len(after)

        # a resume run skips everything — deletion is never resurrected
        s2 = run_flagship(corpus_path, out_dir, salt_chunk=25, n_parts=8)
        assert s2["parts_written"] == 0
        assert not _read_all(out_dir)["conv_id"].isin(convs).any()

        # idempotent
        s3 = delete_conversations(out_dir, list(convs))
        assert s3["rows_deleted"] == 0 and s3["parts_rewritten"] == 0


class TestIngest:
    """Incremental micro-batch ingest: wave A committed, wave B arrives
    later (with at-least-once replays of A rows); the merged output must
    be identical to a from-scratch run over A∪B, untouched parts stay
    byte-identical, and a wave is idempotent via the consumed ledger."""

    def _split_waves(self, tiny_corpus, tmp_path):
        import pyarrow as pa
        import pyarrow.compute as pc

        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        a_set = pa.array(uniq[: len(uniq) // 2])
        mask = pc.is_in(tiny_corpus.column("conv_id"), value_set=a_set)
        A, B = tiny_corpus.filter(mask), tiny_corpus.filter(pc.invert(mask))
        B_replay = pa.concat_tables([B, A.slice(0, 40)])  # at-least-once delivery
        pa_dir = tmp_path / "waves"
        pa_dir.mkdir()
        pq.write_table(A, str(pa_dir / "waveA.parquet"))
        pq.write_table(B_replay, str(pa_dir / "waveB.parquet"))
        all_dir = tmp_path / "all"
        all_dir.mkdir()
        pq.write_table(tiny_corpus, str(all_dir / "all.parquet"))
        return str(pa_dir / "waveA.parquet"), str(pa_dir / "waveB.parquet"), str(all_dir)

    def test_ingest_matches_full_run(self, tiny_corpus, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        waveA, waveB, all_dir = self._split_waves(tiny_corpus, tmp_path)
        out = str(tmp_path / "out")
        run_flagship(waveA, out, salt_chunk=25, n_parts=8)

        # bytes of parts before ingest, to prove untouched parts stay put
        pre = {}
        for d in os.listdir(out):
            if d.startswith("part="):
                sub = os.path.join(out, d)
                for f in os.listdir(sub):
                    with open(os.path.join(sub, f), "rb") as fh:
                        pre[f"{d}/{f}"] = fh.read()

        s = ingest_append(waveB, out)
        assert not s["already_ingested"]
        assert s["rows_deduped"] == 40  # the replayed A rows
        assert s["rows_appended"] > 0

        ref = str(tmp_path / "ref")
        run_flagship(all_dir, ref, salt_chunk=25, n_parts=8)
        pd.testing.assert_frame_equal(_read_all(out), _read_all(ref))

        # parts the wave never touched are byte-identical
        post = {}
        for d in os.listdir(out):
            if d.startswith("part="):
                sub = os.path.join(out, d)
                for f in os.listdir(sub):
                    with open(os.path.join(sub, f), "rb") as fh:
                        post[f"{d}/{f}"] = fh.read()
        touched = s["parts_updated"] + s["parts_created"]
        untouched_same = sum(1 for k, v in pre.items() if post.get(k) == v)
        assert untouched_same >= len(pre) - touched

        # manifest row totals reconcile with the merged output
        man = Manifest(os.path.join(out, "_manifest"))
        assert sum(man.read(p).rows for p in man.committed_parts()) == len(_read_all(out))

        # idempotent: the ledger makes the same wave a no-op
        s2 = ingest_append(waveB, out)
        assert s2["already_ingested"] and s2["rows_appended"] == 0

        # crash-replay semantics: wave re-runs with the ledger entry
        # gone (crash before the ledger write) and dedups to zero
        ledger = os.path.join(out, "_manifest", "ingested.json")
        os.remove(ledger)
        s3 = ingest_append(waveB, out)
        assert not s3["already_ingested"]
        assert s3["rows_appended"] == 0 and s3["rows_deduped"] > 0
        pd.testing.assert_frame_equal(_read_all(out), _read_all(ref))

    def test_ingest_creates_missing_parts(self, tiny_corpus, tmp_path):
        """A wave whose conversations hash into parts the original run
        never wrote must create those parts (dir + manifest entry)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.core.hashing import stable_hash64
        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        n_parts = 8
        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        # seed run: ONE conversation -> exactly one committed part
        seedc = uniq[0]
        seed_part = int(stable_hash64(seedc) % n_parts)
        other = next(c for c in uniq if int(stable_hash64(c) % n_parts) != seed_part)
        A = tiny_corpus.filter(pc.is_in(tiny_corpus.column("conv_id"), value_set=pa.array([seedc])))
        B = tiny_corpus.filter(pc.is_in(tiny_corpus.column("conv_id"), value_set=pa.array([other])))
        pq.write_table(A, str(tmp_path / "a.parquet"))
        pq.write_table(B, str(tmp_path / "b.parquet"))
        out = str(tmp_path / "out2")
        run_flagship(str(tmp_path / "a.parquet"), out, salt_chunk=25, n_parts=n_parts)
        s = ingest_append(str(tmp_path / "b.parquet"), out)
        assert s["parts_created"] == 1 and s["rows_appended"] == B.num_rows
        man = Manifest(os.path.join(out, "_manifest"))
        assert int(stable_hash64(other) % n_parts) in man.committed_parts()
        got = _read_all(out)
        assert set(got["conv_id"]) == {seedc, other}

    def test_ingest_requires_committed_output(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        with pytest.raises(ValueError, match="committed flagship output"):
            ingest_append(str(tmp_path / "nope.parquet"), str(tmp_path / "empty"))

    def test_ingest_refuses_incomplete_base(self, tiny_corpus, tmp_path):
        """A crashed-partway base run (committed parts exist, no
        base-complete marker) must REFUSE ingest: a wave accepted then
        would commit parts a later base resume skips, silently losing
        the base rows hashing into them (ADVICE round 2). Finishing the
        base run restores ingest eligibility."""
        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        waveA, waveB, _ = self._split_waves(tiny_corpus, tmp_path)
        out = str(tmp_path / "incomplete")
        run_flagship(waveA, out, salt_chunk=25, n_parts=8)
        mdir = os.path.join(out, "_manifest")
        # simulate the crash: marker gone, one part entry gone (so the
        # base run is genuinely resumable-but-unfinished)
        os.remove(os.path.join(mdir, "base_complete.json"))
        victim = sorted(Manifest(mdir).committed_parts())[0]
        os.remove(os.path.join(mdir, f"part-{victim:05d}.json"))
        with pytest.raises(ValueError, match="base-complete marker"):
            ingest_append(waveB, out)
        # resume the base to completion -> marker restored -> ingest ok
        run_flagship(waveA, out, salt_chunk=25, n_parts=8)
        assert os.path.exists(os.path.join(mdir, "base_complete.json"))
        s = ingest_append(waveB, out)
        assert s["rows_appended"] > 0


class TestLifecycle:
    """The full data-management story on ONE output: initial run ->
    incremental ingest -> GDPR delete -> resume no-op. Every step keeps
    the manifest reconciled and the survivors value-identical to the
    obvious reference set."""

    def test_run_ingest_delete_resume(self, tiny_corpus, tmp_path):
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.pipelines.flagship import (
            delete_conversations,
            ingest_append,
        )

        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        a_set = pa.array(uniq[: len(uniq) // 2])
        mask = pc.is_in(tiny_corpus.column("conv_id"), value_set=a_set)
        pq.write_table(tiny_corpus.filter(mask), str(tmp_path / "a.parquet"))
        pq.write_table(tiny_corpus.filter(pc.invert(mask)), str(tmp_path / "b.parquet"))
        out = str(tmp_path / "life")

        run_flagship(str(tmp_path / "a.parquet"), out, salt_chunk=25, n_parts=8)
        ingest_append(str(tmp_path / "b.parquet"), out)

        victims = [uniq[0], uniq[-1]]  # one from each wave
        d = delete_conversations(out, victims)
        assert d["rows_deleted"] > 0

        got = _read_all(out)
        assert not got["conv_id"].isin(victims).any()
        assert set(got["conv_id"]) == set(uniq) - set(victims)

        # manifest totals reconcile after the whole lifecycle
        man = Manifest(os.path.join(out, "_manifest"))
        assert sum(man.read(p).rows for p in man.committed_parts()) == len(got)

        # resume is a no-op and resurrects nothing
        s = run_flagship(str(tmp_path / "a.parquet"), out, salt_chunk=25, n_parts=8)
        assert s["parts_written"] == 0
        assert not _read_all(out)["conv_id"].isin(victims).any()

        # re-ingesting wave B is ledger-blocked, so deleted wave-B
        # conversations stay deleted even on a replayed wave
        s2 = ingest_append(str(tmp_path / "b.parquet"), out)
        assert s2["already_ingested"]
        assert not _read_all(out)["conv_id"].isin(victims).any()


class TestIngestMor:
    """Merge-on-read ingest: delta file per affected part instead of a
    rewrite; content identical to COW modulo file layout; compaction
    folds deltas back to one sorted file per part with content and
    manifest unchanged."""

    def test_mor_matches_cow_then_compacts(self, tiny_corpus, tmp_path):
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.pipelines.flagship import (
            compact_output,
            ingest_append,
        )

        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        a_set = pa.array(uniq[: len(uniq) // 2])
        mask = pc.is_in(tiny_corpus.column("conv_id"), value_set=a_set)
        A, B = tiny_corpus.filter(mask), tiny_corpus.filter(pc.invert(mask))
        B_replay = pa.concat_tables([B, A.slice(0, 30)])
        pq.write_table(A, str(tmp_path / "a.parquet"))
        pq.write_table(B_replay, str(tmp_path / "b.parquet"))

        cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
        for out in (cow, mor):
            run_flagship(str(tmp_path / "a.parquet"), out, salt_chunk=25, n_parts=8)
        s_cow = ingest_append(str(tmp_path / "b.parquet"), cow, mode="cow")
        s_mor = ingest_append(str(tmp_path / "b.parquet"), mor, mode="mor")
        assert s_mor["rows_appended"] == s_cow["rows_appended"]
        assert s_mor["rows_deduped"] == s_cow["rows_deduped"] == 30

        # MOR left delta files; COW kept one file per part
        def files_per_part(out):
            return {
                d: sorted(os.listdir(os.path.join(out, d)))
                for d in os.listdir(out)
                if d.startswith("part=")
            }

        assert any(len(v) > 1 for v in files_per_part(mor).values())
        assert all(len(v) == 1 for v in files_per_part(cow).values())

        # content identical (keyed, not positional)
        pd.testing.assert_frame_equal(_read_all(cow), _read_all(mor))

        # manifests agree with the data under both modes
        for out in (cow, mor):
            man = Manifest(os.path.join(out, "_manifest"))
            assert sum(man.read(p).rows for p in man.committed_parts()) == len(_read_all(out))

        # compaction folds deltas to one sorted file per part, content
        # and manifest totals unchanged
        before = _read_all(mor)
        n_multi = sum(1 for v in files_per_part(mor).values() if len(v) > 1)
        c = compact_output(mor)
        assert c["parts_compacted"] == n_multi
        assert all(len(v) == 1 for v in files_per_part(mor).values())
        pd.testing.assert_frame_equal(_read_all(mor), before)
        man = Manifest(os.path.join(mor, "_manifest"))
        assert sum(man.read(p).rows for p in man.committed_parts()) == len(before)

        # a second compaction is a no-op
        assert compact_output(mor)["parts_compacted"] == 0

    def test_mor_then_delete(self, tiny_corpus, tmp_path):
        """Deleting from a MOR (multi-file) part rewrites it correctly."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.pipelines.flagship import (
            delete_conversations,
            ingest_append,
        )

        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        a_set = pa.array(uniq[: len(uniq) // 2])
        mask = pc.is_in(tiny_corpus.column("conv_id"), value_set=a_set)
        pq.write_table(tiny_corpus.filter(mask), str(tmp_path / "a.parquet"))
        pq.write_table(tiny_corpus.filter(pc.invert(mask)), str(tmp_path / "b.parquet"))
        out = str(tmp_path / "md")
        run_flagship(str(tmp_path / "a.parquet"), out, salt_chunk=25, n_parts=8)
        ingest_append(str(tmp_path / "b.parquet"), out, mode="mor")
        victims = [uniq[0], uniq[-1]]
        d = delete_conversations(out, victims)
        assert d["rows_deleted"] > 0
        got = _read_all(out)
        assert not got["conv_id"].isin(victims).any()
        assert set(got["conv_id"]) == set(uniq) - set(victims)
        man = Manifest(os.path.join(out, "_manifest"))
        assert sum(man.read(p).rows for p in man.committed_parts()) == len(got)


class TestDescribeCLI:
    def test_describe_reports_manifest_and_ledger(self, corpus_path, tmp_path, capsys):
        import json as _json

        from bank_statement_pdf_parser_ray.__main__ import main
        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        out = str(tmp_path / "desc")
        run_flagship(corpus_path, out, salt_chunk=25, n_parts=8)
        ingest_append(corpus_path, out, wave_id="wave-1")  # all-dup wave, ledger entry only
        assert main(["describe", "--out", out]) == 0
        d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert d["parts_committed"] == len(d["parts"]) > 0
        assert d["rows_total"] == sum(p["rows"] for p in d["parts"])
        assert d["ingested_waves"] == ["wave-1"]
        assert d["n_parts"] == 8 and d["salt_chunk"] == 25


class TestMultiWave:
    def test_three_waves_mixed_modes_equal_full_run(self, tiny_corpus, tmp_path):
        """Waves arriving in sequence with MIXED merge modes (base run,
        cow wave, mor wave) must converge to the from-scratch output
        over the union — split-invariance of the whole ingest path."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        thirds = [uniq[0::3], uniq[1::3], uniq[2::3]]
        paths = []
        for i, convs in enumerate(thirds):
            w = tiny_corpus.filter(
                pc.is_in(tiny_corpus.column("conv_id"), value_set=pa.array(convs))
            )
            p = str(tmp_path / f"w{i}.parquet")
            pq.write_table(w, p)
            paths.append(p)
        all_dir = tmp_path / "all"
        all_dir.mkdir()
        pq.write_table(tiny_corpus, str(all_dir / "all.parquet"))

        out = str(tmp_path / "mw")
        run_flagship(paths[0], out, salt_chunk=25, n_parts=8)
        s1 = ingest_append(paths[1], out, mode="cow")
        s2 = ingest_append(paths[2], out, mode="mor")
        assert s1["rows_appended"] > 0 and s2["rows_appended"] > 0

        ref = str(tmp_path / "mwref")
        run_flagship(str(all_dir), ref, salt_chunk=25, n_parts=8)
        pd.testing.assert_frame_equal(_read_all(out), _read_all(ref))

        man = Manifest(os.path.join(out, "_manifest"))
        assert sum(man.read(p).rows for p in man.committed_parts()) == len(_read_all(out))


class TestTombstones:
    def test_delete_survives_redelivery(self, tiny_corpus, tmp_path):
        """Right-to-be-forgotten outlives reprocessing: after a delete,
        a later ingest wave that re-delivers the conversation must drop
        its rows before the merge (both cow and mor modes)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.pipelines.flagship import (
            delete_conversations,
            ingest_append,
        )

        uniq = sorted(set(tiny_corpus.column("conv_id").to_pylist()))
        victim = uniq[0]
        pq.write_table(tiny_corpus, str(tmp_path / "base.parquet"))
        redeliver = tiny_corpus.filter(
            pc.is_in(tiny_corpus.column("conv_id"), value_set=pa.array([victim, uniq[1]]))
        )
        pq.write_table(redeliver, str(tmp_path / "redeliver.parquet"))

        for mode in ("cow", "mor"):
            out = str(tmp_path / f"tomb_{mode}")
            run_flagship(str(tmp_path / "base.parquet"), out, salt_chunk=25, n_parts=8)
            d = delete_conversations(out, [victim])
            assert d["rows_deleted"] > 0
            s = ingest_append(
                str(tmp_path / "redeliver.parquet"), out, wave_id=f"re-{mode}", mode=mode
            )
            assert s["rows_tombstoned"] > 0
            assert s["rows_appended"] == 0  # uniq[1] rows all dedup, victim rows tombstoned
            got = _read_all(out)
            assert not (got["conv_id"] == victim).any()
            # ledger recorded for future waves
            import json as _json

            tombs = _json.load(open(os.path.join(out, "_manifest", "tombstones.json")))
            assert tombs == [victim]
            man = Manifest(os.path.join(out, "_manifest"))
            assert sum(man.read(p).rows for p in man.committed_parts()) == len(got)
