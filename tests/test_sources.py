"""Transcript source normalization (S3 variants)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from bank_statement_pdf_parser_ray.sources.transcripts import SchemaError, read_transcripts


class TestReadTranscripts:
    def test_jsonl_source(self, tmp_path):
        p = tmp_path / "turns.jsonl"
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello  world", "tool": "", "ts": 1_704_067_200_000_000},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi", "tool": "", "ts": 1_704_067_260_000_000},
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows))
        ds = read_transcripts(str(p), fmt="json")
        t = ds.take_all()
        assert len(t) == 2
        assert t[0]["conv_id"] == "c1"

    def test_missing_optional_columns_defaulted(self):
        raw = pa.table({"conv_id": ["a"], "turn_idx": [0], "text": ["x"]})
        out = read_transcripts(raw).take_all()
        assert out[0]["role"] == "" and out[0]["tool"] == ""

    def test_missing_required_raises(self):
        raw = pa.table({"conv_id": ["a"], "text": ["x"]})
        with pytest.raises(Exception) as ei:
            read_transcripts(raw).take_all()
        assert "turn_idx" in str(ei.value)

    def test_null_text_becomes_empty(self):
        raw = pa.table(
            {"conv_id": ["a", "a"], "turn_idx": [0, 1], "text": pa.array(["x", None], pa.string())}
        )
        out = read_transcripts(raw).take_all()
        assert out[1]["text"] == ""

    def test_csv_source(self, tmp_path):
        p = tmp_path / "turns.csv"
        p.write_text(
            "conv_id,turn_idx,role,text,tool,ts\n"
            "c1,0,user,hello world,,1704067200000000\n"
            "c1,1,assistant,hi there,,1704067260000000\n"
        )
        out = read_transcripts(str(p), fmt="csv").take_all()
        assert len(out) == 2
        # take_all block order is not guaranteed (preserve_order=False):
        # address rows by turn_idx, not position
        by_idx = {r["turn_idx"]: r for r in out}
        assert by_idx[0]["conv_id"] == "c1" and by_idx[0]["text"] == "hello world"
        assert str(by_idx[0]["ts"]).startswith("2024-01-01")

    def test_null_key_with_duplicates_dedups(self):
        """Regression: a reduce group holding a null conv_id row PLUS a
        real replayed duplicate crashed the vectorized dedup (Kleene
        null equality -> object-dtype keep mask -> IndexError in take);
        replayed null-conv fragments must also dedup like any other."""
        import ray.data

        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship

        raw = pa.table(
            {
                "conv_id": pa.array(["a", "a", None, None, "a"], pa.string()),
                "turn_idx": pa.array([0, 0, 2, 2, 1], pa.int32()),
                "role": ["user"] * 5,
                "text": ["dup", "dup", "null-dup", "null-dup", "fine"],
                "tool": [""] * 5,
                "ts": pa.array([0] * 5, pa.timestamp("us")),
            }
        )
        out = run_flagship(ray.data.from_arrow(raw), salt_chunk=10, n_parts=1).to_pandas()
        assert len(out) == 3  # (a,0), (a,1), (null,2) — both dup pairs collapsed
        assert out["conv_id"].isna().sum() == 1

    def test_flagship_survives_null_key_and_text(self):
        """Direct-parquet path (no normalizing reader): a null conv_id
        or null text row must flow through keys/extract/order/row-hash
        without killing the job, preserving the null in the output."""
        import ray.data

        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship

        raw = pa.table(
            {
                "conv_id": pa.array(["a", None, "b"], pa.string()),
                "turn_idx": pa.array([0, 0, 0], pa.int32()),
                "role": ["user"] * 3,
                "text": pa.array(["hi", "there", None], pa.string()),
                "tool": [""] * 3,
                "ts": pa.array([0] * 3, pa.timestamp("us")),
            }
        )
        out = run_flagship(ray.data.from_arrow(raw), salt_chunk=10, n_parts=2).to_pandas()
        assert len(out) == 3
        assert (out["error"] == "").all()
        assert out["conv_id"].isna().sum() == 1

    def test_pipeline_runs_on_normalized_source(self, tmp_path):
        import json as _json

        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship

        p = tmp_path / "turns.jsonl"
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "text": "some  plain\ttext"},
            {"conv_id": "c1", "turn_idx": 1, "text": "<html><body><div><p>real content here</p></div><nav><a href=x>n</a></nav></body></html>"},
        ]
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        ds = run_flagship(read_transcripts(str(p), fmt="json"), salt_chunk=100, n_parts=2)
        df = ds.to_pandas().sort_values("turn_idx")
        assert df["extracted_text"].tolist()[0] == "some plain text"
        assert "real content here" in df["extracted_text"].tolist()[1]


class TestTsCoercion:
    def _mk(self, ts_col):
        return pa.table({"conv_id": ["a"], "turn_idx": [0], "text": ["x"], "ts": ts_col})

    def test_iso_with_z_and_fraction(self):
        out = read_transcripts(self._mk(pa.array(["2024-01-01T00:00:00.250Z"]))).take_all()
        assert out[0]["ts"] is not None

    def test_float_epoch_us(self):
        out = read_transcripts(self._mk(pa.array([1_704_067_200_000_000.0]))).take_all()
        assert str(out[0]["ts"]).startswith("2024-01-01")

    def test_all_null_ts_column(self):
        out = read_transcripts(self._mk(pa.nulls(1))).take_all()
        assert out[0]["ts"] is not None  # defaulted to epoch 0

    def test_null_key_raises(self):
        raw = pa.table({"conv_id": pa.array([None], pa.string()), "turn_idx": [0], "text": ["x"]})
        with pytest.raises(Exception) as ei:
            read_transcripts(raw).take_all()
        assert "conv_id" in str(ei.value)


class TestSchemaEvolution:
    """A shard directory written by producers over time: older files
    missing optional columns, ``ts`` as epoch int64 vs timestamp[us].
    The parquet path must group fragments by footer schema, prune the
    projection per group, and union to one canonical Dataset."""

    def _write_mixed(self, tmp_path):
        import pyarrow.parquet as pq

        d = tmp_path / "shards"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "conv_id": ["a"] * 3,
                    "turn_idx": pa.array([0, 1, 2], pa.int32()),
                    "text": ["x", "y", "z"],
                    "ts": pa.array([1, 2, 3], pa.int64()),  # epoch micros, no role/tool
                }
            ),
            str(d / "old.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "conv_id": ["b"] * 2,
                    "turn_idx": pa.array([0, 1], pa.int32()),
                    "role": ["user", "assistant"],
                    "text": ["p", "q"],
                    "tool": ["", ""],
                    "ts": pa.array([4, 5], pa.timestamp("us")),
                    "extra_col": [1.5, 2.5],  # unknown column: pruned, not fatal
                }
            ),
            str(d / "new.parquet"),
        )
        return str(d)

    def test_mixed_schema_dir_unifies(self, tmp_path):
        d = self._write_mixed(tmp_path)
        df = read_transcripts(d).to_pandas().sort_values(["conv_id", "turn_idx"])
        assert len(df) == 5
        assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        assert df["role"].tolist() == ["", "", "", "user", "assistant"]
        assert str(df["ts"].dtype) == "datetime64[us]"
        # int64 epoch micros coerced identically to native timestamps
        assert df["ts"].astype("int64").tolist() == [1, 2, 3, 4, 5]

    def test_mixed_schema_flagship_end_to_end(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship

        d = self._write_mixed(tmp_path)
        ds = run_flagship(read_transcripts(d), salt_chunk=10, n_parts=2)
        df = ds.to_pandas()
        assert len(df) == 5
        assert sorted(df["extracted_text"]) == ["p", "q", "x", "y", "z"]

    def test_uniformly_narrow_dir(self, tmp_path):
        """ALL files missing an optional column (the old code's
        columns=INPUT_COLUMNS projection failed here too)."""
        import pyarrow.parquet as pq

        d = tmp_path / "narrow"
        d.mkdir()
        pq.write_table(
            pa.table({"conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()), "text": ["w"]}),
            str(d / "only.parquet"),
        )
        out = read_transcripts(str(d)).take_all()
        assert out[0]["tool"] == "" and out[0]["role"] == ""

    def test_missing_required_still_raises(self, tmp_path):
        import pyarrow.parquet as pq

        d = tmp_path / "bad"
        d.mkdir()
        pq.write_table(pa.table({"conv_id": ["a"], "text": ["x"]}), str(d / "f.parquet"))
        with pytest.raises(Exception) as ei:
            read_transcripts(str(d)).take_all()
        assert "turn_idx" in str(ei.value)
