"""Distributed pipeline == sequential oracle (the correctness gate:
per-turn text equality under stable turn ordering, BASELINE.json)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from bank_statement_pdf_parser_ray.oracle import oracle_validate
from bank_statement_pdf_parser_ray.pipelines.flagship import build_extracted, run_flagship
from bank_statement_pdf_parser_ray.schema import OUTPUT_SCHEMA


def _collect_sorted(ds) -> pa.Table:
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False).select(OUTPUT_SCHEMA.names)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory, tiny_corpus):
    p = tmp_path_factory.mktemp("corpus") / "tiny.parquet"
    pq.write_table(tiny_corpus, str(p))
    return str(p)


class TestFlagship:
    def test_equals_oracle(self, corpus_path, tiny_expected):
        # salt_chunk=25 forces the 120-turn mega conv across >=5 reducers
        ds = run_flagship(corpus_path, salt_chunk=25, n_parts=8)
        actual = _collect_sorted(ds)
        rep = oracle_validate(tiny_expected, actual)
        assert rep["pass"], rep
        assert rep["text_equality_rate"] == 1.0

    def test_from_dataset_source(self, tiny_corpus, tiny_expected):
        ds_in = ray.data.from_arrow(tiny_corpus)
        ds = run_flagship(ds_in, salt_chunk=25, n_parts=8)
        actual = _collect_sorted(ds)
        rep = oracle_validate(tiny_expected, actual)
        assert rep["pass"], rep

    def test_salting_spreads_mega_conv(self, corpus_path):
        ds = build_extracted(corpus_path, salt_chunk=25, n_parts=8)
        df = ds.to_pandas()
        mega = df[df["conv_id"] == "conv-00000000"]
        assert len(mega) == 120  # deduped
        # within every salted chunk the turn ranges are disjoint by construction
        assert sorted(mega["turn_idx"].tolist()) == list(range(120))

    def test_output_schema_stable(self, corpus_path):
        ds = run_flagship(corpus_path, salt_chunk=25, n_parts=8)
        got = {f.name for f in OUTPUT_SCHEMA} | {"row_h"}
        assert set(ds.schema().names) == got
