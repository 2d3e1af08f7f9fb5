"""Golden-file tests (SURVEY.md §5.3): frozen tiny corpus + frozen
expected output, committed to the repo. Guards against accidental
semantic drift in ANY extractor — if a change to core/ alters a single
extracted character, these fail."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from bank_statement_pdf_parser_ray.oracle import oracle_extract, oracle_validate

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


class TestGolden:
    def test_generator_frozen(self):
        from bank_statement_pdf_parser_ray.sources.corpus import gen_corpus

        regen = gen_corpus(8, seed=123, mega_turns=0)
        frozen = pq.read_table(os.path.join(GOLDEN, "input_seed123.parquet"))
        assert regen.equals(frozen), "corpus generator output drifted from frozen fixture"

    def test_oracle_frozen(self):
        frozen_in = pq.read_table(os.path.join(GOLDEN, "input_seed123.parquet"))
        frozen_exp = pq.read_table(os.path.join(GOLDEN, "expected_seed123.parquet"))
        now = oracle_extract(frozen_in)
        rep = oracle_validate(frozen_exp, now)
        assert rep["pass"], f"extractor semantics drifted: {rep}"
        assert rep["text_equality_rate"] == 1.0

    def test_pipeline_matches_frozen(self):
        import ray.data

        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship
        from bank_statement_pdf_parser_ray.schema import OUTPUT_SCHEMA

        frozen_in = pq.read_table(os.path.join(GOLDEN, "input_seed123.parquet"))
        frozen_exp = pq.read_table(os.path.join(GOLDEN, "expected_seed123.parquet"))
        ds = run_flagship(ray.data.from_arrow(frozen_in), salt_chunk=25, n_parts=4)
        import pyarrow as pa

        df = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        actual = pa.Table.from_pandas(df, preserve_index=False).select(OUTPUT_SCHEMA.names)
        rep = oracle_validate(frozen_exp, actual)
        assert rep["pass"], rep
