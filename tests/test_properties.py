"""Property-based tests (hypothesis) for the pure core — the invariants
that make per-turn text equality survive distribution (SURVEY.md §5.4)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bank_statement_pdf_parser_ray.core.extract import extract_payload
from bank_statement_pdf_parser_ray.core.fields import amount_cents, parse_amount
from bank_statement_pdf_parser_ray.core.hashing import stable_hash64
from bank_statement_pdf_parser_ray.core.normalize import collapse_ws, normalize_text

text_st = st.text(max_size=400)


class TestNormalizeProperties:
    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, s):
        assert normalize_text(normalize_text(s)) == normalize_text(s)

    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_collapse_idempotent(self, s):
        assert collapse_ws(collapse_ws(s)) == collapse_ws(s)

    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_no_leading_trailing_ws(self, s):
        out = normalize_text(s)
        assert out == out.strip()
        assert "  " not in out.replace("\n", " ") or "  " not in out


class TestExtractorTotality:
    @given(text_st)
    @settings(max_examples=150, deadline=None)
    def test_never_raises_and_deterministic(self, s):
        a = extract_payload(s)
        b = extract_payload(s)
        assert a == b
        assert a["content_kind"] in ("plain", "html", "pdf_layout")
        assert isinstance(a["extracted_text"], str)


class TestAmountProperties:
    @given(st.integers(min_value=-10**9, max_value=10**9))
    @settings(max_examples=200, deadline=None)
    def test_cents_roundtrip(self, cents):
        neg = cents < 0
        c = abs(cents)
        s = f"{'-' if neg else ''}{c // 100}.{c % 100:02d}"
        assert amount_cents(parse_amount(s)) == cents

    @given(st.integers(min_value=0, max_value=10**9))
    @settings(max_examples=100, deadline=None)
    def test_comma_grouping_ignored(self, c):
        plain = f"{c // 100}.{c % 100:02d}"
        grouped = f"{c // 100:,}.{c % 100:02d}"
        assert parse_amount(plain) == parse_amount(grouped)


class TestHashProperties:
    @given(st.text(max_size=100), st.text(max_size=100))
    @settings(max_examples=200, deadline=None)
    def test_int64_range_and_injective_ish(self, a, b):
        ha, hb = stable_hash64(a), stable_hash64(b)
        assert 0 <= ha < 2**63
        if a != b:
            assert ha != hb  # 63-bit collisions effectively impossible here


class TestQuarantine:
    def test_split(self, tiny_corpus):
        import ray.data

        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship
        from bank_statement_pdf_parser_ray.stages.order import split_quarantine

        ds = run_flagship(ray.data.from_arrow(tiny_corpus), salt_chunk=50, n_parts=4)
        ok, bad = split_quarantine(ds)
        n_ok, n_bad = ok.count(), bad.count()
        assert n_bad == 0  # clean corpus
        assert n_ok > 0


class TestOracleTokenizerParity:
    """The SQL oracles tokenize with DuckDB trim()+RE2; the engine's
    _shingle_words / BPE regex must agree on ARBITRARY text, not just
    the ASCII fixtures (round-2 review finding)."""

    @given(st.text(max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_shingle_words_match_duckdb(self, s):
        import duckdb

        from bank_statement_pdf_parser_ray.pipelines.datapipe import _shingle_words

        if "\x00" in s:  # NUL is not representable in a SQL literal
            return
        con = duckdb.connect()
        sql_words = con.execute(
            r"SELECT regexp_split_to_array(trim(?), '\s+')", [s]
        ).fetchone()[0]
        con.close()
        assert _shingle_words(s) == sql_words

    @given(st.text(max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_bpe_count_matches_duckdb(self, s):
        import duckdb

        from bank_statement_pdf_parser_ray.pipelines.datapipe import _BPE_ISH_RX

        if "\x00" in s:
            return
        con = duckdb.connect()
        n_sql = con.execute(
            r"SELECT len(regexp_extract_all(?, '[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]'))", [s]
        ).fetchone()[0]
        con.close()
        assert len(_BPE_ISH_RX.findall(s)) == n_sql


class TestXlsxProperties:
    @given(
        st.lists(
            st.lists(
                st.one_of(
                    st.integers(min_value=-(2**40), max_value=2**40),
                    st.text(max_size=40).filter(lambda s: "\x00" not in s),
                    st.booleans(),
                ),
                min_size=2,
                max_size=2,
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, rows):
        import tempfile

        from bank_statement_pdf_parser_ray.sources.xlsx import read_xlsx, write_xlsx

        with tempfile.TemporaryDirectory() as d:
            p = write_xlsx(f"{d}/t.xlsx", ["a", "b"], rows)
            header, got = read_xlsx(p)
        assert header == ["a", "b"]
        assert got == rows


class TestNormalizeWsOracleParity:
    @given(st.text(max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_matches_duckdb(self, s):
        """normalize_ws engine kernels (RE2 \\s+ collapse + Zs trim)
        must equal the oracle's trim(regexp_replace(text,'\\s+',' ','g'))
        on arbitrary text."""
        import duckdb
        import pyarrow as pa
        import pyarrow.compute as pc

        from bank_statement_pdf_parser_ray.pipelines.datapipe import _DUCKDB_TRIM_CHARS

        if "\x00" in s:
            return
        eng = pc.utf8_trim(
            pc.replace_substring_regex(pa.array([s]), pattern=r"\s+", replacement=" "),
            characters=_DUCKDB_TRIM_CHARS,
        )[0].as_py()
        con = duckdb.connect()
        sql = con.execute(r"SELECT trim(regexp_replace(?, '\s+', ' ', 'g'))", [s]).fetchone()[0]
        con.close()
        assert eng == sql


class TestTokenCountOracleParity:
    @given(st.text(max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_matches_duckdb(self, s):
        """token_count's Arrow RE2 kernel must equal the oracle's
        len(regexp_extract_all(text,'\\S+')) on arbitrary text."""
        import duckdb
        import pyarrow as pa
        import pyarrow.compute as pc

        if "\x00" in s:
            return
        eng = pc.count_substring_regex(pa.array([s]), pattern=r"\S+")[0].as_py()
        con = duckdb.connect()
        sql = con.execute(r"SELECT len(regexp_extract_all(?, '\S+'))", [s]).fetchone()[0]
        con.close()
        assert eng == sql
