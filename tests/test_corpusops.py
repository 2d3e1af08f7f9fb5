"""Planted-fixture tests for the corpus-hygiene operators
(pipelines/corpusops.py): passage-level global dedup, Gopher quality
gates, BM25 search. The randomized DuckDB parity fuzz
(TestRandomizedDocsOracleParity below) covers messy-text composition
across 34 docs-table oracle pairs; these pin the SEMANTICS on corpora
where the expected answer is known by construction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bank_statement_pdf_parser_ray.pipelines import corpusops as co


def _write_docs(tmp_path, texts):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([0 if s is None else len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


BOILER = " ".join(f"b{i}" for i in range(co.PASSAGE_WORDS))  # one exact 10-word passage


class TestPassageDedup:
    def test_repeated_passage_stripped_everywhere(self, tmp_path):
        uniq0 = " ".join(f"u{i}" for i in range(co.PASSAGE_WORDS))
        uniq1 = " ".join(f"v{i}" for i in range(co.PASSAGE_WORDS))
        d = _write_docs(
            tmp_path,
            [
                f"{BOILER} {uniq0}",  # boilerplate + unique tail
                f"{uniq1} {BOILER}",  # unique head + boilerplate
                "short one off doc",  # single partial passage, unique
            ],
        )
        out = co.passage_dedup(d).to_pandas().set_index("doc_id")["clean_text"]
        assert out[0] == uniq0
        assert out[1] == uniq1
        assert out[2] == "short one off doc"

    def test_all_boilerplate_doc_emits_no_row(self, tmp_path):
        d = _write_docs(tmp_path, [BOILER, BOILER, "keep me here today"])
        out = co.passage_dedup(d).to_pandas()
        assert out["doc_id"].tolist() == [2]

    def test_within_doc_repeat_is_not_boilerplate(self, tmp_path):
        # the frequency count is over DISTINCT docs: a passage repeated
        # twice inside ONE doc must survive
        d = _write_docs(tmp_path, [f"{BOILER} {BOILER}", "other text entirely here now"])
        out = co.passage_dedup(d).to_pandas().set_index("doc_id")["clean_text"]
        assert out[0] == f"{BOILER} {BOILER}"

    def test_null_and_empty_docs_drop(self, tmp_path):
        d = _write_docs(tmp_path, [None, "", "   \t  ", "real words in this document"])
        out = co.passage_dedup(d).to_pandas()
        assert out["doc_id"].tolist() == [3]


class TestGopherQuality:
    def test_verdicts_by_construction(self, tmp_path):
        good = "the quick brown fox jumps over a lazy dog in the warm park today"
        too_short = "the cat"  # n_words < 10
        no_alpha = " ".join(["123"] * 12)  # frac_alpha = 0 (also no stopword)
        low_unique = "the " + " ".join(["word"] * 19)  # frac_unique = 2/20 < 0.2... == 0.1
        d = _write_docs(tmp_path, [good, too_short, no_alpha, low_unique])
        out = co.gopher_quality(d).to_pandas().set_index("doc_id")
        assert out.loc[0, "keep"] == 1
        assert out.loc[1, "keep"] == 0 and out.loc[1, "n_words"] == 2
        assert out.loc[2, "keep"] == 0 and out.loc[2, "frac_alpha"] == 0.0
        assert out.loc[3, "keep"] == 0 and out.loc[3, "frac_unique"] == pytest.approx(0.1)

    def test_metrics_values(self, tmp_path):
        d = _write_docs(tmp_path, ["aa bbb the aa"])
        out = co.gopher_quality(d).to_pandas().iloc[0]
        assert out["n_words"] == 4
        assert out["mean_word_len"] == pytest.approx((2 + 3 + 3 + 2) / 4)
        assert out["frac_unique"] == pytest.approx(3 / 4)
        assert out["n_stop"] == 1


class TestBM25:
    def test_more_hits_rank_higher(self, tmp_path):
        filler = "alpha beta gamma delta epsilon zeta eta theta"
        d = _write_docs(
            tmp_path,
            [
                f"customer customer customer {filler}",
                f"customer {filler}",
                f"{filler} nothing relevant here",
                f"window spark {filler}",
            ],
        )
        out = co.bm25_search(d)
        ids = out["doc_id"].tolist()
        assert 2 not in ids  # zero-hit docs never emitted
        assert ids.index(0) < ids.index(1)  # same term, higher tf ranks higher
        # doc 3 matches two rarer (higher-idf) terms -> outranks the
        # single-common-term docs
        assert ids[0] == 3

    def test_absent_terms_and_empty_corpus(self, tmp_path):
        d = _write_docs(tmp_path, ["no query words here at all", None])
        out = co.bm25_search(d)
        assert len(out) == 0


class TestBuildIndex:
    def test_postings_and_df(self, tmp_path):
        d = _write_docs(
            tmp_path,
            [
                "apple banana apple",  # doc 0: apple dupes collapse to one posting
                "banana cherry",  # doc 1
                "apple",  # doc 2
            ],
        )
        out = co.build_index(d).to_pandas().set_index("word")
        assert out.loc["apple", "df"] == 2
        assert out.loc["apple", "postings_head"] == "0,2"
        assert out.loc["banana", "df"] == 2
        assert out.loc["banana", "postings_head"] == "0,1"
        assert out.loc["cherry", "df"] == 1
        assert out.loc["cherry", "postings_head"] == "1"

    def test_head_is_capped(self, tmp_path):
        d = _write_docs(tmp_path, ["common"] * 30)
        out = co.build_index(d).to_pandas().set_index("word")
        assert out.loc["common", "df"] == 30
        assert out.loc["common", "postings_head"] == ",".join(str(i) for i in range(co.INDEX_HEAD))


class TestDupCharWindows:
    def test_shared_block_counted_per_doc(self, tmp_path):
        shared = "S" * 35 + "TAIL!" + "0123456789" * 4  # 80 chars = 2 full windows
        d = _write_docs(
            tmp_path,
            [
                shared + " unique tail for doc zero padded out to more",
                shared + " another unique ending for document number 1",
                "tiny",  # < 40 chars: no full window, no output row
            ],
        )
        out = co.dup_char_windows(d).to_pandas().set_index("doc_id").sort_index()
        assert 2 not in out.index
        assert out.loc[0, "dup_windows"] == 2
        assert out.loc[1, "dup_windows"] == 2
        assert out.loc[0, "total_windows"] == len(shared + " unique tail for doc zero padded out to more") // 40

    def test_within_doc_repeat_is_not_dup(self, tmp_path):
        win = "R" * 40
        d = _write_docs(tmp_path, [win + win, "completely unrelated text that is long enough to window"])
        out = co.dup_char_windows(d).to_pandas().set_index("doc_id")
        # the repeated window occurs in ONE distinct doc only
        assert out.loc[0, "total_windows"] == 2
        assert out.loc[0, "dup_windows"] == 0

    def test_null_text_skipped(self, tmp_path):
        d = _write_docs(tmp_path, [None, "x" * 45])
        out = co.dup_char_windows(d).to_pandas()
        assert out["doc_id"].tolist() == [1]
        assert out["total_windows"].tolist() == [1]


class TestExactSubstrDedup:
    def test_shared_prefix_removed_tails_survive(self, tmp_path):
        shared = "S" * 35 + "TAIL!" + "0123456789" * 4  # 80 chars = 2 full windows
        t0 = " unique tail for doc zero padded out to more"  # 44 chars: 1 window + 4-char tail
        t1 = " another unique ending for document no 1"  # 40 chars: exactly 1 window
        d = _write_docs(tmp_path, [shared + t0, shared + t1, "tiny"])
        out = co.exact_substr_dedup(d).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "clean_text"] == t0
        assert out.loc[1, "clean_text"] == t1
        assert out.loc[0, "removed_chars"] == 80
        assert out.loc[1, "removed_chars"] == 80
        # sub-window doc passes through untouched (its text is all tail)
        assert out.loc[2, "clean_text"] == "tiny"
        assert out.loc[2, "removed_chars"] == 0

    def test_within_doc_repeat_survives(self, tmp_path):
        win = "R" * 40
        d = _write_docs(tmp_path, [win + win, "completely unrelated text that is long enough to window"])
        out = co.exact_substr_dedup(d).to_pandas().set_index("doc_id")
        # repeated window occurs in ONE distinct doc only -> kept
        assert out.loc[0, "clean_text"] == win + win

    def test_null_text_excluded(self, tmp_path):
        d = _write_docs(tmp_path, [None, "x" * 45])
        out = co.exact_substr_dedup(d).to_pandas()
        assert out["doc_id"].tolist() == [1]
        assert out["clean_text"].tolist() == ["x" * 45]
        assert out["removed_chars"].tolist() == [0]

    def test_sharded_probe_matches_broadcast(self, tmp_path):
        """budget=0 forces the over-budget path: the hot set never
        reaches the driver, membership is answered by the hash-sharded
        WindowSetShard pool — output must be IDENTICAL to the broadcast
        path on a corpus mixing shared prefixes, within-doc repeats,
        multibyte text, and sub-window docs."""
        rng = np.random.default_rng(11)
        shared = ["«π-prefix»" * 6, "Z" * 40, "common middle section padded to width!!!"]
        texts = []
        for i in range(30):
            body = "".join(rng.choice(shared, size=rng.integers(0, 3)))
            texts.append(body + f" unique suffix {i} " + "x" * int(rng.integers(0, 60)))
        texts += [None, "tiny", shared[1] + shared[1]]
        d = _write_docs(tmp_path, texts)
        want = (
            co.exact_substr_dedup(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = (
            co.exact_substr_dedup(d, broadcast_budget_bytes=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        wantc = co.dup_char_windows(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        gotc = (
            co.dup_char_windows(d, broadcast_budget_bytes=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(gotc, wantc)


class TestEpochPlan:
    def test_slots_and_epoch_independence(self, tmp_path):
        d = _write_docs(tmp_path, [f"doc number {i}" for i in range(97)])
        out = co.epoch_plan(d, epochs=2, batch_size=10).to_pandas()
        assert len(out) == 2 * 97
        for ep, grp in out.groupby("epoch"):
            # every doc exactly once per epoch
            assert sorted(grp["doc_id"]) == list(range(97))
            # slots are a bijection onto rank 0..96
            rk = (grp["step"] * 10 + grp["pos"]).sort_values().tolist()
            assert rk == list(range(97))
            # full batches of 10, ragged tail of 7
            sizes = grp.groupby("step").size()
            assert sizes.iloc[:-1].eq(10).all() and sizes.iloc[-1] == 7
        # the two epochs are DIFFERENT permutations (fresh shuffle per epoch)
        p0 = out[out.epoch == 0].sort_values("doc_id")[["step", "pos"]].values.tolist()
        p1 = out[out.epoch == 1].sort_values("doc_id")[["step", "pos"]].values.tolist()
        assert p0 != p1

    def test_deterministic_across_runs(self, tmp_path):
        d = _write_docs(tmp_path, [f"doc {i}" for i in range(31)])
        a = co.epoch_plan(d, epochs=2, batch_size=8).to_pandas().sort_values(["epoch", "doc_id"])
        b = co.epoch_plan(d, epochs=2, batch_size=8).to_pandas().sort_values(["epoch", "doc_id"])
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


class TestShuffleRank:
    def test_permutation_and_determinism(self, tmp_path):
        d = _write_docs(tmp_path, [f"doc number {i}" for i in range(97)])
        a = co.shuffle_rank(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = co.shuffle_rank(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert sorted(a["shuffle_rank"].tolist()) == list(range(1, 98))
        assert a.equals(b)  # deterministic across runs
        # seeded: a different seed produces a different permutation
        c = co.shuffle_rank(d, seed=7).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert not a["shuffle_rank"].equals(c["shuffle_rank"])


class TestFuzzyPairs:
    def test_planted_pairs(self, tmp_path):
        texts = [
            "hello world this is a long document",   # 0
            "hello worXd this is a long document",   # 1: 1 sub within prefix -> pair with 0
            "hello completely different text here",  # 2: same block, prefix too far
            "howdy world this is a long document",   # 3: block differs -> never compared
            None,                                    # null text excluded
        ]
        sf = _write_docs(tmp_path, texts)
        out = co.fuzzy_pairs(sf).to_pandas()
        got = {(r.doc_a, r.doc_b): r.dist for r in out.itertuples()}
        assert got == {(0, 1): 1}

    def test_matches_duckdb_on_unicode(self, tmp_path):
        """Byte-based distance + codepoint substr, on multibyte text —
        the semantics pair measured against DuckDB directly."""
        import duckdb

        rng = np.random.default_rng(17)
        alpha = list("ab ") + ["é", "中"]
        base = ["abé中" + "".join(rng.choice(alpha, 26)) for _ in range(12)]
        texts = []
        for s in base:  # each base plus 4 perturbed copies at growing edit radius
            texts.append(s)
            for k in (1, 2, 3, 6):
                chars = list(s)
                for pos in rng.choice(np.arange(4, len(chars)), k, replace=False):
                    chars[int(pos)] = str(rng.choice(alpha))
                texts.append("".join(chars))
        sf = _write_docs(tmp_path, texts)
        got = (
            co.fuzzy_pairs(sf)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        exp = (
            con.sql(co.FUZZY_PAIRS_SQL)
            .df()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con.close()
        assert got.equals(exp.astype(got.dtypes.to_dict()))

    def test_identical_docs_distance_zero(self, tmp_path):
        texts = ["same prefix all the way through"] * 3
        sf = _write_docs(tmp_path, texts)
        out = co.fuzzy_pairs(sf).to_pandas()
        assert len(out) == 3  # C(3,2) pairs
        assert (out["dist"] == 0).all()


class TestHybridSearch:
    def test_rrf_fuses_both_branches(self, tmp_path):
        """A doc ranked by BOTH branches must outscore docs of equal
        single-branch rank; ranks are carried through; ties broken by
        doc_id."""
        import pyarrow.parquet as pq

        texts = [
            "customer spark window customer spark window",  # doc 0: lexical hit
            "customer spark data window query",             # doc 1: lexical hit
            "nothing relevant here at all",                 # doc 2
            "pure filler text body",                        # doc 3
        ]
        sf = _write_docs(tmp_path, texts)
        rng = np.random.default_rng(8)
        vecs = rng.normal(size=(4, 8)).astype(np.float32)
        vecs[1] = vecs[0] + 0.01 * rng.normal(size=8).astype(np.float32)  # knn favors 1
        emb = pa.table(
            {
                "vec_id": pa.array(np.arange(4), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 4, pa.int32()),
            }
        )
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        out = co.hybrid_search(sf, query_vec_id=0, k=3)
        assert out["doc_id"].tolist()[0] == 1  # in both lists -> fused to the top
        row1 = out[out["doc_id"] == 1].iloc[0]
        assert row1["bm25_rank"] > 0 and row1["knn_rank"] > 0
        # every fused score equals the RRF arithmetic of its carried ranks
        for _, r in out.iterrows():
            s = 0.0
            if r["bm25_rank"]:
                s += 1.0 / (60 + r["bm25_rank"])
            if r["knn_rank"]:
                s += 1.0 / (60 + r["knn_rank"])
            assert abs(r["rrf_score"] - round(s, 9)) < 1e-12


class TestC4Filters:
    def test_verdicts_by_construction(self, tmp_path):
        good = "\n".join(
            [f"This line number {i} has plenty of words and ends well." for i in range(4)]
        )
        too_few_kept = "One good line that is long enough to pass here.\nshort line\nno punct at all here"
        braces = good + "\nfunction f() { return 1; }"
        lorem = good + "\nSome Lorem Ipsum filler text sits right here."
        short_lines = "tiny.\nwee!\nhm?\nok."  # end in punct but < 5 words
        sf = _write_docs(tmp_path, [good, too_few_kept, braces, lorem, short_lines, None])
        out = co.c4_filters(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "keep"] == 1 and out.loc[0, "n_kept"] == 4
        assert out.loc[1, "keep"] == 0 and out.loc[1, "n_kept"] == 1
        assert out.loc[2, "keep"] == 0  # '{' page ban
        assert out.loc[3, "keep"] == 0  # lorem ipsum ban
        assert out.loc[4, "keep"] == 0 and out.loc[4, "n_kept"] == 0
        assert 5 not in out.index  # NULL text dropped
        # cleaned text keeps only retained lines, in order
        assert out.loc[1, "clean_text"] == "One good line that is long enough to pass here."
        assert pd.isna(out.loc[4, "clean_text"])  # zero retained -> NULL, like the oracle

    def test_matches_duckdb_on_multiline(self, tmp_path):
        """The sf documents are single-line, so the line-level semantics
        pair is pinned here on a messy multi-line fixture instead."""
        import duckdb

        rng = np.random.default_rng(5)
        words = ["alpha", "beta", "it", "the", "x", "word", "{brace}", "lorem", "ipsum"]
        ends = [".", "!", "?", '"', "'", "", " ", ":"]
        texts = []
        for _ in range(40):
            lines = [
                " ".join(rng.choice(words, rng.integers(0, 9))) + str(rng.choice(ends))
                for _ in range(rng.integers(1, 8))
            ]
            texts.append("\n".join(lines))
        texts += ["", "   ", None, "one.\n\n\ntwo lines with blanks in between here."]
        sf = _write_docs(tmp_path, texts)
        got = co.c4_filters(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        exp = con.sql(co.C4_FILTERS_SQL).df().sort_values("doc_id").reset_index(drop=True)
        con.close()
        for c in ("n_lines", "n_kept", "keep"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert (
            got["clean_text"].fillna("\0").tolist() == exp["clean_text"].fillna("\0").tolist()
        )


class TestExtractLinks:
    """links_histogram vs a pure-Python re reference on HTML with
    absolute/relative/multi-link/duplicate/no-link payloads."""

    PAYLOADS = [
        '<p><a href="/p/1">one</a> <a href="http://ex.com/a">two</a></p>',
        '<div><a href="http://ex.com/a">again</a><a href="http://ex.com/a">thrice</a></div>',
        "plain text, no links at all",
        '<a href="https://sub.ex.org/x?q=1">q</a> <a href="/p/1">rel</a>',
        "",
    ]

    def _src(self):
        import ray.data

        n = len(self.PAYLOADS)
        return ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": [f"c{i}" for i in range(n)],
                    "turn_idx": pa.array(range(n), pa.int32()),
                    "role": ["user"] * n,
                    "text": self.PAYLOADS,
                    "tool": [""] * n,
                    "ts": pa.array([0] * n, pa.timestamp("us")),
                }
            )
        )

    def test_matches_re_reference(self):
        import re
        from collections import defaultdict

        out = co.links_histogram(self._src())
        ref_links: dict[str, int] = defaultdict(int)
        ref_docs: dict[str, set] = defaultdict(set)
        for i, p in enumerate(self.PAYLOADS):
            for m in re.finditer(r'href="([^"]*)"', p):
                ref_links[m.group(1)] += 1
                ref_docs[m.group(1)].add(i)
        got = {r["href"]: (r["n_links"], r["n_docs"]) for _, r in out.iterrows()}
        assert got == {h: (n, len(ref_docs[h])) for h, n in ref_links.items()}
        # deterministic ordering: links desc, href asc
        assert out["href"].tolist() == sorted(out["href"], key=lambda h: (-got[h][0], h))

    def test_corpus_runs(self):
        import ray.data as rd

        from bank_statement_pdf_parser_ray.sources.corpus import gen_corpus

        out = co.links_histogram(rd.from_arrow(gen_corpus(30, seed=42, mega_turns=200)))
        assert len(out) > 0
        assert (out["n_links"] >= out["n_docs"]).all()

    def test_documents_query_matches_synthesis(self):
        out = co.extract_links("/root/testdata/sf0.001")
        assert len(out) > 0
        # every synthesized absolute href lands on one of the 7 hosts or /rel/
        assert out["href"].str.match(r"^(https://h[0-6]\.example\.org/p[0-2]|/rel/\d+)$").all()


class TestHostStats:
    """host_stats host lift + rollup vs a pure-Python urllib reference
    over planted absolute/relative/multi-host payloads."""

    def test_matches_urllib_reference(self):
        import re
        from collections import defaultdict
        from urllib.parse import urlparse

        import ray.data as rd

        payloads = [
            '<a href="http://a.com/x">1</a> <a href="http://a.com/y">2</a>',
            '<a href="https://b.org/p?q=1#f">3</a> <a href="/rel/1">4</a>',
            '<a href="http://a.com/x">dup</a> plain tail',
            '<a href="ftp://c.net">5</a> <a href="/rel/2">6</a> no more',
        ]
        n = len(payloads)
        src = rd.from_arrow(
            pa.table(
                {
                    "conv_id": [f"c{i}" for i in range(n)],
                    "text": payloads,
                }
            )
        )
        out = co.host_histogram(src, doc_col="conv_id")

        links = defaultdict(int)
        docs = defaultdict(set)
        paths = defaultdict(set)
        for i, p in enumerate(payloads):
            for m in re.finditer(r'href="([^"]*)"', p):
                href = m.group(1)
                host = urlparse(href).netloc if "://" in href else ""
                links[host] += 1
                docs[host].add(i)
                paths[host].add(href)
        got = {r["host"]: (r["n_links"], r["n_docs"], r["n_paths"]) for _, r in out.iterrows()}
        assert got == {h: (nl, len(docs[h]), len(paths[h])) for h, nl in links.items()}
        # ordering: links desc, host asc
        assert out["host"].tolist() == sorted(got, key=lambda h: (-got[h][0], h))

    def test_corpus_reconciles_with_links(self):
        hosts = co.host_stats("/root/testdata/sf0.001")
        links = co.extract_links("/root/testdata/sf0.001")
        assert hosts["n_links"].sum() == links["n_links"].sum()
        assert len(hosts) <= len(links)


class TestRandomizedDocsOracleParity:
    """Engine vs DuckDB over seeded RANDOM documents tables that are
    messier than the shared fixtures: NULL text, empty strings,
    whitespace-only docs, multibyte words, planted exact duplicates —
    the corpus sibling of test_windows' randomized events family.
    Round-4 catches: MinHashActor and ngram_jaccard_pairs crashed on
    NULL text; warc_ingest's oracle lacked the boilerplate strip's
    whitespace canon."""

    OPS = [
        "exact_dedup",
        "minhash_candidates",
        "dup_char_windows",
        "exact_substr_dedup",
        "passage_dedup",
        "gopher_quality",
        "c4_filters",
        "simhash",
        "doc_fingerprint",
        "langid",
        "quality_score",
        "token_count",
        "normalize_ws",
        "repetition_ratio",
        "pii_scrub",
        "hash_split",
        "decontaminate",
        "extract_links",
        "host_stats",
        "warc_ingest",
        "corpus_clean",
        "sample_documents",
        "fuzzy_pairs",
        "fuzzy_clusters",
        "ngram_jaccard_pairs",
        "tfidf_topterms",
        "unigram_logprob",
        "vocab_topk",
        "bm25_search",
        "chunk_documents",
        "source_cap",
        "leakage_safe_split",
        "shuffle_rank",
        "epoch_plan",
        # round-4 batch 2: the minhash composition chain, mixture/tier
        # engines and the cross-wave dedup index under the same dirt
        "dedup_clusters",
        "minhash_verified",
        "neardup_clean",
        "distinct_langs",
        "hybrid_search",
        "ingest_dedup",
        "perplexity_buckets",
        "temperature_mixture",
        # round-5: sketches converted to hard signals (MG deficit and
        # CM overcount bounds are theorems; cm_tight's collision slack
        # is ~6e-6 at this vocab/width); the deterministic bucketed pack
        "heavy_hitters_checked",
        "count_min_freq_checked",
        "pack_sequences_checked",
        "wave_ingest",
        # round-5 late: NULL lang/source dirt added to this generator;
        # the stratified/mixture engines join the sweep under it
        "stratified_sample",
        "mixture_sample",
    ]

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_docs_family_matches_duckdb(self, seed, tmp_path):
        import duckdb
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "_entry_for_docs_fuzz", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)

        rng = np.random.default_rng(seed)
        words = ["table", "sort", "merge", "é-word", "中文词", "naïve", "co op", "x" * 30, "a", "the"]
        texts = []
        n = 120
        for i in range(n):
            r = rng.random()
            if r < 0.06:
                texts.append(None)
            elif r < 0.10:
                texts.append("")
            elif r < 0.14:
                texts.append("   \t\n  ")
            elif r < 0.20 and texts:
                prev = [t for t in texts if t]
                texts.append(prev[int(rng.integers(0, len(prev)))] if prev else "dup")
            else:
                k = int(rng.integers(1, 60))
                texts.append(" ".join(str(rng.choice(words)) for _ in range(k)))
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                # ~5% NULL lang/source: GROUP BY / PARTITION BY keep a
                # NULL group, WHERE lang = 'x' drops it — every keyed
                # engine must pick the same convention as its oracle
                "lang": pa.array(
                    [None if rng.random() < 0.05 else str(x) for x in rng.choice(["en", "de", "fr", "zz"], n)],
                    pa.string(),
                ),
                "source": pa.array(
                    [None if rng.random() < 0.05 else str(x) for x in rng.choice(["web", "book", "code"], n)],
                    pa.string(),
                ),
                "n_chars": pa.array([0 if s is None else len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        # small embeddings table so hybrid_search's vector branch runs
        vecs = rng.normal(size=(40, 16)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(40), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                    "label": pa.array([int(x) for x in rng.integers(0, 4, 40)], pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )

        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if pd.api.types.is_datetime64_any_dtype(df[c]):
                    df[c] = df[c].astype("datetime64[us]")
                elif pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')")
        Q, O = entry.queries(), entry.oracle_sql()
        for name in self.OPS:
            r = Q[name](str(tmp_path))
            got = canon(r if isinstance(r, pd.DataFrame) else r.to_pandas())
            exp = canon(con.sql(O[name]).df())
            assert list(got.columns) == list(exp.columns), name
            assert len(got) == len(exp), (name, len(got), len(exp))
            for c in got.columns:
                if pd.api.types.is_float_dtype(exp[c]):
                    ga = got[c].to_numpy(dtype=float)
                    ea = exp[c].to_numpy(dtype=float)
                    assert (np.isnan(ga) == np.isnan(ea)).all(), (name, c)
                    assert np.allclose(np.nan_to_num(ga), np.nan_to_num(ea), rtol=0, atol=1e-9), (name, c)
                else:
                    assert got[c].tolist() == exp[c].tolist(), (name, c)
        con.close()
