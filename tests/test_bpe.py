"""Parity tests for distributed BPE training (pipelines/bpe.py) against
a sequential reference trainer (same algorithm, no Ray, no batching) on
fixtures where the merge sequence is known by construction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bank_statement_pdf_parser_ray.pipelines import bpe


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


def _ref_bpe(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    """Sequential reference: incremental vocab rewriting (the textbook
    formulation), vs the engine's from-scratch re-application — the two
    are equivalent, which is what these tests pin."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in word_counts.items():
        key = tuple(list(w) + [bpe.END])
        vocab[key] = vocab.get(key, 0) + n
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append(((a, b), cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + n
        vocab = new_vocab
    return merges


def _word_counts(texts):
    wc: dict[str, int] = {}
    for s in texts:
        if s is None:
            continue
        for w in s.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


class TestBpeTrain:
    def test_matches_sequential_reference(self, tmp_path):
        texts = [
            "low lower lowest low low",
            "new newer newest new newer",
            "wide wider widest wide",
            "low newer low wide lowest",
        ]
        d = _write_docs(tmp_path, texts)
        got = bpe.bpe_train(d, n_merges=12).to_pandas().sort_values("merge_rank")
        exp = _ref_bpe(_word_counts(texts), 12)
        assert [(l, r) for l, r in zip(got["left"], got["right"])] == [p for p, _ in exp]
        assert got["pair_count"].tolist() == [c for _, c in exp]

    def test_early_stop_below_min_count(self, tmp_path):
        # every word unique, each pair occurs once -> zero merges at min_count=2
        d = _write_docs(tmp_path, ["ab cd ef", "gh ij kl"])
        got = bpe.bpe_train(d, n_merges=5, min_count=2).to_pandas()
        assert len(got) == 0

    def test_null_and_empty_docs_ignored(self, tmp_path):
        texts = ["aa aa aa aa", None, "", "aa bb aa"]
        d = _write_docs(tmp_path, texts)
        got = bpe.bpe_train(d, n_merges=3).to_pandas().sort_values("merge_rank")
        exp = _ref_bpe(_word_counts(texts), 3)
        assert [(l, r) for l, r in zip(got["left"], got["right"])] == [p for p, _ in exp]

    def test_vocab_cap_changes_nothing_when_loose(self, tmp_path):
        texts = ["the cat sat on the mat", "the cat ran to the mat"]
        d = _write_docs(tmp_path, texts)
        a = bpe.bpe_train(d, n_merges=6, max_vocab=50_000).to_pandas()
        b = bpe.bpe_train(d, n_merges=6, max_vocab=100).to_pandas()
        assert a.equals(b)


class TestTokenCountTrained:
    def test_counts_match_reference_encode(self, tmp_path):
        texts = ["low lower low", "newest lowest newer", None]
        d = _write_docs(tmp_path, texts)
        out = bpe.token_count_trained(d, n_merges=8).to_pandas().set_index("doc_id")["n_tokens"]
        merges = [p for p, _ in _ref_bpe(_word_counts(texts), 8)]
        for i, s in enumerate(texts):
            if s is None:
                assert out[i] == 0
                continue
            exp = sum(len(bpe._apply_merges(list(w) + [bpe.END], merges)) for w in s.split())
            assert out[i] == exp

    def test_merges_reduce_token_count(self, tmp_path):
        texts = ["banana banana bandana banana", "banana bandana banana banana"]
        d = _write_docs(tmp_path, texts)
        zero = bpe.token_count_trained(d, n_merges=0).to_pandas()["n_tokens"].sum()
        some = bpe.token_count_trained(d, n_merges=10).to_pandas()["n_tokens"].sum()
        assert some < zero
