"""Parity tests for pipelines/mlprep.py against sequential numpy
references (same math, no Ray, no batching). Float tolerances cover
summation-order differences between per-batch partials and one numpy
sum; everything else must agree exactly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bank_statement_pdf_parser_ray.core.hashing import stable_hash64
from bank_statement_pdf_parser_ray.pipelines import mlprep


def _write_docs(tmp_path, texts, langs):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([0 if s is None else len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _fixture(seed=3, n=120):
    """Two separable families: wordy English-ish docs (lang=en) and
    digit/punct spam (other langs)."""
    rng = np.random.default_rng(seed)
    texts, langs = [], []
    for i in range(n):
        if i % 2 == 0:
            k = int(rng.integers(8, 30))
            texts.append(" ".join(rng.choice(["the", "quick", "brown", "fox", "jumps"], k)))
            langs.append("en")
        else:
            k = int(rng.integers(3, 10))
            texts.append(" ".join("".join(rng.choice(list("0123456789!?%"), 6)) for _ in range(k)))
            langs.append(str(rng.choice(["de", "fr", "zh"])))
    return texts, langs


def _ref_features(texts):
    import re

    rows = []
    for s in texts:
        s = s or ""
        words = [w for w in re.split(r"\s+", s) if w]
        chars = len(s)
        punct = len(re.findall(r"[^\w\s]", s, re.UNICODE))
        digit = len(re.findall(r"\d", s))
        wlen = sum(len(w) for w in words)
        rows.append(
            [
                1.0,
                np.log1p(chars),
                np.log1p(len(words)),
                punct / max(chars, 1),
                digit / max(chars, 1),
                wlen / max(len(words), 1),
            ]
        )
    return np.array(rows, dtype=np.float64)


def _ref_train(x, y, epochs, lr):
    n, d = x.shape
    mean = x.mean(axis=0)
    var = np.maximum((x * x).sum(axis=0) - n * mean**2, 0.0) / n
    std = np.where(var > 0, np.sqrt(var), 1.0)
    mean[0], std[0] = 0.0, 1.0
    xs = (x - mean) / std
    w = np.zeros(d)
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(xs @ w)))
        w -= lr * (xs.T @ (p - y)) / n
    return w, mean, std


class TestQualityClassifier:
    def test_weights_match_reference(self, tmp_path):
        texts, langs = _fixture()
        d = _write_docs(tmp_path, texts, langs)
        w, mean, std = mlprep.train_quality_classifier(d, epochs=10, lr=0.3)
        x = _ref_features(texts)
        y = np.array([l == "en" for l in langs], dtype=np.float64)
        w_ref, mean_ref, std_ref = _ref_train(x, y, epochs=10, lr=0.3)
        assert np.allclose(mean, mean_ref, atol=1e-9)
        assert np.allclose(std, std_ref, atol=1e-9)
        assert np.allclose(w, w_ref, atol=1e-7)

    def test_scores_separate_classes(self, tmp_path):
        texts, langs = _fixture(seed=5)
        d = _write_docs(tmp_path, texts, langs)
        out = mlprep.quality_classifier(d, epochs=20, lr=0.5).to_pandas()
        assert len(out) == len(texts)
        good = out[out["label"]]["p_good"].mean()
        bad = out[~out["label"]]["p_good"].mean()
        assert good > 0.8 and bad < 0.2  # planted separable fixture

    def test_null_text_scores(self, tmp_path):
        d = _write_docs(tmp_path, ["the the the", None, ""], ["en", "de", "fr"])
        out = mlprep.quality_classifier(d, epochs=3, lr=0.1).to_pandas()
        assert len(out) == 3 and out["p_good"].notna().all()


def _ref_dsir(texts, langs, target="en"):
    import re

    B = mlprep.N_BUCKETS
    raw = np.zeros(B)
    tgt = np.zeros(B)
    for s, l in zip(texts, langs):
        for w in re.split(r"\s+", s or ""):
            if not w:
                continue
            b = stable_hash64(w) % B
            raw[b] += 1
            if l == target:
                tgt[b] += 1
    raw, tgt = raw + 1.0, tgt + 1.0
    ratio = np.log(tgt / tgt.sum()) - np.log(raw / raw.sum())
    lw = []
    for s in texts:
        acc = {}
        for w in re.split(r"\s+", s or ""):
            if w:
                acc[w] = acc.get(w, 0) + 1
        lw.append(sum(c * ratio[stable_hash64(w) % B] for w, c in acc.items()))
    return ratio, np.array(lw)


class TestDsir:
    def test_weights_match_reference(self, tmp_path):
        texts, langs = _fixture(seed=7, n=80)
        texts[10] = None
        d = _write_docs(tmp_path, texts, langs)
        got = mlprep.dsir_weights(d).to_pandas().set_index("doc_id")["log_weight"]
        _ratio, lw = _ref_dsir(texts, langs)
        assert np.allclose(got.sort_index().to_numpy(), lw, atol=1e-9)
        assert got[10] == 0.0  # null text -> empty product

    def test_resample_selects_target_like(self, tmp_path):
        texts, langs = _fixture(seed=9, n=100)
        d = _write_docs(tmp_path, texts, langs)
        top = mlprep.dsir_resample(d, m=20).to_pandas()
        assert len(top) == 20
        lang_by_id = dict(enumerate(langs))
        frac_en = np.mean([lang_by_id[i] == "en" for i in top["doc_id"]])
        assert frac_en >= 0.9  # importance weights should prefer the target slice

    def test_resample_deterministic_cut(self, tmp_path):
        texts, langs = _fixture(seed=11, n=60)
        d = _write_docs(tmp_path, texts, langs)
        a = mlprep.dsir_resample(d, m=10).to_pandas()
        b = mlprep.dsir_resample(d, m=10).to_pandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
