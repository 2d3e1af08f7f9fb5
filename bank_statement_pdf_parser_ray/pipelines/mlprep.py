"""Model-based corpus curation: a distributed logistic-regression
quality classifier and DSIR-style importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling").

Both follow the engine's two-pass global-statistic shape (SCALE.md §6):
every corpus-scale pass is a streaming ``map_batches`` that emits
model-sized partials (a gradient vector, a hashed-bucket count table);
the model itself — six regression weights, a 4096-bucket log-ratio
table — is driver-sized, broadcast once via ``ray.put``, and the final
scoring pass is a single shuffle-free map. Nothing corpus-sized ever
reaches the driver.

The classifier is the fasttext-style quality-filter pattern used by
CCNet / GPT-3 / PaLM data work: train a cheap linear model to
separate a trusted slice from the raw pool, then score everything.
Here the trusted slice is ``lang == 'en'`` (the shared-table proxy for
"looks like the target distribution"); the features are surface
statistics, so the plumbing — distributed standardization, full-batch
gradient descent over per-batch partials, broadcast scoring — is the
real subject, pinned in pytest against a sequential numpy trainer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from bank_statement_pdf_parser_ray.core.hashing import stable_hash64
from bank_statement_pdf_parser_ray.pipelines.datapipe import _docs, _tfidf_tf

N_BUCKETS = 4096  # DSIR hashed-feature buckets (2^12; paper uses 10^4)
N_FEATURES = 6  # classifier: bias + 5 surface statistics


def _features(t: pa.Table) -> np.ndarray:
    """(n, 6) float64 design matrix for one batch: bias, log1p(chars),
    log1p(tokens), punctuation ratio, digit ratio, mean word length.
    NULL text scores as an empty document (all-zero statistics)."""
    text = pc.fill_null(t.column("text"), "")
    n = t.num_rows
    chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    words_list = pc.split_pattern_regex(text, pattern=r"\s+")
    words = pc.list_flatten(words_list)
    keep = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(words_list).to_numpy(zero_copy_only=False)[keep]
    wlen = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.float64)[keep]
    n_tok = np.bincount(parent, minlength=n).astype(np.float64)
    sum_wlen = np.bincount(parent, weights=wlen, minlength=n)
    punct = pc.count_substring_regex(text, pattern=r"[^\w\s]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    digit = pc.count_substring_regex(text, pattern=r"\d").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    safe_chars = np.maximum(chars, 1.0)
    safe_tok = np.maximum(n_tok, 1.0)
    return np.column_stack(
        [
            np.ones(n),
            np.log1p(chars),
            np.log1p(n_tok),
            punct / safe_chars,
            digit / safe_chars,
            sum_wlen / safe_tok,
        ]
    )


def _labels(t: pa.Table) -> np.ndarray:
    lab = pc.equal(pc.fill_null(t.column("lang"), ""), "en")
    return lab.to_numpy(zero_copy_only=False).astype(np.float64)


def _sum_partials(ds: "ray.data.Dataset", make_row) -> np.ndarray:
    """Reduce a corpus-scale Dataset to ONE driver-side float64 vector:
    ``make_row(batch) -> 1-D partial``; partials are summed per batch
    (the combiner) and the tiny (blocks x dim) residue is summed on the
    driver. No shuffle — this is the gradient/moment reduction."""

    def partial(t: pa.Table) -> pa.Table:
        row = np.asarray(make_row(t), dtype=np.float64)
        # one packed binary cell per batch: a 4096-bucket partial as
        # 8192 scalar columns was measurably slower than one blob
        return pa.table({"p": pa.array([row.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    acc = None
    for r in rows:
        v = np.frombuffer(r["p"], dtype=np.float64)
        acc = v.copy() if acc is None else acc + v
    return acc if acc is not None else np.zeros(0)


def _feature_dataset(sf_dir: str) -> "ray.data.Dataset":
    """Materialized numeric design matrix: (doc_id, x0..x5, y). Built
    with ONE pass over the text (tokenization paid once), then cached
    in the object store so every GD epoch streams 7 floats/doc instead
    of re-reading and re-tokenizing the corpus — at 100 TB the epochs
    iterate a ~50 B/doc matrix, never the text."""

    def to_feat(t: pa.Table) -> pa.Table:
        x = _features(t)
        cols = {"doc_id": t.column("doc_id").cast(pa.int64())}
        for j in range(N_FEATURES):
            cols[f"x{j}"] = pa.array(x[:, j], pa.float64())
        cols["y"] = pa.array(_labels(t), pa.float64())
        return pa.table(cols)

    return (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(to_feat, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )


def _xy(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    x = np.column_stack(
        [t.column(f"x{j}").to_numpy(zero_copy_only=False) for j in range(N_FEATURES)]
    )
    return x, t.column("y").to_numpy(zero_copy_only=False)


def train_quality_classifier(
    sf_dir: str, epochs: int = 30, lr: float = 0.5, feat: "ray.data.Dataset | None" = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed full-batch logistic regression: returns (weights in
    standardized space, feature means, feature stds).

    One pass builds the materialized design matrix; one pass reduces
    (sum x, sum x^2, sum y, n) for standardization; each epoch is one
    gradient reduction — a map over the cached matrix emitting a
    6-float partial per batch. Epoch count, not corpus size, bounds the
    number of Ray rounds; each round's exchange is O(blocks x 6)."""
    if feat is None:
        feat = _feature_dataset(sf_dir)

    d = N_FEATURES

    def mom_row(t: pa.Table) -> np.ndarray:
        x, y = _xy(t)
        return np.concatenate([x.sum(axis=0), (x * x).sum(axis=0), [y.sum(), t.num_rows]])

    mom = _sum_partials(feat, mom_row)
    n = mom[2 * d + 1] if mom.size else 0.0
    if n == 0:
        return np.zeros(d), np.zeros(d), np.ones(d)
    mean = mom[:d] / n
    var = np.maximum(mom[d : 2 * d] - n * mean**2, 0.0) / n
    std = np.where(var > 0, np.sqrt(var), 1.0)
    mean[0], std[0] = 0.0, 1.0  # bias column passes through

    w = np.zeros(d)
    for _ in range(epochs):
        bcast = ray.put((w.copy(), mean, std))

        def grad_row(t: pa.Table, _ref=bcast) -> np.ndarray:
            wk, mu, sd = ray.get(_ref)
            x, y = _xy(t)
            xs = (x - mu) / sd
            p = 1.0 / (1.0 + np.exp(-(xs @ wk)))
            return xs.T @ (p - y)

        g = _sum_partials(feat, grad_row)
        w -= lr * g / n
    return w, mean, std


def quality_classifier(sf_dir: str, epochs: int = 30, lr: float = 0.5) -> "ray.data.Dataset":
    """Per-document trained-classifier quality score: (doc_id, p_good,
    label). Training is the distributed GD above; scoring broadcasts
    the (weights, mean, std) triple once and streams — one shuffle-free
    corpus pass, same shape at any scale."""
    feat = _feature_dataset(sf_dir)
    w, mean, std = train_quality_classifier(sf_dir, epochs=epochs, lr=lr, feat=feat)
    bcast = ray.put((w, mean, std))

    def score(t: pa.Table) -> pa.Table:
        wk, mu, sd = ray.get(bcast)
        x, y = _xy(t)
        xs = (x - mu) / sd
        p = 1.0 / (1.0 + np.exp(-(xs @ wk)))
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "p_good": pa.array(p, pa.float64()),
                "label": pa.array(y.astype(bool)),
            }
        )

    return feat.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _bucket_of(words: list[str], memo: dict[str, int]) -> np.ndarray:
    out = np.empty(len(words), dtype=np.int64)
    for j, w in enumerate(words):
        b = memo.get(w)
        if b is None:
            b = memo[w] = stable_hash64(w) % N_BUCKETS
        out[j] = b
    return out


def _bucket_counts(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_index, bucket, count) triples for one batch — hashing only
    the batch's DISTINCT (row, word) pairs (Zipf pays once per word)."""
    tf = _tfidf_tf(t)
    buckets = _bucket_of(tf.column("word").to_pylist(), {})
    i = tf.column("i").to_numpy(zero_copy_only=False)
    c = tf.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    return i, buckets, c


def dsir_stats(sf_dir: str, target_lang: str = "en") -> np.ndarray:
    """The DSIR model: per-bucket log(p_target / p_raw) over hashed
    unigrams, with add-one smoothing. One corpus pass reduces to a
    2 x N_BUCKETS count table (driver-sized)."""

    def counts_row(t: pa.Table) -> np.ndarray:
        i, b, c = _bucket_counts(t)
        is_t = _labels(t)  # 1.0 where lang == target
        raw = np.bincount(b, weights=c, minlength=N_BUCKETS)
        tgt = np.bincount(b, weights=c * is_t[i], minlength=N_BUCKETS)
        return np.concatenate([raw, tgt])

    ds = _docs(sf_dir, ["text", "lang"])
    both = _sum_partials(ds, counts_row)
    raw, tgt = both[:N_BUCKETS] + 1.0, both[N_BUCKETS:] + 1.0
    return np.log(tgt / tgt.sum()) - np.log(raw / raw.sum())


def dsir_weights(sf_dir: str, target_lang: str = "en") -> "ray.data.Dataset":
    """Per-document DSIR log importance weight: sum over the document's
    hashed-unigram counts of log(p_target/p_raw). The 4096-float model
    is broadcast once; scoring is one shuffle-free pass. Zero-token
    documents weigh 0 (an empty product)."""
    ratio_ref = ray.put(dsir_stats(sf_dir, target_lang))

    def score(t: pa.Table) -> pa.Table:
        ratio = ray.get(ratio_ref)
        i, b, c = _bucket_counts(t)
        lw = np.bincount(i, weights=c * ratio[b], minlength=t.num_rows)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "log_weight": pa.array(lw, pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def dsir_resample(sf_dir: str, target_lang: str = "en", m: int = 100) -> "ray.data.Dataset":
    """DSIR selection: the m documents whose hashed-unigram profile
    most resembles the target slice — a distributed sort + limit over
    the weights (ties broken by doc_id so the cut is deterministic).
    At 100 TB the same plan holds: the sort moves (doc_id, float)
    pairs, never text; survivors join back via the pruned-read pattern
    exact_dedup already uses."""
    w = dsir_weights(sf_dir, target_lang)
    return w.sort(["log_weight", "doc_id"], descending=[True, False]).limit(m)


# ---------------------------------------------------------------------------
# Tabular feature engineering: grouped scaler fit/transform + leave-one-out
# target encoding (Micci-Barreca 2001) — the fit-then-transform shape every
# tabular ML prep pipeline runs before training.
# ---------------------------------------------------------------------------


TE_SMOOTH_M = 10.0


def _grouped_value_stats(sf_dir: str) -> "pa.Table":
    """ONE grouped exchange: per-event_type (n, Σv, Σv², min, max)
    partials pre-combined inside every batch, reduced to a model-sized
    stat table (≤ |event types| rows) — the 'fit' of the scaler.
    At 100 TB the exchange moves O(types × blocks) 40-byte rows."""
    from bank_statement_pdf_parser_ray.pipelines.queries import _read

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value")
        # valid NaN is MISSING for the scaler family (a stored NaN is
        # indistinguishable from NULL once it enters a one-pass moment
        # sum, and one NaN would poison its whole category); the three
        # consumers' oracles state the same convention with an isnan
        # CASE. NULL handling as before: counts divide by observations.
        obs = pc.and_(pc.is_valid(v), pc.invert(pc.is_nan(pc.fill_null(v, 0.0))))
        vm = pc.if_else(obs, v, pa.scalar(None, pa.float64()))
        tbl = pa.table(
            {
                "event_type": t.column("event_type"),
                "v": vm,
                "v2": pc.multiply(vm, vm),
                "one": pc.cast(obs, pa.int64()),
            }
        )
        g = pa.TableGroupBy(tbl, ["event_type"]).aggregate(
            [("v", "sum"), ("v2", "sum"), ("one", "sum"), ("v", "min"), ("v", "max")]
        )
        return g.rename_columns(["event_type", "p_v", "p_v2", "p_n", "p_mn", "p_mx"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    # hash-shard reduce (Ray's sort groupby cannot partition a nullable
    # string key — NULL-event_type fuzz)
    return shard_aggregate(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["event_type"],
        [("p_v", "sum"), ("p_v2", "sum"), ("p_n", "sum"), ("p_mn", "min"), ("p_mx", "max")],
        ["event_type", "s_v", "s_v2", "n", "mn", "mx"],
    ).take_all()  # ≤ |event types| rows — the model, not the data


def standardize_events(sf_dir: str) -> "pd.DataFrame":
    """Per-category feature scaling (fit per event_type, transform
    every row): z-score against the group's sample stddev and min-max
    position against the group's range — the standard scaler pair
    fitted GROUPED, the way per-segment tabular features are scaled.

    Scale shape: fit = one grouped-stats exchange
    (_grouped_value_stats); the tiny stat table is broadcast once via
    ``ray.put`` and the transform is a single shuffle-free streaming
    map (vectorized index_in probe + numpy arithmetic). Degenerate
    groups (stddev 0, or a single value so max == min) yield NULL,
    matching the oracle's nullif guards."""
    import pandas as pd

    from bank_statement_pdf_parser_ray.pipelines.queries import _read

    stats = _grouped_value_stats(sf_dir)
    types = [r["event_type"] for r in stats]
    n = np.array([r["n"] for r in stats], dtype=np.float64)
    sv = np.array([r["s_v"] for r in stats], dtype=np.float64)
    sv2 = np.array([r["s_v2"] for r in stats], dtype=np.float64)
    mean = sv / n
    var = np.where(n > 1, np.maximum(sv2 - sv * sv / n, 0.0) / np.maximum(n - 1, 1.0), np.nan)
    sd = np.sqrt(var)
    mn = np.array([r["mn"] for r in stats], dtype=np.float64)
    mx = np.array([r["mx"] for r in stats], dtype=np.float64)
    model = ray.put(
        {
            "types": pa.array(types, pa.string()),
            "mean": mean,
            "sd": np.where(sd > 0, sd, np.nan),
            "mn": mn,
            "rng": np.where(mx > mn, mx - mn, np.nan),
        }
    )

    def transform(t: pa.Table) -> pa.Table:
        m = ray.get(model)
        idx = pc.index_in(t.column("event_type"), m["types"]).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        # UNROUNDED: rounding two independently-summed floats to a
        # fixed decimal flips at half-way boundaries (a 1e-13 summation
        # difference becomes exactly 1e-6); raw doubles stay within the
        # contract's 1e-9 tolerance
        z = (v - m["mean"][idx]) / m["sd"][idx]
        mmx = (v - m["mn"][idx]) / m["rng"][idx]
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "z": pa.array(z, pa.float64(), mask=np.isnan(z)),
                "minmax": pa.array(mmx, pa.float64(), mask=np.isnan(mmx)),
            }
        )

    out = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


STANDARDIZE_EVENTS_SQL = """
WITH ev AS (
  SELECT event_id, event_type,
         CASE WHEN isnan(value) THEN NULL ELSE value END AS value
  FROM events
), s AS (
  SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd,
         min(value) AS mn, max(value) AS mx, count(*) AS n
  FROM ev GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       (e.value - s.m) / nullif(s.sd, 0) AS z,
       (e.value - s.mn) / nullif(s.mx - s.mn, 0) AS minmax
FROM ev e JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
ORDER BY e.event_id
"""


def target_encode_events(sf_dir: str) -> "pd.DataFrame":
    """Leave-one-out target encoding of event_type against ``value``
    (Micci-Barreca 2001, the categorical encoder tabular pipelines fit
    before gradient-boosting/linear training): each row's code is the
    mean target of its OWN category excluding itself — the standard
    leakage guard — plus a prior-smoothed variant (m=10 pseudo-counts
    of the global mean) that tames rare categories.

    Scale shape: identical to the scaler — one grouped (Σ, n) exchange
    fits the encoder, the model-sized table broadcasts once, and the
    encode is a shuffle-free streaming map; the global mean rides the
    same stat table (one more driver-side division), so fit is still
    ONE pass."""
    import pandas as pd

    from bank_statement_pdf_parser_ray.pipelines.queries import _read

    stats = _grouped_value_stats(sf_dir)
    types = pa.array([r["event_type"] for r in stats], pa.string())
    n = np.array([r["n"] for r in stats], dtype=np.float64)
    sv = np.array([r["s_v"] for r in stats], dtype=np.float64)
    g_mean = sv.sum() / n.sum()
    model = ray.put({"types": types, "n": n, "s": sv, "g": g_mean})

    def encode(t: pa.Table) -> pa.Table:
        m = ray.get(model)
        idx = pc.index_in(t.column("event_type"), m["types"]).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        nn, ss = m["n"][idx], m["s"][idx]
        loo_den = nn - 1.0
        # unrounded — see standardize_events on half-way boundary flips
        loo = (ss - v) / np.where(loo_den > 0, loo_den, np.nan)
        smooth = (ss - v + TE_SMOOTH_M * m["g"]) / (loo_den + TE_SMOOTH_M)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "te_loo": pa.array(loo, pa.float64(), mask=np.isnan(loo)),
                "te_smooth": pa.array(smooth, pa.float64(), mask=np.isnan(smooth)),
            }
        )

    out = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


# valid NaN is declared MISSING for the encoder (the engine's one-pass
# (n, sum) fit cannot distinguish a stored NaN from NULL, and a single
# NaN would poison its whole category) — the oracle states that with
# the isnan CASE, like events_stats' fuzz convention.
TARGET_ENCODE_EVENTS_SQL = """
WITH e AS (
  SELECT event_id, event_type,
         CASE WHEN isnan(value) THEN NULL ELSE value END AS value
  FROM events
), g AS (SELECT avg(value) AS gm FROM e)
SELECT event_id,
       (sum(value) OVER w - value)
             / nullif(count(value) OVER w - 1, 0) AS te_loo,
       (sum(value) OVER w - value + 10.0 * (SELECT gm FROM g))
             / (count(value) OVER w - 1 + 10.0) AS te_smooth
FROM e
WINDOW w AS (PARTITION BY event_type)
ORDER BY event_id
"""


def ab_welch_ttest(sf_dir: str, control: str = "view") -> "pd.DataFrame":
    """Welch two-sample t statistics of every event_type against the
    control type — the A/B experiment readout a metrics pipeline
    computes over billions of raw observations: per variant
    (event_type, n, mean_diff, t_stat, df) with Welch–Satterthwaite
    degrees of freedom, which never assumes equal variances.

    Scale shape: the ENTIRE computation reduces to the same ONE grouped
    (n, Σv, Σv²) exchange as the scaler fit (_grouped_value_stats) —
    the t statistic, like every moment-based test, is algebra over
    model-sized sufficient statistics, so the 100 TB of observations
    are touched exactly once and only O(types × blocks) partial rows
    move. Unrounded doubles (see standardize_events on why fixed-
    decimal rounding is the enemy of cross-engine float compares)."""
    import pandas as pd

    stats = _grouped_value_stats(sf_dir)
    rows = {r["event_type"]: r for r in stats}
    if control not in rows:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "mean_diff": pd.Series(dtype="float64"),
                "t_stat": pd.Series(dtype="float64"),
                "df": pd.Series(dtype="float64"),
            }
        )

    def moments(r) -> tuple[float, float, float]:
        n = float(r["n"])
        mean = r["s_v"] / n
        var = (r["s_v2"] - r["s_v"] * r["s_v"] / n) / (n - 1.0) if n > 1 else float("nan")
        return n, mean, var

    n_c, m_c, v_c = moments(rows[control])
    out_rows = []
    # SQL `event_type <> 'view'` is NULL for the NULL group — excluded,
    # like the oracle (and None would break the sort)
    for et in sorted(k for k in rows if k is not None):
        if et == control:
            continue
        n_t, m_t, v_t = moments(rows[et])
        se2 = v_t / n_t + v_c / n_c
        t = (m_t - m_c) / np.sqrt(se2)
        df = se2 * se2 / (
            (v_t / n_t) ** 2 / (n_t - 1.0) + (v_c / n_c) ** 2 / (n_c - 1.0)
        )
        out_rows.append((et, int(n_t), m_t - m_c, t, df))
    return pd.DataFrame(
        out_rows, columns=["event_type", "n", "mean_diff", "t_stat", "df"]
    ).sort_values("event_type").reset_index(drop=True)


AB_WELCH_TTEST_SQL = """
WITH ev AS (
  SELECT event_type, CASE WHEN isnan(value) THEN NULL ELSE value END AS value
  FROM events
), s AS (
  SELECT event_type, count(value) AS n, avg(value) AS m, var_samp(value) AS v
  FROM ev GROUP BY event_type
),
c AS (SELECT n, m, v FROM s WHERE event_type = 'view')
SELECT s.event_type, s.n,
       s.m - c.m AS mean_diff,
       (s.m - c.m) / sqrt(s.v / s.n + c.v / c.n) AS t_stat,
       pow(s.v / s.n + c.v / c.n, 2)
         / (pow(s.v / s.n, 2) / (s.n - 1) + pow(c.v / c.n, 2) / (c.n - 1)) AS df
FROM s, c
WHERE s.event_type <> 'view'
ORDER BY s.event_type
"""
