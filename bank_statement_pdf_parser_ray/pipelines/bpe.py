"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") and its
apply-side token counter.

Scale shape: the ONLY corpus-scale pass is the word-count reduction —
per-batch pre-combined (word, count) partials, one O(distinct words x
blocks) shuffle. Merge learning then iterates over the Zipf-compressed
vocab (optionally capped to the ``max_vocab`` most frequent words, the
standard practice), so per-iteration cost is independent of corpus
size: each iteration is one ``map_batches`` pair-count over the vocab
Dataset (pre-combined per batch) plus a distributed ``sort + limit(1)``
argmax, tie-broken lexicographically so the learned merge list is
deterministic on any executor. The per-word symbol loop is Python, but
it runs over VOCAB rows (10^5-10^6 at web scale after the cap), never
over corpus rows.

The apply pass (``token_count_trained``) broadcasts the learned merge
list once via ``ray.put`` and streams the corpus through a per-batch
encoder with a per-word memo (Zipf makes the memo hit rate high), so
the corpus-scale pass stays one map with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from bank_statement_pdf_parser_ray.pipelines.datapipe import _docs

END = "</w>"  # end-of-word marker, as in the original BPE formulation


def _apply_merges(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges in rank order (each merge rewrites ALL its
    occurrences before the next applies) — the exact segmentation the
    training loop itself produces after those merges."""
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _word_counts(sf_dir: str, max_vocab: int) -> "ray.data.Dataset":
    """Corpus -> (word, n) vocab Dataset with the repo's pinned
    tokenizer semantics (RE2 \\s+ split, empty tokens dropped), capped
    to the ``max_vocab`` most frequent words (count desc, word asc)."""

    def partial(t: pa.Table) -> pa.Table:
        words_list = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        words = pc.list_flatten(words_list).combine_chunks()
        words = words.filter(pc.not_equal(words, ""))
        if len(words) == 0:
            return pa.table({"word": pa.array([], pa.string()), "p_n": pa.array([], pa.int64())})
        g = pa.TableGroupBy(pa.table({"word": words}), ["word"]).aggregate([([], "count_all")])
        return g.rename_columns(["word", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    vocab = shard_aggregate(
        _docs(sf_dir, ["text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["word"],
        [("p_n", "sum")],
        ["word", "n"],
    )
    # top-V cap: distributed sort + limit, deterministic tie-break
    return vocab.sort(["n", "word"], descending=[True, False]).limit(max_vocab)


def bpe_train(
    sf_dir: str, n_merges: int = 30, max_vocab: int = 50_000, min_count: int = 2
) -> "ray.data.Dataset":
    """Learn a BPE merge table from the corpus: Dataset of
    (merge_rank, left, right, pair_count), rank 0 = first merge.

    Stops early when the best remaining pair occurs < ``min_count``
    times. Non-SQL-expressible (iterative argmax over a evolving
    segmentation); pinned in pytest against a sequential reference
    trainer on fixtures where the merge sequence is known."""
    from ray.data.aggregate import Sum

    vocab = _word_counts(sf_dir, max_vocab).materialize()
    merges: list[tuple[str, str]] = []
    ranks: list[int] = []
    counts: list[int] = []

    for rank in range(n_merges):
        merges_ref = ray.put(list(merges))

        def pair_partials(t: pa.Table, _ref=merges_ref) -> pa.Table:
            cur = ray.get(_ref)
            acc: dict[tuple[str, str], int] = {}
            ws = t.column("word").to_pylist()
            ns = t.column("n").to_numpy(zero_copy_only=False)
            for w, n in zip(ws, ns):
                syms = _apply_merges(list(w) + [END], cur)
                for a, b in zip(syms, syms[1:]):
                    acc[(a, b)] = acc.get((a, b), 0) + int(n)
            if not acc:
                return pa.table(
                    {
                        "left": pa.array([], pa.string()),
                        "right": pa.array([], pa.string()),
                        "p_n": pa.array([], pa.int64()),
                    }
                )
            ls, rs = zip(*acc.keys())
            return pa.table(
                {
                    "left": pa.array(ls, pa.string()),
                    "right": pa.array(rs, pa.string()),
                    "p_n": pa.array(list(acc.values()), pa.int64()),
                }
            )

        top = (
            vocab.map_batches(pair_partials, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["left", "right"])
            .aggregate(Sum("p_n", alias_name="n"))
            .sort(["n", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not top or top[0]["n"] < min_count:
            break
        merges.append((top[0]["left"], top[0]["right"]))
        ranks.append(rank)
        counts.append(int(top[0]["n"]))

    return ray.data.from_arrow(
        pa.table(
            {
                "merge_rank": pa.array(ranks, pa.int64()),
                "left": pa.array([a for a, _ in merges], pa.string()),
                "right": pa.array([b for _, b in merges], pa.string()),
                "pair_count": pa.array(counts, pa.int64()),
            }
        )
    )


_MERGES_CACHE: dict[tuple[str, int, int], list[tuple[str, str]]] = {}


def train_merges(sf_dir: str, n_merges: int = 30, max_vocab: int = 50_000) -> list[tuple[str, str]]:
    """The learned merge list as plain tuples (driver-side, O(n_merges)).
    Cached per (corpus, params) within the process: training is
    deterministic, so the apply pass never pays for a second train."""
    key = (sf_dir, n_merges, max_vocab)
    hit = _MERGES_CACHE.get(key)
    if hit is not None:
        return hit
    t = bpe_train(sf_dir, n_merges=n_merges, max_vocab=max_vocab).to_arrow_refs()
    rows = pa.concat_tables([ray.get(r) for r in t]).sort_by("merge_rank")
    out = list(zip(rows.column("left").to_pylist(), rows.column("right").to_pylist()))
    _MERGES_CACHE[key] = out
    return out


def token_count_trained(sf_dir: str, n_merges: int = 30) -> "ray.data.Dataset":
    """Apply side: per-document token count under the corpus-trained
    BPE — (doc_id, n_tokens). The merge list is broadcast once; the
    encoder memoizes per distinct word within each batch, so Zipf
    repetition is paid once per batch, not per occurrence."""
    merges = train_merges(sf_dir, n_merges=n_merges)
    merges_ref = ray.put(merges)

    def count_tokens(t: pa.Table) -> pa.Table:
        cur = ray.get(merges_ref)
        memo: dict[str, int] = {}
        words_list = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        out = np.zeros(t.num_rows, dtype=np.int64)
        for i, ws in enumerate(words_list.to_pylist()):
            if ws is None:
                out[i] = 0
                continue
            tot = 0
            for w in ws:
                if not w:
                    continue
                hit = memo.get(w)
                if hit is None:
                    hit = memo[w] = len(_apply_merges(list(w) + [END], cur))
                tot += hit
            out[i] = tot
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(out, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    )
