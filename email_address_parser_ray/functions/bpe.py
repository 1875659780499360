"""Pure-Python deterministic byte-pair-encoding tokenizer as a
distributed batch kernel.

Public algorithm: Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units" (ACL) — learn merges
greedily from a word-frequency table; encode with merge-priority
greedy application (the shape of GPT-2's public encoder).  No code is
taken from any implementation; reference parity is pinned by a naive
re-implementation in tests/test_bpe.py.

The 100-TB layout:

1. **word counting** — per-batch ``np.unique`` partials over the
   pre-token stream, folded EXACTLY with ``sorted_group_agg`` (the
   engine's unbounded-key aggregation policy — word vocabularies are
   high-cardinality, Ray's native groupby is the wrong shape there);
2. **driver-state cap** — per-block partial top-k by (count desc,
   word asc) + a driver fold keeps driver state at ``max_words`` rows
   no matter the corpus (the Zipf tail carries negligible pair mass;
   truncation is logged, never silent);
3. **merge selection on the driver** — vocab-sized state only.  Pair
   counts are maintained INCREMENTALLY (only words containing the
   just-merged pair are touched), so training is
   O(merges × affected words), not O(merges × vocabulary);
4. **encoding** — the trained model is broadcast once (``ray.put``);
   per batch, ``np.unique`` collapses the pre-token stream to
   DISTINCT words, the merge loop runs once per distinct word (with a
   per-actor cache that persists across batches), and results scatter
   back vectorized.

Determinism: ties in merge selection break to the lexicographically
smallest pair; word truncation ties break to the lexicographically
smallest word; both are total orders, so the model is a pure function
of the corpus *content* — partitioning, block order and retries cannot
change it (pinned in tests/test_bpe.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

# Pre-tokenizer: letter runs | digit runs | single symbol — the same
# class split textstats' "bpeish" count uses, so n_bpeish is exactly
# the pre-token count BPE starts from.
PRETOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

# Opt-in GPT-2-SHAPE pre-tokenizer (Radford et al. 2019 released the
# pattern publicly with the GPT-2 code): contraction suffixes, then
# optionally-space-prefixed letter / digit / symbol runs — " world"
# and "world" become DISTINCT words, carrying spacing information the
# way GPT-2's vocabulary does.  Two documented deviations from the
# original (Python re has no \p{L}/\p{N} and this is a word-grain
# </w> model, not byte-level): Unicode letters are [^\W\d_] and
# numbers \d, and pure-whitespace runs are not emitted as tokens.
PRETOK_GPT2ISH = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+"
)
PRETOKS = {"ascii": PRETOK, "gpt2ish": PRETOK_GPT2ISH}
END = "</w>"  # end-of-word marker symbol (Sennrich §3.2)

DEFAULT_MAX_WORDS = 100_000


def _merge_seq(seq: tuple, a: str, b: str, ab: str) -> tuple:
    """Replace non-overlapping (a, b) adjacencies left-to-right —
    the canonical greedy occurrence rule both trainer and encoder
    must share."""
    out = []
    i, n = 0, len(seq)
    while i < n:
        if i < n - 1 and seq[i] == a and seq[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


@dataclass(frozen=True)
class BpeModel:
    """An ordered merge list + the training alphabet.  Token ids are a
    pure function of the model: 0 = <unk>, then the sorted alphabet,
    then merged symbols in merge order."""

    merges: Tuple[Tuple[str, str], ...]
    alphabet: Tuple[str, ...]
    # which PRETOKS pattern produced the word stream — encode MUST
    # split the same way training counted, so it ships with the model
    pretok: str = "ascii"

    def token_ids(self) -> Dict[str, int]:
        ids = {"<unk>": 0}
        for s in self.alphabet:
            ids.setdefault(s, len(ids))
        for a, b in self.merges:
            ids.setdefault(a + b, len(ids))
        return ids

    # --- persistence (ship the model with the shards — token ids are
    # meaningless without it) ------------------------------------------------

    def to_json(self) -> str:
        import json

        return json.dumps(
            {"merges": [list(p) for p in self.merges],
             "alphabet": list(self.alphabet),
             "pretok": self.pretok}
        )

    @classmethod
    def from_json(cls, s: str) -> "BpeModel":
        import json

        d = json.loads(s)
        return cls(
            merges=tuple(tuple(p) for p in d["merges"]),
            alphabet=tuple(d["alphabet"]),
            pretok=d.get("pretok", "ascii"),  # pre-pretok models
        )

    def save(self, path: str) -> None:
        import os

        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.to_json())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        with open(path) as f:
            return cls.from_json(f.read())


def train_bpe_from_counts(
    words: List[str], counts: List[int], num_merges: int, min_count: int = 2,
    pretok: str = "ascii",
) -> BpeModel:
    """Greedy merge learning over a (word, count) table — the driver
    half of training.  State is O(vocabulary), never O(corpus)."""
    seqs = [tuple(w) + (END,) for w in words]
    cnts = [int(c) for c in counts]
    pair_counts: Dict[tuple, int] = {}
    pair_words: Dict[tuple, set] = {}
    for i, (seq, c) in enumerate(zip(seqs, cnts)):
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)

    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        best, best_c = None, 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c < min_count:
            break
        a, b = best
        ab = a + b
        merges.append(best)
        # incremental update: only words actually containing the pair
        for i in sorted(pair_words.get(best, ())):
            old, c = seqs[i], cnts[i]
            for p in zip(old, old[1:]):
                left = pair_counts[p] - c
                if left > 0:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_words[p]
            new = _merge_seq(old, a, b, ab)
            seqs[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)

    alphabet = sorted({ch for w in words for ch in w} | {END})
    return BpeModel(
        merges=tuple(merges), alphabet=tuple(alphabet), pretok=pretok
    )


class BpeTokenizer:
    """Merge-priority greedy encoder with a per-instance word cache —
    construct ONCE per actor (``__init__``-time state), encode per
    batch.  The cache persists across batches, so repeated words
    (Zipf again) hit the merge loop once per actor lifetime."""

    def __init__(self, model: BpeModel):
        self.model = model
        self.ranks = {p: r for r, p in enumerate(model.merges)}
        self.merges = model.merges
        self.ids = model.token_ids()
        self.pretok = PRETOKS[model.pretok]
        self._cache: Dict[str, tuple] = {}

    def encode_word(self, w: str) -> tuple:
        got = self._cache.get(w)
        if got is not None:
            return got
        sym = tuple(w) + (END,)
        ranks = self.ranks
        while len(sym) > 1:
            best = None
            for p in zip(sym, sym[1:]):
                r = ranks.get(p)
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = self.merges[best]
            sym = _merge_seq(sym, a, b, a + b)
        self._cache[w] = sym
        return sym

    # --- batch kernels ------------------------------------------------------

    def _flat_words(self, texts: List[str]):
        rows = [self.pretok.findall(t) for t in texts]
        lens = np.fromiter((len(r) for r in rows), np.int64, len(rows))
        flat = np.array([w for r in rows for w in r], dtype=object)
        return flat, lens

    def token_counts(self, texts: List[str]) -> np.ndarray:
        """Per-text BPE token counts: the merge loop runs once per
        DISTINCT word in the batch, scatter-summed back per doc."""
        flat, lens = self._flat_words(texts)
        out = np.zeros(len(texts), np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            per_uniq = np.fromiter(
                (len(self.encode_word(w)) for w in uniq), np.int64, len(uniq)
            )
            doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            np.add.at(out, doc_of, per_uniq[inv])
        return out

    def token_count_pairs(self, texts: List[str]):
        """Batch-wide (token, count) partial — the vocab partial.
        Unknown symbols surface verbatim (id 0 in token_ids())."""
        flat, _ = self._flat_words(texts)
        if not len(flat):
            return [], np.zeros(0, np.int64)
        uniq, ucnt = np.unique(flat, return_counts=True)
        tok_counts: Dict[str, int] = {}
        for w, c in zip(uniq, ucnt):
            for s in self.encode_word(w):
                tok_counts[s] = tok_counts.get(s, 0) + int(c)
        toks = sorted(tok_counts)
        return toks, np.array([tok_counts[t] for t in toks], np.int64)


# ---------------------------------------------------------------------------
# distributed training + batch stages
# ---------------------------------------------------------------------------

_WC_SCHEMA = pa.schema([("word", pa.string()), ("cnt", pa.int64())])


def capped_topk(folded, sort_keys, max_rows: int, key_col: str):
    """Driver-side top-``max_rows`` fold of a dataset whose keys are
    already globally unique (post ``sorted_group_agg``): each block
    ships at most ``max_rows`` rows, and a running merge keeps driver
    state bounded at ~4x ``max_rows`` no matter the block count.
    Returns an Arrow table (None when every block is empty).  Shared
    by ``bpe_word_counts`` and ``train_bigram_lm`` — the two capped
    vocab-style folds must stay in lockstep."""
    import ray
    import pyarrow.compute as pc

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= max_rows:
            return t
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:max_rows])

    parts, acc_rows = [], 0
    for ref in folded.map_batches(
        block_topk, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs():
        t = ray.get(ref)
        # schema check guards Ray's empty-block schema loss (RefBundle
        # warnings): schema-less empties simply don't participate
        if key_col in t.schema.names and t.num_rows:
            parts.append(t)
            acc_rows += t.num_rows
            if acc_rows > 4 * max_rows:
                merged = pa.concat_tables(parts).combine_chunks()
                merged = merged.take(
                    pc.sort_indices(merged, sort_keys=sort_keys)[:max_rows]
                )
                parts, acc_rows = [merged], merged.num_rows
    if not parts:
        return None
    all_t = pa.concat_tables(parts).combine_chunks()
    return all_t.take(pc.sort_indices(all_t, sort_keys=sort_keys)[:max_rows])


def bpe_word_counts(ds, col: str = "text", max_words: int = DEFAULT_MAX_WORDS,
                    pretok: str = "ascii"):
    """Distributed exact word counting, capped for the driver: ONE
    pass of per-batch ``np.unique`` partials, folded with
    ``sorted_group_agg`` (high-cardinality key policy), then per-block
    partial top-k (each block ships <= max_words rows) + a driver
    final top-k.  Returns (words, counts, n_distinct) with counts
    sorted desc, word asc."""
    from ..stages.dedup import sorted_group_agg

    pat = PRETOKS[pretok]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _WC_SCHEMA.empty_table()
        flat = np.array(
            [w for t in batch[col].to_pylist() for w in pat.findall(t)],
            dtype=object,
        )
        if not len(flat):
            return _WC_SCHEMA.empty_table()
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {"word": pa.array(uniq, pa.string()), "cnt": pa.array(cnt, pa.int64())}
        )

    folded = sorted_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["word"],
        aggs=[("cnt", "sum")],
    )

    top = capped_topk(
        folded, [("cnt", "descending"), ("word", "ascending")], max_words, "word"
    )
    n_distinct = folded.count()
    if top is None:
        return [], [], 0
    if n_distinct > max_words:
        print(
            f"bpe_word_counts: vocabulary {n_distinct} truncated to top "
            f"{max_words} words for driver-side merge training"
        )
    return top["word"].to_pylist(), top["cnt"].to_pylist(), n_distinct


def train_bpe(
    ds,
    col: str = "text",
    num_merges: int = 256,
    max_words: int = DEFAULT_MAX_WORDS,
    min_count: int = 2,
    pretok: str = "ascii",
) -> BpeModel:
    """End-to-end distributed BPE training: distributed word counts →
    driver-side greedy merges over ≤ max_words rows.  ``pretok``
    picks the pre-tokenizer (``"ascii"`` default; ``"gpt2ish"`` for
    the space-aware GPT-2-shape split) and ships with the model."""
    words, counts, _ = bpe_word_counts(ds, col, max_words=max_words,
                                       pretok=pretok)
    return train_bpe_from_counts(words, counts, num_merges,
                                 min_count=min_count, pretok=pretok)


class BpeCountStage:
    """Actor-pool stage: model deserialized once per actor, the word
    cache persists across batches.  Emits (doc_id, n_bpe_tokens)."""

    def __init__(self, model_ref):
        import ray

        self.tok = BpeTokenizer(ray.get(model_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_bpe_tokens", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "n_bpe_tokens": pa.array(
                    self.tok.token_counts(batch["text"].to_pylist()), pa.int64()
                ),
            }
        )


def _pool(concurrency):
    from ..stages.pools import autoscaling_pool

    return autoscaling_pool(concurrency)


def bpe_token_count_ds(ds, model: BpeModel, concurrency=None):
    """(doc_id, n_bpe_tokens) over a documents dataset — the model is
    put in the object store ONCE and read per actor, never re-shipped
    per batch."""
    import ray

    model_ref = ray.put(model)
    return ds.map_batches(
        BpeCountStage,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        concurrency=_pool(concurrency),
    )


def bpe_vocab_ds(ds, model: BpeModel, concurrency=None):
    """Corpus-wide BPE (token, count) vocabulary table: per-batch
    token-count partials (the actor cache again) folded exactly with
    sorted_group_agg — token vocabularies are bounded by the model,
    but the fold shape stays the high-cardinality-safe one."""
    import ray

    from ..stages.dedup import sorted_group_agg

    model_ref = ray.put(model)
    schema = pa.schema([("token", pa.string()), ("cnt", pa.int64())])

    class Partial:
        def __init__(self):
            self.tok = BpeTokenizer(ray.get(model_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return schema.empty_table()
            toks, cnts = self.tok.token_count_pairs(batch["text"].to_pylist())
            if not toks:
                return schema.empty_table()
            return pa.table(
                {"token": pa.array(toks, pa.string()), "cnt": pa.array(cnts, pa.int64())}
            )

    parts = ds.map_batches(
        Partial, batch_format="pyarrow", concurrency=_pool(concurrency)
    )
    return sorted_group_agg(parts, keys=["token"], aggs=[("cnt", "sum")])


class BpeEncodeStage:
    """Actor-pool stage emitting the training-export artifact:
    (doc_id, token_ids list<int32>, n_bpe_tokens).  Ids come from the
    model's deterministic vocabulary (0 = <unk> for symbols outside
    it — possible only for characters unseen in training)."""

    def __init__(self, model_ref):
        import ray

        self.tok = BpeTokenizer(ray.get(model_ref))
        self._id_cache: Dict[str, list] = {}

    def _ids(self, w: str) -> list:
        got = self._id_cache.get(w)
        if got is None:
            ids = self.tok.ids
            got = [ids.get(s, 0) for s in self.tok.encode_word(w)]
            self._id_cache[w] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("token_ids", pa.list_(pa.int32())),
                ("n_bpe_tokens", pa.int64()),
            ]
        )
        if batch.num_rows == 0:
            return schema.empty_table()
        texts = batch["text"].to_pylist()
        rows = []
        for t in texts:
            ids: list = []
            for w in self.tok.pretok.findall(t):
                ids.extend(self._ids(w))
            rows.append(ids)
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "token_ids": pa.array(rows, pa.list_(pa.int32())),
                "n_bpe_tokens": pa.array([len(r) for r in rows], pa.int64()),
            }
        )


def bpe_encode_ds(ds, model: BpeModel, concurrency=None):
    """(doc_id, token_ids, n_bpe_tokens) over a documents dataset —
    what a training-data export actually ships.  Model broadcast once;
    per-actor word→ids cache."""
    import ray

    model_ref = ray.put(model)
    return ds.map_batches(
        BpeEncodeStage,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        concurrency=_pool(concurrency),
    )
