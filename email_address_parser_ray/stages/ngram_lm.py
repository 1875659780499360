"""Distributed bigram language-model quality scoring — the CCNet-style
perplexity filter (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC: score documents with
a small LM trained on trusted text; high-perplexity docs are noise,
very-low-perplexity docs are templates).  A full KenLM is out of
scope; an add-alpha-interpolated bigram model captures the same
ranking signal with engine-native machinery:

* **training** — unigram counts ride ``bpe_word_counts`` (per-batch
  np.unique partials → ``sorted_group_agg`` → capped top-k, the
  established shape); bigram counts are the same shape over packed
  ``id_a << 32 | id_b`` int64 keys (16 B rows through the shuffle,
  never strings), capped at ``max_bigrams`` by (count desc, key asc).
  Driver state is O(vocab + bigram cap) no matter the corpus; all
  tie-breaks are total orders, so the MODEL is partition-invariant.
* **scoring** — the model is broadcast once (``ray.put``); each batch
  maps tokens to vocab ids with one ``np.searchsorted`` against the
  sorted vocab, looks bigrams up with one more searchsorted against
  the packed key array, and folds per-doc mean negative log2
  probability with ``reduceat``.  Per-doc scores are pure functions
  of (model, text): partition-invariant, quantized to 1e-6 bits for
  stable comparison.

Smoothing: P(w2|w1) = (c(w1,w2) + a·Pu(w2)) / (c(w1) + a) with
add-one unigrams Pu(w) = (c(w)+1)/(N+V+1); OOV tokens map to a shared
<unk> id and score through the unigram floor.  Pytest pins exact
parity with a scalar reference, in-distribution vs gibberish
separation, and training partition invariance."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.bpe import PRETOK, bpe_word_counts, capped_topk

DEFAULT_ALPHA = 0.5


@dataclass(frozen=True, eq=False)
class BigramLM:
    """Model state stays in numpy end-to-end (a 1M-bigram cap as
    Python int tuples would box ~60 MB on the driver and get rebuilt
    as arrays by the scorer anyway); equality is by value for the
    partition-invariance pins."""

    vocab: np.ndarray          # sorted object array — searchsorted domain
    uni_counts: np.ndarray     # int64, aligned with vocab
    bigram_keys: np.ndarray    # int64, sorted packed (a << 32 | b)
    bigram_counts: np.ndarray  # int64
    total_tokens: int
    alpha: float = DEFAULT_ALPHA

    def __eq__(self, other):
        if not isinstance(other, BigramLM):
            return NotImplemented
        return (
            self.total_tokens == other.total_tokens
            and self.alpha == other.alpha
            and np.array_equal(self.vocab, other.vocab)
            and np.array_equal(self.uni_counts, other.uni_counts)
            and np.array_equal(self.bigram_keys, other.bigram_keys)
            and np.array_equal(self.bigram_counts, other.bigram_counts)
        )

    def __hash__(self):  # defining __eq__ would otherwise unset it
        return hash(
            (self.total_tokens, self.alpha, len(self.vocab), len(self.bigram_keys))
        )


def _token_ids(texts, vocab_arr: np.ndarray):
    """Batch token-id stream: ids into the SORTED vocab, len(vocab)
    = <unk> for OOV; plus per-doc token counts."""
    rows = [PRETOK.findall(t) for t in texts]
    lens = np.fromiter((len(r) for r in rows), np.int64, len(rows))
    flat = np.array([w for r in rows for w in r], dtype=object)
    if not len(flat):
        return np.zeros(0, np.int64), lens
    if not len(vocab_arr):  # empty vocab: every token is <unk> (id 0)
        return np.zeros(len(flat), np.int64), lens
    pos = np.searchsorted(vocab_arr, flat)
    pos = np.minimum(pos, len(vocab_arr) - 1)
    ids = np.where(vocab_arr[pos] == flat, pos, len(vocab_arr)).astype(np.int64)
    return ids, lens


def train_bigram_lm(
    docs_ds,
    col: str = "text",
    max_vocab: int = 65_536,
    max_bigrams: int = 1_000_000,
    alpha: float = DEFAULT_ALPHA,
) -> BigramLM:
    import ray

    from .dedup import sorted_group_agg

    words, counts, _ = bpe_word_counts(docs_ds, col, max_words=max_vocab)
    order = np.argsort(np.array(words, dtype=object))
    vocab_arr = np.array(words, dtype=object)[order]
    uni = np.array(counts, np.int64)[order]
    total = int(uni.sum())
    vocab_ref = ray.put(vocab_arr)

    schema = pa.schema([("key", pa.int64()), ("n", pa.int64())])

    def bigram_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        va = ray.get(vocab_ref)
        texts = t[col].to_pylist()
        ids, lens = _token_ids(texts, va)
        if not len(ids):
            return schema.empty_table()
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        same = doc_of[:-1] == doc_of[1:]  # bigrams never cross docs
        a, b = ids[:-1][same], ids[1:][same]
        in_vocab = (a < len(va)) & (b < len(va))
        key = (a[in_vocab] << np.int64(32)) | b[in_vocab]
        if not len(key):
            return schema.empty_table()
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    folded = sorted_group_agg(
        docs_ds.map_batches(bigram_partial, batch_format="pyarrow"),
        keys=["key"],
        aggs=[("n", "sum")],
    )
    top = capped_topk(
        folded, [("n", "descending"), ("key", "ascending")], max_bigrams, "key"
    )
    if top is not None and top.num_rows:
        keys = np.asarray(top["key"].to_numpy(zero_copy_only=False), np.int64)
        ns = np.asarray(top["n"].to_numpy(zero_copy_only=False), np.int64)
        ko = np.argsort(keys)
        keys, ns = keys[ko], ns[ko]
    else:
        keys = np.zeros(0, np.int64)
        ns = np.zeros(0, np.int64)
    return BigramLM(
        vocab=vocab_arr,
        uni_counts=uni,
        bigram_keys=keys,
        bigram_counts=ns,
        total_tokens=total,
        alpha=alpha,
    )


def score_nll_scalar(lm: BigramLM, text: str) -> tuple:
    """Scalar reference scorer (the pytest oracle): (n_scored,
    avg nll in bits).  First token scores against its unigram."""
    vocab = {w: i for i, w in enumerate(lm.vocab)}
    big = dict(zip(lm.bigram_keys, lm.bigram_counts))
    V = len(lm.vocab)
    toks = PRETOK.findall(text)
    if not toks:
        return 0, 0.0

    def pu(wid):
        c = lm.uni_counts[wid] if wid < V else 0
        return (c + 1) / (lm.total_tokens + V + 1)

    ids = [vocab.get(w, V) for w in toks]
    nll = -np.log2(pu(ids[0]))
    for a, b in zip(ids[:-1], ids[1:]):
        p_u = pu(b)
        if a < V:
            cb = big.get((a << 32) | b, 0) if b < V else 0
            p = (cb + lm.alpha * p_u) / (lm.uni_counts[a] + lm.alpha)
        else:
            p = p_u
        nll += -np.log2(p)
    return len(toks), float(nll / len(toks))


def score_docs_nll(docs_ds, lm: BigramLM, col: str = "text"):
    """(doc_id, n_tokens, nll_e6) — avg negative log2 prob per token,
    quantized to 1e-6 bits.  Model broadcast once; fully vectorized."""
    import ray

    va = np.asarray(lm.vocab, dtype=object)
    uni = np.asarray(lm.uni_counts, np.int64)
    bkeys = np.asarray(lm.bigram_keys, np.int64)
    bcnts = np.asarray(lm.bigram_counts, np.int64)
    model_ref = ray.put((va, uni, bkeys, bcnts, lm.total_tokens, lm.alpha))
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("nll_e6", pa.int64())]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        va, uni, bkeys, bcnts, total, alpha = ray.get(model_ref)
        V = len(va)
        texts = t[col].to_pylist()
        ids, lens = _token_ids(texts, va)
        n_docs = len(texts)
        out_nll = np.zeros(n_docs, np.float64)
        if len(ids):
            ucnt = (
                np.where(ids < V, uni[np.minimum(ids, V - 1)], 0)
                if V
                else np.zeros(len(ids), np.int64)
            )
            p_u = (ucnt + 1.0) / (total + V + 1.0)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            # bigram probabilities for within-doc adjacencies
            same = doc_of[:-1] == doc_of[1:]
            a, b = ids[:-1], ids[1:]
            key = (a << np.int64(32)) | b
            pos = np.searchsorted(bkeys, key) if len(bkeys) else np.zeros(len(key), np.int64)
            pos = np.minimum(pos, max(len(bkeys) - 1, 0))
            cb = np.where(
                (len(bkeys) > 0) & (bkeys[pos] == key) & (b < V), bcnts[pos], 0
            ) if len(bkeys) else np.zeros(len(key), np.int64)
            ua = (
                np.where(a < V, uni[np.minimum(a, V - 1)], 0)
                if V
                else np.zeros(len(a), np.int64)
            )
            p_bi = np.where(
                a < V, (cb + alpha * p_u[1:]) / (ua + alpha), p_u[1:]
            )
            nll_tok = np.zeros(len(ids), np.float64)
            soffs = np.cumsum(lens) - lens
            has = lens > 0
            nll_tok[soffs[has]] = -np.log2(p_u[soffs[has]])  # doc-first tokens
            inner = same  # positions i+1 inside the same doc
            nll_tok[1:][inner] = -np.log2(p_bi[inner])
            # per-doc-LOCAL sums (reduceat over the non-empty docs'
            # start offsets, strictly increasing by construction): a
            # batch-wide prefix sum would couple each doc's float sum
            # to the docs before it in the batch, breaking the
            # partition-invariance guarantee at rounding boundaries
            sums = np.zeros(n_docs, np.float64)
            if has.any():
                sums[has] = np.add.reduceat(nll_tok, soffs[has])
            out_nll = sums / np.maximum(lens, 1)
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "nll_e6": pa.array(
                    np.round(out_nll * 1_000_000).astype(np.int64), pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")
