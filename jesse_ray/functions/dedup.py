"""Deduplication operators over document tables.

Exact dedup: content-hash inside ``map_batches`` (vectorized) → hash
groupby → keep-first per group.  Near-dup families (MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine) follow the standard public
recipes (Broder 1997 shingling/minhash; Charikar 2002 simhash;
Leskovec-Rajaraman-Ullman ch.3 LSH banding): per-batch signature
computation, explode to (band, bucket) rows, groupby bucket for
candidates, verify exact similarity on the candidates only.

Scale notes: the only all-to-all exchanges are the groupbys on hash /
(band, bucket) keys — both uniform by construction (hash keys), so no
skew defense is needed beyond the banding itself.  Candidate
verification touches candidate pairs only, never the full cross
product.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup


def add_content_hash(ds: Dataset, text_col: str = "text", out_col: str = "content_hash",
                     *, batch_size: int = 8192) -> Dataset:
    """md5 of the exact text — matchable by DuckDB's md5() for oracles."""

    def h(batch: pa.Table) -> pa.Table:
        vals = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(vals, type=pa.string()))

    return ds.map_batches(h, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def exact_duplicate_groups(ds: Dataset, text_col: str = "text") -> Dataset:
    """(content_hash, cnt) for texts appearing more than once — two-phase
    count (map-side combiner before the shuffle), same pattern as key
    uniqueness in the validation engine."""
    from ray.data.aggregate import Sum

    hashed = add_content_hash(ds.select_columns([text_col]), text_col)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["content_hash"]).group_by("content_hash").aggregate([([], "count_all")])
        return g.rename_columns(["content_hash", "partial_cnt"])

    partials = hashed.map_batches(partial, batch_format="pyarrow")
    counts = partials.groupby("content_hash").aggregate(Sum("partial_cnt", alias_name="cnt"))
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)), batch_format="pyarrow"
    )


def dedup_exact(ds: Dataset, text_col: str = "text", key_col: str = "doc_id") -> Dataset:
    """Keep the first row (smallest key) per distinct text."""
    hashed = add_content_hash(ds, text_col)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key_col).head(1)

    return hashed.groupby("content_hash").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-char shingles of ``text`` (Broder-style)."""
    b = text.encode("utf-8", "ignore")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    win = np.lib.stride_tricks.sliding_window_view(np.frombuffer(b, dtype=np.uint8), k)
    B = np.uint64(1099511628211)
    h = np.zeros(len(win), dtype=np.uint64)
    for j in range(k):
        h = h * B + win[:, j].astype(np.uint64)
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: per-document minhash signatures.

    Hash coefficient banks are generated once per actor in ``__init__``
    from a fixed seed, so every actor (and every run) produces identical
    signatures.
    """

    def __init__(self, num_hashes: int = 64, shingle_k: int = 5, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
        self.k = shingle_k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, vectorized over (hashes × shingles)
        v = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t or "") for t in batch["text"]]
        batch = batch.copy()
        batch["minhash"] = [s.astype(np.int64).tolist() for s in sigs]
        return batch


def minhash_signatures(ds: Dataset, *, num_hashes: int = 64, shingle_k: int = 5,
                       concurrency: int = 4, batch_size: int = 1024) -> Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes, "shingle_k": shingle_k},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def lsh_candidate_pairs(ds: Dataset, *, num_hashes: int = 64, bands: int = 16,
                        key_col: str = "doc_id", **kw) -> Dataset:
    """MinHash-LSH banding: signature → (band_id, band_hash) rows →
    groupby bucket → emit candidate pairs within each bucket.

    rows_per_band = num_hashes // bands controls the similarity knee
    (s ≈ (1/bands)^(1/rows_per_band), standard LSH S-curve).
    """
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    sigs = minhash_signatures(ds.select_columns([key_col, "text"]), num_hashes=num_hashes, **kw)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        keys, band_ids, band_hashes = [], [], []
        for key, sig in zip(batch[key_col], batch["minhash"]):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rpb : (b + 1) * rpb]
                band_hashes.append(hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest())
                band_ids.append(b)
                keys.append(key)
        return pd.DataFrame({key_col: keys, "band_id": band_ids, "band_hash": band_hashes})

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ks = sorted(set(g[key_col]))
        if len(ks) < 2:
            return pd.DataFrame({"left": [], "right": []})
        left, right = [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                left.append(ks[i])
                right.append(ks[j])
        return pd.DataFrame({"left": left, "right": right})

    cand = exploded.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")

    # dedup pairs surfaced by multiple bands
    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["left", "right"]).map_groups(dd, batch_format="pandas")


def verify_jaccard_pairs(ds: Dataset, pairs: Dataset, *, threshold: float = 0.8,
                         shingle_k: int = 5, key_col: str = "doc_id") -> pd.DataFrame:
    """Exact shingle-Jaccard verification of LSH candidates.

    The candidate set is assumed small (near-dup pairs are rare); texts
    for candidate keys are fetched via a broadcast key-set filter, then
    verified on the driver.  At 100 TB scale the same verify runs as a
    map_groups over pair buckets; the semantics are identical.
    """
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"left": [], "right": [], "jaccard": []})
    need = set(pdf["left"]) | set(pdf["right"])
    texts = {}
    filt = ds.select_columns([key_col, "text"]).map_batches(
        lambda t, need=need: t.filter(pc.is_in(t[key_col], value_set=pa.array(list(need)))),
        batch_format="pyarrow",
    )
    for b in filt.iter_batches(batch_format="pyarrow"):
        for k, t in zip(b[key_col].to_pylist(), b["text"].to_pylist()):
            texts[k] = t
    out = []
    for l, r in zip(pdf["left"], pdf["right"]):
        s1, s2 = set(_shingle_hashes(texts.get(l, "") or "", shingle_k)), set(
            _shingle_hashes(texts.get(r, "") or "", shingle_k)
        )
        j = len(s1 & s2) / max(len(s1 | s2), 1)
        if j >= threshold:
            out.append((l, r, j))
    return pd.DataFrame(out, columns=["left", "right", "jaccard"])


# ---------------------------------------------------------------------------
# SimHash


class SimHasher:
    """Charikar simhash over word features: 64-bit signature; documents
    within ``max_hamming`` bits are near-dup candidates."""

    def __init__(self, seed: int = 99):
        self.word_rx = re.compile(r"\w+")
        self.seed = seed

    def signature(self, text: str) -> np.uint64:
        words = self.word_rx.findall((text or "").lower())
        if not words:
            return np.uint64(0)
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") for w in set(words)],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.flatnonzero(v > 0):
            sig |= np.uint64(1) << np.uint64(i)
        return sig

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["simhash"] = [int(self.signature(t)) for t in batch["text"]]
        return batch


def simhash_signatures(ds: Dataset, *, concurrency: int = 4, batch_size: int = 1024) -> Dataset:
    return ds.map_batches(SimHasher, batch_format="pandas", batch_size=batch_size, concurrency=concurrency)


def simhash_near_dups(ds: Dataset, *, max_hamming: int = 3, key_col: str = "doc_id",
                      blocks: int = 4, **kw) -> pd.DataFrame:
    """Candidate generation by the standard block-permutation trick: split
    the 64-bit signature into ``blocks`` chunks; near-dups within
    ``max_hamming`` (< blocks) bits must agree on ≥1 chunk → groupby
    chunk value, verify hamming inside groups."""
    sigs = simhash_signatures(ds.select_columns([key_col, "text"]), **kw)
    width = 64 // blocks

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"key": [], "block": [], "chunk": [], "sig": []}
        for k, s in zip(batch[key_col], batch["simhash"]):
            s = int(s)
            for b in range(blocks):
                rows["key"].append(k)
                rows["block"].append(b)
                rows["chunk"].append((s >> (b * width)) & ((1 << width) - 1))
                rows["sig"].append(s)
        return pd.DataFrame(rows)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(g["key"], g["sig"])))
        out = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                ham = bin(recs[i][1] ^ recs[j][1]).count("1")
                if ham <= max_hamming:
                    out.append((recs[i][0], recs[j][0], ham))
        return pd.DataFrame(out, columns=["left", "right", "hamming"])

    cand = sigs.map_batches(explode, batch_format="pandas").groupby(["block", "chunk"]).map_groups(
        pairs, batch_format="pandas"
    )
    pdf = cand.to_pandas()
    return pdf.drop_duplicates(subset=["left", "right"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard (all-pairs within buckets — for modest corpora / verify path)


def ngram_jaccard_dups(ds: Dataset, *, threshold: float = 0.5, shingle_k: int = 5,
                       key_col: str = "doc_id", num_hashes: int = 64, bands: int = 32,
                       **kw) -> pd.DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, LSH-pruned (lower banding
    threshold so the verify step sees looser candidates)."""
    cand = lsh_candidate_pairs(ds, num_hashes=num_hashes, bands=bands, key_col=key_col, **kw)
    return verify_jaccard_pairs(ds, cand, threshold=threshold, shingle_k=shingle_k, key_col=key_col)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_near_dups(ds: Dataset, *, threshold: float = 0.95, key_col: str = "vec_id",
                        vec_col: str = "embedding", n_buckets: int = 8,
                        seed: int = 7) -> pd.DataFrame:
    """Near-duplicate pairs by embedding cosine, bucketed by random
    hyperplane LSH (sign of projection onto ``log2(n_buckets)`` fixed
    random directions) so each bucket does a small dense matmul instead
    of a corpus-wide cross product."""
    n_bits = max(1, int(np.log2(n_buckets)))

    def assign(batch: pd.DataFrame, _planes={}) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        if "p" not in _planes:
            rng = np.random.default_rng(seed)
            _planes["p"] = rng.normal(size=(mat.shape[1], n_bits))
        proj = mat @ _planes["p"] > 0
        bucket = (proj * (1 << np.arange(n_bits))).sum(axis=1)
        batch = batch.copy()
        batch["bucket"] = bucket.astype(np.int64)
        return batch

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        normed = mat / np.clip(norms, 1e-12, None)
        sim = normed @ normed.T
        keys = g[key_col].to_numpy()
        iu = np.triu_indices(len(keys), k=1)
        hit = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "left": keys[iu[0][hit]],
                "right": keys[iu[1][hit]],
                "cosine": sim[iu][hit],
            }
        )

    cand = (
        ds.select_columns([key_col, vec_col])
        .map_batches(assign, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    pdf = cand.to_pandas()
    if pdf.empty:
        return pdf
    # hyperplane buckets can split true pairs; for the threshold regime
    # (>0.9) the miss rate is low — documented approximation
    return pdf.sort_values(["left", "right"]).reset_index(drop=True)
