"""Benchmark decontamination: flag training documents that contain any
n-gram from a (small, broadcast) benchmark/eval set.

The standard LLM-curation step (public recipe: GPT-3 appendix C /
Brown et al. 2020 — 13-gram overlap decontamination): the benchmark
side contributes a set of word n-grams; any training document sharing
one is contaminated and dropped before training.

Scale design: the benchmark set is SMALL relative to the corpus (eval
suites are ~1e4-1e6 n-grams even when the corpus is 100 TB), so this is
a broadcast membership probe, never a shuffle:

- probe n-grams are hashed once on the driver to a sorted uint64 array
  and ``ray.put`` once; every worker resolves the ref a single time
  (lazily, via the callable's cached state — the ReferentialChecker
  discipline, engine.py:101-129);
- each batch tokenizes vectorized (Arrow ``split_pattern`` + one FNV
  byte-walk over the flattened word buffer, hashutil.hash64_strings),
  combines word hashes into rolling n-gram hashes with shift-add
  arithmetic (no division — see sandbox notes), and counts DISTINCT
  probes hit per document with ``np.isin`` against the sorted probe
  array.  Cost is O(words in batch), independent of probe count.

Word-boundary semantics (an n-gram matches only at word boundaries,
not mid-word substrings) re-expressed exactly by the DuckDB oracle
twin in pipelines/queries.py (``doc_decontam``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from jesse_ray.hashutil import hash64_strings

# fixed odd multiplier for the rolling n-gram combine (wraparound mult;
# any odd constant works — this is splitmix64's increment)
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _word_lists(txt: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Split on single spaces (the corpus/SQL tokenizer: DuckDB
    ``string_split(text, ' ')``); returns (flat words, parent idx)."""
    words = pc.split_pattern(pc.fill_null(txt, ""), " ")
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    return flat, parent


def _ngram_hashes(word_hashes: np.ndarray, parent: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-gram hashes over per-document word-hash runs.

    ``word_hashes``/``parent`` are flattened over a batch (documents are
    contiguous runs); a window is valid iff its first and last word
    share a parent.  Returns (gram_hash uint64, gram_parent int64)."""
    m = len(word_hashes) - n + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc = acc * _GRAM_MULT + word_hashes[j : m + j]
    valid = parent[:m] == parent[n - 1 :]
    return acc[valid], parent[:m][valid].astype(np.int64)


def probe_hashes(texts: list[str] | pa.Array, *, n_words: int = 3) -> np.ndarray:
    """All word n-gram hashes of the benchmark texts, unique-sorted.

    Driver-side (benchmark sets are small by design).  A probe that is
    exactly ``n_words`` long contributes one hash."""
    arr = texts if isinstance(texts, pa.Array) else pa.array(list(texts), type=pa.string())
    flat, parent = _word_lists(arr)
    wh = hash64_strings(flat)
    gh, _gp = _ngram_hashes(wh, parent, n_words)
    return np.unique(gh)


class _Contaminator:
    """Per-batch probe: counts DISTINCT benchmark n-grams present in
    each document.  The sorted probe array rides plasma; only the tiny
    ObjectRef is serialized with the callable."""

    def __init__(self, probes_ref, text_col: str, n_words: int, out_col: str):
        self._probes_ref = probes_ref
        self._probes: np.ndarray | None = None
        self.text_col = text_col
        self.n_words = n_words
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._probes is None:
            p = self._probes_ref
            self._probes = ray.get(p) if isinstance(p, ray.ObjectRef) else p
        probes = self._probes
        n_rows = batch.num_rows
        flat, parent = _word_lists(batch[self.text_col])
        wh = hash64_strings(flat)
        gh, gp = _ngram_hashes(wh, parent, self.n_words)
        counts = np.zeros(n_rows, dtype=np.int64)
        if len(gh) and len(probes):
            hit = np.isin(gh, probes)  # probes is sorted: isin uses searchsorted path
            if hit.any():
                idx = np.searchsorted(probes, gh[hit]).astype(np.uint64)
                # distinct (doc, probe) pairs: probe count < 2^32 by the
                # broadcast-smallness assumption documented above
                key = (gp[hit].astype(np.uint64) << np.uint64(32)) | idx
                uniq_docs = (np.unique(key) >> np.uint64(32)).astype(np.int64)
                np.add.at(counts, uniq_docs, 1)
        return batch.append_column(self.out_col, pa.array(counts, type=pa.int64()))


def flag_contaminated(
    ds: Dataset,
    probes: np.ndarray,
    *,
    text_col: str = "text",
    n_words: int = 3,
    out_col: str = "n_probes",
    batch_size: Optional[int] = None,
) -> Dataset:
    """Append ``out_col`` = number of DISTINCT benchmark n-grams found
    in each document (0 = clean)."""
    probes = np.sort(np.asarray(probes, dtype=np.uint64))
    ref = ray.put(probes) if ray.is_initialized() else probes
    return ds.map_batches(
        _Contaminator(ref, text_col, n_words, out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def drop_contaminated(
    ds: Dataset,
    probes: np.ndarray,
    *,
    text_col: str = "text",
    n_words: int = 3,
    batch_size: Optional[int] = None,
) -> Dataset:
    """The curation form: keep only documents sharing NO benchmark
    n-gram (drops the flag column again)."""
    flagged = flag_contaminated(
        ds, probes, text_col=text_col, n_words=n_words,
        out_col="__n_probes", batch_size=batch_size,
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["__n_probes"], 0)
        return batch.filter(mask).drop_columns(["__n_probes"])

    return flagged.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _token_gram_hashes(toks: pa.ListArray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """fmix64-finalized hashes of every n-consecutive-token window,
    plus each window's parent row index.  Vectorized: n shifted
    multiply-adds over the flat int token buffer (no per-row Python),
    windows crossing document boundaries masked out via offsets."""
    from jesse_ray.hashutil import fmix64

    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    values = toks.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    vals = values[off[0]:off[-1]].astype(np.uint64)
    total = len(vals)
    if total < n:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    s, e = off[:-1] - off[0], off[1:] - off[0]
    lengths = e - s
    h = np.zeros(total - n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _GRAM_MULT + vals[j:total - n + 1 + j]
    h = fmix64(h)
    # valid window starts: whole window inside one row
    parent = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    ok = (pos[:total - n + 1] + n) <= lengths[parent[:total - n + 1]]
    return h[ok], parent[:total - n + 1][ok]


def token_gram_set(ds: Dataset, *, n: int = 8, tokens_col: str = "tokens") -> np.ndarray:
    """Distinct n-token-gram hashes of a (small) eval/benchmark corpus,
    sorted — the broadcast probe side.  Per-batch combiner uniques
    before the driver merge, so the driver sees distinct-per-batch
    hashes only."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = batch[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        h, _ = _token_gram_hashes(toks, n)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = [b["h"].to_numpy(zero_copy_only=False)
             for b in ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True).iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts)).astype(np.int64).view(np.uint64)


def flag_token_contaminated(
    ds: Dataset,
    probes: np.ndarray,
    *,
    n: int = 8,
    tokens_col: str = "tokens",
    out_col: str = "contaminated",
    batch_size: Optional[int] = None,
) -> Dataset:
    """Token-level benchmark decontamination: flag every training row
    sharing ANY n-token-gram with the broadcast eval set.  Same contract
    as flag_contaminated but over pre-tokenized sequences (the
    input_hint shape) — one searchsorted membership probe per batch,
    per-row any-hit via max.reduceat.

    64-bit gram hashes mean no false negatives and ~2^-22 odds of a
    single collision false-positive across a 2^21-gram corpus —
    documented envelope, exact for every practical purpose."""
    sorted_probes = np.sort(probes.astype(np.uint64))
    ref = ray.put(sorted_probes) if ray.is_initialized() else sorted_probes

    class _Flagger:
        def __init__(self):
            self.probes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = batch[tokens_col]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            h, parent = _token_gram_hashes(toks, n)
            flag = np.zeros(len(batch), dtype=bool)
            if len(h) and len(self.probes):
                idx = np.searchsorted(self.probes, h)
                idx[idx == len(self.probes)] = len(self.probes) - 1
                hit = self.probes[idx] == h
                np.logical_or.at(flag, parent[hit], True)
            return batch.append_column(out_col, pa.array(flag))

    return ds.map_batches(_Flagger, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=(1, 8))
