"""Deterministic synthetic sequences corpus (FIXTURES.md F1/F2/F5/F6).

The BASELINE.json ``input_hint`` table shape:

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

Generated with a fixed seed (42) so tests, the DuckDB oracle, and the
bench all see byte-identical data.  ~1% of rows in the dirty variant
carry exactly one injected violation class, recorded in a side column
``expected_error`` (the oracle's golden answer; dropped before the
engine sees the table).

No external data; pure numpy.  Scale-factor row counts:
sf0.001 → 2_000, sf0.01 → 20_000, sf0.1 → 500_000.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = 50_000
MIN_TOK, MAX_TOK = 1, 2048
SOURCES = ["web", "books", "code", "wiki", "forums"]
SOURCE_WEIGHTS = [0.70, 0.12, 0.10, 0.05, 0.03]
BAD_SOURCE = "crawl-x"

SF_ROWS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 500_000, "sf0.3": 1_500_000,
           "sf1": 5_000_000}

#: sfs built by ``ensure_all`` / ``python -m jesse_ray.testgen`` — sf1
#: (~3.5 GB, the 10× scale-proof corpus) is generated on demand only
DEFAULT_SFS = ["sf0.001", "sf0.01", "sf0.1", "sf0.3"]

#: version tag — bump to force regeneration after generator changes
GEN_VERSION = "v4"

#: parquet row-group size — the read-parallelism unit.  A single giant
#: row group serializes the whole read into one task (measured: inverse
#: scaling 8→32 CPUs); ~16k rows ≈ 7 MB of list data per group gives
#: read_parquet dozens of independently fetchable fragments per file,
#: mirroring how a real 100 TB corpus ships as many files × row groups.
ROW_GROUP_SIZE = 16_384

DATA_ROOT = Path(os.environ.get("JESSE_RAY_DATA", "/tmp/jesse_ray_data"))


def corpus_dir(sf_name: str) -> Path:
    return DATA_ROOT / sf_name


def corpus_path(sf_name: str) -> Path:
    return corpus_dir(sf_name) / "sequences.parquet"


def clean_corpus_path(sf_name: str) -> Path:
    return corpus_dir(sf_name) / "sequences_clean.parquet"


def allowed_sources_path(sf_name: str) -> Path:
    return corpus_dir(sf_name) / "allowed_sources.parquet"


def sf_name_of(sf_dir: str) -> str:
    """Map a driver sf dir like /root/testdata/sf0.01 to our corpus scale."""
    base = os.path.basename(str(sf_dir).rstrip("/"))
    return base if base in SF_ROWS else "sf0.01"


def _gen_clean(rng: np.random.Generator, n: int):
    """Clean F1 table as columnar numpy/arrow parts."""
    doc_ids = np.array([f"doc-{i:08d}" for i in range(n)], dtype=object)
    # lognormal token lengths clipped to [1, 2048]
    lengths = np.clip(rng.lognormal(mean=5.0, sigma=0.8, size=n), MIN_TOK, MAX_TOK).astype(np.int32)
    total = int(lengths.sum())
    # Zipf-ish token ids over [0, VOCAB)
    flat = (rng.zipf(1.3, size=total) - 1) % VOCAB
    flat = flat.astype(np.int32)
    sources = rng.choice(np.array(SOURCES, dtype=object), size=n, p=SOURCE_WEIGHTS)
    return doc_ids, lengths, flat, sources


def _to_table(doc_ids, lengths, flat, n_tok, sources, expected_error=None) -> pa.Table:
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
    cols = {
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(sources, type=pa.string()),
    }
    if expected_error is not None:
        cols["expected_error"] = pa.array(expected_error, type=pa.string())
    return pa.table(cols)


def generate(sf_name: str, force: bool = False) -> Path:
    """Generate corpus files for one scale factor; idempotent."""
    out = corpus_dir(sf_name)
    stamp = out / f".{GEN_VERSION}.done"
    if stamp.exists() and not force:
        return out
    out.mkdir(parents=True, exist_ok=True)
    n = SF_ROWS.get(sf_name, 20_000)
    rng = np.random.default_rng(SEED)
    doc_ids, lengths, flat, sources = _gen_clean(rng, n)
    n_tok = lengths.copy()
    expected = np.array([""] * n, dtype=object)

    # clean variant first (drift fixtures & invariants)
    clean = _to_table(doc_ids.copy(), lengths.copy(), flat.copy(), n_tok.copy(), sources.copy())
    pq.write_table(clean, clean_corpus_path(sf_name), row_group_size=ROW_GROUP_SIZE)

    # ---- inject ~1% violations, one class per dirty row (FIXTURES F1) ----
    n_dirty = max(8, n // 100)
    dirty_idx = rng.choice(n, size=n_dirty, replace=False)
    classes = [
        "wrong_size",  # n_tok != len(tokens)
        "not_in_range",  # n_tok out of [1, 2048]
        "not_unique",  # duplicated doc_id
        "not_in_enum",  # source not in allowed set
        "missing_required_property",  # doc_id null
        "token_not_in_range",  # token value out of [0, VOCAB)
        "no_match",  # doc_id not matching ^doc-[0-9]{8}$
    ]
    assign = rng.integers(0, len(classes), size=n_dirty)
    dup_targets = []
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    for j, i in enumerate(dirty_idx):
        c = classes[assign[j]]
        if c == "wrong_size":
            n_tok[i] = min(MAX_TOK, int(lengths[i]) + 7) if lengths[i] + 7 <= MAX_TOK else max(MIN_TOK, int(lengths[i]) - 7)
            if n_tok[i] == lengths[i]:
                n_tok[i] = lengths[i] - 1 if lengths[i] > 1 else lengths[i] + 1
            expected[i] = "wrong_size"
        elif c == "not_in_range":
            # n_tok pushed out of [1, 2048]; tokens untouched, so the
            # consistency rule (wrong_size) also fires for these rows —
            # per-rule queries/tests each target their own atom.
            v = int(rng.integers(MAX_TOK + 1, MAX_TOK + 500)) if rng.random() < 0.5 else 0
            n_tok[i] = v
            expected[i] = "not_in_range"
        elif c == "not_unique":
            dup_targets.append(i)
            expected[i] = "not_unique"
        elif c == "not_in_enum":
            sources[i] = BAD_SOURCE
            expected[i] = "not_in_enum"
        elif c == "missing_required_property":
            doc_ids[i] = None
            expected[i] = "missing_required_property"
        elif c == "token_not_in_range":
            pos = int(offsets[i]) + int(rng.integers(0, lengths[i]))
            flat[pos] = np.int32(VOCAB + rng.integers(0, 1000)) if rng.random() < 0.5 else np.int32(-1 - rng.integers(0, 5))
            expected[i] = "token_not_in_range"
        elif c == "no_match":
            doc_ids[i] = f"DOC_{i}"
            expected[i] = "no_match"

    tbl = _to_table(doc_ids, lengths, flat, n_tok, sources, expected)

    # duplicated doc_ids: append 1-4 extra copies of each dup target, plus a
    # few hot ids with many copies (skew stressor, FIXTURES F5 flavor)
    if dup_targets:
        extra_idx = []
        for k, i in enumerate(dup_targets):
            copies = 1 + int(rng.integers(1, 4))
            if k < 2 and n >= 20_000:  # hot keys
                copies = 100
            extra_idx.extend([i] * copies)
        extra = tbl.take(pa.array(extra_idx, type=pa.int64()))
        tbl = pa.concat_tables([tbl, extra])

    pq.write_table(tbl, corpus_path(sf_name), row_group_size=ROW_GROUP_SIZE)

    # F2 allowed-sources dimension (one inactive row for anti-join tests)
    dim = pa.table(
        {
            "source": pa.array(SOURCES + ["retired-src"], type=pa.string()),
            "active": pa.array([True] * len(SOURCES) + [False]),
        }
    )
    pq.write_table(dim, allowed_sources_path(sf_name))

    # F6 drift pair (small, fixed 20k rows regardless of sf)
    nd = min(n, 20_000)
    r_ref = np.random.default_rng(SEED + 1)
    ids1, len1, flat1, src1 = _gen_clean(r_ref, nd)
    pq.write_table(_to_table(ids1, len1, flat1, len1, src1), out / "drift_reference.parquet", row_group_size=ROW_GROUP_SIZE)
    r_drift = np.random.default_rng(SEED + 2)
    len2 = np.clip(r_drift.lognormal(mean=5.6, sigma=0.8, size=nd), MIN_TOK, MAX_TOK).astype(np.int32)
    total2 = int(len2.sum())
    flat2 = ((r_drift.zipf(1.05, size=total2) - 1) % VOCAB).astype(np.int32)
    ids2 = np.array([f"doc-{i:08d}" for i in range(nd)], dtype=object)
    src2 = r_drift.choice(np.array(SOURCES, dtype=object), size=nd, p=SOURCE_WEIGHTS)
    pq.write_table(_to_table(ids2, len2, flat2, len2, src2), out / "drift_drifted.parquet", row_group_size=ROW_GROUP_SIZE)

    (out / "meta.json").write_text(
        json.dumps({"sf": sf_name, "rows": n, "seed": SEED, "version": GEN_VERSION})
    )
    stamp.touch()
    return out


def ensure_all(force: bool = False) -> None:
    for sf in DEFAULT_SFS:
        generate(sf, force=force)


# ---------------------------------------------------------------------------
# driver-profile documents + embeddings tables at scales the driver does
# not ship (sf1): same schema and statistical shape as
# /root/testdata/sf*/documents.parquet — word-salad text over a small
# vocab, 5 langs (en-heavy), srcN sources, engineered exact-dup and
# shared-8-gram near-dup structure so dedup stages do real work.

DOC_VOCAB = ("batch part spark line column order small sort fast value scan "
             "hash query agg table slow stream filter big merge group join "
             "vector row key customer the a".split())
DOC_LANGS = ["en", "zh", "es", "fr", "de"]
DOC_LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def generate_documents(sf_name: str, *, force: bool = False) -> Path:
    """documents.parquet + embeddings.parquet in our corpus dir for sfs
    where the driver testdata has none.  Row counts follow the driver's
    ratio (500k sequences → 5k docs → 2k vectors at sf0.1)."""
    out = corpus_dir(sf_name)
    out.mkdir(parents=True, exist_ok=True)
    stamp = out / f".docs_{GEN_VERSION}.done"
    if stamp.exists() and not force:
        return out
    n = SF_ROWS[sf_name] // 100
    rng = np.random.default_rng(SEED + 7)
    # realistic (zipf-weighted, ~5k-word) vocabulary: the driver's tiny
    # observable vocab is fine at 5k docs but makes simhash/minhash LSH
    # buckets degenerate-dense at 50k+ docs — every doc collides with
    # every doc, turning the within-bucket verify quadratic.  A web-scale
    # corpus has a rich vocab; the scale proof should measure the plan,
    # not an adversarial feature space (the bucket_cap skew guard is the
    # knob for genuinely adversarial corpora).
    vocab = np.array(DOC_VOCAB + [f"w{i:05d}" for i in range(5000)], dtype=object)
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    w /= w.sum()
    n_words = rng.integers(8, 101, size=n)
    texts = [" ".join(rng.choice(vocab, size=k, p=w)) for k in n_words]
    # ~1.5% exact dups + ~2% near dups sharing an 8-word window
    n_dup = max(2, n * 15 // 1000)
    for i in rng.choice(np.arange(1, n), size=n_dup, replace=False):
        texts[i] = texts[int(rng.integers(0, i))]
    n_near = max(2, n * 2 // 100)
    for i in rng.choice(np.arange(1, n), size=n_near, replace=False):
        src_words = texts[int(rng.integers(0, i))].split()
        if len(src_words) >= 9:
            s = int(rng.integers(0, len(src_words) - 8))
            window = src_words[s:s + 9]
            own = texts[i].split()
            texts[i] = " ".join(own[: len(own) // 2] + window + own[len(own) // 2:])
    langs = rng.choice(np.array(DOC_LANGS, dtype=object), size=n, p=DOC_LANG_W)
    srcs = np.array([f"src{i % 20}" for i in range(n)], dtype=object)
    docs = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pq.write_table(docs, out / "documents.parquet", row_group_size=ROW_GROUP_SIZE)

    n_emb = max(100, SF_ROWS[sf_name] // 250)
    labels = rng.integers(0, 10, size=n_emb).astype(np.int32)
    # label-clustered vectors (centroid + noise) so k-means/semdedup see
    # real structure, same as the driver's generator evidently does
    cents = rng.normal(size=(10, 64))
    mat = (cents[labels] + rng.normal(scale=0.35, size=(n_emb, 64))).astype(np.float32)
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n_emb + 1) * 64, 64, dtype=np.int64), type=pa.int32()),
        pa.array(mat.ravel(), type=pa.float32()))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": emb,
        "label": pa.array(labels, type=pa.int32()),
    }), out / "embeddings.parquet", row_group_size=ROW_GROUP_SIZE)
    stamp.touch()
    return out


if __name__ == "__main__":
    import sys as _sys

    if "sf1" in _sys.argv:
        generate("sf1")
        generate_documents("sf1")
        print(json.dumps({"root": str(DATA_ROOT), "sf1_rows": SF_ROWS["sf1"]}))
    else:
        ensure_all()
        print(json.dumps({"root": str(DATA_ROOT), "sfs": DEFAULT_SFS}))


# ---------------------------------------------------------------------------
# scaling-run corpus: same schema, cheap-to-sample tokens (uniform), so a
# multi-GB corpus generates in minutes.  The validation work per row is
# identical to the zipf corpora — only the token *distribution* differs,
# which no row-level check depends on.


def scaling_corpus_dir(rows: int) -> Path:
    return DATA_ROOT / f"scale_{rows}"


SCALE_SHARDS = 64  # shard count for the scaling corpus (see below)


def generate_scaling(rows: int, *, mean_tokens: int = 200, force: bool = False) -> Path:
    """The scaling corpus is written as a DIRECTORY of 64 parquet
    shards, not one file: Ray Data plans ONE read task per parquet
    file (measured on the 6M single-file corpus: `1 tasks executed`,
    decode pinned at single-thread speed no matter num_cpus — the
    whole two-parallelism measurement was bottlenecked on it), and a
    real 10^12-sequence corpus is thousands of shards anyway.  One
    shard per read task restores read parallelism AND matches the
    deployment layout."""
    out = scaling_corpus_dir(rows)
    stamp = out / f".{GEN_VERSION}.shards{SCALE_SHARDS}.done"
    if stamp.exists() and not force:
        return out
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    doc_ids = np.array([f"doc-{i:08d}" for i in range(rows)], dtype=object)
    lengths = np.clip(
        rng.normal(loc=mean_tokens, scale=mean_tokens / 4, size=rows), MIN_TOK, MAX_TOK
    ).astype(np.int32)
    total = int(lengths.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    sources = rng.choice(np.array(SOURCES, dtype=object), size=rows, p=SOURCE_WEIGHTS)
    n_tok = lengths.copy()
    # ~0.1% injected violations so the violation path isn't a no-op
    n_bad = max(4, rows // 1000)
    bad = rng.choice(rows, size=n_bad, replace=False)
    n_tok[bad[: n_bad // 2]] += 3  # wrong_size
    for i in bad[n_bad // 2 :]:
        sources[i] = BAD_SOURCE  # not_in_enum
    tbl = _to_table(doc_ids, lengths, flat, n_tok, sources)
    shard_dir = out / "sequences"
    shard_dir.mkdir(parents=True, exist_ok=True)
    per = (rows + SCALE_SHARDS - 1) // SCALE_SHARDS
    for i in range(SCALE_SHARDS):
        lo = i * per
        if lo >= rows:
            break
        pq.write_table(tbl.slice(lo, per), shard_dir / f"shard-{i:04d}.parquet",
                       row_group_size=ROW_GROUP_SIZE)
    dim = pa.table(
        {
            "source": pa.array(SOURCES + ["retired-src"], type=pa.string()),
            "active": pa.array([True] * len(SOURCES) + [False]),
        }
    )
    pq.write_table(dim, out / "allowed_sources.parquet")
    (out / "meta.json").write_text(json.dumps({"rows": rows, "seed": SEED, "version": GEN_VERSION, "kind": "scaling"}))
    stamp.touch()
    return out
