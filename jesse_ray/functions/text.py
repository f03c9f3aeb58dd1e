"""Text-analysis stages for training-data pipelines over ``documents``.

All stages are vectorized ``map_batches`` callables; the stateful ones
(compiled regex banks, stopword tables) are actor-pool classes with the
expensive setup in ``__init__`` — once per actor, never per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# ---------------------------------------------------------------------------
# token counting


def add_token_counts(ds: Dataset, text_col: str = "text", *, batch_size: int = 4096) -> Dataset:
    """Whitespace token count + a BPE-ish subword estimate (regex word/
    punct split), vectorized in Arrow."""

    def count(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        ws = pc.list_value_length(pc.split_pattern(txt, " "))
        # BPE-ish: count word/number/punct pieces (GPT-2-style pretokenizer
        # shape: runs of letters, runs of digits, single punct marks)
        pieces = pc.list_value_length(
            pc.extract_regex_span_all(txt, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ) if hasattr(pc, "extract_regex_span_all") else pc.count_substring_regex(
            txt, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
        )
        return batch.append_column("n_words", ws).append_column(
            "n_pieces", pc.cast(pieces, pa.int64())
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with as for on at by "
    "from not but they he she we you i his her its their our your"
).split()


class QualityScorer:
    """Actor-pool stage: per-document quality features.

    Regexes compiled once per actor (the analogue of the reference's
    pre-compiled re_options discipline, src/jesse_lib.erl:127-139).
    """

    def __init__(self):
        self.word_rx = re.compile(r"[A-Za-z']+")
        self.stop = frozenset(_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"].astype(str)
        n_chars = txt.str.len()
        n_alpha = txt.str.count(r"[A-Za-z]")
        n_punct = txt.str.count(r"[^\w\s]")
        words = txt.str.findall(self.word_rx)
        n_words = words.map(len)
        n_stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in self.stop))
        batch = batch.copy()
        batch["q_len"] = n_chars.astype("int64")
        batch["q_alpha_ratio"] = (n_alpha / n_chars.clip(lower=1)).astype("float64")
        batch["q_punct_ratio"] = (n_punct / n_chars.clip(lower=1)).astype("float64")
        batch["q_stop_ratio"] = (n_stop / n_words.clip(lower=1)).astype("float64")
        batch["q_mean_word_len"] = (
            words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        ).astype("float64")
        return batch

    @staticmethod
    def apply(ds: Dataset, *, concurrency: int = 4, batch_size: int = 2048) -> Dataset:
        return ds.map_batches(
            QualityScorer,
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=concurrency,
        )


# ---------------------------------------------------------------------------
# language identification (n-gram / stopword heuristic — no models in sandbox)

_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " les ", " est ", " une "],
    "es": [" el ", " los ", " es ", " una ", " que "],
    "it": [" il ", " che ", " di ", " una ", " per "],
}


class LangId:
    """Actor-pool heuristic language ID: score = count of language-marker
    function words per language; argmax wins, 'und' (undetermined) when no
    marker hits.  Deterministic, model-free."""

    def __init__(self):
        self.markers = {lang: [re.escape(m) for m in ms] for lang, ms in _LANG_MARKERS.items()}
        self.rx = {lang: re.compile("|".join(ms)) for lang, ms in self.markers.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        txt = " " + batch["text"].astype(str).str.lower() + " "
        scores = np.zeros((len(batch), len(self.rx)), dtype=np.int64)
        langs = list(self.rx)
        for j, lang in enumerate(langs):
            scores[:, j] = txt.str.count(self.rx[lang]).to_numpy()
        best = scores.argmax(axis=1)
        hit = scores.max(axis=1) > 0
        batch = batch.copy()
        batch["lang_pred"] = np.where(hit, np.asarray(langs, dtype=object)[best], "und")
        return batch

    @staticmethod
    def apply(ds: Dataset, *, concurrency: int = 4, batch_size: int = 2048) -> Dataset:
        return ds.map_batches(
            LangId, batch_format="pandas", batch_size=batch_size, concurrency=concurrency
        )


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash)


def add_fingerprints(ds: Dataset, text_col: str = "text", *, window: int = 8, batch_size: int = 4096) -> Dataset:
    """Deterministic 64-bit document fingerprint: min of rolling
    (Rabin-Karp-style) hashes over byte windows — stable under small
    position shifts, usable for winnowing-style near-dup candidates."""

    def fp(batch: pa.Table) -> pa.Table:
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        texts = batch[text_col].to_pylist()
        B = np.uint64(1000003)
        for i, t in enumerate(texts):
            b = np.frombuffer((t or "").encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) < window:
                h = np.uint64(0)
                for x in b:
                    h = h * B + np.uint64(x)
                out[i] = h
                continue
            # vectorized rolling hash: polynomial over each window
            powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
            mat = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
            hashes = (mat * powers).sum(axis=1)
            out[i] = hashes.min()
        return batch.append_column("fingerprint", pa.array(out, type=pa.uint64()))

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
