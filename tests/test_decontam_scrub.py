"""Decontamination, repetition-gate and scrubbing stage tests."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from jesse_ray.functions.decontam import (
    drop_contaminated,
    flag_contaminated,
    probe_hashes,
)
from jesse_ray.functions.text import PII_PATTERNS, Scrubber, add_repetition_stats


def _ds(rows: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(rows))


def _flags(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return dict(zip(t["doc_id"].to_pylist(), t["n_probes"].to_pylist()))


def test_flag_contaminated_counts_distinct_probes(ray_session):
    probes = probe_hashes(["b c d", "x y z"], n_words=3)
    ds = _ds(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b c d e",          # contains "b c d"
                "b c d x y z",        # both probes
                "b c e d",            # neither (not contiguous)
                "q b c d q b c d",    # same probe twice -> still 1 distinct
                "",                   # empty
            ],
        }
    )
    out = _flags(flag_contaminated(ds, probes, n_words=3))
    assert out == {0: 1, 1: 2, 2: 0, 3: 1, 4: 0}


def test_flag_contaminated_word_boundaries(ray_session):
    # probe must match whole words: "ab c d" does not contain gram "b c d"
    probes = probe_hashes(["b c d"], n_words=3)
    ds = _ds({"doc_id": [0, 1], "text": ["ab c d e", "a b c d"]})
    out = _flags(flag_contaminated(ds, probes, n_words=3))
    assert out == {0: 0, 1: 1}


def test_probe_hashes_multi_gram_probe(ray_session):
    # a 4-word probe contributes two 3-grams
    ph = probe_hashes(["a b c d"], n_words=3)
    assert len(ph) == 2
    ds = _ds({"doc_id": [0], "text": ["z a b c z"]})  # shares "a b c" only
    assert _flags(flag_contaminated(ds, ph, n_words=3)) == {0: 1}


def test_drop_contaminated(ray_session):
    probes = probe_hashes(["b c d"], n_words=3)
    ds = _ds({"doc_id": [0, 1], "text": ["a b c d", "a b e d"]})
    kept = pa.concat_tables(
        drop_contaminated(ds, probes, n_words=3).iter_batches(batch_format="pyarrow")
    )
    assert kept["doc_id"].to_pylist() == [1]
    assert kept.column_names == ["doc_id", "text"]


def test_repetition_stats_matches_naive(ray_session):
    texts = ["a a a b", "x y z", "", "w w", "a b a b a"]
    ds = _ds({"doc_id": list(range(len(texts))), "text": texts})
    t = pa.concat_tables(add_repetition_stats(ds).iter_batches(batch_format="pyarrow"))
    t = t.sort_by("doc_id")
    for i, txt in enumerate(texts):
        words = txt.split(" ")  # NB: "".split(" ") == [""] — same as SQL string_split
        c = Counter(words)
        assert t["top_word_cnt"][i].as_py() == max(c.values())
        assert t["n_words"][i].as_py() == len(words)
        assert t["n_distinct_words"][i].as_py() == len(c)


def test_scrubber_pii_bank(ray_session):
    ds = _ds(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail me at jo.doe+x@example.co.uk or 10.0.0.1 now",
                "call 555-123-4567 and 555.987.6543",
                "nothing sensitive here",
            ],
        }
    )
    t = pa.concat_tables(
        Scrubber.apply(ds, concurrency=1).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert t["scrub_email"].to_pylist() == [1, 0, 0]
    assert t["scrub_ipv4"].to_pylist() == [1, 0, 0]
    assert t["scrub_phone"].to_pylist() == [0, 2, 0]
    out = t["text_scrubbed"].to_pylist()
    assert out[0] == "mail me at [EMAIL] or [IP] now"
    assert out[1] == "call [PHONE] and [PHONE]"
    assert out[2] == "nothing sensitive here"


def test_scrubber_blocklist(ray_session):
    ds = _ds({"doc_id": [0], "text": ["good bad good badger"]})
    t = pa.concat_tables(
        Scrubber.apply(ds, [("block", r"\bbad\b", "[X]")], concurrency=1).iter_batches(
            batch_format="pyarrow"
        )
    )
    assert t["scrub_block"].to_pylist() == [1]  # "badger" untouched (word boundary)
    assert t["text_scrubbed"].to_pylist() == ["good [X] good badger"]


def test_scrubber_rejects_bad_pattern():
    with pytest.raises(Exception):
        Scrubber([("bad", "(unclosed", "[X]")])


def test_unigram_logprob_matches_naive(ray_session):
    import math

    from jesse_ray.functions.text import add_unigram_logprob, unigram_model

    texts = ["a a b", "b c", "a c c c"]
    ds = _ds({"doc_id": [0, 1, 2], "text": texts})
    model = unigram_model(ds)
    got = pa.concat_tables(
        add_unigram_logprob(ds, model).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")

    all_words = [w for t in texts for w in t.split(" ")]
    total = len(all_words)
    cnt = Counter(all_words)
    for i, t in enumerate(texts):
        want = sum(math.log(cnt[w] / total) for w in t.split(" ")) / len(t.split(" "))
        assert abs(got["mean_lp"][i].as_py() - want) < 1e-12
    # model table is the exact count table
    m = {w: c for w, c in zip(model["word"].to_pylist(), model["cnt"].to_pylist())}
    assert m == dict(cnt)


def test_unigram_oov_floor(ray_session):
    from jesse_ray.functions.text import add_unigram_logprob, unigram_model
    import math

    train = _ds({"doc_id": [0], "text": ["a b a"]})
    model = unigram_model(train)
    test = _ds({"doc_id": [0], "text": ["zzz"]})
    got = pa.concat_tables(
        add_unigram_logprob(test, model).iter_batches(batch_format="pyarrow")
    )
    assert abs(got["mean_lp"][0].as_py() - math.log(1.0 / 4.0)) < 1e-12  # 1/(total+1)


def test_token_gram_decontam_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    from jesse_ray.functions.decontam import flag_token_contaminated, token_gram_set

    eva = pa.table({"tokens": pa.array([[1, 2, 3, 4], [9, 9, 9, 9, 9]],
                                       type=pa.list_(pa.int32()))})
    probes = token_gram_set(ray.data.from_arrow(eva), n=3)
    tr = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "tokens": pa.array([
            [5, 1, 2, 3, 7],    # contains (1,2,3) -> flagged
            [1, 2, 4, 3],       # no shared 3-gram
            [9, 9, 9],          # flagged
            [],                 # too short
        ], type=pa.list_(pa.int32())),
    })
    out = flag_token_contaminated(ray.data.from_arrow(tr), probes, n=3,
                                  batch_size=2).to_pandas().set_index("doc_id")
    assert out["contaminated"].to_dict() == {"a": True, "b": False, "c": True, "d": False}
    # a gram spanning two docs must NOT match: (3,7,?) etc. never form
    tr2 = pa.table({"doc_id": ["x", "y"],
                    "tokens": pa.array([[1, 2], [3, 4, 5]], type=pa.list_(pa.int32()))})
    out2 = flag_token_contaminated(ray.data.from_arrow(tr2), probes, n=3,
                                   batch_size=8).to_pandas()
    assert not out2["contaminated"].any()
