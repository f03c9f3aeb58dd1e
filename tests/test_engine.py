"""End-to-end engine tests over the deterministic dirty corpus (F1).

The golden answers are the ``expected_error`` side column written by the
generator; the engine never sees it (the reader prunes to the canonical
4 columns).  Parity with the row-wise Python oracle is asserted
record-for-record (SURVEY §5.2).
"""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from jesse_ray import errors as E
from jesse_ray import testgen
from jesse_ray.compiler import compile_spec
from jesse_ray.engine import (
    ValidationEngine,
    column_stats,
    duplicate_keys,
    filter_valid,
    referential_violations,
    row_violations,
    uniqueness_violations,
    validate_dataset,
)
from jesse_ray.oracle import validate_row
from jesse_ray.sources import read_sequences
from jesse_ray.spec import sequences_spec
from jesse_ray.stages import drift_check, sketch_dataset


@pytest.fixture(scope="module")
def spec(corpus_sf0001):
    return sequences_spec(
        allowed_sources_path=str(testgen.allowed_sources_path("sf0.001"))
    )


@pytest.fixture(scope="module")
def corpus_path(corpus_sf0001):
    return str(testgen.corpus_path("sf0.001"))


@pytest.fixture(scope="module")
def golden(corpus_path):
    tbl = pq.read_table(corpus_path)
    return tbl


def test_row_violations_match_golden_atoms(corpus_path, golden, spec):
    ds = read_sequences(corpus_path)
    compiled = compile_spec(spec)
    v = pa.concat_tables(
        list(row_violations(ds, compiled).iter_batches(batch_format="pyarrow"))
    )
    got = {}
    for d, e in zip(v["doc_id"].to_pylist(), v["error"].to_pylist()):
        got.setdefault(d, set()).add(e)

    exp = golden.to_pydict()
    for doc, err, n_tok in zip(exp["doc_id"], exp["expected_error"], exp["n_tok"]):
        if err in ("", "not_unique", "not_in_enum"):
            continue  # corpus-level / referential classes tested separately
        atom = "not_in_range" if err == "token_not_in_range" else err
        key = doc  # None doc_id rows keyed by None
        assert atom in got.get(key, set()), (doc, err, got.get(key))


def test_row_violations_no_false_positives(corpus_path, golden, spec):
    ds = read_sequences(corpus_path)
    compiled = compile_spec(spec)
    v = pa.concat_tables(
        list(row_violations(ds, compiled).iter_batches(batch_format="pyarrow"))
    )
    flagged = {d for d in v["doc_id"].to_pylist() if d is not None}
    clean_docs = {
        d
        for d, e in zip(golden["doc_id"].to_pylist(), golden["expected_error"].to_pylist())
        if e == "" and d is not None
    }
    dirty_docs = {
        d
        for d, e in zip(golden["doc_id"].to_pylist(), golden["expected_error"].to_pylist())
        if e not in ("", "not_unique", "not_in_enum") and d is not None
    }
    # a clean doc_id must not be flagged by row-level checks
    assert flagged & (clean_docs - dirty_docs) == set()


def test_oracle_parity_rowlevel(corpus_path, spec):
    """Engine violation records == row-wise oracle records, field for field."""
    tbl = pq.read_table(corpus_path).slice(0, 4000)
    seq = tbl.select(["doc_id", "tokens", "n_tok", "source"])
    compiled = compile_spec(spec)
    v = compiled.check_batch(seq)
    engine_recs = sorted(
        (d, tuple(p), e, vj)
        for d, p, e, vj in zip(
            v["doc_id"].to_pylist(),
            v["path"].to_pylist(),
            v["error"].to_pylist(),
            v["value_json"].to_pylist(),
        )
        if d is not None
    )
    oracle_recs = []
    spec_no_ref = sequences_spec()  # oracle handles referential separately
    for row in seq.to_pylist():
        oracle_recs.extend(
            (d, p, e, vj) for d, p, e, vj in validate_row(spec_no_ref, row) if d is not None
        )
    assert engine_recs == sorted(oracle_recs)


def test_token_array_equality_invariant(corpus_path, spec):
    """Per-row invariant vs the reference pass: the engine must not mutate
    tokens (BASELINE.json input_hint)."""
    ds = read_sequences(corpus_path)
    compiled = compile_spec(spec)
    before = pq.read_table(corpus_path, columns=["doc_id", "tokens"])
    after = pa.concat_tables(
        list(
            filter_valid(ds, compiled)
            .select_columns(["doc_id", "tokens"])
            .iter_batches(batch_format="pyarrow")
        )
    )
    # every surviving row's token array is byte-identical to its input row
    idx = {d: i for i, d in enumerate(before["doc_id"].to_pylist())}
    before_tok = before["tokens"].to_pylist()
    for d, toks in zip(after["doc_id"].to_pylist(), after["tokens"].to_pylist()):
        assert toks == before_tok[idx[d]]


def test_uniqueness_two_phase(corpus_path, golden):
    ds = read_sequences(corpus_path, columns=["doc_id"])
    uv = uniqueness_violations(ds, "doc_id")
    got = {json.loads(v)["value"]: json.loads(v)["count"] for v in uv["value_json"].to_pylist()}
    # golden: doc_ids that appear more than once
    ids = [d for d in golden["doc_id"].to_pylist() if d is not None]
    import collections

    exact = {k: c for k, c in collections.Counter(ids).items() if c > 1}
    assert got == exact
    assert set(uv["error"].to_pylist()) == {E.NOT_UNIQUE}


def test_referential_actor_pool(corpus_path, spec, golden):
    ds = read_sequences(corpus_path)
    rv = referential_violations(ds, spec, concurrency=2)
    v = pa.concat_tables(list(rv.iter_batches(batch_format="pyarrow")))
    bad_docs = {
        d
        for d, e in zip(golden["doc_id"].to_pylist(), golden["expected_error"].to_pylist())
        if e == "not_in_enum"
    }
    assert set(v["doc_id"].to_pylist()) == bad_docs
    assert set(v["error"].to_pylist()) == {E.NOT_IN_ENUM}
    assert set(json.loads(x) for x in v["value_json"].to_pylist()) == {testgen.BAD_SOURCE}


def test_full_validate_and_counts(corpus_path, spec, golden):
    ds = read_sequences(corpus_path)
    res = validate_dataset(ds, spec)
    counts = res.counts_by_error()
    exp = [e for e in golden["expected_error"].to_pylist() if e]
    assert counts.get(E.NOT_IN_ENUM, 0) == sum(1 for e in exp if e == "not_in_enum")
    assert counts.get(E.MISSING_REQUIRED_PROPERTY, 0) == sum(
        1 for e in exp if e == "missing_required_property"
    )
    assert not res.passed


def test_clean_corpus_passes(corpus_sf0001):
    ds = read_sequences(str(testgen.clean_corpus_path("sf0.001")))
    spec = sequences_spec(allowed_sources=list(testgen.SOURCES))
    res = validate_dataset(ds, spec)
    assert res.counts_by_error() == {}
    assert res.passed


def test_column_stats_per_source(corpus_path, golden):
    ds = read_sequences(corpus_path, columns=["n_tok", "source"])
    stats = column_stats(ds, "n_tok", "source")
    got = {
        g: (c, mn, mx)
        for g, c, mn, mx in zip(
            stats["group"].to_pylist(),
            stats["cnt"].to_pylist(),
            stats["vmin"].to_pylist(),
            stats["vmax"].to_pylist(),
        )
    }
    src = golden["source"].to_pylist()
    ntk = golden["n_tok"].to_pylist()
    import collections

    exp_cnt = collections.Counter(src)
    for s, c in exp_cnt.items():
        assert got[s][0] == c
        vals = [n for x, n in zip(src, ntk) if x == s]
        assert got[s][1] == min(vals) and got[s][2] == max(vals)


def test_drift_detects_shift_not_self(corpus_sf0001):
    ref = ray.data.read_parquet(str(corpus_sf0001 / "drift_reference.parquet"))
    drifted = ray.data.read_parquet(str(corpus_sf0001 / "drift_drifted.parquet"))
    rep_self = drift_check(ref, ref)
    assert not rep_self["ks_drifted"] and not rep_self["chi2_drifted"]
    rep = drift_check(ref, drifted)
    assert rep["ks_drifted"] and rep["chi2_drifted"]


def test_sketch_merge_is_distribution_invariant(corpus_sf0001):
    """Sketching the same data at different batch sizes gives the same
    quantiles (merge associativity at the pipeline level)."""
    path = str(corpus_sf0001 / "drift_reference.parquet")
    ds = ray.data.read_parquet(path)
    b1 = sketch_dataset(ds, batch_size=2048)
    b2 = sketch_dataset(ds, batch_size=16384)
    assert b1.rows == b2.rows
    for q in (0.25, 0.5, 0.9):
        assert abs(b1.digest.quantile(q) - b2.digest.quantile(q)) < 0.02 * b2.digest.quantile(q)
    assert np.array_equal(b1.freq.counts, b2.freq.counts)


def test_duplicate_keys_hashed_matches_plain(corpus_sf0001):
    """The hash-weight shuffle scale path is exact (collisions confirmed
    away), matching the plain string groupby."""
    import pyarrow as pa

    from jesse_ray.engine import duplicate_keys, duplicate_keys_hashed
    from jesse_ray.sources import read_sequences
    from jesse_ray import testgen

    path = str(testgen.corpus_path("sf0.001"))
    plain = pa.concat_tables(
        list(
            duplicate_keys(read_sequences(path, columns=["doc_id"]), "doc_id").iter_batches(
                batch_format="pyarrow"
            )
        )
    ).sort_by("doc_id")
    hashed = duplicate_keys_hashed(read_sequences(path, columns=["doc_id"]), "doc_id")
    assert plain["doc_id"].to_pylist() == hashed["doc_id"].to_pylist()
    assert [int(x) for x in plain["cnt"].to_pylist()] == [int(x) for x in hashed["cnt"].to_pylist()]


def test_fused_matches_two_branch(corpus_sf0001):
    """The fused single-pass stage emits exactly the same violation rows
    as the separate row+referential branches."""
    from jesse_ray.engine import validate_dataset
    from jesse_ray.pipelines.queries import _seq_spec
    from jesse_ray.sources import read_sequences
    from jesse_ray import testgen

    path = str(testgen.corpus_path("sf0.001"))

    def canon(res):
        t = res.all_violations_table()
        rows = sorted(
            zip(
                [x or "" for x in t["doc_id"].to_pylist()],
                ["/".join(p) for p in t["path"].to_pylist()],
                t["error"].to_pylist(),
                t["value_json"].to_pylist(),
            )
        )
        return rows

    fused = validate_dataset(read_sequences(path), _seq_spec(), referential_concurrency=(1, 2))
    two = validate_dataset(
        read_sequences(path), _seq_spec(), referential_concurrency=(1, 2), fused=False
    )
    assert canon(fused) == canon(two)


def test_load_specs_and_json_report(tmp_path, corpus_sf0001):
    """jesse:load_schemas + jesse_error:to_json analogues."""
    import json

    import pyarrow as pa

    from jesse_ray.engine import ValidationEngine, violations_to_json

    (tmp_path / "a.json").write_text(json.dumps({"properties": {"x": {"minimum": 0}}}))
    (tmp_path / "b.json").write_text(json.dumps({"properties": {"y": {"type": "string"}}}))
    eng = ValidationEngine()
    assert eng.load_specs(str(tmp_path)) == ["a", "b"]
    compiled = eng.get("a")
    v = compiled.check_batch(pa.table({"x": pa.array([-1, 2]), "doc_id": pa.array(["d1", "d2"])}))
    rep = json.loads(violations_to_json(v))
    assert rep["reasons"][0]["error"] == "not_in_range"
    assert rep["reasons"][0]["invalid"] == "data"
    assert rep["reasons"][0]["path"] == ["x"]
    assert rep["reasons"][0]["data"] == -1


def test_uniqueness_hot_key_skew(ray_session):
    """Skew stressor: one doc_id with 50k copies must not blow up the
    shuffle — the map-side combiner collapses it to one row per batch
    before anything moves (SURVEY §7.3 skew defense)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from jesse_ray.engine import duplicate_keys_hashed

    n = 60_000
    ids = np.array([f"doc-{i:08d}" for i in range(n)], dtype=object)
    ids[10_000:] = "doc-hot"  # 50k copies of one key
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.string())}))
    tbl = duplicate_keys_hashed(ds, "doc_id", batch_size=8192)
    assert tbl.num_rows == 1
    assert tbl["doc_id"][0].as_py() == "doc-hot"
    assert tbl["cnt"][0].as_py() == 50_000


def test_multimodal_plumbing(ray_session):
    """Stubbed decode/resize/frame-sample stages: real Ray actor-pool
    plumbing, deterministic fake codec work."""
    import pytest

    import ray.data

    from jesse_ray.functions.multimodal import (
        DecodeImage,
        ResizeImage,
        SampleFrames,
        make_fake_media_table,
        sample_frames,
    )

    # compressed payloads still refuse to pretend without fake=True
    png_batch = make_fake_media_table(2)
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(png_batch)
    with pytest.raises(NotImplementedError):
        ResizeImage(fake=False)(png_batch)
    with pytest.raises(NotImplementedError):
        SampleFrames(fake=False)

    tbl = make_fake_media_table(16)
    ds = ray.data.from_arrow(tbl)
    frames = sample_frames(ds, n_frames=3, concurrency=(1, 2)).to_pandas()
    assert len(frames) == 16 * 3
    assert set(frames.columns) == {"media_id", "frame", "frame_digest"}
    # determinism: same payload + frame index → same digest
    again = sample_frames(ray.data.from_arrow(tbl), n_frames=3, concurrency=(1, 2)).to_pandas()
    a = frames.sort_values(["media_id", "frame"]).reset_index(drop=True)
    b = again.sort_values(["media_id", "frame"]).reset_index(drop=True)
    assert (a["frame_digest"] == b["frame_digest"]).all()

    resized = ds.map_batches(
        ResizeImage, fn_constructor_kwargs={"target": 224, "fake": True},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2),
    ).to_pandas()
    assert (resized["width"] == 224).all() and (resized["height"] == 224).all()


def test_checkpoint_drift_gate(tmp_path, corpus_sf0001):
    """Per-partition drift gating: a partition from the drifted corpus
    must be flagged against a clean-reference digest; the clean corpus
    itself must not."""
    from jesse_ray import testgen
    from jesse_ray.checkpoint import build_reference_digest, run_validation
    from jesse_ray.spec import TableSpec, ColumnSpec

    d = testgen.corpus_dir("sf0.001")
    ref_path = str(tmp_path / "ref.bin")
    build_reference_digest([str(d / "drift_reference.parquet")], ref_path)

    spec = TableSpec(key_column="doc_id")
    spec.columns["n_tok"] = ColumnSpec(type="integer", minimum=1)

    s_clean = run_validation(
        [str(d / "drift_reference.parquet")], spec, tmp_path / "clean",
        drift_reference=ref_path,
    )
    assert s_clean.get("drifted_partitions", 0) == 0

    s_drift = run_validation(
        [str(d / "drift_drifted.parquet")], spec, tmp_path / "drift",
        drift_reference=ref_path,
    )
    assert s_drift["drifted_partitions"] == 1


def test_driver_entry_contract(ray_session):
    """__ray_entry__ contract: entry() runs the flagship pipeline at
    sf0.001 with a stable schema; every oracle_sql() key has a queries()
    twin (the driver's correctness gate requires both)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    t = e.entry()
    assert t.num_rows > 0
    assert t.schema.names == ["doc_id", "path", "error", "value_json", "schema_fragment"]
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_multi_partition_resume(tmp_path, corpus_sf0001):
    """3 input files → 3 partitions; a rerun skips all; adding a file
    revalidates only the new partition (the 100 TB resume story)."""
    import pyarrow.parquet as pq

    from jesse_ray import testgen
    from jesse_ray.checkpoint import run_validation
    from jesse_ray.pipelines.queries import _seq_spec

    tbl = pq.read_table(str(testgen.corpus_path("sf0.001")))
    n = tbl.num_rows
    files = []
    for i in range(3):
        p = tmp_path / f"shard-{i}.parquet"
        pq.write_table(tbl.slice(i * n // 3, n // 3), p)
        files.append(str(p))

    out = tmp_path / "out"
    s1 = run_validation(files, _seq_spec(), out, files_per_partition=1)
    assert s1["partitions"] == 3 and s1["skipped"] == 0

    s2 = run_validation(files, _seq_spec(), out, files_per_partition=1)
    assert s2["skipped"] == 3
    assert s2["violations"] == s1["violations"]

    p4 = tmp_path / "shard-3.parquet"
    pq.write_table(tbl.slice(0, 100), p4)
    s3 = run_validation(files + [str(p4)], _seq_spec(), out, files_per_partition=1)
    assert s3["partitions"] == 4 and s3["skipped"] == 3


def test_checkpoint_drift_resume_and_fail_on_drift(tmp_path, corpus_sf0001):
    """Resumed runs restore drifted_partitions from the manifest, and
    fail_on_drift flips a drifted partition's verdict."""
    from jesse_ray import testgen
    from jesse_ray.checkpoint import build_reference_digest, run_validation
    from jesse_ray.spec import TableSpec, ColumnSpec

    d = testgen.corpus_dir("sf0.001")
    ref_path = str(tmp_path / "ref.bin")
    build_reference_digest([str(d / "drift_reference.parquet")], ref_path)

    spec = TableSpec(key_column="doc_id")
    spec.columns["n_tok"] = ColumnSpec(type="integer", minimum=1)

    out = tmp_path / "drift"
    s1 = run_validation([str(d / "drift_drifted.parquet")], spec, out, drift_reference=ref_path)
    assert s1["drifted_partitions"] == 1
    assert s1["passed"]  # advisory by default: clean rows, drift recorded only
    s2 = run_validation([str(d / "drift_drifted.parquet")], spec, out, drift_reference=ref_path)
    assert s2["skipped"] == 1
    assert s2["drifted_partitions"] == 1  # restored from the manifest

    s3 = run_validation(
        [str(d / "drift_drifted.parquet")], spec, tmp_path / "gate",
        drift_reference=ref_path, fail_on_drift=True,
    )
    assert s3["failed"] == 1 and not s3["passed"]


def test_jsonl_corpus_parity(tmp_path, corpus_sf0001):
    """A jsonl corpus (the reference CLI's native instance format) must
    validate identically to the same rows read from parquet."""
    import json as _json

    import pyarrow.parquet as pq

    from jesse_ray import testgen
    from jesse_ray.engine import validate_dataset
    from jesse_ray.pipelines.queries import _seq_spec
    from jesse_ray.sources import read_corpus, read_sequences

    pq_path = str(testgen.corpus_path("sf0.001"))
    rows = pq.read_table(pq_path, columns=["doc_id", "tokens", "n_tok", "source"]).to_pylist()
    jl = tmp_path / "seq.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    res_pq = validate_dataset(read_sequences(pq_path), _seq_spec(), check_unique=False)
    res_jl = validate_dataset(
        read_corpus(str(jl), format="jsonl"), _seq_spec(), check_unique=False
    )
    assert res_pq.counts_by_error() == res_jl.counts_by_error()


def test_cross_partition_duplicate_keys(tmp_path, ray_session):
    """Corpus-wide uniqueness: a doc_id duplicated across two checkpoint
    PARTITIONS must be reported (the per-partition check missed it)."""
    import pyarrow.parquet as pq

    from jesse_ray.checkpoint import run_validation
    from jesse_ray.spec import TableSpec, ColumnSpec

    def mk(path, ids):
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.string()),
                      "n_tok": pa.array([1] * len(ids), type=pa.int32())}),
            path,
        )

    a, b = tmp_path / "a.parquet", tmp_path / "b.parquet"
    mk(str(a), ["x-1", "x-2"])
    mk(str(b), ["x-2", "x-3"])  # x-2 duplicated ACROSS files

    spec = TableSpec(key_column="doc_id")
    spec.columns["doc_id"] = ColumnSpec(type="string", required=True)
    spec.unique_keys = ["doc_id"]

    s = run_validation([str(a), str(b)], spec, tmp_path / "out", files_per_partition=1)
    assert s["partitions"] == 2
    assert s["unique_violations"] == 1
    assert not s["passed"]
    uv = pq.read_table(tmp_path / "out" / "unique_violations.parquet")
    assert uv["doc_id"].to_pylist() == ["x-2"]


def test_csv_corpus_parity(tmp_path, ray_session):
    """A flat csv corpus must validate identically to the same rows read
    from parquet (csv carries no list columns — flat schemas only)."""
    import pyarrow.parquet as pq

    from jesse_ray.engine import validate_dataset
    from jesse_ray.sources import read_corpus
    from jesse_ray.spec import ColumnSpec, TableSpec

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "n_tok": pa.array([5, -1, 900, 30], type=pa.int64()),
        "source": pa.array(["web", "web", "book", "??"]),
    })
    pq_path = tmp_path / "flat.parquet"
    pq.write_table(tbl, pq_path)
    csv_path = tmp_path / "flat.csv"
    with open(csv_path, "w") as f:
        f.write("doc_id,n_tok,source\n")
        for r in tbl.to_pylist():
            f.write(f"{r['doc_id']},{r['n_tok']},{r['source']}\n")

    spec = TableSpec(
        columns={
            "doc_id": ColumnSpec(required=True),
            "n_tok": ColumnSpec(minimum=0, maximum=512),
            "source": ColumnSpec(pattern="^[a-z]+$"),
        }
    )
    from jesse_ray.sources import read_table

    res_pq = validate_dataset(read_table(str(pq_path)), spec, check_unique=False)
    res_csv = validate_dataset(
        read_corpus(str(csv_path), format="csv"), spec, check_unique=False
    )
    assert res_pq.counts_by_error() == res_csv.counts_by_error()
    assert sum(res_csv.counts_by_error().values()) > 0


def test_infer_spec_roundtrip(ray_session):
    import pyarrow as pa
    from jesse_ray.compiler import compile_spec
    from jesse_ray.engine import row_violations
    from jesse_ray.infer import infer_spec

    t = pa.table({
        "doc_id": ["a", "b", "c"],
        "tokens": pa.array([[1, 2], [3], [4, 5, 6]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([2, 1, 3], type=pa.int32()),
        "source": ["x", "y", "x"],
    })
    spec, ev = infer_spec(ray.data.from_arrow(t), key_column="doc_id")
    assert spec.columns["source"].enum == ["x", "y"]
    assert spec.columns["n_tok"].minimum == 1 and spec.columns["n_tok"].maximum == 3
    assert spec.columns["tokens"].min_items == 1 and spec.columns["tokens"].max_items == 3
    assert spec.columns["tokens"].items.minimum == 1 and spec.columns["tokens"].items.maximum == 6
    assert spec.unique_keys == ["doc_id"]
    # the corpus passes its own inferred spec
    assert row_violations(ray.data.from_arrow(t), compile_spec(spec)).count() == 0
    # a row outside the inferred bounds violates it
    bad = pa.table({
        "doc_id": ["z"],
        "tokens": pa.array([[99]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([9], type=pa.int32()),
        "source": ["nope"],
    })
    assert row_violations(ray.data.from_arrow(bad), compile_spec(spec)).count() > 0
    kinds = set(zip(ev["column"].to_pylist(), ev["constraint"].to_pylist()))
    assert ("source", "enum") in kinds and ("tokens", "item_maximum") in kinds


def test_infer_spec_json_schema_roundtrip(ray_session):
    """to_json_schema → from_json_schema rebuilds the SAME checks:
    the CLI's --infer-spec writes the schema then validates through the
    public loader, so serialization must preserve every constraint
    (including the uniqueKeys extension keyword)."""
    import json

    import pyarrow as pa
    from jesse_ray.compiler import compile_spec
    from jesse_ray.engine import row_violations
    from jesse_ray.infer import infer_spec, to_json_schema
    from jesse_ray.spec import from_json_schema

    t = pa.table({
        "doc_id": ["a", "b", "c"],
        "tokens": pa.array([[1, 2], [3], [4, 5, 6]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([2, 1, 3], type=pa.int32()),
        "source": ["x", "y", "x"],
    })
    spec, _ = infer_spec(ray.data.from_arrow(t), key_column="doc_id")
    doc = json.loads(json.dumps(to_json_schema(spec)))  # through-the-file fidelity
    assert doc["$schema"] == "http://json-schema.org/draft-04/schema#"
    assert sorted(doc["required"]) == ["doc_id", "n_tok", "source", "tokens"]
    assert doc["uniqueKeys"] == ["doc_id"]
    spec2 = from_json_schema(doc)
    assert spec2.unique_keys == ["doc_id"]
    assert spec2.columns["source"].enum == ["x", "y"]
    assert spec2.columns["tokens"].items.maximum == 6
    # reloaded spec accepts the corpus and rejects the same bad row
    assert row_violations(ray.data.from_arrow(t), compile_spec(spec2)).count() == 0
    bad = pa.table({
        "doc_id": ["z"],
        "tokens": pa.array([[99]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([9], type=pa.int32()),
        "source": ["nope"],
    })
    errs = row_violations(ray.data.from_arrow(bad), compile_spec(spec2))
    assert errs.count() == row_violations(
        ray.data.from_arrow(bad), compile_spec(spec)
    ).count() > 0


def test_orc_and_feather_readers_roundtrip(ray_session, tmp_path):
    import pyarrow.feather as feather
    import pyarrow.orc as orc

    import ray.data

    from jesse_ray.sources import read_corpus

    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(500)]),
        "tokens": pa.array([[i, i + 1, i + 2] for i in range(500)],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([3] * 500, type=pa.int32()),
    })
    op = str(tmp_path / "c.orc")
    fp = str(tmp_path / "c.feather")
    orc.write_table(t, op, stripe_size=4096)
    feather.write_feather(t, fp, chunksize=64, compression="uncompressed")

    for path, fmt in [(op, "orc"), (fp, "feather")]:
        ds = read_corpus(path, format=fmt, columns=["doc_id", "n_tok"])
        got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(got) == 500
        assert list(got.columns) == ["doc_id", "n_tok"]
        assert int(got["n_tok"].sum()) == 1500


def test_cli_curate_mode(ray_session, tmp_path, corpus_sf0001):
    """--curate writes the deduped clean corpus as source-partitioned
    parquet with a crash-safe manifest, alongside the validation run."""
    import glob as _glob

    from jesse_ray import run as cli

    out = str(tmp_path / "val")
    cur = str(tmp_path / "curated")
    rc = cli.main([
        "--input", str(testgen.corpus_path("sf0.001")),
        "--allowed-sources", str(testgen.allowed_sources_path("sf0.001")),
        "--output", out, "--curate", cur, "--no-resume",
    ])
    assert rc == 1  # dirty corpus still fails validation
    man = json.load(open(f"{cur}/_manifest.json"))
    assert man["n_rows"] > 0 and man["by"] == "source"
    files = _glob.glob(f"{cur}/source=*/*.parquet")
    assert files
    t = pa.concat_tables([pq.read_table(f) for f in files])
    # curated = unique doc ids, all from the allowed dimension
    ids = t["doc_id"].to_pylist()
    assert len(ids) == len(set(ids)) == man["n_rows"]
    assert set(t["source"].to_pylist()) <= set(testgen.SOURCES)


def test_sigkill_mid_run_resume_consistency(ray_session, tmp_path):
    """Checkpoint-scale e2e (VERDICT r2 item #10): a run_validation with
    drift gating + corpus uniqueness is SIGKILLed mid-run in a child
    process; the resume (a) skips exactly the partitions whose manifest
    records survived the kill, (b) tolerates a torn last manifest line,
    (c) re-executes the corpus-scoped uniqueness pass, and (d) lands on
    the same totals as an uninterrupted run."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    from jesse_ray import testgen
    from jesse_ray.checkpoint import (
        Manifest, build_reference_digest, run_validation,
    )
    from jesse_ray.pipelines.queries import _seq_spec

    testgen.generate("sf0.01")
    tbl = pq.read_table(str(testgen.corpus_path("sf0.01")))
    n = tbl.num_rows
    files = []
    for i in range(4):
        p = tmp_path / f"shard-{i}.parquet"
        pq.write_table(tbl.slice(i * n // 4, n // 4), p)
        files.append(str(p))
    ref_path = str(tmp_path / "ref.bin")
    build_reference_digest([str(testgen.clean_corpus_path("sf0.01"))], ref_path)

    out = tmp_path / "out"
    child_code = f"""
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
from jesse_ray.checkpoint import run_validation
from jesse_ray.pipelines.queries import _seq_spec
run_validation({files!r}, _seq_spec(), {str(out)!r}, files_per_partition=1,
               drift_reference={ref_path!r}, fail_on_drift=True)
"""
    child = subprocess.Popen([sys.executable, "-c", child_code],
                             stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    manifest_path = out / "manifest.jsonl"
    deadline = _time.time() + 180
    while _time.time() < deadline:
        if manifest_path.exists() and manifest_path.read_text().count("\n") >= 1:
            break
        if child.poll() is not None:
            break  # finished before we could kill — still a valid resume test
        _time.sleep(0.02)
    if child.poll() is None:
        os.kill(child.pid, signal.SIGKILL)
    child.wait()

    survived = Manifest(manifest_path).load()
    n_survived = len(survived)
    assert n_survived >= 1, "kill landed before any partition completed"
    # simulate the worst-case torn write the SIGKILL can leave behind
    with open(manifest_path, "a") as f:
        f.write('{"partition_id": "part-torn", "fragm')

    resumed = run_validation(files, _seq_spec(), out, files_per_partition=1,
                             drift_reference=ref_path, fail_on_drift=True)
    assert resumed["partitions"] == 4
    assert resumed["skipped"] == n_survived  # only un-checkpointed work reran
    # uniqueness is corpus-scoped: it must re-execute on resume
    uniq = out / "unique_violations.parquet"
    assert uniq.exists() and uniq.stat().st_mtime >= _time.time() - 120

    fresh = run_validation(files, _seq_spec(), tmp_path / "fresh",
                           files_per_partition=1,
                           drift_reference=ref_path, fail_on_drift=True)
    for k in ("violations", "failed", "unique_violations", "passed",
              "drifted_partitions"):
        assert resumed[k] == fresh[k], k
    # manifest is now complete and self-consistent: 4 valid records
    final = Manifest(manifest_path).load()
    assert len(final) == 4
    assert all(r.spec_version == next(iter(final.values())).spec_version
               for r in final.values())


def test_spec_store_mtime_refresh(tmp_path):
    """jesse_database:list_outdated/1 parity (src/jesse_database.erl:
    251-283): a new file is outdated; a touched file is outdated; an
    unchanged file keeps its compiled entry."""
    import json as _json
    import os as _os
    import time as _time

    from jesse_ray.engine import ValidationEngine

    d = tmp_path / "specs"
    d.mkdir()
    (d / "a.json").write_text(_json.dumps(
        {"properties": {"n_tok": {"type": "integer", "minimum": 0}}}))
    eng = ValidationEngine()
    assert eng.load_specs(str(d)) == ["a"]
    a0 = eng.get("a")
    assert eng.list_outdated(str(d)) == []
    assert eng.refresh_specs(str(d)) == []
    assert eng.get("a") is a0  # unchanged file keeps its compiled form

    # new file -> outdated -> refresh loads it
    (d / "b.json").write_text(_json.dumps(
        {"properties": {"source": {"type": "string"}}}))
    assert [p.endswith("b.json") for p in eng.list_outdated(str(d))] == [True]
    assert eng.refresh_specs(str(d)) == ["b"]
    assert eng.get("b").spec.columns

    # touched file (newer mtime) -> recompiled
    _time.sleep(0.01)
    (d / "a.json").write_text(_json.dumps(
        {"properties": {"n_tok": {"type": "integer", "minimum": 5}}}))
    _os.utime(d / "a.json")
    assert eng.refresh_specs(str(d)) == ["a"]
    assert eng.get("a") is not a0
