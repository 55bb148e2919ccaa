"""Property-based tests (hypothesis) for the pure-Python components:
posting codec round-trips and tokenizer-twin parity.  No SparkSession —
these run in milliseconds and pin down edge cases the example-based
tests can miss (empty arrays, u64 boundaries, unicode oddities)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from resin_spark import postings as P
from resin_spark.tokenizer import tokenize_pandas, tokenize_py


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert (P.varint_decode(P.varint_encode(v)) == v).all()


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
             min_size=0, max_size=200),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_varint_segmented_matches_per_row(values, data):
    v = np.array(values, dtype=np.uint64)
    # random split points (sorted, bounded by len)
    n_cuts = data.draw(st.integers(min_value=0, max_value=5))
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=len(v)),
        min_size=n_cuts, max_size=n_cuts)))
    off = np.array([0] + cuts + [len(v)], dtype=np.int64)
    segs = P.varint_encode_segmented(v, off)
    for i in range(len(off) - 1):
        assert segs[i] == P.varint_encode(v[off[i]:off[i + 1]])


@given(st.lists(st.integers(min_value=-(1 << 62), max_value=1 << 62),
                min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_docid_delta_roundtrip(values):
    d = np.sort(np.array(values, dtype=np.int64))
    assert (P.decode_doc_ids(P.encode_doc_ids(d)) == d).all()


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_tokenizer_twins_agree(text):
    """The pure-Python oracle tokenizer and the pandas (Arrow batch)
    tokenizer must agree on arbitrary unicode input.  (Parity with the
    JVM tokens_col is asserted on the fixture corpus in test_tokenizer —
    a Spark roundtrip per hypothesis example would be too slow.)

    Skip inputs where Python's str.lower() expands a char into multiple
    (e.g. İ -> i̇): the regex twin keeps combining marks inside the token
    while the char-loop oracle drops them — neither occurs in the
    fixture/transcript corpora, and the JVM path defines the engine's
    semantics anyway (documented deviation, tokenizer.py)."""
    if any(len(ch.lower()) != 1 for ch in text):
        return
    py = tokenize_py(text)
    pdres = tokenize_pandas(pd.Series([text]))[0]
    assert py == list(pdres)


def _enc(doc_ids, tfs, dls, term="t"):
    """Run the sorted-run encoder on one synthetic (field, term, block)
    group (rows must be doc_id-sorted, as the shuffle sorter guarantees)."""
    from resin_spark.build import _encode_sorted_arrays

    n = len(doc_ids)
    return _encode_sorted_arrays(
        np.array(["text"] * n, dtype=object),
        np.array([term] * n, dtype=object),
        np.zeros(n, dtype=np.int64),
        np.asarray(doc_ids, dtype=np.int64),
        np.asarray(tfs, dtype=np.int64),
        np.asarray(dls, dtype=np.int64),
    )


@given(st.lists(st.integers(min_value=0, max_value=1 << 40),
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=100, deadline=None)
def test_encode_blocks_merges_duplicates(doc_ids, tf_each):
    """The block encoder's dedup+tf semantics: feeding each doc k times
    with tf=1 equals feeding it once with tf=k."""
    d = np.sort(np.array(doc_ids, dtype=np.int64))
    dl = np.abs(d) % 97 + 1
    a = _enc(np.repeat(d, tf_each), np.ones(len(d) * tf_each, dtype=np.int64),
             np.repeat(dl, tf_each))
    b = _enc(d, np.full(len(d), tf_each, dtype=np.int64), dl)
    assert a["doc_ids_bin"][0] == b["doc_ids_bin"][0]
    assert a["tfs_bin"][0] == b["tfs_bin"][0]
    assert a["dls_bin"][0] == b["dls_bin"][0]
    assert a["df_block"][0] == b["df_block"][0]
    assert a["max_tf"][0] == b["max_tf"][0]
    assert a["sum_tf"][0] == b["sum_tf"][0]


@given(st.lists(st.tuples(st.integers(0, 500), st.integers(1, 9),
                          st.integers(1, 60)),
                min_size=1, max_size=150))
@settings(max_examples=100, deadline=None)
def test_encode_decode_roundtrip_matches_dict(rows):
    """Encoder vs a dict-based reference: decoded postings equal a plain
    per-doc tf-sum / first-dl merge of the sorted occurrence rows."""
    from resin_spark.postings import (decode_counts, decode_doc_ids)

    rows = sorted((d, tf, dl) for d, tf, dl in rows)
    # dl must be consistent per doc (it is per (doc, field) in real data)
    dl_of = {}
    norm = []
    for d, tf, dl in rows:
        dl_of.setdefault(d, dl)
        norm.append((d, tf, dl_of[d]))
    out = _enc([r[0] for r in norm], [r[1] for r in norm], [r[2] for r in norm])
    want: dict[int, list] = {}
    for d, tf, dl in norm:
        if d in want:
            want[d][0] += tf
        else:
            want[d] = [tf, dl]
    got_docs = decode_doc_ids(out["doc_ids_bin"][0]).tolist()
    got_tfs = decode_counts(out["tfs_bin"][0]).tolist()
    got_dls = decode_counts(out["dls_bin"][0]).tolist()
    assert got_docs == sorted(want)
    assert got_tfs == [want[d][0] for d in got_docs]
    assert got_dls == [want[d][1] for d in got_docs]
    assert out["df_block"][0] == len(want)
    assert out["sum_tf"][0] == sum(v[0] for v in want.values())
    assert out["max_tf"][0] == max(v[0] for v in want.values())
    assert out["min_dl"][0] == min(v[1] for v in want.values())


# ---------------------------------------------------------------- vectors

_vec = st.dictionaries(
    st.integers(min_value=0, max_value=1 << 20),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False, width=32),
    max_size=50,
)


@given(_vec)
@settings(max_examples=200, deadline=None)
def test_vec_serialize_roundtrip_property(v):
    from resin_spark import vectorspace as vs

    v32 = {k: float(np.float32(x)) for k, x in v.items()}
    assert vs.deserialize_vec_py(vs.serialize_vec_py(v32)) == v32


@given(_vec, _vec)
@settings(max_examples=200, deadline=None)
def test_vec_algebra_properties(a, b):
    from resin_spark import vectorspace as vs

    # Vector.cs:94-97 Add commutes
    assert vs.vec_add_py(a, b) == vs.vec_add_py(b, a)
    # Vector.cs:99-108 Subtract self = empty (CoerceZero drops zeros)
    assert vs.vec_subtract_py(a, a) == {}
    # Shift is key-translation only (Vector.cs:143-158)
    sh = vs.vec_shift_py(a, 7)
    assert sorted(sh.values()) == sorted(a.values())
    assert set(sh) == {k + 7 for k in a}
    # scale by 1 is identity; average(a, a) == a
    assert vs.vec_scale_py(a, 1.0) == a
    assert vs.vec_average_py(a, a) == a


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_cbow_component_mass_invariant(text):
    """The oracle's invariant: each CBOW vector's component sum equals
    the lengths of its context tokens (or its own when neighbourless)."""
    from resin_spark import vectorspace as vs
    from resin_spark.tokenizer import tokenize_py

    toks = tokenize_py(text)
    out = vs.cbow_py(text)
    assert [lab for lab, _ in out] == toks
    for i, (_lab, vec) in enumerate(out):
        if len(toks) == 1:
            want = len(toks[0])
        else:
            want = (len(toks[i - 1]) if i > 0 else 0) + (
                len(toks[i + 1]) if i + 1 < len(toks) else 0)
        assert vs.map_sum_py(vec) == want
