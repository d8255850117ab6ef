"""Property-based tests (Hypothesis) for the pure-Python document
kernel — invariants that hold for ANY JSON document, not just the
fixtures. The reference has no property tests (SURVEY.md §5); these
guard the semantics the whole pipeline rests on.
"""

from __future__ import annotations

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from couchwarehouse_spark.operators.document import (
    discover_schema,
    extract_seq_number,
    flatten_doc,
    sanitize_identifier,
    typeof,
)

# JSON-ish documents: keys are simple identifiers (as in real Couch
# docs), values nest dicts/lists/scalars a few levels deep.
keys = st.text(string.ascii_lowercase, min_size=1, max_size=8)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(keys, children, max_size=4),
    ),
    max_leaves=12,
)
documents = st.dictionaries(keys, json_values, max_size=6)


@settings(max_examples=200, deadline=None)
@given(documents)
def test_flatten_produces_only_scalars(doc):
    """Post-flatten, every value is a scalar (dicts recursed away,
    lists serialized, Nones dropped) — the invariant that makes the
    wide row valid (reference lib/flatten.js contract)."""
    flat = flatten_doc(doc)
    for k, v in flat.items():
        assert not isinstance(v, (dict, list)), (k, v)
        assert v is not None


@settings(max_examples=200, deadline=None)
@given(documents)
def test_flatten_idempotent_on_flat_docs(doc):
    """Flattening an already-flat doc is the identity (minus renames)."""
    once = flatten_doc(doc)
    twice = flatten_doc(once)
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(documents)
def test_discover_types_are_valid_and_match_values(doc):
    """discover() emits only the 3 logical types, one per flattened
    column, consistent with each value's typeof."""
    flat = flatten_doc(doc)
    schema = discover_schema(doc)
    assert set(schema) == set(flat)
    for col, logical in schema.items():
        assert logical in ("string", "number", "boolean")
        assert typeof(flat[col]) == logical


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(keys, json_values, max_size=4))
def test_flatten_arrays_are_valid_json(doc):
    """Serialized arrays must parse back to the original list."""
    flat = flatten_doc(doc)

    def walk(obj, prefix=""):
        for k, v in obj.items():
            name = f"{prefix}_{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            elif isinstance(v, (list, tuple)):
                assert json.loads(flat[name]) == json.loads(
                    json.dumps(list(v))
                ), name

    walk({("id" if k == "_id" else "rev" if k == "_rev" else k): v for k, v in doc.items()})


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**53),
    st.text(string.ascii_letters + string.digits + "-_", max_size=10),
)
def test_seq_roundtrip(n, suffix):
    # CouchDB seq tokens are '<n>-<opaque base64-ish>' — single line.
    token = f"{n}-{suffix}"
    assert extract_seq_number(token) == n


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30))
def test_sanitize_removes_every_dash(name):
    assert "-" not in sanitize_identifier(name)


# ---- Mango selector compiler vs reference evaluator ------------------

from hypothesis import settings
from pyspark.sql import Row

from couchwarehouse_spark.functions.mango import compile_selector

_ROWS = [
    Row(id=i, age=a, city=c, tag=t)
    for i, (a, c, t) in enumerate(
        [
            (30.0, "york", None), (45.0, "leeds", "x"), (20.0, "york", "y"),
            (60.0, None, None), (None, "hull", "x"), (25.0, "york", "x"),
            (None, None, None), (45.0, "hull", None),
        ]
    )
]

_leaf_ops = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$exists"])
_fields = st.sampled_from(["age", "city", "tag"])
_values = {
    "age": st.sampled_from([20.0, 30.0, 45.0, 61.0]),
    "city": st.sampled_from(["york", "hull", "nope"]),
    "tag": st.sampled_from(["x", "y", "z"]),
}


@st.composite
def _selectors(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        f = draw(_fields)
        op = draw(_leaf_ops)
        if op == "$exists":
            return {f: {"$exists": draw(st.booleans())}}
        if op == "$in":
            vals = draw(st.lists(_values[f], min_size=1, max_size=3))
            return {f: {"$in": vals}}
        return {f: {op: draw(_values[f])}}
    kind = draw(st.sampled_from(["$and", "$or", "$not"]))
    if kind == "$not":
        return {"$not": draw(_selectors(depth=depth - 1))}
    subs = draw(st.lists(_selectors(depth=depth - 1), min_size=2, max_size=3))
    return {kind: subs}


def _eval(sel, row) -> bool:
    """Reference Mango evaluator: leaves are False on any NULL
    involvement except $ne/$exists — outcome-equivalent to Spark's
    three-valued logic under filter (only TRUE survives)."""
    out = True
    for key, val in sel.items():
        if key == "$and":
            out = out and all(_eval(s, row) for s in val)
        elif key == "$or":
            out = out and any(_eval(s, row) for s in val)
        elif key == "$not":
            out = out and not _eval(val, row)
        else:
            v = row[key]
            for op, arg in val.items():
                if op == "$eq":
                    ok = v is not None and v == arg
                elif op == "$ne":
                    ok = v is None or v != arg
                elif op == "$gt":
                    ok = v is not None and v > arg
                elif op == "$gte":
                    ok = v is not None and v >= arg
                elif op == "$lt":
                    ok = v is not None and v < arg
                elif op == "$lte":
                    ok = v is not None and v <= arg
                elif op == "$in":
                    ok = v is not None and v in arg
                elif op == "$exists":
                    ok = (v is not None) if arg else (v is None)
                out = out and ok
    return out


@given(sel=_selectors())
@settings(max_examples=25, deadline=None)
def test_mango_matches_reference_semantics(spark, sel):
    df = spark.createDataFrame(_ROWS)
    got = sorted(r["id"] for r in df.filter(compile_selector(sel)).collect())
    want = sorted(r["id"] for r in _ROWS if _eval(sel, r.asDict()))
    assert got == want, sel


# -- CDC invariant: applying the delta reproduces the new state -------
_states = st.dictionaries(
    st.integers(min_value=0, max_value=15),          # key space forces overlap
    st.integers(min_value=1, max_value=100),         # seq / version stamp
    max_size=10,
)


@given(old_map=_states, new_map=_states)
@settings(max_examples=12, deadline=None)
def test_cdc_payload_apply_reproduces_new_state(spark, old_map, new_map):
    """For ANY pair of keyed states: applying snapshot_diff's
    cdc_payload (upsert changed/inserted keys, drop deleted keys)
    onto the old state yields EXACTLY the new state — the invariant
    every incremental sink follow relies on."""
    import pandas as pd

    from couchwarehouse_spark.operators.upsert import (
        DELETED_COL,
        cdc_payload,
        snapshot_diff,
    )

    def frame(m):
        pdf = pd.DataFrame(
            {"id": [f"d{k}" for k in m], "_cw_seq": list(m.values())},
        )
        if pdf.empty:
            pdf = pd.DataFrame({"id": pd.Series(dtype="str"),
                                "_cw_seq": pd.Series(dtype="int64")})
        return spark.createDataFrame(pdf, "id string, _cw_seq long")

    old, new = frame(old_map), frame(new_map)
    payload = cdc_payload(snapshot_diff(old, new), new).collect()

    model = {f"d{k}": v for k, v in old_map.items()}
    for row in payload:
        if row[DELETED_COL]:
            model.pop(row["id"], None)
        else:
            model[row["id"]] = row["_cw_seq"]
    assert model == {f"d{k}": v for k, v in new_map.items()}


# -- Kneser-Ney scorer model check: Spark vs a pure-Python reference --
def _kn_reference(train_texts, test_docs, d_num=3, d_den=4):
    """Pure-Python interpolated-KN bigram scorer mirroring
    plans.text.kneser_ney_bigram_scores' definition exactly.

    Term quantization mirrors the Spark lane bit-for-bit (r7 verdict
    #1): integer NANO-nats rounded HALF_UP on the shortest decimal
    repr via ``Decimal(repr(x))`` — exactly what JVM ``F.round`` does
    (``BigDecimal.valueOf(double)`` + ``setScale(0, HALF_UP)``) — not
    Python ``round()``, whose half-to-even tie rule flipped a
    hypothesis-found near-``.5`` term in round 7."""
    import math
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    def _half_up_nano(x):
        return int(
            Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    def _half_up_6dp(x):
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    bgc = Counter()
    for t in train_texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            bgc[(a, b)] += 1
    c1 = Counter()
    n1w1 = Counter()
    n1w2 = Counter()
    for (a, b), c in bgc.items():
        c1[a] += c
        n1w1[a] += 1
        n1w2[b] += 1
    T = len(bgc)
    V = len(n1w2)
    tv1 = T + V + 1
    per_lang = defaultdict(lambda: [0, 0, 0])  # n, backoff, micro_sum
    for lang, t in test_docs:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            if a in c1:
                num = (
                    max(d_den * bgc.get((a, b), 0) - d_num, 0) * tv1
                    + d_num * n1w1[a] * (n1w2.get(b, 0) + 1)
                )
                p = num / (d_den * c1[a] * tv1)
                backoff = 0
            else:
                p = (n1w2.get(b, 0) + 1) / tv1
                backoff = 1
            cell = per_lang[lang]
            cell[0] += 1
            cell[1] += backoff
            cell[2] += _half_up_nano(1_000_000_000 * -math.log(p))
    return {
        lang: (n, bo, _half_up_6dp(nano / 1_000_000_000 / n))
        for lang, (n, bo, nano) in per_lang.items()
    }


_kn_vocab = st.sampled_from(["aa", "bb", "cc", "dd"])
_kn_text = st.lists(_kn_vocab, min_size=2, max_size=12).map(" ".join)


@given(texts=st.lists(_kn_text, min_size=2, max_size=6), data=st.data())
@settings(max_examples=6, deadline=None)
def test_kneser_ney_matches_python_reference(spark, texts, data):
    """For ANY tiny corpus over a colliding vocabulary, the Spark KN
    scorer equals a direct Python transcription of the formula —
    train/test membership decided by the REAL split gate."""
    import pyspark.sql.functions as F

    from couchwarehouse_spark.plans.sampling import (
        TRAIN_PCT,
        VAL_PCT,
        _split_bucket,
    )
    from couchwarehouse_spark.plans.text import kneser_ney_bigram_scores

    buckets = {
        r["id"]: r["b"]
        for r in spark.range(300)
        .select("id", _split_bucket(F.col("id")).alias("b"))
        .collect()
    }
    train_ids = [i for i, b in buckets.items() if b < TRAIN_PCT]
    test_ids = [i for i, b in buckets.items() if b >= TRAIN_PCT + VAL_PCT]
    # At least one train and one test doc; assign rest arbitrarily.
    n_train = data.draw(st.integers(min_value=1, max_value=len(texts) - 1))
    rows, train_texts, test_docs = [], [], []
    for j, t in enumerate(texts):
        if j < n_train:
            rows.append((train_ids[j], t, "en", "s0"))
            train_texts.append(t)
        else:
            rows.append((test_ids[j], t, "en", "s0"))
            test_docs.append(("en", t))
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r["lang"]: (
                r["n_transitions"],
                r["n_ctx_backoff"],
                r["avg_surprisal"],
            )
            for r in kneser_ney_bigram_scores(spark, tmp).collect()
        }
    assert out == _kn_reference(train_texts, test_docs)


# -- Dunning G² collocations model check ------------------------------
def _llr_reference(texts, min_count=5, top_k=20):
    """Pure-Python G² mirroring plans.text.collocation_llr_pairs."""
    import math
    from collections import Counter

    c12 = Counter()
    for t in texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
    rr = Counter()
    col = Counter()
    for (a, b), c in c12.items():
        rr[a] += c
        col[b] += c
    n = sum(c12.values())

    def term(k, r, c):
        if k <= 0:
            return 0
        return round(1_000_000 * k * math.log(k * n / (r * c)))

    scored = []
    for (a, b), c in c12.items():
        if c < min_count:
            continue
        k11, k12 = c, rr[a] - c
        k21 = col[b] - c
        k22 = n - rr[a] - col[b] + c
        llr = 2 * (
            term(k11, rr[a], col[b])
            + term(k12, rr[a], n - col[b])
            + term(k21, n - rr[a], col[b])
            + term(k22, n - rr[a], n - col[b])
        )
        scored.append((a, b, c, llr))
    scored.sort(key=lambda x: (-x[3], x[0], x[1]))
    return [
        (a, b, c, round(llr / 1_000_000, 4)) for a, b, c, llr in scored[:top_k]
    ]


_llr_vocab = st.sampled_from(["pp", "qq", "rr"])
_llr_text = st.lists(_llr_vocab, min_size=4, max_size=16).map(" ".join)


@given(texts=st.lists(_llr_text, min_size=3, max_size=6))
@settings(max_examples=6, deadline=None)
def test_collocation_llr_matches_python_reference(spark, texts):
    """For ANY tiny colliding-vocabulary corpus, the Spark G²
    collocation ranking equals a direct Python transcription of
    Dunning's formula (same micro-nat quantization, same tie-break)."""
    import os
    import tempfile

    from couchwarehouse_spark.plans.text import collocation_llr_pairs

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = [
            (r["w1"], r["w2"], r["n_cooccur"], r["llr"])
            for r in collocation_llr_pairs(spark, tmp).collect()
        ]
    assert got == _llr_reference(texts)
