"""Round-9 property tests: the two staged_r11 operators replayed
against pure-Python re-implementations of their EXACT algorithms on
random inputs — a stronger signal than the fixed-corpus oracle because
the input distribution varies per run of the generator seed sweep.

The Python references replicate the quantization contract precisely:
half-away-from-zero rounding at scale, floor(sum/count) centroid
updates through IEEE double division, integer-exact cosine threshold —
any drift in the Spark implementation's arithmetic breaks equality,
not approximate closeness."""

from __future__ import annotations

import hashlib
import math
import random


def _q(x: float, scale: int = 1_000_000) -> int:
    """Spark F.round(x * scale) — HALF_UP (away from zero)."""
    v = x * scale
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _py_kmeans_assign(vecs: dict[int, list[float]], k: int, iters: int):
    """Quantized Lloyd per operators/similarity.kmeans_lloyd: seeds =
    the k smallest ids' vectors; argmin integer sq distance with
    cluster-id tie-break; centroid = floor(double(sum)/count)."""
    q = {i: [_q(x) for x in v] for i, v in vecs.items()}
    cents = {c: q[c] for c in sorted(q) if c < k}

    def assign():
        out = {}
        for i, qv in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(qv, cents[c])), c)
                for c in cents
            )
            out[i] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        new = {}
        for c in set(a.values()):
            members = [q[i] for i in q if a[i] == c]
            new[c] = [
                math.floor(float(sum(col)) / len(members))
                for col in zip(*members)
            ]
        cents = new
    return assign(), q


def _py_semdedup(vecs, k, iters, tau_mil):
    a, q = _py_kmeans_assign(vecs, k, iters)
    n2 = {i: sum(x * x for x in qv) for i, qv in q.items()}
    dropped = set()
    ids = sorted(vecs)
    for i, ida in enumerate(ids):
        for idb in ids[i + 1:]:
            if a[ida] != a[idb]:
                continue
            dot = sum(x * y for x, y in zip(q[ida], q[idb]))
            if dot > 0 and dot * dot * 1_000_000 >= (
                tau_mil * tau_mil * n2[ida] * n2[idb]
            ):
                dropped.add(idb)
    return {i: (a[i], i in dropped) for i in vecs}


def test_semdedup_matches_python_reference_on_random_vectors(spark):
    from remap_spark.operators.similarity import semdedup

    rng = random.Random(909)
    for trial in range(3):
        n, dim, k = 40, 6, 4
        vecs = {}
        for i in range(n):
            if i >= 10 and rng.random() < 0.3:
                # planted near-duplicate of an earlier vector
                base = vecs[rng.randrange(i)]
                vecs[i] = [x + rng.uniform(-0.01, 0.01) for x in base]
            else:
                vecs[i] = [rng.uniform(-1, 1) for _ in range(dim)]
        want = _py_semdedup(vecs, k, 2, 900)
        df = spark.createDataFrame(
            [(i, v) for i, v in sorted(vecs.items())],
            "vec_id bigint, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["cluster"], r["dropped"])
            for r in semdedup(df, k=k, iters=2, tau_mil=900).collect()
        }
        assert got == want, (trial, {
            i: (got[i], want[i]) for i in got if got[i] != want[i]
        })


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


_PUNCT = str.maketrans('.,?:;!"', "       ")


def _py_dsir_weights(raw, target, buckets=1024, salt=""):
    def prof(text):
        out = {}
        for w in text.lower().translate(_PUNCT).split():
            b = _h32(w + "|dsir|" + salt) % buckets
            out[b] = out.get(b, 0) + 1
        return out

    raw_prof = {i: prof(t) for i, t in raw.items()}
    rc, tc = {}, {}
    for p in raw_prof.values():
        for b, c in p.items():
            rc[b] = rc.get(b, 0) + c
    for t in target.values():
        for b, c in prof(t).items():
            tc[b] = tc.get(b, 0) + c
    rt, tt = sum(rc.values()), sum(tc.values())
    lr = {
        b: math.log((tc.get(b, 0) + 1.0) / (tt + buckets))
        - math.log((rc.get(b, 0) + 1.0) / (rt + buckets))
        for b in set(rc) | set(tc)
    }
    return {
        i: sum(c * lr[b] for b, c in p.items())
        for i, p in raw_prof.items()
        if p
    }


def test_dsir_weights_match_python_reference_on_random_corpora(spark):
    from remap_spark.operators.split import dsir_log_weights

    rng = random.Random(911)
    vocab_t = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_r = ["zeta", "eta", "theta", "iota", "kappa", "lambda"]
    raw = {}
    for i in range(30):
        words = [
            rng.choice(vocab_t if rng.random() < 0.4 else vocab_r)
            for _ in range(rng.randint(1, 12))
        ]
        raw[i] = " ".join(words)
    target = {100 + i: " ".join(rng.choices(vocab_t, k=8)) for i in range(5)}
    want = _py_dsir_weights(raw, target)
    raw_df = spark.createDataFrame(
        sorted(raw.items()), "doc_id bigint, text string"
    )
    tgt_df = spark.createDataFrame(
        sorted(target.items()), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw_df, tgt_df).collect()
    }
    assert set(got) == set(want)
    for i in got:
        # float-sum order differs between engines; equality to 1e-9
        # relative is the realistic contract (sums of <=12 terms)
        assert abs(got[i] - want[i]) <= 1e-9 * max(1.0, abs(want[i])), (
            i, got[i], want[i]
        )
