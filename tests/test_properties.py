"""Property-based tests (hypothesis) for scalar kernels and the
closure operator — the engine's analogue of fuzzing the reference's
SalesforceId/transform units."""

import pytest

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amaxa_spark.ids import normalize_sfid

ID_ALPHABET = string.ascii_letters + string.digits


@given(st.text(alphabet=ID_ALPHABET, min_size=15, max_size=15))
def test_sfid_idempotent_and_stable(s):
    n = normalize_sfid(s)
    assert len(n) == 18
    assert n[:15] == s
    # canonicalization is idempotent
    assert normalize_sfid(n) == n


@given(st.text(alphabet=ID_ALPHABET, min_size=15, max_size=15))
def test_sfid_checksum_case_insensitive_recovery(s):
    """The 18-char form is case-insensitive: two IDs differing only in
    case produce different checksums (the checksum encodes the case)."""
    n = normalize_sfid(s)
    flipped = s.swapcase()
    if flipped != s:
        assert normalize_sfid(flipped)[15:] != n[15:] or not any(
            c.isalpha() for c in s
        )


@st.composite
def forests(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    parents = {}
    for i in range(1, n):
        has_parent = draw(st.booleans())
        if has_parent:
            parents[i] = draw(st.integers(min_value=0, max_value=i - 1))
    return n, parents


def _python_closure(n, parents, seed):
    """Reference closure: BFS over undirected parent edges."""
    adj = {i: set() for i in range(n)}
    for child, parent in parents.items():
        adj[child].add(parent)
        adj[parent].add(child)
    seen, frontier = {seed}, [seed]
    while frontier:
        nxt = []
        for x in frontier:
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    nxt.append(y)
        frontier = nxt
    return seen


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(forests())
# fast default siblings: test_scale_utils.py pointer-doubling tests,
# test_extract.py closure tests (same operators, fixed fixtures)
@pytest.mark.slow
def test_closure_matches_bfs(spark, forest):
    from amaxa_spark.metadata import SchemaRegistry, TableMeta
    from amaxa_spark.operators.extract import ExtractOperation
    from amaxa_spark.plans.plan import ExtractScope, ExtractStepPlan
    from amaxa_spark.sources.catalog import TableCatalog

    n, parents = forest
    rows = [(str(i), str(parents[i]) if i in parents else None) for i in range(n)]
    df = spark.createDataFrame(rows, "Id: string, ParentId: string")
    cat = TableCatalog(spark, "/tmp/none")
    cat.register("T", df)
    reg = SchemaRegistry([TableMeta("T", lookups={"ParentId": ["T"]})])
    res = ExtractOperation(
        spark,
        cat,
        reg,
        [ExtractStepPlan("T", ExtractScope.SELECTED_IDS, ids=["0"])],
    ).run()
    got = {int(r.Id) for r in res["T"].collect()}
    assert got == _python_closure(n, parents, 0)


def _rand_rows(seed, n, key_range, t_range, v_range=1000):
    import random

    rng = random.Random(seed)
    return [
        (i, rng.randrange(key_range), rng.randrange(t_range), float(rng.randrange(v_range)))
        for i in range(n)
    ]


def test_asof_join_matches_naive(spark):
    """Randomized cross-check: the union+window as-of join equals the
    per-row 'latest right at-or-before' reference computation."""
    import datetime as dt

    from amaxa_spark.operators.asof import asof_join

    base = dt.datetime(2026, 1, 1)

    for seed in (1, 2, 3):
        lrows = _rand_rows(seed, 60, 5, 50)
        rrows = _rand_rows(seed + 100, 40, 5, 50)
        left = spark.createDataFrame(
            [(i, k, base + dt.timedelta(seconds=t)) for i, k, t, _ in lrows],
            "eid: long, k: long, t: timestamp",
        )
        right = spark.createDataFrame(
            [(k, base + dt.timedelta(seconds=t), v) for _, k, t, v in rrows],
            "k: long, t: timestamp, v: double",
        )
        # right side must be unique per (k, t) for a deterministic answer
        right = right.groupBy("k", "t").agg(F.max("v").alias("v"))
        got = {
            r.eid: r.v_r
            for r in asof_join(left, right, ts="t", by="k", value_cols=["v"]).collect()
        }
        rd = {}
        for row in right.collect():
            rd.setdefault(row.k, []).append((row.t, row.v))
        for i, k, t, _ in lrows:
            lt = base + dt.timedelta(seconds=t)
            cands = [(rt, v) for rt, v in rd.get(k, []) if rt <= lt]
            want = max(cands)[1] if cands else None
            assert got[i] == want, (seed, i)


def test_interval_join_matches_naive(spark):
    import datetime as dt

    from amaxa_spark.operators.asof import interval_join

    base = dt.datetime(2026, 1, 1)
    for seed in (7, 8):
        lrows = _rand_rows(seed, 50, 4, 3600)
        rrows = _rand_rows(seed + 50, 50, 4, 3600)
        left = spark.createDataFrame(
            [(i, k, base + dt.timedelta(seconds=t)) for i, k, t, _ in lrows],
            "eid: long, k: long, t: timestamp",
        )
        right = spark.createDataFrame(
            [(i, k, base + dt.timedelta(seconds=t)) for i, k, t, _ in rrows],
            "rid: long, k: long, t: timestamp",
        )
        got = {
            (r.eid, r.rid_r)
            for r in interval_join(
                left, right, by="k", left_ts="t", right_ts="t",
                lower_ms=-120_000, upper_ms=60_000,
            ).collect()
        }
        want = set()
        for i, k, t, _ in lrows:
            for j, k2, t2, _ in rrows:
                if k == k2 and -120 <= t2 - t <= 60:
                    want.add((i, j))
        assert got == want, seed


def test_cluster_duplicates_matches_union_find(spark):
    import random

    for seed in (11, 12):
        rng = random.Random(seed)
        pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(25)}
        pairs = [(a, b) for a, b in pairs if a != b]
        from amaxa_spark.operators.dedup import cluster_duplicates

        df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
        got = {r.id: r.cluster_id for r in cluster_duplicates(df).collect()}

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        assert got == want, seed


def test_fuzzy_pairs_matches_naive(spark):
    """Randomized cross-check: blocked fuzzy_pairs equals the brute
    -force 'all pairs sharing a block, Levenshtein <= d' reference."""
    import random

    from amaxa_spark.operators.dedup import fuzzy_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    for seed in (7, 8):
        rng = random.Random(seed)
        # clustered strings: shared 4-char block prefix + noisy tail
        rows = [
            (
                i,
                f"{rng.choice('abc')}{rng.choice('xy')}pre"
                + "".join(rng.choice("mnop") for _ in range(3)),
            )
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "rid: long, name: string")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs(
                df, "rid", "name", "substring({c}, 1, 5)", max_dist=2
            ).collect()
        }
        want = set()
        for ia, na in rows:
            for ib, nb in rows:
                if ia < ib and na[:5] == nb[:5]:
                    d = lev(na, nb)
                    if d <= 2:
                        want.add((ia, ib, d))
        assert got == want, seed


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.integers(min_value=1, max_value=120),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=0, max_value=20),
)
def test_chunk_documents_properties(spark, n_words, max_tokens, overlap):
    """For arbitrary doc length / window / overlap: every token lands
    in at least one chunk, chunk order reassembles the doc (dedup'd
    overlap), and all chunks except the last are full windows."""
    from amaxa_spark.operators.packing import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    words = [f"t{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id: long, text: string")
    out = sorted(
        chunk_documents(df, "text", "doc_id", max_tokens, overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    stride = max_tokens - overlap
    # reconstruct: chunk i starts at token i*stride
    rebuilt = []
    for r in out:
        toks = r.chunk_text.split(" ")
        start = r.chunk_id * stride
        assert toks == words[start : start + max_tokens]
        rebuilt[start:] = toks
    assert rebuilt == words
    for r in out[:-1]:
        assert r.n_chunk_tokens == max_tokens


def test_corpus_diff_identity_and_partition(spark):
    """diff(X, X) is empty; statuses partition the symmetric
    difference + changed set exactly."""
    from amaxa_spark.operators import dedup as D

    rows = [(i, f"text {i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    assert D.corpus_diff(df, df, "text", "doc_id").count() == 0

    old = df.where("doc_id % 5 != 0")        # ids 0,5,... missing
    new = df.where("doc_id % 3 != 0")        # ids 0,3,... missing
    out = {r.doc_id: r.status for r in D.corpus_diff(old, new, "text", "doc_id").collect()}
    for i in range(40):
        in_old, in_new = i % 5 != 0, i % 3 != 0
        if in_old and not in_new:
            assert out[i] == "removed"
        elif in_new and not in_old:
            assert out[i] == "added"
        else:
            assert i not in out  # same text -> unchanged, omitted


def test_scd2_intervals_matches_naive(spark):
    """Randomized cross-check: the gaps-and-islands SCD2 build equals
    the per-key sequential run collapse."""
    import random

    from amaxa_spark.operators.timeseries import scd2_intervals

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [
            (i, rng.randrange(4), rng.randrange(40), rng.choice("abc"))
            for i in range(80)
        ]
        # unique (k, t) per key for a deterministic answer; i breaks ties
        df = spark.createDataFrame(rows, "tb: long, k: long, t: long, s: string")
        keyf = lambda x: (x[0], x[1], x[2] is None, x[2] or 0, x[3])
        got = sorted(
            ((r.k, r.valid_from, r.valid_to, r.s)
             for r in scd2_intervals(df, "k", "t", "s", "tb").collect()),
            key=keyf,
        )
        want = []
        per_key = {}
        for tb, k, t, s in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
            per_key.setdefault(k, []).append((t, s))
        for k, seq in per_key.items():
            runs = []
            for t, s in seq:
                if not runs or runs[-1][2] != s:
                    runs.append([t, None, s])
            for i, run in enumerate(runs):
                run[1] = runs[i + 1][0] if i + 1 < len(runs) else None
            want.extend((k, r[0], r[1], r[2]) for r in runs)
        assert got == sorted(want, key=keyf), seed


def test_histogram_matches_numpy_convention(spark):
    """Randomized cross-check: fixed-width bins equal the
    floor-formula reference (v == hi in the last bin, outside
    dropped, empty bins zero-filled)."""
    import math
    import random

    from amaxa_spark.operators.stats import fixed_width_histogram

    for seed in (1, 2):
        rng = random.Random(seed)
        vals = [rng.uniform(-5, 115) for _ in range(300)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = {r["bin"]: r["n"] for r in
               fixed_width_histogram(df, "v", 0.0, 100.0, 10).collect()}
        want = {b: 0 for b in range(10)}
        for v in vals:
            if v < 0.0 or v > 100.0:
                continue
            b = 9 if v == 100.0 else int(math.floor(v * 10 / 100.0))
            want[b] += 1
        assert out == want, seed


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Statistical property: across many salts, a 10x-weight row is
    sampled far more often than a 1x row (A-RES correctness smoke)."""
    from amaxa_spark.operators.sampling import weighted_sample

    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") < 20, 10).otherwise(1).alias("w"),
    )
    heavy_hits = light_hits = 0
    for salt in ("s1", "s2", "s3", "s4", "s5"):
        ids = {r["id"] for r in
               weighted_sample(df, "id", "w", 40, salt=salt).collect()}
        heavy_hits += sum(1 for i in ids if i < 20)
        light_hits += sum(1 for i in ids if i >= 20)
    # heavy rows are 10% of the population but carry ~53% of total
    # weight; with k=40 of 200 they must dominate their share
    assert heavy_hits / (5 * 20) > 2.5 * (light_hits / (5 * 180))


# fast default siblings: test_load.py + test_end_to_end.py golden
# roundtrips (same load path, fixed fixtures)
@pytest.mark.slow
def test_load_roundtrip_preserves_fk_structure(spark):
    """Randomized structural property of the two-phase load: for
    random self-referencing + cross-table FK graphs (with cycles and
    nulls), the replay is an ISOMORPHISM — new ids are unique, row
    counts hold, and new_FK(new(x)) == new(old_FK(x)) for every row,
    including self-lookups rewritten in the dependent phase."""
    import random

    from amaxa_spark.metadata import SchemaRegistry, TableMeta
    from amaxa_spark.operators.load import LoadOperation
    from amaxa_spark.plans.plan import LoadStepPlan

    reg = SchemaRegistry(
        [
            TableMeta("A", lookups={"ParentId": ["A"]}),
            TableMeta("B", lookups={"AId": ["A"], "PeerId": ["B"]}),
        ]
    )
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n_a, n_b = rng.randrange(3, 12), rng.randrange(3, 12)
        a_ids = [f"A{i}" for i in range(n_a)]
        b_ids = [f"B{i}" for i in range(n_b)]
        # random parents incl. cycles (any id, even itself) and nulls
        a_rows = [
            (i, rng.choice(a_ids + [None]), f"n{rng.randrange(100)}")
            for i in a_ids
        ]
        b_rows = [
            (i, rng.choice(a_ids + [None]), rng.choice(b_ids + [None]))
            for i in b_ids
        ]
        A = spark.createDataFrame(
            a_rows, "Id: string, ParentId: string, Name: string"
        )
        B = spark.createDataFrame(
            b_rows, "Id: string, AId: string, PeerId: string"
        )
        res = LoadOperation(
            spark, reg, [LoadStepPlan("A"), LoadStepPlan("B")],
            {"A": A, "B": B},
        ).run()
        maps = {
            t: {r.old_id: r.new_id for r in res.id_map[t].collect()}
            for t in ("A", "B")
        }
        outs = {t: res.written[t].collect() for t in ("A", "B")}
        for t, n in (("A", n_a), ("B", n_b)):
            assert len(outs[t]) == n, (seed, t)
            new_ids = {r.Id for r in outs[t]}
            assert len(new_ids) == n  # injective
            assert new_ids == set(maps[t].values())
        # FK isomorphism, per original row
        new_a = {r.Id: r for r in outs["A"]}
        for old_id, parent, _ in a_rows:
            got = new_a[maps["A"][old_id]]
            want = maps["A"][parent] if parent is not None else None
            assert got.ParentId == want, (seed, old_id)
        new_b = {r.Id: r for r in outs["B"]}
        for old_id, aid, peer in b_rows:
            got = new_b[maps["B"][old_id]]
            assert got.AId == (maps["A"][aid] if aid is not None else None)
            assert got.PeerId == (
                maps["B"][peer] if peer is not None else None
            ), (seed, old_id)


def test_gini_matches_naive_rank_formula(spark):
    """The count-of-counts closed form equals the textbook
    sorted-rank Gini on random key distributions, including heavy
    ties, singletons, and one-key corpora."""
    import random

    from amaxa_spark.operators.stats import gini_coefficient

    for seed in (1, 2, 3, 4):
        rng = random.Random(seed)
        n_keys = rng.randint(1, 80)
        counts = [rng.choice([1, 1, 1, 2, 3, 5, 40]) for _ in range(n_keys)]
        rows = [(k,) for k, c in enumerate(counts) for _ in range(c)]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "k long")
        got = gini_coefficient(df, "k").collect()[0]
        xs = sorted(counts)
        n, tot = len(xs), sum(xs)
        want = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
            n + 1.0
        ) / n
        assert got["n_keys"] == n and got["total"] == tot
        assert abs(got["gini"] - round(want, 9)) < 1e-9, (seed, got, want)


@given(
    st.text(alphabet="ab1", min_size=3, max_size=12),
    st.integers(min_value=0, max_value=12),
    st.sampled_from(["sub", "del", "ins", "none"]),
)
@settings(max_examples=120, deadline=None)
def test_deletion_neighborhood_blocking_lossless(s, pos, kind):
    """Any two strings within edit distance 1 share a key in the
    deletion-1 neighborhood (the string itself + every single-char
    deletion) — the losslessness the weighted_linkage gate query's
    blocking relies on. Pure-Python mirror of the Column expression."""
    def neighborhood(t):
        return {t} | {t[:i] + t[i + 1:] for i in range(len(t))}

    p = pos % (len(s) + 1)
    if kind == "sub" and p < len(s):
        other = s[:p] + ("z" if s[p] != "z" else "y") + s[p + 1:]
    elif kind == "del" and p < len(s):
        other = s[:p] + s[p + 1:]
    elif kind == "ins":
        other = s[:p] + "z" + s[p:]
    else:
        other = s
    assert neighborhood(s) & neighborhood(other), (s, other)


def test_asof_forward_matches_naive(spark):
    """Randomized cross-check: forward as-of equals the per-row
    'earliest right at-or-after' reference computation."""
    import datetime as dt

    from amaxa_spark.operators.asof import asof_join

    base = dt.datetime(2026, 1, 1)
    for seed in (4, 5):
        lrows = _rand_rows(seed, 60, 5, 50)
        rrows = _rand_rows(seed + 100, 40, 5, 50)
        left = spark.createDataFrame(
            [(i, k, base + dt.timedelta(seconds=t)) for i, k, t, _ in lrows],
            "eid: long, k: long, t: timestamp",
        )
        right = spark.createDataFrame(
            [(k, base + dt.timedelta(seconds=t), v) for _, k, t, v in rrows],
            "k: long, t: timestamp, v: double",
        ).groupBy("k", "t").agg(F.max("v").alias("v"))
        got = {
            r.eid: r.v_r
            for r in asof_join(
                left, right, ts="t", by="k", value_cols=["v"],
                direction="forward",
            ).collect()
        }
        rd = {}
        for row in right.collect():
            rd.setdefault(row.k, []).append((row.t, row.v))
        for i, k, t, _ in lrows:
            lt = base + dt.timedelta(seconds=t)
            cands = [(rt, v) for rt, v in rd.get(k, []) if rt >= lt]
            want = min(cands)[1] if cands else None
            assert got[i] == want, (seed, i)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_codec_roundtrip_property(h, w, seed):
    """PROPERTY: decode_png(encode_png(px)) == px for arbitrary image
    dimensions and pixel content — the encoder's y%5 filter schedule
    means any image of height >= 5 exercises every scanline filter,
    and hypothesis's shrinking pins failures to minimal dims."""
    import numpy as np

    from amaxa_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    m = MM.decode_png(MM.encode_png(px))
    assert m is not None
    assert (m["width"], m["height"]) == (w, h)
    assert (m["pixels"] == px).all()


@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_resize_real_matches_integer_mapping_property(sh, sw, dh, dw, seed):
    """PROPERTY: resize_real's nearest-neighbor output equals the
    documented integer mapping src = (dst * src_dim) // dst_dim for
    BOTH codecs, any source/destination shape."""
    import numpy as np

    from amaxa_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(sh, sw, 3), dtype=np.uint8)
    xs = (np.arange(dw) * sw) // dw
    ys = (np.arange(dh) * sh) // dh
    want = px[ys][:, xs]
    for encode, decode in ((MM.encode_png, MM.decode_png),
                           (MM.encode_bmp, MM.decode_bmp)):
        out = decode(MM.resize_real(encode(px), dw, dh))
        assert (out["width"], out["height"]) == (dw, dh)
        assert (out["pixels"] == want).all()


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_codec_property(h, w, seed):
    """PROPERTY (lossy codec, so bounded-error, not equality): for ANY
    pixel content and dims, encode_jpeg -> decode_jpeg returns the
    exact SOF0 dimensions; for arbitrary noise the recomputed LUMA
    stays within a fixed bound (luma is never subsampled — chroma
    error reaches it only through RGB clipping); and for smooth
    gradients (the 4:2:0-friendly content class) the full RGB error
    is tiny. Bounds pin measured behavior (worst observed: luma ~21
    on noise, RGB 2 on gradients)."""
    import numpy as np

    from amaxa_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    m = MM.decode_jpeg(MM.encode_jpeg(px))
    assert m is not None and (m["width"], m["height"]) == (w, h)

    def luma(a):
        a = a.astype(np.float64)
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    assert np.abs(luma(m["pixels"]) - luma(px)).max() <= 32.0

    base = rng.integers(0, 100, 3)
    sx, sy = rng.integers(0, 3, 3), rng.integers(0, 3, 3)
    x, y = np.arange(w)[None, :], np.arange(h)[:, None]
    g = np.clip(
        np.stack(
            [np.broadcast_to(base[c] + sx[c] * x + sy[c] * y, (h, w))
             for c in range(3)],
            axis=-1,
        ),
        0, 255,
    ).astype(np.uint8)
    m2 = MM.decode_jpeg(MM.encode_jpeg(g))
    assert np.abs(
        m2["pixels"].astype(np.int64) - g.astype(np.int64)
    ).max() <= 8
