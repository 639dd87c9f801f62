"""Property-based tests (hypothesis): the reshape transform must match
the reference's pandas chain on ARBITRARY wide fixtures, and the upsert
must be idempotent and key-unique for ARBITRARY batch pairs.

Examples are capped low — each example spins Spark jobs; the point is
adversarial shapes (NULL patterns, duplicate keys, empty overlaps), not
volume.
"""

from __future__ import annotations

import os

import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from automate_data_ingestion_project_spark.analytics.load import scratch_dir
from automate_data_ingestion_project_spark.io.sink import read_parquet, upsert_parquet
from automate_data_ingestion_project_spark.operators.reshape import normalize_wide

METRICS = ["m_one", "va_sum", "va_q25"]
CODES = ["111", "121"]
WIDE_COLS = [f"{m}_cod{k}" for k in CODES for m in METRICS]
ID_VARS = ["annee", "dep", "libdep"]

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def wide_rows(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    rows = []
    used_keys = set()
    for _ in range(n):
        annee = draw(st.sampled_from(["2014", "2015", None]))
        dep = draw(st.sampled_from(["01", "2A", None]))
        if (annee, dep) in used_keys:  # keep (annee, dep) unique: first()
            continue  # on duplicate groups is order-dependent in BOTH engines
        used_keys.add((annee, dep))
        libdep = draw(st.sampled_from(["Lib", "Autre"]))
        vals = [
            draw(st.one_of(st.none(), st.integers(0, 999).map(lambda v: v + 0.5)))
            for _ in WIDE_COLS
        ]
        rows.append((annee, dep, libdep, *vals))
    return rows


def _pandas_chain(wide: pd.DataFrame) -> list[tuple]:
    import hashlib

    long = wide.melt(id_vars=ID_VARS, var_name="cod_full", value_name="valeur")
    split = long["cod_full"].str.rsplit("_", n=1, expand=True)
    long["metric"] = split[0]
    long["cod"] = split[1].str.replace("cod", "", regex=False)
    if long.dropna(subset=[*ID_VARS, "cod"]).empty:
        return []
    piv = long.pivot_table(
        index=[*ID_VARS, "cod"], columns="metric", values="valeur", aggfunc="first"
    ).reset_index()
    piv.columns.name = None
    for m in METRICS:
        if m not in piv.columns:
            piv[m] = float("nan")
    piv["uid"] = piv.apply(
        lambda r: hashlib.sha256(
            (str(r["annee"]) + str(r["dep"]) + str(r["cod"])).encode()
        ).hexdigest(),
        axis=1,
    )
    out = []
    for r in piv[["uid", *ID_VARS, "cod", *METRICS]].itertuples(index=False):
        out.append(
            tuple(None if isinstance(v, float) and pd.isna(v) else v for v in r)
        )
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@_SETTINGS
@given(rows=wide_rows())
def test_normalize_wide_matches_pandas_on_arbitrary_fixtures(spark, rows):
    schema = (
        "annee string, dep string, libdep string, "
        + ", ".join(f"{c} double" for c in WIDE_COLS)
    )
    wide_s = spark.createDataFrame(rows, schema)
    got = sorted(
        (
            tuple(r)
            for r in normalize_wide(wide_s, ID_VARS, METRICS, ["annee", "dep", "cod"])
            .collect()
        ),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    expected = _pandas_chain(pd.DataFrame(rows, columns=["annee", "dep", "libdep", *WIDE_COLS]))
    assert got == expected


@st.composite
def key_value_batches(draw):
    keys = st.integers(min_value=0, max_value=9)
    batch = st.lists(
        st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=8
    )
    return draw(batch), draw(batch)


@_SETTINGS
@given(batches=key_value_batches())
def test_upsert_idempotent_and_key_unique_for_any_batches(spark, batches):
    b1, b2 = batches
    path = os.path.join(scratch_dir("prop_upsert"), "t")
    df1 = spark.createDataFrame(b1, "k int, v int") if b1 else None
    df2 = spark.createDataFrame(b2, "k int, v int") if b2 else None
    for df in (df1, df2, df2):  # second batch applied twice: idempotent
        if df is not None:
            upsert_parquet(spark, df, path, keys=["k"])
    if df1 is None and df2 is None:
        return
    out = read_parquet(spark, path).collect()
    ks = [r.k for r in out]
    assert len(ks) == len(set(ks))  # PK uniqueness (Q4)
    # every batch-2 key's value comes from batch 2
    b2_keys = {k for k, _ in b2}
    b2_vals = {k: {v for kk, v in b2 if kk == k} for k in b2_keys}
    for r in out:
        if r.k in b2_keys:
            assert r.v in b2_vals[r.k]
    # keys only in batch 1 survive
    assert {k for k, _ in b1} | b2_keys == set(ks)


@st.composite
def skewed_rows(draw):
    """(key, id, value) rows with a deliberately hot key."""
    n = draw(st.integers(min_value=1, max_value=24))
    rows = []
    for i in range(n):
        key = draw(st.sampled_from(["hot", "hot", "hot", "warm", "cold"]))
        rows.append((key, i, draw(st.integers(0, 1000))))
    return rows


@_SETTINGS
@given(rows=skewed_rows())
def test_salted_sum_equals_plain_groupby_for_any_skew(spark, rows):
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.operators.skew import (
        salted_sum_count,
    )

    df = spark.createDataFrame(rows, "k string, id long, v long")
    salted = {
        r.k: (r.sum_v, r.n_rows)
        for r in salted_sum_count(df, ["k"], "v", "id", n_salts=4).collect()
    }
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    assert salted == plain


@_SETTINGS
@given(rows=skewed_rows())
def test_salted_join_equals_plain_join_for_any_skew(spark, rows):
    from automate_data_ingestion_project_spark.operators.skew import salted_join

    big = spark.createDataFrame(rows, "k string, id long, v long")
    small = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("missing", 3)], "k string, tag int"
    )
    salted = sorted(
        map(tuple, salted_join(big, small, "k", salt_from="id", n_salts=4)
            .select("k", "id", "v", "tag").collect())
    )
    plain = sorted(
        map(tuple, big.join(small, "k").select("k", "id", "v", "tag").collect())
    )
    assert salted == plain


def test_percentile_approx_within_documented_bound(spark, sf_dir):
    """SCALE.md prescribes swapping exact `percentile` for
    `percentile_approx` at 100 TB; this pins the documented error bound
    on the actual data: with accuracy=10000 the rank error is at most
    n/10000, so the approx value must fall between the exact values at
    the rank-error-shifted quantiles."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    acc = 10000
    eps = 1.0 / acc
    for q in (0.25, 0.50, 0.75, 0.95):
        approx = orders.agg(
            F.expr(
                f"percentile_approx(o_totalprice, {q}, {acc})"
            ).alias("a")
        ).collect()[0].a
        # the guarantee is on RANK: the returned element's rank must lie
        # within q·n ± n·eps (±1 slack for ties/discreteness)
        rank = orders.filter(F.col("o_totalprice") <= approx).count()
        assert abs(rank - q * n) <= n * eps + 1, (q, approx, rank, n)


@st.composite
def partitioned_batches(draw):
    """Sequence of batches of (k, part, v): keys move between partitions
    across batches, and partition values include NULL (the
    __HIVE_DEFAULT_PARTITION__ edge the dynamic overwrite must merge)."""
    keys = st.integers(min_value=0, max_value=6)
    parts = st.sampled_from(["a", "b", None])
    batch = st.lists(
        st.tuples(keys, parts, st.integers(0, 100)), min_size=0, max_size=6
    )
    n_batches = draw(st.integers(min_value=1, max_value=3))
    return [draw(batch) for _ in range(n_batches)]


@_SETTINGS
@given(batches=partitioned_batches())
def test_dynamic_partition_upsert_matches_key_model(spark, batches):
    """The partition-pruned merge must behave exactly like the naive
    full-table merge: last write per key wins, including when a key
    MOVES partitions (its stale row in the old partition must die) and
    when the partition value is NULL."""
    path = os.path.join(scratch_dir("prop_upsert_dyn"), "t")
    model: dict[int, tuple] = {}
    applied = False
    for b in batches:
        if not b:
            continue
        df = spark.createDataFrame(b, "k int, part string, v int")
        upsert_parquet(spark, df, path, keys=["k"], partition_by=["part"])
        applied = True
        # within one batch, dropDuplicates keeps ONE row per key
        # (arbitrary); the model keeps the set of candidates
        per_key: dict[int, set] = {}
        for k, p, v in b:
            per_key.setdefault(k, set()).add((p, v))
        for k, cands in per_key.items():
            model[k] = cands
    if not applied:
        return
    out = read_parquet(spark, path).collect()
    ks = [r.k for r in out]
    assert len(ks) == len(set(ks)), "duplicate key after dynamic merge"
    assert set(ks) == set(model), "key set diverged from model"
    for r in out:
        assert (r.part, r.v) in model[r.k], (r, model[r.k])


def test_mega_basket_capped_out_of_pairing(spark):
    """One pathological mega-basket must not reach the pair self-join:
    its B² candidate pairs are pruned by the MAX_BASKET guard, while
    normal baskets pair exactly as before (support counted without the
    mega basket's contribution)."""
    from automate_data_ingestion_project_spark.analytics.warehouse_ext import (
        MAX_BASKET,
        basket_pairs,
    )

    rows = []
    # two normal baskets sharing parts (10, 20) -> pair support 2
    rows += [(1, 10), (1, 20), (2, 10), (2, 20)]
    # a mega basket containing 10, 20 AND a long unique tail
    mega = [(99, p) for p in range(10, 10 + MAX_BASKET + 10)]
    rows += mega
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r.part_a, r.part_b): r.n_orders
        for r in basket_pairs(li, min_support=2).collect()
    }
    # the pair survives on the two normal baskets only (support 2, not 3)
    assert got == {(10, 20): 2}

    # without the cap the mega basket inflates the support count AND
    # injects its quadratic candidate set (B*(B-1)/2 pairs at support 1)
    uncapped = {
        (r.part_a, r.part_b): r.n_orders
        for r in basket_pairs(li, min_support=1, max_basket=10**9).collect()
    }
    b = len(mega)
    assert uncapped[(10, 20)] == 3
    assert len(uncapped) == b * (b - 1) // 2


def test_argmin_joinback_preserves_ties(spark):
    """The Q2-shape argmin must return EVERY supplier tying on the
    minimum unit price (min_by would arbitrarily pick one and flap the
    oracle hash), and nothing else."""
    from automate_data_ingestion_project_spark.analytics.warehouse_subq import (
        cheapest_by_unit_price,
    )

    rows = [
        # part 1: suppliers 10 and 11 tie at unit 2.0; 12 loses
        (1, 10, 20.0, 10.0),
        (1, 11, 4.0, 2.0),
        (1, 12, 30.0, 10.0),
        # part 2: single winner, evidence across two lines
        (2, 20, 50.0, 10.0),
        (2, 21, 9.0, 3.0),
        (2, 21, 90.0, 10.0),
    ]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double"
    )
    got = {(r.partkey, r.suppkey): r.unit_price for r in cheapest_by_unit_price(li).collect()}
    assert got == {(1, 10): 2.0, (1, 11): 2.0, (2, 21): 3.0}


@st.composite
def edge_lists(draw):
    node = st.integers(min_value=0, max_value=12)
    return draw(st.lists(st.tuples(node, node), min_size=0, max_size=20))


@_SETTINGS
@given(edges=edge_lists())
def test_connected_components_matches_union_find_on_any_graph(spark, edges):
    """The iterative min-label propagation must produce exactly the
    partition a reference union-find computes, for ANY small graph
    (self-loops and duplicate edges included), with component_id = the
    minimum node id of its component."""
    from automate_data_ingestion_project_spark.textops.components import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    for n in parent:
        expected.setdefault(find(n), set()).add(n)
    expected_parts = {frozenset(v) for v in expected.values()}

    df = spark.createDataFrame(
        edges or [(None, None)], "doc_id_a long, doc_id_b long"
    ).dropna()
    got_rows = connected_components(df).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r.component_id, set()).add(r.node)
    assert {frozenset(v) for v in got.values()} == expected_parts
    for cid, members in got.items():
        assert cid == min(members)


@st.composite
def tiny_corpora(draw):
    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    doc = st.lists(word, min_size=3, max_size=6).map(" ".join)
    docs = draw(st.lists(doc, min_size=2, max_size=6))
    dup_of = draw(st.integers(0, len(docs) - 1))
    return docs + [docs[dup_of]]  # always at least one exact-dup pair


@_SETTINGS
@given(texts=tiny_corpora())
def test_minhash_chain_always_catches_exact_shingle_duplicates(spark, texts):
    """The scale-demo / dedup guarantee: two docs with EQUAL shingle
    sets share every band key, so banded LSH candidate generation finds
    them deterministically (no probabilistic miss is possible) and
    exact verification reports jaccard 1.0. Also: every reported pair's
    jaccard equals the Python-computed exact Jaccard of the shingle
    sets — the verify stage is exact, LSH only affects which candidate
    pairs exist."""
    from automate_data_ingestion_project_spark.textops.dedup import (
        candidate_pairs,
        lsh_band_keys,
        minhash_signatures_rows,
        shingle_rows,
        verified_near_duplicates_rows,
    )

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = shingle_rows(docs)
    pairs = candidate_pairs(lsh_band_keys(minhash_signatures_rows(rows)))
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in verified_near_duplicates_rows(rows, pairs).collect()
    }
    for (a, b), j in got.items():
        assert a < b
        inter = len(sh(texts[a]) & sh(texts[b]))
        union = len(sh(texts[a]) | sh(texts[b]))
        assert j == inter / union >= 0.5
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if sh(texts[a]) == sh(texts[b]):
                assert got.get((a, b)) == 1.0


@st.composite
def gappy_series(draw):
    # (user, us, value-or-None) with unique (user, us): equal-timestamp
    # neighbors would make the interpolation fraction 0/0 — the fixture
    # guarantees strictly increasing per-user timestamps, so the
    # operator contract assumes it too
    n = draw(st.integers(1, 12))
    rows, used = [], set()
    for i in range(n):
        user = draw(st.integers(0, 2))
        us = draw(st.integers(0, 50).map(lambda x: x * 1_000_000))
        if (user, us) in used:
            continue
        used.add((user, us))
        v = draw(st.one_of(st.none(), st.integers(-50, 50).map(float)))
        rows.append((i, user, us, v))
    return rows


@_SETTINGS
@given(rows=gappy_series())
def test_interpolation_matches_python_reference_on_any_series(spark, rows):
    """interpolate_time_weighted vs a straight-line Python model over
    arbitrary gappy series: interior nulls fill time-weighted between
    nearest non-null neighbors, edges carry, all-null series stay
    null. Same IEEE operand tree on both sides — equality is exact,
    not approximate."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.operators.timeseries import (
        interpolate_time_weighted,
    )

    def reference():
        exp = {}
        by_user: dict[int, list] = {}
        for rid, user, us, v in rows:
            by_user.setdefault(user, []).append((us, rid, v))
        for series in by_user.values():
            series.sort()
            for i, (us, rid, v) in enumerate(series):
                if v is not None:
                    exp[rid] = (v, False)
                    continue
                prv = next(
                    ((u, x) for u, _, x in reversed(series[:i]) if x is not None),
                    None,
                )
                nxt = next(
                    ((u, x) for u, _, x in series[i + 1 :] if x is not None),
                    None,
                )
                if prv and nxt:
                    (pts, pv), (nts, nv) = prv, nxt
                    exp[rid] = (pv + (nv - pv) * ((us - pts) / (nts - pts)), True)
                elif prv or nxt:
                    exp[rid] = ((prv or nxt)[1], True)
                else:
                    exp[rid] = (None, True)
        return exp

    df = spark.createDataFrame(
        rows, "rid long, user long, us long, v double"
    ).select("rid", "user", F.timestamp_micros("us").alias("ts"), "v")
    got = {
        r.rid: (r.value_filled, r.was_interpolated)
        for r in interpolate_time_weighted(df, ["user"], "ts", "v").collect()
    }
    assert got == reference()


@st.composite
def capped_corpora(draw):
    """(doc_id, source, text) corpora with skewed source sizes, empty
    texts, and doc_ids dense enough to land in one scramble bucket AND
    sparse enough to span many — the shapes the two-phase forms must
    agree with the one-window semantics on."""
    n = draw(st.integers(min_value=1, max_value=18))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=10**7),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    rows = []
    for doc_id in ids:
        source = draw(st.sampled_from(["s0", "s0", "s0", "s1", "s2"]))
        k = draw(st.integers(min_value=0, max_value=9))
        rows.append((doc_id, source, " ".join(["w"] * k)))
    return rows


def _scramble_py(tag: str, doc_id: int) -> int:
    """Python twin of analytics.mixing._scramble (md5 56-bit key)."""
    import hashlib

    return int(hashlib.md5(f"{tag}:{doc_id}".encode()).hexdigest()[:14], 16)


_CAP_COUNTER = iter(range(10**9))


def _write_docs(spark, rows):
    path = os.path.join(
        scratch_dir("prop_caps"), f"c{next(_CAP_COUNTER)}"
    )
    spark.createDataFrame(
        [(d, s, t, "en", len(t)) for d, s, t in rows],
        "doc_id long, source string, text string, lang string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    return path


@_SETTINGS
@given(rows=capped_corpora())
def test_source_doc_cap_matches_python_model_on_any_corpus(spark, rows):
    from automate_data_ingestion_project_spark.analytics.mixing import (
        DOC_CAP,
        source_doc_cap,
    )

    path = _write_docs(spark, rows)
    got = sorted(tuple(r) for r in source_doc_cap(spark, path).collect())

    expected = []
    by_source: dict[str, list] = {}
    for doc_id, source, _ in rows:
        by_source.setdefault(source, []).append(doc_id)
    for source, ids in by_source.items():
        ordered = sorted(ids, key=lambda d: (_scramble_py("cap", d), d))
        expected.extend(
            (d, source, rk + 1) for rk, d in enumerate(ordered[:DOC_CAP])
        )
    assert got == sorted(expected)


@_SETTINGS
@given(rows=capped_corpora())
def test_source_token_budget_cap_matches_python_model_on_any_corpus(
    spark, rows
):
    from automate_data_ingestion_project_spark.analytics.mixing import (
        TOKEN_BUDGET,
        source_token_budget_cap,
    )

    path = _write_docs(spark, rows)
    got = sorted(
        tuple(r) for r in source_token_budget_cap(spark, path).collect()
    )

    expected = []
    by_source: dict[str, list] = {}
    for doc_id, source, text in rows:
        # Spark size(split(text,' ')): '' splits to [''] = 1 token
        by_source.setdefault(source, []).append(
            (doc_id, len(text.split(" ")))
        )
    for source, docs in by_source.items():
        ordered = sorted(docs, key=lambda dn: (_scramble_py("budget", dn[0]), dn[0]))
        cum = 0
        for doc_id, n in ordered:
            cum += n
            if cum <= TOKEN_BUDGET:
                expected.append((doc_id, source, n, cum))
    assert got == sorted(expected)


@st.composite
def batched_corpora(draw):
    """(rows, n_batches, budget): corpora whose docs are split into
    sequential append batches by doc_id % n_batches, with budgets small
    enough that shards close mid-batch and large enough that batches
    share shards — the boundary shapes the incremental append must
    agree with the from-scratch model on. Small corpora with
    n_batches > 1 routinely leave a batch EMPTY — the shape that caught
    the r11 fresh-store empty-batch crash — so empty first/middle
    batches stay in the generated space by construction."""
    rows = draw(capped_corpora())
    n_batches = draw(st.integers(min_value=1, max_value=3))
    budget = draw(st.sampled_from([1, 3, 10, 50]))
    return rows, n_batches, budget


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=batched_corpora())
def test_incremental_shard_append_matches_python_model_on_any_corpus(
    spark, case, tmp_path_factory
):
    """Sequential append_token_shard_batch calls over ANY corpus split
    must land every doc in the shard the Python model assigns walking
    (batch_seq, scramble, doc_id) order with one global running token
    offset — including budgets smaller than one doc (every doc opens
    its own shard region) and single-batch degenerate splits."""
    from automate_data_ingestion_project_spark.analytics.mixing import (
        append_token_shard_batch,
        shard_store_paths,
    )

    rows, n_batches, budget = case
    root = str(tmp_path_factory.mktemp("incr_shards"))
    for b in range(n_batches):
        batch = [(d, s, t) for d, s, t in rows if d % n_batches == b]
        df = spark.createDataFrame(
            [(d, t) for d, s, t in batch], "doc_id long, text string"
        )
        append_token_shard_batch(spark, df, root, b, budget=budget)

    shards_path, _ = shard_store_paths(root)
    got = sorted(
        (r.doc_id, int(r.shard_id), int(r.batch_seq))
        for r in spark.read.parquet(shards_path).collect()
    )

    expected = []
    cum = 0
    for b in range(n_batches):
        batch = [(d, t) for d, s, t in rows if d % n_batches == b]
        for d, t in sorted(
            batch, key=lambda dt: (_scramble_py("shard", dt[0]), dt[0])
        ):
            n = len(t.split(" "))  # Spark size(split): '' -> 1 token
            expected.append((d, cum // budget, b))
            cum += n
    assert got == sorted(expected)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=batched_corpora(), data=st.data())
def test_compaction_at_any_point_preserves_shard_assignment(
    spark, case, data, tmp_path_factory
):
    """Running compact_store_tree after ANY prefix of the append
    sequence (including after an empty batch, and possibly repeatedly)
    must leave the final per-doc shard assignment identical to the
    never-compacted model — compaction is semantically invisible to
    the append protocol at every interleaving point."""
    from automate_data_ingestion_project_spark.analytics.mixing import (
        append_token_shard_batch,
        shard_store_paths,
    )
    from automate_data_ingestion_project_spark.io.maintenance import (
        compact_store_tree,
    )

    rows, n_batches, budget = case
    compact_after = data.draw(
        st.integers(min_value=0, max_value=n_batches - 1),
        label="compact_after_batch",
    )
    root = str(tmp_path_factory.mktemp("compact_shards"))
    shards_path, _ = shard_store_paths(root)
    for b in range(n_batches):
        batch = [(d, t) for d, s, t in rows if d % n_batches == b]
        df = spark.createDataFrame(batch, "doc_id long, text string")
        append_token_shard_batch(spark, df, root, b, budget=budget)
        if b == compact_after:
            compact_store_tree(spark, shards_path, "shard_id", "doc_id")

    got = sorted(
        (r.doc_id, int(r.shard_id))
        for r in spark.read.parquet(shards_path).collect()
    )

    expected = []
    cum = 0
    for b in range(n_batches):
        batch = [(d, t) for d, s, t in rows if d % n_batches == b]
        for d, t in sorted(
            batch, key=lambda dt: (_scramble_py("shard", dt[0]), dt[0])
        ):
            n = len(t.split(" "))  # Spark size(split): '' -> 1 token
            expected.append((d, cum // budget))
            cum += n
    assert got == sorted(expected)


@st.composite
def vector_corpora(draw):
    """(vec_id, embedding) corpora with duplicate directions, zero-ish
    vectors avoided (norm>0 for cosine), split into append batches —
    the shapes frozen-codebook assignment must be invariant under."""
    n = draw(st.integers(min_value=9, max_value=24))  # ≥ n_cells + 1
    dim = 4
    rows = []
    for vec_id in range(n):
        vec = [
            float(draw(st.integers(min_value=-5, max_value=5))) for _ in range(dim)
        ]
        if all(v == 0.0 for v in vec):
            vec[0] = 1.0
        rows.append((vec_id, vec))
    n_batches = draw(st.integers(min_value=1, max_value=3))
    return rows, n_batches


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=vector_corpora())
def test_ivf_append_matches_from_scratch_assignment_on_any_corpus(
    spark, case, tmp_path_factory
):
    """Sequential append_ivf_batch calls over ANY corpus split (batches
    by vec_id % n_batches, so empty and singleton batches occur) must
    land every vector in the cell a from-scratch assignment over the
    same frozen codebook gives it — including replayed batches, which
    must change nothing."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import (
        append_ivf_batch,
        ivf_store_paths,
    )

    rows, n_batches = case
    schema = "vec_id long, embedding array<float>"
    emb = spark.createDataFrame(rows, schema)
    n_cells = 4
    centroids = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    root = str(tmp_path_factory.mktemp("ivf_prop"))
    for b in range(n_batches):
        batch = emb.filter(F.col("vec_id") % n_batches == b)
        append_ivf_batch(spark, batch, centroids, root, b)
    # replay the first batch: committed no-op
    append_ivf_batch(
        spark, emb.filter(F.col("vec_id") % n_batches == 0), centroids, root, 0
    )

    vectors_path, _ = ivf_store_paths(root)
    got = {
        r.vec_id: int(r.cell)
        for r in spark.read.parquet(vectors_path).collect()
    }

    # python model: nearest centroid by dot product, ties to lower cell
    cents = {i: rows[i][1] for i in range(n_cells)}
    expected = {}
    for vec_id, vec in rows:
        best = max(
            cents,
            key=lambda c: (
                sum(a * b for a, b in zip(vec, cents[c])),
                -c,
            ),
        )
        expected[vec_id] = best
    assert got == expected
    assert len(got) == len(rows)  # replay added nothing, nothing lost


@st.composite
def ledger_op_sequences(draw):
    """Interleaved generic-ledger append attempts: (batch_seq, lo, n,
    crash). Duplicate sequences (racing/double-fired appenders) and
    out-of-order sequences are in the space by construction — the
    store is UNORDERED, so any seq order is legal; duplicate seqs pin
    the FIRST-LEDGER-COMMIT-WINS contract; crash=True attempts die at
    the ledger write (files on disk, no commit marker); n=0 is an
    empty batch."""
    n_ops = draw(st.integers(min_value=2, max_value=5))
    ops = [
        (
            draw(st.integers(0, 3)),
            draw(st.integers(0, 50)),
            draw(st.integers(0, 6)),
            draw(st.booleans()),
        )
        for _ in range(n_ops)
    ]
    # at least one completed non-empty commit so the store exists
    ops.append(
        (draw(st.integers(0, 3)), draw(st.integers(0, 50)),
         draw(st.integers(1, 6)), False)
    )
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(ops=ledger_op_sequences())
# pinned falsifying example (r17): a crashed non-empty attempt whose
# orphan is the store's ONLY data, then an empty batch commits the
# sequence-1 slot — vacuum then removes the orphan and must restore the
# canonical ABSENT state instead of leaving a schema-less root
@example(ops=[(0, 0, 1, True), (1, 0, 0, False), (1, 0, 1, False)])
def test_ledger_append_interleavings_match_model(
    spark, ops, tmp_path_factory
):
    """append_store_batch under ANY interleaving of duplicate,
    out-of-order, empty, and mid-write-crashing attempts must agree
    with the Python model of the protocol:

    - first ledger commit WINS a sequence; every later attempt of a
      committed seq (commit or crash) is a no-op at the replay guard;
    - a crashed attempt leaves its own orphan leaves only, and the next
      attempt of the SAME seq self-heals them before writing;
    - read_committed sees exactly the committed rows, whatever orphan
      state the tree is in; vacuum_store then deletes exactly the
      orphans of sequences that never committed."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import automate_data_ingestion_project_spark.io.maintenance as maint
    from automate_data_ingestion_project_spark.io.maintenance import (
        append_store_batch,
        read_committed,
        vacuum_store,
    )

    root = str(tmp_path_factory.mktemp("ledger_race"))
    data, ledger = root + "/data", root + "/ledger"

    def mk(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vid"),
            (F.col("id") % 3).cast("int").alias("cell"),
        )

    committed: dict[int, set[int]] = {}
    orphans: dict[int, set[int]] = {}
    real_append = maint.append_ledger_row
    for seq, lo, n, crash in ops:
        rows = set(range(lo, lo + n))
        if crash:
            def crash_on_ledger(spark_, lp, batch_seq, counts):
                if lp == ledger:
                    raise RuntimeError("injected ledger crash")
                return real_append(spark_, lp, batch_seq, counts)

            maint.append_ledger_row = crash_on_ledger
            try:
                if seq in committed:
                    append_store_batch(
                        spark, data, ledger, mk(lo, n), seq, "cell", "vid"
                    )  # replay guard fires before any write: no raise
                else:
                    with _pytest.raises(RuntimeError, match="injected"):
                        append_store_batch(
                            spark, data, ledger, mk(lo, n), seq, "cell", "vid"
                        )
                    orphans[seq] = rows  # prior orphans self-healed first
            finally:
                maint.append_ledger_row = real_append
        else:
            append_store_batch(
                spark, data, ledger, mk(lo, n), seq, "cell", "vid"
            )
            if seq not in committed:
                committed[seq] = rows
                orphans.pop(seq, None)

    from automate_data_ingestion_project_spark.io.maintenance import (
        store_exists,
    )

    want_committed = sorted(
        (v, s) for s, vs in committed.items() for v in vs
    )
    if not store_exists(spark, data):
        # every committed batch was empty and no crash got as far as a
        # data write — a legal store state (ledger rows, no data tree)
        assert want_committed == []
        assert all(not vs for vs in orphans.values())
        return
    spark.catalog.refreshByPath(data)
    got_committed = sorted(
        (r.vid, r.batch_seq)
        for r in read_committed(spark, data, ledger).collect()
    )
    assert got_committed == want_committed

    # raw read additionally sees the surviving orphans; vacuum removes
    # exactly those (committed generations untouched)
    want_orphans = sorted(
        (v, s) for s, vs in orphans.items() if s not in committed for v in vs
    )
    got_raw = sorted(
        (r.vid, r.batch_seq) for r in spark.read.parquet(data).collect()
    )
    assert got_raw == sorted(want_committed + want_orphans)
    vacuum_store(spark, data, ledger)
    if not store_exists(spark, data):
        # the vacuumed orphans were the only parquet files in the tree
        # (every committed batch was empty): vacuum restores the
        # canonical ABSENT state rather than leaving a schema-less
        # root that fails every later raw read
        assert want_committed == []
        return
    got_after = sorted(
        (r.vid, r.batch_seq) for r in spark.read.parquet(data).collect()
    )
    assert got_after == want_committed


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(ops=ledger_op_sequences())
def test_tombstone_appends_are_replay_idempotent(
    spark, ops, tmp_path_factory
):
    """append_tombstones under ANY interleaving of duplicate,
    out-of-order, empty, and crashing tombstone batches: the effective
    deletion mask is the union of the FIRST-committed id set per
    sequence — replays and crashes never double, drop, or resurrect a
    tombstone — and the masked read equals the Python model's
    anti-join."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import automate_data_ingestion_project_spark.io.maintenance as maint
    from automate_data_ingestion_project_spark.io.maintenance import (
        append_store_batch,
        append_tombstones,
        read_committed,
    )

    root = str(tmp_path_factory.mktemp("tombstone_race"))
    data, ledger = root + "/data", root + "/ledger"
    t_data, t_ledger = root + "/tombstones", root + "/tombstone_ledger"
    n_rows = 60
    append_store_batch(
        spark,
        data,
        ledger,
        spark.range(0, n_rows).select(
            F.col("id").alias("vid"),
            (F.col("id") % 3).cast("int").alias("cell"),
        ),
        0,
        "cell",
        "vid",
    )

    committed: dict[int, set[int]] = {}
    real_append = maint.append_ledger_row
    for seq, lo, n, crash in ops:
        ids = {v % n_rows for v in range(lo, lo + n)}
        df = spark.createDataFrame(
            [(v,) for v in sorted(ids)] or [(None,)], "vid long"
        ).filter(F.col("vid").isNotNull())
        if crash:
            def crash_on_ledger(spark_, lp, batch_seq, counts):
                if lp == t_ledger:
                    raise RuntimeError("injected tombstone-ledger crash")
                return real_append(spark_, lp, batch_seq, counts)

            maint.append_ledger_row = crash_on_ledger
            try:
                if seq in committed:
                    append_tombstones(spark, t_data, t_ledger, df, seq, "vid")
                else:
                    with _pytest.raises(RuntimeError, match="injected"):
                        append_tombstones(
                            spark, t_data, t_ledger, df, seq, "vid"
                        )
            finally:
                maint.append_ledger_row = real_append
        else:
            append_tombstones(spark, t_data, t_ledger, df, seq, "vid")
            committed.setdefault(seq, ids)  # first commit wins

    dead = set().union(*committed.values()) if committed else set()
    got = sorted(
        r.vid
        for r in read_committed(
            spark,
            data,
            ledger,
            tombstones_path=t_data,
            tombstone_ledger_path=t_ledger,
            id_col="vid",
        ).collect()
    )
    assert got == sorted(set(range(n_rows)) - dead)


@st.composite
def compactor_race_plans(draw):
    """(n_pre, n_window, n_post, retention): how many batches commit
    before the compaction, inside its read->swap window, and after it —
    and whether the compaction is a full collapse or a retention fold.
    The window count of 0 is in the space (the non-racing base case the
    rest of the suite pins must keep holding under the guard)."""
    n_pre = draw(st.integers(min_value=1, max_value=3))
    return (
        n_pre,
        draw(st.integers(min_value=0, max_value=2)),
        draw(st.integers(min_value=0, max_value=2)),
        draw(st.booleans()) and n_pre >= 2,
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(plan=compactor_race_plans())
def test_compactor_append_interleavings_match_model(
    spark, plan, tmp_path_factory
):
    """compact_store_tree racing append_store_batch, against the Python
    model of the reconciliation contract: every batch that COMMITS —
    before the compaction, inside its read->swap window, or after the
    swap — survives with all its rows; batches the pinned scan observed
    fold per the mode (full collapse -> -1; retention -> -1 up to
    upto_seq, preserved above); window/post batches keep their own
    generation. A second, quiet compaction then folds everything and
    the content is still exactly the model's."""
    from pyspark.sql import functions as F

    import automate_data_ingestion_project_spark.io.maintenance as maint
    from automate_data_ingestion_project_spark.io.maintenance import (
        COMPACTED_BATCH_SEQ,
        append_store_batch,
        compact_store_tree,
        read_committed,
    )

    n_pre, n_win, n_post, retention = plan
    root = str(tmp_path_factory.mktemp("compactor_race"))
    data, ledger = root + "/data", root + "/ledger"

    def mk(seq):
        return spark.range(seq * 10, seq * 10 + 5).select(
            F.col("id").alias("vid"),
            (F.col("id") % 3).cast("int").alias("cell"),
        )

    def rows_of(seq):
        return set(range(seq * 10, seq * 10 + 5))

    for seq in range(n_pre):
        append_store_batch(spark, data, ledger, mk(seq), seq, "cell", "vid")

    upto = n_pre - 2 if retention else None
    win_seqs = list(range(n_pre, n_pre + n_win))
    real_swap = maint._checked_swap

    def racing_swap(fs, live, old, tmp, reconcile=None):
        for seq in win_seqs:
            append_store_batch(
                spark, data, ledger, mk(seq), seq, "cell", "vid"
            )
        return real_swap(fs, live, old, tmp, reconcile)

    maint._checked_swap = racing_swap
    try:
        compact_store_tree(
            spark, data, "cell", "vid", upto_seq=upto, ledger_path=ledger
        )
    finally:
        maint._checked_swap = real_swap

    post_seqs = list(range(n_pre + n_win, n_pre + n_win + n_post))
    for seq in post_seqs:
        append_store_batch(spark, data, ledger, mk(seq), seq, "cell", "vid")

    # the model: generation classes after the racing compaction
    folded = [s for s in range(n_pre) if upto is None or s <= upto]
    kept = [s for s in range(n_pre) if upto is not None and s > upto]
    want = sorted(
        [(v, COMPACTED_BATCH_SEQ) for s in folded for v in rows_of(s)]
        + [(v, s) for s in kept + win_seqs + post_seqs for v in rows_of(s)]
    )
    got = sorted(
        (r.vid, r.batch_seq)
        for r in read_committed(spark, data, ledger).collect()
    )
    assert got == want

    # a quiet full collapse then folds every surviving generation
    compact_store_tree(spark, data, "cell", "vid", ledger_path=ledger)
    got_all = sorted(
        (r.vid, r.batch_seq)
        for r in read_committed(spark, data, ledger).collect()
    )
    assert got_all == sorted(
        (v, COMPACTED_BATCH_SEQ)
        for s in folded + kept + win_seqs + post_seqs
        for v in rows_of(s)
    )


@st.composite
def checkpointed_append_plans(draw):
    """(ops, ckpt_after): append ops — (batch_seq, lo, n) with
    duplicate sequences (replays) in the space — plus the set of op
    indices after which a ledger CHECKPOINT runs. Folding mid-stream at
    arbitrary points must be invisible to every protocol read."""
    n_ops = draw(st.integers(min_value=2, max_value=6))
    ops = [
        (
            draw(st.integers(0, 4)),
            draw(st.integers(0, 50)),
            draw(st.integers(0, 6)),
        )
        for _ in range(n_ops)
    ]
    ckpt_after = {
        i for i in range(n_ops) if draw(st.booleans())
    }
    return ops, ckpt_after


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(plan=checkpointed_append_plans())
def test_ledger_checkpoints_are_invisible_to_the_protocol(
    spark, plan, tmp_path_factory
):
    """checkpoint_ledger interleaved at ARBITRARY points in an append
    stream (with replayed sequences in the mix) must be invisible:
    first-commit-wins still holds across a fold (a replayed sequence
    whose row now lives in a checkpoint still no-ops), and the final
    committed view equals the Python model's exactly."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.io.maintenance import (
        append_store_batch,
        checkpoint_ledger,
        committed_batch_seqs,
        read_committed,
        store_exists,
    )

    ops, ckpt_after = plan
    root = str(tmp_path_factory.mktemp("ckpt_race"))
    data, ledger = root + "/data", root + "/ledger"

    def mk(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vid"),
            (F.col("id") % 3).cast("int").alias("cell"),
        )

    committed: dict[int, set[int]] = {}
    for i, (seq, lo, n) in enumerate(ops):
        append_store_batch(spark, data, ledger, mk(lo, n), seq, "cell", "vid")
        if seq not in committed:
            committed[seq] = set(range(lo, lo + n))
        if i in ckpt_after:
            checkpoint_ledger(spark, ledger)

    assert committed_batch_seqs(spark, ledger) == set(committed)
    want = sorted((v, s) for s, vs in committed.items() for v in vs)
    if not store_exists(spark, data):
        assert want == []  # every committed batch was empty
        return
    got = sorted(
        (r.vid, r.batch_seq)
        for r in read_committed(spark, data, ledger).collect()
    )
    assert got == want


@st.composite
def takedown_op_sequences(draw):
    """Interleaved takedown traffic on ONE shared tombstone store:
    ("drain", [id-batches]) runs the streaming drain (one epoch per
    feed file, continuing the same checkpoint), ("direct", [ids]) is an
    auto-sequenced append_tombstones (delete_docs style, max committed
    + 1) — the exact interleave class whose fixed-base predecessor
    silently dropped stream epochs. Ids are disjoint and increasing so
    the model is a pure set union."""
    n_ops = draw(st.integers(min_value=2, max_value=4))
    ops, lo = [], 0
    for _ in range(n_ops):
        kind = draw(st.sampled_from(["drain", "direct"]))
        batches = []
        for _ in range(draw(st.integers(1, 2)) if kind == "drain" else [1][0]):
            n = draw(st.integers(1, 4))
            batches.append(list(range(lo, lo + n)))
            lo += n
        ops.append((kind, batches))
    # end on a drain so the final epoch always has a prior direct to
    # potentially collide with somewhere in the space
    n = draw(st.integers(1, 4))
    ops.append(("drain", [list(range(lo, lo + n))]))
    return ops


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(ops=takedown_op_sequences())
def test_takedown_interleavings_commit_every_id(
    spark, ops, tmp_path_factory
):
    """ANY interleaving of streaming drains and auto-sequenced direct
    appends on one tombstone store commits EVERY submitted id (the
    union model — deletion requests are never silently dropped), with
    one committed ledger sequence per batch (no epoch ever no-ops
    against a foreign commit's slot)."""
    import os

    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.io.maintenance import (
        append_tombstones,
        committed_batch_seqs,
        read_committed,
    )
    from automate_data_ingestion_project_spark.streaming.tombstones import (
        stream_tombstone_ingest,
    )

    root = str(tmp_path_factory.mktemp("takedown_race"))
    src = os.path.join(root, "takedowns")
    t_data = os.path.join(root, "tombstones")
    t_ledger = os.path.join(root, "tombstone_ledger")
    ckpt = os.path.join(root, "ckpt")

    all_ids: set[int] = set()
    n_batches = 0
    feed_no = 0
    for kind, batches in ops:
        if kind == "direct":
            committed = committed_batch_seqs(spark, t_ledger)
            seq = (max(committed) + 1) if committed else 0
            ids = spark.createDataFrame(
                [(i,) for i in batches[0]], "doc_id long"
            )
            append_tombstones(spark, t_data, t_ledger, ids, seq, "doc_id")
        else:
            for b in batches:
                spark.createDataFrame(
                    [(i,) for i in b], "doc_id long"
                ).coalesce(1).write.parquet(
                    os.path.join(src, f"feed{feed_no}")
                )
                feed_no += 1
            stream_tombstone_ingest(
                spark, os.path.join(src, "*"), t_data, t_ledger, ckpt,
                "doc_id", "doc_id long",
            )
        all_ids.update(i for b in batches for i in b)
        n_batches += len(batches)

    assert len(committed_batch_seqs(spark, t_ledger)) == n_batches
    got = sorted(
        r.doc_id for r in read_committed(spark, t_data, t_ledger).collect()
    )
    assert got == sorted(all_ids)
