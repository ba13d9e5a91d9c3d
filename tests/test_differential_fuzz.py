"""Differential fuzzing: randomly generated relational queries executed by
BOTH our engine and DuckDB on the same parquet table, results compared
cell-by-cell.

Each seed draws a filter (AND/OR tree of comparisons), an optional
group-by + aggregate set, and a deterministic sort. The generator emits
the query twice — once through the ibis_spark API, once as ANSI SQL — so
a mismatch localizes a semantics bug, not a test artifact. This mirrors
the reference's backend-comparison strategy (SURVEY §5) with DuckDB as
the trusted engine.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

import ibis_spark as ib

SF_DIR = "/root/testdata/sf0.01"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


@pytest.fixture(scope="module")
def li(con):
    return con.read_parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def duck():
    d = duckdb.connect()
    d.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    return d


def _gen_comparison(rng):
    """One comparison; returns (build_fn, sql)."""
    kind = rng.choice(["num", "str", "key"])
    if kind == "num":
        col = rng.choice(NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=="])
        val = round(rng.uniform(0.0, 50.0 if col == "l_quantity" else 0.1), 3)
        sql_op = "=" if op == "==" else op
        return (
            lambda t, col=col, op=op, val=val: {
                "<": t[col] < val,
                "<=": t[col] <= val,
                ">": t[col] > val,
                ">=": t[col] >= val,
                "==": t[col] == val,
            }[op],
            f"{col} {sql_op} {val}",
        )
    if kind == "str":
        col = rng.choice(STR_COLS)
        val = rng.choice(["A", "N", "R", "O", "F"])
        neg = rng.random() < 0.3
        if neg:
            return (
                lambda t, col=col, val=val: t[col] != val,
                f"{col} <> '{val}'",
            )
        return (lambda t, col=col, val=val: t[col] == val, f"{col} = '{val}'")
    col = rng.choice(KEY_COLS)
    val = rng.randint(0, 2000)
    op = rng.choice(["<", ">", "%"])
    if op == "%":
        m = rng.randint(2, 7)
        return (
            lambda t, col=col, m=m: (t[col] % m) == 0,
            f"({col} % {m}) = 0",
        )
    return (
        lambda t, col=col, op=op, val=val: (t[col] < val)
        if op == "<"
        else (t[col] > val),
        f"{col} {op} {val}",
    )


def _gen_predicate(rng, depth=2):
    left = _gen_comparison(rng)
    if depth <= 0 or rng.random() < 0.4:
        return left
    right = _gen_predicate(rng, depth - 1)
    if rng.random() < 0.5:
        return (
            lambda t, l=left[0], r=right[0]: l(t) & r(t),
            f"({left[1]}) AND ({right[1]})",
        )
    return (
        lambda t, l=left[0], r=right[0]: l(t) | r(t),
        f"({left[1]}) OR ({right[1]})",
    )


AGGS = [
    ("count", lambda c: c.count(), "COUNT({col})"),
    ("sum", lambda c: c.sum().round(3), "ROUND(SUM({col}), 3)"),
    ("min", lambda c: c.min(), "MIN({col})"),
    ("max", lambda c: c.max(), "MAX({col})"),
    ("nunique", lambda c: c.nunique(), "COUNT(DISTINCT {col})"),
]


def _run_case(seed, li, duck):
    rng = random.Random(seed)
    pred_fn, pred_sql = _gen_predicate(rng)
    group = rng.choice(STR_COLS + ["l_returnflag"]) if rng.random() < 0.7 else None

    metrics = {}
    sql_metrics = []
    for i in range(rng.randint(1, 3)):
        name, fn, sql_t = AGGS[rng.randrange(len(AGGS))]
        col = rng.choice(NUM_COLS + KEY_COLS)
        alias = f"m{i}_{name}"
        metrics[alias] = (fn, col)
        sql_metrics.append(f"{sql_t.format(col=col)} AS {alias}")

    f = li.filter(pred_fn(li))
    if group is not None:
        out = f.group_by(group).aggregate(
            **{a: fn(f[c]) for a, (fn, c) in metrics.items()}
        ).order_by(group)
        sql = (
            f"SELECT {group}, {', '.join(sql_metrics)} FROM lineitem "
            f"WHERE {pred_sql} GROUP BY {group} ORDER BY {group}"
        )
    else:
        out = f.aggregate(**{a: fn(f[c]) for a, (fn, c) in metrics.items()})
        sql = f"SELECT {', '.join(sql_metrics)} FROM lineitem WHERE {pred_sql}"

    got = out.execute()
    want = duck.sql(sql).df()
    assert list(got.columns) == list(want.columns), (seed, sql)
    assert len(got) == len(want), (seed, sql, len(got), len(want))
    for c in got.columns:
        for g, w in zip(got[c].tolist(), want[c].tolist()):
            if g is None and w is None:
                continue
            if isinstance(g, float) or isinstance(w, float):
                gn = float("nan") if g is None else float(g)
                wn = float("nan") if w is None else float(w)
                assert (math.isnan(gn) and math.isnan(wn)) or math.isclose(
                    gn, wn, rel_tol=1e-9, abs_tol=1e-9
                ), (seed, sql, c, g, w)
            else:
                assert g == w, (seed, sql, c, g, w)


@pytest.mark.parametrize("seed", range(25))
def test_differential_random_queries(seed, li, duck):
    _run_case(seed, li, duck)


# -- window-function family (events: ts unique per user_id → deterministic) --

WINDOW_FNS = [
    ("rank", lambda c: c.rank(), "RANK() OVER w - 1"),
    ("dense_rank", lambda c: c.dense_rank(), "DENSE_RANK() OVER w - 1"),
    (
        "lag",
        lambda c: c.lag(1),
        "LAG(value, 1) OVER w",
    ),
    (
        "lead",
        lambda c: c.lead(2),
        "LEAD(value, 2) OVER w",
    ),
    (
        "cumsum",
        lambda c: c.cumsum(),
        "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3)",
    ),
    (
        "moving_avg",
        lambda c: c.mean(),
        "ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3)",
    ),
]


@pytest.fixture(scope="module")
def ev(con):
    return con.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def duck_ev(duck):
    duck.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    return duck


def _run_window_case(seed, ev, duck):
    rng = random.Random(seed)
    name, fn, sql_expr = WINDOW_FNS[rng.randrange(len(WINDOW_FNS))]
    w = ib.window(group_by=ev.user_id, order_by=ev.ts)
    if name == "moving_avg":
        w = w.rows(-2, 0)
        col = fn(ev.value).over(w).round(3)
    elif name == "cumsum":
        col = fn(ev.value).over(w).round(3)
    elif name in ("rank", "dense_rank"):
        # rank over the ORDER key (ts), ibis 0-indexed
        col = fn(ev.ts).over(w)
    else:
        col = fn(ev.value).over(w)
    out = (
        ev.select("event_id", x=col).order_by("event_id").execute()
    )
    sql = (
        f"SELECT event_id, {sql_expr} AS x FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts) ORDER BY event_id"
    )
    want = duck.sql(sql).df()
    assert len(out) == len(want)
    for g, wv in zip(out["x"].tolist(), want["x"].tolist()):
        if g is None or (isinstance(g, float) and math.isnan(g)):
            assert wv is None or (isinstance(wv, float) and math.isnan(wv)), (
                seed,
                name,
                g,
                wv,
            )
        else:
            assert math.isclose(float(g), float(wv), rel_tol=1e-9), (
                seed,
                name,
                g,
                wv,
            )


@pytest.mark.parametrize("seed", range(12))
def test_differential_window_queries(seed, ev, duck_ev):
    _run_window_case(seed, ev, duck_ev)


# -- join family: random join type + filters, aggregated to determinism ------


@pytest.fixture(scope="module")
def orders(con):
    return con.read_parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def duck_orders(duck):
    duck.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return duck


def _run_join_case(seed, li, orders, duck):
    rng = random.Random(1000 + seed)
    how = rng.choice(["inner", "left", "semi", "anti"])
    lpred_fn, lpred_sql = _gen_comparison(rng)
    opred_val = rng.choice(["F", "O", "P"])

    lf = li.filter(lpred_fn(li))
    of = orders.filter(orders.o_orderstatus == opred_val)

    if how in ("semi", "anti"):
        j = lf.semi_join(of, [("l_orderkey", "o_orderkey")]) if how == "semi" else lf.anti_join(of, [("l_orderkey", "o_orderkey")])
        out = j.aggregate(
            n=j.l_orderkey.count(), s=j.l_extendedprice.sum().round(2)
        ).execute()
        op = "IN" if how == "semi" else "NOT IN"
        sql = (
            "SELECT COUNT(l_orderkey) AS n, ROUND(SUM(l_extendedprice), 2) AS s "
            f"FROM lineitem WHERE ({lpred_sql}) AND l_orderkey {op} "
            f"(SELECT o_orderkey FROM orders WHERE o_orderstatus = '{opred_val}')"
        )
    else:
        j = lf.join(of, [("l_orderkey", "o_orderkey")], how=how)
        out = j.aggregate(
            n=j.l_orderkey.count(),
            s=j.l_extendedprice.sum().round(2),
            k=j.o_custkey.count(),
        ).execute()
        jk = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = (
            "SELECT COUNT(l_orderkey) AS n, ROUND(SUM(l_extendedprice), 2) AS s, "
            "COUNT(o_custkey) AS k FROM "
            f"(SELECT * FROM lineitem WHERE {lpred_sql}) l {jk} "
            f"(SELECT * FROM orders WHERE o_orderstatus = '{opred_val}') o "
            "ON l.l_orderkey = o.o_orderkey"
        )
    want = duck.sql(sql).df()
    for c in out.columns:
        g, w = out[c][0], want[c][0]
        if g is None or (isinstance(g, float) and math.isnan(g)):
            assert w is None or (isinstance(w, float) and math.isnan(w)), (seed, how, c)
        else:
            assert math.isclose(float(g), float(w), rel_tol=1e-9), (
                seed,
                how,
                sql,
                c,
                g,
                w,
            )


@pytest.mark.parametrize("seed", range(12))
def test_differential_join_queries(seed, li, orders, duck_orders):
    _run_join_case(seed, li, orders, duck_orders)


# -- set-operation family ----------------------------------------------------


def _run_setop_case(seed, li, duck):
    rng = random.Random(2000 + seed)
    p1_fn, p1_sql = _gen_comparison(rng)
    p2_fn, p2_sql = _gen_comparison(rng)
    op = rng.choice(["union_all", "union_distinct", "intersect", "except"])
    cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    a = li.filter(p1_fn(li)).select(*cols)
    b = li.filter(p2_fn(li)).select(*cols)
    if op == "union_all":
        out, sql_op = a.union(b), "UNION ALL"
    elif op == "union_distinct":
        out, sql_op = a.union(b, distinct=True), "UNION"
    elif op == "intersect":
        out, sql_op = a.intersect(b), "INTERSECT"
    else:
        out, sql_op = a.difference(b), "EXCEPT"
    got = out.aggregate(
        n=out.l_orderkey.count(), d=out.l_orderkey.nunique()
    ).execute()
    csel = ", ".join(cols)
    sql = (
        "SELECT COUNT(l_orderkey) AS n, COUNT(DISTINCT l_orderkey) AS d FROM ("
        f"SELECT {csel} FROM lineitem WHERE {p1_sql} {sql_op} "
        f"SELECT {csel} FROM lineitem WHERE {p2_sql})"
    )
    want = duck.sql(sql).df()
    assert got["n"][0] == want["n"][0], (seed, op, sql)
    assert got["d"][0] == want["d"][0], (seed, op, sql)


@pytest.mark.parametrize("seed", range(10))
def test_differential_setop_queries(seed, li, duck):
    _run_setop_case(seed, li, duck)


# -- as-of join family vs DuckDB's native ASOF JOIN --------------------------
# The as-of join is our highest-risk custom operator (union-tag + running
# last(ignoreNulls) — ibis_spark/expr/table.py). DuckDB implements the same
# backward semantics natively (l.ts >= r.ts, latest match), so random
# left/right subset splits make a true differential oracle.


def _run_asof_case(seed, ev, duck):
    rng = random.Random(3000 + seed)
    lm, rm = rng.choice([(2, 3), (3, 5), (2, 7), (4, 3)])
    direction = rng.choice(["backward", "forward"])
    cmp_op = ">=" if direction == "backward" else "<="
    left = ev.filter(ev.event_id % lm == 0)
    right = ev.filter(ev.event_id % rm == 0).select(
        "user_id", "ts", rvalue=ib._.value
    )
    j = left.asof_join(right, on="ts", by="user_id", direction=direction)
    got = j.aggregate(
        n=j.event_id.count(),
        matched=j.rvalue.count(),
        s=j.rvalue.sum().round(2),
    ).execute()
    sql = f"""
        SELECT COUNT(l.event_id) AS n, COUNT(r.rvalue) AS matched,
               ROUND(SUM(r.rvalue), 2) AS s
        FROM (SELECT * FROM events WHERE event_id % {lm} = 0) l
        ASOF LEFT JOIN (SELECT user_id, ts, value AS rvalue FROM events
                        WHERE event_id % {rm} = 0) r
        ON l.user_id = r.user_id AND l.ts {cmp_op} r.ts
    """
    want = duck.sql(sql).df()
    for c in ("n", "matched", "s"):
        g, w = got[c][0], want[c][0]
        if g is None or (isinstance(g, float) and math.isnan(g)):
            assert w is None or (isinstance(w, float) and math.isnan(w))
        else:
            assert math.isclose(float(g), float(w), rel_tol=1e-9), (seed, c, g, w)


@pytest.mark.parametrize("seed", range(8))
def test_differential_asof_queries(seed, ev, duck_ev):
    _run_asof_case(seed, ev, duck_ev)


# -- temporal family ----------------------------------------------------------

TEMPORAL_OPS = [
    ("year", lambda c: c.year(), "CAST(year(ts) AS INT)"),
    ("month", lambda c: c.month(), "CAST(month(ts) AS INT)"),
    ("day", lambda c: c.day(), "CAST(day(ts) AS INT)"),
    ("hour", lambda c: c.hour(), "CAST(hour(ts) AS INT)"),
    ("minute", lambda c: c.minute(), "CAST(minute(ts) AS INT)"),
    ("doy", lambda c: c.day_of_year(), "CAST(dayofyear(ts) AS INT)"),
    ("iso_year", lambda c: c.iso_year(), "CAST(isoyear(ts) AS INT)"),
    ("epoch_days", lambda c: c.epoch_days(),
     "CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)"),
    ("trunc_day", lambda c: c.truncate("D"), "date_trunc('day', ts)"),
    ("trunc_hour", lambda c: c.truncate("h"), "date_trunc('hour', ts)"),
    ("trunc_month", lambda c: c.truncate("M"), "date_trunc('month', ts)"),
]


def _run_temporal_case(seed, ev, duck):
    rng = random.Random(4000 + seed)
    name, fn, sql_expr = TEMPORAL_OPS[rng.randrange(len(TEMPORAL_OPS))]
    out = ev.select("event_id", x=fn(ev.ts)).order_by("event_id").execute()
    want = duck.sql(
        f"SELECT event_id, {sql_expr} AS x FROM events ORDER BY event_id"
    ).df()
    assert out["x"].tolist() == want["x"].tolist(), (seed, name)


@pytest.mark.parametrize("seed", range(11))
def test_differential_temporal_queries(seed, ev, duck_ev):
    _run_temporal_case(seed, ev, duck_ev)


# -- string family (documents.text) ------------------------------------------

STRING_OPS = [
    ("lower", lambda c: c.lower(), "lower(text)"),
    ("upper", lambda c: c.upper(), "upper(text)"),
    ("length", lambda c: c.length(), "CAST(length(text) AS INT)"),
    ("reverse", lambda c: c.reverse(), "reverse(text)"),
    ("left", lambda c: c.left(7), "left(text, 7)"),
    ("right", lambda c: c.right(5), "right(text, 5)"),
    # ibis substr is 0-indexed; DuckDB substr is 1-indexed
    ("substr", lambda c: c.substr(3, 9), "substr(text, 4, 9)"),
    # ibis find is 0-indexed; DuckDB strpos is 1-indexed (-1 shift)
    ("find", lambda c: c.find("the"), "CAST(strpos(text, 'the') - 1 AS BIGINT)"),
    ("replace", lambda c: c.replace("the", "THE"), "replace(text, 'the', 'THE')"),
    ("concat", lambda c: c + "|x", "text || '|x'"),
    ("trim", lambda c: c.strip(), "trim(text)"),
    ("startswith", lambda c: c.startswith("The"), "starts_with(text, 'The')"),
    ("contains", lambda c: c.contains("data"), "contains(text, 'data')"),
]


@pytest.fixture(scope="module")
def docs(con):
    return con.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def duck_docs(duck):
    duck.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return duck


def _run_string_case(seed, docs, duck):
    rng = random.Random(5000 + seed)
    name, fn, sql_expr = STRING_OPS[rng.randrange(len(STRING_OPS))]
    out = docs.select("doc_id", x=fn(docs.text)).order_by("doc_id").execute()
    want = duck.sql(
        f"SELECT doc_id, {sql_expr} AS x FROM documents ORDER BY doc_id"
    ).df()
    assert out["x"].tolist() == want["x"].tolist(), (seed, name)


@pytest.mark.parametrize("seed", range(13))
def test_differential_string_queries(seed, docs, duck_docs):
    _run_string_case(seed, docs, duck_docs)


# -- null-semantics family (3VL) over a shared null-rich table ---------------


@pytest.fixture(scope="module")
def nullt(con, duck):
    import pandas as pd

    rng = random.Random(99)
    n = 500
    pdf = pd.DataFrame(
        {
            "i": list(range(n)),
            "a": [rng.choice([None, rng.randint(-5, 5)]) for _ in range(n)],
            "b": [rng.choice([None, rng.randint(0, 3)]) for _ in range(n)],
            "s": [rng.choice([None, "x", "y", "z"]) for _ in range(n)],
        }
    ).astype({"a": "Int64", "b": "Int64"})
    duck.register("nulls_t", pdf)
    return con.memtable(pdf)


NULL_PREDS = [
    ("a IS NULL", lambda t: t.a.isnull()),
    ("a IS NOT NULL", lambda t: t.a.notnull()),
    ("COALESCE(a, b, 0) > 2", lambda t: t.a.coalesce(t.b, 0) > 2),
    ("NULLIF(a, b) IS NULL", lambda t: t.a.nullif(t.b).isnull()),
    ("a = b", lambda t: t.a == t.b),
    ("a IS NOT DISTINCT FROM b", lambda t: t.a.identical_to(t.b)),
    ("(a > 0) OR (s = 'x')", lambda t: (t.a > 0) | (t.s == "x")),
    ("(a > 0) AND (b < 2)", lambda t: (t.a > 0) & (t.b < 2)),
    ("s IS NULL", lambda t: t.s.isnull()),
    ("IFNULL(s, '?') = '?'", lambda t: t.s.fill_null("?") == "?"),
]


def _run_null_case(seed, nullt, duck):
    rng = random.Random(6000 + seed)
    sql_pred, fn = NULL_PREDS[rng.randrange(len(NULL_PREDS))]
    f = nullt.filter(fn(nullt))
    got = f.aggregate(
        n=f.i.count(), sa=f.a.sum(), nb=f.b.count()
    ).execute()
    want = duck.sql(
        "SELECT COUNT(i) AS n, SUM(a) AS sa, COUNT(b) AS nb "
        f"FROM nulls_t WHERE {sql_pred}"
    ).df()
    for c in ("n", "sa", "nb"):
        g, w = got[c][0], want[c][0]
        gn = None if g is None or (isinstance(g, float) and math.isnan(g)) else float(g)
        wn = None if w is None or (isinstance(w, float) and math.isnan(w)) else float(w)
        assert gn == wn, (seed, sql_pred, c, g, w)


@pytest.mark.parametrize("seed", range(10))
def test_differential_null_semantics(seed, nullt, duck):
    _run_null_case(seed, nullt, duck)


# ---------------------------------------------------------------------------
# planted-duplicate family: LLM dedup operators vs Python ground truth
# ---------------------------------------------------------------------------
# Each seed synthesizes a corpus with PLANTED near-duplicates whose true
# similarity (word-n-gram Jaccard / char-shingle Jaccard / cosine) is
# computed exhaustively in Python, then asserts:
#   precision: every dup edge the operator reports is a TRUE >=threshold
#              pair (the verify stage is exact, so zero tolerance);
#   recall:    >=80% of planted pairs comfortably above threshold are
#              flagged (LSH banding has a small per-pair miss probability,
#              so the bound is probabilistic, not exact).

_VOCAB = [f"w{i:03d}" for i in range(200)]


def _mk_corpus(rng, n_base=40, n_dup=8, words=30, mutate=2):
    """Base docs + near-dup copies with `mutate` word substitutions."""
    docs = {}
    for i in range(n_base):
        docs[i] = [rng.choice(_VOCAB) for _ in range(words)]
    for j in range(n_dup):
        src = rng.randrange(n_base)
        copy = list(docs[src])
        for _ in range(mutate):
            copy[rng.randrange(words)] = rng.choice(_VOCAB)
        docs[n_base + j] = copy
    ids = sorted(docs)
    return ids, [" ".join(docs[i]) for i in ids]


def _word_ngrams(text, n):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}


def _char_shingles(text, k=4):
    return {text[i : i + k] for i in range(max(len(text) - k + 1, 1))}


def _jac(a, b):
    return len(a & b) / max(len(a | b), 1)


def _check_dedup(out, ids, sims, threshold, margin=0.15):
    """Shared assertions: exact precision, >=80% recall on easy pairs."""
    rep = dict(zip(out["id"], out["rep_id"]))
    dup = dict(zip(out["id"], out["is_dup"]))
    assert set(rep) == set(ids)
    for i in ids:
        assert rep[i] <= i  # representative is the min of the component
        assert dup[i] == (rep[i] != i)
        if rep[i] != i:  # precision: reported edge must be truly similar
            assert sims[(rep[i], i)] >= threshold - 1e-9, (
                f"false dup: {rep[i]}<-{i} sim={sims[(rep[i], i)]}"
            )
    easy = [(a, b) for (a, b), s in sims.items() if s >= threshold + margin]
    if easy:
        caught = sum(1 for a, b in easy if dup[b] or dup[a])
        assert caught / len(easy) >= 0.8, f"recall {caught}/{len(easy)}"


@pytest.mark.parametrize("seed", range(8))
def test_planted_ngram_jaccard_dedup(seed, con):
    from ibis_spark import pipeline as pl

    rng = random.Random(1000 + seed)
    n = rng.choice([2, 3])
    threshold = rng.choice([0.5, 0.6])
    ids, texts = _mk_corpus(rng, mutate=rng.choice([1, 2]))
    sims = {}
    grams = {i: _word_ngrams(t, n) for i, t in zip(ids, texts)}
    for x in ids:
        for y in ids:
            if x < y:
                sims[(x, y)] = _jac(grams[x], grams[y])
    t = con.memtable({"doc_id": ids, "text": texts})
    out = (
        pl.ngram_jaccard_dedup(t, "text", "doc_id", n=n, threshold=threshold)
        .to_spark()
        .toPandas()
        .rename(columns={"doc_id": "id"})
    )
    _check_dedup(out, ids, sims, threshold)


@pytest.mark.parametrize("seed", range(6))
def test_planted_minhash_verified_dedup(seed, con):
    from ibis_spark import pipeline as pl

    rng = random.Random(2000 + seed)
    threshold = rng.choice([0.5, 0.6])
    ids, texts = _mk_corpus(rng, mutate=rng.choice([1, 2]))
    sims = {}
    sh = {i: _char_shingles(t) for i, t in zip(ids, texts)}
    for x in ids:
        for y in ids:
            if x < y:
                sims[(x, y)] = _jac(sh[x], sh[y])
    t = con.memtable({"doc_id": ids, "text": texts})
    out = (
        pl.minhash_dedup_verified(
            t, "text", "doc_id", num_hashes=64, bands=16,
            threshold=threshold, verify="exact",
        )
        .to_spark()
        .toPandas()
        .rename(columns={"doc_id": "id"})
    )
    _check_dedup(out, ids, sims, threshold)


@pytest.mark.parametrize("seed", range(8))
def test_planted_embedding_dedup(seed, con):
    import numpy as np

    from ibis_spark import pipeline as pl

    rng = random.Random(3000 + seed)
    np_rng = np.random.default_rng(3000 + seed)
    dim = rng.choice([8, 16, 24])
    threshold = 0.95
    n_base, n_dup = 40, 8
    vecs = {}
    for i in range(n_base):
        v = np_rng.standard_normal(dim)
        vecs[i] = v / np.linalg.norm(v)
    for j in range(n_dup):
        src = rng.randrange(n_base)
        v = vecs[src] + np_rng.standard_normal(dim) * rng.choice([0.02, 0.1])
        vecs[n_base + j] = v / np.linalg.norm(v)
    ids = sorted(vecs)
    sims = {}
    for x in ids:
        for y in ids:
            if x < y:
                sims[(x, y)] = float(vecs[x] @ vecs[y])
    t = con.memtable(
        {"vec_id": ids, "embedding": [[float(c) for c in vecs[i]] for i in ids]}
    )
    out = (
        pl.embedding_dedup(
            t, "embedding", "vec_id", threshold=threshold, dim=dim,
            seed=seed,
        )
        .to_spark()
        .toPandas()
        .rename(columns={"vec_id": "id"})
    )
    _check_dedup(out, ids, sims, threshold, margin=0.02)


# ---------------------------------------------------------------------------
# bucketed-tolerance asof family: vs pandas.merge_asof (exact oracle)
# ---------------------------------------------------------------------------
# A numeric/timedelta tolerance routes asof_join through the bucketed-window
# plan (window partitioned on tolerance-width buckets; right rows replicated
# into the neighbor bucket). pandas.merge_asof supports the identical
# (on, by, tolerance, direction) contract and is the ground truth here.


@pytest.mark.parametrize("seed", range(10))
def test_differential_bucketed_asof(seed, con):
    import pandas as pd

    rng = random.Random(4000 + seed)
    direction = rng.choice(["backward", "forward", "nearest"])
    tol = rng.choice([3, 5, 10])
    use_by = rng.random() < 0.7  # ~3 seeds hit the GLOBAL bucketed path
    n_l, n_r = rng.randint(20, 60), rng.randint(20, 60)
    groups = ["a", "b", "c"]
    left = pd.DataFrame(
        {
            "g": [rng.choice(groups) for _ in range(n_l)],
            "t": sorted(rng.randint(0, 300) for _ in range(n_l)),
            "lv": list(range(n_l)),
        }
    )
    right = pd.DataFrame(
        {
            "g": [rng.choice(groups) for _ in range(n_r)],
            "t": sorted(rng.randint(0, 300) for _ in range(n_r)),
            "rv": list(range(n_r)),
        }
    )
    # pandas merge_asof requires unique (by, on) on the right for a
    # well-defined nearest row under ties — dedupe keeping the last
    if not use_by:
        # no-by global asof: the bucketed window replaces the single-
        # partition funnel; drop g entirely and dedupe on t alone
        left = left.drop(columns=["g"])
        right = right.drop(columns=["g"])
    right = right.drop_duplicates(
        subset=(["g", "t"] if use_by else ["t"]), keep="last"
    ).reset_index(drop=True)

    lt_t = con.memtable(left.to_dict("list"))
    rt_t = con.memtable(right.to_dict("list"))
    sort_cols = (["g", "t", "lv"] if use_by else ["t", "lv"])
    got = (
        lt_t.asof_join(
            rt_t,
            on="t",
            by=("g" if use_by else ()),
            tolerance=tol,
            direction=direction,
        )
        .to_spark()
        .toPandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t",
        by=("g" if use_by else None),
        tolerance=tol,
        direction=direction,
        suffixes=("", "_right"),
    ).sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp)
    for i in range(len(exp)):
        g_rv, e_rv = got["rv"][i], exp["rv"][i]
        if pd.isna(e_rv):
            assert pd.isna(g_rv), f"row {i}: expected no match, got rv={g_rv}"
        else:
            # direction='nearest' can tie two equidistant right rows (one on
            # each side) and resolve differently; backward/forward have a
            # UNIQUE match under unique (by, t), so any mismatch there is a
            # genuine bug (e.g. a flipped bucket-offset sign)
            if g_rv != e_rv:
                assert direction == "nearest", (
                    f"row {i}: {direction} match must be unique, "
                    f"got rv={g_rv} exp rv={e_rv}"
                )
                cand = right[(right["g"] == got["g"][i])] if use_by else right
                d_e = abs(
                    int(cand[cand["rv"] == e_rv]["t"].iloc[0]) - got["t"][i]
                )
                d_g = abs(
                    int(cand[cand["rv"] == g_rv]["t"].iloc[0]) - got["t"][i]
                )
                assert d_g == d_e, (
                    f"row {i}: got rv={g_rv} (d={d_g}) exp rv={e_rv} (d={d_e})"
                )


# ---------------------------------------------------------------------------
# connected_components vs Python union-find (random graphs)
# ---------------------------------------------------------------------------

def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # component label = min node id in the component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


@pytest.mark.parametrize("seed", range(8))
def test_differential_connected_components(seed, con):
    """Random sparse graphs (including chains, stars, and isolated
    pairs) checked against a driver-side union-find: the iterative
    min-label propagation must converge to min-reachable-id exactly."""
    import random

    import ibis_spark.pipeline as pl

    rng = random.Random(1000 + seed)
    n_nodes = rng.randint(10, 80)
    n_edges = rng.randint(5, n_nodes * 2)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    # force one long chain so convergence needs multiple iterations
    chain_len = rng.randint(3, 9)
    chain = rng.sample(range(n_nodes), min(chain_len, n_nodes))
    edges += list(zip(chain, chain[1:]))
    edges = [e for e in edges if e[0] != e[1]]
    if not edges:
        edges = [(0, 1)]
    t = con.memtable({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    nodes = sorted({x for e in edges for x in e})
    want = _union_find_components(edges, nodes)
    algorithm = "pointer" if seed % 2 else "label"
    got = {
        r.id: r.component
        for r in pl.connected_components(t, "a", "b", algorithm=algorithm).df.collect()
    }
    assert got == want, f"seed {seed} ({algorithm}): CC mismatch"


# ---------------------------------------------------------------------------
# line_dedup vs a driver-side reference implementation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(6))
def test_differential_line_dedup(seed, con):
    """Random multi-line docs with planted shared lines vs a pure-Python
    first-occurrence reference (same (id, pos) order rule)."""
    import random

    import ibis_spark.pipeline as pl

    rng = random.Random(2000 + seed)
    vocab = ["red", "green", "blue", "shared line one", "shared line two", ""]
    docs = {}
    for doc_id in range(rng.randint(3, 10)):
        n_lines = rng.randint(1, 6)
        docs[doc_id] = [rng.choice(vocab) for _ in range(n_lines)]
    # reference: first (doc_id, pos) occurrence of each line survives
    seen = set()
    want = {}
    for doc_id in sorted(docs):
        kept = []
        for line in docs[doc_id]:
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            want[doc_id] = "\n".join(kept)
    t = con.memtable(
        {"doc_id": list(docs), "text": ["\n".join(v) for v in docs.values()]}
    )
    got = {
        r.doc_id: r.text for r in pl.line_dedup(t, "text", "doc_id").df.collect()
    }
    assert got == want, f"seed {seed}: line_dedup mismatch"


# ---------------------------------------------------------------------------
# gap_fill vs pandas resample().agg().ffill()
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
def test_differential_gap_fill_vs_pandas(seed, con):
    """Random sparse event sets through Table.gap_fill vs the pandas
    groupby+resample+ffill it re-expresses — bucket alignment, span
    edges, empty-bucket fill, and multi-agg all checked cell-by-cell."""
    import datetime as dt
    import random

    import pandas as pd

    rng = random.Random(1000 + seed)
    hours = rng.choice([1, 3, 6])
    n = rng.randint(20, 120)
    groups = [f"g{i}" for i in range(rng.randint(1, 4))]
    base = dt.datetime(2024, 1, 1)
    rows = {
        "g": [rng.choice(groups) for _ in range(n)],
        "ts": [base + dt.timedelta(minutes=rng.randint(0, 14 * 24 * 60))
               for _ in range(n)],
        "v": [round(rng.uniform(-50, 50), 3) for _ in range(n)],
    }
    t = con.memtable(rows)
    agg = rng.choice(["avg", "sum", "min", "max"])
    got = {
        (r.g, r.ts): r.v
        for r in t.gap_fill("ts", dt.timedelta(hours=hours), {"v": agg},
                            by="g").df.collect()
    }
    pdf = pd.DataFrame(rows)
    pd_agg = {"avg": "mean", "sum": "sum", "min": "min", "max": "max"}[agg]
    want = {}
    for g, sub in pdf.groupby("g"):
        r = sub.set_index("ts")["v"].resample(f"{hours}h")
        # pandas epoch-aligns bins like F.window; sum needs min_count=1
        # so an EMPTY bin is NaN (engine contract: null, then ffill) —
        # plain .sum() would invent a 0.0 instead of carrying forward
        res = (r.sum(min_count=1) if agg == "sum" else r.agg(pd_agg)).ffill()
        for ts, v in res.items():
            want[(g, ts.to_pydatetime())] = None if pd.isna(v) else v
    assert set(got) == set(want), f"seed {seed}: spine mismatch"
    for k in want:
        gv, wv = got[k], want[k]
        assert gv is not None and wv is not None, (k, gv, wv)
        assert abs(gv - wv) < 1e-9, (k, gv, wv)
