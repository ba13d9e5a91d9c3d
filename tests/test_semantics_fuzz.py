"""Randomized semantics checks: our scalar ops vs Python ground truth.

One memtable of seeded-random values per family, every op computed in a
single Spark pass, compared element-wise against the Python semantics the
reference promises (0-based find, python-style slicing, Monday-0 weekday,
float division, null-preserving clip)."""

from __future__ import annotations

import datetime
import math
import random
import string

import pytest

import ibis_spark as ib


@pytest.fixture(scope="module")
def con(spark):
    return ib.connect(spark)


def test_string_semantics(con):
    rng = random.Random(42)
    alpha = string.ascii_lowercase + "   "
    vals = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 20))) for _ in range(200)]
    vals += ["", "  pad  ", "aaa", "needle in a needle"]
    t = con.memtable({"i": list(range(len(vals))), "s": vals})
    out = t.select(
        "i",
        lo=t.s.lower(),
        up=t.s.upper(),
        rev=t.s.reverse(),
        stripped=t.s.strip(),
        sub=t.s.substr(2, 5),
        lft=t.s.left(3),
        rgt=t.s.right(3),
        fnd=t.s.find("a"),
        fnd2=t.s.find("a", start=2),
        ln=t.s.length(),
        sw=t.s.startswith("a"),
        ct=t.s.contains("ne"),
    ).df.collect()
    by_i = {r.i: r for r in out}
    for i, s in enumerate(vals):
        r = by_i[i]
        assert r.lo == s.lower() and r.up == s.upper()
        assert r.rev == s[::-1]
        assert r.stripped == s.strip()
        assert r.sub == s[2:7]
        assert r.lft == s[:3] and r.rgt == (s[-3:] if len(s) >= 3 else s)
        assert r.fnd == s.find("a"), (s, r.fnd)
        assert r.fnd2 == s.find("a", 2), (s, r.fnd2)
        assert r.ln == len(s)
        assert r.sw == s.startswith("a")
        assert r.ct == ("ne" in s)


def test_numeric_semantics(con):
    rng = random.Random(7)
    vals = [rng.uniform(-1000, 1000) for _ in range(200)] + [0.0, -0.0, 1e-9, -5.5, 5.5]
    t = con.memtable({"i": list(range(len(vals))), "x": vals})
    out = t.select(
        "i",
        ab=t.x.abs(),
        ce=t.x.ceil(),
        fl=t.x.floor(),
        sg=t.x.sign(),
        dv=t.x / 4,
        fd=(t.x.cast("int64") // 7),
        md=(t.x.cast("int64") % 7),
        cl=t.x.clip(-100, 100),
    ).df.collect()
    by_i = {r.i: r for r in out}
    for i, x in enumerate(vals):
        r = by_i[i]
        assert r.ab == abs(x)
        assert r.ce == math.ceil(x) and r.fl == math.floor(x)
        assert r.sg == (0 if x == 0 else math.copysign(1, x))
        assert r.dv == pytest.approx(x / 4)
        xi = int(x)
        # reference FloorDivide/Modulus follow Spark's integer semantics:
        # truncated division with sign-of-dividend remainder
        assert r.md == math.fmod(xi, 7), (xi, r.md)
        assert r.cl == max(-100.0, min(100.0, x))


def test_temporal_semantics(con):
    rng = random.Random(13)
    base = datetime.datetime(2020, 1, 1)
    vals = [base + datetime.timedelta(seconds=rng.randint(0, 4 * 365 * 86400)) for _ in range(200)]
    t = con.memtable({"i": list(range(len(vals))), "ts": vals})
    out = t.select(
        "i",
        yr=t.ts.year(),
        mo=t.ts.month(),
        dy=t.ts.day(),
        hh=t.ts.hour(),
        dow=t.ts.day_of_week.index(),
        dname=t.ts.day_of_week.full_name(),
        ym=t.ts.strftime("%Y-%m-%d"),
    ).df.collect()
    by_i = {r.i: r for r in out}
    for i, ts in enumerate(vals):
        r = by_i[i]
        assert (r.yr, r.mo, r.dy, r.hh) == (ts.year, ts.month, ts.day, ts.hour)
        assert r.dow == ts.weekday()  # Monday=0, reference semantics
        assert r.dname == ts.strftime("%A")
        assert r.ym == ts.strftime("%Y-%m-%d")


def test_array_index_semantics(con):
    rng = random.Random(99)
    arrays = [[rng.randint(0, 9) for _ in range(rng.randint(0, 6))] for _ in range(100)]
    t = con.memtable(
        {"i": list(range(len(arrays))), "a": arrays},
        schema={"i": "int64", "a": "array<int64>"},
    )
    out = t.select(
        "i",
        first=t.a.array_index(0),
        last=t.a.array_index(-1),
        oob=t.a.array_index(10),
        sl=t.a.array_slice(1, 3),
        n=t.a.array_length(),
    ).df.collect()
    by_i = {r.i: r for r in out}
    for i, a in enumerate(arrays):
        r = by_i[i]
        assert r.first == (a[0] if a else None)
        assert r.last == (a[-1] if a else None)
        assert r.oob is None
        assert list(r.sl) == a[1:3]
        assert r.n == len(a)


def test_ordered_reduction_directions_fuzz(con):
    """first/last/collect under random sort-key direction combinations
    vs a Python oracle — covers the comparator fallback path (mixed
    directions) and both uniform fast paths."""
    rng = random.Random(1234)
    n = 200
    rows = [
        (
            rng.randint(0, 5),              # group
            rng.randint(0, 8),              # k1 (ties likely)
            rng.choice("abcde"),            # k2 string
            i,                              # uid — unique tiebreaker
            rng.randint(0, 999),            # value
        )
        for i in range(n)
    ]
    t = con.memtable(
        {
            "g": [r[0] for r in rows],
            "k1": [r[1] for r in rows],
            "k2": [r[2] for r in rows],
            "uid": [r[3] for r in rows],
            "v": [r[4] for r in rows],
        }
    )
    for a1 in (True, False):
        for a2 in (True, False):
            keys = [
                t.k1.asc() if a1 else t.k1.desc(),
                t.k2.asc() if a2 else t.k2.desc(),
                t.uid.asc(),
            ]
            out = t.group_by("g").aggregate(
                f=t.v.first(order_by=list(keys)),
                l=t.v.last(order_by=list(keys)),
                c=t.v.collect(order_by=list(keys)),
            )
            got = {r.g: (r.f, r.l, list(r.c)) for r in out.df.collect()}

            def sort_key(r):
                k1 = r[1] if a1 else -r[1]
                # string desc: invert via ord complement per char
                k2 = r[2] if a2 else "".join(chr(255 - ord(ch)) for ch in r[2])
                return (k1, k2, r[3])

            for g in set(r[0] for r in rows):
                grp = sorted((r for r in rows if r[0] == g), key=sort_key)
                want = [r[4] for r in grp]
                assert got[g] == (want[0], want[-1], want), (a1, a2, g)


def test_array_reduction_semantics(con):
    """sums/means/mins/maxs/anys/alls vs Python ground truth on random
    arrays incl. empties, all-null, and mixed-null shapes."""
    rng = random.Random(7)
    vals = []
    for _ in range(150):
        n = rng.randint(0, 6)
        arr = [rng.choice([None, rng.randint(-50, 50)]) for _ in range(n)]
        vals.append(arr)
    vals += [[], [None], [None, None], None, [0], [-1, 1]]
    t = con.memtable({"i": list(range(len(vals))), "a": vals})
    out = t.select(
        "i",
        s=t.a.sums(),
        m=t.a.means(),
        lo=t.a.mins(),
        hi=t.a.maxs(),
        an=t.a.map(lambda x: x > 0).anys(),
        al=t.a.map(lambda x: x > 0).alls(),
    ).df.collect()
    by_i = {r.i: r for r in out}
    for i, arr in enumerate(vals):
        r = by_i[i]
        nn = [x for x in (arr or []) if x is not None]
        if not nn:
            assert r.s is None and r.m is None and r.lo is None and r.hi is None
            assert r.an is None and r.al is None
        else:
            assert r.s == sum(nn), (arr, r.s)
            assert abs(r.m - sum(nn) / len(nn)) < 1e-9
            assert r.lo == min(nn) and r.hi == max(nn)
            assert r.an == any(x > 0 for x in nn)
            assert r.al == all(x > 0 for x in nn)


def test_interval_view_semantics(con):
    """Interval unit views vs integer arithmetic ground truth over random
    positive second counts (truncating conversion)."""
    rng = random.Random(11)
    secs = [rng.randint(0, 10**7) for _ in range(40)]
    t = con.memtable({"i": list(range(len(secs))), "n": secs})
    iv = t.n.as_interval("s")
    out = t.select(
        "i", d=iv.days, h=iv.hours, m=iv.minutes, s=iv.seconds, ms=iv.milliseconds
    ).df.collect()
    by_i = {r.i: r for r in out}
    for i, n in enumerate(secs):
        r = by_i[i]
        assert (r.d, r.h, r.m, r.s, r.ms) == (
            n // 86400,
            n // 3600,
            n // 60,
            n,
            n * 1000,
        ), (n, r)


def test_histogram_semantics(con):
    """histogram(nbins) vs the reference formula computed in Python."""
    rng = random.Random(13)
    vals = [rng.uniform(-100, 100) for _ in range(300)]
    eps = 1e-13
    t = con.memtable({"i": list(range(len(vals))), "v": vals})
    for nbins in (1, 4, 9):
        out = t.select("i", h=t.v.histogram(nbins=nbins)).df.collect()
        base = min(vals) - eps
        bw = (max(vals) - base) / nbins
        by_i = {r.i: r for r in out}
        for i, v in enumerate(vals):
            expect = min(max(math.floor((v - base) / bw), -1), nbins - 1)
            assert by_i[i].h == expect, (v, nbins, by_i[i].h, expect)
