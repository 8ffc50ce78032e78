"""Float cross-checks for the round-13 nonparametric statistics'
integer algebra (the tost1 convention): the engine-side formulas are
exact integer/DECIMAL rearrangements of textbook float definitions —
these tests verify the REARRANGEMENT on thousands of random small
cases, pure Python, no Spark. Parity tests prove Spark == DuckDB;
these prove both == the statistic they claim to be (to the micro
quantum the integral divisions introduce)."""

from __future__ import annotations

import math
import random

MICRO = 1_000_000


# -- cochq1 ----------------------------------------------------------------


def _cochran_q_float(rows: list[tuple[int, int, int]]) -> float | None:
    """Textbook Cochran's Q, k=3: Q = k(k-1) sum_j (C_j - T/k)^2
    / (k*T - sum_i R_i^2)."""
    k = 3
    cj = [sum(r[j] for r in rows) for j in range(k)]
    t = sum(cj)
    sr2 = sum(sum(r) ** 2 for r in rows)
    den = k * t - sr2
    if den == 0:
        return None
    return k * (k - 1) * sum((c - t / k) ** 2 for c in cj) / den


def _cochran_q_engine(rows: list[tuple[int, int, int]]) -> int | None:
    """The shipped integer form: micro floor of
    2*(3*(nfa^2+nfb^2+nfc^2) - S1^2) / (3*S1 - S2)."""
    nfa = sum(r[0] for r in rows)
    nfb = sum(r[1] for r in rows)
    nfc = sum(r[2] for r in rows)
    s1 = nfa + nfb + nfc
    s2 = sum(sum(r) ** 2 for r in rows)
    den = 3 * s1 - s2
    if den <= 0:
        return None
    num = 2 * (3 * (nfa * nfa + nfb * nfb + nfc * nfc) - s1 * s1)
    return (MICRO * num) // den


def test_cochran_q_integer_form_matches_float():
    rng = random.Random(1313)
    checked = 0
    for _ in range(3000):
        n = rng.randint(1, 40)
        rows = [
            (rng.randint(0, 1), rng.randint(0, 1), rng.randint(0, 1))
            for _ in range(n)
        ]
        f = _cochran_q_float(rows)
        e = _cochran_q_engine(rows)
        if f is None:
            assert e is None
            continue
        checked += 1
        assert e is not None
        assert abs(e - MICRO * f) <= 1.001, (rows, f, e)
    assert checked > 2000


# -- kruskal1 --------------------------------------------------------------


def _kw_float(samples: dict[str, list[int]]) -> float | None:
    """Textbook tie-corrected Kruskal-Wallis H with midranks."""
    allv = sorted(v for vs in samples.values() for v in vs)
    n = len(allv)
    if n < 2:
        return None
    # midrank per value
    rank: dict[int, float] = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        rank[allv[i]] = (i + 1 + j) / 2
        i = j
    h = 0.0
    for vs in samples.values():
        if not vs:
            continue
        rsum = sum(rank[v] for v in vs)
        h += rsum * rsum / len(vs)
    h = 12 / (n * (n + 1)) * h - 3 * (n + 1)
    ties = 0
    from collections import Counter

    for c in Counter(allv).values():
        ties += c * c * c - c
    denom = 1 - ties / (n * n * n - n)
    if denom == 0:
        return None
    return h / denom


def _kw_engine(samples: dict[str, list[int]]) -> int | None:
    """The shipped doubled-rank spine form: per-group integral micro
    terms, then the tie-correction integral division."""
    from collections import Counter

    allc = Counter(v for vs in samples.values() for v in vs)
    n = sum(allc.values())
    if n < 1:
        return None
    svals = sorted(allc)
    less: dict[int, int] = {}
    acc = 0
    for v in svals:
        less[v] = acc
        acc += allc[v]
    hu = 0
    for vs in samples.values():
        if not vs:
            continue
        ng = len(vs)
        q2 = sum(2 * less[v] + allc[v] + 1 for v in vs)
        d = q2 - ng * (n + 1)
        hu += (3 * MICRO * d * d) // (ng * n * (n + 1))
    tie = sum(c * c * c - c for c in allc.values())
    den = n * n * n - n - tie
    if den <= 0:
        return None
    return (hu * (n * n * n - n)) // den


def test_kruskal_wallis_spine_form_matches_float():
    rng = random.Random(2613)
    checked = 0
    for _ in range(2000):
        k = rng.randint(1, 4)
        samples = {
            f"g{g}": [rng.randint(0, 12) for _ in range(rng.randint(0, 25))]
            for g in range(k)
        }
        samples = {g: vs for g, vs in samples.items() if vs}
        if not samples:
            continue
        f = _kw_float(samples)
        e = _kw_engine(samples)
        if f is None:
            assert e is None or e == 0, (samples, e)
            continue
        checked += 1
        assert e is not None
        # per-group floors lose < 1 micro each, then the tie
        # correction multiplies the accumulated error by
        # (N^3-N)/((N^3-N)-T) >= 1; the final division floors one more
        from collections import Counter

        nn = sum(len(v) for v in samples.values())
        t = sum(
            c**3 - c
            for c in Counter(
                v for vs in samples.values() for v in vs
            ).values()
        )
        corr = (nn**3 - nn) / (nn**3 - nn - t)
        tol = len(samples) * corr + 2
        assert abs(e - MICRO * f) <= tol, (samples, f, e, tol)
    assert checked > 1200


# -- runs1 -----------------------------------------------------------------


def _runs_float(signs: list[int]) -> float | None:
    n = len(signs)
    n1 = sum(1 for s in signs if s > 0)
    n2 = n - n1
    if n1 == 0 or n2 == 0 or 2 * n1 * n2 <= n:
        return None
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    e = 1 + 2 * n1 * n2 / n
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    return (r - e) ** 2 / var


def _runs_engine(signs: list[int]) -> int | None:
    n = len(signs)
    n1 = sum(1 for s in signs if s > 0)
    n2 = n - n1
    if n1 == 0 or n2 == 0 or 2 * n1 * n2 <= n:
        return None
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    m = n * (r - 1) - 2 * n1 * n2
    var = 2 * n1 * n2 * (2 * n1 * n2 - n)
    return (MICRO * m * m * (n - 1)) // var


def test_runs_test_cleared_form_matches_float():
    rng = random.Random(4013)
    checked = 0
    for _ in range(3000):
        n = rng.randint(2, 40)
        signs = [rng.choice((1, -1)) for _ in range(n)]
        f = _runs_float(signs)
        e = _runs_engine(signs)
        if f is None:
            assert e is None
            continue
        checked += 1
        assert abs(e - MICRO * f) <= 1.001, (signs, f, e)
    assert checked > 2000


# -- cliffs1 ---------------------------------------------------------------


def test_cliffs_delta_spine_counts_match_bruteforce():
    rng = random.Random(777)
    for _ in range(600):
        xs = [rng.randint(0, 8) for _ in range(rng.randint(1, 20))]
        ys = [rng.randint(0, 8) for _ in range(rng.randint(1, 20))]
        gt = sum(1 for x in xs for y in ys if x > y)
        lt = sum(1 for x in xs for y in ys if x < y)
        ties = sum(1 for x in xs for y in ys if x == y)
        # spine form: group to per-value counts, strictly-less cumsum
        from collections import Counter

        cx, cy = Counter(xs), Counter(ys)
        vals = sorted(set(cx) | set(cy))
        acc = 0
        sgt = slt = sties = 0
        nb = len(ys)
        for v in vals:
            sgt += cx[v] * acc
            sties += cx[v] * cy[v]
            slt += cx[v] * (nb - acc - cy[v])
            acc += cy[v]
        assert (sgt, slt, sties) == (gt, lt, ties)
        delta_micro = (MICRO * (gt - lt) + 10**12 * len(xs) * nb) // (
            len(xs) * nb
        ) - 10**12
        f = (gt - lt) / (len(xs) * nb)
        assert abs(delta_micro - MICRO * f) <= 1.001


# -- dw1 -------------------------------------------------------------------


def test_durbin_watson_integral_form_matches_float():
    rng = random.Random(31)
    for _ in range(1500):
        n = rng.randint(2, 35)
        e = [rng.randint(-500, 500) for _ in range(n)]
        see = sum(v * v for v in e)
        if see == 0:
            continue
        sdd = sum((a - b) ** 2 for a, b in zip(e[1:], e))
        sxp = sum(a * b for a, b in zip(e[1:], e))
        dw_micro = (MICRO * sdd) // see
        rho_micro = (MICRO * sxp + 2 * MICRO * see) // see - 2 * MICRO
        assert abs(dw_micro - MICRO * sdd / see) <= 1.001
        assert abs(rho_micro - MICRO * sxp / see) <= 1.001
        # Cauchy-Schwarz bound the 2e6 shift relies on
        assert abs(sxp) <= see
        assert (sdd < 2 * see) == (dw_micro < 2 * MICRO or sdd / see < 2)


# -- dm1 -------------------------------------------------------------------


def test_diebold_mariano_cleared_form_matches_float():
    rng = random.Random(95)
    checked = 0
    for _ in range(2000):
        n = rng.randint(2, 35)
        d = [rng.randint(-400, 400) for _ in range(n)]
        sd, sd2 = sum(d), sum(v * v for v in d)
        den = n * sd2 - sd * sd
        if den <= 0:
            continue
        checked += 1
        e = (MICRO * (n - 1) * sd * sd) // den
        # float: t^2 = n * dbar^2 / s^2, s^2 = (sd2 - n dbar^2)/(n-1)
        dbar = sd / n
        s2 = (sd2 - n * dbar * dbar) / (n - 1)
        f = n * dbar * dbar / s2
        assert abs(e - MICRO * f) <= 2, (d, f, e)
    assert checked > 1500


# -- cmh1 ------------------------------------------------------------------


def test_cmh_quantized_form_matches_float():
    rng = random.Random(1959)
    checked = 0
    for _ in range(1500):
        n_strata = rng.randint(1, 8)
        strata = []
        for _ in range(n_strata):
            n = rng.randint(1, 30)
            rows = [
                (rng.randint(0, 1), rng.randint(0, 1)) for _ in range(n)
            ]
            r1 = sum(t for t, _ in rows)
            c1 = sum(p for _, p in rows)
            a = sum(t * p for t, p in rows)
            strata.append((n, r1, c1, a))
        s_mic = sum(
            MICRO * a - (MICRO * r1 * c1) // n for n, r1, c1, a in strata
        )
        v_mic = sum(
            (MICRO * r1 * (n - r1) * c1 * (n - c1)) // (n * n * (n - 1))
            for n, r1, c1, a in strata
            if n >= 2
        )
        if v_mic <= 0:
            continue
        checked += 1
        m = max(abs(s_mic) - 500_000, 0)
        e = (m * m) // v_mic
        # float CMH with the same continuity correction
        s_f = sum(a - r1 * c1 / n for n, r1, c1, a in strata)
        v_f = sum(
            r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1))
            for n, r1, c1, a in strata
            if n >= 2
        )
        f = max(abs(s_f) - 0.5, 0) ** 2 / v_f
        # per-stratum micro floors shift S and V each by < n_strata
        # micro; the squared/q ratio inherits a small relative error
        tol = max(4.0, 4e-5 * MICRO * f + n_strata * 3)
        assert abs(e - MICRO * f) <= tol, (strata, f, e)
    assert checked > 1000


# -- sen1 ------------------------------------------------------------------


def test_theil_sen_spine_selection_matches_bruteforce():
    rng = random.Random(1950)
    for _ in range(800):
        days = sorted(
            rng.sample(range(0, 40), rng.randint(2, 12))
        )
        y = {d: rng.randint(0, 50) for d in days}
        pairs = [
            (y[b] - y[a], b - a)
            for i, a in enumerate(days)
            for b in days[i + 1 :]
        ]
        m = len(pairs)
        ordered = sorted(pairs, key=lambda p: (p[0] / p[1], p[0], p[1]))
        dy, dx = ordered[(m + 1) // 2 - 1]
        slope_micro = (MICRO * dy + 10**12 * dx) // dx - 10**12
        # the selected slope is the lower median of the float slopes
        slopes = sorted(p[0] / p[1] for p in pairs)
        f = slopes[(m + 1) // 2 - 1]
        assert abs(slope_micro - MICRO * f) <= 1.001, (pairs, f, slope_micro)


# -- lb1 -------------------------------------------------------------------


def test_ljung_box_quantized_form_matches_float():
    rng = random.Random(1978)
    checked = 0
    for _ in range(1200):
        n = rng.randint(3, 35)
        e = [rng.randint(-300, 300) for _ in range(n)]
        s = sum(e)
        den = sum((n * v - s) ** 2 for v in e)
        if den == 0:
            continue
        max_lag = min(7, n - 1)
        q_eng = 0
        q_f = 0.0
        ok = True
        for k in range(1, max_lag + 1):
            num = sum(
                (n * e[t] - s) * (n * e[t - k] - s) for t in range(k, n)
            )
            assert abs(num) <= den  # the Cauchy-Schwarz shift bound
            r_mic = (MICRO * num + 2 * MICRO * den) // den - 2 * MICRO
            q_eng += (n * (n + 2) * r_mic * r_mic) // ((n - k) * MICRO)
            r_f = num / den
            q_f += n * (n + 2) * r_f * r_f / (n - k)
        if not ok:
            continue
        checked += 1
        # flooring r_k costs <= 1 micro, so r^2 is off by <= 2e6+1
        # micro^2; each term division floors one micro more:
        # tol = sum_k [n(n+2)(2e6+1)/((n-k)1e6) + 1] + 1
        tol = (
            sum(
                n * (n + 2) * (2 * MICRO + 1) / ((n - k) * MICRO)
                for k in range(1, max_lag + 1)
            )
            + max_lag
            + 1
        )
        assert abs(q_eng - MICRO * q_f) <= tol, (e, q_f, q_eng, tol)
    assert checked > 900


# -- pettitt1 --------------------------------------------------------------


def test_pettitt_recursion_matches_bruteforce():
    rng = random.Random(1979)
    for _ in range(800):
        nd = rng.randint(2, 20)
        y = [rng.randint(0, 10) for _ in range(nd)]

        def sgn(a, b):
            return 1 if a > b else (-1 if a < b else 0)

        # brute force U_t over split points t = 0..nd-2
        us = []
        for t in range(nd - 1):
            us.append(
                sum(
                    sgn(y[i], y[j])
                    for i in range(t + 1)
                    for j in range(t + 1, nd)
                )
            )
        k_bf = max(abs(u) for u in us)
        arg_bf = min(t for t, u in enumerate(us) if abs(u) == k_bf)
        # the engine recursion: V_t = sum_{j != t} sgn(y_t - y_j),
        # U_t = running sum of V
        v = [
            sum(sgn(y[t], y[j]) for j in range(nd) if j != t)
            for t in range(nd)
        ]
        acc = 0
        us2 = []
        for t in range(nd - 1):
            acc += v[t]
            us2.append(acc)
        assert us2 == us, (y, us, us2)
        # the frozen-literal gate vs the float p-value at alpha=0.05
        lam = 6 * k_bf * k_bf / (nd**3 + nd**2)
        p = 2 * math.exp(-lam)
        gate = 6 * MICRO * k_bf * k_bf > 3_688_879 * (nd**3 + nd**2)
        if abs(p - 0.05) > 1e-9:
            assert gate == (p < 0.05), (y, p, gate)


# -- mhor1 -----------------------------------------------------------------


def test_mh_common_or_quantized_matches_float():
    rng = random.Random(1959 * 2)
    checked = 0
    for _ in range(1500):
        strata = []
        for _ in range(rng.randint(1, 8)):
            n = rng.randint(1, 40)
            cells = [rng.randint(0, 1) for _ in range(2)]
            a = rng.randint(0, n)
            rem = n - a
            b = rng.randint(0, rem)
            rem -= b
            c = rng.randint(0, rem)
            d = rem - c
            strata.append((n, a, b, c, d))
        r_mic = sum((MICRO * a * d) // n for n, a, b, c, d in strata)
        s_mic = sum((MICRO * b * c) // n for n, a, b, c, d in strata)
        if s_mic <= 0:
            continue
        checked += 1
        e = (MICRO * r_mic) // s_mic
        r_f = sum(a * d / n for n, a, b, c, d in strata)
        s_f = sum(b * c / n for n, a, b, c, d in strata)
        f = r_f / s_f
        # per-stratum floors shift r and s each by < #strata micro
        rel = len(strata) / max(s_f * MICRO, 1)
        tol = MICRO * f * (rel + len(strata) / max(r_f * MICRO, 1)) + 2
        assert abs(e - MICRO * f) <= max(tol, 2), (strata, f, e)
    assert checked > 1000


# -- eo1 -------------------------------------------------------------------


def test_two_proportion_z2_cleared_form_matches_float():
    rng = random.Random(2016)
    checked = 0
    for _ in range(3000):
        m1, m2 = rng.randint(1, 50), rng.randint(1, 50)
        x1, x2 = rng.randint(0, m1), rng.randint(0, m2)
        if x1 + x2 == 0 or x1 + x2 == m1 + m2:
            continue
        checked += 1
        num = (x1 * m2 - x2 * m1) ** 2 * (m1 + m2)
        den = m1 * m2 * (x1 + x2) * (m1 + m2 - x1 - x2)
        p1, p2 = x1 / m1, x2 / m2
        pp = (x1 + x2) / (m1 + m2)
        z2 = (p1 - p2) ** 2 / (pp * (1 - pp) * (1 / m1 + 1 / m2))
        assert abs(num / den - z2) <= 1e-9 * max(1.0, z2), (
            (m1, x1, m2, x2),
            num / den,
            z2,
        )
    assert checked > 2500


# -- di1 -------------------------------------------------------------------


def test_four_fifths_cross_multiplication():
    rng = random.Random(1978 * 2)
    for _ in range(3000):
        n1, n2 = rng.randint(1, 60), rng.randint(1, 60)
        k1, k2 = rng.randint(0, n1), rng.randint(1, n2)  # ref selects >0
        if 5 * k1 * n2 == 4 * k2 * n1:
            continue  # exact 0.8 boundary: float division may land on
            # either side, the integer compare is the ground truth
        assert (5 * k1 * n2 < 4 * k2 * n1) == ((k1 / n1) / (k2 / n2) < 0.8)
