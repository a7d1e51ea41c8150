"""Property tests for the round-4m staged operators (rank/agreement
statistics, privacy t-closeness, lexical-diversity estimators,
readability): each formula's exact-integer formulation — the one both
engines execute — checked against the textbook O(n^2)/float definition
on random inputs (the repo's hypothesis discipline, SURVEY §5)."""

from __future__ import annotations

import math
import random
import re
from collections import Counter


# ---------------------------------------------------------------------------
# Kendall tau-b: the cell-aggregated BIGINT formulation equals the
# O(n^2) pairwise definition.
# ---------------------------------------------------------------------------


def _tau_b_cells(xy):
    cells = Counter(xy)
    n = len(xy)
    n0 = n * (n - 1) // 2
    xm, ym = Counter(), Counter()
    for (x, y), c in cells.items():
        xm[x] += c
        ym[y] += c
    n1 = sum(v * (v - 1) // 2 for v in xm.values())
    n2 = sum(v * (v - 1) // 2 for v in ym.values())
    nc = nd = 0
    items = list(cells.items())
    for i, ((xa, ya), ca) in enumerate(items):
        for (xb, yb), cb in items:
            if xa < xb and ya != yb:
                if yb > ya:
                    nc += ca * cb
                else:
                    nd += ca * cb
    denom = (n0 - n1) * (n0 - n2)
    return (nc - nd) / math.sqrt(denom) if denom > 0 else 0.0


def _tau_b_pairs(xy):
    nc = nd = tx = ty = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            (xa, ya), (xb, yb) = xy[i], xy[j]
            if xa == xb and ya == yb:
                tx += 1
                ty += 1
            elif xa == xb:
                tx += 1
            elif ya == yb:
                ty += 1
            elif (xb - xa) * (yb - ya) > 0:
                nc += 1
            else:
                nd += 1
    n = len(xy)
    n0 = n * (n - 1) // 2
    denom = (n0 - tx) * (n0 - ty)
    return (nc - nd) / math.sqrt(denom) if denom > 0 else 0.0


def test_tau_b_cell_form_matches_pairwise():
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randint(2, 40)
        xy = [(rng.randint(0, 4), rng.randint(0, 4)) for _ in range(n)]
        assert abs(_tau_b_cells(xy) - _tau_b_pairs(xy)) < 1e-12


# ---------------------------------------------------------------------------
# Kruskal-Wallis: doubled-midrank histogram form equals the textbook
# rank-based H (with tie correction).
# ---------------------------------------------------------------------------


def _kw_hist(groups):
    spine = Counter()
    for g in groups:
        spine.update(g)
    vals = sorted(spine)
    cum, c_prior = {}, 0
    for v in vals:
        cum[v] = c_prior
        c_prior += spine[v]
    n = sum(len(g) for g in groups)
    sq = 0
    for g in groups:
        cnt = Counter(g)
        r2 = sum(c * (2 * cum[v] + spine[v] + 1) for v, c in cnt.items())
        sq += math.floor(float(r2) * r2 / len(g) * 1000)
    h = 3.0 * sq / 1000 / (n * (n + 1)) - 3.0 * (n + 1)
    tsum = sum(t ** 3 - t for t in spine.values())
    return h / (1.0 - tsum / (n ** 3 - n)) if tsum < n ** 3 - n else None


def _kw_textbook(groups):
    allv = sorted(v for g in groups for v in g)
    n = len(allv)
    # midranks
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        for k in range(i, j):
            rank[allv[i]] = (i + j + 1) / 2.0
        i = j
    h = 12.0 / (n * (n + 1)) * sum(
        len(g) * (sum(rank[v] for v in g) / len(g)) ** 2 for g in groups
    ) - 3 * (n + 1)
    ties = Counter(allv)
    tsum = sum(t ** 3 - t for t in ties.values())
    corr = 1.0 - tsum / (n ** 3 - n)
    return h / corr if corr > 0 else None


def test_kruskal_wallis_hist_form_matches_textbook():
    rng = random.Random(13)
    for _ in range(50):
        groups = [
            [rng.randint(0, 8) for _ in range(rng.randint(2, 25))]
            for _ in range(rng.randint(2, 5))
        ]
        a, b = _kw_hist(groups), _kw_textbook(groups)
        if a is None or b is None:
            assert a == b
        else:
            # the 1e-3 quantization bounds the gap by k/(1000*N(N+1))*3
            assert abs(a - b) < 1e-3


# ---------------------------------------------------------------------------
# Brown-Forsythe: histogram med2 median + quantized W vs direct floats.
# ---------------------------------------------------------------------------


def _bf_hist(groups):
    devs = []
    for g in groups:
        s = sorted(g)
        n = len(g)
        med2 = s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]
        z2 = [abs(2 * v - med2) for v in g]
        devs.append((sum(z2), sum(z * z for z in z2), n))
    k = len(devs)
    nt = sum(d[2] for d in devs)
    t = sum(d[0] for d in devs)
    bt = sum(d[1] for d in devs)
    q1 = sum(math.floor(float(a) * a / n * 100) for a, _, n in devs)
    ssw = bt * 100 - q1
    ssb = q1 - math.floor(float(t) * t / nt * 100)
    if ssw <= 0 or k < 2:
        return None
    return (nt - k) / (k - 1) * ssb / ssw


def _bf_direct(groups):
    import statistics

    zs = [
        [abs(v - statistics.median(g)) for v in g]
        for g in groups
    ]
    k = len(zs)
    nt = sum(len(z) for z in zs)
    zbar = sum(sum(z) for z in zs) / nt
    ssb = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zs)
    ssw = sum(sum((v - sum(z) / len(z)) ** 2 for v in z) for z in zs)
    if ssw == 0 or k < 2:
        return None
    return (nt - k) / (k - 1) * ssb / ssw


def test_brown_forsythe_hist_form_matches_direct():
    rng = random.Random(29)
    for _ in range(50):
        groups = [
            [rng.randint(0, 40) for _ in range(rng.randint(3, 30))]
            for _ in range(rng.randint(2, 5))
        ]
        a, b = _bf_hist(groups), _bf_direct(groups)
        if a is None or b is None:
            assert a == b
        else:
            assert abs(a - b) < 0.05 + abs(b) * 1e-2


# ---------------------------------------------------------------------------
# t-closeness: BIGINT cumulative-gap EMD equals the float p/q definition.
# ---------------------------------------------------------------------------


def test_tcloseness_integer_emd_matches_float_definition():
    rng = random.Random(41)
    m = 10
    for _ in range(100):
        glob = [rng.randint(1, 20) for _ in range(m)]
        cls = [rng.randint(0, 5) for _ in range(m)]
        if sum(cls) == 0:
            cls[0] = 1
        n, nc = sum(glob), sum(cls)
        # integer form (what both engines run)
        num = 0
        cc = cg = 0
        for b in range(m):
            cc += cls[b]
            cg += glob[b]
            num += abs(cc * n - cg * nc)
        emd_int = num / ((m - 1) * nc * n)
        # float textbook form: mean |cumulative p - cumulative q|
        p = [c / nc for c in cls]
        q = [g / n for g in glob]
        acc = d = 0.0
        for b in range(m):
            d += p[b] - q[b]
            acc += abs(d)
        emd_float = acc / (m - 1)
        assert abs(emd_int - emd_float) < 1e-9


# ---------------------------------------------------------------------------
# Jackknife: integer-mean deviation identity sum((x-m)^2) = ssq - 2*m*s1
# + g*m^2, and the quantized SE is within quantization error of direct.
# ---------------------------------------------------------------------------


def test_jackknife_quantized_identity_and_error_bound():
    rng = random.Random(53)
    for _ in range(100):
        g = rng.randint(2, 20)
        thetas = [rng.uniform(50, 150) for _ in range(g)]
        th_q = [math.floor(t * 10**6) for t in thetas]
        s1, ssq = sum(th_q), sum(t * t for t in th_q)
        m = s1 // g
        s2 = ssq - 2 * m * s1 + g * m * m
        assert s2 == sum((t - m) ** 2 for t in th_q)
        se_q = math.sqrt((g - 1) / g * s2) / 10**6
        tb = sum(thetas) / g
        se = math.sqrt((g - 1) / g * sum((t - tb) ** 2 for t in thetas))
        assert abs(se_q - se) < 1e-4 * g


# ---------------------------------------------------------------------------
# Cohen's kappa: integer confusion-matrix form vs float definition.
# ---------------------------------------------------------------------------


def test_cohens_kappa_integer_form_matches_definition():
    rng = random.Random(61)
    labels = "abcd"
    for _ in range(100):
        n = rng.randint(2, 60)
        pairs = [(rng.choice(labels), rng.choice(labels)) for _ in range(n)]
        agree = sum(a == b for a, b in pairs)
        rows = Counter(a for a, _ in pairs)
        cols = Counter(b for _, b in pairs)
        pe_num = sum(rows[x] * cols[x] for x in set(rows) | set(cols))
        if n * n == pe_num:
            continue
        kappa_int = (n * agree - pe_num) / (n * n - pe_num)
        po = agree / n
        pe = pe_num / (n * n)
        kappa_float = (po - pe) / (1 - pe)
        assert abs(kappa_int - kappa_float) < 1e-12


# ---------------------------------------------------------------------------
# Simpson's D off the frequency spectrum equals the sampling definition:
# probability two draws WITHOUT replacement are the same type.
# ---------------------------------------------------------------------------


def test_simpson_d_matches_sampling_definition():
    rng = random.Random(71)
    for _ in range(50):
        toks = [rng.choice("abcdef") for _ in range(rng.randint(2, 30))]
        c = Counter(toks)
        n, s2 = len(toks), sum(v * v for v in c.values())
        d_spec = (s2 - n) / (n * (n - 1))
        same = sum(
            toks[i] == toks[j]
            for i in range(n) for j in range(n) if i != j
        )
        assert abs(d_spec - same / (n * (n - 1))) < 1e-12


# ---------------------------------------------------------------------------
# Chao1 / coverage sanity: estimator >= observed richness; coverage in
# [0, 1]; no-hapax sample estimates zero unseen mass.
# ---------------------------------------------------------------------------


def test_chao1_bounds():
    rng = random.Random(83)
    for _ in range(100):
        c = Counter(
            rng.choice("abcdefghij")
            for _ in range(rng.randint(1, 50))
        )
        v = len(c)
        n = sum(c.values())
        f1 = sum(1 for x in c.values() if x == 1)
        f2 = sum(1 for x in c.values() if x == 2)
        chao1 = v + f1 * (f1 - 1) / (2 * (f2 + 1))
        cov = 1 - f1 / n
        assert chao1 >= v
        assert 0.0 <= cov <= 1.0
        if f1 == 0:
            assert chao1 == v and cov == 1.0


# ---------------------------------------------------------------------------
# Flesch run counting: collapse-then-strip regex form equals a direct
# run scan, and the original-marker-chars-can't-survive claim holds.
# ---------------------------------------------------------------------------


def _runs_regex(s, cls, marker):
    collapsed = re.sub(cls, marker, s)
    return len(re.sub(f"[^{re.escape(marker)}]", "", collapsed))


def _runs_scan(s, charset):
    runs, inside = 0, False
    for ch in s:
        if ch in charset:
            if not inside:
                runs += 1
            inside = True
        else:
            inside = False
    return runs


def test_run_counting_regex_equals_scan():
    rng = random.Random(97)
    for _ in range(300):
        s = "".join(
            rng.choice("aeiouy bcd.!?xz")
            for _ in range(rng.randint(0, 40))
        )
        assert _runs_regex(s, "[aeiouy]+", "a") == _runs_scan(s, "aeiouy")
        assert _runs_regex(s, "[.!?]+", ".") == _runs_scan(s, ".!?")


# ---------------------------------------------------------------------------
# ROUGE-2 F1: the single-division form 2*clip/(la+lb) equals the
# harmonic mean of precision and recall.
# ---------------------------------------------------------------------------


def test_rouge_f1_single_division_equals_harmonic_mean():
    rng = random.Random(101)
    for _ in range(200):
        la, lb = rng.randint(1, 50), rng.randint(1, 50)
        clip = rng.randint(0, min(la, lb))
        if clip == 0:
            continue
        p, r = clip / lb, clip / la
        f1 = 2 * p * r / (p + r)
        assert abs(2 * clip / (la + lb) - f1) < 1e-12


# ---------------------------------------------------------------------------
# Modularity: the per-community in/deg formulation matches the textbook
# edge-pair definition Q = (1/2m) sum_ij (A_ij - k_i k_j / 2m) δ(c_i,c_j),
# and singleton-partition modularity of a graph is <= 0.
# ---------------------------------------------------------------------------


def _mod_counts(und, labels):
    m2 = len(und)
    deg = Counter(s for s, _ in und)
    comm = {}
    for n, l in labels.items():
        comm.setdefault(l, []).append(n)
    q = 0.0
    for nodes in comm.values():
        ns = set(nodes)
        in2 = sum(1 for s, d in und if s in ns and d in ns)
        dc = sum(deg.get(n, 0) for n in nodes)
        q += in2 / m2 - (dc / m2) ** 2
    return q


def _mod_textbook(und, labels):
    m2 = len(und)
    deg = Counter(s for s, _ in und)
    a = set(und)
    nodes = list(labels)
    q = 0.0
    for i in nodes:
        for j in nodes:
            if labels[i] != labels[j]:
                continue
            aij = 1.0 if (i, j) in a else 0.0
            q += aij - deg.get(i, 0) * deg.get(j, 0) / m2
    return q / m2


def test_modularity_community_form_matches_textbook():
    rng = random.Random(113)
    for _ in range(30):
        n = rng.randint(3, 10)
        edges = set()
        for _ in range(rng.randint(2, 20)):
            a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if not edges:
            continue
        und = list(edges) + [(b, a) for a, b in edges]
        present = sorted({x for e in und for x in e})
        labels = {x: rng.randint(0, 2) for x in present}
        assert abs(_mod_counts(und, labels)
                   - _mod_textbook(und, labels)) < 1e-9
        singletons = {x: x for x in present}
        assert _mod_counts(und, singletons) <= 1e-12


# ---------------------------------------------------------------------------
# Wilson interval: contains p_hat, stays in [0,1], behaves at k=0 / k=n
# (nonzero width, unlike Wald), and narrows with n.
# ---------------------------------------------------------------------------


def _wilson(k, n, z=1.96, z2=3.8416):
    p = k / n
    center = p + z2 / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    denom = 1 + z2 / n
    # the engines clamp after rounding (z2 literal != z*z in binary can
    # push k=0's lower bound to -3e-18); mirror that here
    return (max(0.0, (center - half) / denom),
            min(1.0, (center + half) / denom))


def test_wilson_interval_properties():
    rng = random.Random(127)
    for _ in range(300):
        n = rng.randint(1, 500)
        k = rng.randint(0, n)
        lo, hi = _wilson(k, n)
        assert 0.0 <= lo <= hi <= 1.0
        assert lo - 1e-12 <= k / n <= hi + 1e-12
    lo0, hi0 = _wilson(0, 10)
    assert lo0 == 0.0 and hi0 > 0.0
    lon, hin = _wilson(10, 10)
    assert hin == 1.0 and lon < 1.0
    w_small = _wilson(5, 10)
    w_big = _wilson(500, 1000)
    assert (w_big[1] - w_big[0]) < (w_small[1] - w_small[0])


# ---------------------------------------------------------------------------
# Theil-T: 0 for perfectly equal counts, ln(n) when one doc holds all,
# scale-invariant, and matches the direct definition.
# ---------------------------------------------------------------------------


def _theil(xs):
    xt, n = sum(xs), len(xs)
    return sum(x / xt * math.log(x * n / xt) for x in xs if x > 0)


def test_theil_bounds_and_invariance():
    rng = random.Random(131)
    assert abs(_theil([7] * 12)) < 1e-12
    n = 9
    assert abs(_theil([100] + [0] * (n - 1)) - math.log(n)) < 1e-12
    for _ in range(100):
        xs = [rng.randint(0, 50) for _ in range(rng.randint(2, 20))]
        if sum(xs) == 0:
            continue
        t = _theil(xs)
        assert -1e-12 <= t <= math.log(len(xs)) + 1e-12
        assert abs(_theil([3 * x for x in xs]) - t) < 1e-9


# ---------------------------------------------------------------------------
# Binary segmentation: the sl^2/nl + sr^2/nr gain form equals the SSE
# reduction SSE_total - (SSE_left + SSE_right) for every split (the
# sum-of-squares term cancels), so maximizing one maximizes the other.
# ---------------------------------------------------------------------------


def test_binseg_gain_equals_sse_reduction():
    rng = random.Random(139)

    def sse(ys):
        mu = sum(ys) / len(ys)
        return sum((y - mu) ** 2 for y in ys)

    for _ in range(100):
        ys = [rng.randint(0, 30) for _ in range(rng.randint(3, 25))]
        n, s = len(ys), sum(ys)
        for i in range(1, n):
            sl = sum(ys[:i])
            gain = sl * sl / i + (s - sl) ** 2 / (n - i) - s * s / n
            red = sse(ys) - (sse(ys[:i]) + sse(ys[i:]))
            assert abs(gain - red) < 1e-9


# ---------------------------------------------------------------------------
# Runs test: the lag-based run count equals a direct scan, and the
# (mu-1)(mu-2)/(n-1) variance identity equals the textbook form.
# ---------------------------------------------------------------------------


def test_runs_count_and_variance_identity():
    rng = random.Random(149)
    for _ in range(200):
        signs = [rng.choice([1, -1]) for _ in range(rng.randint(2, 40))]
        lag_runs = sum(
            1 for i, s in enumerate(signs)
            if i == 0 or s != signs[i - 1]
        )
        direct = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b)
        assert lag_runs == direct
        a = signs.count(1)
        b = signs.count(-1)
        n = a + b
        if a == 0 or b == 0 or n < 2:
            continue
        mu = 2 * a * b / n + 1
        var_id = (mu - 1) * (mu - 2) / (n - 1)
        var_tb = 2 * a * b * (2 * a * b - n) / (n * n * (n - 1))
        assert abs(var_id - var_tb) < 1e-9


# ---------------------------------------------------------------------------
# Span corruption: first-of-run span count equals a direct run scan on
# random masks, and merging is the only way n_spans <= n_masked.
# ---------------------------------------------------------------------------


def test_span_count_first_of_run_equals_scan():
    rng = random.Random(151)
    for _ in range(300):
        bits = [rng.random() < 0.3 for _ in range(rng.randint(0, 40))]
        first_of_run = sum(
            1 for p in range(len(bits))
            if bits[p] and (p == 0 or not bits[p - 1])
        )
        runs, inside = 0, False
        for b in bits:
            if b and not inside:
                runs += 1
            inside = b
        assert first_of_run == runs
        assert runs <= sum(bits)


# ---------------------------------------------------------------------------
# Truncation loss: kept tokens monotone nondecreasing in L, loss
# fraction nonincreasing, exact at the extremes.
# ---------------------------------------------------------------------------


def test_truncation_loss_monotone():
    rng = random.Random(157)
    for _ in range(100):
        xs = [rng.randint(0, 2000) for _ in range(rng.randint(1, 50))]
        total = sum(xs)
        prev_kept, prev_loss = -1, 2.0
        for L in (128, 256, 512, 1024):
            kept = sum(min(x, L) for x in xs)
            loss = 1 - kept / total if total else 0.0
            assert kept >= prev_kept
            assert loss <= prev_loss + 1e-12
            prev_kept, prev_loss = kept, loss
        if max(xs) <= 1024:
            assert prev_loss == 0.0


# ---------------------------------------------------------------------------
# Cook's distance: the closed form e^2 h / (p*MSE*(1-h)^2) equals the
# definition sum_j (yhat_j - yhat_j(i))^2 / (p*MSE) under delete-one
# refit, on random regressions.
# ---------------------------------------------------------------------------


def _ols(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n
    return alpha, beta


def test_cooks_distance_closed_form_matches_refit():
    rng = random.Random(163)
    for _ in range(30):
        n = rng.randint(5, 20)
        xs = [rng.randint(1, 100) for _ in range(n)]
        if len(set(xs)) < 2:
            continue
        ys = [2 * x + rng.randint(-20, 20) for x in xs]
        a, b = _ols(xs, ys)
        resid = [y - (a + b * x) for x, y in zip(xs, ys)]
        sse = sum(e * e for e in resid)
        mse = sse / (n - 2)
        if mse == 0:
            continue
        xbar = sum(xs) / n
        sxx_c = sum(x * x for x in xs) - sum(xs) ** 2 / n
        for i in range(n):
            h = 1 / n + (xs[i] - xbar) ** 2 / sxx_c
            closed = resid[i] ** 2 * h / (2 * mse * (1 - h) ** 2)
            xs2 = xs[:i] + xs[i + 1:]
            ys2 = ys[:i] + ys[i + 1:]
            if len(set(xs2)) < 2:
                continue
            a2, b2 = _ols(xs2, ys2)
            num = sum(((a + b * x) - (a2 + b2 * x)) ** 2 for x in xs)
            assert abs(closed - num / (2 * mse)) < 1e-6 * max(1.0, closed)


# ---------------------------------------------------------------------------
# SAX: the quantized-z letter decision equals the float decision away
# from exact breakpoints, and the explicit boundary cases land by floor
# semantics.
# ---------------------------------------------------------------------------


def _sax_float(z):
    if z < -0.6745:
        return "a"
    if z < 0:
        return "b"
    if z < 0.6745:
        return "c"
    return "d"


def _sax_quant(z):
    zq = math.floor(z * 10**6)
    if zq < -674500:
        return "a"
    if zq < 0:
        return "b"
    if zq < 674500:
        return "c"
    return "d"


def test_sax_quantized_letters_match_float():
    rng = random.Random(167)
    for _ in range(2000):
        z = rng.uniform(-3, 3)
        assert _sax_quant(z) == _sax_float(z)
    # boundaries: the strict < puts the breakpoint value itself in the
    # UPPER letter in both forms (floor(-674500.0) = -674500 is not
    # < -674500), so they agree there too
    for z in (-0.6745, 0.0, 0.6745):
        assert _sax_quant(z) == _sax_float(z)
    assert _sax_quant(-0.6745) == "b"
    assert _sax_quant(0.0) == "c"
    assert _sax_quant(0.6745) == "d"


# ---------------------------------------------------------------------------
# Seasonality eta^2: integer-scaled SSB/SST matches float eta^2, flat
# weeks give exactly 0, and the ratio stays in [0, 1].
# ---------------------------------------------------------------------------


def test_seasonality_eta_sq_integer_form():
    rng = random.Random(173)
    sc = 10**6
    for _ in range(100):
        days = [(rng.randint(0, 6), rng.randint(0, 50))
                for _ in range(rng.randint(7, 40))]
        n = len(days)
        s = sum(y for _, y in days)
        ssq = sum(y * y for _, y in days)
        bydow = Counter()
        cnts = Counter()
        for d, y in days:
            bydow[d] += y
            cnts[d] += 1
        ssb_r = sum(bydow[d] ** 2 * sc // cnts[d] for d in bydow)
        corr = s * s * sc // n
        ssb_q, sst_q = ssb_r - corr, ssq * sc - corr
        if sst_q <= 0:
            continue
        eta_int = ssb_q / sst_q
        mu = s / n
        sst = ssq - n * mu * mu
        ssb = sum(cnts[d] * (bydow[d] / cnts[d] - mu) ** 2 for d in bydow)
        assert abs(eta_int - ssb / sst) < 1e-4
        assert -1e-9 <= eta_int <= 1.0 + 1e-9
    flat = [(d % 7, 10) for d in range(14)]
    s = sum(y for _, y in flat)
    ssq = sum(y * y for _, y in flat)
    bydow, cnts = Counter(), Counter()
    for d, y in flat:
        bydow[d] += y
        cnts[d] += 1
    ssb_r = sum(bydow[d] ** 2 * sc // cnts[d] for d in bydow)
    assert ssb_r - s * s * sc // len(flat) == 0


# ---------------------------------------------------------------------------
# MATTR: the summed-window form equals the mean of window TTRs, MATTR of
# a constant-token doc is 1/W, and MATTR <= 1.
# ---------------------------------------------------------------------------


def test_mattr_summed_form_matches_mean_of_windows():
    rng = random.Random(179)
    w = 25
    for _ in range(100):
        n = rng.randint(w, 80)
        toks = [rng.choice("abcdefgh") for _ in range(n)]
        wins = [toks[p:p + w] for p in range(n - w + 1)]
        mean_ttr = sum(len(set(win)) / w for win in wins) / len(wins)
        summed = sum(len(set(win)) for win in wins) / ((n - w + 1) * w)
        assert abs(mean_ttr - summed) < 1e-12
        assert summed <= 1.0 + 1e-12
    const = ["x"] * 40
    wins = [const[p:p + w] for p in range(len(const) - w + 1)]
    assert sum(len(set(win)) for win in wins) / (len(wins) * w) == 1 / w


# ---------------------------------------------------------------------------
# Burstiness: B = (sigma - mu)/(sigma + mu) is -1 for a metronome,
# bounded in (-1, 1), and ~0 for exponential gaps.
# ---------------------------------------------------------------------------


def test_burstiness_bounds_and_signatures():
    rng = random.Random(181)
    gaps = [60] * 50
    mu = sum(gaps) / len(gaps)
    sigma = math.sqrt(sum((g - mu) ** 2 for g in gaps) / len(gaps))
    assert (sigma - mu) / (sigma + mu) == -1.0
    for _ in range(50):
        gs = [rng.randint(1, 1000) for _ in range(rng.randint(5, 200))]
        mu = sum(gs) / len(gs)
        sigma = math.sqrt(sum((g - mu) ** 2 for g in gs) / len(gs))
        b = (sigma - mu) / (sigma + mu)
        assert -1.0 <= b < 1.0
    exp_gaps = [rng.expovariate(1 / 100) for _ in range(20000)]
    mu = sum(exp_gaps) / len(exp_gaps)
    sigma = math.sqrt(sum((g - mu) ** 2 for g in exp_gaps) / len(exp_gaps))
    assert abs((sigma - mu) / (sigma + mu)) < 0.05


# ---------------------------------------------------------------------------
# Isotropy: entropy of the normalized variance distribution is ln(D)
# exactly for equal variances (isotropy 1), lower when concentrated,
# and the quantized-term sum tracks the float entropy.
# ---------------------------------------------------------------------------


def test_isotropy_entropy_properties():
    rng = random.Random(191)
    d = 64
    eq = [1.0] * d
    h = -sum(v / d * math.log(v / d) for v in eq)
    assert abs(h - math.log(d)) < 1e-12
    for _ in range(50):
        vs = [rng.uniform(0.1, 10) for _ in range(d)]
        vt = sum(vs)
        h_float = -sum(v / vt * math.log(v / vt) for v in vs)
        hq = sum(math.floor(v / vt * math.log(v / vt) * 10**12)
                 for v in vs)
        assert abs(-hq / 10**12 - h_float) < 1e-9
        assert 0 < h_float <= math.log(d) + 1e-12
    spiky = [100.0] + [0.001] * (d - 1)
    vt = sum(spiky)
    h_spiky = -sum(v / vt * math.log(v / vt) for v in spiky)
    assert h_spiky < 0.2 * math.log(d)


# ---------------------------------------------------------------------------
# RFM quintile edges: the order-statistic histogram form (min v with
# cum >= ceil(j*n/5)) equals direct indexing into the sorted multiset,
# and the resulting 1-5 scores partition near-evenly without ties.
# ---------------------------------------------------------------------------


def test_rfm_edges_match_sorted_order_statistics():
    rng = random.Random(197)
    for _ in range(100):
        xs = [rng.randint(0, 30) for _ in range(rng.randint(5, 120))]
        n = len(xs)
        s = sorted(xs)
        cnt = Counter(xs)
        vals = sorted(cnt)
        for j in range(1, 5):
            k = (j * n + 4) // 5  # ceil(j*n/5)
            cum = 0
            hist_edge = None
            for v in vals:
                cum += cnt[v]
                if cum >= k:
                    hist_edge = v
                    break
            assert hist_edge == s[k - 1]
        edges = [s[((j * n + 4) // 5) - 1] for j in range(1, 5)]
        scores = Counter(1 + sum(x > e for e in edges) for x in xs)
        assert set(scores) <= {1, 2, 3, 4, 5}
        # each bucket holds at most its quintile plus the tie mass at
        # its upper edge; all n accounted for
        assert sum(scores.values()) == n


# ---------------------------------------------------------------------------
# SRM chi2: integer-numerator form equals the textbook sum((o-e)^2/e),
# and a perfectly proportional split scores ~0.
# ---------------------------------------------------------------------------


def test_srm_chi2_integer_form():
    rng = random.Random(199)
    weights = [98, 1, 1]
    wtot = sum(weights)
    for _ in range(200):
        os_ = [rng.randint(0, 2000) for _ in weights]
        n = sum(os_)
        if n == 0:
            continue
        chi_int = sum(
            (o * wtot - n * w) ** 2 / (n * w * wtot)
            for o, w in zip(os_, weights))
        chi_tb = sum(
            (o - n * w / wtot) ** 2 / (n * w / wtot)
            for o, w in zip(os_, weights))
        assert abs(chi_int - chi_tb) < 1e-9 * max(1.0, chi_tb)
    exact = [9800, 100, 100]
    n = sum(exact)
    assert sum((o * wtot - n * w) ** 2 / (n * w * wtot)
               for o, w in zip(exact, weights)) == 0.0


# ---------------------------------------------------------------------------
# ANOVA: the quantized-term F equals the textbook F on random groups,
# and Cramér's V integer-numerator chi2 equals the (o-e)^2/e form.
# ---------------------------------------------------------------------------


def test_anova_quantized_f_matches_textbook():
    rng = random.Random(211)
    for _ in range(50):
        groups = [
            [rng.randint(0, 100) for _ in range(rng.randint(3, 30))]
            for _ in range(rng.randint(2, 6))
        ]
        k = len(groups)
        n = sum(len(g) for g in groups)
        s = sum(sum(g) for g in groups)
        ssq = sum(v * v for g in groups for v in g)
        q1 = sum(math.floor(sum(g) ** 2 / len(g) * 1000) for g in groups)
        ssb = q1 / 1000 - s * s / n
        ssw = ssq - q1 / 1000
        if ssw <= 0:
            continue
        f_q = ssb / (k - 1) / (ssw / (n - k))
        mu = s / n
        ssb_t = sum(len(g) * (sum(g) / len(g) - mu) ** 2 for g in groups)
        ssw_t = sum((v - sum(g) / len(g)) ** 2 for g in groups for v in g)
        f_t = ssb_t / (k - 1) / (ssw_t / (n - k))
        assert abs(f_q - f_t) < 0.02 + 1e-3 * abs(f_t)


def test_cramers_v_integer_numerator_chi2():
    rng = random.Random(223)
    for _ in range(100):
        nl, ns = rng.randint(2, 5), rng.randint(2, 6)
        grid = [[rng.randint(0, 40) for _ in range(ns)] for _ in range(nl)]
        n = sum(map(sum, grid))
        if n == 0:
            continue
        rows = [sum(g) for g in grid]
        cols = [sum(grid[i][j] for i in range(nl)) for j in range(ns)]
        if 0 in rows or 0 in cols:
            continue
        # (o*N - r*c)^2 / (N*r*c) IS (o-e)^2/e — no further /n
        chi_int = sum(
            (grid[i][j] * n - rows[i] * cols[j]) ** 2
            / (n * rows[i] * cols[j])
            for i in range(nl) for j in range(ns))
        chi_tb = sum(
            (grid[i][j] - rows[i] * cols[j] / n) ** 2
            / (rows[i] * cols[j] / n)
            for i in range(nl) for j in range(ns))
        assert abs(chi_int - chi_tb) < 1e-9 * max(1.0, chi_tb)
        v = math.sqrt(chi_tb / n / min(nl - 1, ns - 1))
        assert -1e-12 <= v <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# k-truss: brute-force peeling to convergence on random graphs matches
# the fixed-round form once converged, every surviving edge has
# support >= k-2, and the truss is a subgraph of the input.
# ---------------------------------------------------------------------------


def _truss_round(edges, k):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    keep = set()
    for a, b in edges:
        if len(adj[a] & adj[b]) >= k - 2:
            keep.add((a, b))
    return keep


def test_ktruss_fixed_rounds_converges_and_supports_hold():
    rng = random.Random(227)
    k = 4
    for _ in range(50):
        n = rng.randint(4, 12)
        edges = set()
        for _ in range(rng.randint(3, 30)):
            a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        cur = set(edges)
        rounds = 0
        while True:
            nxt = _truss_round(cur, k)
            rounds += 1
            if nxt == cur:
                break
            cur = nxt
        # confluent fixpoint: result is a subgraph where every edge has
        # enough support
        assert cur <= edges
        if cur:
            adj = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            assert all(len(adj[a] & adj[b]) >= k - 2 for a, b in cur)
        # small graphs converge within a handful of rounds (the staged
        # query's fixed count emits support so non-convergence is visible)
        assert rounds <= 10


# ---------------------------------------------------------------------------
# Higher moments: the raw-moment expansions equal direct central-moment
# computation, and known shapes land where they should.
# ---------------------------------------------------------------------------


def test_higher_moments_raw_expansion_matches_direct():
    rng = random.Random(229)
    for _ in range(100):
        xs = [rng.randint(0, 100) for _ in range(rng.randint(3, 60))]
        n = len(xs)
        mu = sum(xs) / n
        var = sum((x - mu) ** 2 for x in xs) / n
        if var == 0:
            continue
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        s1, s2 = sum(xs), sum(x * x for x in xs)
        s3, s4 = sum(x ** 3 for x in xs), sum(x ** 4 for x in xs)
        m3_raw = s3 / n - 3 * mu * var - mu ** 3
        m4_raw = (s4 / n - 4 * mu * (s3 / n)
                  + 6 * mu * mu * (s2 / n) - 3 * mu ** 4)
        assert abs(m3 - m3_raw) < 1e-6 * max(1.0, abs(m3))
        assert abs(m4 - m4_raw) < 1e-6 * max(1.0, abs(m4))
    sym = [1, 2, 3, 4, 5] * 10
    mu = sum(sym) / len(sym)
    m3 = sum((x - mu) ** 3 for x in sym) / len(sym)
    assert abs(m3) < 1e-9  # symmetric -> zero skew


def test_mix_entropy_evenness_bounds():
    rng = random.Random(233)
    for _ in range(100):
        cs = [rng.randint(1, 50) for _ in range(rng.randint(1, 8))]
        n = sum(cs)
        h = -sum(c / n * math.log(c / n) for c in cs)
        assert -1e-12 <= h <= math.log(len(cs)) + 1e-12
        if len(cs) > 1 and len(set(cs)) == 1:
            assert abs(h - math.log(len(cs))) < 1e-12


# ---------------------------------------------------------------------------
# Lorenz / HHI: cumulative shares are monotone and end at 1; HHI of an
# even split is 1/k and 1/HHI recovers k; entropy rate is bounded by
# the state-count log and zero for deterministic chains.
# ---------------------------------------------------------------------------


def test_lorenz_shares_monotone_to_one():
    rng = random.Random(239)
    for _ in range(100):
        xs = sorted(rng.randint(0, 200)
                    for _ in range(rng.randint(10, 80)))
        n = len(xs)
        edges = [xs[((j * n + 9) // 10) - 1] for j in range(1, 10)]
        buckets = Counter(1 + sum(x > e for e in edges) for x in xs)
        mass = Counter()
        for x in xs:
            mass[1 + sum(x > e for e in edges)] += x
        tt = sum(mass.values())
        if tt == 0:
            continue
        cum = 0.0
        prev = 0.0
        for d in sorted(mass):
            cum += mass[d] / tt
            assert cum >= prev - 1e-12
            prev = cum
        assert abs(cum - 1.0) < 1e-9
        assert sum(buckets.values()) == n


def test_hhi_even_split_and_effective_count():
    for k in (2, 5, 20):
        ns = [37] * k
        n = sum(ns)
        hhi = sum(x * x for x in ns) / (n * n)
        assert abs(hhi - 1 / k) < 1e-12
        assert abs(n * n / sum(x * x for x in ns) - k) < 1e-9


def test_entropy_rate_bounds():
    rng = random.Random(241)
    # deterministic chain: every a always goes to the same b
    tr = Counter({("a", "b"): 10, ("b", "c"): 9, ("c", "a"): 9})
    ctx = Counter()
    for (a, _), c in tr.items():
        ctx[a] += c
    n = sum(tr.values())
    h = (sum(c * math.log2(c) for c in ctx.values())
         - sum(c * math.log2(c) for c in tr.values())) / n
    assert abs(h) < 1e-12
    for _ in range(50):
        states = "abcd"
        tr = Counter()
        for _ in range(rng.randint(5, 100)):
            tr[(rng.choice(states), rng.choice(states))] += 1
        ctx = Counter()
        for (a, _), c in tr.items():
            ctx[a] += c
        n = sum(tr.values())
        h = (sum(c * math.log2(c) for c in ctx.values())
             - sum(c * math.log2(c) for c in tr.values())) / n
        assert -1e-12 <= h <= math.log2(len(states)) + 1e-12


# ---------------------------------------------------------------------------
# LCP identity: the common prefix of the lexicographic min and max of a
# string set equals the common prefix of the whole set.
# ---------------------------------------------------------------------------


def _lcp2(a, b):
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def test_lcp_min_max_identity():
    rng = random.Random(251)
    for _ in range(300):
        k = rng.randint(1, 10)
        base = "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        strs = [base + "".join(rng.choice("abcd")
                               for _ in range(rng.randint(0, 8)))
                for _ in range(k)]
        lo, hi = min(strs), max(strs)
        via_extremes = _lcp2(lo, hi)
        direct = len(strs[0])
        for s in strs[1:]:
            direct = min(direct, _lcp2(strs[0][:direct], s))
        assert via_extremes == direct


# ---------------------------------------------------------------------------
# Hill estimator: on exact Pareto tails c_i = C * i^(-1/alpha), the
# estimator recovers alpha as k grows.
# ---------------------------------------------------------------------------


def test_hill_recovers_pareto_exponent():
    for alpha in (0.5, 1.0, 2.0):
        k = 200
        cs = [(i ** (-1.0 / alpha)) for i in range(1, k + 2)]
        ref = cs[k]
        s = sum(math.log(c / ref) for c in cs[:k])
        est = k / s
        # Hill on an exact power law: k / sum ln(i_ref/i)^(1/alpha)
        # converges to alpha within a few percent at k=200
        assert abs(est - alpha) / alpha < 0.1
