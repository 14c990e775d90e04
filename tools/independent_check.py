#!/usr/bin/env python3
"""Third-opinion check (dev tool): recompute the semantically riskiest
operators in pure Python — independent of BOTH the Spark queries and their
DuckDB oracle SQL — so a formula that drifted identically on both engines
would still be caught.

Covers: sessionize (30-min gap islands), dedup_jaccard (3-gram shingle
set Jaccard), caim_criterion (20-bin quanta + CAIM), join_asof (latest
signup at-or-before each purchase), stream_join (view->purchase interval
join), agg_percentile (linear-interpolated quantiles), agg_stats
(decimal-co-moment mean/stddev/corr), text_repetition (3-gram window
multiset stats), text_boilerplate (corpus-level shared-5-gram fraction),
profile_table (per-column null/distinct/min/max),
caim_fit (the full greedy CAIM fit, ported line-for-line),
win_time_range (trailing-hour RANGE frame, two-pointer sweep),
text_hashing_tf (md5-prefix feature hashing via hashlib),
sample_balanced (per-class md5-rank cap), agg_anova (textbook mean-form
F — deliberately NOT the cancellation-safe decomposition the engines
share, so a shared formula drift would show), agg_mwu (rank sum from a
literal sort with tie averaging), ts_anomaly (flagged-day set from
literal per-type moments), graph_clustering (first-principles
co-occurrence graph + per-node coefficients, no inverted index, no
orientation), agg_spearman (Pearson over literal per-row tie-average
ranks — not the value-domain collapse the engines share), agg_kruskal
(H from a literal global sort), agg_cramers_v (full-grid chi2 from raw
tuples), agg_mutual_info (direct joint/marginal probability sums),
graph_linkpred (CN/Jaccard/Adamic-Adar from the first-principles
adjacency), ts_trend (Mann-Kendall S/z + Sen's slope from literal
pair enumeration), agg_theil (per-segment T + the additive
decomposition law), text_zipf (OLS over literal token ranks),
agg_auc (probabilistic-definition AUC via a sorted sweep),
agg_kendall (tau-b from a literal cell-pair sweep), eval_calibration
(bins + ECE from raw events), events_assoc_rules (rules from literal
day baskets), sample_temperature (hashlib-md5 rank targets),
graph_kcore (synchronous peel from first-principles edges).

Usage: python3 tools/independent_check.py <sfDir> <verifyOutDir>
(run graft.Verify into <verifyOutDir> first). Verified green 2026-08-12 at
sf0.01: 9549 sessions, 25 jaccard pairs, caim=1.068815, 1791 asof rows.
"""
import collections
import glob
import math
import sys

import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v01"

def sparkres(name):
    return pq.read_table(glob.glob(f"{out}/{name}/*.parquet")[0]).to_pydict()

fails = 0

# sessionize: 30-min gap-island simulation
ev = pq.read_table(f"{sf}/events.parquet").to_pydict()
by_user = collections.defaultdict(list)
for u, ts, eid in zip(ev["user_id"], ev["ts"], ev["event_id"]):
    by_user[u].append((ts, eid))
expected = []
for u in sorted(by_user):
    evs = sorted(by_user[u])
    cur, sid = [evs[0]], 1
    for prev, nxt in zip(evs, evs[1:]):
        d = nxt[0] - prev[0]
        us = d.days * 86400_000_000 + d.seconds * 1_000_000 + d.microseconds
        if us >= 1_800_000_000:
            expected.append((u, sid, len(cur)))
            sid, cur = sid + 1, [nxt]
        else:
            cur.append(nxt)
    expected.append((u, sid, len(cur)))
got = sparkres("sessionize")
ok = list(zip(got["user_id"], got["sid"], got["n_events"])) == expected
print(f"sessionize: {'OK' if ok else 'MISMATCH'} ({len(expected)} sessions)")
fails += 0 if ok else 1

# dedup_jaccard: shingle-set jaccard via inverted index
docs = pq.read_table(f"{sf}/documents.parquet").to_pydict()
sh = {}
for did, text in zip(docs["doc_id"], docs["text"]):
    tk = text.split(" ")
    if len(tk) >= 3:
        sh[did] = set(" ".join(tk[i:i + 3]) for i in range(len(tk) - 2))
inv = collections.defaultdict(set)
for did, s in sh.items():
    for g in s:
        inv[g].add(did)
cand = collections.defaultdict(int)
for g, ds in inv.items():
    ds = sorted(ds)
    for i in range(len(ds)):
        for j in range(i + 1, len(ds)):
            cand[(ds[i], ds[j])] += 1
exp_pairs = sorted(
    (a, b, round(i / (len(sh[a]) + len(sh[b]) - i), 6))
    for (a, b), i in cand.items()
    if i / (len(sh[a]) + len(sh[b]) - i) >= 0.5)
got = sparkres("dedup_jaccard")
ok = sorted(zip(got["da"], got["db"], [round(x, 6) for x in got["jac"]])) == exp_pairs
print(f"dedup_jaccard: {'OK' if ok else 'MISMATCH'} ({len(exp_pairs)} pairs)")
fails += 0 if ok else 1

# caim_criterion: 20-bin quanta + CAIM value
emb = pq.read_table(f"{sf}/embeddings.parquet").to_pydict()
vs = [float(e[0]) for e in emb["embedding"]]
lo, hi = min(vs), max(vs)
w = (hi - lo) / 20
q = collections.defaultdict(lambda: collections.defaultdict(int))
for v, l in zip(vs, emb["label"]):
    q[min(int(math.floor((v - lo) / w)), 19)][l] += 1
caim = round(sum(max(c.values()) ** 2 / sum(c.values()) for c in q.values()) / len(q), 6)
got = sparkres("caim_criterion")
ok = (got["n_bins"][0], round(got["caim"][0], 6)) == (len(q), caim)
print(f"caim_criterion: {'OK' if ok else 'MISMATCH'} (caim={caim})")
fails += 0 if ok else 1

# join_asof: latest signup at-or-before each purchase
sig = collections.defaultdict(list)
for u, ts, et in zip(ev["user_id"], ev["ts"], ev["event_type"]):
    if et == "signup":
        sig[u].append(ts)
exp_asof = sorted(
    (eid, u)
    for u, ts, eid, et in zip(ev["user_id"], ev["ts"], ev["event_id"], ev["event_type"])
    if et == "purchase" and any(s <= ts for s in sig[u]))
got = sparkres("join_asof")
ok = sorted(zip(got["p_id"], got["user_id"])) == exp_asof
print(f"join_asof: {'OK' if ok else 'MISMATCH'} ({len(exp_asof)} rows)")
fails += 0 if ok else 1

# stream_join: view->purchase pairs of the same user within 10 minutes
purch = collections.defaultdict(list)
for u, ts, eid, et in zip(ev["user_id"], ev["ts"], ev["event_id"], ev["event_type"]):
    if et == "purchase":
        purch[u].append((ts, eid))
exp_sj = sorted(
    (u, veid, peid)
    for u, ts, veid, et in zip(ev["user_id"], ev["ts"], ev["event_id"], ev["event_type"])
    if et == "view"
    for pts, peid in purch.get(u, [])
    if ts <= pts and (pts - ts).days * 86400_000_000
        + (pts - ts).seconds * 1_000_000 + (pts - ts).microseconds <= 600_000_000)
got = sparkres("stream_join")
ok = sorted(zip(got["user_id"], got["a_id"], got["b_id"])) == exp_sj
print(f"stream_join: {'OK' if ok else 'MISMATCH'} ({len(exp_sj)} pairs)")
fails += 0 if ok else 1

# agg_percentile: linear-interpolated quantiles per returnflag
li = pq.read_table(f"{sf}/lineitem.parquet",
                   columns=["l_returnflag", "l_quantity", "l_extendedprice"]).to_pydict()
groups = collections.defaultdict(list)
for f, q_ in zip(li["l_returnflag"], li["l_quantity"]):
    groups[f].append(q_)
def quantile_cont(xs, p):
    xs = sorted(xs)
    r = p * (len(xs) - 1)
    f_, c = int(math.floor(r)), int(math.ceil(r))
    return xs[f_] + (xs[c] - xs[f_]) * (r - f_)
exp_pct = {f: tuple(round(quantile_cont(v, p), 6) for p in (0.25, 0.5, 0.95))
           for f, v in groups.items()}
got = sparkres("agg_percentile")
ok = {f: (round(a, 6), round(b, 6), round(c, 6))
      for f, a, b, c in zip(got["l_returnflag"], got["p25"], got["p50"], got["p95"])} == exp_pct
print(f"agg_percentile: {'OK' if ok else 'MISMATCH'} ({len(exp_pct)} groups)")
fails += 0 if ok else 1

# agg_stats: exact integer-cent co-moment sums -> double closed form
stats = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, sq, sqq, sp, spp, spq (scaled ints)
for f, q_, p_ in zip(li["l_returnflag"], li["l_quantity"], li["l_extendedprice"]):
    qi, pi = round(q_ * 100), round(p_ * 100)  # exact cents
    a = stats[f]
    a[0] += 1; a[1] += qi; a[2] += qi * qi; a[3] += pi; a[4] += pi * pi; a[5] += qi * pi
exp_stats = {}
for f, (n, sq_, sqq, sp_, spp, spq) in stats.items():
    sq_, sqq, sp_, spp, spq = sq_ / 1e2, sqq / 1e4, sp_ / 1e2, spp / 1e4, spq / 1e4
    mean = round(sq_ / n, 6)
    std = round(math.sqrt((sqq - sq_ * sq_ / n) / (n - 1)), 6)
    corr = round((spq - sq_ * sp_ / n) /
                 (math.sqrt(sqq - sq_ * sq_ / n) * math.sqrt(spp - sp_ * sp_ / n)), 6)
    exp_stats[f] = (n, mean, std, corr)
got = sparkres("agg_stats")
ok = {f: (n, round(m, 6), round(s, 6), round(c, 6))
      for f, n, m, s, c in zip(got["l_returnflag"], got["n"], got["mean_qty"],
                               got["std_qty"], got["corr_qp"])} == exp_stats
print(f"agg_stats: {'OK' if ok else 'MISMATCH'} ({len(exp_stats)} groups)")
fails += 0 if ok else 1

# text_repetition: per-doc 3-gram window multiset stats (round 8)
rep_exp = {}
for did, text in zip(docs["doc_id"], docs["text"]):
    tk = text.split(" ")
    if len(tk) < 3:
        continue
    wins = [" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)]
    cnt = collections.Counter(wins)
    tot, dis = len(wins), len(cnt)
    rep_exp[did] = (tot, dis, round(1.0 - dis * 1.0 / tot, 6), max(cnt.values()))
got = sparkres("text_repetition")
ok = {d: (g, n, round(f, 6), t) for d, g, n, f, t in
      zip(got["doc_id"], got["n_grams"], got["n_distinct"],
          got["dup_frac"], got["top_rep"])} == rep_exp
print(f"text_repetition: {'OK' if ok else 'MISMATCH'} ({len(rep_exp)} docs)")
fails += 0 if ok else 1

# text_boilerplate: corpus-level shared-5-gram-window fraction (round 8)
bp_wins = {}
for did, text in zip(docs["doc_id"], docs["text"]):
    tk = text.split(" ")
    if len(tk) >= 5:
        bp_wins[did] = set(" ".join(tk[i:i + 5]) for i in range(len(tk) - 4))
bp_df = collections.Counter(w for ws in bp_wins.values() for w in ws)
bp_exp = {}
for did, ws in bp_wins.items():
    shared = sum(1 for w in ws if bp_df[w] >= 2)
    bp_exp[did] = (len(ws), shared, round(shared * 1.0 / len(ws), 6))
got = sparkres("text_boilerplate")
ok = {d: (w, s, round(f, 6)) for d, w, s, f in
      zip(got["doc_id"], got["n_windows"], got["n_shared"],
          got["shared_frac"])} == bp_exp
print(f"text_boilerplate: {'OK' if ok else 'MISMATCH'} ({len(bp_exp)} docs)")
fails += 0 if ok else 1

# profile_table: per-column null/distinct/min/max (round 8)
prof_exp = {}
for c in ("doc_id", "lang", "source", "n_chars"):
    vals = docs[c]
    nn = sum(1 for v in vals if v is None)
    nonnull = [v for v in vals if v is not None]
    prof_exp[c] = (len(vals), nn, len(set(nonnull)),
                   str(min(nonnull)), str(max(nonnull)))
got = sparkres("profile_table")
ok = {c: (r, n, d, mn, mx) for c, r, n, d, mn, mx in
      zip(got["col_name"], got["n_rows"], got["n_null"], got["n_distinct"],
          got["min_val"], got["max_val"])} == prof_exp
print(f"profile_table: {'OK' if ok else 'MISMATCH'} ({len(prof_exp)} columns)")
fails += 0 if ok else 1

# caim_fit: the FULL greedy CAIM fit recomputed in pure Python (round 8) —
# a faithful port of CAIMDiscretizer.greedySelect (prefix-sum terms,
# ascending-position argmax with strict >, accept while caim improves or
# k < n_classes, midpoint cuts, order-preserving distinct)
def greedy_select(values, counts, n_classes):
    m = len(values)
    if m <= 1:
        v0 = values[0] if values else 0.0
        return [v0, v0]
    S = max(n_classes, 1)
    prefix = [[0] * S]
    for i in range(m):
        prefix.append([prefix[-1][s] + counts[i][s] for s in range(S)])
    def term(lo, hi):
        mx, tot = 0, 0
        for s in range(S):
            cns = prefix[hi][s] - prefix[lo][s]
            if cns > mx:
                mx = cns
            tot += cns
        return 0.0 if tot == 0 else float(mx) * mx / tot
    import bisect
    accepted = [0, m]
    sum_terms = term(0, m)
    k, global_caim = 1, 0.0
    remaining = sorted(range(1, m))
    while remaining:
        best_p, best_sum, best_caim = -1, 0.0, float("-inf")
        for p in remaining:
            j = bisect.bisect_left(accepted, p)
            lo, hi = accepted[j - 1], accepted[j]
            cand = sum_terms - term(lo, hi) + term(lo, p) + term(p, hi)
            caim = cand / (k + 1)
            if caim > best_caim:
                best_caim, best_sum, best_p = caim, cand, p
        if best_p >= 0 and (best_caim > global_caim or k < S):
            bisect.insort(accepted, best_p)
            remaining.remove(best_p)
            sum_terms, global_caim, k = best_sum, best_caim, k + 1
        else:
            break
    cuts = [(values[p - 1] + values[p]) / 2 for p in accepted if 0 < p < m]
    res = [values[0]] + cuts + [values[-1]]
    out = []
    for x in res:
        if x not in out:
            out.append(x)
    return out

embt = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding", "label"]).to_pydict()
n_classes = len(set(embt["label"]))
fit_exp = []
for fi in range(4):
    hist = collections.Counter()
    for e, y in zip(embt["embedding"], embt["label"]):
        hist[(float(e[fi]), y)] += 1
    values = sorted({v for v, _ in hist})
    labels = sorted({str(y) for _, y in hist})
    vidx = {v: i for i, v in enumerate(values)}
    lidx = {l: i for i, l in enumerate(labels)}
    counts = [[0] * len(labels) for _ in values]
    for (v, y), cnt in hist.items():
        counts[vidx[v]][lidx[str(y)]] += cnt
    # CAIMDiscretizer compresses candidates to a maxCandidates (32768)
    # equal-frequency grid over the distinct values before the greedy —
    # mirror it (same ntile arithmetic, bucket represented by its max)
    # or the port silently diverges at SFs where a feature exceeds the cap
    MAXC = 32768
    if len(values) > MAXC:
        nd = len(values)
        basec, rem = divmod(nd, MAXC)
        def bucket_of(r):
            if r <= rem * (basec + 1):
                return (r - 1) // (basec + 1) + 1
            return rem + (r - 1 - rem * (basec + 1)) // basec + 1
        merged = {}
        for i, v in enumerate(values):
            bkt = bucket_of(i + 1)
            slot = merged.setdefault(bkt, [v, [0] * len(labels)])
            slot[0] = v  # ascending scan: last write is the bucket max
            for s in range(len(labels)):
                slot[1][s] += counts[i][s]
        ordered = [merged[bkt] for bkt in sorted(merged)]
        values = [v for v, _ in ordered]
        counts = [cs for _, cs in ordered]
    for bi, b in enumerate(greedy_select(values, counts, n_classes)):
        fit_exp.append((f"f{fi + 1}", bi, round(b, 6)))
got = sparkres("caim_fit")
fit_got = [(f, b, round(x, 6)) for f, b, x in
           zip(got["feature"], got["bin_idx"], got["boundary"])]
ok = sorted(fit_got) == sorted(fit_exp)
print(f"caim_fit: {'OK' if ok else 'MISMATCH'} ({len(fit_exp)} boundaries)")
fails += 0 if ok else 1

# win_time_range (round 10): trailing-hour RANGE frame recomputed with a
# per-user two-pointer sweep over epoch-us — equal-us peers all share the
# frame edge, matching RANGE (not ROWS) semantics
ev_rows = sorted(zip(ev["user_id"], ev["ts"], ev["event_id"], ev["value"]),
                 key=lambda r: (r[0], r[1], r[2]))
exp_tr = {}
i = 0
while i < len(ev_rows):
    j = i
    while j < len(ev_rows) and ev_rows[j][0] == ev_rows[i][0]:
        j += 1
    rows = ev_rows[i:j]
    # exact epoch-us without float rounding
    us = []
    for r in rows:
        d = r[1] - __import__("datetime").datetime(1970, 1, 1)
        us.append(d.days * 86400_000_000 + d.seconds * 1_000_000 + d.microseconds)
    lo = 0
    for k, r in enumerate(rows):
        while us[lo] < us[k] - 3_600_000_000:
            lo += 1
        # include ALL peers with us == us[k] (RANGE frame), even past k
        hi = k
        while hi + 1 < len(rows) and us[hi + 1] == us[k]:
            hi += 1
        frame = rows[lo:hi + 1]
        sv = sum(int(round(x[3] * 100)) for x in frame)
        exp_tr[r[2]] = (r[0], us[k], len(frame), round(sv / 100.0, 10))
    i = j
got = sparkres("win_time_range")
got_tr = {e: (u, us_, n, round(s, 10)) for e, u, us_, n, s in
          zip(got["event_id"], got["user_id"], got["us"], got["n_1h"], got["sum_1h"])}
ok = got_tr == exp_tr
print(f"win_time_range: {'OK' if ok else 'MISMATCH'} ({len(exp_tr)} rows)")
fails += 0 if ok else 1

# text_hashing_tf (round 10): md5-prefix feature hashing via hashlib
import hashlib
exp_tf = collections.Counter()
for did, text in zip(docs["doc_id"], docs["text"]):
    if text is None:
        continue
    for tok in text.split(" "):
        if tok:
            exp_tf[(did, hashlib.md5(tok.encode()).hexdigest()[:2])] += 1
got = sparkres("text_hashing_tf")
got_tf = dict(zip(zip(got["doc_id"], got["dim"]), got["tf"]))
ok = got_tf == dict(exp_tf)
print(f"text_hashing_tf: {'OK' if ok else 'MISMATCH'} ({len(exp_tf)} cells)")
fails += 0 if ok else 1

# sample_balanced (round 10): per-lang md5-rank cap at the min class size
langs = collections.defaultdict(list)
for did, lang in zip(docs["doc_id"], docs["lang"]):
    if lang is not None:
        langs[lang].append(did)
cap = min(len(v) for v in langs.values())
exp_bal = sorted(
    (did, lang)
    for lang, ids in langs.items()
    for did in sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[:cap])
got = sparkres("sample_balanced")
ok = sorted(zip(got["doc_id"], got["lang"])) == exp_bal
print(f"sample_balanced: {'OK' if ok else 'MISMATCH'} ({len(exp_bal)} kept, cap={cap})")
fails += 0 if ok else 1

# agg_anova (round 12): one-way F by return flag, textbook mean form
li = pq.read_table(f"{sf}/lineitem.parquet",
                   columns=["l_returnflag", "l_extendedprice"]).to_pydict()
groups = collections.defaultdict(list)
for f_, y in zip(li["l_returnflag"], li["l_extendedprice"]):
    groups[f_].append(y)
k = len(groups)
n = sum(len(v) for v in groups.values())
mean = sum(sum(v) for v in groups.values()) / n
ssb = sum(len(v) * (sum(v) / len(v) - mean) ** 2 for v in groups.values())
ssw = sum(sum((y - sum(v) / len(v)) ** 2 for y in v) for v in groups.values())
f_stat = (ssb / (k - 1)) / (ssw / (n - k))
got = sparkres("agg_anova")
ok = (got["k"][0] == k and got["n"][0] == n
      and abs(got["ssb"][0] - ssb) <= abs(ssb) * 1e-6
      and abs(got["f"][0] - f_stat) <= 1e-4)
print(f"agg_anova: {'OK' if ok else 'MISMATCH'} (k={k}, F~{f_stat:.4f})")
fails += 0 if ok else 1

# agg_mwu (round 12): rank-sum from a literal sort with tie averaging
vals = [(v, et == "purchase") for et, v in zip(ev["event_type"], ev["value"])
        if et in ("purchase", "view")]
svals = sorted(v for v, _ in vals)
rank_of = {}
i = 0
while i < len(svals):
    j = i
    while j < len(svals) and svals[j] == svals[i]:
        j += 1
    rank_of[svals[i]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
    i = j
n1 = sum(1 for _, g in vals if g)
n2 = len(vals) - n1
nn = len(vals)
r1 = sum(rank_of[v] for v, g in vals if g)
u1 = r1 - n1 * (n1 + 1) / 2.0
tsum = sum(t ** 3 - t for t in collections.Counter(svals).values())
z = (u1 - n1 * n2 / 2.0) / math.sqrt(
    n1 * n2 / 12.0 * ((nn + 1) - tsum / (nn * (nn - 1))))
got = sparkres("agg_mwu")
ok = (got["n1"][0] == n1 and got["n2"][0] == n2
      and abs(got["u1"][0] - u1) <= 0.051 and abs(got["z"][0] - z) <= 1e-5)
print(f"agg_mwu: {'OK' if ok else 'MISMATCH'} (n1={n1}, U1={u1:.1f}, z={z:.4f})")
fails += 0 if ok else 1

# ts_anomaly (round 12): flagged set from literal per-type daily moments
daily = collections.Counter()
for et, ts in zip(ev["event_type"], ev["ts"]):
    d = (ts - ts.__class__(1970, 1, 1)).days
    daily[(et, d)] += 1
by_type = collections.defaultdict(list)
for (et, d), x in daily.items():
    by_type[et].append((d, x))
exp_anom = []
for et in sorted(by_type):
    xs = [x for _, x in by_type[et]]
    nd, sn, snn = len(xs), sum(xs), sum(x * x for x in xs)
    if nd * snn - sn * sn <= 0:
        continue
    for d, x in sorted(by_type[et]):
        z = round((x * nd - sn) / math.sqrt(nd * snn - sn * sn), 6)
        if abs(z) > 2.0:
            exp_anom.append((et, d, x, z))
got = sparkres("ts_anomaly")
ok = list(zip(got["event_type"], got["d"], got["n_events"], got["z"])) == exp_anom
print(f"ts_anomaly: {'OK' if ok else 'MISMATCH'} ({len(exp_anom)} flagged)")
fails += 0 if ok else 1

# graph_clustering (round 12): brute-force co-occurrence graph + per-node
# coefficients from first principles (no inverted index, no orientation)
act = set()
for u, ts, et in zip(ev["user_id"], ev["ts"], ev["event_type"]):
    act.add((u, (ts - ts.__class__(1970, 1, 1)).days, et))
bucket = collections.defaultdict(set)
for u, d, et in act:
    bucket[(d, et)].add(u)
# pair counting is the Σ bucket² hot loop (21.7M increments at sf0.1):
# int-encoded keys + itertools.combinations keep this pure-Python pass
# within a couple of minutes at bench SF
import itertools
shared = collections.Counter()
ENC = 1 << 32
for us in bucket.values():
    if len(us) > 65536:
        continue
    shared.update(a * ENC + b for a, b in itertools.combinations(sorted(us), 2))
adjc = collections.defaultdict(set)
for ab, cshared in shared.items():
    if cshared >= 30:
        a, b = divmod(ab, ENC)
        adjc[a].add(b)
        adjc[b].add(a)
tri_count = collections.Counter()
for a in adjc:
    for b in adjc[a]:
        if b <= a:
            continue
        for c in adjc[a] & adjc[b]:
            if c > b:
                for vtx in (a, b, c):
                    tri_count[vtx] += 1
exp_cc = []
for u in sorted({u for u, _, _ in act}):
    deg = len(adjc.get(u, ()))
    ntri = tri_count.get(u, 0)
    coeff = round(2.0 * ntri / (deg * (deg - 1)), 6) if deg >= 2 else 0.0
    exp_cc.append((u, deg, ntri, coeff))
got = sparkres("graph_clustering")
ok = list(zip(got["user_id"], got["degree"], got["n_tri"], got["coeff"])) == exp_cc
print(f"graph_clustering: {'OK' if ok else 'MISMATCH'} ({len(exp_cc)} users, "
      f"{sum(tri_count.values()) // 3} triangles)")
fails += 0 if ok else 1

# agg_spearman (round 12 batch 2): Pearson over literal PER-ROW tie-average
# ranks — deliberately not the value-domain collapse both engines share
li2 = pq.read_table(f"{sf}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity", "l_discount"]).to_pydict()
sp_groups = collections.defaultdict(list)
for f_, x, y in zip(li2["l_returnflag"], li2["l_quantity"], li2["l_discount"]):
    sp_groups[f_].append((float(x), float(y)))

def tie_avg_ranks(xs):
    s = sorted(xs)
    r, i = {}, 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        r[s[i]] = (i + 1 + j) / 2.0
        i = j
    return r

got = sparkres("agg_spearman")
got_sp = {g: (n_, rho) for g, n_, rho in zip(got["l_returnflag"], got["n"], got["rho"])}
ok = True
for g, rs in sp_groups.items():
    rx = tie_avg_ranks([x for x, _ in rs])
    ry = tie_avg_ranks([y for _, y in rs])
    rxs = [rx[x] for x, _ in rs]
    rys = [ry[y] for _, y in rs]
    ng = len(rs)
    mx, my = sum(rxs) / ng, sum(rys) / ng
    cov = sum((a - mx) * (b - my) for a, b in zip(rxs, rys))
    vx = sum((a - mx) ** 2 for a in rxs)
    vy = sum((b - my) ** 2 for b in rys)
    rho = cov / math.sqrt(vx * vy)
    ok = ok and got_sp[g][0] == ng and abs(got_sp[g][1] - rho) <= 1e-5
print(f"agg_spearman: {'OK' if ok else 'MISMATCH'} ({len(sp_groups)} groups)")
fails += 0 if ok else 1

# agg_kruskal (round 12 batch 2): H from a literal global sort of values
kv = [(v, et) for et, v in zip(ev["event_type"], ev["value"])]
rank_all = tie_avg_ranks([v for v, _ in kv])
nn = len(kv)
kw_groups = collections.defaultdict(list)
for v, et in kv:
    kw_groups[et].append(v)
s4 = sum(sum(rank_all[v] for v in g) ** 2 / len(g) for g in kw_groups.values())
h_raw = 12.0 / (nn * (nn + 1.0)) * s4 - 3.0 * (nn + 1)
tsum = sum(t ** 3 - t for t in collections.Counter(v for v, _ in kv).values())
h_adj = h_raw / (1.0 - tsum / (float(nn) ** 3 - nn))
got = sparkres("agg_kruskal")
ok = (got["k"][0] == len(kw_groups) and got["n"][0] == nn
      and abs(got["h"][0] - h_raw) <= 1e-4 and abs(got["h_adj"][0] - h_adj) <= 1e-4)
print(f"agg_kruskal: {'OK' if ok else 'MISMATCH'} (k={len(kw_groups)}, H~{h_raw:.4f})")
fails += 0 if ok else 1

# agg_cramers_v / agg_mutual_info (round 12 batch 2): both from the same
# raw (event_type, dow) tuple list — full-grid chi2 incl. zero cells for V,
# observed-cell probability sums for MI
tuples = [(et, ((ts - ts.__class__(1970, 1, 1)).days) % 7)
          for et, ts in zip(ev["event_type"], ev["ts"])]
nt = float(len(tuples))
rowm = collections.Counter(et for et, _ in tuples)
colm = collections.Counter(d for _, d in tuples)
obsm = collections.Counter(tuples)
chi2 = sum((obsm.get((rk, ck), 0) - rowm[rk] * colm[ck] / nt) ** 2
           / (rowm[rk] * colm[ck] / nt) for rk in rowm for ck in colm)
mind = min(len(rowm) - 1, len(colm) - 1)
v_stat = math.sqrt(chi2 / (nt * mind))
got = sparkres("agg_cramers_v")
ok = (got["n"][0] == len(tuples) and got["dof"][0] == (len(rowm) - 1) * (len(colm) - 1)
      and abs(got["chi2"][0] - chi2) <= 1e-4 and abs(got["v"][0] - v_stat) <= 1e-6)
print(f"agg_cramers_v: {'OK' if ok else 'MISMATCH'} (chi2~{chi2:.4f}, V~{v_stat:.6f})")
fails += 0 if ok else 1

mi = sum(c / nt * math.log((c / nt) / (rowm[rk] / nt * colm[ck] / nt))
         for (rk, ck), c in obsm.items())
hx = -sum(c / nt * math.log(c / nt) for c in rowm.values())
hy = -sum(c / nt * math.log(c / nt) for c in colm.values())
got = sparkres("agg_mutual_info")
ok = (got["n"][0] == len(tuples) and got["n_cells"][0] == len(obsm)
      and abs(got["mi"][0] - mi) <= 1e-6
      and abs(got["nmi"][0] - mi / math.sqrt(hx * hy)) <= 1e-6)
print(f"agg_mutual_info: {'OK' if ok else 'MISMATCH'} (MI~{mi:.6f})")
fails += 0 if ok else 1

# graph_linkpred (round 12 batch 3): CN / Jaccard / Adamic-Adar for
# non-adjacent pairs from the SAME first-principles adjacency the
# graph_clustering check built above
lp_cn = collections.Counter()
lp_aa = collections.defaultdict(float)
for z, nbrs in adjc.items():
    if len(nbrs) < 2:
        continue
    term = 1.0 / math.log(len(nbrs))
    nz = sorted(nbrs)
    for i in range(len(nz)):
        for j in range(i + 1, len(nz)):
            lp_cn[(nz[i], nz[j])] += 1
            lp_aa[(nz[i], nz[j])] += term
exp_lp = sorted((a, b, c) for (a, b), c in lp_cn.items()
                if c >= 2 and b not in adjc.get(a, ()))
got = sparkres("graph_linkpred")
ok = [(a, b, c) for a, b, c in
      zip(got["a"], got["b"], got["cn"])] == exp_lp
for a, b, c, jac, ad in zip(got["a"], got["b"], got["cn"],
                            got["jaccard"], got["adamic_adar"]):
    da, db = len(adjc[a]), len(adjc[b])
    ok = ok and abs(jac - c / (da + db - c)) <= 1e-5
    ok = ok and abs(ad - lp_aa[(a, b)]) <= 1e-5
print(f"graph_linkpred: {'OK' if ok else 'MISMATCH'} ({len(exp_lp)} pairs)")
fails += 0 if ok else 1

# ts_trend (round 12 batch 3): Mann-Kendall S / z / Sen's slope from the
# literal per-type daily series
mk_daily = collections.Counter()
for et, ts in zip(ev["event_type"], ev["ts"]):
    mk_daily[(et, (ts - ts.__class__(1970, 1, 1)).days)] += 1
mk_series = collections.defaultdict(list)
for (et, d), c in mk_daily.items():
    mk_series[et].append((d, c))
got = sparkres("ts_trend")
got_mk = {g: (nd, s, z, sen) for g, nd, s, z, sen in
          zip(got["event_type"], got["nd"], got["s"], got["z"],
              got["sen_slope"])}
ok = True
for et, pts in mk_series.items():
    pts.sort()
    nd = len(pts)
    s = sum((pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
            for i in range(nd) for j in range(i + 1, nd))
    tsum = sum(t * (t - 1) * (2 * t + 5)
               for t in collections.Counter(c for _, c in pts).values())
    vs = (nd * (nd - 1) * (2 * nd + 5) - tsum) / 18.0
    z = (s - 1) / math.sqrt(vs) if s > 0 else \
        (s + 1) / math.sqrt(vs) if s < 0 else 0.0
    slopes = sorted((pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
                    for i in range(nd) for j in range(i + 1, nd))
    m = len(slopes)
    sen = slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    g = got_mk[et]
    ok = ok and g[0] == nd and g[1] == s and abs(g[2] - z) <= 1e-5 \
        and abs(g[3] - sen) <= 1e-5
print(f"ts_trend: {'OK' if ok else 'MISMATCH'} ({len(mk_series)} types)")
fails += 0 if ok else 1

# agg_theil (round 12 batch 3): per-segment Theil T + the additive
# decomposition law, from raw per-customer order counts
oc = collections.Counter(pq.read_table(f"{sf}/orders.parquet",
                                       columns=["o_custkey"]).to_pydict()["o_custkey"])
cust = pq.read_table(f"{sf}/customer.parquet",
                     columns=["c_custkey", "c_mktsegment"]).to_pydict()
seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
by_seg = collections.defaultdict(list)
for ck, x in oc.items():
    by_seg[seg_of[ck]].append(float(x))

def theil_t(xs):
    mu = sum(xs) / len(xs)
    return sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)

got = sparkres("agg_theil")
ok = True
for g, n_cust, th in zip(got["c_mktsegment"], got["n_cust"], got["theil"]):
    ok = ok and n_cust == len(by_seg[g]) \
        and abs(th - theil_t(by_seg[g])) <= 1e-5
total_t = theil_t([x for xs in by_seg.values() for x in xs])
recon = sum(w + b for w, b in zip(got["within_share"], got["between_term"]))
ok = ok and abs(recon - total_t) <= 1e-4
print(f"agg_theil: {'OK' if ok else 'MISMATCH'} "
      f"(total={total_t:.6f}, reconstructed={recon:.6f})")
fails += 0 if ok else 1

# text_zipf (round 12 batch 3): OLS over literal token rank/frequency
zc = collections.Counter()
for text in docs["text"]:
    if text:
        zc.update(text.split(" "))
ztop = sorted(zc.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
zpts = [(math.log(i + 1), math.log(c)) for i, (_, c) in enumerate(ztop)]
zn = len(zpts)
zsx = sum(p[0] for p in zpts); zsy = sum(p[1] for p in zpts)
zsxx = sum(p[0] * p[0] for p in zpts); zsyy = sum(p[1] * p[1] for p in zpts)
zsxy = sum(p[0] * p[1] for p in zpts)
zslope = (zn * zsxy - zsx * zsy) / (zn * zsxx - zsx * zsx)
zint = (zsy * zsxx - zsx * zsxy) / (zn * zsxx - zsx * zsx)
zr2 = (zn * zsxy - zsx * zsy) ** 2 / \
    ((zn * zsxx - zsx * zsx) * (zn * zsyy - zsy * zsy))
got = sparkres("text_zipf")
ok = (got["n_tokens"][0] == zn and abs(got["slope"][0] - zslope) <= 1e-5
      and abs(got["intercept"][0] - zint) <= 1e-5
      and abs(got["r2"][0] - zr2) <= 1e-5)
print(f"text_zipf: {'OK' if ok else 'MISMATCH'} "
      f"(n={zn}, slope~{zslope:.4f})")
fails += 0 if ok else 1

# agg_auc (round 12 batch 4): AUC from the literal probabilistic
# definition (wins + half ties over all pos x neg pairs), via a sorted
# sweep so sf0.1 stays fast
auc_pos = sorted(v for t, v in zip(ev["event_type"], ev["value"])
                 if t == "purchase")
auc_neg = sorted(v for t, v in zip(ev["event_type"], ev["value"])
                 if t == "view")
import bisect
wins = 0.0
for p in auc_pos:
    lo = bisect.bisect_left(auc_neg, p)
    hi = bisect.bisect_right(auc_neg, p)
    wins += lo + 0.5 * (hi - lo)
auc = wins / (len(auc_pos) * len(auc_neg))
got = sparkres("agg_auc")
ok = (got["n_pos"][0] == len(auc_pos) and got["n_neg"][0] == len(auc_neg)
      and abs(got["auc"][0] - auc) <= 1e-5
      and abs(got["gini"][0] - (2 * auc - 1)) <= 1e-5)
print(f"agg_auc: {'OK' if ok else 'MISMATCH'} (auc~{auc:.6f})")
fails += 0 if ok else 1

# agg_kendall (round 12 batch 4): tau-b via the O(domain^2) cell-pair
# sweep from raw lineitem tuples (independent of both engines' joins)
li = pq.read_table(f"{sf}/lineitem.parquet",
                   columns=["l_returnflag", "l_quantity", "l_discount"]
                   ).to_pydict()
kcells = collections.Counter(zip(li["l_returnflag"], li["l_quantity"],
                                 li["l_discount"]))
got = sparkres("agg_kendall")
gk = {g: (n, c, d, t) for g, n, c, d, t in
      zip(got["l_returnflag"], got["n"], got["concordant"],
          got["discordant"], got["tau_b"])}
ok = True
for g in set(li["l_returnflag"]):
    cl = [(x, y, c) for (gg, x, y), c in kcells.items() if gg == g]
    cc = dd = 0
    for i in range(len(cl)):
        for j in range(i + 1, len(cl)):
            x1, y1, c1 = cl[i]; x2, y2, c2 = cl[j]
            p = (x1 - x2) * (y1 - y2)
            if p > 0: cc += c1 * c2
            elif p < 0: dd += c1 * c2
    n = sum(c for _, _, c in cl)
    n0 = n * (n - 1) // 2
    xs = collections.Counter(); ys = collections.Counter()
    for x, y, c in cl:
        xs[x] += c; ys[y] += c
    tx = sum(c * (c - 1) // 2 for c in xs.values())
    ty = sum(c * (c - 1) // 2 for c in ys.values())
    tau = (cc - dd) / math.sqrt((n0 - tx) * (n0 - ty))
    r = gk[g]
    ok = ok and r[0] == n and r[1] == cc and r[2] == dd \
        and abs(r[3] - tau) <= 1e-5
print(f"agg_kendall: {'OK' if ok else 'MISMATCH'} ({len(gk)} groups)")
fails += 0 if ok else 1

# eval_calibration (round 12 batch 4): bins + ECE from raw events
cal = [(math.floor(v / (v + 50.0) * 10), v / (v + 50.0), t == "purchase")
       for t, v in zip(ev["event_type"], ev["value"])
       if t in ("purchase", "view")]
cal_by = collections.defaultdict(list)
for b, p, y in cal:
    cal_by[b].append((p, y))
got = sparkres("eval_calibration")
nn = len(cal)
ok = set(got["bin"]) == set(cal_by)
for b, n, npos, mp, obs, ece in zip(got["bin"], got["n"], got["n_pos"],
                                    got["mean_pred"], got["obs_rate"],
                                    got["ece_term"]):
    v = cal_by[b]
    m = sum(p for p, _ in v) / len(v)
    o = sum(1 for _, y in v if y) / len(v)
    ok = ok and n == len(v) and npos == sum(1 for _, y in v if y) \
        and abs(mp - m) <= 1e-5 and abs(obs - o) <= 1e-5 \
        and abs(ece - abs(m - o) * len(v) / nn) <= 1e-5
print(f"eval_calibration: {'OK' if ok else 'MISMATCH'} ({len(cal_by)} bins)")
fails += 0 if ok else 1

# events_assoc_rules (round 12 batch 4): rules from literal day baskets
baskets = collections.defaultdict(set)
for u, ts, t in zip(ev["user_id"], ev["ts"], ev["event_type"]):
    baskets[(u, (ts - ts.__class__(1970, 1, 1)).days)].add(t)
ar_na = collections.Counter()
ar_nab = collections.Counter()
for items in baskets.values():
    for a in items:
        ar_na[a] += 1
        for b in items:
            if a != b:
                ar_nab[(a, b)] += 1
exp_rules = {k: v for k, v in ar_nab.items() if v >= 50}
got = sparkres("events_assoc_rules")
ok = len(got["antecedent"]) == len(exp_rules)
for a, b, s, c, l in zip(got["antecedent"], got["consequent"],
                         got["support"], got["confidence"], got["lift"]):
    ok = ok and exp_rules.get((a, b)) == s \
        and abs(c - s / ar_na[a]) <= 1e-5 \
        and abs(l - s * len(baskets) / (ar_na[a] * ar_na[b])) <= 1e-5
print(f"events_assoc_rules: {'OK' if ok else 'MISMATCH'} "
      f"({len(exp_rules)} rules)")
fails += 0 if ok else 1

# sample_temperature (round 12 batch 4): targets + kept counts from raw
# language counts and md5 ranks
import hashlib
st_counts = collections.Counter(docs["lang"])
st_dsum = sum(math.sqrt(n) for n in st_counts.values())
got = sparkres("sample_temperature")
ok = len(got["lang"]) == len(st_counts)
ranked = collections.defaultdict(list)
for d, g in zip(docs["doc_id"], docs["lang"]):
    ranked[g].append((hashlib.md5(str(d).encode()).hexdigest(), d))
for g, nd, rs, tshare, tgt, nk, mid in zip(
        got["lang"], got["n_docs"], got["raw_share"], got["temp_share"],
        got["target"], got["n_kept"], got["min_id"]):
    n = st_counts[g]
    ts_ = math.sqrt(n) / st_dsum
    t_ = math.floor(ts_ * 200)
    kept = [d for _, d in sorted(ranked[g])[:t_]]
    ok = ok and nd == n and abs(rs - n / len(docs["lang"])) <= 1e-5 \
        and abs(tshare - ts_) <= 1e-5 and tgt == t_ and nk == t_ \
        and mid == min(kept)
print(f"sample_temperature: {'OK' if ok else 'MISMATCH'} "
      f"({len(st_counts)} langs)")
fails += 0 if ok else 1

# graph_kcore (round 12 batch 4): synchronous peel from the
# first-principles co-occurrence edges (adjc built for graph_clustering)
kc_edges = [(a, b) for a, nbrs in adjc.items() for b in nbrs if a < b]
for _ in range(8):
    deg = collections.Counter()
    for a, b in kc_edges:
        deg[a] += 1; deg[b] += 1
    kc_edges = [(a, b) for a, b in kc_edges if deg[a] >= 3 and deg[b] >= 3]
kc_deg = collections.Counter()
for a, b in kc_edges:
    kc_deg[a] += 1; kc_deg[b] += 1
got = sparkres("graph_kcore")
all_users = set(ev["user_id"])
ok = set(got["user_id"]) == all_users
for u, d in zip(got["user_id"], got["core_deg"]):
    ok = ok and d == kc_deg.get(u, 0)
print(f"graph_kcore: {'OK' if ok else 'MISMATCH'} "
      f"({len(kc_deg)} core nodes of {len(all_users)})")
fails += 0 if ok else 1

# ts_decompose (round 12 batch 5): MA trend / DOW seasonal / residual
# from the literal daily purchase series
td = collections.Counter((ts - ts.__class__(1970, 1, 1)).days
                         for t, ts in zip(ev["event_type"], ev["ts"])
                         if t == "purchase")
td_days = sorted(td)
td_n = [td[d] for d in td_days]
td_trend = [sum(td_n[i - 3:i + 4]) / 7.0
            if 3 <= i < len(td_n) - 3 else None
            for i in range(len(td_n))]
td_seas_src = collections.defaultdict(list)
for i, d in enumerate(td_days):
    if td_trend[i] is not None:
        td_seas_src[d % 7].append(td_n[i] - td_trend[i])
td_seas = {k: sum(v) / len(v) for k, v in td_seas_src.items()}
got = sparkres("ts_decompose")
ok = list(got["d"]) == td_days and list(got["n"]) == td_n
for i, (tr, se, re_) in enumerate(zip(got["trend"], got["seasonal"],
                                      got["resid"])):
    if td_trend[i] is None:
        ok = ok and tr is None
    else:
        ok = ok and abs(tr - td_trend[i]) <= 1e-5 \
            and abs(se - td_seas[td_days[i] % 7]) <= 1e-5 \
            and abs((tr + se + re_) - td_n[i]) <= 1e-4
print(f"ts_decompose: {'OK' if ok else 'MISMATCH'} ({len(td_days)} days)")
fails += 0 if ok else 1

# ts_cross_corr (round 12 batch 5): per-lag Pearson from literal counts
cx = collections.Counter((ts - ts.__class__(1970, 1, 1)).days
                         for t, ts in zip(ev["event_type"], ev["ts"])
                         if t == "purchase")
cy = collections.Counter((ts - ts.__class__(1970, 1, 1)).days
                         for t, ts in zip(ev["event_type"], ev["ts"])
                         if t == "view")
got = sparkres("ts_cross_corr")
gcc = {l: (n, c) for l, n, c in zip(got["lag"], got["n_days"], got["ccf"])}
ok = True
for lag in range(-7, 8):
    pairs = [(cx[d], cy[d + lag]) for d in cx if (d + lag) in cy]
    if len(pairs) >= 8:
        m = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        r = (m * sxy - sx * sy) / math.sqrt(
            (m * sxx - sx * sx) * (m * syy - sy * sy))
        ok = ok and lag in gcc and gcc[lag][0] == m \
            and abs(gcc[lag][1] - r) <= 1e-5
    else:
        ok = ok and lag not in gcc
print(f"ts_cross_corr: {'OK' if ok else 'MISMATCH'} ({len(gcc)} lags)")
fails += 0 if ok else 1

# split_kfold (round 12 batch 5): fold assignment from hashlib md5
ok_orders = pq.read_table(f"{sf}/orders.parquet",
                          columns=["o_orderkey"]).to_pydict()["o_orderkey"]
kf = collections.Counter()
for k in ok_orders:
    h = hashlib.md5(str(k).encode()).hexdigest()[:2]
    kf[0 if h < "33" else 1 if h < "66" else 2 if h < "99"
       else 3 if h < "cc" else 4] += 1
got = sparkres("split_kfold")
ok = dict(zip(got["fold"], got["n"])) == dict(kf) \
    and sum(got["n"]) == len(ok_orders)
print(f"split_kfold: {'OK' if ok else 'MISMATCH'} ({dict(sorted(kf.items()))})")
fails += 0 if ok else 1

# text_readability (round 12 batch 5): ARI from literal counts
ra = collections.defaultdict(list)
for g, text in zip(docs["lang"], docs["text"]):
    words = len(text.split(" "))
    chars = len(text) - (words - 1)
    sents = max(1, text.count("."))
    ra[g].append(4.71 * chars / words + 0.5 * words / sents - 21.43)
got = sparkres("text_readability")
ok = len(got["lang"]) == len(ra)
for g, nd, avg, mn, mx in zip(got["lang"], got["n_docs"], got["avg_ari"],
                              got["min_ari"], got["max_ari"]):
    v = ra[g]
    ok = ok and nd == len(v) and abs(avg - sum(v) / len(v)) <= 1e-5 \
        and abs(mn - min(v)) <= 1e-5 and abs(mx - max(v)) <= 1e-5
print(f"text_readability: {'OK' if ok else 'MISMATCH'} ({len(ra)} langs)")
fails += 0 if ok else 1

# manifest_time_travel (round 12 batch 5): snapshot counts from raw
cust = pq.read_table(f"{sf}/customer.parquet",
                     columns=["c_mktsegment", "c_acctbal"]).to_pydict()
tt_low = collections.Counter(g for g, b in zip(cust["c_mktsegment"],
                                               cust["c_acctbal"])
                             if float(b) <= 5000)
tt_all = collections.Counter(cust["c_mktsegment"])
got = sparkres("manifest_time_travel")
ok = len(got["c_mktsegment"]) == len(tt_all)
for g, v1, hd, ad in zip(got["c_mktsegment"], got["n_v1"], got["n_head"],
                         got["n_added"]):
    ok = ok and v1 == tt_low.get(g, 0) and hd == tt_all[g] \
        and ad == tt_all[g] - tt_low.get(g, 0)
print(f"manifest_time_travel: {'OK' if ok else 'MISMATCH'} "
      f"({sum(tt_all.values())} customers)")
fails += 0 if ok else 1

# agg_hhi (round 12 batch 7): literal share-squared Herfindahl
hh_by = collections.defaultdict(list)
for ck, x in oc.items():
    hh_by[seg_of[ck]].append(x)
got = sparkres("agg_hhi")
ok = len(got["c_mktsegment"]) == len(hh_by)
for g, n, h, hn in zip(got["c_mktsegment"], got["n_cust"], got["hhi"],
                       got["hhi_norm"]):
    xs = hh_by[g]
    tot = sum(xs)
    hhi = sum((x / tot) ** 2 for x in xs)
    ok = ok and n == len(xs) and abs(h - hhi) <= 1e-5 \
        and abs(hn - (hhi - 1 / len(xs)) / (1 - 1 / len(xs))) <= 1e-5
print(f"agg_hhi: {'OK' if ok else 'MISMATCH'} ({len(hh_by)} segments)")
fails += 0 if ok else 1

# text_novelty (round 12 batch 7): literal text-keyed first occurrence
nv_first = {}
nv_grams = {}
for did, text in zip(docs["doc_id"], docs["text"]):
    tk = text.split(" ")
    if len(tk) >= 8:
        nv_grams[did] = set(" ".join(tk[i:i + 8])
                            for i in range(len(tk) - 7))
for did in sorted(nv_grams):
    for g in nv_grams[did]:
        nv_first.setdefault(g, did)
got = sparkres("text_novelty")
ok = set(got["doc_id"]) == set(nv_grams)
for did, ng, nn, nov in zip(got["doc_id"], got["n_grams"], got["n_novel"],
                            got["novelty"]):
    gs = nv_grams[did]
    novel = sum(1 for g in gs if nv_first[g] == did)
    ok = ok and ng == len(gs) and nn == novel \
        and abs(nov - novel / len(gs)) <= 1e-5
print(f"text_novelty: {'OK' if ok else 'MISMATCH'} ({len(nv_grams)} docs)")
fails += 0 if ok else 1

# events_out_of_order (round 12 batch 7): jittered-arrival lateness
def ooo_jitter(eid):
    h = hashlib.md5(str(eid).encode()).hexdigest()
    return ((ord(h[0]) * 31 + ord(h[1])) % 1024) * 1500000
ooo_by_user = collections.defaultdict(list)
epoch = None
for u, eid, t, ts in zip(ev["user_id"], ev["event_id"], ev["event_type"],
                         ev["ts"]):
    if epoch is None:
        epoch = ts.__class__(1970, 1, 1)
    d = ts - epoch
    us = d.days * 86400_000_000 + d.seconds * 1_000_000 + d.microseconds
    ooo_by_user[u].append((us + ooo_jitter(eid), eid, t, us))
ooo_late = collections.defaultdict(list)
for rows in ooo_by_user.values():
    run = None
    for _, _, t, us in sorted(rows):
        ooo_late[t].append(0 if run is None else max(0, run - us))
        run = us if run is None else max(run, us)
got = sparkres("events_out_of_order")
ok = True
for t, n, nr, nl, mx, av in zip(got["event_type"], got["n"],
                                got["n_reordered"], got["n_late_10m"],
                                got["max_late_s"], got["avg_reorder_s"]):
    ls = ooo_late[t]
    re_ = [l for l in ls if l > 0]
    avg = (sum(re_) / len(re_) / 1e6) if re_ else 0.0
    ok = ok and n == len(ls) and nr == len(re_) \
        and nl == sum(1 for l in ls if l > 600000000) \
        and abs(mx - max(ls) / 1e6) <= 1e-5 and abs(av - avg) <= 1e-5
print(f"events_out_of_order: {'OK' if ok else 'MISMATCH'} "
      f"({sum(len(v) for v in ooo_late.values())} events)")
fails += 0 if ok else 1

# manifest_changes (round 17): the CDC feed's (version, change, type)
# groups from first principles over the raw events — independent of the
# manifest machinery, the sidecar join AND the oracle's UNION algebra
from decimal import Decimal, ROUND_HALF_UP
def d2(x):
    return Decimal(str(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
cdc = collections.defaultdict(lambda: [0, Decimal(0)])
for eid, t, v in zip(ev["event_id"], ev["event_type"], ev["value"]):
    ins_v = (1 if eid % 2 == 0 else 2, "insert", t)
    cdc[ins_v][0] += 1; cdc[ins_v][1] += d2(v)
    if t == "click":
        cdc[(3, "delete", t)][0] += 1; cdc[(3, "delete", t)][1] += d2(v)
    if t == "purchase":
        cdc[(4, "delete", t)][0] += 1; cdc[(4, "delete", t)][1] += d2(v)
        cdc[(4, "insert", t)][0] += 1
        cdc[(4, "insert", t)][1] += d2(v) + Decimal(100)
    if t == "view" and eid % 50 == 0:
        k = (4, "insert", "backfill")
        cdc[k][0] += 1; cdc[k][1] += d2(v)
got = sparkres("manifest_changes")
ok = len(got["v"]) == len(cdc)
for v, ch, t, n, sv in zip(got["v"], got["change"], got["event_type"],
                           got["n"], got["sum_value"]):
    en, es = cdc.get((v, ch, t), (None, None))
    ok = ok and en == n and es is not None \
        and abs(float(es) - sv) <= 1e-6 * max(1.0, abs(float(es)))
print(f"manifest_changes: {'OK' if ok else 'MISMATCH'} ({len(cdc)} groups)")
fails += 0 if ok else 1

sys.exit(1 if fails else 0)


