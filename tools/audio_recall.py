#!/usr/bin/env python3
"""q207 residual-miss measurement (RECALL.md): plant near-dup families
with KNOWN prefilter behavior, grade the engine's q207 output against
the exact all-pairs hamming truth.

Families (20 of each, 2048-byte ASCII docs -> 64 frames -> 4 words):
  exact  (id 1000+i): byte-identical copy         -> hamming 0, shares
          every word -> the prefilter MUST find it.
  tail   (id 2000+i): last 64 bytes rewritten     -> bits change only in
          the last word; words 0-2 shared -> candidate HIT, hamming <= ~4.
  scatter(id 3000+i): one frame per 512-byte word span rewritten to
          per-position extreme-energy bytes, low/high toggled until ALL
          four words differ while exact hamming stays <= 8 -> a TRUE
          dup (hamming <= FpDupMax) that shares NO exact word -> the
          banded prefilter structurally CANNOT find it. This is the
          residual-miss trade every banded prefilter in the suite pays;
          this family measures it for the audio fingerprint.

Usage:
  tools/audio_recall.py gen <fixtureDir>     # writes documents.parquet
  tools/run.sh graft.Verify <fixtureDir> <out> q207_audio_fingerprint
  tools/audio_recall.py grade <out>          # truth vs engine output

The truth here is an independent reimplementation of the fingerprint
(python ints, exact arithmetic) with NO candidate stage — every pair is
scored. The engine is graded on is_dup pairs only (hamming <= 8).
"""
import sys, os, random
import duckdb

FRAME, WBITS, DUPMAX = 32, 16, 8
N, L = 20, 2048
ALPHA = "abcdefghijklmnopqrstuvwxyz "


def frame_energy(b, f):
    ssq = 0
    for p in range(f * FRAME, min((f + 1) * FRAME, len(b))):
        c = (((b[p] * 31 + p * 7) % 256) - 128) * 256
        ssq += c * c
    return ssq


def words_of(text):
    b = text.encode("utf-8")
    nf = (len(b) + FRAME - 1) // FRAME
    e = [frame_energy(b, f) for f in range(nf)]
    bits = [0] + [1 if e[f] > e[f - 1] else 0 for f in range(1, nf)]
    nw = (nf + WBITS - 1) // WBITS
    return [sum(bits[f] << (f % WBITS)
                for f in range(w * WBITS, min((w + 1) * WBITS, nf)))
            for w in range(nw)]


def hamming(wa, wb):
    m = min(len(wa), len(wb))
    return (sum(bin(wa[i] ^ wb[i]).count("1") for i in range(m))
            + (len(wa) - m) * WBITS + (len(wb) - m) * WBITS)


def best_byte(p, want_low):
    best, bv = None, None
    for b in range(32, 127):
        mag = abs(((b * 31 + p * 7) % 256) - 128)
        score = -mag if want_low else mag
        if best is None or score > best:
            best, bv = score, b
    return bv


def scattered(base):
    wb_ = words_of(base)
    for combo in range(16):
        chars = list(base)
        for w in range(4):
            f = w * WBITS + 8
            low = bool(combo >> w & 1)
            for p in range(f * FRAME, (f + 1) * FRAME):
                chars[p] = chr(best_byte(p, low))
        cand = "".join(chars)
        wc = words_of(cand)
        if (all(wc[i] != wb_[i] for i in range(4))
                and hamming(wb_, wc) <= DUPMAX):
            return cand
    raise AssertionError("could not engineer a scattered miss")


def gen_rows():
    random.seed(13)
    rows = []
    for i in range(N):
        base = "".join(random.choice(ALPHA) for _ in range(L))
        tail = base[:-64] + "".join(random.choice(ALPHA) for _ in range(64))
        rows.append((i, base))
        rows.append((1000 + i, base))
        rows.append((2000 + i, tail))
        rows.append((3000 + i, scattered(base)))
    return rows


def gen(outdir):
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    for doc_id, text in gen_rows():
        con.execute("INSERT INTO d VALUES (?, ?, 'en', 'audfix', ?)",
                    [doc_id, text, len(text)])
    con.execute(f"COPY d TO '{outdir}/documents.parquet' (FORMAT PARQUET)")
    print(f"wrote {len(gen_rows())} docs to {outdir}/documents.parquet")


def family(a, b):
    i, j = a % 1000, b % 1000
    if i != j:
        return "cross"
    fams = sorted((a // 1000, b // 1000))
    return {(0, 1): "exact", (0, 2): "tail", (0, 3): "scatter",
            (1, 2): "tail", (1, 3): "scatter", (2, 3): "tail+scatter"}[
        tuple(fams)]


def grade(outdir):
    rows = gen_rows()
    ws = {doc_id: words_of(t) for doc_id, t in rows}
    ids = sorted(ws)
    truth = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            h = hamming(ws[a], ws[b])
            if h <= DUPMAX:
                truth[(a, b)] = h
    con = duckdb.connect()
    got = con.sql(
        f"SELECT doc1, doc2 FROM '{outdir}/q207_audio_fingerprint/*.parquet'"
        " WHERE is_dup").fetchall()
    got = {(a, b) for a, b in got}
    fams = {}
    for (a, b), h in sorted(truth.items()):
        f = family(a, b)
        hit = (a, b) in got
        fams.setdefault(f, [0, 0])
        fams[f][0] += hit
        fams[f][1] += 1
    false_pos = got - set(truth)
    print(f"true dups (exact hamming <= {DUPMAX}): {len(truth)}")
    for f, (hit, tot) in sorted(fams.items()):
        print(f"  {f:14s} found {hit:3d} / {tot:3d}")
    tot_hit = sum(h for h, _ in fams.values())
    print(f"  overall        found {tot_hit:3d} / {len(truth):3d}"
          f"  recall_milli={tot_hit * 1000 // len(truth)}")
    print(f"engine is_dup pairs not in truth (must be 0): {len(false_pos)}")
    assert not false_pos, false_pos


if __name__ == "__main__":
    {"gen": gen, "grade": grade}[sys.argv[1]](sys.argv[2])
