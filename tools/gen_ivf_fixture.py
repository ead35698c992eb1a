"""Independent pure-Python twin of graft.ops.AnnKMeans: regenerates the
clustered embedding fixture from its documented integer-hash formula, trains
the SAME seeded k-means (evenly-spaced init over the vec_id-sorted
bounded-count sample — the TRAIN_SAMPLE_N ids with the smallest
md5("ivf:<id>") digests, the fixed-size FAISS-style training sample — 5
Lloyd iterations, cosine argmax with lowest-centroid tiebreak, arithmetic
mean update, left-to-right summation), and computes

  - expected/ivf_kmeans.parquet : the IVF top-3 per query (q_id, vec_id,
    cos4, rn) — the DuckDB oracle for q_embed_ivf_kmeans;
  - expected/ann_recall.parquet : recall@3 vs exact brute force and the
    achieved scan fraction for BOTH scale paths (trained-quantizer IVF
    probes and sign-LSH Hamming shortlist) at the same 25% budget — the
    oracle for q_ann_recall.

Every float op is an IEEE double in the same order as the Scala/Spark side
(plain Python loops, no numpy), so the outputs are bit-identical, and cos4
uses the same HALF_UP 4-decimal rounding as Spark's round().

Usage: python3 tools/gen_ivf_fixture.py [out_dir]
"""
import sys
from decimal import ROUND_HALF_UP, Decimal

OUT = sys.argv[1] if len(sys.argv) > 1 else 'src/test/resources/expected'

CLUSTERS = 16
PER_CLUSTER = 100
DIMS = 64
NUM_QUERIES = 5
PROBES = 4
LLOYD_ITERS = 5
TRAIN_SAMPLE_N = 400
N_CAND = CLUSTERS * PER_CLUSTER
LSH_SCAN_M = N_CAND // 4
TOP_K = 3
PLANES = 128


def center_term(k, i):
    return (2654435761 * (k * DIMS + i + 1)) % 2147483647 % 2001 - 1000


def perturb_term(ident, i):
    return (1099087573 * (ident * DIMS + i + 1)) % 2147483647 % 201 - 100


def candidate(v):
    k = v // PER_CLUSTER
    return [center_term(k, i) / 1000.0 + perturb_term(v, i) / 1000.0
            for i in range(DIMS)]


def query(c):
    return [center_term(c, i) / 1000.0 + perturb_term(c + 7777, i) / 1000.0
            for i in range(DIMS)]


def cos(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    for i in range(len(a)):
        dot += a[i] * b[i]
        na += a[i] * a[i]
        nb += b[i] * b[i]
    return dot / (na ** 0.5 * nb ** 0.5)


def round4(v):
    return float(Decimal(repr(v)).quantize(Decimal('0.0001'), ROUND_HALF_UP))


def train_centroids(cands):
    import hashlib
    ranked = sorted(range(N_CAND),
                    key=lambda v: (hashlib.md5(f"ivf:{v}".encode()).hexdigest(), v))
    sample = [cands[v] for v in sorted(ranked[:TRAIN_SAMPLE_N])]
    n = len(sample)
    cents = [list(sample[j * n // CLUSTERS]) for j in range(CLUSTERS)]
    for _ in range(LLOYD_ITERS):
        sums = [[0.0] * DIMS for _ in range(CLUSTERS)]
        counts = [0] * CLUSTERS
        for v in sample:
            best, best_cos = 0, cos(v, cents[0])
            for c in range(1, CLUSTERS):
                s = cos(v, cents[c])
                if s > best_cos:
                    best, best_cos = c, s
            for i in range(DIMS):
                sums[best][i] += v[i]
            counts[best] += 1
        cents = [cents[c] if counts[c] == 0
                 else [sums[c][i] / counts[c] for i in range(DIMS)]
                 for c in range(CLUSTERS)]
    return cents


def argmax_centroid(v, cents):
    best, best_cos = 0, cos(v, cents[0])
    for c in range(1, CLUSTERS):
        s = cos(v, cents[c])
        if s > best_cos:
            best, best_cos = c, s
    return best


# sign-LSH planes: identical formula to graft.functions.ExprImpl.planeWeights
PLANE_W = [[float((2654435761 * (p * DIMS + i + 1)) % 2147483647 % 1024 - 512)
            for i in range(DIMS)] for p in range(PLANES)]


def sign_bits(v):
    out = []
    for p in range(PLANES):
        acc = 0.0
        w = PLANE_W[p]
        for i in range(DIMS):
            acc += v[i] * w[i]
        out.append(1 if acc > 0 else 0)
    return out


def main():
    cands = {v: candidate(v) for v in range(N_CAND)}
    queries = {q: query(q) for q in range(NUM_QUERIES)}
    cents = train_centroids(cands)

    assigned = {v: argmax_centroid(cands[v], cents) for v in range(N_CAND)}
    cell_sizes = [0] * CLUSTERS
    for v in range(N_CAND):
        cell_sizes[assigned[v]] += 1

    # brute-force ground truth
    bf3 = {}
    for q, qv in queries.items():
        ranked = sorted(((cos(qv, cands[v]), v) for v in range(N_CAND)),
                        key=lambda t: (-t[0], t[1]))
        bf3[q] = [v for _, v in ranked[:TOP_K]]

    # IVF: top-PROBES centroids per query, rank inside probed cells
    ivf_rows = []
    ivf3 = {}
    ivf_scanned = 0
    for q, qv in queries.items():
        probe = sorted(((cos(qv, cents[c]), c) for c in range(CLUSTERS)),
                       key=lambda t: (-t[0], t[1]))[:PROBES]
        cells = {c for _, c in probe}
        ivf_scanned += sum(cell_sizes[c] for c in cells)
        ranked = sorted(((cos(qv, cands[v]), v) for v in range(N_CAND)
                         if assigned[v] in cells),
                        key=lambda t: (-t[0], t[1]))[:TOP_K]
        ivf3[q] = [v for _, v in ranked]
        for rn, (cv, v) in enumerate(ranked, start=1):
            ivf_rows.append({'q_id': q, 'vec_id': v, 'cos4': round4(cv), 'rn': rn})

    # sign-LSH: Hamming shortlist of LSH_SCAN_M, exact-cosine re-rank
    cand_bits = {v: sign_bits(cands[v]) for v in range(N_CAND)}
    lsh3 = {}
    for q, qv in queries.items():
        qb = sign_bits(qv)
        ham = sorted(((sum(1 for p in range(PLANES) if cand_bits[v][p] != qb[p]), v)
                      for v in range(N_CAND)), key=lambda t: (t[0], t[1]))
        shortlist = [v for _, v in ham[:LSH_SCAN_M]]
        ranked = sorted(((cos(qv, cands[v]), v) for v in shortlist),
                        key=lambda t: (-t[0], t[1]))[:TOP_K]
        lsh3[q] = [v for _, v in ranked]

    def recall(top3):
        hits = sum(len(set(top3[q]) & set(bf3[q])) for q in queries)
        return hits / float(NUM_QUERIES * TOP_K)

    recall_rows = [
        {'method': 'ivf_kmeans',
         'scanned_frac': ivf_scanned / float(NUM_QUERIES * N_CAND),
         'recall3': recall(ivf3)},
        {'method': 'lsh_hamming',
         'scanned_frac': LSH_SCAN_M / float(N_CAND),
         'recall3': recall(lsh3)},
    ]

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    ivf_df = pd.DataFrame(ivf_rows)
    rec_df = pd.DataFrame(recall_rows)
    con.execute("CREATE TABLE ivf AS SELECT * FROM ivf_df")
    con.execute(f"COPY ivf TO '{OUT}/ivf_kmeans.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE rec AS SELECT * FROM rec_df")
    con.execute(f"COPY rec TO '{OUT}/ann_recall.parquet' (FORMAT PARQUET)")
    print(f"wrote {len(ivf_rows)} ivf rows, {len(recall_rows)} recall rows to {OUT}")
    print("cell sizes:", cell_sizes)
    for r in recall_rows:
        print(r)


if __name__ == '__main__':
    main()
