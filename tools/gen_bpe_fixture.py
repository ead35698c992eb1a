"""Independent pure-Python BPE trainer twin for graft.ops.Queries.bpeMerges.

Reads the sf0.01 documents parquet (the tier graft.Verify dumps at), trains
the same merge table under the documented contract — whitespace words
([ \\t\\n\\r]+ split, empties dropped) aggregated to (word, count) once;
symbols = Unicode code points + a '</w>' end-of-word sentinel; each round
counts adjacent pairs weighted by word count (overlapping adjacencies both
count, the Sennrich get_stats convention), picks argmax by (count desc,
(left, right) ascending), and applies the merge greedily left-to-right —
and writes the expected merge table the DuckDB oracle reads.

Output: src/test/resources/expected/bpe_merges.parquet
        (step INT, left, right, merged, pair_count BIGINT)
"""
import re
from collections import Counter

SF_DIR = '/root/testdata/sf0.01'
EXPECTED = 'src/test/resources/expected/bpe_merges.parquet'
EXPECTED_ENC = 'src/test/resources/expected/bpe_encode.parquet'
ROUNDS = 10


def train(word_counts, rounds):
    seqs = [(tuple(w) + ('</w>',), c) for w, c in word_counts.items()]
    merges = []
    for step in range(1, rounds + 1):
        pairs = Counter()
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        m = l + r
        merges.append((step, l, r, m, cnt))

        def apply(syms):
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)
        seqs = [(apply(s), c) for s, c in seqs]
    return merges


def encode_word(w, merges):
    syms = list(w) + ['</w>']
    for _, l, r, m, _ in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def main():
    import duckdb
    import hashlib
    import pandas as pd
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id").fetchall()
    wc = Counter()
    for _, t in rows:
        for w in re.split(r'[ \t\n\r]+', t):
            if w:
                wc[w] += 1
    merges = train(wc, ROUNDS)
    df = pd.DataFrame(merges, columns=['step', 'left', 'right', 'merged',
                                       'pair_count'])
    con.execute(
        "CREATE TABLE m AS SELECT CAST(step AS INT) step, \"left\", \"right\", "
        "merged, CAST(pair_count AS BIGINT) pair_count FROM df")
    con.execute(f"COPY m TO '{EXPECTED}' (FORMAT PARQUET)")
    # the encode side: per-word merge replay cached by distinct word
    word_enc = {w: encode_word(w, merges) for w in wc}
    enc_rows = []
    for doc_id, t in rows:
        syms = []
        for w in re.split(r'[ \t\n\r]+', t):
            if w:
                syms.extend(word_enc[w])
        enc_rows.append((doc_id, len(syms),
                         hashlib.md5(' '.join(syms).encode('utf-8')).hexdigest()))
    edf = pd.DataFrame(enc_rows, columns=['doc_id', 'n_syms', 'enc_sha'])
    con.execute(
        "CREATE TABLE e AS SELECT CAST(doc_id AS BIGINT) doc_id, "
        "CAST(n_syms AS BIGINT) n_syms, enc_sha FROM edf")
    con.execute(f"COPY e TO '{EXPECTED_ENC}' (FORMAT PARQUET)")
    for row in merges:
        print(row)
    print(f"wrote {len(merges)} merges to {EXPECTED}; "
          f"{len(enc_rows)} encoded docs to {EXPECTED_ENC}")


if __name__ == '__main__':
    main()
