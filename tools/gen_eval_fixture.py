"""Generate the pipeline_eval expected fixture INDEPENDENTLY of the Scala
implementation: the per-row metric chain runs the REFERENCE's own pure
functions (loaded by file path from /root/reference with package stubs; no
reference code is copied, only executed), plus pure-Python Levenshtein and
BLEU (public NMT compute_bleu + mteval-13a tokenization, the exact semantics
of HF evaluate's "bleu" the reference loads at evaluate_page.py:60).

Input synthesis mirrors graft.metrics.Eval.evalPairs byte-for-byte.
Output: src/test/resources/expected/pipeline_eval.parquet

Usage: python3 tools/gen_eval_fixture.py [sf_dir] [out_parquet]
"""
import importlib.util
import math
import re
import sys
import types
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
OUT = sys.argv[2] if len(sys.argv) > 2 else 'src/test/resources/expected/pipeline_eval.parquet'


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


# stub package chain so the reference's intra-package imports resolve
for pkg in ['tooling', 'tooling.evaluation', 'churro_ocr', 'churro_ocr._internal']:
    mod = types.ModuleType(pkg)
    mod.__path__ = []  # mark as package
    sys.modules.setdefault(pkg, mod)
# xml_utils only uses logger.warning on parse failure
logging_stub = types.ModuleType('churro_ocr._internal.logging')
import logging as _logging
logging_stub.logger = _logging.getLogger('ref')
sys.modules['churro_ocr._internal.logging'] = logging_stub
ocr = load('churro_ocr.prompts', '/root/reference/src/churro_ocr/prompts/ocr.py')
norm = load('tooling.evaluation.normalization', '/root/reference/tooling/evaluation/normalization.py')
rep = load('tooling.evaluation.repetition', '/root/reference/tooling/evaluation/repetition.py')
xmlu = load('tooling.evaluation.xml_utils', '/root/reference/tooling/evaluation/xml_utils.py')


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


# --- BLEU: mteval-13a tokenizer + NMT compute_bleu (public algorithms) -----
_RE = [
    (re.compile(r'([\{-\~\[-\` -\&\(-\+\:-\@\/])'), r' \1 '),
    (re.compile(r'([^0-9])([\.,])'), r'\1 \2 '),
    (re.compile(r'([\.,])([^0-9])'), r' \1 \2'),
    (re.compile(r'([0-9])(\-)'), r'\1 - '),
]


def tokenize_13a(line: str):
    line = line.replace('<skipped>', '').replace('-\n', '').replace('\n', ' ')
    if '&' in line:
        line = (line.replace('&quot;', '"').replace('&amp;', '&')
                .replace('&lt;', '<').replace('&gt;', '>'))
    line = f' {line} '
    for pat, repl in _RE:
        line = pat.sub(repl, line)
    return line.split()


def _ngrams(tokens, max_order):
    c = Counter()
    for order in range(1, max_order + 1):
        for i in range(len(tokens) - order + 1):
            c[tuple(tokens[i:i + order])] += 1
    return c


def bleu(pred: str, gold: str, max_order: int = 4) -> float:
    t, r = tokenize_13a(pred), tokenize_13a(gold)
    if not t or not r:
        return 0.0
    matches = [0] * max_order
    possible = [0] * max_order
    ref_counts = _ngrams(r, max_order)
    t_counts = _ngrams(t, max_order)
    for ng, c in t_counts.items():
        ov = min(c, ref_counts.get(ng, 0))
        if ov > 0:
            matches[len(ng) - 1] += ov
    for order in range(1, max_order + 1):
        p = len(t) - order + 1
        if p > 0:
            possible[order - 1] += p
    precisions = [matches[i] / possible[i] if possible[i] > 0 else 0.0
                  for i in range(max_order)]
    if min(precisions) > 0:
        geo = math.exp(sum(math.log(p) * (1.0 / max_order) for p in precisions))
    else:
        geo = 0.0
    ratio = len(t) / len(r)
    bp = 1.0 if ratio > 1.0 else math.exp(1.0 - 1.0 / ratio)
    return geo * bp


def round4(v: float) -> float:
    # Java BigDecimal.valueOf(v).setScale(4, HALF_UP) equivalence:
    # shortest decimal repr, then half-up quantize
    return float(Decimal(repr(v)).quantize(Decimal('0.0001'), ROUND_HALF_UP))


def compute_row(example_id, pred_raw, gold_raw, lang, dtype):
    pred = norm.normalize_text_for_evaluation(
        xmlu.extract_actual_text_from_xml(ocr.strip_ocr_output_tag(pred_raw)))
    gold = norm.normalize_text_for_evaluation(
        xmlu.extract_actual_text_from_xml(ocr.strip_ocr_output_tag(gold_raw)))
    is_empty = 1.0 if not pred.strip() else 0.0
    denom = max(len(pred), len(gold))
    nls = 1.0 if denom == 0 else 1.0 - levenshtein(pred, gold) / denom
    b = round4(bleu(pred, gold)) if is_empty != 1.0 else 0.0
    return dict(example_id=example_id, main_language=lang, document_type=dtype,
                nls=nls, bleu=b,
                repetition=1.0 if rep.has_long_repetition(pred) else 0.0,
                is_empty=is_empty)


def main():
    import duckdb
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet' ORDER BY doc_id").fetchall()
    rows = []
    for doc_id, text, lang in docs:
        gold = f"<output>\n{text}\n</output>"
        m = doc_id % 5
        if m == 0:
            pred = gold
        elif m == 1:
            pred = gold.replace("the", "teh")
        elif m == 2:
            pred = text + (" spam" * 40)
        elif m == 3:
            pred = ""
        else:
            pred = f"**{text.upper()}**"
        dtype = "print" if doc_id % 2 == 0 else "handwriting"
        rows.append(compute_row(f"doc_{doc_id}", pred, gold, lang, dtype))
    import pandas as pd
    df = pd.DataFrame(rows)
    con.execute("CREATE TABLE t AS SELECT * FROM df")
    con.execute(f"COPY t TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} rows to {OUT}")
    # a few differential goldens for BleuSpec
    for p, g in [("the cat sat on the mat", "the cat sat on the mat"),
                 ("the cat sat on mat", "the cat sat on the mat"),
                 ("a quick brown fox jumps, over 12-34 lazy dogs.", "the quick brown fox jumped over 12-34 lazy dogs."),
                 ("one two", "one two three four five six"),
                 ("x", "y")]:
        print(f"bleu({p!r}, {g!r}) = {bleu(p, g)!r}")


if __name__ == '__main__':
    main()
